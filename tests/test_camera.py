import numpy as np
import jax.numpy as jnp

from esvio_tpu.core import camera


def make_cam():
    # davis346-like intrinsics with visible distortion
    return camera.make_pinhole(
        fx=263.8, fy=263.7, cx=176.9, cy=122.9,
        dist=(-0.387, 0.153, -4.5e-4, 7.9e-5), width=346, height=260,
    )


def test_pinhole_project_lift_roundtrip(rng):
    cam = make_cam()
    pts = rng.uniform(-0.4, 0.4, size=(64, 2))
    xyz = np.concatenate([pts, np.ones((64, 1))], axis=1)
    uv = np.asarray(camera.space_to_plane(cam, jnp.asarray(xyz, jnp.float32)))
    ray = np.asarray(camera.lift_projective(cam, jnp.asarray(uv, jnp.float32)))
    np.testing.assert_allclose(ray[:, :2], pts, atol=2e-4)
    np.testing.assert_allclose(ray[:, 2], 1.0)


def test_pinhole_no_distortion_center():
    cam = camera.make_pinhole(fx=460.0, fy=460.0, cx=320.0, cy=240.0)
    uv = jnp.asarray([[320.0, 240.0], [780.0, 240.0]])
    ray = np.asarray(camera.lift_projective(cam, uv))
    np.testing.assert_allclose(ray[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(ray[1], [1.0, 0, 1], atol=1e-6)


def test_equidistant_roundtrip(rng):
    cam = camera.make_equidistant(
        fx=380.0, fy=380.0, cx=320.0, cy=240.0, ks=(0.01, -0.002, 0.001, -5e-4),
        width=640, height=480,
    )
    pts = rng.uniform(-0.8, 0.8, size=(32, 2))
    xyz = np.concatenate([pts, np.ones((32, 1))], axis=1)
    uv = np.asarray(camera.space_to_plane(cam, jnp.asarray(xyz, jnp.float32)))
    ray = np.asarray(camera.lift_projective(cam, jnp.asarray(uv, jnp.float32)))
    np.testing.assert_allclose(ray[:, :2] / ray[:, 2:], pts, atol=5e-4)


def test_mei_roundtrip(rng):
    cam = camera.make_mei(
        xi=0.9, fx=600.0, fy=600.0, cx=512.0, cy=384.0,
        dist=(-0.1, 0.02, 1e-4, -1e-4), width=1024, height=768,
    )
    pts = rng.uniform(-0.3, 0.3, size=(32, 2))
    xyz = np.concatenate([pts, np.ones((32, 1))], axis=1)
    uv = np.asarray(camera.space_to_plane(cam, jnp.asarray(xyz, jnp.float32)))
    ray = np.asarray(camera.lift_projective(cam, jnp.asarray(uv, jnp.float32)))
    np.testing.assert_allclose(ray[:, :2] / ray[:, 2:], pts, atol=1e-3)
