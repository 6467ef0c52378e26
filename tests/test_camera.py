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


def test_scaramuzza_roundtrip():
    """OCam model: project(lift(uv)) ≈ uv with an inverse polynomial fitted
    the same way the reference does (ScaramuzzaCamera.cc:539-575)."""
    import numpy as np
    import jax.numpy as jnp
    from esvio_tpu.core import camera as cam_mod

    W, H = 640, 480
    poly = np.array([-216.9657476318, 0.0, 0.0017866911, -0.0000019866,
                     0.0000000077])
    # fit rho(theta); order 12 for sub-pixel accuracy (the reference's
    # order-4 fit is an initialization; OCamCalib ships ~12).  NOTE the
    # reference's own fit (ScaramuzzaCamera.cc:561) uses atan2(-z, rho),
    # which is sign-inconsistent with its spaceToPlane (θ = atan2(-P_z, n)
    # applied to the lifted ray P_z = -z); the self-consistent fit is
    # θ = atan2(z, ρ) — real configs ship OCamCalib-produced inv_poly anyway.
    rho = np.arange(0.0, (W + H) / 2, 0.1)
    z = sum(poly[k] * rho ** k for k in range(5))
    theta = np.arctan2(z, rho)
    inv_poly = np.polynomial.polynomial.polyfit(theta, rho, 12)

    cam = cam_mod.make_scaramuzza(poly, inv_poly, cx=W / 2, cy=H / 2,
                                  width=W, height=H, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(80, W - 80, 200),
                   rng.uniform(60, H - 60, 200)], -1)
    ray = cam_mod.lift_projective(cam, jnp.asarray(uv))
    assert np.all(np.isfinite(np.asarray(ray)))
    back = np.asarray(cam_mod.space_to_plane(cam, ray))
    err = np.linalg.norm(back - uv, axis=-1)
    assert err.max() < 0.5, err.max()   # bounded by the polynomial fit

    # center pixel lifts to the optical axis
    c = cam_mod.lift_projective(cam, jnp.asarray([W / 2, H / 2]))
    assert np.allclose(np.asarray(c)[:2], 0.0, atol=1e-9)
