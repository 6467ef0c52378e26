"""Camera models as pure, vmappable JAX functions (camodocal equivalents).

Re-designs /root/reference/camera_model (namespace camodocal) as stateless
pytrees + pure functions.  The key API mirrors the abstract Camera interface
(`include/camodocal/camera_models/Camera.h:76-80`):

  * ``lift_projective(cam, uv) -> xyz``  — pixel → normalized projective ray
  * ``space_to_plane(cam, xyz) -> uv``   — 3-D point → pixel

Models:
  * ``Pinhole``      — radial-tangential k1,k2,p1,p2 (PinholeCamera.cc).  The only
                       model used by every shipped reference config.
  * ``Equidistant``  — Kannala-Brandt fisheye k2..k5 (EquidistantCamera.cc).
  * ``Mei``          — omni xi + radtan (CataCamera.cc).

Undistortion uses the same fixed-point "recursive distortion" scheme as the
reference (PinholeCamera.cc:489-505, n = 8) — a jit-friendly fori_loop.

All functions broadcast over leading axes of the point argument.
"""
from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

PINHOLE = 0
EQUIDISTANT = 1
MEI = 2
SCARAMUZZA = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Unified camera parameterization (pytree).

    fields:
      kind: static int — PINHOLE / EQUIDISTANT / MEI
      fx, fy, cx, cy: projection intrinsics
      dist: (4,) distortion — radtan (k1,k2,p1,p2) for PINHOLE/MEI,
            KB (k2,k3,k4,k5) for EQUIDISTANT
      xi: MEI mirror parameter (0 otherwise)
      width, height: static sensor size in pixels
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray
    xi: jnp.ndarray
    # Scaramuzza/OCam extras (zeros for other models): forward polynomial
    # z(φ) (5,), inverse polynomial ρ(θ) (20,), affine [C, D, E]
    poly: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(5, jnp.float32))
    inv_poly: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(20, jnp.float32))
    affine: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    kind: int = dataclasses.field(metadata=dict(static=True), default=PINHOLE)
    width: int = dataclasses.field(metadata=dict(static=True), default=346)
    height: int = dataclasses.field(metadata=dict(static=True), default=260)


def make_pinhole(fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0), width=346, height=260,
                 dtype=jnp.float32) -> CameraModel:
    return CameraModel(
        fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        dist=jnp.asarray(dist, dtype), xi=jnp.asarray(0.0, dtype),
        kind=PINHOLE, width=width, height=height,
    )


def make_equidistant(fx, fy, cx, cy, ks=(0.0, 0.0, 0.0, 0.0), width=346, height=260,
                     dtype=jnp.float32) -> CameraModel:
    return CameraModel(
        fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        dist=jnp.asarray(ks, dtype), xi=jnp.asarray(0.0, dtype),
        kind=EQUIDISTANT, width=width, height=height,
    )


def make_mei(xi, fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0), width=346, height=260,
             dtype=jnp.float32) -> CameraModel:
    return CameraModel(
        fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        dist=jnp.asarray(dist, dtype), xi=jnp.asarray(xi, dtype),
        kind=MEI, width=width, height=height,
    )


def make_scaramuzza(poly, inv_poly, cx, cy, affine=(1.0, 0.0, 0.0),
                    width=640, height=480, dtype=jnp.float32) -> CameraModel:
    """OCam/Scaramuzza omnidirectional polynomial model
    (ScaramuzzaCamera.h:13-16: 5 forward + 20 inverse coefficients,
    center, affine C/D/E)."""
    poly = jnp.asarray(poly, dtype)
    inv_poly = jnp.asarray(inv_poly, dtype)
    poly = jnp.zeros(5, dtype).at[: poly.shape[0]].set(poly[:5])
    inv_poly = jnp.zeros(20, dtype).at[: inv_poly.shape[0]].set(inv_poly[:20])
    return CameraModel(
        fx=jnp.asarray(1.0, dtype), fy=jnp.asarray(1.0, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        dist=jnp.zeros(4, dtype), xi=jnp.asarray(0.0, dtype),
        poly=poly, inv_poly=inv_poly, affine=jnp.asarray(affine, dtype),
        kind=SCARAMUZZA, width=width, height=height,
    )


# ---------------------------------------------------------------------------
# radial-tangential distortion (PinholeCamera::distortion)
# ---------------------------------------------------------------------------

def _radtan_delta(cam: CameraModel, p):
    """Distortion displacement d_u for normalized point p (..., 2)."""
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    mx2 = p[..., 0] * p[..., 0]
    my2 = p[..., 1] * p[..., 1]
    mxy = p[..., 0] * p[..., 1]
    rho2 = mx2 + my2
    rad = k1 * rho2 + k2 * rho2 * rho2
    dx = p[..., 0] * rad + 2.0 * p1 * mxy + p2 * (rho2 + 2.0 * mx2)
    dy = p[..., 1] * rad + 2.0 * p2 * mxy + p1 * (rho2 + 2.0 * my2)
    return jnp.stack([dx, dy], axis=-1)


# ---------------------------------------------------------------------------
# lift / project per model
# ---------------------------------------------------------------------------

_LIFT_ITERS = 8  # PinholeCamera.cc:492


def _pinhole_lift(cam: CameraModel, uv):
    md = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )

    def body(_, mu):
        return md - _radtan_delta(cam, mu)

    mu = jax.lax.fori_loop(0, _LIFT_ITERS, body, md - _radtan_delta(cam, md))
    return jnp.concatenate([mu, jnp.ones_like(mu[..., :1])], axis=-1)


def _pinhole_project(cam: CameraModel, xyz):
    p = xyz[..., :2] / xyz[..., 2:3]
    pd = p + _radtan_delta(cam, p)
    return jnp.stack(
        [cam.fx * pd[..., 0] + cam.cx, cam.fy * pd[..., 1] + cam.cy], axis=-1
    )


def _equi_theta_distort(cam: CameraModel, theta):
    k2, k3, k4, k5 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    t2 = theta * theta
    return theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))


def _equi_lift(cam: CameraModel, uv):
    # invert theta_d = theta(1 + k2 θ² + ...) by fixed-point (reference uses
    # a bespoke polynomial root; fixed-point matches to <1e-10 for |θ|<π/2)
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    theta_d = jnp.sqrt(mx * mx + my * my)
    phi = jnp.arctan2(my, mx)

    def body(_, theta):
        k2, k3, k4, k5 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        t2 = theta * theta
        return theta_d / (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))

    theta = jax.lax.fori_loop(0, 12, body, theta_d)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _equi_project(cam: CameraModel, xyz):
    r = jnp.linalg.norm(xyz[..., :2], axis=-1)
    theta = jnp.arctan2(r, xyz[..., 2])
    theta_d = _equi_theta_distort(cam, theta)
    scale = theta_d / jnp.maximum(r, 1e-12)
    return jnp.stack(
        [cam.fx * scale * xyz[..., 0] + cam.cx, cam.fy * scale * xyz[..., 1] + cam.cy],
        axis=-1,
    )


def _mei_lift(cam: CameraModel, uv):
    md = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )

    def body(_, mu):
        return md - _radtan_delta(cam, mu)

    mu = jax.lax.fori_loop(0, _LIFT_ITERS, body, md - _radtan_delta(cam, md))
    # unproject from unit-sphere model (CataCamera::liftProjective)
    xi = cam.xi
    rho2 = jnp.sum(mu * mu, axis=-1)
    lam = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2)) / (1.0 + rho2)
    z = lam - xi
    return jnp.concatenate([lam[..., None] * mu, z[..., None]], axis=-1) / z[..., None]


def _mei_project(cam: CameraModel, xyz):
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    s = xyz / norm
    denom = s[..., 2] + cam.xi
    p = s[..., :2] / denom[..., None]
    pd = p + _radtan_delta(cam, p)
    return jnp.stack(
        [cam.fx * pd[..., 0] + cam.cx, cam.fy * pd[..., 1] + cam.cy], axis=-1
    )


def _scara_lift(cam: CameraModel, uv):
    """OCAMCamera::liftProjective (ScaramuzzaCamera.cc:599-622).

    OCam convention: ray (xc, yc, -z(φ)) with z from the forward polynomial
    on the affine-corrected radius; the camera looks along -z of the OCam
    frame, so the returned ray's z is positive for points in front."""
    C, D, E = cam.affine[0], cam.affine[1], cam.affine[2]
    xc = uv[..., 0] - cam.cx
    yc = uv[..., 1] - cam.cy
    inv_scale = 1.0 / (C - D * E)
    xa = inv_scale * (xc - D * yc)
    ya = inv_scale * (-E * xc + C * yc)
    phi = jnp.sqrt(xa * xa + ya * ya)
    z = jnp.zeros_like(phi)
    phi_i = jnp.ones_like(phi)
    for i in range(5):
        z = z + phi_i * cam.poly[i]
        phi_i = phi_i * phi
    return jnp.stack([xc, yc, -z], axis=-1)


def _scara_project(cam: CameraModel, xyz):
    """OCAMCamera::spaceToPlane (ScaramuzzaCamera.cc:632-653)."""
    C, D, E = cam.affine[0], cam.affine[1], cam.affine[2]
    norm = jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2)
    theta = jnp.arctan2(-xyz[..., 2], norm)
    rho = jnp.zeros_like(theta)
    theta_i = jnp.ones_like(theta)
    for i in range(20):
        rho = rho + theta_i * cam.inv_poly[i]
        theta_i = theta_i * theta
    inv_norm = 1.0 / jnp.maximum(norm, 1e-12)
    xn = xyz[..., 0] * inv_norm * rho
    yn = xyz[..., 1] * inv_norm * rho
    return jnp.stack([xn * C + yn * D + cam.cx,
                      xn * E + yn + cam.cy], axis=-1)


def lift_projective(cam: CameraModel, uv):
    """Pixel (..., 2) → normalized projective ray (..., 3) with z = 1."""
    if cam.kind == PINHOLE:
        return _pinhole_lift(cam, uv)
    if cam.kind == EQUIDISTANT:
        ray = _equi_lift(cam, uv)
        return ray / ray[..., 2:3]
    if cam.kind == MEI:
        return _mei_lift(cam, uv)
    if cam.kind == SCARAMUZZA:
        ray = _scara_lift(cam, uv)
        return ray / ray[..., 2:3]
    raise ValueError(f"unknown camera kind {cam.kind}")


def space_to_plane(cam: CameraModel, xyz):
    """3-D point (..., 3) in camera frame → pixel (..., 2)."""
    if cam.kind == PINHOLE:
        return _pinhole_project(cam, xyz)
    if cam.kind == EQUIDISTANT:
        return _equi_project(cam, xyz)
    if cam.kind == MEI:
        return _mei_project(cam, xyz)
    if cam.kind == SCARAMUZZA:
        return _scara_project(cam, xyz)
    raise ValueError(f"unknown camera kind {cam.kind}")
