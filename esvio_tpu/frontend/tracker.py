"""Stereo event feature tracker — pure functional step (TPU-native).

Re-designs FeatureTracker::trackEvent + the stereo_event_tracker node hot path
(/root/reference/feature_tracker/src/feature_tracker.cpp:340-603,
stereo_event_tracker_node.cpp:145-344) as one jitted pure function:

    (state, event_chunk_L, event_chunk_R, t_now) → (state', FeaturePacket)

Pipeline per tick (all fixed-capacity, mask-based):
  1. SAE update both cameras (events/sae.py) + exponential time surfaces
  2. temporal LK prev←cur on the left time surface + reverse-flow check ≤0.5 px
  3. FM-RANSAC outlier rejection at virtual focal 460 (frontend/ransac.py)
  4. joint greedy min-dist spacing of survivors (by track count) and fresh
     Arc* corner candidates (in event order, gated by time-surface ≠ 128)
  5. left→right stereo LK association with reverse check
  6. undistortion to the normalized plane + per-feature velocity

The same machinery with image pyramids instead of time surfaces implements the
frame path (trackImage, feature_tracker.cpp:164-338) — see `track_image_pair`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from esvio_tpu.core.camera import CameraModel, lift_projective
from esvio_tpu.events import sae as sae_mod
from esvio_tpu.events import corners as cor_mod
from esvio_tpu.frontend import pyramid, lk, ransac, mask as mask_mod

TS_LK_THRESHOLD = 128.0  # background value of polarity time surfaces


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    width: int = 346
    height: int = 260
    capacity: int = 256          # feature lanes (static)
    cand_capacity: int = 1024    # corner candidates considered per tick
    max_cnt: int = 150
    min_dist: int = 10
    f_threshold: float = 1.0
    decay_ms: float = 20.0
    ignore_polarity: bool = False
    filter_threshold: float = 0.01
    lk_levels: int = 4
    lk_iters: int = 30
    fb_threshold: float = 0.5
    ransac_hypotheses: int = 128
    use_time_surface_gate: bool = True
    equalize: bool = False         # CLAHE on time surfaces / frames (EQUALIZE)
    median_blur_ksize: int = 0     # median_blur_kernel_size (event_detector.cc:263)
    spacing: str = "grid"          # "grid" (parallel WTA) | "greedy" (serial scan)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackerState:
    sae_left: sae_mod.SAEState
    sae_right: sae_mod.SAEState
    prev_pyr: tuple              # left time-surface LK pyramid of previous tick
    pts: jnp.ndarray             # (F, 2) current feature pixels (left)
    ids: jnp.ndarray             # (F,) int32
    track_cnt: jnp.ndarray       # (F,) int32
    valid: jnp.ndarray           # (F,) bool
    prev_un: jnp.ndarray         # (F, 2) normalized coords (left)
    prev_un_right: jnp.ndarray   # (F, 2)
    prev_right_valid: jnp.ndarray  # (F,) bool
    prev_time: jnp.ndarray       # () f32
    next_id: jnp.ndarray         # () int32
    key: jnp.ndarray             # PRNG key for RANSAC


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeaturePacket:
    """One tick of stereo feature observations (→ estimator).

    Mirrors the PointCloud packet layout of the reference
    (stereo_event_tracker_node.cpp:268-342): normalized points, pixel coords,
    velocities; right-camera entries only where stereo association succeeded.
    """

    t: jnp.ndarray
    ids: jnp.ndarray           # (F,) int32
    valid: jnp.ndarray         # (F,) bool
    un: jnp.ndarray            # (F, 2) normalized left
    uv: jnp.ndarray            # (F, 2) pixels left
    vel: jnp.ndarray           # (F, 2) normalized-plane velocity left
    right_valid: jnp.ndarray   # (F,) bool
    un_right: jnp.ndarray      # (F, 2)
    uv_right: jnp.ndarray      # (F, 2)
    vel_right: jnp.ndarray     # (F, 2)
    track_cnt: jnp.ndarray     # (F,) int32 (for keyframe heuristics / debug)


def init_state(cfg: TrackerConfig, key=None, dtype=jnp.float32) -> TrackerState:
    F = cfg.capacity
    zero_img = jnp.zeros((cfg.height, cfg.width), dtype)
    pyr = tuple(
        tuple(x.astype(dtype) for x in lvl)
        for lvl in pyramid.build_lk_pyramid(zero_img, cfg.lk_levels)
    )
    return TrackerState(
        sae_left=sae_mod.init_sae(cfg.height, cfg.width, dtype),
        sae_right=sae_mod.init_sae(cfg.height, cfg.width, dtype),
        prev_pyr=pyr,
        pts=jnp.zeros((F, 2), dtype),
        ids=jnp.full((F,), -1, jnp.int32),
        track_cnt=jnp.zeros((F,), jnp.int32),
        valid=jnp.zeros((F,), bool),
        prev_un=jnp.zeros((F, 2), dtype),
        prev_un_right=jnp.zeros((F, 2), dtype),
        prev_right_valid=jnp.zeros((F,), bool),
        prev_time=jnp.asarray(0.0, dtype),
        next_id=jnp.asarray(0, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(0),
    )


def _compact_order(keep, is_new, F: int):
    """Stable two-group compaction: kept existing lanes first (in lane
    order), then kept new detections (in detection order) — identical result
    to a stable sort on (kept, is_new, index), computed with one `top_k`
    over group-ranked keys.  top_k is the fast selection primitive on TPU;
    scatters with a shared overflow slot serialize, and a full argsort does
    F + C log(F + C) work for F outputs.

    Returns (order (F,) int32 gather indices, valid (F,) bool). Slots past
    the kept count gather unkept lanes — callers mask with `valid`.
    """
    n_all = keep.shape[0]
    i = jnp.arange(n_all, dtype=jnp.float32)   # exact for n_all ≪ 2^24
    key = jnp.where(keep & ~is_new, 3.0 * n_all - i,
                    jnp.where(keep, 2.0 * n_all - i, 1.0 * n_all - i))
    _, order = jax.lax.top_k(key, F)
    valid = jnp.arange(F) < jnp.minimum(jnp.sum(keep.astype(jnp.int32)), F)
    return order.astype(jnp.int32), valid


def _in_border(cfg: TrackerConfig, pts):
    x = jnp.round(pts[..., 0])
    y = jnp.round(pts[..., 1])
    return (x >= 1) & (x < cfg.width - 1) & (y >= 1) & (y < cfg.height - 1)


def _virtual_pixels(cfg: TrackerConfig, un):
    return jnp.stack(
        [un[..., 0] * ransac.FOCAL_VIRTUAL + cfg.width / 2.0,
         un[..., 1] * ransac.FOCAL_VIRTUAL + cfg.height / 2.0], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_event_stereo(cfg: TrackerConfig, cam_left: CameraModel,
                       cam_right: CameraModel, state: TrackerState,
                       chunk_left: sae_mod.EventChunk,
                       chunk_right: sae_mod.EventChunk,
                       t_now) -> Tuple[TrackerState, FeaturePacket]:
    F = cfg.capacity
    C = cfg.cand_capacity
    dtype = state.pts.dtype
    t_now = jnp.asarray(t_now, dtype)

    key, k_ransac = jax.random.split(state.key)

    # ---- 1. SAE + time surfaces — both cameras BATCHED --------------------
    # L and R are independent; vmapping over a leading camera axis halves
    # the serial chain of sorts/scans/convs (each ~5 ms alone on TPU)
    sae_lr = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), state.sae_left, state.sae_right)
    chunk_lr = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), chunk_left, chunk_right)
    sae_lr, _ = jax.vmap(
        lambda s, c: sae_mod.update_sae(s, c, cfg.filter_threshold)
    )(sae_lr, chunk_lr)
    ts_lr = jax.vmap(
        lambda s: sae_mod.time_surface(
            s, t_now, cfg.decay_ms, cfg.ignore_polarity,
            median_blur_ksize=cfg.median_blur_ksize))(sae_lr)
    if cfg.equalize:  # CLAHE (feature_tracker.cpp:375-387)
        from esvio_tpu.frontend.clahe import clahe as _clahe
        ts_lr = jax.vmap(_clahe)(ts_lr)
    pyr_lr = jax.vmap(
        lambda img: pyramid.build_lk_pyramid(img, cfg.lk_levels))(ts_lr)
    sae_l = jax.tree_util.tree_map(lambda x: x[0], sae_lr)
    sae_r = jax.tree_util.tree_map(lambda x: x[1], sae_lr)
    ts_l = ts_lr[0]
    pyr_l = tuple(tuple(x[0] for x in lvl) for lvl in pyr_lr)
    pyr_r = tuple(tuple(x[1] for x in lvl) for lvl in pyr_lr)

    # ---- 2. temporal LK + reverse check (feature_tracker.cpp:410-428) -----
    cur, st = lk.lk_track(state.prev_pyr, pyr_l, state.pts, state.valid,
                          iters=cfg.lk_iters)
    back, st_b = lk.lk_track(pyr_l[:2], state.prev_pyr[:2], cur, st,
                             pts_init=state.pts, iters=cfg.lk_iters)
    fb_ok = jnp.sum((back - state.pts) ** 2, axis=-1) <= cfg.fb_threshold ** 2
    tracked = st & st_b & fb_ok & _in_border(cfg, cur)

    # ---- 3. FM-RANSAC in the virtual-focal frame (rejectWithF_event) ------
    un_prev2 = state.prev_un
    un_cur3 = lift_projective(cam_left, cur)
    un_cur2 = un_cur3[..., :2] / un_cur3[..., 2:3]
    inl, _ = ransac.fundamental_ransac(
        k_ransac, _virtual_pixels(cfg, un_prev2), _virtual_pixels(cfg, un_cur2),
        tracked, cfg.f_threshold, cfg.ransac_hypotheses,
    )
    tracked = jnp.where(jnp.sum(tracked) >= 8, inl & tracked, tracked)
    track_cnt = jnp.where(tracked, state.track_cnt + 1, 0)

    # ---- 4. corner harvest + joint greedy spacing -------------------------
    corner_ok = cor_mod.detect_corners(sae_l, chunk_left, cfg.min_dist)
    if cfg.use_time_surface_gate and not cfg.ignore_polarity:
        ex = jnp.clip(chunk_left.x, 0, cfg.width - 1)
        ey = jnp.clip(chunk_left.y, 0, cfg.height - 1)
        corner_ok = corner_ok & (ts_l[ey, ex] != TS_LK_THRESHOLD)
    # stable compaction of corner events into C candidate slots: top_k over
    # rank keys (corners first, each group in event order) — the TPU-fast
    # selection; the r2 full argsort did E log E work for C outputs
    n_ev = corner_ok.shape[0]
    ev_i = jnp.arange(n_ev, dtype=jnp.float32)   # exact for E ≪ 2^24
    c_key = jnp.where(corner_ok, 2.0 * n_ev - ev_i, 1.0 * n_ev - ev_i)
    _, cand_order = jax.lax.top_k(c_key, C)
    cand_valid = jnp.arange(C) < jnp.sum(corner_ok.astype(jnp.int32))
    cand_x = chunk_left.x[cand_order].astype(dtype)
    cand_y = chunk_left.y[cand_order].astype(dtype)

    # priorities: existing (1e6 + track_cnt) ≫ candidates (1e5 - event rank)
    pri = jnp.concatenate([
        1e6 + track_cnt.astype(dtype),
        1e5 - jnp.arange(C, dtype=dtype),
    ])
    all_x = jnp.concatenate([cur[:, 0], cand_x])
    all_y = jnp.concatenate([cur[:, 1], cand_y])
    all_valid = jnp.concatenate([tracked, cand_valid])
    spacing_fn = mask_mod.grid_spacing if cfg.spacing == "grid" \
        else mask_mod.greedy_spacing
    keep, _ = spacing_fn(
        pri, all_x, all_y, all_valid, cfg.height, cfg.width,
        cfg.min_dist, cfg.max_cnt,
    )
    keep_exist = keep[:F]
    keep_new = keep[F:]

    # ---- compaction: kept existing lanes first, then new detections -------
    new_rank = jnp.cumsum(keep_new.astype(jnp.int32)) - 1
    new_ids = jnp.where(keep_new, state.next_id + new_rank, -1)
    next_id = state.next_id + jnp.sum(keep_new.astype(jnp.int32))

    all_pts = jnp.concatenate([cur, jnp.stack([cand_x, cand_y], axis=-1)])
    all_ids = jnp.concatenate([state.ids, new_ids])
    all_cnt = jnp.concatenate([track_cnt, jnp.ones((C,), jnp.int32)])
    all_keep = keep
    is_new = jnp.concatenate([jnp.zeros((F,), bool), jnp.ones((C,), bool)])
    all_prev_un = jnp.concatenate([state.prev_un, jnp.zeros((C, 2), dtype)])
    all_prev_unr = jnp.concatenate([state.prev_un_right, jnp.zeros((C, 2), dtype)])
    all_prev_rv = jnp.concatenate([state.prev_right_valid, jnp.zeros((C,), bool)])

    order, valid_n = _compact_order(all_keep, is_new, F)
    pts_n = all_pts[order]
    ids_n = jnp.where(valid_n, all_ids[order], -1)
    cnt_n = jnp.where(valid_n, all_cnt[order], 0)
    isnew_n = is_new[order] & valid_n
    prev_un_n = all_prev_un[order]
    prev_unr_n = all_prev_unr[order]
    prev_rv_n = all_prev_rv[order]

    # ---- 5. stereo LK with reverse check (feature_tracker.cpp:490-505) ----
    r_pts, r_st = lk.lk_track(pyr_l, pyr_r, pts_n, valid_n, pts_init=pts_n,
                              iters=cfg.lk_iters)
    # reverse check starts AT the answer — fine levels only (cf. temporal)
    r_back, r_st_b = lk.lk_track(pyr_r[:2], pyr_l[:2], r_pts, r_st,
                                 pts_init=pts_n, iters=cfg.lk_iters)
    r_fb = jnp.sum((r_back - pts_n) ** 2, axis=-1) <= cfg.fb_threshold ** 2
    right_valid = r_st & r_st_b & r_fb & _in_border(cfg, r_pts) & valid_n

    # ---- 6. undistort + velocities ----------------------------------------
    un3 = lift_projective(cam_left, pts_n)
    un = un3[..., :2] / un3[..., 2:3]
    unr3 = lift_projective(cam_right, r_pts)
    unr = unr3[..., :2] / unr3[..., 2:3]

    dt = jnp.maximum(t_now - state.prev_time, 1e-6)
    vel = jnp.where(
        (valid_n & ~isnew_n)[:, None], (un - prev_un_n) / dt, 0.0
    )
    vel_r = jnp.where(
        (right_valid & prev_rv_n & ~isnew_n)[:, None], (unr - prev_unr_n) / dt, 0.0
    )

    packet = FeaturePacket(
        t=t_now, ids=ids_n, valid=valid_n, un=un, uv=pts_n, vel=vel,
        right_valid=right_valid, un_right=unr, uv_right=r_pts, vel_right=vel_r,
        track_cnt=cnt_n,
    )
    new_state = TrackerState(
        sae_left=sae_l, sae_right=sae_r, prev_pyr=pyr_l,
        pts=pts_n, ids=ids_n, track_cnt=cnt_n, valid=valid_n,
        prev_un=un, prev_un_right=unr, prev_right_valid=right_valid,
        prev_time=t_now, next_id=next_id, key=key,
    )
    return new_state, packet


# ---------------------------------------------------------------------------
# image (frame) path — trackImage (feature_tracker.cpp:164-338)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImageTrackerState:
    prev_pyr: tuple
    pts: jnp.ndarray
    ids: jnp.ndarray
    track_cnt: jnp.ndarray
    valid: jnp.ndarray
    prev_un: jnp.ndarray
    prev_un_right: jnp.ndarray
    prev_right_valid: jnp.ndarray
    prev_time: jnp.ndarray
    next_id: jnp.ndarray
    key: jnp.ndarray


def init_image_state(cfg: TrackerConfig, key=None, dtype=jnp.float32,
                     id_offset: int = 1 << 24) -> ImageTrackerState:
    """Image-path state; ids offset so event/image books never collide."""
    F = cfg.capacity
    zero_img = jnp.zeros((cfg.height, cfg.width), dtype)
    pyr = tuple(tuple(x.astype(dtype) for x in lvl)
                for lvl in pyramid.build_lk_pyramid(zero_img, cfg.lk_levels))
    return ImageTrackerState(
        prev_pyr=pyr, pts=jnp.zeros((F, 2), dtype),
        ids=jnp.full((F,), -1, jnp.int32), track_cnt=jnp.zeros((F,), jnp.int32),
        valid=jnp.zeros((F,), bool), prev_un=jnp.zeros((F, 2), dtype),
        prev_un_right=jnp.zeros((F, 2), dtype),
        prev_right_valid=jnp.zeros((F,), bool),
        prev_time=jnp.asarray(0.0, dtype),
        next_id=jnp.asarray(id_offset, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(1),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_image_stereo(cfg: TrackerConfig, cam_left: CameraModel,
                       cam_right: CameraModel, state: ImageTrackerState,
                       img_left, img_right, t_now):
    """Frame path: temporal LK + Shi-Tomasi refill + stereo LK
    (trackImage, feature_tracker.cpp:164-338)."""
    from esvio_tpu.frontend import detect as detect_mod

    F = cfg.capacity
    C = cfg.cand_capacity
    dtype = state.pts.dtype
    t_now = jnp.asarray(t_now, dtype)
    key, k_ransac = jax.random.split(state.key)

    img_l = img_left.astype(dtype)
    img_r = img_right.astype(dtype)
    if cfg.equalize:  # CLAHE (trackImage, feature_tracker.cpp:656)
        from esvio_tpu.frontend.clahe import clahe as _clahe
        img_l = _clahe(img_l)
        img_r = _clahe(img_r)
    # both frames' pyramids batched (independent work, halves serial latency)
    pyr_lr = jax.vmap(
        lambda im: pyramid.build_lk_pyramid(im, cfg.lk_levels)
    )(jnp.stack([img_l, img_r]))
    pyr_l = tuple(tuple(x[0] for x in lvl) for lvl in pyr_lr)
    pyr_r = tuple(tuple(x[1] for x in lvl) for lvl in pyr_lr)

    cur, st = lk.lk_track(state.prev_pyr, pyr_l, state.pts, state.valid,
                          iters=cfg.lk_iters)
    back, st_b = lk.lk_track(pyr_l[:2], state.prev_pyr[:2], cur, st,
                             pts_init=state.pts, iters=cfg.lk_iters)
    fb_ok = jnp.sum((back - state.pts) ** 2, axis=-1) <= cfg.fb_threshold ** 2
    tracked = st & st_b & fb_ok & _in_border(cfg, cur)

    un_cur3 = lift_projective(cam_left, cur)
    un_cur2 = un_cur3[..., :2] / un_cur3[..., 2:3]
    inl, _ = ransac.fundamental_ransac(
        k_ransac, _virtual_pixels(cfg, state.prev_un),
        _virtual_pixels(cfg, un_cur2), tracked, cfg.f_threshold,
        cfg.ransac_hypotheses)
    tracked = jnp.where(jnp.sum(tracked) >= 8, inl & tracked, tracked)
    track_cnt = jnp.where(tracked, state.track_cnt + 1, 0)

    cand_xy, cand_resp, cand_ok = detect_mod.shi_tomasi(
        pyr_l[0][0], max_corners=C, quality_level=0.01)

    pri = jnp.concatenate([
        1e6 + track_cnt.astype(dtype), 1e5 + cand_resp.astype(dtype) * 0.0
        - jnp.arange(C, dtype=dtype),
    ])
    all_x = jnp.concatenate([cur[:, 0], cand_xy[:, 0]])
    all_y = jnp.concatenate([cur[:, 1], cand_xy[:, 1]])
    all_valid = jnp.concatenate([tracked, cand_ok])
    spacing_fn = mask_mod.grid_spacing if cfg.spacing == "grid" \
        else mask_mod.greedy_spacing
    keep, _ = spacing_fn(
        pri, all_x, all_y, all_valid, cfg.height, cfg.width,
        cfg.min_dist, cfg.max_cnt)
    keep_new = keep[F:]

    new_rank = jnp.cumsum(keep_new.astype(jnp.int32)) - 1
    new_ids = jnp.where(keep_new, state.next_id + new_rank, -1)
    next_id = state.next_id + jnp.sum(keep_new.astype(jnp.int32))

    all_pts = jnp.concatenate([cur, cand_xy])
    all_ids = jnp.concatenate([state.ids, new_ids])
    all_cnt = jnp.concatenate([track_cnt, jnp.ones((C,), jnp.int32)])
    is_new = jnp.concatenate([jnp.zeros((F,), bool), jnp.ones((C,), bool)])
    all_prev_un = jnp.concatenate([state.prev_un, jnp.zeros((C, 2), dtype)])
    all_prev_unr = jnp.concatenate([state.prev_un_right, jnp.zeros((C, 2), dtype)])
    all_prev_rv = jnp.concatenate([state.prev_right_valid, jnp.zeros((C,), bool)])

    order, valid_n = _compact_order(keep, is_new, F)
    pts_n = all_pts[order]
    ids_n = jnp.where(valid_n, all_ids[order], -1)
    cnt_n = jnp.where(valid_n, all_cnt[order], 0)
    isnew_n = is_new[order] & valid_n
    prev_un_n = all_prev_un[order]
    prev_unr_n = all_prev_unr[order]
    prev_rv_n = all_prev_rv[order]

    r_pts, r_st = lk.lk_track(pyr_l, pyr_r, pts_n, valid_n, pts_init=pts_n,
                              iters=cfg.lk_iters)
    # reverse check starts AT the answer — fine levels only (cf. temporal)
    r_back, r_st_b = lk.lk_track(pyr_r[:2], pyr_l[:2], r_pts, r_st,
                                 pts_init=pts_n, iters=cfg.lk_iters)
    r_fb = jnp.sum((r_back - pts_n) ** 2, axis=-1) <= cfg.fb_threshold ** 2
    right_valid = r_st & r_st_b & r_fb & _in_border(cfg, r_pts) & valid_n

    un3 = lift_projective(cam_left, pts_n)
    un = un3[..., :2] / un3[..., 2:3]
    unr3 = lift_projective(cam_right, r_pts)
    unr = unr3[..., :2] / unr3[..., 2:3]

    dt = jnp.maximum(t_now - state.prev_time, 1e-6)
    vel = jnp.where((valid_n & ~isnew_n)[:, None], (un - prev_un_n) / dt, 0.0)
    vel_r = jnp.where((right_valid & prev_rv_n & ~isnew_n)[:, None],
                      (unr - prev_unr_n) / dt, 0.0)

    packet = FeaturePacket(
        t=t_now, ids=ids_n, valid=valid_n, un=un, uv=pts_n, vel=vel,
        right_valid=right_valid, un_right=unr, uv_right=r_pts, vel_right=vel_r,
        track_cnt=cnt_n)
    new_state = ImageTrackerState(
        prev_pyr=pyr_l, pts=pts_n, ids=ids_n, track_cnt=cnt_n, valid=valid_n,
        prev_un=un, prev_un_right=unr, prev_right_valid=right_valid,
        prev_time=t_now, next_id=next_id, key=key)
    return new_state, packet
