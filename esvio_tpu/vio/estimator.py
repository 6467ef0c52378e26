"""Sliding-window VIO estimator — the state machine around the solver.

Re-designs the reference Estimator + estimator node hot loop
(/root/reference/esvio_estimator/src/estimator.cpp:204-412, 2650-2771;
stereo_estimator_node.cpp:263-454) as a host-side orchestrator over jitted
pure kernels:

  packets → book insertion + parallax keyframe test → (INITIAL: stereo-PnP
  bootstrap + gyro-bias/gravity alignment) → triangulation → batched GN solve
  → gauge fix → failure detection → marginalization → window slide.

Host Python handles only control flow (the reference does the same with
if/else on flags); every numeric kernel is jit-compiled with static shapes.

Differences vs the reference, by design:
  * initialization visual odometry uses stereo-depth PnP chaining first
    (initialStructureStereo); when stereo depth is unavailable or the chain
    breaks it falls back to the monocular GlobalSFM + with-scale alignment
    path (initialStructure, estimator.cpp:415-558).
  * features without valid depth are excluded from the problem instead of
    entering with INIT_DEPTH = -1 (they are recovered by triangulation later).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.imu import preintegration as pre
from esvio_tpu.init import alignment, pnp, sfm
from esvio_tpu.solver import factors
from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver import marginalization as marg
from esvio_tpu.solver import window as win
from esvio_tpu.vio import feature_manager as fm

WINDOW = win.WINDOW

MARGIN_OLD = 0
MARGIN_SECOND_NEW = 1

# init PnP-chain rotation gate vs the gyro prediction (deg over one ~70 ms
# interval); module-level so tests can probe sensitivity
_GYRO_GATE_DEG = 5.0


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    mode: str = "esvio"            # "esvio" (events+images) or "esio" (events only)
    evt_capacity: int = 128
    img_capacity: int = 128
    imu_capacity: int = 512        # IMU samples per window interval (merged caps)
    min_parallax: float = 10.0 / win.FOCAL   # keyframe gate (esvio.yaml:167)
    g_norm: float = 9.80766
    solver_iters: int = 8
    cauchy_c: float = 1.0
    min_track_for_kf: int = 20     # last_track_num < 20 ⇒ keyframe (:416)
    estimate_extrinsic: int = 0    # 0 fixed, 1 refine, 2 calibrate-from-scratch
    # hand-eye acceptance policy for estimate_extrinsic == 2 (ADVICE r2):
    # False (default, reference semantics) accepts the first solve passing a
    # gate; True holds out for 3 consecutive solves agreeing < 1° before
    # writing/latching — stricter, but under borderline excitation the
    # re-solves can plateau on a biased estimate, so it is opt-in
    ex_calib_require_stable: bool = False
    estimate_td: int = 0           # 1 = solve camera-IMU time offset
    # Sampson-style stereo depth refinement (g_use_stereo_correction,
    # parameters.cpp:48 — reference default TRUE)
    use_stereo_correction: bool = True
    # f32 is the product config: the solver's Jacobi scaling + Schur keep the
    # reduced system well-conditioned in f32 (tests/test_estimator.py carries
    # the f64-vs-f32 ATE ablation); f64 is emulated (slow) on TPU.
    dtype: type = jnp.float32
    # steady-state ticks as ONE fused device program + one fetch (VERDICT r4
    # #2); False forces the general multi-dispatch path (debug / parity
    # tests — tests/test_fused_tick.py asserts the two agree)
    fused: bool = True


@dataclasses.dataclass
class Output:
    t: float
    P: np.ndarray
    Q: np.ndarray
    V: np.ndarray
    solver_flag: str
    marg_flag: int
    # fast-relocalization drift feedback (relo_relative_pose,
    # stereo_double2vector3 :1652-1695): set on the step where a registered
    # loop match was resolved against the window
    relo: Optional[dict] = None
    # keyframe snapshot for the pose graph (pubKeyframe: only MARGIN_OLD
    # frames): dict(stamp, P, Q, ids, pts_w, un)
    keyframe: Optional[dict] = None
    # host-side tracked-feature count of this tick (no extra device fetch)
    n_tracked: Optional[int] = None


def _stack_preints(pres):
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)


# jitted window-state shuffles: these ran as chains of eager ops before —
# every eager primitive is its own ~1 ms dispatch through the device tunnel
# (r4 pipeline profile), so one fused call each matters at tick rate
@jax.jit
def _slide_old_state(ws):
    roll = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
    return dataclasses.replace(
        ws, P=roll(ws.P), Q=roll(ws.Q), V=roll(ws.V),
        Ba=roll(ws.Ba), Bg=roll(ws.Bg))


@jax.jit
def _slide_second_state(ws):
    sh = lambda x: x.at[WINDOW - 1].set(x[WINDOW])
    return dataclasses.replace(
        ws, P=sh(ws.P), Q=sh(ws.Q), V=sh(ws.V), Ba=sh(ws.Ba), Bg=sh(ws.Bg))


@functools.partial(jax.jit, static_argnames=("k",))
def _copy_prev_state(ws, k):
    cp = lambda x: x.at[k].set(x[k - 1])
    return dataclasses.replace(
        ws, P=cp(ws.P), Q=cp(ws.Q), V=cp(ws.V), Ba=cp(ws.Ba), Bg=cp(ws.Bg))


_gauge_fix_jit = jax.jit(win.gauge_fix)


def _stereo_ext_device(ws, l, r):
    """Left→right stereo transform from the window extrinsics, in-graph
    (the fused tick derives Rrl/Trl from the CURRENT ws.ex_q/ex_p instead of
    a host cache, so extrinsic refinement needs no host round trip)."""
    Rl = lie.quat_to_rot(ws.ex_q[l])
    Rr = lie.quat_to_rot(ws.ex_q[r])
    return Rr.T @ Rl, Rr.T @ (ws.ex_p[l] - ws.ex_p[r])


@functools.partial(jax.jit, static_argnames=(
    "has_img", "iters", "cauchy_c", "sc", "kf_ex_idx", "min_track"))
def _fused_tick(ws, book_img, book_evt, prior, pkt_evt, pkt_img,
                imu_dt, imu_acc, imu_gyr, a0s, g0s, imu_mask, imu_valid,
                g, frozen, imu_params, min_parallax, *,
                has_img: bool, iters: int, cauchy_c: float, sc: bool,
                kf_ex_idx: int, min_track: int):
    """The entire NON_LINEAR estimator tick as ONE device program:

      dead-reckon new frame → insert packets → parallax keyframe decision
      (on device) → stereo + multiview triangulation → IMU preintegration →
      window LM solve → gauge fix → failure soft-reset → keyframe snapshot
      → lax.cond(marg_old): marginalize+slide(old | second-new).

    Reference scope: the whole Stereo_processVisual + slideWindow hot loop
    (estimator.cpp:204-308, 1828-2288, 2650-2771).  The host makes exactly
    one dispatch and one device_get per tick (VERDICT r4 #2) — at ~40 ms
    tunnel round trip per blocking fetch this is what makes the MEASURED
    pipeline real-time; the unfused path (kept for INITIAL / relo /
    ex-calib ticks) pays ~15 dispatches + 2 fetches.

    pkt_evt / pkt_img: (ids, valid, un, vel, right_valid, un_r, vel_r)
    tuples; pkt_img is ignored (pass a dummy) when has_img=False.
    Returns (ws', book_img', book_evt', prior', post) where post carries
    every host-consumed output of the tick (pre-slide state, keyframe
    snapshot arrays, decision/diagnostic scalars)."""
    W = WINDOW

    preints = pre.preintegrate_batch(
        imu_dt, imu_acc, imu_gyr, a0s, g0s, ws.Ba[:W], ws.Bg[:W],
        imu_params, imu_mask)

    # dead-reckon the incoming frame from interval W (slot W-1); no-IMU
    # ticks copy the previous state (_propagate_new_frame semantics)
    p9 = jax.tree_util.tree_map(lambda x: x[W - 1], preints)
    Qk = lie.quat_normalize(lie.quat_mul(ws.Q[W - 1], p9.delta_q))
    Vk = ws.V[W - 1] + lie.quat_rotate(ws.Q[W - 1], p9.delta_v) - g * p9.sum_dt
    Pk = ws.P[W - 1] + ws.V[W - 1] * p9.sum_dt \
        + lie.quat_rotate(ws.Q[W - 1], p9.delta_p) - 0.5 * g * p9.sum_dt ** 2
    ok_prop = jnp.any(imu_mask[W - 1])
    ws = dataclasses.replace(
        ws,
        P=ws.P.at[W].set(jnp.where(ok_prop, Pk, ws.P[W - 1])),
        Q=ws.Q.at[W].set(jnp.where(ok_prop, Qk, ws.Q[W - 1])),
        V=ws.V.at[W].set(jnp.where(ok_prop, Vk, ws.V[W - 1])),
        Ba=ws.Ba.at[W].set(ws.Ba[W - 1]),
        Bg=ws.Bg.at[W].set(ws.Bg[W - 1]))

    # packet insertion + keyframe test (stereo_addFeatureCheckParallax)
    td0 = jnp.zeros_like(ws.td)
    (e_ids, e_val, e_un, e_vel, e_rv, e_unr, e_velr) = pkt_evt
    book_evt, n_trk_e, n_drop_e = fm.insert_packet(
        book_evt, e_ids, e_val, e_un, e_vel, e_rv, e_unr, e_velr, td0, W)
    if has_img:
        (i_ids, i_val, i_un, i_vel, i_rv, i_unr, i_velr) = pkt_img
        book_img, n_trk_i, n_drop_i = fm.insert_packet(
            book_img, i_ids, i_val, i_un, i_vel, i_rv, i_unr, i_velr, td0, W)
        par_book, n_trk = book_img, n_trk_i
    else:
        n_drop_i = jnp.asarray(0, n_drop_e.dtype)
        par_book, n_trk = book_evt, n_trk_e
    mean_par, num = fm.mean_parallax(par_book, W)
    is_old = (n_trk < min_track) | (num == 0) | (mean_par >= min_parallax)

    # triangulation with in-graph stereo extrinsics
    rrl_i, trl_i = _stereo_ext_device(ws, 0, 2)
    rrl_e, trl_e = _stereo_ext_device(ws, 1, 3)
    book_img = fm.triangulate_stereo_instant(book_img, rrl_i, trl_i,
                                             stereo_correction=sc)
    book_img = fm.triangulate_multiview(book_img, ws, 0)
    book_evt = fm.triangulate_stereo_instant(book_evt, rrl_e, trl_e,
                                             stereo_correction=sc)
    book_evt = fm.triangulate_multiview(book_evt, ws, 1)

    # window solve + gauge fix + track-failure pruning
    ref_p0, ref_q0 = ws.P[0], ws.Q[0]
    ws, book_img, book_evt, _costs = gn.solve_window(
        ws, book_img, book_evt, preints, imu_valid, prior, g,
        iters=iters, cauchy_c=cauchy_c, frozen=frozen)
    ws = win.gauge_fix(ws, ref_p0, ref_q0)
    book_img = fm.remove_failures(book_img)
    book_evt = fm.remove_failures(book_evt)

    # failure detection: soft bias/velocity reset (estimator.cpp:1793-1825)
    fail = (jnp.linalg.norm(ws.Ba[W]) > 2.5) | (jnp.linalg.norm(ws.Bg[W]) > 1.0)
    ws = dataclasses.replace(
        ws,
        Ba=jnp.where(fail, 0.0, ws.Ba), Bg=jnp.where(fail, 0.0, ws.Bg),
        V=jnp.where(fail, 0.0, ws.V))

    # post snapshot (pre-slide) + keyframe packet for the pose graph
    kf_book = book_img if kf_ex_idx == 0 else book_evt
    kf_pts, kf_valid = fm.world_points(kf_book, ws, kf_ex_idx)
    kf = W - 2
    post = dict(P=ws.P, Q=ws.Q, V=ws.V, Ba=ws.Ba, Bg=ws.Bg,
                kf_obs=kf_book.obs[:, kf], kf_valid=kf_valid,
                kf_ids=kf_book.ids, kf_pts=kf_pts, kf_un=kf_book.un[:, kf],
                marg_old=is_old, n_trk=n_trk, n_drop_e=n_drop_e,
                n_drop_i=n_drop_i, fail=fail, mean_par=mean_par, num=num)

    # marginalize + slide under the on-device keyframe decision
    def old_branch(args):
        ws, bi, be = args
        pr = marg.marginalize_old(ws, bi, be, preints, imu_valid, prior, g,
                                  cauchy_c)
        marg_P, marg_Q = ws.P[0], ws.Q[0]
        ws2 = _slide_old_state(ws)
        bi2 = fm.slide_old(bi, marg_P, marg_Q, ws2.P[0], ws2.Q[0],
                           ws.ex_p[0], ws.ex_q[0])
        be2 = fm.slide_old(be, marg_P, marg_Q, ws2.P[0], ws2.Q[0],
                           ws.ex_p[1], ws.ex_q[1])
        return ws2, bi2, be2, pr

    def second_branch(args):
        ws, bi, be = args
        pr = jax.lax.cond(prior.valid, marg.marginalize_second_new,
                          lambda p: p, prior)
        ws2 = _slide_second_state(ws)
        bi2 = fm.slide_second_new(bi, win.N_STATES - 1)
        be2 = fm.slide_second_new(be, win.N_STATES - 1)
        return ws2, bi2, be2, pr

    ws, book_img, book_evt, prior = jax.lax.cond(
        is_old, old_branch, second_branch, (ws, book_img, book_evt))
    return ws, book_img, book_evt, prior, post


class Estimator:
    """Host-side estimator holding device pytrees + numpy IMU buffers."""

    def __init__(self, cfg: EstimatorConfig, ex_p, ex_q,
                 imu_params: Optional[pre.ImuParams] = None):
        self.cfg = cfg
        dt = cfg.dtype
        self.ws = win.init_window(dt)
        self.ws = dataclasses.replace(
            self.ws, ex_p=jnp.asarray(ex_p, dt), ex_q=jnp.asarray(ex_q, dt))
        self.book_img = win.empty_book(cfg.img_capacity, dt)
        self.book_evt = win.empty_book(cfg.evt_capacity, dt)
        self.prior = gn.empty_prior(dt)
        self.imu_params = imu_params or pre.make_imu_params(
            g_norm=cfg.g_norm, dtype=dt)
        self.g = jnp.asarray([0.0, 0.0, cfg.g_norm], dt)

        self.frame_count = 0
        self.solver_flag = "INITIAL"
        self.timestamps = np.zeros(win.N_STATES)
        # IMU ring buffers per interval (interval k: between frame k-1 and k)
        C = cfg.imu_capacity
        self.imu_dt = np.zeros((win.N_STATES, C))
        self.imu_acc = np.zeros((win.N_STATES, C, 3))
        self.imu_gyr = np.zeros((win.N_STATES, C, 3))
        self.imu_n = np.zeros(win.N_STATES, np.int32)
        self.acc0 = np.zeros(3)
        self.gyr0 = np.zeros(3)
        self.first_imu = False
        self.last_marg = MARGIN_OLD
        self.failures = 0
        self._prior_valid = False     # host mirror of prior.valid
        self._img_any = None          # per-tick cache for _loop_book
        self._seen_img = False        # any image packet inserted yet
        self._post = None             # last tick's batched post-solve fetch
        self.n_solves = 0
        self.lanes_dropped = 0   # new features lost to lane exhaustion
        self._relo = None

        # IMU-rate forward-propagated state (predict()/update(),
        # stereo_estimator_node.cpp:44-112): numpy host state + replay buffer
        # of samples since the newest solved frame
        self._latest = None           # dict(t, P, Q, V, Ba, Bg, acc, gyr)
        self._imu_replay = []         # [(t, acc, gyr), ...]

        # stereo relative extrinsics per modality (cam-left → cam-right)
        self._update_stereo_extrinsics()

        # online camera-IMU rotation calibration (estimate_extrinsic == 2,
        # estimator.cpp:226-242): accumulated (q_cam, q_imu) interval pairs
        self._calib_pairs = []
        self._ex_calib_done = cfg.estimate_extrinsic != 2
        self._ex_calib_stable = 0
        self._ex_calib_last_q = None

    def _update_stereo_extrinsics(self):
        """Recompute cached left→right transforms from the window extrinsics."""
        dt = self.cfg.dtype
        self._rrl = {}
        self._trl = {}
        ex_q = np.asarray(self.ws.ex_q, np.float64)
        ex_p = np.asarray(self.ws.ex_p, np.float64)
        for name, (l, r) in (("img", (0, 2)), ("evt", (1, 3))):
            Rl = np.asarray(lie.quat_to_rot(jnp.asarray(ex_q[l])))
            Rr = np.asarray(lie.quat_to_rot(jnp.asarray(ex_q[r])))
            # x_r = R_rl x_l + t_rl with body_T_cam extrinsics
            Rrl = Rr.T @ Rl
            Trl = Rr.T @ (ex_p[l] - ex_p[r])
            self._rrl[name] = jnp.asarray(Rrl, dt)
            self._trl[name] = jnp.asarray(Trl, dt)

    # ------------------------------------------------------------------ IMU
    def process_imu(self, dt: float, acc, gyr):
        """Buffer one IMU sample into the current interval (processIMU)."""
        if not self.first_imu:
            self.first_imu = True
            self.acc0 = np.asarray(acc, float)
            self.gyr0 = np.asarray(gyr, float)
            return
        k = self.frame_count
        n = self.imu_n[k]
        if n < self.cfg.imu_capacity:
            self.imu_dt[k, n] = dt
            self.imu_acc[k, n] = acc
            self.imu_gyr[k, n] = gyr
            self.imu_n[k] = n + 1
        self.acc0 = np.asarray(acc, float)
        self.gyr0 = np.asarray(gyr, float)

    def predict(self, t: float, acc, gyr):
        """IMU-rate low-latency state propagation (predict(),
        stereo_estimator_node.cpp:44-93): midpoint-integrate the latest state
        forward by one IMU sample; returns (P, Q, V) immediately (numpy, no
        device round-trip).  Re-synced to the solved window by update()."""
        from esvio_tpu.core import lie_np
        acc = np.asarray(acc, float)
        gyr = np.asarray(gyr, float)
        self._imu_replay.append((float(t), acc, gyr))
        g = np.array([0.0, 0.0, self.cfg.g_norm])
        if self._latest is None:
            k = min(self.frame_count, WINDOW)
            self._latest = dict(
                t=float(t), P=np.zeros(3), Q=np.array([1.0, 0, 0, 0]),
                V=np.zeros(3), Ba=np.zeros(3), Bg=np.zeros(3),
                acc=acc, gyr=gyr)
            if self.solver_flag == "NON_LINEAR":
                self._seed_latest_from_window(float(t))
        s = self._latest
        dt = float(t) - s["t"]
        if dt <= 0 or dt > 1.0:
            s["t"], s["acc"], s["gyr"] = float(t), acc, gyr
            return s["P"].copy(), s["Q"].copy(), s["V"].copy()
        un_acc_0 = lie_np.quat_rotate(s["Q"], s["acc"] - s["Ba"]) - g
        un_gyr = 0.5 * (s["gyr"] + gyr) - s["Bg"]
        s["Q"] = lie_np.quat_normalize(
            lie_np.quat_mul(s["Q"], lie_np.delta_q(un_gyr * dt)))
        un_acc_1 = lie_np.quat_rotate(s["Q"], acc - s["Ba"]) - g
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        s["P"] = s["P"] + dt * s["V"] + 0.5 * dt * dt * un_acc
        s["V"] = s["V"] + dt * un_acc
        s["t"], s["acc"], s["gyr"] = float(t), acc, gyr
        return s["P"].copy(), s["Q"].copy(), s["V"].copy()

    def process_imu_and_predict(self, ts, accs, gyrs, prev_t):
        """Batched imu_callback: buffer every sample of (prev_t, t] into the
        current interval AND propagate the IMU-rate state through them.

        Semantics identical to calling process_imu + predict per sample
        (stereo_estimator_node.cpp:173-200), but one call per tick instead
        of one per sample — the per-sample Python loop made estimator-stage
        host time scale with IMU rate (VERDICT r3 #9).  Returns
        (P (n,3), Q (n,4), V (n,3)) numpy arrays of the high-frequency
        odometry states.
        """
        import numpy as np
        ts = np.asarray(ts, float)
        accs = np.asarray(accs, float)
        gyrs = np.asarray(gyrs, float)
        n = len(ts)
        if n == 0:
            return (np.zeros((0, 3)), np.zeros((0, 4)), np.zeros((0, 3)))

        # ---- buffering (process_imu, vectorized) --------------------------
        dts = np.diff(np.concatenate([[prev_t], ts]))
        i0 = 0
        if not self.first_imu:
            self.first_imu = True
            i0 = 1
        m = n - i0
        if m > 0:
            k = self.frame_count
            cur = int(self.imu_n[k])
            take = min(m, self.cfg.imu_capacity - cur)
            if take > 0:
                self.imu_dt[k, cur:cur + take] = dts[i0:i0 + take]
                self.imu_acc[k, cur:cur + take] = accs[i0:i0 + take]
                self.imu_gyr[k, cur:cur + take] = gyrs[i0:i0 + take]
                self.imu_n[k] = cur + take
        self.acc0 = accs[-1].copy()
        self.gyr0 = gyrs[-1].copy()

        # ---- IMU-rate propagation (predict, tight loop) -------------------
        from esvio_tpu.core import lie_np
        P_out = np.empty((n, 3))
        Q_out = np.empty((n, 4))
        V_out = np.empty((n, 3))
        g = np.array([0.0, 0.0, self.cfg.g_norm])
        self._imu_replay.extend(
            (float(ts[k]), accs[k], gyrs[k]) for k in range(n))
        if self._latest is None:
            self._latest = dict(
                t=float(ts[0]), P=np.zeros(3), Q=np.array([1.0, 0, 0, 0]),
                V=np.zeros(3), Ba=np.zeros(3), Bg=np.zeros(3),
                acc=accs[0], gyr=gyrs[0])
            if self.solver_flag == "NON_LINEAR":
                self._seed_latest_from_window(float(ts[0]))
        s = self._latest
        t_c, P, Q, V = s["t"], s["P"], s["Q"], s["V"]
        Ba, Bg, acc_c, gyr_c = s["Ba"], s["Bg"], s["acc"], s["gyr"]
        for k in range(n):
            t_k = float(ts[k])
            dt = t_k - t_c
            if 0 < dt <= 1.0:
                un_acc_0 = lie_np.quat_rotate(Q, acc_c - Ba) - g
                un_gyr = 0.5 * (gyr_c + gyrs[k]) - Bg
                Q = lie_np.quat_normalize(
                    lie_np.quat_mul(Q, lie_np.delta_q(un_gyr * dt)))
                un_acc_1 = lie_np.quat_rotate(Q, accs[k] - Ba) - g
                un_acc = 0.5 * (un_acc_0 + un_acc_1)
                P = P + dt * V + 0.5 * dt * dt * un_acc
                V = V + dt * un_acc
            t_c, acc_c, gyr_c = t_k, accs[k], gyrs[k]
            P_out[k] = P
            Q_out[k] = Q
            V_out[k] = V
        s.update(t=t_c, P=P, Q=Q, V=V, acc=acc_c, gyr=gyr_c)
        return P_out, Q_out, V_out

    def _seed_latest_from_window(self, t):
        k = min(self.frame_count, WINDOW)
        post = self._post
        if post is not None:
            self._latest.update(
                t=t, P=np.asarray(post["P"][k], float),
                Q=np.asarray(post["Q"][k], float),
                V=np.asarray(post["V"][k], float),
                Ba=np.asarray(post["Ba"][k], float),
                Bg=np.asarray(post["Bg"][k], float))
            return
        self._latest.update(
            t=t, P=np.asarray(self.ws.P[k], float),
            Q=np.asarray(self.ws.Q[k], float),
            V=np.asarray(self.ws.V[k], float),
            Ba=np.asarray(self.ws.Ba[k], float),
            Bg=np.asarray(self.ws.Bg[k], float))

    def update_latest(self):
        """Re-seed the IMU-rate state from the newest solved frame and replay
        buffered IMU samples since its stamp (update(),
        stereo_estimator_node.cpp:96-112)."""
        if self._latest is None or self.solver_flag != "NON_LINEAR":
            return
        k = min(self.frame_count, WINDOW)
        t_frame = float(self.timestamps[k])
        self._imu_replay = [(t, a, w) for (t, a, w) in self._imu_replay
                            if t > t_frame]
        self._seed_latest_from_window(t_frame)
        replay = self._imu_replay
        self._imu_replay = []
        for (t, a, w) in replay:
            self.predict(t, a, w)

    def _interval_first_sample(self, k):
        """acc_0/gyr_0 linearization sample for interval k: last sample of k-1."""
        if k == 0 or self.imu_n[k - 1] == 0:
            if self.imu_n[k] > 0:
                return self.imu_acc[k, 0], self.imu_gyr[k, 0]
            return np.zeros(3), np.zeros(3)
        m = self.imu_n[k - 1] - 1
        return self.imu_acc[k - 1, m], self.imu_gyr[k - 1, m]

    def _preintegrate_all(self, ba=None, bg=None):
        """Preintegrate all 10 window intervals (k=1..10 → slots 0..9)."""
        dt = self.cfg.dtype
        a0s = np.zeros((WINDOW, 3))
        g0s = np.zeros((WINDOW, 3))
        for k in range(1, win.N_STATES):
            a0s[k - 1], g0s[k - 1] = self._interval_first_sample(k)
        mask = np.arange(self.cfg.imu_capacity)[None, :] < self.imu_n[1:, None]
        if ba is None:
            ba_all = self.ws.Ba[:WINDOW]
        else:
            ba_all = jnp.tile(jnp.asarray(ba, dt)[None], (WINDOW, 1))
        if bg is None:
            bg_all = self.ws.Bg[:WINDOW]
        else:
            bg_all = jnp.tile(jnp.asarray(bg, dt)[None], (WINDOW, 1))
        return pre.preintegrate_batch(
            jnp.asarray(self.imu_dt[1:], dt), jnp.asarray(self.imu_acc[1:], dt),
            jnp.asarray(self.imu_gyr[1:], dt), jnp.asarray(a0s, dt),
            jnp.asarray(g0s, dt), ba_all, bg_all, self.imu_params,
            jnp.asarray(mask))

    def _propagate_new_frame(self, k):
        """Dead-reckon pose of frame k from frame k-1 via interval-k IMU."""
        if k == 0 or self.imu_n[k] == 0:
            if k > 0:
                self.ws = _copy_prev_state(self.ws, k)
            return
        dt = self.cfg.dtype
        a0, g0 = self._interval_first_sample(k)
        n = int(self.imu_n[k])
        mask = np.arange(self.cfg.imu_capacity) < n
        p = pre.preintegrate_batch(
            jnp.asarray(self.imu_dt[k][None], dt),
            jnp.asarray(self.imu_acc[k][None], dt),
            jnp.asarray(self.imu_gyr[k][None], dt), jnp.asarray(a0[None], dt),
            jnp.asarray(g0[None], dt), self.ws.Ba[k - 1][None],
            self.ws.Bg[k - 1][None], self.imu_params, jnp.asarray(mask[None]))
        p = jax.tree_util.tree_map(lambda x: x[0], p)
        Qk = lie.quat_normalize(lie.quat_mul(self.ws.Q[k - 1], p.delta_q))
        Vk = self.ws.V[k - 1] + lie.quat_rotate(self.ws.Q[k - 1], p.delta_v) \
            - self.g * p.sum_dt
        Pk = self.ws.P[k - 1] + self.ws.V[k - 1] * p.sum_dt \
            + lie.quat_rotate(self.ws.Q[k - 1], p.delta_p) \
            - 0.5 * self.g * p.sum_dt ** 2
        self.ws = dataclasses.replace(
            self.ws,
            P=self.ws.P.at[k].set(Pk), Q=self.ws.Q.at[k].set(Qk),
            V=self.ws.V.at[k].set(Vk),
            Ba=self.ws.Ba.at[k].set(self.ws.Ba[k - 1]),
            Bg=self.ws.Bg.at[k].set(self.ws.Bg[k - 1]),
        )

    # ------------------------------------------------------------- features
    def _insert(self, book, packet, frame_idx):
        """td convention (intentional deviation from the reference): frames
        stay anchored at their CLAIMED stamps — we do not shift measurement
        bundling by the running td the way getMeasurements does
        (stereo_estimator_node.cpp:129, `stamp + estimator.td`).  Under that
        anchoring the full camera-IMU offset must be compensated on every
        observation, so td_obs ≡ 0 and the factor term (td − td_obs)·vel
        shifts each point by the whole td.  Equivalent to the reference's
        (shifted-bundle, cur_td-relative) scheme at first order in td·vel;
        storing the reference's cur_td here WITHOUT shifting the bundling
        makes td estimation divergent (each insertion re-baselines the
        offset) — caught by test_td_estimation_recovers_offset."""
        dt = self.cfg.dtype
        return fm.insert_packet(
            book, jnp.asarray(packet.ids, jnp.int32), jnp.asarray(packet.valid),
            jnp.asarray(packet.un, dt), jnp.asarray(packet.vel, dt),
            jnp.asarray(packet.right_valid), jnp.asarray(packet.un_right, dt),
            jnp.asarray(packet.vel_right, dt), jnp.zeros_like(self.ws.td),
            frame_idx)

    def _packet_arrays(self, packet):
        dt = self.cfg.dtype
        return (jnp.asarray(packet.ids, jnp.int32), jnp.asarray(packet.valid),
                jnp.asarray(packet.un, dt), jnp.asarray(packet.vel, dt),
                jnp.asarray(packet.right_valid),
                jnp.asarray(packet.un_right, dt),
                jnp.asarray(packet.vel_right, dt))

    def _process_packets_fused(self, t: float, pkt_evt, pkt_img) -> Output:
        """Steady-state NON_LINEAR tick through the single-program
        `_fused_tick`: one dispatch + one device_get.  Host work is numpy
        only (IMU ring bookkeeping, output packing)."""
        cfg = self.cfg
        dt = cfg.dtype
        fc = self.frame_count                      # == WINDOW here
        self._img_any = None
        self.timestamps[fc] = t

        a0s = np.zeros((WINDOW, 3))
        g0s = np.zeros((WINDOW, 3))
        for k in range(1, win.N_STATES):
            a0s[k - 1], g0s[k - 1] = self._interval_first_sample(k)
        mask = np.arange(cfg.imu_capacity)[None, :] < self.imu_n[1:, None]
        imu_valid = self._imu_valid()
        frozen = jnp.asarray(self._frozen_mask())
        has_img = pkt_img is not None
        if has_img:
            self._seen_img = True
        kf_ex_idx = 1 if (cfg.mode == "esio" or not self._seen_img) else 0
        pe = self._packet_arrays(pkt_evt)
        pi = self._packet_arrays(pkt_img) if has_img else pe   # dummy when absent

        (self.ws, self.book_img, self.book_evt, self.prior, post_d) = \
            _fused_tick(
                self.ws, self.book_img, self.book_evt, self.prior, pe, pi,
                jnp.asarray(self.imu_dt[1:], dt),
                jnp.asarray(self.imu_acc[1:], dt),
                jnp.asarray(self.imu_gyr[1:], dt),
                jnp.asarray(a0s, dt), jnp.asarray(g0s, dt),
                jnp.asarray(mask), imu_valid, self.g, frozen,
                self.imu_params, jnp.asarray(cfg.min_parallax, dt),
                has_img=has_img, iters=cfg.solver_iters,
                cauchy_c=cfg.cauchy_c, sc=cfg.use_stereo_correction,
                kf_ex_idx=kf_ex_idx, min_track=cfg.min_track_for_kf)
        post = jax.device_get(post_d)              # the ONE fetch of this tick
        marg_flag = MARGIN_OLD if bool(post["marg_old"]) \
            else MARGIN_SECOND_NEW
        self.last_marg = marg_flag
        self.failures += int(post["fail"])
        self.lanes_dropped += int(post["n_drop_e"]) + int(post["n_drop_i"])
        post["n_tracked"] = int(post["n_trk"])

        keyframe = self._keyframe_snapshot(post) \
            if marg_flag == MARGIN_OLD else None
        if marg_flag == MARGIN_OLD:
            self._prior_valid = True
        self._slide_host(marg_flag)                # numpy rings + stamps
        self._post = post
        return self._output(t, marg_flag, relo=None, keyframe=keyframe,
                            post=post)

    def process_packets(self, t: float, pkt_evt, pkt_img=None) -> Output:
        """Main measurement step (Stereo_processVisual, estimator.cpp:204-308)."""
        cfg = self.cfg
        if (cfg.fused and self.solver_flag == "NON_LINEAR"
                and self._ex_calib_done and self._relo is None
                and self.frame_count == WINDOW):
            # hot path: whole tick in one device program (+ one fetch);
            # relo / ex-calib ticks take the general path below
            return self._process_packets_fused(t, pkt_evt, pkt_img)
        if cfg.estimate_extrinsic:
            # the fused path refines extrinsics without touching the host
            # cache — refresh it before any host-cached triangulation here
            self._update_stereo_extrinsics()
        fc = self.frame_count
        self._img_any = None
        self.timestamps[fc] = t
        if fc > 0:
            self._propagate_new_frame(fc)

        # ONE batched device→host fetch for all host-control scalars of this
        # phase: each individual fetch is a full tunnel round trip (~40 ms
        # measured r4) but jax.device_get overlaps them (~1 round trip total)
        self.book_evt, n_trk_e, n_drop_e = self._insert(
            self.book_evt, pkt_evt, fc)
        fetch = dict(n_trk_e=n_trk_e, n_drop_e=n_drop_e)
        if pkt_img is not None:
            self._seen_img = True
            self.book_img, n_trk_i, n_drop_i = self._insert(
                self.book_img, pkt_img, fc)
            fetch.update(n_trk_i=n_trk_i, n_drop_i=n_drop_i)
            par_book = self.book_img
        else:
            par_book = self.book_evt
        if fc >= 2:
            mean_par_d, num_d = fm.mean_parallax(par_book, fc)
            fetch.update(mean_par=mean_par_d, num=num_d)
        vals = jax.device_get(fetch)
        self.lanes_dropped += int(vals["n_drop_e"]) \
            + int(vals.get("n_drop_i", 0))
        n_tracked = int(vals["n_trk_i" if pkt_img is not None else "n_trk_e"])

        # online extrinsic-rotation calibration (estimate_extrinsic == 2,
        # estimator.cpp:226-242) — runs until the hand-eye solve converges
        if not self._ex_calib_done and fc > 0:
            self._ex_rotation_step(fc, par_book,
                                   0 if par_book is self.book_img else 1)

        # keyframe test (stereo_addFeatureCheckParallax :416-425)
        if fc < 2 or n_tracked < cfg.min_track_for_kf:
            marg_flag = MARGIN_OLD
        else:
            if int(vals["num"]) == 0 \
                    or float(vals["mean_par"]) >= cfg.min_parallax:
                marg_flag = MARGIN_OLD
            else:
                marg_flag = MARGIN_SECOND_NEW
        self.last_marg = marg_flag

        if self.solver_flag == "INITIAL":
            if fc < WINDOW:
                self.frame_count += 1
                return self._output(t, marg_flag)
            # reference gates initialization on extrinsic calibration
            # convergence (estimator.cpp:246: ESTIMATE_EXTRINSIC != 2)
            ok = self._ex_calib_done and (
                self._try_initialize() or self._try_initialize_mono())
            if not ok:
                self._slide(MARGIN_OLD, skip_marg=True)
                return self._output(t, marg_flag)
            self.solver_flag = "NON_LINEAR"

        # triangulate + solve + marginalize + slide
        self._triangulate()
        preints = self._preintegrate_all()
        imu_valid = self._imu_valid()
        ref_p0, ref_q0 = self.ws.P[0], self.ws.Q[0]
        relo_prep = self._prepare_relo()
        if relo_prep is not None and relo_prep["n"] >= 8:
            # in-window relocalization: the old keyframe's pose is an extra
            # parameter block jointly refined with the window against the
            # robust relo rows (estimator.cpp:1988-2022)
            dt = cfg.dtype
            relo = relo_prep["relo"]
            # the relo pose block is SEEDED from the matched window frame's
            # own pose (setReloFrame: relo_Pose[j] = para_Pose[i][j],
            # estimator.cpp:2789) — the payload's old-KF pose lives in the
            # loop-corrected world and must not touch the VIO-frame solve
            ri = relo_prep["i"]
            (self.ws, self.book_img, self.book_evt, costs, rP, rQ) = \
                gn.solve_window_relo(
                    self.ws, self.book_img, self.book_evt, preints, imu_valid,
                    self.prior, self.g,
                    jnp.asarray(self.ws.P[ri], dt),
                    jnp.asarray(self.ws.Q[ri], dt),
                    jnp.asarray(relo_prep["obs"], dt),
                    jnp.asarray(relo_prep["lanes"]),
                    jnp.asarray(relo_prep["valid"]),
                    relo_book=relo_prep["book"], iters=cfg.solver_iters,
                    cauchy_c=cfg.cauchy_c, frozen=self._frozen_mask())
            # the gauge correction applies to the relo pose too (:1652-1695)
            rot, q_rot, p0 = win.gauge_transform(self.ws, ref_p0, ref_q0)
            rP = np.asarray(rot) @ (np.asarray(rP) - np.asarray(p0)) \
                + np.asarray(ref_p0)
            rQ = np.asarray(lie.quat_normalize(lie.quat_mul(q_rot, rQ)))
            relo_prep["refined"] = (rP, rQ)
        else:
            self.ws, self.book_img, self.book_evt, costs = gn.solve_window(
                self.ws, self.book_img, self.book_evt, preints, imu_valid,
                self.prior, self.g, iters=cfg.solver_iters,
                cauchy_c=cfg.cauchy_c, frozen=self._frozen_mask())
        self.ws = _gauge_fix_jit(self.ws, ref_p0, ref_q0)
        if cfg.estimate_extrinsic:
            # the solver refines ex_q/ex_p — refresh the cached left→right
            # stereo transforms used by instant triangulation (ADVICE r2)
            self._update_stereo_extrinsics()
        self.book_img = fm.remove_failures(self.book_img)
        self.book_evt = fm.remove_failures(self.book_evt)
        post = self._post_fetch(marg_flag, n_tracked)
        self._failure_detection(post)

        relo = self._finish_relo(relo_prep)
        keyframe = self._keyframe_snapshot(post) \
            if marg_flag == MARGIN_OLD else None

        if marg_flag == MARGIN_OLD:
            self.prior = marg.marginalize_old(
                self.ws, self.book_img, self.book_evt, preints, imu_valid,
                self.prior, self.g, cfg.cauchy_c)
            self._prior_valid = True
        else:
            if self._prior_valid:
                self.prior = marg.marginalize_second_new(self.prior)
        self._slide(marg_flag)
        # post-slide window state at index WINDOW is unchanged by either
        # slide (the roll duplicates the last slot) — update_latest reuses
        # this tick's fetch instead of five more round trips
        self._post = post
        return self._output(t, marg_flag, relo=relo, keyframe=keyframe,
                            post=post)

    # -------------------------------------------- extrinsic self-calibration
    def _interval_preint(self, k, ba=None, bg=None):
        """Preintegrate one window interval (zero-bias default)."""
        dt = self.cfg.dtype
        a0, g0 = self._interval_first_sample(k)
        mask = np.arange(self.cfg.imu_capacity) < int(self.imu_n[k])
        p = pre.preintegrate_batch(
            jnp.asarray(self.imu_dt[k][None], dt),
            jnp.asarray(self.imu_acc[k][None], dt),
            jnp.asarray(self.imu_gyr[k][None], dt), jnp.asarray(a0[None], dt),
            jnp.asarray(g0[None], dt),
            jnp.asarray((ba if ba is not None else np.zeros(3))[None], dt),
            jnp.asarray((bg if bg is not None else np.zeros(3))[None], dt),
            self.imu_params, jnp.asarray(mask[None]))
        return jax.tree_util.tree_map(lambda x: x[0], p)

    def _ex_rotation_step(self, fc, book, ex_idx):
        """One CalibrationExRotation round (initial_ex_rotation.cpp via
        estimator.cpp:226-242): camera relative rotation between frames
        fc-1 → fc from the essential matrix + the interval's preintegrated
        body rotation; solve the hand-eye system once ≥ WINDOW pairs exist."""
        from esvio_tpu.init import ex_rotation, relative_pose
        dt = self.cfg.dtype
        corr = np.asarray(book.obs[:, fc - 1] & book.obs[:, fc] & book.active)
        if corr.sum() < 9 or self.imu_n[fc] == 0:
            return
        p1 = jnp.asarray(np.asarray(book.un[:, fc - 1]), dt)
        p2 = jnp.asarray(np.asarray(book.un[:, fc]), dt)
        key = jax.random.PRNGKey((int(self.timestamps[fc] * 1e4) + fc)
                                 & 0x7FFFFFFF)
        ok, R12 = relative_pose.solve_relative_rotation(
            key, p1, p2, jnp.asarray(corr))
        if not bool(ok):
            return
        q_cam = np.asarray(lie.rot_to_quat(jnp.asarray(R12)))
        q_imu = np.asarray(self._interval_preint(fc).delta_q)
        self._calib_pairs.append((q_cam, q_imu))
        self._calib_pairs = self._calib_pairs[-50:]
        if len(self._calib_pairs) < WINDOW:
            return
        # pad the pair buffer to a power-of-two bucket (one compile per
        # bucket, not per count — see pnp.pad_points)
        n_pairs = len(self._calib_pairs)
        b = max(16, 1 << (n_pairs - 1).bit_length())
        qc_b = np.zeros((b, 4))
        qi_b = np.zeros((b, 4))
        qc_b[:, 0] = 1.0
        qi_b[:, 0] = 1.0
        qc_b[:n_pairs] = np.stack([p[0] for p in self._calib_pairs])
        qi_b[:n_pairs] = np.stack([p[1] for p in self._calib_pairs])
        q_c = jnp.asarray(qc_b, dt)
        q_i = jnp.asarray(qi_b, dt)
        pair_valid = jnp.asarray(np.arange(b) < n_pairs)
        # Huber weights use the freshest estimate: the internal candidate
        # while the stability window is open (ws.ex_q is only written on
        # acceptance), else the window extrinsic
        ric0 = jnp.asarray(self._ex_calib_last_q, dt) \
            if self._ex_calib_last_q is not None else self.ws.ex_q[ex_idx]
        q, ok, S = ex_rotation.calibrate_ex_rotation(q_c, q_i, ric0,
                                                     valid=pair_valid)
        if bool(ok):
            # Acceptance (→ ESTIMATE_EXTRINSIC = 1 analog).  The reference's
            # absolute gate (ric_cov > 0.25) accepts immediately; the relaxed
            # scale-invariant gate can fire under weaker excitation, so it
            # must produce a STABLE estimate (< 1° change across 3
            # consecutive solves) before anything is written — writing every
            # round would jitter the extrinsic (and the stereo depths built
            # from it) by degrees while the pair buffer is still short,
            # starving initialization (ADVICE r2 + observed in
            # test_online_ex_rotation_calibration).
            accept = float(S[2]) > 0.25 \
                or not self.cfg.ex_calib_require_stable
            if not accept:
                qn = np.asarray(q, float)
                if self._ex_calib_last_q is not None:
                    d = abs(float(np.clip(np.abs(qn @ self._ex_calib_last_q),
                                          0.0, 1.0)))
                    ang_deg = 2.0 * np.degrees(np.arccos(d))
                    self._ex_calib_stable = self._ex_calib_stable + 1 \
                        if ang_deg < 1.0 else 0
                self._ex_calib_last_q = qn
                accept = self._ex_calib_stable >= 3
            if accept:
                self.ws = dataclasses.replace(
                    self.ws, ex_q=self.ws.ex_q.at[ex_idx].set(
                        jnp.asarray(q, dt)))
                self._update_stereo_extrinsics()
                self._ex_calib_done = True

    # ------------------------------------------------------- initialization
    def _try_initialize(self) -> bool:
        """Stereo-depth PnP-chain bootstrap + visual-IMU alignment
        (initialStructureStereo, estimator.cpp:706-856 + :1170-1264)."""
        cfg = self.cfg
        dt = cfg.dtype
        book = self.book_evt if cfg.mode == "esio" or not bool(
            jnp.any(self.book_img.active)) else self.book_img
        ex_idx = 1 if book is self.book_evt else 0
        name = "evt" if book is self.book_evt else "img"
        Rex = lie.quat_to_rot(self.ws.ex_q[ex_idx])
        tex = self.ws.ex_p[ex_idx]

        preints = self._preintegrate_all(ba=np.zeros(3), bg=np.zeros(3))

        # excitation check (:709-735) — warn only, as the reference proceeds
        dv = np.asarray(preints.delta_v)
        sdt = np.maximum(np.asarray(preints.sum_dt), 1e-6)
        g_est = np.linalg.norm(dv / sdt[:, None], axis=-1)
        if g_est.var() < 0.25:
            pass  # low excitation — continue anyway (reference logs only)

        # per-frame instant stereo depths (anchored at each frame)
        un = np.asarray(book.un)
        un_r = np.asarray(book.un_r)
        obs = np.asarray(book.obs)
        stereo = np.asarray(book.stereo)
        active = np.asarray(book.active)

        # vectorized per-(lane, frame) instant stereo depths + latest-anchor
        # table — one jitted kernel instead of O(L·F) host SVDs
        Z = np.asarray(fm.stereo_depth_table(
            book.un, book.un_r, book.stereo, self._rrl[name],
            self._trl[name]))
        # anchor = NEWEST stereo-observed earlier frame (the lane is dropped
        # if that frame's depth fails the gates — same rule as the scalar
        # loop this replaces)
        anc = np.where(obs & stereo, np.arange(win.N_STATES)[None, :], -1)
        anchor_upto = np.maximum.accumulate(anc, axis=1)  # latest anchor ≤ e

        # chain camera poses with PnP: world points from stereo depth at ANY
        # earlier frame with known pose (robust to brief tracking blackouts)
        R_wc = [np.eye(3)]
        t_wc = [np.zeros(3)]

        # gyro-predicted camera-frame relative rotations per interval: the
        # zero-bias preintegrated Δq mapped through the extrinsic,
        # ΔR_cam = Rexᵀ·ΔR_body·Rex.  Used to SEED each PnP and to GATE its
        # rotation: at init the stereo depths are at their noisiest (small
        # disparity), and an unchecked PnP chain accumulates rotation drift
        # that solveGyroscopeBias then absorbs as a phantom bias (r5: a 9°
        # PnP jump became Bg ≈ 0.26 rad/s and a velocity runaway; the bias
        # random-walk weights make a wrong init bias quasi-permanent).
        Rex_np = np.asarray(Rex)
        dR_cam = []
        for k in range(win.N_STATES - 1):
            dR_b = np.asarray(lie.quat_to_rot(preints.delta_q[k]))
            dR_cam.append(Rex_np.T @ dR_b @ Rex_np)
        GYRO_GATE_DEG = _GYRO_GATE_DEG

        def rot_angle_deg(Ra, Rb):
            c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
            return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))

        def translation_only(R_cw, pts_w, obs2):
            """Linear LS for t given fixed rotation: for each point,
            u·(r3·p + tz) = r1·p + tx, v·(r3·p + tz) = r2·p + ty."""
            P3 = np.asarray(pts_w)
            O2 = np.asarray(obs2)
            rp = P3 @ R_cw.T                    # (N, 3) rotated points
            A = np.zeros((2 * len(P3), 3))
            b = np.zeros(2 * len(P3))
            A[0::2, 0] = 1.0
            A[0::2, 2] = -O2[:, 0]
            b[0::2] = O2[:, 0] * rp[:, 2] - rp[:, 0]
            A[1::2, 1] = 1.0
            A[1::2, 2] = -O2[:, 1]
            b[1::2] = O2[:, 1] * rp[:, 2] - rp[:, 1]
            t, *_ = np.linalg.lstsq(A, b, rcond=None)
            return t

        def hybrid_step(f):
            """relativePoseHybrid fallback when the PnP chain breaks:
            E-matrix rotation + depth-anchored metric translation f-1 → f
            (solveRelativeHybrid, solve_5pts.cpp:247-302)."""
            from esvio_tpu.init import relative_pose
            corr = active & obs[:, f - 1] & obs[:, f]
            if corr.sum() < 12:
                return None
            depth1 = np.where(corr, Z[:, f - 1], -1.0)
            key = jax.random.PRNGKey((f * 9973 + 17) & 0x7FFFFFFF)
            ok, R12, t12, n_good = relative_pose.solve_relative_hybrid(
                key, jnp.asarray(un[:, f - 1], dt), jnp.asarray(un[:, f], dt),
                jnp.asarray(depth1, dt), jnp.asarray(corr))
            if not bool(ok):
                return None
            R12 = np.asarray(R12)
            t12 = np.asarray(t12)
            # x_{f-1} = R12 x_f + t12  ⇒  cam_f→world = (cam_{f-1}→world)∘R12
            return R_wc[f - 1] @ R12, R_wc[f - 1] @ t12 + t_wc[f - 1]

        for f in range(1, win.N_STATES):
            a = anchor_upto[:, f - 1]
            sel = active & obs[:, f] & (a >= 0) \
                & (Z[np.arange(len(a)), np.maximum(a, 0)] > 0)
            idxs = np.nonzero(sel)[0]
            if len(idxs):
                zs = Z[idxs, a[idxs]]
                pc = np.stack([un[idxs, a[idxs], 0] * zs,
                               un[idxs, a[idxs], 1] * zs, zs], -1)
                Rw = np.stack([R_wc[e] for e in a[idxs]])
                tw = np.stack([t_wc[e] for e in a[idxs]])
                pts_w = list(np.einsum("nij,nj->ni", Rw, pc) + tw)
                obs2 = list(un[idxs, f])
            else:
                pts_w, obs2 = [], []
            # gyro-predicted cam→world rotation for this frame
            R_pred = R_wc[f - 1] @ dR_cam[f - 1]

            def rot_gated(R_new, t_new, pts_w=pts_w, obs2=obs2,
                          R_pred=R_pred):
                """Accept the visual rotation only when it agrees with the
                gyro over the interval; otherwise keep the gyro rotation and
                re-solve the translation linearly (rotation is the quantity
                the gyro measures directly — the visual chain only has to
                supply the metric translation)."""
                if rot_angle_deg(R_new, R_pred) <= GYRO_GATE_DEG:
                    return R_new, t_new
                if len(pts_w) >= 6:
                    t_cam = translation_only(R_pred.T, pts_w, obs2)
                    C = -R_pred @ t_cam
                    return R_pred, C
                return R_pred, t_new

            if len(pts_w) < 6:
                alt = hybrid_step(f)
                if alt is None:
                    if getattr(self, "debug", False):
                        print(f"init: frame {f}: only {len(pts_w)} PnP points"
                              f" and hybrid fallback failed")
                    return False
                Rg, tg = rot_gated(alt[0], alt[1])
                R_wc.append(Rg)
                t_wc.append(tg)
                continue
            # fixed bucket = lane capacity: per-frame point counts vary
            # run-to-run (f32 gate flips), and pow2 bucketing then compiles
            # fresh pnp_gn variants DURING the measured run (~1 s each
            # through the tunnel; seen in the r5 pipeline profile)
            pts_p, obs_p, val_p = pnp.pad_points(
                pts_w, obs2, min_size=int(un.shape[0]))
            t0 = t_wc[f - 1]
            # best-of-two seeds: the gyro-chain prediction (protects against
            # visual jumps becoming phantom biases, r5) AND the previous
            # frame's solution (the r4 basin — the gyro seed alone moved
            # some noisy blob-texture chains into a divergent GN basin and
            # broke default-config init, caught by test_run_cli)
            best = None
            for R0 in (R_pred.T, R_wc[f - 1].T):
                R_c, tt_c, err_c = pnp.pnp_gn(
                    jnp.asarray(pts_p, dt), jnp.asarray(obs_p, dt),
                    jnp.asarray(val_p), jnp.asarray(R0, dt),
                    jnp.asarray(t0, dt), iters=15)
                err_c = float(err_c)
                if best is None or err_c < best[2]:
                    best = (R_c, tt_c, err_c)
            R, tt, err = best
            if float(err) > 5.0 / win.FOCAL:
                alt = hybrid_step(f)
                if alt is None:
                    if getattr(self, "debug", False):
                        print(f"init: frame {f}: PnP err "
                              f"{float(err)*win.FOCAL:.2f} px, no hybrid")
                    return False
                Rg, tg = rot_gated(alt[0], alt[1])
                R_wc.append(Rg)
                t_wc.append(tg)
                continue
            Rg, tg = rot_gated(np.asarray(R).T, np.asarray(tt))
            R_wc.append(Rg)
            t_wc.append(tg)

        # body rotations / camera centers for alignment
        Rex_n = np.asarray(Rex)
        tex_n = np.asarray(tex)
        Rs_body = np.stack([Rc @ Rex_n.T for Rc in R_wc])
        T_cam = np.stack(t_wc)

        # gyro bias (solveGyroscopeBias) + repropagate
        dbg = alignment.solve_gyroscope_bias(
            jnp.asarray(Rs_body, dt),
            preints.jacobian[:, pre.O_R:pre.O_R + 3, pre.O_BG:pre.O_BG + 3],
            preints.delta_q)
        bg = np.asarray(dbg)
        # plausibility gate: a solved bias ≫ any real MEMS gyro bias means
        # the visual rotations are corrupt, and the stiff bias random walk
        # makes a wrong init bias quasi-permanent in the window solver —
        # better to fail init and retry on the next window
        if np.linalg.norm(bg) > 0.15:
            if getattr(self, "debug", False):
                print(f"init: implausible gyro bias |bg|="
                      f"{np.linalg.norm(bg):.3f} rad/s — rejecting window")
            return False
        preints = self._preintegrate_all(ba=np.zeros(3), bg=bg)

        ok, g_b0, v_body = alignment.linear_alignment_with_depth(
            jnp.asarray(Rs_body, dt), jnp.asarray(T_cam, dt),
            preints.delta_p, preints.delta_v, preints.sum_dt,
            jnp.asarray(tex_n, dt), cfg.g_norm)
        if not bool(ok):
            if getattr(self, "debug", False):
                print(f"init: alignment failed, |g|={float(jnp.linalg.norm(g_b0)):.3f}")
            return False

        return self._apply_alignment(Rs_body, T_cam, v_body, g_b0, bg, tex_n)

    def _apply_alignment(self, Rs_body, T_cam, v_body, g_b0, bg, tex_n) -> bool:
        """Gravity-align the world frame and write the window state
        (visualInitialAlign{,WithDepth}, estimator.cpp:1197-1262).  T_cam are
        metric camera centers in the c0 visual frame; v_body body-frame
        velocities; g_b0 gravity in c0."""
        dt = self.cfg.dtype
        R0 = np.asarray(lie.g2R(g_b0))
        yaw = np.asarray(lie.rot_to_ypr(jnp.asarray(
            R0 @ Rs_body[0], dt)))[0]
        R0 = np.asarray(lie.ypr_to_rot(jnp.asarray([-yaw, 0.0, 0.0], dt))) @ R0

        Rs_w = np.einsum("ij,fjk->fik", R0, Rs_body)
        P_w = (T_cam @ R0.T) - np.einsum("fij,j->fi", Rs_w, tex_n)
        P_w = P_w - P_w[0]
        V_w = np.einsum("fij,fj->fi", Rs_w, np.asarray(v_body))

        Q_w = np.asarray(lie.rot_to_quat(jnp.asarray(Rs_w, dt)))
        self.ws = dataclasses.replace(
            self.ws,
            P=jnp.asarray(P_w, dt), Q=jnp.asarray(Q_w, dt),
            V=jnp.asarray(V_w, dt),
            Ba=jnp.zeros((win.N_STATES, 3), dt),
            Bg=jnp.tile(jnp.asarray(bg, dt), (win.N_STATES, 1)),
        )
        # reset depths; they are re-triangulated with the aligned poses
        self.book_img = dataclasses.replace(
            self.book_img,
            depth_valid=jnp.zeros_like(self.book_img.depth_valid),
            inv_depth=jnp.zeros_like(self.book_img.inv_depth))
        self.book_evt = dataclasses.replace(
            self.book_evt,
            depth_valid=jnp.zeros_like(self.book_evt.depth_valid),
            inv_depth=jnp.zeros_like(self.book_evt.inv_depth))
        return True

    def _try_initialize_mono(self) -> bool:
        """Monocular fallback: global SFM (up to scale) + with-scale
        visual-IMU alignment (initialStructure, estimator.cpp:415-558 +
        visualInitialAlign).  Used when stereo depth is unavailable or the
        stereo PnP chain breaks."""
        cfg = self.cfg
        dt = cfg.dtype
        book = self.book_evt if cfg.mode == "esio" or not bool(
            jnp.any(self.book_img.active)) else self.book_img
        ex_idx = 1 if book is self.book_evt else 0
        Rex = lie.quat_to_rot(self.ws.ex_q[ex_idx])
        tex = self.ws.ex_p[ex_idx]

        obs = np.asarray(book.un)                       # (L, F, 2)
        mask = np.asarray(book.obs) & np.asarray(book.active)[:, None]
        key = jax.random.PRNGKey(int(self.timestamps[0] * 1e3) & 0x7FFFFFFF)
        l, R_rel, t_rel = sfm.find_frame_l(key, obs, mask)
        if l is None:
            if getattr(self, "debug", False):
                print("mono init: no frame with enough parallax")
            return False
        ok, R_wc, t_wc, _, _ = sfm.construct(
            key, obs, mask, l, R_rel, t_rel,
            debug=getattr(self, "debug", False))
        if not ok:
            return False

        Rex_n = np.asarray(Rex)
        tex_n = np.asarray(tex)
        # cam→c0 rotations / camera centers from world→cam SFM output
        R_cw = np.transpose(R_wc, (0, 2, 1))
        C = -np.einsum("fij,fj->fi", R_cw, t_wc)
        Rs_body = np.einsum("fij,kj->fik", R_cw, Rex_n)   # R_cw @ Rexᵀ

        preints = self._preintegrate_all(ba=np.zeros(3), bg=np.zeros(3))
        dbg = alignment.solve_gyroscope_bias(
            jnp.asarray(Rs_body, dt),
            preints.jacobian[:, pre.O_R:pre.O_R + 3, pre.O_BG:pre.O_BG + 3],
            preints.delta_q)
        bg = np.asarray(dbg)
        preints = self._preintegrate_all(ba=np.zeros(3), bg=bg)

        ok, g_b0, v_body, s = alignment.linear_alignment(
            jnp.asarray(Rs_body, dt), jnp.asarray(C, dt),
            preints.delta_p, preints.delta_v, preints.sum_dt,
            jnp.asarray(tex_n, dt), cfg.g_norm)
        if not bool(ok) or float(s) <= 0:
            if getattr(self, "debug", False):
                print(f"mono init: alignment failed "
                      f"(|g|={float(jnp.linalg.norm(g_b0)):.3f}, s={float(s):.3f})")
            return False
        return self._apply_alignment(
            Rs_body, float(s) * C, v_body, g_b0, bg, tex_n)

    # ------------------------------------------------------------- helpers
    def _triangulate(self):
        sc = self.cfg.use_stereo_correction
        self.book_img = fm.triangulate_stereo_instant(
            self.book_img, self._rrl["img"], self._trl["img"],
            stereo_correction=sc)
        self.book_img = fm.triangulate_multiview(self.book_img, self.ws, 0)
        self.book_evt = fm.triangulate_stereo_instant(
            self.book_evt, self._rrl["evt"], self._trl["evt"],
            stereo_correction=sc)
        self.book_evt = fm.triangulate_multiview(self.book_evt, self.ws, 1)

    def _frozen_mask(self):
        """Ceres SetParameterBlockConstant analog (estimator.cpp:1848-1884):
        extrinsics frozen unless estimate_extrinsic, right extrinsics frozen
        for the first 30 solves either way, td frozen unless estimate_td."""
        cfg = self.cfg
        frozen = np.zeros(win.DIM_ALL, bool)
        if not cfg.estimate_extrinsic:
            frozen[win.OFF_EX:win.OFF_TD] = True
        elif self.n_solves < 30:
            frozen[win.OFF_EX + 12:win.OFF_TD] = True   # right cam/event
        if not cfg.estimate_td:
            frozen[win.OFF_TD] = True
        self.n_solves += 1
        return jnp.asarray(frozen)

    def _imu_valid(self):
        sums = np.array([self.imu_dt[k, :self.imu_n[k]].sum()
                         for k in range(1, win.N_STATES)])
        return jnp.asarray((sums > 0) & (sums <= 10.0))

    def _failure_detection(self, post):
        """Soft bias/velocity reset (failureDetection :1793-1825).  Reads
        the batched post-solve fetch; refreshes it on the (rare) reset."""
        ba = post["Ba"][WINDOW]
        bg = post["Bg"][WINDOW]
        if np.linalg.norm(ba) > 2.5 or np.linalg.norm(bg) > 1.0:
            self.failures += 1
            self.ws = dataclasses.replace(
                self.ws,
                Ba=jnp.zeros_like(self.ws.Ba), Bg=jnp.zeros_like(self.ws.Bg),
                V=jnp.zeros_like(self.ws.V))
            post.update(jax.device_get(dict(
                V=self.ws.V, Ba=self.ws.Ba, Bg=self.ws.Bg)))

    def _slide_host(self, marg_flag):
        """Host-side (numpy) part of the window slide: timestamps + IMU
        rings.  The fused tick slides the device state in-graph and calls
        only this."""
        if marg_flag == MARGIN_OLD:
            self.timestamps[:-1] = self.timestamps[1:]
            self.imu_dt[:-1] = self.imu_dt[1:]
            self.imu_acc[:-1] = self.imu_acc[1:]
            self.imu_gyr[:-1] = self.imu_gyr[1:]
            self.imu_n[:-1] = self.imu_n[1:]
            self.imu_n[-1] = 0
        else:
            k = WINDOW
            # merge IMU interval k into k-1... slot k-1 takes frame k state
            n9, n10 = self.imu_n[k - 1], self.imu_n[k]
            take = min(int(n10), self.cfg.imu_capacity - int(n9))
            self.imu_dt[k - 1, n9:n9 + take] = self.imu_dt[k, :take]
            self.imu_acc[k - 1, n9:n9 + take] = self.imu_acc[k, :take]
            self.imu_gyr[k - 1, n9:n9 + take] = self.imu_gyr[k, :take]
            self.imu_n[k - 1] = n9 + take
            self.imu_n[k] = 0
            self.timestamps[k - 1] = self.timestamps[k]

    def _slide(self, marg_flag, skip_marg=False):
        """Window slide (slideWindow, estimator.cpp:2650-2771)."""
        self._slide_host(marg_flag)
        if marg_flag == MARGIN_OLD:
            marg_P, marg_Q = self.ws.P[0], self.ws.Q[0]
            self.ws = _slide_old_state(self.ws)
            self.book_img = fm.slide_old(
                self.book_img, marg_P, marg_Q, self.ws.P[0], self.ws.Q[0],
                self.ws.ex_p[0], self.ws.ex_q[0])
            self.book_evt = fm.slide_old(
                self.book_evt, marg_P, marg_Q, self.ws.P[0], self.ws.Q[0],
                self.ws.ex_p[1], self.ws.ex_q[1])
        else:
            self.ws = _slide_second_state(self.ws)
            self.book_img = fm.slide_second_new(self.book_img, win.N_STATES - 1)
            self.book_evt = fm.slide_second_new(self.book_evt, win.N_STATES - 1)
        # frame_count stays at WINDOW once the window is full

    def _output(self, t, marg_flag, relo=None, keyframe=None,
                post=None) -> Output:
        k = min(self.frame_count, WINDOW)
        if post is not None:
            return Output(
                t=t, P=post["P"][k].copy(), Q=post["Q"][k].copy(),
                V=post["V"][k].copy(), solver_flag=self.solver_flag,
                marg_flag=marg_flag, relo=relo, keyframe=keyframe,
                n_tracked=post.get("n_tracked"))
        return Output(
            t=t, P=np.asarray(self.ws.P[k]), Q=np.asarray(self.ws.Q[k]),
            V=np.asarray(self.ws.V[k]), solver_flag=self.solver_flag,
            marg_flag=marg_flag, relo=relo, keyframe=keyframe)

    def _post_fetch(self, marg_flag, n_tracked):
        """ONE batched device→host fetch of everything the post-solve host
        logic needs this tick (failure gates, output pose, IMU-rate seed,
        keyframe snapshot) — individual fetches cost a ~40 ms tunnel round
        trip each; jax.device_get overlaps them."""
        ws = self.ws
        req = dict(P=ws.P, Q=ws.Q, V=ws.V, Ba=ws.Ba, Bg=ws.Bg)
        if marg_flag == MARGIN_OLD and self.solver_flag == "NON_LINEAR":
            kf = WINDOW - 2
            book, ex_idx = self._loop_book()
            pts_w, valid = fm.world_points(book, ws, ex_idx)
            req.update(kf_obs=book.obs[:, kf], kf_valid=valid,
                       kf_ids=book.ids, kf_pts=pts_w, kf_un=book.un[:, kf])
        post = jax.device_get(req)
        post["n_tracked"] = n_tracked
        return post

    # ----------------------------------------------------- loop closure I/O
    def _loop_book(self):
        """Book used for loop-closure features (image in ESVIO, event in ESIO)."""
        if self.cfg.mode == "esio":
            return self.book_evt, 1
        if self._img_any is None:
            self._img_any = bool(jnp.any(self.book_img.active))
        if not self._img_any:
            return self.book_evt, 1
        return self.book_img, 0

    def _keyframe_snapshot(self, post) -> Optional[dict]:
        """Keyframe packet for the pose graph (pubKeyframe semantics: the
        2nd-newest frame, published only on MARGIN_OLD,
        visualization.cpp:408-463): pose + world landmarks observed there."""
        kf = WINDOW - 2
        if "kf_obs" not in post:
            return None
        seen = post["kf_obs"] & post["kf_valid"]
        if seen.sum() == 0:
            return None
        lanes = np.nonzero(seen)[0]
        return dict(
            stamp=float(self.timestamps[kf]),
            P=post["P"][kf].copy(), Q=post["Q"][kf].copy(),
            ids=post["kf_ids"][lanes],
            pts_w=post["kf_pts"][lanes],
            un=post["kf_un"][lanes],
        )

    def set_relo_frame(self, stamp, match_ids, match_un, relo_P, relo_Q):
        """Register a fast-relocalization match (setReloFrame,
        estimator.cpp:2773-2792): an old keyframe at pose (relo_P, relo_Q)
        observed features match_ids at normalized coords match_un."""
        self._relo = dict(
            stamp=float(stamp), ids=np.asarray(match_ids, np.int32),
            un=np.asarray(match_un, float),
            P=np.asarray(relo_P, float), Q=np.asarray(relo_Q, float))

    RELO_CAP = 64   # static relo-row capacity of solve_window_relo

    def _prepare_relo(self) -> Optional[dict]:
        """Host-side match of a pending relo frame against the window books:
        stamp alignment + feature-id → lane mapping, padded to RELO_CAP.
        Returns None when no relo is ready; consumes self._relo when the
        stamp has matched a window frame (single-shot like setReloFrame)."""
        relo = getattr(self, "_relo", None)
        if relo is None or self.solver_flag != "NON_LINEAR":
            return None
        k = min(self.frame_count, WINDOW)
        stamps = self.timestamps[: k + 1]
        if relo["stamp"] < stamps[0] - 1e-6:      # slid out of the window
            self._relo = None
            return None
        i = int(np.argmin(np.abs(stamps - relo["stamp"])))
        if abs(stamps[i] - relo["stamp"]) > 1e-4:
            return None                            # not arrived yet
        self._relo = None                          # single-shot like the ref

        book, ex_idx = self._loop_book()
        ids = np.asarray(book.ids)
        active = np.asarray(book.active)
        lane_of = {int(f): l for l, f in enumerate(ids) if active[l]}
        CAP = self.RELO_CAP
        lanes = np.full(CAP, -1, np.int32)
        obs = np.zeros((CAP, 2))
        n = 0
        for m, fid in enumerate(relo["ids"]):
            l = lane_of.get(int(fid))
            if l is not None and n < CAP:
                lanes[n] = l
                obs[n] = relo["un"][m]
                n += 1
        return dict(i=i, n=n, lanes=lanes, obs=obs,
                    valid=np.arange(CAP) < n, ex_idx=ex_idx,
                    book="img" if ex_idx == 0 else "evt", relo=relo,
                    frame_stamp=float(stamps[i]))

    def _finish_relo(self, prep) -> Optional[dict]:
        """Drift feedback (relative t / q / yaw) from the resolved relo pose.

        Joint path: the pose was refined INSIDE the window solve
        (solve_window_relo, estimator.cpp:1988-2022); gated by counting
        reprojection inliers of the relo rows at the refined pose.
        Fallback (too few in-window matches): post-hoc PnP-RANSAC against
        the window landmarks — the r3 formulation, parity-tested."""
        if prep is None:
            return None
        relo = prep["relo"]
        i = prep["i"]
        dt = self.cfg.dtype

        if "refined" in prep:
            rP, rQ = prep["refined"]
            book = self.book_img if prep["book"] == "img" else self.book_evt
            exl = 0 if prep["book"] == "img" else 1
            r = np.asarray(gn.relo_residuals(
                self.ws, book, exl, jnp.asarray(rP, dt), jnp.asarray(rQ, dt),
                jnp.asarray(prep["obs"], dt), jnp.asarray(prep["lanes"]),
                jnp.asarray(prep["valid"])))
            err = np.linalg.norm(r, axis=1) / float(factors.PROJ_SQRT_INFO)
            inl = int(((err < 10.0 / 460.0) & prep["valid"]).sum())
            if inl < 15:              # MIN_LOOP_NUM (keyframe.h:18)
                return None
            P_w_old = np.asarray(rP, float)
            R_w_old = np.asarray(lie.quat_to_rot(jnp.asarray(rQ)), float)
        else:
            pose = self._relo_pnp(prep)
            if pose is None:
                return None
            P_w_old, R_w_old = pose

        Q_i = np.asarray(self.ws.Q[i])
        P_i = np.asarray(self.ws.P[i])
        R_i = np.asarray(lie.quat_to_rot(jnp.asarray(Q_i)))
        rel_t = R_w_old.T @ (P_i - P_w_old)
        rel_R = R_w_old.T @ R_i
        rel_q = np.asarray(lie.rot_to_quat(jnp.asarray(rel_R)))
        yaw_i = float(np.asarray(lie.rot_to_ypr(jnp.asarray(R_i)))[0])
        yaw_o = float(np.asarray(lie.rot_to_ypr(jnp.asarray(R_w_old)))[0])
        return dict(stamp=relo["stamp"], frame_stamp=prep["frame_stamp"],
                    relative_t=rel_t, relative_q=rel_q,
                    relative_yaw=yaw_i - yaw_o,
                    P_old=P_w_old, Q_old=np.asarray(
                        lie.rot_to_quat(jnp.asarray(R_w_old))))

    def _relo_pnp(self, prep):
        """Post-hoc PnP refinement of the relo pose (fallback path)."""
        relo = prep["relo"]
        ex_idx = prep["ex_idx"]
        book, _ = self._loop_book()
        pts_w, valid = fm.world_points(book, self.ws, ex_idx)
        valid = np.asarray(valid)
        pts_w = np.asarray(pts_w)
        sel_p, sel_o = [], []
        for m in range(prep["n"]):
            l = int(prep["lanes"][m])
            if valid[l]:
                sel_p.append(pts_w[l])
                sel_o.append(prep["obs"][m])
        if len(sel_p) < 6:
            return None
        dt = self.cfg.dtype
        Rex = np.asarray(lie.quat_to_rot(self.ws.ex_q[ex_idx]))
        tex = np.asarray(self.ws.ex_p[ex_idx])
        # seed: the matched window frame's pose (the loop revisits it; the
        # payload's old-KF pose is in the loop-corrected world, not ours)
        i = prep["i"]
        R_old_b = np.asarray(lie.quat_to_rot(jnp.asarray(self.ws.Q[i])))
        P_seed = np.asarray(self.ws.P[i])
        R_seed_wc = R_old_b @ Rex
        c_seed = P_seed + R_old_b @ tex
        key = jax.random.PRNGKey(int(relo["stamp"] * 1e3) & 0x7FFFFFFF)
        sel_pp, sel_op, sel_vp = pnp.pad_points(sel_p, sel_o,
                                                min_size=self.RELO_CAP)
        R_cw, c, inl = pnp.pnp_ransac(
            key, jnp.asarray(sel_pp, dt), jnp.asarray(sel_op, dt),
            jnp.asarray(sel_vp), jnp.asarray(R_seed_wc.T, dt),
            jnp.asarray(c_seed, dt))
        if int(jnp.sum(inl)) < 15:    # MIN_LOOP_NUM (keyframe.h:18)
            return None
        R_w_old = np.asarray(R_cw).T @ Rex.T       # body→world of old KF, now
        P_w_old = np.asarray(c) - R_w_old @ tex
        return P_w_old, R_w_old
