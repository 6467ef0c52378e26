"""Full ESIO/ESVIO pipeline: events (+frames) + IMU → trajectory.

The in-process, functional replacement for the reference's 4-node ROS graph
(launch/esvio.launch): event tracker ‖ image tracker → estimator → loop
closure, with the measurement-sync semantics of
getMeasurements_event_image_imu (stereo_estimator_node.cpp:115-170) and the
stream watchdog → restart behavior (stereo_event_tracker_node.cpp:163-173,
restart_callback :231-252).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.frontend import tracker as trk
from esvio_tpu.io import datasets as ds
from esvio_tpu.io import trajectory as traj_io
from esvio_tpu.io.config import SystemConfig, extrinsic_arrays
from esvio_tpu.utils.metrics import Metrics, StageTimer
from esvio_tpu.vio import estimator as est_mod


@dataclasses.dataclass
class PipelineResult:
    stamps: List[float]
    P: List[np.ndarray]
    Q: List[np.ndarray]
    V: List[np.ndarray]
    n_restarts: int = 0
    metrics: Optional[dict] = None
    stage_times: Optional[dict] = None
    # loop-closure corrected trajectory (pose_graph updatePath analog)
    P_loop: Optional[List[np.ndarray]] = None
    Q_loop: Optional[List[np.ndarray]] = None
    n_loops: int = 0
    # IMU-rate low-latency odometry (pubLatestOdometry analog,
    # stereo_estimator_node.cpp:173-200): one sample per IMU message once
    # the estimator is NON_LINEAR
    stamps_hf: Optional[List[float]] = None
    P_hf: Optional[List[np.ndarray]] = None
    Q_hf: Optional[List[np.ndarray]] = None
    V_hf: Optional[List[np.ndarray]] = None

    def ate(self, gt_t, gt_P, alignment="yaw"):
        return traj_io.ate_rmse(np.asarray(self.stamps), np.asarray(self.P),
                                gt_t, gt_P, alignment=alignment)

    def write(self, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        traj_io.write_vio_csv(os.path.join(out_dir, "esvio_result_no_loop.csv"),
                              self.stamps, self.P, self.Q, self.V)
        traj_io.write_tum(os.path.join(out_dir, "esvio_result_no_loop.tum"),
                          self.stamps, self.P, self.Q)
        if self.P_loop:
            traj_io.write_tum(os.path.join(out_dir, "esvio_result_loop.txt"),
                              self.stamps, self.P_loop, self.Q_loop)


def _sync_pairs(it_l, it_r, tol):
    """Pair L/R chunk streams by stamp, dropping unmatched ticks — the
    sync_process semantics (stereo_event_tracker_node.cpp:372-419, 0.2 s
    tolerance there; here half a tick).  With empty ticks skipped by the
    chunk iterators, a one-sided dropout no longer misaligns the zip."""
    l = next(it_l, None)
    r = next(it_r, None)
    while l is not None and r is not None:
        if abs(l[0] - r[0]) <= tol:
            yield l, r
            l = next(it_l, None)
            r = next(it_r, None)
        elif l[0] < r[0]:
            l = next(it_l, None)
        else:
            r = next(it_r, None)


class Pipeline:
    """Host orchestrator; all numeric kernels are jitted device code."""

    def __init__(self, sys_cfg: SystemConfig, cams: dict,
                 tracker_cfg: Optional[trk.TrackerConfig] = None,
                 est_cfg: Optional[est_mod.EstimatorConfig] = None,
                 event_capacity: int = 1 << 16,
                 img_tracker_cfg: Optional[trk.TrackerConfig] = None,
                 dump_viz_dir: Optional[str] = None,
                 dump_viz_every: int = 10):
        # rviz-publisher analog: when dump_viz_dir is set, every Nth tick
        # writes time-surface + tracking-overlay PNGs (utils/viz.py)
        self.dump_viz_dir = dump_viz_dir
        self.dump_viz_every = dump_viz_every
        self._tick = 0
        self.sys_cfg = sys_cfg
        self.cams = cams
        self.event_capacity = event_capacity
        self.tracker_cfg = tracker_cfg or trk.TrackerConfig(
            width=sys_cfg.event_width, height=sys_cfg.event_height,
            max_cnt=sys_cfg.max_cnt, min_dist=sys_cfg.min_dist,
            f_threshold=sys_cfg.f_threshold, decay_ms=sys_cfg.decay_ms,
            ignore_polarity=sys_cfg.ignore_polarity,
            filter_threshold=sys_cfg.feature_filter_threshold,
            equalize=bool(sys_cfg.equalize),
            median_blur_ksize=int(sys_cfg.median_blur_kernel_size))
        # image path runs at its OWN geometry/budgets (image_width/height,
        # max_cnt_img, min_dist_img — parameters.cpp:100,202); frames are
        # resized to these dims like stereo_image_tracker_node.cpp:315
        self.img_tracker_cfg = img_tracker_cfg or trk.TrackerConfig(
            width=sys_cfg.image_width, height=sys_cfg.image_height,
            max_cnt=sys_cfg.max_cnt_img, min_dist=sys_cfg.min_dist_img,
            f_threshold=sys_cfg.f_threshold,
            equalize=bool(sys_cfg.equalize))
        ex_p, ex_q = extrinsic_arrays(sys_cfg)
        mode = "esio" if sys_cfg.system_mode == 0 else "esvio"
        self.est_cfg = est_cfg or est_mod.EstimatorConfig(
            mode=mode, min_parallax=sys_cfg.keyframe_parallax / 460.0,
            g_norm=sys_cfg.g_norm,
            solver_iters=sys_cfg.max_num_iterations,
            estimate_extrinsic=sys_cfg.estimate_extrinsic,
            estimate_td=sys_cfg.estimate_td,
            use_stereo_correction=bool(sys_cfg.use_stereo_correction))
        from esvio_tpu.imu.preintegration import make_imu_params
        imu_params = make_imu_params(
            sys_cfg.acc_n, sys_cfg.gyr_n, sys_cfg.acc_w, sys_cfg.gyr_w,
            sys_cfg.g_norm, dtype=self.est_cfg.dtype)
        self._ex = (ex_p, ex_q)
        self._imu_params = imu_params
        self.loop_closer = None
        self.sequence = 0   # incremented on restart (new_sequence analog)
        if sys_cfg.loop_closure:
            from esvio_tpu.loop.loop_closure import LoopCloser
            loop_cam = cams.get("cam0") if sys_cfg.system_mode == 1 \
                else cams.get("event0")
            self.loop_closer = LoopCloser(cam=loop_cam)
            self._loop_cam = loop_cam
        self._reset(new_sequence=False)

    def load_pose_graph(self, path):
        """Resume a previously saved pose graph (load_previous_pose_graph,
        pose_graph_node.cpp:589-597): this session continues as a NEW
        sequence that fuses into the loaded map on its first loop."""
        from esvio_tpu.loop.loop_closure import LoopCloser
        assert self.loop_closer is not None, "loop_closure disabled"
        self.loop_closer = LoopCloser.load(path, cfg=self.loop_closer.cfg,
                                           cam=self._loop_cam)
        self.sequence = int(self.loop_closer.db.sequence[
            :self.loop_closer.db.count].max(initial=0)) + 1

    def save_pose_graph(self, path):
        assert self.loop_closer is not None, "loop_closure disabled"
        self.loop_closer.save(path)

    def _reset(self, new_sequence=True):
        if new_sequence:
            self.sequence += 1   # restart ⇒ new map sequence (pose_graph_node:79)
        self.tracker_state = trk.init_state(self.tracker_cfg)
        if self.sys_cfg.system_mode == 1:
            self.img_tracker_state = trk.init_image_state(self.img_tracker_cfg)
        self.estimator = est_mod.Estimator(
            self.est_cfg, *self._ex, imu_params=self._imu_params)
        self._last_event_time = None
        self._last_v = None
        self._prev_v = None
        self._last_img_idx = -1
        self._pending_kf = None   # loop keyframe dispatched, not yet committed

    def _prep_frame(self, frame) -> jnp.ndarray:
        """Grayscale-convert + resize to config dims (getImageFromMsg,
        stereo_image_tracker_node.cpp:257-319)."""
        import jax
        f = jnp.asarray(frame, jnp.float32)
        if f.ndim == 3:  # RGB → gray
            f = f @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        cfg = self.img_tracker_cfg
        if f.shape != (cfg.height, cfg.width):
            f = jax.image.resize(f, (cfg.height, cfg.width), "linear")
        return f

    def run(self, seq: ds.SequenceData, freq: Optional[float] = None,
            max_frames: Optional[int] = None,
            overlap: bool = True, chunk_pairs=None) -> PipelineResult:
        """Drive the full pipeline.

        `overlap=True` runs the front end one tick AHEAD of the estimator
        (SURVEY.md §2.6(d), the 4-node pipeline's concurrency): tick k+1's
        tracker work is dispatched to the device before the host executes
        tick k's estimator stage, so host-side orchestration (IMU feeds,
        control flow, loop closure) hides under device compute — JAX async
        dispatch makes this an ordering change only.  Motion compensation
        then uses the estimator velocity from one tick earlier, matching the
        reference's asynchronous odometry feedback
        (stereo_event_tracker_node.cpp:102-107)."""
        cfg = self.sys_cfg
        freq = freq or cfg.freq
        res = PipelineResult([], [], [], [])
        tim = StageTimer()
        met = Metrics()

        # production ingestion runs the native C++ packetizer when built
        chunks_l = ds.iterate_chunks_fast(seq.events_left, freq,
                                          self.event_capacity)
        chunks_r = ds.iterate_chunks_fast(seq.events_right, freq,
                                          self.event_capacity)
        cam_el = self.cams.get("event0")
        cam_er = self.cams.get("event1")

        self._imgs = seq.images_left
        self._img_idx = 0
        prev_t = None
        n = 0
        pending = None   # deferred estimator stage input (overlap mode)
        pairs = chunk_pairs if chunk_pairs is not None else _sync_pairs(
            iter(chunks_l), iter(chunks_r), tol=0.5 / freq)
        for (t_l, ch_l), (t_r, ch_r) in pairs:
            t = t_l
            # stream watchdog (gap > 1 s OR backwards time → full restart,
            # stereo_event_tracker_node.cpp:163-173)
            if self._last_event_time is not None and \
                    (t - self._last_event_time > 1.0
                     or t < self._last_event_time - 1e-9):
                if pending is not None:   # finish the pre-gap tick first
                    self._estimator_stage(pending, seq, freq, res, tim, met)
                    pending = None
                if self.loop_closer is not None and \
                        self._pending_kf is not None:
                    # the pre-gap keyframe is still valid map data
                    self.loop_closer.commit_keyframe(self._pending_kf)
                res.n_restarts += 1
                self._reset()
                prev_t = None
            self._last_event_time = t

            # event-count metric from the packetizer's host-side counts (the
            # n_host rider) — summing the device-resident valid mask here
            # blocked on a full tunnel round trip per tick and defeated the
            # overlap dispatch (VERDICT r4 #3)
            n_l = getattr(ch_l, "n_host", None)
            n_r = getattr(ch_r, "n_host", None)
            if n_l is None:
                n_l = float(np.sum(np.asarray(ch_l.valid)))
            if n_r is None:
                n_r = float(np.sum(np.asarray(ch_r.valid)))
            met.count("events", float(n_l) + float(n_r))

            # optional IMU-aided motion compensation (Do_motion_correction);
            # estimator velocity feedback is one tick stale under overlap
            if cfg.do_motion_correction and seq.imu is not None \
                    and self._last_v is not None:
                from esvio_tpu.events.motion import motion_correct_chunk
                ts_i, accs_i, gyrs_i = ds.imu_between(seq.imu, t - 1.0 / freq, t)
                if len(ts_i):
                    omega = jnp.asarray(gyrs_i.mean(0))
                    accel = jnp.asarray(accs_i.mean(0))
                    v_cur = jnp.asarray(self._last_v)
                    v_prev = jnp.asarray(self._prev_v)
                    t0_win = t - 1.0 / freq
                    for name, ch, cc in (("l", ch_l, cam_el), ("r", ch_r, cam_er)):
                        chn = motion_correct_chunk(
                            ch, cc.fx, cc.fy, cc.cx, cc.cy, omega, v_cur,
                            v_prev, accel, t0_win, width=cfg.event_width,
                            height=cfg.event_height)
                        if name == "l":
                            ch_l = chn
                        else:
                            ch_r = chn

            # ---- front end for tick k (async dispatch, no host sync) ------
            with tim("frontend_event"):
                self.tracker_state, pkt_evt = trk.track_event_stereo(
                    self.tracker_cfg, cam_el, cam_er, self.tracker_state,
                    ch_l, ch_r, t)
            pkt_img = self._image_frontend(seq, t, tim)

            # ---- estimator stage for tick k-1 (overlap) or k (serial) -----
            stage = (prev_t, t, pkt_evt, pkt_img, self._img_idx)
            if overlap:
                if pending is not None:
                    self._estimator_stage(pending, seq, freq, res, tim, met)
                pending = stage
            else:
                self._estimator_stage(stage, seq, freq, res, tim, met)
            prev_t = t
            n += 1
            if max_frames and n >= max_frames:
                break
        if pending is not None:
            self._estimator_stage(pending, seq, freq, res, tim, met)
        if self.loop_closer is not None:
            if self._pending_kf is not None:
                info = self.loop_closer.commit_keyframe(self._pending_kf)
                self._pending_kf = None
                if info is not None:
                    met.count("loops")
                    res.n_loops += 1
            self.loop_closer.flush()   # run any cadence-pending 4-DoF solve
            self._rebuild_loop_path(res)
        res.metrics = met.summary()
        res.stage_times = tim.report()
        return res

    def _rebuild_loop_path(self, res):
        """Rewrite the loop-corrected trajectory from the FINAL pose-graph
        state (updatePath, pose_graph.cpp:588-702: after every 4-DoF solve
        the reference rewrites the whole esvio_result_loop.txt from the
        optimized keyframe poses).  Ticks that are keyframes take their
        optimized pose directly; other ticks get the final drift applied to
        their VIO pose.  Without this, early P_loop entries keep whatever
        drift was current when they were recorded and the final solve never
        reaches them."""
        if res.P_loop is None or not res.stamps:
            return
        lc = self.loop_closer
        if not lc.loops:
            return   # no loop ⇒ drift is identity ⇒ corrected == raw already
        db = lc.db
        kf_of = {float(db.stamp[i]): i for i in range(db.count)}
        for k, t in enumerate(res.stamps):
            i = kf_of.get(float(t))
            if i is not None:
                res.P_loop[k] = db.t_opt[i].copy()
                res.Q_loop[k] = db.q_opt[i].copy()
            else:
                t_c, q_c = lc.correct_odometry(res.P[k], res.Q[k])
                res.P_loop[k] = t_c
                res.Q_loop[k] = q_c

    def _image_frontend(self, seq, t, tim):
        """Pair + track the latest frame ≤ t (sync_process semantics); each
        frame is consumed once and stamped with its OWN time."""
        cfg = self.sys_cfg
        imgs = self._imgs
        if cfg.system_mode != 1 or imgs is None:
            return None
        while self._img_idx + 1 < len(imgs[0]) and \
                imgs[0][self._img_idx + 1] <= t:
            self._img_idx += 1
        if not (imgs[0][self._img_idx] <= t
                and self._img_idx != self._last_img_idx):
            return None
        self._last_img_idx = self._img_idx
        t_frame = float(imgs[0][self._img_idx])
        frame_l = self._prep_frame(imgs[1][self._img_idx])
        frame_r = self._prep_frame(seq.images_right[1][self._img_idx])
        with tim("frontend_image"):
            self.img_tracker_state, pkt_img = trk.track_image_stereo(
                self.img_tracker_cfg, self.cams.get("cam0"),
                self.cams.get("cam1"), self.img_tracker_state,
                frame_l, frame_r, t_frame)
        return pkt_img

    def _estimator_stage(self, stage, seq, freq, res, tim, met):
        """Back-end stage for one tick: IMU feed + predict, window solve,
        loop closure, output recording."""
        cfg = self.sys_cfg
        prev_t, t, pkt_evt, pkt_img, img_idx = stage

        # feed IMU spanning (prev_t, t]; each sample also forward-propagates
        # the IMU-rate state (imu_callback → predict + pubLatestOdometry,
        # stereo_estimator_node.cpp:173-200)
        if prev_t is not None and seq.imu is not None:
            ts, accs, gyrs = ds.imu_between(seq.imu, prev_t, t)
            if len(ts):
                # one batched call per tick (buffer + IMU-rate propagation) —
                # host time no longer scales per-sample (VERDICT r3 #9)
                P_hf, Q_hf, V_hf = self.estimator.process_imu_and_predict(
                    ts, accs, gyrs, prev_t)
                if self.estimator.solver_flag == "NON_LINEAR":
                    if res.stamps_hf is None:
                        res.stamps_hf, res.P_hf = [], []
                        res.Q_hf, res.V_hf = [], []
                    res.stamps_hf.extend(float(x) for x in ts)
                    res.P_hf.extend(P_hf)
                    res.Q_hf.extend(Q_hf)
                    res.V_hf.extend(V_hf)

        with tim("estimator"):
            out = self.estimator.process_packets(t, pkt_evt, pkt_img)
        self.estimator.update_latest()   # re-sync IMU-rate state (update())

        # ---- loop closure (pose_graph node analog) -------------------------
        # commit LAST tick's pending keyframe first: its device work and
        # device→host transfer overlapped the tick in between (the pose-graph
        # node is an asynchronous process in the reference, so a one-tick
        # registration delay matches its semantics and costs no round trip)
        if self.loop_closer is not None and self._pending_kf is not None:
            with tim("loop_closure"):
                info = self.loop_closer.commit_keyframe(self._pending_kf)
            self._pending_kf = None
            if info is not None:
                met.count("loops")
                res.n_loops += 1
                if cfg.fast_relocalization:
                    self.estimator.set_relo_frame(
                        info["stamp_new"], info["match_ids"],
                        info["match_un_old"], info["t_old"], info["q_old"])
        if self.loop_closer is not None and out.keyframe is not None \
                and out.solver_flag == "NON_LINEAR":
            kf = out.keyframe
            # BRIEF source image: raw left frame in ESVIO; the left time
            # surface in ESIO (pose_graph subscribes the left image topic).
            # Kept as DEVICE arrays — begin_keyframe consumes them in-graph.
            if cfg.system_mode == 1 and self._imgs is not None:
                loop_img = self._prep_frame(self._imgs[1][img_idx])
            else:
                loop_img = self.tracker_state.prev_pyr[0][0]
            with tim("loop_closure"):
                self._pending_kf = self.loop_closer.begin_keyframe(
                    kf["stamp"], kf["P"], kf["Q"], kf["pts_w"], kf["un"],
                    np.ones(len(kf["un"]), bool), loop_img, ids=kf["ids"],
                    sequence=self.sequence, uv_is_normalized=True)
        # fast-reloc drift feedback: the window-refined loop edge replaces
        # the PnP edge and updates drift instantly (relo_relative_pose →
        # updateKeyFrameLoop, pose_graph.cpp:887-933)
        if self.loop_closer is not None and out.relo is not None \
                and cfg.fast_relocalization:
            self.loop_closer.update_loop(
                out.relo["stamp"], out.relo["relative_t"],
                out.relo["relative_q"], out.relo["relative_yaw"])
        met.count("ticks")
        if out.n_tracked is not None:   # host-side count, no device fetch
            met.observe("tracked_features", float(out.n_tracked))
        met.gauge("lanes_dropped", float(self.estimator.lanes_dropped))
        self._tick += 1
        if self.dump_viz_dir and self._tick % self.dump_viz_every == 0:
            from esvio_tpu.utils import viz
            viz.dump_tick(self.dump_viz_dir, self._tick,
                          self.tracker_state.prev_pyr[0][0], pkt_evt)
        met.gauge("solver_flag_nonlinear",
                  1.0 if out.solver_flag == "NON_LINEAR" else 0.0)
        self._prev_v = self._last_v if self._last_v is not None else out.V
        self._last_v = out.V
        if out.solver_flag == "NON_LINEAR":
            res.stamps.append(t)
            res.P.append(out.P)
            res.Q.append(out.Q)
            res.V.append(out.V)
            if self.loop_closer is not None:
                if res.P_loop is None:
                    res.P_loop, res.Q_loop = [], []
                t_c, q_c = self.loop_closer.correct_odometry(out.P, out.Q)
                res.P_loop.append(t_c)
                res.Q_loop.append(q_c)
