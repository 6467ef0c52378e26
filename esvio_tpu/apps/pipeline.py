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


class Pipeline:
    """Host orchestrator; all numeric kernels are jitted device code."""

    def __init__(self, sys_cfg: SystemConfig, cams: dict,
                 tracker_cfg: Optional[trk.TrackerConfig] = None,
                 est_cfg: Optional[est_mod.EstimatorConfig] = None,
                 event_capacity: int = 1 << 16):
        self.sys_cfg = sys_cfg
        self.cams = cams
        self.event_capacity = event_capacity
        self.tracker_cfg = tracker_cfg or trk.TrackerConfig(
            width=sys_cfg.event_width, height=sys_cfg.event_height,
            max_cnt=sys_cfg.max_cnt, min_dist=sys_cfg.min_dist,
            f_threshold=sys_cfg.f_threshold, decay_ms=sys_cfg.decay_ms,
            ignore_polarity=sys_cfg.ignore_polarity,
            filter_threshold=sys_cfg.feature_filter_threshold,
            equalize=bool(sys_cfg.equalize))
        ex_p, ex_q = extrinsic_arrays(sys_cfg)
        mode = "esio" if sys_cfg.system_mode == 0 else "esvio"
        self.est_cfg = est_cfg or est_mod.EstimatorConfig(
            mode=mode, min_parallax=sys_cfg.keyframe_parallax / 460.0,
            g_norm=sys_cfg.g_norm,
            solver_iters=sys_cfg.max_num_iterations,
            estimate_extrinsic=sys_cfg.estimate_extrinsic,
            estimate_td=sys_cfg.estimate_td)
        from esvio_tpu.imu.preintegration import make_imu_params
        imu_params = make_imu_params(
            sys_cfg.acc_n, sys_cfg.gyr_n, sys_cfg.acc_w, sys_cfg.gyr_w,
            sys_cfg.g_norm, dtype=self.est_cfg.dtype)
        self._ex = (ex_p, ex_q)
        self._imu_params = imu_params
        self.loop_closer = None
        if sys_cfg.loop_closure:
            from esvio_tpu.loop.loop_closure import LoopCloser
            loop_cam = cams.get("cam0") if sys_cfg.system_mode == 1 \
                else cams.get("event0")
            self.loop_closer = LoopCloser(cam=loop_cam)
            self._loop_cam = loop_cam
        self._reset()

    def _reset(self):
        self.tracker_state = trk.init_state(self.tracker_cfg)
        if self.sys_cfg.system_mode == 1:
            self.img_tracker_state = trk.init_image_state(self.tracker_cfg)
        self.estimator = est_mod.Estimator(
            self.est_cfg, *self._ex, imu_params=self._imu_params)
        self._last_event_time = None
        self._last_v = None
        self._prev_v = None

    def run(self, seq: ds.SequenceData, freq: Optional[float] = None,
            max_frames: Optional[int] = None) -> PipelineResult:
        cfg = self.sys_cfg
        freq = freq or cfg.freq
        res = PipelineResult([], [], [], [])
        tim = StageTimer()
        met = Metrics()

        chunks_l = ds.iterate_chunks(seq.events_left, freq, self.event_capacity)
        chunks_r = ds.iterate_chunks(seq.events_right, freq, self.event_capacity)
        cam_el = self.cams.get("event0")
        cam_er = self.cams.get("event1")
        cam_il = self.cams.get("cam0")
        cam_ir = self.cams.get("cam1")

        img_idx = 0
        imgs = seq.images_left
        prev_t = None
        n = 0
        for (t_l, ch_l), (t_r, ch_r) in zip(chunks_l, chunks_r):
            t = t_l
            # stream watchdog (gap > 1 s → full restart)
            if self._last_event_time is not None and \
                    t - self._last_event_time > 1.0:
                res.n_restarts += 1
                self._reset()
            self._last_event_time = t

            # feed IMU spanning (prev_t, t]
            if prev_t is not None and seq.imu is not None:
                ts, accs, gyrs = ds.imu_between(seq.imu, prev_t, t)
                last = prev_t
                for k in range(len(ts)):
                    self.estimator.process_imu(ts[k] - last, accs[k], gyrs[k])
                    last = ts[k]
            prev_t = t

            # optional IMU-aided motion compensation (Do_motion_correction)
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

            with tim("frontend_event"):
                self.tracker_state, pkt_evt = trk.track_event_stereo(
                    self.tracker_cfg, cam_el, cam_er, self.tracker_state,
                    ch_l, ch_r, t)
            met.count("events", float(np.sum(np.asarray(ch_l.valid)))
                      + float(np.sum(np.asarray(ch_r.valid))))

            pkt_img = None
            if cfg.system_mode == 1 and imgs is not None:
                # latest frame at or before t (sync_process pairing semantics)
                while img_idx + 1 < len(imgs[0]) and imgs[0][img_idx + 1] <= t:
                    img_idx += 1
                if imgs[0][img_idx] <= t:
                    frame_l = jnp.asarray(imgs[1][img_idx], jnp.float32)
                    frame_r = jnp.asarray(seq.images_right[1][img_idx],
                                          jnp.float32)
                    with tim("frontend_image"):
                        self.img_tracker_state, pkt_img = trk.track_image_stereo(
                            self.tracker_cfg, cam_il, cam_ir,
                            self.img_tracker_state, frame_l, frame_r, t)

            with tim("estimator"):
                out = self.estimator.process_packets(t, pkt_evt, pkt_img)

            # ---- loop closure (pose_graph node analog) ---------------------
            if self.loop_closer is not None and out.keyframe is not None \
                    and out.solver_flag == "NON_LINEAR":
                kf = out.keyframe
                # BRIEF source image: raw left frame in ESVIO; the left time
                # surface in ESIO (pose_graph subscribes the left image topic)
                if cfg.system_mode == 1 and imgs is not None:
                    loop_img = np.asarray(imgs[1][img_idx], np.float32)
                else:
                    loop_img = np.asarray(self.tracker_state.prev_pyr[0][0])
                from esvio_tpu.core.camera import space_to_plane
                rays = np.concatenate(
                    [kf["un"], np.ones((len(kf["un"]), 1))], axis=1)
                uv = np.asarray(space_to_plane(self._loop_cam,
                                               jnp.asarray(rays)))
                with tim("loop_closure"):
                    info = self.loop_closer.add_keyframe(
                        kf["stamp"], kf["P"], kf["Q"], kf["pts_w"], uv,
                        np.ones(len(uv), bool), loop_img, ids=kf["ids"])
                if info is not None:
                    met.count("loops")
                    res.n_loops += 1
                    if cfg.fast_relocalization:
                        self.estimator.set_relo_frame(
                            info["stamp_new"], info["match_ids"],
                            info["match_un_old"], info["t_old"],
                            info["q_old"])
            met.count("ticks")
            met.observe("tracked_features",
                        float(np.sum(np.asarray(pkt_evt.valid))))
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
            n += 1
            if max_frames and n >= max_frames:
                break
        res.metrics = met.summary()
        res.stage_times = tim.report()
        return res
