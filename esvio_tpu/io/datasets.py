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
        if hi - lo > capacity:  # keep the newest `capacity` events
            lo = hi - capacity
        yield float(edges[k]), chunk_from_arrays(
            stream.t[lo:hi], stream.x[lo:hi], stream.y[lo:hi], stream.p[lo:hi],
            capacity)


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
