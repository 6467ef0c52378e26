"""Debug visualization dumps — the rviz-publisher analog.

The reference publishes tracking overlays and time-surface images as ROS
image topics (feature_tracker/src/utility/visualization.cpp:15-28,
pubTrackImage stereo_event_tracker_node.cpp:64-100); here the same views are
written as PNGs when the pipeline is given `dump_viz_dir`.
"""
from __future__ import annotations

import os

import numpy as np


def tracking_overlay(image, pts, valid, track_cnt=None) -> np.ndarray:
    """(H, W) grayscale + feature points → (H, W, 3) uint8 overlay.

    Color encodes track length like the reference overlay (red=new →
    blue=long-tracked, pubTrackImage's cv::circle coloring)."""
    img = np.asarray(image, np.float32)
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = np.stack([img, img, img], -1)
    pts = np.asarray(pts)
    valid = np.asarray(valid)
    cnt = np.asarray(track_cnt) if track_cnt is not None \
        else np.zeros(len(pts))
    H, W = img.shape
    for k in np.nonzero(valid)[0]:
        x, y = int(round(float(pts[k, 0]))), int(round(float(pts[k, 1])))
        w = min(float(cnt[k]) / 20.0, 1.0)
        color = np.array([255 * (1 - w), 0, 255 * w], np.uint8)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                if dx * dx + dy * dy <= 4:
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        out[yy, xx] = color
    return out


def save_png(path, array):
    """uint8 (H, W) or (H, W, 3) → PNG (PIL; falls back to .npy)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        from PIL import Image
        Image.fromarray(np.asarray(array, np.uint8)).save(path)
    except ImportError:  # pragma: no cover
        np.save(path + ".npy", np.asarray(array))


def dump_tick(dump_dir, tick, ts_left, packet):
    """Write the per-tick debug views: time surface + tracking overlay."""
    ts = np.asarray(ts_left)
    save_png(os.path.join(dump_dir, f"ts_{tick:06d}.png"),
             np.clip(ts, 0, 255).astype(np.uint8))
    overlay = tracking_overlay(ts, np.asarray(packet.uv),
                               np.asarray(packet.valid),
                               np.asarray(packet.track_cnt))
    save_png(os.path.join(dump_dir, f"track_{tick:06d}.png"), overlay)
