"""Keyframe database + place-recognition retrieval (matmul scoring).

Replaces DBoW2's BriefDatabase/BriefVocabulary
(/root/reference/pose_graph/src/pose_graph.cpp:331-406, ThirdParty/DBoW2):
instead of a hierarchical vocabulary tree (a CPU data structure; the shipped
binary vocab isn't even in the reference repo), each keyframe gets a global
descriptor — the L2-normalized mean of its ±1 BRIEF descriptors — and the
whole database is scored with ONE matmul on the MXU.  The DBoW2 gates map to:
top-4 candidates, skip the 50 newest frames, absolute + relative score
thresholds (pose_graph.cpp:347-404).

Save/load (savePoseGraph/loadPoseGraph :705-830) persists the arrays as npz.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

SKIP_RECENT = 50        # pose_graph.cpp:366 (query ignores last 50 frames)
TOP_K = 4
MIN_SCORE_ABS = 0.05    # DBoW2 gate analogs (pose_graph.cpp:377-386)
MIN_SCORE_REL = 0.015


def global_descriptor(desc, valid):
    """L2-normalized mean of ±1 BRIEF descriptors → (256,) float32."""
    w = np.asarray(valid, np.float32)
    m = (np.asarray(desc, np.float32) * w[:, None]).sum(0) / max(w.sum(), 1.0)
    n = np.linalg.norm(m)
    return (m / n if n > 1e-9 else m).astype(np.float32)


class KeyFrameDB:
    """Host-side ring store of keyframes with device-friendly arrays."""

    def __init__(self, capacity=2048, n_window=128, n_extra=512, bits=256,
                 skip_recent=SKIP_RECENT):
        self.capacity = capacity
        self.skip_recent = skip_recent
        self.n_window = n_window
        self.n_extra = n_extra
        self.count = 0
        # poses
        self.t_vio = np.zeros((capacity, 3))
        self.q_vio = np.zeros((capacity, 4))
        self.t_opt = np.zeros((capacity, 3))
        self.q_opt = np.zeros((capacity, 4))
        self.stamp = np.zeros(capacity)
        self.sequence = np.zeros(capacity, np.int32)
        # window landmarks (world 3D + normalized obs + descriptors)
        self.win_pts = np.zeros((capacity, n_window, 3))
        self.win_un = np.zeros((capacity, n_window, 2))
        self.win_desc = np.ones((capacity, n_window, bits), np.int8)
        self.win_valid = np.zeros((capacity, n_window), bool)
        # extra FAST points (normalized coords + descriptors)
        self.ext_un = np.zeros((capacity, n_extra, 2))
        self.ext_desc = np.ones((capacity, n_extra, bits), np.int8)
        self.ext_valid = np.zeros((capacity, n_extra), bool)
        # retrieval
        self.gdesc = np.zeros((capacity, bits), np.float32)
        self.has_loop = np.zeros(capacity, bool)
        self.loop_target = np.full(capacity, -1, np.int32)

    def add(self, stamp, t_vio, q_vio, win_pts, win_un, win_desc, win_valid,
            ext_un, ext_desc, ext_valid, sequence=0) -> int:
        i = self.count
        assert i < self.capacity, "keyframe database full"
        self.count += 1
        self.stamp[i] = stamp
        self.t_vio[i] = t_vio
        self.q_vio[i] = q_vio
        self.t_opt[i] = t_vio
        self.q_opt[i] = q_vio
        self.sequence[i] = sequence
        nw = min(len(win_pts), self.n_window)
        self.win_pts[i, :nw] = win_pts[:nw]
        self.win_un[i, :nw] = win_un[:nw]
        self.win_desc[i, :nw] = win_desc[:nw]
        self.win_valid[i, :nw] = win_valid[:nw]
        ne = min(len(ext_un), self.n_extra)
        self.ext_un[i, :ne] = ext_un[:ne]
        self.ext_desc[i, :ne] = ext_desc[:ne]
        self.ext_valid[i, :ne] = ext_valid[:ne]
        self.gdesc[i] = global_descriptor(win_desc[:nw], win_valid[:nw]) \
            if nw else global_descriptor(ext_desc[:ne], ext_valid[:ne])
        return i

    def query(self, index: int) -> Optional[int]:
        """DBoW2-style loop candidate for keyframe `index` (detectLoop)."""
        hi = index - self.skip_recent
        if hi <= 0 or index <= self.skip_recent:
            return None
        scores = self.gdesc[:hi] @ self.gdesc[index]
        order = np.argsort(-scores)[:TOP_K]
        top = scores[order]
        if len(top) == 0 or top[0] < MIN_SCORE_ABS:
            return None
        # reference: accept when additional candidates also score above the
        # relative gate (multi-candidate consistency, pose_graph.cpp:377-399)
        good = [order[0]]
        for k in range(1, len(top)):
            if top[k] > MIN_SCORE_REL:
                good.append(order[k])
        if len(good) < 1:
            return None
        return int(min(good))  # earliest consistent candidate (:396-404)

    # ------------------------------------------------------------- persist
    def save(self, path):
        np.savez_compressed(
            path, count=self.count, stamp=self.stamp, t_vio=self.t_vio,
            q_vio=self.q_vio, t_opt=self.t_opt, q_opt=self.q_opt,
            sequence=self.sequence, win_pts=self.win_pts, win_un=self.win_un,
            win_desc=self.win_desc, win_valid=self.win_valid,
            ext_un=self.ext_un, ext_desc=self.ext_desc, ext_valid=self.ext_valid,
            gdesc=self.gdesc, has_loop=self.has_loop,
            loop_target=self.loop_target)

    @classmethod
    def load(cls, path, skip_recent=SKIP_RECENT) -> "KeyFrameDB":
        z = np.load(path)
        db = cls(capacity=len(z["stamp"]), n_window=z["win_pts"].shape[1],
                 n_extra=z["ext_un"].shape[1], bits=z["gdesc"].shape[1],
                 skip_recent=skip_recent)
        db.count = int(z["count"])
        for name in ("stamp", "t_vio", "q_vio", "t_opt", "q_opt", "sequence",
                     "win_pts", "win_un", "win_desc", "win_valid", "ext_un",
                     "ext_desc", "ext_valid", "gdesc", "has_loop",
                     "loop_target"):
            setattr(db, name, z[name].copy())
        return db
