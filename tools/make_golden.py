"""Regenerate the committed golden trace (tests/golden/esio_planar_rot.npz).

Run after an INTENDED accuracy-affecting change, from the repo root:
    python tools/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(__file__), "..", "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np  # noqa: E402

from test_golden_trace import (  # noqa: E402
    GOLDEN, GOLDEN_ESVIO, run_golden_pipeline)


def main():
    modes = [m for m in sys.argv[1:] if m in ("esio", "esvio")] \
        or ["esio", "esvio"]
    for mode, path in (("esio", GOLDEN), ("esvio", GOLDEN_ESVIO)):
        if mode not in modes:
            continue
        res, gt_t, gt_P = run_golden_pipeline(mode)
        ate = res.ate(gt_t, gt_P, alignment="yaw")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, stamps=np.asarray(res.stamps),
                            P=np.asarray(res.P), Q=np.asarray(res.Q), ate=ate)
        print(f"golden written: {path}  frames={len(res.stamps)} "
              f"ate={ate:.4f} m")


if __name__ == "__main__":
    main()
