"""Test configuration: run on a virtual 8-device CPU mesh (no TPU needed).

The sandbox's sitecustomize force-registers the axon TPU backend and sets
jax_platforms="axon,cpu" in every interpreter; tests must run on CPU with 8
virtual devices (SURVEY.md §4), so we override the config back *before* any
backend is initialized.  x64 is enabled for numerical oracles; the TPU bench
path runs f32.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# ESVIO_TEST_BACKEND=tpu runs the suite against the real chip instead —
# used by tools/tpu_gate.sh for the Pallas hardware-parity tests (interpret
# mode alone is not trusted, VERDICT r3)
_backend = os.environ.get("ESVIO_TEST_BACKEND", "cpu")
if _backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
if _backend == "cpu":
    jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is dominated by XLA compiles of the
# solver/marginalization graphs; repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# Cache only EXPENSIVE compiles: `executable.serialize()` on this box's
# XLA:CPU segfaults/aborts sporadically for small executables under a loaded
# full-suite run (observed repeatedly at compilation_cache.py:265 in
# pnp_gn's fori_loop).  The 20-40 s solver/tracker compiles are the ones
# worth caching anyway; small ones recompile in < 5 s.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# and never serialize XLA:CPU AOT results (machine-feature CHECKs abort on
# sibling-machine entries)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np
import pytest

if _backend == "cpu":
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
