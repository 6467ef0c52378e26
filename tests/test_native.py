"""Native C++ packetizer must match the numpy reference implementation."""
import numpy as np
import pytest

from esvio_tpu.io import native
from esvio_tpu.io import datasets as ds


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_packetize_matches_numpy(lib, rng):
    n = 50000
    t = np.sort(rng.uniform(1.0, 3.0, n))
    x = rng.integers(0, 346, n).astype(np.int32)
    y = rng.integers(0, 260, n).astype(np.int32)
    p = rng.integers(0, 2, n).astype(np.int32)

    stamps, ot, ox, oy, op, ov = native.packetize(
        t, x, y, p, t0=1.0, freq=20.0, capacity=4096, n_frames=64)

    stream = ds.EventStream(t, x, y, p)
    ref = list(ds.iterate_chunks(stream, 20.0, 4096, t_start=1.0))
    assert len(stamps) == min(len(ref), 64)
    for k in range(len(stamps)):
        s_ref, c_ref = ref[k]
        assert abs(stamps[k] - s_ref) < 1e-9
        np.testing.assert_array_equal(ov[k], np.asarray(c_ref.valid))
        np.testing.assert_allclose(ot[k], np.asarray(c_ref.t), rtol=1e-6)
        np.testing.assert_array_equal(ox[k], np.asarray(c_ref.x))
        np.testing.assert_array_equal(oy[k], np.asarray(c_ref.y))


def test_packetize_truncates_to_newest(lib, rng):
    n = 10000
    t = np.sort(rng.uniform(0.0, 0.05, n))  # one dense frame
    x = np.arange(n, dtype=np.int32) % 346
    y = np.zeros(n, np.int32)
    p = np.zeros(n, np.int32)
    stamps, ot, ox, oy, op, ov = native.packetize(
        t, x, y, p, t0=0.0, freq=10.0, capacity=1024, n_frames=4)
    assert ov[0].sum() == 1024
    # the kept events are the newest ones
    assert ot[0][0] >= t[n - 1025]


def test_imu_between_matches_numpy(lib, rng):
    imu_t = np.arange(0, 2.0, 0.005)
    acc = rng.normal(size=(len(imu_t), 3))
    gyr = rng.normal(size=(len(imu_t), 3))
    ts_n, acc_n, gyr_n = native.imu_between_native(imu_t, acc, gyr, 0.1012, 0.2034)
    imu = ds.ImuStream(imu_t, acc, gyr)
    ts_r, acc_r, gyr_r = ds.imu_between(imu, 0.1012, 0.2034)
    np.testing.assert_allclose(ts_n, ts_r, atol=1e-12)
    np.testing.assert_allclose(acc_n, acc_r, atol=1e-12)
    np.testing.assert_allclose(gyr_n, gyr_r, atol=1e-12)


def test_iterate_chunks_fast_parity(rng):
    """Pipeline ingestion path: native packetizer chunks == numpy chunks."""
    from esvio_tpu.io import native
    from esvio_tpu.io.datasets import EventStream, iterate_chunks, \
        iterate_chunks_fast

    n = 5000
    t = np.sort(rng.uniform(2.0, 3.0, n))
    x = rng.integers(0, 160, n).astype(np.int32)
    y = rng.integers(0, 120, n).astype(np.int32)
    p = rng.integers(0, 2, n).astype(np.int32)
    stream = EventStream(t, x, y, p)

    fast = list(iterate_chunks_fast(stream, 15.0, 256))
    ref = list(iterate_chunks(stream, 15.0, 256))
    assert native.get_lib() is not None, "native lib should build here"
    assert len(fast) >= len(ref) - 1          # native may stop at data end
    for (sf, cf), (sr, cr) in zip(fast, ref):
        assert abs(sf - sr) < 1e-9
        np.testing.assert_array_equal(np.asarray(cf.valid), np.asarray(cr.valid))
        np.testing.assert_array_equal(np.asarray(cf.x), np.asarray(cr.x))
        np.testing.assert_array_equal(np.asarray(cf.y), np.asarray(cr.y))
        np.testing.assert_array_equal(np.asarray(cf.p), np.asarray(cr.p))
        np.testing.assert_allclose(np.asarray(cf.t), np.asarray(cr.t),
                                   atol=1e-6)
