"""Rosbag converter tests: a synthetic bag written record-by-record in the
rosbag 2.0 binary format is read back into SequenceData (the conversion
entry point replacing script/run.sh rosbag replay)."""
import bz2
import struct

import numpy as np
import pytest

from esvio_tpu.io import rosbag


# --------------------------------------------------------------- bag writer

def _hdr(fields):
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields, payload):
    h = _hdr(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(payload)) \
        + payload


def _string(s):
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp, frame="cam"):
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + _string(frame)


def _imu_msg(stamp, acc, gyr):
    buf = _ros_header(stamp)
    buf += struct.pack("<4d", 0, 0, 0, 1)       # orientation
    buf += struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *gyr)
    buf += struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *acc)
    buf += struct.pack("<9d", *([0.0] * 9))
    return buf


def _event_array_msg(stamp, t, x, y, p):
    buf = _ros_header(stamp)
    buf += struct.pack("<II", 260, 346)
    buf += struct.pack("<I", len(t))
    for k in range(len(t)):
        secs = int(t[k])
        nsecs = int(round((t[k] - secs) * 1e9))
        buf += struct.pack("<HHIIB", int(x[k]), int(y[k]), secs, nsecs,
                           int(p[k]))
    return buf


def _image_msg(stamp, img):
    h, w = img.shape
    buf = _ros_header(stamp)
    buf += struct.pack("<II", h, w)
    buf += _string("mono8")
    buf += struct.pack("<B", 0)
    buf += struct.pack("<I", w)
    buf += struct.pack("<I", h * w) + img.astype(np.uint8).tobytes()
    return buf


def _connection(conn, topic, dtype):
    payload = _hdr({"topic": topic.encode(), "type": dtype.encode(),
                    "md5sum": b"0" * 32, "message_definition": b""})
    return _record({"op": b"\x07", "conn": struct.pack("<I", conn),
                    "topic": topic.encode()}, payload)


def _message(conn, stamp, payload):
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return _record({"op": b"\x02", "conn": struct.pack("<I", conn),
                    "time": struct.pack("<II", secs, nsecs)}, payload)


def write_bag(path, records, compression=None):
    chunk = b"".join(records)
    if compression == "bz2":
        comp = bz2.compress(chunk)
        fields = {"op": b"\x05", "compression": b"bz2",
                  "size": struct.pack("<I", len(chunk))}
    else:
        comp = chunk
        fields = {"op": b"\x05", "compression": b"none",
                  "size": struct.pack("<I", len(chunk))}
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        # bag header record (padded to 4096 like real bags; reader skips it)
        hdr = _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                       "conn_count": struct.pack("<I", 3),
                       "chunk_count": struct.pack("<I", 1)}, b" " * 1024)
        f.write(hdr)
        f.write(_record(fields, comp))


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("compression", [None, "bz2"])
def test_rosbag_roundtrip(rng, compression, tmp_path):
    n_ev = 200
    t_ev = np.sort(rng.uniform(10.0, 11.0, n_ev))
    x = rng.integers(0, 346, n_ev)
    y = rng.integers(0, 260, n_ev)
    p = rng.integers(0, 2, n_ev)
    imu_t = np.arange(10.0, 11.0, 0.01)
    acc = rng.normal(0, 1, (len(imu_t), 3))
    gyr = rng.normal(0, 1, (len(imu_t), 3))
    img = rng.integers(0, 255, (12, 16)).astype(np.uint8)

    recs = [
        _connection(0, "/davis_left/events", "dvs_msgs/EventArray"),
        _connection(1, "/davis_left/imu", "sensor_msgs/Imu"),
        _connection(2, "/davis_left/image_raw", "sensor_msgs/Image"),
    ]
    # events in two packets
    half = n_ev // 2
    recs.append(_message(0, t_ev[0], _event_array_msg(
        t_ev[0], t_ev[:half], x[:half], y[:half], p[:half])))
    recs.append(_message(0, t_ev[half], _event_array_msg(
        t_ev[half], t_ev[half:], x[half:], y[half:], p[half:])))
    for k in range(len(imu_t)):
        recs.append(_message(1, imu_t[k], _imu_msg(imu_t[k], acc[k], gyr[k])))
    recs.append(_message(2, 10.5, _image_msg(10.5, img)))

    path = str(tmp_path / "test.bag")
    write_bag(path, recs, compression)

    seq = rosbag.convert_rosbag(
        path, event_left="/davis_left/events", imu="/davis_left/imu",
        image_left="/davis_left/image_raw")
    np.testing.assert_allclose(seq.events_left.t, t_ev, atol=2e-9)
    np.testing.assert_array_equal(seq.events_left.x, x)
    np.testing.assert_array_equal(seq.events_left.y, y)
    np.testing.assert_array_equal(seq.events_left.p, p)
    np.testing.assert_allclose(seq.imu.t, imu_t, atol=2e-9)
    np.testing.assert_allclose(seq.imu.acc, acc)
    np.testing.assert_allclose(seq.imu.gyr, gyr)
    assert seq.images_left is not None
    np.testing.assert_array_equal(seq.images_left[1][0], img)


def test_npz_save_load_roundtrip(rng, tmp_path):
    from esvio_tpu.io import datasets as ds
    n = 100
    seq = ds.SequenceData(
        events_left=ds.EventStream(np.sort(rng.uniform(0, 1, n)),
                                   rng.integers(0, 100, n),
                                   rng.integers(0, 80, n),
                                   rng.integers(0, 2, n)),
        events_right=ds.EventStream(np.sort(rng.uniform(0, 1, n)),
                                    rng.integers(0, 100, n),
                                    rng.integers(0, 80, n),
                                    rng.integers(0, 2, n)),
        imu=ds.ImuStream(np.arange(0, 1, 0.01), rng.normal(size=(100, 3)),
                         rng.normal(size=(100, 3))),
        ground_truth=(np.arange(0, 1, 0.1), rng.normal(size=(10, 3))),
    )
    path = str(tmp_path / "seq.npz")
    ds.save_npz(seq, path)
    seq2 = ds.load_npz(path)
    np.testing.assert_allclose(seq2.events_left.t, seq.events_left.t)
    np.testing.assert_array_equal(seq2.events_left.x, seq.events_left.x)
    np.testing.assert_allclose(seq2.imu.acc, seq.imu.acc)
    np.testing.assert_allclose(seq2.ground_truth[1], seq.ground_truth[1])
