import numpy as np
import jax.numpy as jnp

from esvio_tpu.core import camera
from esvio_tpu.frontend import tracker, detect

from synth import blob_texture, sample_texture

H, W = 120, 160
DISPARITY = 5.0


def test_shi_tomasi_finds_corners(rng):
    img = np.zeros((H, W))
    img[40:80, 50:110] = 180.0
    xy, resp, ok = detect.shi_tomasi(jnp.asarray(img), max_corners=32)
    xy = np.asarray(xy)[np.asarray(ok)]
    assert len(xy) >= 4
    gt = np.array([[50, 40], [109, 40], [50, 79], [109, 79]])
    for g in gt:
        assert np.linalg.norm(xy - g, axis=1).min() < 3.0


def test_image_tracker_tracks_and_matches_stereo(rng):
    tex, margin = blob_texture(rng, H, W, n_blobs=250)
    cfg = tracker.TrackerConfig(width=W, height=H, capacity=96,
                                cand_capacity=256, max_cnt=50, min_dist=10,
                                lk_iters=15)
    cam = camera.make_pinhole(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    state = tracker.init_image_state(cfg)
    vel = np.array([30.0, 18.0])
    dt = 0.05
    packets = []
    for k in range(4):
        off = vel * k * dt
        img_l = sample_texture(tex, margin, H, W, off[0], off[1])
        img_r = sample_texture(tex, margin, H, W, off[0] + DISPARITY, off[1])
        state, pkt = tracker.track_image_stereo(
            cfg, cam, cam, state, jnp.asarray(img_l), jnp.asarray(img_r),
            1.0 + k * dt)
        packets.append(pkt)

    first = packets[0]
    assert int(np.asarray(first.valid).sum()) >= 20  # frames detect instantly

    last = packets[-1]
    v = np.asarray(last.valid)
    assert v.sum() >= 20
    cnt = np.asarray(last.track_cnt)[v]
    assert (cnt >= 3).sum() >= 10  # persistent tracks

    # flow between last two packets matches -vel*dt
    a, b = packets[-2], packets[-1]
    ids_a = {int(i): k for k, i in enumerate(np.asarray(a.ids))
             if np.asarray(a.valid)[k]}
    flows = []
    for k, i in enumerate(np.asarray(b.ids)):
        if np.asarray(b.valid)[k] and int(i) in ids_a \
                and np.asarray(b.track_cnt)[k] > 1:
            flows.append(np.asarray(b.uv)[k] - np.asarray(a.uv)[ids_a[int(i)]])
    flows = np.asarray(flows)
    err = np.linalg.norm(flows - (-vel * dt), axis=-1)
    assert len(flows) >= 10 and np.median(err) < 0.5, (np.median(err))

    # stereo disparity
    rv = np.asarray(last.right_valid)
    assert rv.sum() >= 10
    disp = np.asarray(last.uv)[rv] - np.asarray(last.uv_right)[rv]
    assert abs(np.median(disp[:, 0]) - DISPARITY) < 0.5
    assert abs(np.median(disp[:, 1])) < 0.5

    # ids don't collide with the event tracker's id space
    ids = np.asarray(last.ids)[v]
    assert (ids >= (1 << 24)).all()
