import numpy as np
import jax.numpy as jnp

from esvio_tpu.core import camera
from esvio_tpu.events import sae as sae_mod
from esvio_tpu.frontend import tracker

from synth import blob_texture, events_from_motion

H, W = 120, 160
DISPARITY = 6.0  # right view shifted right→left by 6 px


def make_cfg():
    return tracker.TrackerConfig(
        width=W, height=H, capacity=128, cand_capacity=512, max_cnt=60,
        min_dist=10, lk_iters=15,
    )


def cams():
    cam = camera.make_pinhole(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    return cam, cam


def run_sequence(n_frames=5, vel=(40.0, 25.0), frame_dt=0.05):
    rng = np.random.default_rng(7)
    tex, margin = blob_texture(rng, H, W)
    cfg = make_cfg()
    cam_l, cam_r = cams()
    state = tracker.init_state(cfg)
    packets = []
    t_base = 1.0  # SAE initializes to 0 like the reference; keep t ≫ refractory
    for k in range(n_frames):
        t0 = t_base + k * frame_dt
        t1 = t_base + (k + 1) * frame_dt
        el = (vel[0] * (t0 - t_base), vel[1] * (t0 - t_base))  # continue motion
        tL, xL, yL, pL = events_from_motion(
            tex, margin, H, W, t0, t1, vel, offset0=el, jitter_rng=rng)
        tR, xR, yR, pR = events_from_motion(
            tex, margin, H, W, t0, t1, vel,
            offset0=(el[0] + DISPARITY, el[1]), jitter_rng=rng)
        chunk_l = sae_mod.chunk_from_arrays(tL, xL, yL, pL, capacity=16384)
        chunk_r = sae_mod.chunk_from_arrays(tR, xR, yR, pR, capacity=16384)
        state, pkt = tracker.track_event_stereo(
            cfg, cam_l, cam_r, state, chunk_l, chunk_r, t1)
        packets.append(pkt)
    return cfg, packets


def test_tracker_detects_and_tracks():
    cfg, packets = run_sequence(n_frames=6)
    # frame 0 runs on a cold SAE (no corner history) — expect detections from
    # frame 1 onward, exactly like the reference warming up
    n1 = int(np.asarray(packets[1].valid).sum())
    assert n1 >= 10, f"expected detections on second frame, got {n1}"

    last = packets[-1]
    n_last = int(np.asarray(last.valid).sum())
    assert n_last >= 15

    # some features survive from frame 1 to the end
    cnt = np.asarray(last.track_cnt)[np.asarray(last.valid)]
    assert (cnt >= len(packets) - 1).sum() >= 5

    # ids are unique among valid lanes
    ids = np.asarray(last.ids)[np.asarray(last.valid)]
    assert len(set(ids.tolist())) == len(ids)


def test_tracker_flow_matches_motion():
    vel = (40.0, 25.0)
    frame_dt = 0.05
    cfg, packets = run_sequence(vel=vel, frame_dt=frame_dt)
    # compare pixel displacement between consecutive packets for common ids
    a, b = packets[-2], packets[-1]
    ids_a = {int(i): k for k, i in enumerate(np.asarray(a.ids))
             if np.asarray(a.valid)[k]}
    flows = []
    for k, i in enumerate(np.asarray(b.ids)):
        if np.asarray(b.valid)[k] and int(i) in ids_a and np.asarray(b.track_cnt)[k] > 1:
            ka = ids_a[int(i)]
            flows.append(np.asarray(b.uv)[k] - np.asarray(a.uv)[ka])
    flows = np.asarray(flows)
    assert len(flows) >= 5
    # scene moves with +vel ⇒ texture appears to shift by -vel*dt
    expect = -np.asarray(vel) * frame_dt
    err = np.linalg.norm(flows - expect, axis=-1)
    assert np.median(err) < 1.0, (np.median(err), flows[:5], expect)


def test_tracker_stereo_disparity():
    cfg, packets = run_sequence()
    last = packets[-1]
    rv = np.asarray(last.right_valid)
    assert rv.sum() >= 5
    disp = np.asarray(last.uv)[rv] - np.asarray(last.uv_right)[rv]
    # right view content is shifted left by DISPARITY ⇒ uv_right.x ≈ uv.x - DISPARITY
    assert abs(np.median(disp[:, 0]) - DISPARITY) < 1.0, np.median(disp, axis=0)
    assert abs(np.median(disp[:, 1])) < 1.0


def test_tracker_respects_min_dist_and_budget():
    cfg, packets = run_sequence()
    for pkt in packets:
        v = np.asarray(pkt.valid)
        assert v.sum() <= cfg.max_cnt
        if v.sum() < 2:
            continue  # cold-start frames may be empty
        uv = np.asarray(pkt.uv)[v]
        d = np.sqrt(((uv[:, None] - uv) ** 2).sum(-1))
        np.fill_diagonal(d, 1e9)
        assert d.min() >= cfg.min_dist - 1.5  # rounded mask coords
