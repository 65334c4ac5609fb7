"""OneEuro scan vs stateful host filter, IoU, EAR, face tracking."""

import numpy as np

import jax
import pytest

from fvd_tpu.nodes._tracking import FaceTracker, TrackerConfig
from fvd_tpu.ops.filters import OneEuroFilter, eye_aspect_ratio, iou, one_euro_scan


def test_one_euro_scan_matches_host_filter():
    rng = np.random.RandomState(0)
    T = 40
    times = np.cumsum(0.2 + 0.05 * rng.rand(T))
    values = np.cumsum(rng.randn(T, 68, 2), axis=0)
    valid = np.ones(T, bool)

    out = np.asarray(one_euro_scan(times, values, valid, min_cutoff=0.5, beta=0.1))

    host = OneEuroFilter(times[0], values[0], min_cutoff=0.5, beta=0.1)
    expected = [values[0]]
    for i in range(1, T):
        expected.append(host(times[i], values[i]))
    np.testing.assert_allclose(out, np.stack(expected), rtol=1e-4, atol=1e-4)


def test_one_euro_scan_gap_semantics():
    """Invalid frames must not advance filter state (the reference simply
    doesn't call the filter on lost frames)."""
    times = np.array([0.0, 0.2, 0.4, 0.6, 0.8])
    values = np.array([[0.0], [1.0], [99.0], [2.0], [3.0]])
    valid = np.array([True, True, False, True, True])

    out = np.asarray(one_euro_scan(times, values, valid, min_cutoff=0.5, beta=0.1))
    assert np.isnan(out[2, 0])

    host = OneEuroFilter(0.0, values[0], min_cutoff=0.5, beta=0.1)
    e1 = host(0.2, values[1])
    e3 = host(0.6, values[3])  # t_e spans the gap
    e4 = host(0.8, values[4])
    np.testing.assert_allclose(out[1], e1, rtol=1e-4)
    np.testing.assert_allclose(out[3], e3, rtol=1e-4)
    np.testing.assert_allclose(out[4], e4, rtol=1e-4)


def test_one_euro_first_valid_passthrough():
    times = np.array([1.0, 2.0])
    values = np.array([[5.0], [6.0]])
    out = np.asarray(one_euro_scan(times, values, np.array([True, True])))
    assert out[0, 0] == pytest.approx(5.0)


def test_one_euro_smooths_noise():
    rng = np.random.RandomState(1)
    T = 200
    times = np.arange(T) * 0.2
    clean = np.sin(times / 5.0)[:, None]
    noisy = clean + 0.3 * rng.randn(T, 1)
    out = np.asarray(one_euro_scan(times, noisy, np.ones(T, bool), min_cutoff=0.1, beta=0.0))
    # the filter must strip high-frequency jitter
    assert np.std(np.diff(out[20:, 0])) < 0.4 * np.std(np.diff(noisy[20:, 0]))


# ---------------------------------------------------------------------------
# IoU / EAR
# ---------------------------------------------------------------------------
def test_iou_reference_convention():
    # identical boxes -> 1.0; the +1 inclusive-pixel convention
    assert iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    # disjoint -> 0
    assert iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    # half overlap (inclusive counting): inter=6*11, union=2*11*11-6*11
    v = iou([0, 0, 10, 10], [5, 0, 15, 10])
    assert v == pytest.approx(6 * 11 / (2 * 11 * 11 - 6 * 11))


def test_eye_aspect_ratio_open_vs_closed():
    open_eye = np.array([[0, 0], [2, -2], [4, -2], [6, 0], [4, 2], [2, 2]])
    closed_eye = np.array([[0, 0], [2, -0.2], [4, -0.2], [6, 0], [4, 0.2], [2, 0.2]])
    assert eye_aspect_ratio(open_eye) > 3 * eye_aspect_ratio(closed_eye)
    # 3D points work too (V4 uses 3D landmarks)
    open_3d = np.concatenate([open_eye, np.zeros((6, 1))], axis=1)
    assert eye_aspect_ratio(open_3d) == pytest.approx(eye_aspect_ratio(open_eye))


# ---------------------------------------------------------------------------
# FaceTracker state machine (reference v3:139-209)
# ---------------------------------------------------------------------------
def _lm(x1, y1, x2, y2):
    """68 landmarks spanning the box."""
    pts = np.zeros((68, 2))
    pts[:, 0] = np.linspace(x1, x2, 68)
    pts[:, 1] = np.linspace(y1, y2, 68)
    return pts


CFG = TrackerConfig(frame_width=640, frame_height=480)


def test_tracker_acquires_largest_gated():
    tr = FaceTracker(CFG)
    small = _lm(0, 0, 10, 10)        # below 5% min size -> gated out
    big = _lm(100, 100, 300, 300)
    assert tr.select([small, big]) == 1
    assert tr.active_box == [100, 100, 300, 300]


def test_tracker_aspect_gate():
    tr = FaceTracker(CFG)
    stretched = _lm(0, 100, 639, 130)  # aspect 639/30 >> 3 -> gated
    normal = _lm(100, 100, 200, 220)
    assert tr.select([stretched, normal]) == 1


def test_tracker_follows_by_iou_not_size():
    tr = FaceTracker(CFG)
    assert tr.select([_lm(100, 100, 200, 200)]) == 0
    # a bigger face appears, but the tracked one (overlapping) wins
    moved = _lm(110, 110, 210, 210)
    bigger = _lm(400, 100, 620, 400)
    assert tr.select([bigger, moved]) == 1


def test_tracker_reacquires_on_lost_track():
    tr = FaceTracker(CFG)
    assert tr.select([_lm(100, 100, 200, 200)]) == 0
    # nothing overlaps (IoU < 0.15) -> reset + largest, ungated
    tiny = _lm(500, 400, 520, 420)   # fails the size gate but reacquisition is ungated
    assert tr.select([tiny]) == 0
    assert tr.active_box == [500, 400, 520, 420]


def test_tracker_v4_pads_active_box():
    cfg = TrackerConfig(frame_width=640, frame_height=480, aspect_gate=False, pad_frac=0.1)
    tr = FaceTracker(cfg)
    tr.select([_lm(100, 100, 200, 200)])
    assert tr.active_box == [90, 90, 210, 210]


def test_tracker_empty_frame():
    tr = FaceTracker(CFG)
    assert tr.select([]) == -1


# ---------------------------------------------------------------------------
# coalesced smoothing dispatches
# ---------------------------------------------------------------------------
def test_coalesced_smoothing_matches_single_dispatch():
    """Cross-video coalesced OneEuro/v4 smoothing (nodes/_smooth.py) must be
    equal to the per-video dispatch within float32 ulp (vmap changes
    XLA fusion), including the chunk carry and
    the power-of-two time padding (valid=False rows keep the carry)."""
    from concurrent.futures import ThreadPoolExecutor

    from fvd_tpu.nodes import _smooth
    from fvd_tpu.ops.filters import (one_euro_init_carry, one_euro_scan_chunk,
                                     v4_smooth_chunk)
    from fvd_tpu.providers import coalesce

    rng = np.random.RandomState(3)

    def make_inputs(T, seed):
        r = np.random.RandomState(seed)
        times = np.cumsum(0.2 + 0.05 * r.rand(T))
        lm = r.randn(T, 68, 3)
        lv = r.rand(T) > 0.2
        pose = r.randn(T, 3)
        pv = r.rand(T) > 0.3
        return times, lm, lv, pose, pv

    vids = [make_inputs(11, 1), make_inputs(7, 2), make_inputs(11, 3)]
    kw = dict(lm_min_cutoff=0.5, lm_beta=0.1, pose_min_cutoff=0.1,
              pose_beta=0.1)

    # reference: plain per-video dispatches (two chained chunks each to
    # exercise the carry hand-off)
    ref = []
    for t, lm, lv, pose, pv in vids:
        c1, c2 = one_euro_init_carry((68, 3)), one_euro_init_carry((3,))
        a = v4_smooth_chunk(c1, c2, t[:5], lm[:5], lv[:5], pose[:5], pv[:5], **kw)
        b = v4_smooth_chunk(a[3], a[4], t[5:], lm[5:], lv[5:], pose[5:], pv[5:], **kw)
        ref.append((np.asarray(a[0]), np.asarray(b[0]),
                    np.asarray(a[1]), np.asarray(b[1]),
                    np.asarray(a[2]), np.asarray(b[2])))

    deactivate = coalesce._activate_program_coalescer(max_wait_ms=60.0)
    try:
        assert coalesce.program_coalescing_active()

        def run_video(args):
            t, lm, lv, pose, pv = args
            c1, c2 = one_euro_init_carry((68, 3)), one_euro_init_carry((3,))
            a = _smooth.v4_smooth_chunk_co(c1, c2, t[:5], lm[:5], lv[:5],
                                           pose[:5], pv[:5], **kw)
            b = _smooth.v4_smooth_chunk_co(a[3], a[4], t[5:], lm[5:], lv[5:],
                                           pose[5:], pv[5:], **kw)
            return (np.asarray(a[0]), np.asarray(b[0]),
                    np.asarray(a[1]), np.asarray(b[1]),
                    np.asarray(a[2]), np.asarray(b[2]))

        with ThreadPoolExecutor(3) as pool:
            got = list(pool.map(run_video, vids))
    finally:
        deactivate()

    for r, g in zip(ref, got):
        for a, b in zip(r, g):
            np.testing.assert_allclose(np.where(np.isnan(a), -1, a),
                                       np.where(np.isnan(b), -1, b),
                                       atol=1e-5, rtol=1e-5)


def test_coalesced_one_euro_matches_single_dispatch():
    from concurrent.futures import ThreadPoolExecutor

    from fvd_tpu.nodes import _smooth
    from fvd_tpu.ops.filters import one_euro_init_carry, one_euro_scan_chunk
    from fvd_tpu.providers import coalesce

    def make(T, seed):
        r = np.random.RandomState(seed)
        return (np.cumsum(0.2 + 0.05 * r.rand(T)), r.randn(T, 68, 2),
                r.rand(T) > 0.2)

    vids = [make(9, 10), make(13, 11)]
    ref = []
    for t, v, ok in vids:
        out, c = one_euro_scan_chunk(one_euro_init_carry((68, 2)), t, v, ok,
                                     min_cutoff=0.5, beta=0.1)
        ref.append((np.asarray(out), jax.device_get(c)))

    deactivate = coalesce._activate_program_coalescer(max_wait_ms=60.0)
    try:
        def run_one(args):
            t, v, ok = args
            out, c = _smooth.one_euro_scan_chunk_co(
                one_euro_init_carry((68, 2)), t, v, ok,
                min_cutoff=0.5, beta=0.1)
            return np.asarray(out), jax.device_get(c)

        with ThreadPoolExecutor(2) as pool:
            got = list(pool.map(run_one, vids))
    finally:
        deactivate()

    for (r_out, r_c), (g_out, g_c) in zip(ref, got):
        np.testing.assert_allclose(np.where(np.isnan(r_out), -1, r_out),
                                   np.where(np.isnan(g_out), -1, g_out),
                                   atol=1e-5, rtol=1e-5)
        for rc, gc in zip(jax.tree_util.tree_leaves(r_c),
                          jax.tree_util.tree_leaves(g_c)):
            np.testing.assert_allclose(np.asarray(rc, np.float32),
                                       np.asarray(gc, np.float32),
                                       atol=1e-5, rtol=1e-5)
