"""Batch harness tests (reference batch_test.py behavior)."""

import json
import os

import numpy as np
import pytest

from fvd_tpu import batch
from fvd_tpu.config import default_config
from fvd_tpu.nodes.lr_fusion import load_weights, save_weights
from fvd_tpu.ops import fusion


def test_get_label_keywords():
    assert batch.get_label("Tom Cruise Deepfake.mp4") == 1
    assert batch.get_label("totally FAKE video.mp4") == 1
    assert batch.get_label("AI generated.mp4") == 1
    assert batch.get_label("synthesia-demo.mp4") == 1
    assert batch.get_label("bbc_news.mp4") == 0


def _seed_cache(features_dir, name, feats):
    os.makedirs(features_dir, exist_ok=True)
    with open(os.path.join(features_dir, f"{name}.json"), "w") as f:
        json.dump(feats, f)


FEATS = {
    "speech_rate": 0.5, "pause_ratio": 0.1, "lip_sync": 0.6,
    "gesture_score": 1.0, "blink_rate": 0.4, "headpose_jerk": 0.1,
    "texture": 0.3, "claim_reliability": 0.7, "evidence_reliability": 0.8,
}
WEIGHTS = {"bias": 0.2, "lip_sync": -0.4, "texture": 0.8}


def test_run_local_lr_fast_path(tmp_cwd):
    cfg = default_config()
    _seed_cache(cfg.fusion.features_dir, "x.mp4", FEATS)
    save_weights(cfg.fusion.weights_path, WEIGHTS)
    prob = batch.run_local_lr("videos/x.mp4", None, train=False, config=cfg)
    assert prob == pytest.approx(fusion.predict_host(FEATS, WEIGHTS))


def test_run_local_lr_train_updates_weights(tmp_cwd):
    cfg = default_config()
    _seed_cache(cfg.fusion.features_dir, "fake_x.mp4", FEATS)
    save_weights(cfg.fusion.weights_path, WEIGHTS)
    prob = batch.run_local_lr("videos/fake_x.mp4", 1, train=True, config=cfg)
    new_w = load_weights(cfg.fusion.weights_path)
    err = prob - 1.0
    assert new_w["bias"] == pytest.approx(WEIGHTS["bias"] - 0.005 * err)


def test_run_local_lr_missing_cache_returns_none(tmp_cwd):
    assert batch.run_local_lr("videos/nope.mp4", None, False, default_config()) is None


def test_evaluate_video_train_retries_until_correct(tmp_cwd):
    cfg = default_config()
    # Start with weights that misclassify a fake (prob < 0.5).
    _seed_cache(cfg.fusion.features_dir, "deepfake_y.mp4", FEATS)
    save_weights(cfg.fusion.weights_path, {"bias": -1.0})
    prob, attempts = batch.evaluate_video("videos/deepfake_y.mp4", train=True,
                                          max_retries=100, config=cfg)
    assert prob > 0.5
    assert attempts > 1


def test_train_device_matches_host_replay(tmp_cwd):
    cfg = default_config()
    names = ["real_a.mp4", "deepfake_b.mp4", "real_c.mp4"]
    rng = np.random.RandomState(0)
    all_feats = []
    for n in names:
        feats = {k: float(v) for k, v in zip(fusion.FEATURE_ORDER, rng.rand(9))}
        _seed_cache(cfg.fusion.features_dir, n, feats)
        all_feats.append(feats)
    save_weights(cfg.fusion.weights_path, {"bias": 0.0})

    msg = batch.train_device(cfg)
    assert "device-trained on 3" in msg
    w_dev = load_weights(cfg.fusion.weights_path)

    # Host replay (sorted file order == sorted names)
    w_host = {"bias": 0.0}
    for n in sorted(names):
        feats = json.load(open(os.path.join(cfg.fusion.features_dir, f"{n}.json")))
        label = batch.get_label(n)
        for _ in range(100):
            p = fusion.predict_host(feats, w_host)
            if (p > 0.5) == bool(label):
                break
            w_host, _ = fusion.sgd_update_host(feats, w_host, label)
    for k in fusion.FEATURE_ORDER:
        assert w_dev.get(k, 0.0) == pytest.approx(w_host.get(k, 0.0), abs=1e-5)
    assert w_dev["bias"] == pytest.approx(w_host["bias"], abs=1e-5)


def test_format_results_table(tmp_cwd):
    table = batch.format_results(
        [("a.mp4", 0, 0.3), ("fake_b.mp4", 1, 0.7), ("c.mp4", 0, None)]
    )
    assert "Total Accuracy: 100.00% (2/2)" in table
    assert "ERROR" in table
    assert "| REAL  | CORRECT" in table
    assert "| FAKE  | CORRECT" in table


def test_batch_main_fast_path(tmp_cwd):
    """End-to-end --train over cached features only (no real videos needed:
    seed videos/ with tiny synthetic clips + matching cache entries)."""
    from fvd_tpu.synthetic import make_synthetic_video

    cfg = default_config()
    make_synthetic_video("videos", name="real_clip", duration=1.0, fps=10.0,
                         width=64, height=48)
    make_synthetic_video("videos", name="fake_clip", duration=1.5, fps=10.0,
                         width=64, height=48)
    _seed_cache(cfg.fusion.features_dir, "real_clip.mp4",
                {**FEATS, "texture": 0.0})
    _seed_cache(cfg.fusion.features_dir, "fake_clip.mp4",
                {**FEATS, "texture": 0.9})
    save_weights(cfg.fusion.weights_path, {"bias": 0.0})

    rc = batch.main(["--train", "--results", "results/out.txt"])
    assert rc == 0
    with open("results/out.txt") as f:
        table = f.read()
    assert "Total Accuracy: 100.00% (2/2)" in table


def test_run_pipeline_many_concurrent(tmp_cwd):
    import dataclasses

    from fvd_tpu.config import EvidenceConfig
    from fvd_tpu.synthetic import hermetic_providers, make_synthetic_video

    cfg = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
    )
    videos = [
        make_synthetic_video("media", name=f"c{i}", duration=2.0, fps=10.0,
                             width=96, height=72)
        for i in range(3)
    ]
    probs = batch.run_pipeline_many(videos, cfg, hermetic_providers(fps=10.0),
                                    concurrency=2)
    assert len(probs) == 3
    assert all(p is not None and 0.0 <= p <= 1.0 for p in probs)


def test_batch_main_concurrent_eval(tmp_cwd):
    import dataclasses

    from fvd_tpu.providers import set_providers, Providers
    from fvd_tpu.synthetic import hermetic_providers, make_synthetic_video

    make_synthetic_video("videos", name="a", duration=1.0, fps=10.0, width=64, height=48)
    make_synthetic_video("videos", name="fake_b", duration=1.5, fps=10.0, width=64, height=48)
    save_weights(default_config().fusion.weights_path, {"bias": 0.0})
    old = set_providers(hermetic_providers(fps=10.0))
    try:
        rc = batch.main(["--concurrency", "2", "--results", "results/cc.txt"])
    finally:
        set_providers(Providers())
    assert rc == 0
    with open("results/cc.txt") as f:
        assert "Total Accuracy" in f.read()
