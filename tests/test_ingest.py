"""IN node tests (reference tests/test_in_node.py semantics: synthetic
video ingest, artifact layout, missing-file error)."""

import os

import numpy as np
import pytest

from fvd_tpu.nodes import ingest
from fvd_tpu.state import State
from fvd_tpu.synthetic import make_synthetic_video


def test_local_ingest_artifacts(tmp_cwd):
    video = make_synthetic_video("src", duration=2.0, fps=10.0, width=96, height=72)
    delta = ingest.run(State(input_path=video))
    ddir = delta["data_dir"]
    assert os.path.isdir(ddir)
    assert ddir.startswith("processed/video_")
    assert os.path.exists(os.path.join(ddir, "video.mp4"))
    # audio extracted (native shim or sibling wav)
    assert os.path.exists(os.path.join(ddir, "audio.wav"))
    meta = delta["metadata"]
    assert meta["original_path"] == video
    assert meta["fps"] == pytest.approx(10.0)
    assert meta["duration"] == pytest.approx(2.0, abs=0.2)
    assert meta["size"] == [96, 72]
    assert os.path.exists(os.path.join(ddir, "IN_debug.json"))


def test_missing_input_raises(tmp_cwd):
    with pytest.raises(FileNotFoundError):
        ingest.run(State(input_path="nope.mp4"))


def test_codec_rotation_metadata(tmp_cwd):
    """Reference parity: ingest records ffprobe-style codec + rotation
    metadata (main.py:77-116) — via the native shim here."""
    from fvd_tpu.providers.native_decode import available

    video = make_synthetic_video("src", duration=1.0, fps=10.0, width=96, height=72)
    delta = ingest.run(State(input_path=video))
    meta = delta["metadata"]
    assert meta["rotation"] == 0  # cv2-written mp4 carries no display matrix
    if available():
        assert meta.get("codec")  # e.g. "mpeg4"/"h264" depending on writer


def test_av1_transcode_leg(tmp_cwd, monkeypatch):
    """An AV1 probe triggers the transcode leg (reference main.py:117-170);
    without an ffmpeg binary the ingest proceeds on the libav decode path."""
    calls = []
    monkeypatch.setattr(ingest, "probe_codec_rotation", lambda p: ("av1", 0))
    monkeypatch.setattr(ingest, "_transcode_h264",
                        lambda p: calls.append(p) or False)
    video = make_synthetic_video("src", duration=1.0, fps=10.0, width=64, height=48)
    delta = ingest.run(State(input_path=video))
    assert calls, "AV1 probe must attempt the transcode leg"
    assert delta["metadata"]["codec"] == "av1"


def test_url_ingest_mocked_downloader(tmp_cwd, monkeypatch):
    """Mocked URL ingestion (reference tests/test_in_node.py:54-92): the
    downloader seam is patched, ingest lays out artifacts + corpus copy and
    merges the downloader's metadata."""
    import shutil

    from fvd_tpu.providers.media import Downloader

    src = make_synthetic_video("src", duration=1.0, fps=10.0, width=96, height=72)

    def fake_download(self, url, output_dir, debug=False):
        dst = os.path.join(output_dir, "video.mp4")
        shutil.copy2(src, dst)
        shutil.copy2(src.replace(".mp4", ".wav"), dst.replace(".mp4", ".wav"))
        return dst, {"title": "Test Video", "uploader": "Test Uploader"}

    monkeypatch.setattr(Downloader, "download", fake_download)
    delta = ingest.run(State(input_path="https://example.com/watch?v=test"))
    meta = delta["metadata"]
    assert meta["title"] == "Test Video"
    assert meta["fps"] == pytest.approx(10.0)
    assert meta["rotation"] == 0
    assert os.path.exists(os.path.join(delta["data_dir"], "video.mp4"))
    # corpus copy (reference main.py:221-228)
    assert any(f.endswith(".mp4") for f in os.listdir("videos"))


def test_downloader_oauth2_escalation(tmp_cwd, monkeypatch):
    """Reference main.py:240-245: after the cookie-based attempts fail, the
    FINAL retry escalates to yt-dlp's OAuth2 device-code flow (username
    'oauth2', empty password)."""
    import sys
    import types

    from fvd_tpu.providers.media import Downloader

    seen = []

    class FakeYDL:
        def __init__(self, opts):
            seen.append(dict(opts))  # snapshot: escalation mutates in place

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def extract_info(self, url, download=True):
            if len(seen) < 3:
                raise RuntimeError("HTTP Error 403: Forbidden")
            return {"title": "t", "duration": 1, "uploader": "u"}

        def prepare_filename(self, info):
            return os.path.join("dl", "video.mp4")

    mod = types.ModuleType("yt_dlp")
    mod.YoutubeDL = FakeYDL
    monkeypatch.setitem(sys.modules, "yt_dlp", mod)

    path, meta = Downloader(retries=3, backoff_s=0.0).download(
        "https://example.com/watch?v=x", "dl")
    assert path.endswith("video.mp4") and meta["title"] == "t"
    assert len(seen) == 3
    assert "username" not in seen[0] and "username" not in seen[1]
    assert seen[2]["username"] == "oauth2" and seen[2]["password"] == ""


def test_video_without_audio_track(tmp_cwd):
    # video only, no sibling wav
    from fvd_tpu.providers.media import write_video

    os.makedirs("src", exist_ok=True)
    write_video("src/silent.mp4", np.zeros((10, 48, 64, 3), np.uint8), 10.0)
    delta = ingest.run(State(input_path="src/silent.mp4"))
    assert not os.path.exists(os.path.join(delta["data_dir"], "audio.wav"))
    assert delta["metadata"]["fps"] == pytest.approx(10.0)


def test_url_without_downloader_raises(tmp_cwd, monkeypatch):
    from fvd_tpu.providers.media import Downloader

    monkeypatch.setattr(Downloader, "available", property(lambda self: False))
    with pytest.raises(RuntimeError, match="yt-dlp"):
        ingest.run(State(input_path="https://example.com/v"))


def test_debug_flag_propagates(tmp_cwd):
    video = make_synthetic_video("src", duration=1.0, fps=10.0, width=64, height=48)
    delta = ingest.run(State(input_path=video, debug=True))
    assert delta["debug"] is True
