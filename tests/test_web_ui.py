"""Web frontend tests: HTTP contract + a full run through the server."""

import dataclasses
import json
import time
import urllib.request

import pytest

from fvd_tpu.config import EvidenceConfig, default_config
from fvd_tpu.graph import NODE_ORDER
from fvd_tpu.ui.web import serve_web
from tests.fixtures_synthetic import make_video_with_audio, scripted_providers


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("web")
    import os

    os.chdir(tmp)
    video = make_video_with_audio(str(tmp / "media"))
    config = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
    )
    srv, manager = serve_web(
        port=0, config=config, providers=scripted_providers(), block=False
    )
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, video
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url):
    req = urllib.request.Request(url, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_index_serves_page(server):
    base, _ = server
    status, body = _get(base + "/")
    assert status == 200
    assert b"Fake Video Detection Engine" in body


def test_graph_layout(server):
    base, _ = server
    status, body = _get(base + "/graph")
    layout = json.loads(body)
    assert set(layout["nodes"]) == set(NODE_ORDER)
    assert ["IN", "A1"] in [list(e) for e in layout["edges"]]


def test_analyze_requires_path(server):
    base, _ = server
    req = urllib.request.Request(base + "/analyze", method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=10)
    assert exc.value.code == 400


def test_full_run_through_server(server):
    base, video = server
    status, resp = _post(base + f"/analyze?path={urllib.request.quote(video)}")
    assert resp["started"]

    deadline = time.time() + 120
    snap = None
    while time.time() < deadline:
        _, body = _get(base + "/status")
        snap = json.loads(body)
        if snap["result"] or snap["error"]:
            break
        time.sleep(0.5)
    assert snap["error"] is None, snap["error"]
    result = snap["result"]
    assert result["verdict"] in ("FAKE", "REAL")
    assert 0.0 < result["fake_probability"] < 1.0
    assert set(result["features"]) >= {"lip_sync", "texture", "speech_rate"}
    assert result["claims"]
    assert snap["statuses"]["LR"] == "done"
    # concurrent second launch while idle works; rejected while running is
    # covered by the manager contract (started False)
    _, resp2 = _post(base + f"/analyze?path={urllib.request.quote(video)}")
    assert "started" in resp2


def test_artifact_endpoint_serves_and_restricts(server):
    base, video = server
    # ensure a finished run exists
    _post(base + f"/analyze?path={urllib.request.quote(video)}")
    deadline = time.time() + 120
    result = None
    while time.time() < deadline:
        _, body = _get(base + "/status")
        snap = json.loads(body)
        if snap["result"]:
            result = snap["result"]
            break
        time.sleep(0.5)
    assert result is not None

    # a keyframe inside data_dir serves
    frames = result["frames"]
    assert frames and frames[0]["keyframe"]
    status, body = _get(base + "/artifact?path=" +
                        urllib.request.quote(frames[0]["keyframe"]))
    assert status == 200
    assert body[:2] == b"\xff\xd8"  # JPEG magic

    # signals present for the synthetic run
    assert "audio_envelope" in result["signals"]
    assert "mar" in result["signals"]
    assert len(result["signals"]["mar"]) <= 200

    # traversal outside data_dir is forbidden
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(base + "/artifact?path=/etc/passwd", timeout=10)
    assert exc.value.code == 403


def test_progressive_mode_through_server(server):
    base, video = server
    # wait out any still-running prior test's analysis
    deadline = time.time() + 60
    while time.time() < deadline:
        _, body = _get(base + "/status")
        if not json.loads(body)["running"]:
            break
        time.sleep(0.5)
    _, resp = _post(
        base + f"/analyze?path={urllib.request.quote(video)}&stream=true&chunk=2.0"
    )
    assert resp["started"]
    deadline = time.time() + 120
    snap = None
    while time.time() < deadline:
        _, body = _get(base + "/status")
        snap = json.loads(body)
        if not snap["running"] and (snap["result"] or snap["error"]):
            break
        time.sleep(0.3)
    assert snap["error"] is None, snap["error"]
    # 6 s video, 2 s chunks -> 3 progressive updates with rising coverage
    assert len(snap["progressive"]) == 3
    fractions = [u["fraction"] for u in snap["progressive"]]
    assert fractions == sorted(fractions)
    assert all(0.0 <= u["p"] <= 1.0 for u in snap["progressive"])
    assert snap["result"]["verdict"] in ("FAKE", "REAL")
