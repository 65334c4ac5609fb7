"""Driver-contract robustness of bench.py.

The driver records bench.py's single stdout JSON line; behind a tunnel
that has been observed degraded (40+ min warmups) and hard-down
(backend UNAVAILABLE for hours), the bench must still produce a truthful
number when killed, and must retry backend bring-up."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_sigterm_emits_best_so_far():
    code = textwrap.dedent("""
        import sys, time, signal
        sys.path.insert(0, %r)
        import bench
        bench._RESULT.update({"metric": "m", "value": 42.0,
                              "unit": "videos/min", "vs_baseline": 0.84})
        signal.signal(signal.SIGTERM, bench._emit_on_signal)
        print("READY", flush=True)
        time.sleep(30)
    """ % os.path.abspath(REPO))
    p = subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "READY"
    p.terminate()
    out, _ = p.communicate(timeout=30)
    rec = json.loads(out.strip())
    assert rec["value"] == 42.0 and rec["unit"] == "videos/min"
    assert p.returncode == 0


def test_sigterm_without_result_exits_nonzero():
    code = textwrap.dedent("""
        import sys, time, signal
        sys.path.insert(0, %r)
        import bench
        signal.signal(signal.SIGTERM, bench._emit_on_signal)
        print("READY", flush=True)
        time.sleep(30)
    """ % os.path.abspath(REPO))
    p = subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "READY"
    p.terminate()
    out, _ = p.communicate(timeout=30)
    assert out.strip() == ""  # no fabricated number
    assert p.returncode == 1


def test_corpus_cache_dir_keying(tmp_path, monkeypatch):
    """The persistent fixture-corpus cache must rebuild when either the
    generation args or the generator sources change, and must not report
    complete until the marker lands."""
    sys.path.insert(0, os.path.abspath(REPO))
    import bench

    monkeypatch.setattr(bench.tempfile, "gettempdir", lambda: str(tmp_path))
    repo = os.path.abspath(REPO)

    d1, complete = bench._corpus_cache_dir(repo, "faces:8:30.0")
    assert not complete  # fresh dir: no COMPLETE marker yet
    d2, _ = bench._corpus_cache_dir(repo, "faces:8:30.0")
    assert d1 == d2  # same args + sources -> same dir
    d3, _ = bench._corpus_cache_dir(repo, "faces:8:60.0")
    assert d3 != d1  # args change the key

    # a different generator source tree changes the key too
    other = str(tmp_path / "other_repo")
    os.makedirs(os.path.join(other, "fvd_tpu", "models"))
    with open(os.path.join(other, "fvd_tpu", "synthetic.py"), "w") as f:
        f.write("# different generator\n")
    d4, _ = bench._corpus_cache_dir(other, "faces:8:30.0")
    assert d4 != d1

    with open(os.path.join(d1, "COMPLETE"), "w") as f:
        f.write("ok\n")
    _, complete = bench._corpus_cache_dir(repo, "faces:8:30.0")
    assert complete


def test_backend_retry_reexecs_then_falls_back_to_cpu(monkeypatch):
    import types

    sys.path.insert(0, os.path.abspath(REPO))
    import bench
    import fvd_tpu

    fake = types.ModuleType("jax")

    def boom():
        raise RuntimeError("UNAVAILABLE: fake")

    fake.devices = boom
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_META", {})
    calls = []
    monkeypatch.setattr(bench.os, "execv", lambda exe, argv: calls.append(exe))

    monkeypatch.setenv("FVD_TPU_BENCH_RETRIES", "2")
    bench._devices_or_reexec()
    assert calls == [sys.executable]
    assert os.environ["FVD_TPU_BENCH_RETRIES"] == "1"

    # retry budget exhausted -> honest CPU-backend fallback, tagged in the
    # JSON meta (the driver's recorded number is the number)
    monkeypatch.setenv("FVD_TPU_BENCH_RETRIES", "0")
    forced = []
    monkeypatch.setattr(fvd_tpu, "force_cpu", lambda: forced.append(1))
    fake.devices = lambda: ["cpu0"] if forced else boom()
    devs = bench._devices_or_reexec()
    assert devs == ["cpu0"] and forced
    assert bench._META["backend_note"] == "cpu-fallback-tpu-backend-down"
