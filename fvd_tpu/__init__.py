"""fvd_tpu — a TPU-native fake-video (deepfake + misinformation) detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``MrBottleTree/fake-video-detection-engine`` (the reference; see SURVEY.md):
a 16-node analysis DAG (ingest, audio, vision, cross-modal, web-evidence,
fusion) producing a single ``fake_probability`` per video.

Design stance (not a port):

* Decoded frames land once as HBM-resident ``uint8[T, H, W, 3]`` tensors;
  vision nodes are batched JAX/Pallas programs over the whole time axis
  instead of per-frame Python loops calling C++ libraries.
* The audio front-end (resample, STFT/mel, onsets, RMS envelope) is an
  on-device kernel pipeline instead of librosa/ffmpeg subprocesses.
* Lip-sync scoring (reference ``nodes/C_nodes/c1_lip_sync_score.py``) is a
  single fused windowed cross-correlation kernel.
* The LangGraph scheduler is replaced by a thin async host DAG runner whose
  nodes are functions ``State -> StateDelta`` with last-writer-wins merge
  (reference ``main.py:19-54``).
* External services (LLM, web search, video download) are host-side
  pluggable providers with deterministic stub implementations.
* Scale-out is expressed with ``jax.sharding.Mesh`` + ``pjit``/``shard_map``
  (data axis over videos, time axis with halo exchange for lip-sync).
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Cache compiled XLA programs across processes.

    Every entry point (CLI, batch harness, bench, serving) re-traces the
    same node programs; behind the axon tunnel a cold compile costs tens of
    seconds per program.  The persistent cache turns every warmup after the
    first process into a disk hit.  Opt out with FVD_TPU_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("FVD_TPU_NO_COMPILE_CACHE"):
        return
    # CPU-only processes (tests, local drives) skip the cache: XLA:CPU AOT
    # cache entries warn about machine-feature mismatches on reload and the
    # compiles they'd save are cheap anyway.  TPU programs — the tens-of-
    # seconds compiles behind the axon tunnel — are the payoff.  The env
    # check only catches processes that set JAX_PLATFORMS before import
    # (tests/conftest.py); callers that force CPU later via
    # jax.config.update (tools --cpu) still enable the cache — accepted:
    # the host-fingerprint dir scoping plus the 0.5 s min-compile threshold
    # make stray CPU entries harmless.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import hashlib
        import platform

        import jax

        # Scope the cache by host CPU fingerprint: XLA:CPU AOT entries embed
        # the compile machine's feature set, and a cache dir reused across
        # hosts (shared $HOME images) serves mismatched entries that can
        # SIGILL.  TPU entries just go cold once per new host.
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = platform.machine()
        host_id = hashlib.sha1(flags.encode()).hexdigest()[:10]
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "fvd_tpu",
                         f"xla-{host_id}"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail import over it


def force_cpu() -> None:
    """Pin this process to the CPU backend and drop the persistent compile
    cache.

    The harness pins ``jax_platforms=axon,cpu`` at import, so the env var
    alone cannot force CPU (CLAUDE.md); probes/tools must call this (or
    ``jax.config.update``) after ``import jax`` and BEFORE any jax op —
    touching the axon backend while another process holds the chip
    futex-waits.  Disabling the cache here also silences XLA:CPU AOT
    reload warnings (machine-feature pseudo-mismatches); CPU compiles are
    cheap, the persistent cache exists for tunnel TPU compiles.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass


_enable_persistent_compile_cache()

from fvd_tpu.state import State, StateDelta, merge_states  # noqa: F401
from fvd_tpu.config import Config, default_config  # noqa: F401
