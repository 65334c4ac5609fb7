"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh tests, halo exchange) execute without TPU hardware — the analog
of the reference's mock-the-model unit-test style (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon harness pins jax_platforms to "axon,cpu" at import time, which
# overrides the env var — force CPU explicitly so tests never touch the
# single real TPU chip.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test from a scratch working directory (nodes write relative
    paths like ``features/`` and ``lr_weights.json``, mirroring the
    reference's cwd-relative persistence)."""
    monkeypatch.chdir(tmp_path)
    return tmp_path
