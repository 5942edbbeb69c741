"""Test env: force an 8-device virtual CPU mesh before jax initializes.

This is how multi-chip sharding is tested without a pod (SURVEY.md §4): every
pjit/shard_map path runs on 8 virtual CPU devices; the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# GAR_TPU_TESTS=1 leaves the real TPU backend in place so the
# tests/test_tpu_smoke.py compiled-kernel lane actually runs on chip
# (everything else in that mode skips itself or runs fine on TPU)
_tpu_lane = os.environ.get("GAR_TPU_TESTS") == "1"

if not _tpu_lane:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _tpu_lane and "--xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "--xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # in-process CPU collectives rendezvous slowly on small hosts; keep the
    # stuck-detector's hard abort well above worst-case
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the environment pins JAX_PLATFORMS=axon via a site hook; config.update wins
if not _tpu_lane:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute compile-heavy suites (fast lane: -m 'not slow')",
    )
