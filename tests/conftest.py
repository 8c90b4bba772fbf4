"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no test suite (SURVEY.md §4); this framework creates one. All
multi-device tests run on a virtual 8-device CPU backend so the full
pjit/sharding path is exercised without TPU hardware.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in _flags:
    # 8 virtual devices share ONE physical core here: a loaded host can
    # stall a collective rendezvous past XLA:CPU's default terminate
    # timeout, which EXITS the process ("Exiting to ensure a consistent
    # program state") — a flaky suite-wide SIGABRT. Warn late, never kill.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags

# The axon sitecustomize imports jax at interpreter startup, latching
# JAX_PLATFORMS before this file runs — override through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Per-host persistent compile cache (the same one the dryrun uses): the
# suite's big graphs (the ca_s3d mesh step is ~4 min of XLA:CPU work on this
# 1-core host) compile once per machine. Safe across machine changes: XLA
# refuses to load AOT results whose CPU feature set mismatches and silently
# recompiles (observed, not just documented).
# TWIN: __graft_entry__.py _phase_env_cache() is this same block (inline in
# both on purpose — each must run before package import) — change both.
try:
    _cache = os.path.join(os.path.expanduser("~"), ".cache",
                          "fac_fake_tpu_xla_cpu")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
