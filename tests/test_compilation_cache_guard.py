"""The shared TPU XLA cache guard must key on the PRIMARY platform.

Accelerator transports list cpu as a trailing fallback (this host's axon
relay reports ``jax.config.jax_platforms == "axon,cpu"``); a substring test
would silently disable persistent caching for every accelerator run — which
is exactly what happened to the round-5 bench pre-warm. Ad-hoc CPU scripts
(``jax.config.update("jax_platforms", "cpu")``) must still be excluded:
CPU AOT executables embed host CPU features and poison the shared cache.
"""
from fac_fake_tpu import _cpu_is_primary


def test_cpu_only_is_excluded():
    assert _cpu_is_primary("cpu")
    assert _cpu_is_primary("CPU")
    assert _cpu_is_primary("cpu,axon")  # cpu primary, accelerator fallback


def test_accelerator_with_cpu_fallback_is_cached():
    # the regression: axon latches "axon,cpu" via the config API
    assert not _cpu_is_primary("axon,cpu")
    assert not _cpu_is_primary("tpu,cpu")
    assert not _cpu_is_primary("axon")


def test_unset_platform_is_not_cpu():
    assert not _cpu_is_primary(None)
    assert not _cpu_is_primary("")
