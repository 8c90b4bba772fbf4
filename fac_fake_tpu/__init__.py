"""fac_fake_tpu — TPU-native video face-forgery detection framework."""
import os


def _cpu_is_primary(platforms):
    """True when the FIRST platform in a JAX platform list is cpu.

    The guard must key on the primary platform only: accelerator transports
    commonly carry cpu as a trailing fallback (e.g. ``axon,cpu``), and a
    substring test would disable caching for every accelerator run."""
    return str(platforms or "").lower().split(",")[0].strip() == "cpu"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: cold-start compiles of the detector
    and backbone graphs are expensive through remote-compile transports;
    caching makes every later process start warm."""
    if _cpu_is_primary(os.environ.get("JAX_PLATFORMS", "")):
        # CPU AOT executables are machine-feature-specific; a shared cache
        # across hosts risks SIGILL. Cache only accelerator backends.
        return
    try:
        import jax
        if _cpu_is_primary(getattr(jax.config, "jax_platforms", None)):
            # platform switched to CPU via the config API (the env var is
            # latched by sitecustomize, so ad-hoc CPU scripts do this) —
            # same machine-feature hazard as the env guard above
            return
        if jax.config.jax_compilation_cache_dir:
            # caller already chose a cache (e.g. __graft_entry__'s per-host
            # CPU cache, or the platform was switched to CPU via the config
            # API which the env guard above can't see) — never override
            return
        cache_dir = os.environ.get(
            "FAC_TPU_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "fac_fake_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

_LAZY = {
    "Config": ("fac_fake_tpu.core.config", "Config"),
    "build_model": ("fac_fake_tpu.models", "build_model"),
    "Trainer": ("fac_fake_tpu.train.trainer", "Trainer"),
    "VideoScorer": ("fac_fake_tpu.infer.predictor", "VideoScorer"),
    "BlazeFace": ("fac_fake_tpu.detect.blazeface", "BlazeFace"),
    "build_mesh": ("fac_fake_tpu.parallel.mesh", "build_mesh"),
    "load_plan": ("fac_fake_tpu.core.plans", "load_plan"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
