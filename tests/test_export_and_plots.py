"""StableHLO export round trip + history plots + profiling utils."""
import os
import pickle

import numpy as np
import pytest


def test_stablehlo_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.export import export_stablehlo, load_stablehlo
    from helpers import tiny_cvit

    model = tiny_cvit(pos_mode="patch")
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    path = export_stablehlo(model, variables, (2, 224, 224, 3),
                            str(tmp_path / "cvit.stablehlo"))
    assert os.path.getsize(path) > 1000

    fn = load_stablehlo(path)
    out = fn(jax.device_get(variables), x)
    ref = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_history_plots(tmp_path):
    from fac_fake_tpu.evaluate.plots import load_history, plot_history
    hist = [[1.0, 0.5, 0.3], [0.5, 0.7, 0.9], [1.1, 0.6, 0.4], [0.4, 0.6, 0.8]]
    p = tmp_path / "h.pkl"
    with open(p, "wb") as f:
        pickle.dump(hist, f)
    h = load_history(str(p))
    assert h["val_acc"] == [0.4, 0.6, 0.8]
    out = plot_history([str(p)], out_path=str(tmp_path / "h.png"))
    assert os.path.getsize(out) > 1000


def test_profiling_utils():
    import jax.numpy as jnp
    from fac_fake_tpu.utils.profiling import (flops_estimate, param_count,
                                              time_fn)
    import jax

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((64, 64))
    sec, cps = time_fn(f, a, a, iters=3, warmup=1)
    assert sec > 0 and cps > 0
    fl = flops_estimate(lambda a, b: a @ b, a, a)
    assert fl != fl or fl >= 2 * 64 ** 3 * 0.5  # nan allowed, else ~2·n³
    assert param_count({"w": np.zeros((3, 4))}) == 12


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((128, 128))).block_until_ready()
    import glob
    assert glob.glob(str(tmp_path) + "/**/*.xplane.pb", recursive=True)
