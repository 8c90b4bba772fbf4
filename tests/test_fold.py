"""BN-folding correctness: folded model must reproduce eval logits exactly."""
import numpy as np
import pytest


@pytest.mark.parametrize("name", ["cvit", "cvit_repbn8"])
def test_fold_preserves_eval_logits(name):
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.fold import fold_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name=name))
    # train-init so BN stats are non-trivial defaults; then perturb stats
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=True)
    variables = jax.tree.map(lambda x: x, variables)
    # randomize running stats so folding is actually exercised
    rng = np.random.default_rng(0)
    bs = jax.tree.map(
        lambda x: jnp.asarray(np.abs(rng.normal(0.5, 0.2, x.shape)) + 0.1,
                              x.dtype), variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    ref = model.apply(variables, x, train=False)

    fmodel, fvars = fold_cvit(model, variables)
    # folded stems must have no bn ops left after conv/deconv
    for spec in (fmodel.stem_spec, getattr(fmodel, "stem2_spec", None) or ()):
        for i, op in enumerate(spec[:-1]):
            if op[0] in ("conv", "deconv"):
                assert spec[i + 1][0] != "bn"
    out = fmodel.apply(fvars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
