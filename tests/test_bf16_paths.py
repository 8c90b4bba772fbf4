"""bf16 mixed-precision fast paths.

The train step is HBM-bandwidth-bound around its elementwise passes, so the
bf16 mode keeps full-tensor traffic in bf16 everywhere: the hand-rolled
BatchNorm normalize (`models/layers.py TorchBatchNorm`), the augmentation
chain (`data/augment.py compute_dtype`), and the input normalize. These
tests pin (a) the fp32 paths stay bit-exact vs stock flax / the fp32 chain,
and (b) the bf16 paths agree within bf16 rounding.
"""
import numpy as np
import pytest


def test_bn_fp32_path_bit_exact_vs_stock_flax():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.layers import BN_EPS, BN_MOMENTUM, TorchBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), jnp.float32)
    ours = TorchBatchNorm(use_running_average=False)
    stock = nn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)
    v0 = ours.init(jax.random.key(0), x)
    out_a, mut_a = ours.apply(v0, x, mutable=["batch_stats"])
    out_b, mut_b = stock.apply(v0, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    for a, b in zip(jax.tree.leaves(mut_a), jax.tree.leaves(mut_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_bf16_fast_path_matches_fp32_stats():
    """bf16 BN: stats still accumulate fp32 (running stats bit-match a
    fp32-stats run), the normalized output matches fp32 math within bf16
    rounding, and eval mode uses the running stats."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.layers import TorchBatchNorm

    rng = np.random.default_rng(1)
    xf = jnp.asarray(rng.standard_normal((8, 4, 4, 32)) * 3 + 1, jnp.float32)
    x = xf.astype(jnp.bfloat16)

    bn16 = TorchBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    v0 = bn16.init(jax.random.key(0), x)
    out16, mut = bn16.apply(v0, x, mutable=["batch_stats"])
    assert out16.dtype == jnp.bfloat16

    # fp32 reference on the SAME bf16 inputs (isolates the normalize math)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(0, 1, 2))
    var = jnp.maximum((x32 ** 2).mean(axis=(0, 1, 2)) - mean ** 2, 0.0)
    ref = (x32 - mean) / jnp.sqrt(var + bn16.epsilon)
    np.testing.assert_allclose(np.asarray(out16, np.float32), np.asarray(ref),
                               atol=0.05)

    # running stats are fp32 and match the fp32 formula exactly-ish
    stats = mut["batch_stats"]
    assert stats["mean"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(stats["mean"]),
        np.asarray((1 - bn16.momentum) * mean), rtol=1e-5)

    # eval mode consumes running stats
    from fac_fake_tpu.models.layers import TorchBatchNorm as BN
    bn_eval = BN(use_running_average=True, dtype=jnp.bfloat16)
    v1 = {"params": v0.get("params", {}), "batch_stats": stats}
    out_eval = bn_eval.apply(v1, x)
    ref_eval = (x32 - stats["mean"]) / jnp.sqrt(stats["var"] + bn16.epsilon)
    np.testing.assert_allclose(np.asarray(out_eval, np.float32),
                               np.asarray(ref_eval), atol=0.05)


def test_bn_bf16_grads_flow():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.layers import TorchBatchNorm

    bn = TorchBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    x = jnp.ones((2, 4, 4, 8), jnp.bfloat16)
    v = bn.init(jax.random.key(0), x)

    def loss(params, x):
        out, _ = bn.apply({**v, "params": params}, x,
                          mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(v["params"], x)
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree.leaves(g))


def test_bn3d_shares_fast_path_and_fp32_stays_exact():
    """The S3D family's BN3D inherits the bf16 fast path (NDHWC reduces
    over all-but-last); its fp32 path must remain bit-exact vs stock flax
    with the S3D hyperparameters (eps=1e-3, decay=0.999)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.s3d.layers import BN3D

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 16)) * 2, jnp.float32)
    ours = BN3D(use_running_average=False)
    stock = nn.BatchNorm(use_running_average=False, momentum=0.999,
                         epsilon=1e-3)
    v = ours.init(jax.random.key(0), x)
    a, ma = ours.apply(v, x, mutable=["batch_stats"])
    b, mb = stock.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for p, q in zip(jax.tree.leaves(ma), jax.tree.leaves(mb)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q))

    bn16 = BN3D(use_running_average=False, dtype=jnp.bfloat16)
    o16, m16 = bn16.apply(v, x.astype(jnp.bfloat16), mutable=["batch_stats"])
    assert o16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o16, np.float32), np.asarray(a),
                               atol=0.05)
    assert m16["batch_stats"]["mean"].dtype == jnp.float32


def test_augment_batch_bf16_matches_fp32_within_rounding():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import AugmentConfig
    from fac_fake_tpu.data.augment import augment_batch

    rng = np.random.default_rng(2)
    batch = rng.integers(0, 255, (32, 32, 32, 3), dtype=np.uint8)
    cfg32 = AugmentConfig(enabled=True)          # strong_aug defaults
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    key = jax.random.key(5)
    out32 = augment_batch(key, jnp.asarray(batch), cfg32)
    out16 = augment_batch(key, jnp.asarray(batch), cfg16)
    assert out32.dtype == jnp.float32
    assert out16.dtype == jnp.bfloat16
    # same coins/params (same key, draws unchanged) → same ops fire; values
    # agree to bf16 rounding. gauss-noise draws differ per dtype, so compare
    # with noise off.
    assert np.isfinite(np.asarray(out16, np.float32)).all()
    cfg32q = dataclasses.replace(cfg32, gauss_noise=False)
    cfg16q = dataclasses.replace(cfg16, gauss_noise=False)
    a = np.asarray(augment_batch(key, jnp.asarray(batch), cfg32q))
    b = np.asarray(augment_batch(key, jnp.asarray(batch), cfg16q), np.float32)
    np.testing.assert_allclose(a, b, atol=0.03)


def test_trainer_resolves_auto_dtype_and_trains_bf16():
    import jax.numpy as jnp
    from helpers import synthetic_batches
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.models.cvit import CViT
    from fac_fake_tpu.train.trainer import Trainer

    spec = (("conv", 8), ("bn", 8), ("relu",), ("pool",)) * 3
    model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                 mlp_dim=32, pos_mode="patch", dtype=jnp.bfloat16)
    cfg = Config()
    cfg.data.image_size = 32
    cfg.data.augment.enabled = True
    cfg.train.epochs = 2
    cfg.train.log_every = 0
    cfg.train.checkpoint_every = 0
    trainer = Trainer(model, cfg, input_shape=(1, 32, 32, 3))
    batches = synthetic_batches(4, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches))
    h = out["history"]
    assert np.isfinite(h["train_loss"]).all()
    assert h["train_loss"][-1] < h["train_loss"][0] * 1.5
