"""Training engine: data-parallel step over the 8-device mesh, LR
controllers, checkpoint round trip, on-device augmentation."""
import numpy as np
import pytest

from helpers import synthetic_batches, tiny_cvit


def _small_cfg(**train_kw):
    from fac_fake_tpu.core.config import Config
    cfg = Config()
    cfg.data.image_size = 32
    cfg.data.augment.enabled = False
    cfg.train.epochs = train_kw.pop("epochs", 3)
    cfg.train.log_every = 0
    cfg.train.checkpoint_every = 0
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def _tiny_model():
    from fac_fake_tpu.models.cvit import CViT
    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    return CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                mlp_dim=32, pos_mode="patch")


def test_training_learns_on_8_device_mesh():
    import jax
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=6)
    cfg.train.optim.lr = 3e-3
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    assert trainer.mesh.shape == {"data": 8, "model": 1}

    batches = synthetic_batches(8, 16, image_size=32)
    val = synthetic_batches(2, 16, image_size=32, seed=99)
    out = trainer.fit(lambda e: iter(batches), lambda e: iter(val))

    h = out["history"]
    assert h["train_loss"][-1] < h["train_loss"][0]
    assert h["val_acc"][-1] > 0.9  # separable by brightness
    assert out["best"]["acc"] > 0.9


def test_train_with_augmentation_and_schedule_counters():
    """LinearNorm ffn needs the schedule collection threaded + augs on."""
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.models.cvit import CViT
    from fac_fake_tpu.train.trainer import Trainer

    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                 mlp_dim=32, pos_mode="patch", ffn_norm="linearnorm")

    import jax

    cfg = _small_cfg(epochs=1)
    cfg.data.augment.enabled = True
    trainer = Trainer(model, cfg, input_shape=(1, 32, 32, 3))
    state = trainer.init_state()

    batches = synthetic_batches(3, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches), state=state)
    sched = out["state"].schedule
    leaves = jax.tree.leaves(sched)
    # iter counters decremented once per train step (3 steps)
    assert all(int(l) == 300000 - 3 for l in leaves if l.dtype == "int32" and int(l) > 100)


def test_lr_controllers():
    from fac_fake_tpu.core.config import OptimConfig
    from fac_fake_tpu.train.schedules import build_controller

    step = build_controller(OptimConfig(lr=1.0, schedule="step", step_size=2,
                                        step_gamma=0.1), epochs=10)
    lrs = [step.epoch_end(e, 0.0) for e in range(4)]
    assert np.allclose(lrs, [1.0, 0.1, 0.1, 0.01])

    plat = build_controller(OptimConfig(lr=1.0, schedule="plateau",
                                        plateau_factor=0.5, plateau_patience=1),
                            epochs=10)
    # improving -> unchanged; then 2 bad epochs -> halved
    assert plat.epoch_end(0, 1.0) == 1.0
    assert plat.epoch_end(1, 1.0) == 1.0   # bad 1 (<= patience)
    assert plat.epoch_end(2, 1.0) == 0.5   # bad 2 -> cut

    cos = build_controller(OptimConfig(lr=1.0, schedule="cosine",
                                       cosine_lrf=0.1), epochs=10)
    last = cos.epoch_end(9, 0.0)
    assert np.isclose(last, 0.1, atol=1e-6)  # final epoch hits lrf


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from fac_fake_tpu.train.checkpoint import (latest_epoch, restore_checkpoint,
                                               save_checkpoint)
    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=1)
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    state = trainer.init_state()
    save_checkpoint(str(tmp_path / "ck"), state, epoch=7)
    assert latest_epoch(str(tmp_path / "ck")) == 7
    restored = restore_checkpoint(str(tmp_path / "ck"), state)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_batch_shapes():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import AugmentConfig
    from fac_fake_tpu.data.augment import augment_batch

    x = np.random.randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = jax.jit(lambda k, b: augment_batch(k, b, AugmentConfig()))(
        jax.random.key(0), jnp.asarray(x))
    assert out.shape == (4, 32, 32, 3) and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # different keys -> different augs
    out2 = jax.jit(lambda k, b: augment_batch(k, b, AugmentConfig()))(
        jax.random.key(1), jnp.asarray(x))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_augment_param_coin_independence():
    """Brightness shifts must cover BOTH signs among *applied* samples: a
    PRNG key shared between the parameter draw and its apply-coin makes the
    coin<p region map to the lower half of the range (the op could only
    darken)."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import AugmentConfig
    from fac_fake_tpu.data.augment import augment_image

    cfg = AugmentConfig(enabled=True, prob=0.5, compose_prob=1.0,
                        rot90=False, transpose=False,
                        hflip=False, vflip=False, gauss_noise=False,
                        sharpen=False, emboss=False, clahe=False,
                        sharpen_oneof=False, brightness_contrast=True,
                        hue_saturation=False, color_jitter=False,
                        rotation_deg=0)
    img = jnp.full((8, 8, 3), 0.5, jnp.float32)  # contrast term vanishes
    fn = jax.jit(lambda k: augment_image(k, img, cfg).mean())
    means = np.array([float(fn(jax.random.key(i))) for i in range(200)])
    applied = means[np.abs(means - 0.5) > 1e-4]
    assert len(applied) > 30  # coin fires ~half the time
    assert (applied > 0.5).any() and (applied < 0.5).any()


def test_best_checkpoint_persisted(tmp_path):
    """fit() writes the best-val-acc snapshot to disk when checkpoint_dir is
    set (the reference saves its best model; memory-only loses it on crash)."""
    import jax
    from fac_fake_tpu.train.checkpoint import restore_best
    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=2)
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    batches = synthetic_batches(4, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches))
    assert (tmp_path / "ck" / "best").exists()
    restored = restore_best(cfg.train.checkpoint_dir, out["state"])
    assert jax.tree.structure(restored.params) == \
        jax.tree.structure(out["state"].params)


def test_padded_batch_rows_do_not_leak_into_loss():
    """train_step must mask pad rows out of the loss: a padded batch (zero
    images, label 0, mask 0) yields identical grads to the unpadded batch."""
    import jax
    from fac_fake_tpu.models.cvit import CViT
    from fac_fake_tpu.train.trainer import Trainer

    # BN-free stem: batch statistics would otherwise couple rows and mask
    # the thing under test (per-row loss masking)
    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("relu",), ("pool",))
    model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                 mlp_dim=32, pos_mode="patch")
    cfg = _small_cfg(epochs=1)
    trainer = Trainer(model, cfg, input_shape=(1, 32, 32, 3))
    state = trainer.shard_state(trainer.init_state())
    rng = jax.random.key(0)

    full = synthetic_batches(1, 16, image_size=32)[0]
    padded = {
        "image": np.concatenate([full["image"][:8],
                                 np.zeros_like(full["image"][:8])]),
        "label": np.concatenate([full["label"][:8],
                                 np.zeros(8, full["label"].dtype)]),
        "mask": np.concatenate([np.ones(8, np.float32),
                                np.zeros(8, np.float32)]),
    }
    half = {k: v[:8] for k, v in full.items()}
    half = {"image": np.concatenate([half["image"]] * 2),
            "label": np.concatenate([half["label"]] * 2),
            "mask": np.ones(16, np.float32)}
    # loss over 8 real rows == loss over the same 8 rows duplicated
    state2 = trainer.shard_state(trainer.init_state())
    _, m_pad = trainer.train_step(state, trainer.put_batch(padded), rng)
    _, m_dup = trainer.train_step(state2, trainer.put_batch(half), rng)
    assert abs(float(m_pad["loss"]) - float(m_dup["loss"])) < 1e-5


def test_device_cached_training_learns():
    """Whole-dataset-in-HBM mode: epochs run as one lax.scan jit; training
    must still learn and report sane metrics."""
    from fac_fake_tpu.train.trainer import DeviceCache, Trainer

    cfg = _small_cfg(epochs=6)
    cfg.train.optim.lr = 3e-3
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))

    batches = synthetic_batches(8, 16, image_size=32)
    images = np.concatenate([b["image"] for b in batches])
    labels = np.concatenate([b["label"] for b in batches])
    cache = trainer.cache_data(images, labels, batch_size=16)
    assert isinstance(cache, DeviceCache) and cache.steps == 8

    val = synthetic_batches(2, 16, image_size=32, seed=99)
    out = trainer.fit(cache, lambda e: iter(val))
    h = out["history"]
    assert h["train_loss"][-1] < h["train_loss"][0]
    assert h["val_acc"][-1] > 0.9


def test_gather_rows_both_strategies_match_take():
    """`_gather_rows` (TPU-tuned shuffle gather) must equal a plain row
    gather on both branches: unrolled dynamic_slices for few big rows
    (S3D clip caches), jnp.take for many small rows (CViT crop caches)."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.train.trainer import _gather_rows

    rng = np.random.default_rng(0)
    # big rows (>1 MB each), small batch -> unrolled dynamic_slice branch
    clips = jnp.asarray(rng.integers(0, 255, (6, 4, 224, 224, 3),
                                     dtype=np.uint8).reshape(6, -1))
    idx = jnp.asarray([4, 0, 5, 2])
    out = jax.jit(_gather_rows)(clips, idx)
    assert bool(jnp.all(out == jnp.take(clips, idx, axis=0)))

    # small rows -> jnp.take branch
    crops = jnp.asarray(rng.integers(0, 255, (10, 8, 8, 3), dtype=np.uint8))
    idx = jnp.asarray([9, 3, 1, 7, 0])
    out = jax.jit(_gather_rows)(crops, idx)
    assert bool(jnp.all(out == jnp.take(crops, idx, axis=0)))


def test_device_cached_eval_matches_streamed():
    """The scanned eval epoch computes exactly the streamed epoch's
    loss/acc (same batching, no shuffle, no augs)."""
    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=1)
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    state = trainer.shard_state(trainer.init_state())

    batches = synthetic_batches(4, 16, image_size=32)
    images = np.concatenate([b["image"] for b in batches])
    labels = np.concatenate([b["label"] for b in batches])
    cache = trainer.cache_data(images, labels, batch_size=16)

    _, _, streamed = trainer._run_epoch(state, iter(batches), None,
                                        train=False)
    _, _, cached = trainer._run_epoch(state, cache, None, train=False)
    assert abs(streamed["loss"] - cached["loss"]) < 1e-5
    assert abs(streamed["acc"] - cached["acc"]) < 1e-6


def test_batch_affine_matmul_approximates_gather_warp():
    """The shear-matmul affine (TPU-friendly, 3-pass) must track the classic
    map_coordinates inverse warp. The composed coordinate map is exactly
    R(-θ); resampling happens in three bilinear passes instead of one, so
    agreement is checked on a smooth image (multi-pass interpolation blurs
    high frequencies slightly — fine for augmentation)."""
    import jax.numpy as jnp
    from scipy import ndimage
    from fac_fake_tpu.data.augment import batch_affine_matmul

    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (np.sin(ys / 9.0) * np.cos(xs / 7.0) * 0.5 + 0.5)[None, :, :, None]
    ang = 0.2
    ours = np.asarray(batch_affine_matmul(
        jnp.asarray(img), jnp.float32(ang), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(0.0)))[0, :, :, 0]

    cy = cx = (64 - 1) / 2
    th = -ang
    src_y = np.cos(th) * (ys - cy) - np.sin(th) * (xs - cx) + cy
    src_x = np.sin(th) * (ys - cy) + np.cos(th) * (xs - cx) + cx
    ref = ndimage.map_coordinates(img[0, :, :, 0].astype(np.float64),
                                  [src_y, src_x], order=1, cval=0.0)
    inner = (slice(12, 52),) * 2
    assert np.abs(ours[inner] - ref[inner]).max() < 0.02
    # identity transform is exact
    ident = np.asarray(batch_affine_matmul(
        jnp.asarray(img), jnp.float32(0.0), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(0.0)))[0, :, :, 0]
    np.testing.assert_allclose(ident, img[0, :, :, 0], atol=1e-5)


def test_tensor_parallel_training_on_mesh():
    """dp×tp mesh (4×2): params shard over 'model', training still learns."""
    import jax
    from jax.sharding import PartitionSpec as P
    from fac_fake_tpu.core.config import MeshConfig
    from fac_fake_tpu.parallel.mesh import build_mesh, param_sharding_rules
    from fac_fake_tpu.train.trainer import Trainer

    mesh = build_mesh(MeshConfig(data=4, model=2))
    cfg = _small_cfg(epochs=3)
    cfg.train.optim.lr = 3e-3
    trainer = Trainer(_tiny_model(), cfg, mesh=mesh,
                      input_shape=(1, 32, 32, 3), tp_min_size=0)
    state = trainer.shard_state(trainer.init_state())

    # at least one kernel actually sharded over 'model'
    rules = param_sharding_rules(mesh, state.params, min_size=0)
    specs = [s.spec for s in jax.tree.leaves(rules)]
    assert any(spec == P(None, "model") for spec in specs)

    batches = synthetic_batches(8, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches), state=state)
    h = out["history"]
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_tensorboard_scalars_and_graph_dump(tmp_path):
    """With tensorboard_dir set, fit() writes scalar events AND the model
    graph as lowered StableHLO (the JAX analogue of the reference's
    `add_graph`, S3D-train.py:209-210)."""
    import os

    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=1)
    cfg.train.tensorboard_dir = str(tmp_path / "tb")
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    trainer.fit(lambda e: iter(synthetic_batches(2, 8, image_size=32)))
    tb = tmp_path / "tb"
    assert any(f.startswith("events") for f in os.listdir(tb))
    hlo = (tb / "model_graph.stablehlo.txt").read_text()
    assert "stablehlo" in hlo or "func.func" in hlo, hlo[:200]


def test_grad_accumulation_matches_big_batch_step():
    """grad_accum_steps=4 applies ONE Adam update from the mask-weighted
    mean microbatch gradient. For a BatchNorm-free model that is numerically
    the big-batch update (both losses are mask-means); with BN the forward
    normalizes per microbatch, so only the microbatch semantics (stats
    advancing per microbatch, same as torch grad accumulation) are pinned."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.cvit import CViT
    from fac_fake_tpu.train.trainer import Trainer

    batch = {"image": np.random.default_rng(0).integers(
                 0, 255, (16, 32, 32, 3), dtype=np.uint8),
             "label": np.arange(16, dtype=np.int32) % 2,
             "mask": np.ones((16,), np.float32)}

    def nobn_model():
        spec = ()
        for _ in range(5):
            spec += (("conv", 8), ("relu",), ("pool",))
        return CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                    mlp_dim=32, pos_mode="patch")

    def one_step(accum, model_fn):
        cfg = _small_cfg(epochs=1, grad_accum_steps=accum)
        trainer = Trainer(model_fn(), cfg, input_shape=(1, 32, 32, 3))
        state = trainer.shard_state(trainer.init_state())
        state, m = trainer.train_step(state, trainer.put_batch(batch),
                                      jax.random.key(7))
        return state, m

    # exact equivalence on the BN-free model
    s1, m1 = one_step(1, nobn_model)
    s4, m4 = one_step(4, nobn_model)
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-5
    assert float(m1["correct"]) == float(m4["correct"])
    assert float(m1["count"]) == float(m4["count"]) == 16.0
    # same post-update params (fp reassociation only)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        assert jnp.allclose(a, b, atol=2e-5), float(jnp.abs(a - b).max())

    # BN model: running stats advance once per microbatch (momentum applied
    # 4x vs 1x) — must differ, and the losses stay in the same ballpark
    b1, n1 = one_step(1, _tiny_model)
    b4, n4 = one_step(4, _tiny_model)
    bs1 = jax.tree.leaves(b1.batch_stats)
    bs4 = jax.tree.leaves(b4.batch_stats)
    assert any(not jnp.allclose(a, b, atol=1e-6) for a, b in zip(bs1, bs4))
    assert abs(float(n1["loss"]) - float(n4["loss"])) < 0.05


def test_grad_accumulation_learns():
    from fac_fake_tpu.train.trainer import Trainer

    cfg = _small_cfg(epochs=4, grad_accum_steps=2)
    cfg.train.optim.lr = 3e-3
    trainer = Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))
    batches = synthetic_batches(4, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches))
    assert out["history"]["train_loss"][-1] < out["history"]["train_loss"][0]
