"""Post-training int8 stem quantization (`compat/quantize.py`).

No trained checkpoints ship in this environment, so fidelity is pinned
numerically: the quantized model must track the folded fp model's logits on
held-out inputs within PTQ noise, and the qconv primitive must match an
explicit numpy int8 reference exactly.
"""
import numpy as np
import pytest


def _tiny_cvit():
    from fac_fake_tpu.models.cvit import CViT
    spec = ()
    for ch in (8, 16):
        spec += (("conv", ch), ("bn", ch), ("relu",),
                 ("conv", ch), ("bn", ch), ("relu",), ("pool",))
    return CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                mlp_dim=32, pos_mode="patch")


def test_qconv_matches_numpy_int8_reference():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.models.layers import QuantConv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    mod = QuantConv3x3(6, dtype=jnp.float32)
    v = mod.init(jax.random.key(0), x)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (3, 3, 4, 6)), jnp.int8),
        "w_scale": jnp.asarray(rng.uniform(0.01, 0.1, (6,)), jnp.float32),
        "x_scale": jnp.asarray(0.05, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((6,)), jnp.float32),
    }
    out = np.asarray(mod.apply({"params": p}, x))

    xq = np.clip(np.round(np.asarray(x) / 0.05), -127, 127).astype(np.int32)
    k = np.asarray(p["kernel_q"], np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 8, 8, 6), np.int64)
    for dy in range(3):
        for dx in range(3):
            ref += np.einsum("bhwc,co->bhwo", xp[:, dy:dy + 8, dx:dx + 8],
                             k[dy, dx])
    ref = ref * (0.05 * np.asarray(p["w_scale"])) + np.asarray(p["bias"])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_quantize_cvit_rewrites_spec_and_tracks_fp():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.fold import fold_cvit
    from fac_fake_tpu.compat.quantize import quantize_cvit

    model = _tiny_cvit()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    variables = model.init(jax.random.key(2), x0[:1])
    fmodel, fvars = fold_cvit(model, variables)
    assert all(op[0] != "bn" for op in fmodel.stem_spec)

    qmodel, qvars = quantize_cvit(fmodel, fvars, x0)
    n_q = sum(op[0] == "qconv" for op in qmodel.stem_spec)
    assert n_q == 4 and all(op[0] != "conv" for op in qmodel.stem_spec)

    xe = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    ref = np.asarray(fmodel.apply(fvars, xe, train=False))
    out = np.asarray(qmodel.apply(qvars, xe, train=False))
    # int8 PTQ noise: logits track fp within a few percent of the spread
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.1 * spread, (out, ref)
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.995, cos


def test_scorer_int8_auto_calibrates_and_tracks_scores():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    model = _tiny_cvit()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(3)
    crops = rng.integers(0, 255, (12, 32, 32, 3), dtype=np.uint8)

    cfg = Config(); cfg.data.image_size = 32; cfg.infer.batch_crops = 32
    ref = VideoScorer(model, variables, cfg).score_crops(crops)

    qcfg = Config(); qcfg.data.image_size = 32; qcfg.infer.batch_crops = 32
    qcfg.infer.quantize = "int8"
    qscorer = VideoScorer(model, variables, qcfg)
    assert qscorer._quant_pending
    got = qscorer.score_crops(crops)            # calibrates on this batch
    assert not qscorer._quant_pending
    assert sum(op[0] == "qconv" for op in qscorer.model.stem_spec) == 4
    assert abs(got - ref) < 0.05, (got, ref)    # PTQ noise on a sigmoid prob
    # second call reuses the quantized graph and is deterministic
    assert qscorer.score_crops(crops) == got


def test_mesh_sharded_int8_matches_single_device():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer
    from fac_fake_tpu.parallel.mesh import build_mesh
    from fac_fake_tpu.core.config import MeshConfig

    model = _tiny_cvit()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(4)
    crops = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)

    def build(mesh):
        cfg = Config(); cfg.data.image_size = 32; cfg.infer.batch_crops = 32
        cfg.infer.quantize = "int8"
        return VideoScorer(model, variables, cfg, mesh=mesh)

    single = build(None).score_crops(crops)
    mesh = build_mesh(MeshConfig(data=8, model=1))
    sharded = build(mesh).score_crops(crops)
    assert abs(single - sharded) < 1e-5, (single, sharded)


def test_quantize_multi_stem_with_slot_block():
    """Flagship-shaped models (stem + slot block + stem2) quantize BOTH
    stems: the second stem's activation scales calibrate from the sown
    `stem2_input` (the real post-slot activations), and logits still track
    the folded fp model."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.fold import fold_cvit
    from fac_fake_tpu.compat.quantize import quantize_cvit
    from fac_fake_tpu.models.cvit import CViT

    s1 = (("conv", 8), ("bn", 8), ("relu",), ("pool",),
          ("conv", 16), ("bn", 16), ("relu",), ("pool",))
    s2 = (("conv", 16), ("bn", 16), ("relu",), ("pool",))
    model = CViT(stem_spec=s1, stem2_spec=s2, slot1=("ggca", "add", 16),
                 patch_size=1, dim=32, depth=1, heads=2, mlp_dim=32,
                 pos_mode="patch")
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    variables = model.init(jax.random.key(6), x0[:1])
    fmodel, fvars = fold_cvit(model, variables)

    qmodel, qvars = quantize_cvit(fmodel, fvars, x0)
    assert sum(op[0] == "qconv" for op in qmodel.stem_spec) == 2
    assert sum(op[0] == "qconv" for op in qmodel.stem2_spec) == 1

    xe = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    ref = np.asarray(fmodel.apply(fvars, xe, train=False))
    out = np.asarray(qmodel.apply(qvars, xe, train=False))
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.1 * spread, (out, ref)


def test_quantize_transformer_tracks_fp():
    """`transformer=True` quantizes the patch embedding, every attention
    qkv/out, every FFN fc1/fc2 and the head's fc1 — logits must still track
    the folded fp model within int8 PTQ noise."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.fold import fold_cvit
    from fac_fake_tpu.compat.quantize import quantize_cvit
    from fac_fake_tpu.models.cvit import CViT

    spec = ()
    for ch in (8, 16):
        spec += (("conv", ch), ("bn", ch), ("relu",),
                 ("conv", ch), ("bn", ch), ("relu",), ("pool",))
    model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=2, heads=2,
                 mlp_dim=64, pos_mode="patch")
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    variables = model.init(jax.random.key(8), x0[:1])
    fmodel, fvars = fold_cvit(model, variables)

    qmodel, qvars = quantize_cvit(fmodel, fvars, x0, transformer=True)
    assert qmodel.quant_dense
    # every targeted Dense carries an int8 kernel
    p = qvars["params"]
    assert p["patch_to_embedding"]["kernel_q"].dtype == jnp.int8
    for i in range(2):
        assert p["transformer"][f"attn{i}"]["to_qkv"]["kernel_q"].dtype == jnp.int8
        assert "bias" not in p["transformer"][f"attn{i}"]["to_qkv"]
        assert p["transformer"][f"attn{i}"]["to_out"]["kernel_q"].dtype == jnp.int8
        assert p["transformer"][f"ffn{i}"]["fc1"]["kernel_q"].dtype == jnp.int8
        assert p["transformer"][f"ffn{i}"]["fc2"]["kernel_q"].dtype == jnp.int8
    assert p["mlp_head"]["fc1"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in p["mlp_head"]["fc2"]     # 2-logit head stays fp

    xe = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    ref = np.asarray(fmodel.apply(fvars, xe, train=False))
    out = np.asarray(qmodel.apply(qvars, xe, train=False))
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.1 * spread, (out, ref)
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.995, cos


def test_quantize_transformer_flagship_shape_legacy_pos():
    """Flagship-shaped quantization: multi-stem + slot block + LinearNorm
    FFN pre-norms (eval path is pure LayerNorm) + legacy batch-indexed
    pos-embedding with pos_indices through the quantized forward."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.fold import fold_cvit
    from fac_fake_tpu.compat.quantize import quantize_cvit
    from fac_fake_tpu.models.cvit import CViT

    s1 = (("conv", 8), ("bn", 8), ("relu",), ("pool",),
          ("conv", 16), ("bn", 16), ("relu",), ("pool",))
    s2 = (("conv", 16), ("bn", 16), ("relu",), ("pool",))
    model = CViT(stem_spec=s1, stem2_spec=s2, use_ggca=True,
                 ffn_norm="linearnorm", patch_size=1, dim=32, depth=1,
                 heads=2, mlp_dim=32, pos_mode="legacy")
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    variables = model.init(jax.random.key(10), x0[:1], train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fmodel, fvars = fold_cvit(model, variables)

    qmodel, qvars = quantize_cvit(fmodel, fvars, x0, transformer=True)
    assert qmodel.quant_dense
    assert sum(op[0] == "qconv" for op in qmodel.stem_spec) == 2

    xe = jnp.asarray(rng.standard_normal((4, 32, 32, 3)) * 0.5, jnp.float32)
    pos = jnp.arange(4) % 32
    ref = np.asarray(fmodel.apply(fvars, xe, train=False, pos_indices=pos))
    out = np.asarray(qmodel.apply(qvars, xe, train=False, pos_indices=pos))
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.1 * spread, (out, ref)


def test_quantize_requires_folded_stem():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.quantize import quantize_cvit

    model = _tiny_cvit()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="folded"):
        quantize_cvit(model, variables, jnp.zeros((2, 32, 32, 3)))
