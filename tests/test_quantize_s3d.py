"""S3D int8 PTQ engine (`compat/quantize_s3d.py`).

No trained reference checkpoints ship in this environment (SURVEY.md §2.6),
so fidelity is pinned numerically, the same contract as the CViT quantizer
(`tests/test_quantize.py`): the folded-BN fp walk must match
`model.apply(train=False)` to float-associativity noise, and the int8 logits
must stay within 11% of the fp spread with >0.99 centered correlation on
inputs spanning the 0–255 range. Randomized batch_stats make the fold
non-trivial (freshly-initialized BN folds to identity).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fac_fake_tpu.compat.quantize_s3d import quantize_s3d
from fac_fake_tpu.models.s3d.model import S3DNet, ca_s3d_spec

_P133 = ("pool", (1, 3, 3), (1, 2, 2), (0, 1, 1))
_P333 = ("pool", (3, 3, 3), (2, 2, 2), (1, 1, 1))
_P222 = ("pool", (2, 2, 2), (2, 2, 2), (0, 0, 0))

# every quantized op kind + an fp-delegated ctx, at test size
_SMALL_SPEC = (
    ("sep", 16, 7, 2, 3, "relu", True),
    _P133,
    ("basic", 16, 1, 1, 0, "relu"),
    ("sep", 24, 3, 1, 1, "relu", True),
    ("mix", "3b", "relu", True),
    _P333,
    ("mix", "m5b", "relu6", False),     # msca V2 branches: no spatial BN/act
    ("ctx", 1.0 / 16.0, "avg"),
    _P222,
)


def _randomize_stats(tree, seed=[100]):
    """BN running stats away from the init identity (mean 0 / var 1) so the
    fold actually exercises the algebra."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize_stats(v, seed)
        else:
            seed[0] += 1
            g = np.random.default_rng(seed[0])
            if k == "var":
                out[k] = jnp.asarray(g.uniform(0.5, 2.0, v.shape), jnp.float32)
            elif k == "mean":
                out[k] = jnp.asarray(g.normal(0.0, 0.5, v.shape), jnp.float32)
            else:
                out[k] = v
    return out


def _build(spec, srm="none", seed=0, batch=8, hw=32):
    model = S3DNet(spec=spec, num_class=1, srm=srm)
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 1.0, (batch, 20, hw, hw, 3))
    bright = np.linspace(30.0, 255.0, batch).reshape(batch, 1, 1, 1, 1)
    clips = jnp.asarray(base * bright, jnp.float32)
    vs = model.init(jax.random.key(seed), clips[:1])
    vs = {"params": dict(vs["params"]),
          "batch_stats": _randomize_stats(dict(vs["batch_stats"]))}
    return model, vs, clips


@pytest.fixture(scope="module")
def small():
    model, vs, clips = _build(_SMALL_SPEC)
    engine = quantize_s3d(model, vs, clips)
    ref = np.asarray(model.apply(vs, clips, train=False)).ravel()
    return model, vs, clips, engine, ref


def test_folded_fp_matches_model(small):
    """BN fold is exact algebra: the engine's fp walk ≡ model.apply."""
    model, vs, clips, engine, ref = small
    fp = np.asarray(engine.folded_fp_forward(vs, clips)).ravel()
    np.testing.assert_allclose(fp, ref, rtol=1e-4, atol=1e-4)


def test_int8_tracks_fp(small):
    model, vs, clips, engine, ref = small
    q = np.asarray(engine(clips)).ravel()
    spread = ref.max() - ref.min()
    assert np.abs(q - ref).max() <= 0.11 * spread, (q, ref)
    qc, rc = q - q.mean(), ref - ref.mean()
    cos = float(np.dot(qc, rc) / (np.linalg.norm(qc) * np.linalg.norm(rc)))
    assert cos > 0.99, cos


def test_quantized_coverage(small):
    """Every sep factor and every Inception-branch conv carries int8
    weights; ctx / head never enter the qparams."""
    _, _, _, engine, _ = small
    keys = set(engine.qparams)
    assert {"l0/s", "l0/t", "l2", "l3/s", "l3/t"} <= keys
    for mix in ("l4", "l6"):
        assert {f"{mix}/b0", f"{mix}/b1a", f"{mix}/b1b/s", f"{mix}/b1b/t",
                f"{mix}/b2a", f"{mix}/b2b/s", f"{mix}/b2b/t",
                f"{mix}/b3"} <= keys
    assert not any(k.startswith("l7") for k in keys)   # ctx stays fp
    assert "fc" not in keys
    for e in engine.qparams.values():
        assert e["w_q"].dtype == jnp.int8
        assert e["s"].shape == (e["w_q"].shape[-1],)


def test_mix_branches_share_input_scale(small):
    """The 4-branch Inception quantizes its input once — b0/b1a/b2a/b3
    record the same s_x (what makes the int8 pool commute exact)."""
    _, _, _, engine, _ = small
    qp = engine.qparams
    for mix in ("l4", "l6"):
        sx = {float(qp[f"{mix}/{b}"]["s_x"]) for b in ("b0", "b1a", "b2a", "b3")}
        assert len(sx) == 1, sx


def test_ca_s3d_full_spec():
    """The flagship eval target (`S3D-test.py:260-286` scoring forward):
    full CA_S3D_v3 spec quantizes, runs, and tracks fp."""
    model, vs, clips = _build(ca_s3d_spec(), batch=4)
    engine = quantize_s3d(model, vs, clips)
    ref = np.asarray(model.apply(vs, clips, train=False)).ravel()
    q = np.asarray(engine(clips)).ravel()
    assert np.isfinite(q).all()
    # 6 ctx blocks stay fp; all 9 mixes + 2 stem seps + 1 basic quantize
    n_mix = sum(1 for op in ca_s3d_spec() if op[0] == "mix")
    assert len(engine.qparams) == 2 * 2 + 1 + n_mix * 8
    assert not any("/ca" in k for k in engine.qparams)
    # 22 random-init layers collapse the batch spread to ~0.04 logits
    # (mean-field), so a relative-spread bound is vacuous here — pin the
    # absolute logit error instead (observed ~0.02 at this depth)
    assert np.abs(q - ref).max() <= 0.05, (q, ref)


def test_srm_bank_stays_fp():
    """concat30 SRM: the frozen bank feeds the first conv (30 input
    channels) but is never itself quantized."""
    spec = (("sep", 16, 7, 2, 3, "relu", True), _P133, _P333, _P222)
    model, vs, clips = _build(spec, srm="concat30", batch=2)
    engine = quantize_s3d(model, vs, clips)
    assert set(engine.qparams) == {"l0/s", "l0/t"}
    assert engine.qparams["l0/s"]["w_q"].shape[-2] == 30
    ref = np.asarray(model.apply(vs, clips, train=False)).ravel()
    fp = np.asarray(engine.folded_fp_forward(vs, clips)).ravel()
    np.testing.assert_allclose(fp, ref, rtol=1e-4, atol=1e-4)
