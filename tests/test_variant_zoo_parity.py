"""Golden parity for the full CViT variant zoo vs the reference files.

Each case: import the reference variant (CPU-monkeypatched where the file
hard-codes CUDA), random-init, convert weights into our registry-built model,
compare eval logits. pywt isn't in this image; the WTConv case injects a
stub exposing the standard Haar (db1) filter coefficients — the only thing
`create_wavelet_filter` reads (`cvit_GGCA_ADD_WTConv.py:167-201`) — so the
reference module runs its real torch math and the golden is genuine.
"""
import sys
import types

import numpy as np
import pytest

from conftest import requires_reference

REF_MODEL_DIR = "/root/reference/CViT-main/model"
REF_OTHER_DIR = "/root/reference/CViT-main/model/other"

# (registry name, reference module, dir, single_stem)
CASES = [
    ("cvit_ggca", "cvit_GGCA", REF_OTHER_DIR, True),
    ("cvit_ggca_add", "cvit_GGCA_ADD", REF_MODEL_DIR, True),
    ("cvit_ggca_add_repbn", "cvit_GGCA_ADD_RepBn", REF_MODEL_DIR, True),
    ("cvit_ggca4", "cvit_GGCA4", REF_OTHER_DIR, False),
    ("cvit_ggca_add3", "cvit_GGCA_ADD3", REF_OTHER_DIR, False),
    ("cvit_deconv", "cvit_DEConv", REF_MODEL_DIR, False),
    ("cvit_ggca_add_deconv", "cvit_GGCA_ADD_DEConv", REF_MODEL_DIR, False),
    ("cvit_repbn", "cvit_GGCA_ADD_DEConv_RepBn", REF_MODEL_DIR, False),
    ("cvit_repbn3", "cvit_GGCA_ADD_DEConv_RepBn3", REF_MODEL_DIR, False),
    ("cvit_repbn4", "cvit_GGCA_ADD_DEConv_RepBn4", REF_MODEL_DIR, False),
    ("cvit_repbn5", "cvit_GGCA_ADD_DEConv_RepBn5", REF_MODEL_DIR, False),
    ("cvit_ggca_add_dconv", "cvit_GGCA_ADD_DConv", REF_MODEL_DIR, True),
    ("cvit_ggca_add_scconv", "cvit_GGCA_ADD_ScConv", REF_OTHER_DIR, False),
    ("cvit_ggca_add_odconv", "cvit_GGCA_ADD_ODConv", REF_OTHER_DIR, False),
    ("cvit_ggca_odconv", "cvit_GGCA_ODConv", REF_OTHER_DIR, False),
    ("cvit_ggca_add_moga", "cvit_GGCA_ADD_MOGA", REF_OTHER_DIR, False),
    ("cvit_ggca_smfa", "cvit_GGCA_SMFA", REF_OTHER_DIR, False),
    ("cvit_ggca_uffc", "cvit_GGCA_UFFC", REF_OTHER_DIR, False),
    ("cvit_ggca_sla", "cvit_GGCA_SLA", REF_OTHER_DIR, False),
    ("cvit_ggca_add_glu", "cvit_GGCA_ADD_GLUconv", REF_OTHER_DIR, True),
    ("cvit_ggca4_bfm5", "cvit_GGCA4_BFM5", REF_OTHER_DIR, False),
    ("cvit_ggca4_mdfa5", "cvit_GGCA4_MDFA5", REF_OTHER_DIR, False),
    ("cvit_bfm_ggca_mdfa", "cvit_BFM_GGCA_MDFA", REF_OTHER_DIR, False),
    ("cvit_bfm_mdfa", "cvit_BFM_MDFA", REF_OTHER_DIR, False),
    ("cvit_ggca_bfm_mdfa", "cvit_GGCA_BFM_MDFA", REF_OTHER_DIR, False),
    ("cvit_ggca_mdfa_bfm", "cvit_GGCA_MDFA_BFM", REF_OTHER_DIR, False),
    ("cvit_mdfa_bfm", "cvit_MDFA_BFM", REF_OTHER_DIR, False),
    ("cvit_mdfa_ggca_bfm", "cvit_MDFA_GGCA_BFM", REF_OTHER_DIR, False),
    ("cvit_ggca_add_wtconv", "cvit_GGCA_ADD_WTConv", REF_OTHER_DIR, True),
]

_SQRT1_2 = 0.7071067811865476  # Haar (db1) coefficient, 1/sqrt(2)


def _pywt_stub():
    """Stand-in for pywt exposing only `Wavelet('db1')`'s four filter lists
    (standard public Haar coefficients)."""
    haar = types.SimpleNamespace(
        dec_lo=[_SQRT1_2, _SQRT1_2], dec_hi=[-_SQRT1_2, _SQRT1_2],
        rec_lo=[_SQRT1_2, _SQRT1_2], rec_hi=[_SQRT1_2, -_SQRT1_2])

    def wavelet(name):
        assert name == "db1", f"stub only knows db1, got {name}"
        return haar

    pywt = types.ModuleType("pywt")
    pywt.Wavelet = wavelet
    pywt.data = types.ModuleType("pywt.data")
    return pywt


def _import_ref(modname, dirpath, monkeypatch):
    import torch

    class _CpuFloatTensor:
        def __new__(cls, *shape):
            return torch.zeros(*shape, dtype=torch.float32)

    monkeypatch.setattr(torch.cuda, "FloatTensor", _CpuFloatTensor, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    monkeypatch.setitem(sys.modules, "torchsummary",
                        types.SimpleNamespace(summary=lambda *a, **k: None))
    if "pywt" not in sys.modules:
        stub = _pywt_stub()
        monkeypatch.setitem(sys.modules, "pywt", stub)
        monkeypatch.setitem(sys.modules, "pywt.data", stub.data)
    sys.path.insert(0, dirpath)
    import importlib
    try:
        if modname in sys.modules:
            return importlib.reload(sys.modules[modname])
        return importlib.import_module(modname)
    finally:
        sys.path.remove(dirpath)


@requires_reference
@pytest.mark.parametrize("name,refmod,refdir,single", CASES,
                         ids=[c[0] for c in CASES])
def test_variant_logits_match_reference(name, refmod, refdir, single, monkeypatch):
    import torch

    mod = _import_ref(refmod, refdir, monkeypatch)
    torch.manual_seed(0)
    tmodel = mod.CViT()
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name=name))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cvit(sd, variables,
                             variant="single" if single else "multi")

    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=5e-4)


