"""Golden parity for the flagship variant (cvit_GGCA_ADD_DEConv_RepBn8).

The reference file hard-codes `torch.cuda.FloatTensor` / `.cuda()` in its
DEConv weight builders (SURVEY.md §8.9) so it cannot run on CPU as shipped;
the fixture monkeypatches those to CPU equivalents purely to *generate golden
outputs* — our implementation has no such device pinning.
"""
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_MODEL_DIR = "/root/reference/CViT-main/model"


def _load_ref_repbn8(monkeypatch):
    import torch

    class _CpuFloatTensor:
        def __new__(cls, *shape):
            return torch.zeros(*shape, dtype=torch.float32)

    monkeypatch.setattr(torch.cuda, "FloatTensor", _CpuFloatTensor, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    # stub the reference's unused torchsummary import (not in this env)
    import types
    monkeypatch.setitem(sys.modules, "torchsummary",
                        types.SimpleNamespace(summary=lambda *a, **k: None))
    sys.path.insert(0, REF_MODEL_DIR)
    import importlib
    mod = importlib.import_module("cvit_GGCA_ADD_DEConv_RepBn8")
    sys.path.remove(REF_MODEL_DIR)
    return mod


@requires_reference
def test_repbn8_logits_match_reference(monkeypatch):
    import torch

    ref = _load_ref_repbn8(monkeypatch)
    torch.manual_seed(0)
    tmodel = ref.CViT()
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit_repbn8"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cvit(sd, variables, variant="cvit_repbn8")

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply(variables, x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=3e-4, atol=3e-4)
