"""KAN / ResKan / ResVitKan parity vs the reference torch implementations."""
import sys
import types

import numpy as np
import pytest

from conftest import requires_reference

RESKAN_DIR = "/root/reference/CViT-main/ResKan"
RESVITKAN_DIR = "/root/reference/CViT-main/ResVitKan"


def _import_from(dirpath, modname):
    sys.path.insert(0, dirpath)
    import importlib
    if modname in sys.modules:
        mod = importlib.reload(sys.modules[modname])
    else:
        mod = importlib.import_module(modname)
    sys.path.remove(dirpath)
    return mod


@requires_reference
def test_kan_linear_matches_reference():
    import torch

    kan_mod = _import_from(RESKAN_DIR, "kan")
    torch.manual_seed(0)
    tlayer = kan_mod.KANLinear(16, 8)
    tlayer.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (10, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tlayer(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from flax import traverse_util
    from fac_fake_tpu.models.blocks.kan import KANLinear

    layer = KANLinear(16, 8)
    variables = layer.init(jax.random.key(0), jnp.zeros((1, 16)))
    flat = traverse_util.flatten_dict(variables)
    sd = {k: v.detach().numpy() for k, v in tlayer.state_dict().items()}
    fill = {
        ("params", "base_weight"): sd["base_weight"],
        ("params", "spline_weight"): sd["spline_weight"],
        ("params", "spline_scaler"): sd["spline_scaler"],
        ("kan_grid", "grid"): sd["grid"],
    }
    for k in flat:
        flat[k] = jnp.asarray(fill[k])
    variables = traverse_util.unflatten_dict(flat)

    out = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@requires_reference
def test_reskan_matches_reference(monkeypatch):
    import torch

    # stub the reference's unused torchvision import (not in this env)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.SimpleNamespace()
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tv.transforms)
    _import_from(RESKAN_DIR, "kan")
    krn = _import_from(RESKAN_DIR, "kan_resnet")
    torch.manual_seed(0)
    tmodel = krn.resnet34(set_device="cpu", num_classes=2)
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_reskan
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="reskan", num_classes=2))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_reskan(sd, variables)

    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


@requires_reference
def test_resvitkan_matches_reference(monkeypatch):
    import torch

    monkeypatch.setitem(sys.modules, "torchsummary",
                        types.SimpleNamespace(summary=lambda *a, **k: None))
    _import_from(RESVITKAN_DIR, "kan")
    rvk = _import_from(RESVITKAN_DIR, "ResVitKan")
    torch.manual_seed(0)
    tmodel = rvk.CViT()
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_resvitkan
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="resvitkan"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_resvitkan(sd, variables)

    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


@requires_reference
def test_resvit_matches_reference(monkeypatch):
    import torch

    monkeypatch.setitem(sys.modules, "torchsummary",
                        types.SimpleNamespace(summary=lambda *a, **k: None))
    rv = _import_from("/root/reference/CViT-main/model/other", "resvit")
    torch.manual_seed(0)
    tmodel = rv.CViT()
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_resvitkan
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="resvit"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_resvitkan(sd, variables, head="mlp")

    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)
