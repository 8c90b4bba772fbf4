"""S3D family parity vs the reference torch implementations."""
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_S3D = "/root/reference/sx_exp_deepfakedetect-master/S3D"


def _import_ref(modname):
    sys.path.insert(0, REF_S3D)
    import importlib
    mod = importlib.import_module(modname)
    sys.path.remove(REF_S3D)
    return mod


def _to_ndhwc(x_ncthw):
    return np.transpose(x_ncthw, (0, 2, 3, 4, 1))


@requires_reference
def test_srm_filter_banks_match():
    import torch
    hpf_mod = _import_ref("SRM.HPF")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 32, 32)).astype(np.float32)

    import jax.numpy as jnp
    from fac_fake_tpu.models.s3d.layers import srm_filter

    for cls, full in ((hpf_mod.HPF, True), (hpf_mod.HPF_3, False)):
        with torch.no_grad():
            ref = cls()(torch.from_numpy(x)).numpy()          # (B, K, T, H, W)
        ours = np.asarray(srm_filter(jnp.asarray(_to_ndhwc(x)), full=full))
        np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 4, 1)),
                                   rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("name,refmod,refcls", [
    ("s3d", "model", "S3D"),
    ("ca_s3d", "CA_S3D", "CA_S3D_v3"),
])
def test_s3d_logits_match_reference(name, refmod, refcls):
    import torch

    mod = _import_ref(refmod)
    torch.manual_seed(0)
    tmodel = getattr(mod, refcls)(1, "no")
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 20, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_s3d
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name=name, srm_net=False, num_class=1))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 20, 64, 64, 3)), train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_s3d(sd, variables, model.spec)

    out = model.apply(variables, jnp.asarray(_to_ndhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=3e-4, atol=3e-4)


@requires_reference
def test_msca_s3d_logits_match_reference():
    import torch

    mod = _import_ref("msca_S3Dv1")
    torch.manual_seed(0)
    tmodel = mod.msca_S3D(1, "no")
    tmodel.eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 20, 48, 48)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_s3d
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="msca_s3d", srm_net=False, num_class=1))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 20, 48, 48, 3)),
                           train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_s3d(sd, variables, model.spec)

    out = model.apply(variables, jnp.asarray(_to_ndhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4, atol=5e-4)


def test_all_s3d_variants_build_and_run():
    """Shape smoke for every registered S3D variant incl. SRM paths."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    x = jnp.zeros((1, 20, 32, 32, 3), jnp.float32)
    # each variant once; SRM paths once per kind (concat30 / residual3)
    cases = [("s3d", True), ("ca_s3d", False), ("msca_s3d", False),
             ("msca_s3d_srm", True), ("msca_s3d_v2", False),
             ("msca_s3d_srm_v2", False)]
    for name, srm in cases:
        model = build_model(ModelConfig(name=name, srm_net=srm, num_class=1))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 1), (name, srm, out.shape)
