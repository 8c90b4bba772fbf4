"""Golden parity for the msca_S3D SRM/v2 variants (covers the MSCAN_half and
residual-SRM converter paths not exercised by the base msca test)."""
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_S3D = "/root/reference/sx_exp_deepfakedetect-master/S3D"


def _import_ref(modname):
    sys.path.insert(0, REF_S3D)
    import importlib
    try:
        if modname in sys.modules:
            return importlib.reload(sys.modules[modname])
        return importlib.import_module(modname)
    finally:
        sys.path.remove(REF_S3D)


@requires_reference
@pytest.mark.parametrize("refmod,refcls,name,srm", [
    ("msca_S3Dv1", "msca_S3D_SRM", "msca_s3d_srm", True),
    ("msca_S3Dv2", "msca_S3Dv2", "msca_s3d_v2", False),
    # v2 with SRM='yes': 30-channel HPF front end (`msca_S3Dv2.py:78-85`)
    ("msca_S3Dv2", "msca_S3Dv2", "msca_s3d_v2", True),
    # v2 residual-SRM: v1 structure minus the stem MSCAN_half
    # (`msca_S3Dv2.py:17-73`, diff-verified)
    ("msca_S3Dv2", "msca_S3D_SRM", "msca_s3d_srm_v2", True),
])
def test_msca_srm_variants_match_reference(refmod, refcls, name, srm):
    import torch

    mod = _import_ref(refmod)
    torch.manual_seed(0)
    tmodel = getattr(mod, refcls)(1, "yes" if srm else "no")
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 20, 48, 48)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_s3d
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name=name, srm_net=srm, num_class=1))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 20, 48, 48, 3)),
                           train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_s3d(sd, variables, model.spec)

    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                      train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-3)
