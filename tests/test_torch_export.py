"""Reverse conversion: OUR random-init weights loaded into the REFERENCE
torch model must reproduce our logits (the exact inverse of the forward
golden tests)."""
import os
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_MODEL_DIR = "/root/reference/CViT-main/model"


@requires_reference
def test_export_cvit_roundtrip_into_reference_model():
    import torch

    sys.path.insert(0, REF_MODEL_DIR)
    import importlib
    ref = importlib.import_module("cvit")
    sys.path.remove(REF_MODEL_DIR)

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_export import export_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit"))
    variables = model.init(jax.random.key(7), jnp.zeros((1, 224, 224, 3)))

    sd = export_cvit(variables, variant="cvit")
    tmodel = ref.CViT(image_size=224, patch_size=7, num_classes=2,
                      channels=512, dim=1024, depth=6, heads=8, mlp_dim=2048)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    # only BN bookkeeping counters may be absent; nothing extra allowed
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    tmodel.eval()

    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()
    ours = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-4, atol=2e-4)
