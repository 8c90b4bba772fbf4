"""Golden parity: our CViT vs the reference PyTorch implementation.

The reference ships no tests (SURVEY.md §4); these import the reference model
from /root/reference as a fixture generator, convert its random-init weights
into our Flax tree, and require logit agreement. Skipped when the reference
isn't mounted.
"""
import os
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_MODEL_DIR = "/root/reference/CViT-main/model"


def _load_ref_cvit():
    sys.path.insert(0, REF_MODEL_DIR)
    import importlib
    mod = importlib.import_module("cvit")
    sys.path.remove(REF_MODEL_DIR)
    return mod


@requires_reference
def test_cvit_logits_match_reference():
    import torch

    ref = _load_ref_cvit()
    torch.manual_seed(0)
    tmodel = ref.CViT(image_size=224, patch_size=7, num_classes=2, channels=512,
                      dim=1024, depth=6, heads=8, mlp_dim=2048)
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit"))
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), dummy)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cvit(sd, variables, variant="cvit")

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply(variables, x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


@requires_reference
def test_cvit_pos_indices_replicate_chunking():
    """pos_indices row-gather must equal the reference's chunked evaluation:
    chunk k of rows [32k : 32k+c] gets pos rows [0:c] (cvit_prediction.py:224-238)."""
    import torch

    ref = _load_ref_cvit()
    torch.manual_seed(1)
    tmodel = ref.CViT()
    tmodel.eval()

    rng = np.random.default_rng(1)
    n = 40  # spans two reference chunks: 0:32 and 32:40
    x = rng.standard_normal((n, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        ref_out = np.concatenate([
            tmodel(torch.from_numpy(x[0:32])).numpy(),
            tmodel(torch.from_numpy(x[32:40])).numpy(),
        ])

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.compat.torch_weights import convert_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cvit(sd, variables, variant="cvit")

    pos_idx = jnp.asarray(np.arange(n) % 32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply(variables, x_nhwc, train=False, pos_indices=pos_idx)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)
