"""THE end-to-end parity test (BASELINE.md north star, achievable form):

crops gathered from a real sample video by OUR pipeline are scored through
(a) the reference torch CViT with the reference's own inference recipe —
    per-image normalize (`cvit_prediction.py:209-215`), the ≤32 chunk loop
    via `non_empty` (0:32 / 32:64 / 64:90, `:224-238`), `pred_sig`
    (`:258-259`) and `pre_process_prediction` (`:266-281`) — and
(b) our production `VideoScorer.score_crops` (padded single forward, BN
    folded) with the reference weights converted into our tree,
and the per-video probabilities must agree to ≤1e-4.

The detector differs by design (BlazeFace here vs dlib there — dlib is not
installable in this environment), which is why the comparison starts from
the identical crop stack: everything downstream of detection is the parity
surface.

Note the channel-order chain: the reference's predict loop reads BGR frames
(`cv2.read`) and `face_face_rec` swaps R/B (`cvit_prediction.py:114-115`),
so its model input is RGB at predict time — matching our RGB pipeline, no
flip needed.
"""
import sys

import numpy as np
import pytest

from conftest import requires_reference

SAMPLE = "/root/reference/CViT-main/sample__prediction_data/aajsqyyjni.mp4"
REF_MODEL_DIR = "/root/reference/CViT-main/model"


def _reference_recipe_prob(tmodel, crops_u8):
    """The reference's predict() tail, verbatim semantics
    (`cvit_prediction.py:209-281`)."""
    import torch

    # torchvision isn't installed here; transforms.Normalize(mean, std) is
    # exactly (x - mean[:,None,None]) / std[:,None,None] per channel
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    t = torch.tensor(crops_u8).float().permute((0, 3, 1, 2))
    for i in range(len(t)):
        t[i] = (t[i] / 255.0 - mean) / std
    t = t.contiguous()
    df_len = len(t)

    with torch.no_grad():
        thrtw = 32 if df_len >= 33 else df_len
        y = tmodel(t[0:thrtw])
        for lo, hi in ((32, 64), (64, 90)):
            if df_len > lo:
                dft = t[lo:min(df_len, hi)]
                if len(dft):
                    y = torch.cat((y, tmodel(dft)), 0)
        probs = torch.sigmoid(y.squeeze())
        if len(probs) > 2:
            f_c = probs[:, 0].mean()
            r_c = probs[:, 1].mean()
            return float(f_c if f_c > r_c else abs(1 - r_c))
        return 0.5


@requires_reference
def test_e2e_video_prob_matches_reference_torch_pipeline():
    torch = pytest.importorskip("torch")

    # 1. our pipeline gathers the crop stack from the sample video
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config, ModelConfig
    from fac_fake_tpu.infer.predictor import VideoScorer
    from fac_fake_tpu.models import build_model

    cfg = Config()
    cfg.infer.batch_crops = 32
    model = build_model(ModelConfig(name="cvit"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    scorer_probe = VideoScorer(model, variables, cfg, fold_bn=False)
    crops = scorer_probe.gather_crops(SAMPLE)
    assert crops.shape[0] >= 3, "sample video must yield ≥3 face crops"

    # 2. reference torch CViT (random init — no reference checkpoints ship)
    sys.path.insert(0, REF_MODEL_DIR)
    import importlib
    ref = importlib.import_module("cvit")
    sys.path.remove(REF_MODEL_DIR)
    torch.manual_seed(0)
    tmodel = ref.CViT(image_size=224, patch_size=7, num_classes=2,
                      channels=512, dim=1024, depth=6, heads=8, mlp_dim=2048)
    tmodel.eval()
    ref_prob = _reference_recipe_prob(tmodel, crops)

    # 3. same weights through OUR production scorer (BN fold on)
    from fac_fake_tpu.compat.torch_weights import convert_cvit
    variables = convert_cvit(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        jax.device_get(variables), "cvit")
    scorer = VideoScorer(model, variables, cfg)  # fold_bn=True (production)
    ours = scorer.score_crops(crops)

    assert ours == pytest.approx(ref_prob, abs=1e-4)
