"""End-to-end training on the reference's real sample fixture
(`CViT-main/sample_train_data`, the ImageFolder mini-dataset the reference
README points at) through the full Trainer + native JPEG loader path."""
import numpy as np
import pytest

from conftest import requires_reference

SAMPLE_ROOT = "/root/reference/CViT-main/sample_train_data"


@requires_reference
def test_train_on_reference_sample_data():
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.data.folder import build_session
    from fac_fake_tpu.models.cvit import CViT
    from fac_fake_tpu.models.stems import vgg_stem
    from fac_fake_tpu.train.trainer import Trainer

    session = build_session(SAMPLE_ROOT)
    assert session["train"].classes == ["fake", "real"]  # label order §8.3
    assert len(session["train"]) > 20

    # real skeleton at reduced width for CPU runtime
    model = CViT(stem_spec=vgg_stem(), dim=64, depth=1, heads=2, mlp_dim=64,
                 pos_mode="legacy")
    cfg = Config()
    cfg.train.epochs = 1
    cfg.train.log_every = 0
    cfg.train.checkpoint_every = 0
    cfg.data.augment.enabled = True
    trainer = Trainer(model, cfg)

    out = trainer.fit(
        lambda e: session["train"].batches(8, epoch=e, num_workers=2),
        lambda e: session["validation"].batches(8, shuffle=False,
                                                drop_last=False, num_workers=2))
    h = out["history"]
    assert len(h["train_loss"]) == 1 and np.isfinite(h["train_loss"][0])
    assert np.isfinite(h["val_loss"][0])
