"""Shared test fixtures."""
import numpy as np


def tiny_cvit(pos_mode="legacy", ffn_norm="ln", image_size=224):
    """Small CViT with the real skeleton (stem→patchify→transformer→head)."""
    from fac_fake_tpu.models.cvit import CViT
    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    return CViT(stem_spec=spec, dim=64, depth=1, heads=2, mlp_dim=64,
                pos_mode=pos_mode, ffn_norm=ffn_norm)


def synthetic_batches(n_batches, batch_size, image_size=32, num_classes=2,
                      seed=0, signal=True):
    """Class-separable synthetic uint8 batches: class k has brightness level k."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        labels = rng.integers(0, num_classes, batch_size).astype(np.int32)
        base = (80 + 100 * labels if signal else np.full(batch_size, 128))
        imgs = rng.normal(base[:, None, None, None], 20,
                          (batch_size, image_size, image_size, 3))
        out.append({"image": np.clip(imgs, 0, 255).astype(np.uint8),
                    "label": labels,
                    "mask": np.ones(batch_size, np.float32)})
    return out
