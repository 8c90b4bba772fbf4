"""GradCAM for CViT-family models.

Re-designs `CViT-main/figure/utils.py` (forward/backward hook capture +
CAM aggregation) + `figure/gradcam_cnn.py` functionally: instead of hooks,
the model exposes a `features_override` input, so the CAM is one
`jax.grad` through the head with respect to the post-stem feature map —
no mutation, jittable.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gradcam(model, variables, images: jnp.ndarray,
            target_class: Optional[int] = None) -> np.ndarray:
    """Returns per-image CAMs (B, h, w) in [0, 1] over the post-stem feature
    grid (`gradcam_cnn.py:25` hooks the late stem; here: the full post-stem,
    post-attention feature map)."""
    _, inter = model.apply(variables, images, train=False,
                           mutable=["intermediates"])
    feats = inter["intermediates"]["stem_features"][0]

    def score(f):
        logits = model.apply(variables, images, train=False,
                             features_override=f)
        cls = jnp.argmax(logits, axis=-1) if target_class is None \
            else jnp.full((logits.shape[0],), target_class)
        return jnp.sum(jnp.take_along_axis(logits, cls[:, None], axis=1))

    grads = jax.grad(score)(feats)
    # CAM: ReLU(Σ_c w_c · A_c), w = spatial-mean gradient (`figure/utils.py`)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jnp.maximum(jnp.sum(weights * feats, axis=-1), 0.0)
    mx = jnp.max(cam, axis=(1, 2), keepdims=True)
    mn = jnp.min(cam, axis=(1, 2), keepdims=True)
    return np.asarray((cam - mn) / jnp.maximum(mx - mn, 1e-8))


def gradcam_tokens(model, variables, images: jnp.ndarray,
                   target_class: Optional[int] = None) -> np.ndarray:
    """Transformer-mode CAM (`figure/gradcam_transformer.py` equivalent):
    gradients w.r.t. the patch-embedding tokens, reshaped onto the √n × √n
    patch grid (the cls token is excluded by construction — the hook sits on
    the patch tokens before cls concat, mirroring the reference's
    cls-stripping reshape)."""
    _, inter = model.apply(variables, images, train=False,
                           mutable=["intermediates"])
    toks = inter["intermediates"]["patch_tokens"][0]  # (B, n, dim)
    b, n, d = toks.shape
    g = int(round(n ** 0.5))

    def score(t):
        logits = model.apply(variables, images, train=False, embed_override=t)
        cls = jnp.argmax(logits, axis=-1) if target_class is None \
            else jnp.full((logits.shape[0],), target_class)
        return jnp.sum(jnp.take_along_axis(logits, cls[:, None], axis=1))

    grads = jax.grad(score)(toks)
    weights = jnp.mean(grads, axis=1, keepdims=True)  # per-channel over tokens
    cam = jnp.maximum(jnp.sum(weights * toks, axis=-1), 0.0).reshape(b, g, g)
    mx = jnp.max(cam, axis=(1, 2), keepdims=True)
    mn = jnp.min(cam, axis=(1, 2), keepdims=True)
    return np.asarray((cam - mn) / jnp.maximum(mx - mn, 1e-8))


def show_cam_on_image(img01: np.ndarray, cam: np.ndarray,
                      alpha: float = 0.5) -> np.ndarray:
    """Heatmap overlay (`figure/utils.py:183-208`): resize CAM to the image,
    JET colormap, blend. img01: (H, W, 3) float [0,1]."""
    import cv2
    h, w = img01.shape[:2]
    cam_up = cv2.resize(cam.astype(np.float32), (w, h))
    heat = cv2.applyColorMap(np.uint8(255 * cam_up), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    out = alpha * heat + (1 - alpha) * img01
    return np.uint8(255 * out / out.max())


def center_crop_img(img: np.ndarray, size: int) -> np.ndarray:
    """`figure/utils.py:211-235`."""
    import cv2
    h, w = img.shape[:2]
    if w < h:
        nw, nh = size, int(size * h / w)
    else:
        nh, nw = size, int(size * w / h)
    img = cv2.resize(img, (nw, nh))
    y0, x0 = (nh - size) // 2, (nw - size) // 2
    return img[y0:y0 + size, x0:x0 + size]
