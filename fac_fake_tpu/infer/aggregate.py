"""Video-level probability aggregation — bit-faithful to the reference.

`cvit_prediction.py:258-281` (SURVEY.md §8.2): sigmoid (not softmax) over the
2 logits per crop; column means f_c (fake, col 0 — ImageFolder alphabetical
order) and r_c (real, col 1); the video score is f_c when fake wins else
|1 − r_c|; videos with fewer than 3 crops score 0.5 (`len(y_pred) > 2` — a
single crop squeezes to shape (2,), so 1- and 2-crop videos both fall
through).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NO_FACE_SCORE = 0.5


def aggregate_probs(logits: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """logits: (capacity, 2) padded crop logits; count: scalar number of real
    rows. Returns the scalar video fake-probability."""
    cap = logits.shape[0]
    mask = (jnp.arange(cap) < count).astype(jnp.float32)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    denom = jnp.maximum(count.astype(jnp.float32), 1.0)
    f_c = jnp.sum(probs[:, 0] * mask) / denom
    r_c = jnp.sum(probs[:, 1] * mask) / denom
    score = jnp.where(f_c > r_c, f_c, jnp.abs(1.0 - r_c))
    return jnp.where(count > 2, score, NO_FACE_SCORE)


def real_or_fake(prob: float) -> str:
    """Decision rule: prob < 0.5 → REAL, ≥ 0.5 → FAKE
    (`CViT-main/README.md:28-30`)."""
    return "REAL" if prob < 0.5 else "FAKE"
