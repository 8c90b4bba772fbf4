"""Training losses.

  * `cross_entropy` — CViT/ResKan/ResVitKan training criterion
    (`cvit_train.py:77` nn.CrossEntropyLoss), masked for padded eval rows.
  * `bce_weighted` — S3D criterion with class rebalancing
    `BCEWithLogitsLoss(pos_weight=#real/#fake)` (`S3D-train.py:264-273`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask=None) -> jnp.ndarray:
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    if mask is None:
        return losses.mean()
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bce_weighted(logits: jnp.ndarray, labels: jnp.ndarray,
                 pos_weight: float = 1.0, mask=None) -> jnp.ndarray:
    """Single-logit binary CE with torch pos_weight semantics:
    loss = -[pw·y·log σ(x) + (1−y)·log(1−σ(x))]."""
    x = logits.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(x)
    log_np = jax.nn.log_sigmoid(-x)
    losses = -(pos_weight * y * log_p + (1.0 - y) * log_np)
    if mask is None:
        return losses.mean()
    m = mask.reshape(-1)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_loss(name: str, **kw):
    if name == "cross_entropy":
        return lambda logits, labels, mask=None: cross_entropy(logits, labels, mask)
    if name == "bce_weighted":
        pw = kw.get("pos_weight", 1.0)
        return lambda logits, labels, mask=None: bce_weighted(logits, labels, pw, mask)
    raise KeyError(f"unknown loss {name}")
