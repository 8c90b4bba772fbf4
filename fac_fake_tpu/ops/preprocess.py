"""Input preprocessing for the scoring path.

uint8 crops → float → /255 → ImageNet mean/std (`cvit_prediction.py:209-215`).
Crops upload as uint8 (4× fewer bytes through the host link) and the
conversion lives INSIDE the jitted forward, where XLA fuses it into the stem
conv's input read — nothing is materialized in between.

A hand-written Pallas version of this op existed through round 2 and was
deleted on measurement: it benchmarked ~9% SLOWER than the fused XLA path
(8,755 vs 9,586 crops/s, BENCH_r02.json), because a standalone kernel must
write the normalized fp32 tensor back to HBM while XLA's fusion feeds the
conv directly — a separate pass can't beat an eliminated intermediate.
Pallas is for ops XLA schedules badly, not for ones it already fuses away
(PARITY.md "Pallas normalize" row).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(crops_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 → normalized float32 (fused by XLA into the
    consumer — keep calls to this inside jit)."""
    x = crops_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
