"""Benchmark: CViT face-crop inference throughput per chip.

Metric (BASELINE.json): face-crops/sec/chip, target ≥ 2000 on TPU v5e-1.
Measures the production scoring path — uint8 crops → on-device /255 +
ImageNet normalize → batched CViT forward (bf16 compute) with the legacy
pos-embedding gather — with crops device-resident and timing forced by
fetching a scalar (through the axon relay, `block_until_ready` returns at
enqueue and uploads run ~20 MB/s, so per-step host transfers must stay off
the timed path; see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TARGET = 2000.0  # crops/sec/chip (BASELINE.md north star)
BATCH = 2048


def main():
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.infer.predictor import IMAGENET_MEAN, IMAGENET_STD
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit", dtype="bfloat16"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    # production inference reparameterization: fold BN into conv weights
    from fac_fake_tpu.compat.fold import fold_cvit
    model, variables = fold_cvit(model, variables)
    variables = jax.device_put(variables)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    pos_idx = jnp.arange(BATCH) % 32

    @jax.jit
    def step(v, crops_u8):
        x = (crops_u8.astype(jnp.float32) / 255.0 - mean) / std
        logits = model.apply(v, x, train=False, pos_indices=pos_idx)
        return jnp.sum(logits)  # scalar: forces execution, ~4 B download

    rng = np.random.default_rng(0)
    crops = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (BATCH, 224, 224, 3), dtype=np.uint8)))

    # warmup / compile
    float(step(variables, crops))

    # pick iteration count for ~3s of measurement
    t0 = time.perf_counter()
    float(step(variables, crops))
    per_call = time.perf_counter() - t0
    iters = max(3, min(50, int(3.0 / max(per_call, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(variables, crops)
    float(s)  # one sync at the end; calls pipeline on-device
    dt = time.perf_counter() - t0
    # conservatively re-time with per-call sync to avoid relay enqueue lies
    t1 = time.perf_counter()
    for _ in range(iters):
        float(step(variables, crops))
    dt_sync = time.perf_counter() - t1

    crops_per_sec = BATCH * iters / dt_sync
    print(json.dumps({
        "metric": "face-crops/sec/chip (CViT inference)",
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / BASELINE_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
