"""S3D performance accounting: XLA-counted FLOPs + measured step times → MFU.

VERDICT r4 #1a: CViT has an op-profile, per-stage MFU and an underfill bound
(README "Why train MFU…"); this gives the S3D family the same treatment.
One process, run AFTER `FAC_BENCH_STAGES=s3d bench.py` so the relay grant is
warm and throughputs exist to cross-check:

    python tools/s3d_mfu.py            # → one JSON dict on stdout

Prints, for the ca_s3d workloads (20×224² clips, bf16):
  * eval forward FLOPs (XLA cost analysis) and GFLOP/clip;
  * train step FLOPs (loss+grad, the trainer's arithmetic) at b8;
  * measured ms/step (chained-carry timing, device-resident input);
  * MFU vs the v5e 197 TFLOP/s bf16 peak;
  * the int8 engine's step time at the serving batch (b32 — where int8
    wins; at b8 the step is per-op-overhead-bound and int8 loses, README
    "S3D performance") and its MFU vs the 394 TOP/s int8 peak.

The reference scoring loop this accounts for: `S3D/S3D-test.py:260-286`;
training: `S3D-train.py:318-443`.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12   # v5e per-chip
PEAK_INT8 = 394e12

BATCH, FRAMES, SIZE = 8, 20, 224
EVAL_BATCH = 32      # serving batch: amortizes the 180-conv per-op overhead


def _time_step(step, *args, iters=12):
    carry = jnp.float32(0.0)
    carry = step(*args, carry)
    float(carry)                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.models import build_model, init_variables
    from fac_fake_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = "ca_s3d"
    cfg.model.dtype = "bfloat16"
    cfg.data.image_size = SIZE
    cfg.data.normalize = "raw255"
    cfg.train.loss = "bce_weighted"
    cfg.train.log_every = 0

    model = build_model(cfg.model)
    variables = init_variables(model, (1, FRAMES, SIZE, SIZE, 3))
    gen = np.random.default_rng(0)
    clips_u8 = jax.device_put(gen.integers(
        0, 255, (BATCH, FRAMES, SIZE, SIZE, 3), dtype=np.uint8))
    out = {}

    # --- eval forward (b8: the overhead-bound case; b32: serving) ----------
    def fwd(v, clips, carry):
        logits = model.apply(v, clips.astype(jnp.float32), train=False)
        return jnp.sum(logits) + carry * jnp.float32(1e-30)

    # one lowering per graph: the compiled executable supplies BOTH the FLOP
    # count and the timed step (a fresh jax.jit wrapper would re-trace and
    # re-compile the same HLO — ~90 s for CA_S3D via the remote compiler)
    compiled = jax.jit(fwd).lower(
        variables, clips_u8, jnp.float32(0.0)).compile()
    fl_eval = float(compiled.cost_analysis()["flops"])
    ms_eval = 1e3 * _time_step(compiled, variables, clips_u8)
    out["eval_gflop_per_clip"] = round(fl_eval / BATCH / 1e9, 2)
    out["eval_ms_per_step_b8"] = round(ms_eval, 2)
    out["eval_clips_per_sec_b8"] = round(BATCH / (ms_eval / 1e3), 1)
    out["eval_mfu_bf16_b8"] = round(fl_eval / (ms_eval / 1e3) / PEAK_BF16, 3)

    clips32 = jax.device_put(gen.integers(
        0, 255, (EVAL_BATCH, FRAMES, SIZE, SIZE, 3), dtype=np.uint8))
    compiled32 = jax.jit(fwd).lower(
        variables, clips32, jnp.float32(0.0)).compile()
    ms_eval32 = 1e3 * _time_step(compiled32, variables, clips32)
    fl_clip = fl_eval / BATCH
    out["eval_clips_per_sec_b32"] = round(EVAL_BATCH / (ms_eval32 / 1e3), 1)
    out["eval_mfu_bf16_b32"] = round(
        fl_clip * EVAL_BATCH / (ms_eval32 / 1e3) / PEAK_BF16, 3)

    # --- train step (loss + grads, the trainer's arithmetic) ---------------
    trainer = Trainer(model, cfg, loss_kwargs={"pos_weight": 1.0},
                      input_shape=(1, FRAMES, SIZE, SIZE, 3))
    state = trainer.init_state()
    labels = jnp.asarray(gen.integers(0, 2, (BATCH,)).astype(np.int32))

    def train_step(params, bs, clips, labels, carry):
        def loss_of(p):
            vs = {"params": p, "batch_stats": bs}
            logits, mut = model.apply(
                vs, clips.astype(jnp.float32), train=True,
                mutable=["batch_stats"])
            z = logits[:, 0]
            w = 1.0 + labels.astype(jnp.float32) * 0.0
            loss = jnp.mean(w * (jnp.maximum(z, 0) - z * labels
                                 + jnp.log1p(jnp.exp(-jnp.abs(z)))))
            return loss, mut
        (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum * jnp.float32(1e-30) + carry * jnp.float32(1e-30)

    ctrain = jax.jit(train_step).lower(
        state.params, state.batch_stats, clips_u8, labels,
        jnp.float32(0.0)).compile()
    fl_train = float(ctrain.cost_analysis()["flops"])
    ms_train = 1e3 * _time_step(ctrain, state.params,
                                state.batch_stats, clips_u8, labels)
    out["train_gflop_per_clip"] = round(fl_train / BATCH / 1e9, 2)
    out["train_ms_per_step_b8"] = round(ms_train, 2)
    out["train_clips_per_sec"] = round(BATCH / (ms_train / 1e3), 1)
    out["train_mfu_bf16"] = round(fl_train / (ms_train / 1e3) / PEAK_BF16, 3)

    # --- int8 engine --------------------------------------------------------
    from fac_fake_tpu.compat.quantize_s3d import quantize_s3d
    calib = jnp.asarray(gen.integers(
        0, 255, (2, FRAMES, SIZE, SIZE, 3), dtype=np.uint8), jnp.float32)
    engine = quantize_s3d(model, variables, calib)

    def qfwd(vs, qp, clips, carry):
        return jnp.sum(engine._int8_forward(vs, qp, clips)) \
            + carry * jnp.float32(1e-30)

    ms_int8 = 1e3 * _time_step(jax.jit(qfwd), variables, engine.qparams,
                               clips32)
    out["int8_ms_per_step_b32"] = round(ms_int8, 2)
    out["int8_clips_per_sec_b32"] = round(EVAL_BATCH / (ms_int8 / 1e3), 1)
    # same conv arithmetic, int8 rate: utilization vs the 394 TOP/s peak
    out["int8_mfu_vs_int8_peak"] = round(
        fl_clip * EVAL_BATCH / (ms_int8 / 1e3) / PEAK_INT8, 3)
    out["int8_speedup_vs_bf16_b32"] = round(ms_eval32 / ms_int8, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
