"""Post-training int8 quantization of folded CViT stems (inference only).

The reference has no quantized serving path; this is a TPU-native extension:
the v5e MXU runs int8×int8→int32 at 2× its bf16 rate, and the early stem
convs — the ones padding-bound on the 128-wide systolic array at ≤64
channels (see README "Performance") — are exactly where doubling the MXU
rate pays. Scheme:

  * weights: symmetric per-output-channel int8 (`w_q = round(w / s_w)`,
    `s_w[o] = max|w[..,o]| / 127`) — standard PTQ, no bias quantization;
  * activations: symmetric per-tensor int8, scale calibrated offline by
    running the folded fp stem on a calibration batch and recording the
    per-conv-input absolute maximum (the classic max calibration);
  * compute: `lax.conv_general_dilated(int8, int8, preferred=int32)`,
    dequant `· s_x s_w[o] + b` fused into the conv epilogue by XLA.

Only the plain conv/relu/pool *prefix* of a folded stem quantizes — the
first exotic op (scconv/wtconv/…, none in the base stem) stops the rewrite,
because the calibration walk only models the simple ops. With
`transformer=True` the big Dense matmuls quantize too (patch embedding,
attention qkv/out, FFN fc1/fc2, head fc1 — `models/layers.py QuantDense`).
Use after `fold_cvit` (BN must already be folded into the convs):

    model, variables = fold_cvit(model, variables)
    qmodel, qvariables = quantize_cvit(model, variables, calib_batch)

The whole value-producing rewrite (capture forward + calibration walk +
int8 casts) runs as ONE jitted function: eagerly it was ~70-90 s of per-op
dispatch/compile round trips through the axon relay (this is serving-startup
latency — `VideoScorer` auto-calibrates on its first batch); jitted it is
one cached compile + one execution, and the ~350 MB kernel tree never
leaves the device.

Accuracy note: no trained reference checkpoints ship in this environment,
so fidelity is pinned numerically (logit agreement vs the folded fp model
on held-out inputs, `tests/test_quantize.py`) rather than as an AUC delta.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

_SIMPLE = {"conv", "relu", "pool"}


def _conv_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, jnp.float32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, jnp.float32)


def _plan_stem(spec: Tuple) -> Tuple[Tuple, List[int]]:
    """(new_spec, indices of quantized convs) — pure Python, value-free."""
    new_spec = []
    q_idx: List[int] = []
    prefix = True
    for i, op in enumerate(spec):
        kind = op[0]
        if prefix and kind not in _SIMPLE:
            prefix = False
        if prefix and kind == "conv":
            new_spec.append(("qconv", op[1]))
            q_idx.append(i)
        else:
            new_spec.append(op)
    return tuple(new_spec), q_idx


def _rewrite_stem(spec: Tuple, params: dict, calib_x, q_idx: List[int],
                  percentile: float = 100.0) -> dict:
    """jnp-pure stem rewrite (jit-safe): int8 kernels + calibrated scales
    for the planned convs, advancing the calibration activations with the
    FP weights (the quantized path tracks them to within quant noise)."""
    new_params = dict(params)
    x = jnp.asarray(calib_x, jnp.float32)
    for i, op in enumerate(spec):
        kind = op[0]
        name = f"l{i}"
        if i in q_idx:
            p = params[name]
            w = jnp.asarray(p["kernel"], jnp.float32)
            b = jnp.asarray(p["bias"], jnp.float32)
            amax = jnp.max(jnp.abs(x))
            if percentile < 100.0:
                amax = jnp.percentile(jnp.abs(x).reshape(-1), percentile)
            s_x = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
            s_w = jnp.maximum(
                jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
            w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
            new_params[name] = {"kernel_q": w_q, "w_scale": s_w,
                                "x_scale": s_x, "bias": b}
            x = _conv_ref(x, w, b)
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "pool":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        else:
            break  # first non-simple op ends the modeled prefix
    return new_params


def quantize_stem(spec: Tuple, params: dict, calib_x,
                  percentile: float = 100.0):
    """Quantize the conv/relu/pool prefix of a folded stem.

    Returns (new_spec, new_params, n_quantized). `calib_x` is the stem's
    input batch in model space (normalized, NHWC). Convs past the first
    non-simple op keep fp weights (their input stats aren't modeled here).
    """
    new_spec, q_idx = _plan_stem(spec)
    if not q_idx:
        return tuple(spec), dict(params), 0
    new_params = _rewrite_stem(spec, params, calib_x, q_idx, percentile)
    return new_spec, new_params, len(q_idx)


def _quantize_dense(p: dict, x_in) -> dict:
    """nn.Dense params → QuantDense params (`models/layers.py QuantDense`):
    per-output-channel int8 weights, per-tensor activation scale from the
    calibration input's abs-max."""
    w = jnp.asarray(p["kernel"], jnp.float32)          # (in, out)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
    s_x = jnp.maximum(jnp.max(jnp.abs(x_in)).astype(jnp.float32),
                      1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"kernel_q": w_q, "w_scale": s_w, "x_scale": s_x}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def quantize_cvit(model, variables, calib_x, transformer: bool = False):
    """fold_cvit-shaped transform: returns (qmodel, qvariables).

    `calib_x` is a normalized input batch (what the model's `__call__`
    receives). Quantizes every stem (`stem`/`stem2`/`stem3`): calibration
    inputs for the later stems come from ONE fp forward capturing the
    `stemN_input` sows (`models/cvit.py` — the activations each stem
    actually sees, including any slot block between stems). Sequential fp
    calibration is the standard PTQ recipe: each stem's scales are set from
    fp activations, and the quantized prefixes track them to within quant
    noise.

    With `transformer=True` the big Dense matmuls quantize too — the
    25088→dim patch embedding, every attention qkv/out, every FFN fc1/fc2,
    and the MLP head's fc1 — which is where the model's FLOPs actually live
    (the reference forward, `model/cvit.py:167-179`). LayerNorm, softmax and
    the 2-logit output head stay floating point. Activation scales come from
    the same capture forward's per-layer input sows.
    """
    params0 = variables["params"]
    if getattr(model, "stem_spec", None) is None or "stem" not in params0:
        raise ValueError("model has no foldable stem to quantize")
    stems = [(n, f) for n, f in (("stem", "stem_spec"),
                                 ("stem2", "stem2_spec"),
                                 ("stem3", "stem3_spec"))
             if getattr(model, f, None) is not None and n in params0]
    for n, f in stems:
        if any(op[0] == "bn" for op in getattr(model, f)):
            raise ValueError("quantize_cvit expects a folded stem "
                             "(run fold_cvit first)")

    # --- value-free planning: specs, counts, model-field updates ---------
    plans = {n: _plan_stem(getattr(model, f)) for n, f in stems}
    updates = {f: plans[n][0] for n, f in stems if plans[n][1]}
    n_total = sum(len(plans[n][1]) for n, _ in stems)
    tr_layers = []
    if transformer:
        for lname, lp in params0["transformer"].items():
            if lname.startswith("attn") and "to_qkv" in lp:
                tr_layers.append((lname, ("to_qkv", "qkv_in"),
                                  ("to_out", "out_in")))
            elif lname.startswith("ffn") and "fc1" in lp:
                tr_layers.append((lname, ("fc1", "fc1_in"), ("fc2", "fc2_in")))
        updates["quant_dense"] = True
        n_total += 2 * len(tr_layers) + 2
    if n_total == 0:
        return model, variables

    need_capture = len(stems) > 1 or transformer
    kw = {}
    if need_capture and getattr(model, "pos_mode", None) == "legacy":
        # legacy (32,1,dim) pos-embedding caps batch at 32; the capture
        # forward only needs activations, so any row assignment works
        kw["pos_indices"] = jnp.arange(jnp.asarray(calib_x).shape[0]) % 32

    # --- the value-producing rewrite, as ONE jitted function -------------
    def _rewrite(vs, cx):
        params = dict(vs["params"])
        sows = {}
        if need_capture:
            _, inter = model.apply(vs, cx, train=False,
                                   mutable=["intermediates"], **kw)
            sows = inter["intermediates"]
        inputs = {"stem": cx}
        for n, _f in stems[1:]:
            if f"{n}_input" in sows:
                inputs[n] = sows[f"{n}_input"][0]
        # the spec updates above were built for every planned stem, so every
        # planned stem MUST have its calibration input here — a missing sow
        # would return a model whose spec references kernel_q params that
        # were never created (trace-time check: sows presence is static)
        missing = [n for n, _f in stems if plans[n][1] and n not in inputs]
        assert not missing, f"no calibration sow for stem(s) {missing}"
        for n, f in stems:
            if plans[n][1] and n in inputs:
                params[n] = _rewrite_stem(getattr(model, f), params[n],
                                          inputs[n], plans[n][1])
        if transformer:
            params["patch_to_embedding"] = _quantize_dense(
                params["patch_to_embedding"], sows["pe_input"][0])
            tr = {k: dict(v) for k, v in params["transformer"].items()}
            tsows = sows["transformer"]
            for lname, (k1, s1), (k2, s2) in tr_layers:
                tr[lname][k1] = _quantize_dense(tr[lname][k1],
                                                tsows[lname][s1][0])
                tr[lname][k2] = _quantize_dense(tr[lname][k2],
                                                tsows[lname][s2][0])
            params["transformer"] = tr
            head = dict(params["mlp_head"])
            head["fc1"] = _quantize_dense(head["fc1"],
                                          sows["mlp_head"]["fc1_in"][0])
            params["mlp_head"] = head
        return params

    params = jax.jit(_rewrite)(variables, jnp.asarray(calib_x))
    qmodel = dataclasses.replace(model, **updates)
    qvars = dict(variables)
    qvars["params"] = params
    return qmodel, qvars
