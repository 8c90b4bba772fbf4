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
because the calibration walk only models the simple ops. Use after
`fold_cvit` (BN must already be folded into the convs):

    model, variables = fold_cvit(model, variables)
    qmodel, qvariables = quantize_cvit(model, variables, calib_batch)

Accuracy note: no trained reference checkpoints ship in this environment,
so fidelity is pinned numerically (logit agreement vs the folded fp model
on held-out inputs, `tests/test_quantize.py`) rather than as an AUC delta.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SIMPLE = {"conv", "relu", "pool"}


def _conv_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, jnp.float32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, jnp.float32)


def quantize_stem(spec: Tuple, params: dict, calib_x: jnp.ndarray,
                  percentile: float = 100.0):
    """Quantize the conv/relu/pool prefix of a folded stem.

    Returns (new_spec, new_params, n_quantized). `calib_x` is the stem's
    input batch in model space (normalized, NHWC). Convs past the first
    non-simple op keep fp weights (their input stats aren't modeled here).
    """
    new_spec = []
    new_params = dict(params)
    x = jnp.asarray(calib_x, jnp.float32)
    n_q = 0
    prefix = True
    for i, op in enumerate(spec):
        kind = op[0]
        name = f"l{i}"
        if prefix and kind not in _SIMPLE:
            prefix = False
        if not prefix or kind != "conv":
            new_spec.append(op)
            if prefix and kind == "relu":
                x = jax.nn.relu(x)
            elif prefix and kind == "pool":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            continue
        p = {k: np.asarray(v) for k, v in params[name].items()}
        w, b = p["kernel"], p["bias"]
        amax = np.asarray(jnp.max(jnp.abs(x)))
        if percentile < 100.0:
            amax = np.asarray(jnp.percentile(jnp.abs(x).reshape(-1),
                                             percentile))
        s_x = np.float32(max(float(amax), 1e-8) / 127.0)
        s_w = (np.max(np.abs(w), axis=(0, 1, 2)) / 127.0).astype(np.float32)
        s_w = np.maximum(s_w, 1e-12)
        w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        new_params[name] = {
            "kernel_q": jnp.asarray(w_q),
            "w_scale": jnp.asarray(s_w),
            "x_scale": jnp.asarray(s_x),
            "bias": jnp.asarray(b, jnp.float32),
        }
        new_spec.append(("qconv", op[1]))
        n_q += 1
        # advance the calibration activations with the FP weights (the
        # quantized path tracks it to within quant noise)
        x = _conv_ref(x, w, b)
    return tuple(new_spec), new_params, n_q


def _quantize_dense(p: dict, x_in) -> dict:
    """nn.Dense params → QuantDense params (`models/layers.py QuantDense`):
    per-output-channel int8 weights, per-tensor activation scale from the
    calibration input's abs-max."""
    w = np.asarray(p["kernel"], np.float32)           # (in, out)
    s_w = np.maximum(np.max(np.abs(w), axis=0) / 127.0,
                     1e-12).astype(np.float32)
    s_x = np.float32(max(float(jnp.max(jnp.abs(x_in))), 1e-8) / 127.0)
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    out = {"kernel_q": jnp.asarray(w_q), "w_scale": jnp.asarray(s_w),
           "x_scale": jnp.asarray(s_x)}
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
    params = dict(variables["params"])
    if getattr(model, "stem_spec", None) is None or "stem" not in params:
        raise ValueError("model has no foldable stem to quantize")
    stems = [(n, f) for n, f in (("stem", "stem_spec"),
                                 ("stem2", "stem2_spec"),
                                 ("stem3", "stem3_spec"))
             if getattr(model, f, None) is not None and n in params]
    for n, f in stems:
        if any(op[0] == "bn" for op in getattr(model, f)):
            raise ValueError("quantize_cvit expects a folded stem "
                             "(run fold_cvit first)")
    inputs = {"stem": jnp.asarray(calib_x)}
    sows = {}
    if len(stems) > 1 or transformer:
        kw = {}
        if getattr(model, "pos_mode", None) == "legacy":
            # legacy (32,1,dim) pos-embedding caps batch at 32; the capture
            # forward only needs activations, so any row assignment works
            kw["pos_indices"] = jnp.arange(inputs["stem"].shape[0]) % 32
        _, inter = model.apply(variables, inputs["stem"], train=False,
                               mutable=["intermediates"], **kw)
        sows = inter["intermediates"]
        for n, _f in stems[1:]:
            if f"{n}_input" in sows:
                inputs[n] = sows[f"{n}_input"][0]
    updates = {}
    n_total = 0
    for n, f in stems:
        if n not in inputs:
            continue
        new_spec, new_p, n_q = quantize_stem(getattr(model, f), params[n],
                                             inputs[n])
        if n_q:
            updates[f] = new_spec
            params[n] = new_p
            n_total += n_q

    if transformer:
        params["patch_to_embedding"] = _quantize_dense(
            params["patch_to_embedding"], sows["pe_input"][0])
        tr = {k: dict(v) for k, v in params["transformer"].items()}
        tsows = sows["transformer"]
        for lname, lp in tr.items():
            if lname.startswith("attn") and "to_qkv" in lp:
                lp["to_qkv"] = _quantize_dense(lp["to_qkv"],
                                               tsows[lname]["qkv_in"][0])
                lp["to_out"] = _quantize_dense(lp["to_out"],
                                               tsows[lname]["out_in"][0])
                n_total += 2
            elif lname.startswith("ffn") and "fc1" in lp:
                lp["fc1"] = _quantize_dense(lp["fc1"],
                                            tsows[lname]["fc1_in"][0])
                lp["fc2"] = _quantize_dense(lp["fc2"],
                                            tsows[lname]["fc2_in"][0])
                n_total += 2
        params["transformer"] = tr
        head = dict(params["mlp_head"])
        head["fc1"] = _quantize_dense(head["fc1"],
                                      sows["mlp_head"]["fc1_in"][0])
        params["mlp_head"] = head
        updates["quant_dense"] = True
        n_total += 2

    if n_total == 0:
        return model, variables
    qmodel = dataclasses.replace(model, **updates)
    qvars = dict(variables)
    qvars["params"] = params
    return qmodel, qvars
