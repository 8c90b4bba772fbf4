"""Inference-time BatchNorm folding.

Classic production reparameterization: a conv followed by BatchNorm with
running stats folds into the conv —
    k' = k · γ/√(σ²+ε),  b' = (b − μ)·γ/√(σ²+ε) + β
— eliminating the BN elementwise pass entirely (the reference's stems carry
17 conv+BN pairs). Works on the stem DSL: returns a new spec without the
folded ('bn', ch) ops plus the matching params/batch_stats trees. DEConv ops
fold the same way (the composed weight is linear in every branch weight, so
scaling each branch kernel and summing biases is exact).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fac_fake_tpu.models.layers import BN_EPS

# Device-native on purpose: the fold reads/writes stem params where they
# live. Through the axon relay, pulling them to host first costs seconds
# (downloads ~3.5 MB/s) while the on-device arithmetic is milliseconds;
# on the CPU backend jnp == numpy numerics, so golden tests stay exact.


def _scale_of(bn_params, bn_stats):
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    bias = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    g = scale / jnp.sqrt(var + BN_EPS)
    return g, bias - mean * g


def fold_stem_bn(spec: Tuple, params: dict, stats: dict) -> Tuple[Tuple, dict, dict]:
    """Fold every conv/deconv immediately followed by bn. Returns
    (new_spec, new_params, new_stats). Ops without a trailing bn pass
    through unchanged (e.g. the RepBn8 128-stage bn-less tail)."""
    new_spec = []
    new_params: dict = {}
    new_stats: dict = {}
    remap = {}  # old index -> new index
    i = 0
    out_i = 0
    spec = tuple(spec)
    while i < len(spec):
        op = spec[i]
        kind = op[0]
        name = f"l{i}"
        nxt = spec[i + 1] if i + 1 < len(spec) else ("",)
        foldable = kind in ("conv", "deconv") and nxt[0] == "bn"
        if foldable:
            g, b = _scale_of(params[f"l{i + 1}"], stats[f"l{i + 1}"])
            p = {k: jnp.asarray(v) for k, v in params[name].items()}
            if kind == "conv":
                p["kernel"] = p["kernel"] * g  # HWIO: scale out channels
                p["bias"] = p["bias"] * g + b
            else:  # deconv: precompose the five branches into ONE conv
                # kernel (exact — the forward sums branch weights anyway,
                # `models/blocks/deconv.py`), then fold the BN into it
                from fac_fake_tpu.models.blocks.deconv import \
                    compose_deconv_weight
                w = jnp.asarray(compose_deconv_weight(
                    p["w_cd"], p["w_hd"], p["w_vd"], p["w_ad"], p["w_std"]))
                total_b = sum(jnp.asarray(params[name][bk])
                              for bk in ("b_cd", "b_hd", "b_vd", "b_ad", "b_std"))
                p = {"kernel": w * g, "bias": total_b * g + b}
                op = ("conv", op[1])
            new_params[f"l{out_i}"] = p
            new_spec.append(op)
            remap[i] = out_i
            i += 2  # skip the bn
            out_i += 1
            continue
        if kind == "deconv":
            # bare DEConv (no trailing BN — e.g. the RepBn8 128-stage
            # quirk): compose the five branches into ONE conv kernel anyway.
            # Exact (the forward sums branch weights), and it keeps the
            # folded spec in plain conv/relu/pool form so int8 PTQ
            # (`compat/quantize.py`) can cover the whole stem.
            from fac_fake_tpu.models.blocks.deconv import \
                compose_deconv_weight
            p = {k: jnp.asarray(v) for k, v in params[name].items()}
            w = jnp.asarray(compose_deconv_weight(
                p["w_cd"], p["w_hd"], p["w_vd"], p["w_ad"], p["w_std"]))
            total_b = sum(p[bk] for bk in ("b_cd", "b_hd", "b_vd",
                                           "b_ad", "b_std"))
            new_params[f"l{out_i}"] = {"kernel": w, "bias": total_b}
            new_spec.append(("conv", op[1]))
            remap[i] = out_i
            i += 1
            out_i += 1
            continue
        if kind in ("conv", "bn", "scconv", "wtconv", "idw", "od"):
            if name in params:
                new_params[f"l{out_i}"] = params[name]
            if name in stats:
                new_stats[f"l{out_i}"] = stats[name]
        new_spec.append(op)
        remap[i] = out_i
        i += 1
        out_i += 1
    return tuple(new_spec), new_params, new_stats


def fold_cvit(model, variables):
    """Returns (folded_model, folded_variables) for inference. Only stem BNs
    fold; GGCA/transformer internals keep their stats."""
    import copy
    import dataclasses

    params = {k: v for k, v in variables["params"].items()}
    stats = {k: v for k, v in variables.get("batch_stats", {}).items()}
    updates = {}
    for stem_name, spec_field in (("stem", "stem_spec"), ("stem2", "stem2_spec"),
                                  ("stem3", "stem3_spec")):
        spec = getattr(model, spec_field, None)
        if spec is None or stem_name not in params:
            continue
        new_spec, new_p, new_s = fold_stem_bn(spec, params[stem_name],
                                              stats.get(stem_name, {}))
        updates[spec_field] = new_spec
        params[stem_name] = new_p
        if new_s:
            stats[stem_name] = new_s
        elif stem_name in stats:
            del stats[stem_name]
    folded_model = dataclasses.replace(model, **updates)
    folded_vars = dict(variables)
    folded_vars["params"] = params
    folded_vars["batch_stats"] = stats
    return folded_model, folded_vars
