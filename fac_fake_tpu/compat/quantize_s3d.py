"""Post-training int8 quantization of the S3D family (inference only).

The reference's S3D scoring loop (`S3D/S3D-test.py:260-286`) runs fp32
torch on GPU; this is a TPU-native extension: the v5e MXU runs
int8×int8→int32 at 2× its bf16 rate, and unlike the CViT stems (≤64-channel,
MXU-output-underfill-bound — README "Why train MFU…"), the S3D Inception
mixes contract 64–1024 channels, exactly where the 2× int8 rate should pay
nearly in full on the eval path.

Design — a spec-walking inference ENGINE, not a module-tree rewrite: the
CViT quantizer (`compat/quantize.py`) swaps ops inside a flat stem spec, but
S3D's convs live three Flax modules deep (`S3DNet → InceptionMix →
SepConv3d`), so instead the engine re-executes `S3DNet.__call__`'s op walk
(`models/s3d/model.py:116-157`) directly from the variables tree:

  * ONE jitted calibration pass folds every BN3D into its conv (exact
    algebra: `w' = w·γ/√(σ²+ε)`, `b' = β − μ·γ/√(σ²+ε)`; the reference convs
    are bias-free, `S3D/model.py:50-82`), runs the folded fp forward on a
    calibration batch, and records per-conv input abs-max activation scales
    + symmetric per-output-channel int8 weights — no per-op dispatch through
    the axon relay (the same single-jit trick as `quantize_cvit`);
  * the jitted int8 forward replays the same walk with
    `lax.conv_general_dilated(int8, int8, preferred_element_type=int32)` and
    a fused `·(s_x·s_w) + b` dequant epilogue, activations bf16 between
    convs.

What quantizes: every SepConv3d spatial/temporal factor and every
BasicConv3d 1×1×1/k³ conv — including all four Inception branches
(`S3D/model.py:84-342`). What stays fp: the frozen SRM bank, the GCNet
context blocks (1×1×1 convs on a pooled (B,1,1,1,C) tensor — no FLOPs to
win), the msca MSCAN/iFormer interiors (depthwise-dominated, delegated
unchanged to the Flax modules), and the head conv. Inception quirk
exploited: max-pool commutes with the monotone quantizer `clip∘round∘(/s)`,
so branch b3 pools the int8 tensor directly and the whole 4-branch block
quantizes its input ONCE (same scale ⇒ bit-identical to pool-then-quantize).

Accuracy is pinned numerically (`tests/test_quantize_s3d.py`: folded-fp walk
≡ `model.apply`, int8 logits within 10% of the fp spread + cosine) — no
trained reference checkpoints ship in this environment (SURVEY.md §2.6).

Usage::

    engine = quantize_s3d(model, variables, calib_clips)   # one jitted pass
    logits = engine(clips)                                  # jitted int8
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fac_fake_tpu.models.s3d.layers import (BN3D_EPS, avg_pool3d, max_pool3d,
                                            srm_filter)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _conv3d(x, w, strides, padding, int8: bool = False):
    return jax.lax.conv_general_dilated(
        x, w, strides, tuple((p, p) for p in padding), dimension_numbers=_DN,
        preferred_element_type=jnp.int32 if int8 else None)


def _act(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "relu6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    raise KeyError(name)


def _fold(p: Dict, s: Dict, conv: str, bn: Optional[str]):
    """BN3D folded into the (bias-free) conv → (w_f32, b_f32)."""
    w = jnp.asarray(p[conv]["kernel"], jnp.float32)
    if bn is None:
        return w, jnp.zeros((w.shape[-1],), jnp.float32)
    g = jnp.asarray(p[bn]["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(s[bn]["var"], jnp.float32) + BN3D_EPS)
    b = (jnp.asarray(p[bn]["bias"], jnp.float32)
         - jnp.asarray(s[bn]["mean"], jnp.float32) * g)
    return w * g, b


def _max_pool3d_i8(x, kernel, strides, padding):
    """int8 max-pool (identity −128 < any quantized value ≥ −127)."""
    pad = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max,
        (1,) + kernel + (1,), (1,) + strides + (1,), pad)


def _quantize_in(x, s_x):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                    -127, 127).astype(jnp.int8)


class S3DInt8:
    """Quantized inference engine for one `S3DNet` (any registry variant).

    Built by `quantize_s3d`. `__call__(clips)` scores a (B,T,H,W,3) batch
    with the jitted int8 walk; `folded_fp_forward` is the exact-algebra fp
    reference the tests pin against `model.apply(train=False)`.
    """

    def __init__(self, model, variables, calib_clips):
        self.spec = model.spec
        self.srm = model.srm
        self.num_class = model.num_class
        self.dtype = model.dtype
        self.variables = variables
        self.qparams = jax.jit(self._calibrate)(
            variables, jnp.asarray(calib_clips))
        self._fwd = jax.jit(self._int8_forward)

    # --- public surfaces --------------------------------------------------
    def __call__(self, clips) -> jnp.ndarray:
        return self._fwd(self.variables, self.qparams, clips)

    def folded_fp_forward(self, variables, clips) -> jnp.ndarray:
        """Folded-BN fp32 walk (no quantization) — the numerics pin."""
        return self._walk(variables, clips, build=None, qp=None)

    # --- jitted bodies ----------------------------------------------------
    def _calibrate(self, variables, clips):
        build: Dict[str, Any] = {}
        self._walk(variables, clips, build=build, qp=None)
        return build

    def _int8_forward(self, variables, qp, clips):
        return self._walk(variables, clips, build=None, qp=qp)

    # --- the shared op walk -------------------------------------------------
    def _walk(self, variables, x, build, qp):
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        int8_mode = qp is not None
        dt = self.dtype if int8_mode else jnp.float32

        def conv_step(x, key, p, s, geom, act, conv="conv", bn="bn",
                      xq=None, s_x_shared=None):
            """One folded conv (+ optional act). Calib mode records qparams;
            int8 mode consumes them (`xq`: pre-quantized shared input)."""
            strides, padding = geom
            if int8_mode:
                e = qp[key]
                xi = xq if xq is not None else _quantize_in(x, e["s_x"])
                y = _conv3d(xi, e["w_q"], strides, padding, int8=True)
                y = (y.astype(jnp.float32) * e["s"] + e["b"]).astype(dt)
            else:
                w, b = _fold(p, s, conv, bn)
                xf = x.astype(jnp.float32)
                if build is not None:
                    s_x = s_x_shared if s_x_shared is not None else \
                        jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
                    s_w = jnp.maximum(
                        jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)) / 127.0, 1e-12)
                    build[key] = {
                        "w_q": jnp.clip(jnp.round(w / s_w),
                                        -127, 127).astype(jnp.int8),
                        "s": s_x * s_w, "b": b, "s_x": s_x}
                y = _conv3d(xf, w, strides, padding) + b
            return _act(act)(y) if act is not None else y

        def sep_step(x, key, p, s, strd, pad, act, sbn):
            """SepConv3d: spatial (1,k,k) then temporal (k,1,1) factor
            (`models/s3d/layers.py:77-110`; sbn=False ⇒ msca V2: no spatial
            BN/act)."""
            x = conv_step(x, key + "/s", p, s, ((1, strd, strd), (0, pad, pad)),
                          act if sbn else None, conv="conv_s",
                          bn="bn_s" if sbn else None)
            return conv_step(x, key + "/t", p, s,
                             ((strd, 1, 1), (pad, 0, 0)),
                             act, conv="conv_t", bn="bn_t")

        def mix_step(x, key, p, s, plan, act, sbn):
            """4-branch Inception (`models/s3d/blocks.py:40-62`): input
            quantized ONCE, b3 pools the int8 tensor (max ∘ quantize =
            quantize ∘ max for the shared scale)."""
            g11 = ((1, 1, 1), (0, 0, 0))
            if int8_mode:
                xq = _quantize_in(x, qp[key + "/b0"]["s_x"])
                y0 = conv_step(x, key + "/b0", None, None, g11, act, xq=xq)
                y1 = conv_step(x, key + "/b1a", None, None, g11, act, xq=xq)
                y2 = conv_step(x, key + "/b2a", None, None, g11, act, xq=xq)
                xq3 = _max_pool3d_i8(xq, (3, 3, 3), (1, 1, 1), (1, 1, 1))
                y3 = conv_step(x, key + "/b3", None, None, g11, act, xq=xq3)
            else:
                sx = None
                if build is not None:
                    sx = jnp.maximum(
                        jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
                y0 = conv_step(x, key + "/b0", p["b0"], s.get("b0", {}), g11,
                               act, s_x_shared=sx)
                y1 = conv_step(x, key + "/b1a", p["b1a"], s.get("b1a", {}),
                               g11, act, s_x_shared=sx)
                y2 = conv_step(x, key + "/b2a", p["b2a"], s.get("b2a", {}),
                               g11, act, s_x_shared=sx)
                y3 = conv_step(
                    max_pool3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
                    key + "/b3", p["b3"], s.get("b3", {}), g11, act,
                    s_x_shared=sx)
            y1 = sep_step(y1, key + "/b1b",
                          None if int8_mode else p["b1b"],
                          None if int8_mode else s.get("b1b", {}),
                          1, 1, act, sbn)
            y2 = sep_step(y2, key + "/b2b",
                          None if int8_mode else p["b2b"],
                          None if int8_mode else s.get("b2b", {}),
                          1, 1, act, sbn)
            return jnp.concatenate([y0, y1, y2, y3], axis=-1)

        def module_step(x, name, make):
            """fp delegation to the model's own Flax module (GCNet context,
            msca MSCAN/iFormer — nothing MXU-bound to quantize there)."""
            vs = {"params": params[name]}
            if name in stats:
                vs["batch_stats"] = stats[name]
            return make(dt).apply(vs, x, train=False)

        # --- input + SRM (frozen bank stays fp) ---------------------------
        x = x.astype(dt)
        if self.srm == "concat30":
            x = srm_filter(x.astype(jnp.float32), full=True).astype(dt)
        elif self.srm == "residual3":
            x = (x.astype(jnp.float32)
                 + srm_filter(x.astype(jnp.float32), full=False)).astype(dt)

        from fac_fake_tpu.models.s3d.blocks import (ContextBlock3d,
                                                    INCEPTION_PLANS,
                                                    IFormerBlock, MSCANHalf)

        for i, op in enumerate(self.spec):
            kind = op[0]
            name = f"l{i}"
            p = None if int8_mode else params.get(name)
            s = None if int8_mode else stats.get(name, {})
            if kind == "sep":
                _, _out, k, strd, pad, act, sbn = op
                x = sep_step(x, name, p, s, strd, pad, act, sbn)
            elif kind == "basic":
                _, _out, k, strd, pad, act = op
                x = conv_step(x, name, p, s,
                              ((strd,) * 3, (pad,) * 3), act)
            elif kind == "pool":
                x = max_pool3d(x, op[1], op[2], op[3])
            elif kind == "mix":
                x = mix_step(x, name, p, s, INCEPTION_PLANS[op[1]],
                             op[2], op[3])
            elif kind == "ctx":
                x = module_step(x, name, lambda d, op=op: ContextBlock3d(
                    op[1], op[2], dtype=d))
            elif kind == "mscan_half":
                x = module_step(x, name, lambda d, op=op: MSCANHalf(
                    op[1], dtype=d))
            elif kind == "iformer":
                x = module_step(x, name, lambda d, op=op: IFormerBlock(
                    op[1], op[2], light=op[3], dtype=d))
            else:
                raise ValueError(kind)

        # --- head (fp, `models/s3d/model.py:152-157`) ---------------------
        x = avg_pool3d(x, (2, x.shape[2], x.shape[3]))
        w = jnp.asarray(params["fc"]["kernel"], dt)
        b = jnp.asarray(params["fc"]["bias"], dt)
        x = _conv3d(x.astype(dt), w, (1, 1, 1), (0, 0, 0)) + b
        return jnp.mean(x.reshape(x.shape[0], x.shape[1], self.num_class),
                        axis=1).astype(jnp.float32)


def quantize_s3d(model, variables, calib_clips) -> S3DInt8:
    """Build the int8 engine from an `S3DNet` + fp variables.

    `calib_clips`: a representative (B,T,H,W,3) batch in model input space
    (raw 0–255 floats for the reference S3D pipeline, `S3D-train.py:318`).
    Calibration is ONE jitted pass; the returned engine is a callable
    `(B,T,H,W,3) → (B, num_class)` logits.
    """
    return S3DInt8(model, variables, calib_clips)
