"""Fused input preprocessing (Pallas).

The scoring path's pre-stage is memory-bound: uint8 crops → float → /255 →
ImageNet mean/std (`cvit_prediction.py:209-215`). This Pallas kernel does the
whole conversion in one VMEM pass per tile — bytes move HBM→VMEM once as
uint8 (4× fewer bytes than fp32) and leave as normalized fp32, nothing
materialized in between. Falls back to plain jnp (XLA fuses it too) off-TPU
or for odd shapes; `interpret=True` path keeps it testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_ROW_TILE = 8


def _kernel(x_ref, mean_ref, inv_std_ref, o_ref):
    # Mosaic can't cast uint8→f32 directly; go through int32 (free on VPU)
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    o_ref[:] = (x - mean_ref[:]) * inv_std_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_normalize(crops_u8: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, 3) uint8 → normalized float32, one fused pass.

    Layout trick: the trailing (W, 3) axes flatten to W·3 lanes so the
    channel-periodic mean/std become a precomputed lane vector — no gather,
    pure VPU multiply-add on (rows, lanes) tiles.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = crops_u8.shape
    lanes = w * c
    x = crops_u8.reshape(b, h, lanes)
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN), w).reshape(1, lanes)
    inv_std = jnp.tile(1.0 / jnp.asarray(IMAGENET_STD), w).reshape(1, lanes)

    grid = (b, pl.cdiv(h, _ROW_TILE))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _ROW_TILE, lanes), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROW_TILE, lanes), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lanes), jnp.float32),
        interpret=interpret,
    )(x, mean, inv_std)
    return out.reshape(b, h, w, c)


def normalize_imagenet(crops_u8: jnp.ndarray, use_pallas: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """Dispatch: Pallas on TPU when shapes tile cleanly, else fused XLA."""
    b, h, w, c = crops_u8.shape
    if use_pallas and h % _ROW_TILE == 0 and jax.default_backend() != "cpu":
        return pallas_normalize(crops_u8, interpret=interpret)
    x = crops_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
