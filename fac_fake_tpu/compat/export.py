"""Model export.

The reference ships a torch→ONNX exporter (`model/pt_to_onnx.py`: opset 12,
input (1,3,224,224)). The TPU-native equivalent is StableHLO via
`jax.export`: a serialized, version-stable artifact any XLA-backed runtime
(and ONNX-adjacent toolchains via StableHLO converters) can load — plus an
orbax weights checkpoint for Python consumers.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def export_stablehlo(model, variables, input_shape: Tuple[int, ...],
                     out_path: str, dtype=jnp.float32) -> str:
    """Serialize the jitted eval forward to StableHLO bytes at `out_path`."""
    from jax import export as jexport

    def fwd(v, x):
        return model.apply(v, x, train=False)

    exported = jexport.export(jax.jit(fwd))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
                     jax.device_get(variables)),
        jax.ShapeDtypeStruct(input_shape, dtype))
    data = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_stablehlo(path: str):
    """Deserialize an exported module; returns a callable(variables, x)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def save_weights(variables, out_dir: str):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ck:
        ck.save(os.path.abspath(out_dir), jax.device_get(variables))
        ck.wait_until_finished()
