"""Reverse weight conversion: Flax variables → reference torch state_dict.

The forward converter (`torch_weights.convert_cvit`) lets reference
checkpoints load here; this inverse lets weights trained HERE flow back into
the reference's torch models (`CViT-main/model/*.py`) — so a reference user
can adopt this framework for training/serving without abandoning their
torch-side tooling. The key mapping is shared with the forward converter
(`torch_weights._cvit_torch_key`); only the axis transforms invert:
HWIO → OIHW convs, (I,O) → (O,I) denses.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from fac_fake_tpu.compat import torch_weights as tw


def _inverse(tf):
    if tf is tw.t_conv:     # (kh, kw, I, O) → (O, I, kh, kw)
        return lambda w: np.transpose(w, (3, 2, 0, 1))
    if tf is tw.t_conv3d:   # (kt, kh, kw, I, O) → (O, I, kt, kh, kw)
        return lambda w: np.transpose(w, (4, 3, 0, 1, 2))
    if tf is tw.t_conv1d:   # (k, I, O) → (O, I, k)
        return lambda w: np.transpose(w, (2, 1, 0))
    if tf is tw.t_dense:    # (I, O) → (O, I)
        return lambda w: np.transpose(w)
    return lambda w: np.asarray(w)


def export_cvit(variables: Any, variant: str = "cvit") -> Dict[str, np.ndarray]:
    """CViT-family variables → torch state_dict (float32 numpy values).

    Leaves with no torch counterpart (e.g. LinearNorm's total_step constant)
    are skipped — torch keeps them as non-state-dict constants too.
    """
    from flax import traverse_util

    out: Dict[str, np.ndarray] = {}
    for path, leaf in traverse_util.flatten_dict(variables).items():
        key_tf = tw._cvit_torch_key([str(p) for p in path], variant)
        if key_tf is None:
            continue
        key, tf = key_tf
        out[key] = _inverse(tf)(np.asarray(leaf, np.float32))
    return out


def export_s3d(variables: Any, spec) -> Dict[str, np.ndarray]:
    """S3D-family variables → torch state_dict (same spec the model was
    built from — Sequential indices line up with spec slots)."""
    from flax import traverse_util

    out: Dict[str, np.ndarray] = {}
    for path, leaf in traverse_util.flatten_dict(variables).items():
        key_tf = tw._s3d_torch_key([str(p) for p in path], spec)
        if key_tf is None:
            continue
        key, tf = key_tf
        out[key] = _inverse(tf)(np.asarray(leaf, np.float32))
    return out
