"""PyTorch checkpoint ingestion.

Loads reference `.pth` state_dicts (`cvit_prediction.py:67-69`,
`cvit_train.py:70-71` dict form) and fills this framework's Flax variable
trees by systematic name translation + layout transposition (torch OIHW →
HWIO, Dense (O,I) → (I,O)). Conversion walks *our* initialized tree so every
leaf is shape-checked; torch is only needed at conversion time (run once,
offline — SURVEY.md §7.3).

Also handles the DDP ``module.`` prefix with a proper prefix strip, not the
reference's buggy character-set ``lstrip`` (`S3D-test.py:204`, SURVEY.md §8.7).
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def strip_ddp_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove a leading 'module.' from every key (correct prefix semantics)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: only needed for one-time conversion

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]  # {'epoch','state_dict','optimizer',...} form
    sd = strip_ddp_prefix(obj)
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def t_conv(w):   # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def t_conv3d(w):  # (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def t_conv1d(w):  # (O, I, k) -> (k, I, O)
    return np.transpose(w, (2, 1, 0))


def t_dense(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def t_id(w):
    return np.asarray(w)


# ---------------------------------------------------------------------------
# CViT family
# ---------------------------------------------------------------------------

_TFM_RE = re.compile(r"^(attn_norm|attn|ffn_norm|ffn)(\d+)$")


def _cvit_torch_key(path, variant: str):
    """Translate a flax variable path (tuple of names) to
    (torch_key, transform). Returns None for leaves with no torch counterpart
    (e.g. LinearNorm total_step constant)."""
    col, rest = path[0], list(path[1:])
    leaf = rest[-1]

    def stem_name(flax_stem: str) -> str:
        if variant == "cvit":
            return "features"
        return {"stem": "features1", "stem2": "features2"}[flax_stem]

    # --- stem layers: stem/l{i}/... ---
    if rest[0] in ("stem", "stem2"):
        base = f"{stem_name(rest[0])}.{rest[1][1:]}"  # l{i} -> i
        if not re.match(r"^[wb]_(cd|hd|vd|ad|std)$", leaf):  # plain conv / bn
            if col == "batch_stats":
                return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
            if leaf == "kernel":
                return f"{base}.weight", t_conv
            if leaf == "scale":
                return f"{base}.weight", t_id
            return f"{base}.bias", t_id
        # DEConv leaves: w_cd / b_cd / ...
        branch = {"cd": "conv1_1", "hd": "conv1_2", "vd": "conv1_3",
                  "ad": "conv1_4", "std": "conv1_5"}[leaf.split("_")[1]]
        sub = "" if branch == "conv1_5" else ".conv"
        kind = leaf.split("_")[0]
        if kind == "w":
            tf = t_conv1d if branch in ("conv1_2", "conv1_3") else t_conv
            return f"{base}.{branch}{sub}.weight", tf
        return f"{base}.{branch}{sub}.bias", t_id

    # --- GGCA ---
    if rest[0] == "ggca":
        idx = {"conv1": "0", "bn": "1", "conv2": "3"}[rest[1]]
        base = f"ggca.shared_conv.{idx}"
        if col == "batch_stats":
            return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        if leaf == "kernel":
            return f"{base}.weight", t_conv
        if leaf == "scale":
            return f"{base}.weight", t_id
        return f"{base}.bias", t_id

    # --- top-level params ---
    if rest == ["pos_embedding"]:
        return "pos_embedding", t_id
    if rest == ["cls_token"]:
        return "cls_token", t_id
    if rest[0] == "patch_to_embedding":
        return ("patch_to_embedding.weight", t_dense) if leaf == "kernel" \
            else ("patch_to_embedding.bias", t_id)
    if rest[0] == "mlp_head":
        idx = "0" if rest[1] == "fc1" else "2"
        return (f"mlp_head.{idx}.weight", t_dense) if leaf == "kernel" \
            else (f"mlp_head.{idx}.bias", t_id)

    # --- transformer ---
    if rest[0] == "transformer":
        m = _TFM_RE.match(rest[1])
        kind, i = m.group(1), m.group(2)
        L = f"transformer.layers.{i}"
        if kind == "attn_norm":
            return (f"{L}.0.fn.norm.weight", t_id) if leaf == "scale" \
                else (f"{L}.0.fn.norm.bias", t_id)
        if kind == "attn":
            proj = rest[2]  # to_qkv | to_out
            return (f"{L}.0.fn.fn.{proj}.weight", t_dense) if leaf == "kernel" \
                else (f"{L}.0.fn.fn.{proj}.bias", t_id)
        if kind == "ffn":
            idx = "0" if rest[2] == "fc1" else "2"
            return (f"{L}.1.fn.fn.net.{idx}.weight", t_dense) if leaf == "kernel" \
                else (f"{L}.1.fn.fn.net.{idx}.bias", t_id)
        # ffn_norm: plain LN (base) or LinearNorm (repbn variants)
        N = f"{L}.1.fn.norm"
        if col == "schedule":
            return f"{N}.{leaf}", t_id  # warm / iter
        if len(rest) == 3:  # plain LayerNorm
            return (f"{N}.weight", t_id) if leaf == "scale" else (f"{N}.bias", t_id)
        if rest[2] == "norm1":
            return (f"{N}.norm1.weight", t_id) if leaf == "scale" \
                else (f"{N}.norm1.bias", t_id)
        # norm2 = RepBN
        if leaf == "alpha":
            return f"{N}.norm2.alpha", t_id
        if col == "batch_stats":
            return f"{N}.norm2.bn.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        return (f"{N}.norm2.bn.weight", t_id) if leaf == "scale" \
            else (f"{N}.norm2.bn.bias", t_id)

    raise KeyError(f"no torch mapping for flax path {path}")


def convert_cvit(state_dict: Dict[str, np.ndarray], variables: Any,
                 variant: str = "cvit") -> Any:
    """Fill an initialized CViT variable tree from a torch state_dict."""
    import jax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        key_tf = _cvit_torch_key([str(p) for p in path], variant)
        if key_tf is None:
            out[path] = leaf
            continue
        key, tf = key_tf
        if key not in state_dict:
            raise KeyError(f"torch checkpoint missing '{key}' for {path}")
        val = tf(state_dict[key]).astype(np.asarray(leaf).dtype)
        if val.shape != tuple(np.asarray(leaf).shape):
            raise ValueError(f"{path}: shape {val.shape} != {np.asarray(leaf).shape}")
        out[path] = val
    return jax.tree.map(lambda x: x, traverse_util.unflatten_dict(out))
