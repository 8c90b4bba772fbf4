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
        if variant in ("cvit", "single"):
            return "features"
        return {"stem": "features1", "stem2": "features2",
                "stem3": "features3"}[flax_stem]

    # --- stem layers: stem/l{i}/... ---
    if rest[0] in ("stem", "stem2", "stem3"):
        base = f"{stem_name(rest[0])}.{rest[1][1:]}"  # l{i} -> i
        if re.match(r"^[wb]_(cd|hd|vd|ad|std)$", leaf):
            # DEConv leaves: w_cd / b_cd / ...
            branch = {"cd": "conv1_1", "hd": "conv1_2", "vd": "conv1_3",
                      "ad": "conv1_4", "std": "conv1_5"}[leaf.split("_")[1]]
            sub = "" if branch == "conv1_5" else ".conv"
            if leaf.split("_")[0] == "w":
                tf = t_conv1d if branch in ("conv1_2", "conv1_3") else t_conv
                return f"{base}.{branch}{sub}.weight", tf
            return f"{base}.{branch}{sub}.bias", t_id
        if len(rest) == 3 and leaf in ("kernel", "scale", "bias", "mean", "var"):
            # plain conv / bn directly under l{i}
            if col == "batch_stats":
                return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
            if leaf == "kernel":
                return f"{base}.weight", t_conv
            if leaf == "scale":
                return f"{base}.weight", t_id
            return f"{base}.bias", t_id
        # composite stem ops (scconv / wtconv / idw / odconv-in-stem)
        return _stem_op_key(base, rest[2:], col, leaf)

    # --- variant blocks (torch attr == flax name modulo _tok suffix) ---
    if rest[0] in ("ggca", "bfm", "mdfa", "bfm_tok", "mdfa_tok", "odconv",
                   "moga", "smfa", "uffc", "sla", "glu"):
        return _block_torch_key(rest[0], rest[1:], col, leaf)

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


# ---------------------------------------------------------------------------
# S3D family
# ---------------------------------------------------------------------------

def _s3d_torch_key(path, spec):
    """flax path → (torch_key, transform) for S3DNet checkpoints
    (`S3D/model.py`, `CA_S3D.py`, `msca_S3D*.py`; `base.{i}` Sequential
    indices line up 1:1 with spec indices because pool entries occupy a spec
    slot but carry no params — mirroring nn.MaxPool3d in the Sequential)."""
    col, rest = path[0], list(path[1:])
    leaf = rest[-1]

    def term(base):
        """Map a leaf module (conv / bn / ln) under `base`."""
        if col == "batch_stats":
            return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        if leaf == "kernel":
            return f"{base}.weight", t_conv3d
        if leaf == "scale":
            return f"{base}.weight", t_id
        return f"{base}.bias", t_id

    if rest[0] == "fc":
        return term("fc.0")

    m = re.match(r"^l(\d+)$", rest[0])
    if not m:
        raise KeyError(f"no S3D mapping for {path}")
    i = int(m.group(1))
    base = f"base.{i}"
    op = spec[i][0]
    sub = rest[1]

    if op in ("sep", "basic"):
        return term(f"{base}.{sub}")
    if op == "mix":
        branch = {"b0": "branch0.0", "b1a": "branch1.0", "b1b": "branch1.1",
                  "b2a": "branch2.0", "b2b": "branch2.1", "b3": "branch3.1"}[sub]
        # flax path: l{i}/b1b/conv_s/kernel or l{i}/b0/conv/kernel
        return term(f"{base}.{branch}.{rest[2]}")
    if op == "ctx":
        mapping = {"ca1": "channel_add_conv.0", "ln": "channel_add_conv.1",
                   "ca2": "channel_add_conv.3", "conv_mask": "conv_mask"}
        tk = f"{base}.{mapping[sub]}"
        if sub == "ln":
            # torch LN weight shape (planes,1,1,1) → (planes,)
            return (f"{tk}.weight" if leaf == "scale" else f"{tk}.bias",
                    lambda w: np.asarray(w).reshape(-1))
        if leaf == "kernel":
            return f"{tk}.weight", t_conv3d
        return f"{tk}.bias", t_id
    if op == "mscan_half":
        return _mscan_key(base, rest[1:], col, leaf, prefix_norm="norm1",
                          attn="attn")
    if op == "iformer":
        return _iformer_key(base, rest[1:], col, leaf)
    raise KeyError(f"no S3D mapping for {path}")


def _dwsep_key(base, inner, col, leaf):
    """DWSepConv3d leaf: flax path is <name>/sep/<inner> where inner is
    conv_s / conv_t / bn_t; torch keys live directly under the module."""
    tk = f"{base}.{inner}"
    if col == "batch_stats":
        return f"{tk}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
    if leaf == "kernel":
        return f"{tk}.weight", t_conv3d
    if leaf == "scale":
        return f"{tk}.weight", t_id
    return f"{tk}.bias", t_id


def _attnmod_key(base, rest, col, leaf):
    # AttentionModule3d: conv0/conv0_1/conv1_1 are DWSepConv3d; conv3 plain.
    # rest = [conv0, 'sep', inner, leaf] or [conv3, leaf]
    sub = rest[0]
    if sub == "conv3":
        return (f"{base}.conv3.weight", t_conv3d) if leaf == "kernel" \
            else (f"{base}.conv3.bias", t_id)
    return _dwsep_key(f"{base}.{sub}", rest[2], col, leaf)


def _spatialattn_key(base, rest, col, leaf):
    sub = rest[0]
    if sub == "proj1":
        return (f"{base}.proj_1.weight", t_conv3d) if leaf == "kernel" \
            else (f"{base}.proj_1.bias", t_id)
    if sub == "proj2":
        return (f"{base}.proj_2.weight", t_conv3d) if leaf == "kernel" \
            else (f"{base}.proj_2.bias", t_id)
    return _attnmod_key(f"{base}.spatial_gating_unit", rest[1:], col, leaf)


def _mscan_key(base, rest, col, leaf, prefix_norm="norm1", attn="attn"):
    sub = rest[0]
    if sub in ("norm1", "norm2"):
        tk = f"{base}.{sub}"
        if col == "batch_stats":
            return f"{tk}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        return (f"{tk}.weight" if leaf == "scale" else f"{tk}.bias"), t_id
    if sub == "attn":
        return _spatialattn_key(f"{base}.attn", rest[1:], col, leaf)
    if sub == "mlp":
        return _mlp3d_key(f"{base}.mlp", rest[1:], col, leaf)
    raise KeyError(f"mscan {rest}")


def _mlp3d_key(base, rest, col, leaf):
    sub = rest[0]
    if sub in ("fc1", "fc2"):
        return (f"{base}.{sub}.weight", t_conv3d) if leaf == "kernel" \
            else (f"{base}.{sub}.bias", t_id)
    # rest = ['dw', 'sep', inner, leaf] -> torch Mlp.dwconv.dwconv (DWConv
    # wraps DWSepConv3d)
    return _dwsep_key(f"{base}.dwconv.dwconv", rest[2], col, leaf)


def _iformer_key(base, rest, col, leaf):
    sub = rest[0]
    if sub in ("norm1", "norm2"):
        tk = f"{base}.{sub}"
        if col == "batch_stats":
            return f"{tk}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        return (f"{tk}.weight" if leaf == "scale" else f"{tk}.bias"), t_id
    if sub == "mlp":
        return _mlp3d_key(f"{base}.mlp", rest[1:], col, leaf)
    # mixer pieces
    mix = f"{base}.inceptionmixer"
    sub2 = rest[1]
    if sub2 == "pool_fc":
        tk = f"{mix}.maxpool_fc.1"
        if col == "batch_stats":
            return f"{tk}.bn.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        if rest[2] == "conv":
            return f"{tk}.conv.weight", t_conv3d
        return (f"{tk}.bn.weight" if leaf == "scale" else f"{tk}.bn.bias"), t_id
    if sub2 == "fc":
        tk = f"{mix}.fc_dw.0"
        if col == "batch_stats":
            return f"{tk}.bn.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        if rest[2] == "conv":
            return f"{tk}.conv.weight", t_conv3d
        return (f"{tk}.bn.weight" if leaf == "scale" else f"{tk}.bn.bias"), t_id
    if sub2 == "dw":
        # rest = ['mixer', 'dw', 'sep', inner, leaf]
        return _dwsep_key(f"{mix}.fc_dw.1", rest[3], col, leaf)
    if sub2 == "bn":
        tk = f"{mix}.fc_dw.2"
        if col == "batch_stats":
            return f"{tk}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        return (f"{tk}.weight" if leaf == "scale" else f"{tk}.bias"), t_id
    if sub2 == "attn":
        return _spatialattn_key(f"{mix}.attn", rest[2:], col, leaf)
    raise KeyError(f"iformer {rest}")


def convert_s3d(state_dict: Dict[str, np.ndarray], variables: Any, spec) -> Any:
    """Fill an initialized S3DNet variable tree from a torch state_dict."""
    import jax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        key, tf = _s3d_torch_key([str(p) for p in path], spec)
        if key not in state_dict:
            raise KeyError(f"torch checkpoint missing '{key}' for {path}")
        val = np.asarray(tf(state_dict[key])).astype(np.asarray(leaf).dtype)
        if val.shape != tuple(np.asarray(leaf).shape):
            raise ValueError(f"{path}: {val.shape} != {np.asarray(leaf).shape}")
        out[path] = val
    return jax.tree.map(lambda x: x, traverse_util.unflatten_dict(out))


# ---------------------------------------------------------------------------
# ResKan / ResVitKan family
# ---------------------------------------------------------------------------

def _resnet_key(rest, col, leaf, prefix=""):
    """flax ResNet paths → torch keys (`kan_resnet.py` / `ResVitKan.py`
    vendored ResNets share naming: conv1/bn1/layerX.Y.{convZ,bnZ,downsample}
    plus the optional channel/bn2 squeeze tail)."""
    sub = rest[0]

    def term(base, is_conv):
        if col == "batch_stats":
            return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
        if is_conv:
            return f"{base}.weight", t_conv
        return (f"{base}.weight" if leaf == "scale" else f"{base}.bias"), t_id

    if sub in ("conv1", "channel"):
        return term(f"{prefix}{sub}", True)
    if sub in ("bn1", "bn2"):
        return term(f"{prefix}{sub}", False)
    m = re.match(r"^layer(\d+)_(\d+)$", sub)
    if m:
        tl = f"{prefix}layer{m.group(1)}.{m.group(2)}"
        inner = rest[1]
        if inner == "ds_conv":
            return term(f"{tl}.downsample.0", True)
        if inner == "ds_bn":
            return term(f"{tl}.downsample.1", False)
        return term(f"{tl}.{inner}", inner.startswith("conv"))
    raise KeyError(f"resnet path {rest}")


def _kan_key(rest, col, leaf, prefix):
    """KAN paths: <prefix>.layers.{i}.{base_weight,spline_weight,
    spline_scaler,grid} — identity layout (we keep torch (out,in,...))."""
    m = re.match(r"^layer(\d+)$", rest[0])
    i = m.group(1)
    name = "grid" if col == "kan_grid" else leaf
    return f"{prefix}.layers.{i}.{name}", t_id


def _fill(variables, state_dict, key_fn):
    import jax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        key, tf = key_fn([str(p) for p in path])
        if key not in state_dict:
            raise KeyError(f"torch checkpoint missing '{key}' for {path}")
        val = np.asarray(tf(state_dict[key])).astype(np.asarray(leaf).dtype)
        if val.shape != tuple(np.asarray(leaf).shape):
            raise ValueError(f"{path}: {val.shape} != {np.asarray(leaf).shape}")
        out[path] = val
    return jax.tree.map(lambda x: x, traverse_util.unflatten_dict(out))


def convert_reskan(state_dict, variables):
    def key_fn(path):
        col, rest = path[0], path[1:]
        leaf = rest[-1]
        if rest[0] == "resnet":
            return _resnet_key(rest[1:], col, leaf)
        return _kan_key(rest[1:], col, leaf, "kan")
    return _fill(variables, state_dict, key_fn)


def convert_resvitkan(state_dict, variables, head: str = "kan"):
    """head='kan': ResVitKan (kan_head.*); head='mlp': plain resvit
    (mlp_head.* Sequential)."""
    hname = "kan_head" if head == "kan" else "mlp_head"

    def key_fn(path):
        col, rest = path[0], path[1:]
        leaf = rest[-1]
        if rest[0] == "features":
            return _resnet_key(rest[1:], col, leaf, prefix="features.")
        if rest[0] == "transformer":
            return _cvit_torch_key(path, "cvit")
        if rest == ["pos_embedding"] or rest == ["cls_token"]:
            return rest[0], t_id
        if rest[0] == "patch_to_embedding":
            return (("patch_to_embedding.weight", t_dense) if leaf == "kernel"
                    else ("patch_to_embedding.bias", t_id))
        if rest[0] == "head_fc":
            return ((f"{hname}.0.weight", t_dense) if leaf == "kernel"
                    else (f"{hname}.0.bias", t_id))
        if rest[0] == "head_out":
            return ((f"{hname}.3.weight", t_dense) if leaf == "kernel"
                    else (f"{hname}.3.bias", t_id))
        if rest[0] == "head_kan":
            return _kan_key(rest[1:], col, leaf, "kan_head.3")
        raise KeyError(f"resvitkan path {path}")
    return _fill(variables, state_dict, key_fn)


# ---------------------------------------------------------------------------
# CViT variant blocks (GGCA/BFM/MDFA/ODConv/MOGA/SMFA/UFFC/SLA/GLU + stem ops)
# ---------------------------------------------------------------------------

def _t_od_weight(w):  # (kn, O, I, k, k) -> (kn, k, k, I, O)
    return np.transpose(w, (0, 3, 4, 2, 1))


def _t_flat(w):       # (1, C, 1, 1) or (C, 1, 1) -> (C,)
    return np.asarray(w).reshape(-1)


def _term(base, col, leaf, conv_tf=t_conv):
    """Standard conv/bn/param leaf mapping under a torch module `base`."""
    if col == "batch_stats":
        return f"{base}.running_{'mean' if leaf == 'mean' else 'var'}", t_id
    if leaf == "kernel":
        return f"{base}.weight", conv_tf
    if leaf == "scale":
        return f"{base}.weight", t_id
    return f"{base}.bias", t_id


def _block_torch_key(tname, rest, col, leaf):
    """Map a variant block's flax sub-path to its torch keys. `tname` is the
    torch attribute (== flax module name modulo the _tok suffix)."""
    kind = tname
    sub = rest[0] if rest else None

    if kind == "ggca":
        idx = {"conv1": "0", "bn": "1", "conv2": "3"}[sub]
        return _term(f"ggca.shared_conv.{idx}", col, leaf)

    if kind in ("mdfa", "mdfa_tok"):
        t = "mdfa"
        m = {"b1_conv": "branch1.0", "b1_bn": "branch1.1",
             "b2_conv": "branch2.0", "b2_bn": "branch2.1",
             "b3_conv": "branch3.0", "b3_bn": "branch3.1",
             "b4_conv": "branch4.0", "b4_bn": "branch4.1",
             "b5_conv": "branch5_conv", "b5_bn": "branch5_bn",
             "cat_conv": "conv_cat.0", "cat_bn": "conv_cat.1"}
        if sub in m:
            return _term(f"{t}.{m[sub]}", col, leaf)
        if sub == "hebing":
            inner = {"tongdao": "Hebing.tongdao.fc",
                     "kongjian": "Hebing.kongjian.Conv1x1"}[rest[1]]
            return _term(f"{t}.{inner}", col, leaf)

    if kind in ("bfm", "bfm_tok"):
        t = "bfm"
        if sub in ("ms_conv3", "ms_conv5", "ms_conv7"):
            i = {"3": "1", "5": "2", "7": "3"}[sub[-1]]
            return _term(f"{t}.multi_scale_extractor.conv{i}", col, leaf)
        inner = rest[1]
        if inner.startswith("channel_conv"):
            return _term(f"{t}.tfam.channel_attention.{inner}", col, leaf,
                         conv_tf=t_conv1d)
        return _term(f"{t}.tfam.spatial_attention.{inner}", col, leaf)

    if kind == "odconv":
        if sub == "weight":
            return "odconv.weight", _t_od_weight
        att = {"fc": "fc", "bn": "bn", "channel_fc": "channel_fc",
               "filter_fc": "filter_fc", "spatial_fc": "spatial_fc",
               "kernel_fc": "kernel_fc"}[sub]
        return _term(f"odconv.attention.{att}", col, leaf)

    if kind == "moga":
        if sub == "sigma":
            return "moga.sigma.scale", _t_flat
        if sub == "value":
            inner = {"dw0": "DW_conv0", "dw1": "DW_conv1", "dw2": "DW_conv2",
                     "pw": "PW_conv"}[rest[1]]
            return _term(f"moga.value.{inner}", col, leaf)
        return _term(f"moga.{sub}", col, leaf)   # proj_1 / gate / proj_2

    if kind == "smfa":
        if sub in ("alpha", "belt"):
            return f"smfa.{sub}", _t_flat
        if sub == "lde":
            inner = {"conv0a": "conv_0.0", "conv0b": "conv_0.1",
                     "conv1": "conv_1"}[rest[1]]
            return _term(f"smfa.lde.{inner}", col, leaf)
        return _term(f"smfa.{sub}", col, leaf)   # linear_0/1/2, dw_conv

    if kind == "uffc":
        if sub == "locMap":
            return "uffc.locMap", t_id
        if sub == "lambda_base":
            return "uffc.lambda_base", lambda w: np.asarray(w).reshape(())
        m = {"conv_down": "conv_layer_down55",
             "conv_down_shift": "conv_layer_down55_shift"}[sub]
        return _term(f"uffc.{m}", col, leaf)

    if kind == "sla":
        if sub == "positional_encoding":
            return "sla.positional_encoding", t_id
        tf = t_dense if sub in ("qkv", "proj") else t_conv
        return _term(f"sla.{sub}", col, leaf, conv_tf=tf) if sub == "dwc" else (
            (f"sla.{sub}.weight", t_dense) if leaf == "kernel"
            else (f"sla.{sub}.bias", t_id))

    if kind == "glu":
        if sub == "dwconv":
            return _term("glu.dwconv.dwconv", col, leaf)
        return ((f"glu.{sub}.weight", t_dense) if leaf == "kernel"
                else (f"glu.{sub}.bias", t_id))

    raise KeyError(f"block {tname} / {rest}")


def _stem_op_key(base, rest, col, leaf):
    """Stem ops beyond conv/bn/deconv: scconv, wtconv, idw, odconv-in-stem."""
    sub = rest[0]
    # ScConv
    if sub == "sru":
        if leaf == "gn_scale":
            return f"{base}.SRU.gn.weight", t_id
        return f"{base}.SRU.gn.bias", t_id
    if sub == "cru":
        inner = {"squeeze1": "squeeze1", "squeeze2": "squeeze2", "gwc": "GWC",
                 "pwc1": "PWC1", "pwc2": "PWC2"}[rest[1]]
        return _term(f"{base}.CRU.{inner}", col, leaf)
    # WTConv
    if sub == "base_conv":
        return _term(f"{base}.base_conv", col, leaf)
    if sub in ("base_scale",) or sub.startswith("wavelet_scale"):
        t = "base_scale" if sub == "base_scale" else \
            f"wavelet_scale.{sub[len('wavelet_scale'):]}"
        return f"{base}.{t}.weight", _t_flat
    if sub.startswith("wavelet_conv"):
        return _term(f"{base}.wavelet_convs.{sub[len('wavelet_conv'):]}",
                     col, leaf)
    # InceptionDW
    if sub in ("dwconv_hw", "dwconv_w", "dwconv_h"):
        return _term(f"{base}.{sub}", col, leaf)
    # ODConv as stem op: flax children under l{i} directly
    if sub == "weight":
        return f"{base}.weight", _t_od_weight
    if sub in ("fc", "bn", "channel_fc", "filter_fc", "spatial_fc", "kernel_fc"):
        return _term(f"{base}.attention.{sub}", col, leaf)
    raise KeyError(f"stem op {rest}")
