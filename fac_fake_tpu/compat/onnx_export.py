"""ONNX export of the CViT detector (opset 12) + a numpy evaluator.

Capability parity with `model/pt_to_onnx.py:34-51` (torch.onnx.export of the
base CViT, opset 12, input (1, 3, 224, 224)) — but TPU-native: the graph is
emitted from OUR folded Flax model (BN pre-folded into conv weights, NHWC
kernels transposed to ONNX's OIHW), serialized by the dependency-free writer
in `onnx_proto.py` since no ONNX tooling exists in this image.

Ops stay inside the opset-12 vocabulary: Conv/Relu/MaxPool stems, MatMul/Add
embeddings, LayerNorm decomposed to ReduceMean/Sub/Mul/Sqrt/Div (opset 12
has no LayerNormalization), exact GELU via Erf, attention as
Reshape/Transpose/Gather/MatMul/Softmax.

`run_onnx` executes a parsed model with numpy (convolutions via lax) so the
artifact is verified end-to-end in-repo: serialize → parse → run → match the
live JAX forward ≤1e-4 (tests/test_onnx_export.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from fac_fake_tpu.compat import onnx_proto as op


class _Graph:
    def __init__(self):
        self.nodes = []
        self.inits = []
        self._n = 0

    def fresh(self, hint: str) -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init(self, name: str, arr: np.ndarray) -> str:
        self.inits.append(op.tensor_proto(name, arr))
        return name

    def add(self, op_type: str, inputs, output: Optional[str] = None,
            **attrs) -> str:
        out = output or self.fresh(op_type.lower())
        self.nodes.append(op.node_proto(op_type, inputs, [out], **attrs))
        return out

    def scalar(self, value: float) -> str:
        return self.init(self.fresh("c"), np.asarray(value, np.float32))

    def shape_of(self, dims) -> str:
        return self.init(self.fresh("shape"), np.asarray(dims, np.int64))

    def index(self, i: int) -> str:
        return self.init(self.fresh("idx"), np.asarray(i, np.int64))


def _f32(tree):
    return {k: _f32(v) for k, v in tree.items()} if isinstance(tree, dict) \
        else np.asarray(tree, np.float32)


def _layer_norm(g: _Graph, x: str, scale: np.ndarray, bias: np.ndarray,
                eps: float, prefix: str) -> str:
    mean = g.add("ReduceMean", [x], axes=[2], keepdims=1)  # x is (1, n, dim)
    d = g.add("Sub", [x, mean])
    var = g.add("ReduceMean", [g.add("Mul", [d, d])], axes=[2], keepdims=1)
    std = g.add("Sqrt", [g.add("Add", [var, g.scalar(eps)])])
    norm = g.add("Div", [d, std])
    sc = g.init(f"{prefix}.scale", scale)
    bi = g.init(f"{prefix}.bias", bias)
    return g.add("Add", [g.add("Mul", [norm, sc]), bi])


def _gelu(g: _Graph, x: str) -> str:
    """exact GELU: 0.5 · x · (1 + erf(x / √2)) — opset 12 has Erf, not Gelu."""
    e = g.add("Erf", [g.add("Div", [x, g.scalar(np.sqrt(2.0))])])
    return g.add("Mul", [g.add("Mul", [x, g.add("Add", [e, g.scalar(1.0)])]),
                         g.scalar(0.5)])


def _dense(g: _Graph, x: str, p: dict, prefix: str, bias: bool = True) -> str:
    w = g.init(f"{prefix}.kernel", p["kernel"])
    y = g.add("MatMul", [x, w])
    if bias:
        y = g.add("Add", [y, g.init(f"{prefix}.bias", p["bias"])])
    return y


def export_onnx_cvit(model, variables, path: str, opset: int = 12) -> bytes:
    """Serialize the base CViT as ONNX: input 'input' (1,3,224,224) NCHW,
    output 'logits' (1,2) — mirroring the reference export contract. BN is
    folded first (exact reparameterization, compat/fold.py)."""
    from fac_fake_tpu.compat.fold import fold_cvit

    if getattr(model, "stem2_spec", None) is not None or model.use_ggca \
            or model.slot1 is not None or model.embed_block is not None \
            or model.token_block is not None or model.ffn_norm != "ln":
        raise NotImplementedError(
            "ONNX export covers the base CViT (the reference exports only "
            "it, model/pt_to_onnx.py:34-51)")
    model, variables = fold_cvit(model, variables)
    params = _f32(variables["params"])
    g = _Graph()

    x = "input"  # (1, 3, 224, 224) NCHW, ONNX's native conv layout
    li = 0
    for spec_op in model.stem_spec:
        kind = spec_op[0]
        if kind == "conv":
            p = params["stem"][f"l{li}"]
            w = g.init(f"stem.l{li}.kernel",
                       np.transpose(p["kernel"], (3, 2, 0, 1)))  # HWIO→OIHW
            b = g.init(f"stem.l{li}.bias", p["bias"])
            x = g.add("Conv", [x, w, b], kernel_shape=[3, 3],
                      pads=[1, 1, 1, 1], strides=[1, 1])
        elif kind == "relu":
            x = g.add("Relu", [x])
        elif kind == "pool":
            x = g.add("MaxPool", [x], kernel_shape=[2, 2], strides=[2, 2])
        else:
            raise NotImplementedError(f"stem op {kind} in ONNX export")
        if kind not in ("relu", "pool"):
            li += 1
        else:
            li += 1
    # NCHW (1,512,7,7) → NHWC → one 25088-token (patchify h=w=1, p=7:
    # '(p1 p2 c)' ordering == NHWC flatten)
    x = g.add("Transpose", [x], perm=[0, 2, 3, 1])
    x = g.add("Reshape", [x, g.shape_of([1, 1, 7 * 7 * 512])])
    x = _dense(g, x, params["patch_to_embedding"], "patch_to_embedding")

    dim, heads, depth = model.dim, model.heads, model.depth
    cls = g.init("cls_token", params["cls_token"].reshape(1, 1, dim))
    x = g.add("Concat", [cls, x], axis=1)        # (1, 2, dim)
    # legacy (32,1,dim) batch-indexed pos embedding: batch 1 → row 0
    x = g.add("Add", [x, g.init("pos_embedding",
                                params["pos_embedding"][0:1])])

    tr = params["transformer"]
    hd = dim // heads
    n_tok = 2
    for i in range(depth):
        ln = tr[f"attn_norm{i}"]
        h = _layer_norm(g, x, ln["scale"], ln["bias"], 1e-5, f"attn_norm{i}")
        qkv = _dense(g, h, tr[f"attn{i}"]["to_qkv"], f"attn{i}.to_qkv",
                     bias=False)
        qkv = g.add("Reshape", [qkv, g.shape_of([1, n_tok, 3, heads, hd])])
        qkv = g.add("Transpose", [qkv], perm=[2, 0, 3, 1, 4])  # (3,1,h,n,hd)
        q = g.add("Gather", [qkv, g.index(0)], axis=0)
        k = g.add("Gather", [qkv, g.index(1)], axis=0)
        v = g.add("Gather", [qkv, g.index(2)], axis=0)
        kt = g.add("Transpose", [k], perm=[0, 1, 3, 2])
        # quirk kept: softmax scale is dim**-0.5, not head_dim**-0.5
        dots = g.add("Mul", [g.add("MatMul", [q, kt]),
                             g.scalar(dim ** -0.5)])
        attn = g.add("Softmax", [dots], axis=3)
        ctx = g.add("MatMul", [attn, v])
        ctx = g.add("Transpose", [ctx], perm=[0, 2, 1, 3])
        ctx = g.add("Reshape", [ctx, g.shape_of([1, n_tok, dim])])
        x = g.add("Add", [x, _dense(g, ctx, tr[f"attn{i}"]["to_out"],
                                    f"attn{i}.to_out")])

        ln = tr[f"ffn_norm{i}"]
        h = _layer_norm(g, x, ln["scale"], ln["bias"], 1e-5, f"ffn_norm{i}")
        h = _dense(g, h, tr[f"ffn{i}"]["fc1"], f"ffn{i}.fc1")
        h = _gelu(g, h)
        h = _dense(g, h, tr[f"ffn{i}"]["fc2"], f"ffn{i}.fc2")
        x = g.add("Add", [x, h])

    x = g.add("Gather", [x, g.index(0)], axis=1)   # cls token (1, dim)
    x = _dense(g, x, params["mlp_head"]["fc1"], "mlp_head.fc1")
    x = g.add("Relu", [x])
    g.nodes.append(op.node_proto(
        "MatMul", [x, g.init("mlp_head.fc2.kernel",
                             params["mlp_head"]["fc2"]["kernel"])], ["pre_logits"]))
    g.nodes.append(op.node_proto(
        "Add", ["pre_logits", g.init("mlp_head.fc2.bias",
                                     params["mlp_head"]["fc2"]["bias"])],
        ["logits"]))

    graph = op.graph_proto(
        g.nodes, "cvit", g.inits,
        inputs=[op.value_info("input", (1, 3, 224, 224))],
        outputs=[op.value_info("logits", (1, model.num_classes))])
    blob = op.model_proto(graph, opset=opset)
    with open(path, "wb") as f:
        f.write(blob)
    return blob


# --- numpy/lax evaluator -----------------------------------------------------

def _conv(x, w, b, attrs):
    import jax
    pt, pl, pb, pr = attrs.get("pads", [0, 0, 0, 0])
    y = jax.lax.conv_general_dilated(
        x, w, tuple(attrs.get("strides", [1, 1])), ((pt, pb), (pl, pr)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return np.asarray(y) + b.reshape(1, -1, 1, 1)


def _maxpool(x, attrs):
    import jax
    kh, kw = attrs["kernel_shape"]
    sh, sw = attrs["strides"]
    y = jax.lax.reduce_window(x, -np.inf, jax.lax.max,
                              (1, 1, kh, kw), (1, 1, sh, sw), "VALID")
    return np.asarray(y)


def run_onnx(model: Dict, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute a parsed model (onnx_proto.parse_model) with numpy — the
    in-repo verification backend (no onnxruntime in this image)."""
    from jax.scipy.special import erf

    g = model["graph"]
    env: Dict[str, np.ndarray] = dict(g["initializers"])
    env.update(feeds)
    for node in g["nodes"]:
        i = [env[n] for n in node["inputs"]]
        a = node["attrs"]
        t = node["op"]
        if t == "Conv":
            out = _conv(i[0], i[1], i[2], a)
        elif t == "MaxPool":
            out = _maxpool(i[0], a)
        elif t == "Relu":
            out = np.maximum(i[0], 0)
        elif t == "Add":
            out = i[0] + i[1]
        elif t == "Sub":
            out = i[0] - i[1]
        elif t == "Mul":
            out = i[0] * i[1]
        elif t == "Div":
            out = i[0] / i[1]
        elif t == "Sqrt":
            out = np.sqrt(i[0])
        elif t == "Erf":
            out = np.asarray(erf(i[0]))
        elif t == "MatMul":
            out = np.matmul(i[0], i[1])
        elif t == "ReduceMean":
            axes = tuple(a["axes"])
            out = np.mean(i[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))
        elif t == "Softmax":
            ax = a.get("axis", -1)
            assert ax in (-1, i[0].ndim - 1), "evaluator: last-axis softmax only"
            e = np.exp(i[0] - i[0].max(axis=-1, keepdims=True))
            out = e / e.sum(axis=-1, keepdims=True)
        elif t == "Transpose":
            out = np.transpose(i[0], a["perm"])
        elif t == "Reshape":
            out = i[0].reshape([int(d) for d in i[1]])
        elif t == "Concat":
            out = np.concatenate(i, axis=a["axis"])
        elif t == "Gather":
            out = np.take(i[0], i[1], axis=a.get("axis", 0))
        else:
            raise NotImplementedError(f"evaluator op {t}")
        env[node["outputs"][0]] = out
    return {o["name"]: env[o["name"]] for o in g["outputs"]}


def main(argv=None):
    """CLI: `python -m fac_fake_tpu.compat.onnx_export out.onnx [--model cvit]`
    — export a fresh or checkpoint-loaded CViT (pt_to_onnx.py equivalent)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("output")
    ap.add_argument("--model", default="cvit")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference .pth to load before exporting")
    args = ap.parse_args(argv)

    model = build_model(ModelConfig(name=args.model))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    if args.torch_ckpt:
        from fac_fake_tpu.compat.torch_weights import (convert_cvit,
                                                       load_torch_state_dict)
        variables = convert_cvit(load_torch_state_dict(args.torch_ckpt),
                                 variables, args.model)
    blob = export_onnx_cvit(model, variables, args.output)
    print(f"wrote {args.output} ({len(blob)} bytes, opset 12)")


if __name__ == "__main__":
    main()
