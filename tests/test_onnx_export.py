"""ONNX export round trip: serialize → parse → numpy-execute → match JAX.

No onnx/onnxruntime in this image (SURVEY.md C6), so verification is the
in-repo round trip through the independent reader + evaluator — which also
checks that the emitted wire format is self-consistent and the graph is
topologically executable node by node.
"""
import os

import numpy as np


def test_onnx_roundtrip_matches_jax(tmp_path):
    import jax
    import jax.numpy as jnp

    from fac_fake_tpu.compat.onnx_export import export_onnx_cvit, run_onnx
    from fac_fake_tpu.compat.onnx_proto import parse_model
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))

    path = os.path.join(tmp_path, "cvit.onnx")
    blob = export_onnx_cvit(model, variables, path)
    assert os.path.getsize(path) == len(blob) > 1_000_000  # weights embedded

    parsed = parse_model(path)
    assert parsed["opset"] == 12 and parsed["ir_version"] == 7
    g = parsed["graph"]
    assert g["inputs"][0] == {"name": "input", "shape": [1, 3, 224, 224]}
    assert g["outputs"][0] == {"name": "logits", "shape": [1, 2]}
    ops = {n["op"] for n in g["nodes"]}
    # opset-12 vocabulary only (no LayerNormalization/Gelu, which are newer)
    assert ops <= {"Conv", "Relu", "MaxPool", "Transpose", "Reshape", "MatMul",
                   "Add", "Sub", "Mul", "Div", "Sqrt", "ReduceMean", "Softmax",
                   "Erf", "Concat", "Gather"}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 224, 224), dtype=np.float32)
    got = run_onnx(parsed, {"input": x})["logits"]

    want = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_onnx_export_rejects_unsupported_variants():
    import jax
    import jax.numpy as jnp
    import pytest

    from fac_fake_tpu.compat.onnx_export import export_onnx_cvit
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model

    model = build_model(ModelConfig(name="cvit_repbn8"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=True)
    with pytest.raises(NotImplementedError):
        export_onnx_cvit(model, variables, "/tmp/never.onnx")
