"""MTCNN weight-import path (cli.import_mtcnn + npz round trip).

Real facenet_pytorch pretrained weights don't exist in this image, so these
tests run the FULL import machinery on stubbed weights — torch replicas of
the facenet_pytorch layer spec saved exactly the way the library ships them
(per-net `pnet.pt`/`rnet.pt`/`onet.pt` state_dict dumps, plus the combined
prefixed form) — proving real weights convert with one command the moment
they exist (`preprocessing/face_detector.py:34-46` is the reference
consumer).
"""
import numpy as np
import pytest

from fac_fake_tpu.detect.mtcnn import (MTCNN, convert_mtcnn, load_mtcnn_npz,
                                       save_mtcnn_npz,
                                       validate_mtcnn_variables)
from tests.test_mtcnn import _sd, _torch_onet, _torch_pnet, _torch_rnet


@pytest.fixture(scope="module")
def torch_nets():
    import torch
    torch.manual_seed(3)
    return _torch_pnet(), _torch_rnet(), _torch_onet()


def test_npz_round_trip_preserves_tree(torch_nets, tmp_path):
    tp, tr, to = torch_nets
    variables = convert_mtcnn(
        {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)})
    path = str(tmp_path / "cascade.npz")
    save_mtcnn_npz(variables, path)
    loaded = load_mtcnn_npz(path)
    import jax
    flat_a = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
              jax.tree_util.tree_leaves_with_path(variables)}
    flat_b = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
              jax.tree_util.tree_leaves_with_path(loaded)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_import_cli_per_net_files(torch_nets, tmp_path):
    """The facenet_pytorch on-disk form: three per-net .pt dumps → one
    .npz whose cascade detects identically to a direct conversion."""
    import torch
    from fac_fake_tpu.cli.import_mtcnn import main
    tp, tr, to = torch_nets
    for name, net in (("pnet", tp), ("rnet", tr), ("onet", to)):
        torch.save(net.state_dict(), str(tmp_path / f"{name}.pt"))
    out = str(tmp_path / "cascade.npz")
    main([out,
          "--pnet", str(tmp_path / "pnet.pt"),
          "--rnet", str(tmp_path / "rnet.pt"),
          "--onet", str(tmp_path / "onet.pt")])

    direct = convert_mtcnn(
        {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)})
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    got = MTCNN(variables=load_mtcnn_npz(out)).detect(img)
    want = MTCNN(variables=direct).detect(img)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_import_cli_combined_state_dict(torch_nets, tmp_path):
    import torch
    from fac_fake_tpu.cli.import_mtcnn import main
    tp, tr, to = torch_nets
    sd = {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)}
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(tmp_path / "mtcnn.pt"))
    out = str(tmp_path / "cascade.npz")
    main([out, "--pt", str(tmp_path / "mtcnn.pt")])
    loaded = load_mtcnn_npz(out)
    direct = convert_mtcnn(sd)
    import jax
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(direct),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_cli_missing_args(tmp_path):
    from fac_fake_tpu.cli.import_mtcnn import main
    with pytest.raises(SystemExit):
        main([str(tmp_path / "out.npz"), "--pnet", "only_one.pt"])


def test_validate_rejects_wrong_shapes(torch_nets):
    tp, tr, to = torch_nets
    variables = convert_mtcnn(
        {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)})
    bad = {**variables, "pnet": {"params": {
        **variables["pnet"]["params"],
        "conv1": {"kernel": np.zeros((3, 3, 3, 11), np.float32),
                  "bias": np.zeros((11,), np.float32)}}}}
    with pytest.raises(ValueError, match="conv1"):
        validate_mtcnn_variables(bad)
    missing = {k: v for k, v in variables.items() if k != "onet"}
    with pytest.raises(ValueError, match="missing"):
        validate_mtcnn_variables(missing)


def test_scorer_consumes_npz_weights(torch_nets, tmp_path):
    """infer.mtcnn_weights feeds the predict pipeline's detector — the one
    command away contract end to end."""
    tp, tr, to = torch_nets
    variables = convert_mtcnn(
        {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)})
    path = str(tmp_path / "cascade.npz")
    save_mtcnn_npz(variables, path)

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer
    from fac_fake_tpu.models.cvit import CViT

    spec = tuple()
    for ch in (8, 8, 8, 8, 8):
        spec += (("conv", ch), ("bn", ch), ("relu",), ("pool",))
    model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                 mlp_dim=64)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    cfg.infer.detector = "mtcnn"
    cfg.infer.mtcnn_weights = path
    scorer = VideoScorer(model, vs, cfg)
    det = scorer.detector
    img = np.random.default_rng(1).integers(
        0, 255, (96, 128, 3), dtype=np.uint8)
    got = det.detect(img)
    want = MTCNN(variables=variables).detect(img)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
