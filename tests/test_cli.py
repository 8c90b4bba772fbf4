"""End-to-end CLI entry-point tests (`python -m fac_fake_tpu.cli.*`).

The reference's entry points are standalone scripts with hard-coded paths
(SURVEY.md §L6); ours are the four CLIs. These tests call each `main(argv)`
in-process on the CPU mesh with tiny inputs — argument plumbing, config
overrides, file outputs.
"""
import json
import os

import numpy as np
import pytest

SAMPLES = "/root/reference/CViT-main/sample__prediction_data"


def _make_crop_tree(root, n=6, size=224):
    import cv2
    rng = np.random.default_rng(0)
    for split in ("train", "validation", "test"):
        for label in ("fake", "real"):
            d = root / split / label
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)


def test_train_cli_end_to_end(tmp_path, capsys):
    from fac_fake_tpu.cli.train import main
    _make_crop_tree(tmp_path / "data")
    ck = tmp_path / "ck"
    hist = tmp_path / "hist.pkl"
    main(["--model", "cvit", "--data-root", str(tmp_path / "data"),
          "--epochs", "1", "--batch-size", "8",   # divides the 8-dev mesh
          "--checkpoint-dir", str(ck),
          "--history", str(hist),
          "--set", "model.depth=1", "model.dim=32", "model.mlp_dim=32",
          "model.heads=2", "model.channels=32",
          "train.log_every=0", "data.augment.enabled=False",
          "data.num_workers=1"])
    out = capsys.readouterr().out
    assert "epoch 0" in out
    assert hist.exists() and (str(hist) + ".csv",)
    import pickle
    h = pickle.load(open(hist, "rb"))
    assert len(h) == 4 and len(h[0]) == 1   # [tl, ta, vl, va] × 1 epoch

    # full circle: the best-acc snapshot persisted by training loads back
    # into the inference CLI's variables (TrainState → variables extraction)
    best = ck / "best"
    assert best.is_dir(), os.listdir(ck)
    import jax, jax.numpy as jnp
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model
    from fac_fake_tpu.train.checkpoint import restore_variables
    model = build_model(ModelConfig(name="cvit", depth=1, dim=32, mlp_dim=32,
                                    heads=2, channels=32))
    template = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    variables = restore_variables(str(best), template)
    assert "params" in variables and "batch_stats" in variables
    logits = model.apply(variables, jnp.zeros((1, 224, 224, 3)), train=False)
    assert logits.shape == (1, 2)
    # wrong model must be rejected by the shape check
    other = build_model(ModelConfig(name="cvit", depth=1, dim=16, mlp_dim=16,
                                    heads=2, channels=16))
    t2 = other.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    with pytest.raises(ValueError):
        restore_variables(str(best), t2)


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_predict_cli_end_to_end(tmp_path, capsys):
    from fac_fake_tpu.cli.predict import main
    vd = tmp_path / "videos"
    vd.mkdir()
    import shutil
    shutil.copy2(os.path.join(SAMPLES, "sample_2.mp4"), vd / "sample_2.mp4")
    meta = {"sample_2.mp4": {"label": "FAKE"}}
    mp = tmp_path / "meta.json"
    mp.write_text(json.dumps(meta))
    csv = tmp_path / "preds.csv"
    df = main(["--videos", str(vd), "--save-csv", str(csv),
               "--metadata", str(mp), "--workers", "1",
               "--set", "model.depth=1", "model.dim=32", "model.mlp_dim=32",
               "model.heads=2", "model.channels=32", "infer.batch_crops=32"])
    out = capsys.readouterr().out
    assert csv.exists()
    import pandas as pd
    saved = pd.read_csv(csv)
    assert list(saved.columns) == ["filename", "label"]
    assert saved.iloc[0]["filename"] == "sample_2.mp4"
    assert 0.0 <= float(saved.iloc[0]["label"]) <= 1.0
    assert "accuracy:" in out and "per-video latency" in out


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_preprocess_cli_clips_and_split(tmp_path):
    from fac_fake_tpu.cli.preprocess import main
    vd = tmp_path / "videos"
    vd.mkdir()
    import shutil
    shutil.copy2(os.path.join(SAMPLES, "sample_2.mp4"), vd / "sample_2.mp4")
    out = tmp_path / "clips"
    main(["clips", "--videos", str(vd), "--out", str(out), "--frames", "3"])
    assert (out / "sample_2").is_dir() and os.listdir(out / "sample_2")

    main(["metadata", "--videos", str(vd), "--label", "real",
          "--out", str(tmp_path / "m.json")])
    assert json.load(open(tmp_path / "m.json")) == \
        {"sample_2.mp4": {"label": "REAL"}}


def test_evaluate_cli_csv(tmp_path, capsys):
    from fac_fake_tpu.cli.evaluate import main
    import pandas as pd
    pd.DataFrame({"filename": ["a.mp4", "b.mp4", "c.mp4"],
                  "label": [0.9, 0.1, 0.5]}).to_csv(
        tmp_path / "p.csv", index=False)
    (tmp_path / "m.json").write_text(json.dumps({
        "a.mp4": {"label": "FAKE"}, "b.mp4": {"label": "REAL"},
        "c.mp4": {"label": "REAL"}}))
    main(["csv", "--csv", str(tmp_path / "p.csv"),
          "--metadata", str(tmp_path / "m.json")])
    out = capsys.readouterr().out
    # the 0.5 no-face row is dropped (ROC_AUC_ACC.py recipe): 2 scored, both right
    assert "accuracy: 100.00%" in out and "(2 scored)" in out


def test_evaluate_cli_gradcam_and_plots(tmp_path, capsys):
    """`evaluate gradcam` (figure/gradcam_{cnn,transformer}.py) and
    `evaluate plots` (figure/figure.py) end-to-end: overlays + curve PNG."""
    import pickle

    import cv2
    from fac_fake_tpu.cli.evaluate import main

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 260, 3), dtype=np.uint8)
    img_path = tmp_path / "face.jpg"
    cv2.imwrite(str(img_path), img)

    out_dir = tmp_path / "cams"
    for mode in ("cnn", "tokens"):
        outs = main(["gradcam", "--images", str(img_path), "--mode", mode,
                     "--out-dir", str(out_dir)])
        assert outs == [str(out_dir / "face_cam.png")]
        overlay = cv2.imread(outs[0])
        assert overlay is not None and overlay.shape == (224, 224, 3)

    hist = tmp_path / "h.pkl"
    with open(hist, "wb") as f:
        pickle.dump([[1.0, 0.5], [0.6, 0.8], [1.1, 0.7], [0.5, 0.7]], f)
    out = main(["plots", "--history", str(hist), "--out",
                str(tmp_path / "h.png")])
    assert out == str(tmp_path / "h.png") and os.path.exists(out)


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_serve_cli_end_to_end(tmp_path):
    """Real HTTP round trip: health check, GET ?path= scoring, POST upload."""
    import threading
    import urllib.request

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.cli.serve import serve, build_scorer, parse_args

    args = parse_args(["--set", "model.depth=1", "model.dim=32",
                       "model.mlp_dim=32", "model.heads=2",
                       "model.channels=32", "infer.batch_crops=32"])
    scorer = build_scorer(args)
    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve,
        args=(["--port", "0", "--no-warmup"],),
        kwargs=dict(scorer=scorer, ready_event=ready, server_box=box),
        daemon=True)
    t.start()
    assert ready.wait(60)
    port = box[0].server_address[1]
    base = f"http://127.0.0.1:{port}"

    try:
        h = json.load(urllib.request.urlopen(f"{base}/health", timeout=30))
        assert h["status"] == "ok"

        video = os.path.join(SAMPLES, "sample_2.mp4")
        r = json.load(urllib.request.urlopen(
            f"{base}/score?path={video}", timeout=300))
        assert r["filename"] == "sample_2.mp4"
        assert 0.0 <= r["prob"] <= 1.0
        assert r["label"] in ("FAKE", "REAL")
        assert r["num_crops"] > 0

        # POST the raw bytes — same video, must give the same prob
        req = urllib.request.Request(
            f"{base}/score", data=open(video, "rb").read(), method="POST")
        r2 = json.load(urllib.request.urlopen(req, timeout=300))
        assert abs(r2["prob"] - r["prob"]) < 1e-6

        # bad path → 400
        try:
            urllib.request.urlopen(f"{base}/score?path=/nope.mp4", timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        box[0].shutdown()


def test_serve_video_root_allowlist(tmp_path):
    """GET /score?path= outside --video-root → 403; non-loopback bind
    without --video-root/--allow-any-path is refused outright
    (`cli/serve.py:169-174`)."""
    import threading
    import urllib.error
    import urllib.request

    from fac_fake_tpu.cli.serve import serve, build_scorer, parse_args

    args = parse_args(["--set", "model.depth=1", "model.dim=32",
                       "model.mlp_dim=32", "model.heads=2",
                       "model.channels=32", "infer.batch_crops=32"])
    scorer = build_scorer(args)
    root = tmp_path / "videos"
    root.mkdir()
    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve,
        args=(["--port", "0", "--no-warmup", "--video-root", str(root)],),
        kwargs=dict(scorer=scorer, ready_event=ready, server_box=box),
        daemon=True)
    t.start()
    assert ready.wait(60)
    port = box[0].server_address[1]
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/score?path=/etc/hostname",
                timeout=30)
        assert ei.value.code == 403
    finally:
        box[0].shutdown()

    # non-loopback bind without an allowlist refuses to start
    with pytest.raises(SystemExit):
        serve(["--host", "0.0.0.0", "--port", "0"], scorer=scorer)


def test_export_cli_all_formats(tmp_path, capsys):
    """One front door for every export artifact: onnx round-trips through
    the independent evaluator, stablehlo reloads and matches, torch saves a
    reference-layout state_dict, orbax restores bit-exact."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.cli.export import main

    onnx_path = tmp_path / "m.onnx"
    main(["onnx", str(onnx_path), "--model", "cvit"])
    assert onnx_path.stat().st_size > 1000

    shlo = tmp_path / "m.shlo"
    main(["stablehlo", str(shlo), "--model", "cvit"])
    from fac_fake_tpu.compat.export import load_stablehlo
    from fac_fake_tpu.core.config import ModelConfig
    from fac_fake_tpu.models import build_model
    model = build_model(ModelConfig(name="cvit"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    x = jax.random.normal(jax.random.key(1), (1, 224, 224, 3))
    got = load_stablehlo(str(shlo))(jax.device_get(variables), x)
    want = model.apply(variables, x, train=False)
    assert jnp.allclose(got[0] if isinstance(got, (tuple, list)) else got,
                        want, atol=1e-5)

    pth = tmp_path / "m.pth"
    main(["torch", str(pth), "--model", "cvit"])
    import torch
    sd = torch.load(str(pth), map_location="cpu", weights_only=True)
    assert any(k.endswith("weight") for k in sd)

    ock = tmp_path / "ock"
    main(["orbax", str(ock), "--model", "cvit"])
    from fac_fake_tpu.train.checkpoint import restore_variables
    restored = restore_variables(str(ock), variables)
    flat_a = jax.tree.leaves(restored)
    flat_b = jax.tree.leaves(variables)
    assert all(jnp.array_equal(a, b) for a, b in zip(flat_a, flat_b))

    out = capsys.readouterr().out
    assert "opset 12" in out and "orbax checkpoint" in out
