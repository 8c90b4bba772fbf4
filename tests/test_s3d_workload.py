"""S3D workload: plan configs, clip dataset, masking, utils, evaluator."""
import json
import os

import numpy as np
import pytest

from conftest import requires_reference


def test_plan_loader_matches_reference_schema(tmp_path):
    plan = tmp_path / "caplan9.yaml"
    plan.write_text(
        "training:\n  lr: 0.001\n  weight-decay: 0.0000001\n  bs: 12\n"
        "  gamma: 0.1\n  step-size: 15\n  rebalancing_fake: 0.3\n"
        "  rebalancing_real: 1\n  frames-per-video: 30\n"
        "  mask-method: 'black'\n  mask-number: 6\n  picture-color: 'gray'\n"
        "  aug: 'yes'\nmodel:\n  image-size: 224\n  SRM-net: 'yes'\n")
    from fac_fake_tpu.core.plans import load_plan, model_for_plan
    cfg = load_plan(str(plan))
    assert cfg.model.name == "ca_s3d" and cfg.model.srm_net
    assert cfg.data.batch_size == 12 and cfg.data.frames_per_video == 30
    assert cfg.data.mask_method == "black" and cfg.data.mask_number == 6
    assert cfg.data.augment.enabled and cfg.data.augment.to_gray
    assert cfg.train.optim.lr == 0.001 and cfg.train.loss == "bce_weighted"
    assert model_for_plan("mplan9_3.yaml") == "msca_s3d"
    assert model_for_plan("plan12.yaml") == "s3d"


def test_s3d_utils_semantics():
    from fac_fake_tpu.utils.s3d import (custom_round, custom_video_round,
                                        shuffle_dataset)
    assert custom_video_round([0.2, 0.7, 0.9]) == 0.7   # first >0.5 wins
    assert custom_video_round([0.2, 0.3]) == pytest.approx(0.25)
    assert list(custom_round([0.2, 0.6])) == [0, 1]
    a = shuffle_dataset(list(range(10)))
    b = shuffle_dataset(list(range(10)))
    assert a == b  # seed 4 determinism


def test_mask_regions_geometry():
    from fac_fake_tpu.data.masking import apply_face_mask, mask_regions
    lm = np.array([[70, 90], [150, 90], [112, 130], [85, 170], [140, 170]],
                  np.float32)
    regions = mask_regions(224, 224, lm)
    assert len(regions) == 8
    img = np.full((224, 224, 3), 200, np.uint8)
    out = apply_face_mask(img, lm, list(range(8)), "black", 4)
    assert (out == 0).any() and (out == 200).any()
    out2 = apply_face_mask(img, lm, list(range(8)), "noise", 2,
                           rng=np.random.default_rng(0))
    assert not np.array_equal(out2, img)
    # no landmarks -> untouched
    assert np.array_equal(apply_face_mask(img, None, [0], "black", 4), img)


def test_landmarks_from_blazeface_image_order_and_mouth_scale():
    """The BlazeFace→5-point adapter must return IMAGE-ordered eyes
    (l_eye.x < r_eye.x — what `mask_regions` means by 'left') and
    face-relative mouth corners (±0.4× interocular), regardless of which
    keypoint slot carries which eye. Round-5 regression: the pre-fix adapter
    swapped the eyes and used ±15% of the FRAME width for the mouth — the
    real-landmark mask harness measured a 0% geometry-sanity rate."""
    from fac_fake_tpu.data.masking import landmarks_from_blazeface

    class StubDet:
        def __init__(self, kp01):
            self.kp01 = kp01     # normalized (x, y) pairs for 6 keypoints

        def predict_on_batch(self, tiles):
            face = np.zeros((1, 17), np.float32)
            face[0, 4:16] = np.asarray(self.kp01, np.float32).reshape(-1)
            return face[None], np.array([[True]])

    img = np.zeros((200, 400, 3), np.uint8)       # landscape: w=400, h=200
    # keypoint 0 (subject's right eye) on the image LEFT, kp1 on the right
    kp = [[0.30, 0.40], [0.50, 0.40], [0.40, 0.50],
          [0.40, 0.60], [0.1, 0.4], [0.7, 0.4]]
    lm = landmarks_from_blazeface(StubDet(kp), img)
    assert lm[0][0] < lm[1][0]                    # image order
    np.testing.assert_allclose(lm[0], [120, 80])  # 0.30*400, 0.40*200
    np.testing.assert_allclose(lm[1], [200, 80])
    inter = 80.0                                  # |200-120|
    np.testing.assert_allclose(lm[4][0] - lm[3][0], 0.8 * inter)
    np.testing.assert_allclose([lm[3][1], lm[4][1]], 120, rtol=1e-6)  # mouth y
    # swapped slots (mirrored video): the guard restores image order
    kp_sw = [kp[1], kp[0]] + kp[2:]
    lm2 = landmarks_from_blazeface(StubDet(kp_sw), img)
    np.testing.assert_allclose(lm2, lm)
    # no face
    class NoFace:
        def predict_on_batch(self, tiles):
            return np.zeros((1, 1, 17)), np.array([[False]])
    assert landmarks_from_blazeface(NoFace(), img) is None


def test_mask_regions_68_geometry():
    """68-landmark variant (`get_masked_face.py:24-43`): hand-check the eye
    box padding math and the 3-region masking behavior."""
    from fac_fake_tpu.data.masking import (apply_face_mask_68,
                                           interpolate_68_from_5,
                                           mask_regions_68)
    import math
    lm5 = np.array([[70, 90], [150, 90], [112, 130], [85, 170], [140, 170]],
                   np.float32)
    p68 = interpolate_68_from_5(lm5, 224, 224)
    regions = mask_regions_68(224, 224, p68)
    assert len(regions) == 8
    # region 1 right edge = left_eye_left = ceil(x36 - (x39-x36)*0.1)
    expect_lel = math.ceil(p68[36, 0] - (p68[39, 0] - p68[36, 0]) * 0.1)
    assert regions[0][3] == expect_lel
    img = np.full((224, 224, 3), 200, np.uint8)
    out = apply_face_mask_68(img, p68, list(range(8)), "black68")
    assert (out == 0).any() and (out == 200).any()
    # exactly 3 regions masked: the 4th listed region stays untouched
    y0, y1, x0, x1 = regions[3]
    assert (out[y0:y1, x0:x1] == 200).all()
    out2 = apply_face_mask_68(img, p68, list(range(8)), "noise68",
                              rng=np.random.default_rng(0))
    assert not np.array_equal(out2, img)
    assert np.array_equal(apply_face_mask_68(img, None, [0], "black68"), img)


def _make_crop_tree(root, n_videos=4, n_crops=24, size=32):
    import cv2
    meta = {}
    for i in range(n_videos):
        vid = f"vid{i}"
        d = os.path.join(root, vid)
        os.makedirs(d)
        for j in range(n_crops):
            img = np.full((size, size, 3), 10 * i + j, np.uint8)
            cv2.imwrite(os.path.join(d, f"{j:03d}.png"), img)
        meta[vid] = {"label": "FAKE" if i % 2 else "REAL"}
    mpath = os.path.join(root, "metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)
    return mpath


def test_clip_dataset_batches(tmp_path):
    from fac_fake_tpu.data.clips import ClipDataset, discover_video_folders
    mpath = _make_crop_tree(str(tmp_path))
    samples = discover_video_folders(str(tmp_path), mpath)
    assert len(samples) == 4
    assert {s[1] for s in samples} == {0, 1}

    ds = ClipDataset(samples, frames_per_video=20, image_size=32)
    assert ds.pos_weight() == pytest.approx(1.0)
    batches = list(ds.batches(2, shuffle=False, num_workers=2))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 20, 32, 32, 3)
    assert batches[0]["image"].dtype == np.uint8


def test_s3d_training_smoke(tmp_path):
    """One epoch of BCE training on tiny synthetic clips through the shared
    Trainer (raw255 normalization, single-logit loss)."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.models.s3d.model import S3DNet
    from fac_fake_tpu.train.trainer import Trainer

    spec = (("sep", 8, 3, 2, 1, "relu", True),
            ("pool", (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            ("basic", 16, 1, 1, 0, "relu"))
    model = S3DNet(spec=spec, num_class=1)

    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.normalize = "raw255"
    cfg.data.augment.enabled = False
    cfg.train.loss = "bce_weighted"
    cfg.train.epochs = 2
    cfg.train.log_every = 0
    cfg.train.checkpoint_every = 0
    trainer = Trainer(model, cfg, loss_kwargs={"pos_weight": 1.5},
                      input_shape=(1, 4, 16, 16, 3))

    rng = np.random.default_rng(0)
    def batch():
        labels = rng.integers(0, 2, 8).astype(np.int32)
        clips = np.clip(rng.normal(60 + 120 * labels[:, None, None, None, None],
                                   20, (8, 4, 16, 16, 3)), 0, 255).astype(np.uint8)
        return {"image": clips, "label": labels,
                "mask": np.ones(8, np.float32)}
    batches = [batch() for _ in range(6)]
    out = trainer.fit(lambda e: iter(batches))
    h = out["history"]
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_ca_s3d_trains_on_mesh_with_global_bn():
    """The reference's ONLY distributed trainer is the S3D DDP one
    (`S3D-train-GPUs.py:330-331`: SyncBatchNorm.convert_sync_batchnorm +
    DDP wrap). The equivalent guarantee here: one REAL `ca_s3d` train step
    on the 8-device dp×tp mesh must produce finite loss and batch_stats
    numerically identical to the same step on a single device — i.e. every
    BN3D statistic is computed over the GLOBAL batch, not per shard."""
    import jax
    from fac_fake_tpu.core.config import Config, MeshConfig
    from fac_fake_tpu.models import build_model
    from fac_fake_tpu.parallel.mesh import build_mesh
    from fac_fake_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = "ca_s3d"
    cfg.data.image_size = 32
    cfg.data.normalize = "raw255"
    cfg.data.augment.enabled = False
    cfg.train.loss = "bce_weighted"
    cfg.train.log_every = 0

    rng = np.random.default_rng(0)
    # per-shard brightness staircase: with dp=4 each shard's 2 rows share a
    # brightness band, so per-shard BN means would diverge wildly from the
    # global ones — if the mesh step computed local stats, the comparison
    # below could not pass
    clips = np.zeros((8, 16, 32, 32, 3), np.uint8)
    for i in range(8):
        clips[i] = rng.integers(0, 30, (16, 32, 32, 3)) + i * 28
    batch = {"image": clips, "label": rng.integers(0, 2, 8).astype(np.int32),
             "mask": np.ones(8, np.float32)}

    def one_step(mesh):
        trainer = Trainer(build_model(cfg.model), cfg, mesh=mesh,
                          loss_kwargs={"pos_weight": 1.0},
                          input_shape=(1, 16, 32, 32, 3))
        state = trainer.shard_state(trainer.init_state(seed=0))
        state, metrics = trainer.train_step(state, trainer.put_batch(batch),
                                            jax.random.key(0))
        return (float(jax.device_get(metrics["loss"])),
                jax.device_get(state.batch_stats))

    loss_mesh, bs_mesh = one_step(build_mesh(MeshConfig(data=4, model=2)))
    assert np.isfinite(loss_mesh)

    loss_one, bs_one = one_step(
        build_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1]))
    assert np.isfinite(loss_one)
    assert abs(loss_mesh - loss_one) < 1e-3, (loss_mesh, loss_one)

    flat_mesh = jax.tree_util.tree_leaves_with_path(bs_mesh)
    flat_one = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(bs_one)}
    assert flat_mesh and len(flat_mesh) == len(flat_one)
    for path, leaf in flat_mesh:
        np.testing.assert_allclose(
            leaf, flat_one[jax.tree_util.keystr(path)], rtol=2e-4, atol=2e-5,
            err_msg=f"batch_stats diverged between mesh and single device "
                    f"at {jax.tree_util.keystr(path)}")


def test_s3d_evaluator_and_metrics(tmp_path):
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.data.clips import ClipDataset, discover_video_folders
    from fac_fake_tpu.evaluate.s3d_eval import S3DEvaluator, degrade_frame
    from fac_fake_tpu.models.s3d.model import S3DNet

    img = np.full((64, 64, 3), 128, np.uint8)
    deg = degrade_frame(img, np.random.default_rng(0))
    assert deg.shape == img.shape and not np.array_equal(deg, img)

    mpath = _make_crop_tree(str(tmp_path), n_videos=2)
    samples = discover_video_folders(str(tmp_path), mpath)
    ds = ClipDataset(samples, frames_per_video=4, image_size=32)

    spec = (("sep", 8, 3, 2, 1, "relu", True),
            ("pool", (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            ("basic", 16, 1, 1, 0, "relu"))
    model = S3DNet(spec=spec, num_class=1)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 32, 32, 3)))

    ev = S3DEvaluator(model, variables, degrade=True)
    out = ev.evaluate(ds, out_prefix=str(tmp_path / "roc"), model_name="tiny")
    assert out["count"] == 2 and 0 <= out["accuracy"] <= 1
    assert os.path.exists(str(tmp_path / "roc_fpr.txt"))


def test_s3d_evaluator_int8_serving(tmp_path):
    """quantize="int8": lazy first-batch calibration, predict_batch probs
    track the fp evaluator, predict_video stays in [0,1] — the served form
    of the b32 +21% bench win (README "S3D performance")."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.evaluate.s3d_eval import S3DEvaluator
    from fac_fake_tpu.models.s3d.model import S3DNet

    spec = (("sep", 8, 3, 2, 1, "relu", True),
            ("pool", (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            ("basic", 16, 1, 1, 0, "relu"),
            ("mix", "3b", "relu", True))
    model = S3DNet(spec=spec, num_class=1)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 32, 32, 3)))

    fp = S3DEvaluator(model, variables, degrade=False)
    q = S3DEvaluator(model, variables, degrade=False, quantize="int8")
    assert q._engine is None                       # lazy until first batch

    clips = np.random.default_rng(0).integers(
        0, 255, (4, 4, 32, 32, 3), dtype=np.uint8)
    p_fp = fp.predict_batch(clips)
    p_q = q.predict_batch(clips)
    assert q._engine is not None
    assert p_q.shape == p_fp.shape == (4,)
    np.testing.assert_allclose(p_q, p_fp, atol=0.05)   # PTQ noise on sigmoid

    v = q.predict_video(clips[0])
    assert 0.0 <= v <= 1.0
    with pytest.raises(ValueError):
        S3DEvaluator(model, variables, quantize="fp8")


def test_prediction_csv_metrics(tmp_path):
    import pandas as pd
    pd.DataFrame({"filename": ["a.mp4", "b.mp4", "c.mp4"],
                  "label": [0.9, 0.1, 0.5]}).to_csv(tmp_path / "p.csv",
                                                    index=False)
    meta = {"a.mp4": {"label": "FAKE"}, "b.mp4": {"label": "REAL"},
            "c.mp4": {"label": "REAL"}}
    with open(tmp_path / "m.json", "w") as f:
        json.dump(meta, f)
    from fac_fake_tpu.evaluate.metrics import evaluate_prediction_csv
    out = evaluate_prediction_csv(str(tmp_path / "p.csv"),
                                  str(tmp_path / "m.json"))
    assert out["count"] == 2  # 0.5 no-face row dropped
    assert out["accuracy"] == 1.0 and out["auc"] == 1.0


def test_prediction_csv_metrics_single_class(tmp_path):
    """Single-class joins (e.g. an all-FAKE directory) must report NaN AUC
    with an explicit note, not sklearn's warning + meaningless value."""
    import warnings

    import pandas as pd
    pd.DataFrame({"filename": ["a.mp4", "b.mp4"],
                  "label": [0.9, 0.8]}).to_csv(tmp_path / "p.csv",
                                               index=False)
    meta = {"a.mp4": {"label": "FAKE"}, "b.mp4": {"label": "FAKE"}}
    with open(tmp_path / "m.json", "w") as f:
        json.dump(meta, f)
    from fac_fake_tpu.evaluate.metrics import evaluate_prediction_csv
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # any sklearn warning fails the test
        out = evaluate_prediction_csv(str(tmp_path / "p.csv"),
                                      str(tmp_path / "m.json"))
    assert out["count"] == 2 and out["accuracy"] == 1.0
    assert np.isnan(out["auc"]) and "one class" in out["note"]


def test_gradcam_smoke():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.evaluate.gradcam import (center_crop_img, gradcam,
                                               show_cam_on_image)
    from helpers import tiny_cvit

    model = tiny_cvit(pos_mode="patch")
    x = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 255, (2, 224, 224, 3)).astype(np.float32) / 255)
    variables = model.init(jax.random.key(0), x)
    cams = gradcam(model, variables, x)
    assert cams.shape == (2, 7, 7)
    assert cams.min() >= 0 and cams.max() <= 1.0 + 1e-6

    overlay = show_cam_on_image(np.asarray(x[0]), cams[0])
    assert overlay.shape == (224, 224, 3)
    cropped = center_crop_img(np.zeros((100, 160, 3), np.uint8), 64)
    assert cropped.shape == (64, 64, 3)


def test_gradcam_tokens_smoke():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.evaluate.gradcam import gradcam_tokens
    from fac_fake_tpu.models.cvit import CViT

    # 4-pool stem -> 14x14 feature, patch 7 -> 4 patches (2x2 grid)
    spec = ()
    for _ in range(4):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    model = CViT(stem_spec=spec, dim=32, depth=1, heads=2, mlp_dim=32,
                 pos_mode="patch")
    x = jnp.asarray(np.random.default_rng(0)
                    .random((2, 224, 224, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    cams = gradcam_tokens(model, variables, x)
    assert cams.shape == (2, 2, 2)
