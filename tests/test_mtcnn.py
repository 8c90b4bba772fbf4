"""MTCNN cascade tests.

facenet_pytorch (and its pretrained weights) are absent from this
environment, so the golden surface is the net *architectures*: torch
replicas built to the facenet_pytorch layer spec (valid-padding convs,
ceil-mode pools, per-channel PReLU, NCHW permute-flatten) are random-init'd,
converted through `convert_mtcnn`, and must agree to float precision —
proving real pretrained weights would reproduce library outputs. Cascade
mechanics (pyramid schedule, cell decode, NMS modes, bbreg/rerec) are
unit-tested against hand calculations.
"""
import numpy as np
import pytest

from fac_fake_tpu.detect.mtcnn import (MTCNN, bbreg, convert_mtcnn,
                                       decode_pnet_boxes, hard_nms,
                                       pyramid_scales, rerec)


# --- torch architecture replicas (facenet_pytorch layer spec) ---------------

def _torch_pnet():
    import torch.nn as tnn

    class TP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 10, 3)
            self.prelu1 = tnn.PReLU(10)
            self.pool1 = tnn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv2 = tnn.Conv2d(10, 16, 3)
            self.prelu2 = tnn.PReLU(16)
            self.conv3 = tnn.Conv2d(16, 32, 3)
            self.prelu3 = tnn.PReLU(32)
            self.conv4_1 = tnn.Conv2d(32, 2, 1)
            self.conv4_2 = tnn.Conv2d(32, 4, 1)

        def forward(self, x):
            import torch
            x = self.prelu1(self.conv1(x))
            x = self.pool1(x)
            x = self.prelu2(self.conv2(x))
            x = self.prelu3(self.conv3(x))
            return self.conv4_2(x), torch.softmax(self.conv4_1(x), dim=1)
    return TP()


def _torch_rnet():
    import torch.nn as tnn

    class TR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 28, 3)
            self.prelu1 = tnn.PReLU(28)
            self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = tnn.Conv2d(28, 48, 3)
            self.prelu2 = tnn.PReLU(48)
            self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = tnn.Conv2d(48, 64, 2)
            self.prelu3 = tnn.PReLU(64)
            self.dense4 = tnn.Linear(576, 128)
            self.prelu4 = tnn.PReLU(128)
            self.dense5_1 = tnn.Linear(128, 2)
            self.dense5_2 = tnn.Linear(128, 4)

        def forward(self, x):
            import torch
            x = self.pool1(self.prelu1(self.conv1(x)))
            x = self.pool2(self.prelu2(self.conv2(x)))
            x = self.prelu3(self.conv3(x))
            x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
            x = self.prelu4(self.dense4(x))
            return self.dense5_2(x), torch.softmax(self.dense5_1(x), dim=1)
    return TR()


def _torch_onet():
    import torch.nn as tnn

    class TO(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 32, 3)
            self.prelu1 = tnn.PReLU(32)
            self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = tnn.Conv2d(32, 64, 3)
            self.prelu2 = tnn.PReLU(64)
            self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = tnn.Conv2d(64, 64, 3)
            self.prelu3 = tnn.PReLU(64)
            self.pool3 = tnn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv4 = tnn.Conv2d(64, 128, 2)
            self.prelu4 = tnn.PReLU(128)
            self.dense5 = tnn.Linear(1152, 256)
            self.prelu5 = tnn.PReLU(256)
            self.dense6_1 = tnn.Linear(256, 2)
            self.dense6_2 = tnn.Linear(256, 4)
            self.dense6_3 = tnn.Linear(256, 10)

        def forward(self, x):
            import torch
            x = self.pool1(self.prelu1(self.conv1(x)))
            x = self.pool2(self.prelu2(self.conv2(x)))
            x = self.pool3(self.prelu3(self.conv3(x)))
            x = self.prelu4(self.conv4(x))
            x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
            x = self.prelu5(self.dense5(x))
            return (self.dense6_2(x), self.dense6_3(x),
                    torch.softmax(self.dense6_1(x), dim=1))
    return TO()


def _sd(prefix, tmodel):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in tmodel.state_dict().items()}


@pytest.fixture(scope="module")
def converted():
    import torch
    torch.manual_seed(0)
    tp, tr, to = _torch_pnet(), _torch_rnet(), _torch_onet()
    sd = {**_sd("pnet", tp), **_sd("rnet", tr), **_sd("onet", to)}
    return (tp, tr, to), convert_mtcnn(sd)


def test_pnet_architecture_golden(converted):
    import torch
    (tp, _, _), variables = converted
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 37, 51), dtype=np.float32)
    with torch.no_grad():
        treg, tprob = tp(torch.from_numpy(x))
    from fac_fake_tpu.detect.mtcnn import PNet
    reg, prob = PNet().apply(variables["pnet"],
                             np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(reg),
                               treg.numpy().transpose(0, 2, 3, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob),
                               tprob.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_rnet_architecture_golden(converted):
    import torch
    (_, tr, _), variables = converted
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 3, 24, 24), dtype=np.float32)
    with torch.no_grad():
        treg, tprob = tr(torch.from_numpy(x))
    from fac_fake_tpu.detect.mtcnn import RNet
    reg, prob = RNet().apply(variables["rnet"], np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(reg), treg.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), atol=1e-5)


def test_onet_architecture_golden(converted):
    import torch
    (_, _, to), variables = converted
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 3, 48, 48), dtype=np.float32)
    with torch.no_grad():
        treg, tlmk, tprob = to(torch.from_numpy(x))
    from fac_fake_tpu.detect.mtcnn import ONet
    reg, lmk, prob = ONet().apply(variables["onet"],
                                  np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(reg), treg.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk), tlmk.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), atol=1e-5)


# --- cascade mechanics -------------------------------------------------------

def test_pyramid_scales_schedule():
    # independent re-derivation of the torch schedule
    h, w, minsize, factor = 480, 640, 20, 0.709
    m = 12.0 / minsize
    expect, minl = [], min(h, w) * m
    while minl >= 12:
        expect.append(m * factor ** len(expect))
        minl *= factor
    got = pyramid_scales(h, w, minsize, factor)
    np.testing.assert_allclose(got, expect)


def test_decode_pnet_boxes_cell_math():
    probs = np.zeros((5, 7), np.float32)
    probs[2, 3] = 0.9
    reg = np.zeros((5, 7, 4), np.float32)
    scale = 0.5
    boxes, scores, _, valid = decode_pnet_boxes(probs, reg, scale, 0.5, 4)
    assert float(scores[0]) == pytest.approx(0.9)
    assert bool(valid[0]) and not bool(valid[1])
    # q1 = fix((2*cell+1)/scale), q2 = fix((2*cell+12)/scale)
    np.testing.assert_allclose(np.asarray(boxes[0]),
                               [np.fix(7 / 0.5), np.fix(5 / 0.5),
                                np.fix(18 / 0.5), np.fix(16 / 0.5)])


def test_hard_nms_union_and_min():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.ones(3, bool)
    idx, keep = hard_nms(boxes, scores, valid, 0.5, "union", 3)
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2}  # box 1 suppressed by box 0
    # min mode: a tiny box inside a big one has IoU_min ≈ 1 → suppressed
    boxes2 = np.array([[0, 0, 100, 100], [10, 10, 20, 20]], np.float32)
    scores2 = np.array([0.9, 0.8], np.float32)
    idx2, keep2 = hard_nms(boxes2, scores2, np.ones(2, bool), 0.5, "min", 2)
    assert set(np.asarray(idx2)[np.asarray(keep2)].tolist()) == {0}


def test_bbreg_rerec():
    boxes = np.array([[0, 0, 9, 19]], np.float32)
    reg = np.array([[0.1, 0.1, -0.1, -0.1]], np.float32)
    out = np.asarray(bbreg(boxes, reg))
    np.testing.assert_allclose(out, [[1.0, 2.0, 8.0, 17.0]])
    sq = np.asarray(rerec(np.array([[0, 0, 10, 20]], np.float32)))
    assert sq[0, 2] - sq[0, 0] == pytest.approx(sq[0, 3] - sq[0, 1])
    np.testing.assert_allclose(sq, [[-5, 0, 15, 20]])


def test_cascade_runs_padded_and_deterministic():
    det = MTCNN(thresholds=(0.3, 0.3, 0.3), caps=(32, 16, 8), seed=0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    b1, p1, l1, v1 = det.detect(img)
    b2, p2, l2, v2 = det.detect(img)
    assert b1.shape == (8, 4) and l1.shape == (8, 5, 2) and v1.shape == (8,)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(v1, v2)
    # reference preset thresholds construct fine and share the jit cache
    MTCNN(thresholds=(0.85, 0.95, 0.95))
    MTCNN(thresholds=(0.65, 0.75, 0.75))


def test_landmarks_api():
    det = MTCNN(thresholds=(0.0, 0.0, 0.0), caps=(32, 16, 8), seed=1)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    lm = det.landmarks(img)
    if lm is not None:  # random weights may or may not clear NMS
        assert lm.shape == (5, 2)


# --- approximation bounds (mtcnn.py module header) ---------------------------
#
# The two documented divergences from facenet_pytorch — bilinear (not
# INTER_AREA) pyramid resamples, and edge-clamped (not zero-padded) stage
# patches — get NUMERIC bounds here, measured on a real frame through the
# real nets (seeded weights: the bound quantifies how the input delta
# propagates through the convs, which doesn't depend on training).
# Measured 2026-08-17 (PARITY.md "MTCNN cascade" row): P-net prob delta
# mean ≤ 0.0032 / max ≤ 0.048 across the 4 largest pyramid scales;
# top-candidate box IoU = 1.0 at the two largest scales (where real faces
# are detected); patches agree to ≤ 5e-6 wherever the box is in-frame.

def test_pyramid_interpolation_divergence_bounded():
    import cv2
    import jax.numpy as jnp

    from conftest import has_reference
    from fac_fake_tpu.ops.resize import resize_bilinear

    if not has_reference():
        pytest.skip("reference sample video not mounted")
    sample = "/root/reference/CViT-main/sample__prediction_data/aajsqyyjni.mp4"
    cap = cv2.VideoCapture(sample)
    ok, fr = cap.read()
    cap.release()
    assert ok
    img = cv2.resize(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB), (480, 270),
                     interpolation=cv2.INTER_AREA)
    h, w = img.shape[:2]
    m = MTCNN(seed=0)
    imgf = img.astype(np.float32)

    for si, s in enumerate(pyramid_scales(h, w)[:4]):
        hs, ws = int(h * s + 1), int(w * s + 1)
        ours = np.asarray(resize_bilinear(jnp.asarray(imgf)[None],
                                          (hs, ws)))[0]
        area = cv2.resize(img, (ws, hs),
                          interpolation=cv2.INTER_AREA).astype(np.float32)
        no = jnp.asarray((ours - 127.5) * 0.0078125)[None]
        na = jnp.asarray((area - 127.5) * 0.0078125)[None]
        reg1, p1 = m.pnet.apply(m.variables["pnet"], no)
        reg2, p2 = m.pnet.apply(m.variables["pnet"], na)
        d = np.abs(np.asarray(p1) - np.asarray(p2))
        assert d.mean() < 0.01 and d.max() < 0.10, (s, d.mean(), d.max())

        if si < 2:   # the scales that carry real detections
            b1 = np.asarray(decode_pnet_boxes(p1[0, :, :, 1], reg1[0],
                                              s, 0.0, 16)[0])[0]
            b2 = np.asarray(decode_pnet_boxes(p2[0, :, :, 1], reg2[0],
                                              s, 0.0, 16)[0])[0]
            ix = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]) + 1)
            iy = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]) + 1)
            a1 = (b1[2] - b1[0] + 1) * (b1[3] - b1[1] + 1)
            a2 = (b2[2] - b2[0] + 1) * (b2[3] - b2[1] + 1)
            iou = ix * iy / (a1 + a2 - ix * iy)
            assert iou >= 0.8, (s, iou, b1, b2)


def test_patch_extraction_matches_zero_pad_in_frame():
    """Edge-clamp vs facenet_pytorch's zero-pad: identical wherever the box
    is inside the frame; divergence is confined to out-of-frame rows/cols
    and bounded by the normalized intensity range."""
    import cv2
    import jax.numpy as jnp

    from fac_fake_tpu.detect.mtcnn import _extract_patches

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    boxes = jnp.asarray([[-10.0, -10.0, 30.0, 30.0],    # 25% out of frame
                         [10.0, 10.0, 50.0, 50.0]])     # fully in frame
    ours = np.asarray(_extract_patches(jnp.asarray(img), boxes, 24))

    def zero_pad_ref(b):
        x1, y1, x2, y2 = (int(v) for v in b)
        pad = 20
        big = np.zeros((64 + 2 * pad, 64 + 2 * pad, 3), np.float32)
        big[pad:pad + 64, pad:pad + 64] = img
        crop = big[y1 + pad:y2 + 1 + pad, x1 + pad:x2 + 1 + pad]
        return (cv2.resize(crop, (24, 24), interpolation=cv2.INTER_LINEAR)
                - 127.5) * 0.0078125

    # in-frame box: bit-level agreement with the zero-pad reference
    np.testing.assert_allclose(ours[1], zero_pad_ref(boxes[1]), atol=1e-4)
    d = np.abs(ours[0] - zero_pad_ref(boxes[0]))
    # the in-frame interior of a partially-out box still agrees...
    assert d[10:, 10:].max() < 1e-4, d[10:, 10:].max()
    # ...and the clamped region stays within the normalized intensity range
    assert d.max() <= 255 * 0.0078125, d.max()
