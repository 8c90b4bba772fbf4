"""BlazeFace parity vs the reference torch implementation with the real
in-repo weights (`helpers/blazeface.pth` + `anchors.npy`)."""
import sys

import numpy as np
import pytest

from conftest import requires_reference

REF_HELPERS = "/root/reference/CViT-main/helpers"


def _ref_blazeface():
    import torch
    sys.path.insert(0, REF_HELPERS)
    import importlib
    mod = importlib.import_module("blazeface")
    sys.path.remove(REF_HELPERS)
    net = mod.BlazeFace()
    net.load_weights(f"{REF_HELPERS}/blazeface.pth")
    net.load_anchors(f"{REF_HELPERS}/anchors.npy")
    return net


@requires_reference
def test_blazeface_raw_detections_match():
    net = _ref_blazeface()
    rng = np.random.default_rng(0)
    # structured input so some anchors clear the 0.75 threshold on real weights
    x = rng.integers(0, 255, (4, 128, 128, 3), dtype=np.uint8)

    ref_dets = net.predict_on_batch(x.copy(), apply_nms=False)

    from fac_fake_tpu.detect.blazeface import BlazeFace
    det = BlazeFace.from_reference_assets()
    dets, valid = det.predict_on_batch(x, apply_nms=False)
    dets = np.asarray(dets)

    for i in range(4):
        ref_i = ref_dets[i].numpy()          # (k, 17) — only score>=0.75 rows
        ours = dets[i][np.asarray(valid[i])]
        assert ours.shape == ref_i.shape
        if ref_i.shape[0]:
            np.testing.assert_allclose(ours, ref_i, rtol=1e-3, atol=1e-4)


@requires_reference
def test_blazeface_weighted_nms_matches():
    """Run the reference's Python weighted NMS and our scanned version on the
    same decoded detections."""
    import torch

    net = _ref_blazeface()
    rng = np.random.default_rng(1)
    # synthetic detections with heavy overlap: 3 clusters
    base = np.array([[0.2, 0.2, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9], [0.1, 0.7, 0.3, 0.9]])
    rows = []
    for c in range(3):
        for _ in range(5):
            b = base[c] + rng.normal(0, 0.01, 4)
            kp = rng.normal(0.5, 0.1, 12)
            score = rng.uniform(0.76, 0.99)
            rows.append(np.concatenate([b, kp, [score]]))
    dets = np.array(rows, dtype=np.float32)

    ref_faces = net._weighted_non_max_suppression(torch.from_numpy(dets))
    ref_faces = np.stack([f.numpy() for f in ref_faces])

    import jax.numpy as jnp
    from fac_fake_tpu.detect.blazeface import weighted_nms
    faces, mask = weighted_nms(jnp.asarray(dets), jnp.ones(len(dets), bool), max_out=8)
    faces = np.asarray(faces)[np.asarray(mask)]

    assert faces.shape == ref_faces.shape
    np.testing.assert_allclose(faces, ref_faces, rtol=1e-5, atol=1e-6)
