"""BlazeFace face detector, TPU-native.

Re-designs `/root/reference/CViT-main/helpers/blazeface.py` (405 LoC torch)
as a Flax NHWC model with a fully batched, jittable post-process:

  * anchor decode + score clipping/sigmoid (`blazeface.py:231-299`) stays
    a dense (B, 896, 17) tensor — no per-image Python loops;
  * the paper's *weighted-blend* NMS (`blazeface.py:301-356`) becomes a
    fixed-capacity `lax.scan` (`weighted_nms` below) vmappable over the
    batch — same math: highest-score seed, IoU>0.3 cluster, score-weighted
    coordinate blend, mean score when the cluster has >1 member.

Weights load from the reference's in-repo `blazeface.pth` / `anchors.npy`
via `convert_blazeface`. Input is uint8/float NHWC 128×128; preprocessing
(x/127.5 - 1, `blazeface.py:162-164`) is fused into the jitted forward.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NUM_ANCHORS = 896
NUM_COORDS = 16
SCALE = 128.0
SCORE_CLIP = 100.0
MIN_SCORE = 0.75
IOU_THRESH = 0.3


class BlazeBlock(nn.Module):
    """Depthwise-separable residual block with the TFLite stride-2 padding
    quirk (`blazeface.py:7-42`): stride 2 pads right/bottom by 2 before the
    depthwise conv and max-pools the residual; channel deficit is zero-padded.
    """
    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride == 2:
            h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
            pad = ((0, 0), (0, 0))
            res = nn.max_pool(x, (2, 2), strides=(2, 2))
        else:
            h = x
            p = (self.kernel - 1) // 2
            pad = ((p, p), (p, p))
            res = x
        h = nn.Conv(self.in_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.in_ch, dtype=self.dtype, name="dw")(h)
        h = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="pw")(h)
        cp = self.out_ch - self.in_ch
        if cp > 0:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, 0), (0, cp)))
        return nn.relu(h + res)


_B1 = ((24, 24, 1), (24, 28, 1), (28, 32, 2), (32, 36, 1), (36, 42, 1),
       (42, 48, 2), (48, 56, 1), (56, 64, 1), (64, 72, 1), (72, 80, 1),
       (80, 88, 1))
_B2 = ((88, 96, 2), (96, 96, 1), (96, 96, 1), (96, 96, 1), (96, 96, 1))


class BlazeFaceNet(nn.Module):
    """Backbone + anchor heads (`blazeface.py:82-146`). Returns raw
    (B, 896, 16) box regressions and (B, 896, 1) logits; NHWC means the
    head reshape needs no permute (torch had to NCHW→NHWC first)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = x.shape[0]
        # TFLite first-conv padding: (1,2) on H and W (`blazeface.py:117`)
        x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        x = nn.Conv(24, (5, 5), strides=(2, 2), padding=((0, 0), (0, 0)),
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        for i, (ci, co, s) in enumerate(_B1):
            x = BlazeBlock(ci, co, stride=s, dtype=self.dtype, name=f"b1_{i}")(x)
        h = x
        for i, (ci, co, s) in enumerate(_B2):
            h = BlazeBlock(ci, co, stride=s, dtype=self.dtype, name=f"b2_{i}")(h)

        c1 = nn.Conv(2, (1, 1), dtype=self.dtype, name="classifier_8")(x)
        c2 = nn.Conv(6, (1, 1), dtype=self.dtype, name="classifier_16")(h)
        r1 = nn.Conv(32, (1, 1), dtype=self.dtype, name="regressor_8")(x)
        r2 = nn.Conv(96, (1, 1), dtype=self.dtype, name="regressor_16")(h)

        c = jnp.concatenate([c1.reshape(b, -1, 1), c2.reshape(b, -1, 1)], axis=1)
        r = jnp.concatenate([r1.reshape(b, -1, 16), r2.reshape(b, -1, 16)], axis=1)
        return r, c


def decode_detections(raw_boxes: jnp.ndarray, raw_scores: jnp.ndarray,
                      anchors: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor decode + score squash (`blazeface.py:254-273,275-299`).

    Returns dets (B, 896, 17) = [ymin,xmin,ymax,xmax, 6×(kp_x,kp_y), score]
    and a validity mask (B, 896) of score ≥ 0.75 — fixed shapes, no
    per-image filtering loop.
    """
    ax, ay, aw, ah = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    xc = raw_boxes[..., 0] / SCALE * aw + ax
    yc = raw_boxes[..., 1] / SCALE * ah + ay
    w = raw_boxes[..., 2] / SCALE * aw
    h = raw_boxes[..., 3] / SCALE * ah
    box = jnp.stack([yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2], axis=-1)

    kp = raw_boxes[..., 4:16].reshape(*raw_boxes.shape[:-1], 6, 2)
    kpx = kp[..., 0] / SCALE * aw[:, None] + ax[:, None]
    kpy = kp[..., 1] / SCALE * ah[:, None] + ay[:, None]
    kps = jnp.stack([kpx, kpy], axis=-1).reshape(*raw_boxes.shape[:-1], 12)

    scores = jax.nn.sigmoid(jnp.clip(raw_scores[..., 0], -SCORE_CLIP, SCORE_CLIP))
    dets = jnp.concatenate([box, kps, scores[..., None]], axis=-1)
    return dets, scores >= MIN_SCORE


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one [ymin,xmin,ymax,xmax] box against (A,4)
    (`blazeface.py:361-405`)."""
    inter_min = jnp.maximum(box[:2], boxes[:, :2])
    inter_max = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(inter_max - inter_min, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (box[2] - box[0]) * (box[3] - box[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area_a + area_b - inter)


def weighted_nms(dets: jnp.ndarray, valid: jnp.ndarray, max_out: int = 8,
                 iou_thresh: float = IOU_THRESH) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-blend NMS (`blazeface.py:301-356`) as a fixed-capacity scan.

    Per step: seed = highest remaining score; cluster = IoU>thresh remaining
    (incl. seed); if the cluster has >1 member, coords become the
    score-weighted mean and the score the cluster-mean — else the seed row is
    kept verbatim. Emits up to `max_out` faces with a validity mask; same
    ordering (descending seed score) as the reference's Python while-loop.
    """
    scores0 = jnp.where(valid, dets[:, 16], -1.0)

    def step(scores, _):
        idx = jnp.argmax(scores)
        seed_score = scores[idx]
        is_valid = seed_score > 0.0
        ious = _iou_one_vs_all(dets[idx, :4], dets[:, :4])
        cluster = (ious > iou_thresh) & (scores > 0.0)
        n = jnp.sum(cluster)
        w = jnp.where(cluster, dets[:, 16], 0.0)
        total = jnp.sum(w)
        blended_coords = jnp.sum(dets[:, :16] * w[:, None], axis=0) / jnp.maximum(total, 1e-20)
        blended = jnp.concatenate([blended_coords, (total / jnp.maximum(n, 1))[None]])
        out = jnp.where(n > 1, blended, dets[idx])
        scores = jnp.where(cluster, -1.0, scores)
        return scores, (out, is_valid)

    _, (faces, mask) = jax.lax.scan(step, scores0, None, length=max_out)
    return faces, mask


class BlazeFace:
    """User-facing detector: jitted batched forward + decode (+ optional
    per-image NMS). Mirrors `predict_on_batch` (`blazeface.py:182-219`)."""

    input_size = (128, 128)

    def __init__(self, variables, anchors: np.ndarray, dtype=jnp.float32):
        self.net = BlazeFaceNet(dtype=dtype)
        self.variables = variables
        self.anchors = jnp.asarray(anchors, jnp.float32)

        @jax.jit
        def _raw(v, anchors, x):
            x = x.astype(jnp.float32) / 127.5 - 1.0
            r, c = self.net.apply(v, x)
            return decode_detections(r, c, anchors)

        self._raw = _raw
        self._nms = jax.jit(jax.vmap(functools.partial(weighted_nms, max_out=8)))

    @classmethod
    def from_packaged_assets(cls):
        """Load the vendored flax-format weights + anchors (standalone:
        converted once from the reference's in-repo blazeface.pth)."""
        import os
        from flax import traverse_util
        assets = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "assets")
        raw = np.load(os.path.join(assets, "blazeface_flax.npz"))
        params = traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in raw.items()})
        return cls({"params": params},
                   np.load(os.path.join(assets, "anchors.npy")))

    @classmethod
    def from_reference_assets(
            cls,
            weights_path: str = "/root/reference/CViT-main/helpers/blazeface.pth",
            anchors_path: str = "/root/reference/CViT-main/helpers/anchors.npy"):
        """Convert directly from the reference's torch assets; falls back to
        the packaged flax weights when the reference isn't mounted."""
        if not (os.path.exists(weights_path) and os.path.exists(anchors_path)):
            return cls.from_packaged_assets()
        from fac_fake_tpu.compat.torch_weights import load_torch_state_dict
        sd = load_torch_state_dict(weights_path)
        variables = convert_blazeface(sd)
        return cls(variables, np.load(anchors_path))

    # batch bucketing: pad to these sizes so the detector compiles a handful
    # of shapes once (per-video tile counts vary; odd batch shapes would
    # otherwise recompile every video — expensive on remote-compile paths)
    BATCH_BUCKETS = (8, 32, 96, 192, 384)

    @staticmethod
    def _bucket(n: int) -> int:
        for b in BlazeFace.BATCH_BUCKETS:
            if n <= b:
                return b
        return -(-n // 384) * 384

    def predict_on_batch(self, x, apply_nms: bool = True):
        """x: (B, 128, 128, 3) uint8/float NHWC. Returns (dets, mask):
        with NMS (B, 8, 17)/(B, 8); raw (B, 896, 17)/(B, 896)."""
        x = np.asarray(x)
        n = x.shape[0]
        cap = self._bucket(n)
        if cap != n:
            x = np.concatenate(
                [x, np.zeros((cap - n, *x.shape[1:]), x.dtype)], axis=0)
        dets, valid = self._raw(self.variables, self.anchors, jnp.asarray(x))
        if not apply_nms:
            return dets[:n], valid[:n]
        faces, mask = self._nms(dets, valid)  # padded: one compile per bucket
        return faces[:n], mask[:n]


def convert_blazeface(sd) -> dict:
    """torch blazeface.pth state_dict → Flax variables (OIHW → HWIO)."""
    p: dict = {}

    def conv(dst, src):
        p[dst] = {"kernel": np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0)),
                  "bias": np.asarray(sd[f"{src}.bias"])}

    conv("conv0", "backbone1.0")
    for i in range(len(_B1)):
        conv(f"b1_{i}/dw", f"backbone1.{i + 2}.convs.0")
        conv(f"b1_{i}/pw", f"backbone1.{i + 2}.convs.1")
    for i in range(len(_B2)):
        conv(f"b2_{i}/dw", f"backbone2.{i}.convs.0")
        conv(f"b2_{i}/pw", f"backbone2.{i}.convs.1")
    for head in ("classifier_8", "classifier_16", "regressor_8", "regressor_16"):
        conv(head, head)

    # expand "a/b" keys into nested dict
    nested: dict = {}
    for k, v in p.items():
        parts = k.split("/")
        node = nested
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v
    return {"params": nested}
