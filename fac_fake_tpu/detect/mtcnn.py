"""MTCNN face-detection cascade (P/R/O-net) in Flax, TPU-first.

The reference uses facenet_pytorch's MTCNN in three places:
  * sx preprocessing box detector (`preprocessing/face_detector.py:34-46`,
    thresholds [0.85, 0.95, 0.95], batch 32, half-resolution frames);
  * S3D masking landmarks (`S3D/face_mask/get_masked_face_simple.py:35-36`,
    thresholds [0.65, 0.75, 0.75]);
  * the predictors' dormant `face_mtcnn` path (`cvit_prediction.py:86-102`).

TPU-first redesign (SURVEY.md §7.3 anticipated this): the torch cascade
walks a dynamic image pyramid with variable-length candidate lists and
host-side crops; here EVERY stage is a fixed-capacity padded top-K candidate
set, NMS is a fixed-length `lax.scan`, and the 24×24/48×48 stage patches are
extracted on-device with the crop-resize matmuls (`ops/resize.py`) — the
whole cascade jits once per input resolution, no host round trips.

Weights: facenet_pytorch and its pretrained .pt files are NOT present in
this environment (zero egress), so pretrained golden tests are impossible
here. `convert_mtcnn` ingests the facenet_pytorch state_dict layout
(pnet/rnet/onet prefixes, OIHW convs, per-channel PReLU, the NCHW
permute-flatten before the first dense) so real weights drop in unchanged;
the net *architectures* are golden-tested against torch replicas built from
that layout (tests/test_mtcnn.py), which proves pretrained weights would
reproduce library outputs.

Known approximations vs facenet_pytorch (documented, mechanics-level):
pyramid resamples and stage patches use bilinear instead of area
interpolation, and out-of-frame patch regions edge-clamp instead of
zero-padding.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fac_fake_tpu.ops.resize import crop_resize_bilinear, resize_bilinear

CELL = 12       # P-net receptive cell
STRIDE = 2      # P-net output stride


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""
    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25),
                       (self.features,))
        return jnp.where(x >= 0, x, a * x)


def _pool_ceil(x, k: int, s: int):
    """Max-pool with torch ceil_mode=True semantics (pad bottom/right;
    flax pads with -inf, matching max over the valid window)."""
    h, w = x.shape[1], x.shape[2]
    ph = max(0, (-(-(h - k) // s)) * s + k - h)
    pw = max(0, (-(-(w - k) // s)) * s + k - w)
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=((0, ph), (0, pw)))


class PNet(nn.Module):
    """Proposal net, fully convolutional; returns (reg (B,h,w,4),
    probs (B,h,w,2) post-softmax)."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(10)(nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 2, 2)
        x = PReLU(16)(nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x))
        x = PReLU(32)(nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x))
        reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
        probs = jax.nn.softmax(nn.Conv(2, (1, 1), name="conv4_1")(x), axis=-1)
        return reg, probs


def _torch_flatten(x):
    """torch MTCNN flattens dense inputs as permute(0,3,2,1)+view — from
    NCHW that is (N, W, H, C) order; from our NHWC: swap H,W then flatten."""
    return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)


class RNet(nn.Module):
    """Refine net over 24×24 patches; returns (reg (B,4), probs (B,2))."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(28)(nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(48)(nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64)(nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x))
        x = PReLU(128)(nn.Dense(128, name="dense4")(_torch_flatten(x)))
        reg = nn.Dense(4, name="dense5_2")(x)
        probs = jax.nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
        return reg, probs


class ONet(nn.Module):
    """Output net over 48×48 patches; returns (reg (B,4), landmarks (B,10),
    probs (B,2))."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(32)(nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64)(nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64)(nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x))
        x = _pool_ceil(x, 2, 2)
        x = PReLU(128)(nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x))
        x = PReLU(256)(nn.Dense(256, name="dense5")(_torch_flatten(x)))
        reg = nn.Dense(4, name="dense6_2")(x)
        lmk = nn.Dense(10, name="dense6_3")(x)
        probs = jax.nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
        return reg, lmk, probs


# --- cascade geometry (pure functions) --------------------------------------

def pyramid_scales(h: int, w: int, min_face_size: int = 20,
                   factor: float = 0.709) -> list:
    """The torch cascade's scale schedule: m=12/minsize, then ×factor while
    the scaled short side still fits a 12-px cell."""
    m = CELL / float(min_face_size)
    minl = min(h, w) * m
    scales = []
    while minl >= CELL:
        scales.append(m * factor ** len(scales))
        minl = minl * factor
    return scales


def _fix(x):
    return jnp.trunc(x)  # round toward zero, like numpy.fix


def decode_pnet_boxes(probs: jnp.ndarray, reg: jnp.ndarray, scale: float,
                      thresh: float, k: int):
    """(h, w) face-prob map + (h, w, 4) reg → padded top-k candidate set
    (boxes (k,4) x1y1x2y2, scores (k,), reg (k,4), valid (k,)); cell→pixel
    mapping q1=fix((stride·cell+1)/scale), q2=fix((stride·cell+cellsize)/scale)."""
    hc, wc = probs.shape
    flat = probs.reshape(-1)
    kk = min(k, flat.shape[0])  # small pyramid levels have < k cells
    scores, idx = jax.lax.top_k(jnp.where(flat >= thresh, flat, -1.0), kk)
    if kk < k:
        scores = jnp.pad(scores, (0, k - kk), constant_values=-1.0)
        idx = jnp.pad(idx, (0, k - kk))
    valid = scores >= thresh
    yy = (idx // wc).astype(jnp.float32)
    xx = (idx % wc).astype(jnp.float32)
    q1x = _fix((STRIDE * xx + 1) / scale)
    q1y = _fix((STRIDE * yy + 1) / scale)
    q2x = _fix((STRIDE * xx + CELL) / scale)
    q2y = _fix((STRIDE * yy + CELL) / scale)
    boxes = jnp.stack([q1x, q1y, q2x, q2y], axis=-1)
    regs = reg.reshape(-1, 4)[idx]
    return boxes, scores, regs, valid


def _iou(box, boxes, mode: str):
    """IoU of one x1y1x2y2 box vs many; 'union' or 'min' denominator
    (torch nms uses +1 areas)."""
    ix1 = jnp.maximum(box[0], boxes[:, 0])
    iy1 = jnp.maximum(box[1], boxes[:, 1])
    ix2 = jnp.minimum(box[2], boxes[:, 2])
    iy2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(0.0, ix2 - ix1 + 1) * jnp.maximum(0.0, iy2 - iy1 + 1)
    area1 = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    denom = (jnp.minimum(area1, areas) if mode == "min"
             else area1 + areas - inter)
    return inter / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "mode", "max_out"))
def hard_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_thresh: float = 0.7, mode: str = "union", max_out: int = 32):
    """Greedy NMS as a fixed-length scan over a padded set: per step keep
    the highest remaining score, suppress IoU>thresh. Returns indices into
    the input (max_out,) and a keep mask."""
    s0 = jnp.where(valid, scores, -jnp.inf)

    def step(s, _):
        i = jnp.argmax(s)
        ok = s[i] > -jnp.inf
        sup = _iou(boxes[i], boxes, mode) > iou_thresh
        s = jnp.where(sup | (jnp.arange(s.shape[0]) == i), -jnp.inf, s)
        return s, (i, ok)

    _, (idx, keep) = jax.lax.scan(step, s0, None, length=max_out)
    return idx, keep


def bbreg(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Apply bounding-box regression offsets (scaled by box w/h)."""
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    return jnp.stack([boxes[:, 0] + reg[:, 0] * w,
                      boxes[:, 1] + reg[:, 1] * h,
                      boxes[:, 2] + reg[:, 2] * w,
                      boxes[:, 3] + reg[:, 3] * h], axis=-1)


def rerec(boxes: jnp.ndarray) -> jnp.ndarray:
    """Square each box around its center (longest side)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    x1 = boxes[:, 0] + w * 0.5 - side * 0.5
    y1 = boxes[:, 1] + h * 0.5 - side * 0.5
    return jnp.stack([x1, y1, x1 + side, y1 + side], axis=-1)


def _extract_patches(img_f: jnp.ndarray, boxes: jnp.ndarray, size: int):
    """On-device crop+resize of K candidate boxes to (K, size, size, 3),
    normalized (x-127.5)/128 like the torch cascade."""
    yxyx = jnp.stack([boxes[:, 1], boxes[:, 0],
                      boxes[:, 3] + 1, boxes[:, 2] + 1], axis=-1)
    patches = crop_resize_bilinear(img_f, yxyx, (size, size))
    return (patches - 127.5) * 0.0078125


# --- the cascade -------------------------------------------------------------

class MTCNN:
    """P/R/O-net cascade: `detect(img)` → padded (boxes x1y1x2y2, probs,
    landmarks (K,5,2) xy, valid). One jit per input resolution; thresholds
    are call-time arrays (no recompiles across the reference's two presets).
    """

    def __init__(self, variables: Optional[Dict] = None,
                 thresholds: Sequence[float] = (0.6, 0.7, 0.7),
                 min_face_size: int = 20, factor: float = 0.709,
                 caps: Tuple[int, int, int] = (128, 64, 32), seed: int = 0):
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        if variables is None:
            k = jax.random.key(seed)
            variables = {
                "pnet": self.pnet.init(k, jnp.zeros((1, 12, 12, 3))),
                "rnet": self.rnet.init(k, jnp.zeros((1, 24, 24, 3))),
                "onet": self.onet.init(k, jnp.zeros((1, 48, 48, 3))),
            }
        self.variables = variables
        self.thresholds = tuple(thresholds)
        self.min_face_size = min_face_size
        self.factor = factor
        self.caps = caps
        self._jitted = {}

    def _build(self, h: int, w: int):
        scales = pyramid_scales(h, w, self.min_face_size, self.factor)
        k1, k2, k3 = self.caps
        pnet, rnet, onet = self.pnet, self.rnet, self.onet

        def run(v, img_u8, t0, t1, t2):
            img = img_u8.astype(jnp.float32)

            # stage 1: pyramid proposals, per-scale top-k + NMS 0.5
            all_boxes, all_scores, all_regs, all_valid = [], [], [], []
            for s in scales:
                hs, ws = int(h * s + 1), int(w * s + 1)
                im = resize_bilinear(img[None], (hs, ws))
                im = (im - 127.5) * 0.0078125
                reg, probs = pnet.apply(v["pnet"], im)
                b, sc, rg, va = decode_pnet_boxes(probs[0, :, :, 1],
                                                  reg[0], s, t0, k1)
                idx, keep = hard_nms(b, sc, va, 0.5, "union", k1)
                all_boxes.append(b[idx])
                all_scores.append(jnp.where(keep, sc[idx], -1.0))
                all_regs.append(rg[idx])
                all_valid.append(keep & (sc[idx] >= t0))
            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            regs = jnp.concatenate(all_regs)
            valid = jnp.concatenate(all_valid)

            idx, keep = hard_nms(boxes, scores, valid, 0.7, "union", k2)
            boxes, scores, regs = boxes[idx], scores[idx], regs[idx]
            valid = keep & valid[idx]
            boxes = rerec(bbreg(boxes, regs))
            boxes = _fix(boxes)

            # stage 2: R-net refinement on 24×24 on-device patches
            patches = _extract_patches(img, boxes, 24)
            reg, probs = rnet.apply(v["rnet"], patches)
            scores = probs[:, 1]
            valid = valid & (scores > t1)
            idx, keep = hard_nms(boxes, scores, valid, 0.7, "union", k2)
            boxes, scores, reg = boxes[idx], scores[idx], reg[idx]
            valid = keep & valid[idx]
            boxes = rerec(bbreg(boxes, reg))
            boxes = _fix(boxes)

            # stage 3: O-net — final boxes, scores, 5-point landmarks
            patches = _extract_patches(img, boxes, 48)
            reg, lmk, probs = onet.apply(v["onet"], patches)
            scores = probs[:, 1]
            valid = valid & (scores > t2)
            bw = boxes[:, 2] - boxes[:, 0] + 1
            bh = boxes[:, 3] - boxes[:, 1] + 1
            pts_x = bw[:, None] * lmk[:, 0:5] + boxes[:, 0:1] - 1
            pts_y = bh[:, None] * lmk[:, 5:10] + boxes[:, 1:2] - 1
            boxes = bbreg(boxes, reg)
            idx, keep = hard_nms(boxes, scores, valid, 0.7, "min", k3)
            valid = keep & valid[idx]
            points = jnp.stack([pts_x[idx], pts_y[idx]], axis=-1)  # (k3,5,2)
            return boxes[idx], scores[idx], points, valid

        return jax.jit(run)

    def detect(self, img_u8: np.ndarray):
        """img (H, W, 3) uint8 RGB → (boxes (K,4) x1y1x2y2 float, probs (K,),
        landmarks (K, 5, 2) xy, valid (K,) bool) — padded numpy arrays."""
        h, w = img_u8.shape[:2]
        if (h, w) not in self._jitted:
            self._jitted[(h, w)] = self._build(h, w)
        t = [jnp.float32(x) for x in self.thresholds]
        out = self._jitted[(h, w)](self.variables, jnp.asarray(img_u8), *t)
        return tuple(np.asarray(o) for o in out)

    def detect_batch(self, frames: np.ndarray):
        """(F, H, W, 3) → list of per-frame detect() tuples (the reference
        feeds frame batches, `face_detector.py:47-62`)."""
        return [self.detect(f) for f in frames]

    def landmarks(self, img_u8: np.ndarray) -> Optional[np.ndarray]:
        """5-point landmarks of the best face, (5, 2) xy — the masking
        pipeline's contract (`get_masked_face_simple.py:35-44`)."""
        _, probs, points, valid = self.detect(img_u8)
        if not valid.any():
            return None
        return points[np.argmax(np.where(valid, probs, -1))]


def convert_mtcnn(state_dict: Dict[str, np.ndarray]) -> Dict:
    """facenet_pytorch MTCNN state_dict (keys `pnet.conv1.weight`, … or the
    per-net dumps merged with `pnet./rnet./onet.` prefixes) → our variables.
    Convs OIHW→HWIO; dense kernels transpose; dense4/dense5 input order is
    preserved by `_torch_flatten` (the cascade's NCHW permute-flatten)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)),
                "bias": sd[prefix + ".bias"]}

    def dense(prefix):
        return {"kernel": np.transpose(sd[prefix + ".weight"]),
                "bias": sd[prefix + ".bias"]}

    def prelu(prefix):
        return {"alpha": sd[prefix + ".weight"].reshape(-1)}

    def net(p, convs, denses, prelus):
        params = {}
        for name in convs:
            params[name] = conv(f"{p}.{name}")
        for name in denses:
            params[name] = dense(f"{p}.{name}")
        for i, name in enumerate(prelus):
            params[f"PReLU_{i}"] = prelu(f"{p}.{name}")
        return {"params": params}

    return {
        "pnet": net("pnet", ["conv1", "conv2", "conv3", "conv4_1", "conv4_2"],
                    [], ["prelu1", "prelu2", "prelu3"]),
        "rnet": net("rnet", ["conv1", "conv2", "conv3"],
                    ["dense4", "dense5_1", "dense5_2"],
                    ["prelu1", "prelu2", "prelu3", "prelu4"]),
        "onet": net("onet", ["conv1", "conv2", "conv3", "conv4"],
                    ["dense5", "dense6_1", "dense6_2", "dense6_3"],
                    ["prelu1", "prelu2", "prelu3", "prelu4", "prelu5"]),
    }


def validate_mtcnn_variables(variables: Dict) -> Dict:
    """Shape-check a converted cascade tree against a freshly initialized
    one (the repo convention: converters walk OUR initialized tree). Raises
    ValueError naming the first mismatched leaf; returns `variables`."""
    ref = MTCNN().variables
    flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    flat_new = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                jax.tree_util.tree_leaves_with_path(variables)}
    for key, shape in flat_ref.items():
        if key not in flat_new:
            raise ValueError(f"converted MTCNN tree is missing {key}")
        if tuple(flat_new[key]) != tuple(shape):
            raise ValueError(
                f"MTCNN leaf {key} has shape {flat_new[key]}, "
                f"expected {shape}")
    extra = set(flat_new) - set(flat_ref)
    if extra:
        raise ValueError(f"converted MTCNN tree has extra leaves {sorted(extra)}")
    return variables


_NPZ_SEP = "/"


def save_mtcnn_npz(variables: Dict, path: str) -> None:
    """Serialize a cascade variables tree to a flat-key .npz
    (`pnet/params/conv1/kernel` → array) — no pickle, loadable anywhere."""
    flat = {}
    for k, v in jax.tree_util.tree_leaves_with_path(variables):
        name = _NPZ_SEP.join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in k)
        flat[name] = np.asarray(v)
    np.savez(path, **flat)


def load_mtcnn_npz(path: str) -> Dict:
    """Inverse of `save_mtcnn_npz`: flat-key .npz → nested variables tree,
    shape-validated against the initialized cascade."""
    with np.load(path) as data:
        tree: Dict = {}
        for name in data.files:
            node = tree
            *parents, leaf = name.split(_NPZ_SEP)
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = data[name]
    return validate_mtcnn_variables(tree)
