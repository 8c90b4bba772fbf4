"""S3D checkpoint evaluator.

Re-designs `S3D/S3D-test.py`: per-video strided snippet → (1, T, H, W, 3)
forward → sigmoid → `custom_video_round` aggregation, intentional
degradation augs applied with p=1 (JPEG compression + Gaussian noise,
`S3D-test.py:65-73` — the evaluation is deliberately on corrupted inputs,
quirk ledger §8.15), metrics accuracy/F1/BCE + ROC dumps. Checkpoint loading
uses the proper DDP prefix strip, fixing the reference's `lstrip("module.")`
key corruption (`S3D-test.py:204`, §8.7).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fac_fake_tpu.data.clips import ClipDataset
from fac_fake_tpu.evaluate.metrics import accuracy, f1
from fac_fake_tpu.utils.s3d import custom_video_round


def degrade_frame(img_rgb: np.ndarray, rng: np.random.Generator,
                  quality_range=(40, 60), noise_var=(10.0, 40.0)) -> np.ndarray:
    """ImageCompression + GaussNoise, both p=1 (`S3D-test.py:65-73`)."""
    import cv2
    q = int(rng.integers(quality_range[0], quality_range[1] + 1))
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    img = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    var = rng.uniform(*noise_var)
    noisy = img.astype(np.float32) + rng.normal(0, np.sqrt(var), img.shape)
    return np.clip(noisy, 0, 255).astype(np.uint8)


class S3DEvaluator:
    """S3D scoring/evaluation (`S3D-test.py:260-286` replacement).

    `quantize="int8"` swaps the forward for the PTQ engine
    (`compat/quantize_s3d.py`), calibrated lazily on the first batch it
    scores (the `VideoScorer._maybe_quantize` convention). int8 pays at
    serving batch sizes — measured +21% at b32 on v5e — while per-video
    b1 scoring is per-op-overhead-bound where int8 loses ~20% (README "S3D
    performance"); use it with `predict_batch`.
    """

    def __init__(self, model, variables, degrade: bool = True, seed: int = 0,
                 quantize: str = "none"):
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize must be none|int8, got {quantize!r}")
        self.model = model
        self.variables = jax.device_put(variables)
        self.degrade = degrade
        self.seed = seed
        self.quantize = quantize
        self._engine = None

        @jax.jit
        def fwd(v, clip):
            logits = model.apply(v, clip.astype(jnp.float32), train=False)
            return jax.nn.sigmoid(logits)

        self._fwd = fwd

    def _probs(self, clips_u8: np.ndarray) -> np.ndarray:
        """(B, T, H, W, 3) uint8 → (B, num_class) probabilities."""
        clips = jnp.asarray(clips_u8)
        if self.quantize == "int8":
            if self._engine is None:
                from fac_fake_tpu.compat.quantize_s3d import quantize_s3d
                self._engine = quantize_s3d(
                    self.model, self.variables,
                    clips[:2].astype(jnp.float32))
            return np.asarray(jax.nn.sigmoid(self._engine(clips)))
        return np.asarray(self._fwd(self.variables, clips))

    def predict_batch(self, clips_u8: np.ndarray) -> np.ndarray:
        """Batched serving forward: (B, T, H, W, 3) uint8 → (B,) video
        fake-probabilities (no degradation — serving scores clean clips)."""
        return self._probs(clips_u8).reshape(clips_u8.shape[0], -1).mean(-1)

    def predict_video(self, clip_u8: np.ndarray,
                      rng: Optional[np.random.Generator] = None) -> float:
        """clip (T, H, W, 3) uint8 → video fake-probability."""
        rng = rng or np.random.default_rng(self.seed)
        if self.degrade:
            clip_u8 = np.stack([degrade_frame(f, rng) for f in clip_u8])
        probs = self._probs(clip_u8[None])
        return custom_video_round(probs.reshape(-1).tolist())

    def evaluate(self, dataset: ClipDataset, out_prefix: Optional[str] = None,
                 model_name: str = "s3d") -> Dict[str, float]:
        rng = np.random.default_rng(self.seed)
        labels, scores = [], []
        for i in range(len(dataset)):
            clip = dataset.load_clip(i, rng)
            if clip is None:  # <T crops: skipped (`S3D-test.py:183-184`)
                continue
            labels.append(dataset.samples[i][1])
            scores.append(self.predict_video(clip, rng))
        if not labels:
            # every video skipped (too few crops for the snippet policy —
            # the reference needs ≥200 crops/video, `S3D-test.py:183-184`);
            # report it instead of crashing in sklearn
            return {"accuracy": float("nan"), "f1": float("nan"),
                    "bce": float("nan"), "count": 0}
        labels_a = np.asarray(labels)
        scores_a = np.asarray(scores)
        preds = (scores_a > 0.5).astype(int)
        eps = 1e-7
        bce = float(-np.mean(labels_a * np.log(scores_a + eps)
                             + (1 - labels_a) * np.log(1 - scores_a + eps)))
        out = {"accuracy": accuracy(labels_a, preds),
               "f1": f1(labels_a, preds), "bce": bce, "count": len(labels)}
        if out_prefix:
            from fac_fake_tpu.evaluate.metrics import save_roc_curve
            try:
                out["auc"] = float(save_roc_curve(labels_a, scores_a,
                                                  out_prefix, model_name))
            except ValueError:
                out["auc"] = float("nan")
        return out
