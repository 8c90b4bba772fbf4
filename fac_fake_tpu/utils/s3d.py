"""S3D utility functions (`/root/reference/sx_exp_deepfakedetect-master/S3D/utils.py`)."""
from __future__ import annotations

import random
from typing import Sequence

import numpy as np


def custom_round(values: Sequence[float], threshold: float = 0.5) -> np.ndarray:
    """Per-snippet rounding (`utils.py:25-32`)."""
    return np.asarray([1 if v > threshold else 0 for v in values])


def custom_video_round(preds: Sequence[float]) -> float:
    """Video score: the first snippet prob > 0.5 wins, else the mean
    (`utils.py:34-38`)."""
    for p in preds:
        if p > 0.5:
            return float(p)
    return float(np.mean(preds))


def shuffle_dataset(dataset: list, seed: int = 4) -> list:
    """Deterministic shuffle, seed 4 (`utils.py:54-58`, SURVEY.md §8.12)."""
    random.Random(seed).shuffle(dataset)
    return dataset


def get_n_params(params) -> int:
    """Parameter count of a pytree (`utils.py:60-67` equivalent)."""
    import jax
    return sum(int(np.prod(np.asarray(p).shape)) for p in jax.tree.leaves(params))
