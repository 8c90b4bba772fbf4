"""Crop-folder dataset (the ImageFolder equivalent).

Re-designs `CViT-main/helpers/loader.py` (torchvision ImageFolder over
`{split}/{fake,real}` crop dirs + DataLoader workers) as a host-side prefetch
iterator feeding uint8 batches: JPEG decode in a thread pool, deterministic
per-epoch shuffling, static batch shapes (drop_last for train, zero-pad+mask
for eval). Class order is alphabetical like ImageFolder — label 0 = fake,
1 = real (SURVEY.md §8.3). Augmentation is NOT applied here: it runs jitted
on device inside the train step (`data/augment.py`).
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


class CropFolderDataset:
    def __init__(self, root: str, image_size: int = 224,
                 use_native: Optional[bool] = None):
        self.root = root
        self.image_size = image_size
        self.classes = sorted(d for d in os.listdir(root)
                              if os.path.isdir(os.path.join(root, d)))
        self.samples: List[Tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            cdir = os.path.join(root, cls)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cdir, f), label))
        # native C++ batch decoder (JPEG-only): auto unless forced
        if use_native is None:
            from fac_fake_tpu.data import native_loader
            use_native = native_loader.available() and all(
                p.lower().endswith((".jpg", ".jpeg"))
                for p, _ in self.samples[:64])
        self.use_native = use_native

    def __len__(self):
        return len(self.samples)

    def _load(self, path: str) -> np.ndarray:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[:2] != (self.image_size, self.image_size):
            img = cv2.resize(img, (self.image_size, self.image_size),
                             interpolation=cv2.INTER_AREA)
        return img

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0, drop_last: bool = True, num_workers: int = 4,
                process_index: int = 0, process_count: int = 1,
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield {'image': u8 (B,H,W,3), 'label': i32 (B,), 'mask': f32 (B,)}.

        Multi-host sharding: each process takes a deterministic stride slice
        (the DistributedSampler replacement; epoch folds into the shuffle seed
        like `sampler.set_epoch`, `S3D-train-GPUs.py:340-341`).
        """
        order = np.arange(len(self.samples))
        if shuffle:
            np.random.RandomState(seed + epoch).shuffle(order)
        order = order[process_index::process_count]

        pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            n = len(order)
            stops = range(0, n - batch_size + 1, batch_size) if drop_last \
                else range(0, n, batch_size)
            for start in stops:
                idxs = order[start:start + batch_size]
                if self.use_native:
                    from fac_fake_tpu.data import native_loader
                    arr, ok = native_loader.decode_batch(
                        [self.samples[i][0] for i in idxs], self.image_size,
                        threads=num_workers)
                    imgs = [arr[k] if ok[k] else
                            self._load(self.samples[i][0])
                            for k, i in enumerate(idxs)]
                else:
                    imgs = list(pool.map(
                        lambda i: self._load(self.samples[i][0]), idxs))
                labels = np.array([self.samples[i][1] for i in idxs], np.int32)
                mask = np.ones(batch_size, np.float32)
                if len(idxs) < batch_size:  # eval tail: pad + mask
                    pad = batch_size - len(idxs)
                    imgs += [np.zeros_like(imgs[0])] * pad
                    labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                    mask[len(idxs):] = 0.0
                yield {"image": np.stack(imgs), "label": labels, "mask": mask}
        finally:
            pool.shutdown(wait=False)


def build_session(root_dir: str, batch_size: int = 32, image_size: int = 224):
    """`session()` equivalent (`helpers/loader.py:41-53`): returns datasets
    for the train/validation/test splits."""
    return {split: CropFolderDataset(os.path.join(root_dir, split), image_size)
            for split in ("train", "validation", "test")}
