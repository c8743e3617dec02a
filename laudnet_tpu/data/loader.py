"""Input pipeline: ImageFolder dataset + threaded host-side loader.

Replaces torch's DataLoader/DistributedSampler (`train/main.py:419-421`)
with a thread-pooled prefetching loader producing NHWC numpy batches, plus
a synthetic generator for dataset-free smoke runs and benchmarks. For
multi-host training, pass ``shard=(process_index, process_count)`` — the
per-epoch permutation is seeded identically on every host (the JAX-native
replacement for DistributedSampler).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolderDataset:
    """torchvision-ImageFolder-compatible: root/<class>/<img>."""

    def __init__(self, root: str, transform: Callable):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTS):
                    self.samples.append(
                        (os.path.join(cdir, fn), self.class_to_idx[c])
                    )

    def __len__(self):
        return len(self.samples)

    def load(self, index: int, seed: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[index]
        with Image.open(path) as img:
            return self.transform(img, seed), label


def _pad_order_for_shards(order: np.ndarray, count: int) -> np.ndarray:
    """Pad the epoch order by wrapping so every shard draws the same
    number of samples (torch DistributedSampler semantics). Without this,
    uneven shards run different batch counts / final-batch shapes and a
    multi-host SPMD step deadlocks waiting for the short shard."""
    if count <= 1 or len(order) % count == 0:
        return order
    total = -(-len(order) // count) * count
    reps = -(-total // max(len(order), 1))
    return np.tile(order, reps)[:total]


class DataLoader:
    """Threaded, prefetching batch loader with epoch-seeded shuffling."""

    def __init__(self, dataset: ImageFolderDataset, batch_size: int,
                 shuffle: bool = True, num_workers: int = 8,
                 drop_last: bool = True, seed: int = 0,
                 shard: Optional[Tuple[int, int]] = None,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard or (0, 1)
        self.prefetch = prefetch

    def __len__(self):
        idx, count = self.shard
        n = -(-len(self.dataset) // count)  # padded per-shard count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.default_rng(self.seed + epoch)
        order = (rng.permutation(len(self.dataset)) if self.shuffle
                 else np.arange(len(self.dataset)))
        idx, count = self.shard
        order = _pad_order_for_shards(order, count)[idx::count]
        n_batches = len(self)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    chunk = order[b * self.batch_size:(b + 1) * self.batch_size]
                    seeds = (self.seed + epoch) * 1_000_003 + chunk
                    results = list(
                        pool.map(self.dataset.load, chunk.tolist(),
                                 seeds.tolist())
                    )
                    images = np.stack([r[0] for r in results])
                    labels = np.asarray([r[1] for r in results], np.int32)
                    q.put((images, labels))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def synthetic_batches(batch_size: int, size: int = 224, num_classes: int = 1000,
                      steps: int = 10, seed: int = 0):
    """Dataset-free batches for smoke tests / benchmarks."""
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        yield (
            rng.standard_normal((batch_size, size, size, 3)).astype(np.float32),
            rng.integers(0, num_classes, (batch_size,)).astype(np.int32),
        )
