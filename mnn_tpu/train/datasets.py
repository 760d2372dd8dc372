"""Dataset loaders + batch iterator.

Equivalent of the reference's training datasets (tools/train
source/datasets/: MnistDataset, ImageDataset + DataLoader): the MNIST
idx-format parser reads the classic ubyte files; `ImageFolderDataset`
walks a class-per-directory tree with PIL; `DataLoader` shuffles and
yields device-ready jnp batches.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Iterator, Optional, Tuple

import numpy as np


def _open(path: str):
    return gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")


def load_mnist_images(path: str) -> np.ndarray:
    with _open(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"bad idx image magic {magic:#x}")
        data = np.frombuffer(f.read(n * rows * cols), np.uint8)
    return data.reshape(n, rows, cols)


def load_mnist_labels(path: str) -> np.ndarray:
    with _open(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != 2049:
            raise ValueError(f"bad idx label magic {magic:#x}")
        return np.frombuffer(f.read(n), np.uint8).copy()


class ImageFolderDataset:
    """class-per-subdirectory image tree (≈ reference ImageDataset)."""

    def __init__(self, root: str, size: Tuple[int, int] = (224, 224)):
        from PIL import Image  # noqa: F401

        self.root = root
        self.size = size
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.samples = []
        for ci, cls in enumerate(self.classes):
            for fn in sorted(os.listdir(os.path.join(root, cls))):
                if fn.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                    self.samples.append((os.path.join(root, cls, fn), ci))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image

        path, label = self.samples[i]
        img = Image.open(path).convert("RGB").resize(self.size[::-1])
        return np.asarray(img), label


class DataLoader:
    """Shuffling batch iterator yielding jnp arrays (NCHW float for images)."""

    def __init__(self, data: np.ndarray, labels: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.data = data
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __iter__(self) -> Iterator:
        import jax.numpy as jnp

        n = len(self.data)
        idx = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(idx)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for off in range(0, stop, self.batch_size):
            sel = idx[off : off + self.batch_size]
            yield jnp.asarray(self.data[sel]), jnp.asarray(self.labels[sel])

    def __len__(self):
        n = len(self.data)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
