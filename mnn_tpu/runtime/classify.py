"""Classification top-k accuracy harness.

Equivalent of the reference's evaluation tool
(/root/reference/tools/evaluation/classficationTopkEval.cpp — ImageNet
top-k over a label file, with the standard resize/center-crop/normalize
preprocessing): runs any jax classifier fn over an image folder or
(images, labels) arrays in jitted batches and reports top-1/top-k.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization (the reference's imageInputConfig defaults)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_classification(image: np.ndarray, size: int = 224,
                              crop_pct: float = 0.875) -> np.ndarray:
    """HWC uint8 -> CHW float: resize shorter side to size/crop_pct,
    center-crop, normalize (the torchvision/reference eval recipe)."""
    x = jnp.asarray(image, jnp.float32) / 255.0
    h, w = x.shape[:2]
    short = int(round(size / crop_pct))
    if h < w:
        nh, nw = short, int(round(w * short / h))
    else:
        nh, nw = int(round(h * short / w)), short
    x = jax.image.resize(x, (nh, nw, x.shape[2]), method="bilinear")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[top: top + size, left: left + size]
    x = (x - _MEAN) / _STD
    return np.asarray(x.transpose(2, 0, 1))


def topk_eval(
    model_fn: Callable,                # [B,3,H,W] -> [B, classes] logits
    images: Sequence[np.ndarray],      # preprocessed CHW floats
    labels: Sequence[int],
    *,
    k: int = 5,
    batch_size: int = 32,
) -> dict:
    """Returns {"top1": float, "topk": float, "k": k, "n": N}."""
    fn = jax.jit(model_fn)
    n = len(images)
    top1 = topk = 0
    for off in range(0, n, batch_size):
        batch = images[off: off + batch_size]
        valid = len(batch)
        if valid < batch_size:  # pad to the compiled shape
            batch = list(batch) + [batch[-1]] * (batch_size - valid)
        x = jnp.asarray(np.stack(batch))
        logits = np.asarray(fn(x), np.float32)[:valid]
        want = np.asarray(labels[off: off + valid])
        order = np.argsort(-logits, axis=-1)
        top1 += int((order[:, 0] == want).sum())
        topk += int((order[:, :k] == want[:, None]).any(-1).sum())
    return {"top1": top1 / n, "topk": topk / n, "k": k, "n": n}


def eval_folder(model_fn: Callable, root: str, *, size: int = 224,
                k: int = 5, batch_size: int = 32,
                limit: Optional[int] = None) -> dict:
    """Top-k accuracy over an ImageFolder layout (root/<class>/<img>...),
    classes sorted alphabetically. Uses the standard eval recipe
    (resize-short-side + center-crop + normalize) on the ORIGINAL images,
    via preprocess_classification."""
    from PIL import Image

    from mnn_tpu.train.datasets import ImageFolderDataset

    ds = ImageFolderDataset(root, size=(size, size))
    idx = range(len(ds) if limit is None else min(limit, len(ds)))
    images, labels = [], []
    for i in idx:
        path, lab = ds.samples[i]
        img = np.asarray(Image.open(path).convert("RGB"))
        images.append(preprocess_classification(img, size=size))
        labels.append(int(lab))
    return topk_eval(model_fn, images, labels, k=k, batch_size=batch_size)
