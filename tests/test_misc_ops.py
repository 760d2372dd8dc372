"""NMS, CV draw, calib3d, dataset loaders."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.cv import calib3d, draw
from mnn_tpu.ops.nms import box_iou, nms
from mnn_tpu.train.datasets import DataLoader, load_mnist_images, load_mnist_labels


class TestNms:
    def test_iou(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                        jnp.float32)
        iou = np.asarray(box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)

    def test_suppression(self):
        boxes = jnp.asarray([
            [0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [21, 21, 31, 31],
        ], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7, 0.95], jnp.float32)
        idx, valid = nms(boxes, scores, iou_threshold=0.5, max_outputs=4)
        kept = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
        assert kept == [0, 3]  # highest-score box of each cluster

    def test_score_threshold(self):
        boxes = jnp.asarray([[0, 0, 1, 1], [5, 5, 6, 6]], jnp.float32)
        scores = jnp.asarray([0.9, 0.1], jnp.float32)
        idx, valid = nms(boxes, scores, score_threshold=0.5, max_outputs=2)
        assert np.asarray(valid).sum() == 1


class TestDraw:
    def test_rect_and_fill(self):
        img = np.zeros((20, 20, 3), np.uint8)
        draw.rectangle(img, (2, 3), (10, 12), (255, 0, 0), thickness=-1)
        assert (img[3:13, 2:11, 0] == 255).all()
        assert img[2, 2, 0] == 0

    def test_line_circle(self):
        img = np.zeros((20, 20), np.uint8)
        draw.line(img, (0, 0), (19, 19), 255)
        assert img[0, 0] == 255 and img[19, 19] == 255 and img[10, 10] == 255
        img2 = np.zeros((21, 21), np.uint8)
        draw.circle(img2, (10, 10), 5, 255, thickness=-1)
        assert img2[10, 10] == 255 and img2[10, 15] == 255 and img2[0, 0] == 0


class TestCalib3d:
    def test_rodrigues_roundtrip(self):
        rvec = jnp.asarray([0.2, -0.4, 0.8])
        R = calib3d.rodrigues(rvec)
        assert np.allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        back = calib3d.rodrigues_inv(R)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rvec), atol=1e-4)

    def test_solve_pnp_recovers_pose(self):
        rng = np.random.default_rng(0)
        obj = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
        rvec_true = np.array([0.1, 0.3, -0.2], np.float32)
        tvec_true = np.array([0.2, -0.1, 4.0], np.float32)
        K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        R = np.asarray(calib3d.rodrigues(jnp.asarray(rvec_true)))
        cam = obj @ R.T + tvec_true
        img = cam[:, :2] / cam[:, 2:3] * 500 + np.array([320, 240])
        rvec, tvec = calib3d.solve_pnp(obj, img.astype(np.float32), K)
        np.testing.assert_allclose(rvec, rvec_true, atol=5e-3)
        np.testing.assert_allclose(tvec, tvec_true, atol=5e-2)


class TestDatasets:
    def test_mnist_idx_roundtrip(self, tmp_path):
        imgs = np.random.default_rng(0).integers(
            0, 256, (5, 28, 28), dtype=np.uint8)
        labels = np.asarray([1, 2, 3, 4, 5], np.uint8)
        ip = str(tmp_path / "imgs.idx")
        lp = str(tmp_path / "lbl.idx")
        with open(ip, "wb") as f:
            f.write(struct.pack(">IIII", 2051, 5, 28, 28))
            f.write(imgs.tobytes())
        with open(lp, "wb") as f:
            f.write(struct.pack(">II", 2049, 5))
            f.write(labels.tobytes())
        np.testing.assert_array_equal(load_mnist_images(ip), imgs)
        np.testing.assert_array_equal(load_mnist_labels(lp), labels)

    def test_dataloader(self):
        x = np.arange(10)[:, None].astype(np.float32)
        y = np.arange(10)
        dl = DataLoader(x, y, batch_size=4, seed=1)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0][0].shape == (4, 1)
        seen = np.concatenate([np.asarray(b[1]) for b in batches])
        assert len(set(seen.tolist())) == 8  # shuffled, no dup within epoch
