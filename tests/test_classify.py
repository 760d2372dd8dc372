"""Classification top-k eval harness (classficationTopkEval equivalent)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mnn_tpu.runtime.classify import (eval_folder, preprocess_classification,
                                      topk_eval)


class TestTopkEval:
    def test_oracle_classifier_scores_100(self):
        """A classifier that reads the label planted in the image must
        score top1 = 1.0; padding of the last partial batch is excluded."""
        rng = np.random.default_rng(0)
        images, labels = [], []
        for i in range(10):
            lab = int(rng.integers(0, 4))
            img = np.zeros((3, 8, 8), np.float32)
            img[0, 0, 0] = lab
            images.append(img)
            labels.append(lab)

        def model(x):  # [B,3,8,8] -> [B,4]
            ids = x[:, 0, 0, 0].astype(jnp.int32)
            return jnp.eye(4)[ids] * 10.0

        r = topk_eval(model, images, labels, k=2, batch_size=4)
        assert r == {"top1": 1.0, "topk": 1.0, "k": 2, "n": 10}

    def test_topk_wider_than_top1(self):
        images = [np.full((3, 4, 4), float(i)) for i in range(6)]
        labels = [1] * 6

        def model(x):
            # always ranks class 0 first, class 1 second
            b = x.shape[0]
            return jnp.tile(jnp.asarray([5.0, 4.0, 0.0, 0.0]), (b, 1))

        r = topk_eval(model, images, labels, k=2, batch_size=3)
        assert r["top1"] == 0.0 and r["topk"] == 1.0

    def test_preprocess_shapes(self):
        img = np.random.default_rng(1).integers(0, 255, (300, 200, 3),
                                                dtype=np.uint8)
        x = preprocess_classification(img, size=224)
        assert x.shape == (3, 224, 224)
        assert abs(float(x.mean())) < 3.0

    def test_eval_folder(self, tmp_path):
        pil = pytest.importorskip("PIL.Image")
        # two classes; images encode their class in brightness
        for ci, cls in enumerate(["a", "b"]):
            d = tmp_path / cls
            d.mkdir()
            for j in range(3):
                arr = np.full((32, 32, 3), 40 + 150 * ci, np.uint8)
                pil.fromarray(arr).save(d / f"{j}.png")

        def model(x):  # bright -> class 1
            mean = x.mean(axis=(1, 2, 3))
            return jnp.stack([-mean, mean], axis=1)

        r = eval_folder(model, str(tmp_path), size=32, k=1, batch_size=4)
        assert r["n"] == 6 and r["top1"] == 1.0
