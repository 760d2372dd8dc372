"""CV + audio libraries vs scipy/torch/PIL oracles (≈ pymnn unit_test.py
strategy: numpy/opencv/torch as oracles, /root/reference/pymnn/test/unit_test.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mnn_tpu import audio as A
from mnn_tpu import cv as C


def _img(h=32, w=48, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


class TestColor:
    def test_rgb_bgr_roundtrip(self):
        img = _img()
        out = np.asarray(C.cvt_color(C.cvt_color(img, "rgb", "bgr"), "bgr", "rgb"))
        np.testing.assert_array_equal(out, img)

    def test_gray_coefficients(self):
        img = _img()
        got = np.asarray(C.cvt_color(img, "rgb", "gray"), np.float32)
        want = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
        assert np.abs(got - want).max() <= 1.0

    def test_nv12(self):
        h, w = 4, 4
        y = np.full((h, w), 128, np.uint8)
        uv = np.full((2, 2, 2), 128, np.uint8)  # neutral chroma
        rgb = np.asarray(C.yuv_nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
        np.testing.assert_allclose(rgb, 128, atol=1)


class TestGeometric:
    def test_resize_matches_torch(self):
        torch = pytest.importorskip("torch")
        img = _img(16, 16)
        got = np.asarray(C.resize(jnp.asarray(img), (32, 24)), np.float32)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
            size=(32, 24), mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        assert np.abs(got - t).max() <= 2.0  # rounding to uint8 + half-pixel conv

    def test_crop_flip_pad(self):
        img = _img()
        assert C.crop(jnp.asarray(img), 2, 3, 10, 12).shape == (10, 12, 3)
        np.testing.assert_array_equal(
            np.asarray(C.flip(jnp.asarray(img)))[:, 0], img[:, -1])
        assert C.pad(jnp.asarray(img), 1, 2, 3, 4).shape == (35, 55, 3)

    def test_warp_affine_identity(self):
        img = _img()
        m = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
        out = np.asarray(C.warp_affine(jnp.asarray(img), m, img.shape[:2]))
        np.testing.assert_array_equal(out, img)

    def test_warp_affine_rotation_vs_scipy(self):
        from scipy import ndimage

        img = _img(33, 33, 1, seed=2)[..., 0].astype(np.float32)
        m = C.get_affine_transform((16, 16), 30.0)
        got = np.asarray(C.warp_affine(jnp.asarray(img), m, (33, 33)))
        inv = np.linalg.inv(np.vstack([m, [0, 0, 1]]))[:2]
        # scipy uses (row, col) coords: src_rc = M @ dst_rc + offset
        a, b, c = inv[0]
        d, e, f = inv[1]
        M = np.array([[e, d], [b, a]])
        want = ndimage.affine_transform(
            img, M, offset=[f, c], order=1, mode="constant",
        )
        # compare on interior (border handling differs)
        d = np.abs(got[8:25, 8:25] - want[8:25, 8:25])
        assert np.median(d) < 2.0

    def test_image_process_pipeline(self):
        img = _img(40, 40)
        proc = C.ImageProcess(C.ImageProcessConfig(
            source_format="bgr", dest_format="rgb",
            mean=(127.5, 127.5, 127.5), normal=(1 / 127.5,) * 3,
            target_size=(24, 24), layout="nchw",
        ))
        out = np.asarray(proc(img))
        assert out.shape == (1, 3, 24, 24)
        assert -1.01 <= out.min() and out.max() <= 1.01


class TestCodecs:
    def test_imread_imwrite_roundtrip(self, tmp_path):
        pytest.importorskip("PIL")
        img = _img()
        p = str(tmp_path / "x.png")
        C.imwrite(p, img)
        back = C.imread(p)
        np.testing.assert_array_equal(back, img)


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        sr = 16000
        t = np.linspace(0, 1, sr, endpoint=False)
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "a.wav")
        A.save_wav(p, x, sr)
        back, sr2 = A.load_wav(p)
        assert sr2 == sr
        np.testing.assert_allclose(back, x, atol=1 / 32768 + 1e-6)

    def test_spectrogram_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4000).astype(np.float32)
        got = np.asarray(A.spectrogram(x, n_fft=400, hop_length=160))
        want = (
            torch.stft(
                torch.from_numpy(x), n_fft=400, hop_length=160,
                window=torch.hann_window(400), center=True,
                return_complex=True,
            ).abs() ** 2
        ).numpy().T
        np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-3, atol=1e-3)

    def test_mel_filterbank_shape_and_partition(self):
        fb = np.asarray(A.mel_filterbank(80, 400, 16000, htk=True))
        assert fb.shape == (201, 80)
        assert fb.min() >= 0
        # triangles overlap: every mel bin has some support
        assert (fb.sum(axis=0) > 0).all()

    def test_whisper_fbank_range(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(16000).astype(np.float32)
        feats = np.asarray(A.whisper_fbank(x))
        assert feats.shape[1] == 128
        assert feats.shape[0] == 100  # 1s at hop 160 -> 100 frames
        assert np.isfinite(feats).all()

    def test_fbank_shapes(self):
        x = np.random.default_rng(2).standard_normal(8000).astype(np.float32)
        f = np.asarray(A.fbank(x))
        assert f.shape[1] == 80
        assert np.isfinite(f).all()
