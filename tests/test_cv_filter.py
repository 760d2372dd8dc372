"""cv filter/histogram/structural families vs the OpenCV oracle (same
strategy as the reference's pymnn tests, which assert MNN.cv against
opencv — SURVEY.md §4)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mnn_tpu import cv as mcv


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (37, 41), np.uint8)


@pytest.fixture(scope="module")
def img3(img):
    rng = np.random.default_rng(1)
    return rng.integers(0, 256, (37, 41, 3), np.uint8)


def _close(a, b, atol=1.0):
    np.testing.assert_allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64), atol=atol)


class TestFilter:
    def test_gaussian_kernel(self):
        for n, s in ((3, 0.8), (5, 1.1), (7, 0.0)):
            want = cv2.getGaussianKernel(n, s).ravel()
            got = np.asarray(mcv.get_gaussian_kernel(n, s))
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_gaussian_blur(self, img):
        want = cv2.GaussianBlur(img.astype(np.float32), (5, 5), 1.2,
                                borderType=cv2.BORDER_REFLECT_101)
        got = mcv.gaussian_blur(img.astype(np.float32), (5, 5), 1.2)
        _close(got, want, atol=1e-3)

    def test_blur_box(self, img3):
        want = cv2.blur(img3.astype(np.float32), (3, 3),
                        borderType=cv2.BORDER_REFLECT_101)
        got = mcv.blur(img3.astype(np.float32), (3, 3))
        _close(got, want, atol=1e-3)

    def test_filter2d(self, img):
        k = np.asarray([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        want = cv2.filter2D(img.astype(np.float32), -1, k,
                            borderType=cv2.BORDER_REFLECT_101)
        got = mcv.filter2d(img.astype(np.float32), k)
        _close(got, want, atol=1e-3)

    @pytest.mark.parametrize("dx,dy,ks", [(1, 0, 3), (0, 1, 3), (2, 0, 3),
                                          (1, 0, 5), (1, 1, 3)])
    def test_sobel(self, img, dx, dy, ks):
        want = cv2.Sobel(img.astype(np.float32), cv2.CV_32F, dx, dy,
                         ksize=ks, borderType=cv2.BORDER_REFLECT_101)
        got = mcv.sobel(img.astype(np.float32), dx, dy, ksize=ks)
        _close(got, want, atol=1e-2)

    def test_scharr(self, img):
        want = cv2.Scharr(img.astype(np.float32), cv2.CV_32F, 1, 0,
                          borderType=cv2.BORDER_REFLECT_101)
        got = mcv.scharr(img.astype(np.float32), 1, 0)
        _close(got, want, atol=1e-2)

    def test_laplacian(self, img):
        want = cv2.Laplacian(img.astype(np.float32), cv2.CV_32F,
                             borderType=cv2.BORDER_REFLECT_101)
        got = mcv.laplacian(img.astype(np.float32))
        _close(got, want, atol=1e-2)

    @pytest.mark.parametrize("shape", [mcv.filter.MORPH_RECT,
                                       mcv.filter.MORPH_CROSS,
                                       mcv.filter.MORPH_ELLIPSE])
    def test_structuring_element(self, shape):
        want = cv2.getStructuringElement(shape, (5, 5))
        got = np.asarray(mcv.get_structuring_element(shape, (5, 5)))
        np.testing.assert_array_equal(got, want)

    def test_erode_dilate(self, img):
        k = np.ones((3, 3), np.uint8)
        _close(mcv.erode(img, k), cv2.erode(img, k), atol=0)
        _close(mcv.dilate(img, k), cv2.dilate(img, k), atol=0)

    def test_morphology_open_close(self, img):
        k = np.ones((3, 3), np.uint8)
        _close(mcv.morphology_ex(img, "open", k),
               cv2.morphologyEx(img, cv2.MORPH_OPEN, k), atol=0)
        _close(mcv.morphology_ex(img, "close", k),
               cv2.morphologyEx(img, cv2.MORPH_CLOSE, k), atol=0)

    def test_pyr_down_up(self, img):
        want = cv2.pyrDown(img.astype(np.float32))
        got = mcv.pyr_down(img.astype(np.float32))
        # interior matches exactly; border rows differ (cv2 reflects
        # across the downsampled grid)
        _close(got[1:-1, 1:-1], want[1:-1, 1:-1], atol=1e-2)
        up_w = cv2.pyrUp(want)
        up_g = mcv.pyr_up(got)
        _close(up_g[2:-2, 2:-2], up_w[2:-2, 2:-2], atol=2.0)

    def test_bilateral(self, img):
        want = cv2.bilateralFilter(img.astype(np.float32), 5, 30.0, 3.0,
                                   borderType=cv2.BORDER_REFLECT_101)
        got = mcv.bilateral_filter(img.astype(np.float32), 5, 30.0, 3.0)
        _close(got, want, atol=1.0)


class TestHistogram:
    def test_calc_hist(self, img):
        want = cv2.calcHist([img], [0], None, [256], [0, 256]).ravel()
        got = np.asarray(mcv.calc_hist(img))
        np.testing.assert_array_equal(got, want)

    def test_equalize_hist(self, img):
        want = cv2.equalizeHist(img)
        got = np.asarray(mcv.equalize_hist(img))
        assert np.mean(np.abs(got.astype(int) - want.astype(int)) <= 1) > 0.99

    @pytest.mark.parametrize("ty", [0, 1, 2, 3, 4])
    def test_threshold(self, img, ty):
        _, want = cv2.threshold(img, 100, 255, ty)
        got = np.asarray(mcv.threshold(img, 100, 255, ty))
        np.testing.assert_array_equal(got, want)

    def test_adaptive_threshold_mean(self, img):
        want = cv2.adaptiveThreshold(img, 255, cv2.ADAPTIVE_THRESH_MEAN_C,
                                     cv2.THRESH_BINARY, 5, 3.0)
        got = np.asarray(mcv.adaptive_threshold(
            img, 255, mcv.histogram.ADAPTIVE_THRESH_MEAN_C,
            mcv.histogram.THRESH_BINARY, 5, 3.0))
        assert (got == want).mean() > 0.98   # ties at the boundary

    def test_integral(self, img):
        want = cv2.integral(img)
        got = np.asarray(mcv.integral(img))
        np.testing.assert_allclose(got, want, atol=0.5)


class TestStructural:
    def test_bounding_rect_and_area(self):
        pts = np.asarray([[2, 3], [10, 3], [10, 8], [2, 8]])
        assert mcv.bounding_rect(pts) == tuple(cv2.boundingRect(pts))
        assert mcv.contour_area(pts) == cv2.contourArea(
            pts.astype(np.float32))

    def test_convex_hull(self):
        rng = np.random.default_rng(2)
        pts = rng.integers(0, 50, (30, 2)).astype(np.int32)
        want = cv2.convexHull(pts)[:, 0]
        got = mcv.convex_hull(pts)
        assert set(map(tuple, got.astype(int))) == set(map(tuple, want))

    def test_min_area_rect(self):
        pts = np.asarray([[0, 0], [4, 2], [3, 5], [-1, 3]], np.float32)
        (cx, cy), (w, h), _ = mcv.min_area_rect(pts)
        (wx, wy), (ww, wh), _ = cv2.minAreaRect(pts)
        assert abs(cx - wx) < 1e-3 and abs(cy - wy) < 1e-3
        assert abs(w * h - ww * wh) < 1e-3

    def test_connected_components(self):
        img = np.zeros((20, 20), np.uint8)
        img[2:5, 2:5] = 1
        img[10:15, 10:12] = 1
        img[18, 0] = 1
        n_w, lab_w, st_w, c_w = cv2.connectedComponentsWithStats(img, 8)
        n_g, lab_g, st_g, c_g = mcv.connected_components_with_stats(img, 8)
        assert n_g == n_w
        # same partition (label ids may permute)
        for i in range(1, n_g):
            m = lab_g == i
            ids = np.unique(lab_w[m])
            assert len(ids) == 1
            assert (lab_w == ids[0]).sum() == m.sum()
        assert sorted(st_g[1:, 4].tolist()) == sorted(st_w[1:, 4].tolist())
