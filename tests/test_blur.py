import numpy as np
import pytest

from opticalflow_tpu.ops.blur import blur_movie

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("sigma", [0.5, 1.0, 3.0])
def test_blur_matches_scipy_nearest(sigma):
    rng = np.random.default_rng(1)
    movie = rng.random((3, 40, 56))
    got = np.asarray(blur_movie(movie, smoothing_sigma=sigma))
    want = np.stack(
        [scipy_ndimage.gaussian_filter(f, sigma=sigma, mode="nearest") for f in movie]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_blur_matches_skimage_preserve_range():
    skimage_filters = pytest.importorskip("skimage.filters")
    rng = np.random.default_rng(2)
    movie = rng.random((2, 33, 33)) * 255.0
    got = np.asarray(blur_movie(movie, smoothing_sigma=3))
    want = np.stack(
        [skimage_filters.gaussian(f, sigma=3, preserve_range=True) for f in movie]
    )
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
