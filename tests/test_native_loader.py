"""Native C++ loader vs PIL on generated TIFF/PGM files."""

import numpy as np
import pytest

from opticalflow_tpu.io import native_loader

PIL_Image = pytest.importorskip("PIL.Image")

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader could not be built"
)


def _write_multipage_tiff(path, movie, dtype):
    frames = [PIL_Image.fromarray(f.astype(dtype)) for f in movie]
    frames[0].save(path, save_all=True, append_images=frames[1:], compression=None)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_multipage_tiff_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    movie = rng.integers(0, 255 if dtype == np.uint8 else 60000,
                         size=(4, 37, 53)).astype(dtype)
    path = str(tmp_path / "stack.tif")
    _write_multipage_tiff(path, movie, dtype)

    out = native_loader.read_tiff_movie_native(path)
    assert out.shape == (4, 37, 53)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, movie.astype(np.float32))


def test_tiff_max_frames(tmp_path):
    movie = np.arange(3 * 8 * 8, dtype=np.uint8).reshape(3, 8, 8)
    path = str(tmp_path / "stack.tif")
    _write_multipage_tiff(path, movie, np.uint8)
    out = native_loader.read_tiff_movie_native(path, max_frames=2)
    assert out.shape == (2, 8, 8)


def test_sequence_read_parallel(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(6, 21, 34)).astype(np.uint8)
    paths = []
    for k, frame in enumerate(frames):
        p = str(tmp_path / f"f{k}.tif")
        PIL_Image.fromarray(frame).save(p, compression=None)
        paths.append(p)
    out = native_loader.read_sequence_native(paths)
    np.testing.assert_array_equal(out, frames.astype(np.float32))


def test_pgm_sequence(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(3, 15, 17)).astype(np.uint8)
    paths = []
    for k, frame in enumerate(frames):
        p = str(tmp_path / f"f{k}.pgm")
        PIL_Image.fromarray(frame).save(p)
        paths.append(p)
    out = native_loader.read_sequence_native(paths)
    np.testing.assert_array_equal(out, frames.astype(np.float32))


def test_corrupt_file_fails_cleanly(tmp_path):
    bad = tmp_path / "bad.tif"
    bad.write_bytes(b"this is not a tiff at all")
    with pytest.raises(ValueError):
        native_loader.read_tiff_movie_native(str(bad))
