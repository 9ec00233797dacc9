"""Image / RGBDImage tests (reference: src/tests/geometry/image.cpp)."""
import numpy as np
import pytest

import cupoch_tpu as cph
from cupoch_tpu.geometry import FilterType, Image, RGBDImage


def make_gradient(h=24, w=32):
    x = np.linspace(0, 1, w, dtype=np.float32)
    return np.tile(x, (h, 1))


def test_image_metadata():
    img = Image(np.zeros((10, 20, 3), np.uint8))
    assert img.width == 20
    assert img.height == 10
    assert img.num_of_channels == 3
    assert img.bytes_per_channel == 1
    assert img.has_data()


def test_create_float_image_from_uint8():
    data = np.full((4, 4, 1), 255, np.uint8)
    f = Image(data).create_float_image()
    np.testing.assert_allclose(np.asarray(f.data), 1.0, atol=1e-6)


def test_create_float_image_rgb_intensity():
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 0] = 1.0  # pure red
    f = Image(rgb).create_float_image()
    np.testing.assert_allclose(np.asarray(f.data)[..., 0], 0.2990, atol=1e-4)


def test_gaussian_filter_preserves_constant():
    img = Image(np.full((16, 16, 1), 3.5, np.float32))
    for ft in (FilterType.Gaussian3, FilterType.Gaussian5, FilterType.Gaussian7):
        out = img.filter(ft)
        np.testing.assert_allclose(np.asarray(out.data), 3.5, atol=1e-5)


def test_sobel_on_linear_ramp():
    # horizontal ramp with slope 1/(w-1): Sobel dx response = 8 * slope
    w = 32
    img = Image(make_gradient(16, w))
    dx = img.filter(FilterType.Sobel3Dx)
    interior = np.asarray(dx.data)[4:-4, 4:-4, 0]
    np.testing.assert_allclose(interior, 8.0 / (w - 1), rtol=1e-4)
    dy = img.filter(FilterType.Sobel3Dy)
    np.testing.assert_allclose(np.asarray(dy.data)[4:-4, 4:-4, 0], 0.0,
                               atol=1e-5)


def test_downsample_halves():
    img = Image(make_gradient(16, 16))
    out = img.downsample()
    assert out.width == 8 and out.height == 8
    # box average of 2x2 preserves the mean
    np.testing.assert_allclose(np.mean(np.asarray(out.data)),
                               np.mean(make_gradient(16, 16)), atol=1e-5)


def test_pyramid_shapes():
    img = Image(make_gradient(32, 32))
    pyr = img.create_pyramid(3)
    assert [p.width for p in pyr] == [32, 16, 8]


def test_bilateral_smooths_noise():
    rng = np.random.default_rng(0)
    base = np.full((16, 16, 1), 0.5, np.float32)
    noisy = base + rng.normal(0, 0.01, base.shape).astype(np.float32)
    out = Image(noisy).filter_bilateral(5, 0.5, 5.0)
    assert np.std(np.asarray(out.data)) < np.std(noisy)


def test_flip_transpose():
    img = Image(make_gradient(4, 6))
    assert np.allclose(np.asarray(img.flip_horizontal().data)[:, ::-1],
                       np.asarray(img.data))
    t = img.transpose()
    assert t.width == 4 and t.height == 6


def test_float_value_at_bilinear():
    img = Image(make_gradient(8, 8))
    ok, v = img.float_value_at(3.5, 2.0)
    assert ok
    expected = 0.5 * (make_gradient(8, 8)[2, 3] + make_gradient(8, 8)[2, 4])
    assert abs(v - expected) < 1e-5


def test_rgbd_from_color_and_depth():
    color = Image(np.full((8, 8, 3), 128, np.uint8))
    depth_raw = np.full((8, 8), 1500, np.uint16)
    depth_raw[0, 0] = 5000  # beyond 3m truncation at scale 1000
    rgbd = RGBDImage.create_from_color_and_depth(color, Image(depth_raw))
    d = np.asarray(rgbd.depth.data)[..., 0]
    assert abs(d[4, 4] - 1.5) < 1e-6
    assert d[0, 0] == 0.0
    assert rgbd.color.num_of_channels == 1


def test_rgbd_pyramid():
    color = Image(np.full((16, 16, 3), 100, np.uint8))
    depth = Image(np.full((16, 16), 1000, np.uint16))
    rgbd = RGBDImage.create_from_color_and_depth(color, depth)
    pyr = rgbd.create_pyramid(2)
    assert len(pyr) == 2
    assert pyr[1].color.width == 8


def test_depth_to_camera_distance_multiplier():
    from cupoch_tpu.camera import PinholeCameraIntrinsic, PinholeCameraIntrinsicParameters

    intr = PinholeCameraIntrinsic(PinholeCameraIntrinsicParameters.PrimeSenseDefault)
    img = Image(np.zeros((intr.height, intr.width), np.float32))
    mult = img.create_depth_to_camera_distance_multiplier_float_image(intr)
    m = np.asarray(mult.data)[..., 0]
    # principal point ray has multiplier ~1, corners > 1
    assert abs(m[239, 319] - 1.0) < 1e-3
    assert m[0, 0] > 1.1
