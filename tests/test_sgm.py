"""SGM stereo tests on synthetic shifted-texture pairs
(reference model: libSGM behavior behind imageproc/sgm.cpp)."""
import numpy as np
import pytest

from cupoch_tpu.geometry import Image, PointCloud
from cupoch_tpu.imageproc import SemiGlobalMatching, SGMOption

H, W = 48, 96


def make_pair(disp, rng):
    """Constant-disparity pair: right[x - d] == left[x]."""
    tex = (rng.uniform(0, 255, size=(H, W + 64))).astype(np.float32)
    # smooth the texture a little so census windows overlap
    tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 0)) / 3.0
    left = tex[:, 32:32 + W]
    right = tex[:, 32 + disp:32 + disp + W]
    return left.astype(np.uint8), right.astype(np.uint8)


@pytest.mark.parametrize("true_disp", [4, 11])
def test_constant_disparity(rng, true_disp):
    left, right = make_pair(true_disp, rng)
    opt = SGMOption(W, H, disp_size=SGMOption.DisparitySize64)
    sgm = SemiGlobalMatching(opt)
    disp_img = sgm.process_frame(Image(left[..., None]),
                                 Image(right[..., None]))
    d = disp_img.to_numpy()[..., 0].astype(np.int32)
    # interior pixels (away from borders where the shift wraps)
    inner = d[8:-8, 24:-8]
    valid = inner > 0
    assert valid.mean() > 0.5
    correct = np.abs(inner[valid] - true_disp) <= 1
    assert correct.mean() > 0.9, f"only {correct.mean():.2f} correct"


def test_two_depth_layers(rng):
    # left half shifted by 4, right half by 12
    l4, r4 = make_pair(4, rng)
    l12, r12 = make_pair(12, rng)
    left = np.concatenate([l4[:, : W // 2], l12[:, W // 2:]], 1)
    right = np.concatenate([r4[:, : W // 2], r12[:, W // 2:]], 1)
    opt = SGMOption(W, H, disp_size=SGMOption.DisparitySize64)
    sgm = SemiGlobalMatching(opt)
    d = sgm.process_frame(Image(left[..., None]),
                          Image(right[..., None])).to_numpy()[..., 0]
    lhs = d[8:-8, 24:W // 2 - 8]
    rhs = d[8:-8, W // 2 + 8:-8]
    assert np.median(lhs[lhs > 0]) == pytest.approx(4, abs=1)
    assert np.median(rhs[rhs > 0]) == pytest.approx(12, abs=1)


def test_scanpath4(rng):
    left, right = make_pair(6, rng)
    opt = SGMOption(W, H, disp_size=SGMOption.DisparitySize64,
                    path_type=SGMOption.ScanPath4)
    d = SemiGlobalMatching(opt).process_frame(
        Image(left[..., None]), Image(right[..., None])).to_numpy()[..., 0]
    inner = d[8:-8, 24:-8]
    valid = inner > 0
    assert (np.abs(inner[valid] - 6) <= 1).mean() > 0.9


def test_invalid_params():
    sgm = SemiGlobalMatching(SGMOption())  # width/height 0
    with pytest.raises(RuntimeError):
        sgm.process_frame(Image(np.zeros((4, 4, 1), np.uint8)),
                          Image(np.zeros((4, 4, 1), np.uint8)))


def test_disparity_to_pointcloud(rng):
    from cupoch_tpu.camera import PinholeCameraIntrinsic

    left, right = make_pair(8, rng)
    opt = SGMOption(W, H, disp_size=SGMOption.DisparitySize64)
    disp = SemiGlobalMatching(opt).process_frame(
        Image(left[..., None]), Image(right[..., None]))
    intr = PinholeCameraIntrinsic(W, H, 50.0, 50.0, W / 2, H / 2)
    pcd = PointCloud.create_from_disparity(
        disp, Image(np.repeat(left[..., None], 3, -1)), intr, intr,
        baseline=0.1)
    assert len(pcd) > 0
    z = np.asarray(pcd.points)[:, 2]
    # z = fx * b / d = 50 * 0.1 / 8 = 0.625 for the dominant plane
    assert np.abs(np.median(z) - 0.625) < 0.1
