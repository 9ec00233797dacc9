"""Semi-global stereo matching on the bundled left/right pair
(mirrors /root/reference/examples/python/advanced/stereo.py usage)."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import cupoch_tpu as cph  # noqa: E402
from cupoch_tpu.imageproc import SemiGlobalMatching, SGMOption  # noqa: E402

TESTDATA = "/root/reference/examples/testdata"


def main():
    left = cph.io.read_image(f"{TESTDATA}/left.png")
    right = cph.io.read_image(f"{TESTDATA}/right.png")
    opt = SGMOption(left.width, left.height,
                    disp_size=SGMOption.DisparitySize128)
    sgm = SemiGlobalMatching(opt)
    disp = sgm.process_frame(left, right)
    d = disp.to_numpy()[..., 0]
    print(f"disparity: {100 * (d > 0).mean():.0f}% valid, "
          f"median {np.median(d[d > 0]):.0f} px")
    intr = cph.camera.PinholeCameraIntrinsic(
        left.width, left.height, 500.0, 500.0,
        left.width / 2, left.height / 2)
    pcd = cph.geometry.PointCloud.create_from_disparity(
        disp, left, intr, intr, baseline=0.1)
    print(f"stereo cloud: {len(pcd)} points")
    cph.io.write_point_cloud("/tmp/stereo_cloud.ply", pcd)
    print("wrote /tmp/stereo_cloud.ply")


if __name__ == "__main__":
    main()
