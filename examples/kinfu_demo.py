"""KinectFusion on the bundled RGB-D frames
(mirrors /root/reference/examples/python/advanced/kinfu.py usage)."""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import cupoch_tpu as cph  # noqa: E402
from cupoch_tpu.geometry import RGBDImage  # noqa: E402
from cupoch_tpu.kinfu import KinfuOption, KinfuPipeline  # noqa: E402

TESTDATA = "/root/reference/examples/testdata"


def main():
    intr = cph.io.read_pinhole_camera_intrinsic(
        f"{TESTDATA}/camera_primesense.json")
    colors = sorted(glob.glob(f"{TESTDATA}/rgbd/color/*"))
    depths = sorted(glob.glob(f"{TESTDATA}/rgbd/depth/*"))
    opt = KinfuOption(num_pyramid_levels=2, tsdf_length=4.0,
                      tsdf_resolution=128, sdf_trunc=0.04,
                      tsdf_origin=(0.0, 0.0, 2.0),
                      distance_threshold=0.1, icp_iterations=[10, 10])
    pipe = KinfuPipeline(intr, opt)
    for i, (c, d) in enumerate(zip(colors, depths)):
        rgbd = RGBDImage.create_from_color_and_depth(
            cph.io.read_image(c), cph.io.read_image(d),
            convert_rgb_to_intensity=False)
        t0 = time.time()
        ok = pipe.process_frame(rgbd)
        print(f"frame {i}: tracked={ok} "
              f"t={pipe.cur_pose[:3, 3].round(4)} "
              f"({time.time() - t0:.2f}s)")
    pcd = pipe.extract_point_cloud()
    print(f"reconstructed {len(pcd)} surface points")
    cph.io.write_point_cloud("/tmp/kinfu_model.ply", pcd)
    print("wrote /tmp/kinfu_model.ply")


if __name__ == "__main__":
    main()
