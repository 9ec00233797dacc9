"""RGB-D SLAM over the bundled sequence with the sharded backend and
checkpoint/resume (new scope vs the reference; BASELINE config #5)."""
import glob
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import cupoch_tpu as cph  # noqa: E402
from cupoch_tpu.geometry import RGBDImage  # noqa: E402
from cupoch_tpu.slam import RGBDSlam, SlamOption  # noqa: E402

TESTDATA = "/root/reference/examples/testdata"


def main():
    import jax
    from jax.sharding import Mesh
    from cupoch_tpu.slam.pose_graph import EDGE_AXIS

    intr = cph.io.read_pinhole_camera_intrinsic(
        f"{TESTDATA}/camera_primesense.json")
    mesh = Mesh(np.asarray(jax.devices()), (EDGE_AXIS,)) \
        if len(jax.devices()) > 1 else None
    slam = RGBDSlam(intr, SlamOption(keyframe_interval=2), mesh=mesh)
    colors = sorted(glob.glob(f"{TESTDATA}/rgbd/color/*"))
    depths = sorted(glob.glob(f"{TESTDATA}/rgbd/depth/*"))
    for i, (c, d) in enumerate(zip(colors, depths)):
        rgbd = RGBDImage.create_from_color_and_depth(
            cph.io.read_image(c), cph.io.read_image(d))
        slam.process_frame(rgbd)
        print(f"frame {i}: t={slam.cur_pose[:3, 3].round(4)} "
              f"keyframes={len(slam.pose_graph.nodes)}")
    slam.optimize()
    slam.save("/tmp/slam_state.npz")
    print(f"saved {len(slam.trajectory)} poses, "
          f"{len(slam.pose_graph.edges)} edges -> /tmp/slam_state.npz")
    # resume demo
    slam2 = RGBDSlam(intr)
    slam2.restore("/tmp/slam_state.npz")
    print(f"restored at frame {slam2.frame_id} with "
          f"{len(slam2.pose_graph.nodes)} keyframes")


if __name__ == "__main__":
    main()
