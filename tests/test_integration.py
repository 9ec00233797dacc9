"""TSDF integration tests (reference: src/tests/integration/uniform_fsdfvolume.cpp
— adapted to analytic scenes instead of golden blobs)."""
import numpy as np
import pytest

from cupoch_tpu.camera import PinholeCameraIntrinsic
from cupoch_tpu.geometry import Image, RGBDImage
from cupoch_tpu.integration import (
    ScalableTSDFVolume,
    TSDFVolumeColorType,
    UniformTSDFVolume,
)

H, W = 48, 64
FX = FY = 48.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def wall_rgbd(z=1.0, intensity=0.7):
    depth = np.full((H, W), z, np.float32)
    color = np.full((H, W), intensity, np.float32)
    return RGBDImage(Image(color[..., None]), Image(depth[..., None]))


def intrinsic():
    return PinholeCameraIntrinsic(W, H, FX, FY, CX, CY)


def make_volume(color_type=TSDFVolumeColorType.Gray32):
    # 2m cube centred on the camera axis, in front of the camera
    return UniformTSDFVolume(
        2.0, 64, 0.08, color_type, origin=(0.0, 0.0, 1.0))


def test_integrate_creates_surface_at_wall():
    vol = make_volume()
    vol.integrate(wall_rgbd(1.0), intrinsic())
    w = np.asarray(vol.weight)
    assert w.max() == 1.0
    pcd = vol.extract_point_cloud()
    assert len(pcd) > 100
    pts = np.asarray(pcd.points)
    # surface points should lie near z=1
    assert abs(np.median(pts[:, 2]) - 1.0) < vol.voxel_length
    assert pcd.normals is not None


def test_integrate_weights_accumulate():
    vol = make_volume()
    for _ in range(3):
        vol.integrate(wall_rgbd(1.0), intrinsic())
    assert np.asarray(vol.weight).max() == 3.0


def test_extract_triangle_mesh_wall():
    vol = make_volume()
    vol.integrate(wall_rgbd(1.0), intrinsic())
    mesh = vol.extract_triangle_mesh()
    assert mesh.has_triangles()
    v = np.asarray(mesh.vertices)
    assert abs(np.median(v[:, 2]) - 1.0) < vol.voxel_length
    # watertightness is not expected for an open wall patch, but all
    # triangles must reference valid vertices
    t = np.asarray(mesh.triangles)
    assert t.min() >= 0 and t.max() < len(v)
    assert mesh.vertex_colors is not None
    assert abs(float(np.median(np.asarray(mesh.vertex_colors))) - 0.7) < 0.05


def test_raycast_reproduces_depth():
    vol = make_volume()
    vol.integrate(wall_rgbd(1.0), intrinsic())
    pcd = vol.raycast(intrinsic(), np.eye(4, dtype=np.float32))
    pts = np.asarray(pcd.points)
    assert len(pts) > 100
    assert abs(np.median(pts[:, 2]) - 1.0) < vol.voxel_length
    n = np.asarray(pcd.normals)
    # wall normal should be +-z
    assert np.median(np.abs(n[:, 2])) > 0.9


def test_extract_voxel_point_cloud():
    vol = make_volume()
    vol.integrate(wall_rgbd(1.0), intrinsic())
    vox = vol.extract_voxel_point_cloud()
    assert len(vox) > 0
    assert vox.colors is not None


def test_reset():
    vol = make_volume()
    vol.integrate(wall_rgbd(1.0), intrinsic())
    vol.reset()
    assert np.asarray(vol.weight).max() == 0.0


def test_mesh_sphere_watertight():
    """Integrate a synthetic sphere SDF directly and check the marching
    cubes output is watertight (validates the derived MC tables on the
    real extractor path)."""
    vol = UniformTSDFVolume(2.0, 48, 0.5, TSDFVolumeColorType.NoColor,
                            origin=(0.0, 0.0, 0.0))
    import jax.numpy as jnp

    R = vol.resolution
    r = (np.arange(R) + 0.5) * vol.voxel_length - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    f = np.sqrt(gx**2 + gy**2 + gz**2) - 0.6
    vol.tsdf = jnp.asarray(np.clip(f / vol.sdf_trunc, -1, 1), jnp.float32)
    vol.weight = jnp.ones((R, R, R), jnp.float32)
    mesh = vol.extract_triangle_mesh()
    t = np.asarray(mesh.triangles)
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)
    edges = np.sort(edges, 1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "sphere mesh must be watertight"
    area = mesh.get_surface_area()
    assert abs(area - 4 * np.pi * 0.6**2) / (4 * np.pi * 0.6**2) < 0.05
    vol_est = mesh.get_volume()
    assert abs(vol_est - 4 / 3 * np.pi * 0.6**3) / (4 / 3 * np.pi * 0.6**3) < 0.05


def test_scalable_tsdf_distant_blocks_bounded():
    """Two surface patches 100 block-lengths apart: extraction must be
    O(active blocks) — the round-1 dense re-assembly would allocate a
    (100*16)^3 volume here."""
    vol = ScalableTSDFVolume(0.05, 0.15, TSDFVolumeColorType.NoColor,
                             depth_sampling_stride=2)
    intr = PinholeCameraIntrinsic(64, 48, 60.0, 60.0, 31.5, 23.5)
    depth = np.full((48, 64), 1.2, np.float32)
    rgbd = RGBDImage(Image(np.ones((48, 64, 1), np.float32)),
                     Image(depth[..., None]))
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = 100 * vol.volume_unit_length  # far-away second patch
    vol.integrate(rgbd, intr, T1)
    vol.integrate(rgbd, intr, T2)
    assert len(vol) < 400  # blocks stay sparse
    mesh = vol.extract_triangle_mesh()
    v = np.asarray(mesh.vertices)
    assert len(v) > 0
    # both patches are present in the mesh
    assert (v[:, 0] < 50 * vol.volume_unit_length).any()
    assert (v[:, 0] < -50 * vol.volume_unit_length).any()


def test_scalable_tsdf_mesh_welds_across_blocks():
    """A synthetic sphere written straight into the block table: the
    block-local marching cubes must weld vertices exactly across block
    borders (no boundary cracks)."""
    import jax.numpy as jnp

    vol = ScalableTSDFVolume(0.05, 0.2, TSDFVolumeColorType.NoColor)
    # fill 4x4x4 blocks around the origin with a sphere SDF
    for bx in range(-2, 2):
        for by in range(-2, 2):
            for bz in range(-2, 2):
                vol._slots[(bx, by, bz)] = len(vol._slots)
    if len(vol._slots) > vol._capacity:
        vol._grow(len(vol._slots))
    keys = np.asarray(list(vol._slots.keys()), np.float32)
    r = (np.arange(16) + 0.5) * vol.voxel_length
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    local = np.stack([gx, gy, gz], -1)
    f = np.zeros((vol._capacity, 16, 16, 16), np.float32)
    w = np.zeros_like(f)
    for k, s in vol._slots.items():
        p = local + np.asarray(k, np.float32) * vol.volume_unit_length
        d = np.linalg.norm(p, axis=-1) - 1.0
        f[s] = np.clip(d / vol.sdf_trunc, -1, 1)
        w[s] = 1.0
    vol.tsdf = jnp.asarray(f)
    vol.weight = jnp.asarray(w)
    mesh = vol.extract_triangle_mesh()
    t = np.asarray(mesh.triangles)
    assert len(t) > 100
    edges = np.sort(np.concatenate(
        [t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0), 1)
    ue, counts = np.unique(edges, axis=0, return_counts=True)
    # interior edges shared by exactly 2 triangles; the open boundary
    # at the 4-block bounding box rim is allowed (sphere r=1.0 < box)
    assert (counts <= 2).all()
    inner = np.abs(np.asarray(mesh.vertices)).max(-1) < 1.55
    vert_ok = inner[ue].all(-1)
    assert (counts[vert_ok] == 2).all(), "cracks inside the volume"
