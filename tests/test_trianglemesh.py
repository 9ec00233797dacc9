"""TriangleMesh tests (reference: src/tests/geometry/trianglemesh.cpp)."""
import numpy as np

from cupoch_tpu.geometry.trianglemesh import TriangleMesh


def unit_tetra():
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    t = np.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return TriangleMesh(v, t)


def test_surface_area_tetra():
    m = unit_tetra()
    # 3 right triangles of area 0.5 + equilateral side sqrt(3)/2
    expected = 1.5 + np.sqrt(3) / 2
    assert abs(m.get_surface_area() - expected) < 1e-5


def test_volume_tetra():
    m = unit_tetra()
    assert abs(abs(m.get_volume()) - 1.0 / 6.0) < 1e-6


def test_normals():
    m = unit_tetra()
    m.compute_vertex_normals()
    assert m.has_vertex_normals()
    assert m.has_triangle_normals()
    n = np.asarray(m.triangle_normals)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_sample_points_uniformly():
    m = unit_tetra()
    pcd = m.sample_points_uniformly(500)
    assert len(pcd) == 500
    p = np.asarray(pcd.points)
    # all samples inside the bounding box
    assert p.min() >= -1e-6 and p.max() <= 1.0 + 1e-6
    # barycentric samples satisfy x+y+z <= 1
    assert (p.sum(-1) <= 1.0 + 1e-5).all()


def test_dedup_and_cleanup():
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]], np.float32)
    t = np.asarray([[0, 1, 2], [3, 1, 2], [1, 1, 2]], np.int32)
    m = TriangleMesh(v, t)
    m.remove_duplicated_vertices()
    assert m.vertices.shape[0] == 3
    m.remove_degenerate_triangles()
    m.remove_duplicated_triangles()
    assert m.triangles.shape[0] == 1


def test_merge():
    a = unit_tetra()
    b = unit_tetra()
    b.translate([5.0, 0, 0])
    m = a + b
    assert m.vertices.shape[0] == 8
    assert m.triangles.shape[0] == 8
    assert int(np.asarray(m.triangles).max()) == 7


def test_smooth_filters_shrink_noise():
    rng = np.random.default_rng(0)
    m = unit_tetra()
    noisy = TriangleMesh(
        np.asarray(m.vertices) + rng.normal(0, 0.01, (4, 3)).astype(np.float32),
        m.triangles)
    for out in (noisy.filter_smooth_simple(2),
                noisy.filter_smooth_laplacian(3, 0.5),
                noisy.filter_smooth_taubin(3),
                noisy.filter_sharpen(1, 0.1)):
        assert np.isfinite(np.asarray(out.vertices)).all()


def test_transform_ops():
    m = unit_tetra()
    m.translate([1, 2, 3])
    c = np.asarray(m.vertices).mean(0)
    m.scale(2.0)
    np.testing.assert_allclose(np.asarray(m.vertices).mean(0), c, atol=1e-5)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 1]
    m.transform(T)
    np.testing.assert_allclose(np.asarray(m.vertices).mean(0), c + [0, 0, 1],
                               atol=1e-5)


def test_scalable_tsdf():
    from cupoch_tpu.camera import PinholeCameraIntrinsic
    from cupoch_tpu.geometry import Image, RGBDImage
    from cupoch_tpu.integration import ScalableTSDFVolume, TSDFVolumeColorType

    H, W = 48, 64
    intr = PinholeCameraIntrinsic(W, H, 48.0, 48.0, (W - 1) / 2, (H - 1) / 2)
    depth = np.full((H, W), 1.0, np.float32)
    color = np.full((H, W), 0.5, np.float32)
    rgbd = RGBDImage(Image(color[..., None]), Image(depth[..., None]))
    vol = ScalableTSDFVolume(1.0 / 16, 0.1, TSDFVolumeColorType.Gray32)
    vol.integrate(rgbd, intr, np.eye(4, dtype=np.float32))
    assert len(vol) > 0
    pcd = vol.extract_point_cloud()
    assert len(pcd) > 50
    pts = np.asarray(pcd.points)
    assert abs(np.median(pts[:, 2]) - 1.0) < vol.voxel_length
    mesh = vol.extract_triangle_mesh()
    assert mesh.has_triangles()


def test_self_intersection_detection():
    # a clean closed tetrahedron has no self-intersections
    from cupoch_tpu.geometry.trianglemesh_factory import create_tetrahedron
    tet = create_tetrahedron()
    assert not tet.is_self_intersecting()
    assert tet.get_self_intersecting_triangles().shape == (0, 2)

    # two crossing triangles far from each other's vertices
    import numpy as np
    import jax.numpy as jnp
    from cupoch_tpu.geometry.trianglemesh import TriangleMesh

    mesh = TriangleMesh(
        jnp.asarray(np.float32([
            [-1, 0, -1], [1, 0, -1], [0, 0, 1],     # tri 0 in y=0 plane
            [0, -1, 0], [0, 1, 0], [0, 0, 2],       # tri 1 crosses it
            [5, 0, 0], [6, 0, 0], [5, 1, 0],        # tri 2 far away
        ])),
        jnp.asarray(np.int32([[0, 1, 2], [3, 4, 5], [6, 7, 8]])))
    pairs = mesh.get_self_intersecting_triangles()
    assert mesh.is_self_intersecting()
    assert [0, 1] in pairs.tolist()
    assert not any(2 in p for p in pairs.tolist())
