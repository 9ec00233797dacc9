"""Primitive factory tests (reference: trianglemesh_factory.cu).
Checks vertex counts, watertightness proxies (surface area/volume), and
argument validation."""
import numpy as np
import pytest

from cupoch_tpu.geometry import TriangleMesh


def test_box():
    m = TriangleMesh.create_box(1.0, 2.0, 3.0)
    assert m.vertices.shape == (8, 3)
    assert m.triangles.shape == (12, 3)
    np.testing.assert_allclose(m.get_min_bound(), [0, 0, 0])
    np.testing.assert_allclose(m.get_max_bound(), [1, 2, 3])
    # closed box: area = 2(wh + hd + wd) = 2(2 + 6 + 3) = 22
    np.testing.assert_allclose(m.get_surface_area(), 22.0, rtol=1e-5)


def test_sphere_area():
    m = TriangleMesh.create_sphere(radius=1.0, resolution=40)
    area = m.get_surface_area()
    np.testing.assert_allclose(area, 4 * np.pi, rtol=0.02)


def test_cylinder_area():
    m = TriangleMesh.create_cylinder(radius=1.0, height=2.0, resolution=60)
    # side 2*pi*r*h + two caps 2*pi*r^2
    np.testing.assert_allclose(
        m.get_surface_area(), 2 * np.pi * 2 + 2 * np.pi, rtol=0.02)


def test_cone():
    m = TriangleMesh.create_cone(radius=1.0, height=2.0, resolution=60)
    slant = np.sqrt(1 + 4)
    np.testing.assert_allclose(
        m.get_surface_area(), np.pi * slant + np.pi, rtol=0.02)


def test_torus_area():
    m = TriangleMesh.create_torus(1.0, 0.3, 60, 40)
    np.testing.assert_allclose(
        m.get_surface_area(), 4 * np.pi ** 2 * 1.0 * 0.3, rtol=0.02)


def test_platonic_solids():
    for f, nv, nt in [(TriangleMesh.create_tetrahedron, 4, 4),
                      (TriangleMesh.create_octahedron, 6, 8),
                      (TriangleMesh.create_icosahedron, 12, 20)]:
        m = f()
        assert m.vertices.shape == (nv, 3)
        assert m.triangles.shape == (nt, 3)


def test_capsule_and_arrow_and_frame():
    cap = TriangleMesh.create_capsule(0.5, 1.0)
    assert cap.has_triangles()
    span = cap.get_max_bound() - cap.get_min_bound()
    np.testing.assert_allclose(span[2], 2.0, rtol=0.05)  # h + 2r
    arrow = TriangleMesh.create_arrow()
    assert float(arrow.get_max_bound()[2]) == pytest.approx(9.0, rel=0.05)
    frame = TriangleMesh.create_coordinate_frame(size=1.0)
    assert frame.has_vertex_colors()


def test_moebius_tube_halfsphere():
    assert TriangleMesh.create_moebius().has_triangles()
    assert TriangleMesh.create_tube().has_triangles()
    hs = TriangleMesh.create_half_sphere(resolution=30)
    np.testing.assert_allclose(hs.get_surface_area(), 2 * np.pi, rtol=0.03)


def test_invalid_args_raise():
    with pytest.raises(RuntimeError):
        TriangleMesh.create_box(-1.0)
    with pytest.raises(RuntimeError):
        TriangleMesh.create_sphere(0.0)
    with pytest.raises(RuntimeError):
        TriangleMesh.create_torus(1.0, 0.5, 1, 1)
