"""Textured OBJ round-trip (reference: file_obj.cu uv/material
handling) + texture-sampled vertex colors."""
import numpy as np

from cupoch_tpu.geometry import Image
from cupoch_tpu.geometry.trianglemesh_factory import create_box
from cupoch_tpu.io.trianglemesh_io import (
    read_triangle_mesh_obj,
    write_triangle_mesh_obj,
)


def _textured_box():
    mesh = create_box(1.0, 1.0, 1.0)
    m = np.asarray(mesh.triangles).shape[0]
    rng = np.random.default_rng(0)
    mesh.triangle_uvs = rng.uniform(size=(3 * m, 2)).astype(np.float32)
    # 8x8 RGB gradient texture
    g = np.linspace(0, 1, 8, dtype=np.float32)
    tex = np.stack(list(np.meshgrid(g, g))
                   + [np.full((8, 8), 0.5, np.float32)], -1)
    mesh.texture = Image(tex)
    return mesh


def test_obj_uv_texture_roundtrip(tmp_path):
    mesh = _textured_box()
    path = tmp_path / "box.obj"
    assert write_triangle_mesh_obj(str(path), mesh)
    assert (tmp_path / "box.mtl").exists()
    assert (tmp_path / "box.png").exists()
    back = read_triangle_mesh_obj(str(path))
    assert back.has_triangle_uvs()
    np.testing.assert_allclose(np.asarray(back.triangle_uvs),
                               np.asarray(mesh.triangle_uvs),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.vertices),
                               np.asarray(mesh.vertices), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.triangles),
                                  np.asarray(mesh.triangles))
    assert back.has_texture()
    assert np.asarray(back.texture.data).shape[:2] == (8, 8)


def test_obj_without_uvs_unchanged(tmp_path):
    mesh = create_box(1.0, 1.0, 1.0)
    path = tmp_path / "plain.obj"
    assert write_triangle_mesh_obj(str(path), mesh)
    assert not (tmp_path / "plain.mtl").exists()
    back = read_triangle_mesh_obj(str(path))
    assert not back.has_triangle_uvs()
    np.testing.assert_array_equal(np.asarray(back.triangles),
                                  np.asarray(mesh.triangles))


def test_texture_vertex_colors():
    mesh = _textured_box()
    c = mesh.sample_texture_vertex_colors()
    assert c is not None
    assert c.shape == (np.asarray(mesh.vertices).shape[0], 3)
    assert (c >= 0).all() and (c <= 1).all()
