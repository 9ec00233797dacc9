"""HTML viewer export: embedded data round-trip + camera-matrix
verification against a numpy mirror of the viewer's JS."""
import base64
import json
import re

import numpy as np
import pytest


def _extract_scene(html: str) -> dict:
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    assert m, "SCENE literal not found"
    return json.loads(m.group(1))


@pytest.fixture()
def exported(tmp_path):
    from cupoch_tpu.geometry import PointCloud
    from cupoch_tpu.geometry.trianglemesh_factory import create_box
    from cupoch_tpu.visualization import draw_geometries

    rng = np.random.default_rng(3)
    pts = rng.uniform(size=(5000, 3)).astype(np.float32)
    cols = rng.uniform(size=(5000, 3)).astype(np.float32)
    pc = PointCloud(pts)
    pc.colors = cols
    box = create_box(1.0, 1.0, 1.0)
    path = tmp_path / "scene.html"
    ok = draw_geometries([pc, box], filename=str(path))
    assert ok
    return pts, cols, path.read_text()


def test_roundtrip_points_colors(exported):
    pts, cols, html = exported
    scene = _extract_scene(html)
    assert len(scene["geoms"]) == 2
    g0 = scene["geoms"][0]
    dec = np.frombuffer(base64.b64decode(g0["points"]), np.float32)
    np.testing.assert_array_equal(dec.reshape(-1, 3), pts)
    cdec = np.frombuffer(base64.b64decode(g0["colors"]), np.float32)
    np.testing.assert_allclose(cdec.reshape(-1, 3),
                               np.clip(cols, 0, 1))
    # mesh rides as a wireframe edge list over its vertices
    g1 = scene["geoms"][1]
    assert g1["mode"] == "lines"
    idx = np.frombuffer(base64.b64decode(g1["lines"]), np.uint32)
    nv = np.frombuffer(base64.b64decode(g1["points"]),
                       np.float32).reshape(-1, 3).shape[0]
    assert idx.size % 2 == 0 and idx.max() < nv


def test_html_self_contained(exported):
    _, _, html = exported
    assert html.startswith("<!DOCTYPE html>")
    assert "%SCENE%" not in html and "%TITLE%" not in html
    # zero network access: no external script/style references
    assert "http://" not in html and "https://" not in html
    assert "webgl" in html


def _js_mvp(eye, target, diag, w, h):
    """Numpy mirror of the viewer's mat() (column-major)."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, [0.0, 1.0, 0.0])
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    near, far = diag * 0.01, diag * 20
    fy = 1 / np.tan(0.30)
    fx = fy * h / w
    tx, ty, tz = -r @ eye, -u @ eye, f @ eye
    A = -(far + near) / (far - near)
    B = -2 * far * near / (far - near)
    M = np.zeros((4, 4))
    M[:, 0] = [fx * r[0], fy * u[0], A * -f[0], f[0]]
    M[:, 1] = [fx * r[1], fy * u[1], A * -f[1], f[1]]
    M[:, 2] = [fx * r[2], fy * u[2], A * -f[2], f[2]]
    M[:, 3] = [fx * tx, fy * ty, A * tz + B, -tz]
    return M


def test_camera_matrix_maps_scene_into_clip_volume():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(500, 3))
    ctr = np.zeros(3)
    diag = 2 * np.sqrt(3)
    # the viewer's reset pose: theta=0.5, phi=0.9, dist=1.6*diag
    theta, phi, dist = 0.5, 0.9, 1.6 * diag
    eye = ctr + dist * np.asarray([
        np.cos(phi) * np.cos(theta), np.sin(phi),
        np.cos(phi) * np.sin(theta)])
    M = _js_mvp(eye, ctr, diag, 1280, 720)
    hom = np.concatenate([pts, np.ones((len(pts), 1))], -1)
    clip = hom @ M.T
    w = clip[:, 3]
    assert (w > 0).all(), "scene behind the camera"
    ndc = clip[:, :3] / w[:, None]
    # whole unit cube lands inside the clip volume at the reset pose
    assert (np.abs(ndc) <= 1.0).all()
    # depth ordering: nearer points get smaller ndc z
    d = np.linalg.norm(pts - eye, axis=1)
    lo, hi = np.argmin(d), np.argmax(d)
    assert ndc[lo, 2] < ndc[hi, 2]
