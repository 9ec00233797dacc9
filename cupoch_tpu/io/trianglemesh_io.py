"""TriangleMesh file IO: PLY (rply equivalent), OBJ (tinyobjloader
equivalent), STL (ascii + binary).

reference: src/cupoch/io/class_io/trianglemesh_io.cpp (dispatch) +
file_ply.cu / file_obj.cu / file_stl.cu.
"""
from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

from ..utility import console
from .pointcloud_io import _read_ply_elements


def read_triangle_mesh_ply(path: str):
    from ..geometry.trianglemesh import TriangleMesh

    els = _read_ply_elements(path)
    v = els.get("vertex")
    if v is None:
        console.log_error("[ReadPLY] no vertex element.")
    verts = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    faces = None
    for fname in ("face",):
        if fname in els:
            d = els[fname]
            key = next(iter(d))
            faces = np.asarray(d[key], np.int32)
    mesh = TriangleMesh(verts, faces if faces is not None
                        else np.zeros((0, 3), np.int32))
    if all(k in v for k in ("nx", "ny", "nz")):
        mesh.vertex_normals = np.stack(
            [v["nx"], v["ny"], v["nz"]], -1).astype(np.float32)
    if all(k in v for k in ("red", "green", "blue")):
        mesh.vertex_colors = np.stack(
            [v["red"], v["green"], v["blue"]], -1).astype(np.float32) / 255.0
    return mesh


def write_triangle_mesh_ply(path: str, mesh, write_ascii: bool = False):
    verts = np.asarray(mesh.vertices, np.float32)
    tris = np.asarray(mesh.triangles, np.int32)
    n, m = len(verts), len(tris)
    header = ["ply",
              "format ascii 1.0" if write_ascii
              else "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    has_n = mesh.has_vertex_normals()
    has_c = mesh.has_vertex_colors()
    if has_n:
        header += ["property float nx", "property float ny",
                   "property float nz"]
    if has_c:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {m}",
               "property list uchar int vertex_indices", "end_header\n"]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        cols = [verts]
        if has_n:
            cols.append(np.asarray(mesh.vertex_normals, np.float32))
        if has_c:
            cols.append(np.clip(np.asarray(mesh.vertex_colors) * 255, 0,
                                255).astype(np.uint8))
        if write_ascii:
            flat = np.column_stack([c.astype(np.float64) for c in cols])
            fmt = " ".join(["%.8g"] * (3 + (3 if has_n else 0))
                           + (["%d"] * 3 if has_c else []))
            np.savetxt(f, flat, fmt=fmt)
            np.savetxt(f, np.column_stack(
                [np.full(m, 3, np.int32), tris]), fmt="%d")
        else:
            fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
            if has_n:
                fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
            if has_c:
                fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
            rec = np.empty(n, np.dtype(fields))
            i = 0
            for c in cols:
                for j in range(c.shape[1]):
                    rec[fields[i][0]] = c[:, j]
                    i += 1
            f.write(rec.tobytes())
            frec = np.empty(m, np.dtype([("n", "u1"), ("v", "<i4", (3,))]))
            frec["n"] = 3
            frec["v"] = tris
            f.write(frec.tobytes())
    return True


def read_triangle_mesh_obj(path: str):
    """OBJ with UV/material payload: v / vt / vn / f v[/vt[/vn]]
    lines with fan triangulation, plus mtllib -> map_Kd texture
    loading (reference: file_obj.cu:83-150 — per-corner
    triangle_uvs_, uvs cleared unless every corner has one, texture
    read from the material's diffuse map)."""
    import os

    from ..geometry.trianglemesh import TriangleMesh

    verts, normals, uvs, faces = [], [], [], []
    face_uvs = []
    mtllibs = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("mtllib "):
                mtllibs.append(line.split(None, 1)[1].strip())
            elif line.startswith("f "):
                toks = [t.split("/") for t in line.split()[1:]]
                idx = [int(t[0]) for t in toks]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                ti = [int(t[1]) - 1 if len(t) > 1 and t[1] else -1
                      for t in toks]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
                    face_uvs.extend([ti[0], ti[k], ti[k + 1]])
    mesh = TriangleMesh(np.asarray(verts, np.float32),
                        np.asarray(faces, np.int32) if faces
                        else np.zeros((0, 3), np.int32))
    if normals and len(normals) == len(verts):
        mesh.vertex_normals = np.asarray(normals, np.float32)
    # uvs only when EVERY corner carries one (file_obj.cu:137-140)
    if uvs and face_uvs and all(t >= 0 for t in face_uvs):
        uv_arr = np.asarray(uvs, np.float32)
        mesh.triangle_uvs = uv_arr[np.asarray(face_uvs, np.int64)]
    # texture via the first material's diffuse map (file_obj.cu:148)
    base = os.path.dirname(os.path.abspath(path))
    for lib in mtllibs:
        mtl_path = os.path.join(base, lib)
        if not os.path.exists(mtl_path):
            continue
        with open(mtl_path, "r", errors="replace") as mf:
            for line in mf:
                if line.strip().startswith("map_Kd"):
                    tex = os.path.join(base,
                                       line.split(None, 1)[1].strip())
                    if os.path.exists(tex):
                        from .image_io import read_image

                        mesh.texture = read_image(tex)
                        break
        if mesh.texture is not None:
            break
    return mesh


def write_triangle_mesh_obj(path: str, mesh, write_triangle_uvs=True):
    """OBJ writer with per-corner vt lines and a sidecar .mtl +
    texture image when the mesh carries them (reference:
    file_obj.cu:163-240)."""
    import os

    verts = np.asarray(mesh.vertices)
    tris = np.asarray(mesh.triangles) + 1
    write_triangle_uvs = (write_triangle_uvs
                          and getattr(mesh, "has_triangle_uvs",
                                      lambda: False)())
    base, _ = os.path.splitext(path)
    name = os.path.basename(base)
    has_tex = getattr(mesh, "has_texture", lambda: False)()
    with open(path, "w") as f:
        f.write("# exported by cupoch_tpu\n")
        if write_triangle_uvs or has_tex:
            f.write(f"mtllib {name}.mtl\n")
        np.savetxt(f, verts, fmt="v %.8g %.8g %.8g")
        if write_triangle_uvs:
            uv = np.asarray(mesh.triangle_uvs)
            np.savetxt(f, uv, fmt="vt %.8g %.8g")
            f.write(f"usemtl {name}\n")
            corner = np.arange(1, uv.shape[0] + 1).reshape(-1, 3)
            rows = np.stack([tris[:, 0], corner[:, 0],
                             tris[:, 1], corner[:, 1],
                             tris[:, 2], corner[:, 2]], -1)
            np.savetxt(f, rows, fmt="f %d/%d %d/%d %d/%d")
        else:
            np.savetxt(f, tris, fmt="f %d %d %d")
    if write_triangle_uvs or has_tex:
        with open(base + ".mtl", "w") as mf:
            mf.write(f"newmtl {name}\nKa 1 1 1\nKd 1 1 1\nKs 0 0 0\n")
            if has_tex:
                mf.write(f"map_Kd {name}.png\n")
        if has_tex:
            from .image_io import write_image

            write_image(base + ".png", mesh.texture)
    return True


def read_triangle_mesh_stl(path: str):
    """STL binary or ascii (reference: file_stl.cu). Vertices are
    deduplicated after load to recover shared topology."""
    from ..geometry.trianglemesh import TriangleMesh

    with open(path, "rb") as f:
        head = f.read(80)
        rest = f.read()
    is_ascii = head[:5] == b"solid" and b"facet" in (head + rest[:512])
    if is_ascii:
        verts = []
        for line in (head + rest).decode("ascii", "replace").splitlines():
            s = line.strip()
            if s.startswith("vertex"):
                verts.append([float(x) for x in s.split()[1:4]])
        tri_pts = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    else:
        n = struct.unpack("<I", rest[:4])[0]
        dt = np.dtype([("normal", "<f4", (3,)), ("v", "<f4", (3, 3)),
                       ("attr", "<u2")])
        rec = np.frombuffer(rest[4:4 + dt.itemsize * n], dt, n)
        tri_pts = rec["v"].astype(np.float32)
    flat = tri_pts.reshape(-1, 3)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    mesh = TriangleMesh(uniq, inv.reshape(-1, 3).astype(np.int32))
    return mesh


def write_triangle_mesh_stl(path: str, mesh):
    verts = np.asarray(mesh.vertices, np.float32)
    tris = np.asarray(mesh.triangles, np.int32)
    v = verts[tris]                                    # [M,3,3]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    rec = np.zeros(len(tris), np.dtype(
        [("normal", "<f4", (3,)), ("v", "<f4", (3, 3)), ("attr", "<u2")]))
    rec["normal"] = nrm
    rec["v"] = v
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        f.write(rec.tobytes())
    return True


_READERS = {
    "ply": read_triangle_mesh_ply,
    "obj": read_triangle_mesh_obj,
    "stl": read_triangle_mesh_stl,
}
_WRITERS = {
    "ply": write_triangle_mesh_ply,
    "obj": write_triangle_mesh_obj,
    "stl": write_triangle_mesh_stl,
}


def read_triangle_mesh(path: str, format: str = "auto"):
    ext = (os.path.splitext(path)[1][1:].lower() if format == "auto"
           else format)
    fn = _READERS.get(ext)
    if fn is None:
        console.log_error(
            f"Read geometry::TriangleMesh failed: unknown file extension "
            f"{ext}.")
    mesh = fn(path)
    console.log_debug("Read TriangleMesh: %d vertices, %d triangles.",
                      int(mesh.vertices.shape[0]),
                      int(mesh.triangles.shape[0]))
    return mesh


def write_triangle_mesh(path: str, mesh, write_ascii: bool = False,
                        format: str = "auto") -> bool:
    ext = (os.path.splitext(path)[1][1:].lower() if format == "auto"
           else format)
    fn = _WRITERS.get(ext)
    if fn is None:
        console.log_error(
            f"Write geometry::TriangleMesh failed: unknown file extension "
            f"{ext}.")
    if ext == "ply":
        return fn(path, mesh, write_ascii)
    return fn(path, mesh)
