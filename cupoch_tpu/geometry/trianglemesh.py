"""TriangleMesh container (reference: src/cupoch/geometry/trianglemesh.h:30-330,
meshbase.h).

vertices [N,3] f32, triangles [M,3] i32, optional normals/colors/uvs as
jax Arrays; algorithms operate on fixed-shape arrays (vmap/segment_sum)
and eager wrappers compact on host.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console, transforms
from .boundingvolume import AxisAlignedBoundingBox, OrientedBoundingBox
from .geometry import Geometry3D, GeometryType, asarray_f32


class MeshBase(Geometry3D):
    """reference: geometry/meshbase.h."""

    def __init__(self, gtype=GeometryType.TriangleMesh):
        super().__init__(gtype)
        self.vertices = np.zeros((0, 3), np.float32)
        self.vertex_normals = None
        self.vertex_colors = None

    @property
    def vertices(self):
        return self._vertices

    @vertices.setter
    def vertices(self, v):
        self._vertices = asarray_f32(v)

    def _primary_points(self):
        return self.vertices

    def has_vertices(self):
        return self.vertices.shape[0] > 0

    def has_vertex_normals(self):
        return (self.vertex_normals is not None and
                self.vertex_normals.shape[0] == self.vertices.shape[0] and
                self.vertices.shape[0] > 0)

    def has_vertex_colors(self):
        return (self.vertex_colors is not None and
                self.vertex_colors.shape[0] == self.vertices.shape[0] and
                self.vertices.shape[0] > 0)

    def is_empty(self):
        return not self.has_vertices()

    def normalize_normals(self):
        if self.has_vertex_normals():
            n = self.vertex_normals
            self.vertex_normals = n / jnp.maximum(
                jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return self

    def paint_uniform_color(self, color):
        self.vertex_colors = jnp.broadcast_to(
            jnp.asarray(color, jnp.float32),
            (int(self.vertices.shape[0]), 3))
        return self

    def transform(self, T):
        T = jnp.asarray(T, jnp.float32)
        self.vertices = transforms.transform_points(T, self.vertices)
        if self.has_vertex_normals():
            self.vertex_normals = transforms.rotate_normals(T, self.vertex_normals)
        return self

    def translate(self, t, relative=True):
        t = jnp.asarray(t, jnp.float32)
        if relative:
            self.vertices = self.vertices + t
        else:
            self.vertices = self.vertices - jnp.mean(self.vertices, 0) + t
        return self

    def scale(self, s, center=True):
        if center:
            c = jnp.mean(self.vertices, 0)
            self.vertices = (self.vertices - c) * s + c
        else:
            self.vertices = self.vertices * s
        return self

    def rotate(self, R, center=True):
        R = jnp.asarray(R, jnp.float32)
        if center:
            c = jnp.mean(self.vertices, 0)
            self.vertices = (self.vertices - c) @ R.T + c
        else:
            self.vertices = self.vertices @ R.T
        if self.has_vertex_normals():
            self.vertex_normals = self.vertex_normals @ R.T
        return self


class TriangleMesh(MeshBase):
    """reference: geometry/trianglemesh.h:30."""

    def __init__(self, vertices=None, triangles=None):
        super().__init__(GeometryType.TriangleMesh)
        if vertices is not None:
            self.vertices = vertices
        self.triangles = (np.zeros((0, 3), np.int32) if triangles is None
                          else triangles)
        self.triangle_normals = None
        self.triangle_uvs = None
        self.texture = None

    @property
    def triangles(self):
        return self._triangles

    @triangles.setter
    def triangles(self, v):
        self._triangles = jnp.asarray(np.asarray(v, np.int32).reshape(-1, 3))

    def has_triangles(self):
        return self.triangles.shape[0] > 0

    def has_triangle_normals(self):
        return (self.triangle_normals is not None and
                self.triangle_normals.shape[0] == self.triangles.shape[0] and
                self.triangles.shape[0] > 0)

    def has_triangle_uvs(self):
        return (self.triangle_uvs is not None and
                self.triangle_uvs.shape[0] == 3 * self.triangles.shape[0])

    def has_texture(self):
        """reference: trianglemesh.h texture_ payload (HasTexture)."""
        return self.texture is not None and self.texture.has_data()

    def sample_texture_vertex_colors(self):
        """Per-vertex colors by sampling `texture` at each vertex's
        first triangle-corner UV (host renderer / viewer convenience;
        the reference feeds uv+texture straight to its GL shader,
        visualization/shader/texture_simple_shader.cu)."""
        if not (self.has_texture() and self.has_triangle_uvs()):
            return None
        tex = np.asarray(self.texture.data)
        if tex.ndim == 2:
            tex = tex[..., None]
        h, w = tex.shape[:2]
        uv = np.asarray(self.triangle_uvs)          # [3M, 2]
        corners = np.asarray(self.triangles).reshape(-1)
        nv = int(self.vertices.shape[0])
        first = np.full(nv, -1, np.int64)
        # reversed so the FIRST corner occurrence wins
        first[corners[::-1]] = np.arange(len(corners))[::-1]
        uvv = uv[np.clip(first, 0, len(corners) - 1)]
        px = np.clip((uvv[:, 0] * (w - 1)).astype(np.int64), 0, w - 1)
        py = np.clip(((1.0 - uvv[:, 1]) * (h - 1)).astype(np.int64),
                     0, h - 1)
        c = tex[py, px].astype(np.float32)
        if c.max() > 1.0 + 1e-6:
            c = c / 255.0
        if c.shape[-1] == 1:
            c = np.repeat(c, 3, -1)
        return c[:, :3]

    def __repr__(self):
        return (f"TriangleMesh with {int(self.vertices.shape[0])} points and "
                f"{int(self.triangles.shape[0])} triangles.")

    def __add__(self, other: "TriangleMesh") -> "TriangleMesh":
        nv = int(self.vertices.shape[0])
        out = TriangleMesh(
            jnp.concatenate([self.vertices, other.vertices], 0),
            jnp.concatenate([self.triangles, other.triangles + nv], 0))
        if self.has_vertex_normals() and other.has_vertex_normals():
            out.vertex_normals = jnp.concatenate(
                [self.vertex_normals, other.vertex_normals], 0)
        if self.has_vertex_colors() and other.has_vertex_colors():
            out.vertex_colors = jnp.concatenate(
                [self.vertex_colors, other.vertex_colors], 0)
        return out

    def __iadd__(self, other):
        m = self + other
        self.vertices, self.triangles = m.vertices, m.triangles
        self.vertex_normals = m.vertex_normals
        self.vertex_colors = m.vertex_colors
        return self

    # -- normals (reference: trianglemesh.cu ComputeTriangleNormals /
    #    ComputeVertexNormals) ------------------------------------------
    def compute_triangle_normals(self, normalized: bool = True):
        v = self.vertices
        t = self.triangles
        n = _triangle_normals(v, t)
        if normalized:
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        self.triangle_normals = n
        return self

    def compute_vertex_normals(self, normalized: bool = True):
        v = self.vertices
        t = self.triangles
        fn = _triangle_normals(v, t)
        vn = jnp.zeros_like(v)
        for k in range(3):
            vn = vn.at[t[:, k]].add(fn)
        if normalized:
            vn = vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        self.vertex_normals = vn
        self.triangle_normals = fn / jnp.maximum(
            jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        return self

    # -- measures -------------------------------------------------------
    def get_surface_area(self) -> float:
        """reference: trianglemesh.cu GetSurfaceArea."""
        return float(jnp.sum(_triangle_areas(self.vertices, self.triangles)))

    def get_volume(self) -> float:
        """Signed volume via divergence theorem (watertight meshes)."""
        v = self.vertices
        t = self.triangles
        v0, v1, v2 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
        return float(jnp.sum(jnp.einsum("ij,ij->i", v0, jnp.cross(v1, v2))) / 6.0)

    # -- cleanup (reference: trianglemesh.cu Remove*) -------------------
    def remove_duplicated_vertices(self):
        v = np.asarray(self.vertices)
        uniq, inv = np.unique(v.round(decimals=7), axis=0, return_inverse=True)
        # keep first occurrence ordering
        order = np.zeros(len(uniq), np.int64)
        seen = np.full(len(uniq), -1, np.int64)
        new_index = np.full(len(uniq), -1, np.int64)
        keep_rows = []
        for i, u in enumerate(inv):
            if seen[u] < 0:
                seen[u] = len(keep_rows)
                keep_rows.append(i)
        remap = seen[inv]
        self.vertices = v[np.asarray(keep_rows)]
        if self.vertex_normals is not None and len(self.vertex_normals):
            self.vertex_normals = np.asarray(self.vertex_normals)[np.asarray(keep_rows)]
        if self.vertex_colors is not None and len(self.vertex_colors):
            self.vertex_colors = np.asarray(self.vertex_colors)[np.asarray(keep_rows)]
        if self.has_triangles():
            self.triangles = remap[np.asarray(self.triangles)]
        return self

    def remove_duplicated_triangles(self):
        t = np.asarray(self.triangles)
        key = np.sort(t, axis=1)
        _, idx = np.unique(key, axis=0, return_index=True)
        self.triangles = t[np.sort(idx)]
        return self

    def remove_degenerate_triangles(self):
        t = np.asarray(self.triangles)
        ok = ((t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2]) &
              (t[:, 2] != t[:, 0]))
        self.triangles = t[ok]
        return self

    def remove_unreferenced_vertices(self):
        t = np.asarray(self.triangles)
        v = np.asarray(self.vertices)
        used = np.zeros(len(v), bool)
        used[t.reshape(-1)] = True
        remap = np.cumsum(used) - 1
        self.vertices = v[used]
        if self.vertex_normals is not None and len(self.vertex_normals):
            self.vertex_normals = np.asarray(self.vertex_normals)[used]
        if self.vertex_colors is not None and len(self.vertex_colors):
            self.vertex_colors = np.asarray(self.vertex_colors)[used]
        self.triangles = remap[t]
        return self

    # -- sampling (reference: trianglemesh.cu SamplePointsUniformly:
    #    prefix-sum over triangle areas + per-point barycentric draw) ----
    def sample_points_uniformly(self, number_of_points: int, seed: int = 0):
        from .pointcloud import PointCloud

        if number_of_points <= 0 or not self.has_triangles():
            console.log_error("[sample_points_uniformly] Invalid input.")
        key = jax.random.PRNGKey(seed)
        pts, normals, colors = _sample_uniform(
            self.vertices, self.triangles,
            self.vertex_normals if self.has_vertex_normals() else None,
            self.vertex_colors if self.has_vertex_colors() else None,
            number_of_points, key)
        pcd = PointCloud(pts)
        if normals is not None:
            pcd.normals = normals
        if colors is not None:
            pcd.colors = colors
        return pcd

    # -- filters (reference: trianglemesh.cu FilterSharpen /
    #    FilterSmoothSimple / Laplacian / Taubin) -----------------------
    def _adjacency_sums(self):
        """Sum of neighbor vertices and neighbor counts via edges."""
        t = self.triangles
        v = self.vertices
        s = jnp.zeros_like(v)
        c = jnp.zeros((v.shape[0], 1), jnp.float32)
        for a, b in ((0, 1), (1, 2), (2, 0)):
            s = s.at[t[:, a]].add(v[t[:, b]])
            s = s.at[t[:, b]].add(v[t[:, a]])
            c = c.at[t[:, a]].add(1.0)
            c = c.at[t[:, b]].add(1.0)
        return s, c

    def filter_sharpen(self, number_of_iterations: int = 1, strength: float = 1.0):
        out = TriangleMesh(self.vertices, self.triangles)
        out.vertex_normals = self.vertex_normals
        out.vertex_colors = self.vertex_colors
        for _ in range(number_of_iterations):
            s, c = out._adjacency_sums()
            out.vertices = out.vertices + strength * (
                out.vertices * c - s) / jnp.maximum(c, 1.0)
        return out

    def filter_smooth_simple(self, number_of_iterations: int = 1):
        out = TriangleMesh(self.vertices, self.triangles)
        out.vertex_normals = self.vertex_normals
        out.vertex_colors = self.vertex_colors
        for _ in range(number_of_iterations):
            s, c = out._adjacency_sums()
            out.vertices = (out.vertices + s) / (c + 1.0)
        return out

    def filter_smooth_laplacian(self, number_of_iterations: int = 1,
                                lambda_: float = 0.5):
        out = TriangleMesh(self.vertices, self.triangles)
        out.vertex_normals = self.vertex_normals
        out.vertex_colors = self.vertex_colors
        for _ in range(number_of_iterations):
            s, c = out._adjacency_sums()
            lap = s / jnp.maximum(c, 1.0) - out.vertices
            out.vertices = out.vertices + lambda_ * lap
        return out

    def filter_smooth_taubin(self, number_of_iterations: int = 1,
                             lambda_: float = 0.5, mu: float = -0.53):
        out = TriangleMesh(self.vertices, self.triangles)
        out.vertex_normals = self.vertex_normals
        out.vertex_colors = self.vertex_colors
        for _ in range(number_of_iterations):
            for factor in (lambda_, mu):
                s, c = out._adjacency_sums()
                lap = s / jnp.maximum(c, 1.0) - out.vertices
                out.vertices = out.vertices + factor * lap
        return out

    def get_axis_aligned_bounding_box(self):
        return AxisAlignedBoundingBox.create_from_points(self.vertices)

    def get_oriented_bounding_box(self):
        return OrientedBoundingBox.create_from_points(self.vertices)

    def get_self_intersecting_triangles(self) -> np.ndarray:
        """Pairs of intersecting, non-adjacent triangles.

        reference: GetSelfIntersectingTriangles (trianglemesh.h:197,
        trianglemesh.cu) — the reference tests all O(F^2) pairs on
        GPU; here candidate pairs come from the bucket AABB broad
        phase (collision.py) and only candidates run the exact
        Möller tri-tri test, batched on device."""
        from ..collision.collision import (
            _DENSE_LIMIT, _aabb_overlap_pairs, _bucket_overlap_pairs,
            _pairs_from_matrix,
        )
        from .intersection_test import tri_tri

        v = np.asarray(self.vertices)
        t = np.asarray(self.triangles)
        F = len(t)
        if F == 0:
            return np.zeros((0, 2), np.int32)
        tv = v[t]                      # [F, 3, 3]
        lo = tv.min(1).astype(np.float32)
        hi = tv.max(1).astype(np.float32)
        if F * F > _DENSE_LIMIT:
            got = _bucket_overlap_pairs(lo, hi, lo, hi, 0.0)
        else:
            got = None
        if got is not None:
            pairs = got[0]
        else:
            pairs = _pairs_from_matrix(_aabb_overlap_pairs(
                jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(lo),
                jnp.asarray(hi), 0.0))
        pairs = pairs[pairs[:, 0] < pairs[:, 1]]
        if len(pairs) == 0:
            return np.zeros((0, 2), np.int32)
        # adjacent triangles (sharing any vertex) are not
        # self-intersections (same convention as the reference)
        ta = t[pairs[:, 0]]
        tb = t[pairs[:, 1]]
        shared = (ta[:, :, None] == tb[:, None, :]).any((1, 2))
        pairs = pairs[~shared]
        if len(pairs) == 0:
            return np.zeros((0, 2), np.int32)
        a = jnp.asarray(tv[pairs[:, 0]])
        b = jnp.asarray(tv[pairs[:, 1]])
        hi_ = tri_tri(a[:, 0], a[:, 1], a[:, 2],
                      b[:, 0], b[:, 1], b[:, 2])
        return pairs[np.asarray(hi_)].astype(np.int32)

    def is_self_intersecting(self) -> bool:
        """reference: IsSelfIntersecting (trianglemesh.h:193)."""
        return len(self.get_self_intersecting_triangles()) > 0


def _triangle_normals(v, t):
    v0 = v[t[:, 0]]
    return jnp.cross(v[t[:, 1]] - v0, v[t[:, 2]] - v0)


def _triangle_areas(v, t):
    return 0.5 * jnp.linalg.norm(_triangle_normals(v, t), axis=-1)


def _sample_uniform(v, t, vn, vc, n_points: int, key):
    areas = _triangle_areas(v, t)
    p = areas / jnp.maximum(jnp.sum(areas), 1e-12)
    k1, k2 = jax.random.split(key)
    tri_idx = jax.random.choice(k1, t.shape[0], (n_points,), p=p)
    r = jax.random.uniform(k2, (n_points, 2))
    r1 = jnp.sqrt(r[:, :1])
    a = 1 - r1
    b = r1 * (1 - r[:, 1:])
    c = r1 * r[:, 1:]
    tv = t[tri_idx]
    pts = a * v[tv[:, 0]] + b * v[tv[:, 1]] + c * v[tv[:, 2]]

    def interp(attr):
        return a * attr[tv[:, 0]] + b * attr[tv[:, 1]] + c * attr[tv[:, 2]]

    normals = interp(vn) if vn is not None else None
    colors = interp(vc) if vc is not None else None
    return pts, normals, colors


# -- primitive factories (reference: trianglemesh_factory.cu:391-900) -----
def _bind_factories():
    from . import trianglemesh_factory as F

    TriangleMesh.create_tetrahedron = staticmethod(F.create_tetrahedron)
    TriangleMesh.create_octahedron = staticmethod(F.create_octahedron)
    TriangleMesh.create_icosahedron = staticmethod(F.create_icosahedron)
    TriangleMesh.create_box = staticmethod(F.create_box)
    TriangleMesh.create_sphere = staticmethod(F.create_sphere)
    TriangleMesh.create_half_sphere = staticmethod(F.create_half_sphere)
    TriangleMesh.create_cylinder = staticmethod(F.create_cylinder)
    TriangleMesh.create_tube = staticmethod(F.create_tube)
    TriangleMesh.create_capsule = staticmethod(F.create_capsule)
    TriangleMesh.create_cone = staticmethod(F.create_cone)
    TriangleMesh.create_torus = staticmethod(F.create_torus)
    TriangleMesh.create_arrow = staticmethod(F.create_arrow)
    TriangleMesh.create_coordinate_frame = staticmethod(
        F.create_coordinate_frame)
    TriangleMesh.create_moebius = staticmethod(F.create_moebius)


_bind_factories()
