"""Collision primitives (Box / Sphere / Capsule / Cylinder).

reference: src/cupoch/collision/primitives.{h,cu} (primitives.h:36-257).
Each primitive carries a 4x4 transform; voxelization samples voxel
centers with an exact vectorised inside-test (the reference's
voxelization functors do per-voxel signed distance tests,
primitives.cu:43-200), and sweeping interpolates the transform.
"""
from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from ..utility import console


class PrimitiveType(enum.IntEnum):
    # values match primitives.h:38-44
    Unspecified = 0
    Box = 1
    Sphere = 2
    Capsule = 3
    Cylinder = 4
    Mesh = 5


class Primitive:
    def __init__(self, ptype=PrimitiveType.Unspecified, transform=None):
        self.type = ptype
        self.transform = (np.eye(4, dtype=np.float32) if transform is None
                          else np.asarray(transform, np.float32))

    def transform_(self, T):
        self.transform = self.transform @ np.asarray(T, np.float32)
        return self

    def get_axis_aligned_bounding_box(self):
        from ..geometry.boundingvolume import AxisAlignedBoundingBox

        lo, hi = self._aabb_bounds()
        return AxisAlignedBoundingBox(lo, hi)

    def _aabb_bounds(self):
        raise NotImplementedError

    def _contains(self, pts: np.ndarray, margin: float = 0.0) -> np.ndarray:
        """[N] bool: world-space points inside (inflated) primitive."""
        raise NotImplementedError

    def _to_local(self, pts: np.ndarray) -> np.ndarray:
        R = self.transform[:3, :3]
        t = self.transform[:3, 3]
        return (pts - t) @ R  # R^T applied from the right

    # -- conversions ---------------------------------------------------------
    def create_mesh(self):
        raise NotImplementedError

    def create_voxel_grid(self, voxel_size: float):
        """Solid voxelization by center-inside test (reference:
        CreateVoxelGrid, primitives.cu)."""
        from ..geometry.voxelgrid import VoxelGrid
        import jax.numpy as jnp

        lo, hi = self._aabb_bounds()
        lo = lo - voxel_size * 0.5
        out = VoxelGrid()
        out.voxel_size = float(voxel_size)
        out.origin = lo.astype(np.float32)
        num = np.maximum(np.ceil((hi - lo) / voxel_size).astype(int) + 1, 1)
        keys = np.stack(np.meshgrid(*[np.arange(n) for n in num],
                                    indexing="ij"), -1).reshape(-1, 3)
        centers = lo + (keys + 0.5) * voxel_size
        inside = self._contains(centers)
        out.voxels_keys = jnp.asarray(keys[inside].astype(np.int32))
        out.voxels_colors = jnp.ones((int(inside.sum()), 3), jnp.float32)
        return out

    def create_voxel_grid_with_sweeping(self, voxel_size: float,
                                        dst_transform, sampling: int = 10):
        """Union of voxelizations along an interpolated motion
        (reference: CreateVoxelGridWithSweeping, primitives.cu)."""
        from ..geometry.voxelgrid import VoxelGrid
        import jax.numpy as jnp

        src = self.transform.copy()
        dst = np.asarray(dst_transform, np.float32)
        all_keys = []
        origin = None
        # common origin: AABB of both endpoint poses
        lo0, hi0 = self._aabb_bounds()
        self.transform = dst
        lo1, hi1 = self._aabb_bounds()
        self.transform = src
        lo = np.minimum(lo0, lo1) - voxel_size * 0.5
        hi = np.maximum(hi0, hi1)
        for i in range(sampling):
            a = i / max(sampling - 1, 1)
            T = src.copy()
            T[:3, 3] = (1 - a) * src[:3, 3] + a * dst[:3, 3]
            R0, R1 = src[:3, :3], dst[:3, :3]
            # slerp via axis-angle of the relative rotation
            T[:3, :3] = _rot_interp(R0, R1, a)
            self.transform = T
            lo_i, hi_i = self._aabb_bounds()
            num = np.maximum(
                np.ceil((hi_i - lo_i) / voxel_size).astype(int) + 1, 1)
            keys = np.stack(np.meshgrid(*[np.arange(n) for n in num],
                                        indexing="ij"), -1).reshape(-1, 3)
            centers = (lo_i - voxel_size * 0.5) + (keys + 0.5) * voxel_size
            inside = self._contains(centers)
            world_keys = np.floor(
                (centers[inside] - lo) / voxel_size).astype(np.int32)
            all_keys.append(world_keys)
        self.transform = src
        out = VoxelGrid()
        out.voxel_size = float(voxel_size)
        out.origin = lo.astype(np.float32)
        uniq = (np.unique(np.concatenate(all_keys, 0), axis=0)
                if all_keys else np.zeros((0, 3), np.int32))
        out.voxels_keys = jnp.asarray(uniq.astype(np.int32))
        out.voxels_colors = jnp.ones((len(uniq), 3), jnp.float32)
        return out


def _rot_interp(R0, R1, a):
    """Geodesic interpolation between rotations via axis-angle."""
    M = R0.T @ R1
    # log of rotation matrix
    cos_t = np.clip((np.trace(M) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(cos_t)
    if theta < 1e-8:
        return R0
    w = (1 / (2 * np.sin(theta))) * np.asarray(
        [M[2, 1] - M[1, 2], M[0, 2] - M[2, 0], M[1, 0] - M[0, 1]])
    wa = w * theta * a
    t = np.linalg.norm(wa)
    K = np.asarray([[0, -wa[2], wa[1]], [wa[2], 0, -wa[0]],
                    [-wa[1], wa[0], 0]]) / max(t, 1e-12)
    Ra = np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)
    return (R0 @ Ra).astype(np.float32)


class Box(Primitive):
    """reference: primitives.h:66-86."""

    def __init__(self, lengths=(0.0, 0.0, 0.0), transform=None):
        super().__init__(PrimitiveType.Box, transform)
        self.lengths = np.asarray(lengths, np.float32)

    def _aabb_bounds(self):
        ra = np.abs(self.transform[:3, :3]) @ (0.5 * self.lengths)
        t = self.transform[:3, 3]
        return t - ra, t + ra

    def _contains(self, pts, margin: float = 0.0):
        local = self._to_local(np.asarray(pts, np.float32))
        return np.all(np.abs(local) <= self.lengths / 2 + margin, -1)

    def create_mesh(self):
        from ..geometry.trianglemesh import TriangleMesh

        m = TriangleMesh.create_box(*map(float, self.lengths))
        m.translate(-self.lengths / 2)
        m.transform(self.transform)
        return m


class Sphere(Primitive):
    """reference: primitives.h:88-113."""

    def __init__(self, radius: float = 0.0, center=(0.0, 0.0, 0.0)):
        super().__init__(PrimitiveType.Sphere)
        self.radius = float(radius)
        self.transform[:3, 3] = np.asarray(center, np.float32)

    def _aabb_bounds(self):
        t = self.transform[:3, 3]
        r = self.radius
        return t - r, t + r

    def _contains(self, pts, margin: float = 0.0):
        d = np.linalg.norm(np.asarray(pts, np.float32)
                           - self.transform[:3, 3], axis=-1)
        return d <= self.radius + margin

    def create_mesh(self):
        from ..geometry.trianglemesh import TriangleMesh

        m = TriangleMesh.create_sphere(self.radius)
        m.transform(self.transform)
        return m


class Capsule(Primitive):
    """Segment along local z with hemispherical caps
    (reference: primitives.h:115-152)."""

    def __init__(self, radius: float = 0.0, height: float = 0.0,
                 transform=None):
        super().__init__(PrimitiveType.Capsule, transform)
        self.radius = float(radius)
        self.height = float(height)

    def _endpoints(self):
        h2 = self.height / 2
        a = self.transform[:3, :3] @ np.asarray([0, 0, -h2]) \
            + self.transform[:3, 3]
        b = self.transform[:3, :3] @ np.asarray([0, 0, h2]) \
            + self.transform[:3, 3]
        return a, b

    def _aabb_bounds(self):
        a, b = self._endpoints()
        return (np.minimum(a, b) - self.radius,
                np.maximum(a, b) + self.radius)

    def _contains(self, pts, margin: float = 0.0):
        a, b = self._endpoints()
        pts = np.asarray(pts, np.float32)
        ab = b - a
        denom = max(float(ab @ ab), 1e-12)
        t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
        c = a + t[:, None] * ab
        return np.linalg.norm(pts - c, axis=-1) <= self.radius + margin

    def create_mesh(self):
        from ..geometry.trianglemesh import TriangleMesh

        m = TriangleMesh.create_capsule(self.radius, self.height)
        m.transform(self.transform)
        return m


class Cylinder(Primitive):
    """reference: primitives.h:154-191."""

    def __init__(self, radius: float = 0.0, height: float = 0.0,
                 transform=None):
        super().__init__(PrimitiveType.Cylinder, transform)
        self.radius = float(radius)
        self.height = float(height)

    def _aabb_bounds(self):
        # conservative: capsule-style bound
        h2 = self.height / 2
        a = self.transform[:3, :3] @ np.asarray([0, 0, -h2]) \
            + self.transform[:3, 3]
        b = self.transform[:3, :3] @ np.asarray([0, 0, h2]) \
            + self.transform[:3, 3]
        return (np.minimum(a, b) - self.radius,
                np.maximum(a, b) + self.radius)

    def _contains(self, pts, margin: float = 0.0):
        local = self._to_local(np.asarray(pts, np.float32))
        rad = np.linalg.norm(local[:, :2], axis=-1)
        return (rad <= self.radius + margin) & (
            np.abs(local[:, 2]) <= self.height / 2 + margin)

    def create_mesh(self):
        from ..geometry.trianglemesh import TriangleMesh

        m = TriangleMesh.create_cylinder(self.radius, self.height)
        m.transform(self.transform)
        return m


class Mesh(Primitive):
    """Triangle-mesh collision primitive (reference: primitives.h:190,
    where it is a stub whose AABB/voxelization are unimplemented; here
    it is a full participant: transformable AABB, solid containment by
    ray-crossing parity, surface voxelization, sweeping).

    `vertices` [V,3] / `triangles` [F,3] are host numpy; the transform
    is applied lazily like the analytic primitives.
    """

    def __init__(self, vertices=None, triangles=None, transform=None):
        super().__init__(PrimitiveType.Mesh, transform)
        self.vertices = (np.zeros((0, 3), np.float32) if vertices is None
                         else np.asarray(vertices, np.float32))
        self.triangles = (np.zeros((0, 3), np.int32) if triangles is None
                          else np.asarray(triangles, np.int32))

    @classmethod
    def from_triangle_mesh(cls, mesh, transform=None):
        return cls(np.asarray(mesh.vertices), np.asarray(mesh.triangles),
                   transform)

    def _world_vertices(self) -> np.ndarray:
        return self.vertices @ self.transform[:3, :3].T \
            + self.transform[:3, 3]

    def _aabb_bounds(self):
        if not len(self.vertices):
            z = np.zeros(3, np.float32)
            return z, z
        v = self._world_vertices()
        return v.min(0), v.max(0)

    def _contains(self, pts, margin: float = 0.0):
        """Point-in-mesh by +x ray-crossing parity (solid containment
        for closed meshes), vectorized over query points x triangles;
        `margin` expands via a distance-to-surface pass."""
        pts = np.asarray(pts, np.float32)
        if not len(self.triangles) or not len(pts):
            return np.zeros(len(pts), bool)
        v = self._world_vertices()
        a = v[self.triangles[:, 0]]
        b = v[self.triangles[:, 1]]
        c = v[self.triangles[:, 2]]
        inside = np.zeros(len(pts), bool)
        # chunk queries to bound the [Q, F] broadcasts
        for s in range(0, len(pts), 4096):
            q = pts[s:s + 4096]
            # Moeller-Trumbore against ray dir +x, t > 0
            d = np.asarray([1.0, 0.0, 0.0], np.float32)
            e1 = b - a
            e2 = c - a
            p = np.cross(d, e2)                     # [F,3]
            det = np.einsum("fk,fk->f", e1, p)
            ok = np.abs(det) > 1e-12
            inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            tv = q[:, None, :] - a[None]            # [Q,F,3]
            u = np.einsum("qfk,fk->qf", tv, p) * inv[None]
            qv = np.cross(tv, e1[None])
            w = np.einsum("qfk,k->qf", qv, d) * inv[None]
            t = np.einsum("qfk,fk->qf", qv, e2) * inv[None]
            hit = (ok[None] & (u >= 0) & (w >= 0) & (u + w <= 1)
                   & (t > 1e-9))
            inside[s:s + 4096] = (hit.sum(-1) % 2) == 1
            if margin > 0.0:
                # near-surface band: distance to triangle planes capped
                # by a cheap vertex-distance bound
                dv = np.linalg.norm(q[:, None, :] - v[None], axis=-1)
                inside[s:s + 4096] |= dv.min(-1) <= margin
        return inside

    def create_mesh(self):
        from ..geometry.trianglemesh import TriangleMesh

        m = TriangleMesh(self.vertices.copy(), self.triangles.copy())
        m.transform(self.transform)
        return m

    def create_voxel_grid(self, voxel_size: float):
        """Surface voxelization via the triangle-AABB overlap kernel
        (reference mesh voxelization path: voxelgrid_factory.cu
        CreateFromTriangleMesh)."""
        from ..geometry.voxelgrid import VoxelGrid

        return VoxelGrid.create_from_triangle_mesh(
            self.create_mesh(), voxel_size)
