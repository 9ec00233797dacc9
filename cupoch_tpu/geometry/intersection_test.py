"""Vectorised geometric intersection / distance primitives.

reference: src/cupoch/geometry/intersection_test.{h,inl} — the
device-side single-primitive tests (Akenine-Möller triangle/AABB SAT,
Möller tri-tri, slab line/AABB, point-segment/triangle distances)
become batched, branch-free jnp kernels usable under vmap/jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_test(v0p, v1p, a, b, fa, fb, half):
    """One SAT cross-axis test used by triangle_aabb: projections of two
    triangle verts onto the axis vs the box radius."""
    p0 = a * v0p[..., 0] + b * v0p[..., 1]
    p1 = a * v1p[..., 0] + b * v1p[..., 1]
    lo = jnp.minimum(p0, p1)
    hi = jnp.maximum(p0, p1)
    rad = fa * half[..., 0] + fb * half[..., 1]
    return (lo <= rad) & (hi >= -rad)


def triangle_aabb(box_center, box_half, v0, v1, v2):
    """Triangle/AABB overlap (Akenine-Möller SAT; reference:
    intersection_test.inl TriangleAABB). All args [..., 3]; returns
    [...] bool. Branch-free: evaluates all 13 separating axes."""
    u0 = v0 - box_center
    u1 = v1 - box_center
    u2 = v2 - box_center
    e0 = u1 - u0
    e1 = u2 - u1
    e2 = u0 - u2
    h = box_half

    def cross_tests(e, a, c):
        # a, c: the two vertices to project (the third is degenerate)
        fe = jnp.abs(e)
        # axis e x X: project onto (0, -e_z, e_y)
        tx = _axis_test(
            jnp.stack([a[..., 1], a[..., 2]], -1),
            jnp.stack([c[..., 1], c[..., 2]], -1),
            e[..., 2], -e[..., 1], fe[..., 2], fe[..., 1],
            jnp.stack([h[..., 1], h[..., 2]], -1))
        ty = _axis_test(
            jnp.stack([a[..., 0], a[..., 2]], -1),
            jnp.stack([c[..., 0], c[..., 2]], -1),
            -e[..., 2], e[..., 0], fe[..., 2], fe[..., 0],
            jnp.stack([h[..., 0], h[..., 2]], -1))
        tz = _axis_test(
            jnp.stack([a[..., 0], a[..., 1]], -1),
            jnp.stack([c[..., 0], c[..., 1]], -1),
            e[..., 1], -e[..., 0], fe[..., 1], fe[..., 0],
            jnp.stack([h[..., 0], h[..., 1]], -1))
        return tx & ty & tz

    ok = cross_tests(e0, u0, u2) & cross_tests(e1, u0, u2) & cross_tests(e2, u0, u1)

    # AABB overlap of the triangle's own AABB
    tri_min = jnp.minimum(jnp.minimum(u0, u1), u2)
    tri_max = jnp.maximum(jnp.maximum(u0, u1), u2)
    ok &= jnp.all((tri_min <= h) & (tri_max >= -h), -1)

    # triangle plane vs box
    n = jnp.cross(e0, e1)
    d = -jnp.sum(n * u0, -1)
    r = jnp.sum(jnp.abs(n) * h, -1)
    s = d  # plane offset; box centered at origin so signed dist = d
    ok &= jnp.abs(s) <= r
    return ok


def line_segment_aabb(p0, p1, box_min, box_max):
    """Segment/AABB overlap via the slab method (reference:
    intersection_test.inl LineSegmentAABB). All args [..., 3]."""
    d = p1 - p0
    safe_d = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (box_min - p0) / safe_d
    t1 = (box_max - p0) / safe_d
    tmin = jnp.max(jnp.minimum(t0, t1), -1)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    # parallel-axis miss: p0 outside the slab on a degenerate axis
    par_ok = jnp.all((jnp.abs(d) > 1e-20)
                     | ((p0 >= box_min) & (p0 <= box_max)), -1)
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0) & par_ok


def tri_tri(p1, q1, r1, p2, q2, r2, eps: float = 1e-10):
    """Triangle/triangle overlap (Möller-style interval test; reference:
    intersection_test.inl TriangleTriangle via tomasakeninemoeller).
    Batched [...,3] -> [...] bool."""

    def signed(a, b, c, d):
        s = jnp.sum(jnp.cross(b - a, c - a) * (d - a), -1)
        # a vertex exactly on the other plane (s == 0) breaks the
        # crossing-edge selection below; classify it as epsilon-above
        # (the coplanar branch still sees |s| <= eps)
        return jnp.where(s == 0.0, jnp.float32(1e-30), s)

    d_p2 = signed(p1, q1, r1, p2)
    d_q2 = signed(p1, q1, r1, q2)
    d_r2 = signed(p1, q1, r1, r2)
    same2 = ((d_p2 > eps) & (d_q2 > eps) & (d_r2 > eps)) | (
        (d_p2 < -eps) & (d_q2 < -eps) & (d_r2 < -eps))
    d_p1 = signed(p2, q2, r2, p1)
    d_q1 = signed(p2, q2, r2, q1)
    d_r1 = signed(p2, q2, r2, r1)
    same1 = ((d_p1 > eps) & (d_q1 > eps) & (d_r1 > eps)) | (
        (d_p1 < -eps) & (d_q1 < -eps) & (d_r1 < -eps))
    maybe = ~(same1 | same2)

    # interval overlap on the intersection line L = n1 x n2
    n1 = jnp.cross(q1 - p1, r1 - p1)
    n2 = jnp.cross(q2 - p2, r2 - p2)
    L = jnp.cross(n1, n2)
    axis = jnp.argmax(jnp.abs(L), -1)

    def interval(p, q, r, dp, dq, dr):
        # project verts on L's dominant axis; compute the crossing
        # interval of the triangle with the other triangle's plane
        pp = jnp.take_along_axis(p, axis[..., None], -1)[..., 0]
        pq = jnp.take_along_axis(q, axis[..., None], -1)[..., 0]
        pr = jnp.take_along_axis(r, axis[..., None], -1)[..., 0]

        def seg(a, b, da, db):
            t = da / jnp.where(jnp.abs(da - db) < 1e-20, 1e-20, da - db)
            return a + t * (b - a)

        # pick the two edges that cross the plane (signs differ)
        cross_pq = dp * dq < 0
        cross_pr = dp * dr < 0
        cross_qr = dq * dr < 0
        t1v = jnp.where(cross_pq, seg(pp, pq, dp, dq),
                        jnp.where(cross_pr, seg(pp, pr, dp, dr),
                                  seg(pq, pr, dq, dr)))
        t2v = jnp.where(cross_qr, seg(pq, pr, dq, dr),
                        jnp.where(cross_pr, seg(pp, pr, dp, dr),
                                  seg(pp, pq, dp, dq)))
        return jnp.minimum(t1v, t2v), jnp.maximum(t1v, t2v)

    a_lo, a_hi = interval(p1, q1, r1, d_p1, d_q1, d_r1)
    b_lo, b_hi = interval(p2, q2, r2, d_p2, d_q2, d_r2)
    overlap = (a_lo <= b_hi) & (b_lo <= a_hi)

    # coplanar case: fall back to 2D AABB overlap on the dominant plane
    coplanar = (jnp.abs(d_p1) <= eps) & (jnp.abs(d_q1) <= eps) & (
        jnp.abs(d_r1) <= eps)
    t1min = jnp.minimum(jnp.minimum(p1, q1), r1)
    t1max = jnp.maximum(jnp.maximum(p1, q1), r1)
    t2min = jnp.minimum(jnp.minimum(p2, q2), r2)
    t2max = jnp.maximum(jnp.maximum(p2, q2), r2)
    co_overlap = jnp.all((t1min <= t2max) & (t2min <= t1max), -1)

    return maybe & jnp.where(coplanar, co_overlap, overlap)


def point_segment_dist2(p, a, b):
    """Squared distance point -> segment ab (reference:
    distance_test.inl PointLineSegment). [...,3] args."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-20)
    t = jnp.clip(t, 0.0, 1.0)
    c = a + t[..., None] * ab
    return jnp.sum((p - c) ** 2, -1)


def point_triangle_dist2(p, a, b, c):
    """Squared distance point -> triangle abc (reference:
    distance_test.inl PointTriangle; Ericson RTCD 5.1.5). [...,3]."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v = vb / denom
    w = vc / denom
    closest = a + v[..., None] * ab + w[..., None] * ac
    # clamp to edges/vertices region by region
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    t_ab = jnp.where(jnp.abs(d1 - d3) > 1e-20, d1 / jnp.maximum(d1 - d3, 1e-20), 0.0)
    t_ac = jnp.where(jnp.abs(d2 - d6) > 1e-20, d2 / jnp.maximum(d2 - d6, 1e-20), 0.0)
    t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-20)
    cand = closest
    cand = jnp.where(on_bc[..., None], b + t_bc[..., None] * (c - b), cand)
    cand = jnp.where(on_ac[..., None], a + t_ac[..., None] * ac, cand)
    cand = jnp.where(on_ab[..., None], a + t_ab[..., None] * ab, cand)
    cand = jnp.where(in_c[..., None], c, cand)
    cand = jnp.where(in_b[..., None], b, cand)
    cand = jnp.where(in_a[..., None], a, cand)
    return jnp.sum((p - cand) ** 2, -1)
