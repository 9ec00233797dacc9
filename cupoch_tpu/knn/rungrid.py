"""Run-structured candidate grid — third-generation ICP hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl); rounds 1-2 replaced it with dense
roll grids (knn/rollgrid.py, knn/packgrid.py).  Profiling packgrid on a
v5e showed the remaining costs per frame: (a) the build-time per-cell
lane sort (a [cells, 27*cap] multi-operand sort, ~200 ms at 1M points),
(b) per-iteration query re-binning (~29 ms each, many times per frame
at small margins), and (c) the VPU fetch passes that deliver winner
attributes for the Gauss-Newton step.

This module removes them by changing the data structure, not just the
kernel:

1. NO lane sort.  The 27-cell neighborhood of every cell is laid out as
   27 fixed "runs" of `cap` lanes each, concatenated in ascending
   center-to-center distance order.  Intra-cell lanes are ordered by a
   2-bit-per-axis Morton code of the point's sub-cell position, which
   the bin sort key encodes for free.  Adaptive pruning then comes from
   DATA-DEPENDENT per-window bounds: for every 128-lane window the
   build records the minimum candidate distance to the cell center
   (one min-reduce; empty lanes are +inf).  A window whose bound
   exceeds  min(best-so-far, radius) + d(query, cell center)  cannot
   improve any query in the tile and is skipped.  Correctness does not
   depend on lane order at all — order only makes windows coherent.

2. CELL-CENTERED coordinates.  Candidates are stored relative to the
   center of the cell whose neighborhood row they sit in (the per-run
   offset is folded in at build time), so the score
   v = |c|^2 - 2 q.c  is computed on ~cell-sized magnitudes: absolute
   f32 error ~1e-8 instead of ~1e-6 at world scale, and |c| doubles as
   the pruning distance (no separate distance tensor).  The candidate
   coordinates stored in `cand` ARE the (centered) target points, so
   point-to-point and symmetric estimators fetch them straight from
   the score operand instead of duplicating them in `attr`.

3. The ICP Gauss-Newton reduction happens INSIDE the query kernel: per
   tile, the kernel transforms the binned queries, finds 1-NN, fetches
   the winner's attribute channels with select-max passes, forms the
   6-DoF jacobian rows (utility/eigen.py solves the 6x6 outside), and
   emits one 32-float partial-sum row.  Per ICP iteration nothing but
   [tiles, 32] partials leaves the kernel — no per-point gathers,
   scatters, or host round-trips (reference hot loop:
   registration.cu:154-171 syncs per iteration).

Capacity discipline matches the reference's padded-neighbor semantics
(SURVEY.md §2.2): per-cell caps are occupancy percentiles; overflow
rows drop (callers see -1 / reduced fitness), exactly like the
`NUM_MAX_NN` cap in knn/kdtree_search_param.h:26.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID_INDEX = -1
BIG = jnp.float32(3.0e18)
WINDOW = 128  # pruning-window width in lanes

# 27 neighbor offsets in ascending center-to-center distance:
# own cell, 6 faces, 12 edges, 8 corners.
RUN_OFFSETS = tuple(sorted(
    ((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)),
    key=lambda o: (o[0] * o[0] + o[1] * o[1] + o[2] * o[2],) + o))

# estimator codes (static kernel variants); values match
# registration.estimation.TransformationEstimationType where relevant
EST_NONE = 0    # correspondence only: outputs (d2, -index)
EST_PT2PT = 1   # sums: Kabsch sufficient statistics
EST_PT2PL = 2   # attr = nx,ny,nz,d_centered; sums: JTJ/JTr
EST_SYM = 3     # attr = nx,ny,nz (target); source normals ride qsoa

N_SUMS = 32
# GN slot layout: 0-20 JTJ upper-tri, 21-26 JTr, 27 count, 28 err
# PT2PT layout:   0 count, 1-3 sum(t), 4-6 sum(p), 7-15 sum(t p^T),
#                 16 err


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

class RunGrid:
    """Pytree; `dims`, `cap`, `kc`, `nch` static.

    cand   [Cp, 4, KC]  rows (-2cx, -2cy, -2cz, |c|^2), c relative to
                        the row's cell center; empty lanes |c|^2 = BIG
    attr   [Cp, A, KC]  estimator attribute channels (may be A=0)
    negidx [Cp, KC]     -original_index as f32 (-(-1) = empty)
    bounds [Cp, NW]     min |c| per 128-lane window (+inf when empty)
    """

    def __init__(self, cand, attr, negidx, bounds, origin, cell_size,
                 dims, cap, kc, nch):
        self.cand = cand
        self.attr = attr
        self.negidx = negidx
        self.bounds = bounds
        self.origin = origin
        self.cell_size = cell_size
        self.dims = tuple(int(d) for d in dims)
        self.cap = int(cap)
        self.kc = int(kc)
        self.nch = int(nch)

    @property
    def n_windows(self) -> int:
        return self.kc // WINDOW


def _rungrid_flatten(g):
    return ((g.cand, g.attr, g.negidx, g.bounds, g.origin, g.cell_size),
            (g.dims, g.cap, g.kc, g.nch))


def _rungrid_unflatten(aux, leaves):
    return RunGrid(*leaves, *aux)


jax.tree_util.register_pytree_node(RunGrid, _rungrid_flatten,
                                   _rungrid_unflatten)


def padded_cells(dims) -> int:
    return _round_up(dims[0] * dims[1] * dims[2], 64)


# ---------------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------------

def plan_rungrid(points: np.ndarray, radius: float,
                 margin: float = 0.25,
                 query_points: Optional[np.ndarray] = None,
                 cap_percentile: float = 99.5,
                 max_cells: int = 2_000_000,
                 cap_limit: int = 128,
                 mem_budget_bytes: int = 5 << 30,
                 nch: int = 4) -> Optional[dict]:
    """Host sizing. Returns None when a dense grid is unreasonable.

    cell = radius*(1+margin): queries binned at transform T_bin stay
    valid for the 27-neighborhood as long as every point has moved
    less than radius*margin since binning (the rebin trigger used by
    registration/fused_icp.py).
    """
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(-1)
    if not finite.any() or radius <= 0:
        return None
    lo = pts[finite].min(0).astype(np.float64)
    hi = pts[finite].max(0).astype(np.float64)
    cell = float(radius) * (1.0 + float(margin))
    dims_core = np.maximum(1, np.ceil((hi - lo) / cell + 1e-6).astype(int))
    dims = tuple(int(d) + 2 for d in dims_core)
    n_cells = int(np.prod(dims))
    if n_cells > max_cells:
        return None
    cidx = np.floor((pts[finite] - lo) / cell).astype(np.int64)
    cidx = np.minimum(cidx, dims_core - 1)

    def _counts3d(ci, dc):
        lin = (ci[:, 0] * dc[1] + ci[:, 1]) * dc[2] + ci[:, 2]
        return np.bincount(lin, minlength=int(np.prod(dc))).reshape(dc)

    counts = _counts3d(cidx, dims_core)
    occupied = counts[counts > 0]
    cap = int(np.percentile(occupied, cap_percentile)) if occupied.size \
        else 8
    if cap > cap_limit:
        return None
    cap = max(8, _round_up(cap, 8))
    kc = _round_up(27 * cap, WINDOW)
    # query-side cell capacity
    qcap = cap
    if query_points is not None:
        qp = np.asarray(query_points)
        qf = np.isfinite(qp).all(-1)
        if qf.any():
            qc = np.floor((qp[qf] - lo) / cell).astype(np.int64)
            inb = ((qc >= 0) & (qc < dims_core)).all(-1)
            if inb.any():
                qcnt = _counts3d(qc[inb], dims_core)
                qocc = qcnt[qcnt > 0]
                qcap = int(np.percentile(qocc, cap_percentile))
        # rebinning shifts occupancy a little; leave headroom
        qcap = max(8, _round_up(int(qcap * 1.25) + 2, 8))
    cp = padded_cells(dims)
    grid_bytes = cp * kc * 4 * (4 + nch + 1)
    if grid_bytes > mem_budget_bytes:
        return None
    origin = (lo - cell).astype(np.float32)
    return {
        "dims": dims, "origin": origin, "cap": cap, "kc": int(kc),
        "qcap": int(qcap),
        "cell_size": np.float32(cell),
        "rebin_margin": np.float32(float(radius) * float(margin)),
    }


# ---------------------------------------------------------------------------
# binning
# ---------------------------------------------------------------------------

def _cell_and_morton(points, origin, cell_size, dims, mask=None):
    """(linear cell | 6-bit sub-cell Morton) key per point;
    out-of-bounds / masked-out -> C*64 (dropped)."""
    C = dims[0] * dims[1] * dims[2]
    rel = (points - origin) / cell_size
    cell = jnp.floor(rel).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
    if mask is not None:
        inb = inb & mask
    lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    # 2-bit-per-axis Morton: intra-run lanes become spatially coherent
    # so the 128-lane pruning windows stay tight
    sub = jnp.clip((rel - cell) * 4.0, 0.0, 3.9999).astype(jnp.int32)
    m = ((sub[:, 0] & 2) << 4) | ((sub[:, 1] & 2) << 3) \
        | ((sub[:, 2] & 2) << 2) \
        | ((sub[:, 0] & 1) << 2) | ((sub[:, 1] & 1) << 1) \
        | (sub[:, 2] & 1)
    key = jnp.where(inb, lin * 64 + m, C * 64)
    return key, lin


def _bin_to_slots(key, n_bins: int, cap: int, channels, fill):
    """Sort by key, rank within cell (key//64), scatter channels to
    [n_bins, cap] slots. Returns (list of [n_bins, cap], index)."""
    N = key.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    ops = jax.lax.sort((key, pos) + tuple(channels), num_keys=1,
                       is_stable=True)
    keys_s, order = ops[0], ops[1]
    ch_s = ops[2:]
    cell_s = keys_s // 64
    boundary = jnp.concatenate([
        jnp.ones(1, bool), cell_s[1:] != cell_s[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, pos, 0))
    rank = pos - seg_start
    ok = (cell_s < n_bins) & (rank < cap)
    slot = jnp.where(ok, cell_s * cap + rank, n_bins * cap)
    outs = []
    for ch, f in zip(ch_s, fill):
        outs.append(jnp.full(n_bins * cap + 1, f, ch.dtype)
                    .at[slot].set(ch, mode="drop")[:-1]
                    .reshape(n_bins, cap))
    index = jnp.full(n_bins * cap + 1, INVALID_INDEX, jnp.int32) \
        .at[slot].set(order, mode="drop")[:-1].reshape(n_bins, cap)
    return outs, index


def cell_centers(dims, origin, cell_size, cp: int):
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    lin = jnp.arange(cp, dtype=jnp.int32)
    linc = jnp.minimum(lin, C - 1)
    ccz = (linc % Gz).astype(jnp.float32)
    ccy = ((linc // Gz) % Gy).astype(jnp.float32)
    ccx = (linc // (Gz * Gy)).astype(jnp.float32)
    c = jnp.stack([ccx, ccy, ccz], -1) + 0.5
    return origin + c * cell_size  # [cp, 3]


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "cap", "nch", "plane_offset"))
def build_rungrid_arrays(points, attrs, origin, cell_size,
                         dims: Tuple[int, int, int], cap: int, nch: int,
                         mask=None, plane_offset: bool = False):
    """Bin targets once, assemble the 27-run neighborhood with
    `jnp.roll` (no gathers, no lane sort), fold per-run center offsets
    into the coordinates, and record per-window pruning bounds.

    plane_offset: when True, attrs[:, :3] is a direction n and
    attrs[:, 3] a plane offset d = n.p; d is re-centered per row
    (d_rel = d - n.row_center) so the kernel's centered residual
    n.q_centered - d_rel equals the world-frame n.q - d exactly.
    """
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    key, lin = _cell_and_morton(points, origin, cell_size, dims, mask)
    # cell-centered coordinates
    linc = jnp.clip(lin, 0, C - 1)
    ccz = (linc % Gz).astype(jnp.float32)
    ccy = ((linc // Gz) % Gy).astype(jnp.float32)
    ccx = (linc // (Gz * Gy)).astype(jnp.float32)
    cen = origin + (jnp.stack([ccx, ccy, ccz], -1) + 0.5) * cell_size
    pc = points - cen
    channels = [pc[:, 0], pc[:, 1], pc[:, 2]] + \
        [attrs[:, i] for i in range(nch)]
    fill = [jnp.float32(np.inf)] * 3 + [jnp.float32(0.0)] * nch
    binned, index = _bin_to_slots(key, C, cap, channels, fill)
    negidx0 = -index.astype(jnp.float32)  # exact for N < 2^24

    def rolled(arr2d):
        """27 runs in RUN_OFFSETS order: run r of cell c holds the
        contents of cell c+off_r (the +1 guard ring absorbs wraps)."""
        a = arr2d.reshape(Gx, Gy, Gz, cap)
        parts = []
        for (dx, dy, dz) in RUN_OFFSETS:
            parts.append(jnp.roll(a, (-dx, -dy, -dz), (0, 1, 2))
                         .reshape(C, cap))
        return jnp.concatenate(parts, -1)

    cx, cy, cz = (rolled(binned[i]) for i in range(3))
    ach = [rolled(binned[3 + i]) for i in range(nch)]
    negidx = rolled(negidx0)

    # fold run offsets: coords become relative to the ROW's cell center
    offs = np.asarray(RUN_OFFSETS, np.float32)  # [27, 3]
    lane_off = jnp.repeat(jnp.asarray(offs), cap, axis=0)  # [27*cap, 3]
    cx = cx + lane_off[None, :, 0] * cell_size
    cy = cy + lane_off[None, :, 1] * cell_size
    cz = cz + lane_off[None, :, 2] * cell_size

    if plane_offset:
        rcen = cell_centers(dims, origin, cell_size, C)
        ach[3] = ach[3] - (ach[0] * rcen[:, 0:1] + ach[1] * rcen[:, 1:2]
                           + ach[2] * rcen[:, 2:3])

    kc = _round_up(27 * cap, WINDOW)
    pad = kc - 27 * cap
    if pad:
        cx, cy, cz, negidx = (
            jnp.pad(v, ((0, 0), (0, pad)), constant_values=cv)
            for v, cv in ((cx, np.inf), (cy, np.inf), (cz, np.inf),
                          (negidx, -float(INVALID_INDEX))))
        ach = [jnp.pad(v, ((0, 0), (0, pad))) for v in ach]

    empty = ~jnp.isfinite(cx)
    cn = jnp.where(empty, BIG, cx * cx + cy * cy + cz * cz)
    dist = jnp.where(empty, jnp.float32(np.inf), jnp.sqrt(cn))
    bounds = jnp.min(dist.reshape(C, kc // WINDOW, WINDOW), -1)
    zero = jnp.zeros_like(cx)
    cx, cy, cz = (jnp.where(empty, zero, v) for v in (cx, cy, cz))
    cand = jnp.stack([-2.0 * cx, -2.0 * cy, -2.0 * cz, cn], 1)
    negidx = jnp.where(empty, -float(INVALID_INDEX), negidx)
    attr = jnp.stack(ach, 1) if nch else \
        jnp.zeros((C, 0, kc), jnp.float32)

    cp = padded_cells(dims)
    if cp > C:
        cand = jnp.concatenate([
            cand, jnp.zeros((cp - C, 4, kc), jnp.float32)
            .at[:, 3, :].set(BIG)], 0)
        attr = jnp.concatenate(
            [attr, jnp.zeros((cp - C, nch, kc), jnp.float32)], 0)
        negidx = jnp.concatenate([
            negidx, jnp.full((cp - C, kc), -float(INVALID_INDEX),
                             jnp.float32)], 0)
        bounds = jnp.concatenate([
            bounds, jnp.full((cp - C, kc // WINDOW), np.inf,
                             jnp.float32)], 0)
    return cand, attr, negidx, bounds


def make_rungrid(points, attrs, origin, cell_size, dims, cap,
                 mask=None, plane_offset: bool = False) -> RunGrid:
    nch = int(attrs.shape[1])
    cand, attr, negidx, bounds = build_rungrid_arrays(
        points, attrs, jnp.asarray(origin, jnp.float32),
        jnp.asarray(cell_size, jnp.float32), tuple(dims), int(cap),
        nch, mask=mask, plane_offset=plane_offset)
    return RunGrid(cand, attr, negidx, bounds,
                   jnp.asarray(origin, jnp.float32),
                   jnp.asarray(cell_size, jnp.float32), tuple(dims),
                   int(cap), int(cand.shape[2]), nch)


# ---------------------------------------------------------------------------
# query-side binning (queries keep ORIGINAL coords; binned by position
# under the binning transform)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "qcap", "n_extra"))
def bin_queries(points, bin_positions, origin, cell_size,
                dims: Tuple[int, int, int], qcap: int,
                extra=None, n_extra: int = 0, mask=None):
    """Returns (qsoa [Cp, 3+n_extra, qcap], qidx [Cp, qcap] int32).
    Empty slots: coords are the cell center (centered math sees ~0),
    qidx = -1."""
    C = dims[0] * dims[1] * dims[2]
    key, _ = _cell_and_morton(bin_positions, origin, cell_size, dims,
                              mask)
    channels = [points[:, 0], points[:, 1], points[:, 2]]
    if n_extra:
        channels += [extra[:, i] for i in range(n_extra)]
    fill = [jnp.float32(np.inf)] * 3 + [jnp.float32(0.0)] * n_extra
    binned, index = _bin_to_slots(key, C, qcap, channels, fill)
    centers = cell_centers(dims, origin, cell_size, C)
    empty = ~jnp.isfinite(binned[0])
    qs = [jnp.where(empty, centers[:, i:i + 1], binned[i])
          for i in range(3)]
    qsoa = jnp.stack(qs + list(binned[3:]), 1)
    cp = padded_cells(dims)
    if cp > C:
        padc = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(origin).reshape(1, 3, 1),
                             (cp - C, 3, qcap)).astype(jnp.float32),
            jnp.zeros((cp - C, n_extra, qcap), jnp.float32)], 1)
        qsoa = jnp.concatenate([qsoa, padc], 0)
        index = jnp.concatenate(
            [index, jnp.full((cp - C, qcap), INVALID_INDEX, jnp.int32)],
            0)
    return qsoa, index


def make_params(T, r2, origin, cell_size):
    """[24] f32 scalar block: R row-major (9), t (3), r^2, origin (3),
    cell_size, 7 spare."""
    R = T[:3, :3].reshape(-1)
    t = T[:3, 3]
    return jnp.concatenate([
        R, t, jnp.asarray(r2, jnp.float32).reshape(1),
        jnp.asarray(origin, jnp.float32).reshape(3),
        jnp.asarray(cell_size, jnp.float32).reshape(1),
        jnp.zeros(7, jnp.float32)])


# ---------------------------------------------------------------------------
# fused query (+ optional GN reduction) kernel
# ---------------------------------------------------------------------------

def _fetch_plan(est: int):
    """Which channels the winner fetch needs: list of ("cand"|"attr",
    channel).  cand channels 0-2 hold -2*c, so the fetched value is
    scaled by -0.5 to recover the centered target point."""
    if est == EST_NONE:
        return []
    if est == EST_PT2PT:
        return [("cand", 0), ("cand", 1), ("cand", 2)]
    if est == EST_PT2PL:
        return [("attr", 0), ("attr", 1), ("attr", 2), ("attr", 3)]
    if est == EST_SYM:
        return [("cand", 0), ("cand", 1), ("cand", 2),
                ("attr", 0), ("attr", 1), ("attr", 2)]
    raise ValueError(est)


def _gn_terms(est: int, fetched, tx, ty, tz, ex, ey, ez,
              ccx, ccy, ccz, src_n, ok, d2c):
    """Sum terms (length <= N_SUMS) given fetched winner channels.

    tx.. = world-frame transformed source; ex.. = cell-centered same;
    ccx.. = cell centers; src_n = rotated source normals (sym only).
    """
    w = ok.astype(jnp.float32)
    if est == EST_PT2PT:
        px = -0.5 * fetched[0] + ccx
        py = -0.5 * fetched[1] + ccy
        pz = -0.5 * fetched[2] + ccz
        terms = [w, w * tx, w * ty, w * tz, w * px, w * py, w * pz]
        for s in (tx, ty, tz):
            for d in (px, py, pz):
                terms.append(w * s * d)
        terms.append(d2c)
        return terms
    if est == EST_PT2PL:
        nx, ny, nz, dd = fetched
        r = nx * ex + ny * ey + nz * ez - dd
        j = (ty * nz - tz * ny, tz * nx - tx * nz, tx * ny - ty * nx,
             nx, ny, nz)
    elif est == EST_SYM:
        pxc = -0.5 * fetched[0]
        pyc = -0.5 * fetched[1]
        pzc = -0.5 * fetched[2]
        px, py, pz = pxc + ccx, pyc + ccy, pzc + ccz
        sx, sy, sz = src_n
        mx = fetched[3] + sx
        my = fetched[4] + sy
        mz = fetched[5] + sz
        r = (ex - pxc) * mx + (ey - pyc) * my + (ez - pzc) * mz
        ux, uy, uz = tx + px, ty + py, tz + pz
        j = (uy * mz - uz * my, uz * mx - ux * mz, ux * my - uy * mx,
             mx, my, mz)
    else:
        raise ValueError(est)
    terms = []
    for i in range(6):
        for k in range(i, 6):
            terms.append(w * j[i] * j[k])          # 21 JTJ upper-tri
    for i in range(6):
        terms.append(w * j[i] * r)                 # 6 JTr
    terms.append(w)                                # 27: count
    terms.append(d2c)                              # 28: err
    return terms


def _tile_centers(i, T, dims, ox, oy, oz, cell):
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    lin = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    lin = jnp.minimum(lin, C - 1)
    cz = (lin % Gz).astype(jnp.float32) + 0.5
    cy = ((lin // Gz) % Gy).astype(jnp.float32) + 0.5
    cx = (lin // (Gz * Gy)).astype(jnp.float32) + 0.5
    return ox + cx * cell, oy + cy * cell, oz + cz * cell


def _make_fused_kernel(est: int, A: int, T: int, qcap: int, KC: int,
                       dims, corres: bool):
    fetch = _fetch_plan(est)
    nfetch = len(fetch) if not corres else 1  # corres fetches negidx

    def kern(p_ref, q_ref, qi_ref, c_ref, x_ref, b_ref,
             *out_and_scratch):
        # x_ref: negidx [T, KC] in corres mode, attr [T, A, KC] in GN
        n_out = 2 if corres else 1
        outs = out_and_scratch[:n_out]
        mb_ref = out_and_scratch[n_out]
        acc = out_and_scratch[n_out + 1:]
        i = pl.program_id(0)
        R00, R01, R02 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
        R10, R11, R12 = p_ref[0, 3], p_ref[0, 4], p_ref[0, 5]
        R20, R21, R22 = p_ref[0, 6], p_ref[0, 7], p_ref[0, 8]
        t0, t1, t2 = p_ref[0, 9], p_ref[0, 10], p_ref[0, 11]
        r2 = p_ref[0, 12]
        ccx, ccy, ccz = _tile_centers(
            i, T, dims, p_ref[0, 13], p_ref[0, 14], p_ref[0, 15],
            p_ref[0, 16])

        # LAYOUT RULE: every per-query quantity is kept [T, qcap, 1]
        # (queries in SUBLANES, like the [T, qcap, WINDOW] score), so
        # all broadcasts against candidate rows [T, 1, WINDOW] are
        # native sublane/lane replication — the lane-major [T, qcap]
        # form would force a Mosaic relayout per op per window (~5x
        # whole-kernel cost, measured on a v5e)
        qx = q_ref[:, 0, :][:, :, None]
        qy = q_ref[:, 1, :][:, :, None]
        qz = q_ref[:, 2, :][:, :, None]
        ccx = ccx[:, :, None]
        ccy = ccy[:, :, None]
        ccz = ccz[:, :, None]
        tx = R00 * qx + R01 * qy + R02 * qz + t0
        ty = R10 * qx + R11 * qy + R12 * qz + t1
        tz = R20 * qx + R21 * qy + R22 * qz + t2
        ex = tx - ccx
        ey = ty - ccy
        ez = tz - ccz
        qn = ex * ex + ey * ey + ez * ez
        dqc = jnp.sqrt(qn)
        # expand the 32-bit value BEFORE comparing: Mosaic cannot
        # insert a minor dim on i1 vectors
        valid = qi_ref[:, :][:, :, None] >= 0

        mb_ref[:] = jnp.full((T, qcap, 1), 3.0e18, jnp.float32)
        for ch in range(nfetch):
            acc[ch][:] = jnp.zeros((T, qcap, 1), jnp.float32)

        def src_win(ch, lo):
            # slice at the REF level: loading the full [T, KC] row per
            # window would multiply VMEM traffic by the window count
            if corres:
                return x_ref[:, lo:lo + WINDOW]         # negidx
            kind, c = fetch[ch]
            if kind == "cand":
                return c_ref[:, c, lo:lo + WINDOW]
            return x_ref[:, c, lo:lo + WINDOW]

        for k in range(KC // WINDOW):
            lo = k * WINDOW
            best = jnp.sqrt(jnp.maximum(
                jnp.minimum(mb_ref[:] + qn, r2), 0.0))
            need = jnp.any(valid & (
                best + dqc >= b_ref[:, k:k + 1][:, :, None]))

            @pl.when(need)
            def _():
                cxk = c_ref[:, 0, lo:lo + WINDOW][:, None, :]
                cyk = c_ref[:, 1, lo:lo + WINDOW][:, None, :]
                czk = c_ref[:, 2, lo:lo + WINDOW][:, None, :]
                cnk = c_ref[:, 3, lo:lo + WINDOW][:, None, :]
                v = cnk + ex * cxk + ey * cyk + ez * czk
                m = jnp.min(v, -1, keepdims=True)
                prev = mb_ref[:]
                upd = m < prev
                mb_ref[:] = jnp.where(upd, m, prev)
                eq = (v <= m) & upd
                for ch in range(nfetch):
                    f = jnp.max(jnp.where(
                        eq, src_win(ch, lo)[:, None, :],
                        float(-np.inf)), -1, keepdims=True)
                    acc[ch][:] = jnp.where(upd, f, acc[ch][:])

        d2 = mb_ref[:] + qn
        ok = valid & (d2 <= r2)
        if corres:
            outs[0][:] = jnp.where(ok, jnp.maximum(d2, 0.0),
                                   float(np.inf))[:, :, 0]
            outs[1][:] = jnp.where(ok, acc[0][:],
                                   float(-INVALID_INDEX))[:, :, 0]
            return
        d2c = jnp.where(ok, jnp.maximum(d2, 0.0), 0.0)
        if est == EST_SYM:
            s0 = q_ref[:, 3, :][:, :, None]
            s1 = q_ref[:, 4, :][:, :, None]
            s2 = q_ref[:, 5, :][:, :, None]
            src_n = (R00 * s0 + R01 * s1 + R02 * s2,
                     R10 * s0 + R11 * s1 + R12 * s2,
                     R20 * s0 + R21 * s1 + R22 * s2)
        else:
            src_n = None
        fetched = [acc[ch][:] for ch in range(nfetch)]
        terms = _gn_terms(est, fetched, tx, ty, tz, ex, ey, ez,
                          ccx, ccy, ccz, src_n, ok, d2c)
        # build the row with one-hot selects (Mosaic has no scatter)
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, N_SUMS), 1)
        row = jnp.zeros((1, N_SUMS), jnp.float32)
        for s, t in enumerate(terms):
            row = row + jnp.where(slot == s, jnp.sum(t), 0.0)
        # the output block is the WHOLE [G, N_SUMS] array (TPU grid
        # iterations are sequential, so the block persists in VMEM);
        # each program writes its own row
        outs[0][pl.ds(i, 1), :] = row

    return kern, nfetch


def _pick_tile(cp: int, kc: int, A: int, qcap: int) -> int:
    """Largest tile (cells per program) fitting a ~11 MB VMEM budget.

    Accounts for (a) double-buffered input blocks, (b) the [T, qcap,
    WINDOW] score temporaries, and (c) ~14 live [T, qcap, 1] per-query
    tensors whose minor dim pads to a full 128-lane tile."""
    per_cell = (
        2 * (4 + max(A, 1) + 1) * kc * 4        # cand+attr+bounds blocks
        + 2 * 8 * qcap * 4                       # qsoa + qidx blocks
        + 3 * qcap * WINDOW * 4                  # score v + eq temps
        + 14 * qcap * WINDOW * 4                 # padded [T,qcap,1] regs
    )
    t = max(8, min(64, (11 << 20) // per_cell // 8 * 8))
    while cp % t:
        t -= 8
    return max(t, 8)


@partial(jax.jit, static_argnames=("est", "corres", "use_pallas"))
def fused_query(grid: RunGrid, qsoa, qidx, params, est: int,
                corres: bool, use_pallas: Optional[bool] = None):
    """One fused correspondence (+GN reduction) pass.

    Returns (d2 [Cp,qcap], negidx [Cp,qcap]) when `corres`, else a
    [G, N_SUMS] array of per-tile partial sums."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _fused_query_xla(grid, qsoa, qidx, params, est, corres)
    interpret = use_pallas == "interpret"
    cp, nq, qcap = qsoa.shape
    KC = grid.kc
    A = grid.nch
    NW = grid.n_windows
    T = _pick_tile(cp, KC, A, qcap)
    kern, nfetch = _make_fused_kernel(est, A, T, qcap, KC, grid.dims,
                                      corres)
    scratch = [pltpu.VMEM((T, qcap, 1), jnp.float32)
               for _ in range(1 + nfetch)]
    in_specs = [
        pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((T, nq, qcap), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, qcap), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 4, KC), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if corres:
        in_specs.append(pl.BlockSpec((T, KC), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        x_in = grid.negidx
        out_shape = [jax.ShapeDtypeStruct((cp, qcap), jnp.float32)] * 2
        out_specs = [pl.BlockSpec((T, qcap), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * 2
    else:
        in_specs.append(pl.BlockSpec((T, max(A, 1), KC),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        x_in = grid.attr if A else \
            jnp.zeros((cp, 1, KC), jnp.float32)
        out_shape = [jax.ShapeDtypeStruct((cp // T, N_SUMS),
                                          jnp.float32)]
        out_specs = [pl.BlockSpec((cp // T, N_SUMS), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
    in_specs.append(pl.BlockSpec((T, NW), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kern,
        grid=(cp // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(params.reshape(1, 24), qsoa, qidx, grid.cand, x_in, grid.bounds)
    return tuple(outs) if corres else outs[0]


def _fused_query_xla(grid: RunGrid, qsoa, qidx, params, est: int,
                     corres: bool):
    """Reference semantics on any backend (no window gating); used by
    the CPU test suite and as the non-TPU fallback."""
    cp, nq, qcap = qsoa.shape
    KC = grid.kc
    A = grid.nch
    T = 8
    n = cp // T
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    r2 = params[12]
    centers = cell_centers(grid.dims, params[13:16], params[16], cp)
    fetch = _fetch_plan(est)

    def body(args):
        q, qi, c, a, ni, cen = args
        qw = jnp.einsum("ij,tjq->tiq", R, q[:, 0:3, :]) + t[None, :, None]
        e = qw - cen[:, :, None]
        qn = jnp.sum(e * e, 1)
        v = c[:, 3, None, :] \
            + e[:, 0, :, None] * c[:, 0, None, :] \
            + e[:, 1, :, None] * c[:, 1, None, :] \
            + e[:, 2, :, None] * c[:, 2, None, :]
        m = jnp.min(v, -1)
        eq = v <= m[:, :, None]
        d2 = m + qn
        ok = (qi >= 0) & (d2 <= r2)
        if corres:
            fi = jnp.max(jnp.where(eq, ni[:, None, :], -jnp.inf), -1)
            return (jnp.where(ok, jnp.maximum(d2, 0.0), jnp.inf),
                    jnp.where(ok, fi, -float(INVALID_INDEX)))

        def fetch_ch(kind, ch):
            src = c[:, ch, None, :] if kind == "cand" \
                else a[:, ch, None, :]
            return jnp.max(jnp.where(eq, src, -jnp.inf), -1)

        fetched = [jnp.where(ok, fetch_ch(k_, c_), 0.0)
                   for (k_, c_) in fetch]
        tx, ty, tz = qw[:, 0, :], qw[:, 1, :], qw[:, 2, :]
        ex, ey, ez = e[:, 0, :], e[:, 1, :], e[:, 2, :]
        d2c = jnp.where(ok, jnp.maximum(d2, 0.0), 0.0)
        if est == EST_SYM:
            sn = jnp.einsum("ij,tjq->tiq", R, q[:, 3:6, :])
            src_n = (sn[:, 0], sn[:, 1], sn[:, 2])
        else:
            src_n = None
        terms = _gn_terms(est, fetched, tx, ty, tz, ex, ey, ez,
                          cen[:, 0, None], cen[:, 1, None],
                          cen[:, 2, None], src_n, ok, d2c)
        row = jnp.zeros(N_SUMS, jnp.float32)
        for s, term in enumerate(terms):
            row = row.at[s].set(jnp.sum(term))
        return row

    attr = grid.attr if A else jnp.zeros((cp, 1, KC), jnp.float32)
    args = (qsoa.reshape(n, T, nq, qcap),
            qidx.reshape(n, T, qcap),
            grid.cand.reshape(n, T, 4, KC),
            attr.reshape(n, T, max(A, 1), KC),
            grid.negidx.reshape(n, T, KC),
            centers.reshape(n, T, 3))
    out = jax.lax.map(body, args)
    if corres:
        return out[0].reshape(cp, qcap), out[1].reshape(cp, qcap)
    return out


# ---------------------------------------------------------------------------
# standalone 1-NN API (parity with rollgrid/packgrid)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("qcap", "use_pallas"))
def query_nn_rungrid(grid: RunGrid, queries, radius, qcap: int,
                     query_mask=None,
                     use_pallas: Optional[bool] = None):
    """1-NN within `radius` for a flat [Q,3] query set:
    (index [Q] int32 or -1, dist2 [Q])."""
    Q = queries.shape[0]
    qsoa, qidx = bin_queries(queries, queries, grid.origin,
                             grid.cell_size, grid.dims, qcap,
                             mask=query_mask)
    params = make_params(jnp.eye(4, dtype=jnp.float32),
                         jnp.asarray(radius, jnp.float32) ** 2,
                         grid.origin, grid.cell_size)
    d2, nidx = fused_query(grid, qsoa, qidx, params, EST_NONE, True,
                           use_pallas=use_pallas)
    idx = jnp.where(jnp.isfinite(d2), -nidx,
                    float(INVALID_INDEX)).astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Q)
    out_idx = jnp.full((Q + 1,), INVALID_INDEX, jnp.int32).at[slot].set(
        jnp.where(okq, idx.reshape(-1), INVALID_INDEX), mode="drop")
    out_d2 = jnp.full((Q + 1,), jnp.inf, jnp.float32).at[slot].set(
        jnp.where(okq, d2.reshape(-1), jnp.inf), mode="drop")
    return out_idx[:Q], out_d2[:Q]


# ---------------------------------------------------------------------------
# k-NN over the run grid (reference contract: [Q, max_nn] index/dist
# arrays with -1/inf fill, knn/kdtree_flann.inl)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "qcap"))
def knn_rungrid(grid: RunGrid, queries, k: int, qcap: int, radius,
                query_mask=None):
    """k nearest neighbors within `radius` (pass +inf for pure kNN
    bounded only by grid coverage). Returns (idx [Q,k] int32 sorted by
    distance, -1 fill; d2 [Q,k], +inf fill).

    Exactness requires the k-th neighbor to lie within the 27-cell
    neighborhood and the grid's per-cell cap; `knn_search_grid` wraps
    this with density-based sizing and a growth retry."""
    Q = queries.shape[0]
    KC = grid.kc
    if k > KC:
        idx, d2 = knn_rungrid(grid, queries, KC, qcap, radius,
                              query_mask=query_mask)
        return (jnp.pad(idx, ((0, 0), (0, k - KC)),
                        constant_values=INVALID_INDEX),
                jnp.pad(d2, ((0, 0), (0, k - KC)),
                        constant_values=np.inf))
    qsoa, qidx = bin_queries(queries, queries, grid.origin,
                             grid.cell_size, grid.dims, qcap,
                             mask=query_mask)
    cp, _, _ = qsoa.shape
    T = 8
    n = cp // T
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    centers = cell_centers(grid.dims, grid.origin, grid.cell_size, cp)

    def body(args):
        q, qi, c, ni, cen = args
        e = q[:, 0:3, :] - cen[:, :, None]
        qn = jnp.sum(e * e, 1)
        v = c[:, 3, None, :] \
            + e[:, 0, :, None] * c[:, 0, None, :] \
            + e[:, 1, :, None] * c[:, 1, None, :] \
            + e[:, 2, :, None] * c[:, 2, None, :]
        nv, lanes = jax.lax.top_k(-v, k)          # [T, qcap, k]
        d2 = -nv + qn[:, :, None]
        fi = jnp.take_along_axis(ni[:, None, :], lanes, axis=-1)
        ok = (qi[:, :, None] >= 0) & (d2 <= r2) & (fi <= 0.0)
        return (jnp.where(ok, jnp.maximum(d2, 0.0), jnp.inf),
                jnp.where(ok, (-fi).astype(jnp.int32), INVALID_INDEX))

    d2t, idxt = jax.lax.map(body, (
        qsoa.reshape(n, T, qsoa.shape[1], qcap),
        qidx.reshape(n, T, qcap),
        grid.cand.reshape(n, T, 4, KC),
        grid.negidx.reshape(n, T, KC),
        centers.reshape(n, T, 3)))
    d2t = d2t.reshape(cp * qcap, k)
    idxt = idxt.reshape(cp * qcap, k)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Q)
    out_idx = jnp.full((Q + 1, k), INVALID_INDEX, jnp.int32) \
        .at[slot].set(jnp.where(okq[:, None], idxt, INVALID_INDEX),
                      mode="drop")[:Q]
    out_d2 = jnp.full((Q + 1, k), jnp.inf, jnp.float32) \
        .at[slot].set(jnp.where(okq[:, None], d2t, jnp.inf),
                      mode="drop")[:Q]
    return out_idx, out_d2


def knn_search_grid(queries_np, data_np, k: int,
                    radius: Optional[float] = None,
                    data_mask=None, max_retries: int = 3):
    """Exact grid kNN with density-based cell sizing and growth retry.

    Host wrapper (precompute API, not for jit loops): picks the cell
    so ~k neighbors fit in a 27-neighborhood, verifies every query
    found k in-coverage neighbors, and regrows the grid when not.
    Returns (idx [Q,k] int32, d2 [Q,k]) or None when a dense grid is
    unreasonable for this cloud (caller falls back to brute force).
    """
    data_np = np.asarray(data_np)
    queries_np = np.asarray(queries_np)
    n = data_np.shape[0]
    finite = np.isfinite(data_np).all(-1)
    if not finite.any():
        return None
    lo, hi = data_np[finite].min(0), data_np[finite].max(0)
    vol = float(np.prod(np.maximum(hi - lo, 1e-9)))
    density = max(n / max(vol, 1e-12), 1e-12)
    # radius of a ball expected to contain ~2k points
    r_est = (2.0 * max(k, 1) / (density * 4.19)) ** (1.0 / 3.0)
    if radius is not None:
        r_est = min(r_est, float(radius))
    r_cap = float(radius) if radius is not None else np.inf
    data_j = jnp.asarray(data_np, jnp.float32)
    q_j = jnp.asarray(queries_np, jnp.float32)
    attrs0 = jnp.zeros((n, 0), jnp.float32)
    for _ in range(max_retries):
        plan = plan_rungrid(data_np, r_est, margin=0.0,
                            query_points=queries_np,
                            cap_percentile=100.0, cap_limit=256)
        if plan is None:
            return None
        grid = make_rungrid(data_j, attrs0, plan["origin"],
                            plan["cell_size"], plan["dims"],
                            plan["cap"], mask=data_mask)
        idx, d2 = knn_rungrid(grid, q_j, k, plan["qcap"],
                              jnp.float32(min(r_est, r_cap)))
        found = np.asarray((idx >= 0).sum(-1))
        kneed = min(k, n)
        if radius is not None:
            # hybrid semantics: short lists are legal when fewer than
            # k data points lie within `radius`; a list is only
            # suspect when it is short AND the k-th distance could
            # exceed coverage
            if r_est >= r_cap or (found >= kneed).all():
                return idx, d2
        elif (found >= kneed).all():
            return idx, d2
        r_est *= 1.7
    return None


# ---------------------------------------------------------------------------
# truncated-Gaussian moment transform (FilterReg E-step)
# ---------------------------------------------------------------------------

def _make_gmm_kernel(T: int, qcap: int, KC: int, dims):
    """Per query: m0 = sum_l e, m1 = sum_l e*c' (3), m2 = sum_l e*|c'|^2
    with e = exp(-d^2 * inv_2s2), windows gated by the truncation
    radius. Replaces the reference's permutohedral-lattice Gaussian
    filtering (permutohedral.inl:92-123) with the same run-grid used
    by ICP — linear time, exact within the truncation radius."""

    def kern(p_ref, q_ref, qi_ref, c_ref, b_ref,
             o0, o1x, o1y, o1z, o2, m0s, m1xs, m1ys, m1zs, m2s):
        i = pl.program_id(0)
        R00, R01, R02 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
        R10, R11, R12 = p_ref[0, 3], p_ref[0, 4], p_ref[0, 5]
        R20, R21, R22 = p_ref[0, 6], p_ref[0, 7], p_ref[0, 8]
        t0, t1, t2 = p_ref[0, 9], p_ref[0, 10], p_ref[0, 11]
        r2 = p_ref[0, 12]
        inv_2s2 = p_ref[0, 17]
        ccx, ccy, ccz = _tile_centers(
            i, T, dims, p_ref[0, 13], p_ref[0, 14], p_ref[0, 15],
            p_ref[0, 16])
        ccx = ccx[:, :, None]
        ccy = ccy[:, :, None]
        ccz = ccz[:, :, None]
        qx = q_ref[:, 0, :][:, :, None]
        qy = q_ref[:, 1, :][:, :, None]
        qz = q_ref[:, 2, :][:, :, None]
        tx = R00 * qx + R01 * qy + R02 * qz + t0
        ty = R10 * qx + R11 * qy + R12 * qz + t1
        tz = R20 * qx + R21 * qy + R22 * qz + t2
        ex = tx - ccx
        ey = ty - ccy
        ez = tz - ccz
        qn = ex * ex + ey * ey + ez * ez
        dqc = jnp.sqrt(qn)
        valid = qi_ref[:, :][:, :, None] >= 0
        rr = jnp.sqrt(r2)

        for s in (m0s, m1xs, m1ys, m1zs, m2s):
            s[:] = jnp.zeros((T, qcap, 1), jnp.float32)

        for k in range(KC // WINDOW):
            lo = k * WINDOW
            need = jnp.any(valid & (
                rr + dqc >= b_ref[:, k:k + 1][:, :, None]))

            @pl.when(need)
            def _():
                cxk = c_ref[:, 0, lo:lo + WINDOW][:, None, :]
                cyk = c_ref[:, 1, lo:lo + WINDOW][:, None, :]
                czk = c_ref[:, 2, lo:lo + WINDOW][:, None, :]
                cnk = c_ref[:, 3, lo:lo + WINDOW][:, None, :]
                d2 = cnk + ex * cxk + ey * cyk + ez * czk + qn
                e = jnp.where(d2 <= r2,
                              jnp.exp(-jnp.maximum(d2, 0.0) * inv_2s2),
                              0.0)
                m0s[:] = m0s[:] + jnp.sum(e, -1, keepdims=True)
                # c' = -0.5 * stored rows
                m1xs[:] = m1xs[:] + jnp.sum(e * (-0.5) * cxk, -1,
                                            keepdims=True)
                m1ys[:] = m1ys[:] + jnp.sum(e * (-0.5) * cyk, -1,
                                            keepdims=True)
                m1zs[:] = m1zs[:] + jnp.sum(e * (-0.5) * czk, -1,
                                            keepdims=True)
                m2s[:] = m2s[:] + jnp.sum(e * cnk, -1, keepdims=True)

        w = valid.astype(jnp.float32)
        o0[:] = (m0s[:] * w)[:, :, 0]
        o1x[:] = (m1xs[:] * w)[:, :, 0]
        o1y[:] = (m1ys[:] * w)[:, :, 0]
        o1z[:] = (m1zs[:] * w)[:, :, 0]
        o2[:] = (m2s[:] * w)[:, :, 0]

    return kern


@partial(jax.jit, static_argnames=("use_pallas",))
def gmm_moments(grid: RunGrid, qsoa, qidx, params,
                use_pallas: Optional[bool] = None):
    """Gaussian moments (M0, M1 world, M2 world |y|^2) of the target
    cloud at each (transformed) query. params as make_params with
    r = truncation radius and params[17] = 1/(2 sigma^2)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    cp, nq, qcap = qsoa.shape
    KC = grid.kc
    NW = grid.n_windows
    if use_pallas:
        interpret = use_pallas == "interpret"
        T = _pick_tile(cp, KC, 0, qcap)
        kern = _make_gmm_kernel(T, qcap, KC, grid.dims)
        outs = pl.pallas_call(
            kern,
            grid=(cp // T,),
            in_specs=[
                pl.BlockSpec((1, 24), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, nq, qcap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, qcap), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 4, KC), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, NW), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((T, qcap), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 5,
            out_shape=[jax.ShapeDtypeStruct((cp, qcap),
                                            jnp.float32)] * 5,
            scratch_shapes=[pltpu.VMEM((T, qcap, 1), jnp.float32)
                            for _ in range(5)],
            interpret=interpret,
        )(params.reshape(1, 24), qsoa, qidx, grid.cand, grid.bounds)
        m0, m1x, m1y, m1z, m2 = outs
    else:
        m0, m1x, m1y, m1z, m2 = _gmm_moments_xla(grid, qsoa, qidx,
                                                 params)
    # shift centered moments to world frame:
    # M1 = m1' + cc*m0 ; M2 = m2' + 2 cc.m1' + |cc|^2 m0
    centers = cell_centers(grid.dims, params[13:16], params[16], cp)
    cx = centers[:, 0:1]
    cy = centers[:, 1:2]
    cz = centers[:, 2:3]
    M1 = jnp.stack([m1x + cx * m0, m1y + cy * m0, m1z + cz * m0], -1)
    M2 = m2 + 2.0 * (cx * m1x + cy * m1y + cz * m1z) \
        + (cx * cx + cy * cy + cz * cz) * m0
    return m0, M1, M2


def _gmm_moments_xla(grid: RunGrid, qsoa, qidx, params):
    cp, nq, qcap = qsoa.shape
    KC = grid.kc
    T = 8
    n = cp // T
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    r2 = params[12]
    inv_2s2 = params[17]
    centers = cell_centers(grid.dims, params[13:16], params[16], cp)

    def body(args):
        q, qi, c, cen = args
        qw = jnp.einsum("ij,tjq->tiq", R, q[:, 0:3, :]) + t[None, :, None]
        e_ = qw - cen[:, :, None]
        qn = jnp.sum(e_ * e_, 1)
        d2 = c[:, 3, None, :] \
            + e_[:, 0, :, None] * c[:, 0, None, :] \
            + e_[:, 1, :, None] * c[:, 1, None, :] \
            + e_[:, 2, :, None] * c[:, 2, None, :] + qn[:, :, None]
        w = jnp.where(d2 <= r2,
                      jnp.exp(-jnp.maximum(d2, 0.0) * inv_2s2), 0.0)
        w = w * (qi[:, :, None] >= 0)
        m0 = jnp.sum(w, -1)
        m1x = jnp.sum(w * (-0.5) * c[:, 0, None, :], -1)
        m1y = jnp.sum(w * (-0.5) * c[:, 1, None, :], -1)
        m1z = jnp.sum(w * (-0.5) * c[:, 2, None, :], -1)
        m2 = jnp.sum(w * c[:, 3, None, :], -1)
        return m0, m1x, m1y, m1z, m2

    outs = jax.lax.map(body, (
        qsoa.reshape(n, T, nq, qcap), qidx.reshape(n, T, qcap),
        grid.cand.reshape(n, T, 4, KC), centers.reshape(n, T, 3)))
    return tuple(o.reshape(cp, qcap) for o in outs)
