"""Run-structured candidate grid — third-generation ICP hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl); rounds 1-2 replaced it with dense
roll grids (knn/rollgrid.py, knn/packgrid.py).  Profiling packgrid on a
v5e showed the dominant costs per frame: (a) the build-time per-cell
lane sort (a [cells, 27*cap] multi-operand sort, ~200 ms at 1M points),
(b) per-iteration query re-binning, and (c) per-window CROSS-LANE
reductions — every `min`/`max` over 128 lanes costs ~log2(128) VPU
passes, and a select-max fetch per attribute channel per window
multiplies that by the channel count.

This module removes them by changing the data structure AND the kernel
dataflow:

1. SORTED LANES, CHEAP.  The 27-cell neighborhood of every cell is
   assembled with `jnp.roll` as 27 runs of `cap` lanes, then the lanes
   are sorted by distance to the row's cell center — a multi-operand
   lane sort whose TPU cost is nearly payload-independent (measured;
   unlike the gather-based permutation apply, which is ~15x slower).
   Sorted lanes buy (a) KC truncation to the 99.9th percentile of
   27-block occupancy and (b) RISING per-128-lane-window bounds, so a
   best-so-far gate can skip tail windows wholesale.

2. CELL-CENTERED coordinates.  Candidates are stored relative to the
   center of the cell whose neighborhood row they sit in (per-run
   offsets folded in at build), so the score v = |c|^2 - 2 q.c runs on
   ~cell-sized magnitudes (f32 error ~1e-8) and |c| doubles as the
   sort key and pruning distance.

3. PREFIX + GATED TAIL kernel.  The nearest L1 lanes are scanned as
   ONE unconditional dataflow block (Mosaic pipelines it; equal-op
   per-window scratch update chains measured several times slower);
   the winner's attributes are fetched from 16-bit pairs packed into
   int32 channels with one masked max per channel.  Tail windows run
   under `pl.when` only while some query's best + its distance to the
   cell center reaches the window's bound — near convergence no tail
   window runs.

4. The ICP Gauss-Newton reduction happens INSIDE the kernel: the
   jacobian rows are formed from the unpacked winner attributes and
   reduced to one 32-float row per tile (utility/eigen.py solves the
   6x6 outside).  Per ICP iteration nothing but [tiles, 32] partials
   leaves the kernel — no gathers, scatters, or host round-trips
   (the reference hot loop syncs per iteration,
   registration.cu:154-171).

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
BIG = 3.0e18
WINDOW = 128  # pruning-window width in lanes
NPARAMS = 32

# 27 neighbor offsets in ascending center-to-center distance:
# own cell, 6 faces, 12 edges, 8 corners.
RUN_OFFSETS = tuple(sorted(
    ((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)),
    key=lambda o: (o[0] * o[0] + o[1] * o[1] + o[2] * o[2],) + o))

# estimator codes (static kernel variants); values match
# registration.estimation.TransformationEstimationType where relevant
EST_NONE = 0    # correspondence only: outputs (d2, -index)
EST_PT2PT = 1   # packed attrs: centered target point
EST_PT2PL = 2   # packed attrs: normal + centered plane offset
EST_SYM = 3     # packed attrs: centered point + target normal

N_SUMS = 32
# GN slot layout: 0-20 JTJ upper-tri, 21-26 JTr, 27 count, 28 err
# PT2PT layout:   0 count, 1-3 sum(t), 4-6 sum(p), 7-15 sum(t p^T),
#                 16 err


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _n_packed(est: int) -> int:
    return {EST_NONE: 0, EST_PT2PT: 2, EST_PT2PL: 2, EST_SYM: 3}[est]


def _n_unpacked(est: int) -> int:
    return {EST_NONE: 0, EST_PT2PT: 3, EST_PT2PL: 4, EST_SYM: 6}[est]


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

class RunGrid:
    """Pytree; `dims`, `cap`, `kc`, `est` static.

    cand     [Cp, 4, KC]   rows (-2cx, -2cy, -2cz, |c|^2), c relative
                           to the row's cell center; empty: |c|^2 = BIG
    attrp    [Cp, P, KC]   int32, two 16-bit quantized attribute fields
                           per lane (estimator-specific; P may be 0)
    negidx   [Cp, KC]      -original_index as f32 (-(-1) = empty)
    bounds   [Cp, NW]      min |c| per 128-lane window (+inf if empty)
    pack_lohi [2P, 2]      (lo, scale) per 16-bit field for unpacking
    """

    def __init__(self, cand, attrp, negidx, bounds, pack_lohi, origin,
                 cell_size, dims, cap, kc, est):
        self.cand = cand
        self.attrp = attrp
        self.negidx = negidx
        self.bounds = bounds
        self.pack_lohi = pack_lohi
        self.origin = origin
        self.cell_size = cell_size
        self.dims = tuple(int(d) for d in dims)
        self.cap = int(cap)
        self.kc = int(kc)
        self.est = int(est)

    @property
    def n_windows(self) -> int:
        return self.kc // WINDOW


def _rungrid_flatten(g):
    return ((g.cand, g.attrp, g.negidx, g.bounds, g.pack_lohi,
             g.origin, g.cell_size),
            (g.dims, g.cap, g.kc, g.est))


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
    registration/fused_icp.py)."""
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
    # lanes are sorted by distance at build, so KC can truncate to the
    # 99.9th percentile of 27-block occupancy instead of 27*cap
    blk = np.zeros(np.asarray(dims_core) + 2, np.int64)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                blk[dx:dx + dims_core[0], dy:dy + dims_core[1],
                    dz:dz + dims_core[2]] += counts
    blk_occ = blk[blk > 0]
    kc_full = _round_up(27 * cap, WINDOW)
    if blk_occ.size:
        kc = min(kc_full, max(WINDOW, _round_up(
            int(np.percentile(blk_occ, 99.9)), WINDOW)))
    else:
        kc = kc_full
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

def _pack_channel_list(est: int, coords, attrs_rolled, cell_size):
    """Estimator-specific 16-bit fields: list of (values [C, KC],
    lo, hi) with lo/hi possibly traced (cell-relative ranges)."""
    cx, cy, cz = coords
    pr = 1.6 * cell_size   # |centered coord| bound (cell + half-diag)
    dr = 3.0 * cell_size   # |re-centered plane offset| bound
    if est == EST_PT2PT:
        return [(cx, -pr, pr), (cy, -pr, pr), (cz, -pr, pr),
                (jnp.zeros_like(cx), -1.0, 1.0)]
    if est == EST_PT2PL:
        n0, n1, n2, d = attrs_rolled[:4]
        return [(n0, -1.0, 1.0), (n1, -1.0, 1.0), (n2, -1.0, 1.0),
                (d, -dr, dr)]
    if est == EST_SYM:
        n0, n1, n2 = attrs_rolled[:3]
        return [(cx, -pr, pr), (cy, -pr, pr), (cz, -pr, pr),
                (n0, -1.0, 1.0), (n1, -1.0, 1.0), (n2, -1.0, 1.0)]
    return []


@partial(jax.jit, static_argnames=("dims", "cap", "nch", "est", "kc"))
def build_rungrid_arrays(points, attrs, origin, cell_size,
                         dims: Tuple[int, int, int], cap: int, nch: int,
                         est: int = EST_NONE, mask=None,
                         kc: Optional[int] = None):
    """Bin targets once, assemble the 27-run neighborhood with
    `jnp.roll` (no gathers, no lane sort), fold per-run center offsets
    into the coordinates, quantize the estimator's fetch channels to
    16-bit pairs, and record per-window pruning bounds.

    For EST_PT2PL, attrs is [N, 4] = (normal, d = n.p); d is
    re-centered per row (d_rel = d - n.row_center) so the kernel's
    centered residual n.q_centered - d_rel equals the world-frame
    n.q - d exactly."""
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

    if est == EST_PT2PL:
        rcen = cell_centers(dims, origin, cell_size, C)
        ach[3] = ach[3] - (ach[0] * rcen[:, 0:1] + ach[1] * rcen[:, 1:2]
                           + ach[2] * rcen[:, 2:3])

    empty = ~jnp.isfinite(cx)
    dist = jnp.where(empty, jnp.float32(np.inf),
                     jnp.sqrt(cx * cx + cy * cy + cz * cz))
    zero = jnp.zeros_like(cx)
    cx, cy, cz = (jnp.where(empty, zero, v) for v in (cx, cy, cz))

    # 16-bit-pair attribute packing (winner-fetch operands)
    fields = _pack_channel_list(est, (cx, cy, cz), ach, cell_size)
    packed = []
    lohi = []
    for i in range(0, len(fields), 2):
        (v0, lo0, hi0) = fields[i]
        (v1, lo1, hi1) = fields[i + 1]

        def q16(v, lo, hi):
            s = 65535.0 / (hi - lo)
            return jnp.clip(jnp.round((v - lo) * s), 0.0,
                            65535.0).astype(jnp.int32)

        packed.append(q16(v0, lo0, hi0) | (q16(v1, lo1, hi1) << 16))
        lohi.append(jnp.stack([
            jnp.asarray(lo0, jnp.float32),
            jnp.asarray((hi0 - lo0) / 65535.0, jnp.float32)]))
        lohi.append(jnp.stack([
            jnp.asarray(lo1, jnp.float32),
            jnp.asarray((hi1 - lo1) / 65535.0, jnp.float32)]))
    P = len(packed)
    pack_lohi = jnp.stack(lohi, 0) if P else jnp.zeros((0, 2),
                                                       jnp.float32)
    negidx = jnp.where(empty, -float(INVALID_INDEX), negidx)

    # LANE SORT by distance to the row's cell center: windows become
    # rising-bound prefixes (the kernel's best-so-far gate prunes the
    # tail) and far/empty lanes can be truncated to the planned kc.
    # Payload-count barely affects XLA sort cost on TPU (measured).
    ops = jax.lax.sort(
        (dist, cx, cy, cz, negidx) + tuple(packed),
        num_keys=1, is_stable=False, dimension=1)
    dist, cx, cy, cz, negidx = ops[:5]
    packed = list(ops[5:])

    kc_full = _round_up(27 * cap, WINDOW)
    kc = kc_full if kc is None else min(int(kc), kc_full)
    if kc < dist.shape[1]:
        dist = dist[:, :kc]
        cx, cy, cz = cx[:, :kc], cy[:, :kc], cz[:, :kc]
        negidx = negidx[:, :kc]
        packed = [v[:, :kc] for v in packed]
    elif kc > dist.shape[1]:
        padn = kc - dist.shape[1]
        dist = jnp.pad(dist, ((0, 0), (0, padn)),
                       constant_values=np.inf)
        cx, cy, cz = (jnp.pad(v, ((0, 0), (0, padn)))
                      for v in (cx, cy, cz))
        negidx = jnp.pad(negidx, ((0, 0), (0, padn)),
                         constant_values=-float(INVALID_INDEX))
        packed = [jnp.pad(v, ((0, 0), (0, padn))) for v in packed]

    lane_empty = ~jnp.isfinite(dist)
    cn = jnp.where(lane_empty, BIG, dist * dist)
    bounds = jnp.min(dist.reshape(C, kc // WINDOW, WINDOW), -1)
    attrp = jnp.stack(packed, 1) if P else jnp.zeros((C, 0, kc),
                                                     jnp.int32)
    cand = jnp.stack([-2.0 * cx, -2.0 * cy, -2.0 * cz, cn], 1)

    cp = padded_cells(dims)
    if cp > C:
        cand = jnp.concatenate([
            cand, jnp.zeros((cp - C, 4, kc), jnp.float32)
            .at[:, 3, :].set(BIG)], 0)
        attrp = jnp.concatenate(
            [attrp, jnp.zeros((cp - C, P, kc), jnp.int32)], 0)
        negidx = jnp.concatenate([
            negidx, jnp.full((cp - C, kc), -float(INVALID_INDEX),
                             jnp.float32)], 0)
        bounds = jnp.concatenate([
            bounds, jnp.full((cp - C, kc // WINDOW), np.inf,
                             jnp.float32)], 0)
    return cand, attrp, negidx, bounds, pack_lohi


def make_rungrid(points, attrs, origin, cell_size, dims, cap,
                 mask=None, est: int = EST_NONE,
                 kc: Optional[int] = None) -> RunGrid:
    nch = int(attrs.shape[1])
    cand, attrp, negidx, bounds, pack_lohi = build_rungrid_arrays(
        points, attrs, jnp.asarray(origin, jnp.float32),
        jnp.asarray(cell_size, jnp.float32), tuple(dims), int(cap),
        nch, est=int(est), mask=mask,
        kc=int(kc) if kc is not None else None)
    return RunGrid(cand, attrp, negidx, bounds, pack_lohi,
                   jnp.asarray(origin, jnp.float32),
                   jnp.asarray(cell_size, jnp.float32), tuple(dims),
                   int(cap), int(cand.shape[2]), int(est))


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


def make_params(T, r2, grid: RunGrid, inv_2s2=0.0):
    """[NPARAMS] f32 scalar block: R row-major (0-8), t (9-11), r^2
    (12), origin (13-15), cell_size (16), inv_2s2 (17), per-16-bit-
    field (lo, scale) unpack pairs (18..)."""
    R = T[:3, :3].reshape(-1)
    t = T[:3, 3]
    head = jnp.concatenate([
        R, t, jnp.asarray(r2, jnp.float32).reshape(1),
        jnp.asarray(grid.origin, jnp.float32).reshape(3),
        jnp.asarray(grid.cell_size, jnp.float32).reshape(1),
        jnp.asarray(inv_2s2, jnp.float32).reshape(1)])
    fields = grid.pack_lohi.reshape(-1)
    pad = NPARAMS - head.shape[0] - fields.shape[0]
    return jnp.concatenate([head, fields,
                            jnp.zeros(max(pad, 0), jnp.float32)])


# ---------------------------------------------------------------------------
# fused query (+ optional GN reduction) kernel
# ---------------------------------------------------------------------------

def _gn_terms(est: int, fetched, tx, ty, tz, ex, ey, ez,
              ccx, ccy, ccz, src_n, ok, d2c):
    """Sum terms (length <= N_SUMS) given unpacked winner channels.

    tx.. = world-frame transformed source; ex.. = cell-centered same;
    ccx.. = cell centers; src_n = rotated source normals (sym only).
    Fetched channels: PT2PT/SYM lead with the CENTERED target point.
    """
    w = ok.astype(jnp.float32)
    if est == EST_PT2PT:
        px = fetched[0] + ccx
        py = fetched[1] + ccy
        pz = fetched[2] + ccz
        terms = [w, w * tx, w * ty, w * tz, w * px, w * py, w * pz]
        for s in (tx, ty, tz):
            for d in (px, py, pz):
                terms.append(w * s * d)
        terms.append(d2c)
        return terms
    if est == EST_PT2PL:
        nx, ny, nz, dd = fetched[:4]
        r = nx * ex + ny * ey + nz * ez - dd
        j = (ty * nz - tz * ny, tz * nx - tx * nz, tx * ny - ty * nx,
             nx, ny, nz)
    elif est == EST_SYM:
        pxc, pyc, pzc = fetched[0], fetched[1], fetched[2]
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


def _unpack16(word, lo, scale, high: bool):
    u = (word >> 16) & 0xFFFF if high else word & 0xFFFF
    return u.astype(jnp.float32) * scale + lo


def _make_fused_kernel(est: int, P: int, T: int, qcap: int, KC: int,
                       dims, corres: bool):
    NW = KC // WINDOW

    def kern(p_ref, q_ref, qi_ref, c_ref, a_ref, ni_ref, b_ref,
             *out_and_scratch):
        n_out = 2 if corres else 1
        outs = out_and_scratch[:n_out]
        bt_ref = out_and_scratch[n_out]           # best score so far
        acc = out_and_scratch[n_out + 1:]         # winner attrs
        i = pl.program_id(0)
        R00, R01, R02 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
        R10, R11, R12 = p_ref[0, 3], p_ref[0, 4], p_ref[0, 5]
        R20, R21, R22 = p_ref[0, 6], p_ref[0, 7], p_ref[0, 8]
        t0, t1, t2 = p_ref[0, 9], p_ref[0, 10], p_ref[0, 11]
        r2 = p_ref[0, 12]
        ccx, ccy, ccz = _tile_centers(
            i, T, dims, p_ref[0, 13], p_ref[0, 14], p_ref[0, 15],
            p_ref[0, 16])
        # per-query scalars live on [T, qcap] (qcap lanes) — only the
        # three centered coordinates are expanded to the [T, qcap, 1]
        # sublane layout the [T, qcap, lanes] score broadcasts need;
        # every extra expanded tensor pads its minor dim to a full
        # 128-lane tile in both VMEM and op cost
        qx = q_ref[:, 0, :]
        qy = q_ref[:, 1, :]
        qz = q_ref[:, 2, :]
        tx = R00 * qx + R01 * qy + R02 * qz + t0
        ty = R10 * qx + R11 * qy + R12 * qz + t1
        tz = R20 * qx + R21 * qy + R22 * qz + t2
        ex2 = tx - ccx
        ey2 = ty - ccy
        ez2 = tz - ccz
        qn = ex2 * ex2 + ey2 * ey2 + ez2 * ez2
        dqc = jnp.sqrt(qn)
        valid = qi_ref[:, :] >= 0
        rr = jnp.sqrt(r2)
        ex = ex2[:, :, None]
        ey = ey2[:, :, None]
        ez = ez2[:, :, None]

        # SORTED-PREFIX structure: the first L1 lanes (nearest
        # candidates, lanes sorted by center distance at build) are
        # scanned unconditionally as ONE dataflow block — Mosaic
        # pipelines it fully; per-window scratch read-modify-write
        # chains measured ~10x slower for the same op count.  Tail
        # windows are gated by the prefix best: a window runs only if
        # some query could still improve (rising bounds make this gate
        # effective; near convergence no tail window runs).
        nsel = 1 if corres else P

        def score(lo, width):
            cxk = c_ref[:, 0, lo:lo + width][:, None, :]
            cyk = c_ref[:, 1, lo:lo + width][:, None, :]
            czk = c_ref[:, 2, lo:lo + width][:, None, :]
            cnk = c_ref[:, 3, lo:lo + width][:, None, :]
            return cnk + ex * cxk + ey * cyk + ez * czk

        def fetch(v, m, lo, width):
            eqw = v <= m
            out = []
            for ch in range(nsel):
                if corres:
                    src = ni_ref[:, lo:lo + width][:, None, :]
                    fill = float(-np.inf)
                else:
                    src = a_ref[:, ch, lo:lo + width][:, None, :]
                    fill = np.iinfo(np.int32).min
                out.append(jnp.max(jnp.where(eqw, src, fill), -1,
                                   keepdims=True))
            return out

        L1 = min(2 * WINDOW, KC)
        v1 = score(0, L1)
        m1 = jnp.min(v1, -1, keepdims=True)
        f1 = fetch(v1, m1, 0, L1)
        bt_ref[:] = m1
        for ch in range(nsel):
            acc[ch][:] = f1[ch]

        # the tail runs as at most two gated blocks: scalar `any`
        # gates cost a vector->scalar sync each, so gate granularity
        # is coarse; lanes are sorted, so each block's first-window
        # bound is the minimum over that whole block
        tail_splits = []
        if KC > L1:
            mid = L1 + _round_up((KC - L1) // 2, WINDOW)
            mid = min(max(mid, L1 + WINDOW), KC)
            tail_splits = [(L1, mid)] + ([(mid, KC)] if mid < KC else [])
        for (lo_t, hi_t) in tail_splits:
            bestd = jnp.sqrt(jnp.maximum(
                jnp.minimum(bt_ref[:][:, :, 0] + qn, r2), 0.0))
            kt = lo_t // WINDOW
            need = jnp.any(valid & (bestd + dqc >= b_ref[:, kt:kt + 1]))

            @pl.when(need)
            def _(lo_t=lo_t, hi_t=hi_t):
                v = score(lo_t, hi_t - lo_t)
                m = jnp.min(v, -1, keepdims=True)
                better = m < bt_ref[:]
                f = fetch(v, m, lo_t, hi_t - lo_t)
                for ch in range(nsel):
                    acc[ch][:] = jnp.where(better, f[ch], acc[ch][:])
                bt_ref[:] = jnp.where(better, m, bt_ref[:])

        # EPILOGUE LAYOUT: everything from here on runs on squeezed
        # [T, qcap] tensors (one relayout per input) — the [T, qcap, 1]
        # form pads its minor dim to a full 128-lane tile, which made
        # the ~30 Gauss-Newton term ops cost as much as scanning
        # several extra candidate windows
        d2 = bt_ref[:][:, :, 0] + qn
        ok = valid & (d2 <= r2)

        if corres:
            outs[0][:] = jnp.where(ok, jnp.maximum(d2, 0.0),
                                   float(np.inf))
            outs[1][:] = jnp.where(ok, acc[0][:][:, :, 0],
                                   float(-INVALID_INDEX))
            return

        fetched = []
        for ch in range(P):
            w = acc[ch][:][:, :, 0]
            for high in (False, True):
                f = 2 * ch + int(high)
                fetched.append(_unpack16(w, p_ref[0, 18 + 2 * f],
                                         p_ref[0, 19 + 2 * f], high))
        d2c = jnp.where(ok, jnp.maximum(d2, 0.0), 0.0)
        if est == EST_SYM:
            s0 = q_ref[:, 3, :]
            s1 = q_ref[:, 4, :]
            s2 = q_ref[:, 5, :]
            src_n = (R00 * s0 + R01 * s1 + R02 * s2,
                     R10 * s0 + R11 * s1 + R12 * s2,
                     R20 * s0 + R21 * s1 + R22 * s2)
        else:
            src_n = None
        terms = _gn_terms(est, fetched, tx, ty, tz, ex2, ey2, ez2,
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

    return kern


def _pick_tile(cp: int, kc: int, P: int, qcap: int) -> int:
    """Largest tile (cells per program) fitting a ~10 MB VMEM budget:
    double-buffered input blocks, the [T, qcap, WINDOW] lane-min
    scratch + score temporary, and ~12 live [T, qcap, 1] per-query
    tensors whose minor dim pads to a full 128-lane tile."""
    per_cell = (
        2 * (4 + max(P, 1) + 1) * kc * 4        # cand+attr+bounds blocks
        + 2 * 8 * qcap * 4                       # qsoa + qidx blocks
        + 3 * qcap * 2 * WINDOW * 4              # prefix score + eq
        + 12 * qcap * WINDOW * 4                 # padded [T,qcap,1] regs
    )
    t = max(8, min(64, (10 << 20) // per_cell // 8 * 8))
    while cp % t:
        t -= 8
    return max(t, 8)


@partial(jax.jit, static_argnames=("est", "corres", "use_pallas",
                                   "tile"))
def fused_query(grid: RunGrid, qsoa, qidx, params, est: int,
                corres: bool, use_pallas: Optional[bool] = None,
                tile: Optional[int] = None):
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
    P = grid.attrp.shape[1]
    NW = grid.n_windows
    T = tile if tile else _pick_tile(cp, KC, P, qcap)
    kern = _make_fused_kernel(est, P, T, qcap, KC, grid.dims, corres)
    scratch = [pltpu.VMEM((T, qcap, 1), jnp.float32)]
    if corres:
        scratch += [pltpu.VMEM((T, qcap, 1), jnp.float32)]
        out_shape = [jax.ShapeDtypeStruct((cp, qcap), jnp.float32)] * 2
        out_specs = [pl.BlockSpec((T, qcap), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * 2
    else:
        scratch += [pltpu.VMEM((T, qcap, 1), jnp.int32)
                    for _ in range(P)]
        out_shape = [jax.ShapeDtypeStruct((cp // T, N_SUMS),
                                          jnp.float32)]
        out_specs = [pl.BlockSpec((cp // T, N_SUMS), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
    attrp = grid.attrp if P else jnp.zeros((cp, 1, KC), jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(cp // T,),
        in_specs=[
            pl.BlockSpec((1, NPARAMS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, nq, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, qcap), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4, KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, max(P, 1), KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # negidx is only fetched in corres mode; the GN path gets
            # a tiny dummy so its DMA cost disappears
            pl.BlockSpec((T, KC if corres else 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, NW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(params.reshape(1, NPARAMS), qsoa, qidx, grid.cand, attrp,
      grid.negidx if corres else jnp.zeros((cp, 8), jnp.float32),
      grid.bounds)
    return tuple(outs) if corres else outs[0]


def _fused_query_xla(grid: RunGrid, qsoa, qidx, params, est: int,
                     corres: bool):
    """Reference semantics on any backend (no window gating), with
    the same quantized attribute fetch as the Pallas kernel; used by
    the CPU test suite and as the non-TPU fallback."""
    cp, nq, qcap = qsoa.shape
    KC = grid.kc
    P = grid.attrp.shape[1]
    T = 8
    n = cp // T
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    r2 = params[12]
    centers = cell_centers(grid.dims, params[13:16], params[16], cp)

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
        d2 = m + qn
        ok = (qi >= 0) & (d2 <= r2)
        eq = v <= m[:, :, None]
        if corres:
            fi = jnp.max(jnp.where(eq, ni[:, None, :], -jnp.inf), -1)
            return (jnp.where(ok, jnp.maximum(d2, 0.0), jnp.inf),
                    jnp.where(ok, fi, -float(INVALID_INDEX)))

        fetched = []
        for ch in range(P):
            w = jnp.max(jnp.where(eq, a[:, ch, None, :],
                                  np.iinfo(np.int32).min), -1)
            for high in (False, True):
                f = 2 * ch + int(high)
                fetched.append(_unpack16(w, params[18 + 2 * f],
                                         params[19 + 2 * f], high))
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

    attrp = grid.attrp if P else jnp.zeros((cp, 1, KC), jnp.int32)
    args = (qsoa.reshape(n, T, nq, qcap),
            qidx.reshape(n, T, qcap),
            grid.cand.reshape(n, T, 4, KC),
            attrp.reshape(n, T, max(P, 1), KC),
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
                         jnp.asarray(radius, jnp.float32) ** 2, grid)
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
    # batch enough cells per map step to keep the VPU busy (T=8 left
    # ~1500 tiny top_k dispatches at FPFH shapes)
    T = next(t for t in (32, 16, 8, 4, 2, 1) if cp % t == 0)
    n = cp // T
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    centers = cell_centers(grid.dims, grid.origin, grid.cell_size, cp)

    def body(args):
        q, qi, c, ni, cen = args
        Tq, qc = qi.shape
        e = q[:, 0:3, :] - cen[:, :, None]
        qn = jnp.sum(e * e, 1)
        v = c[:, 3, None, :] \
            + e[:, 0, :, None] * c[:, 0, None, :] \
            + e[:, 1, :, None] * c[:, 1, None, :] \
            + e[:, 2, :, None] * c[:, 2, None, :]
        d2a = v + qn[:, :, None]                  # [T, qcap, KC]
        valid = (qi[:, :, None] >= 0) & (d2a <= r2) \
            & (ni[:, None, :] <= 0.0)
        if k == 1:
            # plain masked argmin (first-lane tie-break, matching the
            # old top_k path)
            dm = jnp.where(valid, d2a, jnp.inf)
            lane1 = jnp.argmin(dm, -1)
            d21 = jnp.take_along_axis(dm, lane1[..., None], -1)
            fi1 = jnp.take_along_axis(
                jnp.broadcast_to(ni[:, None, :], d2a.shape),
                lane1[..., None], -1)
            ok1 = jnp.isfinite(d21)
            return (jnp.where(ok1, jnp.maximum(d21, 0.0), jnp.inf),
                    jnp.where(ok1, (-fi1).astype(jnp.int32),
                              INVALID_INDEX))
        # k > 1: lax.top_k over the candidate lanes. NOTE a
        # threshold-bisection select (count-halving for the k-th
        # distance + rank bisect on the selection prefix sum) was
        # measured ~2x SLOWER than top_k on v5e at k=30..64 over
        # KC~1.5k lanes — the 30+log(KC) full-width passes cost more
        # than the fused sort network.
        nv, lanes = jax.lax.top_k(-jnp.where(valid, d2a, jnp.inf), k)
        d2k = -nv
        fik = jnp.take_along_axis(ni[:, None, :], lanes, axis=-1)
        ok = jnp.isfinite(d2k)
        return (jnp.where(ok, jnp.maximum(d2k, 0.0), jnp.inf),
                jnp.where(ok, (-fik).astype(jnp.int32),
                          INVALID_INDEX))

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


_GRID_CACHE_MAX = 4
_grid_cache: "dict" = {}  # fingerprint -> (grid, qcap, cell)


def _data_fingerprint(data_np, data_mask) -> tuple:
    """Cheap content key for grid reuse across pipeline stages
    (estimate_normals -> FPFH -> FGR run kNN on the SAME cloud;
    re-planning/rebuilding per call dominated the FGR pipeline,
    VERDICT r4 #6). Samples 64 strided rows, not the whole cloud."""
    n = data_np.shape[0]
    step = max(1, n // 64)
    sample = np.ascontiguousarray(data_np[::step][:64])
    import zlib
    return (n, data_np.shape[1], zlib.crc32(sample.tobytes()),
            None if data_mask is None else int(np.sum(data_mask)))


def clear_grid_cache():
    _grid_cache.clear()


def knn_search_grid(queries_np, data_np, k: int,
                    radius: Optional[float] = None,
                    data_mask=None, max_retries: int = 3,
                    queries_dev=None, data_dev=None):
    """Exact grid kNN with density-based cell sizing and growth retry.

    Host wrapper (precompute API, not for jit loops): picks the cell
    so ~k neighbors fit in a 27-neighborhood, verifies every query
    found k in-coverage neighbors, and regrows the grid when not.
    A small content-keyed cache reuses the built grid across calls on
    the same cloud (the acceptance test below makes reuse exact: a
    cached grid either yields provably-complete neighbor lists for
    the new (k, radius) or we fall through to a fresh build).
    Returns (idx [Q,k] int32, d2 [Q,k]) or None when a dense grid is
    unreasonable for this cloud (caller falls back to brute force).
    """
    data_np = np.asarray(data_np)
    queries_np = np.asarray(queries_np)
    n = data_np.shape[0]
    finite = np.isfinite(data_np).all(-1)
    if not finite.any():
        return None
    r_cap = float(radius) if radius is not None else np.inf
    kneed = min(k, n)

    def accept(idx, d2, r_eff):
        found = np.asarray((idx >= 0).sum(-1))
        if radius is not None:
            # hybrid semantics: short lists are legal when fewer than
            # k data points lie within `radius`; a list is only
            # suspect when it is short AND the k-th distance could
            # exceed coverage
            return r_eff >= r_cap or (found >= kneed).all()
        return (found >= kneed).all()

    # device arrays ride through when the caller already has them:
    # host->device uploads cost ~58 ms/MB on this machine's TPU
    # tunnel, and search_neighbors always starts from device data
    q_j = queries_dev if queries_dev is not None \
        else jnp.asarray(queries_np, jnp.float32)
    key = _data_fingerprint(data_np, data_mask)
    cached = _grid_cache.get(key)
    if cached is not None:
        grid, qcap, cell = cached
        idx, d2 = knn_rungrid(grid, q_j, k, qcap,
                              jnp.float32(min(cell, r_cap)))
        # stricter than `accept`: the cached qcap was sized for a
        # DIFFERENT query set, so a query dropped by pool overflow
        # (all-empty row) must force a fresh build even when the
        # cached cell already covers the requested radius
        found = np.asarray((idx >= 0).sum(-1))
        if (found >= min(kneed, 1)).all() and accept(idx, d2, cell):
            return idx, d2

    lo, hi = data_np[finite].min(0), data_np[finite].max(0)
    vol = float(np.prod(np.maximum(hi - lo, 1e-9)))
    density = max(n / max(vol, 1e-12), 1e-12)
    # radius of a ball expected to contain ~2k points
    r_est = (2.0 * max(k, 1) / (density * 4.19)) ** (1.0 / 3.0)
    if radius is not None:
        r_est = min(r_est, float(radius))
    data_j = data_dev if data_dev is not None \
        else jnp.asarray(data_np, jnp.float32)
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
        if accept(idx, d2, r_est):
            if len(_grid_cache) >= _GRID_CACHE_MAX:
                _grid_cache.pop(next(iter(_grid_cache)))
            _grid_cache[key] = (grid, plan["qcap"],
                                float(plan["cell_size"]))
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
                pl.BlockSpec((1, NPARAMS), lambda i: (0, 0),
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
        )(params.reshape(1, NPARAMS), qsoa, qidx, grid.cand,
          grid.bounds)
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
