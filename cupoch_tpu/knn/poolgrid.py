"""Pooled-query MXU correspondence grid — fourth-generation ICP hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl); rounds 1-3 replaced it with dense
roll grids and the sorted-lane `rungrid`.  Profiling rungrid on a real
v5e (with the ~24 ms per-dispatch tunnel overhead amortised away)
showed ~49 ms per ICP iteration at 1M points, ~45 of which are VPU
passes over the [cells, qcap, KC] score/fetch broadcasts, and a 150 ms
grid build dominated by a 1728-lane multi-operand sort.

This module restructures both around the MXU and the measured machine
balance (v5e: 197 Tbf16 MXU, ~0.8 TB/s HBM, VPU ~4 vreg-ops/cycle):

1. POOLED QUERIES.  Queries are binned per TILE of T consecutive
   z-cells and packed densely with a per-query cell TAG, instead of
   per-cell [qcap] slots (38% occupancy at bench scale).  Every
   downstream tensor shrinks by the padding factor (~2.6x).

2. BLOCK-DIAGONAL MXU SCORE.  The candidate score
   v = |c|^2 - 2 e.c for every (query, lane) pair is ONE bf16 matmul
   per 128-lane window: A [QP, 4T] holds each query's (ex, ey, ez, 1)
   in the 4-column block of its tag; B [4T, 128] stacks the T cells'
   candidate rows.  The block structure routes each query against its
   own cell's candidates — scoring rides the MXU at ~100 cycles per
   window instead of ~500 VPU broadcast ops.

3. FOLD-MIN + DEFERRED ONE-HOT FETCH.  Per window the kernel keeps
   only an elementwise running (min, argwindow) pair — no cross-lane
   trees, no per-window attribute fetch.  After the scan, ONE
   cross-lane min identifies each query's winner; winner attributes
   (exact f32 coords, normals, plane offsets, source index) are
   gathered by a one-hot matmul against a pre-transposed per-window
   field table, accumulated over the (rarely more than one) windows
   that contain winners.  Exact d2 is recomputed from the fetched
   coordinates, so the bf16 score only ever selects, never measures.

4. NO LANE SORT AT BUILD.  Candidate lanes are laid out as 27
   `jnp.roll` runs in ascending center-offset order; a run (cap<=128
   lanes) never spans a 128-lane window, so within-run order cannot
   change window membership and the round-3 sort bought nothing but
   bound tightness.  Bounds are instead computed EXACTLY per window
   from candidate distances (valid lower bounds for the best-so-far
   gate), which removes the dominant build cost outright.

Capacity discipline matches the reference's padded-neighbor semantics
(SURVEY.md 2.2, NUM_MAX_NN in knn/kdtree_search_param.h:26): per-cell
cap and per-tile query pool are occupancy percentiles; overflow drops
are COUNTED and returned so callers can surface degradation
(VERDICT r3 item 9) instead of losing fitness silently.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rungrid import (
    EST_NONE, EST_PT2PT, EST_PT2PL, EST_SYM, INVALID_INDEX, RUN_OFFSETS,
    _gn_terms, N_SUMS,
)

BIG = 3.0e18
WINDOW = 128
NPARAMS = 32
LANE_EPS = 2.0e-9   # per-lane score tie-break (see _lane_eps)

# estimator codes beyond rungrid's (values match
# registration.estimation.TransformationEstimationType)
EST_COLORED = 4
EST_GICP = 5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def n_fields(est: int) -> int:
    """f32 winner-fetch fields: cx, cy, cz, idx always, then
    estimator-specific (PT2PL: nx, ny, nz, d_rel; SYM: nx, ny, nz;
    COLORED: nx, ny, nz, intensity, gx, gy, gz; GICP: cov upper 6)."""
    return {EST_NONE: 4, EST_PT2PT: 4, EST_PT2PL: 8, EST_SYM: 8,
            EST_COLORED: 11, EST_GICP: 10}[est]


def n_query_extra(est: int) -> int:
    """Query-side extra channels pooled alongside x, y, z, tag:
    SYM: source normal (3); COLORED: source intensity (1);
    GICP: source covariance upper-triangle (6)."""
    return {EST_NONE: 0, EST_PT2PT: 0, EST_PT2PL: 0, EST_SYM: 3,
            EST_COLORED: 1, EST_GICP: 6}[est]


def query_channels(est: int) -> int:
    return 12 if n_query_extra(est) > 4 else 8


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

class PoolGrid:
    """Pytree; `dims`, `cap`, `kc`, `est`, `tile` static.

    scan    [C*4, KC]          bf16 rows per cell: -2cx, -2cy, -2cz,
                               |c|^2 (cell-centered; empty |c|^2=BIG)
    fieldsT [G*NW*128, T*F]    f32 winner-fetch fields; rows ordered
                               (tile, window, lane); cols (cell, field)
                               so the one-hot fetch matmul contracts
                               over window lanes with no padding waste
    pbounds [G, NW]            min candidate distance per window per
                               TILE (+inf where empty)
    """

    def __init__(self, scan, fieldsT, pbounds, origin, cell_size, dims,
                 cap, kc, est, tile, n_dropped=None):
        self.scan = scan
        self.fieldsT = fieldsT
        self.pbounds = pbounds
        self.origin = origin
        self.cell_size = cell_size
        self.dims = tuple(int(d) for d in dims)
        self.cap = int(cap)
        self.kc = int(kc)
        self.est = int(est)
        self.tile = int(tile)
        self.n_dropped = n_dropped

    @property
    def n_windows(self) -> int:
        return self.kc // WINDOW

    @property
    def n_tiles(self) -> int:
        d = self.dims
        return d[0] * d[1] * d[2] // self.tile


def _poolgrid_flatten(g):
    return ((g.scan, g.fieldsT, g.pbounds, g.origin, g.cell_size,
             g.n_dropped),
            (g.dims, g.cap, g.kc, g.est, g.tile))


def _poolgrid_unflatten(aux, leaves):
    scan, fieldsT, pbounds, origin, cell_size, n_dropped = leaves
    return PoolGrid(scan, fieldsT, pbounds, origin, cell_size,
                    *aux, n_dropped=n_dropped)


jax.tree_util.register_pytree_node(PoolGrid, _poolgrid_flatten,
                                   _poolgrid_unflatten)


# ---------------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------------

def plan_poolgrid(points: np.ndarray, radius: float,
                  margin: float = 0.375,
                  query_points: Optional[np.ndarray] = None,
                  cap_percentile: float = 99.5,
                  max_cells: int = 2_000_000,
                  cap_limit: int = 128,
                  mem_budget_bytes: int = 6 << 30,
                  tile: int = 8,
                  est: int = EST_NONE) -> Optional[dict]:
    """Host sizing. Returns None when a dense grid is unreasonable.

    cell = radius*(1+margin): queries binned at transform T_bin stay
    valid for the 27-neighborhood while every point has moved less
    than radius*margin since binning."""
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(-1)
    if not finite.any() or radius <= 0:
        return None
    lo = pts[finite].min(0).astype(np.float64)
    hi = pts[finite].max(0).astype(np.float64)
    cell = float(radius) * (1.0 + float(margin))
    dims_core = np.maximum(1, np.ceil((hi - lo) / cell + 1e-6).astype(int))
    dims = [int(d) + 2 for d in dims_core]
    # tiles are runs of `tile` consecutive linear (z-major) cells; pad
    # Gz so a tile never crosses a z-column boundary
    dims[2] = _round_up(dims[2], tile)
    dims = tuple(dims)
    n_cells = int(np.prod(dims))
    if n_cells > max_cells:
        return None
    cidx = np.floor((pts[finite] - lo) / cell).astype(np.int64)
    cidx = np.minimum(cidx, dims_core - 1)

    def _counts(ci, dc):
        lin = (ci[:, 0] * dc[1] + ci[:, 1]) * dc[2] + ci[:, 2]
        return np.bincount(lin, minlength=int(np.prod(dc)))

    counts = _counts(cidx, dims_core)
    occupied = counts[counts > 0]
    cap = int(np.percentile(occupied, cap_percentile)) if occupied.size \
        else 8
    if cap > cap_limit:
        return None
    cap = max(8, _round_up(cap, 8))
    kc = _round_up(27 * cap, WINDOW)
    # query pool capacity per tile (tile covers `tile` z-cells + the
    # guard ring maps in-bounds queries only)
    qp = 16 * tile
    if query_points is not None:
        qpn = np.asarray(query_points)
        qf = np.isfinite(qpn).all(-1)
        if qf.any():
            qc = np.floor((qpn[qf] - lo) / cell).astype(np.int64) + 1
            inb = (qc >= 0).all(-1) & (qc < dims).all(-1)
            if inb.any():
                lin = (qc[inb, 0] * dims[1] + qc[inb, 1]) * dims[2] \
                    + qc[inb, 2]
                tcnt = np.bincount(lin // tile,
                                   minlength=n_cells // tile)
                tocc = tcnt[tcnt > 0]
                if tocc.size:
                    qp = int(np.percentile(tocc, cap_percentile))
        qp = _round_up(int(qp * 1.2) + 8, 8)
    qp = max(qp, 8)
    F = n_fields(est)
    grid_bytes = n_cells * kc * (4 * 2 + F * 4) + \
        (n_cells // tile) * (kc // WINDOW) * 4
    if grid_bytes > mem_budget_bytes:
        return None
    origin = (lo - cell).astype(np.float32)
    return {
        "dims": dims, "origin": origin, "cap": cap, "kc": int(kc),
        "qp": int(qp), "tile": int(tile),
        "cell_size": np.float32(cell),
        "rebin_margin": np.float32(float(radius) * float(margin)),
    }


# ---------------------------------------------------------------------------
# binning (shared with rungrid's scheme: sort by cell|morton key, rank
# within cell, scatter to slots)
# ---------------------------------------------------------------------------

def _cell_key(points, origin, cell_size, dims, n_bins_div, mask=None):
    """(bin | 6-bit Morton) key; bin = linear_cell // n_bins_div.
    Out-of-bounds / masked -> dropped sentinel."""
    C = dims[0] * dims[1] * dims[2]
    rel = (points - origin) / cell_size
    cell = jnp.floor(rel).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
    if mask is not None:
        inb = inb & mask
    lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    sub = jnp.clip((rel - cell) * 4.0, 0.0, 3.9999).astype(jnp.int32)
    m = ((sub[:, 0] & 2) << 4) | ((sub[:, 1] & 2) << 3) \
        | ((sub[:, 2] & 2) << 2) \
        | ((sub[:, 0] & 1) << 2) | ((sub[:, 1] & 1) << 1) \
        | (sub[:, 2] & 1)
    nb = C // n_bins_div
    key = jnp.where(inb, (lin // n_bins_div) * 64 + m, nb * 64)
    return key, lin, inb


def _bin_to_slots(key, n_bins: int, cap: int, channels, fill):
    """Sort by key, rank within bin (key//64), scatter channels to
    [n_bins, cap] slots. Returns (outs, index [n_bins, cap] int32,
    n_dropped)."""
    N = key.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    ops = jax.lax.sort((key, pos) + tuple(channels), num_keys=1,
                       is_stable=True)
    keys_s, order = ops[0], ops[1]
    ch_s = ops[2:]
    bin_s = keys_s // 64
    boundary = jnp.concatenate([
        jnp.ones(1, bool), bin_s[1:] != bin_s[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, pos, 0))
    rank = pos - seg_start
    valid = bin_s < n_bins
    ok = valid & (rank < cap)
    n_dropped = jnp.sum(valid & (rank >= cap)).astype(jnp.int32)
    slot = jnp.where(ok, bin_s * cap + rank, n_bins * cap)
    outs = []
    for ch, f in zip(ch_s, fill):
        outs.append(jnp.full(n_bins * cap + 1, f, ch.dtype)
                    .at[slot].set(ch, mode="drop")[:-1]
                    .reshape(n_bins, cap))
    index = jnp.full(n_bins * cap + 1, INVALID_INDEX, jnp.int32) \
        .at[slot].set(order, mode="drop")[:-1].reshape(n_bins, cap)
    return outs, index, n_dropped


def cell_centers(dims, origin, cell_size, C: int):
    Gx, Gy, Gz = dims
    lin = jnp.arange(C, dtype=jnp.int32)
    ccz = (lin % Gz).astype(jnp.float32)
    ccy = ((lin // Gz) % Gy).astype(jnp.float32)
    ccx = (lin // (Gz * Gy)).astype(jnp.float32)
    c = jnp.stack([ccx, ccy, ccz], -1) + 0.5
    return origin + c * cell_size


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

def _est_field_channels(est: int, points, attrs, cen):
    """Per-point estimator field channels (beyond coords + idx).
    PT2PL: attrs [N,4] = (normal, d = n.p); d re-centered per cell so
    the kernel residual n.e - d_rel equals world-frame n.q - d.
    COLORED: attrs [N,7] = (normal, intensity, color gradient).
    GICP: attrs [N,6] = covariance upper triangle."""
    if est == EST_PT2PL:
        n0, n1, n2, d = (attrs[:, i] for i in range(4))
        d_rel = d - (n0 * cen[:, 0] + n1 * cen[:, 1] + n2 * cen[:, 2])
        return [n0, n1, n2, d_rel]
    if est == EST_SYM:
        return [attrs[:, 0], attrs[:, 1], attrs[:, 2],
                jnp.zeros(points.shape[0], jnp.float32)]
    if est == EST_COLORED:
        return [attrs[:, i] for i in range(7)]
    if est == EST_GICP:
        return [attrs[:, i] for i in range(6)]
    return []


@partial(jax.jit, static_argnames=("dims", "cap", "kc", "est", "tile"))
def build_poolgrid_arrays(points, attrs, origin, cell_size,
                          dims: Tuple[int, int, int], cap: int,
                          kc: int, est: int, tile: int, mask=None):
    """Bin targets once, assemble the 27-run neighborhood with
    `jnp.roll` (no gathers, no lane sort), fold per-run center offsets
    into the coordinates, and lay out (a) bf16 scan rows for the MXU
    score, (b) f32 per-window transposed fetch fields, (c) exact
    per-window distance lower bounds.

    reference: the grid replaces kdtree_flann.inl's per-query
    traversal; padded-slot capacity semantics follow NUM_MAX_NN
    (kdtree_search_param.h:26) with dropped counts surfaced."""
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    G = C // tile
    NW = kc // WINDOW
    F = n_fields(est)
    key, lin, _ = _cell_key(points, origin, cell_size, dims, 1, mask)
    linc = jnp.clip(lin, 0, C - 1)
    cen_all = cell_centers(dims, origin, cell_size, C)
    cen = cen_all[linc]
    pc = points - cen
    fields = _est_field_channels(est, points, attrs, cen)
    channels = [pc[:, 0], pc[:, 1], pc[:, 2]] + fields
    fill = [jnp.float32(np.inf)] * 3 + [jnp.float32(0.0)] * len(fields)
    binned, index, n_dropped = _bin_to_slots(key, C, cap, channels,
                                             fill)
    idx_f = index.astype(jnp.float32)  # exact for N < 2^24; empty -1

    def rolled(arr2d):
        a = arr2d.reshape(Gx, Gy, Gz, cap)
        parts = []
        for (dx, dy, dz) in RUN_OFFSETS:
            parts.append(jnp.roll(a, (-dx, -dy, -dz), (0, 1, 2))
                         .reshape(C, cap))
        return jnp.concatenate(parts, -1)

    cx, cy, cz = (rolled(binned[i]) for i in range(3))
    fch = [rolled(binned[3 + i]) for i in range(len(fields))]
    idx_r = rolled(idx_f)

    offs = np.asarray(RUN_OFFSETS, np.float32)
    lane_off = jnp.repeat(jnp.asarray(offs), cap, axis=0)  # [27*cap,3]
    cx = cx + lane_off[None, :, 0] * cell_size
    cy = cy + lane_off[None, :, 1] * cell_size
    cz = cz + lane_off[None, :, 2] * cell_size
    if est == EST_PT2PL:
        # d was re-centered to the SOURCE cell; shift to the consumer
        # row's center: d_row = d_src - n.(c_row - c_src)
        #             = d_src + n.(lane_off*cell)  [c_src = c_row+off]
        fch[3] = fch[3] + cell_size * (
            fch[0] * lane_off[None, :, 0]
            + fch[1] * lane_off[None, :, 1]
            + fch[2] * lane_off[None, :, 2])

    empty = ~jnp.isfinite(cx)
    zero = jnp.zeros_like(cx)
    cx, cy, cz = (jnp.where(empty, zero, v) for v in (cx, cy, cz))
    cn = jnp.where(empty, jnp.float32(BIG),
                   cx * cx + cy * cy + cz * cz)
    dist = jnp.where(empty, jnp.float32(np.inf), jnp.sqrt(cn))
    idx_r = jnp.where(empty, jnp.float32(INVALID_INDEX), idx_r)

    pad = kc - 27 * cap
    if pad:
        def padk(a, v):
            return jnp.pad(a, ((0, 0), (0, pad)), constant_values=v)
        cx, cy, cz = padk(cx, 0), padk(cy, 0), padk(cz, 0)
        cn = padk(cn, BIG)
        dist = padk(dist, np.inf)
        idx_r = padk(idx_r, float(INVALID_INDEX))
        fch = [padk(a, 0) for a in fch]

    # (a) scan rows, bf16, interleaved per cell
    scan = jnp.stack([-2.0 * cx, -2.0 * cy, -2.0 * cz, cn], 1) \
        .astype(jnp.bfloat16).reshape(C * 4, kc)

    # (b) fetch fields, f32, transposed per (tile, window):
    # rows (tile, window, lane), cols (cell-in-tile, field)
    f_all = jnp.stack([cx, cy, cz, idx_r] + fch
                      + [jnp.zeros_like(cx)] * (F - 4 - len(fch)), 1)
    fT = f_all.reshape(G, tile, F, NW, WINDOW) \
        .transpose(0, 3, 4, 1, 2).reshape(G * NW * WINDOW, tile * F)

    # (c) exact per-window bounds, pooled per tile
    wmin = jnp.min(dist.reshape(C, NW, WINDOW), -1)
    pbounds = jnp.min(wmin.reshape(G, tile, NW), 1)
    return scan, fT, pbounds, n_dropped


def make_poolgrid(points, attrs, origin, cell_size, dims, cap, kc,
                  est: int = EST_NONE, tile: int = 8,
                  mask=None) -> PoolGrid:
    scan, fT, pbounds, n_dropped = build_poolgrid_arrays(
        points, attrs, jnp.asarray(origin, jnp.float32),
        jnp.asarray(cell_size, jnp.float32), tuple(dims), int(cap),
        int(kc), int(est), int(tile), mask=mask)
    return PoolGrid(scan, fT, pbounds,
                    jnp.asarray(origin, jnp.float32),
                    jnp.asarray(cell_size, jnp.float32), tuple(dims),
                    int(cap), int(kc), int(est), int(tile),
                    n_dropped=n_dropped)


# ---------------------------------------------------------------------------
# query-side pooling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "qp", "tile", "n_extra"))
def bin_queries_pool(points, bin_positions, origin, cell_size,
                     dims: Tuple[int, int, int], qp: int, tile: int,
                     extra=None, n_extra: int = 0, mask=None):
    """Pool queries per tile of `tile` consecutive z-cells.

    Returns (qpool [G, CH, QP] f32 rows (x, y, z, tagf, extra..., 0),
    qidx [G, QP] int32 (-1 empty), n_dropped). CH = 8, or 12 when
    more than 4 extra channels ride along (GICP covariances). Queries
    keep ORIGINAL coords; binned by `bin_positions` (position under
    the binning transform). tagf = cell-within-tile, -1 empty."""
    C = dims[0] * dims[1] * dims[2]
    G = C // tile
    key, lin, inb = _cell_key(bin_positions, origin, cell_size, dims,
                              tile, mask)
    # rank within TILE but keep tag = cell-within-tile per query
    tagf = jnp.where(inb, (lin % tile).astype(jnp.float32), -1.0)
    channels = [points[:, 0], points[:, 1], points[:, 2], tagf]
    for i in range(n_extra):
        channels.append(extra[:, i])
    fill = [jnp.float32(0.0)] * 3 + [jnp.float32(-1.0)] + \
        [jnp.float32(0.0)] * n_extra
    binned, index, n_dropped = _bin_to_slots(key, G, qp, channels,
                                             fill)
    CH = 12 if n_extra > 4 else 8
    rows = binned + [jnp.zeros((G, qp), jnp.float32)] * (
        CH - len(binned))
    qpool = jnp.stack(rows[:CH], 1)
    return qpool, index, n_dropped


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def make_params(T, r2, grid: PoolGrid, extra0=0.0, extra1=0.0):
    """[NPARAMS] f32: R row-major (0-8), t (9-11), r^2 (12), origin
    (13-15), cell_size (16), estimator extras (17-18: Colored ICP's
    sqrt lambda_geometric / sqrt lambda_photometric), spare."""
    R = T[:3, :3].reshape(-1)
    t = T[:3, 3]
    head = jnp.concatenate([
        R, t, jnp.asarray(r2, jnp.float32).reshape(1),
        jnp.asarray(grid.origin, jnp.float32).reshape(3),
        jnp.asarray(grid.cell_size, jnp.float32).reshape(1),
        jnp.asarray(extra0, jnp.float32).reshape(1),
        jnp.asarray(extra1, jnp.float32).reshape(1)])
    return jnp.concatenate([
        head, jnp.zeros(NPARAMS - head.shape[0], jnp.float32)])


def _gn_terms_ext(est: int, f, tx, ty, tz, dx, dy, dz, q_extra,
                  R9, slg, slp, ok, d2c):
    """GN sum terms for the Colored ICP / GICP estimators.

    f: fetched field columns beyond (coords, idx); d* = q - p (world
    residual, exact since both are in the same cell frame); q_extra:
    pooled query extras (source intensity / covariance); R9: rotation
    scalars for rotating the source covariance.

    reference: compute_jacobian_and_residual_functor
    (colored_icp.cu:150-216) and the Mahalanobis plane-to-plane step
    (generalized_icp.cu:64-106) — the sqrtm whitening is unnecessary
    for the normal equations since (WJ)^T(WJ) = J^T M^-1 J."""
    w = ok.astype(jnp.float32)
    if est == EST_COLORED:
        nx, ny, nz = f[0], f[1], f[2]
        it = f[3]
        gx, gy, gz = f[4], f[5], f[6]
        i_s = q_extra[0]
        dn = nx * dx + ny * dy + nz * dz
        r_g = slg * dn
        jg = (slg * (ty * nz - tz * ny), slg * (tz * nx - tx * nz),
              slg * (tx * ny - ty * nx), slg * nx, slg * ny, slg * nz)
        gn = gx * nx + gy * ny + gz * nz
        ex_, ey_, ez_ = (-(gx - gn * nx), -(gy - gn * ny),
                         -(gz - gn * nz))    # ditM
        vpx = dx - dn * nx
        vpy = dy - dn * ny
        vpz = dz - dn * nz
        is0 = gx * vpx + gy * vpy + gz * vpz + it
        r_p = slp * (i_s - is0)
        jp = (slp * (ty * ez_ - tz * ey_), slp * (tz * ex_ - tx * ez_),
              slp * (tx * ey_ - ty * ex_), slp * ex_, slp * ey_,
              slp * ez_)
        terms = []
        for i in range(6):
            for k in range(i, 6):
                terms.append(w * (jg[i] * jg[k] + jp[i] * jp[k]))
        for i in range(6):
            terms.append(w * (jg[i] * r_g + jp[i] * r_p))
        terms.append(w)
        terms.append(d2c)
        return terms
    if est == EST_GICP:
        ct = f[:6]                # target cov upper triangle
        cs = q_extra[:6]          # source cov upper triangle
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = R9
        a, b, c, d, e, g = cs
        # B = R Cs (rows of R times symmetric Cs)
        B00 = R00 * a + R01 * b + R02 * c
        B01 = R00 * b + R01 * d + R02 * e
        B02 = R00 * c + R01 * e + R02 * g
        B10 = R10 * a + R11 * b + R12 * c
        B11 = R10 * b + R11 * d + R12 * e
        B12 = R10 * c + R11 * e + R12 * g
        B20 = R20 * a + R21 * b + R22 * c
        B21 = R20 * b + R21 * d + R22 * e
        B22 = R20 * c + R21 * e + R22 * g
        # M = Ct + B R^T (symmetric)
        m00 = ct[0] + B00 * R00 + B01 * R01 + B02 * R02
        m01 = ct[1] + B00 * R10 + B01 * R11 + B02 * R12
        m02 = ct[2] + B00 * R20 + B01 * R21 + B02 * R22
        m11 = ct[3] + B10 * R10 + B11 * R11 + B12 * R12
        m12 = ct[4] + B10 * R20 + B11 * R21 + B12 * R22
        m22 = ct[5] + B20 * R20 + B21 * R21 + B22 * R22
        # A = M^-1 (adjugate / det; M is PSD + epsilon-regularized)
        a00 = m11 * m22 - m12 * m12
        a01 = m02 * m12 - m01 * m22
        a02 = m01 * m12 - m02 * m11
        a11 = m00 * m22 - m02 * m02
        a12 = m01 * m02 - m00 * m12
        a22 = m00 * m11 - m01 * m01
        det = m00 * a00 + m01 * a01 + m02 * a02
        inv = 1.0 / jnp.maximum(det, 1e-30)
        a00, a01, a02 = a00 * inv, a01 * inv, a02 * inv
        a11, a12, a22 = a11 * inv, a12 * inv, a22 * inv
        # J0 columns: u0=(0,-z,y) u1=(z,0,-x) u2=(-y,x,0) u3..5 = e_i
        ucols = ((jnp.zeros_like(tx), -tz, ty),
                 (tz, jnp.zeros_like(tx), -tx),
                 (-ty, tx, jnp.zeros_like(tx)),
                 (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))

        def Au(u):
            ux, uy, uz = u
            return (a00 * ux + a01 * uy + a02 * uz,
                    a01 * ux + a11 * uy + a12 * uz,
                    a02 * ux + a12 * uy + a22 * uz)

        Aus = [Au(u) for u in ucols]
        terms = []
        for i in range(6):
            for k in range(i, 6):
                ux, uy, uz = ucols[i]
                vx, vy, vz = Aus[k]
                terms.append(w * (ux * vx + uy * vy + uz * vz))
        for i in range(6):
            vx, vy, vz = Aus[i]
            terms.append(w * (dx * vx + dy * vy + dz * vz))
        terms.append(w)
        terms.append(d2c)
        return terms
    raise ValueError(est)


def _lane_eps(w: int):
    """Per-lane score perturbation making window-local ties distinct
    (one-hot fetch sums exactly one lane per query)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
    return (w * WINDOW + lanes).astype(jnp.float32) * LANE_EPS


def _scan_blocks(NW: int, prefix: int, n_tail: int):
    """Window block structure: `prefix` unconditional windows, then
    the tail split into up to n_tail gated blocks."""
    blocks = []
    lo = prefix
    if NW > lo:
        step = _round_up(-(-(NW - lo) // n_tail), 1)
        while lo < NW:
            hi = min(lo + step, NW)
            blocks.append((lo, hi))
            lo = hi
    return blocks


def _make_pool_kernel(est: int, T: int, QP: int, KC: int, dims,
                      corres: bool, F: int, prefix: int = 2,
                      n_tail: int = 3):
    NW = KC // WINDOW
    Gz = dims[2]
    n_sums = N_SUMS

    def kern(p_ref, q_ref, c_ref, ft_ref, b_ref, *out_and_scratch):
        n_out = 2 if corres else 1
        outs = out_and_scratch[:n_out]
        acc = out_and_scratch[n_out]
        wwin = out_and_scratch[n_out + 1]
        fa = out_and_scratch[n_out + 2]
        i = pl.program_id(0)
        R00, R01, R02 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
        R10, R11, R12 = p_ref[0, 3], p_ref[0, 4], p_ref[0, 5]
        R20, R21, R22 = p_ref[0, 6], p_ref[0, 7], p_ref[0, 8]
        t0, t1, t2 = p_ref[0, 9], p_ref[0, 10], p_ref[0, 11]
        r2 = p_ref[0, 12]
        ox, oy, oz = p_ref[0, 13], p_ref[0, 14], p_ref[0, 15]
        cell = p_ref[0, 16]

        # tile covers linear cells [i*T, (i+1)*T): constant x, y and
        # consecutive z (Gz % T == 0 by plan)
        lin0 = i * T
        zb = (lin0 % Gz).astype(jnp.float32)
        yb = ((lin0 // Gz) % dims[1]).astype(jnp.float32)
        xb = (lin0 // (Gz * dims[1])).astype(jnp.float32)
        ccx = ox + (xb + 0.5) * cell
        ccy = oy + (yb + 0.5) * cell

        # queries: [8, QP] -> transpose to [QP, 1] columns
        qt = q_ref[:, :].T                    # [QP, 8]
        qx = qt[:, 0:1]
        qy = qt[:, 1:2]
        qz = qt[:, 2:3]
        tag = qt[:, 3:4]
        valid = tag >= 0.0
        tx = R00 * qx + R01 * qy + R02 * qz + t0
        ty = R10 * qx + R11 * qy + R12 * qz + t1
        tz = R20 * qx + R21 * qy + R22 * qz + t2
        ccz = oz + (zb + jnp.maximum(tag, 0.0) + 0.5) * cell
        ex = tx - ccx
        ey = ty - ccy
        ez = tz - ccz
        qn = ex * ex + ey * ey + ez * ez
        dqc = jnp.sqrt(qn)

        # block-diagonal query matrix A [QP, 4T]
        colid = jax.lax.broadcasted_iota(jnp.int32, (QP, 4 * T), 1)
        tcol = (colid >> 2).astype(jnp.float32)
        j = colid & 3
        val = jnp.where(j == 0, ex, jnp.where(j == 1, ey,
                        jnp.where(j == 2, ez, 1.0)))
        A = jnp.where(tag == tcol, val, 0.0).astype(jnp.bfloat16)

        def score(w):
            B = c_ref[:, w * WINDOW:(w + 1) * WINDOW]
            v = jax.lax.dot_general(
                A, B, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return v + _lane_eps(w)

        def fold(w):
            v = score(w)
            if w == 0:
                acc[:] = v
                wwin[:] = jnp.zeros((QP, WINDOW), jnp.float32)
            else:
                upd = v < acc[:]
                acc[:] = jnp.where(upd, v, acc[:])
                wwin[:] = jnp.where(upd, float(w), wwin[:])

        for w in range(min(prefix, NW)):
            fold(w)
        blocks = _scan_blocks(NW, prefix, n_tail)
        if blocks:
            m0 = jnp.min(acc[:], -1, keepdims=True)
            bd0 = jnp.sqrt(jnp.maximum(jnp.minimum(m0 + qn, r2), 0.0))
            reach = jnp.where(valid, bd0 + dqc, -1.0)
        for (blo, bhi) in blocks:
            bmin = b_ref[0, blo]
            for w in range(blo + 1, bhi):
                bmin = jnp.minimum(bmin, b_ref[0, w])
            need = jnp.any(reach >= bmin)

            @pl.when(need)
            def _(blo=blo, bhi=bhi):
                for w in range(blo, bhi):
                    fold(w)

        m = jnp.min(acc[:], -1, keepdims=True)

        # deferred winner fetch: one-hot (recomputed score == m)
        # against the pre-transposed field table, accumulated over the
        # windows that hold winners (fa scratch persists across the
        # pl.when blocks; winner is one-hot by the lane-eps tie-break).
        # Output columns are (cell, field); the query's own cell is
        # selected by tag afterwards, so the one-hot needs no
        # block-diagonal expansion.
        def fetch_window(w):
            v = score(w)
            eq = ((wwin[:] == float(w)) & (v <= m)).astype(jnp.float32)
            ftw = ft_ref[pl.ds(w * WINDOW, WINDOW), :]
            fa[:] = fa[:] + jax.lax.dot_general(
                eq, ftw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        fa[:] = jnp.zeros((QP, T * F), jnp.float32)
        for w in range(min(prefix, NW)):
            fetch_window(w)
        for (blo, bhi) in blocks:
            winb = (wwin[:] >= float(blo)) & (wwin[:] < float(bhi))
            needf = jnp.any(winb & (acc[:] <= m))

            @pl.when(needf)
            def _(blo=blo, bhi=bhi):
                for w in range(blo, bhi):
                    fetch_window(w)

        # tag-select the query's own cell block of fields
        fcol = jax.lax.broadcasted_iota(jnp.int32, (QP, T * F), 1)
        tmask = ((fcol // F).astype(jnp.float32) == tag)
        F2m = jnp.where(tmask, fa[:], 0.0)
        FA = F2m[:, 0:F]
        for t in range(1, T):
            FA = FA + F2m[:, t * F:(t + 1) * F]
        fcx = FA[:, 0:1]
        fcy = FA[:, 1:2]
        fcz = FA[:, 2:3]
        fidx = FA[:, 3:4]
        d2 = (ex - fcx) ** 2 + (ey - fcy) ** 2 + (ez - fcz) ** 2
        ok = valid & (fidx >= 0.0) & (d2 <= r2)

        if corres:
            d2o = jnp.where(ok, d2, jnp.float32(np.inf))
            idxo = jnp.where(ok, fidx, jnp.float32(INVALID_INDEX))
            r = i % 8
            outs[0][pl.ds(r, 1), :] = d2o[:, 0][None, :]
            outs[1][pl.ds(r, 1), :] = idxo[:, 0][None, :]
            return

        d2c = jnp.where(ok, d2, 0.0)
        okf = ok
        if est == EST_SYM:
            s0 = qt[:, 4:5]
            s1 = qt[:, 5:6]
            s2 = qt[:, 6:7]
            src_n = (R00 * s0 + R01 * s1 + R02 * s2,
                     R10 * s0 + R11 * s1 + R12 * s2,
                     R20 * s0 + R21 * s1 + R22 * s2)
        else:
            src_n = None
        fetched = [FA[:, 4 + k:5 + k] for k in range(F - 4)]
        if est in (EST_COLORED, EST_GICP):
            qe = tuple(qt[:, 4 + k:5 + k]
                       for k in range(n_query_extra(est)))
            terms = _gn_terms_ext(
                est, fetched, tx, ty, tz, ex - fcx, ey - fcy,
                ez - fcz, qe,
                (R00, R01, R02, R10, R11, R12, R20, R21, R22),
                p_ref[0, 17], p_ref[0, 18], okf, d2c)
        else:
            if est == EST_PT2PT:
                fetched = [fcx, fcy, fcz]
            elif est == EST_SYM:
                fetched = [fcx, fcy, fcz] + fetched[:3]
            terms = _gn_terms(est, fetched, tx, ty, tz, ex, ey, ez,
                              ccx, ccy, ccz, src_n, okf, d2c)
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, n_sums), 1)
        row = jnp.zeros((1, n_sums), jnp.float32)
        for s, term in enumerate(terms):
            row = row + jnp.where(slot == s, jnp.sum(term), 0.0)
        outs[0][pl.ds(i, 1), :] = row

    return kern


@partial(jax.jit, static_argnames=("est", "corres", "use_pallas"))
def fused_pool_query(grid: PoolGrid, qpool, params, est: int,
                     corres: bool, use_pallas: Optional[bool] = None):
    """One fused correspondence (+GN reduction) pass over the pooled
    grid. Returns (d2 [G, QP], idx [G, QP] f32) when `corres`, else a
    [G, N_SUMS] array of per-tile partial sums."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _pool_query_xla(grid, qpool, params, est, corres)
    interpret = use_pallas == "interpret"
    G, CH, QP = qpool.shape
    KC = grid.kc
    T = grid.tile
    NW = grid.n_windows
    F = n_fields(est)
    kern = _make_pool_kernel(est, T, QP, KC, grid.dims, corres, F)
    scratch = [pltpu.VMEM((QP, WINDOW), jnp.float32),
               pltpu.VMEM((QP, WINDOW), jnp.float32),
               pltpu.VMEM((QP, T * F), jnp.float32)]
    if corres:
        gb = min(8, G)
        out_shape = [jax.ShapeDtypeStruct((G, QP), jnp.float32)] * 2
        out_specs = [pl.BlockSpec((gb, QP), lambda i: (i // 8, 0),
                                  memory_space=pltpu.VMEM)] * 2
    else:
        out_shape = [jax.ShapeDtypeStruct((G, N_SUMS), jnp.float32)]
        out_specs = [pl.BlockSpec((G, N_SUMS), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, NPARAMS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, CH, QP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * T, KC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW * WINDOW, T * F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, NW), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(params.reshape(1, NPARAMS), qpool, grid.scan, grid.fieldsT,
      grid.pbounds.reshape(G, 1, NW))
    if corres:
        return outs[0], outs[1]
    return outs[0]


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU tests / non-TPU fallback)
# ---------------------------------------------------------------------------

def _pool_query_xla(grid: PoolGrid, qpool, params, est: int,
                    corres: bool):
    """Same semantics as the kernel: bf16 block-diag score + lane-eps
    tie-break + exact d2 from fetched f32 fields."""
    G, CH, QP = qpool.shape
    KC = grid.kc
    T = grid.tile
    NW = grid.n_windows
    F = n_fields(est)
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    r2 = params[12]
    origin = params[13:16]
    cell = params[16]
    Gx, Gy, Gz = grid.dims

    scan = grid.scan.reshape(G, T, 4, KC)
    fT = grid.fieldsT.reshape(G, NW, WINDOW, T, F)
    eps = (jnp.arange(KC, dtype=jnp.float32) * LANE_EPS)[None, None, :]

    def body(args):
        q, sc, ft, gi = args
        qt = q.T                                  # [QP, 8]
        tag = qt[:, 3]
        valid = tag >= 0.0
        tgi = jnp.clip(tag, 0.0, float(T - 1)).astype(jnp.int32)
        qw = qt[:, 0:3] @ R.T + t
        lin0 = gi * T
        zb = (lin0 % Gz).astype(jnp.float32)
        yb = ((lin0 // Gz) % Gy).astype(jnp.float32)
        xb = (lin0 // (Gz * Gy)).astype(jnp.float32)
        cc = jnp.stack([
            origin[0] + (xb + 0.5) * cell
            + jnp.zeros_like(tag),
            origin[1] + (yb + 0.5) * cell + jnp.zeros_like(tag),
            origin[2] + (zb + jnp.maximum(tag, 0.0) + 0.5) * cell], -1)
        e = qw - cc                               # [QP, 3]
        qn = jnp.sum(e * e, -1)
        crow = sc[tgi]                            # [QP, 4, KC] bf16
        ebf = jnp.concatenate(
            [e, jnp.ones((QP, 1), jnp.float32)],
            -1).astype(jnp.bfloat16)              # [QP, 4]
        v = jnp.einsum("qc,qck->qk", ebf, crow,
                       preferred_element_type=jnp.float32)
        v = v + eps[0]
        lane = jnp.argmin(v, -1)
        w = (lane // WINDOW).astype(jnp.int32)
        l = (lane % WINDOW).astype(jnp.int32)
        fsel = ft[w, l, tgi]                      # [QP, F]
        fc = fsel[:, 0:3]
        fidx = fsel[:, 3]
        d2 = jnp.sum((e - fc) ** 2, -1)
        ok = valid & (fidx >= 0.0) & (d2 <= r2)
        if corres:
            return (jnp.where(ok, d2, jnp.inf),
                    jnp.where(ok, fidx, float(INVALID_INDEX)))
        d2c = jnp.where(ok, d2, 0.0)
        tx, ty, tz = qw[:, 0], qw[:, 1], qw[:, 2]
        exq, eyq, ezq = e[:, 0], e[:, 1], e[:, 2]
        if est == EST_SYM:
            sn = qt[:, 4:7] @ R.T
            src_n = (sn[:, 0], sn[:, 1], sn[:, 2])
        else:
            src_n = None
        if est in (EST_COLORED, EST_GICP):
            fetched = [fsel[:, 4 + k] for k in range(F - 4)]
            qe = tuple(qt[:, 4 + k] for k in range(n_query_extra(est)))
            terms = _gn_terms_ext(
                est, fetched, tx, ty, tz,
                exq - fc[:, 0], eyq - fc[:, 1], ezq - fc[:, 2], qe,
                tuple(R.reshape(-1)), params[17], params[18], ok, d2c)
        else:
            if est == EST_PT2PT:
                fetched = [fc[:, 0], fc[:, 1], fc[:, 2]]
            elif est == EST_SYM:
                fetched = [fc[:, 0], fc[:, 1], fc[:, 2],
                           fsel[:, 4], fsel[:, 5], fsel[:, 6]]
            else:
                fetched = [fsel[:, 4 + k] for k in range(F - 4)]
            terms = _gn_terms(est, fetched, tx, ty, tz, exq, eyq, ezq,
                              cc[:, 0], cc[:, 1], cc[:, 2], src_n, ok,
                              d2c)
        row = jnp.zeros(N_SUMS, jnp.float32)
        for s, term in enumerate(terms):
            row = row.at[s].set(jnp.sum(term))
        return row

    gidx = jnp.arange(G, dtype=jnp.int32)
    out = jax.lax.map(body, (qpool, scan, fT, gidx))
    if corres:
        return out
    return out
