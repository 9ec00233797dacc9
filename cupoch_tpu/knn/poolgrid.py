"""Pooled-query MXU correspondence grid — the ICP hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl); rounds 1-3 replaced it with dense
roll grids and the sorted-lane `rungrid`.  Round-4 profiling on a real
v5e showed the previous pooled kernel at ~66 ms per ICP iteration for
1M points — 4% of HBM peak — bound by (a) a 1.9 GB per-pass winner-
fetch field table DMAed to VMEM whether needed or not, (b) 4096 grid
steps of fixed per-step cost, and (c) a 3-op VPU (min, argwindow)
fold.  This revision restructures the pass around the measured v5e
balance (197 Tbf16 MXU, ~0.8 TB/s HBM):

1. POOLED QUERIES, LANES-MAJOR.  Queries are binned per SUPERTILE
   of T=32 consecutive z-major cells and packed densely in the LANE
   dimension with a per-query cell TAG; candidates live in sublanes.
   Every per-query quantity is a native [1, QP] lane vector (no
   in-kernel transposes) and the per-window score is an MXU-native
   [128, 4T=128] @ [4T, QP] dot against a block-diagonal query
   matrix. Supertiles may wrap (x, y) columns: each cell's candidate
   lanes are self-contained and query rows carry their own bin-time
   cell centers.

2. PACKED SLOT-IN-KEY FOLD.  Per 128-lane window the kernel folds
   key = (bitcast_f32(score + OFF) & ~SLOT_MASK) | slot into a
   running int32 minimum.  OFF > max |e|^2 keeps score + OFF
   positive, so the f32 bit pattern orders like the value; the low 12
   bits carry the slot id, quantizing scores to ~2^-12 relative (far
   below the bf16 input noise) and breaking exact ties by slot.  One
   cross-sublane int min then yields the winner's slot directly — no
   argwindow scratch, no one-hot fetch pass, and the kernel is
   ESTIMATOR-INDEPENDENT (one compile serves all five estimators +
   plain correspondence).

3. UNGATED BY MEASUREMENT.  On v5e @1M pts every pl.when window gate
   cost a vector->scalar sync (~10 ms/pass total) while supertile-
   pooled reach bounds almost never close on dense query pools (some
   pooled query always sits near every corner run), so the kernel
   streams all windows unconditionally.

4. XLA EPILOGUE ON ONE COMPACT TABLE.  slot -> (neighbor run, rank)
   -> ONE row gather from the bin-ordered [C_pad*cap, F+1] field
   table resolves exact f32 world-frame fields AND the original
   target index; residuals and the Gauss-Newton reduction are plain
   fused XLA.  The 27x-duplicated per-window fetch table is gone:
   per-pass traffic drops from 2.35 GB to the 0.47 GB score table
   plus ~60 MB of gathers (measured 66 -> ~20 ms per ICP iteration).

5. NO LANE SORT AT BUILD (kept).  Candidate lanes are 27 `jnp.roll`
   runs in ascending center-offset order.

Capacity discipline matches the reference's padded-neighbor semantics
(SURVEY.md 2.2, NUM_MAX_NN in knn/kdtree_search_param.h:26): per-cell
cap and per-supertile query pool are occupancy percentiles; overflow
drops are COUNTED and returned so callers can surface degradation
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
    N_SUMS,
)

BIG = 3.0e18
WINDOW = 128
NPARAMS = 32
SLOT_BITS = 12            # low mantissa bits of the packed key
SLOT_MASK = (1 << SLOT_BITS) - 1

# estimator codes beyond rungrid's (values match
# registration.estimation.TransformationEstimationType)
EST_COLORED = 4
EST_GICP = 5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def n_fields(est: int) -> int:
    """World-frame per-point field-table width: x, y, z always, then
    estimator channels (PT2PL: n, d; SYM: n; COLORED: n, intensity,
    gradient; GICP: cov upper 6)."""
    return {EST_NONE: 3, EST_PT2PT: 3, EST_PT2PL: 7, EST_SYM: 6,
            EST_COLORED: 10, EST_GICP: 9}[est]


def n_query_extra(est: int) -> int:
    """Query-side extra channels pooled alongside x, y, z, tag, cc:
    SYM: source normal (3); COLORED: source intensity (1);
    GICP: source covariance upper-triangle (6)."""
    return {EST_NONE: 0, EST_PT2PT: 0, EST_PT2PL: 0, EST_SYM: 3,
            EST_COLORED: 1, EST_GICP: 6}[est]


def query_channels(est: int) -> int:
    """Pooled row channels: x, y, z, tag, ccx, ccy, ccz, extras...,
    padded to a multiple of 4 with a floor of 8 (the kernel always
    reads the first 8)."""
    used = 7 + n_query_extra(est)
    return max(8, _round_up(used, 4))


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

class PoolGrid:
    """Pytree; `dims`, `cap`, `kc`, `est`, `tile` static.

    scan      [G*KC, 4T]       bf16 lanes-major score table: row
                               (supertile, candidate slot), col (cell-
                               in-tile, field) with fields -2cx, -2cy,
                               -2cz, |c|^2 (cell-centered; empty
                               |c|^2=BIG). Drives the GN iterations.
                               Supertiles group ACTIVE cells when
                               `cell_map` is set (surface clouds):
                               a cell is active when its 27-
                               neighborhood holds any target point,
                               and supertiles pack 32 consecutive
                               active cells — queries binned to
                               inactive cells provably have no
                               match and are dropped at binning.
    scan_lo   [G*KC, 4T]       bf16 low-order residual of the score
                               table (f32 - bf16(f32)); CORRES passes
                               (reported metrics, the kNN surface)
                               reconstruct ~f32 scores from three
                               bf16 MXU passes — single-pass bf16
                               selection flips ~2% of winners to a
                               spacing-distance neighbor (rmse 3e-3
                               vs 1.8e-4 at 1M), which GN tolerates
                               but parity does not
    binfields [C_pad*cap, F+1] f32 world-frame per-point columns in
                               BIN order (x, y, z, estimator channels,
                               original index as f32; -1 empty) — one
                               row gather resolves winner fields AND
                               identity (exact for N < 2^24)
    off       []               f32 key offset (> max |e|^2; 8*cell^2)
    """

    def __init__(self, scan, scan_lo, binfields, origin,
                 cell_size, off, dims, cap, kc, est, tile,
                 n_dropped=None, cell_map=None):
        self.scan = scan
        self.scan_lo = scan_lo
        self.binfields = binfields
        self.origin = origin
        self.cell_size = cell_size
        self.off = off
        self.dims = tuple(int(d) for d in dims)
        self.cap = int(cap)
        self.kc = int(kc)
        self.est = int(est)
        self.tile = int(tile)
        self.n_dropped = n_dropped
        self.cell_map = cell_map  # [C] int32 active rank / -1, or None

    @property
    def n_windows(self) -> int:
        return self.kc // WINDOW

    @property
    def n_cells(self) -> int:
        d = self.dims
        return d[0] * d[1] * d[2]

    @property
    def n_tiles(self) -> int:
        """Supertiles covered by THIS grid's scan rows (a shard's
        count when the scan leaf is a ring shard)."""
        return self.scan.shape[0] // self.kc


def _poolgrid_flatten(g):
    return ((g.scan, g.scan_lo, g.binfields, g.origin,
             g.cell_size, g.off, g.n_dropped, g.cell_map),
            (g.dims, g.cap, g.kc, g.est, g.tile))


def _poolgrid_unflatten(aux, leaves):
    (scan, scan_lo, binfields, origin, cell_size, off,
     n_dropped, cell_map) = leaves
    return PoolGrid(scan, scan_lo, binfields, origin, cell_size,
                    off, *aux, n_dropped=n_dropped, cell_map=cell_map)


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
                  tile: int = 32,
                  qp_limit: int = 8192,
                  est: int = EST_NONE,
                  shards: int = 1) -> Optional[dict]:
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
    dims = tuple(int(d) + 2 for d in dims_core)
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
    npts_f = int(finite.sum())
    if occupied.size == 0:
        cap = 8
    elif cap_percentile >= 100.0:
        cap = int(occupied.max())
    else:
        # drop-bounded capacity: the scored elements per pass scale
        # with kc = 27*cap, so pick the SMALLEST cap whose predicted
        # target drops sum((count-cap)+) stay under 0.15% of the
        # cloud (safely below the caller's 0.2% regrow threshold);
        # the occupancy percentile alone over-provisioned the
        # headline cloud 1.6x (cap 64 for mean occupancy 25)
        budget = max(32, int(0.0015 * npts_f))
        cap = None
        for c in range(8, cap_limit + 1, 8):
            drops = int(np.maximum(occupied - c, 0).sum())
            if drops <= budget:
                cap = c
                break
        if cap is None:
            pct = int(np.percentile(occupied, cap_percentile))
            if pct > cap_limit:
                return None
            cap = pct
    if cap > cap_limit:
        return None
    cap = max(8, _round_up(cap, 8))
    kc = _round_up(27 * cap, WINDOW)
    assert 27 * cap <= SLOT_MASK + 1

    # ACTIVE-CELL COMPACTION (surface clouds): a cell whose 27-
    # neighborhood holds no target point can never yield a
    # correspondence, so its scan rows need not exist and queries
    # binned there are dropped as provably matchless. fragment.pcd:
    # 334k cells, 4% occupied -> the dense table wasted 25x HBM and
    # its build dominated the whole ICP (VERDICT r4 #3).
    occ3 = np.zeros(dims, bool)
    occ3[1:-1, 1:-1, 1:-1] = (counts > 0).reshape(tuple(dims_core))
    act3 = np.zeros(dims, bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                act3 |= np.roll(occ3, (dx, dy, dz), (0, 1, 2))
    n_active = int(act3.sum())
    compact = n_active <= int(0.55 * n_cells)
    if compact:
        cells_list = np.flatnonzero(act3.reshape(-1)) \
            .astype(np.int32)
    else:
        cells_list = np.arange(n_cells, dtype=np.int32)

    # per-cell query counts (for pool sizing / balanced packing)
    qcnt = None
    if query_points is not None:
        qpn = np.asarray(query_points)
        qf = np.isfinite(qpn).all(-1)
        if qf.any():
            qc = np.floor((qpn[qf] - lo) / cell).astype(np.int64) + 1
            inb = (qc >= 0).all(-1) & (qc < dims).all(-1)
            if inb.any():
                linq = (qc[inb, 0] * dims[1] + qc[inb, 1]) * dims[2] \
                    + qc[inb, 2]
                qcnt = np.bincount(linq, minlength=n_cells)

    # z-major supertiles of `tile` consecutive (active) cells. NOTE
    # balanced query packing (snake deal / budgeted greedy) was
    # measured SLOWER on v5e: the dominant per-pass stream is the
    # scan table, which scales with the supertile COUNT G, so any
    # grouping that grows G loses more than the narrower query pool
    # saves. Compaction helps precisely because it shrinks G.
    active_cells = cells_list if compact else None
    c_pad = _round_up(cells_list.size, tile * shards)
    qp = 16 * tile
    if qcnt is not None:
        if compact:
            amap = np.full(n_cells, -1, np.int64)
            amap[cells_list] = np.arange(cells_list.size)
            ranks = amap[np.flatnonzero(qcnt)]
            reps = qcnt[np.flatnonzero(qcnt)]
            keep = ranks >= 0
            ranks, reps = ranks[keep], reps[keep]
        else:
            nz = np.flatnonzero(qcnt)
            ranks, reps = nz, qcnt[nz]
        if ranks.size:
            tcnt = np.bincount(ranks // tile, weights=reps,
                               minlength=c_pad // tile)
            tocc = tcnt[tcnt > 0]
            if tocc.size:
                qp = int(np.percentile(tocc, cap_percentile))
        qp = int(qp * 1.2) + 8
    qp = _round_up(max(qp, 8), 128 if qp > 128 else 8)
    if qp > qp_limit:
        return None
    F = n_fields(est)
    # per-device bytes: scan + scan_lo ([4*C_pad, kc] bf16 total) are
    # sharded by supertile under the ring path; the bin-ordered
    # binfields table (full-C rows so the epilogue can resolve any
    # original neighbor cell) is replicated on every device
    grid_bytes = (c_pad * 4 * kc * 4) // shards \
        + n_cells * cap * (F + 1) * 4
    if grid_bytes > mem_budget_bytes:
        return None
    origin = (lo - cell).astype(np.float32)
    return {
        "dims": dims, "origin": origin, "cap": cap, "kc": int(kc),
        "qp": int(qp), "tile": int(tile), "shards": int(shards),
        "cell_size": np.float32(cell),
        "rebin_margin": np.float32(float(radius) * float(margin)),
        "active_cells": active_cells, "n_active": n_active,
    }


# ---------------------------------------------------------------------------
# binning (shared with rungrid's scheme: sort by cell|morton key, rank
# within cell, scatter to slots)
# ---------------------------------------------------------------------------

SENTINEL_BIN = 1 << 24  # > any padded bin count (max_cells <= 2M)


def _cell_key(points, origin, cell_size, dims, n_bins_div, mask=None,
              cell_map=None):
    """(bin | 6-bit Morton) key; bin = cell_rank // n_bins_div where
    cell_rank is the linear cell (dense) or its active rank
    (`cell_map` set; queries in inactive cells are provably matchless
    and go to the sentinel). Out-of-bounds / masked -> sentinel.

    The sentinel bin must exceed the PADDED bin count seen by
    _bin_to_slots, not just C // n_bins_div: query binning passes
    n_bins = C_pad // tile >= C // tile, so a C-derived sentinel would
    alias a real supertile whenever C % (tile * shards) != 0 and
    masked queries would steal its pool slots (advisor r4, high)."""
    C = dims[0] * dims[1] * dims[2]
    rel = (points - origin) / cell_size
    cell = jnp.floor(rel).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
    if mask is not None:
        inb = inb & mask
    lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    if cell_map is not None:
        rank = cell_map[jnp.clip(lin, 0, C - 1)]
        inb = inb & (rank >= 0)
    else:
        rank = lin
    sub = jnp.clip((rel - cell) * 4.0, 0.0, 3.9999).astype(jnp.int32)
    m = ((sub[:, 0] & 2) << 4) | ((sub[:, 1] & 2) << 3) \
        | ((sub[:, 2] & 2) << 2) \
        | ((sub[:, 0] & 1) << 2) | ((sub[:, 1] & 1) << 1) \
        | (sub[:, 2] & 1)
    key = jnp.where(inb, (rank // n_bins_div) * 64 + m,
                    SENTINEL_BIN * 64)
    return key, lin, inb


def _bin_to_slots(key, n_bins: int, cap: int, channels, fill):
    """Sort by key, rank within bin (key//64), scatter channels to
    [n_bins, cap] slots. Payload channels ride THROUGH the sort
    network — measured on v5e: sorting (key, pos) alone and gathering
    the channels afterwards costs MORE, because 1M random 4-byte
    takes run far below the sort's per-channel cost. Returns
    (outs, index [n_bins, cap] int32, n_dropped)."""
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

@partial(jax.jit, static_argnames=("dims", "cap", "kc", "est", "tile",
                                   "shards"))
def build_poolgrid_arrays(points, attrs, origin, cell_size,
                          dims: Tuple[int, int, int], cap: int,
                          kc: int, est: int, tile: int, mask=None,
                          shards: int = 1, active_cells=None):
    """Bin targets once, assemble the 27-run neighborhood for the
    COORDINATE score table, and keep everything else compact: a
    [C, cap] original-index table and a world-frame field table
    consumed by the XLA epilogue after the kernel has picked winners.

    The 27-run neighborhood assembles by ROW gathers of the [C, cap]
    binned channels (wide rows gather at full rate; flat per-element
    takes would not). With `active_cells` ([C_act_pad] int32, -1 pad)
    only active cells get scan rows — surface clouds drop the table
    and its build by the inactive fraction (25x on fragment.pcd);
    dense grids use the identity cell list.

    reference: the grid replaces kdtree_flann.inl's per-query
    traversal; padded-slot capacity semantics follow NUM_MAX_NN
    (kdtree_search_param.h:26) with dropped counts surfaced."""
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    key, lin, _ = _cell_key(points, origin, cell_size, dims, 1, mask)
    linc = jnp.clip(lin, 0, C - 1)
    cen = cell_centers(dims, origin, cell_size, C)[linc]
    pc = points - cen
    binned, index, n_dropped = _bin_to_slots(
        key, C, cap, [pc[:, 0], pc[:, 1], pc[:, 2]],
        [jnp.float32(np.inf)] * 3)

    offs = np.asarray(RUN_OFFSETS, np.float32)
    if active_cells is None:
        # DENSE: 27-run neighborhood as rolls — measured faster than
        # row gathers here (strided copies beat 1M+ row takes when
        # every cell participates)
        C_pad = _round_up(C, tile * shards)
        G = C_pad // tile

        def rolled(arr2d):
            arr = arr2d.reshape(Gx, Gy, Gz, cap)
            parts = []
            for (dx, dy, dz) in RUN_OFFSETS:
                parts.append(jnp.roll(arr, (-dx, -dy, -dz), (0, 1, 2))
                             .reshape(C, cap))
            return jnp.concatenate(parts, -1)

        cx, cy, cz = (rolled(binned[i]) for i in range(3))
        lane_off = jnp.repeat(jnp.asarray(offs), cap, axis=0)
        cx = cx + lane_off[None, :, 0] * cell_size
        cy = cy + lane_off[None, :, 1] * cell_size
        cz = cz + lane_off[None, :, 2] * cell_size
        row_pad = C_pad - C
    else:
        # COMPACT: row gathers of each active cell's 27 neighbor rows
        # from the [C, cap] binned channels — the table and its build
        # shrink by the inactive fraction (25x on fragment.pcd)
        C_pad = active_cells.shape[0]          # multiple of tile*shards
        G = C_pad // tile
        avalid = active_cells >= 0
        a = jnp.clip(active_cells, 0)
        az = a % Gz
        ayx = a // Gz
        ay = ayx % Gy
        ax = ayx // Gy
        ioffs = np.asarray(RUN_OFFSETS, np.int32)
        # wraparound neighbor arithmetic; guard rings are empty
        nbr = (((ax[:, None] + ioffs[None, :, 0]) % Gx) * Gy
               + ((ay[:, None] + ioffs[None, :, 1]) % Gy)) * Gz \
            + ((az[:, None] + ioffs[None, :, 2]) % Gz)   # [Ca, 27]
        nbr_flat = nbr.reshape(-1)

        def gathered(arr2d):
            g = jnp.take(arr2d, nbr_flat, axis=0)        # [Ca*27, cap]
            return g.reshape(C_pad, 27 * cap)

        cx, cy, cz = (gathered(binned[i]) for i in range(3))
        lane_off = jnp.repeat(jnp.asarray(offs), cap, axis=0)
        cx = cx + lane_off[None, :, 0] * cell_size
        cy = cy + lane_off[None, :, 1] * cell_size
        cz = cz + lane_off[None, :, 2] * cell_size
        # pad rows (active_cells == -1) must never win
        cx = jnp.where(avalid[:, None], cx, jnp.inf)
        row_pad = 0

    empty = ~jnp.isfinite(cx)
    zero = jnp.zeros_like(cx)
    cx, cy, cz = (jnp.where(empty, zero, v) for v in (cx, cy, cz))
    cn = jnp.where(empty, jnp.float32(BIG),
                   cx * cx + cy * cy + cz * cz)

    pad = kc - 27 * cap
    if pad:
        def padk(arr, v):
            return jnp.pad(arr, ((0, 0), (0, pad)), constant_values=v)
        cx, cy, cz = padk(cx, 0), padk(cy, 0), padk(cz, 0)
        cn = padk(cn, BIG)

    # (a) scan table in the kernel's LANES-MAJOR layout
    # [G*KC, 4T]: row (supertile, slot), col (cell-in-tile, field) —
    # the per-window score is then [128, 4T] @ [4T, QP] with no
    # in-kernel transposes. Phantom pad cells are empty (they own no
    # queries and their lanes carry BIG).
    scan32 = jnp.stack([-2.0 * cx, -2.0 * cy, -2.0 * cz, cn], 1)
    if row_pad:
        scan32 = jnp.pad(scan32, ((0, row_pad), (0, 0), (0, 0)))
    scan32 = scan32.reshape(G, tile, 4, kc).transpose(0, 3, 1, 2) \
        .reshape(G * kc, tile * 4)
    scan = scan32.astype(jnp.bfloat16)
    scan_lo = (scan32 - scan.astype(jnp.float32)) \
        .astype(jnp.bfloat16)

    # (b) world-frame per-point fields + original index, in BIN
    # order over the FULL grid (the epilogue resolves any original
    # neighbor cell): ONE row gather resolves the winner
    fields = jnp.concatenate([points, attrs], -1) \
        .astype(jnp.float32) if attrs.shape[1] else \
        points.astype(jnp.float32)
    idx_flat = index.reshape(-1)
    safe_idx = jnp.clip(idx_flat, 0, points.shape[0] - 1)
    binfields = jnp.concatenate(
        [fields[safe_idx], idx_flat[:, None].astype(jnp.float32)], -1)
    binfields = jnp.where(idx_flat[:, None] >= 0, binfields,
                          jnp.concatenate([
                              jnp.zeros((1, fields.shape[1]),
                                        jnp.float32),
                              jnp.float32(INVALID_INDEX)
                              * jnp.ones((1, 1), jnp.float32)], -1))

    off = 8.0 * cell_size * cell_size
    return scan, scan_lo, binfields, off, n_dropped


@partial(jax.jit, static_argnames=("n_cells",))
def _cell_map_from_active(active_cells, n_cells: int):
    """[C] int32 active-rank map (-1 inactive) scattered on device
    from the compact active id list (uploading the full map would
    cost ~58 ms/MB through the tunnel; the id list is 4x smaller)."""
    ca = active_cells.shape[0]
    avalid = active_cells >= 0
    slot = jnp.where(avalid, active_cells, n_cells)
    return jnp.full((n_cells + 1,), -1, jnp.int32) \
        .at[slot].set(jnp.arange(ca, dtype=jnp.int32),
                      mode="drop")[:n_cells]


def make_poolgrid(points, attrs, origin, cell_size, dims, cap, kc,
                  est: int = EST_NONE, tile: int = 32,
                  mask=None, shards: int = 1,
                  active_cells=None) -> PoolGrid:
    """`active_cells`: optional np/jax int32 array of active cell ids
    from plan_poolgrid (compact surface-cloud grid); padded here to a
    multiple of tile*shards with -1."""
    cell_map = None
    act_j = None
    if active_cells is not None:
        act_np = np.asarray(active_cells, np.int32)
        ca_pad = _round_up(max(act_np.shape[0], 1),
                           int(tile) * int(shards))
        act_j = jnp.asarray(np.pad(act_np,
                                   (0, ca_pad - act_np.shape[0]),
                                   constant_values=-1))
        C = int(dims[0]) * int(dims[1]) * int(dims[2])
        cell_map = _cell_map_from_active(act_j, C)
    scan, scan_lo, binfields, off, n_dropped = \
        build_poolgrid_arrays(
            points, attrs, jnp.asarray(origin, jnp.float32),
            jnp.asarray(cell_size, jnp.float32), tuple(dims),
            int(cap), int(kc), int(est), int(tile), mask=mask,
            shards=int(shards), active_cells=act_j)
    return PoolGrid(scan, scan_lo, binfields,
                    jnp.asarray(origin, jnp.float32),
                    jnp.asarray(cell_size, jnp.float32), off,
                    tuple(dims), int(cap), int(kc), int(est),
                    int(tile), n_dropped=n_dropped,
                    cell_map=cell_map)


# ---------------------------------------------------------------------------
# query-side pooling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "qp", "tile", "n_extra",
                                   "shards", "n_rank_pad"))
def bin_queries_pool(points, bin_T, origin, cell_size,
                     dims: Tuple[int, int, int], qp: int, tile: int,
                     extra=None, n_extra: int = 0, mask=None,
                     shards: int = 1, cell_map=None,
                     n_rank_pad: Optional[int] = None):
    """Pool queries per supertile of `tile` consecutive z-major cells
    (or consecutive ACTIVE cells when `cell_map` is given; a size-0
    cell_map means dense — the shard_map path cannot carry None).
    `n_rank_pad`: padded rank-domain size (the grid's total supertile
    count x tile); defaults to round_up(C, tile*shards) dense.

    Returns (qpool [G, CH, QP] f32 rows (x, y, z, tagf, ccx, ccy,
    ccz, extra..., 0), qidx [G, QP] int32 (-1 empty), n_dropped).
    CH per `query_channels`. Queries keep ORIGINAL coords; binned at
    position bin_T @ q. Only (x, y, z, extras) ride the sort network;
    tag and the bin-time cell center are re-derived from the pooled
    coordinates afterwards (bit-identical floor arithmetic), which
    nearly halves the dominant rebin cost. tagf = cell-within-
    supertile, -1 empty."""
    C = dims[0] * dims[1] * dims[2]
    if cell_map is not None and cell_map.shape[0] == 0:
        cell_map = None
    if n_rank_pad is not None:
        C_pad = int(n_rank_pad)
    else:
        assert cell_map is None, \
            "compact binning needs n_rank_pad from the grid"
        C_pad = _round_up(C, tile * shards)
    G = C_pad // tile
    Rb = bin_T[:3, :3]
    tb = bin_T[:3, 3]
    # explicit per-axis muls, NOT a matmul: TPU matmuls default to
    # bf16 passes, and the post-scatter tag/cc re-derivation below
    # must reproduce these positions BIT-EXACTLY or boundary queries
    # get mis-tagged (seen as a 4% fitness loss at 1M points)
    bin_positions = jnp.stack(
        [Rb[0, 0] * points[:, 0] + Rb[0, 1] * points[:, 1]
         + Rb[0, 2] * points[:, 2] + tb[0],
         Rb[1, 0] * points[:, 0] + Rb[1, 1] * points[:, 1]
         + Rb[1, 2] * points[:, 2] + tb[1],
         Rb[2, 0] * points[:, 0] + Rb[2, 1] * points[:, 1]
         + Rb[2, 2] * points[:, 2] + tb[2]], -1)
    key, lin, inb = _cell_key(bin_positions, origin, cell_size, dims,
                              tile, mask, cell_map=cell_map)
    # the linear cell id rides the sort as an exact-int f32 channel;
    # tag and the cell center are decoded from IT after pooling, so
    # they agree with the key binning bit-for-bit (re-deriving them
    # from re-transformed coordinates is NOT safe: XLA may fuse the
    # two sites differently and flip boundary cells)
    linf = jnp.where(inb, lin, -1).astype(jnp.float32)
    channels = [points[:, 0], points[:, 1], points[:, 2], linf]
    for i in range(n_extra):
        channels.append(extra[:, i])
    fill = [jnp.float32(0.0)] * 3 + [jnp.float32(-1.0)] + \
        [jnp.float32(0.0)] * n_extra
    binned, index, n_dropped = _bin_to_slots(key, G, qp, channels,
                                             fill)
    x, y, z = binned[0], binned[1], binned[2]
    linq = binned[3].astype(jnp.int32)
    occ = (index >= 0) & (linq >= 0)
    lc = jnp.clip(linq, 0, C - 1)
    rank_q = cell_map[lc] if cell_map is not None else linq
    occ = occ & (rank_q >= 0)
    tagf = jnp.where(occ, (rank_q % tile).astype(jnp.float32), -1.0)
    cellz = (lc % dims[2]).astype(jnp.float32)
    celly = ((lc // dims[2]) % dims[1]).astype(jnp.float32)
    cellx = (lc // (dims[2] * dims[1])).astype(jnp.float32)
    ccx = origin[0] + (cellx + 0.5) * cell_size
    ccy = origin[1] + (celly + 0.5) * cell_size
    ccz = origin[2] + (cellz + 0.5) * cell_size
    CH = max(8, _round_up(7 + n_extra, 4))
    rows = [x, y, z, tagf, ccx, ccy, ccz] + binned[4:]
    rows += [jnp.zeros((G, qp), jnp.float32)] * (CH - len(rows))
    qpool = jnp.stack(rows[:CH], 1)
    return qpool, index, n_dropped


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def make_params(T, r2, grid: PoolGrid, extra0=0.0, extra1=0.0):
    """[NPARAMS] f32: R row-major (0-8), t (9-11), r^2 (12), key
    offset OFF (13), estimator extras (17-18: Colored ICP's sqrt
    lambda_geometric / sqrt lambda_photometric), spare."""
    R = T[:3, :3].reshape(-1)
    t = T[:3, 3]
    head = jnp.concatenate([
        R, t, jnp.asarray(r2, jnp.float32).reshape(1),
        jnp.asarray(grid.off, jnp.float32).reshape(1),
        jnp.zeros(3, jnp.float32),
        jnp.asarray(extra0, jnp.float32).reshape(1),
        jnp.asarray(extra1, jnp.float32).reshape(1)])
    return jnp.concatenate([
        head, jnp.zeros(NPARAMS - head.shape[0], jnp.float32)])


def _make_slim_kernel(T: int, QP: int, KC: int, gb: int,
                      exact: bool):
    """Lanes-major slot kernel: QUERIES LIVE IN LANES, candidates in
    sublanes — every per-query quantity is a native [1, QP] lane
    vector (no transposes, no [QP, 1] sublane-wasted ops) and the
    per-window score is an MXU-native [128, 4T] @ [4T, QP] dot.
    Ungated by design (see _slot_pallas)."""
    NW = KC // WINDOW

    def kern(p_ref, q_ref, c_ref, *rest):
        cl_ref = rest[0] if exact else None
        out_ref, acc = rest[-2], rest[-1]
        i = pl.program_id(0)
        R00, R01, R02 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
        R10, R11, R12 = p_ref[0, 3], p_ref[0, 4], p_ref[0, 5]
        R20, R21, R22 = p_ref[0, 6], p_ref[0, 7], p_ref[0, 8]
        t0, t1, t2 = p_ref[0, 9], p_ref[0, 10], p_ref[0, 11]
        off = p_ref[0, 13]

        qx = q_ref[0:1, :]
        qy = q_ref[1:2, :]
        qz = q_ref[2:3, :]
        tag = q_ref[3:4, :]                   # [1, QP]
        tx = R00 * qx + R01 * qy + R02 * qz + t0
        ty = R10 * qx + R11 * qy + R12 * qz + t1
        tz = R20 * qx + R21 * qy + R22 * qz + t2
        ex = tx - q_ref[4:5, :]
        ey = ty - q_ref[5:6, :]
        ez = tz - q_ref[6:7, :]

        # block-diagonal query matrix A^T [4T, QP]: row 4t+j holds
        # (ex, ey, ez, 1)[j] for queries tagged to cell t, else 0
        rowid = jax.lax.broadcasted_iota(jnp.int32, (4 * T, QP), 0)
        trow = (rowid >> 2).astype(jnp.float32)
        j = rowid & 3
        val = jnp.where(j == 0, ex, jnp.where(j == 1, ey,
                        jnp.where(j == 2, ez, 1.0)))
        Af = jnp.where(tag == trow, val, 0.0)
        A = Af.astype(jnp.bfloat16)
        if exact:
            # split-precision selection: the MXU runs single bf16
            # passes regardless of any `precision` request, so ~f32
            # scores are reconstructed as Bh*Ah + Bl*Ah + Bh*Al from
            # the precomputed low-order table (Bl*Al ~2^-16 relative,
            # below the 12-bit key quantum)
            Al = (Af - A.astype(jnp.float32)).astype(jnp.bfloat16)
        subl = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, QP), 0)

        def dot(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        for w in range(NW):
            sl = pl.ds(w * WINDOW, WINDOW)
            B = c_ref[sl, :]                  # [128, 4T] bf16
            if exact:
                Bl = cl_ref[sl, :]
                v = ((dot(B, A) + dot(Bl, A)) + dot(B, Al)) + off
            else:
                v = dot(B, A) + off
            key = (jax.lax.bitcast_convert_type(v, jnp.int32)
                   & ~SLOT_MASK) | (w * WINDOW + subl)
            if w == 0:
                acc[:] = key
            else:
                acc[:] = jnp.minimum(acc[:], key)

        m = jnp.min(acc[:], 0, keepdims=True)   # [1, QP] winning key
        slot = (m & SLOT_MASK).astype(jnp.float32)
        r = i % gb
        out_ref[pl.ds(r, 1), :] = slot

    return kern


def _slot_pallas(grid: PoolGrid, qpool, params, interpret: bool,
                 exact: bool = False):
    """Measured on v5e @1M pts: UNGATED wins — a pl.when window gate
    costs a vector->scalar sync (~3 us/step, ~10 ms per pass) while
    the supertile-pooled reach test (bd0 + |q - cc|) almost never
    closes on dense query pools, because some pooled query always
    sits near every corner run. The kernel therefore streams all NW
    windows unconditionally."""
    G, CH, QP = qpool.shape
    KC = grid.kc
    T = grid.tile
    gb = min(8, G)
    kern = _make_slim_kernel(T, QP, KC, gb, exact)
    in_specs = [
        pl.BlockSpec((1, NPARAMS), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 8, QP), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((KC, 4 * T), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [params.reshape(1, NPARAMS), qpool, grid.scan]
    if exact:
        in_specs.append(pl.BlockSpec((KC, 4 * T), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(grid.scan_lo)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, QP), lambda i: (i // gb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, QP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WINDOW, QP), jnp.int32)],
        interpret=interpret,
    )(*args)


def _slot_xla(grid: PoolGrid, qpool, params, exact: bool = False):
    """XLA mirror of the kernel's packed-key selection (CPU tests /
    non-TPU fallback); adding the 124 structurally-zero terms of the
    kernel's K=4T contraction is exact in fp, so results match to the
    12-bit key quantum. Runs per supertile under `lax.map` so the
    gathered [KC, QP, 4] score tensor never materializes for all
    supertiles at once (advisor r4: the all-G form needs >100 GB at
    bench scale)."""
    G, CH, QP = qpool.shape
    KC = grid.kc
    T = grid.tile
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    off = params[13]
    scan_r = grid.scan.reshape(G, KC, T, 4)
    scan_lo_r = grid.scan_lo.reshape(G, KC, T, 4) if exact else None

    def per_tile(args):
        qp_g = args[0]                        # [CH, QP]
        sh = args[1]                          # [KC, T, 4]
        tag = qp_g[3, :]
        tcell = jnp.clip(tag, 0.0).astype(jnp.int32)
        qx, qy, qz = qp_g[0, :], qp_g[1, :], qp_g[2, :]
        cc = jnp.stack([qp_g[4, :], qp_g[5, :], qp_g[6, :]], -1)
        # explicit muls mirror the kernel's f32 VPU transform exactly
        tq = jnp.stack(
            [R[0, 0] * qx + R[0, 1] * qy + R[0, 2] * qz + t[0],
             R[1, 0] * qx + R[1, 1] * qy + R[1, 2] * qz + t[1],
             R[2, 0] * qx + R[2, 1] * qy + R[2, 2] * qz + t[2]], -1)
        e = tq - cc                           # [QP, 3]
        Af = jnp.concatenate([e, jnp.ones_like(e[..., :1])], -1)
        A = Af.astype(jnp.bfloat16)

        def take_rows(s):
            return jnp.take_along_axis(
                s, tcell[None, :, None], axis=1)  # [KC, QP, 4]

        def dot(x, y):
            return jnp.einsum("qf,kqf->qk", x, y,
                              preferred_element_type=jnp.float32)

        Bh = take_rows(sh)
        if exact:
            # mirror the kernel's explicit three-pass split product
            # (same add order -> bit-faithful on CPU)
            Al = (Af - A.astype(jnp.float32)).astype(jnp.bfloat16)
            Bl = take_rows(args[2])
            v = ((dot(A, Bh) + dot(A, Bl)) + dot(Al, Bh)) + off
        else:
            v = dot(A, Bh) + off
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
        key = (jax.lax.bitcast_convert_type(v, jnp.int32)
               & ~SLOT_MASK) | slots
        m = jnp.min(key, -1)
        return (m & SLOT_MASK).astype(jnp.float32)

    xs = (qpool, scan_r) + ((scan_lo_r,) if exact else ())
    return jax.lax.map(per_tile, xs)


# ---------------------------------------------------------------------------
# epilogue: slot -> exact residuals / GN reduction on compact tables
# ---------------------------------------------------------------------------

def _gn_terms_world(est: int, f, tx, ty, tz, px, py, pz, q_extra,
                    R9, slg, slp, ok, d2c):
    """GN sum terms from world-frame quantities. f: gathered field
    columns beyond coordinates; q_extra: pooled query extra channels.
    Slot layout matches rungrid's N_SUMS comment."""
    w = ok.astype(jnp.float32)
    if est in (EST_NONE, EST_PT2PT):
        terms = [w, w * tx, w * ty, w * tz, w * px, w * py, w * pz]
        for s in (tx, ty, tz):
            for d in (px, py, pz):
                terms.append(w * s * d)
        terms.append(d2c)
        return terms
    if est in (EST_COLORED, EST_GICP):
        return _gn_terms_ext(est, f, tx, ty, tz, tx - px, ty - py,
                             tz - pz, q_extra, R9, slg, slp, ok, d2c)
    if est == EST_PT2PL:
        nx, ny, nz, dd = f[0], f[1], f[2], f[3]
        r = nx * tx + ny * ty + nz * tz - dd
        j = (ty * nz - tz * ny, tz * nx - tx * nz, tx * ny - ty * nx,
             nx, ny, nz)
    elif est == EST_SYM:
        nx, ny, nz = f[0], f[1], f[2]
        s0, s1, s2 = q_extra[0], q_extra[1], q_extra[2]
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = R9
        mx = nx + R00 * s0 + R01 * s1 + R02 * s2
        my = ny + R10 * s0 + R11 * s1 + R12 * s2
        mz = nz + R20 * s0 + R21 * s1 + R22 * s2
        r = (tx - px) * mx + (ty - py) * my + (tz - pz) * mz
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


def _gn_terms_ext(est: int, f, tx, ty, tz, dx, dy, dz, q_extra,
                  R9, slg, slp, ok, d2c):
    """GN sum terms for the Colored ICP / GICP estimators.

    f: gathered field columns beyond coords; d* = q - p (world
    residual); q_extra: pooled query extras (source intensity /
    covariance); R9: rotation scalars for rotating the source
    covariance.

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


def _epilogue(grid: PoolGrid, qpool, slotf, params, est: int,
              corres: bool, tile0=0):
    """slot id -> original target index -> exact residuals; then
    either the per-query correspondence pair or the fully-reduced GN
    sums. The single gather is against the compact bin-ordered
    [C_pad*cap, F+1] field+index table. `tile0` is the GLOBAL
    supertile index of local row 0 — nonzero when the kernel ran on a
    rotated grid shard (parallel/sharded.py ring): binfields stays
    globally indexed."""
    G, CH, QP = qpool.shape
    T = grid.tile
    Gx, Gy, Gz = grid.dims
    C = Gx * Gy * Gz
    cap = grid.cap
    R = params[:9].reshape(3, 3)
    t = params[9:12]
    r2 = params[12]

    tag = qpool[:, 3, :]
    valid = tag >= 0.0
    slot = slotf.astype(jnp.int32)
    in_lanes = slot < 27 * cap
    sl = jnp.clip(slot, 0, 27 * cap - 1)
    run = sl // cap
    rank = sl % cap
    offs = np.asarray(RUN_OFFSETS, np.int32)
    dx = jnp.asarray(offs[:, 0])[run]
    dy = jnp.asarray(offs[:, 1])[run]
    dz = jnp.asarray(offs[:, 2])[run]
    # the query's ORIGINAL cell decodes from its bin-time cell center
    # (cc = origin + (cell+0.5)*h, so the floor sits mid-cell with a
    # 0.5-cell safety margin) — works for dense, ring-sharded (tile0
    # rows), and active-compacted supertiles alike
    inv_h = 1.0 / grid.cell_size
    cx = jnp.clip(jnp.floor((qpool[:, 4, :] - grid.origin[0])
                            * inv_h).astype(jnp.int32), 0, Gx - 1)
    cy = jnp.clip(jnp.floor((qpool[:, 5, :] - grid.origin[1])
                            * inv_h).astype(jnp.int32), 0, Gy - 1)
    cz = jnp.clip(jnp.floor((qpool[:, 6, :] - grid.origin[2])
                            * inv_h).astype(jnp.int32), 0, Gz - 1)
    # wraparound neighbor arithmetic matches the build's jnp.roll:
    # both guard rings are empty, so a ring-cell query resolving a
    # wrapped neighbor sees the same empty lanes the kernel scored
    nbr = ((cx + dx) % Gx * Gy + (cy + dy) % Gy) * Gz + (cz + dz) % Gz
    g = jnp.take(grid.binfields, (nbr * cap + rank).reshape(-1),
                 axis=0).reshape(G, QP, -1)
    f = g[..., :-1]
    pidx = g[..., -1].astype(jnp.int32)
    ok0 = valid & in_lanes & (pidx >= 0)
    # explicit per-axis muls (VPU f32), NOT a matmul: the TPU default
    # bf16 MXU pass would round the transformed coordinates to ~8
    # mantissa bits and the "exact" residuals would carry ~4e-3
    # absolute noise at metre scale
    qx, qy, qz = qpool[:, 0, :], qpool[:, 1, :], qpool[:, 2, :]
    tq = jnp.stack(
        [R[0, 0] * qx + R[0, 1] * qy + R[0, 2] * qz + t[0],
         R[1, 0] * qx + R[1, 1] * qy + R[1, 2] * qz + t[1],
         R[2, 0] * qx + R[2, 1] * qy + R[2, 2] * qz + t[2]], -1)
    d = tq - f[..., :3]
    d2 = jnp.sum(d * d, -1)
    ok = ok0 & (d2 <= r2)
    if corres:
        d2o = jnp.where(ok, d2, jnp.float32(np.inf))
        idxo = jnp.where(ok, pidx.astype(jnp.float32),
                         jnp.float32(INVALID_INDEX))
        return d2o, idxo
    d2c = jnp.where(ok, d2, 0.0)
    tx, ty, tz = tq[..., 0], tq[..., 1], tq[..., 2]
    px, py, pz = f[..., 0], f[..., 1], f[..., 2]
    fcols = [f[..., 3 + k] for k in range(f.shape[-1] - 3)]
    q_extra = tuple(qpool[:, 7 + k, :]
                    for k in range(n_query_extra(est)))
    R9 = tuple(params[k] for k in range(9))
    terms = _gn_terms_world(est, fcols, tx, ty, tz, px, py, pz,
                            q_extra, R9, params[17], params[18], ok,
                            d2c)
    sums = jnp.stack([jnp.sum(term) for term in terms])
    return jnp.pad(sums, (0, N_SUMS - sums.shape[0]))[None, :]


@partial(jax.jit, static_argnames=("est", "corres", "use_pallas"))
def fused_pool_query(grid: PoolGrid, qpool, params, est: int,
                     corres: bool, use_pallas: Optional[bool] = None,
                     tile0=0):
    """One fused correspondence (+GN reduction) pass over the pooled
    grid. Returns (d2 [G, QP], idx [G, QP] f32) when `corres`, else a
    [1, N_SUMS] array of GN sums (summed over axis 0 by callers).

    `grid` may be a SHARD of the global grid (scan rows local)
    with `tile0` giving local row 0's global supertile index;
    binfields is always global."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        slotf = _slot_xla(grid, qpool, params, exact=corres)
    else:
        slotf = _slot_pallas(grid, qpool, params,
                             interpret=use_pallas == "interpret",
                             exact=corres)
    return _epilogue(grid, qpool, slotf, params, est, corres,
                     tile0=tile0)
