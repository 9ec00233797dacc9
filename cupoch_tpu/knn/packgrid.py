"""Packed compact-candidate grid — second-generation ICP hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl); round 1 replaced it with a dense
27-cell roll grid (knn/rollgrid.py).  Profiling that design on a v5e
showed three dominant costs per ICP iteration: (a) re-binning queries
(multi-operand sort, ~9 ms), (b) a VPU distance kernel over a
27*cap-padded candidate axis that is ~60% empty slots, and (c)
post-kernel scatters plus 1M-row random gathers of target attributes
for the Gauss-Newton step (catastrophic on TPU: ~0.5 us/row).

This module removes all three:

1. build: targets are binned once, the 27-cell neighborhood tensor is
   assembled with `jnp.roll` (zero gathers), then each cell's candidate
   lanes are COMPACTED and SORTED by distance-to-cell-center and
   truncated to a host-planned lane count `kc` (99.9th percentile of
   27-block occupancy).  Sorting buys a cheap two-phase query: the
   nearest `l1` lanes almost always contain the true NN; a per-tile
   bound (`dbound` = d_center of lane l1) triggers the tail phase only
   when correctness requires it.
2. query: a Pallas kernel computes, per cell, scores
   v = |c|^2 - 2 q.c  (argmin_c v == argmin_c |q-c|^2) against the
   PRE-TRANSFORMED queries (the per-iteration rigid transform is a
   fused XLA elementwise pass, not kernel work), takes the lane min,
   and fetches the winner's attribute channels (normal / plane offset /
   original index...) with float select+max passes — attributes arrive
   in bin order, so the GN estimator never gathers.
3. queries are binned by their transformed position but STORE original
   coordinates; the ICP loop re-bins only when the accumulated motion
   since the last binning exceeds the planned cell margin
   (cell = radius * (1 + margin)), amortizing the sort.

Capacity discipline matches the reference's padded-neighbor semantics
(SURVEY.md §2.2): per-cell caps are occupancy percentiles; overflow
rows drop (callers see -1).  With `exact=True` lane truncation is
disabled (kc = 27*cap) and ties resolve to the smallest original index
like the brute-force path.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

class PackGrid:
    """Pytree; `dims`, `cap`, `kc`, `l1`, `nch` static.

    cand  [Cp, 4, KC]  rows (-2cx, -2cy, -2cz, |c|^2); empty: |c|^2=BIG
    attr  [Cp, A, KC]  attribute channels (A = nch + 1; last = index)
    dbound[Cp, 1]      d_center of lane l1 (+inf when cell has < l1)
    """

    def __init__(self, cand, attr, dbound, origin, cell_size, dims, cap,
                 kc, l1, nch):
        self.cand = cand
        self.attr = attr
        self.dbound = dbound
        self.origin = origin
        self.cell_size = cell_size
        self.dims = tuple(int(d) for d in dims)
        self.cap = int(cap)
        self.kc = int(kc)
        self.l1 = int(l1)
        self.nch = int(nch)


def _packgrid_flatten(g):
    return ((g.cand, g.attr, g.dbound, g.origin, g.cell_size),
            (g.dims, g.cap, g.kc, g.l1, g.nch))


def _packgrid_unflatten(aux, leaves):
    return PackGrid(*leaves, *aux)


jax.tree_util.register_pytree_node(PackGrid, _packgrid_flatten,
                                   _packgrid_unflatten)

# tile of cells processed per Pallas program; the [T, qcap, L] score
# block must stay ~2 MB of VMEM
_TILE_BUDGET = 8192  # T * max(L1, KC - L1) elements per qcap row


def _pick_tile(c_cells: int, l_max: int) -> int:
    t = max(8, min(64, _TILE_BUDGET // max(1, l_max) // 8 * 8))
    while c_cells % t != 0:
        t -= 8
    return max(t, 8)


def padded_cells(dims, l_max: int = 896) -> int:
    """Cell count padded so every legal tile size divides it."""
    c = dims[0] * dims[1] * dims[2]
    return _round_up(c, 64)


# ---------------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------------

def plan_packgrid(points: np.ndarray, radius: float,
                  margin: float = 0.125,
                  query_points: Optional[np.ndarray] = None,
                  cap_percentile: float = 99.5,
                  kc_percentile: float = 99.9,
                  max_cells: int = 2_000_000,
                  cap_limit: int = 128,
                  mem_budget_bytes: int = 4 << 30,
                  exact: bool = False,
                  nch: int = 4) -> Optional[dict]:
    """Host sizing. Returns None when a dense grid is unreasonable.

    cell = radius*(1+margin): queries binned at transform T_bin stay
    valid for the 27-neighborhood as long as every point has moved
    less than radius*margin since binning (rebin trigger).
    """
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(-1)
    if not finite.any() or radius <= 0:
        return None
    lo = pts[finite].min(0).astype(np.float64)
    hi = pts[finite].max(0).astype(np.float64)
    cell = float(radius) * (1.0 + float(margin))
    dims_core = np.maximum(1, np.ceil((hi - lo) / cell + 1e-6).astype(int))
    dims = tuple(int(d) + 2 + (int(d) % 2) for d in dims_core)
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
    # 27-block occupancy -> compacted lane count
    blk = np.zeros(np.asarray(dims_core) + 2, np.int64)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                blk[dx:dx + dims_core[0], dy:dy + dims_core[1],
                    dz:dz + dims_core[2]] += counts
    blk_occ = blk[blk > 0]
    kc_full = _round_up(27 * cap, 128)
    if exact or not blk_occ.size:
        kc = kc_full
    else:
        kc = int(np.percentile(blk_occ, kc_percentile))
        kc = min(kc_full, max(128, _round_up(kc, 128)))
    l1 = kc if kc <= 256 else 256
    if exact:
        l1 = kc
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
        "l1": int(l1), "qcap": int(qcap),
        "cell_size": np.float32(cell),
        "rebin_margin": np.float32(float(radius) * float(margin)),
    }


# ---------------------------------------------------------------------------
# binning (shared with queries)
# ---------------------------------------------------------------------------

def _cell_keys(points, origin, cell_size, dims, mask=None):
    C = dims[0] * dims[1] * dims[2]
    cell = jnp.floor((points - origin) / cell_size).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
    if mask is not None:
        inb = inb & mask
    lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    return jnp.where(inb, lin, C)


def _bin_channels(keys, channels, n_bins: int, cap: int, fill):
    """Scatter per-point channel values into [n_bins, cap] slots.
    Returns (list of [n_bins, cap] arrays, index [n_bins, cap])."""
    N = keys.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    sorted_ops = jax.lax.sort((keys, pos) + tuple(channels),
                              num_keys=1, is_stable=True)
    keys_s, order = sorted_ops[0], sorted_ops[1]
    ch_s = sorted_ops[2:]
    boundary = jnp.concatenate([
        jnp.ones(1, bool), keys_s[1:] != keys_s[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, pos, 0))
    rank = pos - seg_start
    ok = (keys_s < n_bins) & (rank < cap)
    slot = jnp.where(ok, keys_s * cap + rank, n_bins * cap)
    outs = []
    for ch, f in zip(ch_s, fill):
        outs.append(jnp.full(n_bins * cap + 1, f, ch.dtype)
                    .at[slot].set(ch, mode="drop")[:-1]
                    .reshape(n_bins, cap))
    index = jnp.full(n_bins * cap + 1, INVALID_INDEX, jnp.int32) \
        .at[slot].set(order, mode="drop")[:-1].reshape(n_bins, cap)
    return outs, index


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "cap", "kc"))
def build_packgrid(points, attrs, origin, cell_size,
                   dims: Tuple[int, int, int], cap: int, kc: int,
                   mask=None):
    """Bin targets, assemble+compact the 27-neighborhood. `attrs` is
    [N, nch] per-target channels (e.g. normal xyz + plane offset); the
    original index rides as one extra channel. dbound is attached later
    by `finalize_packgrid` (l1 is a query-time choice)."""
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    nch = attrs.shape[1]
    channels = [points[:, 0], points[:, 1], points[:, 2]] + \
        [attrs[:, i] for i in range(nch)]
    fill = [jnp.float32(np.inf)] * 3 + [jnp.float32(0.0)] * nch
    keys = _cell_keys(points, origin, cell_size, dims, mask)
    binned, index = _bin_channels(keys, channels, C, cap, fill)
    # index rides negated: the winner fetch is max(where(eq, ...)), so
    # -idx makes ties resolve to the SMALLEST original index, matching
    # the brute-force path. (-(-1) decodes empty lanes back to -1.)
    idxf = -index.astype(jnp.float32)  # exact for N < 2^24

    # 27-neighborhood roll-concat: [C, 27*cap] per channel
    def roll_cat(arr2d):
        a = arr2d.reshape(Gx, Gy, Gz, cap)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    parts.append(jnp.roll(a, (dx, dy, dz), (0, 1, 2))
                                 .reshape(C, cap))
        return jnp.concatenate(parts, -1)

    cx, cy, cz = (roll_cat(binned[i]) for i in range(3))
    ach = [roll_cat(binned[3 + i]) for i in range(nch)]
    aidx = roll_cat(idxf)

    # distance to own cell center (sort key; empty lanes -> +inf)
    lin = jnp.arange(C, dtype=jnp.int32)
    ccz = (lin % Gz).astype(jnp.float32)
    ccy = ((lin // Gz) % Gy).astype(jnp.float32)
    ccx = (lin // (Gz * Gy)).astype(jnp.float32)
    center = jnp.stack([ccx, ccy, ccz], -1) + 0.5
    center = origin + center * cell_size  # [C, 3]
    dcen = jnp.sqrt(
        (cx - center[:, 0:1]) ** 2 + (cy - center[:, 1:2]) ** 2
        + (cz - center[:, 2:3]) ** 2)
    dcen = jnp.where(jnp.isfinite(cx), dcen, jnp.float32(np.inf))

    # ALWAYS sort lanes by distance-to-center: the two-phase query is
    # only sound on a sorted prefix (dbound = d_center of lane l1)
    ops = jax.lax.sort((dcen, cx, cy, cz, aidx) + tuple(ach),
                       num_keys=1, is_stable=False, dimension=1)
    dcen, cx, cy, cz, aidx = ops[:5]
    ach = list(ops[5:])
    if kc < cx.shape[1]:
        dcen = dcen[:, :kc]
        cx, cy, cz, aidx = (v[:, :kc] for v in (cx, cy, cz, aidx))
        ach = [v[:, :kc] for v in ach]
    elif kc > cx.shape[1]:
        pad = kc - cx.shape[1]
        dcen = jnp.pad(dcen, ((0, 0), (0, pad)), constant_values=np.inf)
        cx, cy, cz = (jnp.pad(v, ((0, 0), (0, pad)),
                              constant_values=np.inf)
                      for v in (cx, cy, cz))
        aidx = jnp.pad(aidx, ((0, 0), (0, pad)),
                       constant_values=-float(INVALID_INDEX))
        ach = [jnp.pad(v, ((0, 0), (0, pad))) for v in ach]

    empty = ~jnp.isfinite(cx)
    cn = jnp.where(empty, BIG, cx * cx + cy * cy + cz * cz)
    zero = jnp.zeros_like(cx)
    cx, cy, cz = (jnp.where(empty, zero, v) for v in (cx, cy, cz))
    cand = jnp.stack([-2.0 * cx, -2.0 * cy, -2.0 * cz, cn], 1)
    aidx = jnp.where(empty, -float(INVALID_INDEX), aidx)
    attr = jnp.stack(ach + [aidx], 1)  # [C, nch+1, kc]

    cp = padded_cells(dims)
    if cp > C:
        pc = jnp.zeros((cp - C, 4, kc), jnp.float32).at[:, 3, :].set(BIG)
        cand = jnp.concatenate([cand, pc], 0)
        pa = jnp.zeros((cp - C, nch + 1, kc), jnp.float32) \
            .at[:, nch, :].set(-float(INVALID_INDEX))
        attr = jnp.concatenate([attr, pa], 0)
        dcen = jnp.concatenate(
            [dcen, jnp.full((cp - C, kc), np.inf, jnp.float32)], 0)
    return cand, attr, dcen


def make_packgrid(points, attrs, origin, cell_size, dims, cap, kc, l1,
                  mask=None) -> PackGrid:
    cand, attr, dcen = build_packgrid(
        points, attrs, jnp.asarray(origin, jnp.float32),
        jnp.asarray(cell_size, jnp.float32), tuple(dims), int(cap),
        int(kc), mask=mask)
    l1 = int(l1)
    if l1 >= kc:
        dbound = jnp.full((cand.shape[0], 1), np.inf, jnp.float32)
    else:
        dbound = dcen[:, l1:l1 + 1]
    return PackGrid(cand, attr, dbound,
                    jnp.asarray(origin, jnp.float32),
                    jnp.asarray(cell_size, jnp.float32), tuple(dims),
                    int(cap), int(kc), l1, int(attrs.shape[1]))


# ---------------------------------------------------------------------------
# query-side binning
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims", "qcap", "n_extra"))
def bin_queries(points, bin_positions, origin, cell_size,
                dims: Tuple[int, int, int], qcap: int,
                extra=None, n_extra: int = 0, mask=None):
    """Bin queries by `bin_positions` (typically T_bin @ points) while
    storing ORIGINAL `points` coordinates. Empty slots are filled with
    the cell center so kernel-side phase bounds stay tight.

    Returns (qsoa [Cp,3,qcap], qextra [Cp,n_extra,qcap] | None,
             qidx [Cp,qcap] int32).
    """
    Gx, Gy, Gz = dims
    C = Gx * Gy * Gz
    keys = _cell_keys(bin_positions, origin, cell_size, dims, mask)
    channels = [points[:, 0], points[:, 1], points[:, 2]]
    if n_extra:
        channels += [extra[:, i] for i in range(n_extra)]
    fill = [jnp.float32(np.inf)] * 3 + [jnp.float32(0.0)] * n_extra
    binned, index = _bin_channels(keys, channels, C, qcap, fill)
    lin = jnp.arange(C, dtype=jnp.int32)
    ccz = (lin % Gz).astype(jnp.float32)
    ccy = ((lin // Gz) % Gy).astype(jnp.float32)
    ccx = (lin // (Gz * Gy)).astype(jnp.float32)
    centers = jnp.stack([ccx, ccy, ccz], -1) + 0.5
    centers = origin + centers * cell_size  # [C,3]
    empty = ~jnp.isfinite(binned[0])
    qs = [jnp.where(empty, centers[:, i:i + 1], binned[i])
          for i in range(3)]
    qsoa = jnp.stack(qs, 1)  # [C, 3, qcap]
    qextra = jnp.stack(binned[3:], 1) if n_extra else None
    cp = padded_cells(dims)
    if cp > C:
        padc = jnp.broadcast_to(
            jnp.asarray(origin).reshape(1, 3, 1),
            (cp - C, 3, qcap)).astype(jnp.float32)
        qsoa = jnp.concatenate([qsoa, padc], 0)
        index = jnp.concatenate(
            [index, jnp.full((cp - C, qcap), INVALID_INDEX, jnp.int32)], 0)
        if n_extra:
            qextra = jnp.concatenate(
                [qextra, jnp.zeros((cp - C, n_extra, qcap))], 0)
    return qsoa, qextra, index


def prep_queries(qsoa, T, centers=None):
    """Per-iteration XLA pass: transformed coords + |q|^2 + d(q,center)
    rows -> [Cp, 8, qcap] (rows tx,ty,tz,qn,dqc,0,0,0). Fused by XLA
    with whatever surrounds it; the kernel itself never transforms."""
    R = T[:3, :3]
    t = T[:3, 3]
    tx = R[0, 0] * qsoa[:, 0] + R[0, 1] * qsoa[:, 1] \
        + R[0, 2] * qsoa[:, 2] + t[0]
    ty = R[1, 0] * qsoa[:, 0] + R[1, 1] * qsoa[:, 1] \
        + R[1, 2] * qsoa[:, 2] + t[1]
    tz = R[2, 0] * qsoa[:, 0] + R[2, 1] * qsoa[:, 1] \
        + R[2, 2] * qsoa[:, 2] + t[2]
    qn = tx * tx + ty * ty + tz * tz
    zero = jnp.zeros_like(tx)
    if centers is None:
        dqc = zero
    else:
        dqc = jnp.sqrt((tx - centers[:, 0:1]) ** 2
                       + (ty - centers[:, 1:2]) ** 2
                       + (tz - centers[:, 2:3]) ** 2)
    return jnp.stack([tx, ty, tz, qn, dqc, zero, zero, zero], 1)


def _cell_centers(dims, origin, cell_size, cp):
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
# the query kernel
# ---------------------------------------------------------------------------

def _make_query_kernel(L1: int, KC: int, A: int, T: int,
                       two_phase: bool):
    """q [T,8,qcap], cand [T,4,KC], attr [T,A,KC], dbound [T,1]
    -> od2 [T,qcap], oattr [T,A,qcap]."""

    def kern(r2_ref, q_ref, c_ref, a_ref, db_ref, od_ref, oa_ref):
        r2 = r2_ref[0, 0]
        tx = q_ref[:, 0, :]
        ty = q_ref[:, 1, :]
        tz = q_ref[:, 2, :]
        qn = q_ref[:, 3, :]

        def score(lo, hi):
            return c_ref[:, 3, lo:hi][:, None, :] \
                + tx[:, :, None] * c_ref[:, 0, lo:hi][:, None, :] \
                + ty[:, :, None] * c_ref[:, 1, lo:hi][:, None, :] \
                + tz[:, :, None] * c_ref[:, 2, lo:hi][:, None, :]

        def fetch(v, m, lo, hi):
            eq = v <= m[:, :, None]
            return [jnp.max(jnp.where(eq, a_ref[:, ch, lo:hi][:, None, :],
                                      jnp.float32(-np.inf)), axis=-1)
                    for ch in range(A)]

        v1 = score(0, L1)
        m1 = jnp.min(v1, axis=-1)
        a1 = fetch(v1, m1, 0, L1)
        d2 = m1 + qn
        od_ref[:] = jnp.where(d2 <= r2, d2, jnp.float32(np.inf))
        for ch in range(A):
            oa_ref[:, ch, :] = a1[ch]

        if two_phase:
            # phase-2 needed iff some winner could still hide past lane
            # L1: its center distance would be <= min(best, r) + d(q, c)
            dqc = q_ref[:, 4, :]
            best = jnp.sqrt(jnp.maximum(d2, 0.0))
            need = jnp.any(jnp.minimum(best, jnp.sqrt(r2)) + dqc
                           >= db_ref[:, 0:1])

            @pl.when(need)
            def _():
                v2 = score(L1, KC)
                m2 = jnp.min(v2, axis=-1)
                better = m2 < m1
                eq2 = (v2 <= m2[:, :, None]) & better[:, :, None]
                d2n = m2 + qn
                od_ref[:] = jnp.where(
                    better, jnp.where(d2n <= r2, d2n, jnp.float32(np.inf)),
                    od_ref[:])
                for ch in range(A):
                    f2 = jnp.max(
                        jnp.where(eq2, a_ref[:, ch, L1:KC][:, None, :],
                                  jnp.float32(-np.inf)), axis=-1)
                    oa_ref[:, ch, :] = jnp.where(better, f2,
                                                 oa_ref[:, ch, :])

    return kern


def _query_pallas(grid: PackGrid, q8, r2, interpret=False):
    cp, _, qcap = q8.shape
    KC = grid.kc
    L1 = grid.l1
    A = grid.attr.shape[1]
    two_phase = L1 < KC
    T = _pick_tile(cp, max(L1, KC - L1) if two_phase else KC)
    kern = _make_query_kernel(L1, KC, A, T, two_phase)
    return pl.pallas_call(
        kern,
        grid=(cp // T,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, 8, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4, KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, A, KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, qcap), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, A, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, qcap), jnp.float32),
            jax.ShapeDtypeStruct((cp, A, qcap), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(r2, jnp.float32).reshape(1, 1), q8, grid.cand,
      grid.attr, grid.dbound)


def _query_xla(grid: PackGrid, q8, r2):
    """Reference semantics on any backend (single phase, full KC)."""
    cp, _, qcap = q8.shape
    A = grid.attr.shape[1]
    T = _pick_tile(cp, grid.kc)

    def body(args):
        q, c, a = args
        v = c[:, 3, None, :] \
            + q[:, 0, :, None] * c[:, 0, None, :] \
            + q[:, 1, :, None] * c[:, 1, None, :] \
            + q[:, 2, :, None] * c[:, 2, None, :]
        m = jnp.min(v, -1)
        eq = v <= m[:, :, None]
        d2 = m + q[:, 3, :]
        od = jnp.where(d2 <= r2, d2, jnp.inf)
        oa = jnp.stack([
            jnp.max(jnp.where(eq, a[:, ch, None, :], -jnp.inf), -1)
            for ch in range(A)], 1)
        return od, oa

    n = cp // T
    od, oa = jax.lax.map(
        body, (q8.reshape(n, T, 8, qcap),
               grid.cand.reshape(n, T, 4, grid.kc),
               grid.attr.reshape(n, T, A, grid.kc)))
    return od.reshape(cp, qcap), oa.reshape(cp, A, qcap)


@partial(jax.jit, static_argnames=("use_pallas",))
def query_packed(grid: PackGrid, q8, radius,
                 use_pallas: Optional[bool] = None):
    """Correspondence search over pre-binned, pre-transformed queries.

    Returns (d2 [Cp, qcap] — +inf when no neighbor within radius,
             attr [Cp, A, qcap] — winner channels, A-1 = original idx).
    """
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas == "interpret":
        return _query_pallas(grid, q8, r2, interpret=True)
    fn = _query_pallas if use_pallas else _query_xla
    return fn(grid, q8, r2)


# ---------------------------------------------------------------------------
# standalone 1-NN API (parity with rollgrid.query_nn_rollgrid)
# ---------------------------------------------------------------------------

def plan_for_cloud(points_np, radius, **kw):
    return plan_packgrid(points_np, radius, margin=0.0, **kw)


@partial(jax.jit, static_argnames=("qcap", "use_pallas"))
def query_nn_packgrid(grid: PackGrid, queries, radius, qcap: int,
                      query_mask=None,
                      use_pallas: Optional[bool] = None):
    """1-NN within `radius` for a flat [Q,3] query set:
    (index [Q] int32 or -1, dist2 [Q])."""
    Q = queries.shape[0]
    qsoa, _, qidx = bin_queries(
        queries, queries, grid.origin, grid.cell_size, grid.dims, qcap,
        mask=query_mask)
    centers = _cell_centers(grid.dims, grid.origin, grid.cell_size,
                            qsoa.shape[0])
    q8 = prep_queries(qsoa, jnp.eye(4, dtype=jnp.float32), centers)
    d2, attr = query_packed(grid, q8, radius, use_pallas=use_pallas)
    win = -attr[:, grid.nch, :]  # negated index channel
    ok = jnp.isfinite(d2)
    idx = jnp.where(ok, win, float(INVALID_INDEX)).astype(jnp.int32)
    flat_q = qidx.reshape(-1)
    okq = flat_q >= 0
    slot = jnp.where(okq, flat_q, Q)
    out_idx = jnp.full((Q + 1,), INVALID_INDEX, jnp.int32).at[slot].set(
        jnp.where(okq, idx.reshape(-1), INVALID_INDEX), mode="drop")
    out_d2 = jnp.full((Q + 1,), jnp.inf, jnp.float32).at[slot].set(
        jnp.where(okq, d2.reshape(-1), jnp.inf), mode="drop")
    return out_idx[:Q], out_d2[:Q]
