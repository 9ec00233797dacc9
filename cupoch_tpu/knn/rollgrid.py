"""Dense roll-grid nearest-neighbor search — the TPU-first hot path.

reference rationale: cupoch's ICP correspondence is a per-query FLANN
kd-tree walk (knn/kdtree_flann.inl) — pointer chasing that maps to XLA
as giant random gathers (~160M rows/s on v5e, measured). This module
replaces gathers with layout:

1. build (once per target cloud): points are binned into a dense
   [Gx·Gy·Gz, cap] cell array (cell edge = search radius, one ghost
   shell on every face) and the 27-cell neighborhood of every cell is
   assembled with `jnp.roll` — full-bandwidth copies, ZERO gathers —
   into an SoA candidate tensor [C, 3, KC] whose lane dimension is the
   candidate axis (128-aligned).
2. query (each ICP iteration): queries are re-binned (argsort +
   scatter, ~2 ms per 1M keys) and a fused Pallas kernel computes the
   [qcap, KC] squared distances and their argmin per cell entirely in
   VMEM — the distance tensor never touches HBM. A pure-XLA fallback
   runs the same math for CPU tests.

Capacity discipline: cells hold ≤ cap points; overflow rows are
dropped (callers see -1), the padded-neighbor semantics of the
reference's [N, max_nn] outputs (SURVEY.md §2.2).
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class RollGrid:
    """Registered as a pytree with `dims` static so jitted consumers
    keep the grid shape at trace time."""

    def __init__(self, cand, cand_idx, origin, cell_size,
                 dims: Tuple[int, int, int], cap: int):
        self.cand = cand           # [C, 3, KC] neighborhood coords (SoA)
        self.cand_idx = cand_idx   # [C, KC] original indices (-1 empty)
        self.origin = origin       # [3] incl. ghost shell
        self.cell_size = cell_size
        self.dims = tuple(dims)    # static, ghost shell included
        self.cap = int(cap)        # static per-cell capacity


def _rollgrid_flatten(g):
    return (g.cand, g.cand_idx, g.origin, g.cell_size), (g.dims, g.cap)


def _rollgrid_unflatten(aux, leaves):
    return RollGrid(*leaves, aux[0], aux[1])


jax.tree_util.register_pytree_node(RollGrid, _rollgrid_flatten,
                                   _rollgrid_unflatten)


def plan_rollgrid(points: np.ndarray, radius: float,
                  max_cells: int = 2_000_000,
                  cap_limit: int = 128,
                  cap_percentile: float = 99.5,
                  mem_budget_bytes: int = 3 << 30) -> Optional[dict]:
    """Host-side sizing: grid dims (with ghost shell), origin, cap.

    Returns None when a dense grid is unreasonable for this cloud
    (degenerate extent or too many cells); callers then fall back to
    the hash-grid path. cap is the `cap_percentile` of the per-cell
    occupancy (not the max): the padded-compute cost scales with cap²,
    and dropping the overflow tail of the densest cells costs ICP a
    fraction of a percent of correspondences. Pass 100 for exactness.
    cap is rounded up to a multiple of 8 to keep the compile cache
    small across similar clouds.
    """
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(-1)
    if not finite.any():
        return None
    lo = pts[finite].min(0).astype(np.float64)
    hi = pts[finite].max(0).astype(np.float64)
    cell = float(radius)
    if cell <= 0:
        return None
    dims_core = np.maximum(1, np.ceil((hi - lo) / cell + 1e-6).astype(int))
    # ghost shell +2; round odd dims up so every dim is even => the
    # cell count is divisible by 8, which the Pallas tiling requires
    dims = tuple(int(d) + 2 + (int(d) % 2) for d in dims_core)
    n_cells = int(np.prod(dims))
    if n_cells > max_cells:
        return None
    cidx = np.floor((pts[finite] - lo) / cell).astype(np.int64)
    cidx = np.minimum(cidx, dims_core - 1)
    lin = (cidx[:, 0] * dims_core[1] + cidx[:, 1]) * dims_core[2] \
        + cidx[:, 2]
    counts = np.bincount(lin, minlength=int(np.prod(dims_core)))
    occupied = counts[counts > 0]
    cap = int(np.percentile(occupied, cap_percentile)) \
        if occupied.size else 8
    if cap > cap_limit:
        # extremely dense cells (e.g. surface clouds at coarse radius):
        # the padded per-cell scheme would waste cap² compute — let the
        # caller fall back to the hash-grid path instead
        return None
    cap = max(8, _round_up(cap, 8))
    # the precomputed neighborhood tensor is C x 4 channels x 27*cap
    # f32 — refuse plans whose resident grid would crowd out HBM
    kc = _round_up(27 * cap, 128)
    grid_bytes = n_cells * 4 * kc * 4
    if grid_bytes > mem_budget_bytes:
        return None
    origin = (lo - cell).astype(np.float32)
    return {"dims": dims, "origin": origin, "cap": cap,
            "cell_size": np.float32(cell)}


def _bin_by_key(keys, points, n_bins: int, cap: int):
    """Scatter points into [n_bins, cap] padded bins keyed by
    ``keys`` (int32 in [0, n_bins); >= n_bins drops the row). Returns
    (soa [3, n_bins, cap] inf-padded, index [n_bins, cap] -1-padded).

    Coordinates are scattered as three 1-D scatters — a single [N, 3]
    row scatter lays out 3-wide rows across 128 lanes and runs ~6x
    slower on TPU (measured)."""
    N = points.shape[0]
    # rank of each point within its bin: one stable multi-operand sort
    # carries the payloads (no post-sort gathers), then subtract the
    # segment start
    pos = jnp.arange(N, dtype=jnp.int32)
    keys_sorted, order, px, py, pz = jax.lax.sort(
        (keys, pos, points[:, 0], points[:, 1], points[:, 2]),
        num_keys=1, is_stable=True)
    # rank within segment via a cummax scan over segment starts — much
    # cheaper than a scatter-min + gather round-trip
    boundary = jnp.concatenate([
        jnp.ones(1, bool), keys_sorted[1:] != keys_sorted[:-1]])
    seg_start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, pos, 0))
    rank = pos - seg_start_pos
    ok = (keys_sorted < n_bins) & (rank < cap)
    slot = jnp.where(ok, keys_sorted * cap + rank, n_bins * cap)
    coords = []
    for arr in (px, py, pz):
        coords.append(jnp.full(n_bins * cap + 1, jnp.inf, jnp.float32)
                      .at[slot].set(arr, mode="drop")[:-1])
    soa = jnp.stack(coords, 0).reshape(3, n_bins, cap)
    index = jnp.full(n_bins * cap + 1, INVALID_INDEX, jnp.int32) \
        .at[slot].set(order, mode="drop")[:-1].reshape(n_bins, cap)
    return soa, index


def _cell_keys(points, origin, cell_size, dims, mask=None):
    """Linear cell id per point; out-of-grid/masked rows get C."""
    C = dims[0] * dims[1] * dims[2]
    cell = jnp.floor((points - origin) / cell_size).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
    if mask is not None:
        inb = inb & mask
    lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    return jnp.where(inb, lin, C)


def _bin_points(points, origin, cell_size, dims, cap, mask=None):
    """Dense-grid binning: scatter points into every cell of the grid."""
    C = dims[0] * dims[1] * dims[2]
    lin = _cell_keys(points, origin, cell_size, dims, mask)
    return _bin_by_key(lin, points, C, cap)


@partial(jax.jit, static_argnames=("dims", "cap"))
def build_rollgrid(points, origin, cell_size,
                   dims: Tuple[int, int, int], cap: int,
                   mask=None) -> RollGrid:
    """Bins the target cloud and precomputes the 27-cell neighborhood
    tensor once (reused across every query / ICP iteration)."""
    Gx, Gy, Gz = dims
    soa, index = _bin_points(points, origin, cell_size, dims, cap, mask)
    # empty slots park at +BIG so unmasked distance math stays finite
    big = jnp.float32(3.0e18)
    soa = jnp.where(jnp.isfinite(soa), soa, big)
    cells5 = soa.reshape(3, Gx, Gy, Gz, cap)
    index4 = index.reshape(Gx, Gy, Gz, cap)
    cand, cidx = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cand.append(jnp.roll(cells5, (dx, dy, dz), (1, 2, 3)))
                cidx.append(jnp.roll(index4, (dx, dy, dz), (0, 1, 2)))
    C = Gx * Gy * Gz
    cand = jnp.concatenate([c.reshape(3, C, cap) for c in cand], -1)
    cidx = jnp.concatenate([i.reshape(C, cap) for i in cidx], 1)
    KC = _round_up(27 * cap, 128)
    pad = KC - 27 * cap
    cand_soa = jnp.moveaxis(
        jnp.pad(cand, ((0, 0), (0, 0), (0, pad)), constant_values=big),
        0, 1)  # [C, 3, KC]
    cidx = jnp.pad(cidx, ((0, 0), (0, pad)),
                   constant_values=INVALID_INDEX)
    return RollGrid(cand_soa, cidx, jnp.asarray(origin, jnp.float32),
                    jnp.asarray(cell_size, jnp.float32), dims, cap)


# ---------------------------------------------------------------------------
# fused distance+argmin reduce (Pallas) with an XLA fallback
# ---------------------------------------------------------------------------

def _nn_reduce_kernel(r2_ref, q_ref, c_ref, ci_ref, oi_ref, od_ref):
    """Per cell-tile: d2[q, k] = Σ_d (q_d - c_d)², masked argmin over
    the lane (candidate) axis. The d2 tensor lives only in VMEM."""
    ci = ci_ref[:]    # [TC, KC]
    r2 = r2_ref[0, 0]
    # static-index ref slices (a traced mid-axis index would lower to
    # an unsupported >2D gather in Mosaic)
    dx = q_ref[:, 0, :][:, :, None] - c_ref[:, 0, :][:, None, :]
    dy = q_ref[:, 1, :][:, :, None] - c_ref[:, 1, :][:, None, :]
    dz = q_ref[:, 2, :][:, :, None] - c_ref[:, 2, :][:, None, :]
    d2 = dx * dx + dy * dy + dz * dz          # [TC, qcap, KC]
    # empty slots sit at +BIG so their distances blow past r2 — no
    # separate validity compare needed; index selection is a masked
    # min (ties -> smallest candidate index, matching brute force)
    bd2 = jnp.min(d2, axis=-1)                # [TC, qcap]
    sel = (d2 <= bd2[..., None]) & (d2 <= r2)
    bidx = jnp.min(jnp.where(sel, ci[:, None, :], jnp.int32(1 << 30)), -1)
    ok = bd2 <= r2
    oi_ref[:] = jnp.where(ok, bidx, INVALID_INDEX)
    od_ref[:] = jnp.where(ok, bd2, jnp.float32(jnp.inf))


def _nn_reduce_pallas(q_soa, cand, cidx, r2, tile_cells: int):
    C, _, qcap = q_soa.shape
    KC = cand.shape[2]
    grid = (C // tile_cells,)
    return pl.pallas_call(
        _nn_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_cells, 3, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cells, 3, KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cells, KC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_cells, qcap), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cells, qcap), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, qcap), jnp.int32),
            jax.ShapeDtypeStruct((C, qcap), jnp.float32),
        ],
    )(jnp.asarray(r2, jnp.float32).reshape(1, 1), q_soa, cand, cidx)


def _nn_reduce_xla(q_soa, cand, cidx, r2, tile_cells: int):
    C, _, qcap = q_soa.shape

    def body(args):
        q, c, ci = args
        dx = q[:, 0, :, None] - c[:, 0, None, :]
        dy = q[:, 1, :, None] - c[:, 1, None, :]
        dz = q[:, 2, :, None] - c[:, 2, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        bd2 = jnp.min(d2, -1)
        sel = (d2 <= bd2[..., None]) & (d2 <= r2)
        bidx = jnp.min(jnp.where(sel, ci[:, None, :], jnp.int32(1 << 30)),
                       -1)
        ok = bd2 <= r2
        return (jnp.where(ok, bidx, INVALID_INDEX),
                jnp.where(ok, bd2, jnp.inf))

    n_tiles = C // tile_cells
    bidx, bd2 = jax.lax.map(
        body, (q_soa.reshape(n_tiles, tile_cells, 3, qcap),
               cand.reshape(n_tiles, tile_cells, 3, cand.shape[2]),
               cidx.reshape(n_tiles, tile_cells, cidx.shape[1])))
    return bidx.reshape(C, qcap), bd2.reshape(C, qcap)


def _pick_tile(C: int, qcap: int, KC: int) -> int:
    """Largest power-of-two multiple-of-8 tile whose d2 block stays
    within ~2 MB of VMEM and divides C. Mosaic requires the
    second-to-last block dim be a multiple of 8; plan_rollgrid makes
    every grid dim even so C divides by 8. Returns 0 when no legal
    tile exists (callers fall back to the XLA reduce)."""
    if C % 8 != 0:
        return 0
    budget = max(1, (1 << 19) // max(1, qcap * KC))  # f32 elements
    tile = 8
    while tile * 2 <= budget and C % (tile * 2) == 0:
        tile *= 2
    return tile


@partial(jax.jit, static_argnames=("qcap", "use_pallas"))
def query_nn_rollgrid(grid: RollGrid, queries, radius,
                      query_mask=None, qcap: int = 0,
                      use_pallas: Optional[bool] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """1-NN within ``radius``: (index [Q] int32 or -1, dist2 [Q])."""
    if qcap == 0:
        qcap = grid.cap
    Q = queries.shape[0]
    C = grid.cand.shape[0]
    KC = grid.cand.shape[2]
    r2 = jnp.float32(radius) ** 2 if not isinstance(radius, jax.Array) \
        else jnp.asarray(radius, jnp.float32) ** 2
    q_soa_raw, q_index = _bin_points(queries, grid.origin, grid.cell_size,
                                     grid.dims, qcap, query_mask)
    big = jnp.float32(1.0e18)
    q_soa = jnp.moveaxis(
        jnp.where(jnp.isfinite(q_soa_raw), q_soa_raw, big), 0, 1
    )  # [C, 3, qcap]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    tile = _pick_tile(C, qcap, KC)
    if tile == 0:
        use_pallas = False
        tile = next(t for t in (4, 2, 1) if C % t == 0)
    reduce_fn = _nn_reduce_pallas if use_pallas else _nn_reduce_xla
    bidx, bd2 = reduce_fn(q_soa, grid.cand, grid.cand_idx, r2, tile)
    flat_qidx = q_index.reshape(-1)
    ok = flat_qidx >= 0
    slot = jnp.where(ok, flat_qidx, Q)
    out_idx = jnp.full((Q + 1,), INVALID_INDEX, jnp.int32).at[slot].set(
        jnp.where(ok, bidx.reshape(-1), INVALID_INDEX), mode="drop")
    out_d2 = jnp.full((Q + 1,), jnp.inf, jnp.float32).at[slot].set(
        jnp.where(ok, bd2.reshape(-1), jnp.inf), mode="drop")
    return out_idx[:Q], out_d2[:Q]
