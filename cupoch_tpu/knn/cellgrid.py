"""Active-cell compacted grid NN — the sparse-cloud counterpart of the
dense roll grid (knn/rollgrid.py).

Surface scans (e.g. the bundled fragment.pcd) occupy a tiny fraction
of their bounding grid: a dense [G³, cap] layout wastes HBM on empty
cells. Here only the *active* set — occupied cells dilated by one ring
so that every query with a non-empty neighborhood has a slot — gets
storage:

- a dense int32 LUT [G³] maps linear cell id → active slot (-1
  elsewhere); it costs 4 bytes/cell instead of 16·KC,
- points are binned into [A, cap] by slot,
- each active slot's 27-neighborhood candidates are gathered ONCE at
  build into [A, 3, KC] (SoA, lane-aligned),
- queries map to slots with one LUT gather each and the same fused
  Pallas distance+argmin reduce as the roll grid does the rest.

Per-query work is therefore one int gather + its share of a dense
[qcap, KC] VPU tile — no per-query candidate gathers.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rollgrid import (
    INVALID_INDEX,
    _bin_by_key,
    _cell_keys,
    _nn_reduce_pallas,
    _nn_reduce_xla,
    _pick_tile,
    _round_up,
)


class CellGrid:
    """Pytree with (dims, cap, n_active) static."""

    def __init__(self, cand, cand_idx, lut, origin, cell_size,
                 dims: Tuple[int, int, int], cap: int, n_active: int):
        self.cand = cand           # [A, 3, KC]
        self.cand_idx = cand_idx   # [A, KC]
        self.lut = lut             # [G³ + 1] int32 cell -> slot (-1)
        self.origin = origin
        self.cell_size = cell_size
        self.dims = tuple(dims)
        self.cap = int(cap)
        self.n_active = int(n_active)


def _cellgrid_flatten(g):
    return ((g.cand, g.cand_idx, g.lut, g.origin, g.cell_size),
            (g.dims, g.cap, g.n_active))


def _cellgrid_unflatten(aux, leaves):
    return CellGrid(*leaves, aux[0], aux[1], aux[2])


jax.tree_util.register_pytree_node(CellGrid, _cellgrid_flatten,
                                   _cellgrid_unflatten)

_OFFSETS = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(27, 3)


def plan_cellgrid(points: np.ndarray, radius: float,
                  max_cells: int = 64_000_000,
                  cap_limit: int = 128,
                  cap_percentile: float = 99.5,
                  mem_budget_bytes: int = 3 << 30) -> Optional[dict]:
    """Host-side sizing: dims/origin, cap, and the active cell list
    (occupied cells dilated by one ring, in linear-id order)."""
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(-1)
    if not finite.any() or radius <= 0:
        return None
    lo = pts[finite].min(0).astype(np.float64)
    hi = pts[finite].max(0).astype(np.float64)
    cell = float(radius)
    dims_core = np.maximum(1, np.ceil((hi - lo) / cell + 1e-6).astype(int))
    dims = tuple(int(d) + 2 for d in dims_core)
    n_cells = int(np.prod(dims))
    if n_cells > max_cells:
        return None
    origin = (lo - cell).astype(np.float32)
    cidx = np.floor((pts[finite] - origin) / cell).astype(np.int64)
    cidx = np.clip(cidx, 0, np.asarray(dims) - 1)
    lin = (cidx[:, 0] * dims[1] + cidx[:, 1]) * dims[2] + cidx[:, 2]
    counts = np.bincount(lin, minlength=n_cells)
    occupied_lin = np.nonzero(counts)[0]
    occ = counts[occupied_lin]
    cap = int(np.percentile(occ, cap_percentile)) if occ.size else 8
    if cap > cap_limit:
        return None
    cap = max(8, _round_up(cap, 8))
    # dilate occupancy by one ring (unique of occupied + 27 offsets)
    oz = occupied_lin % dims[2]
    oy = (occupied_lin // dims[2]) % dims[1]
    ox = occupied_lin // (dims[1] * dims[2])
    cells3 = np.stack([ox, oy, oz], -1)  # [O, 3]
    nbr = (cells3[:, None, :] + _OFFSETS[None]).reshape(-1, 3)
    inb = ((nbr >= 0) & (nbr < np.asarray(dims))).all(-1)
    nbr_lin = (nbr[inb][:, 0] * dims[1] + nbr[inb][:, 1]) * dims[2] \
        + nbr[inb][:, 2]
    active = np.unique(nbr_lin).astype(np.int64)
    n_active = _round_up(max(8, active.size), 8)
    kc = _round_up(27 * cap, 128)
    grid_bytes = n_active * 4 * kc * 4 + n_cells * 4
    if grid_bytes > mem_budget_bytes:
        return None
    active_pad = np.full(n_active, n_cells, np.int64)
    active_pad[: active.size] = active
    return {"dims": dims, "origin": origin, "cap": cap,
            "cell_size": np.float32(cell),
            "active": active_pad.astype(np.int32),
            "n_active": n_active}


@partial(jax.jit, static_argnames=("dims", "cap", "n_active"))
def build_cellgrid(points, origin, cell_size, active,
                   dims: Tuple[int, int, int], cap: int, n_active: int,
                   mask=None) -> CellGrid:
    """Bins the target and gathers each active cell's 27-neighborhood
    candidates once (amortized across all queries / ICP iterations)."""
    C = dims[0] * dims[1] * dims[2]
    A = n_active
    lut = jnp.full(C + 2, INVALID_INDEX, jnp.int32).at[active].set(
        jnp.arange(A, dtype=jnp.int32), mode="drop")
    lin = _cell_keys(points, origin, cell_size, dims, mask)
    slot = lut[lin]
    slot = jnp.where(slot < 0, A, slot)  # shouldn't happen for targets
    soa, index = _bin_by_key(slot, points, A, cap)
    big = jnp.float32(3.0e18)
    soa = jnp.where(jnp.isfinite(soa), soa, big)
    # neighborhood gather: linear ids of each active cell's 27 nbrs
    az = active % dims[2]
    ay = (active // dims[2]) % dims[1]
    ax = active // (dims[1] * dims[2])
    offs = jnp.asarray(_OFFSETS, jnp.int32)  # [27, 3]
    nx = ax[:, None] + offs[None, :, 0]
    ny = ay[:, None] + offs[None, :, 1]
    nz = az[:, None] + offs[None, :, 2]
    inb = ((nx >= 0) & (nx < dims[0]) & (ny >= 0) & (ny < dims[1])
           & (nz >= 0) & (nz < dims[2]))
    nbr_lin = jnp.where(inb, (nx * dims[1] + ny) * dims[2] + nz, C)
    nbr_slot = lut[nbr_lin]                      # [A, 27]
    valid_n = nbr_slot >= 0
    nbr_slot = jnp.clip(nbr_slot, 0, A - 1)
    j = jnp.arange(cap, dtype=jnp.int32)
    flat = nbr_slot[..., None] * cap + j         # [A, 27, cap]
    flat = jnp.where(valid_n[..., None], flat, A * cap)
    KC = _round_up(27 * cap, 128)
    pad = KC - 27 * cap
    chans = []
    for k in range(3):
        src = jnp.concatenate([soa[k].reshape(-1), jnp.full(1, big)])
        chans.append(jnp.pad(src[flat].reshape(A, 27 * cap),
                             ((0, 0), (0, pad)), constant_values=big))
    cand = jnp.stack(chans, 1)                   # [A, 3, KC]
    idx_src = jnp.concatenate([
        index.reshape(-1),
        jnp.full(1, INVALID_INDEX, jnp.int32)])
    cand_idx = jnp.pad(idx_src[flat].reshape(A, 27 * cap),
                       ((0, 0), (0, pad)),
                       constant_values=INVALID_INDEX)
    return CellGrid(cand, cand_idx, lut,
                    jnp.asarray(origin, jnp.float32),
                    jnp.asarray(cell_size, jnp.float32),
                    dims, cap, n_active)


@partial(jax.jit, static_argnames=("qcap", "use_pallas"))
def query_nn_cellgrid(grid: CellGrid, queries, radius,
                      query_mask=None, qcap: int = 0,
                      use_pallas: Optional[bool] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """1-NN within ``radius``: (index [Q] int32 or -1, dist2 [Q])."""
    if qcap == 0:
        qcap = grid.cap
    Q = queries.shape[0]
    A = grid.n_active
    KC = grid.cand.shape[2]
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    lin = _cell_keys(queries, grid.origin, grid.cell_size, grid.dims,
                     query_mask)
    slot = grid.lut[lin]
    slot = jnp.where(slot < 0, A, slot)  # inactive cell -> dropped
    q_soa_raw, q_index = _bin_by_key(slot, queries, A, qcap)
    big = jnp.float32(1.0e18)
    q_soa = jnp.moveaxis(
        jnp.where(jnp.isfinite(q_soa_raw), q_soa_raw, big), 0, 1)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    tile = _pick_tile(A, qcap, KC)
    if tile == 0:
        use_pallas = False
        tile = next(t for t in (4, 2, 1) if A % t == 0)
    reduce_fn = _nn_reduce_pallas if use_pallas else _nn_reduce_xla
    bidx, bd2 = reduce_fn(q_soa, grid.cand, grid.cand_idx, r2, tile)
    flat_qidx = q_index.reshape(-1)
    ok = flat_qidx >= 0
    out_slot = jnp.where(ok, flat_qidx, Q)
    out_idx = jnp.full((Q + 1,), INVALID_INDEX, jnp.int32).at[
        out_slot].set(jnp.where(ok, bidx.reshape(-1), INVALID_INDEX),
                      mode="drop")
    out_d2 = jnp.full((Q + 1,), jnp.inf, jnp.float32).at[out_slot].set(
        jnp.where(ok, bd2.reshape(-1), jnp.inf), mode="drop")
    return out_idx[:Q], out_d2[:Q]
