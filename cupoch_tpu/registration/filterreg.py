"""FilterReg probabilistic GMM registration
(reference: src/cupoch/registration/filterreg.h:31-66 + filterreg.cu +
permutohedral.h:92/.inl).

TPU-native re-design: the reference accelerates the Gaussian transform
(per model point: Σ w·x, Σ w, Σ w·xᵀx over target points) with a
permutohedral-lattice hash map. Hash maps are hostile to the TPU; the
same transform is computed here as a tiled dense kernel — each [T,3]
model tile forms exp-distance weights against all target points and
reduces the three moments with matmuls, which puts the whole E-step on
the MXU. The EM loop itself is a `lax.while_loop`, so a full
registration is a single device program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from ..utility.shape import bucket_size, pad_axis0, valid_mask
from .kabsch import kabsch_weighted

_OUTLIER_CONSTANT = 0.2  # permutohedral.h:119
_TILE = 4096


class FilterRegOption:
    """reference: filterreg.h:45-62."""

    def __init__(self, sigma_initial: float = 0.1, sigma_min: float = 1e-4,
                 relative_likelihood: float = 1e-6,
                 max_iteration: int = 30):
        self.sigma_initial = float(sigma_initial)
        self.sigma_min = float(sigma_min)
        self.relative_likelihood = float(relative_likelihood)
        self.max_iteration = int(max_iteration)


class FilterRegResult:
    """reference: filterreg.h:30-43."""

    def __init__(self, transformation=None, likelihood: float = 0.0):
        self.transformation = (np.eye(4, dtype=np.float32)
                               if transformation is None
                               else np.asarray(transformation, np.float32))
        self.likelihood = float(likelihood)


def _gaussian_moments(model, tgt, tgt_mask, inv_2s2):
    """Tiled Gaussian transform: per model point the moments
    (M0, M1, M2) over all target points (the lattice's
    compute_target_kernel, permutohedral.inl:92-123, made dense)."""
    n = model.shape[0]
    pad_to = ((n + _TILE - 1) // _TILE) * _TILE
    model_p = jnp.pad(model, ((0, pad_to - n), (0, 0)))
    tiles = model_p.reshape(-1, _TILE, 3)
    x2 = jnp.sum(tgt * tgt, -1)  # [M]

    def body(tile):
        # [T, M] squared distances via the matmul expansion
        d2 = (jnp.sum(tile * tile, -1)[:, None] + x2[None, :]
              - 2.0 * tile @ tgt.T)
        w = jnp.exp(-d2 * inv_2s2)
        w = jnp.where(tgt_mask[None, :], w, 0.0)
        m0 = jnp.sum(w, -1)            # [T]
        m1 = w @ tgt                   # [T, 3]
        m2 = w @ x2                    # [T]
        return m0, m1, m2

    m0, m1, m2 = jax.lax.map(body, tiles)
    return (m0.reshape(-1)[:n], m1.reshape(-1, 3)[:n], m2.reshape(-1)[:n])


@partial(jax.jit, static_argnames=("max_iteration",))
def _filterreg_core(src, src_mask, tgt, tgt_mask, init_T, sigma_initial,
                    sigma_min, relative_likelihood, max_iteration: int):
    """Whole EM loop on device (RegistrationFilterReg,
    filterreg.cu:57-101)."""

    def e_step(model, sigma):
        inv_2s2 = 1.0 / (2.0 * sigma * sigma)
        m0, m1, m2 = _gaussian_moments(model, tgt, tgt_mask, inv_2s2)
        good = m0 >= 1e-2
        safe_m0 = jnp.maximum(m0, 1e-30)
        target_pt = jnp.where(good[:, None], m1 / safe_m0[:, None], 0.0)
        m2n = jnp.where(good, m2 / safe_m0, 0.0)
        weight = jnp.where(good, m0 / (m0 + _OUTLIER_CONSTANT), 0.0)
        weight = jnp.where(src_mask, weight, 0.0)
        return target_pt, weight, m2n

    def cond(state):
        i, _, _, _, delta = state
        return (i < max_iteration) & (delta >= relative_likelihood)

    def step(state):
        i, T, sigma, likelihood, _ = state
        model = src @ T[:3, :3].T + T[:3, 3]
        target_pt, weight, m2 = e_step(model, sigma)
        update = kabsch_weighted(model, target_pt, weight)
        T_new = update @ T
        model_new = model @ update[:3, :3].T + update[:3, 3]
        # sigma update (ComputeSigma, permutohedral.inl:242-260)
        y2 = jnp.sum(model_new * model_new, -1)
        upper = jnp.sum(weight * (y2 - 2.0 * jnp.sum(target_pt * model_new,
                                                     -1) + m2))
        divisor = jnp.maximum(jnp.sum(weight), 1e-6)
        sigma_new = jnp.sqrt(jnp.maximum(upper / (divisor * 3.0), 0.0))
        use_new = jnp.isfinite(sigma_new) & (sigma_new > sigma_min)
        sigma = jnp.where(use_new, sigma_new, sigma)
        # likelihood (GetRegistrationResult, filterreg.cu:42-54)
        r = weight[:, None] * (model_new - target_pt)
        lik = jnp.sum(r * r)
        delta = jnp.abs(likelihood - lik)
        return i + 1, T_new, sigma, lik, delta

    init = (jnp.int32(0), init_T, sigma_initial, jnp.float32(0.0),
            jnp.float32(jnp.inf))
    _, T, _, likelihood, _ = jax.lax.while_loop(cond, step, init)
    return T, likelihood


def registration_filterreg(source, target, init=None,
                           option: Optional[FilterRegOption] = None
                           ) -> FilterRegResult:
    """reference: RegistrationFilterReg (filterreg.cu:57-101)."""
    if not source.has_points() or not target.has_points():
        console.log_error("Invalid source or target pointcloud.")
    option = option or FilterRegOption()
    init_T = (np.eye(4, dtype=np.float32) if init is None
              else np.asarray(init, np.float32))
    cap_s = bucket_size(len(source))
    cap_t = bucket_size(len(target))
    src = pad_axis0(jnp.asarray(source.points, jnp.float32), cap_s)
    tgt = pad_axis0(jnp.asarray(target.points, jnp.float32), cap_t)

    # linear-time grid E-step above the dense threshold
    if len(source) * len(target) > _GRID_THRESHOLD ** 2:
        from ..knn import rungrid as rg

        trunc = 3.0 * option.sigma_initial
        src_np = np.asarray(source.points)
        src_t = src_np @ init_T[:3, :3].T + init_T[:3, 3]
        plan = rg.plan_rungrid(np.asarray(target.points), trunc,
                               margin=0.25, query_points=src_t, nch=0)
        if plan is not None:
            grid = rg.make_rungrid(
                tgt, jnp.zeros((cap_t, 0), jnp.float32),
                plan["origin"], plan["cell_size"], plan["dims"],
                plan["cap"], mask=valid_mask(len(target), cap_t))
            T, lik = _filterreg_core_grid(
                src, valid_mask(len(source), cap_s), grid,
                jnp.asarray(init_T), jnp.float32(option.sigma_initial),
                jnp.float32(option.sigma_min),
                jnp.float32(option.relative_likelihood),
                jnp.float32(trunc), plan["rebin_margin"],
                plan["qcap"], option.max_iteration)
            return FilterRegResult(np.asarray(T), float(lik))

    T, lik = _filterreg_core(
        src, valid_mask(len(source), cap_s),
        tgt, valid_mask(len(target), cap_t),
        jnp.asarray(init_T), jnp.float32(option.sigma_initial),
        jnp.float32(option.sigma_min),
        jnp.float32(option.relative_likelihood), option.max_iteration)
    return FilterRegResult(np.asarray(T), float(lik))


# ---------------------------------------------------------------------------
# linear-time E-step over the run grid (permutohedral replacement)
# ---------------------------------------------------------------------------

_GRID_THRESHOLD = 20000


@partial(jax.jit, static_argnames=("qcap", "max_iteration", "use_pallas"))
def _filterreg_core_grid(src, src_mask, grid, init_T, sigma_initial,
                         sigma_min, relative_likelihood, trunc_radius,
                         rebin_margin, qcap: int, max_iteration: int,
                         use_pallas=None):
    """EM loop with the Gaussian transform computed by the run-grid
    moments kernel (knn/rungrid.gmm_moments): O(N + M) per iteration
    instead of the dense O(N*M), replacing the reference's
    permutohedral lattice (permutohedral.h:92, filterreg.cu). The
    truncation radius is 3*sigma_initial; sigma only shrinks during
    EM, so one grid serves the whole loop. Model points are re-binned
    only when accumulated motion exceeds the grid margin."""
    from ..knn import rungrid as rg
    from .fused_icp import _aabb_corners, _displacement_bound

    n_src = jnp.maximum(jnp.sum(src_mask), 1.0)
    corners = _aabb_corners(src, src_mask)

    def rebin(T):
        pos = src @ T[:3, :3].T + T[:3, 3]
        return rg.bin_queries(src, pos, grid.origin, grid.cell_size,
                              grid.dims, qcap, mask=src_mask)

    def e_step(T, sigma, qsoa, qidx):
        inv_2s2 = 1.0 / (2.0 * sigma * sigma)
        params = rg.make_params(T, trunc_radius ** 2, grid,
                                inv_2s2=inv_2s2)
        m0, M1, M2 = rg.gmm_moments(grid, qsoa, qidx, params,
                                    use_pallas=use_pallas)
        good = (m0 >= 1e-2) & (qidx >= 0)
        safe = jnp.maximum(m0, 1e-30)
        target_pt = jnp.where(good[..., None], M1 / safe[..., None], 0.0)
        m2n = jnp.where(good, M2 / safe, 0.0)
        weight = jnp.where(good, m0 / (m0 + _OUTLIER_CONSTANT), 0.0)
        return target_pt, weight, m2n

    def cond(state):
        i, *_, delta = state
        return (i < max_iteration) & (delta >= relative_likelihood)

    def step(state):
        i, T, T_bin, qsoa, qidx, sigma, likelihood, _ = state
        disp = _displacement_bound(T, T_bin, corners)
        qsoa, qidx, T_bin = jax.lax.cond(
            disp > rebin_margin, lambda _: rebin(T) + (T,),
            lambda _: (qsoa, qidx, T_bin), None)
        target_pt, weight, m2 = e_step(T, sigma, qsoa, qidx)
        # model points in bin order (original coords ride qsoa)
        q = jnp.moveaxis(qsoa[:, 0:3, :], 1, 2).reshape(-1, 3)
        model = q @ T[:3, :3].T + T[:3, 3]
        tp = target_pt.reshape(-1, 3)
        w = weight.reshape(-1)
        update = kabsch_weighted(model, tp, w)
        T_new = update @ T
        model_new = model @ update[:3, :3].T + update[:3, 3]
        y2 = jnp.sum(model_new * model_new, -1)
        upper = jnp.sum(w * (y2 - 2.0 * jnp.sum(tp * model_new, -1)
                             + m2.reshape(-1)))
        divisor = jnp.maximum(jnp.sum(w), 1e-6)
        sigma_new = jnp.sqrt(jnp.maximum(upper / (divisor * 3.0), 0.0))
        use_new = jnp.isfinite(sigma_new) & (sigma_new > sigma_min)
        sigma = jnp.where(use_new, sigma_new, sigma)
        r = w[:, None] * (model_new - tp)
        lik = jnp.sum(r * r)
        delta = jnp.abs(likelihood - lik)
        return i + 1, T_new, T_bin, qsoa, qidx, sigma, lik, delta

    qsoa0, qidx0 = rebin(init_T)
    init = (jnp.int32(0), init_T, init_T, qsoa0, qidx0, sigma_initial,
            jnp.float32(0.0), jnp.float32(jnp.inf))
    _, T, _, _, _, _, likelihood, _ = jax.lax.while_loop(cond, step,
                                                         init)
    return T, likelihood
