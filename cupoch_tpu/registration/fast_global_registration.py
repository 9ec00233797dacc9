"""Fast Global Registration (Zhou, Park, Koltun — ECCV 2016).

reference: src/cupoch/registration/fast_global_registration.{h,cu}
(fast_global_registration.h:40-96, fast_global_registration.cu:104-448).
The reference's pipeline — normalize, mutual feature-NN matching, random
tuple test, 64-iteration scaled Geman-McClure Gauss-Newton with
graduated non-convexity — maps cleanly to TPU: matching is two MXU
matmuls, the tuple test is one vectorised batch over `jax.random`
triplets, and the whole GNC optimisation is a single `lax.scan` (the
per-iteration weighted 6x6 system is a tiny fused reduction, so the
compiled loop never touches the host).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utility import console
from ..utility.eigen import solve_linear_system_psd
from ..utility.transforms import transform_points, transform_vector6_to_matrix4
from .feature import Feature, _feature_nn
from .registration import RegistrationResult, evaluate_registration


class FastGlobalRegistrationOption:
    """reference: fast_global_registration.h:40-96 (same defaults)."""

    def __init__(self,
                 division_factor: float = 1.4,
                 use_absolute_scale: bool = False,
                 decrease_mu: bool = True,
                 maximum_correspondence_distance: float = 0.025,
                 iteration_number: int = 64,
                 tuple_scale: float = 0.95,
                 maximum_tuple_count: int = 1000):
        self.division_factor = float(division_factor)
        self.use_absolute_scale = bool(use_absolute_scale)
        self.decrease_mu = bool(decrease_mu)
        self.maximum_correspondence_distance = float(
            maximum_correspondence_distance)
        self.iteration_number = int(iteration_number)
        self.tuple_scale = float(tuple_scale)
        self.maximum_tuple_count = int(maximum_tuple_count)


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------

@jax.jit
def _mutual_mask(nn_ij: jax.Array, nn_ji: jax.Array) -> jax.Array:
    """Cross check (fast_global_registration.cu:144-158): keep (i, j)
    pairs found by BOTH directions of feature 1-NN."""
    return nn_ji[nn_ij] == jnp.arange(nn_ij.shape[0], dtype=jnp.int32)


@partial(jax.jit, static_argnames=("n_trials",))
def _tuple_test(pts_i: jax.Array, pts_j: jax.Array, corres: jax.Array,
                scale: jax.Array, n_trials: int):
    """Random 3-tuples of correspondences must have consistent edge
    lengths in both clouds (compute_tuple_constraint_functor,
    fast_global_registration.cu:38-104). Returns ([3*n_trials, 2] pairs,
    [3*n_trials] keep-mask)."""
    ncorr = corres.shape[0]
    key = jax.random.PRNGKey(0)
    rand = jax.random.randint(key, (n_trials, 3), 0, ncorr)
    tri = corres[rand]                # [T,3,2]
    pi = pts_i[tri[..., 0]]           # [T,3,3]
    pj = pts_j[tri[..., 1]]
    li = jnp.linalg.norm(pi - jnp.roll(pi, -1, axis=1), axis=-1)  # [T,3]
    lj = jnp.linalg.norm(pj - jnp.roll(pj, -1, axis=1), axis=-1)
    ok = jnp.all((li * scale < lj) & (lj < li / scale), axis=-1)  # [T]
    return tri.reshape(-1, 2), jnp.repeat(ok, 3)


# ---------------------------------------------------------------------------
# GNC optimisation — one lax.scan, zero host round-trips
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iteration_number", "decrease_mu"))
def _optimize_pairwise(p: jax.Array, q: jax.Array, w_valid: jax.Array,
                       par0: jax.Array, max_dist: jax.Array,
                       division_factor: jax.Array,
                       iteration_number: int, decrease_mu: bool):
    """Scaled Geman-McClure GN with line process (reference:
    OptimizePairwiseRegistration + compute_jacobian_functor,
    fast_global_registration.cu:268-372). ``p``/``q`` are the gathered
    correspondence points of the source / target cloud (normalized);
    ``q`` is re-transformed by the cumulative pose each iteration
    instead of mutating a copy like the reference does."""

    def step(carry, itr):
        trans, par = carry
        qt = transform_points(trans, q)
        rpq = p - qt
        s = (par / (jnp.sum(rpq * rpq, -1) + par)) ** 2 * w_valid  # [K]
        # rows of J per residual axis (fast_global_registration.cu:276-311)
        zero = jnp.zeros_like(qt[:, 0])
        mone = -jnp.ones_like(qt[:, 0])
        Jx = jnp.stack([zero, -qt[:, 2], qt[:, 1], mone, zero, zero], -1)
        Jy = jnp.stack([qt[:, 2], zero, -qt[:, 0], zero, mone, zero], -1)
        Jz = jnp.stack([-qt[:, 1], qt[:, 0], zero, zero, zero, mone], -1)
        J = jnp.stack([Jx, Jy, Jz], 1)          # [K,3,6]
        Jw = J * s[:, None, None]
        JTJ = jnp.einsum("kri,krj->ij", Jw, J,
                         precision=jax.lax.Precision.HIGHEST)
        JTr = jnp.einsum("kri,kr->i", Jw, rpq,
                         precision=jax.lax.Precision.HIGHEST)
        # reference solves (-JTJ) x = JTr via LDLT; the PSD-equivalent
        # form for a Cholesky backend is JTJ x = -JTr
        ok, x = solve_linear_system_psd(JTJ, -JTr)
        delta = transform_vector6_to_matrix4(jnp.where(ok, x, 0.0))
        trans = delta @ trans
        if decrease_mu:
            # after iterations 0, 4, 8, ... (fast_global_registration.cu:364-368)
            dec = (itr % 4 == 0) & (par > max_dist)
            par = jnp.where(dec, par / division_factor, par)
        return (trans, par), None

    carry = (jnp.eye(4, dtype=jnp.float32), par0)
    (trans, _), _ = jax.lax.scan(
        step, carry, jnp.arange(iteration_number, dtype=jnp.int32))
    return trans


def fast_global_registration(
    source,
    target,
    source_feature: Feature,
    target_feature: Feature,
    option: FastGlobalRegistrationOption = None,
) -> RegistrationResult:
    """reference: FastGlobalRegistration<Dim>
    (fast_global_registration.cu:394-433)."""
    option = option or FastGlobalRegistrationOption()
    if (not source.has_points() or not target.has_points()
            or source_feature.is_empty() or target_feature.is_empty()):
        console.log_error("Invalid source or target pointcloud.")
        return RegistrationResult()

    # Normalize both clouds: X' = (X - mean) / scale_global
    # (NormalizePointCloud, fast_global_registration.cu:198-266)
    mean_src = jnp.mean(source.points, 0)
    mean_tgt = jnp.mean(target.points, 0)
    src_c = source.points - mean_src
    tgt_c = target.points - mean_tgt
    scale = max(float(jnp.max(jnp.linalg.norm(src_c, axis=-1))),
                float(jnp.max(jnp.linalg.norm(tgt_c, axis=-1))))
    scale_global = 1.0 if option.use_absolute_scale else scale
    src_n = src_c / scale_global
    tgt_n = tgt_c / scale_global

    # STEP 0: match with the larger cloud as "i"
    # (AdvancedMatching, fast_global_registration.cu:110-120)
    swapped = len(target) > len(source)
    feats = [source_feature.data.T, target_feature.data.T]
    pts_n = [src_n, tgt_n]
    fi, fj = (1, 0) if swapped else (0, 1)

    # STEP 1+2: mutual feature-NN cross check
    nn_ij = _feature_nn(feats[fi], feats[fj])   # best j for each i
    nn_ji = _feature_nn(feats[fj], feats[fi])   # best i for each j
    mutual = np.asarray(_mutual_mask(nn_ij, nn_ji))
    i_idx = np.nonzero(mutual)[0].astype(np.int32)
    corres_cross = np.stack([i_idx, np.asarray(nn_ij)[i_idx]], -1)
    console.log_debug("cross check: %d pairs remain", len(corres_cross))
    if len(corres_cross) < 3:
        console.log_warning("[FastGlobalRegistration] too few mutual "
                            "correspondences.")
        return RegistrationResult()

    # STEP 3: tuple constraint. The reference runs ncorr*100 trials and
    # truncates the passing pairs to maximum_tuple_count; trials past
    # what can fill the cap are wasted work, so bound them (first-K
    # trial-order semantics are preserved).
    n_trials = int(min(len(corres_cross) * 100,
                       max(10_000, option.maximum_tuple_count * 100)))
    pairs, keep = _tuple_test(
        pts_n[fi], pts_n[fj], jnp.asarray(corres_cross),
        jnp.float32(option.tuple_scale), n_trials)
    pairs = np.asarray(pairs)[np.asarray(keep)]
    pairs = pairs[:option.maximum_tuple_count]
    console.log_debug("tuple constraint: %d pairs", len(pairs))
    if swapped:
        pairs = pairs[:, ::-1].copy()  # back to (source_idx, target_idx)
    if len(pairs) < 10:
        return RegistrationResult()

    # STEP 4: GNC optimisation aligns normalized target onto normalized
    # source (i=source, j=target in OptimizePairwiseRegistration).
    # NOTE the reference passes scale_global as the initial mu.
    p = src_n[jnp.asarray(pairs[:, 0])]
    q = tgt_n[jnp.asarray(pairs[:, 1])]
    w = jnp.ones(p.shape[0], jnp.float32)
    trans = _optimize_pairwise(
        p, q, w, jnp.float32(scale_global),
        jnp.float32(option.maximum_correspondence_distance),
        jnp.float32(option.division_factor),
        option.iteration_number, option.decrease_mu)

    # STEP 5: undo normalisation + invert so T @ source aligns with
    # target (GetInvTransformationOriginalScale,
    # fast_global_registration.cu:376-390).
    trans = np.asarray(trans)
    R = trans[:3, :3]
    t = trans[:3, 3]
    T = np.zeros((4, 4), np.float32)
    T[:3, :3] = R.T
    T[:3, 3] = -R.T @ (-R @ np.asarray(mean_tgt)
                       + t * scale_global + np.asarray(mean_src))
    T[3, 3] = 1.0
    return evaluate_registration(
        source, target, option.maximum_correspondence_distance, T)
