"""Semi-global stereo matching
(reference: src/cupoch/imageproc/sgm.h:30-60 + sgm.cpp:46-62, which
wrap the vendored libSGM CUDA library).

TPU-native re-design instead of a wrapper: census transform as bit
ops over unrolled window shifts, Hamming cost volume as one [H,W,D]
XLA program, and the SGM path aggregation as `lax.scan`s — vertical
paths scan rows carrying a [W,D] slice, horizontal paths scan columns
carrying [H,D], diagonal paths scan rows with the carry shifted one
column per step. The D axis is the innermost (lane) dimension, so the
per-step min-reductions vectorise on the VPU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.image import Image
from ..utility import console


class SGMOption:
    """reference: sgm.h:30-60 (libSGM parameter set)."""

    DisparitySize64 = 64
    DisparitySize128 = 128
    DisparitySize256 = 256

    ScanPath4 = 0
    ScanPath8 = 1

    def __init__(self, width: int = 0, height: int = 0, p1: int = 10,
                 p2: int = 120, uniqueness: float = 0.95,
                 disp_size: int = DisparitySize128,
                 path_type: int = ScanPath8, min_disp: int = 0,
                 lr_max_diff: int = 1):
        self.width = int(width)
        self.height = int(height)
        self.p1 = int(p1)
        self.p2 = int(p2)
        self.uniqueness = float(uniqueness)
        self.disp_size = int(disp_size)
        self.path_type = int(path_type)
        self.min_disp = int(min_disp)
        self.lr_max_diff = int(lr_max_diff)


# -- census transform (libSGM census_transform.cu: 9x7 window) -------------

_CENSUS_W, _CENSUS_H = 9, 7  # 31 symmetric pairs -> fits one uint32


@jax.jit
def _census97(img: jax.Array) -> jax.Array:
    """Symmetric census: bit i = (I(p+o_i) > I(p-o_i)) for the 31
    center-symmetric offset pairs of the 9x7 window (libSGM's
    symmetric census encoding)."""
    rw, rh = _CENSUS_W // 2, _CENSUS_H // 2
    pad = jnp.pad(img, ((rh, rh), (rw, rw)), mode="edge")
    H, W = img.shape
    out = jnp.zeros((H, W), jnp.uint32)
    bit = 0
    for dy in range(-rh, rh + 1):
        for dx in range(-rw, rw + 1):
            if dy < 0 or (dy == 0 and dx < 0):
                continue
            if dy == 0 and dx == 0:
                continue
            a = jax.lax.dynamic_slice(pad, (rh + dy, rw + dx), (H, W))
            b = jax.lax.dynamic_slice(pad, (rh - dy, rw - dx), (H, W))
            out = out | ((a > b).astype(jnp.uint32) << np.uint32(bit))
            bit += 1
    return out


def _popcount32(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> 2) & np.uint32(0x33333333))
    x = (x + (x >> 4)) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> 24).astype(jnp.int32)


@partial(jax.jit, static_argnames=("disp_size", "min_disp"))
def _cost_volume(cl: jax.Array, cr: jax.Array, disp_size: int,
                 min_disp: int) -> jax.Array:
    """[H, W, D] Hamming distances between left census and
    d-shifted right census."""
    H, W = cl.shape
    costs = []
    for d in range(min_disp, min_disp + disp_size):
        shifted = jnp.roll(cr, d, axis=1)
        c = _popcount32(cl ^ shifted)
        # out-of-frame disparities get max cost
        c = jnp.where(jnp.arange(W)[None, :] >= d, c, 64)
        costs.append(c)
    return jnp.stack(costs, -1).astype(jnp.int32)


def _aggregate_scan(cost, p1, p2, reverse: bool, shift: int):
    """One SGM pass along axis 0 of `cost` ([S, T, D]); `shift` rolls
    the carry along T per step (0 = straight, ±1 = diagonal)."""
    S, T, D = cost.shape
    big = jnp.int32(1 << 20)

    def step(prev, c):
        # prev: [T, D] aggregated costs of the previous scanline
        prev_min = jnp.min(prev, -1, keepdims=True)  # [T, 1]
        no = prev
        up = jnp.concatenate([prev[:, :1] + big, prev[:, :-1]], 1) + p1
        dn = jnp.concatenate([prev[:, 1:], prev[:, -1:] + big], 1) + p1
        far = prev_min + p2
        best = jnp.minimum(jnp.minimum(no, up), jnp.minimum(dn, far))
        out = c + best - prev_min
        if shift:
            # diagonal: predecessor is one column over; the column that
            # wrapped has no predecessor -> zero carry (== init state)
            out_carry = jnp.roll(out, shift, axis=0)
            out_carry = out_carry.at[0 if shift > 0 else T - 1].set(0)
        else:
            out_carry = out
        return out_carry, out

    seq = cost[::-1] if reverse else cost
    init = jnp.zeros((T, D), jnp.int32)
    _, agg = jax.lax.scan(step, init, seq)
    return agg[::-1] if reverse else agg


@partial(jax.jit, static_argnames=("num_paths",))
def _aggregate(cost: jax.Array, p1, p2, num_paths: int) -> jax.Array:
    """Sum of per-direction aggregations (libSGM path_aggregation.cu:
    4 axis-aligned paths, plus 4 diagonals for SCAN_8PATH)."""
    H, W, D = cost.shape
    total = jnp.zeros_like(cost)
    # vertical (scan rows, carry [W, D])
    total += _aggregate_scan(cost, p1, p2, False, 0)
    total += _aggregate_scan(cost, p1, p2, True, 0)
    # horizontal (scan columns, carry [H, D])
    ct = jnp.swapaxes(cost, 0, 1)
    total += jnp.swapaxes(_aggregate_scan(ct, p1, p2, False, 0), 0, 1)
    total += jnp.swapaxes(_aggregate_scan(ct, p1, p2, True, 0), 0, 1)
    if num_paths == 8:
        total += _aggregate_scan(cost, p1, p2, False, 1)
        total += _aggregate_scan(cost, p1, p2, False, -1)
        total += _aggregate_scan(cost, p1, p2, True, 1)
        total += _aggregate_scan(cost, p1, p2, True, -1)
    return total


@partial(jax.jit, static_argnames=("min_disp", "lr_max_diff"))
def _select_disparity(S: jax.Array, uniqueness, min_disp: int,
                      lr_max_diff: int):
    """WTA + uniqueness + left-right consistency
    (libSGM winner_takes_all.cu)."""
    H, W, D = S.shape
    best_d = jnp.argmin(S, -1)  # [H, W]
    best_c = jnp.min(S, -1)
    # uniqueness: any other disparity (not adjacent) with cost*u <= best
    d_idx = jnp.arange(D)[None, None, :]
    adjacent = jnp.abs(d_idx - best_d[..., None]) <= 1
    masked = jnp.where(adjacent, jnp.int32(1 << 20), S)
    second = jnp.min(masked, -1)
    unique_ok = (second.astype(jnp.float32) * uniqueness
                 > best_c.astype(jnp.float32))
    # right-image disparity from the same volume:
    # S_right[y, x, d] = S[y, x + d, d]
    cols = jnp.arange(W)[None, :, None] + d_idx  # [1, W, D]
    cols_c = jnp.clip(cols, 0, W - 1)
    S_right = jnp.take_along_axis(
        S, jnp.broadcast_to(cols_c, (H, W, D)), axis=1)
    S_right = jnp.where(cols < W, S_right, jnp.int32(1 << 20))
    right_d = jnp.argmin(S_right, -1)  # [H, W] (right-image coords)
    # check: |dL(x) - dR(x - dL(x))| <= lr_max_diff
    xr = jnp.clip(jnp.arange(W)[None, :] - best_d, 0, W - 1)
    dr = jnp.take_along_axis(right_d, xr, axis=1)
    lr_ok = jnp.abs(best_d - dr) <= lr_max_diff if lr_max_diff >= 0 \
        else jnp.ones_like(best_d, bool)
    valid = unique_ok & lr_ok
    return jnp.where(valid, best_d + min_disp, 0).astype(jnp.int32)


class SemiGlobalMatching:
    """reference: sgm.h SemiGlobalMatching / sgm.cpp:46-62."""

    def __init__(self, option: Optional[SGMOption] = None):
        self.option = option or SGMOption()

    def process_frame(self, left: Image, right: Image) -> Image:
        opt = self.option
        if opt.width == 0 or opt.height == 0:
            console.log_error("[SemiGlobalMatching::ProcessFrame] Invalid "
                              "SGM parameters.")
            return Image()
        li = np.asarray(getattr(left, "data", left))
        ri = np.asarray(getattr(right, "data", right))
        if li.ndim == 3:
            li = li[..., 0]
        if ri.ndim == 3:
            ri = ri[..., 0]
        if li.shape != ri.shape or li.shape != (opt.height, opt.width):
            console.log_error("[SemiGlobalMatching::ProcessFrame] "
                              "Unsupport image type.")
            return Image()
        disp = compute_disparity(
            jnp.asarray(li, jnp.float32), jnp.asarray(ri, jnp.float32),
            opt.p1, opt.p2, opt.uniqueness, opt.disp_size,
            8 if opt.path_type == SGMOption.ScanPath8 else 4,
            opt.min_disp, opt.lr_max_diff)
        out = np.asarray(disp)
        dtype = np.uint8 if opt.disp_size <= 256 else np.uint16
        return Image(out.astype(dtype)[..., None])


@partial(jax.jit,
         static_argnames=("disp_size", "num_paths", "min_disp",
                          "lr_max_diff"))
def compute_disparity(left, right, p1, p2, uniqueness, disp_size: int,
                      num_paths: int, min_disp: int, lr_max_diff: int):
    """Full SGM: census -> Hamming cost volume -> path aggregation ->
    WTA with uniqueness + LR check. Functional entry (jit-able end to
    end); `SemiGlobalMatching` is the stateful reference-API front."""
    cl = _census97(left)
    cr = _census97(right)
    cost = _cost_volume(cl, cr, disp_size, min_disp)
    S = _aggregate(cost, jnp.int32(p1), jnp.int32(p2), num_paths)
    return _select_disparity(S, jnp.float32(uniqueness), min_disp,
                             lr_max_diff)
