"""Fused Pallas SGM — path aggregation in VMEM row bands.

The jnp SGM (ops/sgm.py) scans the HBM cost volume once per path direction
with (H, nd)-slice scan steps (~15 ms/frame at 128 disparities).  This
implementation restructures the whole computation around the hardware:

  * **cost kernel** (one per orientation): streams image row bands into VMEM
    and sweeps all candidates with an 8-unrolled roll walk (one 8-step roll
    per 8 candidates + static-offset slices), writing the *clamped* cost
    volume once — the only cost computation in the pipeline;
  * **aggregation kernels** read cost blocks back band-by-band (Pallas
    auto-DMA) and run the SGM recurrence row-serially with the (nd × W)
    carry plane living in VMEM scratch **across grid steps** (the TPU grid is
    sequential, so a band walk is a full-image scan).  ``reverse=True`` walks
    the grid bottom→top via a reversed index map — no image flips, identical
    shift geometry for all four directions.  They write only the **excess**
    L_dir − C ∈ [0, P2];
  * the horizontal path pair runs on the TRANSPOSED orientation, where the
    disparity shift rides the sublane axis (row rolls instead of lane rolls)
    and the x-serial recurrence becomes the same band walk;
  * a final **WTA kernel** reads cost + summed-excess blocks and does the
    one-pass running winner + parabolic subpixel (+ optional uniqueness
    sweep) of the fused BM kernel — 3 vector ops per candidate, no recompute.

Numerics match :func:`ops.sgm.compute_disparity_sgm` (4-path) exactly
(clamped-cost aggregation, ties to smallest disparity, identical gates);
parity is enforced in tests/test_sgm_pallas.py on final outputs.  Padded
rows self-neutralise in the recurrences (zero-cost rows map the carry to the
oracle's init; fully-clamped rows behave as path restarts), so no masking
pass is needed.

Reference anchor: this is the quality tier the reference's stubbed
DisparityBilateralFilter aimed at (src/StereoProcessor.cpp:324-335;
SURVEY.md §2.8b).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm_ops
from ros_gpu_stereo_processor_tpu.ops.stereobm_pallas import (
    _hsum_window,
    _pad_geometry,
    _round_up,
    _vsum_window,
)

_BIG = 1e9


def _clamp_val(cfg: StereoBMConfig, p2: float) -> float:
    # the oracle's invalid-cost clamp (ops/sgm.py): keeps BIG out of the
    # path mins while staying far above any real SAD
    return 2.0 * float(p2) + 255.0 * cfg.block_size**2


def _sgm_step(prev: jnp.ndarray, c: jnp.ndarray, p1: float, p2: float):
    """One SGM recurrence row step in (nd, W) layout.  Returns
    (L_row, excess_row): L = c + excess, excess = best − min_d(prev)."""
    m = jnp.min(prev, axis=0, keepdims=True)              # (1, W)
    big_row = jnp.full_like(prev[:1], _BIG)
    up = jnp.concatenate([prev[1:], big_row], axis=0)     # prev at d+1
    dn = jnp.concatenate([big_row, prev[:-1]], axis=0)    # prev at d−1
    best = jnp.minimum(
        jnp.minimum(prev, m + p2), jnp.minimum(up + p1, dn + p1)
    )
    excess = best - m
    return c + excess, excess


# ---------------------------------------------------------------------------
# Cost-volume kernel (both orientations)
# ---------------------------------------------------------------------------


def _cost_volume(
    lf: jnp.ndarray,
    rf: jnp.ndarray,
    cfg: StereoBMConfig,
    p2: float,
    tile_h: int,
    interpret: bool,
) -> jnp.ndarray:
    """Clamped cost volume (nd, h_pad, w_pad) via band-streamed VMEM sweeps
    (the fused-BM cost machinery, storing every candidate plane).  The
    horizontal-path aggregation consumes this same volume transposed —
    cost_T(u, v, d) = cost(v, u, d) — so ONE sweep serves all four paths."""
    H, W = lf.shape
    nd = cfg.num_disparities
    mind = cfg.min_disparity
    block = cfg.block_size
    r = cfg.block_radius
    lrows = tile_h + 2 * r
    in_rows = _round_up(lrows, 8)
    loff = in_rows - lrows
    h_pad = _round_up(H, tile_h)
    w_pad = _round_up(W, 128)
    pad_l, off, rw_pad = _pad_geometry(cfg, w_pad)
    clampv = _clamp_val(cfg, p2)
    assert nd % 8 == 0

    def kernel(lp_ref, rp_ref, cost_ref, lband, rband, sems):
        i = pl.program_id(0)
        row0 = i * tile_h
        cp_l = pltpu.make_async_copy(
            lp_ref.at[pl.ds(row0, in_rows), :], lband, sems.at[0]
        )
        cp_r = pltpu.make_async_copy(
            rp_ref.at[pl.ds(row0, in_rows), :], rband, sems.at[1]
        )
        cp_l.start()
        cp_r.start()
        cp_l.wait()
        cp_r.wait()

        L = lband[loff : loff + lrows, :]
        # zero the phantom |0 − R| diffs where L is zero padding but the
        # shifted R has real data (lanes beyond the real width); above-image
        # rows are zero in BOTH images so they cancel on their own
        win_col = jax.lax.broadcasted_iota(jnp.int32, (lrows, w_pad), 1)
        lmask = win_col < W
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)

        def cost_at(j, rcur):
            # rcur is rolled by 8k (k = outer step); static sub-offset j
            rs = rcur[loff : loff + lrows, off - j : off - j + w_pad]
            diff = jnp.where(lmask, jnp.abs(L - rs), 0.0)
            vs = _vsum_window(diff, block, tile_h)
            return _hsum_window(vs, block)

        def body(k, rcur):
            for j in range(8):
                d = 8 * k + j
                d_abs = d + mind
                ok = (col - d_abs >= r) & (col - d_abs <= W - 1 - r)
                cost_ref[pl.ds(d, 1)] = jnp.where(
                    ok, cost_at(j, rcur), clampv
                )[None]
            return pltpu.roll(rcur, 8, axis=1)

        jax.lax.fori_loop(0, nd // 8, body, rband[:])

    lp_rows = (h_pad - tile_h) + in_rows
    lp = jnp.zeros((lp_rows, w_pad), jnp.float32)
    lp = jax.lax.dynamic_update_slice(lp, lf, (loff + r, 0))
    rp = jnp.zeros((lp_rows, rw_pad), jnp.float32)
    rp = jax.lax.dynamic_update_slice(rp, rf, (loff + r, pad_l))

    return pl.pallas_call(
        kernel,
        grid=(h_pad // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nd, tile_h, w_pad), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nd, h_pad, w_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((in_rows, w_pad), jnp.float32),
            pltpu.VMEM((in_rows, rw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lp, rp)


# ---------------------------------------------------------------------------
# Aggregation kernel (direction = grid walk order)
# ---------------------------------------------------------------------------


def _w_tile(nd: int, tile_h: int, w_pad: int) -> int:
    """Lane-tile width keeping a (nd, tile_h, w_tile) f32 block ≤ ~1 MB, so
    the double-buffered in+out blocks fit VMEM comfortably at 128 disp.
    Must divide w_pad and be a multiple of 128 (Mosaic lane tiling)."""
    for k in range(1, w_pad // 128 + 1):
        if w_pad % k:
            continue
        wt = w_pad // k
        if wt % 128 == 0 and nd * tile_h * wt * 4 <= (1 << 20):
            return wt
    if w_pad % 128 == 0:
        return 128
    # lane count not 128-divisible (e.g. a transposed volume whose lanes are
    # the row padding of the other orientation): full-width blocks — Mosaic
    # accepts a last dim equal to the whole array dimension
    return w_pad


def _aggregate(
    cost: jnp.ndarray,
    cfg: StereoBMConfig,
    p1: float,
    p2: float,
    reverse: bool,
    tile_h: int,
    interpret: bool,
) -> jnp.ndarray:
    """Excess volume of one path direction from a stored clamped-cost volume
    (nd, h_pad, w_pad).  The recurrence is column-independent, so the grid is
    (lane tiles × bands) with bands iterating fastest (innermost): for each
    lane tile the sequential band walk is a full-image scan, with the carry
    plane persisting in VMEM scratch.  ``reverse`` walks bands (and rows
    within bands) bottom→top via a reversed index map."""
    nd, h_pad, w_pad = cost.shape
    n_bands = h_pad // tile_h
    wt = _w_tile(nd, tile_h, w_pad)

    def kernel(cost_ref, exc_ref, carry):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            carry[:] = jnp.zeros((nd, wt), jnp.float32)

        prev = carry[:]
        order = range(tile_h - 1, -1, -1) if reverse else range(tile_h)
        for j in order:
            c = cost_ref[:, j, :]
            prev, excess = _sgm_step(prev, c, p1, p2)
            exc_ref[:, j, :] = excess
        carry[:] = prev

    if reverse:
        bmap = lambda w, b: (0, n_bands - 1 - b, w)
    else:
        bmap = lambda w, b: (0, b, w)
    spec = pl.BlockSpec((nd, tile_h, wt), bmap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(w_pad // wt, n_bands),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nd, h_pad, w_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nd, wt), jnp.float32)],
        interpret=interpret,
    )(cost)


# ---------------------------------------------------------------------------
# Final WTA kernel
# ---------------------------------------------------------------------------


def _wta(
    cost: jnp.ndarray,
    exc_total: jnp.ndarray,
    cfg: StereoBMConfig,
    p2: float,
    w_real: int,
    tile_h: int,
    interpret: bool,
):
    """Running WTA + subpixel (+ uniqueness) over total = 4·cost + excess,
    reading stored blocks — no cost recompute."""
    nd, h_pad, w_pad = cost.shape
    mind = cfg.min_disparity
    r = cfg.block_radius
    wt = _w_tile(nd, tile_h, w_pad)

    def kernel(cost_ref, exc_ref, disp_ref, costo_ref, excl_ref):
        w0 = pl.program_id(1) * wt
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wt), 1) + w0
        big = jnp.full((tile_h, wt), _BIG, jnp.float32)

        def total_at(d):
            c = cost_ref[pl.ds(d, 1)][0]
            e = exc_ref[pl.ds(d, 1)][0]
            d_abs = d + mind
            ok = (col - d_abs >= r) & (col - d_abs <= w_real - 1 - r)
            return jnp.where(ok, 4.0 * c + e, _BIG)

        init = (
            big,
            jnp.full((tile_h, wt), -2, jnp.int32),
            big, big, big,
        )

        def body(d, carry):
            best_cost, best_d, prev_cost, cm, cp = carry
            cost_d = total_at(d)
            newbest = cost_d < best_cost
            cm = jnp.where(newbest, prev_cost, cm)
            cp = jnp.where((~newbest) & (d == best_d + 1), cost_d, cp)
            best_d = jnp.where(newbest, d, best_d)
            best_cost = jnp.where(newbest, cost_d, best_cost)
            return (best_cost, best_d, cost_d, cm, cp)

        best_cost, best_d, _, cm, cp = jax.lax.fori_loop(0, nd, body, init)

        disp = (best_d + mind).astype(jnp.float32)
        if cfg.refine_disparity:
            denom = cm + cp - 2.0 * best_cost
            delta = jnp.where(denom > 0, (cm - cp) / (2.0 * denom), 0.0)
            delta = jnp.clip(delta, -0.5, 0.5)
            interior = (best_d > 0) & (best_d < nd - 1) & (cm < _BIG) & (cp < _BIG)
            disp = disp + jnp.where(interior, delta, 0.0)

        if cfg.uniqueness_ratio > 0:
            def body2(d, excl):
                cost_d = total_at(d)
                away = jnp.abs(d - best_d) > 1
                return jnp.where(away, jnp.minimum(excl, cost_d), excl)

            excl = jax.lax.fori_loop(0, nd, body2, big)
        else:
            excl = big

        disp_ref[:] = disp
        costo_ref[:] = best_cost
        excl_ref[:] = excl

    vspec = pl.BlockSpec((nd, tile_h, wt), lambda i, w: (0, i, w),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tile_h, wt), lambda i, w: (i, w),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(h_pad // tile_h, w_pad // wt),
        in_specs=[vspec, vspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(cost, exc_total)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "p1", "p2", "tile_h"))
def compute_disparity_sgm_fused(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoBMConfig = StereoBMConfig(),
    p1: float = 10.0,
    p2: float = 120.0,
    tile_h: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused 4-path SGM (Pallas fast path).  Same contract and numerics as
    :func:`ops.sgm.compute_disparity_sgm` with ``num_paths=4``."""
    H, W = left.shape
    nd = cfg.num_disparities
    r = cfg.block_radius
    interpret = jax.devices()[0].platform != "tpu"
    if tile_h % 8 != 0:
        raise ValueError("tile_h must be a multiple of 8")

    lf = bm_ops.prefilter(left, cfg)
    rf = bm_ops.prefilter(right, cfg)

    # ONE stored (clamped) cost volume; the horizontal path pair aggregates
    # its transpose — cost_T(u, v, d) = cost(v, u, d) — so the sweep runs
    # once (XLA materialises the transpose as a single relayout, far cheaper
    # than a second sweep).  Padded lanes are fully clamped, which the
    # recurrence treats as path restarts, so padded regions need no masking.
    cost_n = _cost_volume(lf, rf, cfg, p2, tile_h, interpret)
    cost_t = jnp.swapaxes(cost_n, 1, 2)          # (nd, w_pad, h_pad)

    exc_dn = _aggregate(cost_n, cfg, p1, p2, False, tile_h, interpret)
    exc_up = _aggregate(cost_n, cfg, p1, p2, True, tile_h, interpret)
    exc_lr = _aggregate(cost_t, cfg, p1, p2, False, tile_h, interpret)
    exc_rl = _aggregate(cost_t, cfg, p1, p2, True, tile_h, interpret)

    # one fused elementwise op, everything stays in padded shapes
    exc_total = (
        exc_dn + exc_up
        + jnp.swapaxes(exc_lr, 1, 2) + jnp.swapaxes(exc_rl, 1, 2)
    )

    if cfg.lr_check:
        # the consistency check needs the full aggregated volume; reuse the
        # oracle's WTA tail on the assembled total (row-wise exact)
        total = 4.0 * cost_n[:, :H, :W] + exc_total[:, :H, :W]
        invalid = ~(
            (jax.lax.broadcasted_iota(jnp.int32, (nd, H, W), 2)
             - (jax.lax.broadcasted_iota(jnp.int32, (nd, H, W), 0)
                + cfg.min_disparity) >= r)
            & (jax.lax.broadcasted_iota(jnp.int32, (nd, H, W), 2)
               - (jax.lax.broadcasted_iota(jnp.int32, (nd, H, W), 0)
                  + cfg.min_disparity) <= W - 1 - r)
        )
        total = jnp.where(invalid, _BIG, total)
        disp, valid = bm_ops.wta_disparity(total, lf, cfg)
        disp_r = bm_ops.right_disparity_from_cost(total, cfg)
        valid &= bm_ops.left_right_check(disp, disp_r, cfg, cfg.lr_max_diff)
        disp = jnp.where(valid, disp, jnp.float32(cfg.min_disparity - 1))
        return disp, valid

    disp_raw, best_cost, excl = _wta(
        cost_n, exc_total, cfg, p2, W, tile_h, interpret
    )
    disp_raw = disp_raw[:H, :W]
    best_cost = best_cost[:H, :W]

    valid = best_cost < _BIG
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid &= (row >= r) & (row <= H - 1 - r) & (colf >= r) & (colf <= W - 1 - r)
    if cfg.texture_threshold > 0:
        tex = bm_ops.texture_sum(lf, cfg)
        valid &= tex >= cfg.texture_threshold
    if cfg.uniqueness_ratio > 0:
        thresh = best_cost * (1.0 + cfg.uniqueness_ratio / 100.0)
        valid &= ~(excl[:H, :W] <= thresh)

    disp = jnp.where(valid, disp_raw, jnp.float32(cfg.min_disparity - 1))
    return disp, valid
