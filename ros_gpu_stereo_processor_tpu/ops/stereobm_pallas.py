"""Fused Pallas block-matching kernel — the engine's centerpiece kernel.

Replaces the opaque ``cv::cuda::StereoBM`` device kernel the reference calls
into (src/GPUStereoProcessor.cpp:283) with a TPU kernel designed for the
hardware (SURVEY.md §7 'hard parts'):

  * the (ndisp × H × W) cost volume is **never materialised in HBM** — each
    grid program streams a row band of the prefiltered images into VMEM once
    and sweeps all disparity candidates over it, carrying only the running
    winner (cost volume traffic: 0 bytes; the jnp oracle path writes/reads
    ~92 MB per frame at 64 candidates);
  * SAD window sums are separable subtractive power-of-two decompositions
    on the VPU (window ``b`` = prefixes of one doubling chain summing
    ``b+1`` elements minus the one surplus — block 15: 5 lane rolls + 5
    row-slice adds instead of ~10 rolls + 14 adds; exact because the
    prefiltered SAD values are small integers in f32);
  * the per-candidate shifted right image is maintained incrementally with
    one 8-lane roll per 8 candidates + static sub-offset slices (no dynamic
    lane slicing, 8× less shuffle traffic than a roll per candidate);
  * costs are computed UNCENTERED and the result maps recentred with ONE
    roll per output instead of one per candidate;
  * WTA, texture gating and parabolic subpixel refinement happen in the same
    pass (one-pass winner + neighbour-cost tracking);
  * the whole image runs as ONE grid program when VMEM allows
    (_auto_tile_h) — per-grid-program overhead dominates on v5e.

Numerics match ops/stereobm.py (the jnp oracle twin) exactly: ties keep the
smallest disparity, invalid = min_disparity − 1, identical border/texture
gates; parity is enforced in tests/test_stereobm_pallas.py.
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

_BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hsum_tail(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """UNCENTERED ``block``-wide horizontal window sum via binary
    decomposition with one subtraction: acc[i] = Σ_{j=0..block-1} x[i-j].

    ``block+1`` is decomposed into powers of two taken as prefixes of ONE
    doubling chain (its intermediates are free), then the single surplus
    element x[i-block] is subtracted — for the default odd blocks this
    roughly HALVES the lane rolls of the plain tree+remainder scheme
    (block 15: 5 rolls vs ~10).  Exact (bit-identical to the direct sum)
    because prefiltered SAD values are small integers in f32.  Requires
    ≥ ``block`` zero-padding columns at the row end (wrap-ins must be
    zeros — fused_raw's w_pad rule guarantees it)."""
    n = block + 1
    bits = [k for k in range(n.bit_length() - 1, -1, -1) if (n >> k) & 1]
    # doubling chain: chain[k] = 2^k-sum; build up to the largest bit
    chain = {0: x}
    acc = x
    for k in range(1, bits[0] + 1):
        acc = acc + pltpu.roll(acc, 1 << (k - 1), axis=1)
        chain[k] = acc
    total = chain[bits[0]]
    shift = 1 << bits[0]
    for k in bits[1:]:
        total = total + pltpu.roll(chain[k], shift, axis=1)
        shift += 1 << k
    # shift == block + 1 here; drop the one surplus element
    return total - pltpu.roll(x, block, axis=1)


def _hsum_window(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Centered ``block``-wide horizontal window sum (recentring roll on
    top of :func:`_hsum_tail`)."""
    r = block // 2
    acc = _hsum_tail(x, block)
    # (pltpu.roll requires a non-negative shift: −r ≡ width − r)
    return pltpu.roll(acc, acc.shape[1] - r, axis=1)


def _vsum_window(x: jnp.ndarray, block: int, out_rows: int) -> jnp.ndarray:
    """Vertical ``block``-row sums: x is (≥ out_rows + block, W); returns
    (out_rows, W) where row y = Σ x[y : y+block].

    Same binary-decomposition-plus-one-subtraction trick as
    :func:`_hsum_tail`, with row slices instead of lane rolls (block 15:
    5 adds vs 14).  Exact for the integer-valued SAD sums.  Requires
    ``x.shape[0] ≥ out_rows + block`` (one row more than the window needs —
    the surplus row is summed in by the 2^k chain and subtracted back
    out; fused_raw sizes the band DMA accordingly)."""
    n = block + 1
    bits = [k for k in range(n.bit_length() - 1, -1, -1) if (n >> k) & 1]
    need = out_rows + block            # rows consumed: x[0 .. need]
    if x.shape[0] < need + 1:
        # not enough slack rows for the subtractive scheme: plain adds
        acc = x[0:out_rows]
        for i in range(1, block):
            acc = acc + x[i : i + out_rows]
        return acc
    chain = {0: x}
    acc = x
    for k in range(1, bits[0] + 1):
        w = 1 << (k - 1)
        acc = acc[: acc.shape[0] - w] + acc[w:]
        chain[k] = acc                 # chain[k][y] = Σ x[y : y+2^k]
    total = chain[bits[0]][0:out_rows]
    shift = 1 << bits[0]
    for k in bits[1:]:
        total = total + chain[k][shift : shift + out_rows]
        shift += 1 << k
    return total - x[block : block + out_rows]


def _pad_geometry(cfg: StereoBMConfig, w_pad: int) -> Tuple[int, int, int]:
    """(left_pad, slice_offset, padded_right_width): the right image is
    left-padded so that after rolling by the relative candidate index d the
    slice at ``slice_offset`` reads R[x − (min_disparity + d)]."""
    nd = cfg.num_disparities
    mind = cfg.min_disparity
    pad_l = nd + max(0, mind)
    off = pad_l - mind          # ≥ 0 by construction
    rw_pad = _round_up(w_pad + max(pad_l, off), 128)
    return pad_l, off, rw_pad


def _auto_tile_h(H: int, w_pad: int, rw_pad: int, r: int,
                 budget: int = 80 * 1024 * 1024) -> int:
    """Largest row-tile that fits the VMEM budget — ideally the WHOLE image
    in ONE grid program.  Per-grid-program overhead dominates this kernel on
    v5e (measured r05: 15 programs at tile_h=32 → 1.63 ms, 1 program at
    tile_h=480 → 1.26 ms for the same 752×480 frame), so fewer, larger
    programs win; the budget keeps the band buffers + ~12 live (tile_h,
    w_pad) f32 temporaries inside scoped VMEM."""
    th = _round_up(H, 8)
    while th > 8:
        in_rows = _round_up(th + 2 * r, 8)
        scoped = (in_rows * (w_pad + rw_pad) + 12 * th * w_pad) * 4
        if scoped <= budget:
            return th
        th = _round_up(th // 2, 8)
    return 8


def _make_kernel(cfg: StereoBMConfig, tile_h: int, w_real: int, w_pad: int, slice_off: int):
    nd = cfg.num_disparities
    mind = cfg.min_disparity
    block = cfg.block_size
    r = cfg.block_radius
    # DMA slice row counts must be sublane-aligned (multiple of 8); the +1
    # guarantees the surplus row the subtractive vertical window needs
    in_rows = _round_up(tile_h + 2 * r + 1, 8)

    def kernel(lp_ref, rp_ref, disp_ref, cost_ref, excl_ref, lband, rband, sems):
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

        L = lband[:]                                   # (in_rows, w_pad)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)
        big = jnp.full((tile_h, w_pad), _BIG, jnp.float32)

        def cost_at(j, rcur):
            # rcur holds the right band rolled by 8k lanes (k = outer step);
            # the static slice at slice_off − j reads R[x − (mind + 8k + j)]:
            # one 8-lane roll per 8 candidates instead of a roll per candidate
            rs = rcur[:, slice_off - j : slice_off - j + w_pad]
            diff = jnp.abs(L - rs)
            vs = _vsum_window(diff, block, tile_h)
            # UNCENTERED window sum: costs live in u-space (u = x + r); the
            # WTA runs there and the RESULT maps are recentred once at the
            # end — one roll per output instead of one per candidate
            return _hsum_tail(vs, block)

        def masked_cost(d, j, rcur):
            d_abs = d + mind
            x = col - r          # centered pixel this u-slot represents
            ok = (x - d_abs >= r) & (x - d_abs <= w_real - 1 - r)
            return jnp.where(ok, cost_at(j, rcur), _BIG)

        init = (
            big,                                       # best_cost
            jnp.full((tile_h, w_pad), -2, jnp.int32),  # best_d (relative)
            big,                                       # prev_cost (at d-1)
            big,                                       # cost at best-1
            big,                                       # cost at best+1
            rband[:],                                  # rolling right band
        )

        def body(k, carry):
            best_cost, best_d, prev_cost, cm, cp, rcur = carry
            for j in range(8):
                d = 8 * k + j
                cost_d = masked_cost(d, j, rcur)
                newbest = cost_d < best_cost
                cm = jnp.where(newbest, prev_cost, cm)
                cp = jnp.where((~newbest) & (d == best_d + 1), cost_d, cp)
                best_d = jnp.where(newbest, d, best_d)
                best_cost = jnp.where(newbest, cost_d, best_cost)
                prev_cost = cost_d
            rnext = pltpu.roll(rcur, 8, axis=1)
            return (best_cost, best_d, prev_cost, cm, cp, rnext)

        assert nd % 8 == 0
        best_cost, best_d, _, cm, cp, _ = jax.lax.fori_loop(
            0, nd // 8, body, init
        )

        disp = (best_d + mind).astype(jnp.float32)
        if cfg.refine_disparity:
            denom = cm + cp - 2.0 * best_cost
            delta = jnp.where(denom > 0, (cm - cp) / (2.0 * denom), 0.0)
            delta = jnp.clip(delta, -0.5, 0.5)
            interior = (best_d > 0) & (best_d < nd - 1) & (cm < _BIG) & (cp < _BIG)
            disp = disp + jnp.where(interior, delta, 0.0)

        if cfg.uniqueness_ratio > 0:
            # second sweep: min cost over candidates outside best ± 1 (the
            # uniqueness contender) — same rolled-band walk, winner excluded
            def body2(k, carry):
                excl, rcur = carry
                for j in range(8):
                    d = 8 * k + j
                    cost_d = masked_cost(d, j, rcur)
                    away = jnp.abs(d - best_d) > 1
                    excl = jnp.where(away, jnp.minimum(excl, cost_d), excl)
                return (excl, pltpu.roll(rcur, 8, axis=1))

            excl, _ = jax.lax.fori_loop(0, nd // 8, body2, (big, rband[:]))
        else:
            excl = big

        # single recentring roll per output map (u-space → centered)
        rc = lambda a: pltpu.roll(a, w_pad - r, axis=1)
        disp_ref[:] = rc(disp)
        cost_ref[:] = rc(best_cost)
        excl_ref[:] = rc(excl)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "tile_h"))
def compute_disparity_fused(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoBMConfig = StereoBMConfig(),
    tile_h: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused prefilter→cost→WTA disparity (Pallas fast path).

    Same contract as :func:`ops.stereobm.compute_disparity`: (H, W) mono
    uint8/float images → (disparity f32, valid bool).

    ``uniqueness_ratio`` adds a second masked sweep over the candidates
    (min cost outside best ± 1) inside the same kernel.

    ``lr_check`` runs the same fused kernel a second time on mirrored-and-
    swapped images (prefilter inversion cancels in |·|, so mirror matching is
    exactly right-image matching) and applies the gather-free consistency
    test.
    """
    if cfg.lr_check:
        base = cfg.replace(lr_check=False)
        disp, valid = compute_disparity_fused(left, right, base, tile_h)
        dr_m, _ = compute_disparity_fused(
            jnp.flip(right, axis=1), jnp.flip(left, axis=1), base, tile_h
        )
        disp_r = jnp.flip(dr_m, axis=1)
        valid &= bm_ops.left_right_check(disp, disp_r, cfg, cfg.lr_max_diff)
        disp = jnp.where(valid, disp, jnp.float32(cfg.min_disparity - 1))
        return disp, valid

    H, W = left.shape
    r = cfg.block_radius

    lf = bm_ops.prefilter(left, cfg)
    rf = bm_ops.prefilter(right, cfg)
    disp_raw, best_cost, excl = fused_raw(lf, rf, cfg, tile_h)

    tex = bm_ops.texture_sum(lf, cfg) if cfg.texture_threshold > 0 else None
    return fused_gates(disp_raw, best_cost, excl, cfg, tex,
                       row_offset=0, total_rows=H)


def fused_raw(
    lf: jnp.ndarray,
    rf: jnp.ndarray,
    cfg: StereoBMConfig,
    tile_h: int | None = None,
    halo: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused cost→WTA kernel on PREFILTERED images, returning the raw
    (disp_raw, best_cost, excl) maps before the validity gates.

    With ``halo`` > 0 the inputs carry ``halo`` extra rows above and below
    (a row-band shard's ICI halo exchange, parallel/frontend.py); the kernel
    then windows over real neighbour rows instead of zero padding and the
    returned maps cover only the interior rows.  ``halo`` must be ≥ the
    block radius for the interior windows to be complete.
    """
    H_ext, W = lf.shape
    r = cfg.block_radius
    H = H_ext - 2 * halo           # interior rows the caller keeps
    pad_top = r - halo             # zero rows still needed above (≤ r)
    if halo and pad_top > 0:
        raise ValueError("halo must be 0 or ≥ block_radius")

    w_pad = _round_up(W, 128)
    if w_pad - W < cfg.block_size:
        # the lane-roll window sums need >= block zeroed slack lanes at the
        # row end (wrap-ins must be zeros — the CLAUDE.md w_pad rule)
        w_pad += 128
    pad_l, slice_off, rw_pad = _pad_geometry(cfg, w_pad)
    if tile_h is None:
        # auto: one grid program for the whole image when VMEM allows
        tile_h = _auto_tile_h(H, w_pad, rw_pad, r)
    if tile_h % 8 != 0:
        raise ValueError("tile_h must be a multiple of 8")
    h_pad = _round_up(H, tile_h)
    in_rows = _round_up(tile_h + 2 * r + 1, 8)

    # rows: r halo rows above (zeros, or real rows from the shard halo —
    # zero padding ≙ reduce_window SAME in the oracle); the extra alignment
    # rows are read by the DMA but never used by the window sums.
    total_rows = (h_pad - tile_h) + in_rows
    lp = jnp.zeros((total_rows, w_pad), jnp.float32)
    rp = jnp.zeros((total_rows, rw_pad), jnp.float32)
    if halo:
        src_l = lf[halo - r: halo + H + r]
        src_r = rf[halo - r: halo + H + r]
        lp = jax.lax.dynamic_update_slice(lp, src_l, (0, 0))
        rp = jax.lax.dynamic_update_slice(rp, src_r, (0, pad_l))
    else:
        lp = jax.lax.dynamic_update_slice(lp, lf, (r, 0))
        rp = jax.lax.dynamic_update_slice(rp, rf, (r, pad_l))

    grid = (h_pad // tile_h,)
    kernel = _make_kernel(cfg, tile_h, W, w_pad, slice_off)
    # off-TPU (CPU CI) the kernel runs in the Pallas interpreter
    interpret = jax.devices()[0].platform != "tpu"
    bspec = pl.BlockSpec((tile_h, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    disp_raw, best_cost, excl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[bspec, bspec, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((in_rows, w_pad), jnp.float32),
            pltpu.VMEM((in_rows, rw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # large tiles (fewer grid programs — per-program overhead is the
        # dominant cost on v5e, measured r05) need more than the 16 MB
        # default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lp, rp)
    return disp_raw[:H, :W], best_cost[:H, :W], excl[:H, :W]


def fused_gates(
    disp_raw: jnp.ndarray,
    best_cost: jnp.ndarray,
    excl: jnp.ndarray,
    cfg: StereoBMConfig,
    tex: jnp.ndarray | None,
    row_offset: "int | jnp.ndarray" = 0,
    total_rows: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Validity gates on the raw fused-kernel maps (border, texture,
    uniqueness) — ``row_offset``/``total_rows`` express a row-band shard's
    position so border rows are judged against the WHOLE image."""
    H, W = disp_raw.shape
    r = cfg.block_radius
    if total_rows is None:
        total_rows = H

    valid = best_cost < _BIG
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + row_offset
    colf = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid &= (row >= r) & (row <= total_rows - 1 - r)
    valid &= (colf >= r) & (colf <= W - 1 - r)
    if cfg.texture_threshold > 0:
        valid &= tex >= cfg.texture_threshold
    if cfg.uniqueness_ratio > 0:
        # a contender outside best±1 within the ratio margin kills the match
        thresh = best_cost * (1.0 + cfg.uniqueness_ratio / 100.0)
        valid &= ~(excl <= thresh)

    disp = jnp.where(valid, disp_raw, jnp.float32(cfg.min_disparity - 1))
    return disp, valid
