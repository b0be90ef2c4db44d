"""Sharded dense stereo frontend: the cost volume across chips.

The reference's only device parallelism is two CUDA streams on one GPU
(SURVEY.md §2 parallelism note).  The TPU engine's scaling axis is the cost
volume (H × W × ndisp — the "sequence length" of this domain, SURVEY.md §5.7),
sharded two ways:

  * **Row bands** (:func:`disparity_row_sharded`): each chip matches a
    horizontal band.  The SAD window needs ``block_radius`` rows of
    neighbouring bands — exchanged over ICI with ``lax.ppermute`` (halo
    exchange).  Bit-identical to the single-chip matcher.
  * **Disparity slabs** (:func:`disparity_slab_sharded`): each chip computes a
    contiguous slab of the disparity search range over the full image, then a
    global argmin-reduce combines winners via ``lax.pmin`` on packed
    (cost, d) integer keys — one collective, no cost-volume materialisation
    across chips.  (BASELINE.json config 3.)

Both run under ``shard_map`` over a named mesh axis and are exercised in CI on
a virtual CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm

_BIG_INT = jnp.int32(10**6)  # invalid-cost sentinel for packed argmin keys


def _halo_exchange(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Extend a row-band (Hb, W) with ``halo`` rows from each neighbour along
    mesh axis ``axis``: returns (Hb + 2·halo, W).  Boundary shards receive
    zeros — identical to the single-chip zero-padded window sums."""
    n = jax.lax.axis_size(axis)
    if n == 1:
        z = jnp.zeros((halo,) + x.shape[1:], x.dtype)
        return jnp.concatenate([z, x, z], axis=0)
    # my bottom rows -> successor's top halo
    top = jax.lax.ppermute(
        x[-halo:], axis, [(i, i + 1) for i in range(n - 1)]
    )
    # my top rows -> predecessor's bottom halo
    bot = jax.lax.ppermute(
        x[:halo], axis, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([top, x, bot], axis=0)


def disparity_row_sharded(
    left_rect: jnp.ndarray,
    right_rect: jnp.ndarray,
    cfg: StereoBMConfig,
    mesh: Mesh,
    axis: str = "rows",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-band-sharded block matching, numerically identical to
    :func:`ops.stereobm.compute_disparity`.

    Inputs are (H, W) rectified mono images (replicated or row-sharded);
    outputs are row-sharded (disparity float32, valid bool).
    """
    H, W = left_rect.shape
    n = mesh.shape[axis]
    if H % n != 0:
        raise ValueError(f"H={H} not divisible by mesh axis {axis}={n}")
    halo = cfg.block_radius

    def band(lf_b, rf_b, tex_b):
        idx = jax.lax.axis_index(axis)
        hb = lf_b.shape[0]
        row_offset = idx * hb
        lf_e = _halo_exchange(lf_b, halo, axis)
        rf_e = _halo_exchange(rf_b, halo, axis)
        cost = bm.sad_cost_volume(lf_e, rf_e, cfg)[:, halo:-halo, :]
        disp, valid = bm.wta_disparity(
            cost, lf_e[halo:-halo], cfg,
            tex=tex_b, row_offset=row_offset, total_rows=H,
        )
        return disp, valid

    # prefilter + texture are cheap local stencils: compute under jit on the
    # sharded arrays (XLA partitions the stencils itself), then shard_map the
    # matcher which needs explicit halo logic.
    lf = bm.prefilter(left_rect, cfg)
    rf = bm.prefilter(right_rect, cfg)
    tex = bm.texture_sum(lf, cfg)

    spec = P(axis)
    fn = shard_map(
        band,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec),
    )
    return fn(lf, rf, tex)


def disparity_slab_sharded(
    left_rect: jnp.ndarray,
    right_rect: jnp.ndarray,
    cfg: StereoBMConfig,
    mesh: Mesh,
    axis: str = "disp",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disparity-slab-sharded block matching with a pmin argmin-reduce.

    Each chip evaluates ``num_disparities / n`` candidates over the whole
    image; winners combine via ``lax.pmin`` over packed int32
    ``cost·ndisp + d`` keys (SAD costs of prefiltered uint8 images are
    integer-valued, so packing is exact; ties resolve to the smallest
    disparity, matching the single-chip argmin).

    Subpixel refinement needs the winner's neighbour costs, which may live in
    the adjacent slab — each chip ppermutes its first/last cost planes to its
    neighbours and the owning slab's parabola delta is psum-combined.
    Uniqueness is a local masked min (|d − best| > 1) pmin-reduced.
    """
    H, W = left_rect.shape
    n = mesh.shape[axis]
    nd = cfg.num_disparities
    if nd % n != 0:
        raise ValueError(f"num_disparities={nd} not divisible by {n}")
    nd_local = nd // n

    lf = bm.prefilter(left_rect, cfg)
    rf = bm.prefilter(right_rect, cfg)
    tex = bm.texture_sum(lf, cfg)

    def slab(lf_r, rf_r, tex_r):
        k = jax.lax.axis_index(axis)
        # cost volume for exactly nd_local candidates at this chip's offset
        cost = _cost_slab(lf_r, rf_r, cfg, k * nd_local, nd_local)
        local_best = jnp.argmin(cost, axis=0).astype(jnp.int32)
        local_cost = jnp.min(cost, axis=0)
        # pack with 1/16-cost resolution: SAD of the xsobel prefilter is
        # integer-valued, but the normalized-response prefilter is not —
        # flooring would mis-rank near-ties (max cost·16·nd < 2^31)
        ci = jnp.where(
            local_cost >= bm._BIG, _BIG_INT,
            jnp.round(local_cost * 16.0).astype(jnp.int32),
        )
        key = ci * nd + (k * nd_local + local_best)
        key = jax.lax.pmin(key, axis)
        best_cost = (key // nd).astype(jnp.float32) / 16.0
        best_cost = jnp.where(key // nd >= _BIG_INT, bm._BIG, best_cost)
        best_d = key % nd
        valid = best_cost < bm._BIG
        r = cfg.block_radius
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        valid &= (row >= r) & (row <= H - 1 - r) & (col >= r) & (col <= W - 1 - r)
        if cfg.texture_threshold > 0:
            valid &= tex_r >= cfg.texture_threshold
        disp = (best_d + cfg.min_disparity).astype(jnp.float32)

        if cfg.refine_disparity:
            # boundary planes from neighbour slabs (ends see BIG)
            if n > 1:
                prev_pl = jax.lax.ppermute(
                    cost[-1], axis, [(i, i + 1) for i in range(n - 1)]
                )
                next_pl = jax.lax.ppermute(
                    cost[0], axis, [(i + 1, i) for i in range(n - 1)]
                )
            else:
                prev_pl = jnp.full((H, W), bm._BIG)
                next_pl = jnp.full((H, W), bm._BIG)
            prev_pl = jnp.where(k > 0, prev_pl, bm._BIG)
            next_pl = jnp.where(k < n - 1, next_pl, bm._BIG)

            local_rel = best_d - k * nd_local
            owner = (local_rel >= 0) & (local_rel < nd_local)

            def plane_at(idx):
                # gather-free plane selection: Σ_j (idx==j)·cost[j], with the
                # exchanged neighbour planes covering idx = −1 / nd_local
                acc = jnp.where(idx == -1, prev_pl,
                                jnp.where(idx == nd_local, next_pl, bm._BIG))
                for j in range(nd_local):
                    acc = jnp.where(idx == j, cost[j], acc)
                return acc

            idx0 = jnp.clip(local_rel, -1, nd_local)
            cm = plane_at(idx0 - 1)
            cp = plane_at(idx0 + 1)
            # exact winner cost from the owner's plane (the packed best_cost
            # is quantised to 1/16)
            c0 = jnp.where(owner, plane_at(idx0), 0.0)
            c0 = jax.lax.psum(jnp.where(owner, c0, 0.0), axis)
            denom = cm + cp - 2.0 * c0
            delta = jnp.where(denom > 0, (cm - cp) / (2.0 * denom), 0.0)
            delta = jnp.clip(delta, -0.5, 0.5)
            interior = (
                owner & (best_d > 0) & (best_d < nd - 1)
                & (cm < bm._BIG) & (cp < bm._BIG)
            )
            disp = disp + jax.lax.psum(jnp.where(interior, delta, 0.0), axis)

        if cfg.uniqueness_ratio > 0:
            didx = (k * nd_local
                    + jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0))
            away = jnp.abs(didx - best_d[None]) > 1
            excl = jax.lax.pmin(
                jnp.min(jnp.where(away, cost, bm._BIG), axis=0), axis
            )
            thresh = best_cost * (1.0 + cfg.uniqueness_ratio / 100.0)
            valid &= ~(excl <= thresh)

        disp = jnp.where(valid, disp, jnp.float32(cfg.min_disparity - 1))
        return disp, valid

    fn = shard_map(
        slab,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
    )
    return fn(lf, rf, tex)


def disparity_sgm_row_sharded(
    left_rect: jnp.ndarray,
    right_rect: jnp.ndarray,
    cfg: StereoBMConfig,
    mesh: Mesh,
    axis: str = "rows",
    p1: float = 10.0,
    p2: float = 120.0,
    warmup_rows: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-band-sharded SGM (4 paths).

    Horizontal paths are embarrassingly parallel per row — **exact** under
    row sharding.  Vertical paths carry state across rows; each band scans a
    ``warmup_rows`` halo (exchanged over ICI) before its own rows so the
    recurrence state converges — the standard tiled-SGM approximation (the
    SGM recurrence forgets its initialisation geometrically through the
    −min(L) normalisation; tests gate ≥99% agreement with single-chip SGM).
    """
    from ros_gpu_stereo_processor_tpu.ops import sgm as sgm_ops

    H, W = left_rect.shape
    n = mesh.shape[axis]
    if H % n != 0:
        raise ValueError(f"H={H} not divisible by mesh axis {axis}={n}")
    halo = cfg.block_radius + warmup_rows
    if halo > H // n:
        # a band can only export as many halo rows as it owns
        halo = H // n
    def band(lf_b, rf_b, tex_b):
        idx = jax.lax.axis_index(axis)
        hb = lf_b.shape[0]
        row_offset = idx * hb
        lf_e = _halo_exchange(lf_b, halo, axis)
        rf_e = _halo_exchange(rf_b, halo, axis)
        cost = bm.sad_cost_volume(lf_e, rf_e, cfg)      # (nd, hb+2*halo, W)
        invalid = cost >= bm._BIG
        cost_c = jnp.where(
            invalid, 2.0 * p2 + 255.0 * cfg.block_size**2, cost
        )
        chw = jnp.moveaxis(cost_c, 0, -1)               # (rows, W, nd)

        agg = sgm_ops._aggregate_axis(chw, 1, False, p1, p2)
        agg = agg + sgm_ops._aggregate_axis(chw, 1, True, p1, p2)
        agg = agg + sgm_ops._aggregate_axis(chw, 0, False, p1, p2)
        agg = agg + sgm_ops._aggregate_axis(chw, 0, True, p1, p2)

        agg = jnp.where(jnp.moveaxis(invalid, 0, -1), bm._BIG, agg)
        cost_agg = jnp.moveaxis(agg, -1, 0)[:, halo:-halo, :]
        disp, valid = bm.wta_disparity(
            cost_agg, lf_e[halo:-halo], cfg,
            tex=tex_b, row_offset=row_offset, total_rows=H,
        )
        return disp, valid

    lf = bm.prefilter(left_rect, cfg)
    rf = bm.prefilter(right_rect, cfg)
    tex = bm.texture_sum(lf, cfg)

    spec = P(axis)
    fn = shard_map(
        band, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec),
    )
    return fn(lf, rf, tex)


def _cost_slab(
    left_f: jnp.ndarray,
    right_f: jnp.ndarray,
    cfg: StereoBMConfig,
    d_offset: int | jnp.ndarray,
    nd_local: int,
) -> jnp.ndarray:
    """(nd_local, H, W) cost slab for disparities
    min_disparity + d_offset + [0, nd_local)."""
    H, W = left_f.shape
    mind = cfg.min_disparity
    nd = cfg.num_disparities
    r = cfg.block_radius
    max_d = mind + nd - 1
    pad_l = max(0, max_d)
    pad_r = max(0, -mind)
    right_p = jnp.pad(right_f, ((0, 0), (pad_l, pad_r)))
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def one(_, di):
        d = mind + d_offset + di
        shifted = jax.lax.dynamic_slice(right_p, (0, pad_l - d), (H, W))
        sad = jax.lax.reduce_window(
            jnp.abs(left_f - shifted), 0.0, jax.lax.add,
            (cfg.block_size, cfg.block_size), (1, 1), "SAME",
        )
        valid = (col - d >= r) & (col - d <= W - 1 - r)
        return None, jnp.where(valid, sad, bm._BIG)

    _, cost = jax.lax.scan(one, None, jnp.arange(nd_local, dtype=jnp.int32))
    return cost
