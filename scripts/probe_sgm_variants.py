"""Probe: where does the SGM aggregation pass spend its ~1 ms?

Variants of the _aggregate kernel timed on the real chip:
  * copy   — per-row block copy only (no recurrence): data-movement floor
  * cur    — the shipped _sgm_step (two full-plane concatenates per row)
  * guard  — carry kept in an (nd+16, W) scratch with BIG guard rows, so the
             d±1 shifts are static slices instead of concatenate copies
  * tile_h sweep for the winner
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm_ops
from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import (
    _aggregate, _cost_and_down, _load, _round_up, _storage_dtypes, _store,
)

N = 100
_BIG = 1e9


def timeit(stage_fn, *args, reps=3):
    @jax.jit
    def run(args):
        def step(c, i):
            outs = stage_fn(*args, i)
            s = sum(jnp.sum(o.reshape(-1)[:1].astype(jnp.float32))
                    for o in jax.tree.leaves(outs))
            return c + s, ()
        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(N, dtype=jnp.int32))
        return tot

    for _ in range(2):
        float(run(args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(args))
    return (time.perf_counter() - t0) / (reps * N) * 1e3


def agg_variant(cost, cfg, p1, p2, tile_h, cost_bias, exc_dt, exc_bias,
                mode):
    """_aggregate clone, forward walk, no exc_in, selectable row body."""
    nd, h_pad, w_pad = cost.shape
    n_bands = h_pad // tile_h
    quant = cost.dtype != jnp.float32
    GUARD = 8  # sublane-aligned guard band of BIG at each end

    def kernel(cost_ref, exc_ref, carry, *rest):
        exc_blk = rest[0] if quant else exc_ref
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            if mode == "guard":
                carry[:] = jnp.full((nd + 2 * GUARD, w_pad), _BIG,
                                    jnp.float32)
                carry[GUARD:GUARD + nd, :] = jnp.zeros((nd, w_pad),
                                                       jnp.float32)
            else:
                carry[:] = jnp.zeros((nd, w_pad), jnp.float32)

        costf = _load(cost_ref[:], cost_bias)
        if mode == "copy":
            for j in range(tile_h):
                exc_blk[:, j, :] = costf[:, j, :]
        elif mode == "cur":
            prev = carry[:]
            for j in range(tile_h):
                c = costf[:, j, :]
                m = jnp.min(prev, axis=0, keepdims=True)
                big_row = jnp.full_like(prev[:1], _BIG)
                up = jnp.concatenate([prev[1:], big_row], axis=0)
                dn = jnp.concatenate([big_row, prev[:-1]], axis=0)
                best = jnp.minimum(jnp.minimum(prev, m + p2),
                                   jnp.minimum(up + p1, dn + p1))
                excess = best - m
                prev = c + excess
                exc_blk[:, j, :] = excess
            carry[:] = prev
        elif mode == "guard":
            for j in range(tile_h):
                c = costf[:, j, :]
                prev = carry[GUARD:GUARD + nd, :]
                m = jnp.min(prev, axis=0, keepdims=True)
                up = carry[GUARD + 1:GUARD + nd + 1, :]
                dn = carry[GUARD - 1:GUARD + nd - 1, :]
                best = jnp.minimum(jnp.minimum(prev, m + p2),
                                   jnp.minimum(up + p1, dn + p1))
                excess = best - m
                exc_blk[:, j, :] = excess
                carry[GUARD:GUARD + nd, :] = c + excess
            # guard rows stay BIG
        if quant:
            exc_ref[:] = _store(exc_blk[:], exc_dt, exc_bias)

    bmap = lambda w, b: (0, b, w)
    spec = pl.BlockSpec((nd, tile_h, w_pad), bmap, memory_space=pltpu.VMEM)
    carry_rows = nd + 2 * GUARD if mode == "guard" else nd
    return pl.pallas_call(
        kernel,
        grid=(1, n_bands),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nd, h_pad, w_pad), exc_dt),
        scratch_shapes=[pltpu.VMEM((carry_rows, w_pad), jnp.float32)] + (
            [pltpu.VMEM((nd, tile_h, w_pad), jnp.float32)] if quant else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cost)


def main():
    rng = np.random.default_rng(0)
    H, W = 480, 752
    left = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    right = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    p1, p2 = 10.0, 120.0

    for nd in (64,):
        cfg = StereoBMConfig(num_disparities=nd, block_size=15)
        w_pad = _round_up(W, 128)
        cost_dt, cost_bias, exc_dt, exc_bias = _storage_dtypes(
            cfg, p1, p2, True)
        h_pad = _round_up(H, 32)
        lf = bm_ops.prefilter(left.astype(jnp.float32), cfg)
        rf = bm_ops.prefilter(right.astype(jnp.float32), cfg)
        cost, _ = jax.jit(lambda a, b: _cost_and_down(
            a, b, cfg, p1, p2, h_pad, 8, cost_dt, cost_bias, exc_dt,
            exc_bias, False))(lf, rf)

        for mode in ("copy", "cur", "guard"):
            for th in (8, 16, 32):
                t = timeit(
                    lambda c, i: agg_variant(
                        c + i.astype(c.dtype), cfg, p1, p2, th, cost_bias,
                        exc_dt, exc_bias, mode),
                    cost)
                print(f"nd={nd} mode={mode:5s} tile_h={th:2d}: {t:7.3f} ms",
                      flush=True)
        # f32 storage for reference (no staging casts)
        costf = _load(cost, cost_bias)
        for th in (8, 32):
            t = timeit(
                lambda c, i: agg_variant(
                    c + i, cfg, p1, p2, th, 0.0, jnp.float32, 0.0, "guard"),
                costf)
            print(f"nd={nd} mode=guardF tile_h={th:2d}: {t:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
