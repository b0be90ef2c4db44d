"""Stage-level timing of the fused SGM kernel on the real chip.

Times each internal stage of ops/sgm_pallas.py (round-3 quantized layout) in
isolation to locate the bottleneck (VERDICT.md round-2 item 1).  The axon dev
tunnel makes ``block_until_ready`` a no-op, so each measurement jits a
``lax.scan`` of N perturbed executions and syncs by fetching one scalar — the
same pattern bench.py's _sgm_metric uses.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm_ops
from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import (
    _aggregate, _auto_tile_h, _cost_and_down, _round_up, _storage_dtypes,
    _wta, compute_disparity_sgm_fused,
)

N = 100


def timeit(stage_fn, *args, reps=3):
    """stage_fn(*args, i) -> array(s); returns ms per execution."""

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


def main():
    rng = np.random.default_rng(0)
    H, W = 480, 752
    left = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    right = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)

    for nd in (64, 128):
        cfg = StereoBMConfig(num_disparities=nd, block_size=15)
        p1, p2 = 10.0, 120.0
        w_pad = _round_up(W, 128)
        cost_dt, cost_bias, exc_dt, exc_bias = _storage_dtypes(
            cfg, p1, p2, True)
        tile_h = _auto_tile_h(nd, w_pad,
                              jnp.dtype(cost_dt).itemsize,
                              jnp.dtype(exc_dt).itemsize,
                              quant=jnp.dtype(cost_dt) != jnp.float32)
        h_pad = _round_up(H, max(tile_h, 32))
        lf = bm_ops.prefilter(left, cfg)
        rf = bm_ops.prefilter(right, cfg)

        cd = jax.jit(lambda a, b: _cost_and_down(
            a, b, cfg, p1, p2, h_pad, tile_h, cost_dt, cost_bias, exc_dt,
            exc_bias, False))
        cost, exc_dn = cd(lf, rf)
        cost_t = jnp.swapaxes(cost, 1, 2)

        t_pre = timeit(lambda l, i: bm_ops.prefilter(l + i, cfg), lf)
        t_cd = timeit(lambda a, b, i: _cost_and_down(
            a + i, b, cfg, p1, p2, h_pad, tile_h, cost_dt, cost_bias,
            exc_dt, exc_bias, False), lf, rf)
        t_up = timeit(lambda c, e, i: _aggregate(
            c + i.astype(c.dtype), e, cfg, p1, p2, True, tile_h, cost_bias,
            exc_dt, exc_bias, False), cost, exc_dn)
        t_tr = timeit(lambda c, i: jnp.swapaxes(c + i.astype(c.dtype), 1, 2),
                      cost)
        t_lr = timeit(lambda c, i: _aggregate(
            c + i.astype(c.dtype), None, cfg, p1, p2, False, tile_h,
            cost_bias, exc_dt, exc_bias, False), cost_t)
        t_rl = timeit(lambda c, e, i: _aggregate(
            c + i.astype(c.dtype), e, cfg, p1, p2, True, tile_h, cost_bias,
            exc_dt, exc_bias, False), cost_t, exc_dn.swapaxes(1, 2))
        t_tr8 = timeit(
            lambda c, i: jnp.swapaxes(c + i.astype(c.dtype), 1, 2), exc_dn)
        t_wta = timeit(lambda c, ev, eh, i: _wta(
            c + i.astype(c.dtype), ev, eh, cfg, W, tile_h, cost_bias,
            exc_bias, False), cost, exc_dn, exc_dn)
        t_full = timeit(
            lambda l, r, i: compute_disparity_sgm_fused(
                l + i.astype(jnp.uint8), r, cfg, p1, p2, tile_h),
            left, right,
        )

        print(f"--- nd={nd} (752x480, block 15, tile_h={tile_h}, "
              f"cost={jnp.dtype(cost_dt).name}, exc={jnp.dtype(exc_dt).name}) ---")
        print(f"prefilter          : {t_pre:7.3f} ms")
        print(f"cost+down kernel   : {t_cd:7.3f} ms")
        print(f"up (pair sum)      : {t_up:7.3f} ms")
        print(f"transpose i16 (XLA): {t_tr:7.3f} ms")
        print(f"lr on T            : {t_lr:7.3f} ms")
        print(f"rl on T (pair sum) : {t_rl:7.3f} ms")
        print(f"transpose i8 (XLA) : {t_tr8:7.3f} ms")
        print(f"WTA kernel         : {t_wta:7.3f} ms")
        stages = (t_pre * 2 + t_cd + t_up + t_tr + t_lr + t_rl + t_tr8
                  + t_wta)
        print(f"sum of stages      : {stages:7.3f} ms")
        print(f"full fused SGM     : {t_full:7.3f} ms")


if __name__ == "__main__":
    main()
