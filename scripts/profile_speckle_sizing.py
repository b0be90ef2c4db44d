"""Measure component-sizing building blocks on the real chip.

VERDICT round-2 item 2: the two full-image (361k-key) device sorts in
ops/speckle.py's sizing are the most expensive stage of the flagship
pipeline (~2.4 ms).  This probe times the candidate replacements:

  * full-image sort (baseline) with 1 and 2 payloads
  * per-band BATCHED sorts (sort along last axis of (nb, HW/nb))
  * the small reconciliation sort (boundary rows only)
  * one OR-propagation round (segmented scans)
  * the size>T decision (_keep_large_components) end to end

Timing uses the scan-amortised scalar-fetch pattern (bench.py::_sgm_metric):
``block_until_ready`` is a no-op over the axon tunnel.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from ros_gpu_stereo_processor_tpu.ops import speckle as sp

N = 100
H, W = 480, 752


def timeit(fn, *args, reps=3):
    @jax.jit
    def run(args):
        def step(c, i):
            outs = fn(*jax.tree.map(
                lambda a: a if not jnp.issubdtype(a.dtype, jnp.integer)
                else a + (i % 2).astype(a.dtype), args))
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
    n = H * W
    lab = jnp.asarray(rng.integers(0, n, (n,)), jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    isb = jnp.asarray(rng.random(n) < 0.07)

    print(f"full sort 1payload: "
          f"{timeit(lambda l, p: jax.lax.sort((l, p), num_keys=1), lab, pos):.3f} ms")
    print(f"full sort 2payload: "
          f"{timeit(lambda l, p, b: jax.lax.sort((l, p, b), num_keys=1), lab, pos, isb):.3f} ms")

    for nb in (8, 16, 32):
        lab_b = lab.reshape(nb, -1)
        pos_b = pos.reshape(nb, -1)
        print(f"batched sort nb={nb}: "
              f"{timeit(lambda l, p: jax.lax.sort((l, p), num_keys=1, dimension=1), lab_b, pos_b):.3f} ms")

    small = jnp.asarray(rng.integers(0, n, (24064,)), jnp.int32)
    spos = jnp.arange(24064, dtype=jnp.int32)
    print(f"small sort (24k):   "
          f"{timeit(lambda l, p: jax.lax.sort((l, p), num_keys=1, dimension=0), small, spos):.3f} ms")

    # one segmented-scan OR-propagation round (row + column)
    disp = jnp.asarray(rng.integers(0, 64, (H, W)), jnp.float32)
    valid = jnp.asarray(rng.random((H, W)) < 0.9)

    def or_round(bit, d, v):
        left_d = sp._shift(d, 0, 1, jnp.inf)
        left_v = sp._shift(v, 0, 1, False)
        conn_x = v & left_v & (jnp.abs(d - left_d) <= 5.0)
        up_d = sp._shift(d, 1, 0, jnp.inf)
        up_v = sp._shift(v, 1, 0, False)
        conn_y = v & up_v & (jnp.abs(d - up_d) <= 5.0)
        neg = (1 - bit).astype(jnp.int32)
        neg = sp._segmented_min_scan(neg, conn_x, axis=1)
        neg = sp._segmented_min_scan(neg, conn_y, axis=0)
        return 1 - neg

    bit = jnp.asarray(rng.integers(0, 2, (H, W)), jnp.int32)
    print(f"OR-scan round:      {timeit(or_round, bit, disp, valid):.3f} ms")

    lab_img = lab.reshape(H, W)
    print(f"sizing (current):   "
          f"{timeit(lambda l: sp._keep_large_components(l, 800), lab_img):.3f} ms")

    # full current filter for reference
    print(f"filter_speckles scan:   "
          f"{timeit(lambda d, v: sp.filter_speckles(d, v)[0], disp, valid):.3f} ms")
    print(f"filter_speckles pallas: "
          f"{timeit(lambda d, v: sp.filter_speckles(d, v, method='pallas')[0], disp, valid):.3f} ms")


if __name__ == "__main__":
    main()
