"""Noise-robust stage timing on the tunneled TPU.

Wall-clock over the dev tunnel has ±20% scheduling noise; comparing single
runs is meaningless.  This harness times each candidate as min-over-trials of
(dispatch of a B-frame lax.scan), interleaving candidates round-robin so slow
phases of the tunnel hit every candidate equally.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_runner(fn, B, *frame_args):
    """fn(l, r) -> pytree; returns jitted scalar-checksum batch runner."""

    @jax.jit
    def run_batch(ls, rs):
        def step(c, lr):
            out = fn(lr[0], lr[1])
            s = sum(
                jnp.sum(jnp.nan_to_num(v.astype(jnp.float32)))
                for v in jax.tree_util.tree_leaves(out)
            )
            return c, s

        _, s = jax.lax.scan(step, 0, (ls, rs))
        return jnp.sum(s)

    return run_batch


def ab(candidates, lefts, rights, trials=6, reps=3):
    """candidates: {name: fn(l, r) -> pytree}.  Prints min ms/frame each."""
    B = lefts.shape[0]
    runners = {}
    for name, fn in candidates.items():
        r = make_runner(fn, B)
        float(r(lefts, rights))  # compile
        float(r(lefts, rights))
        runners[name] = r
    best = {name: float("inf") for name in runners}
    for _ in range(trials):
        for name, r in runners.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                float(r(lefts, rights))
            dt = (time.perf_counter() - t0) / reps
            best[name] = min(best[name], dt)
    for name, dt in best.items():
        print(f"{name:36s} {dt / B * 1000:8.3f} ms/frame  ({B / dt:7.1f} fps)")
    return best


if __name__ == "__main__":
    from __graft_entry__ import _model_and_frame
    from ros_gpu_stereo_processor_tpu.config import (
        Outputs, SpeckleConfig, StereoBMConfig,
    )
    from ros_gpu_stereo_processor_tpu.models.pipeline import _pipeline_step
    from ros_gpu_stereo_processor_tpu.ops import speckle as speckle_ops
    from ros_gpu_stereo_processor_tpu.ops import reproject as reproject_ops
    from ros_gpu_stereo_processor_tpu.ops import stereobm as bm_ops
    from ros_gpu_stereo_processor_tpu.ops.remap_pallas import PallasRemapper
    from ros_gpu_stereo_processor_tpu.ops.stereobm_pallas import compute_disparity_fused

    model, left, right = _model_and_frame()
    shape = (model.left.calib.height, model.left.calib.width)
    rl = PallasRemapper(model.left.rect_map, shape)
    rr = PallasRemapper(model.right.rect_map, shape)
    remappers = {"left": rl, "right": rr}
    maps = jnp.asarray(model.rect_maps_stacked())
    Q = jnp.asarray(model.Q.astype(np.float32))
    B = int(os.environ.get("AB_BATCH", "8"))
    lefts = jnp.asarray(np.stack([left] * B))
    rights = jnp.asarray(np.stack([right] * B))
    bm = StereoBMConfig(num_disparities=64, block_size=15, texture_threshold=10)
    sp0 = SpeckleConfig(max_speckle_size=0, max_diff=5.0, propagation_iters=16)
    outputs = Outputs.of("disparity", "pointcloud")

    def base(l, r, speckle_method=None):
        out = _pipeline_step(
            l, r, maps, Q, encoding="mono8", outputs=outputs,
            bm=bm, speckle=sp0, use_pallas=True, remappers=remappers,
        )
        if speckle_method:
            d, v = speckle_ops.filter_speckles(
                out["disparity"], out["disparity_valid"], 800, 5.0, 16,
                method=speckle_method,
            )
            out["disparity"], out["disparity_valid"] = d, v
        return out

    # stage-isolated candidates
    rect = jax.jit(lambda l, r: (rl(l.astype(jnp.float32)), rr(r.astype(jnp.float32))))
    rect_l, rect_r = rect(lefts[0], rights[0])
    rect_ls = jnp.stack([rect_l] * B)
    rect_rs = jnp.stack([rect_r] * B)

    print("== full pipeline variants ==")
    ab(
        {
            "pipeline+speckle:pallas": lambda l, r: base(l, r, "pallas"),
            "pipeline+speckle:scan": lambda l, r: base(l, r, "scan"),
            "pipeline (no speckle)": lambda l, r: base(l, r, None),
        },
        lefts, rights,
    )
    print("== stages (isolated) ==")
    ab(
        {
            "rectify pallas x2": lambda l, r: rect(l, r),
            "stereobm fused": lambda l, r: compute_disparity_fused(l, r, bm),
            "prefilter x2": lambda l, r: (bm_ops.prefilter(l, bm), bm_ops.prefilter(r, bm)),
        },
        rect_ls, rect_rs,
    )
