"""Per-stage TPU timing: where does the per-frame budget go?

Times each pipeline stage in isolation with the same batched-scan dispatch
bench.py uses (amortising tunnel RTT), prints ms/frame per stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _model_and_frame
from ros_gpu_stereo_processor_tpu.config import Outputs, SpeckleConfig, StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import remap as remap_ops
from ros_gpu_stereo_processor_tpu.ops import reproject as reproject_ops
from ros_gpu_stereo_processor_tpu.ops import speckle as speckle_ops
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm_ops
from ros_gpu_stereo_processor_tpu.ops.remap_pallas import PallasRemapper
from ros_gpu_stereo_processor_tpu.ops.stereobm_pallas import compute_disparity_fused

B = 16
model, left, right = _model_and_frame()
bm = StereoBMConfig(num_disparities=64, block_size=15, texture_threshold=10)
sp = SpeckleConfig(max_speckle_size=800, max_diff=5.0, propagation_iters=16)

maps = jnp.asarray(model.rect_maps_stacked())
Q = jnp.asarray(model.Q.astype(np.float32))
lefts = jnp.asarray(np.stack([left] * B))
rights = jnp.asarray(np.stack([right] * B))

shape = (model.left.calib.height, model.left.calib.width)
rl = PallasRemapper(model.left.rect_map, shape)
rr = PallasRemapper(model.right.rect_map, shape)
print("pallas remap usable:", rl.usable and rr.usable)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    jax.block_until_ready(f(*args))
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt / B * 1000:8.3f} ms/frame   ({dt*1000:.1f} ms/dispatch of {B})")
    return dt


def scan_over(fn):
    def run(ls, rs):
        def step(c, lr):
            out = fn(lr[0], lr[1])
            s = sum(jnp.sum(jnp.nan_to_num(v.astype(jnp.float32))) for v in jax.tree_util.tree_leaves(out))
            return c, s
        _, s = jax.lax.scan(step, 0, (ls, rs))
        return jnp.sum(s)
    return run


# --- null dispatch: fixed per-dispatch overhead of the device tunnel ---
timeit("null (dispatch overhead)", scan_over(lambda l, r: l[0, 0] + r[0, 0]),
       lefts, rights)

# --- stage: rectify (pallas) ---
def rect_pallas(l, r):
    lf = l.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    return rl(lf), rr(rf)

timeit("rectify pallas", scan_over(rect_pallas), lefts, rights)

# --- stage: rectify (jnp) ---
def rect_jnp(l, r):
    return remap_ops.rectify_pair(jnp.stack([l, r]), maps)

timeit("rectify jnp", scan_over(rect_jnp), lefts, rights)

# --- stage: stereobm fused (incl prefilter) ---
rect_l, rect_r = jax.jit(rect_pallas)(lefts[0], rights[0])
rls = jnp.stack([rect_l] * B)
rrs = jnp.stack([rect_r] * B)

def bm_fused(l, r):
    return compute_disparity_fused(l, r, bm)

timeit("stereobm pallas fused", scan_over(bm_fused), rls, rrs)

# --- stereobm without uniqueness (1 sweep) ---
bm_nouniq = bm.replace(uniqueness_ratio=0)
timeit("stereobm pallas (no uniq)", scan_over(lambda l, r: compute_disparity_fused(l, r, bm_nouniq)), rls, rrs)

# --- prefilter alone ---
timeit("prefilter xsobel", scan_over(lambda l, r: (bm_ops.prefilter(l, bm), bm_ops.prefilter(r, bm))), rls, rrs)

# --- speckle ---
disp, valid = jax.jit(lambda l, r: compute_disparity_fused(l, r, bm))(rect_l, rect_r)
disps = jnp.stack([disp] * B)
valids = jnp.stack([valid] * B)

def speck(d, v):
    return speckle_ops.filter_speckles(d, v, sp.max_speckle_size, sp.max_diff, sp.propagation_iters)

timeit("speckle filter (scan)", scan_over(speck), disps, valids)


def speck_pallas(d, v):
    return speckle_ops.filter_speckles(
        d, v, sp.max_speckle_size, sp.max_diff, sp.propagation_iters,
        method="pallas",
    )

timeit("speckle filter (pallas)", scan_over(speck_pallas), disps, valids)

# --- SGM: jnp scans vs fused Pallas (ops/sgm_pallas.py) ---
from ros_gpu_stereo_processor_tpu.ops import sgm as sgm_ops
from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import compute_disparity_sgm_fused

timeit("sgm jnp (4 paths)",
       scan_over(lambda l, r: sgm_ops.compute_disparity_sgm(l, r, bm)),
       rls, rrs)
timeit("sgm pallas fused",
       scan_over(lambda l, r: compute_disparity_sgm_fused(l, r, bm)),
       rls, rrs)

# --- bilateral refinement (ops/bilateral.py, §2.8b) ---
from ros_gpu_stereo_processor_tpu.ops.bilateral import disparity_bilateral_filter

def bilat(d, g):
    return disparity_bilateral_filter(
        d.astype(jnp.float32), g, ndisp=bm.num_disparities, radius=3, iters=1
    )

timeit("bilateral refine", scan_over(bilat), disps, rls)

# --- reproject ---
def repro(d, v):
    return reproject_ops.reproject_disparity(d, Q, v)

timeit("reproject Q", scan_over(repro), disps, valids)

# --- full pipeline for reference ---
from ros_gpu_stereo_processor_tpu.models.pipeline import _pipeline_step
outputs = Outputs.of("disparity", "pointcloud")
remappers = {"left": rl, "right": rr}

def full(l, r):
    return _pipeline_step(l, r, maps, Q, encoding="mono8", outputs=outputs,
                          bm=bm, speckle=sp, use_pallas=True, remappers=remappers)

timeit("FULL pipeline", scan_over(full), lefts, rights)
