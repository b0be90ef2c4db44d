"""Fused Pallas SGM vs the jnp oracle (ops/sgm.py) — exact parity.

Runs in the Pallas interpreter on the CPU CI mesh; the perf claim is
validated on hardware by scripts/profile_stages.py / bench runs.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import sgm as sgm_ops
from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import (
    compute_disparity_sgm_fused,
)
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair


@pytest.fixture(scope="module")
def pair():
    left, right, _ = synthetic_stereo_pair(48, 160, max_disparity=12, seed=0)
    return jnp.asarray(left), jnp.asarray(right)


def _check(pair, cfg, p1=10.0, p2=120.0, atol=1e-3):
    left, right = pair
    ref_d, ref_v = sgm_ops.compute_disparity_sgm(
        left, right, cfg, p1=p1, p2=p2, num_paths=4
    )
    d, v = compute_disparity_sgm_fused(left, right, cfg, p1=p1, p2=p2)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=atol)


def test_sgm_fused_basic(pair):
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                texture_threshold=5))


def test_sgm_fused_refine_uniqueness(pair):
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                texture_threshold=5, refine_disparity=True,
                                uniqueness_ratio=10))


def test_sgm_fused_block9(pair):
    _check(pair, StereoBMConfig(num_disparities=16, block_size=9,
                                texture_threshold=10))


def test_sgm_fused_min_disparity(pair):
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                min_disparity=2, texture_threshold=5))


def test_sgm_fused_lr_check(pair):
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                texture_threshold=5, lr_check=True))


def test_sgm_fused_32disp():
    left, right, _ = synthetic_stereo_pair(40, 192, max_disparity=24, seed=3)
    _check((jnp.asarray(left), jnp.asarray(right)),
           StereoBMConfig(num_disparities=32, block_size=5,
                          texture_threshold=5))


def test_sgm_fused_float_input_fallback(pair):
    """Non-integer images take the f32-volume fallback path; parity must
    hold there too (the pipeline normally feeds uint8 rectified mono)."""
    left, right = pair
    fpair = (left.astype(jnp.float32) + 0.25, right.astype(jnp.float32) + 0.25)
    _check(fpair, StereoBMConfig(num_disparities=16, block_size=5,
                                 texture_threshold=5))


def test_sgm_fused_fractional_penalties(pair):
    """Fractional P1/P2 disable quantized storage — f32 fallback parity."""
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                texture_threshold=5), p1=7.5, p2=93.25)


def test_sgm_fused_large_p2_int16(pair):
    """2·P2 > 255 selects int16 excess storage — still exact."""
    _check(pair, StereoBMConfig(num_disparities=16, block_size=5,
                                texture_threshold=5), p1=20.0, p2=600.0)


def test_fused_sgm_odd_width_exact():
    """Width far from a 128 multiple: the padded columns must be NEUTRAL in
    the transposed reverse walk (regression — clampv-filled pad columns
    leaked a nonzero excess profile into the rightmost real columns)."""
    rng = np.random.default_rng(7)
    l = jnp.asarray(rng.integers(0, 255, (48, 200)), jnp.uint8)
    r = jnp.asarray(rng.integers(0, 255, (48, 200)), jnp.uint8)
    cfg = StereoBMConfig(num_disparities=16, block_size=5,
                         texture_threshold=10, refine_disparity=True)
    d1, v1 = compute_disparity_sgm_fused(l, r, cfg)
    d2, v2 = sgm_ops.compute_disparity_sgm(l, r, cfg)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    both = np.asarray(v1) & np.asarray(v2)
    np.testing.assert_array_equal(np.asarray(d1)[both], np.asarray(d2)[both])


def test_auto_tile_h_band_choices():
    """Band sizing models real VMEM residency: the production geometry picks
    the chip-measured winners (64-row bands at 64 disp, 32 at 128 — 64 rows
    at 128 disp exceeds the scoped VMEM limit) and degrades monotonically."""
    from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import _auto_tile_h

    # quantized storage (int16 cost + int8 excess), w_pad = 768 (752 wide)
    assert _auto_tile_h(64, 768, 2, 1, quant=True) == 64
    assert _auto_tile_h(128, 768, 2, 1, quant=True) == 32
    # f32 fallback halves the admissible band at 128 disp
    assert _auto_tile_h(128, 768, 4, 4, quant=False) == 32
    # pathological geometry still returns a legal (multiple-of-8) band
    assert _auto_tile_h(512, 4096, 4, 4, quant=False) in (8, 16)
