"""Fused Pallas kernel vs the jnp oracle: exact parity (runs the Pallas
interpreter on CPU CI; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm
from ros_gpu_stereo_processor_tpu.ops import stereobm_pallas as bmp
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair


@pytest.fixture(scope="module")
def pair():
    left, right, _ = synthetic_stereo_pair(96, 200, max_disparity=40, seed=0)
    return jnp.asarray(left), jnp.asarray(right)


@pytest.mark.parametrize(
    "kw",
    [
        dict(num_disparities=48, block_size=9, texture_threshold=10),
        dict(num_disparities=48, block_size=9, refine_disparity=True),
        dict(num_disparities=64, block_size=15, texture_threshold=0),
        dict(num_disparities=48, block_size=5, min_disparity=4),
        dict(num_disparities=16, block_size=21, texture_threshold=10),
        # the reference's construction default (src/GPUStereoProcessor.cpp:18)
        # — exercises the 16+4−1 subtractive window decomposition
        dict(num_disparities=48, block_size=19, texture_threshold=10),
    ],
)
def test_fused_matches_oracle(pair, kw):
    cfg = StereoBMConfig(**kw)
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    d, v = bmp.compute_disparity_fused(left, right, cfg, tile_h=16)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-3)


def test_fused_width_multiple_of_128():
    """W an exact lane multiple: w_pad must still reserve >= block zeroed
    slack lanes (the r05 rule — without the bump, window-sum rolls wrap
    REAL right-edge values into left-edge windows)."""
    left, right, _ = synthetic_stereo_pair(48, 256, max_disparity=24, seed=5)
    cfg = StereoBMConfig(num_disparities=32, block_size=9,
                         texture_threshold=5)
    ref_d, ref_v = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    d, v = bmp.compute_disparity_fused(jnp.asarray(left), jnp.asarray(right), cfg)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-3)


def test_fused_nonaligned_shape():
    """H not a multiple of tile_h, W not a multiple of 128."""
    left, right, _ = synthetic_stereo_pair(70, 130, max_disparity=24, seed=3)
    cfg = StereoBMConfig(num_disparities=32, block_size=7, texture_threshold=5)
    ref_d, ref_v = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    d, v = bmp.compute_disparity_fused(jnp.asarray(left), jnp.asarray(right), cfg, tile_h=16)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-3)


def test_fused_uniqueness_matches_oracle(pair):
    """uniqueness_ratio runs in-kernel (second masked sweep) and matches the
    oracle exactly."""
    cfg = StereoBMConfig(num_disparities=48, block_size=9, uniqueness_ratio=10)
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    d, v = bmp.compute_disparity_fused(left, right, cfg, tile_h=16)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-3)


def test_fused_lr_check_property(pair):
    """lr_check on the fused path only removes pixels and keeps most of a
    coherent scene (exact dr definition differs from the jnp path: mirrored
    right-centered windows vs shared left-centered cost volume)."""
    base = StereoBMConfig(num_disparities=48, block_size=9, texture_threshold=10)
    lr = base.replace(lr_check=True)
    left, right = pair
    d0, v0 = bmp.compute_disparity_fused(left, right, base, tile_h=16)
    d1, v1 = bmp.compute_disparity_fused(left, right, lr, tile_h=16)
    v0, v1 = np.asarray(v0), np.asarray(v1)
    assert (v1 <= v0).all()
    assert v1.sum() > 0.7 * v0.sum()
    # surviving disparities unchanged
    both = v1
    np.testing.assert_allclose(np.asarray(d1)[both], np.asarray(d0)[both])
