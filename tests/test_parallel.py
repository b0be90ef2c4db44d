"""Sharded-frontend tests on the virtual 8-device CPU mesh: row-band halo
exchange must be bit-identical to single-chip; slab argmin-reduce must agree
everywhere."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm
from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh
from ros_gpu_stereo_processor_tpu.parallel.frontend import (
    disparity_row_sharded,
    disparity_slab_sharded,
)
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair


@pytest.fixture(scope="module")
def pair():
    left, right, disp = synthetic_stereo_pair(96, 256, max_disparity=40, seed=0)
    return jnp.asarray(left), jnp.asarray(right)


@pytest.fixture(scope="module")
def cfg():
    return StereoBMConfig(num_disparities=48, block_size=9, texture_threshold=10)


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide the virtual CPU mesh"


@pytest.mark.parametrize("n", [2, 4, 8])
def test_row_sharded_identical(pair, cfg, n):
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    mesh = make_mesh(n, ("rows",))
    d, v = disparity_row_sharded(left, right, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-5)


def test_row_sharded_with_refine(pair):
    cfg = StereoBMConfig(num_disparities=48, block_size=9, refine_disparity=True)
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    mesh = make_mesh(4, ("rows",))
    d, v = disparity_row_sharded(left, right, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-5)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_slab_sharded_identical(pair, cfg, n):
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    mesh = make_mesh(n, ("disp",))
    d, v = disparity_slab_sharded(left, right, cfg, mesh, axis="disp")
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ref_d))


@pytest.mark.parametrize("n", [2, 4])
def test_slab_sharded_subpixel_uniqueness(pair, n):
    """Slab sharding with refine + uniqueness matches the single-chip result
    (neighbour cost planes exchanged across slab boundaries)."""
    cfg = StereoBMConfig(num_disparities=48, block_size=9,
                         texture_threshold=10, refine_disparity=True,
                         uniqueness_ratio=10)
    left, right = pair
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    mesh = make_mesh(n, ("disp",))
    d, v = disparity_slab_sharded(left, right, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-4)


def test_row_sharded_indivisible_raises(pair, cfg):
    mesh = make_mesh(5, ("rows",))
    with pytest.raises(ValueError):
        disparity_row_sharded(*pair, cfg, mesh)  # 96 % 5 != 0


@pytest.mark.parametrize("n", [2, 4])
def test_sgm_row_sharded_close_to_single(pair, n):
    """Sharded SGM: horizontal paths exact; vertical warmup-halo approximation
    must agree with single-chip SGM on ≥99% of valid pixels."""
    from ros_gpu_stereo_processor_tpu.ops.sgm import compute_disparity_sgm
    from ros_gpu_stereo_processor_tpu.parallel.frontend import (
        disparity_sgm_row_sharded,
    )

    cfg = StereoBMConfig(num_disparities=48, block_size=9, texture_threshold=10)
    left, right = pair
    ref_d, ref_v = compute_disparity_sgm(left, right, cfg, p1=8.0, p2=90.0)
    mesh = make_mesh(n, ("rows",))
    d, v = disparity_sgm_row_sharded(
        left, right, cfg, mesh, p1=8.0, p2=90.0, warmup_rows=24
    )
    ref_d, ref_v = np.asarray(ref_d), np.asarray(ref_v)
    d, v = np.asarray(d), np.asarray(v)
    assert (v == ref_v).mean() > 0.99
    both = v & ref_v
    assert (d[both] == ref_d[both]).mean() > 0.99


def test_scaling_harness_runs():
    """Scaling harness produces well-formed results on the CPU mesh (numbers
    not hardware-representative there — this validates the machinery)."""
    from ros_gpu_stereo_processor_tpu.parallel.scaling import measure_scaling

    out = measure_scaling(
        height=64, width=256,
        cfg=StereoBMConfig(num_disparities=16, block_size=5),
        device_counts=[1, 2, 4], batch=2, iters=1,
    )
    ns = [r["n_devices"] for r in out["results"]]
    assert ns == [1, 2, 4]
    assert all(r["fps"] > 0 for r in out["results"])
    assert out["efficiency"][1] == 1.0


def test_slab_sharded_128_disparities(pair):
    """BASELINE config 3 geometry: 128-candidate search sharded in slabs."""
    left, right = pair
    cfg = StereoBMConfig(num_disparities=128, block_size=9, texture_threshold=10)
    ref_d, ref_v = bm.compute_disparity(left, right, cfg)
    mesh = make_mesh(8, ("disp",))
    d, v = disparity_slab_sharded(left, right, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ref_d))
