"""Pallas windowed-remap kernel vs the jnp oracle (interpreter on CPU CI)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.ops.remap import remap_bilinear
from ros_gpu_stereo_processor_tpu.ops.remap_pallas import PallasRemapper, build_plan


def test_plan_real_calibration(stereo_model):
    plan = build_plan(stereo_model.left.rect_map, (480, 752))
    assert plan.ok, "real rectification map must fit the windowed plan"


def test_matches_oracle_real_map(stereo_model, kitchen_images):
    r = PallasRemapper(stereo_model.left.rect_map, (480, 752))
    assert r.usable
    img = jnp.asarray(kitchen_images["left"])
    ref = np.asarray(remap_bilinear(img, jnp.asarray(stereo_model.left.rect_map)))
    ours = np.asarray(r(img))
    # float accumulation order differs per-tap; integer rounding may flip
    # isolated pixels by 1 LSB
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-4


def test_matches_oracle_float():
    rng = np.random.default_rng(0)
    H, W = 64, 256
    img = rng.random((H, W)).astype(np.float32)
    # gentle synthetic warp (rotation-like + offset)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    m = np.stack([xx + 3.5 + 0.01 * yy, yy - 2.25 + 0.01 * xx], -1).astype(np.float32)
    r = PallasRemapper(m, (H, W))
    assert r.usable
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(m)))
    ours = np.asarray(r(jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_out_of_range_zeros():
    H, W = 32, 128
    img = np.full((H, W), 7.0, np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    m = np.stack([xx - 20.0, yy], -1).astype(np.float32)  # left cols OOB
    r = PallasRemapper(m, (H, W))
    out = np.asarray(r(jnp.asarray(img)))
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(m)))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert (out[:, :19] == 0).all()


def test_color_channels(stereo_model):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (480, 752, 3), np.uint8)
    r = PallasRemapper(stereo_model.left.rect_map, (480, 752))
    ref = np.asarray(
        remap_bilinear(jnp.asarray(img), jnp.asarray(stereo_model.left.rect_map))
    )
    ours = np.asarray(r(jnp.asarray(img)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fallback_on_wild_map():
    """A pathological map (random teleports) must trip the plan check and
    fall back to the oracle, still giving exact results."""
    rng = np.random.default_rng(2)
    H, W = 64, 256
    img = rng.random((H, W)).astype(np.float32)
    m = np.stack(
        [rng.uniform(0, W - 1, (H, W)), rng.uniform(0, H - 1, (H, W))], -1
    ).astype(np.float32)
    r = PallasRemapper(m, (H, W))
    assert not r.usable
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(m)))
    ours = np.asarray(r(jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_banded_matches_oracle_real_map(stereo_model, kitchen_images):
    """Row-banded kernel under shard_map (interpret on CPU CI) matches the
    jnp oracle — the mesh pipeline's rectify stage (round-4 item 3)."""
    from ros_gpu_stereo_processor_tpu.ops.remap_pallas import (
        BandedPallasRemapper,
    )
    from ros_gpu_stereo_processor_tpu.parallel.frontend import (
        remap_row_sharded,
    )
    from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh

    n = 4
    mesh = make_mesh(n, ("rows",))
    br = BandedPallasRemapper(stereo_model.left.rect_map, (480, 752), n)
    assert br.ok, "real calibration must fit the banded windowed plan"
    img = jnp.asarray(kitchen_images["left"])
    ref = np.asarray(
        remap_bilinear(img, jnp.asarray(stereo_model.left.rect_map))
    )
    ours = np.asarray(remap_row_sharded(img, br, mesh, "rows"))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-4


def test_banded_matches_unbanded_float():
    """Banded (4-way) and unbanded kernels agree exactly on float input."""
    from ros_gpu_stereo_processor_tpu.ops.remap_pallas import (
        BandedPallasRemapper,
    )
    from ros_gpu_stereo_processor_tpu.parallel.frontend import (
        remap_row_sharded,
    )
    from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    H, W = 64, 256
    img = rng.random((H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    m = np.stack(
        [xx + 2.5 - 0.02 * yy, yy + 1.75 + 0.015 * xx], -1
    ).astype(np.float32)
    mesh = make_mesh(4, ("rows",))
    br = BandedPallasRemapper(m, (H, W), 4)
    assert br.ok
    single = PallasRemapper(m, (H, W))
    ref = np.asarray(single(jnp.asarray(img)))
    ours = np.asarray(remap_row_sharded(jnp.asarray(img), br, mesh, "rows"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
