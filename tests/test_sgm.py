"""SGM tests: exact parity with a straightforward numpy oracle, and the
qualitative property SGM exists for — robustness in low-texture regions."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import sgm as SGM
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair


def numpy_sgm_aggregate(cost, p1, p2, num_paths=4):
    """Reference O(paths·H·W·nd) SGM aggregation, straight from the paper."""
    H, W, nd = cost.shape
    total = np.zeros_like(cost)

    def scan(path):
        agg = np.zeros_like(cost)
        for p in path:
            (y, x), prev = p
            c = cost[y, x]
            if prev is None:
                agg[y, x] = c
            else:
                lp = agg[prev]
                m = lp.min()
                cand = np.minimum(lp, m + p2)
                cand[:-1] = np.minimum(cand[:-1], lp[1:] + p1)
                cand[1:] = np.minimum(cand[1:], lp[:-1] + p1)
                agg[y, x] = c + cand - m
        return agg

    # left→right / right→left
    for rev in (False, True):
        path = []
        for y in range(H):
            xs = range(W - 1, -1, -1) if rev else range(W)
            prev = None
            for x in xs:
                path.append(((y, x), prev))
                prev = (y, x)
        total += scan(path)
    if num_paths >= 4:
        for rev in (False, True):
            path = []
            for x in range(W):
                ys = range(H - 1, -1, -1) if rev else range(H)
                prev = None
                for y in ys:
                    path.append(((y, x), prev))
                    prev = (y, x)
            total += scan(path)
    return total


def test_aggregation_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    H, W, nd = 10, 14, 8
    cost = rng.uniform(0, 50, (H, W, nd)).astype(np.float32)
    p1, p2 = 4.0, 30.0
    ref = numpy_sgm_aggregate(cost, p1, p2)

    ours = SGM._aggregate_axis(jnp.asarray(cost), 1, False, p1, p2)
    ours = ours + SGM._aggregate_axis(jnp.asarray(cost), 1, True, p1, p2)
    ours = ours + SGM._aggregate_axis(jnp.asarray(cost), 0, False, p1, p2)
    ours = ours + SGM._aggregate_axis(jnp.asarray(cost), 0, True, p1, p2)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-3)


def _lowtex_pair(H=96, W=240, maxd=24, seed=0, texture_fraction=0.3):
    """Random-dot pair where only a fraction of pixels carry texture —
    block matching alone is ambiguous in the flat areas."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    disp = np.round(maxd * 0.3 + maxd * 0.4 * xx / W).astype(np.float32)
    M = maxd + 8
    base = np.full((H, W + M), 120, np.uint8)
    mask = rng.random((H, W + M)) < texture_fraction
    base[mask] = rng.integers(0, 255, mask.sum())
    right = base[:, M:].copy()
    left = base[yy, xx + M - disp.astype(np.int64)]
    return left, right, disp


def test_sgm_beats_bm_in_low_texture():
    cfg = StereoBMConfig(num_disparities=32, block_size=5, texture_threshold=0)
    left, right, gt = _lowtex_pair()
    d_bm, v_bm = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    d_sg, v_sg = SGM.compute_disparity_sgm(
        jnp.asarray(left), jnp.asarray(right), cfg, p1=8.0, p2=100.0
    )
    win = (slice(8, -8), slice(40, -8))

    def err_rate(d, v):
        d, v = np.asarray(d)[win], np.asarray(v)[win]
        e = np.abs(d - gt[win])
        return np.where(v, e > 1.0, True).mean()

    e_bm, e_sg = err_rate(d_bm, v_bm), err_rate(d_sg, v_sg)
    assert e_sg < e_bm * 0.7, f"SGM {e_sg:.3f} vs BM {e_bm:.3f}"
    assert e_sg < 0.15


def test_sgm_full_texture_parity_with_bm():
    """With rich texture and tiny penalties SGM ≈ BM (aggregation adds
    little when data terms dominate)."""
    cfg = StereoBMConfig(num_disparities=32, block_size=9, texture_threshold=10)
    left, right, gt = synthetic_stereo_pair(80, 200, max_disparity=24, seed=1)
    d_sg, v_sg = SGM.compute_disparity_sgm(
        jnp.asarray(left), jnp.asarray(right), cfg, p1=1.0, p2=8.0
    )
    win = (slice(8, -8), slice(40, -8))
    v = np.asarray(v_sg)[win]
    e = np.abs(np.asarray(d_sg)[win] - gt[win])[v]
    assert (e <= 1.0).mean() > 0.97


def test_sgm_8_paths_quality():
    """8-path aggregation must be at least as accurate as 4-path in low
    texture (diagonal paths add real support, not rehashed horizontals)."""
    cfg = StereoBMConfig(num_disparities=32, block_size=5, texture_threshold=0)
    left, right, gt = _lowtex_pair(seed=2)
    d4, v4 = SGM.compute_disparity_sgm(
        jnp.asarray(left), jnp.asarray(right), cfg, p1=8.0, p2=100.0,
        num_paths=4,
    )
    d8, v8 = SGM.compute_disparity_sgm(
        jnp.asarray(left), jnp.asarray(right), cfg, p1=8.0, p2=100.0,
        num_paths=8,
    )
    win = (slice(8, -8), slice(40, -8))

    def err_rate(d, v):
        d, v = np.asarray(d)[win], np.asarray(v)[win]
        e = np.abs(d - gt[win])
        return np.where(v, e > 1.0, True).mean()

    e4, e8 = err_rate(d4, v4), err_rate(d8, v8)
    assert e8 <= e4 * 1.1, f"8-path {e8:.3f} much worse than 4-path {e4:.3f}"
    assert e8 < 0.15
    # diagonals must actually change the result vs 4-path
    assert not np.array_equal(np.asarray(d8), np.asarray(d4))


def test_sgm_diagonal_matches_numpy_oracle():
    """Diagonal aggregation vs a brute-force per-path numpy evaluation."""
    rng = np.random.default_rng(1)
    H, W, nd = 8, 10, 4
    cost = rng.uniform(0, 50, (H, W, nd)).astype(np.float32)
    p1, p2 = 4.0, 30.0
    # numpy: scan down-right diagonals (predecessor (y-1, x-1))
    ref = np.zeros_like(cost)
    for y in range(H):
        for x in range(W):
            c = cost[y, x]
            if y == 0 or x == 0:
                ref[y, x] = c
            else:
                lp = ref[y - 1, x - 1]
                m = lp.min()
                cand = np.minimum(lp, m + p2)
                cand[:-1] = np.minimum(cand[:-1], lp[1:] + p1)
                cand[1:] = np.minimum(cand[1:], lp[:-1] + p1)
                ref[y, x] = c + cand - m
    ours = np.asarray(SGM._aggregate_diagonal(jnp.asarray(cost), 1, False, p1, p2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_sgm_rejects_bad_paths():
    with pytest.raises(ValueError):
        SGM.compute_disparity_sgm(
            jnp.zeros((32, 64), jnp.uint8), jnp.zeros((32, 64), jnp.uint8),
            StereoBMConfig(num_disparities=16, block_size=5), num_paths=3,
        )


def test_sgm_128_disparities():
    """BASELINE config 3: 128-disparity SGM aggregation runs and recovers a
    wide-range synthetic scene."""
    cfg = StereoBMConfig(num_disparities=128, block_size=7, texture_threshold=5)
    left, right, gt = synthetic_stereo_pair(64, 320, max_disparity=100, seed=3)
    d, v = SGM.compute_disparity_sgm(
        jnp.asarray(left), jnp.asarray(right), cfg, p1=8.0, p2=100.0
    )
    d, v = np.asarray(d), np.asarray(v)
    win = (slice(8, -8), slice(140, -8))
    vv = v[win]
    assert vv.mean() > 0.7
    err = np.abs(d[win] - gt[win])[vv]
    assert (err <= 1.0).mean() > 0.9
