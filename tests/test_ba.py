"""Bundle-adjustment tests: synthetic window recovery, robustness, masking."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.models import ba as BA
from ros_gpu_stereo_processor_tpu.utils import lie

FX, CX, CY = 400.0, 320.0, 240.0


def make_problem(M=5, N=60, noise_px=0.0, pose_noise=0.05, point_noise=0.05,
                 seed=0, drop=0.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -2, 5], [3, 2, 12], (N, 3))
    R_true = np.zeros((M, 3, 3))
    t_true = np.zeros((M, 3))
    for m in range(M):
        xi = np.concatenate([m * np.array([0.1, 0.0, 0.02]),
                             m * np.array([0.0, 0.015, 0.0])])
        R, t = (np.asarray(a) for a in lie.se3_exp(jnp.asarray(xi)))
        R_true[m], t_true[m] = R, t

    pc = np.einsum("mij,nj->mni", R_true, pts) + t_true[:, None]
    obs = np.stack(
        [FX * pc[..., 0] / pc[..., 2] + CX, FX * pc[..., 1] / pc[..., 2] + CY], -1
    )
    obs = obs + rng.normal(0, noise_px, obs.shape)
    mask = (rng.random((M, N)) >= drop).astype(np.float64)
    mask[0] = 1.0  # anchor frame sees everything

    # perturb initial estimates (pose 0 is the gauge anchor, keep exact)
    R0 = R_true.copy()
    t0 = t_true.copy()
    for m in range(1, M):
        dR, dt = (np.asarray(a) for a in
                  lie.se3_exp(jnp.asarray(rng.normal(0, pose_noise, 6))))
        R0[m] = dR @ R0[m]
        t0[m] = dR @ t0[m] + dt
    pts0 = pts + rng.normal(0, point_noise, pts.shape)

    p = BA.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0), points=jnp.asarray(pts0),
        obs=jnp.asarray(obs), mask=jnp.asarray(mask), fx=FX, cx=CX, cy=CY,
    )
    return p, (R_true, t_true, pts)


def _anchor(p, n=4):
    import numpy as _np
    pr = _np.zeros(p.points.shape[0]); pr[:n] = 1e8
    return jnp.asarray(pr)


def test_ba_converges_to_ground_truth():
    p, (R_true, t_true, pts_true) = make_problem(point_noise=0.0)
    # scale gauge: anchor a few landmarks at their (exact) initial positions
    pf, hist = BA.bundle_adjust(p, iters=12, point_prior=_anchor(p))
    hist = np.asarray(hist)
    assert hist[-1] < 1e-3, f"final rms {hist[-1]}"
    assert hist[-1] < hist[0] * 1e-3
    # poses recovered (gauge anchored at pose 0 == ground truth)
    np.testing.assert_allclose(np.asarray(pf.R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pf.t), t_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pf.points), pts_true, atol=5e-3)


def test_ba_with_noise_reduces_error():
    p, _ = make_problem(noise_px=0.5, seed=1)
    pf, hist = BA.bundle_adjust(p, iters=10)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0]
    # converges to the noise floor, not below
    assert 0.1 < hist[-1] < 1.0


def test_ba_respects_mask():
    """Dropped observations (mask 0) may carry garbage without effect."""
    p, (R_true, t_true, pts_true) = make_problem(drop=0.4, seed=2, point_noise=0.0)
    obs = np.asarray(p.obs).copy()
    obs[np.asarray(p.mask) == 0] = 1e5
    p = p._replace(obs=jnp.asarray(obs))
    pf, hist = BA.bundle_adjust(p, iters=12, point_prior=_anchor(p))
    assert np.asarray(hist)[-1] < 1e-3
    np.testing.assert_allclose(np.asarray(pf.t), t_true, atol=5e-3)


def test_ba_huber_outliers():
    p, (R_true, t_true, pts_true) = make_problem(seed=3, point_noise=0.0)
    obs = np.asarray(p.obs).copy()
    rng = np.random.default_rng(9)
    m_idx = rng.integers(0, obs.shape[0], 30)
    n_idx = rng.integers(0, obs.shape[1], 30)
    obs[m_idx, n_idx] += rng.uniform(40, 100, (30, 2))
    p = p._replace(obs=jnp.asarray(obs))
    pf, hist = BA.bundle_adjust(p, iters=15, huber_px=2.0,
                                point_prior=_anchor(p))
    np.testing.assert_allclose(np.asarray(pf.t), t_true, atol=0.02)


def test_gauge_fixed_first_pose():
    p, (R_true, t_true, _) = make_problem(seed=4)
    pf, _ = BA.bundle_adjust(p, iters=8)
    np.testing.assert_allclose(np.asarray(pf.R)[0], R_true[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pf.t)[0], t_true[0], atol=1e-6)
