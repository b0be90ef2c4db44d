"""Pose-graph optimisation tests: loop-closure correction on a noisy circle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.models import posegraph as PG
from ros_gpu_stereo_processor_tpu.utils import lie


def circle_trajectory(M=12, radius=2.0):
    """Ground-truth poses around a circle, heading tangent."""
    R = np.zeros((M, 3, 3))
    t = np.zeros((M, 3))
    for m in range(M):
        a = 2 * np.pi * m / M
        t[m] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        c, s = np.cos(a + np.pi / 2), np.sin(a + np.pi / 2)
        R[m] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return R, t


def rel(Ra, ta, Rb, tb):
    return Ra.T @ Rb, Ra.T @ (tb - ta)


def build_graph(M=12, drift=0.03, seed=0, loop_weight=10.0):
    rng = np.random.default_rng(seed)
    R_gt, t_gt = circle_trajectory(M)

    # odometry with drift: integrate noisy relative poses
    R_est = np.zeros_like(R_gt)
    t_est = np.zeros_like(t_gt)
    R_est[0], t_est[0] = R_gt[0], t_gt[0]
    ei, ej, Rm, tm, w = [], [], [], [], []
    for m in range(M - 1):
        Rr, tr = rel(R_gt[m], t_gt[m], R_gt[m + 1], t_gt[m + 1])
        dR, dt = (np.asarray(a) for a in
                  lie.se3_exp(jnp.asarray(rng.normal(0, drift, 6))))
        Rn, tn = dR @ Rr, dR @ tr + dt
        R_est[m + 1] = R_est[m] @ Rn
        t_est[m + 1] = R_est[m] @ tn + t_est[m]
        ei.append(m); ej.append(m + 1); Rm.append(Rn); tm.append(tn); w.append(1.0)

    # loop closure: exact measurement M-1 → 0
    Rr, tr = rel(R_gt[M - 1], t_gt[M - 1], R_gt[0], t_gt[0])
    ei.append(M - 1); ej.append(0); Rm.append(Rr); tm.append(tr); w.append(loop_weight)

    g = PG.PoseGraph(
        R=jnp.asarray(R_est), t=jnp.asarray(t_est),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        R_meas=jnp.asarray(np.stack(Rm)), t_meas=jnp.asarray(np.stack(tm)),
        weight=jnp.asarray(w),
    )
    return g, (R_gt, t_gt)


def test_loop_closure_reduces_drift():
    g, (R_gt, t_gt) = build_graph()
    # drift before: final node error
    err_before = np.linalg.norm(np.asarray(g.t) - t_gt, axis=1)
    gf, hist = PG.optimize_pose_graph(g, iters=15)
    err_after = np.linalg.norm(np.asarray(gf.t) - t_gt, axis=1)
    assert np.asarray(hist)[-1] < np.asarray(hist)[0] * 0.2
    # the loop closure pulls the end of the chain back
    assert err_after[-1] < err_before[-1] * 0.5
    assert err_after.mean() < err_before.mean()


def test_consistent_graph_stays_put():
    """With exact measurements the residual is ~0 and poses don't move."""
    R_gt, t_gt = circle_trajectory(8)
    ei, ej, Rm, tm, w = PG.odometry_edges(jnp.asarray(R_gt), jnp.asarray(t_gt))
    g = PG.PoseGraph(
        R=jnp.asarray(R_gt), t=jnp.asarray(t_gt),
        edge_i=ei, edge_j=ej, R_meas=Rm, t_meas=tm, weight=w,
    )
    gf, hist = PG.optimize_pose_graph(g, iters=5)
    assert np.asarray(hist)[-1] < 1e-5
    np.testing.assert_allclose(np.asarray(gf.t), t_gt, atol=1e-4)


def test_zero_weight_edges_ignored():
    g, (R_gt, t_gt) = build_graph(seed=1)
    # add a poisoned edge with weight 0
    g = g._replace(
        edge_i=jnp.append(g.edge_i, 0).astype(jnp.int32),
        edge_j=jnp.append(g.edge_j, 5).astype(jnp.int32),
        R_meas=jnp.concatenate([g.R_meas, jnp.eye(3)[None]]),
        t_meas=jnp.concatenate([g.t_meas, jnp.asarray([[99.0, 99.0, 99.0]])]),
        weight=jnp.append(g.weight, 0.0),
    )
    gf, hist = PG.optimize_pose_graph(g, iters=15)
    # same quality as without the poison edge
    assert np.asarray(hist)[-1] < np.asarray(hist)[0] * 0.2
    assert np.linalg.norm(np.asarray(gf.t)[5] - t_gt[5]) < 1.0
