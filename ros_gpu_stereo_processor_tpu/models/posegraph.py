"""Pose-graph optimisation over SE(3) — the SLAM backend's global layer.

Fixed-capacity graph (static shapes): up to M nodes and E edges, with masks.
Each edge (i → j) carries a measured relative pose T_ij (pose of j in i's
frame) and a scalar information weight.  Residual per edge:

    r_e = log( T_ijᵐᵉᵃˢ⁻¹ · T_i⁻¹ · T_j ) ∈ ℝ⁶

Gauss–Newton with autodiff Jacobians (jacfwd over the stacked tangent — the
graph is small enough that the dense (6E × 6M) Jacobian and 6M×6M normal
system stay trivially on-chip), node 0 fixed as gauge, fixed iteration count
under ``lax.scan``.  (BASELINE.json config 5's pose-graph component.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.utils import lie


class PoseGraph(NamedTuple):
    R: jnp.ndarray        # (M, 3, 3) node rotations (world←node)
    t: jnp.ndarray        # (M, 3)
    edge_i: jnp.ndarray   # (E,) int32 source node
    edge_j: jnp.ndarray   # (E,) int32 target node
    R_meas: jnp.ndarray   # (E, 3, 3) measured R_ij
    t_meas: jnp.ndarray   # (E, 3)
    weight: jnp.ndarray   # (E,) ≥0; 0 disables the edge


def edge_residuals(g: PoseGraph, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(E, 6) se3 residuals."""
    Ri = R[g.edge_i]
    ti = t[g.edge_i]
    Rj = R[g.edge_j]
    tj = t[g.edge_j]
    # T_i⁻¹ T_j
    Rij = jnp.einsum("eji,ejk->eik", Ri, Rj)          # Riᵀ Rj
    tij = jnp.einsum("eji,ej->ei", Ri, tj - ti)
    # T_meas⁻¹ · (T_i⁻¹ T_j)
    Re = jnp.einsum("eji,ejk->eik", g.R_meas, Rij)
    te = jnp.einsum("eji,ej->ei", g.R_meas, tij - g.t_meas)
    return lie.se3_log(Re, te)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    g: PoseGraph,
    iters: int = 10,
    damping: float = 1e-5,
) -> tuple[PoseGraph, jnp.ndarray]:
    """GN pose-graph optimisation; node 0 is the gauge anchor.

    Returns (optimised graph, per-iteration rms history (iters+1,))."""
    M = g.R.shape[0]

    def residual_of_tangent(xi_flat, R, t):
        xi = xi_flat.reshape(M, 6)
        dR, dt = lie.se3_exp(xi)
        Rn = jnp.einsum("mij,mjk->mik", dR, R)
        tn = jnp.einsum("mij,mj->mi", dR, t) + dt
        r = edge_residuals(g, Rn, tn)
        return (r * jnp.sqrt(g.weight)[:, None]).reshape(-1)

    def rms(R, t):
        r = edge_residuals(g, R, t)
        w = g.weight
        return jnp.sqrt(
            jnp.sum(jnp.sum(r * r, -1) * w) / jnp.maximum(jnp.sum(w), 1.0)
        )

    def step(carry, _):
        R, t = carry
        zero = jnp.zeros(6 * M)
        J = jax.jacfwd(residual_of_tangent)(zero, R, t)      # (6E, 6M)
        r = residual_of_tangent(zero, R, t)
        H = J.T @ J + damping * jnp.eye(6 * M)
        gvec = J.T @ r
        # gauge: freeze node 0
        mask = (jnp.arange(6 * M) >= 6).astype(H.dtype)
        H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        gvec = gvec * mask
        dxi = -jnp.linalg.solve(H, gvec).reshape(M, 6)
        dxi = dxi * jnp.minimum(
            1.0, 1.0 / jnp.maximum(jnp.linalg.norm(dxi, axis=-1, keepdims=True), 1e-12)
        )
        dR, dt = lie.se3_exp(dxi)
        Rn = jnp.einsum("mij,mjk->mik", dR, R)
        tn = jnp.einsum("mij,mj->mi", dR, t) + dt
        return (Rn, tn), rms(R, t)

    with jax.default_matmul_precision("highest"):
        (Rf, tf), hist = jax.lax.scan(step, (g.R, g.t), None, length=iters)
    gf = g._replace(R=Rf, t=tf)
    return gf, jnp.append(hist, rms(Rf, tf))


def odometry_edges(R_w: jnp.ndarray, t_w: jnp.ndarray, weight: float = 1.0):
    """Build consecutive-node edges from a trajectory of world poses:
    measurement T_ij = T_i⁻¹ T_j."""
    M = R_w.shape[0]
    i = jnp.arange(M - 1)
    j = i + 1
    Rij = jnp.einsum("eji,ejk->eik", R_w[i], R_w[j])
    tij = jnp.einsum("eji,ej->ei", R_w[i], t_w[j] - t_w[i])
    return i.astype(jnp.int32), j.astype(jnp.int32), Rij, tij, jnp.full((M - 1,), weight)
