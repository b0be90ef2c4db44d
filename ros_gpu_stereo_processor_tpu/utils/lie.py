"""SO(3)/SE(3) Lie-group operations in pure JAX.

New capability beyond the reference (which stops at per-frame dense
processing); these are the pose primitives for the VO/BA/pose-graph stack
(models/vo.py, models/ba.py, models/posegraph.py).  Conventions:

  * rotations as 3×3 matrices, poses as (R, t) with ``x_world = R @ x + t``;
  * tangent vectors ω ∈ ℝ³ (so3) and ξ = [ρ, ω] ∈ ℝ⁶ (se3, translation first);
  * all functions are jit/vmap-safe (Taylor fallbacks near θ→0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """ω ∈ ℝ³ → skew-symmetric [ω]× (…, 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: ω → R (…, 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """R → ω (…, 3).  AD-safe at the identity (arctan2 form with sanitized
    branches — autodiff through arccos at tr=3 would yield NaN; pose-graph GN
    differentiates through this).  Rotations at exactly π are outside the
    domain (axis unobservable from the skew part)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )                                            # ‖v‖ = 2 sin θ
    vn2 = jnp.sum(v * v, axis=-1)
    small = vn2 < 1e-12
    vn2_safe = jnp.where(small, 1.0, vn2)        # sanitize for the large branch
    vn_safe = jnp.sqrt(vn2_safe)
    theta = jnp.arctan2(0.5 * vn_safe, 0.5 * (tr - 1.0))
    s_large = theta / vn_safe                    # = θ / (2 sin θ)
    s_small = 0.5 + vn2 / 48.0                   # θ²≈vn²/4 ⇒ θ/(2sinθ)≈½+θ²/12
    s = jnp.where(small, s_small, s_large)
    return s[..., None] * v


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ξ = [ρ, ω] → (R, t)."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    R = so3_exp(w)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b * W + c * W2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) → ξ = [ρ, ω].  AD-safe at identity (sanitized branches)."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/θ² − (1+cosθ)/(2θ sinθ)) W²
    coef_large = 1.0 / theta2_safe - (1.0 + jnp.cos(theta_safe)) / (
        2.0 * theta_safe * jnp.sin(theta_safe)
    )
    coef_small = 1.0 / 12.0 + theta2 / 720.0
    coef = jnp.where(small, coef_small, coef_large)
    Vinv = eye - 0.5 * W + coef * W2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): apply b then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, pts):
    """Apply pose to (…, N, 3) points."""
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
