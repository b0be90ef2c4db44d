"""Disparity → 3-D reprojection and point-cloud packing on device.

Replaces two reference components:
  * the forked ``image_geometry`` GPU reprojection
    ``projectDisparityImageTo3dGPU`` (src/GPUStereoProcessor.cpp:332-346),
  * the PointCloud2 sender's per-pixel *CPU loop* packing XYZ+RGB
    (src/GpuSenderPc2.cpp:43-71 — one of the reference's two main CPU
    bottlenecks, SURVEY.md §3.1).

Here reprojection is four fused multiply-adds per pixel via the 4×4 Q matrix
([X Y Z W]ᵀ = Q·[u v d 1]ᵀ) and the pack is a vectorised masked write —
everything stays on device; the host adapter only sees the final arrays.

Invalid points (invalid disparity, or d ≤ disparity offset ⇒ Z ≤ 0 / ∞)
become NaN, the reference's MISSING_Z/isValidPoint convention
(src/StereoProcessor.cpp:300-305, src/GpuSenderPc2.cpp:84-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def reproject_disparity(
    disp: jnp.ndarray,
    Q: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(H, W) float disparity + (4, 4) Q → (H, W, 3) float32 XYZ (NaN invalid)."""
    H, W = disp.shape
    Q = jnp.asarray(Q, jnp.float32)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    d = disp.astype(jnp.float32)
    one = jnp.ones_like(d)

    X = Q[0, 0] * u + Q[0, 1] * v + Q[0, 2] * d + Q[0, 3]
    Y = Q[1, 0] * u + Q[1, 1] * v + Q[1, 2] * d + Q[1, 3]
    Z = Q[2, 0] * u + Q[2, 1] * v + Q[2, 2] * d + Q[2, 3]
    Wh = Q[3, 0] * u + Q[3, 1] * v + Q[3, 2] * d + Q[3, 3]

    ok = Wh > 1e-12
    if valid is not None:
        ok &= valid
    inv_w = jnp.where(ok, 1.0 / jnp.where(ok, Wh, 1.0), jnp.nan)
    xyz = jnp.stack([X * inv_w, Y * inv_w, Z * inv_w], axis=-1)
    return jnp.where(ok[..., None], xyz, jnp.nan)


def pack_rgb_float(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8 RGB → (H, W) float32 with PointCloud2 packed-RGB bit
    layout (0x00RRGGBB reinterpreted as float) — the wire format the
    reference's Pc2 sender writes per pixel (src/GpuSenderPc2.cpp:57-66)."""
    r = rgb[..., 0].astype(jnp.uint32)
    g = rgb[..., 1].astype(jnp.uint32)
    b = rgb[..., 2].astype(jnp.uint32)
    packed = (r << 16) | (g << 8) | b
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def point_cloud(
    disp: jnp.ndarray,
    Q: jnp.ndarray,
    rgb: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
) -> dict:
    """Organized point cloud: {'xyz': (H,W,3) f32 NaN-invalid,
    'rgb': (H,W) f32 packed} — the device-side contents of an organized
    PointCloud2 (is_dense=False)."""
    xyz = reproject_disparity(disp, Q, valid)
    out = {"xyz": xyz}
    if rgb is not None:
        out["rgb"] = pack_rgb_float(rgb)
    return out


def is_valid_point(xyz: np.ndarray) -> np.ndarray:
    """Host-side validity test mirroring the reference's isValidPoint
    (finite, non-missing Z)."""
    return np.isfinite(xyz).all(axis=-1)
