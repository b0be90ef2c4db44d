"""Disparity visualization — rainbow color mapping on device.

Replaces the reference's cv::cuda::drawColorDisp call
(src/GPUStereoProcessor.cpp:323-330), which renders disparity as an HSV
rainbow for the human-viewable ``disparity_vis`` topic
(src/StereoProcessor.cpp:271-275).  Same scheme: hue sweeps 240°→0°
(blue = far/0 … red = near/ndisp), full saturation/value; invalid pixels
render black.  Output is RGB8.
"""

from __future__ import annotations

import jax.numpy as jnp


def colorize_disparity(
    disp: jnp.ndarray,
    num_disparities: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(H, W) float disparity → (H, W, 3) uint8 rainbow RGB."""
    d = jnp.clip(disp.astype(jnp.float32), 0.0, float(num_disparities))
    if valid is None:
        valid = disp > 0
    # hue in degrees: 240 (blue) at d=0 → 0 (red) at d=ndisp
    h = (1.0 - d / float(num_disparities)) * 240.0
    hp = h / 60.0
    i = jnp.floor(hp)
    f = hp - i
    q = 1.0 - f
    # V=S=1 HSV→RGB with t = f
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [1.0, q, 0.0, 0.0, f],
        default=1.0,
    )
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [f, 1.0, 1.0, q, 0.0],
        default=0.0,
    )
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [0.0, 0.0, f, 1.0, 1.0],
        default=q,
    )
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    return jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
