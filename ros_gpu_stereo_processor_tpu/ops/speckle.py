"""Speckle removal — connected-component label propagation on device.

The reference's speckle filter is a *CPU* flood fill: it synchronises the
stream, converts 8U→16S, runs cv::filterSpeckles, and converts back
(src/GPUStereoProcessor.cpp:356-385) — a device→host→device round trip in the
middle of the hot path (SURVEY.md §3.1 boundary ②).  Here the filter stays on
device: speckles are connected components (4-connectivity, neighbours linked
when |Δdisparity| ≤ max_diff) with area ≤ max_speckle_size.

Flood fill is inherently sequential, so we compute component labels by
iterated min-label propagation accelerated with pointer jumping
(label ← label[label]), which converges in O(log diameter) outer steps for
typical blobs; then count label occurrences with a scatter-add and invalidate
small components.  Behavioural equivalence with the OpenCV oracle is validated
statistically in tests (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a 2-D array by (dy, dx), filling vacated cells."""
    H, W = x.shape
    out = jnp.full_like(x, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    ys_src = slice(max(-dy, 0), H + min(-dy, 0))
    xs_src = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[ys, xs].set(x[ys_src, xs_src])


@partial(jax.jit, static_argnames=("max_speckle_size", "iters"))
def filter_speckles(
    disp: jnp.ndarray,
    valid: jnp.ndarray,
    max_speckle_size: int = 800,
    max_diff: float = 5.0,
    iters: int = 16,
    fill_value: float = -1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invalidate small connected components of similar disparity.

    Args:
      disp: (H, W) float32 disparity.
      valid: (H, W) bool validity mask.
      max_speckle_size: components with ≤ this many pixels are removed
        (OpenCV convention).
      max_diff: neighbouring pixels join a component iff |Δd| ≤ max_diff.
      iters: outer propagation iterations (each includes pointer jumping,
        giving effective reach far beyond ``iters`` pixels).

    Returns (filtered disparity with removed pixels set to ``fill_value``,
    updated valid mask).
    """
    H, W = disp.shape
    n = H * W
    sentinel = jnp.int32(n)  # label of invalid pixels (maps to a spare slot)

    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W + \
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab = jnp.where(valid, idx, sentinel)

    # Precompute 4-neighbour connectivity (static given disp)
    neigh = []
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nd = _shift(disp, dy, dx, jnp.inf)
        nv = _shift(valid, dy, dx, False)
        conn = valid & nv & (jnp.abs(disp - nd) <= max_diff)
        neigh.append(((dy, dx), conn))

    def body(_, lab):
        # local min over connected neighbours
        m = lab
        for (dy, dx), conn in neigh:
            nl = _shift(lab, dy, dx, sentinel)
            m = jnp.minimum(m, jnp.where(conn, nl, sentinel))
        lab = jnp.where(valid, m, sentinel)
        # pointer jumping: label ← label[label] (twice)
        flat = jnp.append(lab.reshape(-1), sentinel)
        for _ in range(2):
            flat = flat.at[:n].set(flat[flat[:n]])
        return flat[:n].reshape(H, W)

    lab = jax.lax.fori_loop(0, iters, body, lab)

    # component sizes via scatter-add; slot n collects invalid pixels
    flat = lab.reshape(-1)
    sizes = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    keep = (sizes[flat].reshape(H, W) > max_speckle_size) & valid

    out = jnp.where(keep, disp, jnp.float32(fill_value))
    return out, keep
