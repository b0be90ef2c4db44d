"""Speckle removal — connected-component label propagation on device.

The reference's speckle filter is a *CPU* flood fill: it synchronises the
stream, converts 8U→16S, runs cv::filterSpeckles, and converts back
(src/GPUStereoProcessor.cpp:356-385) — a device→host→device round trip in the
middle of the hot path (SURVEY.md §3.1 boundary ②).  Here the filter stays on
device: speckles are connected components (4-connectivity, neighbours linked
when |Δdisparity| ≤ max_diff) with area ≤ max_speckle_size.

Flood fill is inherently sequential; two TPU-friendly label-propagation
schemes are provided:

  * ``method="scan"`` (default, fast): iterated **segmented min-scans** along
    rows and columns (``lax.associative_scan`` with a reset-at-disconnect
    operator).  Each pass is O(log W) vectorised VPU steps with *no gathers*
    (random gathers are the TPU slow path); K passes propagate labels along
    any K-bend monotone path, which covers realistic speckle shapes.
  * ``method="gather"`` (topology-exact, slower): 3×3 min-prop with pointer
    jumping (label ← label[label]) — O(log diameter) convergence for any
    topology.

Component sizes come from one scatter-add histogram; pixels whose component
area ≤ max_speckle_size are invalidated.  Behavioural equivalence with the
OpenCV oracle is validated statistically in tests (SURVEY.md §7 hard parts).
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


def _segmented_min_scan(lab: jnp.ndarray, conn: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Full-segment min along ``axis``, segments delimited where ``conn`` is
    False (``conn[i]`` = element i connected to element i−1; conn[0]=False).

    Hand-rolled Hillis–Steele doubling with static shifts — lowers to plain
    shifted vector min/and ops (measurably faster on TPU than
    ``lax.associative_scan``'s generic lowering).  Propagates the segment
    minimum to *every* element of the segment (forward + backward pass).
    """
    n = lab.shape[axis]
    sentinel = lab.dtype.type(jnp.iinfo(lab.dtype).max) if jnp.issubdtype(
        lab.dtype, jnp.integer) else jnp.inf

    def sh(x, off, fill):
        if axis == 1:
            return _shift(x, 0, off, fill)
        return _shift(x, off, 0, fill)

    # forward: lab[i] ← min over its run-prefix
    f_lab, f_conn = lab, conn
    off = 1
    while off < n:
        f_lab = jnp.where(
            f_conn, jnp.minimum(f_lab, sh(f_lab, off, sentinel)), f_lab
        )
        f_conn = f_conn & sh(f_conn, off, False)
        off <<= 1
    # backward: propagate each run's final prefix-min back across the run.
    # conn_next[i] = conn[i+1]  (element i connected to element i+1)
    conn_next = sh(conn, -1, False)
    b_lab, b_conn = f_lab, conn_next
    off = 1
    while off < n:
        b_lab = jnp.where(
            b_conn, jnp.minimum(b_lab, sh(b_lab, -off, sentinel)), b_lab
        )
        b_conn = b_conn & sh(b_conn, -off, False)
        off <<= 1
    return b_lab


def _labels_scan(
    disp: jnp.ndarray, valid: jnp.ndarray, max_diff: float, iters: int
) -> jnp.ndarray:
    """Component labels via alternating row/column segmented min-scans."""
    H, W = disp.shape
    n = H * W
    sentinel = jnp.int32(n)
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W + \
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab = jnp.where(valid, idx, sentinel)

    # connectivity along each axis (to the previous element)
    left_d = _shift(disp, 0, 1, jnp.inf)
    left_v = _shift(valid, 0, 1, False)
    conn_x = valid & left_v & (jnp.abs(disp - left_d) <= max_diff)
    up_d = _shift(disp, 1, 0, jnp.inf)
    up_v = _shift(valid, 1, 0, False)
    conn_y = valid & up_v & (jnp.abs(disp - up_d) <= max_diff)

    def body(_, lab):
        lab = _segmented_min_scan(lab, conn_x, axis=1)
        lab = _segmented_min_scan(lab, conn_y, axis=0)
        return lab

    lab = jax.lax.fori_loop(0, iters, body, lab)
    return jnp.where(valid, lab, sentinel)


def _labels_gather(
    disp: jnp.ndarray, valid: jnp.ndarray, max_diff: float, iters: int
) -> jnp.ndarray:
    """Component labels via 3×3 min-prop + pointer jumping (gather-heavy)."""
    H, W = disp.shape
    n = H * W
    sentinel = jnp.int32(n)
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W + \
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab = jnp.where(valid, idx, sentinel)

    neigh = []
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nd = _shift(disp, dy, dx, jnp.inf)
        nv = _shift(valid, dy, dx, False)
        conn = valid & nv & (jnp.abs(disp - nd) <= max_diff)
        neigh.append(((dy, dx), conn))

    def body(_, lab):
        m = lab
        for (dy, dx), conn in neigh:
            nl = _shift(lab, dy, dx, sentinel)
            m = jnp.minimum(m, jnp.where(conn, nl, sentinel))
        lab = jnp.where(valid, m, sentinel)
        flat = jnp.append(lab.reshape(-1), sentinel)
        for _ in range(2):
            flat = flat.at[:n].set(flat[flat[:n]])
        return flat[:n].reshape(H, W)

    return jax.lax.fori_loop(0, iters, body, lab)


def _component_sizes_per_pixel(lab_flat: jnp.ndarray, n: int) -> jnp.ndarray:
    """Exact per-pixel component size, gather/scatter-free.

    The obvious ``zeros(n).at[lab].add(1)`` scatter-add (and the ``sizes[lab]``
    gather after it) each lower to multi-millisecond serial loops on TPU.
    Device sorts don't: sort (label, pixel) pairs by label, measure each run's
    length with two cumulative scans over the run boundaries, then sort the
    lengths back by pixel index — every step is a native TPU sort or scan.
    """
    N = lab_flat.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    keys, payload = jax.lax.sort((lab_flat, pos), num_keys=1)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    end = jnp.concatenate(
        [keys[1:] != keys[:-1], jnp.ones((1,), bool)])
    first = jax.lax.associative_scan(jnp.maximum, jnp.where(start, pos, -1))
    last = jax.lax.associative_scan(
        jnp.minimum, jnp.where(end, pos, N), reverse=True)
    length = last - first + 1
    _, sizes = jax.lax.sort((payload, length), num_keys=1)
    return sizes


@partial(jax.jit, static_argnames=("max_speckle_size", "iters", "method"))
def filter_speckles(
    disp: jnp.ndarray,
    valid: jnp.ndarray,
    max_speckle_size: int = 800,
    max_diff: float = 5.0,
    iters: int = 16,
    fill_value: float = -1.0,
    method: str = "scan",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invalidate small connected components of similar disparity.

    Args:
      disp: (H, W) float32 disparity.
      valid: (H, W) bool validity mask.
      max_speckle_size: components with ≤ this many pixels are removed
        (OpenCV convention).
      max_diff: neighbouring pixels join a component iff |Δd| ≤ max_diff.
      iters: propagation iterations (scan: number of row+column sweep pairs;
        gather: outer pointer-jumping rounds).
      method: "scan" (default, gather-free) or "gather".

    Returns (filtered disparity with removed pixels set to ``fill_value``,
    updated valid mask).
    """
    H, W = disp.shape
    n = H * W
    if method == "pallas":
        from ros_gpu_stereo_processor_tpu.ops import speckle_pallas

        lab = speckle_pallas.labels_pallas(disp, valid, max_diff, iters)
    elif method == "scan":
        lab = _labels_scan(disp, valid, max_diff, iters)
    elif method == "gather":
        lab = _labels_gather(disp, valid, max_diff, iters)
    else:
        raise ValueError(f"unknown method {method!r}")

    # exact per-pixel component sizes via two device sorts (no scatter-add
    # histogram, no sizes[lab] gather — both are serial loops on TPU)
    sizes = _component_sizes_per_pixel(lab.reshape(-1), n).reshape(H, W)
    keep = (sizes > max_speckle_size) & valid

    out = jnp.where(keep, disp, jnp.float32(fill_value))
    return out, keep
