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
    conn_x, conn_y = _connectivity(disp, valid, max_diff)

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
    length = _run_lengths_sorted(keys)
    _, sizes = jax.lax.sort((payload, length), num_keys=1)
    return sizes


def _run_lengths_sorted(keys: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Per-element run length of equal-key runs in a sorted array (batched
    along leading axes when ``axis=-1``)."""
    n = keys.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, keys.shape, keys.ndim - 1)
    one = [(0, 0, 0)] * (keys.ndim - 1)
    head = jax.lax.pad(
        jax.lax.slice_in_dim(keys, 1, n, axis=-1) !=
        jax.lax.slice_in_dim(keys, 0, n - 1, axis=-1),
        jnp.bool_(True), one + [(1, 0, 0)])
    tail = jax.lax.pad(
        jax.lax.slice_in_dim(keys, 1, n, axis=-1) !=
        jax.lax.slice_in_dim(keys, 0, n - 1, axis=-1),
        jnp.bool_(True), one + [(0, 1, 0)])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, idx, -1), axis=keys.ndim - 1)
    last = jax.lax.associative_scan(
        jnp.minimum, jnp.where(tail, idx, n), reverse=True, axis=keys.ndim - 1)
    return last - first + 1


def _connectivity(disp: jnp.ndarray, valid: jnp.ndarray, max_diff: float):
    """(conn_x, conn_y): pixel connected to its left / upper neighbour."""
    left_d = _shift(disp, 0, 1, jnp.inf)
    left_v = _shift(valid, 0, 1, False)
    conn_x = valid & left_v & (jnp.abs(disp - left_d) <= max_diff)
    up_d = _shift(disp, 1, 0, jnp.inf)
    up_v = _shift(valid, 1, 0, False)
    conn_y = valid & up_v & (jnp.abs(disp - up_d) <= max_diff)
    return conn_x, conn_y


def _max_propagate(field: jnp.ndarray, conn_x: jnp.ndarray,
                   conn_y: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Max-propagate ``field`` across connected components (alternating
    row/column segmented max sweeps) until convergence or ``iters`` rounds.
    Monotone, so an unchanged round is a fixed point."""
    neg0 = -field

    def cond(c):
        i, changed, _ = c
        return (i < iters) & changed

    def body(c):
        i, _, neg = c
        new = _segmented_min_scan(neg, conn_x, axis=1)
        new = _segmented_min_scan(new, conn_y, axis=0)
        return i + 1, jnp.any(new < neg), new

    # the init flag must be derived from the data so its sharding/varying
    # type matches the body's output under shard_map manual axes
    changed0 = jnp.any(neg0 <= neg0)
    _, _, neg = jax.lax.while_loop(cond, body, (jnp.int32(0), changed0, neg0))
    return -neg


def _sizes_banded(
    lab: jnp.ndarray,
    conn_x: jnp.ndarray,
    conn_y: jnp.ndarray,
    nb: int,
    iters: int,
    cap: int,
    pallas: bool = False,
) -> jnp.ndarray:
    """Exact (saturating at ``cap``) per-pixel component sizes via band-local
    sorts + boundary reconciliation — no full-image sort.

    Replaces the two full-image (H·W-key) device sorts of
    :func:`_component_sizes_per_pixel` with:

      1. per-band counts: a BATCHED (nb, H/nb·W) sort by label + run-length
         scans + a batched packed unsort (count rides the upper bits of the
         position key) — ~2× cheaper than full-image sorts and, under row
         sharding, band-local (per-chip O(H·W/n));
      2. reconciliation over band-boundary rows only: a component crossing a
         band boundary has, in every band it touches, at least one pixel in
         that band's first/last row (4-connectivity), so summing each band's
         per-label count once per (band, label) pair seen in boundary rows
         gives exact global sizes — two SMALL sorts over nb·2·W records;
      3. broadcast-back: corrected totals are injected at boundary pixels and
         max-propagated across in-band connectivity (every in-band fragment
         of a crossing component touches a boundary row, so propagation
         reaches all its pixels; counts saturate at ``cap`` ≥ threshold+1,
         which keeps the keep/blank decision exact).

    ``lab`` must hold global component labels (min raster index; sentinel for
    invalid pixels).  VERDICT round-2 item 2.
    """
    H, W = lab.shape
    hb = H // nb
    m = hb * W
    flat = lab.reshape(nb, m)

    # 1. band-local counts (batched sort by label, stable → positions
    #    recoverable by a packed 1-operand unsort)
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (nb, m))
    keys, payload = jax.lax.sort((flat, pos), dimension=1, num_keys=1)
    cnt = jnp.minimum(_run_lengths_sorted(keys), cap)
    # pack: key = pos * 2^cnt_bits + cnt  (cnt ≤ cap < 2^cnt_bits) — the
    # unsort needs only ONE sort operand instead of (key, payload)
    pos_bits = max(1, int(m - 1).bit_length())
    cnt_bits = max(1, int(cap).bit_length())
    if pos_bits + cnt_bits <= 31:
        packed = payload * (1 << cnt_bits) + cnt
        packed = jax.lax.sort(packed, dimension=1)
        cnt_img = (packed & ((1 << cnt_bits) - 1)).reshape(H, W)
    else:  # cap too large to pack — plain 2-operand unsort
        _, cnt_unsorted = jax.lax.sort((payload, cnt), dimension=1,
                                       num_keys=1)
        cnt_img = cnt_unsorted.reshape(H, W)

    if nb == 1:
        return cnt_img

    # 2. boundary reconciliation: records (label, band, count) from each
    #    band's first/last rows; sum counts once per distinct (label, band)
    brows = jnp.stack([cnt_img.reshape(nb, hb, W)[:, 0],
                       cnt_img.reshape(nb, hb, W)[:, -1]], 1)   # (nb, 2, W)
    blabs = jnp.stack([lab.reshape(nb, hb, W)[:, 0],
                       lab.reshape(nb, hb, W)[:, -1]], 1)
    band_id = jax.lax.broadcasted_iota(jnp.int32, (nb, 2, W), 0)
    rec_lab = blabs.reshape(-1)
    rec_cnt = brows.reshape(-1)
    rec_band = band_id.reshape(-1)
    R = rec_lab.shape[0]                                        # nb·2·W
    rpos = jnp.arange(R, dtype=jnp.int32)
    # sort by (label, band): label*nb + band fits i32 for H·W·nb ≤ 2^31
    skey, scnt, spos = jax.lax.sort(
        (rec_lab * nb + rec_band, rec_cnt, rpos), num_keys=1)
    sk_head = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    contrib = jnp.where(sk_head, scnt, 0)       # one count per (label, band)
    slab = skey // nb
    # total per label: segmented sum of contribs over equal-label runs
    lab_head = jnp.concatenate([jnp.ones((1,), bool), slab[1:] != slab[:-1]])
    csum = jnp.cumsum(contrib)
    base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(lab_head, csum - contrib, -1))
    lab_tail = jnp.concatenate([slab[1:] != slab[:-1], jnp.ones((1,), bool)])
    idx = jnp.arange(R, dtype=jnp.int32)
    last = jax.lax.associative_scan(
        jnp.minimum, jnp.where(lab_tail, csum, jnp.iinfo(jnp.int32).max),
        reverse=True)
    total = jnp.minimum(last - base, cap)
    # deliver totals back to boundary-record positions (small unsort)
    _, btot_flat = jax.lax.sort((spos, total), num_keys=1)
    btot = btot_flat.reshape(nb, 2, W)

    # 3. inject at boundary rows, max-propagate within bands
    field = cnt_img.reshape(nb, hb, W)
    field = field.at[:, 0].set(jnp.maximum(field[:, 0], btot[:, 0]))
    field = field.at[:, -1].set(jnp.maximum(field[:, -1], btot[:, 1]))
    field = field.reshape(H, W)
    # band-local propagation: cut vertical connectivity across band
    # boundaries so sweeps stay in-band (the totals are already global)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    conn_y_band = conn_y & (row % hb != 0)
    # generous cap — the while_loop exits on convergence, so the cap only
    # bounds pathological serpentine fragments
    if pallas and cap < (1 << 19):
        # VMEM-resident sweeps (speckle_pallas.max_propagate_pallas): the
        # jnp lowering round-trips HBM on every doubling step and is the
        # single most expensive piece of the sizing stage on TPU
        from ros_gpu_stereo_processor_tpu.ops import speckle_pallas

        return speckle_pallas.max_propagate_pallas(
            field, conn_x, conn_y_band, max(iters, 64))
    return _max_propagate(field, conn_x, conn_y_band, max(iters, 64))


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
    if method == "pallas":
        from ros_gpu_stereo_processor_tpu.ops import speckle_pallas

        lab = speckle_pallas.labels_pallas(disp, valid, max_diff, iters)
    elif method == "scan":
        lab = _labels_scan(disp, valid, max_diff, iters)
    elif method == "gather":
        lab = _labels_gather(disp, valid, max_diff, iters)
    else:
        raise ValueError(f"unknown method {method!r}")

    # exact (threshold-saturating) per-pixel component sizes via band-local
    # sorts + boundary reconciliation (no full-image sort, no scatter-add
    # histogram, no sizes[lab] gather — the latter two serialize on TPU)
    nb = next((b for b in (32, 16, 8, 4, 2, 1) if H % b == 0))
    conn_x, conn_y = _connectivity(disp, valid, max_diff)
    sizes = _sizes_banded(lab, conn_x, conn_y, nb, iters,
                          cap=max_speckle_size + 1,
                          pallas=(method == "pallas"))
    keep = (sizes > max_speckle_size) & valid

    out = jnp.where(keep, disp, jnp.float32(fill_value))
    return out, keep
