"""Pallas speckle kernels — the whole image stays in VMEM.

The jnp path (ops/speckle.py::_labels_scan) lowers each doubling step of the
segmented min-scan to shifted full-array XLA ops, so all 16 propagation
iterations (~600 shifted vector layers) round-trip HBM; worse, the component
histogram needs a 360k-element scatter-add *and* a 360k-element gather
(``sizes[lab]``), each of which XLA lowers to a multi-millisecond serial
update loop on TPU.  At 752×480 the full label/connectivity state is < 6 MB —
it fits in VMEM whole:

  * :func:`labels_pallas` — connected-component labels via iterated
    row/column segmented min-scans, all iterations on VMEM-resident arrays,
    with convergence early-exit (min-propagation is monotone, so an
    unchanged pass is a fixed point).  Segmented scans use the composite-key
    trick: with ``seg`` = per-line segment index (iteration-invariant) and
    ``K`` > any label, prefix-min of ``lab − seg·K`` / suffix-min of
    ``lab + seg·K`` over the *whole* line equal the forward/backward segment
    minima, because a neighbouring segment's key always loses by ≥ K.
    Component sizing happens outside via the double-sort windowed
    run-extent test (ops/speckle._keep_large_components) — no scatters,
    no gathers.

Numerics are bit-identical to the jnp twins (same doubling schedule, same
sentinel/fill discipline); parity is enforced in tests/test_speckle.py.  The
reference's speckle filter is the CPU ``cv::filterSpeckles`` flood fill that
forces a device→host sync mid-pipeline (src/GPUStereoProcessor.cpp:356-385);
here it is the on-device equivalent at VMEM residency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024  # full-image residency overflows the 16 MB
#                                  default scoped-vmem budget at 752×480


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sweep_lib(Hp: int, Wp: int, K: int):
    """Shared sweep machinery: masked shifts, prefix sums, composite-key
    segmented min sweeps.  ``K`` must exceed any propagated value."""
    BIG = 2**30  # > max |key| = line_len·K + max value for K ≤ 2^20

    def sh(x, off: int, axis: int, fill):
        """result[i] = x[i - off] along ``axis``; vacated cells = fill.

        pltpu.roll only takes non-negative shifts; negative offsets roll by
        (size - off) and the wrapped cells are masked to ``fill``.
        """
        size = x.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        if off >= 0:
            rolled = pltpu.roll(x, off, axis=axis)
            mask = idx >= off
        else:
            rolled = pltpu.roll(x, size + off, axis=axis)
            mask = idx < size + off
        return jnp.where(mask, rolled, fill)

    def prefix_sum(x, axis: int, n_real: int):
        off = 1
        while off < n_real:
            x = x + sh(x, off, axis, 0)
            off <<= 1
        return x

    def scan_min(key, axis: int, n_real: int, backward: bool):
        off = 1
        while off < n_real:
            key = jnp.minimum(key, sh(key, -off if backward else off, axis, BIG))
            off <<= 1
        return key

    def seg_min_sweep(val, segK, valid, axis: int, n_real: int):
        fwd = scan_min(jnp.where(valid, val - segK, BIG), axis, n_real, False) + segK
        bwd = scan_min(jnp.where(valid, val + segK, BIG), axis, n_real, True) - segK
        return jnp.minimum(fwd, bwd)

    def connectivity(disp, vi, max_diff):
        """conn_x/conn_y (int32 0/1: connected to left/up neighbour) and the
        iteration-invariant scaled segment indices segK_x/segK_y."""
        inf = float("inf")
        left_d = sh(disp, 1, 1, inf)
        left_v = sh(vi, 1, 1, 0)
        conn_x = vi & left_v & (jnp.abs(disp - left_d) <= max_diff).astype(jnp.int32)
        up_d = sh(disp, 1, 0, inf)
        up_v = sh(vi, 1, 0, 0)
        conn_y = vi & up_v & (jnp.abs(disp - up_d) <= max_diff).astype(jnp.int32)
        segK_x = prefix_sum(1 - conn_x, 1, Wp) * K
        segK_y = prefix_sum(1 - conn_y, 0, Hp) * K
        return conn_x, conn_y, segK_x, segK_y

    return seg_min_sweep, connectivity, prefix_sum


def _propagation_kernel(H: int, W: int, Hp: int, Wp: int, iters: int):
    """Kernel: iterated alternating row/col segmented min-propagation of
    raster labels, with convergence early-exit."""
    K = 1 << 19    # > max propagated value (labels < H·W ≤ 2^19)
    seg_min_sweep, connectivity, _ = _sweep_lib(Hp, Wp, K)
    sentinel = H * W

    def kernel(md_ref, disp_ref, valid_ref, out_ref):
        max_diff = md_ref[0]
        disp = disp_ref[:]
        vi = valid_ref[:]          # int32 0/1
        valid = vi != 0

        row = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
        idx = row * W + col  # real-raster index so labels match the jnp twin
        val = jnp.where(valid, idx, sentinel)

        _, _, segK_x, segK_y = connectivity(disp, vi, max_diff)

        # early-exit on convergence: the sweeps are monotone (min-propagation
        # only lowers values), so an unchanged iteration is a fixed point and
        # stopping there is bit-identical to running all `iters` — typical
        # scenes converge in a handful of passes
        def cond(carry):
            i, changed, _ = carry
            return (i < iters) & changed

        def body(carry):
            i, _, val = carry
            new = seg_min_sweep(val, segK_x, valid, axis=1, n_real=W)
            new = seg_min_sweep(new, segK_y, valid, axis=0, n_real=H)
            return i + 1, jnp.any(new < val), new

        _, _, val = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), val)
        )
        out_ref[:] = jnp.where(valid, val, sentinel)

    return kernel


def _pad(x, Hp, Wp, dtype):
    out = jnp.zeros((Hp, Wp), dtype)
    return jax.lax.dynamic_update_slice(out, x.astype(dtype), (0, 0))


def _call(kernel, n_in, Hp, Wp, *args):
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def _maxprop_kernel(H: int, W: int, Hp: int, Wp: int, iters: int):
    """Kernel: iterated alternating row/col segmented MAX propagation of an
    int32 field over connectivity masks, with convergence early-exit —
    the VMEM-resident twin of ops/speckle._max_propagate (the row-sharded
    speckle filter's reconciliation broadcast-back,
    parallel/frontend.filter_speckles_row_sharded; the jnp lowering
    round-trips HBM per doubling step).  Implemented as min-propagation of
    the negated field with the same composite-key sweeps as the label
    kernel."""
    K = 1 << 19    # must exceed any |field| value (counts saturate at cap)
    seg_min_sweep, _, prefix_sum = _sweep_lib(Hp, Wp, K)

    def kernel(dummy_ref, field_ref, cx_ref, cy_ref, out_ref):
        del dummy_ref
        field = field_ref[:]
        cx = cx_ref[:]
        cy = cy_ref[:]
        segK_x = prefix_sum(1 - cx, 1, Wp) * K
        segK_y = prefix_sum(1 - cy, 0, Hp) * K
        valid = jnp.full((Hp, Wp), True)
        neg0 = -field

        def cond(c):
            i, changed, _ = c
            return (i < iters) & changed

        def body(c):
            i, _, v = c
            new = seg_min_sweep(v, segK_x, valid, axis=1, n_real=W)
            new = seg_min_sweep(new, segK_y, valid, axis=0, n_real=H)
            return i + 1, jnp.any(new < v), new

        _, _, neg = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), neg0)
        )
        out_ref[:] = -neg

    return kernel


@functools.partial(jax.jit, static_argnames=("iters",))
def max_propagate_pallas(
    field: jnp.ndarray,
    conn_x: jnp.ndarray,
    conn_y: jnp.ndarray,
    iters: int,
) -> jnp.ndarray:
    """Max-propagate ``field`` across connected components (exact twin of
    ops/speckle._max_propagate, VMEM-resident).  ``field`` values must stay
    below 2^19 (component sizes saturate at the speckle cap, so they do)."""
    H, W = field.shape
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    dummy = jnp.zeros((1,), jnp.int32)
    out = _call(
        _maxprop_kernel(H, W, Hp, Wp, int(iters)),
        3, Hp, Wp,
        dummy,
        _pad(field, Hp, Wp, jnp.int32),
        _pad(conn_x, Hp, Wp, jnp.int32),
        _pad(conn_y, Hp, Wp, jnp.int32),
    )
    return out[:H, :W]


@functools.partial(jax.jit, static_argnames=("iters",))
def labels_pallas(
    disp: jnp.ndarray,
    valid: jnp.ndarray,
    max_diff: float = 5.0,
    iters: int = 16,
) -> jnp.ndarray:
    """Connected-component labels, bit-identical to speckle._labels_scan.

    (H, W) float32 disparity + bool validity → (H, W) int32 labels where
    lab = min raster index of the pixel's component, H*W for invalid pixels.
    """
    H, W = disp.shape
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    md = jnp.asarray(max_diff, jnp.float32).reshape((1,))
    lab = _call(
        _propagation_kernel(H, W, Hp, Wp, int(iters)),
        2, Hp, Wp,
        md, _pad(disp, Hp, Wp, jnp.float32), _pad(valid, Hp, Wp, jnp.int32),
    )
    return lab[:H, :W]
