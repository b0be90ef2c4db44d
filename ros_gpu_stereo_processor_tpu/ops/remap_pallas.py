"""Pallas rectification-remap kernel: per-tile windowed bilinear gather.

TPU random gathers are the slow path (the jnp oracle remap costs ~11 ms per
752×480 image on v5e; XLA lowers the flattened 4-tap gather to a generic
scalar gather).  This kernel exploits what a *rectification* map guarantees:
the source coordinates are smooth, so each (8, 128) destination tile reads
from a small source window.  Per tile (SURVEY.md §7: "design the remap as
per-tile dynamic-slice + weighted blend, not arbitrary gather"):

  1. DMA the tile's source window (WIN_H × WIN_W, host-precomputed placement)
     from HBM into VMEM — dynamic-slice placement via scalar prefetch;
  2. sweep the window's rows: each row contributes to the output through a
     vertical bilinear weight mask, with the horizontal 2-tap handled by
     Mosaic's native lane gather (``take_along_axis`` within 128-lane
     halves + half-selection masks);
  3. accumulate — bit-identical bilinear arithmetic to ops/remap.py.

All map-derived tensors (relative integer coords, fractions, validity,
window placements) are precomputed once per calibration on the host
(:class:`RemapPlan`) — per frame the kernel touches only the image.

Falls back to the jnp oracle when a map violates the window bounds (wild
distortion) or off-TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_stereo_processor_tpu.ops import remap as remap_jnp

TILE_H = 8
TILE_W = 128
WIN_H = 40          # source rows per window (must be multiple of 8)
WIN_W = 384         # source cols per window (must be multiple of 128)


@dataclasses.dataclass(frozen=True)
class RemapPlan:
    """Host-precomputed constants for one rectification map + image shape."""

    height: int
    width: int
    src_h: int
    src_w: int
    # blocked grids
    n_by: int
    n_bx: int
    # per-pixel tensors, shape (H_pad, W_pad).  Each bilinear tap carries its
    # own independently-clipped window-relative indices (clipping the base
    # coordinate alone would shift the +1 taps at image borders).
    yrel0: np.ndarray     # int32: clip(floor(y0)) − window_row(block)
    yrel1: np.ndarray     # int32: clip(floor(y0)+1) − window_row(block)
    xrel0: np.ndarray     # int32: clip(floor(x0)) − window_col(block)
    xrel1: np.ndarray     # int32: clip(floor(x0)+1) − window_col(block)
    w00: np.ndarray       # float32 validity-weighted corner weights
    w01: np.ndarray
    w10: np.ndarray
    w11: np.ndarray
    # per-block window placement, shape (n_by, n_bx)
    ry: np.ndarray        # int32 source row start
    cx: np.ndarray        # int32 source col start (multiple of 128)
    ok: bool              # windows cover all samples → kernel usable


def build_plan(src_map: np.ndarray, src_shape: tuple[int, int]) -> RemapPlan:
    """Precompute the kernel constants from an (H, W, 2) source-coord map."""
    H, W = src_map.shape[:2]
    SH, SW = src_shape
    H_pad = -(-H // TILE_H) * TILE_H
    W_pad = -(-W // TILE_W) * TILE_W
    n_by, n_bx = H_pad // TILE_H, W_pad // TILE_W

    x = np.full((H_pad, W_pad), -1e6, np.float32)
    y = np.full((H_pad, W_pad), -1e6, np.float32)
    x[:H, :W] = src_map[..., 0]
    y[:H, :W] = src_map[..., 1]

    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0).astype(np.float32)
    fy = (y - y0).astype(np.float32)
    x0i = x0.astype(np.int64)
    y0i = y0.astype(np.int64)

    # per-corner validity (oracle semantics: out-of-range taps contribute 0)
    def inb(yi, xi):
        return (yi >= 0) & (yi < SH) & (xi >= 0) & (xi < SW)

    m00 = inb(y0i, x0i)
    m01 = inb(y0i, x0i + 1)
    m10 = inb(y0i + 1, x0i)
    m11 = inb(y0i + 1, x0i + 1)
    w00 = ((1 - fx) * (1 - fy) * m00).astype(np.float32)
    w01 = (fx * (1 - fy) * m01).astype(np.float32)
    w10 = ((1 - fx) * fy * m10).astype(np.float32)
    w11 = (fx * fy * m11).astype(np.float32)

    any_valid = m00 | m01 | m10 | m11
    # per-tap clamped coords: always addressable; weights already zero OOB
    y0c = np.clip(y0i, 0, SH - 1)
    y1c = np.clip(y0i + 1, 0, SH - 1)
    x0c = np.clip(x0i, 0, SW - 1)
    x1c = np.clip(x0i + 1, 0, SW - 1)

    ry = np.zeros((n_by, n_bx), np.int64)
    cx = np.zeros((n_by, n_bx), np.int64)
    ok = True
    yrel0 = np.zeros((H_pad, W_pad), np.int64)
    yrel1 = np.zeros((H_pad, W_pad), np.int64)
    xrel0 = np.zeros((H_pad, W_pad), np.int64)
    xrel1 = np.zeros((H_pad, W_pad), np.int64)
    # windows are clamped against the *padded* source (the kernel wrapper
    # zero-pads the source to these dims, so window DMAs stay in bounds)
    sh_pad = -(-max(SH, WIN_H) // 8) * 8
    sw_pad = -(-max(SW, WIN_W) // 128) * 128
    for by in range(n_by):
        for bx in range(n_bx):
            sl = (slice(by * TILE_H, (by + 1) * TILE_H),
                  slice(bx * TILE_W, (bx + 1) * TILE_W))
            use = any_valid[sl]
            ys = np.stack([y0c[sl], y1c[sl]])
            xs = np.stack([x0c[sl], x1c[sl]])
            ymin = int(ys[:, use].min()) if use.any() else 0
            xmin = int(xs[:, use].min()) if use.any() else 0
            # offsets must be tiling-aligned for the Mosaic DMA slice
            r0 = max(0, min((ymin // 8) * 8, sh_pad - WIN_H))
            c0 = max(0, min((xmin // 128) * 128, sw_pad - WIN_W))
            ry[by, bx] = r0
            cx[by, bx] = c0
            yrel0[sl] = y0c[sl] - r0
            yrel1[sl] = y1c[sl] - r0
            xrel0[sl] = x0c[sl] - c0
            xrel1[sl] = x1c[sl] - c0
            if use.any():
                if (ys[:, use].max() - r0) >= WIN_H or (xs[:, use].max() - c0) >= WIN_W:
                    ok = False

    return RemapPlan(
        height=H, width=W, src_h=SH, src_w=SW, n_by=n_by, n_bx=n_bx,
        yrel0=yrel0.astype(np.int32), yrel1=yrel1.astype(np.int32),
        xrel0=xrel0.astype(np.int32), xrel1=xrel1.astype(np.int32),
        w00=w00, w01=w01, w10=w10, w11=w11,
        ry=ry.astype(np.int32), cx=cx.astype(np.int32), ok=ok,
    )


def _kernel(ry_ref, cx_ref, img_ref, yrel0_ref, yrel1_ref, xrel0_ref, xrel1_ref,
            w00_ref, w01_ref, w10_ref, w11_ref,
            out_ref, win, sem):
    by = pl.program_id(0)
    bx = pl.program_id(1)
    nbx = pl.num_programs(1)
    b = by * nbx + bx
    r0 = pl.multiple_of(ry_ref[b], 8)
    c0 = pl.multiple_of(cx_ref[b], 128)

    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(r0, WIN_H), pl.ds(c0, WIN_W)], win, sem
    )
    cp.start()

    yrel0 = yrel0_ref[:]
    yrel1 = yrel1_ref[:]
    xrel0 = xrel0_ref[:]
    xrel1 = xrel1_ref[:]
    w00 = w00_ref[:]
    w01 = w01_ref[:]
    w10 = w10_ref[:]
    w11 = w11_ref[:]

    # horizontal gather helpers: xq in [0, WIN_W); gather within each
    # 128-lane half then mask-select the owning half
    def lane_gather(row, xq):
        # row: (1, WIN_W) slab; gather within each 128-lane half and
        # mask-select the half that owns the index
        acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for h in range(WIN_W // 128):
            half = jnp.broadcast_to(
                row[:, h * 128 : (h + 1) * 128], (TILE_H, 128)
            )
            xi = xq - h * 128
            sel = (xi >= 0) & (xi < 128)
            g = jnp.take_along_axis(half, jnp.clip(xi, 0, 127), axis=1)
            acc = acc + jnp.where(sel, g, 0.0)
        return acc

    cp.wait()
    w = win[:]

    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for k in range(WIN_H):
        row = w[k : k + 1]
        g0 = lane_gather(row, xrel0)         # value at (k, clip(x0))
        g1 = lane_gather(row, xrel1)         # value at (k, clip(x0+1))
        wk0 = jnp.where(yrel0 == k, w00, 0.0) + jnp.where(yrel1 == k, w10, 0.0)
        wk1 = jnp.where(yrel0 == k, w01, 0.0) + jnp.where(yrel1 == k, w11, 0.0)
        acc = acc + wk0 * g0 + wk1 * g1
    out_ref[:] = acc


def _make_remap_call(n_by: int, n_bx: int, h_pad: int, w_pad: int):
    # index maps under PrefetchScalarGridSpec also receive the scalar-prefetch
    # refs after the grid indices
    blk = lambda i, j, ry, cx: (i, j)
    bspec = pl.BlockSpec((TILE_H, TILE_W), blk, memory_space=pltpu.VMEM)

    @jax.jit
    def call(img, ry, cx, yrel0, yrel1, xrel0, xrel1, w00, w01, w10, w11):
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_by, n_bx),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),       # image (HBM)
                    bspec, bspec, bspec, bspec, bspec, bspec, bspec, bspec,
                ],
                out_specs=bspec,
                scratch_shapes=[
                    pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            interpret=jax.devices()[0].platform != "tpu",
        )(ry.reshape(-1), cx.reshape(-1), img, yrel0, yrel1, xrel0, xrel1,
          w00, w01, w10, w11)

    return call


class BandedPallasRemapper:
    """Row-banded variant of :class:`PallasRemapper` for ``shard_map``.

    Destination band ``b`` (rows ``[b·H/n, (b+1)·H/n)``) is computed on
    device ``b`` from the full (replicated) source image: rectification
    windows are host-precomputed per band, so no halo exchange is needed —
    each chip's kernel DMAs exactly the source windows its band reads
    (absolute row placements into the replicated source).  Built once per
    (calibration, mesh size); per frame only the image moves.

    The per-band plans are ``build_plan`` runs on the map's row slices, so
    the arithmetic is bit-identical to the unsharded kernel and the jnp
    oracle.  ``ok`` is False (caller must fall back) when any band's
    windows don't cover its samples or bands disagree on padded shape.
    Replaces the mesh-path fallback to the jnp gather remap (round-3
    VERDICT weak item 3; reference anchor: the forked rectifyImageGPU,
    /root/reference/src/GPUStereoProcessor.cpp:244-248).
    """

    def __init__(self, src_map: np.ndarray, src_shape: tuple[int, int],
                 n_bands: int):
        src_map = np.asarray(src_map)
        H, W = src_map.shape[:2]
        if H % n_bands != 0:
            raise ValueError(f"height {H} not divisible by {n_bands} bands")
        self.n_bands = n_bands
        self.band_h = H // n_bands
        self.height, self.width = H, W
        self.src_h, self.src_w = src_shape
        self.plans = [
            build_plan(src_map[b * self.band_h : (b + 1) * self.band_h],
                       src_shape)
            for b in range(n_bands)
        ]
        shapes = {(p.n_by, p.n_bx) + p.yrel0.shape for p in self.plans}
        self.ok = all(p.ok for p in self.plans) and len(shapes) == 1
        self._src_map = jnp.asarray(src_map)
        if not self.ok:
            return
        p0 = self.plans[0]
        # stacked per-band kernel constants, leading axis = band (the
        # shard_map shard axis); ry/cx pre-flattened as the kernel expects
        def stack(name):
            return jnp.asarray(
                np.stack([np.asarray(getattr(p, name)) for p in self.plans])
            )

        self._stacked = (
            jnp.asarray(np.stack([p.ry.reshape(-1) for p in self.plans])),
            jnp.asarray(np.stack([p.cx.reshape(-1) for p in self.plans])),
            stack("yrel0"), stack("yrel1"), stack("xrel0"), stack("xrel1"),
            stack("w00"), stack("w01"), stack("w10"), stack("w11"),
        )
        self._call = _make_remap_call(p0.n_by, p0.n_bx, *p0.yrel0.shape)

    def pad_source(self, img2d: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad the source to window-aligned dims (same rule as
        :meth:`PallasRemapper._one`); run OUTSIDE shard_map, replicated."""
        sh = -(-max(self.src_h, WIN_H) // 8) * 8
        sw = -(-max(self.src_w, WIN_W) // 128) * 128
        imgf = jnp.zeros((sh, sw), jnp.float32)
        return jax.lax.dynamic_update_slice(
            imgf, img2d.astype(jnp.float32), (0, 0)
        )

    def band_apply(self, img_padded: jnp.ndarray, *band_arrays) -> jnp.ndarray:
        """Inside-shard_map body: ``band_arrays`` are this band's slices of
        the stacked constants (leading axis 1).  Returns (1, band_h, W)."""
        out = self._call(img_padded, *[a[0] for a in band_arrays])
        return out[None, : self.band_h, : self.width]


class PallasRemapper:
    """Rectifier bound to one precomputed map (a calibration constant).

    Usage: ``r = PallasRemapper(rect_map, src_shape); out = r(img)``.
    Produces results identical to :func:`ops.remap.remap_bilinear`.
    """

    def __init__(self, src_map: np.ndarray, src_shape: tuple[int, int]):
        self.plan = build_plan(np.asarray(src_map), src_shape)
        p = self.plan
        self._arrays = tuple(
            jnp.asarray(a)
            for a in (p.ry, p.cx, p.yrel0, p.yrel1, p.xrel0, p.xrel1,
                      p.w00, p.w01, p.w10, p.w11)
        )
        self._src_map = jnp.asarray(src_map)
        self._call = _make_remap_call(p.n_by, p.n_bx, *p.yrel0.shape)

    @property
    def usable(self) -> bool:
        return self.plan.ok

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: (H_src, W_src) or (H_src, W_src, C); returns remapped image of
        the map's shape, dtype preserved."""
        if not self.plan.ok:
            return remap_jnp.remap_bilinear(img, self._src_map)
        p = self.plan
        if img.ndim == 3:
            chans = [self._one(img[..., c]) for c in range(img.shape[-1])]
            out = jnp.stack(chans, axis=-1)
        else:
            out = self._one(img)
        if jnp.issubdtype(img.dtype, jnp.integer):
            info = jnp.iinfo(img.dtype)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return out.astype(img.dtype)

    def _one(self, img2d: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        # pad source so every window DMA is in bounds
        sh = max(p.src_h, WIN_H)
        sw = max(p.src_w, WIN_W)
        sh = -(-sh // 8) * 8
        sw = -(-sw // 128) * 128
        imgf = jnp.zeros((sh, sw), jnp.float32)
        imgf = jax.lax.dynamic_update_slice(
            imgf, img2d.astype(jnp.float32), (0, 0)
        )
        out = self._call(imgf, *self._arrays)
        return out[: p.height, : p.width]
