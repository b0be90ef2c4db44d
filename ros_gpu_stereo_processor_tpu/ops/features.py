"""Feature detection, description and matching — the sparse frontend.

Extends the engine beyond the reference's dense-only pipeline into VO/SLAM
(SURVEY.md §7 build step 6; BASELINE.json config 4).  TPU-first design:

  * **FAST-9** corner test as 16 static circle shifts + a bit-mask doubling
    trick for the contiguous-arc test — pure VPU, no loops over pixels;
  * 3×3 non-max suppression via max-pool comparison;
  * fixed-capacity keypoint sets (``top_k`` over the score map) — static
    shapes for XLA, with validity masks instead of dynamic counts;
  * rotation-steered binary descriptors (BRIEF-style 256-pair pattern with
    ORB's intensity-centroid orientation), packed into uint32 words;
  * brute-force Hamming matching as an XOR + popcount distance matrix with
    mutual-nearest + ratio gating (vectorised over K×K).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# FAST circle of radius 3 (Bresenham), (dy, dx) pairs in ring order
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (static shapes; ``valid`` gates slots)."""

    xy: jnp.ndarray       # (K, 2) float32 (x, y)
    score: jnp.ndarray    # (K,) float32
    angle: jnp.ndarray    # (K,) float32 radians
    desc: jnp.ndarray     # (K, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray    # (K,) bool


def _shift2(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge replication (boundary pixels never become corners —
    they are masked out later)."""
    H, W = x.shape
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return x[ys][:, xs]


def _rot16(m: jnp.ndarray, k: int) -> jnp.ndarray:
    return ((m << k) | (m >> (16 - k))) & jnp.uint32(0xFFFF)


def _has_arc9(mask16: jnp.ndarray) -> jnp.ndarray:
    """True where the 16-bit circle mask contains ≥9 contiguous set bits
    (wrap-around) — doubling AND-reduction."""
    a = mask16 & _rot16(mask16, 1)      # runs of ≥2
    a = a & _rot16(a, 2)                # ≥4
    a = a & _rot16(a, 4)                # ≥8
    a = a & _rot16(mask16, 8)           # ≥9
    return a > 0


def fast_score_map(img: jnp.ndarray, threshold: float = 20.0) -> jnp.ndarray:
    """FAST-9 corner response: 0 where not a corner, else a contrast score
    (sum of circle |differences| beyond the threshold)."""
    x = img.astype(jnp.float32)
    H, W = x.shape
    circle = [
        _shift2(x, int(dy), int(dx)) for dy, dx in _CIRCLE
    ]
    bright = jnp.zeros((H, W), jnp.uint32)
    dark = jnp.zeros((H, W), jnp.uint32)
    s_bright = jnp.zeros((H, W), jnp.float32)
    s_dark = jnp.zeros((H, W), jnp.float32)
    for i, c in enumerate(circle):
        db = c - x
        is_b = db > threshold
        is_d = -db > threshold
        bright = bright | (is_b.astype(jnp.uint32) << i)
        dark = dark | (is_d.astype(jnp.uint32) << i)
        s_bright = s_bright + jnp.where(is_b, db - threshold, 0.0)
        s_dark = s_dark + jnp.where(is_d, -db - threshold, 0.0)

    corner = _has_arc9(bright) | _has_arc9(dark)
    score = jnp.maximum(s_bright, s_dark)

    # 3×3 non-max suppression + border mask (patch radius 15 for descriptors)
    nb = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    margin = 16
    inb = (row >= margin) & (row < H - margin) & (col >= margin) & (col < W - margin)
    return jnp.where(corner & (score >= nb) & inb, score, 0.0)


def select_keypoints(score_map: jnp.ndarray, k: int = 512):
    """Top-K corner slots: returns (xy (K,2) f32, score (K,), valid (K,))."""
    H, W = score_map.shape
    flat = score_map.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return jnp.stack([xs, ys], -1), vals, vals > 0.0


# ---------------------------------------------------------------------------
# Orientation + descriptors
# ---------------------------------------------------------------------------

_PATCH_R = 15


def _pattern(seed: int = 7, n: int = 256) -> np.ndarray:
    """(n, 4) sampling offsets (x1, y1, x2, y2), Gaussian-distributed within
    the patch (BRIEF-style; fixed seed ⇒ a deterministic engine constant)."""
    rng = np.random.default_rng(seed)
    p = rng.normal(0.0, _PATCH_R / 2.5, size=(n, 4))
    return np.clip(p, -_PATCH_R + 1, _PATCH_R - 1).astype(np.float32)


_PATTERN = _pattern()


def _bilinear_at(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (…, 2) float coords from (H, W) image, clamped borders."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = img.reshape(-1).astype(jnp.float32)
    g = lambda yy, xx: flat[yy * W + xx]
    return (
        g(y0, x0) * (1 - fx) * (1 - fy)
        + g(y0, x0 + 1) * fx * (1 - fy)
        + g(y0 + 1, x0) * (1 - fx) * fy
        + g(y0 + 1, x0 + 1) * fx * fy
    )


def orientations(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """ORB intensity-centroid angle per keypoint: atan2(m01, m10) over a
    circular patch."""
    offs = []
    for dy in range(-_PATCH_R, _PATCH_R + 1):
        for dx in range(-_PATCH_R, _PATCH_R + 1):
            if dx * dx + dy * dy <= _PATCH_R * _PATCH_R:
                offs.append((dx, dy))
    offs = jnp.asarray(np.array(offs, np.float32))           # (P, 2)
    pts = xy[:, None, :] + offs[None]                        # (K, P, 2)
    vals = _bilinear_at(img, pts)                            # (K, P)
    m10 = jnp.sum(vals * offs[None, :, 0], axis=1)
    m01 = jnp.sum(vals * offs[None, :, 1], axis=1)
    return jnp.arctan2(m01, m10)


def describe(img: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation-steered 256-bit binary descriptors, packed (K, 8) uint32."""
    pat = jnp.asarray(_PATTERN)                              # (256, 4)
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]

    def rot(px, py):
        return px * ca - py * sa, px * sa + py * ca

    x1, y1 = rot(pat[None, :, 0], pat[None, :, 1])           # (K, 256)
    x2, y2 = rot(pat[None, :, 2], pat[None, :, 3])
    p1 = jnp.stack([xy[:, None, 0] + x1, xy[:, None, 1] + y1], -1)
    p2 = jnp.stack([xy[:, None, 0] + x2, xy[:, None, 1] + y2], -1)
    bits = (_bilinear_at(img, p1) < _bilinear_at(img, p2)).astype(jnp.uint32)
    words = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None]
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def detect_and_describe(
    img: jnp.ndarray, k: int = 512, threshold: float = 20.0
) -> Keypoints:
    """Full sparse frontend for one image: FAST-9 → NMS → top-K → orientation
    → steered binary descriptors."""
    score = fast_score_map(img, threshold)
    xy, s, valid = select_keypoints(score, k)
    ang = orientations(img, xy)
    desc = describe(img, xy, ang)
    return Keypoints(xy=xy, score=s, angle=ang, desc=desc, valid=valid)


# ---------------------------------------------------------------------------
# Matching
# ---------------------------------------------------------------------------


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_matrix(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(Ka, 8) × (Kb, 8) uint32 → (Ka, Kb) int32 Hamming distances."""
    x = da[:, None, :] ^ db[None, :, :]
    return jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_distance",))
def match(
    kp_a: Keypoints,
    kp_b: Keypoints,
    max_distance: int = 64,
    ratio: float = 0.9,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-nearest Hamming matching with Lowe ratio test.

    Returns (idx_b (Ka,) int32 — match in b for each a-slot, −1 if none;
    valid (Ka,) bool)."""
    BIG = jnp.int32(10_000)
    d = hamming_matrix(kp_a.desc, kp_b.desc)
    d = jnp.where(kp_a.valid[:, None] & kp_b.valid[None, :], d, BIG)

    best_b = jnp.argmin(d, axis=1)
    dist1 = jnp.min(d, axis=1)
    # second best for the ratio test
    d2 = d.at[jnp.arange(d.shape[0]), best_b].set(BIG)
    dist2 = jnp.min(d2, axis=1)
    # mutual check
    best_a_of_b = jnp.argmin(d, axis=0)
    mutual = best_a_of_b[best_b] == jnp.arange(d.shape[0])

    ok = (
        (dist1 <= max_distance)
        & (dist1.astype(jnp.float32) <= ratio * dist2.astype(jnp.float32))
        & mutual
        & kp_a.valid
    )
    return jnp.where(ok, best_b, -1), ok
