"""Block-matcher tests: synthetic known-disparity recovery plus statistical
parity against the OpenCV CPU StereoBM oracle — the reference's own GPU-vs-CPU
parity strategy (src/GPUStereoProcessor.cpp:18-38, test/UTest.cpp:290-331)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair


def cv_stereobm(left, right, cfg: StereoBMConfig):
    m = cv2.StereoBM_create(cfg.num_disparities, cfg.block_size)
    m.setPreFilterType(
        cv2.STEREO_BM_PREFILTER_XSOBEL if cfg.xsobel else cv2.STEREO_BM_PREFILTER_NORMALIZED_RESPONSE
    )
    m.setPreFilterCap(cfg.prefilter_cap)
    m.setTextureThreshold(cfg.texture_threshold)
    m.setUniquenessRatio(cfg.uniqueness_ratio)
    m.setMinDisparity(cfg.min_disparity)
    m.setSpeckleWindowSize(0)
    m.setDisp12MaxDiff(-1)
    d16 = m.compute(left, right)
    disp = d16.astype(np.float32) / 16.0
    valid = d16 > (cfg.min_disparity - 1) * 16
    return disp, valid


def test_synthetic_ramp_recovery():
    """Known integer-disparity random-dot pair: matcher must recover it almost
    everywhere in the valid window."""
    cfg = StereoBMConfig(num_disparities=48, block_size=9, texture_threshold=10)
    left, right, true_disp = synthetic_stereo_pair(120, 240, max_disparity=40, seed=0)
    disp, valid = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    disp, valid = np.asarray(disp), np.asarray(valid)

    x0, y0, w, h = bm.valid_window(cfg, *left.shape)
    win = (slice(y0 + 2, y0 + h - 2), slice(x0 + 2, x0 + w - 2))
    v = valid[win]
    assert v.mean() > 0.9
    err = np.abs(disp[win] - true_disp[win])[v]
    assert np.mean(err <= 1.0) > 0.98, f"only {np.mean(err <= 1.0):.3f} within 1px"


def test_parity_with_cv2_aloe(aloe_images):
    """Aloe Middlebury pair: ≥90% of jointly-valid pixels within 1 disparity
    of the OpenCV CPU oracle."""
    cfg = StereoBMConfig(
        num_disparities=64, block_size=15, texture_threshold=10, uniqueness_ratio=0
    )
    left, right = aloe_images["left"], aloe_images["right"]
    ref_disp, ref_valid = cv_stereobm(left, right, cfg)
    disp, valid = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    disp, valid = np.asarray(disp), np.asarray(valid)

    both = ref_valid & valid
    x0, y0, w, h = bm.valid_window(cfg, *left.shape)
    win = np.zeros_like(both)
    win[y0 : y0 + h, x0 : x0 + w] = True
    both &= win
    assert both.mean() > 0.3  # enough overlap to be meaningful
    agree = np.abs(disp[both] - ref_disp[both]) <= 1.0
    assert agree.mean() > 0.9, f"agreement {agree.mean():.3f}"
    # validity masks mostly agree too
    assert (ref_valid[win] == valid[win]).mean() > 0.8


def _prefilter_norm_numpy(img: np.ndarray, cap: int = 31, win: int = 9):
    """Independent numpy transcription of OpenCV's prefilterNorm
    (modules/calib3d/src/stereobm.cpp) — the oracle for the jnp version."""
    H, W = img.shape
    x = img.astype(np.int64)
    wsz2 = win // 2
    scale_g0 = (win * win) // 8
    scale_s = (1024 + scale_g0) // (scale_g0 * 2)
    scale_g = scale_g0 * scale_s
    xe = np.pad(x, wsz2, mode="edge")
    winsum = np.zeros((H, W), np.int64)
    for dy in range(win):
        for dx in range(win):
            winsum += xe[dy : dy + H, dx : dx + W]
    xp = np.pad(x, 1, mode="edge")
    cross = (
        4 * x
        + xp[:-2, 1:-1] + xp[2:, 1:-1]
        + xp[1:-1, :-2] + xp[1:-1, 2:]
    )
    val = (cross * scale_g - winsum * scale_s) >> 10  # arithmetic shift
    return (np.clip(val, -cap, cap) + cap).astype(np.float32)


def test_normalized_response_prefilter_matches_oracle(aloe_images):
    """The jnp normalized-response prefilter reproduces OpenCV's integer
    prefilterNorm formula bit-exactly (the slab-sharded packed argmin's
    exactness argument leans on these cost values, parallel/frontend.py)."""
    img = aloe_images["left"]
    got = np.asarray(bm.normalized_response_prefilter(jnp.asarray(img), 31, 9))
    want = _prefilter_norm_numpy(img, 31, 9)
    np.testing.assert_array_equal(got, want)


def test_parity_with_cv2_normalized_response(aloe_images):
    """Full BM pass in NORMALIZED_RESPONSE mode vs the cv2 oracle: the
    non-XSobel branch of the reference's prefilter selector
    (src/GPUStereoProcessor.cpp:389-393)."""
    cfg = StereoBMConfig(
        num_disparities=64, block_size=15, texture_threshold=10, xsobel=False
    )
    left, right = aloe_images["left"], aloe_images["right"]
    ref_disp, ref_valid = cv_stereobm(left, right, cfg)
    disp, valid = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    disp, valid = np.asarray(disp), np.asarray(valid)

    x0, y0, w, h = bm.valid_window(cfg, *left.shape)
    win = np.zeros_like(ref_valid)
    win[y0 : y0 + h, x0 : x0 + w] = True
    both = ref_valid & valid & win
    assert both.mean() > 0.5
    agree = np.abs(disp[both] - ref_disp[both]) <= 1.0
    assert agree.mean() > 0.99, f"agreement {agree.mean():.4f}"
    assert (ref_valid[win] == valid[win]).mean() > 0.99


def test_subpixel_refinement():
    """refine_disparity adds a fractional component bounded by ±0.5 and
    reduces error on a smooth scene vs integer WTA."""
    cfg_i = StereoBMConfig(num_disparities=48, block_size=9, refine_disparity=False)
    cfg_s = cfg_i.replace(refine_disparity=True)
    left, right, true_disp = synthetic_stereo_pair(96, 200, max_disparity=40, seed=1)
    di, vi = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg_i)
    ds, vs = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg_s)
    di, ds, vs = np.asarray(di), np.asarray(ds), np.asarray(vs)
    frac = np.abs(ds[vs] - np.round(ds[vs]))
    assert frac.max() <= 0.5 + 1e-6
    assert np.any(frac > 0)  # some pixels actually refined


def test_texture_threshold_invalidates_flat():
    cfg = StereoBMConfig(num_disparities=16, block_size=9, texture_threshold=500)
    flat = np.full((64, 96), 128, np.uint8)
    _, valid = bm.compute_disparity(jnp.asarray(flat), jnp.asarray(flat), cfg)
    assert not np.any(np.asarray(valid))


def test_uniqueness_ratio_invalidates_ambiguous():
    """Periodic texture (period < ndisp) is ambiguous → high uniqueness ratio
    must invalidate most of it."""
    cfg0 = StereoBMConfig(num_disparities=32, block_size=9, uniqueness_ratio=0,
                          texture_threshold=0)
    cfg15 = cfg0.replace(uniqueness_ratio=15)
    yy, xx = np.mgrid[0:64, 0:128]
    pat = ((np.sin(xx * 2 * np.pi / 8) * 100) + 128).astype(np.uint8)
    _, v0 = bm.compute_disparity(jnp.asarray(pat), jnp.asarray(pat), cfg0)
    _, v15 = bm.compute_disparity(jnp.asarray(pat), jnp.asarray(pat), cfg15)
    assert np.asarray(v15).sum() < np.asarray(v0).sum() * 0.5


def test_min_disparity_offset():
    """min_disparity shifts the search band: a pair with disparity ~20 is
    found with min_disparity=16, and disparity values include the offset."""
    cfg = StereoBMConfig(num_disparities=16, block_size=9, min_disparity=16,
                         texture_threshold=5)
    left, right, true_disp = synthetic_stereo_pair(96, 220, max_disparity=28, seed=2)
    # clamp the scene's disparity into [16, 28]: regenerate with ramp 16..28
    rng = np.random.default_rng(3)
    H, W = 96, 220
    yy, xx = np.mgrid[0:H, 0:W]
    disp = np.round(16 + 10 * xx / W).astype(np.float32)
    tex = rng.integers(0, 255, size=(H, W + 40), dtype=np.uint8)
    right = tex[:, 40:].copy()
    left = tex[yy, xx + 40 - disp.astype(np.int64)]
    d, v = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    d, v = np.asarray(d), np.asarray(v)
    x0, y0, w, h = bm.valid_window(cfg, H, W)
    win = (slice(y0 + 2, y0 + h - 2), slice(x0 + 2, x0 + w - 2))
    vv = v[win]
    assert vv.mean() > 0.8
    err = np.abs(d[win] - disp[win])[vv]
    assert np.mean(err <= 1.0) > 0.95


def test_valid_window_formula():
    """The corrected valid-window formula (intent of
    src/GpuSenderDisparity.cpp:29-39 with the arg-swap bug fixed)."""
    cfg = StereoBMConfig(num_disparities=64, block_size=15)
    x0, y0, w, h = bm.valid_window(cfg, 480, 752)
    assert x0 == 64 + 0 + 7 - 1
    assert y0 == 7
    assert w == (752 - 1 - 7) - x0 + 1
    assert h == (480 - 1 - 7) - y0 + 1


def test_config_validation():
    with pytest.raises(ValueError):
        StereoBMConfig(block_size=10)       # even
    with pytest.raises(ValueError):
        StereoBMConfig(num_disparities=50)  # not multiple of 16


def test_right_disparity_from_cost_bruteforce():
    """Rolled-frame right-WTA matches a brute-force numpy evaluation."""
    from ros_gpu_stereo_processor_tpu.ops.stereobm import (
        prefilter, right_disparity_from_cost, sad_cost_volume,
    )

    cfg = StereoBMConfig(num_disparities=16, block_size=5, texture_threshold=0)
    left, right, _ = synthetic_stereo_pair(40, 96, max_disparity=12, seed=7)
    lf = prefilter(jnp.asarray(left), cfg)
    rf = prefilter(jnp.asarray(right), cfg)
    cost = np.asarray(sad_cost_volume(lf, rf, cfg))
    nd, H, W = cost.shape

    ref = np.full((H, W), cfg.min_disparity - 1, np.float32)
    for y in range(H):
        for xr in range(W):
            cands = [(cost[d, y, xr + d], d) for d in range(nd) if xr + d < W
                     and cost[d, y, xr + d] < 1e8]
            if cands:
                ref[y, xr] = min(cands)[1]
    ours = np.asarray(right_disparity_from_cost(jnp.asarray(cost), cfg))
    np.testing.assert_array_equal(ours, ref)


def test_lr_check_invalidates_occlusions():
    """A foreground square creates left-side occlusion; the LR check must
    invalidate (most of) the occluded band while keeping valid surfaces."""
    cfg0 = StereoBMConfig(num_disparities=32, block_size=9, texture_threshold=5)
    cfg1 = cfg0.replace(lr_check=True)
    H, W, d_bg, d_fg = 96, 224, 4, 20
    rng = np.random.default_rng(8)
    M = 40
    tex_bg = rng.integers(0, 255, (H, W + M), np.uint8)
    tex_fg = rng.integers(0, 255, (H, W + M), np.uint8)
    fg = np.zeros((H, W), bool)
    fg[24:72, 100:150] = True

    def render(shift_extra):
        # compose: background at d_bg, foreground square at d_fg
        img = tex_bg[:, M - shift_extra - d_bg : M - shift_extra - d_bg + W].copy()
        m = fg  # foreground mask fixed in LEFT-image coords, shifted in right
        if shift_extra == 0:
            img[m] = tex_fg[:, M : M + W][m]
        else:
            sh = np.zeros_like(m)
            sh[:, : W - (d_fg - d_bg)] = m[:, (d_fg - d_bg):]
            img2 = tex_fg[:, M - shift_extra - d_fg : M - shift_extra - d_fg + W]
            img[sh] = img2[sh]
        return img

    left = render(0)
    right = render(0)
    # right image: everything shifted left by its disparity
    right = np.empty_like(left)
    xs = np.arange(W)
    for y in range(H):
        right[y] = tex_bg[y, xs + M - d_bg]
    # paste foreground into right at shifted position
    for y in range(H):
        for x in range(W):
            if fg[y, x]:
                xr = x - d_fg
                if 0 <= xr < W:
                    right[y, xr] = left[y, x]

    d0, v0 = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg0)
    d1, v1 = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg1)
    v0, v1 = np.asarray(v0), np.asarray(v1)
    # LR check only removes pixels
    assert (v1 <= v0).all()
    # occluded band: background pixels just left of the fg square that are
    # covered in the right image: x - d_bg in [100-d_fg, 100-d_bg)
    occ = np.zeros((H, W), bool)
    occ[26:70, 100 - (d_fg - d_bg) + 2 : 100 - 2] = True
    occ &= ~fg
    kept0 = v0[occ].mean()
    kept1 = v1[occ].mean()
    assert kept1 < kept0 * 0.7, f"LR check kept {kept1:.2f} vs {kept0:.2f}"
    # non-occluded background mostly survives
    good = np.zeros((H, W), bool)
    good[10:86, 40:80] = True
    assert v1[good].mean() > 0.7 * v0[good].mean()
