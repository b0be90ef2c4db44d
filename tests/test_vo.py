"""Visual-odometry tests: Lie-group identities, synthetic PnP pose recovery,
and end-to-end VO on a rendered translating scene."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.utils import lie
from ros_gpu_stereo_processor_tpu.models import vo as VO
from ros_gpu_stereo_processor_tpu.utils.calib import CameraCalib, StereoCameraModel


# ---------------------------------------------------------------------------
# Lie algebra
# ---------------------------------------------------------------------------


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.8, (32, 3)).astype(np.float64)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-5)
    # orthonormality
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    xi = rng.normal(0, 0.5, (16, 6))
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-5)


def test_se3_small_angle():
    xi = jnp.asarray([1e-9, 0, 0, 0, 0, 1e-10])
    R, t = lie.se3_exp(xi)
    assert np.isfinite(np.asarray(R)).all() and np.isfinite(np.asarray(t)).all()


def test_compose_inverse():
    rng = np.random.default_rng(2)
    xi = rng.normal(0, 0.4, (6,))
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-6)


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------

FX, CX, CY = 400.0, 320.0, 240.0


def _project(pts, R, t):
    pc = pts @ R.T + t
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FX * pc[:, 1] / pc[:, 2] + CY], -1)


def test_pnp_recovers_pose():
    rng = np.random.default_rng(3)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (100, 3))
    xi_true = np.array([0.1, -0.05, 0.2, 0.03, -0.02, 0.05])
    R_true, t_true = (np.asarray(a) for a in lie.se3_exp(jnp.asarray(xi_true)))
    obs = _project(pts, R_true, t_true)
    R, t, rms = VO.pnp_gauss_newton(
        jnp.asarray(pts), jnp.asarray(obs), jnp.ones(100),
        fx=FX, cx=CX, cy=CY, R0=jnp.eye(3), t0=jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    assert float(rms) < 0.01


def test_pnp_robust_to_outliers():
    rng = np.random.default_rng(4)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (120, 3))
    xi_true = np.array([0.05, 0.02, -0.1, 0.01, 0.04, -0.02])
    R_true, t_true = (np.asarray(a) for a in lie.se3_exp(jnp.asarray(xi_true)))
    obs = _project(pts, R_true, t_true)
    obs[:20] += rng.uniform(30, 80, (20, 2))   # gross outliers
    R, t, rms = VO.pnp_gauss_newton(
        jnp.asarray(pts), jnp.asarray(obs), jnp.ones(120),
        fx=FX, cx=CX, cy=CY, R0=jnp.eye(3), t0=jnp.zeros(3), iters=15,
    )
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.05)
    err = np.abs(np.asarray(lie.so3_log(jnp.asarray(np.asarray(R) @ R_true.T))))
    assert err.max() < 0.01


def test_pnp_ignores_masked_points():
    rng = np.random.default_rng(5)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (60, 3))
    xi_true = np.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0])
    R_true, t_true = (np.asarray(a) for a in lie.se3_exp(jnp.asarray(xi_true)))
    obs = _project(pts, R_true, t_true)
    obs[30:] = 1e6                    # garbage, but masked out
    w = np.ones(60); w[30:] = 0.0
    R, t, _ = VO.pnp_gauss_newton(
        jnp.asarray(pts), jnp.asarray(obs), jnp.asarray(w),
        fx=FX, cx=CX, cy=CY, R0=jnp.eye(3), t0=jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


# ---------------------------------------------------------------------------
# Triangulation + end-to-end VO on a synthetic translating scene
# ---------------------------------------------------------------------------


def _toy_model(width=320, height=240, fx=300.0, baseline=0.1):
    K = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1.0]])
    P = np.hstack([K, np.zeros((3, 1))])
    Pr = P.copy()
    Pr[0, 3] = -fx * baseline
    mk = lambda PP, nm: CameraCalib(width, height, K, np.zeros(5), np.eye(3), PP, nm)
    return StereoCameraModel.from_calibs(mk(P, "left"), mk(Pr, "right"))


def test_triangulate_keypoints():
    m = _toy_model()
    disp = np.full((240, 320), 15.0, np.float32)   # Z = 300*0.1/15 = 2 m
    xy = jnp.asarray([[160.0, 120.0], [200.0, 120.0]])
    pts, valid = VO.triangulate_keypoints(
        xy, jnp.asarray(disp), fx=m.fx, cx=m.left.calib.cx, cy=m.left.calib.cy,
        baseline=m.baseline,
    )
    pts = np.asarray(pts)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(pts[1, 0], (200 - 160) * 2.0 / 300.0, atol=1e-5)


def test_vo_translating_plane():
    """Textured fronto-parallel plane at Z=2 m, camera translating +x:
    the image shifts left by fx·Δx/Z px; VO must recover the trajectory."""
    m = _toy_model()
    rng = np.random.default_rng(6)
    Z = 2.0
    shift_per_frame_px = 6           # ⇒ Δx = shift · Z / fx = 0.04 m
    n_frames = 4
    W, H = 320, 240
    pad = shift_per_frame_px * n_frames + 8
    tex = rng.integers(0, 255, (H, W + pad), np.uint8)
    # smooth the texture a touch so FAST finds stable corners
    disp_val = m.fx * m.baseline / Z
    disp = np.full((H, W), disp_val, np.float32)

    odo = VO.StereoVisualOdometry(m, num_features=256, min_matches=8)
    for i in range(n_frames):
        left = tex[:, i * shift_per_frame_px : i * shift_per_frame_px + W]
        info = odo.step(jnp.asarray(left), jnp.asarray(disp))
        if i > 0:
            assert info["tracked"], f"frame {i}: lost ({info['n_matches']} matches)"
    # camera moved +x by (n-1)·shift·Z/fx
    expect = (n_frames - 1) * shift_per_frame_px * Z / m.fx
    t = odo.state.t_wc
    np.testing.assert_allclose(t[0], expect, atol=0.01)
    assert abs(t[1]) < 0.01 and abs(t[2]) < 0.02
