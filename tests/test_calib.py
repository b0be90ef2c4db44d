"""Calibration / geometry tests against the cv2 oracle and the reference's
golden rectified images (the RectifyMono{Cpu,Gpu} gates, test/UTest.cpp:247-288)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.conftest import mean_abs_error
from ros_gpu_stereo_processor_tpu.utils.calib import undistort_rectify_map


def test_calib_fields(stereo_model):
    m = stereo_model
    assert m.left.calib.width == 752
    assert m.left.calib.height == 480
    assert m.fx == pytest.approx(441.238411)
    # baseline ≈ 0.100 m (Tx/fx = 44.133/441.238; BASELINE.md workload row)
    assert m.baseline == pytest.approx(44.133133 / 441.238411, rel=1e-9)
    assert m.disparity_offset == pytest.approx(0.0)
    # camera names parsed (the reference never sets the right one — bug §2.9)
    assert m.left.calib.name.endswith("left")
    assert m.right.calib.name.endswith("right")


def test_rect_map_matches_cv2(stereo_model):
    c = stereo_model.left.calib
    mx_cv, my_cv = cv2.initUndistortRectifyMap(
        c.K, c.D, c.R, c.P, (c.width, c.height), cv2.CV_32FC1
    )
    ours = stereo_model.left.rect_map
    assert np.max(np.abs(ours[..., 0] - mx_cv)) < 1e-2
    assert np.max(np.abs(ours[..., 1] - my_cv)) < 1e-2


def test_rectification_matches_golden(stereo_model, kitchen_images):
    """Remap with our maps reproduces the reference's golden rectified image
    within its own GPU gate (mean abs err ≤ 0.1/px, test/UTest.cpp:286-287)."""
    from ros_gpu_stereo_processor_tpu.ops.remap import remap_bilinear
    import jax.numpy as jnp

    for side in ("left", "right"):
        raw = kitchen_images[side]
        golden = kitchen_images[f"{side}_rect"]
        m = getattr(stereo_model, side).rect_map
        ours = np.asarray(remap_bilinear(jnp.asarray(raw), jnp.asarray(m)))
        err = mean_abs_error(ours, golden)
        assert err <= 0.1, f"{side}: mean abs err {err}"


def test_remap_matches_cv2(stereo_model, kitchen_images):
    from ros_gpu_stereo_processor_tpu.ops.remap import remap_bilinear
    import jax.numpy as jnp

    c = stereo_model.left.calib
    raw = kitchen_images["left"]
    m = stereo_model.left.rect_map
    ref = cv2.remap(raw, m[..., 0], m[..., 1], cv2.INTER_LINEAR)
    ours = np.asarray(remap_bilinear(jnp.asarray(raw), jnp.asarray(m)))
    # identical interpolation up to rounding: allow tiny mean error
    assert mean_abs_error(ours, ref) < 0.05


def test_q_matrix_matches_cv2_reproject(stereo_model):
    """Q·[u v d 1] agrees with cv2.reprojectImageTo3D using the same Q."""
    from ros_gpu_stereo_processor_tpu.ops.reproject import reproject_disparity
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    disp = rng.uniform(1.0, 64.0, size=(48, 64)).astype(np.float32)
    Q = stereo_model.Q
    ref = cv2.reprojectImageTo3D(disp, Q.astype(np.float64))
    ours = np.asarray(reproject_disparity(jnp.asarray(disp), jnp.asarray(Q, dtype=jnp.float32)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_identity_map_roundtrip():
    """Zero distortion + identity R/P≡K ⇒ identity map."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    P = np.hstack([K, np.zeros((3, 1))])
    m = undistort_rectify_map(K, np.zeros(5), np.eye(3), P, (64, 48))
    u, v = np.meshgrid(np.arange(64.0), np.arange(48.0))
    np.testing.assert_allclose(m[..., 0], u, atol=1e-9)
    np.testing.assert_allclose(m[..., 1], v, atol=1e-9)


def test_fov_logged_quantities(stereo_model):
    # FOV from rectified intrinsics (reference logs at model init,
    # src/GPUStereoProcessor.cpp:47-51)
    fovx = np.degrees(stereo_model.left.fov_x)
    assert 60.0 < fovx < 100.0


def test_from_camera_info_matches_files(stereo_model, test_data_dir):
    """Live CameraInfo-dict init produces the same model as YAML files
    (the reference's imageAndInfoCb one-shot init)."""
    import os
    from ros_gpu_stereo_processor_tpu.utils.calib import StereoCameraModel

    def info(c):
        return {"width": c.width, "height": c.height, "K": c.K, "D": c.D,
                "R": c.R, "P": c.P, "name": c.name}

    m2 = StereoCameraModel.from_camera_info(
        info(stereo_model.left.calib), info(stereo_model.right.calib)
    )
    assert m2.baseline == stereo_model.baseline
    np.testing.assert_array_equal(m2.Q, stereo_model.Q)
    np.testing.assert_array_equal(m2.left.rect_map, stereo_model.left.rect_map)
