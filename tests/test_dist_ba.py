"""Distributed (landmark-sharded) BA must agree with single-device BA."""

import numpy as np
import pytest
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.models import ba as BA
from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh
from ros_gpu_stereo_processor_tpu.parallel.dist_ba import bundle_adjust_sharded
from tests.test_ba import make_problem, _anchor


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_single(n_dev):
    p, (R_true, t_true, pts_true) = make_problem(M=4, N=64, point_noise=0.0)
    prior = _anchor(p)
    mesh = make_mesh(n_dev, ("kf",))
    pf_s, hist_s = bundle_adjust_sharded(
        p, mesh, iters=10, point_prior=prior
    )
    pf_1, hist_1 = BA.bundle_adjust(p, iters=10, point_prior=prior)
    # same optimum (f32 reduction order differs slightly)
    np.testing.assert_allclose(np.asarray(pf_s.t), np.asarray(pf_1.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pf_s.R), np.asarray(pf_1.R), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pf_s.points), np.asarray(pf_1.points), atol=5e-3
    )
    assert np.asarray(hist_s)[-1] < 1e-2


def test_sharded_converges_to_truth():
    p, (R_true, t_true, pts_true) = make_problem(M=5, N=64, point_noise=0.0, seed=7)
    mesh = make_mesh(4, ("kf",))
    pf, hist = bundle_adjust_sharded(p, mesh, iters=12, point_prior=_anchor(p))
    np.testing.assert_allclose(np.asarray(pf.t), t_true, atol=2e-3)


def test_indivisible_raises():
    p, _ = make_problem(M=3, N=60)
    mesh = make_mesh(8, ("kf",))
    with pytest.raises(ValueError):
        bundle_adjust_sharded(p, mesh)
