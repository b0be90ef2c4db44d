"""Multi-axis mesh tests — the multi-host layout (host × chip ≙ kf × rows)
exercised on the virtual CPU mesh (SURVEY.md §4 implications: CI-able
N-host sharding without a pod)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.models import ba as BA
from ros_gpu_stereo_processor_tpu.ops import stereobm as bm
from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh
from ros_gpu_stereo_processor_tpu.parallel.frontend import disparity_row_sharded
from ros_gpu_stereo_processor_tpu.parallel.dist_ba import bundle_adjust_sharded
from ros_gpu_stereo_processor_tpu.utils.io import synthetic_stereo_pair
from tests.test_ba import make_problem, _anchor


def test_2d_mesh_construction():
    mesh = make_mesh(8, ("kf", "rows"), shape=(2, 4))
    assert mesh.shape["kf"] == 2
    assert mesh.shape["rows"] == 4


def test_frontend_on_2d_mesh_submesh():
    """The dense frontend runs on the 'rows' axis of a 2-D (kf × rows) mesh
    while the same mesh's 'kf' axis carries BA — the multi-host layout."""
    mesh = make_mesh(8, ("kf", "rows"), shape=(2, 4))
    cfg = StereoBMConfig(num_disparities=32, block_size=9, texture_threshold=10)
    left, right, _ = synthetic_stereo_pair(64, 256, max_disparity=24, seed=0)
    ref_d, ref_v = bm.compute_disparity(jnp.asarray(left), jnp.asarray(right), cfg)

    d, v = disparity_row_sharded(
        jnp.asarray(left), jnp.asarray(right), cfg, mesh, axis="rows"
    )
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-5)


def test_ba_on_2d_mesh_kf_axis():
    mesh = make_mesh(8, ("kf", "rows"), shape=(4, 2))
    p, (R_true, t_true, pts_true) = make_problem(M=4, N=64, point_noise=0.0)
    pf, hist = bundle_adjust_sharded(p, mesh, axis="kf", iters=10,
                                     point_prior=_anchor(p))
    pf1, _ = BA.bundle_adjust(p, iters=10, point_prior=_anchor(p))
    np.testing.assert_allclose(np.asarray(pf.t), np.asarray(pf1.t), atol=1e-3)


def test_replicated_and_sharded_io_roundtrip():
    """Host-sharded device_put + collective read-back round-trips."""
    mesh = make_mesh(8, ("rows",))
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    xs = jax.device_put(x, NamedSharding(mesh, P("rows")))
    assert xs.sharding.spec == P("rows")
    np.testing.assert_array_equal(np.asarray(xs), x)
    y = jax.jit(lambda a: a.sum())(xs)
    assert float(y) == x.sum()
