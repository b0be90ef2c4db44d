"""Observability tests: stage timer, counters, printStats, pipeline TIMING."""

import re
import time

import numpy as np
import jax.numpy as jnp

from ros_gpu_stereo_processor_tpu.utils.timing import (
    Counters, StageTimer, print_stats,
)


def test_stage_timer_contexts():
    t = StageTimer()
    with t.stage("upload"):
        time.sleep(0.01)
    with t.stage("disparity"):
        time.sleep(0.002)
    line = t.timing_line()
    assert line.startswith("TIMING [ms]:")
    assert "upload(" in line and "disparity(" in line
    d = t.as_dict()
    assert d["upload"]["last_ms"] >= 9.0
    assert d["upload"]["count"] == 1


def test_stage_timer_blocks_on_device_result():
    t = StageTimer()
    with t.stage("compute", block_on=jnp.arange(8) * 2):
        pass
    assert t.stages["compute"].count == 1


def test_start_stop():
    t = StageTimer()
    t.start("x")
    time.sleep(0.005)
    t.stop("x")
    assert t.stages["x"].last_ms >= 4.0


def test_counters():
    c = Counters()
    c.inc("frames")
    c.inc("frames")
    c.inc("dropped", 3)
    assert c["frames"] == 2
    assert c.as_dict() == {"frames": 2, "dropped": 3}


def test_print_stats_formats():
    out = print_stats("img", np.arange(12).reshape(3, 4))
    assert re.search(r"min=0\.000 max=11\.000 mean=5\.500", out)
    out3 = print_stats("rgb", np.zeros((2, 2, 3)))
    assert out3.count("\n") == 2


def test_pipeline_timing_line(stereo_model, kitchen_images):
    from ros_gpu_stereo_processor_tpu.config import Outputs
    from ros_gpu_stereo_processor_tpu.models.pipeline import StereoPipeline

    pipe = StereoPipeline(stereo_model)
    _, ms = pipe.timed_process(
        kitchen_images["left"], kitchen_images["right"], Outputs.of("mono_left")
    )
    assert ms > 0
    assert "process[1 outs](" in pipe.timing_line()


def test_debug_artifacts(tmp_path):
    from ros_gpu_stereo_processor_tpu.utils import debug as D

    rng = np.random.default_rng(0)
    l = rng.integers(0, 255, (32, 48), np.uint8)
    r = rng.integers(0, 255, (32, 48), np.uint8)
    canvas = D.stereo_with_epipolar(l, r, n_lines=4)
    assert canvas.shape == (32, 96, 3)
    assert (canvas[(32 * 1) // 5, :, 0] == 255).all()

    a = rng.random((8, 8)).astype(np.float32)
    b = a + 0.5
    paths = D.dump_comparison(str(tmp_path), a, b)
    import os
    for p in paths.values():
        assert os.path.exists(p)
    loaded = np.loadtxt(paths["ours_csv"], delimiter=",")
    np.testing.assert_allclose(loaded, a, atol=1e-3)
    m = open(paths["mat"]).read()
    assert m.startswith("disparity = [")
