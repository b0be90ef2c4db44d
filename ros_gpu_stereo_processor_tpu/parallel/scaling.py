"""Scaling-efficiency measurement harness.

The north star asks for frames/s scaling efficiency at 1 chip / 1 host /
N hosts.  This harness measures the row-sharded dense frontend on sub-meshes
of 1..N devices and reports throughput and efficiency vs linear scaling.
It runs identically on a virtual CPU mesh (CI; numbers are *not* hardware-
representative there) and on real multi-chip slices when available.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
from ros_gpu_stereo_processor_tpu.parallel.frontend import disparity_row_sharded
from ros_gpu_stereo_processor_tpu.parallel.mesh import make_mesh


def measure_scaling(
    height: int = 480,
    width: int = 752,
    cfg: StereoBMConfig = StereoBMConfig(
        num_disparities=64, block_size=15, texture_threshold=10
    ),
    device_counts: List[int] | None = None,
    batch: int = 4,
    iters: int = 3,
    overhead_ms: float = 0.0,
) -> Dict:
    """Throughput of the sharded matcher at each device count.

    Returns {"results": [{n, fps, ms_per_frame}], "efficiency": {n: e}} where
    e = fps(n) / (n · fps(1)).
    """
    rng = np.random.default_rng(0)
    navail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16) if n <= navail]

    lefts = jnp.asarray(
        rng.integers(0, 255, (batch, height, width), np.uint8)
    )
    rights = jnp.asarray(
        rng.integers(0, 255, (batch, height, width), np.uint8)
    )

    results = []
    for n in device_counts:
        if height % n != 0:
            continue
        mesh = make_mesh(n, ("rows",))

        @jax.jit
        def run(ls, rs):
            def step(c, lr):
                d, v = disparity_row_sharded(lr[0], lr[1], cfg, mesh)
                return c, d.sum()

            return jax.lax.scan(step, 0, jnp.stack([ls, rs], 1))[1].sum()

        float(run(lefts, rights))  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            float(run(lefts, rights))
        dt = (time.perf_counter() - t0) / iters
        ms = max(dt * 1e3 - overhead_ms, 1e-6) / batch
        results.append({"n_devices": n, "ms_per_frame": round(ms, 3),
                        "fps": round(1e3 / ms, 2)})

    base = results[0]["fps"] if results else 1.0
    eff = {
        r["n_devices"]: round(r["fps"] / (r["n_devices"] * base), 3)
        for r in results
    }
    return {"results": results, "efficiency": eff}
