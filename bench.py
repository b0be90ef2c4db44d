"""Headline benchmark: dense 752×480 disparity throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): > 20 fps dense disparity (64 candidates) on a
single v5e chip, real-time streaming.  vs_baseline = fps / 20.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.config import (
        Outputs, PipelineConfig, SpeckleConfig, StereoBMConfig,
    )
    from ros_gpu_stereo_processor_tpu.models.pipeline import StereoPipeline
    from __graft_entry__ import _model_and_frame

    model, left, right = _model_and_frame()
    use_pallas = os.environ.get("BENCH_PALLAS", "auto")
    platform = jax.devices()[0].platform
    pallas = (
        use_pallas == "1"
        if use_pallas in ("0", "1")
        else platform == "tpu"
    )

    cfg = PipelineConfig(
        stereobm=StereoBMConfig(
            num_disparities=64, block_size=15, texture_threshold=10
        ),
        speckle=SpeckleConfig(max_speckle_size=800, max_diff=5.0, propagation_iters=16),
    )
    from ros_gpu_stereo_processor_tpu.models.pipeline import _pipeline_step

    outputs = Outputs.of("disparity", "pointcloud")

    remappers = None
    if pallas:
        from ros_gpu_stereo_processor_tpu.ops.remap_pallas import PallasRemapper

        shape = (model.left.calib.height, model.left.calib.width)
        rl = PallasRemapper(model.left.rect_map, shape)
        rr = PallasRemapper(model.right.rect_map, shape)
        if rl.usable and rr.usable:
            remappers = {"left": rl, "right": rr}

    # Streaming mode: batch of frames per dispatch (the double-buffered
    # in-flight pipeline; it also amortises the dev-tunnel's ~24 ms round
    # trip).  Outputs are reduced to scalar checksums ON DEVICE — the tunnel's
    # D2H path is not part of the measured pipeline (in production outputs
    # feed further device stages / local host DMA, not a gRPC tunnel).
    B = int(os.environ.get("BENCH_BATCH", "8"))
    lefts = jnp.asarray(np.stack([left] * B))
    rights = jnp.asarray(np.stack([right] * B))
    maps = jnp.asarray(model.rect_maps_stacked())
    Q = jnp.asarray(model.Q.astype(np.float32))

    @jax.jit
    def run_batch(ls, rs):
        def step(carry, lr):
            out = _pipeline_step(
                lr[0], lr[1], maps, Q,
                encoding="mono8", outputs=outputs,
                bm=cfg.stereobm, speckle=cfg.speckle, use_pallas=pallas,
                remappers=remappers,
            )
            sums = sum(
                jnp.sum(jnp.nan_to_num(v.astype(jnp.float32))) for v in out.values()
            )
            return carry, sums

        _, sums = jax.lax.scan(step, 0, jnp.stack([ls, rs], axis=1))
        return jnp.sum(sums)

    # warmup / compile
    float(run_batch(lefts, rights))
    float(run_batch(lefts, rights))

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # Streaming throughput: dispatches are queued asynchronously (the
    # engine keeps ≥2 batches in flight — the TPU-native form of the
    # reference's compute/publish overlap via stream host callbacks,
    # src/GpuSenderIfc.cpp:13-26) and joined once at the end; per-dispatch
    # blocking would serialize the host↔device round trip into the number.
    t0 = time.perf_counter()
    results = [run_batch(lefts, rights) for _ in range(iters)]
    jax.block_until_ready(results)
    dt = time.perf_counter() - t0
    fps = iters * B / dt

    print(
        json.dumps(
            {
                "metric": "dense_disparity_fps_752x480_64d",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "dense_disparity_fps_752x480_64d",
                          "value": 0.0, "unit": "frames/s/chip",
                          "vs_baseline": 0.0, "error": str(e)[:200]}))
        sys.exit(1)
