"""Headline benchmark: dense 752×480 disparity throughput per chip.

Prints ONE JSON line.  Primary fields {"metric", "value", "unit",
"vs_baseline"} report the streaming *compute* throughput (frames resident on
device, outputs checksummed on device).  Additional recorded fields:

  * "e2e_fps"      — honest end-to-end streaming: fresh frames pushed through
                     the native ingest ring → device_put → pipeline →
                     SenderPool publish (device→host fetch) each iteration;
  * "e2e_fps_per_frame_dispatch" — same boundaries, one jit call per frame
                     (the reference's deployment shape, one imageCb per pair,
                     src/StereoProcessor.cpp:157);
  * "stage_ms"     — per-stage latency breakdown (upload, rectify, disparity,
                     disparity_vis, pointcloud, full step), the reference's
                     7-stage TIMING line (src/StereoProcessor.cpp:288-297);
  * "sgm_ms_64d" / "sgm_ms_128d" — fused SGM per-frame ms at both disparity
                     ranges (cfg/GPU.cfg caps disparity_range at 128).

Measurement rules (round-4):

  * every metric is the MEDIAN of ``BENCH_REPEATS`` (default 3) independent
    timed runs; the spread (min/max) is recorded next to it — a single-shot
    number cannot distinguish regression from noise;
  * timing windows are closed by a REAL device→host fetch (a scalar off the
    last queued result).  ``jax.block_until_ready`` returns without waiting
    on the axon dev tunnel (measured: a 20 s compute chain "blocks" in
    0.1 ms), so any window closed by it times only async dispatch.  Device
    execution is ordered, so one scalar fetch (one ~22 ms round trip,
    amortised over all queued iterations) guarantees every queued run
    completed.

Baseline target (BASELINE.md): > 20 fps dense disparity (64 candidates) on a
single v5e chip, real-time streaming.  vs_baseline = fps / 20.
"""

import json
import os
import sys
import time

import numpy as np

REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _fetch_scalar(x) -> float:
    """Real sync: pull one scalar from a device array (see module docstring —
    block_until_ready is a no-op over the tunnel; fetching is the only
    reliable join)."""
    return float(np.asarray(x).ravel()[0])


def _med_spread(vals):
    s = sorted(vals)
    return s[len(s) // 2], {"min": round(s[0], 3), "max": round(s[-1], 3)}


def _compute_metric(model, left, right, cfg, outputs, pallas, remappers):
    """Streaming compute throughput: batch-of-frames dispatches kept in
    flight, outputs reduced to on-device checksums (host I/O off the clock)."""
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.models.pipeline import _pipeline_step

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

    # warmup / compile — fetch-synced so compile+first-exec are off the clock
    _fetch_scalar(run_batch(lefts, rights))
    _fetch_scalar(run_batch(lefts, rights))

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    fps_runs = []
    for _ in range(REPEATS):
        # Streaming throughput: dispatches are queued asynchronously (the
        # engine keeps batches in flight — the TPU-native form of the
        # reference's compute/publish overlap via stream host callbacks,
        # src/GpuSenderIfc.cpp:13-26) and joined once by a real scalar fetch
        # off the LAST result; per-dispatch blocking would serialize the
        # host↔device round trip into the number.
        t0 = time.perf_counter()
        results = [run_batch(lefts, rights) for _ in range(iters)]
        _fetch_scalar(results[-1])
        dt = time.perf_counter() - t0
        fps_runs.append(iters * B / dt)
    return _med_spread(fps_runs)


def _e2e_metric(model, left, right, cfg, pallas):
    """End-to-end streaming: host ring → device_put → pipeline → async
    publish (fetch to host) — every boundary the reference's TIMING line
    crosses (upload ①, senders ③④, SURVEY.md §3.1).

    Streams in micro-batches of B frames per dispatch (``process_batch`` —
    the engine's streaming fast path).  Fetches run on sender worker
    threads; ≤ 2 batches in flight.  Returns
    (batched_fps+spread, per_frame_fps+spread, d2h, latency, pc_bytes)."""
    import jax

    from ros_gpu_stereo_processor_tpu.config import Outputs
    from ros_gpu_stereo_processor_tpu.models.pipeline import StereoPipeline
    from ros_gpu_stereo_processor_tpu.runtime import StreamingIngest
    from ros_gpu_stereo_processor_tpu.utils.msgs import (
        SenderPool, disparity_fixed8,
    )

    # full stage set computed on device (disparity + reprojection); the
    # PUBLISHED output is the disparity image — the reference's primary topic
    # (its TIMING budget for a disparity subscriber, StereoProcessor.cpp:267).
    # The point cloud stays device-resident for downstream device consumers;
    # host-publishing it too is a link-bandwidth question, not an engine one
    # (link throughput is measured and reported alongside).
    outputs = Outputs.of("disparity", "pointcloud")
    cfg = cfg.replace(max_in_flight=4)
    pipe = StereoPipeline(model, cfg, use_pallas=pallas)
    # both paths publish the reference-wire fixed8 (the reference's own
    # published buffer is 8-bit fixed-point, SURVEY.md §2.12; ours carries
    # the offset from min_disparity at 1/4 px): the fetch is
    # link-bytes-bound on both, so wire width IS the fps/latency.  fixed16
    # (disparity_fixed16) remains the wire for min_disparity<0 configs.
    wire8 = jax.jit(disparity_fixed8)
    shape = left.shape
    B = int(os.environ.get("BENCH_E2E_BATCH", "8"))
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "64"))
    n_frames = (n_frames // B) * B
    pool = SenderPool(max_workers=3)

    def run(n, base_stamp):
        """Feeder thread fills the ring, the ingest uploader stages
        stacked-pair device_puts, the consumer assembles device-side
        micro-batches (jnp.stack of B staged pairs — a device op, no link
        traffic) and dispatches ONE process_batch per B frames; sender
        workers fetch + publish.  Upload, compute and publish all overlap."""
        import threading

        import jax.numpy as jnp

        ing = StreamingIngest(shape, capacity=2 * B, drop_on_full=False)

        def feeder():
            stamp = base_stamp
            for _ in range(n):
                ing.feed("left", left, stamp)
                ing.feed("right", right, stamp)
                stamp += 0.05

        ft = threading.Thread(target=feeder, daemon=True)
        ft.start()
        done = 0
        got_l, got_r = [], []
        inflight = []
        for l_d, r_d, stamp, seq in ing.frames_prefetch(
            timeout=2.0, depth=B + 2, stacked=True
        ):
            got_l.append(l_d)
            got_r.append(r_d)
            if len(got_l) == B:
                out = pipe.process_batch(
                    jnp.stack(got_l), jnp.stack(got_r), outputs
                )
                got_l, got_r = [], []
                # async per-frame "publish": a worker fetches the batch and
                # splits it into frames (message builds host-side)
                fut = pool.enqueue(
                    "disparity", wire8(out["disparity"]),
                    lambda d: [d[i] for i in range(d.shape[0])],
                )
                inflight.append(fut)
                if len(inflight) > 3:
                    inflight.pop(0).result()
                done += B
            if done >= n:
                break
        pool.wait_all()
        ft.join()

    run(2 * B, 0.0)  # warmup/compile (pool fetch = real sync)
    e2e_runs = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        run(n_frames, 1000.0 * (rep + 1))
        e2e_runs.append(n_frames / (time.perf_counter() - t0))
    batched = _med_spread(e2e_runs)

    # per-frame dispatch mode (latency path): every frame is its own jit
    # call — the reference's deployment shape (one imageCb per pair,
    # src/StereoProcessor.cpp:157).  Upload, compute and publish overlap:
    # a feeder thread fills the ingest ring, an uploader thread stages
    # stacked-pair device_puts (frames_prefetch), the consumer dispatches,
    # and sender workers fetch + publish (with enqueue-time
    # copy_to_host_async prefetch) — so steady-state fps ≈ the slowest
    # stage, not their sum.  Per-frame latency (ring push → publish done) is
    # recorded and summarized as p50/p95.
    n_pf = min(int(os.environ.get("BENCH_PF_FRAMES", "24")), n_frames)
    fn = pipe._get_variant(outputs, "mono8")
    args_tail = (pipe._rect_maps, pipe._Q)

    def run_per_frame(n, pace_s=0.0):
        """``pace_s`` > 0 feeds at a fixed rate (latency measurement below
        saturation); 0 feeds as fast as the ring accepts (throughput
        measurement — latencies then include queueing backpressure).
        Publishes the fixed8 wire (¼ the float bytes — VERDICT r04 item 2:
        the latency-critical path gets the narrow wire; fixed16 remains for
        min_disparity<0 configs)."""
        ing = StreamingIngest(shape, capacity=6, drop_on_full=False)
        snd = SenderPool(max_workers=3)
        push_t = {}
        yield_t = {}
        done_t = {}

        def feeder():
            stamp = 0.0
            next_t = time.perf_counter()
            for i in range(n):
                if pace_s:
                    now = time.perf_counter()
                    if now < next_t:
                        time.sleep(next_t - now)
                    next_t += pace_s
                push_t[i] = time.perf_counter()
                ing.feed("left", left, stamp)
                ing.feed("right", right, stamp)
                stamp += 0.05

        ft = __import__("threading").Thread(target=feeder, daemon=True)
        t0 = time.perf_counter()
        ft.start()
        futs = []
        for l_d, r_d, stamp, seq in ing.frames_prefetch(
            timeout=2.0, depth=3, stacked=True
        ):
            yield_t[seq] = time.perf_counter()
            out = fn(l_d, r_d, *args_tail)
            fut = snd.enqueue("disparity", wire8(out["disparity"]),
                              lambda d: d)
            fut.add_done_callback(
                lambda f, s=seq: done_t.__setitem__(s, time.perf_counter())
            )
            futs.append(fut)
            if len(futs) > 4:
                futs.pop(0).result()
            if seq == n - 1:
                break
        snd.wait_all()
        ft.join()
        t_end = max(done_t.values())
        lats = sorted((done_t[s] - push_t[s]) * 1e3 for s in done_t)
        fps = len(done_t) / (t_end - t0)
        # per-frame budget decomposition: ring push → device item yielded
        # (staging upload + queue) vs dispatch → publish-done (compute +
        # wire fetch + build); medians over the run
        up = sorted((yield_t[s] - push_t[s]) * 1e3 for s in yield_t)
        pub = sorted((done_t[s] - yield_t[s]) * 1e3
                     for s in done_t if s in yield_t)
        budget = {"upload_ms_p50": round(up[len(up) // 2], 1),
                  "dispatch_to_publish_ms_p50": round(pub[len(pub) // 2], 1)}
        return fps, lats, budget

    run_per_frame(4)  # warmup (jit variants already compiled above)
    pf_runs = [run_per_frame(n_pf)[0] for _ in range(REPEATS)]
    pf = _med_spread(pf_runs)
    # latency at a paced input rate BELOW capacity (~70%), so percentiles
    # measure the pipeline (upload → compute → publish), not ring queueing
    pace = 1.0 / max(1.0, 0.7 * pf[0])
    _, lats, budget = run_per_frame(n_pf, pace_s=pace)
    lat_p50 = lats[len(lats) // 2]
    lat_p95 = lats[min(len(lats) - 1, int(len(lats) * 0.95))]
    budget["wire"] = "fixed8_u8"
    budget["wire_bytes_frame"] = int(np.prod(shape))

    # host↔device link throughput (context for the e2e number: on a
    # NIC/PCIe-attached production host this is GB/s; the dev tunnel is not).
    # A fresh array each time — repeated np.asarray of the SAME array reads
    # the runtime's host cache (measured free) and would report nonsense.
    d2h_runs = []
    for i in range(REPEATS):
        x = pipe.process(left, right, outputs).outputs["disparity"] + float(i)
        _fetch_scalar(x[:1, :1])
        t0 = time.perf_counter()
        np.asarray(x)
        d2h_runs.append(x.nbytes / (time.perf_counter() - t0) / 1e6)
    d2h, _ = _med_spread(d2h_runs)

    # point-cloud publish budget: the e2e number publishes fixed16 disparity;
    # the cloud's wire cost is reported so the engine-vs-link split is
    # auditable.  Bytes from a real frame's valid mask: organized H×W
    # xyz+rgb (the reference's PointCloud2 layout, src/GpuSenderPc2.cpp:15-42)
    # vs valid-only packed points.
    res = pipe.process(left, right, outputs)
    xyz = np.asarray(res.outputs["pointcloud_xyz"])
    n_valid = int(np.isfinite(xyz[..., 2]).sum())
    pc2_organized = xyz.shape[0] * xyz.shape[1] * 16
    pc2_packed = n_valid * 16
    pc_bytes = {"organized": pc2_organized, "packed_valid": pc2_packed}
    return batched, pf, d2h, (lat_p50, lat_p95), pc_bytes, budget


def _sgm_metric(model, left, right, pallas, ndisp=64):
    """Per-frame ms of the SGM matcher (fused Pallas path on TPU) — the
    quality tier the reference's stubbed bilateral refinement aimed at
    (SURVEY.md §2.8b).  ``ndisp``: 64 and 128 are both recorded (the
    reference's reconfigure schema caps disparity_range at 128,
    cfg/GPU.cfg:18)."""
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
    from ros_gpu_stereo_processor_tpu.ops import sgm as sgm_ops
    from ros_gpu_stereo_processor_tpu.ops.sgm_pallas import (
        compute_disparity_sgm_fused,
    )

    cfg = StereoBMConfig(num_disparities=ndisp, block_size=15,
                         texture_threshold=10)
    B = int(os.environ.get("BENCH_BATCH", "8"))
    lefts = jnp.asarray(np.stack([left + i for i in range(B)]).astype(np.uint8))
    rights = jnp.asarray(np.stack([right + i for i in range(B)]).astype(np.uint8))

    matcher = (
        compute_disparity_sgm_fused if pallas
        else (lambda l, r, c: sgm_ops.compute_disparity_sgm(l, r, c))
    )

    @jax.jit
    def run(ls, rs):
        def step(c, lr):
            d, v = matcher(lr[0], lr[1], cfg)
            return c, jnp.sum(d) + jnp.sum(v)
        _, s = jax.lax.scan(step, 0, jnp.stack([ls, rs], 1))
        return jnp.sum(s)

    # fetch-synced warmups: compile + first executions off the clock
    for i in range(3):
        _fetch_scalar(run(lefts + 7 + i, rights + 7 + i))
    iters = int(os.environ.get("BENCH_SGM_ITERS", "6"))
    ms_runs = []
    for rep in range(REPEATS):
        # queue all iterations, join once with a real scalar fetch
        t0 = time.perf_counter()
        vals = [run(lefts + i, rights + i) for i in range(iters)]
        _fetch_scalar(vals[-1])
        ms_runs.append((time.perf_counter() - t0) / (iters * B) * 1e3)
    return _med_spread(ms_runs)


def _kernel_roofline(model, left, right, cfg, pallas, remappers,
                     sgm64_ms, sgm128_ms):
    """Per-kernel roofline record (round-3 VERDICT missing item 2): isolated
    fused-kernel ms next to modeled HBM-bytes / VPU-ops speed-of-light
    bounds (utils/roofline.py — bounds are modeled lower limits; a kernel
    far below BOTH is structure-bound, not bandwidth/arithmetic-bound)."""
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.config import Outputs
    from ros_gpu_stereo_processor_tpu.models.pipeline import StereoPipeline
    from ros_gpu_stereo_processor_tpu.ops import speckle as speckle_ops
    from ros_gpu_stereo_processor_tpu.ops import stereobm_pallas
    from ros_gpu_stereo_processor_tpu.utils import roofline as rl

    H, W = left.shape
    bmc = cfg.stereobm
    nd = bmc.num_disparities
    B = 4
    iters = int(os.environ.get("BENCH_ROOF_ITERS", "6"))

    def timeit(fn_frame, *frame_args):
        @jax.jit
        def run(*stacks):
            def step(c, xs):
                r = fn_frame(*xs)
                return c, sum(
                    jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                    for l in jax.tree_util.tree_leaves(r)
                )

            _, s = jax.lax.scan(step, 0, tuple(stacks))
            return jnp.sum(s)

        stacks = tuple(
            jnp.asarray(np.stack([np.asarray(a)] * B)) for a in frame_args
        )
        _fetch_scalar(run(*stacks))
        _fetch_scalar(run(*stacks))
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            vs = [run(*stacks) for _ in range(iters)]
            _fetch_scalar(vs[-1])
            runs.append((time.perf_counter() - t0) / (iters * B) * 1e3)
        return _med_spread(runs)[0]

    # inputs for the isolated kernels: rectified mono pair + a disparity map
    pipe = StereoPipeline(model, cfg, use_pallas=pallas)
    res = pipe.process(
        left, right, Outputs.of("rect_mono_left", "rect_mono_right",
                                "disparity")
    ).fetch()
    rect_l, rect_r = res["rect_mono_left"], res["rect_mono_right"]
    disp, dvalid = res["disparity"], res["disparity_valid"]

    out = {"chip": rl.V5E["name"], "model": "modeled lower bounds, see "
           "utils/roofline.py (VPU peak modeled 3.85 Top/s, +-2x)"}
    if pallas and remappers is not None:
        ms = timeit(remappers["left"], left)
        out["remap"] = rl.roofline(rl.remap_model(H, W), ms)
    if pallas:
        ms = timeit(
            lambda l, r: stereobm_pallas.compute_disparity_fused(l, r, bmc),
            rect_l, rect_r,
        )
        out["stereobm"] = rl.roofline(
            rl.stereobm_fused_model(H, W, nd, bmc.block_size), ms
        )
        out["stereobm"].update(
            rl.stereobm_structure_floor(nd, bmc.block_size))
        out["stereobm"]["pct_of_structure_floor"] = round(
            100.0 * out["stereobm"]["structure_floor_ms"] / ms, 1)
        ms = timeit(
            lambda d, v: speckle_ops.filter_speckles(
                d, v, max_speckle_size=cfg.speckle.max_speckle_size,
                max_diff=cfg.speckle.max_diff,
                iters=cfg.speckle.propagation_iters, method="pallas",
            ),
            disp, dvalid,
        )
        out["speckle"] = rl.roofline(
            rl.speckle_model(H, W, cfg.speckle.propagation_iters), ms
        )
        # the kernel is SORT-PRIMITIVE-bound, not VPU/HBM-bound: record the
        # structural accounting next to the misleadingly-low VPU bound
        # (r05 measured per-call costs; see utils/roofline.py)
        out["speckle"].update(rl.speckle_structure_analysis())
    if sgm64_ms is not None:
        out["sgm_64d"] = rl.roofline(rl.sgm_fused_model(H, W, 64), sgm64_ms)
    if sgm128_ms is not None:
        out["sgm_128d"] = rl.roofline(rl.sgm_fused_model(H, W, 128), sgm128_ms)
    return out


def _slam_compute_metric(model, left, right, cfg, pallas, remappers):
    """Device-bound SLAM step time: the dense frontend (rectify + fused
    disparity + speckle) AND the fused VO step (detect/describe →
    triangulate → match → PnP) chained across frames in ONE lax.scan — the
    tracked-frame state (keypoints, 3-D points, validity) is the scan
    carry, exactly the dependency chain StereoSlam.run_stream executes.
    Host I/O and the link are off the clock: this records what an attached
    host runs per frame (the number round-4's README hand-waved as
    '17 ms/frame' without an artifact — VERDICT r04 item 1a)."""
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.config import Outputs
    from ros_gpu_stereo_processor_tpu.models.pipeline import _pipeline_step
    from ros_gpu_stereo_processor_tpu.models.vo import _vo_core, _vo_first

    B = int(os.environ.get("BENCH_BATCH", "8"))
    lefts = jnp.asarray(np.stack([left + i for i in range(B)]).astype(np.uint8))
    rights = jnp.asarray(np.stack([right + i for i in range(B)]).astype(np.uint8))
    maps = jnp.asarray(model.rect_maps_stacked())
    Q = jnp.asarray(model.Q.astype(np.float32))
    outputs = Outputs.of("disparity", "rect_mono_left")
    cam = dict(
        k=512, threshold=20.0, fx=model.fx, cx=model.left.calib.cx,
        cy=model.left.calib.cy, baseline=model.baseline,
        disparity_offset=model.disparity_offset,
    )

    def dense(l, r):
        out = _pipeline_step(
            l, r, maps, Q, encoding="mono8", outputs=outputs,
            bm=cfg.stereobm, speckle=cfg.speckle, use_pallas=pallas,
            remappers=remappers,
        )
        return out["rect_mono_left"], out["disparity"]

    @jax.jit
    def run(ls, rs):
        rect0, disp0 = dense(ls[0], rs[0])
        kp, pts, pv = _vo_first(rect0, disp0, **cam)

        def step(carry, lr):
            kp, pts, pv = carry
            rect, disp = dense(lr[0], lr[1])
            kp2, pts2, pv2, n, R, t, rms = _vo_core(
                kp, pts, pv, rect, disp, **cam)
            return (kp2, pts2, pv2), (n.astype(jnp.float32)
                                      + jnp.sum(R) + jnp.sum(t) + rms)

        _, sums = jax.lax.scan(
            step, (kp, pts, pv), jnp.stack([ls[1:], rs[1:]], axis=1))
        return jnp.sum(sums)

    _fetch_scalar(run(lefts, rights))
    _fetch_scalar(run(lefts, rights))
    iters = int(os.environ.get("BENCH_SLAM_COMPUTE_ITERS", "6"))
    ms_runs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        vals = [run(lefts, rights) for _ in range(iters)]
        _fetch_scalar(vals[-1])
        # B-1 chained VO steps + 1 bootstrap per run: count B frames
        ms_runs.append((time.perf_counter() - t0) / (iters * B) * 1e3)
    return _med_spread(ms_runs)


def _slam_metric(pallas):
    """SLAM throughput on the chip (round-3 VERDICT missing item 3 —
    BASELINE configs 4/5 had no perf number): StereoSlam.step steady-state
    fps over a synthetic 752x480 planar sequence (dense pipeline + fused VO
    dispatch + TrackStore host work + windowed BA every 2nd keyframe), with
    the per-stage wall breakdown from the engine's own timer."""
    import tempfile

    from ros_gpu_stereo_processor_tpu.config import (
        PipelineConfig, SpeckleConfig, StereoBMConfig,
    )
    from ros_gpu_stereo_processor_tpu.models.slam import SlamConfig, StereoSlam
    from ros_gpu_stereo_processor_tpu.utils.calib import StereoCameraModel
    from ros_gpu_stereo_processor_tpu.utils.io import EurocReader
    from ros_gpu_stereo_processor_tpu.utils.synth import make_planar_euroc

    n = int(os.environ.get("BENCH_SLAM_FRAMES", "24"))
    root = tempfile.mkdtemp(prefix="bench_slam_")
    cl, cr = make_planar_euroc(root, n_frames=n, width=752, height=480,
                               fx=441.0, radius=0.25)
    model = StereoCameraModel.from_files(cl, cr)
    pcfg = PipelineConfig(
        stereobm=StereoBMConfig(num_disparities=64, block_size=15,
                                texture_threshold=10),
        speckle=SpeckleConfig(max_speckle_size=800, max_diff=5.0,
                              propagation_iters=16),
    )
    # keyframe_every=2 fills the BA window fast, so every BA shape compiles
    # inside the warmup frames and steady state includes amortized BA
    slam = StereoSlam(
        model,
        SlamConfig(num_features=512, keyframe_every=2, use_pallas=pallas),
        pipeline_config=pcfg,
    )
    frames = [(fr.left, fr.right, fr.stamp) for fr in EurocReader(root)]
    # warmup must cover every BA window fill (keyframe_every=2 -> the
    # window reaches its full 5 keyframes by frame 8, compiling each shape)
    warm = min(10, len(frames) // 2)
    for f in frames[:warm]:
        slam.step(*f)
    slam.timer.stages.clear()
    timed = frames[warm:]
    # pipelined stepping + async mapping (run_stream: frame t's host work
    # overlaps frame t+1's device compute; TrackStore/BA on the mapping
    # worker); three contiguous chunks as repeats
    k = max(1, len(timed) // 3)
    fps_runs = []
    for c in range(3):
        chunk = timed[c * k : (c + 1) * k]
        if not chunk:
            continue
        t0 = time.perf_counter()
        for _ in slam.run_stream(iter(chunk), async_mapping=True):
            pass
        fps_runs.append(len(chunk) / (time.perf_counter() - t0))
    fps, spread = _med_spread(fps_runs)
    stages = {
        name: round(st.total_ms / max(1, st.count), 2)
        for name, st in slam.timer.stages.items()
    }
    return fps, spread, stages


def _stage_breakdown(model, left, right, cfg, pallas, remappers):
    """Per-stage ms — the reference's TIMING debug line
    (upload/color/rectify/disparity/img/pc2/total,
    src/StereoProcessor.cpp:288-297).  Each stage is a checksum-wrapped jit
    (scalar output → 4-byte sync fetch, not a full-frame transfer), timed as
    a queued run joined by one real fetch; medians over REPEATS runs."""
    import jax
    import jax.numpy as jnp

    from ros_gpu_stereo_processor_tpu.config import Outputs
    from ros_gpu_stereo_processor_tpu.models.pipeline import StereoPipeline

    iters = int(os.environ.get("BENCH_STAGE_ITERS", "10"))
    pipe = StereoPipeline(model, cfg, use_pallas=pallas)
    stages = {
        "rectify": Outputs.of("rect_mono_left", "rect_mono_right"),
        "disparity": Outputs.of("disparity"),
        "disparity_vis": Outputs.of("disparity_vis"),
        "pointcloud": Outputs.of("pointcloud"),
        "total": Outputs.of("disparity", "disparity_vis", "pointcloud"),
    }
    out = {}
    spread = {}

    # upload: host→HBM ingest (the uploadMat role).  Queued async puts joined
    # by fetching a 1-element device slice of the last one (device-side
    # slice op + 4-byte fetch; the transfers themselves are pipelined, which
    # is how the streaming engine issues them).
    dev = jax.devices()[0]
    jax.device_put(left, dev)
    _fetch_scalar(jax.device_put(right, dev)[:1, :1])
    up_runs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        puts = [
            (jax.device_put(left, dev), jax.device_put(right, dev))
            for _ in range(iters)
        ]
        _fetch_scalar(puts[-1][1][:1, :1])
        up_runs.append((time.perf_counter() - t0) / iters * 1e3)
    out["upload"], spread["upload"] = _med_spread(up_runs)

    l_d, r_d = jax.device_put(left, dev), jax.device_put(right, dev)
    for name, o in stages.items():
        fn = pipe._get_variant(o, "mono8")

        @jax.jit
        def summed(l, r, maps, Q, _fn=fn):
            outs = _fn(l, r, maps, Q)
            return sum(
                jnp.sum(jnp.nan_to_num(v.astype(jnp.float32)))
                for v in outs.values()
            )

        args = (l_d, r_d, pipe._rect_maps, pipe._Q)
        _fetch_scalar(summed(*args))  # compile + first exec, fetch-synced
        _fetch_scalar(summed(*args))
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rs = [summed(*args) for _ in range(iters)]
            _fetch_scalar(rs[-1])
            runs.append((time.perf_counter() - t0) / iters * 1e3)
        out[name], spread[name] = _med_spread(runs)
    return (
        {k: round(v, 3) for k, v in out.items()},
        spread,
    )


def main() -> None:
    import jax

    from ros_gpu_stereo_processor_tpu.config import (
        Outputs, PipelineConfig, SpeckleConfig, StereoBMConfig,
    )
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
    outputs = Outputs.of("disparity", "pointcloud")

    remappers = None
    if pallas:
        from ros_gpu_stereo_processor_tpu.ops.remap_pallas import PallasRemapper

        shape = (model.left.calib.height, model.left.calib.width)
        rl = PallasRemapper(model.left.rect_map, shape)
        rr = PallasRemapper(model.right.rect_map, shape)
        if rl.usable and rr.usable:
            remappers = {"left": rl, "right": rr}

    fps, fps_spread = _compute_metric(
        model, left, right, cfg, outputs, pallas, remappers
    )

    record = {
        "metric": "dense_disparity_fps_752x480_64d",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 20.0, 3),
        "repeats": REPEATS,
        "value_spread": fps_spread,
    }
    if os.environ.get("BENCH_E2E", "1") == "1":
        try:
            batched, pf, d2h, lat, pc_bytes, budget = _e2e_metric(
                model, left, right, cfg, pallas
            )
            record["e2e_fps"] = round(batched[0], 3)
            record["e2e_spread"] = batched[1]
            record["e2e_wire"] = {"batched": "fixed8_u8",
                                  "per_frame": "fixed8_u8"}
            record["e2e_vs_baseline"] = round(batched[0] / 20.0, 3)
            record["e2e_fps_per_frame_dispatch"] = round(pf[0], 3)
            record["e2e_pf_spread"] = pf[1]
            record["latency_ms_p50"] = round(lat[0], 1)
            record["latency_ms_p95"] = round(lat[1], 1)
            record["latency_budget"] = budget
            record["link_d2h_MBps"] = round(d2h, 1)
            record["pc2_bytes_frame"] = pc_bytes
        except Exception as e:
            record["e2e_error"] = str(e)[:160]
    if os.environ.get("BENCH_STAGES", "1") == "1":
        try:
            stage_ms, stage_spread = _stage_breakdown(
                model, left, right, cfg, pallas, remappers
            )
            record["stage_ms"] = stage_ms
            record["stage_ms_spread"] = stage_spread
        except Exception as e:
            record["stage_error"] = str(e)[:160]
    m64 = m128 = None
    if os.environ.get("BENCH_SGM", "1") == "1":
        try:
            m64, s64 = _sgm_metric(model, left, right, pallas, ndisp=64)
            record["sgm_ms_64d"] = round(m64, 2)
            record["sgm_ms_64d_spread"] = s64
            m128, s128 = _sgm_metric(model, left, right, pallas, ndisp=128)
            record["sgm_ms_128d"] = round(m128, 2)
            record["sgm_ms_128d_spread"] = s128
        except Exception as e:
            record["sgm_error"] = str(e)[:160]
    if os.environ.get("BENCH_ROOFLINE", "1") == "1":
        try:
            record["roofline"] = _kernel_roofline(
                model, left, right, cfg, pallas, remappers, m64, m128
            )
        except Exception as e:
            record["roofline_error"] = str(e)[:160]
    if os.environ.get("BENCH_SLAM", "1") == "1":
        try:
            cms, cspread = _slam_compute_metric(
                model, left, right, cfg, pallas, remappers)
            record["slam_compute_ms_frame"] = round(cms, 2)
            record["slam_compute_ms_spread"] = cspread
            record["slam_compute_fps"] = round(1e3 / cms, 2)
            record["slam_compute_realtime_20fps"] = bool(1e3 / cms >= 20.0)
        except Exception as e:
            record["slam_compute_error"] = str(e)[:160]
        try:
            sfps, sspread, sstages = _slam_metric(pallas)
            record["slam_fps"] = round(sfps, 2)
            record["slam_fps_spread"] = sspread
            record["slam_stage_ms"] = sstages
            record["slam_realtime_20fps"] = bool(sfps >= 20.0)
            # streaming link budget: what the tunnel carries per frame
            # (uploads stream ahead under run_stream depth pipelining; VO
            # results are prefetched at dispatch — see models/vo._prefetch)
            H, W = left.shape
            record["slam_link_budget"] = {
                "upload_KB_frame": round(2 * H * W / 1024, 1),
                "fetch_KB_frame": 30.0,   # VO scalars + keyframe host copies
                "stage_ms_note": "slam_stage_ms: dense=dispatch, vo=fetch+"
                                 "pose host work, map_match=track-table "
                                 "match round trip (per keyframe), "
                                 "map_host-map_match=numpy bookkeeping",
            }
        except Exception as e:
            record["slam_error"] = str(e)[:160]

    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "dense_disparity_fps_752x480_64d",
                          "value": 0.0, "unit": "frames/s/chip",
                          "vs_baseline": 0.0, "error": str(e)[:200]}))
        sys.exit(1)
