"""Record the scaling artifact (VERDICT round-2 item 6) → SCALING.json.

Sections:
  * cpu_mesh — the virtual 8-device CPU mesh curve for row-band and
    disparity-slab sharding, speckle ON for rows (per-chip speckle work must
    shrink with the mesh).  CPU numbers validate SCALING BEHAVIOUR, not
    absolute hardware throughput.
  * real_chip — on the single real TPU chip: unsharded matcher vs the same
    matcher under a 1-device mesh (shard_map + halo machinery) — an upper
    bound on the sharding overhead a real slice would pay per chip.

Run modes:  python scripts/record_scaling.py cpu       (CPU mesh sections)
            python scripts/record_scaling.py tpu       (real-chip overhead bound)
            python scripts/record_scaling.py multihost (1-vs-2-process ratio)
All modes append into the same SCALING.json.

The ``multihost`` mode is the round-4 measurable stand-in for the BASELINE
"≥80% frames/s/chip at 2 hosts" target on single-chip hardware (VERDICT
round-3 weak item 6): the IDENTICAL sharded workload (8-device global mesh,
row-band matcher + sharded speckle — the multihost worker's step) runs as
ONE process owning all 8 virtual devices and as TWO processes × 4 devices
with gloo cross-process collectives; the throughput ratio isolates exactly
what moving to a second host adds — the process-boundary collective cost.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
OUT = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_leg(num_processes: int, devices_per_process: int, rows: int = 64,
             width: int = 96, ndisp: int = 16, block: int = 5,
             speckle: int = 8, fps_iters: int = 10):
    """Launch the multihost worker as ``num_processes`` real processes over
    a global mesh of num_processes × devices_per_process virtual CPU
    devices; returns the per-process FPS readings of the jointly-computed
    sharded step (all processes run the same SPMD program in lockstep, so
    each FPS *is* the global throughput of that leg)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}"
    )
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "ros_gpu_stereo_processor_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(num_processes),
             "--process-id", str(i),
             "--cpu-devices", str(devices_per_process),
             "--rows", str(rows), "--width", str(width),
             "--ndisp", str(ndisp), "--block", str(block),
             "--speckle-size", str(speckle),
             "--fps-iters", str(fps_iters)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(num_processes)
    ]
    fps = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(out[-2000:])
        fps += [float(l.split()[1]) for l in out.splitlines()
                if l.startswith("FPS ")]
    return fps


def main():
    if MODE == "cpu":
        import jax

        jax.config.update("jax_num_cpu_devices", 8)
        jax.config.update("jax_platforms", "cpu")
    import jax

    from ros_gpu_stereo_processor_tpu.config import StereoBMConfig
    from ros_gpu_stereo_processor_tpu.parallel.scaling import measure_scaling

    cfg = StereoBMConfig(num_disparities=64, block_size=15,
                         texture_threshold=10)
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))

    if MODE == "multihost":
        # identical sharded workload, 8 global devices either way; several
        # repeats, best-of (process scheduling noise on a small host).
        # Recorded at the PRODUCTION workload shape (752x480, 64 candidates,
        # block 15, speckle 800 — the BASELINE geometry; VERDICT r04 weak
        # item 5: the r04 ratio was measured on 96x64 toy frames, which
        # overweights the collectives) and at the toy shape for continuity.
        reps = int(os.environ.get("SCALING_REPS", "3"))
        legs = {
            "prod_752x480_64d": dict(rows=480, width=752, ndisp=64,
                                     block=15, speckle=800, fps_iters=4),
            "toy_96x64_16d": dict(rows=64, width=96, ndisp=16, block=5,
                                  speckle=8, fps_iters=10),
        }
        for name, kw in legs.items():
            one, two = [], []
            for _ in range(reps):
                one += _run_leg(1, 8, **kw)
                two += _run_leg(2, 4, **kw)
            ratio = max(two) / max(one)
            data[f"multihost_ratio_{name}" if name != "prod_752x480_64d"
                 else "multihost_ratio"] = {
                "note": "same SPMD step (row matcher + sharded speckle, "
                        "8-device global mesh): 1 process x 8 devs vs 2 "
                        "processes x 4 devs + gloo; ratio = cross-process "
                        "cost (the measurable stand-in for the 2-host "
                        ">=80% target on 1-chip hardware); best of "
                        f"{reps} repeats per leg",
                "workload": {"rows": kw["rows"], "width": kw["width"],
                             "ndisp": kw["ndisp"], "block": kw["block"],
                             "speckle": kw["speckle"]},
                "fps_1proc_8dev": [round(f, 2) for f in one],
                "fps_2proc_4dev": [round(f, 2) for f in two],
                "ratio_2proc_vs_1proc": round(ratio, 3),
                "meets_80pct": bool(ratio >= 0.8),
            }
            print(json.dumps(
                {name: data.get("multihost_ratio")
                 if name == "prod_752x480_64d"
                 else data[f"multihost_ratio_{name}"]}, indent=1),
                flush=True)
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)
        return

    platform = jax.devices()[0].platform
    if MODE == "cpu":
        data["cpu_mesh"] = {
            "platform": platform,
            "note": "virtual 8-device CPU mesh on a 2-core host: devices are"
                    " OVERSUBSCRIBED, so read wall_overhead_vs_1dev (wall-"
                    "time inflation at fixed total work; ~1.0 = the sharding"
                    " tax of halo exchange + collectives is small while per-"
                    "device work shrinks 1/n), NOT efficiency (which trends"
                    " to 1/n by construction without added hardware)",
            "rows_speckle_on": measure_scaling(
                cfg=cfg, mode="rows", max_speckle_size=800, batch=2,
                iters=2),
            "disp_slabs": measure_scaling(
                cfg=cfg, mode="disp", batch=2, iters=2),
        }
    else:
        data["real_chip"] = {
            "platform": platform,
            "note": "one real chip: 1-device mesh vs unsharded bounds the"
                    " per-chip shard_map/halo overhead of a real slice",
            "rows_speckle_on_pallas": measure_scaling(
                cfg=cfg, mode="rows", max_speckle_size=800,
                device_counts=[1], batch=8, iters=3, use_pallas=True,
                include_unsharded=True),
            "disp_slabs": measure_scaling(
                cfg=cfg, mode="disp", device_counts=[1], batch=8, iters=3,
                include_unsharded=True),
        }

    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data.get("cpu_mesh" if MODE == "cpu" else "real_chip"),
                     indent=1))


if __name__ == "__main__":
    main()
