"""Per-stage timing, counters and profiling hooks — the observability layer.

Covers the reference's instrumentation surface (SURVEY.md §5.1/§5.5):

  * :class:`StageTimer` — the per-frame ``TIMING [ms]`` line
    (reference: boost timers in imageCb, src/StereoProcessor.cpp:159-297),
    with exponential moving averages and a formatted summary;
  * :class:`Counters` — pushed/dropped/processed counters (the ROS queue
    stats the reference only exposes via logs);
  * :func:`trace` — a jax.profiler trace context for xprof dumps (the
    nvprof-launch-prefix slot, launch/test_nodelet.launch:27-29);
  * :func:`print_stats` — min/max/mean array summary, the debug helper the
    reference calls printStats (src/GPUStereoProcessor.cpp:421-435).

A caveat specific to measuring JAX: dispatch is asynchronous, so a stage's
wall time is only meaningful after blocking on its outputs.  ``StageTimer``
therefore offers ``stage(name, result)`` which blocks on the result before
stamping — use it deliberately (blocking per stage serialises the pipeline;
production code times whole frames instead).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Any, Dict, Iterator

import numpy as np


@dataclasses.dataclass
class StageStats:
    last_ms: float = 0.0
    ema_ms: float = 0.0
    total_ms: float = 0.0
    count: int = 0

    def update(self, ms: float, alpha: float = 0.1) -> None:
        self.last_ms = ms
        self.ema_ms = ms if self.count == 0 else (1 - alpha) * self.ema_ms + alpha * ms
        self.total_ms += ms
        self.count += 1


class StageTimer:
    """Named-stage wall timing with a TIMING summary line."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                for leaf in jax.tree_util.tree_leaves(block_on):
                    if hasattr(leaf, "block_until_ready"):
                        leaf.block_until_ready()
            self.stages[name].update((time.perf_counter() - t0) * 1e3)

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str) -> None:
        t0 = self._open.pop(name)
        self.stages[name].update((time.perf_counter() - t0) * 1e3)

    def timing_line(self) -> str:
        """The reference's debug line:
        'TIMING [ms]: upload(..) color(..) … total(..)'."""
        parts = [
            f"{name}({s.ema_ms:.1f})" for name, s in self.stages.items()
        ]
        return "TIMING [ms]: " + " ".join(parts)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"last_ms": v.last_ms, "ema_ms": v.ema_ms,
                "mean_ms": v.total_ms / max(v.count, 1), "count": v.count}
            for k, v in self.stages.items()
        }

    def reset(self) -> None:
        self.stages.clear()


class Counters:
    """Monotonic event counters (frames in/out, drops, keyframes …)."""

    def __init__(self):
        self._c: Dict[str, int] = defaultdict(int)

    def inc(self, name: str, by: int = 1) -> None:
        self._c[name] += by

    def __getitem__(self, name: str) -> int:
        return self._c[name]

    def as_dict(self) -> Dict[str, int]:
        return dict(self._c)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context — view with xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_stats(name: str, arr) -> str:
    """min/max/mean per channel — the reference's printStats debug helper."""
    a = np.asarray(arr)
    if a.ndim == 3:
        lines = []
        for c in range(a.shape[-1]):
            ch = a[..., c].astype(np.float64)
            lines.append(
                f"{name}[{c}]: min={ch.min():.3f} max={ch.max():.3f} "
                f"mean={ch.mean():.3f}"
            )
        out = "\n".join(lines)
    else:
        af = a.astype(np.float64)
        out = f"{name}: min={af.min():.3f} max={af.max():.3f} mean={af.mean():.3f}"
    print(out)
    return out
