"""Observability: stage timing, structured per-image stats, profiler traces.

The reference has only wall-clock prints around whole pipeline calls
(src/Step1X-Edit/main.py:63-74; SURVEY.md §5).  Rebuilding the algorithm on
a compiled runtime makes in-loop prints impossible, so observability is
structured around the natural sync points instead:

  * `device_sync(x)` — reliable completion barrier (scalar readback; on
    some remote TPU transports `block_until_ready` returns early).
  * `StageTimer` — named wall-clock segments with device sync.
  * `trace(path)` — jax.profiler context for TensorBoard-viewable traces
    of the jitted sampler segments.
  * `log_stats` — one-line JSON records appended to a stats file
    (edited-token counts, capacities, cache-hit schedule, per-stage
    latencies) for regression tracking across runs.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def enable_compile_cache(path: str = "/tmp/regione_tpu_jax_cache") -> None:
    """Persistent XLA compile cache: the two jitted sampler segments of a
    production backbone take minutes to compile cold; cached they restore in
    seconds across processes.  Called by the CLI and bench entrypoints."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass  # older jax or unsupported backend


def device_sync(x) -> float:
    """Force completion of everything producing x; returns a scalar."""
    return float(jnp.sum(jax.tree.leaves(x)[0]))


class StageTimer:
    """Accumulates named wall-clock segments (with device sync)."""

    def __init__(self):
        self.segments: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                device_sync(sync_on)
            self.segments[name] = self.segments.get(name, 0.0) + (
                time.perf_counter() - t0)

    def as_dict(self) -> dict[str, float]:
        return dict(self.segments)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_stats(path: str | Path, record: dict) -> None:
    """Append one JSON line; creates parent dirs."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    record = {"ts": time.time(), **record}
    with open(p, "a") as fh:
        fh.write(json.dumps(_jsonable(record)) + "\n")


def _jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _jsonable(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "size", 2) == 1:
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
