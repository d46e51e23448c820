"""Pipeline metrics: throughput counters aggregated from stages.

A single zero-CPU named actor collects per-stage row/byte counters; stages
report once per batch (one tiny ``.remote`` call per batch, never per row).
Use :func:`wrap_counting` to instrument any pyarrow map_batches function.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._stages: dict[str, dict] = {}
        self._t0 = time.perf_counter()

    def add(self, stage: str, rows: int, nbytes: int) -> None:
        s = self._stages.setdefault(stage, {"rows": 0, "bytes": 0})
        s["rows"] += rows
        s["bytes"] += nbytes

    def snapshot(self) -> dict:
        elapsed = time.perf_counter() - self._t0
        out = {"elapsed_sec": elapsed, "stages": {}}
        for name, s in self._stages.items():
            out["stages"][name] = {
                **s,
                "rows_per_sec": s["rows"] / elapsed if elapsed else 0.0,
                "bytes_per_sec": s["bytes"] / elapsed if elapsed else 0.0,
            }
        return out


def get_metrics_actor(name: str = "tdigest_ray_metrics"):
    """Get-or-create the named metrics actor (one per job; dies with it)."""
    return MetricsActor.options(name=name, get_if_exists=True).remote()


def wrap_counting(fn, stage: str, actor):
    """Wrap a pyarrow-batch function so it reports (rows, bytes) per batch."""

    def wrapped(batch):
        out = fn(batch)
        actor.add.remote(stage, out.num_rows, out.nbytes)
        return out

    return wrapped
