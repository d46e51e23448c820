"""Metrics collection and the job entrypoint script."""

import json
import subprocess
import sys

import pyarrow as pa
import ray

from tdigest_ray.state import metrics


class TestMetrics:
    def test_counting_wrapper(self):
        actor = metrics.get_metrics_actor("test_metrics_a")
        tbl = pa.table({"x": list(range(100))})
        ds = ray.data.from_arrow(tbl).repartition(4)
        fn = metrics.wrap_counting(lambda b: b, "stage1", actor)
        ds.map_batches(fn, batch_format="pyarrow").materialize()
        # reports are fire-and-forget; poll until they drain
        import time

        for _ in range(100):
            snap = ray.get(actor.snapshot.remote())
            if snap["stages"].get("stage1", {}).get("rows") == 100:
                break
            time.sleep(0.1)
        assert snap["stages"]["stage1"]["rows"] == 100
        assert snap["stages"]["stage1"]["rows_per_sec"] > 0

    def test_multiple_stages(self):
        actor = metrics.get_metrics_actor("test_metrics_b")
        ray.get(actor.add.remote("a", 10, 1000))
        ray.get(actor.add.remote("a", 5, 500))
        ray.get(actor.add.remote("b", 1, 1))
        snap = ray.get(actor.snapshot.remote())
        assert snap["stages"]["a"] == {
            "rows": 15, "bytes": 1500,
            **{k: snap["stages"]["a"][k]
               for k in ("rows_per_sec", "bytes_per_sec")},
        }
        assert snap["stages"]["b"]["rows"] == 1


def test_run_flagship_script(tmp_path):
    """The ray-job entrypoint runs end-to-end with checkpoints + resume."""
    from tdigest_ray.sources import pages

    pages_dir = pages.pages_path(2000, root=str(tmp_path / "pages"), shards=2)
    out1 = tmp_path / "out1"
    ckpt = tmp_path / "ckpt"
    cmd = [
        sys.executable, "scripts/run_flagship.py",
        "--input", pages_dir, "--output", str(out1),
        "--checkpoint-dir", str(ckpt), "--compression", "50",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert report["rows_in"] == 2000
    assert report["docs_per_sec"] > 0

    # resume run: all parts already checkpointed, still succeeds
    out2 = tmp_path / "out2"
    cmd[cmd.index(str(out1))] = str(out2)
    proc2 = subprocess.run(cmd, capture_output=True, text=True,
                           cwd="/root/repo")
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "[ckpt] done" not in proc2.stdout  # nothing re-processed
