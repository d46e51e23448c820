"""Checkpointed, resumable digest runs with per-partition lineage.

The reference leans on database durability; a 10^12-row Ray job needs its
own: digests are mergeable (tdigest_union), so a run over N input files can
checkpoint one Parquet part per input file — columns = group key, digest
blob, plus lineage (input file, row count, wall ms, engine version) — and a
resumed run processes only the files missing from the manifest
(set-difference), then merges all parts. Partitioned output also means a
partially-failed run never loses completed work.

Layout::

    ckpt_dir/
      part-<sha1(input_file)[:16]>.parquet   # one per completed input file
"""

from __future__ import annotations

import hashlib
import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

ENGINE_VERSION = "tdigest-ray-0.1"

# Dataset CONSTRUCTION is serialized across the checkpoint thread pool:
# read_parquet's datasource init lazily imports optional filesystem
# backends (fsspec http/s3), and concurrent first-imports of a backend
# whose dependency is absent race into a partially-initialized module —
# surfacing as "cannot import name ..." instead of the caught
# ModuleNotFoundError. Execution (the expensive part) stays parallel.
_DATASET_CTOR_LOCK = threading.Lock()


def _part_name(input_file: str) -> str:
    return "part-" + hashlib.sha1(input_file.encode()).hexdigest()[:16] + ".parquet"


def completed_files(ckpt_dir: str) -> dict[str, str]:
    """input_file -> part path for every completed part."""
    out = {}
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        if not (name.startswith("part-") and name.endswith(".parquet")):
            continue
        path = os.path.join(ckpt_dir, name)
        try:
            meta = pq.read_schema(path).metadata or {}
            src = meta.get(b"input_file", b"").decode()
        except Exception:
            continue
        if src:
            out[src] = path
    return out


def pending_files(ckpt_dir: str, input_files: list[str]) -> list[str]:
    done = completed_files(ckpt_dir)
    return [f for f in input_files if f not in done]


def run_partition(input_file: str, ckpt_dir: str, digest_fn,
                  split_blocks: int = 8) -> str:
    """Process one input file -> grouped digest table -> checkpoint part.

    ``digest_fn(ray.data.Dataset) -> Dataset`` computes the per-file grouped
    digests (a small table: one row per group). Lineage is embedded in the
    part's Parquet schema metadata. Writes are atomic (tmp + rename), so a
    crashed run never leaves a half-written part that resume would trust.

    One Parquet file reads as ONE Ray block, which would pin the whole
    per-file transform chain (html extraction is the expensive part) to a
    single core — ``split_blocks`` splits the read at planning time
    (``override_num_blocks``; no repartition barrier) so each file's
    pipeline spreads across cores.

    ``digest_fn`` may return a ``pyarrow.Table`` directly instead of a
    Dataset — the driver-side finish for per-file tables that are tiny by
    construction (#blocks x #groups digest rows), skipping the
    coalesce + groupby barriers whose fixed cost dominates a per-file
    pipeline (see ``flagship.grouped_digests_table``).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    t0 = time.perf_counter()
    with _DATASET_CTOR_LOCK:
        ds = ray.data.read_parquet(
            input_file,
            override_num_blocks=split_blocks if split_blocks > 1 else None)
    result = digest_fn(ds)
    refs = None
    if not isinstance(result, pa.Table):
        # to_arrow_refs() runs the pipeline to completion; the file's
        # result table is object-store resident (zero-copy) from here
        refs = list(result.to_arrow_refs())
    nrows_in = ds.count()
    wall_ms = int((time.perf_counter() - t0) * 1000)
    meta = {
        b"input_file": input_file.encode(),
        b"input_rows": str(nrows_in).encode(),
        b"wall_ms": str(wall_ms).encode(),
        b"engine": ENGINE_VERSION.encode(),
    }
    out = os.path.join(ckpt_dir, _part_name(input_file))
    tmp = out + ".tmp"
    if refs is None:
        pq.write_table(result.replace_schema_metadata(meta), tmp)
    else:
        _write_refs_streaming(refs, meta, tmp)
    os.replace(tmp, out)
    return out


def _write_refs_streaming(refs: list, meta: dict, tmp: str) -> None:
    """Write block refs to one Parquet part one block at a time, dropping
    each ref as it is written. Row-sized per-file results (the signature
    store) never need the whole table pinned through the write — peak
    residency is the execution's own output (released progressively
    here), not execution + a full-table concat copy. Lineage goes into
    the writer's schema metadata so ``completed_files`` still reads it
    from the footer."""
    writer = None
    schema = None
    empty = None
    try:
        while refs:
            t = ray.get(refs.pop(0))
            if t.num_rows == 0:
                if empty is None:
                    empty = t  # keep one for the schema-only case
                continue
            if writer is None:
                schema = t.schema
                writer = pq.ParquetWriter(tmp, schema.with_metadata(meta))
            elif not t.schema.equals(schema):
                t = t.cast(schema)
            writer.write_table(t)
        if writer is None:
            # every block empty: the part still records schema + lineage
            tbl = (empty if empty is not None
                   else pa.table({})).replace_schema_metadata(meta)
            pq.write_table(tbl, tmp)
    except BaseException:
        if writer is not None:
            writer.close()
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    if writer is not None:
        writer.close()


def run_with_checkpoints(input_files: list[str], ckpt_dir: str, digest_fn,
                         on_progress=None,
                         max_concurrent: int = 8,
                         split_blocks: int = 8) -> list[str]:
    """Process all pending input files (skipping completed ones), returning
    the full list of part paths. Re-running after a crash resumes from the
    last completed partition.

    Pending files run through a bounded thread pool: each thread drives
    its own per-file Dataset pipeline and Ray schedules the union of
    their tasks, so one small partition no longer underutilizes a wide
    node while its siblings queue behind it (the r4 sequential loop left
    a 32-core box ~90% idle between per-file shuffles). Checkpoint
    semantics are unchanged — one atomic part per file, completion-order
    progress callbacks, and the first failure cancels every not-yet-
    started file (in-flight ones finish and checkpoint) before
    propagating, so a systematic error surfaces after ~max_concurrent
    files, not after the whole corpus."""
    import concurrent.futures as cf

    pending = pending_files(ckpt_dir, input_files)
    if pending:
        workers = max(1, min(max_concurrent, len(pending)))
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            futs = {pool.submit(run_partition, f, ckpt_dir, digest_fn,
                                split_blocks): f
                    for f in pending}
            try:
                for fut in cf.as_completed(futs):
                    fut.result()
                    if on_progress:
                        on_progress(futs[fut])
            except BaseException:
                pool.shutdown(wait=True, cancel_futures=True)
                raise
    done = completed_files(ckpt_dir)
    return [done[f] for f in input_files if f in done]


def lineage(ckpt_dir: str) -> list[dict]:
    """Per-partition lineage records from the manifest."""
    out = []
    for src, path in sorted(completed_files(ckpt_dir).items()):
        meta = pq.read_schema(path).metadata or {}
        out.append(
            {
                "input_file": src,
                "part": path,
                "input_rows": int(meta.get(b"input_rows", b"0")),
                "wall_ms": int(meta.get(b"wall_ms", b"0")),
                "engine": meta.get(b"engine", b"").decode(),
            }
        )
    return out


def atomic_output_swap(ds, output_dir: str,
                       partition_cols: list | None = None) -> int:
    """``ds.write_parquet`` into ``output_dir`` with crash-safe replace
    semantics (ADVICE r3): new parts stream into a sibling
    ``.inprogress`` directory first; only after the write fully succeeds
    is the whole DIRECTORY swapped with two renames (old -> ``.old``,
    new -> live) and the old generation removed. A failure mid-write
    leaves the previous output untouched; a crash between the renames
    leaves either the old or the new generation fully intact (never a
    mixed or partial one — the failure mode of delete-then-move), with
    ``.old`` preserved for recovery. Re-runs never accumulate duplicate
    parts. Returns the number of parts swapped in."""
    import glob as _glob
    import shutil

    base = output_dir.rstrip("/")
    tmp_dir = base + ".inprogress"
    old_dir = base + ".old"
    if not os.path.exists(output_dir) and os.path.exists(old_dir):
        # a previous run crashed between the two renames: ``.old`` holds
        # the only good generation — restore it BEFORE deleting anything,
        # so a failure in this run's write still leaves a live output
        os.rename(old_dir, output_dir)
    for d in (tmp_dir, old_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(tmp_dir)
    if partition_cols:
        # hive-style key=value subdirectories: the resumable layout the
        # 100 TB design asks for (a rerun or a reader can address one
        # key range without listing the world)
        ds.write_parquet(tmp_dir, partition_cols=partition_cols)
        n_parts = len(_glob.glob(
            os.path.join(tmp_dir, *(["*"] * len(partition_cols)),
                         "*.parquet")))
    else:
        ds.write_parquet(tmp_dir)
        n_parts = len(_glob.glob(os.path.join(tmp_dir, "*.parquet")))
    if os.path.exists(output_dir):
        os.rename(output_dir, old_dir)
    os.rename(tmp_dir, output_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    return n_parts


def merged_result(part_paths: list[str], group_col: str, digest_col: str):
    """Read all checkpoint parts and merge their digests per group —
    ``tdigest(tdigest) GROUP BY key`` over the checkpoint table."""
    from tdigest_ray.aggregates import TDigestMergeAgg

    ds = ray.data.read_parquet(part_paths)
    return ds.groupby(group_col).aggregate(
        TDigestMergeAgg(digest_col, alias_name=digest_col)
    )
