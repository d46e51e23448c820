"""Dedup job entrypoint — submit with ``ray job submit``.

Example::

    ray job submit --working-dir . -- \
        python scripts/run_dedup.py \
        --input /data/docs --sig-dir /data/sigs --output /data/dedup \
        --threshold 0.8

Two checkpointed phases over a documents table (doc_id, text, ...):

1. **sign** — MinHash signatures written one atomic Parquet part per
   input file (``sign_corpus``); a crashed or re-run job skips completed
   files by set-difference, and later threshold sweeps reuse the store.
2. **cluster** — banding + distributed verification + distributed
   connected components from the stored signatures
   (``minhash_labels_from_sigs``); the (doc_id, cluster_id) label table
   is written straight from the Dataset (``write_parquet`` — one file
   per block, nothing cluster-sized ever lands on the driver), and the
   report stats come from distributed count/distinct-count.

On a cluster the driver connects via ``RAY_ADDRESS``; standalone it
starts a local session.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet directory or file")
    ap.add_argument("--sig-dir", required=True,
                    help="signature checkpoint directory (resumable)")
    ap.add_argument("--output", required=True,
                    help="output directory for the cluster table")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-bucket", type=int, default=64)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from tdigest_ray.stages import dedup
    from tdigest_ray.state import checkpoint

    t0 = time.perf_counter()
    files = (sorted(glob.glob(os.path.join(args.input, "*.parquet")))
             if os.path.isdir(args.input) else [args.input])

    already = set(checkpoint.completed_files(args.sig_dir))
    parts = dedup.sign_corpus(
        files, args.sig_dir, text_col=args.text_col, id_col=args.id_col,
        num_perm=args.num_perm, bands=args.bands,
        columns=[args.id_col, args.text_col])
    signed = len(files) - len(already & set(files))

    import pyarrow as pa

    from tdigest_ray.stages.graph import distinct_count

    labels, n_pairs, id_col = dedup.minhash_labels_from_sigs(
        parts, id_col=args.id_col, bands=args.bands,
        threshold=args.threshold, max_bucket=args.max_bucket)

    # distributed tail: rename + write the label Dataset directly —
    # the (doc_id, cluster_id) table never gathers on the driver.
    # Crash safety (ADVICE r3): the new label parts are written to a
    # sibling temp directory first and swapped into place only after
    # write_parquet fully succeeds — a failure mid-write (disk full,
    # node loss) leaves the previous run's output untouched.
    # one materialize feeds the write AND both report stats (count +
    # distributed distinct) — no disk re-reads, and the label table
    # stays in the object store (spillable), never on the driver
    out_ds = labels.map_batches(
        lambda t: pa.table({id_col: t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow").materialize()
    checkpoint.atomic_output_swap(out_ds, args.output)
    n_clustered = out_ds.count()
    n_clusters = distinct_count(out_ds, "cluster_id") if n_clustered else 0

    n_docs = sum(rec["input_rows"] for rec in checkpoint.lineage(args.sig_dir)
                 if rec["input_file"] in set(files))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "wall_sec": round(wall, 2),
        "docs": n_docs,
        "files_signed": signed,
        "files_reused": len(already & set(files)),
        "docs_in_clusters": n_clustered,
        "clusters": n_clusters,
        "verified_pairs": n_pairs,
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
