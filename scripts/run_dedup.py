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
   (``minhash_dedup_from_sigs``); the (doc_id, cluster_id) table and a
   JSON report line are written to ``--output``.

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

    clusters, n_pairs = dedup.minhash_dedup_from_sigs(
        parts, id_col=args.id_col, bands=args.bands,
        threshold=args.threshold, max_bucket=args.max_bucket)

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.output, exist_ok=True)
    nodes = sorted(clusters)
    pq.write_table(
        pa.table({args.id_col: pa.array(nodes, pa.int64()),
                  "cluster_id": pa.array([clusters[n] for n in nodes],
                                         pa.int64())}),
        os.path.join(args.output, "clusters.parquet"))

    n_docs = sum(rec["input_rows"] for rec in checkpoint.lineage(args.sig_dir)
                 if rec["input_file"] in set(files))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "wall_sec": round(wall, 2),
        "docs": n_docs,
        "files_signed": signed,
        "files_reused": len(already & set(files)),
        "docs_in_clusters": len(clusters),
        "clusters": len(set(clusters.values())),
        "verified_pairs": n_pairs,
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
