"""Benchmark harness: headline sketch pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {name: rows_per_sec, ...}}

``--scaling`` runs the headline digest job at five parallelism levels
(2/4/8/16/32 CPUs) in fresh processes on the same input and reports
throughput at each plus the 4x scaling efficiencies for both
physical-core pairs, 2->8 and 4->16 (the sandbox stand-in for the
north_rule's N -> 4N node criterion; reference anchor: 0.80 from
README.md:144-154).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


# ------------------------------------------------------------------ #
# benchmark pipelines (each returns rows processed)
# ------------------------------------------------------------------ #

def bench_tdigest_10m(ray, n_rows: int = 10_000_000) -> int:
    """The reference's own benchmark shape (README.md:144-148):
    tdigest_percentile(v, 100, 0.95) over n synthetic float64 rows.

    Blocks are sized to ~4 per CPU: enough for load balancing, few enough
    that driver scheduling stays off the critical path."""
    import pyarrow as pa

    from tdigest_ray.aggregates import TDigestPercentile
    from tdigest_ray.sketches.hashing import splitmix64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (splitmix64(ids) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        return pa.table({"v": pa.array(v * 1000.0)})

    # ~4 blocks per CPU (enough for load balancing; per-task dispatch is
    # ~4 ms, so more waves just add overhead), and blocks >=200k rows so
    # task scheduling stays off the critical path at small n
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nblocks = int(min(4 * cpus, max(8, n_rows // 200_000)))
    ds = ray.data.range(n_rows, override_num_blocks=nblocks).map_batches(
        gen, batch_format="pyarrow")
    res = ds.aggregate(TDigestPercentile("v", 0.95, 100, alias_name="p95"))
    assert 940.0 < res["p95"] < 960.0, res
    return n_rows


def _pages_n(sf_dir: str) -> int:
    return 200_000 if "0.1" in sf_dir else 20_000


def bench_flagship_pages(ray, sf_dir: str) -> int:
    from tdigest_ray.pipelines import flagship
    from tdigest_ray.sources import pages as pages_src

    n = _pages_n(sf_dir)
    path = pages_src.pages_path(n)  # pre-generated in the warmup phase
    out = flagship.flagship(path, compression=100, from_html=True).to_pandas()
    assert out["text_len_count"].sum() == n
    return n


def bench_grouped_rollup(ray, sf_dir: str) -> int:
    from tdigest_ray.aggregates import (
        TDigestAgg,
        TDigestCountAgg,
        TDigestMergePercentile,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    n = ds.count()
    fine = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        TDigestAgg("l_extendedprice", 100, alias_name="dg"))
    out = (
        fine.groupby("l_returnflag")
        .aggregate(
            TDigestMergePercentile("dg", 0.95, alias_name="p95"),
            TDigestCountAgg("dg", alias_name="n"),
        )
        .to_pandas()
    )
    assert out["n"].sum() == n
    return n


def bench_sibling_sketches(ray, sf_dir: str) -> int:
    from tdigest_ray.aggregates import (
        BloomAgg,
        CountMinAgg,
        HLLCountAgg,
        KLLQuantileAgg,
    )

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id", "value"])
    n = ev.count()
    ev.groupby("event_type").aggregate(
        HLLCountAgg("user_id", alias_name="nd"),
        KLLQuantileAgg("value", 0.95, alias_name="q95"),
    ).to_pandas()
    ev.aggregate(CountMinAgg("event_type", alias_name="cm"),
                 BloomAgg("user_id", alias_name="bf"))
    return n


def bench_dedup_docs(ray, sf_dir: str) -> int:
    from tdigest_ray.stages.dedup import exact_dedup, minhash_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n = ds.count()
    exact_dedup(ds).count()
    minhash_dedup(ds, threshold=0.8)
    return n


EXTRA_METRICS: dict = {}


def bench_knn_reduce(ray, sf_dir: str) -> int:
    """Large-query-batch ANN reranking shape (VERDICT r2 item 4): exact
    top-16 of 1024 queries against 100k synthetic 32-d vectors in 256
    blocks. Times the DISTRIBUTED combiner-tree reduce (the scale path)
    and records the driver-merge time alongside it in EXTRA_METRICS —
    the tree pre-reduces #blocks x q x k candidate rows to
    P x q x k before anything reaches the driver."""
    import pyarrow as pa

    from tdigest_ray.sketches.hashing import splitmix64
    from tdigest_ray.stages.similarity import knn_brute_force

    dim, nq, k = 32, 1024, 16

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        m = np.empty((len(ids), dim), dtype=np.float32)
        for d in range(dim):
            m[:, d] = (splitmix64(ids * np.uint64(dim) + np.uint64(d))
                       >> np.uint64(40)).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        })

    n = 100_000
    ds = (ray.data.range(n, override_num_blocks=256)
          .map_batches(gen, batch_format="pyarrow").materialize())
    rng = np.random.default_rng(0)
    q = rng.standard_normal((nq, dim))
    t0 = time.perf_counter()
    dist = knn_brute_force(ds, q, k=k, reduce="distributed")
    t_dist = time.perf_counter() - t0
    if "knn_q1024_reduce_driver_sec" not in EXTRA_METRICS:
        # driver-merge comparison leg once per bench process (the timed
        # best-of-N reps measure the distributed scale path alone)
        t0 = time.perf_counter()
        drv = knn_brute_force(ds, q, k=k, reduce="driver")
        t_drv = time.perf_counter() - t0
        assert dist.equals(drv)
        EXTRA_METRICS["knn_q1024_reduce_driver_sec"] = round(t_drv, 3)
    EXTRA_METRICS["knn_q1024_reduce_distributed_sec"] = round(t_dist, 3)
    return n


def bench_skewed_merge(ray, sf_dir: str) -> int:
    """Zipf-hot-key digest MERGE (VERDICT r2 item 6), isolated to the
    stage salting would target — with the measured conclusion that this
    engine does not need the salt: Ray's grouped aggregate COMBINES
    block-locally before the shuffle, so a 90%-hot key merges in the
    same wall time as a uniform key spread (extra metrics
    ``skew_merge_hot_sec`` vs ``skew_merge_uniform_sec``, measured
    within noise of each other at 500k partial rows) — the hot key's
    row walk is parallel across blocks and the reduce only ever sees
    #blocks x #keys pre-combined states. The salted two-level tree
    (``grouped_digests_salted``'s shape) is timed alongside for the
    regime where reduce-state counts themselves explode; its extra
    groupby level costs more than it saves here. Asserts hot-key count
    exactness and salted-vs-unsalted p95 agreement."""
    import pyarrow as pa

    from tdigest_ray.aggregates import TDigestMergeAgg
    from tdigest_ray.functions import serde
    from tdigest_ray.sketches.hashing import fast_hash64_utf8
    from tdigest_ray.sketches.tdigest import TDigest

    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(8):
        d = TDigest(100)
        d.add_many(rng.standard_normal(1000) * 100.0 + 500.0)
        d.compress()
        blobs.append(serde.to_bytes(d))
    n = 500_000
    agg = TDigestMergeAgg("dg", alias_name="dg")

    def make_part(langs):
        tbl = pa.table({
            "lang": pa.array(langs.astype(object), pa.string()),
            "dg": pa.array([blobs[i % 8] for i in range(n)], pa.binary()),
        })
        return ray.data.from_arrow(tbl).repartition(32).materialize()

    part = make_part(np.where(np.arange(n) % 10 < 9, "hot", "cold"))
    t0 = time.perf_counter()
    plain = {r["lang"]: serde.from_bytes(bytes(r["dg"]))
             for r in part.groupby("lang").aggregate(agg).take_all()}
    t_hot = time.perf_counter() - t0
    EXTRA_METRICS["skew_merge_hot_sec"] = round(t_hot, 3)
    if "skew_merge_uniform_sec" not in EXTRA_METRICS:
        # skew-tolerance control: same partial count, no hot key
        uni = make_part(np.char.add("g", (np.arange(n) % 10).astype(str)))
        t0 = time.perf_counter()
        uni.groupby("lang").aggregate(agg).take_all()
        EXTRA_METRICS["skew_merge_uniform_sec"] = round(
            time.perf_counter() - t0, 3)
        # salted two-level tree comparison leg
        nsalt = 32

        def add_salt(batch: pa.Table) -> pa.Table:
            # hash the block DICTIONARY, gather per occurrence — digest
            # blobs repeat heavily (the paradedup/fp_rows idiom); no
            # Python objects touch the buffers either way
            col = batch.column("dg")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            denc = col.dictionary_encode()
            codes = (denc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64))
            h = fast_hash64_utf8(denc.dictionary)[codes]
            return batch.append_column(
                "_salt", pa.array((h % np.uint64(nsalt)).astype(np.int32)))

        t0 = time.perf_counter()
        fine = (part.map_batches(add_salt, batch_format="pyarrow")
                .groupby(["lang", "_salt"]).aggregate(agg))
        salted = {r["lang"]: serde.from_bytes(bytes(r["dg"]))
                  for r in fine.groupby("lang").aggregate(agg).take_all()}
        EXTRA_METRICS["skew_merge_salted_sec"] = round(
            time.perf_counter() - t0, 3)
        assert salted["hot"].count == plain["hot"].count  # count exact
        assert abs(salted["hot"].quantile(0.95)
                   - plain["hot"].quantile(0.95)) <= 5.0
    return n


def bench_minhash_pages(ray, sf_dir: str) -> int:
    """MinHash-LSH over the synthetic pages corpus — measures dedup
    throughput at a corpus size where per-batch vector work dominates."""
    import pyarrow as pa

    from tdigest_ray.sources import pages as pages_src
    from tdigest_ray.stages.dedup import minhash_dedup

    n = _pages_n(sf_dir) // 2
    path = pages_src.pages_path(n)

    def add_id(batch: pa.Table) -> pa.Table:
        # derive a stable doc id from the url suffix
        import pyarrow.compute as pc

        ids = pc.cast(pc.struct_field(pc.extract_regex(
            batch.column("url"), r"/(?P<id>\d+)$"), "id"), "int64")
        return pa.table({"doc_id": ids, "text": batch.column("text")})

    ds = ray.data.read_parquet(path, columns=["url", "text"]).map_batches(
        add_id, batch_format="pyarrow")
    minhash_dedup(ds, threshold=0.8)
    return n


def bench_curation_suite(ray, sf_dir: str) -> int:
    """Late-r4 curation chain over the pages corpus, one streaming
    pass shape: deterministic split -> linear quality classifier ->
    benchmark decontamination -> sequence packing. Reported outside the
    r1/r2-comparable headline total (new in r4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from tdigest_ray.sources import pages as pages_src
    from tdigest_ray.stages import decontam
    from tdigest_ray.stages.classify import classify_quality
    from tdigest_ray.stages.packing import pack_chunks
    from tdigest_ray.stages.splits import add_split

    n = _pages_n(sf_dir)
    path = pages_src.pages_path(n)

    def add_id(batch: pa.Table) -> pa.Table:
        ids = pc.cast(pc.struct_field(pc.extract_regex(
            batch.column("url"), r"/(?P<id>\d+)$"), "id"), "int64")
        return pa.table({"doc_id": ids, "text": batch.column("text"),
                         "lang": batch.column("lang")})

    ds = ray.data.read_parquet(path, columns=["url", "text", "lang"]) \
        .map_batches(add_id, batch_format="pyarrow")

    def bench_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 97 == 0))

    grams = decontam.benchmark_gram_set(
        ds.map_batches(bench_side, batch_format="pyarrow"), k=3)

    tagged = add_split(ds)

    def train_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("split"), "train"))

    kept = classify_quality(tagged.map_batches(train_only,
                                               batch_format="pyarrow"))

    def keep_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep"))

    clean = decontam.decontaminate(
        kept.map_batches(keep_only, batch_format="pyarrow"), grams, k=3)
    pack_chunks(clean, budget=2048).materialize()
    return n


def bench_text_mining_suite(ray, sf_dir: str) -> int:
    """Late-r4 text-mining chain over the pages corpus: paragraph-level
    exact dedup (8-word derived paragraphs) + per-lang TF-IDF top terms
    (non-headline, new in r4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from tdigest_ray.sources import pages as pages_src
    from tdigest_ray.stages.paradedup import (dedup_paragraphs,
                                              insert_breaks_every_k_words)
    from tdigest_ray.stages.tfidf import tfidf_terms

    n = _pages_n(sf_dir)
    path = pages_src.pages_path(n)

    def add_id_and_breaks(batch: pa.Table) -> pa.Table:
        ids = pc.cast(pc.struct_field(pc.extract_regex(
            batch.column("url"), r"/(?P<id>\d+)$"), "id"), "int64")
        return pa.table({
            "doc_id": ids,
            "text": insert_breaks_every_k_words(batch.column("text"), k=8),
            "lang": batch.column("lang"),
        })

    ds = ray.data.read_parquet(path, columns=["url", "text", "lang"]) \
        .map_batches(add_id_and_breaks, batch_format="pyarrow")
    dedup_paragraphs(ds, carry_cols=("lang",)).materialize()
    tfidf_terms(ds, k=20).materialize()
    return n


def bench_events_suite(ray, sf_dir: str) -> int:
    """Late-r4 event-log chain at sf scale: per-user sessionization +
    as-of purchase attribution (non-headline, new in r4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from tdigest_ray.stages.asof import asof_join
    from tdigest_ray.stages.sessions import session_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"])
    n = ev.count()
    session_stats(ev, gap=3600.0).materialize()

    def purchases(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("event_type"),
                                     "purchase")).select(["user_id", "ts"])

    right = ev.map_batches(purchases, batch_format="pyarrow")
    asof_join(ev, right, "user_id", "ts", []).materialize()
    return n


# ------------------------------------------------------------------ #

# co-tenant busy gate for the rep loop: between queries our own Ray
# workers are idle, so the instantaneous runnable count in
# /proc/loadavg's 4th field (minus ourselves, ~1-2 runnable) reads the
# HOST's load, unlike the 1-min average our previous query inflates
LOAD_BUSY_RUNNABLE = int(os.environ.get("BENCH_BUSY_RUNNABLE", 8))


def _load_sample() -> tuple[float, int]:
    """(1-min load average, currently-runnable count) from
    /proc/loadavg; (-1.0, -1) where unreadable (non-Linux)."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        return round(float(parts[0]), 2), int(parts[3].split("/")[0])
    except Exception:
        return -1.0, -1


def run_benchmarks(num_cpus: int, sf_dir: str, only=None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    # warmup: spawn the worker pool + import the library everywhere so the
    # timed queries measure pipeline work, not process cold-start (the
    # reference's psql timings likewise exclude server startup)
    bench_tdigest_10m(ray, n_rows=200_000)
    if only is None or "flagship_pages" in only:
        from tdigest_ray.sources import pages as pages_src

        pages_src.pages_path(_pages_n(sf_dir))  # one-time dataset synthesis
    benches = {
        "tdigest_10m_rows": lambda: bench_tdigest_10m(ray),
        "flagship_pages": lambda: bench_flagship_pages(ray, sf_dir),
        "grouped_rollup": lambda: bench_grouped_rollup(ray, sf_dir),
        "sibling_sketches": lambda: bench_sibling_sketches(ray, sf_dir),
        "dedup_docs": lambda: bench_dedup_docs(ray, sf_dir),
        "minhash_pages": lambda: bench_minhash_pages(ray, sf_dir),
        "knn_reduce_q1024": lambda: bench_knn_reduce(ray, sf_dir),
        "skewed_merge": lambda: bench_skewed_merge(ray, sf_dir),
        "curation_suite": lambda: bench_curation_suite(ray, sf_dir),
        "events_suite": lambda: bench_events_suite(ray, sf_dir),
        "text_mining_suite": lambda: bench_text_mining_suite(ray, sf_dir),
    }
    if only:
        benches = {k: v for k, v in benches.items() if k in only}
    # the r1/r2 headline set: `value` sums ONLY these so the per-round
    # total stays comparable across rounds; r3's added comparison
    # benches (knn reduce, skew merge) report in queries/extra
    comparable = {"tdigest_10m_rows", "flagship_pages", "grouped_rollup",
                  "sibling_sketches", "dedup_docs", "minhash_pages"}
    queries, throughput, load_avg = {}, {}, {}
    for name, fn in benches.items():
        best = float("inf")
        rows = 0
        loads, busy_flags = [], []
        # best-of-3: host co-tenancy bursts can 2x a single run minutes
        # apart (measured r3/r4). Each rep samples /proc/loadavg first:
        # the 1-min average is DISCLOSED per rep in the JSON (so a
        # burst is visible in the artifact itself), and the runnable
        # count — a point-in-time signal our own idle Ray workers don't
        # pollute between queries — gates up to 2 extra reps when every
        # standard rep started on a busy host (VERDICT r4 #3).
        while True:
            la, runnable = _load_sample()
            loads.append(la)
            busy_flags.append(runnable > LOAD_BUSY_RUNNABLE)
            t0 = time.perf_counter()
            rows = fn()
            best = min(best, time.perf_counter() - t0)
            if len(loads) < 3:
                continue
            if not all(busy_flags) or len(loads) >= 5:
                break
            time.sleep(2.0)  # give the burst a chance to pass
        queries[name] = round(best, 3)
        throughput[name] = round(rows / best, 1)
        load_avg[name] = loads
    total = round(sum(v for k, v in queries.items() if k in comparable), 3)
    result = {
        "metric": ("sketch-pipeline wall time (sum of the r1/r2-comparable "
                   "headline queries; r3 comparison benches reported "
                   "separately in queries/extra)"),
        "value": total,
        "unit": "sec",
        "queries": queries,
        "throughput": throughput,
        "load_avg": load_avg,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    if EXTRA_METRICS:
        result["extra"] = dict(EXTRA_METRICS)
    ray.shutdown()
    return result


# 200M rows: large enough that per-row digest math dominates every fixed
# floor (task dispatch, combine tail, session setup) at all five widths —
# the regime a real 100 TB job lives in; overridable for quick A/B probes
SCALING_ROWS = int(os.environ.get("SCALING_ROWS", 200_000_000))


def run_scaling() -> dict:
    """Same job at N vs 4N CPUs in fresh processes (north_rule's two cluster
    sizes, sandboxed). Uses a 100M-row digest so per-row compute dominates
    the constant scheduling floor, like a real cluster-scale job.

    Two physical-core 4x pairs are reported: 2->8 and 4->16 — this box
    exposes 32 vCPUs over ~16 physical cores, so both stay within
    physical cores, the honest analog of adding nodes (a real 4x node
    scale-out quadruples physical cores, it never lands on hyperthread
    siblings). The 8->32 pair is also reported; it is bounded by SMT
    sharing, not by the engine.

    Levels run INTERLEAVED A/B/A/B within this one invocation (VERDICT
    r2 item 3): each 4x pair's two legs are measured back-to-back twice
    (2,8,2,8 then 4,16,4,16 then 8,32), so slow host drift (co-tenant
    load) hits both legs of a pair equally and per-pair efficiencies
    cancel it; both pair efficiencies and their medians are reported.
    """
    # three interleaved pairs per 4x ratio: the median efficiency
    # discards a single turbo/co-tenancy-skewed leg (observed: one leg
    # in ~6 runs lands >20% off its siblings on this shared host)
    order = [2, 8, 2, 8, 2, 8, 4, 16, 4, 16, 4, 16, 8, 32]
    runs: list[tuple[int, dict]] = []
    for cpus in order:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-worker"],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        runs.append((cpus, json.loads(line)))

    queries: dict = {}
    by_level: dict[int, list] = {}
    for cpus, r in runs:
        by_level.setdefault(cpus, []).append(r)
    for cpus, rs in by_level.items():
        best = max(x["rows_per_sec"] for x in rs)
        queries[f"rows_per_sec_{cpus}cpu"] = best
        queries[f"sec_{cpus}cpu"] = min(x["sec"] for x in rs)

    # adjacent interleaved pairs: runs[i], runs[i+1] share host conditions
    pair_effs: dict[str, list] = {}
    for i in range(0, len(order) - 1):
        a_cpus, b_cpus = order[i], order[i + 1]
        if b_cpus == 4 * a_cpus:
            eff = runs[i + 1][1]["rows_per_sec"] / (
                runs[i][1]["rows_per_sec"] * 4)
            pair_effs.setdefault(f"{a_cpus}_to_{b_cpus}", []).append(
                round(eff, 3))
    import statistics

    medians = []
    for name, effs in pair_effs.items():
        for j, e in enumerate(effs, 1):
            queries[f"efficiency_{name}_pair{j}"] = e
        med = round(statistics.median(effs), 3)
        tag = "_smt_bound" if name == "8_to_32" else ""
        queries[f"efficiency_{name}_median{tag}"] = med
        if name != "8_to_32":
            medians.append(med)
    headline = round(min(medians), 3) if medians else None
    return {
        "metric": (
            f"scaling efficiency N->4N cpus, interleaved pairs "
            f"(tdigest_percentile, {SCALING_ROWS} rows)"),
        "value": headline,
        "unit": "efficiency",
        "queries": queries,
        "sf": _sf_dir(),
        "num_cpus": 32,
    }


def run_scaling_worker() -> dict:
    """Time the aggregate over a pre-materialized table — the reference's
    benchmark shape (psql times the SELECT on an existing table,
    README.md:144-148), and free of input-generation noise."""
    import pyarrow as pa
    import ray

    from tdigest_ray.aggregates import TDigestPercentile
    from tdigest_ray.sketches.hashing import splitmix64

    cpus = _num_cpus()
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    bench_tdigest_10m(ray, n_rows=200_000)  # warmup

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (splitmix64(ids) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        return pa.table({"v": pa.array(v * 1000.0)})

    # 4 blocks per CPU: same per-task overhead FRACTION at every width,
    # which is what a fair N-vs-4N comparison needs (measured: 512 blocks
    # at 32 cpus wastes ~30% wall on task dispatch)
    nblocks = int(min(4 * cpus, max(8, SCALING_ROWS // 200_000)))
    ds = (
        ray.data.range(SCALING_ROWS, override_num_blocks=nblocks)
        .map_batches(gen, batch_format="pyarrow")
        .materialize()
    )
    best = float("inf")
    for _ in range(3):  # best-of-3 damps host interference noise
        t0 = time.perf_counter()
        res = ds.aggregate(TDigestPercentile("v", 0.95, 100, alias_name="p95"))
        best = min(best, time.perf_counter() - t0)
        assert 940.0 < res["p95"] < 960.0, res
    ray.shutdown()
    return {"rows_per_sec": round(SCALING_ROWS / best, 1),
            "sec": round(best, 3), "num_cpus": cpus}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-worker", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    if args.scaling:
        result = run_scaling()
    elif args.scaling_worker:
        result = run_scaling_worker()
    else:
        result = run_benchmarks(_num_cpus(), _sf_dir(), only=args.only)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
