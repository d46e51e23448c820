"""Distributed connected components vs the in-memory union-find oracle."""

import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.stages.dedup import UnionFind
from tdigest_ray.stages.graph import connected_components


def _uf_labels(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(int(a), int(b))
    return {x: uf.find(x) for x in list(uf.parent)}


def _cc_labels(edges, **kw):
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([a for a, _ in edges], pa.int64()),
        "b": pa.array([b for _, b in edges], pa.int64()),
    }))
    labels = connected_components(ds, **kw)
    return {r["node"]: r["label"] for r in labels.take_all()}


def test_cc_matches_union_find_star():
    edges = [(0, 5), (0, 9), (0, 3), (20, 21)]
    assert _cc_labels(edges) == _uf_labels(edges)


def test_cc_matches_union_find_chain():
    # a long chain needs multiple propagation rounds (O(diameter))
    edges = [(i + 1, i) for i in range(12)]
    labels = _cc_labels(edges)
    assert labels == _uf_labels(edges)
    assert set(labels.values()) == {0}


def test_cc_matches_union_find_random():
    rng = np.random.default_rng(7)
    nodes = rng.choice(500, size=(80, 2), replace=True)
    edges = [(int(a), int(b)) for a, b in nodes if a != b]
    assert _cc_labels(edges, num_partitions=4) == _uf_labels(edges)


def test_cc_empty_edges():
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    assert connected_components(ds).count() == 0


def test_cc_bridged_buckets():
    # two stars bridged by a shared member — the minhash shape where a doc
    # sits in two band buckets with different hubs
    edges = [(0, 2), (0, 3), (1, 3), (1, 4)]
    labels = _cc_labels(edges)
    assert labels == _uf_labels(edges)
    assert set(labels.values()) == {0}


def test_cc_distributed_loop_matches_union_find():
    """Force the distributed min-label-propagation path
    (driver_threshold=0) — the >=4M-edge plan — and pin it to the
    union-find oracle on a random graph with chains and bridges."""
    rng = np.random.default_rng(23)
    nodes = rng.choice(200, size=(60, 2), replace=True)
    edges = [(int(a), int(b)) for a, b in nodes if a != b]
    edges += [(i + 1000, i + 1001) for i in range(6)]  # a chain component
    got = _cc_labels(edges, driver_threshold=0, num_partitions=4)
    assert got == _uf_labels(edges)


def test_distinct_count():
    from tdigest_ray.stages.graph import distinct_count

    vals = np.concatenate([np.arange(500), np.arange(250)])
    ds = ray.data.from_arrow(pa.table({"label": pa.array(vals, pa.int64())}))
    assert distinct_count(ds.repartition(4), "label") == 500
