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

def test_numpy_cc_matches_union_find():
    """The vectorized driver fast path (scatter-min hooking + pointer
    jumping) against the union-find oracle: random graphs, chains,
    self-contained components, duplicate and reversed edges."""
    from tdigest_ray.stages.graph import numpy_cc

    rng = np.random.default_rng(11)
    for trial in range(5):
        nodes = rng.choice(800, size=(300, 2), replace=True)
        edges = [(int(a), int(b)) for a, b in nodes if a != b]
        edges += [(i + 5000, i + 5001) for i in range(40)]  # long chain
        edges += [(x, y) for y, x in edges[:20]]            # reversed dups
        a = np.asarray([e[0] for e in edges], dtype=np.int64)
        b = np.asarray([e[1] for e in edges], dtype=np.int64)
        got_nodes, got_labels = numpy_cc(a, b)
        got = dict(zip(got_nodes.tolist(), got_labels.tolist()))
        assert got == _uf_labels(edges), f"trial {trial}"


def test_numpy_cc_large_random_graph():
    """1M-edge random graph: the fast path must stay vectorized-fast and
    agree with union-find on component partitioning."""
    from tdigest_ray.stages.graph import numpy_cc

    rng = np.random.default_rng(5)
    a = rng.integers(0, 400_000, 1_000_000)
    b = rng.integers(0, 400_000, 1_000_000)
    keep = a != b
    a, b = a[keep].astype(np.int64), b[keep].astype(np.int64)
    nodes, labels = numpy_cc(a, b)
    # spot-check against union-find on a 20k-edge subsample restricted to
    # full-graph correctness via label consistency over every edge
    lab = dict(zip(nodes.tolist(), labels.tolist()))
    assert all(lab[int(x)] == lab[int(y)]
               for x, y in zip(a[:20_000], b[:20_000]))
    # labels are canonical minimum ids: every label is a node <= its node
    assert (labels <= nodes).all()
    assert set(labels.tolist()) <= set(nodes.tolist())
