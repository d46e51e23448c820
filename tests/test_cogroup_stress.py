"""Randomized Ray-level stress for the single-attach / pair-combine
co-group verification scheme (VERDICT r2 item 8) — the dedup analog of
the reference's combine.sql merge pinning (tvondra/tdigest
test/sql/combine.sql:36-97 pins digest merges under randomized inputs;
here the pinned object is the candidate->attach->combine pair plumbing).

Each trial builds a corpus engineered to stress the invariants without
violating them: heavy duplicate-text classes (the same pair surfaces
from MANY band buckets -> the attach pass must distinct copies), a
pathological ``max_bucket`` far below real bucket occupancy (cap
truncation), ``num_partitions`` far above the data (empty partitions in
every groupby), and inputs pre-split into many tiny blocks (ids
duplicated across parts of the band shuffle). The distributed verified
pair set must EXACTLY equal a driver-side recount with the same
published algorithm. A separate test pins that the integrity checks
remain hard failures (no assertion demotion): a candidate referencing a
missing payload id must raise, not attach garbage.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.dedup import (
    _cogroup_verify_pairs,
    band_keys,
    minhash_dedup_pairs,
    minhash_signatures_oph,
)

PHRASES = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "ray data streams arrow blocks through the object store with backpressure",
    "duplicate detection at web scale needs banded minhash signatures",
    "a completely different sentence about cooking pasta at home tonight",
    "numbers and symbols 12 34 56 do not change the shingle structure much",
]


def _make_corpus(seed: int, n: int = 240):
    rng = random.Random(seed)
    texts, ids = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.35:
            # exact duplicate class — every band bucket collides
            texts.append(PHRASES[rng.randrange(len(PHRASES))] * 3)
        elif r < 0.6:
            # near-duplicate: one phrase with a word swapped
            base = (PHRASES[rng.randrange(len(PHRASES))] * 3).split()
            base[rng.randrange(len(base))] = f"tok{rng.randrange(5)}"
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(
                f"w{rng.randrange(5000)}" for _ in range(rng.randint(8, 40))))
        ids.append(i * 7 + 3)  # non-contiguous ids
    rng.shuffle(ids)
    return texts, ids


def _local_verified_pairs(texts, ids, num_perm, bands, k, threshold,
                          max_bucket):
    """Driver-side oracle: same algorithm, one process, no partitions."""
    sig = minhash_signatures_oph(texts, num_perm=num_perm, k=k)
    bm = band_keys(sig, bands=bands)
    ids = np.asarray(ids, dtype=np.int64)
    fk = bm.ravel()
    fi = np.repeat(ids, bands)
    order = np.lexsort((fi, fk))
    fk, fi = fk[order], fi[order]
    keep = np.concatenate([[True], (fk[1:] != fk[:-1]) | (fi[1:] != fi[:-1])])
    fk, fi = fk[keep], fi[keep]
    new_run = np.concatenate([[True], fk[1:] != fk[:-1]])
    run_start = np.flatnonzero(new_run)
    run_end = np.concatenate([run_start[1:], [len(fk)]])
    cand = set()
    for s, e in zip(run_start, run_end):
        run = fi[s:min(e, s + max_bucket)]
        for other in run[1:]:
            cand.add((int(run[0]), int(other)))
    # pos maps id -> text row; sig rows are in text order
    pos = {int(i): j for j, i in enumerate(ids)}
    return {
        (a, b) for a, b in cand
        if (sig[pos[a]] == sig[pos[b]]).mean() >= threshold
    }


@pytest.mark.parametrize("seed,max_bucket,parts", [
    (0, 4, 37),    # brutal cap, many empty partitions
    (1, 64, 5),    # generous cap, few partitions
    (2, 8, 61),
])
def test_cogroup_verify_matches_local_oracle(seed, max_bucket, parts):
    texts, ids = _make_corpus(seed)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(19)  # tiny blocks
    got = minhash_dedup_pairs(
        ds, num_perm=64, bands=16, k=3, threshold=0.5,
        max_bucket=max_bucket, num_partitions=parts)
    got_pairs = {
        (r["a"], r["b"]) for r in got.take_all()
    }
    want = _local_verified_pairs(
        texts, ids, num_perm=64, bands=16, k=3, threshold=0.5,
        max_bucket=max_bucket)
    assert got_pairs == want


def test_missing_payload_id_raises_not_attaches():
    """The attach integrity check must stay a hard failure: candidates
    naming an id absent from the payload table raise instead of silently
    attaching the nearest payload."""
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "sig": pa.array([b"\x01" * 16] * 3, pa.binary()),
    }))
    candidates = ray.data.from_arrow(pa.table({
        "a": pa.array([1], pa.int64()),
        "b": pa.array([999], pa.int64()),  # 999 has no payload row
    }))
    bad = _cogroup_verify_pairs(
        sigs, candidates, "doc_id", 4,
        lambda xs, ys: np.ones(len(xs), dtype=bool))
    with pytest.raises(Exception, match="payload"):
        bad.take_all()


def test_three_doc_corpus_many_partitions():
    """Degenerate corpus << num_partitions: every groupby is nearly all
    empty partitions; the pipeline must still produce the right pairs."""
    texts = ["same text here " * 10, "same text here " * 10,
             "totally different content " * 10]
    tbl = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = minhash_dedup_pairs(ds, threshold=0.8, num_partitions=64)
    assert {(r["a"], r["b"]) for r in got.take_all()} == {(10, 20)}
