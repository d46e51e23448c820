"""Sequence packing (stages/packing.py) vs a straightforward Python
reference of concat-and-split chunking."""
import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.stages import packing

DOCS = [
    # (doc_id, lang, text)  — token counts chosen to straddle budgets
    (0, "en", "a b c d e"),                      # 5 tokens
    (3, "en", " ".join(["t"] * 12)),             # 12 tokens (> budget 8)
    (7, "en", "x y z"),                          # 3
    (9, "fr", " ".join(["q"] * 7)),              # 7
    (12, "fr", ""),                              # dropped (0 tokens)
    (15, "fr", None),                            # dropped
    (20, "fr", "un deux trois quatre"),          # 4
    (33, "en", " ".join(["m"] * 20)),            # 20 (spans 3+ chunks)
    (40, "zz", "solo"),                          # 1
]


def _table():
    return pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "lang": pa.array([d[1] for d in DOCS]),
        "text": pa.array([d[2] for d in DOCS], pa.string()),
    })


def _ref(budget):
    out = []
    for lang in sorted({d[1] for d in DOCS}):
        cum = 0
        for did, lg, text in sorted(DOCS):
            if lg != lang:
                continue
            tok = len((text or "").split())
            if tok == 0:
                continue
            cb, ce = cum, cum + tok
            for chunk in range(cb // budget, (ce - 1) // budget + 1):
                tic = min(ce, (chunk + 1) * budget) - max(cb, chunk * budget)
                out.append((lang, did, chunk, tic))
            cum = ce
    return sorted(out)


def _got(ds, budget, **kw):
    df = packing.pack_chunks(ds, budget=budget, **kw).to_pandas()
    return sorted(map(tuple, df[["lang", "doc_id", "chunk_id",
                                 "tokens_in_chunk"]].itertuples(index=False)))


class TestPackChunks:
    def test_matches_reference(self):
        ds = ray.data.from_arrow(_table())
        for budget in (8, 3, 1, 1000):
            assert _got(ds, budget) == _ref(budget), budget

    def test_segment_span_invariance(self):
        """Chunk ids must not depend on how ids are segmented."""
        ds = ray.data.from_arrow(_table())
        for span in (1, 4, 16, 1 << 22):
            assert _got(ds, 8, segment_span=span) == _ref(8), span

    def test_block_layout_invariance(self):
        t = _table()
        sparse = [t.slice(0, 0), t.slice(0, 2), t.slice(2, 3),
                  t.slice(0, 0), t.slice(5, 4)]
        a = _got(ray.data.from_arrow(sparse), 8, segment_span=4)
        b = _got(ray.data.from_arrow([t]), 8, segment_span=4)
        assert a == b == _ref(8)

    def test_spill_dir_path(self, tmp_path):
        ds = ray.data.from_arrow(_table())
        got = _got(ds, 8, segment_span=4, spill_dir=str(tmp_path / "narrow"))
        assert got == _ref(8)

    def test_interior_chunks_full(self):
        """Every chunk id except each group's last must carry exactly
        ``budget`` tokens in total (concat-and-split invariant)."""
        ds = ray.data.from_arrow(_table())
        budget = 8
        rows = _got(ds, budget)
        per_chunk = {}
        for lang, _, chunk, tic in rows:
            per_chunk[(lang, chunk)] = per_chunk.get((lang, chunk), 0) + tic
        for lang in {r[0] for r in rows}:
            chunks = sorted(c for (lg, c) in per_chunk if lg == lang)
            assert chunks == list(range(len(chunks)))  # sequential ids
            for c in chunks[:-1]:
                assert per_chunk[(lang, c)] == budget

    def test_zero_token_docs_absent(self):
        ds = ray.data.from_arrow(_table())
        ids = {r[1] for r in _got(ds, 8)}
        assert 12 not in ids and 15 not in ids

    def test_budget_validation(self):
        import pytest
        with pytest.raises(ValueError):
            packing.pack_chunks(ray.data.from_arrow(_table()), budget=0)


def test_spill_dir_rerun_no_stale_parts(tmp_path):
    """Re-running with the same spill_dir must not double counts via
    stale parquet parts (reported by review)."""
    ds = ray.data.from_arrow(_table())
    d = str(tmp_path / "narrow")
    first = _got(ds, 8, spill_dir=d)
    second = _got(ray.data.from_arrow(_table()), 8, spill_dir=d)
    assert first == second == _ref(8)


def test_null_group_distinct_from_empty_string():
    """lang=NULL and lang='' must pack as SEPARATE token streams (hash
    identity would merge them; reported by review)."""
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array([None, "", None, ""], pa.string()),
        "text": pa.array(["a b c", "d e", "f g h i", "j"], pa.string()),
    })
    df = packing.pack_chunks(ray.data.from_arrow(t), budget=4).to_pandas()
    nulls = df[df["lang"].isna()]
    empties = df[df["lang"] == ""]
    # null stream: docs 0 (3 tok) + 2 (4 tok) -> chunks 0:[3+1],1:[3]
    got_null = sorted(map(tuple, nulls[["doc_id", "chunk_id",
                                        "tokens_in_chunk"]].itertuples(
        index=False)))
    assert got_null == [(0, 0, 3), (2, 0, 1), (2, 1, 3)]
    # empty-string stream independently: docs 1 (2 tok) + 3 (1 tok)
    got_empty = sorted(map(tuple, empties[["doc_id", "chunk_id",
                                           "tokens_in_chunk"]].itertuples(
        index=False)))
    assert got_empty == [(1, 0, 2), (3, 0, 1)]
