"""tfidf_terms (stages/tfidf.py) vs a plain-Python reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.tfidf import tfidf_terms


def ref_tfidf(docs, k=10, min_df=1):
    """docs: list of (doc_id, text|None, lang|None). Returns a sorted
    list of (lang, term, tf, df, score) rows (top-k per lang)."""
    tf, dfdocs = {}, {}
    for did, text, lang in docs:
        toks = (text or "").split()
        for t in toks:
            tf[(lang, t)] = tf.get((lang, t), 0) + 1
        for t in set(toks):
            dfdocs.setdefault(t, set()).add(did)
    df = {t: len(s) for t, s in dfdocs.items()}
    by_lang = {}
    for (lang, t), f in tf.items():
        if df[t] < min_df:
            continue
        by_lang.setdefault(lang, []).append(
            (lang, t, f, df[t], np.float64(f) / np.float64(df[t])))
    out = []
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r[4], r[1]))
        out.extend(rows[:k])
    return sorted(out, key=lambda r: (str(r[0]), r[1]))


def run(docs, nparts=3, **kw):
    tbl = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs], pa.string()),
        "lang": pa.array([l for _, _, l in docs], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    df = tfidf_terms(ds, **kw).to_pandas()
    rows = [(r.lang, r.term, int(r.tf), int(r.df), r.score)
            for r in df.itertuples()]
    return sorted(rows, key=lambda r: (str(r[0]), r[1]))


def make_docs(seed, n, vocab=15):
    rng = np.random.default_rng(seed)
    langs = ["en", "de", "fr"]
    docs = []
    for did in range(n):
        nw = int(rng.integers(0, 25))
        text = " ".join(f"w{v}" for v in rng.integers(0, vocab, size=nw))
        docs.append((did, text if nw else "",
                     langs[int(rng.integers(0, len(langs)))]))
    return docs


@pytest.mark.parametrize("seed,k", [(0, 5), (1, 3), (2, 1)])
def test_randomized_vs_reference(seed, k):
    docs = make_docs(seed, 60)
    assert run(docs, k=k) == ref_tfidf(docs, k=k)


def test_min_df_cut():
    docs = make_docs(5, 40, vocab=30)
    assert run(docs, k=5, min_df=3) == ref_tfidf(docs, k=5, min_df=3)


def test_block_boundary_invariance():
    docs = make_docs(9, 50)
    assert run(docs, nparts=1, k=4) == run(docs, nparts=7, k=4)


def test_tie_break_by_term():
    # all terms same tf and df -> ranking must be purely alphabetical
    docs = [(1, "b a c", "en"), (2, "c a b", "en")]
    got = run(docs, k=2)
    assert [r[1] for r in got] == ["a", "b"]


def test_df_is_corpus_wide():
    # "x" appears in docs of both langs: df must count both documents
    docs = [(1, "x", "en"), (2, "x y", "de")]
    got = {(r[0], r[1]): (r[2], r[3]) for r in run(docs, k=10)}
    assert got[("en", "x")] == (1, 2)
    assert got[("de", "x")] == (1, 2)
    assert got[("de", "y")] == (1, 1)


def test_null_text_and_null_group():
    docs = [(1, None, "en"), (2, "a a b", "en"), (3, "b", None)]
    got = run(docs, k=10)
    ref = ref_tfidf(docs, k=10)
    assert got == ref
    assert (None, "b", 1, 2, 0.5) in got


def test_nonstring_group_with_nulls():
    # code-review finding: null groups in a NON-string group column must
    # form their own group (null-aware dictionary encode), not crash
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a", "a b", "b"], pa.string()),
        "src": pa.array([10, None, None], pa.int64()),
    })
    df = tfidf_terms(ray.data.from_arrow(tbl).repartition(2),
                     k=10, group_col="src").to_pandas()
    rows = {(None if r.src is None or r.src != r.src else int(r.src),
             r.term): (int(r.tf), int(r.df), r.score)
            for r in df.itertuples()}
    assert rows[(10, "a")] == (2, 2, 1.0)
    assert rows[(None, "a")] == (1, 2, 0.5)
    assert rows[(None, "b")] == (2, 2, 1.0)


def test_topn_null_group():
    from tdigest_ray.stages.topn import top_n_ids

    tbl = pa.table({
        "g": pa.array([1, 1, None, None], pa.int64()),
        "v": pa.array([3.0, 1.0, 2.0, 5.0], pa.float64()),
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
    })
    out = top_n_ids(ray.data.from_arrow(tbl), 1, "g", "v").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3]


def test_validation():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a"], pa.string()),
        "lang": pa.array(["en"], pa.string())}))
    with pytest.raises(ValueError):
        tfidf_terms(ds, k=0)
    with pytest.raises(ValueError):
        tfidf_terms(ds, min_df=0)


def test_empty_dataset():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string())}))
    assert tfidf_terms(ds).count() == 0


def ref_tfidf_logidf(docs, k=10, min_df=1):
    """Reference with the textbook score tf * log(N/df); N = len(docs)."""
    n = len(docs)
    tf, dfdocs = {}, {}
    for did, text, lang in docs:
        toks = (text or "").split()
        for t in toks:
            tf[(lang, t)] = tf.get((lang, t), 0) + 1
        for t in set(toks):
            dfdocs.setdefault(t, set()).add(did)
    df = {t: len(s) for t, s in dfdocs.items()}
    by_lang = {}
    for (lang, t), f in tf.items():
        if df[t] < min_df:
            continue
        s = np.float64(f) * np.log(np.float64(n) / np.float64(df[t]))
        by_lang.setdefault(lang, []).append((lang, t, f, df[t], s))
    out = []
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r[4], r[1]))
        out.extend(rows[:k])
    return sorted(out, key=lambda r: (str(r[0]), r[1]))


def test_logidf_score(seed=4, k=4):
    """VERDICT r4 #6: score="logidf" gives the textbook tf*log(N/df)
    top-k (selection AND float value, same libm on both sides here);
    the default score stays bit-oracle-able and unchanged."""
    docs = make_docs(seed, 40)
    got = run(docs, score="logidf", k=k)
    want = ref_tfidf_logidf(docs, k=k)
    assert [r[:4] for r in got] == [r[:4] for r in want]
    np.testing.assert_allclose([r[4] for r in got],
                               [r[4] for r in want], rtol=1e-12)
    # default path unaffected
    assert run(docs, k=k) == ref_tfidf(docs, k=k)


def test_logidf_validation():
    docs = make_docs(5, 5)
    with pytest.raises(ValueError, match="unknown score"):
        run(docs, score="idf")
