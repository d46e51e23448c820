"""End-to-end pipeline tests: deterministic pages source, the flagship
per-language digest pipeline (plain + salted), checkpoint/resume, and the
byte-identical text-extraction invariant from BASELINE.json input_hint."""

import os

import pyarrow.parquet as pq
import pytest

from tdigest_ray.functions import serde
from tdigest_ray.pipelines import flagship
from tdigest_ray.sources import pages
from tdigest_ray.state import checkpoint

N_PAGES = 4000


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pages"))
    return pages.pages_path(N_PAGES, root=root, shards=4)


class TestPagesSource:
    def test_deterministic_regeneration(self, pages_dir, tmp_path):
        other = pages.pages_path(N_PAGES, root=str(tmp_path), shards=4)
        a = pq.read_table(pages_dir).sort_by("url").to_pandas()
        b = pq.read_table(other).sort_by("url").to_pandas()
        assert a["text"].tolist() == b["text"].tolist()
        assert a["lang"].tolist() == b["lang"].tolist()

    def test_schema_and_skew(self, pages_dir):
        tbl = pq.read_table(pages_dir)
        assert {"url", "warc_ts", "html", "text", "lang"} <= set(
            tbl.column_names
        )
        counts = tbl.to_pandas()["lang"].value_counts(normalize=True)
        assert counts.idxmax() == "en" and counts.max() > 0.4  # hot key

    def test_extract_text_byte_identical(self, pages_dir):
        # input_hint invariant: extracted text is byte-identical to the
        # stored text column per url
        from tdigest_ray.stages.features import extract_text

        ds = pages.read_pages(pages_dir, columns=["url", "html", "text"])
        checked = ds.map_batches(
            lambda b: extract_text(b).select(["url", "text",
                                              "extracted_text"]),
            batch_format="pyarrow",
        ).to_pandas()
        assert (checked["text"] == checked["extracted_text"]).all()


class TestFlagship:
    def test_flagship_quantiles_vs_exact(self, pages_dir):
        out = flagship.flagship(pages_dir, compression=100).to_pandas()
        raw = pq.read_table(pages_dir, columns=["text", "lang"]).to_pandas()
        raw["text_len"] = raw["text"].str.len()
        assert set(out["lang"]) == set(raw["lang"].unique())
        for _, row in out.iterrows():
            grp = raw[raw["lang"] == row["lang"]]["text_len"]
            assert row["text_len_count"] == len(grp)
            exact = grp.quantile(0.95)
            spread = grp.max() - grp.min()
            assert abs(row["text_len_p95"] - exact) <= max(0.02 * spread, 1)

    def test_cross_run_stability(self, pages_dir):
        # two executions of the same lazy pipeline: counts must be exactly
        # equal (count conservation is order-independent) and quantiles
        # within digest tolerance (combine order may differ across runs)
        a = flagship.flagship(pages_dir).to_pandas().set_index("lang").sort_index()
        b = flagship.flagship(pages_dir).to_pandas().set_index("lang").sort_index()
        assert (a["text_len_count"] == b["text_len_count"]).all()
        rel = ((a["text_len_p95"] - b["text_len_p95"]).abs()
               / a["text_len_p95"]).max()
        assert rel < 0.02

    def test_salted_matches_unsalted_counts(self, pages_dir):
        plain = flagship.flagship(pages_dir, salted=False).to_pandas()
        salted = flagship.flagship(pages_dir, salted=True, nsalt=4).to_pandas()
        p = plain.set_index("lang")["text_len_count"].sort_index()
        s = salted.set_index("lang")["text_len_count"].sort_index()
        assert (p == s).all()  # counts are exact under both plans
        # quantiles agree within digest tolerance
        pq_ = plain.set_index("lang")["text_len_p50"].sort_index()
        sq = salted.set_index("lang")["text_len_p50"].sort_index()
        assert ((pq_ - sq).abs() / pq_.clip(lower=1)).max() < 0.05


class TestCheckpoint:
    def _digest_fn(self, ds):
        return flagship.grouped_digests(
            flagship.prepare_features(ds, from_html=True),
            features=("text_len",), compression=100)

    def test_run_resume_and_lineage(self, pages_dir, tmp_path):
        files = sorted(
            os.path.join(pages_dir, f)
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )
        ckpt = str(tmp_path / "ckpt")
        processed = []
        parts = checkpoint.run_with_checkpoints(
            files[:2], ckpt, self._digest_fn, on_progress=processed.append
        )
        assert len(parts) == 2 and len(processed) == 2

        # resume: already-done files are skipped, the rest complete
        processed2 = []
        parts = checkpoint.run_with_checkpoints(
            files, ckpt, self._digest_fn, on_progress=processed2.append
        )
        assert len(parts) == len(files)
        assert set(processed2) == set(files[2:])

        lin = checkpoint.lineage(ckpt)
        assert len(lin) == len(files)
        assert all(r["input_rows"] > 0 and r["engine"] for r in lin)

        # merged result matches a direct full-table run exactly on counts
        merged = checkpoint.merged_result(
            parts, "lang", "text_len_digest").to_pandas()
        raw = pq.read_table(pages_dir, columns=["lang"]).to_pandas()
        exact = raw.groupby("lang").size()
        got = merged.set_index("lang")["text_len_digest"].map(
            lambda b: serde.digest_count(bytes(b)))
        assert (got.sort_index() == exact.sort_index()).all()

    def test_partial_part_not_trusted(self, pages_dir, tmp_path):
        files = sorted(
            os.path.join(pages_dir, f)
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )[:1]
        ckpt = str(tmp_path / "ckpt2")
        os.makedirs(ckpt)
        # a stray tmp file from a crashed run must not count as completed
        with open(os.path.join(ckpt, "part-deadbeef.parquet.tmp"), "wb") as f:
            f.write(b"garbage")
        assert checkpoint.pending_files(ckpt, files) == files


def test_salted_tree_hot_key_parity():
    """r3 (VERDICT item 6): salted two-level merge tree vs the unsalted
    reduce on a 90%-hot Zipf key — counts exact, p95 within digest error."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tdigest_ray.functions import serde
    from tdigest_ray.pipelines.flagship import (
        grouped_digests,
        grouped_digests_salted,
    )
    from tdigest_ray.sketches.hashing import splitmix64

    n = 200_000

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        u = (splitmix64(ids) >> np.uint64(11)).astype(
            np.float64) / (1 << 53)
        g = (splitmix64(ids ^ np.uint64(7)) % np.uint64(10)).astype(np.int64)
        lang = np.where(g < 9, "hot", "cold")
        return pa.table({
            "lang": pa.array(lang.astype(object), pa.string()),
            "text_len": pa.array(u * 1000.0),
        })

    ds = (ray.data.range(n, override_num_blocks=24)
          .map_batches(gen, batch_format="pyarrow").materialize())
    plain = {r["lang"]: serde.from_bytes(bytes(r["text_len_digest"]))
             for r in grouped_digests(
                 ds, features=("text_len",)).take_all()}
    salted = {r["lang"]: serde.from_bytes(bytes(r["text_len_digest"]))
              for r in grouped_digests_salted(
                  ds, features=("text_len",), nsalt=8).take_all()}
    assert set(plain) == set(salted) == {"hot", "cold"}
    for k in plain:
        assert plain[k].count == salted[k].count
        for p in (0.05, 0.5, 0.95):
            assert abs(plain[k].quantile(p)
                       - salted[k].quantile(p)) <= 0.01 * 1000.0


class TestCuration:
    """r3: the end-to-end curation composition (filter -> full-row dedup)."""

    def _docs(self):
        import pyarrow as pa

        texts = [
            "good doc with enough tokens to pass the filter easily now",
            "good doc with enough tokens to pass the filter easily now",
            "short",                       # < 5 tokens -> filtered
            "another quality document with plenty of words in it here",
            "!!! ,,, ... ;;; ::: !!! ,,, ... too much punctuation here!!!",
            "good doc with enough tokens to pass the filter easily now",
        ]
        return pa.table({
            "doc_id": pa.array([10, 3, 1, 7, 2, 5], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 6, pa.string()),
        })

    def test_curate_filters_and_dedups(self):
        import ray

        from tdigest_ray.pipelines.curation import curate

        ds = ray.data.from_arrow(self._docs()).repartition(3)
        out = curate(ds).to_pandas().sort_values("doc_id")
        # dup class {10, 3, 5} -> keep min id 3; short + punct docs gone
        assert out["doc_id"].tolist() == [3, 7]
        assert set(out.columns) == {"doc_id", "text", "lang"}

    def test_curate_to_parquet_roundtrip(self, tmp_path):
        import pyarrow.parquet as pq
        import ray

        from tdigest_ray.pipelines.curation import curate_to_parquet

        ds = ray.data.from_arrow(self._docs())
        outdir = str(tmp_path / "curated")
        curate_to_parquet(ds, outdir)
        back = pq.read_table(outdir).to_pandas().sort_values("doc_id")
        assert back["doc_id"].tolist() == [3, 7]

    def test_exact_dedup_rows_matches_id_variant(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from tdigest_ray.stages.dedup import exact_dedup, exact_dedup_rows

        rng = np.random.default_rng(5)
        texts = [f"text variant number {rng.integers(0, 40)} padded body"
                 for _ in range(300)]
        tbl = pa.table({
            "doc_id": pa.array(rng.permutation(300).astype(np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 300, pa.string()),
        })
        ds = ray.data.from_arrow(tbl).repartition(5)
        ids_only = sorted(r["doc_id"] for r in
                          exact_dedup(ds, carry_cols=("lang",)).take_all())
        full = exact_dedup_rows(ds)
        rows = full.take_all()
        assert sorted(r["doc_id"] for r in rows) == ids_only
        # surviving rows carry their ORIGINAL text
        by_id = {r["doc_id"]: r["text"] for r in rows}
        orig = {i: t for i, t in zip(tbl.column("doc_id").to_pylist(),
                                     tbl.column("text").to_pylist())}
        assert all(by_id[i] == orig[i] for i in by_id)


def test_salted_tree_null_group_key():
    """r3 self-review: null string group keys survive the salted path's
    multi-block sort shuffles (same sentinel discipline as the unsalted
    fast path)."""
    import pyarrow as pa
    import ray

    from tdigest_ray.functions import serde
    from tdigest_ray.pipelines.flagship import grouped_digests_salted

    tbl = pa.table({
        "lang": pa.array(["en", None, "en", None, "de"], pa.string()),
        "text_len": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = grouped_digests_salted(ds, features=("text_len",), nsalt=4)
    counts = {r["lang"]: serde.digest_count(bytes(r["text_len_digest"]))
              for r in out.take_all()}
    assert counts == {"en": 2, None: 2, "de": 1}


class TestGroupedDigestsTable:
    """grouped_digests_table (r5 per-file checkpoint finisher) must be
    interchangeable with the distributed grouped_digests finish."""

    def test_matches_distributed_finish(self, pages_dir):
        import numpy as np
        import ray

        ds = ray.data.read_parquet(pages_dir)
        feats = flagship.prepare_features(ds, from_html=True)
        tbl = flagship.grouped_digests_table(feats, compression=100)
        dist = (flagship.grouped_digests(feats, compression=100)
                .to_pandas().sort_values("lang").reset_index(drop=True))
        got = tbl.to_pandas().sort_values("lang").reset_index(drop=True)
        assert list(got.columns) == list(dist.columns)
        assert got["lang"].tolist() == dist["lang"].tolist()
        exact = feats.to_pandas()
        for col in got.columns:
            if not col.endswith("_digest"):
                continue
            feature = col[:-len("_digest")]
            for lang, a, b in zip(got["lang"], got[col], dist[col]):
                da, db = serde.from_bytes(bytes(a)), serde.from_bytes(bytes(b))
                # identical row sets merged in different order: counts
                # exact, medians inside the digest RANK-accuracy bound.
                # Value-space tolerances don't work here: a 260-row group's
                # median can sit on a wide value gap, so compare where each
                # digest's median lands in the exact sorted data instead.
                assert da.count == db.count
                vals = np.sort(
                    exact.loc[exact["lang"] == lang, feature]
                    .to_numpy(dtype=np.float64))
                n = len(vals)
                assert da.count == n
                for d in (da, db):
                    m = d.quantile(0.5)
                    # exact CDF at m is the interval [lo, hi] (ties make
                    # it a step); the digest median must place 0.5 inside
                    # it, widened by the compression-100 rank error.
                    lo = np.searchsorted(vals, m, side="left") / n
                    hi = np.searchsorted(vals, m, side="right") / n
                    assert lo - 0.05 <= 0.5 <= hi + 0.05, (
                        col, lang, m, lo, hi)

    def test_counts_exact_vs_input(self, pages_dir):
        import ray

        ds = ray.data.read_parquet(pages_dir)
        tbl = flagship.grouped_digests_table(
            flagship.prepare_features(ds, from_html=True))
        raw = pq.read_table(pages_dir, columns=["lang"]).to_pandas()
        exact = raw.groupby("lang").size()
        got = {r["lang"]: serde.digest_count(bytes(r["text_len_digest"]))
               for r in tbl.to_pylist()}
        assert got == exact.to_dict()
