"""Multi-format corpus readers (sources/readers.py)."""
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray

from tdigest_ray.sources.readers import read_corpus, with_content_ids

ROWS = [
    {"doc_id": 0, "text": "the quick brown fox", "lang": "en"},
    {"doc_id": 1, "text": "le renard brun rapide", "lang": "fr"},
    {"doc_id": 2, "text": "der schnelle braune fuchs", "lang": "de"},
    {"doc_id": 3, "text": "the lazy dog sleeps", "lang": "en"},
]


@pytest.fixture()
def corpus_files(tmp_path):
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in ROWS], pa.int64()),
        "text": pa.array([r["text"] for r in ROWS]),
        "lang": pa.array([r["lang"] for r in ROWS]),
    })
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    with open(tmp_path / "docs.csv", "w") as f:
        f.write("doc_id,text,lang\n")
        for r in ROWS:
            f.write(f"{r['doc_id']},{r['text']},{r['lang']}\n")
    with open(tmp_path / "docs.txt", "w") as f:
        for r in ROWS:
            f.write(r["text"] + "\n")
    return tmp_path


class TestReadCorpus:
    def test_formats_agree(self, corpus_files):
        dfs = {}
        for fmt, name in [("parquet", "docs.parquet"),
                          ("jsonl", "docs.jsonl"), ("csv", "docs.csv")]:
            dfs[fmt] = read_corpus(
                str(corpus_files / name), format=fmt,
                columns=["doc_id", "text", "lang"]).to_pandas().sort_values(
                "doc_id").reset_index(drop=True)
        assert dfs["parquet"].equals(dfs["jsonl"])
        assert dfs["parquet"].astype(str).equals(dfs["csv"].astype(str))

    def test_text_format(self, corpus_files):
        df = read_corpus(str(corpus_files / "docs.txt"),
                         format="text").to_pandas()
        assert sorted(df["text"]) == sorted(r["text"] for r in ROWS)
        assert list(df.columns) == ["text"]

    def test_filter_pushdown_parquet(self, corpus_files):
        df = read_corpus(str(corpus_files / "docs.parquet"),
                         format="parquet", columns=["doc_id", "lang"],
                         filter=(pc.field("lang") == "en")).to_pandas()
        assert sorted(df["doc_id"]) == [0, 3]

    def test_post_parse_filter_jsonl(self, corpus_files):
        df = read_corpus(str(corpus_files / "docs.jsonl"),
                         format="jsonl",
                         filter=(pc.field("lang") == "en")).to_pandas()
        assert sorted(df["doc_id"]) == [0, 3]

    def test_unsupported_format(self, corpus_files):
        with pytest.raises(ValueError):
            read_corpus(str(corpus_files / "docs.txt"), format="xml")

    def test_content_ids(self, corpus_files):
        ds = read_corpus(str(corpus_files / "docs.txt"), format="text")
        df = with_content_ids(ds).to_pandas()
        assert df["doc_id"].nunique() == len(ROWS)  # distinct texts
        again = with_content_ids(
            read_corpus(str(corpus_files / "docs.txt"),
                        format="text")).to_pandas()
        assert (df.sort_values("text")["doc_id"].values
                == again.sort_values("text")["doc_id"].values).all()
