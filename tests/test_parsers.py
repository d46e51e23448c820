"""JSON parser stages."""

import pyarrow as pa
import pytest

from tdigest_ray.stages import parsers


@pytest.fixture
def batch():
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4]),
            "props": pa.array(
                ['{"k": 69, "name": "a"}', '{"k": -3}', None, "not json"]),
        }
    )


def test_regex_fast_path_int(batch):
    out = parsers.extract_json_field_regex(batch, "props", "k")
    assert out.column("k").to_pylist() == [69, -3, None, None]


def test_regex_fast_path_string(batch):
    out = parsers.extract_json_field_regex(batch, "props", "name",
                                           out_type=pa.string())
    assert out.column("name").to_pylist() == ["a", None, None, None]


def test_general_parse(batch):
    out = parsers.parse_json_column(
        batch, "props", {"k": pa.int64(), "name": pa.string()})
    assert out.column("k").to_pylist() == [69, -3, None, None]
    assert out.column("name").to_pylist() == ["a", None, None, None]


def test_agreement_between_paths(batch):
    a = parsers.extract_json_field_regex(batch, "props", "k")
    b = parsers.parse_json_column(batch, "props", {"k": pa.int64()})
    assert a.column("k").to_pylist() == b.column("k").to_pylist()


def test_regex_scientific_notation():
    """ADVICE r1: negative exponents (1e-5) must parse, not truncate."""
    import pyarrow as pa

    from tdigest_ray.stages.parsers import extract_json_field_regex

    b = pa.table({"props": pa.array(
        ['{"k": 1e-5}', '{"k": -2.5E+3}', '{"k": -7}', '{"k": 3.14}'])})
    out = extract_json_field_regex(b, "props", "k", out_type=pa.float64())
    assert out.column("k").to_pylist() == [1e-5, -2500.0, -7.0, 3.14]


def test_add_url_parts():
    import pyarrow as pa
    from tdigest_ray.stages.parsers import add_url_parts

    t = pa.table({"url": pa.array([
        "https://site7.example/123",
        "http://user:pw@h.com:8080/a/456?x=1",
        "https://h.org/path/789#frag",
        "ftp://x.y/no-id/",
        "relative/path/3",   # no scheme -> no host
        None,
    ])})
    out = add_url_parts(t)
    assert out.column("host").to_pylist() == [
        "site7.example", "h.com", "h.org", "x.y", None, None]
    # path_id is scheme-independent (relative refs still carry the id)
    assert out.column("path_id").to_pylist() == [123, 456, 789, None, 3, None]


def test_add_url_parts_empty_batch():
    import pyarrow as pa
    from tdigest_ray.stages.parsers import add_url_parts

    t = pa.table({"url": pa.array([], pa.string())})
    out = add_url_parts(t)
    assert out.num_rows == 0
    assert out.column_names == ["url", "host", "path_id"]


class TestExtractJsonFields:
    """Vectorized flat-field set extraction (VERDICT r4 #9)."""

    PAYLOADS = [
        '{"k": 69, "name": "a", "score": 1.5, "ok": true}',
        '{"k": -3, "name": "b\\"q\\\\n", "score": -2e-2, "ok": false}',
        None,
        "not json",
        '{"k": null, "name": null, "score": null, "ok": null}',
        '{"name": "plain"}',
    ]
    FIELDS = {"k": pa.int64(), "name": pa.string(),
              "score": pa.float64(), "ok": pa.bool_()}

    def _batch(self):
        return pa.table({"id": pa.array(range(len(self.PAYLOADS))),
                         "props": pa.array(self.PAYLOADS)})

    def test_matches_parse_json_column(self):
        a = parsers.extract_json_fields(self._batch(), "props", self.FIELDS)
        b = parsers.parse_json_column(self._batch(), "props", self.FIELDS)
        for f in self.FIELDS:
            assert a.column(f).to_pylist() == b.column(f).to_pylist(), f

    def test_escaped_strings_decode(self):
        out = parsers.extract_json_fields(self._batch(), "props",
                                          {"name": pa.string()})
        import json as _json

        want = [(_json.loads(p)["name"] if p and p != "not json" else None)
                for p in self.PAYLOADS]
        assert out.column("name").to_pylist() == want

    def test_prefix_and_no_escape_fast_case(self):
        b = pa.table({"props": pa.array(['{"x": "plain"}'] * 3)})
        out = parsers.extract_json_fields(b, "props", {"x": pa.string()},
                                          prefix="p_")
        assert out.column("p_x").to_pylist() == ["plain"] * 3
