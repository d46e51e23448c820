"""Per-record parsers (the 'parsers' operator family).

JSON property extraction from string columns, three paths:

* :func:`extract_json_field_regex` — vectorized Arrow ``extract_regex``
  fast path for ONE flat scalar field; the right tool for the hot path
  when the field shape is known.
* :func:`extract_json_fields` — the same vectorized machinery over a
  whole string/int/float/bool field SET (flat payloads), including
  escaped-string decoding; the corpus-scale general path.
* :func:`parse_json_column` — ``json.loads`` per record (C-accelerated
  stdlib parser), the NESTED/irregular-payload fallback only; batch it
  behind an actor pool when heavy.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc


def extract_json_field_regex(batch: pa.Table, col: str, field: str,
                             out_col: str | None = None,
                             out_type: pa.DataType = None) -> pa.Table:
    """Vectorized extraction of a flat scalar JSON field via extract_regex."""
    out_col = out_col or field
    out_type = out_type or pa.int64()
    pattern = (rf'"{re.escape(field)}"\s*:\s*'
               r'(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|"[^"]*")')
    struct = pc.extract_regex(batch.column(col), pattern)
    raw = pc.struct_field(struct, "v")
    if pa.types.is_string(out_type):
        vals = pc.replace_substring_regex(raw, '^"|"$', "")
    else:
        vals = pc.cast(raw, out_type)
    return batch.append_column(out_col, vals)


# ---------------------------------------------------------------- #
# PII scrubbing (training-data curation; C4/CCNet-style public rules)
# ---------------------------------------------------------------- #

# RE2 syntax only (no lookaround) so the same patterns run bit-identically
# in Arrow's and DuckDB's regex engines — the oracle parity contract.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def add_pii_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact per-document PII match counts (one ``n_pii_<kind>`` int64
    column per pattern), vectorized via ``pc.count_substring_regex`` —
    non-overlapping left-to-right matches, same semantics as DuckDB's
    ``regexp_extract_all`` length."""
    text = batch.column(text_col)
    for kind, pat in PII_PATTERNS.items():
        batch = batch.append_column(
            f"n_pii_{kind}",
            pc.cast(pc.count_substring_regex(text, pat), pa.int64()))
    return batch


def scrub_pii(batch: pa.Table, text_col: str = "text",
              out_col: str | None = None) -> pa.Table:
    """Redact PII in place: each pattern family is replaced by its
    ``<KIND>`` placeholder, applied in the fixed PII_PATTERNS order
    (email before phone/ipv4 so digit runs inside an address are
    consumed by the most specific pattern first). Pure Arrow kernel
    chain — no Python per row; streams at 100 TB behind ``map_batches``."""
    text = batch.column(text_col)
    for kind, pat in PII_PATTERNS.items():
        text = pc.replace_substring_regex(text, pat, f"<{kind.upper()}>")
    out_col = out_col or text_col
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, text)


# one JSON scalar token: number | string (with escapes) | true/false/null
_JSON_SCALAR = (r'(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?'
                r'|"(?:[^"\\]|\\.)*"|true|false|null)')


def _decode_json_strings(raw: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Quoted JSON string tokens -> their values. The common case (no
    backslash) is one vectorized quote-strip; only the rare escaped
    minority (\\", \\n, \\uXXXX, ...) decodes per row via json.loads."""
    stripped = pc.replace_substring_regex(raw, '^"|"$', "")
    has_esc = pc.match_substring(stripped, "\\")
    if not pc.any(has_esc).as_py():
        return stripped
    vals = stripped.to_pylist()
    for i, esc in enumerate(has_esc.to_pylist()):
        if esc:
            try:
                vals[i] = json.loads('"' + vals[i] + '"')
            except ValueError:
                pass  # malformed escape: keep the raw text
    return pa.array(vals, pa.string())


def extract_json_fields(batch: pa.Table, col: str,
                        fields: dict[str, pa.DataType],
                        prefix: str = "") -> pa.Table:
    """Vectorized multi-field extraction for FLAT JSON payloads: one
    ``extract_regex`` kernel per requested string/int/float/bool field —
    no Python per row (escaped strings decode per row only where a
    backslash actually occurs). ``null`` tokens, missing fields, and
    non-JSON rows all yield null, matching :func:`parse_json_column`.

    Flat-payload contract: the pattern matches the field name ANYWHERE
    in the payload, so a key that recurs inside a nested object would
    be read from the wrong level — for nested/irregular payloads use
    :func:`parse_json_column` (the agreement between both paths on flat
    payloads is pinned by a test)."""
    src = batch.column(col)
    for field, dtype in fields.items():
        pattern = rf'"{re.escape(field)}"\s*:\s*' + _JSON_SCALAR
        raw = pc.struct_field(pc.extract_regex(src, pattern), "v")
        raw = pc.if_else(pc.equal(raw, "null"),
                         pa.scalar(None, pa.string()), raw)
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
            vals = pc.cast(_decode_json_strings(raw), dtype)
        else:
            vals = pc.cast(raw, dtype)
        batch = batch.append_column(prefix + field, vals)
    return batch


def parse_json_column(batch: pa.Table, col: str, fields: dict[str, pa.DataType],
                      prefix: str = "") -> pa.Table:
    """General per-record JSON parse; one new column per requested field.

    This is the NESTED/irregular-payload fallback: ``json.loads`` per
    record is inherently per-row Python and must not sit on a
    corpus-sized document path — flat scalar fields belong on
    :func:`extract_json_fields` (vectorized), and single known fields on
    :func:`extract_json_field_regex`."""
    docs = []
    for s in batch.column(col).to_pylist():
        if not s:
            docs.append({})
            continue
        try:
            docs.append(json.loads(s))
        except (ValueError, TypeError):
            docs.append({})
    for field, dtype in fields.items():
        batch = batch.append_column(
            prefix + field,
            pa.array([d.get(field) for d in docs], dtype))
    return batch


# RFC-3986-shaped URL pieces, vectorized. Host: authority minus
# userinfo/port; path id: trailing integer path segment (the crawl
# fixture's stable per-page id).
URL_HOST_PATTERN = (r'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?'
                    r'(?P<host>[^/?#:]+)')
URL_PATH_ID_PATTERN = r'/(?P<pid>\d+)(?:[?#].*)?$'


def add_url_parts(batch: pa.Table, url_col: str = "url",
                  host_col: str = "host",
                  path_id_col: str = "path_id") -> pa.Table:
    """Append ``host`` (string, null when the URL has no scheme/host)
    and ``path_id`` (int64, null when the path has no trailing integer
    segment) parsed from ``url_col``. Pure ``extract_regex`` kernels —
    no Python per row; streams behind ``map_batches`` at corpus scale
    (per-domain grouping is the standard first key of web-corpus
    curation: robots audits, domain blocklists, per-site quotas)."""
    urls = batch.column(url_col)
    host = pc.struct_field(pc.extract_regex(urls, URL_HOST_PATTERN), "host")
    pid_s = pc.struct_field(pc.extract_regex(urls, URL_PATH_ID_PATTERN),
                            "pid")
    pid = pc.cast(pid_s, pa.int64())
    return (batch.append_column(host_col, host)
                 .append_column(path_id_col, pid))
