"""Per-record parsers (the 'parsers' operator family).

JSON property extraction from string columns, two paths:

* :func:`extract_json_field_regex` — vectorized Arrow ``extract_regex``
  fast path for flat scalar fields (no Python per-row loop); the right tool
  for the hot path when the field shape is known.
* :func:`parse_json_column` — general ``json.loads`` per record (C-
  accelerated stdlib parser) for nested/irregular payloads; inherently
  per-record work, so batch it behind an actor pool when heavy.
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


def parse_json_column(batch: pa.Table, col: str, fields: dict[str, pa.DataType],
                      prefix: str = "") -> pa.Table:
    """General per-record JSON parse; one new column per requested field."""
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
