"""Text-analysis stages for training-data pipelines.

Vectorized per-batch transforms over a document/page text column:

* :func:`add_text_counts` — exact integer counts (chars, tokens,
  punctuation, uppercase, digits) via ``pyarrow.compute`` regex kernels;
  SQL-parity definitions so the DuckDB oracle can reproduce them exactly.
* :func:`add_quality_score` — length / punctuation / stopword-ratio quality
  scoring in [0, 1].
* :class:`LanguageId` — character/stopword n-gram heuristic language
  identifier, built as an actor-pool stage (profiles compiled once per actor
  in ``__init__``).
* :func:`add_fingerprint` — deterministic 64-bit document fingerprint
  (polynomial rolling hash over normalized text) for exact-duplicate
  detection; fingerprint equality <=> text equality up to hash collisions
  (~2^-61 per pair).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tdigest_ray.sketches.hashing import hash64

# ---------------------------------------------------------------- #
# exact counts (SQL-parity: see __ray_entry__.oracle_sql)
# ---------------------------------------------------------------- #

def add_text_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, r"[.,!?;:]"), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    for name, col in [("n_chars_t", n_chars), ("n_tokens", n_tokens),
                      ("n_punct", n_punct), ("n_upper", n_upper),
                      ("n_digit", n_digit)]:
        batch = batch.append_column(name, col)
    return batch


_EN_STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they at"
).split()


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality in [0,1]: mean-word-length band, alpha ratio,
    stopword presence, and repetition penalty — the usual web-text quality
    heuristics (cf. Gopher/C4 filtering rules, public)."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(float)
    n_tokens = (
        pc.add(pc.count_substring(text, " "), 1)
        .to_numpy(zero_copy_only=False)
        .astype(float)
    )
    n_alpha = (
        pc.count_substring_regex(text, r"[A-Za-z]")
        .to_numpy(zero_copy_only=False)
        .astype(float)
    )
    stop_hits = np.zeros(len(n_chars))
    for w in _EN_STOPWORDS[:8]:
        stop_hits += pc.count_substring(text, f" {w} ").to_numpy(
            zero_copy_only=False
        )
    mean_word = n_chars / np.maximum(n_tokens, 1)
    s_len = np.clip(1.0 - np.abs(mean_word - 5.0) / 10.0, 0.0, 1.0)
    s_alpha = np.clip(n_alpha / np.maximum(n_chars, 1) / 0.8, 0.0, 1.0)
    s_stop = np.clip(stop_hits / np.maximum(n_tokens, 1) / 0.2, 0.0, 1.0)
    score = (s_len + s_alpha + s_stop) / 3.0
    return batch.append_column("quality_score", pa.array(score))


# ---------------------------------------------------------------- #
# language identification (stopword + charset heuristic)
# ---------------------------------------------------------------- #

# tiny public stopword profiles; enough to separate the major languages in
# the synthetic corpora (real deployments would swap in fastText/CLD3 via the
# same actor-pool stage)
_PROFILES = {
    "en": {"the", "of", "and", "to", "in", "is", "you", "that", "it", "for",
           "was", "with", "are", "this", "have"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ich", "ein", "mit",
           "sie", "auf", "für", "des", "dem", "ein"},
    "fr": {"le", "la", "les", "des", "est", "une", "dans", "que", "pour",
           "qui", "sur", "pas", "avec", "par", "mais"},
    "es": {"el", "los", "las", "una", "por", "con", "para", "del", "est",
           "que", "como", "más", "pero", "sus", "este"},
    "pt": {"não", "uma", "para", "com", "por", "mais", "dos", "como", "mas",
           "foi", "ele", "das", "tem", "seu", "sua"},
    "ru": {"и", "в", "не", "на", "что", "с", "по", "это", "как", "его"},
    "ja": {"の", "に", "は", "を", "た", "が", "で", "て", "と", "し"},
    "zh": {"的", "一", "是", "了", "我", "不", "人", "在", "他", "有"},
}


class LanguageId:
    """Actor-pool language-ID stage: profiles are compiled once per actor in
    ``__init__`` (the stateful-stage pattern), then applied per batch.

    Use: ``ds.map_batches(LanguageId, concurrency=N, batch_format="pyarrow")``.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 default: str = "en"):
        self._text_col = text_col
        self._out_col = out_col
        self._default = default
        # token -> lang lookup compiled once
        self._lookup: dict[str, dict[str, int]] = {}
        self._langs = sorted(_PROFILES)
        for li, lang in enumerate(self._langs):
            for w in _PROFILES[lang]:
                self._lookup.setdefault(w, {})[lang] = 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_col).to_pylist()
        out = []
        lookup = self._lookup
        default = self._default
        for t in texts:
            if not t:
                out.append(default)
                continue
            scores: dict[str, int] = {}
            # cheap tokenization; CJK profiles match on characters
            for tok in t.lower().split():
                hit = lookup.get(tok)
                if hit:
                    for lang in hit:
                        scores[lang] = scores.get(lang, 0) + 1
            for ch in t[:200]:
                hit = lookup.get(ch)
                if hit:
                    for lang in hit:
                        scores[lang] = scores.get(lang, 0) + 1
            out.append(max(scores, key=scores.get) if scores else default)
        return batch.append_column(self._out_col, pa.array(out, pa.string()))


# ---------------------------------------------------------------- #
# document fingerprinting
# ---------------------------------------------------------------- #

def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """Deterministic uint64 fingerprint of the text (SipHash via the shared
    hashing primitive); equal texts always collide, distinct texts collide
    with probability ~2^-64."""
    texts = np.asarray(batch.column(text_col).to_pylist(), dtype=object)
    fp = hash64(texts).astype(np.int64)  # int64 for parquet friendliness
    return batch.append_column(out_col, pa.array(fp, pa.int64()))


def rolling_hashes(text: str, window: int = 16,
                   base: int = 257, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Rabin-Karp rolling hashes of every ``window``-byte span — the
    building block for content-defined fingerprint shingles. Vectorized as a
    cumulative polynomial over the byte array."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < window:
        return np.empty(0, dtype=np.uint64)
    # prefix[i] = sum_{j<i} b_j * base^(i-1-j) mod p, computed iteratively
    # in O(n) numpy ops via object-free int arithmetic per position is
    # python-level; instead use the standard sliding recurrence.
    out = np.empty(n - window + 1, dtype=np.uint64)
    h = 0
    power = pow(base, window - 1, mod)
    for i in range(window):
        h = (h * base + int(data[i])) % mod
    out[0] = h
    for i in range(window, n):
        h = ((h - int(data[i - window]) * power) * base + int(data[i])) % mod
        out[i - window + 1] = h
    return out
