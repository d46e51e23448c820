"""Parity pins for the Arrow-buffer string hashes (VERDICT r2 item 1).

Two contracts:

* ``hash64_utf8`` must be BIT-EXACT with ``pandas.util.hash_array`` on the
  equivalent object array (the compatibility path — SipHash-2-4 of the
  UTF-8 bytes, pandas' fixed key, pandas' finalizer mix).
* ``fast_hash64_utf8`` (the hot-path multilinear hash) must induce the
  SAME classes as TRUE text equality — equal texts always collide,
  distinct texts never collide on the test corpora — so swapping it into
  exact-dedup/fingerprinting changes hash VALUES but never dedup RESULTS.

Note the ground truths differ on embedded NULs: pandas hashes strings as
null-terminated C strings (``"a\\x00b"`` == ``"a"``), a latent dedup bug
the fast hash deliberately fixes; ``hash64_utf8`` reproduces the quirk
for bit parity.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from tdigest_ray.sketches.hashing import (
    fast_hash64_utf8,
    hash64,
    hash64_utf8,
)

EDGE_TEXTS = [
    "", "a", "ab", "x" * 7, "x" * 8, "x" * 9, "x" * 15, "x" * 16,
    "hello world", "ünïcödé テスト", "\x00", "a\x00b", "x" * 1000,
    " ", "\n\t", "🦜" * 20,
]


def _corpus(seed: int, n: int = 400) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.printable + "äöüßé中文😀"
    out = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 300)))
        for _ in range(n)
    ]
    # force duplicate classes
    out += rng.choices(out, k=n // 4)
    rng.shuffle(out)
    return EDGE_TEXTS + out


def _classes(keys) -> set:
    """Partition of indices by key (hash value or the text itself)."""
    by_key: dict = {}
    for i, k in enumerate(keys):
        by_key.setdefault(k if isinstance(k, str) else int(k), []).append(i)
    return {tuple(v) for v in by_key.values()}


class TestSipHashParity:
    def test_bit_exact_vs_hash_array(self):
        texts = _corpus(1)
        expect = hash64(np.asarray(texts, dtype=object))
        got = hash64_utf8(pa.array(texts, pa.string()))
        assert (got == expect).all()

    def test_large_string_and_chunked_and_sliced(self):
        texts = _corpus(2)
        expect = hash64(np.asarray(texts, dtype=object))
        arr = pa.array(texts, pa.string())
        assert (hash64_utf8(arr.cast(pa.large_string())) == expect).all()
        chunked = pa.chunked_array([arr.slice(0, 37), arr.slice(37)])
        assert (hash64_utf8(chunked) == expect).all()
        assert (hash64_utf8(arr.slice(19, 50)) == expect[19:69]).all()

    def test_nulls_hash_as_empty(self):
        arr = pa.array(["a", None, ""], pa.string())
        h = hash64_utf8(arr)
        assert h[1] == h[2]


class TestFastHashDedupParity:
    @pytest.mark.parametrize("seed", [3, 4, 5])
    def test_classes_match_true_text_equality(self, seed):
        texts = _corpus(seed)
        arr = pa.array(texts, pa.string())
        truth = _classes(texts)  # group by the text itself
        fast_classes = _classes(fast_hash64_utf8(arr))
        assert fast_classes == truth

    @pytest.mark.parametrize("seed", [7, 8])
    def test_classes_match_hash_array_on_nul_free_text(self, seed):
        # on NUL-free corpora the pandas path and the fast path must
        # induce identical dedup classes (swap-compatibility pin)
        texts = [t.replace("\x00", "~") for t in _corpus(seed)]
        arr = pa.array(texts, pa.string())
        ref_classes = _classes(hash64(np.asarray(texts, dtype=object)))
        assert _classes(fast_hash64_utf8(arr)) == ref_classes

    def test_consistent_across_slices_and_chunks(self):
        texts = _corpus(6)
        arr = pa.array(texts, pa.string())
        whole = fast_hash64_utf8(arr)
        assert (fast_hash64_utf8(arr.slice(11, 60)) == whole[11:71]).all()
        chunked = pa.chunked_array([arr.slice(0, 23), arr.slice(23)])
        assert (fast_hash64_utf8(chunked) == whole).all()

    def test_single_block_difference_never_collides(self):
        # odd multipliers are invertible mod 2^64: flipping bytes inside
        # one 8-byte block can never cancel
        base = "A" * 64
        variants = [base] + [
            base[:j] + "B" + base[j + 1:] for j in range(64)
        ]
        h = fast_hash64_utf8(pa.array(variants))
        assert len(set(h.tolist())) == len(variants)

    def test_length_and_order_sensitivity(self):
        texts = ["abcdefghXYZ", "XYZabcdefgh", "abcdefgh", "abcdefgh\x00",
                 "abcdefg", "", "\x00", "\x00\x00"]
        h = fast_hash64_utf8(pa.array(texts))
        assert len(set(h.tolist())) == len(texts)

    def test_no_collisions_on_large_distinct_corpus(self):
        arr = pa.array([f"doc-{i}-{i * i}" for i in range(200_000)])
        h = fast_hash64_utf8(arr)
        assert len(np.unique(h)) == len(arr)

    def test_nulls_hash_as_empty(self):
        arr = pa.array(["a", None, ""], pa.string())
        h = fast_hash64_utf8(arr)
        assert h[1] == h[2]


class TestFastHashProperties:
    def test_hypothesis_equal_texts_equal_hashes(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(
            st.text(alphabet=st.characters(
                blacklist_categories=("Cs",)),  # no lone surrogates
                max_size=120),
            min_size=1, max_size=40))
        def prop(texts):
            arr = pa.array(texts, pa.string())
            h = fast_hash64_utf8(arr)
            for i in range(len(texts)):
                for j in range(i + 1, len(texts)):
                    if texts[i] == texts[j]:
                        assert h[i] == h[j]
                    else:
                        assert h[i] != h[j], (texts[i], texts[j])

        prop()

    def test_hypothesis_sip_parity(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=150, deadline=None)
        @given(st.lists(
            st.text(alphabet=st.characters(blacklist_characters="\x00",
                                           blacklist_categories=("Cs",)),
                    max_size=200),
            min_size=1, max_size=30))
        def prop(texts):
            arr = pa.array(texts, pa.string())
            expect = hash64(np.asarray(texts, dtype=object))
            assert (hash64_utf8(arr) == expect).all()

        prop()
