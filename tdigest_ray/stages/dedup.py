"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 10^12 docs):

* **exact** — hash-partition by a 64-bit text fingerprint, keep the minimum
  id per group. Shuffle traffic is (fingerprint, id, carry-cols) only — the
  text itself never moves.
* **MinHash+LSH** — numeric k-gram shingling (tokens factorized and hashed
  once, k-grams combined arithmetically — no shingle strings), signatures
  via one-permutation hashing by default (one pass instead of num_perm,
  ``minhash_signatures_oph``; the classic k-permutation variant remains as
  ``method="kperm"``), banding into (band, band_hash) keys, then a groupby
  over band buckets emits star-edge candidates. Candidate edges are
  union-found driver-side — the documented partitioning assumption is that
  near-duplicate *edges* are sparse relative to the corpus (true for web
  dedup workloads; buckets are capped to bound pathological collisions).
* **SimHash** — 64-bit signatures computed with one ``np.add.reduceat`` per
  batch; near-dup candidates via 4x16-bit band buckets (Hamming <= 3 within
  64 bits guarantees one identical band by pigeonhole).

Every stage is a pure function of its batch, so Ray task retries are safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tdigest_ray.sketches.hashing import derive_hash, hash64, splitmix64


# ---------------------------------------------------------------- #
# shingling
# ---------------------------------------------------------------- #

def _shingle_hashes(texts, k: int = 3):
    """Word k-shingle hashes for each text; returns (flat uint64 array,
    offsets) where offsets[i]:offsets[i+1] spans doc i's shingles. Documents
    shorter than k words fall back to a whole-text shingle.

    Vectorized: each distinct token is hashed once (pandas factorize +
    SipHash of the vocabulary), then k-gram hashes are position-weighted
    combinations of adjacent token hashes — no shingle strings are ever
    built, so cost is O(total_tokens) numpy work plus one vocab hash.
    """
    import pandas as pd

    token_lists = [t.split() if t else [] for t in texts]
    lens = np.asarray([len(tl) for tl in token_lists], dtype=np.int64)
    n_sh = np.maximum(lens - k + 1, 0)
    short = lens < k

    flat_tokens = [tok for tl in token_lists for tok in tl]
    if flat_tokens:
        codes, uniq = pd.factorize(np.asarray(flat_tokens, dtype=object))
        tok_h = hash64(np.asarray(uniq, dtype=object))[codes]
    else:
        tok_h = np.empty(0, dtype=np.uint64)

    tok_off = np.concatenate([[0], np.cumsum(lens)])
    total = int(n_sh.sum())
    if total:
        doc_of = np.repeat(np.arange(len(texts)), n_sh)
        sh_off = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
        within = np.arange(total) - np.repeat(sh_off, n_sh)
        starts_flat = tok_off[doc_of] + within
        # order-sensitive combine: position-weighted polynomial then mix
        pos_w = splitmix64(np.arange(1, k + 1, dtype=np.uint64)) | np.uint64(1)
        with np.errstate(over="ignore"):
            acc = np.zeros(total, dtype=np.uint64)
            for j in range(k):
                acc += tok_h[starts_flat + j] * pos_w[j]
            gram_h = splitmix64(acc)
    else:
        gram_h = np.empty(0, dtype=np.uint64)

    # assemble per-doc output; short docs contribute one whole-text hash
    out_counts = np.where(short, 1, n_sh)
    offsets = np.concatenate([[0], np.cumsum(out_counts)]).astype(np.int64)
    flat = np.empty(int(out_counts.sum()), dtype=np.uint64)
    if total:
        long_mask = ~short
        # positions of long docs' shingle runs in the output
        dst_doc_of = np.repeat(np.arange(len(texts)), out_counts)
        long_rows = long_mask[dst_doc_of]
        flat[long_rows] = gram_h
    if short.any():
        short_idx = np.flatnonzero(short)
        short_h = hash64(
            np.asarray([texts[i] or "" for i in short_idx], dtype=object))
        flat[offsets[short_idx]] = short_h
    return flat, offsets


def minhash_signatures(texts, num_perm: int = 128, k: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix (Broder 1997).

    One vectorized mixing pass + segment-min per permutation over the flat
    shingle array — no per-document Python loop in the permutation work.
    """
    flat, offsets = _shingle_hashes(texts, k)
    n = len(offsets) - 1
    sig = np.empty((n, num_perm), dtype=np.uint64)
    starts = offsets[:-1]
    for p in range(num_perm):
        mixed = derive_hash(flat, p)
        sig[:, p] = np.minimum.reduceat(mixed, starts)
    # empty-doc guard: reduceat on zero-length segments repeats the next
    # value; force empty docs to a fixed sentinel
    empty = offsets[1:] == offsets[:-1]
    if empty.any():
        sig[empty, :] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return sig


def minhash_signatures_oph(texts, num_perm: int = 128, k: int = 3) -> np.ndarray:
    """One-Permutation Hashing MinHash (Li, Owen & Zhang, NIPS 2012) with
    circular rotation densification (Shrivastava & Li, ICML 2014).

    One hash per shingle instead of ``num_perm`` mixing passes: each shingle
    hash selects a bin (its low bits) and competes for that bin's minimum;
    empty bins borrow the next non-empty bin's value to the right
    (circularly), mixed with the rotation distance so borrowed values stay
    distinct across distances. ~num_perm x cheaper than the k-permutation
    variant with comparable estimator quality; signatures from the two
    variants are NOT comparable with each other.
    """
    flat, offsets = _shingle_hashes(texts, k)
    n = len(offsets) - 1
    SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
    sig = np.full(n * num_perm, SENTINEL, dtype=np.uint64)
    if len(flat):
        doc_of = np.repeat(np.arange(n), np.diff(offsets))
        bins = (flat % np.uint64(num_perm)).astype(np.int64)
        np.minimum.at(sig, doc_of * num_perm + bins, flat)
    sig = sig.reshape(n, num_perm)

    empty = sig == SENTINEL
    if empty.any():
        # circular forward fill: index of the nearest filled bin at or
        # before each position, computed on a doubled axis
        cols = np.arange(2 * num_perm)
        filled2 = np.concatenate([~empty, ~empty], axis=1)
        idx2 = np.where(filled2, cols[None, :], -1)
        last_filled = np.maximum.accumulate(idx2, axis=1)[:, num_perm:]
        rows = np.arange(n)[:, None]
        src_col = last_filled % num_perm
        has_any = ~empty.all(axis=1)
        borrow_dist = (np.arange(num_perm)[None, :] + num_perm
                       - last_filled).astype(np.uint64)
        with np.errstate(over="ignore"):
            borrowed = splitmix64(
                sig[rows, src_col] + borrow_dist *
                np.uint64(0x9E3779B97F4A7C15))
        out = np.where(empty, borrowed, sig)
        # fully-empty docs keep the sentinel signature
        out[~has_any] = SENTINEL
        sig = out
    return sig


def band_keys(sig: np.ndarray, bands: int = 32) -> np.ndarray:
    """(n_docs, bands) int64 LSH band-bucket keys: each band of
    ``num_perm/bands`` rows is mixed into one key; docs sharing any band key
    are candidate near-duplicates."""
    n, num_perm = sig.shape
    r = num_perm // bands
    assert bands * r == num_perm, "bands must divide num_perm"
    out = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                acc = splitmix64(acc ^ sig[:, b * r + j])
            # fold the band index in so different bands never collide
            out[:, b] = splitmix64(acc ^ np.uint64(b))
    return out.view(np.int64)


def simhash_signatures(texts) -> np.ndarray:
    """64-bit SimHash signatures (Charikar 2002) — sign of per-bit sums of
    token hashes, one ``np.add.reduceat`` for the whole batch."""
    all_tokens: list[str] = []
    offsets = [0]
    for t in texts:
        toks = t.split() if t else [""]
        all_tokens.extend(toks)
        offsets.append(len(all_tokens))
    h = hash64(np.asarray(all_tokens, dtype=object))
    starts = np.asarray(offsets[:-1])
    tok_counts = np.diff(np.asarray(offsets))
    sig = np.zeros(len(texts), dtype=np.uint64)
    # one pass per bit keeps memory at O(total_tokens) instead of a
    # tokens x 64 matrix (which would be ~1 GB on a 4M-token block)
    for i in range(64):
        ones = np.add.reduceat(
            ((h >> np.uint64(i)) & np.uint64(1)).astype(np.int64), starts)
        sig |= ((2 * ones > tok_counts).astype(np.uint64)) << np.uint64(i)
    return sig


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return np.bitwise_count(x.view(np.int64)).astype(np.int64) if hasattr(
        np, "bitwise_count"
    ) else np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_band_keys(sig: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n, bands) band keys of 64/bands bits each; Hamming distance
    <= bands-1 guarantees at least one shared band (pigeonhole)."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(sig), bands), dtype=np.uint64)
    for b in range(bands):
        chunk = (sig >> np.uint64(b * width)) & mask
        with np.errstate(over="ignore"):
            out[:, b] = splitmix64(chunk ^ np.uint64(b << 8))
    return out.view(np.int64)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (the LSH verification oracle)."""
    def sh(t: str) -> set:
        toks = t.split()
        if len(toks) < k:
            return {t}
        return {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------- #
# pipeline-level operators
# ---------------------------------------------------------------- #

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                carry_cols: tuple = ()):
    """Keep the minimum-id row per distinct text. Returns a Dataset of the
    kept (id, *carry) rows. The text column is dropped before the shuffle —
    only (fingerprint, id, carry) moves."""
    import pyarrow.compute as pc

    keep = [id_col, *carry_cols]

    def fp(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch.column(text_col).to_pylist(), dtype=object)
        h = hash64(texts).view(np.int64)
        out = batch.select([c for c in keep])
        return out.append_column("_fp", pa.array(h, pa.int64()))

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])[:1]
        return group.take(idx).drop_columns(["_fp"])

    return (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby("_fp")
        .map_groups(keep_first, batch_format="pyarrow")
    )


class UnionFind:
    """Driver-side union-find over the (sparse) candidate-pair set."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical representative = smaller id
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 128, bands: int = 32, k: int = 3,
                  threshold: float = 0.7, max_bucket: int = 64,
                  method: str = "oph"):
    """MinHash-LSH near-duplicate clustering, two-phase.

    Phase 1 (distributed): signatures are computed once per doc; the band
    shuffle carries ONLY ``(band_key, id)`` rows (16 B x bands per doc —
    never the 1 KB signature, which would multiply shuffle bytes by the
    band count). Buckets with >1 doc emit candidate pairs, capped at
    ``max_bucket`` docs per bucket to bound pathological collisions.

    Phase 2 (verification): candidate pairs are sparse by construction
    (that's the LSH contract); their signatures are gathered with one
    filtered pass over the signature table and the estimated Jaccard
    (matching signature rows) is checked vectorized. Union-find over the
    surviving pairs runs driver-side.

    Returns ``(clusters, n_pairs)``: doc id -> canonical (minimum) cluster
    id for clustered docs; number of verified duplicate pairs.
    """
    sig_fn = minhash_signatures_oph if method == "oph" else minhash_signatures

    def to_sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = sig_fn(texts, num_perm=num_perm, k=k)
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.array([s.tobytes() for s in sig], pa.binary()),
                "bands": pa.array(
                    list(band_keys(sig, bands=bands)), pa.list_(pa.int64())),
            }
        )

    sig_ds = ds.map_batches(to_sigs, batch_format="pyarrow").materialize()

    def to_band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = np.asarray(batch.column("bands").to_pylist(), dtype=np.int64)
        b = keys.shape[1] if len(keys) else bands
        return pa.table(
            {
                "band_key": pa.array(keys.ravel(), pa.int64()),
                id_col: pa.array(np.repeat(ids, b)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ids = ids[:max_bucket]
        # star edges to the bucket hub (min id): n-1 candidate edges per
        # bucket instead of n(n-1)/2 — dup-heavy corpora produce huge
        # buckets, and union-find only needs connectivity, not all pairs
        return pa.table({"a": pa.array(np.full(len(ids) - 1, ids[0]),
                                       pa.int64()),
                         "b": pa.array(ids[1:], pa.int64())})

    pair_tbl = (
        sig_ds.map_batches(to_band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    ).to_pandas().drop_duplicates()

    if not len(pair_tbl):
        return {}, 0

    # phase 2: gather signatures of candidate ids with one filtered pass
    cand_ids = set(pair_tbl["a"]).union(pair_tbl["b"])
    import ray as _ray

    cand_ref = _ray.put(np.asarray(sorted(cand_ids), dtype=np.int64))

    def gather(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(cand_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, wanted)
        return batch.filter(pa.array(mask)).select([id_col, "sig"])

    sig_rows = sig_ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    sig_mat = np.vstack([
        np.frombuffer(s, dtype=np.uint64) for s in sig_rows["sig"]
    ])
    row_of = {int(i): r for r, i in enumerate(sig_rows[id_col])}
    a_rows = np.asarray([row_of[int(i)] for i in pair_tbl["a"]])
    b_rows = np.asarray([row_of[int(i)] for i in pair_tbl["b"]])

    uf = UnionFind()
    n_pairs = 0
    a_ids = pair_tbl["a"].to_numpy()
    b_ids = pair_tbl["b"].to_numpy()
    # chunked verification bounds the gathered-signature memory
    for s in range(0, len(a_rows), 65536):
        e = s + 65536
        match = (sig_mat[a_rows[s:e]] == sig_mat[b_rows[s:e]]).mean(axis=1)
        good = np.flatnonzero(match >= threshold)
        for g in good:
            uf.union(int(a_ids[s + g]), int(b_ids[s + g]))
        n_pairs += len(good)
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    return clusters, n_pairs


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bands: int = 4, max_bucket: int = 64):
    """SimHash near-duplicate clustering; same output contract as
    :func:`minhash_dedup`."""
    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = simhash_signatures(texts)
        keys = simhash_band_keys(sig, bands=bands)
        n, b = keys.shape
        return pa.table(
            {
                "band_key": pa.array(keys.ravel(), pa.int64()),
                id_col: pa.array(np.repeat(ids, b)),
                "sig": pa.array(np.repeat(sig.view(np.int64), b)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        order = np.argsort(ids)[:max_bucket]
        ids = ids[order]
        sigs = group.column("sig").to_numpy(zero_copy_only=False)[order]
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        dist = hamming_distance(sigs[a_idx], sigs[b_idx])
        good = dist <= max_hamming
        return pa.table({"a": pa.array(ids[a_idx[good]], pa.int64()),
                         "b": pa.array(ids[b_idx[good]], pa.int64())})

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    uf = UnionFind()
    n_pairs = 0
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("a").to_pylist(),
                        batch.column("b").to_pylist()):
            uf.union(a, b)
            n_pairs += 1
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    return clusters, n_pairs
