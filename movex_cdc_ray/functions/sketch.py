"""Mergeable cardinality sketches — HyperLogLog (Flajolet et al. 2007).

The canonical distributed distinct-count shape at 100 TB: every batch folds
its rows into a tiny (bucket, rank) partial — 2^p registers max, independent
of batch size — and ONE register-sized ``groupby(bucket).max(rank)`` merges
the whole corpus. Registers are order- and partition-invariant (max is
associative/commutative), so the sketch composes with any upstream sharding
and can be unioned across days/sources without rescanning.

Hashing is md5 fed straight from the Arrow utf8 buffer via memoryview
slices (no per-row Python strings — same feed as dedup.add_content_hash);
rank extraction is exact integer bit math (bit-smear + unpackbits popcount),
never float log2, so the registers are byte-reproducible and the SQL oracle
(md5 hex → bucket/suffix via the hex LUT, rank via ``ltrim(bin(x),'0')``)
matches them exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max

from .scalar import string_offsets_data

# bucket = top p bits of md5 bytes [0:2]; rank = leading zeros of the 32-bit
# suffix in md5 bytes [2:6], + 1 (suffix == 0 -> RANK_MAX)
_SUFFIX_BITS = 32
_RANK_MAX = _SUFFIX_BITS + 1


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of a uint32 array (no float log2)."""
    v = x.astype(np.uint32).copy()
    for s in (1, 2, 4, 8, 16):
        v |= v >> np.uint32(s)
    return np.unpackbits(v.view(np.uint8)).reshape(-1, 32).sum(axis=1, dtype=np.int64)


class HllPartialStage:
    """Per-batch HLL partial: fold the batch into <= 2^p (bucket, rank) rows.

    The fold runs inside ``map_batches`` — a 1M-row batch leaves as at most
    2^p rows, so the downstream register merge groupby moves kilobytes no
    matter the corpus size."""

    def __init__(self, col: str = "text", p: int = 8):
        if not 4 <= p <= 16:
            raise ValueError(f"p must be in [4, 16], got {p}")
        self.col = col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        offs, data = string_offsets_data(text)
        valid = text.is_valid().to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        bucket = np.empty(n, dtype=np.int64)
        suffix = np.empty(n, dtype=np.uint32)
        shift = 16 - self.p
        for i in range(n):
            if not valid[i]:
                bucket[i] = -1
                suffix[i] = 0
                continue
            dig = md5(data[offs[i] : offs[i + 1]]).digest()
            bucket[i] = ((dig[0] << 8) | dig[1]) >> shift
            suffix[i] = int.from_bytes(dig[2:6], "big")
        keep = bucket >= 0
        bucket, suffix = bucket[keep], suffix[keep]
        rank = _RANK_MAX - _bit_length_u32(suffix)
        # in-batch register fold: one row per touched bucket
        regs = np.zeros(1 << self.p, dtype=np.int64)
        np.maximum.at(regs, bucket, rank)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "rank": pa.array(regs[nz], pa.int64())}
        )


def hll_registers(ds: rd.Dataset, col: str = "text", p: int = 8) -> rd.Dataset:
    """Distributed HLL register table: (bucket, max_rank), <= 2^p rows."""
    partials = ds.map_batches(HllPartialStage(col, p), batch_format="pyarrow")
    return partials.groupby("bucket").aggregate(Max("rank", alias_name="max_rank"))


def hll_estimate(registers: pd.DataFrame, p: int) -> float:
    """Cardinality estimate from a register table (standard HLL corrections:
    linear counting below 2.5m when empty buckets remain)."""
    m = 1 << p
    if len(registers) == 0:  # empty corpus: all registers zero -> 0 distinct
        return 0.0
    ranks = np.zeros(m, dtype=np.float64)
    ranks[registers["bucket"].to_numpy()] = registers["max_rank"].to_numpy()
    zeros = int((ranks == 0).sum())
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    estimate = alpha * m * m / float(np.exp2(-ranks).sum())
    if estimate <= 2.5 * m and zeros:
        estimate = m * float(np.log(m / zeros))
    elif estimate > (1.0 / 30.0) * 2.0**_SUFFIX_BITS:
        # large-range correction: the 32-bit suffix saturates hash space
        # near 2^32 distinct values — without this the raw estimator
        # under-counts ~13% at 1e9 and caps at ~4.3e9
        estimate = -(2.0**_SUFFIX_BITS) * float(np.log(1.0 - estimate / 2.0**_SUFFIX_BITS))
    return estimate


def approx_distinct(ds: rd.Dataset, col: str = "text", p: int = 8) -> float:
    """End-to-end approximate distinct count of ``col``."""
    regs = hll_registers(ds, col, p).to_pandas()
    return hll_estimate(regs, p)


class CountMinStage:
    """Per-batch count-min partial (Cormode & Muthukrishnan 2005): fold the
    batch's token counts into a d×w counter matrix, emit nonzero cells.

    Like the HLL fold, at most d·w rows leave any batch regardless of batch
    size, and cells are sum-mergeable — ONE (row, col)-sized groupby merges
    the corpus; sketches from different days/sources add cell-wise.

    Row hashes derive from a single md5 per DISTINCT token (memoized per
    actor, vocabulary-bounded): h1 = bytes [0:4], h2 = bytes [4:8],
    cell_j = (h1 + j·h2) mod w — the standard two-hash family, chosen
    because the SQL oracle can re-derive it from the same md5 hex."""

    def __init__(self, col: str = "text", d: int = 4, w: int = 1024):
        import re as _re

        self.col = col
        self.d = d
        self.w = w
        self.word_re = _re.compile(r"[a-z0-9_]+")
        self.memo: dict[str, tuple[int, int]] = {}

    def _hashes(self, tokens) -> tuple[np.ndarray, np.ndarray]:
        h1 = np.empty(len(tokens), dtype=np.int64)
        h2 = np.empty(len(tokens), dtype=np.int64)
        md5, memo = hashlib.md5, self.memo
        for i, t in enumerate(tokens):
            hit = memo.get(t)
            if hit is None:
                dig = md5(t.encode()).digest()
                hit = (int.from_bytes(dig[0:4], "big"), int.from_bytes(dig[4:8], "big"))
                memo[t] = hit
            h1[i], h2[i] = hit
        return h1, h2

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.col].fillna("").str.lower().str.findall(self.word_re)
        vc = toks.explode().dropna().value_counts()
        if vc.empty:
            return pd.DataFrame(
                {"row": pd.Series([], dtype="int64"),
                 "col": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        h1, h2 = self._hashes(vc.index.to_numpy())
        cnt = vc.to_numpy(dtype=np.int64)
        m = np.zeros((self.d, self.w), dtype=np.int64)
        for j in range(self.d):  # d is 4: four vector scatters, not a token loop
            np.add.at(m[j], (h1 + j * h2) % self.w, cnt)
        rows, cols = np.nonzero(m)
        return pd.DataFrame(
            {"row": rows.astype("int64"), "col": cols.astype("int64"), "n": m[rows, cols]}
        )


def count_min_sketch(ds: rd.Dataset, col: str = "text", d: int = 4, w: int = 1024) -> rd.Dataset:
    """Distributed count-min sketch: (row, col, n) nonzero cells.

    Merge shape: Ray's generic multi-key ``groupby(["row","col"]).
    aggregate(Sum)`` measured ~1.4× slower end-to-end here than a coarse
    16·d-bucket ``map_groups`` with one vectorized pandas reduce inside
    (same finding as ``ngram_jaccard_exact``, CLAUDE.md) — each bucket task
    sums ≤ n_batches·w/16 partial cells, and d·w total cells leave the
    merge."""

    partials = ds.map_batches(CountMinStage(col, d, w), batch_format="pandas")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = b["row"] * 16 + b["col"] % 16
        return b

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["row", "col"], as_index=False)["n"].sum()
        return agg.astype({"row": "int64", "col": "int64", "n": "int64"})

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def count_min_query(cells: pd.DataFrame, tokens: list[str], d: int = 4, w: int = 1024) -> dict[str, int]:
    """Point-estimate token frequencies from a merged cell table: the min
    over the d row counters (never under-counts; over-counts by at most
    eps·N with the usual guarantees)."""
    grid = np.zeros((d, w), dtype=np.int64)
    grid[cells["row"].to_numpy(), cells["col"].to_numpy()] = cells["n"].to_numpy()
    out = {}
    for t in tokens:
        dig = hashlib.md5(t.encode()).digest()
        h1 = int.from_bytes(dig[0:4], "big")
        h2 = int.from_bytes(dig[4:8], "big")
        out[t] = int(min(grid[j, (h1 + j * h2) % w] for j in range(d)))
    return out


class HllGroupedPartialStage:
    """Grouped HLL partial: per-batch fold to <= n_batch_groups·2^p
    (group, bucket, rank) rows — per-domain distinct counts in one scan.
    Group keys live WITH the registers, so the merge is still ONE
    register-sized groupby and each group's sketch stays independently
    mergeable across shards/days."""

    def __init__(self, col: str = "text", group_col: str = "source", p: int = 8):
        if not 4 <= p <= 16:
            raise ValueError(f"p must be in [4, 16], got {p}")
        self.col = col
        self.group_col = group_col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        offs, data = string_offsets_data(text)
        valid = text.is_valid().to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        bucket = np.empty(n, dtype=np.int64)
        suffix = np.empty(n, dtype=np.uint32)
        shift = 16 - self.p
        for i in range(n):
            if not valid[i]:
                bucket[i] = -1
                suffix[i] = 0
                continue
            dig = md5(data[offs[i] : offs[i + 1]]).digest()
            bucket[i] = ((dig[0] << 8) | dig[1]) >> shift
            suffix[i] = int.from_bytes(dig[2:6], "big")
        rank = _RANK_MAX - _bit_length_u32(suffix)
        # per-(group, bucket) fold via a dense scatter: group codes from the
        # batch's own dictionary, one matrix max per batch. Arrow-native
        # pc.dictionary_encode (the column is already Arrow) measured ~2.5×
        # faster than pd.factorize(to_pandas()) at sf0.1 shapes
        # (BENCH/BASELINE.md "factorize vs dictionary_encode") AND hashes by
        # bytes+length, so embedded-NUL group keys can't silently merge
        # (the pandas C-string caveat). A NULL group key gets the sentinel
        # slot len(dict) — its own group, matching SQL GROUP BY.
        gcol = batch[self.group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = pc.dictionary_encode(gcol)
        nvals = len(enc.dictionary)
        gcodes = (
            pc.fill_null(enc.indices, nvals).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        gvals = np.asarray(enc.dictionary.to_pylist() + [None], dtype=object)
        keep = bucket >= 0
        regs = np.zeros((len(gvals), 1 << self.p), dtype=np.int64)
        np.maximum.at(regs, (gcodes[keep], bucket[keep]), rank[keep])
        gi, bi = np.nonzero(regs)
        gout = np.where(pd.isna(gvals[gi]), None, gvals[gi])
        return pa.table(
            {
                self.group_col: pa.array(gout, pa.string()),
                "bucket": pa.array(bi.astype("int64")),
                "rank": pa.array(regs[gi, bi], pa.int64()),
            }
        )


def hll_registers_grouped(
    ds: rd.Dataset, col: str = "text", group_col: str = "source", p: int = 8
) -> rd.Dataset:
    """Per-group HLL register table: (group, bucket, max_rank)."""
    partials = ds.map_batches(HllGroupedPartialStage(col, group_col, p), batch_format="pyarrow")
    return partials.groupby([group_col, "bucket"]).aggregate(Max("rank", alias_name="max_rank"))


class CorpusProfileStage:
    """ONE-SCAN fused sketch fold: each batch emits the tagged union of its
    HLL register partial, count-min cell partial and bottom-k sample
    partial — the corpus is read once, and everything downstream operates
    on bounded partials (≤ 2^p + d·w + k rows per batch).

    Unified partial schema: ``kind`` ('hll' | 'cms' | 'bk'), two int64
    slots ``a``/``b`` (bucket/rank, row/col, doc_id/text_chars), count
    ``n`` (cms only) and string slot ``s`` (bk sample_hash)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 p: int = 8, d: int = 4, w: int = 1024, k: int = 500):
        self.hll = HllPartialStage(text_col, p)
        self.cms = CountMinStage(text_col, d, w)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .corpus import bottom_k_partial

        hll = self.hll(batch)
        cms = self.cms(batch.to_pandas())
        bk = bottom_k_partial(batch, self.k, self.id_col)
        text_chars = pc.utf8_length(
            pc.coalesce(bk[self.text_col].combine_chunks(), "")
        ).cast(pa.int64())
        n_h, n_c, n_b = len(hll), len(cms), len(bk)
        return pa.table(
            {
                "kind": pa.array(["hll"] * n_h + ["cms"] * n_c + ["bk"] * n_b),
                "a": pa.concat_arrays(
                    [
                        hll["bucket"].combine_chunks(),
                        pa.array(cms["row"].to_numpy(), pa.int64()),
                        bk[self.id_col].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "b": pa.concat_arrays(
                    [
                        hll["rank"].combine_chunks(),
                        pa.array(cms["col"].to_numpy(), pa.int64()),
                        text_chars,
                    ]
                ),
                "n": pa.concat_arrays(
                    [
                        pa.nulls(n_h, pa.int64()),
                        pa.array(cms["n"].to_numpy(), pa.int64()),
                        pa.nulls(n_b, pa.int64()),
                    ]
                ),
                "s": pa.concat_arrays(
                    [
                        pa.nulls(n_h, pa.string()),
                        pa.nulls(n_c, pa.string()),
                        bk["sample_hash"].combine_chunks(),
                    ]
                ),
            }
        )


def corpus_profile(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                   p: int = 8, d: int = 4, w: int = 1024, k: int = 500) -> dict:
    """One-scan corpus profile: run the fused fold once, then merge each
    sketch from the TINY partial dataset (materialized once — it is
    kilobytes per input block, so the corpus itself is never re-read).

    Returns {'approx_distinct': float, 'cms_cells': DataFrame,
    'sample': DataFrame (id, text_chars, sample_hash)}."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(
        CorpusProfileStage(text_col, id_col, p, d, w, k), batch_format="pyarrow"
    ).materialize()

    hll = (
        parts.filter(expr="kind == 'hll'")
        .groupby("a")
        .aggregate(Max("b", alias_name="max_rank"))
        .to_pandas()
        .rename(columns={"a": "bucket"})
    )
    cms = (
        parts.filter(expr="kind == 'cms'")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .rename(columns={"a": "row", "b": "col"})
    )
    sample_raw = (
        parts.filter(expr="kind == 'bk'")
        .sort("s")
        .limit(k)
        .to_pandas()
        .rename(columns={"a": id_col, "b": "text_chars", "s": "sample_hash"})
    )
    sample = (
        sample_raw[[id_col, "text_chars", "sample_hash"]]
        if len(sample_raw)
        else pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "text_chars": pd.Series(dtype="int64"),
             "sample_hash": pd.Series(dtype="object")}
        )
    )
    return {
        "approx_distinct": hll_estimate(hll, p),
        "cms_cells": cms,
        "sample": sample,
    }


class BloomPartialStage:
    """Per-batch Bloom-filter partial (Bloom 1970): fold the batch's values
    into an ``m``-bit array — ``k`` positions per value from the count-min
    two-hash family (h1/h2 = md5 bytes [0:4]/[4:8], pos_j = (h1 + j*h2)
    mod m) — and emit the nonzero 32-bit words as (word_idx, word) rows.

    Words are OR-mergeable, so the sketch composes across shards/days like
    the HLL registers; at most m/32 rows leave any batch. 32-bit words keep
    every value exactly representable in an int64 column (and in SQL)."""

    def __init__(self, col: str = "text", m_bits: int = 1 << 15, k_hashes: int = 4):
        if m_bits % 32:
            raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
        self.col = col
        self.m = m_bits
        self.k = k_hashes

    def _positions(self, text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(row_valid mask, (n_valid, k) bit positions) for a string array."""
        offs, data = string_offsets_data(text)
        valid = text.is_valid().to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        n = len(text)
        h1 = np.empty(n, dtype=np.int64)
        h2 = np.empty(n, dtype=np.int64)
        for i in range(n):
            if not valid[i]:
                h1[i] = h2[i] = 0
                continue
            dig = md5(data[offs[i] : offs[i + 1]]).digest()
            h1[i] = int.from_bytes(dig[0:4], "big")
            h2[i] = int.from_bytes(dig[4:8], "big")
        js = np.arange(self.k, dtype=np.int64)
        pos = (h1[valid, None] + js[None, :] * h2[valid, None]) % self.m
        return valid, pos

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        _, pos = self._positions(text)
        words = np.zeros(self.m // 32, dtype=np.uint32)
        flat = pos.ravel()
        np.bitwise_or.at(words, flat // 32, np.uint32(1) << (flat % 32).astype(np.uint32))
        nz = np.nonzero(words)[0]
        return pa.table(
            {
                "word_idx": pa.array(nz.astype(np.int64)),
                "word": pa.array(words[nz].astype(np.int64)),
            }
        )


def bloom_build(
    ds: rd.Dataset, col: str = "text", m_bits: int = 1 << 15, k_hashes: int = 4
) -> np.ndarray:
    """Build the merged Bloom filter: per-batch word folds, then a driver
    OR over the bounded partials (≤ blocks · m/32 rows — the filter is a
    driver-sized broadcast object by design, like the query matrix in
    brute-force KNN). Returns the dense uint32 word array."""
    parts = ds.map_batches(
        BloomPartialStage(col, m_bits, k_hashes), batch_format="pyarrow"
    ).to_pandas()
    words = np.zeros(m_bits // 32, dtype=np.uint32)
    if len(parts):
        np.bitwise_or.at(
            words,
            parts["word_idx"].to_numpy(dtype=np.int64),
            parts["word"].to_numpy(dtype=np.int64).astype(np.uint32),
        )
    return words


class BloomProbeStage:
    """Membership probe against a broadcast Bloom filter: a value is a
    (possible) member iff all k bits are set. No false negatives; false
    positives at the standard (1 - e^{-kn/m})^k rate. NULL values probe
    to False. The filter ships once via ``ray.put``."""

    def __init__(self, words_ref, col: str = "text", m_bits: int = 1 << 15,
                 k_hashes: int = 4, out_col: str = "maybe_member"):
        import ray as _ray

        self.words = (
            _ray.get(words_ref) if isinstance(words_ref, _ray.ObjectRef) else words_ref
        )
        self.hasher = BloomPartialStage(col, m_bits, k_hashes)
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        valid, pos = self.hasher._positions(text)
        bits = (self.words[pos // 32] >> (pos % 32).astype(np.uint32)) & np.uint32(1)
        member = np.zeros(len(text), dtype=bool)
        member[valid] = bits.all(axis=1)
        return batch.append_column(self.out_col, pa.array(member))


def bloom_probe(
    ds: rd.Dataset,
    words: np.ndarray,
    col: str = "text",
    m_bits: int = 1 << 15,
    k_hashes: int = 4,
    out_col: str = "maybe_member",
    concurrency: int = 4,
) -> rd.Dataset:
    """Stream ``ds`` through a Bloom-membership actor pool: the filter is
    broadcast once via ``ray.put`` (zero-copy numpy in each actor), every
    batch pays two vectorized gathers. The incremental-dedup shape at
    100 TB: build on yesterday's corpus, probe today's delta — no id set,
    no join, m/8 bytes total state."""
    import ray as _ray

    from ._pool import pool_size

    ref = _ray.put(words)
    return ds.map_batches(
        BloomProbeStage,
        fn_constructor_kwargs={
            "words_ref": ref,
            "col": col,
            "m_bits": m_bits,
            "k_hashes": k_hashes,
            "out_col": out_col,
        },
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
    )
