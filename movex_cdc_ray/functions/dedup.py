"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is delivery-level exactly-once (operator D1); these
content-level dedups are the training-data extensions. Scale pattern per the
Ray Data guide: hash/signature computed vectorized per batch (stateless or
actor-pool ``map_batches``), then ONE ``groupby`` over the much smaller
(bucket, doc) rows — the full corpus is never pairwise-compared.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ._pool import pool_size
from .scalar import round_half_away, string_offsets_data

_WORD_RE = re.compile(r"\w+")
_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup: hash-partition + per-group first
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_md5") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # md5 fed straight from the Arrow utf8 buffer via memoryview slices —
    # no per-row Python string objects (same feed as sink.content_sha_array)
    n = len(text)
    offs, data = string_offsets_data(text)
    valid = text.is_valid().to_numpy(zero_copy_only=False)
    md5 = hashlib.md5
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = md5(data[offs[i] : offs[i + 1]]).hexdigest() if valid[i] else None
    return batch.append_column(out_col, pa.array(out, pa.string()))


def exact_dedup_keep_first(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """One row per distinct content: min id wins.

    hash-partition (groupby content hash) + per-group first — the canonical
    exact-dedup shape. Returns (content_md5, keep_id, dup_count)."""
    # ship ONLY the groupby inputs into the exchange: the text column stays
    # behind, and the fresh table carries no pandas schema metadata (an
    # unhashable schema defeats Ray's block-schema dedup in the Aggregate)
    hashed = ds.map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "content_md5": add_content_hash(b, text_col)["content_md5"]}
        ),
        batch_format="pyarrow",
    )
    return hashed.groupby("content_md5").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count")
    )


def normalized_dedup_keep_first(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Normalized exact dedup (the RefinedWeb/CCNet pre-step): lowercase,
    collapse non-alphanumeric runs to single spaces, trim — then the
    canonical hash-partition + per-group-first exact dedup over the
    NORMALIZED text. Catches casing / punctuation / whitespace trivial
    variants that byte-exact dedup misses.

    Normalization is three Arrow kernels (utf8_lower,
    replace_substring_regex, utf8_trim_whitespace) — no Python strings
    until the md5 feed; nulls propagate (null text groups under a null
    hash, like ``exact_dedup_keep_first``). Returns
    (norm_md5, keep_id, dup_count)."""

    def stage(b: pa.Table) -> pa.Table:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t), pattern="[^a-z0-9]+", replacement=" "
            )
        )
        hashed = add_content_hash(pa.table({"_norm": norm}), "_norm", "norm_md5")
        # emit ONLY the groupby inputs: the text never enters the exchange,
        # and the fresh table carries no pandas schema metadata (unhashable
        # schemas defeat Ray's block-schema dedup in the Aggregate).
        return pa.table({id_col: b[id_col], "norm_md5": hashed["norm_md5"]})

    hashed = ds.map_batches(stage, batch_format="pyarrow")
    return hashed.groupby("norm_md5").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count")
    )


def passage_dup_stats(
    ds: rd.Dataset,
    chunk_chars: int = 120,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Corpus-level passage dedup (the C4-style unit-dedup shape at fixed
    windows): documents split into NON-overlapping ``chunk_chars`` windows
    (`corpus.chunk_documents` with stride == chunk), each window md5'd; a
    window instance is a duplicate iff its text occurs anywhere else in
    the corpus. Returns per-doc (n_passages, n_dup_passages).

    Scale shape: one flat map (chunking + hashing), ONE coarse
    hash-bucket groupby whose per-bucket body is a single vectorized
    ``value_counts`` (equal windows co-locate by hash prefix — never a
    per-window group call), then a doc-keyed count/sum groupby. No text
    leaves the chunk stage twice: the bucket exchange carries (id, hash)
    only."""
    from .corpus import chunk_documents

    chunks = chunk_documents(ds, chunk_chars, chunk_chars, text_col, id_col)

    def hash_stage(b: pa.Table) -> pa.Table:
        hashed = add_content_hash(b, "chunk_text", "h")
        kb = pc.utf8_slice_codeunits(hashed["h"], 0, 2)  # 256 hex-prefix buckets
        return pa.table({id_col: b[id_col], "h": hashed["h"], "kb": kb})

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["h"].value_counts()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "is_dup": (g["h"].map(vc) > 1).to_numpy().astype("int64"),
            }
        )

    marked = (
        chunks.map_batches(hash_stage, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(mark, batch_format="pandas")
    )
    return marked.groupby(id_col).aggregate(
        Count(alias_name="n_passages"), Sum("is_dup", alias_name="n_dup_passages")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Per-batch MinHash signatures over word ``k``-shingles.

    ``n_perm`` universal hashes ``(a*x + b) mod p`` over 64-bit shingle
    hashes, fully vectorized (one (shingles × perms) numpy broadcast per doc).
    Emits ``band_{i}`` columns (``bands`` buckets of ``n_perm/bands`` rows
    each) ready for the LSH groupby."""

    def __init__(self, text_col: str = "text", k: int = 3, n_perm: int = 64, bands: int = 16, seed: int = 7):
        self.text_col = text_col
        self.k = k
        self.n_perm = n_perm
        self.bands = bands
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, 1 << 31, size=n_perm, dtype=np.uint64) * 2 + 1
        self.b = rng.integers(0, 1 << 31, size=n_perm, dtype=np.uint64)
        self._gram_hash_cache: dict[str, int] = {}

    _GRAM_CACHE_MAX = 1_000_000  # distinct shingles grow ~linearly with
    # corpus text (unlike SimHasher's vocabulary-bounded word cache) — an
    # unbounded memo would leak in long-lived actor-pool workers

    def _gram_hash(self, g: str) -> int:
        # little-endian first 8 md5 bytes == DuckDB md5_number_upper, so the
        # whole minhash pipeline is SQL-reproducible (see _minhash_sql)
        v = self._gram_hash_cache.get(g)
        if v is None:
            if len(self._gram_hash_cache) >= self._GRAM_CACHE_MAX:
                self._gram_hash_cache.clear()
            v = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
            self._gram_hash_cache[g] = v
        return v

    def shingles(self, text: str) -> np.ndarray:
        words = _WORD_RE.findall((text or "").lower())
        if len(words) < self.k:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [" ".join(words[i : i + self.k]) for i in range(len(words) - self.k + 1)]
        uniq = np.unique(np.asarray(grams, dtype=object))
        return np.fromiter((self._gram_hash(g) for g in uniq), dtype=np.uint64, count=len(uniq))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        # (n_shingles, n_perm) broadcast; min over shingles
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) & _MERSENNE
        return vals.min(axis=0)

    def _batch_signatures(self, texts: pd.Series) -> np.ndarray:
        """Batch-vectorized signature path (round-4 Arrow-native pass).

        Tokenization stays on the PYTHON regex (``\\w`` is unicode in
        Python but ASCII in RE2 — an Arrow split would silently diverge
        from the SQL oracle's token stream); everything after it is flat
        and vectorized: one Arrow ``take`` + ``binary_join_element_wise``
        builds every k-shingle of the batch in two kernel calls, ONE
        ``pd.factorize`` dedups shingles batch-globally (per-doc uniquing
        is unnecessary — a min over a multiset equals the min over its
        set), md5 runs only on cache-missing DISTINCT shingles, and the
        permutation-min loops per doc over small gathers (measured faster
        than a flat ``minimum.reduceat`` — per-doc blocks stay in L2).
        Byte-identical signatures to the scalar path (pytest-locked)."""
        import itertools

        k = self.k
        words = [_WORD_RE.findall((t or "").lower()) for t in texts]
        n = np.array([len(w) for w in words], dtype=np.int64)
        flat = list(itertools.chain.from_iterable(words))
        tok_off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=tok_off[1:])
        # shingle counts mirror shingles(): n>=k -> n-k+1; 0<n<k -> 1
        # (the all-words gram); n==0 -> 1 (the "" gram)
        s_count = np.maximum(n - k + 1, 1)
        sh_off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(s_count, out=sh_off[1:])
        out = np.empty(sh_off[-1], dtype=object)
        normal = n >= k
        if normal.any():
            reps = (n - k + 1)[normal]
            base = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
            j0 = np.repeat(tok_off[:-1][normal], reps) + base
            fa = pa.array(flat, pa.string())
            parts = [fa.take(pa.array(j0 + i)) for i in range(k)]
            joined = pc.binary_join_element_wise(*parts, " ")
            o0 = np.repeat(sh_off[:-1][normal], reps) + base
            out[o0] = np.asarray(joined, dtype=object)
        for d in np.flatnonzero(~normal):
            w = words[d]
            out[sh_off[d]] = " ".join(w) if w else ""
        codes, uniq = pd.factorize(pd.Series(out))
        md5s = np.fromiter(
            (self._gram_hash(g) for g in uniq), dtype=np.uint64, count=len(uniq)
        )
        hflat = md5s[codes]
        sigs = np.empty((len(n), self.n_perm), dtype=np.uint64)
        for d in range(len(n)):
            sh = hflat[sh_off[d]: sh_off[d + 1]]
            sigs[d] = ((sh[:, None] * self.a[None, :] + self.b[None, :]) & _MERSENNE).min(axis=0)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self._batch_signatures(batch[self.text_col].fillna(""))
        r = self.n_perm // self.bands
        for bi in range(self.bands):
            band = sigs[:, bi * r : (bi + 1) * r]
            # one stable hash per band slice
            batch[f"band_{bi}"] = pd.util.hash_array(
                np.ascontiguousarray(band).view([("", band.dtype)] * r).ravel()
            ).astype("uint64")
        return batch


def minhash_lsh_buckets(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, n_perm: int = 64, bands: int = 16, seed: int = 7,
) -> rd.Dataset:
    """Docs → minhash → explode to (band_id, band_hash, doc_id) → groupby.

    Returns candidate buckets with >1 member: (band_id, band_hash, n_docs,
    min_doc_id). Pairs inside a bucket are near-dup candidates to verify."""
    hasher = MinHasher(text_col, k, n_perm, bands, seed)
    sigs = ds.map_batches(hasher, batch_format="pandas", concurrency=pool_size(4))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for bi in range(bands):
            frames.append(
                pd.DataFrame(
                    {
                        "band_id": np.int32(bi),
                        "band_hash": batch[f"band_{bi}"].to_numpy(),
                        id_col: batch[id_col].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")
    buckets = exploded.groupby(["band_id", "band_hash"]).aggregate(
        Count(alias_name="n_docs"), Min(id_col, alias_name="min_doc_id")
    )
    return buckets.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)), batch_format="pyarrow"
    )


def jaccard(a: str, b: str, k: int = 3) -> float:
    """Word-k-shingle Jaccard similarity (the verify step after LSH)."""
    wa, wb = _WORD_RE.findall((a or "").lower()), _WORD_RE.findall((b or "").lower())
    sa = {" ".join(wa[i : i + k]) for i in range(max(len(wa) - k + 1, 1))} if wa else set()
    sb = {" ".join(wb[i : i + k]) for i in range(max(len(wb) - k + 1, 1))} if wb else set()
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _pairs_ship_text(
    ds, sigs, threshold, text_col, id_col, k, bands, max_bucket
) -> pd.DataFrame:
    """The small-scale shape of `ngram_jaccard_pairs` (ship='text'): one
    exchange with text replicated per band; verify inside the band bucket."""

    def explode_with_text(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for bi in range(bands):
            frames.append(
                pd.DataFrame(
                    {
                        "band_id": np.int32(bi),
                        "band_hash": batch[f"band_{bi}"].to_numpy(),
                        id_col: batch[id_col].to_numpy(),
                        text_col: batch[text_col].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2 or (max_bucket is not None and len(g) > max_bucket):
            return pd.DataFrame({"a_id": [], "b_id": [], "jac": []})
        ids = g[id_col].to_numpy()
        # shingle sets ONCE per doc per bucket
        sets: list[set[str]] = []
        for t in g[text_col].to_numpy():
            ws = _WORD_RE.findall((t or "").lower())
            sets.append(
                {" ".join(ws[i : i + k]) for i in range(max(len(ws) - k + 1, 1))} if ws else set()
            )
        rows = []
        for i in range(len(g)):
            si = sets[i]
            for j in range(i + 1, len(g)):
                sj = sets[j]
                if not si and not sj:
                    jc = 1.0
                else:
                    inter = len(si & sj)
                    jc = inter / max(len(si) + len(sj) - inter, 1)
                if jc >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), float(round_half_away(jc))))
        return pd.DataFrame(rows, columns=["a_id", "b_id", "jac"])

    pairs = (
        sigs.map_batches(explode_with_text, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(verify_bucket, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"), "jac": pd.Series(dtype="float64")})
    # same pair can surface from multiple bands — dedup
    return (
        pdf.drop_duplicates(subset=["a_id", "b_id"])
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


SHIP_PAIRS_THRESHOLD = 1_000_000  # docs; above this the 16× text replication
# of the text-ship path dominates its fewer exchanges — switch to pairs-first


def ngram_jaccard_pairs(
    ds: rd.Dataset, threshold: float = 0.8, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, n_perm: int = 64, bands: int = 16, seed: int = 7,
    max_bucket: int | None = None, ship: str = "auto",
) -> pd.DataFrame:
    """LSH candidates → exact n-gram Jaccard verify → pairs ≥ threshold.

    The verify compares each candidate bucket's docs pairwise; shingle sets
    are computed ONCE per doc in the bucket (d sets), never per pair.
    ``max_bucket`` (default None = exact) skips verification inside buckets
    larger than ``max_bucket`` docs — the stop-bucket analog of
    ``ngram_jaccard_exact``'s ``max_df`` cut: a degenerate band hash (e.g. a
    corpus full of identical boilerplate) would otherwise fan out O(d²)
    verifies in one task. With it set the result is approximate (pairs that
    ONLY co-occur in capped buckets are missed); the SQL oracle matches the
    default exact mode. Returns (a_id, b_id, jac).

    ``ship`` picks the shuffle shape (both produce identical pairs):

    - ``'text'``: one exchange, but each doc's TEXT is replicated ``bands``×
      into the LSH shuffle — fastest at small scale (fewer exchanges), 16×
      shuffle-byte amplification at corpus scale.
    - ``'pairs'``: candidate pairs from an id-only band explode, deduped
      across bands BEFORE any text moves, then ONE text pass attaches both
      sides (coarse-bucket vectorized merges) and a bucketed verify runs.
      More exchanges (constant cost) but text shuffles exactly once, and
      only for docs in a candidate pair — the 100 TB shape.
    - ``'auto'`` (default): ``'pairs'`` above ``SHIP_PAIRS_THRESHOLD`` docs
      (``ds.count()`` — metadata-cheap on parquet reads), else ``'text'``.
    """
    if ship == "auto":
        ship = "pairs" if ds.count() > SHIP_PAIRS_THRESHOLD else "text"
    if ship not in ("text", "pairs"):
        raise ValueError(f"ship must be 'auto'|'text'|'pairs', got {ship!r}")
    hasher = MinHasher(text_col, k, n_perm, bands, seed)
    sigs = ds.map_batches(hasher, batch_format="pandas", concurrency=pool_size(4))

    if ship == "text":
        return _pairs_ship_text(
            ds, sigs, threshold, text_col, id_col, k, bands, max_bucket
        )

    # ---- phase 1: candidate pairs from an ID-ONLY band explode -----------
    # The naive shape ships (band, hash, doc_id, TEXT) — replicating every
    # document's text `bands`× into the LSH shuffle (16× shuffle bytes at
    # corpus scale). Here only (band, hash, id) rows shuffle; text makes
    # exactly ONE pass, in phase 2, and only for docs that are in a pair.
    def explode_ids(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for bi in range(bands):
            frames.append(
                pd.DataFrame(
                    {
                        "band_id": np.int32(bi),
                        "band_hash": batch[f"band_{bi}"].to_numpy(),
                        id_col: batch[id_col].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    n_buckets = 256  # coarse buckets: vectorized pandas ops inside, never a
    # per-pair or per-doc Python group call

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or (max_bucket is not None and len(ids) > max_bucket):
            return pd.DataFrame({"pk": pd.Series(dtype="int64"),
                                 "pkb": pd.Series(dtype="int64")})
        if int(ids[-1]) >= 1 << 31:
            # (a << 32) | b must stay a POSITIVE int64: ids at 2^31..2^32
            # would make pk negative and the >> 32 unpack sign-extends
            raise ValueError(
                "pair key packs two 31-bit ids; re-key docs below 2^31 or "
                "widen the pair key for larger id spaces"
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        pk = (ids[ii].astype(np.int64) << 32) | ids[jj].astype(np.int64)
        return pd.DataFrame({"pk": pk, "pkb": pk % n_buckets})

    cand = (
        sigs.map_batches(explode_ids, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("pkb")  # same pair surfaces from multiple bands — dedup HERE
        .map_groups(     # (vectorized per coarse bucket), before any text is
            lambda g: g.drop_duplicates(subset=["pk"])[["pk"]],  # fetched
            batch_format="pandas",
        )
    )

    # ---- phase 2: attach texts (one corpus pass) and verify ---------------

    def pair_sides(batch: pd.DataFrame) -> pd.DataFrame:
        pk = batch["pk"].to_numpy()
        a = (pk >> 32).astype(np.int64)
        b = (pk & 0xFFFFFFFF).astype(np.int64)
        both = np.concatenate([a, b])
        return pd.DataFrame(
            {
                id_col: both,
                "pk": np.concatenate([pk, pk]),
                "db": both % n_buckets,
                text_col: pd.Series([None] * len(both), dtype=object),
            }
        )

    def doc_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "pk": np.int64(-1),
                "db": ids % n_buckets,
                text_col: batch[text_col].to_numpy(),
            }
        )

    sides = cand.map_batches(pair_sides, batch_format="pandas")
    texts = ds.map_batches(doc_rows, batch_format="pandas")

    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge per coarse bucket: pair-side rows pick up
        # their doc's text; docs not in any pair drop out here
        t = g[g["pk"] == -1][[id_col, text_col]]
        p = g[g["pk"] != -1][[id_col, "pk"]]
        if p.empty or t.empty:
            return pd.DataFrame({"pk": pd.Series(dtype="int64"),
                                 id_col: pd.Series(dtype="int64"),
                                 text_col: pd.Series(dtype=object)})
        return p.merge(t, on=id_col, how="inner")

    attached = (
        sides.union(texts)
        .groupby("db")
        .map_groups(attach_text, batch_format="pandas")
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # both sides of a pair land in this bucket (keyed by pk). Pair-axis
        # vectorized (the editdistance_join pattern): each DISTINCT doc is
        # tokenized once, shingles explode to a (doc, shingle) frame, and
        # per-pair intersections fall out of one C-level merge + groupby —
        # no per-pair Python sets, no iterrows.
        empty = pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                              "b_id": pd.Series(dtype="int64"),
                              "jac": pd.Series(dtype="float64")})
        if g.empty:
            return empty
        gs = g.sort_values(["pk", id_col])
        gs = gs[gs.groupby("pk")[id_col].transform("size") == 2]
        if gs.empty:  # a side's doc vanished (shouldn't happen) — skip
            return empty
        grp = gs.groupby("pk", sort=False)[id_col]
        pairs = pd.DataFrame({"a_id": grp.first(), "b_id": grp.last()}).reset_index()

        docs = gs.drop_duplicates(id_col)
        words = docs[text_col].fillna("").str.lower().str.findall(_WORD_RE)
        # per-doc k-gram DEDUP needs a set per doc (bounded by docs-in-pairs,
        # the old memo's cost) — the pair axis below is where vectorization pays
        sh_lists = [
            list({" ".join(ws[i : i + k]) for i in range(max(len(ws) - k + 1, 1))})
            if ws
            else []
            for ws in words
        ]
        import itertools

        sh = pd.DataFrame(
            {
                id_col: docs[id_col].to_numpy().repeat([len(s) for s in sh_lists]),
                "sh": list(itertools.chain.from_iterable(sh_lists)),
            }
        )
        sizes = sh.groupby(id_col).size()
        e_a = pairs.merge(sh, left_on="a_id", right_on=id_col)[["pk", "sh"]]
        e_b = pairs.merge(sh, left_on="b_id", right_on=id_col)[["pk", "sh"]]
        inter = e_a.merge(e_b, on=["pk", "sh"]).groupby("pk").size()
        na = pairs["a_id"].map(sizes).fillna(0).to_numpy(np.int64)
        nb = pairs["b_id"].map(sizes).fillna(0).to_numpy(np.int64)
        ni = pairs["pk"].map(inter).fillna(0).to_numpy(np.int64)
        jac = np.where(
            (na == 0) & (nb == 0), 1.0, ni / np.maximum(na + nb - ni, 1)
        )
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "a_id": pairs["a_id"].to_numpy(np.int64)[keep],
                "b_id": pairs["b_id"].to_numpy(np.int64)[keep],
                "jac": round_half_away(jac[keep]),
            }
        )

    def rebucket_by_pk(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(vb=(b["pk"] % n_buckets).astype(np.int64))

    pairs = (
        attached.map_batches(rebucket_by_pk, batch_format="pandas")
        .groupby("vb")
        .map_groups(verify_bucket, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0 or "a_id" not in pdf.columns:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"), "jac": pd.Series(dtype="float64")})
    return (
        pdf.sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def ngram_jaccard_exact(
    ds: rd.Dataset, threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, max_df: int | None = None,
) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via a distributed inverted index
    (no LSH recall loss, no all-pairs scan, no driver-side materialization).

    Shape: docs → distinct word-``k``-shingle hashes exploded to
    ``(doc_id, shingle, set_size)`` rows → ``groupby(shingle)`` generates each
    co-occurring pair once per shared shingle → ``groupby(pair)`` counts give
    the intersection size exactly → vectorized ``|∩| / (|A|+|B|-|∩|)`` filter.
    Only pairs sharing ≥1 shingle are ever compared — the exact-Jaccard
    analog of the reference-free dedup in MinHash pipelines, with none of the
    banding approximation.

    ``max_df`` (default None = exact) skips pair generation inside shingle
    groups larger than ``max_df`` docs — the standard stop-shingle cut that
    bounds the per-group O(d²) pair fan-out at corpus scale. With it set the
    result is approximate (pairs sharing only ultra-common shingles are
    missed); the DuckDB oracle matches the default exact mode.

    Shingles travel as 64-bit hashes (``pd.util.hash_array``), so intersection
    counts equal the string-set counts up to a ~n²/2⁶⁴ collision probability —
    negligible below ~10⁹ distinct shingles per corpus.
    """

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids: list[np.ndarray] = []
        hashes: list[np.ndarray] = []
        sizes: list[np.ndarray] = []
        for did, txt in zip(batch[id_col].to_numpy(), batch[text_col].fillna("")):
            words = _WORD_RE.findall(txt.lower())
            if not words:
                continue  # empty doc: Jaccard undefined, excluded (oracle: len(w) > 0)
            if len(words) < k:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
            sh = np.unique(pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False))
            doc_ids.append(np.full(len(sh), did, dtype=np.int64))
            hashes.append(sh.astype(np.uint64))
            sizes.append(np.full(len(sh), len(sh), dtype=np.int64))
        if not doc_ids:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"), "sh": pd.Series(dtype="uint64"),
                 "sz": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {id_col: np.concatenate(doc_ids), "sh": np.concatenate(hashes),
             "sz": np.concatenate(sizes)}
        )

    # Pair generation groups by a COARSE bucket (sh % n_buckets), not by the
    # shingle itself: a per-shingle map_groups would pay one Python call per
    # distinct shingle (millions at corpus scale); a bucket holds its
    # shingles' complete groups (hash co-location), so one vectorized pandas
    # self-merge per bucket generates every within-shingle pair. A pair
    # sharing shingles in several buckets surfaces once per bucket with a
    # partial count — the global Sum yields the exact intersection size.
    n_buckets = 64
    empty_partial = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "npart": pd.Series(dtype="int64"),
         "sa": pd.Series(dtype="int64"), "sb": pd.Series(dtype="int64"),
         "pkt": pd.Series(dtype="int32")}
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_sh = g.groupby("sh")["sh"].transform("size")
        keep = df_per_sh >= 2
        if max_df is not None:
            keep &= df_per_sh <= max_df
        g = g[keep]
        if len(g) < 2:
            return empty_partial
        m = g.merge(g, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if len(m) == 0:
            return empty_partial
        part = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False)
            .agg(npart=("sh", "size"), sa=("sz_a", "first"), sb=("sz_b", "first"))
            .reset_index()
            .rename(columns={f"{id_col}_a": "a_id", f"{id_col}_b": "b_id"})
        )
        # route each pair to ONE reduce bucket (Ray's generic multi-key
        # Aggregate measured ~10x slower than this sort+map_groups reduce)
        part["pkt"] = ((part["a_id"] * 1_000_003 + part["b_id"]) % n_buckets).astype(np.int32)
        return part.astype({"a_id": "int64", "b_id": "int64", "npart": "int64"})

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # same pair surfaces once per shingle-bucket it co-occurs in; the sum
        # of partial counts is the exact intersection size
        agg = (
            g.groupby(["a_id", "b_id"], sort=False)
            .agg(ninter=("npart", "sum"), sa=("sa", "first"), sb=("sb", "first"))
            .reset_index()
        )
        jac = agg["ninter"] / (agg["sa"] + agg["sb"] - agg["ninter"])
        agg = agg[jac >= threshold]
        return pd.DataFrame(
            {"a_id": agg["a_id"], "b_id": agg["b_id"],
             "jac": round_half_away(agg["ninter"] / (agg["sa"] + agg["sb"] - agg["ninter"]))}
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bkt"] = (batch["sh"] % np.uint64(n_buckets)).astype(np.int32)
        return batch

    exploded = ds.map_batches(explode, batch_format="pandas").map_batches(
        add_bucket, batch_format="pandas"
    )
    pairs = (
        exploded.groupby("bkt")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pkt")
        .map_groups(reduce_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "jac": pd.Series(dtype="float64")}
        )
    return pdf.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document: sign-sum of token-hash bit vectors.

    Near-dups differ in few bits; grouping by bit-band buckets (4 × 16-bit)
    finds candidates within Hamming distance ≤ 3 efficiently.

    The word hash is the little-endian first 8 bytes of md5 — exactly
    DuckDB's ``md5_number_upper`` — so the whole fingerprint has a full SQL
    value oracle (``dedup_simhash``). Hashes are memoized per actor
    (``__init__`` state, populated across batches): the corpus vocabulary is
    tiny relative to token count, so md5 runs ~once per distinct word."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bits = np.arange(64, dtype=np.uint64)
        self._word_hash_cache: dict[str, int] = {}

    def _word_hashes(self, words: list[str]) -> np.ndarray:
        uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
        cache = self._word_hash_cache
        md5 = hashlib.md5

        def h(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = int.from_bytes(md5(w.encode()).digest()[:8], "little")
                cache[w] = v
            return v

        hs_u = np.fromiter((h(w) for w in uniq), dtype=np.uint64, count=len(uniq))
        return hs_u[inv]

    def simhash(self, text: str) -> int:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return 0
        hs = self._word_hashes(words)
        bitmat = ((hs[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
        sums = (2 * bitmat - 1).sum(axis=0)
        return int(((sums > 0).astype(np.uint64) << self.bits).sum())

    def _batch_simhashes(self, texts: pd.Series) -> np.ndarray:
        """Batch-vectorized fingerprints (round-4 pass, the MinHasher
        pattern): ONE ``pd.factorize`` over the batch's flat token stream,
        md5 + the 64-bit expansion computed only per DISTINCT word, and the
        per-doc sign-sums as a single segment ``add.reduceat`` over the
        gathered distinct-word bit matrix. Byte-identical to
        :meth:`simhash` (2·Σbits − n > 0 is the same sign test);
        tokenization stays on the Python regex for oracle parity."""
        import itertools

        words = [_WORD_RE.findall((t or "").lower()) for t in texts]
        n = np.array([len(w) for w in words], dtype=np.int64)
        out = np.zeros(len(n), dtype=np.uint64)
        flat = list(itertools.chain.from_iterable(words))
        if not flat:
            return out
        codes, uniq = pd.factorize(pd.Series(flat))
        cache = self._word_hash_cache
        md5 = hashlib.md5

        def h(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = int.from_bytes(md5(w.encode()).digest()[:8], "little")
                cache[w] = v
            return v

        hs_u = np.fromiter((h(w) for w in uniq), dtype=np.uint64, count=len(uniq))
        bitmat_u = ((hs_u[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int32)
        g = bitmat_u[codes]  # (n_flat, 64), {0,1}
        off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        nz = n > 0  # empty docs contribute no flat rows; their hash stays 0
        sums = np.add.reduceat(g, off[:-1][nz], axis=0).astype(np.int64)
        pos = (2 * sums - n[nz][:, None]) > 0
        out[nz] = (pos.astype(np.uint64) << self.bits[None, :]).sum(axis=1)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        sh = self._batch_simhashes(batch[self.text_col].fillna(""))
        batch["simhash"] = sh
        for i in range(4):  # 16-bit bands for hamming-distance bucketing
            batch[f"simhash_band_{i}"] = ((sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int64)
        return batch


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: rd.Dataset, threshold: float = 0.95, vec_col: str = "embedding", id_col: str = "vec_id",
    rows_per_block: int = 4096,
) -> pd.DataFrame:
    """EXACT all-pairs cosine near-dup, fully distributed (no driver-side
    corpus materialization): the classic triangle tile join.

    Rows hash into B blocks; every unordered block pair (i ≤ j) is one TILE.
    Each row replicates to the B tiles touching its block (shuffle volume
    n·B vectors — the honest cost of an exact O(n²) comparison, spread over
    B(B+1)/2 independent ``map_groups`` tasks, each one numpy matmul). A pair
    is generated exactly once: in tile (block_a, block_b). For approximate
    near-dup at corpus scale use the LSH-bucketed path
    (``pipelines.queries.dedup_embedding_lsh``), which shuffles each row once."""
    n = ds.count()  # metadata-only (parquet row counts), not a materialization
    nblocks = max(1, -(-n // rows_per_block))

    def explode_to_tiles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        blocks = (ids_np % nblocks).astype(np.int64)
        tiles_per_row = nblocks
        # tile id encodes the unordered pair (min(b,o), max(b,o)) as i*B+j
        other = np.tile(np.arange(nblocks, dtype=np.int64), len(ids_np))
        mine = np.repeat(blocks, tiles_per_row)
        ti = np.minimum(mine, other) * nblocks + np.maximum(mine, other)
        take_idx = np.repeat(np.arange(len(ids_np)), tiles_per_row)
        rep = batch.select([id_col, vec_col]).take(pa.array(take_idx))
        rep = rep.append_column("tile", pa.array(ti))
        rep = rep.append_column("block", pa.array(np.repeat(blocks, tiles_per_row)))
        return rep

    def pairs_in_tile(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if len(g) < 2:
            return empty
        tile = int(g["tile"].iloc[0])
        bi, bj = divmod(tile, nblocks)
        g = g.drop_duplicates(subset=[id_col, "block"])
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        blocks = g["block"].to_numpy(dtype=np.int64)
        if bi == bj:  # diagonal tile: all pairs within the block
            sims = mat @ mat.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            a, b, s = ids[ii], ids[jj], sims[ii, jj]
        else:  # off-diagonal: only cross-block pairs (within-block pairs
            # belong to each block's own diagonal tile)
            mi, mj = blocks == bi, blocks == bj
            if not mi.any() or not mj.any():
                return empty
            sims = mat[mi] @ mat[mj].T
            ii, jj = np.where(sims >= threshold)
            a, b, s = ids[mi][ii], ids[mj][jj], sims[ii, jj]
        keep = a != b
        a, b, s = a[keep], b[keep], s[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a_id": lo, "b_id": hi, "cosine": round_half_away(s, 6)})

    pairs = (
        ds.map_batches(explode_to_tiles, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(pairs_in_tile, batch_format="pandas")
    )
    pdf = pairs.to_pandas()  # only the matching PAIRS reach the driver
    if len(pdf) == 0:
        return pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
    return (
        pdf.drop_duplicates(subset=["a_id", "b_id"])
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def semantic_dup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.45,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_rows: int = 4096,
) -> pd.DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): a coarse k-means
    quantizer clusters the embedding space, then near-dup pairs are found
    ONLY within each cluster — the quadratic comparison is local to a
    cell, never corpus-wide.

    Scale shape: the quantizer trains on a deterministic id-filter sample
    (pushed into the scan), centroids broadcast once via ``ray.put``, the
    assignment stage streams (one argmax matmul per batch), and the
    within-cell all-pairs runs inside ``groupby(cell).map_groups`` — one
    shuffle, each row moves once (vs the exact triangle join's n·B
    replication). Approximate by design: a cross-cell near-dup pair is
    missed, which is SemDeDup's documented recall tradeoff; ``n_centroids``
    scales with corpus size to bound the per-cell quadratic term.

    Deterministic and SQL-checkable end-to-end: the same round-9
    normalization / fixed-iteration Lloyd contract as ``ivf_topk``, pair
    filter on round-6 cosine (`queries.py:_semdedup_sql` re-derives the
    full pipeline, k-means included, in DuckDB).

    Hot-cell guard: a degenerate embedding space (many near-identical
    docs — exactly the dedup target) can put most rows in ONE cell, making
    one ``map_groups`` task own the whole O(cell²) comparison. Cells above
    ``max_cell_rows`` are split with the same exact triangle tile join as
    ``embedding_neardup_pairs``: rows hash into ⌈cell/max_cell_rows⌉
    blocks and every unordered block pair becomes its own task, so no task
    compares more than ~max_cell_rows² candidates. The split is EXACT —
    pair output is byte-identical with or without it (unlike a
    sub-clustering cap there is no extra recall loss), so the SQL oracle
    holds at every cell-size distribution. The per-cell histogram pass
    (n_centroids rows) runs only when the corpus row count can exceed the
    cap."""
    from .similarity import _normalize, _round9, _to_matrix, train_coarse_quantizer

    centroids = train_coarse_quantizer(ds, n_centroids, sample_rows, id_col, vec_col)
    side = ray.put(centroids)

    def assign_cells(batch: pa.Table) -> pa.Table:
        mat = _round9(_normalize(_to_matrix(batch[vec_col])))
        cells = np.argmax(mat @ ray.get(side).T, axis=1).astype(np.int64)
        return batch.select([id_col, vec_col]).append_column("cell", pa.array(cells))

    def pairs_in_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if len(g) < 2:
            return empty
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = _round9(_normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in g[vec_col]]
        )))
        sims = round_half_away(mat @ mat.T, 6)
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        a, b = ids[ii], ids[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a_id": lo, "b_id": hi, "cosine": sims[ii, jj]})

    assigned = ds.map_batches(assign_cells, batch_format="pyarrow")

    # hot-cell guard: histogram only when any cell COULD exceed the cap
    nb: dict[int, int] = {}
    if ds.count() > max_cell_rows:
        sizes = assigned.groupby("cell").count().take_all()  # n_centroids rows
        nb = {
            int(r["cell"]): -(-int(r["count()"]) // max_cell_rows) for r in sizes
        }
    hot = {c: b for c, b in nb.items() if b > 1}

    if not hot:
        pairs = assigned.groupby("cell").map_groups(pairs_in_cell, batch_format="pandas")
    else:
        maxb = max(hot.values())
        nb_arr = np.ones(n_centroids, dtype=np.int64)
        for c, b in nb.items():
            nb_arr[c] = b
        nb_ref = ray.put(nb_arr)

        def explode_hot(batch: pa.Table) -> pa.Table:
            blocks_of = ray.get(nb_ref)  # int64[n_centroids] tile counts
            ids_np = (
                batch[id_col].combine_chunks()
                if isinstance(batch[id_col], pa.ChunkedArray)
                else batch[id_col]
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            cells = (
                batch["cell"].combine_chunks()
                if isinstance(batch["cell"], pa.ChunkedArray)
                else batch["cell"]
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            bcount = blocks_of[cells]
            my_block = ids_np % bcount
            # each row replicates to the bcount tiles touching its block;
            # cold cells (bcount 1) stay single-copy with tile (0, 0)
            take_idx = np.repeat(np.arange(len(ids_np)), bcount)
            # ragged per-row ranges 0..bcount[r]-1, fully vectorized
            starts = np.repeat(np.cumsum(bcount) - bcount, bcount)
            other = np.arange(int(bcount.sum()), dtype=np.int64) - starts
            mine = np.repeat(my_block, bcount)
            ti = np.minimum(mine, other)
            tj = np.maximum(mine, other)
            # injective group key across cells: cell · maxb² + i · maxb + j
            gkey = np.repeat(cells, bcount) * (maxb * maxb) + ti * maxb + tj
            rep = batch.select([id_col, vec_col]).take(pa.array(take_idx))
            rep = rep.append_column("gkey", pa.array(gkey))
            rep = rep.append_column("block", pa.array(mine))
            return rep

        def pairs_in_tile(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
            if len(g) < 2:
                return empty
            gkey = int(g["gkey"].iloc[0])
            bi, bj = divmod(gkey % (maxb * maxb), maxb)
            ids = g[id_col].to_numpy(dtype=np.int64)
            mat = _round9(_normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in g[vec_col]]
            )))
            blocks = g["block"].to_numpy(dtype=np.int64)
            if bi == bj:  # diagonal tile: all pairs within the block
                sims = round_half_away(mat @ mat.T, 6)
                ii, jj = np.where(np.triu(sims >= threshold, k=1))
                a, b, s = ids[ii], ids[jj], sims[ii, jj]
            else:  # off-diagonal: cross-block pairs only (within-block
                # pairs belong to each block's own diagonal tile)
                mi, mj = blocks == bi, blocks == bj
                if not mi.any() or not mj.any():
                    return empty
                sims = round_half_away(mat[mi] @ mat[mj].T, 6)
                ii, jj = np.where(sims >= threshold)
                a, b, s = ids[mi][ii], ids[mj][jj], sims[ii, jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pd.DataFrame({"a_id": lo, "b_id": hi, "cosine": s})

        pairs = (
            assigned.map_batches(explode_hot, batch_format="pyarrow")
            .groupby("gkey")
            .map_groups(pairs_in_tile, batch_format="pandas")
        )
    pdf = pairs.to_pandas()  # only matching PAIRS reach the driver
    if len(pdf) == 0:
        return pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
    return pdf.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact substring-run dedup: winnowed fingerprints (Lee et al. 2021 shape)
# ---------------------------------------------------------------------------


class WinnowStage:
    """Per-batch winnowed fingerprints for exact substring-run detection
    (Schleimer et al. 2003 winnowing; the candidate-generation half of
    Lee et al. 2021's exact-substring dedup, at word granularity).

    Every word ``n``-gram gets the md5_number_upper hash (the engine's
    shared SQL-checkable convention); each window of ``s`` consecutive
    gram positions selects its MINIMUM hash value. Guarantee: two docs
    sharing a verbatim run of >= n+s-1 consecutive words share at least
    one selected fingerprint — and because equal fingerprints come from
    equal n-grams (md5), every candidate pair truly shares an exact
    n-word substring; no verify pass is needed.

    All hot steps are pandas/numpy C loops: explode + groupby-shift for
    grams, exact uint64 window-min via s-1 vector minimums (pandas
    rolling would go through float64 and corrupt 64-bit hashes)."""

    def __init__(self, n: int = 8, s: int = 4, text_col: str = "text", id_col: str = "doc_id"):
        if n < 2 or s < 2:
            raise ValueError("need n >= 2 gram words and s >= 2 window positions")
        self.n = n
        self.s = s
        self.text_col = text_col
        self.id_col = id_col
        self.word_re = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {self.id_col: pd.Series([], dtype="int64"),
             "fp": pd.Series([], dtype="uint64")}
        )
        t = batch[self.text_col].reset_index(drop=True).fillna("")
        ids = batch[self.id_col].reset_index(drop=True).to_numpy()
        toks = t.str.lower().str.findall(self.word_re)
        ex = toks.explode().dropna()
        if ex.empty:
            return empty
        # explode keeps each doc's tokens contiguous, so the k-th gram word
        # is a GLOBAL shift of the token array; a gram is valid iff its
        # first and last word share a doc. Cheaper than n-1 groupby.shift
        # calls + n-1 full object-string concatenations: one join per
        # valid gram, hashed in the same pass.
        w = ex.to_numpy()
        docs = ex.index.to_numpy()
        lim0 = len(w) - self.n + 1
        if lim0 <= 0:
            return empty
        vi = np.nonzero(docs[:lim0] == docs[self.n - 1 :])[0]
        if len(vi) == 0:
            return empty
        parts = [w[k : lim0 + k][vi] for k in range(self.n)]
        gdoc = docs[vi]
        md5 = hashlib.md5
        join = " ".join
        h = np.fromiter(
            (
                int.from_bytes(md5(join(g).encode()).digest()[:8], "little")
                for g in zip(*parts)
            ),
            dtype=np.uint64,
            count=len(vi),
        )
        # exact window-min over s gram positions, doc-bounded: gram rows of
        # one doc are contiguous, so window i is valid iff position i+s-1
        # still belongs to the same doc
        m = h.copy()
        for k in range(1, self.s):
            m[:-k] = np.minimum(m[:-k], h[k:])
        valid = np.zeros(len(m), dtype=bool)
        lim = len(m) - (self.s - 1)
        if lim > 0:
            valid[:lim] = gdoc[:lim] == gdoc[self.s - 1 :]
        sel = pd.DataFrame({self.id_col: ids[gdoc[valid]], "fp": m[valid]})
        return sel.drop_duplicates()


def substring_dup_pairs(
    ds: rd.Dataset,
    n: int = 8,
    s: int = 4,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Candidate pairs sharing an exact run of >= n+s-1 words, with the
    count of shared winnowed fingerprints per pair.

    Shape: per-batch winnow fold (output ∝ selected fingerprints, not
    words) → ONE fingerprint-bucket groupby → within-bucket pair
    generation capped at ``max_bucket`` docs (a boilerplate fingerprint
    shared by thousands of docs would otherwise emit O(d²) pairs — the
    same hot-bucket guard the LSH verify path uses) → pair-count groupby
    over the (tiny) pair set."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g[id_col].to_numpy())
        if len(d) < 2 or len(d) > max_bucket:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        ii, jj = np.triu_indices(len(d), k=1)
        return pd.DataFrame({"doc_a": d[ii].astype("int64"), "doc_b": d[jj].astype("int64")})

    fps = ds.map_batches(
        WinnowStage(n=n, s=s, text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=pool_size(4),
    )
    pairs = fps.groupby("fp").map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_shared"))


# ---------------------------------------------------------------------------
# edit-distance similarity join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

_FNV64 = np.uint64(1099511628211)


def _poly_hash_rows(mat: np.ndarray) -> np.ndarray:
    """uint64 polynomial hash of each row of an (n, w) uint8 matrix —
    vectorized (one multiply + sum), wrapping mod 2^64. Collisions only MERGE
    candidate buckets (extra pairs); the DP verify removes them, so the join
    stays exact."""
    w = mat.shape[1]
    powers = np.empty(w, dtype=np.uint64)
    powers[0] = np.uint64(1)
    if w > 1:
        np.multiply.accumulate(np.full(w - 1, _FNV64, dtype=np.uint64), out=powers[1:])
    return (mat.astype(np.uint64) * powers[None, :]).sum(axis=1, dtype=np.uint64)


def slug_matrix(slugs: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
    """ASCII slug strings → ((n, width) uint8 NUL-padded byte matrix,
    true lengths). NUL is the pad byte: it cannot appear in the slug domain
    (the callers' ASCII guard admits parquet strings only, and an embedded
    NUL would merely merge two candidate buckets — never split one — so
    exactness survives even a hostile input)."""
    lens = np.fromiter((len(s) for s in slugs), dtype=np.int64, count=len(slugs))
    joined = "".join(s.ljust(width, "\0") for s in slugs)
    mat = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).reshape(len(slugs), width)
    return mat.copy(), lens


# multiplicative inverse of the (odd) FNV prime mod 2^64 — lets a deletion
# hash come from prefix/suffix tables in O(1) instead of re-hashing the
# column-subset variant (see deletion_keys)
_FNV64_INV = np.uint64(pow(int(_FNV64), -1, 1 << 64))


def deletion_keys(mat: np.ndarray, k: int = 2) -> list[np.ndarray]:
    """FastSS candidate keys: the hash of every ≤k-column-deletion variant
    of each row (ed(s,t) ≤ k ⟹ the deletion neighborhoods intersect —
    Bocek et al.'s FastSS filter). Deleting a PAD column yields the
    lower-order variant at that width, so the full ≤k neighborhood of every
    (shorter) string emerges from fixed column subsets.

    Hashes are PREFIX/SUFFIX-COMPOSED, not re-computed per variant: with
    pre[d] = Σ_{j<d} m_j·P^j and suf[d] = Σ_{j≥d} m_j·P^j (wrapping uint64),
    deleting column d gives pre[d] + suf[d+1]·P⁻¹ (P is odd ⇒ invertible
    mod 2⁶⁴), and deleting d1<d2 gives
    pre[d1] + (seg(d1+1..d2-1))·P⁻¹ + suf[d2+1]·P⁻². Each of the
    1+w+C(w,2) variants costs O(n) adds/multiplies off two O(n·w) tables —
    measured 2× over per-variant re-hashing at 20k×20 (memory-bound; the
    arithmetic saving is ~w×) with zero column-subset allocations.
    ``tests/test_phash_editdist.py`` locks this against the naive
    per-variant re-hash."""
    n, w = mat.shape
    powers = np.empty(w, dtype=np.uint64)
    powers[0] = np.uint64(1)
    if w > 1:
        np.multiply.accumulate(np.full(w - 1, _FNV64, dtype=np.uint64), out=powers[1:])
    weighted = mat.astype(np.uint64) * powers[None, :]          # (n, w)
    pre = np.zeros((n, w + 2), dtype=np.uint64)
    np.cumsum(weighted, axis=1, out=pre[:, 1 : w + 1])          # pre[:, d] = Σ_{j<d}
    pre[:, w + 1] = pre[:, w]
    total = pre[:, w]
    suf = total[:, None] - pre[:, : w + 2]                       # suf[:, d] = Σ_{j≥d}
    # wraparound mod 2^64 is intended; square via Python ints + mask so the
    # numpy-scalar overflow RuntimeWarning never fires in worker logs
    inv1 = _FNV64_INV
    inv2 = np.uint64((int(_FNV64_INV) * int(_FNV64_INV)) & 0xFFFFFFFFFFFFFFFF)
    keys = [total.copy()]
    for d1 in range(w):
        keys.append(pre[:, d1] + suf[:, d1 + 1] * inv1)
        if k >= 2:
            for d2 in range(d1 + 1, w):
                mid = pre[:, d2] - pre[:, d1 + 1]                # Σ_{d1<j<d2}
                keys.append(pre[:, d1] + mid * inv1 + suf[:, d2 + 1] * inv2)
    return keys


def levenshtein_pairs(
    a_mat: np.ndarray, a_len: np.ndarray, b_mat: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Byte-exact Levenshtein distance for m string pairs, vectorized across
    the PAIR axis: the (w+1)² DP grid is a scalar loop, but every cell does
    O(m) numpy work — no per-pair Python (the repo's no-row-loops rule).
    Matches DuckDB's byte-based ``levenshtein`` on ASCII inputs."""
    m, w = a_mat.shape
    ans = np.where(a_len == 0, b_len, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(w + 1, dtype=np.int64), (m, w + 1)).copy()
    for i in range(1, w + 1):
        cur = np.empty((m, w + 1), dtype=np.int64)
        cur[:, 0] = i
        ai = a_mat[:, i - 1]
        for j in range(1, w + 1):
            sub = prev[:, j - 1] + (ai != b_mat[:, j - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub)
        hit = a_len == i
        if hit.any():
            ans[hit] = cur[hit, b_len[hit]]
        prev = cur
    return ans


def editdistance_join(
    slug_pdf: pd.DataFrame, k: int = 2, width: int = 20,
    id_col: str = "id", slug_col: str = "s",
) -> pd.DataFrame:
    """EXACT edit-distance self-join: all pairs with levenshtein ≤ k.

    Three distributed stages: (1) ``map_batches`` keygen — each string emits
    its FastSS deletion-neighborhood hashes (1 + w + C(w,2) keys for k=2,
    every variant one vectorized take); (2) ``groupby(key).map_groups`` —
    within-bucket candidate pairs; (3) ``map_batches`` verify — vectorized
    banded DP against the broadcast slug matrix (``ray.put`` once, loaded
    per actor in ``__init__``). A pair sharing several variant keys is
    verified redundantly (identical ed) and deduped in the final driver-side
    result, which holds only matching pairs.

    The broadcast matrix bounds the input: callers cap the joined set (the
    slug table IS the broadcast small side). For corpora beyond broadcast
    size, partition stage 3 by id range and ship per-partition matrices —
    same stage shape, noted here as the documented scale path."""
    ids_all = slug_pdf[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids_all)
    ids_sorted = ids_all[order]
    mat_sorted, lens_sorted = slug_matrix(slug_pdf[slug_col].to_numpy()[order], width)
    ref = ray.put((ids_sorted, mat_sorted, lens_sorted))

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "ed": pd.Series(dtype="int64")}
    )

    def gen_keys(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return pa.schema(
                [("bucket", pa.int64()), ("key", pa.int64()), ("id", pa.int64())]
            ).empty_table()
        mat, _lens = slug_matrix(b[slug_col].to_numpy(), width)
        key_list = deletion_keys(mat, k)
        keys = np.concatenate(key_list).view(np.int64)
        idr = np.tile(b[id_col].to_numpy(dtype=np.int64), len(key_list))
        # coarse bucket: groupby on the raw key would invoke map_groups once
        # per (mostly singleton) variant key — the measured ~10× per-group
        # overhead trap (CLAUDE.md); 1024 coarse buckets keep groups chunky
        # and the real key grouping happens vectorized inside bucket_pairs
        return pa.table(
            {"bucket": pa.array(keys & np.int64(1023)), "key": pa.array(keys),
             "id": pa.array(idr)}
        )

    pair_empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        kv = g[["key", "id"]].drop_duplicates()
        counts = kv["key"].value_counts()
        kv = kv[kv["key"].isin(counts[counts >= 2].index)]
        if kv.empty:
            return pair_empty
        kv = kv.sort_values(["key", "id"])
        keys = kv["key"].to_numpy()
        idsv = kv["id"].to_numpy(dtype=np.int64)
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):  # multi-member keys only
            ii, jj = np.triu_indices(e - s, k=1)
            out_a.append(idsv[s:e][ii])
            out_b.append(idsv[s:e][jj])
        pairs_arr = np.unique(
            np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1), axis=0
        )
        return pd.DataFrame({"id_a": pairs_arr[:, 0], "id_b": pairs_arr[:, 1]})

    class _Verify:
        def __init__(self, slug_ref, max_ed: int):
            self.ids, self.mat, self.lens = ray.get(slug_ref)
            self.max_ed = max_ed

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.schema(
                    [("id_a", pa.int64()), ("id_b", pa.int64()), ("ed", pa.int64())]
                ).empty_table()
            ia = t["id_a"].to_numpy()
            ib = t["id_b"].to_numpy()
            ra = np.searchsorted(self.ids, ia)
            rb = np.searchsorted(self.ids, ib)
            ed = levenshtein_pairs(self.mat[ra], self.lens[ra], self.mat[rb], self.lens[rb])
            keep = ed <= self.max_ed
            return pa.table(
                {"id_a": pa.array(ia[keep]), "id_b": pa.array(ib[keep]),
                 "ed": pa.array(ed[keep])}
            )

    ds = rd.from_pandas(slug_pdf)
    pairs = (
        ds.map_batches(gen_keys, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(
            _Verify, fn_constructor_kwargs={"slug_ref": ref, "max_ed": k},
            batch_format="pyarrow", concurrency=2,
        )
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return empty
    pdf = pdf.drop_duplicates(["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# containment-coefficient similarity join (partial-copy detection)
# ---------------------------------------------------------------------------


def shingle_explode(
    batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> pd.DataFrame:
    """Distinct word-``k``-shingle hash rows (id, sh, sz) per document —
    the shared explode stage of the inverted-index similarity family
    (jaccard / containment / novelty). Empty docs are excluded (set ops
    undefined; oracles filter len(w) > 0). Shingles travel as 64-bit
    ``pd.util.hash_array`` values (collision odds ~n²/2⁶⁴, negligible below
    ~10⁹ distinct shingles)."""
    doc_ids, hashes, sizes = [], [], []
    for did, txt in zip(batch[id_col].to_numpy(), batch[text_col].fillna("")):
        words = _WORD_RE.findall(txt.lower())
        if not words:
            continue
        if len(words) < k:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        sh = np.unique(pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False))
        doc_ids.append(np.full(len(sh), did, dtype=np.int64))
        hashes.append(sh.astype(np.uint64))
        sizes.append(np.full(len(sh), len(sh), dtype=np.int64))
    if not doc_ids:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "sh": pd.Series(dtype="uint64"),
             "sz": pd.Series(dtype="int64")}
        )
    return pd.DataFrame(
        {id_col: np.concatenate(doc_ids), "sh": np.concatenate(hashes),
         "sz": np.concatenate(sizes)}
    )


def ngram_novelty(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> pd.DataFrame:
    """Per-document n-gram novelty (memorization screen): how much of each
    doc's distinct word-``k``-shingle set appears ANYWHERE else in the
    corpus. Returns (doc_id, n_shingles, n_dup_shingles) — the high-dup tail
    is the boilerplate/memorized-content cut in corpus curation.

    One shuffle: (doc, shingle-hash) rows groupby a coarse shingle bucket
    (hash co-location makes each shingle's full df computable per bucket
    with one vectorized ``transform``), per-bucket per-doc partial counts,
    then a doc-keyed Sum fold. No text enters either exchange."""
    n_buckets = 64

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        e = shingle_explode(b, id_col, text_col, k)
        e["bkt"] = (e["sh"] % np.uint64(n_buckets)).astype(np.int32)
        return e[[id_col, "sh", "bkt"]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_sh = g.groupby("sh")["sh"].transform("size")
        part = (
            g.assign(dup=(df_per_sh >= 2).astype(np.int64))
            .groupby(id_col, sort=False)
            .agg(n=("sh", "size"), ndup=("dup", "sum"))
            .reset_index()
        )
        # route partials to a coarse doc bucket: Ray's generic two-Sum
        # aggregate measured ~16x slower than this map_groups fold at sf0.1
        # (27.6 s -> 1.7 s end to end)
        part["dbkt"] = (part[id_col] % 64).astype(np.int32)
        return part.astype({id_col: "int64", "n": "int64", "ndup": "int64"})

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(id_col, sort=False)
            .agg(n_shingles=("n", "sum"), n_dup_shingles=("ndup", "sum"))
            .reset_index()
        )
        return out.astype({id_col: "int64", "n_shingles": "int64", "n_dup_shingles": "int64"})

    folded = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bkt")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("dbkt")
        .map_groups(fold_doc, batch_format="pandas")
    )
    pdf = folded.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "n_shingles": pd.Series(dtype="int64"),
             "n_dup_shingles": pd.Series(dtype="int64")}
        )
    return pdf.sort_values(id_col).reset_index(drop=True)


def containment_pairs(
    ds: rd.Dataset, threshold_num: int = 4, threshold_den: int = 5,
    text_col: str = "text", id_col: str = "doc_id", k: int = 3,
    max_df: int | None = None,
) -> pd.DataFrame:
    """EXACT containment-coefficient join: directed rows (src, dst) whenever
    den·|A∩B| ≥ num·|A| over word-``k``-shingle sets — the partial-copy
    detector Jaccard misses (a doc pasted into a much larger one scores low
    Jaccard but containment 1.0; Broder's resemblance-vs-containment split).

    Same distributed inverted-index shape as :func:`ngram_jaccard_exact`
    (shingle-hash explode → coarse-bucket vectorized self-merge → exact
    intersection counts via partial sums), but the filter CROSS-MULTIPLIES
    the rational threshold — entirely integer arithmetic end to end, so the
    SQL oracle has zero float-boundary risk. Asymmetric by design: each
    unordered pair is counted once and emitted in whichever direction(s)
    clear the threshold. ``max_df`` is the same stop-shingle scale valve."""
    n_buckets = 64

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return shingle_explode(batch, id_col, text_col, k)

    empty_partial = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "npart": pd.Series(dtype="int64"),
         "sa": pd.Series(dtype="int64"), "sb": pd.Series(dtype="int64"),
         "pkt": pd.Series(dtype="int32")}
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_sh = g.groupby("sh")["sh"].transform("size")
        keep = df_per_sh >= 2
        if max_df is not None:
            keep &= df_per_sh <= max_df
        g = g[keep]
        if len(g) < 2:
            return empty_partial
        m = g.merge(g, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if len(m) == 0:
            return empty_partial
        part = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False)
            .agg(npart=("sh", "size"), sa=("sz_a", "first"), sb=("sz_b", "first"))
            .reset_index()
            .rename(columns={f"{id_col}_a": "a_id", f"{id_col}_b": "b_id"})
        )
        part["pkt"] = ((part["a_id"] * 1_000_003 + part["b_id"]) % n_buckets).astype(np.int32)
        return part.astype({"a_id": "int64", "b_id": "int64", "npart": "int64"})

    out_empty = pd.DataFrame(
        {"src_id": pd.Series(dtype="int64"), "dst_id": pd.Series(dtype="int64"),
         "n_inter": pd.Series(dtype="int64"),
         "n_src": pd.Series(dtype="int64"), "n_dst": pd.Series(dtype="int64")}
    )

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["a_id", "b_id"], sort=False)
            .agg(ninter=("npart", "sum"), sa=("sa", "first"), sb=("sb", "first"))
            .reset_index()
        )
        num, den = threshold_num, threshold_den
        fwd = agg[den * agg["ninter"] >= num * agg["sa"]]
        rev = agg[den * agg["ninter"] >= num * agg["sb"]]
        return pd.concat(
            [
                pd.DataFrame({"src_id": fwd["a_id"], "dst_id": fwd["b_id"],
                              "n_inter": fwd["ninter"], "n_src": fwd["sa"],
                              "n_dst": fwd["sb"]}),
                pd.DataFrame({"src_id": rev["b_id"], "dst_id": rev["a_id"],
                              "n_inter": rev["ninter"], "n_src": rev["sb"],
                              "n_dst": rev["sa"]}),
            ],
            ignore_index=True,
        ) if len(fwd) + len(rev) else out_empty

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bkt"] = (batch["sh"] % np.uint64(n_buckets)).astype(np.int32)
        return batch

    pairs = (
        ds.map_batches(explode, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bkt")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pkt")
        .map_groups(reduce_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return out_empty
    return pdf.sort_values(["src_id", "dst_id"]).reset_index(drop=True)
