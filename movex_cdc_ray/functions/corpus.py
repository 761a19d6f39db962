"""Corpus-preparation operators for training-data pipelines. All are
first-class distributed ops with exact DuckDB value oracles; see
docs/SCALE.md "Corpus-operator family" for the three scale patterns.

- ``split_assign`` / ``hash_sample``: membership is a pure function of the
  row key (md5 bucket of ``"<id>:<seed>"``), so splits/samples are stable
  under re-runs, re-partitioning and incremental corpus growth — a nightly
  rebuild never migrates a document across splits or in/out of a sample.
- ``pack_sequences`` / ``epoch_shuffle``: a global ordinal (token offset /
  dense rank) via the distributed prefix-sum pattern — per-range-bucket
  aggregates (tiny driver table), broadcast bases, per-bucket placement.
- ``contamination_flags``: benchmark decontamination via a broadcast
  shingle-hash set + vectorized np.isin per batch (actor pool).
- ``top_tokens`` / ``mixture_rates``: combiner-shaped corpus statistics
  (per-batch partial folds before one small groupby).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from . import _pool
from .scalar import round_half_away, string_offsets_data

DEFAULT_SPLIT_WEIGHTS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}
SAMPLE_BUCKETS = 1_000_000  # hash-sample resolution: rates are exact to 1e-6


def split_edges(weights: dict[str, float], n_buckets: int) -> tuple[list[str], list[int]]:
    """(labels, cumulative integer bucket edges) for a weight map. The edges
    are integers so the Ray and SQL sides share exact boundaries."""
    labels = list(weights)
    total = sum(weights.values())
    edges, acc = [], 0.0
    for name in labels:
        acc += weights[name] / total
        edges.append(int(round(acc * n_buckets)))
    edges[-1] = n_buckets  # guard rounding drift: last label owns the tail
    return labels, edges


def _id_hashes(ids: pa.Array, seed: int) -> np.ndarray:
    """uint64 md5 hash of ``"<id>:<seed>"`` per row — same integer convention
    as DuckDB ``md5_number_upper`` (little-endian first 8 digest bytes), fed
    from the Arrow utf8 buffer via memoryview (no per-row Python strings)."""
    idstr = pc.binary_join_element_wise(pc.cast(ids, pa.string()), f":{seed}", "")
    if isinstance(idstr, pa.ChunkedArray):
        idstr = idstr.combine_chunks()
    offs, data = string_offsets_data(idstr)
    md5 = hashlib.md5
    out = np.empty(len(idstr), dtype=np.uint64)
    for i in range(len(idstr)):
        out[i] = int.from_bytes(md5(data[offs[i] : offs[i + 1]]).digest()[:8], "little")
    return out


def _id_buckets(ids: pa.Array, seed: int, n_buckets: int) -> np.ndarray:
    return _id_hashes(ids, seed) % n_buckets


def split_assign(
    ds: rd.Dataset,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 7,
    n_buckets: int = 10_000,
) -> rd.Dataset:
    """Assign every row a deterministic split label by hashed id bucket.

    Returns ``ds`` plus ``bucket`` (int64, 0..n_buckets-1) and ``split``
    (string) columns. Stateless ``map_batches`` — no shuffle, no state, and
    the assignment of a row never depends on which other rows exist."""
    labels, edges = split_edges(weights or DEFAULT_SPLIT_WEIGHTS, n_buckets)
    label_arr = np.array(labels, dtype=object)
    inner_edges = np.array(edges[:-1], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        buckets = _id_buckets(ids, seed, n_buckets)
        which = np.searchsorted(inner_edges, buckets, side="right")
        out = batch.append_column("bucket", pa.array(buckets.astype(np.int64)))
        return out.append_column("split", pa.array(label_arr[which], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def hash_sample(
    ds: rd.Dataset,
    rate: float,
    id_col: str = "doc_id",
    seed: int = 99,
    stratum_col: str | None = None,
    stratum_rates: dict[str, float] | None = None,
) -> rd.Dataset:
    """Deterministic sample: keep rows whose md5 id-bucket falls below
    ``rate * SAMPLE_BUCKETS``. Membership is a pure function of the id (and
    seed), so the sample is reproducible, stable under re-partitioning, and
    rows never enter/leave the sample as the corpus grows — the property a
    resumable 100 TB pipeline needs (re-runs skip finished partitions and
    still draw the identical sample). No shuffle, no driver state, no RNG.

    ``stratum_col``/``stratum_rates`` switch to stratified sampling: each
    stratum value gets its own rate (falling back to ``rate``), e.g.
    up-sample rare languages. The per-row threshold is a vectorized lookup
    against the (tiny) rate map — same hash, different cut per stratum."""
    thresholds = None
    if stratum_col is not None:
        rates = stratum_rates or {}
        thresholds = {k: int(round(v * SAMPLE_BUCKETS)) for k, v in rates.items()}
    default_thr = int(round(rate * SAMPLE_BUCKETS))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        buckets = _id_buckets(ids, seed, SAMPLE_BUCKETS)
        if thresholds is None:
            mask = buckets < default_thr
        else:
            strata = batch[stratum_col].to_pandas()
            thr = strata.map(thresholds).fillna(default_thr).to_numpy(dtype="int64")
            mask = buckets < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


class ContaminationStage:
    """Actor-pool stage: flag training docs sharing word-``k``-gram shingles
    with a benchmark set (train/test decontamination, the C4/Pile-style
    pre-training hygiene step).

    The benchmark's distinct shingle-hash set is broadcast ONCE via
    ``ray.put`` (see :func:`contamination_flags`); each actor fetches it in
    ``__init__`` (zero-copy numpy over the object store) and every batch is
    a vectorized ``np.isin`` against the sorted hash array. Partitioning
    assumption: benchmarks are small (1e5-1e7 grams) — the hash set lives
    comfortably in worker memory while the TRAINING side streams.

    Shingle hashes reuse the MinHash convention (md5 little-endian first 8
    bytes == DuckDB ``md5_number_upper``), so the whole check is
    SQL-value-checkable."""

    def __init__(self, bench_ref, k: int = 3, min_hits: int = 1,
                 text_col: str = "text", id_col: str = "doc_id",
                 mode: str = "flags"):
        from .dedup import MinHasher

        self.bench = ray.get(bench_ref)  # sorted uint64 hash array
        self.hasher = MinHasher(k=k)
        self.min_hits = min_hits
        self.text_col = text_col
        self.id_col = id_col
        if mode not in ("flags", "filter"):
            raise ValueError(f"mode must be 'flags' or 'filter', got {mode!r}")
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        n_hits = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = self.hasher.shingles(t)  # distinct hashes per doc
            n_hits[i] = int(np.isin(sh, self.bench, assume_unique=True).sum())
        if self.mode == "filter":  # pass through clean rows, all columns
            return batch[n_hits < self.min_hits]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "n_hits": n_hits,
                "contaminated": n_hits >= self.min_hits,
            }
        )


def contamination_flags(
    docs: rd.Dataset,
    benchmark: rd.Dataset,
    k: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    mode: str = "flags",
) -> rd.Dataset:
    """(doc_id, n_hits, contaminated) for every training doc: ``n_hits`` =
    distinct word-``k``-gram shingles shared with ``benchmark``.

    The benchmark side is folded to per-batch distinct hashes, uniqued on
    the driver (bounded by benchmark size, NOT corpus size) and broadcast
    once; the training side streams through an actor pool.
    ``mode='filter'`` instead streams the input rows through unchanged,
    dropping contaminated ones — the composable-pipeline form."""
    from .dedup import MinHasher

    hasher = MinHasher(k=k)

    def bench_hashes(b: pd.DataFrame) -> pd.DataFrame:
        hs = [hasher.shingles(t) for t in b[text_col].fillna("")]
        u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        return pd.DataFrame({"h": u})

    rows = benchmark.map_batches(bench_hashes, batch_format="pandas").take_all()
    merged = (
        np.unique(np.array([r["h"] for r in rows], dtype=np.uint64))
        if rows
        else np.empty(0, np.uint64)
    )  # np.unique returns sorted — ready for the actors' np.isin
    bench_ref = ray.put(merged)
    return docs.map_batches(
        ContaminationStage,
        fn_constructor_kwargs={
            "bench_ref": bench_ref,
            "k": k,
            "min_hits": min_hits,
            "text_col": text_col,
            "id_col": id_col,
            "mode": mode,
        },
        batch_format="pandas",
        concurrency=_pool.pool_size(concurrency),
    )


def mixture_rates(
    ds: rd.Dataset,
    targets: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Domain-reweighting rate table: per-source sampling rates that hit a
    target token MIXTURE under a total token budget (the Pile/DoReMi-style
    knob). One distributed aggregate (per-source doc/token counts — the
    source cardinality is tiny), then closed-form rates on the driver:

        rate_s = clip(target_s * budget / tokens_s, 0, 1)

    Feed the rates straight into :func:`hash_sample` (stratum_col=source)
    for a deterministic, growth-stable realization of the mixture.
    Returns (source, n_docs, n_tokens, rate) with rates rounded to 6."""
    def tokens(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.add(pc.count_substring(text, pattern=" "), 1).cast(pa.int64())
        n = pc.if_else(pc.equal(pc.utf8_length(text), 0), pa.scalar(0, pa.int64()), n)
        n = pc.coalesce(n, pa.scalar(0, pa.int64()))
        return pa.table({source_col: batch[source_col], "n_tokens": n})

    agg = (
        ds.map_batches(tokens, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
        .sort_values(source_col)
        .reset_index(drop=True)
    )
    total_target = sum(targets.values())
    rates = []
    for _, r in agg.iterrows():
        share = targets.get(r[source_col], 0.0) / total_target if total_target else 0.0
        want = share * token_budget
        rates.append(float(round_half_away(min(1.0, want / r["n_tokens"]) if r["n_tokens"] else 0.0)))
    agg["rate"] = rates
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    return agg


_TOKEN_RE = r"\w+"


def top_tokens(ds: rd.Dataset, k: int = 100, text_col: str = "text") -> rd.Dataset:
    """Corpus-level heavy hitters: the ``k`` most frequent ``\\w+`` tokens
    of lowercased text, ties broken by token asc (deterministic).

    Combiner shape: each batch folds its texts to a (token, n) partial count
    table first (vocabulary-sized, not token-stream-sized), then ONE groupby
    over partials; the final sort+limit runs on the aggregated vocabulary —
    orders of magnitude smaller than the corpus."""
    import re

    pat = re.compile(_TOKEN_RE)

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        toks = texts.str.lower().str.findall(pat).explode().dropna()
        if toks.empty:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    vocab = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    return vocab.sort(["n", "token"], descending=[True, False]).limit(k)


def epoch_shuffle(
    ds: rd.Dataset,
    epoch: int = 0,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> rd.Dataset:
    """Deterministic global training-order shuffle: every row gets a dense
    rank ``pos`` (0..n-1) in the order ``(md5(id:epoch), id)`` — a different
    but fully reproducible permutation per epoch, with NO RNG and no
    ``random_shuffle`` materialization.

    Distributed rank via range-partitioned prefix sum: rows bucket by the
    hash's high bits (order-aligned ranges of the hash space), per-bucket
    counts make a tiny driver table, cumulative bases are broadcast, and
    each bucket sorts only its own rows (corpus/n_buckets each) before
    adding its base. ``n_buckets`` is a JOB parameter — size it so a
    bucket's rows fit one task (1024 buckets over 10^10 rows ≈ 10^7
    rows/bucket)."""
    shift = np.uint64(64 - int(np.log2(n_buckets)))
    if 1 << (64 - int(shift)) != n_buckets:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")

    def hash_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _id_hashes(ids, epoch)
        return pa.table(
            {
                id_col: ids,
                "h": pa.array(h, pa.uint64()),
                "hb": pa.array((h >> shift).astype(np.int64)),
            }
        )

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow").materialize()
    counts = hashed.groupby("hb").aggregate(Count(alias_name="n")).take_all()
    counts.sort(key=lambda r: r["hb"])
    base: dict[int, int] = {}
    acc = 0
    for r in counts:
        base[int(r["hb"])] = acc
        acc += int(r["n"])
    base_ref = ray.put(base)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        start = ray.get(base_ref)[int(g["hb"].iloc[0])]
        g = g.sort_values(["h", id_col])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "pos": start + np.arange(len(g), dtype=np.int64),
            }
        )

    return hashed.groupby("hb").map_groups(rank_bucket, batch_format="pandas")


def pack_sequences(
    ds: rd.Dataset,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = 4096,
) -> rd.Dataset:
    """GPT-style sequence packing: documents concatenated in ``id_col`` order
    form one token stream chunked every ``budget`` tokens; each document is
    placed in the pack where it starts.

    Returns (id, n_tokens, pack_id, pack_offset). Token count = whitespace
    tokens (``TokenCounter``'s n_tokens semantics, shared with the
    text_tokens oracle). ``range_size`` is a JOB parameter: ids are bucketed
    into ``id // range_size`` ranges; per-range token sums (3-int rows) are
    the only driver-side table, so pick range_size so that
    max_id / range_size stays ~1e5-1e6 at corpus scale."""
    def tokens(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.add(pc.count_substring(text, pattern=" "), 1).cast(pa.int64())
        n = pc.if_else(pc.equal(pc.utf8_length(text), 0), pa.scalar(0, pa.int64()), n)
        n = pc.coalesce(n, pa.scalar(0, pa.int64()))
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rb = pc.divide(ids.cast(pa.int64()), pa.scalar(range_size, pa.int64()))
        return pa.table({id_col: ids, "n_tokens": n, "rb": rb})

    # (id, n_tokens, range_bucket) — 24 bytes/doc, kept distributed in the
    # object store; materialized because both the sum pass and the placement
    # pass consume it
    tok = ds.map_batches(tokens, batch_format="pyarrow").materialize()
    sums = tok.groupby("rb").aggregate(Sum("n_tokens", alias_name="tok_sum")).take_all()
    sums.sort(key=lambda r: r["rb"])
    base: dict[int, int] = {}
    acc = 0
    for r in sums:
        base[int(r["rb"])] = acc
        acc += int(r["tok_sum"])
    base_ref = ray.put(base)

    empty = pd.DataFrame(
        {
            id_col: pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "pack_id": pd.Series([], dtype="int64"),
            "pack_offset": pd.Series([], dtype="int64"),
        }
    )

    def place(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # Ray may hand map_groups an empty sentinel block
            return empty
        start = ray.get(base_ref)[int(g["rb"].iloc[0])]
        g = g.sort_values(id_col)
        ntok = g["n_tokens"].to_numpy()
        off = start + np.cumsum(ntok) - ntok
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": ntok,
                "pack_id": (off // budget).astype("int64"),
                "pack_offset": (off % budget).astype("int64"),
            }
        )

    return tok.groupby("rb").map_groups(place, batch_format="pandas")


def bottom_k_sample(ds: rd.Dataset, k: int, id_col: str = "doc_id") -> rd.Dataset:
    """Exact-size deterministic uniform sample: the k smallest
    md5(CAST(id AS VARCHAR)) order statistics win (bottom-k / KMV).

    Complements ``hash_sample`` (rate-based, size ∝ corpus): bottom-k
    guarantees EXACTLY k rows regardless of corpus size, with the same
    determinism/growth-stability (a new doc only enters by evicting the
    current largest hash). Distributed shape: every batch folds to its own
    bottom-k inside ``map_batches`` — at most k rows leave any batch, so
    the final sort+limit runs over ≤ k·n_blocks rows, never the corpus.

    md5 is fed from the Arrow buffer of the stringified id (no per-row
    Python string objects)."""
    import functools

    partial = functools.partial(bottom_k_partial, k=k, id_col=id_col)
    return ds.map_batches(partial, batch_format="pyarrow").sort("sample_hash").limit(k)


def bottom_k_partial(batch: pa.Table, k: int, id_col: str = "doc_id") -> pa.Table:
    """Per-batch bottom-k fold for ``bottom_k_sample`` — module-level so the
    '≤ k rows leave any batch' invariant is directly testable. Payload
    columns ride along (the sampled quantile sketch needs the sampled
    rows' values, not just their ids)."""
    md5 = hashlib.md5
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    s = pc.cast(ids, pa.string())
    offs, data = string_offsets_data(s)
    n = len(s)
    hx = np.empty(n, dtype=object)
    for i in range(n):
        hx[i] = md5(data[offs[i] : offs[i + 1]]).hexdigest()
    t = batch.append_column("sample_hash", pa.array(hx, pa.string()))
    idx = pc.sort_indices(t, sort_keys=[("sample_hash", "ascending")])
    return t.take(idx[:k])


def weighted_sample_es(
    ds: rd.Dataset, k: int, weight_col: str, id_col: str = "doc_id"
) -> rd.Dataset:
    """Exact-size deterministic WEIGHTED sample (Efraimidis-Spirakis 2006):
    the k largest ln(u_i)/w_i keys win, where u_i is the md5-uniform of the
    id — inclusion probability ∝ weight, reproducible, mergeable across
    shards like ``bottom_k_sample`` (union + re-trim). Rows with weight
    <= 0 are dropped in the fold and can never be drawn — if fewer than k
    positive-weight rows exist, the sample is smaller than k.

    Same bounded-fold shape: each batch keeps its own top-k keys, the
    global sort+limit touches ≤ k·n_blocks rows. The ln-transform of the
    classical u^(1/w) key is order-equivalent and avoids pow()
    (one libm call per row instead of two — and it is the form the SQL
    oracle reproduces exactly)."""
    import functools

    partial = functools.partial(_es_partial, k=k, weight_col=weight_col, id_col=id_col)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("es_key", descending=True)
        .limit(k)
    )


def _es_partial(batch: pa.Table, k: int, weight_col: str, id_col: str) -> pa.Table:
    """Per-batch E-S top-k fold: u from md5 bytes [0:4] of the stringified
    id (the exact dyadic (h+1)/2^32 the SQL oracle re-derives), key =
    ln(u)/w, keep the batch's k largest."""
    md5 = hashlib.md5
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    s = pc.cast(ids, pa.string())
    offs, data = string_offsets_data(s)
    n = len(s)
    h = np.empty(n, dtype=np.int64)
    for i in range(n):
        h[i] = int.from_bytes(md5(data[offs[i] : offs[i + 1]]).digest()[:4], "big")
    u = (h.astype(np.float64) + 1.0) / 4294967296.0  # (h+1)/2^32 in (0, 1]
    w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
    # drop non-positive weights HERE: a -inf sentinel would still win a
    # slot whenever a batch holds fewer than k positive-weight rows,
    # breaking the 'never drawn' contract
    pos = w > 0
    with np.errstate(divide="ignore"):
        key = np.log(u[pos]) / w[pos]
    t = batch.filter(pa.array(pos)).append_column("es_key", pa.array(key, pa.float64()))
    idx = pc.sort_indices(t, sort_keys=[("es_key", "descending")])
    return t.take(idx[:k])


def merge_samples(parts: list[pd.DataFrame], k: int, key: str = "sample_hash",
                  ascending: bool = True) -> pd.DataFrame:
    """Cross-shard / cross-day sample merge — the 'union + re-trim' the
    bottom-k and E-S docstrings promise, as an explicit helper: because
    each row's key is a pure function of the row, the merged top/bottom-k
    of per-shard samples EQUALS the sample drawn from the union corpus
    (tested). ``ascending=True`` re-trims bottom-k (``sample_hash``);
    ``ascending=False`` re-trims E-S (``es_key``)."""
    merged = pd.concat(parts, ignore_index=True).drop_duplicates()
    merged = merged.sort_values(key, ascending=ascending, kind="mergesort")
    return merged.head(k).reset_index(drop=True)


def cap_per_group(
    ds: rd.Dataset,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 23,
) -> rd.Dataset:
    """Per-group quota (domain capping): keep at most ``cap`` rows per
    ``group_col`` value, selected as the ``cap`` smallest md5("<id>:<seed>")
    order statistics within the group — a uniform, reproducible draw with
    no RNG (the bottom-k sample, partitioned by group).

    Scale shape: a per-batch head-cap fold first (at most
    batch_groups x cap rows leave any batch), then ONE group-hash groupby
    re-trims — the same bounded union-then-re-trim merge ``merge_samples``
    proves for bottom-k, so the capped set is independent of sharding.
    A mega-domain never concentrates: its survivors are cap rows total,
    and each merge input is bounded by blocks x cap."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _id_hashes(pa.array(batch[id_col]), seed)
        b = batch.assign(_qh=h)
        b = b.sort_values([group_col, "_qh", id_col], kind="mergesort")
        return b.groupby(group_col, sort=False, dropna=False).head(cap)

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_qh", id_col], kind="mergesort").head(cap)
        return g.drop(columns=["_qh"])

    part = ds.map_batches(partial, batch_format="pandas")
    return part.groupby(group_col).map_groups(trim, batch_format="pandas")


def chunk_documents(
    ds: rd.Dataset,
    chunk_chars: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Fixed-window document chunking with overlap (the long-document
    stage before tokenize/pack): chunk ``k`` covers codepoints
    ``[k*stride, k*stride + chunk_chars)``; a doc yields
    ``ceil(len/stride)`` chunks (empty/null text yields none). Stateless
    flat map — no shuffle, no state; vectorized as one ``str.slice`` per
    chunk INDEX (not per chunk), so a batch pays max_chunks C-loop passes."""
    if stride < 1 or chunk_chars < stride:
        raise ValueError("need stride >= 1 and chunk_chars >= stride")

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        lens = t.str.len().to_numpy(dtype=np.int64)
        ids = batch[id_col].to_numpy()
        frames = []
        kmax = int(-(-int(lens.max()) // stride)) if len(lens) else 0
        for k in range(kmax):
            m = lens > k * stride
            if not m.any():
                break
            sub = t[m].str.slice(k * stride, k * stride + chunk_chars)
            frames.append(
                pd.DataFrame(
                    {
                        id_col: ids[m],
                        "chunk_idx": np.full(int(m.sum()), k, dtype=np.int64),
                        "chunk_text": sub.to_numpy(),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "chunk_idx": pd.Series(dtype="int64"),
                    "chunk_text": pd.Series(dtype="object"),
                    "n_chunk_chars": pd.Series(dtype="int64"),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        out["n_chunk_chars"] = out["chunk_text"].str.len().astype("int64")
        return out

    return ds.map_batches(chunks, batch_format="pandas")


def quality_cut_per_group(
    scored: rd.Dataset,
    score_col: str = "n_words",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-group quality cut at the median-low order statistic: within each
    ``group_col`` value keep rows whose ``score_col`` >= the group's
    ((n+1)//2)-th smallest score — the deterministic, SQL-checkable analog
    of "drop the bottom half of each domain by quality" (per-domain
    percentile filtering, the CCNet/DCLM shape; a global cut would let one
    high-quality domain crowd out every other).

    Scale shape (two-pass threshold-broadcast): pass 1 computes thresholds
    from the NARROW (group, score) projection — the only exchange is
    group-keyed and carries two columns; the threshold table is one row
    per group, collected to the driver like any broadcast small side and
    shipped once via ``ray.put``. Pass 2 streams the corpus through a
    vectorized lookup filter — no second shuffle, rows never move.
    The threshold is a VALUE at a rank, so tie order inside a group
    cannot change it."""

    def thr(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[score_col].to_numpy())
        k = (len(v) + 1) // 2
        return pd.DataFrame({group_col: [g[group_col].iloc[0]], "thr": [v[k - 1]]})

    thresholds = (
        scored.select_columns([group_col, score_col])
        .groupby(group_col)
        .map_groups(thr, batch_format="pandas")
        .to_pandas()
    )
    if thresholds.empty:  # empty input: nothing to cut, stream through
        return scored
    side = ray.put(dict(zip(thresholds[group_col], thresholds["thr"])))

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        t = b[group_col].map(ray.get(side))
        return b[b[score_col].to_numpy() >= t.to_numpy()]

    return scored.map_batches(cut, batch_format="pandas")


def dsir_importance(
    ds: rd.Dataset,
    target_lang: str = "en",
    m: int = 256,
    alpha: float = 0.5,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> rd.Dataset:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-n-gram bag is under the TARGET
    distribution than under the raw-corpus distribution —
    ``log w(x) = Σ_b c_b(x)·(ln p̂_b − ln q̂_b)`` over ``m`` hash buckets of
    word uni+bigrams with add-α smoothing. Downstream selection composes
    with ``weighted_sample_es`` / top-k, exactly as the paper resamples.

    Distributed shape (two passes, no corpus shuffle):
      * Count pass — each batch folds its grams to ≤ m (bucket, n_target,
        n_all) partial rows before ONE m-sized groupby; the target is the
        ``lang == target_lang`` slice (a SAMPLE of the target domain at
        scale), counted in the same pass as the raw totals.
      * λ broadcast — the per-bucket log-ratio compresses to an m-vector of
        int64 MICRO-UNITS (``round_half_away(λ·10⁶)``): the only float
        arithmetic is the per-bucket ``ln`` evaluated identically by numpy
        and the SQL oracle; every per-document fold is then exact integer
        summation, so NO float summation order exists anywhere.
      * Score pass — stateless map; gram→bucket md5 hashes memoized per
        actor (vocabulary-sized, same convention as DuckDB
        ``md5_number_upper``: little-endian first 8 digest bytes).

    Output columns: ``doc_id``, ``n_grams`` (uni+bigram occurrences),
    ``log_weight_micro`` (Σ c_b·λ_b in 1e-6 log units, int64)."""
    import re

    word_re = re.compile(r"[a-z0-9_]+")

    def _grams(batch: pd.DataFrame) -> pd.DataFrame:
        """(doc ordinal, gram) long frame: unigrams + space-joined bigrams."""
        toks = batch[text_col].reset_index(drop=True).fillna("").str.lower().str.findall(word_re)
        ex = toks.explode().dropna()
        if ex.empty:
            return pd.DataFrame({"doc": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype=object)})
        uni = pd.DataFrame({"doc": ex.index.to_numpy(dtype="int64"), "g": ex.values})
        f = uni.copy()
        w2 = f.groupby("doc")["g"].shift(-1)
        bi = f[w2.notna()]
        bi = pd.DataFrame({"doc": bi["doc"].to_numpy(),
                           "g": bi["g"].to_numpy() + " " + w2.dropna().to_numpy()})
        return pd.concat([uni, bi], ignore_index=True)

    class GramHasher:
        """Per-actor gram→bucket memo; md5 little-endian first-8 == DuckDB
        ``md5_number_upper``, modulo m."""

        def __init__(self, m: int):
            self.m = m
            self.memo: dict[str, int] = {}

        def buckets(self, grams: pd.Series) -> np.ndarray:
            memo, md5, mm = self.memo, hashlib.md5, self.m
            uniq = grams.unique()
            for g in uniq:
                if g not in memo:
                    memo[g] = int.from_bytes(md5(g.encode()).digest()[:8], "little") % mm
            return grams.map(memo).to_numpy(dtype="int64")

    class CountStage(GramHasher):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            f = _grams(batch)
            if f.empty:
                return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                     "n_all": pd.Series([], dtype="int64"),
                                     "n_target": pd.Series([], dtype="int64")})
            is_t = (batch[lang_col].reset_index(drop=True) == target_lang).to_numpy()
            f["bucket"] = self.buckets(f["g"])
            f["t"] = is_t[f["doc"].to_numpy()].astype("int64")
            agg = f.groupby("bucket").agg(n_all=("t", "size"), n_target=("t", "sum"))
            return agg.reset_index()

    counts = (
        ds.map_batches(CountStage, fn_constructor_args=(m,), batch_format="pandas",
                       concurrency=_pool.pool_size(4))
        .groupby("bucket")
        .aggregate(Sum("n_all", alias_name="n_all"), Sum("n_target", alias_name="n_target"))
        .to_pandas()
    )
    n_all = np.zeros(m, dtype="int64")
    n_tgt = np.zeros(m, dtype="int64")
    if not counts.empty:
        b = counts["bucket"].to_numpy(dtype="int64")
        n_all[b] = counts["n_all"].to_numpy(dtype="int64")
        n_tgt[b] = counts["n_target"].to_numpy(dtype="int64")
    p_tot, q_tot = int(n_tgt.sum()), int(n_all.sum())
    lam = (np.log((n_tgt + alpha) / (p_tot + alpha * m))
           - np.log((n_all + alpha) / (q_tot + alpha * m)))
    lam_int = round_half_away(lam * scale, 0).astype("int64")  # micro-units

    class ScoreStage(GramHasher):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            f = _grams(batch)
            out = pd.DataFrame({id_col: batch[id_col].to_numpy()})
            if f.empty:
                out["n_grams"] = np.int64(0)
                out["log_weight_micro"] = np.int64(0)
                return out
            lam_g = lam_int[self.buckets(f["g"])]
            g = pd.DataFrame({"doc": f["doc"].to_numpy(), "l": lam_g}).groupby("doc")["l"]
            docs = pd.RangeIndex(len(batch))
            out["n_grams"] = g.size().reindex(docs, fill_value=0).astype("int64").values
            out["log_weight_micro"] = g.sum().reindex(docs, fill_value=0).astype("int64").values
            return out

    return ds.map_batches(ScoreStage, fn_constructor_args=(m,), batch_format="pandas",
                          concurrency=_pool.pool_size(4))


def domain_divergence(
    ds: rd.Dataset,
    target_lang: str = "en",
    m: int = 256,
    alpha: float = 0.5,
    text_col: str = "text",
    lang_col: str = "lang",
) -> pd.DataFrame:
    """Per-bucket Jensen-Shannon divergence contributions between the
    ``lang == target_lang`` slice and the REST of the corpus — the
    domain-shift / mixture diagnostic a data pipeline runs before reweighting
    (the distributions are the same hashed uni+bigram bucket models DSIR
    trains). The count pass is the dsir_importance fold (≤ m partial rows
    per batch, one m-sized groupby); the JS terms are computed per bucket
    from exact integer counts and shipped as int64 MICRO-NATS — returning
    per-bucket rows instead of one total means NO cross-bucket float sum
    exists, so the oracle compare is exact. Σ contrib_micro / 10⁶ is the
    JS divergence in nats (driver-side display only)."""
    import re

    word_re = re.compile(r"[a-z0-9_]+")

    class CountStage:
        def __init__(self):
            self.memo: dict[str, int] = {}

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].reset_index(drop=True).fillna("").str.lower().str.findall(word_re)
            ex = toks.explode().dropna()
            if ex.empty:
                return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                     "n_a": pd.Series([], dtype="int64"),
                                     "n_b": pd.Series([], dtype="int64")})
            uni = pd.DataFrame({"doc": ex.index.to_numpy(dtype="int64"), "g": ex.values})
            w2 = uni.groupby("doc")["g"].shift(-1)
            bi = uni[w2.notna()]
            f = pd.concat(
                [uni, pd.DataFrame({"doc": bi["doc"].to_numpy(),
                                    "g": bi["g"].to_numpy() + " " + w2.dropna().to_numpy()})],
                ignore_index=True,
            )
            memo, md5 = self.memo, hashlib.md5
            for g in f["g"].unique():
                if g not in memo:
                    memo[g] = int.from_bytes(md5(g.encode()).digest()[:8], "little") % m
            f["bucket"] = f["g"].map(memo).astype("int64")
            is_a = (batch[lang_col].reset_index(drop=True) == target_lang).to_numpy()
            f["a"] = is_a[f["doc"].to_numpy()].astype("int64")
            agg = f.groupby("bucket").agg(n=("a", "size"), n_a=("a", "sum"))
            agg["n_b"] = agg["n"] - agg["n_a"]
            return agg.reset_index()[["bucket", "n_a", "n_b"]]

    counts = (
        ds.map_batches(CountStage, batch_format="pandas", concurrency=_pool.pool_size(4))
        .groupby("bucket")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .to_pandas()
    )
    n_a = np.zeros(m, dtype="int64")
    n_b = np.zeros(m, dtype="int64")
    if not counts.empty:
        idx = counts["bucket"].to_numpy(dtype="int64")
        n_a[idx] = counts["n_a"].to_numpy(dtype="int64")
        n_b[idx] = counts["n_b"].to_numpy(dtype="int64")
    ta, tb = int(n_a.sum()), int(n_b.sum())
    p = (n_a + alpha) / (ta + alpha * m)
    q = (n_b + alpha) / (tb + alpha * m)
    mid = (p + q) / 2.0
    contrib = 0.5 * p * np.log(p / mid) + 0.5 * q * np.log(q / mid)
    return pd.DataFrame(
        {"bucket": np.arange(m, dtype="int64"),
         "n_a": n_a, "n_b": n_b,
         "js_contrib_micro": round_half_away(contrib * 1_000_000, 0).astype("int64")}
    )
