"""Corpus-preparation operators for training-data pipelines: deterministic
train/val/test splitting and GPT-style sequence packing.

Both are first-class distributed ops with exact DuckDB value oracles:

- ``split_assign``: membership is a pure function of the row key (md5 bucket
  of ``"<id>:<seed>"``), so the split is stable under re-runs, re-partitioning
  and incremental corpus growth — the property a 100 TB pipeline needs so a
  nightly rebuild never migrates a document across splits.
- ``pack_sequences``: concatenate documents in id order into one token
  stream and chunk it every ``budget`` tokens (each document belongs to the
  pack where it starts). The global prefix sum is computed distributed:
  per-range-bucket token sums (one small aggregate), a driver-side scan over
  the tiny bucket table, then per-bucket placement in ``map_groups`` with
  the broadcast base offsets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .scalar import string_offsets_data

DEFAULT_SPLIT_WEIGHTS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


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


def _id_buckets(ids: pa.Array, seed: int, n_buckets: int) -> np.ndarray:
    """md5 bucket of ``"<id>:<seed>"`` per row — same integer convention as
    DuckDB ``md5_number_upper`` (little-endian first 8 digest bytes), fed
    from the Arrow utf8 buffer via memoryview (no per-row Python strings)."""
    idstr = pc.binary_join_element_wise(pc.cast(ids, pa.string()), f":{seed}", "")
    if isinstance(idstr, pa.ChunkedArray):
        idstr = idstr.combine_chunks()
    offs, data = string_offsets_data(idstr)
    md5 = hashlib.md5
    out = np.empty(len(idstr), dtype=np.uint64)
    for i in range(len(idstr)):
        out[i] = (
            int.from_bytes(md5(data[offs[i] : offs[i + 1]]).digest()[:8], "little")
            % n_buckets
        )
    return out


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
