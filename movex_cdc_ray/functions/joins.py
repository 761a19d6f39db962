"""Skew-aware distributed equi-join building blocks.

The portable Ray Data join shape (tag both sides with the same declared
schema → union → per-bucket pandas merge inside ``groupby().map_groups``,
see ``pipelines/queries.py:join_hash``) collapses when one key owns a large
share of the fact side: every row of a hot key lands in ONE reduce task and
the stage's wall-clock becomes that task. The standard fix is SALTING:

* fact rows of a hot key fan out over ``n_salt`` sub-partitions (salt drawn
  deterministically from a caller-named column, never an RNG);
* dim rows of a hot key are REPLICATED into all ``n_salt`` sub-partitions
  (bounded: |hot| × n_salt extra rows — hot sets are by construction tiny);
* cold keys keep salt 0, so the non-skewed path pays nothing.

Hot-key detection is a routing decision, not a correctness one: any hot set
(including a wrong or empty one) produces the identical join result, only
the partition balance changes. That property is what makes the approximate
``heavy_keys`` pass safe.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _i64(t: pa.Table, name: str) -> pa.Array:
    c = t[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.cast(pa.int64())


def heavy_keys(
    ds: rd.Dataset, key: str, top: int = 16, per_batch: int = 64
) -> dict[int, int]:
    """Approximate heavy hitters of ``key``: each batch ships only its local
    top-``per_batch`` (key, n) counts (a mergeable-summary partial — the
    exchange is O(batches × per_batch), independent of the key domain), the
    driver folds them and keeps the global top-``top``.

    Counts are LOWER BOUNDS (a key missing from some batch's local top-k
    under-counts), which is the right direction for ROUTING: a key only
    enters the hot set when it is unmistakably heavy. Correctness of
    :func:`salted_hash_join` never depends on this set."""

    def local_top(t: pa.Table) -> pa.Table:
        vc = pd.Series(_i64(t, key).to_numpy(zero_copy_only=False)).value_counts()
        vc = vc.iloc[:per_batch]
        return pa.table(
            {"k": pa.array(vc.index.to_numpy(dtype="int64")),
             "n": pa.array(vc.to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(local_top, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    folded = folded.sort_values(["n", "k"], ascending=[False, True]).head(top)
    return {int(k): int(n) for k, n in zip(folded["k"], folded["n"])}


def salted_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    salt_source: str,
    hot_keys: Iterable[int] = (),
    n_salt: int = 8,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Skew-aware inner equi-join on an int64 key. Returns a Dataset with
    columns ``["key"] + left_cols + right_cols``.

    Routing: group = (key mod n_buckets) · n_salt + salt, where salt is
    ``salt_source mod n_salt`` for hot left rows (deterministic — no RNG),
    0 for cold left rows, and 0..n_salt−1 (replicated) for hot right rows.
    Every (left row, right row) pair of a key therefore meets in exactly
    one group; the result is independent of the hot set."""
    hot = np.sort(np.fromiter((int(k) for k in hot_keys), dtype=np.int64))
    hot_ref = ray.put(hot)

    def _is_hot(k: np.ndarray) -> np.ndarray:
        h = ray.get(hot_ref)
        if len(h) == 0:
            return np.zeros(len(k), dtype=bool)
        pos = np.searchsorted(h, k)
        return (pos < len(h)) & (h[np.clip(pos, 0, len(h) - 1)] == k)

    l_set, r_set = list(left_cols), list(right_cols)
    l_schema: pa.Schema = left.schema().base_schema
    r_schema: pa.Schema = right.schema().base_schema

    def _base(t: pa.Table, k: np.ndarray, salt: np.ndarray, side: str) -> pa.Table:
        cols: dict[str, pa.Array] = {
            "g": pa.array((k % n_buckets) * n_salt + salt),
            "key": pa.array(k),
            "side": pa.array([side] * len(k), pa.string()),
        }
        for c in l_set:
            cols[c] = (t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]) \
                if side == "L" else pa.nulls(len(k), l_schema.field(c).type)
        for c in r_set:
            cols[c] = (t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]) \
                if side == "R" else pa.nulls(len(k), r_schema.field(c).type)
        return pa.table(cols)

    def tag_left(t: pa.Table) -> pa.Table:
        k = _i64(t, left_on).to_numpy(zero_copy_only=False)
        salt = np.zeros(len(k), dtype=np.int64)
        hot_mask = _is_hot(k)
        if hot_mask.any():
            src = _i64(t, salt_source).to_numpy(zero_copy_only=False)
            salt[hot_mask] = np.abs(src[hot_mask]) % n_salt
        return _base(t, k, salt, "L")

    def tag_right(t: pa.Table) -> pa.Table:
        k = _i64(t, right_on).to_numpy(zero_copy_only=False)
        hot_mask = _is_hot(k)
        cold = _base(t.filter(pa.array(~hot_mask)), k[~hot_mask],
                     np.zeros(int((~hot_mask).sum()), dtype=np.int64), "R")
        if not hot_mask.any():
            return cold
        hot_t = t.filter(pa.array(hot_mask))
        hk = k[hot_mask]
        reps = [
            _base(hot_t, hk, np.full(len(hk), s, dtype=np.int64), "R")
            for s in range(n_salt)
        ]
        return pa.concat_tables([cold, *reps])

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [("key", pa.int64())]
        + [(c, l_schema.field(c).type) for c in l_set]
        + [(c, r_schema.field(c).type) for c in r_set]
    )

    def join_group(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "side" not in g.columns:
            return out_schema.empty_table()
        lf = g[g["side"] == "L"][["key", *l_set]]
        rt = g[g["side"] == "R"][["key", *r_set]]
        if lf.empty or rt.empty:
            return out_schema.empty_table()
        j = lf.merge(rt, on="key", how="inner")
        return pa.Table.from_pandas(j, schema=out_schema, preserve_index=False)

    return both.groupby("g").map_groups(join_group, batch_format="pandas")
