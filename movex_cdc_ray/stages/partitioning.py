"""Key-hash partition assignment + hot-key salting (SURVEY.md §4 "Skew").

The reference assigns each keyed event to exactly one worker thread via
``MOD(ORA_HASH(Msg_Key, 1000000), worker_count) = worker_id``
(`app/models/transfer_thread.rb:239-242`, operator S2); unkeyed events are
processed by any worker in any order (`:331-349`, operator S3). Here the same
ownership property comes from a deterministic hash shuffle: every event gets a
``part`` column, and ``groupby("part")`` gives each partition exactly one
merge task per epoch.

Hot keys (the mega-repo skew profile) additionally get a ``salt`` column so a
two-stage groupby — stage 1 combine per (part, salt), stage 2 merge per part —
parallelizes what would otherwise be one straggler task. This is sound because
the lake merge is an arg-max-by-id reduction (last-writer-wins), which is
associative and commutative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalar import hash_strings


def assign_partitions(
    batch: pa.Table,
    num_partitions: int,
    key_col: str = "key_string",
    salt_factor: int = 0,
    hot_keys: frozenset[str] | None = None,
) -> pa.Table:
    """Append ``part`` (int32) and, if salting, ``salt`` (int32).

    Keyed rows: ``part = hash(key) % P`` — stable across runs and processes
    (exactly-once replay depends on it). Unkeyed rows (NULL key, the
    reference's step-2/3 readers): ``part = hash(id) % P`` round-robin.
    ``salt`` is 0 except for rows whose key is in ``hot_keys``, which spread
    over ``hash(id) % salt_factor`` sub-groups.
    """
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys_np = keys.to_numpy(zero_copy_only=False)
    ids = batch["id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)

    h = hash_strings(keys_np)
    unkeyed = pd.isna(keys_np)
    if unkeyed.any():
        h = np.where(unkeyed, ids_np.astype(np.uint64), h)
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    out = batch.append_column("part", pa.array(part))

    if salt_factor and hot_keys:
        is_hot = np.isin(keys_np, list(hot_keys))
        salt = np.where(is_hot, (ids_np % salt_factor), 0).astype(np.int32)
        out = out.append_column("salt", pa.array(salt))
    return out


def detect_hot_keys(ds, key_col: str = "key_string", threshold: int = 50_000) -> frozenset[str]:
    """Per-epoch hot-key detection: keys whose event count exceeds ``threshold``.

    Implemented as partial per-batch counts (combiner) + a small groupby over
    the partials — the 'pre-aggregate inside map_batches before a groupby'
    pattern; the full stream is never shuffled to count keys.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        vc = pc.value_counts(keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
        return pa.table({key_col: vc.field("values"), "n": vc.field("counts")})

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    counts = partials.groupby(key_col).aggregate(Sum("n", alias_name="n"))
    import pyarrow as _pa

    def over_threshold(batch: pa.Table) -> pa.Table:
        n = batch["n"].combine_chunks() if isinstance(batch["n"], _pa.ChunkedArray) else batch["n"]
        return batch.filter(pc.greater_equal(pc.fill_null(n, 0), threshold))

    hot = counts.map_batches(over_threshold, batch_format="pyarrow")
    return frozenset(r[key_col] for r in hot.take_all() if r[key_col] is not None)


def combine_last_per_key(batch: pa.Table, key_col: str = "key_string") -> pa.Table:
    """Within-batch combiner: keep only each key's max-id event.

    Because the final lake state per key is the arg-max-by-id event (with
    delete = tombstone), superseded events can be dropped BEFORE the shuffle —
    this collapses a hot key's millions of events to one row per batch and is
    the main defense against shuffle volume and skew at 10^10-event scale.
    NULL-key rows (unkeyed tables) pass through untouched.
    """
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if len(batch) == 0 or keys.null_count == len(batch):
        return batch
    gb = pa.table({"k": keys, "id": batch["id"]}).group_by("k").aggregate([("id", "max")])
    max_ids = gb["id_max"]
    mask = pc.is_in(batch["id"], value_set=max_ids.combine_chunks())
    if keys.null_count:
        mask = pc.or_(mask, pc.is_null(keys))
    return batch.filter(mask)
