"""The epoch driver: binlog replay → converged lake table (SURVEY.md §3.1).

One epoch = one exactly-once transaction, mirroring the reference's worker
cycle `ActiveRecord txn { read batch → produce to Kafka txn → delete shipped
}` (`app/models/transfer_thread.rb:53-99`):

    read_parquet(epoch chunks)                      # S1
    → map_batches(CaptureStage, pyarrow, zero-copy) # M2-M10, schema evolution
    → map_batches(assign_partitions + combiner)     # S2 hash slice + pre-agg
    [→ groupby(part, salt).map_groups(combine)]     # stage-1 skew merge
    → groupby(part).map_groups(EpochMerger)         # sort, dedup, merge, stage
    → driver commits manifest (epoch barrier)       # S5/S6 Kafka txn + DELETE

The ONLY all-to-all exchange is the groupby("part") hash shuffle; the
combiner collapses superseded events per batch first, so shuffle volume is
bounded by (#distinct keys touched per epoch), not event count.

Resume: `Manifest.latest()` → skip consumed chunks; a re-run of a partially
committed epoch overwrites the same staged paths and converges byte-identically
(idempotence test in tests/test_exactly_once.py).
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import CaptureConfig
from ..sources.stream import epoch_batches, pending_chunks, read_chunks
from ..stages.capture import CaptureStage, sink_key_spec
from ..stages.errors import consume_retry_files, pending_retry_files
from ..stages.partitioning import assign_partitions, combine_last_per_key
from ..stages.sink import (
    MergeContext,
    lake_table_schema,
    make_epoch_merger,
    merge_partition_files,
)
from ..state.manifest import Manifest, new_writer_token, staged_path

logger = logging.getLogger(__name__)

_AGG_KEYS = (
    "events_in",
    "events_below_watermark",
    "events_success",
    "events_d_and_c_retries",
    "events_delayed_errors",
    "events_final_errors",
    "events_unkeyed",
    "upserts",
    "deletes",
    "ordering_violations",
    "shuffle_bytes",
)


@dataclass
class ReplayReport:
    epochs: int = 0
    events_in: int = 0
    events_success: int = 0
    events_delayed_errors: int = 0
    events_final_errors: int = 0
    events_d_and_c_retries: int = 0
    lake_rows: int = 0
    elapsed_sec: float = 0.0
    epoch_metrics: list[dict[str, Any]] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_in / self.elapsed_sec if self.elapsed_sec else 0.0

    def add_epoch(self, agg: dict[str, Any]) -> None:
        """Fold one epoch's counters in — EVERY committed epoch (regular,
        retry-drain, tail) must go through here or the report under-counts."""
        self.epochs += 1
        self.events_in += agg.get("events_in", 0)
        self.events_success += agg.get("events_success", 0)
        self.events_delayed_errors += agg.get("events_delayed_errors", 0)
        self.events_final_errors += agg.get("events_final_errors", 0)
        self.events_d_and_c_retries += agg.get("events_d_and_c_retries", 0)
        self.epoch_metrics.append(agg)


class CapturePartitionStage:
    """Fused capture + partition-assign + sink-projection + per-batch
    combiner, one pass per Arrow batch (no pandas in the hot path).

    ``project_for_sink`` drops the columns the lake merge never reads —
    the old-image payload (already consumed by the no-op-update suppression),
    ``dbuser`` and ``msg_key`` — keeping only the old PK columns (retried
    DELETEs re-derive their key from them). This roughly halves the bytes
    moving through the shuffle/object store, which is the single-node
    throughput ceiling well before CPUs are."""

    def __init__(self, cfg: CaptureConfig, hot_keys: frozenset[str] | None = None,
                 combine: bool = True, project_for_sink: bool = False,
                 drop_key: bool = False, encode_cols: list[str] | None = None):
        self.capture = CaptureStage(cfg, sink_mode=project_for_sink)
        self.cfg = cfg
        self.hot_keys = hot_keys
        self.combine = combine
        # drop_key: key_string is pure duplication of the PK payload values
        # when the merge can re-derive it (capture.sink_key_spec non-None) —
        # partition/combine here still use it, but it never enters the
        # exchange (the biggest single lever on shuffle bytes/event).
        self.drop_key = drop_key and project_for_sink
        # encode_cols: low-cardinality string columns dictionary-encoded
        # into the exchange (int32 indices + per-block dict instead of
        # repeated bytes); probed once per epoch on the first chunk
        # (_probe_dict_cols) so every capture task emits the SAME schema —
        # the merge decodes them right after measuring shuffle_bytes.
        self.encode_cols = list(encode_cols or [])
        keep: list[str] | None = None
        self.old_pk_cols: list[str] = []
        if project_for_sink:
            fields = cfg.latest_version().payload_fields
            # old-image keep-set = UNION of PK columns across ALL tables:
            # a retried DELETE re-derives its key from old_<pk>, and in a
            # multi-table config another table's PK columns may differ
            pk = set().union(*(t.pk_columns for t in cfg.tables)) if cfg.tables else set()
            keep = ["id", "table_id", "op", "created_at", "retry_count"]
            # txn_id matters to the sink path only when a table keys by it
            # (retried events re-derive msg keys through a fresh capture)
            if any(t.key_handling == "T" for t in cfg.tables):
                keep.insert(3, "txn_id")
            keep += [f"new_{f}" for f in fields]
            self.old_pk_cols = [f"old_{f}" for f in fields if f in pk]
            keep += self.old_pk_cols
            keep += ["key_string"]
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.capture(batch)
        if self.keep is not None:
            out = out.select([c for c in self.keep if c in out.column_names])
            # the old image is consumed downstream ONLY by retried DELETEs
            # (key re-derivation): null it everywhere else, so the shuffle
            # ships no old PK string bytes for the ~all-upsert common case
            if len(out) and self.old_pk_cols:
                import pyarrow.compute as pc

                op = out["op"]
                if isinstance(op, pa.ChunkedArray):
                    op = op.combine_chunks()
                is_del = pc.equal(op, "D")
                if not pc.all(is_del).as_py():
                    for c in self.old_pk_cols:
                        if c not in out.column_names:
                            continue
                        col = out[c]
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        out = out.set_column(
                            out.column_names.index(c), c,
                            pc.if_else(is_del, col, pa.nulls(len(out), col.type)),
                        )
        out = assign_partitions(
            out,
            self.cfg.num_partitions,
            salt_factor=self.cfg.salt_factor if self.hot_keys else 0,
            hot_keys=self.hot_keys,
        )
        if self.combine and len(out):
            out = combine_last_per_key(out)
        if self.drop_key and "key_string" in out.column_names:
            out = out.drop_columns(["key_string"])
        if self.encode_cols and len(out):
            import pyarrow.compute as pc

            names = out.column_names
            for c in self.encode_cols:
                if c not in names:
                    continue
                col = out[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    out = out.set_column(names.index(c), c, pc.dictionary_encode(col))
        return out


@ray.remote
def _merge_part_task(ctx: MergeContext, part: int, files: list[str]) -> dict[str, Any]:
    return merge_partition_files(ctx, part, files)


def _merge_via_delta_files(
    cfg, ds, lake_dir: str, epoch: int, manifest: Manifest, merge_mode: str = "rewrite"
) -> list[dict]:
    """File-shuffle merge: delta parquet partitioned by part → one merge task
    per partition. The delta dir is rewritten wholesale on epoch retry."""
    import glob
    import shutil

    from ..stages.sink import invariant_columns as _inv
    from ..stages.sink import sha_source_columns as _shc

    delta_dir = os.path.join(lake_dir, "_delta", f"epoch={epoch:06d}")
    shutil.rmtree(delta_dir, ignore_errors=True)
    ds.write_parquet(delta_dir, partition_cols=["part"])
    payload_fields = list(cfg.latest_version().payload_fields)
    ctx = MergeContext(
        lake_dir=lake_dir,
        epoch=epoch,
        prev_partitions=manifest.partitions,
        payload_fields=payload_fields,
        lake_schema=lake_table_schema(cfg),
        error_max_retries=cfg.error_max_retries,
        mode=merge_mode,
        sha_cols=_shc(payload_fields),
        invariant_cols=_inv(cfg),
        compression=cfg.lake_compression,
        views=list(cfg.views) or None,
        fault_sentinel=cfg.fault_sentinel,
        key_spec=sink_key_spec(cfg),
    )
    ctx_ref = ray.put(ctx)
    refs = []
    for d in sorted(glob.glob(os.path.join(delta_dir, "part=*"))):
        part = int(os.path.basename(d).split("=")[1])
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if files:
            refs.append(_merge_part_task.remote(ctx_ref, part, files))
    rows = [r for r in ray.get(refs) if r]
    shutil.rmtree(delta_dir, ignore_errors=True)  # delta consumed
    return rows


# Above this many post-combine events per epoch, "winners" mode stops
# collecting the winner-id set on the driver and switches to the
# per-partition collection fallback (winner files written inside the phase-1
# groupby, loaded lazily by the phase-2 filter actors). A JOB-size bound,
# not a cluster-size one.
WINNER_DRIVER_LIMIT = 5_000_000


class _WinnerFileFilter:
    """Phase-2 winner filter for the per-partition fallback: an actor-pool
    stage that lazily loads per-partition winner-id files (written by the
    phase-1 groupby) and caches them across batches. The driver never holds
    a winner set; each actor loads only the partitions its batches touch
    (on a multi-node cluster with part-clustered capture output that is a
    fraction of the key space — worst case it equals the broadcast size,
    but held per worker, off the driver). Winner ids are globally unique,
    so a union lookup over the loaded partitions is exact."""

    def __init__(self, winners_dir: str, parts_present: list[int], drop_key: bool = False):
        self.winners_dir = winners_dir
        self.parts_present = set(parts_present)
        self.loaded: set[int] = set()
        self.union: pa.Array | None = None
        # keyless phase-2: once filtered, the wide leg need not ship the
        # key either — the merge re-derives it (sink_key_spec gate upstream)
        self.drop_key = drop_key

    def _ensure(self, parts) -> pa.Array:
        import pyarrow.parquet as pq

        missing = [p for p in parts if p not in self.loaded and p in self.parts_present]
        if missing:
            arrays = [] if self.union is None else [self.union]
            for p in missing:
                t = pq.read_table(
                    os.path.join(self.winners_dir, f"part={p:05d}.parquet")
                )
                arrays.append(t["id"].combine_chunks())
                self.loaded.add(p)
            self.union = pa.concat_arrays(arrays) if len(arrays) > 1 else arrays[0]
        return self.union if self.union is not None else pa.array([], pa.int64())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0:
            return batch
        parts = pc.unique(
            batch["part"].combine_chunks()
            if isinstance(batch["part"], pa.ChunkedArray)
            else batch["part"]
        ).to_pylist()
        winners = self._ensure(parts)
        ids = batch["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        mask = pc.is_in(ids, value_set=winners)
        keys = batch["key_string"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.null_count:  # unkeyed rows always pass (no winner semantics)
            mask = pc.or_(mask, pc.is_null(keys))
        out = batch.filter(mask)
        if self.drop_key:
            out = out.drop_columns(["key_string"])
        return out


def _merge_via_winner_filter(
    cfg, ds, lake_dir: str, epoch: int, manifest: Manifest, merge_mode: str,
    winner_collect: str = "auto",
) -> list[dict]:
    """Two-phase exchange that ships wide payloads only for winning events.

    Phase 1 shuffles ONLY the skinny (key_string, id) columns to find each
    key's max event id (the winner) — ~60 B/row instead of the full ~500 B
    event. Phase 2 filters the materialized capture output down to winner
    rows (one per live key) and runs the normal per-partition merge on that
    tiny remainder. Sound because the final state per key is the arg-max-by-
    id event (retries/watermarks still handled inside the merge).

    Shuffle bytes drop ~5-8x vs shipping every post-combine event. Measured
    tradeoff (docs/SCALE.md): on ONE node this mode loses (~3x slower) —
    the ``materialize()`` adds a full extra pass through the same object
    store the shuffle uses, so there is nothing scarce to save. It exists
    for the multi-node regime, where the shuffle crosses the NETWORK while
    the materialized capture output stays node-local: there the 5-8x byte
    reduction is the dominant term.

    ``winner_collect``:
      * ``"driver"`` — winner ids collected on the driver, broadcast once
        (O(live keys/epoch) driver memory — fine below millions of keys).
      * ``"partition"`` — winner-id sets collected INSIDE the phase-1
        groupby (one skinny ``groupby("part")`` with a per-key arg-max
        inside) and written as per-partition files; phase-2 filter actors
        load them lazily off the driver path (:class:`_WinnerFileFilter`).
      * ``"auto"`` (default) — driver below :data:`WINNER_DRIVER_LIMIT`
        post-combine events, partition fallback above it.
    """
    import shutil

    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    mat = ds.materialize()  # reuse capture output across both phases
    if winner_collect == "auto":
        # count() on a materialized Dataset is block-metadata only
        winner_collect = "driver" if mat.count() <= WINNER_DRIVER_LIMIT else "partition"

    merger = make_epoch_merger(cfg, lake_dir, epoch, manifest.partitions, mode=merge_mode)
    # keyless phase-2 wide leg: phase-1 groups BY key_string (it must ship
    # there), but the filtered wide rows need not re-ship it — the merge
    # re-derives, same gate as the default path
    wide_drop_key = sink_key_spec(cfg) is not None

    if winner_collect == "partition":
        from ..state.manifest import atomic_write_parquet

        winners_dir = os.path.join(lake_dir, "_winners", f"epoch={epoch:06d}")
        shutil.rmtree(winners_dir, ignore_errors=True)  # idempotent epoch retry

        def collect_winners(g: pa.Table) -> pa.Table:
            if len(g) == 0:  # Ray may hand map_groups an empty sentinel block
                return pa.table({"part": pa.array([], pa.int32())})
            part = int(g["part"][0].as_py())
            gb = (
                pa.table({"key_string": g["key_string"], "id": g["id"]})
                .group_by("key_string")
                .aggregate([("id", "max")])
            )
            ids = np.sort(gb["id_max"].to_numpy(zero_copy_only=False).astype(np.int64))
            atomic_write_parquet(
                pa.table({"id": pa.array(ids, pa.int64())}),
                os.path.join(winners_dir, f"part={part:05d}.parquet"),
            )
            return pa.table({"part": pa.array([part], pa.int32())})

        parts_present = [
            r["part"]
            for r in (
                mat.map_batches(
                    lambda t: t.select(["part", "key_string", "id"]).filter(
                        pc.is_valid(
                            t["key_string"].combine_chunks()
                            if isinstance(t["key_string"], pa.ChunkedArray)
                            else t["key_string"]
                        )
                    ),
                    batch_format="pyarrow",
                )
                .groupby("part")
                .map_groups(collect_winners, batch_format="pyarrow")
                .take_all()  # tiny: one row per touched partition
            )
        ]
        from ..functions._pool import pool_size

        filtered = mat.map_batches(
            _WinnerFileFilter,
            fn_constructor_args=(winners_dir, parts_present, wide_drop_key),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_size(8),
        )
        stats_ds = filtered.groupby("part", num_partitions=cfg.num_partitions).map_groups(
            merger, batch_format="pyarrow"
        )
        out = stats_ds.take_all()
        shutil.rmtree(winners_dir, ignore_errors=True)  # consumed
        return out

    winners_ds = (
        mat.map_batches(
            lambda t: t.select(["key_string", "id"]), batch_format="pyarrow"
        )
        .groupby("key_string")
        .aggregate(Max("id", alias_name="id_max"))
    )
    winner_ids = np.asarray(
        [r["id_max"] for r in winners_ds.take_all() if r["id_max"] is not None],
        dtype=np.int64,
    )
    winner_arr = pa.array(np.sort(winner_ids))
    winners_ref = ray.put(winner_arr)

    def keep_winners(batch: pa.Table) -> pa.Table:
        ids = batch["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        wa = ray.get(winners_ref)
        mask = pc.is_in(ids, value_set=wa)
        # unkeyed rows (NULL key) have no winner semantics — always kept
        keys = batch["key_string"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.null_count:
            mask = pc.or_(mask, pc.is_null(keys))
        out = batch.filter(mask)
        if wide_drop_key:
            out = out.drop_columns(["key_string"])
        return out

    stats_ds = (
        mat.map_batches(keep_winners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=cfg.num_partitions)
        .map_groups(merger, batch_format="pyarrow")
    )
    return stats_ds.take_all()


@contextmanager
def _epoch_execution_context():
    """Disable Ray Data's per-operator resource reservation for the epoch
    pipeline (save/restore so other pipelines in the session are untouched).

    The epoch pipeline is 3 task-based operators (read→capture fused, sort
    exchange, per-partition merge) with ~80 MB blocks against a ~40 GiB
    object store — reservation protects nothing here, but its 0.5 ratio
    visibly starves the capture operator when CPUs are scarce: measured on
    the 10M-event replay, 4 CPUs 235k→554k ev/s (2.4×), 2 CPUs 218k→291k,
    8 CPUs 580k→822k, 16 CPUs ~900k (reservation on→off; docs/SCALE.md).
    Safe to disable per-epoch: no actor pools participate (the known
    starve-upstream hazard reservation guards against)."""
    ctx = rd.DataContext.get_current()
    prev = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        ctx.op_resource_reservation_enabled = prev


def _probe_dict_cols(first_file: str, sample_rows: int = 8192) -> list[str]:
    """Choose the exchange's dictionary-encoded columns from a one-row-group
    sample of the epoch's first chunk: string event/payload columns whose
    distinct ratio is ≤ 0.5 (repo names, paths, langs, op codes — not
    content/commit hashes). Deterministic per epoch and shared by every
    capture task, so all exchange blocks carry one schema. Non-parquet
    (jsonl/csv) streams skip the optimization."""
    if first_file.endswith((".jsonl", ".csv")):
        return []
    try:
        import pyarrow.parquet as _pq

        pf = _pq.ParquetFile(first_file)
        sample = next(pf.iter_batches(batch_size=sample_rows))
    except Exception:  # noqa: BLE001 — a probe failure must never fail the epoch
        return []
    out = []
    n = max(sample.num_rows, 1)
    for i, f in enumerate(sample.schema):
        if f.name == "op" or f.name.startswith(("new_", "old_")):
            if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                distinct = pc.count_distinct(sample.column(i)).as_py() or 0
                if distinct / n <= 0.5:
                    out.append(f.name)
    return out


def run_epoch(
    cfg: CaptureConfig,
    manifest: Manifest,
    epoch: int,
    chunk_files: list[str],
    lake_dir: str,
    writer_token: str,
    extra_event_files: list[str] | None = None,
    hot_keys: frozenset[str] | None = None,
    salted: bool = False,
    batch_size: int | None = None,
    shuffle_mode: str = "groupby",
    merge_mode: str = "rewrite",
    winner_collect: str = "auto",
) -> tuple[Manifest, dict[str, Any]]:
    """Process one epoch and commit it. Idempotent under retry.

    ``shuffle_mode``:
      * ``"groupby"`` (default) — ``ds.groupby("part").map_groups(merge)``,
        Ray's sort-based shuffle through the in-memory object store; the
        fastest path once events are column-pruned and batch-combined, and
        required for the salted two-stage skew variant.
      * ``"files"`` — capture tasks write the epoch delta as hash-partitioned
        Parquet (``_delta/epoch=N/part=P/``), then ONE raw Ray task per
        populated partition merges it into its base (Spark-style shuffle
        files). Slightly slower on one node (extra disk round-trip) but
        useful when the object store is tight or the delta must survive a
        mid-epoch crash for forensics.
    """
    t0 = time.perf_counter()
    # partitioning fence (see Manifest.check_partitioning): a resume with a
    # different P would silently split keys across partitions
    manifest.check_partitioning(cfg.num_partitions)
    # EARLY zombie-writer fence (W5): commit_epoch re-checks at publish time,
    # but the staged base writes (and the view-delta pre-clean below) are
    # DESTRUCTIVE overwrites of paths a newer committed epoch may reference —
    # a stale writer must fail before touching the filesystem, not after
    newest = Manifest.latest(lake_dir).epoch
    if newest >= epoch:
        raise RuntimeError(
            f"epoch fencing: epoch {newest} already committed (attempted {epoch}); "
            "refusing to overwrite committed staged output"
        )
    if cfg.views:
        # rewrite mode maintains views inside each epoch's merge (the merge
        # holds the previous per-key state); delta mode DEFERS maintenance
        # to compact(), where base + chain first meet (docs/SCALE.md) — the
        # view then lags the lake by at most one compaction interval, and
        # epoch cost stays ∝ delta.
        payload = set(cfg.latest_version().payload_fields)
        known_tables = {f"{t.schema_name}.{t.name}" for t in cfg.tables}
        for v in cfg.views:
            missing = (set(v.group_by) | set(v.sum_fields)) - payload
            if missing:
                raise ValueError(f"view {v.name!r} references non-payload columns {sorted(missing)}")
            if v.table and v.table not in known_tables:
                raise ValueError(f"view {v.name!r} scopes unknown table {v.table!r} (known: {sorted(known_tables)})")
        _register_view_specs(lake_dir, cfg.views, manifest)
        # pre-clean THIS epoch's delta dirs: a crashed earlier attempt of the
        # same epoch may have covered a DIFFERENT chunk batch and touched
        # partitions this attempt won't rewrite — stale files would
        # double-count once the epoch commits (the manifest lists base files
        # exactly, but view deltas are discovered by glob)
        import shutil as _sh

        from ..stages.sink import VIEWS_DIR as _VD

        for v in cfg.views:
            _sh.rmtree(os.path.join(lake_dir, _VD, v.name, f"epoch={epoch:06d}"),
                       ignore_errors=True)
    files = list(chunk_files) + list(extra_event_files or [])
    if not files:
        # empty epoch: a pure time-marker commit (advances the epoch clock for
        # retry backoff, analog of an idle worker cycle)
        manifest = manifest.commit_epoch(epoch, [], {}, writer_token, metrics={"epoch": epoch, "empty": True},
                                         num_partitions=cfg.num_partitions)
        return manifest, {k: 0 for k in _AGG_KEYS} | {"epoch": epoch, "elapsed_sec": 0.0, "partitions_touched": 0, "lake_rows": manifest.total_rows()}
    # capture task decomposition is a JOB parameter (like the partition
    # count): deriving it from the cluster size would change the per-batch
    # combiner's reduction ratio — and therefore the shuffle volume — between
    # cluster sizes, silently skewing any scaling comparison. No cluster-size
    # fallback, by the same rule; CaptureConfig validates >= 1.
    nblocks = cfg.capture_parallelism
    with _epoch_execution_context():
        # NOTE: a Dataset snapshots its DataContext at CREATION — the tuned
        # context must wrap read_chunks, not just the consuming take_all
        ds = read_chunks(files, override_num_blocks=nblocks)
        # ship no key through the exchange when the merge can re-derive it.
        # Applies to groupby/files AND the salted two-stage path (stage-1
        # re-derives before its per-(part,salt) combine and drops again, so
        # BOTH salted exchanges go keyless); winners phase-1 groups the
        # materialized capture output BY key and keeps shipping it.
        key_spec = sink_key_spec(cfg)
        drop_key = shuffle_mode in ("groupby", "files") and key_spec is not None
        encode_cols = _probe_dict_cols(files[0]) if drop_key else []
        stage = CapturePartitionStage(
            cfg, hot_keys=hot_keys, project_for_sink=True, drop_key=drop_key,
            encode_cols=encode_cols,
        )
        ds = ds.map_batches(
            stage,
            batch_format="pyarrow",
            # coalesce file-sized blocks into combiner-effective batches (see
            # CaptureConfig.combine_batch_size); None would combine per ~chunk
            # file and ship nearly every event through the shuffle
            batch_size=batch_size if batch_size is not None else (cfg.combine_batch_size or None),
            zero_copy_batch=True,
        )
        if shuffle_mode == "files" and not salted:
            stats_rows = _merge_via_delta_files(cfg, ds, lake_dir, epoch, manifest, merge_mode)
        elif shuffle_mode == "winners" and not salted:
            stats_rows = _merge_via_winner_filter(
                cfg, ds, lake_dir, epoch, manifest, merge_mode, winner_collect
            )
        else:
            if salted and hot_keys:
                # stage-1 of the two-stage skew merge: combine per (part, salt)
                if drop_key:
                    from ..stages.capture import derive_sink_keys

                    def salted_combine(g: pa.Table) -> pa.Table:
                        # keyless stage-1: derive → combine → drop again, so
                        # the second (part) exchange is keyless too
                        g = g.append_column("key_string", derive_sink_keys(g, key_spec))
                        g = combine_last_per_key(g)
                        return g.drop_columns(["key_string"])

                    ds = ds.groupby(["part", "salt"]).map_groups(
                        salted_combine, batch_format="pyarrow"
                    )
                else:
                    ds = ds.groupby(["part", "salt"]).map_groups(
                        combine_last_per_key, batch_format="pyarrow"
                    )
            merger = make_epoch_merger(cfg, lake_dir, epoch, manifest.partitions, mode=merge_mode)
            stats_ds = ds.groupby("part", num_partitions=cfg.num_partitions).map_groups(
                merger, batch_format="pyarrow"
            )
            stats_rows = stats_ds.take_all()  # tiny: one row per touched partition

    if merge_mode == "delta":
        # append to each partition's delta chain; base untouched this epoch
        part_updates = {}
        for r in stats_rows:
            prev = manifest.partitions.get(str(r["part"]), {})
            part_updates[str(r["part"])] = {
                "path": prev.get("path"),
                "deltas": prev.get("deltas", []) + [r["path"]],
                "rows": int(prev.get("rows") or 0) + r["lake_rows"],  # upper bound
                "watermark": r["watermark"],
                "sha": r["sha"],  # delta digest; resolved sha set at compaction
            }
    else:
        part_updates = {
            str(r["part"]): {
                "path": r["path"],
                "deltas": [],
                "rows": r["lake_rows"],
                "watermark": r["watermark"],
                "sha": r["sha"],
            }
            for r in stats_rows
        }
    # persist the per-partition stats rows (the STATISTICS table analog,
    # operator A1/T5); idempotent deterministic path per epoch
    if stats_rows:
        from ..state.manifest import atomic_write_parquet

        stats_path = os.path.join(lake_dir, "_stats", f"epoch={epoch:06d}.parquet")
        # atomic like every other ledger write: a torn stats file would break
        # every later health_check/compress_epoch_stats read
        atomic_write_parquet(pa.Table.from_pylist(stats_rows), stats_path)

    elapsed = time.perf_counter() - t0
    agg = {k: int(sum(r.get(k, 0) for r in stats_rows)) for k in _AGG_KEYS}
    agg["epoch"] = epoch
    agg["elapsed_sec"] = round(elapsed, 3)
    agg["partitions_touched"] = len(stats_rows)
    agg["lake_rows"] = int(sum(r["lake_rows"] for r in stats_rows))
    # exchange-volume instrumentation (scaling evidence, docs/SCALE.md):
    # events READ from the stream (parquet footers — no data scan) vs rows
    # and Arrow bytes that actually crossed the shuffle into the merges.
    # events_in (post-combine merge arrivals) / events_read is the per-batch
    # combiner's measured reduction of the all-to-all exchange.
    # Counted per file so a mixed parquet/jsonl/csv stream degrades per-file
    # instead of zeroing the whole metric (jsonl = line count, csv = lines-1).
    events_read = 0
    for f in files:
        try:
            if f.endswith((".jsonl", ".csv")):
                with open(f, "rb") as fh:
                    n = sum(buf.count(b"\n") for buf in iter(lambda: fh.read(1 << 20), b""))
                events_read += max(n - 1, 0) if f.endswith(".csv") else n
            else:
                import pyarrow.parquet as _pq

                events_read += int(_pq.ParquetFile(f).metadata.num_rows)
        except Exception:  # noqa: BLE001 — instrumentation must never fail a commit
            pass
    agg["events_read"] = events_read
    manifest = manifest.commit_epoch(epoch, chunk_files, part_updates, writer_token, metrics=agg,
                                     num_partitions=cfg.num_partitions)
    return manifest, agg


def replay(
    stream_dir: str,
    lake_dir: str,
    cfg: CaptureConfig,
    chunks_per_epoch: int = 8,
    resume: bool = True,
    max_epochs: int | None = None,
    hot_keys: frozenset[str] | None = None,
    salted: bool = False,
    retry_backoff_epochs: int = 1,
    gc_staging: bool = True,
    drain_retries: bool = True,
    shuffle_mode: str = "groupby",
    merge_mode: str = "rewrite",
    compact_every: int = 0,
    winner_collect: str = "auto",
) -> ReplayReport:
    """Full (or resumed) replay of a change stream into the lake.

    ``merge_mode="delta"`` appends per-epoch delta files instead of rewriting
    partition bases (epoch cost ∝ delta); ``compact_every=k`` folds the delta
    chains into fresh bases every k epochs (and once at the end)."""
    t0 = time.perf_counter()
    manifest = Manifest.latest(lake_dir) if resume else Manifest(lake_dir=lake_dir)
    token = new_writer_token()
    pending = pending_chunks(stream_dir, manifest.chunks_consumed)
    report = ReplayReport()
    for batch in epoch_batches(pending, chunks_per_epoch):
        epoch = manifest.epoch + 1
        retry_files = pending_retry_files(lake_dir, epoch, retry_backoff_epochs)
        manifest, agg = run_epoch(
            cfg,
            manifest,
            epoch,
            batch,
            lake_dir,
            token,
            extra_event_files=retry_files,
            hot_keys=hot_keys,
            salted=salted,
            shuffle_mode=shuffle_mode,
            merge_mode=merge_mode,
            winner_collect=winner_collect,
        )
        consume_retry_files(retry_files)
        if compact_every and merge_mode == "delta" and manifest.epoch % compact_every == 0:
            manifest = compact(lake_dir, cfg, manifest)
        report.add_epoch(agg)
        if max_epochs and report.epochs >= max_epochs:
            break
    # drain the retry ledger: keep committing (possibly empty, time-marker)
    # epochs until every retryable event has either succeeded or exhausted
    # its retries into final errors — bounded by the worst-case backoff
    if drain_retries:
        import glob as _glob

        max_drain = retry_backoff_epochs * 3 ** max(cfg.error_max_retries, 0) + cfg.error_max_retries + 2
        for _ in range(max_drain):
            all_retry = _glob.glob(os.path.join(lake_dir, "_retry", "epoch=*", "part=*.parquet"))
            if not all_retry:
                break
            epoch = manifest.epoch + 1
            retry_files = pending_retry_files(lake_dir, epoch, retry_backoff_epochs)
            manifest, agg = run_epoch(
                cfg, manifest, epoch, [], lake_dir, token, extra_event_files=retry_files,
                shuffle_mode=shuffle_mode, merge_mode=merge_mode,
            )
            consume_retry_files(retry_files)
            if retry_files:
                report.add_epoch(agg)
    if merge_mode == "delta" and compact_every:
        if any(p.get("deltas") for p in manifest.partitions.values()):
            manifest = compact(lake_dir, cfg, manifest)
    if gc_staging:
        manifest.gc()
    report.lake_rows = manifest.total_rows()
    report.elapsed_sec = time.perf_counter() - t0
    return report


def compact_partition(
    part: int,
    entry: dict,
    out_path: str,
    lake_schema_ref,
    lake_dir: str | None = None,
    epoch: int | None = None,
    views: list | None = None,
    compression: str | None = None,
) -> dict[str, Any]:
    """Fold ONE partition's base + delta chain into a fresh base (and, with
    views configured, write the compaction's view delta). Pure given inputs
    — the plain-call body of the per-partition compaction task, exposed for
    direct (hypothesis) testing; ``_compact_part_task`` is its Ray wrapper."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.sink import (
        atomic_write_parquet,
        drop_tombstones,
        partition_sha,
        resolve_lake_tables,
        view_contribution,
        view_delta_path,
    )

    tables = []
    base = None
    if entry.get("path"):
        base = pq.read_table(entry["path"])
        tables.append(base)
    delta_tables = [pq.read_table(d) for d in entry.get("deltas", [])]
    tables.extend(delta_tables)
    # keep_tombstones: compaction must NOT drop deleted keys' _last_id
    # fences while late retries could still arrive (see resolve_lake_tables)
    resolved = resolve_lake_tables(tables, lake_schema_ref, keep_tombstones=True)

    # ---- delta-mode view maintenance (docs/SCALE.md) -------------------
    # Delta-mode epochs never load the previous per-key state, so they
    # cannot retract view contributions; the compact task is the first
    # place base + chain meet, so the view delta is computed HERE: for the
    # keys the chain touched, retract the old base's live rows and add the
    # resolved state's live rows. Untouched keys contribute nothing, so
    # cost stays ∝ delta, and a no-op chain (all-stale events) cancels to
    # zero exactly.
    if views and delta_tables:
        touched_arrays = []
        for dt in delta_tables:
            k = dt["_key"]
            touched_arrays.append(k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k)
        touched = pc.unique(pa.concat_arrays(touched_arrays))

        def _live_touched(t: pa.Table | None) -> pa.Table:
            if t is None or not len(t):
                return resolved.schema.empty_table()
            t = drop_tombstones(t)
            keys = t["_key"]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            return t.filter(pc.is_in(keys, value_set=touched))

        old_live = _live_touched(base)
        new_live = _live_touched(resolved)
        for spec in views:
            nl, rl = new_live, old_live
            if getattr(spec, "table", None):
                pref = spec.table + "\x1f"  # KEY_SEP — see capture.py:44
                nl = nl.filter(pc.starts_with(nl["_key"].combine_chunks() if isinstance(nl["_key"], pa.ChunkedArray) else nl["_key"], pattern=pref))
                rl = rl.filter(pc.starts_with(rl["_key"].combine_chunks() if isinstance(rl["_key"], pa.ChunkedArray) else rl["_key"], pattern=pref))
            vdelta = pa.concat_tables(
                [view_contribution(nl, spec, 1), view_contribution(rl, spec, -1)]
            )
            atomic_write_parquet(
                vdelta, view_delta_path(lake_dir, spec.name, epoch, part), compression
            )

    nbytes = atomic_write_parquet(resolved, out_path)
    live = drop_tombstones(resolved)
    return {
        "part": part,
        "path": out_path,
        "deltas": [],
        "rows": len(live),
        "watermark": entry["watermark"],
        "sha": partition_sha(live),  # digest = live rows, same as the merge
        "bytes": nbytes,
    }


_compact_part_task = ray.remote(compact_partition)


def compact(lake_dir: str, cfg: CaptureConfig, manifest: Manifest | None = None) -> Manifest:
    """Fold every partition's delta chain into a fresh base (one Ray task per
    partition) and commit the result as a compaction epoch. Idempotent:
    deterministic output paths, atomic manifest commit."""
    manifest = manifest or Manifest.latest(lake_dir)
    epoch = manifest.epoch + 1
    schema = lake_table_schema(cfg)
    views = list(cfg.views) if cfg.views else None
    if views:
        # a stale/crashed attempt of THIS compaction epoch may have written
        # view deltas for partitions this attempt won't touch — same glob
        # double-count hazard as run_epoch's pre-clean
        import shutil as _sh

        from ..stages.sink import VIEWS_DIR as _VD

        for v in views:
            _sh.rmtree(os.path.join(lake_dir, _VD, v.name, f"epoch={epoch:06d}"),
                       ignore_errors=True)
    refs = []
    for k, entry in manifest.partitions.items():
        if not entry.get("deltas"):
            continue
        out_path = staged_path(lake_dir, epoch, int(k))
        refs.append(
            _compact_part_task.remote(
                int(k), entry, out_path, schema,
                lake_dir, epoch, views, cfg.lake_compression,
            )
        )
    if not refs:
        return manifest
    rows = ray.get(refs)
    part_updates = {
        str(r["part"]): {
            "path": r["path"],
            "deltas": [],
            "rows": r["rows"],
            "watermark": r["watermark"],
            "sha": r["sha"],
        }
        for r in rows
    }
    return manifest.commit_epoch(
        epoch, [], part_updates, new_writer_token(), metrics={"epoch": epoch, "compaction": True}
    )


def lookup_key(
    lake_dir: str, key_string: str, at_epoch: int | None = None
) -> "pd.DataFrame":
    """Point lookup: the current (or time-travel) state of ONE key, touching
    exactly one partition's files — the 'what is row X right now' verb every
    CDC consumer eventually needs. Because merge routing is a pure function
    of the key (``hash(key) % P``, with P committed in the manifest), the
    lookup reads the single base (+ delta chain) that can hold the key and
    filters with a parquet predicate — row groups whose ``_key`` min/max
    statistics exclude it never leave storage. No Ray job, no lake scan:
    driver-side, O(partition file) worst case, O(matching row groups)
    typical. Returns the live row, or an empty typed frame if the key is
    absent or deleted (tombstone fences are merge bookkeeping, not state).

    Reference analog: the current-state read a consumer materializes from
    the compacted Kafka topic (topic compaction keeps the last message per
    key — `doc/movex-cdc.adoc` delivery semantics); here the lake IS that
    compacted view, so the lookup is direct."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..functions.scalar import hash_strings
    from ..stages.sink import resolve_lake_tables

    m = Manifest.at_epoch(lake_dir, at_epoch) if at_epoch is not None else Manifest.latest(lake_dir)
    if not m.num_partitions:
        raise RuntimeError("lake has no committed partitioning (empty manifest?)")
    part = int(hash_strings(np.array([key_string], dtype=object))[0] % np.uint64(m.num_partitions))
    entry = m.partitions.get(str(part)) or m.partitions.get(part) or {}
    paths = ([entry["path"]] if entry.get("path") else []) + list(entry.get("deltas") or [])
    flt = pads.field("_key") == key_string
    tables = []
    for p in paths:
        if not os.path.exists(p):
            raise FileNotFoundError(f"partition file housekept away: {p}")
        tables.append(pq.read_table(p, filters=flt))
    tables = [t for t in tables if len(t)]
    if not tables:
        return pd.DataFrame()
    resolved = resolve_lake_tables(tables, tables[-1].schema, keep_tombstones=False)
    return resolved.to_pandas()


def enrich_with_lake(
    ds: rd.Dataset,
    lake_dir: str,
    key_col: str = "key_string",
    lake_columns: list[str] | None = None,
    at_epoch: int | None = None,
) -> rd.Dataset:
    """Stream-table join (the Kafka-Streams KTable-join analog over the
    reference's compacted-topic state): every input row gains the lake's
    live columns for its key, NULL when the key is absent/deleted.

    The lake side is NEVER shuffled: bases are already hash-partitioned by
    ``hash(key) % P`` (committed in the manifest), so the input is bucketed
    with the same function and each ``map_groups`` task reads ONLY its
    partition's base (+delta chain), pushing a ``_key isin`` predicate into
    the parquet read. Join cost is one input shuffle + P partition-file
    reads — the partition-aligned-join pattern (reuse the lake's
    partitioning key instead of re-exchanging it)."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..functions.scalar import hash_strings
    from ..stages.sink import resolve_lake_tables

    m = Manifest.at_epoch(lake_dir, at_epoch) if at_epoch is not None else Manifest.latest(lake_dir)
    if not m.num_partitions:
        raise RuntimeError("lake has no committed partitioning (empty manifest?)")
    P = m.num_partitions
    paths_by_part: dict[int, list[str]] = {}
    for part, entry in m.partitions.items():
        paths = ([entry["path"]] if entry.get("path") else []) + list(entry.get("deltas") or [])
        if paths:
            paths_by_part[int(part)] = paths

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = hash_strings(keys.to_numpy(zero_copy_only=False))
        return batch.append_column("_part", pa.array((h % np.uint64(P)).astype(np.int32)))

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        g = g.drop(columns=["_part"])
        paths = paths_by_part.get(part, [])
        keys = g[key_col].unique()
        tables = []
        for p in paths:
            t = pq.read_table(p, filters=(pads.field("_key").isin(keys)))
            if len(t):
                tables.append(t)
        if not tables:
            lake_df = pd.DataFrame({"_key": pd.Series(dtype="object")})
        else:
            resolved = resolve_lake_tables(tables, tables[-1].schema, keep_tombstones=False)
            lake_df = resolved.to_pandas()
        if lake_columns is not None:
            lake_df = lake_df[["_key", *lake_columns]]
        return g.merge(lake_df, how="left", left_on=key_col, right_on="_key").drop(
            columns=["_key"], errors="ignore"
        )

    return ds.map_batches(tag, batch_format="pyarrow").groupby("_part").map_groups(
        join_part, batch_format="pandas"
    )


@ray.remote
def _purge_part_task(part: int, path: str, out_path: str, compression: str = "snappy") -> dict[str, Any]:
    import pyarrow.parquet as pq

    from ..stages.sink import atomic_write_parquet, drop_tombstones, partition_sha

    t = pq.read_table(path)
    live = drop_tombstones(t)
    if len(live) == len(t):
        return {}  # no fences in this base — keep it untouched
    nbytes = atomic_write_parquet(live, out_path, compression)
    return {
        "part": part, "path": out_path, "deltas": [], "rows": len(live),
        "sha": partition_sha(live), "bytes": nbytes,
    }


def purge_tombstones(lake_dir: str, cfg: CaptureConfig, force: bool = False) -> Manifest:
    """Maintenance op: drop EVERY tombstone fence row (``_last_op='D'``) from
    the partition bases — the retention valve for delete-heavy workloads,
    where fences otherwise accumulate forever (rewrite merges, compaction and
    repartition all deliberately carry them).

    Safety: a fence exists to stale-drop a late retry of an event OLDER than
    the delete. Once the retry ledger is empty no such retry can ever arrive
    (fresh events always outrank the committed watermark), so purging is
    lossless — the op REFUSES while ``_retry`` files are pending, and (unless
    ``force=True``) while final errors exist, because
    ``reprocess_final_errors`` would re-enter old events that the purged
    fences were guarding against. Delta chains must be compacted first (a
    chain's base may still be needed to fence its own deltas on read).

    Distributed shape: one Ray task per partition base, atomic staged writes,
    one manifest commit; live rows and partition digests are unchanged."""
    import glob as _glob

    manifest = Manifest.latest(lake_dir)
    if _glob.glob(os.path.join(lake_dir, "_retry", "epoch=*", "part=*.parquet")):
        raise RuntimeError("purge_tombstones: retry backlog pending — a late retry may still need the fences")
    if not force and _glob.glob(os.path.join(lake_dir, "_final_errors", "epoch=*", "part=*.parquet")):
        raise RuntimeError(
            "purge_tombstones: final errors pending — reprocess_final_errors would "
            "re-enter events the fences guard against (force=True overrides)"
        )
    if any(p.get("deltas") for p in manifest.partitions.values()):
        raise RuntimeError("purge_tombstones: compact the delta chains first")
    epoch = manifest.epoch + 1
    refs = []
    for k, entry in manifest.partitions.items():
        if entry.get("path"):
            refs.append(
                _purge_part_task.remote(
                    int(k), entry["path"], staged_path(lake_dir, epoch, int(k)),
                    cfg.lake_compression,
                )
            )
    rows = [r for r in ray.get(refs) if r]
    if not rows:
        return manifest
    part_updates = {
        str(r["part"]): {
            "path": r["path"], "deltas": [], "rows": r["rows"],
            "watermark": manifest.partitions[str(r["part"])]["watermark"],
            "sha": r["sha"],
        }
        for r in rows
    }
    return manifest.commit_epoch(
        epoch, [], part_updates, new_writer_token(),
        metrics={"epoch": epoch, "purge_tombstones": True, "partitions_purged": len(rows)},
    )


@ray.remote
def _erase_part_task(
    part: int, path: str, out_path: str, column: str, values: list,
    payload_fields: list[str], sha_cols: list[str], compression: str = "snappy",
) -> dict[str, Any]:
    import pyarrow.parquet as pq

    from ..stages.sink import atomic_write_parquet, partition_sha

    t = pq.read_table(path)
    col = t[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    live = pc.invert(pc.equal(t["_last_op"], "D"))
    match = pc.and_(pc.is_in(col, value_set=pa.array(values, col.type)), live)
    n = pc.sum(match).as_py() or 0
    if not n:
        return {}
    cols: dict[str, Any] = {}
    for f in payload_fields:
        c = t[f]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols[f] = pc.if_else(match, pa.nulls(len(t), c.type), c)
    for meta in ("_table_id", "_key", "_last_id", "_last_ts"):
        cols[meta] = t[meta]
    cols["_last_op"] = pc.if_else(match, pa.scalar("D", pa.string()), t["_last_op"].combine_chunks() if isinstance(t["_last_op"], pa.ChunkedArray) else t["_last_op"])
    import hashlib

    null_sha = hashlib.sha256("\x1f".join([""] * len(sha_cols)).encode()).hexdigest()
    sha_col = t["_content_sha"]
    if isinstance(sha_col, pa.ChunkedArray):
        sha_col = sha_col.combine_chunks()
    cols["_content_sha"] = pc.if_else(match, pa.scalar(null_sha, pa.string()), sha_col)
    out = pa.table(cols).select(t.schema.names)
    nbytes = atomic_write_parquet(out, out_path, compression)
    return {
        "part": part, "path": out_path, "deltas": [], "rows": len(out),
        "sha": partition_sha(out), "bytes": nbytes, "erased": int(n),
    }


def delete_where(
    lake_dir: str, cfg: CaptureConfig, column: str, values: list
) -> tuple[Manifest, int]:
    """GDPR-style targeted erasure: every LIVE lake row whose ``column`` is
    in ``values`` becomes a TOMBSTONE FENCE — payload nulled, ``_last_op='D'``,
    ``_content_sha`` set to the null-payload constant — while ``_key`` /
    ``_last_id`` are retained so the erased key keeps stale-dropping late
    retries of older events (dropping the row entirely would let a late
    retry resurrect the payload). A legitimately NEWER event (higher id) can
    still recreate the key, which is the correct post-erasure semantics.

    Same safety gates as :func:`purge_tombstones`: refuses while the retry
    ledger or final errors hold events (a reprocessed event with a higher id
    than the fence would re-apply its payload), while delta chains are
    uncompacted, and when incremental views are configured (the erasure
    happens outside the merge, so view deltas would go stale). One Ray task
    per partition base, atomic staged writes, one manifest commit."""
    import glob as _glob

    manifest = Manifest.latest(lake_dir)
    if _glob.glob(os.path.join(lake_dir, "_retry", "epoch=*", "part=*.parquet")):
        raise RuntimeError("delete_where: retry backlog pending — drain it first")
    if _glob.glob(os.path.join(lake_dir, "_final_errors", "epoch=*", "part=*.parquet")):
        raise RuntimeError(
            "delete_where: final errors pending — a reprocessed event would "
            "re-apply payload over the erasure fence"
        )
    if any(p.get("deltas") for p in manifest.partitions.values()):
        raise RuntimeError("delete_where: compact the delta chains first")
    if cfg.views:
        raise RuntimeError(
            "delete_where: incremental views configured — erasure bypasses the "
            "merge, so view deltas would go stale; drop the views or rebuild "
            "them after the erasure"
        )
    from ..stages.sink import sha_source_columns

    payload_fields = list(cfg.latest_version().payload_fields)
    sha_cols = sha_source_columns(payload_fields)
    if column not in payload_fields:
        raise ValueError(f"delete_where: {column!r} is not a payload column")
    epoch = manifest.epoch + 1
    refs = [
        _erase_part_task.remote(
            int(k), entry["path"], staged_path(lake_dir, epoch, int(k)),
            column, values, payload_fields, sha_cols, cfg.lake_compression,
        )
        for k, entry in manifest.partitions.items()
        if entry.get("path")
    ]
    rows = [r for r in ray.get(refs) if r]
    if not rows:
        return manifest, 0
    n_erased = sum(r["erased"] for r in rows)
    part_updates = {
        str(r["part"]): {
            "path": r["path"], "deltas": [], "rows": r["rows"],
            "watermark": manifest.partitions[str(r["part"])]["watermark"],
            "sha": r["sha"],
        }
        for r in rows
    }
    manifest = manifest.commit_epoch(
        epoch, [], part_updates, new_writer_token(),
        metrics={"epoch": epoch, "delete_where": {"column": column, "n_values": len(values)},
                 "rows_erased": n_erased, "partitions_touched": len(rows)},
    )
    return manifest, n_erased


def repartition_lake(lake_dir: str, cfg: CaptureConfig, new_num_partitions: int) -> Manifest:
    """Re-key the lake to a new partition count P' — the ONLY sanctioned way
    to change ``num_partitions`` on a live lake (the manifest fence refuses a
    mismatched resume, see ``Manifest.check_partitioning``).

    Distributed shape: read all bases (+ resolve delta chains) as a Dataset
    → re-hash ``_key`` → ``groupby(part)`` → one writer task per new
    partition → single atomic manifest commit carrying P'. Watermarks carry
    over as the GLOBAL max (per-key ordering is preserved because a key's
    entire history re-maps to exactly one new partition; the global max is a
    safe over-approximation for replay dedup since every applied id is ≤ it)."""
    import numpy as np

    from ..functions.scalar import hash_strings
    from ..stages.sink import partition_sha, resolve_lake_tables

    manifest = Manifest.latest(lake_dir)
    if manifest.num_partitions == new_num_partitions:
        return manifest
    schema = lake_table_schema(cfg)
    files = manifest.data_files()
    epoch = manifest.epoch + 1
    global_wm = max((p["watermark"] for p in manifest.partitions.values()), default=-1)

    if not files:
        m = Manifest(
            lake_dir=lake_dir, epoch=manifest.epoch, partitions={},
            chunks_consumed=manifest.chunks_consumed, hash_scheme=manifest.hash_scheme,
        )
        return m.commit_epoch(epoch, [], {}, new_writer_token(),
                              metrics={"epoch": epoch, "repartition": True},
                              num_partitions=new_num_partitions)

    ds = rd.read_parquet(files)

    def rekey(batch: pa.Table) -> pa.Table:
        # partition from _key DIRECTLY (same pd_hash_v1 as assign_partitions;
        # lake rows always carry a non-null _key). The reserved "_new_part"
        # name cannot collide with a payload column literally named "id" /
        # "key_string" / "part" — renaming into the event namespace would
        # silently overwrite and then drop such a payload column.
        keys = batch["_key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = hash_strings(keys.to_numpy(zero_copy_only=False))
        part = (h % np.uint64(new_num_partitions)).astype(np.int32)
        return batch.append_column("_new_part", pa.array(part))

    def write_part(group: pa.Table, _schema=schema, _lake=lake_dir, _epoch=epoch) -> pa.Table:
        from ..events import align_to_schema as _align
        from ..stages.sink import atomic_write_parquet as _aw

        part = int(group["_new_part"][0].as_py())
        t = group.drop_columns(["_new_part"])
        # dedup delta chains + key-sort; tombstone fences carry over to the
        # re-keyed partitions (a late retry must still be fenced after P')
        t = resolve_lake_tables([t], _schema, keep_tombstones=True)
        t = _align(t, _schema)
        out_path = staged_path(_lake, _epoch, part)
        nbytes = _aw(t, out_path)
        from ..stages.sink import drop_tombstones as _dt

        live = _dt(t)
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "rows": pa.array([len(live)], pa.int64()),
                "path": pa.array([out_path], pa.string()),
                "sha": pa.array([partition_sha(live)], pa.string()),
                "bytes": pa.array([nbytes], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(rekey, batch_format="pyarrow")
        .groupby("_new_part", num_partitions=new_num_partitions)
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    part_updates = {
        str(r["part"]): {
            "path": r["path"], "deltas": [], "rows": r["rows"],
            "watermark": global_wm, "sha": r["sha"],
        }
        for r in rows
    }
    # fresh partition map under the new P (old entries must not carry over)
    base = Manifest(
        lake_dir=lake_dir, epoch=manifest.epoch, partitions={},
        chunks_consumed=manifest.chunks_consumed, hash_scheme=manifest.hash_scheme,
    )
    return base.commit_epoch(
        epoch, [], part_updates, new_writer_token(),
        metrics={"epoch": epoch, "repartition": True, "from_p": manifest.num_partitions,
                 "to_p": new_num_partitions},
        num_partitions=new_num_partitions,
    )


def tail(
    stream_dir: str,
    lake_dir: str,
    cfg: CaptureConfig,
    chunks_per_epoch: int = 8,
    poll_interval: float = 1.0,
    max_idle_cycles: int = 3,
    max_epochs: int | None = None,
    merge_mode: str = "rewrite",
    config_provider=None,
    compact_every: int = 0,
) -> ReplayReport:
    """Continuous tailer: follow a growing chunk directory, committing epochs
    as new chunks appear — the reference's steady-state worker loop
    (`transfer_thread.rb:53-99`) with its adaptive idle pacing (W4,
    `:642-657`): the sleep grows toward ``poll_interval × 2^idle`` while the
    queue is empty and resets on work. Returns after ``max_idle_cycles``
    consecutive empty polls (or ``max_epochs``).

    ``config_provider`` (optional) is called before every epoch and may
    return a fresh :class:`CaptureConfig` — the reference's 60 s config-cache
    refresh (T1): edits to conditions/projections/topics take effect on the
    next epoch without restarting the tailer.

    ``compact_every=k`` (delta mode): fold the delta chains every k epochs,
    same as :func:`replay` — the knob that bounds a long-running tailer's
    chain length AND refreshes delta-mode incremental views (whose
    maintenance runs at compaction). Without it a delta-mode tailer's
    merge-on-read cost grows with stream length.
    """
    from ..sources.stream import follow_stream

    manifest = Manifest.latest(lake_dir)
    token = new_writer_token()
    report = ReplayReport()
    t0 = time.perf_counter()

    def step(step_cfg: CaptureConfig, m: Manifest, batch: list[str]) -> Manifest:
        epoch = m.epoch + 1
        retry_files = pending_retry_files(lake_dir, epoch)
        m, agg = run_epoch(
            step_cfg, m, epoch, batch, lake_dir, token,
            extra_event_files=retry_files, merge_mode=merge_mode,
        )
        consume_retry_files(retry_files)
        if compact_every and merge_mode == "delta" and m.epoch % compact_every == 0:
            m = compact(lake_dir, step_cfg, m)
        report.add_epoch(agg)
        return m

    manifest, _ = follow_stream(
        stream_dir, manifest, step, cfg=cfg, chunks_per_epoch=chunks_per_epoch,
        poll_interval=poll_interval, max_idle_cycles=max_idle_cycles,
        max_epochs=max_epochs, config_provider=config_provider,
    )
    report.lake_rows = manifest.total_rows()
    report.elapsed_sec = time.perf_counter() - t0
    return report


def read_lake(
    lake_dir: str,
    columns: list[str] | None = None,
    cfg: CaptureConfig | None = None,
    at_epoch: int | None = None,
) -> rd.Dataset:
    """The committed lake as a Dataset.

    With outstanding delta chains (merge_mode="delta", not yet compacted) the
    read resolves them merge-on-read: a ``groupby("_key")`` arg-max per key —
    pass ``cfg`` for the schema, or compact first for a plain scan.

    ``at_epoch`` time-travels: read the state as of that committed epoch
    (manifests are immutable, staged paths are per-epoch, and
    ``Manifest.gc(keep_epochs=K)`` retains the last K epochs' manifests AND
    data files, so the window is a retention knob). Missing files mean the
    epoch fell out of the retention window."""
    m = Manifest.at_epoch(lake_dir, at_epoch) if at_epoch is not None else Manifest.latest(lake_dir)
    files = m.data_files()
    gone = [f for f in files if not os.path.exists(f)]
    if gone:
        raise FileNotFoundError(
            f"epoch {m.epoch} data housekept away ({len(gone)} file(s), e.g. "
            f"{gone[0]}); raise gc keep_epochs or replay with gc_staging=False"
        )
    has_deltas = any(p.get("deltas") for p in m.partitions.values())
    if not files:
        return rd.from_items([])
    if not has_deltas:
        # bases physically retain deleted keys as tombstone fences
        # (_last_op='D', see resolve_lake_tables) — reads never see them
        read_cols = columns
        if columns is not None and "_last_op" not in columns:
            read_cols = [*columns, "_last_op"]
        ds = rd.read_parquet(files, columns=read_cols)
        from ..stages.sink import drop_tombstones

        ds = ds.map_batches(drop_tombstones, batch_format="pyarrow")
        return ds.select_columns(columns) if columns is not None else ds
    ds = rd.read_parquet(files)
    from ..stages.sink import lake_table_schema, resolve_lake_tables

    schema = lake_table_schema(cfg) if cfg else None

    def resolve(group: pa.Table) -> pa.Table:
        return resolve_lake_tables([group], schema or group.schema)

    ds = ds.groupby("_key").map_groups(resolve, batch_format="pyarrow")
    return ds.select_columns(columns) if columns else ds


@ray.remote
def _diff_part_task(paths_a: list[str], paths_b: list[str]) -> pa.Table:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.sink import resolve_lake_tables

    def load(paths):
        if not paths:
            return None
        tables = [pq.read_table(p, columns=None) for p in paths]
        t = resolve_lake_tables(tables, tables[-1].schema, keep_tombstones=False) \
            if len(tables) > 1 else tables[0]
        if len(tables) == 1:
            mask = pc.not_equal(pc.fill_null(t["_last_op"], ""), "D")
            t = t.filter(mask)
        return t.select(["_key", "_last_id"])

    a, b = load(paths_a), load(paths_b)
    import numpy as np
    import pandas as pd

    a_df = (a.to_pandas().rename(columns={"_key": "k", "_last_id": "a_id"})
            if a is not None else pd.DataFrame({"k": [], "a_id": []}))
    b_df = (b.to_pandas().rename(columns={"_key": "k", "_last_id": "b_id"})
            if b is not None else pd.DataFrame({"k": [], "b_id": []}))
    j = a_df.merge(b_df, on="k", how="outer")
    added = j["a_id"].isna() & j["b_id"].notna()
    deleted = j["b_id"].isna() & j["a_id"].notna()
    updated = j["a_id"].notna() & j["b_id"].notna() & (j["a_id"] != j["b_id"])
    j = j[added | deleted | updated]
    change = np.where(j["a_id"].isna(), "added",
                      np.where(j["b_id"].isna(), "deleted", "updated"))
    return pa.table(
        {"_key": pa.array(j["k"], pa.string()),
         "change": pa.array(change, pa.string()),
         "from_last_id": pa.array(j["a_id"].astype("float64"), pa.float64()),
         "to_last_id": pa.array(j["b_id"].astype("float64"), pa.float64())}
    )


def diff_epochs(lake_dir: str, from_epoch: int, to_epoch: int) -> rd.Dataset:
    """Key-level changelog between two retained epochs (added / updated /
    deleted, by the applied ``_last_id``) — the time-travel companion verb.
    SHUFFLE-FREE: the partitioning fence (``Manifest.check_partitioning``)
    guarantees both epochs share the key→partition mapping, so each
    partition pair diffs independently in one Ray task and the result
    streams back as Arrow refs. ``from_last_id`` / ``to_last_id`` are
    float64 (NaN = key absent on that side), the driver-compare-friendly
    nullable-int representation used across the repo."""
    ma = Manifest.at_epoch(lake_dir, from_epoch)
    mb = Manifest.at_epoch(lake_dir, to_epoch)
    if ma.num_partitions and mb.num_partitions and ma.num_partitions != mb.num_partitions:
        raise ValueError(
            f"epochs have incompatible partitioning ({ma.num_partitions} vs "
            f"{mb.num_partitions}); diff across a repartition is not keyed-aligned"
        )

    def paths(m: Manifest, part: str) -> list[str]:
        e = m.partitions.get(part)
        if not e:
            return []
        out = [e["path"]] if e.get("path") else []
        return out + list(e.get("deltas", []))

    refs = []
    for part in sorted(set(ma.partitions) | set(mb.partitions), key=int):
        pa_, pb_ = paths(ma, part), paths(mb, part)
        if pa_ or pb_:
            refs.append(_diff_part_task.remote(pa_, pb_))
    if not refs:
        return rd.from_items([])
    return rd.from_arrow_refs(refs)


def _register_view_specs(lake_dir: str, views, manifest: Manifest | None = None) -> None:
    """Persist each ViewSpec next to its delta files (idempotent), so
    ``read_view`` needs no config object. Re-registering a view whose
    definition CHANGED is refused: folding deltas produced under two
    different aggregations would silently corrupt the view. FIRST
    registration on a lake that already holds rows is refused too — the
    existing rows never contributed a +1, so a later update/delete of one
    would retract mass the view never gained (silently wrong aggregates)."""
    import json
    from dataclasses import asdict

    from ..stages.sink import VIEWS_DIR
    from ..state.manifest import atomic_write_json

    for v in views:
        p = os.path.join(lake_dir, VIEWS_DIR, v.name, "_SPEC.json")
        doc = asdict(v)
        if os.path.exists(p):
            with open(p) as f:
                if json.load(f) != doc:
                    raise ValueError(
                        f"view {v.name!r} already registered with a different "
                        "definition; pick a new name or rebuild the lake"
                    )
            continue
        if manifest is not None and any(
            int(e.get("rows") or 0) for e in manifest.partitions.values()
        ):
            raise ValueError(
                f"view {v.name!r} registered on a NON-EMPTY lake (epoch "
                f"{manifest.epoch}): pre-existing rows would never gain their "
                "+1 contribution, so later retractions would corrupt the "
                "view. Register views before the first epoch, or rebuild."
            )
        atomic_write_json(p, doc)


def _view_fold_inputs(vdir: str, committed: int) -> tuple[list[str], int]:
    """Files a view fold reads: the LATEST snapshot (if any) plus every
    committed epoch's delta dir newer than it. Epoch dirs at or below the
    snapshot epoch are ignored even if still on disk — a crash between
    snapshot write and delta GC can therefore never double-count."""
    import glob

    snaps = sorted(glob.glob(os.path.join(vdir, "snapshot-epoch=*.snap")))
    snap_epoch, files = -1, []
    if snaps:
        snap_epoch = int(os.path.basename(snaps[-1]).split("=")[1].split(".")[0])
        files.extend(sorted(glob.glob(os.path.join(snaps[-1], "*.parquet"))))
    for d in sorted(glob.glob(os.path.join(vdir, "epoch=*"))):
        e = int(os.path.basename(d).split("=")[1])
        if snap_epoch < e <= committed:
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files, snap_epoch


def _fold_view_dataset(files: list[str], spec: dict) -> rd.Dataset:
    """ONE definition of the view fold (read_view and compact_view must
    never diverge): sum every maintained aggregate per group, drop groups
    retracted to zero rows."""
    from ray.data.aggregate import Sum

    aggs = [Sum("n_rows", alias_name="n_rows")] + [
        Sum("sum_" + f, alias_name="sum_" + f) for f in spec["sum_fields"]
    ]
    ds = rd.read_parquet(files).groupby(spec["group_by"]).aggregate(*aggs)

    def live_groups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater(batch["n_rows"], 0))

    return ds.map_batches(live_groups, batch_format="pyarrow")


def compact_view(lake_dir: str, name: str) -> str | None:
    """Fold a view's committed delta files into ONE snapshot so read cost
    stays bounded on long streams (the view analog of ``compact()``). The
    fold is a distributed Ray Data groupby (group cardinality can exceed one
    node) written to a staging dir and atomically renamed to
    ``snapshot-epoch=<committed>.snap``. Crash-safe without coordination:
    ``read_view`` keys its delta listing off the latest snapshot's epoch, so
    folded delta dirs and older snapshots become garbage the moment the new
    snapshot lands — removed here only as cleanup. Returns the snapshot path
    (None if nothing to fold). Groups retracted to zero rows are dropped
    (integer sums are exactly 0 there; float residue is below the advertised
    float-sum precision)."""
    import glob
    import json
    import shutil as _shutil

    from ..stages.sink import VIEWS_DIR

    vdir = os.path.join(lake_dir, VIEWS_DIR, name)
    committed = Manifest.latest(lake_dir).epoch
    files, _ = _view_fold_inputs(vdir, committed)
    if not files:
        return None
    with open(os.path.join(vdir, "_SPEC.json")) as f:
        spec = json.load(f)
    # column order normalized to the delta-file layout so later folds read a
    # uniform schema
    ordered = spec["group_by"] + ["sum_" + f for f in spec["sum_fields"]] + ["n_rows"]
    ds = _fold_view_dataset(files, spec).select_columns(ordered)
    staging = os.path.join(vdir, "_snap_staging")
    _shutil.rmtree(staging, ignore_errors=True)
    ds.write_parquet(staging)
    path = os.path.join(vdir, f"snapshot-epoch={committed:06d}.snap")
    _shutil.rmtree(path, ignore_errors=True)
    os.rename(staging, path)
    # ---- GC (correctness never depends on this running) ----------------
    for d in glob.glob(os.path.join(vdir, "epoch=*")):
        if int(os.path.basename(d).split("=")[1]) <= committed:
            _shutil.rmtree(d, ignore_errors=True)
    for s in glob.glob(os.path.join(vdir, "snapshot-epoch=*.snap")):
        if s != path:
            _shutil.rmtree(s, ignore_errors=True)
    return path


def read_view(lake_dir: str, name: str) -> rd.Dataset:
    """Current state of an incrementally-maintained view (``n_rows`` +
    ``sum_<f>`` per group): fold every COMMITTED epoch's delta files with one
    group-cardinality groupby, then drop retracted-to-zero groups. Cost ∝
    total delta rows (bounded by epochs × partitions × group cardinality),
    never the lake; staged-but-uncommitted epochs are excluded the same way
    the base read trusts only the manifest. Integer sum fields are exact
    under retraction; float sums are subject to float addition order (use
    integer cents for money, the repo-wide policy)."""
    import json

    from ..stages.sink import VIEWS_DIR

    vdir = os.path.join(lake_dir, VIEWS_DIR, name)
    with open(os.path.join(vdir, "_SPEC.json")) as f:
        spec = json.load(f)
    committed = Manifest.latest(lake_dir).epoch
    files, _ = _view_fold_inputs(vdir, committed)
    if not files:
        return rd.from_items([])
    return _fold_view_dataset(files, spec)


def lake_to_pandas(lake_dir: str, at_epoch: int | None = None):
    """Small-scale helper for tests: full lake as a key-sorted DataFrame
    (delta chains resolved per partition in-process); ``at_epoch`` time-travels
    like :func:`read_lake`."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ..stages.sink import resolve_lake_tables

    m = Manifest.at_epoch(lake_dir, at_epoch) if at_epoch is not None else Manifest.latest(lake_dir)
    parts = []
    for k in sorted(m.partitions, key=int):
        entry = m.partitions[k]
        tables = []
        if entry.get("path"):
            tables.append(pq.read_table(entry["path"]))
        for d in entry.get("deltas", []):
            tables.append(pq.read_table(d))
        if not tables:
            continue
        if entry.get("deltas"):
            t = pa.concat_tables(tables, promote_options="default")
            parts.append(resolve_lake_tables([t], tables[-1].schema))
        else:
            from ..stages.sink import drop_tombstones

            parts.append(drop_tombstones(tables[0]))
    if not parts:
        return pd.DataFrame()
    t = pa.concat_tables(parts, promote_options="default")
    return t.to_pandas().sort_values("_key").reset_index(drop=True)
