"""Per-partition lake merge — the transactional sink (operators S5/S6/D1/T2-T5).

One merge task per (epoch, partition), produced by
``ds.groupby("part").map_groups(make_epoch_merger(...))`` — the Ray analog of
the reference's one-worker-owns-a-key-slice invariant
(`app/models/transfer_thread.rb:226-242`, W1). Inside a task:

  sort-by-id (O1, `transfer_thread.rb:217`) → watermark dedup (T2, D1)
  → divide&conquer error isolation (§2.11) → last-writer-wins combine
  → schema-evolve the base → upsert/tombstone merge → idempotent staged write.

The merge is an arg-max-by-id reduction per key: INSERT/UPDATE/INIT upsert the
row, DELETE tombstones it — which makes it associative, so pre-combining in
upstream ``map_batches`` (see ``partitioning.combine_last_per_key``) and
salted two-stage merges are sound.

Exactly-once: events at or below the partition's committed watermark are
dropped (replay dedup); the staged file path is deterministic per (epoch,
part) and fully overwritten, so Ray task retries and driver restarts converge
to byte-identical output (verified by the partition sha).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import CaptureConfig
from ..functions.scalar import string_offsets_data as _string_offsets_data
from ..events import align_to_schema, arrow_type
from ..state.manifest import atomic_write_parquet, staged_path
from .capture import sink_key_spec as _sink_key_spec
from .errors import divide_and_conquer, write_bad_events
from .partitioning import combine_last_per_key

UNKEYED_DIR = "_unkeyed"

MERGE_STATS_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("epoch", pa.int64()),
        ("events_in", pa.int64()),
        ("events_below_watermark", pa.int64()),
        ("events_success", pa.int64()),
        ("events_d_and_c_retries", pa.int64()),
        ("events_delayed_errors", pa.int64()),
        ("events_final_errors", pa.int64()),
        ("events_unkeyed", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("ordering_violations", pa.int64()),
        ("lake_rows", pa.int64()),
        ("watermark", pa.int64()),
        ("path", pa.string()),
        ("sha", pa.string()),
        ("bytes", pa.int64()),
        # Arrow bytes that arrived at this merge group through the exchange —
        # the measured cross-stage shuffle volume (scaling evidence; see
        # docs/SCALE.md "Exchange volume"). In winners mode this counts the
        # phase-2 (wide) leg only; the skinny phase-1 keys/ids leg is bounded
        # by ~16B/event and documented separately.
        ("shuffle_bytes", pa.int64()),
    ]
)


def lake_table_schema(cfg: CaptureConfig) -> pa.Schema:
    fields = [pa.field(n, arrow_type(t)) for n, t in cfg.latest_version().payload_fields.items()]
    fields += [
        pa.field("_table_id", pa.int32()),
        pa.field("_key", pa.string()),
        pa.field("_last_id", pa.int64()),
        pa.field("_last_op", pa.string()),
        pa.field("_last_ts", pa.timestamp("us")),
        # per-row content digest, computed ONCE when the row enters the lake
        # (on the post-combine delta, not the full partition) so the
        # partition-level digest is a cheap fold over stored values
        pa.field("_content_sha", pa.string()),
    ]
    return pa.schema(fields)


def sha_source_columns(payload_fields: list[str]) -> list[str]:
    """Payload columns feeding the per-row content digest. Single-``content``
    configs keep the historical digest ``sha256(content or '')``; any other
    payload shape hashes the canonical \\x1f-joined rendering of ALL payload
    columns (so configs without a ``content`` field are first-class)."""
    return ["content"] if "content" in payload_fields else list(payload_fields)


def content_sha_array(t: pa.Table, cols: list[str], prefix: str = "") -> pa.Array:
    """Vectorized-friendly per-row sha256 hex digest of the payload columns.

    The row rendering (cast→string, null→'', \\x1f-join) is pure Arrow; the
    only per-row work is the sha256 call itself, fed straight from the Arrow
    utf8 buffer via memoryview slices (no per-row Python strings)."""
    n = len(t)
    if n == 0:
        return pa.array([], pa.string())
    rendered = []
    has_binary = False
    for c in cols:
        col = t[prefix + c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            # binary payloads (e.g. packed embeddings) digest their raw
            # bytes — a utf8 cast would REJECT them (Invalid UTF8 payload)
            has_binary = True
            col = pc.cast(col, pa.binary()) if pa.types.is_large_binary(col.type) else col
        elif not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        rendered.append(pc.fill_null(col, b"" if pa.types.is_binary(col.type) else ""))
    if has_binary:
        # join in binary space: utf8 columns reinterpret as their identical
        # bytes, so all-string configs are unaffected by this branch
        rendered = [
            r if pa.types.is_binary(r.type) else pc.cast(r, pa.binary())
            for r in rendered
        ]
        joined = rendered[0] if len(rendered) == 1 else pc.binary_join_element_wise(*rendered, b"\x1f")
    else:
        joined = rendered[0] if len(rendered) == 1 else pc.binary_join_element_wise(*rendered, "\x1f")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    offs, data = _string_offsets_data(joined)
    sha = hashlib.sha256
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = sha(data[offs[i] : offs[i + 1]]).hexdigest()
    return pa.array(out, pa.string())


def events_to_lake_rows(
    events: pa.Table, payload_fields: list[str], sha_cols: list[str] | None = None
) -> pa.Table:
    """Events → lake rows. DELETE rows' payload is nulled HERE (one if_else
    per column on the tiny post-combine delta): a tombstone fence must carry
    only ``_key``/``_last_id``, never the deleted payload bytes — sink_fast
    capture skips the new-image nulling for D rows (the merge provably never
    reads it), so without this the fence would retain whatever the raw delete
    event carried and base files would differ between capture modes."""
    is_del = None
    if len(events):
        op = events["op"]
        if isinstance(op, pa.ChunkedArray):
            op = op.combine_chunks()
        is_del = pc.equal(op, "D")
        if not pc.any(is_del).as_py():
            is_del = None
    cols: dict[str, Any] = {}
    for f in payload_fields:
        col = events[f"new_{f}"]
        if is_del is not None:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = pc.if_else(is_del, pa.nulls(len(events), col.type), col)
        cols[f] = col
    cols["_table_id"] = events["table_id"]
    cols["_key"] = events["key_string"]
    cols["_last_id"] = events["id"]
    cols["_last_op"] = events["op"]
    cols["_last_ts"] = events["created_at"]
    sha_src = sha_cols or sha_source_columns(payload_fields)
    sha = content_sha_array(events, sha_src, prefix="new_")
    if is_del is not None:
        # sha over an all-null payload is a per-schema CONSTANT (every sha
        # column is a payload column, and D rows null them all) — patch D
        # positions instead of re-hashing the whole nulled table
        null_sha = hashlib.sha256("\x1f".join([""] * len(sha_src)).encode()).hexdigest()
        sha = pc.if_else(is_del, pa.scalar(null_sha, pa.string()), sha)
    cols["_content_sha"] = sha
    return pa.table(cols)


def invariant_columns(cfg: CaptureConfig) -> dict[int, list[str]]:
    """Per-table event columns that must be non-null on upserts — the
    config-driven sink invariant. Tables logging a ``content`` payload keep
    the historical 'upsert must carry content' rule; payload shapes without
    it (``yn_payload_pkey_only``, content not logged) fall back to requiring
    the PK payload columns, so such configs don't quarantine every event."""
    payload = set(cfg.latest_version().payload_fields)
    out: dict[int, list[str]] = {}
    for t in cfg.tables:
        logged_upsert = set(t.logged_columns("I")) | set(t.logged_columns("U")) | set(
            t.logged_columns("i")
        )
        if "content" in payload and "content" in logged_upsert:
            out[t.table_id] = ["new_content"]
        else:
            out[t.table_id] = [f"new_{c}" for c in t.pk_columns if c in payload]
    return out


def make_invariant_check(per_table_cols: dict[int, list[str]]):
    """Sink-side invariant as a divide&conquer probe: upserted rows must carry
    the configured required columns. Raises on violation — the wrapper
    isolates the poison rows."""

    def check(events: pa.Table) -> None:
        op = events["op"]
        if isinstance(op, pa.ChunkedArray):
            op = op.combine_chunks()
        is_upsert = pc.invert(pc.equal(op, "D"))
        tids = events["table_id"]
        if isinstance(tids, pa.ChunkedArray):
            tids = tids.combine_chunks()
        single = len(per_table_cols) == 1
        for tid, req_cols in per_table_cols.items():
            tmask = None if single else pc.equal(tids, tid)
            for name in req_cols:
                if name not in events.column_names:
                    continue
                col = events[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                bad = pc.and_(is_upsert, pc.is_null(col))
                if tmask is not None:
                    bad = pc.and_(bad, tmask)
                if pc.any(bad).as_py():
                    raise ValueError(f"upsert event with NULL {name[len('new_'):]}")

    return check


VIEWS_DIR = "_views"


def view_delta_path(lake_dir: str, name: str, epoch: int, part: int) -> str:
    """Deterministic staged path — epoch retries overwrite byte-identically,
    the same idempotency contract as the base files."""
    return os.path.join(
        lake_dir, VIEWS_DIR, name, f"epoch={epoch:06d}", f"part={part:05d}.parquet"
    )


def view_contribution(live: pa.Table, spec, sign: int) -> pa.Table:
    """Grouped contribution of ``live`` rows to a :class:`ViewSpec`:
    ``group_by`` → (``n_rows``, ``sum_<f>`` …), multiplied by ``sign``
    (+1 = rows entering the state, −1 = rows retracted from it). Sum columns
    widen to a deterministic type (int64 / float64) BEFORE aggregating so
    every partition's delta file carries the identical schema; null payload
    values contribute 0."""
    cols: dict[str, Any] = {}
    for g in spec.group_by:
        c = live[g]
        cols[g] = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    for f in spec.sum_fields:
        c = live[f]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        t = pa.float64() if pa.types.is_floating(c.type) else pa.int64()
        cols[f] = pc.fill_null(c.cast(t), pa.scalar(0, t))
    agg = (
        pa.table(cols)
        .group_by(spec.group_by)
        .aggregate([(f, "sum") for f in spec.sum_fields] + [([], "count_all")])
    )
    out: dict[str, Any] = {g: agg[g] for g in spec.group_by}
    for f in spec.sum_fields:
        col = agg[f + "_sum"]
        out["sum_" + f] = col if sign > 0 else pc.multiply(col, pa.scalar(sign, col.type))
    n = agg["count_all"].cast(pa.int64())
    out["n_rows"] = n if sign > 0 else pc.multiply(n, pa.scalar(sign, pa.int64()))
    return pa.table(out)


def drop_tombstones(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return t
    op = t["_last_op"]
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    return t.filter(pc.invert(pc.equal(op, "D")))


def resolve_lake_tables(
    tables: list[pa.Table], lake_schema: pa.Schema, keep_tombstones: bool = False
) -> pa.Table:
    """Merge-on-read resolution for the delta-log mode: arg-max ``_last_id``
    per ``_key`` over base+delta rows, key-sorted.

    ``keep_tombstones=True`` (the STATE paths: rewrite-merge base load,
    compaction, repartition) retains each deleted key's winning ``D`` row as
    a fence carrying the delete's ``_last_id`` — without it a late retry of
    an OLDER event for a deleted key would find no base row, pass the stale
    check, and resurrect the deleted row. Read paths (``read_lake``,
    ``lake_to_pandas``) use the default and never see tombstones.

    Correct under any interleaving because the final state per key is a pure
    arg-max reduction (the same property the write-path merge relies on)."""
    tables = [align_to_schema(t, lake_schema) for t in tables if len(t)]
    if not tables:
        return lake_schema.empty_table()
    t = pa.concat_tables(tables)
    # arg-max by (_key, _last_id): sort key-asc/id-desc, keep each key's
    # first row — pure Arrow kernels (this also leaves the result key-sorted)
    order = pc.sort_indices(
        t.select(["_key", "_last_id"]),
        sort_keys=[("_key", "ascending"), ("_last_id", "descending")],
    )
    t = t.take(order)
    keys = t["_key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    n = len(t)
    if n > 1:
        firsts = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
        mask = pa.concat_arrays([pa.array([True]), pc.fill_null(firsts, True)])
        t = t.filter(mask)
    return t if keep_tombstones else drop_tombstones(t)


def partition_sha(lake: pa.Table, sha_cols: list[str] | None = None) -> str:
    """Deterministic digest of a partition's final state: sha256 over the
    key-sorted rows of ``key \\x1f <content sha> \\x1f last_id`` lines — the
    per-row content-sha256 invariant aggregated per partition.

    The per-row shas come from the stored ``_content_sha`` column (computed
    once at delta-write time, see :func:`events_to_lake_rows`); bases written
    before that column existed are recomputed on the fly. The fold itself is
    one ``sha256`` update over the contiguous Arrow utf8 buffer — zero per-row
    Python in the steady state (this used to be a per-row loop over the FULL
    partition every rewrite epoch, the main single-threaded drag on scaling)."""
    if len(lake) == 0:
        return hashlib.sha256(b"").hexdigest()

    def _fallback_cols() -> list[str]:
        if sha_cols:
            return sha_cols
        if "content" in lake.column_names:
            return ["content"]
        return [c for c in lake.column_names if not c.startswith("_")]

    if "_content_sha" in lake.column_names:
        shas = lake["_content_sha"]
        if isinstance(shas, pa.ChunkedArray):
            shas = shas.combine_chunks()
        if shas.null_count:
            shas = pc.coalesce(shas, content_sha_array(lake, _fallback_cols()))
    else:
        shas = content_sha_array(lake, _fallback_cols())
    keys = lake["_key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    ids = lake["_last_id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    lines = pc.binary_join_element_wise(keys, shas, pc.cast(ids, pa.string()), "\x1f")
    lines = pc.binary_join_element_wise(lines, "", "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    h = hashlib.sha256()
    if lines.null_count == 0:
        offs, data = _string_offsets_data(lines)
        h.update(data[offs[0] : offs[-1]])
    else:  # null key should be impossible in a keyed partition; stay correct
        h.update("".join(v or "" for v in lines.to_pylist()).encode())
    return h.hexdigest()


# atomic_write_parquet lives with the commit protocol (state/manifest.py),
# imported above — every staged/unkeyed/ledger write goes through it.


@dataclass
class MergeContext:
    """Everything a merge task needs — small and picklable; ships to every
    task by closure/arg capture (the J1 broadcast-small-side pattern; the
    per-partition map is P entries, never a shuffle join).

    ``mode``:
      * ``"rewrite"`` — merge the epoch delta into the partition base and
        rewrite it (read-optimized; epoch cost ∝ touched-partition size).
      * ``"delta"`` — append the combined epoch delta (with DELETE
        tombstones) as a delta file; reads resolve base+deltas by arg-max
        ``_last_id`` per key (merge-on-read). Epoch cost ∝ delta size — the
        10^10-scale path (SURVEY §7.5 item 3); ``compact()`` folds chains
        back into a base.
    """

    lake_dir: str
    epoch: int
    prev_partitions: dict[str, dict[str, Any]]
    payload_fields: list[str]
    lake_schema: pa.Schema
    error_max_retries: int
    check_invariants: bool = True
    mode: str = "rewrite"
    sha_cols: list[str] | None = None  # payload cols feeding _content_sha
    invariant_cols: dict[int, list[str]] | None = None  # per-table required cols
    compression: str = "snappy"  # CaptureConfig.lake_compression
    # incrementally-maintained views (CaptureConfig.views); rewrite mode only
    views: list[Any] = None  # list[ViewSpec] | None
    fault_sentinel: str | None = None  # chaos hook (CaptureConfig.fault_sentinel)
    # table_id → (prefix, pk_columns) for sink-side key_string re-derivation
    # (capture.sink_key_spec); the capture drops the key from the exchange
    # whenever this is derivable
    key_spec: dict[int, tuple[str, list[str]]] | None = None


def merge_partition(ctx: MergeContext, group: pa.Table, part: int) -> pa.Table:
    """Merge one partition's epoch delta into its base. Pure given inputs +
    the base file on disk; idempotent (deterministic staged output path)."""
    if ctx.fault_sentinel:
        import os as _os

        try:  # O_EXCL: exactly ONE task across the cluster wins the crash
            fd = _os.open(ctx.fault_sentinel, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            pass
        else:
            _os.write(fd, str(part).encode())
            _os.close(fd)
            _os._exit(1)  # SIGKILL semantics: no exception, no cleanup
    lake_dir, epoch = ctx.lake_dir, ctx.epoch
    payload_fields, lake_schema = ctx.payload_fields, ctx.lake_schema
    sha_cols = ctx.sha_cols or sha_source_columns(payload_fields)
    if ctx.check_invariants:
        invariant_check = make_invariant_check(
            ctx.invariant_cols if ctx.invariant_cols is not None else {0: ["new_content"]}
        )
    else:
        invariant_check = None
    error_max_retries = ctx.error_max_retries
    prev = ctx.prev_partitions.get(str(part))
    prev_wm = prev["watermark"] if prev else -1
    events_in = len(group)
    shuffle_bytes = int(group.nbytes)  # BEFORE key re-derivation: what shipped

    # ---- decode dictionary-encoded exchange columns --------------------
    # (capture's encode_cols optimization: low-cardinality strings crossed
    # the shuffle as int32 indices; everything below works on plain strings)
    for i, f in enumerate(group.schema):
        if pa.types.is_dictionary(f.type):
            col = group[f.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            group = group.set_column(i, f.name, col.cast(f.type.value_type))

    # ---- key re-derivation (exchange ships no key_string) --------------
    if "key_string" not in group.column_names:
        if ctx.key_spec is None:
            raise RuntimeError(
                "delta carries no key_string and MergeContext has no key_spec "
                "to re-derive it — capture/merge configuration mismatch"
            )
        from .capture import derive_sink_keys

        group = group.append_column("key_string", derive_sink_keys(group, ctx.key_spec))

    # ---- watermark dedup (T2/D1): replayed events are dropped ----------
    # Retried events (retry_count > 0, re-fed from the retry ledger) are
    # BELOW the watermark by construction and must bypass it; re-applying
    # an upsert is idempotent under last-writer-wins, so a crash between
    # commit and retry-ledger consumption cannot corrupt the lake.
    ids = group["id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    new_wm = max(int(pc.max(ids).as_py()), prev_wm)
    rc = group["retry_count"]
    if isinstance(rc, pa.ChunkedArray):
        rc = rc.combine_chunks()
    is_retry = pc.greater(pc.fill_null(rc, 0), 0)
    fresh = group.filter(pc.or_(pc.greater(ids, prev_wm), is_retry))
    below = events_in - len(fresh)

    # ---- unkeyed events: append-only side channel (S3) -----------------
    keyed_mask = pc.is_valid(fresh["key_string"].combine_chunks())
    unkeyed = fresh.filter(pc.invert(keyed_mask))
    keyed = fresh.filter(keyed_mask)
    if len(unkeyed):
        p = os.path.join(lake_dir, UNKEYED_DIR, f"epoch={epoch:06d}", f"part={part:05d}.parquet")
        atomic_write_parquet(unkeyed, p, ctx.compression)

    # ---- error isolation (§2.11) ---------------------------------------
    if invariant_check is not None and len(keyed):
        ok, bad, attempts = divide_and_conquer(keyed, invariant_check)
        n_retry, n_final = write_bad_events(bad, lake_dir, epoch, part, error_max_retries)
    else:
        ok, attempts, n_retry, n_final = keyed, 0, 0, 0

    # ---- last-writer-wins combine + sort-by-id (O1) --------------------
    ok = combine_last_per_key(ok)
    if len(ok):
        ok = ok.take(pc.sort_indices(ok["id"].combine_chunks() if isinstance(ok["id"], pa.ChunkedArray) else ok["id"]))

    # ---- delta mode: append combined delta with tombstones -------------
    if ctx.mode == "delta":
        delta_rows = events_to_lake_rows(ok, payload_fields, sha_cols)  # D rows stay as tombstones
        delta_rows = align_to_schema(delta_rows, lake_schema)
        out_path = staged_path(lake_dir, epoch, part).replace(".parquet", ".delta.parquet")
        nbytes = atomic_write_parquet(delta_rows, out_path, ctx.compression)
        op_col = ok["op"].combine_chunks() if isinstance(ok["op"], pa.ChunkedArray) else ok["op"]
        n_del = int(pc.sum(pc.equal(op_col, "D").cast(pa.int8())).as_py() or 0) if len(ok) else 0
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "epoch": pa.array([epoch], pa.int64()),
                "events_in": pa.array([events_in], pa.int64()),
                "events_below_watermark": pa.array([below], pa.int64()),
                "events_success": pa.array([len(ok)], pa.int64()),
                "events_d_and_c_retries": pa.array([attempts], pa.int64()),
                "events_delayed_errors": pa.array([n_retry], pa.int64()),
                "events_final_errors": pa.array([n_final], pa.int64()),
                "events_unkeyed": pa.array([len(unkeyed)], pa.int64()),
                "upserts": pa.array([len(ok) - n_del], pa.int64()),
                "deletes": pa.array([n_del], pa.int64()),
                "ordering_violations": pa.array([0], pa.int64()),
                "lake_rows": pa.array([len(delta_rows)], pa.int64()),
                "watermark": pa.array([new_wm], pa.int64()),
                "path": pa.array([out_path], pa.string()),
                "sha": pa.array([partition_sha(drop_tombstones(delta_rows), sha_cols)], pa.string()),
                "bytes": pa.array([nbytes], pa.int64()),
                "shuffle_bytes": pa.array([shuffle_bytes], pa.int64()),
            },
            schema=MERGE_STATS_SCHEMA,
        )

    # ---- load + schema-evolve the base ---------------------------------
    # (a rewrite on top of a delta chain resolves it first — this is
    # exactly what compaction does)
    if prev:
        base_tables = []
        if prev.get("path"):
            base_tables.append(pq.read_table(prev["path"]))
        for d in prev.get("deltas", []):
            base_tables.append(pq.read_table(d))
        if prev.get("deltas"):
            base = resolve_lake_tables(base_tables, lake_schema, keep_tombstones=True)
        elif base_tables:
            base = base_tables[0]
            if base.schema != lake_schema:
                base = align_to_schema(base, lake_schema)
        else:
            base = lake_schema.empty_table()
    else:
        base = lake_schema.empty_table()

    # ---- per-key ordering guarantee (KafkaMock ascending-id check, D1) -
    # An event at or below its key's applied _last_id would regress the
    # row; it is dropped (stale). Only late retries can produce this —
    # anything else is an ordering violation and is counted.
    # Vectorized: pc.index_in joins each event's key against the base's
    # (unique) _key column, take() fetches the applied _last_id (null for
    # unseen keys), and one compare marks stale rows — no per-row Python.
    violations = 0
    if len(ok) and len(base):
        ok_keys = ok["key_string"]
        if isinstance(ok_keys, pa.ChunkedArray):
            ok_keys = ok_keys.combine_chunks()
        ok_ids = ok["id"]
        if isinstance(ok_ids, pa.ChunkedArray):
            ok_ids = ok_ids.combine_chunks()
        base_keys = base["_key"]
        if isinstance(base_keys, pa.ChunkedArray):
            base_keys = base_keys.combine_chunks()
        base_last = base["_last_id"]
        if isinstance(base_last, pa.ChunkedArray):
            base_last = base_last.combine_chunks()
        idx = pc.index_in(ok_keys, value_set=base_keys)
        applied_last = base_last.take(idx)  # null where key not in base
        stale = pc.fill_null(pc.less_equal(ok_ids, applied_last), False)
        n_stale = int(pc.sum(stale).as_py() or 0)
        if n_stale:
            rc_ok = ok["retry_count"]
            if isinstance(rc_ok, pa.ChunkedArray):
                rc_ok = rc_ok.combine_chunks()
            not_retry = pc.less_equal(pc.fill_null(rc_ok, 0), 0)
            violations = int(pc.sum(pc.and_(stale, not_retry)).as_py() or 0)
            ok = ok.filter(pc.invert(stale))

    # ---- upsert / tombstone merge --------------------------------------
    # Deletes become PHYSICAL tombstone rows in the base (null payload,
    # _last_op='D'): the row is the deleted key's _last_id fence for the
    # per-key stale check above — dropping it would let a late retry of an
    # older event resurrect the key. Read paths filter tombstones.
    op = ok["op"].combine_chunks() if isinstance(ok["op"], pa.ChunkedArray) else ok["op"]
    is_del = pc.equal(op, "D")
    n_upserts = len(ok) - (int(pc.sum(is_del.cast(pa.int8())).as_py() or 0) if len(ok) else 0)
    touched = ok["key_string"]
    if isinstance(touched, pa.ChunkedArray):
        touched = touched.combine_chunks()
    if len(ok):
        keep_mask = pc.invert(pc.is_in(base["_key"], value_set=touched))
        base_keep = base.filter(keep_mask) if len(base) else base
    else:
        base_keep = base
    lake_rows = events_to_lake_rows(ok, payload_fields, sha_cols)
    lake_rows = align_to_schema(lake_rows, lake_schema)

    # ---- incremental view maintenance (delta = new − retracted) --------
    # Both inputs are already in hand at delta-key cost: the rows the merge
    # is removing from the base and the rows it is writing. No lake rescan,
    # ever; an untouched partition writes nothing.
    if ctx.views and len(ok):
        # keep_mask is the complement of "removed" — reuse it instead of a
        # second O(|base|) hash probe on the merge hot path
        removed_live = (
            drop_tombstones(base.filter(pc.invert(keep_mask))) if len(base) else base
        )
        new_live = drop_tombstones(lake_rows)
        for spec in ctx.views:
            nl, rl = new_live, removed_live
            if getattr(spec, "table", None):
                pref = spec.table + "\x1f"  # KEY_SEP — see capture.py:44
                nl = nl.filter(pc.starts_with(nl["_key"].combine_chunks() if isinstance(nl["_key"], pa.ChunkedArray) else nl["_key"], pattern=pref))
                rl = rl.filter(pc.starts_with(rl["_key"].combine_chunks() if isinstance(rl["_key"], pa.ChunkedArray) else rl["_key"], pattern=pref))
            vdelta = pa.concat_tables(
                [view_contribution(nl, spec, 1),
                 view_contribution(rl, spec, -1)]
            )
            atomic_write_parquet(
                vdelta, view_delta_path(lake_dir, spec.name, epoch, part), ctx.compression
            )

    merged = pa.concat_tables([base_keep, lake_rows]) if len(lake_rows) else base_keep
    if len(merged):
        sort_idx = pc.sort_indices(merged["_key"].combine_chunks() if isinstance(merged["_key"], pa.ChunkedArray) else merged["_key"])
        merged = merged.take(sort_idx)
    live = drop_tombstones(merged)

    # ---- idempotent staged write ---------------------------------------
    out_path = staged_path(lake_dir, epoch, part)
    nbytes = atomic_write_parquet(merged, out_path, ctx.compression)
    sha = partition_sha(live, sha_cols)  # digest = LIVE rows (fences excluded)

    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "epoch": pa.array([epoch], pa.int64()),
            "events_in": pa.array([events_in], pa.int64()),
            "events_below_watermark": pa.array([below], pa.int64()),
            "events_success": pa.array([len(ok)], pa.int64()),
            "events_d_and_c_retries": pa.array([attempts], pa.int64()),
            "events_delayed_errors": pa.array([n_retry], pa.int64()),
            "events_final_errors": pa.array([n_final], pa.int64()),
            "events_unkeyed": pa.array([len(unkeyed)], pa.int64()),
            "upserts": pa.array([n_upserts], pa.int64()),
            "deletes": pa.array([len(ok) - n_upserts], pa.int64()),
            "ordering_violations": pa.array([violations], pa.int64()),
            "lake_rows": pa.array([len(live)], pa.int64()),  # live rows only
            "watermark": pa.array([new_wm], pa.int64()),
            "path": pa.array([out_path], pa.string()),
            "sha": pa.array([sha], pa.string()),
            "bytes": pa.array([nbytes], pa.int64()),
            "shuffle_bytes": pa.array([shuffle_bytes], pa.int64()),
        },
        schema=MERGE_STATS_SCHEMA,
    )


def make_epoch_merger(
    cfg: CaptureConfig,
    lake_dir: str,
    epoch: int,
    prev_partitions: dict[str, dict[str, Any]],
    check_invariants: bool = True,
    mode: str = "rewrite",
) -> Callable[[pa.Table], pa.Table]:
    """The ``groupby("part").map_groups`` flavor of the merge."""
    payload_fields = list(cfg.latest_version().payload_fields)
    ctx = MergeContext(
        lake_dir=lake_dir,
        epoch=epoch,
        prev_partitions=prev_partitions,
        payload_fields=payload_fields,
        lake_schema=lake_table_schema(cfg),
        error_max_retries=cfg.error_max_retries,
        check_invariants=check_invariants,
        mode=mode,
        sha_cols=sha_source_columns(payload_fields),
        invariant_cols=invariant_columns(cfg),
        compression=cfg.lake_compression,
        views=list(cfg.views) or None,
        fault_sentinel=cfg.fault_sentinel,
        key_spec=_sink_key_spec(cfg),
    )

    def merge(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return MERGE_STATS_SCHEMA.empty_table()
        part = group["part"][0].as_py()
        return merge_partition(ctx, group, part)

    return merge


def merge_partition_files(ctx: MergeContext, part: int, delta_files: list[str]) -> dict[str, Any]:
    """The file-shuffle flavor: read one partition's delta files (written by
    ``write_parquet(partition_cols=["part"])``), merge, return the stats row
    as a dict. Runs as one raw ``@ray.remote`` task per partition — the
    shuffle happens through the filesystem/object store instead of an
    in-memory all-to-all sort (see pipelines/replay.py)."""
    tables = [pq.read_table(f) for f in delta_files]
    tables = [t for t in tables if len(t)]
    if not tables:
        return {}
    group = pa.concat_tables(tables, promote_options="default")
    if "part" not in group.column_names:  # partition col consumed by the writer
        group = group.append_column("part", pa.array([part] * len(group), pa.int32()))
    stats = merge_partition(ctx, group, part)
    return stats.to_pylist()[0]


def make_salted_combiner() -> Callable[[pa.Table], pa.Table]:
    """Stage-1 of the two-stage skew merge: per (part, salt) group keep each
    key's max-id event. Cuts a hot key's rows to at most ``salt_factor`` before
    the final per-part merge (SURVEY §4 'Skew')."""

    def combine(group: pa.Table) -> pa.Table:
        return combine_last_per_key(group)

    return combine


class SinkValidator:
    """Conformance oracle for the sink stream (KafkaMock analog, D1).

    Asserts strictly ascending event ids per message key across every batch it
    sees (reference `app/models/kafka_mock.rb:49-63`). Stateful — use one
    instance per partition-ordered stream (e.g. in tests)."""

    def __init__(self) -> None:
        self.last_id_per_key: dict[str, int] = {}
        self.violations: list[tuple[str, int, int]] = []

    def observe(self, batch: pa.Table) -> None:
        keys = batch["msg_key"] if "msg_key" in batch.column_names else batch["key_string"]
        for k, i in zip(keys.to_pylist(), batch["id"].to_pylist()):
            if k is None:
                continue
            prev = self.last_id_per_key.get(k)
            if prev is not None and i <= prev:
                self.violations.append((k, prev, i))
            else:
                self.last_id_per_key[k] = i

    def assert_ok(self) -> None:
        if self.violations:
            raise AssertionError(f"non-ascending ids per key: {self.violations[:5]}")
