"""Initial snapshot load — op ``i`` INIT events from a base table (operator S7).

The reference code-generates a PL/SQL loop over the source table's current
content (optionally AS OF SCN flashback), applying the insert trigger's
projection and filter and emitting lower-case ``i`` events
(`app/models/db_trigger_generator_oracle.rb:499-569`; queueing
`app/models/table_initialization.rb:16-38`; worker thread
`table_initialization_thread.rb:22-52`).

Ray shape: ``read_parquet(source)`` → optional filter (initialization_filter)
→ optional global ``ds.sort`` (initialization_order_by — the only global sort
in the engine, O4) → ``map_batches`` wrapping rows as op='i' change events
with ids from a reserved range BELOW the stream's first id, so snapshot and
tail replay compose without overlap (the 'flashback SCN' watermark analog).

To bootstrap a lake, write the INIT events to parquet and feed them into an
epoch via ``run_epoch(..., extra_event_files=init_files)`` — NOT as
``chunk_files``: the manifest's consumed-chunk ledger counts stream-dir
ordinals and must not be advanced by snapshot input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import CaptureConfig, TableConfig
from ..events import align_to_schema, change_event_schema
from ..functions.scalar import eval_mask


class InitEventWrapper:
    """map_batches callable: base-table rows → op='i' change events.

    Ids are assigned deterministically as ``id_base + row_hash`` would break
    monotonicity; instead each batch gets ids from a disjoint range derived
    from the first row's position is not available in map_batches — so ids
    are assigned from a hash of the primary key, kept strictly below
    ``first_stream_id``. INIT events of the same key can then still be
    deduplicated by the merge's last-writer-wins (any tail event outranks any
    snapshot event), which is the property the reference's flashback load
    guarantees (`doc/movex-cdc.adoc` initialization section).
    """

    def __init__(self, cfg: CaptureConfig, table: TableConfig, first_stream_id: int,
                 id_base: int = 0):
        self.cfg = cfg
        self.table = table
        self.first_stream_id = first_stream_id
        self.id_base = id_base  # >0 = non-flashback live read (see snapshot_events)
        self.payload_fields = cfg.latest_version().payload_fields

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        from ..functions.scalar import hash_strings

        if self.id_base:
            # non-flashback: every snapshot row ranks at EXACTLY the
            # live-read watermark — it overrides stream events folded into
            # the read (id ≤ live_at_id) but is outranked by ANY event
            # arriving after it (id > live_at_id). Cross-key id collisions
            # are harmless (merge resolves per key); spreading ids above the
            # watermark instead would let stale snapshot images outrank
            # genuinely newer post-read events.
            ids = np.full(n, np.int64(self.id_base), dtype=np.int64)
        else:
            pk_cols = self.table.pk_columns or [batch.column_names[0]]
            key_parts = [batch[c].cast(pa.string()) for c in pk_cols]
            if len(key_parts) > 1:
                import pyarrow.compute as pc

                joined = pc.binary_join_element_wise(*key_parts, "\x1f")
            else:
                joined = key_parts[0]
            # ids hash below the stream's first id; unique per key because the
            # snapshot has exactly one row per key (collisions across keys are
            # harmless — combine/merge resolve per key, not per id)
            ids = (hash_strings(joined) % np.uint64(max(self.first_stream_id, 1))).astype(np.int64)

        cols: dict[str, pa.Array] = {
            "id": pa.array(ids, pa.int64()),
            "table_id": pa.array(np.full(n, self.table.table_id, dtype=np.int32)),
            "op": pa.array(["i"] * n, pa.string()),
            "dbuser": pa.array(["init"] * n, pa.string()),
            "txn_id": pa.nulls(n, pa.string()),
            "created_at": pa.array(np.zeros(n, dtype="datetime64[us]")),
            "retry_count": pa.array(np.zeros(n, dtype=np.int32)),
        }
        for f, typ in self.payload_fields.items():
            if f in batch.column_names:
                cols[f"new_{f}"] = batch[f]
        out = pa.table(cols)
        return align_to_schema(out, change_event_schema(self.payload_fields))


def snapshot_events(
    source: rd.Dataset | str,
    cfg: CaptureConfig,
    table: TableConfig,
    first_stream_id: int = 1_000_000,
    live_at_id: int | None = None,
) -> rd.Dataset:
    """Build the INIT event Dataset for one table per its initialization
    config (filter + order by, reference `app/models/table.rb:119-129`).

    ``yn_initialize_with_flashback`` (reference
    `db/migrate/20210226000000_extend_tables7.rb:3`) picks the id anchor:

    * True (default): the source is a point-in-time snapshot taken at
      trigger-activation (flashback AS OF SCN) — INIT ids stay strictly
      BELOW ``first_stream_id``, so every stream event outranks every
      snapshot row and replay composes without overlap.
    * False: the source was read LIVE at ``live_at_id`` (the stream's
      current high watermark) — the read may already contain the effects of
      stream events up to that id, so INIT ids anchor AT ``live_at_id`` and
      those earlier events can no longer regress the snapshot. Events
      arriving after the read win, as in the reference's non-flashback
      initialization (with the same small-anomaly window the reference has).
    """
    ds = rd.read_parquet(source) if isinstance(source, str) else source
    if table.initialization_filter:
        filt = table.initialization_filter

        def apply_filter(batch: pa.Table) -> pa.Table:
            return batch.filter(eval_mask(filt, batch))

        ds = ds.map_batches(apply_filter, batch_format="pyarrow")
    if table.initialization_order_by:
        ds = ds.sort(table.initialization_order_by)
    id_base = 0
    if not table.yn_initialize_with_flashback:
        # fallback with no captured watermark: anchor BELOW the stream start
        # so the snapshot loses to EVERY stream event (id == first_stream_id
        # would tie with the first event and make the arg-max winner
        # arbitrary); events already folded into the live read simply
        # re-apply idempotently on top
        id_base = live_at_id if live_at_id is not None else first_stream_id - 1
    return ds.map_batches(
        InitEventWrapper(cfg, table, first_stream_id, id_base=id_base), batch_format="pyarrow"
    )
