"""The capture stage — the reference's generated trigger, as one vectorized
``map_batches`` transform (operators M1-M11, SURVEY.md §2.2).

Where the reference code-generates PL/SQL per (table, operation)
(`app/models/db_trigger_generator_oracle.rb:98-238`), this module compiles the
:class:`~movex_cdc_ray.config.CaptureConfig` into per-table plans of Arrow
kernels executed per batch:

  * schema evolution alignment (add column / int widen) — in-flight per batch
  * per-op column projection (M2, `db_trigger_generator_oracle.rb:98-238`)
  * row predicates from config strings (M3, `:762-796`)
  * update-only-on-change suppression with NULL-safe compare (M4, `:802-823`)
  * computed column expressions spliced into old/new (M6, `:620-754`)
  * message-key derivation modes N/P/F/T/E (M7, `:917-967`)
  * envelope assembly + operation long names + ISO timestamps (M8-M10,
    `transfer_thread.rb:493-536`, `app/helpers/key_helper.rb:2-10`)
  * topic routing (M11, `app/models/table.rb:186-192`)

The stage is STATELESS (a plain function per batch) so Ray schedules it as
elastic tasks; config is captured in the closure (tiny — the J1 broadcast).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import OP_LONG_NAMES, CaptureConfig, TableConfig
from ..events import align_to_schema, change_event_schema
from ..functions.scalar import (
    compile_expr,
    escape_json_string,
    eval_expr,
    eval_mask,
    format_timestamp,
    null_safe_not_equal,
)

KEY_SEP = "\x1f"  # canonical partition-key separator


@dataclass
class TablePlan:
    """Compiled capture plan for one table — the 'deployed trigger'."""

    table: TableConfig
    topic: str
    logged: dict[str, list[str]] = field(default_factory=dict)  # op -> payload cols
    # op -> OBSERVED cols (the trigger's UPDATE OF list): drives the op-flag
    # filter and no-op-update suppression. yn_payload_pkey_only narrows
    # `logged` (the payload) but NOT this — the reference's flag reduces
    # what the message carries, never which changes fire the trigger.
    observed: dict[str, list[str]] = field(default_factory=dict)
    conditions: dict[str, Any] = field(default_factory=dict)  # op -> code object
    expressions: dict[str, list[tuple[str, str, Any]]] = field(default_factory=dict)
    key_expr: Any = None


def compile_plan(cfg: CaptureConfig) -> dict[int, TablePlan]:
    """Build per-table plans (the M1 'trigger generation' analog).

    Rebuilding plans after a config edit is the redeploy cycle of
    `app/models/db_trigger.rb:38-92` — cheap enough to do per epoch.
    """
    plans: dict[int, TablePlan] = {}
    for t in cfg.tables:
        if t.yn_hidden:
            continue
        plans[t.table_id] = compile_table_plan(cfg, t)
    return plans


def compile_table_plan(cfg: CaptureConfig, t) -> TablePlan:
    """Compile ONE table's plan — the per-table unit of trigger generation,
    so one table's bad expression fails only that table (api.generate_triggers
    reports per-table successes/errors like the reference's generate_all)."""
    plan = TablePlan(table=t, topic=cfg.topic_for(t))
    for op in ("I", "U", "D", "i"):
        plan.logged[op] = t.logged_columns(op)
        plan.observed[op] = t.observed_columns(op)
        cond = t.condition(op)
        if cond:
            plan.conditions[op] = compile_expr(cond)
        plan.expressions[op] = [
            (e.name, e.target(), compile_expr(e.sql)) for e in t.expressions(op)
        ]
    if t.key_handling == "E" and t.key_expression:
        plan.key_expr = compile_expr(t.key_expression)
    return plan


def _payload_field_names(schema: pa.Schema) -> list[str]:
    return [n[len("new_") :] for n in schema.names if n.startswith("new_")]


def derive_keys(
    batch: pa.Table, plan: TablePlan, skip_msg_key: bool = False,
    pk_source: pa.Table | None = None,
) -> tuple[pa.Array | None, pa.Array]:
    """(msg_key, key_string) per row.

    ``msg_key`` is the outgoing (Kafka-style) message key per mode N/P/F/T/E
    (M7). ``key_string`` is the canonical partition/merge key: the
    ``KEY_SEP``-joined PK values, resolved old-vs-new per op (the reference's
    ``:old``→``:new`` rewrite, `db_trigger_generator_oracle.rb:952-967`);
    null for unkeyed tables (mode N → round-robin partitioning, operator S3).

    ``pk_source`` supplies the PRE-projection row images for the PK value
    reads (the reference trigger derives keys from the raw ``:old``/``:new``
    records): payload projection may null a PK column the op doesn't log
    (e.g. ``yn_log_delete=False`` on a PK column), and a key derived from
    the projected image would be NULL — misrouting the event to the unkeyed
    side channel and, for a DELETE, never removing the lake row. E-mode key
    expressions still evaluate over ``batch`` (they may reference computed
    columns appended after projection).
    """
    t = plan.table
    n = len(batch)
    pk_batch = pk_source if pk_source is not None else batch
    is_del = pc.equal(batch["op"], "D")

    def v(name: str) -> pa.Array:
        old = pk_batch[f"old_{name}"]
        new = pk_batch[f"new_{name}"]
        if isinstance(old, pa.ChunkedArray):
            old = old.combine_chunks()
        if isinstance(new, pa.ChunkedArray):
            new = new.combine_chunks()
        return pc.if_else(is_del, old, new)

    key_string: pa.Array
    if t.pk_columns:
        # prefixed with the qualified table name so identical PK values in
        # different captured tables never collide in the lake (the reference
        # never mixes tables in one topic partition stream either)
        prefix = f"{t.schema_name}.{t.name}"
        parts = [pa.array([prefix] * n, pa.string())] + [
            v(c).cast(pa.string()) for c in t.pk_columns
        ]
        key_string = pc.binary_join_element_wise(*parts, KEY_SEP)
    else:
        key_string = pa.nulls(n, pa.string())

    if skip_msg_key:
        # sink mode: the lake merge keys on key_string alone; the rendered
        # Kafka message key (P-mode JSON escaping etc.) is never consumed
        return None, key_string

    mode = t.key_handling
    if mode == "N":
        msg_key = pa.nulls(n, pa.string())
    elif mode == "P":
        # canonical JSON of PK columns, like the reference's primary-key mode
        frags: list[Any] = []
        for i, c in enumerate(t.pk_columns):
            val = v(c)
            if pa.types.is_string(val.type) or pa.types.is_large_string(val.type):
                rendered = pc.binary_join_element_wise('"', escape_json_string(val), '"', "")
            else:
                rendered = val.cast(pa.string())
            frags.append(pc.binary_join_element_wise(f'"{c}": ', rendered, ""))
        body = frags[0]
        for f in frags[1:]:
            body = pc.binary_join_element_wise(body, f, ", ")
        msg_key = pc.binary_join_element_wise("{", body, "}", "")
    elif mode == "F":
        msg_key = pa.array([t.fixed_message_key] * n, pa.string())
    elif mode == "T":
        msg_key = batch["txn_id"]
        if isinstance(msg_key, pa.ChunkedArray):
            msg_key = msg_key.combine_chunks()
    else:  # E
        out = eval_expr(plan.key_expr, batch)
        if isinstance(out, np.ndarray):
            out = pa.array(out)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        msg_key = out.cast(pa.string())
    return msg_key, key_string


def sink_key_spec(cfg) -> dict[int, tuple[str, list[str]]] | None:
    """``table_id → (qualified-name prefix, pk_columns)`` IF the merge can
    re-derive every row's ``key_string`` from the post-projection event
    columns — then the exchange need not ship the key at all (it is pure
    duplication of the PK payload values; measured 217.9 → ~150 B/event on
    the flagship replay). Returns ``None`` when any (table, op) omits a PK
    column from its logged payload (projection would null the value the key
    derives from — `derive_keys`' ``pk_source`` caveat) or when computed
    expressions exist (they may overwrite a PK column post-derivation);
    the capture then ships ``key_string`` verbatim as before."""
    payload = set(cfg.latest_version().payload_fields)
    spec: dict[int, tuple[str, list[str]]] = {}
    for t in cfg.tables:
        if t.column_expressions:
            return None
        if not t.pk_columns:
            spec[t.table_id] = (f"{t.schema_name}.{t.name}", [])
            continue
        pk = set(t.pk_columns)
        if not pk <= payload:
            return None
        # I/i rows read new_<pk>: capture's new_mask is logged[I] OR logged[i]
        logged_ii = set(t.logged_columns("I")) | set(t.logged_columns("i"))
        if not (pk <= logged_ii and pk <= set(t.logged_columns("U"))
                and pk <= set(t.logged_columns("D"))):
            return None
        spec[t.table_id] = (f"{t.schema_name}.{t.name}", list(t.pk_columns))
    return spec


def derive_sink_keys(events: pa.Table, key_spec: dict[int, tuple[str, list[str]]]) -> pa.Array:
    """Re-derive ``key_string`` at the merge from table_id + PK columns
    (old image for DELETE rows, new otherwise) — the exact expression
    ``derive_keys`` evaluates at capture, legal only under a non-None
    :func:`sink_key_spec`. One vectorized pass per configured table."""
    def col(name: str) -> pa.Array:
        c = events[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_dictionary(c.type):
            # exchange columns may arrive dictionary-encoded (encode_cols)
            c = c.cast(c.type.value_type)
        return c

    n = len(events)
    out: pa.Array = pa.nulls(n, pa.string())
    if n == 0:
        return out
    tid = col("table_id")
    is_del = pc.equal(col("op"), "D")
    for table_id, (prefix, pks) in key_spec.items():
        if not pks:
            continue  # unkeyed table: key stays null (S3 side channel)
        mask = pc.equal(tid, pa.scalar(table_id, tid.type))
        if not pc.any(mask).as_py():
            continue
        parts = [pa.array([prefix] * n, pa.string())]
        for c in pks:
            parts.append(pc.if_else(is_del, col(f"old_{c}"), col(f"new_{c}")).cast(pa.string()))
        ks = pc.binary_join_element_wise(*parts, KEY_SEP)
        out = pc.if_else(mask, ks, out)
    return out


class CaptureStage:
    """Callable for ``ds.map_batches(CaptureStage(cfg), batch_format="pyarrow")``.

    Output = input event columns aligned to the LATEST schema version, rows
    filtered per op-flags/conditions/no-op-suppression, payload projected per
    op, plus ``msg_key`` and ``key_string`` columns and any computed-expression
    columns (named ``new_<name>`` / ``old_<name>``).
    """

    def __init__(self, cfg: CaptureConfig, sink_mode: bool = False):
        """``sink_mode=True`` specializes the stage for the lake-merge path:
        the message key and the per-op payload nulling whose effect the merge
        provably never reads (new-image on DELETE rows — re-nulled at
        lake-row construction, see ``sink.events_to_lake_rows``; the whole
        old image — consumed only by the suppression compare, which runs
        before) are skipped. Message rendering / conformance always use the
        default full mode. Lake output is byte-identical either way
        (asserted in tests/test_round3_fixes.py)."""
        self.cfg = cfg
        self.plans = compile_plan(cfg)
        self.event_schema = change_event_schema(cfg.latest_version().payload_fields)
        self.payload_fields = list(cfg.latest_version().payload_fields)
        self.sink_mode = sink_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if isinstance(batch, pa.RecordBatch):  # pragma: no cover - ray always passes Table
            batch = pa.Table.from_batches([batch])
        # 1) schema evolution: align every batch to the latest payload schema
        batch = align_to_schema(batch, self.event_schema)

        out_parts: list[pa.Table] = []
        tids = pc.unique(batch["table_id"]).to_pylist()
        for tid in tids:
            plan = self.plans.get(tid)
            sub = (
                batch
                if len(tids) == 1
                else batch.filter(pc.equal(batch["table_id"], tid))
            )
            if plan is None:
                continue  # unconfigured table: no trigger deployed → no events
            out_parts.append(self._capture_table(sub, plan))
        if not out_parts:
            return self._empty_out()
        if len(out_parts) == 1:
            return out_parts[0]
        # per-table computed-expression columns make the parts' schemas
        # diverge; promote unifies them (missing expression columns null)
        return pa.concat_tables(out_parts, promote_options="default")

    def _empty_out(self) -> pa.Table:
        schema = self.event_schema
        fields = list(schema) + [pa.field("msg_key", pa.string()), pa.field("key_string", pa.string())]
        return pa.schema(fields).empty_table()

    def _capture_table(self, batch: pa.Table, plan: TablePlan) -> pa.Table:
        op = batch["op"]
        if isinstance(op, pa.ChunkedArray):
            op = op.combine_chunks()
        n = len(batch)

        # one Arrow equality kernel per op code (object-dtype numpy compares
        # would be Python-level per row); everything downstream is bool numpy
        op_eq = {
            o: pc.equal(op, o).to_numpy(zero_copy_only=False) for o in ("I", "U", "D", "i")
        }

        # 2) op-flag filter: an op with no OBSERVED columns has no trigger
        #    (M2; pkey-only payload reduction must not drop the op entirely)
        keep = np.zeros(n, dtype=bool)
        for o in ("I", "U", "D", "i"):
            if plan.observed[o]:
                keep |= op_eq[o]

        # 3) per-op row predicates (M3). SQL trigger semantics: the
        #    condition must evaluate TRUE to capture — NULL drops the row,
        #    so a predicate over a schema-evolved column silently excludes
        #    pre-boundary events (their aligned value is NULL); tested in
        #    test_replay_e2e.test_condition_on_evolved_column_null_drops
        for o, code in plan.conditions.items():
            rows_o = op_eq[o]
            if not rows_o.any():
                continue
            mask = eval_mask(code, batch).to_numpy(zero_copy_only=False)
            dropped = rows_o & ~mask
            keep &= ~dropped

        # 4) update-only-on-change suppression (M4): NULL-safe old!=new over
        #    the columns OBSERVED for update (the trigger's UPDATE OF list)
        upd = op_eq["U"]
        if upd.any() and plan.observed["U"]:
            changed = np.zeros(n, dtype=bool)
            for c in plan.observed["U"]:
                if f"new_{c}" in batch.column_names:
                    neq = null_safe_not_equal(batch[f"new_{c}"], batch[f"old_{c}"])
                    changed |= neq.to_numpy(zero_copy_only=False)
            keep &= ~(upd & ~changed)

        if not keep.all():
            sub = batch.filter(pa.array(keep))
            op_eq = {o: v[keep] for o, v in op_eq.items()}
        else:
            sub = batch
        # snapshot of the raw row images BEFORE payload projection: key
        # derivation must read PK values the projection may null (zero-copy —
        # Arrow arrays are immutable, this only holds references)
        pre_projection = sub

        # 5) per-op payload projection (M2): null out unlogged columns; insert
        #    events keep no old object, delete events no new object.
        #    Sink mode relaxes the masks with don't-care rows (the merge drops
        #    D rows' new image as tombstones and never reads the old image —
        #    suppression already consumed it), so the common all-columns-
        #    logged config skips every if_else kernel here. Guarded off when
        #    computed expressions exist (they may read projected columns).
        is_i = op_eq["I"] | op_eq["i"]
        is_u = op_eq["U"]
        is_d = op_eq["D"]
        has_exprs = any(plan.expressions[o] for o in ("I", "U", "D", "i"))
        sink_fast = self.sink_mode and not has_exprs
        cols = {name: sub[name] for name in sub.column_names}
        for f in self.payload_fields:
            logged_i = f in plan.logged["I"] or f in plan.logged["i"]
            logged_u = f in plan.logged["U"]
            logged_d = f in plan.logged["D"]
            new_mask = (is_i & logged_i) | (is_u & logged_u)
            old_mask = (is_u & logged_u) | (is_d & logged_d)
            if sink_fast:
                new_mask = new_mask | is_d
                old_mask = old_mask | ~is_d
            for prefix, mask in (("new", new_mask), ("old", old_mask)):
                name = f"{prefix}_{f}"
                col = cols[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if not mask.all():
                    col = pc.if_else(pa.array(mask), col, pa.nulls(len(sub), col.type))
                cols[name] = col
        sub = pa.table(cols, schema=sub.schema)

        # 6) computed column expressions (M6): appended per op, target old/new
        for o in ("I", "U", "D", "i"):
            for name, target, code in plan.expressions[o]:
                rows_o = pa.array(op_eq[o])
                val = eval_expr(code, sub)
                if isinstance(val, np.ndarray):
                    val = pa.array(val)
                if isinstance(val, pa.ChunkedArray):
                    val = val.combine_chunks()
                if not isinstance(val, (pa.Array, pa.ChunkedArray)):
                    val = pa.array([val] * len(sub))
                val = pc.if_else(rows_o, val, pa.nulls(len(sub), val.type))
                colname = f"{target}_{name}"
                if colname in sub.column_names:
                    old = sub[colname]
                    if isinstance(old, pa.ChunkedArray):
                        old = old.combine_chunks()
                    val = pc.if_else(rows_o, val, old)
                    sub = sub.set_column(sub.column_names.index(colname), colname, val)
                else:
                    sub = sub.append_column(colname, val)

        # 7) message key + canonical partition key (M7) — PK values from the
        #    pre-projection images (see derive_keys)
        msg_key, key_string = derive_keys(
            sub, plan, skip_msg_key=self.sink_mode, pk_source=pre_projection
        )
        if msg_key is not None:
            sub = sub.append_column("msg_key", msg_key)
        sub = sub.append_column("key_string", key_string)

        # 8) yn_record_txid gating: the reference's trigger records the local
        #    transaction id ONLY when the table flag is set
        #    (`db_trigger_generator_oracle.rb:476`); otherwise the event's
        #    Transaction_ID is NULL and the envelope renders literal null.
        #    Done after key derivation — mode T requires the flag (validated
        #    in config), so the gate can never null a T-mode key source.
        if not plan.table.yn_record_txid and "txn_id" in sub.column_names:
            i = sub.column_names.index("txn_id")
            sub = sub.set_column(i, "txn_id", pa.nulls(len(sub), pa.string()))
        return sub


# ---------------------------------------------------------------------------
# envelope / sink-boundary encoding (M5, M8, M9, M10)
# ---------------------------------------------------------------------------


def attach_envelope(batch: pa.Table, cfg: CaptureConfig, legacy_ts: str | None = None) -> pa.Table:
    """Add the outgoing-message envelope columns.

    Reference `transfer_thread.rb:493-518` prepare_message_from_event_log:
    id, schema, tablename, operation (long name), dbuser, timestamp, txn id;
    optional CloudEvents headers (`transfer_thread.rb:663-679`).
    """
    op = batch["op"]
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    tids = batch["table_id"]
    if isinstance(tids, pa.ChunkedArray):
        tids = tids.combine_chunks()
    # op long-name mapping via dictionary take (M10)
    codes = ["I", "U", "D", "i"]
    longs = pa.array([OP_LONG_NAMES[c] for c in codes])
    idx = pc.index_in(op, pa.array(codes))
    operation = longs.take(idx)

    # table metadata via the same index_in/take dictionary pattern as the
    # op-code mapping above — one vectorized pass instead of per-row dicts
    known_ids = pa.array([t.table_id for t in cfg.tables], pa.int32())
    tidx = pc.index_in(tids.cast(pa.int32()), value_set=known_ids)
    schema_names = pa.array([t.schema_name for t in cfg.tables], pa.string()).take(tidx)
    table_names = pa.array([t.name for t in cfg.tables], pa.string()).take(tidx)
    topics = pa.array([cfg.topic_for(t) for t in cfg.tables], pa.string()).take(tidx)
    if legacy_ts is None:
        legacy_ts = cfg.legacy_ts_format
    ts_str = format_timestamp(
        batch["created_at"],
        legacy_ts,
        db_timezone=cfg.db_default_timezone,
        machine_timezone=cfg.machine_timezone,
    )
    out = batch
    for name, col in (
        ("schema", schema_names),
        ("tablename", table_names),
        ("operation", operation),
        ("topic", topics),
        ("timestamp", ts_str),
    ):
        out = out.append_column(name, col)
    # CloudEvents headers when enabled per table — the full 9-header set of
    # the reference's create_message_headers (`transfer_thread.rb:663-679`)
    any_ce = any(t.yn_add_cloudevents_header for t in cfg.tables)
    if any_ce:
        n = len(batch)
        ce_flags = pa.array([t.yn_add_cloudevents_header for t in cfg.tables], pa.bool_())
        ce_on = pc.fill_null(ce_flags.take(tidx), False)
        nulls = pa.nulls(n, pa.string())

        def gated(col) -> pa.Array:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.if_else(ce_on, col, nulls)

        def const(v: str) -> pa.Array:
            return pc.if_else(ce_on, pa.array([v] * n, pa.string()), nulls)

        for name, col in (
            ("ce_id", gated(batch["id"].cast(pa.string()))),
            ("ce_source", const(cfg.cloudevents_source)),
            ("ce_specversion", const("1.0")),
            ("ce_type", const(f"MOVEX-CDC:{cfg.build_version}")),
            ("ce_time", gated(ts_str)),
            ("ce_datacontenttype", const("application/json")),
            ("ce_schema", gated(schema_names)),
            ("ce_tablename", gated(table_names)),
            ("ce_operation", gated(operation)),
        ):
            out = out.append_column(name, col)
    return out


def _render_object(batch: pa.Table, fields: list[str], prefix: str) -> pa.Array:
    """Render `{"f": v, ...}` JSON per row from ``<prefix>_<f>`` columns (M5).

    Type conversions follow the reference's convert_col
    (`db_trigger_generator_oracle.rb:875-914`): strings escaped+quoted,
    numbers bare (with the 0.x leading-zero guarantee — Arrow cast always
    emits the leading zero), NULL → literal ``null``, timestamps ISO-quoted,
    binary as upper-hex.
    """
    n = len(batch)
    if not fields:
        return pa.array(["{}"] * n)
    frags = []
    for f in fields:
        col = batch[f"{prefix}_{f}"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            rendered = pc.binary_join_element_wise('"', escape_json_string(col), '"', "")
        elif pa.types.is_timestamp(t):
            rendered = pc.binary_join_element_wise('"', format_timestamp(col), '"', "")
        elif pa.types.is_binary(t):
            from ..functions.scalar import raw_to_hex

            rendered = pc.binary_join_element_wise('"', raw_to_hex(col), '"', "")
        else:
            rendered = col.cast(pa.string())
        rendered = pc.coalesce(rendered, pa.array(["null"] * n))
        frags.append(pc.binary_join_element_wise(f'"{f}": ', rendered, ""))
    body = frags[0]
    for fr in frags[1:]:
        body = pc.binary_join_element_wise(body, fr, ", ")
    return pc.binary_join_element_wise("{", body, "}", "")


def render_message_json(
    batch: pa.Table, cfg: CaptureConfig, legacy_ts: str | None = None,
    env: pa.Table | None = None,
) -> pa.Array:
    """Full outgoing JSON message per row (the Kafka value), vectorized.

    Layout per `transfer_thread.rb:493-518` / `doc/movex-cdc.adoc:727-741`:
    ``{"id": .., "schema": .., "tablename": .., "operation": .., "dbuser": ..,
    "timestamp": "..", ["transaction_id": "..",] ["new": {..},] ["old": {..}]}``
    — ``new`` present for INSERT/UPDATE/INIT, ``old`` for UPDATE/DELETE.

    ``env`` takes a precomputed :func:`attach_envelope` result so a caller
    that needs the envelope anyway (the delivery path reads topic + CE
    headers from it) pays the per-row timestamp/dictionary work once.
    """
    if env is None:
        env = attach_envelope(batch, cfg, legacy_ts)
    fields = _payload_field_names(batch.schema)
    n = len(batch)
    op = batch["op"]
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    has_new = pc.is_in(op, value_set=pa.array(["I", "U", "i"]))
    has_old = pc.is_in(op, value_set=pa.array(["U", "D"]))

    head = pc.binary_join_element_wise(
        pc.binary_join_element_wise('{"id": ', env["id"].combine_chunks().cast(pa.string()), ""),
        pc.binary_join_element_wise('"schema": "', env["schema"].combine_chunks(), '"', ""),
        pc.binary_join_element_wise('"tablename": "', env["tablename"].combine_chunks(), '"', ""),
        pc.binary_join_element_wise('"operation": "', env["operation"].combine_chunks(), '"', ""),
        pc.binary_join_element_wise('"dbuser": "', env["dbuser"].combine_chunks(), '"', ""),
        pc.binary_join_element_wise('"timestamp": "', env["timestamp"].combine_chunks(), '"', ""),
        ", ",
    )
    txn = batch["txn_id"]
    if isinstance(txn, pa.ChunkedArray):
        txn = txn.combine_chunks()
    # the reference renders a literal null for absent transaction ids
    # (doc/movex-cdc.adoc INIT example: `"transaction_id": null`)
    txn_frag = pc.coalesce(
        pc.binary_join_element_wise(', "transaction_id": "', escape_json_string(txn), '"', ""),
        pa.array([', "transaction_id": null'] * n),
    )
    new_obj = _render_object(batch, fields, "new")
    old_obj = _render_object(batch, fields, "old")
    new_frag = pc.if_else(has_new, pc.binary_join_element_wise(', "new": ', new_obj, ""), pa.array([""] * n))
    old_frag = pc.if_else(has_old, pc.binary_join_element_wise(', "old": ', old_obj, ""), pa.array([""] * n))
    return pc.binary_join_element_wise(head, txn_frag, new_frag, old_frag, "}", "")


def validate_messages(batch: pa.Table, cfg: CaptureConfig) -> dict[str, int]:
    """KafkaMock-style conformance checks (reference `app/models/kafka_mock.rb:37-141`):

    JSON parseability, required envelope fields, operation in the long-name
    set, and the max-message-size limit. Raises on the first violation.
    Returns the running max produced-message bytes per topic — the
    ``max.message.bytes`` auto-raise watermark (operator A4, reference
    `app/models/kafka_base.rb:30-58`). Ascending-id-per-key ordering is
    checked by the sink validator (`movex_cdc_ray.stages.sink.SinkValidator`).
    """
    msgs = render_message_json(batch, cfg)
    env = attach_envelope(batch, cfg)
    topics = env["topic"].to_pylist()
    limit = cfg.max_message_bytes
    max_bytes_per_topic: dict[str, int] = {}
    for m, topic in zip(msgs.to_pylist(), topics):
        nbytes = len(m.encode())
        if nbytes > limit:
            raise ValueError(f"message exceeds {limit} bytes")
        if topic is not None:
            max_bytes_per_topic[topic] = max(max_bytes_per_topic.get(topic, 0), nbytes)
        doc = json.loads(m)
        for req in ("id", "schema", "tablename", "operation", "timestamp"):
            if req not in doc:
                raise ValueError(f"missing envelope field {req}")
        if doc["operation"] not in OP_LONG_NAMES.values():
            raise ValueError(f"bad operation {doc['operation']}")
    return max_bytes_per_topic
