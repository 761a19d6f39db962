"""Arrow schemas for the change-event stream, lake table, quarantine and stats.

The change-event record mirrors the reference's ``EVENT_LOGS`` staging row
(reference `db/migrate/20200115071231_create_event_logs.rb:10-24` plus
extensions; SURVEY.md §1.1): monotonic ``id`` defining total creation order,
``table_id``, one-char ``op`` (I/U/D/i), ``dbuser``, ``txn_id``,
``created_at`` and retry bookkeeping. The reference's CLOB JSON ``Payload``
("new"/"old" objects) is held COLUMNAR instead: flat ``new_<field>`` /
``old_<field>`` columns so every per-event transform stays a zero-copy Arrow
kernel; canonical JSON is rendered only at the sink boundary
(`movex_cdc_ray.stages.capture.render_payload_json`).
"""

from __future__ import annotations

import pyarrow as pa

_TYPE_MAP = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
}


def arrow_type(name: str) -> pa.DataType:
    try:
        return _TYPE_MAP[name]
    except KeyError:
        raise ValueError(f"unsupported payload type {name!r}") from None


# Fixed head columns of every change event (EVENT_LOGS analog).
EVENT_HEAD_FIELDS: list[tuple[str, pa.DataType]] = [
    ("id", pa.int64()),  # EVENT_LOGS.ID — total creation order
    ("table_id", pa.int32()),
    ("op", pa.string()),  # I/U/D/i
    ("dbuser", pa.string()),
    ("txn_id", pa.string()),
    ("created_at", pa.timestamp("us")),
    ("retry_count", pa.int32()),
]


def change_event_schema(payload_fields: dict[str, str]) -> pa.Schema:
    """Schema of one change-event chunk for a payload-field dict."""
    fields = [pa.field(n, t) for n, t in EVENT_HEAD_FIELDS]
    for name, typ in payload_fields.items():
        fields.append(pa.field(f"new_{name}", arrow_type(typ)))
    for name, typ in payload_fields.items():
        fields.append(pa.field(f"old_{name}", arrow_type(typ)))
    return pa.schema(fields)


def lake_schema(payload_fields: dict[str, str]) -> pa.Schema:
    """Schema of the converged lake table: payload columns + lineage meta."""
    fields = [pa.field(n, arrow_type(t)) for n, t in payload_fields.items()]
    fields += [
        pa.field("_last_id", pa.int64()),  # id of the last applied event
        pa.field("_last_op", pa.string()),
        pa.field("_last_ts", pa.timestamp("us")),
    ]
    return pa.schema(fields)


QUARANTINE_EXTRA_FIELDS = [
    ("error_time", pa.timestamp("us")),
    ("error_msg", pa.string()),
]


def quarantine_schema(event_schema: pa.Schema) -> pa.Schema:
    """EVENT_LOG_FINAL_ERRORS analog: event columns + error columns.

    Reference `db/migrate/20201013000000_create_event_log_final_errors.rb:8-26`.
    """
    return pa.schema(list(event_schema) + [pa.field(n, t) for n, t in QUARANTINE_EXTRA_FIELDS])


STATS_SCHEMA = pa.schema(
    [
        # STATISTICS analog, reference `db/migrate/20200519100000_create_statistics.rb:3-11`
        pa.field("table_id", pa.int32()),
        pa.field("operation", pa.string()),
        pa.field("counter_type", pa.string()),  # events_success / events_delayed_errors /
        # events_final_errors / events_d_and_c_retries / events_delayed_retries
        pa.field("events", pa.int64()),
        pa.field("end_timestamp", pa.timestamp("us")),
    ]
)


def align_to_schema(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Align a batch to ``schema``: add missing columns as nulls, cast widened
    types, drop extras, fix column order.

    This is the in-flight schema-evolution kernel (SURVEY §7.3 step 7): the
    reference achieves the same by editing the COLUMNS registry and
    regenerating triggers (operator M1); here every Arrow batch is aligned to
    the currently-active :class:`~movex_cdc_ray.config.SchemaVersion`.
    """
    n = len(t)
    cols = []
    names = set(t.column_names)
    for f in schema:
        if f.name in names:
            col = t.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(cols, schema=schema)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
