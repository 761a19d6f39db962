"""Capture configuration registry — the engine's "schema system".

Mirrors the reference's config tables (SCHEMAS / TABLES / COLUMNS / CONDITIONS /
COLUMN_EXPRESSIONS; see reference `db/migrate/20200108075106_create_tables.rb:3-17`,
`.../create_columns.rb:3-14`, `.../create_conditions.rb:3-12`,
`db/migrate/20250915000000_create_column_expressions.rb:3-11`) as plain Python
dataclasses with JSON import/export (reference
`app/models/import_export_config.rb:22-136`, operator S8 in SURVEY.md §2.1).

The whole registry round-trips as one JSON document; "trigger regeneration"
(reference `app/models/db_trigger.rb:38-92`, operator M1) maps to rebuilding the
compiled capture plan from this config — applied in-flight per Arrow batch.

Schema evolution is modelled as a list of :class:`SchemaVersion` entries, each
active from a change-event id onward (column add with null default, integer type
widen). This replaces the reference's "edit COLUMNS registry + regenerate
triggers" cycle.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any

# Key-handling modes, reference `app/models/table.rb:67-85` (operator M7):
#   N = none, P = primary-key JSON, F = fixed literal, T = transaction id,
#   E = arbitrary expression.
KEY_MODES = ("N", "P", "F", "T", "E")

# Operation codes, reference `app/helpers/key_helper.rb:2-10` (operator M10).
OPERATIONS = ("I", "U", "D", "i")
OP_LONG_NAMES = {"I": "INSERT", "U": "UPDATE", "D": "DELETE", "i": "INIT"}
LONG_NAME_OPS = {v: k for k, v in OP_LONG_NAMES.items()}


@dataclass
class ColumnConfig:
    """Per-column per-operation projection flags.

    Reference `db/migrate/20200108133919_create_columns.rb:3-14` — a column is
    included in the payload only for operations where its flag is set
    (operator M2).
    """

    name: str
    yn_log_insert: bool = True
    yn_log_update: bool = True
    yn_log_delete: bool = True

    def logs(self, op: str) -> bool:
        if op in ("I", "i"):
            return self.yn_log_insert
        if op == "U":
            return self.yn_log_update
        if op == "D":
            return self.yn_log_delete
        raise ValueError(f"unknown operation {op!r}")


@dataclass
class ConditionConfig:
    """Row predicate per (table, operation) — the trigger WHEN clause.

    Reference `db/migrate/20200123131722_create_conditions.rb:3-12` /
    `app/models/db_trigger_generator_oracle.rb:762-796` (operator M3).

    ``filter`` is an expression string evaluated vectorized over the batch via
    :func:`movex_cdc_ray.functions.scalar.eval_expr`; it must return a boolean
    mask. Column accessors: ``c('new_content')`` / ``c('old_lang')`` (the
    reference's ``:new.content`` / ``:old.lang``).
    """

    operation: str
    filter: str


@dataclass
class ColumnExpressionConfig:
    """Computed payload column per (table, operation).

    Reference `db/migrate/20250915000000_create_column_expressions.rb` and
    splice logic `app/models/db_trigger_generator_oracle.rb:620-754`
    (operator M6). ``sql`` is an expression string (same language as
    conditions) whose result is appended to the payload under ``name``.
    The old/new target is chosen like the reference (:762-796): expressions
    referencing only ``old_*`` accessors land in the ``old`` object, anything
    else in ``new``.
    """

    operation: str
    name: str
    sql: str

    def target(self) -> str:
        refs_old = "c('old_" in self.sql or 'c("old_' in self.sql
        refs_new = "c('new_" in self.sql or 'c("new_' in self.sql
        return "old" if (refs_old and not refs_new) else "new"


@dataclass
class SchemaVersion:
    """One version of the payload schema, active for events with id >= active_from_id.

    ``payload_fields`` maps field name -> arrow type name (``string``,
    ``int32``, ``int64``, ``float64``, ``timestamp[us]``, ``binary``).
    Evolution rules supported in-flight per batch: add column (null default)
    and integer type widen (int32 -> int64), mirroring the registry-edit +
    trigger-regenerate cycle of the reference (operator M1 / SURVEY §7.3 step 7).
    """

    version: int
    active_from_id: int
    payload_fields: dict[str, str]


@dataclass
class TableConfig:
    """One captured source table.

    Reference `db/migrate/20200108075106_create_tables.rb:3-17` plus the later
    extensions (yn_record_txid, initialization flags/filter/order, CloudEvents
    flag, pkey-only-payload flag — see SURVEY.md §1.4).
    """

    name: str
    schema_name: str
    table_id: int
    topic: str = ""
    key_handling: str = "P"  # N/P/F/T/E
    fixed_message_key: str | None = None
    key_expression: str | None = None
    pk_columns: list[str] = field(default_factory=list)
    yn_record_txid: bool = False
    yn_initialization: bool = False
    # 'Y' = snapshot reads the source AS-OF the trigger-activation point
    # (flashback SCN): INIT event ids stay strictly below the stream's first
    # id, so any stream event outranks any snapshot row. 'N' reads live data
    # — cheaper, but concurrent changes may already be folded into the
    # snapshot (reference db/migrate/20210226000000_extend_tables7.rb:3,
    # doc/movex-cdc.adoc initialization section).
    yn_initialize_with_flashback: bool = True
    initialization_filter: str | None = None
    initialization_order_by: list[str] = field(default_factory=list)
    yn_add_cloudevents_header: bool = False
    yn_payload_pkey_only: bool = False
    yn_hidden: bool = False
    columns: list[ColumnConfig] = field(default_factory=list)
    conditions: list[ConditionConfig] = field(default_factory=list)
    column_expressions: list[ColumnExpressionConfig] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.key_handling not in KEY_MODES:
            raise ValueError(f"key_handling must be one of {KEY_MODES}")
        if self.key_handling == "F" and not self.fixed_message_key:
            raise ValueError("fixed_message_key required for key mode F")
        if self.key_handling == "E" and not self.key_expression:
            raise ValueError("key_expression required for key mode E")
        # txn-id key mode needs the trigger to record transaction ids
        # (reference `app/models/table.rb:77-79`)
        if self.key_handling == "T" and not self.yn_record_txid:
            raise ValueError("key mode T requires yn_record_txid")
        if self.key_handling == "P" and not self.pk_columns:
            raise ValueError(
                "key mode P (primary key) requires pk_columns — use mode N for unkeyed tables"
            )
        # duplicate column-expression guard, reference
        # `app/models/column_expression.rb:12-18` (operator D2)
        seen = set()
        for ce in self.column_expressions:
            k = (ce.operation, ce.name)
            if k in seen:
                raise ValueError(f"duplicate column expression {k}")
            seen.add(k)

    def observed_columns(self, op: str) -> list[str]:
        """Columns whose changes the trigger OBSERVES for ``op`` (its
        UPDATE OF list) — unaffected by ``yn_payload_pkey_only``, which
        reduces the payload a message carries, never which changes fire."""
        return [c.name for c in self.columns if c.logs(op)]

    def logged_columns(self, op: str) -> list[str]:
        """Payload columns included for operation ``op`` (operator M2).

        ``yn_payload_pkey_only`` reduces the payload to the PK columns
        (reference `app/models/table.rb:131-133`).
        """
        cols = self.observed_columns(op)
        if self.yn_payload_pkey_only:
            cols = [c for c in cols if c in self.pk_columns]
        return cols

    def condition(self, op: str) -> str | None:
        for c in self.conditions:
            if c.operation == op:
                return c.filter
        return None

    def expressions(self, op: str) -> list[ColumnExpressionConfig]:
        return [e for e in self.column_expressions if e.operation == op]


@dataclass
class SchemaConfig:
    """Source schema + default topic, reference `app/models/schema.rb:1-13`."""

    name: str
    topic: str = ""


@dataclass
class ViewSpec:
    """An incrementally-maintained grouped-aggregate view over the lake.

    The merge computes each epoch's view delta from state it already holds
    (rows removed from the base vs rows written), so maintenance cost is
    ∝ delta keys — the lake is never rescanned. Maintained aggregates:
    ``n_rows`` (live-row count) and ``sum_<f>`` for every ``sum_fields``
    entry; both are self-inverse under retraction, which is what lets an
    UPDATE be applied as (new contribution − old contribution).
    """

    name: str
    group_by: list[str] = field(default_factory=list)
    sum_fields: list[str] = field(default_factory=list)
    # optional "SCHEMA.TABLE" scope: a multi-table stream keeps several
    # logical tables in ONE lake (key_string prefix) — an unscoped view
    # aggregates across all of them, a scoped one filters by key prefix
    table: str | None = None

    def __post_init__(self) -> None:
        import re

        if not re.fullmatch(r"[a-z0-9_]+", self.name or ""):
            raise ValueError(f"view name must be [a-z0-9_]+, got {self.name!r}")
        if not self.group_by:
            raise ValueError(f"view {self.name!r} needs at least one group_by column")
        overlap = set(self.group_by) & set(self.sum_fields)
        if overlap:
            raise ValueError(f"view {self.name!r}: {sorted(overlap)} in both group_by and sum_fields")


@dataclass
class CaptureConfig:
    """The full registry + engine runtime knobs.

    Runtime knobs mirror reference `config/application.rb:241-294`:
    ``max_transaction_size`` (batch cap, default 10_000), ``error_max_retries``
    (5), ``error_retry_start_delay`` (20 s, x3 exponential backoff,
    `transfer_thread.rb:361`). Ray-specific knobs: ``num_partitions`` (the
    key-hash partition count P — the reference's worker-thread modulo slice,
    `transfer_thread.rb:239-242`), ``hot_key_threshold`` / ``salt_factor``
    for skew salting (SURVEY §4 "Skew").
    """

    schemas: list[SchemaConfig] = field(default_factory=list)
    tables: list[TableConfig] = field(default_factory=list)
    schema_versions: list[SchemaVersion] = field(default_factory=list)
    num_partitions: int = 32
    # capture blocks per epoch — a JOB parameter like num_partitions: deriving
    # it from cluster size would change the combiner's reduction ratio (and
    # thus shuffle volume) between cluster sizes; must be >= 1
    capture_parallelism: int = 8
    # combiner batch size: events per capture batch fed to the last-per-key
    # combiner. None (default) keeps the read→capture operator FUSED (zero
    # object-store hop; combiner works per parquet row group) — fastest on a
    # single node. Setting ~400_000 coalesces batches so the combiner cuts
    # shuffle rows ~2.8× (measured 4.16M → 1.48M per 5M events) at the cost
    # of unfusing the read: the right trade on a multi-node cluster where
    # shuffle rows cross the NETWORK but the read hop stays node-local.
    # A JOB parameter — keep identical across cluster sizes (docs/SCALE.md).
    combine_batch_size: int | None = None
    max_transaction_size: int = 10_000
    error_max_retries: int = 5
    error_retry_start_delay: float = 20.0
    hot_key_threshold: int = 50_000
    salt_factor: int = 8
    max_message_bytes: int = 1_000_000
    # envelope/CloudEvents identity, reference `config/application.rb:232-294`:
    # DB_DEFAULT_TIMEZONE suffixes envelope timestamps; LEGACY_TS_FORMAT is
    # None/TYPE_1/TYPE_2 (`transfer_thread.rb:524-536`); CLOUDEVENTS_SOURCE
    # and the build version feed the ce_* headers (`transfer_thread.rb:663-679`)
    db_default_timezone: str = "+00:00"
    machine_timezone: str = "+0000"  # TYPE_1's %z rendering, pinned for determinism
    legacy_ts_format: str | None = None
    cloudevents_source: str = "MOVEX-CDC-ray"
    build_version: str = "1.0.0"
    # parquet codec for every lake/staging write (snappy | zstd | gzip |
    # lz4 | none): zstd roughly halves lake bytes at 100 TB for some write
    # CPU; digests hash VALUES, so the codec never affects determinism
    lake_compression: str = "snappy"
    # message-delivery codec (the reference producer's compression.type=gzip,
    # `app/models/kafka_java.rb:186-199`): "gzip" writes epoch=N.jsonl.gz
    # with a pinned mtime=0 header so crashed-epoch re-attempts stay
    # byte-identical; readers are extension-agnostic
    producer_compression: str = "none"
    # chaos-engineering hook (tests/ops drills): when set to a filesystem
    # path, the FIRST merge task to atomically create that sentinel file
    # hard-exits its worker process (os._exit — SIGKILL semantics, no
    # exception, no cleanup), simulating a node/worker loss mid-epoch.
    # Exactly-once then rests on Ray lineage retry + deterministic staged
    # paths + the atomic manifest commit; test_worker_crash.py asserts the
    # digest is byte-identical to an uninterrupted run. Never set in prod.
    fault_sentinel: str | None = None
    # incrementally-maintained grouped-aggregate views (rewrite merge mode
    # only: delta mode never loads the previous per-key state the retraction
    # needs — run_epoch validates)
    views: list[ViewSpec] = field(default_factory=list)

    def __post_init__(self) -> None:
        # capture_parallelism=0 historically meant "one block per CPU"; that
        # cluster-size derivation was removed (it skews scaling comparisons),
        # so a persisted 0 must fail loudly instead of silently serializing
        # the capture stage into a single block
        if self.capture_parallelism < 1:
            raise ValueError(
                f"capture_parallelism must be >= 1, got {self.capture_parallelism} "
                "(the old 0 = per-CPU auto mode was removed: it derived shuffle "
                "volume from cluster size)"
            )
        if self.num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {self.num_partitions}")
        names = [v.name for v in self.views]
        if len(names) != len(set(names)):
            raise ValueError(f"duplicate view names: {sorted(n for n in set(names) if names.count(n) > 1)}")
        if self.producer_compression not in ("none", "gzip"):
            raise ValueError(
                f"producer_compression must be 'none' or 'gzip', got "
                f"{self.producer_compression!r}"
            )

    # ---- lookups -----------------------------------------------------------
    def table_by_id(self, table_id: int) -> TableConfig:
        for t in self.tables:
            if t.table_id == table_id:
                return t
        raise KeyError(f"no table with id {table_id}")

    def table(self, schema_name: str, name: str) -> TableConfig:
        for t in self.tables:
            if t.schema_name == schema_name and t.name == name:
                return t
        raise KeyError(f"no table {schema_name}.{name}")

    def topic_for(self, table: TableConfig) -> str:
        """Topic routing: table topic falls back to schema topic.

        Reference `app/models/table.rb:186-192` (operator M11)."""
        if table.topic:
            return table.topic
        for s in self.schemas:
            if s.name == table.schema_name:
                return s.topic
        return ""

    def version_for_id(self, event_id: int) -> SchemaVersion:
        """Latest schema version active at ``event_id``."""
        if not self.schema_versions:
            raise ValueError("no schema versions configured")
        active = [v for v in self.schema_versions if v.active_from_id <= event_id]
        return max(active or self.schema_versions[:1], key=lambda v: v.version)

    def latest_version(self) -> SchemaVersion:
        return max(self.schema_versions, key=lambda v: v.version)

    # ---- JSON round-trip (operator S8) -------------------------------------
    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, doc: str) -> "CaptureConfig":
        d = json.loads(doc)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CaptureConfig":
        tables = []
        for td in d.get("tables", []):
            td = dict(td)
            td["columns"] = [ColumnConfig(**c) for c in td.get("columns", [])]
            td["conditions"] = [ConditionConfig(**c) for c in td.get("conditions", [])]
            td["column_expressions"] = [
                ColumnExpressionConfig(**c) for c in td.get("column_expressions", [])
            ]
            tables.append(TableConfig(**td))
        return cls(
            # an Engine export embeds per-schema "schema_rights" (authz state,
            # consumed by Engine.import_config) — not a SchemaConfig field
            schemas=[
                SchemaConfig(**{k: v for k, v in s.items() if k != "schema_rights"})
                for s in d.get("schemas", [])
            ],
            tables=tables,
            schema_versions=[SchemaVersion(**v) for v in d.get("schema_versions", [])],
            views=[ViewSpec(**v) for v in d.get("views", [])],
            **{
                k: d[k]
                for k in (
                    "num_partitions",
                    "capture_parallelism",
                    "combine_batch_size",
                    "max_transaction_size",
                    "error_max_retries",
                    "error_retry_start_delay",
                    "hot_key_threshold",
                    "salt_factor",
                    "max_message_bytes",
                    "db_default_timezone",
                    "machine_timezone",
                    "legacy_ts_format",
                    "cloudevents_source",
                    "build_version",
                    "lake_compression",
                    "producer_compression",
                    "fault_sentinel",
                )
                if k in d
            },
        )


def default_code_cdc_config(num_partitions: int = 32) -> CaptureConfig:
    """The north-rule configuration: a source-code table keyed by (repo, path).

    Payload columns (commit, lang, content, size); schema v2 adds ``stars``
    (column add) and widens ``size`` int32 -> int64.
    """
    v1 = SchemaVersion(
        version=1,
        active_from_id=0,
        payload_fields={
            "repo": "string",
            "path": "string",
            "commit": "string",
            "lang": "string",
            "content": "string",
            "size": "int32",
        },
    )
    v2 = SchemaVersion(
        version=2,
        active_from_id=1 << 62,  # inactive unless synth lowers it
        payload_fields={
            "repo": "string",
            "path": "string",
            "commit": "string",
            "lang": "string",
            "content": "string",
            "size": "int64",  # widened
            "stars": "int64",  # added
        },
    )
    table = TableConfig(
        name="FILES",
        schema_name="CODE",
        table_id=1,
        topic="lake.code.files",
        key_handling="P",
        pk_columns=["repo", "path"],
        yn_record_txid=True,  # transaction ids flow to the envelope
        columns=[
            ColumnConfig("repo"),
            ColumnConfig("path"),
            ColumnConfig("commit"),
            ColumnConfig("lang"),
            ColumnConfig("content"),
            ColumnConfig("size"),
            ColumnConfig("stars"),
        ],
    )
    return CaptureConfig(
        schemas=[SchemaConfig(name="CODE", topic="lake.code")],
        tables=[table],
        schema_versions=[v1, v2],
        num_partitions=num_partitions,
    )
