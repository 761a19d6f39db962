"""Source introspection — list candidate schemas / tables / columns of a
parquet source to seed a :class:`CaptureConfig`.

The reference GUI builds its config from live DB metadata: ``db_schemas#index``
(schemas the acting user may see), ``db_tables#index`` (tables of one schema,
filtered by the user's SELECT grants — `app/models/db_table.rb`,
`app/controllers/db_tables_controller.rb:4-9`) and ``db_columns#index``
(columns of one table, `app/models/db_column.rb:7-27`;
routes `config/routes.rb:12-17`). Here the "source database" is a directory
of parquet datasets, so the same verbs are pure filesystem + parquet-footer
metadata reads — no data scan, no Ray session needed.

Source layout, mirroring owner→table→column:

* a source ROOT whose subdirectories each hold parquet files — every
  subdirectory is a schema (name uppercased, like Oracle owners), every
  ``*.parquet`` file or parquet-holding subdirectory inside it is a table;
* a FLAT directory of parquet files — a single schema named after the
  directory itself (`/root/testdata/sf0.01` → schema ``SF0.01`` would be
  odd, so flat dirs report schema ``MAIN`` — SQLite's attached-main analog,
  matching the reference's SQLITE arm which has no owner concept).

Column listing reads only the parquet FOOTER of one fragment (schema +
row-group stats), the ``PRAGMA_TABLE_INFO`` / ``DBA_Tab_Columns`` analog.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow.parquet as pq

from ..config import CaptureConfig, ColumnConfig, SchemaConfig, SchemaVersion, TableConfig

FLAT_SCHEMA_NAME = "MAIN"


def _is_parquet_table(path: str) -> bool:
    """A table is a ``*.parquet`` file or a directory containing at least
    one (possibly partitioned) parquet fragment at its top level."""
    if os.path.isfile(path):
        return path.endswith(".parquet")
    if os.path.isdir(path):
        try:
            entries = os.listdir(path)
        except OSError:
            return False
        return any(e.endswith(".parquet") for e in entries) or any(
            "=" in e and os.path.isdir(os.path.join(path, e)) for e in entries
        )
    return False


def _table_name(entry: str) -> str:
    return entry[: -len(".parquet")] if entry.endswith(".parquet") else entry


def _schema_dirs(source_root: str) -> dict[str, str]:
    """Map schema name -> directory. Flat dir of parquet files = MAIN."""
    if not os.path.isdir(source_root):
        raise FileNotFoundError(f"source root {source_root!r} is not a directory")
    entries = sorted(os.listdir(source_root))
    if any(e.endswith(".parquet") for e in entries):
        return {FLAT_SCHEMA_NAME: source_root}
    out = {}
    for e in entries:
        p = os.path.join(source_root, e)
        if os.path.isdir(p) and any(
            _is_parquet_table(os.path.join(p, f)) for f in os.listdir(p)
        ):
            out[e.upper()] = p
    return out


def list_source_schemas(source_root: str) -> list[str]:
    """``db_schemas#index`` analog: schema names present under the source."""
    return sorted(_schema_dirs(source_root))


def list_source_tables(source_root: str, schema_name: str) -> list[str]:
    """``db_tables#index`` analog: candidate table names of one schema.

    Grant filtering (`DbTable.all_by_schema`'s db_user semi-join) is the
    caller's job — :meth:`Engine.list_source_tables` applies the acting
    user's schema grant before delegating here."""
    dirs = _schema_dirs(source_root)
    if schema_name not in dirs:
        raise KeyError(f"no schema {schema_name!r} under {source_root!r}")
    d = dirs[schema_name]
    return sorted(
        {_table_name(e) for e in os.listdir(d) if _is_parquet_table(os.path.join(d, e))}
    )


def _table_path(source_root: str, schema_name: str, table_name: str) -> str:
    d = _schema_dirs(source_root)[schema_name]
    for cand in (os.path.join(d, table_name + ".parquet"), os.path.join(d, table_name)):
        if _is_parquet_table(cand):
            return cand
    raise KeyError(f"no table {schema_name}.{table_name} under {source_root!r}")


def list_source_columns(
    source_root: str, schema_name: str, table_name: str
) -> list[dict[str, Any]]:
    """``db_columns#index`` analog: name + arrow type per column, from the
    parquet footer only (no data read)."""
    path = _table_path(source_root, schema_name, table_name)
    if os.path.isdir(path):
        frags = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not frags:  # hive-partitioned: descend one level
            for sub in sorted(os.listdir(path)):
                subp = os.path.join(path, sub)
                if os.path.isdir(subp):
                    frags = sorted(
                        os.path.join(subp, f)
                        for f in os.listdir(subp)
                        if f.endswith(".parquet")
                    )
                    if frags:
                        break
        path = frags[0]
    schema = pq.read_schema(path)
    return [{"name": f.name, "type": str(f.type), "nullable": f.nullable} for f in schema]


def seed_capture_config(
    source_root: str,
    schema_name: str,
    table_name: str,
    pk_columns: list[str],
    table_id: int = 1,
    topic: str = "",
    num_partitions: int = 32,
) -> CaptureConfig:
    """Build a ready-to-run :class:`CaptureConfig` for one source table from
    introspection alone — the GUI's add-table flow (pick schema → pick table
    → all columns observed, keys chosen by the operator) as one call.

    Every introspected column is captured (the GUI's select-all default);
    the payload field types come straight from the parquet footer, so the
    snapshot/INIT path and the capture plan agree with the source from the
    first epoch."""
    cols = list_source_columns(source_root, schema_name, table_name)
    names = {c["name"] for c in cols}
    missing = [k for k in pk_columns if k not in names]
    if missing:
        raise ValueError(f"pk columns {missing} not in {schema_name}.{table_name}")

    def _field_type(arrow_type: str) -> str:
        # map footer types onto the engine's canonical payload type names
        # (events.py:_TYPE_MAP); anything unmapped captures as string, the
        # reference's to_char fallback in the trigger body
        if arrow_type in ("int8", "int16", "int32"):
            return "int32"
        if arrow_type in ("int64", "uint32", "uint64"):
            return "int64"
        if arrow_type == "float":
            return "float32"
        if arrow_type == "double" or arrow_type.startswith("decimal"):
            return "float64"
        if arrow_type == "bool":
            return "bool"
        if arrow_type in ("binary", "large_binary"):
            return "binary"
        if arrow_type.startswith("timestamp"):
            return "timestamp[us]"
        if arrow_type == "large_string":
            return "large_string"
        return "string"

    version = SchemaVersion(
        version=1,
        active_from_id=0,
        payload_fields={c["name"]: _field_type(c["type"]) for c in cols},
    )
    table = TableConfig(
        name=table_name,
        schema_name=schema_name,
        table_id=table_id,
        topic=topic,
        key_handling="P",
        pk_columns=list(pk_columns),
        columns=[ColumnConfig(c["name"]) for c in cols],
    )
    return CaptureConfig(
        schemas=[SchemaConfig(name=schema_name, topic=topic)],
        tables=[table],
        schema_versions=[version],
        num_partitions=num_partitions,
    )
