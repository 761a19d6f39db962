"""Multi-table capture + merge: two configured tables sharing a stream must
never collide in the lake, even with identical PK values (key_string is
prefixed by the qualified table name; lake rows carry _table_id)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from movex_cdc_ray.config import ColumnConfig, TableConfig, default_code_cdc_config
from movex_cdc_ray.pipelines.replay import lake_to_pandas, run_epoch
from movex_cdc_ray.state.manifest import Manifest, new_writer_token
from movex_cdc_ray.events import align_to_schema, change_event_schema


def _events(table_id, ids, repo="same-repo", path="same-path"):
    n = len(ids)
    cfg = default_code_cdc_config()
    schema = change_event_schema(cfg.latest_version().payload_fields)
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "table_id": pa.array([table_id] * n, pa.int32()),
            "op": pa.array(["I"] * n, pa.string()),
            "dbuser": pa.array(["u"] * n),
            "txn_id": pa.array(["t"] * n),
            "created_at": pa.array(np.array(ids, dtype="datetime64[us]")),
            "retry_count": pa.array([0] * n, pa.int32()),
            "new_repo": pa.array([repo] * n),
            "new_path": pa.array([path] * n),
            "new_commit": pa.array([f"c{i}" for i in ids]),
            "new_lang": pa.array(["py"] * n),
            "new_content": pa.array([f"content-{table_id}-{i}" for i in ids]),
        }
    )
    return align_to_schema(t, schema)


def test_two_tables_same_pk_do_not_collide(ray_session, tmp_path):
    cfg = default_code_cdc_config(num_partitions=2)
    second = TableConfig(
        name="DOCS",
        schema_name="CODE",
        table_id=2,
        key_handling="P",
        pk_columns=["repo", "path"],
        columns=[ColumnConfig(c) for c in ("repo", "path", "commit", "lang", "content", "size", "stars")],
    )
    cfg.tables.append(second)

    chunk = str(tmp_path / "chunk.parquet")
    both = pa.concat_tables([_events(1, [10, 11]), _events(2, [12, 13])])
    pq.write_table(both, chunk)

    lake = str(tmp_path / "lake")
    m, agg = run_epoch(cfg, Manifest(lake_dir=lake), 1, [chunk], lake, new_writer_token())
    assert agg["events_success"] == 2  # one upserted row per (table, key)
    got = lake_to_pandas(lake)
    assert len(got) == 2  # same (repo, path) PK but different tables
    assert sorted(got["_table_id"].tolist()) == [1, 2]
    assert got["_key"].str.startswith("CODE.FILES\x1f").sum() == 1
    assert got["_key"].str.startswith("CODE.DOCS\x1f").sum() == 1
    # last-writer-wins applied independently per table
    by_table = got.set_index("_table_id")["_last_id"]
    assert by_table[1] == 11 and by_table[2] == 13


def test_unconfigured_table_events_ignored(ray_session, tmp_path):
    cfg = default_code_cdc_config(num_partitions=2)
    chunk = str(tmp_path / "chunk.parquet")
    pq.write_table(pa.concat_tables([_events(1, [1]), _events(99, [2])]), chunk)
    lake = str(tmp_path / "lake")
    m, agg = run_epoch(cfg, Manifest(lake_dir=lake), 1, [chunk], lake, new_writer_token())
    got = lake_to_pandas(lake)
    assert len(got) == 1 and got["_table_id"].tolist() == [1]
