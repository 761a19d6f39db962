"""Source-format interop: a CSV chunk stream replays to the identical lake
as the same stream in Parquet (operator S1 over a third wire format), with
null-vs-empty-string fidelity (QuotingStyle AllValid contract)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from movex_cdc_ray.sources.stream import (
    convert_chunks_to_csv,
    list_chunks,
    read_chunks,
)
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=6000, n_repos=6, paths_per_repo=20, chunk_size=2000)


def test_csv_stream_replays_to_identical_lake(ray_session, tmp_path):
    pq_stream = str(tmp_path / "pq_stream")
    cs_stream = str(tmp_path / "cs_stream")
    generate_stream(pq_stream, SPEC)
    convert_chunks_to_csv(pq_stream, cs_stream)
    assert len(list_chunks(cs_stream)) == len(list_chunks(pq_stream))

    cfg = config_for_spec(SPEC, num_partitions=4)
    lake_a = str(tmp_path / "lake_a")
    lake_b = str(tmp_path / "lake_b")
    shutil.rmtree(lake_a, ignore_errors=True)
    shutil.rmtree(lake_b, ignore_errors=True)
    rep_a = replay(pq_stream, lake_a, cfg, chunks_per_epoch=2)
    rep_b = replay(cs_stream, lake_b, cfg, chunks_per_epoch=2)
    assert rep_a.events_in == rep_b.events_in

    import pandas as pd

    a = lake_to_pandas(lake_a).reset_index(drop=True)
    b = lake_to_pandas(lake_b).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_csv_null_vs_empty_string_roundtrip(ray_session, tmp_path):
    # the fidelity CSV usually loses: '' and NULL are DIFFERENT payloads
    # (null_safe_not_equal treats them as a change; suppression must not)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(src)
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["", None], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(src, "chunk_000000.parquet"))
    convert_chunks_to_csv(src, dst)
    got = read_chunks(list_chunks(dst)).take_all()
    by_id = {r["id"]: r["content"] for r in got}
    assert by_id[1] == ""  # quoted "" stays an empty string
    assert by_id[2] is None  # unquoted empty stays a null
