"""Coverage for the remaining survey operators: final-error retention GC,
the ascending-id sink validator, hot-key detection, and snapshot+tail
composition (the 'flashback SCN' no-overlap property)."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay, run_epoch
from movex_cdc_ray.pipelines.snapshot import snapshot_events
from movex_cdc_ray.stages.errors import housekeeping_final_errors
from movex_cdc_ray.stages.partitioning import detect_hot_keys
from movex_cdc_ray.stages.sink import SinkValidator
from movex_cdc_ray.state.manifest import Manifest, new_writer_token
from movex_cdc_ray.synth import (
    StreamSpec,
    config_for_spec,
    expected_lake_state,
    generate_stream,
    make_source_table,
)


def test_housekeeping_final_errors_retention(tmp_path):
    lake = str(tmp_path)
    for epoch in (1, 5, 9):
        p = os.path.join(lake, "_final_errors", f"epoch={epoch:06d}", "part=00000.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(pa.table({"id": [1]}), p)
    removed = housekeeping_final_errors(lake, keep_epochs=4, current_epoch=10)
    assert removed == 2  # epochs 1 and 5 dropped, 9 kept
    left = glob.glob(os.path.join(lake, "_final_errors", "epoch=*", "*.parquet"))
    assert len(left) == 1 and "epoch=000009" in left[0]


def test_sink_validator_detects_regression():
    v = SinkValidator()
    b1 = pa.table({"msg_key": ["a", "b"], "id": [1, 2]})
    b2 = pa.table({"msg_key": ["a", "b"], "id": [5, 4]})
    v.observe(b1)
    v.observe(b2)
    v.assert_ok()
    bad = pa.table({"msg_key": ["a"], "id": [3]})  # below a's last id 5
    v.observe(bad)
    with pytest.raises(AssertionError, match="non-ascending"):
        v.assert_ok()


def test_detect_hot_keys(ray_session):
    t = pa.table(
        {
            "key_string": ["hot"] * 500 + ["cold1", "cold2"] * 10,
            "id": list(range(520)),
        }
    )
    hot = detect_hot_keys(rd.from_arrow(t), threshold=100)
    assert hot == frozenset({"hot"})


def test_snapshot_then_tail_replay_composes(ray_session, tmp_path):
    # INIT load of the source table, then the change-stream tail: keys never
    # touched by the tail keep their snapshot state; touched keys follow the
    # tail winners — snapshot ids live below first_id so they never outrank
    # a tail event (the reference's flashback-SCN no-overlap guarantee, S7)
    spec = StreamSpec(n_events=2_000, n_repos=4, paths_per_repo=25, chunk_size=1_000)
    cfg = config_for_spec(spec, num_partitions=4)
    cfg.tables[0].yn_initialization = True

    src_path = str(tmp_path / "src.parquet")
    pq.write_table(make_source_table(spec), src_path)
    init_dir = str(tmp_path / "init")
    snapshot_events(src_path, cfg, cfg.tables[0], first_stream_id=spec.first_id).write_parquet(init_dir)

    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)

    lake = str(tmp_path / "lake")
    m = Manifest(lake_dir=lake)
    token = new_writer_token()
    init_chunks = sorted(glob.glob(init_dir + "/*.parquet"))
    # INIT files go through extra_event_files: the chunk ledger counts
    # *stream-dir* ordinals and must not be advanced by snapshot input
    m, agg = run_epoch(cfg, m, 1, [], lake, token, extra_event_files=init_chunks)
    assert agg["events_success"] == spec.n_keys
    rep = replay(stream, lake, cfg, chunks_per_epoch=1)
    got = lake_to_pandas(lake)

    tail = expected_lake_state(spec).set_index(["repo", "path"])
    got_i = got.set_index(["repo", "path"])
    # every key exists (snapshot covers the full key space); tail-touched
    # keys must match the tail oracle exactly
    n_deleted = spec.n_keys - len(tail.index.union(got_i.index).drop_duplicates())
    for key, row in tail.iterrows():
        assert got_i.loc[key, "commit"] == row["commit"]
        assert got_i.loc[key, "_last_id"] == row["_last_id"]
    # untouched keys still carry snapshot state (op 'i', id below stream ids)
    untouched = got_i[~got_i.index.isin(tail.index)]
    assert (untouched["_last_op"] == "i").all()
    assert (untouched["_last_id"] < spec.first_id).all()


def test_lake_to_lake_migration_via_snapshot(ray_session, tmp_path):
    # migration/bootstrap path: an existing lake is snapshot-loaded (op 'i')
    # into a brand-new lake with a different partition count — final payload
    # state identical, lineage reset below the stream id range
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay, run_epoch

    spec = StreamSpec(n_events=2_000, n_repos=4, paths_per_repo=20, chunk_size=1_000)
    cfg8 = config_for_spec(spec, num_partitions=8)
    src_stream = str(tmp_path / "stream")
    old_lake = str(tmp_path / "old")
    generate_stream(src_stream, spec)
    replay(src_stream, old_lake, cfg8, chunks_per_epoch=1)
    old = lake_to_pandas(old_lake)

    # export the old lake's payload as a source table and INIT-load it into a
    # new lake with P=2
    src_path = str(tmp_path / "export.parquet")
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(
            old[["repo", "path", "commit", "lang", "content", "size", "stars"]],
            preserve_index=False,
        ),
        src_path,
    )
    cfg2 = config_for_spec(spec, num_partitions=2)
    init_dir = str(tmp_path / "init")
    snapshot_events(src_path, cfg2, cfg2.tables[0], first_stream_id=spec.first_id).write_parquet(init_dir)
    import glob

    new_lake = str(tmp_path / "new")
    m = Manifest(lake_dir=new_lake)
    run_epoch(cfg2, m, 1, [], new_lake, new_writer_token(),
              extra_event_files=sorted(glob.glob(init_dir + "/*.parquet")))
    new = lake_to_pandas(new_lake)
    cols = ["repo", "path", "commit", "lang", "content"]
    pd.testing.assert_frame_equal(
        old.sort_values(["repo", "path"])[cols].reset_index(drop=True),
        new.sort_values(["repo", "path"])[cols].reset_index(drop=True),
    )
    assert (new["_last_op"] == "i").all()


def test_scd2_history_semantics(ray_session, tmp_path):
    # crafted stream: u1 has 3 versions, the last closed by a tombstone;
    # u2 has one open (current) version
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.queries import cdc_scd2_history

    events = pa.table(
        {
            "event_id": [1, 3, 5, 7, 2],
            "user_id": [1, 1, 1, 1, 2],
            "event_type": ["create", "update", "update", "error", "create"],
            "value": [10.0, 11.0, 12.0, 0.0, 99.0],
            "ts": pd.to_datetime([1, 2, 3, 4, 5], unit="s"),
            "props": ["{}"] * 5,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    got = cdc_scd2_history(str(d))
    u1 = got[got["user_id"] == 1]
    assert u1["valid_from_id"].tolist() == [1, 3, 5]
    assert u1["valid_to_id"].tolist() == [3, 5, 7]  # tombstone id closes v3
    assert u1["is_current"].tolist() == [0, 0, 0]  # tombstoned: no current
    u2 = got[got["user_id"] == 2]
    assert u2["valid_to_id"].isna().all() and u2["is_current"].tolist() == [1]
