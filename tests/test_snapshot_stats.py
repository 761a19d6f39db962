"""INIT snapshot load (S7) + statistics counters/rollup (A1/A2/A3)."""

import pyarrow as pa
import pytest
import ray.data as rd

from movex_cdc_ray.pipelines.replay import lake_to_pandas, run_epoch
from movex_cdc_ray.stages.stats import StatisticCounter, finalize_counters, time_rollup
from movex_cdc_ray.pipelines.snapshot import snapshot_events
from movex_cdc_ray.state.manifest import Manifest, new_writer_token
from movex_cdc_ray.synth import StreamSpec, config_for_spec, make_source_table


def test_snapshot_emits_init_events(ray_session, tmp_path):
    spec = StreamSpec(n_events=100, n_repos=3, paths_per_repo=10)
    cfg = config_for_spec(spec, num_partitions=2)
    src = make_source_table(spec)
    src_path = str(tmp_path / "src.parquet")
    import pyarrow.parquet as pq

    pq.write_table(src, src_path)
    t = cfg.tables[0]
    t.yn_initialization = True
    t.initialization_filter = "pc.not_equal(c('lang'), 'xx')"
    t.initialization_order_by = ["repo", "path"]
    ds = snapshot_events(src_path, cfg, t, first_stream_id=spec.first_id)
    out = ds.take_all()
    n_expected = len([x for x in src["lang"].to_pylist() if x != "xx"])
    assert len(out) == n_expected
    assert all(r["op"] == "i" for r in out)
    assert all(r["id"] < spec.first_id for r in out)
    assert all(r["new_content"] is not None for r in out)


def test_snapshot_then_merge_bootstraps_lake(ray_session, tmp_path):
    # INIT events flow through the same capture+merge path (lower-case i op)
    spec = StreamSpec(n_events=100, n_repos=2, paths_per_repo=5)
    cfg = config_for_spec(spec, num_partitions=2)
    src = make_source_table(spec)
    import glob

    import pyarrow.parquet as pq

    src_path = str(tmp_path / "src.parquet")
    pq.write_table(src, src_path)
    ds = snapshot_events(src_path, cfg, cfg.tables[0], first_stream_id=spec.first_id)
    # stage the INIT events as a chunk file and run one epoch over it
    init_dir = str(tmp_path / "init_chunks")
    ds.write_parquet(init_dir)
    init_chunk = sorted(glob.glob(init_dir + "/*.parquet"))
    lake = str(tmp_path / "lake")
    m = Manifest(lake_dir=lake)
    m, agg = run_epoch(cfg, m, 1, init_chunk, lake, new_writer_token())
    assert agg["events_success"] == spec.n_keys
    got = lake_to_pandas(lake)
    assert len(got) == spec.n_keys
    assert (got["_last_op"] == "i").all()


def test_statistic_counter_partials_merge():
    a, b = StatisticCounter(), StatisticCounter()
    a.increment(1, "I", "events_success", 5)
    b.increment(1, "I", "events_success", 7)
    b.increment(1, "U", "events_delayed_errors")
    a.merge(b)
    t = a.to_table()
    rows = {(r["table_id"], r["operation"], r["counter_type"]): r["events"] for r in t.to_pylist()}
    assert rows[(1, "I", "events_success")] == 12
    assert rows[(1, "U", "events_delayed_errors")] == 1


def test_finalize_counters_groupby(ray_session):
    t = pa.table(
        {
            "table_id": pa.array([1, 1, 1], pa.int32()),
            "operation": ["I", "I", "U"],
            "counter_type": ["events_success"] * 3,
            "events": pa.array([5, 7, 2], pa.int64()),
        }
    )
    out = finalize_counters(rd.from_arrow(t)).take_all()
    got = {(r["table_id"], r["operation"]): r["events"] for r in out}
    assert got == {(1, "I"): 12, (1, "U"): 2}


def test_time_rollup_buckets(ray_session):
    import numpy as np

    ts = pa.array(
        np.array(
            ["2024-01-01T00:10", "2024-01-01T00:50", "2024-01-01T01:10"], dtype="datetime64[us]"
        )
    )
    t = pa.table({"ts": ts, "k": ["a", "a", "a"], "v": pa.array([1.0, 2.0, 4.0])})
    out = time_rollup(rd.from_arrow(t), "ts", "hour", ["k"], ["v"]).take_all()
    by_bucket = {str(r["time_bucket"]): r for r in out}
    assert by_bucket["2024-01-01 00:00:00"]["sum_v"] == 3.0
    assert by_bucket["2024-01-01 00:00:00"]["n_rows"] == 2
    assert by_bucket["2024-01-01 01:00:00"]["sum_v"] == 4.0


def test_compress_epoch_stats(ray_session, tmp_path):
    from movex_cdc_ray.stages.stats import compress_epoch_stats
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream
    from movex_cdc_ray.pipelines.replay import replay
    import glob, os

    spec = StreamSpec(n_events=4_000, n_repos=4, paths_per_repo=20, chunk_size=500)
    stream, lake = str(tmp_path / "s"), str(tmp_path / "l")
    generate_stream(stream, spec)
    replay(stream, lake, config_for_spec(spec, num_partitions=2), chunks_per_epoch=1)
    per_epoch = glob.glob(os.path.join(lake, "_stats", "epoch=*.parquet"))
    assert len(per_epoch) == 8
    out = compress_epoch_stats(lake, keep_epochs=3)
    assert out["compressed_epochs"] == 5 and out["kept_epochs"] == 3
    import pyarrow.parquet as pq

    rolled = pq.read_table(out["rollup"]).to_pandas()
    assert set(rolled["part"]) <= {0, 1}
    assert (rolled["events_success"] > 0).any()
    # idempotent growth: second call with nothing old is a no-op
    assert compress_epoch_stats(lake, keep_epochs=3)["compressed_epochs"] == 0
