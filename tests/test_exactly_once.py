"""Exactly-once semantics under retries, crashes and replays (SURVEY §7.5
item 1) — the Ray analog of the reference's Kafka-transaction bracket tests
and the KafkaMock ascending-id assertion."""

import glob
import os

import pandas as pd
import pytest

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay, run_epoch
from movex_cdc_ray.sources.stream import list_chunks
from movex_cdc_ray.state.manifest import Manifest, new_writer_token
from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream

SPEC = StreamSpec(n_events=6_000, n_repos=6, paths_per_repo=30, chunk_size=1_500)
COLS = ["repo", "path", "commit", "content", "_last_id", "_last_op"]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_eo"))
    generate_stream(d, SPEC)
    return d


def _shas(lake_dir):
    m = Manifest.latest(lake_dir)
    return {k: v["sha"] for k, v in m.partitions.items()}


def test_crash_before_commit_converges(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    replay(stream_dir, clean, cfg, chunks_per_epoch=1)

    replay(stream_dir, crashed, cfg, chunks_per_epoch=1, gc_staging=False)
    # simulate dying after staging epoch 4's files but before its commit
    manifests = sorted(glob.glob(os.path.join(crashed, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    rep = replay(stream_dir, crashed, cfg, chunks_per_epoch=1)
    assert rep.epochs == 1  # only the lost epoch re-ran
    assert _shas(clean) == _shas(crashed)
    pd.testing.assert_frame_equal(lake_to_pandas(clean)[COLS], lake_to_pandas(crashed)[COLS])


def test_duplicate_chunk_replay_deduped_by_watermark(ray_session, stream_dir, tmp_path):
    # feed the SAME chunk twice via the extra-files channel: watermarks must
    # drop every replayed event (T2/D1)
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_dup")
    chunks = list_chunks(stream_dir)
    m = Manifest(lake_dir=lake)
    token = new_writer_token()
    m, agg1 = run_epoch(cfg, m, 1, chunks[:2], lake, token)
    before = _shas(lake)
    rows_before = lake_to_pandas(lake)[COLS]
    # replay chunk 0 again in epoch 2
    m, agg2 = run_epoch(cfg, m, 2, [], lake, token, extra_event_files=[chunks[0]])
    assert agg2["events_success"] == 0
    assert agg2["events_below_watermark"] > 0
    pd.testing.assert_frame_equal(lake_to_pandas(lake)[COLS], rows_before)


def test_epoch_fencing_rejects_stale_writer(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_fence")
    replay(stream_dir, lake, cfg, chunks_per_epoch=2)
    stale = Manifest(lake_dir=lake)  # zombie that never saw the commits
    with pytest.raises(RuntimeError, match="fencing"):
        run_epoch(cfg, stale, 1, list_chunks(stream_dir)[:1], lake, new_writer_token())


def test_rerun_same_epoch_is_idempotent(ray_session, stream_dir, tmp_path):
    # run epoch 1 twice from the same pre-state (task-retry analog): staged
    # files are overwritten in place and byte-identical
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_retry")
    chunks = list_chunks(stream_dir)[:2]
    m0 = Manifest(lake_dir=lake)
    token = new_writer_token()
    m1, _ = run_epoch(cfg, m0, 1, chunks, lake, token)
    sha1 = _shas(lake)
    # wipe the manifest (not the staged data), re-run identically
    for f in glob.glob(os.path.join(lake, "_manifests", "*.json")):
        os.remove(f)
    m2, _ = run_epoch(cfg, Manifest(lake_dir=lake), 1, chunks, lake, token)
    assert _shas(lake) == sha1


def test_chunk_ledger_advances(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_ledger")
    rep = replay(stream_dir, lake, cfg, chunks_per_epoch=3)
    m = Manifest.latest(lake)
    assert m.chunks_consumed == len(list_chunks(stream_dir))
    assert rep.epochs == 2
