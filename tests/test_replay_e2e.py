"""End-to-end replay: deterministic synthetic change stream → lake, compared
against the pure-python oracle (the mirror of the reference's TransferThread
end-to-end test, `test/models/transfer_thread_test.rb:39-137`)."""

import hashlib
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from movex_cdc_ray.config import ConditionConfig
from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from movex_cdc_ray.stages.stats import health_check
from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream

SPEC = StreamSpec(
    n_events=12_000, n_repos=8, paths_per_repo=40, chunk_size=3_000, evolve_at_event=9_000
)
COLS = ["repo", "path", "commit", "lang", "content", "_last_id", "_last_op"]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    generate_stream(d, SPEC)
    return d


def _run(stream_dir, lake_dir, cfg, **kw):
    return replay(stream_dir, lake_dir, cfg, chunks_per_epoch=2, **kw)


def test_lake_matches_oracle(ray_session, stream_dir, tmp_lake):
    cfg = config_for_spec(SPEC, num_partitions=8)
    rep = _run(stream_dir, tmp_lake, cfg)
    assert rep.epochs == 2
    got = lake_to_pandas(tmp_lake)
    exp = expected_lake_state(SPEC)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )
    # per-row content sha256 invariant vs the oracle
    got_sha = got["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    exp_sha = exp["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    assert got_sha.tolist() == exp_sha.tolist()


def test_schema_evolution_applied(ray_session, stream_dir, tmp_lake):
    cfg = config_for_spec(SPEC, num_partitions=8)
    _run(stream_dir, tmp_lake, cfg)
    got = lake_to_pandas(tmp_lake)
    assert "stars" in got.columns  # column added mid-stream
    # rows updated after the boundary carry stars; earlier rows are NULL
    post = got[got["_last_id"] >= SPEC.first_id + SPEC.evolve_at_event]
    pre = got[got["_last_id"] < SPEC.first_id + SPEC.evolve_at_event]
    assert post["stars"].notna().all()
    assert pre["stars"].isna().all()
    # size widened to int64 in every partition file
    from movex_cdc_ray.state.manifest import Manifest

    m = Manifest.latest(tmp_lake)
    for p in m.partitions.values():
        sch = pq.read_schema(p["path"])
        assert str(sch.field("size").type) == "int64"


def test_condition_filtered_replay(ray_session, stream_dir, tmp_lake):
    # condition drops lang='xx' INSERTs; later updates still upsert (M3)
    cfg = config_for_spec(SPEC, num_partitions=8)
    cfg.tables[0].conditions = [ConditionConfig("I", "pc.not_equal(c('new_lang'), 'xx')")]
    _run(stream_dir, tmp_lake, cfg)
    got = lake_to_pandas(tmp_lake)
    exp = expected_lake_state(SPEC, drop_lang_xx_inserts=True)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )


def test_resume_is_noop_and_ordering_clean(ray_session, stream_dir, tmp_lake):
    cfg = config_for_spec(SPEC, num_partitions=8)
    rep1 = _run(stream_dir, tmp_lake, cfg)
    assert all(m["ordering_violations"] == 0 for m in rep1.epoch_metrics)
    rep2 = _run(stream_dir, tmp_lake, cfg)
    assert rep2.epochs == 0 and rep2.events_in == 0
    hc = health_check(tmp_lake)
    assert hc["chunks_consumed"] == 4
    assert hc["lake_rows"] == len(expected_lake_state(SPEC))
    assert hc["retry_backlog"] == 0 and hc["final_errors"] == 0


def test_salted_two_stage_merge_same_result(ray_session, stream_dir, tmp_lake):
    cfg = config_for_spec(SPEC, num_partitions=8)
    hot = frozenset(
        f"CODE.FILES\x1frepo-0\x1fsrc/mod{p//20}/file{p}.txt" for p in range(SPEC.paths_per_repo)
    )
    rep = _run(stream_dir, tmp_lake, cfg, hot_keys=hot, salted=True)
    assert rep.epochs == 2
    got = lake_to_pandas(tmp_lake)
    exp = expected_lake_state(SPEC)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )


def test_resume_across_schema_evolution_boundary(ray_session, stream_dir, tmp_path):
    # run 1 stops before the evolution boundary (v1 chunks only); run 2
    # resumes through it — final state and shas equal a one-shot replay
    from movex_cdc_ray.state.manifest import Manifest

    cfg = config_for_spec(SPEC, num_partitions=8)
    split_lake = str(tmp_path / "split")
    rep1 = replay(stream_dir, split_lake, cfg, chunks_per_epoch=1, max_epochs=2)
    assert rep1.epochs == 2  # pre-boundary only (boundary at chunk 3 of 4)
    rep2 = replay(stream_dir, split_lake, cfg, chunks_per_epoch=1)
    oneshot_lake = str(tmp_path / "oneshot")
    replay(stream_dir, oneshot_lake, cfg, chunks_per_epoch=4)
    ms, mo = Manifest.latest(split_lake), Manifest.latest(oneshot_lake)
    assert {k: v["sha"] for k, v in ms.partitions.items()} == {
        k: v["sha"] for k, v in mo.partitions.items()
    }
    got = lake_to_pandas(split_lake)
    assert "stars" in got.columns
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True),
        expected_lake_state(SPEC)[COLS].reset_index(drop=True),
    )


def test_winners_shuffle_mode_matches(ray_session, stream_dir, tmp_path):
    # the two-phase winner-filter exchange converges byte-identically
    from movex_cdc_ray.state.manifest import Manifest

    cfg = config_for_spec(SPEC, num_partitions=8)
    a, b = str(tmp_path / "gb"), str(tmp_path / "win")
    replay(stream_dir, a, cfg, chunks_per_epoch=2, shuffle_mode="groupby")
    replay(stream_dir, b, cfg, chunks_per_epoch=2, shuffle_mode="winners")
    ma, mb = Manifest.latest(a), Manifest.latest(b)
    assert {k: v["sha"] for k, v in ma.partitions.items()} == {
        k: v["sha"] for k, v in mb.partitions.items()
    }
    pd.testing.assert_frame_equal(
        lake_to_pandas(b)[COLS].reset_index(drop=True),
        expected_lake_state(SPEC)[COLS].reset_index(drop=True),
    )


def test_files_shuffle_mode_matches(ray_session, stream_dir, tmp_path):
    # the file-shuffle exchange (delta parquet partitioned by part, one raw
    # merge task per partition) converges byte-identically — including the
    # round-5 keyless exchange + dictionary-encoded column path, which the
    # delta parquet round-trips
    from movex_cdc_ray.state.manifest import Manifest

    cfg = config_for_spec(SPEC, num_partitions=8)
    a, b = str(tmp_path / "gb"), str(tmp_path / "files")
    replay(stream_dir, a, cfg, chunks_per_epoch=2, shuffle_mode="groupby")
    replay(stream_dir, b, cfg, chunks_per_epoch=2, shuffle_mode="files")
    ma, mb = Manifest.latest(a), Manifest.latest(b)
    assert {k: v["sha"] for k, v in ma.partitions.items()} == {
        k: v["sha"] for k, v in mb.partitions.items()
    }
    pd.testing.assert_frame_equal(
        lake_to_pandas(b)[COLS].reset_index(drop=True),
        expected_lake_state(SPEC)[COLS].reset_index(drop=True),
    )


def test_winners_partition_fallback_matches(ray_session, stream_dir, tmp_path, monkeypatch):
    """The per-partition winner-collection fallback (driver never holds the
    winner set) converges byte-identically to the default groupby exchange;
    auto mode picks it when the epoch exceeds WINNER_DRIVER_LIMIT."""
    import movex_cdc_ray.pipelines.replay as rp
    from movex_cdc_ray.state.manifest import Manifest

    cfg = config_for_spec(SPEC, num_partitions=8)
    a, b, c = str(tmp_path / "gb"), str(tmp_path / "wpart"), str(tmp_path / "wauto")
    replay(stream_dir, a, cfg, chunks_per_epoch=2, shuffle_mode="groupby")
    replay(stream_dir, b, cfg, chunks_per_epoch=2, shuffle_mode="winners",
           winner_collect="partition")
    # auto: a tiny threshold forces every epoch onto the fallback path
    monkeypatch.setattr(rp, "WINNER_DRIVER_LIMIT", 10)
    replay(stream_dir, c, cfg, chunks_per_epoch=2, shuffle_mode="winners")
    sha = lambda d: {k: v["sha"] for k, v in Manifest.latest(d).partitions.items()}
    assert sha(a) == sha(b) == sha(c)
    pd.testing.assert_frame_equal(
        lake_to_pandas(b)[COLS].reset_index(drop=True),
        expected_lake_state(SPEC)[COLS].reset_index(drop=True),
    )
    # winner scratch files are consumed after the merge
    import glob
    assert glob.glob(os.path.join(b, "_winners", "*", "*")) == []


def test_empty_capture_epochs_still_commit(ray_session, tmp_path):
    # a condition that drops EVERY event: each epoch captures zero rows but
    # must still commit its manifest, advance the chunk ledger, and leave
    # an empty (or absent) lake; a follow-up unfiltered replay on a FRESH
    # lake from the same stream converges normally
    from movex_cdc_ray.state.manifest import Manifest

    spec = StreamSpec(n_events=4_000, n_repos=4, paths_per_repo=20, chunk_size=1_000)
    stream = str(tmp_path / "s")
    generate_stream(stream, spec)

    cfg = config_for_spec(spec, num_partitions=4)
    cfg.tables[0].conditions = [
        ConditionConfig("I", "pc.equal(c('new_lang'), 'no-such-lang')"),
        ConditionConfig("U", "pc.equal(c('new_lang'), 'no-such-lang')"),
        ConditionConfig("D", "pc.equal(c('new_lang'), 'no-such-lang')"),
    ]
    lake_empty = str(tmp_path / "l1")
    rep = replay(stream, lake_empty, cfg, chunks_per_epoch=2)
    assert rep.epochs == 2 and rep.lake_rows == 0
    m = Manifest.latest(lake_empty)
    assert m.chunks_consumed == 4  # ledger advanced past every chunk
    # resume is a no-op on the fully-consumed stream
    rep2 = replay(stream, lake_empty, cfg, chunks_per_epoch=2)
    assert rep2.epochs == 0
    # sanity: same stream, unfiltered config, fresh lake converges normally
    lake_full = str(tmp_path / "l2")
    rep3 = replay(stream, lake_full, config_for_spec(spec, num_partitions=4), chunks_per_epoch=2)
    assert rep3.lake_rows > 0


def test_condition_on_evolved_column_null_drops(ray_session, tmp_path):
    # SQL trigger semantics: a predicate must evaluate TRUE to capture.
    # Pre-boundary events align the evolved column to NULL, the condition
    # evaluates NULL, and the event is dropped — so a stars-predicate lake
    # contains ONLY post-boundary state
    spec = StreamSpec(n_events=4_000, n_repos=4, paths_per_repo=20,
                      chunk_size=1_000, evolve_at_event=2_000)
    stream = str(tmp_path / "s")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    cfg.tables[0].conditions = [ConditionConfig("I", "pc.greater(c('new_stars'), -1)")]
    lake = str(tmp_path / "l")
    replay(stream, lake, cfg, chunks_per_epoch=2)
    got = lake_to_pandas(lake)
    assert len(got) > 0
    assert got["stars"].notna().all()
    assert (got["_last_id"] >= spec.first_id + spec.evolve_at_event).all()
