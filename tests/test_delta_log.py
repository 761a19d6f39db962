"""Delta-log merge mode + compaction: epoch cost ∝ delta, reads resolve
base+deltas, compaction converges to the rewrite-mode state byte-for-byte."""

import glob
import os

import pandas as pd
import pytest

from movex_cdc_ray.pipelines.replay import compact, lake_to_pandas, read_lake, replay
from movex_cdc_ray.state.manifest import Manifest
from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream

SPEC = StreamSpec(n_events=9_000, n_repos=6, paths_per_repo=30, chunk_size=1_500)
COLS = ["repo", "path", "commit", "content", "_last_id", "_last_op"]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_dl"))
    generate_stream(d, SPEC)
    return d


def test_delta_mode_matches_oracle_and_rewrite(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    delta_lake = str(tmp_path / "delta")
    replay(stream_dir, delta_lake, cfg, chunks_per_epoch=2, merge_mode="delta")
    m = Manifest.latest(delta_lake)
    assert any(p.get("deltas") for p in m.partitions.values())
    # merge-on-read resolution equals the oracle
    got = lake_to_pandas(delta_lake)
    exp = expected_lake_state(SPEC)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )
    # Dataset-level merge-on-read agrees too
    ds = read_lake(delta_lake, cfg=cfg)
    assert ds.count() == len(exp)


def test_compaction_converges_to_rewrite_state(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    rewrite_lake = str(tmp_path / "rw")
    replay(stream_dir, rewrite_lake, cfg, chunks_per_epoch=2, merge_mode="rewrite")
    delta_lake = str(tmp_path / "dl")
    replay(stream_dir, delta_lake, cfg, chunks_per_epoch=2, merge_mode="delta")
    m = compact(delta_lake, cfg)
    assert not any(p.get("deltas") for p in m.partitions.values())
    mr = Manifest.latest(rewrite_lake)
    # per-partition shas identical after compaction (byte-level convergence)
    assert {k: v["sha"] for k, v in m.partitions.items()} == {
        k: v["sha"] for k, v in mr.partitions.items()
    }
    # second compact is a no-op
    m2 = compact(delta_lake, cfg)
    assert m2.epoch == m.epoch


def test_periodic_compaction_during_replay(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "auto")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, merge_mode="delta", compact_every=2)
    m = Manifest.latest(lake)
    assert not any(p.get("deltas") for p in m.partitions.values())  # final compact ran
    got = lake_to_pandas(lake)
    exp = expected_lake_state(SPEC)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )


def test_delta_files_scale_with_delta_not_base(ray_session, stream_dir, tmp_path):
    # the point of the mode: per-epoch bytes written ∝ epoch delta, while
    # rewrite mode rewrites the whole touched base every epoch
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "sz")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, merge_mode="delta", gc_staging=False)
    sizes = {}
    for f in glob.glob(os.path.join(lake, "_staging", "epoch=*", "*.delta.parquet")):
        e = os.path.basename(os.path.dirname(f))
        sizes[e] = sizes.get(e, 0) + os.path.getsize(f)
    epochs = sorted(sizes)
    assert len(epochs) >= 4
    # later epochs don't grow with accumulated lake size (within 3x of first)
    assert sizes[epochs[-1]] < 3 * sizes[epochs[0]]
