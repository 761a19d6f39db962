"""Time-travel reads: manifests are immutable and staged paths are
per-epoch, so `read_lake(at_epoch=N)` reconstructs any retained epoch's
state exactly; `Manifest.gc(keep_epochs=K)` is the retention window."""

import os

import pandas as pd
import pytest

from movex_cdc_ray.pipelines.replay import lake_to_pandas, read_lake, replay
from movex_cdc_ray.state.manifest import Manifest
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=5_000, n_repos=5, paths_per_repo=25, chunk_size=1_000)
COLS = ["repo", "path", "commit", "content", "_last_id", "_last_op"]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_tt"))
    generate_stream(d, SPEC)
    return d


def test_time_travel_within_retention(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1)  # 5 epochs, gc keeps 2
    # reference state: an independent replay stopped at epoch 4
    ref = str(tmp_path / "ref")
    replay(stream_dir, ref, cfg, chunks_per_epoch=1, max_epochs=4)
    got = lake_to_pandas(lake, at_epoch=4)
    exp = lake_to_pandas(ref)
    pd.testing.assert_frame_equal(
        got[COLS].reset_index(drop=True), exp[COLS].reset_index(drop=True)
    )
    # the Dataset read path agrees
    ds = read_lake(lake, at_epoch=4)
    assert ds.count() == len(exp)


def test_time_travel_outside_retention_raises(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake2")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1)
    with pytest.raises(KeyError, match="retained"):
        Manifest.at_epoch(lake, 1)


def test_time_travel_unbounded_without_gc(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake3")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, gc_staging=False)
    ref = str(tmp_path / "ref1")
    replay(stream_dir, ref, cfg, chunks_per_epoch=1, max_epochs=1)
    pd.testing.assert_frame_equal(
        lake_to_pandas(lake, at_epoch=1)[COLS].reset_index(drop=True),
        lake_to_pandas(ref)[COLS].reset_index(drop=True),
    )


def test_missing_data_file_is_loud(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake4")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1)
    victim = Manifest.latest(lake).data_files()[0]
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="housekept"):
        read_lake(lake)


def test_diff_epochs(ray_session, stream_dir, tmp_path):
    from movex_cdc_ray.pipelines.replay import diff_epochs

    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_diff")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, gc_staging=False)
    last = Manifest.latest(lake).epoch
    got = diff_epochs(lake, 1, last).to_pandas()

    a = lake_to_pandas(lake, at_epoch=1).set_index("_key")["_last_id"]
    b = lake_to_pandas(lake, at_epoch=last).set_index("_key")["_last_id"]
    exp_added = set(b.index) - set(a.index)
    exp_deleted = set(a.index) - set(b.index)
    exp_updated = {k for k in set(a.index) & set(b.index) if a[k] != b[k]}
    assert set(got[got["change"] == "added"]["_key"]) == exp_added
    assert set(got[got["change"] == "deleted"]["_key"]) == exp_deleted
    assert set(got[got["change"] == "updated"]["_key"]) == exp_updated
    assert len(got) == len(exp_added) + len(exp_deleted) + len(exp_updated)
    # ids faithful on both sides
    upd = got[got["change"] == "updated"].set_index("_key")
    for k in list(exp_updated)[:5]:
        assert upd.loc[k, "from_last_id"] == float(a[k])
        assert upd.loc[k, "to_last_id"] == float(b[k])


def test_diff_epochs_across_repartition_refused(ray_session, stream_dir, tmp_path):
    import json

    from movex_cdc_ray.pipelines.replay import diff_epochs

    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_rp")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, gc_staging=False)
    # forge an older manifest with a different partition count
    p = os.path.join(lake, "_manifests", "epoch-000001.json")
    d = json.load(open(p))
    d["num_partitions"] = 8
    json.dump(d, open(p, "w"))
    with pytest.raises(ValueError, match="incompatible partitioning"):
        diff_epochs(lake, 1, Manifest.latest(lake).epoch)


def test_diff_epochs_resolves_delta_chains(ray_session, stream_dir, tmp_path):
    # delta-log mode: partition entries carry base + delta chains; the diff
    # task must resolve them (arg-max per key) before comparing
    from movex_cdc_ray.pipelines.replay import diff_epochs

    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_dd")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, gc_staging=False,
           merge_mode="delta")
    last = Manifest.latest(lake).epoch
    got = diff_epochs(lake, 1, last).to_pandas()
    a = lake_to_pandas(lake, at_epoch=1).set_index("_key")["_last_id"]
    b = lake_to_pandas(lake, at_epoch=last).set_index("_key")["_last_id"]
    assert set(got[got["change"] == "added"]["_key"]) == set(b.index) - set(a.index)
    assert set(got[got["change"] == "deleted"]["_key"]) == set(a.index) - set(b.index)
    assert set(got[got["change"] == "updated"]["_key"]) == {
        k for k in set(a.index) & set(b.index) if a[k] != b[k]
    }
