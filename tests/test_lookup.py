"""Point lookup: the single-key, single-partition state read
(`pipelines.replay.lookup_key`). Must agree with the full-lake read for
every key — present, deleted (tombstone → empty) and absent — in both
rewrite and delta-log merge modes, and honor time travel."""

import pandas as pd
import pytest

from movex_cdc_ray.pipelines.replay import lake_to_pandas, lookup_key, replay
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=5_000, n_repos=5, paths_per_repo=25, chunk_size=1_000)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_lk"))
    generate_stream(d, SPEC)
    return d


@pytest.fixture(scope="module", params=["rewrite", "delta"])
def lake(request, ray_session, stream_dir, tmp_path_factory):
    cfg = config_for_spec(SPEC, num_partitions=4)
    if request.param == "delta":
        cfg.merge_mode = "delta"
    d = str(tmp_path_factory.mktemp(f"lake_lk_{request.param}"))
    replay(stream_dir, d, cfg, chunks_per_epoch=2)
    return d


def test_lookup_every_live_key_matches_full_read(lake):
    full = lake_to_pandas(lake).set_index("_key")
    # sample across partitions: every 7th key
    for key in list(full.index)[::7]:
        got = lookup_key(lake, key)
        assert len(got) == 1, key
        row = got.iloc[0]
        exp = full.loc[key]
        assert row["_last_id"] == exp["_last_id"]
        assert row["content"] == exp["content"]


def test_lookup_absent_and_deleted_keys_empty(lake):
    assert lookup_key(lake, "no/such\x1fkey").empty
    # a key that was deleted and never re-upserted: find one via the synth
    # oracle — tombstone fences must NOT surface through the lookup
    full = lake_to_pandas(lake)
    import pyarrow.parquet as pq

    from movex_cdc_ray.state.manifest import Manifest

    m = Manifest.latest(lake)
    fenced = set()
    for p in m.partitions.values():
        paths = ([p["path"]] if p.get("path") else []) + list(p.get("deltas") or [])
        for f in paths:
            t = pq.read_table(f, columns=["_key", "_last_op"])
            df = t.to_pandas()
            fenced |= set(df.loc[df["_last_op"] == "D", "_key"])
    dead = fenced - set(full["_key"])
    assert dead, "stream spec produced no net-deleted keys; enlarge spec"
    for key in list(dead)[:5]:
        assert lookup_key(lake, key).empty


def test_lookup_time_travel(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    lake = str(tmp_path / "lake_tt")
    replay(stream_dir, lake, cfg, chunks_per_epoch=1)
    old = lake_to_pandas(lake, at_epoch=4).set_index("_key")
    key = old.index[3]
    got = lookup_key(lake, key, at_epoch=4)
    assert len(got) == 1
    assert got.iloc[0]["_last_id"] == old.loc[key]["_last_id"]


def test_engine_lookup_verb(lake):
    from movex_cdc_ray.api import Engine

    cfg = config_for_spec(SPEC, num_partitions=4)
    eng = Engine(cfg, lake)
    full = lake_to_pandas(lake)
    key = full["_key"].iloc[0]
    assert len(eng.lookup(key)) == 1


def test_enrich_with_lake_matches_pandas_merge(lake, ray_session):
    import numpy as np
    import ray.data as rd

    from movex_cdc_ray.pipelines.replay import enrich_with_lake

    full = lake_to_pandas(lake)
    # probe stream: every 3rd live key + some absent keys
    probe_keys = list(full["_key"])[::3] + ["absent\x1fkey1", "absent\x1fkey2"]
    probe = pd.DataFrame(
        {"req_id": np.arange(len(probe_keys), dtype="int64"), "key_string": probe_keys}
    )
    out = (
        enrich_with_lake(rd.from_pandas(probe), lake, lake_columns=["content", "_last_id"])
        .to_pandas()
        .sort_values("req_id")
        .reset_index(drop=True)
    )
    exp = probe.merge(
        full[["_key", "content", "_last_id"]], how="left",
        left_on="key_string", right_on="_key",
    ).drop(columns=["_key"]).sort_values("req_id").reset_index(drop=True)
    assert len(out) == len(exp)
    assert out["content"].fillna("∅").tolist() == exp["content"].fillna("∅").tolist()
    assert out["_last_id"].fillna(-1).tolist() == exp["_last_id"].fillna(-1).tolist()
    # absent keys survive with NULL lake columns (left join semantics)
    assert out.loc[out["key_string"].str.startswith("absent"), "content"].isna().all()
