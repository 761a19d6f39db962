"""Round-3 fixes: config validation, locked-account denial, vectorized hex,
topic introspection verbs, config-drift reporting (VERDICT r2 #8-#10 +
ADVICE items)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from movex_cdc_ray.api import Engine
from movex_cdc_ray.auth import AuthRegistry, NotAuthorized, User
from movex_cdc_ray.config import CaptureConfig, default_code_cdc_config
from movex_cdc_ray.functions.scalar import raw_to_hex
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream


# ---- capture_parallelism contract (ADVICE replay.py:337) -------------------


def test_capture_parallelism_zero_rejected():
    with pytest.raises(ValueError, match="capture_parallelism"):
        CaptureConfig(capture_parallelism=0)
    # a persisted legacy config with 0 fails loudly on import, not silently
    cfg = default_code_cdc_config()
    doc = cfg.to_json().replace('"capture_parallelism": 8', '"capture_parallelism": 0')
    with pytest.raises(ValueError, match="capture_parallelism"):
        CaptureConfig.from_json(doc)
    with pytest.raises(ValueError, match="num_partitions"):
        CaptureConfig(num_partitions=0)


# ---- locked-account logon denial (ADVICE auth.py:135) ----------------------


def test_failed_logon_against_locked_account_is_denied():
    r = AuthRegistry(users=[User(email="locked@x", yn_account_locked=True, failed_logons=5)])
    with pytest.raises(NotAuthorized, match="locked"):
        r.record_logon("locked@x", success=False)
    u = r.users[0]
    assert u.failed_logons == 5  # NOT incremented past the lock point
    assert r.activity_table()["action"].to_pylist() == ["logon_denied"]


# ---- vectorized raw_to_hex (VERDICT wrong #2) ------------------------------


def test_raw_to_hex_vectorized_edge_cases():
    # empty values, empty array, nulls, sliced input, large payloads
    arr = pa.array([b"", b"\x00\xff\x10", None, b"\xde\xad\xbe\xef"], pa.binary())
    assert raw_to_hex(arr).to_pylist() == ["", "00FF10", None, "DEADBEEF"]
    assert raw_to_hex(pa.array([], pa.binary())).to_pylist() == []
    sliced = arr.slice(1, 3)
    assert raw_to_hex(sliced).to_pylist() == ["00FF10", None, "DEADBEEF"]
    big = bytes(np.arange(256, dtype=np.uint8).tobytes())
    assert raw_to_hex(pa.array([big])).to_pylist() == [big.hex().upper()]
    # large_binary path uses int64 offsets
    lb = pa.array([b"\x01", b"\xab\xcd"], pa.large_binary())
    assert raw_to_hex(lb).to_pylist() == ["01", "ABCD"]


# ---- topic introspection (VERDICT missing #2, routes.rb:29-33) -------------


def test_list_and_describe_topics(tmp_path):
    cfg = default_code_cdc_config()
    eng = Engine(cfg, str(tmp_path))
    assert eng.list_topics() == ["lake.code.files"]
    d = eng.describe_topic("lake.code.files")
    assert d["tables"] == ["CODE.FILES"]
    assert d["max_message_bytes"] == cfg.max_message_bytes
    assert d["observed_max_bytes"] == 0
    eng.observe_topic_watermarks({"lake.code.files": 4321})
    eng.observe_topic_watermarks({"lake.code.files": 1000})  # lower: ignored
    assert eng.describe_topic("lake.code.files")["observed_max_bytes"] == 4321
    with pytest.raises(KeyError):
        eng.describe_topic("nope")
    # table topic blank -> schema topic fallback appears in the listing
    cfg.tables[0].topic = ""
    assert eng.list_topics() == ["lake.code"]


# ---- config-drift report (VERDICT missing #1) ------------------------------


def test_health_check_reports_orphaned_lake_rows(ray_session, tmp_path):
    from movex_cdc_ray.pipelines.replay import replay

    spec = StreamSpec(n_events=600, n_repos=4, paths_per_repo=10, chunk_size=300)
    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    replay(stream, lake, cfg, chunks_per_epoch=2)

    eng = Engine(cfg, lake)
    hc = eng.health_check(check_drift=True)
    assert hc["config_drift"] is False
    assert hc["orphaned_table_rows"] == {}

    # drop the table from the config: every lake row is now orphaned state
    drifted = config_for_spec(spec, num_partitions=4)
    drifted.tables = []
    eng2 = Engine(drifted, lake)
    hc2 = eng2.health_check(check_drift=True)
    assert hc2["config_drift"] is True
    assert hc2["orphaned_table_rows"] == {"1": hc["lake_rows"]}


# ---- tombstone hygiene (ADVICE capture.py:199 + sink.py:196) ---------------


def _delete_heavy_lake(tmp_path, n_events=800):
    from movex_cdc_ray.pipelines.replay import replay

    spec = StreamSpec(n_events=n_events, n_repos=4, paths_per_repo=10,
                      chunk_size=400, delete_frac=0.3)
    stream, lake = str(tmp_path / "stream"), str(tmp_path / "lake")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    replay(stream, lake, cfg, chunks_per_epoch=2)
    return lake, cfg


def _fence_rows(lake):
    import glob

    import pyarrow.parquet as pq

    from movex_cdc_ray.state.manifest import Manifest

    m = Manifest.latest(lake)
    tabs = [pq.read_table(p["path"]) for p in m.partitions.values() if p.get("path")]
    rows = []
    for t in tabs:
        mask = pa.compute.equal(t["_last_op"], "D")
        rows.append(t.filter(mask))
    return pa.concat_tables(rows) if rows else None


def test_tombstone_rows_carry_no_payload(ray_session, tmp_path):
    """sink_fast capture leaves D rows' new image intact, but the lake fence
    must never retain deleted payload bytes (events_to_lake_rows nulls it)."""
    lake, cfg = _delete_heavy_lake(tmp_path)
    fences = _fence_rows(lake)
    assert fences is not None and len(fences) > 0  # delete-heavy: fences exist
    for f in cfg.latest_version().payload_fields:
        assert fences[f].null_count == len(fences), f"payload {f} retained on fences"


def test_purge_tombstones_drops_fences_and_keeps_live_state(ray_session, tmp_path):
    import glob
    import os

    from movex_cdc_ray.pipelines.replay import lake_to_pandas, purge_tombstones
    from movex_cdc_ray.state.manifest import Manifest

    lake, cfg = _delete_heavy_lake(tmp_path)
    before = lake_to_pandas(lake)
    sha_before = {k: v["sha"] for k, v in Manifest.latest(lake).partitions.items()}
    m = purge_tombstones(lake, cfg)
    assert m.metrics.get("purge_tombstones") is True
    fences = _fence_rows(lake)
    assert fences is None or len(fences) == 0
    after = lake_to_pandas(lake)
    pd_testing_cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    assert before[pd_testing_cols].reset_index(drop=True).equals(
        after[pd_testing_cols].reset_index(drop=True)
    )
    # live-row digests unchanged (the digest never covered fences)
    sha_after = {k: v["sha"] for k, v in Manifest.latest(lake).partitions.items()}
    assert sha_after == sha_before
    # idempotent no-op when nothing left to purge
    assert purge_tombstones(lake, cfg).epoch == m.epoch


def test_purge_tombstones_refuses_pending_retries(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.replay import purge_tombstones

    lake, cfg = _delete_heavy_lake(tmp_path)
    fake = os.path.join(lake, "_retry", "epoch=000099", "part=00001.parquet")
    os.makedirs(os.path.dirname(fake), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), fake)
    with pytest.raises(RuntimeError, match="retry backlog"):
        purge_tombstones(lake, cfg)


def test_lake_compression_codec_config(ray_session, tmp_path):
    """cfg.lake_compression switches the lake codec (a CONFIG field — merge
    tasks run in Ray workers, which don't see driver env mutations);
    converged state is identical across codecs and the field round-trips
    through config JSON."""
    import dataclasses
    import glob as _glob

    import pyarrow.parquet as pq

    from movex_cdc_ray.config import CaptureConfig
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=3000, n_repos=4, paths_per_repo=10, chunk_size=1500)
    stream = str(tmp_path / "s")
    generate_stream(stream, spec)

    lakes = {}
    for codec in ("snappy", "zstd"):
        cfg = dataclasses.replace(config_for_spec(spec, num_partitions=2),
                                  lake_compression=codec)
        assert CaptureConfig.from_json(cfg.to_json()).lake_compression == codec
        lake = str(tmp_path / f"lake_{codec}")
        replay(stream, lake, cfg, chunks_per_epoch=2)
        f = next(p for p in _glob.glob(lake + "/_staging/epoch=*/part=*.parquet"))
        meta = pq.ParquetFile(f).metadata
        assert meta.row_group(0).column(0).compression.lower() == codec
        lakes[codec] = lake_to_pandas(lake).reset_index(drop=True)
    assert lakes["snappy"].equals(lakes["zstd"])


def test_health_check_default_is_scanless(ray_session, tmp_path):
    """Default health_check must not include the O(lake) drift scan."""
    from movex_cdc_ray.api import Engine
    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=2000, n_repos=3, paths_per_repo=8, chunk_size=1000)
    stream, lake = str(tmp_path / "s"), str(tmp_path / "l")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)
    replay(stream, lake, cfg, chunks_per_epoch=2)
    hc = Engine(cfg, lake).health_check()
    assert "config_drift" not in hc or hc["config_drift"] is None


def test_decode_stage_empty_frame_batch_schema_order(ray_session):
    """Empty sentinel batches must emit the SAME column order as non-empty
    ones (mixed blocks otherwise fail Arrow concatenation)."""
    from movex_cdc_ray.functions.multimodal import DecodeStage, synth_media_table

    st = DecodeStage()
    full = synth_media_table(3, seed=1)
    full = full.append_column("frame_idx", pa.array([0, 1, 2], pa.int32()))
    out_full = st(full)
    out_empty = st(full.slice(0, 0))
    assert out_empty.schema.names == out_full.schema.names


def test_pair_key_guard_rejects_31bit_overflow(ray_session):
    import pyarrow as _pa
    import ray.data as rd

    from movex_cdc_ray.functions.dedup import ngram_jaccard_pairs

    t = _pa.table({"doc_id": _pa.array([1 << 31, (1 << 31) + 1], _pa.int64()),
                   "text": _pa.array(["same words here now", "same words here now"])})
    with pytest.raises((ValueError, Exception), match="31-bit|31"):
        ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.4, ship="pairs")


# ---- sink_mode lake byte-identity (ADVICE capture.py:199) -------------------


def test_sink_mode_lake_byte_identity(ray_session, tmp_path, monkeypatch):
    """project_for_sink=True (sink_fast capture) and the full capture mode
    must produce byte-identical partition base files — including tombstone
    rows, whose payload is re-nulled at lake-row construction
    (sink.events_to_lake_rows) precisely so sink_fast's skipped D-row
    nulling cannot leak deleted payload bytes into the lake."""
    from movex_cdc_ray.pipelines import replay as replay_mod
    from movex_cdc_ray.pipelines.replay import CapturePartitionStage, replay
    from movex_cdc_ray.state.manifest import Manifest

    spec = StreamSpec(
        n_events=4_000, n_repos=6, paths_per_repo=25, chunk_size=2_000, delete_frac=0.2
    )
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    lake_a = str(tmp_path / "lake_a")
    lake_b = str(tmp_path / "lake_b")
    replay(stream, lake_a, cfg, chunks_per_epoch=2)  # default: sink_mode capture

    class FullModeStage(CapturePartitionStage):
        def __init__(self, cfg, **kw):
            kw["project_for_sink"] = False
            super().__init__(cfg, **kw)

    monkeypatch.setattr(replay_mod, "CapturePartitionStage", FullModeStage)
    replay(stream, lake_b, cfg, chunks_per_epoch=2)

    ma, mb = Manifest.latest(lake_a), Manifest.latest(lake_b)
    assert set(ma.partitions) == set(mb.partitions) and ma.partitions
    for p, meta in ma.partitions.items():
        with open(meta["path"], "rb") as fa, open(mb.partitions[p]["path"], "rb") as fb:
            assert fa.read() == fb.read(), f"partition {p} diverged between capture modes"


# ---- GDPR-style targeted erasure (delete_where) -----------------------------


def test_delete_where_erases_payload_and_keeps_fences(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.replay import delete_where, lake_to_pandas, replay
    from movex_cdc_ray.state.manifest import Manifest

    spec = StreamSpec(n_events=4_000, n_repos=6, paths_per_repo=25, chunk_size=2_000)
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(stream, lake, cfg, chunks_per_epoch=2)

    before = lake_to_pandas(lake)
    target = before["repo"].iloc[0]
    n_target = int((before["repo"] == target).sum())
    assert n_target > 0

    m, n_erased = delete_where(lake, cfg, "repo", [target])
    assert n_erased == n_target
    after = lake_to_pandas(lake)
    # live view: the erased repo is gone, everything else untouched
    assert (after["repo"] != target).all()
    rest = before[before["repo"] != target].reset_index(drop=True)
    pd.testing.assert_frame_equal(after.reset_index(drop=True), rest)
    # the fences persist physically with nulled payload and retained keys/ids
    erased_keys = 0
    for p in m.partitions.values():
        t = pq.read_table(p["path"]).to_pandas()
        fences = t[t["_last_op"] == "D"]
        erased = fences[fences["_key"].str.contains("\x1f" + "", regex=False)]
        nulled = fences[fences["repo"].isna() & fences["content"].isna()]
        erased_keys += len(nulled)
        assert fences["_last_id"].notna().all()
    assert erased_keys >= n_erased
    # idempotent: a second erasure of the same values is a no-op commit
    m2, n2 = delete_where(lake, cfg, "repo", [target])
    assert n2 == 0 and m2.epoch == m.epoch
    # resume after erasure is a no-op (no chunks pending)
    rep = replay(stream, lake, cfg, chunks_per_epoch=2)
    assert rep.epochs == 0


def test_delete_where_guards(ray_session, tmp_path):
    from movex_cdc_ray.config import ViewSpec
    from movex_cdc_ray.pipelines.replay import delete_where, replay

    spec = StreamSpec(n_events=1_000, n_repos=3, paths_per_repo=10, chunk_size=500)
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)
    lake = str(tmp_path / "lake")
    replay(stream, lake, cfg, chunks_per_epoch=2)
    with pytest.raises(ValueError, match="payload column"):
        delete_where(lake, cfg, "_key", ["x"])
    cfg.views = [ViewSpec(name="v", group_by=["repo"])]
    with pytest.raises(RuntimeError, match="views"):
        delete_where(lake, cfg, "repo", ["r0"])
