"""Round-2 hardening: partitioning fence, config-driven sink invariant,
content-sha fold, multi-table old-PK projection (ADVICE items r1)."""

import hashlib

import pyarrow as pa
import pytest

from movex_cdc_ray.config import (
    CaptureConfig,
    ColumnConfig,
    SchemaConfig,
    SchemaVersion,
    TableConfig,
    default_code_cdc_config,
)
from movex_cdc_ray.stages.sink import (
    content_sha_array,
    invariant_columns,
    make_invariant_check,
    partition_sha,
    sha_source_columns,
)
from movex_cdc_ray.state.manifest import Manifest


# ---------------------------------------------------------------- A4 fence
def test_partitioning_fence_on_resume(tmp_path):
    m = Manifest(lake_dir=str(tmp_path))
    m = m.commit_epoch(1, [], {}, "tok", num_partitions=8)
    m2 = Manifest.latest(str(tmp_path))
    assert m2.num_partitions == 8
    m2.check_partitioning(8)  # same P is fine
    with pytest.raises(RuntimeError, match="partitioning mismatch"):
        m2.check_partitioning(16)
    with pytest.raises(RuntimeError, match="hash scheme"):
        m2.check_partitioning(8, hash_scheme="other_v9")


def test_partitioning_fence_unset_is_permissive(tmp_path):
    Manifest(lake_dir=str(tmp_path)).check_partitioning(4)  # legacy manifests: no fence


# -------------------------------------------------- A2 config-driven invariant
def _pkey_only_cfg() -> CaptureConfig:
    t = TableConfig(
        name="T", schema_name="S", table_id=1, key_handling="P",
        pk_columns=["repo", "path"], yn_payload_pkey_only=True,
        columns=[ColumnConfig("repo"), ColumnConfig("path"), ColumnConfig("content")],
    )
    v = SchemaVersion(1, 0, {"repo": "string", "path": "string", "content": "string"})
    return CaptureConfig(schemas=[SchemaConfig("S")], tables=[t], schema_versions=[v])


def test_invariant_cols_default_is_content():
    cols = invariant_columns(default_code_cdc_config())
    assert cols == {1: ["new_content"]}


def test_invariant_cols_pkey_only_requires_pk_not_content():
    cols = invariant_columns(_pkey_only_cfg())
    assert cols == {1: ["new_repo", "new_path"]}
    check = make_invariant_check(cols)
    good = pa.table(
        {
            "op": ["I", "D"],
            "table_id": pa.array([1, 1], pa.int32()),
            "new_repo": ["r", None],  # DELETE may carry nulls
            "new_path": ["p", None],
            "new_content": [None, None],  # pkey-only: content never logged
        }
    )
    check(good)  # must NOT raise — content is not required
    bad = pa.table(
        {
            "op": ["I"],
            "table_id": pa.array([1], pa.int32()),
            "new_repo": [None],
            "new_path": ["p"],
            "new_content": [None],
        }
    )
    with pytest.raises(ValueError, match="NULL repo"):
        check(bad)


# ------------------------------------------------------- content-sha machinery
def test_content_sha_array_matches_hashlib():
    t = pa.table({"new_content": ["abc", None, "déjà"]})
    got = content_sha_array(t, ["content"], prefix="new_").to_pylist()
    exp = [hashlib.sha256(s.encode()).hexdigest() for s in ["abc", "", "déjà"]]
    assert got == exp


def test_partition_sha_without_content_column():
    # config without a 'content' payload: digest over all payload columns
    lake = pa.table(
        {
            "a": ["x", "y"],
            "b": pa.array([1, 2], pa.int64()),
            "_key": ["k1", "k2"],
            "_last_id": pa.array([10, 11], pa.int64()),
        }
    )
    s1 = partition_sha(lake, sha_cols=["a", "b"])
    assert len(s1) == 64
    lake2 = lake.set_column(0, "a", pa.array(["x", "z"]))
    assert partition_sha(lake2, sha_cols=["a", "b"]) != s1


def test_partition_sha_uses_stored_column_and_matches_recompute():
    content = ["hello", "world"]
    shas = [hashlib.sha256(c.encode()).hexdigest() for c in content]
    base = {
        "content": content,
        "_key": ["k1", "k2"],
        "_last_id": pa.array([1, 2], pa.int64()),
    }
    with_col = pa.table({**base, "_content_sha": shas})
    without = pa.table(base)
    assert partition_sha(with_col) == partition_sha(without)


def test_sha_source_columns():
    assert sha_source_columns(["repo", "content", "size"]) == ["content"]
    assert sha_source_columns(["a", "b"]) == ["a", "b"]


# ----------------------------------------------- A1 multi-table old-PK keep-set
def test_project_for_sink_keeps_all_tables_pk_old_columns():
    from movex_cdc_ray.pipelines.replay import CapturePartitionStage

    cfg = default_code_cdc_config(num_partitions=4)
    t2 = TableConfig(
        name="OTHER", schema_name="CODE", table_id=2, key_handling="P",
        pk_columns=["commit"],  # different PK than table 1's (repo, path)
        columns=[ColumnConfig("commit"), ColumnConfig("lang")],
    )
    cfg.tables.append(t2)
    stage = CapturePartitionStage(cfg, project_for_sink=True)
    assert "old_repo" in stage.keep and "old_path" in stage.keep
    assert "old_commit" in stage.keep  # table 2's PK old-image survives projection
    assert "old_content" not in stage.keep  # non-PK old image still dropped


def test_repartition_lake_end_to_end(ray_session, tmp_path):
    # converge at P=4, repartition to P=8, verify identical content, then
    # continue replaying NEW chunks at the new P (fence lifted)
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, repartition_lake, replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream

    spec = StreamSpec(n_events=6_000, n_repos=6, paths_per_repo=25, chunk_size=1_500)
    stream, lake = str(tmp_path / "s"), str(tmp_path / "l")
    generate_stream(stream, spec)
    cfg4 = config_for_spec(spec, num_partitions=4)
    replay(stream, lake, cfg4, chunks_per_epoch=2, max_epochs=1)  # half the stream
    before = lake_to_pandas(lake)

    cfg8 = config_for_spec(spec, num_partitions=8)
    with pytest.raises(RuntimeError, match="partitioning mismatch"):
        replay(stream, lake, cfg8, chunks_per_epoch=2)

    m = repartition_lake(lake, cfg8, 8)
    assert m.num_partitions == 8 and len(m.partitions) <= 8
    mid = lake_to_pandas(lake)
    cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    import pandas as pd
    pd.testing.assert_frame_equal(before[cols].reset_index(drop=True),
                                  mid[cols].reset_index(drop=True))

    replay(stream, lake, cfg8, chunks_per_epoch=2)  # finish at the new P
    got = lake_to_pandas(lake)
    exp = expected_lake_state(spec)
    pd.testing.assert_frame_equal(got[cols].reset_index(drop=True),
                                  exp[cols].reset_index(drop=True))
