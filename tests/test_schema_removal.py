"""Schema evolution: COLUMN REMOVAL (the third registry edit besides add and
widen — the reference's drop-column-from-COLUMNS + regenerate-trigger cycle).
A SchemaVersion whose payload_fields omit a column makes align_to_schema drop
it from every batch (capture) AND from previously-written bases (merge loads
+ schema-evolves the base), so a mid-stream removal converges cleanly."""

import pandas as pd
import pytest

from movex_cdc_ray.config import SchemaVersion, default_code_cdc_config
from movex_cdc_ray.stages.capture import CaptureStage
from movex_cdc_ray.synth import (
    StreamSpec,
    config_for_spec,
    expected_lake_state,
    generate_stream,
)
from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from tests.test_capture import ev, make_batch


def _with_removal(cfg, active_from_id):
    latest = cfg.schema_versions[-1]
    fields = {k: v for k, v in latest.payload_fields.items() if k != "lang"}
    cfg.schema_versions.append(
        SchemaVersion(version=latest.version + 1,
                      active_from_id=active_from_id, payload_fields=fields)
    )
    return cfg


def test_capture_drops_removed_column():
    cfg = _with_removal(default_code_cdc_config(), active_from_id=0)
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I", content="abc")]))
    assert "new_lang" not in out.column_names
    assert "old_lang" not in out.column_names
    assert "new_content" in out.column_names


def test_replay_with_mid_stream_column_removal(ray_session, tmp_path):
    spec = StreamSpec(n_events=6_000, n_repos=5, paths_per_repo=30,
                      chunk_size=1_500, evolve_at_event=3_000)
    stream = str(tmp_path / "s")
    generate_stream(stream, spec)

    # phase 1: two chunks under the v1/v2 config — lake bases CARRY lang
    lake = str(tmp_path / "l")
    cfg = config_for_spec(spec, num_partitions=4)
    replay(stream, lake, cfg, chunks_per_epoch=2, max_epochs=1)
    assert "lang" in lake_to_pandas(lake).columns

    # phase 2: resume under a config whose NEWEST version removes lang —
    # remaining chunks capture without it and the merge schema-evolves the
    # existing bases, so the column disappears from the converged lake
    cfg2 = _with_removal(config_for_spec(spec, num_partitions=4),
                         active_from_id=spec.first_id + 4_500)
    replay(stream, lake, cfg2, chunks_per_epoch=2)

    got = lake_to_pandas(lake)
    assert "lang" not in got.columns
    exp = expected_lake_state(spec)
    cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), exp[cols].reset_index(drop=True)
    )

    # re-replay is a no-op and preserves the removed-column schema
    rep = replay(stream, lake, cfg2, chunks_per_epoch=2)
    assert rep.epochs == 0
    assert "lang" not in lake_to_pandas(lake).columns
