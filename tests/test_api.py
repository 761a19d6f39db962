"""Control-API surface tests (the reference's REST verbs, SURVEY §2.10)."""

import pytest

from movex_cdc_ray.api import Engine
from movex_cdc_ray.config import default_code_cdc_config


def test_generate_triggers_and_roundtrip(tmp_path):
    cfg = default_code_cdc_config()
    cfg.tables[0].yn_initialization = True
    eng = Engine(cfg, str(tmp_path))
    out = eng.generate_triggers()
    assert out["successes"] == [{"table": "CODE.FILES"}]
    assert out["errors"] == []
    assert out["load_sqls"][0]["table"] == "CODE.FILES"

    doc = eng.export_config()
    eng.set_max_transaction_size(5000)
    assert eng.cfg.max_transaction_size == 5000
    eng.import_config(doc)  # re-import restores the exported state
    assert eng.cfg.max_transaction_size == 10000

    eng.set_worker_count(16)
    assert eng.cfg.num_partitions == 16


def test_health_check_empty_lake(tmp_path):
    eng = Engine(default_code_cdc_config(), str(tmp_path))
    hc = eng.health_check()
    assert hc["epoch"] == 0
    assert hc["lake_rows"] == 0
    assert hc["retry_backlog"] == 0


def test_engine_view_verbs(ray_session, tmp_path):
    from movex_cdc_ray.config import ViewSpec
    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=2_000, n_repos=4, paths_per_repo=20, chunk_size=1_000)
    stream, lake = str(tmp_path / "s"), str(tmp_path / "l")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)
    cfg.views = [ViewSpec("by_repo", ["repo"])]
    replay(stream, lake, cfg, chunks_per_epoch=1)

    eng = Engine(cfg, lake)
    assert eng.list_views() == ["by_repo"]
    before = eng.read_view("by_repo").to_pandas().sort_values("repo").reset_index(drop=True)
    assert before["n_rows"].sum() > 0
    snap = eng.compact_view("by_repo")
    assert snap and snap.endswith(".snap")
    after = eng.read_view("by_repo").to_pandas().sort_values("repo").reset_index(drop=True)
    assert before.equals(after)


def test_set_log_level_roundtrip(tmp_path):
    import logging

    eng = Engine(default_code_cdc_config(), str(tmp_path))
    logger = logging.getLogger("movex_cdc_ray")
    orig = logger.level
    try:
        eng.set_log_level("DEBUG")
        assert logger.level == logging.DEBUG
        prev = eng.set_log_level("WARN")  # rails alias for WARNING
        assert prev == "DEBUG"
        assert logger.level == logging.WARNING
        with pytest.raises(ValueError):
            eng.set_log_level("LOUD")
    finally:
        logger.setLevel(orig)
