"""Incremental view maintenance (ViewSpec → merge-side deltas → read_view):
the folded view must equal a from-scratch groupby of the converged lake under
every epoch granularity, resume, and crash-replay scenario the merge itself
survives — IVM inherits exactly-once from the same staged-path + manifest
protocol."""

import glob
import os

import pandas as pd
import pytest

from movex_cdc_ray.config import CaptureConfig, ViewSpec
from movex_cdc_ray.pipelines.replay import lake_to_pandas, read_view, replay
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=8_000, n_repos=8, paths_per_repo=40, chunk_size=1_600,
                  evolve_at_event=6_000)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_views"))
    generate_stream(d, SPEC)
    return d


def _cfg():
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.views = [ViewSpec("by_repo", ["repo"], ["size"]),
                 ViewSpec("by_lang", ["lang"])]
    return cfg


def _view_pdf(lake, name, cols):
    pdf = read_view(lake, name).to_pandas()
    for c in pdf.columns:
        if c.startswith(("n_", "sum_")):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(cols).reset_index(drop=True)


def _recompute(lake):
    live = lake_to_pandas(lake)
    by_repo = (
        live.groupby("repo", as_index=False)
        .agg(n_rows=("repo", "size"), sum_size=("size", "sum"))
        .astype({"n_rows": "int64", "sum_size": "int64"})
        .sort_values("repo").reset_index(drop=True)
    )
    by_lang = (
        live.groupby("lang", as_index=False, dropna=False)
        .agg(n_rows=("lang", "size"))
        .astype({"n_rows": "int64"})
        .sort_values("lang").reset_index(drop=True)
    )
    return by_repo, by_lang


def test_view_matches_recompute(ray_session, stream_dir, tmp_path):
    lake = str(tmp_path / "lake")
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=2)
    exp_repo, exp_lang = _recompute(lake)
    got_repo = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    got_lang = _view_pdf(lake, "by_lang", ["lang"])[["lang", "n_rows"]]
    pd.testing.assert_frame_equal(got_repo, exp_repo[["repo", "n_rows", "sum_size"]])
    pd.testing.assert_frame_equal(got_lang, exp_lang[["lang", "n_rows"]])


def test_view_epoch_granularity_invariance(ray_session, stream_dir, tmp_path):
    # 1-chunk epochs (max incremental steps) and 5-chunk epochs must fold to
    # the identical view — associativity of the delta = new − retracted math
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    replay(stream_dir, a, _cfg(), chunks_per_epoch=1)
    replay(stream_dir, b, _cfg(), chunks_per_epoch=5)
    pd.testing.assert_frame_equal(
        _view_pdf(a, "by_repo", ["repo"]), _view_pdf(b, "by_repo", ["repo"])
    )
    pd.testing.assert_frame_equal(
        _view_pdf(a, "by_lang", ["lang"]), _view_pdf(b, "by_lang", ["lang"])
    )


def test_view_crash_resume(ray_session, stream_dir, tmp_path):
    # die after an epoch's view deltas are staged but before its commit:
    # resume re-stages byte-identically and the folded view converges
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    replay(stream_dir, clean, _cfg(), chunks_per_epoch=1)
    replay(stream_dir, crashed, _cfg(), chunks_per_epoch=1, gc_staging=False)
    manifests = sorted(glob.glob(os.path.join(crashed, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])  # lose the last commit; its view deltas remain staged
    replay(stream_dir, crashed, _cfg(), chunks_per_epoch=1)
    pd.testing.assert_frame_equal(
        _view_pdf(clean, "by_repo", ["repo"]), _view_pdf(crashed, "by_repo", ["repo"])
    )


def test_view_resume_noop(ray_session, stream_dir, tmp_path):
    lake = str(tmp_path / "lake_noop")
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=2)
    before = _view_pdf(lake, "by_repo", ["repo"])
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=2)  # nothing pending
    pd.testing.assert_frame_equal(before, _view_pdf(lake, "by_repo", ["repo"]))


def test_view_compaction(ray_session, stream_dir, tmp_path):
    import glob as g
    import shutil as sh

    from movex_cdc_ray.pipelines.replay import compact_view

    lake = str(tmp_path / "lake_c")
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=1, max_epochs=3)
    vdir = os.path.join(lake, "_views", "by_repo")
    backup = str(tmp_path / "epoch_backup")
    sh.copytree(vdir, backup)
    snap = compact_view(lake, "by_repo")
    assert snap and snap.endswith(".snap")
    assert not g.glob(os.path.join(vdir, "epoch=*"))  # folded deltas GC'd
    # stale folded deltas reappearing (simulated GC crash) must not
    # double-count: read_view keys off the snapshot epoch
    before = _view_pdf(lake, "by_repo", ["repo"])
    for d in g.glob(os.path.join(backup, "epoch=*")):
        sh.copytree(d, os.path.join(vdir, os.path.basename(d)))
    pd.testing.assert_frame_equal(before, _view_pdf(lake, "by_repo", ["repo"]))
    # finish the stream on top of the snapshot, then compact again
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=1)
    exp_repo, _ = _recompute(lake)
    got = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    pd.testing.assert_frame_equal(got, exp_repo[["repo", "n_rows", "sum_size"]])
    compact_view(lake, "by_repo")
    got2 = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    pd.testing.assert_frame_equal(got2, exp_repo[["repo", "n_rows", "sum_size"]])


def test_views_delta_mode_defers_to_compaction(ray_session, stream_dir, tmp_path):
    # delta mode no longer refuses views (round-3 gap): maintenance is
    # deferred to compact(), so mid-chain the view is empty, and after
    # compaction it equals the rewrite-mode result (full parity suite in
    # tests/test_round4_fixes.py)
    from movex_cdc_ray.pipelines.replay import compact

    lake = str(tmp_path / "lake_d")
    cfg = _cfg()
    replay(stream_dir, lake, cfg, chunks_per_epoch=2, merge_mode="delta")
    assert read_view(lake, "by_repo").count() == 0  # documented lag
    compact(lake, cfg)
    exp_repo, _ = _recompute(lake)
    got_repo = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    pd.testing.assert_frame_equal(got_repo, exp_repo[["repo", "n_rows", "sum_size"]])


def test_view_nonpayload_column_refused(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.views = [ViewSpec("bad", ["no_such_col"])]
    with pytest.raises(ValueError, match="non-payload"):
        replay(stream_dir, str(tmp_path / "lake_np"), cfg, chunks_per_epoch=2)


def test_view_changed_definition_refused(ray_session, stream_dir, tmp_path):
    lake = str(tmp_path / "lake_re")
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=1, max_epochs=2)
    cfg2 = config_for_spec(SPEC, num_partitions=4)
    cfg2.views = [ViewSpec("by_repo", ["repo"])]  # sum_fields dropped = new definition
    with pytest.raises(ValueError, match="different"):
        replay(stream_dir, lake, cfg2, chunks_per_epoch=1)  # pending chunks remain


def test_view_spec_validation():
    with pytest.raises(ValueError, match="\\[a-z0-9_\\]"):
        ViewSpec("Bad Name", ["repo"])
    with pytest.raises(ValueError, match="group_by"):
        ViewSpec("v", [])
    with pytest.raises(ValueError, match="both"):
        ViewSpec("v", ["size"], ["size"])
    with pytest.raises(ValueError, match="duplicate view names"):
        CaptureConfig(
            schema_versions=[], views=[ViewSpec("v", ["a"]), ViewSpec("v", ["b"])]
        )


def test_view_config_roundtrip():
    cfg = _cfg()
    back = CaptureConfig.from_json(cfg.to_json())
    assert back.views == cfg.views


def test_view_through_tail(ray_session, stream_dir, tmp_path):
    # streaming ingestion (tail) maintains views identically to batch replay
    from movex_cdc_ray.pipelines.replay import tail

    lake = str(tmp_path / "lake_tail")
    tail(stream_dir, lake, _cfg(), chunks_per_epoch=2, poll_interval=0.1,
         max_idle_cycles=2)
    exp_repo, _ = _recompute(lake)
    got = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    pd.testing.assert_frame_equal(got, exp_repo[["repo", "n_rows", "sum_size"]])


def test_view_table_scoping(ray_session, tmp_path):
    # two logical tables share one stream/lake; a scoped view counts only
    # its table's rows, an unscoped one aggregates across both
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.config import ColumnConfig, TableConfig, default_code_cdc_config
    from movex_cdc_ray.pipelines.replay import run_epoch
    from movex_cdc_ray.state.manifest import Manifest, new_writer_token
    from tests.test_multi_table import _events

    cfg = default_code_cdc_config(num_partitions=2)
    cfg.tables.append(TableConfig(
        name="DOCS", schema_name="CODE", table_id=2, key_handling="P",
        pk_columns=["repo", "path"],
        columns=[ColumnConfig(c) for c in ("repo", "path", "commit", "lang", "content", "size", "stars")],
    ))
    cfg.views = [ViewSpec("all_repo", ["repo"]),
                 ViewSpec("docs_repo", ["repo"], table="CODE.DOCS")]

    chunk = str(tmp_path / "chunk.parquet")
    both = pa.concat_tables([
        _events(1, [10, 11], path="p1"),  # FILES: 2 live rows (distinct ids same key? no:
        _events(2, [12], path="p2"),      # same key -> LWW keeps 1; DOCS: 1 row
    ])
    pq.write_table(both, chunk)
    lake = str(tmp_path / "lake")
    run_epoch(cfg, Manifest(lake_dir=lake), 1, [chunk], lake, new_writer_token())

    allv = _view_pdf(lake, "all_repo", ["repo"])
    docs = _view_pdf(lake, "docs_repo", ["repo"])
    assert allv["n_rows"].sum() == 2  # FILES key (LWW of 10,11) + DOCS key
    assert docs["n_rows"].sum() == 1  # only the DOCS row


def test_view_unknown_table_scope_refused(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.views = [ViewSpec("v", ["repo"], table="NO.SUCH")]
    with pytest.raises(ValueError, match="unknown table"):
        replay(stream_dir, str(tmp_path / "lake_ut"), cfg, chunks_per_epoch=2)


def test_view_late_registration_refused(ray_session, stream_dir, tmp_path):
    # rows exist but the view never saw their +1 — must refuse, not corrupt
    lake = str(tmp_path / "lake_late")
    replay(stream_dir, lake, config_for_spec(SPEC, num_partitions=4),
           chunks_per_epoch=1, max_epochs=2)
    with pytest.raises(ValueError, match="NON-EMPTY"):
        replay(stream_dir, lake, _cfg(), chunks_per_epoch=1)


def test_view_stale_delta_from_rebatched_crash(ray_session, stream_dir, tmp_path):
    # crash after staging an epoch that covered TWO chunks, then resume with
    # chunks_per_epoch=1: the retried epoch covers fewer chunks and may touch
    # fewer partitions — attempt-1's leftover delta files must not
    # double-count (run_epoch pre-cleans the epoch's view dirs)
    lake = str(tmp_path / "lake_rebatch")
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=2, gc_staging=False)
    manifests = sorted(glob.glob(os.path.join(lake, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    replay(stream_dir, lake, _cfg(), chunks_per_epoch=1)
    exp_repo, _ = _recompute(lake)
    got = _view_pdf(lake, "by_repo", ["repo"])[["repo", "n_rows", "sum_size"]]
    pd.testing.assert_frame_equal(got, exp_repo[["repo", "n_rows", "sum_size"]])
