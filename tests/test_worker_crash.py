"""WORKER-level chaos: a merge task's worker process hard-exits mid-epoch
(os._exit — SIGKILL semantics: no exception, no cleanup) via the
``CaptureConfig.fault_sentinel`` hook, and Ray's lineage-based task retry
plus the deterministic-staged-path + atomic-manifest protocol must converge
to the byte-identical lake.

This is the NODE-LOSS drill the driver-kill tests (test_crash_kill.py)
don't cover: there the whole driver dies and a fresh process resumes from
the manifest; here the driver lives and a single worker vanishes beneath a
running epoch — the fixed-size-multi-node scenario from the north rule.
"""

import os

import pytest

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from movex_cdc_ray.synth import (
    StreamSpec,
    config_for_spec,
    expected_lake_state,
    generate_stream,
)

SPEC = StreamSpec(
    n_events=8_000, n_repos=6, paths_per_repo=40, chunk_size=2_000
)
COLS = ["repo", "path", "commit", "content", "_last_id", "_last_op"]


def test_worker_killed_mid_merge_converges(ray_session, tmp_path):
    stream = str(tmp_path / "stream")
    generate_stream(stream, SPEC)

    clean_lake = str(tmp_path / "lake_clean")
    replay(stream, clean_lake, config_for_spec(SPEC, num_partitions=4),
           chunks_per_epoch=2)
    clean = lake_to_pandas(clean_lake)[COLS].reset_index(drop=True)

    sentinel = str(tmp_path / "kill_once")
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.fault_sentinel = sentinel
    chaos_lake = str(tmp_path / "lake_chaos")
    replay(stream, chaos_lake, cfg, chunks_per_epoch=2)

    # the fault must actually have fired (a test that never kills a worker
    # proves nothing) — the sentinel records which partition died
    assert os.path.exists(sentinel), "fault hook never fired"
    assert open(sentinel).read() != ""

    chaos = lake_to_pandas(chaos_lake)[COLS].reset_index(drop=True)
    assert chaos.equals(clean)
    assert chaos.equals(
        expected_lake_state(SPEC)[COLS].reset_index(drop=True)
    )


def test_fault_sentinel_round_trips_config():
    from movex_cdc_ray.config import CaptureConfig

    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.fault_sentinel = "/tmp/x"
    back = CaptureConfig.from_json(cfg.to_json())
    assert back.fault_sentinel == "/tmp/x"
