"""Hard-crash (SIGKILL) fault injection: a replay driver killed mid-flight
with no cleanup must resume in a fresh process to the exact oracle state.

Stronger than the manifest-deletion crash tests (test_exactly_once.py): the
kill lands at an arbitrary point — mid-epoch, mid-staging-write, or between
commits — and the staged-path + atomic-manifest protocol must cope with
whatever half-written state it left behind.

Reference parity: the reference survives worker kills via DB transactions +
Kafka transactional ids (app/models/transfer_thread.rb); here the epoch
manifest plays both roles.
"""

import signal
import subprocess
import sys
import time

from movex_cdc_ray.pipelines.replay import lake_to_pandas
from movex_cdc_ray.synth import StreamSpec, config_for_spec, expected_lake_state, generate_stream

SPEC = StreamSpec(n_events=40_000, n_repos=10, paths_per_repo=50, chunk_size=2_000, evolve_at_event=30_000)

CHILD = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from movex_cdc_ray.pipelines.replay import replay
from movex_cdc_ray.synth import StreamSpec, config_for_spec
spec = StreamSpec(n_events=40_000, n_repos=10, paths_per_repo=50, chunk_size=2_000, evolve_at_event=30_000)
replay({stream!r}, {lake!r}, config_for_spec(spec, num_partitions=8), chunks_per_epoch=2)
print("REPLAY_DONE")
"""


def test_sigkill_mid_replay_resumes_to_oracle(tmp_path):
    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    generate_stream(stream, SPEC)
    child_src = CHILD.format(repo="/root/repo", stream=stream, lake=lake)

    # first driver: SIGKILL ~mid-replay (21 chunk files / 2 per epoch = 11
    # epochs; the kill lands mid-epoch in typical runs, but EVERY landing
    # point — before the first commit, between commits, or after the last —
    # must converge, so the test cannot flake on timing)
    p = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(8.0)  # ray.init takes ~4-5s; epochs start shortly after
    p.send_signal(signal.SIGKILL)
    p.wait()

    # second driver: resume with no cleanup of the crashed state
    out = subprocess.run(
        [sys.executable, "-c", child_src], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REPLAY_DONE" in out.stdout

    got = lake_to_pandas(lake)
    exp = expected_lake_state(SPEC)
    cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    assert got[cols].reset_index(drop=True).equals(exp[cols].reset_index(drop=True))


def test_gc_consumed_chunks_preserves_resume_ordinals(tmp_path):
    """The manifest ledger counts ordinals of the FULL stream history; GC
    must re-anchor the listing or a resume after deletion silently skips
    the next chunks_consumed unconsumed chunks."""
    import os

    from movex_cdc_ray.sources.stream import gc_consumed_chunks, pending_chunks

    d = str(tmp_path)
    for i in range(10):
        open(os.path.join(d, f"chunk_{i:06d}.parquet"), "w").write("x")
    assert len(gc_consumed_chunks(d, 5, unlink=True)) == 5
    got = [os.path.basename(p) for p in pending_chunks(d, 5)]
    assert got == [f"chunk_{i:06d}.parquet" for i in range(5, 10)]
    # second round: consume 3 more, GC again
    assert len(gc_consumed_chunks(d, 8, unlink=True)) == 3
    got = [os.path.basename(p) for p in pending_chunks(d, 8)]
    assert got == [f"chunk_{i:06d}.parquet" for i in range(8, 10)]


def test_double_sigkill_then_resume_converges(tmp_path):
    """TWO successive drivers killed at different landing points (the second
    kill lands in resume territory — skipping committed epochs, then dying
    mid-flight again); the third driver must still converge exactly."""
    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    generate_stream(stream, SPEC)
    child_src = CHILD.format(repo="/root/repo", stream=stream, lake=lake)

    for delay in (7.0, 9.0):
        p = subprocess.Popen(
            [sys.executable, "-c", child_src],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        time.sleep(delay)
        p.send_signal(signal.SIGKILL)
        p.wait()

    out = subprocess.run(
        [sys.executable, "-c", child_src], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = lake_to_pandas(lake)
    exp = expected_lake_state(SPEC)
    cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    assert got[cols].reset_index(drop=True).equals(exp[cols].reset_index(drop=True))


PRODUCE_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from movex_cdc_ray.pipelines.produce import produce
from movex_cdc_ray.synth import StreamSpec, config_for_spec
spec = StreamSpec(n_events=40_000, n_repos=10, paths_per_repo=50, chunk_size=2_000, evolve_at_event=30_000)
produce({stream!r}, {out!r}, config_for_spec(spec, num_partitions=8), chunks_per_epoch=2)
print("PRODUCE_DONE")
"""


def test_sigkill_mid_produce_resumes_byte_identical(tmp_path):
    """The delivery path under a hard kill: the resumed run's committed
    message tree must equal an uninterrupted run's — same messages, same
    per-key ascending order — with no phantom or duplicate lines from the
    half-written attempt."""
    from movex_cdc_ray.pipelines.produce import topic_messages

    stream = str(tmp_path / "stream")
    generate_stream(stream, SPEC)
    crashed, clean = str(tmp_path / "crashed"), str(tmp_path / "clean")

    child_src = PRODUCE_CHILD.format(repo="/root/repo", stream=stream, out=crashed)
    p = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(8.0)
    p.send_signal(signal.SIGKILL)
    p.wait()
    out = subprocess.run(
        [sys.executable, "-c", child_src], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]

    clean_src = PRODUCE_CHILD.format(repo="/root/repo", stream=stream, out=clean)
    out = subprocess.run(
        [sys.executable, "-c", clean_src], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]

    assert topic_messages(crashed, "lake.code.files") == topic_messages(
        clean, "lake.code.files"
    )


DELTA_VIEWS_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from movex_cdc_ray.pipelines.replay import replay, compact
from movex_cdc_ray.synth import StreamSpec, config_for_spec
from movex_cdc_ray.config import ViewSpec
spec = StreamSpec(n_events=40_000, n_repos=10, paths_per_repo=50, chunk_size=2_000, evolve_at_event=30_000)
cfg = config_for_spec(spec, num_partitions=8)
cfg.views = [ViewSpec("by_repo", ["repo"], ["size"])]
replay({stream!r}, {lake!r}, cfg, chunks_per_epoch=2, merge_mode="delta", compact_every=3)
compact({lake!r}, cfg)
print("REPLAY_DONE")
"""


def test_sigkill_mid_delta_views_replay_converges(tmp_path, ray_session):
    """SIGKILL lands anywhere in the delta+views flow — mid-epoch,
    mid-compaction (view deltas staged), between commits; the resumed run
    must converge AND the compaction-maintained view must equal the
    rewrite-mode view of a clean run."""
    import pandas as pd

    from movex_cdc_ray.config import ViewSpec
    from movex_cdc_ray.pipelines.replay import read_view, replay

    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    generate_stream(stream, SPEC)
    child_src = DELTA_VIEWS_CHILD.format(repo="/root/repo", stream=stream, lake=lake)

    p = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(9.0)
    p.send_signal(signal.SIGKILL)
    p.wait()

    out = subprocess.run(
        [sys.executable, "-c", child_src], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REPLAY_DONE" in out.stdout

    got = lake_to_pandas(lake)
    exp = expected_lake_state(SPEC)
    cols = ["repo", "path", "commit", "content", "_last_id", "_last_op"]
    assert got[cols].reset_index(drop=True).equals(exp[cols].reset_index(drop=True))

    # clean rewrite-mode reference view (in-process; per-epoch maintenance)
    ref_lake = str(tmp_path / "ref")
    cfg = config_for_spec(SPEC, num_partitions=8)
    cfg.views = [ViewSpec("by_repo", ["repo"], ["size"])]
    replay(stream, ref_lake, cfg, chunks_per_epoch=2)

    def vp(lk):
        pdf = read_view(lk, "by_repo").to_pandas()
        pdf["n_rows"] = pdf["n_rows"].astype("int64")
        pdf["sum_size"] = pdf["sum_size"].astype("int64")
        return pdf.sort_values("repo").reset_index(drop=True)[["repo", "n_rows", "sum_size"]]

    pd.testing.assert_frame_equal(vp(lake), vp(ref_lake))
