"""CLI + conformance-pipeline coverage."""

import json
import subprocess
import sys

import pytest

from movex_cdc_ray.pipelines.conformance import conformance_check
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_stream"))
    generate_stream(d, StreamSpec(n_events=3_000, n_repos=4, paths_per_repo=20, chunk_size=1_000))
    return d


def test_conformance_check(ray_session, stream_dir):
    spec = StreamSpec(n_events=3_000, n_repos=4, paths_per_repo=20, chunk_size=1_000)
    cfg = config_for_spec(spec, num_partitions=4)
    rep = conformance_check(stream_dir, cfg)
    assert rep["chunks"] == 3
    assert rep["total_messages"] > 2_500  # suppressed no-op updates excluded
    wm = rep["topics"]["lake.code.files"]
    assert 0 < wm["max_bytes"] < cfg.max_message_bytes


def test_conformance_rejects_oversize(ray_session, stream_dir):
    spec = StreamSpec(n_events=3_000, n_repos=4, paths_per_repo=20, chunk_size=1_000)
    cfg = config_for_spec(spec, num_partitions=4)
    cfg.max_message_bytes = 100
    with pytest.raises(Exception, match="exceeds"):
        conformance_check(stream_dir, cfg, max_chunks=1)


def test_cli_synth_health_verify(tmp_path):
    # CLI subcommands that own no Ray session run as real subprocesses
    stream = str(tmp_path / "s")
    out = subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "synth", "--stream-dir", stream,
         "--events", "2000", "--repos", "3", "--paths-per-repo", "10", "--chunk-size", "1000"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert json.loads(out.stdout.strip().splitlines()[-1])["chunks"] == 2

    out = subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "export-config", "--partitions", "16"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    doc = json.loads(out.stdout)
    assert doc["num_partitions"] == 16
    assert doc["tables"][0]["name"] == "FILES"


def test_cli_corpus_stats(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "corpus-stats",
         "--docs", "/root/testdata/sf0.001", "--top-k", "3", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["docs"] == 500
    # HLL at p=8: ~6.5% standard error on 500 distinct texts
    assert abs(doc["approx_distinct_texts"] - 500) / 500 < 0.2
    assert len(doc["top_tokens"]) == 3
    for t in doc["top_tokens"]:
        assert t["cms_estimate"] >= t["n"]  # count-min never under-counts
    assert set(doc["doc_chars_quantiles_sampled"]) == {"0.25", "0.5", "0.9", "0.99"}


def test_cli_materialize_wiring_and_subprocess(tmp_path):
    from movex_cdc_ray.__main__ import main

    # argparse wiring: the subcommand exists and enforces its required args
    with pytest.raises(SystemExit) as ei:
        main(["materialize"])
    assert ei.value.code == 2

    # end-to-end through real subprocesses: synth -> produce -> materialize
    stream, topics, state = (str(tmp_path / d) for d in ("s", "t", "st"))
    subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "synth", "--stream-dir", stream,
         "--events", "2000", "--repos", "3", "--paths-per-repo", "10", "--chunk-size", "1000"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "produce", "--stream-dir", stream,
         "--out-dir", topics, "--partitions", "4", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = subprocess.run(
        [sys.executable, "-m", "movex_cdc_ray", "materialize", "--out-dir", topics,
         "--topic", "lake.code.files", "--state-dir", state,
         "--partitions", "4", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["topic"] == "lake.code.files"
    # converged state: <= live keys touched by 2000 events, and non-trivial
    assert 0 < doc["rows"] <= 2000


def test_ray_init_kwargs_job_submit_mode():
    from movex_cdc_ray.__main__ import _ray_init_kwargs

    # sandbox/local mode: num_cpus honored
    k = _ray_init_kwargs(8, env={"RAY_ADDRESS": "local"})
    assert k["address"] == "local" and k["num_cpus"] == 8
    k = _ray_init_kwargs(8, env={})
    assert k["address"] == "local" and k["num_cpus"] == 8
    # `ray job submit` exports the cluster address: join it, and never try
    # to constrain an existing cluster with num_cpus
    k = _ray_init_kwargs(8, env={"RAY_ADDRESS": "ray://gcs:10001"})
    assert k["address"] == "ray://gcs:10001" and "num_cpus" not in k
