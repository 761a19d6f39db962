"""Benchmark harness.

Default: runs the headline CDC replay (synthetic change stream scaled to the
sf dir's lineitem row count) plus a query sweep over $GRAFT_SF_DIR, printing
ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "events": N, "events_per_sec": N}

--scaling: runs the headline pipeline at N and 4N CPUs (default 2 and 8;
override GRAFT_SCALE_LO/GRAFT_SCALE_HI, e.g. 1/4) in fresh taskset-pinned
processes on the same 10M-event input, as GRAFT_SCALE_TRIALS (default 5)
INTERLEAVED PAIRED TRIALS (lo/hi back-to-back per trial so box phase cancels
in the ratio), and reports every trial plus the MEDIAN per-trial scaling
efficiency (tput_hi/tput_lo)/(hi/lo) — the sandbox proxy for the north
rule's N→4N-node criterion (see BASELINE.md for the recorded numbers and the
single-node saturation analysis).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TMP = os.environ.get("GRAFT_BENCH_TMP", "/tmp/movex_bench")

QUERY_SWEEP = [
    "cdc_lake_state",
    "cdc_capture_project_filter",
    "cdc_update_suppression",
    "cdc_stats_rollup",
    "q1_pricing_summary",
    "top_events_per_user",
    "events_hopping_window",
    "events_asof_join",
    "dedup_exact",
    "dedup_minhash",
    "dedup_jaccard",
    "knn_bruteforce",
    "text_quality",
    "text_fingerprint",
    "dedup_clusters",
    "corpus_pack",
    "corpus_decontaminate",
    "approx_distinct_hll",
    "text_countmin",
    "text_pii_scrub",
    "events_range_join",
    "cdc_scd2_history",
    "dedup_substrings",
    "corpus_sample_weighted",
    "dedup_semantic",
    "corpus_quality_cut",
    "embedding_centroids",
    "text_bm25_topk",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "cdc_view_maintenance",
    "q18_large_orders",
    "q22_idle_customers",
    "events_user_deltas",
    "q2_min_cost_supplier",
    "q8_market_share",
    "corpus_dsir_weights",
    "embedding_pca_power",
    "text_bpe_merges",
    "cdc_consumer_state",
    "dedup_editdistance",
    "multimodal_phash_dedup",
    "text_ngram_novelty",
    "text_pmi_bigrams",
    "cdc_snapshot_diff",
    "events_skyline",
    "events_quantile_histogram",
    "join_skew_salted",
    "cdc_checksum_reconcile",
    "events_data_quality",
    "text_skipgrams",
    "text_vocab_growth",
    "events_peak_concurrency",
    "multimodal_scene_cuts",
    "events_attribution",
    "multimodal_audio_tone",
    "events_decayed_score",
    "events_heavy_hitters",
    "multimodal_image_boxblur",
    "events_debounce",
    "events_outlier_mad",
    "multimodal_image_palette",
    "graph_triangles",
    "text_nb_classify",
    "embedding_kcenter",
    "events_holt",
    "join_bloom_prefilter",
    "knn_filtered",
    # round-4 additions
    "cdc_view_maintenance_delta",
    "graph_triangles_degree",
    "ann_ivf_mp",
    "ann_pq_rerank",
    "ann_lsh_mp",
    "ann_ivf_incremental",
    "text_df_incremental",
    "ann_recall",
]


def stream_events_for_sf(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    lineitem_rows = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    return max(lineitem_rows * 2, 50_000)


def ensure_stream(n_events: int):
    """Synthesize (once, cached) the deterministic change stream."""
    from movex_cdc_ray.synth import StreamSpec, generate_stream, stream_matches_spec

    spec = StreamSpec(
        n_events=n_events,
        n_repos=200,
        paths_per_repo=500,
        hot_repo_fraction=0.15,
        chunk_size=100_000,
        evolve_at_event=(n_events * 3) // 4,
    )
    stream_dir = os.path.join(BENCH_TMP, f"stream_{n_events}")
    # _SPEC.json equality certifies a complete stream from exactly this
    # spec — a chunk-count tolerance would silently benchmark a truncated
    # or stale input and still report n_events-based throughput
    if not stream_matches_spec(stream_dir, spec):
        shutil.rmtree(stream_dir, ignore_errors=True)
        generate_stream(stream_dir, spec)
    return stream_dir, spec


# Epoch size is the tuning knob that matters: ~5M-event epochs measured
# fastest at every core count (15M-event epochs degrade the sort exchange
# ~30%; many tiny epochs pay the commit barrier). 10M events / 2 epochs
# keeps each child run in that regime; GRAFT_SCALING_EVENTS=30000000 with
# GRAFT_EPOCHS=6 reproduces the same shape at 3× the length.
SCALING_EVENTS = int(os.environ.get("GRAFT_SCALING_EVENTS", "10000000"))


def run_headline(num_cpus: int) -> dict:
    import ray

    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.synth import config_for_spec

    # --scaling child runs use a larger fixed-size job: the 1-2M-event runs
    # are constant-overhead-dominated and cannot show compute scaling
    n_events = SCALING_EVENTS if os.environ.get("GRAFT_SCALING_CHILD") else stream_events_for_sf(SF_DIR)
    stream_dir, spec = ensure_stream(n_events)

    from movex_cdc_ray.__main__ import _ray_init

    _ray_init(num_cpus)

    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq

    from movex_cdc_ray.sources.stream import list_chunks

    for f in list_chunks(stream_dir):
        pq.read_metadata(f)
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    # num_partitions is a JOB parameter — identical at every cluster size
    # (the north rule measures the same job at N and 4N nodes)
    cfg = config_for_spec(spec, num_partitions=64)

    # warm-up run over a small prefix: pre-starts Ray workers and compiles
    # the pipeline so the timed region measures steady-state throughput
    warm_lake = os.path.join(BENCH_TMP, f"warmlake_{num_cpus}")
    shutil.rmtree(warm_lake, ignore_errors=True)
    replay(stream_dir, warm_lake, cfg, chunks_per_epoch=1, max_epochs=1)
    shutil.rmtree(warm_lake, ignore_errors=True)

    lake_dir = os.path.join(BENCH_TMP, f"lake_{num_cpus}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    # epoch = one exactly-once transaction; its size is a job parameter.
    # Big replays use big epochs: per-epoch serial cost (pipeline spin-up,
    # commit barrier) is ~1-2s, so many small epochs cap scaling efficiency.
    # n_chunks from the ACTUAL file count (the evolution boundary may split
    # one chunk) so chunks_per_epoch yields exactly epochs_target epochs
    from movex_cdc_ray.sources.stream import list_chunks

    n_chunks = len(list_chunks(stream_dir))
    epochs_target = int(os.environ.get("GRAFT_EPOCHS", "2"))
    chunks_per_epoch = max(4, -(-n_chunks // epochs_target))
    shuffle_mode = os.environ.get("GRAFT_SHUFFLE_MODE", "groupby")
    t0 = time.perf_counter()
    rep = replay(stream_dir, lake_dir, cfg, chunks_per_epoch=chunks_per_epoch, shuffle_mode=shuffle_mode)
    elapsed = time.perf_counter() - t0
    ray.shutdown()
    # measured exchange volume (docs/SCALE.md "Exchange volume"): events
    # read vs post-combine rows/bytes that crossed the one all-to-all
    events_read = sum(m.get("events_read", 0) for m in rep.epoch_metrics)
    shuffle_rows = sum(m.get("events_in", 0) for m in rep.epoch_metrics)
    shuffle_bytes = sum(m.get("shuffle_bytes", 0) for m in rep.epoch_metrics)
    return {
        "sec": round(elapsed, 3),
        "events": n_events,
        "events_per_sec": round(n_events / elapsed),
        "epochs": rep.epochs,
        "lake_rows": rep.lake_rows,
        "events_read": events_read,
        "shuffle_rows": shuffle_rows,
        "shuffle_bytes": shuffle_bytes,
        "shuffle_bytes_per_event": round(shuffle_bytes / n_events, 1) if n_events else 0.0,
        "combine_reduction": round(shuffle_rows / events_read, 4) if events_read else None,
    }


def run_tail_latency(num_cpus: int) -> dict:
    """`--tail-latency`: event-appended → lake-visible latency SLO under
    ``tail()`` (the reference's steady-state is a LATENCY pipeline —
    adaptive 0-60 s sleep, `transfer_thread.rb:642-657` — while the
    headline measures throughput only).

    A producer thread hard-links one pre-synthesized chunk per cadence tick
    into a live stream dir; ``tail(chunks_per_epoch=1, poll_interval=0.2)``
    follows and commits an epoch per chunk. Per-chunk visibility latency =
    the committing manifest's mtime − the chunk's append time; p50/p95/max
    over all chunks, in BOTH merge modes (delta runs ``compact_every=2``,
    the chain-bounding dial). Env knobs: GRAFT_TAIL_CHUNKS (20),
    GRAFT_TAIL_CHUNK_EVENTS (50000), GRAFT_TAIL_CADENCE (1.0 s)."""
    import glob as _glob
    import threading

    import numpy as np
    import ray

    from movex_cdc_ray.__main__ import _ray_init
    from movex_cdc_ray.pipelines.replay import tail
    from movex_cdc_ray.sources.stream import list_chunks
    from movex_cdc_ray.state.manifest import MANIFEST_DIR
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream, stream_matches_spec

    n_chunks = int(os.environ.get("GRAFT_TAIL_CHUNKS", "20"))
    chunk_events = int(os.environ.get("GRAFT_TAIL_CHUNK_EVENTS", "50000"))
    cadence = float(os.environ.get("GRAFT_TAIL_CADENCE", "1.0"))
    spec = StreamSpec(
        n_events=n_chunks * chunk_events, n_repos=200, paths_per_repo=500,
        hot_repo_fraction=0.15, chunk_size=chunk_events,
    )
    staging = os.path.join(BENCH_TMP, f"tail_staging_{n_chunks}x{chunk_events}")
    if not stream_matches_spec(staging, spec):
        shutil.rmtree(staging, ignore_errors=True)
        generate_stream(staging, spec)
    chunks = list_chunks(staging)

    _ray_init(num_cpus)
    cfg = config_for_spec(spec, num_partitions=64)

    def run_mode(mode: str, compact_every: int) -> dict:
        live = os.path.join(BENCH_TMP, f"tail_live_{mode}")
        lake = os.path.join(BENCH_TMP, f"tail_lake_{mode}")
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(lake, ignore_errors=True)
        os.makedirs(live)
        append_times: dict[str, float] = {}

        def producer() -> None:
            for i, f in enumerate(chunks):
                time.sleep(0.5 if i == 0 else cadence)
                os.link(f, os.path.join(live, os.path.basename(f)))
                append_times[os.path.basename(f)] = time.time()

        th = threading.Thread(target=producer)
        th.start()
        rep = tail(live, lake, cfg, chunks_per_epoch=1, poll_interval=0.2,
                   max_idle_cycles=8, merge_mode=mode, compact_every=compact_every)
        th.join()
        lat = []
        for mf in sorted(_glob.glob(os.path.join(lake, MANIFEST_DIR, "epoch-*.json"))):
            with open(mf) as fh:
                doc = json.load(fh)
            mt = os.path.getmtime(mf)
            for cf in doc.get("chunk_files", []):
                t_app = append_times.get(os.path.basename(cf))
                if t_app is not None:
                    lat.append(mt - t_app)
        arr = np.array(lat)
        return {
            "mode": mode + (f"+compact_every={compact_every}" if compact_every else ""),
            "chunks_measured": int(len(arr)),
            "epochs": rep.epochs,
            "lake_rows": rep.lake_rows,
            "p50_sec": round(float(np.percentile(arr, 50)), 3) if len(arr) else None,
            "p95_sec": round(float(np.percentile(arr, 95)), 3) if len(arr) else None,
            "max_sec": round(float(arr.max()), 3) if len(arr) else None,
        }

    out = {
        "metric": "tail_visibility_latency_sec",
        "cadence_sec": cadence,
        "chunk_events": chunk_events,
        "n_chunks": n_chunks,
        "num_cpus": num_cpus,
        "modes": [run_mode("rewrite", 0), run_mode("delta", 2)],
    }
    ray.shutdown()
    return out


def run_queries(num_cpus: int) -> dict:
    import ray

    from movex_cdc_ray.__main__ import _ray_init

    _ray_init(num_cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from movex_cdc_ray.pipelines.queries import QUERIES

    out = {}
    for name in QUERY_SWEEP:
        t0 = time.perf_counter()
        QUERIES[name](SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return out


def host_phase_probe() -> float:
    """Fingerprint the host's fresh-page first-touch bandwidth (MB/s).

    This VM's hypervisor intermittently throttles page-fault servicing to
    ~10 MB/s (observed: 100 MB of first-touch pages = 7-14 s while
    steady-state memcpy holds ~16 GB/s) — which collapses Ray worker
    startup, object-store writes and every fresh allocation by 10-20x.
    Recording the probe alongside each bench artifact lets a reader
    separate engine changes from host phase: healthy is >1000 MB/s,
    a degraded phase reads single-digit MB/s."""
    import numpy as np

    n = 32 * 1024 * 1024
    t0 = time.perf_counter()
    a = np.empty(n, dtype=np.uint8)
    a[::4096] = 1  # one touch per 4 KiB page
    dt = time.perf_counter() - t0
    return round(n / (1 << 20) / dt, 1)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if "--scaling" in sys.argv:
        # N vs 4N parallelism in fresh processes on the SAME input — the
        # sandbox proxy for the north rule's two-cluster-size criterion.
        # Default 2 vs 8: the single node saturates shared memory/object-store
        # bandwidth around ~8 cores (~1.0M ev/s), which on a real cluster is a
        # per-node resource — N must sit in the compute-bound regime.
        #
        # Protocol: INTERLEAVED PAIRED TRIALS. Each trial runs the lo-core
        # and hi-core level back-to-back (fresh process each), so slow box
        # phases hit both levels of a trial roughly equally and cancel in the
        # per-trial ratio, instead of inflating a best-of-N pick. The headline
        # number is the MEDIAN per-trial efficiency across >=5 trials; every
        # trial is reported.
        lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", str(lo * 4)))
        n_trials = int(os.environ.get("GRAFT_SCALE_TRIALS", "5"))
        # synthesize the input in the UNPINNED parent: a cold 2-core child
        # would otherwise pay the one-time generation at 2-core speed
        ensure_stream(SCALING_EVENTS)

        def run_level(ncpu: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_CHILD="1")
            # taskset pins the whole child (driver, raylet, workers, and
            # every library-internal thread pool) to ncpu physical cores —
            # ray.init(num_cpus=) alone only limits task scheduling, while
            # pyarrow's parquet/compute pools would still use every core,
            # which silently invalidates the two-cluster-size proxy.
            cmd = ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
                   os.path.abspath(__file__), "--headline-only"]
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        # Health gate (round-3 verdict directive #1): a trial only counts if
        # the host's first-touch bandwidth is healthy when it starts. During a
        # hypervisor-throttled phase (<~10 MB/s) the hi-core leg plateaus at
        # the page-fault ceiling and the per-trial ratio measures the host,
        # not the engine. Re-probe with backoff up to a wait budget; if the
        # box never recovers, record the skipped probes and give up loudly.
        probe_gate = float(os.environ.get("GRAFT_SCALE_PROBE_GATE", "1000"))
        probe_wait_budget = float(os.environ.get("GRAFT_SCALE_PROBE_WAIT", "600"))

        def wait_for_healthy_host() -> tuple:
            waited, skipped = 0.0, []
            while True:
                phase = host_phase_probe()
                if phase >= probe_gate:
                    return phase, skipped
                skipped.append(phase)
                if waited >= probe_wait_budget:
                    return phase, skipped  # caller records the degraded probe
                pause = min(30.0, 5.0 * len(skipped))
                time.sleep(pause)
                waited += pause

        trials = []
        for i in range(n_trials):
            phase, skipped_probes = wait_for_healthy_host()
            r_lo = run_level(lo)
            r_hi = run_level(hi)
            eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
            trials.append(
                {
                    "trial": i + 1,
                    "host_first_touch_mb_s": phase,
                    "host_probe_gate_mb_s": probe_gate,
                    "host_probe_gate_passed": phase >= probe_gate,
                    "host_probes_skipped": skipped_probes,
                    f"sec_{lo}": r_lo["value"],
                    f"sec_{hi}": r_hi["value"],
                    f"events_per_sec_{lo}": r_lo["events_per_sec"],
                    f"events_per_sec_{hi}": r_hi["events_per_sec"],
                    # identical shuffle volume at both levels is the point:
                    # the exchange is a property of the JOB, not the
                    # parallelism — per-core exchange bandwidth falls 1/N
                    f"shuffle_bytes_{lo}": r_lo.get("shuffle_bytes", 0),
                    f"shuffle_bytes_{hi}": r_hi.get("shuffle_bytes", 0),
                    f"shuffle_rows_{lo}": r_lo.get("shuffle_rows", 0),
                    f"shuffle_rows_{hi}": r_hi.get("shuffle_rows", 0),
                    "efficiency": round(eff, 3),
                }
            )
            print(json.dumps({"progress": trials[-1]}), file=sys.stderr)
        effs = sorted(t["efficiency"] for t in trials)
        median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
        )
        # the reported sec_/events_per_sec_ pair comes from the median trial
        med_trial = min(trials, key=lambda t: abs(t["efficiency"] - median_eff))
        print(
            json.dumps(
                {
                    "metric": "cdc_replay_scaling",
                    "cpus_lo": lo,
                    "cpus_hi": hi,
                    f"sec_{lo}": med_trial[f"sec_{lo}"],
                    f"sec_{hi}": med_trial[f"sec_{hi}"],
                    f"events_per_sec_{lo}": med_trial[f"events_per_sec_{lo}"],
                    f"events_per_sec_{hi}": med_trial[f"events_per_sec_{hi}"],
                    "scaling_efficiency": median_eff,
                    "protocol": f"median of {n_trials} interleaved paired trials",
                    "trials": trials,
                    "events": SCALING_EVENTS,
                    "sf": SF_DIR,
                }
            )
        )
        return

    if "--tail-latency" in sys.argv:
        res = run_tail_latency(NUM_CPUS)
        res["host_first_touch_mb_s"] = host_phase_probe()
        print(json.dumps(res))
        return

    phase = host_phase_probe()
    headline = run_headline(NUM_CPUS)
    queries = {} if "--headline-only" in sys.argv else run_queries(NUM_CPUS)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_headline_sec",  # value IS the wall time
                "value": headline["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "events": headline["events"],
                "events_per_sec": headline["events_per_sec"],
                "epochs": headline["epochs"],
                "lake_rows": headline["lake_rows"],
                "events_read": headline["events_read"],
                "shuffle_rows": headline["shuffle_rows"],
                "shuffle_bytes": headline["shuffle_bytes"],
                "shuffle_bytes_per_event": headline["shuffle_bytes_per_event"],
                "combine_reduction": headline["combine_reduction"],
                "host_first_touch_mb_s": phase,
            }
        )
    )


if __name__ == "__main__":
    main()
