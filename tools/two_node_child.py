"""One two-node scaling trial leg: connect to an ALREADY-RUNNING 2-raylet
local cluster, wait for both nodes, replay the 10M-event stream, print one
JSON line. Launched taskset-pinned by tools/two_node_scaling.py.

Usage: two_node_child.py <address> <stream_dir> <n_events> <epochs>
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    address, stream_dir, n_events, epochs = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    import ray

    ray.init(address=address, include_dashboard=False, logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"}})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    deadline = time.time() + 60
    while time.time() < deadline:
        alive = [n for n in ray.nodes() if n["Alive"]]
        if len(alive) >= 2:
            break
        time.sleep(0.5)
    else:
        print(json.dumps({"error": "second node never registered"}))
        return
    cpus = sum(int(n["Resources"].get("CPU", 0)) for n in alive)

    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.sources.stream import list_chunks
    from movex_cdc_ray.synth import StreamSpec, config_for_spec

    spec = StreamSpec(
        n_events=n_events, n_repos=200, paths_per_repo=500,
        hot_repo_fraction=0.15, chunk_size=100_000,
        evolve_at_event=(n_events * 3) // 4,
    )
    cfg = config_for_spec(spec, num_partitions=32)
    # GRAFT_COMBINE_BATCH: run the network-optimized operating point
    # (combine_batch_size=400k cuts the exchange to ~71 B/event — the
    # documented multi-node trade, docs/SCALE.md) instead of the fused
    # single-node default
    import os as _os

    cb = _os.environ.get("GRAFT_COMBINE_BATCH")
    if cb:
        cfg.combine_batch_size = int(cb)
    n_chunks = len(list_chunks(stream_dir))
    chunks_per_epoch = max(4, -(-n_chunks // epochs))

    # warm-up epoch (untimed): worker start + pipeline compile
    warm = "/tmp/movex_2node/warmlake"
    shutil.rmtree(warm, ignore_errors=True)
    replay(stream_dir, warm, cfg, chunks_per_epoch=1, max_epochs=1)
    shutil.rmtree(warm, ignore_errors=True)

    lake = "/tmp/movex_2node/lake"
    shutil.rmtree(lake, ignore_errors=True)
    t0 = time.perf_counter()
    rep = replay(stream_dir, lake, cfg, chunks_per_epoch=chunks_per_epoch)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cpus_total": cpus,
        "nodes": len(alive),
        "sec": round(dt, 3),
        "events": n_events,
        "events_per_sec": round(n_events / dt),
        "lake_rows": rep.lake_rows,
        "epochs": rep.epochs,
        "shuffle_rows": sum(m.get("events_in", 0) for m in rep.epoch_metrics),
        "shuffle_bytes": sum(m.get("shuffle_bytes", 0) for m in rep.epoch_metrics),
        "events_read": sum(m.get("events_read", 0) for m in rep.epoch_metrics),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
