"""Two-NODE scaling protocol (round-4 verdict task 1): the identical
10M-event replay on a local 2-process Ray cluster — `ray start --head` plus
one worker raylet, each taskset-pinned to its own disjoint core set — so the
epoch's groupby exchange crosses the raylet-to-raylet object-transfer path
instead of one shared in-process plasma store.

Levels follow the single-process protocol: lo = 2 total cores (1 CPU/node),
hi = 8 total cores (4 CPUs/node); interleaved paired trials, each leg
probe-gated on host first-touch bandwidth; efficiency per trial =
(ev_s_hi / ev_s_lo) / (hi/lo). Writes BENCH/scaling_r5_two_node.json.

Run from the repo root on an otherwise-idle box:
    python tools/two_node_scaling.py [n_trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = "/root/repo"
PORT = 6399
ADDR = f"127.0.0.1:{PORT}"
PROBE_GATE = float(os.environ.get("GRAFT_SCALE_PROBE_GATE", "1000"))
PROBE_WAIT = float(os.environ.get("GRAFT_SCALE_PROBE_WAIT", "300"))
OBJ_STORE = "8000000000"  # 8 GB per raylet


def _env() -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # 'local' preset would bypass the cluster
    env["PYTHONPATH"] = REPO
    return env


def _run(cmd: list[str], **kw):
    return subprocess.run(cmd, env=_env(), cwd="/tmp", capture_output=True,
                          text=True, **kw)


def stop_cluster() -> None:
    _run(["ray", "stop", "--force"])
    for pat in ("ray::", "raylet", "gcs_server", "plasma"):
        subprocess.run(["pkill", "-9", "-f", pat], capture_output=True)
    time.sleep(1.0)


def start_cluster(cpus_per_node: int) -> None:
    """Head on cores [0, cpus), worker raylet on cores [16, 16+cpus) —
    disjoint sets so the two 'nodes' never share a core."""
    head_cores = ",".join(str(c) for c in range(cpus_per_node))
    worker_cores = ",".join(str(16 + c) for c in range(cpus_per_node))
    r = _run(["taskset", "-c", head_cores, "ray", "start", "--head",
              f"--port={PORT}", f"--num-cpus={cpus_per_node}",
              f"--object-store-memory={OBJ_STORE}",
              "--include-dashboard=false", "--disable-usage-stats"])
    if r.returncode != 0:
        raise RuntimeError(f"head start failed: {r.stderr[-1000:]}")
    r = _run(["taskset", "-c", worker_cores, "ray", "start",
              f"--address={ADDR}", f"--num-cpus={cpus_per_node}",
              f"--object-store-memory={OBJ_STORE}", "--disable-usage-stats"])
    if r.returncode != 0:
        stop_cluster()
        raise RuntimeError(f"worker start failed: {r.stderr[-1000:]}")


def probe_gate() -> float:
    from bench import host_phase_probe

    deadline = time.time() + PROBE_WAIT
    while True:
        p = host_phase_probe()
        if p >= PROBE_GATE:
            return p
        if time.time() > deadline:
            raise RuntimeError(f"host probe stuck below gate ({p} MB/s)")
        print(f"  probe {p} MB/s < {PROBE_GATE}, backing off 15s", flush=True)
        time.sleep(15)


def run_leg(total_cpus: int, stream_dir: str, n_events: int, epochs: int) -> dict:
    cpus_per_node = total_cpus // 2
    probe = probe_gate()
    start_cluster(cpus_per_node)
    try:
        head_cores = ",".join(str(c) for c in range(cpus_per_node))
        r = _run(["taskset", "-c", head_cores, sys.executable,
                  os.path.join(REPO, "tools", "two_node_child.py"),
                  ADDR, stream_dir, str(n_events), str(epochs)],
                 timeout=1800)
        line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
        if not line:
            raise RuntimeError(f"child produced no JSON: {r.stdout[-500:]} {r.stderr[-1000:]}")
        out = json.loads(line[-1])
        if "error" in out:
            raise RuntimeError(out["error"])
        out["host_probe_mb_s"] = probe
        return out
    finally:
        stop_cluster()


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    lo, hi = 2, 8
    n_events = int(os.environ.get("GRAFT_SCALING_EVENTS", "10000000"))
    epochs = int(os.environ.get("GRAFT_EPOCHS", "2"))

    from bench import ensure_stream

    stream_dir, _spec = ensure_stream(n_events)
    stop_cluster()

    trials = []
    for t in range(n_trials):
        leg_lo = run_leg(lo, stream_dir, n_events, epochs)
        leg_hi = run_leg(hi, stream_dir, n_events, epochs)
        eff = (leg_hi["events_per_sec"] / leg_lo["events_per_sec"]) / (hi / lo)
        trials.append({
            "trial": t,
            f"sec_{lo}": leg_lo["sec"], f"sec_{hi}": leg_hi["sec"],
            f"events_per_sec_{lo}": leg_lo["events_per_sec"],
            f"events_per_sec_{hi}": leg_hi["events_per_sec"],
            f"shuffle_bytes_{lo}": leg_lo["shuffle_bytes"],
            f"shuffle_bytes_{hi}": leg_hi["shuffle_bytes"],
            f"shuffle_rows_{lo}": leg_lo["shuffle_rows"],
            f"shuffle_rows_{hi}": leg_hi["shuffle_rows"],
            f"lake_rows_{lo}": leg_lo["lake_rows"],
            f"lake_rows_{hi}": leg_hi["lake_rows"],
            f"probe_{lo}": leg_lo["host_probe_mb_s"],
            f"probe_{hi}": leg_hi["host_probe_mb_s"],
            "efficiency": round(eff, 3),
        })
        print(json.dumps(trials[-1]), flush=True)

    effs = sorted(t["efficiency"] for t in trials)
    median = effs[len(effs) // 2] if len(effs) % 2 else (
        effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    result = {
        "metric": "two_node_scaling_efficiency",
        "value": round(median, 3),
        "levels": [lo, hi],
        "topology": "2 raylets on one host, disjoint taskset core sets; "
                    "exchange crosses the raylet-to-raylet object transfer path",
        "events": n_events,
        "epochs": epochs,
        "protocol": f"median of {len(trials)} interleaved paired probe-gated trials",
        "trials": trials,
    }
    cb = os.environ.get("GRAFT_COMBINE_BATCH")
    if cb:
        result["combine_batch_size"] = int(cb)
    out_name = os.environ.get("GRAFT_TWO_NODE_OUT", "scaling_r5_two_node.json")
    out_path = os.path.join(REPO, "BENCH", out_name)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "trials"}))


if __name__ == "__main__":
    main()
