"""Deterministic synthetic source-code CDC world (SURVEY.md §7.3 step 2).

Generates, from a single seed:
  * a source table ``(repo, path, commit, lang, content, size)`` — the
    north-rule input shape — used for INIT snapshot loads, and
  * a binlog-style Parquet change stream (the reference's ``EVENT_LOGS``
    staging table, `db/migrate/20200115071231_create_event_logs.rb`) with
    monotonic ids, txn ids, I/U/D/noop-update event mix, a configurable
    hot-key (mega-repo) skew profile, and a mid-stream schema-evolution
    boundary (column add ``stars``, ``size`` int32→int64).

The event mix mirrors the reference's deterministic test fixture
(`test/test_helper.rb:169-252` create_event_logs_for_test): inserts, updates,
deletes, a condition-suppressed insert (lang == 'xx'), and no-op updates whose
old == new payload must be suppressed by the capture stage (operator M4).

Everything is two-phase so it scales: phase 1 plans ALL events as small numpy
int arrays (key, op, version); phase 2 materializes wide ``content`` strings
one chunk file at a time. All values are pure functions of (seed, key,
version) — no wall clock (SURVEY §7.5 item 6).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .config import CaptureConfig, default_code_cdc_config

LANGS = np.array(["py", "js", "java", "go", "rs", "c", "rb", "ts", "xx"])
_EPOCH_US = np.int64(1_700_000_000_000_000)  # fixed base event-time (us)


@dataclass
class StreamSpec:
    """Parameters of one deterministic stream (recorded next to the chunks)."""

    n_events: int
    n_repos: int = 50
    paths_per_repo: int = 200
    hot_repo_fraction: float = 0.2  # share of events hitting repo 0 (mega-repo)
    delete_frac: float = 0.05
    noop_update_frac: float = 0.05
    chunk_size: int = 100_000
    seed: int = 42
    first_id: int = 1_000_000  # ids below are reserved for INIT snapshot events
    evolve_at_event: int | None = None  # event ordinal where schema v2 begins
    poison_every: int | None = None  # every Nth event gets a NULL content (error tests)
    content_rep_max: int = 6  # content length knob (~32..~200 bytes)

    @property
    def n_keys(self) -> int:
        return self.n_repos * self.paths_per_repo


def config_for_spec(spec: StreamSpec, num_partitions: int = 32) -> CaptureConfig:
    cfg = default_code_cdc_config(num_partitions=num_partitions)
    if spec.evolve_at_event is not None:
        cfg.schema_versions[1].active_from_id = spec.first_id + spec.evolve_at_event
    return cfg


# ---------------------------------------------------------------------------
# deterministic value functions
# ---------------------------------------------------------------------------


_LOOKUP_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _lookups(spec: StreamSpec) -> tuple[np.ndarray, np.ndarray]:
    """Per-spec repo/path name lookup tables (pure functions of small ranges,
    cached so chunk materialization is an O(1) fancy-index, not string ops)."""
    ck = (spec.n_repos, spec.paths_per_repo)
    hit = _LOOKUP_CACHE.get(ck)
    if hit is None:
        repos = np.array([f"repo-{i}" for i in range(spec.n_repos)], dtype=object)
        paths = np.array(
            [f"src/mod{p // 20}/file{p}.txt" for p in range(spec.paths_per_repo)], dtype=object
        )
        hit = _LOOKUP_CACHE[ck] = (repos, paths)
    return hit


def key_to_repo_path(key: np.ndarray, spec: StreamSpec) -> tuple[np.ndarray, np.ndarray]:
    repos, paths = _lookups(spec)
    return repos[key // spec.paths_per_repo], paths[key % spec.paths_per_repo]


def _digests(key: np.ndarray, version: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 32-hex-char digest per (seed, key, version) — a seeded
    splitmix-style integer mix rendered as hex, ~20x cheaper than per-row md5
    and just as stable across runs/platforms."""
    with np.errstate(over="ignore"):
        x = (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + version.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
             + np.uint64((seed * 0x94D049BB133111EB) % (1 << 64)))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        y = x ^ (x >> np.uint64(31))
        z = y * np.uint64(0xD6E8FEB86659FD93) + np.uint64(0x2545F4914F6CDD1D)
    h1 = np.array([format(v, "016x") for v in x.tolist()], dtype=object)
    h2 = np.array([format(v, "016x") for v in z.tolist()], dtype=object)
    return h1 + h2


def value_columns(key: np.ndarray, version: np.ndarray, spec: StreamSpec) -> dict[str, np.ndarray]:
    """Payload values as a pure function of (seed, key, version)."""
    dig = _digests(key, version, spec.seed)
    repo, path = key_to_repo_path(key, spec)
    rep = 1 + (key % spec.content_rep_max)
    content = np.array(
        [
            f"{r}/{p}@v{v} " + d * rp
            for r, p, v, d, rp in zip(repo, path, version.tolist(), dig, rep.tolist())
        ],
        dtype=object,
    )
    lang = LANGS[(key * 2654435761 + version) % (len(LANGS) - 1)]
    # a deterministic sliver of 'xx' rows exercises the condition filter (M3)
    lang = np.where((key + version) % 97 == 0, "xx", lang).astype(object)
    size = np.array([len(c) for c in content], dtype=np.int64)
    stars = ((key * 31 + version * 7) % 100_000).astype(np.int64)
    return {
        "repo": repo,
        "path": path,
        "commit": dig,
        "lang": lang,
        "content": content,
        "size": size,
        "stars": stars,
    }


# ---------------------------------------------------------------------------
# phase 1: integer event plan
# ---------------------------------------------------------------------------


@dataclass
class EventPlan:
    key: np.ndarray  # int64 key index
    op: np.ndarray  # 'I'/'U'/'D' object array
    ver_new: np.ndarray  # version for new values
    ver_old: np.ndarray  # version for old values (-1 = no old / NULL)
    ids: np.ndarray  # monotonic event ids
    txn_seq: np.ndarray  # transaction sequence numbers


def plan_events(spec: StreamSpec) -> EventPlan:
    rng = np.random.Generator(np.random.PCG64(spec.seed))
    n = spec.n_events

    # --- key choice with mega-repo skew --------------------------------------
    hot = rng.random(n) < spec.hot_repo_fraction
    hot_keys = rng.integers(0, spec.paths_per_repo, size=n)  # repo 0
    cold_keys = rng.integers(spec.paths_per_repo, spec.n_keys, size=n)
    key = np.where(hot, hot_keys, cold_keys).astype(np.int64)

    del_draw = rng.random(n) < spec.delete_frac
    noop_draw = rng.random(n) < spec.noop_update_frac

    # --- per-key ordered state machine, vectorized via pandas ----------------
    df = pd.DataFrame({"key": key, "d": del_draw, "nop": noop_draw})
    g = df.groupby("key", sort=False)
    seq = g.cumcount().to_numpy()  # ordinal of this event within its key
    first = seq == 0

    # Delete draws on a key's first event are ignored (key not yet alive);
    # an event following a delete draw becomes a (re-)insert. The stream's
    # merge semantics are upsert (I and U both upsert), so the occasional
    # I-on-alive-key this approximation produces is coherent — the pure-python
    # oracle below uses the exact same arrays, keeping both sides in lockstep.
    is_del_candidate = df["d"].to_numpy() & ~first
    prev_del = g["d"].shift(1, fill_value=False).to_numpy()
    prev_was_delete = prev_del & (seq - 1 > 0)

    op = np.where(first | prev_was_delete, "I", np.where(is_del_candidate & ~prev_was_delete, "D", "U"))
    # noop updates: only on plain updates (old == new payload, operator M4)
    is_noop = (op == "U") & df["nop"].to_numpy()

    # version advances on I and real U
    advancing = ((op == "I") | ((op == "U") & ~is_noop)).astype(np.int64)
    df["adv"] = advancing
    ver_after = df.groupby("key", sort=False)["adv"].cumsum().to_numpy() - 1
    # ver_after = version index of the key's current content AFTER this event
    ver_new = ver_after.copy()
    ver_old = np.where(op == "I", -1, np.where(advancing == 1, ver_after - 1, ver_after))
    # noop U: new == old == current version; D: old = current version, new unused
    ver_new = np.where(is_noop, ver_after, ver_new)

    ids = spec.first_id + np.arange(n, dtype=np.int64)
    txn_seq = (np.arange(n, dtype=np.int64) // 50).astype(np.int64)  # ~50 events/txn
    return EventPlan(key=key, op=op.astype(object), ver_new=ver_new, ver_old=ver_old, ids=ids, txn_seq=txn_seq)


# ---------------------------------------------------------------------------
# phase 2: chunk materialization
# ---------------------------------------------------------------------------

PAYLOAD_V1 = ["repo", "path", "commit", "lang", "content", "size"]
PAYLOAD_V2 = PAYLOAD_V1 + ["stars"]


def _chunk_table(plan: EventPlan, lo: int, hi: int, spec: StreamSpec, evolved: bool) -> pa.Table:
    key = plan.key[lo:hi]
    op = plan.op[lo:hi]
    ids = plan.ids[lo:hi]
    vnew = plan.ver_new[lo:hi]
    vold = plan.ver_old[lo:hi]

    cols: dict[str, pa.Array] = {
        "id": pa.array(ids, pa.int64()),
        "table_id": pa.array(np.full(len(ids), 1, dtype=np.int32)),
        "op": pa.array(op, pa.string()),
        "dbuser": pa.array(np.where(key % 3 == 0, "svc_ci", "dev_user").astype(object), pa.string()),
        "txn_id": pa.array([f"txn-{t}" for t in plan.txn_seq[lo:hi].tolist()], pa.string()),
        "created_at": pa.array(_EPOCH_US + ids * np.int64(1_000), pa.timestamp("us")),
        "retry_count": pa.array(np.zeros(len(ids), dtype=np.int32)),
    }

    fields = PAYLOAD_V2 if evolved else PAYLOAD_V1
    newvals = value_columns(key, np.maximum(vnew, 0), spec)
    has_new = op != "D"
    oldvals = value_columns(key, np.maximum(vold, 0), spec)
    has_old = vold >= 0

    size_type = pa.int64() if evolved else pa.int32()
    for f in fields:
        nv = newvals[f].astype(object)
        ov = oldvals[f].astype(object)
        nv[~has_new] = None
        ov[~has_old] = None
        typ = (
            size_type
            if f == "size"
            else (pa.int64() if f == "stars" else pa.string())
        )
        if f in ("size", "stars"):
            nv_arr = pa.array([None if x is None else int(x) for x in nv], typ)
            ov_arr = pa.array([None if x is None else int(x) for x in ov], typ)
        else:
            nv_arr = pa.array(nv, pa.string())
            ov_arr = pa.array(ov, pa.string())
        cols[f"new_{f}"] = nv_arr
        cols[f"old_{f}"] = ov_arr

    t = pa.table(cols)
    if spec.poison_every:
        mask = (ids - spec.first_id) % spec.poison_every == spec.poison_every - 1
        if mask.any():
            poisoned = pa.compute.if_else(pa.array(mask), pa.nulls(len(ids), pa.string()), t["new_content"])
            i = t.column_names.index("new_content")
            t = t.set_column(i, "new_content", poisoned)
    return t


def generate_stream(stream_dir: str, spec: StreamSpec) -> list[str]:
    """Write the chunked change stream; returns the ordered chunk paths.

    Chunk files are the analog of the reference's 60 s interval partitions of
    ``EVENT_LOGS`` (`create_event_logs.rb:22-23`): bounded, ordered, dropped
    (GC'd) once consumed. A chunk never straddles the schema-evolution
    boundary.
    """
    os.makedirs(stream_dir, exist_ok=True)
    plan = plan_events(spec)
    bounds: list[tuple[int, int]] = []
    lo = 0
    while lo < spec.n_events:
        hi = min(lo + spec.chunk_size, spec.n_events)
        if spec.evolve_at_event is not None and lo < spec.evolve_at_event < hi:
            hi = spec.evolve_at_event
        bounds.append((lo, hi))
        lo = hi
    paths = []
    for i, (lo, hi) in enumerate(bounds):
        evolved = spec.evolve_at_event is not None and lo >= spec.evolve_at_event
        t = _chunk_table(plan, lo, hi, spec, evolved)
        p = os.path.join(stream_dir, f"chunk_{i:06d}.parquet")
        pq.write_table(t, p, row_group_size=min(spec.chunk_size, 64 * 1024))
        paths.append(p)
    # written LAST: its presence + spec equality certify a COMPLETE stream
    # (stream_matches_spec is the cache-validity check for reusing dirs)
    with open(os.path.join(stream_dir, "_SPEC.json"), "w") as f:
        import json

        json.dump({k: getattr(spec, k) for k in spec.__dataclass_fields__}, f)
    return paths


def stream_matches_spec(stream_dir: str, spec: StreamSpec) -> bool:
    """True iff ``stream_dir`` holds a COMPLETE stream generated from exactly
    ``spec``: _SPEC.json is written after the last chunk, so equality rules
    out both truncated generations and stale dirs from other spec values
    (counting chunk files alone catches neither)."""
    import json

    try:
        with open(os.path.join(stream_dir, "_SPEC.json")) as f:
            doc = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return False
    return doc == {k: getattr(spec, k) for k in spec.__dataclass_fields__}


def make_source_table(spec: StreamSpec) -> pa.Table:
    """Initial snapshot source: every key at version 0 (for INIT loads, S7)."""
    key = np.arange(spec.n_keys, dtype=np.int64)
    vals = value_columns(key, np.zeros_like(key), spec)
    return pa.table({k: pa.array(v) for k, v in vals.items() if k != "stars"})


# ---------------------------------------------------------------------------
# the pure-python oracle for the final lake state (used by tests)
# ---------------------------------------------------------------------------


def expected_lake_state(spec: StreamSpec, drop_lang_xx_inserts: bool = False) -> pd.DataFrame:
    """Reference final state: replay the plan per key in id order.

    Suppression semantics replicated: no-op updates (old == new) never reach
    the lake (operator M4); optionally condition-filtered inserts (M3) are
    dropped but later updates still upsert.
    """
    plan = plan_events(spec)
    df = pd.DataFrame(
        {
            "id": plan.ids,
            "key": plan.key,
            "op": plan.op.astype(str),
            "ver_new": plan.ver_new,
            "ver_old": plan.ver_old,
        }
    )
    noop = (df["op"] == "U") & (df["ver_new"] == df["ver_old"])
    df = df[~noop]
    if drop_lang_xx_inserts:
        vals = value_columns(df["key"].to_numpy(), np.maximum(df["ver_new"].to_numpy(), 0), spec)
        df = df[~(((df["op"] == "I").to_numpy()) & (vals["lang"] == "xx"))]
    last = df.sort_values("id").groupby("key").tail(1)
    last = last[last["op"] != "D"]
    key = last["key"].to_numpy()
    ver = last["ver_new"].to_numpy()
    vals = value_columns(key, ver, spec)
    out = pd.DataFrame(vals)
    out["_last_id"] = last["id"].to_numpy()
    out["_last_op"] = last["op"].to_numpy()
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
