"""Property-based check of the merge semantics: for ANY event sequence, the
engine's per-partition merge equals a brute-force per-key replay. Runs the
merge function directly (no Ray session needed) — fast enough for hypothesis."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from movex_cdc_ray.config import default_code_cdc_config
from movex_cdc_ray.stages.sink import MergeContext, lake_table_schema, merge_partition

KEYS = ["k0", "k1", "k2", "k3"]


def events_table(seq):
    """seq: list of (op, key_idx) — build a minimal pruned event table."""
    n = len(seq)
    ids = list(range(1, n + 1))
    ops = [op for op, _ in seq]
    keys = [KEYS[k] for _, k in seq]
    fields = default_code_cdc_config().latest_version().payload_fields
    cols = {
        "id": pa.array(ids, pa.int64()),
        "table_id": pa.array([1] * n, pa.int32()),
        "op": pa.array(ops, pa.string()),
        "txn_id": pa.array(["t"] * n, pa.string()),
        "created_at": pa.array([1_000_000 + i for i in ids], pa.timestamp("us")),
        "retry_count": pa.array([0] * n, pa.int32()),
        "key_string": pa.array(keys, pa.string()),
        "part": pa.array([0] * n, pa.int32()),
    }
    for f, t in fields.items():
        typ = {"string": pa.string(), "int32": pa.int32(), "int64": pa.int64()}[t]
        if f == "repo":
            vals = keys
        elif f == "path":
            vals = ["p"] * n
        elif f in ("size", "stars"):
            vals = ids
        else:
            vals = [f"{f}-{i}" for i in ids]
        cols[f"new_{f}"] = pa.array(
            [None if op == "D" else v for op, v in zip(ops, vals)], typ
        )
        if f in ("repo", "path"):
            cols[f"old_{f}"] = pa.array(
                [v if op in ("U", "D") else None for op, v in zip(ops, vals)], typ
            )
    return pa.table(cols)


def brute_force(seq):
    state = {}
    for i, (op, k) in enumerate(seq, start=1):
        key = KEYS[k]
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = i  # last applied event id
    return state


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["I", "U", "D", "i"]), st.integers(0, len(KEYS) - 1)),
        min_size=1,
        max_size=40,
    )
)
def test_merge_equals_bruteforce(tmp_path_factory, seq):
    cfg = default_code_cdc_config()
    lake_dir = str(tmp_path_factory.mktemp("prop"))
    ctx = MergeContext(
        lake_dir=lake_dir,
        epoch=1,
        prev_partitions={},
        payload_fields=list(cfg.latest_version().payload_fields),
        lake_schema=lake_table_schema(cfg),
        error_max_retries=5,
    )
    stats = merge_partition(ctx, events_table(seq), part=0)
    import pyarrow.parquet as pq

    from movex_cdc_ray.stages.sink import drop_tombstones

    merged = pq.read_table(stats["path"][0].as_py())
    live = drop_tombstones(merged)
    got = dict(zip(
        [k.split("\x1f")[0] for k in live["_key"].to_pylist()],
        live["_last_id"].to_pylist(),
    ))
    assert got == brute_force(seq)
    # deleted keys persist as tombstone FENCE rows carrying the delete's id
    # (the per-key stale check against late retries depends on them)
    for k, op, i in zip(
        merged["_key"].to_pylist(), merged["_last_op"].to_pylist(), merged["_last_id"].to_pylist()
    ):
        short = k.split("\x1f")[0]
        if op == "D":
            assert short not in got
            assert i == max(j for j, (o, kk) in enumerate(seq, start=1) if KEYS[kk] == k)


def test_late_retry_cannot_resurrect_deleted_key(tmp_path):
    """A deleted key's tombstone fence must stale-drop a late retry of an
    OLDER event — without the physical tombstone row, the retry finds no
    base row, passes the stale check, and resurrects the deleted key."""
    import pyarrow.parquet as pq

    from movex_cdc_ray.stages.sink import drop_tombstones

    cfg = default_code_cdc_config()
    lake_dir = str(tmp_path)
    ctx1 = MergeContext(
        lake_dir=lake_dir, epoch=1, prev_partitions={},
        payload_fields=list(cfg.latest_version().payload_fields),
        lake_schema=lake_table_schema(cfg), error_max_retries=5,
    )
    # epoch 1: insert id=1, delete id=9 → tombstone fence at 9, watermark 9
    s1 = merge_partition(ctx1, events_table([("I", 0), ("D", 0)]), part=0)
    base = pq.read_table(s1["path"][0].as_py())
    assert len(drop_tombstones(base)) == 0 and len(base) == 1  # fence row

    prev = {"0": {"path": s1["path"][0].as_py(), "deltas": [],
                  "watermark": s1["watermark"][0].as_py(), "rows": 0,
                  "sha": s1["sha"][0].as_py()}}
    # epoch 2: a late RETRY of an older upsert (id below the delete's id)
    retry = events_table([("U", 0)])  # id=1 < 9
    retry = retry.set_column(
        retry.column_names.index("retry_count"), "retry_count",
        pa.array([1] * len(retry), pa.int32()),
    )
    ctx2 = MergeContext(
        lake_dir=lake_dir, epoch=2, prev_partitions=prev,
        payload_fields=list(cfg.latest_version().payload_fields),
        lake_schema=lake_table_schema(cfg), error_max_retries=5,
    )
    s2 = merge_partition(ctx2, retry, part=0)
    merged = pq.read_table(s2["path"][0].as_py())
    assert len(drop_tombstones(merged)) == 0  # NOT resurrected
    assert s2["events_success"][0].as_py() == 0  # stale-dropped


def test_merge_split_across_epochs_equals_single_epoch(tmp_path):
    # applying a sequence in two epochs == applying it in one (watermarks advance)
    seq = [("I", 0), ("U", 0), ("I", 1), ("D", 0), ("U", 1), ("I", 0), ("U", 0)]
    cfg = default_code_cdc_config()

    def run(split):
        lake = str(tmp_path / f"lake_{split}")
        prev = {}
        chunks = [seq[:split], seq[split:]] if split else [seq]
        wm_table_offset = 0
        for e, chunk in enumerate([c for c in chunks if c], start=1):
            t = events_table(seq)  # ids are global positions
            mask = [wm_table_offset <= i < wm_table_offset + len(chunk) for i in range(len(seq))]
            ctx = MergeContext(
                lake_dir=lake, epoch=e, prev_partitions=prev,
                payload_fields=list(cfg.latest_version().payload_fields),
                lake_schema=lake_table_schema(cfg), error_max_retries=5,
            )
            stats = merge_partition(ctx, t.filter(pa.array(mask)), part=0)
            prev = {"0": {"path": stats["path"][0].as_py(), "rows": stats["lake_rows"][0].as_py(),
                          "watermark": stats["watermark"][0].as_py(), "sha": stats["sha"][0].as_py()}}
            wm_table_offset += len(chunk)
        return prev["0"]["sha"]

    assert run(0) == run(3)


# ---- incremental-view property: delta fold == brute-force recompute --------

def _fold_view(lake_dir, name, group_cols):
    import glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(lake_dir, "_views", name, "epoch=*", "*.parquet")))
    if not files:
        return pd.DataFrame()
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    g = df.groupby(group_cols, as_index=False).sum(numeric_only=True)
    return g[g["n_rows"] > 0].sort_values(group_cols).reset_index(drop=True)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["I", "U", "D", "i"]), st.integers(0, len(KEYS) - 1)),
        min_size=1,
        max_size=40,
    ),
    st.integers(0, 40),
)
def test_view_delta_equals_bruteforce(tmp_path_factory, seq, cut):
    """For ANY event sequence split into two epochs at ANY point, folding the
    merge-side view deltas equals recomputing the aggregates from the final
    live state — per-key groups (by_repo) AND one global group (by_path)."""
    from movex_cdc_ray.config import ViewSpec

    cut = min(cut, len(seq))
    cfg = default_code_cdc_config()
    lake_dir = str(tmp_path_factory.mktemp("viewprop"))
    views = [ViewSpec("by_repo", ["repo"], ["size"]),
             ViewSpec("by_path", ["path"], ["size"])]
    fields = list(cfg.latest_version().payload_fields)
    schema = lake_table_schema(cfg)
    full = events_table(seq)

    prev = {}
    for epoch, tbl in enumerate([full.slice(0, cut), full.slice(cut)], start=1):
        if len(tbl) == 0:
            continue
        ctx = MergeContext(
            lake_dir=lake_dir, epoch=epoch, prev_partitions=prev,
            payload_fields=fields, lake_schema=schema, error_max_retries=5,
            views=views,
        )
        s = merge_partition(ctx, tbl, part=0)
        prev = {"0": {"path": s["path"][0].as_py(), "deltas": [],
                      "watermark": s["watermark"][0].as_py(),
                      "rows": s["lake_rows"][0].as_py(),
                      "sha": s["sha"][0].as_py()}}

    state = brute_force(seq)  # key -> last applied id; repo == key, size == id
    got_repo = _fold_view(lake_dir, "by_repo", ["repo"])
    exp_repo = {k: (1, i) for k, i in state.items()}
    got_repo_d = {
        r["repo"]: (int(r["n_rows"]), int(r["sum_size"]))
        for _, r in got_repo.iterrows()
    } if len(got_repo) else {}
    assert got_repo_d == exp_repo

    got_path = _fold_view(lake_dir, "by_path", ["path"])
    if state:
        assert len(got_path) == 1
        assert int(got_path["n_rows"][0]) == len(state)
        assert int(got_path["sum_size"][0]) == sum(state.values())
    else:
        assert len(got_path) == 0
