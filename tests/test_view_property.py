"""Property-based check of delta-mode view maintenance: for ANY event
sequence, ANY epoch split, and ANY compaction points, the folded view deltas
equal a from-scratch grouped recompute of the final live state. Drives
``merge_partition`` (delta mode) + ``compact_partition`` directly — no Ray
session, fast enough for hypothesis.

The property under test is the associativity the whole design leans on:
each compaction's view delta is (new live contribution − retracted old
contribution) over chain-touched keys, so the SUM over any sequence of
compactions must telescope to the final state's aggregate.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from movex_cdc_ray.config import ViewSpec, default_code_cdc_config
from movex_cdc_ray.pipelines.replay import compact_partition
from movex_cdc_ray.stages.sink import (
    MergeContext,
    drop_tombstones,
    lake_table_schema,
    merge_partition,
)
from tests.test_merge_property import KEYS, brute_force, events_table


def _run_epochs_with_compactions(lake_dir, seq, boundaries, compact_after):
    """Delta-mode epochs split at ``boundaries``; compact at the marked
    epoch indices (always once more at the end). Returns the view-delta
    files written by the compactions plus the final entry."""
    cfg = default_code_cdc_config()
    schema = lake_table_schema(cfg)
    views = [ViewSpec("v", ["repo"], ["size"])]
    entry = {"path": None, "deltas": [], "watermark": -1}
    pieces = []
    prev = 0
    for b in boundaries + [len(seq)]:
        if b > prev:
            pieces.append(seq[prev:b])
            prev = b
    epoch = 0
    next_id = 1
    for i, piece in enumerate(pieces):
        epoch += 1
        ctx = MergeContext(
            lake_dir=lake_dir, epoch=epoch,
            prev_partitions={"0": dict(entry)} if entry["watermark"] >= 0 else {},
            payload_fields=list(cfg.latest_version().payload_fields),
            lake_schema=schema, error_max_retries=5, mode="delta",
        )
        t = events_table(piece)
        # re-id the slice so ids stay globally monotone across epochs
        ids = pa.array(range(next_id, next_id + len(t)), pa.int64())
        t = t.set_column(t.column_names.index("id"), "id", ids)
        next_id += len(t)
        stats = merge_partition(ctx, t, part=0)
        entry = {
            "path": entry["path"],
            "deltas": entry["deltas"] + [stats["path"][0].as_py()],
            "watermark": int(stats["watermark"][0].as_py()),
        }
        if i in compact_after and entry["deltas"]:
            epoch += 1
            out = os.path.join(lake_dir, f"base-e{epoch}.parquet")
            r = compact_partition(0, entry, out, schema, lake_dir, epoch, views, None)
            entry = {"path": r["path"], "deltas": [], "watermark": entry["watermark"]}
    if entry["deltas"]:
        epoch += 1
        out = os.path.join(lake_dir, f"base-e{epoch}.parquet")
        r = compact_partition(0, entry, out, schema, lake_dir, epoch, views, None)
        entry = {"path": r["path"], "deltas": [], "watermark": entry["watermark"]}
    return entry


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["I", "U", "D", "i"]), st.integers(0, len(KEYS) - 1)),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(1, 29), max_size=3),
    st.sets(st.integers(0, 3), max_size=2),
)
def test_delta_view_folds_to_recompute(tmp_path_factory, seq, boundaries, compact_after):
    lake_dir = str(tmp_path_factory.mktemp("vprop"))
    entry = _run_epochs_with_compactions(
        lake_dir, seq, sorted(set(b for b in boundaries if b < len(seq))), compact_after
    )
    # fold every compaction's view delta
    vfiles = sorted(glob.glob(os.path.join(lake_dir, "_views", "v", "epoch=*", "*.parquet")))
    agg: dict[str, tuple[int, int]] = {}
    for f in vfiles:
        t = pq.read_table(f)
        for r in t.to_pylist():
            n, s_ = agg.get(r["repo"], (0, 0))
            agg[r["repo"]] = (n + r["n_rows"], s_ + r["sum_size"])
    agg = {k: v for k, v in agg.items() if v[0] > 0}

    # from-scratch recompute over the final base's live rows
    live = drop_tombstones(pq.read_table(entry["path"]))
    exp: dict[str, tuple[int, int]] = {}
    for r in live.to_pylist():
        n, s_ = exp.get(r["repo"], (0, 0))
        exp[r["repo"]] = (n + 1, s_ + (r["size"] or 0))
    assert agg == exp

    # and the lake itself matches the per-key brute force
    got = {
        k.split("\x1f")[0]: i
        for k, i in zip(live["_key"].to_pylist(), live["_last_id"].to_pylist())
    }
    assert got == brute_force(seq)
