"""Statistics: partial counters, grouped finalize, time-bucket rollup (A1-A4).

The reference keeps per-worker ``StatisticCounter`` partials flushed into a
process-wide concentrator, then into the STATISTICS table
(`app/models/statistic_counter.rb:14-48`,
`statistic_counter_concentrator.rb:16-87`), and compresses old rows into
hourly/daily buckets (`app/models/compress_statistics.rb:26-60`, A2).

Ray shape: the merge sink already emits one stats row per (epoch, partition)
(partial aggregation inside the stateful stage — T5); this module finalizes
them with a small ``groupby().aggregate()`` and provides the generic
time-bucket rollup used for statistics compression.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


class StatisticCounter:
    """Per-actor partial counter (T5): increment in the hot path, flush once.

    Keys are (table_id, operation, counter_type) exactly like the reference's
    STATISTICS rows."""

    def __init__(self) -> None:
        self.counts: dict[tuple[int, str, str], int] = {}

    def increment(self, table_id: int, operation: str, counter_type: str, n: int = 1) -> None:
        k = (table_id, operation, counter_type)
        self.counts[k] = self.counts.get(k, 0) + n

    def to_table(self) -> pa.Table:
        rows = sorted(self.counts.items())
        return pa.table(
            {
                "table_id": pa.array([k[0] for k, _ in rows], pa.int32()),
                "operation": pa.array([k[1] for k, _ in rows], pa.string()),
                "counter_type": pa.array([k[2] for k, _ in rows], pa.string()),
                "events": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    def merge(self, other: "StatisticCounter") -> None:
        """Concentrator merge (`statistic_counter_concentrator.rb:54-87`)."""
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v


def finalize_counters(partials: rd.Dataset) -> rd.Dataset:
    """Final aggregation of partial counter rows — a small shuffle over
    (tables × ops × counter types) rows, never over event data (A1)."""
    return partials.groupby(["table_id", "operation", "counter_type"]).aggregate(
        Sum("events", alias_name="events")
    )


def time_rollup(
    ds: rd.Dataset,
    ts_col: str,
    bucket: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> rd.Dataset:
    """Statistics compression (A2): bucket timestamps (``hour``/``day``),
    group, SUM the counters, MIN/MAX the timestamps — the exact shape of
    `compress_statistics.rb:26-60`."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return batch.append_column("time_bucket", pc.floor_temporal(ts, unit=bucket))

    aggs = [Sum(c, alias_name=f"sum_{c}") for c in sum_cols]
    aggs += [Min(ts_col, alias_name="min_ts"), Max(ts_col, alias_name="max_ts"), Count(alias_name="n_rows")]
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(group_cols + ["time_bucket"])
        .aggregate(*aggs)
    )


def compress_epoch_stats(lake_dir: str, keep_epochs: int = 8) -> dict:
    """Statistics compression over the engine's own per-epoch stats dataset
    (the `_stats/epoch=*.parquet` files the merge writes): epochs older than
    the retention window are SUMmed into one `rollup.parquet` per partition
    and their per-epoch files dropped — `compress_statistics.rb:26-60`
    applied to real engine output (A2 + housekeeping)."""
    import glob
    import os

    import pyarrow.parquet as pq

    def epoch_of(f: str) -> int:
        return int(os.path.basename(f).split("=")[1].split(".")[0])

    files = sorted(glob.glob(os.path.join(lake_dir, "_stats", "epoch=*.parquet")))
    rollup_path = os.path.join(lake_dir, "_stats", "rollup.parquet")
    rollup = pq.read_table(rollup_path) if os.path.exists(rollup_path) else None
    # crash-safe idempotence: the rollup records the max epoch it already
    # folded; epoch files at or below it are leftovers of a crash between
    # the (atomic) rollup write and the removes — delete WITHOUT re-reading,
    # or their counters would double-count
    folded_through = (
        int(pc.max(rollup["folded_through"]).as_py())
        if rollup is not None and "folded_through" in rollup.column_names
        else -1
    )
    stale = [f for f in files if epoch_of(f) <= folded_through]
    for f in stale:
        os.remove(f)
    files = [f for f in files if epoch_of(f) > folded_through]
    if len(files) <= keep_epochs:
        return {"compressed_epochs": 0, "kept_epochs": len(files)}
    old, recent = files[:-keep_epochs], files[-keep_epochs:]
    tables = [pq.read_table(f) for f in old]
    if rollup is not None:
        tables.insert(0, rollup)
    t = pa.concat_tables(tables, promote_options="default")
    df = t.to_pandas()
    sum_cols = [
        c
        for c in df.columns
        if c.startswith("events_") or c in ("upserts", "deletes", "ordering_violations")
    ]
    agg = {c: "sum" for c in sum_cols}
    agg["epoch"] = "max"
    agg["watermark"] = "max"
    rolled = df.groupby("part", as_index=False).agg(agg)
    rolled["folded_through"] = max(epoch_of(f) for f in old)
    import pyarrow as _pa

    from ..state.manifest import atomic_write_parquet

    atomic_write_parquet(_pa.Table.from_pandas(rolled, preserve_index=False), rollup_path)
    for f in old:
        os.remove(f)
    return {"compressed_epochs": len(old), "kept_epochs": len(recent), "rollup": rollup_path}


def health_check(lake_dir: str, cfg=None) -> dict:
    """Bounded health counts (A3): backlog, retries, final errors, partitions,
    watermarks — from manifests and file metadata, never a data scan
    (reference `app/models/event_log.rb:102-134`).

    With a :class:`CaptureConfig` passed, also reports **config drift**: lake
    rows whose ``_table_id`` no longer appears in the active config — the
    analog of the reference's orphaned-trigger detection
    (`app/models/db_trigger_generator_base.rb:77-119`: deployed capture
    artifacts whose config vanished). The engine rebuilds capture plans
    wholesale so orphaned *plans* can't exist, but lake state for a dropped
    table lingers silently without this report. The scan reads ONLY the
    ``_table_id``/``_last_op`` columns of the bases (column-pruned, bounded
    by partition count — an admin verb, not a hot path)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import Manifest

    m = Manifest.latest(lake_dir)
    retry_rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(lake_dir, "_retry", "epoch=*", "part=*.parquet"))
    )
    final_rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(lake_dir, "_final_errors", "epoch=*", "part=*.parquet"))
    )
    out = {
        "epoch": m.epoch,
        "chunks_consumed": m.chunks_consumed,
        "partitions": len(m.partitions),
        "lake_rows": m.total_rows(),
        "retry_backlog": retry_rows,
        "final_errors": final_rows,
        "watermarks": {k: v["watermark"] for k, v in sorted(m.partitions.items(), key=lambda kv: int(kv[0]))},
        "last_epoch_metrics": m.metrics,
    }
    if cfg is not None:
        known = {t.table_id for t in cfg.tables}
        orphans: dict[int, int] = {}
        for f in m.data_files():
            t = pq.read_table(f, columns=["_table_id", "_last_op"])
            if len(t) == 0:
                continue
            live = t.filter(pc.invert(pc.equal(t["_last_op"], "D")))
            if len(live) == 0:
                continue
            counts = (
                pa.table({"_table_id": live["_table_id"]})
                .group_by("_table_id")
                .aggregate([("_table_id", "count")])
            )
            for tid, n in zip(
                counts["_table_id"].to_pylist(), counts["_table_id_count"].to_pylist()
            ):
                if tid not in known:
                    orphans[int(tid)] = orphans.get(int(tid), 0) + int(n)
        out["orphaned_table_rows"] = {str(k): v for k, v in sorted(orphans.items())}
        out["config_drift"] = bool(orphans)
    return out
