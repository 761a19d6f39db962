"""Transactional topic delivery — the reference's PRIMARY output path.

The reference worker loop reads an event batch, produces every message to
its Kafka topic inside ONE transaction, and only then marks the batch
shipped (`app/models/transfer_thread.rb:200-320`; exactly-once bracket
`transfer_thread.rb:361-420`). Re-expressed Ray-Data-first: capture →
key-hash partition → one produce task per partition writes that epoch's
messages as per-(topic, partition, epoch) JSONL files at DETERMINISTIC
staged paths, and visibility is gated by the same atomic manifest protocol
as the lake sink (epoch fencing + per-partition watermarks). A retried
epoch overwrites its files byte-identically, so readers that trust only
committed epochs observe exactly-once delivery.

Ordering: messages are written in ascending event id within their key-hash
partition — the per-key ascending-id guarantee the reference's KafkaMock
asserts (`app/models/kafka_mock.rb:49-63`). Unlike the lake sink there is
NO last-writer-wins combine: every captured event ships (that is the
difference between delivering a change FEED and maintaining converged
STATE).

Oversized messages (rendered value > ``max_message_bytes``) are quarantined
to a per-epoch DLQ parquet instead of delivered — the reference's
message-too-large final error (`transfer_thread.rb` KafkaBase
max.message.bytes handling, operator A4).
"""

from __future__ import annotations

import glob
import hashlib
import os
from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import CaptureConfig
from ..sources.stream import epoch_batches, pending_chunks, read_chunks
from ..state.manifest import Manifest, atomic_write_parquet, new_writer_token

TOPICS_DIR = "topics"
DLQ_DIR = "_oversized"

PRODUCE_STATS_SCHEMA = pa.schema(
    [("part", pa.int32()), ("epoch", pa.int64()), ("events_in", pa.int64()),
     ("events_below_watermark", pa.int64()), ("delivered", pa.int64()),
     ("oversized", pa.int64()), ("watermark", pa.int64()),
     ("bytes", pa.int64()), ("sha", pa.string()), ("topics", pa.string())]
)


def _atomic_write_text(data: bytes, path: str) -> int:
    """Same tmp + fsync + rename + dir-fsync contract as
    atomic_write_parquet: the manifest commit is durable, so a synced
    manifest must never reference message bytes still in the page cache."""
    import uuid

    from ..state.manifest import _fsync_dir

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path)
    return len(data)


def message_file(out_dir: str, topic: str, part: int, epoch: int,
                 compression: str = "none") -> str:
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"
    return os.path.join(
        out_dir, TOPICS_DIR, topic, f"part={part:05d}", f"epoch={epoch:06d}{ext}"
    )


def _epoch_files(part_dir: str) -> list[tuple[int, str]]:
    """(epoch, path) of every message file in a partition dir, either
    extension — readers are compression-agnostic, so a stream can switch
    ``producer_compression`` between epochs without breaking consumers."""
    out = []
    for f in glob.glob(os.path.join(part_dir, "epoch=*.jsonl")) + glob.glob(
        os.path.join(part_dir, "epoch=*.jsonl.gz")
    ):
        b = os.path.basename(f)
        out.append((int(b[len("epoch="):].split(".")[0]), f))
    return sorted(out)


def _message_lines(path: str):
    """Text lines of a message file, gzip-aware; zero-byte files (a topic
    slice with no messages) yield nothing regardless of extension."""
    import gzip

    if os.path.getsize(path) == 0:
        return
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        yield from fh


@dataclass
class ProduceContext:
    out_dir: str
    epoch: int
    prev_partitions: dict[str, dict[str, Any]]
    cfg: CaptureConfig


def produce_partition(ctx: ProduceContext, group: pa.Table, part: int) -> pa.Table:
    """Deliver one partition's epoch slice. Pure given inputs + config;
    idempotent (deterministic file content at deterministic paths)."""
    from ..stages.capture import attach_envelope, render_message_json
    from ..functions.scalar import escape_json_string

    cfg, epoch, out_dir = ctx.cfg, ctx.epoch, ctx.out_dir
    prev = ctx.prev_partitions.get(str(part))
    prev_wm = prev["watermark"] if prev else -1
    events_in = len(group)

    ids = group["id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    new_wm = max(int(pc.max(ids).as_py()), prev_wm) if len(group) else prev_wm
    # NO retry bypass here, unlike the lake merge: a re-fed event would be a
    # DUPLICATE message out of ascending-id order (the lake compensates with
    # its per-key stale-drop; delivery has no per-key state to drop against).
    # The retry ledger is a lake-sink mechanism — delivery treats any
    # replayed id as a below-watermark duplicate.
    fresh = group.filter(pc.greater(ids, prev_wm))
    below = events_in - len(fresh)

    if len(fresh) == 0:
        # everything replayed/below-watermark: commit the stats row (the
        # watermark may still advance) but render and write nothing
        return pa.table(
            {"part": pa.array([part], pa.int32()),
             "epoch": pa.array([epoch], pa.int64()),
             "events_in": pa.array([events_in], pa.int64()),
             "events_below_watermark": pa.array([below], pa.int64()),
             "delivered": pa.array([0], pa.int64()),
             "oversized": pa.array([0], pa.int64()),
             "watermark": pa.array([new_wm], pa.int64()),
             "bytes": pa.array([0], pa.int64()),
             "sha": pa.array([hashlib.sha256(b"").hexdigest()], pa.string()),
             "topics": pa.array([""], pa.string())},
            schema=PRODUCE_STATS_SCHEMA,
        )

    # ascending id within the partition = the per-key ordering guarantee
    fid = fresh["id"].combine_chunks() if isinstance(fresh["id"], pa.ChunkedArray) else fresh["id"]
    fresh = fresh.take(pc.sort_indices(fid))

    env = attach_envelope(fresh, cfg)
    value = render_message_json(fresh, cfg, env=env)  # envelope computed ONCE
    key = fresh["msg_key"]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    n = len(fresh)
    key_frag = pc.coalesce(
        pc.binary_join_element_wise('"', escape_json_string(key), '"', ""),
        pa.array(["null"] * n, pa.string()),
    )
    # CloudEvents headers ride along per message when the table enables them
    # (attach_envelope gates the ce_* columns per row; reference
    # `transfer_thread.rb:663-679` attaches them as Kafka record headers)
    hdr_frag = pa.array([""] * n, pa.string())
    ce_cols = [c for c in env.column_names if c.startswith("ce_")]
    if ce_cols:
        frags = []
        for c in ce_cols:
            col = env[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            frags.append(pc.binary_join_element_wise(
                f'"{c}": "', escape_json_string(col), '"', ""))
        body = frags[0]
        for fr in frags[1:]:
            body = pc.binary_join_element_wise(body, fr, ", ")
        # rows with CE disabled have null ce_* values -> null body -> no frag
        hdr_frag = pc.coalesce(
            pc.binary_join_element_wise(', "headers": {', body, "}", ""),
            pa.array([""] * n, pa.string()),
        )
    lines = pc.binary_join_element_wise(
        '{"key": ', key_frag, ', "value": ', value, hdr_frag, "}", ""
    )

    oversized_mask = pc.greater(pc.binary_length(value), cfg.max_message_bytes)
    n_over = int(pc.sum(oversized_mask.cast(pa.int8())).as_py() or 0) if n else 0
    if n_over:
        dlq = pa.table(
            {"id": fresh["id"].combine_chunks() if isinstance(fresh["id"], pa.ChunkedArray) else fresh["id"],
             "topic": env["topic"].combine_chunks() if isinstance(env["topic"], pa.ChunkedArray) else env["topic"],
             "bytes": pc.binary_length(value).cast(pa.int64())}
        ).filter(oversized_mask)
        atomic_write_parquet(
            dlq, os.path.join(out_dir, DLQ_DIR, f"epoch={epoch:06d}", f"part={part:05d}.parquet")
        )
        keep = pc.invert(oversized_mask)
        lines, env = lines.filter(keep), env.filter(keep)

    topics_col = env["topic"]
    if isinstance(topics_col, pa.ChunkedArray):
        topics_col = topics_col.combine_chunks()
    h = hashlib.sha256()
    total_bytes = 0
    written_topics = []
    for topic in sorted(set(pc.fill_null(topics_col, "").to_pylist())):
        mask = pc.equal(pc.fill_null(topics_col, ""), topic)
        tl = lines.filter(mask)
        data = ("\n".join(tl.to_pylist()) + "\n").encode() if len(tl) else b""
        comp = getattr(cfg, "producer_compression", "none")
        if comp == "gzip" and data:
            import gzip

            # mtime=0 pins the gzip header: a crashed epoch's re-attempt
            # must reproduce the committed bytes EXACTLY (the produce
            # crash-recovery byte-identity contract)
            payload = gzip.compress(data, 6, mtime=0)
        else:
            payload = data
        total_bytes += _atomic_write_text(
            payload, message_file(out_dir, topic or "_untopiced", part, epoch, comp)
        )
        # the epoch sha hashes UNCOMPRESSED message bytes, so rewrite/gzip
        # runs of the same stream stay digest-comparable
        h.update(topic.encode() + b"\x00" + data)
        written_topics.append(topic or "_untopiced")

    return pa.table(
        {"part": pa.array([part], pa.int32()),
         "epoch": pa.array([epoch], pa.int64()),
         "events_in": pa.array([events_in], pa.int64()),
         "events_below_watermark": pa.array([below], pa.int64()),
         "delivered": pa.array([len(lines)], pa.int64()),
         "oversized": pa.array([n_over], pa.int64()),
         "watermark": pa.array([new_wm], pa.int64()),
         "bytes": pa.array([total_bytes], pa.int64()),
         "sha": pa.array([h.hexdigest()], pa.string()),
         "topics": pa.array([",".join(written_topics)], pa.string())},
        schema=PRODUCE_STATS_SCHEMA,
    )


def produce_epoch(
    cfg: CaptureConfig,
    manifest: Manifest,
    epoch: int,
    chunk_files: list[str],
    out_dir: str,
    writer_token: str,
    batch_size: int | None = None,
) -> tuple[Manifest, dict[str, Any]]:
    """One delivery transaction: capture → partition → produce → commit.
    Shares the lake pipeline's exactly-once skeleton (watermarks, fencing,
    chunk ledger) but ships EVERY captured event — no combine, full message
    key + envelope rendering."""
    from .replay import CapturePartitionStage, _epoch_execution_context

    manifest.check_partitioning(cfg.num_partitions)
    if not chunk_files:
        manifest = manifest.commit_epoch(epoch, [], {}, writer_token,
                                         metrics={"epoch": epoch, "empty": True},
                                         num_partitions=cfg.num_partitions)
        return manifest, {"epoch": epoch, "events_in": 0, "delivered": 0}

    # EARLY zombie-writer fence (W5): the pre-clean below and the message
    # writes are destructive; a stale writer re-attempting an epoch a newer
    # writer already committed must fail BEFORE deleting committed output
    # (commit_epoch re-checks at publish time)
    newest = Manifest.latest(out_dir).epoch
    if newest >= epoch:
        raise RuntimeError(
            f"epoch fencing: epoch {newest} already committed (attempted {epoch}); "
            "refusing to overwrite committed delivery output"
        )
    # pre-clean THIS epoch's output: a crashed earlier attempt may have
    # covered a different chunk batch and written (topic, part) files this
    # attempt won't rewrite — once the epoch commits, readers glob by epoch
    # number and a stale file would deliver phantom duplicates
    import shutil as _sh

    for ext in (".jsonl", ".jsonl.gz"):
        for f in glob.glob(os.path.join(out_dir, TOPICS_DIR, "*", "part=*",
                                        f"epoch={epoch:06d}{ext}")):
            os.remove(f)
    _sh.rmtree(os.path.join(out_dir, DLQ_DIR, f"epoch={epoch:06d}"), ignore_errors=True)

    ctx = ProduceContext(out_dir=out_dir, epoch=epoch,
                         prev_partitions=manifest.partitions, cfg=cfg)

    def produce_group(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return PRODUCE_STATS_SCHEMA.empty_table()
        part = group["part"][0].as_py()
        return produce_partition(ctx, group, part)

    with _epoch_execution_context():
        ds = read_chunks(chunk_files, override_num_blocks=cfg.capture_parallelism)
        stage = CapturePartitionStage(cfg, combine=False, project_for_sink=False)
        ds = ds.map_batches(stage, batch_format="pyarrow", batch_size=batch_size,
                            zero_copy_batch=True)
        stats_rows = (
            ds.groupby("part", num_partitions=cfg.num_partitions)
            .map_groups(produce_group, batch_format="pyarrow")
            .take_all()
        )

    part_updates = {
        str(r["part"]): {"path": None, "deltas": [], "rows": r["delivered"],
                         "watermark": r["watermark"], "sha": r["sha"]}
        for r in stats_rows
    }
    agg = {
        "epoch": epoch,
        "events_in": int(sum(r["events_in"] for r in stats_rows)),
        "events_below_watermark": int(sum(r["events_below_watermark"] for r in stats_rows)),
        "delivered": int(sum(r["delivered"] for r in stats_rows)),
        "oversized": int(sum(r["oversized"] for r in stats_rows)),
        "bytes": int(sum(r["bytes"] for r in stats_rows)),
    }
    manifest = manifest.commit_epoch(epoch, chunk_files, part_updates, writer_token,
                                     metrics=agg, num_partitions=cfg.num_partitions)
    return manifest, agg


def produce(
    stream_dir: str,
    out_dir: str,
    cfg: CaptureConfig,
    chunks_per_epoch: int = 8,
    resume: bool = True,
    max_epochs: int | None = None,
) -> dict[str, Any]:
    """Deliver a change stream to topic files, resumably (the chunk ledger
    and watermarks make a re-run after any crash converge to byte-identical
    committed output)."""
    manifest = Manifest.latest(out_dir) if resume else Manifest(lake_dir=out_dir)
    token = new_writer_token()
    pending = pending_chunks(stream_dir, manifest.chunks_consumed)
    total: dict[str, Any] = {"epochs": 0, "events_in": 0, "delivered": 0, "oversized": 0}
    for batch in epoch_batches(pending, chunks_per_epoch):
        if max_epochs is not None and total["epochs"] >= max_epochs:
            break
        manifest, agg = produce_epoch(
            cfg, manifest, manifest.epoch + 1, batch, out_dir, token
        )
        total["epochs"] += 1
        for k in ("events_in", "delivered", "oversized"):
            total[k] += int(agg.get(k, 0))
    return total


def tail_produce(
    stream_dir: str,
    out_dir: str,
    cfg: CaptureConfig,
    chunks_per_epoch: int = 8,
    poll_interval: float = 1.0,
    max_idle_cycles: int = 3,
    max_epochs: int | None = None,
    config_provider=None,
) -> dict[str, Any]:
    """Continuous delivery: follow a growing chunk directory, committing one
    delivery transaction per epoch as chunks appear — the produce-side twin
    of ``replay.tail``, sharing the SAME worker loop
    (`sources/stream.py:follow_stream` — W4 pacing, T1 config refresh)."""
    from ..sources.stream import follow_stream

    manifest = Manifest.latest(out_dir)
    token = new_writer_token()
    total: dict[str, Any] = {"epochs": 0, "events_in": 0, "delivered": 0, "oversized": 0}

    def step(step_cfg: CaptureConfig, m: Manifest, batch: list[str]) -> Manifest:
        m, agg = produce_epoch(step_cfg, m, m.epoch + 1, batch, out_dir, token)
        for k in ("events_in", "delivered", "oversized"):
            total[k] += int(agg.get(k, 0))
        return m

    _, n = follow_stream(
        stream_dir, manifest, step, cfg=cfg, chunks_per_epoch=chunks_per_epoch,
        poll_interval=poll_interval, max_idle_cycles=max_idle_cycles,
        max_epochs=max_epochs, config_provider=config_provider,
    )
    total["epochs"] = n
    return total


def read_topic(out_dir: str, topic: str, schema: pa.Schema | None = None) -> rd.Dataset:
    """Messages of one topic as a Dataset (key, value strings) — committed
    epochs only, the consumer-side half of exactly-once.

    ``schema`` (optional) pins the JSON parse to an explicit Arrow schema.
    Without it pyarrow infers per parse block, and a block where an
    evolution-added column is all-null infers ``null`` where the next block
    infers ``int64`` — the reader then fails to unify. Schema-aware callers
    (``materialize_topic``) always pass one; unknown message fields (e.g.
    CloudEvents headers) are ignored under an explicit schema."""
    import pyarrow.json as pa_json

    committed = Manifest.latest(out_dir).epoch
    plain, gz = [], []
    for d in sorted(glob.glob(os.path.join(out_dir, TOPICS_DIR, topic, "part=*"))):
        for e, f in _epoch_files(d):
            if e <= committed and os.path.getsize(f):
                (gz if f.endswith(".gz") else plain).append(f)
    kwargs: dict[str, Any] = {}
    if schema is not None:
        kwargs["parse_options"] = pa_json.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="ignore"
        )
    parts = []
    if plain:
        parts.append(rd.read_json(plain, file_extensions=["jsonl"], **kwargs))
    if gz:
        parts.append(rd.read_json(gz, file_extensions=["gz"],
                                  arrow_open_stream_args={"compression": "gzip"},
                                  **kwargs))
    if not parts:
        return rd.from_items([])
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def topic_messages(out_dir: str, topic: str) -> list[dict]:
    """Small-scale helper for tests: every committed message of a topic in
    (partition, id) order as parsed dicts."""
    import json

    committed = Manifest.latest(out_dir).epoch
    out = []
    for d in sorted(glob.glob(os.path.join(out_dir, TOPICS_DIR, topic, "part=*"))):
        part = int(os.path.basename(d).split("=")[1])
        for e, f in _epoch_files(d):
            if e > committed:
                continue
            for line in _message_lines(f):
                if line.strip():
                    m = json.loads(line)
                    m["_part"] = part
                    out.append(m)
    return out


# ---------------------------------------------------------------------------
# consumer groups: resumable consumption with committed offsets
# ---------------------------------------------------------------------------

CONSUMERS_DIR = "_consumers"


def _group_state_path(out_dir: str, topic: str, group: str) -> str:
    if not group or any(c in group for c in "/\\\x00"):
        raise ValueError(f"invalid consumer group name {group!r}")
    return os.path.join(out_dir, CONSUMERS_DIR, f"{topic}__{group}.json")


def group_offsets(out_dir: str, topic: str, group: str) -> dict[int, int]:
    """The group's committed per-partition offsets (messages consumed so
    far); empty for a new group."""
    import json

    path = _group_state_path(out_dir, topic, group)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        doc = json.load(fh)
    return {int(k): int(v) for k, v in doc.get("offsets", {}).items()}


def consume_topic(
    out_dir: str,
    topic: str,
    group: str,
    max_messages: int | None = None,
    commit: bool = True,
) -> list[dict]:
    """Consumer-group read: messages of ``topic`` BEYOND the group's
    committed offsets, in (partition, id) order — the Kafka consumer-group
    analog over the committed message files.

    Offsets are per-partition message COUNTS, valid because committed
    epochs are immutable and files append in epoch order; only
    manifest-committed epochs are visible (uncommitted staged files never
    reach a consumer). ``commit=True`` commits the new offsets atomically
    (tmp + fsync + rename) AFTER the messages have been materialized —
    at-least-once on a crash between read and commit, which is exactly
    Kafka's auto-commit contract; pass ``commit=False`` and call
    :func:`commit_offsets` yourself for consumer-controlled semantics.

    Concurrency contract: ONE active consumer per group (the offset commit
    is last-rename-wins, not a CAS) — Kafka enforces this with the group
    coordinator's partition assignment; here it is the caller's deployment
    invariant, same as the engine's single-writer lease on the produce
    side."""
    committed = Manifest.latest(out_dir).epoch
    start = group_offsets(out_dir, topic, group)
    import json

    new_offsets = dict(start)
    out: list[dict] = []
    for d in sorted(glob.glob(os.path.join(out_dir, TOPICS_DIR, topic, "part=*"))):
        part = int(os.path.basename(d).split("=")[1])
        seen = 0
        skip = start.get(part, 0)
        for e, f in _epoch_files(d):
            if e > committed:
                continue
            for line in _message_lines(f):
                if not line.strip():
                    continue
                seen += 1
                if seen <= skip:
                    continue
                if max_messages is not None and len(out) >= max_messages:
                    break
                m = json.loads(line)
                m["_part"] = part
                out.append(m)
                new_offsets[part] = seen
            if max_messages is not None and len(out) >= max_messages:
                break
        if max_messages is not None and len(out) >= max_messages:
            break
    if commit and out:
        commit_offsets(out_dir, topic, group, new_offsets)
    return out


def list_groups(out_dir: str) -> list[dict]:
    """``kafka#groups`` analog (`config/routes.rb:29`,
    `app/controllers/kafka_controller.rb`): every consumer group that has
    committed offsets, with its topic — pure directory listing of the
    committed group-state files."""
    import json

    out = []
    d = os.path.join(out_dir, CONSUMERS_DIR)
    if not os.path.isdir(d):
        return out
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(d, f)) as fh:
            doc = json.load(fh)
        out.append({"group": doc.get("group"), "topic": doc.get("topic")})
    return out


def log_end_offsets(out_dir: str, topic: str) -> dict[int, int]:
    """Committed message count per partition of ``topic`` — the log-end
    offset a consumer chases. Counts lines of manifest-committed epoch
    files only (staged/uncommitted epochs are invisible to consumers, same
    rule as :func:`consume_topic`). O(messages of the topic): an
    introspection/maintenance verb, not a hot-path call."""
    committed = Manifest.latest(out_dir).epoch
    ends: dict[int, int] = {}
    for d in sorted(glob.glob(os.path.join(out_dir, TOPICS_DIR, topic, "part=*"))):
        part = int(os.path.basename(d).split("=")[1])
        n = 0
        for e, f in _epoch_files(d):
            if e > committed:
                continue
            n += sum(1 for line in _message_lines(f) if line.strip())
        ends[part] = n
    return ends


def describe_group(out_dir: str, group: str) -> dict:
    """``kafka#describe_group`` analog (`config/routes.rb:30`): the group's
    per-(topic, partition) committed offset, log-end offset and lag —
    Kafka's ``kafka-consumer-groups --describe`` shape."""
    rows = []
    for g in list_groups(out_dir):
        if g["group"] != group:
            continue
        topic = g["topic"]
        committed = group_offsets(out_dir, topic, group)
        ends = log_end_offsets(out_dir, topic)
        for part in sorted(ends):
            off = committed.get(part, 0)
            rows.append(
                {
                    "topic": topic,
                    "partition": part,
                    "committed_offset": off,
                    "log_end_offset": ends[part],
                    "lag": ends[part] - off,
                }
            )
    if not rows:
        raise KeyError(f"no committed offsets for consumer group {group!r}")
    return {
        "group": group,
        "partitions": rows,
        "total_lag": sum(r["lag"] for r in rows),
    }


def commit_offsets(out_dir: str, topic: str, group: str, offsets: dict[int, int]) -> None:
    """Atomically persist the group's offsets (tmp + fsync + rename, the
    manifest durability contract)."""
    import json

    path = _group_state_path(out_dir, topic, group)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    doc = {"topic": topic, "group": group,
           "offsets": {str(k): int(v) for k, v in sorted(offsets.items())}}
    _atomic_write_text(json.dumps(doc, indent=1).encode(), path)


# ---------------------------------------------------------------------------
# consumer-side state rebuild: the downstream half of the reference contract
# ---------------------------------------------------------------------------


def message_parse_schema(cfg: CaptureConfig) -> pa.Schema:
    """Explicit Arrow schema for parsing delivered message JSONL: the
    envelope layout of ``render_message_json`` with ``new``/``old`` as the
    latest-version payload struct. Pinning it makes the parse deterministic
    (inference would type an all-null evolution column per block)."""
    from ..events import arrow_type

    payload = pa.struct(
        [(f, arrow_type(t)) for f, t in cfg.latest_version().payload_fields.items()]
    )
    value = pa.struct(
        [("id", pa.int64()), ("schema", pa.string()), ("tablename", pa.string()),
         ("operation", pa.string()), ("dbuser", pa.string()),
         ("timestamp", pa.string()), ("transaction_id", pa.string()),
         ("new", payload), ("old", payload)]
    )
    return pa.schema([("key", pa.string()), ("value", value)])


class _MessageFlattenStage:
    """Per-batch flatten of parsed topic messages into flat event columns.

    ``read_topic`` hands back the JSONL messages already decoded into Arrow
    structs (Ray's ``read_json`` → pyarrow's C++ JSON parser), so the whole
    stage is ``pc.struct_field`` gathers + one ``if_else`` per PK column —
    no per-row parse anywhere. Emits a FIXED schema regardless of which
    envelope fields a given file happened to contain (a file holding only
    DELETEs has no ``new`` struct at all), which also normalizes the
    heterogeneous per-file schemas JSON inference produces.

    Stateful-stage shape: the config-derived constants (payload field →
    type map, per-table PK lists, the op-name dictionary) are built once in
    ``__init__`` per actor, not per batch.
    """

    def __init__(self, cfg: CaptureConfig):
        from ..events import arrow_type

        self.payload_fields = {
            f: arrow_type(t) for f, t in cfg.latest_version().payload_fields.items()
        }
        # one PK list per qualified table name — a topic may legally carry
        # several captured tables (schema-level topic fallback, M11)
        self.pk_by_table = {
            f"{t.schema_name}.{t.name}": list(t.pk_columns) for t in cfg.tables
        }
        self.ops_long = pa.array(["INSERT", "UPDATE", "DELETE", "INIT"], pa.string())
        self.ops_short = pa.array(["I", "U", "D", "i"], pa.string())
        self.out_schema = pa.schema(
            [("key_string", pa.string()), ("id", pa.int64()), ("op", pa.string())]
            + [(f, typ) for f, typ in self.payload_fields.items()]
        )

    @staticmethod
    def _child(struct: pa.Array | None, name: str, n: int) -> pa.Array | None:
        if struct is None or struct.type.get_field_index(name) == -1:
            return None
        return pc.struct_field(struct, name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.capture import KEY_SEP

        n = len(batch)
        if n == 0 or "value" not in batch.column_names:
            return self.out_schema.empty_table()
        value = batch["value"]
        if isinstance(value, pa.ChunkedArray):
            value = value.combine_chunks()
        new = self._child(value, "new", n)
        old = self._child(value, "old", n)

        op_long = pc.struct_field(value, "operation")
        op = self.ops_short.take(pc.index_in(op_long, value_set=self.ops_long))
        is_del = pc.equal(op, "D")

        def image(img: pa.Array | None, name: str, typ: pa.DataType) -> pa.Array:
            child = self._child(img, name, n)
            if child is None:
                return pa.nulls(n, typ)
            return child.cast(typ)

        prefix = pc.binary_join_element_wise(
            pc.struct_field(value, "schema"), pc.struct_field(value, "tablename"), "."
        )
        # PK columns resolve old-vs-new per op exactly like derive_keys; the
        # PK list can differ per table, so resolve it per distinct prefix
        pk_lists = {KEY_SEP.join(pks) for pks in self.pk_by_table.values()}
        if len(pk_lists) != 1:
            key = pa.nulls(n, pa.string())
            for qual, pks in self.pk_by_table.items():
                mask = pc.equal(prefix, qual)
                parts = [prefix] + [
                    pc.if_else(is_del, image(old, c, pa.string()), image(new, c, pa.string()))
                    for c in pks
                ]
                key = pc.if_else(mask, pc.binary_join_element_wise(*parts, KEY_SEP), key)
        else:
            pks = next(iter(self.pk_by_table.values()))
            parts = [prefix] + [
                pc.if_else(is_del, image(old, c, pa.string()), image(new, c, pa.string()))
                for c in pks
            ]
            key = pc.binary_join_element_wise(*parts, KEY_SEP)

        cols: dict[str, pa.Array] = {
            "key_string": key,
            "id": pc.struct_field(value, "id").cast(pa.int64()),
            "op": op,
        }
        for f, typ in self.payload_fields.items():
            cols[f] = image(new, f, typ)
        return pa.table(cols, schema=self.out_schema)


def materialize_topic(
    out_dir: str, topic: str, cfg: CaptureConfig, num_partitions: int | None = None
) -> rd.Dataset:
    """Rebuild converged table state from a topic's DELIVERED messages — the
    downstream-consumer half of the reference's contract (its consumers fold
    the Kafka feed into their own stores, `doc/movex-cdc.adoc:727-741`): the
    message stream alone must be a complete, sufficient changelog.

    Distributed shape (identical invariants to the lake merge): read the
    committed message files (`read_topic` — uncommitted epochs invisible,
    so the fold inherits exactly-once), ONE vectorized flatten per batch
    (:class:`_MessageFlattenStage`), the within-batch last-per-key combiner,
    ONE key-hash shuffle, and a per-partition arg-max-by-id winner fold with
    DELETE winners dropping as tombstones. Per-key ascending-id delivery
    order is NOT assumed — the fold is order-free (associative arg-max), so
    it tolerates any interleaving of partition files.

    Returns live rows: every latest-schema payload column plus ``_key`` /
    ``_last_id`` / ``_last_op`` — the same surface :func:`read_lake` gives,
    which makes "consumer state == lake state" a direct frame equality
    (asserted in tests/test_produce.py and the ``cdc_consumer_state``
    driver query, whose DuckDB oracle re-derives the state from the raw
    binlog chunks instead — end-to-end independence).
    """
    from ..stages.partitioning import assign_partitions, combine_last_per_key

    P = int(num_partitions or getattr(cfg, "num_partitions", 8) or 8)
    ds = read_topic(out_dir, topic, schema=message_parse_schema(cfg))
    if ds.count() == 0:
        stage = _MessageFlattenStage(cfg)
        return rd.from_arrow(stage.out_schema.empty_table())

    flat = (
        ds.map_batches(_MessageFlattenStage, fn_constructor_args=(cfg,),
                       batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(combine_last_per_key, batch_format="pyarrow")
        .map_batches(lambda b: assign_partitions(b, P), batch_format="pyarrow")
    )

    def fold(group: pa.Table) -> pa.Table:
        group = combine_last_per_key(group)
        live = group.filter(pc.not_equal(group["op"], "D"))
        live = live.rename_columns(
            ["_key", "_last_id", "_last_op"] + live.column_names[3:]
        )
        return live.drop_columns(["part"])

    return flat.groupby("part").map_groups(fold, batch_format="pyarrow")
