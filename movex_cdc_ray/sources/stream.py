"""Change-stream source: ordered chunk enumeration (operators S1-S3, O2, O3).

The reference polls the interval-partitioned ``EVENT_LOGS`` table
oldest-partition-first with a bounded batch size
(`app/models/transfer_thread.rb:180-222`). Here the stream is a directory of
ordered Parquet chunk files; the manifest's consumed-chunk ledger replaces the
``SELECT FOR UPDATE SKIP LOCKED`` row locking (S4) — each chunk belongs to
exactly one epoch, claimed at commit time.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd


def list_chunks(stream_dir: str) -> list[str]:
    """All chunk files in creation (= lexicographic) order — the
    oldest-partition-first scan of `transfer_thread.rb:187-190` (O2).

    Chunks may be Parquet (the native format) or JSONL (a common binlog
    dump format); ordering is by chunk name regardless of extension.

    Producer contract: a chunk visible under ``chunk_*`` is COMPLETE.
    Producers must publish atomically — write to a temp name that the
    ``chunk_*`` glob cannot see, then ``os.rename`` into place (see
    ``publish_chunk``). A tailer polling mid-copy must never observe a
    truncated file."""
    return sorted(
        glob.glob(os.path.join(stream_dir, "chunk_*.parquet"))
        + glob.glob(os.path.join(stream_dir, "chunk_*.jsonl"))
        + glob.glob(os.path.join(stream_dir, "chunk_*.csv")),
        key=os.path.basename,
    )


def publish_chunk(src: str, stream_dir: str) -> str:
    """Atomically publish a finished chunk file into a live stream dir.

    Copies ``src`` to a dot-prefixed temp name (invisible to ``list_chunks``)
    and renames it into place — the only publish pattern safe against a
    concurrent tailer. Returns the published path."""
    import shutil

    dst = os.path.join(stream_dir, os.path.basename(src))
    tmp = os.path.join(stream_dir, "." + os.path.basename(src) + ".tmp")
    shutil.copy(src, tmp)
    os.rename(tmp, dst)
    return dst


_GC_MARKER = "_chunks_gc"


def chunks_gc_count(stream_dir: str) -> int:
    """How many leading chunks GC physically removed (see gc_consumed_chunks).
    The manifest ledger counts ordinals of the FULL stream history, so the
    current-directory listing must be re-anchored by this offset."""
    try:
        with open(os.path.join(stream_dir, _GC_MARKER)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def pending_chunks(stream_dir: str, chunks_consumed: int) -> list[str]:
    """Chunks not yet covered by a committed manifest (resume point)."""
    return list_chunks(stream_dir)[chunks_consumed - chunks_gc_count(stream_dir):]


def follow_stream(
    stream_dir: str,
    manifest,
    step,
    cfg=None,
    chunks_per_epoch: int = 8,
    poll_interval: float = 1.0,
    max_idle_cycles: int = 3,
    max_epochs: int | None = None,
    config_provider=None,
):
    """ONE steady-state worker loop shared by the lake tailer and the
    delivery tailer (the reference's `transfer_thread.rb:53-99`): adaptive
    idle pacing (W4 — sleep grows toward ``poll_interval × 2^idle`` while
    the queue is empty, capped at 8×, reset on work) and per-epoch config
    refresh (T1 — ``config_provider`` may return a fresh config). Calls
    ``step(cfg, manifest, batch)`` once per epoch and expects the committed
    manifest back; returns ``(manifest, n_epochs)``. Keeping this loop in
    one place means a pacing/resume fix can never apply to only one twin."""
    import time

    idle = 0
    n_epochs = 0
    while idle < max_idle_cycles:
        if config_provider is not None:
            cfg = config_provider() or cfg
        pending = pending_chunks(stream_dir, manifest.chunks_consumed)
        if not pending:
            idle += 1
            time.sleep(min(poll_interval * (2 ** (idle - 1)), poll_interval * 8))
            continue
        idle = 0
        manifest = step(cfg, manifest, pending[:chunks_per_epoch])
        n_epochs += 1
        if max_epochs and n_epochs >= max_epochs:
            break
    return manifest, n_epochs


def epoch_batches(pending: list[str], chunks_per_epoch: int) -> list[list[str]]:
    """Group pending chunks into epochs — the analog of the reference's
    ``max_transaction_size`` bounded read cycle (`config/application.rb:289`,
    O3): one epoch is one exactly-once transaction."""
    return [pending[i : i + chunks_per_epoch] for i in range(0, len(pending), chunks_per_epoch)]


def read_chunks(
    files: list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Read one epoch's chunks as a streaming Dataset.

    Chunk files may straddle a schema-evolution boundary (different payload
    schemas); the capture stage aligns every batch, so the read must not
    unify schemas eagerly — read_parquet handles this via per-file fragments.

    ``override_num_blocks`` pins the block count: Ray's default heuristic
    splits chunks into ~2.5k-row micro-blocks, which multiplies downstream
    per-task overhead and (in file-shuffle mode) delta-file count by blocks ×
    partitions. One block per CPU is the sweet spot.

    JSONL chunks are read with ``read_json`` (row-oriented: no column
    pushdown exists, so pruning happens right after the read) and their
    string timestamps normalized to ``timestamp[us]`` — the rest of the
    pipeline sees the exact Parquet-chunk shape.
    """
    pq_files = [f for f in files if not f.endswith((".jsonl", ".csv"))]
    js_files = [f for f in files if f.endswith(".jsonl")]
    csv_files = [f for f in files if f.endswith(".csv")]
    parts: list[rd.Dataset] = []
    if pq_files:
        parts.append(
            rd.read_parquet(pq_files, columns=columns, override_num_blocks=override_num_blocks)
        )
    if js_files:
        ds = rd.read_json(
            js_files, file_extensions=["jsonl"], override_num_blocks=override_num_blocks
        )
        ds = ds.map_batches(_normalize_json_chunk, batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(columns)
        parts.append(ds)
    if csv_files:
        from pyarrow import csv as pacsv

        # null/empty-string fidelity: the writer quotes every VALID value
        # (QuotingStyle AllValid, see convert_chunks_to_csv), so an
        # UNQUOTED empty field is a null and a QUOTED "" is an empty
        # string — without this contract CSV cannot round-trip a change
        # stream whose payload distinguishes the two
        ds = rd.read_csv(
            csv_files,
            file_extensions=["csv"],
            override_num_blocks=override_num_blocks,
            convert_options=pacsv.ConvertOptions(
                strings_can_be_null=True, quoted_strings_can_be_null=False
            ),
        )
        ds = ds.map_batches(_normalize_json_chunk, batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(columns)
        parts.append(ds)
    if not parts:
        raise ValueError("read_chunks: no chunk files given")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _normalize_json_chunk(batch):
    """Align a JSON-inferred batch to the Parquet chunk shape: ISO timestamp
    strings → timestamp[us] (pyarrow's JSON inference usually does this
    already; the cast is a no-op then)."""
    import pyarrow as pa

    if "created_at" in batch.column_names:
        col = batch["created_at"]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # ISO 8601 strings cast natively (strptime has no %f support)
            col = col.cast(pa.timestamp("us"))
        elif pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        else:
            return batch
        i = batch.column_names.index("created_at")
        batch = batch.set_column(i, "created_at", col)
    return batch


def convert_chunks_to_jsonl(src_dir: str, dst_dir: str) -> list[str]:
    """Re-dump a Parquet chunk stream as JSONL chunks (binlog-dump format
    interop; used by tests to prove format equivalence). Timestamps become
    ISO strings with microseconds; nullable int columns stay ints (pandas
    Int64) so JSON type inference round-trips the schema."""
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    written = []
    for f in sorted(glob.glob(os.path.join(src_dir, "chunk_*.parquet"))):
        t = pq.read_table(f)
        df = t.to_pandas()
        for name, typ in zip(t.schema.names, t.schema.types):
            import pyarrow as pa

            if pa.types.is_integer(typ):
                df[name] = df[name].astype("Int64")
            elif pa.types.is_timestamp(typ):
                df[name] = df[name].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        dst = os.path.join(
            dst_dir, os.path.basename(f).replace(".parquet", ".jsonl")
        )
        df.to_json(dst, orient="records", lines=True)
        written.append(dst)
    return written


def convert_chunks_to_csv(src_dir: str, dst_dir: str) -> list[str]:
    """Re-dump a Parquet chunk stream as CSV chunks (the third common dump
    format). Null/empty-string fidelity via QuotingStyle ``AllValid``:
    every valid value is quoted, nulls stay unquoted-empty — paired with
    the reader's ``quoted_strings_can_be_null=False`` this round-trips a
    payload that distinguishes '' from NULL, which plain pandas
    ``to_csv``/``read_csv`` silently merges. Timestamps become ISO strings
    with microseconds (cast back by ``_normalize_json_chunk``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import csv as pacsv

    os.makedirs(dst_dir, exist_ok=True)
    written = []
    for f in sorted(glob.glob(os.path.join(src_dir, "chunk_*.parquet"))):
        t = pq.read_table(f)
        cols = []
        for name, col in zip(t.schema.names, t.columns):
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us")).cast(pa.string())
            cols.append(col)
        t = pa.table(dict(zip(t.schema.names, cols)))
        dst = os.path.join(dst_dir, os.path.basename(f).replace(".parquet", ".csv"))
        pacsv.write_csv(
            t, dst,
            write_options=pacsv.WriteOptions(quoting_style="all_valid"),
        )
        written.append(dst)
    return written


def gc_consumed_chunks(stream_dir: str, chunks_consumed: int, unlink: bool = False) -> list[str]:
    """Chunk GC once consumed (the reference's partition drop, S6/O16).
    Only deletes when ``unlink`` — test streams are read-only fixtures.

    Deletion is recorded in the ``_chunks_gc`` marker (atomic tmp+replace)
    BEFORE any file is removed: the manifest's consumed-chunk ledger counts
    ordinals of the full stream history, and without the offset a resume
    after GC would slice the already-shrunk listing and silently skip the
    next ``chunks_consumed`` unconsumed chunks."""
    already_gone = chunks_gc_count(stream_dir)
    done = list_chunks(stream_dir)[: chunks_consumed - already_gone]
    if unlink and done:
        marker = os.path.join(stream_dir, _GC_MARKER)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(already_gone + len(done)))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)
        for f in done:
            os.remove(f)
    return done
