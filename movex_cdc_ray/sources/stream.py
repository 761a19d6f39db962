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
    oldest-partition-first scan of `transfer_thread.rb:187-190` (O2)."""
    return sorted(glob.glob(os.path.join(stream_dir, "chunk_*.parquet")))


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
    """
    return rd.read_parquet(files, columns=columns, override_num_blocks=override_num_blocks)


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
