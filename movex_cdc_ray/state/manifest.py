"""Per-partition lineage manifests — the exactly-once commit protocol.

The reference gets exactly-once by bracketing {read FOR UPDATE → Kafka
transaction commit → DELETE of shipped events} in one DB transaction
(`app/models/transfer_thread.rb:69-78`, `:451-465`; Kafka txn
`app/models/kafka_java.rb:40-103`). Ray task retries are at-least-once, so the
equivalent here is (SURVEY.md §7.5 item 1):

  1. idempotent staged writes — every (epoch, partition) output goes to the
     SAME deterministic path, fully overwritten on retry;
  2. an atomic manifest commit (tmp file + ``os.replace``) per epoch acting as
     the transaction barrier: an epoch either appears in a manifest with all
     its partitions, or not at all;
  3. epoch fencing — a committing writer verifies no higher epoch exists
     (the analog of Kafka transactional-id producer fencing,
     `kafka_java.rb:134-143`).

A manifest carries the FULL partition map (entries for untouched partitions
carried forward), per-partition ``watermark`` (highest applied event id — the
reference's per-worker ``@max_event_logs_id``, `transfer_thread.rb:39-47`,
operator T2) and the consumed-chunk ledger (the analog of dropping consumed
``EVENT_LOGS`` partitions, operator S6/O16).
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"


def staged_path(lake_dir: str, epoch: int, part: int) -> str:
    return os.path.join(lake_dir, STAGING_DIR, f"epoch={epoch:06d}", f"part={part:05d}.parquet")


def _fsync_dir(path: str) -> None:
    """fsync the parent directory so the rename itself is durable — without
    it a power loss can roll back the os.replace even though the file's
    contents were synced."""
    fd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def atomic_write_parquet(t, path: str, compression: str = "snappy") -> int:
    """tmp-file + fsync + os.replace + dir-fsync parquet write — a crash or
    power loss mid-write can never leave a truncated file behind (every
    ledger/lake/staging write goes through this; a torn retry file would
    wedge resume on pq.read_metadata forever). The data fsync matters
    because the manifest commit is durable: a synced manifest must never
    reference staged pages still sitting in the page cache.

    ``compression`` (CaptureConfig.lake_compression for lake writes) picks
    the codec — zstd roughly halves lake bytes at 100 TB for some write
    CPU; digests hash VALUES, so the codec never affects determinism. A
    config field, not an env var: merge tasks run in Ray WORKERS, which do
    not inherit driver env mutations."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(t, tmp, row_group_size=128 * 1024, compression=compression)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    _fsync_dir(path)
    return os.path.getsize(path)


def atomic_write_json(path: str, doc: dict[str, Any]) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path)


@dataclass
class Manifest:
    """State of the lake after a committed epoch."""

    lake_dir: str
    epoch: int = 0
    # part (str) -> {"path": str, "rows": int, "watermark": int, "sha": str}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    chunks_consumed: int = 0  # ordinal count of stream chunks applied
    chunk_files: list[str] = field(default_factory=list)  # this epoch's chunks
    writer_token: str = ""
    metrics: dict[str, Any] = field(default_factory=dict)
    # partitioning identity: resuming with a different P (or hash scheme)
    # would re-key the hash slices and split keys across partitions — the
    # commit protocol records it and run_epoch refuses a mismatch (0 = unset)
    num_partitions: int = 0
    hash_scheme: str = "pd_hash_v1"

    # ------------------------------------------------------------------ load
    @classmethod
    def _from_doc(cls, lake_dir: str, d: dict) -> "Manifest":
        """ONE manifest-JSON decoder (latest / at_epoch must never diverge —
        a field added to only one of them would silently default on the
        other path)."""
        return cls(
            lake_dir=lake_dir,
            epoch=d["epoch"],
            partitions=d["partitions"],
            chunks_consumed=d["chunks_consumed"],
            chunk_files=d.get("chunk_files", []),
            writer_token=d.get("writer_token", ""),
            metrics=d.get("metrics", {}),
            num_partitions=d.get("num_partitions", 0),
            hash_scheme=d.get("hash_scheme", "pd_hash_v1"),
        )

    @classmethod
    def latest(cls, lake_dir: str) -> "Manifest":
        """Resume point: highest committed epoch (or an empty epoch-0 state)."""
        paths = sorted(glob.glob(os.path.join(lake_dir, MANIFEST_DIR, "epoch-*.json")))
        if not paths:
            return cls(lake_dir=lake_dir)
        with open(paths[-1]) as f:
            d = json.load(f)
        return cls._from_doc(lake_dir, d)

    @classmethod
    def at_epoch(cls, lake_dir: str, epoch: int) -> "Manifest":
        """Time-travel load: the lake state as of a specific committed epoch.
        Raises ``KeyError`` with the retained window if that manifest was
        housekept away (``gc(keep_epochs=K)`` keeps the last K epochs AND
        their data files)."""
        p = os.path.join(lake_dir, MANIFEST_DIR, f"epoch-{epoch:06d}.json")
        if not os.path.exists(p):
            have = sorted(
                int(os.path.basename(x)[len("epoch-"):-len(".json")])
                for x in glob.glob(os.path.join(lake_dir, MANIFEST_DIR, "epoch-*.json"))
            )
            raise KeyError(
                f"no manifest for epoch {epoch} (retained: {have}); raise the "
                "gc keep_epochs window or replay with gc_staging=False for "
                "unbounded time travel"
            )
        with open(p) as f:
            d = json.load(f)
        return cls._from_doc(lake_dir, d)

    def check_partitioning(self, num_partitions: int, hash_scheme: str = "pd_hash_v1") -> None:
        """Refuse to write with a partitioning incompatible with the lake's.

        Existing rows live in bases keyed by the committed (P, hash scheme);
        merging new events under a different one would route the same key to
        a different partition — duplicate keys and broken watermark dedup.
        Changing P requires a full re-partition (read lake → re-hash →
        rewrite bases), not a config edit."""
        if self.num_partitions and self.num_partitions != num_partitions:
            raise RuntimeError(
                f"partitioning mismatch: lake committed with num_partitions="
                f"{self.num_partitions}, config says {num_partitions}; "
                "re-partition the lake before changing P"
            )
        if self.num_partitions and self.hash_scheme != hash_scheme:
            raise RuntimeError(
                f"hash scheme mismatch: lake uses {self.hash_scheme!r}, "
                f"config says {hash_scheme!r}"
            )

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.lake_dir, MANIFEST_DIR, f"epoch-{epoch:06d}.json")

    # ---------------------------------------------------------------- commit
    def commit_epoch(
        self,
        epoch: int,
        chunk_files: list[str],
        part_updates: dict[str, dict[str, Any]],
        writer_token: str,
        metrics: dict[str, Any] | None = None,
        num_partitions: int | None = None,
    ) -> "Manifest":
        """Atomically publish an epoch. Raises if a newer epoch already exists
        (zombie-writer fencing, W5)."""
        existing = sorted(glob.glob(os.path.join(self.lake_dir, MANIFEST_DIR, "epoch-*.json")))
        if existing:
            newest = int(os.path.basename(existing[-1])[len("epoch-") : -len(".json")])
            if newest >= epoch:
                raise RuntimeError(
                    f"epoch fencing: epoch {newest} already committed (attempted {epoch})"
                )
        new_parts = dict(self.partitions)
        new_parts.update(part_updates)
        np_out = num_partitions if num_partitions is not None else self.num_partitions
        doc = {
            "epoch": epoch,
            "partitions": new_parts,
            "chunks_consumed": self.chunks_consumed + len(chunk_files),
            "chunk_files": chunk_files,
            "writer_token": writer_token,
            "metrics": metrics or {},
            "num_partitions": np_out,
            "hash_scheme": self.hash_scheme,
        }
        atomic_write_json(self.manifest_path(epoch), doc)
        return Manifest(
            lake_dir=self.lake_dir,
            epoch=epoch,
            partitions=new_parts,
            chunks_consumed=doc["chunks_consumed"],
            chunk_files=chunk_files,
            writer_token=writer_token,
            metrics=doc["metrics"],
            num_partitions=np_out,
            hash_scheme=self.hash_scheme,
        )

    # ------------------------------------------------------------------- gc
    def gc(self, keep_epochs: int = 2) -> list[str]:
        """Drop manifests beyond ``keep_epochs`` and staged files no RETAINED
        manifest references — the Housekeeping partition drop (reference
        `app/models/housekeeping.rb:45-107`, operator S6). Because every
        retained manifest keeps its data files alive, ``keep_epochs`` is also
        the time-travel window for ``read_lake(at_epoch=...)``."""
        removed: list[str] = []
        manifests = sorted(glob.glob(os.path.join(self.lake_dir, MANIFEST_DIR, "epoch-*.json")))
        for m in manifests[:-keep_epochs] if keep_epochs else manifests:
            os.remove(m)
            removed.append(m)
        live = {os.path.abspath(f) for f in self.data_files()}
        for m in manifests[-keep_epochs:] if keep_epochs else []:
            if os.path.exists(m):
                with open(m) as f:
                    d = json.load(f)
                for p in d.get("partitions", {}).values():
                    if p.get("path"):
                        live.add(os.path.abspath(p["path"]))
                    live.update(os.path.abspath(x) for x in p.get("deltas", []))
        for f in glob.glob(os.path.join(self.lake_dir, STAGING_DIR, "epoch=*", "part=*.parquet")):
            if os.path.abspath(f) not in live:
                os.remove(f)
                removed.append(f)
        for d in glob.glob(os.path.join(self.lake_dir, STAGING_DIR, "epoch=*")):
            if not os.listdir(d):
                os.rmdir(d)
        return removed

    # --------------------------------------------------------------- queries
    def watermark(self, part: int) -> int:
        p = self.partitions.get(str(part))
        return p["watermark"] if p else -1

    def data_files(self) -> list[str]:
        out: list[str] = []
        for k in sorted(self.partitions, key=int):
            p = self.partitions[k]
            if p.get("path"):
                out.append(p["path"])
            out.extend(p.get("deltas", []))
        return out

    def total_rows(self) -> int:
        return sum(p["rows"] for p in self.partitions.values())


def new_writer_token() -> str:
    return uuid.uuid4().hex
