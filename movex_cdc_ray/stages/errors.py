"""Error isolation, retry ledger, quarantine, reprocess (SURVEY.md §2.11, W3).

Divide & conquer: the reference tries a whole batch in one Kafka transaction
and, on failure, splits it into ~10 slices recursively until the single
failing event is isolated (`app/models/transfer_thread.rb:143-178`
process_event_logs_divide_and_conquer; single-event handling `:468-491`).
Here the same algorithm wraps the per-partition merge apply.

Retry flow: an isolated bad event gets ``retry_count + 1`` and is retried in a
later epoch with exponential backoff (reference `:361` ``POWER(3, Retry_Count
- 1)`` — epoch-based here); after ``error_max_retries`` it moves to the
final-errors quarantine dataset (``EVENT_LOG_FINAL_ERRORS`` analog,
`db/migrate/20201013000000_create_event_log_final_errors.rb`).
``reprocess_final_errors`` copies quarantined events back into the pending
stream (reference `app/controllers/server_control_controller.rb:101-160`).
"""

from __future__ import annotations

import glob
import os
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.manifest import atomic_write_parquet

RETRY_DIR = "_retry"
FINAL_ERRORS_DIR = "_final_errors"
D_AND_C_FANOUT = 10  # the reference's ~10-slice split
_ERROR_TIME_US = 0  # deterministic stand-in for wall-clock error_time


def divide_and_conquer(
    events: pa.Table,
    apply_fn: Callable[[pa.Table], None],
    max_single_checks: int = 1_000_000,
) -> tuple[pa.Table, pa.Table, int]:
    """Apply ``apply_fn`` to ``events``; isolate rows that make it raise.

    Returns ``(ok_events, bad_events_with_error_msg, extra_attempts)`` where
    ``extra_attempts`` counts the additional apply calls caused by splitting
    (the reference's ``events_d_and_c_retries`` statistic,
    `transfer_thread.rb:145-147`). ``apply_fn`` must be side-effect-free on
    failure (validation only) — the real write happens after isolation.

    ``max_single_checks`` bounds the pathological everything-fails case:
    once that many single-row probes have run, remaining failing slices are
    quarantined wholesale (error_msg from the slice-level failure) instead
    of probed row by row.
    """
    ok_parts: list[pa.Table] = []
    bad_parts: list[pa.Table] = []
    attempts = 0
    single_checks = 0

    def quarantine(t: pa.Table, exc: Exception) -> None:
        bad_parts.append(
            t.append_column("error_msg", pa.array([str(exc)[:4000]] * len(t), pa.string()))
        )

    def recurse(t: pa.Table) -> None:
        nonlocal attempts, single_checks
        if len(t) == 0:
            return
        if len(t) == 1:
            single_checks += 1
        try:
            apply_fn(t)
            ok_parts.append(t)
            return
        except Exception as exc:  # noqa: BLE001 - any failure splits
            if len(t) == 1 or single_checks >= max_single_checks:
                quarantine(t, exc)
                return
            attempts += 1
            k = min(D_AND_C_FANOUT, len(t))
            step = (len(t) + k - 1) // k
            for off in range(0, len(t), step):
                recurse(t.slice(off, step))

    recurse(events)
    ok = pa.concat_tables(ok_parts) if ok_parts else events.schema.empty_table()
    if bad_parts:
        bad = pa.concat_tables(bad_parts)
    else:
        bad_schema = pa.schema(list(events.schema) + [pa.field("error_msg", pa.string())])
        bad = bad_schema.empty_table()
    return ok, bad, attempts


def retry_path(lake_dir: str, epoch: int, part: int) -> str:
    return os.path.join(lake_dir, RETRY_DIR, f"epoch={epoch:06d}", f"part={part:05d}.parquet")


def write_bad_events(
    bad: pa.Table, lake_dir: str, epoch: int, part: int, error_max_retries: int
) -> tuple[int, int]:
    """Route isolated bad events: retry ledger or final-errors quarantine.

    Idempotent (deterministic paths, full overwrite) so epoch retries are
    safe. Returns (n_retry, n_final)."""
    if len(bad) == 0:
        return 0, 0
    rc = bad["retry_count"]
    if isinstance(rc, pa.ChunkedArray):
        rc = rc.combine_chunks()
    rc = pc.fill_null(rc, 0)
    bumped = pc.add(rc, 1)
    i = bad.column_names.index("retry_count")
    bad = bad.set_column(i, "retry_count", bumped.cast(pa.int32()))
    bad = bad.append_column("error_time", pa.array([_ERROR_TIME_US] * len(bad), pa.timestamp("us")))

    final_mask = pc.greater(bumped, error_max_retries)
    finals = bad.filter(final_mask)
    retries = bad.filter(pc.invert(final_mask))
    if len(retries):
        atomic_write_parquet(retries, retry_path(lake_dir, epoch, part))
    if len(finals):
        p = os.path.join(lake_dir, FINAL_ERRORS_DIR, f"epoch={epoch:06d}", f"part={part:05d}.parquet")
        atomic_write_parquet(finals, p)
    return len(retries), len(finals)


def pending_retry_files(lake_dir: str, before_epoch: int, backoff_epochs: int = 1) -> list[str]:
    """Retry files eligible for re-processing in ``before_epoch``.

    Epoch-based exponential backoff: an event failed at epoch E with
    retry_count r becomes eligible at epoch E + backoff_epochs * 3^(r-1)
    (the reference's 20 s * 3^(r-1), `transfer_thread.rb:361`). Eligibility is
    checked per file against the file's epoch and min retry_count."""
    out = []
    for f in sorted(glob.glob(os.path.join(lake_dir, RETRY_DIR, "epoch=*", "part=*.parquet"))):
        e = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        # smallest retry_count in file decides the earliest eligibility
        t = pq.read_table(f, columns=["retry_count"])
        rmin = pc.min(t["retry_count"]).as_py() or 1
        if e + backoff_epochs * 3 ** max(rmin - 1, 0) <= before_epoch:
            out.append(f)
    return out


def consume_retry_files(files: list[str]) -> None:
    for f in files:
        os.remove(f)


def final_error_files(lake_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(lake_dir, FINAL_ERRORS_DIR, "epoch=*", "part=*.parquet")))


def reprocess_final_errors(lake_dir: str, epoch: int) -> int:
    """Move final-error events back into the retry ledger so the next epoch
    re-applies them (reference POST /server_control/reprocess_final_errors,
    which restarts the retry cycle).

    retry_count re-enters at 1, not 0: the partition watermark has long
    advanced past these events' ids, and only retry_count > 0 events bypass
    the watermark (they are then per-key stale-checked against the base's
    ``_last_id``). A 0 here would make every reprocessed event a silent
    below-watermark drop — permanent loss dressed as success."""
    n = 0
    for f in final_error_files(lake_dir):
        t = pq.read_table(f)
        t = t.drop_columns(["error_time", "error_msg"])
        i = t.column_names.index("retry_count")
        t = t.set_column(i, "retry_count", pa.array([1] * len(t), pa.int32()))
        n += len(t)  # count the MOVED events only, not pre-existing retries
        part = int(os.path.basename(f).split("=")[1].split(".")[0])
        p = retry_path(lake_dir, epoch, part)
        if os.path.exists(p):
            # pre-existing retry files may still carry error_time/error_msg
            # (write_bad_events schema) — unify on the event columns
            prev = pq.read_table(p)
            keep = [c for c in prev.column_names if c in t.column_names]
            t = pa.concat_tables([prev.select(keep), t.select(keep)])
        atomic_write_parquet(t, p)
        os.remove(f)
    return n


def housekeeping_final_errors(lake_dir: str, keep_epochs: int, current_epoch: int) -> int:
    """Drop final-error partitions older than the retention window
    (reference `app/models/housekeeping_final_errors.rb:26-80`)."""
    removed = 0
    for f in final_error_files(lake_dir):
        e = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        if e < current_epoch - keep_epochs:
            os.remove(f)
            removed += 1
    return removed
