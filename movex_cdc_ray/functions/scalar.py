"""Vectorized scalar-function library + the config expression evaluator.

Covers the scalar surface the reference's generated trigger code uses
(SURVEY.md §2.8): quote-escaping REPLACE
(`db_trigger_generator_oracle.rb:895`), TO_CHAR date/timestamp formats
(`:896-908`), RAWTOHEX (`:904`), NULL-safe compare (`:814-819`),
ORA_HASH + MOD partitioning hash (`transfer_thread.rb:240`), exponential
backoff POWER(3, retry-1) (`:361`).

Config-driven predicates / computed columns (operators M3 / M6) are plain
Python expression strings evaluated ONCE PER BATCH with ``eval`` in a
restricted namespace — fully vectorized: ``c('new_content')`` yields the Arrow
array, and ``pc`` / ``np`` kernels operate on whole columns. This is the Ray
analog of the reference compiling config strings into trigger PL/SQL.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# deterministic key hash (ORA_HASH analog)
# ---------------------------------------------------------------------------


def round_half_away(x, digits: int = 6) -> np.ndarray:
    """Decimal rounding that mirrors DuckDB's ``ROUND(DOUBLE, n)`` exactly:
    half-away-from-zero on the scaled double (sign-aware
    ``floor(|x|·10^n + 0.5)``). numpy/Python ``round`` are half-EVEN, which
    diverges whenever a value lands exactly on the boundary — real for
    small-integer ratios, e.g. 9/128 = 0.0703125 rounds to 0.070312
    (half-even) vs DuckDB's 0.070313. Because both sides then evaluate the
    identical float expression, oracle agreement holds at EVERY boundary,
    not just the ones a given sf happens to avoid. ``+ 0.0`` folds -0.0 to
    +0.0 so value hashes can't split on the zero sign."""
    p = 10.0 ** digits
    v = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(v) * p + 0.5), v) / p + 0.0


def string_offsets_data(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(offsets, utf8 data buffer) of a string/large_string Array slice —
    the zero-copy feed for per-row digest loops (sink.content_sha_array,
    dedup.add_content_hash). Handles the all-empty case where Arrow omits
    the data buffer entirely."""
    dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = arr.buffers()[2]
    return offs, (memoryview(data) if data is not None else memoryview(b""))


def hash_strings(arr: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a string column, vectorized.

    Stand-in for the reference's ``MOD(ORA_HASH(Msg_Key, 1000000), worker_count)``
    slice assignment (`transfer_thread.rb:239-242`). ``pd.util.hash_array`` is
    stable across processes and runs (fixed hash key), which the exactly-once
    replay requires.
    """
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


def partition_of(keys: pa.Array | pa.ChunkedArray | np.ndarray, num_partitions: int) -> np.ndarray:
    """``hash(key) % P`` partition assignment (operator S2's modulo slice)."""
    return (hash_strings(keys) % np.uint64(num_partitions)).astype(np.int32)


# ---------------------------------------------------------------------------
# null-safe comparison (reference `db_trigger_generator_oracle.rb:814-819`)
# ---------------------------------------------------------------------------


def null_safe_not_equal(a: pa.ChunkedArray | pa.Array, b: pa.ChunkedArray | pa.Array) -> pa.Array:
    """NULL-safe ``a <> b``: NULL vs NULL is equal; NULL vs value is different.

    The reference emits ``(:old.c != :new.c OR (:old.c IS NULL AND :new.c IS
    NOT NULL) OR ...)`` per column; here one vectorized kernel.
    """
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    neq = pc.fill_null(pc.not_equal(a, b), False)
    null_mismatch = pc.xor(pc.is_null(a), pc.is_null(b))
    return pc.or_(neq, null_mismatch)


# ---------------------------------------------------------------------------
# TO_CHAR / timestamp formatting (operator M9)
# ---------------------------------------------------------------------------

# Arrow's %S renders exactly six fractional digits for timestamp[us] — the
# reference's strftime "%6N" analog.
ISO_FORMAT = "%Y-%m-%dT%H:%M:%S"
# Envelope timestamp modes, reference `transfer_thread.rb:524-536`
# timestamp_as_iso_string (LEGACY_TS_FORMAT env):
#   None    → "%Y-%m-%dT%H:%M:%S.%6N" + DB timezone with colon  ("+00:00")
#   TYPE_1  → "%Y-%m-%dT%H:%M:%S,%6N%z"   (comma + machine TZ, no colon)
#   TYPE_2  → "%Y-%m-%dT%H:%M:%S,%6N" + DB timezone
# plus two engine-local modes used for payload rendering:
#   "comma" (comma fraction, no TZ) and "nofraction" (no fraction, no TZ).
LEGACY_TS_MODES = (None, "TYPE_1", "TYPE_2", "comma", "nofraction")


def format_timestamp(
    arr: pa.ChunkedArray | pa.Array,
    legacy: str | None = None,
    db_timezone: str | None = None,
    machine_timezone: str = "+0000",
) -> pa.Array:
    """Envelope/payload timestamp text, byte-matching the reference's three
    ``timestamp_as_iso_string`` formats when the timezone args are passed
    (`transfer_thread.rb:524-536`). Without ``db_timezone`` the default mode
    renders dot-fraction ISO with no suffix — the payload-object format
    (trigger TO_CHAR 'YYYY-MM-DD"T"HH24:MI:SSxFF',
    `db_trigger_generator_oracle.rb:904-906`)."""
    if legacy not in LEGACY_TS_MODES:
        raise ValueError(f"unsupported LEGACY_TS_FORMAT {legacy!r}")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.strftime(arr, format=ISO_FORMAT)
    if legacy in ("comma", "TYPE_1", "TYPE_2"):
        out = pc.replace_substring(out, pattern=".", replacement=",")
    elif legacy == "nofraction":
        out = pc.replace_substring_regex(out, pattern=r"\.\d+$", replacement="")
    if legacy == "TYPE_1":
        suffix = machine_timezone
    elif legacy in (None, "TYPE_2"):
        suffix = db_timezone or ""
    else:
        suffix = ""
    if suffix:
        out = pc.binary_join_element_wise(out, suffix, "")
    return out


_HEX_LUT = np.frombuffer(b"0123456789ABCDEF", dtype=np.uint8)


def raw_to_hex(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """RAWTOHEX analog for binary columns (`db_trigger_generator_oracle.rb:904`).

    Fully vectorized: the whole binary data buffer is hex-expanded with two
    numpy lookup-table writes, and the output string array is rebuilt from
    doubled offsets — no per-value ``as_buffer()``/``hex()`` Python loop.
    Nulls are re-applied with one ``pc.if_else`` over the validity mask."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    seg = (
        np.frombuffer(buf, dtype=np.uint8)[offs[0] : offs[-1]]
        if buf is not None and offs[-1] > offs[0]
        else np.empty(0, dtype=np.uint8)
    )
    hx = np.empty(seg.size * 2, dtype=np.uint8)
    hx[0::2] = _HEX_LUT[seg >> 4]
    hx[1::2] = _HEX_LUT[seg & 0xF]
    new_offs = (offs - offs[0]) * 2
    if new_offs[-1] > np.iinfo(np.int32).max:
        # > 1 GiB of payload bytes in one chunk: int32 offsets would wrap —
        # emit a large_string with int64 offsets instead
        hexed = pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(new_offs.astype(np.int64).tobytes()), pa.py_buffer(hx.tobytes())
        )
    else:
        hexed = pa.StringArray.from_buffers(
            n, pa.py_buffer(new_offs.astype(np.int32).tobytes()), pa.py_buffer(hx.tobytes())
        )
    if arr.null_count:
        hexed = pc.if_else(arr.is_valid(), hexed, pa.nulls(n, hexed.type))
    return hexed


# JSON forbids raw U+0000..U+001F inside strings; \n \r \t get their short
# escapes above, the rest need \u00XX
_CTRL_RE = "[\x00-\x08\x0b\x0c\x0e-\x1f]"


def escape_json_string(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    r"""The trigger's REPLACE(v, '"', '\"') plus backslash/control escaping
    (M5). The control-char pass is gated on one vectorized regex probe — the
    per-row fixup only runs for batches that actually contain poison bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
    out = pc.replace_substring(out, pattern='"', replacement='\\"')
    out = pc.replace_substring(out, pattern="\n", replacement="\\n")
    out = pc.replace_substring(out, pattern="\r", replacement="\\r")
    out = pc.replace_substring(out, pattern="\t", replacement="\\t")
    has_ctrl = pc.fill_null(pc.match_substring_regex(out, _CTRL_RE), False)
    if pc.any(has_ctrl).as_py():
        fixed = [
            None
            if v is None
            else "".join(f"\\u{ord(c):04x}" if ord(c) < 0x20 else c for c in v)
            for v in out.to_pylist()
        ]
        out = pa.array(fixed, pa.string())
    return out


def retry_delay_seconds(retry_count: np.ndarray | pa.Array, start_delay: float = 20.0) -> np.ndarray:
    """Exponential backoff ``start_delay * 3^(retry-1)``.

    Reference `transfer_thread.rb:361` (Oracle ``POWER(3, Retry_Count-1)``)."""
    if isinstance(retry_count, (pa.Array, pa.ChunkedArray)):
        retry_count = retry_count.to_numpy(zero_copy_only=False)
    rc = np.maximum(np.asarray(retry_count, dtype=np.float64), 1.0)
    return start_delay * np.power(3.0, rc - 1.0)


# ---------------------------------------------------------------------------
# expression evaluator for conditions / computed columns / key expressions
# ---------------------------------------------------------------------------

_SAFE_GLOBALS: dict[str, Any] = {"__builtins__": {}}


def compile_expr(expr: str) -> Any:
    return compile(expr, "<capture-config>", "eval")


def eval_expr(
    expr: str | Any,
    batch: pa.Table | pa.RecordBatch,
    extra: dict[str, Any] | None = None,
) -> Any:
    """Evaluate a config expression against a batch, vectorized.

    Namespace:
      - ``c(name)``  -> the column as a combined Arrow array
      - ``v(name)``  -> per-row old/new value resolution: for DELETE rows the
        ``old_<name>`` value, otherwise ``new_<name>`` (the reference's
        ``:old``→``:new`` rewrite per op, `db_trigger_generator_oracle.rb:952-967`)
      - ``pc`` / ``pa`` / ``np`` kernels, plus the helpers above.
    """
    code = compile_expr(expr) if isinstance(expr, str) else expr

    def c(name: str):
        col = batch.column(name)
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def v(name: str):
        is_del = pc.equal(c("op"), "D")
        return pc.if_else(is_del, c(f"old_{name}"), c(f"new_{name}"))

    ns: dict[str, Any] = {
        "c": c,
        "v": v,
        "pc": pc,
        "pa": pa,
        "np": np,
        "null_safe_not_equal": null_safe_not_equal,
        "format_timestamp": format_timestamp,
        "hash_strings": hash_strings,
    }
    if extra:
        ns.update(extra)
    return eval(code, _SAFE_GLOBALS, ns)


def eval_mask(expr: str | Any, batch: pa.Table) -> pa.Array:
    """Evaluate a condition expression and coerce to a non-null boolean mask."""
    out = eval_expr(expr, batch)
    if isinstance(out, np.ndarray):
        out = pa.array(out)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return pc.fill_null(out.cast(pa.bool_()), False)


def segment_triu_indices(seg_lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j), fully vectorized: for segments
    of lengths m₀..mₖ laid out consecutively, returns (gi, gj, seg_of_pair)
    global index arrays covering every segment's C(m,2) pairs — the grouped
    pairwise-comparison primitive (inversion counts, within-group O(m²)
    verifies) with no per-segment Python.

    The pair ordinal → (i, j) decode is the triangular-number inverse via
    float sqrt plus an exact ±1 integer correction (sqrt is within 1 ulp for
    p < 2⁵⁰, so one correction pass suffices)."""
    m = np.asarray(seg_lengths, dtype=np.int64)
    ppseg = m * (m - 1) // 2
    total = int(ppseg.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    seg_of_pair = np.repeat(np.arange(len(m), dtype=np.int64), ppseg)
    p = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(ppseg) - ppseg, ppseg)
    j = ((1.0 + np.sqrt(1.0 + 8.0 * p.astype(np.float64))) / 2.0).astype(np.int64)
    # exact correction of the float decode
    j = np.where(j * (j - 1) // 2 > p, j - 1, j)
    j = np.where((j + 1) * j // 2 <= p, j + 1, j)
    i = p - j * (j - 1) // 2
    seg_start = np.repeat(np.cumsum(m) - m, ppseg)
    return seg_start + i, seg_start + j, seg_of_pair
