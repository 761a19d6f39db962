"""Scalar function + partitioning unit tests (SURVEY §2.8, S2/S3, skew)."""

import numpy as np
import pyarrow as pa
import pytest

from movex_cdc_ray.functions.scalar import (
    escape_json_string,
    format_timestamp,
    hash_strings,
    null_safe_not_equal,
    partition_of,
    raw_to_hex,
    retry_delay_seconds,
)
from movex_cdc_ray.stages.partitioning import assign_partitions, combine_last_per_key


def test_null_safe_not_equal():
    a = pa.array(["x", None, None, "y"])
    b = pa.array(["x", None, "z", "z"])
    assert null_safe_not_equal(a, b).to_pylist() == [False, False, True, True]


def test_hash_is_deterministic_across_calls():
    keys = np.array(["a", "b", "mega/repo", "a"], dtype=object)
    h1, h2 = hash_strings(keys), hash_strings(keys.copy())
    assert (h1 == h2).all()
    assert h1[0] == h1[3]
    p = partition_of(keys, 8)
    assert p.dtype == np.int32 and ((p >= 0) & (p < 8)).all()


def test_retry_delay_exponential():
    # reference `transfer_thread.rb:361`: 20 * 3^(retry-1)
    d = retry_delay_seconds(np.array([1, 2, 3]), start_delay=20.0)
    assert list(d) == [20.0, 60.0, 180.0]


def test_raw_to_hex_and_escape():
    assert raw_to_hex(pa.array([b"\x01\xab", None], pa.binary())).to_pylist() == ["01AB", None]
    assert escape_json_string(pa.array(['a"b\\c\nd'])).to_pylist() == ['a\\"b\\\\c\\nd']


def test_format_timestamp_legacy_modes():
    ts = pa.array([1_700_000_000_123_456], pa.timestamp("us"))
    assert format_timestamp(ts).to_pylist() == ["2023-11-14T22:13:20.123456"]
    assert format_timestamp(ts, "comma").to_pylist() == ["2023-11-14T22:13:20,123456"]
    assert format_timestamp(ts, "nofraction").to_pylist() == ["2023-11-14T22:13:20"]


def _events(rows):
    ids, keys = zip(*rows)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "key_string": pa.array(keys, pa.string()),
            "payload": pa.array([f"v{i}" for i in ids]),
        }
    )


def test_combine_last_per_key():
    t = _events([(1, "a"), (5, "b"), (3, "a"), (2, "b"), (9, "c")])
    out = combine_last_per_key(t)
    got = dict(zip(out["key_string"].to_pylist(), out["id"].to_pylist()))
    assert got == {"a": 3, "b": 5, "c": 9}


def test_combine_keeps_unkeyed_rows():
    t = _events([(1, "a"), (2, None), (3, "a"), (4, None)])
    out = combine_last_per_key(t)
    assert sorted(out["id"].to_pylist()) == [2, 3, 4]


def test_assign_partitions_stable_and_salted():
    t = _events([(1, "hot"), (2, "hot"), (3, "cold"), (4, None)])
    out1 = assign_partitions(t, 16, salt_factor=4, hot_keys=frozenset({"hot"}))
    out2 = assign_partitions(t, 16, salt_factor=4, hot_keys=frozenset({"hot"}))
    assert out1["part"].to_pylist() == out2["part"].to_pylist()
    # same key → same partition; unkeyed rows get id-based round robin
    assert out1["part"][0].as_py() == out1["part"][1].as_py()
    salts = out1["salt"].to_pylist()
    assert salts[2] == 0 and salts[3] == 0  # only hot keys salted
    assert {s for s in salts[:2]} <= {0, 1, 2, 3}


def test_round_half_away_matches_duckdb():
    import duckdb
    import numpy as np

    from movex_cdc_ray.functions.scalar import round_half_away

    # 9/128 = 0.0703125 sits EXACTLY on the 6-decimal boundary: half-even
    # (numpy/python round) gives ...12, DuckDB ROUND gives ...13
    vals = [9 / 128, 1 / 128, 0.0, 1.0, 2 / 3, -9 / 128, 1e-7, 123.4567895]
    got = round_half_away(np.array(vals))
    exp = [
        duckdb.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        for v in vals
    ]
    assert got.tolist() == exp
    assert got[0] == 0.070313  # the observed sf0.1 divergence, pinned
    # -0.0 never escapes (value hashes must not split on zero sign)
    assert str(round_half_away(np.array([-1e-9]))[0]) == "0.0"


def test_round_half_away_property_vs_duckdb():
    # derandomized sweep: random magnitudes + engineered dyadic boundaries
    import duckdb
    import numpy as np

    from movex_cdc_ray.functions.scalar import round_half_away

    rng = np.random.default_rng(17)
    vals = np.concatenate(
        [
            rng.uniform(-10, 10, 120),
            rng.uniform(0, 1, 60),
            np.arange(1, 60, dtype=np.float64) / 128.0,   # 7-digit .5 boundaries
            np.arange(1, 30, dtype=np.float64) / 640.0,
        ]
    )
    got = round_half_away(vals)
    con = duckdb.connect()
    exp = np.array(
        [con.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0] for v in vals]
    )
    assert (got == exp).all()
