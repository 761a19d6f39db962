"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare against its oracle_sql() via DuckDB
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64",):
            df[c] = df[c].astype("float64") if df[c].max() > 2**63 - 1 else df[c].astype("int64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if list(sorted(got.columns)) != list(sorted(exp.columns)):
        return f"SCHEMA MISMATCH got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT {len(got)} != {len(exp)}"
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        if g[c].dtype.kind == "f" or e[c].dtype.kind == "f":
            import numpy as np

            ga = g[c].to_numpy(dtype="float64")
            ea = e[c].to_numpy(dtype="float64")
            if not np.allclose(ga, ea, rtol=0, atol=0, equal_nan=True):
                bad = (ga != ea) & ~(pd.isna(ga) & pd.isna(ea))
                return f"VALUES differ in {c}: {int(bad.sum())} rows, e.g. {ga[bad][:3]} vs {ea[bad][:3]}"
        else:
            if not g[c].astype(str).equals(e[c].astype(str)):
                neq = g[c].astype(str) != e[c].astype(str)
                return f"VALUES differ in {c}: {int(neq.sum())} rows, e.g. {g[c][neq].head(2).tolist()} vs {e[c][neq].head(2).tolist()}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if sf_dir == "all":
        # every scale in one invocation (fresh Ray session per dir) — the
        # sf0.1 pass is what catches boundary bugs the driver's sf0.01
        # gate happens to miss
        rc = 0
        for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            print(f"=== {d}")
            rc |= _run_dir(d, only)
        return rc
    return _run_dir(sf_dir, only)


def _run_dir(sf_dir: str, only: str | None) -> int:
    import ray

    sys.path.insert(0, "/root/repo")
    from movex_cdc_ray.__main__ import _ray_init

    _ray_init(8)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    subset = None
    if only and only.startswith("first:"):
        # "first:N" = the driver's sampling rule (first N registry entries)
        subset = set(list(qs)[: int(only.split(":", 1)[1])])
    elif only and only not in qs:
        # a typo'd name must not run zero checks and exit green
        print(f"FAIL  unknown query {only!r}; valid: {sorted(qs)}")
        return 1
    for name, fn in qs.items():
        if subset is not None:
            if name not in subset:
                continue
        elif only and name != only:
            continue
        t0 = time.perf_counter()
        try:
            got = fn(sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            elif not isinstance(got, pd.DataFrame):
                got = pd.DataFrame(got)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name in oracles:
            try:
                exp = con.sql(oracles[name]).df()
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL  {name}: oracle raised {exc}")
                failures += 1
                continue
            try:
                verdict = compare(name, got, exp)
            except Exception as exc:  # noqa: BLE001 - dtype mismatch etc. = FAIL, not crash
                verdict = f"compare raised {type(exc).__name__}: {exc}"
            status = "ok   " if verdict == "OK" else "FAIL "
            if verdict != "OK":
                failures += 1
            print(f"{status}{name}: {verdict} ({len(got)} rows, {dt:.1f}s)")
        else:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
