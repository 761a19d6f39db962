"""Cross-query consistency invariants for the round-3 additions: every new
operator's result must agree with an independently-computed view of the same
data (another query or a direct scan), not just with its own SQL oracle —
catches oracle-and-query-share-a-bug failure modes."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def qs(ray_session):
    import __ray_entry__ as e

    return e.queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "customer", "orders", "lineitem", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_pivot_row_sums_equal_event_counts(qs, con):
    piv = qs["events_pivot"](SF_DIR)
    wide = piv[[c for c in piv.columns if c.startswith("n_")]].sum(axis=1)
    per_user = con.sql(
        "SELECT user_id, COUNT(*) n FROM events GROUP BY user_id ORDER BY user_id"
    ).df()
    assert (piv["user_id"].to_numpy() == per_user["user_id"].to_numpy()).all()
    assert (wide.to_numpy() == per_user["n"].to_numpy()).all()


def test_gap_fill_dense_and_lossless(qs, con):
    dense = qs["events_gap_fill"](SF_DIR)
    n_types = dense["event_type"].nunique()
    hours = dense["hour_start"].nunique()
    # dense: every (type, hour) cell present exactly once
    assert len(dense) == n_types * hours
    # lossless: cell sums reproduce the total event count
    total = con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    assert dense["n_events"].sum() == total
    # the spine has no hour gaps
    hrs = np.sort(dense["hour_start"].unique())
    deltas = np.diff(hrs).astype("timedelta64[s]").astype("int64")
    assert (deltas == 3600).all()


def test_user_paths_cover_every_user(qs, con):
    paths = qs["events_user_paths"](SF_DIR)
    n_users = con.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert paths["n_users"].sum() == n_users
    # each path is at most 8 steps
    assert paths["path"].str.count(">").max() <= 7


def test_user_deltas_direction_counts_bounded(qs):
    d = qs["events_user_deltas"](SF_DIR)
    # per user: up + down <= transitions (== when no equal-value repeats)
    assert ((d["n_up"] + d["n_down"]) <= d["n_events"] - 1).all()
    assert (d.loc[d["n_events"] == 1, "max_gap_us"] == -1).all()
    assert (d.loc[d["n_events"] > 1, "max_gap_us"] >= 0).all()


def test_covariance_diagonal_is_variance_and_psd(qs, con):
    cov = qs["embedding_covariance"](SF_DIR)
    d = int(cov["i"].max())
    assert len(cov) == d * (d + 1) // 2
    # rebuild the symmetric matrix; it must be PSD (it is a Gram-derived
    # covariance) and its diagonal must match per-dim population variance
    m = np.zeros((d, d))
    m[cov["i"] - 1, cov["j"] - 1] = cov["cov"]
    m[cov["j"] - 1, cov["i"] - 1] = cov["cov"]
    eig = np.linalg.eigvalsh(m)
    assert eig.min() > -1e-6  # rounding quantum tolerance
    var1 = con.sql(
        "SELECT VAR_POP(emb[1]) FROM (SELECT embedding::DOUBLE[] emb FROM embeddings)"
    ).fetchone()[0]
    assert abs(m[0, 0] - var1) < 1e-6


def test_q13_histogram_counts_all_customers(qs, con):
    hist = qs["q13_customer_distribution"](SF_DIR)
    n_cust = con.sql("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert hist["custdist"].sum() == n_cust


def test_q4_counts_bounded_by_quarter_orders(qs, con):
    q4 = qs["q4_order_priority"](SF_DIR)
    per_prio = con.sql("""
        SELECT o_orderpriority, COUNT(*) n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1 ORDER BY 1
    """).df()
    merged = q4.merge(per_prio, on="o_orderpriority", how="left")
    assert (merged["order_count"] <= merged["n"]).all()
    assert (merged["order_count"] > 0).all()


def test_q22_excludes_every_recent_orderer(qs, con):
    q22 = qs["q22_idle_customers"](SF_DIR)
    # anti-join soundness: no counted customer may have a recent order
    leak = con.sql("""
        WITH agg AS (SELECT COUNT(*) n_pos,
                            SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) s
                     FROM customer WHERE c_acctbal > 0.0)
        SELECT COUNT(*) FROM customer c, agg
        WHERE CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT) * agg.n_pos > agg.s
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    """).fetchone()[0]
    assert q22["numcust"].sum() == leak


def test_q18_top100_is_prefix_of_full_ranking(qs, con):
    q18 = qs["q18_large_orders"](SF_DIR)
    full = con.sql("""
        SELECT o.o_orderkey FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
        HAVING SUM(l.l_quantity) > 300.0
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    """).df()
    k = min(100, len(full))
    assert q18["o_orderkey"].tolist() == full["o_orderkey"].head(k).tolist()


def test_cep_match_equals_bruteforce(qs, con):
    """The searchsorted window logic re-derived with a per-purchase Python
    scan (O(n^2), test-only) — independent of BOTH the query and its
    self-join oracle."""
    cep = qs["events_cep_match"](SF_DIR)
    ev = con.sql("SELECT event_id, ts, user_id, event_type FROM events").df()
    expected = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        for _, r in g[g["event_type"] == "purchase"].iterrows():
            lo = r["ts"] - pd.Timedelta(hours=24)
            n = (
                (g["event_type"] == "click") & (g["ts"] >= lo) & (g["ts"] < r["ts"])
            ).sum()
            if n >= 2:
                expected[int(r["event_id"])] = int(n)
    got = dict(zip(cep["event_id"].astype(int), cep["n_clicks_24h"].astype(int)))
    assert got == expected


def test_unpivot_is_pivot_roundtrip(qs):
    wide = qs["events_pivot"](SF_DIR)
    long = qs["events_unpivot"](SF_DIR)
    # melt(pivot) with zero cells dropped == the long table
    melted = wide.melt(id_vars="user_id", var_name="col", value_name="n")
    melted["event_type"] = melted["col"].str.removeprefix("n_")
    melted = melted[melted["n"] > 0][["user_id", "event_type", "n"]]
    melted = melted.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    assert melted.astype(str).equals(long[["user_id", "event_type", "n"]].astype(str))


def test_skyline_equals_bruteforce_dominance(qs):
    """events_skyline == the O(n^2) dominance definition, checked per type
    on the full sf0.001 events table (1000 rows)."""
    import pyarrow.parquet as pq

    got = qs["events_skyline"](SF_DIR)
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "event_type", "value"]
    ).to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    expect = []
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        t = g["ts_us"].to_numpy()
        # dominated iff exists (v', t') with v'>=v, t'>=t and strict in one
        dom = ((v[None, :] >= v[:, None]) & (t[None, :] >= t[:, None])
               & ((v[None, :] > v[:, None]) | (t[None, :] > t[:, None]))).any(axis=1)
        expect.extend(g.loc[~dom, "event_id"].tolist())
    assert sorted(got["event_id"].tolist()) == sorted(expect)
    # local-prune soundness: a second skyline pass over the result is a no-op
    from movex_cdc_ray.pipelines.queries import _skyline_pass

    again = _skyline_pass(
        got.assign(value=got["value_cents"] / 100.0)[
            ["event_type", "event_id", "value", "ts_us"]
        ]
    )
    assert again.num_rows == len(got)


def test_scene_cuts_fire_exactly_at_scene_starts(qs):
    """The scene fixture has 3 scenes x 4 frames: cuts must be flagged at
    transitions 4 and 8 (scene starts) and nowhere else, for every video."""
    got = qs["multimodal_scene_cuts"](SF_DIR)
    for mid, g in got.groupby("media_id"):
        assert sorted(g.loc[g["is_cut"], "frame_idx"].tolist()) == [4, 8], mid
        assert len(g) == 11  # 12 frames -> 11 transitions


def test_quantile_histogram_equals_bruteforce_order_stats(qs):
    import pyarrow.parquet as pq

    got = qs["events_quantile_histogram"](SF_DIR)
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    for _, row in got.iterrows():
        c = np.sort(ev.loc[ev["event_type"] == row["event_type"], "c"].to_numpy())
        assert row["n"] == len(c)
        for q, col in ((0.50, "p50_cents"), (0.90, "p90_cents"), (0.99, "p99_cents")):
            assert row[col] == c[int(np.floor((len(c) - 1) * q))], (row["event_type"], q)


def test_zorder_buckets_bound_both_dimensions(qs):
    """The data-skipping property: every z-range bucket's (user x cents)
    rectangle is strictly smaller than the global rectangle, so a predicate
    on either column can skip buckets by zone map alone."""
    got = qs["events_zorder"](SF_DIR)
    assert len(got) > 1
    gu = got["u_max"].max() - got["u_min"].min()
    gc = got["c_max"].max() - got["c_min"].min()
    area = (got["u_max"] - got["u_min"] + 1) * (got["c_max"] - got["c_min"] + 1)
    assert (area < (gu + 1) * (gc + 1)).all()


def test_peak_concurrency_equals_bruteforce_sweep(qs):
    import pyarrow.parquet as pq

    got = qs["events_peak_concurrency"](SF_DIR)
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"])
    us, uid = ev["us"].to_numpy(), ev["user_id"].to_numpy()
    new = np.r_[True, (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
    a = np.minimum.reduceat(us, np.flatnonzero(new))
    b = np.maximum.reduceat(us, np.flatnonzero(new))
    t = np.r_[a, b + 1]
    d = np.r_[np.ones(len(a), np.int64), -np.ones(len(b), np.int64)]
    order = np.lexsort((-d, t))
    run = np.cumsum(d[order])
    peak = int(run.max())
    assert int(got["n_sessions"].iloc[0]) == len(a)
    assert int(got["peak_concurrency"].iloc[0]) == peak
    assert int(got["peak_first_us"].iloc[0]) == int(t[order][int(np.argmax(run))])
