"""Salted skew join: result correctness under pathological skew, and
independence from the hot-set routing decision."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from movex_cdc_ray.functions.joins import heavy_keys, salted_hash_join


def _fixture():
    # celebrity key 7 owns 50% of the fact side; the rest is uniform
    n = 4_000
    ordinal = np.arange(n, dtype=np.int64)
    k = np.where(ordinal % 2 == 0, 7, ordinal % 97).astype(np.int64)
    fact = pa.table({"k": pa.array(k), "v": pa.array(ordinal),
                     "src": pa.array(ordinal)})
    dk = np.arange(97, dtype=np.int64)
    dim = pa.table({"dk": pa.array(dk),
                    "attr": pa.array([f"u{int(x)}" for x in dk], pa.string())})
    exp = (
        pd.DataFrame({"key": k, "v": ordinal})
        .merge(pd.DataFrame({"key": dk, "attr": [f"u{int(x)}" for x in dk]}), on="key")
        .sort_values(["key", "v"]).reset_index(drop=True)
    )
    return fact, dim, exp


def _run(fact, dim, hot):
    out = salted_hash_join(
        rd.from_arrow(fact).repartition(8),
        rd.from_arrow(dim).repartition(4),
        "k", "dk", left_cols=["v"], right_cols=["attr"],
        salt_source="src", hot_keys=hot, n_salt=4, n_buckets=16,
    ).to_pandas()
    return out.sort_values(["key", "v"]).reset_index(drop=True)[["key", "v", "attr"]]


def test_salted_join_matches_pandas_under_50pct_hot_key(ray_session):
    fact, dim, exp = _fixture()
    got = _run(fact, dim, hot={7})
    pd.testing.assert_frame_equal(got, exp[["key", "v", "attr"]])


def test_salted_join_result_is_hot_set_invariant(ray_session):
    """The hot set is pure routing: empty, right, and wrong hot sets all
    produce the identical join."""
    fact, dim, exp = _fixture()
    for hot in ((), {7}, {3, 7, 12}, {55}):
        got = _run(fact, dim, hot)
        pd.testing.assert_frame_equal(got, exp[["key", "v", "attr"]]), hot


def test_heavy_keys_finds_the_celebrity(ray_session):
    fact, _dim, _exp = _fixture()
    hot = heavy_keys(rd.from_arrow(fact).repartition(8), "k", top=4)
    assert 7 in hot
    assert hot[7] >= max(v for k, v in hot.items() if k != 7)
