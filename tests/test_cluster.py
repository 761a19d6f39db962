"""Connected-components dup clustering + hash sampling + heavy hitters."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from movex_cdc_ray.functions.cluster import assign_clusters, connected_components
from movex_cdc_ray.functions.corpus import hash_sample, top_tokens


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return rd.from_arrow(
        pa.table({"a_id": pa.array(a, pa.int64()), "b_id": pa.array(b, pa.int64())})
    )


def test_connected_components_chain_and_islands(ray_session):
    # chain 1-2-3-4-5 (diameter 4 → several propagation rounds), island 10-11,
    # and a triangle 20-21-22 entered in mixed order
    edges = [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11), (21, 20), (22, 20), (21, 22)]
    out = connected_components(_pairs(edges)).to_pandas().sort_values("node")
    got = dict(zip(out["node"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_assign_clusters_singletons_and_canonicals(ray_session):
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(range(8), pa.int64())}))
    out = (
        assign_clusters(docs, _pairs([(1, 3), (3, 5)]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["cluster_id"].tolist() == [0, 1, 2, 1, 4, 1, 6, 7]
    # exactly one canonical per cluster, and it's the min id
    assert out["is_canonical"].tolist() == [True, True, True, False, True, False, True, True]
    canon = out[out["is_canonical"]]
    assert set(canon["doc_id"]) == set(out["cluster_id"].unique())


def test_connected_components_partitioning_invariant(ray_session):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)]  # pairs + one big link
    for nparts in (1, 3, 7):
        out = (
            connected_components(_pairs(edges).repartition(nparts))
            .to_pandas()
            .sort_values("node")
        )
        # 0-1, 2-3, ... all linked through (0, 38)? no: (0,38) merges the
        # 0-1 and 38-39 pair-components only
        got = dict(zip(out["node"], out["cluster_id"]))
        assert got[38] == 0 and got[39] == 0 and got[2] == 2 and got[3] == 2


def test_hash_sample_deterministic_and_growth_stable(ray_session):
    full = rd.from_arrow(pa.table({"doc_id": pa.array(range(4000), pa.int64())}))
    s1 = hash_sample(full, 0.25).to_pandas().sort_values("doc_id")
    s2 = hash_sample(full, 0.25).to_pandas().sort_values("doc_id")
    assert s1["doc_id"].tolist() == s2["doc_id"].tolist()
    assert abs(len(s1) / 4000 - 0.25) < 0.03
    # growth stability: the sample over a subset corpus is exactly the
    # intersection — no row enters/leaves because other rows changed
    sub = rd.from_arrow(pa.table({"doc_id": pa.array(range(0, 4000, 3), pa.int64())}))
    s3 = hash_sample(sub, 0.25).to_pandas()
    assert set(s3["doc_id"]) == set(s1["doc_id"]) & set(range(0, 4000, 3))


def test_hash_sample_stratified_rates(ray_session):
    n = 6000
    langs = ["en", "de", "xx"] * (n // 3)
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "lang": pa.array(langs)})
    out = hash_sample(
        rd.from_arrow(t), rate=0.2, stratum_col="lang",
        stratum_rates={"en": 0.1, "de": 0.5},
    ).to_pandas()
    frac = out["lang"].value_counts() / (n // 3)
    assert abs(frac.get("en", 0) - 0.1) < 0.04
    assert abs(frac.get("de", 0) - 0.5) < 0.05
    assert abs(frac.get("xx", 0) - 0.2) < 0.05  # default rate fallback


def test_contamination_flags(ray_session):
    from movex_cdc_ray.functions.corpus import contamination_flags

    bench = rd.from_arrow(
        pa.table({"doc_id": pa.array([100], pa.int64()),
                  "text": pa.array(["the quick brown fox jumps"])})
    )
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox sleeps",   # shares 'the quick brown', 'quick brown fox'
                        "completely unrelated text here",
                        "brown fox jumps over it",      # shares 'brown fox jumps'
                    ]
                ),
            }
        )
    )
    out = (
        contamination_flags(train, bench, k=3, min_hits=1, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [2, 0, 1]
    assert out["contaminated"].tolist() == [True, False, True]


def test_contamination_filter_mode_and_semi_join(ray_session):
    from movex_cdc_ray.functions.cluster import semi_join_ids
    from movex_cdc_ray.functions.corpus import contamination_flags

    bench = rd.from_arrow(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array(["shared gram here indeed"])})
    )
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["shared gram here too", "nothing in common at all"]),
            }
        )
    )
    kept = contamination_flags(train, bench, k=3, mode="filter", concurrency=2).to_pandas()
    assert kept["doc_id"].tolist() == [2]          # contaminated row dropped
    assert kept.columns.tolist() == ["doc_id", "text"]  # columns pass through

    data = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a", "b", "c"])})
    )
    ids = rd.from_arrow(pa.table({"doc_id": pa.array([2, 3, 99], pa.int64())}))
    out = semi_join_ids(data, ids).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [2, 3]
    assert out["text"].tolist() == ["b", "c"]


def test_top_tokens_counts_and_tiebreak(ray_session):
    texts = ["b b a", "a c b", "", "C a"]  # a=3, b=3, c=2 (case-folded)
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
    out = top_tokens(ds, k=2).to_pandas()
    # ties broken by token asc: a before b at n=3
    assert out["token"].tolist() == ["a", "b"]
    assert out["n"].tolist() == [3, 3]


def test_tfidf_top_terms(ray_session):
    from movex_cdc_ray.functions.text import tfidf_top_terms

    # doc 0: 'apple' tf=2 + rare -> top; 'the' common in all docs -> idf 0
    texts = ["apple apple the pie", "the banana split", "the banana pie"]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)})
    ).repartition(2)
    out = tfidf_top_terms(ds, top_n=2).to_pandas().sort_values(["doc_id", "rank"])
    d0 = out[out["doc_id"] == 0]
    assert d0["term"].tolist()[0] == "apple"          # tf=2, df=1 dominates
    # 'the' appears in all 3 docs: idf = ln(1) = 0 -> never outranks others
    assert all(
        out[(out["doc_id"] == i) & (out["term"] == "the")]["score"].le(0).all()
        for i in range(3)
    )
    # rank is dense 1..top_n per doc
    assert out.groupby("doc_id")["rank"].apply(list).map(lambda r: r == list(range(1, len(r) + 1))).all()


def test_pq_encode_roundtrip_properties(ray_session):
    import numpy as np

    from movex_cdc_ray.functions.similarity import pq_encode

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(300, 16)).astype("float32")
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    out = pq_encode(rd.from_arrow(t).repartition(3), m=4, ks=8, sample_rows=64).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 300
    for s in range(4):
        assert out[f"code_{s}"].between(0, 7).all()
    # reconstruction error is nonnegative, and near-zero for a sample row
    # that seeded a codebook centroid (vec 0 is its own init centroid)
    assert (out["recon_err"] >= 0).all()
    # deterministic: re-encode gives identical codes
    again = pq_encode(rd.from_arrow(t).repartition(5), m=4, ks=8, sample_rows=64).to_pandas()
    again = again.sort_values("vec_id").reset_index(drop=True)
    assert out.equals(again)


def test_assign_clusters_empty_pairs(ray_session):
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(range(10), pa.int64())}))
    empty = rd.from_pandas(
        pd.DataFrame({"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")})
    )
    out = assign_clusters(docs, empty).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == list(range(10))
    assert out["is_canonical"].all()


def test_dedup_incremental_is_incremental(ray_session):
    """The CDC-replay dedup converges, a re-run is a resume no-op, and the
    kept doc per content matches the arg-max rule."""
    from movex_cdc_ray.pipelines.queries import _dedup_inc_config, dedup_incremental
    from movex_cdc_ray.pipelines.replay import replay

    out = dedup_incremental("/root/testdata/sf0.001")
    assert len(out) > 0
    assert out["content_md5"].is_unique
    # the staged stream + lake are still on disk: a second replay must
    # consume ZERO new epochs (manifest resume — the incremental property)
    rep = replay("/tmp/movex_dedupinc/stream", "/tmp/movex_dedupinc/lake",
                 _dedup_inc_config(), chunks_per_epoch=1)
    assert rep.epochs == 0


def test_connected_components_local_matches_distributed(ray_session):
    # same graph through both paths: the driver-local numpy fixpoint
    # (edge count under threshold) and the distributed min-label rounds
    # (threshold 0 forces them) must agree exactly
    edges = (
        [(i, i + 1) for i in range(0, 30, 3)]
        + [(100, 103), (103, 106), (106, 109), (109, 112)]
        + [(200, 201)]
    )
    loc = connected_components(_pairs(edges)).to_pandas().sort_values("node")
    dist = (
        connected_components(_pairs(edges), local_edge_threshold=0)
        .to_pandas()
        .sort_values("node")
    )
    assert dict(zip(loc["node"], loc["cluster_id"])) == dict(
        zip(dist["node"], dist["cluster_id"])
    )
