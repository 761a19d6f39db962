"""Corpus-prep operators: deterministic split assignment + sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from movex_cdc_ray.functions.corpus import (
    DEFAULT_SPLIT_WEIGHTS,
    pack_sequences,
    split_assign,
    split_edges,
)


def test_split_edges_integer_boundaries():
    labels, edges = split_edges({"train": 0.9, "val": 0.05, "test": 0.05}, 10_000)
    assert labels == ["train", "val", "test"]
    assert edges == [9000, 9500, 10000]
    # non-normalized weights normalize; tail always owns the last bucket
    _, e2 = split_edges({"a": 3, "b": 1}, 1000)
    assert e2 == [750, 1000]


def test_split_assign_deterministic_and_subset_stable(ray_session):
    ids = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    out = split_assign(rd.from_arrow(ids)).to_pandas().sort_values("doc_id")
    again = split_assign(rd.from_arrow(ids)).to_pandas().sort_values("doc_id")
    assert out["split"].tolist() == again["split"].tolist()
    # proportions near the weights (md5 is uniform)
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - DEFAULT_SPLIT_WEIGHTS["train"]) < 0.03
    # membership is a pure function of the id: a subset corpus assigns
    # every surviving doc to the SAME split (no migration on growth)
    subset = pa.table({"doc_id": pa.array(range(0, 2000, 3), pa.int64())})
    sub = split_assign(rd.from_arrow(subset)).to_pandas().sort_values("doc_id")
    merged = sub.merge(out, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_epoch_shuffle_dense_rank_and_epoch_variation(ray_session):
    from movex_cdc_ray.functions.corpus import _id_hashes, epoch_shuffle

    ids = pa.array(range(500), pa.int64())
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(4)
    out = epoch_shuffle(ds, epoch=3, n_buckets=8).to_pandas().sort_values("doc_id")
    # dense permutation of 0..n-1
    assert sorted(out["pos"].tolist()) == list(range(500))
    # order matches the reference (hash, id) sort
    h = _id_hashes(ids, 3)
    expected_order = np.lexsort((np.arange(500), h))
    expected_pos = np.empty(500, dtype=np.int64)
    expected_pos[expected_order] = np.arange(500)
    assert out["pos"].tolist() == expected_pos.tolist()
    # a different epoch gives a different (but still dense) permutation
    out2 = epoch_shuffle(ds, epoch=4, n_buckets=8).to_pandas().sort_values("doc_id")
    assert out2["pos"].tolist() != out["pos"].tolist()
    # bucketing is an implementation detail: rank must not depend on it
    out3 = epoch_shuffle(ds, epoch=3, n_buckets=32).to_pandas().sort_values("doc_id")
    assert out3["pos"].tolist() == out["pos"].tolist()


def _pack_oracle(ids, texts, budget):
    ntok = [0 if not t else t.count(" ") + 1 for t in texts]
    order = np.argsort(ids)
    off, rows = 0, {}
    for i in order:
        rows[ids[i]] = (ntok[i], off // budget, off % budget)
        off += ntok[i]
    return rows


def test_pack_sequences_matches_oracle_and_partitioning_invariant(ray_session):
    rng = np.random.default_rng(5)
    ids = list(range(300))
    texts = [" ".join(["w"] * int(rng.integers(0, 40))) for _ in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    expected = _pack_oracle(ids, texts, budget=64)

    for range_size in (7, 64, 1000):  # placement must not depend on bucketing
        got = (
            pack_sequences(rd.from_arrow(t).repartition(5), budget=64, range_size=range_size)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(got) == len(ids)
        for _, r in got.iterrows():
            nt, pid, poff = expected[r["doc_id"]]
            assert (r["n_tokens"], r["pack_id"], r["pack_offset"]) == (nt, pid, poff)


def test_pack_sequences_doc_straddles_boundary(ray_session):
    # doc 1 (5 tokens) starts at offset 3 in pack 0 and straddles into pack 1:
    # it belongs to the pack where it STARTS (GPT-style chunked stream)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "a b c d e", "x"]),
        }
    )
    got = pack_sequences(rd.from_arrow(t), budget=4, range_size=2).to_pandas().sort_values("doc_id")
    assert got["pack_id"].tolist() == [0, 0, 2]
    assert got["pack_offset"].tolist() == [0, 3, 0]


def test_mixture_rates_closed_form(ray_session):
    from movex_cdc_ray.functions.corpus import mixture_rates

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b", "c"]),
            "text": pa.array(["w w w w", "w w w w w w", "w w", ""]),
        }
    )
    # tokens: a=10, b=2, c=0
    out = mixture_rates(rd.from_arrow(t), {"a": 0.5, "b": 0.5}, token_budget=8)
    got = dict(zip(out["source"], out["rate"]))
    assert got["a"] == 0.4          # 0.5*8/10
    assert got["b"] == 1.0          # 0.5*8/2 clipped
    assert got["c"] == 0.0          # not targeted / zero tokens
    assert out["n_tokens"].tolist() == [10, 2, 0]


def test_bottom_k_sample_exact_size_and_growth_stable(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.corpus import bottom_k_sample

    small = rd.from_arrow(pa.table({"doc_id": list(range(500))})).repartition(4)
    s1 = bottom_k_sample(small, k=50).to_pandas()
    assert len(s1) == 50
    # growth stability: adding docs can only evict the largest hashes —
    # the new sample is a subset-or-rotation drawn from the superset
    big = rd.from_arrow(pa.table({"doc_id": list(range(1000))})).repartition(4)
    s2 = bottom_k_sample(big, k=50).to_pandas()
    assert len(s2) == 50
    assert s2["sample_hash"].max() <= s1["sample_hash"].max()
    # determinism
    s1b = bottom_k_sample(small, k=50).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s1b["doc_id"])


def test_bottom_k_partial_bounds_batch_output():
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.corpus import bottom_k_partial, bottom_k_sample

    ids = list(range(2000))
    # the scale invariant itself: a 2000-row batch folds to exactly k rows
    folded = bottom_k_partial(pa.table({"doc_id": ids}), k=25)
    assert len(folded) == 25
    # and the fold keeps the true bottom-k of ITS batch
    ref = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:25]
    assert sorted(folded["doc_id"].to_pylist()) == sorted(ref)
    # end-to-end across 8 blocks agrees with the single-batch reference
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(8)
    got = bottom_k_sample(ds, k=25).to_pandas()
    assert sorted(got["doc_id"]) == sorted(ref)


def test_quantile_sketch_close_to_exact(ray_session, tmp_path):
    # the KMV-sample quantile estimates track exact quantiles within the
    # uniform-sampling rank error (~1/sqrt(500) ≈ 4.5 percentile points)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.queries import events_quantile_sketch

    n = 20_000
    vals = np.sort(np.arange(n, dtype="float64"))  # uniform 0..n-1
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(np.arange(n), pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n), pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    got = events_quantile_sketch(str(d))
    for q, est in zip(got["q"], got["estimate"]):
        assert abs(est / n - q) < 0.06, (q, est)


def test_weighted_sample_es_properties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.corpus import weighted_sample_es

    # two weight classes: heavy docs (weight 100) vs light (weight 1)
    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "w": pa.array([100 if i % 2 == 0 else 1 for i in range(n)], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    got = weighted_sample_es(ds, k=200, weight_col="w").to_pandas()
    assert len(got) == 200
    heavy = (got["doc_id"] % 2 == 0).sum()
    # P(inclusion) ∝ weight: heavy docs should dominate the sample hard
    assert heavy > 170
    # deterministic
    again = weighted_sample_es(ds, k=200, weight_col="w").to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    # zero/negative weights can never be drawn
    t2 = pa.table(
        {"doc_id": pa.array(range(20), pa.int64()),
         "w": pa.array([0] * 10 + [1] * 10, pa.int64())}
    )
    g2 = weighted_sample_es(rd.from_arrow(t2), k=10, weight_col="w").to_pandas()
    assert (g2["doc_id"] >= 10).all()
    # ... even when positive-weight rows are SCARCER than k: the sample
    # shrinks rather than padding with weight-0 rows
    g3 = weighted_sample_es(rd.from_arrow(t2), k=15, weight_col="w").to_pandas()
    assert len(g3) == 10 and (g3["doc_id"] >= 10).all()


def test_sample_merge_equals_union_sample(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.corpus import (
        bottom_k_sample,
        merge_samples,
        weighted_sample_es,
    )

    a_ids, b_ids = list(range(0, 600)), list(range(600, 1100))
    ta = pa.table({"doc_id": a_ids, "w": [(i % 7) + 1 for i in a_ids]})
    tb = pa.table({"doc_id": b_ids, "w": [(i % 7) + 1 for i in b_ids]})
    tu = pa.concat_tables([ta, tb])

    # bottom-k: merge of per-shard samples == union sample
    sa = bottom_k_sample(rd.from_arrow(ta), k=40).to_pandas()
    sb = bottom_k_sample(rd.from_arrow(tb), k=40).to_pandas()
    su = bottom_k_sample(rd.from_arrow(tu), k=40).to_pandas()
    m = merge_samples([sa, sb], k=40)
    assert sorted(m["doc_id"]) == sorted(su["doc_id"])

    # E-S weighted: same property with the descending key
    wa = weighted_sample_es(rd.from_arrow(ta), k=40, weight_col="w").to_pandas()
    wb = weighted_sample_es(rd.from_arrow(tb), k=40, weight_col="w").to_pandas()
    wu = weighted_sample_es(rd.from_arrow(tu), k=40, weight_col="w").to_pandas()
    wm = merge_samples([wa, wb], k=40, key="es_key", ascending=False)
    assert sorted(wm["doc_id"]) == sorted(wu["doc_id"])


def test_cap_per_group_sharding_invariant_and_bounded(ray_session):
    from movex_cdc_ray.functions.corpus import cap_per_group

    t = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "source": pa.array([f"s{i % 3}" for i in range(300)], pa.string()),
        }
    )
    outs = []
    for nparts in (1, 4, 9):
        ds = rd.from_arrow(t).repartition(nparts)
        got = (
            cap_per_group(ds, cap=7, group_col="source")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
        assert (got.groupby("source").size() == 7).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    # a group smaller than the cap survives whole
    small = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "source": pa.array(["only"] * 3, pa.string()),
        }
    )
    got = cap_per_group(rd.from_arrow(small), cap=10, group_col="source").to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 2]


def test_chunk_documents_boundaries(ray_session):
    from movex_cdc_ray.functions.corpus import chunk_documents

    texts = ["a" * 10, "", None, "b" * 25]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        chunk_documents(rd.from_arrow(t), chunk_chars=8, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 0 (len 10): starts 0,4,8 -> lens 8,6,2; docs 1/2 empty -> none;
    # doc 3 (len 25): starts 0..24 step 4 -> 7 chunks
    d0 = got[got["doc_id"] == 0]
    assert d0["chunk_text"].tolist() == ["a" * 8, "a" * 6, "a" * 2]
    assert d0["n_chunk_chars"].tolist() == [8, 6, 2]
    assert (got["doc_id"] != 1).all() and (got["doc_id"] != 2).all()
    d3 = got[got["doc_id"] == 3]
    assert len(d3) == 7 and d3["n_chunk_chars"].tolist() == [8, 8, 8, 8, 8, 5, 1]


def test_quality_cut_per_group_median_low(ray_session):
    from movex_cdc_ray.functions.corpus import quality_cut_per_group

    # group a: scores 1..5 -> median-low = 3 -> keep {3,4,5}
    # group b: scores 10,20 -> median-low ((2+1)//2 = 1st) = 10 -> keep both
    scored = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(7), pa.int64()),
                "source": pa.array(["a"] * 5 + ["b"] * 2),
                "n_words": pa.array([5, 1, 4, 2, 3, 20, 10], pa.int64()),
            }
        )
    )
    out = quality_cut_per_group(scored).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2, 4, 5, 6]
    # tie flood: all-equal scores keep every row (threshold == the value)
    ties = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "source": pa.array(["a"] * 4),
                "n_words": pa.array([7, 7, 7, 7], pa.int64()),
            }
        )
    )
    assert len(quality_cut_per_group(ties).to_pandas()) == 4


def test_group_centroids_exact_means(ray_session):
    from movex_cdc_ray.functions.similarity import group_centroids

    vecs = pa.table(
        {
            "label": pa.array([0, 0, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        group_centroids(rd.from_arrow(vecs))
        .to_pandas()
        .sort_values(["label", "i"])
        .reset_index(drop=True)
    )
    assert out["label"].tolist() == [0, 0, 1, 1]
    assert out["i"].tolist() == [1, 2, 1, 2]  # 1-indexed (SQL subscripts parity)
    assert out["centroid_x"].tolist() == [2.0, 3.0, 10.0, 20.0]
    assert out["n_vecs"].tolist() == [2, 2, 1, 1]


def test_cap_per_group_block_split_invariant(ray_session):
    # the per-batch head-cap fold + one group re-trim must give the SAME
    # capped set regardless of how Ray splits the input into blocks
    from movex_cdc_ray.functions.corpus import cap_per_group

    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "source": pa.array([f"s{i % 7}" for i in range(300)]),
        }
    )

    def run(n_blocks):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = cap_per_group(ds, cap=5, group_col="source").to_pandas()
        return out.sort_values("doc_id")["doc_id"].tolist()

    one = run(1)
    assert run(4) == one and run(13) == one
    assert len(one) == 35  # 7 sources x cap 5


def test_empty_input_operators_no_crash(ray_session):
    # daily-delta pipelines hit genuinely empty inputs; every corpus
    # operator must stream them through as typed empties, not crash
    from movex_cdc_ray.functions import corpus as C
    from movex_cdc_ray.functions import sketch as S
    from movex_cdc_ray.functions import text as T

    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        )
    )
    assert len(C.quality_cut_per_group(empty, "doc_id").to_pandas()) == 0
    prof = S.corpus_profile(empty)
    assert len(prof["sample"]) == 0 and prof["approx_distinct"] == 0.0
    bm = T.bm25_topk(empty, {0: ["hash"]})
    assert list(bm.columns) == ["query_id", "doc_id", "rank", "score"] and len(bm) == 0
