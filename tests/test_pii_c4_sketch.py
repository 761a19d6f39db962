"""PII scrubbing, C4 line filtering and HyperLogLog sketch operators."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from movex_cdc_ray.functions.sketch import (
    HllPartialStage,
    _bit_length_u32,
    approx_distinct,
    hll_estimate,
    hll_registers,
)
from movex_cdc_ray.functions.text import C4LineFilter, PiiScrubber


def test_pii_scrubber_counts_and_redaction():
    batch = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail alice@example.com and bob.smith+x@sub.domain.org today",
                "server at 192.168.0.1 and 10.0.0.255, call +1-555-123-4567",
                "nothing sensitive here",
            ],
        }
    )
    out = PiiScrubber()(batch)
    assert out["n_emails"].tolist() == [2, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0]
    assert out["n_phones"].tolist() == [0, 1, 0]
    assert out["scrubbed"][0] == "mail <EMAIL> and <EMAIL> today"
    assert out["scrubbed"][1] == "server at <IP> and <IP>, call <PHONE>"
    assert out["scrubbed"][2] == "nothing sensitive here"


def test_pii_scrubber_version_like_numbers_not_ips():
    # \b guards: a 4-part dotted string inside a word is still matched only
    # on digit boundaries; 3-part version strings never match
    out = PiiScrubber()(pd.DataFrame({"text": ["v1.2.3 released, api 1.2.3.4 live"]}))
    assert out["n_ipv4"].tolist() == [1]
    assert out["scrubbed"][0] == "v1.2.3 released, api <IP> live"


def test_c4_line_filter_rules():
    doc = "\n".join(
        [
            "This line is long enough and ends with a period.",
            "too short.",
            "this long line has plenty of words but no terminal punctuation",
            '"A quoted sentence with enough words to pass the filter."',
            "",
        ]
    )
    out = C4LineFilter()(pd.DataFrame({"text": [doc, "keep {code} away. " * 6]}))
    assert out["n_lines_total"].tolist() == [5, 1]
    # 2nd doc's line survives line rules (strip removes the trailing space);
    # it is excluded by the DOC-level drop flag, which callers filter on
    assert out["n_lines_kept"].tolist() == [2, 1]
    assert not out["c4_doc_drop"][0]
    assert out["c4_doc_drop"][1]  # curly brace -> doc drop
    kept = out["cleaned"][0].split("\n")
    assert kept == [
        "This line is long enough and ends with a period.",
        '"A quoted sentence with enough words to pass the filter."',
    ]


def test_c4_lorem_ipsum_drop():
    out = C4LineFilter()(pd.DataFrame({"text": ["Fine text. Lorem Ipsum dolor."]}))
    assert out["c4_doc_drop"].tolist() == [True]


def _reference_registers(values, p=8):
    regs = {}
    for v in values:
        dig = hashlib.md5(v.encode()).digest()
        bucket = ((dig[0] << 8) | dig[1]) >> (16 - p)
        suffix = int.from_bytes(dig[2:6], "big")
        rank = 33 - suffix.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def test_bit_length_u32_exact():
    xs = np.array([0, 1, 2, 3, 7, 8, 255, 256, 2**16 - 1, 2**16, 2**31, 2**32 - 1], dtype=np.uint32)
    assert _bit_length_u32(xs).tolist() == [int(v).bit_length() for v in xs]


def test_hll_registers_match_reference(ray_session):
    values = [f"doc-{i % 700}" for i in range(3000)]  # 700 distinct, many dups
    ds = rd.from_arrow(pa.table({"text": values})).repartition(4)
    got = hll_registers(ds, "text", p=8).to_pandas().sort_values("bucket")
    ref = _reference_registers(sorted(set(values)))
    assert dict(zip(got["bucket"], got["max_rank"])) == ref


def test_hll_merge_invariance(ray_session):
    # registers are max-mergeable: sketching two halves separately and
    # max-merging equals sketching the union (the multi-day composition)
    a = [f"a-{i}" for i in range(400)]
    b = [f"b-{i}" for i in range(400)] + a[:100]
    ra = hll_registers(rd.from_arrow(pa.table({"text": a})), "text").to_pandas()
    rb = hll_registers(rd.from_arrow(pa.table({"text": b})), "text").to_pandas()
    merged = (
        pd.concat([ra, rb]).groupby("bucket", as_index=False)["max_rank"].max()
    )
    ru = hll_registers(rd.from_arrow(pa.table({"text": a + b})), "text").to_pandas()
    assert dict(zip(merged["bucket"], merged["max_rank"])) == dict(
        zip(ru["bucket"], ru["max_rank"])
    )


def test_hll_estimate_accuracy(ray_session):
    true_n = 5000
    ds = rd.from_arrow(pa.table({"text": [f"item-{i}" for i in range(true_n)]})).repartition(4)
    est = approx_distinct(ds, "text", p=8)
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - true_n) / true_n < 0.20


def test_hll_nulls_skipped(ray_session):
    ds = rd.from_arrow(pa.table({"text": pa.array(["x", None, "y", None], pa.string())}))
    regs = hll_registers(ds, "text").to_pandas()
    assert dict(zip(regs["bucket"], regs["max_rank"])) == _reference_registers(["x", "y"])


def test_hll_partial_stage_bounds_output():
    # a 10k-row batch folds to at most 2^p partial rows
    t = pa.table({"text": [f"r{i}" for i in range(10_000)]})
    out = HllPartialStage("text", p=8)(t)
    assert len(out) <= 256
    est = hll_estimate(out.to_pandas().rename(columns={"rank": "max_rank"}), 8)
    assert abs(est - 10_000) / 10_000 < 0.20


def _ref_bigram_scores(texts, sample_mod=5, alpha=0.1):
    import math
    import re as _re

    wre = _re.compile(r"[a-z0-9_]+")
    toks = [wre.findall(t.lower()) for t in texts]
    train = [ts for i, ts in enumerate(toks) if i % sample_mod == 0]
    c2, c1, vocab = {}, {}, set()
    for ts in train:
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    out = []
    for ts in toks:
        bigr = list(zip(ts, ts[1:]))
        if not bigr:
            out.append((0, 0.0))
            continue
        nll = [
            -math.log((c2.get(p, 0) + alpha) / (c1.get(p[0], 0) + alpha * v))
            for p in bigr
        ]
        out.append((len(bigr), round(sum(nll) / len(nll), 6)))
    return out


def test_bigram_lm_scores_match_reference(ray_session):
    from movex_cdc_ray.functions.text import bigram_lm_scores

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cat and dog and cat",
        "one",
        "",
        "the cat sat again and again on the mat",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    got = (
        bigram_lm_scores(ds, sample_mod=2, alpha=0.1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference model trains on docs 0, 2, 4 (doc_id % 2 == 0)
    ref = _ref_bigram_scores(texts, sample_mod=2)
    assert got["n_bigrams"].tolist() == [r[0] for r in ref]
    assert got["avg_nll"].tolist() == pytest.approx([r[1] for r in ref], abs=1e-6)
    # a training doc scores itself lower (more likely) than an unseen-word doc
    assert got["avg_nll"][0] < got["avg_nll"][1]


def test_bigram_lm_min_count_prunes(ray_session):
    from movex_cdc_ray.functions.text import bigram_lm_scores

    texts = ["a b a b a b", "a b c"] * 3
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    full = bigram_lm_scores(ds, sample_mod=1, alpha=0.1).to_pandas().set_index("doc_id")
    pruned = (
        bigram_lm_scores(ds, sample_mod=1, alpha=0.1, min_count=4)
        .to_pandas()
        .set_index("doc_id")
    )
    # pruning drops the rare (b,c) bigram (count 3 < 4): docs containing it
    # fall back to the alpha numerator and score strictly worse (the
    # documented approximation direction); note surviving bigrams may score
    # BETTER because the c1 marginal shrinks with the pruned table
    assert pruned["avg_nll"][1] > full["avg_nll"][1]
    assert pruned["n_bigrams"].tolist() == full["n_bigrams"].tolist()


def test_count_min_never_undercounts(ray_session):
    from movex_cdc_ray.functions.sketch import count_min_query, count_min_sketch

    texts = ["apple banana apple", "banana cherry", "apple date elderberry fig"] * 20
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    cells = count_min_sketch(ds, "text").to_pandas()
    est = count_min_query(cells, ["apple", "banana", "cherry", "zebra"])
    assert est["apple"] >= 60 and est["banana"] >= 40 and est["cherry"] >= 20
    # w=1024 >> vocab here, so collisions are unlikely: estimates are exact
    assert est["apple"] == 60
    # absent tokens can only over-count (collision), never appear negative
    assert est["zebra"] >= 0


def test_count_min_sum_mergeable(ray_session):
    from movex_cdc_ray.functions.sketch import count_min_sketch

    a = ["red green blue"] * 5
    b = ["green yellow"] * 3
    ca = count_min_sketch(rd.from_arrow(pa.table({"text": a})), "text").to_pandas()
    cb = count_min_sketch(rd.from_arrow(pa.table({"text": b})), "text").to_pandas()
    merged = (
        pd.concat([ca, cb]).groupby(["row", "col"], as_index=False)["n"].sum()
    )
    cu = count_min_sketch(rd.from_arrow(pa.table({"text": a + b})), "text").to_pandas()
    key = lambda df: dict(zip(zip(df["row"], df["col"]), df["n"]))  # noqa: E731
    assert key(merged) == key(cu)


def test_pii_scrubber_ascii_only_digits():
    # RE2 parity: \d/\b must not match Unicode digits (arabic-indic,
    # fullwidth) — the DuckDB oracle would count 0 for these
    out = PiiScrubber()(
        pd.DataFrame({"text": ["server at ١٢٣.٤٥.٦٧.٨٩ up", "call +１-555-123-4567"]})
    )
    assert out["n_ipv4"].tolist() == [0, 0]
    assert out["n_phones"].tolist() == [0, 0]
    assert (out["scrubbed"] == out["text"]).all()


def test_range_join_null_value_contributes_nothing(ray_session, tmp_path):
    # a NULL event value must neither crash the cents cast nor poison sums
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.queries import events_range_join

    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": ["click"] * 3,
            "value": pa.array([10.0, None, 30.0], pa.float64()),
            "props": ["{}"] * 3,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    got = events_range_join(str(d))
    band0 = got[got["band_id"] == 0].iloc[0]  # [0, 50): events 10 and 30
    assert band0["n_events"] == 2 and band0["sum_value_cents"] == 4000


def test_hll_grouped_matches_per_group_reference(ray_session):
    from movex_cdc_ray.functions.sketch import hll_estimate, hll_registers_grouped

    rows = [(f"g{i % 3}", f"doc-{i % 500}") for i in range(2000)]
    ds = rd.from_arrow(
        pa.table({"source": [r[0] for r in rows], "text": [r[1] for r in rows]})
    ).repartition(4)
    got = hll_registers_grouped(ds, "text", "source").to_pandas()
    for g in ("g0", "g1", "g2"):
        vals = sorted({t for s, t in rows if s == g})
        ref = _reference_registers(vals)
        sub = got[got["source"] == g]
        assert dict(zip(sub["bucket"], sub["max_rank"])) == ref
        est = hll_estimate(sub.rename(columns={"max_rank": "max_rank"}), 8)
        assert abs(est - len(vals)) / len(vals) < 0.25


def test_corpus_profile_one_scan_matches_unfused(ray_session):
    from movex_cdc_ray.functions.corpus import bottom_k_sample
    from movex_cdc_ray.functions.sketch import (
        approx_distinct,
        corpus_profile,
        count_min_sketch,
    )

    texts = [f"token{i % 37} filler words for doc {i % 211}" for i in range(1500)]
    t = pa.table({"doc_id": pa.array(range(1500), pa.int64()), "text": texts})
    ds = rd.from_arrow(t).repartition(5)

    prof = corpus_profile(ds, k=60)
    # HLL estimate identical to the standalone path
    assert prof["approx_distinct"] == approx_distinct(ds, "text")
    # count-min cells identical
    cells = count_min_sketch(ds, "text").to_pandas()
    key = lambda df: dict(zip(zip(df["row"], df["col"]), df["n"]))  # noqa: E731
    assert key(prof["cms_cells"]) == key(cells)
    # bottom-k sample identical ids, text_chars carried through
    bk = bottom_k_sample(ds, k=60).to_pandas()
    assert sorted(prof["sample"]["doc_id"]) == sorted(bk["doc_id"])
    lens = dict(zip(t["doc_id"].to_pylist(), (len(x) for x in texts)))
    assert all(lens[d] == c for d, c in zip(prof["sample"]["doc_id"], prof["sample"]["text_chars"]))


def test_hll_grouped_null_group_forms_its_own_group(ray_session):
    from movex_cdc_ray.functions.sketch import hll_registers_grouped

    t = pa.table(
        {
            "source": pa.array(["a", None, "a", None], pa.string()),
            "text": ["t1", "t2", "t3", "t4"],
        }
    )
    got = hll_registers_grouped(rd.from_arrow(t), "text", "source").to_pandas()
    a = got[got["source"] == "a"]
    nul = got[got["source"].isna()]
    assert dict(zip(a["bucket"], a["max_rank"])) == _reference_registers(["t1", "t3"])
    assert dict(zip(nul["bucket"], nul["max_rank"])) == _reference_registers(["t2", "t4"])


def test_bloom_no_false_negatives_and_mergeable(ray_session):
    from movex_cdc_ray.functions.sketch import bloom_build, bloom_probe

    vals = [f"value-{i}" for i in range(400)]
    t = pa.table(
        {"doc_id": pa.array(range(400), pa.int64()), "text": pa.array(vals)}
    )
    ds = rd.from_arrow(t).repartition(4)
    words = bloom_build(ds, "text", m_bits=1 << 14, k_hashes=4)
    # no false negatives: every built value probes True
    got = bloom_probe(ds, words, "text", m_bits=1 << 14, k_hashes=4).to_pandas()
    assert got["maybe_member"].all()
    # mergeable: OR of shard filters == filter of the union
    w1 = bloom_build(rd.from_arrow(t.slice(0, 200)), "text", m_bits=1 << 14)
    w2 = bloom_build(rd.from_arrow(t.slice(200)), "text", m_bits=1 << 14)
    assert np.array_equal(np.bitwise_or(w1, w2), words)
    # null text probes False
    tn = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array([None], pa.string())}
    )
    gn = bloom_probe(rd.from_arrow(tn), words, "text", m_bits=1 << 14).to_pandas()
    assert not gn["maybe_member"].iloc[0]


def test_grouped_hll_shard_merge_invariance(ray_session):
    # per-group registers merge across shards exactly like the ungrouped
    # ones: max-merging two shards' grouped registers == one-shot registers
    from movex_cdc_ray.functions.sketch import hll_registers_grouped

    def tbl(lo, hi):
        return pa.table(
            {
                "text": pa.array([f"t-{i % 300}" for i in range(lo, hi)]),
                "source": pa.array([f"s{i % 3}" for i in range(lo, hi)]),
            }
        )

    ra = hll_registers_grouped(rd.from_arrow(tbl(0, 500)), "text", "source").to_pandas()
    rb = hll_registers_grouped(rd.from_arrow(tbl(500, 900)), "text", "source").to_pandas()
    merged = (
        pd.concat([ra, rb])
        .groupby(["source", "bucket"], as_index=False)["max_rank"]
        .max()
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    ru = (
        hll_registers_grouped(rd.from_arrow(tbl(0, 900)), "text", "source")
        .to_pandas()
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, ru, check_dtype=False)


def test_group_centroids_shard_merge_invariance(ray_session):
    # (sum, n) partials are sum-mergeable: merging two shards' partial
    # folds equals the one-shot centroid table (multi-day composition)
    import numpy as np

    from movex_cdc_ray.functions.similarity import CentroidPartialStage, group_centroids

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    labels = (np.arange(200) % 4).astype(np.int32)

    def tbl(sl):
        return pa.table(
            {
                "label": pa.array(labels[sl], pa.int32()),
                "embedding": pa.array(list(vecs[sl]), pa.list_(pa.float32())),
            }
        )

    stage = CentroidPartialStage()
    parts = pd.concat(
        [stage(tbl(slice(0, 120))).to_pandas(), stage(tbl(slice(120, 200))).to_pandas()]
    )
    merged = parts.groupby(["label", "i"], as_index=False)[["s", "n"]].sum()
    merged["centroid_x"] = np.round(merged["s"] / merged["n"], 6)
    one_shot = (
        group_centroids(rd.from_arrow(tbl(slice(0, 200))))
        .to_pandas()
        .sort_values(["label", "i"])
        .reset_index(drop=True)
    )
    m = merged.sort_values(["label", "i"]).reset_index(drop=True)
    assert m["n"].tolist() == one_shot["n_vecs"].tolist()
    # float64 partial sums: shard split changes addition order by ~1e-12,
    # far inside the 1e-6 rounding quantum
    np.testing.assert_allclose(
        m["centroid_x"].to_numpy(), one_shot["centroid_x"].to_numpy(), atol=2e-6, rtol=0
    )
