"""Text analysis + dedup operator tests (training-data extensions)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from movex_cdc_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    embedding_neardup_pairs,
    exact_dedup_keep_first,
    jaccard,
    minhash_lsh_buckets,
    ngram_jaccard_exact,
    ngram_jaccard_pairs,
)
from movex_cdc_ray.functions.text import Fingerprinter, LangIdStage, QualityScorer, TokenCounter


def docs(rows):
    return rd.from_arrow(pa.table({"doc_id": list(range(len(rows))), "text": rows}))


def test_token_counter():
    t = pa.table({"doc_id": [0, 1], "text": ["one two three", "hello"]})
    out = TokenCounter()(t)
    assert out["n_tokens"].to_pylist() == [3, 1]
    assert out["n_bpe_tokens"].to_pylist() == [3, 1]


def test_quality_scorer():
    df = pd.DataFrame({"doc_id": [0], "text": ["the cat and THE dog!"]})
    out = QualityScorer()(df)
    assert out["n_words"][0] == 5
    assert out["stopword_ratio"][0] == pytest.approx(0.6)  # the, and, the
    assert out["punct_ratio"][0] > 0
    assert out["upper_ratio"][0] > 0


def test_repetition_scorer():
    from movex_cdc_ray.functions.text import RepetitionScorer

    rep = "spam spam spam spam spam spam spam spam spam spam"  # 10x "spam"
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "aa\nbb\naa\naa",          # line 'aa' x3 of 4 lines
                rep,                        # one dominant 2-gram + dup 5-grams
                "all distinct lines\nno repeats here",
                "",                         # empty doc
            ],
        }
    )
    out = RepetitionScorer()(df.copy())
    r0 = out.iloc[0]
    assert r0["n_lines"] == 4
    # 4 lines, 2 distinct -> 2 repeated occurrences beyond the first
    assert r0["dup_line_frac"] == pytest.approx(0.5)
    # excess chars = 2 extra 'aa' occurrences x 2 chars / 8 total line chars
    assert r0["dup_line_char_frac"] == pytest.approx(0.5)
    r1 = out.iloc[1]
    # top 2-gram "spam spam" occurs 9x (overlapping), 8 word chars per hit,
    # over 40 total word chars
    assert r1["top_2gram_char_frac"] == pytest.approx(round(9 * 8 / 40, 6))
    # all 6 distinct-position 5-grams are the same duplicated gram: 6 hits x
    # 20 word chars / 40
    assert r1["dup_5gram_char_frac"] == pytest.approx(round(6 * 20 / 40, 6))
    r3 = out.iloc[3]
    assert r3["n_lines"] == 1 and r3["n_words_rep"] == 0
    assert r3["top_2gram_char_frac"] == 0.0


def test_repetition_scorer_matches_oracle_on_crafted_docs():
    """The SQL oracle and the stage must agree on multi-line / repetitive
    docs the sf fixtures don't contain (their texts are single-line)."""
    import duckdb

    from movex_cdc_ray.functions.text import RepetitionScorer
    from movex_cdc_ray.pipelines.queries import ORACLE_SQL

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "x\ny\nx\nz\nx\n",
                "a b a b a b a b a b c d e f g h",
                "one two three four five one two three four five six",
                "tie tie bar bar",  # 2-gram tie: 'tie tie','tie bar','bar bar'
                "",
            ],
        }
    )
    got = RepetitionScorer()(df.copy())
    cols = ["doc_id", "n_lines", "n_words_rep", "dup_line_frac",
            "dup_line_char_frac", "top_2gram_char_frac", "dup_5gram_char_frac"]
    got = got[cols].sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.sql(ORACLE_SQL["text_repetition"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_langid_heuristic():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the cat is in the house and it is warm",
                "el gato es de la casa y los perros",
                "zzz qqq www",
            ],
        }
    )
    out = LangIdStage()(df)
    assert out["pred_lang"].tolist() == ["en", "es", "und"]


def test_fingerprinter_stable_and_edit_robust():
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["Hello World ", "hello world", "different entirely"]})
    out = Fingerprinter()(df)
    # normalization: case/strip-insensitive md5
    assert out["fingerprint_md5"][0] == out["fingerprint_md5"][1]
    assert out["fingerprint_md5"][0] != out["fingerprint_md5"][2]
    assert out["fingerprint_rolling"][0] == out["fingerprint_rolling"][1]


def test_exact_dedup_keep_first(ray_session):
    ds = docs(["aaa", "bbb", "aaa", "aaa", "ccc"])
    out = exact_dedup_keep_first(ds).take_all()
    by_count = sorted((r["dup_count"], r["keep_id"]) for r in out)
    assert by_count == [(1, 1), (1, 4), (3, 0)]


def test_jaccard_and_minhash_similarity():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tonight"
    c = "completely unrelated words about database systems and storage engines"
    assert jaccard(a, a) == 1.0
    assert jaccard(a, b) > 0.5 > jaccard(a, c)
    mh = MinHasher()
    sig_a, sig_b, sig_c = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sig_a == sig_b).mean()
    sim_ac = (sig_a == sig_c).mean()
    assert sim_ab > sim_ac  # minhash agreement approximates jaccard


def test_minhash_lsh_finds_near_dups(ray_session):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    near = base.replace("woods", "forest")
    ds = docs([base, near, "totally different content about ray data pipelines", "more unrelated text here"])
    buckets = minhash_lsh_buckets(ds).take_all()
    assert len(buckets) > 0  # the near-dup pair shares at least one band
    pairs = ngram_jaccard_pairs(ds, threshold=0.5)
    assert [(0, 1)] == list(zip(pairs["a_id"], pairs["b_id"]))


def test_ngram_jaccard_exact_matches_reference(ray_session):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    near = base.replace("woods", "forest")
    texts = [base, near, "totally different content about ray data pipelines", base]
    ds = docs(texts)
    out = ngram_jaccard_exact(ds, threshold=0.5)
    got = list(zip(out["a_id"], out["b_id"]))
    assert got == [(0, 1), (0, 3), (1, 3)]
    # exact value: the inverted-index count must equal the set-based jaccard
    for (a, b), jc in zip(got, out["jac"]):
        assert jc == pytest.approx(round(jaccard(texts[a], texts[b]), 6), abs=1e-9)
    assert out["jac"].iloc[1] == 1.0  # identical docs


def test_ngram_jaccard_exact_max_df_drops_stop_shingles(ray_session):
    # four identical docs: every shingle has df=4; max_df=3 suppresses all pairs
    ds = docs(["alpha beta gamma delta epsilon"] * 4)
    assert len(ngram_jaccard_exact(ds, threshold=0.5)) == 6
    assert len(ngram_jaccard_exact(ds, threshold=0.5, max_df=3)) == 0


def test_ngram_jaccard_exact_short_and_empty_docs(ray_session):
    # <k words → one shingle of the whole text; empty/whitespace docs excluded
    ds = docs(["tiny doc", "tiny doc", "   ", ""])
    out = ngram_jaccard_exact(ds, threshold=0.5)
    assert list(zip(out["a_id"], out["b_id"], out["jac"])) == [(0, 1, 1.0)]


def test_simhash_hamming_locality():
    sh = SimHasher()
    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("dog", "cat")
    far = "completely different topic matter entirely unrelated " * 4
    h_base, h_near, h_far = sh.simhash(base), sh.simhash(near), sh.simhash(far)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(h_base, h_near) < ham(h_base, h_far)


def test_embedding_neardup_blockwise(ray_session):
    rng = np.random.default_rng(3)
    v0 = rng.standard_normal(16)
    vecs = [v0, v0 + 0.01 * rng.standard_normal(16), rng.standard_normal(16)]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.95)
    assert list(zip(pairs["a_id"], pairs["b_id"])) == [(0, 1)]


def test_embedding_neardup_distributed_tiles_multi_block(ray_session):
    # force several blocks so cross-block (off-diagonal) tiles are exercised
    # and verify against a local numpy all-pairs oracle
    rng = np.random.default_rng(11)
    n, dim = 40, 8
    mat = rng.standard_normal((n, dim))
    mat[7] = mat[3] + 0.01 * rng.standard_normal(dim)   # near-dup across blocks
    mat[25] = mat[24] + 0.01 * rng.standard_normal(dim)  # near-dup within block
    t = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat], pa.list_(pa.float32())),
        }
    )
    got = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.9, rows_per_block=10)
    m32 = mat.astype(np.float32).astype(np.float64)
    m = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = m @ m.T
    ii, jj = np.where(np.triu(sims >= 0.9, k=1))
    exp = sorted(zip(ii.tolist(), jj.tolist()))
    assert list(zip(got["a_id"], got["b_id"])) == exp
    assert (3, 7) in exp and (24, 25) in exp


def test_embedding_neardup_never_materializes_corpus(ray_session, monkeypatch):
    # scale canary: the exact near-dup path must not collect the corpus on
    # the driver (VERDICT r1 item 4)
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(20)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, rng.standard_normal(4))) for _ in range(20)],
                pa.list_(pa.float32()),
            ),
        }
    )
    def boom(self, *a, **k):
        raise AssertionError("driver-side take_all() in exact embedding dedup")
    monkeypatch.setattr(rd.Dataset, "take_all", boom)
    pairs = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.99, rows_per_block=8)
    assert {"a_id", "b_id", "cosine"} <= set(pairs.columns)


def test_ngram_jaccard_pairs_hot_bucket_cap(ray_session):
    """A degenerate band bucket (many identical docs) must not fan out O(d²)
    verifies when max_bucket is set — the LSH analog of max_df."""
    hot = ["identical boilerplate text repeated across the corpus many times"] * 12
    ds = docs(hot + ["totally different content about ray data pipelines"])
    exact = ngram_jaccard_pairs(ds, threshold=0.5)
    assert len(exact) == 12 * 11 // 2  # all identical pairs found uncapped
    capped = ngram_jaccard_pairs(ds, threshold=0.5, max_bucket=8)
    assert len(capped) == 0  # the hot bucket (12 docs) is skipped entirely


def test_ngram_jaccard_pairs_cap_keeps_small_buckets(ray_session):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    near = base.replace("woods", "forest")
    ds = docs([base, near, "totally different content about ray data pipelines"])
    out = ngram_jaccard_pairs(ds, threshold=0.5, max_bucket=8)
    assert list(zip(out["a_id"], out["b_id"])) == [(0, 1)]  # small buckets unaffected


def test_ngram_jaccard_pairs_ship_paths_identical(ray_session):
    """ship='pairs' (the 100 TB shape: id-only band shuffle, one text pass)
    must produce exactly the ship='text' pairs."""
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base + " tail", "completely different words here entirely",
             base.replace("quick", "slow"), "short", base]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(3)
    a = ngram_jaccard_pairs(ds, threshold=0.4, ship="text")
    b = ngram_jaccard_pairs(ds, threshold=0.4, ship="pairs")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert len(a) > 0  # the near-dup family must actually pair up


def test_winnow_substring_pairs_detects_shared_runs(ray_session):
    from movex_cdc_ray.functions.dedup import WinnowStage, substring_dup_pairs

    shared = "the quick brown fox jumps over the lazy dog near the river bank"  # 13 words
    texts = [
        "intro words here " + shared + " and a unique tail",
        shared + " totally different continuation of this document",
        "no overlap with anything else in this corpus at all whatsoever",
        "another completely unrelated document with its own words only",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}))
    got = substring_dup_pairs(ds, n=8, s=4).to_pandas()
    # docs 0 and 1 share a 13-word run >= n+s-1=11 -> guaranteed pair
    assert [(0, 1)] == list(zip(got["doc_a"], got["doc_b"]))
    assert (got["n_shared"] >= 1).all()

    # winnow fold bounds: selected fingerprints <= gram count, distinct
    stage = WinnowStage(n=8, s=4)
    sel = stage(pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": texts}))
    assert not sel.duplicated().any()
    assert set(sel["doc_id"]) <= {0, 1, 2, 3}


def test_winnow_no_false_pairs_without_shared_grams(ray_session):
    from movex_cdc_ray.functions.dedup import substring_dup_pairs

    texts = [f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h w{i}i w{i}j w{i}k w{i}l" for i in range(6)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(6)), "text": texts}))
    got = substring_dup_pairs(ds, n=8, s=4).to_pandas()
    assert len(got) == 0  # equal fingerprints require equal 8-grams


def test_winnow_hot_bucket_cap(ray_session):
    from movex_cdc_ray.functions.dedup import substring_dup_pairs

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    texts = [f"unique{i} " + boiler for i in range(10)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(10)), "text": texts}))
    capped = substring_dup_pairs(ds, n=8, s=4, max_bucket=5).to_pandas()
    full = substring_dup_pairs(ds, n=8, s=4, max_bucket=64).to_pandas()
    assert len(full) == 45  # 10-doc clique
    assert len(capped) == 0  # boilerplate bucket (10 docs) > cap 5 dropped


def test_minhash_incremental_matches_batch_restriction(ray_session):
    # incremental (bucket-state CDC replay) must equal the batch LSH
    # pipeline restricted to pairs involving a new doc; epoch 2 costs only
    # the new docs' band rows; a re-run resumes as a no-op
    from movex_cdc_ray.pipelines.queries import (
        _minhash_inc_config,
        dedup_minhash_incremental,
    )
    from movex_cdc_ray.pipelines.replay import replay

    import pyarrow.parquet as _pq

    got = dedup_minhash_incremental("/root/testdata/sf0.001")
    assert list(got.columns) == ["a_id", "b_id", "jac"]
    # cutoff from the DOCUMENTS table, not from the result (a result-derived
    # threshold could never catch an old-old pair leaking through)
    max_doc = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pandas().max()
    cutoff = int(max_doc + 1) * 4 // 5
    assert got.empty or (got["b_id"] >= cutoff).all()
    # exactly-once: the replay the query ran is resumable — re-running on
    # the same stream/lake applies nothing
    rep = replay("/tmp/movex_mhinc/stream", "/tmp/movex_mhinc/lake",
                 _minhash_inc_config(), chunks_per_epoch=1)
    assert rep.epochs == 0


def test_minhash_incremental_update_retires_stale_buckets(ray_session, tmp_path):
    # a document EDIT in incremental LSH = tombstone its old band rows +
    # insert the new ones + update DOCS — the CDC engine's D/U ops make
    # stateful dedup maintenance exact, which append-only LSH state can't do
    import os

    import pyarrow.parquet as pq

    from movex_cdc_ray.functions.dedup import MinHasher
    from movex_cdc_ray.pipelines.queries import _minhash_inc_config
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay

    mh = MinHasher()
    stride = mh.bands + 4

    def band_rows(doc_id, text):
        sig = mh(pd.DataFrame({"doc_id": [doc_id], "text": [text]}))
        return [int(np.uint64(sig[f"band_{i}"][0])) for i in range(mh.bands)]

    def events(rows):
        # rows: list of (id, table_id, op, band_id, band_hash, doc_id, text)
        cols = list(zip(*rows))
        return pa.table(
            {
                "id": pa.array(cols[0], pa.int64()),
                "table_id": pa.array(cols[1], pa.int32()),
                "op": pa.array(cols[2], pa.string()),
                "dbuser": pa.array(["t"] * len(rows)),
                "txn_id": pa.nulls(len(rows), pa.string()),
                "created_at": pa.array([0] * len(rows), pa.timestamp("us")),
                "retry_count": pa.array([0] * len(rows), pa.int32()),
                "new_band_id": pa.array(cols[3], pa.int64()),
                "new_band_hash": pa.array([str(h) if h is not None else None for h in cols[4]], pa.string()),
                "new_doc_id": pa.array(cols[5], pa.int64()),
                "new_text": pa.array(cols[6], pa.string()),
                # D events must key on the OLD image (the row being retired)
                "old_band_id": pa.array(cols[3], pa.int64()),
                "old_band_hash": pa.array([str(h) if h is not None else None for h in cols[4]], pa.string()),
                "old_doc_id": pa.array(cols[5], pa.int64()),
                "old_text": pa.nulls(len(rows), pa.string()),
            }
        )

    t0 = "alpha beta gamma delta epsilon zeta eta theta"
    t1 = "completely different words nothing shared here at all"
    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    os.makedirs(stream)

    # epoch 1: docs 0 (t0) and 1 (t1) — no near-dups
    rows = []
    for d, txt in ((0, t0), (1, t1)):
        for bi, bh in enumerate(band_rows(d, txt)):
            rows.append((d * stride + bi + 1, 1, "I", bi, bh, d, None))
        rows.append((d * stride + mh.bands + 1, 2, "I", 0, None, d, txt))
    pq.write_table(events(rows), os.path.join(stream, "chunk_000000.parquet"))

    # epoch 2: doc 1 is EDITED to equal t0 -> D its old band rows, I the new
    base = 10 * stride
    rows, old_bands, new_bands = [], band_rows(1, t1), band_rows(1, t0)
    for bi, bh in enumerate(old_bands):
        rows.append((base + bi + 1, 1, "D", bi, bh, 1, None))
    for bi, bh in enumerate(new_bands):
        rows.append((base + mh.bands + bi + 1, 1, "I", bi, bh, 1, None))
    rows.append((base + 2 * mh.bands + 1, 2, "U", 0, None, 1, t0))
    pq.write_table(events(rows), os.path.join(stream, "chunk_000001.parquet"))

    replay(stream, lake, _minhash_inc_config(num_partitions=4), chunks_per_epoch=1)
    lp = lake_to_pandas(lake)
    bands = lp[lp["_table_id"] == 1]
    doc1 = bands[bands["doc_id"] == 1]
    # stale band rows tombstoned, new rows live: doc 1 now shares EVERY
    # bucket with doc 0 (identical text -> identical signature)
    assert len(doc1) == mh.bands
    assert set(doc1["band_hash"]) == set(str(h) for h in band_rows(0, t0))
    docs_tbl = lp[lp["_table_id"] == 2]
    assert docs_tbl.set_index("doc_id")["text"][1] == t0


def test_semantic_dup_pairs_cluster_local(ray_session):
    from movex_cdc_ray.functions.dedup import semantic_dup_pairs

    # two tight clusters around orthogonal axes + one lone vector; near-dup
    # pairs must appear only inside a cluster, with exact round-6 cosines
    rng = np.random.default_rng(7)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    # interleave the two clusters so the first-k init sees both (k-means
    # init = first sample rows by id); even ids = A, odd ids = B
    vecs = [
        (base_a if i % 2 == 0 else base_b) + rng.normal(0, 0.01, 4)
        for i in range(12)
    ]
    vecs.append(np.array([0.0, 0.0, 1.0, 0.0]))
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    got = semantic_dup_pairs(ds, threshold=0.9, n_centroids=2, sample_rows=100)
    pairs = set(zip(got["a_id"], got["b_id"]))
    # every within-cluster pair found, no cross-cluster pair, singleton alone
    evens = [i for i in range(12) if i % 2 == 0]
    odds = [i for i in range(12) if i % 2 == 1]
    expect_a = {(a, b) for a in evens for b in evens if a < b}
    expect_b = {(a, b) for a in odds for b in odds if a < b}
    assert pairs == expect_a | expect_b
    assert (got["cosine"] >= 0.9).all()
    # deterministic across runs
    again = semantic_dup_pairs(ds, threshold=0.9, n_centroids=2, sample_rows=100)
    pd.testing.assert_frame_equal(got, again)


def test_semantic_dup_pairs_hot_cell_split_is_exact(ray_session):
    """Round-5 hot-cell guard: a skewed embedding space (one cell holding
    ~85% of docs) is split into triangle tiles so no single map_groups
    task owns the whole O(cell²) comparison — and the split is EXACT:
    pair output is byte-identical to the uncapped single-task path."""
    from movex_cdc_ray.functions.dedup import semantic_dup_pairs

    rng = np.random.default_rng(11)
    hot = np.array([1.0, 0.0, 0.0, 0.0])
    cold = np.array([0.0, 1.0, 0.0, 0.0])
    # 100 near-identical hot-cluster docs (the dedup target), 18 cold;
    # interleave every 6th so first-k init sees both clusters
    vecs = [
        (cold if i % 6 == 5 else hot) + rng.normal(0, 0.01, 4)
        for i in range(108)
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    kw = dict(threshold=0.9, n_centroids=2, sample_rows=100)
    capped = semantic_dup_pairs(ds, max_cell_rows=16, **kw)  # hot cell → ~6 blocks
    uncapped = semantic_dup_pairs(ds, max_cell_rows=1_000_000, **kw)
    pd.testing.assert_frame_equal(capped, uncapped)
    # the skew really exercised the tiled path: far more pairs than the cap
    hot_ids = [i for i in range(108) if i % 6 != 5]
    assert len(capped) >= len(hot_ids) * (len(hot_ids) - 1) // 4  # dense hot cell


def test_normalized_dedup_collapses_trivial_variants(ray_session):
    from movex_cdc_ray.functions.dedup import normalized_dedup_keep_first

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "Hello, World!",
                    "  hello   world  ",
                    "HELLO-WORLD",
                    "something else",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    out = (
        normalized_dedup_keep_first(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("keep_id")
        .reset_index(drop=True)
    )
    # docs 0/1/2 normalize identically; 3 unique; null text keeps a null-hash group
    row = out[out["keep_id"] == 0].iloc[0]
    assert row["dup_count"] == 3
    assert out[out["keep_id"] == 3].iloc[0]["dup_count"] == 1
    assert out["norm_md5"].isna().sum() == 1


def test_passage_dup_stats_counts_shared_windows(ray_session):
    from movex_cdc_ray.functions.dedup import passage_dup_stats

    shared = "x" * 12  # one full window at chunk_chars=12
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [shared + "unique-tail-aa", shared + "different-bb", "all original"],
                pa.string(),
            ),
        }
    )
    out = (
        passage_dup_stats(rd.from_arrow(t).repartition(3), chunk_chars=12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {r.doc_id: (r.n_passages, r.n_dup_passages) for r in out.itertuples()}
    assert got[0] == (3, 1) and got[1] == (2, 1) and got[2] == (1, 0)


def test_bm25_topk_ranks_and_sentinels(ray_session):
    import ray.data as rd

    from movex_cdc_ray.functions.text import bm25_topk

    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(
                [
                    "hash join hash join hash",   # dense in both terms
                    "hash join",                  # both terms, shorter-but-padded below
                    "hash only here with filler words to lengthen the document",
                    "nothing relevant at all",
                ]
            ),
        }
    )
    out = bm25_topk(rd.from_arrow(docs), {0: ["hash", "join"]}, k=3)
    assert out["query_id"].tolist() == [0, 0, 0]
    # doc 3 has no query term and must be absent; doc 0 outranks the rest
    assert 3 not in set(out["doc_id"])
    assert out.iloc[0]["doc_id"] == 0 and out.iloc[0]["rank"] == 1
    assert (out["score"] > 0).all()
    # sentinel regression guard: the stats fold must keep n_docs and
    # n_tokens distinct (pandas factorize merges NUL-prefixed keys)
    assert out["score"].is_monotonic_decreasing


def test_tfidf_simjoin_identical_docs_cosine_one(ray_session):
    from movex_cdc_ray.functions.text import tfidf_simjoin

    out = tfidf_simjoin(
        docs(["alpha beta gamma delta", "alpha beta gamma delta",
              "totally different words here"]),
        threshold=0.5,
    )
    assert out[["a_id", "b_id"]].values.tolist() == [[0, 1]]
    assert out["cosine"].iloc[0] == pytest.approx(1.0)


def test_tfidf_simjoin_no_shared_shingle_no_pair(ray_session):
    from movex_cdc_ray.functions.text import tfidf_simjoin

    out = tfidf_simjoin(
        docs(["one two three four", "five six seven eight"]), threshold=0.0
    )
    assert out.empty
    assert list(out.columns) == ["a_id", "b_id", "cosine"]


def test_tfidf_simjoin_matches_numpy_dense(ray_session):
    """Hand-check: cosine over IDF-weighted distinct-3-shingle vectors."""
    import numpy as np

    from movex_cdc_ray.functions.text import tfidf_simjoin

    texts = [
        "the quick brown fox jumps over",
        "the quick brown fox sleeps all day",
        "a quick brown fox jumps over fences",
    ]
    out = tfidf_simjoin(docs(texts), threshold=0.0, max_df=20)

    # dense reference
    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = [shingles(t) for t in texts]
    vocab = sorted(set().union(*sets))
    df = {s: sum(s in ss for ss in sets) for s in vocab}
    n = len(texts)
    vecs = []
    for ss in sets:
        v = np.array([np.log(n / df[s]) if s in ss else 0.0 for s in vocab])
        vecs.append(v / np.linalg.norm(v))
    exp = {}
    for a in range(n):
        for b in range(a + 1, n):
            # a pair exists iff the docs SHARE a kept shingle — even when
            # every shared shingle has idf ln(n/n)=0 and the cosine is 0.0
            if sets[a] & sets[b]:
                exp[(a, b)] = round(float(vecs[a] @ vecs[b]), 6)
    got = {(r.a_id, r.b_id): r.cosine for r in out.itertuples()}
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], abs=1e-6)


def test_tfidf_simjoin_max_df_drops_universal_shingles(ray_session):
    from movex_cdc_ray.functions.text import tfidf_simjoin

    # the only shared shingle appears in all 3 docs; max_df=2 excludes it,
    # leaving no common coordinate -> no pairs at all
    texts = [
        "common shared phrase plus aaa",
        "common shared phrase plus bbb",
        "common shared phrase plus ccc",
    ]
    none = tfidf_simjoin(docs(texts), threshold=0.0, max_df=2)
    assert none.empty
    some = tfidf_simjoin(docs(texts), threshold=0.0, max_df=3)
    assert len(some) == 3  # all pairs share the df-3 shingles


def test_tfidf_simjoin_short_docs_whole_text_shingle(ray_session):
    from movex_cdc_ray.functions.text import tfidf_simjoin

    # < k words: the whole doc is the single shingle (ngram_jaccard rules)
    out = tfidf_simjoin(docs(["tiny doc", "tiny doc", "other"]), threshold=0.5)
    assert out[["a_id", "b_id"]].values.tolist() == [[0, 1]]
    assert out["cosine"].iloc[0] == pytest.approx(1.0)


def test_tfidf_simjoin_id_over_31_bits_raises(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.text import tfidf_simjoin

    big = rd.from_arrow(
        pa.table({"doc_id": pa.array([1 << 31], pa.int64()), "text": ["x y z w"]})
    )
    with pytest.raises(Exception) as ei:
        tfidf_simjoin(big, threshold=0.0)
    assert "31 bits" in str(ei.value)


def test_tfidf_simjoin_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from movex_cdc_ray.functions.text import tfidf_simjoin

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = tfidf_simjoin(empty)
    assert out.empty and list(out.columns) == ["a_id", "b_id", "cosine"]


def _gopher(rows, **kw):
    from movex_cdc_ray.functions.text import GopherRulesFilter

    return GopherRulesFilter(**kw)(
        pd.DataFrame({"doc_id": range(len(rows)), "text": rows})
    )


def test_gopher_rules_clean_doc_keeps():
    good = "the cat and dog have that with be to of word " * 5
    out = _gopher([good], min_words=30)
    assert bool(out["keep"][0])


def test_gopher_rules_each_rule_fires():
    base = "the cat and dog have that with be to of word " * 5  # passes all
    cases = {
        "r_word_count": "the be short",
        "r_mean_len": "a b c d e f g h i j " * 6 + "the be",  # mean < 3
        "r_symbol": base + "#" * 40,
        "r_bullets": "\n".join(["- item"] * 9 + [base]),
        "r_ellipsis": "\n".join([base + "..."] * 4 + [base] * 6),
        "r_alpha": base + " ".join(["123"] * 20),
        "r_stop": "cat dog bird fish mouse horse goat lion " * 8,
    }
    out = _gopher(list(cases.values()), min_words=30)
    for i, rule in enumerate(cases):
        assert not out[rule][i], rule
        other = [r for r in out.columns if r.startswith("r_") and r != rule]
        # the crafted doc violates ONLY its target rule
        assert out.loc[i, other].all(), (rule, out.loc[i, other])
        assert not out["keep"][i]


def test_gopher_rules_empty_and_null_text():
    out = _gopher(["", None], min_words=30)
    assert not out["keep"].any()
    assert (out["n_words"] == 0).all()
    assert (out["n_lines"] == 1).all()  # ''.split('\n') -> ['']
