"""Perceptual-hash image dedup + edit-distance similarity join.

Unit-level value locks for the two kernels (aHash bit derivation, the
pair-axis Levenshtein DP, FastSS completeness) plus end-to-end checks of the
fixture's planted near-dups. Oracle parity runs in test_queries_oracle.py.
"""

import random

import numpy as np
import pandas as pd
import pytest

from movex_cdc_ray.functions.dedup import (
    deletion_keys,
    editdistance_join,
    levenshtein_pairs,
    slug_matrix,
)
from movex_cdc_ray.functions.multimodal import (
    PHashStage,
    ahash_bands,
    decode_bmp,
    encode_bmp,
    encode_ppm,
    hamming_from_bands,
    synth_phash_media_table,
)


def _brute_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(dp[j] + 1, nd[-1] + 1, dp[j - 1] + (ca != cb)))
        dp = nd
    return dp[-1]


# ---------------------------------------------------------------------------
# aHash
# ---------------------------------------------------------------------------


def test_ahash_cross_container_invariance():
    rng = np.random.Generator(np.random.PCG64(5))
    px = rng.integers(0, 256, size=(12, 18, 3), dtype=np.uint8)
    t = synth_phash_media_table(4)
    stage = PHashStage()
    import pyarrow as pa

    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([encode_bmp(px), encode_ppm(px)], pa.binary()),
        }
    )
    out = stage(batch)
    b = np.stack([out[f"b{i}"].to_numpy() for i in range(4)], axis=1)
    # the same pixels hash identically through either codec (BMP's bottom-up
    # BGR storage is normalized by the decoder before hashing)
    assert (b[0] == b[1]).all()
    assert tuple(b[0]) == ahash_bands(decode_bmp(encode_bmp(px)))
    assert len(stage(batch.slice(0, 0))) == 0  # empty-batch schema stability


def test_ahash_mean_rule_integer_exact():
    # constant image: no lum is strictly above the mean -> all bits 0
    px = np.full((12, 16, 3), 77, dtype=np.uint8)
    assert ahash_bands(px) == (0, 0, 0, 0)
    # one bright grid cell -> exactly one bit set
    px2 = px.copy()
    px2[0, 0] = 255
    bands = ahash_bands(px2)
    assert sum(int(b).bit_count() for b in bands) == 1
    with pytest.raises(ValueError):
        ahash_bands(np.zeros((4, 4, 3), dtype=np.uint8))


def test_phash_fixture_plants_neardups():
    t = synth_phash_media_table(12, seed=42)
    out = PHashStage()(t)
    ids = out["media_id"].to_numpy()
    b = np.stack([out[f"b{i}"].to_numpy() for i in range(4)], axis=1)
    idx = {int(m): i for i, m in enumerate(ids)}
    for base in range(0, 12, 3):  # near-dup copies stay within a few bits
        ham = hamming_from_bands(b[idx[base]][None, :], b[idx[1000 + base]][None, :])[0]
        assert ham <= 6


# ---------------------------------------------------------------------------
# Levenshtein DP + FastSS filter
# ---------------------------------------------------------------------------


def test_levenshtein_pairs_matches_bruteforce():
    random.seed(11)
    strs = ["".join(random.choice("abcde") for _ in range(random.randint(0, 12))) for _ in range(40)]
    pairs = [(a, b) for a in strs for b in strs]
    A, la = slug_matrix(np.array([p[0] for p in pairs], object), 20)
    B, lb = slug_matrix(np.array([p[1] for p in pairs], object), 20)
    got = levenshtein_pairs(A, la, B, lb)
    want = np.array([_brute_lev(a, b) for a, b in pairs])
    assert (got == want).all()


def test_fastss_deletion_keys_complete_for_k2():
    random.seed(3)
    strs = ["".join(random.choice("ab") for _ in range(random.randint(0, 7))) for _ in range(50)]
    mat, _ = slug_matrix(np.array(strs, object), 20)
    kl = deletion_keys(mat, 2)
    keysets = [set(int(k[i]) for k in kl) for i in range(len(strs))]
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _brute_lev(strs[i], strs[j]) <= 2:
                assert keysets[i] & keysets[j], (strs[i], strs[j])


def test_editdistance_join_end_to_end(ray_session):
    slugs = ["alpha beta", "alpha bxta", "alpha bxt", "gamma delta",
             "gamma delta", "unrelated thing", ""]
    pdf = pd.DataFrame({"id": np.arange(len(slugs), dtype=np.int64), "s": slugs})
    got = editdistance_join(pdf, k=2, width=20)
    want = sorted(
        (i, j, _brute_lev(slugs[i], slugs[j]))
        for i in range(len(slugs))
        for j in range(i + 1, len(slugs))
        if _brute_lev(slugs[i], slugs[j]) <= 2
    )
    assert list(map(tuple, got[["id_a", "id_b", "ed"]].to_numpy())) == want


# ---------------------------------------------------------------------------
# keyword tagging + PMI collocations (unit level; oracle parity in
# test_queries_oracle.py)
# ---------------------------------------------------------------------------


def test_pmi_partials_respect_doc_boundaries():
    from movex_cdc_ray.functions.text import pmi_bigram_partials

    b = pd.DataFrame({"text": ["the cat sat", "the cat ran", None, ""]})
    out = pmi_bigram_partials(b)
    grams = set(out["gram"])
    assert "the cat" in grams and "cat sat" in grams
    assert "sat the" not in grams  # would cross the doc boundary
    assert int(out.set_index("gram").loc["the cat", "c"]) == 2
    assert pmi_bigram_partials(pd.DataFrame({"text": [None, ""]})).empty


def test_pmi_ratio_is_exact_integer_division(ray_session):
    import ray.data as rd

    from movex_cdc_ray.functions.text import pmi_bigrams

    pdf = pd.DataFrame({"text": ["a b a b a b c", "a b d", "x y"] * 5})
    out = pmi_bigrams(rd.from_pandas(pdf), min_count=5, k=10)
    row = out[out["bigram"] == "a b"].iloc[0]
    # N=60 tokens, B=45 bigrams, c_ab=20, c_a=20, c_b=20:
    # ratio = 20*60*60 / (45*20*20) = 4.0 exactly
    assert row["c_xy"] == 20
    assert row["ratio"] == 4.0


# ---------------------------------------------------------------------------
# property tests (hypothesis, derandomized like test_property_based.py)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_DET = settings(derandomize=True, max_examples=60, deadline=None)

_ASCII = st.text(alphabet="abcde _", max_size=20)


@_DET
@given(st.lists(_ASCII, min_size=2, max_size=12))
def test_property_levenshtein_pairs(strs):
    pairs = [(a, b) for a in strs for b in strs]
    A, la = slug_matrix(np.array([p[0] for p in pairs], object), 20)
    B, lb = slug_matrix(np.array([p[1] for p in pairs], object), 20)
    got = levenshtein_pairs(A, la, B, lb)
    want = np.array([_brute_lev(a, b) for a, b in pairs])
    assert (got == want).all()


@_DET
@given(st.lists(_ASCII, min_size=2, max_size=10))
def test_property_fastss_complete(strs):
    mat, _ = slug_matrix(np.array(strs, object), 20)
    kl = deletion_keys(mat, 2)
    keysets = [set(int(k[i]) for k in kl) for i in range(len(strs))]
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _brute_lev(strs[i], strs[j]) <= 2:
                assert keysets[i] & keysets[j]


@_DET
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_property_ahash_codec_invariance(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    h, w = int(rng.integers(8, 20)), int(rng.integers(8, 28))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    from movex_cdc_ray.functions.multimodal import decode_ppm, encode_ppm

    assert ahash_bands(decode_bmp(encode_bmp(px))) == ahash_bands(px)
    assert ahash_bands(decode_ppm(encode_ppm(px))) == ahash_bands(px)
    # exactly the strict-mean rule, bit for bit
    lum = px.astype(np.int64) @ np.array([299, 587, 114])
    from movex_cdc_ray.functions.multimodal import resize_nearest

    grid = resize_nearest(lum, 8, 8)
    bits = (64 * grid.ravel() > grid.sum())
    want = tuple(
        int((np.where(bits, np.int64(1) << (np.arange(64) % 16), 0)).reshape(4, 16)[i].sum())
        for i in range(4)
    )
    assert ahash_bands(px) == want


@_DET
@given(st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=6))
def test_property_segment_triu_indices(m):
    import itertools

    from movex_cdc_ray.functions.scalar import segment_triu_indices

    gi, gj, sp = segment_triu_indices(np.array(m, dtype=np.int64))
    want, off = set(), 0
    for s, length in enumerate(m):
        want |= {(off + i, off + j, s) for i, j in itertools.combinations(range(length), 2)}
        off += length
    assert set(zip(gi.tolist(), gj.tolist(), sp.tolist())) == want
    assert len(gi) == len(want)


def test_deletion_keys_composed_equals_naive_rehash():
    from movex_cdc_ray.functions.dedup import _poly_hash_rows

    random.seed(5)
    strs = ["".join(random.choice("abcdefgh ") for _ in range(random.randint(0, 20)))
            for _ in range(120)]
    mat, _ = slug_matrix(np.array(strs, object), 20)
    got = deletion_keys(mat, 2)
    # naive reference: re-hash each column-subset variant
    w = mat.shape[1]
    want = [_poly_hash_rows(mat)]
    for d1 in range(w):
        cols1 = [j for j in range(w) if j != d1]
        sub1 = mat[:, cols1]
        want.append(_poly_hash_rows(sub1))
        for d2x in range(len(cols1)):
            if cols1[d2x] <= d1:
                continue
            want.append(_poly_hash_rows(np.delete(sub1, d2x, axis=1)))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a == b).all()


def test_editdistance_join_scale_stress(ray_session):
    """5k strings with planted typos — a size where the all-pairs brute
    force (12.5M DPs) is no longer the test harness: completeness is
    asserted on the planted pairs, soundness by re-verifying every emitted
    pair with the DP directly."""
    import ray.data as rd

    rng = np.random.default_rng(77)
    base = ["".join(chr(97 + c) for c in rng.integers(0, 26, size=18)) for _ in range(4000)]
    rows = [(i, s) for i, s in enumerate(base)]
    planted = []
    for i in range(0, 4000, 8):  # one planted typo per 8 strings
        s = base[i]
        p = int(rng.integers(0, len(s)))
        typo = s[:p] + "q" + s[p + 1 :]
        rows.append((100_000 + i, typo))
        planted.append((i, 100_000 + i))
    pdf = pd.DataFrame({"id": [r[0] for r in rows], "s": [r[1] for r in rows]})
    got = editdistance_join(pdf, k=2, width=20)
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    for a, b in planted:  # completeness on planted typos (ed == 1 unless s[p]=='q')
        assert (a, b) in pairs
    # soundness: every emitted pair really is within ed <= 2
    lut = dict(zip(pdf["id"], pdf["s"]))
    for a, b, ed in got.itertuples(index=False):
        assert _brute_lev(lut[a], lut[b]) == ed <= 2
