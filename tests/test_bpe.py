"""BPE trainer value-lock: both iteration engines (driver-side and
vocab-Dataset) against an independent brute-force implementation, plus
sharding invariance. The driver correctness gate records text_bpe_merges
rows-only (iterative rewriting is not SQL-expressible) — THIS is its value
oracle."""

import re

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from movex_cdc_ray.functions.text import bpe_train
from tests.conftest import SF_DIR

WORD_RE = re.compile(r"[a-z0-9_]+")


def brute_force_bpe(texts: list[str], n_merges: int) -> pd.DataFrame:
    """Independent reference: plain dict/tuple BPE, no shared kernels."""
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in WORD_RE.findall((t or "").lower()):
            syms = tuple(list(w[:-1]) + [w[-1] + "</w>"])
            freqs[syms] = freqs.get(syms, 0) + 1
    rows = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in freqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best_n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == best_n)
        rows.append((rank, a, b, best_n))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in freqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        freqs = nxt
    return pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return t


def test_bpe_driver_engine_matches_brute_force(ray_session):
    t = _docs()
    got = bpe_train(rd.from_arrow(t), n_merges=25)
    exp = brute_force_bpe(t["text"].to_pylist(), 25)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 25  # corpus is rich enough for every merge


def test_bpe_dataset_engine_matches_driver_engine(ray_session):
    t = _docs().slice(0, 120)
    ds = rd.from_arrow(t).repartition(5)  # force multi-block iteration state
    via_dataset = bpe_train(ds, n_merges=12, vocab_driver_limit=1)
    via_driver = bpe_train(rd.from_arrow(t), n_merges=12)
    pd.testing.assert_frame_equal(via_dataset, via_driver)


def test_bpe_sharding_invariance(ray_session):
    t = _docs()
    one = bpe_train(rd.from_arrow(t), n_merges=10)
    many = bpe_train(rd.from_arrow(t).repartition(7), n_merges=10)
    pd.testing.assert_frame_equal(one, many)


from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcz", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_bpe_property_matches_brute_force(ray_session, texts):
    import pyarrow as pa

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = bpe_train(rd.from_arrow(t), n_merges=6)
    exp = brute_force_bpe(texts, 6)
    pd.testing.assert_frame_equal(got, exp)


def brute_force_encode(texts, merges):
    rows = []
    for i, t in enumerate(texts):
        pieces = []
        for w in WORD_RE.findall((t or "").lower()):
            s = list(w[:-1]) + [w[-1] + "</w>"]
            for _, a, b, _n in merges.itertuples(index=False):
                out, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        out.append(a + b); j += 2
                    else:
                        out.append(s[j]); j += 1
                s = out
            pieces.extend(s)
        rows.append((i, len(pieces)))
    return rows


def test_bpe_encode_matches_brute_force(ray_session):
    import hashlib

    t = _docs().slice(0, 150)
    texts = t["text"].to_pylist()
    from movex_cdc_ray.functions.text import bpe_encode

    merges = brute_force_bpe(texts, 15)
    got = bpe_encode(rd.from_arrow(t), merges).to_pandas().sort_values("doc_id")
    exp = brute_force_encode(texts, merges)
    assert got["n_bpe_tokens"].tolist() == [n for _, n in exp]
    # more tokens merge away as ranks apply: sanity vs raw char count
    assert (got["n_bpe_tokens"] > 0).all()


def test_bpe_encode_fewer_tokens_with_more_merges(ray_session):
    t = _docs().slice(0, 150)
    from movex_cdc_ray.functions.text import bpe_encode

    m5 = bpe_train(rd.from_arrow(t), n_merges=5)
    m25 = bpe_train(rd.from_arrow(t), n_merges=25)
    n5 = bpe_encode(rd.from_arrow(t), m5).to_pandas()["n_bpe_tokens"].sum()
    n25 = bpe_encode(rd.from_arrow(t), m25).to_pandas()["n_bpe_tokens"].sum()
    assert n25 < n5
