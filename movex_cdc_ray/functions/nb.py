"""Distributed multinomial Naive Bayes over the documents table — the
fasttext-shaped quality/domain classifier a training-data pipeline runs to
label or filter web text (reference analog: the per-table config registry
compiles to a per-row decision the same way a trained weight table does).

Training is one corpus scan: per-batch (label, token) partial counts
(vocabulary-sized, never token-stream-sized) fold through ONE coarse
token-hash bucket groupby with a vectorized pandas sum inside — the same
pattern `functions/corpus.py:top_tokens` uses, extended with the label key.
The vocabulary cut (top-V by corpus frequency, ties token-asc) happens on
the AGGREGATED vocabulary via Ray sort+limit, so no token stream and no
whole-vocab table ever reaches the driver; only the V selected tokens do.

Scoring is embarrassingly parallel: the (V × C) int64 weight matrix is
driver-built from the V×C count table (driver-sized by construction),
broadcast once, and each batch does one searchsorted + bincount + integer
matmul. All score arithmetic is int64 (weights are `floor(1e6·ln(p))`
fixed-point), so scores are associative, re-partitioning-proof, and the
DuckDB oracle is hash-exact: ln() on identical IEEE doubles through the
same platform libm yields identical doubles, and everything after the
floor is integer.

Tokenization is the ASCII class `[a-z0-9_]+` over lowercased text on BOTH
sides (Python `\\w` is Unicode-aware, RE2's is not — the explicit class
removes that divergence on accented text).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

NB_TOKEN_RE = r"[a-z0-9_]+"
NB_SCALE = 1_000_000  # fixed-point log scale: floor(SCALE * ln(p))
_NB_BUCKETS = 64  # coarse token-hash co-location buckets for the count fold

_COUNT_SCHEMA = {
    "source": pa.string(),
    "token": pa.string(),
    "n": pa.int64(),
}


def _empty_counts(with_bucket: bool = False) -> pa.Table:
    cols = {k: pa.array([], t) for k, t in _COUNT_SCHEMA.items()}
    if with_bucket:
        cols["tb"] = pa.array([], pa.int64())
    return pa.table(cols)


def nb_token_counts(
    ds: rd.Dataset, label_col: str = "source", text_col: str = "text"
) -> rd.Dataset:
    """(label, token, n) occurrence counts, one corpus scan + one coarse
    bucket fold. Full vocabulary — callers cut it afterwards."""
    pat = re.compile(NB_TOKEN_RE)

    def partial_counts(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.findall(pat)
        df = pd.DataFrame(
            {
                "source": b[label_col].repeat(toks.str.len()).to_numpy(),
                "token": np.concatenate(
                    [np.array(t, dtype=object) for t in toks]
                )
                if len(b)
                else np.array([], dtype=object),
            }
        )
        if df.empty:
            return _empty_counts(with_bucket=True)
        agg = df.groupby(["source", "token"], as_index=False).size()
        # bucket by token only (not label): a token's rows for every label
        # land in one group, so the fold emits each (label, token) once
        tb = np.fromiter(
            (zlib.crc32(t.encode()) & (_NB_BUCKETS - 1) for t in agg["token"]),
            dtype=np.int64,
            count=len(agg),
        )
        return pa.table(
            {
                "source": pa.array(agg["source"].astype(str), pa.string()),
                "token": pa.array(agg["token"].astype(str), pa.string()),
                "n": pa.array(agg["size"].to_numpy(), pa.int64()),
                "tb": pa.array(tb, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["source", "token"], as_index=False)["n"].sum()
        return pa.table(
            {
                "source": pa.array(agg["source"].astype(str), pa.string()),
                "token": pa.array(agg["token"].astype(str), pa.string()),
                "n": pa.array(agg["n"].to_numpy(), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("tb")
        .map_groups(fold, batch_format="pandas")
    )


def nb_train(
    ds: rd.Dataset,
    label_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 128,
) -> pd.DataFrame:
    """Vocab-restricted (label, token, n) count table (the trained model's
    sufficient statistics), V×C rows — driver-sized by construction.

    The vocabulary is the top-``vocab_size`` tokens by CORPUS frequency
    (ties token-asc), selected with a Ray sort+limit over the aggregated
    per-token totals; the count table is then filtered to it."""
    counts = nb_token_counts(ds, label_col=label_col, text_col=text_col)

    vocab_rows = (
        counts.groupby("token")
        .aggregate(Sum("n", alias_name="tot"))
        .sort(["tot", "token"], descending=[True, False])
        .limit(vocab_size)
        .take(vocab_size)
    )
    vocab = np.sort(np.array([r["token"] for r in vocab_rows], dtype=str))
    vocab_ref = ray.put(vocab)

    def in_vocab(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        toks = np.asarray(b["token"].to_pandas(), dtype=str)
        return b.filter(pa.array(np.isin(toks, v), pa.bool_()))

    out = counts.map_batches(in_vocab, batch_format="pyarrow").to_pandas()
    # post-fold blocks are vocabulary-sized; the V×C result is tiny
    return (
        out.sort_values(["source", "token"]).reset_index(drop=True)
    )


def nb_weights(
    counts: pd.DataFrame, class_docs: pd.DataFrame, vocab_size: int
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-point NB parameters from the sufficient statistics.

    Returns (classes_sorted, vocab_sorted, W[V,C] int64, prior[C] int64)
    with w(t,c) = floor(SCALE·ln((n_tc+1)/(tot_c+V))) and
    prior(c) = floor(SCALE·ln(docs_c/total_docs)) — Laplace smoothing over
    the restricted vocabulary, so every (token, class) cell is defined."""
    import math

    classes = sorted(class_docs["source"].astype(str))
    docs = dict(
        zip(class_docs["source"].astype(str), class_docs["n_docs"].astype(int))
    )
    vocab = np.array(sorted(counts["token"].astype(str).unique()), dtype=object)
    v_ix = {t: i for i, t in enumerate(vocab)}
    c_ix = {c: j for j, c in enumerate(classes)}
    cnt = np.zeros((len(vocab), len(classes)), dtype=np.int64)
    for s, t, n in counts[["source", "token", "n"]].itertuples(index=False):
        cnt[v_ix[str(t)], c_ix[str(s)]] = int(n)
    tot = cnt.sum(axis=0)  # per-class token mass over the vocab
    W = np.empty_like(cnt)
    for j in range(len(classes)):
        den = float(tot[j] + vocab_size)
        for i in range(len(vocab)):
            W[i, j] = math.floor(NB_SCALE * math.log((cnt[i, j] + 1) / den))
    total_docs = sum(docs.values())
    prior = np.array(
        [
            math.floor(NB_SCALE * math.log(docs[c] / total_docs))
            for c in classes
        ],
        dtype=np.int64,
    )
    return classes, vocab, W, prior


class NBScoreStage:
    """Actor-pool scorer: the broadcast model is fetched and unpacked once
    per actor (__init__), each batch is searchsorted + bincount + one int64
    matmul — no Python token loop in the scoring path."""

    def __init__(self, model_ref, text_col: str = "text"):
        classes, vocab, W, prior = ray.get(model_ref)
        self.classes = np.array(classes, dtype=object)
        self.vocab = vocab.astype(str)
        self.W = W
        self.prior = prior
        self.pat = re.compile(NB_TOKEN_RE)
        self.text_col = text_col

    def __call__(self, b: pd.DataFrame) -> pa.Table:
        toks = b[self.text_col].fillna("").str.lower().str.findall(self.pat)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = (
            np.concatenate([np.array(t, dtype=object) for t in toks])
            if len(b)
            else np.array([], dtype=object)
        )
        doc_ix = np.repeat(np.arange(len(b)), lens)
        pos = np.searchsorted(self.vocab, flat.astype(str))
        pos = np.clip(pos, 0, len(self.vocab) - 1)
        hit = self.vocab[pos] == flat.astype(str)
        V = len(self.vocab)
        counts = np.bincount(
            doc_ix[hit] * V + pos[hit], minlength=len(b) * V
        ).reshape(len(b), V)
        scores = counts @ self.W + self.prior[None, :]  # int64-exact
        pred = np.argmax(scores, axis=1)  # first max = class-asc tie-break
        return pa.table(
            {
                "doc_id": pa.array(
                    b["doc_id"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "pred_source": pa.array(self.classes[pred], pa.string()),
                "score": pa.array(
                    scores[np.arange(len(b)), pred], pa.int64()
                ),
            }
        )


def nb_classify(
    ds: rd.Dataset,
    label_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 128,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Train on ``ds`` then score every row: (doc_id, pred_source, score)."""
    counts = nb_train(
        ds, label_col=label_col, text_col=text_col, vocab_size=vocab_size
    )
    # per-class doc totals: tiny aggregate over a 1-column projection
    cd = (
        ds.select_columns([label_col])
        .groupby(label_col)
        .count()
        .to_pandas()
        .rename(columns={label_col: "source", "count()": "n_docs"})
    )
    model = nb_weights(counts, cd, vocab_size)
    model_ref = ray.put(model)
    from ._pool import pool_size

    # pool_size leaves CPU headroom so the actor pool can't starve the
    # upstream read and deadlock the streaming executor on small sessions
    return ds.map_batches(
        NBScoreStage,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency if concurrency is not None else pool_size(4),
    )
