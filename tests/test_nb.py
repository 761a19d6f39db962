"""Naive Bayes classifier: vectorized scoring stage vs a per-doc brute
force, and training-count correctness on a hand-built corpus (the
end-to-end queries are oracle-checked in test_queries_oracle.py)."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from movex_cdc_ray.functions.nb import (
    NB_SCALE,
    NB_TOKEN_RE,
    NBScoreStage,
    nb_classify,
    nb_train,
    nb_weights,
)

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "alpha beta beta gamma",
            "alpha alpha beta",
            "delta epsilon delta",
            "delta delta epsilon epsilon",
            "beta delta",
            "",  # tokenless doc must still get a prior-only prediction
        ],
        "source": ["news", "news", "web", "web", "web", "news"],
    }
)


def _brute_predict(docs: pd.DataFrame, vocab_size: int):
    pat = re.compile(NB_TOKEN_RE)
    toks = {
        d: pat.findall(t.lower()) for d, t in zip(docs["doc_id"], docs["text"])
    }
    from collections import Counter

    all_toks = Counter(t for ts in toks.values() for t in ts)
    vocab = sorted(
        all_toks, key=lambda t: (-all_toks[t], t)
    )[:vocab_size]
    vset = set(vocab)
    classes = sorted(docs["source"].unique())
    cnt = {
        c: Counter(
            t
            for d, ts in toks.items()
            for t in ts
            if t in vset
            and docs.set_index("doc_id")["source"][d] == c
        )
        for c in classes
    }
    ndocs = docs["source"].value_counts().to_dict()
    total = len(docs)
    preds = {}
    for d, ts in toks.items():
        best = None
        for c in classes:
            tot = sum(cnt[c].values())
            pw = math.floor(NB_SCALE * math.log(ndocs[c] / total))
            s = pw + sum(
                math.floor(
                    NB_SCALE
                    * math.log((cnt[c][t] + 1) / (tot + vocab_size))
                )
                for t in ts
                if t in vset
            )
            # classes iterate ascending, so strict > implements the
            # (score desc, class asc) tie-break
            if best is None or s > best[0]:
                best = (s, c)
        preds[d] = best
    return preds


def test_nb_matches_bruteforce(ray_session):
    ds = rd.from_pandas(DOCS)
    out = nb_classify(ds, vocab_size=8).to_pandas().set_index("doc_id")
    brute = _brute_predict(DOCS, vocab_size=8)
    for d, (score, cls) in brute.items():
        assert out.loc[d, "pred_source"] == cls, d
        assert int(out.loc[d, "score"]) == score, d


def test_nb_train_counts_exact(ray_session):
    ds = rd.from_pandas(DOCS)
    cnt = nb_train(ds, vocab_size=8)
    got = {
        (s, t): n for s, t, n in cnt[["source", "token", "n"]].itertuples(index=False)
    }
    assert got[("news", "alpha")] == 3
    assert got[("news", "beta")] == 3
    assert got[("web", "delta")] == 5
    assert got[("web", "epsilon")] == 3
    assert ("news", "delta") not in got or got[("news", "delta")] == 0


def test_nb_vocab_cut_binds(ray_session):
    # vocab_size=2 keeps only the 2 most frequent tokens (delta=6, beta=4)
    ds = rd.from_pandas(DOCS)
    cnt = nb_train(ds, vocab_size=2)
    assert set(cnt["token"]) == {"delta", "beta"}
