"""Text analysis stages for large-scale training-data pipelines.

These go beyond the reference's operator set (which never inspects payload
content) and cover the text side of a 100 TB corpus pipeline: language ID,
quality scoring, token counting, document fingerprinting. Every stage is a
callable CLASS for ``map_batches(Cls, concurrency=N)`` — regexes and tables
compile once per actor in ``__init__`` (never per batch), bodies are
vectorized pandas/numpy/pyarrow.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .scalar import round_half_away

# small per-language stopword profiles for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "los"},
    "fr": {"le", "la", "de", "et", "un", "les", "des", "en", "du", "est"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "zu"},
}


class TokenCounter:
    """Whitespace + BPE-ish token counts per document.

    ``n_tokens``: whitespace tokens (SQL-oracle-checkable).
    ``n_bpe_tokens``: pieces from a GPT-2-style pre-tokenizer regex — an
    upper-bound proxy for BPE token count without a vocab."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # public GPT-2 pre-tokenizer pattern (simplified, no unicode classes)
        self.bpe_re = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # vectorized whitespace token count
        n_tokens = pc.add(pc.count_substring(text, pattern=" "), 1)
        n_tokens = pc.if_else(pc.equal(pc.utf8_length(text), 0), pa.scalar(0, pa.int32()), n_tokens.cast(pa.int32()))
        # Series.str.count runs the compiled regex in pandas' C loop — same
        # non-overlapping match count as findall, without materializing the
        # match lists just to len() them
        s = text.to_pandas().fillna("")
        n_bpe = s.str.count(self.bpe_re).astype("int64")
        out = batch.append_column("n_chars", pc.utf8_length(text).cast(pa.int64()))
        out = out.append_column("n_tokens", n_tokens.cast(pa.int64()))
        return out.append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))


class QualityScorer:
    """Heuristic quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio — the usual pre-training filters."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.punct_re = re.compile(r"[^\w\s]")
        self.word_re = re.compile(r"[a-z']+")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n_chars = t.str.len()
        words = t.str.lower().str.findall(self.word_re)
        n_words = words.str.len().clip(lower=0)
        batch["n_chars_q"] = n_chars.astype("int64")
        batch["n_words"] = n_words.astype("int64")
        batch["punct_ratio"] = round_half_away(
            t.str.count(self.punct_re) / n_chars.replace(0, 1)
        )
        # per-word reductions vectorized: one explode, then C-loop isin /
        # str.len + an index-grouped mean — no per-row Python lambda. Rows
        # with zero words reindex back in as 0.0.
        ex = words.explode()
        ex = ex[ex.notna()]
        grouped_stop = ex.isin(self.stop).groupby(level=0).mean()
        grouped_len = ex.str.len().groupby(level=0).mean()
        batch["stopword_ratio"] = round_half_away(
            grouped_stop.reindex(t.index, fill_value=0.0)
        )
        batch["mean_word_len"] = round_half_away(
            grouped_len.reindex(t.index, fill_value=0.0)
        )
        batch["upper_ratio"] = round_half_away(
            t.str.count(r"[A-Z]") / n_chars.replace(0, 1)
        )
        return batch


class RepetitionScorer:
    """Gopher-style repetition quality signals (Rae et al. 2021, app. A1.1):
    the standard pre-training filters that drop boilerplate-heavy documents.

    Per document:
      ``dup_line_frac``        — repeated lines / total lines
      ``dup_line_char_frac``   — chars in repeated-line occurrences beyond
                                 the first / total line chars
      ``top_2gram_char_frac``  — chars covered by the most frequent word
                                 2-gram / total word chars
      ``dup_5gram_char_frac``  — chars covered by all occurrences of
                                 duplicated word 5-grams / total word chars
                                 (overlaps over-count, as in the paper)

    Words are ``[a-z0-9_]+`` on the lowered text (ASCII class so the SQL
    oracle's RE2 ``regexp_extract_all`` tokenizes identically); the most
    frequent 2-gram tie-breaks by (count, char length, lexicographic) so
    both sides pick the same winner. All heavy steps are pandas C loops
    (split/explode/groupby/shift) — no per-row Python function."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("").reset_index(drop=True)
        docs = pd.RangeIndex(len(t))

        # --- duplicate lines -------------------------------------------------
        lines = t.str.split("\n").explode()
        ldf = pd.DataFrame(
            {"doc": lines.index, "line": lines.values, "chars": lines.str.len().values}
        )
        lg = (
            ldf.groupby(["doc", "line"], sort=False)["chars"]
            .agg(cnt="size", chars="first")
            .reset_index()
        )
        per = lg.groupby("doc", sort=False).agg(
            n_lines=("cnt", "sum"), n_distinct=("cnt", "size")
        )
        per["excess_chars"] = (
            ((lg["cnt"] - 1) * lg["chars"]).groupby(lg["doc"]).sum()
        )
        per["tot_line_chars"] = (lg["cnt"] * lg["chars"]).groupby(lg["doc"]).sum()

        # --- word n-grams ----------------------------------------------------
        words = t.str.lower().str.findall(self.word_re).explode().dropna()
        wf = pd.DataFrame({"doc": words.index, "w": words.values})
        wf["wlen"] = wf["w"].str.len()
        wtot = wf.groupby("doc")["wlen"].sum()
        nwords = wf.groupby("doc").size()

        def _gram_counts(n: int) -> pd.DataFrame:
            shifted = [wf.groupby("doc")["w"].shift(-k) for k in range(1, n)]
            mask = shifted[-1].notna() if shifted else pd.Series(True, index=wf.index)
            gram, glen = wf["w"][mask], wf["wlen"][mask]
            for s in shifted:
                gram = gram + " " + s[mask]
                glen = glen + s[mask].str.len()
            gdf = pd.DataFrame({"doc": wf["doc"][mask], "gram": gram, "glen": glen})
            return (
                gdf.groupby(["doc", "gram"], sort=False)["glen"]
                .agg(cnt="size", glen="first")
                .reset_index()
            )

        c2 = _gram_counts(2).sort_values(
            ["doc", "cnt", "glen", "gram"], ascending=[True, False, False, True]
        )
        top2 = c2.groupby("doc", sort=False).head(1).set_index("doc")
        top2_chars = top2["cnt"] * top2["glen"]

        c5 = _gram_counts(5)
        d5 = c5[c5["cnt"] > 1]
        dup5_chars = (d5["cnt"] * d5["glen"]).groupby(d5["doc"]).sum()

        # --- assemble (every doc has >=1 line; word frames may miss docs) ----
        n_lines = per["n_lines"].reindex(docs).astype("int64")
        n_dist = per["n_distinct"].reindex(docs)
        excess = per["excess_chars"].reindex(docs)
        tot_lc = per["tot_line_chars"].reindex(docs).clip(lower=1)
        wchars = wtot.reindex(docs, fill_value=0).clip(lower=1)

        batch = batch.copy()
        batch["n_lines"] = n_lines.values
        batch["n_words_rep"] = nwords.reindex(docs, fill_value=0).astype("int64").values
        batch["dup_line_frac"] = round_half_away((n_lines - n_dist) / n_lines)
        batch["dup_line_char_frac"] = round_half_away(excess / tot_lc)
        batch["top_2gram_char_frac"] = round_half_away(
            top2_chars.reindex(docs, fill_value=0) / wchars
        )
        batch["dup_5gram_char_frac"] = round_half_away(
            dup5_chars.reindex(docs, fill_value=0) / wchars
        )
        return batch


class PiiScrubber:
    """PII detection + redaction — the standard pre-release corpus pass
    (Dolma / BigScience-ROOTS style): emails, IPv4 addresses and
    international-format phone numbers are counted and replaced by typed
    placeholder tokens.

    Patterns are deliberately RE2-compatible (no backrefs / lookarounds)
    and leftmost-greedy-unambiguous so a DuckDB ``regexp_extract_all`` /
    ``regexp_replace(..., 'g')`` oracle matches byte-for-byte. Regexes
    compile once per actor; counting and replacement run in pandas' C
    loops (``str.count`` / ``str.replace``) — no per-row Python.

    Scale note: this is a pure per-batch map — no shuffle, no state; at
    100 TB it fuses into whatever read→filter chain precedes it."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    PHONE = r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"

    def __init__(self, text_col: str = "text", out_col: str = "scrubbed"):
        self.text_col = text_col
        self.out_col = out_col
        # re.ASCII: Python's \d/\b default to Unicode (arabic-indic or
        # fullwidth digits would match), RE2's are ASCII-only — without the
        # flag the two sides diverge on non-ASCII digits
        self.email_re = re.compile(self.EMAIL, re.ASCII)
        self.ipv4_re = re.compile(self.IPV4, re.ASCII)
        self.phone_re = re.compile(self.PHONE, re.ASCII)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        batch["n_emails"] = t.str.count(self.email_re).astype("int64")
        batch["n_ipv4"] = t.str.count(self.ipv4_re).astype("int64")
        batch["n_phones"] = t.str.count(self.phone_re).astype("int64")
        # order matters: phones before IPs would not — the patterns are
        # disjoint (phone requires a leading '+'), so any order is stable
        s = t.str.replace(self.email_re, "<EMAIL>", regex=True)
        s = s.str.replace(self.ipv4_re, "<IP>", regex=True)
        s = s.str.replace(self.phone_re, "<PHONE>", regex=True)
        batch[self.out_col] = s
        return batch


class C4LineFilter:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep only
    lines that end in terminal punctuation AND have at least ``min_words``
    words; drop the whole document when the lowered text contains the
    "lorem ipsum" boilerplate marker or a curly brace (code leakage).

    Emits the cleaned text (kept lines re-joined with ``\\n``), kept/total
    line counts and the doc-level drop flag — callers filter on
    ``c4_doc_drop`` / empty ``cleaned``. Line explode / mask / groupby-agg
    are pandas C loops; the whole stage is a shuffle-free per-batch map."""

    TERMINAL = ('.', '!', '?', '"')

    def __init__(self, text_col: str = "text", min_words: int = 5):
        self.text_col = text_col
        self.min_words = min_words

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("").reset_index(drop=True)
        lower = t.str.lower()
        doc_drop = lower.str.contains("lorem ipsum", regex=False) | t.str.contains(
            "{", regex=False
        )

        lines = t.str.split("\n").explode()
        stripped = lines.str.strip()
        keep = stripped.str.endswith(self.TERMINAL) & (
            stripped.str.count(" ") + 1 >= self.min_words
        )
        kept = lines[keep]
        cleaned = kept.groupby(kept.index).agg("\n".join)
        n_total = lines.groupby(lines.index).size()
        n_kept = keep.groupby(keep.index).sum()

        docs = pd.RangeIndex(len(t))
        batch = batch.copy()
        batch["n_lines_total"] = n_total.reindex(docs, fill_value=0).astype("int64").values
        batch["n_lines_kept"] = n_kept.reindex(docs, fill_value=0).astype("int64").values
        batch["c4_doc_drop"] = doc_drop.values
        batch["cleaned"] = cleaned.reindex(docs, fill_value="").values
        return batch


class LangIdStage:
    """Language ID via stopword-profile scoring (n-gram heuristic class).

    Scores each document against small per-language stopword profiles and
    predicts the argmax (ties broken by profile order, 'und' when no word
    matches any profile). Deterministic; real corpora would swap in fastText
    or CLD3 — the Ray plumbing (actor pool, batch shape) is identical."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zà-ÿäöüß']+")
        self.profiles = list(_STOPWORDS.items())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[self.text_col].fillna("").str.lower().str.findall(self.word_re)
        # vectorized profile scoring: one explode, then one C-loop isin +
        # grouped sum per LANGUAGE (not per row). argmax ties resolve to the
        # lowest column index = earlier profile order, matching the strict
        # `score > best_score` scan; zero matches anywhere -> 'und'.
        ex = words.explode()
        ex = ex[ex.notna()]
        scores = np.zeros((len(batch), len(self.profiles)), dtype=np.int64)
        for j, (_, prof) in enumerate(self.profiles):
            s = ex.isin(prof).groupby(level=0).sum()
            scores[:, j] = s.reindex(words.index, fill_value=0).to_numpy()
        best_j = scores.argmax(axis=1)
        best_score = scores[np.arange(len(scores)), best_j]
        langs = np.array([lang for lang, _ in self.profiles], dtype=object)
        batch["pred_lang"] = np.where(best_score > 0, langs[best_j], "und")
        return batch


class Fingerprinter:
    """Document fingerprints: a normalized md5 (exact-dup key, SQL-checkable)
    and a byte-k-gram MIN-HASH fingerprint (robust to small edits as long as
    the minimal k-gram survives them; rows-only oracle).

    Note this is deliberately the GLOBAL minimum, not a winnowed set: a
    winnow (per-window minima) selects a set of hashes for substring
    matching, but any single-number reduction of that set collapses back to
    the global min — the set variant only pays off with a set-valued output
    column, which the pipeline doesn't need."""

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k
        self.base = np.uint64(1000003)

    def _rolling_min_hash(self, t: str) -> int:
        b = t.encode("utf-8", "ignore")
        if len(b) < self.k:
            return int.from_bytes(hashlib.md5(b).digest()[:8], "big")
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        k = self.k
        # k-gram polynomial hashes, vectorized via cumulative powers
        n = len(arr) - k + 1
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # k is small (8): 8 vector ops, not a per-char loop
            h = h * self.base + arr[j : j + n]
        return int(h.min())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        norm = t.str.lower().str.strip()
        batch["fingerprint_md5"] = norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        batch["fingerprint_rolling"] = norm.map(self._rolling_min_hash).astype("uint64")
        return batch


def bigram_lm_scores(
    ds,
    sample_mod: int = 5,
    alpha: float = 0.1,
    min_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet-style LM quality filter (Wenzek et al. 2020): score every
    document by its average negative log-likelihood under an add-alpha
    bigram model trained on a deterministic corpus sample.

    Train pass (distributed): docs with ``doc_id % sample_mod == 0``
    contribute (w1, w2) bigram counts — folded per batch BEFORE one
    bigram-vocabulary-sized groupby (the combiner shape). The unigram-left
    table derives from the bigram table (c1(w1) = Σ_w2 c2(w1, w2)); V is
    the training docs' distinct-token count via the same fold→groupby
    shape. Both count maps broadcast ONCE via ``ray.put``.

    Score pass: per batch, tokens explode → bigrams via groupby-shift,
    counts via dict map, nll = -ln((c2+α)/(c1+α·V)) vectorized; docs with
    fewer than 2 tokens score 0. Scores round to 6 decimals for
    reproducible ordering vs the SQL oracle.

    Scale: the broadcast bigram map is sample-sized, not corpus-sized —
    at 100 TB keep ``sample_mod`` high and raise ``min_count`` to cut the
    singleton tail (documented approximation: pruned bigrams fall back to
    the α numerator, slightly RAISING their nll)."""
    import ray
    from ray.data.aggregate import Count, Sum

    word_re = re.compile(r"[a-z0-9_]+")

    def bigram_partials(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch[id_col] % sample_mod == 0]
        toks = sel[text_col].fillna("").str.lower().str.findall(word_re)
        ex = toks.explode().dropna()
        if ex.empty:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        f = pd.DataFrame({"doc": ex.index, "w1": ex.values})
        f["w2"] = f.groupby("doc")["w1"].shift(-1)
        f = f[f["w2"].notna()]
        return f.groupby(["w1", "w2"], sort=False).size().reset_index(name="n")

    def token_partials(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch[id_col] % sample_mod == 0]
        toks = sel[text_col].fillna("").str.lower().str.findall(word_re)
        uniq = set()
        for ts in toks:
            uniq.update(ts)
        # explicit object dtype: an empty set would otherwise produce a
        # float64 column and a schema-divergent block
        return pd.DataFrame({"w": pd.Series(sorted(uniq), dtype=object)})

    c2_tbl = (
        ds.map_batches(bigram_partials, batch_format="pandas")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n2"))
        .to_pandas()
    )
    if min_count > 1:
        c2_tbl = c2_tbl[c2_tbl["n2"] >= min_count]
    c1_tbl = c2_tbl.groupby("w1", as_index=False)["n2"].sum().rename(columns={"n2": "n1"})
    vocab_n = (
        ds.map_batches(token_partials, batch_format="pandas")
        .groupby("w")
        .aggregate(Count(alias_name="c"))
        .count()
    )
    if vocab_n == 0:
        raise ValueError(
            f"bigram LM training sample is empty (no doc_id % {sample_mod} == 0 "
            "docs with tokens) — lower sample_mod"
        )
    c2_ref = ray.put(dict(zip(c2_tbl["w1"] + " " + c2_tbl["w2"], c2_tbl["n2"].astype("int64"))))
    c1_ref = ray.put(dict(zip(c1_tbl["w1"], c1_tbl["n1"].astype("int64"))))

    class ScoreStage:
        def __init__(self):
            self.c2 = ray.get(c2_ref)
            self.c1 = ray.get(c1_ref)
            self.v = float(vocab_n)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            t = batch[text_col].reset_index(drop=True).fillna("")
            toks = t.str.lower().str.findall(word_re)
            ex = toks.explode().dropna()
            docs = pd.RangeIndex(len(batch))
            out = pd.DataFrame({id_col: batch[id_col].to_numpy()}, index=docs)
            if ex.empty:
                out["n_bigrams"] = np.int64(0)
                out["avg_nll"] = 0.0
                return out
            f = pd.DataFrame({"doc": ex.index, "w1": ex.values})
            f["w2"] = f.groupby("doc")["w1"].shift(-1)
            f = f[f["w2"].notna()]
            n2 = (f["w1"] + " " + f["w2"]).map(self.c2).fillna(0).to_numpy(dtype="float64")
            n1 = f["w1"].map(self.c1).fillna(0).to_numpy(dtype="float64")
            nll = -np.log((n2 + alpha) / (n1 + alpha * self.v))
            g = pd.DataFrame({"doc": f["doc"].to_numpy(), "nll": nll}).groupby("doc")["nll"]
            out["n_bigrams"] = g.size().reindex(docs, fill_value=0).astype("int64").values
            out["avg_nll"] = round_half_away(g.mean().reindex(docs, fill_value=0.0).values)
            return out

    from ._pool import pool_size

    return ds.map_batches(ScoreStage, batch_format="pandas", concurrency=pool_size(4))


def tfidf_top_terms(
    ds,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
):
    """Per-document top-``top_n`` TF-IDF terms — the classic two-pass
    distributed text pipeline.

    Pass 1 (distributed DF): per-batch DISTINCT (doc, token) fold, then ONE
    vocabulary-sized groupby-count. Pass 2: the (token → df) map is
    broadcast ONCE via ``ray.put``; each batch explodes its own docs'
    tokens, computes per-doc tf locally (a doc's tokens always live in its
    own batch — no shuffle), scores tf·ln(N/df), and keeps the per-doc
    top-``top_n`` by (rounded score desc, term asc).

    Broadcast assumption: the df map for tokens with ``df >= min_df`` fits
    worker memory; at 100 TB raise ``min_df`` to cut the heavy tail (terms
    below the cut can never rank: idf is monotone-decreasing in df only
    above it — strictly, low-df terms have the HIGHEST idf, so min_df>1
    trades exactness for memory and is documented as approximate).

    Scores are rounded to 6 decimals BEFORE ranking so the ordering is
    reproducible against the SQL oracle (raw float64 products may differ by
    ulps between libm implementations).
    """
    import ray
    from ray.data.aggregate import Count

    token_re = re.compile(r"\w+")

    def distinct_doc_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(token_re)
        # (doc, term) pairs deduped in one C-loop drop_duplicates — no
        # per-row Python set() construction
        out = pd.DataFrame(
            {id_col: batch[id_col].repeat(toks.str.len()).to_numpy(),
             "term": np.concatenate([np.asarray(x, dtype=object) for x in toks])
             if len(toks) else np.array([], dtype=object)}
        )
        return out.drop_duplicates()

    n_docs = ds.count()
    df_tbl = (
        ds.map_batches(distinct_doc_tokens, batch_format="pandas")
        .groupby("term")
        .aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    if min_df > 1:
        df_tbl = df_tbl[df_tbl["df"] >= min_df]
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype("int64"))))

    class ScoreStage:
        def __init__(self):
            self.df = ray.get(df_ref)
            self.n = n_docs

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].fillna("").str.lower().str.findall(token_re)
            ex = pd.DataFrame(
                {id_col: batch[id_col].repeat(toks.str.len()).to_numpy(),
                 "term": np.concatenate([np.asarray(x, dtype=object) for x in toks])
                 if len(toks) else np.array([], dtype=object)}
            )
            if ex.empty:
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "term": pd.Series([], dtype=object),
                                     "rank": pd.Series([], dtype="int64"),
                                     "score": pd.Series([], dtype="float64")})
            tf = ex.groupby([id_col, "term"], sort=False).size().reset_index(name="tf")
            dfv = tf["term"].map(self.df)
            tf = tf[dfv.notna()]
            dfv = dfv.dropna().astype("int64")
            score = (tf["tf"].to_numpy(dtype="float64")
                     * np.log(float(self.n) / dfv.to_numpy(dtype="float64")))
            tf = tf.assign(score=round_half_away(score))
            tf = tf.sort_values([id_col, "score", "term"],
                                ascending=[True, False, True])
            top = tf.groupby(id_col, sort=False).head(top_n).copy()
            top["rank"] = top.groupby(id_col, sort=False).cumcount() + 1
            return top[[id_col, "term", "rank", "score"]]

    from ._pool import pool_size

    return ds.map_batches(ScoreStage, batch_format="pandas", concurrency=pool_size(4))


# ---------------------------------------------------------------------------
# BM25 top-k retrieval (text-side similarity search)
# ---------------------------------------------------------------------------


def bm25_topk(
    ds,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """BM25 (Robertson/Lucene variant) top-k document retrieval for a small
    broadcast query set — the text-side sibling of `similarity.py`'s vector
    ANN family.

    Two-pass retrieval shape:
      pass 1 (corpus constants): one narrow scan folds each batch to
        (n_docs, total_tokens) plus per-QUERY-TERM document frequencies —
        a bounded partial (≤ |terms|+1 rows per batch) merged on the
        driver; at 100 TB these stats persist beside the corpus and the
        pass is amortized across query sets.
      pass 2 (scoring): stats broadcast once; each batch tokenizes
        vectorized, computes tf for the |terms| query terms via one
        explode + per-term C-loop equality (never per row), scores all
        queries, and emits only its LOCAL top-k per query — the merge is
        a (batches × queries × k)-row groupby trim, corpus-independent.

    idf = ln((N - df + .5)/(df + .5) + 1); score rounded half-away to 6
    (ranking on the ROUNDED value, doc-id tiebreak) so the DuckDB oracle
    re-derives identical ranks."""
    import math

    import ray.data as rd  # noqa: F401  (signature parity with siblings)

    word_re = re.compile(r"[a-z0-9_]+")
    terms = sorted({t for ts in queries.values() for t in ts})

    def stats_fold(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        ex = toks.explode().dropna()
        # '#' cannot appear in a [a-z0-9_]+ token, so the scalar stats can
        # never collide with a real term. NUL-prefixed sentinels are NOT
        # safe here: pandas' object factorize hashes embedded-NUL strings
        # as C strings, silently merging "\x00a" and "\x00b" in groupby.
        rows = {"term": ["#n_docs", "#n_tokens"],
                "v": [len(batch), int(len(ex))]}
        for t in terms:
            hit = ex[ex == t]
            rows["term"].append(t)
            rows["v"].append(int(hit.index.nunique()))
        return pd.DataFrame(rows)

    stats_pdf = ds.map_batches(stats_fold, batch_format="pandas").to_pandas()
    if stats_pdf.empty:  # empty corpus: every query retrieves nothing
        return pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
             "rank": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
    stats = stats_pdf.groupby("term")["v"].sum()
    n_docs = int(stats["#n_docs"])
    avgdl = float(stats["#n_tokens"]) / max(n_docs, 1)
    idf = {
        t: math.log((n_docs - int(stats.get(t, 0)) + 0.5) / (int(stats.get(t, 0)) + 0.5) + 1.0)
        for t in terms
    }

    def score_fold(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        ids = batch[id_col].to_numpy()
        dl = toks.str.len().to_numpy(dtype=np.float64)
        ex = toks.explode().dropna()
        norm = k1 * (1.0 - b + b * dl / avgdl)
        frames = []
        for qid, qterms in queries.items():
            score = np.zeros(len(batch))
            for t in qterms:
                tf = (ex == t).groupby(level=0).sum().reindex(
                    batch.index, fill_value=0
                ).to_numpy(dtype=np.float64)
                score += idf[t] * tf * (k1 + 1.0) / np.where(tf > 0, tf + norm, 1.0)
            keep = score > 0
            f = pd.DataFrame(
                {"query_id": qid, id_col: ids[keep], "score": round_half_away(score[keep])}
            )
            f = f.sort_values(["score", id_col], ascending=[False, True]).head(k)
            frames.append(f)
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    out = (
        ds.map_batches(score_fold, batch_format="pandas")
        .groupby("query_id")
        .map_groups(trim, batch_format="pandas")
        .to_pandas()
    )
    return out[["query_id", id_col, "rank", "score"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sparse all-pairs IDF-weighted shingle-cosine similarity join
# ---------------------------------------------------------------------------


def tfidf_simjoin(
    ds,
    threshold: float = 0.5,
    max_df: int = 20,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """All-pairs cosine similarity over sparse IDF-weighted word-``k``-shingle
    sets — the sparse counterpart of the dense embedding near-dup join, and
    the cosine-weighted sibling of `dedup.ngram_jaccard_exact`: doc pairs
    never meet unless they SHARE a shingle, so the join is driven by a
    shingle-partitioned inverted index, not an all-pairs product. Shingles
    (not unigrams) are the term space because real template-heavy corpora —
    including the synthetic one — have a tiny unigram vocabulary where every
    word is a stopword; k-grams restore discriminative coordinates.

    Contract (mirrored by the SQL oracle): docs with ≥1 word; distinct
    word-``k``-shingles (whole doc when < k words — `ngram_jaccard_exact`
    rules); vector space = shingles with ``df <= max_df``; weight =
    ln(N/df) (set semantics, tf ≡ 1); cosine over the L2-normalized capped
    vectors; pairs kept where the ROUND-6 cosine >= threshold.

    Distributed shape (DISCO/Elsayed-style pair generation); EVERY wide step
    is the coarse-bucket sort+map_groups reduce — Ray's generic
    `groupby().aggregate()` walks groups in Python and measured 75 s for the
    27k-group DF pass alone at sf0.1 (the `ngram_jaccard_exact` lesson):
      1. DF pass: per-batch distinct (doc, shingle-hash) explode →
         groupby(sh % NB).map_groups with a vectorized `value_counts` +
         ``df <= max_df`` cut INSIDE the bucket (a shingle's postings
         co-locate in its bucket, so the bucket count IS the global df).
         ``max_df`` is the SCALE knob: a shingle with df = d emits d(d-1)/2
         partial products, so the cap bounds per-shingle work at max_df²/2
         while dropping exactly the lowest-idf coordinates. Shingles travel
         as 64-bit hashes (`pd.util.hash_array`) — same collision bound as
         the Jaccard path.
      2. Postings: broadcast (shingle → df) once (the `tfidf_top_terms`
         broadcast assumption — the KEPT vocab fits worker memory; add
         min-df pruning at 100 TB or go relational); each batch re-shingles
         its own docs and computes their normalized weights locally (a
         doc's shingles live in its own batch — tokenizing twice beats the
         per-doc norm shuffle that a single-pass layout would need).
      3. Pair partials: groupby(sh % NB).map_groups — ONE Ray group per
         bucket, a vectorized pandas self-merge on the shingle hash inside
         (upper triangle via doc_b > doc_a), then a local packed-pair-key
         partial sum (ids validated to fit 31 bits).
      4. Pair fold: groupby(pair % NB).map_groups — every partial of a pair
         lands in one group, so the in-group pandas sum is the full cosine
         and the ROUND-6 ≥ threshold cut happens there, not on the driver.
    """
    import ray

    from ._pool import pool_size

    word_re = re.compile(r"\w+")
    out_cols = {
        "a_id": pd.Series([], dtype="int64"),
        "b_id": pd.Series([], dtype="int64"),
        "cosine": pd.Series([], dtype="float64"),
    }

    def explode_shingles(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        if len(ids) and ((ids < 0).any() or ids.max() >= (1 << 31)):
            raise ValueError(
                f"{id_col} must fit 31 bits for the packed pair key; "
                "re-key the corpus or use a two-column pair groupby"
            )
        doc_ids: list[np.ndarray] = []
        hashes: list[np.ndarray] = []
        for did, txt in zip(ids, batch[text_col].fillna("")):
            words = word_re.findall(txt.lower())
            if not words:
                continue  # no words: no vector (oracle: len(w) > 0)
            if len(words) < k:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
            sh = np.unique(
                pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False)
            )
            doc_ids.append(np.full(len(sh), did, dtype=np.int64))
            # int64 bit-view: uint64 group keys come back from Ray's
            # sort-groupby with per-block int64/uint64 dtype drift, and the
            # pandas concat upcasts to float64 — silently corrupting hashes
            # above 2^53
            hashes.append(sh.view(np.int64))
        if not doc_ids:
            return pd.DataFrame(
                {"doc": pd.Series(dtype="int64"), "sh": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"doc": np.concatenate(doc_ids), "sh": np.concatenate(hashes)}
        )

    num_buckets = 256

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bkt"] = (
            batch["sh"].to_numpy().view(np.uint64) % np.uint64(num_buckets)
        ).astype("int64")
        return batch

    def df_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["sh"].value_counts()
        vc = vc[vc <= max_df]
        return pd.DataFrame({
            "sh": vc.index.to_numpy(dtype="int64"),
            "df": vc.to_numpy(dtype="int64"),
        })

    n_docs = ds.count()
    if n_docs == 0:
        return pd.DataFrame(out_cols)
    df_tbl = (
        ds.map_batches(explode_shingles, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bkt")
        .map_groups(df_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if df_tbl.empty:
        return pd.DataFrame(out_cols)
    df_ref = ray.put(
        dict(zip(df_tbl["sh"].astype("int64"), df_tbl["df"].astype("int64")))
    )

    class PostingStage:
        """(shingle, doc, normalized idf weight) postings, batch-local."""

        def __init__(self):
            self.df = ray.get(df_ref)
            self.n = float(n_docs)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ex = explode_shingles(batch)
            empty = pd.DataFrame({
                "sh": pd.Series([], dtype="int64"),
                "doc": pd.Series([], dtype="int64"),
                "w": pd.Series([], dtype="float64"),
            })
            if ex.empty:
                return empty
            dfv = ex["sh"].map(self.df)
            ex = ex[dfv.notna()].reset_index(drop=True)
            if ex.empty:
                return empty
            w = np.log(self.n / dfv.dropna().to_numpy(dtype="float64"))
            norm = np.sqrt(
                pd.DataFrame({"d": ex["doc"].to_numpy(), "w2": w * w})
                .groupby("d", sort=False)["w2"].transform("sum").to_numpy()
            )
            return pd.DataFrame({
                "sh": ex["sh"].to_numpy(),
                "doc": ex["doc"].to_numpy(dtype="int64"),
                "w": w / norm,
            })

    postings = ds.map_batches(
        PostingStage, batch_format="pandas", concurrency=pool_size(4)
    ).map_batches(add_bucket, batch_format="pandas")

    empty_pairs = pd.DataFrame({
        "pair": pd.Series([], dtype="int64"),
        "dot": pd.Series([], dtype="float64"),
        "pkt": pd.Series([], dtype="int64"),
    })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty_pairs
        lhs = g[["sh", "doc", "w"]]
        m = lhs.merge(lhs, on="sh", suffixes=("_a", "_b"))
        m = m[m["doc_a"].to_numpy() < m["doc_b"].to_numpy()]
        if m.empty:
            return empty_pairs
        part = pd.DataFrame({
            "pair": (m["doc_a"].to_numpy(dtype="int64") << np.int64(31))
            | m["doc_b"].to_numpy(dtype="int64"),
            "dot": m["w_a"].to_numpy() * m["w_b"].to_numpy(),
        })
        # local partial sum: a pair hit on many shingles in this bucket
        # collapses to one row before the cross-bucket exchange
        out = part.groupby("pair", sort=False)["dot"].sum().reset_index()
        out["pkt"] = (out["pair"].to_numpy() % num_buckets).astype("int64")
        return out

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("pair", sort=False)["dot"].sum()
        cos = round_half_away(agg.to_numpy())
        keep = cos >= threshold
        key = agg.index.to_numpy(dtype="int64")[keep]
        return pd.DataFrame({
            "a_id": (key >> np.int64(31)).astype("int64"),
            "b_id": (key & np.int64((1 << 31) - 1)).astype("int64"),
            "cosine": cos[keep],
        })

    out = (
        postings.groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("pkt")
        .map_groups(reduce_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(out_cols)
    return (
        out[["a_id", "b_id", "cosine"]]
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule document filter
# ---------------------------------------------------------------------------


class GopherRulesFilter:
    """Gopher quality-rule document filter (Rae et al. 2021, app. A1.1) —
    the full rule set the QualityScorer/RepetitionScorer signals feed into,
    evaluated to per-rule verdicts + a final keep flag. Pure per-batch map,
    no shuffle; regexes compile once per actor.

    Every ratio rule is evaluated in INTEGER arithmetic (e.g. "symbol ratio
    <= 0.1" as ``10*(n_hash+n_ellipsis) <= n_words``) so the SQL oracle can
    never diverge on a float boundary — the same dyadic-boundary lesson as
    `scalar.round_half_away`.

    Rules (words = ``\\w+`` over lowercased text, lines = ``\\n``-split):
      r_word_count — 50 <= words <= 100 000
      r_mean_len   — 3 <= mean word length <= 10 (0-word docs fail)
      r_symbol     — (#-count + non-overlapping "..."-count) / words <= 0.1
      r_bullets    — <= 10% of lines start with a bullet (-, *, •)
      r_ellipsis   — <= 30% of lines end with "..."
      r_alpha      — >= 80% of words contain an [a-z] character
      r_stop       — >= 2 distinct of {the, be, to, of, and, that, have, with}
    """

    STOP8 = frozenset(("the", "be", "to", "of", "and", "that", "have", "with"))
    RULES = ("r_word_count", "r_mean_len", "r_symbol", "r_bullets",
             "r_ellipsis", "r_alpha", "r_stop")

    def __init__(self, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000):
        self.text_col = text_col
        self.min_words = min_words
        self.max_words = max_words
        self.word_re = re.compile(r"\w+")
        self.ellipsis_re = re.compile(r"\.\.\.")
        self.bullet_re = re.compile(r"^\s*[-*•]")
        self.ell_end_re = re.compile(r"\.\.\.\s*$")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        idx = t.index
        words = t.str.lower().str.findall(self.word_re)
        n_words = words.str.len().astype("int64")
        ex = words.explode().dropna()
        g = lambda s: s.groupby(level=0).sum().reindex(idx, fill_value=0).astype("int64")  # noqa: E731
        sum_wlen = g(ex.str.len())
        n_alpha = g(ex.str.contains(r"[a-z]", regex=True))
        n_stop = (
            ex[ex.isin(self.STOP8)].groupby(level=0).nunique()
            .reindex(idx, fill_value=0).astype("int64")
        )
        n_hash = t.str.count("#").astype("int64")
        n_ellipsis = t.str.count(self.ellipsis_re).astype("int64")
        lines = t.str.split("\n")
        n_lines = lines.str.len().astype("int64")
        lx = lines.explode()
        n_bullet = g(lx.str.match(self.bullet_re))
        n_ell_end = g(lx.str.contains(self.ell_end_re))

        out = batch.copy()
        out["n_words"] = n_words
        out["n_lines"] = n_lines
        out["r_word_count"] = (n_words >= self.min_words) & (n_words <= self.max_words)
        out["r_mean_len"] = (
            (n_words > 0) & (sum_wlen >= 3 * n_words) & (sum_wlen <= 10 * n_words)
        )
        out["r_symbol"] = 10 * (n_hash + n_ellipsis) <= n_words
        out["r_bullets"] = 10 * n_bullet <= n_lines
        out["r_ellipsis"] = 10 * n_ell_end <= 3 * n_lines
        out["r_alpha"] = 10 * n_alpha >= 8 * n_words
        out["r_stop"] = n_stop >= 2
        out["keep"] = np.logical_and.reduce([out[r].to_numpy() for r in self.RULES])
        return out


def _bpe_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Apply one BPE merge (a, b) → a+b to a symbol sequence, leftmost
    non-overlapping — the canonical algorithm (Sennrich et al. 2016)."""
    out, i, n = [], 0, len(syms)
    ab = a + b
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch adjacent-pair counts over (syms list, n) rows — explode +
    within-word shift, weighted by word frequency; folds the batch to
    ≤ |distinct pairs in batch| rows before the pair groupby."""
    ex = batch["syms"].reset_index(drop=True).explode()
    if ex.empty:
        return pd.DataFrame({"pair": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    f = pd.DataFrame({"word": ex.index.to_numpy(), "s": ex.to_numpy()})
    nxt = f.groupby("word")["s"].shift(-1)
    keep = nxt.notna().to_numpy()
    wfreq = batch["n"].reset_index(drop=True).to_numpy(dtype="int64")
    g = pd.DataFrame(
        {"pair": f["s"].to_numpy()[keep] + "\x1f" + nxt.to_numpy()[keep],
         "n": wfreq[f["word"].to_numpy()[keep]]}
    )
    return g.groupby("pair", as_index=False)["n"].sum()


def _bpe_argmax(pairs: pd.DataFrame) -> tuple[str, str, int] | None:
    """Deterministic best pair: max count, ties to the lexicographically
    SMALLEST '\\x1f'-packed pair key."""
    if pairs.empty:
        return None
    best_n = int(pairs["n"].max())
    key = pairs.loc[pairs["n"] == best_n, "pair"].min()
    a, b = key.split("\x1f")
    return a, b, best_n


def bpe_train(
    ds,
    n_merges: int = 30,
    text_col: str = "text",
    vocab_driver_limit: int = 2_000_000,
) -> pd.DataFrame:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016).

    Scale shape — the corpus is read EXACTLY ONCE: pass 1 folds each batch
    to (word, n) partials before one word-vocabulary groupby (the
    ``top_tokens`` combiner shape). Every merge iteration then runs over
    the VOCABULARY, not the corpus. Two equivalent iteration engines share
    the same per-batch kernels (``_bpe_pair_partial`` / ``_bpe_argmax`` /
    ``_bpe_merge_word``), value-locked against each other in pytest:

      * vocab ≤ ``vocab_driver_limit``: the vocab table collects once and
        iterates on the driver — 30 merges cost 30 pandas passes over a
        bounded table, no Ray round-trips.
      * vocab above the limit (10⁸+ distinct words at corpus scale): the
        vocab stays a Ray DATASET; each iteration is map_batches(pair
        partials) → one pair-keyed groupby → per-block top-1 fold (the
        driver sees blocks×1 rows, never the pair table) → broadcast merge
        → map_batches(apply). State between iterations is a materialized
        vocab-sized dataset; the corpus is never re-read.

    The per-word merge application is a Python scan BY DESIGN: it touches
    vocab rows (bounded, shrinking), never corpus rows. Counts are exact
    integers; 'aaa' contributes 2 to ('a','a'), matching the reference
    implementation; ties break to the lexicographically smallest pair, so
    the table is deterministic under any sharding.

    Returns the merge table (rank, left, right, pair_count) — the artifact
    a tokenizer ships. Value-oracled byte-exact: the DuckDB SQL oracle
    unrolls the same merge rounds as a materialized-CTE chain, applying
    each round's winning pair with pipe-wrapped REPLACE rewriting (see
    text_bpe_merges / text_bpe_encode in pipelines/queries.py); pytest
    additionally locks both engines against an independent brute-force
    implementation."""
    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z0-9_]+")

    def word_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        ex = toks.explode().dropna()
        if ex.empty:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        return ex.value_counts().rename_axis("w").reset_index(name="n")

    vocab_ds = (
        ds.map_batches(word_partials, batch_format="pandas")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    empty = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                          "left": pd.Series([], dtype=object),
                          "right": pd.Series([], dtype=object),
                          "pair_count": pd.Series([], dtype="int64")})
    n_vocab = vocab_ds.count()
    if n_vocab == 0:
        return empty

    def to_syms(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"syms": [list(w[:-1]) + [w[-1] + "</w>"] for w in batch["w"]],
             "n": batch["n"].to_numpy(dtype="int64")}
        )

    merges: list[tuple[int, str, str, int]] = []

    if n_vocab <= vocab_driver_limit:
        vocab = to_syms(vocab_ds.to_pandas())
        for rank in range(n_merges):
            best = _bpe_argmax(_bpe_pair_partial(vocab))
            if best is None:
                break
            a, b, n = best
            merges.append((rank + 1, a, b, n))
            vocab["syms"] = [
                _bpe_merge_word(s, a, b) if a in s else s for s in vocab["syms"]
            ]
    else:
        state = vocab_ds.map_batches(to_syms, batch_format="pandas").materialize()
        for rank in range(n_merges):

            def local_top1(batch: pd.DataFrame) -> pd.DataFrame:
                t = _bpe_argmax(batch)
                if t is None:
                    return pd.DataFrame({"pair": pd.Series([], dtype=object),
                                         "n": pd.Series([], dtype="int64")})
                return pd.DataFrame({"pair": [t[0] + "\x1f" + t[1]], "n": [t[2]]})

            tops = (
                state.map_batches(_bpe_pair_partial, batch_format="pandas")
                .groupby("pair")
                .aggregate(Sum("n", alias_name="n"))
                .map_batches(local_top1, batch_format="pandas")
                .to_pandas()  # blocks × 1 rows
            )
            best = _bpe_argmax(tops)
            if best is None:
                break
            a, b, n = best
            merges.append((rank + 1, a, b, n))

            def apply_merge(batch: pd.DataFrame, a=a, b=b) -> pd.DataFrame:
                batch = batch.copy()
                batch["syms"] = [
                    _bpe_merge_word(list(s), a, b) if a in list(s) else list(s)
                    for s in batch["syms"]
                ]
                return batch

            state = state.map_batches(apply_merge, batch_format="pandas").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    ) if merges else empty


def bpe_encode(
    ds,
    merges: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Apply a learned BPE merge table (from :func:`bpe_train`) to the
    corpus: per document, the token count and an md5 of the full token
    stream (the verification artifact — hashes instead of shipping the
    token list). The merge table broadcasts as a plain rank-ordered list;
    each actor memoizes word→segmentation, so a word's merge loop runs
    once per DISTINCT word per actor regardless of corpus size. Rows-only
    for the driver (same iterative-rewriting reason as bpe_train); pytest
    value-locks it against a brute-force encoder."""
    from ._pool import pool_size

    word_re = re.compile(r"[a-z0-9_]+")
    merge_list = list(zip(merges["left"], merges["right"]))

    class EncodeStage:
        def __init__(self):
            self.memo: dict[str, list[str]] = {}

        def _segment(self, w: str) -> list[str]:
            s = self.memo.get(w)
            if s is None:
                s = list(w[:-1]) + [w[-1] + "</w>"]
                for a, b in merge_list:
                    if a in s:
                        s = _bpe_merge_word(s, a, b)
                self.memo[w] = s
            return s

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].reset_index(drop=True).fillna("").str.lower().str.findall(word_re)
            n_tokens = np.zeros(len(batch), dtype="int64")
            hashes = []
            for i, words in enumerate(toks):
                pieces: list[str] = []
                for w in words:
                    pieces.extend(self._segment(w))
                n_tokens[i] = len(pieces)
                hashes.append(hashlib.md5("\x1f".join(pieces).encode()).hexdigest())
            return pd.DataFrame(
                {id_col: batch[id_col].to_numpy(),
                 "n_bpe_tokens": n_tokens,
                 "token_stream_md5": hashes}
            )

    return ds.map_batches(EncodeStage, batch_format="pandas",
                          concurrency=pool_size(4))


# ---------------------------------------------------------------------------
# collocation extraction (PMI lift over adjacent-token bigrams)
# ---------------------------------------------------------------------------


def pmi_bigram_partials(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-batch partial counts for collocation scoring: one row per distinct
    gram seen in the batch — unigrams (no space) and adjacent-token bigrams
    ("x y") share one partial stream, so ONE vocabulary-sized groupby folds
    both. Tokens are the corpus-wide ``[a-z0-9_]+`` convention; bigram
    counting is factorize + integer-code ``np.unique`` (no per-pair string
    building until the distinct grams are known)."""
    word_re = re.compile(r"[a-z0-9_]+")
    toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
    lists = toks.tolist()
    lens = np.fromiter((len(t) for t in lists), dtype=np.int64, count=len(lists))
    total = int(lens.sum())
    empty = pd.DataFrame({"gram": pd.Series(dtype=object), "c": pd.Series(dtype="int64")})
    if total == 0:
        return empty
    flat = np.concatenate([np.asarray(t, dtype=object) for t in lists if t])
    uniq, inv, ucounts = np.unique(flat, return_inverse=True, return_counts=True)
    out = [pd.DataFrame({"gram": uniq, "c": ucounts.astype(np.int64)})]
    if total >= 2:
        # adjacency mask: a bigram may not cross a document boundary
        starts = np.zeros(total, dtype=bool)
        offsets = np.cumsum(lens)[:-1]  # doc start offsets (empty docs collapse)
        starts[offsets[offsets < total]] = True
        ok = ~starts[1:]
        if ok.any():
            codes = inv[:-1][ok].astype(np.int64) * len(uniq) + inv[1:][ok]
            cu, cc = np.unique(codes, return_counts=True)
            x, y = cu // len(uniq), cu % len(uniq)
            grams = np.array([f"{a} {b}" for a, b in zip(uniq[x], uniq[y])], dtype=object)
            out.append(pd.DataFrame({"gram": grams, "c": cc.astype(np.int64)}))
    return pd.concat(out, ignore_index=True)


def pmi_bigrams(
    ds: "rd.Dataset", text_col: str = "text", min_count: int = 5, k: int = 100
) -> pd.DataFrame:
    """Top-k collocations by exact PMI lift: adjacent-token bigrams scored
    with ratio = (c_xy·N²)/(B·c_x·c_y) — the argument of PMI's log, kept as
    a single IEEE division of exact integers (both products < 2^53 at any
    plausible corpus token count ≤ ~10^5·√c; beyond that, pre-filter by
    min_count before scoring) so the DuckDB oracle is bit-identical: ln()
    implementations differ between libm builds, exact-integer division does
    not.

    Distributed shape: per-batch partial fold (vocabulary-sized rows) → ONE
    groupby on the gram string → driver finish over the tiny distinct-gram
    table. No text leaves the batch stage; the shuffle carries only (gram,
    count) partials."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: pmi_bigram_partials(b, text_col), batch_format="pandas"
    )
    folded = partial.groupby("gram").aggregate(Sum("c", alias_name="c")).to_pandas()
    is_bigram = folded["gram"].str.contains(" ")
    uni = folded[~is_bigram]
    big = folded[is_bigram]
    n_tokens = int(uni["c"].sum())
    n_bigrams = int(big["c"].sum())
    if n_bigrams == 0:
        return pd.DataFrame(
            {"bigram": pd.Series(dtype=object), "c_xy": pd.Series(dtype="int64"),
             "ratio": pd.Series(dtype="float64")}
        )
    ucmap = uni.set_index("gram")["c"]
    big = big[big["c"] >= min_count].copy()
    xy = big["gram"].str.split(" ", n=1, expand=True)
    cx = ucmap.loc[xy[0]].to_numpy(dtype=np.int64)
    cy = ucmap.loc[xy[1]].to_numpy(dtype=np.int64)
    cxy = big["c"].to_numpy(dtype=np.int64)
    num = cxy * np.int64(n_tokens) * np.int64(n_tokens)
    den = np.int64(n_bigrams) * cx * cy
    out = pd.DataFrame(
        {"bigram": big["gram"].to_numpy(), "c_xy": cxy,
         "ratio": num.astype(np.float64) / den.astype(np.float64)}
    )
    out = out.sort_values(["ratio", "bigram"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)
