"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and every ``map_batches`` task computes one numpy matmul per batch
(never a per-row loop, never a re-ship per batch). Scale path: LSH-bucketed
ANN — random-hyperplane signatures bucket both sides, candidates are scored
only within buckets (same shape as an IVF coarse quantizer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ._pool import pool_size
from .scalar import round_half_away


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = np.asarray(col.offsets)
        dim = int(offs[1] - offs[0])
        return flat.reshape(len(col), dim)
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


PARTIAL_TOPK_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.int64()),
        pa.field("neighbor_id", pa.int64()),
        pa.field("cosine", pa.float64()),
    ]
)


class BruteForceScorer:
    """Actor-pool stage: per-batch cosine scores against the broadcast queries.

    ``__init__`` does ``ray.get`` once per actor (broadcast read, J1 pattern);
    ``__call__`` is one matmul. Emits (query_id, id, cosine) partial top-k per
    batch — the driver's final heap-merge touches only (batches × k) rows.
    Every output declares ``PARTIAL_TOPK_SCHEMA`` so the streaming executor
    sees ONE stable block schema."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return PARTIAL_TOPK_SCHEMA.empty_table()
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        mat = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.qmat @ mat.T  # (nq, batch)
        k = min(self.k, sims.shape[1])
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            # id tie-break: partial top-k must not depend on block row order
            sel = np.lexsort((ids_np, -sims[qi]))[:k]
            rows_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            rows_id.append(ids_np[sel])
            rows_s.append(sims[qi, sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "neighbor_id": pa.array(np.concatenate(rows_id).astype(np.int64)),
                "cosine": pa.array(np.concatenate(rows_s), pa.float64()),
            },
            schema=PARTIAL_TOPK_SCHEMA,
        )


def brute_force_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    corpus: rd.Dataset | None = None,
) -> pd.DataFrame:
    """Top-k cosine neighbors for the given query vectors (taken from ``ds``).

    ``corpus`` (default: ``ds`` itself) is the dataset the neighbors are
    scanned from — pass a FILTERED dataset for metadata-filtered vector
    search (the predicate prunes at the parquet scan, the scorer never
    sees non-qualifying rows).

    Returns (query_id, neighbor_id, rank, cosine) with deterministic
    tie-breaks (cosine desc, neighbor_id asc). Rounded to 6 decimals so a
    float64 SQL oracle agrees."""
    qset = set(query_ids)
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(sorted(qset)))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(
            f"no query vectors found for ids {sorted(qset)} — empty dataset "
            f"or wrong {id_col} values"
        )
    qrows.sort(key=lambda r: query_ids.index(r[id_col]))
    q = {
        "ids": [r[id_col] for r in qrows],
        "mat": np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows]),
    }
    queries_ref = ray.put(q)
    partials = (corpus if corpus is not None else ds).map_batches(
        BruteForceScorer,
        fn_constructor_args=(queries_ref, k + (1 if exclude_self else 0), id_col, vec_col),
        batch_format="pyarrow",
        concurrency=pool_size(4),
        batch_size=4096,
    )
    pdf = partials.to_pandas()  # (batches × queries × k) rows — small
    out = []
    for qid, g in pdf.groupby("query_id"):
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = round_half_away(res["cosine"], 6)
    return res[["query_id", "neighbor_id", "rank", "cosine"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


class HyperplaneHasher:
    """Random-hyperplane LSH signatures (seeded) — the ANN bucket assigner."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 11):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_bits, dim))
        self.weights = (1 << np.arange(n_bits, dtype=np.int64))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return bits @ self.weights


def lsh_bucketed_ann(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
    n_tables: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe`` bit-flips of the query's bucket in ANY of ``n_tables``
    independent hash tables (Indyk-Motwani multi-table LSH; table t uses
    seed+t, its buckets tagged t<<n_bits so one groupby serves all tables).

    The scale path of brute_force_topk: the bucket column partitions the
    corpus (a groupby at scale); recall < 1.0 by design, rising with
    n_tables (union of independent candidate sets) at n_tables× the
    map-side replication — the standard recall/cost dial. Deterministic
    given the seed."""
    qset = set(query_ids)
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(sorted(qset)))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(
            f"no query vectors found for ids {sorted(qset)} — empty dataset "
            f"or wrong {id_col} values"
        )
    dim = len(qrows[0][vec_col])
    hashers = [HyperplaneHasher(dim, n_bits, seed + t) for t in range(n_tables)]
    qmat = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows]))
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    # probe every bucket within Hamming distance ≤ multiprobe of the
    # query's bucket, per table (multiprobe=0 → exact bucket only);
    # composite bucket id = (table << n_bits) | bucket
    from itertools import combinations

    flips = [0]
    for d in range(1, min(multiprobe, n_bits) + 1):
        for bits in combinations(range(n_bits), d):
            m = 0
            for b in bits:
                m |= 1 << b
            flips.append(m)
    probe_sets = [set() for _ in range(len(qids))]
    for t, hasher in enumerate(hashers):
        tag = t << n_bits
        for qi, qb in enumerate(hasher.bucket(qmat)):
            probe_sets[qi].update(tag | (int(qb) ^ m) for m in flips)
    all_probes = set().union(*probe_sets)

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch[vec_col]))
        base = batch.select([id_col, vec_col])
        parts = []
        for t, hasher in enumerate(hashers):
            buckets = hasher.bucket(mat).astype(np.int64) | (t << n_bits)
            keep = np.isin(buckets, list(all_probes))
            parts.append(
                base.append_column("bucket", pa.array(buckets)).filter(pa.array(keep))
            )
        return pa.concat_tables(parts)

    # which query probes which bucket — a tiny broadcast table
    bucket_to_queries: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_sets):
        for b in probes:
            bucket_to_queries.setdefault(b, []).append(qi)
    side = ray.put({"qids": qids, "qmat": qmat, "b2q": bucket_to_queries, "k": k})

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket scoring INSIDE the groupby (never on the driver): one
        matmul per (bucket, probing queries), partial top-k rows out."""
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "neighbor_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        s = ray.get(side)
        bucket = int(g["bucket"].iloc[0])
        qidx = s["b2q"].get(bucket)
        if not qidx:
            return empty
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = s["qmat"][qidx] @ mat.T  # (probing queries, bucket size)
        kk = min(s["k"] + 1, sims.shape[1])  # +1: self may be in the bucket
        frames = []
        for row, qi in enumerate(qidx):
            # deterministic partial top-k: ties at the kk-boundary break by
            # neighbor id, not by Ray's within-group arrival order
            sel = np.lexsort((ids, -sims[row]))[:kk]
            frames.append(pd.DataFrame({
                "query_id": np.full(kk, s["qids"][qi], dtype=np.int64),
                "neighbor_id": ids[sel],
                "cosine": sims[row, sel],
            }))
        return pd.concat(frames, ignore_index=True)

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_bucket, batch_format="pandas")
    ).to_pandas()  # (buckets × probing queries × k) rows — small
    if len(partials) == 0:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [], "cosine": []})
    out = []
    for qi in range(len(qids)):
        g = partials[(partials["query_id"] == qids[qi]) & (partials["neighbor_id"] != qids[qi])]
        # a vector can sit in several probed buckets — dedup before ranking
        g = g.drop_duplicates(subset=["neighbor_id"])
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = round_half_away(g["cosine"], 6)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_id", "neighbor_id", "rank", "cosine"]]


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + per-cell scoring
# ---------------------------------------------------------------------------


def _round9(m: np.ndarray) -> np.ndarray:
    """Quantize to 9 decimals: makes every k-means intermediate identical
    between numpy (pairwise-sum BLAS) and a SQL engine (sequential sums),
    so the IVF pipeline is value-checkable against a DuckDB oracle. 1e-9
    quantization is far below any meaningful cosine resolution.
    half-away-from-zero to match the oracles' ROUND(x, 9) exactly at a
    boundary (the repo-wide convention, CLAUDE.md)."""
    return round_half_away(m, 9)


def _kmeans(sample: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Small deterministic Lloyd's k-means on a normalized+rounded sample
    (driver-side on a few thousand rows — the coarse-quantizer training step
    of IVF). Init = the first ``k`` sample rows (sample is ordered by id), so
    the whole training run is expressible in SQL (`queries.py:_ivf_sql`):
    fixed unrolled iterations, argmax ties broken toward the lower cell,
    centroids re-normalized and rounded to 9 decimals each iteration."""
    k = min(k, len(sample))
    cent = sample[:k].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)  # cosine on normalized rows
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = _round9(v / max(np.linalg.norm(v), 1e-12))
    return cent


def train_coarse_quantizer(
    ds: rd.Dataset,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse-quantizer training shared by IVF ANN and
    SemDeDup-style semantic dedup: collect the SQL-checkable id-filter
    sample (pushed into the scan at 100 TB) and run the fixed-iteration
    Lloyd's k-means of ``_kmeans``. Returns round-9 normalized centroids."""
    sample_rows_list = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t[id_col], sample_rows)),
        batch_format="pyarrow",
    ).take_all()
    if not sample_rows_list:
        raise ValueError(
            f"k-means training sample is empty: no rows with {id_col} < "
            f"{sample_rows}. The SQL-checkable sampling contract is an id "
            "filter — for sparse or offset id spaces raise sample_rows or "
            "re-key ids to start at 0."
        )
    sample_rows_list.sort(key=lambda r: r[id_col])
    smat = _round9(_normalize(np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in sample_rows_list]
    )))
    return _kmeans(smat, n_centroids)


def ivf_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-style approximate top-k: a coarse k-means quantizer (trained on a
    deterministic sample) partitions the corpus into cells; each query scores
    only its ``n_probe`` nearest cells, inside ``groupby(cell).map_groups``.

    Same scale shape as ``lsh_bucketed_ann`` (one bucketing shuffle, scoring
    distributed, driver merges (cells × queries × k) partial rows) but with a
    data-adaptive partitioner — better recall on clustered corpora. At 100 TB
    the sample is a pushed-down ``id < sample_rows`` row filter over the first
    row groups and the assignment stage streams; centroids stay a tiny
    broadcast. Every matrix is normalized and rounded to 9 decimals so the
    whole pipeline is value-checked against a DuckDB SQL oracle
    (`queries.py:_ivf_sql`)."""
    centroids = train_coarse_quantizer(ds, n_centroids, sample_rows, id_col, vec_col)

    qset = set(query_ids)
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(sorted(qset)))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(
            f"no query vectors found for ids {sorted(qset)} — empty dataset "
            f"or wrong {id_col} values"
        )
    qmat = _round9(_normalize(np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in qrows]
    )))
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    nprobe = min(n_probe, len(centroids))
    qcells = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]  # (nq, n_probe)
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(qcells):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)
    probed = np.array(sorted(cell_to_queries), dtype=np.int64)
    side = ray.put({"qids": qids, "qmat": qmat, "c2q": cell_to_queries, "k": k,
                    "centroids": centroids})

    def assign_cells(batch: pa.Table) -> pa.Table:
        mat = _round9(_normalize(_to_matrix(batch[vec_col])))
        s = ray.get(side)
        cells = np.argmax(mat @ s["centroids"].T, axis=1).astype(np.int64)
        t = batch.select([id_col, vec_col]).append_column("cell", pa.array(cells))
        return t.filter(pa.array(np.isin(cells, probed)))

    def score_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "neighbor_id": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        s = ray.get(side)
        qidx = s["c2q"].get(int(g["cell"].iloc[0]))
        if not qidx:
            return empty
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        mat = _round9(mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None))
        sims = s["qmat"][qidx] @ mat.T
        kk = min(s["k"] + 1, sims.shape[1])
        frames = []
        for row, qi in enumerate(qidx):
            # id tie-break keeps the partial top-k independent of Ray's
            # within-group row order (see lsh score_bucket)
            sel = np.lexsort((ids, -sims[row]))[:kk]
            frames.append(pd.DataFrame({
                "query_id": np.full(kk, s["qids"][qi], dtype=np.int64),
                "neighbor_id": ids[sel],
                "cosine": sims[row, sel],
            }))
        return pd.concat(frames, ignore_index=True)

    partials = (
        ds.map_batches(assign_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(score_cell, batch_format="pandas")
    ).to_pandas()
    if len(partials) == 0:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [], "cosine": []})
    out = []
    for qi in range(len(qids)):
        g = partials[(partials["query_id"] == qids[qi]) & (partials["neighbor_id"] != qids[qi])]
        g = g.drop_duplicates(subset=["neighbor_id"])
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = round_half_away(g["cosine"], 6)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_id", "neighbor_id", "rank", "cosine"]]


# ---------------------------------------------------------------------------
# Product quantization (PQ) — subspace codebooks + corpus encoding
# ---------------------------------------------------------------------------


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 4) -> np.ndarray:
    """Deterministic Lloyd's k-means under L2 on (sub)vectors — the PQ
    codebook trainer. Same SQL-expressibility contract as `_kmeans`: init =
    first ``k`` sample rows, fixed unrolled iterations, argmin ties toward
    the lower cell (np.argmin first-occurrence == SQL ORDER BY dist, cell),
    centroids rounded to 9 decimals each iteration (no renormalization —
    PQ centroids are plain means)."""
    k = min(k, len(sample))
    cent = sample[:k].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = _round9(members.mean(axis=0))
    return cent


def _train_pq_books(
    ds: rd.Dataset, m: int, ks: int, iters: int, sample_rows: int,
    id_col: str, vec_col: str,
) -> np.ndarray:
    """(m, ks, dim/m) PQ codebooks from the deterministic id-filtered sample
    (see `pq_encode` for the determinism contract)."""
    sample_list = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t[id_col], sample_rows)),
        batch_format="pyarrow",
    ).take_all()
    if not sample_list:
        raise ValueError(
            f"PQ training sample is empty: no rows with {id_col} < "
            f"{sample_rows}. The SQL-checkable sampling contract is an id "
            "filter — for sparse or offset id spaces raise sample_rows or "
            "re-key ids to start at 0."
        )
    sample_list.sort(key=lambda r: r[id_col])
    smat = _round9(_normalize(np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in sample_list]
    )))
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(smat[:, s * dsub : (s + 1) * dsub], ks, iters) for s in range(m)
    ])


def pq_encode(
    ds: rd.Dataset,
    m: int = 4,
    ks: int = 16,
    iters: int = 4,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Product-quantize the corpus: split each normalized vector into ``m``
    subspaces, train a ``ks``-centroid codebook per subspace on a
    deterministic sample (driver-side, tiny), then encode every vector as
    ``m`` uint8-sized codes + the reconstruction error — the compression
    step under an IVF-PQ index (codes are D/m·log2(ks)× smaller than the
    raw vectors; at 100 TB the codebooks stay a ~few-KB broadcast while
    encoding streams).

    Deterministic + SQL-value-checkable end to end (see
    `queries.py:_pq_sql`): sample = ``id < sample_rows`` pushed-down filter,
    the L2 k-means contract of `_kmeans_l2`, and errors rounded to 6."""
    books = _train_pq_books(ds, m, ks, iters, sample_rows, id_col, vec_col)
    dsub = books.shape[2]
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        mat = _round9(_normalize(_to_matrix(batch[vec_col])))
        bks = ray.get(books_ref)
        cols = {id_col: batch[id_col]}
        err = np.zeros(len(mat), dtype=np.float64)
        for s in range(bks.shape[0]):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            d = ((sub[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(d, axis=1)
            err += d[np.arange(len(sub)), code]
            cols[f"code_{s}"] = pa.array(code.astype(np.int64))
        cols["recon_err"] = pa.array(round_half_away(err, 6))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    m: int = 4,
    ks: int = 16,
    iters: int = 4,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """PQ asymmetric-distance (ADC) top-k — the query leg of IVF-PQ.

    Queries stay EXACT (raw subvectors); the corpus is scanned through its
    PQ codes only: per query a (m × ks) distance table is precomputed once
    and broadcast, and each corpus batch scores every row with m table
    LOOKUPS + a sum instead of a D-dim distance — the payoff that makes
    billion-vector scans affordable. Per-batch partial top-k (smallest ADC
    distance), tiny driver merge of (batches × queries × k) partials.

    ADC distances are rounded to 6 decimals BEFORE ranking (tie-break by
    id), so numpy/SQL accumulation-order ulps cannot flip a rank — the
    whole path is value-checked against `queries.py:_pq_sql(final='topk')`."""
    books = _train_pq_books(ds, m, ks, iters, sample_rows, id_col, vec_col)
    dsub = books.shape[2]

    qset = sorted(set(query_ids))
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(qset))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(
            f"no query vectors found for ids {sorted(qset)} — empty dataset "
            f"or wrong {id_col} values"
        )
    qrows.sort(key=lambda r: r[id_col])
    qmat = _round9(_normalize(np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in qrows]
    )))
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    # (nq, m, ks) ADC lookup tables: ||q_sub - centroid||^2
    dtab = np.stack([
        ((qmat[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        for s in range(m)
    ], axis=1)
    side = ray.put({"books": books, "dtab": dtab, "qids": qids, "k": k})

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(side)
        mat = _round9(_normalize(_to_matrix(batch[vec_col])))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bks, dt = s["books"], s["dtab"]
        nq = dt.shape[0]
        dist = np.zeros((nq, len(mat)), dtype=np.float64)
        for sub in range(bks.shape[0]):
            v = mat[:, sub * dsub : (sub + 1) * dsub]
            d = ((v[:, None, :] - bks[sub][None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d, axis=1)
            dist += dt[:, sub, :][:, codes]
        dist = round_half_away(dist, 6)
        kk = min(s["k"], len(ids))
        frames = []
        for row in range(nq):
            sel = np.lexsort((ids, dist[row]))[:kk]
            frames.append(pd.DataFrame({
                "query_id": np.full(kk, s["qids"][row], dtype=np.int64),
                "neighbor_id": ids[sel],
                "adc_dist": dist[row, sel],
            }))
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    frames = []
    for qid, g in parts.groupby("query_id", sort=True):
        g = g.sort_values(["adc_dist", "neighbor_id"]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        frames.append(g)
    return pd.concat(frames, ignore_index=True)[
        ["query_id", "neighbor_id", "rank", "adc_dist"]
    ]


def pq_topk_rerank(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 100,
    m: int = 16,
    ks: int = 64,
    iters: int = 4,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """PQ-ADC shortlist + exact re-rank — the standard two-stage quality fix
    for PQ's quantization loss (Jégou et al. 2011's IVFADC + re-ranking).

    Stage 1 scans the corpus through its PQ codes (``pq_topk``, m table
    lookups per row) and keeps a ``shortlist``-sized candidate set per
    query; stage 2 gathers ONLY those candidates' raw vectors (one
    ``is_in``-filtered scan — (queries × shortlist) rows, driver-sized by
    construction) and re-ranks them with exact cosine. Compression still
    pays for the 99%+ of the corpus the exact pass never touches; recall
    is set by the shortlist's coverage, not the code's resolution.

    Measured at sf0.1 (5k vectors, 64-dim): the driver config
    (m=16, ks=64, shortlist=100 = 2% exact-scanned) lifts recall@10 from
    the code-only 0.18 to **0.92**; sweep: shortlist 200 → 0.96,
    ks=256 → 0.98, m=32 → 1.00. Output contract matches
    ``brute_force_topk`` (query_id, neighbor_id, rank, cosine) so the SQL
    oracle is the PQ chain nested under the exact knn re-rank."""
    short = pq_topk(
        ds, query_ids, k=shortlist, m=m, ks=ks, iters=iters,
        sample_rows=sample_rows, id_col=id_col, vec_col=vec_col,
    )
    cand_ids = sorted(set(short["neighbor_id"].tolist()) | set(query_ids))
    rows = ds.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t[id_col], value_set=pa.array(cand_ids))
        ),
        batch_format="pyarrow",
    ).take_all()
    vecs = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for r in rows}
    per_q = {int(q): g["neighbor_id"].to_numpy() for q, g in short.groupby("query_id")}
    out = []
    for qid in sorted(per_q):
        qv = vecs[qid]
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        cands = np.array([c for c in per_q[qid] if c != qid], dtype=np.int64)
        cmat = np.stack([vecs[c] for c in cands])
        cmat = cmat / np.clip(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12, None)
        cos = cmat @ qv
        sel = np.lexsort((cands, -cos))[:k]
        g = pd.DataFrame(
            {"query_id": np.full(len(sel), qid, dtype=np.int64),
             "neighbor_id": cands[sel],
             "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
             "cosine": round_half_away(cos[sel], 6)}
        )
        out.append(g)
    return pd.concat(out, ignore_index=True)


# ---------------------------------------------------------------------------
# grouped vector aggregate: per-group mean embedding (centroids)
# ---------------------------------------------------------------------------


class CentroidPartialStage:
    """Per-batch grouped vector-sum fold: each batch emits one
    (group, dim-index, partial_sum, partial_count) row per group x dim —
    at most ``batch_groups x d`` rows leave any batch, so the downstream
    merge is a register-sized groupby exactly like the grouped-HLL
    partials (`sketch.HllGroupedPartialStage`). The per-batch reduction is
    one one-hot matmul (BLAS), never a Python loop over rows."""

    def __init__(self, group_col: str = "label", vec_col: str = "embedding"):
        self.group_col = group_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[self.vec_col])
        g = batch[self.group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(g)
        n_g, d = len(uniq), mat.shape[1]
        onehot = (codes[:, None] == np.arange(n_g)[None, :]).astype(np.float64)
        sums = onehot.T @ mat
        counts = np.bincount(codes, minlength=n_g).astype(np.int64)
        return pa.table(
            {
                self.group_col: pa.array(
                    np.repeat(np.asarray(uniq, dtype=np.int64), d)
                ),
                "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n_g)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, d)),
            }
        )


def group_centroids(
    ds: rd.Dataset, group_col: str = "label", vec_col: str = "embedding"
) -> rd.Dataset:
    """Per-group mean embedding (the vector-aggregate family member): the
    corpus streams through ONE bounded fold (`CentroidPartialStage`), the
    only exchange is the (group x d)-sized partial groupby, and the mean
    is finished vectorized. Returns (group, i, centroid_x, n_vecs) with
    ``i`` 1-indexed (SQL ``generate_subscripts`` parity) and ``centroid_x``
    rounded to 6 — sums are float64 (exact float32 widening both here and
    in the ``embedding::DOUBLE[]`` oracle cast), so numpy-vs-DuckDB
    summation-order drift stays ~1e-12, far inside the rounding quantum.

    Scale shape: partials are independent of corpus size (groups x d rows
    per batch); a 100 TB embedding table with 1k groups x 1k dims merges
    via a 1M-row groupby. Per-group sketches merge across shards/days like
    the HLL registers."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(
        CentroidPartialStage(group_col, vec_col), batch_format="pyarrow"
    )
    agg = parts.groupby([group_col, "i"]).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: b[group_col].cast(pa.int64()),
                "i": b["i"].cast(pa.int64()),
                "centroid_x": pa.array(round_half_away(s / n)),
                "n_vecs": pa.array(n.astype(np.int64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


class KMeansAssignPartialStage:
    """Per-batch Lloyd step against a broadcast centroid set: assign every
    vector to its nearest centroid and fold the batch to (cluster, i, s, n)
    partial sums via one one-hot matmul — at most ``k x d`` rows leave any
    batch regardless of batch size (the `CentroidPartialStage` shape, with
    the group key COMPUTED by the assignment instead of read from a column).

    Distance contract (mirrored verbatim by the SQL oracle,
    `queries.py:_kmeans_full_sql`): squared L2 rounded half-away to 9
    decimals BEFORE the argmin, ties broken toward the lower cluster id
    (numpy first-min == SQL ``ORDER BY dist, cluster``). Rounding first
    makes the ordering invariant to numpy-vs-DuckDB summation-order drift
    (~1e-13, far inside the 5e-10 quantum)."""

    def __init__(self, cent_ref, vec_col: str = "embedding"):
        cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.cent = np.asarray(cent, dtype=np.float64)  # (k, d)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, d = self.cent.shape
        schema = pa.schema(
            [("cluster", pa.int64()), ("i", pa.int64()),
             ("s", pa.float64()), ("n", pa.int64())]
        )
        if len(batch) == 0:
            return schema.empty_table()
        x = _to_matrix(batch[self.vec_col])
        if k * d <= (1 << 16):
            # direct Σ(x-c)² — the form the SQL oracle evaluates
            d2 = ((x[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
        else:
            # expansion form for large k·d (scale path; same ordering after
            # the round-9 quantization except adversarial near-ties)
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ self.cent.T)
                + (self.cent * self.cent).sum(axis=1)[None, :]
            )
        assign = np.argmin(round_half_away(d2, 9), axis=1)
        onehot = (assign[:, None] == np.arange(k)[None, :]).astype(np.float64)
        sums = onehot.T @ x  # (k, d)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, d)),
            },
            schema=schema,
        )


def kmeans_full(
    ds: rd.Dataset,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Full-corpus distributed Lloyd's k-means — the iterative-algorithm
    family member beside the sample-trained quantizer (`_kmeans`): every
    iteration streams the WHOLE table once through a broadcast-centroid
    assignment fold; the entire cross-worker exchange per iteration is the
    ≤ (blocks × k × d)-row partial groupby, and the driver only ever holds
    the k × d centroid matrix. This is the MLlib-style shape that holds at
    100 TB — no per-row driver work, no full materialization; if re-reads
    dominate, materialize the two projected columns upstream once.

    Deterministic, SQL-checkable contract: init = the vectors with
    ``id_col < k`` ordered by id; squared-L2 assignment rounded half-away
    to 9 with ties toward the lower cluster; per-cluster means rounded
    half-away to 9 each iteration; empty clusters carry the previous
    centroid forward (n_vecs 0). Returns (cluster, i, centroid_x round-6,
    n_vecs of the final assignment) with ``i`` 1-indexed."""
    from ray.data.aggregate import Sum

    init_rows = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t[id_col], k)), batch_format="pyarrow"
    ).take_all()
    if len(init_rows) < k:
        raise ValueError(
            f"k-means init needs the {k} rows with {id_col} < {k}; found "
            f"{len(init_rows)}. The SQL-checkable init contract is an id "
            "filter — re-key sparse id spaces to start at 0 or lower k."
        )
    init_rows.sort(key=lambda r: r[id_col])
    cent = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in init_rows[:k]]
    )
    d = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(cent.copy())
        parts = ds.map_batches(
            KMeansAssignPartialStage,
            fn_constructor_args=(ref, vec_col),
            batch_format="pyarrow",
            concurrency=pool_size(4),
            batch_size=4096,
        )
        agg = (
            parts.groupby(["cluster", "i"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()  # ≤ k·d rows
        )
        s = np.zeros((k, d))
        n = np.zeros(k, dtype=np.int64)
        for r in agg:
            s[r["cluster"], r["i"] - 1] = r["s"]
            if r["i"] == 1:
                n[r["cluster"]] = r["n"]
        nz = n > 0
        if nz.any():
            cent[nz] = round_half_away(s[nz] / n[nz][:, None], 9)
        counts = n
    return pd.DataFrame(
        {
            "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), k),
            "centroid_x": round_half_away(cent, 6).ravel(),
            "n_vecs": np.repeat(counts, d),
        }
    )


class CovariancePartialStage:
    """Per-batch second-moment fold — the distributed input to PCA/whitening:
    each batch reduces to ONE upper-triangle Gram partial (``X^T X`` via a
    single BLAS matmul) plus per-dim sums and a count, i.e. exactly
    ``d(d+1)/2 + d + 1`` rows regardless of batch size. Downstream merge is
    a (i, j)-keyed groupby over register-sized partials (the grouped-HLL /
    centroid-partial shape), so a 100 TB embedding table folds through one
    streaming pass with a kilobyte exchange.

    Row encoding: (i, j, v) with 1-indexed dims; ``j == i`` upward is a Gram
    entry, ``j == 0`` is the per-dim sum, ``(0, 0)`` is the row count."""

    def __init__(self, vec_col: str = "embedding"):
        self.vec_col = vec_col
        self._iu_d = None  # dimension the cached triangle indices were built for
        self._iu = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[self.vec_col])
        n, d = mat.shape
        if self._iu_d != d:  # cache keyed by the batch's dimension
            self._iu = np.triu_indices(d)
            self._iu_d = d
        iu_r, iu_c = self._iu
        gram = mat.T @ mat
        i = np.concatenate([iu_r + 1, np.arange(1, d + 1), [0]])
        j = np.concatenate([iu_c + 1, np.zeros(d, dtype=np.int64), [0]])
        v = np.concatenate([gram[iu_r, iu_c], mat.sum(axis=0), [float(n)]])
        return pa.table(
            {"i": pa.array(i.astype(np.int64)), "j": pa.array(j.astype(np.int64)),
             "v": pa.array(v)}
        )


def covariance_matrix(ds: rd.Dataset, vec_col: str = "embedding") -> pd.DataFrame:
    """Exact upper-triangle covariance matrix of a distributed embedding
    column: ``cov(i, j) = E[x_i x_j] - E[x_i] E[x_j]`` finished on the
    driver from the merged ``d(d+1)/2 + d + 1`` partial rows (kilobytes at
    any corpus size). Values round half-away to 6 (the shared
    DuckDB-ROUND-parity policy; float64 drift vs the SQL oracle's
    summation order is ~1e-12, far inside the quantum)."""
    from ray.data.aggregate import Sum

    from .scalar import round_half_away

    agg = (
        ds.map_batches(CovariancePartialStage(vec_col), batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    n = float(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "v"].iloc[0])
    sums = (
        agg[(agg["j"] == 0) & (agg["i"] > 0)]
        .set_index("i")["v"].sort_index()
    )
    pairs = agg[agg["j"] > 0].sort_values(["i", "j"]).reset_index(drop=True)
    mean = sums / n
    cov = (
        pairs["v"].to_numpy() / n
        - mean.loc[pairs["i"]].to_numpy() * mean.loc[pairs["j"]].to_numpy()
    )
    return pd.DataFrame(
        {"i": pairs["i"].astype("int64"), "j": pairs["j"].astype("int64"),
         "n_vecs": np.int64(n),
         "cov": round_half_away(cov, 6)}
    )


def pca_power_projection(
    ds: rd.Dataset,
    iters: int = 3,
    coord_scale: int = 1000,
    v_scale: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Top-principal-direction projection via INTEGER power iteration — the
    eigenvector-extraction step a PCA/whitening pipeline runs on top of the
    :func:`covariance_matrix` fold.

    Every arithmetic step is exact int64, so no float summation order
    exists anywhere (the PageRank trick): coordinates quantize once as
    ``round_half_away(x·coord_scale)``; the Gram matrix folds per batch as
    one integer ``Xᵀ X`` matmul (d² partial rows per block, a kilobyte
    exchange); the driver runs ``iters`` power steps ``w = G·v`` with a
    truncating rescale ``v ← trunc(w / max(1, max|w| // v_scale))``
    (truncation toward zero — DuckDB's BIGINT ``//`` — NOT Python floor);
    the projection pass is one integer matvec per batch. Sign and ties are
    pinned by the all-ones start vector. The d×d Gram and the d-vector live
    on the driver — dimension-sized, never corpus-sized."""
    first = ds.take(1)
    if not first:
        raise ValueError("pca_power_projection: empty embedding dataset")
    d = len(first[0][vec_col])

    def gram_partial(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch[vec_col])
        xi = round_half_away(x * coord_scale, 0).astype("int64")
        g = xi.T @ xi  # exact: numpy integer matmul
        ij = np.arange(d * d, dtype="int64")
        return pa.table({"ij": pa.array(ij), "g": pa.array(g.reshape(-1))})

    from ray.data.aggregate import Sum

    gp = (
        ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("ij")
        .aggregate(Sum("g", alias_name="g"))
        .to_pandas()
    )
    G = np.zeros(d * d, dtype="int64")
    G[gp["ij"].to_numpy(dtype="int64")] = gp["g"].to_numpy(dtype="int64")
    G = G.reshape(d, d)

    v = np.ones(d, dtype="int64")
    for _ in range(iters):
        w = G @ v
        div = max(1, int(np.abs(w).max()) // v_scale)
        v = np.sign(w) * (np.abs(w) // div)  # trunc-toward-zero == DuckDB //

    def project(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch[vec_col])
        xi = round_half_away(x * coord_scale, 0).astype("int64")
        return pa.table(
            {id_col: batch[id_col],
             "proj_units": pa.array(xi @ v)}
        )

    return ds.map_batches(project, batch_format="pyarrow")


class HardNegativeScorer(BruteForceScorer):
    """BruteForceScorer variant for contrastive-pair mining: per query,
    candidates sharing the anchor's LABEL are masked out before the partial
    top-k, so only cross-label ("hard negative") neighbors survive. Same
    broadcast-once / one-matmul-per-batch shape and declared block schema."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding", label_col: str = "label"):
        super().__init__(queries_ref, k, id_col, vec_col)
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qlabels = np.asarray(q["labels"], dtype=np.int64)
        self.label_col = label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return PARTIAL_TOPK_SCHEMA.empty_table()
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        labels = batch[self.label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.qmat @ mat.T
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            neg = labels != self.qlabels[qi]
            if not neg.any():
                continue
            cand_ids, cand_sims = ids_np[neg], sims[qi, neg]
            k = min(self.k, len(cand_ids))
            sel = np.lexsort((cand_ids, -cand_sims))[:k]
            rows_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            rows_id.append(cand_ids[sel])
            rows_s.append(cand_sims[sel])
        if not rows_q:
            return PARTIAL_TOPK_SCHEMA.empty_table()
        return pa.table(
            {"query_id": pa.array(np.concatenate(rows_q)),
             "neighbor_id": pa.array(np.concatenate(rows_id).astype(np.int64)),
             "cosine": pa.array(np.concatenate(rows_s), pa.float64())},
            schema=PARTIAL_TOPK_SCHEMA,
        )


def hard_negative_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the k most
    cosine-similar vectors whose LABEL DIFFERS from the anchor's — the
    highest-loss negatives an InfoNCE/triplet objective wants. Same scale
    shape as :func:`brute_force_topk` (anchors broadcast once via
    ``ray.put``, one matmul + label mask per batch, (batches × k) driver
    merge); at corpus scale swap the scan for the LSH/IVF candidate
    generation and keep the same label-mask scoring stage."""
    qset = sorted(set(query_ids))
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(qset))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(f"no anchor vectors found for ids {qset}")
    qrows.sort(key=lambda r: query_ids.index(r[id_col]))
    queries_ref = ray.put(
        {"ids": [r[id_col] for r in qrows],
         "mat": np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows]),
         "labels": [r[label_col] for r in qrows]}
    )
    partials = ds.map_batches(
        HardNegativeScorer,
        fn_constructor_args=(queries_ref, k, id_col, vec_col, label_col),
        batch_format="pyarrow",
        concurrency=pool_size(4),
        batch_size=4096,
    )
    pdf = partials.to_pandas()
    out = []
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = round_half_away(res["cosine"].to_numpy(), 6)
    return res[["query_id", "neighbor_id", "rank", "cosine"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def sq8_encode(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """INT8 scalar quantization (the vector-DB storage codec beside PQ):
    per-dimension min/max train over the corpus, then
    ``code = round((x − mn) / (mx − mn) · 255)`` clipped to [0, 255].

    Scale shape: the train pass folds each batch to d (dim, min, max)
    partial rows (min/max are associative) before one d-sized groupby;
    the ranges broadcast as two d-vectors; encode is one vectorized pass.
    Output per vector: an md5 of the comma-joined code stream (the exact
    verification artifact — no float recon-error sum whose addition order
    could diverge), the exact int64 code sum, and clip-saturation counts.
    Constant dimensions (mx == mn) encode as 0 on both sides."""
    from ray.data.aggregate import Max, Min

    def minmax_partial(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch[vec_col])
        d = x.shape[1]
        return pa.table(
            {"i": pa.array(np.arange(d, dtype="int64")),
             "mn": pa.array(x.min(axis=0)),
             "mx": pa.array(x.max(axis=0))}
        )

    rng = (
        ds.map_batches(minmax_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("i")
    )
    mn = rng["mn"].to_numpy(dtype="float64")
    mx = rng["mx"].to_numpy(dtype="float64")
    span = mx - mn

    def encode(batch: pa.Table) -> pa.Table:
        import hashlib

        x = _to_matrix(batch[vec_col])
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = (x - mn[None, :]) / span[None, :] * 255.0
        scaled = np.where(span[None, :] == 0.0, 0.0, scaled)
        codes = round_half_away(scaled, 0)
        n_lo = (codes < 0).sum(axis=1).astype("int64")
        n_hi = (codes > 255).sum(axis=1).astype("int64")
        codes = np.clip(codes, 0, 255).astype("int64")
        md5s = [
            hashlib.md5(",".join(str(c) for c in row).encode()).hexdigest()
            for row in codes
        ]
        return pa.table(
            {id_col: batch[id_col],
             "codes_md5": pa.array(md5s, pa.string()),
             "code_sum": pa.array(codes.sum(axis=1)),
             "n_clip_lo": pa.array(n_lo),
             "n_clip_hi": pa.array(n_hi)}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# greedy k-center coreset selection (Gonzalez max-min)
# ---------------------------------------------------------------------------

KC_SCALE = 1024  # fixed-point: q = round_half_away(x * 1024), dist² in int64


def _kc_quantize(mat: np.ndarray) -> np.ndarray:
    """Half-away integer quantization matching DuckDB
    ``CAST(ROUND(x::DOUBLE * 1024, 0) AS BIGINT)`` bit-for-bit: float32→
    float64 is exact, ×1024 is a power-of-two (exact), and the sign-aware
    floor(|v|+0.5) is the same half-away rule ROUND uses."""
    v = mat.astype(np.float64) * KC_SCALE
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)


def kcenter_select(
    ds: rd.Dataset,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Greedy k-center (Gonzalez 1985 max-min) coreset selection — the
    diversity-sampling step of a training-data curation pipeline (pick k
    maximally-spread exemplars; dedup's complement). Returns a k-row frame
    (step, vec_id, d2) where d2 is the squared quantized distance from the
    chosen point to the PREVIOUS center set (step 0 seeds at the min id,
    d2=0). The 2-approximation guarantee is the textbook one.

    Scale shape: k corpus scans, each embarrassingly parallel — the current
    center matrix (≤ k×d int64) broadcasts via ``ray.put`` once per round,
    every batch computes one (n,c,d) vectorized min-distance and emits a
    SINGLE candidate row (its argmax point + that point's quantized vector),
    so the driver reduce sees one row per block per round. No shuffle at
    all; distances are exact integers, so every round's argmax (ties:
    min id) is deterministic under any partitioning, and the DuckDB oracle
    unrolls the same k rounds as a CTE chain."""
    centers: list[tuple[int, np.ndarray]] = []

    n_rows = ds.count()
    if n_rows < k:
        # with fewer points than requested centers every extra round would
        # re-pick an already-chosen point at d2=0 — degenerate output the
        # oracle's k-round unroll does not model; fail loudly instead
        raise ValueError(f"kcenter_select: k={k} exceeds corpus size {n_rows}")

    first = ds.select_columns([id_col]).min(id_col)
    first_row = ds.filter(expr=f"{id_col} == {first}").take(1)[0]
    q0 = _kc_quantize(np.asarray(first_row[vec_col], dtype=np.float64)[None, :])[0]
    centers.append((int(first), q0))
    out = [{"step": 0, "vec_id": int(first), "d2": 0}]

    for step in range(1, k):
        cmat_ref = ray.put(np.stack([c[1] for c in centers]))

        def candidate(b: pa.Table, _ref=cmat_ref) -> pa.Table:
            cmat = ray.get(_ref)  # (c, d) int64
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            q = _kc_quantize(_to_matrix(b[vec_col]))  # (n, d) int64
            if len(ids) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "d2": pa.array([], pa.int64()),
                     "qvec": pa.array([], pa.list_(pa.int64()))}
                )
            diff = q[:, None, :] - cmat[None, :, :]
            d2 = (diff * diff).sum(axis=2).min(axis=1)  # (n,) min over centers
            best = np.lexsort((ids, -d2))[0]  # max d2, tie min id
            return pa.table(
                {"vec_id": pa.array([ids[best]], pa.int64()),
                 "d2": pa.array([int(d2[best])], pa.int64()),
                 "qvec": pa.array([q[best].tolist()], pa.list_(pa.int64()))}
            )

        cand = ds.map_batches(candidate, batch_format="pyarrow").to_pandas()
        row = cand.sort_values(["d2", "vec_id"], ascending=[False, True]).iloc[0]
        centers.append((int(row["vec_id"]), np.asarray(row["qvec"], dtype=np.int64)))
        out.append({"step": step, "vec_id": int(row["vec_id"]), "d2": int(row["d2"])})

    return pd.DataFrame(out)


class TripletScorer:
    """One matmul + two masks per batch: per anchor the best SAME-label
    (positive, self excluded) and best DIFFERENT-label (hard negative)
    candidates; per-batch partial top-1s, anchor count bounds the tiny
    per-query loop."""

    def __init__(self, queries_ref, id_col, vec_col, label_col):
        q = ray.get(queries_ref)
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = _normalize(q["mat"])
        self.qlabels = np.asarray(q["labels"])
        self.id_col, self.vec_col, self.label_col = id_col, vec_col, label_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = t[self.label_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "side": pa.array([], pa.string()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        mat = _normalize(_to_matrix(t[self.vec_col]))
        cos = self.qmat @ mat.T  # (Q, n)
        same = labels[None, :] == self.qlabels[:, None]
        notself = ids[None, :] != self.qids[:, None]
        qo, so, no, co = [], [], [], []
        for j, qid in enumerate(self.qids):
            for side, mask in (("pos", same[j] & notself[j]), ("neg", ~same[j])):
                if not mask.any():
                    continue
                c = np.where(mask, cos[j], -2.0)
                best = np.lexsort((ids, -c))[0]
                qo.append(int(qid)); so.append(side)
                no.append(int(ids[best])); co.append(float(c[best]))
        return pa.table(
            {"query_id": pa.array(qo, pa.int64()),
             "side": pa.array(so, pa.string()),
             "neighbor_id": pa.array(no, pa.int64()),
             "cosine": pa.array(co, pa.float64())}
        )


def triplet_sample(
    ds: rd.Dataset,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Contrastive-training triplet mining: per anchor, (positive = most
    cosine-similar SAME-label vector, negative = most similar
    DIFFERENT-label vector — the hard negative). Anchors broadcast once,
    one matmul + two masks per batch, per-batch partial top-1s, driver
    merge over (batches × anchors × 2) rows. Same corpus-scale path as
    brute_force_topk: swap the scan for LSH/IVF candidates, keep the
    mask stage."""
    qset = sorted(set(query_ids))
    qrows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(qset))),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(f"no anchor vectors found for ids {qset}")
    qrows.sort(key=lambda r: query_ids.index(r[id_col]))
    queries_ref = ray.put(
        {"ids": [r[id_col] for r in qrows],
         "mat": np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows]),
         "labels": [r[label_col] for r in qrows]}
    )
    partials = ds.map_batches(
        TripletScorer,
        fn_constructor_args=(queries_ref, id_col, vec_col, label_col),
        batch_format="pyarrow",
        concurrency=pool_size(4),
        batch_size=4096,
    ).to_pandas()
    rows = []
    for qid in query_ids:
        row = {"query_id": int(qid)}
        for side, pcol, ccol in (("pos", "pos_id", "pos_cosine"),
                                 ("neg", "neg_id", "neg_cosine")):
            g = partials[(partials["query_id"] == qid) & (partials["side"] == side)]
            if g.empty:
                # a unique-label anchor has no positive; a single-label
                # corpus has no negative — per-batch partials skip empty
                # sides, so surface the degenerate corpus explicitly
                # instead of a bare IndexError at iloc[0]
                raise ValueError(
                    f"anchor {int(qid)} has no {side} candidate "
                    f"({'same' if side == 'pos' else 'different'}-label side is empty)"
                )
            g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True])
            row[pcol] = int(g.iloc[0]["neighbor_id"])
            row[ccol] = float(round_half_away(g.iloc[0]["cosine"], 6))
        rows.append(row)
    return pd.DataFrame(rows)
