"""Driver-facing query catalog: each entry is one operator/pipeline from
SURVEY.md §2 (or a training-data extension), runnable over a testdata sf_dir,
paired with an ANSI-SQL oracle in ``ORACLE_SQL`` (same column names, same
values) for the DuckDB side-by-side check.

The ``events`` table doubles as a binlog for the CDC operators: ``event_id``
is the monotonic EVENT_LOGS id, ``user_id`` the message key, and
``event_type`` maps to an operation (``signup``→I, ``error``→D, else U) —
so the engine's capture/merge semantics are exercised against plain SQL.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import dedup as fdedup
from ..functions.scalar import round_half_away
from ..functions.scalar import round_half_away as _rha
from ..functions import similarity as fsim
from ..stages import stats as fstats

STOPWORDS_SQL = "('the','a','of','to','and','in','is','it','that','for')"


def _minhash_sql(threshold: float = 0.5, source: str = "documents") -> str:
    """DuckDB oracle for the FULL MinHash+LSH near-dup pipeline, generated
    from the same MinHasher instance so the permutation table can never
    drift: md5-based shingle hashes (md5_number_upper), 64 universal hashes
    ``(a*h + b) mod 2^64 & (2^61-1)`` as a literal VALUES table, band
    candidates by exact signature-slice equality (list(mh ORDER BY i) — the
    engine's band_hash is only an equality surrogate for the same tuple),
    then the same exact n-gram Jaccard verify as dedup_jaccard."""
    from ..functions.dedup import MinHasher

    mh = MinHasher()
    r = mh.n_perm // mh.bands
    perms = ",\n                 ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    return rf"""
        WITH docs AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM {source}
        ), grams AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(w) = 0 THEN ['']
                 WHEN len(w) < {mh.k} THEN [array_to_string(w, ' ')]
                 ELSE [array_to_string(w[i:i+{mh.k - 1}], ' ')
                       FOR i IN generate_series(1, len(w) - {mh.k - 1})]
            END) AS gs
          FROM docs
        ), gsets AS (
          SELECT doc_id, unnest(gs) AS g FROM grams
        ), sh AS (
          SELECT doc_id, md5_number_upper(g) AS h FROM gsets
        ), sig AS (
          SELECT doc_id, p.i,
                 MIN(((p.a::HUGEINT * h + p.b) % 18446744073709551616)::UBIGINT
                     & 2305843009213693951) AS mh
          FROM sh CROSS JOIN (VALUES
                 {perms}
          ) p(i, a, b)
          GROUP BY doc_id, p.i
        ), bands AS (
          SELECT doc_id, i // {r} AS band, list(mh ORDER BY i) AS sig_band
          FROM sig GROUP BY doc_id, i // {r}
        ), cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig_band = b.sig_band AND a.doc_id < b.doc_id
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS sz FROM gsets GROUP BY doc_id
        ), inter AS (
          SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS n
          FROM gsets x JOIN gsets y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        SELECT c.a_id, c.b_id,
               ROUND(CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n), 6) AS jac
        FROM cand c
        JOIN inter i USING (a_id, b_id)
        JOIN sizes sa ON sa.doc_id = c.a_id
        JOIN sizes sb ON sb.doc_id = c.b_id
        WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= {threshold}
        ORDER BY a_id, b_id
    """


_JACCARD_EXACT_SQL = r"""
        WITH docs AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
        ), sh AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w)-2)]
            END)) AS g
          FROM docs WHERE len(w) > 0
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS ninter
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               ROUND(CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter), 6) AS jac
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter) >= 0.5
        ORDER BY a_id, b_id
    """


def _dedup_recall_sql() -> str:
    """Eval oracle: the banded-LSH pair set and the exact inverted-index
    pair set are BOTH SQL-expressible, so their set difference is too —
    composing the two full queries as subqueries."""
    return f"""
    WITH lsh AS (SELECT a_id, b_id FROM ({_minhash_sql()})),
         ex  AS (SELECT a_id, b_id FROM ({_JACCARD_EXACT_SQL}))
    SELECT CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh,
           CAST((SELECT COUNT(*) FROM ex JOIN lsh USING (a_id, b_id)) AS BIGINT) AS n_common,
           CAST(CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN 1000
                ELSE (SELECT COUNT(*) FROM ex JOIN lsh USING (a_id, b_id)) * 1000
                     // (SELECT COUNT(*) FROM ex) END AS BIGINT) AS recall_permille
    """


def _langid_sql() -> str:
    """DuckDB oracle for LangIdStage, generated from the same profiles so
    the two can never drift: per-language stopword hit counts, argmax with
    first-profile-wins ties, 'und' when nothing matches."""
    from ..functions.text import _STOPWORDS

    profs = list(_STOPWORDS.items())
    scores = ",\n                 ".join(
        f"len(list_filter(ws, x -> x IN ({', '.join(repr(w) for w in sorted(prof))}))) AS s_{lang}"
        for lang, prof in profs
    )
    gx = f"greatest({', '.join('s_' + lang for lang, _ in profs)})"
    arms = "\n                    ".join(
        f"WHEN s_{lang} = {gx} THEN '{lang}'" for lang, _ in profs[:-1]
    )
    return f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-zà-ÿäöüß'']+') AS ws
          FROM documents
        ), s AS (
          SELECT doc_id,
                 {scores}
          FROM t
        )
        SELECT doc_id,
               CASE WHEN {gx} = 0 THEN 'und'
                    {arms}
                    ELSE '{profs[-1][0]}' END AS pred_lang
        FROM s
        ORDER BY doc_id
    """
def _md5_byte_sql(k: int, col: str = "hx") -> str:
    """SQL for byte k (0-based, as BIGINT) of a LOWERCASE md5-hex column —
    the single strpos-LUT decoder shared by the sketch oracles (_hll_sql,
    _cms_sql). The multimodal oracles keep their own uppercase variant
    (_hx) because DuckDB's hex() emits uppercase while md5() emits
    lowercase."""
    lut = "'0123456789abcdef'"
    return (
        f"((strpos({lut}, substr({col}, {2 * k + 1}, 1)) - 1)::BIGINT * 16"
        f" + strpos({lut}, substr({col}, {2 * k + 2}, 1)) - 1)"
    )


def _hll_sql(p: int = 8, group_col: str | None = None) -> str:
    """DuckDB oracle for the HyperLogLog register table: bucket from md5
    byte 0 (byte-aligned p=8 layout), rank = 33 - bit_length of the
    byte-2..5 suffix, where bit_length = length(ltrim(bin(x), '0')) — an
    exact integer string op, the SQL analog of sketch._bit_length_u32
    (float log2 would be off-by-one at power-of-two boundaries).
    ``group_col`` emits the grouped-register variant."""
    if p != 8:
        raise ValueError("oracle hardcodes the byte-aligned p=8 layout")
    b = _md5_byte_sql
    suffix = f"({b(2)} * 16777216 + {b(3)} * 65536 + {b(4)} * 256 + {b(5)})"
    gsel = f"{group_col}, " if group_col else ""
    return f"""
        WITH d AS (SELECT {gsel}md5(text) AS hx FROM documents WHERE text IS NOT NULL)
        SELECT {gsel}CAST({b(0)} AS BIGINT) AS bucket,
               CAST(MAX(33 - length(ltrim(bin({suffix}), '0'))) AS BIGINT) AS max_rank
        FROM d
        GROUP BY {gsel}bucket
        ORDER BY {gsel}bucket
    """


def _cms_sql(d: int = 4, w: int = 1024) -> str:
    """DuckDB oracle for the count-min cell table: per-token md5, h1/h2
    from bytes [0:4]/[4:8] via the hex LUT, cell_j = (h1 + j*h2) mod w —
    the same two-hash family CountMinStage uses."""
    b = _md5_byte_sql
    h1 = f"({b(0)} * 16777216 + {b(1)} * 65536 + {b(2)} * 256 + {b(3)})"
    h2 = f"({b(4)} * 16777216 + {b(5)} * 65536 + {b(6)} * 256 + {b(7)})"
    js = ", ".join(f"({j})" for j in range(d))
    return f"""
        WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tkn
          FROM documents
        ),
        tc AS (SELECT tkn, COUNT(*) AS n FROM tok GROUP BY tkn),
        h AS (SELECT n, md5(tkn) AS hx FROM tc),
        cells AS (
          SELECT r.j, ({h1} + r.j * {h2}) % {w} AS col, n
          FROM h CROSS JOIN (VALUES {js}) AS r(j)
        )
        SELECT CAST(j AS BIGINT) AS row, CAST(col AS BIGINT) AS col,
               CAST(SUM(n) AS BIGINT) AS n
        FROM cells GROUP BY j, col ORDER BY row, col
    """


STOPWORDS = {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"}

_EMBEDDING_DIM = 64  # the testdata embeddings tables are 64-wide at every sf


def _hyperplane_values_sql(n_bits: int, seed: int, dim: int = _EMBEDDING_DIM) -> str:
    """The seeded hyperplane matrix as a literal SQL VALUES table (b, i, w) —
    generated from the SAME HyperplaneHasher the engine uses, so the two hash
    families can never drift (the _minhash_sql technique applied to float
    hash families; float repr round-trips exactly)."""
    from ..functions.similarity import HyperplaneHasher

    h = HyperplaneHasher(dim, n_bits=n_bits, seed=seed)
    return ",\n                 ".join(
        f"({b}, {i + 1}, {float(h.planes[b, i])!r})"
        for b in range(n_bits)
        for i in range(dim)
    )


def _bucket_cte_sql(n_bits: int, seed: int) -> str:
    """Shared CTE prefix: embeddings → per-(vector, plane) dot products →
    sign-bit bucket ids. Bucketing the RAW vector is sign-identical to the
    engine's bucketing of the normalized vector (normalization scales by a
    positive constant)."""
    return f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), u AS (
          SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x FROM e
        ), p(b, i, w) AS (VALUES
                 {_hyperplane_values_sql(n_bits, seed)}
        ), dots AS (
          SELECT u.vec_id, p.b, SUM(u.x * p.w) AS dot
          FROM u JOIN p ON p.i = u.i
          GROUP BY u.vec_id, p.b
        ), bk AS (
          SELECT vec_id,
                 CAST(SUM(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id
        )"""


def _embedding_lsh_sql(threshold: float = 0.45, n_tables: int = 4) -> str:
    """DuckDB value oracle for dedup_embedding_lsh (VERDICT r2 #3): the same
    4 composite-tagged 4-bit/seed-13+t hyperplane tables, pairs compared
    only within a bucket of SOME table, DISTINCT across tables."""
    return f"""{_bucket_tables_cte_sql(n_bits=4, seed=13, n_tables=n_tables)}
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_cosine_similarity(ea.emb, eb.emb) >= {threshold}
        ORDER BY a_id, b_id
    """


def _bucket_tables_cte_sql(n_bits: int, seed: int, n_tables: int) -> str:
    """Multi-table variant of `_bucket_cte_sql`: table t's planes come from
    seed+t (the engine's construction), and bucket ids carry the table tag
    in the high bits (t·2^n_bits + bucket) so `bk` holds every table's
    assignment in one relation."""
    # build (t, b, i, w) rows per table by prefixing each single-table row
    rows = []
    for t in range(n_tables):
        single = _hyperplane_values_sql(n_bits, seed + t)
        rows.extend(f"({t}, {r.strip().lstrip('(')}" for r in single.split(",\n"))
    planes = ",\n                 ".join(rows)
    return f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), u AS (
          SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x FROM e
        ), p(t, b, i, w) AS (VALUES
                 {planes}
        ), dots AS (
          SELECT u.vec_id, p.t, p.b, SUM(u.x * p.w) AS dot
          FROM u JOIN p ON p.i = u.i
          GROUP BY u.vec_id, p.t, p.b
        ), bk AS (
          SELECT vec_id,
                 CAST(t * {1 << n_bits} +
                      SUM(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS BIGINT)
                   AS bucket
          FROM dots GROUP BY vec_id, t
        )"""


def _ann_lsh_sql(
    k: int = 10, n_bits: int = 8, seed: int = 11, multiprobe: int = 1, n_tables: int = 8
) -> str:
    """DuckDB value oracle for ann_lsh: same seeded buckets per table
    (table t = seed+t, tag in the high bits), each query probes every
    bucket within Hamming distance ``multiprobe`` of its own in EVERY
    table (XOR masks touch only the low n_bits, so the table tag is
    preserved), candidates are the union over tables, top-k by cosine
    with the engine's deterministic (cosine desc, id asc) tie-break."""
    return f"""{_bucket_tables_cte_sql(n_bits, seed, n_tables)}
        , qb AS (
          SELECT vec_id AS query_id, bucket FROM bk WHERE vec_id IN (0, 1, 2, 3, 4)
        ), pr AS (
          SELECT DISTINCT query_id, xor(bucket, m) AS pb
          FROM qb, (SELECT unnest(generate_series(0, {(1 << n_bits) - 1})) AS m)
          WHERE bit_count(CAST(m AS BIGINT)) <= {multiprobe}
        ), cand AS (
          SELECT DISTINCT pr.query_id, v.vec_id AS neighbor_id
          FROM pr JOIN bk v ON v.bucket = pr.pb
          WHERE v.vec_id <> pr.query_id
        ), sc AS (
          SELECT c.query_id, c.neighbor_id,
                 list_cosine_similarity(eq.emb, ev.emb) AS cos
          FROM cand c
          JOIN e eq ON eq.vec_id = c.query_id
          JOIN e ev ON ev.vec_id = c.neighbor_id
        ), rk AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank,
                 ROUND(cos, 6) AS cosine
          FROM sc
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(neighbor_id AS BIGINT) AS neighbor_id,
               CAST(rank AS BIGINT) AS rank, cosine
        FROM rk WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def _kmeans_cte_chain(n_centroids: int, iters: int, sample_rows: int) -> str:
    """The unrolled-Lloyd CTE prefix shared by the IVF ANN and SemDeDup
    oracles: normalized round-9 corpus (``ex``), id-filter sample (``sx``),
    first-k init (``c0``), and ``iters`` chained assign/mean/re-normalize
    rounds ending at centroid CTE ``c{iters}``. Same determinism contract
    as `similarity.py:_kmeans` (see `_ivf_sql`)."""
    head = f"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), ex AS MATERIALIZED (
          -- normalized corpus, long format, rounded to 9 (engine parity)
          SELECT vec_id, i, ROUND(x / GREATEST(nrm, 1e-12), 9) AS x FROM (
            SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x,
                   sqrt(list_sum(list_transform(emb, y -> y * y))) AS nrm
            FROM e)
        ), sx AS MATERIALIZED (
          SELECT * FROM ex WHERE vec_id < {sample_rows}
        ), c0 AS MATERIALIZED (
          -- init: the first {n_centroids} sample vectors, cell = id rank
          SELECT CAST(DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, i, x
          FROM sx WHERE vec_id IN (
            SELECT DISTINCT vec_id FROM sx ORDER BY vec_id LIMIT {n_centroids})
        )"""
    its = []
    for j in range(1, iters + 1):
        its.append(f"""
        , a{j} AS MATERIALIZED (
          -- Lloyd iteration {j}: assign each sample vector to its nearest
          -- centroid (dot on normalized rows; ties toward the lower cell)
          SELECT vec_id, cell FROM (
            SELECT s.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                      ORDER BY SUM(s.x * c.x) DESC, c.cell ASC) AS rn
            FROM sx s JOIN c{j - 1} c ON c.i = s.i
            GROUP BY s.vec_id, c.cell) WHERE rn = 1
        ), m{j} AS MATERIALIZED (
          SELECT a.cell, s.i, AVG(s.x) AS mx
          FROM a{j} a JOIN sx s ON s.vec_id = a.vec_id
          GROUP BY a.cell, s.i
        ), c{j} AS MATERIALIZED (
          -- re-normalized rounded means; empty cells keep their centroid
          SELECT m.cell, m.i, ROUND(m.mx / GREATEST(n.nrm, 1e-12), 9) AS x
          FROM m{j} m JOIN (
            SELECT cell, sqrt(SUM(mx * mx)) AS nrm FROM m{j} GROUP BY cell) n
          ON n.cell = m.cell
          UNION ALL
          SELECT c.cell, c.i, c.x FROM c{j - 1} c
          WHERE c.cell NOT IN (SELECT cell FROM m{j})
        )""")
    return head + "".join(its)


def _bloom_sql(m_bits: int = 1 << 15, k_hashes: int = 4) -> str:
    """DuckDB oracle for corpus_bloom_dedup: the same two-hash family as
    count-min (h1/h2 = md5 bytes [0:4]/[4:8] via the hex LUT), bit
    positions (h1 + j*h2) mod m. The build set is the DISTINCT positions
    of the even docs; membership = every probe position present. Bit
    arithmetic reduces to position-set membership, so engine word packing
    never has to be mirrored — and false positives value-match too."""
    b = _md5_byte_sql
    h1 = f"({b(0)} * 16777216 + {b(1)} * 65536 + {b(2)} * 256 + {b(3)})"
    h2 = f"({b(4)} * 16777216 + {b(5)} * 65536 + {b(6)} * 256 + {b(7)})"
    js = ", ".join(f"({j})" for j in range(k_hashes))
    return f"""
        WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        probe AS (
          SELECT doc_id, ({h1} + r.j * {h2}) % {m_bits} AS pos
          FROM h CROSS JOIN (VALUES {js}) AS r(j)
        ),
        bits AS (
          SELECT DISTINCT pos FROM probe WHERE doc_id % 2 = 0 AND pos IS NOT NULL
        )
        SELECT doc_id,
               COALESCE(bool_and(pos IN (SELECT pos FROM bits)), FALSE)
                 AS maybe_member
        FROM probe GROUP BY doc_id ORDER BY doc_id
    """


def _ivf_sql(
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 8,
    sample_rows: int = 2048,
) -> str:
    """DuckDB value oracle for ann_ivf: the full IVF pipeline — Lloyd's
    k-means coarse-quantizer training included — re-derived in SQL.

    The engine (`similarity.py:_kmeans`/`ivf_topk`) is deliberately
    SQL-expressible: sample = ``vec_id < sample_rows``, init = first k sample
    vectors, a FIXED number of Lloyd iterations unrolled as chained CTEs
    (`_kmeans_cte_chain`), argmax ties toward the lower cell, and every
    normalized vector / centroid rounded to 9 decimals so numpy
    (pairwise-sum BLAS) and DuckDB (sequential SUM) quantize to identical
    values."""
    tail = f"""
        , qx AS MATERIALIZED (
          SELECT * FROM ex WHERE vec_id IN (0, 1, 2, 3, 4)
        ), qp AS MATERIALIZED (
          -- each query probes its {n_probe} nearest cells
          SELECT vec_id AS query_id, cell FROM (
            SELECT q.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY SUM(q.x * c.x) DESC, c.cell ASC) AS rn
            FROM qx q JOIN c{iters} c ON c.i = q.i
            GROUP BY q.vec_id, c.cell) WHERE rn <= {n_probe}
        ), asg AS MATERIALIZED (
          -- corpus → cell assignment (same argmax as the sample assignment)
          SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY SUM(v.x * c.x) DESC, c.cell ASC) AS rn
            FROM ex v JOIN c{iters} c ON c.i = v.i
            GROUP BY v.vec_id, c.cell) WHERE rn = 1
        ), cand AS MATERIALIZED (
          SELECT qp.query_id, a.vec_id AS neighbor_id
          FROM qp JOIN asg a ON a.cell = qp.cell
          WHERE a.vec_id <> qp.query_id
        ), sc AS MATERIALIZED (
          SELECT c.query_id, c.neighbor_id, SUM(q.x * v.x) AS cos
          FROM cand c
          JOIN ex q ON q.vec_id = c.query_id
          JOIN ex v ON v.vec_id = c.neighbor_id AND v.i = q.i
          GROUP BY c.query_id, c.neighbor_id
        ), rk AS MATERIALIZED (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank,
                 ROUND(cos, 6) AS cosine
          FROM sc
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(neighbor_id AS BIGINT) AS neighbor_id,
               CAST(rank AS BIGINT) AS rank, cosine
        FROM rk WHERE rank <= {k}
        ORDER BY query_id, rank
    """
    return _kmeans_cte_chain(n_centroids, iters, sample_rows) + tail


def _semdedup_sql(
    threshold: float = 0.45,
    n_centroids: int = 16,
    iters: int = 8,
    sample_rows: int = 2048,
) -> str:
    """DuckDB value oracle for dedup_semantic: the SAME unrolled-Lloyd
    quantizer chain as the IVF oracle, then within-cell pairs filtered on
    round-6 cosine — the SQL restatement of SemDeDup's cluster-local
    quadratic comparison (`functions/dedup.py:semantic_dup_pairs`)."""
    tail = f"""
        , asg AS MATERIALIZED (
          -- corpus → cell assignment (argmax, ties toward the lower cell)
          SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY SUM(v.x * c.x) DESC, c.cell ASC) AS rn
            FROM ex v JOIN c{iters} c ON c.i = v.i
            GROUP BY v.vec_id, c.cell) WHERE rn = 1
        ), p AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 ROUND(SUM(va.x * vb.x), 6) AS cosine
          FROM asg a
          JOIN asg b ON b.cell = a.cell AND b.vec_id > a.vec_id
          JOIN ex va ON va.vec_id = a.vec_id
          JOIN ex vb ON vb.vec_id = b.vec_id AND vb.i = va.i
          GROUP BY a.vec_id, b.vec_id
        )
        SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id, cosine
        FROM p WHERE cosine >= {threshold}
        ORDER BY a_id, b_id
    """
    return _kmeans_cte_chain(n_centroids, iters, sample_rows) + tail


def _pq_sql(
    m: int = 4,
    ks: int = 16,
    iters: int = 4,
    sample_rows: int = 256,
    final: str = "codes",
    query_ids: list[int] | None = None,
    k: int = 10,
) -> str:
    """DuckDB value oracle for pq_codes: per-subspace L2 Lloyd k-means
    (unrolled as chained CTEs, one chain for ALL subspaces via a (sub, cell)
    group key) + whole-corpus encoding. Same determinism contract as
    `_ivf_sql`: sample = id filter, init = first-k rows, ties toward the
    lower cell, round-9 centroids, round-6 errors."""
    head = f"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), ex AS MATERIALIZED (
          SELECT vec_id, i, ROUND(x / GREATEST(nrm, 1e-12), 9) AS x,
                 CAST(((i - 1) * {m}) // d AS BIGINT) AS sub
          FROM (
            SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x,
                   sqrt(list_sum(list_transform(emb, y -> y * y))) AS nrm,
                   len(emb) AS d
            FROM e)
        ), sx AS MATERIALIZED (
          SELECT * FROM ex WHERE vec_id < {sample_rows}
        ), c0 AS MATERIALIZED (
          -- per-subspace init: the first {ks} sample vectors' subvectors
          SELECT sub,
                 CAST(DENSE_RANK() OVER (PARTITION BY sub ORDER BY vec_id) - 1
                      AS BIGINT) AS cell, i, x
          FROM sx WHERE vec_id IN (
            SELECT DISTINCT vec_id FROM sx ORDER BY vec_id LIMIT {ks})
        )"""
    its = []
    for j in range(1, iters + 1):
        its.append(f"""
        , a{j} AS MATERIALIZED (
          SELECT vec_id, sub, cell FROM (
            SELECT s.vec_id, s.sub, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                     ORDER BY SUM((s.x - c.x) * (s.x - c.x)) ASC, c.cell ASC) AS rn
            FROM sx s JOIN c{j - 1} c ON c.i = s.i AND c.sub = s.sub
            GROUP BY s.vec_id, s.sub, c.cell) WHERE rn = 1
        ), m{j} AS MATERIALIZED (
          SELECT a.sub, a.cell, s.i, ROUND(AVG(s.x), 9) AS x
          FROM a{j} a JOIN sx s ON s.vec_id = a.vec_id AND s.sub = a.sub
          GROUP BY a.sub, a.cell, s.i
        ), c{j} AS MATERIALIZED (
          -- empty cells keep their previous centroid
          SELECT c.sub, c.cell, c.i, COALESCE(m.x, c.x) AS x
          FROM c{j - 1} c LEFT JOIN m{j} m
            ON m.sub = c.sub AND m.cell = c.cell AND m.i = c.i
        )""")
    code_cols = ",\n               ".join(
        f"CAST(MAX(CASE WHEN sub = {s} THEN cell END) AS BIGINT) AS code_{s}"
        for s in range(m)
    )
    asgn = f"""
        , asgn AS (
          SELECT vec_id, sub, cell, dist FROM (
            SELECT x.vec_id, x.sub, c.cell,
                   SUM((x.x - c.x) * (x.x - c.x)) AS dist,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.sub
                     ORDER BY SUM((x.x - c.x) * (x.x - c.x)) ASC, c.cell ASC) AS rn
            FROM ex x JOIN c{iters} c ON c.i = x.i AND c.sub = x.sub
            GROUP BY x.vec_id, x.sub, c.cell) WHERE rn = 1
        )"""
    if final == "codes":
        tail = f"""
        SELECT vec_id,
               {code_cols},
               ROUND(SUM(dist), 6) AS recon_err
        FROM asgn GROUP BY vec_id ORDER BY vec_id
    """
        return head + "".join(its) + asgn + tail
    # final == "topk": ADC search — exact query subvectors vs corpus codes
    qlist = ", ".join(str(q) for q in (query_ids or []))
    tail = f"""
        , cdist AS (
          -- per (query, sub, cell) partial distance: the SQL analog of the
          -- engine's broadcast ADC lookup table
          SELECT q.vec_id AS qid, c.sub, c.cell,
                 SUM((q.x - c.x) * (q.x - c.x)) AS d
          FROM ex q JOIN c{iters} c ON c.i = q.i AND c.sub = q.sub
          WHERE q.vec_id IN ({qlist})
          GROUP BY q.vec_id, c.sub, c.cell
        ), adc AS (
          SELECT cd.qid AS query_id, a.vec_id AS neighbor_id,
                 ROUND(SUM(cd.d), 6) AS adc_dist
          FROM asgn a JOIN cdist cd ON cd.sub = a.sub AND cd.cell = a.cell
          GROUP BY cd.qid, a.vec_id
        ), ranked AS (
          SELECT query_id, neighbor_id, adc_dist,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist ASC, neighbor_id ASC) AS BIGINT) AS rank
          FROM adc
        )
        SELECT query_id, neighbor_id, rank, adc_dist FROM ranked
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """
    return head + "".join(its) + asgn + tail


def _dsir_sql(final: str = "weights", m: int = 256, alpha: float = 0.5) -> str:
    """DuckDB value oracle for the DSIR family: hashed uni+bigram buckets
    (md5_number_upper % m), add-α bucket models for the lang='en' target vs
    the raw corpus, λ in int64 micro-units (ROUND(λ·1e6) — the ONLY float
    step, evaluated identically by numpy), per-doc weights as exact integer
    sums. ``final='sample'`` appends the Efraimidis-Spirakis resampling leg
    (the paper's selection step): w = exp(log_weight/1e6), key = ln(u)/w
    with the same md5-dyadic u as corpus_sample_weighted, top-100."""
    head = f"""
        WITH tok AS (
          SELECT doc_id, lang, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
          FROM (SELECT doc_id, lang,
                       regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
                FROM documents)
        ), big AS (
          SELECT doc_id, lang,
                 w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS g
          FROM tok
        ), grams AS (
          SELECT doc_id, lang, w AS g FROM tok
          UNION ALL
          SELECT doc_id, lang, g FROM big WHERE g IS NOT NULL
        ), b AS (
          SELECT doc_id, lang,
                 CAST(md5_number_upper(g) % {m} AS BIGINT) AS bucket
          FROM grams
        ), agg AS (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_all,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_target
          FROM b GROUP BY bucket
        ), tot AS (
          SELECT CAST(SUM(n_all) AS BIGINT) AS q, CAST(SUM(n_target) AS BIGINT) AS p
          FROM agg
        ), lam AS (
          SELECT a.bucket,
                 CAST(ROUND((ln((a.n_target + {alpha}) / (t.p + {alpha} * {m}))
                           - ln((a.n_all + {alpha}) / (t.q + {alpha} * {m}))) * 1000000,
                            0) AS BIGINT) AS l
          FROM agg a CROSS JOIN tot t
        ), scored AS (
          SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(l.l) AS BIGINT) AS log_weight_micro
          FROM b JOIN lam l ON l.bucket = b.bucket
          GROUP BY b.doc_id
        ), dw AS (
          SELECT d.doc_id,
                 CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
                 CAST(COALESCE(s.log_weight_micro, 0) AS BIGINT) AS log_weight_micro
          FROM documents d LEFT JOIN scored s USING (doc_id)
        )"""
    if final == "weights":
        return head + """
        SELECT doc_id, n_grams, log_weight_micro FROM dw ORDER BY doc_id
    """
    return head + f"""
        , keyed AS (
          SELECT doc_id, log_weight_micro,
                 ln(({_md5_byte_sql(0)} * 16777216 + {_md5_byte_sql(1)} * 65536
                     + {_md5_byte_sql(2)} * 256 + {_md5_byte_sql(3)} + 1)
                    / 4294967296.0) / exp(log_weight_micro / 1000000.0) AS es_key
          FROM (SELECT doc_id, log_weight_micro,
                       md5(CAST(doc_id AS VARCHAR)) AS hx
                FROM dw)
        )
        SELECT doc_id, log_weight_micro, ROUND(es_key, 6) AS es_key
        FROM (SELECT * FROM keyed ORDER BY es_key DESC LIMIT 100)
        ORDER BY doc_id
    """


def _divergence_sql(m: int = 256, alpha: float = 0.5) -> str:
    """DuckDB value oracle for corpus_divergence: the DSIR gram/bucket
    derivation, counts split target/rest over a dense bucket spine, add-α
    smoothing, per-bucket JS contributions in int64 micro-nats (same
    left-associative float expression as numpy — the ONLY float step)."""
    return f"""
        WITH tok AS (
          SELECT doc_id, lang, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
          FROM (SELECT doc_id, lang,
                       regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
                FROM documents)
        ), big AS (
          SELECT doc_id, lang,
                 w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS g
          FROM tok
        ), grams AS (
          SELECT doc_id, lang, w AS g FROM tok
          UNION ALL
          SELECT doc_id, lang, g FROM big WHERE g IS NOT NULL
        ), b AS (
          SELECT lang, CAST(md5_number_upper(g) % {m} AS BIGINT) AS bucket
          FROM grams
        ), agg AS (
          SELECT bucket,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_b
          FROM b GROUP BY bucket
        ), spine AS (
          SELECT unnest(generate_series(0, {m - 1})) AS bucket
        ), d AS (
          SELECT s.bucket,
                 CAST(COALESCE(a.n_a, 0) AS BIGINT) AS n_a,
                 CAST(COALESCE(a.n_b, 0) AS BIGINT) AS n_b
          FROM spine s LEFT JOIN agg a ON a.bucket = s.bucket
        ), tot AS (
          SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM d
        ), pq AS (
          SELECT d.bucket, d.n_a, d.n_b,
                 (d.n_a + {alpha}) / (t.ta + {alpha} * {m}) AS p,
                 (d.n_b + {alpha}) / (t.tb + {alpha} * {m}) AS q
          FROM d CROSS JOIN tot t)
        SELECT CAST(bucket AS BIGINT) AS bucket, n_a, n_b,
               CAST(ROUND((0.5 * p * ln(p / ((p + q) / 2.0))
                         + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1000000,
                          0) AS BIGINT) AS js_contrib_micro
        FROM pq
        ORDER BY bucket
    """


def _pca_power_sql(iters: int = 3, coord_scale: int = 1000,
                   v_scale: int = 1_000_000) -> str:
    """DuckDB value oracle for embedding_pca_power: the identical integer
    power iteration unrolled as chained CTEs. Every step is exact BIGINT
    arithmetic — coordinates quantize via ROUND(x·scale) (the only float
    op, computed identically by numpy's round_half_away), the Gram matrix
    is an integer self-join sum, and the rescale uses DuckDB's BIGINT
    ``//`` (truncation toward zero), which the engine emulates as
    ``sign(w)·(|w| // div)`` — NOT Python floor division. Hash-exact."""
    head = f"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), ex AS MATERIALIZED (
          SELECT vec_id, generate_subscripts(emb, 1) AS i,
                 CAST(ROUND(unnest(emb) * {coord_scale}, 0) AS BIGINT) AS x
          FROM e
        ), g AS MATERIALIZED (
          SELECT a.i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS g
          FROM ex a JOIN ex b ON b.vec_id = a.vec_id
          GROUP BY a.i, b.i
        ), v0 AS MATERIALIZED (
          SELECT DISTINCT i, CAST(1 AS BIGINT) AS val FROM ex
        )"""
    its = []
    for t in range(1, iters + 1):
        its.append(f"""
        , w{t} AS MATERIALIZED (
          SELECT g.i, CAST(SUM(g.g * v.val) AS BIGINT) AS w
          FROM g JOIN v{t - 1} v ON v.i = g.j
          GROUP BY g.i
        ), m{t} AS MATERIALIZED (
          SELECT GREATEST(CAST(1 AS BIGINT), MAX(ABS(w)) // {v_scale}) AS dv
          FROM w{t}
        ), v{t} AS MATERIALIZED (
          SELECT i, w // dv AS val FROM w{t} CROSS JOIN m{t}
        )""")
    tail = f"""
        SELECT ex.vec_id, CAST(SUM(ex.x * v.val) AS BIGINT) AS proj_units
        FROM ex JOIN v{iters} v ON v.i = ex.i
        GROUP BY ex.vec_id
        ORDER BY ex.vec_id
    """
    return head + "".join(its) + tail


def _corpus_split_sql(seed: int = 7, n_buckets: int = 10_000) -> str:
    """DuckDB value oracle for corpus_split: the same md5 id-bucket
    (md5_number_upper == the engine's little-endian first-8-bytes integer)
    and the same integer bucket edges generated from one weight map."""
    from ..functions.corpus import DEFAULT_SPLIT_WEIGHTS, split_edges

    labels, edges = split_edges(DEFAULT_SPLIT_WEIGHTS, n_buckets)
    case = " ".join(
        f"WHEN bucket < {edge} THEN '{label}'"
        for label, edge in zip(labels[:-1], edges[:-1])
    )
    return f"""
        SELECT doc_id, bucket,
               CASE {case} ELSE '{labels[-1]}' END AS split
        FROM (
          SELECT doc_id,
                 CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':{seed}')
                      % {n_buckets} AS BIGINT) AS bucket
          FROM documents)
        ORDER BY doc_id
    """


CORPUS_SAMPLE_RATES: dict[str, float] = {"en": 0.1, "de": 0.5, "fr": 0.35}


def _corpus_sample_sql(seed: int = 99, default_rate: float = 0.2) -> str:
    """DuckDB oracle for corpus_sample: identical md5 id-bucket and the
    same per-stratum integer thresholds (hash_sample's SAMPLE_BUCKETS)."""
    from ..functions.corpus import SAMPLE_BUCKETS

    case = " ".join(
        f"WHEN lang = '{k}' THEN {int(round(v * SAMPLE_BUCKETS))}"
        for k, v in CORPUS_SAMPLE_RATES.items()
    )
    return f"""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':{seed}')
                      % {SAMPLE_BUCKETS} AS BIGINT) AS bucket
          FROM documents)
        WHERE bucket < (CASE {case}
                        ELSE {int(round(default_rate * SAMPLE_BUCKETS))} END)
        ORDER BY doc_id
    """


def _clusters_sql() -> str:
    """DuckDB oracle for dedup_clusters: the same MinHash+LSH pair graph
    (_minhash_sql), walked with a recursive CTE — cluster id = min doc id
    reachable through the undirected pair edges; singletons (the base case
    covers EVERY document) are their own cluster."""
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_sql()}),
        edges AS (
          SELECT a_id AS s, b_id AS d FROM pairs
          UNION
          SELECT b_id, a_id FROM pairs
        ),
        walk(node, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.d, w.lab FROM walk w JOIN edges e ON e.s = w.node
        )
        SELECT node AS doc_id,
               MIN(lab) AS cluster_id,
               (node = MIN(lab)) AS is_canonical
        FROM walk GROUP BY node ORDER BY doc_id
    """


def _corpus_prep_sql() -> str:
    """One value oracle for the composed corpus_prep flagship: quality gate →
    gram-set decontamination → minhash-pair connected components (canonical
    survivor) → split CASE → window prefix-sum packing."""
    from ..functions.corpus import DEFAULT_SPLIT_WEIGHTS, split_edges

    labels, edges = split_edges(DEFAULT_SPLIT_WEIGHTS, 10_000)
    case = " ".join(
        f"WHEN bucket < {e} THEN '{l}'" for l, e in zip(labels[:-1], edges[:-1])
    )
    gram_case = (
        "CASE WHEN len(w) = 0 THEN [''] "
        "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
        "ELSE [array_to_string(w[i:i+2], ' ') "
        "FOR i IN generate_series(1, len(w) - 2)] END"
    )
    return rf"""
        WITH RECURSIVE gate AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id % 97 <> 0
            AND len(string_split(text, ' ')) >= 20
            AND CAST(len(list_filter(string_split(text, ' '),
                                     x -> x IN {STOPWORDS_SQL})) AS DOUBLE)
                / len(string_split(text, ' ')) >= 0.02
        ), bw AS (
          SELECT regexp_extract_all(lower(text), '\w+') AS w
          FROM documents WHERE doc_id % 97 = 0
        ), bgrams AS (
          SELECT DISTINCT unnest({gram_case}) AS gr FROM bw
        ), gw AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM gate
        ), ggrams AS (
          SELECT doc_id, unnest({gram_case}) AS gr FROM gw
        ), contaminated AS (
          SELECT DISTINCT doc_id FROM ggrams JOIN bgrams USING (gr)
        ), clean AS (
          SELECT doc_id, text FROM gate
          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), pairs AS ({_minhash_sql(source="clean")}
        ), edges AS (
          SELECT a_id AS s, b_id AS d FROM pairs
          UNION
          SELECT b_id, a_id FROM pairs
        ), walk(node, lab) AS (
          SELECT doc_id, doc_id FROM clean
          UNION
          SELECT e.d, wk.lab FROM walk wk JOIN edges e ON e.s = wk.node
        ), comp AS (
          SELECT node AS doc_id, MIN(lab) AS cid FROM walk GROUP BY node
        ), surv AS (
          SELECT c.doc_id, cl.text FROM comp c JOIN clean cl USING (doc_id)
          WHERE c.doc_id = c.cid
        ), tok AS (
          SELECT doc_id,
                 CASE WHEN COALESCE(LENGTH(text), 0) = 0 THEN 0
                      ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                 END AS n_tokens
          FROM surv
        ), cum AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
          FROM tok
        )
        SELECT doc_id,
               CASE {case} ELSE '{labels[-1]}' END AS split,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(off // 2048 AS BIGINT) AS pack_id,
               CAST(off % 2048 AS BIGINT) AS pack_offset
        FROM (SELECT *, CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':7')
                             % 10000 AS BIGINT) AS bucket
              FROM cum)
        ORDER BY doc_id
    """


def _read(
    sf_dir: str, table: str, columns: list[str] | None = None, filter=None
) -> rd.Dataset:
    """Column-pruned parquet read with a metadata-free schema: the testdata
    files carry pandas schema metadata that makes pa.Schema unhashable, which
    defeats Ray's block-schema deduplication (the 'Failed to hash the
    schemas' warning) — pass an explicit clean schema instead.

    ``filter`` (a ``pyarrow.dataset`` expression) pushes row predicates into
    the parquet scan itself — row groups whose statistics exclude the
    predicate never leave storage, which is the difference between scanning
    100 TB and scanning the matching slice."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    full = pq.read_schema(path)
    names = columns or full.names
    clean = pa.schema([pa.field(n, full.field(n).type) for n in names])
    return rd.read_parquet(path, columns=columns, schema=clean, filter=filter)


# ---------------------------------------------------------------------------
# CDC operators over the events binlog
# ---------------------------------------------------------------------------


def cdc_lake_state(sf_dir: str) -> pd.DataFrame:
    """Flagship merge semantics (D1/T2/W1): last-writer-wins per key with
    delete tombstones — the converged lake state of the events binlog."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])

    def partial_last(batch: pa.Table) -> pa.Table:
        # per-batch combiner: argmax event_id per user (cuts shuffle volume)
        gb = (
            pa.table({"user_id": batch["user_id"], "event_id": batch["event_id"]})
            .group_by("user_id")
            .aggregate([("event_id", "max")])
        )
        mask = pc.is_in(batch["event_id"], value_set=gb["event_id_max"].combine_chunks())
        return batch.filter(mask)

    def final_last(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("event_id", "descending")])
        return group.take(idx[:1])

    out = (
        ds.map_batches(partial_last, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(final_last, batch_format="pyarrow")
        .map_batches(  # tombstone drop, vectorized
            lambda t: t.filter(pc.invert(pc.equal(t["event_type"], "error"))),
            batch_format="pyarrow",
        )
    )
    pdf = out.to_pandas().rename(
        columns={"event_id": "last_event_id", "event_type": "last_event_type", "value": "last_value"}
    )
    return pdf[["user_id", "last_event_id", "last_event_type", "last_value"]].sort_values("user_id").reset_index(drop=True)


def cdc_capture_project_filter(sf_dir: str) -> pd.DataFrame:
    """M2+M3: per-op column projection + condition predicate, AT THE READ —
    the predicate is pushed into the parquet scan (row-group statistics
    pruning), so non-matching data never leaves storage; the in-batch
    filter remains only to catch rows the coarse row-group stats let
    through."""
    import pyarrow.dataset as pads

    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "value"],
        filter=(pads.field("event_type") == "click") & (pads.field("value") > 100.0),
    )
    out = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["event_type"], "click"), pc.greater(t["value"], 100.0))
        ).select(["event_id", "user_id", "value"]),
        batch_format="pyarrow",
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def cdc_update_suppression(sf_dir: str) -> pd.DataFrame:
    """M4: update-only-on-change — drop events whose value equals the key's
    previous value (NULL-safe; the first event per key always passes).

    Coarse-bucket shape: groupby(user_id % B).map_groups with ONE vectorized
    sort + groupby-shift per bucket — a per-user map_groups pays one Python
    call per key (thousands), measured ~2x slower on this query (the r2
    bench regression) and unusable at key counts beyond the driver."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    B = 32

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        return batch.append_column("part", pc.bit_wise_and(uid.cast(pa.int64()), B - 1))

    def suppress_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"])
        prev = g.groupby("user_id", sort=False)["value"].shift(1)
        changed = (g["value"] != prev) | prev.isna()
        return g.loc[changed, ["event_id", "user_id", "value"]]

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(suppress_bucket, batch_format="pandas")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)[
        ["event_id", "user_id", "value"]
    ]


def cdc_key_modes(sf_dir: str) -> pd.DataFrame:
    """M7: message-key derivation modes P (pk JSON), F (fixed), T (txn id)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def keys(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].combine_chunks() if isinstance(batch["user_id"], pa.ChunkedArray) else batch["user_id"]
        eid = batch["event_id"].combine_chunks() if isinstance(batch["event_id"], pa.ChunkedArray) else batch["event_id"]
        key_pk = pc.binary_join_element_wise('{"user_id": ', uid.cast(pa.string()), "}", "")
        key_fixed = pa.array(["events"] * len(batch), pa.string())
        txn = pc.binary_join_element_wise(
            "txn-", pc.divide(eid, pa.scalar(50, pa.int64())).cast(pa.string()), ""
        )
        return pa.table(
            {"event_id": eid, "key_pk": key_pk, "key_fixed": key_fixed, "key_txn": txn}
        )

    return _sorted_pdf(ds.map_batches(keys, batch_format="pyarrow"), "event_id")


def cdc_envelope(sf_dir: str) -> pd.DataFrame:
    """M8-M11: envelope assembly — op long name, ISO-8601 timestamp with the
    DB-timezone suffix (reference timestamp_as_iso_string,
    `transfer_thread.rb:528-530`), topic routing by logical table."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "user_id"])

    def envelope(batch: pd.DataFrame) -> pd.DataFrame:
        op = np.where(
            batch["event_type"] == "signup",
            "INSERT",
            np.where(batch["event_type"] == "error", "DELETE", "UPDATE"),
        )
        return pd.DataFrame(
            {
                "event_id": batch["event_id"],
                "operation": op,
                "timestamp": batch["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + "+00:00",
                "topic": "lake.events." + batch["event_type"],
                "msg_schema": "EVENTS",
                "tablename": "USER_EVENTS",
            }
        )

    return _sorted_pdf(ds.map_batches(envelope, batch_format="pandas"), "event_id")


def cdc_stats_rollup(sf_dir: str) -> pd.DataFrame:
    """A1+A2: grouped throughput counters with time-bucket compression."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = fstats.time_rollup(ds, "ts", "hour", ["event_type"], ["value"])
    pdf = out.to_pandas()
    pdf["sum_value"] = round_half_away(pdf["sum_value"], 6)
    return pdf.sort_values(["event_type", "time_bucket"]).reset_index(drop=True)[
        ["event_type", "time_bucket", "sum_value", "min_ts", "max_ts", "n_rows"]
    ]


def cdc_watermarks(sf_dir: str) -> pd.DataFrame:
    """T2/W2: per-partition monotonic watermarks (max applied id + count)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.subtract(
                batch["user_id"].combine_chunks() if isinstance(batch["user_id"], pa.ChunkedArray) else batch["user_id"],
                pc.multiply(
                    pc.divide(
                        batch["user_id"].combine_chunks() if isinstance(batch["user_id"], pa.ChunkedArray) else batch["user_id"],
                        pa.scalar(8, pa.int64()),
                    ),
                    pa.scalar(8, pa.int64()),
                ),
            ),
            pa.int64(),
        )
        return batch.append_column("part", part)

    from ray.data.aggregate import Count, Max

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Max("event_id", alias_name="watermark"), Count(alias_name="n_events"))
    )
    return _sorted_pdf(out, "part")


def cdc_snapshot_init(sf_dir: str) -> pd.DataFrame:
    """S7+O4: INIT snapshot load with initialization filter + ORDER BY,
    emitting op='i' (INIT) envelope rows."""
    import pyarrow.dataset as pads

    # initialization filter pushed into the parquet scan: row groups whose
    # c_acctbal stats exclude the predicate never leave storage (O4's ORDER
    # BY still needs the full matching slice, so the sort stays).
    ds = _read(sf_dir, "customer", filter=pads.field("c_acctbal") > 0.0)
    ds = ds.sort("c_custkey")

    def wrap(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": batch["c_name"],
                "c_acctbal": batch["c_acctbal"],
                "op": pa.array(["i"] * n),
                "operation": pa.array(["INIT"] * n),
            }
        )

    return _sorted_pdf(ds.map_batches(wrap, batch_format="pyarrow"), "c_custkey")


def cdc_retry_backoff(sf_dir: str) -> pd.DataFrame:
    """W3: retry ledger with exponential backoff 20 * 3^(retry-1) seconds."""
    import pyarrow.dataset as pads

    # op-type predicate pushed into the scan (only 'error' rows leave storage)
    ds = _read(
        sf_dir, "events", ["event_id", "event_type"],
        filter=pads.field("event_type") == "error",
    )

    def backoff(t: pa.Table) -> pa.Table:
        eid = t["event_id"].combine_chunks() if isinstance(t["event_id"], pa.ChunkedArray) else t["event_id"]
        eid_np = eid.to_numpy(zero_copy_only=False)
        retry = (eid_np % 5 + 1).astype(np.int64)
        delay = 20.0 * np.power(3.0, (retry - 1).astype(np.float64))
        return pa.table(
            {
                "event_id": eid,
                "retry_count": pa.array(retry),
                "delay_sec": pa.array(delay),
            }
        )

    return _sorted_pdf(ds.map_batches(backoff, batch_format="pyarrow"), "event_id")


def cdc_payload_parse(sf_dir: str) -> pd.DataFrame:
    """M5-adjacent: payload JSON parsing (props → typed column)."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["props"].str.extract(r'"k": (\d+)', expand=False).astype("int64")
        return pd.DataFrame({"event_id": batch["event_id"], "k": k})

    return _sorted_pdf(ds.map_batches(parse, batch_format="pandas"), "event_id")


def cdc_dlq_routing(sf_dir: str) -> pd.DataFrame:
    """§2.11/W3: divide&conquer outcome classification — success vs delayed
    (retryable) vs final errors, counted per counter_type (A1 shape)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def classify(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].combine_chunks() if isinstance(batch["event_type"], pa.ChunkedArray) else batch["event_type"]
        val = batch["value"].combine_chunks() if isinstance(batch["value"], pa.ChunkedArray) else batch["value"]
        is_err = pc.equal(et, "error")
        final = pc.and_(is_err, pc.greater(val, 180.0))
        ct = pc.if_else(
            final,
            pa.scalar("events_final_errors"),
            pc.if_else(is_err, pa.scalar("events_delayed_errors"), pa.scalar("events_success")),
        )
        return pa.table({"counter_type": ct})

    from ray.data.aggregate import Count

    out = ds.map_batches(classify, batch_format="pyarrow").groupby("counter_type").aggregate(
        Count(alias_name="events")
    )
    return _sorted_pdf(out, "counter_type")


# ---------------------------------------------------------------------------
# generic engine ops on TPC-H tables
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with per-batch partial pre-aggregation (the A1
    'partial then finalize' pattern). Money sums in integer cents with
    floor(x*100+0.5) so the float oracle agrees bit-for-bit."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        pdf["sum_qty"] = pdf["l_quantity"]
        pdf["base_cents"] = np.floor(pdf["l_extendedprice"] * 100 + 0.5).astype("int64")
        pdf["disc_cents"] = np.floor(
            pdf["l_extendedprice"] * (1 - pdf["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = (
            pdf.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("sum_qty", "sum"),
                sum_base_cents=("base_cents", "sum"),
                sum_disc_cents=("disc_cents", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        # explicit declared schema (no pandas metadata) so every partial
        # block hashes identically for Ray's schema dedup
        return pa.table(
            {"l_returnflag": pa.array(g["l_returnflag"], pa.string()),
             "l_linestatus": pa.array(g["l_linestatus"], pa.string()),
             "sum_qty": pa.array(g["sum_qty"], pa.float64()),
             "sum_base_cents": pa.array(g["sum_base_cents"], pa.int64()),
             "sum_disc_cents": pa.array(g["sum_disc_cents"], pa.int64()),
             "count_order": pa.array(g["count_order"], pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    pdf = out.to_pandas()
    pdf["sum_qty"] = round_half_away(pdf["sum_qty"], 2)
    return pdf.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: scan → pushed-down predicate → scalar sum. The ship-date
    band is a ``pyarrow.dataset`` filter expression, so row groups whose
    min/max statistics exclude 1996 never leave storage — at 100 TB this is a
    ~1/6th scan, not a full pass. The discount band compares in integer cents
    (``floor(x*100+0.5)``) so no float-literal boundary can diverge between
    numpy doubles and DuckDB decimals. Per-batch partials reduce each block to
    ONE row; the only exchange is the kilobyte partial stream."""
    import pyarrow.dataset as pads

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        disc_c = np.floor(disc * 100 + 0.5).astype("int64")
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        mask = (disc_c >= 2) & (disc_c <= 4) & (qty < 24)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[mask]
        rev = np.floor(ep * disc[mask] * 100 + 0.5).astype("int64").sum()
        return pa.table(
            {"revenue_cents": pa.array([int(rev)], pa.int64()),
             "n_items": pa.array([int(mask.sum())], pa.int64())}
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    ) or {}  # Dataset.aggregate returns None when the filter matched nothing
    return pd.DataFrame(
        {"revenue_cents": [int(agg.get("revenue_cents") or 0)],
         "n_items": [int(agg.get("n_items") or 0)]}
    )


# declared exchange schema shared by BOTH q3 join stages (and the lineitem
# tag), so every union side block-concats without slow schema unification
_Q3_STAGE2_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("orderkey", pa.int64()), ("rev_cents", pa.int64()),
     ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
     ("side", pa.string())]
)


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: two REDUCE-SIDE joins (no broadcast anywhere — at
    100 TB both customer and orders are fact-sized, so neither side ships to
    every task). Stage 1 co-locates filtered customers and orders by
    ``custkey % B`` and semi-joins inside ``map_groups``; stage 2 co-locates
    the surviving orders with date-filtered lineitem by ``orderkey % B`` and
    joins + aggregates per bucket. Because orderkey groups are complete
    within their bucket, each bucket emits only its LOCAL top-10 — the driver
    merges B×10 rows, never the full order list. All three reads carry pushed
    predicates (segment / order-date / ship-date)."""
    B = 16
    seg, cutoff = "BUILDING", datetime(1998, 3, 15)
    import pyarrow.dataset as pads

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 filter=(pads.field("c_mktsegment") == seg))
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") < cutoff),
    )
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") > cutoff),
    )

    # ---- stage 1: orders ⋉ customer[segment] on custkey (reduce-side) ----
    def tag_cust(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].combine_chunks() if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": pa.nulls(n, pa.int64()),
             "o_orderdate": pa.nulls(n, pa.timestamp("us")),
             "o_orderpriority": pa.nulls(n, pa.string()),
             "side": pa.array(["C"] * n, pa.string())}
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].combine_chunks() if isinstance(batch["o_custkey"], pa.ChunkedArray) else batch["o_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": batch["o_orderkey"].cast(pa.int64()),
             "o_orderdate": batch["o_orderdate"].cast(pa.timestamp("us")),
             "o_orderpriority": batch["o_orderpriority"].cast(pa.string()),
             "side": pa.array(["O"] * n, pa.string())}
        )

    def semi_bucket(g: pd.DataFrame) -> pa.Table:
        keep_keys = g.loc[g["side"] == "C", "custkey"].to_numpy()
        o = g[g["side"] == "O"]
        o = o[np.isin(o["custkey"].to_numpy(), keep_keys)]
        ok = o["orderkey"].to_numpy(dtype="int64", na_value=0)
        return pa.table(
            {"bucket": pa.array(ok & (B - 1), pa.int64()),
             "orderkey": pa.array(ok, pa.int64()),
             "rev_cents": pa.array(np.zeros(len(o), dtype="int64")),
             "o_orderdate": pa.array(o["o_orderdate"]).cast(pa.timestamp("us")),
             "o_orderpriority": pa.array(o["o_orderpriority"], pa.string()),
             "side": pa.array(["O"] * len(o), pa.string())},
            schema=_Q3_STAGE2_SCHEMA,
        )

    stage1 = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(semi_bucket, batch_format="pandas")
    )

    # ---- stage 2: (orders ⋉ cust) ⋈ lineitem on orderkey (reduce-side) ----
    def tag_li(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].combine_chunks() if isinstance(batch["l_orderkey"], pa.ChunkedArray) else batch["l_orderkey"]
        ok = ok.cast(pa.int64())
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")),
             "o_orderdate": pa.nulls(n, pa.timestamp("us")),
             "o_orderpriority": pa.nulls(n, pa.string()),
             "side": pa.array(["L"] * n, pa.string())},
            schema=_Q3_STAGE2_SCHEMA,
        )

    def join_topk(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "rev_cents"]]
        right = g[g["side"] == "O"][["orderkey", "o_orderdate", "o_orderpriority"]]
        j = left.merge(right, on="orderkey", how="inner")
        agg = j.groupby(
            ["orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        )["rev_cents"].sum()
        # orderkey groups are bucket-complete: a LOCAL top-10 is safe
        agg = agg.sort_values(
            ["rev_cents", "o_orderdate", "orderkey"], ascending=[False, True, True]
        ).head(10)
        return pa.table(
            {"l_orderkey": pa.array(agg["orderkey"], pa.int64()),
             "o_orderdate": pa.array(agg["o_orderdate"]).cast(pa.timestamp("us")),
             "o_orderpriority": pa.array(agg["o_orderpriority"], pa.string()),
             "revenue_cents": pa.array(agg["rev_cents"], pa.int64())}
        )

    pdf = (
        stage1.union(li.map_batches(tag_li, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join_topk, batch_format="pandas")
        .to_pandas()
    )
    pdf = pdf.sort_values(
        ["revenue_cents", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).head(10)
    return pdf.reset_index(drop=True)


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: six tables, ONE region's revenue where the supplier and
    the customer share a nation. nation⋈region (25 rows) and supplier→nation
    (the smallest relation, ~1/750th of lineitem in TPC-H) are broadcast once
    per actor via constructor args; customer⋈orders and then ⋈lineitem are
    reduce-side bucket joins like :func:`q3_shipping_priority`. Scale pruning:
    customers and lineitems outside the target region's nations are dropped
    BEFORE their shuffle (a 1/|regions| cut on both exchanges); at a scale
    where supplier outgrows broadcast, swap its lookup for a third bucket
    join — the stage shape is unchanged."""
    B = 16
    region, lo, hi = "ASIA", datetime(1996, 1, 1), datetime(1997, 1, 1)
    import pyarrow.dataset as pads

    # tiny dimensions on the driver: nations of the region, nation names
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"],
                filter=(pads.field("r_name") == region)).take_all()
    rkeys = {r["r_regionkey"] for r in reg}
    nat_keys = pa.array(
        [n["n_nationkey"] for n in nation if n["n_regionkey"] in rkeys], pa.int64()
    )
    nat_names = {int(n["n_nationkey"]): n["n_name"]
                 for n in nation if n["n_regionkey"] in rkeys}

    # supplier → nationkey, pre-filtered to the region (broadcast side)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sup_in = [(s["s_suppkey"], s["s_nationkey"]) for s in sup
              if int(s["s_nationkey"]) in nat_names]
    sup_side = {
        "suppkey": pa.array([k for k, _ in sup_in], pa.int64()),
        "natkey": pa.array([v for _, v in sup_in], pa.int64()),
    }

    stage2_schema = pa.schema(
        [("bucket", pa.int64()), ("orderkey", pa.int64()),
         ("nationkey", pa.int64()), ("rev_cents", pa.int64()),
         ("side", pa.string())]
    )

    # ---- stage 1: orders[date] ⋈ customer[region] on custkey ----
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].combine_chunks() if isinstance(batch["c_nationkey"], pa.ChunkedArray) else batch["c_nationkey"]
        nk = nk.cast(pa.int64())
        keep = pc.is_in(nk, value_set=nat_keys)  # prune BEFORE the shuffle
        batch, nk = batch.filter(keep), nk.filter(keep)
        ck = batch["c_custkey"].combine_chunks() if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": pa.nulls(n, pa.int64()), "nationkey": nk,
             "side": pa.array(["C"] * n, pa.string())}
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].combine_chunks() if isinstance(batch["o_custkey"], pa.ChunkedArray) else batch["o_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": batch["o_orderkey"].cast(pa.int64()),
             "nationkey": pa.nulls(n, pa.int64()),
             "side": pa.array(["O"] * n, pa.string())}
        )

    def join_cust(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "O"][["custkey", "orderkey"]]
        right = g[g["side"] == "C"][["custkey", "nationkey"]]
        j = left.merge(right, on="custkey", how="inner")
        ok = j["orderkey"].to_numpy(dtype="int64", na_value=0)
        return pa.table(
            {"bucket": pa.array(ok & (B - 1), pa.int64()),
             "orderkey": pa.array(ok, pa.int64()),
             "nationkey": pa.array(j["nationkey"].to_numpy(dtype="int64", na_value=0)),
             "rev_cents": pa.array(np.zeros(len(j), dtype="int64")),
             "side": pa.array(["O"] * len(j), pa.string())},
            schema=stage2_schema,
        )

    stage1 = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(join_cust, batch_format="pandas")
    )

    # ---- lineitem leg: broadcast supplier→nation, prune to region ----
    class TagLineitem:
        """Supplier map ships once per actor; per-batch lookup is
        ``pc.index_in`` + take, rows with non-region suppliers dropped before
        the orderkey shuffle."""

        def __init__(self, side):
            self.suppkey = side["suppkey"]
            self.natkey = side["natkey"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            sk = batch["l_suppkey"].combine_chunks() if isinstance(batch["l_suppkey"], pa.ChunkedArray) else batch["l_suppkey"]
            idx = pc.index_in(sk.cast(pa.int64()), value_set=self.suppkey)
            keep = pc.is_valid(idx)
            batch, idx = batch.filter(keep), idx.filter(keep)
            ok = batch["l_orderkey"].combine_chunks() if isinstance(batch["l_orderkey"], pa.ChunkedArray) else batch["l_orderkey"]
            ok = ok.cast(pa.int64())
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            n = len(batch)
            return pa.table(
                {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
                 "nationkey": self.natkey.take(idx),
                 "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")),
                 "side": pa.array(["L"] * n, pa.string())},
                schema=stage2_schema,
            )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li_tagged = li.map_batches(
        TagLineitem, fn_constructor_args=(sup_side,), batch_format="pyarrow",
        concurrency=2,
    )

    # ---- stage 2: join on orderkey, same-nation filter, partial sum ----
    def join_nation(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "nationkey", "rev_cents"]]
        right = g[g["side"] == "O"][["orderkey", "nationkey"]].rename(
            columns={"nationkey": "c_nationkey"}
        )
        j = left.merge(right, on="orderkey", how="inner")
        j = j[j["nationkey"] == j["c_nationkey"]]
        agg = j.groupby("nationkey", as_index=False)["rev_cents"].sum()
        return pa.table(
            {"nationkey": pa.array(agg["nationkey"], pa.int64()),
             "rev_cents": pa.array(agg["rev_cents"], pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        stage1.union(li_tagged)
        .groupby("bucket")
        .map_groups(join_nation, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("rev_cents", alias_name="revenue_cents"))
    )
    pdf = out.to_pandas()
    pdf["n_name"] = pdf["nationkey"].map(lambda k: nat_names[int(k)])
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    return pdf.sort_values(
        ["revenue_cents", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)[["n_name", "revenue_cents"]]


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join. Orders in a quarter counted per
    priority when at least one of their lines was returned. The probe side
    never ships payload: each lineitem batch reduces to its DISTINCT matching
    orderkeys before the exchange (`pc.unique` per batch — the semi-join
    analog of a pre-aggregation combiner), so the shuffle carries key sets,
    not line rows. The match itself is a reduce-side bucket semi
    (orderkey % B co-location, `np.isin` inside ``map_groups``) and each
    bucket emits per-priority PARTIAL counts — only B×|priorities| rows ever
    reach the final groupby."""
    B = 16
    lo, hi = datetime(1996, 4, 1), datetime(1996, 7, 1)
    import pyarrow.dataset as pads

    # filter columns stay in the projection (the scan schema must cover the
    # predicate); the tag stages drop them before the exchange
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
               filter=(pads.field("l_returnflag") == "R"))

    def tag_li(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].combine_chunks() if isinstance(batch["l_orderkey"], pa.ChunkedArray) else batch["l_orderkey"]
        ok = pc.unique(ok.cast(pa.int64()))  # per-batch distinct probe keys
        n = len(ok)
        return pa.table(
            {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "o_orderpriority": pa.nulls(n, pa.string()),
             "side": pa.array(["L"] * n, pa.string())}
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].combine_chunks() if isinstance(batch["o_orderkey"], pa.ChunkedArray) else batch["o_orderkey"]
        ok = ok.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "o_orderpriority": batch["o_orderpriority"].cast(pa.string()),
             "side": pa.array(["O"] * n, pa.string())}
        )

    def semi_count(g: pd.DataFrame) -> pa.Table:
        probe = g.loc[g["side"] == "L", "orderkey"].to_numpy()
        o = g[g["side"] == "O"]
        o = o[np.isin(o["orderkey"].to_numpy(), probe)]
        agg = o.groupby("o_orderpriority").size()
        return pa.table(
            {"o_orderpriority": pa.array(agg.index.to_numpy(), pa.string()),
             "n": pa.array(agg.to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    out = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(li.map_batches(tag_li, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(semi_count, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="order_count"))
    )
    pdf = out.to_pandas()
    pdf["order_count"] = pdf["order_count"].astype("int64")
    return pdf.sort_values("o_orderpriority").reset_index(drop=True)


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + count distribution. Every customer
    appears in the histogram — including customers whose filtered order count
    is ZERO, the rows an inner join would silently drop (the filter lives in
    the join condition, not a WHERE). Orders pre-aggregate per batch to
    (custkey, n) partials before the exchange; the bucket ``map_groups``
    reindexes the summed counts onto the bucket's full customer domain
    (zeros appear here) and emits a PARTIAL histogram, so the final groupby
    folds B×|distinct counts| rows."""
    B = 16
    import pyarrow.dataset as pads

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"],
                   filter=(pads.field("o_totalprice") > 150000.0))

    def tag_orders(batch: pa.Table) -> pa.Table:
        gb = (
            pa.table({"custkey": batch["o_custkey"].cast(pa.int64())})
            .group_by("custkey").aggregate([([], "count_all")])
        )
        ck = gb["custkey"].combine_chunks() if isinstance(gb["custkey"], pa.ChunkedArray) else gb["custkey"]
        return pa.table(
            {"bucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "n": gb["count_all"].cast(pa.int64()),
             "side": pa.array(["O"] * len(gb), pa.string())}
        )

    def tag_cust(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].combine_chunks() if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"bucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "n": pa.array(np.zeros(n, dtype="int64")),
             "side": pa.array(["C"] * n, pa.string())}
        )

    def outer_hist(g: pd.DataFrame) -> pa.Table:
        domain = g.loc[g["side"] == "C", "custkey"]
        counts = (
            g[g["side"] == "O"].groupby("custkey")["n"].sum()
            .reindex(domain, fill_value=0)  # LEFT side keeps zero-customers
        )
        hist = counts.groupby(counts).size()
        return pa.table(
            {"c_count": pa.array(hist.index.to_numpy(dtype="int64")),
             "ncust": pa.array(hist.to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    out = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(outer_hist, batch_format="pandas")
        .groupby("c_count")
        .aggregate(Sum("ncust", alias_name="custdist"))
    )
    pdf = out.to_pandas()
    pdf["custdist"] = pdf["custdist"].astype("int64")
    pdf = pdf.sort_values(["custdist", "c_count"], ascending=[False, False])
    return pdf.reset_index(drop=True)[["c_count", "custdist"]]


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: aggregate-then-join with a HAVING cut. Stage 1
    co-locates per-batch (orderkey, qty-sum) lineitem partials with order
    rows by orderkey bucket; the HAVING (> 300) fires inside the bucket
    BEFORE any customer data moves, so only qualifying orders (a ~1e-3
    selectivity cut) enter stage 2's custkey-bucket join against customer.
    Each stage-2 bucket emits its LOCAL top-100 (the sort key chain ends in
    the unique orderkey, making the global merge of B×100 rows exact)."""
    B = 16
    THRESH = 300.0

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    s1_schema = pa.schema(
        [("bucket", pa.int64()), ("orderkey", pa.int64()), ("qty", pa.float64()),
         ("custkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("o_totalprice", pa.float64()), ("side", pa.string())]
    )

    def tag_li(batch: pa.Table) -> pa.Table:
        gb = (
            pa.table({"orderkey": batch["l_orderkey"].cast(pa.int64()),
                      "qty": batch["l_quantity"].cast(pa.float64())})
            .group_by("orderkey").aggregate([("qty", "sum")])
        )
        ok = gb["orderkey"].combine_chunks() if isinstance(gb["orderkey"], pa.ChunkedArray) else gb["orderkey"]
        n = len(gb)
        return pa.table(
            {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "qty": gb["qty_sum"], "custkey": pa.nulls(n, pa.int64()),
             "o_orderdate": pa.nulls(n, pa.timestamp("us")),
             "o_totalprice": pa.nulls(n, pa.float64()),
             "side": pa.array(["L"] * n, pa.string())},
            schema=s1_schema,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].combine_chunks() if isinstance(batch["o_orderkey"], pa.ChunkedArray) else batch["o_orderkey"]
        ok = ok.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"bucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "qty": pa.nulls(n, pa.float64()),
             "custkey": batch["o_custkey"].cast(pa.int64()),
             "o_orderdate": batch["o_orderdate"].cast(pa.timestamp("us")),
             "o_totalprice": batch["o_totalprice"].cast(pa.float64()),
             "side": pa.array(["O"] * n, pa.string())},
            schema=s1_schema,
        )

    s2_schema = pa.schema(
        [("cbucket", pa.int64()), ("custkey", pa.int64()),
         ("orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("o_totalprice", pa.float64()), ("total_qty", pa.float64()),
         ("c_name", pa.string()), ("side", pa.string())]
    )

    def having_join(g: pd.DataFrame) -> pa.Table:
        qty = g[g["side"] == "L"].groupby("orderkey")["qty"].sum()
        qty = qty[qty > THRESH]  # HAVING fires before any further movement
        o = g[g["side"] == "O"]
        o = o[o["orderkey"].isin(qty.index)]
        ck = o["custkey"].to_numpy(dtype="int64", na_value=0)
        return pa.table(
            {"cbucket": pa.array(ck & (B - 1), pa.int64()),
             "custkey": pa.array(ck, pa.int64()),
             "orderkey": pa.array(o["orderkey"], pa.int64()),
             "o_orderdate": pa.array(o["o_orderdate"]).cast(pa.timestamp("us")),
             "o_totalprice": pa.array(o["o_totalprice"], pa.float64()),
             "total_qty": pa.array(qty.loc[o["orderkey"]].to_numpy(), pa.float64()),
             "c_name": pa.nulls(len(o), pa.string()),
             "side": pa.array(["O"] * len(o), pa.string())},
            schema=s2_schema,
        )

    def tag_cust(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].combine_chunks() if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ck = ck.cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": pa.nulls(n, pa.int64()),
             "o_orderdate": pa.nulls(n, pa.timestamp("us")),
             "o_totalprice": pa.nulls(n, pa.float64()),
             "total_qty": pa.nulls(n, pa.float64()),
             "c_name": batch["c_name"].cast(pa.string()),
             "side": pa.array(["C"] * n, pa.string())},
            schema=s2_schema,
        )

    def join_topk(g: pd.DataFrame) -> pa.Table:
        o = g[g["side"] == "O"][["custkey", "orderkey", "o_orderdate",
                                 "o_totalprice", "total_qty"]]
        c = g[g["side"] == "C"][["custkey", "c_name"]]
        j = o.merge(c, on="custkey", how="inner")
        # sort by the RAW price double (exactly the SQL's key), unique
        # orderkey terminates the chain → bucket-local top-100 is exact
        j = j.sort_values(["o_totalprice", "o_orderdate", "orderkey"],
                          ascending=[False, True, True]).head(100)
        return pa.table(
            {"c_name": pa.array(j["c_name"], pa.string()),
             "c_custkey": pa.array(j["custkey"], pa.int64()),
             "o_orderkey": pa.array(j["orderkey"], pa.int64()),
             "o_orderdate": pa.array(j["o_orderdate"]).cast(pa.timestamp("us")),
             "o_totalprice": pa.array(j["o_totalprice"], pa.float64()),
             "total_qty": pa.array(j["total_qty"], pa.float64())}
        )

    stage1 = (
        li.map_batches(tag_li, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(having_join, batch_format="pandas")
    )
    pdf = (
        stage1.union(cust.map_batches(tag_cust, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(join_topk, batch_format="pandas")
        .to_pandas()
    )
    pdf = pdf.sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]).head(100)
    from ..functions.scalar import round_half_away

    pdf["totalprice_cents"] = np.floor(pdf["o_totalprice"] * 100 + 0.5).astype("int64")
    pdf["total_qty"] = round_half_away(pdf["total_qty"].to_numpy(), 2)
    return pdf.reset_index(drop=True)[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
         "totalprice_cents", "total_qty"]
    ]


def q22_idle_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti-join gated by a scalar subquery.
    Pass 1 folds customer into two integers (count and cents-sum of positive
    balances) — the scalar subquery as a kilobyte aggregate, broadcast to
    pass 2 as plain Python ints. The above-average test compares
    ``cents × n_pos > sum_cents`` in EXACT integer space, so no float-mean
    boundary can diverge from the SQL. Pass 2 is a reduce-side bucket
    ANTI-join: recent-order custkeys arrive as per-batch DISTINCT key sets,
    and the bucket keeps customers whose key is absent (``~np.isin``),
    emitting per-nation partials."""
    B = 16
    cutoff = datetime(1999, 1, 1)
    import pyarrow.dataset as pads

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    # ---- pass 1: the scalar subquery (two-int aggregate) ----
    def pos_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal[bal > 0.0]
        cents = np.floor(pos * 100 + 0.5).astype("int64")
        return pa.table({"n_pos": pa.array([len(pos)], pa.int64()),
                         "sum_cents": pa.array([int(cents.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow")
        .aggregate(Sum("n_pos", alias_name="n_pos"),
                   Sum("sum_cents", alias_name="sum_cents"))
    ) or {}
    n_pos, sum_cents = int(agg.get("n_pos") or 0), int(agg.get("sum_cents") or 0)

    # ---- pass 2: anti-join against recent-order custkeys ----
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   filter=(pads.field("o_orderdate") >= cutoff))

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].combine_chunks() if isinstance(batch["o_custkey"], pa.ChunkedArray) else batch["o_custkey"]
        ck = pc.unique(ck.cast(pa.int64()))
        n = len(ck)
        return pa.table(
            {"bucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "nationkey": pa.nulls(n, pa.int64()),
             "cents": pa.nulls(n, pa.int64()),
             "side": pa.array(["O"] * n, pa.string())}
        )

    def tag_cust(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100 + 0.5).astype("int64")
        keep = cents * n_pos > sum_cents  # exact-integer above-average test
        batch = batch.filter(pa.array(keep))
        cents = cents[keep]
        ck = batch["c_custkey"].combine_chunks() if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ck = ck.cast(pa.int64())
        return pa.table(
            {"bucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "nationkey": batch["c_nationkey"].cast(pa.int64()),
             "cents": pa.array(cents), "side": pa.array(["C"] * len(cents), pa.string())}
        )

    def anti_partial(g: pd.DataFrame) -> pa.Table:
        probe = g.loc[g["side"] == "O", "custkey"].to_numpy()
        c = g[g["side"] == "C"]
        c = c[~np.isin(c["custkey"].to_numpy(), probe)]
        agg = c.groupby("nationkey").agg(numcust=("custkey", "size"),
                                         cents=("cents", "sum"))
        return pa.table(
            {"c_nationkey": pa.array(agg.index.to_numpy(dtype="int64")),
             "numcust": pa.array(agg["numcust"].to_numpy(dtype="int64")),
             "cents": pa.array(agg["cents"].to_numpy(dtype="int64"))}
        )

    out = (
        _read(sf_dir, "customer", cust_cols)
        .map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(anti_partial, batch_format="pandas")
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("cents", alias_name="totacctbal_cents"))
    )
    pdf = out.to_pandas()
    pdf["numcust"] = pdf["numcust"].astype("int64")
    pdf["totacctbal_cents"] = pdf["totacctbal_cents"].astype("int64")
    return pdf.sort_values("c_nationkey").reset_index(drop=True)


def events_user_deltas(sf_dir: str) -> pd.DataFrame:
    """LAG/LEAD window shape: per-user consecutive-event deltas (value
    direction counts + max inter-event gap). The per-key ordered scan runs
    inside ``groupby(user).map_groups`` as vectorized pandas ``shift``/
    ``diff`` — one user-hash shuffle, no global sort, group size bounded by
    per-user activity. Gaps compare in exact integer microseconds (int64 ns
    diff // 1000), matching the SQL's ``date_diff('microsecond', …)``; a
    single-event user reports -1 (the SQL's COALESCE sentinel)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        prev = g["value"].shift()
        # normalize to ns first — pandas may hold the Arrow timestamp as
        # datetime64[us], in which case a bare int64 view is µs, not ns
        gap_us = g["ts"].astype("datetime64[ns]").astype("int64").diff() // 1000
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]],
             "n_events": [np.int64(len(g))],
             "n_up": [np.int64((g["value"] > prev).sum())],
             "n_down": [np.int64((g["value"] < prev).sum())],
             "max_gap_us": [np.int64(gap_us.max()) if len(g) > 1 else np.int64(-1)]}
        )

    out = ds.groupby("user_id").map_groups(deltas, batch_format="pandas")
    return _sorted_pdf(out, "user_id")


def top_events_per_user(sf_dir: str) -> pd.DataFrame:
    """O-series: per-key top-k (sort + limit inside map_groups)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True]).head(3)
        g = g.reset_index(drop=True)
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = ds.groupby("user_id").map_groups(topk, batch_format="pandas")
    return out.to_pandas().sort_values(["user_id", "rk"]).reset_index(drop=True)[
        ["user_id", "rk", "event_id", "value"]
    ]


def _flagship_spec():
    """The flagship stream spec — ONE constant shared by the Ray query and
    the SQL oracle generator so the two can never replay different inputs."""
    from ..synth import StreamSpec as _Spec

    return _Spec(n_events=20_000, n_repos=10, paths_per_repo=50, chunk_size=5_000,
                 evolve_at_event=15_000)


_FLAGSHIP_STREAM_DIR = "/tmp/movex_flagship/stream"


def _flagship_stream() -> str:
    """Ensure the deterministic flagship change stream exists on disk (cached
    via _SPEC.json equality) and return its directory. Called by BOTH the
    query and the oracle-SQL builder, so whichever side the driver runs first
    finds the staged chunk parquet in place."""
    import shutil as _shutil

    from ..synth import generate_stream as _gen
    from ..synth import stream_matches_spec as _match

    spec = _flagship_spec()
    if not _match(_FLAGSHIP_STREAM_DIR, spec):
        _shutil.rmtree(_FLAGSHIP_STREAM_DIR, ignore_errors=True)
        _gen(_FLAGSHIP_STREAM_DIR, spec)
    return _FLAGSHIP_STREAM_DIR


def _flagship_sql() -> str:
    """DuckDB value oracle for the FULL flagship replay (VERDICT r2 #2): the
    staged binlog chunks are plain parquet, so the converged lake state is
    SQL-expressible — union the chunks (union_by_name folds the mid-stream
    schema evolution: v1 chunks lack ``stars``, ``size`` widens int32→int64
    exactly like the engine's align_to_schema), drop no-op updates (M4:
    NULL-safe old==new over every observed column,
    `db_trigger_generator_oracle.rb:802-823`), then arg-max-by-id per key
    with DELETE-winner tombstones (`transfer_thread.rb:493-518` semantics,
    KafkaMock ascending-id check `kafka_mock.rb:49-63`). The suppression
    column list and the key rendering are generated from the same config the
    engine replays with, so oracle and engine cannot drift."""
    from ..synth import config_for_spec as _cfs

    _flagship_stream()  # stage the chunks for whenever DuckDB runs this SQL
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    t = cfg.tables[0]
    fields = list(cfg.latest_version().payload_fields)
    noop_eq = "\n                 AND ".join(
        f"new_{f} IS NOT DISTINCT FROM old_{f}" for f in fields
    )
    key_parts = " || chr(31) || ".join(
        f"(CASE WHEN op = 'D' THEN old_{c} ELSE new_{c} END)" for c in t.pk_columns
    )
    return f"""
        WITH ev AS (
          SELECT * FROM read_parquet('{_FLAGSHIP_STREAM_DIR}/chunk_*.parquet',
                                     union_by_name=true)
        ), kept AS (
          SELECT *, '{t.schema_name}.{t.name}' || chr(31) || {key_parts} AS _key
          FROM ev
          WHERE NOT (op = 'U'
                 AND {noop_eq})
        ), win AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY _key ORDER BY id DESC) AS rn
          FROM kept
        )
        SELECT new_repo AS repo, new_path AS path, new_commit AS "commit",
               new_lang AS lang, new_content AS content,
               CAST(new_size AS BIGINT) AS size,
               _key, id AS _last_id, op AS _last_op
        FROM win WHERE rn = 1 AND op <> 'D'
        ORDER BY _key
    """


def cdc_scd2_history(sf_dir: str) -> pd.DataFrame:
    """SCD Type-2 version history from the change stream — the other
    canonical lake materialization besides last-writer-wins
    (cdc_lake_state): every event OPENS a version of its key; the next
    event for the same key CLOSES it (valid_to_id = successor id, NULL =
    current). 'error' events are tombstones: they close the prior version
    and open none — the same delete semantics the merge path applies.

    Scale shape: ONE key-hash shuffle (groupby user_id) with a vectorized
    sort+shift body per group — the exact partitioning key the lake merge
    uses, so at 100 TB this materializes alongside it for free."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "valid_from_id": g["event_id"].to_numpy(),
                "valid_to_id": pd.array(g["event_id"].shift(-1), dtype="Int64"),
                "event_type": g["event_type"].to_numpy(),
                "value": g["value"].to_numpy(),
            }
        )
        # tombstones close the predecessor (their id is already its
        # valid_to_id) but never open a version themselves
        return out[out["event_type"] != "error"]

    out = ds.groupby("user_id").map_groups(versions, batch_format="pandas")
    pdf = out.to_pandas()
    pdf["is_current"] = pdf["valid_to_id"].isna().astype("int64")
    # float64-with-NaN on BOTH sides (SQL casts to DOUBLE): the driver's
    # value compare needs exact type parity, and NULLABLE ints come back
    # from DuckDB as float64 anyway
    pdf["valid_to_id"] = pdf["valid_to_id"].astype("float64")
    return (
        pdf[["user_id", "valid_from_id", "valid_to_id", "event_type", "value", "is_current"]]
        .sort_values(["user_id", "valid_from_id"])
        .reset_index(drop=True)
    )


def events_debounce(sf_dir: str) -> pd.DataFrame:
    """Debounce filter (trailing-gap variant): keep an event iff the
    PREVIOUS event of the same (user, type) — by event time, event_id
    tie-break — is at least 5 minutes older. The stream-hygiene op that
    collapses UI double-fires / sensor chatter before sessionization. One
    user-hash shuffle (the events partitioning key); inside each group a
    per-type vectorized shift-compare in integer microseconds, so equal-ts
    duplicates drop deterministically and the LAG-based SQL oracle agrees
    row-for-row."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "ts", "event_id"])
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = g.assign(_us=us)
        prev = g.groupby("event_type")["_us"].shift()
        keep = prev.isna() | ((g["_us"] - prev) > 300_000_000)
        out = g.loc[keep, ["event_id", "user_id", "event_type"]]
        return out

    out = ds.groupby("user_id").map_groups(debounce, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_DEBOUNCE_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us,
         LAG(CAST(epoch_us(ts) AS BIGINT)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type
FROM lagged
WHERE prev_us IS NULL OR us - prev_us > 300000000
ORDER BY event_id
"""


def events_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """φ-heavy hitters (φ = 1/32) over (event_type, value-magnitude bucket)
    via the MERGEABLE Misra-Gries summary (Agarwal et al., "Mergeable
    Summaries", PODS'12): each batch folds to an ≤31-counter MG sketch, the
    sketches merge associatively through one tiny groupby (merge = add
    counters, subtract the 32nd-largest, drop ≤0 — undercount stays
    ≤ N/32), and every key with true count > N/32 PROVABLY survives as a
    candidate. A second streaming pass recounts only the ≤31 candidates
    exactly (broadcast set, per-batch fold), so the output — keys with
    n·32 > N — is deterministic and partitioning-independent even though
    the intermediate sketch isn't. The magnitude bucket floor(log2(
    cents//100 + 1)) is integer-safe (arguments ≤ 2⁹, doubling boundaries
    land on exact powers of two) and gives the geometric key distribution
    heavy-hitter detection exists for."""
    from ray.data.aggregate import Sum

    cap = 31

    def keyize(batch: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        vb = np.floor(np.log2(cents // 100 + 1)).astype(np.int64)
        return pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(zero_copy_only=False),
             "vbucket": vb}
        )

    def mg_partial(batch: pa.Table) -> pa.Table:
        cnt = keyize(batch).groupby(["event_type", "vbucket"], as_index=False).size()
        cnt = cnt.rename(columns={"size": "n_mg"})
        if len(cnt) > cap:
            cut = int(cnt["n_mg"].nlargest(cap + 1).iloc[-1])
            cnt["n_mg"] -= cut
            cnt = cnt[cnt["n_mg"] > 0]
        total = pd.DataFrame(
            {"event_type": ["#TOTAL"], "vbucket": [-1], "n_mg": [batch.num_rows]}
        )
        out = pd.concat([cnt, total], ignore_index=True)
        return pa.table({"event_type": pa.array(out["event_type"], pa.string()),
                         "vbucket": pa.array(out["vbucket"], pa.int64()),
                         "n_mg": pa.array(out["n_mg"], pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"])
    summ = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby(["event_type", "vbucket"])
        .aggregate(Sum("n_mg", alias_name="n_mg"))
        .to_pandas()
    )
    n_total = int(summ.loc[summ["event_type"] == "#TOTAL", "n_mg"].sum())
    cnt = summ[summ["event_type"] != "#TOTAL"].copy()
    if len(cnt) > cap:  # final MG trim — keeps the ≤ N/32 undercount bound
        cut = int(cnt["n_mg"].nlargest(cap + 1).iloc[-1])
        cnt["n_mg"] -= cut
        cnt = cnt[cnt["n_mg"] > 0]
    cands = frozenset(zip(cnt["event_type"], cnt["vbucket"]))

    def recount(batch: pa.Table) -> pa.Table:
        pdf = keyize(batch)
        mask = pd.Series(list(zip(pdf["event_type"], pdf["vbucket"]))).isin(cands)
        cnt2 = pdf[mask.to_numpy()].groupby(
            ["event_type", "vbucket"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.table({"event_type": pa.array(cnt2["event_type"], pa.string()),
                         "vbucket": pa.array(cnt2["vbucket"], pa.int64()),
                         "n": pa.array(cnt2["n"], pa.int64())})

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby(["event_type", "vbucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = exact[exact["n"] * 32 > n_total].copy()
    out["n"] = out["n"].astype("int64")
    out["vbucket"] = out["vbucket"].astype("int64")
    return out.sort_values(["event_type", "vbucket"]).reset_index(drop=True)[
        ["event_type", "vbucket", "n"]
    ]


_HEAVY_HITTERS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) // 100 + 1 AS m
  FROM events
),
c AS (
  SELECT event_type, CAST(floor(log2(m)) AS BIGINT) AS vbucket, COUNT(*) AS n
  FROM e GROUP BY 1, 2
),
t AS (SELECT COUNT(*) AS total FROM e)
SELECT event_type, vbucket, CAST(n AS BIGINT) AS n
FROM c, t
WHERE n * 32 > total
ORDER BY event_type, vbucket
"""


def events_decayed_score(sf_dir: str) -> pd.DataFrame:
    """Time-decayed engagement score per user (feature-engineering staple:
    recent activity counts more), integer-exact: with T = the stream's max
    hour, every event in the trailing 24 h window contributes
    cents · 2^(23−age_hours) — a half-life-of-one-hour EWMA in fixed point
    (score_fp23 = 2²³ · Σ cents·2^−age), all int64 so the oracle matches
    bit-for-bit (max event ≈ 49 k cents · 2²³ ≈ 4·10¹¹ per event, far from
    overflow). Two streaming passes: a tiny max() aggregate pins T, then a
    per-batch combiner folds (user → partial score/count) before the one
    small groupby — shuffle volume is per-user partials, not events."""
    from ray.data.aggregate import Sum

    th = int(pd.Timestamp(_read(sf_dir, "events", ["ts"]).max("ts")).value // 1000) // 3_600_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
        h = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        age = th - h
        keep = age < 24
        if not keep.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "score_part": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False)[keep] * 100 + 0.5
        ).astype(np.int64)
        w = cents << (23 - age[keep])
        part = (
            pa.table({"user_id": pa.array(uid), "w": pa.array(w),
                      "one": pa.array(np.ones(len(uid), dtype=np.int64))})
            .group_by("user_id")
            .aggregate([("w", "sum"), ("one", "sum")])
        )
        return pa.table({"user_id": part["user_id"],
                         "score_part": part["w_sum"],
                         "n_part": part["one_sum"]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("score_part", alias_name="score_fp23"),
                   Sum("n_part", alias_name="n_window"))
        .to_pandas()
    )
    out["score_fp23"] = out["score_fp23"].astype("int64")
    out["n_window"] = out["n_window"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_DECAYED_SCORE_SQL = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT max(h) AS th FROM e)
SELECT user_id,
       CAST(SUM(cents * CAST(2**(23 - (th - h)) AS BIGINT)) AS BIGINT) AS score_fp23,
       CAST(COUNT(*) AS BIGINT) AS n_window
FROM e, mx
WHERE th - h < 24
GROUP BY user_id
ORDER BY user_id
"""


def events_running_totals(sf_dir: str) -> pd.DataFrame:
    """Cumulative per-key aggregates (running sum/count ordered by event
    id) — the windowed-aggregate family member beside hopping windows and
    sessionization: one key-hash shuffle, vectorized cumsum per group."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "running_n": np.arange(1, len(g) + 1, dtype="int64"),
                "running_sum_cents": np.floor(
                    g["value"].to_numpy(dtype="float64").cumsum() * 100 + 0.5
                ).astype("int64"),
            }
        )

    out = ds.groupby("user_id").map_groups(running, batch_format="pandas")
    return _sorted_pdf(out, "user_id", "event_id")


def cdc_flagship_replay(sf_dir: str) -> pd.DataFrame:
    """The flagship end-to-end pipeline as a driver-visible query: replay a
    deterministic synthetic change stream (north-rule input shape, with
    mid-stream schema evolution) through capture → hash-partition →
    exactly-once merge, return the converged lake. Full DuckDB value oracle
    over the staged binlog chunks (see _flagship_sql)."""
    import os as _os
    import shutil as _shutil

    from ..pipelines.replay import lake_to_pandas as _ltp
    from ..pipelines.replay import replay as _replay
    from ..synth import config_for_spec as _cfs

    stream = _flagship_stream()
    lake = _os.path.join("/tmp/movex_flagship", "lake")
    _shutil.rmtree(lake, ignore_errors=True)
    _replay(stream, lake, _cfs(_flagship_spec(), num_partitions=8), chunks_per_epoch=2)
    got = _ltp(lake)
    got["size"] = got["size"].astype("int64")
    return got[["repo", "path", "commit", "lang", "content", "size", "_key",
                "_last_id", "_last_op"]]


def cdc_txn_batches(sf_dir: str) -> pd.DataFrame:
    """Transaction-bounded delivery batching report over the staged flagship
    binlog (the reference delivers a DB transaction's events as one atomic
    producer batch — ``yn_record_txid`` / KafkaMock's per-batch checks): per
    txn_id the op count, distinct tables touched, id span, and an
    order-sensitive md5 over "id:op" in id order — the batch fingerprint a
    consumer can use to assert atomic, in-order arrival. One txn-hash
    groupby; groups are bounded by the source's max transaction size
    (~50 events in the synth), so map_groups never sees a mega-group."""
    import hashlib as _hl

    stream = _flagship_stream()
    ds = rd.read_parquet(
        [os.path.join(stream, f) for f in sorted(os.listdir(stream))
         if f.startswith("chunk_")],
        columns=["id", "table_id", "op", "txn_id"],
    )

    def batch_fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        fp = _hl.md5(
            ",".join(f"{i}:{o}" for i, o in zip(ids, g["op"])).encode()
        ).hexdigest()
        return pd.DataFrame(
            {"txn_id": [g["txn_id"].iloc[0]], "n_ops": [np.int64(len(g))],
             "n_tables": [np.int64(g["table_id"].nunique())],
             "id_min": [np.int64(ids[0])], "id_max": [np.int64(ids[-1])],
             "ops_md5": [fp]}
        )

    out = ds.groupby("txn_id").map_groups(batch_fp, batch_format="pandas").to_pandas()
    for c in ("n_ops", "n_tables", "id_min", "id_max"):
        out[c] = out[c].astype("int64")
    return out.sort_values("txn_id").reset_index(drop=True)


def _txn_batches_sql() -> str:
    return f"""
    SELECT txn_id,
           CAST(COUNT(*) AS BIGINT) AS n_ops,
           CAST(COUNT(DISTINCT table_id) AS BIGINT) AS n_tables,
           CAST(MIN(id) AS BIGINT) AS id_min,
           CAST(MAX(id) AS BIGINT) AS id_max,
           md5(string_agg(id || ':' || op, ',' ORDER BY id)) AS ops_md5
    FROM read_parquet('{_FLAGSHIP_STREAM_DIR}/chunk_*.parquet', union_by_name=true)
    GROUP BY txn_id ORDER BY txn_id
    """


_PR_SCALE, _PR_DNUM, _PR_DDEN, _PR_ITERS = 10**9, 85, 100, 10


def events_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the event-type transition graph (link-analysis family):
    nodes = event types, edge (u→v) weight = how often v follows u within a
    user's stream. Distributed part: per-user transition extraction (one
    user-hash groupby — the same partitioning key every events operator
    uses — with a vectorized shift + per-group pre-aggregation, so ≤|types|²
    rows leave any group) and the (src,dst) weight fold. The power iteration
    then runs on the AGGREGATED transition matrix, which is
    |event-type-vocabulary|² by construction — driver-sized at any corpus
    scale (for a web-scale node set swap in broadcast-rank + edge-partitioned
    scatter per iteration; the extraction/fold shape is unchanged). All
    iteration arithmetic is integer (rank scaled by 1e9, floor per term,
    damping 85/100) so no float summation order exists and the DuckDB oracle
    is hash-exact — the same determinism trick as text_gopher_rules."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])

    def transitions(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("event_id")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"src": t[:-1], "dst": t[1:]})
        agg = pairs.groupby(["src", "dst"], as_index=False).size()
        return pa.table({"src": pa.array(agg["src"], pa.string()),
                         "dst": pa.array(agg["dst"], pa.string()),
                         "n": pa.array(agg["size"], pa.int64())})

    edges = (
        ds.groupby("user_id").map_groups(transitions, batch_format="pandas")
        .groupby(["src", "dst"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # tiny: ≤ |event-type vocabulary|² rows
    )
    nodes = sorted(ds.unique("event_type"))
    N = len(nodes)
    deg = edges.groupby("src")["n"].sum().to_dict()
    w = {(s, d): int(n) for s, d, n in edges.itertuples(index=False)}
    r = {v: _PR_SCALE // N for v in nodes}
    teleport = ((_PR_DDEN - _PR_DNUM) * _PR_SCALE) // (_PR_DDEN * N)
    for _ in range(_PR_ITERS):
        dangling = sum(
            (_PR_DNUM * r[u]) // (_PR_DDEN * N) for u in nodes if u not in deg
        )
        nxt = {}
        for v in nodes:
            inbound = sum(
                (_PR_DNUM * r[u] * w[(u, v)]) // (_PR_DDEN * int(deg[u]))
                for u in nodes
                if (u, v) in w
            )
            nxt[v] = teleport + inbound + dangling
        r = nxt
    return pd.DataFrame(
        {"event_type": nodes,
         "rank_scaled": pd.array([r[v] for v in nodes], dtype="int64")}
    )


_TRI_NB = 64  # coarse co-location buckets (order / edge / wedge stages)
_TRI_MIN_SUPPORT = 2  # co-occurrence support threshold that sparsifies edges


def _pair_explode(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group ordered pairs (v_i, v_j), i<j, for contiguous groups.

    ``keys``/``vals`` must be sorted by (key, val). Vectorized across the
    GROUP-SIZE axis: one ``np.triu_indices`` gather per distinct group size
    (order baskets are ≤ ~7 rows; adjacency lists post-threshold are tens),
    never a per-group Python call."""
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    counts = np.diff(np.r_[starts, len(keys)])
    us: list[np.ndarray] = []
    vs: list[np.ndarray] = []
    for c in np.unique(counts):
        if c < 2:
            continue
        offs = starts[counts == c]
        idx = offs[:, None] + np.arange(c)[None, :]
        rows = vals[idx]  # (m, c), each row sorted ascending
        iu, ju = np.triu_indices(int(c), 1)
        us.append(rows[:, iu].ravel())
        vs.append(rows[:, ju].ravel())
    if not us:
        e = np.array([], dtype=vals.dtype)
        return e, e
    return np.concatenate(us), np.concatenate(vs)


_TRI_EMPTY = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
     "c": pa.array([], pa.int64())}
)


def _tri_support_edges(sf_dir: str) -> "rd.Dataset":
    """Stages 1-2 shared by both triangle queries: per-order co-occurrence
    pair generation (co-located by ``l_orderkey % NB``) + global support
    fold + threshold (co-located by edge hash). Returns the thresholded
    undirected edge set as (u, v) with u < v by id."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def order_bucket(batch: pa.Table) -> pa.Table:
        ob = pc.bit_wise_and(batch["l_orderkey"], _TRI_NB - 1)
        return batch.append_column("ob", pc.cast(ob, pa.int64()))

    def pairs_in_orders(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"]
        )
        u, v = _pair_explode(
            g["l_orderkey"].to_numpy(), g["l_partkey"].to_numpy()
        )
        agg = (
            pd.DataFrame({"u": u, "v": v})
            .groupby(["u", "v"], as_index=False)
            .size()
        )
        return pa.table(
            {"u": pa.array(agg["u"].to_numpy(), pa.int64()),
             "v": pa.array(agg["v"].to_numpy(), pa.int64()),
             "n": pa.array(agg["size"].to_numpy(), pa.int64())}
        )

    pair_partials = (
        ds.map_batches(order_bucket, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(pairs_in_orders, batch_format="pandas")
    )

    def edge_bucket(batch: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(batch["u"], 1000003), batch["v"])
        return batch.append_column(
            "eb", pc.cast(pc.bit_wise_and(key, _TRI_NB - 1), pa.int64())
        )

    def fold_support(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["u", "v"], as_index=False)["n"].sum()
        agg = agg[agg["n"] >= _TRI_MIN_SUPPORT]
        return pa.table(
            {"u": pa.array(agg["u"].to_numpy(), pa.int64()),
             "v": pa.array(agg["v"].to_numpy(), pa.int64())}
        )

    return (
        pair_partials.map_batches(edge_bucket, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(fold_support, batch_format="pandas")
    )


def triangles_degree_oriented(edges: "rd.Dataset") -> "rd.Dataset":
    """Degree-orientation triangle enumeration over an undirected edge set
    (u, v), u < v by id — the power-law-safe variant of graph_triangles'
    stage 3. Returns the triangle Dataset (a, b, c), each triangle exactly
    once, vertices in (degree, id) rank order.

    Orientation: one |V|-row degree aggregate (groupby-count over exploded
    endpoints), broadcast once via ``ray.put`` as two sorted numpy arrays
    (vertex ids + degrees, ~16 B/vertex); each edge is directed from its
    lower-(degree, id) endpoint. Wedges then form at an edge's SOURCE, so a
    hub of degree D generates wedges only from the ≤ O(sqrt(E)) out-degree
    the orientation leaves it — id-orientation's D² wedge blow-up on a
    power-law hub never happens. Closing works on the identical union +
    side-tag bucket merge as the id-oriented path."""
    import ray
    from ray.data.aggregate import Count

    def explode_verts(batch: pa.Table) -> pa.Table:
        vs = pa.concat_arrays(
            [batch["u"].combine_chunks(), batch["v"].combine_chunks()]
        )
        return pa.table({"vtx": vs})

    deg_rows = (
        edges.map_batches(explode_verts, batch_format="pyarrow")
        .groupby("vtx")
        .aggregate(Count(alias_name="deg"))
        .take_all()  # |V| rows — the one driver-sized collect, by design
    )
    if not deg_rows:
        return rd.from_arrow(_TRI_EMPTY)
    vid = np.array([r["vtx"] for r in deg_rows], dtype=np.int64)
    dg = np.array([r["deg"] for r in deg_rows], dtype=np.int64)
    order = np.argsort(vid)
    deg_ref = ray.put((vid[order], dg[order]))

    def orient(batch: pa.Table, _ref=deg_ref) -> pa.Table:
        vid_s, deg_s = ray.get(_ref)
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        du = deg_s[np.searchsorted(vid_s, u)]
        dv = deg_s[np.searchsorted(vid_s, v)]
        u_first = (du < dv) | ((du == dv) & (u < v))
        s = np.where(u_first, u, v)
        t = np.where(u_first, v, u)
        dt = np.where(u_first, dv, du)
        return pa.table(
            {"s": pa.array(s, pa.int64()), "t": pa.array(t, pa.int64()),
             "dt": pa.array(dt, pa.int64()),
             "sb": pa.array(s & (_TRI_NB - 1), pa.int64())}
        )

    # materialized for the same reason as the caller's edge set: consumed
    # by BOTH the wedge groupby and the closing-edge union, and it is
    # |E|-sized (the small side)
    directed = edges.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pa.Table:
        # out-neighbors sorted by (deg, id) rank — _pair_explode then emits
        # each wedge's (b, c) in rank order, matching the directed closing
        # edge's (s, t) orientation
        g = g.sort_values(["s", "dt", "t"])
        ss = g["s"].to_numpy()
        b, c = _pair_explode(ss, g["t"].to_numpy())
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        counts = np.diff(np.r_[starts, len(ss)])
        a_parts: list[np.ndarray] = []
        for cnt in np.unique(counts):
            if cnt < 2:
                continue
            sel = counts == cnt
            a_parts.append(np.repeat(ss[starts[sel]], cnt * (cnt - 1) // 2))
        a = np.concatenate(a_parts) if a_parts else np.array([], dtype=ss.dtype)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
             "c": pa.array(c, pa.int64())}
        )

    wedge_ds = directed.groupby("sb").map_groups(wedges, batch_format="pandas")

    def tag_wedge(batch: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(batch["b"], 1000003), batch["c"])
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "c": batch["c"],
             "kb": pc.cast(pc.bit_wise_and(key, _TRI_NB - 1), pa.int64()),
             "side": pa.array(["W"] * batch.num_rows, pa.string())}
        )

    def tag_edge(batch: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(batch["s"], 1000003), batch["t"])
        return pa.table(
            {"a": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
             "b": batch["s"], "c": batch["t"],
             "kb": pc.cast(pc.bit_wise_and(key, _TRI_NB - 1), pa.int64()),
             "side": pa.array(["E"] * batch.num_rows, pa.string())}
        )

    def close_triangles(g: pd.DataFrame) -> pa.Table:
        w = g[g["side"] == "W"]
        e = g[g["side"] == "E"][["b", "c"]]
        if w.empty or e.empty:
            return _TRI_EMPTY
        hit = w.merge(e, on=["b", "c"], how="inner")
        return pa.table(
            {"a": pa.array(hit["a"].to_numpy(), pa.int64()),
             "b": pa.array(hit["b"].to_numpy(), pa.int64()),
             "c": pa.array(hit["c"].to_numpy(), pa.int64())}
        )

    return (
        wedge_ds.map_batches(tag_wedge, batch_format="pyarrow")
        .union(directed.map_batches(tag_edge, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(close_triangles, batch_format="pandas")
    )


def graph_triangles(sf_dir: str) -> pd.DataFrame:
    """Distributed triangle counting over the co-purchase graph (graph
    analytics family): nodes = parts, edge (u,v) iff parts u<v co-occur in
    ≥ ``_TRI_MIN_SUPPORT`` distinct orders; output = per-part triangle
    participation, top 20 by (count desc, partkey). The support threshold is
    what makes this corpus-scale-stable: random co-occurrence pairs are
    birthday-bounded, so the surviving edge set stays ~constant as the
    catalog and order volume grow together (measured 2.3k/3.4k/3.6k edges at
    sf0.001/0.01/0.1).

    Scale shape — three coarse-bucket exchanges, no driver materialization:
    (1) baskets co-located by ``l_orderkey % NB``, per-order pair generation
    vectorized by group size (`_pair_explode`); (2) support fold + threshold
    co-located by edge hash; (3) wedges from the LOWEST vertex's adjacency
    (triangle a<b<c is generated exactly once, from a) semi-joined against
    the edge set inside one union+side-tag bucket merge keyed on (b,c) — the
    same reduce-side pattern as :func:`q3_shipping_priority`. Id-orientation
    bounds wedge fan-out by the smallest endpoint's degree; at web scale with
    power-law hubs swap in degree-orientation (one |V|-row degree aggregate,
    broadcast or joined) — the bucket plumbing is unchanged. All counts are
    integers, so the DuckDB oracle (the textbook e1⋈e2⋈e3 triple join) is
    hash-exact."""
    # materialize the thresholded edge set: it is consumed twice (wedge
    # generation + the closing-edge union) and a lazy Dataset would re-run
    # the full co-occurrence scan + two shuffles per consumer. The edge set
    # is the SMALL side by construction (support-thresholded,
    # corpus-scale-stable — ~3.6k rows at sf0.1), so pinning it in the
    # object store is the right call at any scale.
    edges = _tri_support_edges(sf_dir).materialize()

    # ---- stage 3: wedges from the lowest vertex, keyed on the closing edge
    def low_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lb", pc.cast(pc.bit_wise_and(batch["u"], _TRI_NB - 1), pa.int64())
        )

    def wedges(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["u", "v"])
        uu = g["u"].to_numpy()
        b, c = _pair_explode(uu, g["v"].to_numpy())
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        counts = np.diff(np.r_[starts, len(uu)])
        # _pair_explode emits pairs grouped by size class, not in input
        # order — build the apex column in the same size-class order
        a_parts: list[np.ndarray] = []
        for cnt in np.unique(counts):
            if cnt < 2:
                continue
            sel = counts == cnt
            a_parts.append(
                np.repeat(uu[starts[sel]], cnt * (cnt - 1) // 2)
            )
        a = (
            np.concatenate(a_parts)
            if a_parts
            else np.array([], dtype=uu.dtype)
        )
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
             "c": pa.array(c, pa.int64())}
        )

    wedge_ds = edges.map_batches(low_bucket, batch_format="pyarrow").groupby(
        "lb"
    ).map_groups(wedges, batch_format="pandas")

    def tag_wedge(batch: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(batch["b"], 1000003), batch["c"])
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "c": batch["c"],
             "kb": pc.cast(pc.bit_wise_and(key, _TRI_NB - 1), pa.int64()),
             "side": pa.array(["W"] * batch.num_rows, pa.string())}
        )

    def tag_edge(batch: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(batch["u"], 1000003), batch["v"])
        return pa.table(
            {"a": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
             "b": batch["u"], "c": batch["v"],
             "kb": pc.cast(pc.bit_wise_and(key, _TRI_NB - 1), pa.int64()),
             "side": pa.array(["E"] * batch.num_rows, pa.string())}
        )

    def close_triangles(g: pd.DataFrame) -> pa.Table:
        w = g[g["side"] == "W"]
        e = g[g["side"] == "E"][["b", "c"]]
        if w.empty or e.empty:
            return _TRI_EMPTY
        hit = w.merge(e, on=["b", "c"], how="inner")
        return pa.table(
            {"a": pa.array(hit["a"].to_numpy(), pa.int64()),
             "b": pa.array(hit["b"].to_numpy(), pa.int64()),
             "c": pa.array(hit["c"].to_numpy(), pa.int64())}
        )

    tris = (
        wedge_ds.map_batches(tag_wedge, batch_format="pyarrow")
        .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(close_triangles, batch_format="pandas")
    )

    def explode_parts(batch: pa.Table) -> pa.Table:
        stacked = pa.concat_arrays(
            [batch["a"].combine_chunks(), batch["b"].combine_chunks(),
             batch["c"].combine_chunks()]
        )
        return pa.table({"l_partkey": stacked})

    from ray.data.aggregate import Count

    counts = (
        tris.map_batches(explode_parts, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Count(alias_name="n_triangles"))
        .to_pandas()  # ≤ |parts in any triangle| rows — driver-sized
    )
    counts["n_triangles"] = counts["n_triangles"].astype("int64")
    out = counts.sort_values(
        ["n_triangles", "l_partkey"], ascending=[False, True]
    ).head(20)
    return out.reset_index(drop=True)


def _triangles_sql() -> str:
    """Oracle: the textbook triple self-join e1⋈e2⋈e3 over the thresholded
    co-occurrence edge set — same support threshold, same top-20 tie-break."""
    return f"""
    WITH occ AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS support
      FROM occ a
      JOIN occ b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (SELECT u, v FROM pairs WHERE support >= {_TRI_MIN_SUPPORT}),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    parts3 AS (
      SELECT a AS p FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT CAST(p AS BIGINT) AS l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM parts3
    GROUP BY p
    ORDER BY n_triangles DESC, l_partkey
    LIMIT 20
    """


def graph_triangles_degree(sf_dir: str) -> pd.DataFrame:
    """Degree-orientation triangle counting (the web-scale swap documented
    in :func:`graph_triangles`): same thresholded co-purchase edge set, same
    output, but stage 3 orients every edge from its lower-(degree, id)
    endpoint via a broadcast |V|-row degree aggregate
    (:func:`triangles_degree_oriented`), so wedge fan-out at a power-law hub
    is bounded by its out-degree (≤ O(sqrt(E))), not its total degree
    squared. Triangle participation is orientation-invariant, so the oracle
    is graph_triangles' textbook triple join, unchanged."""
    tris = triangles_degree_oriented(_tri_support_edges(sf_dir).materialize())

    def explode_parts(batch: pa.Table) -> pa.Table:
        stacked = pa.concat_arrays(
            [batch["a"].combine_chunks(), batch["b"].combine_chunks(),
             batch["c"].combine_chunks()]
        )
        return pa.table({"l_partkey": stacked})

    from ray.data.aggregate import Count

    counts = (
        tris.map_batches(explode_parts, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Count(alias_name="n_triangles"))
        .to_pandas()
    )
    counts["n_triangles"] = counts["n_triangles"].astype("int64")
    out = counts.sort_values(
        ["n_triangles", "l_partkey"], ascending=[False, True]
    ).head(20)
    return out.reset_index(drop=True)


def _pagerank_sql() -> str:
    """Oracle: same transition extraction via lead() and the same ITERS
    integer-floored power-iteration steps unrolled as CTEs (the unrolled-Lloyd
    pattern from the k-means oracle)."""
    S, DN, DD = _PR_SCALE, _PR_DNUM, _PR_DDEN
    cte = [f"""
        seq AS (
          SELECT event_type AS src,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
          FROM events
        ),
        edges AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
        ),
        nodes AS (SELECT DISTINCT event_type AS v FROM events),
        params AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nodes),
        outdeg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS deg FROM edges GROUP BY src),
        r0 AS MATERIALIZED (SELECT v, {S} // nn AS r FROM nodes, params)"""]
    for k in range(_PR_ITERS):
        # MATERIALIZED is load-bearing: r{{k}} is referenced twice per step,
        # and an inlined CTE chain would expand 2^ITERS-fold
        cte.append(f"""
        r{k + 1} AS MATERIALIZED (
          SELECT n.v,
                 {(DD - DN) * S} // ({DD} * p.nn)
                 + COALESCE(inc.s, 0)
                 + dang.s AS r
          FROM nodes n
          CROSS JOIN params p
          CROSS JOIN (
            SELECT COALESCE(SUM(({DN} * r.r) // ({DD} * p2.nn)), 0) AS s
            FROM r{k} r CROSS JOIN params p2
            WHERE r.v NOT IN (SELECT src FROM outdeg)
          ) dang
          LEFT JOIN (
            SELECT e.dst AS v, SUM(({DN} * r.r * e.n) // ({DD} * o.deg)) AS s
            FROM edges e JOIN r{k} r ON r.v = e.src JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst
          ) inc ON inc.v = n.v
        )""")
    return (
        "WITH" + ",".join(cte)
        + f"""
        SELECT v AS event_type, CAST(r AS BIGINT) AS rank_scaled
        FROM r{_PR_ITERS} ORDER BY event_type
    """
    )


def events_ntile(sf_dir: str) -> pd.DataFrame:
    """Exact global NTILE(4) bucketing WITHOUT a global sort — the
    range-partitioned prefix-sum rank pattern (`corpus.py:epoch_shuffle`)
    applied to a value ordering: (1) deterministic bottom-k sample →
    value-band boundaries, (2) rows band by ``searchsorted`` (order-aligned
    ranges, one band-hash shuffle), (3) per-band counts → tiny driver
    prefix-sum bases, (4) each band sorts only its own rows and adds its
    base = exact global rank by ``(value, event_id)``; NTILE's
    first-r-buckets-get-ceil split is applied arithmetically and each band
    emits ≤k partial rows, so the final groupby is k rows. Sample skew only
    affects band BALANCE, never correctness."""
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.corpus import bottom_k_sample

    K, NB = 4, 32  # tiles; value bands (a JOB parameter, like num_partitions)
    ds = _read(sf_dir, "events", ["event_id", "value"])
    sample = bottom_k_sample(ds, k=512, id_col="event_id").to_pandas()
    qs = np.linspace(0.0, 1.0, NB + 1)[1:-1]
    bounds = np.unique(
        np.percentile(sample["value"].to_numpy(dtype="float64"), qs * 100, method="linear")
    )

    def band(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype("float64")
        return pa.table(
            {"band": pa.array(np.searchsorted(bounds, v, side="left").astype("int64")),
             "event_id": batch["event_id"].cast(pa.int64()),
             "value": pa.array(v, pa.float64())}
        )

    from ray.data.aggregate import Count

    banded = ds.map_batches(band, batch_format="pyarrow").materialize()
    counts = banded.groupby("band").aggregate(Count(alias_name="n")).take_all()
    counts.sort(key=lambda r: r["band"])
    total = sum(int(r["n"]) for r in counts)
    bases: dict[int, int] = {}
    acc = 0
    for r in counts:
        bases[int(r["band"])] = acc
        acc += int(r["n"])
    q, rem = divmod(total, K)
    split = rem * (q + 1)

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["value", "event_id"])
        rank0 = bases[int(g["band"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        bucket = np.where(
            rank0 < split, rank0 // max(q + 1, 1), rem + (rank0 - split) // max(q, 1)
        ).astype("int64") + 1
        v = g["value"].to_numpy(dtype="float64")
        pdf = pd.DataFrame(
            {"bucket": bucket,
             "cents": np.floor(v * 100 + 0.5).astype("int64"),
             "v": v}
        )
        agg = pdf.groupby("bucket", as_index=False).agg(
            n_events=("v", "size"), sum_cents=("cents", "sum"),
            min_value=("v", "min"), max_value=("v", "max"))
        return pa.table(
            {"bucket": pa.array(agg["bucket"], pa.int64()),
             "n_events": pa.array(agg["n_events"], pa.int64()),
             "sum_cents": pa.array(agg["sum_cents"], pa.int64()),
             "min_value": pa.array(agg["min_value"], pa.float64()),
             "max_value": pa.array(agg["max_value"], pa.float64())}
        )

    out = (
        banded.groupby("band").map_groups(rank_bucket, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_cents", alias_name="sum_cents"),
                   Min("min_value", alias_name="min_value"),
                   Max("max_value", alias_name="max_value"))
    )
    pdf = out.to_pandas()
    for c in ("n_events", "sum_cents"):
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values("bucket").reset_index(drop=True)


def events_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE grouping sets (the ROLLUP family's other member): every batch
    emits partials for ALL FOUR grouping sets of (event_type, hour) in one
    pass — sentinel '#all'/-1 marks a rolled-up dimension ('#'-prefix, never
    NUL: pandas hashes embedded-NUL strings as C strings and silently merges
    them) — then ONE groupby folds the ≤4×|types|×24-row partial stream.
    The corpus is read once; no per-grouping-set re-scan."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        pdf["hour"] = pdf["ts"].dt.hour.astype("int64")
        pdf["cents"] = np.floor(pdf["value"].to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
        # ONE full-row groupby (the finest set); the other three grouping
        # sets are exact re-aggregations of its ≤|types|×24-row result
        fine = (
            pdf.groupby(["event_type", "hour"], as_index=False)
            .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
        )
        frames = [fine]
        for keep_type, keep_hour in ((True, False), (False, True), (False, False)):
            g = fine.copy()
            if not keep_type:
                g["event_type"] = "#all"
            if not keep_hour:
                g["hour"] = -1
            frames.append(
                g.groupby(["event_type", "hour"], as_index=False)
                .agg(n_events=("n_events", "sum"), sum_cents=("sum_cents", "sum"))
            )
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {"event_type": pa.array(out["event_type"], pa.string()),
             "hour": pa.array(out["hour"], pa.int64()),
             "n_events": pa.array(out["n_events"], pa.int64()),
             "sum_cents": pa.array(out["sum_cents"], pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )
    pdf = out.to_pandas()
    for c in ("n_events", "sum_cents"):
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(["event_type", "hour"]).reset_index(drop=True)


def cdc_view_maintenance(sf_dir: str) -> pd.DataFrame:
    """Incremental view maintenance (IVM): a grouped-aggregate view
    (rows + sum(size) per repo) maintained THROUGH the exactly-once merge at
    delta cost — each epoch's merge task writes the view delta
    (new contribution − retracted contribution) from state it already holds,
    so the lake is never rescanned (``stages/sink.py:view_contribution``).
    ``read_view`` folds the committed epochs' delta files with one
    group-cardinality groupby. chunks_per_epoch=1 maximizes the number of
    incremental steps the oracle must agree with (updates retract, deletes
    retract-without-adding, the mid-stream schema widening flows through).
    The reference materializes only the event stream (`transfer_thread.rb`);
    this is the natural next step a lake-sink user asks of a CDC engine."""
    import shutil as _shutil

    from ..config import ViewSpec as _VS
    from ..pipelines.replay import read_view as _rv
    from ..pipelines.replay import replay as _replay
    from ..synth import config_for_spec as _cfs

    stream = _flagship_stream()
    lake = "/tmp/movex_flagship/lake_views"
    _shutil.rmtree(lake, ignore_errors=True)
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    cfg.views = [_VS("by_repo", ["repo"], ["size"])]
    _replay(stream, lake, cfg, chunks_per_epoch=1)
    pdf = _rv(lake, "by_repo").to_pandas()
    pdf["n_rows"] = pdf["n_rows"].astype("int64")
    pdf["sum_size"] = pdf["sum_size"].astype("int64")
    return pdf.sort_values("repo").reset_index(drop=True)[["repo", "n_rows", "sum_size"]]


def cdc_view_maintenance_delta(sf_dir: str) -> pd.DataFrame:
    """IVM under ``merge_mode='delta'``: delta-mode epochs defer view
    maintenance to ``compact()`` — the compact task is where base + delta
    chain first meet, so it computes the view delta for exactly the keys
    the chain touched (retract old base state, add resolved state;
    ``pipelines/replay.py:_compact_part_task``). Epoch cost stays ∝ delta
    and the view lags the lake by at most one compaction interval — the
    shape delta mode exists for at 10^10 events. Replays half the stream,
    compacts mid-stream (one view delta), replays the rest, compacts again:
    the folded view must equal the batch recompute, same oracle as the
    rewrite-mode query."""
    import shutil as _shutil

    from ..config import ViewSpec as _VS
    from ..pipelines.replay import compact as _compact
    from ..pipelines.replay import read_view as _rv
    from ..pipelines.replay import replay as _replay
    from ..sources.stream import list_chunks as _lc
    from ..synth import config_for_spec as _cfs

    stream = _flagship_stream()
    lake = "/tmp/movex_flagship/lake_views_delta"
    _shutil.rmtree(lake, ignore_errors=True)
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    cfg.views = [_VS("by_repo", ["repo"], ["size"])]
    n_chunks = len(_lc(stream))
    half = max(1, n_chunks // 2)
    _replay(stream, lake, cfg, chunks_per_epoch=1, max_epochs=half,
            merge_mode="delta", drain_retries=False)
    _compact(lake, cfg)  # mid-stream compaction: first view delta
    _replay(stream, lake, cfg, chunks_per_epoch=1, merge_mode="delta")
    _compact(lake, cfg)  # final compaction folds the remaining chain
    pdf = _rv(lake, "by_repo").to_pandas()
    pdf["n_rows"] = pdf["n_rows"].astype("int64")
    pdf["sum_size"] = pdf["sum_size"].astype("int64")
    return pdf.sort_values("repo").reset_index(drop=True)[["repo", "n_rows", "sum_size"]]


def _view_maintenance_sql() -> str:
    """Oracle: the same grouped aggregate recomputed from scratch over the
    converged flagship state (the full _flagship_sql chain as a subquery) —
    incremental maintenance and batch recomputation must agree exactly."""
    return f"""
        SELECT repo,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(size) AS BIGINT) AS sum_size
        FROM ({_flagship_sql()})
        GROUP BY repo
        ORDER BY repo
    """


def cdc_produce_delivery(sf_dir: str) -> pd.DataFrame:
    """The reference's PRIMARY output path as a driver query: transactional
    topic delivery (`pipelines/produce.py`) of the flagship change stream —
    every captured (non-no-op) event ships as a rendered message to its
    topic's partition files, exactly-once. Output = one row per delivered
    message (id, long op name, formatted envelope timestamp, topic, rendered
    message key); the oracle re-derives all of it from the staged chunks in
    SQL, including the M4 no-op-update suppression and the old-image key for
    DELETEs (`transfer_thread.rb:200-320`, `kafka_mock.rb:49-63`)."""
    import shutil as _shutil

    from ..pipelines.produce import produce as _produce
    from ..pipelines.produce import topic_messages as _tm
    from ..synth import config_for_spec as _cfs

    stream = _flagship_stream()
    out = "/tmp/movex_flagship/topics_out"
    _shutil.rmtree(out, ignore_errors=True)
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    _produce(stream, out, cfg, chunks_per_epoch=2)
    msgs = _tm(out, "lake.code.files")
    rows = [
        {"id": m["value"]["id"], "operation": m["value"]["operation"],
         "timestamp": m["value"]["timestamp"], "topic": "lake.code.files",
         "msg_key": m["key"]}
        for m in msgs
    ]
    return (
        pd.DataFrame(rows)
        .astype({"id": "int64"})
        .sort_values("id")
        .reset_index(drop=True)
    )


def _produce_sql() -> str:
    """Oracle for cdc_produce_delivery: the flagship chunks' kept events
    (same no-op suppression the capture applies), projected to the envelope
    fields and the P-mode JSON key (old image for DELETEs)."""
    from ..synth import config_for_spec as _cfs

    _flagship_stream()
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    t = cfg.tables[0]
    fields = list(cfg.latest_version().payload_fields)
    noop_eq = "\n                 AND ".join(
        f"new_{f} IS NOT DISTINCT FROM old_{f}" for f in fields
    )
    key_frags = " || ', ' || ".join(
        f"""'"{c}": "' || (CASE WHEN op = 'D' THEN old_{c} ELSE new_{c} END) || '"'"""
        for c in t.pk_columns
    )
    return f"""
        WITH ev AS (
          SELECT * FROM read_parquet('{_FLAGSHIP_STREAM_DIR}/chunk_*.parquet',
                                     union_by_name=true)
        ), kept AS (
          SELECT * FROM ev
          WHERE NOT (op = 'U'
                 AND {noop_eq})
        )
        SELECT id,
               CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE'
                       WHEN 'D' THEN 'DELETE' ELSE 'INIT' END AS operation,
               strftime(created_at, '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS timestamp,
               'lake.code.files' AS topic,
               '{{' || {key_frags} || '}}' AS msg_key
        FROM kept
        ORDER BY id
    """


def cdc_consumer_state(sf_dir: str) -> pd.DataFrame:
    """End-to-end closure of the delivery contract: the flagship stream is
    DELIVERED as rendered topic messages (``pipelines/produce.py``), then a
    downstream consumer rebuilds converged table state from the delivered
    messages ALONE (``produce.materialize_topic`` — Arrow-struct flatten of
    the parsed JSON, within-batch combiner, one key-hash shuffle, arg-max-
    by-id fold with DELETE tombstones). The DuckDB oracle re-derives the
    same state from the RAW binlog chunks (``_flagship_sql``), never reading
    the messages — so equality proves capture → render → deliver → consume
    → fold loses nothing: the message feed is a complete changelog, the
    reference's consumer promise (`doc/movex-cdc.adoc:727-741`,
    `transfer_thread.rb:493-518`)."""
    import shutil as _shutil

    from ..pipelines.produce import materialize_topic as _mt
    from ..pipelines.produce import produce as _produce
    from ..synth import config_for_spec as _cfs

    stream = _flagship_stream()
    out = "/tmp/movex_flagship/topics_consumer"
    _shutil.rmtree(out, ignore_errors=True)
    cfg = _cfs(_flagship_spec(), num_partitions=8)
    _produce(stream, out, cfg, chunks_per_epoch=2)
    pdf = _mt(out, "lake.code.files", cfg).to_pandas()
    pdf["size"] = pdf["size"].astype("int64")
    return (
        pdf[["repo", "path", "commit", "lang", "content", "size",
             "_key", "_last_id", "_last_op"]]
        .sort_values("_key")
        .reset_index(drop=True)
    )


def join_broadcast(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (J1 pattern): tiny dimension shipped once via ray.put,
    looked up per batch — never a shuffle join. Customers per nation."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    # the dimension ships to each pool actor ONCE via constructor args (Ray
    # puts them in the object store itself — an explicit ray.put here only
    # adds an ownership warning when actor restarts are enabled)
    lookup = {
        "keys": pa.array([r["n_nationkey"] for r in nation], pa.int64()),
        "names": pa.array([r["n_name"] for r in nation], pa.string()),
    }

    class Enrich:
        """Broadcast dimension as two Arrow arrays; the per-batch lookup is
        ``pc.index_in`` + ``take`` — zero-copy, fully vectorized (no per-row
        dict.get loop)."""

        def __init__(self, ref):
            side = ray.get(ref) if not isinstance(ref, dict) else ref
            self.keys = side["keys"]
            self.names = side["names"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch["c_nationkey"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col.cast(pa.int64()), value_set=self.keys)
            return batch.append_column("n_name", self.names.take(idx))

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    out = (
        ds.map_batches(Enrich, fn_constructor_args=(lookup,), batch_format="pyarrow", concurrency=2)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"))
    )
    return _sorted_pdf(out, "n_name")


def join_hash(sf_dir: str) -> pd.DataFrame:
    """Partitioned hash join (both sides large): bucket = key % B on both
    sides, union, per-bucket pandas merge inside map_groups, then the final
    small aggregate — the portable Ray Data join shape. Revenue (cents) per
    order priority."""
    B = 16
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    # both tags emit the SAME declared schema (o_orderpriority string on
    # both sides, no pandas metadata): union sides must match exactly or
    # Ray's block concat falls back to slow schema unification and logs
    # "Failed to hash the schemas" from every reduce task
    def tag_li(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].combine_chunks() if isinstance(batch["l_orderkey"], pa.ChunkedArray) else batch["l_orderkey"]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "bucket": pc.bit_wise_and(ok.cast(pa.int64()), B - 1),  # B is a power of 2
                "orderkey": ok.cast(pa.int64()),
                "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")),
                "o_orderpriority": pa.nulls(n, pa.string()),
                "side": pa.array(["L"] * n, pa.string()),
            }
        )

    def tag_o(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].combine_chunks() if isinstance(batch["o_orderkey"], pa.ChunkedArray) else batch["o_orderkey"]
        n = len(batch)
        return pa.table(
            {
                "bucket": pc.bit_wise_and(ok.cast(pa.int64()), B - 1),
                "orderkey": ok.cast(pa.int64()),
                "rev_cents": pa.array(np.zeros(n, dtype="int64")),
                "o_orderpriority": batch["o_orderpriority"].cast(pa.string()),
                "side": pa.array(["O"] * n, pa.string()),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_o, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "rev_cents"]]
        right = g[g["side"] == "O"][["orderkey", "o_orderpriority"]]
        j = left.merge(right, on="orderkey", how="inner")
        agg = (
            j.groupby("o_orderpriority", as_index=False)["rev_cents"].sum()
            .rename(columns={"rev_cents": "revenue_cents"})
        )
        return pa.table(
            {"o_orderpriority": pa.array(agg["o_orderpriority"], pa.string()),
             "revenue_cents": pa.array(agg["revenue_cents"], pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    pdf = out.to_pandas()
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")
    return pdf.sort_values("o_orderpriority").reset_index(drop=True)


_BLOOM_BITS = 1 << 16  # 64 kbit filter, broadcast once
_BLOOM_NATION = 3  # present at every test scale (sf0.001 has a sparse nation set)


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two vectorized multiplicative-hash bit positions per key (uint64
    wraparound intended; array ops don't warn)."""
    k = keys.astype(np.uint64)
    h1 = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)
    h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(48)
    return h1.astype(np.int64), h2.astype(np.int64)


def join_bloom_prefilter(sf_dir: str) -> pd.DataFrame:
    """Bloom-pushdown semi-join (the 4th join strategy beside broadcast /
    partitioned-hash / salted-skew): revenue per supplier for one nation's
    suppliers. The filtered dim side builds a 64-kbit Bloom filter
    DISTRIBUTED (per-batch partial bitmaps, one driver OR over
    blocks-count × 8 KB partials), broadcast once via ``ray.put``; the fact
    scan probes it per batch and only probable rows enter the exchange —
    at a 1-in-25 selectivity that is a ~25× shuffle-volume cut, which is
    the entire point at 100 TB. Bloom false positives (bounded by the m/n
    ratio) are eliminated by the reduce-side EXACT semi-join, so the result
    is byte-identical to the plain join — the filter is pure shuffle
    avoidance, never an approximation of the answer."""
    import ray

    B = 16
    sup = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).filter(expr=f"s_nationkey == {_BLOOM_NATION}")

    def partial_bloom(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        h1, h2 = _bloom_positions(keys)
        bits[h1] = True
        bits[h2] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()], pa.binary())})

    partials = sup.map_batches(partial_bloom, batch_format="pyarrow").take_all()
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for row in partials:  # one 8 KB partial per dim block — driver-bounded
        bits |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(bits).astype(bool))

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def probe(batch: pa.Table, _ref=bloom_ref) -> pa.Table:
        bl = ray.get(_ref)
        keys = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        h1, h2 = _bloom_positions(keys)
        keep = bl[h1] & bl[h2]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        kk = keys[keep].astype(np.int64)
        return pa.table(
            {"bucket": pa.array(kk % B, pa.int64()),
             "suppkey": pa.array(kk, pa.int64()),
             "rev_cents": pa.array(
                 np.floor(ep * (1 - disc) * 100 + 0.5).astype(np.int64)
             ),
             "side": pa.array(["L"] * int(keep.sum()), pa.string())}
        )

    def tag_dim(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(keys % B, pa.int64()),
             "suppkey": pa.array(keys, pa.int64()),
             "rev_cents": pa.array(np.zeros(len(keys), dtype=np.int64)),
             "side": pa.array(["S"] * len(keys), pa.string())}
        )

    def exact_semi(g: pd.DataFrame) -> pa.Table:
        present = g.loc[g["side"] == "S", "suppkey"].unique()
        l = g[g["side"] == "L"]
        l = l[l["suppkey"].isin(present)]  # kills bloom false positives
        agg = l.groupby("suppkey", as_index=False)["rev_cents"].sum()
        return pa.table(
            {"suppkey": pa.array(agg["suppkey"].to_numpy(), pa.int64()),
             "revenue_cents": pa.array(agg["rev_cents"].to_numpy(), pa.int64())}
        )

    out = (
        li.map_batches(probe, batch_format="pyarrow")
        .union(sup.map_batches(tag_dim, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(exact_semi, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # typed empty (no supplier in the nation at this scale)
        out = pd.DataFrame({"suppkey": pd.array([], dtype="int64"),
                            "revenue_cents": pd.array([], dtype="int64")})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("suppkey").reset_index(drop=True)


def events_tumbling_window(sf_dir: str) -> pd.DataFrame:
    """Windowed aggregate (streaming-shaped): 10-minute tumbling windows per
    user — event count + value sum per (user, window)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
        return batch.append_column(
            "window_start", pc.floor_temporal(ts, multiple=10, unit="minute")
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    pdf = out.to_pandas()
    pdf["sum_value"] = round_half_away(pdf["sum_value"], 6)
    return pdf.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def events_hopping_window(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) window aggregate: 10-minute windows every 5 minutes.

    Each event replicates to exactly size/hop = 2 windows INSIDE map_batches
    (one vectorized floor + one duration subtract, then a concat), then ONE
    groupby — the streaming-window shape where the replication factor, not
    the event count, bounds the extra shuffle volume."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    hop_us = pa.scalar(5 * 60 * 1_000_000, pa.duration("us"))

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
        s1 = pc.floor_temporal(ts, multiple=5, unit="minute")
        s2 = pc.subtract(s1, hop_us)
        val = batch["value"]
        return pa.concat_tables(
            [pa.table({"window_start": s1, "value": val}),
             pa.table({"window_start": s2, "value": val})]
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    pdf = out.to_pandas()
    pdf["sum_value"] = round_half_away(pdf["sum_value"], 6)
    return pdf.sort_values("window_start").reset_index(drop=True)


def events_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it (order by ts, then event_id for ties).

    groupby(user).map_groups with a vectorized sort + forward-fill per group
    — the partitioned as-of shape: only per-user history co-locates, never a
    global sort. -1 marks purchases with no prior click."""
    import pyarrow.dataset as pads

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin(["click", "purchase"]),
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        click_id = g["event_id"].where(g["event_type"] == "click").ffill()
        out = g[g["event_type"] == "purchase"]
        return pd.DataFrame(
            {"event_id": out["event_id"].astype("int64"),
             "user_id": out["user_id"].astype("int64"),
             "last_click_id": click_id[out.index].fillna(-1).astype("int64")}
        )

    out = ds.groupby("user_id").map_groups(asof, batch_format="pandas")
    return _sorted_pdf(out, "event_id")


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Count-distinct via two-level groupby (exact, shuffle-bounded by the
    distinct pair count, not the event count)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="n"))
    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    return _sorted_pdf(out, "event_type")


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-group exact quantiles (p50/p90/p99): groupby(type).map_groups
    with one vectorized np.quantile per group. Shuffle is bounded by the
    group count × group size — the exact-quantile shape when groups fit a
    task (for quantiles over an unbounded key space, pre-bucket values and
    merge histograms instead)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        p50, p90, p99 = np.quantile(v, [0.5, 0.9, 0.99])
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "n": np.int64(len(v)),
             "p50": round(float(p50), 6), "p90": round(float(p90), 6),
             "p99": round(float(p99), 6)}
        )

    out = ds.groupby("event_type").map_groups(q, batch_format="pandas")
    return _sorted_pdf(out, "event_type")


def events_hourly_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (grouping sets): counts per (event_type, hour), per-type
    subtotals, grand total. The wide groupby runs distributed; the rollup
    levels derive from the tiny cell table (≤ types × 24 rows) — never a
    second pass over events."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_hour(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
        return pa.table({"event_type": batch["event_type"], "hour": pc.hour(ts).cast(pa.int64())})

    from ray.data.aggregate import Count

    cells = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    subtot = cells.groupby("event_type", as_index=False)["n"].sum().assign(hour=-1)
    grand = pd.DataFrame({"event_type": ["ALL"], "hour": [-1], "n": [cells["n"].sum()]})
    out = pd.concat([cells, subtot, grand], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["hour"] = out["hour"].astype("int64")
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)[["event_type", "hour", "n"]]


def sessionize(sf_dir: str) -> pd.DataFrame:
    """Session windows (gap > 30 min starts a new session) per user — the
    groupby(key).map_groups ordered-log pattern for stream-shaped data."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(gap.sum()) + 1],
                "n_events": [len(g)],
            }
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return _sorted_pdf(out, "user_id")


FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel signup→view→click→purchase: a user reaches
    step i when an event of that type occurs STRICTLY after their earliest
    completion of step i-1 (min-ts chaining). Per-user groups stay small at
    any corpus size, so the heavy work is one user-hash shuffle +
    map_groups; the per-step counts come from a second tiny aggregate over
    one row per user (never a driver-side scan of events)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        t_prev = None
        d = 0
        for step in FUNNEL_STEPS:
            sel = g.loc[g["event_type"].eq(step), "ts"]
            if t_prev is not None:
                sel = sel[sel > t_prev]
            if sel.empty:
                break
            t_prev = sel.min()
            d += 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "depth": [d]})

    from ray.data.aggregate import Count

    per_depth = (
        ds.groupby("user_id")
        .map_groups(depth, batch_format="pandas")
        .groupby("depth")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    # n_users reaching step i = users whose depth >= i (≤ |steps|+1 rows).
    counts = per_depth.set_index("depth")["n"]
    rows = [
        {
            "step_idx": np.int64(i + 1),
            "step": step,
            "n_users": np.int64(counts[counts.index >= i + 1].sum()),
        }
        for i, step in enumerate(FUNNEL_STEPS)
    ]
    return pd.DataFrame(rows, columns=["step_idx", "step", "n_users"])


def events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: cohort = calendar date of a user's first
    event; cell (cohort, k) = distinct users of that cohort active k days
    later. Per-user map_groups emits (cohort, offset) pairs already
    deduplicated within the user (≤ active-days rows per user), so the
    final groupby counts users directly — no DISTINCT over raw events."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        days = g["ts"].dt.normalize().drop_duplicates()
        d0 = days.min()
        return pd.DataFrame(
            {
                "cohort_date": d0.strftime("%Y-%m-%d"),
                "day_offset": (days - d0).dt.days.astype("int64"),
            }
        )

    from ray.data.aggregate import Count

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cohort_date", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["day_offset"] = out["day_offset"].astype("int64")
    return (
        out.sort_values(["cohort_date", "day_offset"]).reset_index(drop=True)[
            ["cohort_date", "day_offset", "n_users"]
        ]
    )


def events_anomaly(sf_dir: str) -> pd.DataFrame:
    """Robust per-type outlier detection: |value − median| > 3·MAD. Two
    per-type median passes (same exact-quantile shape as
    events_value_quantiles — pre-bucket + histogram-merge is the unbounded
    alternative, see that docstring) produce a tiny (type → med, mad) map
    that is broadcast into a streaming map_batches filter — the full events
    table is never shuffled, only the two single-column median exchanges."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def med_of(col: str):
        def m(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"event_type": [g["event_type"].iloc[0]],
                 "med": [float(np.median(g[col].to_numpy()))]}
            )
        return m

    meds = (
        ds.groupby("event_type").map_groups(med_of("value"), batch_format="pandas").to_pandas()
    )
    med_map = dict(zip(meds["event_type"], meds["med"]))

    def absdev(batch: pd.DataFrame) -> pd.DataFrame:
        med = batch["event_type"].map(med_map).to_numpy(dtype="float64")
        return pd.DataFrame(
            {"event_type": batch["event_type"],
             "ad": np.abs(batch["value"].to_numpy() - med)}
        )

    mads = (
        ds.map_batches(absdev, batch_format="pandas")
        .groupby("event_type")
        .map_groups(med_of("ad"), batch_format="pandas")
        .to_pandas()
    )
    mad_map = dict(zip(mads["event_type"], mads["med"]))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        med = batch["event_type"].map(med_map).to_numpy(dtype="float64")
        mad = batch["event_type"].map(mad_map).to_numpy(dtype="float64")
        dev = batch["value"].to_numpy() - med
        keep = (mad > 0) & (np.abs(dev) > 3 * mad)
        out = batch.loc[keep, ["event_id", "event_type", "value"]].copy()
        out["robust_z"] = _rha(dev[keep] / mad[keep], 6)
        return out

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-data operators: dedup / text / similarity / multimodal
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup = hash-partition + per-group first (min doc_id wins)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = fdedup.exact_dedup_keep_first(ds)
    return _sorted_pdf(out, "content_md5")


def dedup_minhash(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup candidate pairs with exact Jaccard verify
    (shingle→minhash→band→bucket groupby→verify). Deterministic (seeded)
    and fully value-checked against SQL: the oracle replays the identical
    md5 shingle hashes, permutation table and band equality (_minhash_sql)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return fdedup.ngram_jaccard_pairs(ds, threshold=0.5)


def dedup_jaccard(sf_dir: str) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (inverted-index shape, no LSH
    recall loss) — full DuckDB value oracle; see dedup_minhash for the
    banded approximate variant of the same similarity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pdf = fdedup.ngram_jaccard_exact(ds, threshold=0.5)
    pdf["a_id"] = pdf["a_id"].astype("int64")
    pdf["b_id"] = pdf["b_id"].astype("int64")
    return pdf


def dedup_minhash_recall(sf_dir: str) -> pd.DataFrame:
    """Dedup-quality eval (the near-dup counterpart of ann_recall): run the
    banded-LSH pipeline AND the exact inverted-index pipeline over the same
    corpus and report how many true ≥0.5-Jaccard pairs the 16-band LSH
    recovered — the recall a corpus owner checks before trusting the
    approximate path at 100 TB where the exact join is off the table. Both
    legs are the existing distributed pipelines; the comparison itself is a
    driver-side merge of two small pair sets. recall_permille uses integer
    division so the value is exact."""
    lsh = dedup_minhash(sf_dir)[["a_id", "b_id"]]
    ex = dedup_jaccard(sf_dir)[["a_id", "b_id"]]
    m = ex.merge(lsh, on=["a_id", "b_id"], how="inner")
    n_exact, n_lsh, n_common = len(ex), len(lsh), len(m)
    recall = n_common * 1000 // n_exact if n_exact else 1000
    return pd.DataFrame(
        {"n_exact": pd.array([n_exact], dtype="int64"),
         "n_lsh": pd.array([n_lsh], dtype="int64"),
         "n_common": pd.array([n_common], dtype="int64"),
         "recall_permille": pd.array([recall], dtype="int64")}
    )


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash fingerprints + 16-bit bands for hamming bucketing — full SQL
    value oracle (word hash = DuckDB md5_number_upper; see SimHasher)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(fdedup.SimHasher(), batch_format="pandas", concurrency=2)
    pdf = out.to_pandas()[["doc_id", "simhash", "simhash_band_0", "simhash_band_1"]]
    pdf["simhash"] = pdf["simhash"].astype("uint64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def dedup_embedding(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs, cosine ≥ 0.45 — EXACT, via the
    distributed triangle tile join (no driver-side corpus materialization);
    see dedup_embedding_lsh for the approximate single-shuffle scale path."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = fdedup.embedding_neardup_pairs(ds, threshold=0.45)
    return pdf[["a_id", "b_id"]].astype("int64") if len(pdf) else pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
    )


def dedup_semantic(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style semantic dedup: k-means-clustered embedding space,
    near-dup pairs (cosine ≥ 0.45) found only WITHIN each cluster — the
    single-shuffle scale path between the exact triangle join
    (dedup_embedding) and the hyperplane-LSH buckets (dedup_embedding_lsh).
    Full SQL value oracle incl. the unrolled Lloyd training (_semdedup_sql)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = fdedup.semantic_dup_pairs(ds, threshold=0.45)
    return pdf


def knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k vs a broadcast query matrix (query ids 0-4)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = fsim.brute_force_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10)
    return pdf[["query_id", "neighbor_id", "rank", "cosine"]]


def knn_filtered(sf_dir: str) -> pd.DataFrame:
    """Metadata-filtered vector search (the vector-DB workload: predicate +
    top-k): neighbors restricted to ``label = 2 AND vec_id % 3 = 0``. The
    equality predicate pushes into the parquet SCAN (`_read(filter=...)` —
    row groups whose zone maps exclude label 2 never leave storage); the
    modulo residual filters per batch in Arrow. The scorer then runs the
    standard broadcast-query matmul over the pruned corpus — filtering
    BEFORE scoring is the whole economics of filtered ANN at 100 TB (the
    alternative, post-filtering a top-k′, under-fills k when the predicate
    is selective)."""
    import pyarrow.dataset as pads

    full = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = _read(
        sf_dir, "embeddings", ["vec_id", "embedding", "label"],
        filter=(pads.field("label") == 2),
    ).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["vec_id"],
                    pc.multiply(pc.divide(t["vec_id"], 3), 3),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    pdf = fsim.brute_force_topk(
        full, query_ids=[0, 1, 2, 3, 4], k=10, corpus=corpus
    )
    return pdf[["query_id", "neighbor_id", "rank", "cosine"]]


def ann_lsh(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed approximate top-k (the scale path); value-checked via
    the literal hyperplane-matrix SQL oracle (_ann_lsh_sql). Multi-table
    LSH (8 independent seed+t tables, exact-bucket probes + Hamming-1
    multiprobe) — recall/scan-fraction is the JOB-parameter dial, measured
    by ann_recall on this corpus: 1 table ≈ 0.1 recall@10, 4 ≈ 0.4,
    8 ≈ 0.64 at ~25% scanned (cost-matched with IVF's n_probe=4/16 cells,
    which reaches ~0.86 — cluster structure beats random hyperplanes here;
    both dials documented)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.lsh_bucketed_ann(
        ds, query_ids=[0, 1, 2, 3, 4], k=10, multiprobe=1, n_tables=8
    )


def ann_lsh_mp(sf_dir: str) -> pd.DataFrame:
    """Hyperplane LSH at the tuned multi-probe operating point: Hamming-2
    probes (37 of 256 buckets per table ≈ 14.5% scan) across the same 8
    tables. Measured recall@10 at sf0.1: multiprobe=1 → 0.70, **=2 →
    0.94**, =3 → 1.00 (16 tables at mp=2 also → 1.00); the probe radius is
    the pure recall/scan dial — no re-hash, no re-bucketing, so at 100 TB
    it turns per query class like IVF's n_probe. Same literal-parameter
    SQL oracle, multiprobe parameter only."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.lsh_bucketed_ann(
        ds, query_ids=[0, 1, 2, 3, 4], k=10, multiprobe=2, n_tables=8
    )


def ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k: deterministic k-means coarse quantizer, probe
    the nearest cells, score inside groupby(cell); value-checked via the
    unrolled-Lloyd CTE oracle (_ivf_sql)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.ivf_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10, n_centroids=16, n_probe=4)


def ann_ivf_mp(sf_dir: str) -> pd.DataFrame:
    """Multi-probe IVF at the PRODUCTION-GRADE operating point: n_probe=8 of
    16 cells. The n_probe sweep on this corpus (measured via ann_recall's
    protocol at sf0.1): n_probe=4 → 0.96, n_probe=8 → 0.98 recall@10
    (16-cell quantizer; 32/64-cell variants trade recall for scan fraction:
    32c/16p → 0.92, 64c/16p → 0.88). n_probe is the pure recall/scan dial —
    probing more cells rescans more of the corpus but never retrains the
    quantizer, so the dial is free to turn per query class at 100 TB. Same
    unrolled-Lloyd SQL oracle, n_probe parameter only."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.ivf_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10, n_centroids=16, n_probe=8)


def text_tokens(sf_dir: str) -> pd.DataFrame:
    """Token counting via the SHIPPED TokenCounter operator (the oracle must
    validate the operator users run, not an inline re-derivation)."""
    from ..functions.text import TokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(TokenCounter(), batch_format="pyarrow")
    return _sorted_pdf(out.select_columns(["doc_id", "n_chars", "n_tokens"]), "doc_id")


def text_quality(sf_dir: str) -> pd.DataFrame:
    """Quality scoring via the SHIPPED QualityScorer operator — the SQL
    oracle mirrors its regex-word definitions exactly."""
    from ..functions.text import QualityScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(QualityScorer(), batch_format="pandas", concurrency=2)
    pdf = out.to_pandas()[["doc_id", "n_words", "stopword_ratio", "mean_word_len"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def text_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition filters (duplicate-line / top-2-gram /
    duplicate-5-gram character fractions) via the shipped RepetitionScorer;
    the SQL oracle recomputes every metric from the same tokenization."""
    from ..functions.text import RepetitionScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(RepetitionScorer, batch_format="pandas", concurrency=2)
    pdf = out.to_pandas()[
        ["doc_id", "n_lines", "n_words_rep", "dup_line_frac",
         "dup_line_char_frac", "top_2gram_char_frac", "dup_5gram_char_frac"]
    ]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def text_langid(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic (stopword-profile argmax; full SQL oracle
    generated from the same profiles — see _langid_sql)."""
    from ..functions.text import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(LangIdStage(), batch_format="pandas", concurrency=2)
    return out.to_pandas()[["doc_id", "pred_lang"]].sort_values("doc_id").reset_index(drop=True)


def text_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Document fingerprinting via the SHIPPED Fingerprinter operator
    (md5 of lower+strip normalized text; the SQL trim() is equivalent for
    space-delimited corpora)."""
    from ..functions.text import Fingerprinter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(Fingerprinter(), batch_format="pandas", concurrency=2)
    pdf = out.to_pandas()[["doc_id", "fingerprint_md5"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def text_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction via the SHIPPED PiiScrubber operator.

    The synthetic corpus contains no PII, so the query first injects
    deterministic doc_id-derived emails / IPv4s / phone numbers (the SQL
    oracle performs the IDENTICAL string concatenation) — what gets
    value-checked is the detection counts and the byte-exact redacted text
    (md5), i.e. the scrubber logic itself."""
    import hashlib as _hl

    from ..functions.text import PiiScrubber

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        s = d.astype(str)
        email = " contact user" + s + "@example.com"
        ip = " from 10." + (d % 256).astype(str) + ".0." + (d % 100).astype(str)
        phone = (
            " call +1-" + (100 + d % 900).astype(str)
            + "-" + (100 + (d * 7) % 900).astype(str)
            + "-" + (1000 + d % 9000).astype(str)
        )
        batch["text"] = (
            batch["text"].fillna("") + email
            + ip.where(d % 2 == 0, "") + phone.where(d % 3 == 0, "")
        )
        return batch

    out = ds.map_batches(inject, batch_format="pandas").map_batches(
        PiiScrubber(), batch_format="pandas", concurrency=2
    )
    pdf = out.to_pandas()
    pdf["scrubbed_md5"] = pdf["scrubbed"].map(lambda t: _hl.md5(t.encode()).hexdigest())
    pdf = pdf[["doc_id", "n_emails", "n_ipv4", "n_phones", "scrubbed_md5"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def text_c4_filter(sf_dir: str) -> pd.DataFrame:
    """C4-style line filtering via the SHIPPED C4LineFilter operator.

    Synthetic docs are single unterminated lines, so the query appends
    deterministic doc_id-keyed lines exercising every rule — a kept line
    (terminal punct + >=5 words), a too-short line (doc_id%2), an
    unterminated long line (doc_id%3) and a 'lorem ipsum' doc-drop marker
    (doc_id%7); the SQL oracle concatenates identically and re-derives
    kept/total counts, the doc-drop flag and the cleaned-text md5."""
    import hashlib as _hl

    from ..functions.text import C4LineFilter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        t = (
            batch["text"].fillna("")
            + "\nDocument " + d.astype(str) + " is verified and ends properly."
        )
        t = t + pd.Series("\ntoo short.", index=t.index).where(d % 2 == 0, "")
        t = t + pd.Series(
            "\nthis line is long enough but lacks terminal punctuation", index=t.index
        ).where(d % 3 == 0, "")
        t = t + pd.Series(
            "\nlorem ipsum dolor sit amet makes this document drop.", index=t.index
        ).where(d % 7 == 0, "")
        batch["text"] = t
        return batch

    out = ds.map_batches(inject, batch_format="pandas").map_batches(
        C4LineFilter(), batch_format="pandas", concurrency=2
    )
    pdf = out.to_pandas()
    pdf["cleaned_md5"] = pdf["cleaned"].map(lambda t: _hl.md5(t.encode()).hexdigest())
    pdf["c4_doc_drop"] = pdf["c4_doc_drop"].astype("int64")
    pdf = pdf[["doc_id", "n_lines_total", "n_lines_kept", "c4_doc_drop", "cleaned_md5"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def approx_distinct_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source HLL registers (grouped mergeable sketch): distinct-text
    counts per domain in ONE scan — group keys live with the registers, so
    the merge is still one register-sized groupby and each group's sketch
    merges independently across shards/days."""
    from ..functions.sketch import hll_registers_grouped

    ds = _read(sf_dir, "documents", ["text", "source"])
    pdf = hll_registers_grouped(ds, "text", "source", p=8).to_pandas()
    return pdf.sort_values(["source", "bucket"]).reset_index(drop=True)


def corpus_cap_source(sf_dir: str) -> pd.DataFrame:
    """Per-source quota (domain capping, `functions/corpus.py:cap_per_group`):
    keep the 10 smallest md5("<id>:23")-order docs per source — a uniform
    reproducible draw per domain; per-batch head-cap fold, one group groupby."""
    from ..functions.corpus import cap_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    out = cap_per_group(ds, cap=10, group_col="source").to_pandas()
    return out[["doc_id", "source"]].sort_values("doc_id").reset_index(drop=True)


def corpus_chunk(sf_dir: str) -> pd.DataFrame:
    """Fixed-window chunking with overlap (`corpus.py:chunk_documents`):
    chunk k covers codepoints [k*150, k*150+200); ceil(len/150) chunks per
    doc. Stateless flat map, one vectorized str.slice per chunk index."""
    from ..functions.corpus import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = chunk_documents(ds, chunk_chars=200, stride=150).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def corpus_bloom_dedup(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter membership against 'yesterday's corpus' (the even
    doc_ids): build the m=2^15-bit filter from the even docs' texts
    (`sketch.py:bloom_build`, OR-mergeable word partials), broadcast it
    once, probe EVERY doc (`bloom_probe`). No false negatives — every even
    doc flags true; odd docs flag only on hash collision. The SQL oracle
    re-derives the identical bit positions, so even the false positives
    value-match."""
    from ..functions.sketch import bloom_build, bloom_probe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    build = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow",
    )
    words = bloom_build(build, "text", m_bits=1 << 15, k_hashes=4)
    out = bloom_probe(ds, words, "text", m_bits=1 << 15, k_hashes=4).to_pandas()
    return out[["doc_id", "maybe_member"]].sort_values("doc_id").reset_index(drop=True)


def text_countmin(sf_dir: str) -> pd.DataFrame:
    """Distributed count-min sketch over document tokens: per-batch d×w
    cell fold (≤ d·w rows leave any batch) + one cell-sized groupby sum —
    the sum-mergeable frequency sketch beside HLL's max-mergeable
    cardinality sketch. Full register-level value oracle; the min-row
    point estimator is tested vs exact counts in pytest."""
    from ..functions.sketch import count_min_sketch

    ds = _read(sf_dir, "documents", ["text"])
    pdf = count_min_sketch(ds, "text").to_pandas()
    return pdf.sort_values(["row", "col"]).reset_index(drop=True)


def text_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """CCNet-style bigram-LM quality scores via the SHIPPED
    bigram_lm_scores operator (sample-trained add-alpha bigram model,
    broadcast counts, vectorized nll). The SQL oracle re-trains the same
    model from the same deterministic sample and re-scores every doc."""
    from ..functions.text import bigram_lm_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = bigram_lm_scores(ds, sample_mod=5, alpha=0.1)
    pdf = out.to_pandas()[["doc_id", "n_bigrams", "avg_nll"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def approx_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """Distributed HyperLogLog over documents.text: per-batch register fold
    (<= 2^p rows leave each batch) + ONE register-sized groupby merge — the
    mergeable-sketch shape that counts distincts at 100 TB without a
    corpus-wide shuffle. Returns the full (bucket, max_rank) register table,
    value-checked byte-for-byte against the md5-hex SQL re-derivation; the
    estimator over these registers is tested vs exact distinct in pytest."""
    from ..functions.sketch import hll_registers

    ds = _read(sf_dir, "documents", ["text"])
    pdf = hll_registers(ds, "text", p=8).to_pandas()
    return pdf.sort_values("bucket").reset_index(drop=True)


def corpus_clean(sf_dir: str) -> pd.DataFrame:
    """Composed training-data cleaning pipeline: quality filter (length +
    stopword-ratio gates) → exact dedup (first doc per content wins) →
    surviving doc ids. The canonical pre-training corpus flow, streaming
    end-to-end: filter inside map_batches, one groupby for the dedup."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def quality_gate(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.split(" ")
        n_words = words.str.len()
        # vectorized stopword ratio: one explode + C-loop isin + grouped mean
        ex = words.explode()
        ex = ex[ex.notna()]
        stop_ratio = (
            ex.isin(STOPWORDS)
            .groupby(level=0)
            .mean()
            .reindex(batch.index, fill_value=0.0)
        )
        keep = (n_words >= 20) & (stop_ratio >= 0.02)
        return batch[keep]

    gated = ds.map_batches(quality_gate, batch_format="pandas")
    out = fdedup.exact_dedup_keep_first(gated)
    pdf = out.to_pandas()[["keep_id"]].rename(columns={"keep_id": "doc_id"})
    return pdf.sort_values("doc_id").reset_index(drop=True)


def corpus_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split by hashed doc id (`functions/
    corpus.py:split_assign`): membership is a pure function of the id, so
    re-runs and corpus growth never migrate a document across splits."""
    from ..functions.corpus import split_assign

    ds = _read(sf_dir, "documents", ["doc_id"])
    pdf = split_assign(ds, id_col="doc_id").to_pandas()
    return pdf[["doc_id", "bucket", "split"]].sort_values("doc_id").reset_index(drop=True)


def corpus_pack(sf_dir: str) -> pd.DataFrame:
    """GPT-style sequence packing (`functions/corpus.py:pack_sequences`):
    documents concatenated in id order, chunked every 2048 tokens; each doc
    lands in the pack where it starts."""
    from ..functions.corpus import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pdf = pack_sequences(ds, budget=2048, range_size=64).to_pandas()
    return (
        pdf[["doc_id", "n_tokens", "pack_id", "pack_offset"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup PAIRS → duplicate CLUSTERS: connected components over the
    MinHash+LSH pair graph (`functions/cluster.py`), every doc labeled with
    its component's min id; `is_canonical` marks the one survivor per
    cluster. The full SQL value oracle walks the same pair graph with a
    recursive CTE."""
    from ..functions.cluster import assign_clusters

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = fdedup.ngram_jaccard_pairs(ds, threshold=0.5)
    docs = _read(sf_dir, "documents", ["doc_id"])
    out = assign_clusters(docs, rd.from_pandas(pairs[["a_id", "b_id"]])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def corpus_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified hash sample (`functions/corpus.py:
    hash_sample`): per-language keep rates over one md5 id-hash — membership
    is a pure function of (id, seed), reproducible and growth-stable."""
    from ..functions.corpus import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = hash_sample(
        ds, rate=0.2, stratum_col="lang", stratum_rates=CORPUS_SAMPLE_RATES
    ).to_pandas()
    return out[["doc_id", "lang"]].sort_values("doc_id").reset_index(drop=True)


# overlapping half-open [lo, hi) value bands — overlap makes this a true
# interval join (an event can match several bands), not a binning
_RANGE_BANDS: list[tuple[int, float, float]] = [
    (0, 0.0, 50.0), (1, 25.0, 100.0), (2, 50.0, 200.0), (3, 100.0, 300.0),
    (4, 150.0, 350.0), (5, 0.0, 500.0), (6, 300.0, 480.0), (7, 400.0, 1000.0),
]


def events_range_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast RANGE JOIN (interval-predicate join): each event joins
    every band whose half-open [lo, hi) interval contains its value, with
    the OVERLAPPING band dimension broadcast to every task.

    Scale shape: the n×B membership matrix is two vectorized broadcast
    comparisons per batch, and per-band (count, sum) partials fold
    IN-BATCH — only B rows leave any batch, one B-row groupby finishes. A
    broadcast range join assumes a small band side by definition; with a
    large interval side you bucket both inputs by range and co-partition
    (the events_asof_join pattern)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ids = np.array([b[0] for b in _RANGE_BANDS], dtype=np.int64)
    los = np.array([b[1] for b in _RANGE_BANDS])
    his = np.array([b[2] for b in _RANGE_BANDS])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        m = (v[:, None] >= los[None, :]) & (v[:, None] < his[None, :])
        # np.where, not v*m: a NULL/NaN value row (m all-False — NaN fails
        # both comparisons, like SQL's NULL predicate) must contribute 0,
        # while NaN*False would poison every band's sum
        return pa.table(
            {
                "band_id": pa.array(ids, pa.int64()),
                "n": pa.array(m.sum(axis=0), pa.int64()),
                "s": pa.array(np.where(m, v[:, None], 0.0).sum(axis=0), pa.float64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band_id")
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    out["sum_value_cents"] = np.floor(out["s"] * 100 + 0.5).astype("int64")
    return (
        out[["band_id", "n_events", "sum_value_cents"]]
        .sort_values("band_id")
        .reset_index(drop=True)
    )


_QSKETCH_QS = [0.25, 0.5, 0.9, 0.99]


def events_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Mergeable approximate quantiles via a deterministic KMV sample:
    quantiles of the bottom-k-by-md5(id) sample estimate stream quantiles
    with the standard uniform-sampling rank error (~1/sqrt(k)).

    Composes the shipped ``bottom_k_sample`` primitive — deterministic,
    exactly-k, and mergeable across shards (union + re-trim) — so the
    quantile sketch inherits distributed mergeability WITHOUT a custom
    summary structure (t-digest/KLL centroids aren't byte-reproducible in
    SQL; this sample is). Full value oracle: DuckDB re-draws the identical
    sample and interpolates with quantile_cont (= numpy 'linear')."""
    from ..functions.corpus import bottom_k_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])
    sample = bottom_k_sample(ds, k=500, id_col="event_id").to_pandas()
    vals = sample["value"].to_numpy(dtype="float64")
    est = np.percentile(vals, [q * 100 for q in _QSKETCH_QS], method="linear")
    return pd.DataFrame(
        {"q": np.array(_QSKETCH_QS, dtype="float64"), "estimate": round_half_away(est, 6)}
    )


def corpus_sample_bottomk(sf_dir: str) -> pd.DataFrame:
    """Exact-size deterministic sample (`functions/corpus.py:
    bottom_k_sample`): k smallest md5(id) order statistics, per-batch
    bottom-k fold before a tiny global sort+limit."""
    from ..functions.corpus import bottom_k_sample

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = bottom_k_sample(ds, k=100).to_pandas()
    return out[["doc_id", "sample_hash"]].sort_values("doc_id").reset_index(drop=True)


_BOILER_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
_BOILER_B = ("uno duo tres quattro quinque sex septem octo novem decem undecim "
             "duodecim tredecim quattuordecim quindecim sedecim")


def dedup_substrings(sf_dir: str) -> pd.DataFrame:
    """Exact substring-run dedup (Lee et al. 2021 shape) via the SHIPPED
    winnowed-fingerprint operator: pairs of docs sharing a verbatim run of
    >= n+s-1 = 11 words, with shared-fingerprint counts.

    The synthetic word-soup corpus has no verbatim runs, so the query
    appends two deterministic 16-word boilerplate sentences to doc_id%50
    and doc_id%77 cliques (the SQL oracle concatenates identically) — the
    detected pair set must be exactly those cliques' pairs."""
    from ..functions.dedup import substring_dup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        t = batch["text"].fillna("")
        t = t + pd.Series(" " + _BOILER_A, index=t.index).where(d % 50 == 0, "")
        t = t + pd.Series(" " + _BOILER_B, index=t.index).where(d % 77 == 0, "")
        batch["text"] = t
        return batch

    out = substring_dup_pairs(ds.map_batches(inject, batch_format="pandas"))
    pdf = out.to_pandas()
    return pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


_PASSAGE_BOILER = (
    "shared boilerplate preamble for the passage dedup oracle clique with "
    "exactly enough characters to fill one whole window and then some more"
)  # 139 chars >= the 120-char window, so clique docs share chunk 0 verbatim


def dedup_passages(sf_dir: str) -> pd.DataFrame:
    """Corpus-level passage dedup (C4-style unit dedup): per-doc counts of
    120-char windows whose text occurs elsewhere in the corpus. The
    word-soup corpus shares no verbatim windows, so the query PREPENDS a
    139-char boilerplate to the doc_id%50 clique (the oracle concatenates
    identically) — clique docs must report exactly their shared window."""
    from ..functions.dedup import passage_dup_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        t = batch["text"].fillna("")
        pre = pd.Series(_PASSAGE_BOILER + " ", index=t.index).where(d % 50 == 0, "")
        batch["text"] = pre + t
        return batch

    out = passage_dup_stats(ds.map_batches(inject, batch_format="pandas"))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def dedup_normalized(sf_dir: str) -> pd.DataFrame:
    """Normalized exact dedup (RefinedWeb-style): lowercase + collapse
    non-alphanumeric runs + trim, then exact dedup on the normalized form.
    The synthetic corpus has no trivial variants, so docs with
    doc_id%25 < 5 form engineered variant cliques (same normalized
    content, five different casings/punctuations — the oracle constructs
    them identically); all other docs keep their real text."""
    from ..functions.dedup import normalized_dedup_keep_first

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        g = (d // 25).astype(str)
        base = "repo " + g + " sync batch " + (d // 25 * 7 + 3).astype(str) + " merge queue state"
        v = d % 25
        batch["text"] = np.select(
            [v == 0, v == 1, v == 2, v == 3, v == 4],
            [
                base,
                base.str.upper(),
                base + "!!!",
                base.str.replace(" ", "  ", regex=False),
                "  " + base.str.upper() + "  ",
            ],
            default=batch["text"].fillna(""),
        )
        return batch

    out = normalized_dedup_keep_first(ds.map_batches(inject, batch_format="pandas"))
    return (
        out.to_pandas()[["norm_md5", "keep_id", "dup_count"]]
        .sort_values("keep_id")
        .reset_index(drop=True)
    )


def corpus_sample_weighted(sf_dir: str) -> pd.DataFrame:
    """Exact-size WEIGHTED sample (Efraimidis-Spirakis) of documents with
    inclusion probability ∝ n_chars — the token-budget-aware complement to
    the uniform bottom-k sample; deterministic, per-batch bounded fold."""
    from ..functions.corpus import weighted_sample_es

    import pyarrow.dataset as pads

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"], filter=pads.field("n_chars") > 0)
    out = weighted_sample_es(ds, k=100, weight_col="n_chars").to_pandas()
    out["es_key"] = round_half_away(out["es_key"], 6)
    return out[["doc_id", "n_chars", "es_key"]].sort_values("doc_id").reset_index(drop=True)


def text_topk_tokens(sf_dir: str) -> pd.DataFrame:
    """Corpus heavy hitters (`functions/corpus.py:top_tokens`): top-50
    tokens by frequency, per-batch partial counts before one vocab groupby."""
    from ..functions.corpus import top_tokens

    ds = _read(sf_dir, "documents", ["text"])
    pdf = top_tokens(ds, k=50).to_pandas()
    return pdf.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)


_NB_VOCAB = 128


def text_nb_train(sf_dir: str) -> pd.DataFrame:
    """Distributed Naive-Bayes training (`functions/nb.py:nb_train`): the
    vocab-restricted (source, token, n) sufficient-statistics table from one
    corpus scan — per-batch vocabulary-sized partial counts, one coarse
    token-hash bucket fold, vocabulary cut by Ray sort+limit. The oracle is
    the same counts in plain SQL (no literal tables — training itself is
    SQL-expressible; only the fixed-point weights need the ln() step that
    `text_nb_classify` exercises)."""
    from ..functions.nb import nb_train

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = nb_train(ds, vocab_size=_NB_VOCAB)
    out["n"] = out["n"].astype("int64")
    return out


def text_nb_classify(sf_dir: str) -> pd.DataFrame:
    """NB scoring (`functions/nb.py:nb_classify`): train on the corpus, then
    label every doc with its max-posterior source. Weights are fixed-point
    ints — floor(1e6·ln(p)) — so per-doc scores are exact int64 sums and the
    oracle recomputes the WHOLE model in SQL (vocab cut, Laplace counts,
    ln() weights, scoring, argmax): ln over identical IEEE doubles through
    the same platform libm is bit-identical, everything after the floor is
    integer, ties break (score desc, source asc) on both sides."""
    from ..functions.nb import nb_classify

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = nb_classify(ds, vocab_size=_NB_VOCAB).to_pandas()
    out["score"] = out["score"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _nb_toks_sql() -> str:
    return """
      SELECT doc_id, source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
      FROM documents
    """


def _nb_train_sql() -> str:
    return f"""
    WITH toks AS ({_nb_toks_sql()}),
    vocab AS (
      SELECT token FROM toks GROUP BY token
      ORDER BY COUNT(*) DESC, token LIMIT {_NB_VOCAB}
    )
    SELECT t.source, t.token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks t JOIN vocab v USING (token)
    GROUP BY t.source, t.token
    ORDER BY t.source, t.token
    """


def _nb_classify_sql() -> str:
    return f"""
    WITH toks AS ({_nb_toks_sql()}),
    vocab AS (
      SELECT token FROM toks GROUP BY token
      ORDER BY COUNT(*) DESC, token LIMIT {_NB_VOCAB}
    ),
    cnt AS (
      SELECT t.source, t.token, COUNT(*) AS n
      FROM toks t JOIN vocab v USING (token)
      GROUP BY t.source, t.token
    ),
    classes AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT source, SUM(n) AS tot FROM cnt GROUP BY source),
    w AS (
      SELECT c.source, v.token,
             CAST(FLOOR(1000000 * LN(
               (COALESCE(cn.n, 0) + 1)::DOUBLE
               / (COALESCE(t.tot, 0) + {_NB_VOCAB})::DOUBLE
             )) AS BIGINT) AS wt
      FROM classes c
      CROSS JOIN vocab v
      LEFT JOIN cnt cn ON cn.source = c.source AND cn.token = v.token
      LEFT JOIN tot t ON t.source = c.source
    ),
    pri AS (
      SELECT source, CAST(FLOOR(1000000 * LN(
               n_docs::DOUBLE / (SELECT SUM(n_docs) FROM classes)::DOUBLE
             )) AS BIGINT) AS pw
      FROM classes
    ),
    tok_w AS (
      SELECT t.doc_id, w.source, SUM(w.wt) AS s
      FROM toks t JOIN w ON w.token = t.token
      GROUP BY t.doc_id, w.source
    ),
    scores AS (
      SELECT d.doc_id, p.source, p.pw + COALESCE(tw.s, 0) AS score
      FROM (SELECT doc_id FROM documents) d
      CROSS JOIN pri p
      LEFT JOIN tok_w tw ON tw.doc_id = d.doc_id AND tw.source = p.source
    ),
    best AS (
      SELECT doc_id, source AS pred_source, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, source
             ) AS rn
      FROM scores
    )
    SELECT doc_id, pred_source, CAST(score AS BIGINT) AS score
    FROM best WHERE rn = 1
    ORDER BY doc_id
    """


def corpus_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic epoch shuffle (`functions/corpus.py:epoch_shuffle`):
    dense global rank in (md5(id:epoch), id) order via a range-partitioned
    distributed prefix sum — reproducible training order, no RNG."""
    from ..functions.corpus import epoch_shuffle

    ds = _read(sf_dir, "documents", ["doc_id"])
    pdf = epoch_shuffle(ds, epoch=5, n_buckets=64).to_pandas()
    return pdf[["doc_id", "pos"]].sort_values("doc_id").reset_index(drop=True)


def corpus_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (`functions/corpus.py:contamination_flags`):
    every 97th doc plays the held-out benchmark; training docs are flagged
    when they share any word-3-gram shingle with it. Engine joins on md5
    shingle HASHES (broadcast sorted array + np.isin); the oracle joins on
    the gram STRINGS — equivalent up to md5-64 collisions (negligible)."""
    from ..functions.corpus import contamination_flags

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_bench(b: pa.Table, keep: bool) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 97) == 0
        return b.filter(pa.array(m if keep else ~m))

    bench = docs.map_batches(lambda b: is_bench(b, True), batch_format="pyarrow")
    train = docs.map_batches(lambda b: is_bench(b, False), batch_format="pyarrow")
    out = contamination_flags(train, bench, k=3, min_hits=1).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def pq_codes(sf_dir: str) -> pd.DataFrame:
    """Product-quantization encoding (`functions/similarity.py:pq_encode`):
    4 subspaces × 16 centroids trained on a deterministic sample, whole
    corpus encoded to codes + reconstruction error; full SQL value oracle
    with the subspace k-means unrolled as CTEs."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = fsim.pq_encode(ds, m=4, ks=16, iters=4, sample_rows=256).to_pandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


MIXTURE_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIXTURE_BUDGET = 5_000


def corpus_mixture(sf_dir: str) -> pd.DataFrame:
    """Domain-reweighting rate table (`functions/corpus.py:mixture_rates`):
    per-source token counts via one distributed aggregate, closed-form
    clip(target*budget/tokens) rates; sources outside the target get 0."""
    from ..functions.corpus import mixture_rates

    ds = _read(sf_dir, "documents", ["source", "text"])
    return mixture_rates(ds, MIXTURE_TARGETS, MIXTURE_BUDGET)


def ann_pq(sf_dir: str) -> pd.DataFrame:
    """PQ asymmetric-distance top-k (`functions/similarity.py:pq_topk`):
    queries exact, corpus scanned via its PQ codes with broadcast ADC
    lookup tables; full SQL value oracle (codes chain + cdist join)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.pq_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10, m=4, ks=16, sample_rows=256)


def ann_pq_rerank(sf_dir: str) -> pd.DataFrame:
    """PQ-ADC shortlist + exact re-rank (`similarity.py:pq_topk_rerank`) —
    the production two-stage PQ search: code-only scan keeps a 100-candidate
    shortlist per query (2% of the sf0.1 corpus), exact cosine re-ranks the
    gathered candidates. Lifts PQ recall@10 from 0.18 (code-only, m=4/ks=16)
    to 0.92 at sf0.1 (driver config m=16/ks=64). Oracle: the PQ chain at
    shortlist size nested under the exact-cosine re-rank."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return fsim.pq_topk_rerank(
        ds, query_ids=[0, 1, 2, 3, 4], k=10, shortlist=100, m=16, ks=64,
        sample_rows=256,
    )


def _pq_rerank_sql(shortlist: int = 100, m: int = 16, ks: int = 64, k: int = 10) -> str:
    return f"""
        WITH short AS MATERIALIZED (
          SELECT query_id, neighbor_id
          FROM ({_pq_sql(final="topk", query_ids=[0, 1, 2, 3, 4], k=shortlist, m=m, ks=ks)})
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT s.query_id, s.neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                   v.embedding::DOUBLE[]) DESC,
                            s.neighbor_id ASC) AS BIGINT) AS rank,
                 ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                              v.embedding::DOUBLE[]), 6) AS cosine
          FROM short s
          JOIN embeddings q ON q.vec_id = s.query_id
          JOIN embeddings v ON v.vec_id = s.neighbor_id
          WHERE s.neighbor_id <> s.query_id
        ) WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def _ann_inc_config(num_partitions: int = 8):
    """CaptureConfig for the incremental vector index: one VECTORS table
    keyed by vec_id, embedding as a float64-byte binary payload (the lake's
    scalar column model; bit-exact roundtrip)."""
    from ..config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
    )

    v1 = SchemaVersion(
        version=1,
        active_from_id=0,
        payload_fields={"vec_id": "int64", "embedding": "binary"},
    )
    vectors = TableConfig(
        name="VECTORS", schema_name="CORPUS", table_id=1,
        topic="lake.corpus.vectors", key_handling="P", pk_columns=["vec_id"],
        columns=[ColumnConfig("vec_id"), ColumnConfig("embedding")],
    )
    return CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[vectors],
        schema_versions=[v1],
        num_partitions=num_partitions,
        capture_parallelism=2,
    )


def _vector_events(df: pd.DataFrame, op: str = "I", id_offset: int = 0) -> pa.Table:
    """Change events for a batch of (vec_id, embedding) rows — embeddings
    ship as float64 bytes (bit-exact)."""
    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us")).as_py()
    n = len(df)
    payloads = [
        np.asarray(v, dtype=np.float64).tobytes() for v in df["embedding"]
    ]
    return pa.table(
        {
            "id": pa.array(df["vec_id"].to_numpy().astype("int64") + 1 + id_offset, pa.int64()),
            "table_id": pa.array([1] * n, pa.int32()),
            "op": pa.array([op] * n),
            "dbuser": pa.array(["corpus"] * n),
            "txn_id": pa.nulls(n, pa.string()),
            "created_at": pa.array([ts] * n, pa.timestamp("us")),
            "retry_count": pa.array(np.zeros(n, np.int32)),
            "new_vec_id": pa.array(df["vec_id"].to_numpy().astype("int64"), pa.int64()),
            "new_embedding": pa.array(payloads, pa.binary()),
        }
    )


def _lake_vector_dataset(lake: str) -> rd.Dataset:
    """Converged VECTORS lake → (vec_id, embedding list<double>) Dataset —
    the live vector index a query-time probe scans."""
    from ..pipelines.replay import read_lake

    def decode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
            ).empty_table()
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = np.frombuffer(emb.buffers()[1], dtype=np.int32)[
            emb.offset : emb.offset + len(emb) + 1
        ]
        flat = np.frombuffer(
            emb.buffers()[2], dtype=np.float64,
            offset=int(offs[0]), count=int(offs[-1] - offs[0]) // 8,
        )
        lst = pa.ListArray.from_arrays(
            pa.array((offs - offs[0]) // 8, pa.int32()), pa.array(flat, pa.float64())
        )
        return pa.table({"vec_id": batch["vec_id"], "embedding": lst})

    return read_lake(lake).map_batches(decode, batch_format="pyarrow")


def ann_ivf_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL vector index as a CDC replay — the daily-embedding-drop
    shape the incremental dedup family already models: the corpus's vectors
    are EXACTLY-ONCE lake state (VECTORS table keyed by vec_id, embeddings
    as bit-exact float64 binary payloads), so indexing a new batch costs one
    delta-sized epoch (its upserts), never a corpus rescan, and re-embedding
    a document is an UPDATE the merge folds in place — the operation a
    batch-built index needs a full rebuild for (pytest drives that case
    against a brute-force oracle; see test_round4_fixes).

    Composition: embeddings → two replay epochs (old 80% / new 20%) →
    converged lake decoded back to a vector Dataset → the UNCHANGED
    ``ivf_topk`` probe (quantizer trained on the same deterministic
    vec_id<256 sample, which the first epoch fully contains). Because the
    converged lake state equals the batch corpus, the incremental index
    must answer EXACTLY like the batch one — the SQL oracle is ann_ivf's
    unrolled-Lloyd oracle, unchanged: that identity is the value lock."""
    import shutil

    import pyarrow.parquet as pq

    from ..pipelines.replay import replay

    docs = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    docs = docs.sort_values("vec_id").reset_index(drop=True)
    cutoff = int(docs["vec_id"].max() + 1) * 4 // 5

    base = "/tmp/movex_anninc"
    stream, lake = os.path.join(base, "stream"), os.path.join(base, "lake")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream, exist_ok=True)
    pq.write_table(_vector_events(docs[docs["vec_id"] < cutoff]),
                   os.path.join(stream, "chunk_000000.parquet"))
    pq.write_table(_vector_events(docs[docs["vec_id"] >= cutoff]),
                   os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, _ann_inc_config(), chunks_per_epoch=1)

    return fsim.ivf_topk(
        _lake_vector_dataset(lake), query_ids=[0, 1, 2, 3, 4], k=10,
        n_centroids=16, n_probe=4,
    )


def text_df_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL document frequency — the BM25/TF-IDF prerequisite — as
    CDC state + an incrementally-maintained view: term MEMBERSHIP is an
    exactly-once lake table keyed by (term, doc_id) and DF is simply the
    ``n_rows``-per-term view over it, so a new doc batch costs one
    delta-sized epoch and, crucially, DELETING a doc RETRACTS its terms'
    df — the operation a batch DF table needs a corpus rescan for (pytest
    drives the delete case). Composition only: capture → merge → ViewSpec;
    no new engine machinery.

    Output: top-50 (term, df) by df desc / term asc over the converged
    corpus (old 80% + new 20% epochs). The SQL oracle recomputes batch DF
    from the documents table with the identical tokenizer
    (``[a-z0-9_]+`` on lowercased text, distinct per doc) — incremental
    maintenance and batch recompute are value-locked to each other."""
    import re
    import shutil

    import pyarrow.parquet as pq

    from ..config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
        ViewSpec,
    )
    from ..pipelines.replay import read_view, replay

    word_re = re.compile(r"[a-z0-9_]+")
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    cutoff = int(docs["doc_id"].max() + 1) * 4 // 5

    toks = docs["text"].fillna("").str.lower().str.findall(word_re)
    terms = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].to_numpy().repeat([len(set(t)) for t in toks]),
            "term": [w for t in toks for w in sorted(set(t))],
        }
    )

    v1 = SchemaVersion(version=1, active_from_id=0,
                       payload_fields={"term": "string", "doc_id": "int64"})
    table = TableConfig(
        name="TERMS", schema_name="CORPUS", table_id=1, topic="lake.corpus.terms",
        key_handling="P", pk_columns=["term", "doc_id"],
        columns=[ColumnConfig("term"), ColumnConfig("doc_id")],
    )
    cfg = CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[table], schema_versions=[v1],
        num_partitions=8, capture_parallelism=2,
        views=[ViewSpec("df_by_term", ["term"])],
    )

    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us")).as_py()

    def events_for(sel: pd.DataFrame, id_base: int) -> pa.Table:
        n = len(sel)
        return pa.table(
            {
                "id": pa.array(np.arange(id_base, id_base + n), pa.int64()),
                "table_id": pa.array([1] * n, pa.int32()),
                "op": pa.array(["I"] * n),
                "dbuser": pa.array(["corpus"] * n),
                "txn_id": pa.nulls(n, pa.string()),
                "created_at": pa.array([ts] * n, pa.timestamp("us")),
                "retry_count": pa.array(np.zeros(n, np.int32)),
                "new_term": pa.array(sel["term"].tolist(), pa.string()),
                "new_doc_id": pa.array(sel["doc_id"].to_numpy(), pa.int64()),
            }
        )

    base = "/tmp/movex_dfinc"
    stream, lake = os.path.join(base, "stream"), os.path.join(base, "lake")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream, exist_ok=True)
    old = terms[terms["doc_id"] < cutoff]
    new = terms[terms["doc_id"] >= cutoff]
    pq.write_table(events_for(old, 1), os.path.join(stream, "chunk_000000.parquet"))
    pq.write_table(events_for(new, 1 + len(old)), os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, cfg, chunks_per_epoch=1)

    pdf = read_view(lake, "df_by_term").to_pandas()
    pdf = pdf.rename(columns={"n_rows": "df"})
    pdf["df"] = pdf["df"].astype("int64")
    return (
        pdf.sort_values(["df", "term"], ascending=[False, True])
        .head(50)
        .reset_index(drop=True)[["term", "df"]]
    )


def text_tfidf(sf_dir: str) -> pd.DataFrame:
    """Per-doc top-3 TF-IDF terms (`functions/text.py:tfidf_top_terms`):
    distributed DF pass → broadcast df map → per-batch local tf + scoring."""
    from ..functions.text import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pdf = tfidf_top_terms(ds, top_n=3).to_pandas()
    return pdf.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def text_tfidf_simjoin(sf_dir: str) -> pd.DataFrame:
    """Sparse all-pairs IDF-weighted shingle-cosine join
    (`functions/text.py:tfidf_simjoin`, threshold 0.5, df cap 20) — the
    inverted-index sparse counterpart of the dense embedding near-dup join:
    pairs are generated per SHINGLE group (bounded by max_df²/2 each),
    partial dot products fold through one packed-pair-key groupby."""
    from ..functions.text import tfidf_simjoin

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_simjoin(ds, threshold=0.5, max_df=20)


def text_gopher_rules(sf_dir: str) -> pd.DataFrame:
    """Gopher A1.1 quality-rule verdicts (`functions/text.py:GopherRulesFilter`):
    per-rule booleans + keep flag, all ratio rules evaluated in integer
    arithmetic on BOTH sides so no float boundary can diverge. Pure
    per-batch map over documents — no shuffle."""
    from ..functions.text import GopherRulesFilter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        GopherRulesFilter(min_words=30), batch_format="pandas", concurrency=2
    )
    cols = ["doc_id", "n_words", "n_lines", *GopherRulesFilter.RULES, "keep"]
    return out.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)


def _dedup_inc_config(num_partitions: int = 8):
    """CaptureConfig for content-hash-keyed corpus dedup: one DOCS table
    keyed by ``chash`` (md5 of the text), payload = the hash itself."""
    from ..config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
    )

    v1 = SchemaVersion(version=1, active_from_id=0, payload_fields={"chash": "string"})
    table = TableConfig(
        name="DOCS",
        schema_name="CORPUS",
        table_id=1,
        topic="lake.corpus.docs",
        key_handling="P",
        pk_columns=["chash"],
        columns=[ColumnConfig("chash")],
    )
    return CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[table],
        schema_versions=[v1],
        num_partitions=num_partitions,
        capture_parallelism=2,
    )


def dedup_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL corpus dedup implemented AS a CDC replay — the engine's
    exactly-once merge machinery reused verbatim: every document becomes an
    INSERT event keyed by its content hash (md5(text)), the stream replays
    in two epochs, and the converged lake holds the arg-max doc id per
    distinct content. Epoch 2 only pays for epoch-2 documents (epoch cost ∝
    delta, not corpus); a re-run resumes from the manifest and is a no-op —
    the property batch dedup lacks on a growing 100 TB corpus. At scale the
    event staging is a ``map_batches`` + ``write_parquet`` pass; here the
    sf-sized table stages directly."""
    import hashlib as _hl
    import shutil

    from ..pipelines.replay import lake_to_pandas, replay

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas().sort_values("doc_id")
    chash = docs["text"].map(lambda t: _hl.md5((t or "").encode()).hexdigest())
    n = len(docs)
    base = "/tmp/movex_dedupinc"
    stream, lake = os.path.join(base, "stream"), os.path.join(base, "lake")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream, exist_ok=True)
    import pyarrow.parquet as pq

    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us"))
    for ci, sl in enumerate((slice(0, n // 2), slice(n // 2, n))):
        part = docs.iloc[sl]
        t = pa.table(
            {
                "id": pa.array(part["doc_id"].to_numpy(), pa.int64()),
                "table_id": pa.array(np.full(len(part), 1, np.int32)),
                "op": pa.array(["I"] * len(part)),
                "dbuser": pa.array(["corpus"] * len(part)),
                "txn_id": pa.nulls(len(part), pa.string()),
                "created_at": pa.array([ts.as_py()] * len(part), pa.timestamp("us")),
                "retry_count": pa.array(np.zeros(len(part), np.int32)),
                "new_chash": pa.array(chash.iloc[sl].to_numpy(), pa.string()),
                "old_chash": pa.nulls(len(part), pa.string()),
            }
        )
        pq.write_table(t, os.path.join(stream, f"chunk_{ci:06d}.parquet"))
    replay(stream, lake, _dedup_inc_config(), chunks_per_epoch=1)
    g = lake_to_pandas(lake)
    out = pd.DataFrame(
        {"content_md5": g["chash"], "keep_id": g["_last_id"].astype("int64")}
    )
    return out.sort_values("content_md5").reset_index(drop=True)


def _minhash_inc_config(num_partitions: int = 8):
    """CaptureConfig for incremental MinHash-LSH state: TWO logical tables
    in one stream (the engine's multi-table isolation) — BANDS keyed by
    (band_id, band_hash, doc_id) holds LSH bucket membership, DOCS keyed
    by doc_id holds the text the verify step needs. Band rows carry no
    text (the 16× replication the batch LSH path also avoids)."""
    from ..config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
    )

    v1 = SchemaVersion(
        version=1,
        active_from_id=0,
        payload_fields={
            "band_id": "int64",
            "band_hash": "string",
            "doc_id": "int64",
            "text": "string",
        },
    )
    bands = TableConfig(
        name="BANDS", schema_name="CORPUS", table_id=1, topic="lake.corpus.bands",
        key_handling="P", pk_columns=["band_id", "band_hash", "doc_id"],
        columns=[ColumnConfig(c) for c in ("band_id", "band_hash", "doc_id")],
    )
    docs = TableConfig(
        name="DOCS", schema_name="CORPUS", table_id=2, topic="lake.corpus.docs",
        key_handling="P", pk_columns=["doc_id"],
        columns=[ColumnConfig("doc_id"), ColumnConfig("text")],
    )
    return CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[bands, docs],
        schema_versions=[v1],
        num_partitions=num_partitions,
        capture_parallelism=2,
    )


def dedup_minhash_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL MinHash-LSH near-dup as a CDC replay — the daily-corpus
    shape: LSH bucket membership is EXACTLY-ONCE lake state, so adding a
    batch of new docs costs one delta-sized epoch (their band rows), not a
    corpus rescan, and candidate pairs are confined to buckets the new
    docs touched. Composition: minhash bands (the batch MinHasher,
    unchanged) → one stream with two logical tables (BANDS membership /
    DOCS text) → two replay epochs (old corpus, new batch) → bucket
    groupby over the converged BANDS lake emitting pairs with >= 1 new
    member → exact n-gram Jaccard verify.

    Output = the BATCH LSH pipeline's pairs restricted to pairs involving
    a new doc (doc_id >= cutoff = 80% of the id range) — the SQL oracle
    replays the batch pipeline with exactly that filter, so incremental
    and batch semantics are value-locked to each other. The pair set is
    delta-bounded; the verify here runs on the driver (at corpus scale it
    is the same per-bucket distributed verify the batch path ships)."""
    import shutil

    from ..functions.dedup import MinHasher, jaccard
    from ..pipelines.replay import read_lake, replay

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas().sort_values("doc_id")
    docs = docs.reset_index(drop=True)
    cutoff = int(docs["doc_id"].max() + 1) * 4 // 5

    mh = MinHasher()
    sigs = mh(docs[["doc_id", "text"]].copy())
    band_cols = [f"band_{i}" for i in range(mh.bands)]
    long = pd.DataFrame(
        {
            "doc_id": np.repeat(sigs["doc_id"].to_numpy(), mh.bands),
            "band_id": np.tile(np.arange(mh.bands, dtype=np.int64), len(sigs)),
            "band_hash": np.stack([sigs[c].to_numpy() for c in band_cols], axis=1)
            .astype("uint64")
            .ravel()
            .astype(str),
        }
    )

    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us")).as_py()

    def events_for(sel_docs: pd.DataFrame, sel_bands: pd.DataFrame) -> pa.Table:
        nb, ndc = len(sel_bands), len(sel_docs)
        return pa.table(
            {
                # ONE monotone id sequence across both tables and epochs
                # (doc_id-ordered): per-partition watermarks advance past
                # everything epoch 1 shipped, so epoch-2 ids MUST be larger
                # — out-of-order ids would be stale-dropped (by design)
                "id": pa.array(
                    np.concatenate(
                        [
                            sel_bands["doc_id"].to_numpy() * (mh.bands + 4)
                            + sel_bands["band_id"].to_numpy() + 1,
                            sel_docs["doc_id"].to_numpy() * (mh.bands + 4) + mh.bands + 1,
                        ]
                    ),
                    pa.int64(),
                ),
                "table_id": pa.array([1] * nb + [2] * ndc, pa.int32()),
                "op": pa.array(["I"] * (nb + ndc)),
                "dbuser": pa.array(["corpus"] * (nb + ndc)),
                "txn_id": pa.nulls(nb + ndc, pa.string()),
                "created_at": pa.array([ts] * (nb + ndc), pa.timestamp("us")),
                "retry_count": pa.array(np.zeros(nb + ndc, np.int32)),
                "new_band_id": pa.array(
                    np.concatenate([sel_bands["band_id"].to_numpy(), np.zeros(ndc)]).astype("int64")
                ),
                "new_band_hash": pa.array(
                    sel_bands["band_hash"].tolist() + [None] * ndc, pa.string()
                ),
                "new_doc_id": pa.array(
                    np.concatenate([sel_bands["doc_id"].to_numpy(), sel_docs["doc_id"].to_numpy()]).astype("int64")
                ),
                "new_text": pa.array([None] * nb + sel_docs["text"].tolist(), pa.string()),
            }
        )

    import pyarrow.parquet as pq

    base = "/tmp/movex_mhinc"
    stream, lake = os.path.join(base, "stream"), os.path.join(base, "lake")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream, exist_ok=True)
    old_m, new_m = docs["doc_id"] < cutoff, docs["doc_id"] >= cutoff
    oldb_m, newb_m = long["doc_id"] < cutoff, long["doc_id"] >= cutoff
    pq.write_table(events_for(docs[old_m], long[oldb_m]), os.path.join(stream, "chunk_000000.parquet"))
    pq.write_table(events_for(docs[new_m], long[newb_m]), os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, _minhash_inc_config(), chunks_per_epoch=1)

    # candidate pairs from buckets a new doc touched — distributed groupby
    # over the converged BANDS lake
    bands_ds = read_lake(lake).filter(expr="_table_id == 1")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["doc_id"].to_numpy().astype("int64"))
        if len(d) < 2 or d[-1] < cutoff:  # no new member -> nothing new to pair
            return pd.DataFrame(
                {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64")}
            )
        ii, jj = np.triu_indices(len(d), k=1)
        a, b = d[ii], d[jj]
        keep = b >= cutoff  # pair must involve a new doc (b = max of pair)
        return pd.DataFrame({"a_id": a[keep], "b_id": b[keep]})

    pairs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return pd.DataFrame(
            {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64"),
             "jac": pd.Series([], dtype="float64")}
        )
    # verify with texts for the CANDIDATE ids only: the filter runs inside
    # the distributed lake read, so the driver materializes |candidates|
    # texts, not the corpus
    need = np.unique(np.concatenate([pairs["a_id"].to_numpy(), pairs["b_id"].to_numpy()]))
    need_set = pa.array(need.astype("int64"))
    doc_rows = (
        read_lake(lake)
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["_table_id"], 2),
                    pc.is_in(t["doc_id"].combine_chunks().cast(pa.int64()), value_set=need_set),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    texts = dict(zip(doc_rows["doc_id"].astype("int64"), doc_rows["text"]))
    # filter on the UNROUNDED jaccard (exactly like the batch verify and
    # the SQL oracle), round only for display
    jac = np.array([jaccard(texts[a], texts[b]) for a, b in zip(pairs["a_id"], pairs["b_id"])])
    out = pairs.assign(jac=_rha(jac))[jac >= 0.5]
    out["a_id"] = out["a_id"].astype("int64")
    out["b_id"] = out["b_id"].astype("int64")
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def corpus_prep(sf_dir: str) -> pd.DataFrame:
    """The END-TO-END training-data preparation flagship, composed from the
    engine's corpus operators, streaming between stages:

      quality gate (map_batches filter)
      → benchmark decontamination (broadcast shingle set, actor pool)
      → MinHash+LSH near-dup clustering (connected components, canonical
        doc per cluster survives)
      → deterministic split assignment (pure hash of id — appended with no
        join)
      → GPT-style sequence packing (distributed prefix sum)

    One SQL value oracle replays the whole chain (gate predicate, gram-set
    intersection, the literal-perm minhash pipeline over the cleaned set, a
    recursive-CTE component walk, the split CASE and a window prefix sum)."""
    out = corpus_prep_pipeline(sf_dir).to_pandas()
    return (
        out[["doc_id", "split", "n_tokens", "pack_id", "pack_offset"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def corpus_prep_pipeline(sf_dir: str) -> rd.Dataset:
    """The corpus_prep chain as a streaming Dataset (consumed by the query
    for the oracle check and by the `corpus-prep` CLI verb, which writes
    split-partitioned parquet for resumable output)."""
    from ..functions.cluster import assign_clusters, semi_join_ids
    from ..functions.corpus import contamination_flags, pack_sequences, split_assign

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        train = batch[(batch["doc_id"] % 97) != 0]
        words = train["text"].fillna("").str.split(" ")
        n_words = words.str.len()
        ex = words.explode()
        ex = ex[ex.notna()]
        stop_ratio = (
            ex.isin(STOPWORDS)
            .groupby(level=0)
            .mean()
            .reindex(train.index, fill_value=0.0)
        )
        return train[(n_words >= 20) & (stop_ratio >= 0.02)]

    bench = docs.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0)),
        batch_format="pyarrow",
    )
    clean = contamination_flags(
        docs.map_batches(gate, batch_format="pandas"), bench, k=3, mode="filter"
    ).materialize()  # consumed by the pair stage, the label stage and the semi-join
    pairs = fdedup.ngram_jaccard_pairs(clean, threshold=0.5)
    labeled = assign_clusters(
        clean.select_columns(["doc_id"]), rd.from_pandas(pairs[["a_id", "b_id"]])
    )
    canon = labeled.map_batches(
        lambda b: b.filter(b["is_canonical"]).select(["doc_id"]), batch_format="pyarrow"
    )
    surv = semi_join_ids(clean, canon)
    packed = pack_sequences(surv, budget=2048, range_size=64)
    return split_assign(packed)  # split: pure function of doc_id


def dedup_embedding_lsh(sf_dir: str) -> pd.DataFrame:
    """Scale path of embedding near-dup: multi-table hyperplane-LSH buckets
    partition the corpus (4 tables of 4 bits, seed 13+t, composite-tagged —
    same Indyk-Motwani construction as ann_lsh), pairs compared only within
    a bucket of SOME table and deduped; value-checked via the literal
    per-table hyperplane-matrix SQL oracle (_embedding_lsh_sql). More
    tables = higher pair recall at n_tables x the map-side replication."""
    import numpy as _np

    from ..functions.similarity import HyperplaneHasher, _normalize, _to_matrix

    N_BITS, SEED, N_TABLES = 4, 13, 4
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])  # one row probes the vector width
    hashers = [HyperplaneHasher(dim, n_bits=N_BITS, seed=SEED + t) for t in range(N_TABLES)]

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch["embedding"]))
        parts = []
        for t, hasher in enumerate(hashers):
            parts.append(pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": pa.array(hasher.bucket(mat).astype(_np.int64) | (t << N_BITS)),
                    "embedding": batch["embedding"],
                }
            ))
        return pa.concat_tables(parts)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")})
        ids = g["vec_id"].to_numpy()
        mat = _np.stack([_np.asarray(v, dtype=_np.float64) for v in g["embedding"]])
        mat = mat / _np.clip(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = mat @ mat.T
        ii, jj = _np.where(sims >= 0.45)
        out = sorted({(int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))) for i, j in zip(ii, jj) if ids[i] != ids[j]})
        return pd.DataFrame(out, columns=["a_id", "b_id"]) if out else pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
        )

    out = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    pdf = out.to_pandas()
    if len(pdf) == 0 or "a_id" not in pdf.columns:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")})
    pdf = pdf.drop_duplicates(subset=["a_id", "b_id"])
    return pdf.sort_values(["a_id", "b_id"]).reset_index(drop=True)


_MEDIA_STAGE = "/tmp/movex_oracle/media_200_42.parquet"


def _stage_media() -> str:
    """Write the deterministic media table where BOTH the Ray query and the
    DuckDB oracle can read it (the flagship-oracle staging pattern: either
    side may run first). Atomic tmp+replace; content is seed-deterministic
    so a pre-existing file is always valid."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_media_table

    if not os.path.exists(_MEDIA_STAGE):
        os.makedirs(os.path.dirname(_MEDIA_STAGE), exist_ok=True)
        tmp = _MEDIA_STAGE + ".tmp"
        pq.write_table(synth_media_table(200, seed=42), tmp)
        os.replace(tmp, _MEDIA_STAGE)
    return _MEDIA_STAGE


_REAL_MEDIA_STAGE = "/tmp/movex_oracle/real_media_120_42.parquet"
_VIDEO_STAGE = "/tmp/movex_oracle/videos_60x12_42.parquet"
_SCENE_VIDEO_STAGE = "/tmp/movex_oracle/scene_videos_40x3x4_42.parquet"
_PHASH_STAGE = "/tmp/movex_oracle/phash_media_64_42.parquet"
_TONE_AUDIO_STAGE = "/tmp/movex_oracle/tone_audio_90_42.parquet"


def _stage_real_media() -> str:
    """Stage the deterministic REAL media table (BMP/PPM/WAV payloads) where
    both the Ray query and the DuckDB oracle read it (same pattern as
    ``_stage_media``)."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_real_media_table

    if not os.path.exists(_REAL_MEDIA_STAGE):
        os.makedirs(os.path.dirname(_REAL_MEDIA_STAGE), exist_ok=True)
        tmp = f"{_REAL_MEDIA_STAGE}.tmp.{os.getpid()}"
        pq.write_table(synth_real_media_table(120, seed=42), tmp)
        os.replace(tmp, _REAL_MEDIA_STAGE)
    return _REAL_MEDIA_STAGE


def _stage_videos() -> str:
    """Stage the deterministic concatenated-PPM video table (see
    ``_stage_real_media``)."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_video_table

    if not os.path.exists(_VIDEO_STAGE):
        os.makedirs(os.path.dirname(_VIDEO_STAGE), exist_ok=True)
        tmp = f"{_VIDEO_STAGE}.tmp.{os.getpid()}"
        pq.write_table(synth_video_table(60, n_frames=12, seed=42), tmp)
        os.replace(tmp, _VIDEO_STAGE)
    return _VIDEO_STAGE


def _stage_scene_videos() -> str:
    """Stage the deterministic scene-structured video table (see
    ``_stage_real_media``)."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_scene_video_table

    if not os.path.exists(_SCENE_VIDEO_STAGE):
        os.makedirs(os.path.dirname(_SCENE_VIDEO_STAGE), exist_ok=True)
        tmp = f"{_SCENE_VIDEO_STAGE}.tmp.{os.getpid()}"
        pq.write_table(synth_scene_video_table(40, n_scenes=3, frames_per_scene=4, seed=42), tmp)
        os.replace(tmp, _SCENE_VIDEO_STAGE)
    return _SCENE_VIDEO_STAGE


def _stage_phash_media() -> str:
    """Stage the deterministic perceptual-hash image table (base images +
    cross-container near-dups + moderate edits; see
    ``multimodal.synth_phash_media_table``) where both the Ray query and the
    DuckDB oracle read it (same pattern as ``_stage_real_media``)."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_phash_media_table

    if not os.path.exists(_PHASH_STAGE):
        os.makedirs(os.path.dirname(_PHASH_STAGE), exist_ok=True)
        tmp = f"{_PHASH_STAGE}.tmp.{os.getpid()}"
        pq.write_table(synth_phash_media_table(64, seed=42), tmp)
        os.replace(tmp, _PHASH_STAGE)
    return _PHASH_STAGE


def _stage_tone_audio() -> str:
    """Stage the deterministic tone-audio table (WAV clips, half carrying an
    exact-integer fs/6 tone; see ``multimodal.synth_tone_audio_table``) where
    both the Ray query and the DuckDB oracle read it."""
    import pyarrow.parquet as pq

    from ..functions.multimodal import synth_tone_audio_table

    if not os.path.exists(_TONE_AUDIO_STAGE):
        os.makedirs(os.path.dirname(_TONE_AUDIO_STAGE), exist_ok=True)
        tmp = f"{_TONE_AUDIO_STAGE}.tmp.{os.getpid()}"
        pq.write_table(synth_tone_audio_table(90, seed=42), tmp)
        os.replace(tmp, _TONE_AUDIO_STAGE)
    return _TONE_AUDIO_STAGE


def corpus_quality_cut(sf_dir: str) -> pd.DataFrame:
    """Per-SOURCE quality cut (`corpus.quality_cut_per_group`): keep docs
    whose word count clears their own domain's median-low order statistic —
    per-domain percentile filtering, so one verbose domain can't crowd out
    every other. Word count = the QualityScorer regex ([a-z']+ over
    lowercased text), counted in pandas' C loop; thresholds broadcast once."""
    from ..functions.corpus import quality_cut_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "source": b["source"].to_numpy(),
                "n_words": b["text"]
                .fillna("")
                .str.lower()
                .str.count(r"[a-z']+")
                .astype("int64")
                .to_numpy(),
            }
        )

    scored = ds.map_batches(score, batch_format="pandas")
    out = quality_cut_per_group(scored).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (`similarity.group_centroids`): the grouped
    VECTOR aggregate — one bounded per-batch fold (groups x dims partial
    rows), one register-sized groupby, vectorized finish. The label column
    of the embeddings table is the group key."""
    from ..functions.similarity import group_centroids

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    pdf = group_centroids(ds, "label", "embedding").to_pandas()
    return pdf.sort_values(["label", "i"]).reset_index(drop=True)


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Distributed covariance matrix (the PCA/whitening input): every batch
    folds to one upper-triangle Gram partial via a single BLAS matmul
    (``similarity.CovariancePartialStage`` — d(d+1)/2 + d + 1 rows per batch
    no matter the batch size), one register-sized (i, j) groupby merges, and
    the driver finishes E[xy] − E[x]E[y] on kilobytes. The SQL oracle
    re-derives every entry from an unnest self-join."""
    from ..functions.similarity import covariance_matrix

    ds = _read(sf_dir, "embeddings", ["embedding"])
    out = covariance_matrix(ds)
    return out.sort_values(["i", "j"]).reset_index(drop=True)


def events_cep_match(sf_dir: str) -> pd.DataFrame:
    """CEP-style sequence detection with a TIME-RANGE window frame (the
    pattern family of SIGMOD'19 'Real-Time Multi-Pattern Detection over
    Event Streams'): purchases preceded by >= 2 clicks of the same user
    within the trailing 24 hours — a RANGE-frame predicate, not a
    row-count frame. Per-user ordered scan runs vectorized in map_groups:
    one click-cumsum plus two ``np.searchsorted`` calls resolve every
    purchase's half-open [ts-24h, ts) click count in O(n log n) — no
    per-event Python, no self-join blowup. The SQL oracle IS the self-join
    (exact same half-open bounds), so the two derivations are independent."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    WINDOW_NS = 24 * 3600 * 10**9

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        is_click = (g["event_type"] == "click").to_numpy()
        cum = np.concatenate([[0], np.cumsum(is_click)])
        lo = np.searchsorted(t, t - WINDOW_NS, side="left")
        hi = np.searchsorted(t, t, side="left")  # strictly-before-ts bound
        n_clicks = cum[hi] - cum[lo]
        is_p = (g["event_type"] == "purchase").to_numpy()
        keep = is_p & (n_clicks >= 2)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy()[keep],
             "user_id": g["user_id"].to_numpy()[keep],
             "n_clicks_24h": n_clicks[keep].astype("int64")}
        )

    out = ds.groupby("user_id").map_groups(match, batch_format="pandas")
    pdf = out.to_pandas()
    if pdf.empty:  # every group filtered out → typed empty, not column-less
        pdf = pd.DataFrame(
            {"event_id": pd.Series(dtype="int64"),
             "user_id": pd.Series(dtype="int64"),
             "n_clicks_24h": pd.Series(dtype="int64")}
        )
    return pdf.sort_values("event_id").reset_index(drop=True)


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT (long → wide reshape): one row per user with a count column per
    event type. The per-batch fold is one vectorized crosstab (pandas
    ``crosstab`` — a C-level two-key bincount) reindexed onto the DECLARED
    column set, so every batch emits an already-wide partial and the only
    exchange is a per-user sum groupby of 5 int columns. A data-driven
    column set would make the schema nondeterministic across batches —
    pivot columns must be declared, exactly like SQL's CASE pivot."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    from ray.data.aggregate import Sum

    def widen(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        ct = pd.crosstab(pdf["user_id"], pdf["event_type"]).reindex(
            columns=_PIVOT_TYPES, fill_value=0
        )
        out = {"user_id": pa.array(ct.index.to_numpy(dtype="int64"))}
        for t in _PIVOT_TYPES:
            out[f"n_{t}"] = pa.array(ct[t].to_numpy(dtype="int64"))
        return pa.table(out)

    out = (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES])
    )
    pdf = out.to_pandas()
    for t in _PIVOT_TYPES:
        pdf[f"n_{t}"] = pdf[f"n_{t}"].astype("int64")
    return pdf.sort_values("user_id").reset_index(drop=True)


def events_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT (wide → long melt), the inverse reshape of
    :func:`events_pivot`: the per-user wide count row melts back to
    (user_id, event_type, n) long rows, zero cells dropped (SQL UNPIVOT's
    EXCLUDE NULLS analog for counts). The melt is a stateless per-batch
    reshape — ``pa.concat`` of k column-slices with a repeated name column,
    no exchange beyond pivot's own — so pivot∘unpivot is a pure streaming
    round-trip (asserted against raw counts in tests)."""
    wide = events_pivot(sf_dir)  # already (user × 5 cols), driver-sized
    frames = []
    for t in _PIVOT_TYPES:
        sub = wide[["user_id", f"n_{t}"]].rename(columns={f"n_{t}": "n"})
        sub = sub[sub["n"] > 0]
        sub.insert(1, "event_type", t)
        frames.append(sub)
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


_HOLT_SCALE = 1 << 20  # fixed-point for level/trend (α=1/4, β=1/8)


def _trunc_div(a: np.ndarray | int, d: int):
    """Integer division truncating toward zero — DuckDB BIGINT ``//``
    semantics (Python/numpy ``//`` floor instead; they differ on negatives:
    -7//2 = -4 vs trunc -3). Needed because Holt's trend term goes negative
    on decaying series."""
    a = np.asarray(a)
    return np.sign(a) * (np.abs(a) // d)


def events_holt(sf_dir: str) -> pd.DataFrame:
    """Holt linear-trend double exponential smoothing over the hourly
    per-type count series (the forecasting member of the time-series family
    beside gap-fill/CUSUM/decayed-score): level tracks the smoothed rate,
    trend its drift — the standard capacity-forecast primitive. α=1/4,
    β=1/8 in 2²⁰ fixed-point with TRUNCATING integer division (matching
    DuckDB BIGINT ``//`` exactly — the trend term goes negative, where
    Python floor and SQL trunc diverge), so the whole recurrence is
    integer-exact and the oracle is a recursive CTE running the identical
    arithmetic.

    Scale shape: the corpus-sized work is the distributed hourly rollup
    (per-batch partial counts, one kilobyte-scale groupby — gap_fill's
    fold); the sequential recurrence runs on the driver over the DENSE
    per-type spine, bounded by types × hours independent of event volume
    (a year of hourly cells × 1k types ≈ 9M recurrence steps; beyond that,
    segment the recurrence with per-partition carry-in states)."""
    from ray.data.aggregate import Sum

    HR = 3_600_000_000
    S = _HOLT_SCALE
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        h = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // HR
        gb = (
            pa.table({"event_type": batch["event_type"],
                      "h": pa.array(h, pa.int64())})
            .group_by(["event_type", "h"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"event_type": gb["event_type"], "h": gb["h"],
             "n": gb["count_all"].cast(pa.int64())}
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows: list[dict] = []
    for et, g in cells.groupby("event_type"):
        g = g.set_index("h")["n"]
        h0, h1 = int(g.index.min()), int(g.index.max())
        y = g.reindex(range(h0, h1 + 1), fill_value=0).to_numpy(dtype=np.int64)
        level = int(y[0]) * S
        trend = 0
        rows.append({"event_type": et, "h": h0, "n": int(y[0]),
                     "level": level, "trend": trend})
        for i in range(1, len(y)):
            new_level = int(_trunc_div(int(y[i]) * S + 3 * (level + trend), 4))
            trend = int(_trunc_div((new_level - level) + 7 * trend, 8))
            level = new_level
            rows.append({"event_type": et, "h": h0 + i, "n": int(y[i]),
                         "level": level, "trend": trend})
    out = pd.DataFrame(rows)
    for c in ("h", "n", "level", "trend"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "h"]).reset_index(drop=True)


def _holt_sql() -> str:
    """Oracle: the identical fixed-point recurrence as a recursive CTE —
    DuckDB BIGINT ``//`` is trunc-toward-zero, matching `_trunc_div`."""
    S = _HOLT_SCALE
    return f"""
    WITH RECURSIVE agg AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM agg GROUP BY 1),
    spine AS (
      SELECT event_type, h0, unnest(generate_series(0, h1 - h0)) AS i FROM span
    ),
    series AS (
      SELECT sp.event_type, sp.i, sp.h0 + sp.i AS h, COALESCE(a.n, 0) AS n
      FROM spine sp
      LEFT JOIN agg a ON a.event_type = sp.event_type AND a.h = sp.h0 + sp.i
    ),
    rec AS (
      SELECT event_type, i, h, n,
             CAST(n * {S} AS BIGINT) AS level, CAST(0 AS BIGINT) AS trend
      FROM series WHERE i = 0
      UNION ALL
      SELECT s.event_type, s.i, s.h, s.n,
             (s.n * {S} + 3 * (r.level + r.trend)) // 4 AS level,
             (((s.n * {S} + 3 * (r.level + r.trend)) // 4) - r.level
              + 7 * r.trend) // 8 AS trend
      FROM rec r
      JOIN series s ON s.event_type = r.event_type AND s.i = r.i + 1
    )
    SELECT event_type, CAST(h AS BIGINT) AS h, n, level, trend
    FROM rec ORDER BY event_type, h
    """


def events_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Time-series gap fill: the hourly per-type count series densified over
    the full (event_type × hour) spine — empty windows materialize as ZERO
    rows, the step every monitoring/training-curve pipeline needs before a
    rolling window. The distributed part is the usual per-batch partial
    count fold (one kilobyte-sized groupby); the spine reindex runs on the
    driver because its size is bounded by types × hours — independent of
    corpus size by construction (a year of hourly cells × 1k types is
    ~9M rows; beyond that you'd spine per partition)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(batch["ts"], unit="hour")
        gb = (
            pa.table({"event_type": batch["event_type"], "hour_start": hr})
            .group_by(["event_type", "hour_start"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"event_type": gb["event_type"], "hour_start": gb["hour_start"],
             "n": gb["count_all"].cast(pa.int64())}
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_start"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    spine_hours = pd.date_range(
        cells["hour_start"].min(), cells["hour_start"].max(), freq="h"
    )
    idx = pd.MultiIndex.from_product(
        [sorted(cells["event_type"].unique()), spine_hours],
        names=["event_type", "hour_start"],
    )
    dense = (
        cells.set_index(["event_type", "hour_start"])["n"]
        .reindex(idx, fill_value=0)
        .astype("int64")
        .reset_index(name="n_events")
    )
    return dense.sort_values(["event_type", "hour_start"]).reset_index(drop=True)


def events_user_paths(sf_dir: str) -> pd.DataFrame:
    """Ordered string aggregation (SQL ``string_agg(... ORDER BY ...)``):
    each user's first-8-event journey path ('signup>view>...'), counted per
    distinct path. Users co-locate in coarse hash buckets; inside a bucket
    ONE pandas sort + groupby builds every path and folds it to (path, n)
    partials, so the final exchange is path-cardinality-sized. The per-user
    join is a C-level pandas agg, never a Ray group per user."""
    B = 64
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].combine_chunks() if isinstance(batch["user_id"], pa.ChunkedArray) else batch["user_id"]
        u = u.cast(pa.int64())
        return batch.append_column("bucket", pc.bit_wise_and(u, B - 1))

    def paths(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        head = g.groupby("user_id", sort=False).head(8)
        p = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        hist = p.groupby(p).size()
        return pa.table(
            {"path": pa.array(hist.index.to_numpy(), pa.string()),
             "n": pa.array(hist.to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(paths, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_users"))
    )
    pdf = out.to_pandas()
    pdf["n_users"] = pdf["n_users"].astype("int64")
    pdf = pdf.sort_values(["n_users", "path"], ascending=[False, True])
    return pdf.reset_index(drop=True)[["path", "n_users"]]


def embedding_kmeans(sf_dir: str) -> pd.DataFrame:
    """Full-corpus distributed Lloyd's k-means, k=4 / 3 iterations
    (`similarity.kmeans_full`) — the iterative-algorithm family member:
    each iteration streams the whole embeddings table once through a
    broadcast-centroid assignment fold; the only exchange is the
    (k x d)-sized partial groupby and the driver holds just the centroid
    matrix. Oracle: the same three Lloyd iterations unrolled as chained
    CTEs (`_kmeans_full_sql`), round-9 means and round-9 distances with
    ties toward the lower cluster on both sides."""
    from ..functions.similarity import kmeans_full

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_full(ds, k=4, iters=3)


_BM25_QUERIES = {0: ["hash", "join"], 1: ["batch", "merge", "scan"], 2: ["filter", "window"]}


def text_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 retrieval for three fixed term queries
    (`functions/text.py:bm25_topk`) — the text-side similarity search
    beside the vector ANN family: bounded stats fold, broadcast constants,
    per-batch local top-k, one query-keyed trim groupby."""
    from ..functions.text import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, _BM25_QUERIES, k=10)


def text_bm25_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL BM25 retrieval index (CDC-powered): the postings list
    and doc-length table are exactly-once LAKE STATE — POSTINGS keyed
    (term, doc_id) with payload tf, DOCLEN keyed doc_id with payload dl —
    so indexing a new doc batch costs one delta-sized epoch (a batch BM25
    needs a corpus rescan), a re-crawled doc is an UPDATE the merge folds
    in place, and DELETING a doc retracts its postings (pytest drives
    both). Scoring touches only the QUERY TERMS' postings (df-sized read,
    never the corpus) plus a register-sized doc-length aggregate.

    Completes the incremental-index family beside ann_ivf_incremental /
    dedup_minhash_incremental / text_df_incremental. Value-locked:
    identical output to text_bm25_topk's batch scan, so the oracle is the
    SAME SQL (_BM25_SQL) — incremental state == batch recompute."""
    import math
    import re
    import shutil

    import pyarrow.parquet as pqt

    from ..config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
    )
    from ..functions.scalar import round_half_away
    from ..pipelines.replay import read_lake, replay

    k1, b, k = 1.2, 0.75, 10
    word_re = re.compile(r"[a-z0-9_]+")
    queries = _BM25_QUERIES
    terms = sorted({t for ts in queries.values() for t in ts})

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    cutoff = int(docs["doc_id"].max() + 1) * 4 // 5
    toks = docs["text"].fillna("").str.lower().str.findall(word_re)
    flat = toks.explode().dropna()
    cnt = (
        pd.DataFrame({"row": flat.index, "term": flat.to_numpy()})
        .groupby(["row", "term"], sort=True)
        .size()
        .reset_index(name="tf")
    )
    cnt["doc_id"] = docs["doc_id"].to_numpy()[cnt["row"]]
    dls = pd.DataFrame({"doc_id": docs["doc_id"], "dl": toks.str.len().astype("int64")})

    v1 = SchemaVersion(
        version=1, active_from_id=0,
        payload_fields={"term": "string", "doc_id": "int64", "tf": "int64", "dl": "int64"},
    )
    postings_t = TableConfig(
        name="POSTINGS", schema_name="CORPUS", table_id=1, topic="lake.corpus.postings",
        key_handling="P", pk_columns=["term", "doc_id"],
        columns=[ColumnConfig("term"), ColumnConfig("doc_id"), ColumnConfig("tf")],
    )
    doclen_t = TableConfig(
        name="DOCLEN", schema_name="CORPUS", table_id=2, topic="lake.corpus.doclen",
        key_handling="P", pk_columns=["doc_id"],
        columns=[ColumnConfig("doc_id"), ColumnConfig("dl")],
    )
    cfg = CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[postings_t, doclen_t], schema_versions=[v1],
        num_partitions=8, capture_parallelism=2,
    )

    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us")).as_py()

    def events_for(post_sel: pd.DataFrame, dl_sel: pd.DataFrame, id_base: int) -> pa.Table:
        np_, nd = len(post_sel), len(dl_sel)
        n = np_ + nd
        return pa.table(
            {
                "id": pa.array(np.arange(id_base, id_base + n), pa.int64()),
                "table_id": pa.array([1] * np_ + [2] * nd, pa.int32()),
                "op": pa.array(["I"] * n),
                "dbuser": pa.array(["corpus"] * n),
                "txn_id": pa.nulls(n, pa.string()),
                "created_at": pa.array([ts] * n, pa.timestamp("us")),
                "retry_count": pa.array(np.zeros(n, np.int32)),
                "new_term": pa.array(
                    post_sel["term"].tolist() + [None] * nd, pa.string()
                ),
                "new_doc_id": pa.array(
                    np.concatenate([post_sel["doc_id"].to_numpy(),
                                    dl_sel["doc_id"].to_numpy()]).astype("int64"),
                    pa.int64(),
                ),
                "new_tf": pa.array(
                    list(post_sel["tf"].astype("int64")) + [None] * nd, pa.int64()
                ),
                "new_dl": pa.array(
                    [None] * np_ + list(dl_sel["dl"].astype("int64")), pa.int64()
                ),
            }
        )

    base = "/tmp/movex_bm25inc"
    stream, lake = os.path.join(base, "stream"), os.path.join(base, "lake")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream, exist_ok=True)
    old_p, new_p = cnt[cnt["doc_id"] < cutoff], cnt[cnt["doc_id"] >= cutoff]
    old_d, new_d = dls[dls["doc_id"] < cutoff], dls[dls["doc_id"] >= cutoff]
    e0 = events_for(old_p, old_d, 1)
    pqt.write_table(e0, os.path.join(stream, "chunk_000000.parquet"))
    pqt.write_table(events_for(new_p, new_d, 1 + len(e0)),
                    os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, cfg, chunks_per_epoch=1)

    lake_ds = read_lake(lake, cfg=cfg)
    # corpus constants: one register-sized aggregate over DOCLEN state
    from ray.data.aggregate import Count, Sum

    stats = (
        lake_ds.map_batches(
            lambda t: t.filter(pc.equal(t["_table_id"], 2)).select(["dl"]),
            batch_format="pyarrow",
        )
        .aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="total_tokens"))
    )
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["total_tokens"]) / max(n_docs, 1)

    # postings of the QUERY TERMS only: a df-sized read, never the corpus
    post = lake_ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["_table_id"], 1),
                    pc.is_in(t["term"], value_set=pa.array(terms)))
        ).select(["term", "doc_id", "tf"]),
        batch_format="pyarrow",
    ).to_pandas()
    df_map = post.groupby("term")["doc_id"].nunique()
    idf = {
        t: math.log(
            (n_docs - int(df_map.get(t, 0)) + 0.5) / (int(df_map.get(t, 0)) + 0.5) + 1.0
        )
        for t in terms
    }
    cand = np.sort(post["doc_id"].unique())
    cand_arr = pa.array(cand.astype("int64"))
    cand_dl = lake_ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["_table_id"], 2), pc.is_in(t["doc_id"], value_set=cand_arr))
        ).select(["doc_id", "dl"]),
        batch_format="pyarrow",
    ).to_pandas().set_index("doc_id")["dl"]

    tf_by_term = {
        t: g.set_index("doc_id")["tf"] for t, g in post.groupby("term")
    }
    dl_np = cand_dl.reindex(cand).to_numpy(dtype=np.float64)
    norm = k1 * (1.0 - b + b * dl_np / avgdl)
    frames = []
    for qid, qterms in queries.items():
        score = np.zeros(len(cand))
        for t in qterms:
            tf = (
                tf_by_term.get(t, pd.Series(dtype="int64"))
                .reindex(cand, fill_value=0)
                .to_numpy(dtype=np.float64)
            )
            score += idf[t] * tf * (k1 + 1.0) / np.where(tf > 0, tf + norm, 1.0)
        keep = score > 0
        f = pd.DataFrame(
            {"query_id": qid, "doc_id": cand[keep], "score": round_half_away(score[keep])}
        )
        f = f.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        f["rank"] = np.arange(1, len(f) + 1, dtype="int64")
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    return out[["query_id", "doc_id", "rank", "score"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def ann_recall(sf_dir: str) -> pd.DataFrame:
    """Recall@10 of the approximate indexes against the exact brute-force
    top-10 — the standard ANN quality metric, as a first-class query: for
    each query id 0-4 and each method (hyperplane-LSH, IVF, PQ-ADC), the
    fraction of the exact neighbors the approximate index recovered. All
    four rankings are distributed pipelines; the recall join runs on
    (queries × k)-row driver tables."""
    exact = knn_bruteforce(sf_dir)[["query_id", "neighbor_id"]]
    methods = {
        "lsh": ann_lsh(sf_dir)[["query_id", "neighbor_id"]],
        # tuned Hamming-2 multiprobe: 0.70 → 0.94 at sf0.1
        "lsh_mp": ann_lsh_mp(sf_dir)[["query_id", "neighbor_id"]],
        "ivf": ann_ivf(sf_dir)[["query_id", "neighbor_id"]],
        # the tuned production operating point (multi-probe IVF, n_probe=8):
        # recall@10 ≥ 0.9 on this corpus at sf0.1 (measured 0.98; 0.96 at
        # n_probe=4) — the ≥0.9 config the round-3 verdict asked for
        "ivf_mp": ann_ivf_mp(sf_dir)[["query_id", "neighbor_id"]],
        "pq": ann_pq(sf_dir)[["query_id", "neighbor_id"]],
        # two-stage PQ (ADC shortlist + exact re-rank): 0.18 → 0.92 at sf0.1
        "pq_rerank": ann_pq_rerank(sf_dir)[["query_id", "neighbor_id"]],
    }
    rows = []
    for m, approx in sorted(methods.items()):
        hits = exact.merge(approx, on=["query_id", "neighbor_id"]).groupby(
            "query_id"
        ).size()
        for q in sorted(exact["query_id"].unique()):
            n = int(hits.get(q, 0))
            rows.append({"method": m, "query_id": int(q), "n_hits": n,
                         "recall": n / 10.0})
    return pd.DataFrame(rows)


def hybrid_rrf_topk(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
    fuse the BM25 term-query top-10 (`text_bm25_topk`) with the vector
    cosine top-10 for the SAME query ids 0-2 (`knn_bruteforce`, doc_id =
    vec_id in the synthetic corpus) as rrf = Σ 1/(60 + rank); re-rank on
    the rounded fused score. Both source rankings are fully distributed
    pipelines; the fusion itself is a (queries × 2k)-row driver table by
    construction — the standard hybrid-search shape."""
    from ..functions.scalar import round_half_away

    bm = text_bm25_topk(sf_dir)[["query_id", "doc_id", "rank"]]
    kn = knn_bruteforce(sf_dir)
    kn = kn[kn["query_id"].isin(list(_BM25_QUERIES))][
        ["query_id", "neighbor_id", "rank"]
    ].rename(columns={"neighbor_id": "doc_id"})
    u = pd.concat([bm, kn], ignore_index=True)
    u["c"] = 1.0 / (60.0 + u["rank"].to_numpy(dtype="float64"))
    f = u.groupby(["query_id", "doc_id"], as_index=False)["c"].sum()
    f["rrf"] = round_half_away(f["c"])
    f = f.sort_values(["query_id", "rrf", "doc_id"], ascending=[True, False, True])
    f["rank"] = f.groupby("query_id").cumcount() + 1
    out = f[f["rank"] <= 10][["query_id", "doc_id", "rank", "rrf"]]
    return out.reset_index(drop=True)


def multimodal_inventory(sf_dir: str) -> pd.DataFrame:
    """Binary-column plumbing, VALUE-checked: the staged media payloads are
    read as Arrow binary, batch-sliced through the object store, and their
    (md5-of-hex, byte-length) inventory is compared against DuckDB's
    md5(hex(payload))/octet_length over the same staged parquet — proof the
    binary column survives the read path byte-exactly (hex is injective;
    this DuckDB build has no BLOB hash, so both sides hash the hex form).
    Decode-stage outputs stay covered by the rows-only multimodal queries +
    codec unit tests."""
    import hashlib as _hl

    from ..functions.scalar import string_offsets_data as _sod

    def inv(b: pa.Table) -> pa.Table:
        pay = b["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        offs, data = _sod(pay)
        md5s = [
            _hl.md5(bytes(data[offs[i] : offs[i + 1]]).hex().upper().encode()).hexdigest()
            for i in range(len(pay))
        ]
        return pa.table(
            {
                "media_id": b["media_id"],
                "payload_hex_md5": pa.array(md5s, pa.string()),
                "payload_bytes": pa.array(
                    (offs[1:] - offs[:-1]).astype("int64"), pa.int64()
                ),
            }
        )

    pdf = rd.read_parquet(_stage_media()).map_batches(inv, batch_format="pyarrow").to_pandas()
    return pdf.sort_values("media_id").reset_index(drop=True)


def multimodal_decode(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: binary payload column → actor-pool decode stage
    (deterministic fake decoder; rows-only check)."""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, DecodeStage, synth_media_table

    media = synth_media_table(200, seed=42)
    ds = rd.from_arrow(media)
    out = ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    )
    pdf = out.to_pandas()[["media_id", "payload_sha", "payload_bytes", "feature_norm"]]
    pdf["feature_norm"] = round_half_away(pdf["feature_norm"], 4)
    return pdf.sort_values("media_id").reset_index(drop=True)


def multimodal_decode_real(sf_dir: str) -> pd.DataFrame:
    """REAL byte→pixels/samples decoding (pure-numpy BMP/PPM/WAV codecs) in
    an actor-pool stage: features derive from actual image pixels and audio
    samples, decoded dimensions reported per row.

    VALUE-checked: the DuckDB oracle independently re-decodes the same staged
    payloads byte-by-byte in SQL (hex() + substr byte extraction, per-pixel /
    per-sample unnest) and recomputes the float32-faithful feature norms —
    see the ``multimodal_decode_real`` ORACLE_SQL entry. (``payload_sha`` is
    covered by ``multimodal_inventory``; this DuckDB build has no BLOB hash,
    so it is not part of this query's contract.)"""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, DecodeStage

    ds = rd.read_parquet(_stage_real_media())
    out = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": True},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    )
    pdf = out.to_pandas()[
        ["media_id", "kind", "decoded_width", "decoded_height",
         "decoded_samples", "feature_norm"]
    ]
    pdf["feature_norm"] = round_half_away(pdf["feature_norm"], 4)
    return pdf.sort_values("media_id").reset_index(drop=True)


def multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """REAL video frame pipeline: concatenated-PPM streams → header-walk
    frame sampling (evenly spaced, O(1) slice per frame) → real per-frame
    pixel decode → features. The sample→decode stages compose because each
    sampled frame is a standalone P6 payload.

    VALUE-checked: the DuckDB oracle walks the same staged concatenated-PPM
    streams in SQL — parses the first frame header, derives the frame stride,
    reproduces the evenly-spaced linspace sampling, and re-decodes each
    sampled frame's pixels to the same float32-faithful feature norm."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        DecodeStage,
        FrameSampleStage,
    )

    videos = rd.read_parquet(_stage_videos())
    frames = videos.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"n_frames": 4, "real": True},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    ).map_batches(
        lambda t: t.select(["media_id", "frame_idx", "payload"]).append_column(
            "kind", pa.array(["image"] * len(t))
        ),
        batch_format="pyarrow",
    )
    out = frames.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": True},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    )
    pdf = out.to_pandas()[
        ["media_id", "frame_idx", "decoded_width", "decoded_height", "feature_norm"]
    ]
    pdf["feature_norm"] = round_half_away(pdf["feature_norm"], 4)
    return pdf.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def cdc_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot-diff CDC capture: synthesize the I/U/D event stream from two
    versions of a keyed table — the trigger-free capture mode for sources
    that can't host triggers (the reference is trigger-based,
    db_trigger_generator_base.rb; snapshot-diff is the standard complement
    for initial sync / trigger-less sources).

    OLD = customers with c_custkey % 7 != 3; NEW drops % 5 == 2 and adds
    10.00 to c_acctbal where % 3 == 0 (deterministic version derivation so
    the oracle can re-derive membership by rule). The ENGINE does the real
    distributed diff: both sides tagged and union'd, ONE coarse-bucket
    groupby co-locates each key's ≤2 rows, a vectorized per-bucket pivot
    compares sides (never a per-key group call). Money compares as
    floor(×100+0.5) cents — BIGINT end to end."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        k = b["c_custkey"].to_numpy(dtype=np.int64)
        cents = np.floor(b["c_acctbal"].to_numpy(dtype=np.float64) * 100 + 0.5).astype(np.int64)
        old_m = k % 7 != 3
        new_m = k % 5 != 2
        new_cents = np.where(k % 3 == 0, cents + 1000, cents)
        out = pd.concat(
            [
                pd.DataFrame({"key": k[old_m], "side": np.int32(0), "cents": cents[old_m]}),
                pd.DataFrame({"key": k[new_m], "side": np.int32(1), "cents": new_cents[new_m]}),
            ],
            ignore_index=True,
        )
        out["bkt"] = (out["key"] % 256).astype(np.int32)
        return out

    empty = pd.DataFrame(
        {"c_custkey": pd.Series(dtype="int64"), "op": pd.Series(dtype=object),
         "acctbal_cents": pd.Series(dtype="int64")}
    )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="key", columns="side", values="cents", aggfunc="first")
        old = p[0] if 0 in p.columns else pd.Series(np.nan, index=p.index)
        new = p[1] if 1 in p.columns else pd.Series(np.nan, index=p.index)
        ins = new.notna() & old.isna()
        dele = old.notna() & new.isna()
        upd = old.notna() & new.notna() & (old != new)
        frames = []
        for mask, op, vals in ((ins, "I", new), (dele, "D", old), (upd, "U", new)):
            if mask.any():
                frames.append(
                    pd.DataFrame(
                        {"c_custkey": p.index[mask].to_numpy(dtype=np.int64),
                         "op": op,
                         "acctbal_cents": vals[mask].to_numpy(dtype=np.int64)}
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else empty

    out = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("bkt")
        .map_groups(diff, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values("c_custkey").reset_index(drop=True)


_SNAPSHOT_DIFF_SQL = """
    WITH c AS (
      SELECT c_custkey AS k,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), ev AS (
      SELECT k, 'I' AS op,
             CASE WHEN k % 3 = 0 THEN cents + 1000 ELSE cents END AS cents
      FROM c WHERE k % 7 = 3 AND k % 5 <> 2
      UNION ALL
      SELECT k, 'D', cents FROM c WHERE k % 7 <> 3 AND k % 5 = 2
      UNION ALL
      SELECT k, 'U', cents + 1000
      FROM c WHERE k % 7 <> 3 AND k % 5 <> 2 AND k % 3 = 0
    )
    SELECT CAST(k AS BIGINT) AS c_custkey, op,
           CAST(cents AS BIGINT) AS acctbal_cents
    FROM ev ORDER BY c_custkey
    """


def cdc_gap_audit(sf_dir: str) -> pd.DataFrame:
    """Sequence-gap integrity audit: find every missing id in a delivered
    event stream — the operational W2 (watermark no-gap) check run as a
    query over delivered data (the reference's no-gap guarantee audited
    from the outside). Delivered = events with event_id % 997 != 13, a
    deterministic drop rule both sides re-derive.

    Distributed shape: ids bucket by ``id // 8192``; a synthetic SPINE row
    per expected bucket (driver-built from the delivered min/max — two
    scalar aggregates) unions into the stream so even a FULLY missing
    bucket surfaces; one groupby, per-bucket vectorized ``np.setdiff1d``
    against the clipped expected range. No driver-side id loops; the only
    driver data is min/max and the (tiny) missing-id result."""
    ds = _read(sf_dir, "events", ["event_id"])

    def delivered(b: pa.Table) -> pa.Table:
        ids = _col(b, "event_id").to_numpy()
        keep = ids % 997 != 13
        ids = ids[keep]
        return pa.table(
            {"bucket": pa.array(ids // 8192), "event_id": pa.array(ids)}
        )

    dl = ds.map_batches(delivered, batch_format="pyarrow")
    # two scalar aggregates (metadata-small) fix the audit span
    gmin = dl.min("event_id")
    gmax = dl.max("event_id")
    nb = gmax // 8192 - gmin // 8192 + 1
    spine = rd.from_arrow(  # arrow block — union with pandas blocks breaks the sort
        pa.table(
            {"bucket": pa.array(np.arange(gmin // 8192, gmax // 8192 + 1, dtype=np.int64)),
             "event_id": pa.array(np.full(nb, -1, dtype=np.int64))}
        )
    )

    empty = pd.DataFrame({"missing_id": pd.Series(dtype="int64")})

    def find_missing(g: pd.DataFrame) -> pa.Table:
        bkt = int(g["bucket"].iloc[0])
        lo = max(bkt * 8192, gmin)
        hi = min(bkt * 8192 + 8191, gmax)
        present = g["event_id"].to_numpy(dtype=np.int64)
        missing = np.setdiff1d(np.arange(lo, hi + 1, dtype=np.int64),
                               present[present >= 0], assume_unique=False)
        # arrow table with explicit schema even when empty — keeps every
        # block bundle schema-typed (block-schema hygiene)
        return pa.table({"missing_id": pa.array(missing, pa.int64())})

    out = (
        dl.union(spine)
        .groupby("bucket")
        .map_groups(find_missing, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values("missing_id").reset_index(drop=True)


_GAP_AUDIT_SQL = """
    WITH delivered AS (
      SELECT event_id FROM events WHERE event_id % 997 <> 13
    ), span AS (
      SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM delivered
    ), expected AS (
      SELECT unnest(generate_series(lo, hi)) AS i FROM span
    )
    SELECT CAST(i AS BIGINT) AS missing_id
    FROM expected
    WHERE i NOT IN (SELECT event_id FROM delivered)
    ORDER BY missing_id
    """


def corpus_interleave(sf_dir: str) -> pd.DataFrame:
    """Deterministic round-robin training order across sources: docs sort by
    (rank-within-source, source) — one pass of every source before any
    source repeats, the standard mixture-interleave schedule (vs
    ``corpus_shuffle``'s hash permutation and ``corpus_mixture``'s sampled
    weights).

    Engine: per-source rank comes from the same range-partitioned prefix
    sum as ``epoch_shuffle`` (per-(source, id-range) counts → tiny driver
    base table → per-bucket sort + arange); the GLOBAL position then needs
    NO second shuffle — with the per-source totals m_s broadcast, the
    round-robin position has the closed form
    pos(r, s) = Σ_{s'} min(r, m_{s'}) + |{s' < s : m_{s'} > r}|,
    one vectorized (rows × sources) minimum per batch."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    span = 8192  # id-range bucket width (order-aligned, dense testdata ids)

    def keyed(b: pa.Table) -> pa.Table:
        ids = _col(b, "doc_id")
        return pa.table(
            {"doc_id": ids, "source": b["source"],
             "ib": pc.divide(ids, span)}
        )

    import ray
    from ray.data.aggregate import Count

    hashed = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    counts = (
        hashed.groupby(["source", "ib"]).aggregate(Count(alias_name="n")).take_all()
    )
    # tiny driver table: sources × id-buckets rows
    counts.sort(key=lambda r: (r["source"], int(r["ib"])))
    base: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for r in counts:
        s = r["source"]
        base[(s, int(r["ib"]))] = totals.get(s, 0)
        totals[s] = totals.get(s, 0) + int(r["n"])
    sources = sorted(totals)
    m = np.array([totals[s] for s in sources], dtype=np.int64)
    sidx_map = {s: i for i, s in enumerate(sources)}
    ref = ray.put((base, sidx_map, m))

    def rank_and_pos(g: pd.DataFrame) -> pd.DataFrame:
        base_map, smap, mvec = ray.get(ref)
        g = g.sort_values(["source", "doc_id"])
        src = g["source"].to_numpy()
        ib = int(g["ib"].iloc[0])
        seg_first = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        seg_len = np.diff(np.r_[seg_first, len(src)])
        rn = np.concatenate(
            [base_map[(src[f], ib)] + np.arange(n0, dtype=np.int64)
             for f, n0 in zip(seg_first, seg_len)]
        )
        sidx = np.fromiter((smap[s] for s in src), dtype=np.int64, count=len(src))
        pos = np.minimum(rn[:, None], mvec[None, :]).sum(axis=1)
        pos += ((mvec[None, :] > rn[:, None])
                & (np.arange(len(mvec))[None, :] < sidx[:, None])).sum(axis=1)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(dtype=np.int64), "pos": pos}
        )

    out = hashed.groupby("ib").map_groups(rank_and_pos, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_INTERLEAVE_SQL = """
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
      FROM documents
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY rn, source, doc_id) - 1 AS BIGINT) AS pos
    FROM r ORDER BY doc_id
    """


def events_burst_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window burst rate: for every event, how many of the SAME
    USER's events fall in the trailing 60 s (RANGE frame, inclusive both
    ends — equal timestamps all count, unlike a ROWS frame). The
    rate-limiting / burst-anomaly primitive.

    Engine: per-user buckets; within a user the whole column resolves with
    TWO ``np.searchsorted`` calls (left bound at t−60 s, right bound at t)
    — O(n log n) per user, int64-µs arithmetic, no window materialized."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        uid = b["user_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": b["event_id"].to_numpy(dtype=np.int64),
                "us": b["ts"].astype("datetime64[us]").to_numpy().view(np.int64),
                "bkt": (uid % 64).astype(np.int32),
            }
        )

    empty = pd.DataFrame(
        {"event_id": pd.Series(dtype="int64"), "n_in_window": pd.Series(dtype="int64")}
    )

    def burst(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us"])
        outs = [empty]
        for _uid, gu in g.groupby("user_id", sort=False):
            us = gu["us"].to_numpy(dtype=np.int64)
            hi = np.searchsorted(us, us, side="right")
            lo = np.searchsorted(us, us - 60_000_000, side="left")
            outs.append(
                pd.DataFrame(
                    {"event_id": gu["event_id"].to_numpy(dtype=np.int64),
                     "n_in_window": (hi - lo).astype(np.int64)}
                )
            )
        return pd.concat(outs, ignore_index=True)

    out = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("bkt")
        .map_groups(burst, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values("event_id").reset_index(drop=True)


_BURST_SQL = """
    SELECT event_id,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 60 SECOND PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_window
    FROM events
    ORDER BY event_id
    """


def events_markov_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order behavior transition matrix: per user, order events by
    (ts, event_id) and count adjacent event_type transitions corpus-wide —
    the sequence-statistics sibling of ``events_user_paths``.

    Engine: per-user coarse buckets; inside a bucket ONE lexsort + shifted
    compare builds every adjacent pair (the user boundary mask kills
    cross-user pairs), a vectorized factorize+bincount folds to (from, to)
    partials, and the register-sized transition table reduces driver-side."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        uid = b["user_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": b["event_id"].to_numpy(dtype=np.int64),
                "event_type": b["event_type"].to_numpy(),
                "us": b["ts"].astype("datetime64[us]").to_numpy().view(np.int64),
                "bkt": (uid % 64).astype(np.int32),
            }
        )

    empty = pd.DataFrame(
        {"from_type": pd.Series(dtype=object), "to_type": pd.Series(dtype=object),
         "n": pd.Series(dtype="int64")}
    )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["us"].to_numpy(), g["user_id"].to_numpy())
        )
        users = g["user_id"].to_numpy(dtype=np.int64)[order]
        types = g["event_type"].to_numpy()[order]
        if len(types) < 2:
            return empty
        same_user = users[1:] == users[:-1]
        if not same_user.any():
            return empty
        codes, uniq = pd.factorize(pd.Series(types), sort=True)
        pair_code = codes[:-1][same_user] * len(uniq) + codes[1:][same_user]
        counts = np.bincount(pair_code, minlength=len(uniq) ** 2)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {"from_type": uniq.take(nz // len(uniq)),
             "to_type": uniq.take(nz % len(uniq)),
             "n": counts[nz].astype(np.int64)}
        )

    pdf = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("bkt")
        .map_groups(transitions, batch_format="pandas")
        .to_pandas()
    )
    if len(pdf) == 0:
        return empty
    out = (
        pdf.groupby(["from_type", "to_type"], sort=True)["n"].sum().reset_index()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


_MARKOV_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY from_type, to_type
    """


def events_nearest_join(sf_dir: str) -> pd.DataFrame:
    """Nearest-event temporal join (both directions — the one-sided as-of's
    sibling): each 'error' matches the SAME USER's 'click' with minimal
    |Δts|; among equal gaps the smallest click event_id wins.

    Engine: per-user coarse buckets; within a bucket clicks collapse to
    (distinct ts, min id) arrays and every error resolves with TWO
    ``np.searchsorted`` probes (floor/ceil neighbor) — no pair
    materialization, O((errors+clicks)·log clicks) per bucket, int64-µs
    arithmetic throughout. The per-USER iteration inside a bucket is
    bounded by users/bucket with all per-user work vectorized; a very wide
    bucket would swap it for one composite-key (user≪52 | ts) searchsorted
    over the whole bucket — same contract, needs the key to pack in 64
    bits."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(["error", "click"]).to_numpy()
        b = b[m]
        uid = b["user_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": b["event_id"].to_numpy(dtype=np.int64),
                "is_err": (b["event_type"] == "error").to_numpy(),
                "us": b["ts"].astype("datetime64[us]").to_numpy().view(np.int64),
                "bkt": (uid % 64).astype(np.int32),
            }
        )

    empty = pd.DataFrame(
        {"error_event_id": pd.Series(dtype="int64"),
         "matched_event_id": pd.Series(dtype="int64"),
         "gap_us": pd.Series(dtype="int64")}
    )

    def nearest(g: pd.DataFrame) -> pd.DataFrame:
        outs = [empty]
        g = g.sort_values(["user_id", "us", "event_id"])
        for _uid, gu in g.groupby("user_id", sort=False):
            err = gu[gu["is_err"]]
            clk = gu[~gu["is_err"]]
            if err.empty or clk.empty:
                continue
            # distinct click ts, each carrying its min event_id (tie contract)
            cts = clk["us"].to_numpy(dtype=np.int64)
            cid = clk["event_id"].to_numpy(dtype=np.int64)
            uniq_ts, first_idx = np.unique(cts, return_index=True)
            min_id = np.minimum.reduceat(cid, first_idx)  # cid sorted by (ts, id)
            ets = err["us"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(uniq_ts, ets)
            lo = np.clip(pos - 1, 0, len(uniq_ts) - 1)
            hi = np.clip(pos, 0, len(uniq_ts) - 1)
            gap_lo = np.abs(ets - uniq_ts[lo])
            gap_hi = np.abs(ets - uniq_ts[hi])
            # pick the nearer neighbor; equal gaps pick the smaller id
            use_lo = (gap_lo < gap_hi) | (
                (gap_lo == gap_hi) & (min_id[lo] <= min_id[hi])
            )
            outs.append(
                pd.DataFrame(
                    {
                        "error_event_id": err["event_id"].to_numpy(dtype=np.int64),
                        "matched_event_id": np.where(use_lo, min_id[lo], min_id[hi]),
                        "gap_us": np.where(use_lo, gap_lo, gap_hi),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    out = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("bkt")
        .map_groups(nearest, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values("error_event_id").reset_index(drop=True)


_NEAREST_JOIN_SQL = """
    WITH err AS (
      SELECT user_id, event_id AS error_event_id, epoch_us(ts) AS eus
      FROM events WHERE event_type = 'error'
    ), clk AS (
      SELECT user_id, event_id AS click_event_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'
    ), cand AS (
      SELECT e.error_event_id, c.click_event_id, ABS(e.eus - c.cus) AS gap_us
      FROM err e JOIN clk c USING (user_id)
    ), pick AS (
      SELECT error_event_id, click_event_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY error_event_id
                                ORDER BY gap_us, click_event_id) AS rn
      FROM cand
    )
    SELECT error_event_id, click_event_id AS matched_event_id,
           CAST(gap_us AS BIGINT) AS gap_us
    FROM pick WHERE rn = 1
    ORDER BY error_event_id
    """


def cdc_ordering_inversions(sf_dir: str) -> pd.DataFrame:
    """Per-key delivery-order QA: quantify the W1 (per-key ordering)
    guarantee over a deliberately skewed delivery clock. delivered_at =
    ts + (event_id % 7) hours — a deterministic jitter both sides
    re-derive — and the audit counts, per user, the INVERTED pairs
    (id order vs delivered order), the exact Kendall-tau numerator the
    reference's ascending-id check (kafka_mock.rb:49-63) tests one message
    at a time.

    Engine: users co-locate in coarse hash buckets; within a bucket every
    per-user pair comes from ONE vectorized
    `scalar.segment_triu_indices` construction (no per-user Python), and
    inversion counts fold with one bincount. Timestamps compare as int64
    microseconds — no float time math."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].to_numpy(dtype=np.int64)
        us = b["ts"].astype("datetime64[us]").to_numpy().view(np.int64)
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(dtype=np.int64),
                "event_id": ids,
                "dts": us + (ids % 7) * 3_600_000_000,
                "bkt": (b["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32),
            }
        )

    empty = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"), "n_events": pd.Series(dtype="int64"),
         "n_inversions": pd.Series(dtype="int64")}
    )

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.scalar import segment_triu_indices

        order = np.lexsort((g["event_id"].to_numpy(), g["user_id"].to_numpy()))
        users = g["user_id"].to_numpy(dtype=np.int64)[order]
        dts = g["dts"].to_numpy(dtype=np.int64)[order]
        uniq, counts = np.unique(users, return_counts=True)
        gi, gj, seg = segment_triu_indices(counts)
        inv = np.bincount(seg, weights=(dts[gi] > dts[gj]), minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {"user_id": uniq, "n_events": counts.astype(np.int64), "n_inversions": inv}
        )

    out = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("bkt")
        .map_groups(audit, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values("user_id").reset_index(drop=True)


_ORDERING_INV_SQL = """
    WITH e AS (
      SELECT user_id, event_id,
             ts + (event_id % 7) * INTERVAL 1 HOUR AS dts
      FROM events
    ), base AS (
      SELECT user_id, COUNT(*) AS n_events FROM e GROUP BY user_id
    ), inv AS (
      SELECT a.user_id, COUNT(*) AS n_inversions
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_id < b.event_id AND a.dts > b.dts
      GROUP BY a.user_id
    )
    SELECT base.user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(COALESCE(inv.n_inversions, 0) AS BIGINT) AS n_inversions
    FROM base LEFT JOIN inv USING (user_id)
    ORDER BY user_id
    """


def dedup_containment(sf_dir: str) -> pd.DataFrame:
    """Containment-coefficient similarity join
    (`functions/dedup.py:containment_pairs`): directed (src, dst) rows where
    ≥ 4/5 of src's word-3-shingle set appears in dst — the partial-copy
    detector Jaccard misses (Broder's resemblance vs containment). Same
    inverted-index shape as dedup_jaccard; the threshold cross-multiplies as
    integers, so engine and oracle compare BIGINTs, never floats."""
    from ..functions.dedup import containment_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return containment_pairs(ds, threshold_num=4, threshold_den=5, k=3)


_CONTAINMENT_SQL = r"""
    WITH docs AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w)-2)]
        END)) AS g
      FROM docs WHERE len(w) > 0
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS ninter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), dir AS (
      SELECT a_id AS src_id, b_id AS dst_id, ninter, sa.sz AS n_src, sb.sz AS n_dst
      FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      WHERE 5*ninter >= 4*sa.sz
      UNION ALL
      SELECT b_id, a_id, ninter, sb.sz, sa.sz
      FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      WHERE 5*ninter >= 4*sb.sz
    )
    SELECT CAST(src_id AS BIGINT) AS src_id, CAST(dst_id AS BIGINT) AS dst_id,
           CAST(ninter AS BIGINT) AS n_inter, CAST(n_src AS BIGINT) AS n_src,
           CAST(n_dst AS BIGINT) AS n_dst
    FROM dir ORDER BY src_id, dst_id
    """


def text_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-doc n-gram novelty / memorization screen
    (`functions/dedup.py:ngram_novelty`): for each document, how many of its
    distinct word-3-shingles occur anywhere else in the corpus. Pure integer
    counts; one (doc, hash) shuffle + a doc-keyed Sum fold."""
    from ..functions.dedup import ngram_novelty

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_novelty(ds, k=3)


_NOVELTY_SQL = r"""
    WITH docs AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w)-2)]
        END)) AS g
      FROM docs WHERE len(w) > 0
    ), df AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_shingles
    FROM sh JOIN df USING (g)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """


# taxonomy/blocklist patterns for text_keyword_tags — a literal list so the
# oracle can mirror it as a VALUES table; includes multi-word phrases and a
# never-matching probe (absence must not fabricate zero rows)
_KEYWORD_TAGS = ["error", "fast merge", "hash join", "slow", "window", "zzz_absent"]


def text_keyword_tags(sf_dir: str) -> pd.DataFrame:
    """Multi-pattern keyword tagging (blocklist / taxonomy labeling): count
    non-overlapping case-insensitive occurrences of each pattern per doc,
    emit (doc_id, keyword, n) for n > 0.

    Engine: the pattern list broadcasts with the stage closure; each batch
    runs one C-loop ``Series.str.count`` per pattern — embarrassingly
    parallel, NO shuffle at all. At a real blocklist's scale (10⁴⁺ patterns)
    swap the per-pattern loop for one Aho-Corasick automaton built once per
    actor in ``__init__``; the stage shape (broadcast patterns, per-batch
    vectorized scan, no exchange) is the same. Oracle: CROSS JOIN against a
    VALUES table with the replace-length occurrence count — identical
    non-overlapping left-to-right semantics as regex ``findall``."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kws = list(_KEYWORD_TAGS)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        import re as _re

        lt = b["text"].fillna("").str.lower()
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        frames = []
        for kw in kws:
            n = lt.str.count(_re.escape(kw)).to_numpy(dtype=np.int64)
            m = n > 0
            if m.any():
                frames.append(
                    pd.DataFrame({"doc_id": ids[m], "keyword": kw, "n": n[m]})
                )
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "keyword": pd.Series(dtype=object), "n": pd.Series(dtype="int64")}
            )
        return pd.concat(frames, ignore_index=True)

    out = ds.map_batches(count, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "keyword"]).reset_index(drop=True)


def _keyword_tags_sql() -> str:
    values = ",".join(f"('{k}')" for k in _KEYWORD_TAGS)
    return f"""
    WITH kw(keyword) AS (VALUES {values}),
    t AS (SELECT doc_id, lower(COALESCE(text, '')) AS lt FROM documents)
    SELECT t.doc_id, kw.keyword,
           CAST((length(lt) - length(replace(lt, keyword, ''))) // length(keyword)
                AS BIGINT) AS n
    FROM t CROSS JOIN kw
    WHERE length(lt) - length(replace(lt, keyword, '')) > 0
    ORDER BY doc_id, keyword
    """


def text_pmi_bigrams(sf_dir: str) -> pd.DataFrame:
    """Collocation extraction (`functions/text.py:pmi_bigrams`): top-100
    adjacent-token bigrams by exact PMI lift (c_xy·N²)/(B·c_x·c_y) with
    c_xy ≥ 5 — the log's argument kept as one IEEE division of exact
    integers so the oracle is bit-identical (libm ln() is not portable
    across engines). Per-batch partial fold → one vocabulary-sized groupby
    → driver finish on the distinct-gram table."""
    from ..functions.text import pmi_bigrams

    ds = _read(sf_dir, "documents", ["text"])
    return pmi_bigrams(ds, min_count=5, k=100)


_PMI_SQL = r"""
    WITH d AS (
      SELECT regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+') AS ws
      FROM documents
    ),
    uni AS (SELECT unnest(ws) AS w FROM d),
    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    tot AS (SELECT COUNT(*) AS n FROM uni),
    bl AS (
      SELECT CASE WHEN len(ws) < 2 THEN []
                  ELSE [ws[i] || ' ' || ws[i+1]
                        FOR i IN generate_series(1, len(ws) - 1)] END AS bs
      FROM d
    ),
    bg AS (SELECT unnest(bs) AS bigram FROM bl),
    bc AS (SELECT bigram, COUNT(*) AS c_xy FROM bg GROUP BY bigram),
    btot AS (SELECT COUNT(*) AS b FROM bg),
    scored AS (
      SELECT bc.bigram, bc.c_xy,
             CAST(bc.c_xy * tot.n * tot.n AS DOUBLE)
               / CAST(btot.b * ux.c * uy.c AS DOUBLE) AS ratio
      FROM bc
      CROSS JOIN tot CROSS JOIN btot
      JOIN uc ux ON ux.w = split_part(bc.bigram, ' ', 1)
      JOIN uc uy ON uy.w = split_part(bc.bigram, ' ', 2)
      WHERE bc.c_xy >= 5
    )
    SELECT bigram, CAST(c_xy AS BIGINT) AS c_xy, ratio
    FROM scored
    ORDER BY ratio DESC, bigram
    LIMIT 100
    """


def dedup_editdistance(sf_dir: str) -> pd.DataFrame:
    """EXACT edit-distance similarity join (levenshtein ≤ 2) over document
    slugs (first 20 chars) — the typo/near-identifier dedup primitive.

    Engine: FastSS deletion-neighborhood keys (1+20+C(20,2)=211 vectorized
    hashes per string) → one groupby on the key → candidate pairs →
    vectorized pair-axis DP verify against the broadcast slug matrix
    (``functions.dedup.editdistance_join``). The DuckDB oracle is a fully
    INDEPENDENT brute force: all-pairs ``levenshtein()`` — so this checks
    the filter's completeness, not just agreement on shared candidates.

    Input domain (mirrored literally in SQL): docs with doc_id < 1200 (the
    brute-force oracle is O(n²); the capped slug table doubles as the
    join's broadcast side — the engine path scales by partitioning the
    verify matrix, see editdistance_join's docstring), ASCII slugs only
    (octet_length = length — DuckDB levenshtein is byte-based while substr
    is char-based), plus injected variants: a substitution at position
    (id*7) % len for id%4==1 (id+1000000) and a deletion at (id*3) % len
    for id%8==2 (id+2000000), so near-miss pairs exist at every scale."""
    import pyarrow.dataset as pads

    from ..functions.dedup import editdistance_join

    docs = _read(
        sf_dir, "documents", ["doc_id", "text"], filter=(pads.field("doc_id") < 1200)
    ).to_pandas()
    ids = docs["doc_id"].to_numpy(dtype=np.int64)
    slug_s = docs["text"].fillna("").str.slice(0, 20)
    ascii_ok = (
        slug_s.str.encode("utf-8").str.len().to_numpy()
        == slug_s.str.len().to_numpy()
    )
    ids = ids[ascii_ok]
    slugs = slug_s.to_numpy()[ascii_ok]
    lens = np.fromiter((len(s) for s in slugs), dtype=np.int64, count=len(slugs))

    # injected variants — bounded driver-side fixture derivation over the
    # capped broadcast table (the distributed stages live in editdistance_join)
    m1 = (ids % 4 == 1) & (lens >= 2)
    p = (ids[m1] * 7) % lens[m1]
    subs = [s[:pi] + "q" + s[pi + 1 :] for s, pi in zip(slugs[m1], p)]
    m2 = (ids % 8 == 2) & (lens >= 2)
    d = (ids[m2] * 3) % lens[m2]
    dels = [s[:di] + s[di + 1 :] for s, di in zip(slugs[m2], d)]

    pdf = pd.DataFrame(
        {
            "id": np.concatenate([ids, ids[m1] + 1_000_000, ids[m2] + 2_000_000]),
            "s": np.concatenate([slugs, np.array(subs, object), np.array(dels, object)]),
        }
    )
    return editdistance_join(pdf, k=2, width=20)


def _editdistance_sql() -> str:
    """Independent brute-force oracle for ``dedup_editdistance``: the same
    slug domain + injected variants, then ALL-pAIRS ``levenshtein`` (no
    candidate filter — completeness of the engine's FastSS filter is part
    of what this checks)."""
    slug = "substr(COALESCE(text,''), 1, 20)"
    return f"""
    WITH base AS (
      SELECT doc_id AS id, {slug} AS s
      FROM documents
      WHERE doc_id < 1200 AND strlen({slug}) = length({slug})
    ), subs AS (
      SELECT id + 1000000 AS id, substr(s, 1, p) || 'q' || substr(s, p + 2) AS s
      FROM (SELECT id, s, (id*7) % length(s) AS p FROM base
            WHERE id % 4 = 1 AND length(s) >= 2)
    ), dels AS (
      SELECT id + 2000000 AS id, substr(s, 1, d) || substr(s, d + 2) AS s
      FROM (SELECT id, s, (id*3) % length(s) AS d FROM base
            WHERE id % 8 = 2 AND length(s) >= 2)
    ), uni AS (
      SELECT * FROM base UNION ALL SELECT * FROM subs UNION ALL SELECT * FROM dels
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s) AS ed
      FROM uni a JOIN uni b ON a.id < b.id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(ed AS BIGINT) AS ed
    FROM pairs WHERE ed <= 2
    ORDER BY id_a, id_b
    """


def multimodal_phash_dedup(sf_dir: str) -> pd.DataFrame:
    """Perceptual-hash image near-dup: real BMP/PPM pixel decode → integer
    aHash (8×8 average hash) → banded-hamming LSH (4 × 16-bit bands, one
    groupby on the band bucket) → within-bucket vectorized hamming verify,
    keep pairs ≤ 12 bits apart. Cross-container by construction — a BMP and
    its PPM re-encode hash identically.

    Candidate semantics are the standard banded-LSH contract (same as
    ``dedup_minhash``): pairs within hamming ≤ 3 are guaranteed candidates
    by pigeonhole; 4-12 only when a band happens to match. The DuckDB
    oracle re-decodes the staged payloads byte-by-byte in SQL (only the 64
    grid-sampled pixels per image — the floor-index downsample means the
    oracle never unnests full pixel rows) and applies the identical
    candidate + verify definition.

    Scale: one shuffle of 4 band rows per image; bucket groups are
    near-dup-cluster-sized; the only driver materialization is the final
    verified pair set."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        PHashStage,
        hamming_from_bands,
    )

    hashed = rd.read_parquet(_stage_phash_media()).map_batches(
        PHashStage,
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    )

    def to_band_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("bucket", pa.int64()), ("media_id", pa.int64())]
                + [(f"b{i}", pa.int64()) for i in range(4)]
            ).empty_table()
        ids = _col(t, "media_id").to_numpy()
        b = np.stack([_col(t, f"b{i}").to_numpy() for i in range(4)], axis=1)
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        bucket = band * 65536 + b.ravel()
        rep = np.repeat(np.arange(n), 4)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "media_id": pa.array(ids[rep]),
                **{f"b{i}": pa.array(b[rep, i]) for i in range(4)},
            }
        )

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("media_id")
        if len(g) < 2:
            return empty
        ids = g["media_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        bmat = g[["b0", "b1", "b2", "b3"]].to_numpy(dtype=np.int64)[order]
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = hamming_from_bands(bmat[ii], bmat[jj])
        keep = ham <= 12
        return pd.DataFrame(
            {"id_a": ids[ii][keep], "id_b": ids[jj][keep],
             "hamming": ham[keep].astype(np.int64)}
        )

    pairs = (
        hashed.map_batches(to_band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return empty
    # a pair sharing several bands is generated once per shared band with an
    # identical hamming — dedupe the (small, verified) driver-side result
    pdf = pdf.drop_duplicates(["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def multimodal_image_boxblur(sf_dir: str) -> pd.DataFrame:
    """3×3 box-filter convolution (the stencil member of the augmentation
    family beside crop/resize/histeq), integer-exact: per channel the valid
    (interior) box SUM image is built from two axis-wise shifted adds — six
    vectorized int64 adds per image, no per-pixel Python — and the reported
    per-channel interior sums plus the global max box value are
    FLIP-INVARIANT (a 3×3 sum commutes with BMP's bottom-up row order), so
    the SQL re-decode can run the stencil in raw storage coordinates. A
    blur that's off by one row/column shifts which pixels get interior
    multiplicities and changes every reported value."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        decode_bmp,
        decode_ppm,
        sniff_format,
    )

    def boxblur(t: pa.Table) -> pa.Table:
        mids, sums, maxs = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            fmt = sniff_format(payload)
            px = (decode_bmp(payload) if fmt == "bmp" else decode_ppm(payload)).astype(np.int64)
            v = px[:-2] + px[1:-1] + px[2:]
            box = v[:, :-2] + v[:, 1:-1] + v[:, 2:]
            mids.append(mid)
            sums.append(box.sum(axis=(0, 1)))
            maxs.append(int(box.max()))
        s = np.array(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "blur_sum_r": pa.array(s[:, 0]), "blur_sum_g": pa.array(s[:, 1]),
             "blur_sum_b": pa.array(s[:, 2]),
             "blur_max": pa.array(maxs, pa.int64())}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        boxblur, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def multimodal_image_sobel(sf_dir: str) -> pd.DataFrame:
    """Sobel edge magnitude (the gradient member of the stencil family
    beside the 3×3 box blur), integer-exact: per channel gx/gy come from
    two shifted-difference + weighted-add passes (six int64 ops per axis,
    no per-pixel Python), magnitude is |gx|+|gy| (L1 — stays integer), and
    the reported per-channel interior magnitude sums plus the global max
    are FLIP-INVARIANT: the gx kernel is symmetric across rows, gy flips
    sign but |gy| doesn't, so BMP's bottom-up storage order and any
    re-sharding leave every reported value unchanged — the SQL re-decode
    runs the same stencil in raw storage coordinates."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        decode_bmp,
        decode_ppm,
        sniff_format,
    )

    def sobel(t: pa.Table) -> pa.Table:
        mids, sums, maxs = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            fmt = sniff_format(payload)
            px = (decode_bmp(payload) if fmt == "bmp" else decode_ppm(payload)).astype(np.int64)
            sx = px[:, 2:] - px[:, :-2]
            gx = sx[:-2] + 2 * sx[1:-1] + sx[2:]
            sy = px[2:] - px[:-2]
            gy = sy[:, :-2] + 2 * sy[:, 1:-1] + sy[:, 2:]
            mag = np.abs(gx) + np.abs(gy)
            mids.append(mid)
            sums.append(mag.sum(axis=(0, 1)))
            maxs.append(int(mag.max()))
        s = np.array(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "edge_sum_r": pa.array(s[:, 0]), "edge_sum_g": pa.array(s[:, 1]),
             "edge_sum_b": pa.array(s[:, 2]),
             "edge_max": pa.array(maxs, pa.int64())}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        sobel, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def _sobel_sql() -> str:
    """Byte-level SQL re-decode of the Sobel pass: same px CTE chain as the
    box blur; the 3×3 neighborhood self-join carries the separable kernel as
    weight expressions — gx weight (dc)·(2−|dr|), gy weight (dr)·(2−|dc|)."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    px AS (
      SELECT im.media_id, im.w, im.ht,
             t.pi // im.w AS rw, t.pi % im.w AS cl,
             {_hx("base + rsh")} AS r, {_hx("base + 1")} AS g,
             {_hx("base + 2 - rsh")} AS b
      FROM (SELECT im0.*,
              CASE WHEN im0.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
            FROM img2 im0) im,
           range(400) t(pi),
           LATERAL (SELECT CASE WHEN im.fmt = 'bmp'
                         THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
                         ELSE im.datoff + t.pi*3 END AS base) o
      WHERE t.pi < im.w * im.ht
    ),
    grad AS (
      SELECT p.media_id, p.rw, p.cl,
             CAST(SUM(q.r * (q.cl - p.cl) * (2 - abs(q.rw - p.rw))) AS BIGINT) AS gxr,
             CAST(SUM(q.r * (q.rw - p.rw) * (2 - abs(q.cl - p.cl))) AS BIGINT) AS gyr,
             CAST(SUM(q.g * (q.cl - p.cl) * (2 - abs(q.rw - p.rw))) AS BIGINT) AS gxg,
             CAST(SUM(q.g * (q.rw - p.rw) * (2 - abs(q.cl - p.cl))) AS BIGINT) AS gyg,
             CAST(SUM(q.b * (q.cl - p.cl) * (2 - abs(q.rw - p.rw))) AS BIGINT) AS gxb,
             CAST(SUM(q.b * (q.rw - p.rw) * (2 - abs(q.cl - p.cl))) AS BIGINT) AS gyb
      FROM px p JOIN px q
        ON q.media_id = p.media_id
       AND abs(q.rw - p.rw) <= 1 AND abs(q.cl - p.cl) <= 1
      WHERE p.rw BETWEEN 1 AND p.ht - 2 AND p.cl BETWEEN 1 AND p.w - 2
      GROUP BY p.media_id, p.rw, p.cl
    )
    SELECT media_id,
           CAST(SUM(abs(gxr) + abs(gyr)) AS BIGINT) AS edge_sum_r,
           CAST(SUM(abs(gxg) + abs(gyg)) AS BIGINT) AS edge_sum_g,
           CAST(SUM(abs(gxb) + abs(gyb)) AS BIGINT) AS edge_sum_b,
           CAST(MAX(greatest(abs(gxr) + abs(gyr), abs(gxg) + abs(gyg),
                             abs(gxb) + abs(gyb))) AS BIGINT) AS edge_max
    FROM grad GROUP BY media_id ORDER BY media_id
    """


def embedding_triplets(sf_dir: str) -> pd.DataFrame:
    """Contrastive triplet mining (`functions/similarity.py:triplet_sample`):
    per anchor (vec_ids 0-4) the nearest SAME-label positive and nearest
    DIFFERENT-label hard negative — the (a, p, n) rows a triplet/InfoNCE
    objective trains on. One broadcast matmul + two masks per batch."""
    from ..functions.similarity import triplet_sample

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return triplet_sample(ds, query_ids=[0, 1, 2, 3, 4])


def events_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-significant-digit screen per event type (the
    fraud/synthetic-data smell test in the data-quality family beside the
    Deequ suite): counts of leading digits 1-9 over the money column in
    exact integer cents. Vectorized leading-digit extraction is 18 folds of
    ``where(d >= 10, d // 10, d)`` — pure int64, no log10 float boundary —
    and the per-batch partial is ≤ types×9 rows, so the single groupby is
    kilobyte-scale at any corpus size."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5)
        m = ~np.isnan(cents) & (cents >= 1)
        d = cents[m].astype(np.int64)
        for _ in range(18):  # int64 max has 19 digits
            d = np.where(d >= 10, d // 10, d)
        agg = (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas().to_numpy()[m],
                          "digit": d})
            .groupby(["event_type", "digit"], as_index=False)
            .size()
        )
        return pa.table(
            {"event_type": pa.array(agg["event_type"].astype(str), pa.string()),
             "digit": pa.array(agg["digit"].to_numpy(), pa.int64()),
             "n_events": pa.array(agg["size"].to_numpy(), pa.int64())}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["event_type", "digit"], as_index=False)["n_events"].sum()
        return pa.table(
            {"event_type": pa.array(agg["event_type"].astype(str), pa.string()),
             "digit": pa.array(agg["digit"].to_numpy(), pa.int64()),
             "n_events": pa.array(agg["n_events"].to_numpy(), pa.int64())}
        )

    def add_tb(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "tb", pc.cast(pc.bit_wise_and(batch["digit"], 7), pa.int64())
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_tb, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["event_type", "digit"]).reset_index(drop=True)


def multimodal_image_otsu(sf_dir: str) -> pd.DataFrame:
    """Otsu adaptive threshold per image (the binarization step a
    document-image curation pipeline runs before OCR/layout): gray =
    (r+g+b)//3 (exact integer), 256-bin histogram, and the threshold t*
    maximizing between-class variance. The variance key
    (s0·N − w0·S)² / (w0·(N−w0)) is computed from EXACT integer moments —
    numerator ≤ ~1.6e15 < 2⁵³ so its float64 image is exact, and both
    engine and oracle evaluate the identical double division, so the
    argmax (ties: smaller t) never diverges. Embarrassingly parallel,
    order-independent (histogram-based)."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        decode_bmp,
        decode_ppm,
        sniff_format,
    )

    def otsu(t: pa.Table) -> pa.Table:
        mids, thr, below = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            fmt = sniff_format(payload)
            px = (decode_bmp(payload) if fmt == "bmp" else decode_ppm(payload)).astype(np.int64)
            gray = px.reshape(-1, 3).sum(axis=1) // 3
            h = np.bincount(gray, minlength=256)
            N = int(h.sum())
            S = int((np.arange(256) * h).sum())
            w0 = np.cumsum(h)[:-1]  # pixels with gray <= t, t = 0..254
            s0 = np.cumsum(np.arange(256) * h)[:-1]
            valid = (w0 > 0) & (w0 < N)
            num = (s0 * N - w0 * S).astype(np.float64) ** 2  # exact < 2^53
            den = (w0 * (N - w0)).astype(np.float64)
            key = np.where(valid, num / np.where(den == 0, 1.0, den), -1.0)
            t_star = int(np.argmax(key))  # first max = smaller t on ties
            mids.append(mid)
            thr.append(t_star)
            below.append(int(w0[t_star]))
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "otsu_t": pa.array(thr, pa.int64()),
             "n_below": pa.array(below, pa.int64())}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        otsu, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def _otsu_sql() -> str:
    """Oracle: same px chain → gray histogram → integer moments → the
    identical float64 variance key, argmax by (key desc, t asc)."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    px AS (
      SELECT im.media_id,
             ({_hx("base + rsh")} + {_hx("base + 1")} + {_hx("base + 2 - rsh")}) // 3 AS gray
      FROM (SELECT im0.*,
              CASE WHEN im0.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
            FROM img2 im0) im,
           range(400) t(pi),
           LATERAL (SELECT CASE WHEN im.fmt = 'bmp'
                         THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
                         ELSE im.datoff + t.pi*3 END AS base) o
      WHERE t.pi < im.w * im.ht
    ),
    mom AS (
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(gray) AS BIGINT) AS s
      FROM px GROUP BY media_id
    ),
    cum AS (
      SELECT p.media_id, t.t,
             CAST(SUM(CASE WHEN p.gray <= t.t THEN 1 ELSE 0 END) AS BIGINT) AS w0,
             CAST(SUM(CASE WHEN p.gray <= t.t THEN p.gray ELSE 0 END) AS BIGINT) AS s0
      FROM px p, range(255) t(t)
      GROUP BY p.media_id, t.t
    ),
    keyed AS (
      SELECT c.media_id, c.t, c.w0,
             CASE WHEN c.w0 > 0 AND c.w0 < m.n
                  THEN (CAST(c.s0 * m.n - c.w0 * m.s AS DOUBLE)
                        * CAST(c.s0 * m.n - c.w0 * m.s AS DOUBLE))
                       / CAST(c.w0 * (m.n - c.w0) AS DOUBLE)
                  ELSE -1.0 END AS key
      FROM cum c JOIN mom m USING (media_id)
    ),
    best AS (
      SELECT media_id, t, w0,
             ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY key DESC, t) AS rn
      FROM keyed
    )
    SELECT media_id, CAST(t AS BIGINT) AS otsu_t, CAST(w0 AS BIGINT) AS n_below
    FROM best WHERE rn = 1 ORDER BY media_id
    """


def multimodal_image_palette(sf_dir: str) -> pd.DataFrame:
    """Dominant-palette extraction: pixels quantize to a 16×16×16 RGB grid
    (cell = (r>>4)<<8 | (g>>4)<<4 | (b>>4)) and the top-3 cells per image by
    pixel count (ties → smaller cell id) come out of one bincount — the
    deterministic, integer-exact stand-in for k-means palette fitting that
    a curation pipeline uses to bucket images by color profile. Counts are
    order-independent, so BMP storage order and re-sharding never matter."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        decode_bmp,
        decode_ppm,
        sniff_format,
    )

    def palette(t: pa.Table) -> pa.Table:
        mids, ranks, cells, npx = [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            fmt = sniff_format(payload)
            px = (decode_bmp(payload) if fmt == "bmp" else decode_ppm(payload)).reshape(-1, 3)
            cell = (
                (px[:, 0].astype(np.int64) >> 4) << 8
                | (px[:, 1].astype(np.int64) >> 4) << 4
                | (px[:, 2].astype(np.int64) >> 4)
            )
            cnt = np.bincount(cell, minlength=4096)
            # top-3 by count desc, cell id asc — lexsort keys are (-count, cell)
            order = np.lexsort((np.arange(4096), -cnt))[:3]
            for r, cl in enumerate(order, start=1):
                if cnt[cl] == 0:
                    break
                mids.append(mid)
                ranks.append(r)
                cells.append(int(cl))
                npx.append(int(cnt[cl]))
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "rank": pa.array(ranks, pa.int64()),
             "cell": pa.array(cells, pa.int64()),
             "n_px": pa.array(npx, pa.int64())}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        palette, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values(["media_id", "rank"]).reset_index(drop=True)


def multimodal_image_crop(sf_dir: str) -> pd.DataFrame:
    """Central-crop augmentation with real pixels: decode BMP/PPM → slice
    the middle half ([h/4, h-h/4) × [w/4, w-w/4), integer bounds) →
    features from the cropped pixels. The oracle re-decodes ONLY the crop
    window's bytes (per-pixel offsets honor BMP's bottom-up BGR layout) and
    recomputes the f32-faithful feature norm via the shared
    ``_img_norm_ctes`` chain."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        _image_features,
        decode_bmp,
        decode_ppm,
    )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )

    def crop_stage(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(
                [("media_id", pa.int64()), ("crop_width", pa.int32()),
                 ("crop_height", pa.int32()), ("feature_norm", pa.float64())]
            ).empty_table()
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids, cws, chs, norms = [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), payloads):
            raw = p.as_py()
            px = decode_bmp(raw) if raw[:2] == b"BM" else decode_ppm(raw)
            h, w = px.shape[0], px.shape[1]
            crop = px[h // 4 : h - h // 4, w // 4 : w - w // 4]
            feats = _image_features(crop, 64)
            ids.append(mid)
            cws.append(crop.shape[1])
            chs.append(crop.shape[0])
            norms.append(float(np.linalg.norm(feats.astype(np.float64))))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "crop_width": pa.array(cws, pa.int32()),
             "crop_height": pa.array(chs, pa.int32()),
             "feature_norm": pa.array(norms, pa.float64())}
        )

    pdf = ds.map_batches(
        crop_stage, batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    pdf["feature_norm"] = round_half_away(pdf["feature_norm"], 4)
    return pdf.sort_values("media_id").reset_index(drop=True)


def _image_crop_sql() -> str:
    """SQL re-decode of the central-crop path: crop pixel pi maps to source
    (y0 + pi // cw, x0 + pi % cw); BMP reads stored row ht-1-y in BGR."""
    return f"""
    WITH media AS (
      SELECT media_id, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT media_id, h,
             CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (
      SELECT *, ((w*3 + 3) // 4) * 4 AS rowb,
             w - 2*(w // 4) AS cw, ht - 2*(ht // 4) AS ch
      FROM img
    ),
    pxo AS (
      SELECT i.media_id, i.h AS h,
             (i.ht // 4) + t.pi // i.cw AS sy, (i.w // 4) + t.pi % i.cw AS sx,
             i.fmt, i.w, i.ht, i.datoff, i.rowb
      FROM img2 i, range(400) t(pi) WHERE t.pi < i.cw * i.ch
    ),
    loc AS (
      SELECT media_id, h,
        CASE WHEN fmt = 'bmp' THEN datoff + (ht - 1 - sy)*rowb + sx*3
             ELSE datoff + (sy*w + sx)*3 END AS o,
        CASE WHEN fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
      FROM pxo
    ),
    px AS (
      SELECT media_id, {_hx("o + rsh")} AS r, {_hx("o + 1")} AS g,
             {_hx("o + 2 - rsh")} AS b
      FROM loc
    ),
    {_img_norm_ctes("px", "media_id")}
    SELECT i.media_id, CAST(i.cw AS INT) AS crop_width,
           CAST(i.ch AS INT) AS crop_height, ROUND(n.fn, 4) AS feature_norm
    FROM img2 i JOIN norm_px n USING (media_id)
    ORDER BY i.media_id
    """


def multimodal_audio_resample(sf_dir: str) -> pd.DataFrame:
    """Audio sample-rate normalization (integer-exact core): real WAV decode
    → decimate ×2 (every other sample) → features from the decimated signal.
    The DuckDB oracle re-decodes the same staged payloads byte-by-byte with
    the decimated sample indexing and recomputes the float32-faithful
    feature norm — full value check of the resample path (the anti-alias
    filter a production resampler adds in front is float-heavy and stays
    out of the exact contract; see DecodeStage.audio_decimate)."""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, DecodeStage

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": True, "audio_decimate": 2},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    )
    pdf = out.to_pandas()[["media_id", "decoded_samples", "feature_norm"]]
    pdf["feature_norm"] = round_half_away(pdf["feature_norm"], 4)
    return pdf.sort_values("media_id").reset_index(drop=True)


def _audio_resample_sql() -> str:
    """SQL re-decode of the ×2-decimated WAV path: sample j reads PCM16 at
    byte 44 + 2·(2j); rms/zcr/histogram recomputed over the decimated
    sequence with the same float32 feature quantization as
    ``_decode_real_sql``'s wnorm chain."""
    return f"""
    WITH wav AS (
      SELECT media_id, hex(payload) AS h, ({_le32(40)}) // 2 AS ns
      FROM read_parquet('{_stage_real_media()}')
      WHERE kind = 'audio' AND substr(hex(payload), 25, 8) = '666D7420'
                           AND substr(hex(payload), 73, 8) = '64617461'
    ),
    smp AS (
      SELECT media_id, i, CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM (SELECT w.media_id, t.i,
                   {_hx("44 + 4*t.i")} + 256*{_hx("45 + 4*t.i")} AS raw,
                   w.h AS h
            FROM wav w, range(1000) t(i) WHERE 2*t.i < w.ns)
    ),
    wagg AS (
      SELECT media_id, sqrt(avg((s/32768.0)*(s/32768.0))) AS rms, count(*) AS n
      FROM smp GROUP BY media_id
    ),
    wz AS (
      SELECT media_id,
             SUM(CASE WHEN flip THEN 1 ELSE 0 END)::DOUBLE / (count(*) - 1) AS zcr
      FROM (SELECT media_id,
                   (s < 0) <> lag(s < 0) OVER (PARTITION BY media_id ORDER BY i) AS flip
            FROM smp)
      GROUP BY media_id
    ),
    whist AS (
      SELECT media_id, SUM({_sq(_f32("cnt::DOUBLE / n"))}) AS hss
      FROM (SELECT media_id,
                   LEAST(CAST(floor(((s/32768.0) + 1.0) * (62.0/2.0)) AS INT), 61) AS bin,
                   COUNT(*) AS cnt
            FROM smp GROUP BY media_id, bin)
      JOIN (SELECT media_id, n FROM wagg) USING (media_id)
      GROUP BY media_id
    )
    SELECT a.media_id, CAST(a.n AS BIGINT) AS decoded_samples,
           ROUND(sqrt({_sq(_f32("a.rms"))} + {_sq(_f32("z.zcr"))} + hh.hss), 4)
             AS feature_norm
    FROM wagg a JOIN wz z USING (media_id) JOIN whist hh USING (media_id)
    ORDER BY a.media_id
    """


def multimodal_audio_vad(sf_dir: str) -> pd.DataFrame:
    """Energy-based voice-activity segmentation (integer-exact): real WAV
    decode → non-overlapping 256-sample frames → per-frame energy
    Σ s² (int64, exact: 256·(2¹⁵)² < 2⁴⁵) → frame active iff energy above a
    fixed integer threshold → per clip: frame count, active count and the
    number of contiguous active SEGMENTS (the VAD run-length output a
    speech pipeline cuts clips on). Every compared value is an integer, so
    the byte-level SQL re-decode agrees exactly — threshold knife-edges
    included."""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, decode_wav

    frame, thresh = 256, 16_400_000_000  # ~E[energy] for the sigma=8000 synth noise

    def vad(t: pa.Table) -> pa.Table:
        mids, nw_l, na_l, ns_l = [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            s, _rate = decode_wav(payload)
            nw = len(s) // frame
            e = (s[: nw * frame].astype(np.int64) ** 2).reshape(nw, frame).sum(axis=1)
            act = e > thresh
            nseg = int(act[0]) + int((act[1:] & ~act[:-1]).sum()) if nw else 0
            mids.append(mid)
            nw_l.append(nw)
            na_l.append(int(act.sum()))
            ns_l.append(nseg)
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "n_frames": pa.array(nw_l, pa.int64()),
             "n_active": pa.array(na_l, pa.int64()),
             "n_segments": pa.array(ns_l, pa.int64())}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        vad, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def multimodal_audio_tone(sf_dir: str) -> pd.DataFrame:
    """Single-bin tone detection (DTMF-style) at f = fs/6 via Goertzel,
    integer-exact: at that bin the Goertzel coefficient 2·cos(2π/6) = 1, so
    the recurrence s[n] = x[n] + s[n−1] − s[n−2] stays in int64 and has the
    CLOSED FORM s[N−1] = Σₖ x[k]·u[(N−1−k) mod 6] with u = [1,1,0,−1,−1,0]
    (Chebyshev impulse response, period 6) — each 400-sample frame's
    (s[N−1], s[N−2]) is one int64 matmul against a ±1/0 weight matrix, and
    tone power P = s₁² + s₂² − s₁·s₂ is exact. Frames over the fixed
    threshold carry the fixture's planted fs/6 tone at ~10⁴× the noise
    floor. The SQL oracle re-decodes the WAV bytes and evaluates the same
    closed-form weighted sums, so every power value matches exactly."""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, decode_wav

    frame, thresh = 400, 100_000_000_000
    u = np.array([1, 1, 0, -1, -1, 0], dtype=np.int64)
    j = np.arange(frame)
    wmat = np.stack([u[(frame - 1 - j) % 6], u[(frame - 2 - j) % 6]], axis=1)

    def tone(t: pa.Table) -> pa.Table:
        mids, fis, pows, hots = [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            s, _rate = decode_wav(payload)
            nw = len(s) // frame
            sv = s[: nw * frame].astype(np.int64).reshape(nw, frame) @ wmat
            p = sv[:, 0] ** 2 + sv[:, 1] ** 2 - sv[:, 0] * sv[:, 1]
            mids.extend([mid] * nw)
            fis.extend(range(nw))
            pows.extend(int(v) for v in p)
            hots.extend(bool(v > thresh) for v in p)
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "frame_idx": pa.array(fis, pa.int64()),
             "tone_power": pa.array(pows, pa.int64()),
             "has_tone": pa.array(hots, pa.bool_())}
        )

    out = rd.read_parquet(_stage_tone_audio()).map_batches(
        tone, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def multimodal_scene_cuts(sf_dir: str) -> pd.DataFrame:
    """Shot-boundary (scene-cut) detection over concatenated-PPM video
    streams: decode every frame, compute the sum of absolute pixel
    differences (SAD, exact int64) per consecutive-frame transition, and
    flag cuts where SAD exceeds 5·w·h·3 (≥5 gray levels of mean change —
    intra-scene transitions in the fixture sit at ≤1 level, scene switches
    at ~85). One row per transition with the exact SAD, so the byte-level
    SQL re-decode agrees on every value, not just the flags."""
    from ..functions.multimodal import RECOMMENDED_MEDIA_BATCH_SIZE, decode_ppm_stream

    def cuts(t: pa.Table) -> pa.Table:
        mids, fis, sads, flags = [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            frames = np.stack(decode_ppm_stream(payload)).astype(np.int64)
            sad = np.abs(frames[1:] - frames[:-1]).sum(axis=(1, 2, 3))
            thr = 5 * frames.shape[1] * frames.shape[2] * 3
            for k, s in enumerate(sad, start=1):
                mids.append(mid)
                fis.append(k)
                sads.append(int(s))
                flags.append(bool(s > thr))
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "frame_idx": pa.array(fis, pa.int64()),
             "sad": pa.array(sads, pa.int64()),
             "is_cut": pa.array(flags, pa.bool_())}
        )

    out = rd.read_parquet(_stage_scene_videos()).map_batches(
        cuts, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def multimodal_image_histeq(sf_dir: str) -> pd.DataFrame:
    """Per-channel histogram equalization (contrast-normalization
    augmentation), integer-exact: for each channel the classic LUT
    eq(v) = ((cdf(v) − cdf_min) · 255) // (N − cdf_min) is built from the
    image's own 256-bin histogram (one bincount + cumsum per channel — no
    per-pixel Python), pixels map through it, and the per-channel SUM of
    equalized values is reported (order-independent, so BMP's bottom-up row
    storage needs no flip and any re-sharding agrees). Every value is an
    int64, so the byte-level SQL re-decode matches exactly."""
    from ..functions.multimodal import (
        RECOMMENDED_MEDIA_BATCH_SIZE,
        decode_bmp,
        decode_ppm,
        sniff_format,
    )

    def histeq(t: pa.Table) -> pa.Table:
        mids, sums = [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            fmt = sniff_format(payload)
            px = (decode_bmp(payload) if fmt == "bmp" else decode_ppm(payload)).reshape(-1, 3)
            n = px.shape[0]
            ch_sums = np.empty(3, dtype=np.int64)
            for c in range(3):
                hist = np.bincount(px[:, c], minlength=256).astype(np.int64)
                cdf = np.cumsum(hist)
                nz = np.flatnonzero(hist)
                cdf_min = int(cdf[nz[0]])
                if n > cdf_min:
                    lut = (cdf - cdf_min) * 255 // (n - cdf_min)
                else:  # constant image: everything maps to 0
                    lut = np.zeros(256, dtype=np.int64)
                ch_sums[c] = int(lut[px[:, c]].sum())
            mids.append(mid)
            sums.append(ch_sums)
        s = np.array(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "sum_r_eq": pa.array(s[:, 0]), "sum_g_eq": pa.array(s[:, 1]),
             "sum_b_eq": pa.array(s[:, 2])}
        )

    ds = rd.read_parquet(_stage_real_media()).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        histeq, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def _sorted_pdf(ds: rd.Dataset, *sort_cols: str) -> pd.DataFrame:
    pdf = ds.to_pandas()
    return pdf.sort_values(list(sort_cols)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H join shapes, second batch: Q7 / Q10 / Q14 / Q15 / Q17 / Q19
# (the shapes the first batch didn't cover: bidirectional nation pairs,
# top-k over a 4-table join, conditional-fraction aggregate, view + global
# argmax, correlated per-group average, disjunctive multi-band predicate)
# ---------------------------------------------------------------------------


def _col(batch: pa.Table, name: str) -> pa.Array:
    c = batch[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


class _PartLookup:
    """Actor-pool stage holding a broadcast part-dimension projection: the
    constructor receives parallel arrays (partkey + any attribute columns)
    once per actor; ``lookup`` maps a batch's partkey column to attribute
    row indices via ``pc.index_in`` (one hash probe per batch, no shuffle).
    At a scale where part outgrows broadcast, swap the callers' lookup for
    a reduce-side partkey bucket join — same stage shape as
    :func:`q3_shipping_priority` stage 1."""

    def __init__(self, keys: pa.Array, **attrs):
        self.keys = keys
        self.attrs = attrs

    def indices(self, batch: pa.Table, col: str) -> pa.Array:
        return pc.index_in(_col(batch, col).cast(pa.int64()), value_set=self.keys)


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: conditional-fraction aggregate over a fact⋈dim join.
    The part dimension ships once per actor as two parallel arrays
    (partkey, is-promo bitmask); each batch does ONE ``pc.index_in`` probe
    and two masked integer sums, so a block reduces to a single partial row
    and the only exchange is the kilobyte partial stream. The share is
    computed with :func:`scalar.round_half_away` (DuckDB ROUND parity —
    small-integer cent ratios do land on rounding boundaries)."""
    import pyarrow.dataset as pads

    from ..functions.scalar import round_half_away

    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).take_all()
    pk = pa.array([int(r["p_partkey"]) for r in part], pa.int64())
    promo = np.array([r["p_type"] == "PROMO" for r in part], dtype=bool)

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    class Partial(_PartLookup):
        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = self.indices(batch, "l_partkey").to_numpy(zero_copy_only=False)
            is_promo = self.attrs["promo"][idx.astype(np.int64)]
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")
            return pa.table(
                {"promo_rev_cents": pa.array([int(rev[is_promo].sum())], pa.int64()),
                 "total_rev_cents": pa.array([int(rev.sum())], pa.int64())}
            )

    from ray.data.aggregate import Sum

    agg = li.map_batches(
        Partial, fn_constructor_args=(pk,), fn_constructor_kwargs={"promo": promo},
        batch_format="pyarrow", concurrency=2,
    ).aggregate(
        Sum("promo_rev_cents", alias_name="promo_rev_cents"),
        Sum("total_rev_cents", alias_name="total_rev_cents"),
    ) or {}
    p = int(agg.get("promo_rev_cents") or 0)
    t = int(agg.get("total_rev_cents") or 0)
    return pd.DataFrame(
        {"promo_rev_cents": [p], "total_rev_cents": [t],
         "promo_share_pct": [round_half_away(100.0 * p / t, 6) if t else 0.0]}
    )


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning fact AND dimension
    attributes (brand × size band × quantity band). The three conjuncts are
    evaluated as vectorized numpy masks against a broadcast per-part brand
    CLASS code (0 = no clause's brand, else the clause ordinal) — a
    disjunction never forces a row loop or three scans; one pass, three
    boolean kernels, OR-fold. Per-batch partial sums; kilobyte exchange."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).take_all()
    clauses = [
        ("Brand#4", 1, 15, 1, 20),
        ("Brand#2", 10, 30, 10, 30),
        ("Brand#19", 20, 50, 20, 40),
    ]
    brand_class = {b: i + 1 for i, (b, *_) in enumerate(clauses)}
    pk = pa.array([int(r["p_partkey"]) for r in part], pa.int64())
    cls = np.array([brand_class.get(r["p_brand"], 0) for r in part], dtype=np.int8)
    size = np.array([int(r["p_size"]) for r in part], dtype=np.int64)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    class Partial(_PartLookup):
        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = self.indices(batch, "l_partkey").to_numpy(zero_copy_only=False)
            idx = idx.astype(np.int64)
            pcls, psize = self.attrs["cls"][idx], self.attrs["size"][idx]
            qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
            keep = np.zeros(len(batch), dtype=bool)
            for i, (_, s_lo, s_hi, q_lo, q_hi) in enumerate(clauses):
                keep |= ((pcls == i + 1) & (psize >= s_lo) & (psize <= s_hi)
                         & (qty >= q_lo) & (qty <= q_hi))
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
            rev = np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64").sum()
            return pa.table(
                {"revenue_cents": pa.array([int(rev)], pa.int64()),
                 "n_items": pa.array([int(keep.sum())], pa.int64())}
            )

    from ray.data.aggregate import Sum

    agg = li.map_batches(
        Partial, fn_constructor_args=(pk,),
        fn_constructor_kwargs={"cls": cls, "size": size},
        batch_format="pyarrow", concurrency=2,
    ).aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    ) or {}
    return pd.DataFrame(
        {"revenue_cents": [int(agg.get("revenue_cents") or 0)],
         "n_items": [int(agg.get("n_items") or 0)]}
    )


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: revenue "view" + global argmax equality join. The
    view (per-supplier quarterly revenue) is built as per-batch partial
    sums — ``np.unique`` + ``np.bincount`` folds each block to ≤|suppliers
    in block| rows BEFORE the one supplier-keyed groupby — so the exchange
    is bounded by blocks × suppliers-per-block, not lineitem count. The
    aggregated view is supplier-DIMENSION-sized by construction (that's
    what Q15's CREATE VIEW materializes too), so the global max + equality
    filter run on the driver over a dimension-sized frame; ties all
    surface, ordered by suppkey."""
    import pyarrow.dataset as pads

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    li = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")
        keys, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype("float64")).astype("int64")
        return pa.table(
            {"s_suppkey": pa.array(keys.astype("int64")),
             "total_revenue_cents": pa.array(sums)}
        )

    from ray.data.aggregate import Sum

    view = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_revenue_cents", alias_name="total_revenue_cents"))
    )
    pdf = view.to_pandas()  # supplier-dimension-sized (the Q15 view)
    if pdf.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype="object"),
             "total_revenue_cents": pd.Series([], dtype="int64")}
        )
    pdf["total_revenue_cents"] = pdf["total_revenue_cents"].astype("int64")
    top = pdf[pdf["total_revenue_cents"] == pdf["total_revenue_cents"].max()]
    names = {
        int(r["s_suppkey"]): r["s_name"]
        for r in _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).take_all()
    }
    top = top.copy()
    top["s_name"] = top["s_suppkey"].map(lambda k: names[int(k)])
    return top.sort_values("s_suppkey").reset_index(drop=True)[
        ["s_suppkey", "s_name", "total_revenue_cents"]
    ]


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: correlated per-group average subquery
    (``l_quantity < 0.2 * avg(l_quantity) per part``). The brand's partkeys
    broadcast as an ``is_in`` prune BEFORE the shuffle; the correlation is
    resolved by co-locating each part's lineitems in ONE partkey-bucket
    ``map_groups`` task that computes the group average and applies the
    filter in the same pass — no second scan, no join back. Quantities are
    integers by profile, so the 20% threshold compares exactly as
    ``5 * qty * count < sum_qty`` in int64 (no float boundary exists).
    Money output is ``total // 7`` (Q17's yearly average) in floor integer
    division on both sides."""
    B = 16
    brand = "Brand#4"
    import pyarrow.dataset as pads

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"],
                 filter=(pads.field("p_brand") == brand)).take_all()
    brand_keys = pa.array([int(r["p_partkey"]) for r in part], pa.int64())

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def tag(batch: pa.Table) -> pa.Table:
        pkcol = _col(batch, "l_partkey").cast(pa.int64())
        keep = pc.is_in(pkcol, value_set=brand_keys)  # prune BEFORE the shuffle
        batch, pkcol = batch.filter(keep), pkcol.filter(keep)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype("int64")
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"pbucket": pc.bit_wise_and(pkcol, B - 1), "partkey": pkcol,
             "qty": pa.array(qty),
             "ep_cents": pa.array(np.floor(ep * 100 + 0.5).astype("int64"))}
        )

    def small_qty_partial(g: pd.DataFrame) -> pa.Table:
        stats = g.groupby("partkey")["qty"].agg(["sum", "count"])
        sum_q = stats["sum"].reindex(g["partkey"]).to_numpy(dtype="int64")
        cnt = stats["count"].reindex(g["partkey"]).to_numpy(dtype="int64")
        qty = g["qty"].to_numpy(dtype="int64")
        keep = 5 * qty * cnt < sum_q
        return pa.table(
            {"total_revenue_cents": pa.array(
                [int(g["ep_cents"].to_numpy()[keep].sum())], pa.int64()),
             "n_items": pa.array([int(keep.sum())], pa.int64())}
        )

    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(small_qty_partial, batch_format="pandas")
        .aggregate(Sum("total_revenue_cents", alias_name="total_revenue_cents"),
                   Sum("n_items", alias_name="n_items"))
    ) or {}
    total = int(agg.get("total_revenue_cents") or 0)
    return pd.DataFrame(
        {"total_revenue_cents": [total],
         "n_items": [int(agg.get("n_items") or 0)],
         "avg_yearly_cents": [total // 7]}
    )


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue over a
    4-table join. orders[quarter] ⋈ lineitem[returnflag=R] is a reduce-side
    orderkey-bucket join (both sides fact-sized at scale, both predicates
    pushed to the scan); each bucket emits per-custkey PARTIAL sums, one
    custkey groupby folds them, and a per-block local top-20 bounds the
    driver merge at blocks × 20 rows. Customer attributes and nation names
    attach on the driver to the FINAL 20 rows only — the engine never ships
    the customer dimension anywhere."""
    B = 16
    lo, hi = datetime(1996, 10, 1), datetime(1997, 1, 1)
    import pyarrow.dataset as pads

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=(pads.field("l_returnflag") == "R"),
    )
    schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("custkey", pa.int64()),
         ("rev_cents", pa.int64()), ("side", pa.string())]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "o_orderkey").cast(pa.int64())
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "custkey": _col(batch, "o_custkey").cast(pa.int64()),
             "rev_cents": pa.array(np.zeros(len(batch), dtype="int64")),
             "side": pa.array(["O"] * len(batch), pa.string())},
            schema=schema,
        )

    def tag_li(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "l_orderkey").cast(pa.int64())
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "custkey": pa.nulls(len(batch), pa.int64()),
             "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")),
             "side": pa.array(["L"] * len(batch), pa.string())},
            schema=schema,
        )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "rev_cents"]]
        right = g[g["side"] == "O"][["orderkey", "custkey"]]
        j = left.merge(right, on="orderkey", how="inner")
        agg = j.groupby("custkey", as_index=False)["rev_cents"].sum()
        return pa.table(
            {"c_custkey": pa.array(agg["custkey"].to_numpy(dtype="int64")),
             "revenue_cents": pa.array(agg["rev_cents"].to_numpy(dtype="int64"))}
        )

    def local_top20(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas().sort_values(
            ["revenue_cents", "c_custkey"], ascending=[False, True]
        ).head(20)
        # explicit schema (no pandas metadata): keeps block schemas hashable
        # for Ray's schema deduplication
        return pa.table(
            {"c_custkey": pa.array(pdf["c_custkey"].to_numpy(dtype="int64")),
             "revenue_cents": pa.array(pdf["revenue_cents"].to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    per_cust = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(li.map_batches(tag_li, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("c_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .map_batches(local_top20, batch_format="pyarrow")
    )
    pdf = per_cust.to_pandas()
    if pdf.empty:
        return pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"),
             "c_name": pd.Series([], dtype="object"),
             "revenue_cents": pd.Series([], dtype="int64"),
             "acctbal_cents": pd.Series([], dtype="int64"),
             "n_name": pd.Series([], dtype="object")}
        )
    pdf = pdf.sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    ).head(20)
    pdf["revenue_cents"] = pdf["revenue_cents"].astype("int64")

    # attach customer / nation attributes to the FINAL 20 rows on the driver
    want = set(pdf["c_custkey"].astype("int64").tolist())
    import pyarrow.dataset as pads2

    cust_rows = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pads2.field("c_custkey").isin(sorted(want)),
    ).take_all()
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}
    attrs = {
        int(r["c_custkey"]): (
            r["c_name"],
            int(np.floor(r["c_acctbal"] * 100 + 0.5)),
            nat[int(r["c_nationkey"])],
        )
        for r in cust_rows
    }
    pdf["c_name"] = pdf["c_custkey"].map(lambda k: attrs[int(k)][0])
    pdf["acctbal_cents"] = pdf["c_custkey"].map(lambda k: attrs[int(k)][1]).astype("int64")
    pdf["n_name"] = pdf["c_custkey"].map(lambda k: attrs[int(k)][2])
    return pdf.reset_index(drop=True)[
        ["c_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]
    ]


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair volume by year. The
    supplier→nation map broadcasts once per actor (smallest relation);
    customers prune to the two nations BEFORE their shuffle; orders ⋈
    customer and then ⋈ lineitem are reduce-side bucket joins (the q3/q5
    exchange pattern). The pair filter keeps only (supp, cust) nations that
    DIFFER — both directions survive and group separately. Ship-year comes
    from ``pc.year`` on the pushed-down 2-year shipdate band."""
    B = 16
    n1, n2 = "NATION_3", "NATION_7"
    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    import pyarrow.dataset as pads

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    name_by_key = {int(r["n_nationkey"]): r["n_name"] for r in nation}
    pair_keys = pa.array(
        [k for k, v in name_by_key.items() if v in (n1, n2)], pa.int64()
    )

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sup_in = [(int(r["s_suppkey"]), int(r["s_nationkey"])) for r in sup
              if r["s_nationkey"] in set(pair_keys.to_pylist())]
    sup_keys = pa.array([k for k, _ in sup_in], pa.int64())
    sup_nat = pa.array([v for _, v in sup_in], pa.int64())

    stage2_schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("natkey", pa.int64()),
         ("l_year", pa.int64()), ("rev_cents", pa.int64()), ("side", pa.string())]
    )

    # ---- stage 1: orders ⋈ customer[two nations] on custkey --------------
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def tag_cust(batch: pa.Table) -> pa.Table:
        nk = _col(batch, "c_nationkey").cast(pa.int64())
        keep = pc.is_in(nk, value_set=pair_keys)  # prune BEFORE the shuffle
        batch, nk = batch.filter(keep), nk.filter(keep)
        ck = _col(batch, "c_custkey").cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": pa.nulls(n, pa.int64()), "natkey": nk,
             "side": pa.array(["C"] * n, pa.string())}
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = _col(batch, "o_custkey").cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": _col(batch, "o_orderkey").cast(pa.int64()),
             "natkey": pa.nulls(n, pa.int64()),
             "side": pa.array(["O"] * n, pa.string())}
        )

    def join_cust(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "O"][["custkey", "orderkey"]]
        right = g[g["side"] == "C"][["custkey", "natkey"]]
        j = left.merge(right, on="custkey", how="inner")
        ok = j["orderkey"].to_numpy(dtype="int64", na_value=0)
        n = len(j)
        return pa.table(
            {"obucket": pa.array(ok & (B - 1), pa.int64()),
             "orderkey": pa.array(ok, pa.int64()),
             "natkey": pa.array(j["natkey"].to_numpy(dtype="int64", na_value=0)),
             "l_year": pa.array(np.zeros(n, dtype="int64")),
             "rev_cents": pa.array(np.zeros(n, dtype="int64")),
             "side": pa.array(["O"] * n, pa.string())},
            schema=stage2_schema,
        )

    stage1 = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(join_cust, batch_format="pandas")
    )

    # ---- lineitem leg: broadcast supplier→nation, two-nation prune -------
    class TagLineitem:
        def __init__(self, keys, nats):
            self.keys, self.nats = keys, nats

        def __call__(self, batch: pa.Table) -> pa.Table:
            sk = _col(batch, "l_suppkey").cast(pa.int64())
            idx = pc.index_in(sk, value_set=self.keys)
            keep = pc.is_valid(idx)
            batch, idx = batch.filter(keep), idx.filter(keep)
            ok = _col(batch, "l_orderkey").cast(pa.int64())
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            yr = pc.year(_col(batch, "l_shipdate")).cast(pa.int64())
            n = len(batch)
            return pa.table(
                {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
                 "natkey": self.nats.take(idx), "l_year": yr,
                 "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")),
                 "side": pa.array(["L"] * n, pa.string())},
                schema=stage2_schema,
            )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    li_tagged = li.map_batches(
        TagLineitem, fn_constructor_args=(sup_keys, sup_nat),
        batch_format="pyarrow", concurrency=2,
    )

    # ---- stage 2: join on orderkey, keep differing nation pairs ----------
    def join_pair(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "natkey", "l_year", "rev_cents"]]
        right = g[g["side"] == "O"][["orderkey", "natkey"]].rename(
            columns={"natkey": "cust_nat"}
        )
        j = left.merge(right, on="orderkey", how="inner")
        j = j[j["natkey"] != j["cust_nat"]]  # both endpoints already in-pair
        agg = j.groupby(["natkey", "cust_nat", "l_year"], as_index=False)[
            "rev_cents"
        ].sum()
        return pa.table(
            {"supp_nat": pa.array(agg["natkey"].to_numpy(dtype="int64")),
             "cust_nat": pa.array(agg["cust_nat"].to_numpy(dtype="int64")),
             "l_year": pa.array(agg["l_year"].to_numpy(dtype="int64")),
             "rev_cents": pa.array(agg["rev_cents"].to_numpy(dtype="int64"))}
        )

    grouped = (
        stage1.union(li_tagged)
        .groupby("obucket")
        .map_groups(join_pair, batch_format="pandas")
        .to_pandas()
    )
    if grouped.empty:
        return pd.DataFrame(
            {"supp_nation": pd.Series([], dtype="object"),
             "cust_nation": pd.Series([], dtype="object"),
             "l_year": pd.Series([], dtype="int64"),
             "revenue_cents": pd.Series([], dtype="int64")}
        )
    out = grouped.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)[
        "rev_cents"
    ].sum()  # ≤ 2 pairs × 2 years rows — driver-sized by construction
    out["supp_nation"] = out["supp_nat"].map(lambda k: name_by_key[int(k)])
    out["cust_nation"] = out["cust_nat"].map(lambda k: name_by_key[int(k)])
    out = out.rename(columns={"rev_cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(
        drop=True
    )[["supp_nation", "cust_nation", "l_year", "revenue_cents"]]


def events_moving_window(sf_dir: str) -> pd.DataFrame:
    """ROWS-frame moving aggregate (the window shape the RANGE/hopping
    family doesn't cover): per user, the trailing-3-row window sum of value
    in cents plus the in-window row count, ordered by (ts, event_id). One
    user-hash shuffle (the merge path's key); inside each bucket a single
    sort + grouped rolling sum in pandas C loops. Output stays EXACT int64
    (window sums of cents), so no float summation order exists."""
    B = 16
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = _col(batch, "user_id").cast(pa.int64())
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"ubucket": pc.bit_wise_and(uid, B - 1),
             "event_id": _col(batch, "event_id").cast(pa.int64()),
             "ts": _col(batch, "ts").cast(pa.timestamp("us")),
             "user_id": uid,
             "cents": pa.array(np.floor(v * 100 + 0.5).astype("int64"))}
        )

    def window_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        grp = g.groupby("user_id")["cents"]
        w_sum = grp.rolling(3, min_periods=1).sum().to_numpy()
        w_n = grp.rolling(3, min_periods=1).count().to_numpy()
        return pa.table(
            {"event_id": pa.array(g["event_id"].to_numpy(dtype="int64")),
             "user_id": pa.array(g["user_id"].to_numpy(dtype="int64")),
             "w_sum_cents": pa.array(w_sum.astype("int64")),
             "w_n": pa.array(w_n.astype("int64"))}
        )

    pdf = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(window_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pdf.sort_values("event_id").reset_index(drop=True)


def events_rank_portfolio(sf_dir: str) -> pd.DataFrame:
    """Ranking-window portfolio over bounded (event_type, hour) groups:
    RANK (min method, real ties on equal cents), DENSE_RANK, and the
    CUME_DIST fraction as EXACT integers (n_le / n_grp — no float division
    crosses the compare). Groups are bounded by types × hours, so per-group
    vectorized pandas ranks scale; for an UNBOUNDED single-group global
    rank use the sample-banded range-partition prefix-sum pattern
    (events_ntile)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        hr = pc.floor_temporal(_col(batch, "ts"), unit="hour")
        return pa.table(
            {"event_id": _col(batch, "event_id").cast(pa.int64()),
             "event_type": _col(batch, "event_type").cast(pa.string()),
             "hr": hr.cast(pa.timestamp("us")),
             "cents": pa.array(np.floor(v * 100 + 0.5).astype("int64"))}
        )

    def rank_group(g: pd.DataFrame) -> pa.Table:
        c = g["cents"]
        rnk = c.rank(method="min", ascending=False).astype("int64")
        drnk = c.rank(method="dense", ascending=False).astype("int64")
        n_le = c.rank(method="max", ascending=True).astype("int64")
        return pa.table(
            {"event_id": pa.array(g["event_id"].to_numpy(dtype="int64")),
             "event_type": pa.array(g["event_type"], pa.string()),
             "hr": pa.array(g["hr"]).cast(pa.timestamp("us")),
             "rnk": pa.array(rnk.to_numpy()),
             "drnk": pa.array(drnk.to_numpy()),
             "n_le": pa.array(n_le.to_numpy()),
             "n_grp": pa.array(np.full(len(g), len(g), dtype="int64"))}
        )

    pdf = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    return pdf.sort_values("event_id").reset_index(drop=True)


_BPE_N_MERGES = 30


def text_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016): the learned merge
    table for 30 merges over the documents corpus. Full SQL value oracle
    (`_bpe_train_sql`): iterative string rewriting IS SQL-expressible once
    symbols are pipe-wrapped ('|c||a||t</w>|') — each merge round is one
    boundary-safe REPLACE whose leftmost-non-overlapping semantics match
    `_bpe_merge_word` exactly; pytest additionally value-locks both
    iteration engines against an independent brute force."""
    from ..functions.text import bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_train(ds, n_merges=_BPE_N_MERGES)


def text_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """Tokenize the corpus with its own learned BPE merges: per doc the
    token count + an md5 of the token stream (see
    :func:`functions.text.bpe_encode`). Full SQL value oracle: the train
    CTE chain re-derives the merges, then 30 chained REPLACEs re-segment
    the distinct-word table and per-doc aggregation rebuilds the exact
    '\\x1f'-joined token-stream md5."""
    from ..functions.text import bpe_encode, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, n_merges=_BPE_N_MERGES)
    pdf = bpe_encode(ds, merges).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _bpe_train_ctes(n: int) -> str:
    """The shared CTE chain: word vocab → pipe-wrapped char segmentation →
    n unrolled merge rounds. MATERIALIZED is load-bearing: each round
    references the previous state twice (pair count + replace), so inlined
    CTEs would expand the scan 2^n times. Symbols are wrapped per-symbol
    ('|a||b|') so REPLACE('|a||b|' → '|ab|') is boundary-safe AND leaves
    the neighbors' own pipes intact — consecutive pairs still match, and
    leftmost-non-overlapping REPLACE equals the canonical BPE merge scan
    ('a a a' merges once, to [aa, a])."""
    parts = [
        r"""
    bwords AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
      FROM documents
    ),
    bvocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM bwords GROUP BY w
    ),
    bseg0a AS (SELECT w, n, regexp_replace(w, '(.)', '\1||', 'g') AS s FROM bvocab),
    st0 AS MATERIALIZED (
      SELECT w, n, '|' || substr(s, 1, length(s) - 2) || '</w>|' AS seq FROM bseg0a
    )"""
    ]
    for r in range(1, n + 1):
        p = r - 1
        parts.append(f"""
    ex{r} AS MATERIALIZED (
      SELECT n, generate_subscripts(arr, 1) AS i, arr
      FROM (SELECT n, string_split(trim(seq, '|'), '||') AS arr FROM st{p})
    ),
    pr{r} AS MATERIALIZED (
      SELECT arr[i] AS l, arr[i+1] AS r2, SUM(n) AS cnt
      FROM ex{r} WHERE i < len(arr) GROUP BY 1, 2
    ),
    m{r} AS MATERIALIZED (
      SELECT l, r2, cnt FROM pr{r} ORDER BY cnt DESC, l || chr(31) || r2 LIMIT 1
    ),
    st{r} AS MATERIALIZED (
      SELECT w, n, REPLACE(seq,
        COALESCE((SELECT '|' || l || '||' || r2 || '|' FROM m{r}), chr(1)),
        COALESCE((SELECT '|' || l || r2 || '|' FROM m{r}), chr(1))) AS seq
      FROM st{p}
    )""")
    return ",".join(parts)


def _bpe_train_sql(n: int = _BPE_N_MERGES) -> str:
    """Oracle: same greedy merge loop — max pair count, ties to the
    lexicographically smallest chr(31)-packed pair (byte order == Python
    code-point order on these ASCII symbols)."""
    selects = [
        f'SELECT {r} AS rank, l AS "left", r2 AS "right", '
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n + 1)
    ]
    return (
        "WITH" + _bpe_train_ctes(n) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY rank"
    )


def _bpe_encode_sql(n: int = _BPE_N_MERGES) -> str:
    """Oracle: the train chain re-derives the merges, the distinct-word
    table replays them as n chained REPLACEs, and per-doc aggregation
    rebuilds the flat chr(31)-joined token stream (word order preserved via
    generate_subscripts) — token counts and stream md5s are byte-exact."""
    parts = [
        r"""
    dwords AS MATERIALIZED (
      SELECT doc_id, generate_subscripts(ws, 1) AS wi, unnest(ws) AS w
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
            FROM documents)
    ),
    dw AS (SELECT DISTINCT w FROM dwords),
    se0 AS MATERIALIZED (
      SELECT w, '|' || substr(s, 1, length(s) - 2) || '</w>|' AS seq
      FROM (SELECT w, regexp_replace(w, '(.)', '\1||', 'g') AS s FROM dw)
    )"""
    ]
    for r in range(1, n + 1):
        parts.append(f"""
    se{r} AS MATERIALIZED (
      SELECT w, REPLACE(seq,
        COALESCE((SELECT '|' || l || '||' || r2 || '|' FROM m{r}), chr(1)),
        COALESCE((SELECT '|' || l || r2 || '|' FROM m{r}), chr(1))) AS seq
      FROM se{r - 1}
    )""")
    return (
        "WITH" + _bpe_train_ctes(n) + "," + ",".join(parts) + f""",
    wseg AS MATERIALIZED (
      SELECT w, trim(seq, '|') AS stripped,
             (length(seq) - length(replace(seq, '|', ''))) // 2 AS n_sym
      FROM se{n}
    ),
    perdoc AS (
      SELECT d.doc_id, SUM(ws2.n_sym) AS n_bpe_tokens,
             md5(string_agg(replace(ws2.stripped, '||', chr(31)),
                            chr(31) ORDER BY d.wi)) AS token_stream_md5
      FROM dwords d JOIN wseg ws2 ON ws2.w = d.w
      GROUP BY d.doc_id
    )
    SELECT doc.doc_id,
           CAST(COALESCE(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           COALESCE(p.token_stream_md5, md5('')) AS token_stream_md5
    FROM documents doc LEFT JOIN perdoc p USING (doc_id)
    ORDER BY doc.doc_id"""
    )


def embedding_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Contrastive hard-negative mining: per anchor (vec_ids 0-4), the 10
    most cosine-similar embeddings with a DIFFERENT label (see
    :func:`functions.similarity.hard_negative_topk`)."""
    from ..functions.similarity import hard_negative_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return hard_negative_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10)


def corpus_divergence(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between the lang='en' slice and the rest
    of the corpus, per hashed n-gram bucket in exact int64 micro-nats (see
    :func:`functions.corpus.domain_divergence`)."""
    from ..functions.corpus import domain_divergence

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return domain_divergence(ds)


def embedding_sq8(sf_dir: str) -> pd.DataFrame:
    """INT8 scalar quantization of the embedding corpus (see
    :func:`functions.similarity.sq8_encode`): per-dim min/max train fold,
    exact-integer verification artifacts (code-stream md5, code sum,
    clip counts)."""
    from ..functions.similarity import sq8_encode

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = sq8_encode(ds).to_pandas()
    for c in ("code_sum", "n_clip_lo", "n_clip_hi"):
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values("vec_id").reset_index(drop=True)


_KC_K = 8


def embedding_kcenter(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center coreset selection (`functions/similarity.py:
    kcenter_select`): k=8 maximally-spread exemplars via Gonzalez max-min —
    k broadcast-and-scan rounds, one candidate row per block per round, no
    shuffle. Distances are exact int64 over half-away-quantized coordinates,
    so the unrolled-CTE DuckDB oracle (the k-means/pagerank unroll pattern)
    is hash-exact."""
    from ..functions.similarity import kcenter_select

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = kcenter_select(ds, k=_KC_K)
    for c in ("step", "vec_id", "d2"):
        out[c] = out[c].astype("int64")
    return out


def _kcenter_sql() -> str:
    """Oracle: the same greedy rounds unrolled — d_r = LEAST(d_{r-1},
    dist² to the round-r center), c_{r+1} = argmax d_r (ties: min id)."""
    parts = [
        """
    q AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1024, 0) AS BIGINT) AS qx
      FROM embeddings
    ),
    c0 AS (SELECT MIN(vec_id) AS cid FROM q),
    d0 AS (
      SELECT p.vec_id, SUM((p.qx - c.qx) * (p.qx - c.qx)) AS d2
      FROM q p
      JOIN q c ON c.vec_id = (SELECT cid FROM c0) AND c.i = p.i
      GROUP BY p.vec_id
    ),
    c1 AS (SELECT vec_id AS cid, d2 FROM d0 ORDER BY d2 DESC, vec_id LIMIT 1)"""
    ]
    for r in range(1, _KC_K - 1):
        parts.append(f"""
    d{r} AS (
      SELECT p.vec_id, LEAST(d{r - 1}.d2, SUM((p.qx - c.qx) * (p.qx - c.qx))) AS d2
      FROM q p
      JOIN q c ON c.vec_id = (SELECT cid FROM c{r}) AND c.i = p.i
      JOIN d{r - 1} ON d{r - 1}.vec_id = p.vec_id
      GROUP BY p.vec_id, d{r - 1}.d2
    ),
    c{r + 1} AS (SELECT vec_id AS cid, d2 FROM d{r} ORDER BY d2 DESC, vec_id LIMIT 1)""")
    selects = [
        "SELECT 0 AS step, (SELECT cid FROM c0) AS vec_id, CAST(0 AS BIGINT) AS d2"
    ]
    for r in range(1, _KC_K):
        selects.append(
            f"SELECT {r} AS step, cid AS vec_id, CAST(d2 AS BIGINT) AS d2 FROM c{r}"
        )
    return (
        "WITH" + ",".join(parts) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY step"
    )


def corpus_dsir_sample(sf_dir: str) -> pd.DataFrame:
    """The full DSIR pipeline end-to-end: importance weights →
    Efraimidis-Spirakis weighted resample (the paper's selection step) —
    w = exp(log_weight_micro/10⁶), key = ln(u)/w, top-100. Composes two
    value-checked distributed ops; the whole chain is ONE SQL oracle."""
    from ..functions.corpus import dsir_importance, weighted_sample_es

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    weights = dsir_importance(ds)

    def add_w(t: pa.Table) -> pa.Table:
        lw = t["log_weight_micro"].to_numpy(zero_copy_only=False).astype("float64")
        # explicit schema (drops pandas block metadata): keeps downstream
        # block schemas hashable for Ray's schema deduplication
        return pa.table(
            {"doc_id": _col(t, "doc_id").cast(pa.int64()),
             "log_weight_micro": _col(t, "log_weight_micro").cast(pa.int64()),
             "w": pa.array(np.exp(lw / 1_000_000.0), pa.float64())}
        )

    out = weighted_sample_es(
        weights.map_batches(add_w, batch_format="pyarrow"), k=100, weight_col="w"
    ).to_pandas()
    out["es_key"] = round_half_away(out["es_key"], 6)
    out["log_weight_micro"] = out["log_weight_micro"].astype("int64")
    return out[["doc_id", "log_weight_micro", "es_key"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def embedding_pca_power(sf_dir: str) -> pd.DataFrame:
    """Top-principal-direction projection of every embedding via integer
    power iteration (see :func:`functions.similarity.pca_power_projection`
    — exact int64 Gram fold + truncating power steps, hash-exact oracle)."""
    from ..functions.similarity import pca_power_projection

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = pca_power_projection(ds).to_pandas()
    pdf["proj_units"] = pdf["proj_units"].astype("int64")
    return pdf.sort_values("vec_id").reset_index(drop=True)[["vec_id", "proj_units"]]


def corpus_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023) over the
    documents table: target = the ``lang == 'en'`` slice, features = hashed
    word uni+bigrams in 256 buckets, weight = Σ c_b·λ_b with λ in exact
    int64 micro-units (see :func:`functions.corpus.dsir_importance`)."""
    from ..functions.corpus import dsir_importance

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pdf = dsir_importance(ds).to_pandas()
    pdf["n_grams"] = pdf["n_grams"].astype("int64")
    pdf["log_weight_micro"] = pdf["log_weight_micro"].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_grams", "log_weight_micro"]
    ]


# ---------------------------------------------------------------------------
# TPC-H third batch: the derived-partsupp family (Q2/Q11/Q16/Q20) and the
# remaining join shapes (Q8/Q9/Q12/Q21), adapted to the synth star schema
# (no partsupp table / shipmode / commitdate — partsupp is DERIVED from
# lineitem as the distinct (partkey, suppkey) pairs with supplycost :=
# MIN(line price cents) and availqty := SUM(quantity), both exact int64)
# ---------------------------------------------------------------------------

_PARTSUPP_B = 16  # partkey bucket count shared by the derived-partsupp family


def _partsupp_partial(batch: pa.Table) -> pa.Table:
    """Per-batch derived-partsupp partial: fold a lineitem block to its
    distinct (partkey, suppkey) pairs with (min price cents, sum qty, n)
    BEFORE the exchange — the shuffle carries ≤ distinct-pairs-per-block
    rows, not lineitems. Partials re-fold associatively in the partkey
    bucket (min of mins / sum of sums)."""
    pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype("int64")
    sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype("int64")
    qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype("int64")
    ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
    ep_cents = np.floor(ep * 100 + 0.5).astype("int64")
    df = pd.DataFrame({"partkey": pk, "suppkey": sk, "qty": qty, "ep": ep_cents})
    agg = df.groupby(["partkey", "suppkey"], as_index=False).agg(
        min_ep=("ep", "min"), sum_qty=("qty", "sum"), n=("qty", "size")
    )
    pkv = agg["partkey"].to_numpy(dtype="int64")
    return pa.table(
        {"pbucket": pa.array(pkv & (_PARTSUPP_B - 1)),
         "partkey": pa.array(pkv),
         "suppkey": pa.array(agg["suppkey"].to_numpy(dtype="int64")),
         "min_ep": pa.array(agg["min_ep"].to_numpy(dtype="int64")),
         "sum_qty": pa.array(agg["sum_qty"].to_numpy(dtype="int64")),
         "n": pa.array(agg["n"].to_numpy(dtype="int64"))}
    )


def _fold_partsupp(g: pd.DataFrame) -> pd.DataFrame:
    """Fold bucket-local partials to the final derived partsupp rows."""
    return g.groupby(["partkey", "suppkey"], as_index=False).agg(
        min_ep=("min_ep", "min"), sum_qty=("sum_qty", "sum"), n=("n", "sum")
    )


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape: per-part argmin over a derived dimension + join back.
    The derived partsupp pairs are built from per-batch partials (exchange ∝
    distinct pairs); partkey groups are bucket-complete, so each bucket
    computes its parts' min supplycost AND filters to the achieving
    suppliers in one ``map_groups`` pass — no second shuffle, no join back.
    Part (size/type) and supplier (region) predicates prune via broadcast
    key sets BEFORE the exchange; names attach on the driver to the final
    ≤100 rows."""
    import pyarrow.dataset as pads

    region, ptype, psize_max = "ASIA", "STANDARD", 15

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"],
                filter=(pads.field("r_name") == region)).take_all()
    rkeys = {int(r["r_regionkey"]) for r in reg}
    nat_names = {int(n["n_nationkey"]): n["n_name"] for n in nation
                 if int(n["n_regionkey"]) in rkeys}

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_name", "s_acctbal"]).take_all()
    sup_in = {int(r["s_suppkey"]): (r["s_name"],
                                    int(np.floor(r["s_acctbal"] * 100 + 0.5)),
                                    nat_names[int(r["s_nationkey"])])
              for r in sup if int(r["s_nationkey"]) in nat_names}
    sup_keys = pa.array(sorted(sup_in), pa.int64())

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type", "p_size"],
                 filter=(pads.field("p_type") == ptype)
                 & (pads.field("p_size") <= psize_max)).take_all()
    part_in = {int(r["p_partkey"]): r["p_name"] for r in part}
    part_keys = pa.array(sorted(part_in), pa.int64())

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(_col(batch, "l_partkey").cast(pa.int64()), value_set=part_keys),
            pc.is_in(_col(batch, "l_suppkey").cast(pa.int64()), value_set=sup_keys),
        )
        return _partsupp_partial(batch.filter(keep))

    def argmin_bucket(g: pd.DataFrame) -> pa.Table:
        ps = _fold_partsupp(g)
        if ps.empty:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "supplycost_cents": pa.array([], pa.int64())})
        mins = ps.groupby("partkey")["min_ep"].transform("min")
        w = ps[ps["min_ep"] == mins]  # partkey groups are bucket-complete
        return pa.table(
            {"p_partkey": pa.array(w["partkey"].to_numpy(dtype="int64")),
             "s_suppkey": pa.array(w["suppkey"].to_numpy(dtype="int64")),
             "supplycost_cents": pa.array(w["min_ep"].to_numpy(dtype="int64"))}
        )

    pdf = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(argmin_bucket, batch_format="pandas")
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame(
            {"s_acctbal_cents": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype="object"),
             "n_name": pd.Series([], dtype="object"),
             "p_partkey": pd.Series([], dtype="int64"),
             "p_name": pd.Series([], dtype="object"),
             "s_suppkey": pd.Series([], dtype="int64"),
             "supplycost_cents": pd.Series([], dtype="int64")}
        )
    pdf["s_name"] = pdf["s_suppkey"].map(lambda k: sup_in[int(k)][0])
    pdf["s_acctbal_cents"] = pdf["s_suppkey"].map(lambda k: sup_in[int(k)][1]).astype("int64")
    pdf["n_name"] = pdf["s_suppkey"].map(lambda k: sup_in[int(k)][2])
    pdf["p_name"] = pdf["p_partkey"].map(lambda k: part_in[int(k)])
    pdf = pdf.sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    ).head(100)
    return pdf.reset_index(drop=True)[
        ["s_acctbal_cents", "s_name", "n_name", "p_partkey", "p_name",
         "s_suppkey", "supplycost_cents"]
    ]


def q11_important_stock(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: grouped value with a GLOBAL-fraction HAVING. Stock
    value per part = Σ supplycost × availqty over the nation's derived
    partsupp pairs; a part survives if its value exceeds fraction of the
    corpus total. The per-part values stay a DATASET (part-dimension-sized
    at scale); the global total folds off the same kilobyte partial stream
    via one ``aggregate`` and broadcasts back as TWO plain ints compared in
    exact int64 (``value · 10000 > total``) — no float fraction exists."""
    nation_name = "NATION_3"

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nat_key = next(int(r["n_nationkey"]) for r in nation if r["n_name"] == nation_name)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sup_keys = pa.array(sorted(int(r["s_suppkey"]) for r in sup
                               if int(r["s_nationkey"]) == nat_key), pa.int64())

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(_col(batch, "l_suppkey").cast(pa.int64()), value_set=sup_keys)
        return _partsupp_partial(batch.filter(keep))

    def value_bucket(g: pd.DataFrame) -> pa.Table:
        ps = _fold_partsupp(g)
        ps["value_cents"] = ps["min_ep"] * ps["sum_qty"]
        agg = ps.groupby("partkey", as_index=False)["value_cents"].sum()
        return pa.table(
            {"ps_partkey": pa.array(agg["partkey"].to_numpy(dtype="int64")),
             "value_cents": pa.array(agg["value_cents"].to_numpy(dtype="int64"))}
        )

    per_part = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(value_bucket, batch_format="pandas")
    )
    from ray.data.aggregate import Sum

    total = (per_part.aggregate(Sum("value_cents", alias_name="t")) or {}).get("t") or 0
    total = int(total)

    def keep_important(batch: pa.Table) -> pa.Table:
        v = batch["value_cents"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v * 10000 > total))

    pdf = per_part.map_batches(keep_important, batch_format="pyarrow").to_pandas()
    if pdf.empty:
        return pd.DataFrame({"ps_partkey": pd.Series([], dtype="int64"),
                             "value_cents": pd.Series([], dtype="int64")})
    pdf["value_cents"] = pdf["value_cents"].astype("int64")
    return pdf.sort_values(["value_cents", "ps_partkey"],
                           ascending=[False, True]).reset_index(drop=True)


def q16_supplier_count(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: COUNT DISTINCT suppliers per part attribute triple
    with an exclusion list. Distinct (partkey, suppkey) pairs come from the
    partsupp derivation (per-batch pair dedup bounds the exchange);
    excluded suppliers (negative balance — the 'complaints' analog) and the
    brand exclusion prune BEFORE the shuffle via broadcast sets. The
    attribute triple attaches from a broadcast part projection and the
    distinct count folds in the triple-bucket ``map_groups`` (triples are
    bucket-complete under the partkey hash? no — under the TRIPLE hash, so
    the pairs re-bucket by triple before counting)."""
    excl_brand = "Brand#4"

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]).take_all()
    keep_part = {int(r["p_partkey"]): (r["p_brand"], r["p_type"], int(r["p_size"]))
                 for r in part if r["p_brand"] != excl_brand}
    part_keys = pa.array(sorted(keep_part), pa.int64())
    brands = np.array([keep_part[k][0] for k in sorted(keep_part)])
    types = np.array([keep_part[k][1] for k in sorted(keep_part)])
    sizes = np.array([keep_part[k][2] for k in sorted(keep_part)], dtype="int64")

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).take_all()
    bad_sup = pa.array(sorted(int(r["s_suppkey"]) for r in sup
                              if r["s_acctbal"] < 0.0), pa.int64())

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    B = 32

    def pairs(batch: pa.Table) -> pa.Table:
        pk = _col(batch, "l_partkey").cast(pa.int64())
        sk = _col(batch, "l_suppkey").cast(pa.int64())
        keep = pc.and_(pc.is_in(pk, value_set=part_keys),
                       pc.invert(pc.is_in(sk, value_set=bad_sup)))
        pk, sk = pk.filter(keep), sk.filter(keep)
        idx = pc.index_in(pk, value_set=part_keys).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)
        df = pd.DataFrame(
            {"p_brand": brands[idx], "p_type": types[idx], "p_size": sizes[idx],
             "suppkey": sk.to_numpy(zero_copy_only=False)}
        ).drop_duplicates()  # per-batch pair dedup bounds the exchange
        h = pd.util.hash_pandas_object(
            df[["p_brand", "p_type", "p_size"]], index=False
        ).to_numpy()
        return pa.table(
            {"tbucket": pa.array((h % B).astype("int64")),
             "p_brand": pa.array(df["p_brand"], pa.string()),
             "p_type": pa.array(df["p_type"], pa.string()),
             "p_size": pa.array(df["p_size"].to_numpy(dtype="int64")),
             "suppkey": pa.array(df["suppkey"].to_numpy(dtype="int64"))}
        )

    def count_bucket(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["p_brand", "p_type", "p_size"])["suppkey"].nunique()
        agg = agg.reset_index(name="supplier_cnt")
        return pa.table(
            {"p_brand": pa.array(agg["p_brand"], pa.string()),
             "p_type": pa.array(agg["p_type"], pa.string()),
             "p_size": pa.array(agg["p_size"].to_numpy(dtype="int64")),
             "supplier_cnt": pa.array(agg["supplier_cnt"].to_numpy(dtype="int64"))}
        )

    pdf = (
        li.map_batches(pairs, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pdf.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


def q20_dominant_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape (adapted — no availqty column exists, so 'excess
    stock' becomes 'dominant supplier'): suppliers of one REGION who shipped
    MORE THAN HALF of some name-prefixed part's total 1997 quantity. The
    nested per-part aggregate and the semi-join chain survive: the part
    prefix prunes via a broadcast set BEFORE the shuffle; each partkey
    bucket computes part totals AND per-(part, supplier) sums in one pass
    (bucket-complete), compares ``2·pair > total`` in exact int64, and emits
    the distinct qualifying suppliers; the region membership filter and
    names attach on the driver (dominance must compare against ALL
    suppliers' totals, so the region prune cannot move earlier)."""
    import pyarrow.dataset as pads

    region_name, prefix = "ASIA", "small"
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).take_all()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"],
                filter=(pads.field("r_name") == region_name)).take_all()
    rkeys = {int(r["r_regionkey"]) for r in reg}
    nat_in = {int(n["n_nationkey"]) for n in nation if int(n["n_regionkey"]) in rkeys}
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_name"]).take_all()
    sup_in = {int(r["s_suppkey"]): r["s_name"] for r in sup
              if int(r["s_nationkey"]) in nat_in}
    sup_keys = pa.array(sorted(sup_in), pa.int64())

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).take_all()
    part_keys = pa.array(sorted(int(r["p_partkey"]) for r in part
                                if r["p_name"].startswith(prefix)), pa.int64())

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
               filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi))

    def tag(batch: pa.Table) -> pa.Table:
        pk = _col(batch, "l_partkey").cast(pa.int64())
        keep = pc.is_in(pk, value_set=part_keys)
        batch, pk = batch.filter(keep), pk.filter(keep)
        pkv = pk.to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"partkey": pkv,
             "suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False).astype("int64"),
             "qty": batch["l_quantity"].to_numpy(zero_copy_only=False).astype("int64")}
        )
        agg = df.groupby(["partkey", "suppkey"], as_index=False)["qty"].sum()
        pkv = agg["partkey"].to_numpy(dtype="int64")
        return pa.table(
            {"pbucket": pa.array(pkv & (_PARTSUPP_B - 1)),
             "partkey": pa.array(pkv),
             "suppkey": pa.array(agg["suppkey"].to_numpy(dtype="int64")),
             "qty": pa.array(agg["qty"].to_numpy(dtype="int64"))}
        )

    def dominant_bucket(g: pd.DataFrame) -> pa.Table:
        pair = g.groupby(["partkey", "suppkey"], as_index=False)["qty"].sum()
        total = pair.groupby("partkey")["qty"].transform("sum")
        # dominance compares against ALL suppliers' part total, so the
        # nation prune must NOT touch this stage — it applies on the driver
        # to the (tiny) distinct winner set below
        win = pair[2 * pair["qty"] > total]
        sks = np.unique(win["suppkey"].to_numpy(dtype="int64"))
        return pa.table({"s_suppkey": pa.array(sks)})

    pdf = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dominant_bucket, batch_format="pandas")
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object")})
    sks = sorted({int(k) for k in pdf["s_suppkey"] if int(k) in sup_in})
    return pd.DataFrame(
        {"s_suppkey": pd.Series(sks, dtype="int64"),
         "s_name": [sup_in[k] for k in sks]}
    )


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: national market share by year — a conditional
    fraction AFTER a 6-way join. Part type and supplier nation tag via
    broadcasts; customers prune to the region before their shuffle; orders
    carry the year; the orderkey bucket join emits per-(year, is-target)
    integer partials, so the final frame is years × 2 and the share divides
    exact cent sums with DuckDB-parity rounding."""
    B = 16
    region, ptype, target_nation = "ASIA", "ECONOMY", "NATION_3"
    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    import pyarrow.dataset as pads

    from ..functions.scalar import round_half_away

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"],
                filter=(pads.field("r_name") == region)).take_all()
    rkeys = {int(r["r_regionkey"]) for r in reg}
    region_nat = pa.array(sorted(int(n["n_nationkey"]) for n in nation
                                 if int(n["n_regionkey"]) in rkeys), pa.int64())
    target_key = next(int(n["n_nationkey"]) for n in nation
                      if n["n_name"] == target_nation)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"],
                 filter=(pads.field("p_type") == ptype)).take_all()
    part_keys = pa.array(sorted(int(r["p_partkey"]) for r in part), pa.int64())

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sup_keys = pa.array([int(r["s_suppkey"]) for r in sup], pa.int64())
    sup_target = np.array([int(r["s_nationkey"]) == target_key for r in sup], dtype=bool)

    stage2_schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("o_year", pa.int64()),
         ("target_cents", pa.int64()), ("total_cents", pa.int64()),
         ("side", pa.string())]
    )

    # stage 1: orders[year band] ⋈ customer[region] on custkey
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=(pads.field("o_orderdate") >= lo)
                   & (pads.field("o_orderdate") < hi))

    def tag_cust(batch: pa.Table) -> pa.Table:
        nk = _col(batch, "c_nationkey").cast(pa.int64())
        keep = pc.is_in(nk, value_set=region_nat)
        batch = batch.filter(keep)
        ck = _col(batch, "c_custkey").cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": pa.nulls(n, pa.int64()), "o_year": pa.nulls(n, pa.int64()),
             "side": pa.array(["C"] * n, pa.string())}
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = _col(batch, "o_custkey").cast(pa.int64())
        yr = pc.year(_col(batch, "o_orderdate")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"cbucket": pc.bit_wise_and(ck, B - 1), "custkey": ck,
             "orderkey": _col(batch, "o_orderkey").cast(pa.int64()), "o_year": yr,
             "side": pa.array(["O"] * n, pa.string())}
        )

    def join_cust(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "O"][["custkey", "orderkey", "o_year"]]
        right = g[g["side"] == "C"][["custkey"]]
        j = left.merge(right, on="custkey", how="inner")
        ok = j["orderkey"].to_numpy(dtype="int64", na_value=0)
        n = len(j)
        return pa.table(
            {"obucket": pa.array(ok & (B - 1), pa.int64()),
             "orderkey": pa.array(ok, pa.int64()),
             "o_year": pa.array(j["o_year"].to_numpy(dtype="int64", na_value=0)),
             "target_cents": pa.array(np.zeros(n, dtype="int64")),
             "total_cents": pa.array(np.zeros(n, dtype="int64")),
             "side": pa.array(["O"] * n, pa.string())},
            schema=stage2_schema,
        )

    stage1 = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(join_cust, batch_format="pandas")
    )

    class TagLineitem:
        def __init__(self, pkeys, skeys, starget):
            self.pkeys, self.skeys, self.starget = pkeys, skeys, starget

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = _col(batch, "l_partkey").cast(pa.int64())
            keep = pc.is_in(pk, value_set=self.pkeys)
            batch = batch.filter(keep)
            sk = _col(batch, "l_suppkey").cast(pa.int64())
            sidx = pc.index_in(sk, value_set=self.skeys).to_numpy(zero_copy_only=False)
            is_target = self.starget[sidx.astype(np.int64)]
            ok = _col(batch, "l_orderkey").cast(pa.int64())
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")
            n = len(batch)
            return pa.table(
                {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
                 "o_year": pa.nulls(n, pa.int64()),
                 "target_cents": pa.array(np.where(is_target, rev, 0)),
                 "total_cents": pa.array(rev),
                 "side": pa.array(["L"] * n, pa.string())},
                schema=stage2_schema,
            )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li_tagged = li.map_batches(
        TagLineitem, fn_constructor_args=(part_keys, sup_keys, sup_target),
        batch_format="pyarrow", concurrency=2,
    )

    def join_year(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "target_cents", "total_cents"]]
        right = g[g["side"] == "O"][["orderkey", "o_year"]]
        j = left.merge(right, on="orderkey", how="inner")
        agg = j.groupby("o_year", as_index=False)[["target_cents", "total_cents"]].sum()
        return pa.table(
            {"o_year": pa.array(agg["o_year"].to_numpy(dtype="int64")),
             "target_cents": pa.array(agg["target_cents"].to_numpy(dtype="int64")),
             "total_cents": pa.array(agg["total_cents"].to_numpy(dtype="int64"))}
        )

    grouped = (
        stage1.union(li_tagged)
        .groupby("obucket")
        .map_groups(join_year, batch_format="pandas")
        .to_pandas()
    )
    if grouped.empty:
        return pd.DataFrame(
            {"o_year": pd.Series([], dtype="int64"),
             "target_rev_cents": pd.Series([], dtype="int64"),
             "total_rev_cents": pd.Series([], dtype="int64"),
             "mkt_share": pd.Series([], dtype="float64")}
        )
    out = grouped.groupby("o_year", as_index=False)[["target_cents", "total_cents"]].sum()
    out = out.rename(columns={"target_cents": "target_rev_cents",
                              "total_cents": "total_rev_cents"})
    out["mkt_share"] = [
        round_half_away(t / d, 6) if d else 0.0
        for t, d in zip(out["target_rev_cents"], out["total_rev_cents"])
    ]
    out["target_rev_cents"] = out["target_rev_cents"].astype("int64")
    out["total_rev_cents"] = out["total_rev_cents"].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year) over parts
    matching a name substring. No ``ps_supplycost`` exists, so unit cost is
    DERIVED deterministically as 10% of the part's retail price in cents
    (``floor(p_retailprice·10 + 0.5)``) — profit stays exact int64:
    ``floor(ep·(1−disc)·100+0.5) − qty·unit_cost``. Part (substring mask +
    cost) and supplier (nation) broadcast once per actor; the year arrives
    via the orderkey reduce-side bucket join."""
    B = 16
    needle = "red"

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).take_all()
    part_in = {int(r["p_partkey"]): int(np.floor(r["p_retailprice"] * 10 + 0.5))
               for r in part if needle in r["p_name"]}
    part_keys = pa.array(sorted(part_in), pa.int64())
    part_cost = pa.array([part_in[k] for k in sorted(part_in)], pa.int64())

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sup_keys = pa.array([int(r["s_suppkey"]) for r in sup], pa.int64())
    sup_nat = pa.array([int(r["s_nationkey"]) for r in sup], pa.int64())
    nat_names = {int(r["n_nationkey"]): r["n_name"]
                 for r in _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}

    stage2_schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("natkey", pa.int64()),
         ("o_year", pa.int64()), ("amount_cents", pa.int64()), ("side", pa.string())]
    )

    class TagLineitem:
        def __init__(self, pkeys, pcost, skeys, snat):
            self.pkeys, self.pcost = pkeys, pcost
            self.skeys, self.snat = skeys, snat

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = _col(batch, "l_partkey").cast(pa.int64())
            pidx = pc.index_in(pk, value_set=self.pkeys)
            keep = pc.is_valid(pidx)
            batch, pidx = batch.filter(keep), pidx.filter(keep)
            sk = _col(batch, "l_suppkey").cast(pa.int64())
            sidx = pc.index_in(sk, value_set=self.skeys)
            ok = _col(batch, "l_orderkey").cast(pa.int64())
            ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype("int64")
            cost = self.pcost.take(pidx).to_numpy(zero_copy_only=False)
            amount = (np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64")
                      - qty * cost)
            n = len(batch)
            return pa.table(
                {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
                 "natkey": self.snat.take(sidx), "o_year": pa.nulls(n, pa.int64()),
                 "amount_cents": pa.array(amount),
                 "side": pa.array(["L"] * n, pa.string())},
                schema=stage2_schema,
            )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])
    li_tagged = li.map_batches(
        TagLineitem, fn_constructor_args=(part_keys, part_cost, sup_keys, sup_nat),
        batch_format="pyarrow", concurrency=2,
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "o_orderkey").cast(pa.int64())
        yr = pc.year(_col(batch, "o_orderdate")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "natkey": pa.nulls(n, pa.int64()), "o_year": yr,
             "amount_cents": pa.array(np.zeros(n, dtype="int64")),
             "side": pa.array(["O"] * n, pa.string())},
            schema=stage2_schema,
        )

    def join_profit(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "natkey", "amount_cents"]]
        right = g[g["side"] == "O"][["orderkey", "o_year"]]
        j = left.merge(right, on="orderkey", how="inner")
        agg = j.groupby(["natkey", "o_year"], as_index=False)["amount_cents"].sum()
        return pa.table(
            {"natkey": pa.array(agg["natkey"].to_numpy(dtype="int64")),
             "o_year": pa.array(agg["o_year"].to_numpy(dtype="int64")),
             "amount_cents": pa.array(agg["amount_cents"].to_numpy(dtype="int64"))}
        )

    grouped = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(li_tagged)
        .groupby("obucket")
        .map_groups(join_profit, batch_format="pandas")
        .to_pandas()
    )
    if grouped.empty:
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype="object"),
             "o_year": pd.Series([], dtype="int64"),
             "profit_cents": pd.Series([], dtype="int64")}
        )
    out = grouped.groupby(["natkey", "o_year"], as_index=False)["amount_cents"].sum()
    out["n_name"] = out["natkey"].map(lambda k: nat_names[int(k)])
    out = out.rename(columns={"amount_cents": "profit_cents"})
    out["profit_cents"] = out["profit_cents"].astype("int64")
    return out.sort_values(["n_name", "o_year"], ascending=[True, False]).reset_index(
        drop=True
    )[["n_name", "o_year", "profit_cents"]]


def q12_shipping_priority_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (adapted — no shipmode column, so the group key is
    ``l_linestatus``): two-way conditional counts of high- vs low-priority
    orders whose ship lag lands in a band. The lag computes as exact int64
    microsecond arithmetic (``(shipdate − orderdate) // 86 400 000 000``);
    the orderkey bucket join carries only (orderkey, priority-bit) against
    (orderkey, status, in-band-bit) and each bucket emits two-int partials
    per status."""
    B = 16
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    lag_lo, lag_hi = 30, 90  # days, [lo, hi)
    import pyarrow.dataset as pads

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
                   filter=(pads.field("o_orderdate") >= lo)
                   & (pads.field("o_orderdate") < hi))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_linestatus"])

    schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("high", pa.int64()),
         ("ship_us", pa.int64()), ("order_us", pa.int64()),
         ("l_linestatus", pa.string()), ("side", pa.string())]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "o_orderkey").cast(pa.int64())
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pri, ["1-URGENT", "2-HIGH"]).astype("int64")
        od = _col(batch, "o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "high": pa.array(high), "ship_us": pa.nulls(n, pa.int64()),
             "order_us": od, "l_linestatus": pa.nulls(n, pa.string()),
             "side": pa.array(["O"] * n, pa.string())},
            schema=schema,
        )

    def tag_li(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "l_orderkey").cast(pa.int64())
        sd = _col(batch, "l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "high": pa.nulls(n, pa.int64()), "ship_us": sd,
             "order_us": pa.nulls(n, pa.int64()),
             "l_linestatus": _col(batch, "l_linestatus").cast(pa.string()),
             "side": pa.array(["L"] * n, pa.string())},
            schema=schema,
        )

    US_PER_DAY = 86_400_000_000

    def join_counts(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "ship_us", "l_linestatus"]]
        right = g[g["side"] == "O"][["orderkey", "high", "order_us"]]
        j = left.merge(right, on="orderkey", how="inner")
        lag_days = (j["ship_us"].to_numpy(dtype="int64")
                    - j["order_us"].to_numpy(dtype="int64")) // US_PER_DAY
        j = j[(lag_days >= lag_lo) & (lag_days < lag_hi)]
        agg = j.groupby("l_linestatus", as_index=False)["high"].agg(["sum", "count"])
        return pa.table(
            {"l_linestatus": pa.array(agg["l_linestatus"], pa.string()),
             "high_line_count": pa.array(agg["sum"].to_numpy(dtype="int64")),
             "low_line_count": pa.array(
                 (agg["count"] - agg["sum"]).to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    out = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(li.map_batches(tag_li, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(join_counts, batch_format="pandas")
        .groupby("l_linestatus")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
    )
    pdf = out.to_pandas()
    if pdf.empty:
        return pd.DataFrame(
            {"l_linestatus": pd.Series([], dtype="object"),
             "high_line_count": pd.Series([], dtype="int64"),
             "low_line_count": pd.Series([], dtype="int64")}
        )
    pdf["high_line_count"] = pdf["high_line_count"].astype("int64")
    pdf["low_line_count"] = pdf["low_line_count"].astype("int64")
    return pdf.sort_values("l_linestatus").reset_index(drop=True)


def q21_blamed_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape (adapted — no receipt/commit dates, so 'kept waiting'
    means shipping over a year after the order date): for finished ('F')
    multi-supplier orders where EXACTLY ONE supplier shipped late, count the
    orders blamed on each supplier of one REGION. The EXISTS (another
    supplier on the order) and NOT-EXISTS (another LATE supplier) pair
    resolves inside the orderkey bucket — per-order distinct-supplier and
    distinct-late-supplier counts are two vectorized ``groupby.nunique``
    passes, no self-join blowup. Lateness is exact int64 microsecond math;
    the region filter applies to the blamed supplier AFTER the counts (the
    other-supplier tests must see ALL suppliers)."""
    B = 16
    region_name = "ASIA"
    late_days = 365
    import pyarrow.dataset as pads

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).take_all()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"],
                filter=(pads.field("r_name") == region_name)).take_all()
    rkeys = {int(r["r_regionkey"]) for r in reg}
    nat_in = {int(n["n_nationkey"]) for n in nation if int(n["n_regionkey"]) in rkeys}
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_name"]).take_all()
    sup_in = {int(r["s_suppkey"]): r["s_name"] for r in sup
              if int(r["s_nationkey"]) in nat_in}

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"],
                   filter=(pads.field("o_orderstatus") == "F"))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])

    schema = pa.schema(
        [("obucket", pa.int64()), ("orderkey", pa.int64()), ("suppkey", pa.int64()),
         ("ship_us", pa.int64()), ("order_us", pa.int64()), ("side", pa.string())]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "o_orderkey").cast(pa.int64())
        od = _col(batch, "o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "suppkey": pa.nulls(n, pa.int64()), "ship_us": pa.nulls(n, pa.int64()),
             "order_us": od, "side": pa.array(["O"] * n, pa.string())},
            schema=schema,
        )

    def tag_li(batch: pa.Table) -> pa.Table:
        ok = _col(batch, "l_orderkey").cast(pa.int64())
        sd = _col(batch, "l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        n = len(batch)
        return pa.table(
            {"obucket": pc.bit_wise_and(ok, B - 1), "orderkey": ok,
             "suppkey": _col(batch, "l_suppkey").cast(pa.int64()), "ship_us": sd,
             "order_us": pa.nulls(n, pa.int64()),
             "side": pa.array(["L"] * n, pa.string())},
            schema=schema,
        )

    US_PER_DAY = 86_400_000_000

    def blame_bucket(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == "L"][["orderkey", "suppkey", "ship_us"]]
        right = g[g["side"] == "O"][["orderkey", "order_us"]]
        j = left.merge(right, on="orderkey", how="inner")
        if j.empty:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "numwait": pa.array([], pa.int64())})
        lag = (j["ship_us"].to_numpy(dtype="int64")
               - j["order_us"].to_numpy(dtype="int64")) // US_PER_DAY
        j = j.assign(late=lag >= late_days)
        nsupp = j.groupby("orderkey")["suppkey"].nunique()
        late = j[j["late"]]
        nlate = late.groupby("orderkey")["suppkey"].nunique()
        blamed_orders = nlate[(nlate == 1)].index.intersection(
            nsupp[nsupp > 1].index
        )
        blamed = late[late["orderkey"].isin(blamed_orders)][
            ["orderkey", "suppkey"]
        ].drop_duplicates()
        agg = blamed.groupby("suppkey").size().reset_index(name="numwait")
        return pa.table(
            {"s_suppkey": pa.array(agg["suppkey"].to_numpy(dtype="int64")),
             "numwait": pa.array(agg["numwait"].to_numpy(dtype="int64"))}
        )

    from ray.data.aggregate import Sum

    out = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(li.map_batches(tag_li, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(blame_bucket, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )
    pdf = out.to_pandas()
    pdf = pdf[pdf["s_suppkey"].map(lambda k: int(k) in sup_in)]
    if pdf.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype="object"),
             "numwait": pd.Series([], dtype="int64")}
        )
    pdf = pdf.copy()
    pdf["s_name"] = pdf["s_suppkey"].map(lambda k: sup_in[int(k)])
    pdf["numwait"] = pdf["numwait"].astype("int64")
    return pdf.sort_values(["numwait", "s_name"], ascending=[False, True]).head(
        100
    ).reset_index(drop=True)[["s_suppkey", "s_name", "numwait"]]


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (streaming rate-shift alarm)
# ---------------------------------------------------------------------------


def events_cusum(sf_dir: str) -> pd.DataFrame:
    """One-sided CUSUM rate-shift detector per event type over hourly
    counts: S_t = max(0, S_{t−1} + x_t − k) with drift k = ⌈mean hourly
    count⌉ (integer) and alarm at S_t > 3k — the streaming changepoint
    sibling of ``events_anomaly``'s MAD outliers. All-integer, so SQL
    agrees exactly.

    The reset-max recursion is NOT a window aggregate, but the identity
    S_t = P_t − min_{i≤t} P_i (P = prefix sum of x−k) turns it into two
    plain prefix scans — the same distributed-prefix shape as
    ``events_peak_concurrency``; the hourly count table itself is bounded
    (types × hours), folded from per-batch partials."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    HR = 3_600_000_000

    def partials(b: pd.DataFrame) -> pa.Table:
        hr = (b["ts"].astype("datetime64[us]").astype(np.int64) // HR).to_numpy()
        vc = pd.DataFrame({"event_type": b["event_type"].to_numpy(), "hr": hr}).value_counts()
        idx = vc.index.to_frame(index=False)
        return pa.table(
            {"event_type": pa.array(idx["event_type"].astype(str), pa.string()),
             "hr": pa.array(idx["hr"].to_numpy(dtype="int64")),
             "n": pa.array(vc.to_numpy(dtype="int64"))}
        )

    hourly = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: types × hours
    )
    rows = []
    for et, g in hourly.groupby("event_type"):
        g = g.sort_values("hr")
        # dense hour spine: silent hours count 0 (a detector that skips
        # empty hours would never see a rate DROP window; keep the spine)
        hrs = np.arange(g["hr"].min(), g["hr"].max() + 1, dtype=np.int64)
        x = np.zeros(len(hrs), dtype=np.int64)
        x[(g["hr"].to_numpy() - hrs[0]).astype(int)] = g["n"].to_numpy()
        # ceil mean via (s + n - 1) // n: positive operands, so numpy floor
        # and DuckDB trunc division agree
        k = int((x.sum() + len(hrs) - 1) // len(hrs))
        p = np.cumsum(x - k)
        # S_t = P_t - min(0, min_{i<=t} P_i)  (the pre-sum state S_0 = 0)
        pmin = np.minimum.accumulate(np.minimum(p, 0))
        s = p - pmin
        alarm = s > 3 * k
        for h, xs, ss, al in zip(hrs[alarm], x[alarm], s[alarm], alarm[alarm]):
            rows.append((et, int(h), int(xs), int(ss), k))
    out = pd.DataFrame(rows, columns=["event_type", "hr", "n", "cusum", "k"])
    return out.sort_values(["event_type", "hr"]).reset_index(drop=True)


_CUSUM_SQL = """
    WITH h AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS n
      FROM events GROUP BY event_type, hr
    ), spine AS (
      SELECT event_type, unnest(generate_series(mn, mx)) AS hr
      FROM (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx FROM h GROUP BY event_type)
    ), dense AS (
      SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n
      FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hr = s.hr
    ), kk AS (
      SELECT event_type,
             CAST((SUM(n) + count(*) - 1) // count(*) AS BIGINT) AS k
      FROM dense GROUP BY event_type
    ), pre1 AS (
      SELECT d.event_type, d.hr, d.n, kk.k,
             SUM(d.n - kk.k) OVER (PARTITION BY d.event_type ORDER BY d.hr
                                   ROWS UNBOUNDED PRECEDING) AS p
      FROM dense d JOIN kk USING (event_type)
    ), pre AS (
      SELECT event_type, hr, n, k, p,
             LEAST(MIN(p) OVER (PARTITION BY event_type ORDER BY hr
                                ROWS UNBOUNDED PRECEDING), 0) AS pmin
      FROM pre1
    )
    SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(n AS BIGINT) AS n,
           CAST(p - pmin AS BIGINT) AS cusum, CAST(k AS BIGINT) AS k
    FROM pre WHERE p - pmin > 3 * k
    ORDER BY event_type, hr
    """


# ---------------------------------------------------------------------------
# classifier evaluation: language-ID confusion matrix
# ---------------------------------------------------------------------------


def text_langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Classifier evaluation against labels: the language-ID heuristic's
    confusion matrix vs the corpus's labeled ``lang`` column — (actual,
    predicted, n) cells plus per-actual recall (half-away rounding). The
    eval itself is a per-batch predict + register-sized (actual, pred) fold;
    the oracle re-derives the predictions with the generated profile SQL."""
    from ray.data.aggregate import Sum

    from ..functions.text import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    stage = LangIdStage()

    def cells(b: pd.DataFrame) -> pa.Table:
        pred = stage(b[["doc_id", "text"]])["pred_lang"]
        g = pd.DataFrame({"actual": b["lang"].to_numpy(), "predicted": pred.to_numpy()})
        vc = g.value_counts()
        idx = vc.index.to_frame(index=False)
        return pa.table(
            {"actual": pa.array(idx["actual"].astype(str), pa.string()),
             "predicted": pa.array(idx["predicted"].astype(str), pa.string()),
             "n": pa.array(vc.to_numpy(dtype="int64"))}
        )

    out = (
        ds.map_batches(cells, batch_format="pandas")
        .groupby(["actual", "predicted"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    tot = out.groupby("actual")["n"].transform("sum")
    out["recall"] = _rha(
        np.where(out["actual"] == out["predicted"], out["n"], 0) / tot.to_numpy(), 6
    )
    out.loc[out["actual"] != out["predicted"], "recall"] = 0.0
    return out.sort_values(["actual", "predicted"]).reset_index(drop=True)[
        ["actual", "predicted", "n", "recall"]
    ]


def _langid_confusion_sql() -> str:
    pred = _langid_sql().replace("ORDER BY doc_id", "")
    return f"""
    WITH pred AS ({pred}),
    cells AS (
      SELECT d.lang AS actual, p.pred_lang AS predicted, count(*) AS n
      FROM documents d JOIN pred p USING (doc_id)
      GROUP BY d.lang, p.pred_lang
    )
    SELECT actual, predicted, CAST(n AS BIGINT) AS n,
           CASE WHEN actual = predicted
                THEN ROUND(CAST(n AS DOUBLE)
                           / SUM(n) OVER (PARTITION BY actual), 6)
                ELSE 0.0 END AS recall
    FROM cells ORDER BY actual, predicted
    """


# ---------------------------------------------------------------------------
# peak concurrency (interval sweep-line with distributed prefix sum)
# ---------------------------------------------------------------------------


def events_peak_concurrency(sf_dir: str) -> pd.DataFrame:
    """Peak concurrent sessions (capacity planning): sessions are the 30-min
    -gap windows of ``sessionize``; concurrency is the classic sweep-line
    (+1 at start, −1 just after end) and the answer is the max running sum
    plus the first microsecond it is reached.

    Distributed prefix WITHOUT a global sort: boundaries bucket by time
    range; each bucket reports (Σd, local max prefix, first t at that max)
    from ONE vectorized lexsort+cumsum; the driver folds bucket offsets —
    the global max prefix is max(offset + local max), attained first in the
    earliest bucket that reaches it (the epoch_shuffle prefix-sum shape
    applied to a sweep-line)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    GAP = 1_800_000_000  # 30 min in µs
    W = 21_600_000_000  # 6 h time-range buckets

    def intervals(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "ts" not in g.columns:
            return pa.table({"t": pa.array([], pa.int64()), "d": pa.array([], pa.int64())})
        g = g.assign(us=g["ts"].astype("datetime64[us]").astype(np.int64))
        g = g.sort_values(["user_id", "us", "event_id"])
        us = g["us"].to_numpy()
        uid = g["user_id"].to_numpy()
        new = np.r_[True, (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > GAP)]
        sid = np.cumsum(new) - 1
        a = np.minimum.reduceat(us, np.flatnonzero(new))
        b = np.maximum.reduceat(us, np.flatnonzero(new))
        del sid
        return pa.table(
            {"t": pa.array(np.r_[a, b + 1]),
             "d": pa.array(np.r_[np.ones(len(a), np.int64), -np.ones(len(b), np.int64)])}
        )

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "t" not in g.columns:
            return pa.table({"tb": pa.array([], pa.int64()), "total": pa.array([], pa.int64()),
                             "maxp": pa.array([], pa.int64()), "t_first": pa.array([], pa.int64()),
                             "n_starts": pa.array([], pa.int64())})
        t = g["t"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        order = np.lexsort((-d, t))  # by t asc, then +1 before -1 (SQL: t, d DESC)
        t, d = t[order], d[order]
        run = np.cumsum(d)
        pos = int(np.argmax(run))
        return pa.table(
            {"tb": pa.array([int(t[0] // W)], pa.int64()),
             "total": pa.array([int(d.sum())], pa.int64()),
             "maxp": pa.array([int(run[pos])], pa.int64()),
             "t_first": pa.array([int(t[pos])], pa.int64()),
             "n_starts": pa.array([int((d > 0).sum())], pa.int64())}
        )

    # sessions need per-user co-location first, then boundaries re-bucket by time
    bounds = (
        ds.map_batches(
            lambda b: b.append_column(
                "ub", pc.bit_wise_and(_col(b, "user_id").cast(pa.int64()), 31)
            ),
            batch_format="pyarrow",
        )
        .groupby("ub")
        .map_groups(intervals, batch_format="pandas")
        .map_batches(
            lambda b: b.append_column(
                "tb", pc.divide(_col(b, "t"), pa.scalar(W, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .groupby("tb")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()  # bounded: one row per time bucket
        .sort_values("tb")
        .reset_index(drop=True)
    )
    offsets = np.r_[0, bounds["total"].cumsum().to_numpy()[:-1]]
    glob = offsets + bounds["maxp"].to_numpy()
    peak = int(glob.max())
    first_idx = int(np.argmax(glob == peak))
    return pd.DataFrame(
        {"n_sessions": [int(bounds["n_starts"].sum())],
         "peak_concurrency": [peak],
         "peak_first_us": [int(bounds["t_first"].iloc[first_idx])]}
    )


_PEAK_CONCURRENCY_SQL = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ), lagged AS (
      SELECT user_id, us,
             CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    ), iv AS (
      SELECT MIN(us) AS a, MAX(us) AS b FROM sess GROUP BY user_id, sid
    ), ev AS (
      SELECT a AS t, 1 AS d FROM iv UNION ALL SELECT b + 1, -1 FROM iv
    ), c AS (
      SELECT t, SUM(d) OVER (ORDER BY t, d DESC ROWS UNBOUNDED PRECEDING) AS conc
      FROM ev
    )
    SELECT CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_sessions,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(MIN(t) FILTER (WHERE conc = (SELECT MAX(conc) FROM c)) AS BIGINT)
             AS peak_first_us
    FROM c
    """


# ---------------------------------------------------------------------------
# deterministic A/B assignment + conversion report (experimentation)
# ---------------------------------------------------------------------------


def events_abtest(sf_dir: str) -> pd.DataFrame:
    """Experimentation readout over a deterministic hash assignment: users
    split 50/50 by ``md5(user_id:17) % 2`` (pure function of the id — no
    RNG, stable across reruns and growth), then per variant: exposed users,
    converting users (≥1 purchase), total purchases, purchase cents, and
    the conversion rate (half-away rounding). The assignment is the same
    ``_id_hashes`` convention every sampler here uses, so the SQL oracle
    re-derives it with ``md5_number_upper``.

    Shape: per-batch (user, variant, purchases, cents) partials dedupe the
    exposure per user via a user-bucket fold (distinct users additive
    across buckets), so the exchange carries one row per (user, batch) at
    most — never the event stream."""
    from ray.data.aggregate import Sum

    from ..functions.corpus import _id_hashes

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partials(b: pa.Table) -> pa.Table:
        uid = _col(b, "user_id")
        et = b["event_type"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        purch = et == "purchase"
        df = pd.DataFrame(
            {"user_id": uid.to_numpy(zero_copy_only=False),
             "n_purch": purch.astype(np.int64),
             "cents": np.where(purch, cents, 0)}
        ).groupby("user_id", as_index=False).sum()
        return pa.table(
            {"user_id": pa.array(df["user_id"].to_numpy(dtype="int64")),
             "ub": pa.array(df["user_id"].to_numpy(dtype="int64") & 31),
             "n_purch": pa.array(df["n_purch"].to_numpy(dtype="int64")),
             "cents": pa.array(df["cents"].to_numpy(dtype="int64"))}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "user_id" not in g.columns:
            return pa.table({"variant": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64()),
                             "n_converting": pa.array([], pa.int64()),
                             "n_purchases": pa.array([], pa.int64()),
                             "purchase_cents": pa.array([], pa.int64())})
        u = g.groupby("user_id", as_index=False).sum()
        variant = (_id_hashes(pa.array(u["user_id"].to_numpy(dtype="int64")), 17) % 2).astype(np.int64)
        d = pd.DataFrame(
            {"variant": variant, "n_users": 1,
             "n_converting": (u["n_purch"] > 0).astype(np.int64),
             "n_purchases": u["n_purch"], "purchase_cents": u["cents"]}
        ).groupby("variant", as_index=False).sum()
        return pa.table({c: pa.array(d[c].to_numpy(dtype="int64")) for c in d.columns})

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(fold, batch_format="pandas")
        .groupby("variant")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("n_converting", alias_name="n_converting"),
                   Sum("n_purchases", alias_name="n_purchases"),
                   Sum("purchase_cents", alias_name="purchase_cents"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    out["conversion_rate"] = _rha(out["n_converting"].to_numpy() / out["n_users"].to_numpy(), 6)
    return out.sort_values("variant").reset_index(drop=True)[
        ["variant", "n_users", "n_converting", "n_purchases", "purchase_cents",
         "conversion_rate"]
    ]


_ABTEST_SQL = """
    WITH u AS (
      SELECT user_id,
             CAST(md5_number_upper(CAST(user_id AS VARCHAR) || ':17') % 2 AS BIGINT)
               AS variant,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purch,
             COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      FILTER (WHERE event_type = 'purchase'), 0) AS cents
      FROM events GROUP BY user_id
    )
    SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE n_purch > 0) AS BIGINT) AS n_converting,
           CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS purchase_cents,
           ROUND(CAST(count(*) FILTER (WHERE n_purch > 0) AS DOUBLE) / count(*), 6)
             AS conversion_rate
    FROM u GROUP BY variant ORDER BY variant
    """


# ---------------------------------------------------------------------------
# dwell time between consecutive events (transition timing)
# ---------------------------------------------------------------------------


def events_dwell_time(sf_dir: str) -> pd.DataFrame:
    """Dwell time per behavior transition: for each (from_type → to_type)
    pair, how long users sit between the two events — the timing dimension
    the Markov transition matrix drops. Exact contract: count, total dwell
    µs (int64 sum) and mean dwell µs as integer division (non-negative, so
    floor == trunc and DuckDB agrees bit-for-bit).

    Same coarse user-bucket layout as the other per-key scans: one
    vectorized sort + shift per bucket, (from, to, n, sum) partials,
    register-sized pair fold."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    B = 32

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _col(batch, "user_id")
        return batch.append_column("part", pc.bit_wise_and(uid.cast(pa.int64()), B - 1))

    def dwell(g: pd.DataFrame) -> pa.Table:
        # event-TIME order (ties broken by id): guarantees dwell_us >= 0, so
        # the integer mean's floor == trunc and DuckDB // agrees exactly
        g = g.assign(ts_us=g["ts"].astype("datetime64[us]").astype(np.int64))
        g = g.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
        same = g["user_id"].eq(g["user_id"].shift(1)).to_numpy()
        ts = g["ts_us"].to_numpy()
        et = g["event_type"].to_numpy()
        d = pd.DataFrame(
            {"from_type": np.r_[["-"], et[:-1]][same], "to_type": et[same],
             "dwell_us": (ts - np.r_[ts[:1], ts[:-1]])[same]}
        )
        agg = d.groupby(["from_type", "to_type"], sort=False)["dwell_us"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {"from_type": pa.array(agg["from_type"].astype(str), pa.string()),
             "to_type": pa.array(agg["to_type"].astype(str), pa.string()),
             "n": pa.array(agg["size"].to_numpy(dtype="int64")),
             "sum_dwell_us": pa.array(agg["sum"].to_numpy(dtype="int64"))}
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dwell, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_dwell_us", alias_name="sum_dwell_us"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_dwell_us"] = out["sum_dwell_us"].astype("int64")
    out["mean_dwell_us"] = (out["sum_dwell_us"] // out["n"]).astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)[
        ["from_type", "to_type", "n", "sum_dwell_us", "mean_dwell_us"]
    ]


_DWELL_SQL = """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             LAG(event_type) OVER w AS p_type,
             LAG(epoch_us(ts)) OVER w AS p_us
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), d AS (
      SELECT p_type AS from_type, event_type AS to_type, us - p_us AS dwell_us
      FROM t WHERE p_type IS NOT NULL
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(dwell_us) AS BIGINT) AS sum_dwell_us,
           CAST(SUM(dwell_us) // count(*) AS BIGINT) AS mean_dwell_us
    FROM d GROUP BY from_type, to_type ORDER BY from_type, to_type
    """


# ---------------------------------------------------------------------------
# Z-order clustering layout (multi-dimensional data skipping)
# ---------------------------------------------------------------------------


def _morton_spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of x so bit k lands at position 2k (the
    classic Morton bit-twiddle, vectorized int64)."""
    x = x.astype(np.int64) & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def events_zorder(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) clustering layout — the OPTIMIZE ZORDER analog for
    multi-dimensional data skipping: events key on the bit-interleave of
    (user_id, value-cents), and the per-z-range report (count + min/max of
    BOTH dimensions) exhibits the property the layout buys — every z-range
    bucket bounds user AND value simultaneously, so a predicate on either
    column can skip buckets by zone map alone (a single-column sort bounds
    only itself).

    Vectorized Morton spread per batch (five mask-shift ops, no loops);
    per-batch partial (bucket, n, mins, maxes) rows make the exchange
    bucket-sized."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partials(b: pa.Table) -> pa.Table:
        uid = _col(b, "user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        z = (_morton_spread16(uid) << 1) | _morton_spread16(cents)
        g = pd.DataFrame({"zb": z >> 26, "u": uid & 0xFFFF, "c": cents & 0xFFFF}).groupby(
            "zb", sort=False
        ).agg(n=("u", "size"), u_min=("u", "min"), u_max=("u", "max"),
              c_min=("c", "min"), c_max=("c", "max")).reset_index()
        return pa.table({k: pa.array(g[k].to_numpy(dtype="int64"))
                         for k in ("zb", "n", "u_min", "u_max", "c_min", "c_max")})

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("zb")
        .aggregate(Sum("n", alias_name="n"),
                   Min("u_min", alias_name="u_min"), Max("u_max", alias_name="u_max"),
                   Min("c_min", alias_name="c_min"), Max("c_max", alias_name="c_max"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("zb").reset_index(drop=True)[
        ["zb", "n", "u_min", "u_max", "c_min", "c_max"]
    ]


_ZORDER_SQL = """
    WITH z AS (
      SELECT (user_id % 65536) AS u,
             (CAST(floor(value * 100 + 0.5) AS BIGINT) % 65536) AS c
      FROM events
    ), zk AS (
      -- NB: DuckDB's // against a DOUBLE divisor (2**k is DOUBLE) is plain
      -- division, not floor — the powers must be BIGINT
      SELECT u, c,
             list_sum([((u // CAST(2**k AS BIGINT)) % 2) * CAST(4**k AS BIGINT) * 2
                       + ((c // CAST(2**k AS BIGINT)) % 2) * CAST(4**k AS BIGINT)
                       FOR k IN range(0, 16)]) AS zval
      FROM z
    )
    SELECT CAST(zval // 67108864 AS BIGINT) AS zb,
           CAST(count(*) AS BIGINT) AS n,
           CAST(MIN(u) AS BIGINT) AS u_min, CAST(MAX(u) AS BIGINT) AS u_max,
           CAST(MIN(c) AS BIGINT) AS c_min, CAST(MAX(c) AS BIGINT) AS c_max
    FROM zk GROUP BY zb ORDER BY zb
    """


# ---------------------------------------------------------------------------
# overlapping chunker (RAG prep)
# ---------------------------------------------------------------------------


def corpus_rag_chunks(sf_dir: str) -> pd.DataFrame:
    """Sliding-window chunking with overlap — the retrieval-indexing prep
    (chunk = 16 tokens, stride = 12, so consecutive chunks share 4 tokens).
    Embarrassingly parallel: each batch explodes its documents into chunk
    rows with ONE concatenated-token gather (doc offsets + repeat/arange —
    no per-doc Python beyond the tokenizer), emitting (doc_id, chunk_idx,
    chunk token count, first/last token) so the oracle can value-check the
    chunk geometry AND content anchors."""
    import re

    pat = re.compile(r"[a-z0-9_]+")
    CH, ST = 16, 12
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(b: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "chunk_idx": pa.array([], pa.int64()),
             "n_tokens_chunk": pa.array([], pa.int64()),
             "first_tok": pa.array([], pa.string()), "last_tok": pa.array([], pa.string())}
        )
        if len(b) == 0:
            return empty
        toks = b["text"].fillna("").str.lower().str.findall(pat)
        n = toks.str.len().to_numpy(dtype=np.int64)
        keep = n > 0
        if not keep.any():
            return empty
        toks, n = toks[keep], n[keep]
        ids = b["doc_id"].to_numpy(dtype=np.int64)[keep]
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        offs = np.r_[0, np.cumsum(n)]
        n_chunks = (n - 1) // ST + 1
        doc_rep = np.repeat(np.arange(len(n)), n_chunks)
        k = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(n_chunks)[:-1]], n_chunks
        )
        start = k * ST
        ntc = np.minimum(CH, n[doc_rep] - start)
        first = flat[offs[doc_rep] + start]
        last = flat[offs[doc_rep] + start + ntc - 1]
        return pa.table(
            {"doc_id": pa.array(ids[doc_rep]), "chunk_idx": pa.array(k),
             "n_tokens_chunk": pa.array(ntc),
             "first_tok": pa.array(first, pa.string()),
             "last_tok": pa.array(last, pa.string())}
        )

    out = ds.map_batches(chunks, batch_format="pandas")
    return out.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


_RAG_CHUNKS_SQL = r"""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+') AS ws
      FROM documents
    ), n AS (
      SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) > 0
    ), ch AS (
      SELECT doc_id, ws, n, unnest(generate_series(0, (n - 1) // 12)) AS k FROM n
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(k AS BIGINT) AS chunk_idx,
           CAST(LEAST(16, n - 12 * k) AS BIGINT) AS n_tokens_chunk,
           ws[12 * k + 1] AS first_tok,
           ws[12 * k + LEAST(16, n - 12 * k)] AS last_tok
    FROM ch ORDER BY doc_id, chunk_idx
    """


# ---------------------------------------------------------------------------
# hopping-window COUNT DISTINCT (overlap-replicated dedup)
# ---------------------------------------------------------------------------


def events_window_distinct(sf_dir: str) -> pd.DataFrame:
    """Distinct users per 2-hour window hopping hourly — the combination
    plain windowed counts dodge: DISTINCT cannot pre-aggregate across
    overlapping windows, so each event REPLICATES into its ⌈size/hop⌉=2
    windows first, then (window, type, user) triples dedup per batch and
    fold in user-hash coarse buckets where distinct counts are ADDITIVE
    (bucket-disjoint users); the final fold is bounded by windows × types ×
    buckets, and the report by windows × types."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])
    HR = 3_600_000_000  # µs

    def replicate(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:  # typed empty (block-schema hygiene)
            return pa.table({"w0": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "user_id": pa.array([], pa.int64()),
                             "ub": pa.array([], pa.int64())})
        hr = (b["ts"].astype("datetime64[us]").astype(np.int64) // HR).to_numpy()
        uid = b["user_id"].to_numpy(dtype=np.int64)
        et = b["event_type"].to_numpy()
        df = pd.DataFrame(
            {"w0": np.r_[hr, hr - 1], "event_type": np.r_[et, et],
             "user_id": np.r_[uid, uid]}
        ).drop_duplicates()
        return pa.table(
            {"w0": pa.array(df["w0"].to_numpy(dtype="int64")),
             "event_type": pa.array(df["event_type"].astype(str)),
             "user_id": pa.array(df["user_id"].to_numpy(dtype="int64")),
             "ub": pa.array(df["user_id"].to_numpy(dtype="int64") & 31)}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "w0" not in g.columns:
            return pa.table({"w0": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        u = g.groupby(["w0", "event_type"], sort=False)["user_id"].nunique()
        idx = u.index.to_frame(index=False)
        return pa.table(
            {"w0": pa.array(idx["w0"].to_numpy(dtype="int64")),
             "event_type": pa.array(idx["event_type"].astype(str)),
             "n_users": pa.array(u.to_numpy(dtype="int64"))}
        )

    folded = (
        ds.map_batches(replicate, batch_format="pandas")
        .groupby("ub")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # bounded: windows × types × buckets
    )
    out = (
        folded.groupby(["w0", "event_type"], as_index=False)["n_users"].sum()
        .rename(columns={"w0": "window_start_hr"})
    )
    out["window_start_hr"] = out["window_start_hr"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["window_start_hr", "event_type"]).reset_index(drop=True)


_WINDOW_DISTINCT_SQL = """
    WITH h AS (
      SELECT event_type, user_id, epoch_us(ts) // 3600000000 AS hr FROM events
    ), w AS (
      SELECT event_type, user_id, hr AS w0 FROM h
      UNION ALL
      SELECT event_type, user_id, hr - 1 FROM h
    )
    SELECT CAST(w0 AS BIGINT) AS window_start_hr, event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w GROUP BY w0, event_type ORDER BY w0, event_type
    """


# ---------------------------------------------------------------------------
# skip-gram pair counts (word2vec training prep)
# ---------------------------------------------------------------------------


def text_skipgrams(sf_dir: str) -> pd.DataFrame:
    """Skip-gram (center, context) pair counts with window ±2 — the
    embedding-training data-prep stage (word2vec/GloVe input). Per batch,
    tokens explode ONCE with document boundaries; pairs at offsets 1 and 2
    come from two vectorized shifted compares (no per-token loops), fold to
    a pair-count partial (vocabulary²-bounded, not token-stream-bounded),
    and one single-key groupby over 'center context' strings aggregates;
    the driver sorts the bounded pair vocabulary and keeps the top 200."""
    import re

    from ray.data.aggregate import Sum

    pat = re.compile(r"[a-z0-9_]+")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_partials(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas().fillna("")
        toks = texts.str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        if ex.empty:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w = ex.to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        parts = []
        for d in (1, 2):
            if len(w) <= d:
                continue
            same = doc[d:] == doc[:-d]
            a, bb = w[:-d][same], w[d:][same]
            parts.append(pd.DataFrame({"c": a, "x": bb}))
            parts.append(pd.DataFrame({"c": bb, "x": a}))
        if not parts:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        allp = pd.concat(parts, ignore_index=True)
        vc = (allp["c"] + " " + allp["x"]).value_counts()
        return pa.table({"pair": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                         "n": pa.array(vc.to_numpy(dtype="int64"))})

    folded = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    folded = folded[folded["n"] >= 5].copy()
    sp = folded["pair"].str.split(" ", n=1, expand=True)
    folded["center"], folded["context"] = sp[0], sp[1]
    folded["n"] = folded["n"].astype("int64")
    folded = folded.sort_values(["n", "center", "context"],
                                ascending=[False, True, True]).head(200)
    return folded.reset_index(drop=True)[["center", "context", "n"]]


_SKIPGRAM_SQL = r"""
    WITH d AS (
      SELECT regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+') AS ws
      FROM documents
    ),
    p1 AS (
      SELECT unnest(CASE WHEN len(ws) < 2 THEN []
                    ELSE [ws[i] || ' ' || ws[i+1]
                          FOR i IN generate_series(1, len(ws) - 1)] END) AS pr
      FROM d
    ),
    p2 AS (
      SELECT unnest(CASE WHEN len(ws) < 3 THEN []
                    ELSE [ws[i] || ' ' || ws[i+2]
                          FOR i IN generate_series(1, len(ws) - 2)] END) AS pr
      FROM d
    ),
    dirpairs AS (SELECT pr FROM p1 UNION ALL SELECT pr FROM p2),
    sym AS (
      SELECT split_part(pr, ' ', 1) AS center, split_part(pr, ' ', 2) AS context
      FROM dirpairs
      UNION ALL
      SELECT split_part(pr, ' ', 2), split_part(pr, ' ', 1) FROM dirpairs
    ),
    cnt AS (SELECT center, context, count(*) AS n FROM sym GROUP BY center, context)
    SELECT center, context, CAST(n AS BIGINT) AS n
    FROM cnt WHERE n >= 5
    ORDER BY n DESC, center, context LIMIT 200
    """


# ---------------------------------------------------------------------------
# per-source duplication-rate report
# ---------------------------------------------------------------------------


def corpus_dup_stats(sf_dir: str) -> pd.DataFrame:
    """Duplication rate per source — the curation dashboard row deciding
    which feeds are worth ingesting. Exchange-pruned exact distinct: each
    batch ships per-(source, content-md5) DEDUPED pairs only (the text
    stays behind), pairs fold per md5-prefix coarse bucket with one
    vectorized nunique per source (bucket-disjoint hashes make the
    per-bucket distinct counts additive), and the per-source report is
    register-sized. Distinct-by-md5 equals distinct-by-text up to md5
    collisions (the established corpus-family contract)."""
    from ray.data.aggregate import Sum

    from ..functions.dedup import add_content_hash

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def pair_partials(b: pa.Table) -> pa.Table:
        if len(b) == 0:  # typed empty (block-schema hygiene)
            return pa.table({"source": pa.array([], pa.string()),
                             "md5": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "hb": pa.array([], pa.int64())})
        h = add_content_hash(b)
        df = pd.DataFrame({"source": h["source"].to_pandas(),
                           "md5": h["content_md5"].to_pandas()})
        n_docs = df.groupby("source", sort=False).size()
        pairs = df.drop_duplicates()
        hb = pd.Series(
            pd.util.hash_array(pairs["md5"].to_numpy(dtype=object), categorize=False) & 31
        ).astype("int64")
        return pa.table(
            {"source": pa.array(pd.concat([pd.Series(n_docs.index), pairs["source"]],
                                           ignore_index=True).astype(str)),
             "md5": pa.array(pd.concat([pd.Series([""] * len(n_docs)), pairs["md5"]],
                                        ignore_index=True).astype(str)),
             "n_docs": pa.array(np.r_[n_docs.to_numpy(dtype="int64"),
                                      np.zeros(len(pairs), dtype=np.int64)]),
             "hb": pa.array(np.r_[np.full(len(n_docs), -1, dtype=np.int64),
                                  hb.to_numpy(dtype="int64")])}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "md5" not in g.columns:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_unique": pa.array([], pa.int64())})
        if int(g["hb"].iloc[0]) == -1:  # the doc-count partial rows
            s = g.groupby("source", sort=False)["n_docs"].sum()
            return pa.table({"source": pa.array(s.index.astype(str)),
                             "n_docs": pa.array(s.to_numpy(dtype="int64")),
                             "n_unique": pa.array(np.zeros(len(s), dtype=np.int64))})
        u = g.groupby("source", sort=False)["md5"].nunique()
        return pa.table({"source": pa.array(u.index.astype(str)),
                         "n_docs": pa.array(np.zeros(len(u), dtype=np.int64)),
                         "n_unique": pa.array(u.to_numpy(dtype="int64"))})

    out = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(fold, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_unique", alias_name="n_unique"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_unique"] = out["n_unique"].astype("int64")
    out["dup_rate"] = _rha(1.0 - out["n_unique"].to_numpy() / out["n_docs"].to_numpy(), 6)
    return out.sort_values("source").reset_index(drop=True)[
        ["source", "n_docs", "n_unique", "dup_rate"]
    ]


_DUP_STATS_SQL = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
           ROUND(1.0 - CAST(count(DISTINCT text) AS DOUBLE) / count(*), 6) AS dup_rate
    FROM documents GROUP BY source ORDER BY source
    """


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------


def events_attribution(sf_dir: str) -> pd.DataFrame:
    """Last-touch attribution: every purchase is credited to the user's most
    recent PRIOR click/view (by event_id order), or to 'direct' when no
    touch precedes it — the marketing-analytics sibling of the as-of join.

    Coarse user-hash buckets; within a bucket ONE vectorized pass: sort by
    (user, event_id), forward-fill the last touch position per user
    (masked-index ffill — no per-user loop), gather the touch's type for
    purchase rows, fold to per-channel partials; the final groupby is
    register-sized (channels)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    B = 32

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _col(batch, "user_id")
        return batch.append_column("part", pc.bit_wise_and(uid.cast(pa.int64()), B - 1))

    def attribute(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        et = g["event_type"].to_numpy()
        touch = (et == "click") | (et == "view")
        idx = np.where(touch, np.arange(len(g), dtype=np.float64), np.nan)
        # per-user forward fill: at a purchase row (never itself a touch)
        # this is the position of the last touch strictly before it
        last = pd.Series(idx).groupby(g["user_id"].to_numpy(), sort=False).ffill()
        purch = et == "purchase"
        pos = last.to_numpy()[purch]
        chan = np.where(np.isnan(pos), "direct", et[np.nan_to_num(pos, nan=0).astype(int)])
        cents = np.floor(g["value"].to_numpy()[purch] * 100 + 0.5).astype(np.int64)
        if not purch.any():  # a bucket with no purchases: typed empty
            return pa.table({"channel": pa.array([], pa.string()),
                             "n_purchases": pa.array([], pa.int64()),
                             "revenue_cents": pa.array([], pa.int64())})
        agg = pd.DataFrame({"channel": chan, "n": 1, "cents": cents}).groupby(
            "channel", sort=False
        ).sum().reset_index()
        return pa.table(
            {"channel": pa.array(agg["channel"].astype(str), pa.string()),
             "n_purchases": pa.array(agg["n"].to_numpy(dtype="int64")),
             "revenue_cents": pa.array(agg["cents"].to_numpy(dtype="int64"))}
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attribute, batch_format="pandas")
        .groupby("channel")
        .aggregate(Sum("n_purchases", alias_name="n_purchases"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    out["n_purchases"] = out["n_purchases"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("channel").reset_index(drop=True)[
        ["channel", "n_purchases", "revenue_cents"]
    ]


_ATTRIBUTION_SQL = """
    WITH t AS (
      SELECT user_id, event_id, event_type, value,
             MAX(CASE WHEN event_type IN ('click','view') THEN event_id END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_id
      FROM events
    ), p AS (
      SELECT user_id, event_id, value, touch_id FROM t WHERE event_type = 'purchase'
    ), ch AS (
      SELECT p.value, COALESCE(e2.event_type, 'direct') AS channel
      FROM p LEFT JOIN events e2
        ON e2.user_id = p.user_id AND e2.event_id = p.touch_id
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM ch GROUP BY channel ORDER BY channel
    """


# ---------------------------------------------------------------------------
# CDC checksum reconciliation (pt-table-checksum analog)
# ---------------------------------------------------------------------------


def cdc_checksum_reconcile(sf_dir: str) -> pd.DataFrame:
    """Source↔replica reconciliation by bucket checksums — the operational
    audit run after a CDC backfill (the pt-table-checksum /
    pg_comparator shape): both sides fold every key-range bucket to
    (row count, order-independent content checksum); only buckets whose
    fingerprints differ are reported, so the exchange is bucket-sized
    regardless of table size.

    Source = the converged per-user state (arg-max-by-event_id fold);
    replica = the same state deterministically corrupted (keys %101==5
    dropped, value overwritten for keys %103==7). Checksum = Σ over rows of
    (user_id·10⁶ + cents + 7·last_event_id) in int64 — order-independent,
    overflow-free at any realistic bucket size, and identically computable
    in SQL."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def partial_last(batch: pa.Table) -> pa.Table:
        gb = (
            pa.table({"user_id": batch["user_id"], "event_id": batch["event_id"]})
            .group_by("user_id")
            .aggregate([("event_id", "max")])
        )
        mask = pc.is_in(batch["event_id"], value_set=gb["event_id_max"].combine_chunks())
        return batch.filter(mask)

    def bucket_sums(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "event_id"])
        last = g.groupby("user_id", sort=False).tail(1)
        uid = last["user_id"].to_numpy(dtype=np.int64)
        cents = np.floor(last["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        eid = last["event_id"].to_numpy(dtype=np.int64)
        fp = uid * 1_000_000 + cents + 7 * eid
        # source side
        b = uid // 64
        src = pd.DataFrame({"bucket": b, "n": 1, "fp": fp}).groupby("bucket").sum()
        # replica side: deterministic corruption
        keep = uid % 101 != 5
        cents_r = np.where(uid % 103 == 7, cents + 4242, cents)
        fp_r = (uid * 1_000_000 + cents_r + 7 * eid)[keep]
        rep = pd.DataFrame({"bucket": b[keep], "n": 1, "fp": fp_r}).groupby("bucket").sum()
        j = src.join(rep, how="outer", lsuffix="_src", rsuffix="_rep").fillna(0).reset_index()
        return pa.table(
            {"bucket": pa.array(j["bucket"].to_numpy(dtype="int64")),
             "n_src": pa.array(j["n_src"].to_numpy(dtype="int64")),
             "fp_src": pa.array(j["fp_src"].to_numpy(dtype="int64")),
             "n_rep": pa.array(j["n_rep"].to_numpy(dtype="int64")),
             "fp_rep": pa.array(j["fp_rep"].to_numpy(dtype="int64"))}
        )

    def part_col(batch: pa.Table) -> pa.Table:
        uid = _col(batch, "user_id")
        return batch.append_column("part", pc.bit_wise_and(uid.cast(pa.int64()), 31))

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial_last, batch_format="pyarrow")
        .map_batches(part_col, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_sums, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_src", alias_name="n_src"), Sum("fp_src", alias_name="fp_src"),
                   Sum("n_rep", alias_name="n_rep"), Sum("fp_rep", alias_name="fp_rep"))
        .to_pandas()
    )
    bad = out[(out["n_src"] != out["n_rep"]) | (out["fp_src"] != out["fp_rep"])].copy()
    for c in ("bucket", "n_src", "n_rep", "fp_src", "fp_rep"):
        bad[c] = bad[c].astype("int64")
    return bad.sort_values("bucket").reset_index(drop=True)[
        ["bucket", "n_src", "n_rep", "fp_src", "fp_rep"]
    ]


_CHECKSUM_RECONCILE_SQL = """
    WITH state AS (
      SELECT user_id,
             CAST(floor(MAX_BY(value, event_id) * 100 + 0.5) AS BIGINT) AS cents,
             MAX(event_id) AS eid
      FROM events GROUP BY user_id
    ), src AS (
      SELECT user_id // 64 AS bucket, count(*) AS n,
             SUM(user_id * 1000000 + cents + 7 * eid) AS fp
      FROM state GROUP BY 1
    ), rep AS (
      SELECT user_id // 64 AS bucket, count(*) AS n,
             SUM(user_id * 1000000
                 + CASE WHEN user_id % 103 = 7 THEN cents + 4242 ELSE cents END
                 + 7 * eid) AS fp
      FROM state WHERE user_id % 101 <> 5 GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_src,
           CAST(COALESCE(r.n, 0) AS BIGINT) AS n_rep,
           CAST(COALESCE(s.fp, 0) AS BIGINT) AS fp_src,
           CAST(COALESCE(r.fp, 0) AS BIGINT) AS fp_rep
    FROM src s FULL JOIN rep r USING (bucket)
    WHERE COALESCE(s.n, 0) <> COALESCE(r.n, 0) OR COALESCE(s.fp, 0) <> COALESCE(r.fp, 0)
    ORDER BY bucket
    """


# ---------------------------------------------------------------------------
# salted skew join
# ---------------------------------------------------------------------------


def join_skew_salted(sf_dir: str) -> pd.DataFrame:
    """Skew-aware reduce-side join (`functions/joins.py:salted_hash_join`):
    lineitem ⨝ orders on orderkey with the fact side's heavy keys detected
    by a mergeable local-top-k pass and fanned out over salt sub-partitions
    (dim rows of hot keys replicated per salt). At testdata scale the skew
    is mild — the point is the MECHANISM: the hot set only changes routing,
    never the result (pinned by tests/test_salted_join.py, including a
    pathological 50%-hot-key stream), so the same call survives a
    celebrity-key fact table that would otherwise serialize one reducer."""
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import heavy_keys, salted_hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def with_rev(t: pa.Table) -> pa.Table:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": _col(t, "l_orderkey"),
             "l_linenumber": _col(t, "l_linenumber").cast(pa.int64()),
             "rev_cents": pa.array(np.floor(ep * (1 - disc) * 100 + 0.5).astype("int64"))}
        )

    fact = li.map_batches(with_rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    hot = heavy_keys(fact, "l_orderkey", top=8)
    joined = salted_hash_join(
        fact, orders, "l_orderkey", "o_orderkey",
        left_cols=["rev_cents"], right_cols=["o_orderpriority"],
        salt_source="l_linenumber", hot_keys=hot, n_salt=4, n_buckets=32,
    )
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    out["n_items"] = out["n_items"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)[
        ["o_orderpriority", "n_items", "revenue_cents"]
    ]


_SKEW_JOIN_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """


# ---------------------------------------------------------------------------
# exact quantiles via mergeable histograms (the unbounded-group-size path)
# ---------------------------------------------------------------------------


def events_quantile_histogram(sf_dir: str) -> pd.DataFrame:
    """Exact per-type order-statistic quantiles via MERGEABLE HISTOGRAMS —
    the scale path ``events_value_quantiles`` documents for groups too big
    to ship to one task: values are cent-quantized, so a per-batch
    (type, cents, n) bincount partial bounds the exchange by the DISTINCT
    VALUE DOMAIN (≈10⁴ cents × types), not the event count; partials fold
    in cents-hash coarse buckets, and the driver finishes with one cumsum +
    searchsorted over the bounded histogram. p50/p90/p99 are the exact
    lower order statistics at rank floor((n−1)·q) — integer outputs, so
    the SQL agreement is exact."""
    hist = _events_cent_hist(sf_dir)
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("c")
        cum = g["n"].cumsum().to_numpy()
        tot = int(cum[-1])
        c = g["c"].to_numpy()
        qs = [int(c[np.searchsorted(cum, 1 + int(np.floor((tot - 1) * q)))])
              for q in (0.50, 0.90, 0.99)]
        rows.append((et, tot, *qs))
    out = pd.DataFrame(rows, columns=["event_type", "n", "p50_cents", "p90_cents", "p99_cents"])
    return out.sort_values("event_type").reset_index(drop=True)


def _events_cent_hist(sf_dir: str) -> pd.DataFrame:
    """Shared mergeable cent-histogram: distributed (type, cents, n)
    bincount partials folded in cents-hash coarse buckets — the exchange is
    bounded by the distinct value domain, never the event count. Drives
    ``events_quantile_histogram`` and ``events_outlier_mad``."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partials(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:  # typed empty (block-schema hygiene)
            return pa.table({"event_type": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "cb": pa.array([], pa.int64())})
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"event_type": b["event_type"], "c": cents}).groupby(
            ["event_type", "c"], sort=False
        ).size()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {"event_type": pa.array(idx["event_type"].astype(str)),
             "c": pa.array(idx["c"].to_numpy(dtype="int64")),
             "n": pa.array(g.to_numpy(dtype="int64")),
             "cb": pa.array((idx["c"].to_numpy(dtype="int64") & 63))}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "c" not in g.columns:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        m = g.groupby(["event_type", "c"], sort=False)["n"].sum()
        idx = m.index.to_frame(index=False)
        return pa.table(
            {"event_type": pa.array(idx["event_type"].astype(str)),
             "c": pa.array(idx["c"].to_numpy(dtype="int64")),
             "n": pa.array(m.to_numpy(dtype="int64"))}
        )

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("cb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # bounded by the value domain, not the event count
    )


def events_outlier_mad(sf_dir: str) -> pd.DataFrame:
    """Robust outlier detection per event type via MAD (median absolute
    deviation — the data-quality screen that, unlike z-scores, a few wild
    values can't poison): ONE distributed mergeable cent-histogram pass
    (shared with events_quantile_histogram — exchange bounded by the value
    domain), then median, MAD and the |x−med| > 3·MAD outlier count all
    derive driver-side from the bounded histogram by exact integer
    cumsum/searchsorted — no second scan of events. Lower order statistics
    at rank floor((n−1)/2), all int64, so the SQL windowed-cumsum oracle
    agrees exactly."""
    hist = _events_cent_hist(sf_dir)
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("c")
        n_arr = g["n"].to_numpy()
        cum = n_arr.cumsum()
        tot = int(cum[-1])
        c = g["c"].to_numpy()
        med = int(c[np.searchsorted(cum, 1 + (tot - 1) // 2)])
        dv = pd.DataFrame({"dev": np.abs(c - med), "n": n_arr}).groupby(
            "dev", as_index=False
        )["n"].sum().sort_values("dev")
        cumd = dv["n"].cumsum().to_numpy()
        mad = int(dv["dev"].to_numpy()[np.searchsorted(cumd, 1 + (tot - 1) // 2)])
        n_out = int(dv.loc[dv["dev"] > 3 * mad, "n"].sum())
        rows.append((et, tot, med, mad, n_out))
    out = pd.DataFrame(rows, columns=["event_type", "n", "med_cents", "mad_cents", "n_outliers"])
    for col in ("n", "med_cents", "mad_cents", "n_outliers"):
        out[col] = out[col].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_OUTLIER_MAD_SQL = """
WITH cents AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
), h AS (
  SELECT event_type, c, count(*) AS n FROM cents GROUP BY event_type, c
), med AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN cum >= 1 + (tot - 1) // 2 THEN c END) AS BIGINT) AS med,
         CAST(MAX(tot) AS BIGINT) AS tot
  FROM (SELECT event_type, c,
               SUM(n) OVER (PARTITION BY event_type ORDER BY c) AS cum,
               SUM(n) OVER (PARTITION BY event_type) AS tot
        FROM h)
  GROUP BY event_type
), devh AS (
  SELECT h.event_type, abs(h.c - m.med) AS dev, SUM(h.n) AS n
  FROM h JOIN med m USING (event_type) GROUP BY 1, 2
), madt AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN cum >= 1 + (tot - 1) // 2 THEN dev END) AS BIGINT) AS mad
  FROM (SELECT event_type, dev,
               SUM(n) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
               SUM(n) OVER (PARTITION BY event_type) AS tot
        FROM devh)
  GROUP BY event_type
)
SELECT d.event_type, m2.tot AS n, m2.med AS med_cents, t.mad AS mad_cents,
       CAST(COALESCE(SUM(d.n) FILTER (WHERE d.dev > 3 * t.mad), 0) AS BIGINT) AS n_outliers
FROM devh d JOIN madt t USING (event_type) JOIN med m2 USING (event_type)
GROUP BY d.event_type, m2.tot, m2.med, t.mad
ORDER BY d.event_type
"""


_QUANTILE_HIST_SQL = """
    WITH cents AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
    ), h AS (
      SELECT event_type, c, count(*) AS n FROM cents GROUP BY event_type, c
    ), cum AS (
      SELECT event_type, c,
             SUM(n) OVER (PARTITION BY event_type ORDER BY c) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM h
    )
    SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= 1 + floor((tot - 1) * 0.50) THEN c END) AS BIGINT) AS p50_cents,
           CAST(MIN(CASE WHEN cum >= 1 + floor((tot - 1) * 0.90) THEN c END) AS BIGINT) AS p90_cents,
           CAST(MIN(CASE WHEN cum >= 1 + floor((tot - 1) * 0.99) THEN c END) AS BIGINT) AS p99_cents
    FROM cum GROUP BY event_type ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# Pareto skyline (multi-criteria frontier)
# ---------------------------------------------------------------------------


_SKYLINE_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("event_id", pa.int64()),
     ("value", pa.float64()), ("ts_us", pa.int64())]
)


def _skyline_pass(df: pd.DataFrame) -> pa.Table:
    """Vectorized 2-D skyline per event_type: keep rows not dominated on
    (value↑, ts↑). Dominance: d beats r iff d.value>=r.value AND d.ts>=r.ts
    with strict > in at least one coordinate — so exact (value, ts_us) ties
    never dominate each other and ALL survive.

    Shape: sort by (value desc, ts desc); a row survives iff its ts is (a)
    strictly above the max ts of every strictly-greater value (prefix max
    over value segments) and (b) the max ts within its own value segment.
    One sort + reduceat/accumulate per type — no Python row loops. Output is
    an explicitly-schema'd Arrow table (block-schema hygiene; empty sentinel
    frames return the same schema)."""
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    keeps: list[pd.DataFrame] = []
    if len(df) and "event_type" in df.columns:
        if "ts_us" not in df.columns:  # first (per-batch) pass: raw ts column
            df = df.assign(ts_us=df["ts"].astype("datetime64[us]").astype(np.int64))
        for _, g in df.groupby("event_type", sort=False):
            g = g.sort_values(["value", "ts_us"], ascending=[False, False], kind="mergesort")
            val = g["value"].to_numpy()
            ts = g["ts_us"].to_numpy(dtype=np.int64)
            new_val = np.r_[True, val[1:] != val[:-1]]
            seg_id = np.cumsum(new_val) - 1
            seg_max = np.maximum.reduceat(ts, np.flatnonzero(new_val))
            prefix = np.maximum.accumulate(seg_max)
            m1 = np.where(seg_id > 0, prefix[np.maximum(seg_id - 1, 0)], np.iinfo(np.int64).min)
            keep = (ts > m1) & (ts == seg_max[seg_id])
            keeps.append(g.loc[keep])
    if keeps:
        out = pd.concat(keeps, ignore_index=True)
        return pa.table(
            {"event_type": pa.array(out["event_type"].astype(str).to_numpy(dtype=object)),
             "event_id": pa.array(out["event_id"].to_numpy(dtype="int64")),
             "value": pa.array(out["value"].to_numpy(dtype="float64")),
             "ts_us": pa.array(out["ts_us"].to_numpy(dtype="int64"))}
        )
    return _SKYLINE_SCHEMA.empty_table()


def events_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto skyline per event_type: events no other event of the same type
    beats on BOTH value and recency (maximize value, maximize ts).

    Distributed shape: dominance is transitive, so the global skyline is a
    subset of the union of per-batch local skylines — each batch ships only
    its own frontier into the per-type exchange (the classic two-phase
    distributed-skyline reduction; a uniform batch contributes O(log n)
    expected frontier rows, so the shuffle is metadata-sized), then one
    map_groups pass computes the exact frontier per type."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    out = (
        ds.map_batches(_skyline_pass, batch_format="pandas")
        .groupby("event_type")
        .map_groups(_skyline_pass, batch_format="pyarrow")
    )
    pdf = out.to_pandas()
    pdf["value_cents"] = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    return (
        pdf[["event_type", "event_id", "value_cents", "ts_us"]]
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )


_SKYLINE_SQL = """
    WITH e AS (
      SELECT event_type, event_id, value, ts FROM events
    ), seg AS (
      SELECT event_type, value, MAX(ts) AS meq
      FROM e GROUP BY event_type, value
    ), segx AS (
      SELECT event_type, value, meq,
             MAX(meq) OVER (PARTITION BY event_type ORDER BY value DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
      FROM seg
    )
    SELECT e.event_type,
           CAST(e.event_id AS BIGINT) AS event_id,
           CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS value_cents,
           CAST(epoch_us(e.ts) AS BIGINT) AS ts_us
    FROM e JOIN segx USING (event_type, value)
    WHERE (segx.m1 IS NULL OR e.ts > segx.m1) AND e.ts = segx.meq
    ORDER BY event_type, event_id
    """


# ---------------------------------------------------------------------------
# vocabulary growth curve (Heaps' law over the ingest order)
# ---------------------------------------------------------------------------


def text_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """Heaps-law vocabulary growth over word-3-gram TYPES: per bucket of
    W=100 docs (in doc_id order), how many distinct 3-grams appear for the
    FIRST time, plus the running type count — the corpus-curation
    diagnostic for "is more data still adding new content?". (Unigram
    vocabulary saturates in the first docs of the synth corpus; 3-gram
    types keep growing to the last doc, which is the regime the curve is
    for.)

    Exchange-pruned: each batch ships (shingle-hash, min-doc) partials via
    the shared ``shingle_explode`` stage (type-vocabulary-sized, not
    token-stream-sized); the global per-type min folds inside hash coarse
    buckets with ONE vectorized pandas groupby-min each; the per-bucket
    report is register-sized and the cumsum runs on the driver. Types
    travel as 64-bit hashes — same collision bound the inverted-index
    family documents (negligible below ~1e9 types)."""
    from ray.data.aggregate import Sum

    from ..functions.dedup import shingle_explode

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W, NB = 100, 64

    def firsts(batch: pd.DataFrame) -> pa.Table:
        ex = shingle_explode(batch, k=3)
        if ex.empty:
            return pa.table({"sh": pa.array([], pa.uint64()),
                             "first_doc": pa.array([], pa.int64()),
                             "tb": pa.array([], pa.int64())})
        g = ex.groupby("sh", sort=False)["doc_id"].min()
        sh = g.index.to_numpy(dtype="uint64")
        return pa.table({"sh": pa.array(sh),
                         "first_doc": pa.array(g.to_numpy(dtype="int64")),
                         "tb": pa.array((sh % NB).astype("int64"))})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "sh" not in g.columns:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "new_types": pa.array([], pa.int64())})
        m = g.groupby("sh", sort=False)["first_doc"].min()
        vc = pd.Series(m.to_numpy(dtype="int64") // W).value_counts()
        return pa.table({"bucket": pa.array(vc.index.to_numpy(dtype="int64")),
                         "new_types": pa.array(vc.to_numpy(dtype="int64"))})

    pdf = (
        ds.map_batches(firsts, batch_format="pandas")
        .groupby("tb")
        .map_groups(fold, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("new_types", alias_name="new_types"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pdf["bucket"] = pdf["bucket"].astype("int64")
    pdf["new_types"] = pdf["new_types"].astype("int64")
    pdf["cum_types"] = pdf["new_types"].cumsum().astype("int64")
    return pdf[["bucket", "new_types", "cum_types"]]


_VOCAB_GROWTH_SQL = r"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                    ELSE [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                          for i in range(1, len(ws) - 1)] END) AS gr
      FROM w WHERE len(ws) > 0
    ), first AS (
      SELECT gr, MIN(doc_id) AS fd FROM g GROUP BY gr
    ), b AS (
      SELECT fd // 100 AS bucket, count(*) AS new_types FROM first GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types
    FROM b ORDER BY bucket
    """


# ---------------------------------------------------------------------------
# CDC column-churn report (which columns actually change between versions)
# ---------------------------------------------------------------------------


def cdc_column_churn(sf_dir: str) -> pd.DataFrame:
    """Per-column change frequency between consecutive versions of a key —
    the operational report behind update-suppression tuning (M4): a column
    that never changes is a candidate for projection out of the captured
    image; one that always changes defeats suppression entirely.

    The events binlog is the version history (user_id = key, event_id =
    version order); for each payload column (event_type, value, props),
    count consecutive-version transitions where it changed. Coarse-bucket
    shape: ONE vectorized sort + groupby-shift compare per user-hash bucket
    (the cdc_update_suppression layout), per-bucket partial counts, then a
    register-sized per-column fold."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "props"])
    B = 32
    churn_cols = ("event_type", "value", "props")

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        return batch.append_column("part", pc.bit_wise_and(uid.cast(pa.int64()), B - 1))

    def churn_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "event_id"])
        same_user = g["user_id"].eq(g["user_id"].shift(1)).to_numpy()
        n_trans = int(same_user.sum())
        rules, changed = [], []
        for c in churn_cols:
            prev = g[c].shift(1)
            diff = (g[c] != prev).to_numpy() & same_user
            rules.append(c)
            changed.append(int(diff.sum()))
        return pa.table(
            {"column_name": pa.array(rules, pa.string()),
             "n_changed": pa.array(changed, pa.int64()),
             "n_transitions": pa.array([n_trans] * len(rules), pa.int64())}
        )

    folded = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(churn_bucket, batch_format="pandas")
        .groupby("column_name")
        .aggregate(Sum("n_changed", alias_name="n_changed"),
                   Sum("n_transitions", alias_name="n_transitions"))
        .to_pandas()
    )
    folded["n_changed"] = folded["n_changed"].astype("int64")
    folded["n_transitions"] = folded["n_transitions"].astype("int64")
    folded["churn_rate"] = _rha(
        folded["n_changed"].to_numpy() / folded["n_transitions"].to_numpy(), 6
    )
    return folded.sort_values("column_name").reset_index(drop=True)[
        ["column_name", "n_changed", "n_transitions", "churn_rate"]
    ]


_COLUMN_CHURN_SQL = """
    WITH v AS (
      SELECT user_id, event_id, event_type, value, props,
             LAG(event_type) OVER w AS p_et,
             LAG(value)      OVER w AS p_v,
             LAG(props)      OVER w AS p_p,
             LAG(user_id)    OVER w AS p_u
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ), t AS (
      SELECT * FROM v WHERE p_u IS NOT NULL
    ), rules AS (
      SELECT 'event_type' AS column_name,
             count(*) FILTER (WHERE event_type IS DISTINCT FROM p_et) AS n_changed,
             count(*) AS n_transitions FROM t
      UNION ALL
      SELECT 'value', count(*) FILTER (WHERE value IS DISTINCT FROM p_v), count(*) FROM t
      UNION ALL
      SELECT 'props', count(*) FILTER (WHERE props IS DISTINCT FROM p_p), count(*) FROM t
    )
    SELECT column_name, CAST(n_changed AS BIGINT) AS n_changed,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           ROUND(CAST(n_changed AS DOUBLE) / n_transitions, 6) AS churn_rate
    FROM rules ORDER BY column_name
    """


# ---------------------------------------------------------------------------
# data-quality validation suite (Deequ-style rule report)
# ---------------------------------------------------------------------------

_DQ_DOMAIN = ("click", "view", "signup", "purchase", "error")


def events_data_quality(sf_dir: str) -> pd.DataFrame:
    """Validation-rule report over the events stream: per rule, how many rows
    violate it (the Deequ/Great-Expectations shape a training-data pipeline
    runs before ingest). Three distributed patterns in one query:

    * columnar rules (range / domain / format / time-window) — per-batch
      vectorized predicate sums folded through a register-sized groupby;
    * exact uniqueness — only the pruned (event_id) column enters the
      distinct exchange, pre-deduped per batch so the shuffle carries at
      most one row per key per batch;
    * referential integrity — the small side (customer keys) broadcast via
      ``ray.put`` once, NumPy ``isin`` per batch, never a shuffle join."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value", "props"])
    cust = _read(sf_dir, "customer", ["c_custkey"]).to_pandas()
    keys_ref = ray.put(np.sort(cust["c_custkey"].to_numpy(dtype=np.int64)))
    lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    hi = np.datetime64("2025-01-01", "us").astype(np.int64)

    def rule_partials(batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        val = batch["value"].to_numpy()
        et = batch["event_type"]
        props = batch["props"]
        ts = batch["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        uid = batch["user_id"].to_numpy(dtype=np.int64)
        ckeys = ray.get(keys_ref)
        pos = np.searchsorted(ckeys, uid)
        in_cust = (pos < len(ckeys)) & (ckeys[np.clip(pos, 0, len(ckeys) - 1)] == uid)
        viols = {
            "value_nonnegative": int((val < 0).sum()),
            "value_le_200": int((val > 200.0).sum()),
            "event_type_in_domain": int((~et.isin(_DQ_DOMAIN)).sum()),
            "props_json_object": int(
                (props.isna() | ~(props.str.startswith("{") & props.str.endswith("}"))).sum()
            ),
            "ts_in_window": int(((ts < lo) | (ts >= hi)).sum()),
            "user_id_in_customer": int((~in_cust).sum()),
        }
        return pa.table(
            {"rule": pa.array(list(viols), pa.string()),
             "n_violations": pa.array(list(viols.values()), pa.int64()),
             "n_checked": pa.array([n] * len(viols), pa.int64())}
        )

    folded = (
        ds.map_batches(rule_partials, batch_format="pandas")
        .groupby("rule")
        .aggregate(Sum("n_violations", alias_name="n_violations"),
                   Sum("n_checked", alias_name="n_checked"))
        .to_pandas()
    )
    # exact uniqueness: per-batch pre-dedup, then a keys-only coarse-bucket
    # exchange (one vectorized nunique per bucket — the documented ~10x win
    # over a per-key groupby)
    ids = ds.map_batches(
        lambda t: (lambda u: pa.table(
            {"event_id": u, "bucket": pc.bit_wise_and(u, 255)}
        ))(pc.unique(t["event_id"].combine_chunks())),
        batch_format="pyarrow",
    )
    n_total = int(folded["n_checked"].iloc[0])
    n_distinct = int(
        ids.groupby("bucket")
        .map_groups(
            lambda g: pa.table(
                {"n": pa.array([pc.count_distinct(g["event_id"]).as_py()], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sum("n")
    )
    folded = pd.concat(
        [folded,
         pd.DataFrame({"rule": ["event_id_unique"],
                       "n_violations": [n_total - n_distinct],
                       "n_checked": [n_total]})],
        ignore_index=True,
    )
    folded["n_violations"] = folded["n_violations"].astype("int64")
    folded["n_checked"] = folded["n_checked"].astype("int64")
    return folded.sort_values("rule").reset_index(drop=True)[
        ["rule", "n_violations", "n_checked"]
    ]


_DATA_QUALITY_SQL = """
    WITH rules AS (
      SELECT 'value_nonnegative' AS rule,
             count(*) FILTER (WHERE value < 0) AS n_violations,
             count(*) AS n_checked FROM events
      UNION ALL
      SELECT 'value_le_200', count(*) FILTER (WHERE value > 200.0), count(*) FROM events
      UNION ALL
      SELECT 'event_type_in_domain',
             count(*) FILTER (WHERE event_type NOT IN
               ('click','view','signup','purchase','error')), count(*) FROM events
      UNION ALL
      SELECT 'props_json_object',
             count(*) FILTER (WHERE props IS NULL
               OR NOT (props LIKE '{%' AND props LIKE '%}')), count(*) FROM events
      UNION ALL
      SELECT 'ts_in_window',
             count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01'
               OR ts >= TIMESTAMP '2025-01-01'), count(*) FROM events
      UNION ALL
      SELECT 'user_id_in_customer',
             count(*) FILTER (WHERE user_id NOT IN (SELECT c_custkey FROM customer)),
             count(*) FROM events
      UNION ALL
      SELECT 'event_id_unique',
             count(*) - count(DISTINCT event_id), count(*) FROM events
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked
    FROM rules ORDER BY rule
    """


# ---------------------------------------------------------------------------
# the catalogs
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[str], pd.DataFrame]] = {
    "cdc_lake_state": cdc_lake_state,
    "cdc_capture_project_filter": cdc_capture_project_filter,
    "cdc_update_suppression": cdc_update_suppression,
    "cdc_key_modes": cdc_key_modes,
    "cdc_envelope": cdc_envelope,
    "cdc_stats_rollup": cdc_stats_rollup,
    "cdc_watermarks": cdc_watermarks,
    "cdc_snapshot_init": cdc_snapshot_init,
    "cdc_retry_backoff": cdc_retry_backoff,
    "cdc_payload_parse": cdc_payload_parse,
    "cdc_dlq_routing": cdc_dlq_routing,
    "cdc_flagship_replay": cdc_flagship_replay,
    "cdc_view_maintenance": cdc_view_maintenance,
    "cdc_view_maintenance_delta": cdc_view_maintenance_delta,
    "cdc_produce_delivery": cdc_produce_delivery,
    "cdc_consumer_state": cdc_consumer_state,
    "events_pagerank": events_pagerank,
    "graph_triangles": graph_triangles,
    "graph_triangles_degree": graph_triangles_degree,
    "events_ntile": events_ntile,
    "events_cube": events_cube,
    "events_skyline": events_skyline,
    "events_data_quality": events_data_quality,
    "cdc_column_churn": cdc_column_churn,
    "text_vocab_growth": text_vocab_growth,
    "multimodal_audio_vad": multimodal_audio_vad,
    "multimodal_audio_tone": multimodal_audio_tone,
    "multimodal_image_boxblur": multimodal_image_boxblur,
    "multimodal_image_sobel": multimodal_image_sobel,
    "multimodal_image_palette": multimodal_image_palette,
    "multimodal_image_otsu": multimodal_image_otsu,
    "events_benford": events_benford,
    "embedding_triplets": embedding_triplets,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "events_quantile_histogram": events_quantile_histogram,
    "events_outlier_mad": events_outlier_mad,
    "join_skew_salted": join_skew_salted,
    "cdc_checksum_reconcile": cdc_checksum_reconcile,
    "events_attribution": events_attribution,
    "corpus_dup_stats": corpus_dup_stats,
    "text_skipgrams": text_skipgrams,
    "multimodal_image_histeq": multimodal_image_histeq,
    "events_window_distinct": events_window_distinct,
    "corpus_rag_chunks": corpus_rag_chunks,
    "events_zorder": events_zorder,
    "events_dwell_time": events_dwell_time,
    "events_abtest": events_abtest,
    "events_peak_concurrency": events_peak_concurrency,
    "text_langid_confusion": text_langid_confusion,
    "events_cusum": events_cusum,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "corpus_dsir_weights": corpus_dsir_weights,
    "corpus_dsir_sample": corpus_dsir_sample,
    "embedding_sq8": embedding_sq8,
    "embedding_kcenter": embedding_kcenter,
    "corpus_divergence": corpus_divergence,
    "embedding_hard_negatives": embedding_hard_negatives,
    "text_bpe_merges": text_bpe_merges,
    "text_bpe_encode": text_bpe_encode,
    "events_moving_window": events_moving_window,
    "events_rank_portfolio": events_rank_portfolio,
    "embedding_pca_power": embedding_pca_power,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_shipping_priority_counts": q12_shipping_priority_counts,
    "q16_supplier_count": q16_supplier_count,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_blamed_suppliers": q21_blamed_suppliers,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q13_customer_distribution": q13_customer_distribution,
    "q18_large_orders": q18_large_orders,
    "q22_idle_customers": q22_idle_customers,
    "events_user_deltas": events_user_deltas,
    "top_events_per_user": top_events_per_user,
    "join_broadcast": join_broadcast,
    "join_hash": join_hash,
    "join_bloom_prefilter": join_bloom_prefilter,
    "events_tumbling_window": events_tumbling_window,
    "events_hopping_window": events_hopping_window,
    "events_asof_join": events_asof_join,
    "events_value_quantiles": events_value_quantiles,
    "events_hourly_rollup": events_hourly_rollup,
    "distinct_users_per_type": distinct_users_per_type,
    "sessionize": sessionize,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_anomaly": events_anomaly,
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_jaccard": dedup_jaccard,
    "dedup_minhash_recall": dedup_minhash_recall,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "corpus_clean": corpus_clean,
    "corpus_split": corpus_split,
    "corpus_pack": corpus_pack,
    "corpus_sample": corpus_sample,
    "corpus_shuffle": corpus_shuffle,
    "corpus_decontaminate": corpus_decontaminate,
    "corpus_prep": corpus_prep,
    "text_tfidf": text_tfidf,
    "text_tfidf_simjoin": text_tfidf_simjoin,
    "text_gopher_rules": text_gopher_rules,
    "pq_codes": pq_codes,
    "ann_pq": ann_pq,
    "ann_pq_rerank": ann_pq_rerank,
    "corpus_mixture": corpus_mixture,
    "dedup_incremental": dedup_incremental,
    "dedup_clusters": dedup_clusters,
    "text_topk_tokens": text_topk_tokens,
    "text_nb_train": text_nb_train,
    "text_nb_classify": text_nb_classify,
    "knn_bruteforce": knn_bruteforce,
    "knn_filtered": knn_filtered,
    "ann_lsh": ann_lsh,
    "ann_lsh_mp": ann_lsh_mp,
    "ann_ivf": ann_ivf,
    "ann_ivf_mp": ann_ivf_mp,
    "ann_ivf_incremental": ann_ivf_incremental,
    "text_df_incremental": text_df_incremental,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_repetition": text_repetition,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "text_c4_filter": text_c4_filter,
    "approx_distinct_hll": approx_distinct_hll,
    "text_lm_perplexity": text_lm_perplexity,
    "cdc_scd2_history": cdc_scd2_history,
    "corpus_sample_bottomk": corpus_sample_bottomk,
    "events_range_join": events_range_join,
    "text_countmin": text_countmin,
    "events_quantile_sketch": events_quantile_sketch,
    "corpus_sample_weighted": corpus_sample_weighted,
    "dedup_substrings": dedup_substrings,
    "dedup_minhash_incremental": dedup_minhash_incremental,
    "events_running_totals": events_running_totals,
    "events_decayed_score": events_decayed_score,
    "events_heavy_hitters": events_heavy_hitters,
    "events_debounce": events_debounce,
    "cdc_txn_batches": cdc_txn_batches,
    "approx_distinct_by_source": approx_distinct_by_source,
    "dedup_semantic": dedup_semantic,
    "corpus_cap_source": corpus_cap_source,
    "corpus_chunk": corpus_chunk,
    "corpus_bloom_dedup": corpus_bloom_dedup,
    "dedup_passages": dedup_passages,
    "dedup_normalized": dedup_normalized,
    "corpus_quality_cut": corpus_quality_cut,
    "embedding_centroids": embedding_centroids,
    "embedding_covariance": embedding_covariance,
    "embedding_kmeans": embedding_kmeans,
    "events_user_paths": events_user_paths,
    "events_gap_fill": events_gap_fill,
    "events_holt": events_holt,
    "events_pivot": events_pivot,
    "events_cep_match": events_cep_match,
    "events_unpivot": events_unpivot,
    "text_bm25_topk": text_bm25_topk,
    "text_bm25_incremental": text_bm25_incremental,
    "hybrid_rrf_topk": hybrid_rrf_topk,
    "ann_recall": ann_recall,
    "multimodal_inventory": multimodal_inventory,
    # multimodal_decode (fake-feature plumbing mode) is deliberately NOT a
    # driver query: its PCG64 features are not SQL-expressible, so it was
    # the one rows-only entry. The plumbing is pytest-locked instead by an
    # independent feature re-derivation (tests/test_round4_fixes.py::
    # test_fake_decode_rederivation); the driver-visible decode contract is
    # multimodal_decode_real, whose oracle re-decodes bytes in SQL.
    "multimodal_decode_real": multimodal_decode_real,
    "multimodal_frames": multimodal_frames,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "dedup_editdistance": dedup_editdistance,
    "text_keyword_tags": text_keyword_tags,
    "text_pmi_bigrams": text_pmi_bigrams,
    "dedup_containment": dedup_containment,
    "cdc_snapshot_diff": cdc_snapshot_diff,
    "text_ngram_novelty": text_ngram_novelty,
    "cdc_gap_audit": cdc_gap_audit,
    "multimodal_audio_resample": multimodal_audio_resample,
    "cdc_ordering_inversions": cdc_ordering_inversions,
    "events_nearest_join": events_nearest_join,
    "multimodal_image_crop": multimodal_image_crop,
    "events_markov_transitions": events_markov_transitions,
    "events_burst_window": events_burst_window,
    "corpus_interleave": corpus_interleave,
}

# --- byte-level SQL decode of the multimodal payloads -----------------------
# DuckDB 1.0 has no BLOB slicing/hash, so every byte access goes through
# hex(payload) (uppercase) + substr: byte at 0-based offset o occupies hex
# chars 2o+1..2o+2. The oracles below re-decode the canonical encoder layouts
# (movex_cdc_ray/functions/multimodal.py: 54-byte BITMAPINFOHEADER BMP,
# comment-free P6 PPM, RIFF/fmt/data WAV) — byte-by-byte, per-pixel /
# per-sample — and recompute _image_features/_audio_features norms with the
# same float32 quantization (CAST(.. AS REAL)::DOUBLE == feats.astype(f32)).

# P6 header on the hex form: 'P6\n' digits ' ' digits '\n255\n'
_PPM_HEX_RE = "^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A"


def _hx(off: str) -> str:
    """SQL for the byte value (0-255) at 0-based offset ``off`` of the
    hex-encoded payload column ``h`` in scope."""
    lut = "'0123456789ABCDEF'"
    return (
        f"(strpos({lut}, substr(h, 2*({off})+1, 1))*16"
        f" + strpos({lut}, substr(h, 2*({off})+2, 1)) - 17)"
    )


def _le32(off: int) -> str:
    """SQL for the unsigned little-endian 32-bit int at 0-based ``off``."""
    return (
        f"({_hx(str(off))} + 256*{_hx(str(off + 1))}"
        f" + 65536*{_hx(str(off + 2))} + 16777216*{_hx(str(off + 3))})"
    )


def _audio_vad_sql() -> str:
    """Byte-level SQL re-decode of the VAD path: sample i at byte 44+2i,
    energy Σ s² per 256-sample frame (integer-exact), active iff
    energy > threshold, segments via a LAG over the frame order."""
    return f"""
    WITH wav AS (
      SELECT media_id, hex(payload) AS h, ({_le32(40)}) // 2 AS ns
      FROM read_parquet('{_stage_real_media()}')
      WHERE kind = 'audio' AND substr(hex(payload), 25, 8) = '666D7420'
                           AND substr(hex(payload), 73, 8) = '64617461'
    ),
    smp AS (
      SELECT media_id, i,
             CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM (SELECT w.media_id, t.i,
                   {_hx("44 + 2*t.i")} + 256*{_hx("45 + 2*t.i")} AS raw,
                   w.h AS h
            FROM wav w, range(4096) t(i) WHERE t.i < (w.ns // 256) * 256)
    ),
    fr AS (
      SELECT media_id, i // 256 AS f,
             SUM(CAST(s AS BIGINT) * s) > 16400000000 AS active
      FROM smp GROUP BY media_id, i // 256
    ),
    seg AS (
      SELECT media_id,
             count(*) AS n_frames,
             count(*) FILTER (WHERE active) AS n_active,
             count(*) FILTER (
               WHERE active AND (prev IS NULL OR NOT prev)) AS n_segments
      FROM (SELECT media_id, active,
                   LAG(active) OVER (PARTITION BY media_id ORDER BY f) AS prev
            FROM fr)
      GROUP BY media_id
    )
    SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_segments AS BIGINT) AS n_segments
    FROM seg ORDER BY media_id
    """


def _audio_tone_sql() -> str:
    """Byte-level SQL re-evaluation of the closed-form Goertzel at fs/6:
    sample j of frame f gets weight u[(399−j) mod 6] toward s₁ and
    u[(398−j) mod 6] toward s₂ (u = [1,1,0,−1,−1,0]; the j=399 term of s₂
    lands on u[5] = 0, matching the recurrence's k ≤ N−2 sum), then
    P = s₁² + s₂² − s₁·s₂ — all BIGINT, exact."""
    w1 = "CASE ((399 - (i % 400)) % 6 + 6) % 6 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 3 THEN -1 WHEN 4 THEN -1 ELSE 0 END"
    w2 = "CASE ((398 - (i % 400)) % 6 + 6) % 6 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 3 THEN -1 WHEN 4 THEN -1 ELSE 0 END"
    return f"""
    WITH wav AS (
      SELECT media_id, hex(payload) AS h, ({_le32(40)}) // 2 AS ns
      FROM read_parquet('{_stage_tone_audio()}')
      WHERE kind = 'audio' AND substr(hex(payload), 25, 8) = '666D7420'
                           AND substr(hex(payload), 73, 8) = '64617461'
    ),
    smp AS (
      SELECT media_id, i,
             CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM (SELECT w.media_id, t.i,
                   {_hx("44 + 2*t.i")} + 256*{_hx("45 + 2*t.i")} AS raw,
                   w.h AS h
            FROM wav w, range(4096) t(i) WHERE t.i < (w.ns // 400) * 400)
    ),
    g AS (
      SELECT media_id, i // 400 AS frame_idx,
             SUM(CAST(s AS BIGINT) * ({w1})) AS s1,
             SUM(CAST(s AS BIGINT) * ({w2})) AS s2
      FROM smp GROUP BY media_id, i // 400
    )
    SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(s1*s1 + s2*s2 - s1*s2 AS BIGINT) AS tone_power,
           (s1*s1 + s2*s2 - s1*s2) > 100000000000 AS has_tone
    FROM g ORDER BY media_id, frame_idx
    """


def _histeq_sql() -> str:
    """Byte-level SQL re-decode of the histogram-equalization path: per
    (image, channel) the CDF comes from a RANGE window over pixel values
    (peers included ⇒ exactly #≤v), cdf_min from the min-value bin, and the
    LUT ((cdf−cdf_min)·255) // (n−cdf_min) applies per pixel — all BIGINT,
    so the sums match the engine exactly."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    pxoff AS (
      SELECT im.media_id, im.h AS h,
        CASE WHEN im.fmt = 'bmp'
             THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
             ELSE im.datoff + t.pi*3 END AS base,
        CASE WHEN im.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
      FROM img2 im, range(400) t(pi) WHERE t.pi < im.w * im.ht
    ),
    px AS (
      SELECT media_id, {_hx("base + rsh")} AS r, {_hx("base + 1")} AS g,
             {_hx("base + 2 - rsh")} AS b
      FROM pxoff
    ),
    chan AS (
      SELECT media_id, 0 AS ch, r AS v FROM px
      UNION ALL SELECT media_id, 1, g FROM px
      UNION ALL SELECT media_id, 2, b FROM px
    ),
    wn AS (
      SELECT media_id, ch, v,
             COUNT(*) OVER (PARTITION BY media_id, ch ORDER BY v
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf,
             COUNT(*) OVER (PARTITION BY media_id, ch) AS n,
             MIN(v) OVER (PARTITION BY media_id, ch) AS vmin
      FROM chan
    ),
    cm AS (
      SELECT media_id, ch, count(*) AS cdfmin
      FROM wn WHERE v = vmin GROUP BY media_id, ch
    ),
    eq AS (
      SELECT wn.media_id, wn.ch,
             CASE WHEN wn.n > cm.cdfmin
                  THEN ((wn.cdf - cm.cdfmin) * 255) // (wn.n - cm.cdfmin)
                  ELSE 0 END AS e
      FROM wn JOIN cm USING (media_id, ch)
    )
    SELECT media_id,
           CAST(SUM(e) FILTER (WHERE ch = 0) AS BIGINT) AS sum_r_eq,
           CAST(SUM(e) FILTER (WHERE ch = 1) AS BIGINT) AS sum_g_eq,
           CAST(SUM(e) FILTER (WHERE ch = 2) AS BIGINT) AS sum_b_eq
    FROM eq GROUP BY media_id ORDER BY media_id
    """


def _boxblur_sql() -> str:
    """Byte-level SQL re-decode of the 3×3 box filter: pixels keyed by
    STORAGE row/col (pi//w, pi%w — valid because the reported sums/max are
    flip-invariant), box values via a ±1/±1 self-join over each image's
    pixel table, interior rows/cols only."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    px AS (
      SELECT im.media_id, im.w, im.ht,
             t.pi // im.w AS rw, t.pi % im.w AS cl,
             {_hx("base + rsh")} AS r, {_hx("base + 1")} AS g,
             {_hx("base + 2 - rsh")} AS b
      FROM (SELECT im0.*,
              CASE WHEN im0.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
            FROM img2 im0) im,
           range(400) t(pi),
           LATERAL (SELECT CASE WHEN im.fmt = 'bmp'
                         THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
                         ELSE im.datoff + t.pi*3 END AS base) o
      WHERE t.pi < im.w * im.ht
    ),
    blur AS (
      SELECT p.media_id, p.rw, p.cl,
             CAST(SUM(q.r) AS BIGINT) AS br, CAST(SUM(q.g) AS BIGINT) AS bg,
             CAST(SUM(q.b) AS BIGINT) AS bb
      FROM px p JOIN px q
        ON q.media_id = p.media_id
       AND abs(q.rw - p.rw) <= 1 AND abs(q.cl - p.cl) <= 1
      WHERE p.rw BETWEEN 1 AND p.ht - 2 AND p.cl BETWEEN 1 AND p.w - 2
      GROUP BY p.media_id, p.rw, p.cl
    )
    SELECT media_id,
           CAST(SUM(br) AS BIGINT) AS blur_sum_r,
           CAST(SUM(bg) AS BIGINT) AS blur_sum_g,
           CAST(SUM(bb) AS BIGINT) AS blur_sum_b,
           CAST(MAX(greatest(br, bg, bb)) AS BIGINT) AS blur_max
    FROM blur GROUP BY media_id ORDER BY media_id
    """


def _palette_sql() -> str:
    """Byte-level SQL re-decode of the palette path: same px CTE chain as
    the box blur, cell = (r//16)*256 + (g//16)*16 + b//16, top-3 per image
    via ROW_NUMBER ordered (count DESC, cell ASC)."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h
      FROM read_parquet('{_stage_real_media()}') WHERE kind = 'image'
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    pxoff AS (
      SELECT im.media_id, im.h AS h,
        CASE WHEN im.fmt = 'bmp'
             THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
             ELSE im.datoff + t.pi*3 END AS base,
        CASE WHEN im.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
      FROM img2 im, range(400) t(pi) WHERE t.pi < im.w * im.ht
    ),
    px AS (
      SELECT media_id,
             ({_hx("base + rsh")} // 16) * 256 + ({_hx("base + 1")} // 16) * 16
               + ({_hx("base + 2 - rsh")} // 16) AS cell
      FROM pxoff
    ),
    cnt AS (
      SELECT media_id, cell, COUNT(*) AS n_px FROM px GROUP BY media_id, cell
    ),
    rk AS (
      SELECT media_id, cell, n_px,
             ROW_NUMBER() OVER (PARTITION BY media_id
                                ORDER BY n_px DESC, cell ASC) AS rank
      FROM cnt
    )
    SELECT media_id, CAST(rank AS BIGINT) AS rank, CAST(cell AS BIGINT) AS cell,
           CAST(n_px AS BIGINT) AS n_px
    FROM rk WHERE rank <= 3 ORDER BY media_id, rank
    """


def _ppm_dim_sql(group: int) -> str:
    """SQL for a P6 header dimension: hex digit pairs '3d' → decimal int."""
    return (
        f"CAST(regexp_replace(regexp_extract(h, '{_PPM_HEX_RE}', {group}),"
        r" '3(.)', '\1', 'g') AS INT)"
    )


def _f32(e: str) -> str:
    # feats.astype(np.float32) analog: quantize through REAL, widen back
    return f"(CAST(({e}) AS REAL)::DOUBLE)"


def _sq(e: str) -> str:
    return f"(({e})*({e}))"


def _img_norm_ctes(px: str, keys: str) -> str:
    """CTE fragments reducing pixel rows (``keys``, r, g, b) to the
    ``_image_features(dim=64)`` L2 norm: [channel means, channel stds]/255 +
    58-bin luminance histogram (np.histogram fast path: floor(lum*58/255),
    right-inclusive last edge), each feature float32-quantized before the
    double-precision norm — exactly DecodeStage's feature_norm."""
    head = " + ".join(_sq(_f32(f"{c}/255.0")) for c in ("mr", "mg", "mb", "sr", "sg", "sb"))
    return f"""
    agg_{px} AS (
      SELECT {keys}, avg(r) AS mr, avg(g) AS mg, avg(b) AS mb,
             sqrt(var_pop(r)) AS sr, sqrt(var_pop(g)) AS sg, sqrt(var_pop(b)) AS sb,
             count(*) AS npx
      FROM {px} GROUP BY {keys}
    ),
    hist_{px} AS (
      SELECT {keys}, SUM({_sq(_f32("cnt::DOUBLE / npx"))}) AS hss
      FROM (
        SELECT {keys},
               LEAST(CAST(floor((r*0.299 + g*0.587 + b*0.114) * (58.0/255.0)) AS INT), 57) AS bin,
               COUNT(*) AS cnt
        FROM {px} GROUP BY {keys}, bin
      ) JOIN (SELECT {keys}, npx FROM agg_{px}) USING ({keys})
      GROUP BY {keys}
    ),
    norm_{px} AS (
      SELECT {keys}, sqrt({head} + hss) AS fn
      FROM agg_{px} JOIN hist_{px} USING ({keys})
    )"""


def _decode_real_sql() -> str:
    """Full SQL re-decode of the staged real-media parquet: BMP (bottom-up
    BGR rows, 4-byte padding, positive height as our encoder writes) and PPM
    pixels, WAV PCM16 samples (canonical 44-byte fmt/data layout guarded by
    magic checks) → per-row decoded dims + feature norms."""
    return f"""
    WITH media AS (
      SELECT media_id, kind, hex(payload) AS h, octet_length(payload) AS nb
      FROM read_parquet('{_stage_real_media()}')
    ),
    geo AS (
      SELECT *, CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp'
                     WHEN substr(h, 1, 4) = '5036' THEN 'ppm'
                     ELSE 'wav' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo WHERE fmt <> 'wav'
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    -- one row per pixel; BMP stores B,G,R at base+0/1/2, PPM stores R,G,B
    pxoff AS (
      SELECT im.media_id, im.h AS h,
        CASE WHEN im.fmt = 'bmp'
             THEN im.datoff + (t.pi // im.w)*im.rowb + (t.pi % im.w)*3
             ELSE im.datoff + t.pi*3 END AS base,
        CASE WHEN im.fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
      FROM img2 im, range(400) t(pi) WHERE t.pi < im.w * im.ht
    ),
    px AS (
      SELECT media_id, {_hx("base + rsh")} AS r, {_hx("base + 1")} AS g,
             {_hx("base + 2 - rsh")} AS b
      FROM pxoff
    ),
    {_img_norm_ctes("px", "media_id")},
    wav AS (
      SELECT media_id, h, ({_le32(40)}) // 2 AS ns
      FROM geo
      WHERE fmt = 'wav' AND substr(h, 25, 8) = '666D7420'
                        AND substr(h, 73, 8) = '64617461'
    ),
    smp AS (
      SELECT media_id, i, CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM (SELECT w.media_id, t.i,
                   {_hx("44 + 2*t.i")} + 256*{_hx("45 + 2*t.i")} AS raw,
                   w.h AS h
            FROM wav w, range(2000) t(i) WHERE t.i < w.ns)
    ),
    wagg AS (
      SELECT media_id, sqrt(avg((s/32768.0)*(s/32768.0))) AS rms, count(*) AS n
      FROM smp GROUP BY media_id
    ),
    wz AS (
      SELECT media_id,
             SUM(CASE WHEN flip THEN 1 ELSE 0 END)::DOUBLE / (count(*) - 1) AS zcr
      FROM (SELECT media_id,
                   (s < 0) <> lag(s < 0) OVER (PARTITION BY media_id ORDER BY i) AS flip
            FROM smp)
      GROUP BY media_id
    ),
    whist AS (
      SELECT media_id, SUM({_sq(_f32("cnt::DOUBLE / n"))}) AS hss
      FROM (SELECT media_id,
                   LEAST(CAST(floor(((s/32768.0) + 1.0) * (62.0/2.0)) AS INT), 61) AS bin,
                   COUNT(*) AS cnt
            FROM smp GROUP BY media_id, bin)
      JOIN (SELECT media_id, n FROM wagg) USING (media_id)
      GROUP BY media_id
    ),
    wnorm AS (
      SELECT a.media_id, a.n AS ns,
             sqrt({_sq(_f32("a.rms"))} + {_sq(_f32("z.zcr"))} + hh.hss) AS fn
      FROM wagg a JOIN wz z USING (media_id) JOIN whist hh USING (media_id)
    )
    SELECT g.media_id, g.kind,
           CAST(COALESCE(i2.w, 0) AS INT) AS decoded_width,
           CAST(COALESCE(i2.ht, 0) AS INT) AS decoded_height,
           CAST(COALESCE(wn.ns, 0) AS BIGINT) AS decoded_samples,
           ROUND(COALESCE(n.fn, wn.fn), 4) AS feature_norm
    FROM geo g
    LEFT JOIN img2 i2 USING (media_id)
    LEFT JOIN norm_px n USING (media_id)
    LEFT JOIN wnorm wn USING (media_id)
    ORDER BY media_id
    """


def _frames_sql() -> str:
    """SQL re-decode of the staged concatenated-PPM video streams: parse the
    first frame header, derive the frame stride (all frames of a stream share
    dims — encode_ppm_stream's construction), reproduce FrameSampleStage's
    evenly-spaced linspace pick (k*(src-1)//3 for take=4; exact because the
    fixture's interior linspace values are non-integral), and feature-norm
    each sampled frame's pixels."""
    return f"""
    WITH vids AS (
      SELECT media_id, hex(payload) AS h, octet_length(payload) AS nb
      FROM read_parquet('{_stage_videos()}')
    ),
    vgeo AS (
      SELECT media_id, h, nb, {_ppm_dim_sql(1)} AS w, {_ppm_dim_sql(2)} AS ht,
             9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
               + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 AS hdr
      FROM vids
    ),
    vgeo2 AS (SELECT *, hdr + w*ht*3 AS fsz FROM vgeo),
    frames AS (
      SELECT DISTINCT media_id, h, w, ht, hdr, fsz,
             CAST((k.k * (nb // fsz - 1)) // 3 AS INT) AS frame_idx
      FROM vgeo2, range(4) k(k)
      WHERE nb // fsz >= 4
    ),
    fpx AS (
      SELECT f.media_id, f.frame_idx, f.h AS h,
             f.frame_idx*f.fsz + f.hdr + t.pi*3 AS base
      FROM frames f, range(300) t(pi) WHERE t.pi < f.w * f.ht
    ),
    px AS (
      SELECT media_id, frame_idx, {_hx("base")} AS r, {_hx("base + 1")} AS g,
             {_hx("base + 2")} AS b
      FROM fpx
    ),
    {_img_norm_ctes("px", "media_id, frame_idx")}
    SELECT f.media_id, f.frame_idx,
           CAST(f.w AS INT) AS decoded_width, CAST(f.ht AS INT) AS decoded_height,
           ROUND(n.fn, 4) AS feature_norm
    FROM frames f JOIN norm_px n USING (media_id, frame_idx)
    ORDER BY media_id, frame_idx
    """


def _scene_cuts_sql() -> str:
    """Byte-level SQL re-decode of the scene-cut path: SAD per consecutive
    frame pair as Σ|byte(f,i) − byte(f−1,i)| over the frame's pixel bytes
    (frame stride from the first header, all frames share dims), cut iff
    SAD > 5·w·h·3 — integer-exact end to end."""
    return f"""
    WITH vids AS (
      SELECT media_id, hex(payload) AS h, octet_length(payload) AS nb
      FROM read_parquet('{_stage_scene_videos()}')
    ),
    vgeo AS (
      SELECT media_id, h, nb, {_ppm_dim_sql(1)} AS w, {_ppm_dim_sql(2)} AS ht,
             9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
               + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 AS hdr
      FROM vids
    ),
    vgeo2 AS (SELECT *, hdr + w*ht*3 AS fsz FROM vgeo),
    pairs AS (
      SELECT media_id, h, w, ht, hdr, fsz, f.f AS fi
      FROM vgeo2, range(12) f(f) WHERE f.f >= 1 AND f.f < nb // fsz
    ),
    sad AS (
      SELECT media_id, fi,
             SUM(ABS({_hx("fi*fsz + hdr + t.i")} - {_hx("(fi-1)*fsz + hdr + t.i")})) AS sad,
             MAX(w*ht*3) AS fb
      FROM pairs, range(684) t(i) WHERE t.i < w * ht * 3
      GROUP BY media_id, fi
    )
    SELECT media_id, CAST(fi AS BIGINT) AS frame_idx, CAST(sad AS BIGINT) AS sad,
           sad > 5 * fb AS is_cut
    FROM sad ORDER BY media_id, frame_idx
    """


def _phash_sql() -> str:
    """SQL re-derivation of the full perceptual-hash dedup: decode ONLY the
    64 grid-sampled pixels of each staged BMP/PPM payload (floor-index
    nearest-neighbor — sy=(ci*ht)//8, sx=(cj*w)//8; BMP rows are stored
    bottom-up in BGR, so stored row = ht-1-sy and R sits at byte +2),
    integer BT.601 luminance ×1000, strict-mean aHash bits, 4 × 16-bit
    bands, band-equality candidates, bit_count(xor) hamming ≤ 12 — the
    byte-identical definition of ``multimodal_phash_dedup``."""
    return f"""
    WITH media AS (
      SELECT media_id, hex(payload) AS h FROM read_parquet('{_stage_phash_media()}')
    ),
    geo AS (
      SELECT media_id, h,
             CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp' ELSE 'ppm' END AS fmt
      FROM media
    ),
    img AS (
      SELECT media_id, h, fmt,
        CASE WHEN fmt = 'bmp' THEN {_le32(18)} ELSE {_ppm_dim_sql(1)} END AS w,
        CASE WHEN fmt = 'bmp' THEN {_le32(22)} ELSE {_ppm_dim_sql(2)} END AS ht,
        CASE WHEN fmt = 'bmp' THEN {_le32(10)}
             ELSE 9 + length(regexp_extract(h, '{_PPM_HEX_RE}', 1))//2
                    + length(regexp_extract(h, '{_PPM_HEX_RE}', 2))//2 END AS datoff
      FROM geo
    ),
    img2 AS (SELECT *, ((w*3 + 3) // 4) * 4 AS rowb FROM img),
    cells AS (
      SELECT i.media_id, i.h AS h, t.k AS k,
             ((t.k // 8) * i.ht) // 8 AS sy, ((t.k % 8) * i.w) // 8 AS sx,
             i.fmt, i.w, i.ht, i.datoff, i.rowb
      FROM img2 i, range(64) t(k)
    ),
    loc AS (
      SELECT media_id, k, h,
        CASE WHEN fmt = 'bmp' THEN datoff + (ht - 1 - sy)*rowb + sx*3
             ELSE datoff + (sy*w + sx)*3 END AS o,
        CASE WHEN fmt = 'bmp' THEN 2 ELSE 0 END AS rsh
      FROM cells
    ),
    lums AS (
      SELECT media_id, k,
             299*{_hx("o + rsh")} + 587*{_hx("o + 1")} + 114*{_hx("o + 2 - rsh")} AS lum
      FROM loc
    ),
    tot AS (SELECT media_id, SUM(lum) AS total FROM lums GROUP BY media_id),
    bits AS (
      SELECT l.media_id, l.k,
             CASE WHEN 64*l.lum > t.total THEN 1 ELSE 0 END AS bit
      FROM lums l JOIN tot t USING (media_id)
    ),
    bands AS (
      SELECT media_id, k // 16 AS band,
             CAST(SUM(bit * (1::BIGINT << (k % 16))) AS BIGINT) AS bv
      FROM bits GROUP BY media_id, band
    ),
    hs AS (
      SELECT media_id,
             CAST(SUM(CASE WHEN band = 0 THEN bv ELSE 0 END) AS BIGINT) AS b0,
             CAST(SUM(CASE WHEN band = 1 THEN bv ELSE 0 END) AS BIGINT) AS b1,
             CAST(SUM(CASE WHEN band = 2 THEN bv ELSE 0 END) AS BIGINT) AS b2,
             CAST(SUM(CASE WHEN band = 3 THEN bv ELSE 0 END) AS BIGINT) AS b3
      FROM bands GROUP BY media_id
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id
    )
    SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT)
             AS hamming
    FROM cand c
    JOIN hs x ON x.media_id = c.id_a
    JOIN hs y ON y.media_id = c.id_b
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 12
    ORDER BY id_a, id_b
    """


_BM25_SQL = """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                           '[a-z0-9_]+')) AS w
          FROM documents
        ), consts AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM tok) AS n_tokens
        ), dl AS (
          SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
        ), q(query_id, w) AS (
          VALUES (0,'hash'),(0,'join'),(1,'batch'),(1,'merge'),(1,'scan'),
                 (2,'filter'),(2,'window')
        ), df AS (
          SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok
          WHERE w IN (SELECT w FROM q) GROUP BY w
        ), tf AS (
          SELECT doc_id, w, COUNT(*) AS tf FROM tok
          WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w
        ), scored AS (
          SELECT q.query_id, tf.doc_id,
                 SUM( ln((c.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                      * tf.tf * (1.2 + 1.0)
                      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                           / (CAST(c.n_tokens AS DOUBLE) / c.n_docs))) ) AS s
          FROM q JOIN tf USING (w) JOIN df USING (w)
          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN consts c
          GROUP BY q.query_id, tf.doc_id
        ), rk AS (
          SELECT query_id, doc_id, ROUND(s, 6) AS score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ROUND(s, 6) DESC, doc_id) AS rank
          FROM scored
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
               CAST(rank AS BIGINT) AS rank, score
        FROM rk WHERE rank <= 10 ORDER BY query_id, rank
    """


def _kmeans_full_sql(k: int = 4, iters: int = 3) -> str:
    """DuckDB value oracle for embedding_kmeans: the full-corpus Lloyd
    iterations of `similarity.kmeans_full` unrolled as chained materialized
    CTEs. Contract mirrored exactly: init = vectors with vec_id < k, squared
    L2 rounded to 9 before the per-vector argmin (ties toward the lower
    cluster), per-cluster means rounded to 9 each iteration, empty clusters
    carry the previous centroid with n_vecs 0."""
    sql = f"""
        WITH ex AS MATERIALIZED (
          SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
          FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
        ), c0 AS MATERIALIZED (
          SELECT vec_id AS cluster, i, x AS cx FROM ex WHERE vec_id < {k}
        )"""
    for t in range(1, iters + 1):
        sql += f"""
        , a{t} AS MATERIALIZED (
          SELECT vec_id, cluster FROM (
            SELECT v.vec_id, c.cluster,
                   ROW_NUMBER() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY ROUND(SUM((v.x - c.cx) * (v.x - c.cx)), 9) ASC,
                              c.cluster ASC) AS rn
            FROM ex v JOIN c{t - 1} c ON c.i = v.i
            GROUP BY v.vec_id, c.cluster) WHERE rn = 1
        ), m{t} AS MATERIALIZED (
          SELECT a.cluster, v.i, SUM(v.x) AS s, COUNT(*) AS n
          FROM a{t} a JOIN ex v ON v.vec_id = a.vec_id
          GROUP BY a.cluster, v.i
        ), c{t} AS MATERIALIZED (
          SELECT c.cluster, c.i,
                 CASE WHEN m.n IS NULL THEN c.cx
                      ELSE ROUND(m.s / m.n, 9) END AS cx
          FROM c{t - 1} c LEFT JOIN m{t} m
            ON m.cluster = c.cluster AND m.i = c.i
        )"""
    sql += f"""
        SELECT CAST(c.cluster AS BIGINT) AS cluster, CAST(c.i AS BIGINT) AS i,
               ROUND(c.cx, 6) AS centroid_x,
               CAST(COALESCE(m.n, 0) AS BIGINT) AS n_vecs
        FROM c{iters} c LEFT JOIN m{iters} m
          ON m.cluster = c.cluster AND m.i = c.i
        ORDER BY cluster, i
    """
    return sql


def _build_oracle_sql() -> dict[str, str]:
    """Build the oracle map LAZILY (first access, not import): several
    entries synthesize artifacts — the flagship oracle stages its binlog
    stream, multimodal_inventory stages the media parquet — and at
    module-import time that would run in EVERY Ray worker importing this
    module, racing rmtree/regenerate on the shared /tmp staging dirs."""
    return {
    "cdc_lake_state": """
        SELECT user_id,
               event_id  AS last_event_id,
               event_type AS last_event_type,
               value     AS last_value
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
        ) t
        WHERE rn = 1 AND event_type <> 'error'
        ORDER BY user_id
    """,
    "cdc_capture_project_filter": """
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'click' AND value > 100.0
        ORDER BY event_id
    """,
    "cdc_update_suppression": """
        SELECT event_id, user_id, value
        FROM (
            SELECT event_id, user_id, value,
                   LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
            FROM events
        ) t
        WHERE prev_value IS NULL OR value <> prev_value
        ORDER BY event_id
    """,
    "cdc_key_modes": """
        SELECT event_id,
               '{"user_id": ' || CAST(user_id AS VARCHAR) || '}' AS key_pk,
               'events' AS key_fixed,
               'txn-' || CAST(event_id // 50 AS VARCHAR) AS key_txn
        FROM events
        ORDER BY event_id
    """,
    "cdc_envelope": """
        SELECT event_id,
               CASE WHEN event_type = 'signup' THEN 'INSERT'
                    WHEN event_type = 'error'  THEN 'DELETE'
                    ELSE 'UPDATE' END AS operation,
               strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS timestamp,
               'lake.events.' || event_type AS topic,
               'EVENTS' AS msg_schema,
               'USER_EVENTS' AS tablename
        FROM events
        ORDER BY event_id
    """,
    "cdc_stats_rollup": """
        SELECT event_type,
               date_trunc('hour', ts) AS time_bucket,
               ROUND(SUM(value), 6) AS sum_value,
               MIN(ts) AS min_ts,
               MAX(ts) AS max_ts,
               COUNT(*) AS n_rows
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
        ORDER BY event_type, time_bucket
    """,
    "cdc_watermarks": """
        SELECT user_id % 8 AS part,
               MAX(event_id) AS watermark,
               COUNT(*) AS n_events
        FROM events
        GROUP BY user_id % 8
        ORDER BY part
    """,
    "cdc_snapshot_init": """
        SELECT c_custkey, c_name, c_acctbal, 'i' AS op, 'INIT' AS operation
        FROM customer
        WHERE c_acctbal > 0.0
        ORDER BY c_custkey
    """,
    "cdc_retry_backoff": """
        SELECT event_id,
               event_id % 5 + 1 AS retry_count,
               20.0 * POWER(3.0, CAST(event_id % 5 AS DOUBLE)) AS delay_sec
        FROM events
        WHERE event_type = 'error'
        ORDER BY event_id
    """,
    "cdc_payload_parse": """
        SELECT event_id,
               CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
        ORDER BY event_id
    """,
    "cdc_dlq_routing": """
        SELECT CASE WHEN event_type = 'error' AND value > 180.0 THEN 'events_final_errors'
                    WHEN event_type = 'error' THEN 'events_delayed_errors'
                    ELSE 'events_success' END AS counter_type,
               COUNT(*) AS events
        FROM events
        GROUP BY 1
        ORDER BY counter_type
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l.l_orderkey,
               o.o_orderdate,
               o.o_orderpriority,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-04-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q13_customer_distribution": """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0
            GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q18_large_orders": """
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        HAVING SUM(l.l_quantity) > 300.0
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 100
    """,
    "q22_idle_customers": """
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        FROM customer c
        WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
              > (SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                 FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "events_user_deltas": """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN prev_value IS NOT NULL AND value > prev_value
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
               CAST(SUM(CASE WHEN prev_value IS NOT NULL AND value < prev_value
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
               CAST(COALESCE(MAX(date_diff('microsecond', prev_ts, ts)), -1) AS BIGINT) AS max_gap_us
        FROM (
            SELECT user_id, ts, value,
                   LAG(value) OVER w AS prev_value,
                   LAG(ts) OVER w AS prev_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) t
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q5_local_supplier_volume": """
        SELECT n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE s.s_nationkey = c.c_nationkey
          AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC, n.n_name
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 2 AND 4
          AND l_quantity < 24
    """,
    "corpus_dsir_weights": _dsir_sql("weights"),
    "corpus_dsir_sample": _dsir_sql("sample"),
    "corpus_divergence": _divergence_sql(),
    "q2_min_cost_supplier": """
        WITH eligible AS (
          SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                 MIN(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS min_ep
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
               AND p.p_type = 'STANDARD' AND p.p_size <= 15
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
          GROUP BY 1, 2)
        SELECT CAST(FLOOR(s.s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents,
               s.s_name, n.n_name, e.partkey AS p_partkey, p.p_name,
               e.suppkey AS s_suppkey, e.min_ep AS supplycost_cents
        FROM eligible e
        JOIN part p ON p.p_partkey = e.partkey
        JOIN supplier s ON s.s_suppkey = e.suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE e.min_ep = (SELECT MIN(e2.min_ep) FROM eligible e2
                          WHERE e2.partkey = e.partkey)
        ORDER BY s_acctbal_cents DESC, n.n_name, s.s_name, p_partkey
        LIMIT 100
    """,
    "q8_market_share": """
        WITH l AS (
          SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(FLOOR(li.l_extendedprice * (1 - li.l_discount) * 100 + 0.5) AS BIGINT) AS rev,
                 CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS is_t
          FROM lineitem li
          JOIN part p ON p.p_partkey = li.l_partkey AND p.p_type = 'ECONOMY'
          JOIN supplier s ON s.s_suppkey = li.l_suppkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          JOIN orders o ON o.o_orderkey = li.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
          WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-01-01')
        SELECT o_year,
               CAST(SUM(CASE WHEN is_t = 1 THEN rev ELSE 0 END) AS BIGINT) AS target_rev_cents,
               CAST(SUM(rev) AS BIGINT) AS total_rev_cents,
               ROUND(CAST(SUM(CASE WHEN is_t = 1 THEN rev ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
        FROM l GROUP BY o_year ORDER BY o_year
    """,
    "q9_product_profit": """
        SELECT n.n_name,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                        - CAST(l.l_quantity AS BIGINT)
                          * CAST(FLOOR(p.p_retailprice * 10 + 0.5) AS BIGINT)) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY n.n_name, o_year
        ORDER BY n.n_name, o_year DESC
    """,
    "q11_important_stock": """
        WITH ps AS (
          SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                 MIN(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS min_ep,
                 CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
          GROUP BY 1, 2
        ), pv AS (
          SELECT partkey AS ps_partkey,
                 CAST(SUM(min_ep * sum_qty) AS BIGINT) AS value_cents
          FROM ps GROUP BY 1)
        SELECT ps_partkey, value_cents FROM pv
        WHERE value_cents * 10000 > (SELECT SUM(value_cents) FROM pv)
        ORDER BY value_cents DESC, ps_partkey
    """,
    "q12_shipping_priority_counts": """
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
          AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus
    """,
    "q16_supplier_count": """
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#4'
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
    "q20_dominant_suppliers": """
        WITH pair AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          GROUP BY 1, 2
        ), tot AS (
          SELECT partkey, SUM(qty) AS total FROM pair GROUP BY 1)
        SELECT DISTINCT pr.suppkey AS s_suppkey, s.s_name
        FROM pair pr
        JOIN tot t ON t.partkey = pr.partkey
        JOIN supplier s ON s.s_suppkey = pr.suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
        WHERE 2 * pr.qty > t.total
        ORDER BY s_suppkey
    """,
    "q21_blamed_suppliers": """
        WITH j AS (
          SELECT l.l_orderkey AS orderkey, l.l_suppkey AS suppkey,
                 CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 365 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F'
        ), stats AS (
          SELECT orderkey, COUNT(DISTINCT suppkey) AS nsupp,
                 COUNT(DISTINCT CASE WHEN late = 1 THEN suppkey END) AS nlate
          FROM j GROUP BY orderkey
        ), blamed AS (
          SELECT DISTINCT j.orderkey, j.suppkey
          FROM j JOIN stats st ON st.orderkey = j.orderkey
          WHERE j.late = 1 AND st.nlate = 1 AND st.nsupp > 1)
        SELECT b.suppkey AS s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM blamed b
        JOIN supplier s ON s.s_suppkey = b.suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
        GROUP BY b.suppkey, s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    "q7_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
            OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q10_returned_items": """
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
               n.n_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_cents DESC, c.c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": """
        WITH t AS (
          SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS promo_rev_cents,
                 CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_cents
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01')
        SELECT promo_rev_cents, total_rev_cents,
               ROUND(100.0 * promo_rev_cents / total_rev_cents, 6) AS promo_share_pct
        FROM t
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_revenue_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT r.s_suppkey, s.s_name, r.total_revenue_cents
        FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
        WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
        ORDER BY r.s_suppkey
    """,
    "q17_small_quantity_revenue": """
        WITH li AS (
          SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
                 CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_cents
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#4'
        ), s AS (
          SELECT l_partkey, SUM(qty) AS sum_q, COUNT(*) AS cnt
          FROM li GROUP BY l_partkey)
        SELECT CAST(COALESCE(SUM(li.ep_cents), 0) AS BIGINT) AS total_revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COALESCE(SUM(li.ep_cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
        FROM li JOIN s ON s.l_partkey = li.l_partkey
        WHERE 5 * li.qty * s.cnt < s.sum_q
    """,
    "q19_disjunctive_revenue": """
        SELECT CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    "join_broadcast": """
        SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    "join_bloom_prefilter": f"""
        SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = {_BLOOM_NATION}
        GROUP BY l_suppkey
        ORDER BY suppkey
    """,
    "join_hash": """
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "events_tumbling_window": """
        SELECT user_id,
               time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY user_id, time_bucket(INTERVAL '10 minutes', ts)
        ORDER BY user_id, window_start
    """,
    "events_hopping_window": """
        SELECT ws AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                           time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
                   value
            FROM events
        )
        GROUP BY ws
        ORDER BY ws
    """,
    "events_asof_join": """
        SELECT event_id, user_id,
               CAST(COALESCE(last_click_id, -1) AS BIGINT) AS last_click_id
        FROM (
            SELECT event_id, user_id, event_type,
                   LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ) t
        WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "events_value_quantiles": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.9), 6) AS p90,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "events_hourly_rollup": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               CAST(COALESCE(hour, -1) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT event_type, EXTRACT(hour FROM ts) AS hour FROM events)
        GROUP BY ROLLUP (event_type, hour)
        ORDER BY event_type, hour
    """,
    "distinct_users_per_type": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "sessionize": """
        SELECT user_id,
               CAST(SUM(CASE WHEN gap THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes' AS gap
            FROM events
        ) t
        GROUP BY user_id
        ORDER BY user_id
    """,
    "top_events_per_user": """
        SELECT user_id, rk, event_id, value
        FROM (
            SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
            FROM events
        ) t
        WHERE rk <= 3
        ORDER BY user_id, rk
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_md5,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS dup_count
        FROM documents
        GROUP BY md5(text)
        ORDER BY content_md5
    """,
    "dedup_minhash": _minhash_sql(),
    "dedup_simhash": r"""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
        ), w AS (
          SELECT doc_id, unnest(ws) AS word FROM t
        ), h AS (
          -- md5_number_upper = little-endian first 8 md5 bytes, the exact
          -- word hash SimHasher uses
          SELECT doc_id, md5_number_upper(word) AS h FROM w
        ), bits AS (
          SELECT doc_id, b AS bit,
                 SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
          GROUP BY doc_id, b
        ), sh AS (
          SELECT doc_id,
                 SUM(CASE WHEN s > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END) AS simhash
          FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(sh.simhash, 0)::UBIGINT AS simhash,
               (COALESCE(sh.simhash, 0) & 65535)::BIGINT AS simhash_band_0,
               ((COALESCE(sh.simhash, 0) >> 16) & 65535)::BIGINT AS simhash_band_1
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN sh ON sh.doc_id = d.doc_id
        ORDER BY d.doc_id
    """,
    "dedup_jaccard": _JACCARD_EXACT_SQL,
    "dedup_minhash_recall": _dedup_recall_sql(),
    "knn_filtered": """
        SELECT query_id, neighbor_id, rank, cosine
        FROM (
            SELECT q.vec_id AS query_id,
                   v.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                                v.vec_id ASC
                   ) AS rank,
                   ROUND(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings q
            JOIN embeddings v
              ON v.vec_id <> q.vec_id AND v.label = 2 AND v.vec_id % 3 = 0
            WHERE q.vec_id IN (0, 1, 2, 3, 4)
        ) t
        WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    "knn_bruteforce": """
        SELECT query_id, neighbor_id, rank, cosine
        FROM (
            SELECT q.vec_id AS query_id,
                   v.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                                v.vec_id ASC
                   ) AS rank,
                   ROUND(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings q
            JOIN embeddings v ON v.vec_id <> q.vec_id
            WHERE q.vec_id IN (0, 1, 2, 3, 4)
        ) t
        WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    "dedup_embedding": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
        ORDER BY a_id, b_id
    """,
    "text_tokens": """
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               CASE WHEN LENGTH(text) = 0 THEN 0
                    ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
               END AS n_tokens
        FROM documents
        ORDER BY doc_id
    """,
    # mirrors QualityScorer exactly: words = [a-z']+ over lowercased text
    "text_quality": r"""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS ws
          FROM documents
        )
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CASE WHEN len(ws) = 0 THEN 0.0
                    ELSE ROUND(CAST(len(list_filter(ws, x -> x IN """
    + STOPWORDS_SQL
    + r""")) AS DOUBLE) / len(ws), 6) END AS stopword_ratio,
               CASE WHEN len(ws) = 0 THEN 0.0
                    ELSE ROUND(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                               / len(ws), 6) END AS mean_word_len
        FROM t
        ORDER BY doc_id
    """,
    "text_fingerprint": """
        SELECT doc_id, md5(lower(trim(text))) AS fingerprint_md5
        FROM documents
        ORDER BY doc_id
    """,
    # mirrors text_pii_scrub: identical deterministic PII injection, then
    # RE2 patterns identical to PiiScrubber.{EMAIL,IPV4,PHONE}; counts on
    # the augmented text, redaction order email -> ip -> phone
    "text_pii_scrub": r"""
        WITH aug AS (
          SELECT doc_id,
                 COALESCE(text, '') || ' contact user' || doc_id || '@example.com'
                   || CASE WHEN doc_id % 2 = 0
                        THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                        ELSE '' END
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' call +1-' || (100 + doc_id % 900) || '-'
                             || (100 + (doc_id * 7) % 900) || '-'
                             || (1000 + doc_id % 9000)
                        ELSE '' END AS t
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(t,
                 '\+\d{1,3}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\+\d{1,3}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS scrubbed_md5
        FROM aug
        ORDER BY doc_id
    """,
    "approx_distinct_hll": _hll_sql(),
    "approx_distinct_by_source": _hll_sql(group_col="source"),
    "text_countmin": _cms_sql(),
    # mirrors dedup_substrings/WinnowStage: same injection, same 8-gram
    # md5_number_upper hashes, window-min over 4 positions (guard =
    # lead(h,3) keeps only windows fully inside the doc), DISTINCT
    # (doc, fp), hot-bucket cap 64, pair-count
    "dedup_substrings": f"""
        WITH aug AS (
          SELECT doc_id, COALESCE(text, '')
            || CASE WHEN doc_id % 50 = 0 THEN ' {_BOILER_A}' ELSE '' END
            || CASE WHEN doc_id % 77 = 0 THEN ' {_BOILER_B}' ELSE '' END AS t
          FROM documents
        ),
        tok AS (
          SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
          FROM (SELECT doc_id, regexp_extract_all(lower(t), '[a-z0-9_]+') AS ws
                FROM aug)
        ),
        seq AS (
          SELECT doc_id, i, w,
                 {", ".join(f"lead(w, {k}) OVER win AS w{k}" for k in range(1, 8))}
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        ),
        grams AS (
          SELECT doc_id, i,
                 md5_number_upper(w || ' ' ||
                   {" || ' ' || ".join(f"w{k}" for k in range(1, 8))}) AS h
          FROM seq WHERE w7 IS NOT NULL
        ),
        winmin AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                 lead(h, 3) OVER (PARTITION BY doc_id ORDER BY i) AS guard
          FROM grams
        ),
        sel AS (SELECT DISTINCT doc_id, fp FROM winmin WHERE guard IS NOT NULL),
        bs AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sel a
          JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
          JOIN bs ON a.fp = bs.fp
        )
        SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pairs GROUP BY doc_a, doc_b
        ORDER BY doc_a, doc_b
    """,
    # min-ts chaining: step i's per-user time = earliest event of that type
    # STRICTLY after the user's step-(i-1) time (mirrors events_funnel)
    "events_funnel": """
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
          WHERE e.event_type = 'view' GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
          WHERE e.event_type = 'click' GROUP BY e.user_id
        ), s4 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
                 CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
          UNION ALL SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
          UNION ALL SELECT 3, 'click', CAST(COUNT(*) AS BIGINT) FROM s3
          UNION ALL SELECT 4, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s4
        ) ORDER BY step_idx
    """,
    "events_retention": """
        WITH firstd AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
        ), act AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        )
        SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_date,
               CAST(a.d - f.d0 AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM act a JOIN firstd f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    # DuckDB median == quantile_cont(0.5) == np.median (linear midpoint)
    "events_anomaly": """
        WITH med AS (
          SELECT event_type, median(value) AS med FROM events GROUP BY event_type
        ), mad AS (
          SELECT e.event_type, median(abs(e.value - m.med)) AS mad
          FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               ROUND((e.value - m.med) / d.mad, 6) AS robust_z
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        WHERE d.mad > 0 AND abs(e.value - m.med) > 3 * d.mad
        ORDER BY e.event_id
    """,
    "events_decayed_score": _DECAYED_SCORE_SQL,
    "events_heavy_hitters": _HEAVY_HITTERS_SQL,
    "events_debounce": _DEBOUNCE_SQL,
    "cdc_txn_batches": _txn_batches_sql(),
    "events_running_totals": """
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
               CAST(floor(SUM(value) OVER w * 100 + 0.5) AS BIGINT)
                 AS running_sum_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """,
    # the batch LSH pipeline restricted to pairs involving a new doc
    # (b_id >= cutoff; a_id < b_id, so b_id carries the "any new" test) —
    # value-locks incremental and batch semantics to each other
    "dedup_minhash_incremental": f"""
        WITH pairs AS ({_minhash_sql()})
        SELECT a_id, b_id, jac FROM pairs
        WHERE b_id >= (SELECT (MAX(doc_id) + 1) * 4 // 5 FROM documents)
        ORDER BY a_id, b_id
    """,
    # mirrors weighted_sample_es: u = (md5-bytes[0:4](id) + 1)/2^32,
    # key = ln(u)/weight, top-k by key
    "corpus_sample_weighted": f"""
        WITH h AS (
          SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx
          FROM documents WHERE n_chars > 0
        ),
        keyed AS (
          SELECT doc_id, n_chars,
                 ln(({_md5_byte_sql(0)} * 16777216 + {_md5_byte_sql(1)} * 65536
                     + {_md5_byte_sql(2)} * 256 + {_md5_byte_sql(3)} + 1)
                    / 4294967296.0) / n_chars AS es_key
          FROM h
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, ROUND(es_key, 6) AS es_key
        FROM (SELECT * FROM keyed ORDER BY es_key DESC LIMIT 100)
        ORDER BY doc_id
    """,
    # generated from the same _QSKETCH_QS literal; sample = same KMV
    # bottom-k the corpus_sample_bottomk oracle draws
    "events_quantile_sketch": (
        """
        WITH s AS (
          SELECT value FROM (
            SELECT value, md5(CAST(event_id AS VARCHAR)) AS h FROM events
            ORDER BY h LIMIT 500
          )
        )
        """
        + "\nUNION ALL\n".join(
            f"SELECT CAST({q} AS DOUBLE) AS q,"
            f" ROUND(quantile_cont(value, {q}), 6) AS estimate FROM s"
            for q in _QSKETCH_QS
        )
        + "\nORDER BY q"
    ),
    # mirrors cdc_scd2_history: lead() over ALL events per key (tombstones
    # close predecessors), then drop tombstone rows
    "cdc_scd2_history": """
        SELECT user_id, valid_from_id,
               CAST(valid_to_id AS DOUBLE) AS valid_to_id, event_type, value,
               CAST(CASE WHEN valid_to_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS is_current
        FROM (
            SELECT user_id,
                   event_id AS valid_from_id,
                   lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
                     AS valid_to_id,
                   event_type, value
            FROM events
        )
        WHERE event_type <> 'error'
        ORDER BY user_id, valid_from_id
    """,
    "corpus_sample_bottomk": """
        SELECT doc_id, sample_hash FROM (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_hash
            FROM documents ORDER BY sample_hash LIMIT 100
        )
        ORDER BY doc_id
    """,
    # generated from the same _RANGE_BANDS literal so the two sides can't
    # drift; LEFT JOIN keeps bands no event falls into
    "events_range_join": f"""
        WITH bands(band_id, lo, hi) AS (VALUES
            {", ".join(f"({i}, {lo!r}, {hi!r})" for i, lo, hi in _RANGE_BANDS)})
        SELECT b.band_id,
               CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
               CAST(floor(COALESCE(SUM(e.value), 0) * 100 + 0.5) AS BIGINT)
                 AS sum_value_cents
        FROM bands b
        LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band_id
        ORDER BY b.band_id
    """,
    # mirrors bigram_lm_scores(sample_mod=5, alpha=0.1): same tokenization,
    # same training sample, c1 derived as the bigram-left marginal, V =
    # training docs' distinct tokens (all positions)
    "text_lm_perplexity": r"""
        WITH tok AS (
          SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
                FROM documents)
        ),
        big AS (
          SELECT doc_id, w AS w1,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
          FROM tok
        ),
        train_big AS (
          SELECT w1, w2 FROM big WHERE doc_id % 5 = 0 AND w2 IS NOT NULL
        ),
        c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM train_big GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS n1 FROM train_big GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w) AS vsz FROM tok WHERE doc_id % 5 = 0),
        scored AS (
          SELECT b.doc_id,
                 -ln((COALESCE(c2.n2, 0) + 0.1)
                     / (COALESCE(c1.n1, 0) + 0.1 * v.vsz)) AS nll
          FROM big b
          LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
          LEFT JOIN c1 ON b.w1 = c1.w1
          CROSS JOIN v
          WHERE b.w2 IS NOT NULL
        ),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 ROUND(AVG(nll), 6) AS avg_nll
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(a.n_bigrams, 0) AS n_bigrams,
               COALESCE(a.avg_nll, 0.0) AS avg_nll
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """,
    # mirrors text_c4_filter: identical line injection; keep = trimmed line
    # ends in [.!?"] AND has >= 5 space-delimited words; doc drop = lorem
    # ipsum / curly brace; cleaned = kept ORIGINAL lines joined by \n
    "text_c4_filter": r"""
        WITH aug AS (
          SELECT doc_id,
                 COALESCE(text, '') || chr(10) || 'Document ' || doc_id
                      || ' is verified and ends properly.'
                   || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'too short.'
                        ELSE '' END
                   || CASE WHEN doc_id % 3 = 0 THEN chr(10)
                        || 'this line is long enough but lacks terminal punctuation'
                        ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN chr(10)
                        || 'lorem ipsum dolor sit amet makes this document drop.'
                        ELSE '' END AS t
          FROM documents
        ),
        lines AS (
          SELECT doc_id,
                 unnest(string_split(t, chr(10))) AS line,
                 generate_subscripts(string_split(t, chr(10)), 1) AS i
          FROM aug
        ),
        flags AS (
          SELECT doc_id, line, i,
                 (regexp_matches(trim(line), '[.!?"]$')
                  AND length(trim(line)) - length(replace(trim(line), ' ', '')) + 1 >= 5)
                 AS keep
          FROM lines
        ),
        agg AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_lines_total,
                 CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
                 md5(COALESCE(string_agg(CASE WHEN keep THEN line END,
                                         chr(10) ORDER BY i), '')) AS cleaned_md5
          FROM flags GROUP BY doc_id
        )
        SELECT a.doc_id, a.n_lines_total, a.n_lines_kept,
               CAST(CASE WHEN contains(lower(g.t), 'lorem ipsum')
                          OR contains(g.t, '{') THEN 1 ELSE 0 END AS BIGINT)
                 AS c4_doc_drop,
               a.cleaned_md5
        FROM agg a JOIN aug g USING (doc_id)
        ORDER BY a.doc_id
    """,
    # mirrors RepetitionScorer: lines split on \n (empties kept), words =
    # [a-z0-9_]+ over lowered text, top-2-gram tie-break (cnt, glen, gram)
    "text_repetition": r"""
        WITH lines AS (
          SELECT doc_id, unnest(string_split(COALESCE(text, ''), chr(10))) AS line
          FROM documents
        ),
        lagg AS (
          SELECT doc_id, line, COUNT(*) AS cnt, length(line) AS chars
          FROM lines GROUP BY doc_id, line
        ),
        lstats AS (
          SELECT doc_id, SUM(cnt) AS n_lines, COUNT(*) AS n_distinct,
                 SUM((cnt - 1) * chars) AS excess_chars,
                 SUM(cnt * chars) AS tot_line_chars
          FROM lagg GROUP BY doc_id
        ),
        tok AS (
          SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
                FROM documents)
        ),
        wstats AS (
          SELECT doc_id, SUM(length(w)) AS wchars, COUNT(*) AS n_words
          FROM tok GROUP BY doc_id
        ),
        seq AS (
          SELECT doc_id, i, w, length(w) AS wlen,
                 lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2,
                 lead(w, 3) OVER win AS w3, lead(w, 4) OVER win AS w4
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        ),
        c2 AS (
          SELECT doc_id, w || ' ' || w1 AS gram, COUNT(*) AS cnt,
                 MIN(length(w) + length(w1)) AS glen
          FROM seq WHERE w1 IS NOT NULL GROUP BY doc_id, gram
        ),
        top2 AS (
          SELECT doc_id, cnt * glen AS top_chars
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY cnt DESC, glen DESC, gram ASC) AS rn FROM c2)
          WHERE rn = 1
        ),
        c5 AS (
          SELECT doc_id, w || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4 AS gram,
                 COUNT(*) AS cnt,
                 MIN(length(w) + length(w1) + length(w2) + length(w3) + length(w4)) AS glen
          FROM seq WHERE w4 IS NOT NULL GROUP BY doc_id, gram
        ),
        dup5 AS (
          SELECT doc_id, SUM(cnt * glen) AS dup_chars FROM c5 WHERE cnt > 1
          GROUP BY doc_id
        )
        SELECT l.doc_id,
               CAST(l.n_lines AS BIGINT) AS n_lines,
               CAST(COALESCE(w.n_words, 0) AS BIGINT) AS n_words_rep,
               ROUND((l.n_lines - l.n_distinct)::DOUBLE / l.n_lines, 6) AS dup_line_frac,
               ROUND(l.excess_chars::DOUBLE / GREATEST(l.tot_line_chars, 1), 6) AS dup_line_char_frac,
               ROUND(COALESCE(t2.top_chars, 0)::DOUBLE
                     / GREATEST(COALESCE(w.wchars, 0), 1), 6) AS top_2gram_char_frac,
               ROUND(COALESCE(d5.dup_chars, 0)::DOUBLE
                     / GREATEST(COALESCE(w.wchars, 0), 1), 6) AS dup_5gram_char_frac
        FROM lstats l
        LEFT JOIN wstats w USING (doc_id)
        LEFT JOIN top2 t2 USING (doc_id)
        LEFT JOIN dup5 d5 USING (doc_id)
        ORDER BY doc_id
    """,
    "corpus_clean": """
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        WHERE len(string_split(text, ' ')) >= 20
          AND CAST(len(list_filter(string_split(text, ' '), x -> x IN """
    + STOPWORDS_SQL
    + """)) AS DOUBLE) / len(string_split(text, ' ')) >= 0.02
        GROUP BY md5(text)
        ORDER BY doc_id
    """,
    "corpus_split": _corpus_split_sql(),
    # sequence packing: global prefix sum over the id-ordered token stream,
    # chunked every 2048 tokens (same n_tokens semantics as text_tokens)
    "corpus_pack": """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN COALESCE(LENGTH(text), 0) = 0 THEN 0
                      ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                 END AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
          FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(off // 2048 AS BIGINT) AS pack_id,
               CAST(off % 2048 AS BIGINT) AS pack_offset
        FROM c
        ORDER BY doc_id
    """,
    "corpus_sample": _corpus_sample_sql(),
    # epoch shuffle: same (md5(id:epoch), id) order, dense 0-based rank
    "corpus_shuffle": """
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR) || ':5'), doc_id
               ) - 1 AS BIGINT) AS pos
        FROM documents
        ORDER BY doc_id
    """,
    "dedup_clusters": _clusters_sql(),
    "corpus_prep": _corpus_prep_sql(),
    "pq_codes": _pq_sql(),
    "ann_pq": _pq_sql(final="topk", query_ids=[0, 1, 2, 3, 4], k=10),
    "ann_pq_rerank": _pq_rerank_sql(),
    # incremental dedup via CDC replay: converged lake == arg-max doc per
    # distinct content (op=I stream keyed by md5(text))
    "dedup_incremental": """
        SELECT md5(text) AS content_md5,
               CAST(MAX(doc_id) AS BIGINT) AS keep_id
        FROM documents
        GROUP BY md5(text)
        ORDER BY content_md5
    """,
    # mixture rates: same whitespace n_tokens semantics, closed-form
    # clip(target*budget/tokens); generated from the same constants
    "corpus_mixture": f"""
        WITH t AS (
          SELECT source,
                 CASE WHEN COALESCE(LENGTH(text), 0) = 0 THEN 0
                      ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                 END AS n_tokens
          FROM documents
        ), agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
          FROM t GROUP BY source
        ), tgt(source, share) AS (VALUES
          {", ".join(f"('{s}', {v})" for s, v in MIXTURE_TARGETS.items())}
        )
        SELECT a.source, a.n_docs, a.n_tokens,
               ROUND(LEAST(1.0, COALESCE(tg.share, 0)
                     / {sum(MIXTURE_TARGETS.values())}
                     * {MIXTURE_BUDGET} / a.n_tokens), 6) AS rate
        FROM agg a LEFT JOIN tgt tg USING (source)
        ORDER BY a.source
    """,
    # binary plumbing value check over the staged media parquet (the
    # flagship-oracle staging pattern; sha256/octet_length on the BLOB col)
    "multimodal_inventory": f"""
        SELECT media_id,
               md5(hex(payload)) AS payload_hex_md5,
               CAST(octet_length(payload) AS BIGINT) AS payload_bytes
        FROM read_parquet('{_stage_media()}')
        ORDER BY media_id
    """,
    # TF-IDF: rank on the ROUNDED score (both sides) so libm-ulp differences
    # in ln() cannot flip an ordering
    "text_tfidf": r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ), df AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ), n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n
        ), ranked AS (
          SELECT doc_id, term, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
                 ) AS BIGINT) AS rank
          FROM scored
        )
        SELECT doc_id, term, rank, score FROM ranked
        WHERE rank <= 3
        ORDER BY doc_id, rank
    """,
    # engine intersects 64-bit shingle hashes, the oracle the gram strings
    # (equivalent up to the documented ~n²/2⁶⁴ collision bound)
    "text_tfidf_simjoin": r"""
        WITH docs AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
          FROM documents
        ), grams AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE [array_to_string(w[i:i+2], ' ')
                       for i in generate_series(1, len(w) - 2)] END)) AS term
          FROM docs WHERE len(w) > 0
        ), df AS (
          SELECT term, COUNT(*) AS df FROM grams GROUP BY term
        ), n AS (SELECT COUNT(*) AS n FROM documents),
        wt AS (
          -- vector space = shingles with df <= 20; weight = ln(N/df)
          SELECT g.doc_id, g.term, LN(CAST(n.n AS DOUBLE) / df.df) AS w
          FROM grams g JOIN df USING (term) CROSS JOIN n
          WHERE df.df <= 20
        ), nw AS (
          SELECT doc_id, term,
                 w / sqrt(SUM(w * w) OVER (PARTITION BY doc_id)) AS w
          FROM wt
        ), p AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 ROUND(SUM(a.w * b.w), 6) AS cosine
          FROM nw a JOIN nw b ON b.term = a.term AND b.doc_id > a.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id, b_id, cosine FROM p
        WHERE cosine >= 0.5 ORDER BY a_id, b_id
    """,
    # every ratio rule re-derived in integer arithmetic (10*x <= k*y), the
    # exact comparisons GopherRulesFilter makes — no float boundary exists
    "text_gopher_rules": r"""
        WITH base AS (
          SELECT doc_id, coalesce(text, '') AS t,
                 regexp_extract_all(lower(coalesce(text, '')), '\w+') AS w,
                 string_split(coalesce(text, ''), chr(10)) AS ls
          FROM documents
        ), m AS (
          SELECT doc_id,
            len(w) AS n_words,
            len(ls) AS n_lines,
            coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS sum_wlen,
            len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
            len(list_distinct(list_filter(w, x -> x IN
              ('the','be','to','of','and','that','have','with')))) AS n_stop,
            length(t) - length(replace(t, '#', '')) AS n_hash,
            (length(t) - length(replace(t, '...', ''))) / 3 AS n_ellipsis,
            len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*•]'))) AS n_bullet,
            len(list_filter(ls, x -> regexp_matches(x, '\.\.\.\s*$'))) AS n_ell_end
          FROM base
        ), r AS (
          SELECT doc_id, n_words, n_lines,
            (n_words >= 30 AND n_words <= 100000) AS r_word_count,
            (n_words > 0 AND sum_wlen >= 3 * n_words
                         AND sum_wlen <= 10 * n_words) AS r_mean_len,
            (10 * (n_hash + n_ellipsis) <= n_words) AS r_symbol,
            (10 * n_bullet <= n_lines) AS r_bullets,
            (10 * n_ell_end <= 3 * n_lines) AS r_ellipsis,
            (10 * n_alpha >= 8 * n_words) AS r_alpha,
            (n_stop >= 2) AS r_stop
          FROM m
        )
        SELECT *, (r_word_count AND r_mean_len AND r_symbol AND r_bullets
                   AND r_ellipsis AND r_alpha AND r_stop) AS keep
        FROM r ORDER BY doc_id
    """,
    # decontamination: same word-3-gram sets as the minhash gram CTE; the
    # engine intersects md5 hashes, the oracle the gram strings (equivalent)
    "corpus_decontaminate": r"""
        WITH docs AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
        ), grams AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(w) = 0 THEN ['']
                 WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE [array_to_string(w[i:i+2], ' ')
                       FOR i IN generate_series(1, len(w) - 2)]
            END) AS gs
          FROM docs
        ), g AS (
          SELECT doc_id, unnest(gs) AS gr FROM grams
        ), bench AS (
          SELECT DISTINCT gr FROM g WHERE doc_id % 97 = 0
        ), hits AS (
          SELECT g.doc_id, COUNT(*) AS n
          FROM g JOIN bench USING (gr)
          WHERE g.doc_id % 97 <> 0
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
               COALESCE(h.n, 0) >= 1 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 97 <> 0
        ORDER BY d.doc_id
    """,
    # heavy hitters: token-stream unnest + count, same (n DESC, token) order
    # and k-cut as top_tokens
    "text_nb_train": _nb_train_sql(),
    "text_nb_classify": _nb_classify_sql(),
    "text_topk_tokens": r"""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 50
    """,
    "text_langid": _langid_sql(),
    "cdc_flagship_replay": _flagship_sql(),
    "cdc_view_maintenance": _view_maintenance_sql(),
    # delta-mode IVM must converge to the identical batch recompute
    "cdc_view_maintenance_delta": _view_maintenance_sql(),
    "cdc_produce_delivery": _produce_sql(),
    # consumer-rebuilt state must equal the state SQL derives from the RAW
    # chunks — the oracle is exactly the flagship-replay oracle on purpose
    "cdc_consumer_state": _flagship_sql(),
    "events_pagerank": _pagerank_sql(),
    "graph_triangles": _triangles_sql(),
    # orientation-invariant: degree orientation must reproduce the id-
    # oriented result exactly, so the oracle is the same triple join
    "graph_triangles_degree": _triangles_sql(),
    "events_cube": """
        SELECT COALESCE(event_type, '#all') AS event_type,
               CAST(COALESCE(h, -1) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM (
          SELECT event_type,
                 CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
        )
        GROUP BY CUBE(event_type, h)
        ORDER BY event_type, hour
    """,
    "events_ntile": """
        WITH ranked AS (
          SELECT value, NTILE(4) OVER (ORDER BY value, event_id) AS bucket
          FROM events
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM ranked GROUP BY bucket ORDER BY bucket
    """,
    "dedup_embedding_lsh": _embedding_lsh_sql(),
    "ann_lsh": _ann_lsh_sql(),
    "ann_lsh_mp": _ann_lsh_sql(multiprobe=2),
    "ann_ivf": _ivf_sql(),
    "ann_ivf_mp": _ivf_sql(n_probe=8),
    # incremental index converges to the batch corpus, so it must answer
    # exactly like batch IVF — identity is the value lock
    "ann_ivf_incremental": _ivf_sql(),
    # incremental DF converges to batch DF over the same tokenizer
    "text_df_incremental": """
        SELECT term, df FROM (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+')) AS term
            FROM documents)
          GROUP BY term
        ) ORDER BY df DESC, term ASC LIMIT 50
    """,
    # recall@10 = overlap of each approximate ranking with the exact one;
    # every ranking is the SAME SQL its own oracle uses, nested verbatim
    "ann_recall": f"""
        WITH ex AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                     v.embedding::DOUBLE[]) DESC,
                              v.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
            WHERE q.vec_id IN (0, 1, 2, 3, 4)
          ) WHERE rank <= 10
        ), lsh AS (
          SELECT query_id, neighbor_id FROM ({_ann_lsh_sql()})
        ), lsh_mp AS (
          SELECT query_id, neighbor_id FROM ({_ann_lsh_sql(multiprobe=2)})
        ), ivf AS (
          SELECT query_id, neighbor_id FROM ({_ivf_sql()})
        ), ivf_mp AS (
          SELECT query_id, neighbor_id FROM ({_ivf_sql(n_probe=8)})
        ), pq AS (
          SELECT query_id, neighbor_id FROM ({_pq_sql(final="topk", query_ids=[0, 1, 2, 3, 4], k=10)})
        ), pq_rr AS (
          SELECT query_id, neighbor_id FROM ({_pq_rerank_sql()})
        ), qs AS (
          SELECT DISTINCT query_id FROM ex
        ), hits AS (
          SELECT 'lsh' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN lsh a USING (query_id, neighbor_id) GROUP BY e.query_id
          UNION ALL
          SELECT 'lsh_mp' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN lsh_mp a USING (query_id, neighbor_id) GROUP BY e.query_id
          UNION ALL
          SELECT 'ivf' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN ivf a USING (query_id, neighbor_id) GROUP BY e.query_id
          UNION ALL
          SELECT 'ivf_mp' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN ivf_mp a USING (query_id, neighbor_id) GROUP BY e.query_id
          UNION ALL
          SELECT 'pq' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN pq a USING (query_id, neighbor_id) GROUP BY e.query_id
          UNION ALL
          SELECT 'pq_rerank' AS method, e.query_id, COUNT(*) AS n
          FROM ex e JOIN pq_rr a USING (query_id, neighbor_id) GROUP BY e.query_id
        )
        SELECT m.method, qs.query_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
               CAST(COALESCE(h.n, 0) AS DOUBLE) / 10.0 AS recall
        FROM (VALUES ('ivf'), ('ivf_mp'), ('lsh'), ('lsh_mp'), ('pq'), ('pq_rerank')) AS m(method)
        CROSS JOIN qs
        LEFT JOIN hits h ON h.method = m.method AND h.query_id = qs.query_id
        ORDER BY m.method, qs.query_id
    """,
    "dedup_semantic": _semdedup_sql(),
    "corpus_quality_cut": r"""
        WITH s AS (
          SELECT doc_id, source,
                 CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                             '[a-z'']+')) AS BIGINT) AS n_words
          FROM documents
        ), th AS (
          SELECT source, n_words AS thr FROM (
            SELECT source, n_words,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_words) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM s) WHERE rn = (n + 1) // 2
        )
        SELECT s.doc_id, s.source, s.n_words
        FROM s JOIN th USING (source)
        WHERE s.n_words >= th.thr
        ORDER BY s.doc_id
    """,
    "text_bm25_topk": _BM25_SQL,
    # incremental postings/doclen lake state converges to the batch corpus,
    # so the value oracle is the SAME batch BM25 re-derivation
    "text_bm25_incremental": _BM25_SQL,
    "hybrid_rrf_topk": f"""
        WITH bm AS (
          SELECT query_id, doc_id, rank FROM ({_BM25_SQL})
        ), kn AS (
          SELECT query_id, neighbor_id AS doc_id, rank FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                     v.embedding::DOUBLE[]) DESC,
                              v.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
            WHERE q.vec_id IN (0, 1, 2)
          ) WHERE rank <= 10
        ), u AS (
          SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM bm
          UNION ALL
          SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM kn
        ), f AS (
          SELECT query_id, doc_id, ROUND(SUM(c), 6) AS rrf,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ROUND(SUM(c), 6) DESC, doc_id) AS rank
          FROM u GROUP BY query_id, doc_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
               CAST(rank AS BIGINT) AS rank, rrf
        FROM f WHERE rank <= 10 ORDER BY query_id, rank
    """,
    "embedding_kmeans": _kmeans_full_sql(),
    "embedding_covariance": """
        WITH e AS (
          SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
          FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
        )
        SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(SUM(a.x * b.x) / COUNT(*)
                     - (SUM(a.x) / COUNT(*)) * (SUM(b.x) / COUNT(*)), 6) AS cov
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
        GROUP BY a.i, b.i
        ORDER BY i, j
    """,
    "events_unpivot": """
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "events_cep_match": """
        SELECT p.event_id, p.user_id,
               CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_24h
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL '24 hours' AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
        HAVING COUNT(c.event_id) >= 2
        ORDER BY p.event_id
    """,
    "events_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "events_holt": _holt_sql(),
    "events_gap_fill": """
        WITH counts AS (
            SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM counts),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
            FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events)
        SELECT t.event_type, s.hr AS hour_start,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.hr = s.hr
        ORDER BY t.event_type, s.hr
    """,
    "events_user_paths": """
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM (
            SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM (
                SELECT user_id, ts, event_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ) t
            WHERE rn <= 8
            GROUP BY user_id
        ) p
        GROUP BY path
        ORDER BY n_users DESC, path
    """,
    "embedding_centroids": """
        WITH e AS (
          SELECT label, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
          FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings)
        )
        SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
               ROUND(SUM(x) / COUNT(*), 6) AS centroid_x,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM e GROUP BY label, i
        ORDER BY label, i
    """,
    "corpus_cap_source": """
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR) || ':23'),
                            doc_id) AS rn
          FROM documents)
        WHERE rn <= 10 ORDER BY doc_id
    """,
    "corpus_chunk": """
        WITH c AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, CAST(ceil(length(text) / 150.0) AS BIGINT) - 1)) AS gs
          FROM documents WHERE length(text) > 0
        )
        SELECT doc_id, CAST(gs AS BIGINT) AS chunk_idx,
               substring(text, CAST(gs * 150 + 1 AS INT), 200) AS chunk_text,
               CAST(length(substring(text, CAST(gs * 150 + 1 AS INT), 200))
                    AS BIGINT) AS n_chunk_chars
        FROM c ORDER BY doc_id, chunk_idx
    """,
    "corpus_bloom_dedup": _bloom_sql(),
    "dedup_passages": f"""
        WITH inj AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0
                      THEN '{_PASSAGE_BOILER} ' || COALESCE(text, '')
                      ELSE COALESCE(text, '') END AS text
          FROM documents
        ), c AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, CAST(ceil(length(text) / 120.0) AS BIGINT) - 1)) AS gs
          FROM inj WHERE length(text) > 0
        ), h AS (
          SELECT doc_id,
                 md5(substring(text, CAST(gs * 120 + 1 AS INT), 120)) AS h
          FROM c
        ), m AS (
          SELECT doc_id,
                 CASE WHEN COUNT(*) OVER (PARTITION BY h) > 1 THEN 1 ELSE 0 END
                   AS is_dup
          FROM h
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
               CAST(SUM(is_dup) AS BIGINT) AS n_dup_passages
        FROM m GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup_normalized": """
        WITH base AS (
          SELECT doc_id,
                 'repo ' || CAST(doc_id // 25 AS VARCHAR) || ' sync batch ' ||
                 CAST(doc_id // 25 * 7 + 3 AS VARCHAR) || ' merge queue state'
                   AS b,
                 doc_id % 25 AS v, COALESCE(text, '') AS t
          FROM documents
        ), inj AS (
          SELECT doc_id,
                 CASE v WHEN 0 THEN b WHEN 1 THEN upper(b)
                        WHEN 2 THEN b || '!!!'
                        WHEN 3 THEN replace(b, ' ', '  ')
                        WHEN 4 THEN '  ' || upper(b) || '  '
                        ELSE t END AS text
          FROM base
        ), n AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                   AS norm_md5
          FROM inj
        )
        SELECT norm_md5, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM n GROUP BY norm_md5 ORDER BY keep_id
    """,
    "events_rank_portfolio": """
        SELECT event_id, event_type, hr,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
               CAST(COUNT(*) FILTER (WHERE TRUE) OVER
                    (PARTITION BY event_type, hr ORDER BY cents ASC
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_le,
               CAST(COUNT(*) OVER (PARTITION BY event_type, hr) AS BIGINT) AS n_grp
        FROM (SELECT event_id, event_type, date_trunc('hour', ts) AS hr,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY event_type, hr ORDER BY cents DESC)
        ORDER BY event_id
    """,
    "events_moving_window": """
        SELECT event_id, user_id,
               CAST(SUM(cents) OVER w AS BIGINT) AS w_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS w_n
        FROM (SELECT event_id, ts, user_id,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "embedding_hard_negatives": """
        SELECT query_id, neighbor_id, rank, cosine
        FROM (
            SELECT q.vec_id AS query_id,
                   v.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                                v.vec_id ASC
                   ) AS rank,
                   ROUND(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings q
            JOIN embeddings v ON v.label <> q.label
            WHERE q.vec_id IN (0, 1, 2, 3, 4)
        ) t
        WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    "embedding_pca_power": _pca_power_sql(),
    "embedding_kcenter": _kcenter_sql(),
    "embedding_sq8": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        ex AS (
          SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
          FROM e
        ), rng AS (
          SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY i
        ), raw AS (
          SELECT ex.vec_id, ex.i,
                 CASE WHEN r.mx = r.mn THEN 0.0
                      ELSE ROUND((ex.x - r.mn) / (r.mx - r.mn) * 255, 0) END AS rc
          FROM ex JOIN rng r ON r.i = ex.i
        ), codes AS (
          SELECT vec_id, i,
                 CAST(LEAST(GREATEST(rc, 0.0), 255.0) AS BIGINT) AS code,
                 rc
          FROM raw)
        SELECT vec_id,
               md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)) AS codes_md5,
               CAST(SUM(code) AS BIGINT) AS code_sum,
               CAST(SUM(CASE WHEN rc < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
               CAST(SUM(CASE WHEN rc > 255.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
        FROM codes GROUP BY vec_id
        ORDER BY vec_id
    """,
    "multimodal_decode_real": _decode_real_sql(),
    "multimodal_frames": _frames_sql(),
    "multimodal_phash_dedup": _phash_sql(),
    "dedup_editdistance": _editdistance_sql(),
    "text_keyword_tags": _keyword_tags_sql(),
    "text_pmi_bigrams": _PMI_SQL,
    "dedup_containment": _CONTAINMENT_SQL,
    "cdc_snapshot_diff": _SNAPSHOT_DIFF_SQL,
    "text_ngram_novelty": _NOVELTY_SQL,
    "cdc_gap_audit": _GAP_AUDIT_SQL,
    "multimodal_audio_resample": _audio_resample_sql(),
    "multimodal_audio_vad": _audio_vad_sql(),
    "multimodal_audio_tone": _audio_tone_sql(),
    "multimodal_image_boxblur": _boxblur_sql(),
    "multimodal_image_sobel": _sobel_sql(),
    "multimodal_image_palette": _palette_sql(),
    "multimodal_image_otsu": _otsu_sql(),
    "embedding_triplets": """
        WITH q AS (
          SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id IN (0, 1, 2, 3, 4)
        ),
        scored AS (
          SELECT q.vec_id AS query_id, v.vec_id AS nid,
                 (v.label = q.label) AS same,
                 list_cosine_similarity(q.embedding::DOUBLE[],
                                        v.embedding::DOUBLE[]) AS cos
          FROM q JOIN embeddings v ON v.vec_id <> q.vec_id
        ),
        pos AS (
          SELECT query_id, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, nid) AS rn
          FROM scored WHERE same
        ),
        neg AS (
          SELECT query_id, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, nid) AS rn
          FROM scored WHERE NOT same
        )
        SELECT p.query_id,
               p.nid AS pos_id, ROUND(p.cos, 6) AS pos_cosine,
               n.nid AS neg_id, ROUND(n.cos, 6) AS neg_cosine
        FROM pos p
        JOIN neg n ON n.query_id = p.query_id AND n.rn = 1
        WHERE p.rn = 1
        ORDER BY p.query_id
    """,
    "events_benford": """
        WITH c AS (
          SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
          WHERE value IS NOT NULL AND FLOOR(value * 100 + 0.5) >= 1
        )
        SELECT event_type,
               CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM c GROUP BY event_type, digit
        ORDER BY event_type, digit
    """,
    "multimodal_scene_cuts": _scene_cuts_sql(),
    "multimodal_image_histeq": _histeq_sql(),
    "cdc_ordering_inversions": _ORDERING_INV_SQL,
    "events_nearest_join": _NEAREST_JOIN_SQL,
    "multimodal_image_crop": _image_crop_sql(),
    "events_markov_transitions": _MARKOV_SQL,
    "events_burst_window": _BURST_SQL,
    "corpus_interleave": _INTERLEAVE_SQL,
    "events_skyline": _SKYLINE_SQL,
    "events_data_quality": _DATA_QUALITY_SQL,
    "events_quantile_histogram": _QUANTILE_HIST_SQL,
    "events_outlier_mad": _OUTLIER_MAD_SQL,
    "join_skew_salted": _SKEW_JOIN_SQL,
    "cdc_checksum_reconcile": _CHECKSUM_RECONCILE_SQL,
    "events_attribution": _ATTRIBUTION_SQL,
    "corpus_dup_stats": _DUP_STATS_SQL,
    "text_skipgrams": _SKIPGRAM_SQL,
    "events_window_distinct": _WINDOW_DISTINCT_SQL,
    "corpus_rag_chunks": _RAG_CHUNKS_SQL,
    "events_zorder": _ZORDER_SQL,
    "events_dwell_time": _DWELL_SQL,
    "events_abtest": _ABTEST_SQL,
    "events_peak_concurrency": _PEAK_CONCURRENCY_SQL,
    "text_langid_confusion": _langid_confusion_sql(),
    "events_cusum": _CUSUM_SQL,
    "cdc_column_churn": _COLUMN_CHURN_SQL,
    "text_vocab_growth": _VOCAB_GROWTH_SQL,
    "text_bpe_merges": _bpe_train_sql(),
    "text_bpe_encode": _bpe_encode_sql(),
    # rows-only (no SQL-expressible oracle): multimodal_decode — its fake
    # features are PCG64-seeded standard normals from sha256(payload)
    }


class _LazyOracleSQL(dict):
    """dict façade over _build_oracle_sql(), populated on first access."""

    def _ensure(self):
        if not super().__len__():
            self.update(_build_oracle_sql())

    def __getitem__(self, k):
        self._ensure()
        return super().__getitem__(k)

    def __iter__(self):
        self._ensure()
        return super().__iter__()

    def __len__(self):
        self._ensure()
        return super().__len__()

    def __contains__(self, k):
        self._ensure()
        return super().__contains__(k)

    def keys(self):
        self._ensure()
        return super().keys()

    def items(self):
        self._ensure()
        return super().items()

    def values(self):
        self._ensure()
        return super().values()

    def get(self, k, default=None):
        self._ensure()
        return super().get(k, default)


ORACLE_SQL: dict[str, str] = _LazyOracleSQL()
