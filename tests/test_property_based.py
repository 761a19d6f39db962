"""Hypothesis property tests over the pure kernels (derandomized so CI is
reproducible): bit math, winnow guarantee, sampler merge, split edges."""

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from movex_cdc_ray.functions.corpus import merge_samples, split_edges
from movex_cdc_ray.functions.dedup import WinnowStage, jaccard
from movex_cdc_ray.functions.sketch import _bit_length_u32

DET = settings(derandomize=True, max_examples=60, deadline=None)


@DET
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=200))
def test_bit_length_matches_python(xs):
    arr = np.array(xs, dtype=np.uint32)
    assert _bit_length_u32(arr).tolist() == [int(v).bit_length() for v in xs]


@DET
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.01, max_value=10, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=10, max_value=100_000),
)
def test_split_edges_partition_the_bucket_space(weights, n_buckets):
    labels, edges = split_edges(weights, n_buckets)
    assert labels == list(weights)
    assert edges[-1] == n_buckets  # tail always owns the last bucket
    assert all(0 <= a <= b <= n_buckets for a, b in zip(edges, edges[1:]))


@DET
@given(st.text(alphabet="ab ", max_size=60), st.text(alphabet="ab ", max_size=60))
def test_jaccard_symmetric_bounded(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    assert jaccard(a, a) == 1.0


WORDS = st.lists(st.sampled_from([f"w{i}" for i in range(30)]), min_size=0, max_size=40)


@DET
@given(WORDS, WORDS, st.integers(min_value=0, max_value=25))
def test_winnow_guarantee_shared_run_shares_fingerprint(wa, wb, run_start):
    # plant a verbatim 11-word run (n + s - 1 for n=8, s=4) into both docs
    run = [f"run{i}x" for i in range(11)]
    pos = min(run_start, len(wa))
    ta = " ".join(wa[:pos] + run + wa[pos:])
    tb = " ".join(run + wb)
    stage = WinnowStage(n=8, s=4)
    sel = stage(pd.DataFrame({"doc_id": [0, 1], "text": [ta, tb]}))
    fps0 = set(sel[sel["doc_id"] == 0]["fp"])
    fps1 = set(sel[sel["doc_id"] == 1]["fp"])
    assert fps0 & fps1, "shared >=11-word run must share a winnowed fingerprint"


@DET
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300, unique=True),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=299),
)
def test_sample_merge_property_pure(ids, k, cut):
    # pure-pandas version of the union property: merging shard bottom-k
    # samples == bottom-k of the union, for any shard split
    def sample(sub):
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in sub]
        df = pd.DataFrame({"doc_id": sub, "sample_hash": h})
        return df.sort_values("sample_hash").head(k).reset_index(drop=True)

    cut = min(cut, len(ids))
    merged = merge_samples([sample(ids[:cut]), sample(ids[cut:])], k=k)
    union = sample(ids)
    assert merged["doc_id"].tolist() == union["doc_id"].tolist()


@DET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                 # event_type
            st.integers(min_value=0, max_value=6),       # value (heavy ties)
            st.integers(min_value=0, max_value=6),       # ts_us (heavy ties)
        ),
        min_size=1, max_size=120,
    )
)
def test_skyline_pass_matches_bruteforce_dominance(rows):
    """_skyline_pass == the O(n²) dominance definition on arbitrary tiny
    domains (maximal tie pressure), and is idempotent."""
    from movex_cdc_ray.pipelines.queries import _skyline_pass

    df = pd.DataFrame(rows, columns=["event_type", "value", "ts_us"])
    df["value"] = df["value"].astype("float64")
    df["event_id"] = np.arange(len(df), dtype="int64")
    got = _skyline_pass(df).to_pandas()
    expect = []
    for _, g in df.groupby("event_type"):
        v = g["value"].to_numpy()
        t = g["ts_us"].to_numpy(dtype="int64")
        dom = ((v[None, :] >= v[:, None]) & (t[None, :] >= t[:, None])
               & ((v[None, :] > v[:, None]) | (t[None, :] > t[:, None]))).any(axis=1)
        expect.extend(g.loc[~dom, "event_id"].tolist())
    assert sorted(got["event_id"].tolist()) == sorted(expect)
    again = _skyline_pass(got)
    assert again.num_rows == len(got)


@DET
@given(st.integers(min_value=1, max_value=400))
def test_rag_chunk_geometry_tiles_every_token(n):
    """Chunk spine invariants for any token count n: starts at stride 12,
    last chunk reaches exactly token n-1, every token covered, full
    consecutive chunks overlap by 4."""
    CH, ST = 16, 12
    n_chunks = (n - 1) // ST + 1
    starts = np.arange(n_chunks, dtype=np.int64) * ST
    lens = np.minimum(CH, n - starts)
    assert (lens >= 1).all()
    ends = starts + lens
    assert ends[-1] == n
    covered = np.zeros(n, dtype=bool)
    for s, e in zip(starts, ends):
        covered[s:e] = True
    assert covered.all()
    full = lens == CH
    if n_chunks > 1:
        overlaps = ends[:-1] - starts[1:]
        assert (overlaps[full[:-1]] == CH - ST).all()


# ---- config import/export round-trip fuzz ----------------------------------

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF), min_size=1, max_size=24
)


@st.composite
def _table_cfgs(draw):
    from movex_cdc_ray.config import (
        ColumnExpressionConfig,
        ConditionConfig,
        TableConfig,
    )

    km = draw(st.sampled_from("NPFTE"))
    kw = dict(
        name=draw(_TEXT), schema_name=draw(_TEXT), table_id=draw(st.integers(1, 99)),
        topic=draw(st.one_of(st.just(""), _TEXT)),
        key_handling=km,
        yn_record_txid=(km == "T") or draw(st.booleans()),
        yn_initialization=draw(st.booleans()),
        yn_initialize_with_flashback=draw(st.booleans()),
        initialization_filter=draw(st.one_of(st.none(), _TEXT)),
        yn_add_cloudevents_header=draw(st.booleans()),
        yn_payload_pkey_only=draw(st.booleans()),
        yn_hidden=draw(st.booleans()),
        conditions=[ConditionConfig(draw(st.sampled_from("IUD")), draw(_TEXT))
                    for _ in range(draw(st.integers(0, 2)))],
        column_expressions=[
            ColumnExpressionConfig(op, f"e{i}", draw(_TEXT))
            for i, op in enumerate(draw(st.lists(st.sampled_from("IUD"), max_size=2)))
        ],
    )
    if km == "F":
        kw["fixed_message_key"] = draw(_TEXT)
    if km == "E":
        kw["key_expression"] = draw(_TEXT)
    if km == "P":
        kw["pk_columns"] = draw(st.lists(_TEXT, min_size=1, max_size=3))
    return TableConfig(**kw)


@DET
@given(
    st.lists(_table_cfgs(), min_size=1, max_size=3),
    st.integers(1, 64), st.integers(1, 16),
    st.sampled_from([None, "TYPE_1", "TYPE_2"]),
)
def test_config_json_round_trip_fuzz(tables, num_partitions, cap_par, legacy):
    """to_json/from_json is an exact round trip for ARBITRARY valid configs —
    including control characters and non-ASCII in every free-text field (the
    JSON control-char escaping fixed in round 2)."""
    from movex_cdc_ray.config import CaptureConfig

    # table_ids must be unique per registry
    for i, t in enumerate(tables):
        t.table_id = i + 1
    cfg = CaptureConfig(
        tables=tables, num_partitions=num_partitions,
        capture_parallelism=cap_par, legacy_ts_format=legacy,
    )
    doc = cfg.to_json()
    back = CaptureConfig.from_json(doc)
    assert back.to_json() == doc
    for a, b in zip(cfg.tables, back.tables):
        assert (a.name, a.schema_name, a.key_handling, a.pk_columns,
                a.fixed_message_key, a.key_expression) == (
            b.name, b.schema_name, b.key_handling, b.pk_columns,
            b.fixed_message_key, b.key_expression)
        assert [c.filter for c in a.conditions] == [c.filter for c in b.conditions]
        assert [(e.operation, e.name, e.sql) for e in a.column_expressions] == [
            (e.operation, e.name, e.sql) for e in b.column_expressions]
