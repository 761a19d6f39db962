"""Capture-stage unit tests — the trigger-semantics mirror of the reference's
deterministic event mix (`test/test_helper.rb:169-252`): per-op projection,
condition suppression, no-op update suppression, key modes, expressions,
envelope validity."""

import json

import numpy as np
import pyarrow as pa
import pytest

from movex_cdc_ray.config import (
    ColumnConfig,
    ColumnExpressionConfig,
    ConditionConfig,
    default_code_cdc_config,
)
from movex_cdc_ray.events import change_event_schema
from movex_cdc_ray.stages.capture import (
    CaptureStage,
    attach_envelope,
    render_message_json,
    validate_messages,
)


def make_batch(rows: list[dict]) -> pa.Table:
    cfg = default_code_cdc_config()
    schema = change_event_schema(cfg.latest_version().payload_fields)
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return pa.table({k: pa.array(v, schema.field(k).type) for k, v in cols.items()})


def ev(i, op, repo="r1", path="p1", content="c", old_content=None, lang="py", old_lang=None, **kw):
    d = {
        "id": i,
        "table_id": 1,
        "op": op,
        "dbuser": "u",
        "txn_id": f"t{i}",
        "created_at": 1_700_000_000_000_000 + i,
        "retry_count": 0,
    }
    if op != "D":
        d.update({"new_repo": repo, "new_path": path, "new_content": content, "new_lang": lang,
                  "new_commit": f"c{i}", "new_size": len(content or "")})
    if op in ("U", "D"):
        d.update({"old_repo": repo, "old_path": path, "old_content": old_content,
                  "old_lang": old_lang or lang, "old_commit": "c0",
                  "old_size": len(old_content or "")})
    d.update(kw)
    return d


def test_insert_update_delete_pass_through():
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I"), ev(2, "U", content="new", old_content="old"), ev(3, "D")]))
    assert out.num_rows == 3
    assert out["msg_key"][0].as_py() == '{"repo": "r1", "path": "p1"}'
    assert out["key_string"][2].as_py() == "CODE.FILES\x1fr1\x1fp1"  # delete key from old values


def test_noop_update_suppressed():
    # reference M4: UPDATE with old == new (NULL-safe) emits no event
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    out = st(make_batch([
        ev(1, "U", content="same", old_content="same", lang="py", old_lang="py",
           new_commit="c0", new_size=4, old_size=4),
    ]))
    # commit differs (c1 vs c0 default) — rebuild with all-equal payload
    rows = [ev(1, "U", content="same", old_content="same")]
    rows[0]["new_commit"] = "c0"
    rows[0]["old_commit"] = "c0"
    rows[0]["new_size"] = rows[0]["old_size"] = 4
    rows[0]["new_stars"] = rows[0]["old_stars"] = None
    out = st(make_batch(rows))
    assert out.num_rows == 0

    # NULL vs value counts as a change
    rows2 = [ev(2, "U", content="x", old_content=None)]
    assert st(make_batch(rows2)).num_rows == 1


def test_condition_filter_per_op():
    cfg = default_code_cdc_config()
    cfg.tables[0].conditions = [ConditionConfig("I", "pc.not_equal(c('new_lang'), 'xx')")]
    st = CaptureStage(cfg)
    out = st(make_batch([
        ev(1, "I", lang="xx"),
        ev(2, "I", lang="py"),
        ev(3, "U", lang="xx", content="a", old_content="b"),  # condition only on I
    ]))
    assert out["id"].to_pylist() == [2, 3]


def test_per_op_projection_flags():
    cfg = default_code_cdc_config()
    # stop logging content on update
    for c in cfg.tables[0].columns:
        if c.name == "content":
            c.yn_log_update = False
    st = CaptureStage(cfg)
    out = st(make_batch([
        ev(1, "I"),
        ev(2, "U", lang="go", old_lang="py", content="n", old_content="o"),
    ]))
    assert out["new_content"][0].as_py() == "c"  # insert keeps content
    assert out["new_content"][1].as_py() is None  # update projects it away
    assert out["old_content"][1].as_py() is None
    assert out["new_lang"][1].as_py() == "go"
    # inserts never carry an old object; deletes never a new one
    assert out["old_lang"][0].as_py() is None


def test_unlogged_op_has_no_trigger():
    cfg = default_code_cdc_config()
    for c in cfg.tables[0].columns:
        c.yn_log_delete = False
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "D"), ev(2, "I")]))
    assert out["id"].to_pylist() == [2]


def test_key_modes_fixed_txn_expression_none():
    cfg = default_code_cdc_config()
    t = cfg.tables[0]
    batch = make_batch([ev(1, "I"), ev(2, "D")])

    t.key_handling = "N"
    assert CaptureStage(cfg)(batch)["msg_key"].null_count == 2

    t.key_handling = "F"
    t.fixed_message_key = "fixed!"
    assert CaptureStage(cfg)(batch)["msg_key"].to_pylist() == ["fixed!"] * 2

    t.key_handling = "T"
    assert CaptureStage(cfg)(batch)["msg_key"].to_pylist() == ["t1", "t2"]

    # E with the :old→:new per-op rewrite (v() helper)
    t.key_handling = "E"
    t.key_expression = "pc.binary_join_element_wise(v('repo'), v('path'), '::')"
    keys = CaptureStage(cfg)(batch)["msg_key"].to_pylist()
    assert keys == ["r1::p1", "r1::p1"]  # delete resolves old_, insert new_


def test_computed_column_expressions():
    cfg = default_code_cdc_config()
    cfg.tables[0].column_expressions = [
        ColumnExpressionConfig("I", "content_len", "pc.utf8_length(c('new_content'))"),
        ColumnExpressionConfig("D", "was_lang", "c('old_lang')"),
    ]
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I", content="abcd"), ev(2, "D", old_lang="rs")]))
    assert out["new_content_len"][0].as_py() == 4
    assert out["new_content_len"][1].as_py() is None  # only on I rows
    assert out["old_was_lang"][1].as_py() == "rs"  # old-only expr lands in old


def test_unconfigured_table_dropped():
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    batch = make_batch([ev(1, "I")])
    i = batch.column_names.index("table_id")
    batch = batch.set_column(i, "table_id", pa.array([99], pa.int32()))
    assert len(st(batch)) == 0


def test_schema_evolution_alignment():
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    # v1 batch: no stars columns, int32 size
    v1_fields = dict(cfg.schema_versions[0].payload_fields)
    schema_v1 = change_event_schema(v1_fields)
    rows = [ev(1, "I", content="abc")]
    cols = {f.name: [rows[0].get(f.name)] for f in schema_v1}
    batch = pa.table({k: pa.array(v, schema_v1.field(k).type) for k, v in cols.items()})
    assert batch.schema.field("new_size").type == pa.int32()
    out = st(batch)
    assert out.schema.field("new_size").type == pa.int64()  # widened
    assert "new_stars" in out.column_names  # added with nulls
    assert out["new_stars"][0].as_py() is None


def test_envelope_and_json_rendering():
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I", content='say "hi"\n'), ev(2, "D"), ev(3, "i")]))
    env = attach_envelope(out, cfg)
    assert env["operation"].to_pylist() == ["INSERT", "DELETE", "INIT"]
    assert env["schema"].to_pylist() == ["CODE"] * 3
    assert env["topic"].to_pylist() == ["lake.code.files"] * 3
    msgs = render_message_json(out, cfg).to_pylist()
    d0 = json.loads(msgs[0])  # escaping survives JSON parsing
    assert d0["new"]["content"] == 'say "hi"\n'
    assert d0["operation"] == "INSERT"
    assert "old" not in d0
    d1 = json.loads(msgs[1])
    assert "new" not in d1 and d1["old"]["repo"] == "r1"
    # A4: running max message bytes per topic
    watermarks = validate_messages(out, cfg)
    assert set(watermarks) == {"lake.code.files"}
    assert watermarks["lake.code.files"] == max(len(m.encode()) for m in msgs)


def test_validate_messages_rejects_oversize():
    cfg = default_code_cdc_config()
    cfg.max_message_bytes = 50
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I", content="x" * 100)]))
    with pytest.raises(ValueError, match="exceeds"):
        validate_messages(out, cfg)


def test_cloudevents_headers():
    # full 9-header set of the reference's create_message_headers
    # (`transfer_thread.rb:663-679`)
    cfg = default_code_cdc_config()
    cfg.tables[0].yn_add_cloudevents_header = True
    st = CaptureStage(cfg)
    env = attach_envelope(st(make_batch([ev(7, "I")])), cfg)
    assert env["ce_id"].to_pylist() == ["7"]
    assert env["ce_source"].to_pylist() == [cfg.cloudevents_source]
    assert env["ce_specversion"].to_pylist() == ["1.0"]
    assert env["ce_type"].to_pylist() == [f"MOVEX-CDC:{cfg.build_version}"]
    assert env["ce_time"].to_pylist() == env["timestamp"].to_pylist()
    assert env["ce_datacontenttype"].to_pylist() == ["application/json"]
    assert env["ce_schema"].to_pylist() == ["CODE"]
    assert env["ce_tablename"].to_pylist() == ["FILES"]
    assert env["ce_operation"].to_pylist() == ["INSERT"]


def test_cloudevents_headers_gated_per_table():
    cfg = default_code_cdc_config()
    cfg.tables[0].yn_add_cloudevents_header = False
    st = CaptureStage(cfg)
    env = attach_envelope(st(make_batch([ev(7, "I")])), cfg)
    assert "ce_id" not in env.column_names  # no table requests headers


def test_condition_with_vectorized_helpers():
    # conditions may use the helper namespace: v() old/new resolution and
    # null_safe_not_equal (the trigger's NULL-safe compare)
    cfg = default_code_cdc_config()
    cfg.tables[0].conditions = [
        ConditionConfig("U", "null_safe_not_equal(c('new_lang'), c('old_lang'))"),
    ]
    st = CaptureStage(cfg)
    out = st(make_batch([
        ev(1, "U", lang="go", old_lang="py", content="a", old_content="b"),  # lang changed
        ev(2, "U", lang="py", old_lang="py", content="c", old_content="d"),  # lang same
    ]))
    assert out["id"].to_pylist() == [1]


def test_expression_scalar_broadcast_and_v_helper():
    cfg = default_code_cdc_config()
    cfg.tables[0].column_expressions = [
        ColumnExpressionConfig("I", "source_system", "'oracle-prod'"),
        ColumnExpressionConfig("D", "final_repo", "v('repo')"),
    ]
    st = CaptureStage(cfg)
    out = st(make_batch([ev(1, "I"), ev(2, "D")]))
    assert out["new_source_system"].to_pylist() == ["oracle-prod", None]
    assert out["new_final_repo"].to_pylist() == [None, "r1"]  # v() → old side on D


def test_pk_column_unlogged_for_delete_still_derives_key():
    """Projection must not null a PK column before key derivation: a DELETE
    whose PK column has yn_log_delete=False still needs its key_string (the
    reference trigger reads :old/:new raw records for keys) — a NULL key
    would misroute the tombstone to the unkeyed channel and never delete
    the lake row."""
    cfg = default_code_cdc_config()
    t = cfg.tables[0]
    for c in t.columns:
        if c.name == "repo":
            c.yn_log_delete = False
    out = CaptureStage(cfg)(make_batch([ev(1, "I"), ev(2, "D")]))
    assert out.num_rows == 2
    keys = out["key_string"].to_pylist()
    assert all(k is not None and "r1" in k for k in keys)
    assert keys[0] == keys[1]  # DELETE keys the same row the INSERT created
    # the payload projection itself still applies: old_repo is nulled
    assert out["old_repo"].to_pylist()[1] is None


def test_payload_pkey_only_narrows_payload_without_suppressing_updates():
    """yn_payload_pkey_only reduces what the message CARRIES, not which
    changes fire the trigger: a content-only update must still emit an
    event (with the payload narrowed to the PK columns)."""
    cfg = default_code_cdc_config()
    cfg.tables[0].yn_payload_pkey_only = True
    out = CaptureStage(cfg)(
        make_batch([ev(1, "U", content="new", old_content="old"),
                    ev(2, "U", content="same", old_content="same", old_commit="c2",
                       old_lang="py")])
    )
    # event 1 (content changed) flows; event 2 (true no-op) is suppressed
    assert out["id"].to_pylist() == [1]
    # payload narrowed: content is not logged, PK columns are
    assert out["new_content"].to_pylist() == [None]
    assert out["new_repo"].to_pylist() == ["r1"]


def test_multi_table_batch_with_asymmetric_expressions_concats():
    """Computed-expression columns exist on one table only — the capture
    output must still concat across tables (missing columns null)."""
    cfg = default_code_cdc_config()
    from movex_cdc_ray.config import TableConfig

    t2 = TableConfig(
        name="OTHER", schema_name="CODE", table_id=2, pk_columns=["repo", "path"],
        columns=[type(cfg.tables[0].columns[0])(c.name) for c in cfg.tables[0].columns],
    )
    cfg.tables.append(t2)
    cfg.tables[0].column_expressions.append(
        ColumnExpressionConfig("I", "xlen", "pc.utf8_length(c('new_content'))")
    )
    rows = [ev(1, "I"), ev(2, "I", table_id=2), ev(3, "D", table_id=2)]
    out = CaptureStage(cfg)(make_batch(rows))
    assert out.num_rows == 3
    assert "new_xlen" in out.column_names
    vals = dict(zip(out["id"].to_pylist(), out["new_xlen"].to_pylist()))
    assert vals[1] is not None and vals[2] is None  # expression on table 1 only


def test_key_mode_p_requires_pk_columns():
    from movex_cdc_ray.config import TableConfig

    with pytest.raises(ValueError, match="mode P"):
        TableConfig(name="T", schema_name="S", table_id=9)
