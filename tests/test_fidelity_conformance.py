"""Byte-level conformance vs the reference's envelope formats (round-2
fidelity items): the three timestamp_as_iso_string modes
(`transfer_thread.rb:524-536`), the 9 CloudEvents headers
(`transfer_thread.rb:663-679`), yn_record_txid gating
(`db_trigger_generator_oracle.rb:476`), yn_initialize_with_flashback
(`db/migrate/20210226000000_extend_tables7.rb:3`), and JSON control-char
escaping in payloads."""

import json

import pyarrow as pa
import pytest

from movex_cdc_ray.config import (
    CaptureConfig,
    TableConfig,
    default_code_cdc_config,
)
from movex_cdc_ray.functions.scalar import escape_json_string, format_timestamp
from movex_cdc_ray.stages.capture import (
    CaptureStage,
    attach_envelope,
    render_message_json,
    validate_messages,
)

# 2020-02-21T12:07:43.396142 UTC in microseconds
TS_US = 1_582_286_863_396_142


def _ts_arr():
    return pa.array([TS_US], pa.timestamp("us"))


# ------------------------------------------------- M9 golden timestamp modes
def test_timestamp_default_mode_matches_reference():
    # "%Y-%m-%dT%H:%M:%S.%6N" + db_default_timezone (with colon)
    got = format_timestamp(_ts_arr(), None, db_timezone="+01:00").to_pylist()
    assert got == ["2020-02-21T12:07:43.396142+01:00"]


def test_timestamp_type1_matches_reference():
    # comma fraction + machine %z (no colon)
    got = format_timestamp(
        _ts_arr(), "TYPE_1", db_timezone="+01:00", machine_timezone="+0200"
    ).to_pylist()
    assert got == ["2020-02-21T12:07:43,396142+0200"]


def test_timestamp_type2_matches_reference():
    # comma fraction + DB timezone (with colon)
    got = format_timestamp(_ts_arr(), "TYPE_2", db_timezone="+01:00").to_pylist()
    assert got == ["2020-02-21T12:07:43,396142+01:00"]


def test_timestamp_payload_mode_has_no_timezone():
    # payload objects use TO_CHAR 'YYYY-MM-DD"T"HH24:MI:SSxFF' — no suffix
    assert format_timestamp(_ts_arr()).to_pylist() == ["2020-02-21T12:07:43.396142"]


def test_timestamp_fraction_always_six_digits():
    whole = pa.array([1_582_286_863_000_000], pa.timestamp("us"))
    assert format_timestamp(whole, None, db_timezone="+00:00").to_pylist() == [
        "2020-02-21T12:07:43.000000+00:00"
    ]


def test_timestamp_rejects_unknown_mode():
    with pytest.raises(ValueError, match="LEGACY_TS_FORMAT"):
        format_timestamp(_ts_arr(), "TYPE_9")


def _event(op="I", txn="9.5.374674", content="hello", table_id=1):
    from movex_cdc_ray.events import change_event_schema

    cfg = default_code_cdc_config()
    schema = change_event_schema(cfg.latest_version().payload_fields)
    row = {
        "id": 42, "table_id": table_id, "op": op, "dbuser": "U",
        "txn_id": txn, "created_at": TS_US, "retry_count": 0,
        "new_repo": "r", "new_path": "p", "new_commit": "c", "new_lang": "py",
        "new_content": content, "new_size": 1,
    }
    if op in ("U", "D"):
        row.update({"old_repo": "r", "old_path": "p"})
    return pa.table({f.name: pa.array([row.get(f.name)], f.type) for f in schema}, schema=schema)


# ---------------------------------------------- envelope TZ + legacy from cfg
def test_envelope_timestamp_carries_db_timezone():
    cfg = default_code_cdc_config()
    cfg.db_default_timezone = "+02:00"
    st = CaptureStage(cfg)
    env = attach_envelope(st(_event()), cfg)
    assert env["timestamp"].to_pylist() == ["2020-02-21T12:07:43.396142+02:00"]


def test_envelope_legacy_mode_from_config():
    cfg = default_code_cdc_config()
    cfg.legacy_ts_format = "TYPE_2"
    cfg.db_default_timezone = "+01:00"
    st = CaptureStage(cfg)
    env = attach_envelope(st(_event()), cfg)
    assert env["timestamp"].to_pylist() == ["2020-02-21T12:07:43,396142+01:00"]


# ----------------------------------------------------------- yn_record_txid
def test_txid_gated_by_table_flag():
    cfg = default_code_cdc_config()
    assert cfg.tables[0].yn_record_txid  # default config records txids
    st = CaptureStage(cfg)
    msg = render_message_json(st(_event(txn="9.5.1")), cfg)[0].as_py()
    assert json.loads(msg)["transaction_id"] == "9.5.1"

    cfg2 = default_code_cdc_config()
    cfg2.tables[0].yn_record_txid = False
    st2 = CaptureStage(cfg2)
    msg2 = render_message_json(st2(_event(txn="9.5.1")), cfg2)[0].as_py()
    assert json.loads(msg2)["transaction_id"] is None  # trigger records NULL


def test_key_mode_t_requires_txid_flag():
    with pytest.raises(ValueError, match="yn_record_txid"):
        TableConfig(name="X", schema_name="S", table_id=9, key_handling="T")
    TableConfig(name="X", schema_name="S", table_id=9, key_handling="T", yn_record_txid=True)


# ------------------------------------------------------ control-char escaping
def test_escape_json_control_chars_produce_valid_json():
    arr = pa.array(["a\x00b", "bell\x07", "ok", None])
    out = escape_json_string(arr).to_pylist()
    assert out[0] == "a\\u0000b"
    assert out[1] == "bell\\u0007"
    assert out[2] == "ok" and out[3] is None
    for v in out[:3]:
        json.loads(f'"{v}"')  # must parse


def test_validate_messages_passes_on_poison_payload():
    cfg = default_code_cdc_config()
    st = CaptureStage(cfg)
    out = st(_event(content="poison\x00\x1fbytes\x07"))
    wm = validate_messages(out, cfg)  # raises if any message is invalid JSON
    assert wm
    msg = render_message_json(out, cfg)[0].as_py()
    assert json.loads(msg)["new"]["content"] == "poison\x00\x1fbytes\x07"


# ----------------------------------------- yn_initialize_with_flashback (S7)
def test_flashback_flag_config_roundtrip():
    cfg = default_code_cdc_config()
    cfg.tables[0].yn_initialize_with_flashback = False
    cfg2 = CaptureConfig.from_json(cfg.to_json())
    assert cfg2.tables[0].yn_initialize_with_flashback is False
    assert cfg2.tables[0].yn_record_txid is True


def test_flashback_vs_live_snapshot_id_anchor(ray_session, tmp_path):
    import ray.data as rd

    from movex_cdc_ray.pipelines.snapshot import snapshot_events

    cfg = default_code_cdc_config()
    src = rd.from_arrow(
        pa.table({"repo": ["r1"], "path": ["p1"], "commit": ["c"], "lang": ["py"],
                  "content": ["x"], "size": pa.array([1], pa.int32())})
    )
    t = cfg.tables[0]
    first = 1_000_000

    # flashback (default): ids strictly below the stream start — stream wins
    ids = [r["id"] for r in snapshot_events(src, cfg, t, first_stream_id=first).take_all()]
    assert all(i < first for i in ids)

    # non-flashback: ids anchor at EXACTLY the live-read watermark — events
    # already folded into the read (id ≤ live) can no longer regress the
    # snapshot, while ANY post-read event (id > live) outranks it
    t.yn_initialize_with_flashback = False
    live = 5_000_000
    ids2 = [r["id"] for r in snapshot_events(src, cfg, t, first_stream_id=first,
                                             live_at_id=live).take_all()]
    assert all(i == live for i in ids2)
