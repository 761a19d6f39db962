"""Golden-format test: the outgoing message must match the reference's
documented Kafka message layout (doc/movex-cdc.adoc:727-741 and the
INIT/INSERT examples at :765-810): field order id, schema, tablename,
operation, dbuser, timestamp, transaction_id, then new/old objects;
absent transaction ids render as literal null; NULL column values render as
literal null inside the payload objects."""

import json
import re

import pyarrow as pa

from movex_cdc_ray.config import default_code_cdc_config
from movex_cdc_ray.events import change_event_schema
from movex_cdc_ray.stages.capture import CaptureStage, render_message_json


def make_event(op, txn_id, content="hello"):
    cfg = default_code_cdc_config()
    schema = change_event_schema(cfg.latest_version().payload_fields)
    row = {
        "id": 23423274179,
        "table_id": 1,
        "op": op,
        "dbuser": "MEYER",
        "txn_id": txn_id,
        "created_at": 1_582_286_863_396_142,
        "retry_count": 0,
    }
    if op != "D":
        row.update(
            {"new_repo": "r", "new_path": "p", "new_commit": "c1", "new_lang": "py",
             "new_content": content, "new_size": 5, "new_stars": None}
        )
    if op in ("U", "D"):
        row.update({"old_repo": "r", "old_path": "p", "old_commit": "c0",
                    "old_lang": "py", "old_content": "old", "old_size": 3})
    cols = {f.name: pa.array([row.get(f.name)], f.type) for f in schema}
    return pa.table(cols, schema=schema)


def test_field_order_matches_reference_examples():
    cfg = default_code_cdc_config()
    msg = render_message_json(make_event("I", "9.5.374674"), cfg)[0].as_py()
    doc = json.loads(msg)
    # exact top-level key ORDER of the documented example
    assert list(doc) == ["id", "schema", "tablename", "operation", "dbuser",
                        "timestamp", "transaction_id", "new"]
    assert doc["operation"] == "INSERT"
    assert doc["transaction_id"] == "9.5.374674"
    assert doc["new"]["content"] == "hello"
    assert doc["new"]["stars"] is None  # NULL value → literal null, not absent


def test_absent_transaction_id_renders_null():
    cfg = default_code_cdc_config()
    msg = render_message_json(make_event("i", None), cfg)[0].as_py()
    assert '"transaction_id": null' in msg
    doc = json.loads(msg)
    assert doc["operation"] == "INIT"
    assert doc["transaction_id"] is None
    assert "old" not in doc  # INIT carries only the new object


def test_update_and_delete_object_presence():
    cfg = default_code_cdc_config()
    up = json.loads(render_message_json(make_event("U", "t1"), cfg)[0].as_py())
    assert "new" in up and "old" in up and up["old"]["content"] == "old"
    dl = json.loads(render_message_json(make_event("D", "t2"), cfg)[0].as_py())
    assert "new" not in dl and dl["old"]["commit"] == "c0"


def test_legacy_comma_timestamp_variant():
    # doc examples use the comma-fraction legacy format
    cfg = default_code_cdc_config()
    msg = render_message_json(make_event("I", "t"), cfg, legacy_ts="comma")[0].as_py()
    ts = json.loads(msg)["timestamp"]
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2},\d{6}", ts), ts
