"""Config registry tests — mirrors the reference's import/export round-trip
coverage (`test/models/import_export_config_test.rb`) and validation rules."""

import pytest

from movex_cdc_ray.config import (
    CaptureConfig,
    ColumnConfig,
    ColumnExpressionConfig,
    ConditionConfig,
    SchemaConfig,
    TableConfig,
    default_code_cdc_config,
)


def test_json_round_trip():
    cfg = default_code_cdc_config()
    cfg.tables[0].conditions = [ConditionConfig("I", "pc.not_equal(c('new_lang'), 'xx')")]
    cfg.tables[0].column_expressions = [
        ColumnExpressionConfig("I", "content_len", "pc.utf8_length(c('new_content'))")
    ]
    doc = cfg.to_json()
    back = CaptureConfig.from_json(doc)
    assert back.to_json() == doc
    assert back.tables[0].conditions[0].filter == cfg.tables[0].conditions[0].filter
    assert back.num_partitions == cfg.num_partitions


def test_key_mode_validation():
    with pytest.raises(ValueError):
        TableConfig(name="T", schema_name="S", table_id=1, key_handling="Z")
    with pytest.raises(ValueError):
        TableConfig(name="T", schema_name="S", table_id=1, key_handling="F")
    with pytest.raises(ValueError):
        TableConfig(name="T", schema_name="S", table_id=1, key_handling="E")
    t = TableConfig(name="T", schema_name="S", table_id=1, key_handling="F", fixed_message_key="k")
    assert t.fixed_message_key == "k"


def test_duplicate_column_expression_guard():
    # reference `app/models/column_expression.rb:12-18` (operator D2)
    with pytest.raises(ValueError, match="duplicate"):
        TableConfig(
            name="T",
            schema_name="S",
            table_id=1,
            key_handling="N",
            column_expressions=[
                ColumnExpressionConfig("I", "x", "1"),
                ColumnExpressionConfig("I", "x", "2"),
            ],
        )


def test_logged_columns_per_op_and_pkey_only():
    t = TableConfig(
        name="T",
        schema_name="S",
        table_id=1,
        key_handling="P",
        pk_columns=["a"],
        columns=[
            ColumnConfig("a", True, True, True),
            ColumnConfig("b", True, False, False),
            ColumnConfig("c", False, True, False),
        ],
    )
    assert t.logged_columns("I") == ["a", "b"]
    assert t.logged_columns("U") == ["a", "c"]
    assert t.logged_columns("D") == ["a"]
    assert t.logged_columns("i") == ["a", "b"]
    t.yn_payload_pkey_only = True
    assert t.logged_columns("I") == ["a"]


def test_topic_routing_fallback():
    # reference `app/models/table.rb:186-192` (M11)
    cfg = CaptureConfig(
        schemas=[SchemaConfig(name="S", topic="schema.topic")],
        tables=[
            TableConfig(name="A", schema_name="S", table_id=1, key_handling="N", topic="own.topic"),
            TableConfig(name="B", schema_name="S", table_id=2, key_handling="N"),
        ],
    )
    assert cfg.topic_for(cfg.tables[0]) == "own.topic"
    assert cfg.topic_for(cfg.tables[1]) == "schema.topic"


def test_schema_version_selection():
    cfg = default_code_cdc_config()
    cfg.schema_versions[1].active_from_id = 500
    assert cfg.version_for_id(0).version == 1
    assert cfg.version_for_id(499).version == 1
    assert cfg.version_for_id(500).version == 2
    assert cfg.latest_version().version == 2
    assert "stars" in cfg.latest_version().payload_fields
    assert cfg.latest_version().payload_fields["size"] == "int64"
