"""Round-5 fixes: admin scoping for authz-carrying import/export (the
reference gates the whole ImportExportController behind
check_for_current_user_admin, `app/controllers/import_export_controller.rb`),
atomic user-import validation, and per-file events_read instrumentation for
non-parquet chunk streams."""

import json

import pytest

from movex_cdc_ray.api import Engine
from movex_cdc_ray.auth import AuthRegistry, NotAuthorized, SchemaRight, User
from movex_cdc_ray.config import default_code_cdc_config


def _auth():
    return AuthRegistry(
        users=[User(email="admin@x", yn_admin=True), User(email="dev@x")],
        schema_rights=[SchemaRight(user_email="dev@x", schema_name="CODE")],
    )


# ---------------------------------------------------------------------------
# export_config: authz embedding is admin-only
# ---------------------------------------------------------------------------


def test_export_config_non_admin_gets_plain_document(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="dev@x")
    doc = json.loads(eng.export_config())
    assert "users" not in doc
    assert all("schema_rights" not in s for s in doc["schemas"])


def test_export_config_actorless_gets_plain_document(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth())
    doc = json.loads(eng.export_config())
    assert "users" not in doc


def test_export_config_admin_still_embeds_authz(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="admin@x")
    doc = json.loads(eng.export_config())
    assert [u["email"] for u in doc["users"]] == ["admin@x", "dev@x"]


# ---------------------------------------------------------------------------
# import_config: a document carrying authz state requires an admin actor
# ---------------------------------------------------------------------------


def test_import_config_authz_doc_requires_admin(tmp_path):
    auth = _auth()
    src = Engine(default_code_cdc_config(4), str(tmp_path / "a"), auth=auth, actor="admin@x")
    doc = src.export_config()  # embeds users + schema_rights
    # dev@x holds a deploy grant on CODE but is NOT admin: the import's
    # surplus-schema rights destruction must not be reachable
    auth.schema_rights.append(SchemaRight(user_email="dev@x", schema_name="LEGACY"))
    dst = Engine(default_code_cdc_config(4), str(tmp_path / "b"), auth=auth, actor="dev@x")
    with pytest.raises(NotAuthorized, match="authz state"):
        dst.import_config(doc)
    # nothing was revoked
    assert {r.schema_name for r in auth.schema_rights} == {"CODE", "LEGACY"}


def test_import_config_plain_doc_allowed_for_grant_holder(tmp_path):
    # a plain (authz-less) config import stays deploy-grant scoped
    auth = _auth()
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=auth, actor="dev@x")
    eng.import_config(default_code_cdc_config(4).to_json())
    assert eng.cfg.num_partitions == 4


# ---------------------------------------------------------------------------
# import_users: malformed documents fully reject, never half-apply
# ---------------------------------------------------------------------------


def test_import_users_malformed_rejects_atomically():
    auth = _auth()
    before = [(u.email, u.first_name) for u in auth.users]
    with pytest.raises(ValueError, match="users\\[1\\] has no 'email'"):
        auth.import_users(
            [{"email": "dev@x", "first_name": "Half"}, {"first_name": "NoEmail"}]
        )
    # the valid first entry was NOT applied — all-or-nothing
    assert [(u.email, u.first_name) for u in auth.users] == before
    with pytest.raises(ValueError, match="users\\[0\\] is not an object"):
        auth.import_users(["dev@x"])


# ---------------------------------------------------------------------------
# session tokens: logon → token → attributed verbs (routes.rb:34-36 analog)
# ---------------------------------------------------------------------------


def test_token_logon_attributes_verbs_in_ledger(tmp_path):
    auth = _auth()
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=auth)
    token = eng.logon("dev@x")
    assert eng.authenticate(token) == "dev@x"
    out = eng.generate_triggers()
    assert out["successes"]
    acts = auth.activity_table().to_pylist()
    assert [a["action"] for a in acts if a["user_email"] == "dev@x"] == [
        "logon",
        "generate_trigger",
    ]


def test_token_tamper_expiry_and_foreign_registry_denied():
    auth = _auth()
    token = auth.do_logon("dev@x", True, ttl_seconds=60, now=1000.0)
    assert auth.check_token(token, now=1030.0) == "dev@x"
    with pytest.raises(NotAuthorized, match="expired"):
        auth.check_token(token, now=1061.0)
    body, sig = token.rsplit(".", 1)
    with pytest.raises(NotAuthorized, match="invalid token"):
        auth.check_token(body + "." + ("0" * len(sig)))
    with pytest.raises(NotAuthorized, match="invalid token"):
        auth.check_token("garbage")
    # a second registry signs with a different secret
    other = _auth()
    with pytest.raises(NotAuthorized, match="invalid token"):
        other.check_token(token)


def test_token_rejected_after_lock_and_failed_logons_still_lock():
    auth = _auth()
    token = auth.do_logon("dev@x", True, now=1000.0)
    # five failed logons lock the account (reference semantics preserved)
    for _ in range(4):
        with pytest.raises(NotAuthorized):
            auth.do_logon("dev@x", False)
    assert auth.find_user_case_insensitive("dev@x").failed_logons == 4
    with pytest.raises(NotAuthorized):
        auth.do_logon("dev@x", False)
    assert auth.find_user_case_insensitive("dev@x").yn_account_locked
    # an already-issued token dies with the lock (check_jwt re-reads the user)
    with pytest.raises(NotAuthorized, match="locked"):
        auth.check_token(token, now=1001.0)


# ---------------------------------------------------------------------------
# minor admin endpoints (routes.rb:8-9,22-25,15,49 — the last Missing items)
# ---------------------------------------------------------------------------


def test_release_info_version_and_rate_limit(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path))
    info = eng.release_info()
    assert info["release_info"]
    with pytest.raises(RuntimeError, match="too frequently"):
        eng.release_info()  # reference suppresses sub-second repeats


def test_trigger_dates_null_then_set(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path))
    d = eng.trigger_dates("CODE", "FILES")
    assert d == {
        "youngest_insert_trigger_changed_at": None,
        "youngest_update_trigger_changed_at": None,
        "youngest_delete_trigger_changed_at": None,
    }
    eng.generate_triggers()
    d = eng.trigger_dates("CODE", "FILES")
    assert all(v is not None for v in d.values())


def test_config_info_records(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path))
    info = {r["name"]: r["value"] for r in eng.config_info()}
    assert info["error_max_retries"] == "5"
    assert info["num_partitions"] == "4"
    assert info["lake_dir"] == str(tmp_path)


def test_log_file_renders_epochs_and_activity(ray_session, tmp_path):
    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=3000, n_repos=3, paths_per_repo=10, chunk_size=1500)
    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)
    replay(stream, lake, cfg, chunks_per_epoch=1)
    eng = Engine(cfg, lake, auth=_auth(), actor="admin@x")
    eng.generate_triggers()
    log = eng.log_file()
    assert "epoch      1 committed" in log
    assert "action=generate_trigger" in log
    assert len(eng.log_file(max_lines=1).splitlines()) == 1


def test_validate_user_name_against_source(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "src"
    (root / "CODE").mkdir(parents=True)
    pq.write_table(pa.table({"a": [1]}), str(root / "CODE" / "files.parquet"))
    eng = Engine(default_code_cdc_config(4), str(tmp_path / "lake"))
    assert eng.validate_user_name(str(root), "CODE")
    assert not eng.validate_user_name(str(root), "NOPE")
    assert not eng.validate_user_name(str(root), None)


def test_set_all_columns_flips_flags_and_is_grant_gated(tmp_path):
    cfg = default_code_cdc_config(4)
    eng = Engine(cfg, str(tmp_path), auth=_auth(), actor="dev@x")
    cols = eng.set_all_columns("CODE", "FILES", "U", False)
    assert cols and all(not c["yn_log_update"] for c in cols)
    assert all(c["yn_log_insert"] for c in cols)
    cols = eng.set_all_columns("CODE", "FILES", "U", True)
    assert all(c["yn_log_update"] for c in cols)
    # ungranted actor is rejected like check_table_allowed_for_db_user
    auth2 = _auth()
    auth2.users.append(User(email="intern@x"))
    eng2 = Engine(cfg, str(tmp_path), auth=auth2, actor="intern@x")
    with pytest.raises(NotAuthorized):
        eng2.set_all_columns("CODE", "FILES", "I", False)
    with pytest.raises(ValueError, match="I/U/D"):
        eng.set_all_columns("CODE", "FILES", "X", True)


# ---------------------------------------------------------------------------
# keyless exchange: key_string dropped from the shuffle, re-derived at merge
# ---------------------------------------------------------------------------


def test_sink_key_spec_derivability_gates():
    from movex_cdc_ray.config import ColumnExpressionConfig
    from movex_cdc_ray.stages.capture import sink_key_spec

    cfg = default_code_cdc_config(4)
    spec = sink_key_spec(cfg)
    assert spec == {1: ("CODE.FILES", ["repo", "path"])}

    # a PK column not logged on UPDATE: projection nulls the value the key
    # derives from — key must ship through the exchange
    cfg2 = default_code_cdc_config(4)
    for c in cfg2.tables[0].columns:
        if c.name == "repo":
            c.yn_log_update = False
    assert sink_key_spec(cfg2) is None

    # computed expressions may overwrite PK columns post-derivation
    cfg3 = default_code_cdc_config(4)
    cfg3.tables[0].column_expressions = [
        ColumnExpressionConfig(operation="I", name="lang_up", sql="c('new_lang')")
    ]
    assert sink_key_spec(cfg3) is None


def test_capture_drops_key_and_merge_rederives(ray_session, tmp_path):
    """The exchange carries no key_string; derive_sink_keys reproduces the
    capture's keys byte-for-byte, DELETE rows (old image) included."""
    import glob

    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.replay import CapturePartitionStage
    from movex_cdc_ray.stages.capture import derive_sink_keys, sink_key_spec
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=5000, n_repos=5, paths_per_repo=20, chunk_size=5000,
                      delete_frac=0.2)
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    chunk = pq.read_table(sorted(glob.glob(stream + "/chunk_*.parquet"))[0])
    cfg = config_for_spec(spec, num_partitions=4)

    keep = CapturePartitionStage(cfg, project_for_sink=True, combine=False)(chunk)
    assert "key_string" in keep.column_names
    drop = CapturePartitionStage(cfg, project_for_sink=True, combine=False,
                                 drop_key=True)(chunk)
    assert "key_string" not in drop.column_names

    derived = derive_sink_keys(drop, sink_key_spec(cfg))
    assert derived.to_pylist() == keep["key_string"].to_pylist()
    ops = keep["op"].to_pylist()
    assert "D" in ops  # delete rows exercised the old-image branch


def test_non_derivable_config_ships_key_and_converges(ray_session, tmp_path):
    """A PK column unlogged on DELETE makes the key non-derivable at the
    sink (the old image the key needs is projected away) — sink_key_spec
    is None, the exchange ships key_string as before, and the replay still
    converges to the identical lake (deletes included: capture derived the
    key from the PRE-projection image)."""
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
    from movex_cdc_ray.stages.capture import sink_key_spec
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=5000, n_repos=5, paths_per_repo=20, chunk_size=2500,
                      delete_frac=0.2)
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    cfg_drop = config_for_spec(spec, num_partitions=4)
    cfg_ship = config_for_spec(spec, num_partitions=4)
    for c in cfg_ship.tables[0].columns:
        if c.name == "repo":
            c.yn_log_delete = False
    assert sink_key_spec(cfg_drop) is not None
    assert sink_key_spec(cfg_ship) is None
    replay(stream, str(tmp_path / "lake_a"), cfg_drop, chunks_per_epoch=1)
    replay(stream, str(tmp_path / "lake_b"), cfg_ship, chunks_per_epoch=1)
    a = lake_to_pandas(str(tmp_path / "lake_a")).reset_index(drop=True)
    b = lake_to_pandas(str(tmp_path / "lake_b")).reset_index(drop=True)
    assert a.equals(b)


def test_probe_dict_cols_selects_repetitive_strings(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.replay import _probe_dict_cols

    n = 1000
    t = pa.table({
        "op": pa.array(["I", "U"] * (n // 2)),
        "new_repo": pa.array([f"repo-{i % 7}" for i in range(n)]),
        "new_content": pa.array([f"unique-content-{i}" for i in range(n)]),
        "new_size": pa.array(range(n), pa.int64()),  # non-string: never encoded
        "other": pa.array(["x"] * n),  # not an event column: ignored
    })
    f = str(tmp_path / "chunk_000000.parquet")
    pq.write_table(t, f)
    assert _probe_dict_cols(f) == ["op", "new_repo"]
    # non-parquet streams skip the optimization; probe failures return []
    assert _probe_dict_cols(str(tmp_path / "chunk_0.jsonl")) == []
    assert _probe_dict_cols(str(tmp_path / "missing.parquet")) == []


def test_key_drop_replay_identical_lake(ray_session, tmp_path):
    """groupby (keyless exchange), salted (keyless in BOTH its exchanges —
    stage-1 derives/combines/drops) and winners (key-shipping control)
    replays of the same stream converge to identical lakes — the drop is
    invisible across every shuffle strategy."""
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=6000, n_repos=6, paths_per_repo=20, chunk_size=2000,
                      delete_frac=0.15)
    stream = str(tmp_path / "stream")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    replay(stream, str(tmp_path / "lake_a"), cfg, chunks_per_epoch=2)
    replay(stream, str(tmp_path / "lake_b"), cfg, chunks_per_epoch=2,
           hot_keys=frozenset({"CODE.FILES\x1frepo-0\x1fsrc/mod0/file0.txt"}), salted=True)
    replay(stream, str(tmp_path / "lake_c"), cfg, chunks_per_epoch=2,
           shuffle_mode="winners")
    a = lake_to_pandas(str(tmp_path / "lake_a")).reset_index(drop=True)
    b = lake_to_pandas(str(tmp_path / "lake_b")).reset_index(drop=True)
    c = lake_to_pandas(str(tmp_path / "lake_c")).reset_index(drop=True)
    pd_cols = list(a.columns)
    assert a[pd_cols].equals(b[pd_cols])
    assert a[pd_cols].equals(c[pd_cols])


# ---------------------------------------------------------------------------
# incremental BM25: re-crawl updates and doc deletes retract postings
# ---------------------------------------------------------------------------


def test_bm25_incremental_update_and_delete_retract(ray_session, tmp_path):
    """The postings/doclen lake state folds a re-crawled doc's UPDATE in
    place and a doc DELETE retracts its postings — the two operations a
    batch BM25 index needs a corpus rescan for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.config import (
        CaptureConfig,
        ColumnConfig,
        SchemaConfig,
        SchemaVersion,
        TableConfig,
    )
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay

    v1 = SchemaVersion(
        version=1, active_from_id=0,
        payload_fields={"term": "string", "doc_id": "int64", "tf": "int64", "dl": "int64"},
    )
    cfg = CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS", topic="lake.corpus")],
        tables=[
            TableConfig(name="POSTINGS", schema_name="CORPUS", table_id=1,
                        key_handling="P", pk_columns=["term", "doc_id"],
                        columns=[ColumnConfig("term"), ColumnConfig("doc_id"), ColumnConfig("tf")]),
            TableConfig(name="DOCLEN", schema_name="CORPUS", table_id=2,
                        key_handling="P", pk_columns=["doc_id"],
                        columns=[ColumnConfig("doc_id"), ColumnConfig("dl")]),
        ],
        schema_versions=[v1], num_partitions=2, capture_parallelism=1,
    )

    def ev(eid, table_id, op, term, doc_id, tf, dl):
        return {
            "id": eid, "table_id": table_id, "op": op, "dbuser": "t",
            "txn_id": None, "created_at": 1_700_000_000_000_000, "retry_count": 0,
            "new_term": term, "new_doc_id": doc_id, "new_tf": tf, "new_dl": dl,
            "old_term": term if op == "D" else None,
            "old_doc_id": doc_id if op == "D" else None,
        }

    rows = [
        # doc 1: terms hash(2), join(1); doc 2: terms hash(1)
        ev(1, 1, "I", "hash", 1, 2, None), ev(2, 1, "I", "join", 1, 1, None),
        ev(3, 2, "I", None, 1, None, 3),
        ev(4, 1, "I", "hash", 2, 1, None), ev(5, 2, "I", None, 2, None, 1),
        # re-crawl doc 1: 'join' gone (D), 'hash' tf drops to 1 (U), dl 1
        ev(6, 1, "U", "hash", 1, 1, None), ev(7, 1, "D", "join", 1, None, None),
        ev(8, 2, "U", None, 1, None, 1),
        # doc 2 deleted outright: postings + doclen retracted
        ev(9, 1, "D", "hash", 2, None, None), ev(10, 2, "D", None, 2, None, None),
    ]
    schema = pa.schema([
        ("id", pa.int64()), ("table_id", pa.int32()), ("op", pa.string()),
        ("dbuser", pa.string()), ("txn_id", pa.string()),
        ("created_at", pa.timestamp("us")), ("retry_count", pa.int32()),
        ("new_term", pa.string()), ("new_doc_id", pa.int64()),
        ("new_tf", pa.int64()), ("new_dl", pa.int64()),
        ("old_term", pa.string()), ("old_doc_id", pa.int64()),
    ])
    stream = tmp_path / "stream"
    stream.mkdir()
    pq.write_table(pa.Table.from_pylist(rows[:5], schema=schema),
                   str(stream / "chunk_000000.parquet"))
    pq.write_table(pa.Table.from_pylist(rows[5:], schema=schema),
                   str(stream / "chunk_000001.parquet"))
    lake = str(tmp_path / "lake")
    replay(str(stream), lake, cfg, chunks_per_epoch=1)

    lp = lake_to_pandas(lake)
    post = lp[lp["_table_id"] == 1]
    dl = lp[lp["_table_id"] == 2]
    # doc 2 fully retracted; doc 1's 'join' posting retracted, tf updated
    assert sorted(post["term"].tolist()) == ["hash"]
    assert post.iloc[0]["doc_id"] == 1 and post.iloc[0]["tf"] == 1
    assert dl["doc_id"].tolist() == [1] and dl.iloc[0]["dl"] == 1


# ---------------------------------------------------------------------------
# events_read: mixed / non-parquet chunk streams count per file
# ---------------------------------------------------------------------------


def test_events_read_counts_jsonl_and_csv_chunks(ray_session, tmp_path):
    from movex_cdc_ray.pipelines.replay import replay
    from movex_cdc_ray.sources.stream import (
        convert_chunks_to_csv,
        convert_chunks_to_jsonl,
    )
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

    spec = StreamSpec(n_events=4000, n_repos=4, paths_per_repo=10, chunk_size=1000)
    pq_stream = str(tmp_path / "pq")
    generate_stream(pq_stream, spec)
    cfg = config_for_spec(spec, num_partitions=2)

    rep_pq = replay(pq_stream, str(tmp_path / "lake_pq"), cfg, chunks_per_epoch=2)
    read_pq = sum(m.get("events_read", 0) for m in rep_pq.epoch_metrics)
    assert read_pq == spec.n_events

    for conv, name in ((convert_chunks_to_jsonl, "js"), (convert_chunks_to_csv, "cs")):
        stream = str(tmp_path / f"{name}_stream")
        conv(pq_stream, stream)
        rep = replay(stream, str(tmp_path / f"lake_{name}"), cfg, chunks_per_epoch=2)
        read = sum(m.get("events_read", 0) for m in rep.epoch_metrics)
        assert read == spec.n_events, name
