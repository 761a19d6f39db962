"""USERS / SCHEMA_RIGHTS / ACTIVITY_LOGS registry (operator J3, SURVEY §2.4;
reference create_users.rb / create_schema_rights.rb / create_activity_logs.rb,
authorization per app/models/schema_right.rb)."""

import pyarrow.parquet as pq
import pytest

from movex_cdc_ray.api import Engine
from movex_cdc_ray.auth import (
    MAX_FAILED_LOGONS,
    AuthRegistry,
    NotAuthorized,
    SchemaRight,
    User,
)
from movex_cdc_ray.config import default_code_cdc_config


def make_registry(**kw) -> AuthRegistry:
    return AuthRegistry(
        users=[
            User(email="admin@x", yn_admin=True),
            User(email="dev@x"),
            User(email="locked@x", yn_account_locked=True),
            User(email="ghost@x", yn_hidden=True),
        ],
        schema_rights=[SchemaRight(user_email="dev@x", schema_name="CODE")],
        **kw,
    )


def test_admin_holds_every_right():
    r = make_registry()
    assert r.deployable_schemas("admin@x", ["CODE", "HR"]) == ["CODE", "HR"]
    r.check_deploy("admin@x", "HR")  # no raise


def test_grants_semi_join_scopes_non_admin():
    r = make_registry()
    assert r.deployable_schemas("dev@x", ["CODE", "HR"]) == ["CODE"]
    r.check_deploy("dev@x", "CODE")
    with pytest.raises(NotAuthorized, match="no right on schema HR"):
        r.check_deploy("dev@x", "HR")


def test_locked_and_hidden_users():
    r = make_registry()
    assert r.deployable_schemas("locked@x", ["CODE"]) == []
    with pytest.raises(NotAuthorized, match="locked"):
        r.check_deploy("locked@x", "CODE")
    with pytest.raises(NotAuthorized):
        r.user("ghost@x")  # hidden users are invisible — denial, not a crash


def test_failed_logons_lock_account():
    r = make_registry()
    for _ in range(MAX_FAILED_LOGONS - 1):
        u = r.record_logon("dev@x", success=False)
        assert not u.yn_account_locked
    u = r.record_logon("dev@x", success=False)
    assert u.yn_account_locked
    with pytest.raises(NotAuthorized):
        r.record_logon("dev@x", success=True)


def test_activity_log_appends_and_flushes(tmp_path):
    r = make_registry(log_dir=str(tmp_path))
    r.log("admin@x", action="generate_trigger", schema_name="CODE", table_name="FILES")
    r.log("dev@x", action="import_config", client_ip="10.0.0.1")
    t = r.activity_table()
    assert t["action"].to_pylist() == ["generate_trigger", "import_config"]
    assert t["seq"].to_pylist() == [0, 1]
    path = r.flush_activity()
    assert path and pq.read_table(path).num_rows == 2
    assert r.activity_table().num_rows == 0  # flushed


def test_activity_ledger_survives_restart(tmp_path):
    """A restarted registry must never reuse a segment filename (os.replace
    would silently destroy earlier audit records)."""
    r = make_registry(log_dir=str(tmp_path))
    r.log("admin@x", action="one")
    p1 = r.flush_activity()
    # restart: rebuild from the exported dict against the same ledger dir
    r2 = type(r).from_dict(r.to_dict(), log_dir=str(tmp_path))
    r2.log("admin@x", action="two")
    p2 = r2.flush_activity()
    assert p1 != p2
    assert pq.read_table(p1)["action"].to_pylist() == ["one"]
    assert pq.read_table(p2)["action"].to_pylist() == ["two"]


def test_denied_logons_reach_the_audit_ledger():
    r = make_registry()
    with pytest.raises(NotAuthorized):
        r.record_logon("ghost@x", success=False)  # unknown/hidden account
    # lock via repeated failures, then a "successful" logon is denied
    for _ in range(5):
        r.record_logon("dev@x", success=False)
    with pytest.raises(NotAuthorized):
        r.record_logon("dev@x", success=True)
    actions = r.activity_table()["action"].to_pylist()
    assert actions.count("logon_denied") == 2  # ghost + locked dev
    assert actions.count("logon_failed") == 5


def test_registry_round_trip():
    r = make_registry()
    r2 = AuthRegistry.from_dict(r.to_dict())
    assert [u.email for u in r2.users] == [u.email for u in r.users]
    assert r2.schema_rights[0].schema_name == "CODE"


def test_engine_enforces_grants(tmp_path):
    cfg = default_code_cdc_config()
    r = make_registry()
    # granted dev deploys CODE fine and the action is audited
    eng = Engine(cfg, str(tmp_path), auth=r, actor="dev@x")
    out = eng.generate_triggers()
    assert out["successes"] and not out["errors"]
    assert "generate_trigger" in r.activity_table()["action"].to_pylist()
    # a user with no grant on CODE collects errors instead of deploying
    r.users.append(User(email="intern@x"))
    eng2 = Engine(cfg, str(tmp_path), auth=r, actor="intern@x")
    out2 = eng2.generate_triggers()
    assert not out2["successes"] and out2["errors"]
    with pytest.raises(NotAuthorized):
        eng2.import_config(cfg.to_json())
