"""Engine control API — the reference's REST surface as plain Python verbs.

Maps `config/routes.rb:5-55` onto the config object + manifests (SURVEY.md
§2.10): config CRUD happens on :class:`CaptureConfig` directly; this module
adds the operational verbs (trigger generate, health, import/export, server
control: max_transaction_size, worker count, reprocess final errors). No HTTP
— the benchmark and tests drive these in-process.
"""

from __future__ import annotations

import os
from typing import Any

from .config import CaptureConfig
from .stages.capture import CaptureStage
from .stages.errors import reprocess_final_errors as _reprocess
from .stages.stats import health_check as _health
from .state.manifest import Manifest


def _introspect():
    from .sources import introspect

    return introspect


class Engine:
    """One engine instance = one config + one lake directory.

    Pass an :class:`~movex_cdc_ray.auth.AuthRegistry` plus ``actor`` (the
    acting user's email) to enforce the reference's USERS/SCHEMA_RIGHTS
    grants on deployment verbs and append to the ACTIVITY_LOGS audit ledger
    (operator J3; reference `app/models/schema_right.rb`,
    `.../activity_log.rb`). Without one, the engine is open — the reference's
    single-admin bootstrap mode."""

    def __init__(self, cfg: CaptureConfig, lake_dir: str, auth=None, actor: str | None = None):
        self.cfg = cfg
        self.lake_dir = lake_dir
        self.auth = auth
        self.actor = actor
        self._topic_max_bytes: dict[str, int] = {}  # A4 watermark per topic
        self._trigger_dates: dict[str, dict[str, str]] = {}  # table -> op -> iso ts

    # ---- session tokens (POST /login/do_logon + check_jwt analog) ----------
    def logon(self, email: str, password_ok: bool = True, ttl_seconds: int = 3600) -> str:
        """Issue a signed session token (`config/routes.rb:34-36`). The
        caller asserts credential validity (the reference checks against the
        source DB); failed logons count toward the five-failure lock."""
        if self.auth is None:
            raise ValueError("no auth registry attached to this engine")
        return self.auth.do_logon(email, password_ok, ttl_seconds=ttl_seconds)

    def authenticate(self, token: str) -> str:
        """check_jwt analog: validate the token and bind its user as this
        engine's acting identity, so subsequent verbs are attributed to it
        in the activity ledger."""
        if self.auth is None:
            raise ValueError("no auth registry attached to this engine")
        self.actor = self.auth.check_token(token)
        return self.actor

    def release_info(self) -> dict[str, str]:
        """GET /login/release_info analog (`config/routes.rb:36`,
        `login_controller.rb:86-91`): the build version, rate-limited to
        one call per second like the reference's DOS suppression."""
        import time as _time

        now = _time.monotonic()
        last = getattr(self, "_last_release_info", None)
        if last is not None and now - last < 1.0:
            raise RuntimeError("Release info called too frequently")
        self._last_release_info = now
        from . import __version__

        return {"release_info": __version__}

    def _authorize(self, schema_name: str, action: str, table_name: str | None = None) -> None:
        if self.auth is None or self.actor is None:
            return
        self.auth.check_deploy(self.actor, schema_name)
        self.auth.log(self.actor, action=action, schema_name=schema_name, table_name=table_name)

    # ---- trigger deployment (POST /db_triggers/generate_all, M1) -----------
    def generate_triggers(self) -> dict[str, Any]:
        """Compile capture plans for every configured table; returns the
        successes/errors summary the reference's generate_all produces
        (`app/models/db_trigger.rb:38-92`). With an auth registry attached,
        a table on an ungranted schema lands in ``errors`` instead of
        deploying — the reference scopes generate_all to the user's
        schema rights."""
        from .stages.capture import compile_table_plan

        successes, errors = [], []
        for t in self.cfg.tables:
            if t.yn_hidden:
                continue
            try:
                self._authorize(t.schema_name, "generate_trigger", t.name)
                # per-table compile: one table's bad expression must not
                # poison the other tables' results (or recompile O(T^2))
                compile_table_plan(self.cfg, t)
                successes.append({"table": f"{t.schema_name}.{t.name}"})
                # trigger_dates bookkeeping (tables#trigger_dates,
                # `config/routes.rb:49`): the reference records each
                # generated trigger's changed_at per operation
                import datetime as _dt

                now = _dt.datetime.now(_dt.timezone.utc).isoformat()
                self._trigger_dates[f"{t.schema_name}.{t.name}"] = {
                    "I": now, "U": now, "D": now
                }
            except Exception as exc:  # noqa: BLE001
                errors.append({"table": f"{t.schema_name}.{t.name}", "error": str(exc)})
        # load_sqls analog: tables flagged for initialization
        load_sqls = [
            {"table": f"{t.schema_name}.{t.name}", "filter": t.initialization_filter}
            for t in self.cfg.tables
            if t.yn_initialization
        ]
        return {"successes": successes, "errors": errors, "load_sqls": load_sqls}

    def capture_stage(self) -> CaptureStage:
        return CaptureStage(self.cfg)

    # ---- health check (GET /health_check) ----------------------------------
    def health_check(self, check_drift: bool = False) -> dict[str, Any]:
        """Health counts from manifests and file metadata — NO data scan by
        default (the reference's liveness endpoint; safe to poll).

        ``check_drift=True`` adds the config-drift report — lake rows whose
        table_id vanished from the config, the orphaned-trigger check analog
        (`app/models/db_trigger_generator_base.rb:77-119`). That reads the
        _table_id/_last_op columns of every base/delta file (O(lake files)),
        so it is an opt-in maintenance check, never part of a liveness
        poll."""
        return _health(self.lake_dir, cfg=self.cfg if check_drift else None)

    def trigger_dates(self, schema_name: str, table_name: str) -> dict[str, Any]:
        """GET /trigger_dates/:id analog (`config/routes.rb:49`,
        `tables_controller.rb:20-23`): youngest trigger change date per
        operation for one table — null until generate_triggers deployed it."""
        d = self._trigger_dates.get(f"{schema_name}.{table_name}", {})
        return {
            "youngest_insert_trigger_changed_at": d.get("I"),
            "youngest_update_trigger_changed_at": d.get("U"),
            "youngest_delete_trigger_changed_at": d.get("D"),
        }

    def config_info(self) -> list[dict[str, str]]:
        """GET /health_check/config_info analog
        (`health_check_controller.rb:44-70`): the home-screen
        {name, value, info} records over the engine's own knobs."""
        c = self.cfg

        def rec(name: str, value: Any, info: str) -> dict[str, str]:
            return {"name": name, "value": str(value), "info": info}

        return [
            rec("error_max_retries", c.error_max_retries,
                "Max. retries after transfer error"),
            rec("error_retry_start_delay", c.error_retry_start_delay,
                "Seconds after error before first retry starts. Tripled for each next retry."),
            rec("max_transaction_size", c.max_transaction_size,
                "Maximum number of events within one transaction"),
            rec("num_partitions", c.num_partitions,
                "Key-hash partitions = worker slots for Kafka transfer"),
            rec("capture_parallelism", c.capture_parallelism,
                "Capture blocks per epoch (a job parameter)"),
            rec("lake_compression", c.lake_compression,
                "Compression codec for lake/base parquet"),
            rec("max_message_bytes", c.max_message_bytes,
                "Max. message size accepted by the sink (A4 watermark)"),
            rec("hot_key_threshold", c.hot_key_threshold,
                "Events per key per epoch before salting engages"),
            rec("salt_factor", c.salt_factor,
                "Sub-partitions per hot key in the two-stage merge"),
            rec("lake_dir", self.lake_dir, "Lake root directory"),
        ]

    def log_file(self, max_lines: int = 200) -> str:
        """GET /health_check/log_file analog
        (`health_check_controller.rb:38-40`, which sends the server log).
        The engine's operational log IS the manifest ledger plus the
        activity ledger — rendered chronologically, newest last."""
        import glob
        import json as _json

        lines: list[str] = []
        from .state.manifest import MANIFEST_DIR

        for mf in sorted(glob.glob(os.path.join(self.lake_dir, MANIFEST_DIR, "epoch-*.json"))):
            try:
                with open(mf) as fh:
                    doc = _json.load(fh)
                m = doc.get("metrics", {})
                lines.append(
                    f"epoch {doc['epoch']:6d} committed: events_in={m.get('events_in', 0)} "
                    f"success={m.get('events_success', 0)} errors={m.get('events_final_errors', 0)} "
                    f"elapsed={m.get('elapsed_sec', 0.0)}s partitions={m.get('partitions_touched', 0)}"
                )
            except Exception:  # noqa: BLE001 — a torn file must not break the log view
                lines.append(f"epoch ?: unreadable manifest {os.path.basename(mf)}")
        if self.auth is not None:
            for a in self.auth.activity_table().to_pylist():
                lines.append(
                    f"activity seq={a['seq']} user={a['user_email']} action={a['action']}"
                    + (f" schema={a['schema_name']}" if a["schema_name"] else "")
                    + (f" table={a['table_name']}" if a["table_name"] else "")
                )
        return "\n".join(lines[-max_lines:])

    def validate_user_name(self, source_root: str, user_name: str | None) -> bool:
        """GET /db_schemas/validate_user_name analog
        (`db_schemas_controller.rb:21-28`, `db_schema.rb:52-60`): does the
        name denote an existing source schema? (The reference checks
        All_Users on Oracle / 'main' on SQLite.)"""
        if not user_name:
            return False
        from .sources.introspect import list_source_schemas

        return user_name in set(list_source_schemas(source_root))

    def set_all_columns(self, schema_name: str, table_name: str, operation: str,
                        enabled: bool) -> list[dict[str, Any]]:
        """POST /columns/select_all_columns / deselect_all_columns analog
        (`columns_controller.rb:51-64`): flip the op flag on EVERY column of
        one table, grant-gated like the reference's
        check_table_allowed_for_db_user; returns the resulting column list."""
        if operation not in ("I", "U", "D"):
            raise ValueError(f"operation must be I/U/D, got {operation!r}")
        t = next(
            (x for x in self.cfg.tables
             if x.schema_name == schema_name and x.name == table_name), None)
        if t is None:
            raise KeyError(f"unknown table {schema_name}.{table_name}")
        self._authorize(schema_name, "set_all_columns", table_name)
        attr = {"I": "yn_log_insert", "U": "yn_log_update", "D": "yn_log_delete"}[operation]
        for c in t.columns:
            setattr(c, attr, enabled)
        return [
            {"name": c.name, "yn_log_insert": c.yn_log_insert,
             "yn_log_update": c.yn_log_update, "yn_log_delete": c.yn_log_delete}
            for c in t.columns
        ]

    # ---- topic introspection (GET /kafka/topics, /kafka/describe_topic) ----
    def list_topics(self) -> list[str]:
        """Distinct routing targets — the reference's Kafka topic listing
        (`config/routes.rb:29-33`). Here a topic is a partition-directory
        routing target derived from table/schema config (M11), so the listing
        is pure config introspection."""
        topics = {self.cfg.topic_for(t) for t in self.cfg.tables if not t.yn_hidden}
        return sorted(t for t in topics if t)

    def describe_topic(self, topic: str) -> dict[str, Any]:
        """Topic config description (`config/routes.rb:30`): which tables
        route to it, the configured ``max.message.bytes`` limit, and the
        observed per-topic max-message-size watermark (operator A4) folded in
        via :meth:`observe_topic_watermarks`."""
        tables = [
            f"{t.schema_name}.{t.name}"
            for t in self.cfg.tables
            if not t.yn_hidden and self.cfg.topic_for(t) == topic
        ]
        if not tables:
            raise KeyError(f"no table routes to topic {topic!r}")
        return {
            "topic": topic,
            "tables": tables,
            "max_message_bytes": self.cfg.max_message_bytes,
            "observed_max_bytes": self._topic_max_bytes.get(topic, 0),
        }

    # ---- consumer-group introspection (GET /kafka/groups, /describe_group) -
    def groups(self, out_dir: str | None = None) -> list[dict[str, Any]]:
        """``kafka#groups`` analog (`config/routes.rb:29`): consumer groups
        with committed offsets under the produce output dir (defaults to
        this engine's lake dir)."""
        from .pipelines.produce import list_groups

        return list_groups(out_dir or self.lake_dir)

    def describe_group(self, group: str, out_dir: str | None = None) -> dict[str, Any]:
        """``kafka#describe_group`` analog (`config/routes.rb:30`):
        committed offset, log-end offset and lag per (topic, partition)."""
        from .pipelines.produce import describe_group as _dg

        return _dg(out_dir or self.lake_dir, group)

    # ---- source introspection (GET /db_schemas, /db_tables, /db_columns) ---
    def list_source_schemas(self, source_root: str) -> list[str]:
        """``db_schemas#index`` analog (`config/routes.rb:12`): candidate
        source schemas of a parquet source directory."""
        return _introspect().list_source_schemas(source_root)

    def list_source_tables(self, source_root: str, schema_name: str) -> list[str]:
        """``db_tables#index`` analog (`config/routes.rb:14`). With an auth
        registry attached, listing requires the actor's grant on the schema
        — the reference filters by the user's SELECT grants
        (`app/models/db_table.rb`, db_user semi-join)."""
        if self.auth is not None and self.actor is not None:
            self.auth.check_deploy(self.actor, schema_name)
        return _introspect().list_source_tables(source_root, schema_name)

    def list_source_columns(
        self, source_root: str, schema_name: str, table_name: str
    ) -> list[dict[str, Any]]:
        """``db_columns#index`` analog (`config/routes.rb:16`,
        `app/models/db_column.rb:7-27`): column name/type/nullable from the
        parquet footer."""
        if self.auth is not None and self.actor is not None:
            self.auth.check_deploy(self.actor, schema_name)
        return _introspect().list_source_columns(source_root, schema_name, table_name)

    def seed_config_from_source(
        self,
        source_root: str,
        schema_name: str,
        table_name: str,
        pk_columns: list[str],
        **kwargs: Any,
    ):
        """The GUI's add-table flow as one verb: introspect the source
        table's footer and return a ready-to-run :class:`CaptureConfig`
        (all columns observed, payload types from the footer —
        `sources/introspect.py:seed_capture_config`). Grant-gated like the
        listing verbs."""
        if self.auth is not None and self.actor is not None:
            self.auth.check_deploy(self.actor, schema_name)
            self.auth.log(self.actor, action="seed_config", schema_name=schema_name,
                          table_name=table_name)
        return _introspect().seed_capture_config(
            source_root, schema_name, table_name, pk_columns, **kwargs
        )

    def observe_topic_watermarks(self, max_bytes_per_topic: dict[str, int]) -> None:
        """Fold a ``validate_messages`` result into the per-topic watermark
        (the ``max.message.bytes`` auto-raise input, A4 —
        `app/models/kafka_base.rb:30-58`)."""
        for t, n in max_bytes_per_topic.items():
            if n > self._topic_max_bytes.get(t, 0):
                self._topic_max_bytes[t] = int(n)

    # ---- incremental views ---------------------------------------------
    def list_views(self) -> list[str]:
        """Views with registered specs under this lake (configured views
        appear after their first replayed epoch)."""
        import glob
        import os

        from .stages.sink import VIEWS_DIR

        return sorted(
            os.path.basename(os.path.dirname(p))
            for p in glob.glob(os.path.join(self.lake_dir, VIEWS_DIR, "*", "_SPEC.json"))
        )

    def read_view(self, name: str):
        """Current state of an incrementally-maintained view (a Dataset)."""
        from .pipelines.replay import read_view as _rv

        return _rv(self.lake_dir, name)

    def compact_view(self, name: str) -> str | None:
        """Fold the view's delta chain into a snapshot (maintenance verb)."""
        from .pipelines.replay import compact_view as _cv

        return _cv(self.lake_dir, name)

    # ---- time travel ------------------------------------------------------
    def lookup(self, key_string: str, at_epoch: int | None = None):
        """Point lookup of one key's live state — touches exactly the one
        partition the key hashes to (see ``pipelines.replay.lookup_key``)."""
        from .pipelines.replay import lookup_key

        return lookup_key(self.lake_dir, key_string, at_epoch=at_epoch)

    def read_lake_at(self, epoch: int):
        """Lake state as of a retained committed epoch (a Dataset)."""
        from .pipelines.replay import read_lake as _rl

        return _rl(self.lake_dir, cfg=self.cfg, at_epoch=epoch)

    def diff_epochs(self, from_epoch: int, to_epoch: int):
        """Key-level changelog between two retained epochs (a Dataset)."""
        from .pipelines.replay import diff_epochs as _de

        return _de(self.lake_dir, from_epoch, to_epoch)

    # ---- import/export (S8) ------------------------------------------------
    def export_config(self) -> str:
        """Config export; with an auth registry attached the document also
        embeds the reference's authz state (`import_export_config.rb:40-81`):
        a top-level ``users`` array plus a ``schema_rights`` array inside
        every schema object, both ordered by email. The document stays
        loadable by plain :meth:`CaptureConfig.from_json` (which ignores the
        auth keys)."""
        import json
        from dataclasses import asdict

        if self.auth is None:
            return self.cfg.to_json()
        # Authz state is embedded only for an admin actor — the reference's
        # export route sits behind ImportExportController's admin
        # before_action; a grant-holding (or actor-less) caller must not be
        # able to enumerate users/locks/grants. Non-admins get the plain
        # config document.
        if self.actor is None or not self.auth.user(self.actor).yn_admin:
            return self.cfg.to_json()
        d = json.loads(self.cfg.to_json())
        for s in d.get("schemas", []):
            s["schema_rights"] = self.auth.rights_for_schema(s["name"])
        d["users"] = [asdict(u) for u in sorted(self.auth.users, key=lambda u: u.email)]
        return json.dumps(d, indent=2, sort_keys=True)

    def import_config(self, doc: str) -> None:
        """Import a changed registry and 'regenerate triggers' — the schema /
        behavior evolution cycle (`app/models/import_export_config.rb:86-136`).
        Config import is admin-scope in the reference: with auth attached it
        requires a grant on EVERY imported schema.

        When the document embeds authz state, grants are synced per imported
        schema (rights absent from the import are revoked on that schema,
        `import_export_config.rb:258-275`) and users referenced by a grant
        but unknown to the registry are created LOCKED from the document's
        ``users`` list (`:93-107`). Users are never deleted."""
        import json

        d = json.loads(doc)
        new_cfg = CaptureConfig.from_dict(d)
        carries_authz = bool(d.get("users")) or any(
            "schema_rights" in s for s in d.get("schemas", [])
        )
        if self.auth is not None and self.actor is not None:
            # A document that carries authz state can create users and
            # revoke grants on schemas NOT in the document (surplus-schema
            # deactivation below) — reference scope for that is the whole
            # ImportExportController's admin before_action, so require
            # yn_admin; per-schema deploy grants are not enough.
            if carries_authz and not self.auth.user(self.actor).yn_admin:
                from .auth import NotAuthorized

                raise NotAuthorized(
                    f"{self.actor} is not an admin (import carries authz state)"
                )
            for s in new_cfg.schemas:
                self.auth.check_deploy(self.actor, s.name)
            self.auth.log(self.actor, action="import_config")
        if self.auth is not None:
            import_users = d.get("users", [])
            has_authz = any("schema_rights" in s for s in d.get("schemas", []))
            for s in d.get("schemas", []):
                rights = s.get("schema_rights")
                if rights is None:
                    continue  # pre-authz export: leave that schema's grants alone
                self.auth.ensure_right_users(rights, import_users)
                self.auth.sync_schema_rights(s["name"], rights)
            if has_authz:
                # full import deactivates schemas absent from the list:
                # their rights are destroyed (users never are) —
                # `deactivate_surplus_schema`, import_export_config.rb:166-178
                imported = {s["name"] for s in d.get("schemas", [])}
                self.auth.schema_rights = [
                    r for r in self.auth.schema_rights if r.schema_name in imported
                ]
        self.cfg = new_cfg
        self.generate_triggers()

    def import_users(self, doc: str) -> dict[str, int]:
        """POST /import_all_users analog (`config/routes.rb:28`,
        `import_export_config.rb:134-156`): update existing users, add
        missing ones, never delete. Accepts either a full config export or a
        bare ``{"users": [...]}`` document. Admin-only with auth attached
        (the reference scopes the route to admins)."""
        import json

        if self.auth is None:
            raise ValueError("no auth registry attached to this engine")
        if self.actor is not None:
            u = self.auth.user(self.actor)
            if not u.yn_admin:
                from .auth import NotAuthorized

                raise NotAuthorized(f"{self.actor} is not an admin")
            self.auth.log(self.actor, action="import_users")
        d = json.loads(doc)
        return self.auth.import_users(d.get("users", []))

    # ---- server control (POST /server_control/...) -------------------------
    def set_log_level(self, level: str) -> str:
        """POST /server_control/set_log_level analog (`config/routes.rb:40`):
        adjusts the engine's Python logger at runtime. Accepts the
        reference's Rails level names (DEBUG/INFO/WARN/ERROR/FATAL) and
        returns the previous level name; unknown names raise (the reference
        422s)."""
        import logging

        rails_to_py = {"DEBUG": logging.DEBUG, "INFO": logging.INFO,
                       "WARN": logging.WARNING, "ERROR": logging.ERROR,
                       "FATAL": logging.CRITICAL}
        key = str(level).upper()
        if key not in rails_to_py:
            raise ValueError(f"unknown log level {level!r}; one of {sorted(rails_to_py)}")
        logger = logging.getLogger("movex_cdc_ray")
        prev = logging.getLevelName(logger.getEffectiveLevel())
        logger.setLevel(rails_to_py[key])
        if self.auth is not None and self.actor is not None:
            self.auth.log(self.actor, action="set_log_level")
        return prev

    def set_max_transaction_size(self, n: int) -> None:
        self.cfg.max_transaction_size = int(n)

    def set_worker_count(self, n: int) -> None:
        """The reference's worker-thread count maps to the partition count P
        (one merge owner per key-hash slice). Changing P re-keys the hash
        slices; the manifest records the committed P and ``run_epoch`` raises
        on a mismatch (``Manifest.check_partitioning``), so this is only
        effective against a fresh lake / after a full re-partition — like
        re-deploying the reference with a different INITIAL_WORKER_THREADS."""
        self.cfg.num_partitions = int(n)

    def reprocess_final_errors(self) -> int:
        m = Manifest.latest(self.lake_dir)
        return _reprocess(self.lake_dir, m.epoch)

    def purge_tombstones(self, force: bool = False) -> dict[str, Any]:
        """Drop tombstone fence rows once the retry ledger is drained — the
        retention valve for delete-heavy lakes (see
        ``pipelines.replay.purge_tombstones`` for the safety argument)."""
        from .pipelines.replay import purge_tombstones as _purge

        m = _purge(self.lake_dir, self.cfg, force=force)
        return m.metrics

    def delete_where(self, column: str, values: list) -> dict[str, Any]:
        """GDPR-style targeted erasure: live rows whose payload ``column`` is
        in ``values`` become tombstone fences (payload nulled, keys/ids kept
        so late retries stay fenced — see ``pipelines.replay.delete_where``)."""
        from .pipelines.replay import delete_where as _dw

        m, n = _dw(self.lake_dir, self.cfg, column, values)
        return {"epoch": m.epoch, "rows_erased": n}
