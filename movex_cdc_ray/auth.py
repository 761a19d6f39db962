"""Authorization + audit registry — USERS / SCHEMA_RIGHTS / ACTIVITY_LOGS.

Mirrors the reference's admin data model (operator J3 / SURVEY §2.4):
``db/migrate/20191218154054_create_users.rb`` (email, db_user, yn_admin,
yn_account_locked, failed_logons, yn_hidden),
``...create_schema_rights.rb`` (user↔schema grant + info) and
``...create_activity_logs.rb`` (user, schema/table/column, action,
client_ip). Authorization logic follows ``app/models/user.rb`` /
``app/models/schema_right.rb``: admins hold every right; non-admins act only
on schemas granted to them; a locked or hidden account holds nothing; five
failed logons lock the account (`app/controllers/login_controller.rb`).

The activity log is an append-only Parquet ledger under the lake dir —
flushed atomically, readable as a Dataset for audit queries.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from .state.manifest import atomic_write_parquet

MAX_FAILED_LOGONS = 5  # reference locks the account at the fifth failure

ACTIVITY_LOG_SCHEMA = pa.schema(
    [
        pa.field("user_email", pa.string()),
        pa.field("schema_name", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("column_name", pa.string()),
        pa.field("action", pa.string()),
        pa.field("client_ip", pa.string()),
        pa.field("seq", pa.int64()),  # monotonic per registry instance
    ]
)


@dataclass
class User:
    """USERS row (`create_users.rb:3-15`)."""

    email: str
    first_name: str = ""
    last_name: str = ""
    db_user: str | None = None
    yn_admin: bool = False
    yn_account_locked: bool = False
    failed_logons: int = 0
    yn_hidden: bool = False


@dataclass
class SchemaRight:
    """SCHEMA_RIGHTS row (`create_schema_rights.rb:3-9`)."""

    user_email: str
    schema_name: str
    info: str | None = None


class NotAuthorized(PermissionError):
    pass


@dataclass
class AuthRegistry:
    """Users + grants + audit ledger, with the reference's semi-join checks.

    ``deployable_schemas`` is the `Allowed_DB_Tables` semi-join shape
    (`app/models/schema_right.rb`): the set of schemas the acting user may
    touch, intersected against the capture config's schemas by callers."""

    users: list[User] = field(default_factory=list)
    schema_rights: list[SchemaRight] = field(default_factory=list)
    log_dir: str | None = None  # lake_dir/_activity (None = in-memory only)
    token_secret: str | None = None  # session-token HMAC key (lazy random)
    _activity: list[dict[str, Any]] = field(default_factory=list)
    _seq: int = 0

    def __post_init__(self) -> None:
        # resume the audit sequence past any segments already on disk — a
        # restarted registry must never reuse a segment filename (os.replace
        # would silently destroy earlier audit records)
        if self.log_dir and os.path.isdir(self.log_dir):
            for f in os.listdir(self.log_dir):
                if f.startswith("activity-") and f.endswith(".parquet"):
                    try:
                        self._seq = max(self._seq, int(f[len("activity-"):-len(".parquet")]))
                    except ValueError:
                        continue

    # ------------------------------------------------------------- lookups
    def user(self, email: str) -> User:
        for u in self.users:
            if u.email == email and not u.yn_hidden:
                return u
        # unknown and hidden accounts are indistinguishable to callers — a
        # denial, not a lookup crash (reference: login rejects, no 500)
        raise NotAuthorized(f"unknown user {email!r}")

    def deployable_schemas(self, email: str, all_schemas: list[str]) -> list[str]:
        """Schemas the user may deploy triggers on — the J3 semi-join."""
        u = self.user(email)
        if u.yn_account_locked:
            return []
        if u.yn_admin:
            return list(all_schemas)
        granted = {r.schema_name for r in self.schema_rights if r.user_email == email}
        return [s for s in all_schemas if s in granted]

    def check_deploy(self, email: str, schema_name: str) -> None:
        """Raise unless the user holds a deployment grant on the schema."""
        u = self.user(email)
        if u.yn_account_locked:
            raise NotAuthorized(f"account {email} is locked")
        if u.yn_admin:
            return
        if not any(
            r.user_email == email and r.schema_name == schema_name for r in self.schema_rights
        ):
            raise NotAuthorized(f"{email} has no right on schema {schema_name}")

    # -------------------------------------------------------------- logons
    def record_logon(self, email: str, success: bool) -> User:
        """Failed-logon counting with auto-lock at MAX_FAILED_LOGONS.

        Every attempt reaches the audit ledger — including rejected logons
        against locked or unknown accounts (the reference logs the denial
        before rejecting, `app/controllers/login_controller.rb`)."""
        try:
            u = self.user(email)
        except NotAuthorized:
            self.log(email, action="logon_denied")
            raise
        if u.yn_account_locked:
            # ANY attempt against a locked account is a denial (the reference
            # rejects before checking credentials) — counting it as a fresh
            # logon_failed would misclassify the audit ledger and keep
            # incrementing failed_logons past the lock point
            self.log(email, action="logon_denied")
            raise NotAuthorized(f"account {email} is locked")
        if success:
            u.failed_logons = 0
        else:
            u.failed_logons += 1
            if u.failed_logons >= MAX_FAILED_LOGONS:
                u.yn_account_locked = True
        self.log(email, action="logon" if success else "logon_failed")
        return u

    # -------------------------------------------------- session tokens
    # JWT-less analog of the reference's login flow (`config/routes.rb:34-36`,
    # login#do_logon issues a JWT after the DB-credential check;
    # application_controller#check_jwt validates it per request): an
    # HMAC-SHA256-signed {email, exp} token so API verbs can be attributed
    # in the activity ledger without an HTTP layer. Credential verification
    # itself stays with the caller (the reference delegates it to the source
    # DB connection), exactly like ``record_logon``'s ``success`` flag.

    def _token_key(self) -> bytes:
        if self.token_secret is None:
            import secrets

            self.token_secret = secrets.token_hex(32)
        return self.token_secret.encode()

    def do_logon(
        self,
        email: str,
        success: bool,
        ttl_seconds: int = 3600,
        now: float | None = None,
    ) -> str:
        """Issue a signed session token for a successful logon. Failed /
        locked / unknown logons raise and are counted + audited exactly as
        :meth:`record_logon` (five failures lock the account)."""
        self.record_logon(email, success)
        if not success:
            raise NotAuthorized(f"invalid credentials for {email}")
        import base64
        import hmac
        import json
        import time

        exp = int((time.time() if now is None else now) + ttl_seconds)
        body = base64.urlsafe_b64encode(
            json.dumps({"email": email, "exp": exp}, sort_keys=True).encode()
        ).rstrip(b"=")
        sig = hmac.new(self._token_key(), body, "sha256").hexdigest()
        return f"{body.decode()}.{sig}"

    def check_token(self, token: str, now: float | None = None) -> str:
        """Validate a session token → the authenticated email. Tampered,
        expired, or foreign-registry tokens are denials; so is a token for
        an account that was locked or hidden AFTER issuance (check_jwt
        re-reads the user per request)."""
        import base64
        import hmac
        import json
        import time

        try:
            body_s, sig = token.rsplit(".", 1)
            body = body_s.encode()
            want = hmac.new(self._token_key(), body, "sha256").hexdigest()
            if not hmac.compare_digest(want, sig):
                raise ValueError("bad signature")
            pad = b"=" * (-len(body) % 4)
            payload = json.loads(base64.urlsafe_b64decode(body + pad))
            email, exp = payload["email"], int(payload["exp"])
        except NotAuthorized:
            raise
        except Exception as e:  # noqa: BLE001 — malformed token is a denial
            raise NotAuthorized(f"invalid token: {e}") from None
        if (time.time() if now is None else now) >= exp:
            raise NotAuthorized(f"token for {email} expired")
        u = self.user(email)  # unknown/hidden → denial
        if u.yn_account_locked:
            raise NotAuthorized(f"account {email} is locked")
        return email

    # --------------------------------------------------------------- audit
    def log(
        self,
        user_email: str,
        action: str,
        schema_name: str | None = None,
        table_name: str | None = None,
        column_name: str | None = None,
        client_ip: str | None = None,
    ) -> None:
        self._activity.append(
            {
                "user_email": user_email,
                "schema_name": schema_name,
                "table_name": table_name,
                "column_name": column_name,
                "action": action,
                "client_ip": client_ip,
                "seq": self._seq,
            }
        )
        self._seq += 1

    def activity_table(self) -> pa.Table:
        return (
            pa.Table.from_pylist(self._activity, schema=ACTIVITY_LOG_SCHEMA)
            if self._activity
            else ACTIVITY_LOG_SCHEMA.empty_table()
        )

    def flush_activity(self) -> str | None:
        """Append the in-memory tail to the Parquet audit ledger (atomic)."""
        if not self.log_dir or not self._activity:
            return None
        path = os.path.join(self.log_dir, f"activity-{self._seq:012d}.parquet")
        atomic_write_parquet(self.activity_table(), path)
        self._activity = []
        return path

    # ----------------------------------------------- import/export semantics
    def find_user_case_insensitive(self, email: str) -> User | None:
        """Case-insensitive email lookup (`app/models/user.rb:32`) — import
        matching must not duplicate a user over email casing."""
        low = email.lower()
        for u in self.users:
            if u.email.lower() == low:
                return u
        return None

    def import_users(self, user_dicts: list[dict[str, Any]]) -> dict[str, int]:
        """Reference `import_export_config.rb:134-156` (import_all_users):
        update existing users (case-insensitive email match), add missing
        ones, NEVER delete users absent from the import list."""
        if not isinstance(user_dicts, list):
            raise TypeError("users is not a list")
        # Validate the whole document BEFORE mutating anything — the
        # reference wraps the import in a transaction; a malformed entry
        # must fully reject, never leave the registry half-updated.
        cleaned = []
        for i, ud in enumerate(user_dicts):
            if not isinstance(ud, dict):
                raise ValueError(f"users[{i}] is not an object")
            if not ud.get("email"):
                raise ValueError(f"users[{i}] has no 'email'")
            cleaned.append({k: v for k, v in ud.items() if k in User.__dataclass_fields__})
        updated = added = 0
        for ud in cleaned:
            existing = self.find_user_case_insensitive(ud["email"])
            if existing is not None:
                for k, v in ud.items():
                    setattr(existing, k, v)
                updated += 1
            else:
                self.users.append(User(**ud))
                added += 1
        return {"updated": updated, "added": added}

    def ensure_right_users(
        self, rights: list[dict[str, Any]], import_users_list: list[dict[str, Any]]
    ) -> int:
        """Pre-pass of `import_schemas` (`import_export_config.rb:93-107`):
        every user referenced by a schema_right must exist — a referenced
        user found only in the import's users list is created LOCKED (the
        reference's 'create as locked user for reference'); one in neither
        place is an error."""
        created = 0
        for r in rights:
            email = r["email"]
            if self.find_user_case_insensitive(email) is not None:
                continue
            ud = next(
                (u for u in import_users_list if u.get("email", "").lower() == email.lower()),
                None,
            )
            if ud is None:
                raise ValueError(
                    f"User with email {email!r} exists neither in the registry "
                    "nor in the user list of import data"
                )
            self.users.append(
                User(
                    email=ud["email"],
                    db_user=ud.get("db_user"),
                    first_name=ud.get("first_name", ""),
                    last_name=ud.get("last_name", ""),
                    yn_account_locked=True,
                )
            )
            created += 1
        return created

    def sync_schema_rights(self, schema_name: str, rights: list[dict[str, Any]]) -> None:
        """Per-schema grant sync (`import_export_config.rb:258-275`): rights
        on ``schema_name`` absent from the import are DELETED; listed rights
        are inserted or updated. Other schemas' grants are untouched. Every
        referenced user must already exist (see :meth:`ensure_right_users`)."""
        keep_emails = {r["email"].lower() for r in rights}
        self.schema_rights = [
            sr
            for sr in self.schema_rights
            if sr.schema_name != schema_name or sr.user_email.lower() in keep_emails
        ]
        for r in rights:
            user = self.find_user_case_insensitive(r["email"])
            if user is None:
                raise ValueError(f"User with email {r['email']!r} does not exist")
            existing = next(
                (
                    sr
                    for sr in self.schema_rights
                    if sr.schema_name == schema_name
                    and sr.user_email.lower() == user.email.lower()
                ),
                None,
            )
            if existing is not None:
                existing.info = r.get("info", existing.info)
            else:
                self.schema_rights.append(
                    SchemaRight(user_email=user.email, schema_name=schema_name, info=r.get("info"))
                )

    def rights_for_schema(self, schema_name: str) -> list[dict[str, Any]]:
        """Export shape of one schema's grants, ordered by email
        (`import_export_config.rb:57-61`)."""
        return [
            {"email": sr.user_email, "info": sr.info}
            for sr in sorted(
                (sr for sr in self.schema_rights if sr.schema_name == schema_name),
                key=lambda sr: sr.user_email,
            )
        ]

    # ------------------------------------------------------ JSON round-trip
    def to_dict(self) -> dict[str, Any]:
        from dataclasses import asdict

        return {
            "users": [asdict(u) for u in self.users],
            "schema_rights": [asdict(r) for r in self.schema_rights],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any], log_dir: str | None = None) -> "AuthRegistry":
        return cls(
            users=[User(**u) for u in d.get("users", [])],
            schema_rights=[SchemaRight(**r) for r in d.get("schema_rights", [])],
            log_dir=log_dir,
        )
