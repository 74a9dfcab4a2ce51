"""Role-based authorization, mirroring the reference's user-role model.

The reference gates every operator dispatch on the caller's role in the
session (oph_auth.h:79-96 role bits; oph_workflow_engine checks the required
role from each operator's XML descriptor before serving). Roles are
cumulative: write implies read, execute implies write, admin implies
execute, owner implies everything (oph_auth.h:94-96 OPH_ROLE_WRITER /
ADMINISTRATOR / ALL composites).

Enforcement points in this engine:
  - WorkflowEngine.run(role=...) checks each task's operator against
    `required_role` before execution;
  - ManagementService admin/owner checks on the server-level ops
    (service/cluster/log_info) and session grants (manage_session);
  - catalog session scoping is structural (filters.compile_group restricts
    every query to the session prefix, oph_filters.c:576-601 parity).
"""

from __future__ import annotations

# role bits (oph_auth.h:86-92)
NONE, READ, WRITE, EXECUTE, ADMIN, OWNER = 0, 1, 2, 4, 8, 16
# composite grants (oph_auth.h:94-96)
WRITER = READ | WRITE
ADMINISTRATOR = ADMIN | EXECUTE | WRITER
ALL = OWNER | ADMINISTRATOR

_ROLE_BITS = {
    "none": NONE,
    "read": READ,
    "read_force": READ,
    "write": WRITER,
    "execute": EXECUTE | WRITER,
    "admin": ADMINISTRATOR,
    "owner": ALL,
}


def role_bits(role: str | int | None) -> int:
    """Effective permission mask for a role name (cumulative) or raw mask."""
    if role is None:
        return ALL  # trusted driver-side caller (no identity supplied)
    if isinstance(role, int):
        return role
    try:
        return _ROLE_BITS[str(role).lower()]
    except KeyError:
        raise ValueError(f"unknown role {role!r} (one of {sorted(_ROLE_BITS)})") from None


# operator -> required role bit. Read = inspection/export of readable state;
# write = anything that creates, mutates, or deletes cubes/files; execute =
# external scripts; admin = server management. Unlisted operators default to
# WRITE (the conservative choice for data operators).
_READ_OPS = {
    "oph_explorecube", "oph_explorenc", "oph_cubeschema", "oph_cubesize",
    "oph_cubeelements", "oph_cubeio", "oph_list", "oph_search", "oph_find",
    "oph_fs", "oph_man", "oph_operators_list", "oph_primitives_list",
    "oph_showgrid", "oph_inspectfrag", "oph_hierarchy", "oph_loggingbk",
    "oph_exportcsv", "oph_exportnc", "oph_exportnc2", "oph_exportzarr",
    "oph_publish", "oph_get_config", "oph_resume", "oph_tasks",
    "oph_instances", "oph_cluster",
    # flow control is engine-internal bookkeeping, open to any session member
    "oph_for", "oph_endfor", "oph_if", "oph_elseif", "oph_else", "oph_endif",
    "oph_set", "oph_input", "oph_wait",
}
_EXECUTE_OPS = {"oph_script", "oph_generic", "oph_cdo"}
# oph_cluster is deliberately NOT here: the reference serves it with
# <permission>read</permission> (etc/xml/OPH_CLUSTER_operator_1.0.xml:44) —
# any user may reserve a host partition, bounded by the pool and per-user
# quota; only the info_cluster view and foreign undeploys are admin-gated,
# inside ManagementService.cluster.
_ADMIN_OPS = {"oph_service", "oph_log_info", "oph_cancel"}
_OWNER_OPS = {"oph_manage_session"}


def required_role(operator: str) -> int:
    op = operator.lower()
    if op in _ADMIN_OPS:
        return ADMIN
    if op in _OWNER_OPS:
        return OWNER
    if op in _EXECUTE_OPS:
        return EXECUTE
    if op in _READ_OPS:
        return READ
    return WRITE


def check_role(held: str | int | None, operator: str) -> None:
    """Raise PermissionError unless `held` covers the operator's required bit
    (the reference rejects the task at serve time, oph_workflow_engine.c)."""
    need = required_role(operator)
    if role_bits(held) & need != need:
        raise PermissionError(
            f"operator {operator!r} requires role bit {need} "
            f"(held: {role_bits(held)})"
        )


# -- pluggable bearer-token validation ---------------------------------------
#
# The reference accepts identity-provider tokens besides local credentials:
# oph_execute_main.c:324-420 routes a bearer token through oph_auth_token
# (validity + expiry), a user black-list check, and VO/audience mapping
# before resolving the effective userid. The engine analogue is a
# TokenValidator hook the HTTP facade calls per request: the static-table
# default preserves the existing behavior, and SignedTokenValidator covers
# the IdP-shaped path (signed tokens with expiry and audience) without an
# external dependency — a deployment behind a real OIDC provider subclasses
# TokenValidator and plugs its own introspection in.

import base64 as _base64
import hashlib as _hashlib
import hmac as _hmac
import json as _json
import time as _time


class TokenError(Exception):
    """Bearer token refused; str(exc) is the named reason (safe to serve)."""


class TokenValidator:
    """validate(token) -> (user, role-name); raises TokenError otherwise."""

    def validate(self, token: str) -> tuple[str, str]:
        raise NotImplementedError


class StaticTokenValidator(TokenValidator):
    """Opaque-token table (token -> (user, role)) + user black-list — the
    reference's local-credential path with oph_auth_is_user_black_listed
    semantics (oph_execute_main.c:341-343)."""

    def __init__(self, table: dict[str, tuple[str, str]],
                 blacklist: tuple[str, ...] | set[str] = ()):
        self.table = dict(table)
        self.blacklist = set(blacklist)

    def validate(self, token: str) -> tuple[str, str]:
        ident = self.table.get(token)
        if ident is None:
            raise TokenError("invalid or missing bearer token")
        if ident[0] in self.blacklist:
            raise TokenError(f"user {ident[0]} is black-listed")
        return ident


def _b64url(data: bytes) -> str:
    return _base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_dec(s: str) -> bytes:
    pad = -len(s) % 4
    return _base64.urlsafe_b64decode(s + "=" * pad)


class SignedTokenValidator(TokenValidator):
    """HMAC-SHA256 signed tokens (the JWT HS256 shape): header.payload.sig
    with claims sub (user), role, exp (unix seconds), aud. Checks, in
    order: structure, declared algorithm, signature, expiry, audience,
    black-list — each failure is its own named TokenError so the 401 tells
    the operator which check refused (the reference logs the same
    distinction, oph_auth.c token path). `clock` is injectable for tests."""

    def __init__(self, secret: bytes | str, audience: str | None = None,
                 blacklist: tuple[str, ...] | set[str] = (),
                 clock=_time.time):
        self.secret = secret.encode() if isinstance(secret, str) else secret
        self.audience = audience
        self.blacklist = set(blacklist)
        self.clock = clock

    def issue(self, user: str, role: str = "read", ttl: float = 3600.0,
              audience: str | None = None, **extra) -> str:
        """Mint a token (test/ops convenience — a real IdP signs its own)."""
        header = {"alg": "HS256", "typ": "JWT"}
        payload = {"sub": user, "role": role,
                   "exp": self.clock() + ttl, **extra}
        aud = audience if audience is not None else self.audience
        if aud is not None:
            payload["aud"] = aud
        signing = (
            _b64url(_json.dumps(header, separators=(",", ":")).encode())
            + "."
            + _b64url(_json.dumps(payload, separators=(",", ":")).encode())
        )
        sig = _hmac.new(self.secret, signing.encode(), _hashlib.sha256)
        return signing + "." + _b64url(sig.digest())

    def validate(self, token: str) -> tuple[str, str]:
        parts = token.split(".")
        if len(parts) != 3:
            raise TokenError("malformed token")
        try:
            header = _json.loads(_b64url_dec(parts[0]))
            payload = _json.loads(_b64url_dec(parts[1]))
            sig = _b64url_dec(parts[2])
        except Exception:
            raise TokenError("malformed token") from None
        if not isinstance(header, dict) or header.get("alg") != "HS256":
            # refuse unexpected algorithms outright (alg-confusion guard)
            raise TokenError("unsupported token algorithm")
        if not isinstance(payload, dict):
            # a correctly-signed non-object payload must still be a named
            # 401, never an AttributeError from payload.get below
            raise TokenError("malformed token payload")
        signing = f"{parts[0]}.{parts[1]}".encode()
        good = _hmac.new(self.secret, signing, _hashlib.sha256).digest()
        if not _hmac.compare_digest(sig, good):
            raise TokenError("bad token signature")
        exp = payload.get("exp")
        if exp is None:
            raise TokenError("token has no expiry claim")
        try:
            if self.clock() >= float(exp):
                raise TokenError("token expired")
        except (TypeError, ValueError):
            raise TokenError("malformed expiry claim") from None
        if self.audience is not None:
            aud = payload.get("aud")
            auds = aud if isinstance(aud, list) else [aud]
            if self.audience not in auds:
                raise TokenError("token audience mismatch")
        sub = payload.get("sub")
        if not sub:
            raise TokenError("token has no subject claim")
        if sub in self.blacklist:
            raise TokenError(f"user {sub} is black-listed")
        role = str(payload.get("role", "read"))
        try:
            role_bits(role)
        except ValueError:
            raise TokenError(f"unknown role claim {role!r}") from None
        return (str(sub), role)
