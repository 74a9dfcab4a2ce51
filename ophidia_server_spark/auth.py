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
    "oph_instances",
    # flow control is engine-internal bookkeeping, open to any session member
    "oph_for", "oph_endfor", "oph_if", "oph_elseif", "oph_else", "oph_endif",
    "oph_set", "oph_input", "oph_wait",
}
_EXECUTE_OPS = {"oph_script", "oph_generic", "oph_cdo"}
_ADMIN_OPS = {"oph_service", "oph_cluster", "oph_log_info", "oph_cancel"}
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
