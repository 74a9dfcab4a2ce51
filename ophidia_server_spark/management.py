"""Management operator shims: session/admin/infra surface of the reference
server, mapped onto Spark driver state.

Reference: oph_manage_session (oph_management_operators.c:218-2268),
oph_get_config (oph_execute_main.c:1778-2030), oph_service (:671-960),
oph_cancel (oph_management_operators.c:64-216), oph_cluster (:2684-4507),
oph_log_info (:2270-2682), oph_resume (oph_execute_main.c:2193-2276),
oph_script (allow-listed, oph_parser.h:108), oph_man/operators_list
(oph_json_objkeys.h:64-71).
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

# Environment variables forwarded from the server process into external
# commands (oph_script / generic / cdo tasks). The reference runs these on
# the COMPUTE side, where the server's own secrets are not in scope
# (oph_workflow_parsing.c:970-1002 rewrites, executed by the framework);
# the driver-side analogue must therefore NOT spread os.environ — a
# registered template's arguments are submitter-controlled, and the child
# would otherwise see every server credential. Only the exec basics and
# locale survive; session context is added as OPH_* per call.
_CHILD_ENV_KEEP = ("PATH", "HOME", "TMPDIR", "LANG", "LC_ALL", "TZ", "JAVA_HOME")


def _child_env(session_id: str, workflow_id: int, marker_id: int) -> dict[str, str]:
    env = {k: os.environ[k] for k in _CHILD_ENV_KEEP if k in os.environ}
    env.update(
        OPH_SESSION_ID=session_id,
        OPH_WORKFLOW_ID=str(workflow_id),
        OPH_MARKER_ID=str(marker_id),
    )
    return env


@dataclass
class Session:
    session_id: str
    owner: str
    label: str = ""
    active: bool = True
    env: dict[str, str] = field(default_factory=dict)
    users: dict[str, str] = field(default_factory=dict)  # user -> role
    creation: float = field(default_factory=time.time)


@dataclass
class RunRecord:
    """Run-ledger row (job/jobaccounting analogue, oph_ophidiadb_query.h:34-49)."""

    workflow_id: int
    marker: int
    session_id: str
    request: dict
    response: Any = None
    status: str = "OPH_ODB_STATUS_PENDING"


class ManagementService:
    """Driver-side server state: sessions, config, service flag, run ledger."""

    ROLES = ("read", "write", "execute", "admin", "owner")  # oph_auth.h:79-96

    def __init__(self, spark: SparkSession, config: dict[str, str] | None = None,
                 admins: set[str] | None = None):
        self.spark = spark
        # server-level administrators (the reference's admin accounts,
        # oph_server_conf); management ops called WITH an identity are checked
        # against this set, a None user is the trusted driver-side caller
        # `is None` (not falsy-or): an explicit empty set means "no server
        # admin accounts" and must not silently fall back to {'admin'}
        self.admins = set(admins) if admins is not None else {"admin"}
        self.config = {
            "SERVER_FARM_SIZE": "128",
            "QUEUE_SIZE": "0",
            "TASK_LIMIT": "0",
            "CORE_LIMIT": "0",
            "TIMEOUT": "3600",
            "WORKFLOW_TIMEOUT": "2592000",
            **(config or {}),
        }
        self.service_up = True
        self.enabled_users: set[str] | None = None  # None = everyone
        self.sessions: dict[str, Session] = {}
        self.ledger: list[RunRecord] = []
        self._next_wid = 1
        # host-partition reservation ledger (hostpartition/hashost analogue,
        # oph_ophidiadb_query.h:79-93): name -> owner/hosts/type/creation
        self._partitions: dict[str, dict] = {}

    # -- oph_manage_session ---------------------------------------------------
    def manage_session(self, action: str, user: str, session: str | None = None, **kw):
        if action == "new":
            sid = f"sess-{len(self.sessions) + 1}"
            self.sessions[sid] = Session(session_id=sid, owner=user, users={user: "owner"})
            return sid
        s = self.sessions[session]
        if action == "list":
            return [
                {"session": x.session_id, "label": x.label, "active": x.active}
                for x in self.sessions.values()
                if user in x.users
            ]
        if user not in s.users and user not in self.admins and action != "list":
            raise PermissionError(f"{user} has no grant on {session}")

        def need(bit: int) -> None:
            # session-role enforcement (oph_auth.h:79-96): grants and session
            # lifecycle are owner-only, env/label writes need the write bit;
            # server admins bypass (the reference's admin override)
            from ophidia_server_spark import auth

            if user in self.admins:
                return
            held = auth.role_bits(s.users.get(user, "none"))
            if held & bit != bit:
                raise PermissionError(
                    f"{user} (role {s.users.get(user)!r}) lacks the required "
                    f"permission on {session} for action {action!r}"
                )

        from ophidia_server_spark import auth

        if action == "remove":
            need(auth.OWNER)
            del self.sessions[session]
            return None
        if action == "grant":
            need(auth.OWNER)
            role = kw.get("role", "read")
            if role not in self.ROLES:
                raise ValueError(f"bad role {role}")
            s.users[kw["grantee"]] = role
            return None
        if action == "revoke":
            need(auth.OWNER)
            s.users.pop(kw["grantee"], None)
            return None
        if action == "listusers":
            return dict(s.users)
        if action == "setenv":
            need(auth.WRITE)
            s.env[kw["key"]] = kw["value"]
            return None
        if action == "env":
            return dict(s.env)
        if action == "label":
            need(auth.WRITE)
            s.label = kw["value"]
            return None
        if action == "disable":
            need(auth.OWNER)
            s.active = False
            return None
        if action == "enable":
            need(auth.OWNER)
            s.active = True
            return None
        raise ValueError(f"unknown action {action!r}")

    # -- oph_get_config / oph_service -----------------------------------------
    def get_config(self, key: str | None = None):
        return dict(self.config) if key is None else {key: self.config.get(key)}

    def _require_admin(self, user: str | None, op: str) -> None:
        """Admin-only server ops (oph_auth.h OPH_ROLE_ADMIN); user=None is
        the trusted driver-side caller."""
        if user is not None and user not in self.admins:
            raise PermissionError(f"{op} requires an admin account ({user!r} is not)")

    def service(self, status: str | None = None, enable_user: str | None = None,
                disable_user: str | None = None, user: str | None = None) -> dict:
        self._require_admin(user, "oph_service")
        if status == "up":
            self.service_up = True
        elif status == "down":
            self.service_up = False
        if enable_user:
            self.enabled_users = (self.enabled_users or set()) | {enable_user}
        if disable_user and self.enabled_users:
            self.enabled_users.discard(disable_user)
        return {"status": "up" if self.service_up else "down"}

    # -- oph_cluster ----------------------------------------------------------
    def cluster(self, action: str = "info", user: str | None = None,
                host_partition: str = "all", nhost: int = 0,
                host_type: str = "io", user_filter: str = "all") -> dict:
        """Host-partition reservation semantics at the metadata level
        (oph_ophidiadb_query.h:79-93; oph_management_operators.c:2684+):
        named partitions reserved per user out of a bounded host pool,
        with per-user quota enforcement — everything the reference's
        hostpartition/hashost tables record, minus the physical I/O-server
        deploy (Spark owns placement; a reservation maps to a scheduler
        pool name the engine can tag jobs with).

          deploy      reserve `nhost` hosts as `host_partition` for the
                      caller ('auto' draws a name); refused with a named
                      error when the name is already reserved, the pool
                      hasn't enough free hosts (RETRIEVE_TOTAL_RESERVED_
                      HOSTS check), or the user would exceed maxhosts
                      (OPH_USER_MAX_HOSTS, oph_auth.h:44);
          undeploy    release the caller's partition(s) by name ('all'
                      releases every partition the caller holds); another
                      user's partition needs admin;
          info        the caller's reservations (name substring filter,
                      RETRIEVE_RESERVED_PARTITIONS shape) + executor pool;
          info_cluster admin-only view over ALL users (user substring
                      filter, RETRIEVE_TOTAL_RESERVED_PARTITIONS shape).

        Pool size: config HOST_POOL_SIZE (default = defaultParallelism —
        one 'host' per executor slot in local mode); per-user quota:
        config USER_MAX_HOSTS (0 = unlimited, the reference default)."""
        sc = self.spark.sparkContext
        try:  # executor count via the JVM context (not exposed in the Python API)
            n_exec = sc._jsc.sc().getExecutorMemoryStatus().size()
        except Exception:
            n_exec = 1
        base = {
            "action": action,
            "executors": n_exec,
            "default_parallelism": sc.defaultParallelism,
            "master": sc.master,
        }
        pool = int(self.config.get("HOST_POOL_SIZE", sc.defaultParallelism))
        quota = int(self.config.get("USER_MAX_HOSTS", 0))
        who = user or "admin"
        reserved_total = sum(p["hosts"] for p in self._partitions.values())
        if action == "deploy":
            name = host_partition
            if name in ("all", ""):
                raise ValueError("deploy needs a host_partition name or 'auto'")
            if name.lower() == "auto":
                name = f"part_{who}_{len(self._partitions) + 1}"
            if name in self._partitions:
                raise ValueError(f"host partition {name!r} is already reserved")
            n = max(1, int(nhost))
            if reserved_total + n > pool:
                raise ValueError(
                    f"not enough free hosts: {pool - reserved_total} of "
                    f"{pool} available, {n} requested"
                )
            mine = sum(
                p["hosts"] for p in self._partitions.values()
                if p["owner"] == who
            )
            if quota and mine + n > quota:
                raise ValueError(
                    f"user {who} would hold {mine + n} hosts, "
                    f"maxhosts is {quota}"
                )
            self._partitions[name] = {
                "owner": who, "hosts": n, "host_type": host_type,
                "creation": time.time(),
            }
            return {**base, "host_partition": name, "hosts": n,
                    "scheduler_pool": name}
        if action == "undeploy":
            names = (
                [n for n, p in self._partitions.items() if p["owner"] == who]
                if host_partition in ("all", "")
                else [host_partition]
            )
            released = []
            for name in names:
                p = self._partitions.get(name)
                if p is None:
                    raise ValueError(f"no host partition {name!r}")
                if p["owner"] != who:
                    self._require_admin(user, "oph_cluster")
                del self._partitions[name]
                released.append(name)
            return {**base, "released": released}
        if action == "info_cluster":
            self._require_admin(user, "oph_cluster")
            rows = [
                {"partition": n, "user": p["owner"], "hosts": p["hosts"],
                 "type": p["host_type"], "status": "up"}
                for n, p in sorted(self._partitions.items())
                if user_filter in ("all", "") or user_filter in p["owner"]
            ]
            return {**base, "partitions": rows,
                    "reserved_hosts": reserved_total, "pool": pool}
        # info: the caller's own reservations, name-substring filtered
        rows = [
            {"partition": n, "hosts": p["hosts"], "type": p["host_type"],
             "status": "up"}
            for n, p in sorted(self._partitions.items())
            if p["owner"] == who
            and (host_partition in ("all", "") or host_partition in n)
        ]
        return {**base, "partitions": rows,
                "reserved_hosts": reserved_total, "pool": pool}

    # -- oph_cancel -----------------------------------------------------------
    def cancel(self, workflow_id: int) -> None:
        """Kill a running workflow: Spark job-group cancel + ledger status."""
        self.spark.sparkContext.cancelJobGroup(f"wf-{workflow_id}")
        for r in self.ledger:
            if r.workflow_id == workflow_id and r.status not in (
                "OPH_ODB_STATUS_COMPLETED", "OPH_ODB_STATUS_ERROR",
            ):
                r.status = "OPH_ODB_STATUS_ABORTED"

    # -- run ledger + oph_resume ----------------------------------------------
    def record(self, session_id: str, request: dict) -> RunRecord:
        rec = RunRecord(
            workflow_id=self._next_wid, marker=self._next_wid, session_id=session_id,
            request=request,
        )
        self._next_wid += 1
        self.ledger.append(rec)
        return rec

    def _synthetic_command(self, request: dict, level: int) -> str:
        """Level 1/2 document: the submitted command line re-synthesized from
        a stored request (oph_execute_main.c:6031-6060: level 1 prefers the
        stored `command`, then a single direct-output task's submission
        string, then the workflow name; level 2 prefers the task string)."""
        tasks = request.get("tasks", [])

        def task_string() -> str | None:
            if len(tasks) == 1:
                t = tasks[0]
                args = ";".join(f"{k}={v}" for k, v in t.get("arguments", {}).items())
                return f"{t.get('operator', '')} {args}".strip()
            return None

        command = request.get("command")
        name = request.get("name", "")
        if level == 1:
            return command or task_string() or name
        return task_string() or command or name

    def resume(
        self, session_id: str, workflow_id: int | None = None,
        document_type: str = "response", status_filter: int = 0xFF,
        execute: bool = False, submit: "Any" = None, level: int | None = None,
    ):
        """oph_resume: read back stored requests/responses of a session,
        optionally one workflow, with an 8-bit status mask
        (oph_execute_main.c:2270-2276).

        Levels (oph_execute_main.c:2193-2268 document shapes), selected via
        `level`: 0 session status row per workflow; 1 synthetic command line
        (stored command > single-task string > workflow name); 2 task string
        > command > name; 3 full JSON request; 4 JSON response; 5 extended
        response (response + status). level=None keeps the raw
        document_type ('request'/'response') behavior.

        execute=True re-submits each matching stored REQUEST as a brand-new
        request through `submit` (a callable taking the request dict — e.g.
        ServerFacade.submit or WorkflowEngine.run), the reference's
        `oph__ophExecuteMain(soap, jstring, response)` re-entry at
        oph_execute_main.c:6026. Each re-run is recorded as a NEW ledger
        entry with its own workflow_id; the new RunRecords are returned."""
        if execute:
            if submit is None:
                raise ValueError("resume(execute=True) needs a submit callable")
            reruns = []
            for req in self.resume(session_id, workflow_id, "request", status_filter):
                if req is None:
                    continue
                rec = self.record(session_id, req)
                try:
                    rec.response = submit(req)
                    rec.status = "OPH_ODB_STATUS_COMPLETED"
                except Exception as e:  # noqa: BLE001
                    rec.response = {"error": f"{type(e).__name__}: {e}"}
                    rec.status = "OPH_ODB_STATUS_ERROR"
                reruns.append(rec)
            return reruns
        mask_statuses = {
            0: "OPH_ODB_STATUS_PENDING",
            1: "OPH_ODB_STATUS_RUNNING",
            2: "OPH_ODB_STATUS_COMPLETED",
            3: "OPH_ODB_STATUS_ERROR",
            4: "OPH_ODB_STATUS_ABORTED",
            5: "OPH_ODB_STATUS_SKIPPED",
        }
        allowed = {v for k, v in mask_statuses.items() if status_filter & (1 << k)}
        out = []
        for r in self.ledger:
            if r.session_id != session_id:
                continue
            if workflow_id is not None and r.workflow_id != workflow_id:
                continue
            if r.status not in allowed:
                continue
            if level is None:
                out.append(r.request if document_type == "request" else r.response)
            elif level == 0:
                out.append(
                    {"workflow_id": r.workflow_id, "marker": r.marker, "status": r.status}
                )
            elif level in (1, 2):
                out.append(self._synthetic_command(r.request or {}, level))
            elif level == 3:
                out.append(r.request)
            elif level == 4:
                out.append(r.response)
            else:  # level 5: extended response
                out.append(
                    {"workflow_id": r.workflow_id, "status": r.status, "response": r.response}
                )
        return out

    # -- oph_instances / oph_tasks / oph_loggingbk (run-ledger queries,
    #    oph_ophidiadb_query.h:34-49 job tables; :79-93 host instances) --------
    def instances(self) -> list[dict]:
        """Infrastructure view (oph_instances): Spark executor state stands in
        for the reference's host/DBMS instance tables."""
        sc = self.spark.sparkContext
        return [
            {
                "host": sc.master,
                "status": "up" if self.service_up else "down",
                "cores": sc.defaultParallelism,
                "app_id": sc.applicationId,
            }
        ]

    def tasks_history(self, session_id: str | None = None, status: str | None = None) -> list[dict]:
        """oph_tasks: per-job history rows from the ledger, filterable by
        session and status mask-name (the reference's UNION ... ORDER BY over
        job/jobaccounting, oph_ophidiadb_query.h:39-47)."""
        out = []
        for r in self.ledger:
            if session_id is not None and r.session_id != session_id:
                continue
            if status is not None and r.status != status:
                continue
            out.append(
                {
                    "workflow_id": r.workflow_id,
                    "marker": r.marker,
                    "session": r.session_id,
                    "operator": (r.request or {}).get("name", ""),
                    "status": r.status,
                }
            )
        return sorted(out, key=lambda d: d["workflow_id"])

    def loggingbk(self, session_filter: str = "", job_filter: str = "", limit: int = 100) -> list[dict]:
        """oph_loggingbk (oph_json_objkeys.h:32): LIKE-style filters over the
        accounting log, newest first (mirrors the reference's LIKE queries,
        oph_ophidiadb_query.h:90-93)."""
        rows = [
            {
                "session": r.session_id,
                "workflow_id": r.workflow_id,
                "marker": r.marker,
                "status": r.status,
            }
            for r in self.ledger
            if session_filter in r.session_id and job_filter in str(r.workflow_id)
        ]
        return rows[::-1][:limit]

    def persist_ledger(self, path: str) -> None:
        """Write the run ledger as a parquet table (the reference's
        job/jobaccounting MySQL tables; Delta on clusters with it — parquet
        here). Requests/responses are stored as JSON strings like the
        reference's sessions/<code>/json/ files (oph_gather.h:151-166)."""
        import json

        rows = [
            (
                r.workflow_id, r.marker, r.session_id, r.status,
                json.dumps(r.request), json.dumps(r.response, default=str),
            )
            for r in self.ledger
        ]
        schema = (
            "workflow_id int, marker int, session_id string, status string, "
            "request string, response string"
        )
        self.spark.createDataFrame(rows or [], schema).write.mode("overwrite").parquet(path)

    def load_ledger(self, path: str) -> int:
        """Re-hydrate the ledger from a persisted parquet table (resume across
        engine restarts). Returns the number of records loaded."""
        import json

        self.ledger = []
        for r in self.spark.read.parquet(path).orderBy("workflow_id").collect():
            rec = RunRecord(
                workflow_id=r.workflow_id, marker=r.marker, session_id=r.session_id,
                request=json.loads(r.request), status=r.status,
            )
            rec.response = json.loads(r.response) if r.response != "null" else None
            self.ledger.append(rec)
        if self.ledger:
            self._next_wid = max(r.workflow_id for r in self.ledger) + 1
        return len(self.ledger)

    # -- oph_log_info ---------------------------------------------------------
    def log_info(self, log_path: str, nlines: int = 10,
                 user: str | None = None) -> list[str]:
        self._require_admin(user, "oph_log_info")
        if not os.path.exists(log_path):
            return []
        with open(log_path, "r", errors="replace") as f:
            return f.readlines()[-nlines:]

    # -- oph_script -----------------------------------------------------------
    ALLOWED_SCRIPTS: dict[str, list[str]] = {"echo": ["echo"], "print_env": ["sh", "-c", "echo $OPH_SESSION_ID:$OPH_WORKFLOW_ID"]}

    def script(
        self, name: str, args: list[str] | None = None,
        session_id: str = "", workflow_id: int = 0, marker_id: int = 0,
    ) -> str:
        """Allow-listed script execution (the reference forwards registered
        scripts only; arbitrary commands are rejected). The reference exports
        session/workflow context as OPH_* environment variables to the script
        — mirrored here."""
        if name not in self.ALLOWED_SCRIPTS:
            raise PermissionError(f"script {name!r} not registered")
        cmd = self.ALLOWED_SCRIPTS[name] + list(args or [])
        env = _child_env(session_id, workflow_id, marker_id)
        return subprocess.run(cmd, capture_output=True, text=True, check=True, env=env).stdout


# -- generic / cdo workflow task execution ------------------------------------
#
# The reference accepts workflow tasks typed "cdo" and "generic" besides
# "ophidia"/"control" (oph_workflow_define.h:109-112): its parser rewrites
# them to operator oph_cdo / oph_generic with the original operator string
# as the `command` argument (oph_workflow_parsing.c:970-1002) and forwards
# them through the normal task path (oph_known_operators.c:128-131); the
# command itself runs on the compute side. The engine analogue executes
# driver-side under the same trust model as oph_script: ONLY commands an
# administrator registered run (first token looked up here — arbitrary
# shell strings are rejected), with the session context exported as OPH_*
# environment variables and stdout/stderr captured into the task response.
ALLOWED_COMMANDS: dict[str, list[str]] = {
    "echo": ["echo"],
    # `cdo` resolves only where a deployment registered the real binary:
    # register_command("cdo", ["/usr/bin/cdo"]) — absent here by default.
}


def register_command(name: str, argv: list[str]) -> None:
    """Register (or replace) an allow-listed command template for
    generic/cdo workflow tasks — the deployment hook a site uses to expose
    its CDO install or local tools."""
    if not name or not argv:
        raise ValueError("register_command needs a name and a non-empty argv")
    ALLOWED_COMMANDS[name] = list(argv)


def resolve_command(command: str) -> tuple[str, list[str]]:
    """Validate a generic/cdo command string against the allow-list and
    return (template name, remaining argv tokens). Shared by run_command
    and the workflow engine's run=no dry-run path, so a dry run exercises
    the same gate that a real run would."""
    import shlex

    tokens = shlex.split(command)
    if not tokens:
        raise ValueError("generic/cdo task with an empty command")
    name, tail = tokens[0], tokens[1:]
    if name not in ALLOWED_COMMANDS:
        raise PermissionError(
            f"command {name!r} not registered (allow-listed: "
            f"{sorted(ALLOWED_COMMANDS)})"
        )
    return name, tail


def run_command(
    command: str,
    src_path: str | None = None,
    session_id: str = "",
    workflow_id: int = 0,
    marker_id: int = 0,
    timeout: float = 600.0,
) -> dict:
    """Execute one allow-listed generic/cdo task command.

    `command` is the task's original operator string, e.g.
    ``"cdo -selname,tas in.nc out.nc"``: the FIRST token must name a
    registered template (PermissionError otherwise, mirroring oph_script's
    gate); the remaining tokens are passed as arguments. When the task was
    file-massive-expanded, each light task's `src_path` is appended as the
    final argument and exported as OPH_FILE, so one template processes one
    file per light task.

    Returns {"command", "args", "file", "returncode", "stdout", "stderr"};
    a non-zero exit raises RuntimeError carrying the stderr tail, so the
    workflow engine's retry/backoff/on_error policy applies unchanged."""
    name, tail = resolve_command(command)
    argv = ALLOWED_COMMANDS[name] + tail
    if src_path:
        argv = argv + [str(src_path)]
    env = _child_env(session_id, workflow_id, marker_id)
    if src_path:
        env["OPH_FILE"] = str(src_path)
    proc = subprocess.run(
        argv, capture_output=True, text=True, env=env, timeout=timeout,
    )
    out = {
        "command": name, "args": tail, "file": src_path,
        "returncode": proc.returncode,
        "stdout": proc.stdout, "stderr": proc.stderr,
    }
    if proc.returncode != 0:
        raise RuntimeError(
            f"command {name!r} exited {proc.returncode}: "
            f"{proc.stderr.strip()[-500:]}"
        )
    return out


# -- operator registry docs (oph_man / operators_list) -----------------------

def _descriptor_args(name: str) -> list[dict] | None:
    """Typed parameter table from the submit-time validation descriptor —
    docs and validation share one source of truth, like the reference
    serving its operator XMLs (OPH_SERVER_XML_EXT_PATH, oph_gather.h:184)."""
    from ophidia_server_spark.plans.descriptors import DESCRIPTORS

    desc = DESCRIPTORS.get(name)
    if desc is None:
        return None
    return [
        {
            "name": a.name, "type": a.type,
            "mandatory": "yes" if a.mandatory else "no",
            **({"default": a.default} if a.default is not None else {}),
            **({"minvalue": a.minvalue} if a.minvalue is not None else {}),
            **({"maxvalue": a.maxvalue} if a.maxvalue is not None else {}),
            **({"values": "|".join(a.values)} if a.values else {}),
            **({"multivalue": "yes"} if a.multivalue else {}),
            **({"allownot": "yes"} if a.allownot else {}),
        }
        for a in desc.args
    ]


def operators_list() -> list[dict]:
    """oph_operators_list (oph_json_objkeys.h:70-71): enumerate the engine's
    operator registry with one-line docs, from the implementing modules,
    plus every operator with a validation descriptor."""
    from ophidia_server_spark.operators import cube_ops, io_ops
    from ophidia_server_spark.pipeline import dedup, similarity, text
    from ophidia_server_spark.plans.descriptors import DESCRIPTORS

    out = {}
    for mod, kind in (
        (cube_ops, "datacube"), (io_ops, "io"),
        (dedup, "pipeline"), (similarity, "pipeline"), (text, "pipeline"),
    ):
        for name in dir(mod):
            fn = getattr(mod, name)
            if callable(fn) and (name.startswith("oph_") or kind == "pipeline") and fn.__doc__:
                if name.startswith("_"):
                    continue
                out[name] = {"operator": name, "kind": kind,
                             "doc": fn.__doc__.strip().splitlines()[0]}
    for name, desc in DESCRIPTORS.items():
        entry = out.setdefault(
            name,
            {"operator": name, "kind": "workflow", "doc": desc.abstract},
        )
        entry["permission"] = desc.permission
    return sorted(out.values(), key=lambda d: d["operator"])


def oph_man(operator: str) -> dict:
    """oph_man (oph_json_objkeys.h:64-67): full docstring plus the typed
    parameter table (descriptor-driven, same table validation enforces)."""
    for entry in operators_list():
        if entry["operator"] == operator:
            args = _descriptor_args(operator)
            if args is not None:
                entry = {**entry, "args": args}
            return entry
    raise KeyError(operator)
