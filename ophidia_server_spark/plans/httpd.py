"""HTTP request endpoint: the reference's web-service surface re-expressed
as JSON-over-HTTP on the stdlib ThreadingHTTPServer.

The reference is a gSOAP service: `oph__ophExecuteMain` accepts a JSON
workflow (oph_execute_main.c:256), `exec_mode` selects sync (the call blocks
on a condition variable until the workflow closes) or async (the jobid
returns immediately, oph_parser.h:78-81), and completion is observed either
by SOAP notification or by the poll-mode job-queue monitor
(oph_workflow_engine.c:7121-7356). `oph_resume` re-reads stored response
documents by session/workflow id (oph_execute_main.c:682, 2193-2276).

Spark-native mapping — same contract, idiomatic transport:

  POST /execute            body = workflow JSON; optional top-level
                           "exec_mode": "sync" (default) | "async" and
                           "callback": an http(s) URL POSTed the closing
                           job state (the GET /jobs/<id> payload) on any
                           terminal transition — the push-notification
                           analogue of the reference's SOAP callback
                           (`oph__oph_notify`, oph_notify.c:39).
                           sync  -> 200 with the full response document
                                    (plans/response.py workflow_response).
                           async -> 202 with {"jobid", "status"} immediately;
                                    the workflow runs on a bounded worker
                                    pool (SERVER_FARM_SIZE analogue).
  GET  /jobs/<id>          status + (once closed) the stored response — the
                           poll-mode notification alternative, doubling as
                           oph_resume document_type=response.
  GET  /jobs               the session's job list (the
                           MYSQL_RETRIEVE_WORKFLOWS_OF_SESSION shape).

Auth: `Authorization: Bearer <token>` resolves to (user, role) in the
constructor's token table; the role rides into engine.run(role=...) so the
per-operator role checks (auth.py, oph_auth.h:79-96) gate every dispatched
task exactly as a direct caller's would be. No token table => open server
(trusted driver-side use, role enforcement off).

Threading: ThreadingHTTPServer gives the gSOAP-farm shape (one thread per
in-flight request); async workflows share a ThreadPoolExecutor so a burst of
submissions queues instead of forking unbounded Spark jobs.

Admission control (server.conf.in QUEUE_SIZE/TASK_LIMIT/CORE_LIMIT, all
0 = unlimited by default like the reference):
  queue_size — active (queued + running) jobs beyond farm_size + queue_size
               are refused with a named 503 (oph_job_list.c:104's
               OPH_JOB_LIST_FULL), instead of queueing unboundedly in the
               executor;
  task_limit — a user holding task_limit active jobs gets a named 429 for
               the next submit (the per-user bound of the reference's
               queue monitor, oph_workflow_engine.c:7121-7356);
  core_limit — a job declaring `ncores` over the whole budget is refused
               503; an admitted job over the momentary availability WAITS
               for cores like the reference's rmanager
               (oph_rmanager.c:795-805 blocks, it doesn't reject).
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from ophidia_server_spark.plans.response import workflow_response


@dataclass
class _Job:
    jobid: int
    name: str
    status: str = "OPH_ODB_STATUS_RUNNING"
    response: dict | None = None
    error: str | None = None
    user: str = ""
    ncores: int = 1              # declared core ask (CORE_LIMIT accounting)
    request: dict | None = None  # stored request document (oph_resume source)
    callback: str | None = None  # completion-notify URL (oph_notify.c:39)
    notified: bool = False       # a job notifies exactly once
    notify_error: str | None = None


@dataclass
class EngineHttpServer:
    """JSON-over-HTTP front-end for a WorkflowEngine."""

    engine: Any
    tokens: dict[str, tuple[str, str]] | None = None   # token -> (user, role)
    # Pluggable bearer-token validation (auth.TokenValidator): set this to
    # a SignedTokenValidator (expiry/audience checks) or a custom IdP
    # introspector; when None, `tokens` provides the static table, and when
    # both are None the server is open (trusted driver-side use). The
    # reference's token path is oph_execute_main.c:324-420.
    validator: Any = None
    _static_validator: Any = None  # lazily-built cache for `tokens` mode
    host: str = "127.0.0.1"
    port: int = 0                                      # 0 = ephemeral
    farm_size: int = 8                                 # async worker pool
    # Admission control, mirroring the reference's server.conf limits
    # (etc/server.conf.in QUEUE_SIZE/TASK_LIMIT/CORE_LIMIT; queue check
    # oph_job_list.c:104, core gate oph_rmanager.c:795-805). 0 = unlimited,
    # the reference's default for all three.
    queue_size: int = 0    # max jobs waiting beyond the farm -> 503 when full
    task_limit: int = 0    # max active (queued+running) jobs PER USER -> 429
    core_limit: int = 0    # server-wide core budget for running jobs
    spark: Any = None                                  # enables real job cancel
    _httpd: ThreadingHTTPServer | None = None
    _thread: threading.Thread | None = None
    _pool: ThreadPoolExecutor | None = None
    _jobs: dict[int, _Job] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _next_id: int = 1
    _active_total: int = 0                             # queued + running jobs
    _running: int = 0                                  # jobs inside engine.run
    _active_by_user: dict[str, int] = field(default_factory=dict)
    _cores_running: int = 0
    _cores_free: threading.Condition = field(
        default_factory=threading.Condition
    )

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> int:
        """Bind and serve on a daemon thread; returns the bound port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: the engine has its own logs
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _auth(self) -> tuple[str, str | None] | None:
                """(user, role) for this request, None => 401 already sent.
                Resolution order: explicit validator hook > static token
                table > open server. Every refusal carries the validator's
                named reason (expired / bad signature / audience mismatch /
                black-listed / unknown token)."""
                from ophidia_server_spark.auth import (
                    StaticTokenValidator, TokenError)

                if server.validator is not None:
                    validator = server.validator
                elif server.tokens is not None:
                    # built once, not per request: StaticTokenValidator
                    # copies the whole table at construction
                    validator = server._static_validator
                    if validator is None:
                        validator = StaticTokenValidator(server.tokens)
                        server._static_validator = validator
                else:
                    return ("anonymous", None)  # open server: no enforcement
                hdr = self.headers.get("Authorization", "")
                tok = hdr[7:] if hdr.startswith("Bearer ") else None
                if not tok:
                    self._send(401, {"error": "invalid or missing bearer token"})
                    return None
                try:
                    return validator.validate(tok)
                except TokenError as exc:
                    self._send(401, {"error": str(exc)})
                    return None

            @staticmethod
            def _is_admin(ident: tuple[str, str | None]) -> bool:
                from ophidia_server_spark import auth

                return bool(auth.role_bits(ident[1]) & auth.ADMIN)

            def _admit(self, wf: dict, ident) -> int | None:
                """Admission control for one submission: returns the job's
                core ask on success (server counters already bumped), or
                None with the named rejection already sent. Mirrors the
                reference's server limits — QUEUE_SIZE (oph_job_list.c:104:
                counter >= farm + queue => FULL), per-user TASK_LIMIT, and
                the CORE_LIMIT sanity bound (a job asking more cores than
                the server will ever hold can never start,
                oph_rmanager.c:795-805)."""
                res = server._try_admit(wf, ident[0])
                if isinstance(res, tuple):
                    self._send(*res)
                    return None
                return res

            def _job_for(self, ident, jid: int):
                """The job if the caller may act on it, else None (response
                already sent). Job-level access is owner-or-admin: the
                reference scopes documents and control to the submitting
                session (oph_filters.c:576-601 session prefix; oph_cancel is
                an admin op, oph_auth.h) — a plain token must not read or
                kill another user's work."""
                with server._lock:
                    job = server._jobs.get(jid)
                if job is None:
                    self._send(404, {"error": f"no job {jid}"})
                    return None
                if job.user != ident[0] and not self._is_admin(ident):
                    self._send(403, {"error": f"job {jid} belongs to another user"})
                    return None
                return job

            def do_POST(self):
                ident = self._auth()
                if ident is None:
                    return
                path = self.path.rstrip("/")
                if path.startswith("/jobs/") and path.endswith("/resubmit"):
                    # oph_resume execute=yes: re-run the stored request
                    # document as a new job (oph_execute_main.c:6026)
                    try:
                        jid = int(path.split("/")[2])
                    except (ValueError, IndexError):
                        self._send(400, {"error": "jobid must be an integer"})
                        return
                    prior = self._job_for(ident, jid)
                    if prior is None:
                        return
                    if prior.request is None:
                        self._send(404, {"error": f"no stored request for job {jid}"})
                        return
                    wf = dict(prior.request)
                    ncores = self._admit(wf, ident)
                    if ncores is None:
                        return
                    job = server._submit_async(wf, ident, ncores=ncores)
                    self._send(202, {"jobid": job.jobid, "status": job.status,
                                     "resubmit_of": jid})
                    return
                if path.startswith("/jobs/") and path.endswith("/cancel"):
                    # oph_cancel: abort a running workflow by id. With a
                    # SparkSession attached, every job tagged with the
                    # workflow's job group is killed mid-stage
                    # (sc.cancelJobGroup — the engine-native kill the
                    # reference delegates to its resource manager).
                    try:
                        jid = int(path.split("/")[2])
                    except (ValueError, IndexError):
                        self._send(400, {"error": "jobid must be an integer"})
                        return
                    job = self._job_for(ident, jid)
                    if job is None:
                        return
                    with server._lock:
                        cancelled = job.status == "OPH_ODB_STATUS_RUNNING"
                        if cancelled:
                            job.status = "OPH_ODB_STATUS_ABORTED"
                    if cancelled and server.spark is not None:
                        server.spark.sparkContext.cancelJobGroup(
                            f"http-job-{jid}"
                        )
                    if cancelled:
                        # abort is a terminal transition too: push it to the
                        # callback so the external scheduler sees the kill
                        server._notify(job)
                    self._send(200, {"jobid": jid, "status": job.status})
                    return
                if path != "/execute":
                    self._send(404, {"error": f"no such endpoint {self.path}"})
                    return
                if "Content-Length" not in self.headers:
                    # Chunked or absent bodies would otherwise silently run
                    # an empty {} workflow; demand a sized body instead.
                    self._send(411, {"error": "Content-Length required on /execute"})
                    return
                try:
                    n = int(self.headers["Content-Length"])
                except ValueError:
                    self._send(400, {"error": "bad Content-Length"})
                    return
                if n <= 0:
                    self._send(400, {"error": "empty body on /execute"})
                    return
                try:
                    wf = json.loads(self.rfile.read(n))
                except Exception as exc:
                    self._send(400, {"error": f"bad request body: {exc}"})
                    return
                # submit-time parameter validation (reference rejects before
                # dispatch: oph_tp_task_params_parser). Values still holding
                # workflow-variable placeholders are re-checked at dispatch.
                from ophidia_server_spark.plans.descriptors import (
                    ParamValidationError, validate_task)

                try:
                    for task in wf.get("tasks", []) if isinstance(wf, dict) else []:
                        validate_task(
                            str(task.get("operator", "")),
                            dict(task.get("arguments", {}) or {}),
                            allow_placeholders=True,
                        )
                except ParamValidationError as exc:
                    self._send(400, {
                        "error": str(exc),
                        "operator": exc.operator,
                        "param": exc.param,
                    })
                    return
                mode = str(wf.pop("exec_mode", "sync")).lower()
                # optional top-level callback URL: notify-on-close pushed to
                # it with the GET /jobs/<id> payload (oph_notify semantics)
                callback = wf.pop("callback", None)
                if callback is not None and not str(callback).startswith(
                    ("http://", "https://")
                ):
                    self._send(400, {"error": "callback must be an http(s) URL"})
                    return
                ncores = self._admit(wf, ident)
                if ncores is None:
                    return
                if mode == "async":
                    job = server._submit_async(wf, ident, callback=callback,
                                               ncores=ncores)
                    self._send(202, {"jobid": job.jobid, "status": job.status})
                    return
                job = server._new_job(wf.get("name", "workflow"), ident[0])
                job.ncores = ncores
                job.request = dict(wf)
                job.callback = callback
                server._run_job(job, wf, ident[1])
                if job.status == "OPH_ODB_STATUS_ERROR" and job.response is None:
                    self._send(500, {"jobid": job.jobid, "status": job.status,
                                     "error": job.error})
                    return
                self._send(200, {"jobid": job.jobid, "status": job.status,
                                 "response": job.response})

            def do_GET(self):
                ident = self._auth()
                if ident is None:
                    return
                from urllib.parse import parse_qs, urlsplit

                parts = urlsplit(self.path)
                path = parts.path.rstrip("/")
                query = parse_qs(parts.query)
                if path == "/jobs":
                    admin = self._is_admin(ident)
                    with server._lock:
                        rows = [
                            {"jobid": j.jobid, "name": j.name,
                             "status": j.status, "user": j.user}
                            for j in server._jobs.values()
                            if admin or j.user == ident[0]
                        ]
                    self._send(200, {"jobs": rows})
                    return
                if path.startswith("/jobs/"):
                    try:
                        jid = int(path.rsplit("/", 1)[1])
                    except ValueError:
                        self._send(400, {"error": "jobid must be an integer"})
                        return
                    job = self._job_for(ident, jid)
                    if job is None:
                        return
                    out = {"jobid": job.jobid, "name": job.name,
                           "status": job.status}
                    # oph_resume document_type=request|response semantics
                    doc = (query.get("document") or ["response"])[0]
                    if doc == "request":
                        if job.request is not None:
                            out["request"] = job.request
                    elif job.response is not None:
                        out["response"] = job.response
                    if job.error:
                        out["error"] = job.error
                    self._send(200, out)
                    return
                self._send(404, {"error": f"no such endpoint {self.path}"})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._httpd.daemon_threads = True
        self._pool = ThreadPoolExecutor(max_workers=self.farm_size)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._pool:
            self._pool.shutdown(wait=False)

    # -- job machinery ------------------------------------------------------

    def _new_job(self, name: str, user: str) -> _Job:
        with self._lock:
            job = _Job(jobid=self._next_id, name=name, user=user)
            self._next_id += 1
            self._jobs[job.jobid] = job
        return job

    # -- admission control ---------------------------------------------------

    def _try_admit(self, wf: dict, user: str):
        """Admit one submission or name the limit that refuses it. Returns
        the core ask (int, counters bumped — pair with _release) on
        success, else (http_code, payload):

          503 QUEUE_SIZE — active jobs (queued + running) already fill the
              farm plus the wait queue (oph_job_list.c:104's
              counter >= farm_size + queue_size => OPH_JOB_LIST_FULL);
          429 TASK_LIMIT — this user already holds task_limit active jobs
              (the per-user concurrency bound the reference's monitor
              enforces per submitter, oph_workflow_engine.c:7121-7356);
          503 CORE_LIMIT — the job declares ncores above the whole server
              budget, so no amount of waiting can ever start it
              (oph_rmanager.c:795-805 would spin forever).

        A job inside the budgets but over the momentary core availability
        is ADMITTED and waits in _run_job — the reference's rmanager
        blocks, it doesn't reject."""
        try:
            ncores = int(wf.get("ncores", 1) or 1)
        except (TypeError, ValueError):
            return 400, {"error": "ncores must be an integer"}
        ncores = max(1, ncores)
        if self.core_limit and ncores > self.core_limit:
            return 503, {
                "error": f"job requests {ncores} cores, server core budget "
                         f"is {self.core_limit}",
                "limit": "CORE_LIMIT",
            }
        with self._lock:
            if self.queue_size and (
                self._active_total >= self.farm_size + self.queue_size
            ):
                return 503, {
                    "error": f"job queue full ({self._active_total} active, "
                             f"farm {self.farm_size} + queue {self.queue_size})",
                    "limit": "QUEUE_SIZE",
                }
            if self.task_limit and (
                self._active_by_user.get(user, 0) >= self.task_limit
            ):
                return 429, {
                    "error": f"user {user} already has "
                             f"{self._active_by_user.get(user, 0)} active "
                             f"jobs (limit {self.task_limit})",
                    "limit": "TASK_LIMIT",
                }
            self._active_total += 1
            self._active_by_user[user] = self._active_by_user.get(user, 0) + 1
        return ncores

    def _release(self, job: _Job) -> None:
        """Return a finished job's admission slots (always paired with a
        successful _try_admit)."""
        with self._lock:
            self._active_total -= 1
            left = self._active_by_user.get(job.user, 1) - 1
            if left <= 0:
                self._active_by_user.pop(job.user, None)
            else:
                self._active_by_user[job.user] = left

    def _notify(self, job: _Job) -> None:
        """Push-style completion notification: POST the job's closing state
        to its callback URL — the same payload GET /jobs/<id> serves. The
        HTTP analogue of the reference's SOAP callback (`oph__oph_notify`,
        oph_notify.c:39), closing the loop for external schedulers that
        chain workflows without polling. Fires exactly once per job, on any
        terminal transition (completed, error, aborted-by-cancel);
        best-effort — a dead receiver never fails the job itself."""
        with self._lock:
            if job.callback is None or job.notified:
                return
            job.notified = True
            payload = {"jobid": job.jobid, "name": job.name,
                       "status": job.status}
            if job.response is not None:
                payload["response"] = job.response
            if job.error:
                payload["error"] = job.error
            url = job.callback
        try:
            import urllib.request

            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            urllib.request.urlopen(req, timeout=10).read()
        except Exception as exc:  # noqa: BLE001 - notify is best-effort
            with self._lock:
                job.notify_error = str(exc)

    def _run_job(self, job: _Job, wf: dict, role: str | None) -> None:
        if self.core_limit:
            # CORE_LIMIT gate: hold the worker until the declared cores fit
            # the server budget — the reference's rmanager blocks the
            # launcher the same way (oph_rmanager.c:797, a wait loop on the
            # running-core counter), it does not reject admitted jobs.
            with self._cores_free:
                while self._cores_running + job.ncores > self.core_limit:
                    self._cores_free.wait(timeout=1.0)
                self._cores_running += job.ncores
        with self._lock:
            self._running += 1
        try:
            self._run_job_inner(job, wf, role)
        finally:
            with self._lock:
                self._running -= 1
            if self.core_limit:
                with self._cores_free:
                    self._cores_running -= job.ncores
                    self._cores_free.notify_all()
            self._release(job)

    def _run_job_inner(self, job: _Job, wf: dict, role: str | None) -> None:
        try:
            if self.spark is not None:
                # tag every Spark job this workflow launches so /cancel can
                # kill them mid-stage (job groups are per-thread properties)
                self.spark.sparkContext.setJobGroup(
                    f"http-job-{job.jobid}", job.name, interruptOnCancel=True
                )
            run = self.engine.run(wf, role=role)
            response = workflow_response(run, wf.get("name", job.name))
            # the final transition races with /cancel: take the lock so a
            # cancel can never be overwritten by a late completion
            with self._lock:
                if job.status == "OPH_ODB_STATUS_ABORTED":
                    aborted = True  # cancelled while running: keep ABORTED
                else:
                    aborted = False
                    job.response = response
                    job.status = run.status
        except Exception as exc:  # engine-level failure (parse, deadlock, ...)
            with self._lock:
                aborted = job.status == "OPH_ODB_STATUS_ABORTED"
                if not aborted:
                    job.status = "OPH_ODB_STATUS_ERROR"
                    job.error = str(exc)
        # the cancel path notifies from the /cancel handler; every other
        # terminal transition notifies here (once, _notify dedups)
        if not aborted:
            self._notify(job)

    def _submit_async(self, wf: dict, ident: tuple[str, str | None],
                      callback: str | None = None, ncores: int = 1) -> _Job:
        job = self._new_job(wf.get("name", "workflow"), ident[0])
        job.ncores = ncores
        job.request = dict(wf)
        job.callback = callback
        self._pool.submit(self._run_job, job, wf, ident[1])
        return job
