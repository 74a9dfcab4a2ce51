"""HTTP endpoint tests: the JSON-over-HTTP front-end (plans/httpd.py) serving
a WorkflowEngine — submit sync/async, poll jobs, bearer auth, role gating.

Mirrors the reference's service semantics: exec_mode sync blocks for the
response document (oph_parser.h:78-81), async returns the jobid and the
client polls (the poll-mode monitor alternative to SOAP notify,
oph_workflow_engine.c:7121-7356)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from ophidia_server_spark.plans.httpd import EngineHttpServer
from ophidia_server_spark.plans.workflow import WorkflowEngine


def _engine() -> WorkflowEngine:
    ops = {
        "oph_list": lambda engine, args, inputs: ["c1", "c2"],
        "oph_randcube": lambda engine, args, inputs: f"pid:{args.get('nrows', 1)}",
        "oph_delete": lambda engine, args, inputs: "deleted",
        "oph_service": lambda engine, args, inputs: "toggled",
        "slowop": lambda engine, args, inputs: (time.sleep(0.2), "done")[1],
    }
    return WorkflowEngine(operators=ops)


def _req(port: int, path: str, body: dict | None = None, token: str | None = None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method="POST" if data else "GET")
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server():
    srv = EngineHttpServer(
        engine=_engine(),
        tokens={"tok-admin": ("alice", "admin"), "tok-read": ("bob", "read")},
    )
    port = srv.start()
    yield srv, port
    srv.stop()


def test_sync_execute_returns_response_document(server):
    _, port = server
    wf = {
        "name": "probe",
        "tasks": [
            {"name": "r", "operator": "oph_randcube", "arguments": {"nrows": 7}},
            {"name": "ls", "operator": "oph_list", "dependencies": ["r"]},
        ],
    }
    status, out = _req(port, "/execute", wf, token="tok-admin")
    assert status == 200
    assert out["status"] == "OPH_ODB_STATUS_COMPLETED"
    assert out["jobid"] >= 1
    # the stored document is the reference response model (per-task sections)
    assert out["response"]["workflow"] == "probe"


def test_async_execute_polls_to_completion(server):
    _, port = server
    wf = {
        "name": "slow",
        "exec_mode": "async",
        "tasks": [{"name": "s", "operator": "slowop"}],
    }
    status, out = _req(port, "/execute", wf, token="tok-admin")
    assert status == 202
    jid = out["jobid"]
    assert out["status"] == "OPH_ODB_STATUS_RUNNING"
    for _ in range(100):
        status, got = _req(port, f"/jobs/{jid}", token="tok-admin")
        if got["status"] != "OPH_ODB_STATUS_RUNNING":
            break
        time.sleep(0.05)
    assert got["status"] == "OPH_ODB_STATUS_COMPLETED"
    assert got["response"]["workflow"] == "slow"
    # the job list carries the session's jobs (workflow-of-session shape);
    # a non-admin token sees only its own jobs, an admin sees everyone's
    _, lst = _req(port, "/jobs", token="tok-admin")
    assert any(j["jobid"] == jid and j["user"] == "alice" for j in lst["jobs"])
    _, lst_bob = _req(port, "/jobs", token="tok-read")
    assert not any(j["jobid"] == jid for j in lst_bob["jobs"])


def test_missing_or_bad_token_is_401(server):
    _, port = server
    wf = {"name": "x", "tasks": [{"name": "ls", "operator": "oph_list"}]}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/execute", wf)
    assert e.value.code == 401
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/execute", wf, token="nope")
    assert e.value.code == 401


def test_role_gates_operator_dispatch(server):
    _, port = server
    # read role may list...
    status, out = _req(
        port, "/execute",
        {"name": "ls", "tasks": [{"name": "ls", "operator": "oph_list"}]},
        token="tok-read",
    )
    assert out["status"] == "OPH_ODB_STATUS_COMPLETED"
    # ...but not delete (write) nor service (admin): the task fails through
    # the engine's on_error path and the workflow reports the error
    for op in ("oph_delete", "oph_service"):
        status, out = _req(
            port, "/execute",
            {"name": "deny", "tasks": [{"name": "t", "operator": op}]},
            token="tok-read",
        )
        assert out["status"] != "OPH_ODB_STATUS_COMPLETED"
    # admin may delete
    status, out = _req(
        port, "/execute",
        {"name": "ok", "tasks": [{"name": "t", "operator": "oph_delete"}]},
        token="tok-admin",
    )
    assert out["status"] == "OPH_ODB_STATUS_COMPLETED"


def test_open_server_skips_auth(server):
    srv = EngineHttpServer(engine=_engine())  # no token table => open
    port = srv.start()
    try:
        status, out = _req(
            port, "/execute",
            {"name": "open", "tasks": [{"name": "ls", "operator": "oph_list"}]},
        )
        assert out["status"] == "OPH_ODB_STATUS_COMPLETED"
    finally:
        srv.stop()


def test_unknown_paths_and_jobs_404(server):
    _, port = server
    for path in ("/nope", "/jobs/999"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(port, path, token="tok-admin")
        assert e.value.code == 404


def test_async_farm_drains_concurrent_submissions(server):
    # a burst of async submissions beyond farm_size queues and completes
    # (the reference's SERVER_FARM_SIZE admission shape)
    _, port = server
    jids = []
    for i in range(10):
        _, out = _req(
            port, "/execute",
            {"name": f"b{i}", "exec_mode": "async",
             "tasks": [{"name": "s", "operator": "slowop"}]},
            token="tok-admin",
        )
        jids.append(out["jobid"])
    deadline = time.time() + 30
    done = set()
    while len(done) < len(jids) and time.time() < deadline:
        for jid in jids:
            if jid in done:
                continue
            _, got = _req(port, f"/jobs/{jid}", token="tok-admin")
            if got["status"] != "OPH_ODB_STATUS_RUNNING":
                assert got["status"] == "OPH_ODB_STATUS_COMPLETED"
                done.add(jid)
        time.sleep(0.05)
    assert done == set(jids)


def test_resume_request_document_and_resubmit(server):
    # GET ?document=request returns the stored request (oph_resume
    # document_type=request); POST /jobs/<id>/resubmit re-runs it as a new
    # job (oph_resume execute=yes, oph_execute_main.c:6026)
    _, port = server
    wf = {"name": "replayme",
          "tasks": [{"name": "r", "operator": "oph_randcube",
                     "arguments": {"nrows": 3}}]}
    _, out = _req(port, "/execute", wf, token="tok-admin")
    jid = out["jobid"]
    _, doc = _req(port, f"/jobs/{jid}?document=request", token="tok-admin")
    assert doc["request"]["name"] == "replayme"
    _, re_out = _req(port, f"/jobs/{jid}/resubmit", body={}, token="tok-admin")
    assert re_out["resubmit_of"] == jid
    jid2 = re_out["jobid"]
    assert jid2 != jid
    for _ in range(100):
        _, got = _req(port, f"/jobs/{jid2}", token="tok-admin")
        if got["status"] != "OPH_ODB_STATUS_RUNNING":
            break
        time.sleep(0.05)
    assert got["status"] == "OPH_ODB_STATUS_COMPLETED"
    assert got["response"]["workflow"] == "replayme"


def test_cancel_marks_job_aborted_and_kills_job_group(server):
    # oph_cancel over HTTP: the running job flips to ABORTED and, with a
    # SparkSession attached, its job group is cancelled (spied here)
    class SpySC:
        cancelled = []
        def cancelJobGroup(self, g):
            self.cancelled.append(g)
        def setJobGroup(self, *a, **kw):
            pass
    class SpySpark:
        sparkContext = SpySC()

    srv = EngineHttpServer(
        engine=_engine(),
        tokens={"tok-admin": ("alice", "admin")},
        spark=SpySpark(),
    )
    port = srv.start()
    try:
        _, out = _req(
            port, "/execute",
            {"name": "victim", "exec_mode": "async",
             "tasks": [{"name": "s", "operator": "slowop"}]},
            token="tok-admin",
        )
        jid = out["jobid"]
        _, got = _req(port, f"/jobs/{jid}/cancel", body={}, token="tok-admin")
        assert got["status"] == "OPH_ODB_STATUS_ABORTED"
        assert SpySC.cancelled == [f"http-job-{jid}"]
        # the status sticks even after the underlying run finishes
        time.sleep(0.4)
        _, after = _req(port, f"/jobs/{jid}", token="tok-admin")
        assert after["status"] == "OPH_ODB_STATUS_ABORTED"
        # cancelling a finished job is a no-op on its final status
        _, out2 = _req(
            port, "/execute",
            {"name": "done", "tasks": [{"name": "ls", "operator": "oph_list"}]},
            token="tok-admin",
        )
        _, got2 = _req(port, f"/jobs/{out2['jobid']}/cancel", body={},
                       token="tok-admin")
        assert got2["status"] == "OPH_ODB_STATUS_COMPLETED"
    finally:
        srv.stop()



def test_job_endpoints_are_owner_or_admin(server):
    # bob (read role) must not read, resubmit or cancel alice's job
    _, port = server
    _, out = _req(
        port, "/execute",
        {"name": "private", "tasks": [{"name": "ls", "operator": "oph_list"}]},
        token="tok-admin",
    )
    jid = out["jobid"]
    for path, body in ((f"/jobs/{jid}", None),
                       (f"/jobs/{jid}?document=request", None),
                       (f"/jobs/{jid}/resubmit", {}),
                       (f"/jobs/{jid}/cancel", {})):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(port, path, body=body, token="tok-read")
        assert e.value.code == 403, path
    # the owner itself retains full access even without the admin bit
    _, own = _req(
        port, "/execute",
        {"name": "mine", "tasks": [{"name": "ls", "operator": "oph_list"}]},
        token="tok-read",
    )
    _, got = _req(port, f"/jobs/{own['jobid']}", token="tok-read")
    assert got["status"] == "OPH_ODB_STATUS_COMPLETED"


def test_execute_rejects_bad_param_with_named_400(server):
    # submit-time validation (oph_tp_task_params_parser semantics): a typo'd
    # or out-of-range argument must come back as a named 400, not a traceback
    _, port = server
    for args in ({"nrowz": 7},               # unknown key (typo)
                 {"nrows": 0},               # below minvalue=1
                 ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(port, "/execute",
                 {"name": "bad",
                  "tasks": [{"name": "r", "operator": "oph_randcube",
                             "arguments": args}]},
                 token="tok-admin")
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert body["operator"] == "oph_randcube"
        assert body["param"] in ("nrowz", "nrows")
        assert "oph_randcube" in body["error"]


def test_execute_placeholder_args_validate_at_dispatch(server):
    # a value still holding @var passes submit-time checks, then the
    # substituted value is validated at dispatch (here: valid)
    _, port = server
    wf = {
        "name": "subst",
        "variables": {"count": "9"},
        "tasks": [{"name": "r", "operator": "oph_randcube",
                   "arguments": {"nrows": "@count"}}],
    }
    status, out = _req(port, "/execute", wf, token="tok-admin")
    assert status == 200
    assert out["status"] == "OPH_ODB_STATUS_COMPLETED"


class _CallbackReceiver:
    """Tiny local webhook sink collecting notify payloads."""

    def __init__(self):
        import http.server
        import threading

        self.hits = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                outer.hits.append(json.loads(self.rfile.read(n)))
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        self.httpd = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/notify"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def wait_for(self, n, timeout=10.0):
        deadline = time.time() + timeout
        while len(self.hits) < n and time.time() < deadline:
            time.sleep(0.02)
        return self.hits

    def close(self):
        self.httpd.shutdown()


def test_callback_notify_on_completion(server):
    # push-style completion notification (oph_notify.c:39 semantics): the
    # callback URL receives the closing state for sync and async jobs
    _, port = server
    rx = _CallbackReceiver()
    try:
        _, out = _req(port, "/execute",
                      {"name": "cb_sync", "callback": rx.url,
                       "tasks": [{"name": "ls", "operator": "oph_list"}]},
                      token="tok-admin")
        hits = rx.wait_for(1)
        assert len(hits) == 1
        assert hits[0]["jobid"] == out["jobid"]
        assert hits[0]["status"] == "OPH_ODB_STATUS_COMPLETED"
        assert hits[0]["response"]["workflow"] == "cb_sync"
        _, out2 = _req(port, "/execute",
                       {"name": "cb_async", "exec_mode": "async",
                        "callback": rx.url,
                        "tasks": [{"name": "s", "operator": "slowop"}]},
                       token="tok-admin")
        hits = rx.wait_for(2)
        assert len(hits) == 2
        assert hits[1]["jobid"] == out2["jobid"]
        assert hits[1]["status"] == "OPH_ODB_STATUS_COMPLETED"
    finally:
        rx.close()


def test_callback_notify_on_cancel_fires_once(server):
    _, port = server
    rx = _CallbackReceiver()
    try:
        _, out = _req(port, "/execute",
                      {"name": "cb_cancel", "exec_mode": "async",
                       "callback": rx.url,
                       "tasks": [{"name": "s", "operator": "slowop"}]},
                      token="tok-admin")
        jid = out["jobid"]
        _, got = _req(port, f"/jobs/{jid}/cancel", body={}, token="tok-admin")
        assert got["status"] == "OPH_ODB_STATUS_ABORTED"
        hits = rx.wait_for(1)
        assert len(hits) >= 1
        assert hits[0]["status"] == "OPH_ODB_STATUS_ABORTED"
        # the late completion of the cancelled run must NOT notify again
        time.sleep(0.5)
        assert len(hits) == 1
    finally:
        rx.close()


def test_callback_must_be_http_url(server):
    _, port = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/execute",
             {"name": "bad_cb", "callback": "file:///etc/passwd",
              "tasks": [{"name": "ls", "operator": "oph_list"}]},
             token="tok-admin")
    assert e.value.code == 400


def _req_raw(port, path, body=None, token=None):
    """Like _req but returns (status, payload) for error responses too."""
    try:
        return _req(port, path, body, token=token)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_queue_size_cap_rejects_burst_with_named_503():
    # farm 1 + queue 2: the 4th concurrently-active submission must be
    # refused with the named QUEUE_SIZE 503 (oph_job_list.c:104 FULL), not
    # queued unboundedly in the executor
    srv = EngineHttpServer(
        engine=_engine(), tokens={"t": ("u", "admin")},
        farm_size=1, queue_size=2,
    )
    port = srv.start()
    try:
        wf = lambda i: {"name": f"q{i}", "exec_mode": "async",
                        "tasks": [{"name": "s", "operator": "slowop"}]}
        codes = [_req_raw(port, "/execute", wf(i), token="t")[0]
                 for i in range(3)]
        assert codes == [202, 202, 202]
        code, out = _req_raw(port, "/execute", wf(3), token="t")
        assert code == 503
        assert out["limit"] == "QUEUE_SIZE"
        assert "queue full" in out["error"]
        # slots free as jobs drain: eventually a submit is admitted again
        deadline = time.time() + 30
        while time.time() < deadline:
            code, _ = _req_raw(port, "/execute", wf(99), token="t")
            if code == 202:
                break
            time.sleep(0.05)
        assert code == 202
    finally:
        srv.stop()


def test_per_user_task_limit_is_429_and_per_user():
    srv = EngineHttpServer(
        engine=_engine(),
        tokens={"ta": ("alice", "admin"), "tb": ("bob", "admin")},
        farm_size=4, task_limit=2,
    )
    port = srv.start()
    try:
        wf = lambda i: {"name": f"t{i}", "exec_mode": "async",
                        "tasks": [{"name": "s", "operator": "slowop"}]}
        assert _req_raw(port, "/execute", wf(0), token="ta")[0] == 202
        assert _req_raw(port, "/execute", wf(1), token="ta")[0] == 202
        code, out = _req_raw(port, "/execute", wf(2), token="ta")
        assert code == 429
        assert out["limit"] == "TASK_LIMIT"
        # the limit is per user: bob is unaffected by alice's saturation
        assert _req_raw(port, "/execute", wf(3), token="tb")[0] == 202
    finally:
        srv.stop()


def test_core_limit_over_budget_rejected_within_budget_waits():
    srv = EngineHttpServer(
        engine=_engine(), tokens={"t": ("u", "admin")},
        farm_size=4, core_limit=4,
    )
    port = srv.start()
    try:
        # asking more cores than the server will ever have: named 503
        code, out = _req_raw(
            port, "/execute",
            {"name": "huge", "ncores": 8,
             "tasks": [{"name": "s", "operator": "slowop"}]},
            token="t",
        )
        assert code == 503 and out["limit"] == "CORE_LIMIT"
        # two 3-core jobs can't run together on a 4-core budget: the second
        # WAITS (rmanager-style), both complete, and the running overlap
        # never exceeds the budget
        jids = []
        for i in range(2):
            code, out = _req_raw(
                port, "/execute",
                {"name": f"c{i}", "exec_mode": "async", "ncores": 3,
                 "tasks": [{"name": "s", "operator": "slowop"}]},
                token="t",
            )
            assert code == 202
            jids.append(out["jobid"])
        deadline = time.time() + 30
        while time.time() < deadline:
            got = [_req_raw(port, f"/jobs/{j}", token="t")[1]["status"]
                   for j in jids]
            assert srv._cores_running <= 4
            if all(g == "OPH_ODB_STATUS_COMPLETED" for g in got):
                break
            time.sleep(0.05)
        assert all(
            _req_raw(port, f"/jobs/{j}", token="t")[1]["status"]
            == "OPH_ODB_STATUS_COMPLETED"
            for j in jids
        )
    finally:
        srv.stop()


def test_signed_token_validation_paths_through_live_httpd():
    # SignedTokenValidator plugged into the facade: valid tokens resolve
    # (user, role) and role-gate dispatch; expired / bad-audience /
    # bad-signature / black-listed tokens are 401 with the named reason
    # (the reference's IdP token path, oph_execute_main.c:324-420)
    from ophidia_server_spark.auth import SignedTokenValidator

    clock = [1000.0]
    v = SignedTokenValidator(
        "server-secret", audience="ophidia-engine",
        blacklist={"mallory"}, clock=lambda: clock[0],
    )
    srv = EngineHttpServer(engine=_engine(), validator=v)
    port = srv.start()
    try:
        wf = {"name": "w", "tasks": [{"name": "ls", "operator": "oph_list"}]}
        ok = v.issue("alice", "admin", ttl=60)
        status, out = _req(port, "/execute", wf, token=ok)
        assert status == 200
        assert out["status"] == "OPH_ODB_STATUS_COMPLETED"

        expired = v.issue("alice", "admin", ttl=60)
        clock[0] += 120  # past exp
        code, err = _req_raw(port, "/execute", wf, token=expired)
        assert code == 401 and "expired" in err["error"]
        clock[0] = 1000.0

        wrong_aud = v.issue("alice", "admin", audience="other-service")
        code, err = _req_raw(port, "/execute", wf, token=wrong_aud)
        assert code == 401 and "audience" in err["error"]

        forged = SignedTokenValidator(
            "attacker-secret", audience="ophidia-engine",
            clock=lambda: clock[0],
        ).issue("alice", "admin")
        code, err = _req_raw(port, "/execute", wf, token=forged)
        assert code == 401 and "signature" in err["error"]

        banned = v.issue("mallory", "admin")
        code, err = _req_raw(port, "/execute", wf, token=banned)
        assert code == 401 and "black-listed" in err["error"]

        code, err = _req_raw(port, "/execute", wf, token="not.a.jwt")
        assert code == 401 and "malformed" in err["error"]

        # the role claim rides into dispatch: a read token may not delete
        reader = v.issue("bob", "read")
        wf_del = {"name": "d",
                  "tasks": [{"name": "x", "operator": "oph_delete",
                             "arguments": {"cube": "pid:1"}}]}
        status, out = _req(port, "/execute", wf_del, token=reader)
        assert out["status"] == "OPH_ODB_STATUS_ERROR"
    finally:
        srv.stop()


def test_static_validator_blacklist_and_alg_guard():
    from ophidia_server_spark.auth import (
        SignedTokenValidator, StaticTokenValidator, TokenError)

    sv = StaticTokenValidator({"t1": ("u1", "read")}, blacklist={"u1"})
    with pytest.raises(TokenError, match="black-listed"):
        sv.validate("t1")
    # alg-confusion guard: an HS256 validator refuses alg=none tokens
    import base64 as b64
    import json as js

    v = SignedTokenValidator("s")
    h = b64.urlsafe_b64encode(js.dumps({"alg": "none"}).encode()).rstrip(b"=")
    p = b64.urlsafe_b64encode(
        js.dumps({"sub": "x", "exp": 1e12}).encode()
    ).rstrip(b"=")
    with pytest.raises(TokenError, match="algorithm"):
        v.validate(h.decode() + "." + p.decode() + ".")


def test_signed_token_non_object_payload_is_named_401():
    # a correctly-signed token whose payload JSON is not an object must be
    # the contract's named TokenError/401, not an AttributeError
    import base64 as b64
    import hashlib
    import hmac as hmac_mod
    import json as js

    from ophidia_server_spark.auth import SignedTokenValidator, TokenError

    v = SignedTokenValidator("s")
    h = b64.urlsafe_b64encode(js.dumps({"alg": "HS256"}).encode()).rstrip(b"=").decode()
    p = b64.urlsafe_b64encode(js.dumps([1, 2]).encode()).rstrip(b"=").decode()
    sig = hmac_mod.new(b"s", f"{h}.{p}".encode(), hashlib.sha256).digest()
    tok = f"{h}.{p}." + b64.urlsafe_b64encode(sig).rstrip(b"=").decode()
    with pytest.raises(TokenError, match="payload"):
        v.validate(tok)


def test_cli_client_submit_poll_and_cancel(server, tmp_path, capsys):
    # scripts/client.py — the oph_term-style terminal loop over the live
    # endpoint: sync submit, async submit + poll, jobs list, status
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    client = importlib.import_module("client")
    _, port = server
    base = f"http://127.0.0.1:{port}"
    wf = {"name": "cli", "tasks": [
        {"name": "r", "operator": "oph_randcube", "arguments": {"nrows": 3}},
    ]}
    wf_path = tmp_path / "wf.json"
    wf_path.write_text(json.dumps(wf))
    rc = client.main([
        "--url", base, "--token", "tok-admin", "submit", str(wf_path),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "OPH_ODB_STATUS_COMPLETED" in out
    # async + poll
    rc = client.main([
        "--url", base, "--token", "tok-admin", "submit", str(wf_path),
        "--async",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and '"job_id"' in out
    assert "OPH_ODB_STATUS_COMPLETED" in out
    # jobs listing includes both runs
    rc = client.main(["--url", base, "--token", "tok-admin", "jobs"])
    out = capsys.readouterr().out
    assert rc == 0 and out.count('"cli"') >= 2
    # bad token -> nonzero exit
    rc = client.main(["--url", base, "--token", "nope", "jobs"])
    capsys.readouterr()
    assert rc == 1
