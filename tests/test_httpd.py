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


# fixed 1024-bit RSA test keypair (test-only; deterministic)
_RSA_N = int(
    "0x7fe7060404d4d8fe2541d19fd4cb4de19e3fd4f94eab0543b5afaf52a1afe309"
    "5a1fde4fe0c78887228341a3d5aba29c9fb3402292c98007b0cd4fda139c17542"
    "1984ccd75481f3b85d6bd1a9b90437bd032ab67854fb38790bec0f638ab8679a3"
    "cd0889fde5cb65fea22d98fb0a5ed8403199d6dfdb1a5eb06d350285735733", 16)
_RSA_D = int(
    "0xa1bfc81bcd00606b0732f5a6ebb53008e3d855bdf37ed4698c9b615d5e9cd0c2"
    "42f78a6dfa165cd28912f52ffc47d29dc0593002891fca89ef4db66e53de52a08"
    "10ba69df58a27b9153eeb88dcfdd313fe84dcaa3a7d8268cb8392e7a9bdb4184c"
    "05ab2305d864b58df67c2655e389482f1d92c489b03fcc96fbe43b4fcf3e1", 16)
_RSA_E = 65537
_RSA_PEM = """-----BEGIN RSA PUBLIC KEY-----
MIGIAoGAf+cGBATU2P4lQdGf1MtN4Z4/1PlOqwVDta+vUqGv4wlaH95P4MeIhyKD
QaPVq6Kcn7NAIpLJgAewzU/aE5wXVCGYTM11SB87hda9GpuQQ3vQMqtnhU+zh5C+
wPY4q4Z5o80Iif3ly2X+oi2Y+wpe2EAxmdbf2xpesG01AoVzVzMCAwEAAQ==
-----END RSA PUBLIC KEY-----
"""


def _rs256_mint(payload: dict, kid: str | None = "k1", d: int = _RSA_D) -> str:
    # a provider-side RS256 signer (EMSA-PKCS1-v1_5, RFC 8017) — what a
    # real IdP does with its private key
    import base64 as b64
    import hashlib
    import json as js

    from ophidia_server_spark.auth import _SHA256_DER_PREFIX

    def enc(o):
        return b64.urlsafe_b64encode(js.dumps(o, separators=(",", ":")).encode()).rstrip(b"=").decode()

    header = {"alg": "RS256", "typ": "JWT"}
    if kid is not None:
        header["kid"] = kid
    signing = enc(header) + "." + enc(payload)
    k = (_RSA_N.bit_length() + 7) // 8
    t = _SHA256_DER_PREFIX + hashlib.sha256(signing.encode()).digest()
    em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    sig = pow(int.from_bytes(em, "big"), d, _RSA_N).to_bytes(k, "big")
    return signing + "." + b64.urlsafe_b64encode(sig).rstrip(b"=").decode()


def test_rs256_jwks_validation_paths_through_live_httpd(tmp_path):
    # the reference's OpenID path (oph_execute_main.c:324-420): provider-
    # signed RS256 tokens verified against the provider's PUBLISHED keys —
    # here pinned as a local JWKS file (no network). Valid tokens resolve
    # (user, role); expired / unknown-kid / tampered / HMAC-alg-confusion /
    # black-listed tokens are 401 with the named reason.
    import base64 as b64
    import json as js

    from ophidia_server_spark.auth import RS256TokenValidator

    jwks = {"keys": [{
        "kty": "RSA", "use": "sig", "kid": "k1", "alg": "RS256",
        "n": b64.urlsafe_b64encode(_RSA_N.to_bytes(128, "big")).rstrip(b"=").decode(),
        "e": b64.urlsafe_b64encode(_RSA_E.to_bytes(3, "big")).rstrip(b"=").decode(),
    }]}
    jwks_path = tmp_path / "jwks.json"
    jwks_path.write_text(js.dumps(jwks))
    clock = [1000.0]
    v = RS256TokenValidator.from_jwks_file(
        str(jwks_path), audience="ophidia-engine",
        blacklist={"mallory"}, clock=lambda: clock[0],
    )
    srv = EngineHttpServer(engine=_engine(), validator=v)
    port = srv.start()
    try:
        wf = {"name": "w", "tasks": [{"name": "ls", "operator": "oph_list"}]}
        ok = _rs256_mint({"sub": "alice", "role": "admin", "exp": 2000.0,
                          "aud": "ophidia-engine"})
        status, out = _req(port, "/execute", wf, token=ok)
        assert status == 200
        assert out["status"] == "OPH_ODB_STATUS_COMPLETED"

        clock[0] = 3000.0
        code, err = _req_raw(port, "/execute", wf, token=ok)
        assert code == 401 and "expired" in err["error"]
        clock[0] = 1000.0

        unknown_kid = _rs256_mint(
            {"sub": "alice", "role": "admin", "exp": 2000.0,
             "aud": "ophidia-engine"}, kid="rotated-away")
        code, err = _req_raw(port, "/execute", wf, token=unknown_kid)
        assert code == 401 and "signing key" in err["error"]

        # tampered payload: signature over the original no longer verifies
        h, p, s = ok.split(".")
        evil = js.loads(b64.urlsafe_b64decode(p + "=" * (-len(p) % 4)))
        evil["role"] = "owner"
        p2 = b64.urlsafe_b64encode(
            js.dumps(evil, separators=(",", ":")).encode()
        ).rstrip(b"=").decode()
        code, err = _req_raw(port, "/execute", wf, token=f"{h}.{p2}.{s}")
        assert code == 401 and "signature" in err["error"]

        # alg-confusion: an HS256 token HMAC'd with the PUBLIC key bytes
        # must die at the algorithm check, never reach RSA verification
        import hashlib
        import hmac as hmac_mod

        hh = b64.urlsafe_b64encode(
            js.dumps({"alg": "HS256", "kid": "k1"}).encode()
        ).rstrip(b"=").decode()
        sig = hmac_mod.new(
            _RSA_N.to_bytes(128, "big"), f"{hh}.{p}".encode(), hashlib.sha256
        ).digest()
        confused = f"{hh}.{p}." + b64.urlsafe_b64encode(sig).rstrip(b"=").decode()
        code, err = _req_raw(port, "/execute", wf, token=confused)
        assert code == 401 and "algorithm" in err["error"]

        banned = _rs256_mint({"sub": "mallory", "role": "admin",
                              "exp": 2000.0, "aud": "ophidia-engine"})
        code, err = _req_raw(port, "/execute", wf, token=banned)
        assert code == 401 and "black-listed" in err["error"]

        wrong_aud = _rs256_mint({"sub": "alice", "role": "admin",
                                 "exp": 2000.0, "aud": "other"})
        code, err = _req_raw(port, "/execute", wf, token=wrong_aud)
        assert code == 401 and "audience" in err["error"]
    finally:
        srv.stop()


def test_rs256_pem_key_loading_matches_jwks(tmp_path):
    # the same key pinned as a PEM file (PKCS#1 RSAPublicKey) must verify
    # the same tokens; kid-less tokens try all configured keys
    from ophidia_server_spark.auth import RS256TokenValidator, TokenError

    pem_path = tmp_path / "idp.pem"
    pem_path.write_text(_RSA_PEM)
    clock = [1000.0]
    v = RS256TokenValidator.from_pem_file(
        str(pem_path), kid="k1", clock=lambda: clock[0])
    tok = _rs256_mint({"sub": "alice", "role": "read", "exp": 2000.0}, kid=None)
    assert v.validate(tok) == ("alice", "read")
    import pytest as _pytest

    with _pytest.raises(TokenError, match="signature"):
        v.validate(_rs256_mint(
            {"sub": "alice", "role": "read", "exp": 2000.0},
            kid=None, d=pow(3, 1, _RSA_N - 7)))  # garbage exponent


def test_core_limit_burst_waits_then_runs_in_order():
    # oph_rmanager.c:795-805 semantics under TRUE concurrency: a 3-worker
    # farm with a 2-core server budget takes three 1-core jobs at once —
    # two START, the third is ADMITTED but WAITS (its operator must not
    # begin), and it runs only when a running job returns its core. Gate
    # events (not sleeps) make the ordering deterministic; accounting is
    # asserted through the public job list before and after.
    import threading

    started: dict[str, float] = {}
    finished: dict[str, float] = {}
    gates = {k: threading.Event() for k in ("a", "b", "c")}
    started_evt = {k: threading.Event() for k in ("a", "b", "c")}
    lock = threading.Lock()

    def blocker(engine, args, inputs):
        key = args["key"]
        with lock:
            started[key] = time.monotonic()
        started_evt[key].set()
        gates[key].wait(timeout=10)
        with lock:
            finished[key] = time.monotonic()
        return f"done-{key}"

    srv = EngineHttpServer(
        engine=WorkflowEngine(operators={"blocker": blocker}),
        tokens={"t": ("alice", "admin")},
        farm_size=3, core_limit=2,
    )
    port = srv.start()
    try:
        def submit(key):
            wf = {"name": key, "exec_mode": "async", "ncores": 1,
                  "tasks": [{"name": "b", "operator": "blocker",
                             "arguments": {"key": key}}]}
            _, out = _req(port, "/execute", wf, token="t")
            return out["jobid"]

        ja = submit("a")
        assert started_evt["a"].wait(5)
        jb = submit("b")
        assert started_evt["b"].wait(5)
        jc = submit("c")  # admitted: within every budget — but must WAIT
        assert not started_evt["c"].wait(0.5), "c ran past the core gate"
        # the waiter is visible as an active-but-not-started job
        _, lst = _req(port, "/jobs", token="t")
        by_id = {j["jobid"]: j["status"] for j in lst["jobs"]}
        assert by_id[jc] == "OPH_ODB_STATUS_RUNNING"  # admitted/queued state

        gates["a"].set()  # a returns its core -> c must start
        assert started_evt["c"].wait(5), "c never started after a core freed"
        assert started["c"] >= finished["a"]
        # b never stopped; only a's completion unblocked c
        assert "b" not in finished
        gates["b"].set()
        gates["c"].set()
        for jid in (ja, jb, jc):
            for _ in range(100):
                _, got = _req(port, f"/jobs/{jid}", token="t")
                if got["status"] != "OPH_ODB_STATUS_RUNNING":
                    break
                time.sleep(0.05)
            assert got["status"] == "OPH_ODB_STATUS_COMPLETED"
        # accounting drained: core and admission counters back to zero
        assert srv._cores_running == 0
        assert srv._active_total == 0
        assert srv._active_by_user == {}

        # a declared ask above the whole budget can never start: named 503
        wf_big = {"name": "big", "ncores": 3,
                  "tasks": [{"name": "b", "operator": "blocker",
                             "arguments": {"key": "a"}}]}
        code, err = _req_raw(port, "/execute", wf_big, token="t")
        assert code == 503 and err["limit"] == "CORE_LIMIT"
    finally:
        for e in gates.values():
            e.set()
        srv.stop()
