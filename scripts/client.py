"""Minimal terminal client for the engine's HTTP endpoint — the oph_term
analogue (the reference ships a separate terminal that submits workflow
JSON to the server and polls results; this is that loop over the engine's
JSON-over-HTTP surface, stdlib only).

Usage:
  python scripts/client.py --url http://localhost:8000 --token TOKEN \
      submit workflow.json [--async] [--poll-interval 0.5]
  python scripts/client.py --url ... --token ... jobs
  python scripts/client.py --url ... --token ... status <job_id>
  python scripts/client.py --url ... --token ... cancel <job_id>
  python scripts/client.py --url ... --token ... resubmit <job_id>

`submit` prints the closing job document; with --async it prints the job id
immediately and polls until the job closes (matching the reference's
sync/async exec modes, oph_parser.h:78-81).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.error
import urllib.request


def _call(url: str, token: str, method: str = "GET", body: dict | None = None):
    req = urllib.request.Request(url, method=method)
    req.add_header("Authorization", f"Bearer {token}")
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        req.add_header("Content-Type", "application/json")
        req.add_header("Content-Length", str(len(data)))
    try:
        with urllib.request.urlopen(req, data) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        try:
            payload = json.loads(e.read() or b"{}")
        except Exception:
            payload = {"error": str(e)}
        return e.code, payload


CLOSED = ("OPH_ODB_STATUS_COMPLETED", "OPH_ODB_STATUS_ERROR",
          "OPH_ODB_STATUS_ABORTED")


def wait_for(base: str, token: str, job_id, interval: float = 0.5,
             timeout: float = 3600.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        code, doc = _call(f"{base}/jobs/{job_id}", token)
        if code != 200:
            return code, doc
        if doc.get("status") in CLOSED:
            return code, doc
        time.sleep(interval)
    return 408, {"error": f"timed out waiting for job {job_id}"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", required=True)
    ap.add_argument("--token", required=True)
    ap.add_argument("--poll-interval", type=float, default=0.5)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_submit = sub.add_parser("submit")
    p_submit.add_argument("workflow")
    p_submit.add_argument("--async", dest="use_async", action="store_true")
    sub.add_parser("jobs")
    for name in ("status", "cancel", "resubmit"):
        p = sub.add_parser(name)
        p.add_argument("job_id")
    args = ap.parse_args(argv)
    base = args.url.rstrip("/")

    if args.cmd == "submit":
        with open(args.workflow) as fh:
            wf = json.load(fh)
        if args.use_async:
            wf["exec_mode"] = "async"  # the body-level switch, oph_parser.h:78-81
        code, doc = _call(f"{base}/execute", args.token, "POST", wf)
        if args.use_async and code == 202:
            job_id = doc.get("jobid")
            print(json.dumps({"job_id": job_id}), flush=True)
            code, doc = wait_for(base, args.token, job_id, args.poll_interval)
    elif args.cmd == "jobs":
        code, doc = _call(f"{base}/jobs", args.token)
    elif args.cmd == "status":
        code, doc = _call(f"{base}/jobs/{args.job_id}", args.token)
    elif args.cmd == "cancel":
        code, doc = _call(f"{base}/jobs/{args.job_id}/cancel", args.token, "POST")
    else:  # resubmit
        code, doc = _call(
            f"{base}/jobs/{args.job_id}/resubmit", args.token, "POST"
        )
    print(json.dumps(doc, indent=2, sort_keys=True))
    return 0 if code < 400 else 1


if __name__ == "__main__":
    sys.exit(main())
