"""generic / cdo workflow task types — the reference's non-Ophidia
operator path (oph_workflow_define.h:109-112; parser rewrite
oph_workflow_parsing.c:970-1010; forwarding oph_known_operators.c:128-131),
re-expressed as the engine's allow-listed command execution
(management.run_command, the oph_script trust model).
"""

import os
import stat

import pytest

from ophidia_server_spark import management as mgmt
from ophidia_server_spark.plans.workflow import (
    WorkflowEngine,
    WorkflowError,
    rewrite_task_types,
)


@pytest.fixture
def commands():
    """Snapshot/restore the allow-list so tests can register stubs."""
    before = dict(mgmt.ALLOWED_COMMANDS)
    yield mgmt.ALLOWED_COMMANDS
    mgmt.ALLOWED_COMMANDS.clear()
    mgmt.ALLOWED_COMMANDS.update(before)


# -- parser rewrite -----------------------------------------------------------

def test_rewrite_generic_and_cdo_tasks():
    tasks = rewrite_task_types([
        {"name": "a", "type": "generic", "operator": "mytool --fast",
         "arguments": {"x": "1"}},
        {"name": "b", "type": "cdo", "operator": "cdo -selname,tas"},
        {"name": "c", "operator": "oph_subset"},  # default type=ophidia
    ])
    assert tasks[0]["operator"] == "oph_generic"
    assert tasks[0]["arguments"] == {"x": "1", "command": "mytool --fast"}
    assert tasks[0]["rtype"] == "generic" and tasks[0]["type"] == "ophidia"
    assert tasks[1]["operator"] == "oph_cdo"
    assert tasks[1]["arguments"]["command"] == "cdo -selname,tas"
    assert tasks[2]["operator"] == "oph_subset"  # untouched passthrough


def test_rewrite_control_type_prepends_prefix():
    tasks = rewrite_task_types([
        {"name": "f", "type": "control", "operator": "for",
         "arguments": {"key": "i", "values": "1|2"}},
    ])
    assert tasks[0]["operator"] == "oph_for"


def test_unknown_task_type_rejected():
    with pytest.raises(WorkflowError, match="unknown type 'spark'"):
        rewrite_task_types([{"name": "x", "type": "spark", "operator": "y"}])


# -- allow-list gate ----------------------------------------------------------

def test_run_command_rejects_unregistered():
    with pytest.raises(PermissionError, match="not registered"):
        mgmt.run_command("rm -rf /")


def test_run_command_captures_streams_and_env(commands, tmp_path):
    commands["ctx"] = [
        "sh", "-c",
        'echo "sid=$OPH_SESSION_ID wid=$OPH_WORKFLOW_ID mid=$OPH_MARKER_ID"',
    ]
    out = mgmt.run_command("ctx", session_id="s1", workflow_id=7, marker_id=3)
    assert out["returncode"] == 0
    assert out["stdout"].strip() == "sid=s1 wid=7 mid=3"


def test_run_command_nonzero_exit_raises_with_stderr(commands):
    commands["fail"] = ["sh", "-c", "echo boom >&2; exit 3"]
    with pytest.raises(RuntimeError, match="exited 3: boom"):
        mgmt.run_command("fail")


# -- end-to-end through the engine --------------------------------------------

def test_generic_task_executes_and_captures_stdout(commands):
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "say", "type": "generic", "operator": "echo hello world"},
    ]})
    res = run.results["say"]
    assert res.status == "OPH_ODB_STATUS_COMPLETED"
    assert res.value["stdout"].strip() == "hello world"
    assert res.value["returncode"] == 0


def test_unregistered_command_respects_on_error_skip(commands):
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "bad", "type": "generic", "operator": "not_a_tool x",
         "on_error": "skip"},
        {"name": "down", "type": "generic", "operator": "echo never",
         "dependencies": ["bad"]},
    ]})
    assert run.status == "OPH_ODB_STATUS_COMPLETED"
    assert run.results["bad"].status == "OPH_ODB_STATUS_ERROR"
    assert "PermissionError" in run.results["bad"].error
    assert run.results["down"].status == "OPH_ODB_STATUS_SKIPPED"


def test_generic_task_retry_composition(commands, tmp_path):
    # stub binary that fails on the first run, succeeds on the second —
    # the workflow retry policy must absorb the first failure
    marker = tmp_path / "ran_once"
    script = tmp_path / "flaky.sh"
    script.write_text(
        "#!/bin/sh\n"
        f'if [ ! -e "{marker}" ]; then touch "{marker}"; '
        "echo first >&2; exit 1; fi\n"
        "echo recovered\n"
    )
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    commands["flaky"] = [str(script)]
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "t", "type": "generic", "operator": "flaky", "retry": 2},
    ]})
    res = run.results["t"]
    assert res.status == "OPH_ODB_STATUS_COMPLETED"
    assert res.attempts == 2
    assert res.value["stdout"].strip() == "recovered"


def test_generic_task_file_massive_expansion(commands, tmp_path):
    # one light task per expanded file: OPH_FILE exported, file appended
    for n in ("a.nc", "b.nc"):
        (tmp_path / n).write_text("x")
    commands["show"] = ["sh", "-c", 'echo "file=$OPH_FILE"', "show"]
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "m", "type": "generic", "operator": "show",
         "arguments": {"src_path": f"[path={tmp_path};file=.*\\.nc]"}},
    ]})
    res = run.results["m"]
    assert res.status == "OPH_ODB_STATUS_COMPLETED"
    outs = sorted(v["stdout"].strip() for v in res.value)
    assert outs == [f"file={tmp_path}/a.nc", f"file={tmp_path}/b.nc"]
    assert [v["file"] for v in res.value] == [
        f"{tmp_path}/a.nc", f"{tmp_path}/b.nc"]


def test_cdo_task_routes_through_same_gate(commands):
    # a stub standing in for the real CDO binary (not in this container):
    # deployment registers it via register_command
    mgmt.register_command("cdo", ["sh", "-c", 'echo "cdo $*"', "cdo"])
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "c", "type": "cdo", "operator": "cdo -selname,tas in.nc"},
    ]})
    res = run.results["c"]
    assert res.status == "OPH_ODB_STATUS_COMPLETED"
    assert res.value["stdout"].strip() == "cdo -selname,tas in.nc"


def test_generic_requires_execute_role(commands):
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "say", "type": "generic", "operator": "echo hi"},
    ]}, role="read")
    assert run.results["say"].status == "OPH_ODB_STATUS_ERROR"
    assert "PermissionError" in run.results["say"].error


def test_generic_task_plain_run_no_is_dry(commands, tmp_path):
    """run=no on a NON-massive generic task must validate the gate
    without executing (round-13 fix: only the massive-expansion path
    honored it before)."""
    marker = tmp_path / "ran"
    commands["touchit"] = ["sh", "-c", f'touch "{marker}"', "touchit"]
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "t", "type": "generic", "operator": "touchit",
         "arguments": {"run": "no"}},
    ]})
    res = run.results["t"]
    assert res.status == "OPH_ODB_STATUS_COMPLETED"
    assert res.value.get("dry_run") is True
    assert not marker.exists()
    # the dry run still exercises the allow-list gate
    run2 = eng.run({"name": "w2", "tasks": [
        {"name": "t", "type": "generic", "operator": "not_registered",
         "arguments": {"run": "no"}},
    ]})
    assert run2.results["t"].status == "OPH_ODB_STATUS_ERROR"
    assert "PermissionError" in run2.results["t"].error


def test_generic_task_pipe_src_path_rejected(commands):
    """A bare multivalue src_path ('a.nc|b.nc') bypasses massive []
    expansion; it must be rejected, not appended verbatim as one argv
    token (round-13 fix)."""
    eng = WorkflowEngine({})
    run = eng.run({"name": "w", "tasks": [
        {"name": "t", "type": "generic", "operator": "echo",
         "arguments": {"src_path": "a.nc|b.nc"}},
    ]})
    res = run.results["t"]
    assert res.status == "OPH_ODB_STATUS_ERROR"
    assert "massive" in res.error


def test_child_env_is_minimal(commands, tmp_path):
    """External commands must NOT inherit the server's full environment
    (round-13 fix per ADVICE r12): a sentinel secret in os.environ stays
    invisible; PATH and the OPH_* context survive."""
    os.environ["SPARK_GRAFT_TEST_SECRET"] = "hunter2"
    try:
        commands["env_probe"] = [
            "sh", "-c",
            'echo "sec=${SPARK_GRAFT_TEST_SECRET:-unset} path=${PATH:+set} '
            'sid=$OPH_SESSION_ID"',
            "env_probe",
        ]
        out = mgmt.run_command("env_probe", session_id="s1")
        assert out["stdout"].strip() == "sec=unset path=set sid=s1"
    finally:
        del os.environ["SPARK_GRAFT_TEST_SECRET"]
