"""Case-for-case port of the last two reference suites:
`oph_serve_flow_control_operator` (13 cases, oph_server_test.c:1805-2412) and
`misc` (13 cases, :4199-4421). Together with tests/test_ref_flow_suites.py and
tests/test_filters.py this completes the reference's 11-suite matrix
(test_num[] = {12, 2, 32, 6, 13, 57, 3, 15, 14, 46, 13}, :4504-4507).

Serve-suite mapping: the reference builds one 10-task workflow
(FOR -> IF -> op-true / ELSE -> op-false -> ENDIF -> ENDFOR, then WAIT/SET/
INPUT hanging off ENDFOR) and calls the serve entry positioned at one task per
case, asserting OPH_SERVER_NO_RESPONSE — i.e. flow-control operators are
handled in-process, never dispatched to the resource manager. The engine
analogue of NO_RESPONSE is observable directly: flow operators are
interpreted by WorkflowEngine itself and never consult the `operators`
dispatch map (a run whose map contains only `oph_operator` would raise
"unknown operator" otherwise), while each case's positional state maps to
the engine state the reference mutates by hand (statuses/branch selection).

misc-suite mapping: pure C-API misuse cases (NULL pointers, manual free)
port to the equivalent Python-surface misuse where one exists and are
documented as unrepresentable-by-construction where memory management is
the only thing under test.
"""

import os
import threading
import time

import pytest

from ophidia_server_spark.plans.response import extract_from_json
from ophidia_server_spark.plans.workflow import (
    WorkflowEngine,
    WorkflowError,
)

# ---------------------------------------------------------------------------
# the reference's 10-task topology (oph_server_test.c:1846-2086), as the JSON
# request a client would submit; `calls` records every *dispatched* operator,
# so flow ops appearing in it would fail the NO_RESPONSE contract
# ---------------------------------------------------------------------------


def _serve_workflow(condition="1", wait_args=None, set_args=None, input_args=None):
    # flow blocks are positional, exactly like the reference's
    # dependents_indexes topology (FOR..ENDFOR encloses the IF block); the
    # post-loop WAIT/SET/INPUT trio rides after the loop — their observable
    # behavior in this suite is order-independent, and the engine drops the
    # for/endfor markers during unrolling so they are left dependency-free
    wait_args = wait_args or {"timeout": "0"}
    set_args = set_args or {"key": "k", "value": "v"}
    input_args = input_args or {"key": "k2", "value": "v2"}
    return {
        "name": "serve_suite",
        "tasks": [
            {"name": "FOR", "operator": "oph_for",
             "arguments": {"key": "index", "values": "first|second|third",
                           "counter": "1:3", "parallel": "no"}},
            {"name": "IF", "operator": "oph_if",
             "arguments": {"condition": condition}},
            {"name": "Operator for true", "operator": "oph_operator",
             "arguments": {"side": "true"}},
            {"name": "ELSE", "operator": "oph_else"},
            {"name": "Operator for false", "operator": "oph_operator",
             "arguments": {"side": "false"}},
            {"name": "ENDIF", "operator": "oph_endif"},
            {"name": "ENDFOR", "operator": "oph_endfor"},
            {"name": "WAIT", "operator": "oph_wait", "arguments": wait_args,
             "on_error": "continue"},
            {"name": "SET", "operator": "oph_set", "arguments": set_args},
            {"name": "INPUT", "operator": "oph_input", "arguments": input_args},
        ],
    }


def _run(wf):
    calls = []
    eng = WorkflowEngine({
        "oph_operator": lambda e, a, i: calls.append(a.get("side")) or "ok"
    })
    return eng.run(wf), calls


def test_serve_case0_for_served_in_process():
    # ref option 0: serve oph_for at task 0 (PENDING) -> NO_RESPONSE; the
    # loop is handled by the server itself and the body replicates per value
    run, calls = _run(_serve_workflow())
    assert run.status == "OPH_ODB_STATUS_COMPLETED"
    assert calls.count("true") == 3      # first|second|third iterations
    assert "oph_for" not in [c for c in calls if c]  # never dispatched


def test_serve_case1_endfor_closes_completed_loop():
    # ref option 1: serve oph_endfor with the body COMPLETED (residual 4) ->
    # loop closes in-process; every unrolled iteration reports COMPLETED
    run, calls = _run(_serve_workflow())
    # the engine consumes the endfor marker during unrolling; loop closure is
    # observable as every iteration's body task reporting COMPLETED
    for it in range(3):
        assert (
            run.results[f"Operator for true_{it}"].status
            == "OPH_ODB_STATUS_COMPLETED"
        )
    assert run.status == "OPH_ODB_STATUS_COMPLETED"


def test_serve_case2_if_true_branch():
    # ref option 2: serve oph_if, condition "1" -> true side selected
    run, calls = _run(_serve_workflow(condition="1"))
    assert "true" in calls and "false" not in calls


def test_serve_case3_else_branch_on_false_condition():
    # ref option 3: condition flipped to "0" -> serve oph_else selects the
    # false side; the true-side operator is UNSELECTED (here: never present)
    run, calls = _run(_serve_workflow(condition="0"))
    assert "false" in calls and "true" not in calls


def test_serve_case4_wait_clock():
    # ref option 4: oph_wait type=clock timeout=2 (async thread + cancel);
    # engine analogue: the wait completes in-process after the duration
    t0 = time.time()
    run, _ = _run(_serve_workflow(wait_args={"timeout": "0.2"}))
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"
    assert time.time() - t0 >= 0.2


def test_serve_case5_wait_file_exists(tmp_path):
    # ref option 5: type=file filename=testdata/a_12.test (present) -> the
    # wait is satisfied immediately
    f = tmp_path / "a_12.test"
    f.write_text("x")
    run, _ = _run(_serve_workflow(
        wait_args={"timeout": "1", "type": "file", "filename": str(f)}))
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_serve_case6_wait_file_verbatim_path(tmp_path):
    # ref option 6: empty sessionid + no oph_base_src_path -> the filename is
    # used without base-path prefixing; the engine always resolves the
    # filename verbatim, so the fallback path IS the default behavior
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        open("rel_file.test", "w").close()
        run, _ = _run(_serve_workflow(
            wait_args={"timeout": "1", "type": "file",
                       "filename": "rel_file.test"}))
        assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"
    finally:
        os.chdir(cwd)


def test_serve_case7_wait_file_on_url_times_out():
    # ref option 7: filename=oph_web_server (an http URL) — the reference
    # polls it in the async thread then cancels; the engine's file wait is
    # local-path-only so a URL deterministically times out (status ERROR,
    # on_error=continue keeps the workflow going — the NO_RESPONSE analogue)
    run, _ = _run(_serve_workflow(
        wait_args={"timeout": "0.2", "type": "file",
                   "filename": "http://localhost/void"}))
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_ERROR"
    assert run.status == "OPH_ODB_STATUS_COMPLETED"  # wait failure contained


def test_serve_case8_wait_input_without_signal():
    # ref option 8: type=input timeout=2, no oph_input arrives -> the wait
    # expires (reference cancels the thread; engine reports the timeout)
    run, _ = _run(_serve_workflow(
        wait_args={"timeout": "0.2", "type": "input", "key": "never_set"}))
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_ERROR"


def test_serve_case9_wait_with_preseeded_statuses():
    # ref option 9: workflow status already COMPLETED ("wrong value") — serve
    # still handles the wait in-process; engine analogue: a resume seeded
    # with completed prior tasks still interprets the remaining flow ops
    from ophidia_server_spark.plans.workflow import TaskResult

    eng = WorkflowEngine({})
    wf = {"tasks": [
        {"name": "prior", "operator": "oph_set",
         "arguments": {"key": "a", "value": "1"}},
        {"name": "WAIT", "operator": "oph_wait",
         "arguments": {"timeout": "0"}, "dependencies": ["prior"]},
    ]}
    seeded = {"prior": TaskResult("prior", "OPH_ODB_STATUS_COMPLETED", "1")}
    run = eng.run(wf, resume_from=seeded)
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_serve_case10_wait_file_created_during_wait(tmp_path):
    # ref option 10: testdata/test.test is created 3 s into the wait and the
    # waiter wakes; here a thread creates the file mid-wait
    f = tmp_path / "test.test"

    def later():
        time.sleep(0.3)
        f.write_text("x")

    th = threading.Thread(target=later)
    th.start()
    run, _ = _run(_serve_workflow(
        wait_args={"timeout": "5", "type": "file", "filename": str(f)}))
    th.join()
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_serve_case11_set_served_in_process():
    # ref option 11: serve oph_set at task 8. With the reference's bare
    # arguments ({timeout: 2}) oph_set_impl itself rejects the missing key
    # ("Bad argument 'key'.") — same message here; with a key the variable
    # lands in the workflow environment without any external dispatch
    with pytest.raises(WorkflowError, match="Bad argument 'key'"):
        _run(_serve_workflow(set_args={"timeout": "2"}))
    run, calls = _run(_serve_workflow(set_args={"key": "k", "value": "7"}))
    assert run.variables["k"] == "7"
    assert set(calls) == {"true"}


def test_serve_case12_input_served_in_process():
    # ref option 12: serve oph_input at task 9 — same impl as oph_set plus
    # the wake path (covered by the oph_input_impl suite port); bare
    # arguments reject the missing key, keyed arguments set the variable
    with pytest.raises(WorkflowError, match="Bad argument 'key'"):
        _run(_serve_workflow(input_args={"timeout": "2"}))
    run, _ = _run(_serve_workflow(input_args={"key": "k2", "value": "9"}))
    assert run.variables["k2"] == "9"


# ---------------------------------------------------------------------------
# misc suite (13 cases, oph_server_test.c:4199-4421)
# ---------------------------------------------------------------------------


def test_misc_case0_free_block():
    # ref option 0: freeBlock() of a 2-string block — C memory management
    # only; unrepresentable by construction under garbage collection. The
    # closest observable contract: building and dropping a parsed filter
    # block leaks nothing and raises nothing.
    from ophidia_server_spark.filters import parse_massive

    groups, pids = parse_massive("[measure=a] [level=2]")
    del groups, pids


def test_misc_case1_parse_kv_null_args():
    # ref option 1: _oph_mf_parse_KV(NULL, ...) must fail, not crash
    from ophidia_server_spark.filters import parse_massive

    with pytest.raises((TypeError, AttributeError)):
        parse_massive(None)


def test_misc_case2_parse_query_null_args():
    # ref option 2: _oph_mf_parse_query(NULL, ...) must fail, not crash
    from ophidia_server_spark.filters import compile_massive

    with pytest.raises((TypeError, AttributeError, ValueError)):
        compile_massive(None, "[measure=a]")


def test_misc_case3_wait_null_data():
    # ref option 3: _oph_wait(NULL) returns without crashing; engine
    # analogue: a wait with no arguments (all defaults, timeout 0) completes
    from ophidia_server_spark.plans.workflow import WorkflowRun

    eng = WorkflowEngine({})
    assert eng._wait({}, WorkflowRun()) == "OPH_ODB_STATUS_COMPLETED"


def test_misc_case4_wait_wrong_type():
    # ref option 4: oph_wait_data with type 'w' (wrong) is handled gracefully;
    # the engine names the bad type (same contract as oph_wait_impl case 2)
    from ophidia_server_spark.plans.workflow import WorkflowRun

    eng = WorkflowEngine({})
    with pytest.raises(WorkflowError, match="Wrong type 'w'"):
        eng._wait({"type": "w"}, WorkflowRun())


def test_misc_case5_wait_file_negative_timeout(tmp_path):
    # ref option 5: file wait with timeout=-1 (infinite) then cancel. The
    # engine bounds waits instead of running unbounded threads (workflow.py
    # _wait caps at 30 s): a negative non-input timeout is the named error
    # the oph_wait_impl suite asserts — infinity is input-only.
    from ophidia_server_spark.plans.workflow import WorkflowRun

    eng = WorkflowEngine({})
    with pytest.raises(WorkflowError, match="infinity only for type 'input'"):
        eng._wait(
            {"type": "file", "timeout": "-1", "filename": str(tmp_path / "f")},
            WorkflowRun(),
        )


def test_misc_case6_selection_block_inconsistent_structure():
    # ref option 6: oph_set_status_of_selection_block over a task whose
    # dependents bookkeeping is inconsistent -> error; engine analogue: an
    # inconsistent selection structure (if with no matching endif) is
    # rejected with a named error before any status is assigned
    eng = WorkflowEngine({})
    with pytest.raises(WorkflowError, match="matching oph_endif"):
        eng._select_branches(
            [{"name": "I", "operator": "oph_if", "arguments": {"condition": "1"}}],
            {},
        )


def test_misc_case7_extract_null_key():
    # ref option 7: oph_extract_from_json(NULL, "") -> error on the missing key
    with pytest.raises((TypeError, AttributeError)):
        extract_from_json({}, None)


def test_misc_case8_extract_empty_key_empty_doc():
    # ref option 8: empty key over an empty document -> no value. The engine
    # defines the empty address as identity; on an empty response that is
    # None — the no-value outcome without a C error code.
    assert extract_from_json(None, "") is None


def test_misc_case9_extract_deep_path_missing():
    # ref option 9: key "a.b.c.d" over an empty document -> error
    with pytest.raises(KeyError):
        extract_from_json({}, "a.b.c.d")


def test_misc_case10_extract_malformed_open_paren():
    # ref option 10: key "a.b.c(d" -> error
    with pytest.raises(KeyError):
        extract_from_json({}, "a.b.c(d")


def test_misc_case11_extract_malformed_unclosed():
    # ref option 11: key "a(b,c" -> error
    with pytest.raises(KeyError):
        extract_from_json({}, "a(b,c")


def test_misc_case12_extract_function_style_key_missing():
    # ref option 12: key "a(b,c)" (objkey(row,col) addressing) over an empty
    # document -> error; the engine's grid addressing uses brackets, so the
    # paren form is an unknown key
    with pytest.raises(KeyError):
        extract_from_json({}, "a(b,c)")
