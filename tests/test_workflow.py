"""Workflow engine golden tests, modeled on the reference suite structure
(/root/reference/test/oph_server_test.c: oph_if/else/for/endfor/set suites)
but asserting our engine's observable behavior.
"""

import pytest

from ophidia_server_spark.plans.workflow import (
    WorkflowEngine,
    WorkflowError,
    eval_condition,
    substitute,
    validate_dag,
)


def _collect_op(log):
    def fn(engine, args, inputs):
        log.append(args.get("tag"))
        return args.get("tag")

    return fn


def run_wf(tasks, variables=None, log=None):
    log = log if log is not None else []
    eng = WorkflowEngine({"op": _collect_op(log)})
    run = eng.run({"name": "t", "variables": variables or {}, "tasks": tasks})
    return run, log


# -- condition evaluator (oph_if suite) -------------------------------------

def test_eval_arithmetic():
    assert eval_condition("1 + 2 * 3") == 7


def test_eval_comparison():
    assert eval_condition("3 > 2") is True
    assert eval_condition("1 >= 2") is False


def test_eval_boolean():
    assert eval_condition("1 and 0") == 0
    assert bool(eval_condition("0 or 5")) is True


def test_eval_rejects_code():
    with pytest.raises(WorkflowError):
        eval_condition("__import__('os').system('true')")


# -- variable substitution ---------------------------------------------------

def test_substitute_forms():
    v = {"x": "10", "name": "cube"}
    assert substitute("a=@x", v) == "a=10"
    assert substitute("a=@{name}_z", v) == "a=cube_z"
    assert substitute("a=@missing", v) == "a=@missing"  # unknown left as-is


# -- DAG validation (Kahn) ---------------------------------------------------

def test_dag_cycle_detected():
    with pytest.raises(WorkflowError, match="cycle"):
        validate_dag(
            [
                {"name": "a", "dependencies": ["b"]},
                {"name": "b", "dependencies": ["a"]},
            ]
        )


def test_dag_unknown_dep():
    with pytest.raises(WorkflowError, match="unknown dependency"):
        validate_dag([{"name": "a", "dependencies": ["zz"]}])


def test_dag_duplicate_names():
    with pytest.raises(WorkflowError, match="duplicate"):
        validate_dag([{"name": "a"}, {"name": "a"}])


def test_dag_order_respects_deps():
    order = validate_dag(
        [
            {"name": "c", "dependencies": ["b"]},
            {"name": "a"},
            {"name": "b", "dependencies": ["a"]},
        ]
    )
    assert order.index("a") < order.index("b") < order.index("c")


# -- execution / flow control ------------------------------------------------

def test_linear_execution_and_inputs():
    seen = {}

    def op_a(engine, args, inputs):
        return 41

    def op_b(engine, args, inputs):
        seen.update(inputs)
        return inputs["a"] + 1

    eng = WorkflowEngine({"a_op": op_a, "b_op": op_b})
    run = eng.run(
        {
            "tasks": [
                {"name": "a", "operator": "a_op", "arguments": {}},
                {"name": "b", "operator": "b_op", "arguments": {}, "dependencies": ["a"]},
            ]
        }
    )
    assert run.results["b"].value == 42
    assert seen == {"a": 41}


def test_oph_set_binds_variable():
    run, log = run_wf(
        [
            {"name": "s", "operator": "oph_set", "arguments": {"key": "v", "value": "99"}},
            {"name": "t", "operator": "op", "arguments": {"tag": "@v"}, "dependencies": ["s"]},
        ]
    )
    assert log == ["99"]


def test_if_true_branch():
    run, log = run_wf(
        [
            {"name": "i", "operator": "oph_if", "arguments": {"condition": "2 > 1"}},
            {"name": "a", "operator": "op", "arguments": {"tag": "then"}},
            {"name": "e", "operator": "oph_else", "arguments": {}},
            {"name": "b", "operator": "op", "arguments": {"tag": "else"}},
            {"name": "f", "operator": "oph_endif", "arguments": {}},
        ]
    )
    assert log == ["then"]


def test_if_else_branch():
    run, log = run_wf(
        [
            {"name": "i", "operator": "oph_if", "arguments": {"condition": "0"}},
            {"name": "a", "operator": "op", "arguments": {"tag": "then"}},
            {"name": "e", "operator": "oph_else", "arguments": {}},
            {"name": "b", "operator": "op", "arguments": {"tag": "else"}},
            {"name": "f", "operator": "oph_endif", "arguments": {}},
        ]
    )
    assert log == ["else"]


def test_elseif_chain():
    run, log = run_wf(
        [
            {"name": "i", "operator": "oph_if", "arguments": {"condition": "0"}},
            {"name": "a", "operator": "op", "arguments": {"tag": "A"}},
            {"name": "ei", "operator": "oph_elseif", "arguments": {"condition": "1"}},
            {"name": "b", "operator": "op", "arguments": {"tag": "B"}},
            {"name": "e", "operator": "oph_else", "arguments": {}},
            {"name": "c", "operator": "op", "arguments": {"tag": "C"}},
            {"name": "f", "operator": "oph_endif", "arguments": {}},
        ]
    )
    assert log == ["B"]


def test_if_with_variable_condition():
    run, log = run_wf(
        [
            {"name": "i", "operator": "oph_if", "arguments": {"condition": "@n > 2"}},
            {"name": "a", "operator": "op", "arguments": {"tag": "big"}},
            {"name": "f", "operator": "oph_endif", "arguments": {}},
        ],
        variables={"n": "5"},
    )
    assert log == ["big"]


def test_for_unroll_serial():
    run, log = run_wf(
        [
            {"name": "loop", "operator": "oph_for", "arguments": {"key": "i", "values": "x|y|z"}},
            {"name": "body", "operator": "op", "arguments": {"tag": "@i"}},
            {"name": "end", "operator": "oph_endfor", "arguments": {}},
        ]
    )
    assert log == ["x", "y", "z"]
    assert {r for r in run.results} == {"body_0", "body_1", "body_2"}


def test_for_missing_endfor():
    with pytest.raises(WorkflowError, match="endfor"):
        run_wf(
            [
                {"name": "loop", "operator": "oph_for", "arguments": {"key": "i", "values": "1"}},
                {"name": "body", "operator": "op", "arguments": {"tag": "@i"}},
            ]
        )


def test_on_error_abort_skips_dependents():
    def boom(engine, args, inputs):
        raise RuntimeError("boom")

    eng = WorkflowEngine({"boom": boom, "op": _collect_op([])})
    run = eng.run(
        {
            "tasks": [
                {"name": "a", "operator": "boom", "arguments": {}, "on_error": "abort"},
                {"name": "b", "operator": "op", "arguments": {}, "dependencies": ["a"]},
            ]
        }
    )
    assert run.status == "OPH_ODB_STATUS_ERROR"
    assert run.results["a"].status == "OPH_ODB_STATUS_ERROR"
    assert "b" not in run.results  # aborted before b


def test_on_error_skip_marks_dependents_skipped():
    def boom(engine, args, inputs):
        raise RuntimeError("boom")

    log = []
    eng = WorkflowEngine({"boom": boom, "op": _collect_op(log)})
    run = eng.run(
        {
            "tasks": [
                {"name": "a", "operator": "boom", "arguments": {}, "on_error": "skip"},
                {"name": "b", "operator": "op", "arguments": {"tag": "b"}, "dependencies": ["a"]},
                {"name": "c", "operator": "op", "arguments": {"tag": "c"}},
            ]
        }
    )
    assert run.results["b"].status == "OPH_ODB_STATUS_SKIPPED"
    assert run.results["c"].status == "OPH_ODB_STATUS_COMPLETED"
    assert log == ["c"]


def test_retry_attempts():
    calls = {"n": 0}

    def flaky(engine, args, inputs):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("flaky")
        return "ok"

    eng = WorkflowEngine({"flaky": flaky})
    run = eng.run({"tasks": [{"name": "a", "operator": "flaky", "arguments": {}, "retry": 3}]})
    assert run.results["a"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.results["a"].attempts == 3


# -- round-1 engine completion: backoff, on_error set, checkpoint/resume,
#    concurrent waves, set-from-response addressing ---------------------------


def test_on_error_continue_runs_dependents():
    def boom(engine, args, inputs):
        raise RuntimeError("x")

    log = []
    eng = WorkflowEngine({"op": _collect_op(log), "boom": boom})
    run = eng.run(
        {
            "tasks": [
                {"name": "a", "operator": "boom", "arguments": {}, "on_error": "continue"},
                {"name": "b", "operator": "op", "arguments": {"tag": "b"}, "dependencies": ["a"]},
            ]
        }
    )
    assert run.results["a"].status == "OPH_ODB_STATUS_ERROR"
    assert run.results["b"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.status == "OPH_ODB_STATUS_COMPLETED"


def test_on_error_break_stops_scheduling():
    def boom(engine, args, inputs):
        raise RuntimeError("x")

    log = []
    eng = WorkflowEngine({"op": _collect_op(log), "boom": boom})
    run = eng.run(
        {
            "tasks": [
                {"name": "a", "operator": "boom", "arguments": {}, "on_error": "break"},
                {"name": "b", "operator": "op", "arguments": {"tag": "b"}, "dependencies": ["a"]},
            ]
        }
    )
    assert run.status == "OPH_ODB_STATUS_COMPLETED"  # break != abort
    assert run.results["b"].status == "OPH_ODB_STATUS_SKIPPED"


def test_retry_backoff_and_repeat():
    calls = {"n": 0}

    def flaky(engine, args, inputs):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("flaky")
        return "ok"

    eng = WorkflowEngine({"flaky": flaky})
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "a", "operator": "flaky", "arguments": {},
                    "retry": 3, "backoff_time": 0.01, "backoff_type": "exponential",
                }
            ]
        }
    )
    assert run.results["a"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.results["a"].attempts == 3


def test_checkpoint_resume_skips_done():
    calls = []

    def op(engine, args, inputs):
        calls.append(args["tag"])
        return args["tag"]

    wf = {
        "tasks": [
            {"name": "a", "operator": "op", "arguments": {"tag": "a"}},
            {"name": "b", "operator": "op", "arguments": {"tag": "b"}, "dependencies": ["a"]},
        ]
    }
    eng = WorkflowEngine({"op": op})
    store = {}
    eng.run(wf, checkpoint_store=store)
    assert set(store) == {"a", "b"}
    calls.clear()
    run2 = eng.run(wf, resume_from=store)
    assert calls == []  # nothing re-ran
    assert run2.results["b"].value == "b"


def test_concurrent_wave_execution():
    import threading

    seen = []

    def op(engine, args, inputs):
        seen.append(threading.get_ident())
        import time as _t

        _t.sleep(0.05)
        return args["tag"]

    wf = {
        "tasks": [
            {"name": f"t{i}", "operator": "op", "arguments": {"tag": f"t{i}"}} for i in range(4)
        ]
    }
    run = WorkflowEngine({"op": op}).run(wf, max_workers=4)
    assert all(r.status == "OPH_ODB_STATUS_COMPLETED" for r in run.results.values())
    assert len(set(seen)) > 1  # really ran on multiple threads


def test_set_from_response_address():
    def grid_op(engine, args, inputs):
        return {
            "objclass": "grid",
            "rowkeys": ["cube", "rows"],
            "rowvalues": [["pid1", 10], ["pid2", 20]],
        }

    def sink(engine, args, inputs):
        return args["cube"]

    eng = WorkflowEngine({"grid_op": grid_op, "sink": sink})
    run = eng.run(
        {
            "tasks": [
                {"name": "src", "operator": "grid_op", "arguments": {}},
                {
                    "name": "pick", "operator": "oph_set", "dependencies": ["src"],
                    "arguments": {"key": "picked", "value": "cube[1]", "taskname": "src"},
                },
                {
                    "name": "use", "operator": "sink", "dependencies": ["pick"],
                    "arguments": {"cube": "@picked"},
                },
            ]
        }
    )
    assert run.variables["picked"] == "pid2"
    assert run.results["use"].value == "pid2"


def test_set_subset_filter_compression():
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "s", "operator": "oph_set",
                    "arguments": {"key": "idx", "value": "a|b|c", "subset_filter": "yes"},
                }
            ]
        }
    )
    assert run.variables["idx"] == "1|2|3"
    run2 = eng.run(
        {
            "tasks": [
                {
                    "name": "s", "operator": "oph_set",
                    "arguments": {
                        "key": "idx", "value": "a|b", "subset_filter": "yes", "offset": 1,
                    },
                }
            ]
        }
    )
    assert run2.variables["idx"] == "1:2|1:3"


def test_set_multi_key():
    # reference semantics (oph_flow_control_operators.c:1325-1336): multi-key
    # zips with '|'-separated values; fewer values than keys is an error
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "tasks": [
                {"name": "s", "operator": "oph_set", "arguments": {"key": "x|y", "value": "7|8"}}
            ]
        }
    )
    assert run.variables["x"] == "7" and run.variables["y"] == "8"

    import pytest as _pytest

    from ophidia_server_spark.plans.workflow import WorkflowError

    with _pytest.raises(WorkflowError, match="Bad number of keys"):
        WorkflowEngine({}).run(
            {
                "tasks": [
                    {"name": "s", "operator": "oph_set", "arguments": {"key": "x|y", "value": "7"}}
                ]
            }
        )


def test_workflow_response_formats():
    from ophidia_server_spark.plans.response import workflow_response

    log = []
    run, _ = run_wf(
        [{"name": "a", "operator": "op", "arguments": {"tag": "a"}}], log=log
    )
    classic = workflow_response(run, "wf", "classic")
    assert classic["tasks"][0]["task"] == "a"
    compact = workflow_response(run, "wf", "compact")
    assert compact["summary"]["rowvalues"] == [["a", "OPH_ODB_STATUS_COMPLETED"]]
    extended = workflow_response(run, "wf", "extended")
    assert extended["tasks"][0]["attempts"] == 1 and "variables" in extended


def test_extract_from_json_forms():
    from ophidia_server_spark.plans.response import extract_from_json

    grid = {
        "objclass": "grid",
        "rowkeys": ["pid", "n"],
        "rowvalues": [["p1", 1], ["p2", 2], ["p3", 3]],
    }
    assert extract_from_json(grid, "pid[0]") == "p1"
    assert extract_from_json(grid, "pid") == "p1|p2|p3"
    assert extract_from_json(grid, "[1,1]") == 2
    assert extract_from_json({"a": {"b": 5}}, "a.b") == 5
    with pytest.raises(KeyError):
        extract_from_json(grid, "nope[0]")


def test_on_exit_delete_gc():
    deleted = []

    def maker(engine, args, inputs):
        return "pid-temp"

    def deleter(engine, args, inputs):
        deleted.append(args["cube"])

    eng = WorkflowEngine({"maker": maker, "oph_delete": deleter})
    run = eng.run(
        {
            "tasks": [
                {"name": "tmp", "operator": "maker", "arguments": {}, "on_exit": "oph_delete"},
                {"name": "keep", "operator": "maker", "arguments": {}},
            ]
        }
    )
    assert deleted == ["pid-temp"]
    assert run.results["keep"].status == "OPH_ODB_STATUS_COMPLETED"


def test_task_variables_shadow_workflow():
    log = []
    eng = WorkflowEngine({"op": _collect_op(log)})
    eng.run(
        {
            "variables": {"v": "global"},
            "tasks": [
                {"name": "a", "operator": "op", "arguments": {"tag": "@v"}},
                {
                    "name": "b", "operator": "op", "arguments": {"tag": "@v"},
                    "variables": {"v": "local"},
                },
                {"name": "c", "operator": "op", "arguments": {"tag": "@v"},
                 "dependencies": ["b"]},
            ]
        }
    )
    assert log == ["global", "local", "global"]  # shadowing does not leak


def test_file_massive_expansion(tmp_path):
    d = tmp_path / "nc"
    d.mkdir()
    for f in ("x_1.nc", "x_2.nc", "y_1.txt"):
        (d / f).touch()
    seen = []

    def importer(engine, args, inputs):
        seen.append(args["src_path"])
        return args["src_path"]

    eng = WorkflowEngine({"oph_import": importer})
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "imp", "operator": "oph_import",
                    "arguments": {"src_path": f"[path={d};file=\\.nc$]"},
                }
            ]
        }
    )
    assert run.results["imp"].status == "OPH_ODB_STATUS_COMPLETED"
    assert sorted(seen) == [str(d / "x_1.nc"), str(d / "x_2.nc")]
    # dry-run returns the expansion without executing
    seen.clear()
    run2 = eng.run(
        {
            "tasks": [
                {
                    "name": "imp", "operator": "oph_import",
                    "arguments": {"src_path": f"[path={d};file=\\.nc$]", "run": "no"},
                }
            ]
        }
    )
    assert seen == []
    assert run2.results["imp"].value == {
        "expansion": [str(d / "x_1.nc"), str(d / "x_2.nc")]
    }


def test_exec_time_and_progress():
    from ophidia_server_spark.plans.response import workflow_progress

    def slow(engine, args, inputs):
        import time as _t

        _t.sleep(0.05)
        return "ok"

    run = WorkflowEngine({"slow": slow}).run(
        {"tasks": [{"name": "a", "operator": "slow", "arguments": {}}]}
    )
    assert run.results["a"].elapsed >= 0.05
    prog = workflow_progress(run)
    assert prog["progress"] == 1.0
    assert prog["rowvalues"][0][0] == "a" and prog["rowvalues"][0][2] >= 0.05


def test_cmip5_convention_infers_measure(tmp_path):
    # convention=cmip5: each expanded file carries measure = basename up to
    # the first '_' (oph_massive_operations.c:350-363)
    d = tmp_path / "cmip"
    d.mkdir()
    for fn in ("tas_Amon_MPI_historical.nc", "pr_day_IPSL.nc"):
        (d / fn).write_text("x")
    seen = []

    def imp(engine, args, inputs):
        seen.append((args["src_path"], args.get("measure")))
        return "ok"

    WorkflowEngine({"oph_import": imp}).run(
        {
            "tasks": [
                {
                    "name": "imp", "operator": "oph_import",
                    "arguments": {
                        "src_path": f"[path={d};file=\\.nc$]",
                        "convention": "cmip5",
                    },
                }
            ]
        }
    )
    assert sorted(seen) == [
        (str(d / "pr_day_IPSL.nc"), "pr"),
        (str(d / "tas_Amon_MPI_historical.nc"), "tas"),
    ]


def test_loop_index_substitution_and_counter():
    # &key is the 1-based iteration index; counter= overrides the index list
    seen = []

    def op(engine, args, inputs):
        seen.append(args["tag"])
        return args["tag"]

    WorkflowEngine({"op": op}).run(
        {
            "tasks": [
                {
                    "name": "for", "operator": "oph_for",
                    "arguments": {"key": "m", "values": "jan|feb|mar"},
                },
                {"name": "t", "operator": "op", "arguments": {"tag": "@m:&m"}},
                {"name": "endfor", "operator": "oph_endfor", "arguments": {}},
            ]
        }
    )
    assert seen == ["jan:1", "feb:2", "mar:3"]

    seen.clear()
    WorkflowEngine({"op": op}).run(
        {
            "tasks": [
                {
                    "name": "for", "operator": "oph_for",
                    "arguments": {"key": "i", "counter": "2:2:6"},
                },
                {"name": "t", "operator": "op", "arguments": {"tag": "&i"}},
                {"name": "endfor", "operator": "oph_endfor", "arguments": {}},
            ]
        }
    )
    assert seen == ["2", "4", "6"]


def test_request_comment_stripping_roundtrip():
    from ophidia_server_spark.plans.workflow import parse_request, strip_json_comments

    text = """{
  // workflow metadata
  "name": "demo", /* inline
  block comment */ "variables": {"v": "a//b /*not a comment*/"},
  "tasks": [
    {"name": "t", "operator": "op", "arguments": {"x": "@v"}} // trailing
  ]
}"""
    wf = parse_request(text)
    assert wf["name"] == "demo"
    # comment-like text INSIDE strings must survive
    assert wf["variables"]["v"] == "a//b /*not a comment*/"
    # newlines in block comments preserved (error line numbers survive)
    assert strip_json_comments("1/*\n\n*/2").count("\n") == 2

    seen = []

    def op(engine, args, inputs):
        seen.append(args["x"])
        return "ok"

    run = WorkflowEngine({"op": op}).run(text)  # str accepted directly
    assert run.status == "OPH_ODB_STATUS_COMPLETED"
    assert seen == ["a//b /*not a comment*/"]
