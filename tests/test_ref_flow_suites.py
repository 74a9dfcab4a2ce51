"""Case-for-case port of the reference flow-control test suites
(/root/reference/test/oph_server_test.c main: test_num[] = {12, 2, 32, 6, ...}
for oph_if_impl, oph_else_impl, oph_for_impl, ...).

Every test carries a `ref option N` comment naming the reference case it
ports; inputs are the reference's case inputs, expectations are the
reference's asserted outcomes translated to this engine's observable
behavior (selected branch / expanded iterations / raised message).

The oph_check_for_massive_operation suite (57 cases) is ported in
tests/test_filters.py: the 23 filter->query cases (oph_server_test.c:
2412-2434) as the golden23_* tests, the 25 file-massive cases (2814-2839) as
the golden corpus tests, and the API-misuse cases (options 23-31) here where
a Python analogue exists (NULL-pointer cases have no analogue by design).

oph_set_impl (3), oph_input_impl (15) and oph_wait_impl (14) are ported
case-for-case below. oph_endfor_impl (6): its happy paths (options 0-2) are
asserted by the oph_for ports (unroll + endfor pairing); options 3-5 test
the reference server's internal hashtable environment cleanup ("No index
found in environment...", "Unable to remove variable...") — an unrolling
engine holds loop state per expansion, not in a mutable workflow
environment, so those states are unrepresentable by construction. The
oph_serve_flow_control_operator (13) and misc (13) suites are ported
case-for-case in tests/test_ref_serve_misc_suites.py, completing the
reference's 11-suite matrix.
"""

import pytest

from ophidia_server_spark.plans.workflow import (
    WorkflowEngine,
    WorkflowError,
    parse_for_arguments,
    resolve_for_values,
)

# ---------------------------------------------------------------------------
# oph_if_impl: 12 cases (oph_server_test.c:223-786). The reference builds
# IF / op-true / ELSE / op-false / ENDIF and asserts is_skipped flags or the
# error message; here the same block goes through _select_branches and we
# assert which branch's tasks survive (the engine drops unselected branches
# instead of flagging them — workflow.py _select_branches docstring).
# ---------------------------------------------------------------------------

_T = {"name": "T", "operator": "op", "arguments": {"tag": "true-side"}}
_F = {"name": "F", "operator": "op", "arguments": {"tag": "false-side"}}


def _if_block(condition=..., with_else=True):
    if_args = {} if condition is ... else {"condition": condition}
    tasks = [{"name": "IF", "operator": "oph_if", "arguments": if_args}, _T]
    if with_else:
        tasks += [{"name": "ELSE", "operator": "oph_else"}, _F]
    tasks.append({"name": "ENDIF", "operator": "oph_endif"})
    return tasks


def _selected(condition=..., variables=None, with_else=True):
    eng = WorkflowEngine({})
    out = eng._select_branches(_if_block(condition, with_else), variables or {})
    return [t["name"] for t in out]


def test_if_empty_condition_is_true():
    # ref option 0: *condition = 0 (empty string) -> ELSE branch skipped
    assert _selected("") == ["T"]


def test_if_true_constant():
    # ref option 1: condition "1" -> ELSE branch skipped
    assert _selected("1") == ["T"]


def test_if_false_constant():
    # ref option 2: condition "0" -> true branch unselected, ELSE taken
    assert _selected("0") == ["F"]


def test_if_skipped_marker_elseif_context():
    # ref option 3: is_skipped pre-set models an oph_elseif whose earlier
    # guard already matched; engine equivalent: first guard wins, the
    # elseif body is dropped even when its guard is true
    eng = WorkflowEngine({})
    tasks = [
        {"name": "IF", "operator": "oph_if", "arguments": {"condition": "1"}},
        _T,
        {"name": "EI", "operator": "oph_elseif", "arguments": {"condition": "1"}},
        _F,
        {"name": "ENDIF", "operator": "oph_endif"},
    ]
    assert [t["name"] for t in eng._select_branches(tasks, {})] == ["T"]


def test_if_no_condition_argument_is_true():
    # ref option 4: oph_if with no arguments at all -> true branch
    assert _selected(...) == ["T"]


def test_if_zero_div_zero_is_wrong_condition():
    # ref option 5: "0/0" -> OPH_SERVER_ERROR "Wrong condition '0/0'!"
    with pytest.raises(WorkflowError, match=r"Wrong condition '0/0'!"):
        _selected("0/0")


def test_if_one_div_zero_is_wrong_condition():
    # ref option 6: "1/0" -> "Wrong condition '1/0'!"
    with pytest.raises(WorkflowError, match=r"Wrong condition '1/0'!"):
        _selected("1/0")


def test_if_variable_condition_resolves_then_evaluates():
    # ref option 7: @condition bound to "234-234" -> evaluates 0 -> ELSE
    assert _selected("@condition", {"condition": "234-234"}) == ["F"]


def test_if_unbound_variable_is_too_variables():
    # ref option 8: @condition with no such variable ->
    # "Too variables in the expression '@condition'!"
    with pytest.raises(WorkflowError, match=r"Too variables in the expression '@condition'!"):
        _selected("@condition")


def test_if_free_symbol_is_too_variables():
    # ref option 9: condition "x" -> "Too variables in the expression 'x'!"
    with pytest.raises(WorkflowError, match=r"Too variables in the expression 'x'!"):
        _selected("x")


def test_if_unparseable_is_wrong_expression():
    # ref option 10: condition "---" -> "Wrong expression '---'!"
    with pytest.raises(WorkflowError, match=r"Wrong expression '---'!"):
        _selected("---")


def test_if_false_without_else_selects_nothing():
    # ref option 11: condition "0" and the ELSE branch restructured away ->
    # no task of the block survives
    assert _selected("0", with_else=False) == []


# ---------------------------------------------------------------------------
# oph_else_impl: 2 cases (covered in the reference by running oph_else with /
# without a pending selection). Engine equivalent: else takes when no guard
# matched, and is dropped when one did.
# ---------------------------------------------------------------------------

def test_else_taken_when_no_guard_matched():
    # ref oph_else_impl option 0
    assert _selected("0") == ["F"]


def test_else_dropped_when_guard_matched():
    # ref oph_else_impl option 1
    assert _selected("1") == ["T"]


# ---------------------------------------------------------------------------
# oph_for_impl: 32 cases (oph_server_test.c:789-1455). The reference asserts
# the stack push (svalues / ivalues / values_num) or the error message after
# oph_for_impl on FOR(key=index, values=first|second|third, counter=1:3,
# parallel=no) whose dependency Operator1 carries the grid/text response
# below; here the same arguments go through parse_for_arguments.
# ---------------------------------------------------------------------------

# Operator1's response (oph_server_test.c:815-950), verbatim structure
REF_RESPONSE = {
    "response": [
        {
            "objclass": "grid",
            "objkey": "data",
            "objcontent": [
                {
                    "rowvalues": [["1st", "2nd", "3rd"]],
                    "rowfieldtypes": ["string", "string", "string"],
                    "title": "table1",
                    "rowkeys": ["column1", "column2", "column3"],
                },
                {
                    "rowvalues": [["1st"], ["2nd"], ["3rd"]],
                    "rowfieldtypes": ["string"],
                    "title": "table2",
                    "rowkeys": ["column"],
                },
            ],
        },
        {
            "objclass": "grid",
            "objkey": "data2",
            "objcontent": [
                {
                    "rowvalues": [["1st", "2nd", "3rd"]],
                    "rowfieldtypes": ["string", "string", "string"],
                    "title": "table1",
                    "rowkeys": ["column1", "column2", "column3"],
                }
            ],
        },
        {
            "objclass": "text",
            "objkey": "summary",
            "objcontent": [{"title": "text", "message": "1st"}],
        },
        {
            "objclass": "text",
            "objkey": "summary2",
            "objcontent": [
                {"title": "text", "message": "2nd"},
                {"title": "text2", "message": "3rd"},
            ],
        },
        {
            "objclass": "text",
            "objkey": "status",
            "objcontent": [{"title": "SUCCESS"}],
        },
    ]
}

_BASE = {"key": "index", "values": "first|second|third", "counter": "1:3", "parallel": "no"}


def _for(over=None, drop=(), variables=None):
    args = {k: v for k, v in _BASE.items() if k not in drop}
    args.update(over or {})
    return parse_for_arguments("FOR", args, variables or {}, responses=REF_RESPONSE)


def test_for_default_arguments():
    # ref option 0: svalues first|second|third, ivalues 1|2|3, serial
    key, values, idxs, parallel = _for()
    assert (key, values, idxs, parallel) == (
        "index", ["first", "second", "third"], [1, 2, 3], False)


def test_for_values_from_variable():
    # ref option 1: values=@values with workflow var -> same expansion
    _, values, idxs, _ = _for({"values": "@values"},
                              variables={"values": "first|second|third"})
    assert values == ["first", "second", "third"] and idxs == [1, 2, 3]


def test_for_missing_key_is_bad_argument():
    # ref option 2: no 'key' argument -> "Bad argument 'key'."
    with pytest.raises(WorkflowError, match=r"Bad argument 'key'\."):
        _for(drop=("key",))


def test_for_missing_values_uses_counter():
    # ref option 3: no 'values' -> ivalues 1|2|3 drive the loop
    _, values, idxs, _ = _for(drop=("values",))
    assert values == ["1", "2", "3"] and idxs == [1, 2, 3]


def test_for_missing_counter_uses_values():
    # ref option 4: no 'counter' -> svalues first|second|third
    _, values, idxs, _ = _for(drop=("counter",))
    assert values == ["first", "second", "third"] and idxs == [1, 2, 3]


def test_for_missing_parallel_defaults_serial():
    # ref option 5: no 'parallel' -> serial
    assert _for(drop=("parallel",))[3] is False


def test_for_no_values_no_counter_single_iteration():
    # ref option 6: neither values nor counter -> values_num == 1
    _, values, idxs, _ = _for(drop=("values", "counter"))
    assert len(values) == 1 and idxs == [1]


def test_for_parallel_yes():
    # ref option 7: parallel=yes -> success and no serialization (the
    # reference pushes no stack entry; the engine expands without
    # inter-iteration dependencies)
    assert _for({"parallel": "yes"})[3] is True


def test_for_numeric_leading_key_accepted():
    # ref option 8: key '1ndex' -> res 0 with only the warning
    # "Change variable name '1ndex'." and the loop still runs
    key, values, _, _ = _for({"key": "1ndex"})
    assert key == "1ndex" and values == ["first", "second", "third"]


def test_for_values_from_grid_row():
    # ref option 9: data.table1(1,*) -> 1st|2nd|3rd
    assert _for({"values": "data.table1(1,*)"})[1] == ["1st", "2nd", "3rd"]


def test_for_values_from_grid_column():
    # ref option 10: data.table2(*,1) -> 1st|2nd|3rd
    assert _for({"values": "data.table2(*,1)"})[1] == ["1st", "2nd", "3rd"]


def test_for_values_from_named_column():
    # ref option 11: data.table2.column(*) -> 1st|2nd|3rd
    assert _for({"values": "data.table2.column(*)"})[1] == ["1st", "2nd", "3rd"]


def test_for_variable_key_is_bad_argument():
    # ref option 12: key=@badvariable -> "Bad argument 'key'."
    with pytest.raises(WorkflowError, match=r"Bad argument 'key'\."):
        _for({"key": "@badvariable"})


def test_for_variable_values_size_mismatch():
    # ref option 13: values=@badvariable stays literal (1 value) vs counter
    # 1:3 -> "Arguments 'values' and 'counter' have different sizes."
    with pytest.raises(WorkflowError, match=r"different sizes\."):
        _for({"values": "@badvariable"})


def test_for_variable_counter_size_mismatch():
    # ref option 14: counter=@badvariable unparseable -> same sizes error
    with pytest.raises(WorkflowError, match=r"different sizes\."):
        _for({"counter": "@badvariable"})


def test_for_variable_parallel_is_generic_error():
    # ref option 15: parallel=@badvariable ->
    # "Generic error in parsing arguments of task 'FOR'."
    with pytest.raises(WorkflowError, match=r"Generic error in parsing arguments of task 'FOR'\."):
        _for({"parallel": "@badvariable"})


def test_for_values_from_cell_addresses():
    # ref option 16: three column(i) cells -> 1st|2nd|3rd
    got = _for({"values": "data.table2.column(1)|data.table2.column(2)|data.table2.column(3)"})[1]
    assert got == ["1st", "2nd", "3rd"]


def test_for_unresolvable_cell_stays_literal():
    # ref option 17: column(4) is out of range -> the literal text iterates
    got = _for({"values": "data.table2.column(1)|data.table2.column(4)|data.table2.column(3)"})[1]
    assert got == ["1st", "data.table2.column(4)", "3rd"]


def test_for_text_message_and_mixed_values():
    # ref option 18: summary.text|2nd|data.table2.column(3) -> 1st|2nd|3rd
    got = _for({"values": "summary.text|2nd|data.table2.column(3)"})[1]
    assert got == ["1st", "2nd", "3rd"]


def test_for_wrong_addresses_stay_literal():
    # ref option 19: malformed addresses iterate as literals (success)
    got = _for({"values": "wrong(0.0)|wrong.wrong(0,0)|wrong.wrong.wrong(0)"})[1]
    assert got == ["wrong(0.0)", "wrong.wrong(0,0)", "wrong.wrong.wrong(0)"]


def test_for_wrong_text_addresses_stay_literal():
    # ref option 20: text(0)|text.text|text.text(0) -> literals (success)
    got = _for({"values": "text(0)|text.text|text.text(0)"})[1]
    assert len(got) == 3


def test_for_missing_objkey_prefix_stays_literal():
    # ref option 21: table2.column(1)|... without the objkey -> literals
    got = _for({"values": "table2.column(1)|table2.column(2)|table2.column(3)"})[1]
    assert len(got) == 3 and got[0] == "table2.column(1)"


def test_for_mixed_missing_prefix_stays_literal():
    # ref option 22: table1.column1|table2.column(2)|table2.column(3)
    assert len(_for({"values": "table1.column1|table2.column(2)|table2.column(3)"})[1]) == 3


def test_for_bare_text_objkey():
    # ref option 23: summary|summary|summary -> three iterations (content
    # beyond the count is unasserted in the reference)
    assert len(_for({"values": "summary|summary|summary"})[1]) == 3


def test_for_bare_text_objkey_multi_content():
    # ref option 24: summary2|summary2|summary2 -> three iterations
    assert len(_for({"values": "summary2|summary2|summary2"})[1]) == 3


def test_for_grid_cell_without_title():
    # ref option 25: data(1,1)|data(1,1)|data(1,1) -> three iterations
    assert len(_for({"values": "data(1,1)|data(1,1)|data(1,1)"})[1]) == 3


def test_for_bare_grid_objkey():
    # ref option 26: data2|data2|data2 -> three iterations
    assert len(_for({"values": "data2|data2|data2"})[1]) == 3


def test_for_unknown_named_column_stays_literal():
    # ref option 27: data.table2.column1(10)|... -> literals (success)
    got = _for({"values": "data.table2.column1(10)|data.table2.column2(20)|data.table2.column3(30)"})[1]
    assert got[0] == "data.table2.column1(10)" and len(got) == 3


def test_for_malformed_parens_stay_literal():
    # ref option 28: data.table2.(*,*)|data.table2(*.*)|data.table2.(*,*)
    assert len(_for({"values": "data.table2.(*,*)|data.table2(*.*)|data.table2.(*,*)"})[1]) == 3


def test_for_reversed_counter_is_generic_error():
    # ref option 29: counter 3:1 (empty range) ->
    # "Generic error in parsing arguments of task 'FOR'."
    with pytest.raises(WorkflowError, match=r"Generic error in parsing arguments of task 'FOR'\."):
        _for({"counter": "3:1"})


def test_for_short_counter_size_mismatch():
    # ref option 30: counter 1:2 vs three values -> sizes error
    with pytest.raises(WorkflowError, match=r"different sizes\."):
        _for({"counter": "1:2"})


def test_for_invalid_key_characters_are_bad_argument():
    # ref option 31: key 'special:' -> "Bad argument 'key'."
    with pytest.raises(WorkflowError, match=r"Bad argument 'key'\."):
        _for({"key": "special:"})


# ---------------------------------------------------------------------------
# oph_check_for_massive_operation API-misuse cases with a Python analogue
# (options 23-31 of the 57; the five NULL-pointer permutations have none)
# ---------------------------------------------------------------------------

def test_massive_expansion_without_catalog_is_error():
    # ref option 24-28 family (SYSTEM_ERROR when the machinery a massive
    # expansion needs is absent): a cube filter with no catalog is fatal,
    # not silently empty
    eng = WorkflowEngine({})
    with pytest.raises(WorkflowError, match="catalog"):
        eng._massive_expand({"cube": "[filter=@badvariable]"})


def test_massive_without_cube_argument_is_not_massive():
    # ref option 31 (argument renamed cube2 -> no 'cube'):
    # OPH_SERVER_NO_RESPONSE — the task is simply not a massive operation
    eng = WorkflowEngine({})
    assert eng._massive_expand({"cube2": "[level=2]"}) is None


def test_resolve_for_values_requires_responses():
    # no responses at hand (pre-run expansion): every address stays literal
    assert resolve_for_values("data.table1(1,*)", None) is None


# ---------------------------------------------------------------------------
# oph_set_impl: 3 cases (oph_server_test.c:3098-3178). One oph_set task with
# key='variable'; all three cases expect success (empty error message).
# ---------------------------------------------------------------------------

def _run_set(value, variables=None, operator="oph_set", extra=None):
    eng = WorkflowEngine({})
    args = {"key": "variable", "value": value}
    args.update(extra or {})
    wf = {"tasks": [{"name": "SET", "operator": operator, "arguments": args}]}
    if variables:
        wf["variables"] = variables
    return eng.run(wf)


def test_set_ref_case0_literal_value():
    # ref oph_set_impl option 0: value 'value'
    run = _run_set("value")
    assert run.results["SET"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.variables["variable"] == "value"


def test_set_ref_case1_good_variable_substitution():
    # ref option 1: workflow var goodvariable='value', value '@goodvariable'
    run = _run_set("@goodvariable", variables={"goodvariable": "value"})
    assert run.results["SET"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.variables["variable"] == "value"


def test_set_ref_case2_bad_variable_left_untouched():
    # ref option 2: '@badvariable' undefined -> still success (res 0, no
    # error); the unresolved token rides through verbatim
    run = _run_set("@badvariable")
    assert run.results["SET"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.variables["variable"] == "@badvariable"


# ---------------------------------------------------------------------------
# oph_input_impl: 15 cases (oph_server_test.c:3179-3448). INPUT + WAIT +
# WAIT2 workflow; expectations are the reference's exact error messages.
# ---------------------------------------------------------------------------

def _run_input(value="value", key="variable", extra=None):
    eng = WorkflowEngine({})
    args = {"key": key, "value": value, "taskname": "WAIT"}
    args.update(extra or {})
    wf = {
        "tasks": [
            {"name": "INPUT", "operator": "oph_input", "arguments": args},
            {"name": "WAIT", "operator": "oph_wait",
             "arguments": {"timeout": "0", "run": "no"}},
            {"name": "WAIT2", "operator": "oph_wait",
             "arguments": {"timeout": "0", "run": "no"}},
        ]
    }
    return eng.run(wf)


def test_input_ref_case0_literal():
    run = _run_input("value")
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.variables["variable"] == "value"


def test_input_ref_case1_good_variable():
    # ref option 1: goodvariable defined -> substituted
    eng = WorkflowEngine({})
    run = eng.run(
        {
            "variables": {"goodvariable": "value"},
            "tasks": [
                {"name": "INPUT", "operator": "oph_input",
                 "arguments": {"key": "variable", "value": "@goodvariable",
                               "taskname": "WAIT"}},
                {"name": "WAIT", "operator": "oph_wait",
                 "arguments": {"timeout": "0", "run": "no"}},
            ],
        }
    )
    assert run.variables["variable"] == "value"


def test_input_ref_case2_bad_variable():
    run = _run_input("@badvariable")
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_input_ref_case3_wrong_taskname():
    # ref option 3: taskname 'wrong' -> "Invalid task name, task not found
    # or ambiguous!"
    with pytest.raises(WorkflowError, match="Invalid task name"):
        _run_input("value", extra={"taskname": "wrong"})


def test_input_ref_case4_extra_values_discarded():
    # ref option 4: value 'value|discarded', one key -> success (the C test
    # observes only res==0; this engine stores the single key whole)
    run = _run_input("value|discarded")
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_input_ref_case5_fewer_values_than_keys():
    # ref option 5: keys 'variable|wrong', one value ->
    # "Bad number of keys in parameter 'value'."
    with pytest.raises(WorkflowError, match="Bad number of keys in parameter 'value'"):
        _run_input("value", key="variable|wrong")


def test_input_ref_case6_workflow_id_ok():
    # ref option 6: id=1 -> success
    run = _run_input("value", extra={"id": "1"})
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_input_ref_case7_negative_workflow_id():
    # ref option 7: id=-1 -> "Wrong workflow identifier '-1'!"
    with pytest.raises(WorkflowError, match=r"Wrong workflow identifier '-1'!"):
        _run_input("value", extra={"id": "-1"})


@pytest.mark.parametrize("action", ["continue", "wait", "abort"])
def test_input_ref_cases8_9_10_valid_actions(action):
    # ref options 8/9/10: action continue/wait/abort -> success
    run = _run_input("value", extra={"action": action})
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_input_ref_case11_wrong_action():
    # ref option 11: action 'wrong' -> "Wrong action 'wrong'!"
    with pytest.raises(WorkflowError, match="Wrong action 'wrong'!"):
        _run_input("value", extra={"action": "wrong"})


def test_input_ref_case12_variable_as_key_name():
    # ref option 12: key '@badvariable' -> "Bad argument 'key'." (the '@'
    # is a workflow separator, fatal)
    with pytest.raises(WorkflowError, match="Bad argument 'key'"):
        _run_input("value", key="@badvariable")


def test_input_ref_case13_separator_in_key():
    # ref option 13: key 'special:' -> "Bad argument 'key'."
    with pytest.raises(WorkflowError, match="Bad argument 'key'"):
        _run_input("value", key="special:")


def test_input_ref_case14_digit_leading_key_warns():
    # ref option 14: key '1ndex' -> res 0 with warning
    # "Change variable name '1ndex'."
    run = _run_input("value", key="1ndex")
    assert run.results["INPUT"].status == "OPH_ODB_STATUS_COMPLETED"
    assert run.results["INPUT"].error == "Change variable name '1ndex'."


# ---------------------------------------------------------------------------
# oph_wait_impl: 14 cases (oph_server_test.c:3449-3815). One oph_wait task,
# run='no' throughout (the reference passes data->run but asserts only the
# validation result); expectations are the exact error messages.
# ---------------------------------------------------------------------------

def _run_wait(args):
    eng = WorkflowEngine({})
    return eng.run(
        {"tasks": [{"name": "WAIT", "operator": "oph_wait", "arguments": args}]}
    )


def test_wait_ref_case0_future_deadline():
    # ref option 0: deadline 2030-01-01, run no, extra cube/cwd args ignored
    run = _run_wait({
        "timeout": "2030-01-01 00:00:00", "run": "no",
        "timeout_type": "deadline", "cube": "http://localhost/1", "cwd": "/",
    })
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case1_past_deadline():
    # ref option 1: deadline 2010-01-01 -> negative timeout ->
    # "Timeout can be infinity only for type 'input'. ..."
    with pytest.raises(WorkflowError, match="Timeout can be infinity only for type 'input'"):
        _run_wait({"timeout": "2010-01-01 00:00:00", "run": "no",
                   "timeout_type": "deadline"})


def test_wait_ref_case2_wrong_timeout_type():
    # ref option 2 -> "Wrong timeout type 'wrong'!"
    with pytest.raises(WorkflowError, match="Wrong timeout type 'wrong'!"):
        _run_wait({"timeout": "10", "run": "no", "timeout_type": "wrong"})


def test_wait_ref_case3_wrong_run_value():
    # ref option 3 -> "Wrong value 'wrong' for parameter 'run'!"
    with pytest.raises(WorkflowError, match="Wrong value 'wrong' for parameter 'run'!"):
        _run_wait({"timeout": "10", "run": "wrong"})


def test_wait_ref_case4_file_type(tmp_path):
    # ref option 4: type file + filename -> success (run no: validated only)
    run = _run_wait({"timeout": "10", "run": "no", "type": "file",
                     "filename": "filename"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case5_message_arg():
    # ref option 5: message arg rides along -> success
    run = _run_wait({"timeout": "10", "run": "no", "message": "message"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case6_input_key_value():
    # ref option 6: type input + key/value -> success
    run = _run_wait({"timeout": "10", "run": "no", "type": "input",
                     "key": "variable", "value": "value"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case7_wrong_type():
    # ref option 7 -> "Wrong type 'wrong'!"
    with pytest.raises(WorkflowError, match="Wrong type 'wrong'!"):
        _run_wait({"timeout": "10", "run": "no", "type": "wrong"})


def test_wait_ref_case8_good_variable_value():
    # ref option 8: value '@goodvariable' with the variable defined
    eng = WorkflowEngine({})
    run = eng.run({
        "variables": {"goodvariable": "value"},
        "tasks": [{"name": "WAIT", "operator": "oph_wait",
                   "arguments": {"timeout": "10", "run": "no", "type": "input",
                                 "key": "variable", "value": "@goodvariable"}}],
    })
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case9_bad_variable_value():
    # ref option 9: '@badvariable' undefined -> still success
    run = _run_wait({"timeout": "10", "run": "no", "type": "input",
                     "key": "variable", "value": "@badvariable"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case10_digit_leading_key():
    # ref option 10: key '1ndex' -> res 0 + "Change variable name '1ndex'."
    # (the warning is non-fatal: validated here via the shared validator)
    eng = WorkflowEngine({})
    assert eng._validate_var_keys(["1ndex"]) == "Change variable name '1ndex'."
    run = _run_wait({"timeout": "10", "run": "no", "type": "input",
                     "key": "1ndex", "value": "value"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case11_separator_in_key():
    # ref option 11: key 'special:' -> "Bad argument 'key'."
    with pytest.raises(WorkflowError, match="Bad argument 'key'"):
        _run_wait({"timeout": "10", "run": "no", "type": "input",
                   "key": "special:", "value": "value"})


def test_wait_ref_case12_extra_values_ok():
    # ref option 12: one key, value 'value|value2' -> success
    run = _run_wait({"timeout": "10", "run": "no", "type": "input",
                     "key": "variable", "value": "value|value2"})
    assert run.results["WAIT"].status == "OPH_ODB_STATUS_COMPLETED"


def test_wait_ref_case13_fewer_values_than_keys():
    # ref option 13: keys 'variable|variable2', one value ->
    # "Bad number of keys in parameter 'value'."
    with pytest.raises(WorkflowError, match="Bad number of keys in parameter 'value'"):
        _run_wait({"timeout": "10", "run": "no", "type": "input",
                   "key": "variable|variable2", "value": "value"})
