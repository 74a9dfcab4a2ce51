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
