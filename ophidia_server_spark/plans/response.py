"""JSON response data model — the reference server's output objects re-built
over DataFrames.

Reference shapes studied (not copied) from /root/reference/src/:
  - grid:      title + rowkeys/rowfieldtypes + rowvalues   (oph_json_grid.h:38-48)
  - multigrid: row keys = explicit dims, col keys = implicit dim values,
               measurename/measuretype + matrix            (oph_json_multigrid.h:36-72)
  - tree / digraph: node list + edge list                  (oph_json_graph.h:38-60)
  - text:      title + message                             (oph_json_text.h)
  - workflow-level aggregation with output_format
    classic | compact | extended                           (oph_workflow_define.h:81-84,
                                                            oph_workflow_engine.c:454-507)

Everything renders from collected (small) results — responses are UI payloads,
never the data path; large outputs stay as cubes/tables and responses carry
their PIDs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def grid(df: DataFrame, title: str, limit: int = 1000) -> dict:
    """Render a DataFrame as the reference's grid objclass."""
    rows = df.limit(limit).collect()
    return {
        "objclass": "grid",
        "title": title,
        "rowkeys": list(df.columns),
        "rowfieldtypes": [f.dataType.simpleString() for f in df.schema.fields],
        "rowvalues": [[_cell(v) for v in r] for r in rows],
    }


def multigrid(
    df: DataFrame,
    explicit_dims: list[str],
    implicit_dim: str,
    measure_col: str,
    measure_name: str,
    title: str,
    limit: int = 1000,
) -> dict:
    """Cube view: one output row per explicit-dim combination, columns = the
    implicit dimension's values, cells = the measure array."""
    rows = df.limit(limit).collect()
    colkeys: list[Any] = []
    if rows and implicit_dim in df.columns:
        colkeys = [_cell(v) for v in rows[0][implicit_dim]]
    mtype = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields])).get(
        measure_col, "double"
    )
    return {
        "objclass": "multigrid",
        "title": title,
        "rowkeys": explicit_dims,
        "rowvalues": [[_cell(r[d]) for d in explicit_dims] for r in rows],
        "colkeys": [implicit_dim],
        "colvalues": colkeys,
        "measurename": measure_name,
        "measuretype": mtype,
        "measurevalues": [[_cell(v) for v in r[measure_col]] for r in rows],
    }


def tree(nodes: list[str], edges: list[tuple[str, str]], title: str) -> dict:
    return {
        "objclass": "tree",
        "title": title,
        "nodekeys": ["node"],
        "nodevalues": [[n] for n in nodes],
        "links": [{"source": a, "target": b} for a, b in edges],
    }


def digraph(nodes: list[dict], edges: list[tuple[str, str]], title: str) -> dict:
    """Provenance graph (oph_cubeio rendering)."""
    keys = sorted({k for n in nodes for k in n})
    return {
        "objclass": "digraph",
        "title": title,
        "nodekeys": keys,
        "nodevalues": [[_cell(n.get(k)) for k in keys] for n in nodes],
        "links": [{"source": a, "target": b} for a, b in edges],
    }


def text(title: str, message: str) -> dict:
    return {"objclass": "text", "title": title, "message": str(message)}


def _cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return [_cell(x) for x in v]
    return str(v)


# ---------------------------------------------------------------------------
# workflow-level response assembly (output_format classic|compact|extended)
# ---------------------------------------------------------------------------

def workflow_response(run, name: str, output_format: str = "classic") -> dict:
    """Aggregate per-task results like the reference's response loader.

    classic:  one response section per task (status + value summary)
    compact:  a single grid of (task, status) rows
    extended: classic plus variables and attempt counts
    """
    tasks = []
    for tname, res in run.results.items():
        entry: dict[str, Any] = {"task": tname, "status": res.status}
        if output_format == "extended":
            entry["attempts"] = res.attempts
            if res.error:
                entry["error"] = res.error
        if res.value is not None and output_format != "compact":
            entry["response"] = (
                res.value if isinstance(res.value, (dict, list, str, int, float)) else str(res.value)
            )
        tasks.append(entry)
    out: dict[str, Any] = {
        "workflow": name,
        "status": run.status,
        "output_format": output_format,
    }
    if output_format == "compact":
        out["summary"] = {
            "objclass": "grid",
            "title": "Workflow Task List",
            "rowkeys": ["task", "status"],
            "rowfieldtypes": ["string", "string"],
            "rowvalues": [[t["task"], t["status"]] for t in tasks],
        }
    else:
        out["tasks"] = tasks
    if output_format == "extended":
        out["variables"] = dict(run.variables)
    return out


# ---------------------------------------------------------------------------
# response-cell addressing (oph_set value extraction,
# oph_flow_control_operators.c:674-988 oph_extract_from_json)
# ---------------------------------------------------------------------------

def extract_from_json(response: Any, address: str) -> Any:
    """Pull a value out of a task response via the reference's addressing
    grammar `colkey` / `colkey[row]` / `colkey[row,col]` over a grid object,
    or a plain dict key path `a.b.c`.

    On a grid: no index -> whole column (joined with '|' like the reference's
    multivalue convention when >1), [r] -> row r of that column, [r,c]
    ignores colkey and indexes rowvalues directly.
    """
    addr = address.strip()
    idx: list[int] | None = None
    if "[" in addr and addr.endswith("]"):
        addr, _, rest = addr.partition("[")
        idx = [int(x) for x in rest[:-1].split(",") if x.strip() != ""]
    node = response
    for part in [p for p in addr.split(".") if p]:
        if isinstance(node, dict) and part in node:
            node = node[part]
            continue
        # grid column reference
        if isinstance(node, dict) and "rowkeys" in node and part in node["rowkeys"]:
            c = node["rowkeys"].index(part)
            col = [r[c] for r in node["rowvalues"]]
            node = col
            continue
        raise KeyError(f"address part {part!r} not found in response")
    if idx is None:
        if isinstance(node, list):
            return "|".join(str(v) for v in node) if len(node) > 1 else (node[0] if node else None)
        return node
    if len(idx) == 1:
        return node[idx[0]] if isinstance(node, list) else node
    if len(idx) == 2 and isinstance(node, dict) and "rowvalues" in node:
        return node["rowvalues"][idx[0]][idx[1]]
    if len(idx) == 2 and isinstance(node, list):
        return node[idx[0]][idx[1]]
    raise KeyError(f"bad address index in {address!r}")


def workflow_progress(run) -> dict:
    """Progress report (the reference's workflow_progress/exec_time objkeys:
    progress ratio over tasks, oph_workflow_engine.c:7399-7500)."""
    total = len(run.results)
    done = sum(
        1 for r in run.results.values()
        if r.status in ("OPH_ODB_STATUS_COMPLETED", "OPH_ODB_STATUS_SKIPPED")
    )
    return {
        "objclass": "grid",
        "title": "Workflow Progress",
        "rowkeys": ["task", "status", "exec_time"],
        "rowfieldtypes": ["string", "string", "double"],
        "rowvalues": [
            [r.name, r.status, r.elapsed] for r in run.results.values()
        ],
        "progress": round(done / total, 4) if total else 1.0,
    }
