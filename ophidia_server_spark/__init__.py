"""ophidia_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Ophidia server (reference: OphidiaBigData/
ophidia-server, studied read-only at /root/reference).

This is NOT a port: the reference is a gSOAP workflow front-end dispatching array
OLAP operators to an external MPI framework; here every operator is re-expressed
Spark-first (DataFrame/SQL + Catalyst), with the datacube modeled as a DataFrame of
explicit-dimension columns plus a packed implicit-dimension array column
(see SURVEY.md §1.4).

Layout:
  session        SparkSession factory tuned for local[32] and cluster parity
  cube           the Cube data model + constructors (import/export/randcube)
  subset         index/coordinate subset-string algebra (start:stride:end)
  catalog        cube catalog, metadata, lineage tables
  filters        massive-operation selection grammar -> catalog predicates
  operators/     datacube operator pack (reduce/aggregate/rollup/...)
  functions/     array primitive library (the oph_apply surface)
  plans/         workflow DAG engine (for/if/set/wait flow control)
  streaming/     Structured Streaming window extensions over events
  pipeline/      LLM-data-pipeline ops: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"

# Public API: the pieces a reference user needs to run their workloads.
from ophidia_server_spark.cube import Cube, build_cube, randcube  # noqa: E402,F401
from ophidia_server_spark.plans.httpd import EngineHttpServer  # noqa: E402,F401
from ophidia_server_spark.plans.server import build_default_engine  # noqa: E402,F401
from ophidia_server_spark.plans.workflow import WorkflowEngine  # noqa: E402,F401
from ophidia_server_spark.session import get_spark, load_tables  # noqa: E402,F401
from ophidia_server_spark.store import CubeStore  # noqa: E402,F401

__all__ = [
    "Cube", "CubeStore", "EngineHttpServer", "WorkflowEngine", "build_cube",
    "build_default_engine", "get_spark", "load_tables", "randcube",
]
