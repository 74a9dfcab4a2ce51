"""Datacube operator pack.

Each module re-implements one family of the reference's operator surface
(SURVEY.md §2.C inventory; objkeys at /root/reference/src/oph_json_objkeys.h)
as Catalyst-native DataFrame transformations over the Cube model.
"""

from ophidia_server_spark.operators.cube_ops import (  # noqa: F401
    oph_aggregate,
    oph_apply,
    oph_drilldown,
    oph_intercube,
    oph_mergecubes,
    oph_permute,
    oph_reduce,
    oph_reduce2,
    oph_rollup,
    oph_subset,
)
