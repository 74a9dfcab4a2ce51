"""The content-addressed md5 primitive every deterministic operator builds
on — ONE place for the Spark side of the cross-engine contract:

    md5(cast(key as string) || ':' || salt)

whose first 8 hex chars are 32 uniform bits, identical in Spark and DuckDB
(lowercase hex both sides; hex strings order like their numeric value).
Consumers: pipeline/sampling.py (coin-flip thresholds), pipeline/packing.py
(pack buckets / epoch shards), functions/sketches.py (HLL registers,
count-min rows). The DuckDB mirror of hex8_long is registry._HEX8
(list_reduce over hex chars — DuckDB has no conv()); change either side
only together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_of(key: Column, salt: str) -> Column:
    """Full 32-hex-char digest of key+':'+salt."""
    return F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))


def coin_hex8(key: Column, salt: str) -> Column:
    """First 8 hex chars — the uniform draw compared lexicographically
    against zero-padded hex thresholds (sampling's coin)."""
    return F.substring(md5_of(key, salt), 1, 8)


def hex8_long(key: Column, salt: str) -> Column:
    """The same 8 hex chars as a BIGINT in [0, 2^32)."""
    return F.conv(coin_hex8(key, salt), 16, 10).cast("long")


def md5_bucket(key: Column, n: int, salt: str) -> Column:
    """Uniform bucket in [0, n)."""
    return F.pmod(hex8_long(key, salt), F.lit(n))
