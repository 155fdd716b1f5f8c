"""Cross-engine deterministic hashing.

The dedup/fingerprint operators need a hash function that produces *bit-
identical* values in Spark and in the DuckDB oracle. Neither engine's native
hash (xxhash64 vs duckdb ``hash``) matches the other, so we derive a 60-bit
integer from md5 (identical everywhere): the first 15 hex chars parsed as an
integer. 15 hex digits = 60 bits, so it always fits a signed 64-bit value and
is non-negative.

Spark side: ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to long.
DuckDB side: ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.

md5 is ~4x slower than xxhash64 but still >1 GB/s/core JVM-side; at 100 TB
you would swap :func:`hash60` for ``xxhash64`` (and regenerate oracles with
Spark itself as the reference) — the operator structure is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1, modulus of the minhash permutation family.
MINHASH_PRIME = 2147483647


def hash60(col: Column | str) -> Column:
    """60-bit portable hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash31(col: Column | str) -> Column:
    """Portable hash reduced mod 2^31-1 (minhash permutation input)."""
    return hash60(col) % MINHASH_PRIME


def HASH60_SQL(expr: str) -> str:
    """DuckDB rendering of :func:`hash60`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def HASH31_SQL(expr: str) -> str:
    return f"({HASH60_SQL(expr)} % {MINHASH_PRIME})"
