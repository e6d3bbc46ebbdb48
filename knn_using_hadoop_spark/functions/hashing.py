"""Portable deterministic hashes (identical in Spark SQL and DuckDB).

Spark's native ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so oracle-checked operators that hash (MinHash,
SimHash, fingerprints, bucketed dedup) need a hash both engines
compute identically. md5 is available and bit-identical in both; we
take leading hex nibbles and reinterpret them as an integer:

* Spark:  ``conv(substr(md5(x), 1, n), 16, 10)`` cast to bigint
* DuckDB: ``('0x' || substr(md5(x), 1, n))::BIGINT``

md5 is cryptographic overkill for LSH, but it's the only hash the two
engines share; at 100 TB you would swap in ``xxhash64`` (and give the
oracle the same algorithm via a UDF) — the operator shapes don't
change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: classic universal-hash modulus for MinHash
# permutations h_j(x) = (a_j * x + b_j) mod p.
MERSENNE_PRIME = 2147483647


def portable_hash32(c: Column | str) -> Column:
    """Unsigned 32-bit hash (first 8 md5 hex chars) as bigint."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def portable_hash64(c: Column | str, pos: int = 1) -> Column:
    """Unsigned 60-bit hash (15 md5 hex chars from ``pos``) as bigint.

    15 nibbles (not 16) so the value always fits in a signed int64 in
    both engines without overflow-behavior differences. ``pos=17``
    yields an independent second slice of the same digest — pairing
    the two gives a 120-bit key whose collision odds are negligible
    at any real corpus size, while the shuffle key stays 16 bytes.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(c.cast("string")), pos, 15), 16, 10
    ).cast("bigint")


def sql_hash32(expr: str, dialect: str) -> str:
    """SQL text for portable_hash32, for building oracle strings."""
    if dialect == "duckdb":
        return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def sql_hash64(expr: str, dialect: str, pos: int = 1) -> str:
    """SQL text for portable_hash64, for building oracle strings."""
    if dialect == "duckdb":
        return f"(('0x' || substr(md5({expr}), {pos}, 15))::BIGINT)"
    return f"CAST(conv(substr(md5({expr}), {pos}, 15), 16, 10) AS BIGINT)"


def minhash_perm(hash_col: Column, a: int, b: int) -> Column:
    """One MinHash permutation h(x) = (a*x + b) mod p over a 32-bit hash."""
    return (F.lit(a) * hash_col + F.lit(b)) % F.lit(MERSENNE_PRIME)
