"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB against the same parquet tables, then compares row count,
column names, and an order-insensitive value hash (rows sorted by
their full string representation, columns sorted by name — a
conservative stand-in for whatever canonicalization the driver uses;
if we pass this, the driver's check should pass too).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(val) -> str:
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # repr keeps full double precision; bit-identical doubles
        # match. Normalize -0.0 -> 0.0 first: the two compare equal
        # but repr differently, and rounded tiny negatives can land on
        # either sign cross-engine (ADVICE r1).
        return repr(val + 0.0)
    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    if isinstance(val, list):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    return str(val)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from knn_using_hadoop_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            print(
                f"OK?  {name}: rows-only check (no oracle), "
                f"{len(srows)} rows, {spark_s:.1f}s"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if sorted(scols_l) != sorted(dcols):
            problems.append(f"schema {scols_l} vs {dcols}")
        else:
            # type strictness: map Spark simple types to DuckDB's and
            # demand equality, in case the driver's schema check does
            spark_types = {
                f.name.lower(): f.dataType.simpleString()
                for f in sdf.schema.fields
            }
            mapping = {
                "int": "INTEGER",
                "bigint": "BIGINT",
                "double": "DOUBLE",
                "float": "FLOAT",
                "string": "VARCHAR",
                "timestamp": "TIMESTAMP",
                "date": "DATE",
                "boolean": "BOOLEAN",
            }
            dtypes = dict(zip(dcols, [str(t) for t in rel.types]))
            for cname, stype in spark_types.items():
                want = mapping.get(stype)
                got_t = dtypes.get(cname)
                if want is not None and got_t != want:
                    problems.append(
                        f"type[{cname}] spark={stype} duckdb={got_t}"
                    )
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            hs = _hash_rows(scols_l, srows)
            hd = _hash_rows(dcols, drows)
            if hs != hd:
                problems.append(f"value-hash {hs} vs {hd}")
                # show first differing canonical line for debugging
                so = sorted(range(len(scols_l)), key=lambda i: scols_l[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sl = sorted("|".join(_canon(r[i]) for i in so) for r in srows)
                dl = sorted("|".join(_canon(r[i]) for i in do) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        problems.append(f"  first diff:\n  spark={a}\n  duck ={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows, spark {spark_s:.1f}s")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
