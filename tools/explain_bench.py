"""Capture .explain("formatted") for bench legs into plans/r11/.

Usage: python tools/explain_bench.py <suffix> [leg ...]
Writes plans/r11/<leg>_<suffix>.txt for each requested leg (default:
every leg build_legs knows). Explain only — nothing executes beyond
the bounded driver probes the operators themselves perform at plan
construction (index meta/term fetches), plus one-time index builds
for store-backed legs when the /tmp artifacts are absent.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
)


def main() -> None:
    from tools.profile_bench import build_legs

    suffix = sys.argv[1]
    spark = get_spark("explain_bench")
    legs = build_legs(spark)
    wanted = sys.argv[2:] or sorted(legs)
    os.makedirs(OUT, exist_ok=True)
    for name in wanted:
        df = legs[name]()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{OUT}/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
