"""Z-order code correctness + layout bounding-box tightness."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.zorder import (
    morton_code,
    write_zordered,
)


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    code = 0
    for i in range(bits):
        code |= ((a >> i) & 1) << (2 * i + 1)
        code |= ((b >> i) & 1) << (2 * i)
    return code


def test_morton_matches_python_reference(spark):
    pts = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 77, 65535)]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in pts:
        assert got[(a, b)] == _morton_py(a, b), (a, b)


def test_zordered_layout_has_tight_bounding_boxes(spark, tmp_path):
    """Files of a Z-ordered write cover small rectangles in BOTH
    dimensions; a single-column sort only clusters its leading dim."""
    import random

    random.seed(7)
    rows = [
        (random.randrange(1024), random.randrange(1024))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    n_files = 8

    def avg_span(path: str, col: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        assert len(per_file) == n_files
        return sum(r["span"] for r in per_file) / len(per_file)

    zpath = str(tmp_path / "zordered")
    write_zordered(
        df, morton_code(F.col("x"), F.col("y"), bits=10), zpath,
        n_files=n_files,
    )
    xpath = str(tmp_path / "xsorted")
    df.repartitionByRange(n_files, "x").write.parquet(xpath)

    # x-sorted: x spans tiny, y spans full range (~1023)
    assert avg_span(xpath, "x") < 200
    assert avg_span(xpath, "y") > 900
    # z-ordered: BOTH dims' spans are a fraction of the full range —
    # 8 curve segments ≈ 3 bit-levels, so boxes are ~1/2 to 1/4 per
    # dim (vs the full 1023 an unclustered dim shows)
    assert avg_span(zpath, "x") < 700
    assert avg_span(zpath, "y") < 700
    assert avg_span(zpath, "x") + avg_span(zpath, "y") < avg_span(
        xpath, "x"
    ) + avg_span(xpath, "y")


def test_zorder_rowgroup_pruning_both_dims(spark, tmp_path):
    """The point of the layout: a range predicate on EITHER dimension
    can skip most row groups via parquet min/max stats. Measured
    directly from the footers (what any engine's reader consults),
    not inferred from spans."""
    import glob
    import random

    import pyarrow.parquet as pq

    random.seed(11)
    rows = [
        (random.randrange(1024), random.randrange(1024))
        for _ in range(40_000)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xs")
    write_zordered(
        df, morton_code(F.col("x"), F.col("y"), bits=10), zpath,
        n_files=16,
    )
    df.repartitionByRange(16, "x").write.parquet(xpath)

    def surviving_fraction(path: str, col: str, lo: int, hi: int):
        total = hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ci = [md.schema.column(i).name for i in
                  range(md.num_columns)].index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                total += 1
                if not (st.max < lo or st.min > hi):
                    hit += 1
        assert total >= 16
        return hit / total

    # a 1/8th-range predicate on y: x-sorted layout can skip nothing
    # (every row group spans all of y); the Z-layout skips most
    assert surviving_fraction(xpath, "y", 0, 127) == 1.0
    assert surviving_fraction(zpath, "y", 0, 127) <= 0.5
    # and the Z-layout still prunes on x too (shared budget)
    assert surviving_fraction(zpath, "x", 0, 127) <= 0.5
