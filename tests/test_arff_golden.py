"""ARFF source + reference golden-output parity (SURVEY.md §5).

The committed golden run (/root/reference/predictions/part-r-00000,
80 rows, k=3 on datasets/small-*.arff) is reproduced EXACTLY by the
documented semantics: the reference's vote-count and merge bugs
(FIXTURES.md divergences 1-3) happen not to change any prediction at
this scale (single mapper, no single-vote winners), verified offline
with a NumPy oracle. So this test demands equality on all 80 rows.
"""

from __future__ import annotations

import pytest

from knn_using_hadoop_spark.operators.knn import knn_accuracy, knn_predict
from knn_using_hadoop_spark.sources.arff import (
    ArffFormatError,
    parse_arff_schema,
    read_arff,
    read_arff_features,
)

REF = "/root/reference/datasets"
GOLDEN = "/root/reference/predictions/part-r-00000"


def test_read_arff_schema_and_rows(spark):
    df = read_arff(spark, f"{REF}/small-train.arff")
    assert len(df.columns) == 8  # 7 features + class
    assert df.count() == 592
    assert all(f.dataType.typeName() == "double" for f in df.schema.fields)


def test_read_arff_features_shape(spark):
    feats = read_arff_features(spark, f"{REF}/small-test.arff")
    rows = feats.orderBy("id").collect()
    assert len(rows) == 80
    assert rows[0].id == 0 and rows[-1].id == 79
    assert len(rows[0].features) == 7


def test_parse_nominal_and_string_as_string_columns():
    schema = parse_arff_schema(
        [
            "@attribute x NUMERIC",
            "@attribute cls {a,b}",
            "@attribute note string",
        ]
    )
    assert [f.dataType.typeName() for f in schema.fields] == [
        "double",
        "string",
        "string",
    ]


def test_parse_date_attribute_schema():
    schema = parse_arff_schema(
        [
            '@attribute ts date "yyyy-MM-dd HH:mm:ss"',
            "@attribute ts2 date",  # Weka default ISO-8601
            "@attribute x NUMERIC",
        ]
    )
    assert [f.dataType.typeName() for f in schema.fields] == [
        "timestamp",
        "timestamp",
        "double",
    ]
    assert schema.fields[0].metadata["arff_date_format"] == (
        "yyyy-MM-dd HH:mm:ss"
    )
    assert schema.fields[1].metadata["arff_date_format"] == (
        "yyyy-MM-dd'T'HH:mm:ss"
    )


def test_parse_rejects_relational():
    with pytest.raises(ArffFormatError, match="unsupported ARFF type"):
        parse_arff_schema(["@attribute bag relational"])


def test_read_date_arff_end_to_end(spark, tmp_path):
    import datetime

    p = tmp_path / "dated.arff"
    p.write_text(
        "@relation toy\n"
        "@attribute ts date\n"
        '@attribute d2 date "yyyy/MM/dd"\n'
        "@attribute x NUMERIC\n"
        "@data\n"
        "2024-01-15T12:30:00,2024/01/16,1.5\n"
        "2024-02-01T00:00:00,2024/02/02,2.5\n"
    )
    df = read_arff(spark, str(p))
    rows = df.orderBy("x").collect()
    assert rows[0].ts == datetime.datetime(2024, 1, 15, 12, 30)
    assert rows[1].d2 == datetime.datetime(2024, 2, 2)
    assert rows[1].x == 2.5


def test_datasource_date_parity(spark, tmp_path):
    from knn_using_hadoop_spark.sources.arff_datasource import (
        ArffDataSource,
    )

    p = tmp_path / "dated_ds.arff"
    p.write_text(
        "@relation toy\n"
        "@attribute ts date\n"
        "@attribute x NUMERIC\n"
        "@data\n"
        "2024-01-15T12:30:00,1.5\n"
        "2024-02-01T06:15:30,2.5\n"
    )
    spark.dataSource.register(ArffDataSource)
    via_ds = spark.read.format("arff").load(str(p)).orderBy("x").collect()
    via_csv = read_arff(spark, str(p)).orderBy("x").collect()
    assert via_ds == via_csv


def test_read_nominal_arff_end_to_end(spark, tmp_path):
    p = tmp_path / "nominal.arff"
    p.write_text(
        "@relation toy\n"
        "@attribute x NUMERIC\n"
        "@attribute y NUMERIC\n"
        "@attribute cls {yes,no}\n"
        "@data\n"
        "1.0,2.0,yes\n"
        "3.5,4.5,no\n"
    )
    df = read_arff(spark, str(p))
    rows = df.orderBy("x").collect()
    assert [r.cls for r in rows] == ["yes", "no"]
    assert rows[0].y == 2.0
    # the numeric-only feature projection refuses with a clear error
    with pytest.raises(ArffFormatError, match="numeric"):
        read_arff_features(spark, str(p))


def test_parse_rejects_empty():
    with pytest.raises(ArffFormatError, match="no @attribute"):
        parse_arff_schema(["@relation foo", "@data"])


def test_file_order_ids_multi_split(spark):
    """The zipWithIndex id path must agree with single-split reads.

    Shrinking maxPartitionBytes forces the scan into many input
    splits, exercising the per-partition-offset branch; ids must stay
    contiguous 0..n-1 and map to the same rows as the (golden-pinned)
    single-split read.
    """
    key = "spark.sql.files.maxPartitionBytes"
    single = {
        r.id: (tuple(r.features), r.label)
        for r in read_arff_features(
            spark, f"{REF}/large-train.arff"
        ).collect()
    }
    old = spark.conf.get(key)
    spark.conf.set(key, str(16 * 1024))
    try:
        df = read_arff_features(spark, f"{REF}/large-train.arff")
        multi = {
            r.id: (tuple(r.features), r.label) for r in df.collect()
        }
    finally:
        spark.conf.set(key, old)
    assert sorted(multi) == list(range(len(single)))
    assert multi == single


def test_reference_golden_parity(spark):
    train = read_arff_features(spark, f"{REF}/small-train.arff")
    test = read_arff_features(spark, f"{REF}/small-test.arff")
    preds = {
        r.test_id: r.prediction
        for r in knn_predict(train, test, 3, dim=7).collect()
    }
    golden = {}
    with open(GOLDEN) as fh:
        for line in fh:
            i, c = line.split()
            golden[int(i)] = int(c)
    assert len(preds) == len(golden) == 80
    assert preds == golden  # exact parity with the committed run

    acc = (
        knn_accuracy(
            spark.createDataFrame(
                [(i, p) for i, p in preds.items()],
                "test_id int, prediction int",
            ),
            test,
        )
        .collect()[0]
        .accuracy
    )
    assert acc == pytest.approx(0.85)  # 68/80, BASELINE.md golden accuracy


def test_write_arff_round_trip(spark, tmp_path):
    import datetime

    df = spark.createDataFrame(
        [
            (1.5, "yes", datetime.datetime(2024, 1, 15, 12, 30)),
            (2.0, "no", datetime.datetime(2024, 2, 1, 6, 0)),
        ],
        "x double, cls string, ts timestamp",
    )
    from knn_using_hadoop_spark.sources.arff import write_arff

    p = str(tmp_path / "out.arff")
    write_arff(df, p, relation="toy")
    back = read_arff(spark, p).orderBy("x").collect()
    assert [f.dataType.typeName() for f in read_arff(spark, p).schema] \
        == ["double", "string", "timestamp"]
    assert back[0].x == 1.5 and back[0].cls == "yes"
    assert back[0].ts == datetime.datetime(2024, 1, 15, 12, 30)
    assert back[1].x == 2.0  # integral double survives the .0 strip


def test_write_arff_golden_reference_shape(spark, tmp_path):
    """Writing the reference's own dataset back out re-reads
    identically (full read -> write -> read fixpoint)."""
    src = f"{REF}/small-test.arff"
    df = read_arff(spark, src)
    from knn_using_hadoop_spark.sources.arff import write_arff

    p = str(tmp_path / "rt.arff")
    write_arff(df, p, relation="small")
    again = read_arff(spark, p)
    assert again.schema == df.schema
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_write_arff_quoting_and_nulls(spark, tmp_path):
    """Weka-conformant encoding (ADVICE r3 #1): separator-bearing
    strings are single-quoted with backslash escapes, NULLs become
    the ARFF missing marker '?' (never silently dropped)."""
    from knn_using_hadoop_spark.sources.arff import write_arff

    df = spark.createDataFrame(
        [
            (1.0, "plain"),
            (2.0, "has, comma"),
            (3.0, "don't"),
            (4.0, "back\\slash"),
            (5.0, None),
        ],
        "x double, s string",
    )
    p = str(tmp_path / "q.arff")
    write_arff(df, p, relation="q")
    import glob

    text = open(glob.glob(f"{p}/part-*")[0]).read()
    lines = text.strip().splitlines()
    data = lines[lines.index("@data") + 1:]
    assert data == [
        "1,plain",
        "2,'has, comma'",
        r"3,'don\'t'",
        r"4,'back\\slash'",
        "5,?",
    ]
    # the quoted values round-trip through this module's own reader;
    # the strict reader surfaces the missing marker as a literal '?'
    # for string attributes (it deliberately has no null path)
    back = read_arff(spark, p).orderBy("x").collect()
    assert [r.s for r in back] == [
        "plain", "has, comma", "don't", "back\\slash", "?"
    ]


def test_write_arff_question_mark_and_newlines(spark, tmp_path):
    """ADVICE r4 #1: a literal '?' string must be QUOTED (unquoted it
    reads back as the missing marker, so a real "?" and NULL become
    indistinguishable — Weka's Utils.quote quotes it too), and
    newlines/CRs are escaped as \\n / \\r so a value can never break
    the line-oriented format."""
    from knn_using_hadoop_spark.sources.arff import write_arff

    df = spark.createDataFrame(
        [
            (1.0, "?"),
            (2.0, None),
            (3.0, "line1\nline2"),
            (4.0, "cr\rhere"),
            (5.0, "ok"),
        ],
        "x double, s string",
    )
    p = str(tmp_path / "qm.arff")
    write_arff(df, p, relation="qm")
    import glob

    text = open(glob.glob(f"{p}/part-*")[0]).read()
    lines = text.strip().splitlines()
    data = lines[lines.index("@data") + 1:]
    # exactly one physical line per row: embedded newlines never leak
    assert data == [
        "1,'?'",
        "2,?",
        r"3,'line1\nline2'",
        r"4,'cr\rhere'",
        "5,ok",
    ]


def test_write_arff_single_file_preserves_row_order(spark, tmp_path):
    """single_file=True writes data rows in DataFrame order (ADVICE
    r3 #3): ord is now total, so the reader's file-order ids equal the
    writer's input order even for a multi-partition input frame."""
    from knn_using_hadoop_spark.sources.arff import write_arff

    rows = [(float(i), float(i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "a double, label double").repartition(
        8
    )
    expected = [r.a for r in df.collect()]  # partition-major order
    p = str(tmp_path / "ord.arff")
    write_arff(df, p, relation="ord")
    import glob

    files = glob.glob(f"{p}/part-*")
    assert len(files) == 1
    got = []
    in_data = False
    for line in open(files[0]).read().strip().splitlines():
        if in_data:
            got.append(float(line.split(",")[0]))
        elif line == "@data":
            in_data = True
    assert got == expected
