#!/usr/bin/env python
"""One-command reference-parity runner.

Twin of the reference's launch scripts
(``/root/reference/run-hadoop-small.sh:1-2`` etc., whose contract is
``<train.arff> <test.arff> <k> <outdir>``): reads both ARFF files,
runs exact KNN, writes the tab-separated ``(test_id \\t prediction)``
sink in the reference's one-reducer layout, and prints accuracy —
the reference's two artifacts (``predictions/part-r-00000`` and the
driver's accuracy printout, ``Hadoop.java:319-343``) from one command.

Usage:
    python run_reference.py <train.arff> <test.arff> [k=3] [outdir]

With the reference's small dataset this reproduces the committed
golden run: 80 predictions, accuracy 0.85.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knn_using_hadoop_spark.operators.knn import (  # noqa: E402
    knn_accuracy,
    knn_predict,
)
from knn_using_hadoop_spark.session import get_spark  # noqa: E402
from knn_using_hadoop_spark.sources.arff import (  # noqa: E402
    read_arff_features,
)
from knn_using_hadoop_spark.sources.sinks import write_tsv  # noqa: E402


def main(argv: list[str]) -> int:
    if not 2 <= len(argv) <= 4:
        print(__doc__, file=sys.stderr)
        return 2
    train_path, test_path = argv[0], argv[1]
    k = int(argv[2]) if len(argv) > 2 else 3
    outdir = argv[3] if len(argv) > 3 else None

    spark = get_spark("run_reference")
    par = spark.sparkContext.defaultParallelism
    # a single small ARFF file is one input split; spread the train
    # side so the cross join parallelizes
    train = read_arff_features(spark, train_path).repartition(par)
    test = read_arff_features(spark, test_path)
    dim = len(train.select("features").first().features)

    preds = knn_predict(train, test, k, dim=dim).cache()
    if outdir:
        write_tsv(preds, outdir, single_file=True)
        print(f"predictions written to {outdir}")
    acc = knn_accuracy(preds, test).first().accuracy
    n = preds.count()
    print(f"{n} predictions, k={k}")
    print(f"accuracy: {acc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
