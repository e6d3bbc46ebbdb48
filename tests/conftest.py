from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


def pytest_addoption(parser):
    parser.addoption(
        "--run-scale",
        action="store_true",
        default=False,
        help="run @pytest.mark.scale tests (10x/100x stress via "
        "tools/scale_report.py — generates GBs under /tmp, takes "
        "tens of minutes)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "scale: 10x/100x scale regression (skipped unless --run-scale)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-scale"):
        return
    skip = pytest.mark.skip(reason="needs --run-scale")
    for item in items:
        if "scale" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from knn_using_hadoop_spark.session import get_spark

    spark = get_spark(app_name="tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
