"""Shared pytest fixtures: one SparkSession for the whole test run.

local[8] with AQE + Arrow + dynamic partition overwrite — the same confs the
engine recommends (jsonschema_spark.engine.recommended_conf), scaled down for
test latency.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from jsonschema_spark.engine import recommended_conf

    b = (
        SparkSession.builder.appName("jsonschema-spark-tests")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
    )
    for k, v in recommended_conf(8).items():
        if k != "spark.sql.shuffle.partitions":
            b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
