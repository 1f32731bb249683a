from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from dff.env import pick_local_dir

    builder = SparkSession.builder.master("local[4]").appName("dff-tests")
    local_dir = pick_local_dir()  # tmpfs iff capacity allows (dff/env.py)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    session = (
        builder.config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        # fixed pre-touched heap: see jobs/validate.py
        .config("spark.driver.extraJavaOptions", "-Xms4g -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session
    session.stop()
