from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    local_dir = os.environ.get("DFF_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = "/tmp"
    session = (
        SparkSession.builder.master("local[4]")
        .appName("dff-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        # fixed pre-touched heap + tmpfs shuffle dir: see jobs/validate.py
        .config("spark.driver.extraJavaOptions", "-Xms4g -XX:+AlwaysPreTouch")
        .config("spark.local.dir", local_dir)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session
    session.stop()
