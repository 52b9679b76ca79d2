"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship aggregation on sf0.001; ``queries`` /
``oracle_sql`` expose one entry per implemented operator class from
SURVEY.md §2 plus the training-data pipeline ops, implemented in
``track0_spark/contract.py`` with DuckDB oracle twins. The crawl engine
itself (oracle-exact frontier loop) is exercised by ``python -m pytest
-x -q`` and ``bench.py`` — see tests/test_spark_crawl.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from track0_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.q01_agg_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every ``queries()`` entry."""
    return contract.oracle_sql()
