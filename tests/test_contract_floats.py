"""Regression tests for the q01/q05 float-sum hash parity break
(VERDICT r4 "What's wrong" #1 / ADVICE r4 high).

Round 4's universal T() scan-parallelism floor repartitioned the
single-file test tables, changing float-sum accumulation order;
``sum(DOUBLE)`` then differed from the single-threaded DuckDB oracle in
the last ulps and the driver's exact value-hash flagged q01/q05. The
floor is now opt-in (heavy pre-shuffle stages only); these tests pin

1. bit-exact parity of q01/q05 vs their DuckDB twins (repr-normalized,
   the driver-grade comparison — NOT %.6g),
2. that no round-robin exchange is ever planned for the pure
   float-aggregation queries (the mechanism that broke parity),
3. that a *forced* repartition still agrees within float tolerance —
   i.e. the r4 break was accumulation-order ulps, not a value bug, and
4. that the floor still fires for a heavy opt-in query on a
   single-split scan (the r3 #5 win is retained).
"""

import math
import os

import duckdb
import pytest

from track0_spark.contract import (
    Q01_SQL,
    Q05_SQL,
    T,
    q01_agg_metrics,
    q05_broadcast_join_rev,
)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not mounted"
)


def _duck(sql):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    # driver-grade: floats by full repr (round-trips the bit pattern)
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    return repr(v) if isinstance(v, float) else str(v)


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize(
    "fn,sql", [(q01_agg_metrics, Q01_SQL), (q05_broadcast_join_rev, Q05_SQL)]
)
def test_float_agg_bit_exact_vs_duckdb(spark, fn, sql):
    df = fn(spark, SF)
    dcols, drows = _duck(sql)
    srows = [tuple(r) for r in df.collect()]
    assert sorted(df.columns) == sorted(dcols)
    assert _rowset(srows, df.columns) == _rowset(drows, dcols)


@pytest.mark.parametrize("fn", [q01_agg_metrics, q05_broadcast_join_rev])
def test_float_agg_queries_never_round_robin(spark, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan


def test_forced_repartition_is_ulp_only(spark):
    """The r4 divergence mechanism, pinned: summing under a forced
    repartition must still agree with the oracle to float tolerance
    (it is accumulation order, not a value bug)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet").repartition(4)
    srows = {
        (r["l_returnflag"], r["l_linestatus"]): r["s"]
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_extendedprice").alias("s"))
        .collect()
    }
    _, drows = _duck(
        "SELECT l_returnflag, l_linestatus, sum(l_extendedprice) AS s "
        "FROM lineitem GROUP BY 1, 2"
    )
    assert len(srows) == len(drows)
    for rf, ls, s in drows:
        assert math.isclose(srows[(rf, ls)], float(s), rel_tol=1e-12)


def test_floor_fires_for_heavy_optin_on_single_split(spark):
    raw = spark.read.parquet(f"{SF}/documents.parquet")
    floored = T(spark, SF, "documents", floor=True)
    p = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() >= p:
        pytest.skip("scan already has enough splits; floor is a no-op")
    assert floored.rdd.getNumPartitions() == p
    # and the default path adds nothing
    assert T(spark, SF, "documents").rdd.getNumPartitions() == (
        raw.rdd.getNumPartitions()
    )
