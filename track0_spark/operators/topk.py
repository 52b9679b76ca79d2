"""Per-host politeness top-k — direct window and salted two-phase (P1/P4).

The frontier's per-host priority queue is a ranking window over the
FROZEN order key (priority, depth, discovered_round, url_canon)
(track0s/config.py). A plain window shuffles ALL pending rows of a host
into one task — at web scale one giant host serializes the round and
AQE's skew-join splitting does not apply to windows (SURVEY.md §4).

The salted two-phase variant bounds any single task at ~frontier/SALT
rows: phase 1 ranks within (host, salt) partitions and keeps only the
per-salt top-B; phase 2 re-ranks the ≤ SALT·B survivors per host.
Correct because the global per-host top-B is a subset of the union of
per-salt top-Bs (each global winner beats everything in its own salt
bucket). Both variants produce IDENTICAL output — pytest asserts it.

Budget B comes per-host from the broadcast robots table
(``budget_per_round``), defaulting to the config budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ORDER_COLS = ["priority", "depth", "discovered_round", "url_canon"]


def _with_budget(
    frontier: DataFrame,
    robots: DataFrame,
    default_budget: int,
    round_period_s: float | None = None,
) -> DataFrame:
    r = F.broadcast(robots.select("host", "budget_per_round", "crawl_delay_s"))
    budget = F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
    if round_period_s is not None:
        # Crawl-delay cap: max(1, floor(period/delay)) fetches of a
        # d-spaced host fit in one nominal round — the same IEEE double
        # division + floor as RobotsTable.budget, so spark == oracle
        # exactly (track0s/robots.py)
        cap = F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.lit(float(round_period_s)) / F.col("crawl_delay_s")),
        )
        budget = F.when(
            F.coalesce(F.col("crawl_delay_s"), F.lit(0.0)) > 0,
            F.least(budget.cast("long"), cap),
        ).otherwise(budget.cast("long"))
    return (
        frontier.join(r, "host", "left")
        .withColumn("budget", budget)
        .drop("budget_per_round", "crawl_delay_s")
    )


def select_batch(
    frontier: DataFrame,
    robots: DataFrame,
    default_budget: int,
    salt: int = 0,
    persist: bool = False,
    round_period_s: float | None = None,
) -> tuple[DataFrame, DataFrame, list]:
    """-> (batch with per-host ``rank`` 1..B, leftover rows, persisted).

    Leftovers keep their frontier schema and stay pending (politeness
    defers, never drops — the budget test in tests/test_oracle.py).
    With ``persist=True`` the ranked window output is cached so batch
    and rest split one materialization instead of running the window
    twice (the caller materializes + unpersists — plans/round.py).
    """
    fb = _with_budget(frontier, robots, default_budget, round_period_s)
    handles: list = []
    if salt and salt > 1:
        # phase 1: per-(host, salt-bucket) partial rank, keep top-B
        wsalt = Window.partitionBy("host", "salt_b").orderBy(*ORDER_COLS)
        fb = fb.withColumn(
            "salt_b", F.pmod(F.xxhash64("url_canon", F.lit("salt")), F.lit(salt))
        )
        pre = fb.withColumn("prerank", F.row_number().over(wsalt))
        survivors = pre.filter(F.col("prerank") <= F.col("budget"))
        # phase 2: exact rank among survivors only
        w = Window.partitionBy("host").orderBy(*ORDER_COLS)
        ranked = survivors.withColumn("rank", F.row_number().over(w))
        if persist:
            pre = pre.persist()
            ranked = ranked.persist()
            handles += [pre, ranked]
        batch = ranked.filter(F.col("rank") <= F.col("budget"))
        losers_p1 = pre.filter(F.col("prerank") > F.col("budget"))
        losers_p2 = ranked.filter(F.col("rank") > F.col("budget"))
        rest = losers_p1.drop("prerank", "salt_b", "budget").unionByName(
            losers_p2.drop("prerank", "salt_b", "budget", "rank")
        )
        return batch.drop("prerank", "salt_b"), rest, handles
    w = Window.partitionBy("host").orderBy(*ORDER_COLS)
    ranked = fb.withColumn("rank", F.row_number().over(w))
    if persist:
        ranked = ranked.persist()
        handles.append(ranked)
    batch = ranked.filter(F.col("rank") <= F.col("budget"))
    rest = ranked.filter(F.col("rank") > F.col("budget")).drop("rank", "budget")
    return batch, rest, handles


def with_fetch_seq(batch: DataFrame) -> DataFrame:
    """Global deterministic 0-based ``fetch_seq`` = order by (host, rank).

    Two-phase instead of one global row_number window over the batch:
    per-host counts (tiny) get cumulative offsets, then
    seq = offset(host) + rank - 1. The only single-task window runs
    over #hosts aggregated rows, never over batch rows — and NEVER
    ``monotonically_increasing_id`` (SURVEY.md §2.6 P5).
    """
    counts = batch.groupBy("host").agg(F.count(F.lit(1)).alias("h_cnt"))
    woff = Window.orderBy("host").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "h_off", F.coalesce(F.sum("h_cnt").over(woff), F.lit(0))
    ).select("host", "h_off")
    return batch.join(F.broadcast(offsets), "host").withColumn(
        "fetch_seq", (F.col("h_off") + F.col("rank") - 1).cast("long")
    ).drop("h_off")
