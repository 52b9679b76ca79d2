"""Co-located cuckoo gate (operators/cuckoo_colocated.py): the same
equivalence quartet as test_bloom_colocated — oracle-exact crawl,
resume + self-heal, compaction invariance, membership properties —
plus the gate's distinguishing feature, the distributed delete job."""

import glob
import os
import shutil

import numpy as np
import pytest

from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows

FOLLOW = "+original-domain -depth>3 +requisite"

LOG_COLS = [
    "round", "fetch_seq", "url_canon", "host", "depth",
    "domain_depth", "status", "saved", "is_requisite",
]


def make_cfg():
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    return CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40
    )


@pytest.fixture(scope="module")
def web_rows():
    return webgen.gen_pages(webgen.SF_UNIT)


@pytest.fixture(scope="module")
def oracle_rows(web_rows):
    sp = OracleSpider(make_cfg(), webgen.store_from_rows(web_rows))
    log = sp.run()
    return [tuple(r[c] for c in LOG_COLS) for r in log]


def log_rows(loop):
    df = loop.crawl_log()
    rows = df.orderBy("round", "fetch_seq").collect()
    return [tuple(r[c] for c in LOG_COLS) for r in rows]


def test_cuckoo_colocated_matches_oracle(spark, web_rows, oracle_rows, tmp_path):
    """gate='cuckoo-colocated' produces the EXACT oracle crawl_log, and
    every committed round has its cuckoo_delta next to its seen_delta."""
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "k1"),
        gate="cuckoo-colocated",
    )
    summary = loop.run()
    assert log_rows(loop) == oracle_rows
    assert summary.frontier_pending == 0
    for r in range(1, summary.rounds + 1):
        d = os.path.join(
            str(tmp_path / "k1"), f"round_{r:05d}", "cuckoo_delta"
        )
        assert os.path.exists(os.path.join(d, "_SUCCESS")), d


def test_cuckoo_colocated_resume_and_self_heal(
    spark, web_rows, oracle_rows, tmp_path
):
    """Kill after 3 rounds, DELETE two cuckoo_delta dirs, resume:
    ensure() rebuilds them deterministically from seen_delta (sorted
    insertion = canonical layout) and the log stays oracle-exact."""
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "k2")
    loop1 = CrawlLoop(spark, make_cfg(), pages, root, gate="cuckoo-colocated")
    loop1.run(max_rounds=3)
    for r in (0, 2):
        d = os.path.join(root, f"round_{r:05d}", "cuckoo_delta")
        if os.path.exists(d):
            shutil.rmtree(d)
    loop2 = CrawlLoop(spark, make_cfg(), pages, root, gate="cuckoo-colocated")
    loop2.run()
    assert log_rows(loop2) == oracle_rows


def test_cuckoo_colocated_with_compaction_invariant(
    spark, web_rows, oracle_rows, tmp_path
):
    """compact_every rebuilds one full table per bucket from the exact
    seen keys; output must be unchanged and a base must exist."""
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "k3"),
        gate="cuckoo-colocated", compact_every=2,
    )
    loop.run(max_rounds=7)
    got = log_rows(loop)
    assert got == [t for t in oracle_rows if t[0] < 7]
    bases = glob.glob(
        os.path.join(str(tmp_path / "k3"), "compact_*", "cuckoo", "_SUCCESS")
    )
    assert bases


def test_cuckoo_colocated_membership_and_distributed_delete(spark, tmp_path):
    """Direct gate properties: (a) NO false negative on any inserted
    key across two delta rounds; (b) delete_distributed removes
    round-1's keys (each loses exactly one stored copy) while every
    round-2 key still probes maybe_seen=True; (c) most deleted keys
    now probe False (fp collisions may keep a few True — allowed,
    false-positive direction only)."""
    from pyspark.sql import functions as F

    from track0_spark.operators.bloom import H64_MASK
    from track0_spark.operators.cuckoo_colocated import ColocatedCuckooGate
    from track0s.hashing import h64

    keys1 = np.array(
        [h64(f"http://a.test/{i}") & H64_MASK for i in range(4000)],
        dtype=np.int64,
    )
    keys2 = np.array(
        [h64(f"http://b.test/{i}") & H64_MASK for i in range(3000)],
        dtype=np.int64,
    )
    root = str(tmp_path / "gate")
    os.makedirs(os.path.join(root, "round_00000"))
    os.makedirs(os.path.join(root, "round_00001"))
    gate = ColocatedCuckooGate(spark, root, expected_keys=20000)
    kdf1 = spark.createDataFrame([(int(k),) for k in keys1], "url_h64 long")
    kdf2 = spark.createDataFrame([(int(k),) for k in keys2], "url_h64 long")
    gate.write_delta(0, kdf1)
    gate.write_delta(1, kdf2)

    def verdicts(keys):
        cand = spark.createDataFrame(
            [(f"u{int(k)}", int(k)) for k in keys],
            "url_canon string, url_h64 long",
        ).withColumn("maybe_seen", F.lit(True))
        return {
            r["url_canon"]: r["maybe_seen"]
            for r in gate.probe(cand, 1).collect()
        }

    allk = np.concatenate([keys1, keys2])
    out = verdicts(allk)
    assert len(out) == 7000 and all(out.values())  # (a) no FN anywhere

    removed = gate.delete_distributed(kdf1, upto=1)
    assert removed == len(keys1)  # (b) one stored copy per deleted key

    out2 = verdicts(allk)
    k2_names = {f"u{int(k)}" for k in keys2}
    assert all(out2[n] for n in k2_names)  # (b) survivors: still no FN
    k1_names = [f"u{int(k)}" for k in keys1]
    still_maybe = sum(out2[n] for n in k1_names)
    # (c) deletions took effect; residual Trues are fp collisions only
    assert still_maybe < len(k1_names) * 0.05


def test_cuckoo_colocated_torn_dir_fails_loudly(spark, tmp_path):
    """A _SUCCESS-less delta dir reaching a probe task raises (same
    contract as the colocated bloom) instead of probing a hole."""
    from pyspark.sql import functions as F

    from track0_spark.operators.cuckoo_colocated import ColocatedCuckooGate

    root = str(tmp_path / "gate")
    os.makedirs(os.path.join(root, "round_00000"))
    gate = ColocatedCuckooGate(spark, root, expected_keys=1000)
    gate.write_delta(0, spark.createDataFrame([(7,)], "url_h64 long"))
    os.remove(os.path.join(gate.delta_dir(0), "_SUCCESS"))
    cand = spark.createDataFrame(
        [("u7", 7)], "url_canon string, url_h64 long"
    ).withColumn("maybe_seen", F.lit(True))
    with pytest.raises(Exception, match="torn or missing"):
        gate.probe(cand, 0).collect()


def test_cuckoo_colocated_delete_rewrite_is_atomic(spark, tmp_path):
    """ADVICE r4 low regression: delete_distributed must never write
    over a live bucket file in place — a crash mid-rewrite under a
    still-valid _SUCCESS marker would leave an undetectable torn file.
    Pin the mechanism: (a) after a delete, no .inprogress temp remains
    and every bucket file still parses with the one-row-per-file
    invariant; (b) a leftover temp from a simulated crash is invisible
    to probes (the glob matches *.parquet only), so the dir stays
    readable and heal-able."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from track0_spark.operators.bloom import H64_MASK
    from track0_spark.operators.cuckoo_colocated import ColocatedCuckooGate
    from track0s.hashing import h64

    keys = [h64(f"http://a.test/{i}") & H64_MASK for i in range(500)]
    root = str(tmp_path / "gate")
    os.makedirs(os.path.join(root, "round_00000"))
    gate = ColocatedCuckooGate(spark, root, expected_keys=5000)
    kdf = spark.createDataFrame([(int(k),) for k in keys], "url_h64 long")
    gate.write_delta(0, kdf)

    removed = gate.delete_distributed(kdf, upto=0)
    assert removed == len(keys)
    files = glob.glob(os.path.join(gate.delta_dir(0), "bucket=*", "*"))
    assert files and not [f for f in files if f.endswith(".inprogress")]
    for f in files:
        assert pq.read_table(f).num_rows == 1  # still one row per file

    # (b) simulated crash: a stray temp next to a live file is ignored
    victim = files[0]
    with open(victim + ".inprogress", "wb") as fh:
        fh.write(b"torn")
    cand = spark.createDataFrame(
        [(f"u{int(keys[0])}", int(keys[0]))], "url_canon string, url_h64 long"
    ).withColumn("maybe_seen", F.lit(True))
    gate.probe(cand, 0).collect()  # must not raise
