"""Co-located bloom gate (operators/bloom_colocated.py): crawl output
invariance vs gate-off, oracle exactness, resume, self-heal of missing
gate dirs, compaction invariance, and bit-equivalence of the stored
bucket bitmaps against the driver-held PartitionedBloom (shared
bucket_bitmap kernel)."""

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


def test_colocated_matches_oracle_and_gate_off(
    spark, web_rows, oracle_rows, tmp_path
):
    """gate='bloom-colocated' produces the EXACT oracle crawl_log (and
    therefore the exact gate-off output — both equal the oracle)."""
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "c1"),
        gate="bloom-colocated",
    )
    summary = loop.run()
    assert log_rows(loop) == oracle_rows
    assert summary.frontier_pending == 0
    # gate state exists next to every committed round's seen_delta
    for r in range(1, summary.rounds + 1):
        d = os.path.join(str(tmp_path / "c1"), f"round_{r:05d}", "bloom_delta")
        assert os.path.exists(os.path.join(d, "_SUCCESS")), d


def test_colocated_resume_and_self_heal(spark, web_rows, oracle_rows, tmp_path):
    """Kill after 3 rounds, DELETE two bloom_delta dirs (simulating a
    gate-off history / crash between commit and gate write), resume:
    ensure() rebuilds them from seen_delta and the full log still
    matches the oracle."""
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "c2")
    loop1 = CrawlLoop(spark, make_cfg(), pages, root, gate="bloom-colocated")
    loop1.run(max_rounds=3)
    for r in (0, 2):
        d = os.path.join(root, f"round_{r:05d}", "bloom_delta")
        if os.path.exists(d):
            shutil.rmtree(d)
    loop2 = CrawlLoop(spark, make_cfg(), pages, root, gate="bloom-colocated")
    loop2.run()
    assert log_rows(loop2) == oracle_rows


def test_colocated_with_compaction_invariant(
    spark, web_rows, oracle_rows, tmp_path
):
    """compact_every rolls both the seen deltas AND the bloom deltas
    into a base; output must be unchanged."""
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "c3"),
        gate="bloom-colocated", compact_every=2,
    )
    loop.run(max_rounds=7)
    got = log_rows(loop)
    assert got == [t for t in oracle_rows if t[0] < 7]
    # a bloom compact base was actually written and is complete
    blooms = glob.glob(
        os.path.join(str(tmp_path / "c3"), "compact_*", "bloom", "_SUCCESS")
    )
    assert blooms


def test_colocated_bitmaps_bit_equal_driver_gate(spark, tmp_path):
    """The stored per-bucket bitmaps, OR'd across delta dirs, must be
    byte-identical to a driver-held PartitionedBloom over the same keys
    (same kernel, same params) — the colocated gate is the SAME filter,
    just never assembled."""
    from track0_spark.operators.bloom import H64_MASK, PartitionedBloom
    from track0_spark.operators.bloom_colocated import (
        ColocatedBloomGate, _read_bucket_bits,
    )
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
    gate = ColocatedBloomGate(spark, root, expected_keys=20000)
    gate.write_delta(0, spark.createDataFrame(
        [(int(k),) for k in keys1], "url_h64 long"))
    gate.write_delta(1, spark.createDataFrame(
        [(int(k),) for k in keys2], "url_h64 long"))

    driver = PartitionedBloom(
        expected_keys=20000, n_buckets=gate.n_buckets,
        n_hashes=gate.n_hashes,
    )
    assert driver.bucket_bits == gate.bucket_bits
    driver.add_many(keys1)
    driver.add_many(keys2)
    dirs = [gate.delta_dir(0), gate.delta_dir(1)]
    for b in range(gate.n_buckets):
        got = _read_bucket_bits(dirs, b, gate.bucket_bits)
        assert np.array_equal(got, driver.bits[b]), f"bucket {b}"

    # probe: no false negatives on every inserted key, fp rate sane
    cand = spark.createDataFrame(
        [(f"u{k}", int(k)) for k in np.concatenate([keys1, keys2])],
        "url_canon string, url_h64 long",
    ).withColumn("maybe_seen", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(True))
    out = {r["url_canon"]: r["maybe_seen"]
           for r in gate.probe(cand, 1).collect()}
    assert all(out.values()) and len(out) == 7000


def test_colocated_verdict_actually_gates_antijoin(
    spark, web_rows, oracle_rows, tmp_path, monkeypatch
):
    """The r3 ADVICE bug: in colocated mode the round plan computed the
    gate verdict but routed EVERY candidate through the exact anti-join
    anyway, so gate-on == gate-off tests could never see it. Detector:
    monkeypatch the gate with a LYING probe that marks every candidate
    surely-new (maybe_seen=False). If the verdict is consulted, those
    rows skip the anti-join and previously-seen URLs get RE-admitted —
    the crawl_log must diverge from the oracle with duplicate url_canon
    fetches. If the verdict is ignored (the bug), the anti-join saves
    the day and the log stays oracle-exact, failing this test."""
    from pyspark.sql import functions as F

    from track0_spark.operators import bloom_colocated as bc

    def lying_make_probe(self, upto):
        return lambda cand: cand.withColumn("maybe_seen", F.lit(False))

    monkeypatch.setattr(bc.ColocatedBloomGate, "make_probe", lying_make_probe)
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "lie"),
        gate="bloom-colocated",
    )
    loop.run(max_rounds=4)
    got = log_rows(loop)
    dup_urls = len(got) - len({t[2] for t in got})
    assert dup_urls > 0, (
        "lying surely-new verdict produced zero re-admissions: the gate "
        "verdict is not being consulted by the round plan (r3 ADVICE bug)"
    )


def test_colocated_partial_gate_compact_resumes(
    spark, web_rows, oracle_rows, tmp_path
):
    """Kill window INSIDE the gate's compact (VERDICT r4 #7a): the
    store's seen compact committed (COMPACT.json present) but the
    bloom base dir is partial — _SUCCESS missing. _latest_compact must
    ignore the torn base (falling back to the per-round deltas, which
    compaction never deletes) and the resumed crawl must stay
    oracle-exact. The torn dir must also never reach _read_bucket_bits
    (which now raises loudly on _SUCCESS-less dirs)."""
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "pc")
    loop1 = CrawlLoop(
        spark, make_cfg(), pages, root,
        gate="bloom-colocated", compact_every=2,
    )
    loop1.run(max_rounds=5)
    bases = glob.glob(os.path.join(root, "compact_*", "bloom", "_SUCCESS"))
    assert bases, "precondition: a gate compact base was written"
    for s in bases:
        os.remove(s)  # simulate the kill mid-write of the bloom base
    loop2 = CrawlLoop(
        spark, make_cfg(), pages, root,
        gate="bloom-colocated", compact_every=2,
    )
    loop2.run()
    assert log_rows(loop2) == oracle_rows


def test_colocated_delta_present_seen_torn_fails_loudly(
    spark, web_rows, tmp_path
):
    """Symmetric torn case (VERDICT r4 #7b): the round's bloom_delta
    committed but its seen_delta was lost. The gate is an ACCELERATOR
    over the exact seen store — resuming must fail with the loud
    torn-store error from load_seen, never silently continue on the
    bloom's say-so (a bloom false positive would then silently DROP
    frontier URLs with no exact set to rescue them)."""
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "torn")
    loop1 = CrawlLoop(spark, make_cfg(), pages, root, gate="bloom-colocated")
    loop1.run(max_rounds=3)
    victim = os.path.join(root, "round_00002", "seen_delta")
    assert os.path.exists(victim)
    assert os.path.exists(
        os.path.join(root, "round_00002", "bloom_delta", "_SUCCESS")
    )
    shutil.rmtree(victim)
    loop2 = CrawlLoop(spark, make_cfg(), pages, root, gate="bloom-colocated")
    with pytest.raises(FileNotFoundError, match="torn"):
        loop2.run()
