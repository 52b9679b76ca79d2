"""Snapshot-store unit tests: atomic commit protocol, manifest lineage,
per-partition metrics (A3/S5 — SURVEY.md §2.1, §2.7)."""

import json
import os

import pytest

from datagen import webgen
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows
from track0_spark.sources.snapshot import SnapshotStore
from tests.test_spark_crawl import make_cfg


def test_partition_metrics_recorded(spark, tmp_path):
    pages = pages_from_rows(spark, webgen.gen_pages(webgen.SF_UNIT))
    loop = CrawlLoop(
        spark,
        make_cfg(),
        pages,
        str(tmp_path / "ck"),
        partition_metrics=True,
    )
    loop.run(max_rounds=2)
    man = loop.store.manifest(2)
    parts = man["frontier_partitions"]
    assert isinstance(parts, list) and parts
    total = sum(n for _pid, n in parts)
    assert total == man["counts"]["frontier"]  # lineage adds up exactly


def test_torn_commit_is_invisible(spark, tmp_path):
    """A .tmp dir without MANIFEST (kill mid-commit) must be ignored and
    the next run must resume from the last COMPLETE round."""
    root = str(tmp_path / "ck2")
    pages = pages_from_rows(spark, webgen.gen_pages(webgen.SF_UNIT))
    loop = CrawlLoop(spark, make_cfg(), pages, root)
    loop.run(max_rounds=2)
    store = SnapshotStore(spark, root)
    assert store.latest_round() == 2
    # simulate a torn commit of round 3
    os.makedirs(os.path.join(root, ".tmp-00003", "frontier"))
    torn = os.path.join(root, "round_00003")
    os.makedirs(os.path.join(torn, "frontier"))  # dir without MANIFEST
    assert store.latest_round() == 2  # torn round invisible
    loop2 = CrawlLoop(spark, make_cfg(), pages, root)
    loop2.run(max_rounds=3)
    assert json.load(
        open(os.path.join(root, "round_00003", "MANIFEST.json"))
    )["counts"]["crawl_log"] > 0  # torn dir replaced by a real commit


def test_manifest_counts_consistent(spark, tmp_path):
    root = str(tmp_path / "ck3")
    pages = pages_from_rows(spark, webgen.gen_pages(webgen.SF_UNIT))
    loop = CrawlLoop(spark, make_cfg(), pages, root)
    s = loop.run(max_rounds=4)
    store = loop.store
    for r in range(1, s.rounds + 1):
        man = store.manifest(r)
        assert man["counts"]["seen"] == store.load_seen(r).count()
        assert man["counts"]["frontier"] == store.load_frontier(r).count()
        assert man["counts"]["seen_delta"] >= 0
    # bloom fill ratio recorded (post-commit, in the run's metrics)
    assert all("bloom_fill" in m for m in s.round_metrics)
