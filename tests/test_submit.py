"""Packaging acceptance (BASELINE.json:6 "ships via spark-submit
--py-files"): build dist/track0s.zip, copy the entry script to an
EMPTY directory (so the repo itself cannot be imported), and run the
crawl through real spark-submit — every package import must resolve
from the zip, and the output must match the in-repo oracle prefix."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_zip(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_dist.py")],
        check=True,
        capture_output=True,
        cwd=ROOT,
    )
    jobs = tmp_path / "jobs"
    jobs.mkdir()
    shutil.copy(os.path.join(ROOT, "jobs", "crawl.py"), jobs / "crawl.py")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            os.path.join(ROOT, "dist", "track0s.zip"),
            str(jobs / "crawl.py"),
            "--profile",
            "sf-unit",
            "--rounds",
            "3",
        ],
        cwd=str(tmp_path),  # neutral cwd: no repo on any import path
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.splitlines()[0])
    # the zip-imported engine reproduces the oracle prefix exactly
    from datagen import webgen
    from reference_impl.spider import OracleSpider
    from track0s.config import CrawlConfig
    from track0s.robots import RobotsTable

    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS,
        follow="+original-domain -depth>3 +requisite",
        robots=robots,
        max_rounds=3,
    )
    olog = OracleSpider(
        cfg, webgen.store_from_rows(webgen.gen_pages(webgen.SF_UNIT))
    ).run()
    assert summary["fetched"] == len(olog)
    assert summary["rounds"] == 3
