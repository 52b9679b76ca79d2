"""Composed archive→training-corpus CLI (jobs/make_corpus.py).

Every stage's math is oracle-checked elsewhere (q15/q17/q23/q24/q32/
q37/q39); here the bar is the COMPOSITION: the funnel is monotone,
deterministic across runs, and each stage's contract holds on the
output (no exact dups, langs respected, benchmark grams gone)."""

import json
import subprocess
import sys

import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(out, *extra):
    r = subprocess.run(
        [
            sys.executable,
            "jobs/make_corpus.py",
            "--documents",
            DOCS,
            "--out",
            str(out),
            "--langs",
            "en",
            "de",
            "fr",
            "--min-tokens",
            "5",
            "--cores",
            "4",
            *extra,
        ],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus") / "c1"
    return str(out), _run(out)


def test_funnel_monotone_and_complete(corpus):
    _, res = corpus
    f = res["funnel"]
    order = [
        "ingested",
        "after_length",
        "after_language",
        "after_exact_dedup",
        "after_near_dup",
        "final",
    ]
    vals = [f[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert f["final"] > 0 and f["final_val"] < f["final"]


def test_deterministic_rerun(corpus, tmp_path):
    _, res1 = corpus
    res2 = _run(tmp_path / "c2")
    assert res1["funnel"] == res2["funnel"]


def test_output_contracts(spark, corpus):
    from pyspark.sql import functions as F

    from track0_spark.operators.textstats import fingerprint_expr

    out, res = corpus
    df = spark.read.parquet(out)
    assert df.count() == res["funnel"]["final"]
    assert set(
        r["lang"] for r in df.select("lang").distinct().collect()
    ) <= {"en", "de", "fr"}
    assert set(
        r["split"] for r in df.select("split").distinct().collect()
    ) == {"train", "val"}
    # exact-dedup contract: distinct fingerprints == rows
    n_fp = (
        df.select(fingerprint_expr("text").alias("fp")).distinct().count()
    )
    assert n_fp == res["funnel"]["final"]


def test_decontamination_drops_benchmark_docs(spark, tmp_path):
    """A benchmark slice made of corpus texts must be fully removed."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(DOCS)
    # pick long docs so they certainly carry a 13-gram
    bench = (
        docs.filter(F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= 13)
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id", "text")
    )
    bpath = str(tmp_path / "bench.parquet")
    bench.write.parquet(bpath)
    bench_ids = {r["doc_id"] for r in bench.collect()}

    res = _run(tmp_path / "c3", "--benchmark", bpath, "--no-near-dup")
    assert "after_decontamination" in res["funnel"]
    out_df = spark.read.parquet(str(tmp_path / "c3"))
    got_ids = {r["doc_id"] for r in out_df.select("doc_id").collect()}
    assert not (bench_ids & got_ids)
