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


def _run_state(out, state, docs_path, *extra):
    r = subprocess.run(
        [
            sys.executable,
            "jobs/make_corpus.py",
            "--documents",
            str(docs_path),
            "--out",
            str(out),
            "--state",
            str(state),
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
    return r


def test_incremental_append(spark, tmp_path):
    """--state: a second batch dedups against the prior corpus — exact
    overlaps and near-duplicates of PRIOR docs never re-enter, fresh
    docs append, and re-running the same batch is a content-level
    no-op."""
    import os

    from pyspark.sql import functions as F

    from track0_spark.operators.textstats import fingerprint_expr

    docs = spark.read.parquet(DOCS)
    ids = sorted(
        r["doc_id"]
        for r in docs.select("doc_id").collect()
    )
    b1_ids, b2_ids = set(ids[:30]), set(ids[20:])
    b1 = docs.filter(F.col("doc_id").isin(b1_ids))
    p1, p2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    b1.write.parquet(p1)

    out, state = tmp_path / "corpus", tmp_path / "state"
    r1 = _run_state(out, state, p1)
    assert r1.returncode == 0, r1.stderr[-2000:]
    f1 = json.loads(
        [ln for ln in r1.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert f1["funnel"]["kept"] > 0
    assert os.path.exists(
        os.path.join(state, "runs", "000000", "fingerprints", "_SUCCESS")
    )

    # near-dup variants of two long EN docs that SURVIVED run 1 (their
    # signatures are in the prior index): one word appended keeps
    # almost every 3-shingle, so est_jaccard is far above 0.7
    donors = (
        spark.read.parquet(str(out))
        .filter(
            (F.col("lang") == "en")
            & (F.size(F.split(F.trim("text"), r"\s+")) >= 13)
        )
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    assert len(donors) == 2, "fixture needs two long en docs surviving run 1"
    variants = spark.createDataFrame(
        [
            (1_000_000 + i, d["text"] + " extra", d["lang"], d["source"],
             d["n_chars"] + 6)
            for i, d in enumerate(donors)
        ],
        schema=docs.schema,
    )
    b2 = docs.filter(F.col("doc_id").isin(b2_ids)).unionByName(variants)
    b2.write.parquet(p2)

    r2 = _run_state(out, state, p2)
    assert r2.returncode == 0, r2.stderr[-2000:]
    f2 = json.loads(
        [ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert "after_prior_near_dup" in f2["funnel"]
    assert 0 < f2["funnel"]["appended"] < f2["funnel"]["ingested"]
    assert f2["funnel"]["final"] == f1["funnel"]["final"] + f2["funnel"]["appended"]
    corpus = spark.read.parquet(str(out))
    got_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    # the near-dup variants of prior docs were rejected by the prior
    # MinHash index even though nothing in batch 2 duplicates them
    assert not ({1_000_000, 1_000_001} & got_ids)
    # no exact duplicates across the two appends
    n = corpus.count()
    assert (
        corpus.select(fingerprint_expr("text").alias("fp")).distinct().count()
        == n
    )

    # same batch again: every fingerprint already indexed -> no-op
    r3 = _run_state(out, state, p2)
    assert r3.returncode == 0, r3.stderr[-2000:]
    f3 = json.loads(
        [ln for ln in r3.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert f3["funnel"]["appended"] == 0
    assert f3["funnel"]["final"] == f2["funnel"]["final"]


def test_compact_state_invariance(spark, tmp_path):
    """--compact-state merges all run deltas into one base run; dedup
    behavior is invariant (the same batch still appends nothing), the
    old run dirs are gone, and the base holds exactly the corpus's
    fingerprint set."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(DOCS)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    p1 = str(tmp_path / "b1.parquet")
    p2 = str(tmp_path / "b2.parquet")
    docs.filter(F.col("doc_id").isin(set(ids[:25]))).write.parquet(p1)
    docs.filter(F.col("doc_id").isin(set(ids[20:]))).write.parquet(p2)
    out, state = str(tmp_path / "corpus"), str(tmp_path / "state")
    r1 = _run_state(out, state, p1)
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run_state(out, state, p2)
    assert r2.returncode == 0, r2.stderr[-2000:]

    rc = subprocess.run(
        [sys.executable, "jobs/make_corpus.py", "--state", state,
         "--out", out, "--compact-state", "--cores", "4"],
        capture_output=True, text=True, timeout=500,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    res = json.loads(
        [ln for ln in rc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res["compacted_runs"] == 2
    assert res["base_run"].endswith("000002")
    runs = sorted(os.listdir(os.path.join(state, "runs")))
    assert runs == ["000002"]
    # base fingerprint set == the corpus's rows (cross-run dedup made
    # run fingerprints disjoint, so the merge loses nothing)
    assert res["fingerprints"] == spark.read.parquet(out).count()
    assert res["signatures"] > 0

    # same batch against the compacted base: still a content-level no-op
    r3 = _run_state(out, state, p2)
    assert r3.returncode == 0, r3.stderr[-2000:]
    f3 = json.loads(
        [ln for ln in r3.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert f3["funnel"]["appended"] == 0
    # and the post-compaction append numbering cannot collide
    assert f3["state_run"].endswith("000003")


def test_incremental_torn_state_fails_loudly(spark, tmp_path):
    """A state run dir without its fingerprints _SUCCESS marker (crash
    mid-append) must abort the next run, not silently re-admit."""
    import os

    out, state = tmp_path / "c", tmp_path / "s"
    r1 = _run_state(out, state, DOCS, "--no-near-dup")
    assert r1.returncode == 0, r1.stderr[-2000:]
    os.remove(
        os.path.join(state, "runs", "000000", "fingerprints", "_SUCCESS")
    )
    r2 = _run_state(out, state, DOCS, "--no-near-dup")
    assert r2.returncode != 0
    assert "torn" in r2.stderr


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
