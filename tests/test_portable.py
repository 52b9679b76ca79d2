"""Portable hash family: Spark native Columns == DuckDB SQL == pure
Python, bit for bit — the foundation that lets q24/q25/q26 be
oracle-hash-checked instead of rows-only (VERDICT r1 next #6)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from track0s import portable as P

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "café au lait crème brûlée déjà vu encore une fois",
    "a b",  # < 3 words -> empty shingle set
    "",  # empty text
    "x y z w v u t s r q p o n m",
    "dup dup dup dup dup dup",
    # exotic whitespace: \x0B IS a separator (Java \s, now explicit in
    # P.TOKEN_SPLIT on every engine) while NBSP is NOT (stays inside
    # its token on every engine) — pins the RE2-vs-Java \s divergence
    # the explicit class exists to remove
    "alpha\x0bbravo charlie delta echo",
    "caf\xa0au lait cr\xa0me encore une fois",
]
ROWS = [(i, t) for i, t in enumerate(TEXTS)]


def _tokens(t):
    """Engine tokenization: split(trim(text, ' '), P.TOKEN_SPLIT) keeps one
    empty token for empty text (unlike str.split()). trim() removes
    only ASCII spaces, and the split class is the explicit
    P.TOKEN_SPLIT (valid as a Python regex too), so this mirrors the
    engines exactly — including on \\x0B / NBSP text."""
    import re

    return re.split(P.TOKEN_SPLIT, t.strip(" "))


def _py_shingles(t, n=3):
    w = _tokens(t)
    out, seen = [], set()
    for i in range(max(0, len(w) - n + 1)):
        s = " ".join(w[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def test_spark_native_minhash_matches_python(spark):
    from track0_spark.operators.dedup import minhash_native_signatures

    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    got = {
        r["id"]: list(r["sig"])
        for r in minhash_native_signatures(df, "doc_id", "text").collect()
    }
    for i, t in ROWS:
        assert got[i] == P.minhash_sig(_py_shingles(t)), t


def test_spark_native_simhash_matches_python(spark):
    from track0_spark.operators.dedup import simhash_native_expr

    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", simhash_native_expr("text").alias("fp")
        ).collect()
    }
    for i, t in ROWS:
        assert got[i] == P.simhash62(_tokens(t)), t


def test_duckdb_twins_match_python():
    from track0_spark.contract import duck_char_hash, DUCK_PERMS_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in ROWS)
        + ") t(doc_id, text)"
    )
    q = f"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text, ' '), '{P.TOKEN_SPLIT}') AS words FROM docs),
    sh AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [] ELSE
             list_distinct(list_transform(range(1, len(words)-1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END AS shingles FROM w),
    hs AS (SELECT doc_id, list_transform(shingles, s -> {duck_char_hash('s')}) AS hs FROM sh)
    SELECT doc_id, list_transform({DUCK_PERMS_SQL}, p -> CASE WHEN len(hs) = 0
             THEN {P.EMPTY_SIG}::BIGINT
             ELSE list_min(list_transform(hs, x -> (p[1]*x + p[2]) % {P.MOD})) END) AS sig
    FROM hs
    """
    got = {r[0]: r[1] for r in con.execute(q).fetchall()}
    for i, t in ROWS:
        assert got[i] == P.minhash_sig(_py_shingles(t)), t


def test_native_pairs_find_known_neardups(spark):
    from track0_spark.operators.dedup import (
        minhash_native_pairs,
        simhash_native_pairs,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu data spark crawl frontier "
        "page link"
    )
    perturbed = base.replace("kilo", "kilo2")  # simhash hamming == 3
    rows = [
        (0, base),
        (1, perturbed),
        (2, "completely different words entirely unrelated text corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    handles: list = []
    mh = minhash_native_pairs(df, "doc_id", "text", 0.3, handles=handles).collect()
    assert [(r["id_a"], r["id_b"]) for r in mh] == [(0, 1)]
    sh = simhash_near = simhash_native_pairs(
        df, "doc_id", "text", handles=handles
    ).collect()
    got = [(r["id_a"], r["id_b"]) for r in sh]
    assert got == [(0, 1)]
    assert sh[0]["hamming"] == 3  # known-answer distance, portable family
    for h in handles:
        h.unpersist()


def test_simhash_native_pairs_enforces_recall_bound(spark):
    from track0_spark.operators.dedup import simhash_native_pairs

    df = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    with pytest.raises(AssertionError):
        simhash_native_pairs(df, "doc_id", "text", max_hamming=16)


def test_shingle_hash_algebra_matches_string_path(spark):
    """The allocation-free composed-word-scan shingle hashes
    (_shingle_hash_sql) must equal char-hashing the shingle STRINGS —
    including the empty-word edge (leading tab -> '' token, whose
    power term must be the neutral 1, not MUL^1)."""
    from track0_spark.operators.dedup import (
        _shingle_hash_sql,
        _shingle_sql,
        char_hash_sql,
    )

    texts = TEXTS + [
        "\tleading tab yields empty first word",
        " a  b  c ",
        "\x0b\x0bdouble vt prefix x y",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = df.select(
        "doc_id",
        F.expr(_shingle_hash_sql("text")).alias("alg"),
        F.expr(
            f"transform({_shingle_sql('text', 3)}, s -> {char_hash_sql('s')})"
        ).alias("strs"),
    ).collect()
    for r in got:
        # the string path dedups shingles, the algebra path does not;
        # compare as (order-preserving) distinct lists
        alg_distinct = list(dict.fromkeys(r["alg"]))
        assert alg_distinct == list(r["strs"]), texts[r["doc_id"]]


def test_spark_minhash_matches_python_random_sweep(spark):
    """Seeded 200-text sweep of the Spark native signatures vs the pure
    Python reference — same whitespace-and-unicode-heavy alphabet as
    the DuckDB property sweep (test_properties), one batch collect."""
    import random
    import string

    from track0_spark.operators.dedup import minhash_native_signatures

    alpha = (
        string.ascii_letters + string.digits + " \t\n\x0b\x0c\r"
        + "\xa0\x85　éüñß中文🦀"
    )
    rng = random.Random(11)
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["id"]: list(r["sig"])
        for r in minhash_native_signatures(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == P.minhash_sig(_py_shingles(t)), repr(t)
