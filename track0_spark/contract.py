"""Driver-contract queries: every SURVEY.md §2 operator class demoed on
the /root/testdata tables, each with a DuckDB ANSI-SQL oracle twin.

Each entry maps a crawl-engine operator (or training-data pipeline op)
onto the TPC-H-ish contract tables per FIXTURES.md §1's mapping: the
seen anti-join becomes an events anti-join, the per-host politeness
top-k becomes a per-user top-k, rule glob filters become documents
filters, the compiled rule pipeline runs against document attributes,
metrics aggregation runs on lineitem, and the training-data ops
(exact-dup fingerprinting, shingling, n-gram Jaccard near-dup pairs,
brute-force cosine ANN, token/quality stats) run on documents and
embeddings.

Conventions (the driver hash-compares): every computed column is
aliased identically in DataFrame and SQL; integer aggregates are cast
to BIGINT on both sides; float similarity scores are rounded to 4
decimals on both sides before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from track0s import portable as _P
from track0s.rules import parse_pipeline
from .functions.rules_compile import compile_rules


def T(
    spark: SparkSession, sf_dir: str, name: str, floor: bool = False
) -> DataFrame:
    """Scan, with an OPT-IN parallelism floor (VERDICT r3 #5 / r4 #1+#5).

    The small single-file test tables arrive as ONE split, which
    serializes every pre-shuffle stage — minhash signatures, gram
    explodes, hyperplane sketches — on a single core (measured: q37's
    gram explode alone was 3.7s single-split vs 0.9s spread). When
    ``floor=True`` the raw rows are round-robined only if the scan
    yields fewer splits than cores; at 100 TB the scan itself has
    thousands of splits and the condition never fires, so no exchange
    is added where it would actually cost.

    ``floor`` defaults to OFF because round 4 applied it universally
    and paid twice (VERDICT r4 "What's wrong" #1, "Next round" #1/#5):
    the added exchange changed float-sum accumulation order, breaking
    q01/q05's bit-exact hash parity with the single-threaded DuckDB
    oracle, and it taxed 18 sub-second queries ~0.3-0.7s each for a
    spread only the heavy per-row-compute stages need. Only queries
    with a pre-shuffle Python/explode/signature stage opt in."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if not floor:
        return df
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


# --------------------------------------------------------------------------
# crawl-operator analogs on contract tables
# --------------------------------------------------------------------------


def q01_agg_metrics(spark, sf):
    """A1 metrics aggregation — hash agg with partial+final (TPC-H Q1 shape)."""
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       avg(l_discount) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q02_topk_per_key(spark, sf):
    """P1 per-host priority queue analog: top-3 per user by (value, id)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        T(spark, sf, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "value", "rk")
    )


Q02_SQL = """
SELECT user_id, event_id, value, rk FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INT) AS rk
  FROM events) t WHERE rk <= 3
"""


def q03_anti_join_seen(spark, sf):
    """D2 seen anti-join analog: events of users with no 'purchase'."""
    ev = T(spark, sf, "events")
    purchasers = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return (
        ev.join(purchasers, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


Q03_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                    AND p.value > 150)
GROUP BY user_id
"""


def q04_left_join_miss(spark, sf):
    """S2 fetch-miss analog: left join keeps customers with zero orders."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )


Q04_SQL = """
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q05_broadcast_join_rev(spark, sf):
    """Broadcast dim join (robots/seeds pattern): revenue per segment."""
    c = F.broadcast(T(spark, sf, "customer").select("c_custkey", "c_mktsegment"))
    o = T(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )


Q05_SQL = """
SELECT c_mktsegment, sum(o_totalprice) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q06_glob_filter(spark, sf):
    """R6 url-glob rule test: compiled glob -> rlike, vs SQL LIKE."""
    from track0s.rules import glob_to_regex

    return (
        T(spark, sf, "documents", floor=True)
        .filter(F.col("text").rlike(glob_to_regex("*spark*join*")))
        .select("doc_id", "lang", "n_chars")
    )


Q06_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE text LIKE '%spark%join%'
"""


def q07_rule_pipeline(spark, sf):
    """R12 the compiled ordered rule pipeline itself, vs handwritten
    CASE WHEN (last-match-wins == first-match of the reversed chain)."""
    rules = parse_pipeline("+domain=src1* -depth>300 +url=*spark*")
    d = T(spark, sf, "documents", floor=True).select(
        "doc_id",
        F.col("source").alias("host"),
        F.col("n_chars").cast("int").alias("depth"),
        F.col("text").alias("url_canon"),
    )
    col = compile_rules(rules, False, [], [])
    return d.select("doc_id", col.alias("decision"))


Q07_SQL = """
SELECT doc_id,
       CASE WHEN text LIKE '%spark%' THEN TRUE
            WHEN n_chars > 300 THEN FALSE
            WHEN source LIKE 'src1%' THEN TRUE
            ELSE FALSE END AS decision
FROM documents
"""


def q08_url_parse(spark, sf):
    """U4 host/path extraction via native parse_url."""
    d = T(spark, sf, "documents", floor=True).withColumn(
        "url", F.concat(F.lit("http://"), "source", F.lit(".example.test/d/"), "doc_id")
    )
    return d.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
    )


Q08_SQL = """
SELECT doc_id,
       regexp_extract('http://' || source || '.example.test/d/' || doc_id,
                      'http://([^/]+)', 1) AS host,
       '/d/' || doc_id AS path
FROM documents
"""


def q09_json_scalar(spark, sf):
    """JSON scalar extraction (events.props)."""
    return (
        T(spark, sf, "events", floor=True)
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.avg("k").alias("avg_k"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


Q09_SQL = """
SELECT event_type, avg(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


def q10_union_distinct(spark, sf):
    """D4/set-ops analog: union of overlapping slices, exact dedup."""
    ev = T(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    a = ev.filter(F.col("value") > 150)
    b = ev.filter(F.col("user_id") < 100)
    return a.unionByName(b).distinct()


Q10_SQL = """
SELECT event_id, user_id, event_type, value FROM events WHERE value > 150
UNION
SELECT event_id, user_id, event_type, value FROM events WHERE user_id < 100
"""


def q11_first_per_type(spark, sf):
    """P5 deterministic sequencing analog: first 3 events per type by time."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        T(spark, sf, "events")
        .withColumn("seq", F.row_number().over(w))
        .filter(F.col("seq") <= 3)
        .select("event_type", "event_id", "seq")
    )


Q11_SQL = """
SELECT event_type, event_id, seq FROM (
  SELECT event_type, event_id,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS INT) AS seq
  FROM events) t WHERE seq <= 3
"""


def q12_distinct_cardinality(spark, sf):
    """A2 cardinality tracking (exact, both backends)."""
    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


Q12_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def q13_multi_join(spark, sf):
    """Catalyst multi-join reordering: revenue per nation in one region."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )


Q13_SQL = """
SELECT n_name, sum(o_totalprice) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' GROUP BY n_name
"""


def q14_date_pushdown(spark, sf):
    """Predicate pushdown to the scan: one quarter of orders."""
    return (
        T(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-04-01"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
    )


Q14_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, sum(o_totalprice) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# training-data pipeline ops (documents / embeddings)
# --------------------------------------------------------------------------


def q15_dedup_exact(spark, sf):
    """Exact dedup via content fingerprint (hash-groupBy, keep-min)."""
    return (
        T(spark, sf, "documents")
        .groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").alias("keeper"),
        )
    )


Q15_SQL = """
SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS n_dups, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


def q16_token_count(spark, sf):
    """Token counting (whitespace tokenizer), pure native split."""
    return T(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), _P.TOKEN_SPLIT)).cast("bigint").alias("n_tokens"),
    )


Q16_SQL = """
SELECT doc_id, CAST(len(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tokens
FROM documents
"""


def q17_text_quality(spark, sf):
    """Quality scoring: token stats per doc (length ratios, rounded)."""
    d = T(spark, sf, "documents").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), _P.TOKEN_SPLIT))
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", _P.WS_CLASS, "")) / F.col("n_tokens"), 4
        ).alias("avg_token_len"),
    )


Q17_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tokens,
       round(CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
             / len(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+')), 4) AS avg_token_len
FROM documents
"""


def q18_lang_stats(spark, sf):
    """Per-language corpus stats (language-distribution profiling)."""
    return (
        T(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
        )
    )


Q18_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, avg(n_chars) AS avg_chars
FROM documents GROUP BY lang
"""


_SHINGLE_EXPR = (
    "transform(sequence(0, size(words) - 3),"
    " i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"
)


def q19_shingles(spark, sf):
    """Word-3-gram shingling (the MinHash front end): distinct-shingle
    counts per doc, all native array functions."""
    d = (
        T(spark, sf, "documents", floor=True)
        .withColumn("words", F.split(F.trim("text"), _P.TOKEN_SPLIT))
        .filter(F.size("words") >= 3)
        .withColumn("shingles", F.expr(_SHINGLE_EXPR))
    )
    return d.select(
        "doc_id",
        F.size("shingles").cast("bigint").alias("n_shingles"),
        F.size(F.array_distinct("shingles")).cast("bigint").alias("n_distinct"),
    )


Q19_SQL = """
WITH w AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+') AS words FROM documents),
s AS (SELECT doc_id,
             list_transform(range(1, len(words) - 1),
                            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS shingles
      FROM w WHERE len(words) >= 3)
SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
       CAST(len(list_distinct(shingles)) AS BIGINT) AS n_distinct
FROM s
"""


def q20_jaccard_pairs(spark, sf):
    """N-gram Jaccard near-dup candidate pairs — the EXACT all-pairs
    verification baseline (q24's banded LSH is the scale path). Exact
    all-pairs is only ever sane on a bounded slice, so the bound is part
    of the operator: the first 200 doc_ids of the zh slice — O(200^2)
    work at ANY table size (the cap doesn't bind at sf0.01, where the
    zh slice has 75 docs)."""
    d = (
        T(spark, sf, "documents", floor=True)
        .filter(F.col("lang") == "zh")
        .orderBy("doc_id")
        .limit(200)
        .withColumn("words", F.split(F.trim("text"), _P.TOKEN_SPLIT))
        .filter(F.size("words") >= 3)
        .withColumn("sh", F.array_distinct(F.expr(_SHINGLE_EXPR)))
        .select("doc_id", "sh")
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    jac = pairs.withColumn(
        "jaccard",
        F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            4,
        ),
    )
    return jac.filter(F.col("jaccard") >= 0.01).select("id_a", "id_b", "jaccard")


Q20_SQL = """
WITH d AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+') AS words
        FROM (SELECT doc_id, text FROM documents WHERE lang = 'zh'
              ORDER BY doc_id LIMIT 200))
  WHERE len(words) >= 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.01
"""

_QVEC = [1.0 if i % 2 == 0 else 0.5 for i in range(64)]


def _cosine_col(emb_col: str) -> F.Column:
    qarr = F.array(*[F.lit(v) for v in _QVEC])
    emb = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(emb, qarr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nb = F.sqrt(F.lit(sum(v * v for v in _QVEC)))
    return dot / (na * nb)


def q21_ann_cosine(spark, sf):
    """Brute-force cosine top-k ANN over embeddings (native fold — no
    UDF; the IVF/LSH-bucketed variant is the scale path)."""
    e = T(spark, sf, "embeddings", floor=True)
    return (
        e.select("vec_id", F.round(_cosine_col("embedding"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


_QVEC_SQL = "[" + ", ".join(str(v) for v in _QVEC) + "]"

# embedding is FLOAT[] in the parquet; without the DOUBLE[] cast DuckDB
# computes (and rounds) in float32 while the Spark twin casts each
# element to double first — the widened float32 of round(x, 4) then
# differs from the double in the low bits (caught by the repr-grade
# local gate, VERDICT r4 #2; invisible to the old %.6g comparison).
Q21_SQL = f"""
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST({_QVEC_SQL} AS DOUBLE[])), 4) AS sim
FROM embeddings ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


def q22_embedding_norms(spark, sf):
    """Vector norm profiling per label (embedding hygiene check)."""
    e = T(spark, sf, "embeddings", floor=True)
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return (
        e.withColumn("norm", norm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


Q22_SQL = """
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(sqrt(list_dot_product(embedding, embedding))), 4) AS avg_norm
FROM embeddings GROUP BY label
"""


def q23_langid(spark, sf):
    """Heuristic language-ID (stopword-hit argmax), fully native Columns
    — SQL twin reproduces the same scores and tie-break order."""
    from .operators.textstats import langid_scores

    return langid_scores(T(spark, sf, "documents", floor=True), "text").select(
        "doc_id", "lang_pred", F.round("score_en", 4).alias("score_en")
    )


def _langid_sql() -> str:
    from .operators.textstats import STOPWORDS

    score_defs = []
    for lang, words in STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        score_defs.append(
            f"CAST(len(list_intersect(list_distinct("
            f"string_split_regex(trim(lower(text), ' '), '[ \\t\\n\\x0B\\f\\r]+')), {arr})) AS DOUBLE)"
            f" / {len(words)} AS score_{lang}"
        )
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{l} = {best} AND {best} > 0 THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return (
        "SELECT doc_id, " + case + " AS lang_pred, round(score_en, 4) AS score_en "
        "FROM (SELECT doc_id, text, " + ", ".join(score_defs) + " FROM documents)"
    )


Q23_SQL = _langid_sql()


# --- portable-hash oracle twins (q24-q27): the seeded constants are
# --- inlined as SQL literals, so DuckDB evaluates the SAME hash family
# --- bit-for-bit (track0s/portable.py; tests/test_portable.py)
#
# Twin-equivalence bounds (property-tested, tests/test_properties.py):
# tokenization, trim, char folds, and all hash arithmetic are
# bit-identical across Spark / DuckDB / Python on arbitrary text
# including exotic whitespace and astral codepoints. The ONE known
# exception is lower() on codepoints whose FULL Unicode lowercase
# differs from the SIMPLE mapping — in practice U+0130 'İ' (Turkish
# capital dotted I): Spark/Python produce 'i'+U+0307, DuckDB produces
# 'i'. Queries that lower() before tokenizing/hashing (q23/q26/q30/
# q33) therefore match their SQL twins on all text without U+0130; the
# ENGINE
# behavior (full Unicode casing) is the production semantic, and
# neither engine exposes the other's mapping without a UDF. Pinned in
# test_properties.py::test_lower_simple_vs_full_divergence_bound.

DUCK_PERMS_SQL = (
    "[" + ", ".join(f"[{a}::BIGINT, {b}::BIGINT]" for a, b in _P.PERMS) + "]"
)


def duck_char_hash(var: str, mul: int = _P.CHAR_MUL, bias: int = 0) -> str:
    """DuckDB fragment: the portable char-fold hash of string ``var``
    (unicode('') is -1 in DuckDB vs ascii('')=0 in Spark — the CASE
    guard pins the empty-char edge to 0 on both engines)."""
    plus = f" + {bias}" if bias else ""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({var}, ''), "
        f"c -> CAST(CASE WHEN c = '' THEN 0 ELSE unicode(c) END AS BIGINT))), "
        f"(a, c) -> (a * {mul} + c{plus}) % {_P.MOD})"
    )


#: persisted signature DFs from the LAST q24/q25 call, unpersisted on
#: the next call — bounds cache growth when one session sweeps all
#: queries repeatedly (bench/check_contract), since a query fn returns
#: a plan and cannot unpersist after its own materialization.
_SIG_HANDLES: list = []


def _rotate_handles(new: list) -> None:
    while _SIG_HANDLES:
        _SIG_HANDLES.pop().unpersist()
    _SIG_HANDLES.extend(new)


def q24_minhash_lsh_pairs(spark, sf):
    """MinHash+LSH near-dup pairs on documents — portable hash family,
    fully native Columns (zero Python), oracle-hash-checked."""
    from .operators.dedup import minhash_native_pairs

    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    handles: list = []
    out = minhash_native_pairs(
        d, "doc_id", "text", threshold=0.35, handles=handles
    ).select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    _rotate_handles(handles)
    return out


def _q24_sql() -> str:
    band_exprs = []
    for b in range(_P.NUM_BANDS):
        acc = "CAST(0 AS BIGINT)"
        for r in range(_P.ROWS_PER_BAND):
            acc = f"((({acc}) * {_P.BAND_MUL} + sig[{b * _P.ROWS_PER_BAND + r + 1}]) % {_P.MOD})"
        band_exprs.append(acc)
    bands = "[" + ", ".join(band_exprs) + "]"
    return f"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+') AS words FROM documents),
shg AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [] ELSE
         list_distinct(list_transform(range(1, len(words) - 1),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END AS shingles FROM w),
hs AS (SELECT doc_id, list_transform(shingles, s -> {duck_char_hash('s')}) AS hs FROM shg),
sig AS (SELECT doc_id, list_transform({DUCK_PERMS_SQL}, p ->
         CASE WHEN len(hs) = 0 THEN {_P.EMPTY_SIG}::BIGINT
              ELSE list_min(list_transform(hs, x -> (p[1]*x + p[2]) % {_P.MOD})) END) AS sig
       FROM hs),
banded AS (SELECT doc_id, i - 1 AS band, ({bands})[i] AS key
           FROM sig, range(1, {_P.NUM_BANDS + 1}) t(i)
           WHERE sig[1] <> {_P.EMPTY_SIG}),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
                                     AND a.doc_id < b.doc_id),
est AS (SELECT id_a, id_b,
          CAST(len(list_filter(range(1, {_P.NUM_PERM + 1}),
               i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / {_P.NUM_PERM} AS est_jaccard
        FROM pairs JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
SELECT id_a, id_b, round(est_jaccard, 4) AS est_jaccard
FROM est WHERE est_jaccard >= 0.35
"""


Q24_SQL = _q24_sql()


def q25_simhash_near_pairs(spark, sf):
    """Portable SimHash banded-Hamming near-dup pairs, max_hamming=3
    (the 4x16 banding's guaranteed-recall bound) — oracle-hash-checked."""
    from .operators.dedup import simhash_native_pairs

    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    handles: list = []
    out = simhash_native_pairs(d, "doc_id", "text", max_hamming=3, handles=handles)
    _rotate_handles(handles)
    return out


def _q25_sql() -> str:
    th62 = f"({duck_char_hash('t')}) + (({duck_char_hash('t', _P.CHAR_MUL2, 1)}) << 31)"
    return f"""
WITH tok AS (
  SELECT doc_id, len(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+')) AS n,
         unnest(list_transform(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0B\\f\\r]+'),
                t -> {th62})) AS h
  FROM documents),
bits AS (SELECT doc_id, i, any_value(n) AS n, sum((h >> i) & 1) AS ones
         FROM tok, range(0, {_P.SIMHASH_BITS}) t(i) GROUP BY doc_id, i),
fp AS (SELECT doc_id, CAST(sum(CASE WHEN 2 * ones > n THEN (1::BIGINT << i)
                                    ELSE 0 END) AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id),
banded AS (SELECT doc_id, simhash, i AS band, (simhash >> (16 * i)) & 65535 AS key
           FROM fp, range(0, 4) t(i)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.simhash AS sh_a, b.simhash AS sh_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
                                    AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


Q25_SQL = _q25_sql()


def q26_fingerprint(spark, sf):
    """Rolling polynomial document fingerprint (portable char-fold token
    hashes — oracle-hash-checked; partition-invariant pure fold)."""
    from .operators.textstats import fingerprint_expr

    return T(spark, sf, "documents", floor=True).select(
        "doc_id", fingerprint_expr("text").alias("fp")
    )


def _q26_sql() -> str:
    from .operators.textstats import FP_MOD, FP_MUL

    return f"""
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(string_split_regex(trim(lower(text), ' '), '[ \\t\\n\\x0B\\f\\r]+'),
                   t -> {duck_char_hash('t')})),
    (acc, t) -> (acc * {FP_MUL} + t) % {FP_MOD}) AS fp
FROM documents
"""


Q26_SQL = _q26_sql()


def q27_ann_lsh(spark, sf):
    """LSH-bucketed approximate top-k cosine — native sequential-fold
    bucket signatures (bit-equal across engines) make the probe
    oracle-hash-checkable; brute-force q21 is the exact baseline."""
    from .operators.similarity import ann_topk_lsh_arrow

    e = T(spark, sf, "embeddings", floor=True)
    return ann_topk_lsh_arrow(
        e, "vec_id", "embedding", _QVEC, dim=64, planes=10, radius=2, k=10
    ).select("vec_id", F.round("score", 4).alias("score"))


def _q27_sql() -> str:
    from .operators.similarity import _hyperplanes, query_buckets

    H = _hyperplanes(64, 10)
    probe = query_buckets(_QVEC, 64, 10, radius=2)
    plane_dots = []
    for p in range(10):
        row = "[" + ", ".join(repr(float(v)) for v in H[p]) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({row})[i])), (a, x) -> a + x)"
        )
        plane_dots.append(
            f"CASE WHEN ({dot}) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    bucket = " + ".join(plane_dots)
    probe_sql = ", ".join(str(x) for x in probe)
    qnorm = repr(float(sum(v * v for v in _QVEC) ** 0.5))
    qdot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, 65), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({_QVEC_SQL})[i])), (a, x) -> a + x)"
    )
    vnorm = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), "
        "(a, x) -> a + x))"
    )
    # order by the UNROUNDED score (matching Spark's brute_force_topk,
    # which ranks raw and rounds afterwards) — ordering by the rounded
    # alias could pick a different top-k set on sub-1e-4 ties
    return f"""
WITH b AS (SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings),
r AS (SELECT vec_id, ({qdot}) / (({vnorm}) * {qnorm}) AS raw
      FROM b WHERE bucket IN ({probe_sql}))
SELECT vec_id, round(raw, 4) AS score
FROM (SELECT vec_id, raw FROM r ORDER BY raw DESC, vec_id ASC LIMIT 10) t
"""


Q27_SQL = _q27_sql()


def q28_revisit_merge(spark, sf):
    """S4 mirror update / revisit: conditional-refetch MERGE keyed by
    url_canon (warc_ts analog = version int, etag analog = md5). The
    'old mirror' and 'current web' are deterministic derivations of
    documents, so the DuckDB twin replays the identical MERGE."""
    from .operators.revisit import revisit_merge

    d = T(spark, sf, "documents")
    old_body = F.when(
        F.col("doc_id") % 5 == 0, F.substring("text", 1, 50)
    ).otherwise(F.col("text"))
    old_ts = (
        F.when((F.col("doc_id") % 5 == 0) | (F.col("doc_id") % 3 == 0), 100)
        .otherwise(200)
        .cast("long")
    )
    saved = d.filter(F.col("doc_id") % 7 != 0).select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias(
            "url_canon"
        ),
        F.encode(old_body, "utf-8").alias("html"),
        F.md5(F.encode(old_body, "utf-8")).alias("etag"),
        old_ts.alias("last_modified"),
    )
    new_ts = (
        F.when((F.col("doc_id") % 5 == 0) | (F.col("doc_id") % 3 == 0), 300)
        .otherwise(200)
        .cast("long")
    )
    pages_now = d.filter(F.col("doc_id") % 11 != 3).select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.encode("text", "utf-8").alias("html"),
        new_ts.alias("warc_ts"),
    )
    return revisit_merge(saved, pages_now).select(
        "url_canon", "refetch_status", "etag", "last_modified"
    )


Q28_SQL = """
WITH saved AS (
  SELECT 'doc://' || doc_id AS url_canon,
         CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 50) ELSE text END AS body,
         CAST(CASE WHEN doc_id % 5 = 0 OR doc_id % 3 = 0 THEN 100 ELSE 200 END AS BIGINT) AS lm
  FROM documents WHERE doc_id % 7 <> 0),
pages AS (
  SELECT 'doc://' || doc_id AS url_canon, text AS new_body,
         CAST(CASE WHEN doc_id % 5 = 0 OR doc_id % 3 = 0 THEN 300 ELSE 200 END AS BIGINT) AS new_ts
  FROM documents WHERE doc_id % 11 <> 3),
j AS (SELECT s.url_canon, s.body, s.lm, p.new_body, p.new_ts
      FROM saved s LEFT JOIN pages p USING (url_canon)),
m AS (SELECT *,
        CASE WHEN new_body IS NULL THEN 'gone'
             WHEN new_ts <= lm THEN 'unchanged'
             WHEN md5(new_body) = md5(body) THEN 'validated'
             ELSE 'modified' END AS refetch_status
      FROM j)
SELECT url_canon, refetch_status,
       CASE WHEN refetch_status = 'modified' THEN md5(new_body) ELSE md5(body) END AS etag,
       CASE WHEN refetch_status IN ('modified', 'validated') THEN new_ts ELSE lm END AS last_modified
FROM m
"""


def q29_cosine_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs: banded 12-plane hyperplane LSH
    candidates + exact sequential-fold cosine re-rank (never all-pairs;
    precision exact, recall is the LSH OR-amplification curve). The
    identical hyperplanes + fold order make it oracle-hash-checkable."""
    from .operators.similarity import cosine_near_dup_pairs

    e = T(spark, sf, "embeddings", floor=True)
    handles: list = []
    out = cosine_near_dup_pairs(
        e, "vec_id", "embedding", dim=64, planes=12, band_bits=4,
        threshold=0.35, handles=handles,
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    _rotate_handles(handles)
    return out


def _q29_sql() -> str:
    from .operators.similarity import _hyperplanes

    H = _hyperplanes(64, 12)
    plane_dots = []
    for p in range(12):
        row = "[" + ", ".join(repr(float(v)) for v in H[p]) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({row})[i])), (a, x) -> a + x)"
        )
        plane_dots.append(
            f"CASE WHEN ({dot}) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    bucket = " + ".join(plane_dots)
    return f"""
WITH s AS (SELECT vec_id, embedding, ({bucket}) AS bucket,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
               (a, x) -> a + x)) AS nrm
           FROM embeddings),
banded AS (SELECT vec_id, i AS band, (bucket >> (4 * i)) & 15 AS key
           FROM s, range(0, 3) t(i)),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
                                    AND a.vec_id < b.vec_id),
scored AS (SELECT id_a, id_b,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65),
                 i -> CAST(sa.embedding[i] AS DOUBLE) * CAST(sb.embedding[i] AS DOUBLE))),
               (a, x) -> a + x) / (sa.nrm * sb.nrm) AS cosine
           FROM cand JOIN s sa ON sa.vec_id = id_a JOIN s sb ON sb.vec_id = id_b)
SELECT id_a, id_b, round(cosine, 4) AS cosine FROM scored WHERE cosine >= 0.35
"""


Q29_SQL = _q29_sql()


def q30_clean_pipeline(spark, sf):
    """Composite training-data cleaning pipeline: token-count band
    filter -> exact dedup by portable fingerprint (min doc_id wins,
    hash-agg + join-back, no sort) -> per-lang corpus stats. Shows the
    operators composing end-to-end the way a real cleaning job chains
    them; every stage stays whole-stage-codegen (zero Python)."""
    from .operators.textstats import fingerprint_kernel

    # one JVM tokenize (lower+trim+split), native size() filter, then
    # the vectorized fingerprint kernel (r6 — the per-char interpreted
    # fold was this query's dominant cost; bit parity pinned in
    # tests/test_training_ops.py)
    d = (
        T(spark, sf, "documents", floor=True)
        .select(
            F.col("doc_id").alias("id"),
            "lang",
            F.expr(
                f"split(trim(lower(text)), '{_P.TOKEN_SPLIT_SPARK_LIT}')"
            ).alias("_w"),
        )
        .filter((F.size("_w") >= 20) & (F.size("_w") <= 80))
    )
    q = d.mapInPandas(
        fingerprint_kernel("_w", ("lang",)),
        "id long, lang string, n_tokens bigint, fp bigint",
    ).select(F.col("id").alias("doc_id"), "lang", "n_tokens", "fp")
    keep = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = q.join(keep, ["fp", "doc_id"])
    return kept.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("kept_docs"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        F.round(F.sum("n_tokens") / F.count("*"), 4).alias("avg_tokens"),
    )


def _q30_sql() -> str:
    from .operators.textstats import FP_MOD, FP_MUL

    fp = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex(trim(lower(text), ' '), '[ \\t\\n\\x0B\\f\\r]+'), "
        f"t -> {duck_char_hash('t')})), "
        f"(acc, t) -> (acc * {FP_MUL} + t) % {FP_MOD})"
    )
    return f"""
WITH q AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(lower(text), ' '), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
           AS n_tokens,
         {fp} AS fp
  FROM documents),
f AS (SELECT * FROM q WHERE n_tokens BETWEEN 20 AND 80),
keep AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp),
k AS (SELECT f.* FROM f JOIN keep USING (fp, doc_id))
SELECT lang, CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS avg_tokens
FROM k GROUP BY lang
"""


Q30_SQL = _q30_sql()


def q31_ann_ivf(spark, sf):
    """IVF-flat approximate top-k cosine (the second scale path next to
    q27's LSH): frozen seeded codebook, native argmin cell assignment,
    nprobe=4 probed cells, exact cosine inside them. Sequential folds +
    first-min tie-break make the assignment oracle-hash-checkable."""
    from .operators.similarity import ivf_topk_arrow

    e = T(spark, sf, "embeddings", floor=True)
    return ivf_topk_arrow(
        e, "vec_id", "embedding", _QVEC, dim=64, cells=16, nprobe=4, k=10
    ).select("vec_id", F.round("score", 4).alias("score"))


def _q31_sql() -> str:
    from .operators.similarity import (
        _centroid_norms,
        ivf_centroids,
        query_cells,
    )

    C = ivf_centroids(64, 16)
    norms = _centroid_norms(C)
    dists = []
    for c in range(16):
        row = "[" + ", ".join(repr(float(v)) for v in C[c]) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({row})[i])), (a, x) -> a + x)"
        )
        dists.append(f"(-2.0 * ({dot}) + {norms[c]!r})")
    dist_list = "[" + ", ".join(dists) + "]"
    probe = ", ".join(str(c) for c in query_cells(_QVEC, 64, 16, nprobe=4))
    qnorm = repr(float(sum(v * v for v in _QVEC) ** 0.5))
    qdot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, 65), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({_QVEC_SQL})[i])), (a, x) -> a + x)"
    )
    vnorm = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), "
        "(a, x) -> a + x))"
    )
    # unrounded ranking for the same reason as _q27_sql
    return f"""
WITH d AS (SELECT vec_id, embedding, {dist_list} AS dl FROM embeddings),
c AS (SELECT vec_id, embedding, list_position(dl, list_min(dl)) AS cell FROM d),
r AS (SELECT vec_id, ({qdot}) / (({vnorm}) * {qnorm}) AS raw
      FROM c WHERE cell IN ({probe}))
SELECT vec_id, round(raw, 4) AS score
FROM (SELECT vec_id, raw FROM r ORDER BY raw DESC, vec_id ASC LIMIT 10) t
"""


Q31_SQL = _q31_sql()


def q32_stratified_split(spark, sf):
    """Deterministic train/val/test corpus split — the portable
    char-fold hash of doc_id buckets every document into 100 cells, so
    the split is a pure function of the id: stable under reshuffling,
    resumes, and cluster-size changes (sampling state or
    partition-dependent rand() would not be). 90/5/5; per-(lang,
    split) counts verify the assignment end to end. 100 TB shape: one
    narrow hash agg, no window, no extra shuffle beyond the count."""
    from .operators.dedup import char_hash_sql

    d = T(spark, sf, "documents").withColumn(
        "bucket",
        F.expr(f"{char_hash_sql('CAST(doc_id AS STRING)')} % 100"),
    )
    split = (
        F.when(F.col("bucket") < 90, F.lit("train"))
        .when(F.col("bucket") < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


def _q32_sql() -> str:
    return f"""
SELECT lang,
       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END
         AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM (SELECT lang, n_chars,
             {duck_char_hash("CAST(doc_id AS VARCHAR)")} % 100 AS b
      FROM documents)
GROUP BY lang, split
"""


Q32_SQL = _q32_sql()


def q33_top_terms_per_lang(spark, sf):
    """Corpus vocabulary profile: top-5 tokens per language by
    (count desc, token asc) — tokenize -> explode -> hash agg on
    (lang, token) -> per-lang top-k window over the aggregated rows
    (the window input is |vocab| rows, not |corpus| tokens, so the
    sort is bounded — same shape as the per-host politeness top-k)."""
    from .operators.textstats import tokens_expr

    toks = (
        T(spark, sf, "documents", floor=True)
        .select("lang", F.explode(tokens_expr("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        toks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "token", "n", "rk")
    )


Q33_SQL = """
WITH t AS (
  SELECT lang, unnest(string_split_regex(trim(lower(text), ' '),
                                         '[ \\t\\n\\x0B\\f\\r]+')) AS token
  FROM documents),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
      FROM t WHERE token <> '' GROUP BY lang, token)
SELECT lang, token, n, rk FROM (
  SELECT lang, token, n,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n DESC, token ASC) AS INT) AS rk
  FROM c) q WHERE rk <= 5
"""


def q35_length_percentiles(spark, sf):
    """Exact per-language doc-length distribution: n_docs, min/max,
    and the exact lower median — the rank floor((n+1)/2) value in
    (n_chars, doc_id) order, so ties are deterministic on both
    engines. This is the exact VERIFICATION form (rank via window =
    one sort per lang partition); at corpus scale the production path
    is approx_percentile over the same column — same pairing as q20's
    exact Jaccard vs q24's banded LSH."""
    d = T(spark, sf, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    ranked = d.withColumn("rn", F.row_number().over(w))
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    med = (
        ranked.join(stats.select("lang", "n_docs"), "lang")
        .filter(F.col("rn") == F.floor((F.col("n_docs") + 1) / 2))
        .select("lang", F.col("n_chars").cast("bigint").alias("median_chars"))
    )
    return stats.join(med, "lang")


Q35_SQL = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars ASC, doc_id ASC) AS rn
  FROM documents),
s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(n_chars) AS BIGINT) AS min_chars,
             CAST(max(n_chars) AS BIGINT) AS max_chars
      FROM documents GROUP BY lang)
SELECT s.lang, s.n_docs, s.min_chars, s.max_chars,
       CAST(r.n_chars AS BIGINT) AS median_chars
FROM s JOIN r ON r.lang = s.lang AND r.rn = (s.n_docs + 1) // 2
"""


def q34_media_features(spark, sf):
    """Multimodal feature-extraction plumbing, oracle-hash-checked:
    documents.text utf-8 bytes stand in as opaque media payloads
    (media_id, kind, payload binary), the REAL Arrow mapInPandas
    feature UDF (operators/multimodal.py, feature='fake' = normalized
    16-bin byte histogram) runs end to end, and the float32 features
    are de-normalized back to exact integer bin counts
    (round(f * n_bytes) is exact for n_bytes << 2^24 at float32
    precision) so the driver compare is integer-stable. Zero bins are
    dropped on both sides. The DuckDB twin recovers each byte's bin as
    its FIRST HEX DIGIT (bin = byte >> 4) from hex(encode(text))."""
    from .operators.multimodal import extract_features

    media = T(spark, sf, "documents", floor=True).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    nb = media.select(
        "media_id", F.length("payload").cast("bigint").alias("n_bytes")
    )
    feats = extract_features(media, feature="fake")
    return (
        feats.join(nb, "media_id")
        .select(
            "media_id",
            "n_bytes",
            F.posexplode("feature").alias("bin", "f"),
        )
        .select(
            "media_id",
            "n_bytes",
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("f") * F.col("n_bytes"))
            .cast("bigint")
            .alias("n"),
        )
        .filter(F.col("n") > 0)
    )


Q34_SQL = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         lower(hex(encode(text))) AS h,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents),
b AS (
  SELECT media_id, n_bytes,
         unnest(list_transform(range(1, n_bytes + 1),
           i -> strpos('0123456789abcdef',
                       substr(h, 2 * CAST(i AS INT) - 1, 1)) - 1)) AS bin
  FROM m)
SELECT media_id, n_bytes, CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY media_id, n_bytes, bin
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def q36_repetition_quality(spark, sf):
    """Gopher-style repetition quality signals, fully native and
    PARTITION-LOCAL: per doc, token counts, distinct-token count, and
    the most-frequent-bigram count via a sorted-run fold over the
    token array (array_sort + aggregate) — zero shuffle beyond the
    scan, so the op costs one map pass at any corpus size. The keep
    flag applies the duplicate-word (<=20%) and top-bigram (<=18%)
    thresholds in INTEGER arithmetic so both engines agree exactly.
    DuckDB twin counts bigrams by explode+group — same numbers, the
    verification form of the fold."""
    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", toks.alias("t"))
    n = F.size(F.col("t"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.get(F.col("t"), i), F.get(F.col("t"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", "t", F.array_sort(bigrams).alias("bg"))
    # max run length in the sorted bigram array == max bigram count
    top = F.aggregate(
        F.col("bg"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    out = d.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct"),
        F.size("bg").cast("bigint").alias("n_bigrams"),
        top.cast("bigint").alias("top_bigram_n"),
    )
    return out.select(
        "*",
        (
            (5 * (F.col("n_tokens") - F.col("n_distinct")) <= F.col("n_tokens"))
            & (50 * F.col("top_bigram_n") <= 9 * F.col("n_bigrams"))
        ).alias("keep"),
    )


Q36_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
                CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams
         FROM d),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM d),
bg AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram FROM idx),
cnt AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2),
top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
        FROM cnt GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.n_distinct, b.n_bigrams,
       CAST(coalesce(top.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       (5 * (b.n_tokens - b.n_distinct) <= b.n_tokens
        AND 50 * coalesce(top.top_bigram_n, 0) <= 9 * b.n_bigrams) AS keep
FROM base b LEFT JOIN top ON top.doc_id = b.doc_id
"""


def q37_decontaminate_ngrams(spark, sf):
    """Benchmark decontamination by n-gram overlap (the GPT-3/PaLM
    recipe): docs with doc_id % 97 == 0 stand in for the held-out eval
    set; a corpus doc is contaminated if it shares ANY full 3-gram with
    a benchmark doc (3 here so the synthetic word-salad corpus yields
    hits; production uses 8-13-grams — same plan).

    Default shape (VERDICT r3 #5, q37 was the most expensive query):
    grams are HASHED to int64 (xxhash64) inside the gram-array
    transform, so the explode, the benchmark distinct and the join all
    carry 8-byte keys instead of multi-word strings, and the DISTINCT
    benchmark gram set — a fixed eval suite, small by construction —
    is BROADCAST, so the exploded corpus is never shuffled at all:
    the only exchange left is the final per-doc hash agg over matched
    rows. n_shared_grams = countDistinct(hash) equals
    countDistinct(gram) absent 64-bit collisions (~1e-7 odds at this
    scale), so the string-keyed DuckDB oracle stays the hash-checked
    twin. Set TRACK0S_Q37_EXACT=1 for the original string-keyed join
    (byte-exact keys, wide shuffle) — the verification twin."""
    import os as _os

    hashed = _os.environ.get("TRACK0S_Q37_EXACT", "") != "1"
    # BIND the token split as a real column before the gram transform:
    # inlining `split(text)` into the lambda re-evaluates the O(doc)
    # split for every element access (4x per gram — measured 3.2s vs
    # 0.3s for the gram explode at sf0.1; the dedup.py _bind_words_sql
    # trap, r6 guide §1 measurement). Same rows, same hashes.
    d = (
        T(spark, sf, "documents", floor=True)
        .select("doc_id", "lang", F.split(F.col("text"), " ").alias("t"))
    )
    toks = F.col("t")
    n = F.size(toks)

    def gram_at(i):
        s = F.concat_ws(
            " ", F.get(toks, i), F.get(toks, i + 1), F.get(toks, i + 2)
        )
        return F.xxhash64(s) if hashed else s

    empty_t = "array<bigint>" if hashed else "array<string>"
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(0), n - 3), gram_at),
    ).otherwise(F.array().cast(empty_t))
    g = d.select("doc_id", "lang", F.explode(grams).alias("gram"))
    bench = (
        g.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    if hashed:
        bench = F.broadcast(bench)
    return (
        g.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "gram")
        .groupBy("doc_id", "lang")
        .agg(F.countDistinct("gram").cast("bigint").alias("n_shared_grams"))
    )


Q37_SQL = """
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, lang, t,
               unnest(generate_series(1, len(t) - 2)) AS i FROM d),
g AS (SELECT doc_id, lang, array_to_string(t[i:i+2], ' ') AS gram FROM idx),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
SELECT g.doc_id, g.lang,
       CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared_grams
FROM g JOIN bench USING (gram)
WHERE g.doc_id % 97 != 0
GROUP BY g.doc_id, g.lang
"""



def q38_packing_estimate(spark, sf):
    """Context-window packing estimator for training-run sizing: per
    (lang, split) — reusing q32's deterministic char-hash split so the
    numbers line up with the actual train/val/test materialization —
    total tokens, documents, per-doc windows at C=256 tokens (sized to the synthetic docs)
    (sum of ceil(tokens/C): the no-cross-doc-packing upper bound) and
    the ideal lower bound ceil(total_tokens/C) (perfect concatenated
    packing). The spread between the two bounds IS the padding cost a
    packing strategy must close; both are exact integers, one narrow
    hash agg over per-doc token counts — the same shape at 100 TB."""
    from .operators.dedup import char_hash_sql

    C = 256
    d = T(spark, sf, "documents").select(
        "lang",
        F.size(F.split(F.trim("text"), _P.TOKEN_SPLIT))
        .cast("bigint")
        .alias("n_tokens"),
        F.expr(f"{char_hash_sql('CAST(doc_id AS STRING)')} % 100").alias(
            "bucket"
        ),
    )
    split = (
        F.when(F.col("bucket") < 90, F.lit("train"))
        .when(F.col("bucket") < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    d = d.withColumn("split", split)
    return d.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.ceil(F.col("n_tokens") / C))
        .cast("bigint")
        .alias("windows_per_doc_bound"),
        F.ceil(F.sum("n_tokens") / C).cast("bigint").alias("windows_ideal"),
    )


def _q38_sql() -> str:
    return f"""
WITH d AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text, ' '),
                                     '[ \t\n\x0B\f\r]+')) AS BIGINT)
           AS n_tokens,
         CASE
           WHEN {duck_char_hash("CAST(doc_id AS VARCHAR)")} % 100 < 90
             THEN 'train'
           WHEN {duck_char_hash("CAST(doc_id AS VARCHAR)")} % 100 < 95
             THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(ceil(n_tokens / 256.0) AS BIGINT)) AS BIGINT)
         AS windows_per_doc_bound,
       CAST(ceil(sum(n_tokens) / 256.0) AS BIGINT) AS windows_ideal
FROM d GROUP BY lang, split
"""


Q38_SQL = _q38_sql()


def q39_dup_clusters(spark, sf):
    """Duplicate-CLUSTER resolution — q24's MinHash-LSH pairs
    contracted to transitive components (operators/components.py
    hook + pointer-jump, the public CC-over-LSH dedup recipe), one
    deterministic keeper (min doc_id) per cluster. Output: one row per
    CLUSTERED doc with its cluster representative and whether it is
    the kept one — exactly the drop-list a dedup materialization
    consumes. Oracle: same pairs via Q24's SQL, closure via a
    recursive CTE. At 100 TB the pair set is the banded join's output
    (never all-pairs) and CC is O(log n) hash-shuffle rounds."""
    from .operators.components import connected_components
    from .operators.dedup import minhash_native_pairs

    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    handles: list = []
    pairs = minhash_native_pairs(
        d, "doc_id", "text", threshold=0.35, handles=handles
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    _rotate_handles(handles)
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster",
        (F.col("node") == F.col("cluster")).alias("keep"),
    )


def _q39_sql() -> str:
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({Q24_SQL.strip()}) q24),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS cluster,
       u = least(u, min(v)) AS keep
FROM reach GROUP BY u
"""


Q39_SQL = _q39_sql()


def q40_graph_rank(spark, sf):
    """Link-graph centrality (operators/graphrank.py): weighted
    PageRank, 5 damped power iterations, over the bipartite
    customer<->supplier graph induced by lineitem x orders (edge
    weight = co-occurrence count, symmetrised so no node dangles) —
    the host-graph quality signal a crawl frontier prioritises by and
    a pretraining pipeline weights documents by. Oracle: the 5
    iterations unrolled as chained CTEs with the identical float
    expression shape; ranks rounded to 8 decimals on both sides."""
    from .operators.graphrank import pagerank

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    # aggregate on the raw INT keys and build the node-name strings
    # AFTER the groupBy (r6): the 6M-group hash agg and its shuffle
    # carry two ints instead of two concat'd strings — same groups,
    # same counts, same output rows
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            "w",
        )
    )
    # symmetrise by EXPLODING both directions out of the aggregated
    # pair (r6): the old union(e0, reversed(e0)) evaluated the
    # lineitem x orders join + aggregation once PER BRANCH (Spark does
    # no cross-branch CSE) — same edge multiset, half the build work
    edges = e0.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src"), F.col("dst"), F.col("w")
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("w"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.w")
    pr = pagerank(edges, iters=5, damping=0.85)
    return pr.select("node", F.round("rank", 8).alias("rank"))


def _q40_sql(iters: int = 5) -> str:
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f"""
pr{i} AS (
  SELECT n.node,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.contrib, 0)
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.rank * e.w / o.tot) AS contrib
    FROM edges e JOIN pr{i - 1} p ON e.src = p.node
                 JOIN outw o ON o.src = e.src
    GROUP BY e.dst) c ON c.node = n.node)"""
        )
    return (
        """
WITH
edges0 AS (SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
                  CAST(count(*) AS DOUBLE) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
edges AS (SELECT src, dst, w FROM edges0
          UNION ALL SELECT dst, src, w FROM edges0),
outw AS (SELECT src, sum(w) AS tot FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),"""
        + ",".join(steps)
        + f"""
SELECT node, round(rank, 8) AS rank FROM pr{iters}
"""
    )


Q40_SQL = _q40_sql()

#: hashed-bigram feature space for q41 (DSIR) — power of two, small
#: enough that the per-bucket log-ratio table broadcasts everywhere
_DSIR_BUCKETS = 1024


def q41_importance_weights(spark, sf):
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public): score(doc) = sum over its bigrams of
    log(p_target(bucket) / p_raw(bucket)) under add-1-smoothed
    hashed-bigram bag models (B=1024 buckets, portable char-fold
    hash); target distribution = the 'en' slice. High scores = docs
    that look like the target corpus — the resampling key.

    Scale shape: two narrow hash aggs build the bucket count tables,
    the B-row log-ratio table is BROADCAST onto the exploded bigrams
    (no shuffle of the corpus), one per-doc hash agg finishes — at
    100 TB the only wide exchange is the final groupBy(doc_id)."""
    from .operators.dedup import gram_bucket_kernel

    B = _DSIR_BUCKETS
    # vectorized gram-bucket kernel (r6, guide §4.2): the gram explode
    # + per-character interpreted char-fold was this query's dominant
    # cost; the kernel emits (doc, lang, bucket) rows with the exact
    # same int64 hash via the word-compose identity. Tokenization
    # (plain single-space split) stays JVM-side.
    d = (
        T(spark, sf, "documents", floor=True)
        .select(
            F.col("doc_id").alias("id"),
            "lang",
            F.split(F.col("text"), " ").alias("t"),
        )
    )
    g = d.mapInPandas(
        gram_bucket_kernel("t", ("lang",), 2, B),
        "id long, lang string, bucket bigint",
    ).select(F.col("id").alias("doc_id"), "lang", "bucket")
    # single-pass totals and a single grouped agg for both bucket count
    # tables (r6 — was four full passes over the exploded grams):
    # sum(when(en)) == the left-joined ct with coalesce(ct,0), since cr
    # covers every bucket present and absent-en buckets count 0
    handles: list = [g.persist()]
    en = F.when(F.col("lang") == "en", 1).otherwise(0)
    tr = g.agg(
        F.count(F.lit(1)).alias("r"), F.sum(en).alias("t")
    ).first()
    t_raw, t_tgt = int(tr["r"]), int(tr["t"])
    crct = g.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"), F.sum(en).alias("ct")
    )
    ratio = crct.select(
        "bucket",
        F.log(
            ((F.col("ct") + 1.0) / F.lit(t_tgt + B))
            / ((F.col("cr") + 1.0) / F.lit(t_raw + B))
        ).alias("lr"),
    )
    out = (
        g.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("lr"), 6).alias("importance"))
    )
    _rotate_handles(handles)
    return out


def _q41_sql() -> str:
    B = _DSIR_BUCKETS
    bigram = "array_to_string(t[i:i+1], ' ')"
    return f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, lang, t,
               unnest(generate_series(1, len(t) - 1)) AS i FROM d),
g AS (SELECT doc_id, lang,
             ({duck_char_hash(bigram)}) % {B} AS bucket FROM idx),
cr AS (SELECT bucket, count(*) AS cr FROM g GROUP BY bucket),
ct AS (SELECT bucket, count(*) AS ct FROM g WHERE lang = 'en'
       GROUP BY bucket),
tr AS (SELECT count(*) AS v FROM g),
tt AS (SELECT count(*) AS v FROM g WHERE lang = 'en'),
lr AS (SELECT cr.bucket,
              ln(((coalesce(ct, 0) + 1.0) / ((SELECT v FROM tt) + {B})) /
                 ((cr + 1.0) / ((SELECT v FROM tr) + {B}))) AS lr
       FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket)
SELECT doc_id, lang, round(sum(lr), 6) AS importance
FROM g JOIN lr ON g.bucket = lr.bucket
GROUP BY doc_id, lang
"""


Q41_SQL = _q41_sql()


def q42_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity cut) — the crawl
    engine's revisit/interval-scheduling shape (per-host request
    batching, politeness windows) as the classic stateful window op.
    Per user: session count and longest session in events. Timestamps
    compared as exact epoch MICROSECONDS on both engines (gaps cancel
    any timezone rebasing), ties broken by event_id. Scale: ONE
    window shuffle on user_id, then hash aggs — no driver state."""
    # ts arrives TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py), so the NTZ->TIMESTAMP cast is offset-free and
    # unix_micros equals DuckDB's epoch_us on the same parquet value
    ev = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    s = ev.withColumn(
        "ns",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sess",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = s.groupBy("user_id", "sess").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n").cast("bigint").alias("longest_session_events"),
    )


Q42_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
x AS (SELECT user_id, us, event_id,
        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               IS NULL
          OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               > 1800000000
        THEN 1 ELSE 0 END AS ns FROM e),
s AS (SELECT user_id,
        sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS sess FROM x),
p AS (SELECT user_id, sess, count(*) AS n FROM s GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n) AS BIGINT) AS longest_session_events
FROM p GROUP BY user_id
"""


def q43_substring_dup(spark, sf):
    """Exact-substring duplication profile (the Lee et al. 2022
    'Deduplicating Training Data Makes Language Models Better' family,
    windowed approximation): slide 30-char windows at stride 7 over
    each doc; a window is duplicated iff its exact text occurs >= 2
    times corpus-wide; report per-doc window total, duplicated-window
    count, and the duplication fraction — the signal a pipeline
    thresholds to drop boilerplate-heavy docs. (The paper's
    suffix-array finds arbitrary-length spans; fixed windows with
    stride trade recall at span boundaries for a pure DataFrame plan.)

    Scale shape: windows are HASHED to int64 (xxhash64) before the
    corpus-wide group-by, so the explode and both aggregations carry
    8-byte keys instead of 30-char strings (~4x shuffle-width cut; the
    same trick as q37, same collision argument: a 64-bit collision —
    ~1e-7 at 10^10 windows per partition-group — could only mark one
    extra window duplicated). The duplicated-key set joins back via
    left_semi; no driver state, three hash exchanges total. Set
    TRACK0S_Q43_EXACT=1 for the string-keyed verification twin."""
    import os as _os

    hashed = _os.environ.get("TRACK0S_Q43_EXACT", "") != "1"
    W, S = 30, 7
    d = T(spark, sf, "documents", floor=True).filter(F.length("text") >= W)
    win = F.explode(
        F.expr(
            f"transform(sequence(0, length(text)-{W}, {S}),"
            f" i -> substring(text, i+1, {W}))"
        )
    ).alias("win")
    w = d.select("doc_id", win)
    if hashed:
        w = w.select("doc_id", F.xxhash64("win").alias("win"))
    dup = (
        w.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("win")
    )
    tot = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows")
    )
    dd = (
        w.join(dup, "win", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"))
    )
    return tot.join(dd, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
        F.round(
            F.coalesce("n_dup_windows", F.lit(0)).cast("double")
            / F.col("n_windows"),
            4,
        ).alias("dup_frac"),
    )


Q43_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
w AS (SELECT doc_id, substr(text, i + 1, 30) AS win
      FROM d, LATERAL (SELECT unnest(generate_series(0, length(text) - 30, 7)) AS i) t),
dup AS (SELECT win FROM w GROUP BY win HAVING count(*) > 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM w GROUP BY doc_id),
dd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
       FROM w WHERE win IN (SELECT win FROM dup) GROUP BY doc_id)
SELECT tot.doc_id, tot.n_windows,
       CAST(coalesce(dd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       round(CAST(coalesce(dd.n_dup_windows, 0) AS DOUBLE) / tot.n_windows, 4)
         AS dup_frac
FROM tot LEFT JOIN dd ON dd.doc_id = tot.doc_id
"""


def q44_recrawl_schedule(spark, sf):
    """Change-rate-driven recrawl scheduling — the revisit tier's (S4)
    missing policy half: WHEN to refetch.  Per key, the Cho &
    Garcia-Molina 2003 ('Estimating Frequency of Change', public)
    smoothed estimator over an observation history: with m = n-1
    sampling intervals and X observed changes, the per-interval change
    probability is r = -ln((m - X + 0.5)/(m + 0.5)); dividing by the
    mean sampling gap gives a Poisson change rate, and 1/rate is the
    refetch due interval.  Here events stands in as the observation
    log (user_id = page key, event_type = content fingerprint), the
    exact shape the revisit MERGE keeps per url at scale.

    Scale shape: ONE shuffle — the lag window partitions by key and
    the per-key agg reuses that partitioning (no second Exchange);
    everything else is codegen'd double arithmetic.  Keys that never
    changed get change_rate 0 and a NULL due interval (recrawl at the
    policy floor) rather than a fabricated rate."""
    ev = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("event_type").over(w)
    o = ev.withColumn(
        "chg",
        F.when(prev.isNotNull() & (F.col("event_type") != prev), 1).otherwise(0),
    )
    a = (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("chg").cast("bigint").alias("n_changes"),
            F.min("us").alias("us0"),
            F.max("us").alias("us1"),
        )
        .filter(F.col("n_obs") >= 3)
    )
    gap_us = (F.col("us1") - F.col("us0")) / (F.col("n_obs") - 1)
    gap_s = gap_us / 1000000.0
    r_hat = -F.log(
        (F.col("n_obs") - 1 - F.col("n_changes") + 0.5)
        / (F.col("n_obs") - 1 + 0.5)
    )
    return a.select(
        "user_id",
        "n_obs",
        "n_changes",
        F.round(gap_s, 6).alias("avg_gap_s"),
        F.round(r_hat / gap_s * 86400.0, 8).alias("change_rate_per_day"),
        F.when(F.col("n_changes") > 0, F.round(gap_s / r_hat, 4)).alias(
            "due_in_s"
        ),
    )


Q44_SQL = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
o AS (SELECT user_id, event_type, us,
        CASE WHEN lag(event_type) OVER
               (PARTITION BY user_id ORDER BY us, event_id) IS NOT NULL
          AND event_type <> lag(event_type) OVER
               (PARTITION BY user_id ORDER BY us, event_id)
        THEN 1 ELSE 0 END AS chg FROM e),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        CAST(sum(chg) AS BIGINT) AS n_changes,
        min(us) AS us0, max(us) AS us1
      FROM o GROUP BY user_id HAVING count(*) >= 3)
SELECT user_id, n_obs, n_changes,
  round(((us1 - us0) / (n_obs - 1)) / 1000000.0, 6) AS avg_gap_s,
  round(-ln((n_obs - 1 - n_changes + 0.5) / (n_obs - 1 + 0.5))
        / (((us1 - us0) / (n_obs - 1)) / 1000000.0) * 86400.0, 8)
    AS change_rate_per_day,
  CASE WHEN n_changes > 0 THEN
    round((((us1 - us0) / (n_obs - 1)) / 1000000.0)
          / (-ln((n_obs - 1 - n_changes + 0.5) / (n_obs - 1 + 0.5))), 4)
  END AS due_in_s
FROM a
"""


def q45_domain_cap(spark, sf):
    """Per-domain quota balancing (the C4/Gopher-style cap on any one
    domain's share of the training corpus): within each language, a
    source may contribute at most cap = max(3, floor(4% of the
    language's docs)); docs are kept best-first by (n_chars desc,
    doc_id asc) — a deterministic quality order — and the query
    reports the per-(lang, source) audit row: total docs, the cap,
    docs kept, chars kept.  The per-lang cap table is a handful of
    rows and broadcasts onto the ranked corpus.

    Scale shape: this is the exact audit/verification form — one
    window sort per (lang, source) group ranks every doc.  At 10^10
    docs the production variant replaces the full per-group sort with
    a threshold join: approx_percentile picks each group's cap-th
    largest n_chars, rows above the threshold keep without ranking,
    and only the boundary ties rank — same pairing as q35's exact
    median vs approx_percentile."""
    d = T(spark, sf, "documents").select("doc_id", "lang", "source", "n_chars")
    caps = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("lang_total"))
        .select(
            "lang",
            F.greatest(
                F.lit(3), F.floor(F.col("lang_total") * 0.04)
            ).cast("bigint").alias("cap"),
        )
    )
    w = Window.partitionBy("lang", "source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = d.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(caps), "lang"
    )
    kept = F.col("rn") <= F.col("cap")
    return ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("cap").cast("bigint").alias("cap"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


Q45_SQL = """
WITH t AS (SELECT lang, count(*) AS lang_total FROM documents GROUP BY lang),
c AS (SELECT lang,
             greatest(3, CAST(floor(lang_total * 0.04) AS BIGINT)) AS cap
      FROM t),
r AS (SELECT d.lang, d.source, d.n_chars, c.cap,
             row_number() OVER (PARTITION BY d.lang, d.source
                                ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
      FROM documents d JOIN c USING (lang))
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(cap) AS BIGINT) AS cap,
       CAST(sum(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn <= cap THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM r GROUP BY lang, source
"""


def q46_funnel_steps(spark, sf):
    """Ordered funnel analysis (view -> click -> purchase, each step
    STRICTLY after the previous and within a 2-day conversion window
    of it) — the sequential-pattern shape event pipelines need beyond
    q42's gap sessionization. Per user: the first view, the first
    qualifying click, the first qualifying purchase, and how many
    steps completed (the 2-day window splits the fixture 54/38/58
    across steps 1/2/3, so every branch is exercised).

    Scale shape: ONE shuffle. All three steps resolve inside a single
    (user_id) partitioning — a running min of view-times up to each
    row (window), a running min of qualifying click-times over the
    same window spec (same Exchange, same Sort), then one hash agg
    that reuses the partitioning. No self-joins, no explode; ties are
    impossible to mis-order (ORDER BY ts, event_id is total)."""
    W_US = 2 * 86400 * 1000000  # 2-day conversion window
    ev = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mv = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    o = ev.withColumn(
        "click_ok",
        F.when(
            (F.col("event_type") == "click")
            & mv.isNotNull()
            & (F.col("us") > mv)
            & (F.col("us") <= mv + W_US),
            F.col("us"),
        ),
    )
    mc = F.min("click_ok").over(w)
    o = o.withColumn(
        "purchase_ok",
        F.when(
            (F.col("event_type") == "purchase")
            & mc.isNotNull()
            & (F.col("us") > mc)
            & (F.col("us") <= mc + W_US),
            F.col("us"),
        ),
    )
    a = o.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("us"))
        ).alias("view_us"),
        F.min("click_ok").alias("click_us"),
        F.min("purchase_ok").alias("purchase_us"),
    )
    steps = (
        F.when(F.col("purchase_us").isNotNull(), 3)
        .when(F.col("click_us").isNotNull(), 2)
        .when(F.col("view_us").isNotNull(), 1)
        .otherwise(0)
    )
    return a.select(
        "user_id",
        "view_us",
        "click_us",
        "purchase_us",
        steps.cast("int").alias("steps_completed"),
    )


Q46_SQL = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
o AS (SELECT user_id, event_id, event_type, us,
        CASE WHEN event_type = 'click'
          AND min(CASE WHEN event_type = 'view' THEN us END) OVER w
            IS NOT NULL
          AND us > min(CASE WHEN event_type = 'view' THEN us END) OVER w
          AND us <= min(CASE WHEN event_type = 'view' THEN us END) OVER w
                     + 172800000000
        THEN us END AS click_ok
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
p AS (SELECT user_id, event_type, us, click_ok,
        CASE WHEN event_type = 'purchase'
          AND min(click_ok) OVER w IS NOT NULL
          AND us > min(click_ok) OVER w
          AND us <= min(click_ok) OVER w + 172800000000
        THEN us END AS purchase_ok
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
a AS (SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN us END) AS view_us,
             min(click_ok) AS click_us,
             min(purchase_ok) AS purchase_us
      FROM p GROUP BY user_id)
SELECT user_id, view_us, click_us, purchase_us,
       CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
                 WHEN click_us IS NOT NULL THEN 2
                 WHEN view_us IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS steps_completed
FROM a
"""


def q47_retention_cohorts(spark, sf):
    """Daily cohort-retention matrix — the third classic event-table
    shape after q42's sessions and q46's funnels: users grouped by
    their first-activity day (the cohort), counted on every later day
    they were active at all (the fixture spans one month, so daily
    grain gives a real matrix; production swaps the same arithmetic
    to /7 for weekly). Days are computed ARITHMETICALLY (days since
    2024-01-01) rather than via date_trunc so calendar conventions
    cannot diverge between engines.

    Scale shape: one distinct over (user, day) — the only shuffle
    wide enough to matter — then a per-user min that is a plain hash
    agg, a join back on user_id, and a final narrow agg over
    (cohort, offset): at 10^10 events the distinct is the cost, and
    it carries two ints per row."""
    d = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    ev = (
        T(spark, sf, "events")
        .select("user_id", d.cast("bigint").alias("day"))
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


Q47_SQL = """
WITH e AS (SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset
"""


def q48_anchor_topk(spark, sf):
    """Anchor-text harvesting through the REAL parser (VERDICT r4 #7 —
    the one round-4 operator family that had only sequential-oracle
    parity, now contract-hash-checked): deterministic synthetic pages
    are built NATIVELY from the documents table (2 links per doc, link
    targets folded into a smaller id space so real top-k competition
    exists), pushed through ``anchor_texts`` — the same
    mapInPandas(parse_anchors) + decode chain + canonicalize the crawl
    uses — then summarised per target by ``anchor_summary`` (top-3 by
    count desc / anchor asc + total inlinks). The DuckDB twin computes
    the anchors ANALYTICALLY from the same columns (the page template
    makes the parse invertible), so any drift in the parser, the
    content-type gate, resolve_link, or canonicalize breaks the hash.

    Scale shape: the parse is one Arrow crossing over the (url, html)
    projection; the summary's window runs over aggregated
    (dst_url, anchor) counts — vocabulary-, not edge-cardinality —
    and its rk <= 3 filter is WindowGroupLimit-prunable."""
    from .operators.linkgraph import anchor_summary, anchor_texts

    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    w = F.regexp_extract(F.lower("text"), "[a-z0-9]+", 0)
    host = F.concat(
        F.lit("http://h"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".test"),
    )
    src_url = F.concat(
        host, F.lit("/p"), F.col("doc_id").cast("string"), F.lit(".html")
    )
    t1 = (F.col("doc_id") % 211).cast("string")
    t2 = ((F.col("doc_id") * 7 + 3) % 211).cast("string")
    html = F.concat(
        F.lit('<html><body><a href="/t'), t1, F.lit('">'), w,
        F.lit('</a><a href="/t'), t2, F.lit('">'), w,
        F.lit("-x</a></body></html>"),
    )
    pages = d.select(src_url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    log = d.select(src_url.alias("url_canon"))
    return anchor_summary(anchor_texts(log, pages), k=3)


Q48_SQL = """
WITH d AS (
  SELECT doc_id, regexp_extract(lower(text), '[a-z0-9]+', 0) AS w
  FROM documents
),
anchors AS (
  SELECT 'http://h' || (doc_id % 7) || '.test/t' || (doc_id % 211) AS dst_url,
         w AS anchor
  FROM d
  UNION ALL
  SELECT 'http://h' || (doc_id % 7) || '.test/t' || ((doc_id * 7 + 3) % 211),
         w || '-x'
  FROM d
),
counts AS (SELECT dst_url, anchor, CAST(count(*) AS BIGINT) AS n
           FROM anchors GROUP BY 1, 2),
tot AS (SELECT dst_url, CAST(count(*) AS BIGINT) AS n_inlinks
        FROM anchors GROUP BY 1),
r AS (SELECT dst_url, anchor, n,
             CAST(row_number() OVER (PARTITION BY dst_url
                                     ORDER BY n DESC, anchor ASC) AS INT)
               AS rk
      FROM counts)
SELECT r.dst_url, r.anchor, r.n, r.rk, t.n_inlinks
FROM r JOIN tot t USING (dst_url) WHERE r.rk <= 3
"""


def q49_graph_rank_dangling(spark, sf):
    """PageRank on a graph WITH sinks (VERDICT r4 #8): the DIRECTED
    customer->supplier graph (no symmetrisation — every supplier is a
    dangling node) under ``dangling='redistribute'``, the standard
    uniform dangling-mass term, so rank mass is conserved instead of
    leaking (the silent-leak bug the old docstring hand-waved away;
    the default mode now raises on this exact graph). Oracle: the
    iterations unrolled as chained CTEs with a per-round dangling-mass
    scalar CTE, identical float expression shape; round(,8) both sides
    (the q40 discipline)."""
    from .operators.graphrank import pagerank

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    # int-keyed agg, strings built after (the q40 r6 change)
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            "w",
        )
    )
    pr = pagerank(edges, iters=3, damping=0.85, dangling="redistribute")
    return pr.select("node", F.round("rank", 8).alias("rank"))


def _q49_sql(iters: int = 3) -> str:
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f"""
dm{i - 1} AS (
  SELECT coalesce(sum(rank), 0) AS dm FROM pr{i - 1}
  WHERE node IN (SELECT node FROM sinks)),
pr{i} AS (
  SELECT n.node,
         (1 - 0.85) / (SELECT n FROM nn)
           + 0.85 * (coalesce(c.contrib, 0)
                     + (SELECT dm FROM dm{i - 1}) / (SELECT n FROM nn))
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.rank * e.w / o.tot) AS contrib
    FROM edges e JOIN pr{i - 1} p ON e.src = p.node
                 JOIN outw o ON o.src = e.src
    GROUP BY e.dst) c ON c.node = n.node)"""
        )
    return (
        """
WITH
edges AS (SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
                 CAST(count(*) AS DOUBLE) AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
outw AS (SELECT src, sum(w) AS tot FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
sinks AS (SELECT node FROM nodes
          WHERE node NOT IN (SELECT src FROM edges)),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),"""
        + ",".join(steps)
        + f"""
SELECT node, round(rank, 8) AS rank FROM pr{iters}
"""
    )


Q49_SQL = _q49_sql()


def q50_paragraph_dedup(spark, sf):
    """Paragraph-granularity cross-document dedup (RefinedWeb/Falcon
    'remove duplicated spans' — Penedo et al. 2023), the REMOVAL
    counterpart of q43's duplication profile: 10-word paragraphs, one
    occurrence kept corpus-wide (lexicographically first (doc, pos)),
    per-doc cleaned text reconstructed in position order. All-integer
    aggregates + an int/int dup_frac, so the output is bit-stable on
    any partitioning (the q01 lesson applied at design time).

    Scale shape (operators/dedup.py paragraph_dedup): corpus explode
    -> keeper group-by on int64 hashed paragraph keys -> hash-join
    back -> one doc-level group-by with a sorted-struct rebuild;
    nothing broadcast, no window, no driver state."""
    from .operators.dedup import paragraph_dedup

    d = T(spark, sf, "documents", floor=True).select("doc_id", "text")
    return paragraph_dedup(d, "doc_id", "text", chunk_words=10)


Q50_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (
  SELECT doc_id, g AS pos,
         array_to_string(w[(g*10+1):(g*10+10)], ' ') AS para,
         doc_id * 1048576 + g AS okey
  FROM w, LATERAL (SELECT unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS g)
),
keep AS (SELECT para, min(okey) AS keep_key FROM occ GROUP BY para)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN o.okey <> k.keep_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       round(CAST(sum(CASE WHEN o.okey <> k.keep_key THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 4) AS dup_frac,
       coalesce(string_agg(o.para, ' ' ORDER BY o.pos)
                  FILTER (WHERE o.okey = k.keep_key), '') AS text_clean
FROM occ o JOIN keep k USING (para)
GROUP BY o.doc_id
"""


def q51_gopher_rules(spark, sf):
    """Gopher quality-rule family NOT covered by q36's repetition
    signals (Rae et al. 2021): word-count bounds, mean-word-length
    bounds, minimum stopword hits, composed keep decision. Flags are
    integer arithmetic (10*sum(len) BETWEEN lo*n AND hi*n), so both
    engines agree exactly; mean_word_len is a display-only int/int
    division rounded to 4dp. Pure per-row Column folds, zero shuffle."""
    from .operators.textstats import gopher_rules

    return gopher_rules(
        T(spark, sf, "documents").select("doc_id", "text"), "doc_id", "text"
    )


Q51_SQL = """
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       round(CAST(sl AS DOUBLE) / len(w), 4) AS mean_word_len,
       CAST(sh AS BIGINT) AS stop_hits,
       (len(w) >= 30 AND len(w) <= 90) AS rule_wordcount,
       (10 * sl >= 39 * len(w) AND 10 * sl <= 48 * len(w)) AS rule_wordlen,
       (sh >= 2) AS rule_stopwords,
       ((len(w) >= 30 AND len(w) <= 90)
        AND (10 * sl >= 39 * len(w) AND 10 * sl <= 48 * len(w))
        AND sh >= 2) AS keep
FROM (
  SELECT doc_id, w,
         list_sum(list_transform(w, x -> length(x))) AS sl,
         len(list_filter(w, x -> x IN ('the', 'a'))) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
"""


def q52_soft404_templates(spark, sf):
    """Template-page / soft-404 detection (Bar-Yossef et al. 2004
    duplicate-content observation): per-host text-fingerprint clusters
    with >= 3 distinct URLs flag every member URL. Pages are built
    NATIVELY from documents — every 5th doc serves its host's shared
    'not found' template instead of its own text — and the operator
    (operators/boilerplate.py) runs the real parse_url host extraction
    + xxhash64 fingerprint + per-(host,fp) window count; the DuckDB
    twin computes host and body ANALYTICALLY from the same columns, so
    drift in parse_url handling or the window count breaks the hash.

    Scale shape: text never shuffles (8-byte fingerprint does); one
    hash partition on (host, fp), no join, no broadcast."""
    from .operators.boilerplate import soft404_candidates

    d = T(spark, sf, "documents").select("doc_id", "text")
    host_id = (F.col("doc_id") % 7).cast("string")
    pages = d.select(
        F.concat(
            F.lit("http://h"), host_id, F.lit(".test/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("not found on h"), host_id),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return soft404_candidates(pages, "url", "text", min_urls=3)


Q52_SQL = """
SELECT url, host, n_urls_same_text FROM (
  SELECT url, host,
         CAST(count(*) OVER (PARTITION BY host, body) AS BIGINT)
           AS n_urls_same_text
  FROM (
    SELECT 'http://h' || (doc_id % 7) || '.test/p' || doc_id AS url,
           'h' || (doc_id % 7) || '.test' AS host,
           CASE WHEN doc_id % 5 = 0 THEN 'not found on h' || (doc_id % 7)
                ELSE text END AS body
    FROM documents))
WHERE n_urls_same_text >= 3
"""


QUERIES = {
    "q01_agg_metrics": (q01_agg_metrics, Q01_SQL),
    "q02_topk_per_key": (q02_topk_per_key, Q02_SQL),
    "q03_anti_join_seen": (q03_anti_join_seen, Q03_SQL),
    "q04_left_join_miss": (q04_left_join_miss, Q04_SQL),
    "q05_broadcast_join_rev": (q05_broadcast_join_rev, Q05_SQL),
    "q06_glob_filter": (q06_glob_filter, Q06_SQL),
    "q07_rule_pipeline": (q07_rule_pipeline, Q07_SQL),
    "q08_url_parse": (q08_url_parse, Q08_SQL),
    "q09_json_scalar": (q09_json_scalar, Q09_SQL),
    "q10_union_distinct": (q10_union_distinct, Q10_SQL),
    "q11_first_per_type": (q11_first_per_type, Q11_SQL),
    "q12_distinct_cardinality": (q12_distinct_cardinality, Q12_SQL),
    "q13_multi_join": (q13_multi_join, Q13_SQL),
    "q14_date_pushdown": (q14_date_pushdown, Q14_SQL),
    "q15_dedup_exact": (q15_dedup_exact, Q15_SQL),
    "q16_token_count": (q16_token_count, Q16_SQL),
    "q17_text_quality": (q17_text_quality, Q17_SQL),
    "q18_lang_stats": (q18_lang_stats, Q18_SQL),
    "q19_shingles": (q19_shingles, Q19_SQL),
    "q20_jaccard_pairs": (q20_jaccard_pairs, Q20_SQL),
    "q21_ann_cosine": (q21_ann_cosine, Q21_SQL),
    "q22_embedding_norms": (q22_embedding_norms, Q22_SQL),
    "q23_langid": (q23_langid, Q23_SQL),
    "q24_minhash_lsh_pairs": (q24_minhash_lsh_pairs, Q24_SQL),
    "q25_simhash_near_pairs": (q25_simhash_near_pairs, Q25_SQL),
    "q26_fingerprint": (q26_fingerprint, Q26_SQL),
    "q27_ann_lsh": (q27_ann_lsh, Q27_SQL),
    "q28_revisit_merge": (q28_revisit_merge, Q28_SQL),
    "q29_cosine_near_dup": (q29_cosine_near_dup, Q29_SQL),
    "q30_clean_pipeline": (q30_clean_pipeline, Q30_SQL),
    "q31_ann_ivf": (q31_ann_ivf, Q31_SQL),
    "q32_stratified_split": (q32_stratified_split, Q32_SQL),
    "q33_top_terms_per_lang": (q33_top_terms_per_lang, Q33_SQL),
    "q34_media_features": (q34_media_features, Q34_SQL),
    "q35_length_percentiles": (q35_length_percentiles, Q35_SQL),
    "q36_repetition_quality": (q36_repetition_quality, Q36_SQL),
    "q37_decontaminate_ngrams": (q37_decontaminate_ngrams, Q37_SQL),
    "q38_packing_estimate": (q38_packing_estimate, Q38_SQL),
    "q39_dup_clusters": (q39_dup_clusters, Q39_SQL),
    "q40_graph_rank": (q40_graph_rank, Q40_SQL),
    "q41_importance_weights": (q41_importance_weights, Q41_SQL),
    "q42_sessionize": (q42_sessionize, Q42_SQL),
    "q43_substring_dup": (q43_substring_dup, Q43_SQL),
    "q44_recrawl_schedule": (q44_recrawl_schedule, Q44_SQL),
    "q45_domain_cap": (q45_domain_cap, Q45_SQL),
    "q46_funnel_steps": (q46_funnel_steps, Q46_SQL),
    "q47_retention_cohorts": (q47_retention_cohorts, Q47_SQL),
    "q48_anchor_topk": (q48_anchor_topk, Q48_SQL),
    "q49_graph_rank_dangling": (q49_graph_rank_dangling, Q49_SQL),
    "q50_paragraph_dedup": (q50_paragraph_dedup, Q50_SQL),
    "q51_gopher_rules": (q51_gopher_rules, Q51_SQL),
    "q52_soft404_templates": (q52_soft404_templates, Q52_SQL),
}


def queries():
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql():
    return {name: sql.strip() for name, (_fn, sql) in QUERIES.items() if sql}
