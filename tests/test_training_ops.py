"""Tests for the training-data pipeline operators (dedup / similarity /
textstats / multimodal) — known-answer checks on constructed corpora.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from track0_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge and the birds sing in the tall "
        "green trees near the quiet village square at dawn"
    )
    near = base.replace("dog", "cat")  # one token changed -> Jaccard ~0.9
    far = "completely different words here about spark engines and joins"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, far),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(docs):
    got = {r["fp"]: (r["n_dups"], r["keeper"]) for r in dedup.exact_dedup(docs, "doc_id", "text").collect()}
    assert (2, 0) in got.values()  # docs 0,1 collapse, keeper=min id
    assert sorted(n for n, _ in got.values()) == [1, 1, 1, 2]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_perm=64, bands=16
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert found.get((0, 1)) == 1.0  # exact dup -> identical signature
    assert (0, 2) in found and found[(0, 2)] >= 0.5  # near dup caught
    assert not any({a, b} & {3} for a, b in found)  # far doc not paired


def test_minhash_deterministic(docs):
    s1 = {tuple(r["sig"]) for r in dedup.minhash_signatures(docs, "doc_id", "text").collect()}
    s2 = {tuple(r["sig"]) for r in dedup.minhash_signatures(docs, "doc_id", "text").collect()}
    assert s1 == s2


def test_simhash_near_pairs(docs):
    pairs = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=10).collect()
    d = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert d.get((0, 1)) == 0  # identical text -> identical simhash
    assert (0, 2) in d  # one-word change -> small hamming distance


def test_shingles_expr_matches_python(docs):
    got = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", dedup.shingles_expr("text", 3).alias("sh")
        ).collect()
    }
    toks = [r["text"] for r in docs.filter("doc_id = 0").collect()][0].split()
    exp = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    assert got[0] == exp
    assert got[4] == []  # 1-token doc -> empty shingle array (guard)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    rows = [(i, rng.standard_normal(16).astype(float).tolist()) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id bigint, vec array<float>"), rows


def test_brute_force_topk_matches_numpy(vectors):
    df, rows = vectors
    q = [1.0] * 16
    got = [r["vec_id"] for r in similarity.brute_force_topk(df, "vec_id", "vec", q, 5).collect()]
    M = np.array([v for _, v in rows])
    qv = np.array(q)
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    exp = list(np.argsort(-sims)[:5])
    assert got == exp


def test_ann_lsh_recall(vectors):
    df, rows = vectors
    q = rows[17][1]  # query with a known exact hit
    bucketed = similarity.with_lsh_bucket(df, "vec_id", "vec", dim=16, planes=8)
    top = similarity.ann_topk_lsh(
        bucketed, "vec_id", "vec", q, dim=16, planes=8, radius=1, k=5
    ).collect()
    assert top[0]["vec_id"] == 17  # the vector itself must be found
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_langid_heuristic(spark):
    rows = [
        (0, "the cat is in the house and it is warm"),
        (1, "der hund ist nicht in das haus und die katze"),
        (2, "el gato es una mascota con la casa por que"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.langid_scores(df, "text").collect()}
    assert got == {0: "en", 1: "de", 2: "es"}


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "Hello world 123!"), (1, "Hello world 123!"), (2, "other text")],
        "doc_id bigint, text string",
    )
    q = textstats.with_quality(df, "text").collect()
    row = {r["doc_id"]: r for r in q}[0]
    assert row["n_tokens"] == 3
    assert row["punct_ratio"] > 0
    assert row["digit_ratio"] == pytest.approx(3 / 16, abs=1e-3)
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", textstats.fingerprint_expr("text").alias("fp")).collect()
    }
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_fake_features(spark):
    media = multimodal.synthetic_media_df(spark, 24)
    feats = multimodal.extract_features(media, feature="fake").collect()
    assert len(feats) == 24
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (multimodal.FEATURE_DIM,)
        assert abs(v.sum() - 1.0) < 1e-5  # normalized histogram
    # deterministic across runs
    feats2 = multimodal.extract_features(media, feature="fake").collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in feats2]


def test_multimodal_real_decode_stubbed(spark):
    media = multimodal.synthetic_media_df(spark, 3)
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, feature="image").collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(ei.value)


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media_df(spark, 9)
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert all(v == [0, 1000, 2000] for v in by_id.values())
    assert len(by_id) == 3  # only the video rows


def test_cosine_near_dup_pairs(vectors):
    """Precision is exact (every returned pair truly >= tau); planted
    duplicates (identical vectors share every band) are always found."""
    df, rows = vectors
    dup = df.limit(3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("vec")
    )
    full = df.union(dup)
    got = similarity.cosine_near_dup_pairs(
        full, "vec_id", "vec", dim=16, planes=12, band_bits=4, threshold=0.9
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    # the three planted exact dups are guaranteed candidates + cos==1
    for i in range(3):
        assert (i, i + 1000) in found
    M = {vid: np.array(v) for vid, v in rows}
    for vid, v in rows[:3]:
        M[vid + 1000] = np.array(v)
    for r in got:
        a, b = M[r["id_a"]], M[r["id_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.9 - 1e-9  # exact precision
        assert r["cosine"] == pytest.approx(cos, abs=1e-6)


def test_ivf_topk_recall_and_cells(vectors):
    """The query's own vector must be found via its probed cells; every
    cell id is within [1, cells]; cells partition the whole table."""
    df, rows = vectors
    celled = similarity.with_ivf_cell(df, "vec", dim=16, cells=8)
    cells = [r["cell"] for r in celled.select("cell").collect()]
    assert all(1 <= c <= 8 for c in cells)
    assert len(cells) == len(rows)  # every vector gets exactly one cell
    q = rows[17][1]
    top = similarity.ivf_topk(
        celled, "vec_id", "vec", q, dim=16, cells=8, nprobe=2, k=5
    ).collect()
    assert top[0]["vec_id"] == 17  # its own cell is always the nearest
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_minhash_short_docs_not_near_dups(spark):
    """Regression (r2 review): unrelated no-shingle docs (under 3
    words) all share the sentinel signature and must NOT be reported as
    near-dup pairs — in either minhash variant."""
    rows = [
        (0, "hello world"),
        (1, "foo bar"),
        (2, ""),
        (3, "one two three four five six seven eight nine ten"),
        (4, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    native = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_native_pairs(df, "doc_id", "text", 0.3).collect()
    }
    assert native == {(3, 4)}  # only the true duplicates
    plug = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup_pairs(df, "doc_id", "text", 0.3).collect()
    }
    assert plug == {(3, 4)}


def test_repetition_fold_matches_python(spark, tmp_path):
    """q36's sorted-run fold (max bigram count, partition-local) must
    equal a plain Python Counter over the same bigrams, including the
    degenerate 0/1-token docs."""
    import collections
    import os

    from track0_spark import contract

    texts = [
        "a b a b a b c",          # top bigram 'a b' x3
        "x x x x",                # 'x x' x3
        "one two three four",     # all bigrams unique
        "solo",                   # no bigrams
        "",                       # split('') -> [''] single token
        "r s r s r s r s r s",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "syn", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in contract.q36_repetition_quality(spark, sf).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bigrams = [
            f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)
        ]
        top = max(collections.Counter(bigrams).values(), default=0)
        r = got[i]
        assert r["n_tokens"] == len(toks), i
        assert r["n_distinct"] == len(set(toks)), i
        assert r["n_bigrams"] == len(bigrams), i
        assert r["top_bigram_n"] == top, i


def test_ivf_trained_codebook(spark):
    """train_ivf_codebook (distributed pyspark.ml KMeans) slots behind
    the same ivf_* functions. On data with REAL cluster structure (8
    Gaussian blobs) the trained quantizer recovers the blobs: every
    blob lands in one cell (nprobe=1 recall 100% for in-blob queries),
    and the inverted lists are near-perfectly balanced — what k-means
    buys at scale over a random codebook (even partitions, no hot
    inverted list). Also pins determinism: same (data, partitioning,
    seed) -> identical centers."""
    import collections

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((8, 16)) * 6.0
    rows = []
    for i in range(400):
        blob = i % 8
        v = centers[blob] + rng.standard_normal(16) * 0.3
        rows.append((i, blob, v.astype(float).tolist()))
    df = spark.createDataFrame(
        rows, "vec_id bigint, blob int, vec array<float>"
    )
    df8 = df.repartition(8, "vec_id")
    C1 = similarity.train_ivf_codebook(df8, "vec", cells=8, seed=123)
    C2 = similarity.train_ivf_codebook(df8, "vec", cells=8, seed=123)
    assert C1.shape == (8, 16)
    assert np.allclose(C1, C2)  # deterministic re-train, same layout

    celled = similarity.with_ivf_cell(df, "vec", dim=16, cells=8, codebook=C1)
    got = celled.select("vec_id", "blob", "cell").collect()
    assert all(1 <= r["cell"] <= 8 for r in got) and len(got) == 400
    # blob -> cell must be a bijection (k-means recovered the structure)
    blob_cells = collections.defaultdict(set)
    for r in got:
        blob_cells[r["blob"]].add(r["cell"])
    assert all(len(cs) == 1 for cs in blob_cells.values()), blob_cells
    assert len({next(iter(cs)) for cs in blob_cells.values()}) == 8
    # perfectly balanced inverted lists (50 per cell)
    sizes = collections.Counter(r["cell"] for r in got)
    assert set(sizes.values()) == {50}

    # nprobe=1 exact recall for an in-blob query: the trained cell IS
    # the blob's cell
    q = rows[17][2]
    top = similarity.ivf_topk(
        celled, "vec_id", "vec", q, dim=16, cells=8, nprobe=1, k=5,
        codebook=C1,
    ).collect()
    assert top[0]["vec_id"] == 17
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-6)
    assert all(r["vec_id"] % 8 == 17 % 8 for r in top)  # same blob


# --------------------------------------------------------------------------
# round 5: paragraph dedup / gopher rules / soft-404 templates
# --------------------------------------------------------------------------


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_paragraph_dedup_removal(spark):
    shared = "a b c d e f g h i j"  # one exact 10-word paragraph
    rows = [
        (0, shared + " " + _w(10, "x")),  # first occurrence -> kept
        (1, shared + " " + _w(10, "y")),  # later doc -> para removed
        (2, _w(10, "z")),                 # unique -> untouched
        (3, _w(10, "q") + " " + _w(10, "q")),  # within-doc repeat -> 2nd removed
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert got[0]["n_removed"] == 0 and got[0]["text_clean"] == rows[0][1]
    assert got[1]["n_removed"] == 1
    assert got[1]["text_clean"] == _w(10, "y")
    assert got[1]["dup_frac"] == 0.5
    assert got[2]["n_removed"] == 0 and got[2]["text_clean"] == rows[2][1]
    # within-doc duplicate: only the first (doc,pos) occurrence survives
    assert got[3]["n_removed"] == 1 and got[3]["text_clean"] == _w(10, "q")
    assert all(r["n_paras"] == (2 if i != 2 else 1) for i, r in got.items())


def test_paragraph_dedup_hashed_matches_exact(spark):
    rows = [(i, _w(25, "w" if i % 3 else "v")) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, dedup.paragraph_dedup(df, hashed=True).collect()))
    b = sorted(map(tuple, dedup.paragraph_dedup(df, hashed=False).collect()))
    assert a == b


def test_gopher_rules_boundaries(spark):
    rows = [
        (0, "the a " + _w(28, "bbb")),   # 30 words, stops=2 -> all pass?
        (1, "the a " + _w(27, "bbb")),   # 29 words -> wordcount fails
        (2, "the " + _w(29, "bbb")),     # stops=1 -> stopword rule fails
        (3, "the a " + _w(28, "bb")),    # short words -> wordlen low
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r
        for r in textstats.gopher_rules(df, "doc_id", "text").collect()
    }
    # doc 0: n=30, sumlen=3+1+28*3=88 -> 10*88=880 in [39*30, 48*30] ✓
    assert got[0]["keep"] and got[0]["n_words"] == 30
    assert not got[1]["rule_wordcount"] and not got[1]["keep"]
    assert got[1]["rule_stopwords"]  # stops=2 independent of count
    assert not got[2]["rule_stopwords"] and not got[2]["keep"]
    assert got[2]["rule_wordcount"]
    # doc 3: sumlen=3+1+28*2=60 -> 600 < 39*30=1170 -> wordlen fails
    assert not got[3]["rule_wordlen"] and not got[3]["keep"]
    assert got[3]["rule_wordcount"] and got[3]["rule_stopwords"]


def test_soft404_candidates(spark):
    from track0_spark.operators.boilerplate import soft404_candidates

    err_a, err_b = "not found a", "not found b"
    rows = (
        [(f"http://a.test/p{i}", err_a) for i in range(3)]       # flagged
        + [(f"http://b.test/p{i}", err_b) for i in range(2)]     # below min
        + [("http://b.test/only", err_a)]  # same text, OTHER host -> no merge
        + [("http://a.test/real", "unique body")]
    )
    df = spark.createDataFrame(rows, "url string, text string")
    got = soft404_candidates(df, "url", "text", min_urls=3).collect()
    assert {r["url"] for r in got} == {f"http://a.test/p{i}" for i in range(3)}
    assert all(r["host"] == "a.test" and r["n_urls_same_text"] == 3 for r in got)


# ------------- r6: arrow-kernel == expr-fold bit parity -------------------
# The optimization round replaced interpreted higher-order-function
# folds with vectorized numpy kernels (guide §4.2). These tests pin the
# BIT-level equality the oracle contract rides on — raw doubles via
# .hex(), integer signatures verbatim — on real sf0.01 tables PLUS
# adversarial rows (empty/whitespace/unicode/short docs).

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_adversarial(spark):
    base = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [
            (900001, ""),
            (900002, "   "),
            (900003, "a"),
            (900004, "a b"),
            (900005, "a b c"),
            (900006, "héllo wörld ünïcode héllo wörld"),
            (900007, "x\t\ty  z\n w \x0b v  a b c d"),
            (900008, "日本語 テスト 文字 列 日本語 テスト"),
            (900009, " lead and trail  "),
            (900010, "\t\n"),
            (900011, "a  b   c a  b   c a b"),
        ],
        "doc_id long, text string",
    )
    return base.unionByName(extra)


def test_minhash_signatures_arrow_matches_expr(docs_adversarial):
    d = docs_adversarial
    expr = {
        r["id"]: tuple(r["sig"])
        for r in dedup.minhash_native_signatures(
            d, "doc_id", "text", impl="expr"
        ).collect()
    }
    arrow = {
        r["id"]: tuple(r["sig"])
        for r in dedup.minhash_native_signatures(
            d, "doc_id", "text", impl="arrow"
        ).collect()
    }
    assert expr == arrow


def test_simhash_pairs_arrow_matches_expr(docs_adversarial):
    d = docs_adversarial
    pe = sorted(
        map(tuple, dedup.simhash_native_pairs(d, "doc_id", "text", impl="expr", handles=[]).collect())
    )
    pa = sorted(
        map(tuple, dedup.simhash_native_pairs(d, "doc_id", "text", impl="arrow", handles=[]).collect())
    )
    assert pe == pa and len(pe) > 0


def test_cosine_near_dup_arrow_matches_expr(spark):
    e = spark.read.parquet(f"{SF001}/embeddings.parquet")
    old = similarity.cosine_near_dup_pairs(
        e, "vec_id", "embedding", dim=64, planes=12, band_bits=4,
        threshold=0.35, handles=[], impl="expr",
    ).collect()
    new = similarity.cosine_near_dup_pairs(
        e, "vec_id", "embedding", dim=64, planes=12, band_bits=4,
        threshold=0.35, impl="arrow",
    ).collect()
    ro = sorted((r["id_a"], r["id_b"], r["cosine"].hex()) for r in old)
    rn = sorted((r["id_a"], r["id_b"], r["cosine"].hex()) for r in new)
    assert ro == rn and len(ro) > 0


def test_ann_lsh_arrow_matches_expr(spark):
    e = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [1.0 if i % 2 == 0 else 0.5 for i in range(64)]
    bucketed = similarity.with_lsh_bucket_native(e, "embedding", dim=64, planes=10)
    old = similarity.ann_topk_lsh(
        bucketed, "vec_id", "embedding", q, dim=64, planes=10, radius=2, k=10
    ).collect()
    new = similarity.ann_topk_lsh_arrow(
        e, "vec_id", "embedding", q, dim=64, planes=10, radius=2, k=10
    ).collect()
    assert [(r["vec_id"], r["score"].hex()) for r in old] == [
        (r["vec_id"], r["score"].hex()) for r in new
    ]


def test_ivf_topk_arrow_matches_expr(spark):
    e = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [1.0 if i % 2 == 0 else 0.5 for i in range(64)]
    celled = similarity.with_ivf_cell(e, "embedding", dim=64, cells=16)
    old = similarity.ivf_topk(
        celled, "vec_id", "embedding", q, dim=64, cells=16, nprobe=4, k=10
    ).collect()
    new = similarity.ivf_topk_arrow(
        e, "vec_id", "embedding", q, dim=64, cells=16, nprobe=4, k=10
    ).collect()
    assert [(r["vec_id"], r["score"].hex()) for r in old] == [
        (r["vec_id"], r["score"].hex()) for r in new
    ]
