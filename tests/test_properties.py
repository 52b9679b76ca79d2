"""Property-based tests over the pure core (SURVEY.md §5.2.5).

Uses hypothesis when available, else a seeded-random fallback sweep —
same properties either way: canonicalization idempotence, glob/regex
agreement, rule-evaluator determinism, oracle invariants (politeness
bound, admitted ⊆ extracted, dedup idempotence).
"""

import random
import string

import pytest

from track0s.canon import canonicalize, host_of, path_of
from track0s.rules import evaluate, glob_to_regex, parse_pipeline

try:
    from hypothesis import example, given, settings, strategies as st

    HAVE_HYP = True
except ImportError:
    HAVE_HYP = False


url_alphabet = string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.%-_~"


def rand_urls(n=500, seed=42):
    rng = random.Random(seed)
    for _ in range(n):
        host = "".join(rng.choices(string.ascii_letters + string.digits + ".-", k=rng.randint(1, 20)))
        path = "".join(rng.choices(url_alphabet, k=rng.randint(0, 40)))
        yield f"http://{host}/{path}"


if HAVE_HYP:

    @given(st.text(alphabet=url_alphabet, max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_canon_idempotent_hyp(suffix):
        u = "http://ex.test/" + suffix
        c = canonicalize(u)
        assert canonicalize(c) == c

    @given(st.text(alphabet=string.printable, max_size=30))
    @settings(max_examples=2000, deadline=None)
    @example(
        s='0 ?',
    ).via('discovered failure')
    @example(s='0 #').via('round-1 counterexample')
    @example(s='0 ?#').via('both delimiters')
    @example(s=' a b ?')
    def test_canon_total_hyp(s):
        # never raises, never returns None, idempotent on anything
        c = canonicalize(s)
        assert isinstance(c, str)
        assert canonicalize(c) == c


def test_canon_idempotent_sweep():
    for u in rand_urls():
        c = canonicalize(u)
        assert canonicalize(c) == c, u


def test_host_path_total():
    for u in rand_urls(seed=7):
        assert isinstance(host_of(u), str)
        assert isinstance(path_of(u), str)


def test_glob_regex_matches_fnmatch_semantics():
    import re

    rng = random.Random(3)
    chars = string.ascii_lowercase + "*?./"
    for _ in range(400):
        glob = "".join(rng.choices(chars, k=rng.randint(1, 12)))
        text = "".join(rng.choices(string.ascii_lowercase + "./", k=rng.randint(0, 15)))
        got = re.match(glob_to_regex(glob), text) is not None
        # reference: fnmatch with case sensitivity
        import fnmatch

        exp = fnmatch.fnmatchcase(text, glob)
        assert got == exp, (glob, text)


def test_rule_eval_deterministic_and_total():
    rng = random.Random(9)
    pipeline = parse_pipeline("+original-domain -depth>3 +requisite -url=*x* +domain=*.test")
    for _ in range(300):
        attrs = {
            "url_canon": f"http://h{rng.randint(0,3)}.test/p/{rng.randint(0,9)}",
            "host": f"h{rng.randint(0,3)}.test",
            "path": "/p",
            "protocol": "http",
            "depth": rng.randint(0, 8),
            "domain_depth": rng.randint(0, 8),
            "via_host": None,
            "is_requisite": rng.random() < 0.5,
            "src_tag": "a",
            "content_type": None,
            "size": None,
            "seed_hosts": frozenset({"h0.test"}),
            "seed_prefixes": ("http://h0.test/",),
        }
        a = evaluate(pipeline, attrs, False)
        b = evaluate(pipeline, attrs, False)
        assert a == b


def test_oracle_invariants():
    """Politeness bound ∀host∀round; admitted ⊆ extracted∪seeds; no URL
    fetched twice."""
    from collections import Counter

    from datagen import webgen
    from reference_impl.spider import OracleSpider
    from track0s.config import CrawlConfig
    from track0s.robots import RobotsTable

    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT), default_budget=7)
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS, follow="+original-domain -depth>4 +requisite",
        robots=robots, default_budget=7, max_rounds=60,
    )
    sp = OracleSpider(cfg, webgen.store_from_rows(webgen.gen_pages(webgen.SF_UNIT)))
    log = sp.run()
    per = Counter((r["round"], r["host"]) for r in log)
    for (rnd, host), n in per.items():
        assert n <= robots.budget(host), (rnd, host, n)
    urls = [r["url_canon"] for r in log]
    assert len(urls) == len(set(urls))  # never fetched twice
    assert set(urls) <= sp.seen


# --------------------------------------------------------------------------
# portable hash family: pure Python vs DuckDB SQL on arbitrary text
# (no JVM needed — the Spark twin is pinned separately in test_portable;
# this sweeps the Python<->DuckDB pair over a much larger input space)
# --------------------------------------------------------------------------


def _duck_minhash(texts):
    import duckdb

    from track0_spark.contract import DUCK_PERMS_SQL, duck_char_hash
    from track0s import portable as P

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
    )
    q = f"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text, ' '), '{P.TOKEN_SPLIT}') AS words FROM docs),
    sh AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [] ELSE
             list_distinct(list_transform(range(1, len(words)-1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END AS shingles FROM w),
    hs AS (SELECT doc_id, list_transform(shingles, s -> {duck_char_hash('s')}) AS hs FROM sh)
    SELECT doc_id, list_transform({DUCK_PERMS_SQL}, p -> CASE WHEN len(hs) = 0
             THEN {P.EMPTY_SIG}::BIGINT
             ELSE list_min(list_transform(hs, x -> (p[1]*x + p[2]) % {P.MOD})) END)
    FROM hs ORDER BY doc_id
    """
    return [r[1] for r in con.execute(q).fetchall()]


def _py_minhash(t):
    import re

    from track0s import portable as P

    words = re.split(P.TOKEN_SPLIT, t.strip(" "))
    sh, seen = [], set()
    for i in range(max(0, len(words) - 2)):
        s = " ".join(words[i : i + 3])
        if s not in seen:
            seen.add(s)
            sh.append(s)
    return P.minhash_sig(sh)


# text alphabet: words + every ASCII whitespace + exotic Unicode
# whitespace (NBSP, NEL, IDEOGRAPHIC SPACE) + non-ASCII letters —
# exactly the classes where Python/RE2/Java \s semantics diverge
_text_alpha = (
    string.ascii_letters + string.digits + " \t\n\x0b\x0c\r"
    + "\xa0\x85　éüñß中文"
)


def rand_texts(n=200, seed=7):
    rng = random.Random(seed)
    for _ in range(n):
        yield "".join(
            rng.choice(_text_alpha) for _ in range(rng.randrange(0, 120))
        )


if HAVE_HYP:

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.text(alphabet=_text_alpha, max_size=120),
            min_size=1,
            max_size=8,
        )
    )
    def test_minhash_python_duckdb_twin_hyp(texts):
        got = _duck_minhash(texts)
        assert got == [_py_minhash(t) for t in texts]

else:

    def test_minhash_python_duckdb_twin_sweep():
        texts = list(rand_texts())
        got = _duck_minhash(texts)
        assert got == [_py_minhash(t) for t in texts]


def test_minhash_python_duckdb_twin_seeded():
    """Seeded sweep always runs (hypothesis or not) — includes the
    divergence-prone whitespace classes in every run."""
    texts = list(rand_texts()) + [
        "", " ", "\x0b", "a\x0bb c d", "x\xa0y z w", "　a b c　",
        "é ü ñ", "中 文 字 符", "a\r\nb\r\nc\r\nd",
    ]
    got = _duck_minhash(texts)
    assert got == [_py_minhash(t) for t in texts]


def test_lower_simple_vs_full_divergence_bound():
    """Documents the ONE known twin-equivalence exception (see
    contract.py): DuckDB lower() is the SIMPLE Unicode mapping, while
    Spark/Python use the FULL mapping. They differ exactly on
    codepoints whose full lowercase expands — U+0130 'İ' — and agree
    on every other case-tricky char we know of. If this test ever
    fails because DuckDB starts matching, the lower()-twins' scope
    note in contract.py can be deleted."""
    import duckdb

    agree = "ıΣςẞﬁABCÉÜÑДЖ中"
    assert duckdb.sql(f"SELECT lower('{agree}')").fetchone()[0] == agree.lower()
    assert duckdb.sql("SELECT lower('İ')").fetchone()[0] == "i"
    assert "İ".lower() == "i̇"  # full mapping: i + combining dot
