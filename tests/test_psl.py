"""Public Suffix List option (track0s/psl.py; VERDICT r2 next #5):
table-driven registered_domain for 3-level suffixes, wildcards and
exceptions beyond the frozen subset; Spark-native compilation agrees
with the Python algorithm on every host shape; the original-reg-domain
rule honors the PSL in BOTH backends."""

import os

import pytest

from track0s.canon import registered_domain
from track0s.psl import PublicSuffixList

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "psl_snapshot.dat")

# (host, expected registrable domain under the snapshot PSL)
TABLE = [
    # plain 2-level TLD behavior
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    # 2-level public suffixes
    ("www.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    # 3-level public suffixes BEYOND the frozen 22-suffix subset
    ("school.act.edu.au", "school.act.edu.au"),
    ("www.school.act.edu.au", "school.act.edu.au"),
    ("lab.ide.kyoto.jp", "lab.ide.kyoto.jp"),
    ("www.lab.ide.kyoto.jp", "lab.ide.kyoto.jp"),
    ("district.pvt.k12.ma.us", "district.pvt.k12.ma.us"),
    ("www.district.pvt.k12.ma.us", "district.pvt.k12.ma.us"),
    # wildcard rules: *.ck makes <label>.ck a public suffix
    ("example.biz.ck", "example.biz.ck"),
    ("www.example.biz.ck", "example.biz.ck"),
    # exception rules punch through the wildcard
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    # but other kawasaki.jp labels stay wildcard public suffixes
    ("example.town.kawasaki.jp", "example.town.kawasaki.jp"),
    # host IS a public suffix -> unchanged (no registrable domain)
    ("co.uk", "co.uk"),
    ("ide.kyoto.jp", "ide.kyoto.jp"),
    ("biz.ck", "biz.ck"),
    ("com", "com"),
    # unknown TLD: implicit * rule, last label is the suffix
    ("example.zz", "example.zz"),
    ("www.example.zz", "example.zz"),
    ("zz", "zz"),
]


@pytest.fixture(scope="module")
def psl():
    return PublicSuffixList.from_file(FIXTURE)


def test_registered_domain_table(psl):
    for host, want in TABLE:
        assert registered_domain(host, psl) == want, host


def test_frozen_fallback_unchanged():
    # psl=None keeps the PSL-lite behavior bit-for-bit
    assert registered_domain("www.example.co.uk") == "example.co.uk"
    assert registered_domain("www.example.com") == "example.com"
    assert registered_domain("localhost") == "localhost"
    # ...including its known blind spot the PSL option fixes
    assert registered_domain("www.school.act.edu.au") == "edu.au"


def test_spark_native_psl_agrees(spark, psl):
    """reg_domain_col_psl == Python algorithm over every table host
    plus adversarial shapes (single label, deep nesting, empties)."""
    from track0_spark.functions.rules_compile import reg_domain_col_psl

    hosts = [h for h, _ in TABLE] + [
        "x", "a.b", "deep.a.b.c.d.e.f.example.co.uk",
        "kawasaki.jp", "ck", "k12.ma.us", "a.k12.ma.us",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            "host", reg_domain_col_psl(psl).alias("reg")
        ).collect()
    }
    for h in hosts:
        assert got[h] == registered_domain(h, psl), h


def test_reg_domain_rule_psl_both_backends(spark, tmp_path):
    """An original-reg-domain crawl rule with a PSL: the compiled Spark
    predicate and the oracle's rule_matches agree on admission for
    hosts sharing (and not sharing) the seed's registrable domain."""
    from pyspark.sql import functions as F

    from track0s.config import CrawlConfig
    from track0s.rules import DEFAULTS, rule_matches
    from track0_spark.functions.rules_compile import compile_rules

    cfg = CrawlConfig.from_specs(
        ["http://www.shop.act.edu.au/index.html"],
        follow="+original-reg-domain",
        psl_path=FIXTURE,
    )
    assert cfg.psl is not None
    hosts = [
        "www.shop.act.edu.au",      # the seed host itself
        "mail.shop.act.edu.au",     # same registrable domain
        "shop.act.edu.au",
        "other.act.edu.au",         # DIFFERENT registrable domain
        "shop.nsw.edu.au",
        "www.shop.example.com",
        "act.edu.au",               # the bare public suffix
    ]
    col = compile_rules(
        cfg.follow, DEFAULTS["follow"], sorted(cfg.seed_hosts),
        list(cfg.seed_prefixes), psl=cfg.psl,
    )
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["d"] for r in df.select("host", col.alias("d")).collect()}
    for h in hosts:
        attrs = {
            "host": h, "seed_hosts": cfg.seed_hosts,
            "seed_prefixes": cfg.seed_prefixes, "psl": cfg.psl,
        }
        want = rule_matches(cfg.follow[0], attrs)
        assert got[h] == want, h
    assert got["mail.shop.act.edu.au"] is True
    assert got["other.act.edu.au"] is False
    assert got["act.edu.au"] is False
