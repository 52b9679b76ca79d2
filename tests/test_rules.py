"""Rule pipeline truth table (FIXTURES.md §4; SURVEY.md §2.3).

The same cases are re-evaluated against the Spark Column compiler in
``tests/test_rules_spark.py`` — one fixture table, two backends.
"""

import json
import pathlib

import pytest

from track0s.rules import (
    Rule,
    RuleSyntaxError,
    evaluate,
    glob_to_regex,
    parse_pipeline,
)

FIXTURES = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "rules.json").read_text()
)


def attrs_with_defaults(a):
    base = {
        "url_canon": None,
        "host": None,
        "path": None,
        "protocol": "http",
        "depth": 0,
        "domain_depth": 0,
        "via_host": None,
        "is_requisite": False,
        "src_tag": None,
        "content_type": None,
        "size": None,
        "seed_hosts": frozenset(a.pop("seed_hosts", ["h0.example.test"])),
        "seed_prefixes": tuple(a.pop("seed_prefixes", [])),
    }
    base.update(a)
    return base


@pytest.mark.parametrize("case", FIXTURES, ids=[c["id"] for c in FIXTURES])
def test_fixture_case(case):
    rules = parse_pipeline(case["rules"])
    attrs = attrs_with_defaults(dict(case["attrs"]))
    got = evaluate(rules, attrs, case["default"])
    assert got == case["expected"], case


def test_parse():
    rs = parse_pipeline("+original-domain -depth>3 +url=*forum* -size<=100")
    assert rs[0] == Rule(True, "original-domain", None, None)
    assert rs[1] == Rule(False, "depth", ">", 3)
    assert rs[2] == Rule(True, "url", "=", "*forum*")
    assert rs[3] == Rule(False, "size", "<=", 100)


@pytest.mark.parametrize(
    "bad", ["depth>3", "+depth", "+nope=3", "+original-domain>2", "+depth=x"]
)
def test_parse_errors(bad):
    with pytest.raises(RuleSyntaxError):
        parse_pipeline(bad)


def test_last_match_wins():
    rules = parse_pipeline("+depth<=5 -depth>3 +requisite")
    assert evaluate(rules, attrs_with_defaults({"depth": 2}), False) is True
    assert evaluate(rules, attrs_with_defaults({"depth": 4}), False) is False
    assert (
        evaluate(
            rules, attrs_with_defaults({"depth": 9, "is_requisite": True}), False
        )
        is True
    )


def test_glob_regex():
    import re

    assert re.match(glob_to_regex("*forum*"), "http://x/forum/1")
    assert not re.match(glob_to_regex("*forum*"), "http://x/f0rum")
    assert re.match(glob_to_regex("a?c"), "abc")
    assert not re.match(glob_to_regex("a?c"), "abbc")
    # regex metachars in glob are literal
    assert re.match(glob_to_regex("a.c"), "a.c")
    assert not re.match(glob_to_regex("a.c"), "axc")
    # multiline/dotall: * crosses newlines
    assert re.match(glob_to_regex("a*c"), "a\nc")
