"""The rule fixture table re-run through the Spark Column compiler.

One fixture file, two backends (SURVEY.md §2.3 R12): every case in
tests/fixtures/rules.json must produce the same decision from
``track0s.rules.evaluate`` and from the compiled ``CASE WHEN`` chain.
All cases are evaluated in ONE Spark job over a DataFrame of cases.
"""

import json
import pathlib

from pyspark.sql import functions as F, types as T

from track0s.rules import DEFAULTS, evaluate, parse_pipeline
from track0_spark.functions.rules_compile import compile_rules
from tests.test_rules import attrs_with_defaults

FIXTURES = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "rules.json").read_text()
)

ATTR_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("domain_depth", T.IntegerType()),
        T.StructField("via_host", T.StringType()),
        T.StructField("is_requisite", T.BooleanType()),
        T.StructField("src_tag", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("size", T.IntegerType()),
    ]
)


def test_fixture_cases_match_python_backend(spark):
    for case in FIXTURES:
        attrs = attrs_with_defaults(dict(case["attrs"]))
        rules = parse_pipeline(case["rules"])
        expected = evaluate(rules, attrs, case["default"])
        assert expected == case["expected"]  # fixture sanity vs Python

        row = tuple(
            [case["id"]] + [attrs[f.name] for f in ATTR_SCHEMA.fields[1:]]
        )
        df = spark.createDataFrame([row], schema=ATTR_SCHEMA)
        col = compile_rules(
            rules,
            case["default"],
            sorted(attrs["seed_hosts"]),
            list(attrs["seed_prefixes"]),
        )
        got = df.select(col.alias("decision")).collect()[0]["decision"]
        assert got == expected, case["id"]


def test_random_pipelines_agree(spark):
    """Seeded sweep: many pipelines x many attr rows, one Spark job."""
    import itertools

    pipelines = [
        "+original-domain -depth>3",
        "-depth>3 +original-domain",
        "+domain=*.example.test -url=*forum* +requisite",
        "+depth<=9 -domain-depth>2 +tag=a",
        "+path=/p/* -path=/p/1*",
        "+protocol=https +same-domain",
        "-size>1000 +content-type=text/*",
    ]
    hosts = ["h0.example.test", "x.other.test", None]
    rows = []
    rid = 0
    for host, depth, dd, req, via in itertools.product(
        hosts, [0, 2, 4], [0, 3], [True, False], ["h0.example.test", None]
    ):
        url = f"http://{host}/p/1{rid % 3}" if host else None
        rows.append(
            (
                str(rid),
                url,
                host,
                f"/p/1{rid % 3}" if host else None,
                "http" if rid % 4 else "https",
                depth,
                dd,
                via,
                req,
                "a" if rid % 2 else "img",
                "text/html" if rid % 3 else "image/png",
                None if rid % 5 == 0 else 100 * rid,
            )
        )
        rid += 1
    df = spark.createDataFrame(rows, schema=ATTR_SCHEMA)
    seed_hosts = ["h0.example.test"]
    seed_prefixes = ["http://h0.example.test/p/"]

    sel = [F.col("case_id")]
    for i, p in enumerate(pipelines):
        ast = parse_pipeline(p)
        sel.append(
            compile_rules(ast, DEFAULTS["follow"], seed_hosts, seed_prefixes).alias(
                f"d{i}"
            )
        )
    got = {r["case_id"]: r for r in df.select(sel).collect()}

    for row in rows:
        attrs = {f.name: v for f, v in zip(ATTR_SCHEMA.fields, row)}
        attrs["seed_hosts"] = frozenset(seed_hosts)
        attrs["seed_prefixes"] = tuple(seed_prefixes)
        for i, p in enumerate(pipelines):
            ast = parse_pipeline(p)
            exp = evaluate(ast, attrs, DEFAULTS["follow"])
            assert got[row[0]][f"d{i}"] == exp, (p, attrs)


def test_trap_signal_columns_match_python_sweep(spark):
    """Derived trap signals (path-loop / path-depth / query-params):
    the native Column folds agree with the Python functions on a
    deterministic random sweep of adversarial paths/urls — one Spark
    job for the whole sweep."""
    import random

    from track0s.rules import path_depth, path_loop, query_params
    from track0_spark.functions.rules_compile import (
        path_depth_col,
        path_loop_col,
        query_params_col,
    )

    rng = random.Random(42)
    segs = ["a", "b", "aa", "x%7E", ".", "idx"]
    rows = []
    for i in range(300):
        path = "/" + "/".join(
            rng.choice(segs) for _ in range(rng.randrange(0, 12))
        )
        if rng.random() < 0.3:
            path += "/"
        params = "&".join(
            rng.choice(["a=1", "b=?", "", "c&d" if rng.random() < 0.1 else "e=2"])
            for _ in range(rng.randrange(0, 6))
        )
        url = f"http://h.test{path}" + (f"?{params}" if rng.random() < 0.7 else "")
        rows.append((str(i), path, url))
    rows.append(("null-path", None, None))
    rows.append(("empty", "", ""))
    df = spark.createDataFrame(
        rows, "case_id string, path string, url_canon string"
    )
    got = {
        r["case_id"]: (r["pl"], r["pd"], r["qp"])
        for r in df.select(
            "case_id",
            path_loop_col(F.col("path")).alias("pl"),
            path_depth_col(F.col("path")).alias("pd"),
            query_params_col(F.col("url_canon")).alias("qp"),
        ).collect()
    }
    for case_id, path, url in rows:
        exp = (
            path_loop(path) if path is not None else None,
            path_depth(path) if path is not None else None,
            query_params(url) if url is not None else None,
        )
        assert got[case_id] == exp, (case_id, path, url)
