"""Table-driven canonicalization tests (SURVEY.md §5.2.3, U1)."""

import pytest

from track0s.canon import canonicalize, host_of, path_of, scheme_of

CASES = [
    # (input, expected)
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTP://example.com", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/p/../p/7", "http://example.com/p/7"),
    ("http://example.com/a/..", "http://example.com/"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    ("http://example.com/a?q=1&r=2", "http://example.com/a?q=1&r=2"),
    ("http://example.com/a?q=%41", "http://example.com/a?q=A"),
    ("http://example.com/a?x=1#f", "http://example.com/a?x=1"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/%zz", "http://example.com/%zz"),  # malformed kept
    # Hypothesis counterexample from round 1 (VERDICT.md "What's wrong" #1):
    # a fragment must not shield trailing whitespace from the trim.
    ("0 #", "0"),
    ("http://example.com/a #f", "http://example.com/a"),
    ("  0 # junk ", "0"),
    # Hypothesis counterexample from round 2 (VERDICT.md "What's wrong" #1):
    # a bare '?' (empty query) is dropped by urlunsplit, which used to
    # resurrect trailing whitespace in the path; the output .strip() makes
    # the canonical form a fixpoint for the whole delimiter-drop class.
    ("0 ?", "0"),
    ("http://example.com/a ?", "http://example.com/a"),
    ("0 ?#", "0"),
    ("? x", "? x"),  # query-only relative form, already a fixpoint
    # lazy urlsplit errors (port parses on ACCESS, inside the guard)
    ("http://h.test:99999/p", "http://h.test:99999/p"),
    ("http://h.test:8x/p", "http://h.test:8x/p"),
    # IPv6 brackets restored (hostname strips them; output re-parses)
    ("http://[2001:db8::1]/x", "http://[2001:db8::1]/x"),
    ("http://[2001:DB8::1]:8080/x", "http://[2001:db8::1]:8080/x"),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_canonicalize(url, expected):
    assert canonicalize(url) == expected


def test_idempotent():
    for url, _ in CASES:
        c = canonicalize(url)
        assert canonicalize(c) == c


def test_parts():
    assert host_of("http://H0.Example.Test/p/1") == "h0.example.test"
    assert path_of("http://h0.example.test") == "/"
    assert scheme_of("HTTPS://x/") == "https"
