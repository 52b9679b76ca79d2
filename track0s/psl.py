"""Public Suffix List support for ``original-reg-domain`` (VERDICT r2
"Next round" #5).

Implements the publicsuffix.org algorithm (public knowledge of the PSL
format — the sandbox has no network, so no live list is fetched):

- rules are one suffix per line; ``//`` comments and blank lines are
  skipped; everything after whitespace on a rule line is ignored
- a rule matches a host when the host's trailing labels equal the
  rule's labels; ``*`` matches exactly one label
- among matching rules the one with the MOST labels wins; an exception
  rule (leading ``!``) beats any wildcard rule and yields a public
  suffix of its own labels minus the leftmost
- if no rule matches, the implicit rule ``*`` applies (public suffix =
  last label)
- the registered (registrable) domain is the public suffix plus one
  more label; a host that IS a public suffix has no registered domain
  and is returned unchanged (the conservative choice for rule matching
  — same as the frozen-subset fallback's single-label behavior)

``track0s.canon.registered_domain`` keeps the frozen 22-suffix subset
as the zero-config fallback; passing ``psl=`` (or setting
``CrawlConfig.psl_path``) swaps in a real list behind the same
function. The Spark twin compiles the SAME parsed rules into native
per-level membership predicates (functions/rules_compile.py), so both
backends agree by construction — property-tested against the vendored
snapshot in tests/fixtures/psl_snapshot.dat.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PublicSuffixList:
    #: exact rules, keyed by label count: {2: {"co.uk", ...}, ...}
    exact: dict = field(default_factory=dict)
    #: parents of wildcard rules ("*.ck" -> "ck"), keyed by PARENT label count
    wildcard: dict = field(default_factory=dict)
    #: exception rules ("!www.ck" -> "www.ck"), keyed by label count
    exception: dict = field(default_factory=dict)

    @staticmethod
    def from_lines(lines) -> "PublicSuffixList":
        exact: dict[int, set] = {}
        wildcard: dict[int, set] = {}
        exception: dict[int, set] = {}
        for raw in lines:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            rule = line.split()[0].lower().rstrip(".")
            if rule.startswith("!"):
                r = rule[1:]
                exception.setdefault(r.count(".") + 1, set()).add(r)
            elif rule.startswith("*."):
                parent = rule[2:]
                wildcard.setdefault(parent.count(".") + 1, set()).add(parent)
            elif rule == "*":
                pass  # the implicit default rule; always applied
            else:
                exact.setdefault(rule.count(".") + 1, set()).add(rule)
        return PublicSuffixList(exact, wildcard, exception)

    @staticmethod
    def from_file(path: str) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as f:
            return PublicSuffixList.from_lines(f)

    def suffix_labels(self, host: str) -> int:
        """Number of labels in the host's public suffix (>= 1)."""
        labels = host.split(".")
        n = len(labels)
        best = 1  # implicit '*' rule
        for k, rules in self.exact.items():
            if k <= n and k > best and ".".join(labels[-k:]) in rules:
                best = k
        for pk, parents in self.wildcard.items():
            k = pk + 1
            if k <= n and k > best and ".".join(labels[-pk:]) in parents:
                best = k
        for k, rules in self.exception.items():
            # exception: public suffix = rule labels minus the leftmost;
            # beats the wildcard it punches through (always longer match
            # by the "most labels wins" ordering, so checking last wins)
            if k <= n and ".".join(labels[-k:]) in rules:
                best = k - 1
        return best

    def registered_domain(self, host: str) -> str:
        labels = host.split(".")
        k = self.suffix_labels(host)
        if len(labels) <= k:
            return host  # host IS a public suffix (or single label)
        return ".".join(labels[-(k + 1):])

    def max_labels(self) -> int:
        """Longest rule length (labels) — bounds the Spark CASE chain."""
        ks = (
            list(self.exact)
            + [k + 1 for k in self.wildcard]
            + list(self.exception)
        )
        return max(ks, default=1)
