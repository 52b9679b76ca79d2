"""Portable deterministic hash family — identical in pure Python, Spark
native Columns, and DuckDB SQL.

The round-1 MinHash/SimHash operators hash shingles/tokens with blake2b
inside numpy UDFs — fast, but inexpressible in DuckDB SQL, so the
driver's correctness gate could only do rows-only checks on q24–q27
(VERDICT r1 next #6). This module defines an arithmetic hash family
that all three engines evaluate bit-identically (verified empirically:
char-fold, min-perm, band-fold, and bit ops agree across
Spark 4.1 / DuckDB / CPython, including non-ASCII text):

  char_hash(s)   = fold over codepoints: acc*131  + cp   (mod 2^31-1)
  char_hash2(s)  = fold over codepoints: acc*137  + cp+1 (mod 2^31-1)
  token_hash62(t)= char_hash(t) | char_hash2(t) << 31     (62 bits)
  perms          = 64 seeded (a, b) pairs: sig_j = min (a_j*h+b_j) mod M
  band_fold      = fold over slots:        acc*1000003 + s (mod 2^31-1)

All intermediates fit signed int64: a*h <= (2^31)^2 = 2^62 < 2^63.
Seeded from track0s.hashing.SEED via numpy RandomState — reruns and
engines agree. The pure functions here are the reference the unit
tests pin; the Spark exprs live in track0_spark/operators/dedup.py and
the SQL templates in track0_spark/contract.py.
"""

from __future__ import annotations

MOD = 2_147_483_647  # 2^31 - 1 (prime)
CHAR_MUL = 131
CHAR_MUL2 = 137
BAND_MUL = 1_000_003
NUM_PERM = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
EMPTY_SIG = MOD  # sentinel slot value for docs with no shingles
SIMHASH_BITS = 62

#: NORMATIVE whitespace tokenizer class, spelled explicitly: Java
#: regex \s (Spark) is [ \t\n\x0B\f\r] but RE2 \s (DuckDB) lacks
#: \x0B, so twin queries written '\s+' silently disagree on text
#: containing a vertical tab. This source text equals Java \s exactly
#: (Spark behavior unchanged) and evaluates identically under RE2.
#: Escaping per engine: pyspark F.split/F.regexp_replace take the
#: source as-is; DuckDB string literals pass backslashes through
#: unescaped, so also as-is; Spark SQL string literals unescape once,
#: so use the *_SPARK_LIT renderings there.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"
TOKEN_SPLIT = WS_CLASS + "+"
WS_CLASS_SPARK_LIT = WS_CLASS.replace("\\", "\\\\")
TOKEN_SPLIT_SPARK_LIT = TOKEN_SPLIT.replace("\\", "\\\\")


def _perm_params() -> list[tuple[int, int]]:
    import numpy as np

    from .hashing import SEED

    rng = np.random.RandomState(SEED)
    a = rng.randint(1, MOD, size=NUM_PERM).astype(object)
    b = rng.randint(0, MOD, size=NUM_PERM).astype(object)
    return [(int(x), int(y)) for x, y in zip(a, b)]


#: the frozen 64 (a, b) multiply-shift permutation constants
PERMS: list[tuple[int, int]] = _perm_params()


def char_hash(s: str, mul: int = CHAR_MUL, bias: int = 0) -> int:
    """Engine-semantics char fold: Spark ``split(s, '')`` / DuckDB
    ``string_split(s, '')`` yield ``['']`` for the EMPTY string (one
    zero-codepoint char), so ``char_hash('')`` folds one step — bias
    included. Non-empty strings split into exactly their chars."""
    if s == "":
        return bias % MOD
    acc = 0
    for c in s:
        acc = (acc * mul + ord(c) + bias) % MOD
    return acc


def token_hash62(t: str) -> int:
    return char_hash(t) | (char_hash(t, CHAR_MUL2, 1) << 31)


def minhash_sig(shingles: list[str]) -> list[int]:
    if not shingles:
        return [EMPTY_SIG] * NUM_PERM
    hs = [char_hash(s) for s in shingles]
    return [min((a * h + b) % MOD for h in hs) for a, b in PERMS]


def band_keys(sig: list[int]) -> list[int]:
    keys = []
    for b in range(NUM_BANDS):
        acc = 0
        for r in range(ROWS_PER_BAND):
            acc = (acc * BAND_MUL + sig[b * ROWS_PER_BAND + r]) % MOD
        keys.append(acc)
    return keys


def simhash62(tokens: list[str]) -> int:
    n = len(tokens)
    ones = [0] * SIMHASH_BITS
    for t in tokens:
        h = token_hash62(t)
        for i in range(SIMHASH_BITS):
            ones[i] += (h >> i) & 1
    fp = 0
    for i in range(SIMHASH_BITS):
        if 2 * ones[i] > n:
            fp |= 1 << i
    return fp
