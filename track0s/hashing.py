"""Deterministic 64-bit hashing for the pure-Python side.

``h64`` is the generator/oracle-side hash (blake2b-8, seed-mixed). It is
*not* required to equal Spark's ``xxhash64`` — nothing in the engine
compares the two: Spark uses ``F.xxhash64`` for bucketing/salting only,
and every ordering key is (host, priority, depth, url_canon), never a
hash (SURVEY.md §4 determinism row). Collision-safety of the seen set
does not rest on any hash either: the exact anti-join always carries
``url_canon`` alongside ``url_hash`` (SURVEY.md §2.4 D2).
"""

from __future__ import annotations

import hashlib

SEED = 42


def h64(s: str, salt: str = "") -> int:
    """Deterministic unsigned 64-bit hash of a string (pure function)."""
    b = hashlib.blake2b(
        f"{SEED}|{salt}|{s}".encode("utf-8"), digest_size=8
    ).digest()
    return int.from_bytes(b, "big")
