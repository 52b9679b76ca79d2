"""PartitionedCuckoo unit tests: no-false-negatives (the exactness-
preserving property, as for the Bloom gate), deletion, saturation
degradation, and distributed-build equivalence."""

import numpy as np

from track0_spark.operators.bloom import H64_MASK
from track0_spark.operators.cuckoo import PartitionedCuckoo
from track0s.hashing import h64


def keys_of(urls):
    return np.array([h64(u) & H64_MASK for u in urls], dtype=np.int64)


def test_no_false_negatives():
    c = PartitionedCuckoo(expected_keys=10000)
    added = keys_of([f"http://h{i % 7}.test/p/{i}" for i in range(5000)])
    c.add_many(added)
    assert c.might_contain_many(added).all()


def test_false_positive_rate_reasonable():
    c = PartitionedCuckoo(expected_keys=10000)
    c.add_many(keys_of([f"http://a.test/{i}" for i in range(10000)]))
    probe = keys_of([f"http://b.test/{i}" for i in range(20000)])
    fp = c.might_contain_many(probe).mean()
    assert fp < 0.02, fp  # 16-bit fingerprints -> far below bloom's rate


def test_delete_restores_absence():
    """The capability a Bloom lacks: retire seen entries in place."""
    c = PartitionedCuckoo(expected_keys=1000)
    keep = keys_of([f"http://x.test/keep/{i}" for i in range(300)])
    retire = keys_of([f"http://x.test/old/{i}" for i in range(300)])
    c.add_many(keep)
    c.add_many(retire)
    assert c.might_contain_many(retire).all()
    removed = c.delete_many(retire)
    assert removed == 300
    # every kept key still answers yes (no collateral false negatives)
    assert c.might_contain_many(keep).all()
    # most retired keys now answer no (residual yes = fp collisions only)
    assert c.might_contain_many(retire).mean() < 0.02


def test_saturation_degrades_to_maybe_not_wrong():
    """Overfill a tiny filter: saturated buckets must answer 'maybe'
    for EVERYTHING (never a false negative), not drop keys."""
    c = PartitionedCuckoo(expected_keys=1024, n_buckets=4)
    added = keys_of([f"http://h.test/{i}" for i in range(20000)])
    c.add_many(added)
    assert c.saturated.any()  # 20x overfull -> must have saturated
    assert c.might_contain_many(added).all()


def test_distributed_build_equivalent(spark):
    """build_cuckoo_distributed: membership of every inserted key holds
    (layout may differ from the incremental path; semantics must not)."""
    from track0_spark.operators.cuckoo import build_cuckoo_distributed

    urls = [f"http://h{i % 11}.test/p/{i}" for i in range(4000)]
    keys = keys_of(urls)
    seen_df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_h64 long"
    ).repartition(8)
    dist = build_cuckoo_distributed(seen_df, expected_keys=20000)
    assert dist.might_contain_many(keys).all()
    assert dist.n_keys == len(keys)
    assert not dist.saturated.any()
    fresh = keys_of([f"http://z.test/{i}" for i in range(5000)])
    assert dist.might_contain_many(fresh).mean() < 0.02


def test_delete_collision_no_false_negative():
    """Regression (r2 review): two distinct keys sharing (bucket, fp,
    i1) must BOTH survive membership after one of them is deleted —
    add is non-idempotent, so each stores its own fingerprint copy."""
    from track0_spark.operators.cuckoo import key_parts

    c = PartitionedCuckoo(expected_keys=2_000_000)
    rng = np.random.default_rng(7)
    ks = rng.integers(0, 2**62, size=1_500_000, dtype=np.int64)
    b, fp, i1, _ = key_parts(ks, c.n_buckets, c.n_rows)
    combo = (
        b.astype(np.int64) * (1 << 40)
        + fp.astype(np.int64) * (1 << 20)
        + i1.astype(np.int64)
    )
    _, idx, counts = np.unique(combo, return_index=True, return_counts=True)
    dup_combo = combo[idx[counts > 1]][0]
    pair = np.nonzero(combo == dup_combo)[0][:2]
    k1, k2 = int(ks[pair[0]]), int(ks[pair[1]])
    assert k1 != k2
    c.add_many(np.array([k1, k2], dtype=np.int64))  # same sizing as search
    assert c.n_keys == 2  # NON-idempotent: both copies stored
    assert c.delete_many(np.array([k1], dtype=np.int64)) == 1
    assert c.might_contain_many(np.array([k2], dtype=np.int64)).all()


def test_design_load_not_saturated():
    """Regression (r2 review): at the advertised design load no bucket
    may saturate, and fresh keys must still be pruned (fp rate small) —
    i1 must span the whole row space within every bucket."""
    c = PartitionedCuckoo(expected_keys=200_000)
    rng = np.random.default_rng(11)
    c.add_many(rng.integers(0, 2**62, size=200_000, dtype=np.int64))
    assert not c.saturated.any()
    assert 0.5 < c.fill_ratio() <= 1.0  # rows actually reachable
    fresh = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    assert c.might_contain_many(fresh).mean() < 0.05


def test_non_power_of_two_buckets_rejected():
    """Regression (ADVICE r2): uint64-mod and Spark pmod routing only
    agree when n_buckets is a power of two; any other count must be
    rejected up front rather than silently producing false negatives
    on negative keys."""
    import pytest

    for bad in (3, 12, 48, 100):
        with pytest.raises(ValueError):
            PartitionedCuckoo(expected_keys=1024, n_buckets=bad)
    PartitionedCuckoo(expected_keys=1024, n_buckets=16)  # pow2 fine


def test_delete_in_saturated_bucket_is_skipped():
    """Regression (ADVICE r2): keys routed to a saturated bucket were
    never stored (_insert_one early-returns), so delete_many must skip
    them — otherwise a fingerprint match could erase ANOTHER key's copy
    and n_keys would drift below the true stored count."""
    c = PartitionedCuckoo(expected_keys=1024, n_buckets=4)
    first = keys_of([f"http://h.test/{i}" for i in range(20000)])
    c.add_many(first)
    assert c.saturated.all()  # 20x overfull tiny filter
    stored_before = c.n_keys
    # "insert" then "retire" fresh keys post-saturation: none stored,
    # so none may be deleted and n_keys must not move
    late = keys_of([f"http://late.test/{i}" for i in range(500)])
    c.add_many(late)
    assert c.n_keys == stored_before
    assert c.delete_many(late) == 0
    assert c.n_keys == stored_before
    # membership still answers 'maybe' for everything in saturated buckets
    assert c.might_contain_many(first).all()
    assert c.might_contain_many(late).all()
