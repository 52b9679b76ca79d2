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
