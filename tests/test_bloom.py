"""PartitionedBloom unit tests: the no-false-negatives property is what
makes the gate exactness-preserving (SURVEY.md §2.4 D3)."""

import numpy as np

from track0_spark.operators.bloom import H64_MASK, PartitionedBloom
from track0s.hashing import h64


def keys_of(urls):
    return np.array([h64(u) & H64_MASK for u in urls], dtype=np.int64)


def test_no_false_negatives():
    b = PartitionedBloom(expected_keys=10000)
    added = keys_of([f"http://h{i % 7}.test/p/{i}" for i in range(5000)])
    b.add_many(added)
    assert b.might_contain_many(added).all()


def test_false_positive_rate_reasonable():
    b = PartitionedBloom(expected_keys=10000)
    b.add_many(keys_of([f"http://a.test/{i}" for i in range(10000)]))
    probe = keys_of([f"http://b.test/{i}" for i in range(20000)])
    fp = b.might_contain_many(probe).mean()
    assert fp < 0.05, fp


def test_distributed_build_bit_identical(spark):
    """build_bloom_distributed == incremental driver add_many, bit for bit
    (the resume-path guarantee: VERDICT r1 'What's wrong' #4)."""
    from track0_spark.operators.bloom import build_bloom_distributed

    urls = [f"http://h{i % 11}.test/p/{i}" for i in range(4000)]
    keys = keys_of(urls)
    ref = PartitionedBloom(expected_keys=20000)
    # add in several deltas, as the loop does round by round
    for lo in range(0, len(keys), 700):
        ref.add_many(keys[lo : lo + 700])
    seen_df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_h64 long"
    ).repartition(8)
    dist = build_bloom_distributed(seen_df, expected_keys=20000)
    assert dist.bucket_bits == ref.bucket_bits
    assert np.array_equal(dist.bits, ref.bits)
    assert dist.n_keys == ref.n_keys


def test_empty_and_incremental():
    b = PartitionedBloom(expected_keys=1000)
    assert b.might_contain_many(np.zeros(0, dtype=np.int64)).shape == (0,)
    k1 = keys_of(["http://x.test/1"])
    assert not b.might_contain_many(k1).any()
    b.add_many(k1)
    assert b.might_contain_many(k1).all()
    b.add_many(np.zeros(0, dtype=np.int64))  # no-op
    assert 0 < b.fill_ratio() < 0.01
