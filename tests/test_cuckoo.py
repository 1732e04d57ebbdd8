import numpy as np
import pytest

from cc_warc_examples_ray.state.cuckoo import CuckooFilter


def test_add_if_absent_first_seen():
    f = CuckooFilter(capacity=1 << 12)
    keys = np.array([5, 7, 5, 9, 7, 5], dtype=np.uint64)
    admit = f.add_if_absent(keys)
    assert admit.tolist() == [True, True, False, True, False, False]
    # second batch: all already present
    assert not f.add_if_absent(keys).any()
    assert f.count == 3


def test_no_false_negatives_and_low_fpp():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    keys = np.unique(keys)
    f = CuckooFilter(capacity=1 << 17, fp_bits=32)
    admit = f.add_if_absent(keys)
    assert admit.all()
    assert f.contains(keys).all()  # no false negatives, ever
    other = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    other = np.setdiff1d(other, keys)
    fpp = f.contains(other).mean()
    assert fpp < 1e-4  # 32-bit fingerprints: ~2e-9 expected


def test_delete_and_readd():
    f = CuckooFilter(capacity=1 << 10)
    keys = np.arange(100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    f.add_if_absent(keys)
    assert f.delete(keys[:10]).all()
    assert not f.contains(keys[:10]).any()
    assert f.contains(keys[10:]).all()
    assert f.add_if_absent(keys[:10]).all()


def test_serialization_roundtrip():
    f = CuckooFilter(capacity=1 << 12, seed=3)
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    f.add_if_absent(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), seed=3)
    assert g.count == f.count
    assert g.contains(keys).all()
    assert np.array_equal(g.table, f.table)


def test_full_filter_raises():
    f = CuckooFilter(capacity=4)  # one bucket... tiny
    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(0xDEADBEEF1)
    with pytest.raises(RuntimeError):
        f.add_if_absent(keys)


def test_checkpoint_preserves_eviction_rng():
    """A restored filter's random-walk evictions must continue exactly
    where the checkpoint left off — otherwise a resumed crawl's later
    checkpoints diverge bit-for-bit from an uninterrupted run's."""
    import numpy as np

    from cc_warc_examples_ray.state.cuckoo import CuckooFilter

    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, 1800, dtype=np.uint64)
    a = CuckooFilter(capacity=2048, seed=1)   # ~88% load -> evictions
    a.add_if_absent(keys[:900])
    blob = a.to_bytes()
    b = CuckooFilter.from_bytes(blob, seed=1)
    a.add_if_absent(keys[900:])
    b.add_if_absent(keys[900:])
    assert a.to_bytes() == b.to_bytes()  # identical table AND rng state
