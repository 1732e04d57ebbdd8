import numpy as np
import pyarrow as pa

from cc_warc_examples_ray.hashing import combine64, xxh64, xxh64_int64, xxh64_many


def test_known_vectors():
    # published XXH64 test vectors (xxHash repo / python-xxhash docs)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    strs = [
        "".join(chr(rng.integers(32, 127)) for _ in range(int(l)))
        for l in rng.integers(0, 200, 300)
    ]
    v = xxh64_many(pa.array(strs))
    s = np.array([xxh64(x.encode()) for x in strs], dtype=np.uint64)
    assert (v == s).all()


def test_seed_and_slices():
    strs = ["abc", "", "hello world", "x" * 100]
    arr = pa.array(strs * 5)
    s = np.array([xxh64(x.encode(), 7) for x in strs * 5], dtype=np.uint64)
    assert (xxh64_many(arr, seed=7) == s).all()
    assert (xxh64_many(arr[3:9], seed=7) == s[3:9]).all()


def test_int64_view_and_combine():
    h = xxh64_int64(["a", "b"])
    assert h.dtype == np.int64
    c = combine64(xxh64_many(["a"]), xxh64_many(["b"]))
    assert c.dtype == np.uint64 and c[0] != xxh64_many(["a"])[0]


def test_xxh64_many_none_in_iterable():
    """Docstring contract: nulls/None hash as empty strings on BOTH the
    Arrow and the plain-iterable paths."""
    import numpy as np
    import pyarrow as pa

    from cc_warc_examples_ray.hashing import xxh64, xxh64_many

    got = xxh64_many([None, "a", b"bc"])
    want = np.array([xxh64(b""), xxh64(b"a"), xxh64(b"bc")], dtype=np.uint64)
    assert (got == want).all()
    arrow = xxh64_many(pa.array([None, "a", "bc"], pa.string()))
    assert (arrow == want).all()


def test_xxh64_many_outlier_split_matches_scalar():
    """One pathologically long row must not blow up the padded matrix;
    the outlier-split path hashes identically to the scalar kernel."""
    import numpy as np
    import pyarrow as pa

    from cc_warc_examples_ray import hashing

    vals = [f"url-{i}" for i in range(20000)] + ["x" * 300_000]
    arr = pa.array(vals, pa.string())
    old_budget = hashing._MATRIX_BUDGET
    hashing._MATRIX_BUDGET = 1 << 22  # force the split at test scale
    try:
        got = hashing.xxh64_many(arr)
    finally:
        hashing._MATRIX_BUDGET = old_budget
    want = np.array([hashing.xxh64(v.encode()) for v in vals[:3]], dtype=np.uint64)
    assert (got[:3] == want).all()
    assert got[-1] == np.uint64(hashing.xxh64(vals[-1].encode()))
