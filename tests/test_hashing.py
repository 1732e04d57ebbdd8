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
