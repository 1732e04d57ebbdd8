"""Property-based tests (hypothesis) for foundations: xxhash64
vectorized-vs-scalar equivalence, canonicalizer idempotence, cuckoo
no-false-negatives, codec round-trips."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cc_warc_examples_ray import imagecodec
from cc_warc_examples_ray.functions.urls import _canon_one
from cc_warc_examples_ray.hashing import xxh64, xxh64_many
from cc_warc_examples_ray.state.cuckoo import CuckooFilter


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=20))
def test_xxh64_vectorized_matches_scalar(blobs):
    vec = xxh64_many(blobs)
    for b, v in zip(blobs, vec):
        assert xxh64(b) == int(v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=10))
def test_xxh64_arrow_zero_copy_path(texts):
    arr = pa.array(texts, pa.string())
    vec_arrow = xxh64_many(arr)
    vec_py = xxh64_many([t for t in texts])
    assert np.array_equal(vec_arrow, vec_py)


_URL = st.one_of(
    st.from_regex(r"http://[a-z]{1,8}\.(com|example)(/[a-zA-Z0-9._~-]{0,10}){0,3}", fullmatch=True),
    st.from_regex(r"(\.\./){0,3}[a-z0-9]{1,8}\.(jpg|png)", fullmatch=True),
    st.text(max_size=30),
)


@settings(max_examples=100, deadline=None)
@given(_URL, st.from_regex(r"http://[a-z]{1,8}\.example/a/b/page\.html", fullmatch=True))
def test_canonicalize_idempotent(src, page):
    url, surt, host, path = _canon_one(src, page)
    if not host:
        return
    # canonicalizing a canonical URL is a fixed point
    url2, surt2, host2, path2 = _canon_one(url, "")
    assert (url2, surt2, host2, path2) == (url, surt, host, path)
    assert not url.split("://", 1)[1].startswith("www.")


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**63 - 1), min_size=1, max_size=300, unique=True))
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(capacity=4096)
    arr = np.array(keys, dtype=np.uint64)
    admit = f.add_if_absent(arr)
    assert admit.all()
    assert f.contains(arr).all()
    assert not f.add_if_absent(arr).any()


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_png_bmp_roundtrip_exact(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(imagecodec.png_decode(imagecodec.png_encode(img)), img)
    assert np.array_equal(imagecodec.bmp_decode(imagecodec.bmp_encode(img)), img)
    assert imagecodec.png_probe(imagecodec.png_encode(img)) == (w, h)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=8, max_value=64), st.integers(min_value=8, max_value=64),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_fjpg_psnr_bound(w, h, seed):
    rng = np.random.default_rng(seed)
    # smooth-ish content (random uniform is the worst case for DCT)
    base = rng.integers(0, 256, (2, 2, 3)).astype(np.float64)
    yy = np.linspace(0, 1, h)[:, None, None]
    xx = np.linspace(0, 1, w)[None, :, None]
    img = (base[0, 0] * (1 - yy) * (1 - xx) + base[0, 1] * (1 - yy) * xx
           + base[1, 0] * yy * (1 - xx) + base[1, 1] * yy * xx)
    img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    dec = imagecodec.fjpg_decode(imagecodec.fjpg_encode(img))
    assert imagecodec.psnr(dec, img) >= 40.0


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6000),
    null_p=st.floats(min_value=0.0, max_value=0.3),
    nkeys=st.integers(min_value=1, max_value=50),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_arrow_group_by_always_exact(n, null_p, nkeys, seed):
    """relational.arrow_group_by returns EXACTLY the true group count
    and sums for any size / null density / key cardinality — the
    pyarrow 16.1 grouper bug this guards against is data-dependent
    (splits null string groups only above ~1k rows)."""
    from cc_warc_examples_ray.ops.relational import arrow_group_by

    rng = np.random.default_rng(seed)
    k1 = [None if rng.random() < null_p else f"k{rng.integers(0, nkeys)}"
          for _ in range(n)]
    k2 = rng.integers(0, 5, n)
    v = rng.integers(-50, 50, n)
    t = pa.table({
        "k1": pa.array(k1, pa.string()),
        "k2": pa.array(k2, pa.int64()),
        "v": pa.array(v, pa.int64()),
    })
    got = arrow_group_by(t, ["k1", "k2"], [("v", "sum")])
    truth = {}
    for a, b, x in zip(k1, k2.tolist(), v.tolist()):
        truth[(a, b)] = truth.get((a, b), 0) + x
    assert got.num_rows == len(truth)
    for a, b, s in zip(got.column("k1").to_pylist(),
                       got.column("k2").to_pylist(),
                       got.column("v_sum").to_pylist()):
        assert truth[(a, b)] == s


_DOC = st.text(
    alphabet=st.sampled_from(list("ab c\nd.!")), min_size=0, max_size=120
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=12))
def test_repetition_scores_matches_reference(texts):
    """The vectorized line kernel == a per-doc python reference for any
    doc mix (empty docs, blank lines, unicode-free small alphabet keeps
    the search space dense in edge shapes)."""
    import re

    from cc_warc_examples_ray.ops.text import repetition_scores

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = repetition_scores(t)
    for i, txt in enumerate(texts):
        lines = [ln for ln in (txt or "").split("\n") if len(ln)]
        n, d = len(lines), len(set(lines))
        exp_dlf = (n - d) / n if n else 0.0
        chars_all = sum(map(len, lines))
        chars_first = sum(len(ln) for ln in set(lines))
        exp_dlcf = (chars_all - chars_first) / chars_all if chars_all else 0.0
        assert abs(out.column("dup_line_frac")[i].as_py() - exp_dlf) < 1e-12
        assert abs(out.column("dup_line_char_frac")[i].as_py() - exp_dlcf) < 1e-12
        words = re.findall(r"\w+", (txt or "").lower())
        tc = sum(map(len, words))
        if len(words) >= 2 and tc:
            grams = [f"{words[j]} {words[j+1]}" for j in range(len(words) - 1)]
            best = min(sorted(set(grams)), key=lambda g: (-grams.count(g), g))
            exp_tb = grams.count(best) * (len(best) - 1) / tc
        else:
            exp_tb = 0.0
        assert abs(out.column("top_bigram_char_frac")[i].as_py() - exp_tb) < 1e-12


@settings(max_examples=40, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=10),
       st.lists(_DOC, min_size=0, max_size=4),
       st.integers(min_value=1, max_value=3))
def test_contamination_scores_matches_reference(texts, bench, n):
    """contamination_scores == a string-set python reference for any
    corpus/benchmark/n (xxh64 collisions impossible at this scale)."""
    import re

    import numpy as np

    from cc_warc_examples_ray.hashing import xxh64_many
    from cc_warc_examples_ray.ops.text import contamination_scores

    def grams(txt):
        ws = re.findall(r"\w+", (txt or "").lower())
        return {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}

    bench_grams = set().union(*(grams(b) for b in bench)) if bench else set()
    bench_sorted = (np.unique(xxh64_many(sorted(bench_grams)).view(np.int64))
                    if bench_grams else np.array([], np.int64))
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = contamination_scores(t, bench_sorted, n=n)
    for i, txt in enumerate(texts):
        g = grams(txt)
        assert out.column("n_ngrams")[i].as_py() == len(g)
        assert out.column("n_hits")[i].as_py() == len(g & bench_grams)


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(st.sampled_from(["a", "b", "c"]),
                    st.floats(min_value=0.0, max_value=3.0,
                              allow_nan=False, allow_infinity=False),
                    max_size=3),
    st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
    st.integers(min_value=0, max_value=99),
)
def test_mix_rates_table_copy_semantics(rates, default, seed):
    """mix_rates_table's integer compilation reproduces the exact
    rate semantics: E[copies] per key == base + thr/2^bits, and the
    per-row decision is a pure function of (id, seed)."""
    import numpy as np

    from cc_warc_examples_ray.hashing import xxh64_many
    from cc_warc_examples_ray.ops.sampling import mix_rates_table

    t = mix_rates_table(rates, default)
    for k, r in list(rates.items()) + [(None, default)]:
        base, thr = t[k]
        assert base == int(r)
        assert 0 <= thr <= 1 << 20
        # compiled pair reproduces the rate to 2^-20 resolution
        assert abs(base + thr / (1 << 20) - r) <= 0.5 / (1 << 20) + 1e-12
    # decision reproducibility: same (id, seed) -> same copy count
    h = xxh64_many([f"{i}:{seed}" for i in range(50)]) % np.uint64(1 << 20)
    for k, r in rates.items():
        base, thr = t[k]
        n1 = base + (h < thr)
        n2 = base + (h < thr)
        assert np.array_equal(n1, n2)
        assert ((n1 == base) | (n1 == base + 1)).all()
