import pyarrow as pa

from cc_warc_examples_ray.functions.urls import _canon_one, canonicalize_batch, host_of


def canon(src, page=""):
    return _canon_one(src, page)


def test_reference_relative_fixture():
    # the reference's own normalization fixture: relative src resolved
    # against a page URL (ProcessingService.java:504-533 main())
    url, surt, host, path = canon(
        "typo3temp/pics/4eaab97c99.jpg",
        "http://www.rtl.lu/sport/international/a/1,,,/index.html",
    )
    assert host == "rtl.lu"
    assert url == "http://rtl.lu/sport/international/a/1,,,/typo3temp/pics/4eaab97c99.jpg"


def test_dotdot_resolution():
    url, _, host, path = canon("../../pics/i5.jpg", "http://h.example/a/b/c/page.html")
    assert url == "http://h.example/a/pics/i5.jpg"
    assert path == "/a/pics/i5.jpg"


def test_whitespace_strip_and_www():
    u1 = canon("http://www.foo.example/a b.png")
    u2 = canon("http://foo.example/ab.png")
    assert u1 == u2


def test_default_port_and_case():
    assert canon("HTTP://Foo.Example:80/x") == canon("http://foo.example/x")
    assert canon("https://foo.example:443/x") == canon("https://foo.example/x")
    # non-default port preserved & distinguishes
    assert canon("http://foo.example:8080/x") != canon("http://foo.example/x")


def test_fragment_stripped_query_kept():
    a = canon("http://h.example/p?q=1#frag")
    b = canon("http://h.example/p?q=1")
    c = canon("http://h.example/p?q=2")
    assert a == b and a != c


def test_surt_form():
    _, surt, _, _ = canon("http://www.news.bbc.co.uk/img/x.png")
    assert surt == "uk,co,bbc,news)/img/x.png"


def test_unparseable():
    assert canon("") == ("", "", "", "")
    assert canon("not a url at all", "")[0] == ""


def test_batch_kernel_and_dedup_targets():
    t = pa.table(
        {
            "seed_url": [
                "http://www.h.example/a.png",
                "http://h.example/a.png",
                "http://h.example:80/a.png",
                "http://h.example/a .png",
                "http://other.example/a.png",
            ],
            "page_url": [""] * 5,
            "seed_rank": list(range(5)),
        }
    )
    out = canonicalize_batch(t)
    hashes = out.column("url_hash").to_pylist()
    assert hashes[0] == hashes[1] == hashes[2] == hashes[3]
    assert hashes[4] != hashes[0]
    assert out.column("host").to_pylist()[0] == "h.example"


def test_host_of():
    assert host_of(["http://WWW.Foo.example/x", "bad"]) == ["foo.example", ""]


def test_canon_malformed_port_rejected():
    """Non-numeric / out-of-range ports reject the row instead of
    raising through the whole canonicalize task."""
    from cc_warc_examples_ray.functions.urls import _canon_one

    assert _canon_one("http://host.example:8o8/x", "") == ("", "", "", "")
    assert _canon_one("http://host.example:99999/x", "") == ("", "", "", "")


def test_canon_relative_with_embedded_absolute_query():
    """A relative URL whose query embeds an absolute URL is still
    relative (scheme must START the string) and resolves against the
    page URL."""
    from cc_warc_examples_ray.functions.urls import _canon_one

    url, surt, host, path = _canon_one(
        "/redir?to=http://a.b/c", "http://host.example/page.html"
    )
    assert url == "http://host.example/redir?to=http://a.b/c"
    assert host == "host.example" and path == "/redir"


def test_canon_trailing_dot_segments_keep_slash():
    """RFC 3986 remove_dot_segments: '/a/b/..' → '/a/' (directory), not
    '/a' (file) — distinct resources must not merge in dedup."""
    from cc_warc_examples_ray.functions.urls import _canon_one

    assert _canon_one("http://h.example/a/b/..", "")[3] == "/a/"
    assert _canon_one("http://h.example/a/.", "")[3] == "/a/"
    assert _canon_one("http://h.example/a/b/../c", "")[3] == "/a/c"
