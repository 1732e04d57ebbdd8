"""robots.txt parser tests (functions/robots.py)."""

from hypothesis import given
from hypothesis import strategies as st

from cc_warc_examples_ray.functions.robots import parse_robots_txt, robots_table_from_texts


SAMPLE = """
# sample robots
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 0.5

User-agent: specialbot
Disallow: /only-special/
Crawl-delay: 2
"""


def test_wildcard_group():
    delay, dis = parse_robots_txt(SAMPLE, agent="genericbot")
    assert delay == 500
    assert dis == ["/private/", "/tmp/"]


def test_specific_group_wins():
    delay, dis = parse_robots_txt(SAMPLE, agent="SpecialBot")
    assert delay == 2000
    assert dis == ["/only-special/"]


def test_empty_and_malformed():
    assert parse_robots_txt("", agent="*") == (150, [])
    assert parse_robots_txt("garbage without colons\n\n:::", agent="*") == (150, [])
    d, dis = parse_robots_txt("User-agent: *\nCrawl-delay: notanumber\nDisallow: /x/", agent="*")
    assert d == 150 and dis == ["/x/"]


def test_disallow_empty_means_allow_all():
    d, dis = parse_robots_txt("User-agent: *\nDisallow:", agent="*")
    assert dis == []


def test_table_builder():
    t = robots_table_from_texts({"a.example": SAMPLE, "b.example": ""})
    assert t.num_rows == 2
    row = {h: (d, p) for h, d, p in zip(t.column("host").to_pylist(),
                                        t.column("crawl_delay_ms").to_pylist(),
                                        t.column("disallow_prefixes").to_pylist())}
    assert row["a.example"] == (500, ["/private/", "/tmp/"])
    assert row["b.example"] == (150, [])


def test_ua_line_after_directives_starts_new_group():
    """RFC 9309: a User-agent line following directives begins a NEW
    group — later groups' rules must not leak into earlier ones."""
    txt = "User-agent: *\nDisallow: /a\nUser-agent: bot\nDisallow: /b"
    assert parse_robots_txt(txt, agent="*")[1] == ["/a"]
    assert parse_robots_txt(txt, agent="bot")[1] == ["/b"]
    # consecutive UA lines still share one group
    txt2 = "User-agent: x\nUser-agent: y\nDisallow: /c"
    assert parse_robots_txt(txt2, agent="x")[1] == ["/c"]
    assert parse_robots_txt(txt2, agent="y")[1] == ["/c"]
    # unknown directive also ends the UA run
    txt3 = "User-agent: *\nSitemap: http://e/s.xml\nUser-agent: bot\nDisallow: /d"
    assert parse_robots_txt(txt3, agent="*")[1] == []
    assert parse_robots_txt(txt3, agent="bot")[1] == ["/d"]


@given(st.text(max_size=400))
def test_parser_total_on_arbitrary_text(text):
    """The parser is total: any input yields (int delay, list[str])."""
    d, dis = parse_robots_txt(text, agent="anybot")
    assert isinstance(d, int)
    assert isinstance(dis, list) and all(isinstance(x, str) for x in dis)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["alpha", "beta", "gamma", "*"]),
            st.lists(st.from_regex(r"/[a-z]{1,6}", fullmatch=True),
                     min_size=1, max_size=3),
        ),
        min_size=1, max_size=4,
        unique_by=lambda g: g[0],
    ),
    st.booleans(),
)
def test_group_isolation_property(groups, blank_sep):
    """Each agent gets exactly its own group's Disallow lines, whether
    groups are separated by blank lines or only by the directive-then-UA
    boundary (the RFC 9309 rule the round-1 advisor flagged).  Every
    group carries >=1 directive so consecutive-UA merging never applies."""
    lines = []
    for agent, dis in groups:
        lines.append(f"User-agent: {agent}")
        lines.extend(f"Disallow: {p}" for p in dis)
        if blank_sep:
            lines.append("")
    txt = "\n".join(lines)
    for agent, dis in groups:
        got = parse_robots_txt(txt, agent=agent)[1]
        assert got == list(dict.fromkeys(dis))


def test_blank_line_inside_group_is_insignificant():
    """RFC 9309: blank lines do not end a group — directives separated
    from their User-agent line by a blank line still apply."""
    txt = "User-agent: *\n\nDisallow: /private/\nCrawl-delay: 2\n"
    assert parse_robots_txt(txt, agent="*") == (2000, ["/private/"])
