"""PII scrubbing + C4/RefinedWeb line-level cleaning (ops/clean.py):
Arrow-RE2 kernels vs a pure-Python `re` reference on the enriched
fixture, distributed line_dedup vs a serial first-occurrence sweep,
and block-split invariance."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cc_warc_examples_ray import synth
from cc_warc_examples_ray.ops import clean


@pytest.fixture(scope="module")
def rich():
    return synth.rich_documents_table(300)


def test_pii_scrub_matches_python_re(rich):
    out = clean.pii_scrub(rich)
    texts = rich.column("text").to_pylist()
    got_clean = out.column("text_clean").to_pylist()
    counts = {a: out.column(a).to_pylist() for _, _, a in clean.PII_STAGES}
    n_found = 0
    for i, t in enumerate(texts):
        cur = t
        for pat, token, alias in clean.PII_STAGES:
            matches = re.findall(pat, cur)
            assert counts[alias][i] == len(matches), (i, alias)
            n_found += len(matches)
            cur = re.sub(pat, token, cur)
        assert got_clean[i] == cur, i
    assert n_found > 100  # the fixture gives the scrubber real work
    # redacted text contains no residual PII
    assert not any(re.search(clean.EMAIL_RE, c) for c in got_clean)


def test_pii_scrub_boundary_cases():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # \b guards: phone digits inside a word, IP with port suffix
            "x555-123-4567y is not a phone but 555-123-4567 is.",
            "addr 10.1.2.3:8080 still redacts the IP part.",
            None,  # null text → zero counts, empty clean
            "a@b.co and c.d-e@f.g.h.org together.",
        ]),
    })
    out = clean.pii_scrub(t)
    assert out.column("n_phones").to_pylist() == [1, 0, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 1, 0, 0]
    assert out.column("n_emails").to_pylist() == [0, 0, 0, 2]
    rows = out.column("text_clean").to_pylist()
    assert rows[0] == "x555-123-4567y is not a phone but <PHONE> is."
    assert rows[1] == "addr <IP>:8080 still redacts the IP part."
    assert rows[2] == ""
    assert rows[3] == "<EMAIL> and <EMAIL> together."


def test_line_filter_matches_python_reference(rich):
    out = clean.line_filter(rich).to_pandas()
    exp = []
    for did, txt in zip(rich.column("doc_id").to_pylist(),
                        rich.column("text").to_pylist()):
        for j, ln in enumerate(txt.split("\n")):
            nw = len(re.findall(r"[0-9A-Za-z_]+", ln))
            kept = (nw >= clean.LINE_MIN_WORDS
                    and re.search(r'[.!?"]$', ln) is not None
                    and re.search(r"(?i)javascript|cookie|lorem ipsum", ln) is None)
            exp.append((did, j, nw, kept))
    ref = pd.DataFrame(exp, columns=["doc_id", "line_idx", "n_words", "kept"])
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "line_idx"]).reset_index(drop=True),
        ref.sort_values(["doc_id", "line_idx"]).reset_index(drop=True),
        check_dtype=False)
    # every gate fires somewhere on the fixture
    assert 0 < out["kept"].sum() < len(out)
    assert (out["n_words"] < clean.LINE_MIN_WORDS).any()


def test_line_dedup_first_occurrence_and_split_invariance(ray_session, rich):
    outs = []
    for nblocks in (1, 6):
        ds = rd.from_arrow(rich).repartition(nblocks)
        outs.append(clean.line_dedup(ds).to_pandas()
                    .sort_values(["doc_id", "line_idx"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # serial first-occurrence reference (exact string equality)
    seen, exp = set(), []
    for did, txt in zip(rich.column("doc_id").to_pylist(),
                        rich.column("text").to_pylist()):
        for j, ln in enumerate(txt.split("\n")):
            if not ln:
                continue
            exp.append((did, j, ln not in seen))
            seen.add(ln)
    ref = pd.DataFrame(exp, columns=["doc_id", "line_idx", "kept"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # cross-doc boilerplate means real drops happened
    assert out["kept"].sum() < len(out)


def test_line_dedup_empty_and_all_empty_lines(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["", "\n\n"]),
    })
    out = clean.line_dedup(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0  # empty lines carry no dedup signal


def test_clean_docs_composition_matches_python(rich):
    """clean_docs (scrub -> line gates -> binary_join reassembly ->
    min-lines doc gate) == the equivalent python re/str pipeline."""
    out = clean.clean_docs(rich)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("text_clean").to_pylist()))
    ref = {}
    for did, txt in zip(rich.column("doc_id").to_pylist(),
                        rich.column("text").to_pylist()):
        cur = txt
        for pat, tok, _ in clean.PII_STAGES:
            cur = re.sub(pat, tok, cur)
        kept = [ln for ln in cur.split("\n")
                if len(re.findall(r"[0-9A-Za-z_]+", ln)) >= clean.LINE_MIN_WORDS
                and re.search(r'[.!?"]$', ln)
                and re.search(r"(?i)javascript|cookie|lorem ipsum", ln) is None]
        if len(kept) >= 3:
            ref[did] = "\n".join(kept)
    assert got == ref
    assert 0 < len(got) < rich.num_rows  # the doc gate really drops docs
    # unsorted / duplicate-free doc ids inside one batch: shuffle rows
    idx = np.random.default_rng(3).permutation(rich.num_rows)
    shuf = rich.take(pa.array(idx))
    out2 = clean.clean_docs(shuf)
    got2 = dict(zip(out2.column("doc_id").to_pylist(),
                    out2.column("text_clean").to_pylist()))
    assert got2 == ref


def test_dup_span_stats_matches_python(ray_session, rich):
    """dup_span_stats (explode -> grouped_count -> join back -> interval
    union) == a serial python reference, under block splits."""
    from cc_warc_examples_ray.ops import dedup

    n = 4
    outs = []
    for nblocks in (1, 6):
        out = dedup.dup_span_stats(
            rd.from_arrow(rich).repartition(nblocks), n=n
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # serial reference
    from collections import Counter
    docs = []
    for did, txt in zip(rich.column("doc_id").to_pylist(),
                        rich.column("text").to_pylist()):
        words = re.findall(r"[0-9A-Za-z_]+", txt.lower())
        grams = [" ".join(words[j:j + n]) for j in range(len(words) - n + 1)]
        docs.append((did, words, grams))
    cnt = Counter(g for _, _, grams in docs for g in grams)
    for did, words, grams in docs:
        row = got[got["doc_id"] == did].iloc[0]
        dup_pos = [j for j, g in enumerate(grams) if cnt[g] >= 2]
        covered = set()
        for j in dup_pos:
            covered.update(range(j, j + n))
        assert row["n_tokens"] == len(words)
        assert row["n_grams"] == max(len(words) - n + 1, 0)
        assert row["n_dup_grams"] == len(dup_pos), did
        assert row["covered_tokens"] == len(covered), did
    assert got["n_dup_grams"].sum() > 0  # boilerplate gives real dups


def test_remove_dup_spans_matches_python(ray_session, rich):
    """remove_dup_spans (the Lee et al. TRANSFORM) == a serial python
    reference, under block splits; fully-covered docs come back ''."""
    from cc_warc_examples_ray.ops import dedup

    n = 4
    outs = []
    for nblocks in (1, 6):
        out = dedup.remove_dup_spans(
            rd.from_arrow(rich).repartition(nblocks), n=n
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    from collections import Counter
    docs = []
    for did, txt in zip(rich.column("doc_id").to_pylist(),
                        rich.column("text").to_pylist()):
        words = re.findall(r"[0-9A-Za-z_]+", txt.lower())
        grams = [" ".join(words[j:j + n]) for j in range(len(words) - n + 1)]
        docs.append((did, words, grams))
    cnt = Counter(g for _, _, grams in docs for g in grams)
    removed_any = False
    for did, words, grams in docs:
        covered = set()
        for j, g in enumerate(grams):
            if cnt[g] >= 2:
                covered.update(range(j, j + n))
        want = " ".join(w for j, w in enumerate(words) if j not in covered)
        row = got[got["doc_id"] == did].iloc[0]
        assert row["clean_text"] == want, did
        assert row["n_tokens"] == len(words)
        assert row["kept_tokens"] == len(words) - len(covered)
        removed_any = removed_any or bool(covered)
    assert removed_any  # boilerplate produces real removals


def test_url_quality_gates_python_reference():
    from cc_warc_examples_ray.ops import clean
    import re as _re

    urls = [
        "http://ok.example/a/b/page.html",
        "http://badcasino.example/p.html",
        "http://ok.example/free-poker-now.html",
        "http://deep.example/d/d/d/d/d/d/d/p.html",
        "http://long.example/" + "x" * 80 + ".html",
        "http://ok.example/p.html?utm_source=feed",
        "http://ok.example/p.html?sid=42&x=1",
        "http://UPPER.example/p.html",
    ]
    tbl = pa.table({"url": pa.array(urls, pa.string())})
    out = clean.url_quality_gates(
        tbl, blocklist=("badcasino.example",)).to_pandas()

    for i, u in enumerate(urls):
        host = _re.sub(r"[/?#].*$", "", _re.sub(r"^[a-z][a-z0-9+.-]*://", "", u)).lower()
        path = _re.sub(r"[?#].*$", "", _re.sub(r"^[a-z][a-z0-9+.-]*://[^/?#]*", "", u))
        assert out["host"][i] == host
        assert out["n_segments"][i] == path.count("/")
        assert out["url_len"][i] == len(u)
        assert out["bad_domain"][i] == int(host == "badcasino.example")
        assert out["bad_word"][i] == int(bool(_re.search(r"(?i)casino|poker|viagra|lottery", u)))
        assert out["too_deep"][i] == int(path.count("/") > 6)
        assert out["too_long"][i] == int(len(u) > 60)
        assert out["has_tracking"][i] == int(bool(_re.search(r"[?&](utm_[a-z]+|sessionid|sid)=", u)))
    assert out["keep"].tolist() == [1, 0, 0, 0, 0, 0, 0, 1]


def _hot_gram_corpus(n_docs: int = 240, hot_frac: float = 0.3) -> pa.Table:
    """Corpus where ONE boilerplate 4-gram covers ``hot_frac`` of the
    docs (repeated several times per hot doc) — the adversarial-skew
    shape of VERDICT r4 #6: at web scale a hot legal-footer gram puts a
    large fraction of all duplicated-gram occurrences under one gh."""
    rng = np.random.default_rng(11)
    hot = "all rights reserved worldwide"
    rows_id, rows_txt = [], []
    for i in range(n_docs):
        uniq = " ".join(f"tok{i}x{j}" for j in range(12))
        if i < int(n_docs * hot_frac):
            txt = f"{uniq} {hot} middle{i} {hot} tail{i} {hot}"
        else:
            txt = uniq + " " + " ".join(
                f"w{rng.integers(0, 5)}q{i}r{j}" for j in range(6))
        rows_id.append(i)
        rows_txt.append(txt)
    return pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                     "text": pa.array(rows_txt, pa.string())})


def test_dup_span_hot_gram_salt_fans_out():
    """(b) of the skew probe: under the forced shuffle path, the salted
    bucketer spreads the hot gram's occurrence rows across ``salt``
    merge sub-buckets instead of one straggler group, and the right
    side replicates into every sub-bucket (join semantics intact)."""
    from cc_warc_examples_ray.ops import dedup, relational

    t = _hot_gram_corpus()
    grams = dedup._gram_pos_explode(t, 4, "doc_id", "text")
    types = {"doc_id": pa.int64(), "pos": pa.int64(), "gh": pa.int64()}
    cols = ["doc_id", "pos", "gh"]
    nb = 8
    plain = relational._union_bucketer("gh", 0, cols, types, nb)(grams)
    salted = relational._union_bucketer("gh", 0, cols, types, nb, salt=4)(grams)
    import collections
    cp = collections.Counter(plain.column("_bucket").to_pylist())
    cs = collections.Counter(salted.column("_bucket").to_pylist())
    # the hot gram dominates its unsalted bucket; salted max shrinks
    assert max(cs.values()) * 2 <= max(cp.values())
    assert sum(cs.values()) == sum(cp.values())  # left rows move, not grow
    # right side: one row per sub-bucket copy
    dup_gh = pa.table({"gh": pa.array(sorted(set(grams.column("gh").to_pylist())), pa.int64())})
    r = relational._union_bucketer("gh", 1, cols, types, nb, salt=4)(dup_gh)
    assert r.num_rows == dup_gh.num_rows * 4


def test_dup_spans_hot_gram_salted(ray_session, monkeypatch):
    """(a) of the skew probe: with the broadcast path DISABLED (forcing
    the salted two-sided shuffle), dup_span_stats on the hot-gram
    corpus equals both the unsalted shuffle and the (skew-immune)
    broadcast regime — salting changes the schedule, never the rows."""
    from cc_warc_examples_ray.ops import dedup, relational

    t = _hot_gram_corpus()
    base = dedup.dup_span_stats(
        rd.from_arrow(t).repartition(5), n=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    orig = relational.hash_join

    def forced(*a, **k):
        return orig(*a, **{**k, "broadcast_rows": 0})

    monkeypatch.setattr(relational, "hash_join", forced)
    rows = {}
    for salt in (1, 4):
        dr = dedup._dup_gram_rows(
            rd.from_arrow(t).repartition(5), 4, "doc_id", "text", 2, 8,
            salt=salt).to_pandas().sort_values(
                ["doc_id", "pos"]).reset_index(drop=True)
        rows[salt] = dr
    pd.testing.assert_frame_equal(rows[1], rows[4])
    # hot docs really are ~30% and their dup rows cover the boilerplate
    hot_ids = set(range(int(240 * 0.3)))
    got_ids = set(rows[4]["doc_id"])
    assert hot_ids <= got_ids
    # and the full stats under the forced salted shuffle match broadcast
    forced_stats = dedup.dup_span_stats(
        rd.from_arrow(t).repartition(5), n=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(forced_stats, base)


def test_incremental_dedup_positive_paths(ray_session, tmp_path):
    """q_incremental_dedup's EXACT branch never fires on the sf fixture
    (documents has no repeated text — the oracle proves all-false
    agreement only), so exercise both positive paths on an engineered
    corpus: one new doc byte-identical to a prior doc, one a near-dup
    (one word changed in a long text), one fresh."""
    import pyarrow.parquet as pq

    from cc_warc_examples_ray import entry_queries as eq

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(40))
    texts = {
        0: base,
        1: "totally different short text about something else entirely",
        # new side (>= _INC_CUT)
        eq._INC_CUT + 0: base,                      # exact dup of 0
        eq._INC_CUT + 1: base.replace("alpha7", "ALPHA7x", 1),  # near dup
        eq._INC_CUT + 2: " ".join(f"zeta{i}" for i in range(60)),  # fresh
    }
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = eq.q_incremental_dedup(str(tmp_path)).set_index("doc_id")
    assert bool(out.loc[eq._INC_CUT + 0, "exact_dup"])
    assert bool(out.loc[eq._INC_CUT + 0, "near_dup"])   # exact ⇒ jaccard 1
    assert not bool(out.loc[eq._INC_CUT + 1, "exact_dup"])
    assert bool(out.loc[eq._INC_CUT + 1, "near_dup"])
    assert not bool(out.loc[eq._INC_CUT + 2, "exact_dup"])
    assert not bool(out.loc[eq._INC_CUT + 2, "near_dup"])
    assert out["admit"].tolist() == [False, False, True]
