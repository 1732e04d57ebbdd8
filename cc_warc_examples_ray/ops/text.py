"""Text-analysis operators for training-data pipelines (SURVEY.md §2.2
M6-M8, M23-M27 lineage) — language ID, quality scoring, token counting,
fingerprinting, ngram features.

The reference's text stack: whitespace tokenization
(`/root/reference/src/org/commoncrawl/examples/mapreduce/WordCounterMap.java:39-47`),
char-ngram features over URLs (`NGramAnalyzer.java:105-122`), a 23-dim
handcrafted feature vector (`ProcessingService.java:595-689`).  Here the
same shapes operate on document text, vectorized per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..hashing import xxh64_many

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# a BPE-ish token pattern: words, numbers, punctuation runs (public GPT-2
# pre-tokenizer shape, simplified)
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
# EXACTLY RE2's \s ([\t\n\f\r ]) so the whitespace-token count matches
# the DuckDB oracle: python str.split() also splits on \v and unicode
# spaces, which RE2 regexes in DuckDB do not
_WS_RE = re.compile(r"[ \t\n\f\r]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that he was for on are".split()),
    "de": frozenset("der die das und ist ich nicht du sie wir ein eine zu".split()),
    "fr": frozenset("le la les et est je ne pas vous que une dans pour".split()),
    "es": frozenset("el la los y es no que en un una para con por se".split()),
}


def token_counts(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counts per document (M7 analog).

    Both counts are ONE Arrow RE2 kernel per batch (no per-row Python):
    the whitespace-token count is the number of non-whitespace runs
    (RE2's \\s class exactly — [\\t\\n\\f\\r ]), and the BPE-ish count
    sums the three disjoint GPT-2-pre-tokenizer-shaped run classes."""
    txt = pc.fill_null(tbl.column(text_col), "")
    ws = pc.cast(pc.count_substring_regex(
        txt, pattern=r"[^ \t\n\f\r]+"), pa.int64())
    bpe = pc.cast(pc.count_substring_regex(
        txt, pattern=r"[A-Za-z]+|[0-9]+|[^ \t\n\f\r\v A-Za-z0-9]+"),
        pa.int64())
    return tbl.append_column("n_ws_tokens", ws).append_column(
        "n_bpe_tokens", bpe)


def _count_re(arr: pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(arr, pattern=pattern).to_numpy(
        zero_copy_only=False).astype(np.int64)


def quality_scores(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, mean word length, punctuation /
    digit / stopword ratios, uppercase ratio (M23-style handcrafted
    features, applied to documents).

    Fully vectorized: every character-class / token count is one Arrow
    RE2 kernel per batch; the ratio arithmetic is the identical
    fixed-order numpy double expression the per-row loop used, so the
    outputs are bit-identical (all counts are exact ints).  Unicode
    scope: word/stopword tokens use RE2's ASCII ``\\w`` — same engine
    as the DuckDB oracles — where the old python loop used unicode
    ``\\w`` (identical on ASCII corpora, the module's documented parity
    scope).  Punctuation is the ASCII-punct class only; codepoints
    >= 128 count toward length but no ratio class (a clean CJK/accented
    doc must not score at the floor)."""
    txt = pc.fill_null(tbl.column(text_col), "")
    low = pc.utf8_lower(txt)
    n = tbl.num_rows
    length = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    nw = _count_re(low, r"\w+")            # word-token count
    wlen = _count_re(low, r"\w")           # sum of word-token lengths
    stop_hits = _count_re(
        low, r"\b(" + "|".join(sorted(LANG_PROFILES["en"])) + r")\b")
    alpha_cnt = _count_re(txt, r"[A-Za-z]")
    upper_cnt = _count_re(txt, r"[A-Z]")
    digit_cnt = _count_re(txt, r"[0-9]")
    space_cnt = _count_re(txt, "[ \t\n\r]")
    ascii_cnt = _count_re(txt, r"[\x00-\x7f]")
    punct_cnt = ascii_cnt - alpha_cnt - digit_cnt - space_cnt

    nz = length > 0
    wnz = nw > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_wlen = np.where(wnz, wlen / np.maximum(nw, 1), 0.0)
        stop_ratio = np.where(wnz, stop_hits / np.maximum(nw, 1), 0.0)
        punct_ratio = np.where(nz, punct_cnt / np.maximum(length, 1), 0.0)
        digit_ratio = np.where(nz, digit_cnt / np.maximum(length, 1), 0.0)
        upper_ratio = np.where(nz, upper_cnt / np.maximum(alpha_cnt, 1), 0.0)
    score = (
        (length >= 50).astype(np.float64) * 0.25
        + np.clip(mean_wlen / 8.0, 0, 1) * 0.25
        + np.clip(stop_ratio * 4, 0, 1) * 0.25
        + (1.0 - np.clip(punct_ratio * 4, 0, 1)) * 0.25
    )
    out = tbl
    for name, arr in [
        ("n_chars_text", length), ("mean_word_len", mean_wlen),
        ("punct_ratio", punct_ratio), ("digit_ratio", digit_ratio),
        ("stopword_ratio", stop_ratio), ("upper_ratio", upper_ratio),
        ("quality", score),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


class LangIdentifier:
    """Stopword-profile language ID (n-gram heuristic family).  Profiles
    compiled once per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: v for k, v in LANG_PROFILES.items()}

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pylist()
        langs, confs = [], []
        for t in texts:
            words = _WORD_RE.findall((t or "").lower())
            if not words:
                langs.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(w in prof for w in words) / len(words)
                for lang, prof in self.profiles.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0.02 else "und")
            confs.append(scores[best])
        return tbl.append_column("lang_pred", pa.array(langs, pa.string())).append_column(
            "lang_conf", pa.array(confs, pa.float64())
        )


def fingerprint(tbl: pa.Table, text_col: str = "text", window: int = 8,
                hash_fn: str = "xxh64") -> pa.Table:
    """Winnowing-style document fingerprint: min rolling-window hash over
    word 4-gram hashes (Schleimer et al. 2003 family) + full-text hash.
    ``hash_fn="md5"`` switches to DuckDB-replicable ``md5_number_lower``
    semantics so the SQL oracle can recompute identical fingerprints."""
    texts = tbl.column(text_col).to_pylist()
    if hash_fn == "md5":
        from ..hashing import md5_64_many

        hasher = md5_64_many
    else:
        hasher = xxh64_many
    full = hasher([t or "" for t in texts]).view(np.int64)
    mins = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _WORD_RE.findall((t or "").lower())
        if not toks:
            continue
        grams = [" ".join(toks[j : j + 4]) for j in range(max(1, len(toks) - 3))]
        hs = hasher(grams)
        mins[i] = hs.min()
    return tbl.append_column("text_hash", pa.array(full, pa.int64())).append_column(
        "min_fingerprint", pa.array(mins.view(np.int64), pa.int64())
    )


def repetition_scores(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition filters (Rae et al. 2021,
    "Scaling Language Models", table A1 family — public):

    - ``dup_line_frac``: fraction of non-empty lines that are duplicates
      of another occurrence of the same line;
    - ``dup_line_char_frac``: fraction of non-empty-line characters that
      sit in those duplicate occurrences;
    - ``top_bigram_char_frac``: fraction of word characters covered by
      occurrences of the most frequent word bigram (count ties broken by
      lexicographically smallest bigram).  NOTE: self-overlapping
      occurrences double-count their shared word ("x x x" → 2 occurrences
      × 3 chars / 5 word chars > 1.0), so the metric can exceed 1 —
      threshold choices must account for it (the SQL oracle and the
      property-test reference count identically; clamping would break
      parity with both).

    Scope notes shared with the SQL oracles: words come from Python's
    Unicode ``\\w+`` while DuckDB/RE2 ``\\w`` is ASCII — parity is
    guaranteed on ASCII corpora only; and line equality is xxh64-hash
    equality (a collision counts two distinct lines as duplicates —
    negligible probabilistically, but a latent divergence from the
    oracle's exact string comparison at corpus scale).

    The line metrics are one vectorized kernel over the whole batch:
    Arrow ``split_pattern`` → flattened values + parent indices →
    ``xxh64`` per line → one lexsort by (doc, hash) → run-head masks +
    ``bincount`` folds.  No per-line python, no per-doc split loop."""
    # single Array: list_parent_indices must index one offsets base
    text_arr = pc.fill_null(tbl.column(text_col), "").combine_chunks()
    lines = pc.split_pattern(text_arr, pattern="\n")
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    vals = pc.list_flatten(lines)
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0  # empty lines (blank separators) carry no signal
    n = tbl.num_rows
    parents, lens = parents[keep], lens[keep]
    dup_line_frac = np.zeros(n, np.float64)
    dup_line_char_frac = np.zeros(n, np.float64)
    if len(parents):
        h = xxh64_many(vals.filter(pa.array(keep)))
        order = np.lexsort((h, parents))
        p, hh, ll = parents[order], h[order], lens[order]
        first = np.concatenate([[True], (p[1:] != p[:-1]) | (hh[1:] != hh[:-1])])
        n_lines = np.bincount(p, minlength=n)
        n_distinct = np.bincount(p[first], minlength=n)
        chars_all = np.bincount(p, weights=ll, minlength=n)
        chars_first = np.bincount(p[first], weights=ll[first], minlength=n)
        nz = n_lines > 0
        dup_line_frac[nz] = (n_lines[nz] - n_distinct[nz]) / n_lines[nz]
        cz = chars_all > 0
        dup_line_char_frac[cz] = (chars_all[cz] - chars_first[cz]) / chars_all[cz]
    # word bigrams via the shared flat-ngram helper: ONE batch-wide
    # lexsort groups (doc, bigram) runs; a stable count-desc reorder
    # picks each doc's most frequent bigram with ties to the smallest
    # string (what the per-doc np.unique argmax did, without a python
    # sort per doc)
    texts = tbl.column(text_col).to_pylist()
    top_bigram_char_frac = np.zeros(n, np.float64)
    grams, gp, _nw, wchars = _word_ngram_flat(texts, 2, word_stats=True)
    if grams:
        ga = np.asarray(grams)  # U dtype: C-level compares (pads to batch max)
        order = np.lexsort((ga, gp))
        gs, ps = ga[order], gp[order]
        head = np.concatenate([[True], (ps[1:] != ps[:-1]) | (gs[1:] != gs[:-1])])
        starts = np.flatnonzero(head)
        run_parent, run_gram = ps[starts], gs[starts]
        run_cnt = np.diff(np.append(starts, len(gs)))
        o2 = np.argsort(-run_cnt, kind="stable")  # count desc, gram asc kept
        o3 = o2[np.argsort(run_parent[o2], kind="stable")]  # regroup by doc
        win = np.concatenate([[True], run_parent[o3][1:] != run_parent[o3][:-1]])
        wp, wg, wc = run_parent[o3][win], run_gram[o3][win], run_cnt[o3][win]
        # chars covered = occurrences x chars of the two words (the
        # joining space is presentation, not document characters); a doc
        # with any bigram has >= 2 words and > 0 word chars
        top_bigram_char_frac[wp] = wc * (np.char.str_len(wg) - 1) / wchars[wp]
    out = tbl
    for name, arr in [
        ("dup_line_frac", dup_line_frac),
        ("dup_line_char_frac", dup_line_char_frac),
        ("top_bigram_char_frac", top_bigram_char_frac),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


def _word_ngram_flat(texts: list, n: int, word_stats: bool = False):
    """Flatten every doc's word ``n``-grams (space-joined, lowercased
    ``\\w+`` words) into ONE list + parent-doc index array, so hashing /
    sorting is a single vectorized call per batch.  ``word_stats=True``
    also returns per-doc (word count, word char total) arrays — computed
    in the same pass so callers never re-tokenize."""
    grams: list[str] = []
    parents: list[int] = []
    nw = np.zeros(len(texts), dtype=np.int64)
    wchars = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = _WORD_RE.findall((t or "").lower())
        if word_stats:
            nw[i] = len(words)
            wchars[i] = sum(map(len, words))
        m = len(words) - n + 1
        if m <= 0:
            continue
        grams.extend(" ".join(words[j : j + n]) for j in range(m))
        parents.extend([i] * m)
    parr = np.asarray(parents, dtype=np.int64)
    if word_stats:
        return grams, parr, nw, wchars
    return grams, parr


def contamination_hash_partials(tbl: pa.Table, n: int = 8,
                                text_col: str = "text") -> pa.Table:
    """Per-batch DISTINCT word-n-gram hashes of the benchmark side —
    the combiner half of building a decontamination index.  Output is a
    one-column table ``h`` (int64 view of xxh64) whose union across
    batches the driver folds with ``np.unique``.  Shuffle/driver traffic
    is hashes only, never benchmark text."""
    grams, _ = _word_ngram_flat(tbl.column(text_col).to_pylist(), n)
    h = np.unique(xxh64_many(grams).view(np.int64)) if grams else np.array([], np.int64)
    return pa.table({"h": pa.array(h, pa.int64())})


def contamination_index(bench: rd.Dataset, n: int = 8,
                        text_col: str = "text") -> np.ndarray:
    """Build the benchmark n-gram index: distributed per-batch distinct
    hash partials, one driver ``np.unique`` fold → SORTED int64 array.
    The benchmark side is small by definition (a test/eval set), so the
    index is the classic broadcast small side: ``ray.put`` it once and
    probe it inside every :func:`contamination_scores` batch — no
    shuffle join against the 100 TB corpus."""
    parts = bench.map_batches(
        lambda t: contamination_hash_partials(t, n=n, text_col=text_col),
        batch_format="pyarrow",
    )
    chunks = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not chunks:
        return np.array([], np.int64)
    return np.unique(np.concatenate(chunks))


def contamination_scores(tbl: pa.Table, bench_sorted: np.ndarray, n: int = 8,
                         text_col: str = "text") -> pa.Table:
    """Benchmark-decontamination scores (the GPT-3/Gopher n-gram overlap
    rule — Brown et al. 2020 appx C family, public): per document, the
    number of DISTINCT word n-grams, how many of them appear in the
    benchmark index, and a ``contaminated`` flag (any hit).

    ``bench_sorted`` is the sorted int64 hash array from
    :func:`contamination_index` (pass the ``ray.get`` of a broadcast
    ref).  Vectorized: one hash call over the whole batch's grams, one
    lexsort for per-doc distinct, one ``np.searchsorted`` membership
    probe, two ``bincount`` folds.  Hash membership (not string) — an
    xxh64 collision against the index is ~1e-13 per distinct gram at a
    10M-ngram benchmark; acceptable for a removal filter."""
    texts = tbl.column(text_col).to_pylist()
    nrows = tbl.num_rows
    n_ngrams = np.zeros(nrows, np.int64)
    n_hits = np.zeros(nrows, np.int64)
    grams, parents = _word_ngram_flat(texts, n)
    if grams:
        h = xxh64_many(grams).view(np.int64)
        order = np.lexsort((h, parents))
        p, hh = parents[order], h[order]
        first = np.concatenate([[True], (p[1:] != p[:-1]) | (hh[1:] != hh[:-1])])
        pu, hu = p[first], hh[first]
        n_ngrams = np.bincount(pu, minlength=nrows)
        if len(bench_sorted):
            pos = np.searchsorted(bench_sorted, hu)
            pos[pos == len(bench_sorted)] = 0
            hit = bench_sorted[pos] == hu
            n_hits = np.bincount(pu[hit], minlength=nrows)
    return (
        tbl.append_column("n_ngrams", pa.array(n_ngrams, pa.int64()))
        .append_column("n_hits", pa.array(n_hits, pa.int64()))
        .append_column("contaminated", pa.array(n_hits > 0))
    )


def decontaminate(docs: rd.Dataset, bench: rd.Dataset, n: int = 8,
                  text_col: str = "text", drop: bool = False) -> rd.Dataset:
    """End-to-end benchmark decontamination over a corpus Dataset:
    build the benchmark index (small side), broadcast it once, score
    every document; ``drop=True`` filters contaminated rows out instead
    of annotating.  The corpus streams — only hashes and the per-row
    score columns are added."""
    import ray

    idx_ref = ray.put(contamination_index(bench, n=n, text_col=text_col))

    def score(t: pa.Table) -> pa.Table:
        out = contamination_scores(t, ray.get(idx_ref), n=n, text_col=text_col)
        if drop:
            out = out.filter(pc.invert(out.column("contaminated").combine_chunks()))
        return out

    return docs.map_batches(score, batch_format="pyarrow")


def char_ngrams(text: str, lo: int = 3, hi: int = 5) -> list[str]:
    """Char n-grams of a cleaned string (sizes lo..hi) — the Lucene
    ``NGramTokenizer`` semantics of `NGramAnalyzer.java:105-122` with the
    reference's 3-5 sizing (`NgamFeatureSelection.java:24-25`)."""
    s = re.sub(r"\W+", " ", (text or "").lower()).strip()
    out = []
    for n in range(lo, hi + 1):
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out


def ngram_explode(tbl: pa.Table, text_col: str = "text", lo: int = 3, hi: int = 5,
                  keep_cols: tuple = ()) -> pa.Table:
    """One row per (doc, ngram) — feeds the A7 frequency groupby."""
    texts = tbl.column(text_col).to_pylist()
    grams, idx = [], []
    for i, t in enumerate(texts):
        g = char_ngrams(t, lo, hi)
        grams.extend(g)
        idx.extend([i] * len(g))
    cols = {"ngram": pa.array(grams, pa.string())}
    for c in keep_cols:
        cols[c] = tbl.column(c).take(pa.array(idx, pa.int64()))
    return pa.table(cols)


def ngram_class_scores(ds: rd.Dataset, text_col: str, cls_col: str,
                       pos_label: str, min_count: int = 5) -> rd.Dataset:
    """A7/A8: ngram frequency per class, pruned, scored
    ``score = pos_count - neg_count`` (`NgamFeatureSelection.java:156-163`).

    Shape: explode → per-batch (ngram, pos/neg partial counts) →
    ONE grouped sum → vectorized score/filter.  No per-ngram python
    groups (a map_groups here would create one pandas group per distinct
    ngram — death by group overhead at corpus scale)."""
    from .relational import grouped_agg

    def explode(tbl: pa.Table) -> pa.Table:
        ex = ngram_explode(tbl, text_col=text_col, keep_cols=(cls_col,))
        is_pos = pa.compute.equal(ex.column(cls_col), pos_label)
        return pa.table(
            {
                "ngram": ex.column("ngram"),
                "_pos": pa.compute.cast(is_pos, pa.int64()),
                "_neg": pa.compute.cast(pa.compute.invert(is_pos), pa.int64()),
            }
        )

    # grouped_agg, not Ray groupby(Sum): the ngram vocabulary is a
    # high-cardinality key at corpus scale (see relational.grouped_agg)
    sums = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["ngram"],
        [("_pos", "sum", "pos_cnt"), ("_neg", "sum", "neg_cnt")],
    )

    def score(tbl: pa.Table) -> pa.Table:
        pos = tbl.column("pos_cnt").to_numpy(zero_copy_only=False)
        neg = tbl.column("neg_cnt").to_numpy(zero_copy_only=False)
        keep = (pos + neg) >= min_count
        out = tbl.filter(pa.array(keep))
        return pa.table(
            {
                "ngram": out.column("ngram"),
                "score": pa.array(
                    out.column("pos_cnt").to_numpy(zero_copy_only=False)
                    - out.column("neg_cnt").to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
            }
        )

    return sums.map_batches(score, batch_format="pyarrow")


def inverted_index(docs: rd.Dataset, text_col: str = "text",
                   id_col: str = "doc_id",
                   num_partitions: int = 32) -> rd.Dataset:
    """Build an inverted index over whitespace tokens: one row per term
    with its document frequency and an md5 digest of the ascending
    comma-joined posting list (the digest stands in for the list itself
    so the result is hash-comparable and O(vocab), not O(postings),
    on the driver).

    The reference stops at token COUNTS
    (``WordCounterMap.java:39-47``); a retrieval/dedup stack needs the
    postings.  Scale shape: the explode dedupes (term, doc) pairs
    per batch (combiner), then ONE term-bucket shuffle
    (:func:`~.relational.partitioned_map_arrow`) builds each term's
    full posting list inside its bucket — posting lists never
    concatenate on the driver, and a hot term costs its own bucket
    only.  Tokenizer = Arrow ``split_pattern`` on RE2 ``\\s+``, the
    same engine as the DuckDB oracle (see ``_WS_RE`` note).
    """
    import hashlib

    # local import: avoids a circular import at module load
    from .relational import arrow_group_by, partitioned_map_arrow

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.cast(t.column(text_col).combine_chunks(), pa.string()),
            pattern=r"[ \t\n\f\r]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = t.column(id_col).take(parent)
        keep = pc.not_equal(flat, "")
        pairs = pa.table({"term": flat.filter(keep), id_col: ids.filter(keep)})
        # per-batch (term, doc) dedup: bounds the shuffle at one row per
        # distinct pair per batch
        return arrow_group_by(pairs, ["term", id_col], [])

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")

    out_schema = pa.schema([
        pa.field("term", pa.string()),
        pa.field("df", pa.int64()),
        pa.field("postings_md5", pa.string()),
    ])

    def build(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.integer):
            ids = ids.astype(np.int64)
        # non-integer ids sort/join as their string form (the digest is
        # over the ascending string order in that case)
        order = np.lexsort((ids, terms))
        terms, ids = terms[order], ids[order]
        # cross-batch dedup of (term, doc) pairs
        if len(terms):
            first = np.ones(len(terms), bool)
            first[1:] = (terms[1:] != terms[:-1]) | (ids[1:] != ids[:-1])
            terms, ids = terms[first], ids[first]
        bounds = np.flatnonzero(
            np.concatenate(([True], terms[1:] != terms[:-1], [True]))
        ) if len(terms) else np.array([0])
        out_t, out_df, out_md5 = [], [], []
        id_strs = ids.astype("U")
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            out_t.append(terms[lo])
            out_df.append(hi - lo)
            out_md5.append(hashlib.md5(
                ",".join(id_strs[lo:hi]).encode()).hexdigest())
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "df": pa.array(out_df, pa.int64()),
                         "postings_md5": pa.array(out_md5, pa.string())})

    return partitioned_map_arrow(pairs, ["term"], build, out_schema,
                                 num_partitions=num_partitions)


def bigram_lm_scores(docs: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id", k: float = 0.5,
                     num_partitions: int = 32) -> rd.Dataset:
    """CCNet-style corpus language-model scoring (Wenzek et al. 2020
    train a KenLM and bucket documents head/middle/tail by perplexity;
    here the LM is an add-``k`` bigram model trained on the corpus
    ITSELF in the same distributed pass): per document, the mean
    log10 P(w_i | w_{i-1}) under

        P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)

    with corpus bigram/unigram counts and vocabulary size ``V``.

    Shape (all fixed-width hash rows after the explode — text never
    shuffles, the dup-span/decontaminate convention):
      explode (id, bigram-hash, first-word-hash) + unigram hashes
      → two ``grouped_count`` passes (bigram counts, unigram counts;
        V = unigram-count row count, a metadata count not a scan)
      → two bucketed/adaptive ``hash_join`` probes back to the
        occurrence rows (counts tables are dictionary-sized at bench
        scale → broadcast; at 100 TB they hash-partition)
      → per-doc grouped sum of log10 P → mean.

    Gram equality is xxh64 equality (collision-free on real corpora in
    practice; the SQL oracle counts exact strings — the accepted repo
    convention, see decontaminate).  Output: ``(id, n_bigrams,
    avg_logprob)`` for every document with ≥1 bigram; single-word and
    empty docs drop (SQL side mirrors with a HAVING).
    """
    from . import relational

    i64 = pa.int64()
    occ_schema = pa.schema([(id_col, i64), ("hb", i64), ("h1", i64)])

    def explode_occ(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_ids, h_bi, h_w1 = [], [], []
        for i, txt in enumerate(texts):
            words = _WORD_RE.findall((txt or "").lower())
            if len(words) < 2:
                continue
            uh = xxh64_many(words).view(np.int64)
            bi = [" ".join(p) for p in zip(words[:-1], words[1:])]
            h_bi.append(xxh64_many(bi).view(np.int64))
            h_w1.append(uh[:-1])
            out_ids.append(np.full(len(bi), ids[i], np.int64))
        if not out_ids:
            return occ_schema.empty_table()
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids), i64),
            "hb": pa.array(np.concatenate(h_bi), i64),
            "h1": pa.array(np.concatenate(h_w1), i64),
        })

    def explode_uni(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        all_words: list[str] = []
        for txt in texts:
            all_words.extend(_WORD_RE.findall((txt or "").lower()))
        h = (xxh64_many(all_words).view(np.int64)
             if all_words else np.array([], np.int64))
        return pa.table({"h1": pa.array(h, i64)})

    occ = docs.map_batches(explode_occ, batch_format="pyarrow").materialize()
    uni_counts = relational.grouped_count(
        docs.map_batches(explode_uni, batch_format="pyarrow"),
        ["h1"], alias="cu")
    vocab_v = uni_counts.count()  # grouped_count is eager: metadata count
    bi_counts = relational.grouped_count(
        occ.select_columns(["hb"]), ["hb"], alias="cb")

    j = relational.hash_join(
        occ, bi_counts, "hb", num_buckets=num_partitions,
        left_schema=occ_schema,
        right_schema=pa.schema([("hb", i64), ("cb", i64)]))
    j = relational.hash_join(
        j, uni_counts, "h1", num_buckets=num_partitions,
        left_schema=pa.schema([(id_col, i64), ("hb", i64), ("h1", i64),
                               ("cb", i64)]),
        right_schema=pa.schema([("h1", i64), ("cu", i64)]))

    denom_add = k * float(vocab_v)

    def logp(t: pa.Table) -> pa.Table:
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        cu = t.column("cu").to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log10((cb + k) / (cu + denom_add))
        return pa.table({
            id_col: t.column(id_col),
            "lp": pa.array(lp),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        })

    sums = relational.grouped_agg(
        j.map_batches(logp, batch_format="pyarrow"), [id_col],
        aggs=[("lp", "sum", "lp_sum"), ("one", "sum", "n_bigrams")])

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("lp_sum").to_numpy(zero_copy_only=False)
        avg = np.floor((s / n) * 100000.0 + 0.5) / 100000.0
        return pa.table({
            id_col: t.column(id_col),
            "n_bigrams": t.column("n_bigrams"),
            "avg_logprob": pa.array(avg),
        })

    return sums.map_batches(finish, batch_format="pyarrow")
