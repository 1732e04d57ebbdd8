"""Deterministic synthetic fixture generators (FIXTURES.md F1-F5).

Everything is a pure function of ``(seed, n)`` — bit-identical across
runs/processes — because the crawl pipeline's "network fetch" stage
re-renders the same procedural images from the URL key and validates the
decode against them (the sandbox stand-in for per-row validation against
the reference's downloads, `ProcessingService.java:329-388`).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from . import imagecodec, schemas
from .hashing import xxh64

GLOBAL_SEED = 42

# Word list for captions / documents (fixed, public-domain words).
WORDS = (
    "sunset harbor mountain bicycle window garden bridge market lantern "
    "river forest temple station library coffee shadow mirror autumn spring "
    "island castle violin butter meadow copper silver marble velvet amber"
).split()

FMTS = ("png", "jpg", "bmp")
# Mixed rotation for the image-payload query family: includes real GIF
# (3-3-2 palette quantization for >256-color sources) and real baseline
# JFIF (spec 10918-1, PSNR>=40dB) — the web-crawl format mix the
# reference's ImageIO decode path faced (ImageUtils.java:89-132).
FMTS_MIXED = ("png", "jpg", "bmp", "gif", "jfif")
SIZES = (96, 128, 64, 112, 32, 120, 104, 48, 128, 112)  # scaled-down stand-in
# for the reference's >=400px admission gate (ImageUtils.java:27-28): the
# gate value is a pipeline parameter (min_dim), 400 at production scale.
SMALL_DIM_GATE = 100


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng(list(key))


def render_image(key: int, w: int, h: int) -> np.ndarray:
    """Procedural RGB image: deterministic gradient + seeded noise."""
    rng = _rng(GLOBAL_SEED, key & 0xFFFFFFFF, (key >> 32) & 0xFFFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    ph = int(rng.integers(0, 256))
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1) + ph) % 256,
            (yy * 255 // max(h - 1, 1) + ph // 2) % 256,
            ((xx + yy) * 255 // max(w + h - 2, 1)) % 256,
        ],
        axis=-1,
    )
    noise = rng.integers(-6, 7, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def caption_for(key: int) -> str:
    """Deterministic 3-12 word caption; ~5% empty."""
    rng = _rng(GLOBAL_SEED + 1, key & 0xFFFFFFFF, (key >> 32) & 0xFFFFFFFF)
    if rng.random() < 0.05:
        return ""
    k = int(rng.integers(3, 13))
    idx = rng.integers(0, len(WORDS), k)
    return " ".join(WORDS[j] for j in idx)


def image_dims(key: int) -> tuple[int, int]:
    """Deterministic (w, h) for row key; near-dup rows inherit their
    source row's dims."""
    if key % 97 == 96:
        return image_dims(key - 1)
    return (
        SIZES[key % len(SIZES)],
        SIZES[(key // len(SIZES) + 3) % len(SIZES)],
    )


@functools.lru_cache(maxsize=512)
def expected_pixels(key: int) -> np.ndarray:
    """The pre-encode reference pixels for row ``key`` — recomputable by
    the decode-validate stage (the sandbox stand-in for validating a
    fetched image against the reference's download,
    `ProcessingService.java:329-388`).  Every 97th row is a +2-intensity
    near-dup of the previous row (same phash bucket).

    Cached per process (the store repeats ids across the frontier, so a
    fetched id's reference is re-validated many times; ≤ 512 × ~50 KB
    ≈ 25 MB/worker).  The returned array is marked read-only — an
    in-place mutation would corrupt the cache for every later caller."""
    w, h = image_dims(key)
    if key % 97 == 96:
        base = render_image(key - 1, w, h)
        img = np.clip(base.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    else:
        img = render_image(key, w, h)
    img.setflags(write=False)
    return img


def image_row(key: int, fmts: tuple = FMTS) -> dict:
    """One images-table row for URL/row key ``key`` (near-dup rule in
    :func:`expected_pixels`)."""
    w, h = image_dims(key)
    fmt = fmts[key % len(fmts)]
    img = expected_pixels(key)
    data = imagecodec.encode(img, fmt)
    return {
        "image_id": f"img-{key:010d}",
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption_for(key),
        "phash": np.int64(np.uint64(imagecodec.phash64(img)).view(np.int64)),
    }


def images_table(n: int, seed: int = GLOBAL_SEED, fmts: tuple = FMTS) -> pa.Table:
    """F1: the image+caption table (driver input_hint shape)."""
    assert seed == GLOBAL_SEED, "fixture is keyed off the global seed"
    rows = {name: [] for name in schemas.IMAGES.names}
    for i in range(n):
        r = image_row(i, fmts)
        for k, v in r.items():
            rows[k].append(v)
    return pa.table(rows, schema=schemas.IMAGES)


def mixed_images_table(n: int) -> pa.Table:
    """images_table over the FMTS_MIXED rotation (adds real GIF + real
    baseline JFIF payloads) — input to the image-payload query family."""
    return images_table(n, fmts=FMTS_MIXED)


# ---------------------------------------------------------------------------
# F2/F3: frontier seeds + robots
# ---------------------------------------------------------------------------

def _zipf_host(rng: np.random.Generator, n_hosts: int) -> int:
    """Zipf(1.2)-skewed host index in [0, n_hosts) — hot-host skew."""
    while True:
        k = int(rng.zipf(1.2))
        if k <= n_hosts:
            return k - 1


def frontier_seeds_table(n: int, n_hosts: int = 20, seed: int = GLOBAL_SEED) -> pa.Table:
    """F2: seed URL list with www.-prefixes, relative URLs, embedded
    whitespace, and ~2% post-canonicalization duplicates."""
    rng = _rng(seed, 7001)
    seed_urls, page_urls, ranks = [], [], []
    canon_targets: list[tuple[str, str]] = []  # (host, path) issued so far
    for i in range(n):
        hk = _zipf_host(rng, n_hosts)
        host = f"host{hk:04d}.example"
        r = rng.random()
        if r < 0.02 and canon_targets:
            # duplicate of an earlier URL, disguised with www. or whitespace
            dh, dp = canon_targets[int(rng.integers(0, len(canon_targets)))]
            disguise = int(rng.integers(0, 3))
            if disguise == 0:
                u = f"http://www.{dh}{dp}"
            elif disguise == 1:
                u = f"http://{dh}{dp[:3]} {dp[3:]}"  # embedded whitespace
            else:
                u = f"http://{dh}:80{dp}"
            seed_urls.append(u)
            page_urls.append(f"http://{dh}/index.html")
        else:
            path = f"/img/i{i}.{FMTS[i % len(FMTS)]}"
            if r < 0.10:
                path = f"/private/p{i}.png"  # robots-disallowed subtree
            if 0.10 <= r < 0.25:
                # relative URL resolved against page_url (ProcessingService.java:436-474)
                depth = int(rng.integers(1, 3))
                page_urls.append(f"http://{host}/a/b/c/page{i}.html")
                seed_urls.append("../" * depth + f"pics/i{i}.jpg")
                resolved = "/a/b/c/"
                for _ in range(depth):
                    resolved = resolved[: resolved.rstrip("/").rfind("/") + 1]
                canon_targets.append((host, resolved + f"pics/i{i}.jpg"))
                ranks.append(i)
                continue
            if 0.25 <= r < 0.35:
                u = f"http://www.{host}{path}"
            elif 0.35 <= r < 0.38:
                u = f"http://{host}{path[:4]} {path[4:]}"
            else:
                u = f"http://{host}{path}"
            seed_urls.append(u)
            page_urls.append(f"http://{host}/index.html")
            canon_targets.append((host, path))
        ranks.append(i)
    return pa.table(
        {
            "seed_url": seed_urls,
            "page_url": page_urls,
            "seed_rank": np.array(ranks, dtype=np.int64),
        },
        schema=schemas.FRONTIER_SEEDS,
    )


def robots_table(n_hosts: int = 20, seed: int = GLOBAL_SEED) -> pa.Table:
    """F3: per-host crawl-delay + disallow prefixes.  150ms mirrors the
    reference's global MIN_CALL_INTERVAL (ProcessingService.java:57)."""
    delays = (0, 150, 500, 1000)
    hosts = [f"host{k:04d}.example" for k in range(n_hosts)]
    delay = [delays[k % len(delays)] for k in range(n_hosts)]
    dis = [["/private/"] if k % 10 == 3 else [] for k in range(n_hosts)]
    return pa.table(
        {
            "host": hosts,
            "crawl_delay_ms": np.array(delay, dtype=np.int64),
            "disallow_prefixes": dis,
        },
        schema=schemas.ROBOTS,
    )


# ---------------------------------------------------------------------------
# F5: WARC-record table (drives tag/word/server-count + media extraction)
# ---------------------------------------------------------------------------

_TAGS = ("html", "head", "body", "div", "p", "a", "img", "span", "table", "li")
_SERVERS = ("Apache", "nginx", "IIS", None)


def _html_body(rng: np.random.Generator, i: int) -> str:
    parts = ["<html>", "<head><title>t</title></head>", "<body>"]
    n_el = int(rng.integers(3, 12))
    for j in range(n_el):
        t = _TAGS[int(rng.integers(0, len(_TAGS)))]
        if t == "img":
            parts.append(
                f'<img src="/img/i{i}_{j}.jpg" alt="{caption_for(i * 1000 + j)}" '
                f'width="{int(rng.integers(10, 900))}">'
            )
        elif t == "a":
            parts.append(f'<a href="http://host{int(rng.integers(0, 20)):04d}.example/m{j}.png">x</a>')
        else:
            parts.append(f"<{t}>{WORDS[int(rng.integers(0, len(WORDS)))]}</{t}>")
    parts.append("</body></html>")
    return "".join(parts)


def warc_records_table(n: int, seed: int = GLOBAL_SEED) -> pa.Table:
    rng = _rng(seed, 9001)
    urls, types, mimes, payloads = [], [], [], []
    for i in range(n):
        url = f"http://host{int(rng.integers(0, 20)):04d}.example/page{i}.html"
        r = rng.random()
        if r < 0.55:  # HTTP response w/ HTML (TagCounterMap path)
            body = _html_body(rng, i)
            payload = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n" + body
            ).encode()
            types.append("response")
            mimes.append("application/http; msgtype=response")
        elif r < 0.75:  # WET plain text (WordCounterMap path)
            nw = int(rng.integers(0, 40))
            text = " ".join(WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(nw))
            payload = text.encode()
            types.append("conversion")
            mimes.append("text/plain")
        elif r < 0.95:  # WAT json (ServerTypeMap path)
            srv = _SERVERS[int(rng.integers(0, len(_SERVERS)))]
            hdr = {} if srv is None else {"Server": srv}
            import json

            payload = json.dumps(
                {
                    "Envelope": {
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": {"Headers": hdr}
                        }
                    }
                }
            ).encode()
            types.append("metadata")
            mimes.append("application/json")
        else:  # other mime → NON_PLAIN_TEXT-style counter golden
            payload = b"\x00\x01binary"
            types.append("resource")
            mimes.append("application/octet-stream")
        urls.append(url)
        payloads.append(payload)
    return pa.table(
        {"record_url": urls, "warc_type": types, "mime": mimes, "payload": payloads},
        schema=schemas.WARC_RECORDS,
    )


def stable_hash_str(s: str) -> int:
    return xxh64(s.encode())


def media_training_table(n: int = 4000, seed: int = GLOBAL_SEED + 9) -> pa.Table:
    """Deterministic labeled training set for the big/small classifier
    (the offline-training corpus stand-in — the reference trains its
    RandomForests offline on labeled crawled media,
    `WekaTrainer.java:23-47`; 4.6M-record scans in
    `NgamFeatureSelection.java:29`).  All feature values are INTEGER
    floats so the one-pass ridge trainer's Gram partials are exact
    (order-independent summation — see
    ops/features.train_feature_weights)."""
    rng = _rng(seed, 0)
    attr_w = np.where(rng.random(n) < 0.5, rng.integers(0, 1600, n), 0).astype(np.float64)
    url_w = np.where(rng.random(n) < 0.4, rng.integers(0, 1200, n), 0).astype(np.float64)
    url_h = np.where(url_w > 0, (url_w * 3) // 4, 0.0)
    alt_len = rng.integers(0, 120, n).astype(np.float64)
    elem_img = (rng.random(n) < 0.6).astype(np.float64)
    same_domain = (rng.random(n) < 0.5).astype(np.float64)
    dom_depth = rng.integers(1, 12, n).astype(np.float64)
    dom_sib = rng.integers(0, 40, n).astype(np.float64)
    suffix_gif = (rng.random(n) < 0.15).astype(np.float64)
    attr_h = np.where(attr_w > 0, (attr_w * 3) // 4, 0.0)
    # ground truth: a noisy linear rule over rendered/url size hints —
    # integer noise keeps the label deterministic across platforms
    score = (
        3 * attr_w + 2 * url_w + 1 * url_h + 5 * alt_len
        + 300 * elem_img + 80 * same_domain
        - 10 * dom_depth - 12 * dom_sib - 450 * suffix_gif
        + rng.integers(-150, 150, n)
    )
    label = (score > 600).astype(np.int64)
    return pa.table({
        "attr_w": attr_w, "attr_h": attr_h, "url_w": url_w, "url_h": url_h,
        "alt_len": alt_len, "elem_img": elem_img, "same_domain": same_domain,
        "dom_depth": dom_depth, "dom_sib": dom_sib, "suffix_gif": suffix_gif,
        "label": label,
    })


# ---------------------------------------------------------------------------
# Enriched text corpus for PII / line-level cleaning ops
# ---------------------------------------------------------------------------

_NAMES = ("alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi")
_MAIL_DOMS = ("example", "mailhost", "webmail", "corp")
_TLDS = ("com", "org", "net")

# Shared boilerplate pool: lines that repeat VERBATIM across documents
# (line_dedup targets) — some also trip the C4 blocklist / length /
# terminal-punctuation gates (line_filter targets).
_BOILERPLATE = (
    "please enable javascript to view the dynamic content of this site.",
    "we use cookies to improve your browsing experience on this site.",
    "all rights reserved.",
    "terms of use and privacy policy apply to every page here.",
    "subscribe to our newsletter for weekly updates and offers.",
    "click here to read more about our featured stories today.",
    "copyright notice",
    "share this article with your friends on social media now!",
    "this site requires javascript and cookies to work properly.",
    "navigation menu",
)


def _rich_sentence(rng: np.random.Generator, doc_id: int, j: int,
                   n_words: int, terminal: str) -> str:
    """Unique-per-(doc,line) sentence: seeded words + an id token so no
    two 'normal' lines collide across the corpus."""
    ws = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n_words - 1)]
    ws.append(f"note{doc_id}x{j}")
    return " ".join(ws) + terminal


def _pii_line(rng: np.random.Generator) -> str:
    """A >=5-word, terminal-punctuated sentence embedding 1-2 PII items
    (so it SURVIVES line_filter and pii_scrub has work to do)."""
    kind = int(rng.integers(0, 4))
    name = _NAMES[int(rng.integers(0, len(_NAMES)))]
    if kind == 0:
        email = (f"{name}{int(rng.integers(0, 99))}"
                 f"@{_MAIL_DOMS[int(rng.integers(0, len(_MAIL_DOMS)))]}"
                 f".{_TLDS[int(rng.integers(0, len(_TLDS)))]}")
        return f"contact {email} for more details about the order."
    if kind == 1:
        phone = (f"{int(rng.integers(200, 1000))}-{int(rng.integers(100, 1000))}"
                 f"-{int(rng.integers(0, 10000)):04d}")
        return f"call {phone} during office hours to reach {name}."
    if kind == 2:
        ip = ".".join(str(int(rng.integers(1, 255))) for _ in range(4))
        return f"the origin server at {ip} responded slowly yesterday."
    email = f"{name}@{_MAIL_DOMS[int(rng.integers(0, len(_MAIL_DOMS)))]}.com"
    phone = f"555-{int(rng.integers(100, 1000))}-{int(rng.integers(0, 10000)):04d}"
    return f"email {email} or call {phone} before noon please."


def rich_documents_table(n: int, seed: int = GLOBAL_SEED) -> pa.Table:
    """Deterministic enriched text corpus for the PII-scrub / line-filter
    / line-dedup operators (the sf documents table has no digits, @, or
    newlines, so cleaning oracles over it would verify identity
    transforms — NOTES_r3.md).  Pure function of (seed, n); ASCII only
    (the RE2-vs-Python regex parity scope).  Per doc, 3-12 newline-joined
    lines drawn from: unique sentences, shared boilerplate (cross-doc
    verbatim duplicates), short lines, lines without terminal
    punctuation, PII-bearing sentences, and within-doc repeats."""
    rng = _rng(seed, 7107)
    doc_ids, texts = [], []
    for i in range(n):
        n_lines = 3 + int(rng.integers(0, 10))
        lines: list[str] = []
        for j in range(n_lines):
            r = rng.random()
            if r < 0.40:
                lines.append(_rich_sentence(
                    rng, i, j, 5 + int(rng.integers(0, 11)),
                    ".!?"[int(rng.integers(0, 3))]))
            elif r < 0.58:
                lines.append(_BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))])
            elif r < 0.68:  # short line (fails the >=5 word gate)
                k = 1 + int(rng.integers(0, 4))
                lines.append(" ".join(
                    WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(k)) + ".")
            elif r < 0.76:  # no terminal punctuation
                lines.append(_rich_sentence(rng, i, j + 500,
                                            6 + int(rng.integers(0, 4)), ""))
            elif r < 0.90:
                lines.append(_pii_line(rng))
            elif lines:  # within-doc verbatim repeat
                lines.append(lines[int(rng.integers(0, len(lines)))])
            else:
                lines.append(_rich_sentence(rng, i, j, 6, "."))
        doc_ids.append(i)
        texts.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
