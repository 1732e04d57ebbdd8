"""Feature extraction + big/small classifier ensemble (SURVEY.md §2.2
M23-M27, §2.3 T3).

The reference builds a 23-dim handcrafted feature vector per crawled
image (`/root/reference/src/org/commoncrawl/mklab/analysis/ProcessingService.java:595-689`,
ARFF twin `FeaturesArffCreator.java:98-153`), an ngram-presence vector
over a top-2000 vocabulary (`ScoreNgramArffCreator.java:93-102`), and
classifies with two Weka RandomForests combined by an agreement rule
with a confidence-margin tie-break biased +0.05 toward the ngram model
(`ProcessingService.java:209-222`).

Here: the feature builders are vectorized ``map_batches`` kernels; the
ensemble is an actor-pool stage whose "models" are deterministic linear
scorers loaded once per actor in ``__init__`` (no pretrained Weka
artifacts exist or are shippable — the *ensemble semantics* are the
contract, exercised by tests; swap real model weights in via the ctor).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_many

# FeaturesArffCreator.java:98-153 one-hot domains
SUFFIXES = ("jpg", "jpeg", "png", "gif", "bmp", "tif", "tiff", "svg", "webp", "other")
ELEMENTS = ("img", "a", "link", "video", "source", "iframe", "embed", "object")

# M24: dims-from-URL patterns (FeaturesArffCreator.java:155-186)
_DIM_PATTERNS = [
    re.compile(r"(\d{2,4})[xX](\d{2,4})"),          # 350x250
    re.compile(r"[wW]_(\d{2,4})"),                  # w_75
    re.compile(r"(\d{2,4})px"),                     # 250px
    re.compile(r"[?&]w(?:idth)?=(\d{2,4})"),        # width=150
    re.compile(r"_(\d{2,4})\."),                    # _75.
]


def dims_from_url(url: str) -> tuple[int, int]:
    """Extract (w, h) hints from the URL; 0 when absent (M24)."""
    m = _DIM_PATTERNS[0].search(url)
    if m:
        return int(m.group(1)), int(m.group(2))
    for pat in _DIM_PATTERNS[1:]:
        m = pat.search(url)
        if m:
            v = int(m.group(1))
            return v, v
    return 0, 0


def name_and_suffix(url: str) -> tuple[str, str]:
    """Filename after last '/' and suffix after last '.' (M25,
    `FeaturesArffCreator.java:188-194`)."""
    name = url.rsplit("/", 1)[-1]
    base = name.split("?", 1)[0].split("#", 1)[0]
    suffix = base.rsplit(".", 1)[-1].lower() if "." in base else ""
    return base, suffix


def _host(u: str) -> str:
    from urllib.parse import urlsplit

    try:
        h = (urlsplit(u).hostname or "").lower()
    except ValueError:
        return ""
    return h[4:] if h.startswith("www.") else h


FEATURE_NAMES = (
    [f"suffix_{s}" for s in SUFFIXES]
    + ["dom_depth", "dom_sib", "url_w", "url_h", "attr_w", "attr_h",
       "same_domain", "alt_len", "parent_len", "url_len"]
    + [f"elem_{e}" for e in ELEMENTS]
)  # 10 + 10 + 8 = 28 features (superset of the reference's 23)


def media_features_batch(tbl: pa.Table) -> pa.Table:
    """CRAWLED_MEDIA rows → flat feature columns (M23, vectorized where
    the kernel allows; regex scans are per-row python over small strings)."""
    srcs = tbl.column("src").to_pylist()
    pages = tbl.column("page_url").to_pylist()
    alts = tbl.column("alt").to_pylist()
    parents = tbl.column("parent_txt").to_pylist()
    ws = tbl.column("w").to_pylist()
    hs = tbl.column("h").to_pylist()
    elems = tbl.column("dom_elem").to_pylist()
    n = len(srcs)

    cols: dict[str, np.ndarray] = {
        name: np.zeros(n, dtype=np.float64) for name in FEATURE_NAMES
    }
    def _num(s):
        try:
            return float(re.sub(r"\D", "", s) or 0)
        except Exception:
            return 0.0

    for i in range(n):
        src = srcs[i] or ""
        _, suffix = name_and_suffix(src)
        key = suffix if suffix in SUFFIXES else "other"
        cols[f"suffix_{key}"][i] = 1.0
        uw, uh = dims_from_url(src)
        cols["url_w"][i] = uw
        cols["url_h"][i] = uh
        cols["attr_w"][i] = _num(ws[i] or "")
        cols["attr_h"][i] = _num(hs[i] or "")
        sh = _host(src)
        cols["same_domain"][i] = 1.0 if sh and sh == _host(pages[i] or "") else 0.0
        cols["alt_len"][i] = len(alts[i] or "")
        cols["parent_len"][i] = len(parents[i] or "")
        cols["url_len"][i] = len(src)
        e = elems[i]
        if f"elem_{e}" in cols:
            cols[f"elem_{e}"][i] = 1.0
    # dom_depth / dom_sib ride through from the input table (the append
    # loop below skips names already present)

    out = tbl
    for name in FEATURE_NAMES:
        if name in tbl.column_names:  # dom_depth/dom_sib already present
            continue
        out = out.append_column(name, pa.array(cols[name]))
    return out


def build_ngram_vocab(scores, top_n: int = 2000) -> list[str]:
    """Top-N vocabulary from an (ngram, score) table — the ngram side of
    the ensemble (`ScoreNgramArffCreator.java:79-91`)."""
    import pandas as pd

    df = scores if isinstance(scores, pd.DataFrame) else scores.to_pandas()
    return df.sort_values(["score", "ngram"], ascending=[False, True])["ngram"].head(top_n).tolist()


class NgramPresence:
    """map_batches callable: URL → boolean presence vector over the
    broadcast vocabulary (M26/M27).  Vocabulary indexed once per actor."""

    def __init__(self, vocab_ref, url_col: str = "src"):
        import ray

        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, list) else vocab_ref
        self.vocab = list(vocab)
        self.index = {g: i for i, g in enumerate(self.vocab)}
        self.url_col = url_col
        self._sizes = sorted({len(g) for g in self.vocab}) or [3]

    def url_ngrams(self, url: str) -> set[str]:
        """URL-decode, strip protocol + short extension, split on
        /|.|- and non-word, char-ngram (`ScoreNgramArffCreator.java:104-138`)."""
        from urllib.parse import unquote

        u = unquote(url or "").lower()
        u = re.sub(r"^[a-z]+://", "", u)
        u = re.sub(r"\.[a-z0-9]{1,4}$", "", u)
        parts = re.split(r"[/.\-]|\W+", u)
        out: set[str] = set()
        for p in parts:
            for k in self._sizes:
                if len(p) >= k:
                    out.update(p[i : i + k] for i in range(len(p) - k + 1))
        return out

    def __call__(self, tbl: pa.Table) -> pa.Table:
        urls = tbl.column(self.url_col).to_pylist()
        n = len(urls)
        mat = np.zeros((n, len(self.vocab)), dtype=bool)
        for i, u in enumerate(urls):
            for g in self.url_ngrams(u):
                j = self.index.get(g)
                if j is not None:
                    mat[i, j] = True
        return tbl.append_column(
            "ngram_vec", pa.array(list(mat), pa.list_(pa.bool_()))
        ).append_column("ngram_hits", pa.array(mat.sum(axis=1).astype(np.int64)))


class EnsembleClassifier:
    """T3: the agreement-else-margin ensemble
    (`ProcessingService.java:196-228`), as an actor-pool stage.

    Two scorers produce P(big): a linear model over the feature columns
    and an ngram-hit-rate model.  If both agree on the label, take it;
    else take the side with the larger confidence margin, with
    ``ngram_bias`` (+0.05) added to the ngram margin — the reference's
    tie-break (`:218`).  Model weights load once per actor; pass real
    trained weights via the constructor to swap models in.
    """

    def __init__(self, feature_weights: dict | None = None, ngram_bias: float = 0.05,
                 threshold: float = 0.5, bias: float = -0.5):
        if feature_weights is None:
            # deterministic default stand-in weights: bigger rendered
            # dims / deeper standalone <img> tags → likely "big"
            feature_weights = {
                "attr_w": 0.002, "attr_h": 0.002, "url_w": 0.002, "url_h": 0.002,
                "alt_len": 0.004, "elem_img": 0.3, "same_domain": 0.1,
                "dom_depth": -0.01, "dom_sib": -0.02, "suffix_gif": -0.4,
            }
        self.w = feature_weights
        self.ngram_bias = ngram_bias
        self.threshold = threshold
        self.bias = bias

    @staticmethod
    def _sigmoid(x: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-x))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        z = np.zeros(n, dtype=np.float64)
        for name, w in self.w.items():
            if name in tbl.column_names:
                z += w * tbl.column(name).to_numpy(zero_copy_only=False)
        p_feat = self._sigmoid(z + self.bias)
        if "ngram_hits" in tbl.column_names:
            hits = tbl.column("ngram_hits").to_numpy(zero_copy_only=False).astype(np.float64)
            p_ngram = self._sigmoid(0.08 * hits - 0.5)
        else:
            p_ngram = np.full(n, 0.5)

        big_f = p_feat >= self.threshold
        big_n = p_ngram >= self.threshold
        margin_f = np.abs(p_feat - self.threshold)
        margin_n = np.abs(p_ngram - self.threshold) + self.ngram_bias
        # agreement rule, else larger margin wins (ngram-biased)
        is_big = np.where(big_f == big_n, big_f, np.where(margin_n >= margin_f, big_n, big_f))
        return (
            tbl.append_column("p_feat", pa.array(p_feat))
            .append_column("p_ngram", pa.array(p_ngram))
            .append_column("is_big", pa.array(is_big))
        )


class PresenceAndEnsemble:
    """Fused M27→T3 actor-pool stage: ngram presence + ensemble scoring
    in ONE pool so the pipeline pays a single actor spin-up (the two
    operators stay independently usable/tested; this is the composed
    hot-path form).  Vocabulary index + model weights built once per
    actor."""

    def __init__(self, vocab_ref, url_col: str = "src", **ensemble_kw):
        self.presence = NgramPresence(vocab_ref, url_col=url_col)
        self.ensemble = EnsembleClassifier(**ensemble_kw)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        return self.ensemble(self.presence(tbl))


def train_feature_weights(
    data, feature_cols, label_col: str = "label", ridge: float = 1e-3
):
    """Train the feature-side model: one-pass distributed RIDGE
    least-squares fit of a linear probability model (the deterministic
    analog of the reference's offline RandomForest training,
    `WekaTrainer.java:23-47`).

    Shape: each batch computes a partial Gram matrix ``Xᵀ X`` and
    moment ``Xᵀ y`` over the bias-augmented feature matrix (k+1 × k+1
    doubles — tiny); partials sum on the driver and one ``solve``
    yields the coefficients.  ONE streaming pass, no iteration, no
    shuffle — at 10^10 rows the only driver state is the (k+1)² matrix.

    Determinism: the engine's media features are integer-valued
    (lengths, pixel dims, one-hots) and the label is 0/1, so every
    partial is an exactly-representable integer and float64 summation
    is order-independent — identical coefficients under any batch
    split (pinned by ``test_train_feature_weights``).

    ``data`` is a ``ray.data.Dataset`` or a ``pyarrow.Table`` (the
    no-Ray path used by fixture/oracle builders).  Returns
    ``(weights: dict[col, float], bias: float)``; feed them to
    :class:`EnsembleClassifier` as ``feature_weights=weights,
    bias=trained_bias - 0.5`` so the 0.5 decision threshold matches
    the linear-probability fit (``sigmoid(p̂ - 0.5) >= 0.5 ⟺ p̂ >= 0.5``).
    """
    feature_cols = list(feature_cols)
    k = len(feature_cols)

    def gram(tbl: pa.Table):
        X = np.stack(
            [tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in feature_cols],
            axis=1,
        )
        X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        y = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return X.T @ X, X.T @ y

    if isinstance(data, pa.Table):
        G, m = gram(data)
    else:
        def partial(tbl: pa.Table) -> pa.Table:
            Gp, mp = gram(tbl)
            return pa.table({
                "g": pa.array([Gp.ravel().tolist()], pa.list_(pa.float64())),
                "m": pa.array([mp.tolist()], pa.list_(pa.float64())),
            })

        parts = data.map_batches(partial, batch_format="pyarrow").to_pandas()
        G = np.zeros((k + 1, k + 1))
        m = np.zeros(k + 1)
        for g_row, m_row in zip(parts["g"], parts["m"]):
            G += np.asarray(g_row).reshape(k + 1, k + 1)
            m += np.asarray(m_row)
    G = G + ridge * np.eye(k + 1)
    w = np.linalg.solve(G, m)
    return dict(zip(feature_cols, (float(v) for v in w[:k]))), float(w[k])


def f1_eval(labels: np.ndarray, preds: np.ndarray) -> dict:
    """A12: per-class precision/recall/F1 (`FakeArffCreator.java:105-115`)."""
    out = {}
    for cls, name in ((True, "big"), (False, "small")):
        tp = int(((preds == cls) & (labels == cls)).sum())
        fp = int(((preds == cls) & (labels != cls)).sum())
        fn = int(((preds != cls) & (labels == cls)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        out[name] = {
            "precision": p, "recall": r,
            "f1": 2 * p * r / (p + r) if p + r else 0.0,
        }
    out["avg_f1"] = (out["big"]["f1"] + out["small"]["f1"]) / 2
    return out
