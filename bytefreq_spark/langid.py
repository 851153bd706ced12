"""Vectorized language identification (fastText-style linear scoring, made
deterministic and SQL-free).

Two-tier classifier over a pandas Series of texts (no per-row Python — all
operations are C-level pandas/numpy):

1. **Script tier**: character-class ratios (CJK / Cyrillic / Greek /
   Devanagari) computed with vectorized regex counts → zh / ru / el / hi.
   Runs only on the non-ASCII subset (``str.isascii`` fast path — pure-ASCII
   text cannot contain script-tier characters).
2. **Latin tier**: per-language marker-token hit rates (the high-weight
   features a fastText supervised model learns for closely related Latin
   languages) → argmax with a fixed deterministic tie-break.  Implemented as
   ONE ``\\w+`` tokenize pass + packed-bitmask dictionary lookups instead of
   four alternation-regex scans (~4× faster, same counts: a ``\\b``-bounded
   pure-letter marker matches exactly when it equals a maximal ``\\w+`` token
   case-insensitively).

Returns ISO-639-1 codes; ``und`` for empty/non-linguistic text.

``detect_language_naive`` keeps the original regex-scan formulation; the
differential test asserts fast == naive so the optimization can never drift.

This mirrors bytefreq's mask philosophy: cheap character-class evidence first
(the HU mask already *is* a script detector), expensive modelling never.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Unicode script ranges (public Unicode block boundaries)
SCRIPT_PATTERNS = {
    "zh": r"[぀-ヿ㐀-䶿一-鿿]",  # CJK (+kana)
    "ru": r"[Ѐ-ӿ]",
    "el": r"[Ͱ-Ͽ]",
    "hi": r"[ऀ-ॿ]",
}
SCRIPT_THRESHOLD_NUM = 3    # fire when script_chars * 10 >= n_chars * 3 (30%)
SCRIPT_THRESHOLD_DEN = 10

# Marker words per Latin language: function words a supervised linear model
# would weight highest.  Single source of truth — the naive path derives its
# word-bounded regexes from these same lists.
LATIN_MARKER_WORDS = {
    "en": ("the", "and", "of", "to", "is", "you", "that", "it", "with",
           "for", "this", "are", "was", "have", "not", "be"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "un", "une", "que",
           "qui", "dans", "pour", "pas", "vous", "je", "avec", "sur"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich",
           "sie", "mit", "auf", "für", "den", "von", "zu"),
    "es": ("el", "la", "los", "las", "de", "y", "es", "en", "que", "un",
           "una", "por", "para", "con", "no", "se", "su", "del"),
}
LATIN_ORDER = ["en", "fr", "de", "es"]  # deterministic tie-break order
LATIN_MARKERS = {
    lang: r"\b(?:" + "|".join(words) + r")\b"
    for lang, words in LATIN_MARKER_WORDS.items()
}

# marker word → packed per-language membership bits (words can belong to
# several languages, e.g. 'la' in fr and es, 'de' in fr and es)
_PACKED: dict[str, int] = {}
for _i, _lang in enumerate(LATIN_ORDER):
    for _w in LATIN_MARKER_WORDS[_lang]:
        _PACKED[_w] = _PACKED.get(_w, 0) | (1 << _i)

MIN_CHARS = 3  # below this → und
CAP_CHARS = 2048  # language is decidable from a prefix; bounds cost on huge turns


def _latin_scores(sub: pd.Series) -> np.ndarray:
    """(n_langs, n_rows) marker-hit counts ×1000 via one tokenize pass."""
    toks = sub.str.lower().str.findall(r"\w+")
    lens = toks.map(len).to_numpy(dtype=np.int64)
    pos = np.repeat(np.arange(len(sub)), lens)
    flat = [w for lst in toks for w in lst]
    codes = pd.Series(flat, dtype=object).map(_PACKED).fillna(0).to_numpy(
        dtype=np.int64
    ) if flat else np.empty(0, dtype=np.int64)
    scores = np.zeros((len(LATIN_ORDER), len(sub)), dtype=np.int64)
    for i in range(len(LATIN_ORDER)):
        scores[i] = np.bincount(
            pos, weights=(codes >> i) & 1, minlength=len(sub)
        ).astype(np.int64) * 1000
    return scores


def detect_language(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[str] of language codes. Fully vectorized.

    Only the first CAP_CHARS characters are examined (frozen contract shared
    with the reference pipeline)."""
    t = texts.fillna("").str.slice(0, CAP_CHARS)
    n = len(t)
    n_chars = t.str.len().to_numpy(dtype=np.int64)

    out = np.full(n, "und", dtype=object)
    decided = n_chars < MIN_CHARS

    # Script tier, non-ASCII rows only — first script over threshold wins
    ascii_mask = t.map(str.isascii).to_numpy(dtype=bool)
    nonascii_idx = np.flatnonzero(~ascii_mask)
    if len(nonascii_idx):
        sub = t.iloc[nonascii_idx]
        sub_chars = n_chars[nonascii_idx]
        sub_decided = decided[nonascii_idx]
        for lang, pat in SCRIPT_PATTERNS.items():
            cnt = sub.str.count(pat).to_numpy(dtype=np.int64)
            fire = (~sub_decided) & (
                cnt * SCRIPT_THRESHOLD_DEN >= sub_chars * SCRIPT_THRESHOLD_NUM
            )
            out[nonascii_idx[fire]] = lang
            sub_decided |= fire
        decided[nonascii_idx] = sub_decided

    # Latin tier — marker hits per 1k chars, argmax, only undecided rows
    und_idx = np.flatnonzero(~decided)
    if len(und_idx):
        sub = t.iloc[und_idx]
        norm = _latin_scores(sub) // np.maximum(n_chars[und_idx], 1)
        best = np.argmax(norm, axis=0)  # first max wins → LATIN_ORDER tie-break
        best_score = norm[best, np.arange(len(und_idx))]
        latin = best_score > 0
        out[und_idx[latin]] = np.array(LATIN_ORDER, dtype=object)[best[latin]]

    # texts with letters but no markers: keep 'und'
    return pd.Series(out, index=texts.index, dtype=object)


LANGID_FEATURE_COLS = (
    ["n_chars", "is_ascii"]
    + [f"{lang}_cnt" for lang in SCRIPT_PATTERNS]
    + [f"{lang}_score" for lang in LATIN_ORDER]
)


def langid_feature_frame(texts: pd.Series) -> pd.DataFrame:
    """Per-row feature matrix from which the langid decision is a pure
    replay: capped char count, ascii flag, per-script char counts (0 for
    pure-ASCII rows — script characters are non-ASCII by construction),
    raw ×1000 Latin marker scores for every row.

    ``decide_from_features(langid_feature_frame(t)) == detect_language(t)``
    is differential-tested; the split exists so the decision layer can be
    replayed by an independent SQL engine over staged features (the
    ``langid_docs`` oracle)."""
    t = texts.fillna("").str.slice(0, CAP_CHARS)
    n = len(t)
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    ascii_mask = (
        t.map(str.isascii).to_numpy(dtype=bool)
        if n else np.zeros(0, dtype=bool)
    )
    feats: dict[str, np.ndarray] = {"n_chars": n_chars, "is_ascii": ascii_mask}
    nonascii_idx = np.flatnonzero(~ascii_mask)
    sub = t.iloc[nonascii_idx]
    for lang, pat in SCRIPT_PATTERNS.items():
        cnt = np.zeros(n, dtype=np.int64)
        if len(nonascii_idx):
            cnt[nonascii_idx] = sub.str.count(pat).to_numpy(dtype=np.int64)
        feats[f"{lang}_cnt"] = cnt
    scores = (
        _latin_scores(t) if n
        else np.zeros((len(LATIN_ORDER), 0), dtype=np.int64)
    )
    for i, lang in enumerate(LATIN_ORDER):
        feats[f"{lang}_score"] = scores[i]
    return pd.DataFrame(feats, index=texts.index)[LANGID_FEATURE_COLS]


def decide_from_features(feats: pd.DataFrame) -> pd.Series:
    """The langid decision layer alone, over a ``langid_feature_frame``:
    min-chars gate → script-threshold cascade in tier order → integer-
    normalized marker argmax (first max wins = LATIN_ORDER tie-break).
    Matches ``detect_language`` exactly (differential-tested); the SQL
    oracle replays this same cascade in DuckDB."""
    n = len(feats)
    n_chars = feats["n_chars"].to_numpy(dtype=np.int64)
    out = np.full(n, "und", dtype=object)
    decided = n_chars < MIN_CHARS
    nonascii = ~feats["is_ascii"].to_numpy(dtype=bool)
    for lang in SCRIPT_PATTERNS:
        cnt = feats[f"{lang}_cnt"].to_numpy(dtype=np.int64)
        fire = (~decided) & nonascii & (
            cnt * SCRIPT_THRESHOLD_DEN >= n_chars * SCRIPT_THRESHOLD_NUM
        )
        out[fire] = lang
        decided |= fire
    scores = np.stack(
        [feats[f"{lang}_score"].to_numpy(dtype=np.int64)
         for lang in LATIN_ORDER]
    ) if n else np.zeros((len(LATIN_ORDER), 0), dtype=np.int64)
    norm = scores // np.maximum(n_chars, 1)
    best = np.argmax(norm, axis=0)
    best_score = norm[best, np.arange(n)]
    latin = (~decided) & (best_score > 0)
    out[latin] = np.array(LATIN_ORDER, dtype=object)[best[latin]]
    return pd.Series(out, index=feats.index, dtype=object)


def detect_language_naive(texts: pd.Series) -> pd.Series:
    """Original regex-scan formulation (4 script counts + 4 marker
    alternation counts over every row).  Kept as the differential-test
    reference for ``detect_language``."""
    t = texts.fillna("").str.slice(0, CAP_CHARS)
    n = len(t)
    n_chars = t.str.len().to_numpy(dtype=np.int64)

    out = np.full(n, "und", dtype=object)
    decided = n_chars < MIN_CHARS

    for lang, pat in SCRIPT_PATTERNS.items():
        cnt = t.str.count(pat).to_numpy(dtype=np.int64)
        fire = (~decided) & (
            cnt * SCRIPT_THRESHOLD_DEN >= n_chars * SCRIPT_THRESHOLD_NUM
        )
        out[fire] = lang
        decided |= fire

    scores = np.zeros((len(LATIN_ORDER), n), dtype=np.int64)
    for i, lang in enumerate(LATIN_ORDER):
        hits = t.str.count(LATIN_MARKERS[lang], flags=2)  # re.IGNORECASE
        scores[i] = hits.to_numpy(dtype=np.int64) * 1000
    norm = scores // np.maximum(n_chars, 1)
    best = np.argmax(norm, axis=0)
    best_score = norm[best, np.arange(n)]
    latin = (~decided) & (best_score > 0)
    out[latin] = np.array(LATIN_ORDER, dtype=object)[best[latin]]

    return pd.Series(out, index=texts.index, dtype=object)


def detect_language_fasttext(texts: pd.Series, model_path: str) -> pd.Series:
    """fastText language-ID (the north star's named engine), gated on the
    library being installed — it is NOT present in this container, so the
    vectorized n-gram heuristic (``detect_language``) is the default engine
    throughout the pipeline.  When fasttext + a lid model (e.g. lid.176.bin)
    are available, this returns the same ISO-639-1 shape so it can be swapped
    into the featurize stage behind the same interface."""
    try:
        import fasttext  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env constraint
        raise NotImplementedError(
            "fasttext is not installed in this container; "
            "detect_language (n-gram heuristic) is the default engine"
        ) from e
    model = fasttext.load_model(model_path)
    cleaned = [t.replace("\n", " ") for t in texts.fillna("")]
    labels, _scores = model.predict(cleaned)
    return pd.Series(
        [ls[0].replace("__label__", "") if ls else "und" for ls in labels],
        index=texts.index,
    )
