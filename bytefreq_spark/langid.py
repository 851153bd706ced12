"""Vectorized language identification (fastText-style linear scoring, made
deterministic and SQL-free).

Two-tier classifier over a pandas Series of texts (no per-row Python — all
operations are C-level pandas/numpy):

1. **Script tier**: character-class ratios (CJK / Cyrillic / Greek /
   Devanagari) computed with vectorized regex counts → zh / ru / el / hi.
2. **Latin tier**: per-language marker-token hit rates (regex word classes,
   the high-weight features a fastText supervised model learns for closely
   related Latin languages) → argmax with a fixed deterministic tie-break.

Returns ISO-639-1 codes; ``und`` for empty/non-linguistic text.

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

# Marker-token regexes per Latin language: function words a supervised
# linear model would weight highest.  Word-bounded, case-insensitive.
LATIN_MARKERS = {
    "en": r"\b(?:the|and|of|to|is|you|that|it|with|for|this|are|was|have|not|be)\b",
    "fr": r"\b(?:le|la|les|de|des|et|est|une?|que|qui|dans|pour|pas|vous|je|avec|sur)\b",
    "de": r"\b(?:der|die|das|und|ist|nicht|ein|eine|ich|sie|mit|auf|für|den|von|zu)\b",
    "es": r"\b(?:el|la|los|las|de|y|es|en|que|una?|por|para|con|no|se|su|del)\b",
}
LATIN_ORDER = ["en", "fr", "de", "es"]  # deterministic tie-break order

MIN_CHARS = 3  # below this → und
CAP_CHARS = 2048  # language is decidable from a prefix; bounds cost on huge turns


def detect_language(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[str] of language codes. Fully vectorized.

    Only the first CAP_CHARS characters are examined (frozen contract shared
    with the reference pipeline)."""
    t = texts.fillna("").str.slice(0, CAP_CHARS)
    n = len(t)
    n_chars = t.str.len().to_numpy(dtype=np.int64)

    out = np.full(n, "und", dtype=object)
    decided = n_chars < MIN_CHARS

    # Script tier — first script over threshold wins, in fixed order
    for lang, pat in SCRIPT_PATTERNS.items():
        cnt = t.str.count(pat).to_numpy(dtype=np.int64)
        fire = (~decided) & (
            cnt * SCRIPT_THRESHOLD_DEN >= n_chars * SCRIPT_THRESHOLD_NUM
        )
        out[fire] = lang
        decided |= fire

    # Latin tier — marker hits per 1k chars, argmax (integer scores)
    scores = np.zeros((len(LATIN_ORDER), n), dtype=np.int64)
    for i, lang in enumerate(LATIN_ORDER):
        hits = t.str.count(LATIN_MARKERS[lang], flags=2)  # re.IGNORECASE
        # scale by 1000 and normalize by length → integer comparable score
        scores[i] = hits.to_numpy(dtype=np.int64) * 1000
    denom = np.maximum(n_chars, 1)
    norm = scores // denom  # integer division: deterministic
    best = np.argmax(norm, axis=0)  # first max wins → LATIN_ORDER tie-break
    best_score = norm[best, np.arange(n)]
    latin = (~decided) & (best_score > 0)
    out[latin] = np.array(LATIN_ORDER, dtype=object)[best[latin]]

    # texts with letters but no markers: keep 'und'
    return pd.Series(out, index=texts.index, dtype=object)
