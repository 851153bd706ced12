"""Single-node reference implementation of the quality-filter pipeline.

This IS the "reference label set" for the F1 ≥ 0.99 / byte-identical-scrub
targets (BASELINE.md): plain pandas, one process, no Spark — sharing the same
vectorized kernels (masks, langid, perplexity, quality, scrub) the distributed
pipeline uses inside its pandas-UDF stages.  The pytest contract holds the
distributed run to this output; what it proves is that the *distributed
machinery* (shuffled mask-frequency aggregation, broadcast join, skew-safe
prev-turn join, partitioned ordering) introduces no drift.
"""

from __future__ import annotations

import pandas as pd

from .langid import detect_language
from .perplexity import perplexity
from .quality import decide, text_features
from .scrub import scrub_series


def run_reference(transcripts: pd.DataFrame) -> pd.DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) → labeled frame with
    (…, lang, ppl, lu_count, lu_total, is_dup, keep, drop_reason,
    scrubbed_text), ordered by (conv_id, turn_idx)."""
    df = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    feats = text_features(df["text"])
    lang = detect_language(df["text"])
    ppl = perplexity(df["text"])

    # corpus-wide mask-frequency dictionary (A1, single-node analogue)
    freq = feats["lu_key"].value_counts()
    lu_count = feats["lu_key"].map(freq).astype("int64")
    lu_total = pd.Series(len(df), index=df.index, dtype="int64")

    prev = df.groupby("conv_id")["text"].shift(1)
    is_dup = prev.notna() & (prev == df["text"]) & (df["text"].fillna("") != "")

    dec = decide(
        lang, ppl, feats["n_chars"], feats["digit_count"], feats["weird_count"],
        feats["mask_entropy"], lu_count, lu_total, is_dup, df["role"],
    )

    out = df.copy()
    out["lang"] = lang
    out["ppl"] = ppl
    out["n_chars"] = feats["n_chars"]
    out["lu_key"] = feats["lu_key"]
    out["lu_count"] = lu_count
    out["lu_total"] = lu_total
    out["is_dup"] = is_dup
    out["keep"] = dec["keep"]
    out["drop_reason"] = dec["drop_reason"]
    out["scrubbed_text"] = scrub_series(df["text"])
    return out
