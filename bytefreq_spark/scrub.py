"""Deterministic regex PII/toxicity scrubber.

An ordered, frozen rule table (order matters and is part of the contract —
SURVEY.md §7.5 risk 1).  Applied with the *Python* ``re`` engine via pandas
``str.replace`` in both the distributed pandas-UDF stage and the single-node
reference implementation, so scrubbed text is byte-identical by construction
(no Java-vs-Python regex semantic drift).

Ancestry: the reference's encoding-repair pre-pass (win1252_to_utf8.sed — an
ordered byte-rewrite table applied before profiling) is the same shape:
ordered deterministic stream rewrites.  Cited in SURVEY.md K2.
"""

from __future__ import annotations

import re

import pandas as pd

# (name, compiled pattern, replacement) — applied strictly in this order.
SCRUB_RULES: list[tuple[str, re.Pattern, str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    # 16-digit cards, optionally 4x4 grouped, before generic phone matching
    ("card", re.compile(r"\b(?:\d[ -]?){15}\d\b"), "<CARD>"),
    ("ipv4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
    ("phone", re.compile(r"(?<![\w./-])\+?\d[\d ()./-]{7,}\d(?![\w-])"), "<PHONE>"),
    ("uk_postcode", re.compile(r"\b[A-Z][A-HJ-Y]?\d[A-Z\d]? ?\d[A-Z]{2}\b"), "<POSTCODE>"),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "<SSN>"),
    # toxicity word list (small, fixed; word-bounded, case-insensitive)
    ("toxicity", re.compile(r"\b(?:dumbass|jackass|dipshit|bullshit)\b", re.IGNORECASE), "<TOX>"),
]


def scrub_series(texts: pd.Series) -> pd.Series:
    """Apply the frozen rule table in order. NaN-safe, byte-deterministic."""
    out = texts.fillna("")
    for _name, pat, rep in SCRUB_RULES:
        out = out.str.replace(pat, rep, regex=True)
    return out


def scrub_flags(texts: pd.Series) -> pd.DataFrame:
    """Per-rule hit counts (for metrics / drop reasons)."""
    t = texts.fillna("")
    return pd.DataFrame(
        {name: t.str.count(pat) for name, pat, _ in SCRUB_RULES},
        index=texts.index,
    )
