"""KenLM-style character n-gram perplexity, vectorized with numpy.

A character-bigram language model with add-one smoothing, trained at import
time on a small embedded seed corpus (deterministic — no I/O, no randomness).
Scoring is fully vectorized: the whole Arrow batch is joined into one
codepoint array, per-pair log-probs are gathered from the 129×129 table, and
per-row means come from ``np.add.reduceat`` over row offsets — zero per-row
Python.

Perplexity = exp(−mean log₂... we use natural log: exp(−mean ln p)).  Gibberish
(uniform byte soup) scores ≫ natural language; the quality filter thresholds
on this.  The model is shipped to executors by closure capture of the table
(a 129×129 float64 array, ~133 KB — broadcast-friendly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Embedded seed corpus: plain public-domain-style English prose written for
# this project. Enough to separate language from noise; NOT a quality LM.
_SEED_CORPUS = """
the quick brown fox jumps over the lazy dog and runs across the open field
data processing at scale requires careful attention to partitioning and order
the history of science is the history of careful measurement and honest doubt
please let me know if you have any questions about the report attached below
in the morning the sun rose over the hills and the valley filled with light
a distributed system is one in which the failure of a computer you did not
know existed can render your own computer unusable said leslie lamport once
we hold these truths to be self evident that all men are created equal and
it was the best of times it was the worst of times it was the age of wisdom
call me ishmael some years ago never mind how long precisely having little
money in my purse and nothing particular to interest me on shore i thought
the customer asked whether the order had shipped and the agent replied that
the package would arrive within three business days barring customs delays
thank you for contacting support how can i help you today is there anything
else i can do for you have a wonderful rest of your day and take care now
""".strip()

_VOCAB = 128  # ASCII; everything else buckets to index 128
_DIM = _VOCAB + 1


def _train_table(corpus: str) -> np.ndarray:
    codes = np.frombuffer(corpus.lower().encode("utf-32-le"), dtype=np.uint32)
    codes = np.minimum(codes, _VOCAB).astype(np.int64)
    counts = np.ones((_DIM, _DIM), dtype=np.float64)  # add-one smoothing
    np.add.at(counts, (codes[:-1], codes[1:]), 1.0)
    probs = counts / counts.sum(axis=1, keepdims=True)
    return np.log(probs)


_LOGP = _train_table(_SEED_CORPUS)


CAP_CHARS = 4096  # perplexity from a prefix; bounds cost on huge turns


def perplexity(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[float64] char-bigram perplexity (vectorized).

    Only the first CAP_CHARS characters are scored (frozen contract shared
    with the reference pipeline)."""
    t = texts.fillna("").str.slice(0, CAP_CHARS).str.lower()
    lengths = t.str.len().to_numpy(dtype=np.int64)
    joined = "".join(t.tolist())
    if len(joined) == 0:
        return pd.Series(np.zeros(len(t)), index=texts.index)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    codes = np.minimum(codes, _VOCAB).astype(np.int64)

    pair_lp = np.zeros(max(len(codes) - 1, 0), dtype=np.float64)
    if len(codes) > 1:
        pair_lp = _LOGP[codes[:-1], codes[1:]]

    # row boundaries in the joined array
    ends = np.cumsum(lengths)
    starts = ends - lengths
    # zero out pairs that straddle row boundaries (pair i = codes[i],codes[i+1])
    boundary = ends[:-1] - 1  # last pair-index inside each row except final row
    valid = np.ones_like(pair_lp, dtype=bool)
    b = boundary[(boundary >= 0) & (boundary < len(pair_lp))]
    valid[b] = False

    lp = np.where(valid, pair_lp, 0.0)
    # per-row sum over pair indices [starts[i], ends[i]-1)
    n_pairs = np.maximum(lengths - 1, 0)
    sums = np.zeros(len(t), dtype=np.float64)
    nonzero = n_pairs > 0
    if nonzero.any():
        idx = starts[nonzero]
        # reduceat needs monotonically increasing cut points within range
        cuts = np.clip(idx, 0, max(len(lp) - 1, 0))
        seg = np.add.reduceat(lp, cuts) if len(lp) else np.zeros(len(cuts))
        # reduceat sums to the next cut; rows are contiguous so segment ==
        # row-pairs plus the zeroed straddle pair — correct by construction
        sums[nonzero] = seg
    mean_lp = np.where(n_pairs > 0, sums / np.maximum(n_pairs, 1), 0.0)
    ppl = np.where(n_pairs > 0, np.exp(-mean_lp), 0.0)
    return pd.Series(ppl, index=texts.index)
