"""Custom stateful streaming operator: cross-batch duplicate-turn detection.

The batch pipeline detects duplicates with a lag window; a stream can't —
consecutive turns of one conversation may arrive in different micro-batches.
This operator keeps per-conversation state (last turn_idx + last text digest)
in the state store via ``applyInPandasWithState`` (the custom-stateful-
operator surface named in the task brief), so a turn that byte-equals its
predecessor is flagged even across batch boundaries.

State is one tiny row per conversation (conv_id → (last_turn_idx,
last_digest)); at 10^12 turns the state store holds one entry per *live*
conversation and entries expire via the configured TTL (processing-time
timeout), which bounds state for the unbounded stream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, is_dup boolean"
)
STATE_SCHEMA = "last_turn_idx int, last_digest string"


def _digest(s: str) -> str:
    return hashlib.md5((s or "").encode("utf-8")).hexdigest()


def _dedup_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    (conv_id,) = key
    if state.hasTimedOut:
        # TTL expiry: evict and DON'T re-register, or state grows with total
        # distinct conversations instead of live ones.
        state.remove()
        return
    if state.exists:
        last_idx, last_digest = state.get
    else:
        last_idx, last_digest = -1, None

    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        digests = pdf["text"].map(_digest)
        prev = digests.shift(1)
        prev.iloc[0] = last_digest
        first_idx = int(pdf["turn_idx"].iloc[0]) if len(pdf) else -1
        is_dup = (digests == prev) & prev.notna() & (pdf["text"].fillna("") != "")
        # only a *consecutive* repeat counts; if the first row doesn't follow
        # the stored last_turn_idx directly, the carried state doesn't apply
        if len(pdf) and last_idx >= 0 and first_idx != last_idx + 1:
            is_dup.iloc[0] = False
        if len(pdf):
            last_idx = int(pdf["turn_idx"].iloc[-1])
            last_digest = digests.iloc[-1]
        yield pd.DataFrame({
            "conv_id": pdf["conv_id"],
            "turn_idx": pdf["turn_idx"],
            "role": pdf["role"],
            "text": pdf["text"],
            "is_dup": is_dup,
        })

    state.update((last_idx, last_digest))
    state.setTimeoutDuration(24 * 3600 * 1000)  # expire idle conversations


def stateful_dedup_stream(stream: DataFrame) -> DataFrame:
    """conv_id-keyed stateful dup flags over a transcript stream."""
    return (
        stream.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
