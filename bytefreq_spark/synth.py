"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema: (conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp) — BASELINE.json ``input_hint``.  Generation is a pure function
of (seed, conversation serial), so the corpus can be produced either
driver-side (pandas, for tests) or distributed (spark.range over conv serials
→ mapInPandas, for the bench at scale) with bit-identical results.

Conversation lengths are Zipf-ish so skew handling is exercised; texts are a
mixture engineered to hit every mask / rule / scrub / decision path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

_EN = ("the quick brown fox jumps over the lazy dog and it is a fine day to "
       "review the report with you for this project that we have not shipped").split()
_FR = ("le chat est sur la table et je ne sais pas pour quoi vous avez une "
       "question dans la maison avec des amis qui sont pas la").split()
_DE = ("der hund ist nicht in dem haus und ich habe eine frage mit der "
       "antwort von den leuten auf die sie nicht warten").split()
_ES = ("el perro está en la casa y no se por que usted tiene una pregunta "
       "para los amigos con el libro del maestro").split()
_ZH = list("数据质量分析引擎在大规模集群上运行每个会话的文本被打分")
# realistic han/kana mix — the r7 kana tier must label this ja, not zh
_JA = list("データの品質を分析するエンジンは大規模なクラスタで実行されます")
_RU = "данные качество анализ движок работает на большом кластере текст".split()
_EL = "τα δεδομένα ποιότητα ανάλυση μηχανή τρέχει σε μεγάλο σύμπλεγμα".split()
_HI = "डेटा गुणवत्ता विश्लेषण इंजन बड़े क्लस्टर पर चलता है".split()

_BOILER = [
    "Thank you for contacting support how can I help you today",
    "Is there anything else I can do for you today",
    "Please hold while I look into that for you",
]
_PII_TEMPLATES = [
    "you can reach me at {email} or on {phone}",
    "my card number is {card} and my postcode is {pc}",
    "server at {ip} logged user {email}",
    "call {phone} ref {pc}",
]
_TOOL_NAMES = ["search", "calculator", "browser", "sql", "code_exec"]

_KINDS = [
    ("en", 36), ("fr", 7), ("de", 7), ("es", 7), ("zh", 5), ("ru", 4),
    ("el", 3), ("hi", 3), ("boiler", 6), ("dup", 5), ("gibberish", 6),
    ("pii", 8), ("empty", 3), ("weird", 4), ("long", 2), ("digits", 3),
    ("toxic", 1),
]
_KIND_NAMES = [k for k, _ in _KINDS]
_KIND_P = np.array([w for _, w in _KINDS], dtype=np.float64)
_KIND_P /= _KIND_P.sum()

_WORDS = {"en": _EN, "fr": _FR, "de": _DE, "es": _ES, "zh": _ZH, "ja": _JA,
          "ru": _RU, "el": _EL, "hi": _HI}
# object-array views of the word pools: fancy-index the whole draw at once
# instead of a per-word Python listcomp (r8 — the longdocs corpus draws
# thousands of words per turn; values and rng consumption are identical)
_WORDS_ARR = {k: np.array(v, dtype=object) for k, v in _WORDS.items()}

# Opt-in kind distribution for a NON-ASCII-HEAVY corpus (the r7 multilingual
# bench row: ~45% of turns carry non-Latin scripts, so the non-ASCII scrub
# and langid script tiers get priced instead of hiding behind an
# ASCII-dominated mix).  The default _KINDS path is untouched — same rng
# draws, bit-identical corpora.
MULTILANG_KINDS = [
    ("en", 18), ("fr", 5), ("de", 5), ("es", 5), ("zh", 12), ("ja", 10),
    ("ru", 10), ("el", 7), ("hi", 7), ("boiler", 4), ("dup", 4),
    ("gibberish", 4), ("pii", 6), ("empty", 2), ("weird", 3), ("long", 2),
    ("digits", 2), ("toxic", 1),
]


def _sentence(rng: np.random.RandomState, lang: str, n: int) -> str:
    pool = _WORDS_ARR[lang]
    # same rng call (one randint of size n), same selected words — the
    # object-array gather + tolist just skips the per-word Python loop
    words = pool[rng.randint(0, len(pool), n)]
    sep = "" if lang in ("zh", "ja") else " "
    return sep.join(words.tolist())


def _gen_text(rng: np.random.RandomState, kind: str, prev: str) -> str:
    if kind in _WORDS:
        return _sentence(rng, kind, rng.randint(6, 40))
    if kind == "boiler":
        return _BOILER[rng.randint(0, len(_BOILER))]
    if kind == "dup":
        return prev if prev else _BOILER[0]
    if kind == "gibberish":
        chars = np.array(list("qxzjvkwfbghm1379!@#$%^&*~`|\\"), dtype=object)
        return "".join(chars[rng.randint(0, len(chars), rng.randint(30, 120))])
    if kind == "pii":
        t = _PII_TEMPLATES[rng.randint(0, len(_PII_TEMPLATES))]
        return t.format(
            email=f"user{rng.randint(1, 999)}@example{rng.randint(1, 99)}.com",
            phone=f"+{rng.randint(1, 99)} {rng.randint(100, 999)} {rng.randint(100000, 999999)}",
            card=" ".join(str(rng.randint(1000, 9999)) for _ in range(4)),
            pc=f"SW{rng.randint(1, 9)} {rng.randint(1, 9)}AA",
            ip=".".join(str(rng.randint(1, 254)) for _ in range(4)),
        )
    if kind == "empty":
        return ""
    if kind == "weird":
        weird = np.array(list("\x01\x02\x03\x7f€™£¥§¶†‡�"), dtype=object)
        return "".join(weird[rng.randint(0, len(weird), rng.randint(10, 40))])
    if kind == "long":
        return _sentence(rng, "en", 4000)
    if kind == "digits":
        # carries an English marker so it passes langid and reaches the
        # digit-fraction rule (rule order is a frozen contract)
        nums = " ".join(str(rng.randint(10 ** 8, 10 ** 9)) for _ in range(rng.randint(4, 12)))
        return f"the ids are {nums}"
    if kind == "toxic":
        return f"well that is just bullshit {_sentence(rng, 'en', 8)}"
    return ""


def gen_conversation(conv_serial: int, seed: int = SEED, skew_every: int = 997,
                     skew_len: int = 1500,
                     doc_words: tuple[int, int] | None = None,
                     kinds: list[tuple[str, int]] | None = None) -> pd.DataFrame:
    """All turns of one conversation — pure function of (seed, serial).

    ``doc_words=(lo, hi)`` switches to a LONG-DOCUMENT corpus shape: each
    non-empty/non-dup turn is padded with a lo..hi-word English tail
    (10-50 KB texts at (1700, 8500)) while keeping the original kind marker
    (PII template, language prefix, boilerplate, ...) at the front so scrub,
    langid and mask costs are exercised at long-text lengths.  ``kinds``
    swaps the turn-kind weight table (e.g. ``MULTILANG_KINDS`` for the
    non-ASCII-heavy bench corpus).  The default path draws the exact same
    rng sequence as before either flag existed."""
    if kinds is None:
        kind_names, kind_p = _KIND_NAMES, _KIND_P
    else:
        kind_names = [k for k, _ in kinds]
        kind_p = np.array([w for _, w in kinds], dtype=np.float64)
        kind_p = kind_p / kind_p.sum()
    # the exact computation RandomState.choice(n, p=p) performs — one
    # random_sample() searched against the normalized cdf — precomputed
    # once per conversation instead of rebuilt per TURN inside choice()
    # (r8: choice re-cumsums p on every call; measured 13.5× slower than
    # the searchsorted equivalent, with identical draws AND rng state —
    # pinned by test_gen_golden_hashes)
    kind_cdf = kind_p.cumsum()
    kind_cdf /= kind_cdf[-1]
    rng = np.random.RandomState((seed * 1_000_003 + conv_serial) % (2 ** 31))
    # Zipf-ish length; every `skew_every`-th conversation is a whale (skew!)
    if skew_every and conv_serial % skew_every == skew_every - 1:
        n_turns = skew_len
    else:
        n_turns = int(min(1 + rng.zipf(1.5), 120))
    conv_id = f"conv_{conv_serial:08d}"
    base_ts = np.datetime64("2025-01-01T00:00:00") + np.timedelta64(
        int(rng.randint(0, 180 * 24 * 3600)), "s"
    )
    rows = []
    prev = ""
    for t in range(n_turns):
        if t == 0 and rng.rand() < 0.1:
            role = "system"
        else:
            role = ["user", "assistant", "tool"][t % 3]
        kind = kind_names[kind_cdf.searchsorted(rng.random_sample(),
                                                side="right")]
        text = _gen_text(rng, kind, prev)
        if doc_words is not None and kind not in ("empty", "dup"):
            tail = _sentence(rng, "en", int(rng.randint(*doc_words)))
            text = (text + " " + tail).strip()
        prev = text
        tool = _TOOL_NAMES[rng.randint(0, len(_TOOL_NAMES))] if role == "tool" else None
        ts = base_ts + np.timedelta64(t * int(rng.randint(1, 90)), "s")
        rows.append((conv_id, t, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def gen_transcripts_pandas(n_convs: int, seed: int = SEED, **kw) -> pd.DataFrame:
    """Driver-side corpus (tests / reference pipeline input)."""
    parts = [gen_conversation(i, seed, **kw) for i in range(n_convs)]
    pdf = pd.concat(parts, ignore_index=True)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def gen_transcripts_spark(spark, n_convs: int, seed: int = SEED,
                          partitions: int | None = None, **kw):
    """Distributed corpus: spark.range(conv serials) → mapInPandas.
    Bit-identical to the pandas generator for the same (seed, n_convs)."""
    rng_kw = dict(kw)

    def gen(batches):
        for pdf in batches:
            for serial in pdf["id"]:
                out = gen_conversation(int(serial), seed, **rng_kw)
                yield out

    rng = spark.range(n_convs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
