"""Text analysis for training-data pipelines — language-ID, quality
scoring, token counting, fingerprinting.

All hot-path functions are pure Column expressions (JVM, codegen —
no Python).  Each has an ANSI-SQL twin in queries.py so the DuckDB
oracle verifies them at gate scale; the formulas are written in the
same operation order in both engines so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- tokenizing

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols — the
# standard GPT-2-style split shape, counted JVM-side.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_RE))


# ---------------------------------------------------------------- quality


def quality_components(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratios — the classic
    cheap quality heuristics (C4/Gopher-style)."""
    n_chars = F.length(text)
    words = ws_token_count(text)
    stop_hits = F.regexp_count(
        F.lower(text),
        F.lit(r"\b(the|a|an|of|to|and|in|is|it|that|for|on|with|as)\b"),
    )
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    digits = F.regexp_count(text, F.lit(r"[0-9]"))
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_w = F.greatest(words, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_words": words,
        "avg_word_len": F.round(n_chars / denom_w, 4),
        "stopword_ratio": F.round(stop_hits / denom_w, 4),
        "punct_ratio": F.round(punct / denom_c, 4),
        "digit_ratio": F.round(digits / denom_c, 4),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score: rewards mid-length docs with sane word
    shape and some stopwords; penalizes punctuation/digit soup."""
    c = quality_components(text)
    len_term = F.least(c["n_words"].cast("double") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(c["stopword_ratio"] * F.lit(4.0), F.lit(1.0))
    shape_term = F.when(
        (c["avg_word_len"] >= 3) & (c["avg_word_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    noise_pen = F.least(
        c["punct_ratio"] * F.lit(2.0) + c["digit_ratio"] * F.lit(2.0), F.lit(1.0)
    )
    return F.round(
        (len_term + stop_term + shape_term) / F.lit(3.0) * (F.lit(1.0) - noise_pen),
        4,
    )


# ---------------------------------------------------------------- lang id

# Marker-word lists per language (n-gram/stopword heuristic).  At 100 TB
# this stays a codegen'd regexp_count per language — no model, no UDF.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|that|with|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans)\b",
    "es": r"\b(el|los|las|es|una|por|para|como)\b",
}


def lang_scores(text: Column) -> dict[str, Column]:
    lower = F.lower(text)
    scores = {
        lang: F.regexp_count(lower, F.lit(pat)) for lang, pat in LANG_MARKERS.items()
    }
    # CJK: any han/kana/hangul codepoint is near-decisive
    scores["zh"] = F.regexp_count(text, F.lit(r"[一-鿿]")) * F.lit(3)
    return scores


LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def lang_id(text: Column) -> Column:
    """argmax over marker hits via struct-ordered greatest (score desc,
    then fixed language priority for deterministic ties); 'und' when
    nothing scores."""
    scores = lang_scores(text)
    structs = [
        F.struct(
            scores[lang].alias("s"), F.lit(-i).alias("p"), F.lit(lang).alias("l")
        )
        for i, lang in enumerate(LANG_ORDER)
    ]
    best = F.greatest(*structs)
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("und"))


# ------------------------------------------------------------ fingerprint


def normalize_text(text: Column) -> Column:
    """Canonical form for exact-dup detection: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint = md5 of the normalized text (md5 chosen so
    the DuckDB oracle can reproduce it byte-for-byte)."""
    return F.md5(normalize_text(text))


# -------------------------------------------------------------- redaction

# PII scrubbing rules for training corpora, applied in this order
# (emails first — their digits must not fall through to the
# number-run rule).  Patterns stay inside the regex subset RE2 and
# Java share (no lookaround, no backrefs), so the DuckDB oracle runs
# the IDENTICAL patterns; replacement is whole-match → tag.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    (r"[0-9]{8,}", "[NUM]"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4 addresses / long digit
    runs with type tags — a chain of JVM regexp_replace Columns (one
    codegen'd projection, no Python).  At corpus scale this is a
    map-only pass: no shuffle, fully pushdown-compatible."""
    out = text
    for pat, tag in PII_RULES:
        out = F.regexp_replace(out, pat, tag)
    return out


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    comps = quality_components(t)
    return df.withColumns(
        {
            "ws_tokens": ws_token_count(t),
            "bpe_tokens": bpe_ish_token_count(t),
            **{k: v for k, v in comps.items() if k != "n_chars"},
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )
