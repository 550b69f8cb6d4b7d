"""Text-analysis scalar functions for the training-data pipeline surface.

The reference's only text ops are the ``Title:``/``Content:`` split-parse
(reference src/index.ts:115-119) and the embedding feature extraction; the
rest of this module is the LLM-data-pipeline extension surface (language
ID heuristic, quality scoring, token counting, fingerprinting).  Every
function is a pure Column expression (JVM-side, codegen'd) and has an
exact DuckDB-SQL equivalent for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_title(body: Column | str) -> Column:
    """Extract <t> from "Title: <t> Content: <c>" (src/index.ts:115-119)."""
    return F.trim(F.regexp_extract(_as_col(body), r"Title:(.*?)Content:", 1))


def parse_content(body: Column | str) -> Column:
    return F.trim(F.regexp_extract(_as_col(body), r"Content:(.*)$", 1))


def token_count(text: Column | str) -> Column:
    """Whitespace token count; empty string counts 0."""
    t = F.trim(_as_col(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens (the unit for shingles/fingerprints)."""
    return F.split(F.trim(F.lower(_as_col(text))), r"\s+")


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
#: the split GPT-style BPE applies before merges.  Shared by Spark
#: (regexp_extract_all) and DuckDB (same regex dialect for this class).
BPE_SPLIT_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-style token count: letter runs + digit runs + punctuation
    marks (whitespace dropped).  A deterministic proxy for a real BPE
    vocabulary's pre-tokenization pass."""
    return F.size(F.regexp_extract_all(_as_col(text), F.lit(BPE_SPLIT_RE), F.lit(0)))


#: tiny stopword lists per language for the n-gram/lexicon language-ID
#: heuristic.  Deliberately small and deterministic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
}


def lang_id(text: Column | str) -> Column:
    """Lexicon-hit language ID: the language with the most marker-word hits,
    ties broken by language code order; no hits -> 'und'."""
    toks = word_tokens(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold in forward code order: strict > keeps the incumbent on a tie,
    # so the FIRST-processed (alphabetically earliest) code wins ties
    for code in sorted(_LANG_MARKERS):
        markers = _LANG_MARKERS[code]
        score = F.size(
            F.filter(toks, lambda t: t.isin(markers))  # noqa: B023
        )
        best_lang = F.when(score > best_score, F.lit(code)).otherwise(best_lang)
        best_score = F.when(score > best_score, score).otherwise(best_score)
    return best_lang


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: length factor, alpha
    ratio, and mean word length sanity — all closed-form so the oracle can
    reproduce it exactly."""
    t = _as_col(text)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    ntok = token_count(t).cast("double")
    len_factor = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    mean_wl = F.when(ntok > 0, alpha / ntok).otherwise(F.lit(0.0))
    wl_factor = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round((len_factor + alpha_ratio + wl_factor) / F.lit(3.0), 6)


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (a deterministic stand-in for a rolling-hash sketch; exact
    content-defined chunking lives in dedup.simhash/minhash)."""
    toks = F.array_sort(F.array_distinct(word_tokens(text)))
    return F.md5(F.array_join(toks, " "))


# ---- DuckDB oracle SQL equivalents ---------------------------------------


def sql_bpe_token_count(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{BPE_SPLIT_RE}'))"


def sql_token_count(text: str) -> str:
    return (
        f"CASE WHEN trim({text}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text}), '\\s+')) END"
    )


def sql_word_tokens(text: str) -> str:
    return f"regexp_split_to_array(trim(lower({text})), '\\s+')"


def sql_lang_id(text: str) -> str:
    toks = sql_word_tokens(text)
    exprs = []
    for code in _LANG_MARKERS:
        markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[code])
        exprs.append(
            (code, f"len(list_filter({toks}, t -> t IN ({markers})))")
        )
    # same fold as lang_id: forward order, strict > keeps the incumbent on
    # a tie -> earliest code wins
    lang, score = "'und'", "0"
    for code, s in sorted(exprs):
        lang = f"CASE WHEN {s} > {score} THEN '{code}' ELSE {lang} END"
        score = f"CASE WHEN {s} > {score} THEN {s} ELSE {score} END"
    return lang


def sql_quality_score(text: str) -> str:
    n = f"CAST(length({text}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace({text}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    ntok = f"CAST({sql_token_count(text)} AS DOUBLE)"
    len_factor = f"least({n} / 500.0, 1.0)"
    alpha_ratio = f"CASE WHEN {n} > 0 THEN {alpha} / {n} ELSE 0.0 END"
    mean_wl = f"CASE WHEN {ntok} > 0 THEN {alpha} / {ntok} ELSE 0.0 END"
    wl_factor = f"CASE WHEN {mean_wl} >= 3 AND {mean_wl} <= 10 THEN 1.0 ELSE 0.5 END"
    return f"round(({len_factor} + {alpha_ratio} + {wl_factor}) / 3.0, 6)"


def sql_fingerprint(text: str) -> str:
    toks = sql_word_tokens(text)
    return f"md5(array_to_string(list_sort(list_distinct({toks})), ' '))"
