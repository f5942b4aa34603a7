"""Text-analysis expression builders with exact DuckDB twins.

Every function returns a (Spark Column, SQL string) designed to agree
bit-for-bit across engines:

* token/word/punct counts via ``regexp_count`` (Spark, Java regex) and
  ``len(regexp_extract_all(...))`` (DuckDB, RE2) over patterns restricted to
  the regex subset both dialects treat identically (ASCII classes, literal
  unicode ranges, ``\\b`` word boundaries);
* ratios via guarded division of identical integer counts — identical
  doubles out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[A-Za-z]+"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
STOP_PATTERN = r"\b(" + "|".join(STOPWORDS) + r")\b"

# language marker patterns — ASCII stopword sets per language + CJK range.
CJK = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|was|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "es": r"\b(el|los|las|una|es|que|por)\b",
    "fr": r"\b(le|les|des|est|une|dans|pour)\b",
    "zh": CJK,
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic tie-break priority


def rx_count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def sql_rx_count(expr: str, pattern: str) -> str:
    # DuckDB single-quoted literals don't process backslashes — pattern goes
    # in verbatim (patterns here never contain single quotes).
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def langid_expr(col: Column) -> Column:
    """Argmax over marker-hit counts with fixed priority order; 'und' when
    no marker hits at all."""
    scores = {lang: rx_count(col, pat) for lang, pat in LANG_MARKERS.items()}
    all_zero = None
    for c in scores.values():
        all_zero = (c == 0) if all_zero is None else (all_zero & (c == 0))
    expr = F.lit("und")
    # build reversed CASE: earlier langs in LANG_ORDER win ties
    for lang in reversed(LANG_ORDER):
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            ge = scores[lang] >= scores[other]
            cond = ge if cond is None else (cond & ge)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def sql_langid(expr: str) -> str:
    s = {lang: sql_rx_count(expr, pat) for lang, pat in LANG_MARKERS.items()}
    zero = " AND ".join(f"{c} = 0" for c in s.values())
    cases = []
    for lang in LANG_ORDER:
        conds = " AND ".join(
            f"{s[lang]} >= {s[o]}" for o in LANG_ORDER if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    inner = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"CASE WHEN {zero} THEN 'und' ELSE {inner} END"


def _words_array(col: Column) -> Column:
    words = F.split(F.trim(F.lower(col)), r"\s+")
    return F.when(
        F.trim(col) == "", F.array().cast("array<string>")
    ).otherwise(words)


def _shingles_of_words(words: Column, n: int) -> Column:
    # guard BEFORE sequence(): Spark's sequence(1, 0) steps DOWN to [1, 0],
    # whose 0 then crashes slice() — rows with fewer than n words must
    # yield the empty array, not a descending index range
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return F.when(
        F.size(words) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    )


def word_shingles(col: Column, n: int) -> Column:
    """Array of word n-grams (lowercased, whitespace-tokenized). Empty array
    when there are fewer than n words.

    Hot-path note: Catalyst does NOT common-subexpression-eliminate inside
    higher-order-function lambdas, so the regex split underneath re-runs
    per produced gram when this single-Column form is used directly. Fine
    for row-bounded use; corpus-scale scans should go through
    :func:`exploded_word_shingles`, which materializes the word array once
    per row in its own projection (measured 14x on the span scan at sf0.1:
    29.2s -> 2.1s)."""
    return _shingles_of_words(_words_array(col), n)


def exploded_word_shingles(df, text_col: str, n: int, alias: str, carry=("doc_id",)):
    """``SELECT carry…, explode(word_shingles(text_col, n)) AS alias`` with
    the word array materialized ONCE per row in a separate projection —
    the two projects stay separate because CollapseProject refuses to
    inline non-cheap expressions referenced more than once, so the split
    runs once per document instead of once per gram."""
    w = df.select(*carry, _words_array(F.col(text_col)).alias("__w"))
    return w.select(
        *carry, F.explode(_shingles_of_words(F.col("__w"), n)).alias(alias)
    )


def sql_word_shingles(expr: str, n: int) -> str:
    """DuckDB twin of word_shingles as a list expression (scalar
    generate_series returns a list; list_transform maps indices to
    n-grams)."""
    words = f"regexp_split_to_array(trim(lower({expr})), '\\s+')"
    parts = " || ' ' || ".join(f"({words})[i + {j}]" for j in range(n))
    return (
        f"(CASE WHEN trim({expr}) = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform("
        f"generate_series(1, greatest(len({words}) - {n - 1}, 0)), "
        f"i -> {parts}"
        f") END)"
    )
