"""Text analysis for the document/page corpus: quality scoring, language
ID, token counting, fingerprinting.  All pure column expressions (regex +
array ops, JVM-side); oracle-parity via shared regex/md5 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text_col: str):
    """BPE-ish tokenization: alpha runs, digit runs, single punctuation.
    Built with Column args (not an expr string) so the backslash class
    survives SQL string-literal unescaping."""
    return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))


def ws_tokens_col(text_col: str):
    return F.split(F.trim(F.col(text_col)), "\\s+")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_q, n_tokens, n_ws_tokens, stop_hits, punct_ratio,
    quality_score — length/punct/stopword heuristics, integer-valued
    numerators so ratios round identically everywhere."""
    toks = tokens_col(text_col)
    ws = ws_tokens_col(text_col)
    stop_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(ws, lambda t: F.array_contains(stop_list, t)))
    n_punct = F.size(F.filter(toks, lambda t: t.rlike("^[^A-Za-z0-9]$")))
    n_tokens = F.size(toks)
    return (
        df.withColumn("n_chars_q", F.length(text_col).cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_ws_tokens", F.size(ws).cast("long"))
        .withColumn("stop_hits", stop_hits.cast("long"))
        .withColumn("punct_ratio", F.round(n_punct.cast("double") / n_tokens, 6))
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.lit(1.0), F.col("n_ws_tokens") / F.lit(50.0)) * 0.5
                + F.least(F.lit(1.0), F.col("stop_hits") / F.lit(5.0)) * 0.3
                + (F.lit(1.0) - F.least(F.lit(1.0), F.col("punct_ratio") * 5.0)) * 0.2,
                6,
            ),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language, argmax with
    a fixed priority order (en > de > fr > unknown)."""
    ws = ws_tokens_col(text_col)
    hits = {}
    for lang, words in STOPWORDS.items():
        lst = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(ws, lambda t: F.array_contains(lst, t))).cast("long")
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", hits[lang])
    pred = (
        F.when((F.col("hits_en") >= F.col("hits_de")) & (F.col("hits_en") >= F.col("hits_fr"))
               & (F.col("hits_en") > 0), F.lit("en"))
        .when((F.col("hits_de") >= F.col("hits_fr")) & (F.col("hits_de") > 0), F.lit("de"))
        .when(F.col("hits_fr") > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return out.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized document fingerprint: md5 of lowercased,
    whitespace-collapsed text (rolling-hash stand-in, oracle-safe)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# winnowing parameters shared with the DuckDB oracle
WINNOW_BASE = 257
WINNOW_MOD = 2_147_483_647


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme, Schleimer/
    Wilkerson/Aiken 2003): a polynomial ROLLING hash over character
    k-grams (H_i = sum code[i+j]*B^(k-1-j) mod M), then the minimum hash
    of every w-window of consecutive hashes; the distinct window-mins are
    the document's fingerprint set (guaranteed to share a fingerprint
    with any document containing a common substring of length k+w-1).
    Pure array expressions — JVM, no Python.  Output: (id, fp) rows."""
    pows = [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)]
    codes = (f"transform(sequence(1, length({text_col})),"
             f" i -> ascii(substring({text_col}, i, 1)))")
    terms = " + ".join(
        f"element_at(_c, i + {j}) * {p}L" for j, p in enumerate(pows))
    hashes = (f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
              f" i -> ({terms}) % {WINNOW_MOD})")
    mins = (f"transform(sequence(1, greatest(size(_h) - {w - 1}, 1)),"
            f" i -> array_min(slice(_h, i, {w})))")
    return (
        df.select(F.col(id_col), F.col(text_col), F.expr(codes).alias("_c"))
        .withColumn("_h", F.expr(hashes))
        .select(id_col, F.explode(F.array_distinct(F.expr(mins))).alias("fp"))
    )
