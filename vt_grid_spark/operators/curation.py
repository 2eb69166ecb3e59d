"""Corpus curation: deterministic stratified sampling + per-domain rollups.

The data-mixing step of a training pipeline: down/up-weight strata
(language, domain, quality band) by keeping each document iff a uniform
hash of its key falls under the stratum's rate.  Hash-threshold sampling
beats rand()-sampling at 100 TB because it is

  * deterministic — the same document set is selected on every run, on
    every executor, with no RNG state or seed plumbing (resume/backfill
    produce identical corpora);
  * cheap — one md5 per row, pure codegen, no shuffle: the sample is a
    FILTER, so it composes with pushdown and never materializes the
    rejected rows;
  * consistent across engines — the DuckDB oracle reproduces the exact
    document set (queries_text.stratified_sample_langs).

Rates arrive as a plain dict (strata are config-scale: languages,
quality bands).  For thousands of strata, join a broadcast rates table
against the stratum column instead — the filter shape is the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^15 = 2^60: the md5-prefix domain, giving a uniform fraction in [0, 1)
_HASH_DOMAIN = float(1 << 60)


def unit_fraction(key_col: str) -> Column:
    """Deterministic uniform [0, 1) per key: first 15 hex chars of md5 as
    an integer over 16^15 (same construction as the kmvDistinct sketch
    hashes; DuckDB twin: ('0x' || substr(md5(k),1,15))::BIGINT)."""
    v = F.expr(f"cast(conv(substring(md5({key_col}), 1, 15), 16, 10) as bigint)")
    return v.cast("double") / F.lit(_HASH_DOMAIN)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", key_col: str = "url",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff unit_fraction(key) < rate(stratum).  Missing
    strata fall back to default_rate (0.0 = drop, 1.0 = keep all)."""
    rate = None
    for k, r in sorted(rates.items()):
        cond = F.col(stratum_col) == F.lit(k)
        rate = F.when(cond, F.lit(float(r))) if rate is None \
            else rate.when(cond, F.lit(float(r)))
    rate = F.lit(float(default_rate)) if rate is None \
        else rate.otherwise(F.lit(float(default_rate)))
    return df.where(unit_fraction(key_col) < rate)


def with_domain(df: DataFrame, url_col: str = "url",
                out: str = "domain") -> DataFrame:
    """Registrable host extraction: scheme://HOST/... -> HOST (JVM regexp,
    empty string when the url has no authority component)."""
    host = F.regexp_extract(F.col(url_col),
                            r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/]+)", 1)
    return df.withColumn(out, host)


def domain_stats(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-domain corpus rollup (the Common-Crawl curation staple): doc
    count, distinct languages, total chars.  One hash aggregation on the
    extracted host — domains are a natural mid-cardinality key (~10^7 at
    web scale), far below doc count, so the agg output is small and
    map-side partials absorb per-domain skew."""
    d = with_domain(docs, url_col)
    return (d.groupBy("domain")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum(F.length(text_col)).alias("sum_chars")))
