"""Curation operators: hash-threshold stratified sampling must be
deterministic, rate-accurate, and a pure filter (no shuffle)."""

from pyspark.sql import functions as F

from vt_grid_spark.operators.curation import (domain_stats, stratified_sample,
                                              with_domain)
from vt_grid_spark.sources import pages

RATES = {"en": 1.0, "de": 0.5, "fr": 0.25}


def test_sample_deterministic_and_rate_accurate(spark):
    docs = pages.pages_df(spark, 20000)
    a = stratified_sample(docs, RATES, default_rate=0.0)
    got = {r.url for r in a.select("url").collect()}
    again = {r.url for r in
             stratified_sample(docs, RATES, default_rate=0.0)
             .select("url").collect()}
    assert got == again  # no RNG anywhere

    by_lang = {r.lang: r.n for r in
               a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(by_lang) == set(RATES)  # default 0.0 drops other strata
    for lang, rate in RATES.items():
        n_stratum = 2000  # 20000 docs / 10 langs
        frac = by_lang.get(lang, 0) / n_stratum
        # binomial 4-sigma band around the rate
        sigma = (rate * (1 - rate) / n_stratum) ** 0.5
        assert abs(frac - rate) <= max(4 * sigma, 0.005), (lang, frac, rate)
    # en at rate 1.0 keeps the whole stratum exactly
    assert by_lang["en"] == 2000


def test_sample_is_subset_property(spark):
    """Lowering a stratum's rate yields a SUBSET of the higher-rate sample
    (threshold monotonicity) — the property that makes hash sampling safe
    for reproducible corpus scaling studies."""
    docs = pages.pages_df(spark, 10000)
    big = {r.url for r in stratified_sample(docs, {"de": 0.6}).select("url").collect()}
    small = {r.url for r in stratified_sample(docs, {"de": 0.3}).select("url").collect()}
    assert small < big


def test_domain_extraction_and_stats(spark):
    docs = pages.pages_df(spark, 5000)
    d = with_domain(docs)
    hosts = {r.domain for r in d.select("domain").distinct().collect()}
    assert len(hosts) == 1000 and all(h.endswith(".example") for h in hosts)
    stats = domain_stats(docs)
    row = stats.agg(F.sum("n_docs")).collect()[0]
    assert row[0] == 5000  # partition of the corpus
    # url without an authority -> empty domain, not a crash
    odd = spark.createDataFrame([("mailto:x@y", "t", "en")],
                                "url string, text string, lang string")
    assert with_domain(odd).collect()[0].domain == ""


def test_sample_plan_is_pure_filter(spark):
    from tests.test_physical_plans import plan_str

    docs = pages.pages_df(spark, 1000)
    p = plan_str(stratified_sample(docs, RATES), "simple")
    assert "Exchange" not in p and "EvalPython" not in p
