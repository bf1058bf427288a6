"""Deterministic sampling: reproducibility under repartitioning (the
property `df.sample()` lacks), disjoint train/holdout windows, per-stratum
fractions, and the shuffle-free plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    deterministic_sample,
    sample_bucket,
    sample_n_per_stratum,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _ids(df):
    return {r[0] for r in df.select("doc_id").collect()}


def test_sample_stable_under_repartition(spark):
    docs = spark.read.parquet(DOCS)
    s1 = _ids(deterministic_sample(docs, 0.3, "doc_id", salt="x"))
    s2 = _ids(deterministic_sample(docs.repartition(17), 0.3, "doc_id", salt="x"))
    assert s1 == s2 and len(s1) > 0
    # native sample() does NOT survive repartitioning — the motivating gap
    n1 = _ids(docs.sample(0.3, seed=1))
    n2 = _ids(docs.repartition(17).sample(0.3, seed=1))
    assert n1 != n2


def test_fraction_accuracy_and_disjoint_splits(spark):
    docs = spark.read.parquet(DOCS)
    n = docs.count()
    kept = deterministic_sample(docs, 0.5, "doc_id").count()
    assert abs(kept / n - 0.5) < 0.08  # md5 uniformity at 500 rows
    # train = bucket < 0.9M, holdout = the complement window: disjoint, total
    train = _ids(deterministic_sample(docs, 0.9, "doc_id", salt="sp"))
    hold = _ids(
        docs.filter(
            sample_bucket(F.col("doc_id"), "sp") >= int(0.9 * SAMPLE_BUCKETS)
        )
    )
    assert train.isdisjoint(hold)
    assert len(train) + len(hold) == n
    # a different salt draws an independent sample
    other = _ids(deterministic_sample(docs, 0.9, "doc_id", salt="sp2"))
    assert other != train


def test_stratified_fractions(spark):
    docs = spark.read.parquet(DOCS)
    out = stratified_sample(
        docs, "lang", {"en": 0.0, "fr": 1.0}, "doc_id", default_fraction=0.5
    )
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in by_lang
    assert by_lang["fr"] == totals["fr"]
    assert 0 < by_lang["de"] < totals["de"]


def test_sample_n_per_stratum_exact_and_plan(spark):
    docs = spark.read.parquet(DOCS)
    out = sample_n_per_stratum(docs, "lang", 40, "doc_id")
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {k: min(40, v) for k, v in totals.items()}
    # rank-filter must plan as WindowGroupLimit (per-partition top-n pushed
    # below the exchange), and the fraction filters must plan NO exchange
    assert "WindowGroupLimit" in out._jdf.queryExecution().executedPlan().toString()
    frac_plan = (
        deterministic_sample(docs, 0.3, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in frac_plan


def test_token_budget_sample_laws(spark):
    from pyspark.sql import Window

    from exposure_notifications_private_analytics_ingestion_spark.operators.sampling import (
        mixture_summary,
        token_budget_sample,
    )

    docs = spark.read.parquet(DOCS)
    budgets = {"en": 6000, "de": 1200, "fr": 2500}
    out = token_budget_sample(docs, budgets, n_slices=64)

    # two-level prefix sum == the naive single-window running sum
    naive = (
        docs.select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            sample_bucket(F.col("doc_id")).alias("hb"),
        )
        .withColumn(
            "tok_start",
            F.coalesce(
                F.sum("n_tokens").over(
                    Window.partitionBy("lang")
                    .orderBy("hb", "doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .filter(F.col("tok_start") < F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv]
        )[F.col("lang")])
        .select("doc_id", "lang", "n_tokens", "tok_start")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, naive.collect()))

    # default budget 0 excludes unlisted strata entirely
    assert out.filter(~F.col("lang").isin(*budgets)).count() == 0

    # membership is stable under repartitioning
    again = token_budget_sample(docs.repartition(23), budgets, n_slices=64)
    assert _ids(out) == _ids(again)

    # budgets are covered: tokens_kept >= budget unless the stratum ran dry,
    # and overshoot is bounded by one document
    summ = {r["lang"]: r for r in mixture_summary(out, budgets).collect()}
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    max_doc = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang")
        .agg(F.max(F.size(F.split("text", " "))).alias("m"))
        .collect()
    }
    for lang, b in budgets.items():
        row = summ[lang]
        if totals[lang] >= b:
            assert b <= row["tokens_kept"] < b + max_doc[lang]
        else:
            assert row["tokens_kept"] == totals[lang]

    # growing one budget only ever ADDS documents (stable mix growth)
    bigger = dict(budgets, en=12000)
    grown = token_budget_sample(docs, bigger, n_slices=64)
    assert _ids(out) <= _ids(grown)
