"""Stop-trigram cap (``max_df``) on the fuzzy trigram join — VERDICT r4 #4.

A web-scale corpus with an adversarially common vocabulary ("corporation",
"holdings" in every name) still generates the full candidate set through the
plain prefix filter when records are short enough that hot trigrams reach
the prefixes. ``max_df`` drops those trigrams from candidate generation
only; this suite plants such a corpus and pins:

- recall: every planted near-duplicate pair survives at the chosen cap,
  with byte-identical (ids, jaccard) output vs the uncapped path;
- pruning: the candidate count genuinely shrinks.
"""

from __future__ import annotations

import pytest

from exposure_notifications_private_analytics_ingestion_spark.operators.fuzzy_join import (
    candidate_pairs,
    fuzzy_match,
)

BOILER = "corporation holdings"  # shared by every record on both sides


@pytest.fixture(scope="module")
def hot_tables(spark):
    # 40 left records, 40 right records. right i is a near-dup of left i
    # (one char edit in the rare core); cores are distinct per i, the
    # boilerplate is identical everywhere — its trigrams have df ~80 while
    # core trigrams have df ~2.
    lrows = [(i, f"acme-{i:03d}x {BOILER}") for i in range(40)]
    rrows = [(i, f"acme-{i:03d}y {BOILER}") for i in range(40)]
    left = spark.createDataFrame(lrows, ["lid", "lname"])
    right = spark.createDataFrame(rrows, ["rid", "rname"])
    return left, right


def _matches(df):
    return {(r["lid"], r["match_rid"], r["jaccard"]) for r in df.collect()}


def test_max_df_preserves_planted_recall(hot_tables):
    left, right = hot_tables
    base = fuzzy_match(left, right, "lid", "lname", "rid", "rname",
                       threshold=0.5)
    capped = fuzzy_match(left, right, "lid", "lname", "rid", "rname",
                         threshold=0.5, max_df=10)
    mb, mc = _matches(base), _matches(capped)
    assert mb == mc  # identical pairs AND identical exact jaccard values
    # and the planted diagonal is actually in there
    matched = {(lid, rid) for lid, rid, _ in mc}
    assert all((i, i) in matched for i in range(40))


def test_max_df_shrinks_candidates_on_hot_vocabulary(hot_tables):
    left, right = hot_tables
    n_plain = candidate_pairs(left, right, "lid", "lname", "rid", "rname",
                              threshold=0.5).count()
    n_capped = candidate_pairs(left, right, "lid", "lname", "rid", "rname",
                               threshold=0.5, max_df=10).count()
    # hot trigrams in the prefixes make every left×right pair a candidate;
    # the cap leaves (near-)diagonal candidates only
    assert n_plain == 40 * 40
    assert n_capped < n_plain / 10
    assert n_capped >= 40


def test_max_df_none_is_the_plain_prefix_path(hot_tables):
    left, right = hot_tables
    a = fuzzy_match(left, right, "lid", "lname", "rid", "rname",
                    threshold=0.4, max_df=None)
    b = fuzzy_match(left, right, "lid", "lname", "rid", "rname",
                    threshold=0.4, prefix_filter=False)
    assert _matches(a) == _matches(b)
