"""Plan-audit API: the reusable twin of the test_plans pins."""

from __future__ import annotations

from hangarbay_spark.plans.audit import audit_dataframe, audit_query

SF_DIR = "/root/testdata/sf0.001"


def test_point_lookup_audit_clean(spark):
    a = audit_query(spark, "lookup_point_customer", SF_DIR)
    assert a.ok
    assert not a.has_cartesian and a.bnlj_count == 0
    # pushdown reached the scan
    assert any("c_custkey" in s.pushed_filters for s in a.scans)


def test_audit_counts_exchanges(spark):
    a = audit_query(spark, "agg_pricing_summary", SF_DIR)
    assert a.ok
    assert a.shuffle_exchanges >= 1  # the group-by shuffle
    assert a.wholestage_spans >= 1
    assert a.scans and all(s.n_columns <= 12 for s in a.scans)


def test_audit_flags_cartesian(spark):
    li = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    r = spark.read.parquet(f"{SF_DIR}/region.parquet")
    bad = li.crossJoin(r).filter(li.n_name > r.r_name)  # non-equi cross
    a = audit_dataframe(bad, name="deliberate_cartesian")
    assert (not a.ok) or a.bnlj_count > 0  # BNLJ note or cartesian hazard
    assert a.has_cartesian or a.bnlj_count > 0


def test_audit_notes_bounded_bnlj(spark):
    # (was events_rfm_segments until r8 — its scalar crossJoin now
    # sits behind the rank checkpoint, outside the visible plan)
    a = audit_query(spark, "subquery_scalar_above_avg", SF_DIR)
    # the 1-row scalar broadcast is a NOTE, not a hazard
    assert a.bnlj_count >= 1 and a.ok
