"""Property-based tests (hypothesis): the temporal join operators
against brute-force Python reference implementations on randomized
inputs. Spark round-trips are slow, so example counts are tuned low —
the value is hitting tie/boundary/empty-side cases a fixture misses.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = ("u", "v")

# small domains force collisions: equal timestamps, shared keys,
# boundary hits
ts_strat = st.integers(min_value=0, max_value=20)
key_strat = st.sampled_from(KEYS)

left_rows = st.lists(
    st.tuples(key_strat, ts_strat), min_size=0, max_size=8
)
right_rows = st.lists(
    st.tuples(key_strat, ts_strat), min_size=0, max_size=8
)
interval_rows = st.lists(
    st.tuples(key_strat, ts_strat, st.integers(min_value=0, max_value=6)),
    min_size=0,
    max_size=6,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(left=left_rows, right=right_rows)
@PROP_SETTINGS
def test_as_of_join_matches_bruteforce(spark, left, right):
    from hangarbay_spark.operators.temporal import as_of_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "lid int, k string, ts long",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)] or [(None, None, None)],
        "rid int, k string, ts long",
    ).filter("rid is not null")
    got = {
        r["lid"]: r["asof_rid"]
        for r in as_of_join(
            ldf, rdf, on="k", right_cols=["rid"], tie_break="rid"
        ).collect()
    }
    # brute force: latest right at-or-before; ties -> max rid
    expect = {}
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, ri)
            for ri, (rk, rt) in enumerate(right)
            if rk == k and rt <= t
        ]
        expect[i] = max(cands)[1] if cands else None
    assert got == expect


WORDS = ("aa", "bb", "cc", "dd")
doc_strat = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
    min_size=1,
    max_size=5,
)
query_strat = st.lists(st.sampled_from(WORDS), min_size=1, max_size=3)


@given(docs=doc_strat, q=query_strat)
@PROP_SETTINGS
def test_fts_match_all_and_phrase_bruteforce(spark, docs, q):
    from hangarbay_spark.operators import fts

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string",
    )
    idx = fts.build_inverted_index(df, "doc_id", "text")
    got_all = {
        r["doc_id"]
        for r in fts.match_all(idx, " ".join(q), "doc_id").collect()
    }
    expect_all = {
        i for i, toks in enumerate(docs) if set(q) <= set(toks)
    }
    assert got_all == expect_all

    pidx = fts.build_positional_index(df, "doc_id", "text")
    got_ph = {
        r["doc_id"]
        for r in fts.match_phrase(pidx, " ".join(q), "doc_id").collect()
    }
    expect_ph = {
        i
        for i, toks in enumerate(docs)
        if any(toks[j : j + len(q)] == q for j in range(len(toks)))
    }
    assert got_ph == expect_ph


@given(points=left_rows, intervals=interval_rows)
@PROP_SETTINGS
def test_range_join_matches_bruteforce(spark, points, intervals):
    from hangarbay_spark.operators.temporal import range_join

    pdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(None, None, None)],
        "pid int, k string, ts long",
    ).filter("pid is not null")
    idf = spark.createDataFrame(
        [(i, k, s, s + w) for i, (k, s, w) in enumerate(intervals)]
        or [(None, None, None, None)],
        "iid int, k string, st long, en long",
    ).filter("iid is not null")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, on="k", point_ts="ts", start="st", end="en",
            bin_width=5,
        ).collect()
    }
    expect = {
        (pi, ii)
        for pi, (pk, pt) in enumerate(points)
        for ii, (ik, s, w) in enumerate(intervals)
        if pk == ik and s <= pt <= s + w
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: the composition law on random
# version pairs (random adds / deletes / modifications per key)
# ---------------------------------------------------------------------------

version_strat = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # id
        st.sampled_from(("g1", "g2", "g3")),  # group
        st.integers(min_value=-500, max_value=500),  # value in cents
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)


@given(old=version_strat, new=version_strat)
@PROP_SETTINGS
def test_incremental_agg_law_random_versions(spark, old, new):
    from decimal import Decimal

    from hangarbay_spark.pipelines.incremental import (
        build_agg,
        delta_agg_update,
        signed_delta,
    )

    schema = "id int, g string, v double"
    odf = spark.createDataFrame(
        [(i, g, c / 100.0) for i, g, c in old] or [(None, None, None)], schema
    ).filter("id is not null")
    ndf = spark.createDataFrame(
        [(i, g, c / 100.0) for i, g, c in new] or [(None, None, None)], schema
    ).filter("id is not null")
    specs = {"s": ("v", 2)}
    updated = delta_agg_update(
        build_agg(odf, ["g"], specs),
        signed_delta(odf, ndf, "id"),
        ["g"],
        specs,
    )
    got = {r["g"]: (r["n"], Decimal(r["s"])) for r in updated.collect()}
    fresh = {
        r["g"]: (r["n"], Decimal(r["s"]))
        for r in build_agg(ndf, ["g"], specs).collect()
    }
    assert got == fresh


# ---------------------------------------------------------------------------
# Corpus filters: randomized inputs vs Python references
# ---------------------------------------------------------------------------

_PII_ALPHABET = "ab1. @-\n"
pii_text_strat = st.lists(
    st.text(alphabet=_PII_ALPHABET, min_size=0, max_size=25),
    min_size=1,
    max_size=4,
)


@given(texts=pii_text_strat)
@PROP_SETTINGS
def test_pii_redaction_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): the placeholder tags contain no
    characters the patterns can re-match."""
    from hangarbay_spark.operators import filters as FL

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    once = df.select(
        "id", FL.redact_pii_expr("text").alias("r1")
    )
    twice = once.select("id", FL.redact_pii_expr(F.col("r1")).alias("r2"))
    j = once.join(twice, "id").collect()
    for r in j:
        assert r["r1"] == r["r2"]


lines_strat = st.lists(
    st.sampled_from(("a", "bb", "c c", "", "dd")), min_size=1, max_size=8
)


@given(lines=lines_strat)
@PROP_SETTINGS
def test_line_dedup_matches_python(spark, lines):
    from hangarbay_spark.operators import filters as FL

    text = "\n".join(lines)
    df = spark.createDataFrame([(1, text)], "id int, text string")
    out = df.select(
        F.array_join(
            FL.dedup_lines_expr(FL.lines_expr("text")), "\n"
        ).alias("clean")
    ).collect()[0]["clean"]
    expect = "\n".join(dict.fromkeys(lines))  # first occurrence, ordered
    assert out == expect


ffd_strat = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=40),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)


@given(items=ffd_strat)
@PROP_SETTINGS
def test_ffd_invariants_random(spark, items):
    from hangarbay_spark.operators import packing as PK

    budget = 30
    df = spark.createDataFrame(
        items or [(None, None)], "doc_id long, n_tokens long"
    ).filter("doc_id is not null")
    out = PK.pack_sequences_ffd(df, "doc_id", "n_tokens", budget, n_shards=3).collect()
    assert sorted(r["id"] for r in out) == sorted(i for i, _ in items)
    loads = {}
    for r in out:
        loads.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for vals in loads.values():
        assert sum(vals) <= budget or len(vals) == 1


vec_strat = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=2,
    max_size=96,
)


@given(a=vec_strat, b=vec_strat)
@settings(max_examples=200, deadline=None)
def test_prop_seq_cosine_bitexact(a, b):
    """The sequential-accumulation Arrow cosine kernel must be
    BIT-identical (==, not approx) to a pure left-to-right Python fold
    — the same op order cosine_expr and the DuckDB oracle execute.
    No Spark round-trip: the kernel function is exercised directly."""
    import math

    import pandas as pd

    from hangarbay_spark.operators.similarity import cosine_pair_seq_udf

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    dot = na = nb = 0.0
    for x, y in zip(a, b):  # the expr fold: strict left-to-right
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    kernel = cosine_pair_seq_udf().func
    got = kernel(pd.Series([a]), pd.Series([b])).iloc[0]
    if denom == 0.0:
        # division by zero is NULL in both Spark and DuckDB (never
        # IEEE inf/nan — a NaN would pass >= filters Spark-side only)
        assert got is pd.NA or got is None
    else:
        assert got == dot / denom  # bitwise: same IEEE-754 op sequence


fp_strat = st.integers(min_value=0, max_value=(1 << 64) - 1)
flip_strat = st.lists(
    st.integers(min_value=0, max_value=63), min_size=0, max_size=3
)


@given(fp=fp_strat, flips=flip_strat)
@settings(max_examples=300, deadline=None)
def test_prop_simhash_pigeonhole_complete(fp, flips):
    """Completeness of the block-pigeonhole candidate generation: ANY
    pair of 64-bit fingerprints within Hamming distance 3 shares at
    least one of the four 16-bit blocks exactly — so the (block, value)
    equi-join can never miss a true pair."""
    other = fp
    for bit in flips:
        other ^= 1 << bit
    hamming = bin(fp ^ other).count("1")
    assert hamming <= 3
    blocks_a = [(fp >> (16 * j)) & 0xFFFF for j in range(4)]
    blocks_b = [(other >> (16 * j)) & 0xFFFF for j in range(4)]
    assert any(x == y for x, y in zip(blocks_a, blocks_b))


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_prop_cusum_closed_form_equals_recurrence(devs):
    """The window closed form used by events_cusum_changepoint
    (cs_t - min(0, running-min of cs)) must equal the clamped CUSUM
    recurrence s_t = max(0, s_{t-1} + d_t) at every position. Exact
    integers so the algebraic identity is untouched by float order
    (the query itself runs the same shape in exact decimals)."""
    s = 0
    cs = 0
    lo = 0  # running min of cs, seeded at 0 (empty-prefix cumsum)
    for d in devs:
        s = max(0, s + d)
        cs += d
        lo = min(lo, cs)
        assert s == cs - min(lo, 0)


def test_scd2_intervals_partition_each_user(spark):
    """SCD2 output invariants on real data: per user, intervals are
    ordered, non-overlapping, chained (valid_to == next valid_from),
    and exactly the last row is open/current."""
    from collections import defaultdict

    from hangarbay_spark.queries import REGISTRY

    rows = (
        REGISTRY["events_scd2_user_tier"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["valid_from_ms"])
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to_ms"] == b["valid_from_ms"]
            assert not a["is_current"]
            assert a["tier"] != b["tier"]  # compaction: no no-op rows
        assert rs[-1]["is_current"] and rs[-1]["valid_to_ms"] is None


winnow_tokens = st.lists(
    st.sampled_from(tuple(f"w{i}" for i in range(12))),
    min_size=0,
    max_size=10,
)
shared_run = st.lists(
    st.sampled_from(tuple(f"s{i}" for i in range(12))),
    min_size=8,  # k + w - 1 at (k=5, w=4)
    max_size=12,
)


@given(pre_a=winnow_tokens, post_a=winnow_tokens,
       pre_b=winnow_tokens, post_b=winnow_tokens, run=shared_run)
@PROP_SETTINGS
def test_winnow_guarantee_randomized(
    spark, pre_a, post_a, pre_b, post_b, run
):
    """The Schleimer guarantee under randomized surroundings: two docs
    embedding the SAME >= k+w-1 token run at arbitrary (random)
    positions always share a winnowing fingerprint, regardless of what
    precedes or follows the run in either doc."""
    from hangarbay_spark.operators.dedup import winnow_fingerprints

    doc_a = " ".join(pre_a + run + post_a)
    doc_b = " ".join(pre_b + run + post_b)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id int, text string"
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b, (doc_a, doc_b)
