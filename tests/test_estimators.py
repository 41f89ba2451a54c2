"""First-principles pins for the continuation-6 estimators: every
statistic is recomputed in pure Python/numpy from the raw parquet —
an implementation with NO shared code or formula text with either
engine — so a bug common to the Spark query and its DuckDB oracle
(shared formula-text typo, wrong tie rule, wrong lattice weight)
cannot hide behind cross-engine agreement. Brute force is feasible
because sf0.001 is tiny (6k lineitem / 1k events / 500 vectors)."""

from __future__ import annotations

import math

import duckdb
import pytest

from hangarbay_spark.queries.base import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(name, spark):
    return [tuple(r) for r in REGISTRY[name].fn(spark, SF_DIR).collect()]


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def _r6(x):
    """Spark ROUND(double, 6) semantics: BigDecimal.valueOf(double)
    (the SHORTEST string repr, not the exact binary expansion), then
    HALF_UP — Python's round() is half-even and Decimal(x) is the
    binary expansion; both disagree at .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _tie_ranks(values):
    """average tie ranks, 1-based."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        r = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for k in range(i, j):
            ranks[order[k]] = r
        i = j
    return ranks


def test_spearman_matches_bruteforce(spark):
    xy = _duck("SELECT l_quantity, l_discount FROM lineitem")
    xs = [r[0] for r in xy]
    ys = [r[1] for r in xy]
    rx, ry = _tie_ranks(xs), _tie_ranks(ys)
    n = float(len(xs))
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    (got,) = _rows("agg_spearman_corr", spark)
    assert got[0] == int(n)
    assert got[1] == pytest.approx(rho, abs=2e-6)


def test_kendall_matches_bruteforce(spark):
    grid = _duck(
        "SELECT l_quantity, l_discount, COUNT(*) FROM lineitem GROUP BY 1, 2"
    )
    c = d = 0
    n = sum(g[2] for g in grid)
    for i, (x1, y1, c1) in enumerate(grid):
        for x2, y2, c2 in grid[i + 1 :]:
            if (x1 - x2) * (y1 - y2) > 0:
                c += c1 * c2
            elif (x1 - x2) * (y1 - y2) < 0:
                d += c1 * c2
    from collections import Counter

    tx = Counter()
    ty = Counter()
    for x, y, cnt in grid:
        tx[x] += cnt
        ty[y] += cnt
    n0 = n * (n - 1) / 2
    n1 = sum(v * (v - 1) / 2 for v in tx.values())
    n2 = sum(v * (v - 1) / 2 for v in ty.values())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    (got,) = _rows("agg_kendall_tau", spark)
    assert got[0] == n
    assert got[1] == float(c) and got[2] == float(d)
    assert got[3] == pytest.approx(tau, abs=2e-6)


def test_weighted_median_matches_bruteforce(spark):
    rows = _duck(
        "SELECT l_returnflag, l_extendedprice, CAST(l_quantity AS BIGINT)"
        " FROM lineitem"
    )
    by_flag = {}
    for f, p, w in rows:
        by_flag.setdefault(f, []).append((p, w))
    got = {r[0]: (r[1], r[2]) for r in _rows("agg_weighted_median", spark)}
    for f, pw in by_flag.items():
        pw.sort()
        tot = sum(w for _, w in pw)
        cum = 0
        lo = hi = None
        for p, w in pw:
            cum += w
            if lo is None and 2 * cum >= tot:
                lo = p
            if hi is None and 2 * cum > tot:
                hi = p
        assert got[f][0] == tot
        assert got[f][1] == pytest.approx((lo + hi) / 2.0, abs=1e-9)


def test_theilsen_matches_bruteforce(spark):
    daily = _duck(
        "SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        " AS BIGINT) AS d, COUNT(*) FROM events"
        " WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    )
    slopes = []
    for i, (d1, c1) in enumerate(daily):
        for d2, c2 in daily[i + 1 :]:
            slopes.append((c2 - c1) / (d2 - d1))
    slopes.sort()
    m = len(slopes)
    pos = (m - 1) * 0.5
    lo, hi = slopes[math.floor(pos)], slopes[math.ceil(pos)]
    med = round(lo + (pos - math.floor(pos)) * (hi - lo), 6)
    (got,) = _rows("events_theilsen_trend", spark)
    assert got[0] == len(daily) and got[1] == m
    assert got[2] == pytest.approx(med, abs=2e-6)


def test_hits_matches_numpy(spark):
    import numpy as np

    edges = _duck(
        "SELECT DISTINCT o.o_custkey, l.l_partkey FROM lineitem l"
        " JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    custs = sorted({e[0] for e in edges})
    parts = sorted({e[1] for e in edges})
    ci = {c: i for i, c in enumerate(custs)}
    pi = {p: i for i, p in enumerate(parts)}
    A = np.zeros((len(custs), len(parts)), dtype=object)
    for c, p in edges:
        A[ci[c], pi[p]] = 1
    h = np.ones(len(custs), dtype=object)
    for k in range(3):
        a = A.T @ h
        if k < 2:
            h = A @ a
    scored = sorted(
        ((float(a[pi[p]]), p) for p in parts), key=lambda t: (-t[0], t[1])
    )[:15]
    got = _rows("graph_hits_authorities", spark)
    assert [(g[0], g[1]) for g in got] == [(p, s) for s, p in scored]


def test_shapley_matches_manual_lattice(spark):
    rows = _duck(
        """
        WITH s0 AS (
          SELECT user_id, event_type, CAST(epoch_ms(ts) AS BIGINT) AS tms,
                 CAST(MIN(epoch_ms(ts)) OVER (PARTITION BY user_id)
                   AS BIGINT) AS t0
          FROM events)
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view'
                         AND tms <= t0 + 86400000 THEN 4 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'click'
                           AND tms <= t0 + 86400000 THEN 2 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'signup'
                           AND tms <= t0 + 86400000 THEN 1 ELSE 0 END),
               MAX(CASE WHEN event_type = 'purchase'
                         AND tms > t0 + 86400000
                         AND tms <= t0 + 172800000 THEN 1 ELSE 0 END)
        FROM s0 GROUP BY user_id
        """
    )
    tot = {}
    conv = {}
    for _, s, cflag in rows:
        tot[s] = tot.get(s, 0) + 1
        conv[s] = conv.get(s, 0) + cflag
    v = {s: round(conv[s] / tot[s], 6) for s in tot}
    w = {0: 1 / 3, 1: 1 / 6, 2: 1 / 3}
    expect = {}
    for name, bit in (("view", 4), ("click", 2), ("signup", 1)):
        val = 0.0
        for s in range(8):
            if s & bit:
                continue
            size = bin(s).count("1")
            val += round(
                w[size] * (v.get(s | bit, 0.0) - v.get(s, 0.0)), 9
            )
        expect[name] = val
    got = {r[0]: r[1] for r in _rows("events_shapley_attribution", spark)}
    for ch in expect:
        assert got[ch] == pytest.approx(expect[ch], abs=2e-9)


def test_kmeans_matches_numpy_lloyd(spark):
    import numpy as np

    vecs = _duck(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        " ORDER BY vec_id"
    )
    X = []
    for _, v in vecs:
        a = np.asarray(v, dtype=np.float64)
        sc = 127.0 / max(np.abs(a).max(), 1e-30)
        X.append(np.floor(a * sc + 0.5).astype(np.int64))
    X = np.stack(X)
    cents = {i + 1: X[i].copy() for i in range(8)}
    for it in range(2):
        C = np.stack([cents[c] for c in sorted(cents)])
        ids = sorted(cents)
        dots = X @ C.T
        qq = (X * X).sum(axis=1)
        cc = (C * C).sum(axis=1)
        cos = np.round(
            dots / (np.sqrt(qq)[:, None] * np.sqrt(cc)[None, :]), 9
        )
        # argmax with smallest-cid tie-break (first max)
        assign = np.argmax(cos, axis=1)
        new = {}
        sizes = {}
        for j, cid in enumerate(ids):
            members = X[assign == j]
            if len(members):
                new[cid] = members.sum(axis=0)
                sizes[cid] = len(members)
        cents = new
    got = _rows("sim_kmeans_train", spark)
    for cid, n, i, val in got:
        s = int(cents[cid][i - 1])
        assert n == sizes[cid]
        assert val == pytest.approx(round(s / n, 6), abs=1e-9)


def test_modularity_matches_bruteforce(spark):
    edges = _duck(
        """
        WITH li AS (SELECT DISTINCT l.l_orderkey, l.l_partkey
                    FROM lineitem l JOIN part p
                      ON l.l_partkey = p.p_partkey AND p.p_size <= 5)
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        """
    )
    brand = dict(_duck("SELECT p_partkey, p_brand FROM part"))
    m = len(edges)
    intra = {}
    deg = {}
    for a, b in edges:
        ba, bb = brand[a], brand[b]
        if ba == bb:
            intra[ba] = intra.get(ba, 0) + 1
        deg[ba] = deg.get(ba, 0) + 1
        deg[bb] = deg.get(bb, 0) + 1
    q = 0.0
    for br in deg:
        lc = intra.get(br, 0)
        q += round(lc / m - (deg[br] / (2 * m)) ** 2, 9)
    got = {r[0]: r for r in _rows("graph_modularity_brands", spark)}
    assert got["Q_TOTAL"][3] == pytest.approx(q, abs=2e-9)
    for br in deg:
        assert got[br][1] == intra.get(br, 0)
        assert got[br][2] == deg[br]


def test_item_cf_matches_bruteforce(spark):
    baskets = _duck("SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
    from collections import Counter

    ic = Counter(p for _, p in baskets)
    by_order = {}
    for o, p in baskets:
        by_order.setdefault(o, []).append(p)
    pair = Counter()
    for items in by_order.values():
        items.sort()
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                pair[(a, b)] += 1
    top = sorted(ic, key=lambda p: (-ic[p], p))[:20]
    expect = {}
    for item in top:
        cands = []
        for (a, b), nab in pair.items():
            if nab < 2 or item not in (a, b):
                continue
            nb = b if a == item else a
            cos = round(nab / math.sqrt(ic[item] * ic[nb]), 9)
            cands.append((-cos, nb, nab))
        cands.sort()
        expect[item] = [
            (nb, nab, -negcos) for negcos, nb, nab in cands[:3]
        ]
    got = {}
    for item, nb, nab, cos, rk in _rows("analytics_item_cf_topk", spark):
        got.setdefault(item, []).append((nb, nab, cos))
    for item in got:
        assert got[item] == [
            (nb, nab, pytest.approx(c, abs=1e-9))
            for nb, nab, c in expect[item]
        ]


def test_abc_matches_bruteforce(spark):
    rows = _duck(
        "SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(30,2)))"
        " FROM lineitem GROUP BY 1"
    )
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    tot = sum(r[1] for r in ranked)
    cls = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    cum = 0
    for _, rev in ranked:
        cum += rev
        k = "A" if cum * 10 <= tot * 7 else ("B" if cum * 10 <= tot * 9 else "C")
        cls[k][0] += 1
        cls[k][1] += rev
    got = {r[0]: r for r in _rows("report_abc_classification", spark)}
    for k in cls:
        assert got[k][1] == cls[k][0]
        assert got[k][2] == pytest.approx(float(cls[k][1]), abs=1e-6)
        assert got[k][3] == pytest.approx(
            round(float(cls[k][1]) / float(tot), 6), abs=1e-6
        )


def test_markov_steady_state_matches_numpy(spark):
    rows = _duck(
        """
        WITH seq AS (
          SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT prev, event_type, COUNT(*) FROM seq
        WHERE prev IS NOT NULL GROUP BY 1, 2
        """
    )
    from collections import defaultdict
    from decimal import Decimal

    rt = defaultdict(int)
    for p, nx, n in rows:
        rt[p] += n
    states = sorted(rt)
    pi = {s: round(1.0 / len(states), 12) for s in states}
    for _ in range(12):
        acc = {s: Decimal(0) for s in states}
        for p, nx, n in rows:
            term = round(pi[p] * (n / rt[p]), 12)
            acc[nx] += Decimal(str(term)).quantize(Decimal("1e-12"))
        pi = {s: float(acc[s]) for s in states}
    got = {r[0]: r[1] for r in _rows("events_markov_steady_state", spark)}
    for s in states:
        assert got[s] == pytest.approx(round(pi[s], 9), abs=2e-9)


def test_lift_table_matches_bruteforce(spark):
    rows = _duck(
        """
        SELECT user_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    )
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0])
    for _, score, conv in rows:
        g[score][0] += 1
        g[score][1] += conv
    tusers = sum(v[0] for v in g.values())
    tconvs = sum(v[1] for v in g.values())
    before = 0
    dec = defaultdict(lambda: [0, 0])
    for score in sorted(g, reverse=True):
        d = before * 10 // tusers
        dec[d][0] += g[score][0]
        dec[d][1] += g[score][1]
        before += g[score][0]
    got = {r[0]: r for r in _rows("events_model_lift_table", spark)}
    cum = 0
    for d in sorted(dec):
        users, convs = dec[d]
        cum += convs
        assert got[d][1] == users and got[d][2] == convs
        assert got[d][3] == pytest.approx(round(convs / users, 6), abs=1e-9)
        assert got[d][5] == pytest.approx(round(cum / tconvs, 6), abs=1e-9)


def test_proximity_matches_bruteforce(spark):
    import re

    docs = _duck("SELECT doc_id, lower(coalesce(text, '')) FROM documents")
    expect = []
    for doc_id, text in docs:
        toks = re.split(r"[^a-z0-9]+", text)
        pa = [i for i, t in enumerate(toks) if t == "spark"]
        pb = [i for i, t in enumerate(toks) if t == "table"]
        if pa and pb:
            gap = min(abs(a - b) for a in pa for b in pb)
            expect.append((gap, doc_id, len(pa) * len(pb)))
    expect.sort()
    expect = [(d, g, n) for g, d, n in expect[:15]]
    got = [(r[0], r[1], r[2]) for r in _rows("fts_proximity_topk", spark)]
    assert got == expect


def test_assortativity_matches_bruteforce(spark):
    edges = _duck(
        """
        WITH li AS (SELECT DISTINCT l.l_orderkey, l.l_partkey
                    FROM lineitem l JOIN part p
                      ON l.l_partkey = p.p_partkey AND p.p_size <= 5)
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        """
    )
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    (got,) = _rows("graph_assortativity", spark)
    assert got[0] == int(n)
    assert got[1] == pytest.approx(r, abs=2e-6)


def test_windowed_funnel_matches_simulation(spark):
    rows = _duck(
        "SELECT user_id, event_type, event_id,"
        " CAST(epoch_ms(ts) AS BIGINT) FROM events"
        " ORDER BY user_id, 4, event_id"
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, et, eid, tms in rows:
        by_user[u].append((tms, eid, et))
    H = 3600000
    np_, nc = 0, 0
    tts = []
    for u, evs in by_user.items():
        lastv = None
        cl = None  # (click_ts, view_ts_at_click)
        for tms, eid, et in evs:
            if et == "purchase":
                np_ += 1
                if (
                    cl is not None
                    and cl[1] is not None
                    and tms - cl[0] <= H
                    and cl[0] - cl[1] <= H
                ):
                    nc += 1
                    tts.append(tms - cl[1])
            if et == "click":
                cl = (tms, lastv)
            if et == "view":
                lastv = tms
    tts.sort()
    m = len(tts)
    (got,) = _rows("events_windowed_funnel", spark)
    assert got[0] == np_ and got[1] == nc
    assert got[2] == pytest.approx(_r6(nc / np_), abs=1e-9)
    if m == 0:
        assert got[3] is None
    else:
        pos = (m - 1) * 0.5
        lo, hi = tts[math.floor(pos)], tts[math.ceil(pos)]
        med = _r6(lo + (pos - math.floor(pos)) * (hi - lo))
        assert got[3] == pytest.approx(med, abs=1e-6)


def test_gapfill_matches_simulation(spark):
    rows = _duck(
        """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6)
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        GROUP BY 1 ORDER BY 1
        """
    )
    obs = dict(rows)
    his = sorted(obs)
    expect = {}
    for hi in range(his[0], his[-1] + 1):
        if hi in obs:
            expect[hi] = (obs[hi], 0)
        else:
            ph = max(h for h in his if h < hi)
            nh = min(h for h in his if h > hi)
            pv, nv = obs[ph], obs[nh]
            expect[hi] = (
                _r6(pv + (nv - pv) * (hi - ph) / (nh - ph)),
                1,
            )
    got = {r[0]: (r[1], r[2]) for r in _rows("events_gapfill_interpolate", spark)}
    assert set(got) == set(expect)
    for hi in expect:
        assert got[hi][1] == expect[hi][1]
        assert got[hi][0] == pytest.approx(expect[hi][0], abs=1e-9)


def test_sequence_pattern_matches_simulation(spark):
    rows = _duck(
        "SELECT user_id, event_type, event_id,"
        " CAST(epoch_ms(ts) AS BIGINT) FROM events"
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, et, eid, tms in rows:
        by_user[u].append((tms, eid, et[0]))
    dist = defaultdict(lambda: [0, 0])
    for u, evs in by_user.items():
        evs.sort()
        s = "".join(ch for _, _, ch in evs)
        strict = (len(s) - len(s.replace("vcp", ""))) // 3
        import re

        sub = 1 if re.search("v.*c.*p", s) else 0
        dist[(strict, sub)][0] += 1
        dist[(strict, sub)][1] += len(s)
    got = {(r[0], r[1]): (r[2], r[3]) for r in _rows("events_sequence_pattern", spark)}
    assert got == {k: tuple(v) for k, v in dist.items()}


def test_skyline_matches_bruteforce(spark):
    rows = _duck(
        "SELECT l_partkey, MIN(l_extendedprice),"
        " SUM(CAST(l_quantity AS BIGINT)) FROM lineitem GROUP BY 1"
    )
    sky = []
    for k, p, q in rows:
        dominated = any(
            bp <= p and bq >= q and (bp < p or bq > q)
            for _, bp, bq in rows
        )
        if not dominated:
            sky.append((p, k, q))
    sky.sort()
    got = [(r[1], r[0], r[2]) for r in _rows("agg_skyline_parts", spark)]
    assert got == sky


def test_weighted_quantiles_matches_bruteforce(spark):
    rows = _duck(
        "SELECT l_returnflag, l_extendedprice, CAST(l_quantity AS BIGINT)"
        " FROM lineitem"
    )
    by_flag = {}
    for f, p, w in rows:
        by_flag.setdefault(f, []).append((p, w))
    got = {r[0]: r for r in _rows("agg_weighted_quantiles", spark)}

    def wq(pw, num, den):
        # first price with den*cum >= num*tot, and strictly >
        tot = sum(w for _, w in pw)
        cum = 0
        lo = hi = None
        for p, w in pw:
            cum += w
            if lo is None and den * cum >= num * tot:
                lo = p
            if hi is None and den * cum > num * tot:
                hi = p
        return (lo + hi) / 2.0

    for f, pw in by_flag.items():
        pw.sort()
        assert got[f][2] == pytest.approx(wq(pw, 1, 4), abs=1e-9)
        assert got[f][3] == pytest.approx(wq(pw, 1, 2), abs=1e-9)
        assert got[f][4] == pytest.approx(wq(pw, 3, 4), abs=1e-9)


def test_collocations_matches_bruteforce(spark):
    import re

    docs = _duck("SELECT lower(trim(text)) FROM documents")
    from collections import Counter

    pair = Counter()
    uni = Counter()
    npairs = 0
    for (text,) in docs:
        toks = [t for t in re.split(r"\s+", text) if t != ""]
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] += 1
            uni[a] += 1
            uni[b] += 1
            npairs += 1
    cands = []
    for (a, b), nab in pair.items():
        if nab < 5:
            continue
        pmi = _r6(math.log(nab * npairs / (uni[a] * uni[b])))
        cands.append((-pmi, f"{a} {b}", nab))
    cands.sort()
    expect = [(bg, nab, -neg) for neg, bg, nab in cands[:20]]
    got = [tuple(r) for r in _rows("text_collocations_pmi", spark)]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert g[2] == pytest.approx(e[2], abs=2e-6)


def test_source_jsd_matches_bruteforce(spark):
    """text_source_jsd recomputed in pure Python from the raw parquet:
    vocab counts per source with collections.Counter, shared-token JSD
    terms + analytic exclusive-mass remainder following the query's
    documented rounding points (ln 6 dp, terms/masses 9 dp, exact
    Decimal accumulation, final 6 dp) — no shared code or formula text
    with either engine."""
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    def _r(x, dp):
        return float(
            Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP)
        )

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    counts: dict[str, Counter] = defaultdict(Counter)
    for src, text in zip(tbl["source"], tbl["text"]):
        toks = text.lower().strip().split() or [""]
        counts[src].update(toks)
    totals = {s: sum(c.values()) for s, c in counts.items()}

    expect = {}
    for sa in sorted(counts):
        for sb in sorted(counts):
            if sa >= sb:
                continue
            shared = counts[sa].keys() & counts[sb].keys()
            if not shared:
                continue
            jsd_shared = Decimal(0)
            mass_a = Decimal(0)
            mass_b = Decimal(0)
            for t in shared:
                p = counts[sa][t] / totals[sa]
                q = counts[sb][t] / totals[sb]
                term = _r(
                    0.5
                    * (
                        p * _r(math.log(2.0 * p / (p + q)), 6)
                        + q * _r(math.log(2.0 * q / (p + q)), 6)
                    ),
                    9,
                )
                jsd_shared += Decimal(repr(term))
                mass_a += Decimal(repr(_r(p, 9)))
                mass_b += Decimal(repr(_r(q, 9)))
            jsd = _r(
                float(jsd_shared)
                + 0.5
                * _r(math.log(2.0), 6)
                * (2.0 - float(mass_a) - float(mass_b)),
                6,
            )
            expect[(sa, sb)] = (len(shared), jsd)

    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _rows("text_source_jsd", spark)
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k][0] == expect[k][0], k
        assert got[k][1] == pytest.approx(expect[k][1], abs=2e-6), k


def test_path_load_centrality_matches_pure_python(spark):
    """graph_path_load_centrality recomputed with pure-Python BFS
    sigma counts + backward tail counts over edges rebuilt from raw
    parquet — no shared code with either engine. Also sanity-checks
    the semantics on a hand-built path graph where every count is
    derivable by eye."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    # hand-built: path 1-2-3 plus 1-4, seed={1} (smallest), 2 hops
    adj0 = {1: [2, 4], 2: [1, 3], 3: [2], 4: [1]}

    def load_from(adj, seeds, hops):
        load = defaultdict(int)
        for s in seeds:
            level = {s: 1}  # node -> sigma
            dist = {s: 0}
            levels = [dict(level)]
            for k in range(1, hops + 1):
                nxt: dict[int, int] = {}
                for u, sg in level.items():
                    for v in adj.get(u, []):
                        if v not in dist:
                            nxt[v] = nxt.get(v, 0) + sg
                for v in nxt:
                    dist[v] = k
                levels.append(nxt)
                level = nxt
            tails = [dict.fromkeys(levels[hops], 1)]
            for k in range(hops - 1, -1, -1):
                cur = {}
                for v in levels[k]:
                    cur[v] = 1 + sum(
                        tails[-1].get(w, 0) for w in adj.get(v, [])
                    )
                tails.append(cur)
            call: dict[int, int] = {}
            for t in tails:
                call.update(t)
            for k in range(1, hops + 1):
                for v, sg in levels[k].items():
                    load[v] += sg * call[v]
        return dict(load)

    # seed 1, 2 hops: levels {2:1,4:1}, {3:1}; tails: 3->1, 2->2, 4->1
    # loads: 2 -> 1*2, 4 -> 1*1, 3 -> 1*1
    assert load_from(adj0, [1], 2) == {2: 2, 4: 1, 3: 1}

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    ).to_pydict()
    part = pq.read_table(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_size"]
    ).to_pydict()
    small = {
        k for k, s in zip(part["p_partkey"], part["p_size"]) if s <= 5
    }
    orders = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        if pk in small:
            orders[ok].add(pk)
    adj = defaultdict(set)
    for items in orders.values():
        its = sorted(items)
        for i in range(len(its)):
            for j in range(i + 1, len(its)):
                adj[its[i]].add(its[j])
                adj[its[j]].add(its[i])
    adj = {k: sorted(v) for k, v in adj.items()}
    seeds = sorted(adj)[:3]
    load = load_from(adj, seeds, 4)
    expect = sorted(load.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    from hangarbay_spark.queries import REGISTRY

    got = [
        (r["node"], r["path_load"])
        for r in REGISTRY["graph_path_load_centrality"]
        .fn(spark, SF_DIR)
        .collect()
    ]
    assert got == expect


def test_weighted_sssp_matches_dijkstra(spark):
    """graph_weighted_sssp recomputed with a pure-Python
    4-hop-bounded Bellman-Ford over edges rebuilt from raw parquet —
    no shared code with either engine (and cross-checked against an
    unbounded Dijkstra on the reached set: wherever Dijkstra's true
    distance is reachable within 4 hops, the bounded answer may only
    be >= it, and equal when the shortest path uses <= 4 edges)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    ).to_pydict()
    part = pq.read_table(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_size"]
    ).to_pydict()
    small = {
        k for k, s in zip(part["p_partkey"], part["p_size"]) if s <= 5
    }
    orders = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        if pk in small:
            orders[ok].add(pk)
    mult = defaultdict(int)
    for items in orders.values():
        its = sorted(items)
        for i in range(len(its)):
            for j in range(i + 1, len(its)):
                mult[(its[i], its[j])] += 1
    adj = defaultdict(list)
    for (a, b), c in mult.items():
        w = 11 - min(c, 10)
        adj[a].append((b, w))
        adj[b].append((a, w))
    seeds = sorted(adj)[:3]
    dist = {s: 0 for s in seeds}
    for _ in range(4):  # bounded Bellman-Ford, same rounds
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj[u]:
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt

    from hangarbay_spark.queries import REGISTRY

    got = {
        r["node"]: r["dist"]
        for r in REGISTRY["graph_weighted_sssp"].fn(spark, SF_DIR).collect()
    }
    assert got == dist

    # unbounded Dijkstra lower-bounds the bounded answer
    import heapq

    true = {s: 0 for s in seeds}
    pq_ = [(0, s) for s in seeds]
    while pq_:
        d, u = heapq.heappop(pq_)
        if d > true.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            if d + w < true.get(v, float("inf")):
                true[v] = d + w
                heapq.heappush(pq_, (d + w, v))
    for n, d in got.items():
        assert d >= true[n]


def test_hll_matches_pure_python(spark):
    """agg_hll_distinct_estimate recomputed entirely in pure Python
    from raw parquet — hashlib md5, bit_length ranks, integer harmonic
    terms, the same alpha/linear-counting arithmetic retyped
    independently — so a typo in the SHARED _HLL_EST formula text
    cannot hide behind cross-engine agreement."""
    import hashlib

    import pyarrow.parquet as pq

    HEXD = "0123456789abcdef"
    R2 = 4398046511104  # 2^42
    T43 = 8796093022208  # 2^43

    def hashval(key) -> int:
        h = hashlib.md5(str(key).encode()).hexdigest()
        v = 0
        for i in range(12):
            v = v * 16 + HEXD.index(h[i])
        return v

    def est_of(keys) -> float:
        regs = {}
        for k in keys:
            v = hashval(k)
            b, r = divmod(v, R2)
            rank = 43 if r == 0 else 43 - r.bit_length()
            regs[b] = max(regs.get(b, 0), rank)
        s = sum(1 << (43 - mr) for mr in regs.values())
        s += (64 - len(regs)) * T43
        v0 = 64 - len(regs)
        alpha = 0.7213 / (1.0 + 1.079 / 64.0)
        raw = alpha * 64.0 * 64.0 * float(T43) / float(s)
        if raw <= 160.0 and v0 > 0:
            return _r6(64.0 * _r6(math.log(64.0 / v0)))
        return _r6(raw)

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_returnflag"],
    ).to_pydict()
    expect = {
        "partkey": (
            est_of(set(li["l_partkey"])),
            len(set(li["l_partkey"])),
        ),
        "returnflag": (
            est_of(set(li["l_returnflag"])),
            len(set(li["l_returnflag"])),
        ),
    }
    got = {
        r[0]: (r[1], r[2])
        for r in _rows("agg_hll_distinct_estimate", spark)
    }
    for dom in expect:
        assert got[dom][1] == expect[dom][1], dom
        assert got[dom][0] == pytest.approx(expect[dom][0], abs=2e-6), dom


def test_cms_matches_pure_python(spark):
    """text_cms_token_counts recomputed with pure-Python counters from
    raw parquet: same one-md5-per-token disjoint-lane cell addressing
    (row r = hex digits [3r, 3r+3)), exact integer sums, min over rows
    — independent of both engines' SQL."""
    from collections import Counter

    import hashlib

    import pyarrow.parquet as pq

    D_, PROBES = 4, ("the", "of", "data", "model", "zzz_never_seen")
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).to_pydict()
    toks = []
    for text in tbl["text"]:
        toks.extend(text.lower().strip().split() or [""])

    def lanes(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return [int(h[3 * r : 3 * r + 3], 16) for r in range(D_)]

    cells = Counter()
    for t in toks:
        for r, idx in enumerate(lanes(t)):
            cells[(r, idx)] += 1
    exact = Counter(toks)
    expect = {}
    for p in PROBES:
        est = min(
            cells.get((r, idx), 0) for r, idx in enumerate(lanes(p))
        )
        expect[p] = (est, exact.get(p, 0))
    got = {
        r[0]: (r[1], r[2]) for r in _rows("text_cms_token_counts", spark)
    }
    assert got == expect


def test_bloom_matches_pure_python(spark):
    """text_bloom_membership recomputed with pure-Python sets from raw
    parquet: same one-md5-per-token 16-bit-lane addressing, exact
    member/candidate vocabularies, all-lanes-present membership test —
    independent of both engines' SQL. Also asserts the Bloom contract
    directly: every member token passes its own filter (no false
    negatives, checked over the whole vocabulary)."""
    import hashlib

    import pyarrow.parquet as pq

    K_, PROBES = 4, ("the", "of", "data", "model", "zzz_never_seen")
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text", "lang"]
    ).to_pydict()

    def lanes(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return [(r, int(h[4 * r : 4 * r + 4], 16)) for r in range(K_)]

    members, others = set(), set()
    for text, lang in zip(tbl["text"], tbl["lang"]):
        toks = text.lower().strip().split() or [""]
        (members if lang == "en" else others).update(toks)
    cands = others - members
    bits = {cell for t in members for cell in lanes(t)}
    passes = lambda t: all(cell in bits for cell in lanes(t))  # noqa: E731

    assert all(passes(t) for t in members)  # no false negatives, ever
    expect = {
        "n_members": len(members),
        "n_candidates": len(cands),
        "false_positives": sum(1 for t in cands if passes(t)),
    }
    for r in range(K_):
        expect[f"bits_r{r}"] = sum(1 for rr, _ in bits if rr == r)
    for p in PROBES:
        expect[f"probe:{p}"] = int(passes(p))
    got = {r[0]: r[1] for r in _rows("text_bloom_membership", spark)}
    assert got == expect


def test_priority_sample_matches_pure_python(spark):
    """sample_priority_subset_sum recomputed with pure-Python priorities
    from raw parquet (hashlib uniforms, the same IEEE w/u divide, tau =
    the (K+1)-th priority, Decimal summation) — independent of both
    engines' SQL. Also asserts the estimator is USEFUL: every
    per-returnflag estimate from the one 512-row sample lands within
    25% of its exact subset sum (deterministic, not a flaky draw)."""
    import hashlib
    from decimal import Decimal

    import pyarrow.parquet as pq

    K_ = 512
    t = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_extendedprice"],
    ).to_pydict()
    rows = []
    exact: dict[str, Decimal] = {}
    for ok, ln, rf, px in zip(
        t["l_orderkey"], t["l_linenumber"], t["l_returnflag"],
        t["l_extendedprice"],
    ):
        key = f"{ok}-{ln}"
        u = (
            int(hashlib.md5(f"ps1:{key}".encode()).hexdigest()[:12], 16) + 1
        ) / 281474976710656.0
        w = float(px)
        rows.append((rf, w, key, w / u))
        exact[rf] = exact.get(rf, Decimal(0)) + Decimal(str(px))
    rows.sort(key=lambda r: (-r[3], r[2]))
    # DLT degenerate case mirror: n <= K -> tau = 0 (sample is exact)
    tau = rows[K_][3] if len(rows) > K_ else 0.0
    est: dict[str, Decimal] = {}
    sampled: dict[str, int] = {}
    for rf, w, _, _ in rows[:K_]:
        est[rf] = est.get(rf, Decimal(0)) + Decimal(str(_r6(max(w, tau))))
        sampled[rf] = sampled.get(rf, 0) + 1
    got = {
        r[0]: {"est_sum": r[1], "sampled": r[2], "exact_sum": r[3]}
        for r in _rows("sample_priority_subset_sum", spark)
    }
    assert set(got) == set(exact)
    for rf in exact:
        assert got[rf]["exact_sum"] == exact[rf], rf
        assert got[rf]["sampled"] == sampled.get(rf), rf
        if rf in est:
            assert got[rf]["est_sum"] == est[rf], rf
            rel = abs(float(est[rf]) - float(exact[rf])) / float(exact[rf])
            assert rel < 0.25, (rf, rel)


def test_ams_matches_pure_python(spark):
    """agg_ams_selfjoin_size recomputed with pure-Python signed counts
    from raw parquet (hashlib nibble parity, integer squares, the one
    final /9) — no shared formula text with either engine."""
    import hashlib

    import pyarrow.parquet as pq

    HEXD = "0123456789abcdef"
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey"]
    ).to_pydict()["l_partkey"]
    z = [0] * 9
    for k in li:
        for r in range(9):
            h = hashlib.md5(f"{r}|{k}".encode()).hexdigest()
            z[r] += 2 * (HEXD.index(h[0]) % 2) - 1
    est = sum(v * v for v in z) / 9.0
    exact = 0
    from collections import Counter

    for c in Counter(li).values():
        exact += c * c
    (got,) = _rows("agg_ams_selfjoin_size", spark)
    assert got[1] == exact
    from decimal import ROUND_HALF_UP, Decimal

    est6 = float(
        Decimal(repr(est)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    assert got[0] == pytest.approx(est6, abs=1e-9)


def test_interval_concurrency_matches_bruteforce(spark):
    """join_interval_concurrency recomputed with a pure-Python day
    sweep from raw parquet — per supplier, count intervals covering
    each day, take the max and its first day."""
    from collections import defaultdict

    import pyarrow.parquet as pq
    from datetime import date

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity"],
    ).to_pydict()
    epoch = date(1970, 1, 1)
    deltas = defaultdict(lambda: defaultdict(int))
    for sk, sd, qty in zip(
        li["l_suppkey"], li["l_shipdate"], li["l_quantity"]
    ):
        d0 = (sd.date() if hasattr(sd, "date") else sd) - epoch
        s = d0.days
        r = s + (int(qty) % 30 + 5)
        deltas[sk][s] += 1
        deltas[sk][r + 1] -= 1
    expect = {}
    for sk, dd in deltas.items():
        conc, best, best_d = 0, -1, None
        for d in sorted(dd):
            conc += dd[d]
            if conc > best:
                best, best_d = conc, d
        expect[sk] = (best, best_d)
    top = sorted(
        expect.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:15]
    want = [(sk, mc, pd) for sk, (mc, pd) in top]
    got = [
        (r["l_suppkey"], r["max_concurrent"], r["peak_day"])
        for r in REGISTRY["join_interval_concurrency"]
        .fn(spark, SF_DIR)
        .collect()
    ]
    assert got == want


def test_span_removal_matches_pure_python(spark):
    """dedup_span_removal recomputed end-to-end in pure Python from
    raw parquet: tokenize, hash every 10-gram, find cross-doc grams,
    merge covered intervals, splice, md5 — full per-doc equality
    including the cleaned-text digest."""
    import hashlib
    from collections import defaultdict

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    toks = {
        d: (t.lower().strip().split() or [""])
        for d, t in zip(tbl["doc_id"], tbl["text"])
    }
    n = 10
    owners = defaultdict(set)
    starts = defaultdict(list)
    for d, tt in toks.items():
        for i in range(len(tt) - n + 1):
            g = hashlib.md5(" ".join(tt[i : i + n]).encode()).hexdigest()
            owners[g].add(d)
            starts[d].append((i, g))
    expect = {}
    for d, tt in toks.items():
        ivs = []
        for i, g in starts[d]:
            if len(owners[g]) >= 2:
                s, e = i, i + n - 1
                if ivs and s <= ivs[-1][1] + 1:
                    ivs[-1] = (ivs[-1][0], max(ivs[-1][1], e))
                else:
                    ivs.append((s, e))
        removed = sum(e - s + 1 for s, e in ivs)
        kept = []
        cursor = 0
        for s, e in ivs:
            kept.extend(tt[cursor:s])
            cursor = e + 1
        kept.extend(tt[cursor:])
        cleaned = " ".join(kept)
        expect[d] = (
            len(ivs),
            removed,
            len(tt) - removed,
            hashlib.md5(cleaned.encode()).hexdigest(),
        )
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in _rows("dedup_span_removal", spark)
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # corpus exercises it


def test_winnow_pairs_matches_pure_python(spark):
    """dedup_winnow_pairs recomputed in pure Python: k-gram hashes,
    window-of-w minima with the (hash, position) tie-break, distinct
    fingerprints with the short-doc fallback, pair counts and
    resemblance — full row-set equality."""
    import hashlib
    from collections import defaultdict

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    k, w, min_shared = 5, 4, 2
    fps = {}
    for d, text in zip(tbl["doc_id"], tbl["text"]):
        tt = text.lower().strip().split() or [""]
        encs = []
        for i in range(len(tt) - k + 1):
            h = hashlib.md5(" ".join(tt[i : i + k]).encode()).hexdigest()
            encs.append(f"{h}|{i:08d}")
        sel = set()
        ng = len(encs)
        if ng:
            last_start = max(ng - w, 0)
            for s in range(last_start + 1):
                m = min(encs[s : s + w])
                sel.add(m[:32])
        fps[d] = sel
    post = defaultdict(set)
    for d, s in fps.items():
        for fp in s:
            post[fp].add(d)
    counts = defaultdict(int)
    for fp, ds in post.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                counts[(ds[i], ds[j])] += 1
    expect = {
        (a, b): (c, c / (len(fps[a]) + len(fps[b]) - c))
        for (a, b), c in counts.items()
        if c >= min_shared
    }
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _rows("dedup_winnow_pairs", spark)
    }
    assert got.keys() == expect.keys()
    for key in expect:
        assert got[key][0] == expect[key][0], key
        assert got[key][1] == pytest.approx(expect[key][1], abs=1e-12)
    assert expect  # corpus exercises it


def _gk_python(rows, q_pms, partitions=32, err_div=100, batch_of=None):
    """Pure-Python GK-style summary + estimate: md5 hash partition,
    sort, equi-spaced kept ranks, coverage cumsum, nearest-rmin
    selection — no shared code or formula text with either engine.
    rows = [(v, tb)] (or [(v, tb, batch)] with batch_of); returns
    {q_pm: (t, est, est_rmin, n)} plus the kept tuple set."""
    import hashlib

    def bucket(tb):
        h = hashlib.md5(str(tb).encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % partitions

    parts = {}
    for r in rows:
        v, tb = r[0], r[1]
        tag = batch_of(r) if batch_of else ""
        parts.setdefault(f"{tag}|{bucket(tb)}", []).append((v, tb))
    kept = []
    for p, items in parts.items():
        items.sort()
        np_ = len(items)
        sp = max(1, np_ // err_div)
        prev = 0
        for i, (v, tb) in enumerate(items):
            r = i + 1
            if (r - 1) % sp == 0 or r == np_:
                kept.append((v, tb, p, r, r - prev))
                prev = r
    kept.sort(key=lambda k: (k[0], k[1]))
    n = sum(g for *_, g in kept)
    out = {}
    for q_pm in q_pms:
        t = (q_pm * n + 999) // 1000
        cum = 0
        best = None
        for v, tb, p, r, g in kept:
            cum += g
            key = (abs(cum - t), v, tb)
            if best is None or key < best[0]:
                best = (key, v, cum)
        out[q_pm] = (t, best[1], best[2], n)
    return out, set(kept)


def test_gk_quantile_sketch_matches_pure_python(spark):
    """agg_gk_quantile_sketch recomputed from first principles
    (hashlib md5 partitions, python sort, integer cumsum/selection):
    estimates, rmin, target ranks and the exact-rank envelope columns
    must match bit for bit — and every row must be within_eps."""
    li = _duck(
        "SELECT l_extendedprice, l_orderkey * 10 + l_linenumber"
        " FROM lineitem"
    )
    est, _ = _gk_python(li, (250, 500, 750, 900, 990))
    vs = sorted(v for v, _ in li)
    import bisect

    got = _rows("agg_gk_quantile_sketch", spark)
    assert len(got) == 5
    for quantile, t, e, rmin, rank_lo, rank_le, n, within in got:
        q_pm = round(quantile * 1000)
        pt, pe, prmin, pn = est[q_pm]
        assert (t, e, rmin, n) == (pt, pe, prmin, pn)
        assert rank_lo == bisect.bisect_left(vs, e) + 1
        assert rank_le == bisect.bisect_right(vs, e)
        eps_n = 2 * n // 100
        assert rank_lo - t <= eps_n and t - rank_le <= eps_n
        assert within == 1


def test_gk_merge_rollup_and_union_merge_equals_refined(spark):
    """Mergeability pins: (1) the one-pass batch_col build is
    bit-identical to building each batch's summary separately and
    UNIONING the frames (the merge operation — frame equality); (2)
    the merged-summary estimates in agg_gk_merge_rollup stay inside
    the eps*n envelope (merging never degrades the guarantee), as do
    the direct arm's."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.sketches import gk_summary

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    vals = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        "l_returnflag",
    )
    one_pass = gk_summary(
        vals, "v", "tb", partitions=8, batch_col="l_returnflag"
    )
    unioned = None
    for rf in [r[0] for r in vals.select("l_returnflag").distinct().collect()]:
        s = gk_summary(
            vals.filter(F.col("l_returnflag") == rf),
            "v",
            "tb",
            partitions=8,
            batch=rf,
        )
        unioned = s if unioned is None else unioned.unionByName(s)
    a = sorted(map(tuple, one_pass.collect()))
    b = sorted(map(tuple, unioned.collect()))
    assert a == b and a  # union-merge == refined one-pass, bit for bit

    rows = _rows("agg_gk_merge_rollup", spark)
    assert len(rows) == 5
    for quantile, t, em, ed, mw, dw, n in rows:
        assert mw == 1 and dw == 1


def test_gk_grouped_quantiles_consistent_with_per_group_runs(spark):
    """The grouped estimator must answer each group EXACTLY as a
    standalone sketch over that group's rows (same partitions/eps):
    grouping is pure bookkeeping, not an approximation change — plus
    every registry row is within its per-group envelope."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.sketches import (
        gk_grouped_quantile_estimates,
        gk_quantile_estimates,
        gk_summary,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    vals = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        "l_returnflag",
    )
    grouped = {
        (r["grp"], r["q_pm"]): (r["target_rank"], r["est"], r["est_rmin"], r["n"])
        for r in gk_grouped_quantile_estimates(
            gk_summary(
                vals, "v", "tb", partitions=8,
                batch_col="l_returnflag",
            ),
            (500, 900),
        ).collect()
    }
    for rf in [r[0] for r in vals.select("l_returnflag").distinct().collect()]:
        solo = {
            r["q_pm"]: (r["target_rank"], r["est"], r["est_rmin"], r["n"])
            for r in gk_quantile_estimates(
                gk_summary(
                    vals.filter(F.col("l_returnflag") == rf),
                    "v", "tb", partitions=8, batch=rf,
                ),
                (500, 900),
            ).collect()
        }
        for q in (500, 900):
            assert grouped[(rf, q)] == solo[q], (rf, q)

    rows = _rows("agg_gk_grouped_quantiles", spark)
    assert len(rows) == 6  # 3 returnflags x 2 quantiles
    assert all(r[-1] == 1 for r in rows)  # within_eps everywhere


def test_gk_weighted_quantile_sketch_matches_pure_python(spark):
    """agg_gk_weighted_quantile_sketch recomputed from first
    principles (md5 partitions, python sort, running-weight boundary
    crossings, integer mass targets): estimates, rmin, targets and
    weighted envelope columns bit-for-bit; every row within_eps."""
    import hashlib

    li = _duck(
        "SELECT l_extendedprice, CAST(l_quantity AS BIGINT),"
        " l_orderkey * 10 + l_linenumber FROM lineitem"
    )
    parts: dict = {}
    for v, w, tb in li:
        h = hashlib.md5(str(tb).encode()).hexdigest()
        p = (int(h[0], 16) * 16 + int(h[1], 16)) % 32
        parts.setdefault(p, []).append((v, tb, w))
    kept = []
    for p, items in parts.items():
        items.sort()
        wp = sum(w for *_, w in items)
        sp = max(1, wp // 100)
        cum = prev_kept = 0
        for i, (v, tb, w) in enumerate(items):
            cum += w
            if (cum // sp) > ((cum - w) // sp) or cum == wp:
                kept.append((v, tb, cum - prev_kept))
                prev_kept = cum
    kept.sort(key=lambda k: (k[0], k[1]))
    W = sum(g for *_, g in kept)
    expect = {}
    for q_pm in (250, 500, 750, 900, 990):
        t = (q_pm * W + 999) // 1000
        cum = 0
        best = None
        for v, tb, g in kept:
            cum += g
            key = (abs(cum - t), v, tb)
            if best is None or key < best[0]:
                best = (key, v, cum)
        expect[q_pm] = (t, best[1], best[2], W)

    got = _rows("agg_gk_weighted_quantile_sketch", spark)
    assert len(got) == 5
    mass_lt: dict = {}
    mass_le: dict = {}
    for quantile, t, e, rmin, rank_lo, rank_le, w_total, within in got:
        q_pm = round(quantile * 1000)
        assert (t, e, rmin, w_total) == expect[q_pm]
        lt = sum(w for v, w, _ in li if v < e)
        le = sum(w for v, w, _ in li if v <= e)
        assert (rank_lo, rank_le) == (lt + 1, le)
        eps_w = 2 * w_total // 100
        assert rank_lo - t <= eps_w and t - rank_le <= eps_w
        assert within == 1


def test_hll_sliding_distinct_accuracy(spark):
    """Per-window HLL estimates track the exact trailing distinct
    count within the 64-register error regime (mean relative error
    well under the ~13% theoretical sigma; estimates positive and
    windows complete — one row per distinct event hour)."""
    rows = _rows("events_hll_sliding_distinct", spark)
    assert rows
    errs = [abs(e - x) / max(x, 1) for _, e, x in rows]
    assert sum(errs) / len(errs) < 0.13
    assert all(e > 0 for _, e, _ in rows)
    hours = _duck(
        "SELECT COUNT(DISTINCT date_trunc('hour', ts)) FROM events"
    )[0][0]
    assert len(rows) == hours


def test_quality_classifier_learns_and_calibrates(spark):
    """The trained quality filter must actually LEARN: accuracy on the
    distillation labels beats the majority-class baseline by a wide
    margin, the confusion matrix covers the corpus exactly once, and
    the per-cell mean probabilities are rank-consistent with the
    predicted class (predicted-positive cells score above
    predicted-negative ones within each true label)."""
    rows = _rows("quality_classifier_apply", spark)
    total = sum(n for _, _, n, _ in rows)
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    assert total == n_docs
    correct = sum(n for y, p, n, _ in rows if y == p)
    pos = sum(n for y, _, n, _ in rows if y == 1)
    majority = max(pos, total - pos) / total
    assert correct / total >= majority + 0.10
    assert correct / total >= 0.90
    mp = {(y, p): m for y, p, _, m in rows}
    for y in (0, 1):
        if (y, 0) in mp and (y, 1) in mp:
            assert mp[(y, 1)] > mp[(y, 0)]
    # the trained weight vector is feature-dim-bounded and non-trivial
    w = _rows("quality_classifier_train", spark)
    assert len(w) == 34
    assert any(v != 0 for _, v in w)
