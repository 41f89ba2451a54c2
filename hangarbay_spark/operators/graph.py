"""Iterative graph algorithms as distributed join-agg loops.

Companion of the connected-components min-label propagation in
operators/dedup.py. Every iteration is one hash join of the edge list
against the current per-node vector plus one aggregation shuffled on
the same node key; edge/degree frames are built once and
localCheckpoint'd so no iteration re-derives them, and rank vectors
stay distributed — the only driver-side scalar is the node count.

Float discipline (queries/base.py): the per-edge contribution
rank/deg is a single IEEE divide (identical inputs give identical
doubles on any engine), the per-node sum accumulates in
DECIMAL(30,15) (order-independent), and each iteration rounds at
12 dp as the FMA-contraction guard — so a fixed iteration count is
exactly reproducible cross-engine (see the unrolled-CTE oracle of
queries/analytics.py:graph_pagerank_copurchase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def loop_partitions(n_rows: int, spark) -> int:
    """Partition count for a pinned iterative loop: ~300k edge rows per
    partition, capped by the session shuffle-partition count. With AQE
    scoped off inside the loops (its coalescing breaks checkpoint
    partitioning reuse — see :func:`pagerank`), this plays AQE's role
    ONCE up front from the materialized edge count: cluster-scale
    graphs get the full configured width, small graphs don't pay
    hundreds of near-empty tasks per round (measured 7.7 s -> 5.2 s
    for the 10-iteration sf0.1 PageRank loop at 2.4M edges)."""
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return max(1, min(conf_p, n_rows // 300_000 + 1))


# Rank/label vectors carry one row per node; up to ~2M nodes such a
# frame broadcasts (tens of MB), and AQE's runtime broadcast of it
# beats the pinned sort-merge loop outright (the edge side is never
# shuffled OR sorted per round). The pinned AQE-off loop is for graphs
# whose node vector cannot broadcast — there, re-shuffling the full
# edge set every round is the dominant cost (measured 3 exchanges/
# iteration) and checkpoint-partitioning reuse removes it. sf1
# evidence: 24M-edge / 200k-node PageRank ran 2x FASTER adaptive than
# pinned, so the switch keys on NODE count, not edge count.
PIN_NODES = 2_000_000

# Edge frames built by explode pipelines carry a TINY origin size
# estimate through localCheckpoint (Catalyst does not scale explode
# output), so the planner happily broadcasts them. Up to this many
# edge rows that accidental choice is also the RIGHT one — the static
# edge broadcast is built once and reused by every loop iteration
# (measured faster than re-broadcasting the changing node vector each
# round at sf0.1). Beyond it, callers must hint the node-side frame
# instead (guide §3.1): a forced broadcast of a cluster-scale edge
# frame would hit the 8 GB relation cap / driver OOM.
BCAST_EDGES = 8_000_000


# Below this many (distinct) edge rows the power-iteration loop is
# replaced by ONE Arrow task replaying all iterations over the
# checkpointed edge list (the CC_KERNEL_MAX_EDGES regime-switch
# discipline, operators/dedup.py): the loop pays ~2 jobs of stage
# latency per round even on a vocab-sized graph (TextRank: 31 nodes /
# 930 edges x 10 rounds ≈ 3 s of scheduling), while the kernel
# replays the float discipline bit-identically — rank/deg is the same
# IEEE divide, the decimal(30,15) accumulation is Decimal(repr(c))
# quantized HALF_UP (Spark's double→decimal cast goes through
# BigDecimal.valueOf = shortest repr, the tests/test_estimators _r6
# finding), sums are exact, and the 12 dp iteration round uses the
# identical shortest-repr HALF_UP path (queries/events.py:5653
# precedent). Equivalence is pinned by a full-rank-vector test.
#
# The kernel's per-iteration work is vectorized (r10 resume): the
# per-edge contribution rank[src]/deg[src] depends only on SRC, so
# the Decimal quantization runs once per NODE and the per-dst sums
# are two-limb int64 scatter-adds over the edge arrays — an exact-
# arithmetic identity with the per-edge Decimal fold (sums of equal
# decimals), ~25 ns/edge/iteration instead of ~µs. That moves the
# kernel/loop crossover well past the old 100k bound: at 2.4M edges
# x 10 rounds the kernel replays in ~2 s on one core while the
# distributed loop pays ~0.5 s of stage latency per round ON TOP of
# its scan+shuffle (sf0.1 A/B: 7.5 -> 2.6 s for the loop phase). The
# bound stays row-count-derived, NOT a local[32] constant: 4M edge
# rows x 3 int64 cols ≈ 100 MB in one task, and the sf1 24M-edge
# graph (where the adaptive distributed loop measured 2x faster than
# any pinned alternative) stays distributed.
PAGERANK_KERNEL_MAX_EDGES = 4_000_000


def _replay_quantize_scaled(vals, scale: int):
    """Vectorized exact replay of
    ``int(Decimal(repr(float(v))).quantize(1e-scale, HALF_UP)
    .scaleb(scale))`` over a float64 array.

    Fast path: ``floor(v * 10^scale + 0.5)`` — exact whenever the
    scaled value sits farther from a half-up boundary than the
    accumulated float error (one multiplication rounding + the
    shortest-repr gap, both O(ulp); margin 16 ulp).  Boundary-adjacent,
    negative or non-finite elements fall back to the per-element
    Decimal path, so the result is bit-identical to the scalar loop it
    replaces by case analysis (HALF_UP on nonnegative v ==
    floor(x + 0.5), ties included — ties are always inside the margin
    and routed to Decimal).  This removes the per-node Python/Decimal
    loops that dominated the PageRank replay kernel (ADVICE r10: 2*nn
    Decimal ops per round; measured ~3 s of the sf0.1 co-purchase
    kernel's single task)."""
    import numpy as np

    x = vals * float(10.0 ** scale)
    half = x + 0.5
    n0 = np.floor(half)
    fr = half - n0
    eps = 16.0 * np.spacing(np.maximum(np.abs(x), 1.0))
    unsafe = (
        ~np.isfinite(x) | (vals < 0) | (fr <= eps) | (fr >= 1.0 - eps)
    )
    out = np.where(unsafe, 0.0, n0).astype(np.int64)
    if unsafe.any():
        from decimal import ROUND_HALF_UP, Decimal

        qd = Decimal(1).scaleb(-scale)
        for i in np.nonzero(unsafe)[0]:
            out[i] = int(
                Decimal(repr(float(vals[i])))
                .quantize(qd, ROUND_HALF_UP)
                .scaleb(scale)
            )
    return out


def _pagerank_kernel(
    ed: DataFrame, iters: int, damping: float, symmetric: bool
) -> DataFrame:
    """Single-task bit-identical replay of :func:`_pagerank_loop` for
    broadcast-scale graphs: input = the checkpointed distinct
    (src, dst) frame — out-degrees are recomputed in-kernel (identical
    bincount integers), so the loop path's deg window never runs here.
    Vectorized: per-NODE Decimal quantization (the contribution
    is constant across a src's out-edges) + exact two-limb int64
    scatter-add per dst; finishing math per node is byte-for-byte the
    loop's float discipline."""
    node_type = ed.schema["src"].dataType.simpleString()
    out_schema = f"node {node_type}, rank double"

    def kernel(batches):
        from decimal import Decimal

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        srcs, dsts = [], []
        node_pa_type = None
        for rb in batches:
            node_pa_type = rb.schema.field(0).type
            srcs.append(rb.column(0).to_numpy(zero_copy_only=False))
            dsts.append(rb.column(1).to_numpy(zero_copy_only=False))
        if not srcs or sum(len(a) for a in srcs) == 0:
            return  # zero batches == empty result
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        # Node universe = distinct srcs (sorted) == the loop's
        # nodes-frame; hash-based pd.unique + get_indexer instead of
        # np.unique(return_inverse)/searchsorted — the sort-based
        # inverse measured ~10x the hash path at 2.4M edges.
        nodes = np.sort(pd.unique(src))
        nn = len(nodes)
        ix = pd.Index(nodes)
        src_idx = ix.get_indexer(src)
        # dst values outside the node universe (general graphs only:
        # a sink that never occurs as src; get_indexer yields -1)
        # collect into a discard bucket at index nn — the loop's
        # inner join drops them too.
        dst_idx = ix.get_indexer(dst)
        dst_idx = np.where(dst_idx < 0, nn, dst_idx)
        # Out-degree per node: exact integer edge count per src over
        # the same distinct edge set the checkpointed frame's window
        # count saw — identical bigints, so rank/deg divides the
        # identical doubles.
        node_deg = np.bincount(
            src_idx, minlength=nn
        ).astype(np.float64)
        n = float(nn)
        jump = 1.0 - damping
        rank = np.full(nn, 1.0 / n)
        # Pre-sort the edge arrays by dst ONCE so each iteration's
        # per-dst sums run as contiguous np.add.reduceat segments —
        # np.add.at's scattered atomics measured ~0.5 s/iteration at
        # 2.4M edges (the dominant kernel cost), reduceat is ~10 ms
        # for the identical exact integer sums.
        order = np.argsort(dst_idx)
        src_idx_s = src_idx[order]
        dst_sorted = dst_idx[order]
        starts = np.flatnonzero(
            np.r_[True, dst_sorted[1:] != dst_sorted[:-1]]
        )
        group_dst = dst_sorted[starts]
        # In the symmetric regime every node also occurs as dst; in
        # the general regime nodes with no in-edges still get the
        # teleport term (sum = 0), matching the loop's left join.
        for _ in range(iters):
            # c = rank/deg: one IEEE float64 divide per NODE —
            # identical to the loop's per-edge divide because both
            # operands are constant across a src's out-edges.
            c = rank / node_deg
            q = _replay_quantize_scaled(c, 15)
            # Exact decimal(30,15) sums per dst: scaled-integer
            # segment sums in two 32-bit limbs (q < 2^50, so per-dst
            # limb sums stay far inside int64 up to ~2^13 M edges).
            qe = q[src_idx_s]
            acc_hi = np.zeros(nn + 1, dtype=np.int64)
            acc_lo = np.zeros(nn + 1, dtype=np.int64)
            acc_hi[group_dst] = np.add.reduceat(qe >> 32, starts)
            acc_lo[group_dst] = np.add.reduceat(
                qe & 0xFFFFFFFF, starts
            )
            # Per-dst sums: rank mass totals ~1, so the scaled sums
            # stay < 2^53 and float64(s)/1e15 is the SAME correctly-
            # rounded value as float(Decimal(s).scaleb(-15)); any
            # larger sum (impossible for a stochastic rank vector, but
            # guarded) takes the exact Decimal conversion.
            s = (acc_hi[:nn] << np.int64(32)) + acc_lo[:nn]
            sv = s.astype(np.float64) / 1e15
            big = s >= np.int64(1) << np.int64(53)
            if big.any():
                for i in np.nonzero(big)[0]:
                    sv[i] = float(Decimal(int(s[i])).scaleb(-15))
            # jump/n + damping*sv: elementwise IEEE doubles — the same
            # op sequence the scalar loop ran per node; the 12 dp
            # iteration round replays vectorized (Decimal only at
            # half-up boundaries), and k/1e12 is the correctly-rounded
            # double of the quantized decimal (k < 2^53, 1e12 exact).
            v = jump / n + damping * sv
            rank = _replay_quantize_scaled(v, 12).astype(
                np.float64
            ) / 1e12
        yield pa.RecordBatch.from_pandas(
            pd.DataFrame({"node": nodes, "rank": rank}),
            schema=pa.schema(
                [
                    pa.field("node", node_pa_type),
                    pa.field("rank", pa.float64()),
                ]
            ),
        )

    # Arrow-native, (src, dst) only (guide §4.1 — pass only the
    # columns the function needs; degrees never cross the boundary).
    return ed.select("src", "dst").coalesce(1).mapInArrow(
        kernel, out_schema
    )


# HITS replay bound (same discipline as PAGERANK_KERNEL_MAX_EDGES:
# row-count-derived, not a local[32] constant). Equivalence with the
# decimal(38,0) loop is PROVABLE under the bound: with h0 = 1 every
# score is a positive integer, each half-step multiplies the max by
# at most E (max h1 <= E, a2 <= E^2, h2 <= E^3, a3 <= E^4) — so at
# iters=3 the final authorities are <= (4M)^4 < 2.6e26, far inside
# decimal(38,0)'s 1e38: neither engine saturates and exact integer
# replay == the loop on any graph the kernel accepts.
HITS_KERNEL_MAX_EDGES = 4_000_000


def hits_authority_kernel(e: DataFrame, iters: int) -> DataFrame:
    """Single-task bit-identical replay of the HITS power iteration
    (queries/analytics.graph_hits_authorities) over a SMALL distinct
    bipartite edge list ``(c, p)``: h0 = 1, a_k(p) = sum of h_{k-1}
    over in-edges, h_k(c) = sum of a_k over out-edges — all EXACT
    integers, like the loop's decimal(38,0) sums (see
    HITS_KERNEL_MAX_EDGES for the no-saturation proof). Fast path is
    an int64 scatter-add per half-step, guarded by the exact
    pre-check max(value) * max(degree) < 2^63 (degree bounds the
    number of addends per output, so no partial sum can exceed the
    product); arbitrary-precision Python-int (object dtype) fallback
    keeps the replay exact for adversarial degree distributions.
    Output ``(p, a)`` with ``a`` as decimal(38,0) — the caller's
    cast-to-double runs in the JVM exactly as the loop's."""
    p_type = e.schema["p"].dataType.simpleString()
    out_schema = f"p {p_type}, a decimal(38,0)"

    def kernel(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        cs_l, ps_l = [], []
        p_pa_type = None
        for rb in batches:
            p_pa_type = rb.schema.field(1).type
            cs_l.append(rb.column(0).to_numpy(zero_copy_only=False))
            ps_l.append(rb.column(1).to_numpy(zero_copy_only=False))
        if not cs_l or sum(len(a) for a in cs_l) == 0:
            return  # zero batches == empty result
        c = np.concatenate(cs_l)
        p = np.concatenate(ps_l)
        cu = pd.unique(c)  # hub universe (order irrelevant)
        pu = np.sort(pd.unique(p))  # deterministic output order
        ci = pd.Index(cu).get_indexer(c)
        pi = pd.Index(pu).get_indexer(p)
        # max degree on either side bounds the addend count of every
        # per-node sum — the exact overflow guard's multiplier.
        dmax = int(
            max(
                np.bincount(ci, minlength=len(cu)).max(),
                np.bincount(pi, minlength=len(pu)).max(),
            )
        )

        def half_step(vals, src_idx, dst_idx, n_out):
            # vals: per-source scores (int64 or object). Sums are
            # exact on the int64 path because every output receives
            # <= dmax addends each <= max(vals).
            if (
                vals.dtype == np.int64
                and int(vals.max()) * dmax < 2**63
            ):
                out = np.zeros(n_out, dtype=np.int64)
            else:
                vals = vals.astype(object)
                out = np.zeros(n_out, dtype=object)
            np.add.at(out, dst_idx, vals[src_idx])
            return out

        h = np.ones(len(cu), dtype=np.int64)
        a = None
        for k in range(1, iters + 1):
            a = half_step(h, ci, pi, len(pu))
            if k < iters:
                h = half_step(a, pi, ci, len(cu))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(pu, type=p_pa_type),
                pa.array(
                    [int(v) for v in a], type=pa.decimal128(38, 0)
                ),
            ],
            names=["p", "a"],
        )

    return e.select("c", "p").coalesce(1).mapInArrow(kernel, out_schema)


# Shared edge-count guard for the query-side small-graph loop kernels
# below (PPR / LPA / path-load centrality): same regime-switch
# discipline as PAGERANK_KERNEL_MAX_EDGES — tiny graphs replay the
# whole iteration schedule in one Arrow task; cluster-scale graphs
# keep the distributed per-round loops.
LOOP_KERNEL_MAX_EDGES = 100_000


def _node_schema(und: DataFrame, val: str) -> str:
    return f"node {und.schema['src'].dataType.simpleString()}, {val}"


def ppr_ranks_kernel(
    und: DataFrame, n_seeds: int, iters: int
) -> DataFrame:
    """Single-task bit-identical replay of the personalized-PageRank
    loop (queries/analytics.graph_personalized_pagerank) over a SMALL
    checkpointed symmetric edge list: seeds = the ``n_seeds`` smallest
    node ids, teleport 0.15/ns to seeds only, damping 0.85, the same
    IEEE divide / decimal(30,15) HALF_UP accumulation / 12 dp
    iteration round as :func:`_pagerank_kernel`."""
    import pandas as pd

    out_schema = _node_schema(und, "rank double")

    def kernel(batches):
        from decimal import ROUND_HALF_UP, Decimal

        q15, q12 = Decimal("1e-15"), Decimal("1e-12")
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        if not edges_l:
            yield pd.DataFrame({"node": [], "rank": []})
            return
        deg: dict = {}
        for s, _ in edges_l:
            deg[s] = deg.get(s, 0) + 1
        seeds = set(sorted(deg)[:n_seeds])
        ns = float(len(seeds))
        rank = {
            v: (1.0 / ns if v in seeds else 0.0) for v in deg
        }
        for _ in range(iters):
            msum: dict = {}
            for s, d in edges_l:
                c = rank[s] / float(deg[s])
                msum[d] = msum.get(d, Decimal(0)) + Decimal(
                    repr(c)
                ).quantize(q15, ROUND_HALF_UP)
            rank = {
                d: float(
                    Decimal(
                        repr(
                            (0.15 / ns if d in seeds else 0.0)
                            + 0.85 * float(sv)
                        )
                    ).quantize(q12, ROUND_HALF_UP)
                )
                for d, sv in msum.items()
            }
        yield pd.DataFrame(
            {"node": list(rank), "rank": [rank[v] for v in rank]}
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def lpa_labels_kernel(und: DataFrame, iters: int) -> DataFrame:
    """Single-task replay of synchronous label propagation over a
    SMALL symmetric edge list: each round every node adopts its
    neighborhood's most frequent label (count-desc, label-asc
    tie-break) — exact integer counts, so identity with the
    distributed loop is by arithmetic."""
    import pandas as pd

    t = und.schema["src"].dataType.simpleString()
    out_schema = f"node {t}, label {t}"

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        if not edges_l:
            yield pd.DataFrame({"node": [], "label": []})
            return
        nodes = {s for s, _ in edges_l}
        lab = {v: v for v in nodes}
        for _ in range(iters):
            cnt: dict = {}
            for s, d in edges_l:
                key = (s, lab[d])
                cnt[key] = cnt.get(key, 0) + 1
            best: dict = {}
            for (node, label), c in cnt.items():
                cur = best.get(node)
                if cur is None or (-c, label) < cur[0]:
                    best[node] = ((-c, label), label)
            lab = {node: v[1] for node, v in best.items()}
        yield pd.DataFrame(
            {"node": list(lab), "label": [lab[v] for v in lab]}
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def plc_kernel(und: DataFrame, n_seeds: int, hops: int) -> DataFrame:
    """Single-task replay of the bounded-hop path-load centrality
    sweeps (queries/analytics.graph_path_load_centrality): multi-seed
    BFS with path counts sigma forward, tail counts c backward,
    load(v) = sum over levels 1..hops of sigma*c — exact integers
    throughout."""
    import pandas as pd

    out_schema = _node_schema(und, "path_load bigint")

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        if not edges_l:
            yield pd.DataFrame({"node": [], "path_load": []})
            return
        nodes = sorted({s for s, _ in edges_l})
        seeds = nodes[:n_seeds]
        levels = [{(sd, sd): 1 for sd in seeds}]  # (seed, node) -> sigma
        visited = set(levels[0])
        for _ in range(hops):
            nxt: dict = {}
            prev = levels[-1]
            for s, d in edges_l:
                for sd in seeds:
                    sg = prev.get((sd, s))
                    if sg is not None and (sd, d) not in visited:
                        nxt[(sd, d)] = nxt.get((sd, d), 0) + sg
            levels.append(nxt)
            visited |= set(nxt)
        tail_for = {hops: {k: 1 for k in levels[hops]}}
        c = tail_for[hops]
        for k in range(hops - 1, -1, -1):
            contrib: dict = {}
            for s, d in edges_l:
                for sd in seeds:
                    cv = c.get((sd, d))
                    if cv is not None:
                        contrib[(sd, s)] = contrib.get((sd, s), 0) + cv
            c = {
                k2: 1 + contrib.get(k2, 0) for k2 in levels[k]
            }
            tail_for[k] = c
        load: dict = {}
        for k in range(1, hops + 1):
            tf = tail_for[k]
            for (sd, node), sg in levels[k].items():
                load[node] = load.get(node, 0) + sg * tf[(sd, node)]
        yield pd.DataFrame(
            {
                "node": list(load),
                "path_load": [load[v] for v in load],
            }
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def bfs_dist_kernel(
    und: DataFrame, n_seeds: int, hops: int
) -> DataFrame:
    """Single-task replay of the bounded multi-source BFS
    (queries/analytics.graph_bfs_hops): seeds = the ``n_seeds``
    smallest node ids sharing ONE visited set, dist = first hop
    reached — exact integers."""
    import pandas as pd

    out_schema = _node_schema(und, "dist int")

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        if not edges_l:
            yield pd.DataFrame({"node": [], "dist": []})
            return
        nodes = sorted({s for s, _ in edges_l})
        dist = {v: 0 for v in nodes[:n_seeds]}
        frontier = set(dist)
        for k in range(1, hops + 1):
            nxt = {
                d
                for s, d in edges_l
                if s in frontier and d not in dist
            }
            for d in nxt:
                dist[d] = k
            frontier = nxt
        yield pd.DataFrame(
            {"node": list(dist), "dist": [dist[v] for v in dist]}
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def sssp_dist_kernel(
    und: DataFrame, n_seeds: int, rounds: int
) -> DataFrame:
    """Single-task replay of the bounded Bellman-Ford relaxation
    (queries/analytics.graph_weighted_sssp) over a SMALL weighted
    symmetric edge list (src, dst, w): per round
    dist = min(carry, one-edge relax) — exact integers."""
    import pandas as pd

    out_schema = _node_schema(und, "dist bigint")

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(
                zip(pdf["src"], pdf["dst"], (int(w) for w in pdf["w"]))
            )
        if not edges_l:
            yield pd.DataFrame({"node": [], "dist": []})
            return
        nodes = sorted({s for s, _, _ in edges_l})
        dist = {v: 0 for v in nodes[:n_seeds]}
        for _ in range(rounds):
            new = dict(dist)
            for s, d, w in edges_l:
                dv = dist.get(s)
                if dv is not None:
                    cand = dv + w
                    cur = new.get(d)
                    if cur is None or cand < cur:
                        new[d] = cand
            dist = new
        yield pd.DataFrame(
            {"node": list(dist), "dist": [dist[v] for v in dist]}
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    symmetric: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Nodes are the distinct ``src`` values — callers whose graphs have
    sinks (nodes with no out-edges) should symmetrize or add self
    loops first; with every node having out-degree >= 1 no dangling
    mass is lost and ranks sum to 1. Nodes with no IN-edges keep the
    teleport mass (1-d)/n. Returns ``(node, rank)`` with rank rounded
    at 12 dp per iteration.

    ``symmetric=True`` declares every node has at least one IN-edge
    (true for any symmetrized/undirected graph, e.g. co-occurrence):
    the per-iteration "re-attach zero-in-degree nodes" left join is
    then provably a no-op and is skipped, so each iteration is exactly
    one hash join + one aggregation. The edge frame is additionally
    checkpointed pre-partitioned on ``src`` — the aggregation output
    is already hash-partitioned on the node key, so the join needs no
    new exchange: ONE shuffle per iteration, the floor for
    message-passing on a cluster.

    Loop planning regime is chosen by NODE count (see ``PIN_NODES``):
    while the rank vector broadcasts, adaptive planning runs the loop
    best (AQE broadcast-joins ranks; the edge set is never shuffled or
    sorted per round). Beyond that, AQE is scoped OFF for the loop:
    under AQE the checkpointed RDDs report UnknownPartitioning (the
    adaptive plan's partitioning is only known post-execution), which
    silently re-shuffles the FULL edge set every iteration — measured
    3 exchanges/iteration with AQE on vs the pinned 1 with it off
    (tests/test_plans.py::test_pagerank_iteration_single_shuffle).
    The prior setting is restored before returning.
    """
    from pyspark.sql.window import Window

    spark = edges.sparkSession
    # One-time edge build under the adaptive planner (keeps AQE's
    # runtime broadcast conversion for the caller's derivation joins
    # and the distinct's map-side dedup of the raw duplicate stream).
    # The distinct edge set is checkpointed and counted BEFORE the
    # out-degree window: the replay kernel recomputes degrees
    # in-kernel (identical bincount integers), so on the kernel path
    # the window's shuffle+sort never runs at all (sf0.1 A/B: the
    # window+repartition+checkpoint pass costs ~2.7 s warm on the
    # 2.4M-edge copurchase graph — ~40% of the query). The loop path
    # pays one extra edge-list materialization for it, a single
    # linear pass that is noise against 10+ join/agg rounds.
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    # Regime switch on EDGE count (see PAGERANK_KERNEL_MAX_EDGES):
    # broadcast-scale graphs replay all iterations in one Arrow task;
    # counting the materialized checkpoint is ~free.
    if e.count() <= PAGERANK_KERNEL_MAX_EDGES:
        return _pagerank_kernel(e, iters, damping, symmetric)
    ed = e.withColumn(
        "deg",
        F.count(F.lit(1)).over(Window.partitionBy("src")).cast("bigint"),
    )
    if symmetric:
        p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        ed = ed.repartition(p, "src")
    ed = ed.localCheckpoint(eager=True)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # the loop needs N anyway — the regime test is free
    if n <= PIN_NODES:
        # The rank vector broadcasts: adaptive planning runs the loop
        # best (AQE broadcast-joins ranks against the never-shuffled
        # checkpointed edges). See PIN_NODES. The broadcast side is
        # HINTED, not left to size estimates: localCheckpoint carries
        # the ORIGIN plan's sizeInBytes, and an explode-derived edge
        # build estimates tiny (Catalyst does not scale explode
        # output), so the planner would otherwise broadcast the FULL
        # edge frame every iteration — one driver collect + rebroadcast
        # of millions of edge rows per round (measured 3-4x the whole
        # loop). The gate n <= PIN_NODES is exactly the proof that
        # ranks is the side that fits (guide §3.1: pick the strategy
        # deliberately; estimates are often badly wrong).
        return _pagerank_loop(
            ed, nodes, n, iters, damping, symmetric, broadcast_ranks=True
        )
    # Node vector too big to broadcast: re-pin the already-materialized
    # edge frame (ONE exchange from memory) under AQE-off so the
    # loop's checkpoints preserve its partitioning and no iteration
    # re-shuffles the full edge set.
    prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = loop_partitions(ed.count(), spark)
        ed2 = (
            ed.repartition(p, "src")
            .sortWithinPartitions("src")
            .localCheckpoint(eager=True)
        )
        return _pagerank_loop(ed2, nodes, n, iters, damping, symmetric)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def _pagerank_loop(
    ed: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iters: int,
    damping: float,
    symmetric: bool,
    broadcast_ranks: bool = False,
) -> DataFrame:
    n = float(n_nodes)
    jump = 1.0 - damping
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("rank"))
    for _ in range(iters):
        r_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = ed.join(
            r_side, ed["src"] == r_side["node"]
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).cast("decimal(30,15)").alias("c"),
        )
        sums = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("s")
        )
        if symmetric:
            ranks = sums.select(
                "node",
                F.round(
                    F.lit(jump) / F.lit(n) + F.lit(damping) * F.col("s"),
                    12,
                ).alias("rank"),
            ).localCheckpoint(eager=False)
        else:
            ranks = (
                nodes.join(sums, "node", "left")
                .select(
                    "node",
                    F.round(
                        F.lit(jump) / F.lit(n)
                        + F.lit(damping) * F.coalesce("s", F.lit(0.0)),
                        12,
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks


def ktruss_rounds_kernel(
    e: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Single-task replay of the k-truss peel rounds
    (queries/analytics.graph_ktruss_edges) over a SMALL oriented
    (src < dst) edge list: per round keep edges in >= k-2 triangles of
    the survivor graph (support = |adj(u) ∩ adj(v)| over the
    symmetrized adjacency); emits per-round (n_edges, n_src) for
    rounds 0..rounds — exact integers."""
    import pandas as pd

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        cur = edges_l
        stats = [
            (0, len(cur), len({s for s, _ in cur}))
        ]
        for r in range(1, rounds + 1):
            adj: dict = {}
            for s, d in cur:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
            cur = [
                (u, v)
                for u, v in cur
                if len(adj[u] & adj[v]) >= k - 2
            ]
            stats.append((r, len(cur), len({s for s, _ in cur})))
        yield pd.DataFrame(
            {
                "round": [s[0] for s in stats],
                "n_edges": [s[1] for s in stats],
                "n_src": [s[2] for s in stats],
            }
        )

    return e.coalesce(1).mapInPandas(
        kernel, "round bigint, n_edges bigint, n_src bigint"
    )


def _kcore_kernel(
    und: DataFrame, k: int, max_rounds: int
) -> DataFrame:
    """Single-task replay of the :func:`kcore` peel loop over a SMALL
    symmetric edge list — per round drop nodes of degree < k (and
    their edges) until the edge count is stable or ``max_rounds``;
    returns (node, core_deg)."""
    import pandas as pd

    out_schema = _node_schema(und, "core_deg bigint")

    def kernel(batches):
        edges_l: list = []
        for pdf in batches:
            edges_l.extend(zip(pdf["src"], pdf["dst"]))
        cur = edges_l
        for _ in range(max_rounds):
            deg: dict = {}
            for s, _d in cur:
                deg[s] = deg.get(s, 0) + 1
            keep = {v for v, dv in deg.items() if dv >= k}
            nxt = [(s, d) for s, d in cur if s in keep and d in keep]
            converged = len(nxt) == len(cur)
            cur = nxt
            if converged:
                break
        core: dict = {}
        for s, _d in cur:
            core[s] = core.get(s, 0) + 1
        yield pd.DataFrame(
            {"node": list(core), "core_deg": [core[v] for v in core]}
        )

    return und.coalesce(1).mapInPandas(kernel, out_schema)


def kcore(und: DataFrame, k: int = 3, max_rounds: int = 20) -> DataFrame:
    """k-core of an undirected graph given as a SYMMETRIC edge list
    (both directions present): iteratively remove nodes of degree < k
    (and their edges) until a fixed point, bounded at ``max_rounds``
    peel rounds (post-convergence rounds are identities, so the bound
    only matters for adversarial path-like graphs). Returns
    (node, core_deg) — each surviving node with its within-core
    degree. One degree aggregation + two semi-joins per round against
    the surviving-node set (broadcast-scale vs the edge list); the
    edge frame checkpoints once per round at loop-sized partitioning
    (the checkpointed RDD's partition count is every later round's
    parallelism — see loop_partitions)."""
    spark = und.sparkSession
    n_cur = und.count()
    # Regime switch on edge count (LOOP_KERNEL_MAX_EDGES): tiny graphs
    # replay the peel rounds in ONE Arrow task — exact integers
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops
    # via graph_kcore_membership).
    if n_cur <= LOOP_KERNEL_MAX_EDGES:
        return _kcore_kernel(und, k, max_rounds)
    p = loop_partitions(n_cur, spark)
    cur = und.repartition(p, "src").localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = (
            deg.filter(F.col("deg") >= k)
            .select("src")
            .localCheckpoint(eager=True)
        )
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .repartition(p, "src")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        converged = n_nxt == n_cur
        cur, n_cur = nxt, n_nxt
        if converged:
            break
    return cur.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_deg")
    )
