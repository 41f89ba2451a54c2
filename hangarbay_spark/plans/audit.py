"""Physical-plan audit: the 100 TB discipline checks as a reusable API.

The properties ``tests/test_plans.py`` pins for every registry query —
no cartesian products, no unbounded broadcast-nested-loop joins,
bounded exchange counts, predicate pushdown reaching the parquet scan —
are exactly the review a user should run on THEIR queries before
shipping them to a 1000-executor cluster. This module surfaces that
review as ``audit_dataframe`` / ``audit_query`` and the ``hangar
audit`` CLI command.

The audit reads the EXECUTED plan string (post-AQE), so what it counts
is what actually ran, not the static estimate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ScanInfo:
    location: str
    pushed_filters: str
    read_schema: str

    @property
    def n_columns(self) -> int:
        # ReadSchema: struct<a:bigint,b:string,...> — nested structs do
        # not appear in these tables, so a comma count is exact.
        inner = self.read_schema
        if inner in ("struct<>", ""):
            return 0
        return inner.count(",") + 1


@dataclass
class PlanAudit:
    name: str
    exchanges: int
    broadcast_exchanges: int
    shuffle_exchanges: int
    reused_exchanges: int
    has_cartesian: bool
    bnlj_count: int
    wholestage_spans: int
    scans: list[ScanInfo] = field(default_factory=list)
    findings: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        """No scale-hazard findings (informational notes excluded)."""
        return not any(f.startswith("HAZARD") for f in self.findings)

    def lines(self) -> list[str]:
        out = [
            f"query: {self.name}",
            f"exchanges: {self.exchanges} "
            f"(shuffle {self.shuffle_exchanges}, "
            f"broadcast {self.broadcast_exchanges}, "
            f"reused {self.reused_exchanges})",
            f"whole-stage codegen spans: {self.wholestage_spans}",
            f"scans: {len(self.scans)}",
        ]
        for s in self.scans:
            out.append(
                f"  - {s.location}: {s.n_columns} cols, "
                f"pushed={s.pushed_filters or '[]'}"
            )
        for f_ in self.findings:
            out.append(f_)
        out.append("verdict: " + ("OK" if self.ok else "HAZARDS FOUND"))
        return out


def audit_dataframe(
    df: DataFrame, name: str = "query", execute: bool = True
) -> PlanAudit:
    """Audit a DataFrame's executed physical plan for scale hazards.

    With ``execute=True`` (default) the frame is materialized first so
    AQE finalizes: exchange counts, codegen spans and join strategies
    are the ones that actually ran, not the static estimate.
    """
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the finalized AQE string appends the pre-execution tree under an
    # "== Initial Plan ==" header — audit only what actually ran
    plan = plan.split("== Initial Plan ==")[0]

    broadcast = plan.count("BroadcastExchange")
    reused = plan.count("ReusedExchange")
    # "Exchange " lines are shuffle exchanges; BroadcastExchange spells
    # its own operator name, so the two never double-count.
    # repartition(n)/rebalance print "Exchange RoundRobinPartitioning";
    # there is no "Exchange rebalance" spelling in plan strings
    shuffle = len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning"
            r"|SinglePartition|RoundRobinPartitioning)",
            plan,
        )
    )
    exchanges = plan.count("Exchange")  # every flavor, incl. reuse refs
    cartesian = "CartesianProduct" in plan
    bnlj = plan.count("BroadcastNestedLoopJoin")
    # whole-stage codegen stages appear as `*(n)` operator prefixes in
    # the finalized plan string
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))

    scans: list[ScanInfo] = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\][^\n]*", plan):
        line = m.group(0)
        # the leading bracketed output list is the pruned read set
        # (ReadSchema is char-truncated in toString); strip exprIds
        cols = [
            c.split("#")[0] for c in m.group(1).split(",") if c.strip()
        ]
        loc = ""
        lm = re.search(r"Location: [^\[]*\[([^\],]*)", line)
        if lm:
            loc = "/".join(lm.group(1).rsplit("/", 2)[-2:])
        pf = ""
        pm = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        if pm:
            pf = pm.group(1)
        scans.append(ScanInfo(loc, pf, ",".join(cols)))

    findings: list[str] = []
    if cartesian:
        findings.append(
            "HAZARD: CartesianProduct — quadratic row growth; at cluster "
            "scale this is a job-killer. Add an equi-join key or a "
            "candidate-generation step (binning/bucketing)."
        )
    if bnlj:
        findings.append(
            f"NOTE: {bnlj} BroadcastNestedLoopJoin(s) — acceptable only "
            "for bounded scalar/probe sides (1-row aggregates, fixed "
            "probe sets); a data-sized side here is a scale hazard."
        )
    for s in scans:
        if s.n_columns > 12:
            findings.append(
                f"NOTE: scan {s.location} reads {s.n_columns} columns — "
                "check column pruning if the query projects fewer."
            )
    return PlanAudit(
        name=name,
        exchanges=exchanges,
        broadcast_exchanges=broadcast,
        shuffle_exchanges=shuffle,
        reused_exchanges=reused,
        has_cartesian=cartesian,
        bnlj_count=bnlj,
        wholestage_spans=codegen,
        scans=scans,
        findings=findings,
    )


def audit_query(spark: SparkSession, name: str, sf_dir: str) -> PlanAudit:
    """Audit one registry query by name."""
    from hangarbay_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, sf_dir)
    return audit_dataframe(df, name=name)
