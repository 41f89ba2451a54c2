"""Publish stage: normalized Parquet -> queryable Spark catalog.

Spark-first rebuild of the reference publish pipeline
(/root/reference/pipelines/publish.py:18-232). The reference copies
Parquet into an embedded DuckDB file, materializes ``owners_summary``,
creates three inline lookup tables, two decode views, and six B-tree
indexes, then mirrors owners into SQLite for an FTS5 index. In Spark
the warehouse IS the engine: tables are registered as temp views over
Parquet (zero-copy, columnar, predicate-pushdown), the summary is
materialized once (one shuffle), views are Catalyst-inlined SQL, and
the index substitutes are physical layout (sorted single-file Parquet
for point-lookup keys) plus broadcast dims. The FTS5 substitute — a
token inverted index, the 100 TB-safe design — lives in
``hangarbay_spark.operators.fts``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Inline lookup tables. These are FAA-published code domains — data, not
# code (reference publish.py:75-149; FIXTURES.md §C says copy verbatim:
# they are part of the declared query surface).
# ---------------------------------------------------------------------------

STATUS_CODES: list[tuple[str, str]] = [
    ("V", "Valid"),
    ("M", "Valid - Manufacturer/Dealer"),
    ("T", "Valid - Trainee"),
    ("R", "Registration Pending"),
    ("N", "Non-Citizen Corp (flight hours not reported)"),
    ("E", "Revoked by Enforcement"),
    ("W", "Invalid/Ineffective"),
    ("D", "Expired Dealer"),
    ("A", "Triennial Form Mailed"),
    ("S", "Second Triennial Form Mailed"),
    ("X", "Enforcement Letter"),
    ("Z", "Permanent Reserved"),
    ("1", "Triennial Form Undeliverable"),
    ("2", "N-Number Assigned - Not Yet Registered"),
    ("3", "N-Number Assigned (Non Type Certificated) - Not Yet Registered"),
    ("4", "N-Number Assigned (Import) - Not Yet Registered"),
    ("5", "Reserved N-Number"),
    ("6", "Administratively Canceled"),
    ("7", "Sale Reported"),
    ("8", "Second Triennial Mailed - No Response"),
    ("9", "Registration Revoked"),
    ("10", "N-Number Assigned - Pending Cancellation"),
    ("11", "N-Number Assigned (Amateur) - Pending Cancellation"),
    ("12", "N-Number Assigned (Import) - Pending Cancellation"),
    ("13", "Registration Expired"),
    ("14", "First Notice for Re-Registration"),
    ("15", "Second Notice for Re-Registration"),
    ("16", "Registration Expired - Pending Cancellation"),
    ("17", "Sale Reported - Pending Cancellation"),
    ("18", "Sale Reported - Canceled"),
    ("19", "Registration Pending - Pending Cancellation"),
    ("20", "Registration Pending - Canceled"),
    ("21", "Revoked - Pending Cancellation"),
    ("22", "Revoked - Canceled"),
    ("23", "Expired Dealer - Pending Cancellation"),
    ("24", "Third Notice for Re-Registration"),
    ("25", "First Notice for Registration Renewal"),
    ("26", "Second Notice for Registration Renewal"),
    ("27", "Registration Expired"),
    ("28", "Third Notice for Registration Renewal"),
    ("29", "Registration Expired - Pending Cancellation"),
]

AIRWORTHINESS_CLASSES: list[tuple[str, str]] = [
    ("1", "Standard"),
    ("2", "Limited"),
    ("3", "Restricted"),
    ("4", "Experimental"),
    ("5", "Provisional"),
    ("6", "Multiple"),
    ("7", "Primary"),
    ("8", "Special Flight Permit"),
    ("9", "Light Sport"),
]

OWNER_TYPES: list[tuple[str, str]] = [
    ("1", "Individual"),
    ("2", "Partnership"),
    ("3", "Corporation"),
    ("4", "Co-Owned"),
    ("5", "Government"),
    ("7", "LLC"),
    ("8", "Non-Citizen Corporation"),
    ("9", "Non-Citizen Co-Owned"),
]

LOOKUP_TABLES = {
    "status_codes": STATUS_CODES,
    "airworthiness_classes": AIRWORTHINESS_CLASSES,
    "owner_types": OWNER_TYPES,
}

BASE_TABLES = (
    "aircraft",
    "registrations",
    "owners",
    "aircraft_make_model",
    "engines",
)

# Decode views (reference publish.py:156-198). Identical SQL runs on
# Spark — Catalyst inlines the view, prunes unused decode joins, and
# broadcast-selects the tiny dims at plan time.
AIRCRAFT_DECODED_SQL = """
SELECT
    a.n_number,
    a.serial_no,
    a.mfr_mdl_code,
    m.maker,
    m.model,
    a.engine_code,
    a.year_mfr,
    a.airworthiness_class AS airworthiness_code,
    ac.description AS airworthiness_class,
    a.seats,
    a.engines,
    a.reg_status AS status_code,
    s.description AS reg_status,
    a.status_date,
    a.reg_expiration,
    r.cert_issue_date,
    a.mode_s_code,
    a.mode_s_code_hex,
    a.is_deregistered
FROM aircraft a
LEFT JOIN aircraft_make_model m ON a.mfr_mdl_code = m.mfr_mdl_code
LEFT JOIN status_codes s ON a.reg_status = s.code
LEFT JOIN airworthiness_classes ac ON a.airworthiness_class = ac.code
LEFT JOIN registrations r ON a.n_number = r.n_number
"""

OWNERS_CLEAN_SQL = """
SELECT
    n_number,
    o.owner_type AS owner_type_code,
    ot.description AS owner_type,
    owner_name_std AS owner_name,
    address_all_std AS address,
    city_std AS city,
    state_std AS state,
    zip5 AS zip
FROM owners o
LEFT JOIN owner_types ot ON o.owner_type = ot.code
"""


def lookup_df(spark: SparkSession, name: str) -> DataFrame:
    """One of the three inline VALUES lookup tables as a DataFrame."""
    return spark.createDataFrame(
        LOOKUP_TABLES[name], "code string, description string"
    )


def build_owners_summary(owners: DataFrame) -> DataFrame:
    """Materialized per-aircraft owner rollup (reference publish.py:58-67).

    DuckDB's STRING_AGG is insertion-ordered; ``collect_list`` order is
    nondeterministic under parallel aggregation, so the concat is made
    explicitly deterministic with ``array_sort`` (SURVEY.md §4.3 trap 2).
    One shuffle on ``n_number``; map-side partial agg keeps it cheap.
    """
    return owners.groupBy("n_number").agg(
        F.count(F.lit(1)).cast("int").alias("owner_count"),
        F.array_join(F.array_sort(F.collect_list("owner_name_std")), "; ").alias(
            "owner_names_concat"
        ),
        F.bool_or(F.col("owner_type").isin("2", "4", "5")).alias("any_trust_flag"),
    )


# The reference's FTS5 virtual table indexes exactly these four owner
# search fields (/root/reference/pipelines/publish.py:286-304).
OWNERS_FTS_COLUMNS = (
    "owner_name_std",
    "address_all_std",
    "city_std",
    "state_std",
)
OWNERS_FTS_BUCKETS = 16


def build_owners_fts_index(owners: DataFrame) -> DataFrame:
    """(token, owner_id) postings over the four FTS5 search fields."""
    from hangarbay_spark.operators import fts

    return fts.build_inverted_index(owners, "owner_id", *OWNERS_FTS_COLUMNS)


def publish(
    spark: SparkSession,
    parquet_dir: str | Path,
    write_meta: bool = True,
    sort_point_lookup_keys: bool = True,
    build_fts: bool = True,
) -> dict[str, int]:
    """Register the published database in the Spark session.

    - 5 base tables as temp views over their Parquet (columnar scan,
      pushdown — the DuckDB-copy step is unnecessary in Spark);
    - ``owners_summary`` materialized to Parquet then registered
      (same table-not-view decision as the reference, PLANNING.md:104-108);
    - 3 lookup dims registered (broadcast-sized);
    - 2 decode views registered with the reference's SQL.

    The reference's six B-tree indexes (publish.py:206-213) map to
    physical layout: with ``sort_point_lookup_keys`` the summary is
    written sorted by ``n_number`` so min/max row-group stats turn point
    lookups into single-row-group reads (SURVEY.md Q6).
    """
    parquet_dir = Path(parquet_dir)
    t0 = time.time()
    counts: dict[str, int] = {}

    for name in BASE_TABLES:
        df = spark.read.parquet(str(parquet_dir / f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        counts[name] = df.count()

    owners = spark.table("owners")
    summary = build_owners_summary(owners)
    summary_path = parquet_dir / "owners_summary.parquet"
    writer = summary.sortWithinPartitions("n_number") if sort_point_lookup_keys else summary
    writer.write.mode("overwrite").parquet(str(summary_path))
    summary_df = spark.read.parquet(str(summary_path))
    summary_df.createOrReplaceTempView("owners_summary")
    counts["owners_summary"] = summary_df.count()

    for name in LOOKUP_TABLES:
        lookup_df(spark, name).createOrReplaceTempView(name)
        counts[name] = len(LOOKUP_TABLES[name])

    spark.sql(f"CREATE OR REPLACE TEMP VIEW aircraft_decoded AS {AIRCRAFT_DECODED_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW owners_clean AS {OWNERS_CLEAN_SQL}")

    indexes_meta: dict[str, dict] = {}
    if build_fts:
        # Durable FTS artifact in the warehouse — the reference builds
        # its FTS5 index at publish time (publish.py:286-304); ours is
        # token-bucketed postings parquet, registered as a view so
        # `SELECT ... FROM owners_fts` works immediately.
        from hangarbay_spark.operators import fts

        fts_path = parquet_dir / "_indexes" / "owners_fts.parquet"
        fts.save_index(
            build_owners_fts_index(owners),
            str(fts_path),
            buckets=OWNERS_FTS_BUCKETS,
        )
        idx_df = fts.load_index(spark, str(fts_path))
        idx_df.createOrReplaceTempView("owners_fts")
        counts["owners_fts"] = idx_df.count()
        indexes_meta["owners_fts"] = {
            "path": str(fts_path),
            "key": "owner_id",
            "columns": list(OWNERS_FTS_COLUMNS),
            "buckets": OWNERS_FTS_BUCKETS,
            "postings": counts["owners_fts"],
        }

    if write_meta:
        meta = {
            "tables": counts,
            "views": ["aircraft_decoded", "owners_clean"],
            "indexes": indexes_meta,
            "elapsed_sec": round(time.time() - t0, 2),
        }
        meta_path = parquet_dir / "_meta"
        meta_path.mkdir(parents=True, exist_ok=True)
        (meta_path / "publish.json").write_text(json.dumps(meta, indent=2))
    return counts
