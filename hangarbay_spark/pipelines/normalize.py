"""Normalize stage: raw FAA CSV text files -> five typed Parquet tables.

Spark-first rebuild of the reference normalize pipeline
(/root/reference/pipelines/normalize.py:58-332). The reference parses
CSV with PyArrow, round-trips through pandas, and standardizes owner
addresses in a row-wise ``iterrows`` loop; here the whole stage is one
declarative DataFrame plan per table — CSV scan -> column projections ->
native column expressions (hangarbay_spark.address) -> schema-cast
Parquet write. No Python runs per-row, so the stage scales linearly
with executors (a 100 TB normalize is the same plan with more input
splits).

Conventions preserved (SURVEY.md §1.2): ``""``/``"None"`` -> null on
read; string columns backfilled to ``""``; dates (YYYYMMDD) and ints
coerce-to-null on malformed input; ``seats``/``engines``/``cylinders``
always null; ``is_deregistered`` always False.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.address import (
    clean_text_expr,
    combine_address_expr,
    owner_id_expr,
    standardize_owner_name_expr,
    standardize_state_expr,
    standardize_zip_expr,
)
from hangarbay_spark.schemas import SCHEMAS

TABLE_NAMES = (
    "aircraft",
    "registrations",
    "owners",
    "aircraft_make_model",
    "engines",
)


def read_faa_csv(spark: SparkSession, path: str | Path) -> DataFrame:
    """Comma-delimited, header row; ``""`` and ``"None"`` read as null
    (reference normalize.py:81-84). Column names are trimmed.

    Everything is read as string; typed coercion happens per-column so
    malformed values null out instead of poisoning the row.
    """
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .csv(str(path))
    )
    df = df.toDF(*[c.strip() for c in df.columns])
    # Spark's nullValue option takes a single token; map both sentinels
    # (and whitespace-padded variants) to null post-scan — constant-folded
    # into the scan by Catalyst, still one pass.
    return df.select(
        *[
            F.when(F.trim(F.col(c)).isin("", "None"), None)
            .otherwise(F.col(c))
            .alias(c)
            for c in df.columns
        ]
    )


def _s(c: str) -> Column:
    """String column: trimmed, null -> "" (reference fillna("")+strip)."""
    return F.coalesce(F.trim(F.col(c)), F.lit(""))


def _date_yyyymmdd(c: str) -> Column:
    """YYYYMMDD int/str -> date; malformed -> null (errors="coerce")."""
    return F.to_date(F.trim(F.col(c)).cast("string"), "yyyyMMdd")


def _int32(c: str) -> Column:
    """to_numeric(errors='coerce').astype('Int32'): a float-looking year
    like '1998.0' still lands as 1998; garbage -> null."""
    return F.trim(F.col(c)).cast("double").cast("int")


def _cast_to_schema(df: DataFrame, table: str) -> DataFrame:
    schema = SCHEMAS[table]
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def build_aircraft(master: DataFrame) -> DataFrame:
    """MASTER.txt -> aircraft (reference normalize.py:101-156).

    Preserves the reference's documented miswiring: ``TYPE AIRCRAFT``
    lands in ``airworthiness_class`` (SURVEY.md §1.4).
    """
    df = master.select(
        _s("N-NUMBER").alias("n_number"),
        _s("SERIAL NUMBER").alias("serial_no"),
        _s("MFR MDL CODE").alias("mfr_mdl_code"),
        _s("ENG MFR MDL").alias("engine_code"),
        _int32("YEAR MFR").alias("year_mfr"),
        _s("TYPE AIRCRAFT").alias("airworthiness_class"),
        F.lit(None).cast("int").alias("seats"),
        F.lit(None).cast("int").alias("engines"),
        _s("STATUS CODE").alias("reg_status"),
        _date_yyyymmdd("LAST ACTION DATE").alias("status_date"),
        _date_yyyymmdd("EXPIRATION DATE").alias("reg_expiration"),
        _s("MODE S CODE").alias("mode_s_code"),
        _s("MODE S CODE HEX").alias("mode_s_code_hex"),
        F.lit(False).alias("is_deregistered"),
    )
    return _cast_to_schema(df, "aircraft")


def build_registrations(master: DataFrame) -> DataFrame:
    """MASTER.txt -> registrations (reference normalize.py:159-178)."""
    df = master.select(
        _s("N-NUMBER").alias("n_number"),
        _s("CERTIFICATION").alias("reg_type"),
        _s("STATUS CODE").alias("reg_status"),
        _date_yyyymmdd("LAST ACTION DATE").alias("status_date"),
        _date_yyyymmdd("EXPIRATION DATE").alias("reg_expiration"),
        _date_yyyymmdd("CERT ISSUE DATE").alias("cert_issue_date"),
    )
    return _cast_to_schema(df, "registrations")


def build_owners(master: DataFrame) -> DataFrame:
    """MASTER.txt -> owners with vectorized address standardization.

    The reference does this in a per-row Python loop
    (normalize.py:186-231); here the same scalar semantics run as
    codegen'd column expressions — the 100 TB hot path stays JVM-side.
    """
    raw = master.select(
        _s("N-NUMBER").alias("n_number"),
        _s("TYPE REGISTRANT").alias("owner_type"),
        _s("NAME").alias("owner_name"),
        _s("STREET").alias("street1"),
        _s("STREET2").alias("street2"),
        _s("CITY").alias("city"),
        _s("STATE").alias("state"),
        _s("ZIP CODE").alias("zip_code"),
    )
    std = raw.withColumns(
        {
            "owner_name_std": standardize_owner_name_expr("owner_name"),
            "address_all_std": combine_address_expr("street1", "street2"),
            "city_std": clean_text_expr("city"),
            "state_std": standardize_state_expr("state"),
            "zip5": standardize_zip_expr("zip_code"),
        }
    )
    df = std.withColumn(
        "owner_id",
        owner_id_expr(
            "n_number",
            "owner_name_std",
            "address_all_std",
            "city_std",
            "state_std",
            "zip5",
        ),
    )
    return _cast_to_schema(df, "owners")


def build_aircraft_make_model(acftref: DataFrame) -> DataFrame:
    """ACFTREF.txt -> aircraft_make_model (reference normalize.py:243-287)."""
    df = acftref.select(
        _s("CODE").alias("mfr_mdl_code"),
        _s("MFR").alias("maker"),
        _s("MODEL").alias("model"),
        _s("AC-CAT").alias("category"),
        _s("TYPE-ACFT").alias("type"),
        _s("TYPE-ENG").alias("engine_type"),
        _int32("NO-SEATS").alias("seats_default"),
    )
    return _cast_to_schema(df, "aircraft_make_model")


def build_engines(engine: DataFrame) -> DataFrame:
    """ENGINE.txt -> engines (reference normalize.py:290-332)."""
    df = engine.select(
        _s("CODE").alias("engine_code"),
        _s("MFR").alias("manufacturer"),
        _s("MODEL").alias("model"),
        _s("TYPE").alias("type"),
        _int32("HORSEPOWER").alias("horsepower"),
        F.lit(None).cast("int").alias("cylinders"),
    )
    return _cast_to_schema(df, "engines")


def normalize_snapshot(
    spark: SparkSession,
    raw_dir: str | Path,
    out_dir: str | Path,
    write_meta: bool = True,
) -> dict[str, int]:
    """Run the full normalize stage: raw snapshot dir -> Parquet tables.

    Mirrors the reference's normalize entry (normalize.py:335-431):
    parses MASTER/ACFTREF/ENGINE, writes one Parquet table each, and
    records row counts in ``_meta/normalize.json``.

    Scale note: each table is an independent job; the three MASTER
    projections share one scan via cache-less reuse (Spark re-reads, but
    the scan is column-pruned per table). Output is snappy Parquet,
    overwrite-mode — the atomic-publish analog of the reference's
    temp-then-move plan (PLANNING.md:203).
    """
    raw_dir, out_dir = Path(raw_dir), Path(out_dir)
    t0 = time.time()

    # MASTER feeds three tables and carries the expression-heavy owner
    # standardization; a single CSV file scans as ONE task, so spread
    # the rows across the cluster first (narrow pre-shuffle, ~MBs).
    par = spark.sparkContext.defaultParallelism
    master = read_faa_csv(spark, raw_dir / "MASTER.txt").repartition(par)
    acftref = read_faa_csv(spark, raw_dir / "ACFTREF.txt")
    engine = read_faa_csv(spark, raw_dir / "ENGINE.txt")

    tables = {
        "aircraft": build_aircraft(master),
        "registrations": build_registrations(master),
        "owners": build_owners(master),
        "aircraft_make_model": build_aircraft_make_model(acftref),
        "engines": build_engines(engine),
    }

    counts: dict[str, int] = {}
    for name, df in tables.items():
        path = out_dir / f"{name}.parquet"
        df.write.mode("overwrite").parquet(str(path))
        counts[name] = spark.read.parquet(str(path)).count()

    if write_meta:
        meta = {
            "tables": counts,
            "elapsed_sec": round(time.time() - t0, 2),
            "source": str(raw_dir),
        }
        meta_path = out_dir / "_meta"
        meta_path.mkdir(parents=True, exist_ok=True)
        (meta_path / "normalize.json").write_text(json.dumps(meta, indent=2))
    return counts
