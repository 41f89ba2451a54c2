"""Ported scalar-function unit tests (reference tests/test_address.py:12-80),
evaluated through the Spark column expressions — all cases per function
batched into a single DataFrame/collect to keep the suite fast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hangarbay_spark.address import (
    clean_text_expr,
    combine_address_expr,
    owner_id_expr,
    standardize_owner_name_expr,
    standardize_state_expr,
    standardize_zip_expr,
)


def _eval_unary(spark, expr_builder, inputs):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(inputs)], "i int, c string")
    rows = df.select("i", expr_builder(F.col("c")).alias("r")).orderBy("i").collect()
    return [r["r"] for r in rows]


def test_clean_text(spark):
    cases = {
        "  hello   world  ": "HELLO WORLD",
        "already CLEAN": "ALREADY CLEAN",
        None: "",
        "": "",
        "tabs\tand\nnewlines": "TABS AND NEWLINES",
    }
    assert _eval_unary(spark, clean_text_expr, list(cases)) == list(cases.values())


def test_standardize_state(spark):
    cases = {
        "CA": "CA",
        "ca": "CA",
        "California": "CA",
        "CALIFORNIA  ": "CA",
        "Puerto Rico": "PR",
        "Northern Mariana Islands": "MP",
        None: "",
        "": "",
        "Atlantis": "AT",  # unknown long name -> first two chars
        "X": "",
    }
    assert _eval_unary(spark, standardize_state_expr, list(cases)) == list(cases.values())


def test_standardize_zip(spark):
    cases = {
        "12345": "12345",
        "12345-6789": "12345",
        "123": "00123",
        " 98765 ": "98765",
        "ABCDE": "",
        None: "",
        "": "",
    }
    assert _eval_unary(spark, standardize_zip_expr, list(cases)) == list(cases.values())


def test_combine_address(spark):
    cases = [
        (("123 Main St", "Suite 100"), "123 MAIN ST SUITE 100"),
        (("123 Main St", None), "123 MAIN ST"),
        ((None, "Suite 100"), "SUITE 100"),
        ((None, None), ""),
        (("  123  Main ", "  Apt 2 "), "123 MAIN APT 2"),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, ((a, b), _) in enumerate(cases)], "i int, a string, b string"
    )
    rows = (
        df.select("i", combine_address_expr(F.col("a"), F.col("b")).alias("r"))
        .orderBy("i")
        .collect()
    )
    assert [r["r"] for r in rows] == [exp for _, exp in cases]


def test_standardize_owner_name(spark):
    cases = {"  smith   aviation llc ": "SMITH AVIATION LLC", None: ""}
    assert _eval_unary(spark, standardize_owner_name_expr, list(cases)) == list(
        cases.values()
    )


def test_owner_id_deterministic(spark):
    df = spark.createDataFrame(
        [("1234A", "SMITH AVIATION", "1 MAIN ST", "AUSTIN", "TX", "78701")] * 2,
        "n string, nm string, ad string, ct string, st string, z string",
    )
    ids = [
        r["oid"]
        for r in df.select(
            owner_id_expr("n", "nm", "ad", "ct", "st", "z").alias("oid")
        ).collect()
    ]
    assert ids[0] == ids[1]
    assert isinstance(ids[0], int)


def test_schema_hash_shape():
    from hangarbay_spark.schemas import AIRCRAFT_SCHEMA, SCHEMAS, schema_hash

    h = schema_hash(AIRCRAFT_SCHEMA)
    assert len(h) == 32 and all(c in "0123456789abcdef" for c in h)
    assert schema_hash(AIRCRAFT_SCHEMA) == schema_hash(AIRCRAFT_SCHEMA)
    # n_number string-typed to preserve leading zeros (ref test_schemas.py:21-24)
    for t in ("aircraft", "registrations", "owners"):
        assert dict(
            (f.name, f.dataType.simpleString()) for f in SCHEMAS[t].fields
        )["n_number"] == "string"
