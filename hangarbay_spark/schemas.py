"""Typed schema registry for the five published tables (+ planned ones).

Spark ``StructType`` twins of the reference's PyArrow schemas
(/root/reference/hangarbay/schemas.py:14-106). Conventions preserved
(SURVEY.md §1.2): string columns are non-null-by-convention (backfilled
to ""), dates and ints stay nullable, ``owner_id`` is a deterministic
64-bit hash (here Spark's ``xxhash64`` — stable across runs, which is
the contract; not byte-equal to the reference's Python xxh64 digest).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import types as T

_S = T.StringType()
_I = T.IntegerType()
_L = T.LongType()
_D = T.DateType()
_B = T.BooleanType()


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# reference: hangarbay/schemas.py:14-29
AIRCRAFT_SCHEMA = T.StructType(
    [
        _f("n_number", _S),
        _f("serial_no", _S),
        _f("mfr_mdl_code", _S),
        _f("engine_code", _S),
        _f("year_mfr", _I),
        _f("airworthiness_class", _S),
        _f("seats", _I),
        _f("engines", _I),
        _f("reg_status", _S),
        _f("status_date", _D),
        _f("reg_expiration", _D),
        _f("mode_s_code", _S),
        _f("mode_s_code_hex", _S),
        _f("is_deregistered", _B),
    ]
)

# reference: hangarbay/schemas.py:31-38
REGISTRATIONS_SCHEMA = T.StructType(
    [
        _f("n_number", _S),
        _f("reg_type", _S),
        _f("reg_status", _S),
        _f("status_date", _D),
        _f("reg_expiration", _D),
        _f("cert_issue_date", _D),
    ]
)

# reference: hangarbay/schemas.py:40-57
OWNERS_SCHEMA = T.StructType(
    [
        _f("owner_id", _L),
        _f("n_number", _S),
        _f("owner_type", _S),
        _f("owner_name", _S),
        _f("street1", _S),
        _f("street2", _S),
        _f("city", _S),
        _f("state", _S),
        _f("zip_code", _S),
        _f("owner_name_std", _S),
        _f("address_all_std", _S),
        _f("city_std", _S),
        _f("state_std", _S),
        _f("zip5", _S),
    ]
)

# reference: hangarbay/schemas.py:60-68
AIRCRAFT_MAKE_MODEL_SCHEMA = T.StructType(
    [
        _f("mfr_mdl_code", _S),
        _f("maker", _S),
        _f("model", _S),
        _f("category", _S),
        _f("type", _S),
        _f("engine_type", _S),
        _f("seats_default", _I),
    ]
)

# reference: hangarbay/schemas.py:70-77
ENGINES_SCHEMA = T.StructType(
    [
        _f("engine_code", _S),
        _f("manufacturer", _S),
        _f("model", _S),
        _f("type", _S),
        _f("horsepower", _I),
        _f("cylinders", _I),
    ]
)

# reference: hangarbay/schemas.py:80-86 (declared, never populated)
DEREGISTRATIONS_SCHEMA = T.StructType(
    [
        _f("n_number", _S),
        _f("dereg_date", _D),
        _f("dereg_reason", _S),
        _f("last_owner_name", _S),
    ]
)

# reference: hangarbay/schemas.py:89-94 (materialized at publish)
OWNERS_SUMMARY_SCHEMA = T.StructType(
    [
        _f("n_number", _S),
        _f("owner_count", _I),
        _f("owner_names_concat", _S),
        _f("any_trust_flag", _B),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "aircraft": AIRCRAFT_SCHEMA,
    "registrations": REGISTRATIONS_SCHEMA,
    "owners": OWNERS_SCHEMA,
    "aircraft_make_model": AIRCRAFT_MAKE_MODEL_SCHEMA,
    "engines": ENGINES_SCHEMA,
    "deregistrations": DEREGISTRATIONS_SCHEMA,
    "owners_summary": OWNERS_SUMMARY_SCHEMA,
}


def schema_hash(schema: T.StructType) -> str:
    """Deterministic 32-hex-char digest of a schema.

    Same construction as the reference (blake2b-16 over the schema's
    string form, /root/reference/hangarbay/schemas.py:7-10), applied to
    Spark's ``simpleString()`` canonical form.
    """
    return hashlib.blake2b(
        schema.simpleString().encode("utf-8"), digest_size=16
    ).hexdigest()


def all_schema_hashes() -> dict[str, str]:
    return {name: schema_hash(s) for name, s in SCHEMAS.items()}
