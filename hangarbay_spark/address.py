"""Address/text standardization as native Spark column expressions.

The reference implements these as row-wise Python scalar functions
(/root/reference/hangarbay/address.py:27-136) driven by an ``iterrows``
loop (/root/reference/pipelines/normalize.py:186-231). Here each one is
a pure Column expression — JVM-side, whole-stage-codegen'd, no Python in
the hot path — so normalize scales linearly with executors at 100 TB.

Each ``*_expr`` function matches the reference semantics exactly
(ported unit tests in tests/test_address.py assert this).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# USPS full-name -> abbreviation map (56 entries), a fact table shared
# with the reference (/root/reference/hangarbay/address.py:8-24).
STATE_ABBREVIATIONS: dict[str, str] = {
    "ALABAMA": "AL", "ALASKA": "AK", "ARIZONA": "AZ", "ARKANSAS": "AR",
    "CALIFORNIA": "CA", "COLORADO": "CO", "CONNECTICUT": "CT", "DELAWARE": "DE",
    "FLORIDA": "FL", "GEORGIA": "GA", "HAWAII": "HI", "IDAHO": "ID",
    "ILLINOIS": "IL", "INDIANA": "IN", "IOWA": "IA", "KANSAS": "KS",
    "KENTUCKY": "KY", "LOUISIANA": "LA", "MAINE": "ME", "MARYLAND": "MD",
    "MASSACHUSETTS": "MA", "MICHIGAN": "MI", "MINNESOTA": "MN", "MISSISSIPPI": "MS",
    "MISSOURI": "MO", "MONTANA": "MT", "NEBRASKA": "NE", "NEVADA": "NV",
    "NEW HAMPSHIRE": "NH", "NEW JERSEY": "NJ", "NEW MEXICO": "NM", "NEW YORK": "NY",
    "NORTH CAROLINA": "NC", "NORTH DAKOTA": "ND", "OHIO": "OH", "OKLAHOMA": "OK",
    "OREGON": "OR", "PENNSYLVANIA": "PA", "RHODE ISLAND": "RI", "SOUTH CAROLINA": "SC",
    "SOUTH DAKOTA": "SD", "TENNESSEE": "TN", "TEXAS": "TX", "UTAH": "UT",
    "VERMONT": "VT", "VIRGINIA": "VA", "WASHINGTON": "WA", "WEST VIRGINIA": "WV",
    "WISCONSIN": "WI", "WYOMING": "WY",
    "DISTRICT OF COLUMBIA": "DC", "PUERTO RICO": "PR", "GUAM": "GU",
    "VIRGIN ISLANDS": "VI", "AMERICAN SAMOA": "AS",
    "NORTHERN MARIANA ISLANDS": "MP",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_text_expr(c: Column | str) -> Column:
    """strip + collapse whitespace runs + UPPER; null -> ""."""
    c = _col(c)
    cleaned = F.upper(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.coalesce(cleaned, F.lit(""))


def standardize_state_expr(c: Column | str) -> Column:
    """2-letter alpha passthrough; full-name -> USPS; fallback first 2 chars.

    The map is tiny and constant, so it compiles into the plan as a chain
    of literals (no join, no shuffle) via a MapType literal lookup.
    """
    c = _col(c)
    s = F.upper(F.trim(c))
    s = F.coalesce(s, F.lit(""))
    mapping = F.create_map(
        *[F.lit(x) for kv in STATE_ABBREVIATIONS.items() for x in kv]
    )
    two_letter = (F.length(s) == 2) & s.rlike(r"^[A-Za-z]{2}$")
    return (
        F.when(s == "", F.lit(""))
        .when(two_letter, s)
        .otherwise(
            F.coalesce(
                mapping[s],
                F.when(F.length(s) >= 2, F.substring(s, 1, 2)).otherwise(F.lit("")),
            )
        )
    )


def standardize_zip_expr(c: Column | str) -> Column:
    """Keep digits only, truncate to 5, left-pad with zeros; empty -> ""."""
    c = _col(c)
    digits = F.regexp_replace(F.coalesce(c, F.lit("")), r"\D", "")
    return F.when(
        F.length(digits) > 0, F.lpad(F.substring(digits, 1, 5), 5, "0")
    ).otherwise(F.lit(""))


def combine_address_expr(a1: Column | str, a2: Column | str) -> Column:
    """Clean both lines and join with a single space; handles empties."""
    c1, c2 = clean_text_expr(a1), clean_text_expr(a2)
    return F.when((c1 != "") & (c2 != ""), F.concat_ws(" ", c1, c2)).otherwise(
        F.when(c1 != "", c1).otherwise(c2)
    )


def standardize_owner_name_expr(c: Column | str) -> Column:
    """Currently identical to clean_text (reference address.py:122-136)."""
    return clean_text_expr(c)


def owner_id_expr(
    n_number: Column | str,
    owner_name_std: Column | str,
    address_all_std: Column | str,
    city_std: Column | str,
    state_std: Column | str,
    zip5: Column | str,
) -> Column:
    """Deterministic 64-bit owner id.

    The reference hashes a "|"-joined key with Python xxh64 seed 0
    (/root/reference/pipelines/normalize.py:34-55). The contract is
    *stability across runs* (/root/reference/PLANNING.md:99-103), not a
    specific digest, so we use Spark's native ``xxhash64`` over the same
    joined key — JVM-side, codegen'd, no Python UDF.
    """
    key = F.concat_ws(
        "|",
        _col(n_number),
        _col(owner_name_std),
        _col(address_all_std),
        _col(city_std),
        _col(state_std),
        _col(zip5),
    )
    return F.xxhash64(key)
