"""End-to-end FAA pipeline tests over FIXTURES.md §A-shaped synthetic
CSVs: fetch (zip fixture) -> normalize -> publish -> API queries.

Asserts the reference's conventions (SURVEY.md §1.2): strings never
null, dates/ints nullable, placeholder columns all-null, owner_id
deterministic, owners_summary golden rows, decode-view semantics.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from hangarbay_spark.api import Hangarbay, normalize_n_number, rewrite_like_to_ilike
from hangarbay_spark.pipelines.fetch import fetch_snapshot
from hangarbay_spark.pipelines.normalize import normalize_snapshot
from hangarbay_spark.pipelines.publish import publish
from hangarbay_spark.schemas import SCHEMAS

MASTER_CSV = """\
N-NUMBER,SERIAL NUMBER,MFR MDL CODE,ENG MFR MDL,YEAR MFR,TYPE AIRCRAFT,TYPE REGISTRANT,NAME,STREET,STREET2,CITY,STATE,ZIP CODE,LAST ACTION DATE,CERT ISSUE DATE,EXPIRATION DATE,CERTIFICATION,STATUS CODE,MODE S CODE,MODE S CODE HEX,EXTRA COL
221LA,SN-001,1234567,55555,1998,4,1,smith  aviation llc,123 Main St,Suite 100,austin,Texas,78701,20230115,20200110,20261231,1N,V,50000001,A00001  ,ignored
100,SN-002,1234567,55555,  2005,1,3,ACME CORP,1 Acme Way,,new york,NY,10001-1234,20230201,20190505,20250601,42,M,50000002,A00002,ignored
757AF,SN-003,9999999,77777,,9,2,Trust Holdings,9 Trust Rd,,miami,Florida,331,20231332,,20240101,9A,13,,,ignored
757AF,SN-003,9999999,77777,badyear,9,4,Other Owner,9 Trust Rd,,miami,FL,00331,20230301,20210101,20240101,9A,13,,,ignored
ZERO1,SN-004,1234567,,1960,H,5,None,,,smallville,Atlantis,ABCDE,,,,,Q,,,
"""

ACFTREF_CSV = """\
CODE,MFR,MODEL,TYPE-ACFT,TYPE-ENG,AC-CAT,BUILD-CERT-IND,NO-ENG,NO-SEATS,AC-WEIGHT,SPEED
1234567,CESSNA,172S,4,1,1,0,1,4,CLASS 1,120
9999999,BOEING,757-200,5,5,1,0,2,200,CLASS 3,460
"""

ENGINE_CSV = """\
CODE,MFR,MODEL,TYPE,HORSEPOWER,THRUST
55555,LYCOMING,O-360,1,180,
77777,PRATT & WHITNEY,PW2037,5,,38250
"""


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("hb_data")


@pytest.fixture(scope="module")
def snapshot_dir(data_dir):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("MASTER.txt", MASTER_CSV)
        zf.writestr("ACFTREF.txt", ACFTREF_CSV)
        zf.writestr("ENGINE.txt", ENGINE_CSV)
    zip_path = data_dir / "fixture.zip"
    zip_path.write_bytes(buf.getvalue())
    return fetch_snapshot(data_dir, snapshot="2026-01-01", zip_path=zip_path)


@pytest.fixture(scope="module")
def published(spark, data_dir, snapshot_dir):
    out = data_dir / "parquet"
    counts = normalize_snapshot(spark, snapshot_dir, out)
    pub_counts = publish(spark, out)
    return counts, pub_counts, out


def test_fetch_manifest(snapshot_dir):
    import json

    manifest = json.loads((snapshot_dir / "manifest.json").read_text())
    assert manifest["snapshot"] == "2026-01-01"
    assert set(manifest["files"]) == {"MASTER.txt", "ACFTREF.txt", "ENGINE.txt"}
    assert all(len(h) == 64 for h in manifest["files"].values())
    assert set(manifest["schema_hashes"]) == set(SCHEMAS)
    assert manifest["previous_snapshot"] is None


def test_normalize_counts_and_schemas(spark, published):
    counts, _, out = published
    assert counts == {
        "aircraft": 5,
        "registrations": 5,
        "owners": 5,
        "aircraft_make_model": 2,
        "engines": 2,
    }
    for name in counts:
        df = spark.read.parquet(str(out / f"{name}.parquet"))
        assert df.schema == SCHEMAS[name], name


def test_aircraft_conventions(spark, published):
    from pyspark.sql import functions as F

    *_, out = published
    ac = spark.read.parquet(str(out / "aircraft.parquet"))
    rows = {r["n_number"]: r for r in ac.collect()}
    # leading-zero-preserving string keys; no leading-N stripping at rest
    assert set(rows) == {"221LA", "100", "757AF", "ZERO1"} | {"757AF"}
    # placeholders: seats/engines always null, is_deregistered always False
    assert ac.filter(F.col("seats").isNotNull()).count() == 0
    assert ac.filter(F.col("engines").isNotNull()).count() == 0
    assert ac.filter(F.col("is_deregistered")).count() == 0
    # padded int coerces; garbage year -> null; blank -> null
    assert rows["100"]["year_mfr"] == 2005
    assert rows["ZERO1"]["year_mfr"] == 1960
    # TYPE AIRCRAFT lands in airworthiness_class (reference quirk)
    assert rows["221LA"]["airworthiness_class"] == "4"
    # malformed date 20231332 -> null; strings backfilled to ""
    r757 = [r for r in ac.collect() if r["n_number"] == "757AF"]
    assert any(r["status_date"] is None for r in r757)
    assert rows["ZERO1"]["mode_s_code"] == ""
    # trailing-space strip on hex mode-s
    assert rows["221LA"]["mode_s_code_hex"] == "A00001"


def test_owners_standardization(spark, published):
    *_, out = published
    ow = spark.read.parquet(str(out / "owners.parquet"))
    rows = {(r["n_number"], r["owner_name"]): r for r in ow.collect()}
    r = rows[("221LA", "smith  aviation llc")]
    assert r["owner_name_std"] == "SMITH AVIATION LLC"
    assert r["address_all_std"] == "123 MAIN ST SUITE 100"
    assert r["city_std"] == "AUSTIN"
    assert r["state_std"] == "TX"  # full name -> USPS
    assert r["zip5"] == "78701"
    r2 = rows[("100", "ACME CORP")]
    assert r2["zip5"] == "10001"  # ZIP+4 truncated
    r3 = rows[("757AF", "Trust Holdings")]
    assert r3["zip5"] == "00331"  # left-pad
    r4 = rows[("ZERO1", "")]  # literal None -> null -> ""
    assert r4["state_std"] == "AT"  # unknown full name -> first 2 chars
    assert r4["zip5"] == ""  # non-digit zip -> ""
    assert all(r["owner_id"] is not None for r in rows.values())


def test_owner_id_stable_across_runs(spark, published, data_dir, snapshot_dir):
    *_, out = published
    first = {
        (r["n_number"], r["owner_name"]): r["owner_id"]
        for r in spark.read.parquet(str(out / "owners.parquet")).collect()
    }
    out2 = data_dir / "parquet_rerun"
    normalize_snapshot(spark, snapshot_dir, out2, write_meta=False)
    second = {
        (r["n_number"], r["owner_name"]): r["owner_id"]
        for r in spark.read.parquet(str(out2 / "owners.parquet")).collect()
    }
    assert first == second


def test_owners_summary_golden(spark, published):
    rows = {
        r["n_number"]: r
        for r in spark.table("owners_summary").collect()
    }
    # two-owner aircraft: sorted deterministic concat + trust flag
    # (owner types 2 and 4 are both trust-ish per publish.py:64)
    r = rows["757AF"]
    assert r["owner_count"] == 2
    assert r["owner_names_concat"] == "OTHER OWNER; TRUST HOLDINGS"
    assert r["any_trust_flag"] is True
    assert rows["221LA"]["owner_count"] == 1
    assert rows["221LA"]["any_trust_flag"] is False  # type 1 individual
    assert rows["ZERO1"]["any_trust_flag"] is True  # type 5 government


def test_decode_views(spark, published):
    dec = {r["n_number"]: r for r in spark.table("aircraft_decoded").collect()}
    assert dec["221LA"]["maker"] == "CESSNA"
    assert dec["221LA"]["reg_status"] == "Valid"  # V decoded
    assert dec["221LA"]["airworthiness_class"] == "Experimental"  # code 4
    assert dec["757AF"]["reg_status"] == "Registration Expired"  # code 13
    assert dec["ZERO1"]["maker"] == "CESSNA"
    assert dec["ZERO1"]["reg_status"] is None  # unknown code Q -> null decode
    oc = {
        (r["n_number"], r["owner_name"]): r
        for r in spark.table("owners_clean").collect()
    }
    assert oc[("221LA", "SMITH AVIATION LLC")]["owner_type"] == "Individual"
    assert oc[("ZERO1", "")]["owner_type"] == "Government"


def test_publish_fts_index_durable(spark, published, data_dir):
    import json

    *_, out = published
    # artifact on disk, inside the warehouse
    idx_dir = out / "_indexes" / "owners_fts.parquet"
    assert (idx_dir / "_SUCCESS").exists()
    # registered and queryable
    idx = spark.table("owners_fts")
    assert set(idx.columns) == {"owner_id", "token"}
    assert idx.count() > 0
    # provenance recorded for `status`
    meta = json.loads((out / "_meta" / "publish.json").read_text())
    fts_meta = meta["indexes"]["owners_fts"]
    assert fts_meta["columns"] == [
        "owner_name_std",
        "address_all_std",
        "city_std",
        "state_std",
    ]
    assert fts_meta["postings"] == idx.count()

    # FTS search resolves via the index artifact, not an owners re-scan
    hb = Hangarbay(data_dir=data_dir, spark=spark)
    hb._published = True
    res = hb.fts_search("smith austin")
    assert list(res["owner_name_std"]) == ["SMITH AVIATION LLC"]
    lazy = hb.fts_search("smith austin", collect=False)
    assert any("owners_fts" in f for f in lazy.inputFiles())
    # AND semantics: tokens from different owners match nothing
    assert len(hb.fts_search("smith acme")) == 0
    # OR semantics
    assert len(hb.fts_search("smith acme", mode="any")) == 2


def test_api_surface(spark, published, data_dir):
    hb = Hangarbay(data_dir=data_dir, spark=spark)
    hb._published = True  # views registered by the `published` fixture

    # search: leading-N strip + case-insensitive point lookup
    res = hb.search("n221la")
    assert len(res) == 1 and res.iloc[0]["maker"] == "CESSNA"

    # fleet: OR-of-LIKEs + state filter + order
    res = hb.fleet("smith|acme")
    assert list(res["n_number"]) == ["100", "221LA"]
    res = hb.fleet("smith|acme", state="tx")
    assert list(res["n_number"]) == ["221LA"]
    res = hb.fleet("o", limit=2)
    assert len(res) == 2

    # ad-hoc SQL + ILIKE rewrite
    res = hb.query("SELECT COUNT(*) AS n FROM aircraft")
    assert res.iloc[0]["n"] == 5
    res = hb.query(
        "SELECT n_number FROM owners_clean WHERE owner_name LIKE '%trust%'",
        ilike=True,
    )
    assert list(res["n_number"]) == ["757AF"]

    tables = hb.list_tables()
    for t in ("aircraft", "owners_summary", "aircraft_decoded", "owners_clean"):
        assert t in tables
    sch = hb.schema("aircraft")
    assert list(sch[sch["column_name"] == "n_number"]["column_type"]) == ["string"]
    status = hb.status()
    assert status["latest_snapshot"] == "2026-01-01"
    assert status["stale"] is True  # 2026-01-01 is >30 days old


def test_data_quality_checks(spark, published):
    from hangarbay_spark.pipelines.verify import (
        assert_hard_checks,
        run_all,
    )

    results = {r.name: r for r in run_all(spark)}
    # the fixture deliberately contains a duplicate n_number (757AF)
    assert results["unique_n_number"].violations == 1
    # year 1960/1998/2005 are all in bounds; garbage year became null
    assert results["year_mfr_bounds"].ok
    assert results["n_number_format"].ok
    assert results["owner_id_present"].ok
    assert results["zip5_format"].ok
    # every non-empty mfr_mdl_code resolves in the fixture
    assert results["make_model_fk_coverage"].ok
    # hard-check failure raises
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="unique_n_number"):
        assert_hard_checks(list(results.values()))


def test_helpers():
    assert normalize_n_number("n221la") == "221LA"
    assert normalize_n_number("221LA") == "221LA"
    assert normalize_n_number("N") == "N"
    assert rewrite_like_to_ilike("a LIKE 'x' AND unlike LIKEWISE like") == (
        "a ILIKE 'x' AND unlike LIKEWISE ILIKE"
    )


def test_source_format_independence(spark, tmp_path):
    """The same declarative agg over parquet, CSV, and JSONL copies of a
    table produces identical results — source connectors change the
    scan node, never the semantics."""
    import pyspark.sql.functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    src.write.option("header", True).csv(csv_dir)
    src.write.json(json_dir)

    def agg(df):
        return {
            r["p_brand"]: (r["n"], r["total"])
            for r in df.groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("p_retailprice").cast("decimal(30,2)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        }

    base = agg(src)
    csv_df = spark.read.option("header", True).schema(src.schema).csv(csv_dir)
    json_df = spark.read.schema(src.schema).json(json_dir)
    assert agg(csv_df) == base
    assert agg(json_df) == base


def test_export_training_shards(spark, tmp_path):
    """Sharded training export: deterministic (same seed -> identical
    (shard, pos) -> doc mapping across runs), order-preserving within
    each shard file, exact-dedup'd, manifest counts consistent."""
    from hangarbay_spark.pipelines.export import export_training_shards

    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_training_shards(
        spark, "/root/testdata/sf0.001", out1, n_shards=4, seed="ep1"
    )
    m2 = export_training_shards(
        spark, "/root/testdata/sf0.001", out2, n_shards=4, seed="ep1"
    )
    assert m1["per_shard_counts"] == m2["per_shard_counts"]
    assert m1["n_exported_docs"] <= m1["n_input_docs"]
    assert sum(m1["per_shard_counts"].values()) == m1["n_exported_docs"]

    b1 = spark.read.parquet(out1).select("shard", "pos", "doc_id")
    b2 = spark.read.parquet(out2).select("shard", "pos", "doc_id")
    rows1 = sorted(map(tuple, b1.collect()))
    rows2 = sorted(map(tuple, b2.collect()))
    assert rows1 == rows2  # same seed -> identical training order

    # per-shard positions are contiguous 1..n (order-preserving export)
    import pyspark.sql.functions as F

    for r in (
        b1.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("pos").alias("lo"),
             F.max("pos").alias("hi"))
        .collect()
    ):
        assert (r["lo"], r["hi"]) == (1, r["n"])

    # a different seed reorders
    m3 = export_training_shards(
        spark, "/root/testdata/sf0.001", str(tmp_path / "e3"),
        n_shards=4, seed="ep2"
    )
    b3 = spark.read.parquet(str(tmp_path / "e3")).select(
        "shard", "pos", "doc_id"
    )
    assert sorted(map(tuple, b3.collect())) != rows1

    # exact dedup: no two exported docs share a fingerprint
    from hangarbay_spark.operators.text import fingerprint_expr

    dup = (
        spark.read.parquet(out1)
        .groupBy(fingerprint_expr("text").alias("fp"))
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0

    # each shard directory holds exactly one data file, rows stored in
    # pos order (the trainer streams it sequentially)
    import glob
    import pyarrow.parquet as pq

    for d in glob.glob(out1 + "/shard=*"):
        files = [p for p in glob.glob(d + "/*.parquet")]
        assert len(files) == 1
        pos = pq.read_table(files[0], columns=["pos"])["pos"].to_pylist()
        assert pos == sorted(pos)
