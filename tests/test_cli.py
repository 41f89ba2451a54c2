"""CLI surface tests: drive ``main()`` with argv over a fixture
warehouse (no network, no subprocess — the session is shared with the
test harness via getOrCreate). Covers S11 (CSV export), S12 (result
formatting), F14 (human date format), fleet summary stats, version,
and the fetch retry loop.
"""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from hangarbay_spark.cli import main
from hangarbay_spark.pipelines.fetch import download
from tests.test_pipeline import ACFTREF_CSV, ENGINE_CSV, MASTER_CSV


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory, spark):
    """Fixture warehouse built through the CLI itself:
    fetch (zip inject) -> normalize -> publish."""
    dd = tmp_path_factory.mktemp("hb_cli_data")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("MASTER.txt", MASTER_CSV)
        zf.writestr("ACFTREF.txt", ACFTREF_CSV)
        zf.writestr("ENGINE.txt", ENGINE_CSV)
    zip_path = dd / "fixture.zip"
    zip_path.write_bytes(buf.getvalue())
    base = ["--data-dir", str(dd)]
    assert main(base + ["fetch", "--snapshot", "2026-01-01",
                        "--zip-path", str(zip_path)]) == 0
    assert main(base + ["normalize", "--snapshot", "2026-01-01"]) == 0
    assert main(base + ["publish"]) == 0
    return dd


def _run(capsys, warehouse, *argv) -> str:
    assert main(["--data-dir", str(warehouse), *argv]) == 0
    return capsys.readouterr().out


def test_version(capsys):
    from hangarbay_spark import __version__

    assert main(["version"]) == 0
    assert f"hangarbay-spark version {__version__}" in capsys.readouterr().out


def test_cli_tables_and_schema(capsys, warehouse):
    out = _run(capsys, warehouse, "tables")
    assert "aircraft" in out and "owners_clean" in out.replace("\n", " ")
    out = _run(capsys, warehouse, "schema", "aircraft")
    assert "n_number" in out and "column_type" in out


def test_cli_search_table_dates(capsys, warehouse):
    """Table output formats dates as '%b %d, %Y' (reference
    cli.py:427-432); fixture cert_issue_date 20200110 -> Jan 10, 2020."""
    out = _run(capsys, warehouse, "search", "N221LA")
    assert "221LA" in out
    assert "Jan 10, 2020" in out
    assert "N/A" not in out.split("\n")[0]  # header untouched


def test_cli_search_json_keeps_iso(capsys, warehouse):
    out = _run(capsys, warehouse, "search", "221LA",
               "--output-format", "json")
    rows = json.loads(out)
    assert len(rows) == 1
    assert "Jan" not in out  # machine format, not display format


def test_cli_fleet_summary_and_export(capsys, warehouse, tmp_path):
    csv_path = tmp_path / "fleet.csv"
    out = _run(capsys, warehouse, "fleet", "smith|acme",
               "--export-csv", str(csv_path))
    # reference cli.py:639-648 summary stats after the table
    assert "Unique owners: 2" in out
    assert "Valid registrations:" in out
    assert "Manufacturers: 1" in out
    assert csv_path.exists() and len(csv_path.read_text().splitlines()) == 3

    # csv/json outputs stay clean of the summary
    out = _run(capsys, warehouse, "fleet", "smith|acme",
               "--output-format", "csv")
    assert "Unique owners" not in out


def test_cli_fleet_empty_term_matches_all(capsys, warehouse):
    """Reference parity: an empty search term builds LIKE '%%', which
    matches every owner (api.py:232) — must not crash."""
    out = _run(capsys, warehouse, "fleet", "", "--output-format", "csv")
    # all owner rows come back (fixture has 5 owner records)
    assert len(out.strip().splitlines()) > 1


def test_cli_sql_ilike(capsys, warehouse):
    out = _run(capsys, warehouse, "sql",
               "SELECT n_number FROM owners_clean "
               "WHERE owner_name LIKE '%acme%'",
               "-i", "--output-format", "json")
    rows = json.loads(out)
    assert [r["n_number"] for r in rows] == ["100"]


def test_cli_status(capsys, warehouse):
    out = _run(capsys, warehouse, "status")
    st = json.loads(out)
    assert st["latest_snapshot"] == "2026-01-01"
    assert "normalize" in st and "publish" in st


# -- fetch retry loop --------------------------------------------------------


class _FlakyOpener:
    """Fails with URLError on the first n_fail calls, then streams."""

    def __init__(self, n_fail: int, payload: bytes = b"zipbytes"):
        self.n_fail, self.payload, self.calls = n_fail, payload, 0

    def __call__(self, req, timeout=None):
        self.calls += 1
        if self.calls <= self.n_fail:
            import urllib.error

            raise urllib.error.URLError("flaky")
        opener = self

        class _Resp:
            def __enter__(self):
                self.left = opener.payload
                return self

            def __exit__(self, *a):
                return False

            def read(self, n):
                b, self.left = self.left, b""
                return b

        return _Resp()


def test_download_succeeds_on_third_attempt(tmp_path):
    opener = _FlakyOpener(n_fail=2)
    sleeps: list[float] = []
    dest = tmp_path / "x.zip"
    download("http://example.invalid/x.zip", dest,
             opener=opener, sleep=sleeps.append)
    assert dest.read_bytes() == b"zipbytes"
    assert opener.calls == 3
    assert sleeps == [2.0, 4.0]  # linear backoff between attempts


def test_download_raises_after_all_attempts(tmp_path):
    opener = _FlakyOpener(n_fail=99)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        download("http://example.invalid/x.zip", tmp_path / "y.zip",
                 opener=opener, sleep=lambda s: None)
    assert opener.calls == 3


def test_cli_queries_and_run(capsys):
    from hangarbay_spark.cli import main

    assert main(["queries"]) == 0
    out = capsys.readouterr().out
    assert "agg_pricing_summary" in out and "[oracle]" in out
    assert "text_pack_ffd" in out and "rows-only" in out

    assert (
        main(
            [
                "run",
                "topk_brands",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--output-format",
                "json",
            ]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 10
    assert {"p_brand", "n"} <= set(rows[0])

    assert main(["run", "no_such_query"]) == 2


def test_cli_run_explain(capsys):
    from hangarbay_spark.cli import main

    assert (
        main(["run", "topk_brands", "--sf-dir", "/root/testdata/sf0.001", "--explain"])
        == 0
    )
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "TakeOrderedAndProject" in out


def test_cli_compact(capsys, spark, tmp_path):
    from hangarbay_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(0, 5000).repartition(16).write.parquet(src)
    assert main(["compact", src, dst, "--target-mb", "1"]) == 0
    out = capsys.readouterr().out
    assert "(1 files)" in out  # 16 tiny files well under 1 MiB total
    assert spark.read.parquet(dst).count() == 5000


def test_cli_verify(capsys, warehouse):
    """`hangar verify` runs the distributed rule pass, prints one
    PASS/WARN/FAIL line per rule, and exits 1 on a hard-rule failure —
    which the fixture warehouse triggers by design (duplicate n_number
    757AF, the same duplicate test_aircraft_conventions pins)."""
    rc = main(["--data-dir", str(warehouse), "verify"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "\t" in ln]
    names = {ln.split("\t")[2] for ln in lines}
    assert {
        "unique_n_number",
        "owner_id_present",
        "zip5_format",
        "make_model_fk_coverage",
    } <= names
    assert rc == 1
    assert any(
        ln.startswith("FAIL\t[hard]\tunique_n_number") for ln in lines
    )
    # soft rules never FAIL, hard rules never WARN
    for ln in lines:
        mark, sev = ln.split("\t")[0], ln.split("\t")[1]
        assert (mark, sev) != ("FAIL", "[soft]")
        assert (mark, sev) != ("WARN", "[hard]")


def test_cli_index(capsys, tmp_path):
    """`hangar index` builds every corpus index artifact durably and
    prints the provenance metadata."""
    out_dir = tmp_path / "idx_root"
    rc = main(["index", "/root/testdata/sf0.001", str(out_dir)])
    out = capsys.readouterr().out
    assert rc == 0
    meta = json.loads(out)
    from hangarbay_spark.pipelines import indexes

    assert set(meta["artifacts"]) == set(indexes.ARTIFACTS)
    assert all(a["rows"] > 0 for a in meta["artifacts"].values())
    # root is basename + abs-path digest (provenance-keyed)
    roots = list(out_dir.glob("sf0.001-*/_meta/indexes.json"))
    assert len(roots) == 1


def test_cli_check(capsys):
    """`hangar check` differential-checks queries against their DuckDB
    oracles: MATCH for oracle-twinned, ROWS-ONLY for oracle-less."""
    rc = main(
        [
            "check",
            "topk_brands",
            "agg_approx_sketches",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "MATCH\ttopk_brands" in out
    assert "ROWS-ONLY\tagg_approx_sketches" in out
    assert main(["check", "nope"]) == 2


def test_cli_export_training_shards(capsys, tmp_path):
    out = str(tmp_path / "shards")
    assert main(["export", "/root/testdata/sf0.001", out,
                 "--shards", "2", "--seed", "epX"]) == 0
    import json as _json

    manifest = _json.loads(capsys.readouterr().out)
    assert manifest["n_shards"] == 2
    assert sum(manifest["per_shard_counts"].values()) == manifest[
        "n_exported_docs"
    ]
    assert (tmp_path / "shards" / "_meta" / "export.json").exists()
