"""``hangar``-style CLI — parity with the reference's Typer CLI surface
(/root/reference/hangarbay/cli.py: fetch / normalize / publish / update /
status / sql / search / fleet / tables / schema), on stdlib argparse
(typer is not in the runtime).

Usage:
    python -m hangarbay_spark.cli update --zip-path fixture.zip
    python -m hangarbay_spark.cli search N221LA
    python -m hangarbay_spark.cli fleet "netjets|flexjet" --state TX
    python -m hangarbay_spark.cli sql "SELECT ... " -i --output-format json
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys

import pandas as pd

from hangarbay_spark.api import Hangarbay
from hangarbay_spark.config import get_data_dir, parquet_dir, raw_dir


def _format_dates(df: pd.DataFrame) -> pd.DataFrame:
    """Human date display for table output — ``"%b %d, %Y"``, N/A for
    nulls (reference cli.py:427-432). json/csv keep machine formats."""

    def fmt(v):
        if pd.isna(v):
            return "N/A"
        return v.strftime("%b %d, %Y")

    out = df.copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.map(fmt)
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                out[c] = col.map(fmt)
    return out


def _emit(df, fmt: str, limit: int = 100) -> None:
    """table/json/csv rendering with the reference's 100-row display cap
    (reference cli.py:217-250)."""
    if len(df) > limit and fmt == "table":
        print(f"(showing first {limit} of {len(df)} rows)", file=sys.stderr)
        df = df.head(limit)
    if fmt == "json":
        print(df.to_json(orient="records", date_format="iso"))
    elif fmt == "csv":
        print(df.to_csv(index=False), end="")
    else:
        print(_format_dates(df).to_string(index=False))


def _fleet_summary(res: pd.DataFrame) -> list[str]:
    """Post-table fleet summary stats (reference cli.py:639-648):
    unique owners, Valid-registration count, unique manufacturers."""
    lines: list[str] = []
    if "owner_name" in res.columns:
        uo = res["owner_name"].nunique()
        if uo > 1:
            lines.append(f"Unique owners: {uo}")
    if "reg_status" in res.columns:
        sc = res["reg_status"].value_counts()
        if "Valid" in sc:
            lines.append(f"Valid registrations: {sc['Valid']}")
    if "maker" in res.columns:
        um = res[res["maker"].notna()]["maker"].nunique()
        if um > 0:
            lines.append(f"Manufacturers: {um}")
    return lines


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hangar", description=__doc__)
    p.add_argument("--data-dir", default=None, help="warehouse root")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("fetch", help="download/ingest a raw snapshot")
    sp.add_argument("--snapshot", default=None)
    sp.add_argument("--zip-path", default=None, help="local zip (offline)")

    sp = sub.add_parser("normalize", help="raw snapshot -> typed parquet")
    sp.add_argument("--snapshot", required=True)

    sub.add_parser("publish", help="register tables/views in the session")

    sp = sub.add_parser("update", help="fetch + normalize + publish")
    sp.add_argument("--snapshot", default=None)
    sp.add_argument("--zip-path", default=None)

    sub.add_parser("status", help="pipeline/provenance status")
    sub.add_parser("tables", help="list catalog tables")

    sp = sub.add_parser("schema", help="describe a table")
    sp.add_argument("table")

    sp = sub.add_parser("sql", help="ad-hoc SQL")
    sp.add_argument("query")
    sp.add_argument("-i", "--ilike", action="store_true", help="LIKE->ILIKE")
    sp.add_argument("--output-format", choices=("table", "json", "csv"), default="table")

    sp = sub.add_parser("search", help="point lookup by N-number")
    sp.add_argument("n_number")
    sp.add_argument("--output-format", choices=("table", "json", "csv"), default="table")

    sp = sub.add_parser("fleet", help="substring owner search")
    sp.add_argument("owner", help="'|'-separated terms")
    sp.add_argument("--state", default=None)
    sp.add_argument("--limit", type=int, default=0)
    sp.add_argument("--output-format", choices=("table", "json", "csv"), default="table")
    sp.add_argument("--export-csv", default=None, help="write results to a CSV file")

    sub.add_parser(
        "verify",
        help="data-quality rule pass over the published tables "
        "(exit 1 on hard-rule failure, 0 otherwise)",
    )

    sub.add_parser("version", help="show version")

    sub.add_parser("queries", help="list the declared query registry")

    sp = sub.add_parser(
        "run", help="run a declared registry query against a parquet dir"
    )
    sp.add_argument("name", help="registry query name (see `hangar queries`)")
    sp.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory of <table>.parquet inputs",
    )
    sp.add_argument("--output-format", choices=("table", "json", "csv"), default="table")
    sp.add_argument(
        "--explain",
        action="store_true",
        help="print the physical plan instead of executing",
    )

    sp = sub.add_parser(
        "audit",
        help="plan-audit a registry query for cluster-scale hazards "
        "(cartesian products, unbounded nested-loop joins, missing "
        "pushdown, wide scans); exit 1 on hazards",
    )
    sp.add_argument(
        "names",
        nargs="*",
        help="registry query names (default: every query)",
    )
    sp.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="directory of <table>.parquet inputs",
    )

    sp = sub.add_parser(
        "check",
        help="differential-check declared queries against their DuckDB "
        "oracles over a parquet dir (exit 1 on any mismatch)",
    )
    sp.add_argument(
        "names",
        nargs="*",
        help="registry query names (default: every query)",
    )
    sp.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory of <table>.parquet inputs",
    )

    sp = sub.add_parser(
        "index",
        help="build ALL durable corpus index artifacts (FTS postings, "
        "positional postings, MinHash + hyperplane signatures) into an "
        "index root; later sessions set HANGARBAY_INDEX_DIR to query "
        "them without rebuilding",
    )
    sp.add_argument("corpus_dir", help="directory of <table>.parquet inputs")
    sp.add_argument("out_dir", help="index root to build into")

    sp = sub.add_parser(
        "export",
        help="materialize the training corpus: exact dedup + length "
        "gate -> deterministic epoch shuffle -> order-preserving "
        "sharded parquet + manifest (re-export with a new --seed for "
        "the next epoch)",
    )
    sp.add_argument("corpus_dir", help="directory of <table>.parquet inputs")
    sp.add_argument("out_dir", help="destination (shard=K dirs + _meta)")
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--seed", default="ep1")
    sp.add_argument("--min-chars", type=int, default=1)
    sp.add_argument("--no-dedup", action="store_true")

    sp = sub.add_parser(
        "compact",
        help="rewrite a parquet directory into target-sized files "
        "(small-file maintenance, like OPTIMIZE)",
    )
    sp.add_argument("src", help="source parquet directory")
    sp.add_argument("dst", help="destination directory (overwritten)")
    sp.add_argument(
        "--target-mb", type=int, default=128, help="target file size in MiB"
    )
    sp.add_argument(
        "--no-shuffle",
        action="store_true",
        help="coalesce instead of repartition (no shuffle, skew-prone)",
    )

    args = p.parse_args(argv)

    if args.cmd == "version":
        from hangarbay_spark import __version__

        print(f"hangarbay-spark version {__version__}")
        return 0

    if args.cmd == "queries":
        from hangarbay_spark.queries import REGISTRY

        for name in sorted(REGISTRY):
            spec = REGISTRY[name]
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t[{oracle}]\t{spec.description.splitlines()[0]}")
        return 0

    if args.cmd == "run":
        from hangarbay_spark.queries import REGISTRY
        from hangarbay_spark.session import get_spark

        if args.name not in REGISTRY:
            print(
                f"unknown query {args.name!r}; see `hangar queries`",
                file=sys.stderr,
            )
            return 2
        spark = get_spark(app_name=f"hangar_run_{args.name}")
        df = REGISTRY[args.name].fn(spark, args.sf_dir.rstrip("/"))
        if args.explain:
            df.explain("formatted")  # prints the plan to stdout
            return 0
        _emit(df.toPandas(), args.output_format)
        return 0

    if args.cmd == "audit":
        from hangarbay_spark.plans.audit import audit_query
        from hangarbay_spark.queries import REGISTRY
        from hangarbay_spark.session import get_spark

        names = args.names or sorted(REGISTRY)
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        spark = get_spark(app_name="hangar_audit")
        hazards = 0
        for n in names:
            a = audit_query(spark, n, args.sf_dir.rstrip("/"))
            for line in a.lines():
                print(line)
            print()
            if not a.ok:
                hazards += 1
        return 1 if hazards else 0

    if args.cmd == "check":
        from hangarbay_spark.queries import REGISTRY
        from hangarbay_spark.queries.compare import (
            compare_query,
            duckdb_connection,
        )
        from hangarbay_spark.session import get_spark

        names = args.names or sorted(REGISTRY)
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        spark = get_spark(app_name="hangar_check")
        con = duckdb_connection(args.sf_dir.rstrip("/"))
        failed = 0
        try:
            for n in names:
                r = compare_query(spark, n, args.sf_dir.rstrip("/"), con=con)
                if r.oracle_rows is None:
                    print(f"ROWS-ONLY\t{n}\t{r.spark_rows} rows")
                elif r.ok:
                    print(f"MATCH\t{n}\t{r.spark_rows} rows")
                else:
                    failed += 1
                    print(
                        f"MISMATCH\t{n}\tspark={r.spark_rows} "
                        f"oracle={r.oracle_rows} schema={r.schema_match} "
                        f"values={r.values_match} diffs={r.first_diffs}"
                    )
        finally:
            con.close()
        return 1 if failed else 0

    if args.cmd == "index":
        from hangarbay_spark.pipelines.indexes import publish_corpus_indexes
        from hangarbay_spark.session import get_spark

        spark = get_spark(app_name="hangar_index")
        meta = publish_corpus_indexes(
            spark, args.corpus_dir.rstrip("/"), args.out_dir
        )
        print(json.dumps(meta, indent=2))
        return 0

    if args.cmd == "export":
        from hangarbay_spark.pipelines.export import export_training_shards
        from hangarbay_spark.session import get_spark

        spark = get_spark(app_name="hangar_export")
        manifest = export_training_shards(
            spark,
            args.corpus_dir.rstrip("/"),
            args.out_dir,
            n_shards=args.shards,
            seed=args.seed,
            dedup_exact=not args.no_dedup,
            min_chars=args.min_chars,
        )
        print(json.dumps(manifest, indent=2))
        return 0

    if args.cmd == "compact":
        from hangarbay_spark.plans.layout import compact_files
        from hangarbay_spark.session import get_spark

        spark = get_spark(app_name="hangar_compact")
        n = compact_files(
            spark,
            args.src,
            args.dst,
            target_file_bytes=args.target_mb * 1024 * 1024,
            shuffle=not args.no_shuffle,
        )
        print(f"compacted {args.src} -> {args.dst} ({n} files)")
        return 0

    data_dir = get_data_dir(args.data_dir)

    if args.cmd == "fetch":
        from hangarbay_spark.pipelines.fetch import fetch_snapshot

        snap = fetch_snapshot(data_dir, snapshot=args.snapshot, zip_path=args.zip_path)
        print(f"fetched -> {snap}")
        return 0

    hb = Hangarbay(data_dir=data_dir)

    if args.cmd == "normalize":
        from hangarbay_spark.pipelines.normalize import normalize_snapshot

        counts = normalize_snapshot(
            hb.spark, raw_dir(data_dir, args.snapshot), parquet_dir(data_dir)
        )
        print(json.dumps(counts, indent=2))
    elif args.cmd == "publish":
        print(json.dumps(hb.load_data(force=True), indent=2))
    elif args.cmd == "update":
        from hangarbay_spark.pipelines.fetch import fetch_snapshot
        from hangarbay_spark.pipelines.normalize import normalize_snapshot

        snap = fetch_snapshot(data_dir, snapshot=args.snapshot, zip_path=args.zip_path)
        normalize_snapshot(hb.spark, snap, parquet_dir(data_dir))
        print(json.dumps(hb.load_data(force=True), indent=2))
    elif args.cmd == "verify":
        # the reference planned this stage (`make verify`,
        # /root/reference/Makefile:26-27, PLANNING.md:167-182) but left
        # it a stub; here the rules run distributed (pipelines/verify.py)
        from hangarbay_spark.pipelines.verify import run_all

        hb.load_data()
        results = run_all(hb.spark)
        hard_failed = False
        for r in results:
            if r.ok:
                mark = "PASS"
            elif r.severity == "hard":
                mark, hard_failed = "FAIL", True
            else:
                mark = "WARN"
            print(
                f"{mark}\t[{r.severity}]\t{r.name}\t"
                f"{r.violations}/{r.total} violations"
            )
        return 1 if hard_failed else 0
    elif args.cmd == "status":
        print(json.dumps(hb.status(), indent=2, default=str))
    elif args.cmd == "tables":
        for t in hb.list_tables():
            print(t)
    elif args.cmd == "schema":
        _emit(hb.schema(args.table), "table")
    elif args.cmd == "sql":
        _emit(hb.query(args.query, ilike=args.ilike), args.output_format)
    elif args.cmd == "search":
        _emit(hb.search(args.n_number), args.output_format)
    elif args.cmd == "fleet":
        res = hb.fleet(args.owner, state=args.state, limit=args.limit)
        if args.export_csv:
            res.to_csv(args.export_csv, index=False)
            print(f"wrote {len(res)} rows -> {args.export_csv}", file=sys.stderr)
        _emit(res, args.output_format)
        if args.output_format == "table":
            for line in _fleet_summary(res):
                print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
