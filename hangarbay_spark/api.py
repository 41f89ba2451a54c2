"""Python API surface — parity with the reference's ``hangarbay/api.py``
(load_data, search, fleet, query, status, list_tables, schema,
get_connection), rebuilt on a SparkSession.

Differences by design (SURVEY.md §3.3): parameterized templates become
DataFrame column expressions (no SQL-string interpolation, no injection
surface); results return as Spark DataFrames with ``.to_pandas``-style
collection left to the caller via ``collect=True`` (the reference always
returns pandas, /root/reference/hangarbay/api.py:194,268,302).
"""

from __future__ import annotations

import functools
import json
import operator
import re
from datetime import date, timedelta
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.config import get_data_dir, parquet_dir
from hangarbay_spark.pipelines.publish import publish
from hangarbay_spark.session import get_spark

STALE_DAYS = 30  # reference api.py:81-91

_ILIKE_RE = re.compile(r"(?<![A-Za-z_])LIKE(?![A-Za-z_])", re.IGNORECASE)


def rewrite_like_to_ilike(sql: str) -> str:
    """The CLI ``-i`` pre-pass (reference cli.py:209-212): rewrite LIKE
    to ILIKE (Spark supports ILIKE natively since 3.3)."""
    return _ILIKE_RE.sub("ILIKE", sql)


def normalize_n_number(term: str) -> str:
    """Upper-case and strip a leading 'N' (reference api.py:171-174)."""
    t = term.strip().upper()
    return t[1:] if t.startswith("N") and len(t) > 1 else t


class Hangarbay:
    """Session-scoped handle over the published warehouse.

    ``hb = Hangarbay(); hb.load_data(); hb.search("N221LA")``
    """

    def __init__(
        self,
        data_dir: str | Path | None = None,
        spark: SparkSession | None = None,
    ) -> None:
        self.data_dir = get_data_dir(data_dir)
        self.spark = spark or get_spark()
        self._published = False

    # -- pipeline ----------------------------------------------------------

    def load_data(self, force: bool = False) -> dict[str, int]:
        """Register the published tables/views into the session catalog.

        Unlike the reference (which auto-runs fetch+normalize+publish,
        api.py:94-101), the heavy pipeline stages are explicit
        (``pipelines.fetch`` / ``pipelines.normalize``); load_data only
        publishes already-normalized Parquet.
        """
        if self._published and not force:
            return {}
        counts = publish(self.spark, parquet_dir(self.data_dir))
        self._published = True
        return counts

    def _ensure_data(self) -> None:
        if not self._published:
            self.load_data()

    def is_stale(self) -> bool:
        """30-day freshness check against the newest raw manifest."""
        raw_root = Path(self.data_dir) / "raw"
        if not raw_root.exists():
            return True
        snaps = sorted(d.name for d in raw_root.iterdir() if d.is_dir())
        if not snaps:
            return True
        try:
            newest = date.fromisoformat(snaps[-1])
        except ValueError:
            return True
        return date.today() - newest > timedelta(days=STALE_DAYS)

    # -- queries -----------------------------------------------------------

    def search(self, n_number: str, collect: bool = True):
        """Point lookup on the decoded view + owners (reference
        api.py:153-197). The filter reaches the Parquet scan as a
        pushed-down predicate; with the sorted layout it is a
        single-row-group read."""
        self._ensure_data()
        term = normalize_n_number(n_number)
        decoded = self.spark.table("aircraft_decoded")
        owners = self.spark.table("owners_clean")
        out = (
            decoded.filter(F.upper(F.col("n_number")) == term)
            .join(owners, "n_number", "left")
        )
        return out.toPandas() if collect else out

    def fleet(
        self,
        owner: str,
        state: str | None = None,
        limit: int = 0,
        collect: bool = True,
    ):
        """Substring fleet search: ``|``-separated terms -> OR of
        case-insensitive LIKEs, optional state filter, ordered by
        n_number (reference api.py:200-271)."""
        self._ensure_data()
        owners = self.spark.table("owners_clean")
        decoded = self.spark.table("aircraft_decoded")
        # empty terms are kept: LIKE '%%' matches every row, exactly the
        # reference's behavior (api.py:232 builds '%'+term+'%' unfiltered)
        terms = [t.strip() for t in owner.split("|")]
        conds = [
            F.lower(F.col("owner_name")).contains(t.lower()) for t in terms
        ]
        out = owners.filter(functools.reduce(operator.or_, conds))
        if state:
            out = out.filter(F.upper(F.col("state")) == state.strip().upper())
        out = decoded.join(out, "n_number").orderBy("n_number")
        if limit and limit > 0:
            out = out.limit(limit)
        return out.toPandas() if collect else out

    def fts_search(self, query: str, mode: str = "all", collect: bool = True):
        """Token search over the publish-time owners FTS index (the
        reference's FTS5 intent, publish.py:286-304): per-term postings
        lookups against the ``owners_fts`` parquet artifact, semi-joined
        back to owners — the owners text columns are never re-scanned."""
        from hangarbay_spark.operators import fts

        self._ensure_data()
        idx = self.spark.table("owners_fts")
        owners = self.spark.table("owners")
        out = fts.search(owners, idx, "owner_id", query, mode=mode)
        return out.toPandas() if collect else out

    def query(self, sql: str, ilike: bool = False, collect: bool = True):
        """Ad-hoc SQL over the published catalog (reference api.py:274-305):
        parse/optimize/execute are Spark SQL + Catalyst + AQE."""
        self._ensure_data()
        if ilike:
            sql = rewrite_like_to_ilike(sql)
        out = self.spark.sql(sql)
        return out.toPandas() if collect else out

    # -- introspection -----------------------------------------------------

    def list_tables(self) -> list[str]:
        self._ensure_data()
        return sorted(t.name for t in self.spark.catalog.listTables())

    def schema(self, table: str) -> pd.DataFrame:
        self._ensure_data()
        fields = self.spark.table(table).schema.fields
        return pd.DataFrame(
            {
                "column_name": [f.name for f in fields],
                "column_type": [f.dataType.simpleString() for f in fields],
                "null": ["YES" if f.nullable else "NO" for f in fields],
            }
        )

    def status(self) -> dict:
        """Pipeline/provenance status from the metadata JSONs
        (reference api.py:338-376)."""
        out: dict = {"data_dir": str(self.data_dir), "published": self._published}
        meta = parquet_dir(self.data_dir) / "_meta"
        for stage in ("normalize", "publish"):
            p = meta / f"{stage}.json"
            if p.exists():
                out[stage] = json.loads(p.read_text())
        raw_root = Path(self.data_dir) / "raw"
        if raw_root.exists():
            snaps = sorted(d.name for d in raw_root.iterdir() if d.is_dir())
            if snaps:
                out["latest_snapshot"] = snaps[-1]
                out["stale"] = self.is_stale()
        return out

    def get_connection(self) -> SparkSession:
        """The reference returns a raw DuckDB connection
        (api.py:422-425); the Spark analog is the session itself."""
        self._ensure_data()
        return self.spark
