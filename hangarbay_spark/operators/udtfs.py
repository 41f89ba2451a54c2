"""Python UDTFs — the one-row-to-many-rows UDF surface (SURVEY §2.8).

``PiiSpans`` is the span-level twin of
``operators/filters.redact_pii_expr``: where the redactor rewrites text,
the UDTF emits one audit row per PII match with its character span —
the shape a compliance log or a labeling pipeline needs. Span semantics
mirror redaction-order precedence exactly (emails claim their characters
first, then IPs, then phones; a later pattern never matches inside an
earlier claim), so `n_spans(kind) == n_redactions(kind)` — pinned by
tests/test_operators.py::test_pii_spans_match_redaction_counts.

Scale: a UDTF runs per-row in the executors like any Python UDF — fine
for audit extraction (output-bound), but the redact/count COLUMN
expressions in operators/filters.py remain the hot-path tools. Use from
SQL via ``register_udtfs(spark)`` + ``LATERAL pii_spans(text)``, or
directly: ``PiiSpans(F.col("text"))``.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from hangarbay_spark.operators.filters import _PII_ORDER

PII_SPAN_SCHEMA = "kind string, start int, end int, excerpt string"

_KINDS = {tag: pat for pat, tag in _PII_ORDER}
_KIND_ORDER = tuple(tag for _, tag in _PII_ORDER)


@udtf(returnType=PII_SPAN_SCHEMA)
class PiiSpans:
    """Emit (kind, start, end, excerpt) per PII match, 0-based
    half-open char spans, in redaction precedence order."""

    def eval(self, text: str):  # noqa: D102 — contractual UDTF hook
        if text is None:
            return
        claimed: list[tuple[int, int]] = []
        for kind in _KIND_ORDER:
            tag = kind.strip("<>").lower()  # email / ip / phone
            for m in re.finditer(_KINDS[kind], text):
                span = (m.start(), m.end())
                if any(s < span[1] and span[0] < e for s, e in claimed):
                    continue  # inside an earlier kind's claim
                claimed.append(span)
                yield (tag, span[0], span[1], m.group(0))


def register_udtfs(spark: SparkSession) -> None:
    """Register all UDTFs for SQL use (``LATERAL pii_spans(text)``)."""
    spark.udtf.register("pii_spans", PiiSpans)
