"""Durable index artifacts for the corpus tables.

The reference builds its FTS index once, at *publish* time, into the
data directory (/root/reference/pipelines/publish.py:286-304). The
Spark analog: every build-once/query-many artifact — FTS postings,
positional postings, MinHash signatures, hyperplane signatures — is
parquet in a single index root, built by :func:`publish_corpus_indexes`
during publish and merely *read* at query time.

Resolution order for the root (per corpus dir):
1. ``$HANGARBAY_INDEX_DIR`` — a published, durable warehouse location
   (``hangar update``-style runs set this once; artifacts survive the
   process and are listed in ``_meta/indexes.json``);
2. a process-lifetime tempdir (test/ad-hoc fallback: first query
   builds, later queries in the same process reuse).

Every ``ensure_*`` helper is idempotent: if the artifact directory
already holds a ``_SUCCESS`` marker it is read, never rebuilt — so a
pre-published root turns all first-query build costs into plain reads.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hangarbay_spark.operators import dedup as D
from hangarbay_spark.operators import fts
from hangarbay_spark.operators import similarity as S


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # local twin of queries.base.load_table — importing queries here
    # would be circular (query modules consume this module)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

FTS_BUCKETS = 16
EMB_DIM = 64

# artifact name -> subdirectory under the index root
ARTIFACTS = {
    "fts": "fts.parquet",
    "fts_pos": "fts_pos.parquet",
    "minhash_sigs": "minhash_sigs.parquet",
    "hyperplane_sigs": "hyperplane_sigs.parquet",
}

_TEMP_ROOTS: dict[str, str] = {}


def index_root(corpus_dir: str) -> str:
    """The index root for ``corpus_dir`` (see module docstring)."""
    env = os.environ.get("HANGARBAY_INDEX_DIR")
    if env:
        root = str(Path(env) / Path(corpus_dir.rstrip("/")).name)
        Path(root).mkdir(parents=True, exist_ok=True)
        return root
    root = _TEMP_ROOTS.get(corpus_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="hb_indexes_")
        _TEMP_ROOTS[corpus_dir] = root
    return root


def artifact_path(corpus_dir: str, name: str) -> str:
    return str(Path(index_root(corpus_dir)) / ARTIFACTS[name])


def _is_built(path: str) -> bool:
    return (Path(path) / "_SUCCESS").exists()


def ensure_fts(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(token, doc_id) postings for documents — built once per root."""
    path = artifact_path(corpus_dir, "fts")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        fts.save_index(
            fts.build_inverted_index(docs, "doc_id", "text"),
            path,
            buckets=FTS_BUCKETS,
        )
    return fts.load_index(spark, path)


def ensure_fts_pos(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(token, doc_id, pos) positional postings — built once per root."""
    path = artifact_path(corpus_dir, "fts_pos")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        fts.save_index(
            fts.build_positional_index(docs, "doc_id", "text"),
            path,
            buckets=FTS_BUCKETS,
        )
    return fts.load_index(spark, path)


def ensure_minhash_sigs(spark: SparkSession, corpus_dir: str) -> str:
    """MinHash signature table for documents; returns its path."""
    path = artifact_path(corpus_dir, "minhash_sigs")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        D.write_minhash_signature_table(docs, "doc_id", "text", path)
    return path


def ensure_hyperplane_sigs(spark: SparkSession, corpus_dir: str) -> str:
    """Hyperplane band-signature table for embeddings; returns its path.

    Built with the oracle-exact expression path so persisted-signature
    queries stay hash-identical to their inline twins."""
    path = artifact_path(corpus_dir, "hyperplane_sigs")
    if not _is_built(path):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_hyperplane_signature_table(emb, path, dim=EMB_DIM)
    return path


def publish_corpus_indexes(
    spark: SparkSession, corpus_dir: str, out_dir: str | Path
) -> dict:
    """Build ALL corpus index artifacts into ``out_dir`` durably and
    record provenance in ``{out_dir}/{corpus}/_meta/indexes.json``.

    This is the ``hangar update`` analog for the corpus tables: one
    publish pass pays every build cost; subsequent sessions that set
    ``HANGARBAY_INDEX_DIR={out_dir}`` resolve every persisted-index
    query to plain parquet reads."""
    out_dir = str(out_dir)
    prev = os.environ.get("HANGARBAY_INDEX_DIR")
    os.environ["HANGARBAY_INDEX_DIR"] = out_dir
    try:
        t0 = time.time()
        ensure_fts(spark, corpus_dir)
        ensure_fts_pos(spark, corpus_dir)
        ensure_minhash_sigs(spark, corpus_dir)
        ensure_hyperplane_sigs(spark, corpus_dir)
        root = Path(index_root(corpus_dir))
        meta = {
            "source": str(corpus_dir),
            "artifacts": {
                name: {
                    "path": str(root / sub),
                    "rows": spark.read.parquet(str(root / sub)).count(),
                }
                for name, sub in ARTIFACTS.items()
            },
            "params": {
                "fts_buckets": FTS_BUCKETS,
                "emb_dim": EMB_DIM,
                "hyperplane_bits": S.HYPERPLANE_BITS,
                "hyperplane_bands": S.HYPERPLANE_BANDS,
            },
            "elapsed_sec": round(time.time() - t0, 2),
        }
        meta_dir = root / "_meta"
        meta_dir.mkdir(parents=True, exist_ok=True)
        (meta_dir / "indexes.json").write_text(json.dumps(meta, indent=2))
        return meta
    finally:
        if prev is None:
            os.environ.pop("HANGARBAY_INDEX_DIR", None)
        else:
            os.environ["HANGARBAY_INDEX_DIR"] = prev
