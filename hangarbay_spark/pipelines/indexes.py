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

import hashlib
import json
import os
import shutil
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
    "fts_tf": "fts_tf.parquet",
    "fts_doclen": "fts_doclen.parquet",
    "minhash_sigs": "minhash_sigs.parquet",
    "hyperplane_sigs": "hyperplane_sigs.parquet",
    "simhash_sigs": "simhash_sigs.parquet",
    # ..._q dirs: the round-10 quantized-integer PQ format (micro-unit
    # bigint codebooks, sqrt(|qv|^2) norms) — renamed so a durable root
    # can never serve a stale float-format artifact to the new readers
    "pq_books": "pq_books_q.parquet",
    "pq_codes": "pq_codes_q.parquet",
    "ivfpq_codes": "ivfpq_codes_q.parquet",
    "ivfpq_coarse": "ivfpq_coarse_q.parquet",
    "ivfpq_books": "ivfpq_books_q.parquet",
    "ivfpq_res_codes": "ivfpq_res_codes_q.parquet",
    "ivfpq_res_coarse": "ivfpq_res_coarse_q.parquet",
    "ivfpq_res_books": "ivfpq_res_books_q.parquet",
    "quantized": "quantized.parquet",
    "events_bydate": "events_bydate.parquet",
    "winnow_fps": "winnow_fps.parquet",
    "nsw_adj": "nsw_adj.parquet",
    "nsw_sigs": "nsw_sigs.parquet",
    "quality_model": "quality_model.parquet",
}

# corpus tables the artifacts are derived from: the staleness scope.
# Any of these regenerating in place invalidates the WHOLE root (the
# driver regenerates corpus dirs wholesale, so per-artifact scoping
# would buy nothing).
_SOURCE_TABLES = ("documents", "embeddings", "events")

_TEMP_ROOTS: dict[str, str] = {}


def _corpus_fingerprint(corpus_dir: str) -> dict:
    """Cheap provenance fingerprint of the tables the artifacts derive
    from: per data file (relpath, size, mtime_ns). A regenerated corpus
    changes mtimes/sizes even when the path is identical."""
    fp: dict[str, list] = {}
    for tbl in _SOURCE_TABLES:
        p = Path(corpus_dir) / f"{tbl}.parquet"
        if not p.exists():
            continue
        files = sorted(f for f in p.rglob("*") if f.is_file()) if p.is_dir() else [p]
        fp[tbl] = [
            [str(f.relative_to(p.parent)), f.stat().st_size, f.stat().st_mtime_ns]
            for f in files
        ]
    return fp


def _validate_root(root: Path, abs_corpus: str) -> None:
    """Guard against serving stale artifacts: the root records which
    corpus (path + file fingerprint) built it in ``_meta/source.json``;
    any mismatch wipes the artifact dirs so ensure_* rebuilds. Without
    this, two corpus dirs sharing a basename — or one regenerated
    in place — would silently reuse each other's signatures (wrong
    results, not a failure)."""
    meta = root / "_meta" / "source.json"
    current = {"source": abs_corpus, "fingerprint": _corpus_fingerprint(abs_corpus)}
    if meta.exists():
        try:
            recorded = json.loads(meta.read_text())
        except (OSError, ValueError):
            recorded = None
        if recorded == current:
            return
        for sub in ARTIFACTS.values():
            shutil.rmtree(root / sub, ignore_errors=True)
    meta.parent.mkdir(parents=True, exist_ok=True)
    meta.write_text(json.dumps(current, indent=2))


def index_root(corpus_dir: str) -> str:
    """The index root for ``corpus_dir`` (see module docstring).

    Keyed by basename PLUS a hash of the absolute path so distinct
    corpus dirs with equal basenames (e.g. two sf0.1 copies) can never
    collide under one ``HANGARBAY_INDEX_DIR``; reuse is additionally
    gated on a source fingerprint (see :func:`_validate_root`)."""
    env = os.environ.get("HANGARBAY_INDEX_DIR")
    if env:
        abs_corpus = str(Path(corpus_dir.rstrip("/")).resolve())
        digest = hashlib.sha256(abs_corpus.encode()).hexdigest()[:12]
        root = Path(env) / f"{Path(abs_corpus).name}-{digest}"
        root.mkdir(parents=True, exist_ok=True)
        _validate_root(root, abs_corpus)
        return str(root)
    root = _TEMP_ROOTS.get(corpus_dir)
    if root is None:
        import atexit

        root = tempfile.mkdtemp(prefix="hb_indexes_")
        _TEMP_ROOTS[corpus_dir] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    # temp roots validate too (ADVICE r5): a corpus regenerated in
    # place mid-process must not serve artifacts built from its old
    # contents — the fingerprint check wipes them so ensure_* rebuilds.
    _validate_root(
        Path(root), str(Path(corpus_dir.rstrip("/")).resolve())
    )
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


def ensure_fts_tf(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(token, doc_id, tf) term-frequency postings — the ranked-search
    (BM25) index, built once per root."""
    path = artifact_path(corpus_dir, "fts_tf")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        fts.save_index(
            fts.build_tf_index(docs, "doc_id", "text"),
            path,
            buckets=FTS_BUCKETS,
        )
    return fts.load_index(spark, path)


def ensure_fts_doclen(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(doc_id, dl) document token lengths — BM25's length-normalization
    table, built once per root."""
    path = artifact_path(corpus_dir, "fts_doclen")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        fts.build_doclen(docs, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


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


def ensure_simhash_sigs(spark: SparkSession, corpus_dir: str) -> str:
    """SimHash fingerprint table (id, w0..w3, simhash) for documents;
    returns its path. The 64 vote-sums over token postings are the
    expensive stage of every Hamming search — build-once parity with
    the MinHash and hyperplane signature tables."""
    path = artifact_path(corpus_dir, "simhash_sigs")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        D.write_simhash_fingerprint_table(docs, "doc_id", "text", path)
    return path


def ensure_pq_index(spark: SparkSession, corpus_dir: str) -> tuple[str, str]:
    """PQ codebooks + corpus code table for embeddings; returns
    (codes_path, books_path). Training uses the same bounded
    deterministic sample as the inline pq_topk trainer, so
    persisted-index searches match the inline query row-for-row; the
    corpus-wide encode pass is paid once here."""
    codes_path = artifact_path(corpus_dir, "pq_codes")
    books_path = artifact_path(corpus_dir, "pq_books")
    if not (_is_built(codes_path) and _is_built(books_path)):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_pq_index(emb, codes_path, books_path, dim=EMB_DIM)
    return codes_path, books_path


def ensure_ivfpq_index(
    spark: SparkSession, corpus_dir: str
) -> tuple[str, str, str]:
    """IVFADC index for embeddings: cell-PARTITIONED code parquet plus
    coarse + subspace codebooks; returns (codes, coarse, books) paths.
    Same bounded training sample as the inline ivfpq_topk trainer, so
    persisted searches match it row-for-row; the probed-cell partition
    pruning is the point of the layout."""
    codes_path = artifact_path(corpus_dir, "ivfpq_codes")
    coarse_path = artifact_path(corpus_dir, "ivfpq_coarse")
    books_path = artifact_path(corpus_dir, "ivfpq_books")
    if not (
        _is_built(codes_path)
        and _is_built(coarse_path)
        and _is_built(books_path)
    ):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_ivfpq_index(
            emb, codes_path, coarse_path, books_path, dim=EMB_DIM
        )
    return codes_path, coarse_path, books_path


def ensure_ivfpq_residual_index(
    spark: SparkSession, corpus_dir: str
) -> tuple[str, str, str]:
    """Residual (IVFADC-proper) twin of :func:`ensure_ivfpq_index`:
    subspace codebooks trained on and codes encoding
    ``x - centroid(cell)`` — lower quantization error at identical
    m/ksub/nlist geometry. The residual flag rides with the artifact
    (books ``_meta.json``); readers derive it from there."""
    codes_path = artifact_path(corpus_dir, "ivfpq_res_codes")
    coarse_path = artifact_path(corpus_dir, "ivfpq_res_coarse")
    books_path = artifact_path(corpus_dir, "ivfpq_res_books")
    if not (
        _is_built(codes_path)
        and _is_built(coarse_path)
        and _is_built(books_path)
    ):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_ivfpq_index(
            emb, codes_path, coarse_path, books_path, dim=EMB_DIM,
            residual=True,
        )
    return codes_path, coarse_path, books_path


def ensure_nsw_index(
    spark: SparkSession, corpus_dir: str
) -> tuple[str, str]:
    """NSW graph-ANN index for embeddings: edge postings + the index's
    OWN signature table (appends never mutate the shared
    hyperplane_sigs artifact); returns (adj_path, sigs_path).  Graph
    parameters and band geometry ride in side files."""
    adj_path = artifact_path(corpus_dir, "nsw_adj")
    sigs_path = artifact_path(corpus_dir, "nsw_sigs")
    if not (_is_built(adj_path) and _is_built(sigs_path)):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_nsw_index(emb, adj_path, sigs_path, dim=EMB_DIM)
    return adj_path, sigs_path


def ensure_quality_model(spark: SparkSession, corpus_dir: str) -> str:
    """Trained quality-classifier model (34 micro-weight rows) as a
    durable artifact: train once at publish time, score forever — the
    deployment shape of quality_classifier_apply and the model the
    streaming admission maintenance broadcasts per micro-batch.
    Training hyperparameters ride in a side file (the persisted-
    geometry rule: readers derive them from the artifact, never the
    module defaults)."""
    from hangarbay_spark.operators import classifier as C

    path = artifact_path(corpus_dir, "quality_model")
    if not _is_built(path):
        docs = load_table(spark, corpus_dir, "documents")
        feats, labels = C.qc_features(docs)
        w = C.qc_train(feats, labels, labels.count())
        # Side file BEFORE the parquet: _is_built keys on the parquet
        # _SUCCESS marker, so writing the parquet first leaves a crash
        # window where the artifact looks built but every reader's
        # geometry validation raises FileNotFoundError forever
        # (ADVICE r9).  Side-file-first self-heals: a crash between
        # the two writes leaves _is_built false and the next ensure
        # call rewrites both.
        Path(path.rstrip("/") + "_model.json").write_text(
            json.dumps(
                {
                    "buckets": C.QC_B,
                    "bias": C.QC_BIAS,
                    "len_feature": C.QC_LENF,
                    "lr": C.QC_LR,
                    "rounds": C.QC_ROUNDS,
                    "threshold_micro": C.QC_THR,
                }
            )
        )
        C.weights_df(spark, w).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def ensure_winnow_index(spark: SparkSession, corpus_dir: str) -> str:
    """Persisted winnowing fingerprint table over the NON-BATCH
    documents (doc_id % 10 != 0 — the incremental demo's frozen
    corpus); returns its path. Geometry (k, w) rides in the side
    file."""
    path = artifact_path(corpus_dir, "winnow_fps")
    if not _is_built(path):
        from pyspark.sql import functions as F

        docs = load_table(spark, corpus_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        D.write_winnow_fingerprint_table(
            docs, "doc_id", "text", path, k=5, w=4
        )
    return path


def ensure_events_partitioned(spark: SparkSession, corpus_dir: str) -> str:
    """Events re-laid-out as date-partitioned parquet (the layout under
    which day-scoped queries prune at the parquet file listing); returns
    its path. A durable artifact like every other index: root keyed by
    corpus path+hash, reuse gated on the source fingerprint (a corpus
    regenerated in place auto-invalidates — ADVICE r5), cleaned up at
    process exit for temp roots."""
    path = artifact_path(corpus_dir, "events_bydate")
    if not _is_built(path):
        from pyspark.sql import functions as F

        from hangarbay_spark.plans.layout import write_partitioned
        from hangarbay_spark.queries.base import load_events

        ev = load_events(spark, corpus_dir).withColumn(
            "d", F.to_date("ts")
        )
        write_partitioned(ev, path, "d")
    return path


def ensure_quantized_table(spark: SparkSession, corpus_dir: str) -> str:
    """Persisted int8-quantized embedding table; returns its path. The
    per-vector scale/floor projection is paid once here; searches scan
    4x-smaller integer rows."""
    path = artifact_path(corpus_dir, "quantized")
    if not _is_built(path):
        emb = load_table(spark, corpus_dir, "embeddings")
        S.write_quantized_table(emb, path)
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
        ensure_fts_tf(spark, corpus_dir)
        ensure_fts_doclen(spark, corpus_dir)
        ensure_minhash_sigs(spark, corpus_dir)
        ensure_hyperplane_sigs(spark, corpus_dir)
        ensure_simhash_sigs(spark, corpus_dir)
        ensure_pq_index(spark, corpus_dir)
        ensure_ivfpq_index(spark, corpus_dir)
        ensure_ivfpq_residual_index(spark, corpus_dir)
        ensure_winnow_index(spark, corpus_dir)
        ensure_nsw_index(spark, corpus_dir)
        ensure_quality_model(spark, corpus_dir)
        ensure_quantized_table(spark, corpus_dir)
        ensure_events_partitioned(spark, corpus_dir)
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
                "simhash_bits": D.SIMHASH_BITS,
                "simhash_blocks": D.SIMHASH_BLOCKS,
                "pq_m": 4,
                "pq_ksub": 16,
                "ivfpq_nlist": 16,
                "ivfpq_nprobe": 4,
                "nsw_degree": S.NSW_DEGREE,
                "nsw_beam": S.NSW_BEAM,
                "nsw_rounds": S.NSW_ROUNDS,
                "nsw_entries": S.NSW_ENTRIES,
                "qc_buckets": 32,
                "qc_gd_rounds": 6,
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
