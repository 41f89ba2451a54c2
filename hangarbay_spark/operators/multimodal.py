"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container ships no image/audio codecs, so the decode kernels are
deterministic fakes behind ``_decode_bytes`` (clearly marked; swap in
Pillow/torchaudio/PyAV in a real deployment). Everything Spark-side is
real and tested: schemas, batch iteration, partition sizing, and the
UDF signatures — which is the part that must survive a 100 TB corpus.

Scale notes:
- payloads stay in ``binary`` columns; Arrow moves them to Python in
  columnar batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory — set it low for multi-MB payloads);
- per-row Python work is embarrassingly parallel: no shuffle is
  introduced by any map-style stage;
- frame sampling / resizing emit one row per output artifact via
  ``mapInPandas`` (a generator of DataFrames — no driver collection).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

FEATURE_DIM = 8


def _decode_bytes(payload: bytes | None, kind: str) -> list[float] | None:
    """STUB decode kernel — deterministic fake feature vector.

    A real deployment replaces this with Pillow / torchaudio / PyAV
    decoding; the container has no codec libraries. The fake is a
    sha256-derived unit-scale vector so downstream plumbing (similarity
    joins, dedup on features) is exercised with stable values.

    A null payload yields a null feature (consistent with the other
    null-safe columns) rather than failing the whole Arrow batch.
    """
    if payload is None:
        return None
    h = hashlib.sha256(kind.encode() + payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched, no shuffle)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sha256": pdf["payload"].map(
                        lambda p: hashlib.sha256(p).hexdigest()
                        if p is not None
                        else None
                    ),
                    "feature": [
                        _decode_bytes(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    The frame extraction itself is the stubbed decode (payload slices
    stand in for decoded frames); the fan-out shape — a mapInPandas
    generator emitting a variable number of rows per input — is the
    real contract a PyAV-backed kernel drops into.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vid = pdf[(pdf["kind"] == "video") & pdf["payload"].notna()]
            if vid.empty:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype=object),
                        "frame_idx": pd.Series([], dtype="int32"),
                        "frame_payload": pd.Series([], dtype=object),
                    }
                )
                continue
            # Vectorized fan-out: frame counts and slice offsets computed
            # column-wise; only the byte slicing touches Python objects.
            n_frames = (
                (vid["duration_ms"].fillna(0) // every_ms)
                .clip(lower=1)
                .astype("int64")
            )
            media_id = vid["media_id"].repeat(n_frames).reset_index(drop=True)
            frame_idx = np.concatenate(
                [np.arange(n, dtype="int32") for n in n_frames]
            )
            payloads = vid["payload"].repeat(n_frames).reset_index(drop=True)
            steps = np.concatenate(
                [
                    np.full(n, max(1, len(p) // n), dtype="int64")
                    for p, n in zip(vid["payload"], n_frames)
                ]
            )
            # STUB: slice of payload, not a decoded frame
            frame_payload = [
                p[i * s : (i + 1) * s]
                for p, i, s in zip(payloads, frame_idx, steps)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": frame_idx,
                    "frame_payload": frame_payload,
                }
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes metadata through, marks the new
    dimensions; payload transformation is the stubbed decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"].copy()
            # STUB: a real kernel decodes, resizes, re-encodes payload.
            img["width"] = width
            img["height"] = height
            yield img

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def make_media_rows(items: list[Mapping]) -> list[tuple]:
    """Helper to build MEDIA_SCHEMA-shaped rows from dicts (tests)."""
    return [
        (
            m["media_id"],
            m["kind"],
            m.get("payload"),
            m.get("mime", "application/octet-stream"),
            m.get("width"),
            m.get("height"),
            m.get("duration_ms"),
        )
        for m in items
    ]


# --- JPEG SOF marker walk (codec-free, REAL — not a decode stub) -----------
# JPEG dimensions live in a Start-Of-Frame segment (SOF0 baseline
# FFC0 / SOF2 progressive FFC2) whose OFFSET depends on every segment
# before it (APP0/JFIF, COM, DQT, DHT — all variable-length), so unlike
# the PNG/GIF/BMP/WAV fixed-offset parses this needs an actual marker
# walk: read FF<marker>, big-endian u16 segment length, skip, repeat.
# ISO/IEC 10918-1 layout; every inter-SOI/SOS segment carries a length.


def jpeg_sof_dims(
    data: bytes | None, max_segments: int = 64
) -> tuple[str, int, int] | None:
    """Bounded SOF0/SOF2 marker walk over one JPEG payload: returns
    (sof_kind, width, height) or None for non-JPEG / truncated /
    SOF-less input. Pure function shared by the Arrow kernel and its
    struct.pack-pinned tests (the wav/wordpiece discipline). The walk
    is bounded by ``max_segments`` hops — real headers hold < 20
    segments; a payload that hasn't produced a SOF by then is junk."""
    if data is None or len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    off = 2
    for _ in range(max_segments):
        if off + 4 > len(data) or data[off] != 0xFF:
            return None
        marker = data[off + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            return None
        seglen = int.from_bytes(data[off + 2 : off + 4], "big")
        if marker in (0xC0, 0xC2):
            if off + 9 > len(data) or seglen < 7:
                return None
            return (
                "sof0" if marker == 0xC0 else "sof2",
                int.from_bytes(data[off + 7 : off + 9], "big"),
                int.from_bytes(data[off + 5 : off + 7], "big"),
            )
        off += 2 + seglen
    return None


def jpeg_dims_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> (doc_id, sof, width,
    height) — Arrow-batched :func:`jpeg_sof_dims` per payload; non-JPEG
    rows come back with null sof/width/height (the caller filters or
    coalesces)."""
    for pdf in batches:
        res = pdf["payload"].map(jpeg_sof_dims)
        out = pdf[["doc_id"]].copy()
        out["sof"] = res.map(lambda r: r[0] if r else None)
        out["width"] = pd.array(
            [r[1] if r else None for r in res], dtype="Int64"
        )
        out["height"] = pd.array(
            [r[2] if r else None for r in res], dtype="Int64"
        )
        yield out


# ISO base media (MP4, ISO/IEC 14496-12) is a sequence of length-
# prefixed boxes: [u32 BE size][4-char type][payload]; movie metadata
# (timescale, duration) lives in moov/mvhd, whose OFFSET depends on
# every box before it (ftyp brand list, free/skip padding — all
# variable-length), so like JPEG this needs an actual box walk, not
# fixed-offset arithmetic. size == 0 is the legal "extends to EOF"
# terminal (mdat commonly uses it).


def mp4_moov_info(
    data: bytes | None, max_boxes: int = 16
) -> tuple[str | None, int, int] | None:
    """Bounded top-level box walk over one ISO-BMFF payload: returns
    (major_brand, timescale, duration) from ftyp + moov/mvhd(v0), or
    None for non-MP4 / truncated / moov-less input. Pure function
    shared by the Arrow kernel and its struct.pack-pinned tests (the
    wav/jpeg discipline)."""
    if data is None or len(data) < 16 or data[4:8] != b"ftyp":
        return None
    brand: str | None = None
    off = 0
    for _ in range(max_boxes):
        if off + 8 > len(data):
            return None
        size = int.from_bytes(data[off : off + 4], "big")
        btype = data[off + 4 : off + 8]
        if btype == b"ftyp":
            if off + 12 > len(data):
                return None
            brand = data[off + 8 : off + 12].decode("ascii", "replace")
        if btype == b"moov":
            c = off + 8  # first child box
            if c + 28 > len(data) or data[c + 4 : c + 8] != b"mvhd":
                return None
            if data[c + 8] != 0:  # mvhd v1 carries 64-bit times
                return None
            return (
                brand,
                int.from_bytes(data[c + 20 : c + 24], "big"),
                int.from_bytes(data[c + 24 : c + 28], "big"),
            )
        if size == 0:  # to-EOF box before any moov: metadata absent
            return None
        if size < 8:  # malformed: would loop in place
            return None
        off += size
    return None


def mp4_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> (doc_id, brand,
    timescale, duration) — Arrow-batched :func:`mp4_moov_info` per
    payload; non-MP4 rows come back with nulls (nullable Int64 per the
    null-input discipline)."""
    for pdf in batches:
        res = pdf["payload"].map(mp4_moov_info)
        out = pdf[["doc_id"]].copy()
        out["brand"] = res.map(lambda r: r[0] if r else None)
        out["timescale"] = pd.array(
            [r[1] if r else None for r in res], dtype="Int64"
        )
        out["duration"] = pd.array(
            [r[2] if r else None for r in res], dtype="Int64"
        )
        yield out


# --- BMP dHash perceptual fingerprint (codec-free, REAL) --------------------
# BMP payloads are raw pixel rows — the one image format the byte-walk
# kernels can decode without a codec library, which closes the gap
# between payload-EXACT dedup (sha256) and text near-dup: a perceptual
# hash groups images whose PIXELS nearly match even when bytes differ.
# dHash (difference hash): compare horizontally adjacent grayscale
# values; bit(r, c) = gray(r, c) < gray(r, c+1). A wxh grid yields
# h*(w-1) bits; with the 8x9 synthesis that is exactly 64 bits, packed
# row-major into four 16-bit words (w0..w3) — the same shape as the
# SimHash fingerprints, so Hamming<=d grouping reuses
# dedup.simhash_pairs_from_fingerprints (block pigeonhole) unchanged.

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w0", T.IntegerType()),
        T.StructField("w1", T.IntegerType()),
        T.StructField("w2", T.IntegerType()),
        T.StructField("w3", T.IntegerType()),
    ]
)


def bmp_dhash_fingerprints(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, w0..w3) dHash fingerprints from REAL BMP payload bytes via
    an Arrow ``mapInPandas`` kernel — an honest parse, not a stub: the
    pixel-array offset is read from the file header (LE u32 at byte
    10), width/height from the BITMAPINFOHEADER (LE i32 at 18/22, 24
    bpp required), rows are bottom-up with 4-byte padding per the BMP
    spec, and gray is the blue channel (synthesized payloads carry
    r=g=b). Per-row Python work only — no shuffle; the DuckDB oracle
    replays the same walk in hex-string coordinates (the JPEG
    SOF-walk discipline)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "w0": [],
                "w1": [],
                "w2": [],
                "w3": [],
            }
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                off = int.from_bytes(b[10:14], "little")
                wpx = int.from_bytes(b[18:22], "little", signed=True)
                hpx = int.from_bytes(b[22:26], "little", signed=True)
                bpp = int.from_bytes(b[28:30], "little")
                if bpp != 24 or hpx <= 0 or wpx < 2:
                    continue  # not a decodable 24bpp bottom-up BMP
                rowsz = (wpx * 3 + 3) // 4 * 4
                if len(b) < off + hpx * rowsz:
                    continue  # truncated payload: the row walk would
                    # run past the buffer and the short slice would
                    # crash the whole stage — skip per-row like the
                    # bpp guard (ADVICE r9)
                gray = np.zeros((hpx, wpx), dtype=np.int64)
                for rf in range(hpx):
                    row = b[off + rf * rowsz : off + rf * rowsz + wpx * 3]
                    gray[hpx - 1 - rf] = np.frombuffer(
                        row, dtype=np.uint8
                    )[0::3]
                bits = (gray[:, :-1] < gray[:, 1:]).astype(np.int64)
                flat = bits.flatten()[:64]  # row-major bit index r*(w-1)+c
                out["media_id"].append(int(mid))
                for j in range(4):
                    blk = flat[j * 16 : (j + 1) * 16]
                    out[f"w{j}"].append(
                        int((blk << np.arange(len(blk))).sum())
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, DHASH_SCHEMA)
