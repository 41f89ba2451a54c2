"""Fetch stage: FAA registry zip -> dated raw snapshot + manifest.

Driver-side I/O, deliberately not a Spark job (reference
/root/reference/pipelines/fetch.py:34-195): ingress of one ~70 MB zip
is not distributable work. At real scale the same manifest/provenance
contract would wrap a distributed ``binaryFile`` read of an object
store prefix.

Provenance contract preserved: dated snapshot dir, SHA256 per extracted
file, schema hashes of the target tables, previous-snapshot pointer for
diffing (reference fetch.py:80-101,181-190).
"""

from __future__ import annotations

import hashlib
import json
import time
import urllib.error
import urllib.request
import zipfile
from datetime import date
from pathlib import Path

from hangarbay_spark.schemas import all_schema_hashes

FAA_URL = (
    "https://registry.faa.gov/database/ReleasableAircraft.zip"
)
REQUIRED_FILES = ("MASTER.txt", "ACFTREF.txt", "ENGINE.txt")
TIMEOUT_SEC = 180
DOWNLOAD_RETRIES = 3
BACKOFF_SEC = 2.0


def sha256_file(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def download(
    url: str,
    dest: Path,
    timeout: int = TIMEOUT_SEC,
    retries: int = DOWNLOAD_RETRIES,
    backoff: float = BACKOFF_SEC,
    opener=urllib.request.urlopen,
    sleep=time.sleep,
) -> Path:
    """Streamed download with browser-ish headers (the FAA server
    rejects default urllib agents; reference fetch.py:40-47) and
    ``retries`` attempts with linear backoff (reference fetch.py:34-73 —
    the FAA server flakes; a partial file from a failed attempt is
    overwritten by the next). ``opener``/``sleep`` are injectable so
    tests can drive the retry loop offline."""
    req = urllib.request.Request(
        url, headers={"User-Agent": "Mozilla/5.0 (hangarbay-spark)"}
    )
    last_err: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            with opener(req, timeout=timeout) as resp, open(
                dest, "wb"
            ) as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
            return dest
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last_err = e
            if attempt < retries:
                sleep(backoff * attempt)
    raise RuntimeError(
        f"download failed after {retries} attempts: {url}"
    ) from last_err


def extract(zip_path: Path, out_dir: Path) -> dict[str, str]:
    """Extract the three registry files; return per-file SHA256."""
    hashes: dict[str, str] = {}
    with zipfile.ZipFile(zip_path) as zf:
        for name in REQUIRED_FILES:
            zf.extract(name, out_dir)
            hashes[name] = sha256_file(out_dir / name)
    return hashes


def previous_snapshot(raw_root: Path, current: str) -> str | None:
    """Latest dated snapshot dir older than ``current`` (for diffing)."""
    if not raw_root.exists():
        return None
    older = sorted(
        d.name
        for d in raw_root.iterdir()
        if d.is_dir() and d.name < current and (d / "manifest.json").exists()
    )
    return older[-1] if older else None


def write_manifest(
    snapshot_dir: Path,
    snapshot: str,
    file_hashes: dict[str, str],
    prev: str | None,
    source_url: str,
) -> Path:
    manifest = {
        "snapshot": snapshot,
        "source_url": source_url,
        "files": file_hashes,
        "schema_hashes": all_schema_hashes(),
        "previous_snapshot": prev,
    }
    path = snapshot_dir / "manifest.json"
    path.write_text(json.dumps(manifest, indent=2))
    return path


def fetch_snapshot(
    data_dir: str | Path,
    snapshot: str | None = None,
    url: str = FAA_URL,
    zip_path: str | Path | None = None,
) -> Path:
    """Fetch (or ingest a local ``zip_path``) into ``raw/<date>/``.

    ``zip_path`` injection keeps the stage testable offline — tests
    supply a fixture zip and the network is never touched.
    """
    data_dir = Path(data_dir)
    snapshot = snapshot or date.today().isoformat()
    raw_root = data_dir / "raw"
    snap_dir = raw_root / snapshot
    snap_dir.mkdir(parents=True, exist_ok=True)

    if zip_path is None:
        zip_path = snap_dir / "ReleasableAircraft.zip"
        if not Path(zip_path).exists():
            download(url, Path(zip_path))
    hashes = extract(Path(zip_path), snap_dir)
    prev = previous_snapshot(raw_root, snapshot)
    write_manifest(snap_dir, snapshot, hashes, prev, url)
    return snap_dir
