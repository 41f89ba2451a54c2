"""Data-directory resolution (reference: /root/reference/hangarbay/config.py)."""

from __future__ import annotations

import os
from pathlib import Path

ENV_VAR = "HANGARBAY_DATA_DIR"
DEFAULT_DIR = Path.home() / ".hangarbay_spark" / "data"


def get_data_dir(override: str | os.PathLike | None = None) -> Path:
    """Resolve the warehouse root: explicit arg > env var > default."""
    if override is not None:
        return Path(override)
    env = os.environ.get(ENV_VAR)
    if env:
        return Path(env)
    return DEFAULT_DIR


def raw_dir(data_dir: Path, snapshot: str) -> Path:
    return data_dir / "raw" / snapshot


def parquet_dir(data_dir: Path) -> Path:
    return data_dir / "parquet"


def warehouse_dir(data_dir: Path) -> Path:
    return data_dir / "warehouse"


def meta_dir(data_dir: Path) -> Path:
    return data_dir / "_meta"
