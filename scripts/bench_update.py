#!/usr/bin/env python3
"""End-to-end `hangar update` wall-time benchmark at FAA-registry scale.

BASELINE.md row 1: the reference runs fetch+normalize+publish in <1 min
on the real snapshot (~307 K registrations, ~95 K aircraft ref rows,
~4.5 K engine rows). This script synthesizes a FIXTURES.md §A-shaped
snapshot at exactly that scale (deterministic, seed 0), runs the full
pipeline (fetch: zip extract + sha256 + manifest; normalize: CSV ->
typed parquet; publish: catalog tables/views/owners artifacts), and
prints one JSON line with per-stage and total wall seconds.

Usage: python scripts/bench_update.py  [rows default 307000]
"""

from __future__ import annotations

import io
import json
import random
import sys
import tempfile
import time
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STATES = [
    "TX", "CA", "FL", "NY", "WA", "Texas", "California", "ohio", "GA",
    "IL", "PA", "AZ", "CO", "NC", "MI", "Puerto Rico", "",
]
CERTS = ["1N", "42", "9A", "1", "2T", ""]
NAME_A = ["SMITH", "ACME", "DELTA", "SKY", "EAGLE", "BLUE", "LONE STAR"]
NAME_B = ["AVIATION LLC", "AIR CORP", "FLYING CLUB", "TRUST", "HOLDINGS"]


def synth_master(n: int, n_acft: int, n_eng: int) -> str:
    rng = random.Random(0)
    out = [
        "N-NUMBER,SERIAL NUMBER,MFR MDL CODE,ENG MFR MDL,YEAR MFR,"
        "TYPE AIRCRAFT,TYPE REGISTRANT,NAME,STREET,STREET2,CITY,STATE,"
        "ZIP CODE,LAST ACTION DATE,CERT ISSUE DATE,EXPIRATION DATE,"
        "CERTIFICATION,STATUS CODE,MODE S CODE,MODE S CODE HEX"
    ]
    for i in range(n):
        nnum = f"{i % 99999}{'AB'[i % 2] if i % 3 else ''}"[:5]
        mfr = f"{1000000 + rng.randrange(n_acft):07d}"
        eng = f"{10000 + rng.randrange(n_eng):05d}" if i % 17 else ""
        year = str(1950 + i % 75) if i % 13 else ""
        name = f"{rng.choice(NAME_A)} {rng.choice(NAME_B)}"
        street = f"{i % 9000 + 1} Main St"
        city = rng.choice(["austin", "miami", "new york", "dallas", ""])
        state = rng.choice(STATES)
        zipc = rng.choice([f"{10000 + i % 89999}", f"{10000 + i % 89999}-1234", "331", ""])
        lad = f"2023{1 + i % 12:02d}{1 + i % 28:02d}" if i % 11 else ""
        cid = f"20{i % 23:02d}{1 + i % 12:02d}{1 + i % 28:02d}"
        exp = f"202{5 + i % 4}{1 + i % 12:02d}{1 + i % 28:02d}"
        out.append(
            f"{nnum},SN-{i:07d},{mfr},{eng},{year},{1 + i % 9},"
            f"{1 + i % 9},{name},{street},,{city},{state},{zipc},"
            f"{lad},{cid},{exp},{rng.choice(CERTS)},V,5{i:07d},A{i:05X}"
        )
    return "\n".join(out) + "\n"


def synth_acftref(n: int) -> str:
    rng = random.Random(1)
    out = ["CODE,MFR,MODEL,TYPE-ACFT,TYPE-ENG,AC-CAT,BUILD-CERT-IND,NO-ENG,NO-SEATS,AC-WEIGHT,SPEED"]
    for i in range(n):
        out.append(
            f"{1000000 + i:07d},MFR{i % 800},MODEL-{i % 5000},{1 + i % 9},"
            f"{i % 6},1,0,{1 + i % 4},{2 + i % 300},CLASS {1 + i % 3},"
            f"{80 + rng.randrange(400)}"
        )
    return "\n".join(out) + "\n"


def synth_engine(n: int) -> str:
    out = ["CODE,MFR,MODEL,TYPE,HORSEPOWERS,THRUST"]
    # header quirk irrelevant: parser reads HORSEPOWER; keep exact name
    out[0] = "CODE,MFR,MODEL,TYPE,HORSEPOWER,THRUST"
    for i in range(n):
        hp = str(100 + i % 38000) if i % 2 else ""
        th = str(10000 + i % 90000) if not i % 2 else ""
        out.append(f"{10000 + i:05d},ENGMFR{i % 50},E-{i % 900},{i % 11},{hp},{th}")
    return "\n".join(out) + "\n"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 307_000
    n_acft, n_eng = 95_000, 4_500
    from hangarbay_spark.pipelines.fetch import fetch_snapshot
    from hangarbay_spark.pipelines.normalize import normalize_snapshot
    from hangarbay_spark.pipelines.publish import publish
    from hangarbay_spark.session import get_spark

    t0 = time.perf_counter()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("MASTER.txt", synth_master(n, n_acft, n_eng))
        zf.writestr("ACFTREF.txt", synth_acftref(n_acft))
        zf.writestr("ENGINE.txt", synth_engine(n_eng))
    t_synth = time.perf_counter() - t0

    with tempfile.TemporaryDirectory(prefix="hb_upd_bench_") as td:
        data_dir = Path(td)
        zip_path = data_dir / "fixture.zip"
        zip_path.write_bytes(buf.getvalue())
        spark = get_spark(app_name="hangarbay_update_bench")
        # session startup excluded: fixed cost, not pipeline work
        t0 = time.perf_counter()
        snap = fetch_snapshot(data_dir, snapshot="2026-02-01", zip_path=zip_path)
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        counts = normalize_snapshot(spark, snap, data_dir / "parquet")
        t_norm = time.perf_counter() - t0
        t0 = time.perf_counter()
        publish(spark, data_dir / "parquet")
        t_pub = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "hangar_update_wall",
                    "unit": "sec",
                    "rows": counts,
                    "synth_sec": round(t_synth, 2),
                    "fetch_sec": round(t_fetch, 2),
                    "normalize_sec": round(t_norm, 2),
                    "publish_sec": round(t_pub, 2),
                    "value": round(t_fetch + t_norm + t_pub, 2),
                }
            )
        )
        spark.stop()


if __name__ == "__main__":
    main()
