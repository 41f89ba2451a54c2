#!/usr/bin/env python3
"""Generate a 10x scale-up of the sf0.1 testdata (an "sf1" ~6M-row
lineitem) for the scale-headroom bench run — the 2x gate at sf0.1 could
hide superlinear plans; timing the full registry at sf1 confirms the
claimed ~linear behavior.

Construction: dimension tables (region, nation) are copied as-is; every
fact table is replicated 10x with key families shifted consistently
(custkey/orderkey/partkey/suppkey/doc_id/vec_id/event_id/user_id;
nation/region keys untouched) so all joins keep their selectivity.
Document texts get a copy-distinct token appended so cross-copy rows are
NOT near-duplicates (otherwise dedup pair output grows quadratically in
copy count and the run measures output explosion, not plan scaling);
embedding copies are re-randomized per copy for the same reason.

Output: /root/repo/.benchdata/sf1/*.parquet (gitignored).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".benchdata", "sf1")
COPIES = 10

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FAMILY = {  # column -> key family (shared offset)
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    # family offsets = max+1 over the base data
    offsets: dict[str, int] = {}
    for t, cols in SHIFT_COLS.items():
        for c in cols:
            fam = FAMILY[c]
            m = con.execute(
                f"SELECT MAX({c}) FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            offsets[fam] = max(offsets.get(fam, 0), int(m) + 1)

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    for t, shift in SHIFT_COLS.items():
        if t == "embeddings":
            continue  # handled below (re-randomized)
        all_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            exprs = []
            for c in all_cols:
                if c in shift:
                    exprs.append(f"{c} + {i * offsets[FAMILY[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    exprs.append(f"text || ' c{i}' AS text")
                elif t == "customer" and c == "c_name" and i > 0:
                    # Copy-distinct names at Levenshtein distance >= 3
                    # from every other copy (triple-digit tag):
                    # otherwise each name exists 10x verbatim and the
                    # fuzzy deletion-join's sf1 run measures a
                    # quadratic output explosion (26.9M pairs vs the
                    # linear 2.6M), not plan scaling — the same
                    # rationale as the doc-text ' c{i}' suffix. The
                    # tag also keeps scalar_levenshtein_fuzzy's <=2
                    # probe matching copy 0 only.
                    exprs.append(
                        f"replace(c_name, 'Customer#', "
                        f"'Customer{str(i) * 3}#') AS c_name"
                    )
                elif t == "events" and c == "ts":
                    # ns-since-epoch BIGINT, like the driver's
                    # TIMESTAMP(NANOS) testdata under nanosAsLong —
                    # DuckDB would otherwise write TIMESTAMP_NTZ, which
                    # Spark's unix_millis rejects
                    exprs.append("epoch_ns(ts) AS ts")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")

    # embeddings: copy 0 verbatim, copies 1..9 re-randomized (matching
    # the base distribution) so cross-copy cosine structure is noise
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    base_vec = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    base_ids = np.array(emb.column("vec_id").to_pylist())
    base_lab = np.array(emb.column("label").to_pylist())
    n, dim = base_vec.shape
    std = float(base_vec.std())
    ids, vecs, labs = [base_ids], [base_vec], [base_lab]
    for i in range(1, COPIES):
        rng = np.random.default_rng(1000 + i)
        ids.append(base_ids + i * offsets["vec_id"])
        vecs.append(rng.normal(scale=std, size=(n, dim)).astype(np.float32))
        labs.append(base_lab)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": pa.array(
                [list(map(float, v)) for v in np.concatenate(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(labs), type=pa.int32()),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print("embeddings", out.num_rows, "rows")


if __name__ == "__main__":
    main()
