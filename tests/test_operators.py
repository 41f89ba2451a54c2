"""Unit tests for the FTS inverted index, multimodal plumbing, and the
dedup/similarity primitives not fully covered by the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hangarbay_spark.operators import dedup as D
from hangarbay_spark.operators import fts
from hangarbay_spark.operators import multimodal as M
from hangarbay_spark.operators import text as X

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # case dup of 1
    (3, "A completely different document about Spark SQL engines"),
    (4, "quick brown foxes and lazy dogs, a different document"),
    (5, "Spark SQL engines execute queries"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


# -- FTS inverted index ------------------------------------------------------


def test_fts_build_and_match(spark, tmp_path):
    df = _docs_df(spark)
    idx = fts.build_inverted_index(df, "doc_id", "text")
    postings = {(r["token"], r["doc_id"]) for r in idx.collect()}
    assert ("fox", 1) in postings and ("fox", 2) in postings
    assert ("spark", 3) in postings and ("spark", 5) in postings
    # dedup within doc: "the" appears twice in doc 1 but posts once
    assert len([p for p in postings if p == ("the", 1)]) == 1

    # AND semantics
    ids = {r["doc_id"] for r in fts.match_all(idx, "spark engines", "doc_id").collect()}
    assert ids == {3, 5}
    ids = {r["doc_id"] for r in fts.match_all(idx, "spark queries", "doc_id").collect()}
    assert ids == {5}
    # OR semantics
    ids = {r["doc_id"] for r in fts.match_any(idx, ["fox", "spark"], "doc_id").collect()}
    assert ids == {1, 2, 3, 5}
    # punctuation/case-insensitive tokenization
    assert fts.tokenize_query("Quick, BROWN!") == ["quick", "brown"]

    # round-trip through the partitioned on-disk index
    path = str(tmp_path / "fts_idx")
    fts.save_index(idx, path, buckets=4)
    idx2 = fts.load_index(spark, path)
    rows = fts.search(df, idx2, "doc_id", "lazy dog").collect()
    assert {r["doc_id"] for r in rows} == {1, 2}


def test_fts_empty_query(spark):
    df = _docs_df(spark)
    idx = fts.build_inverted_index(df, "doc_id", "text")
    assert fts.match_all(idx, "   ", "doc_id").count() == 0
    assert fts.match_any(idx, [], "doc_id").count() == 0


# -- multimodal --------------------------------------------------------------


def _media_df(spark):
    rows = M.make_media_rows(
        [
            {
                "media_id": "img1",
                "kind": "image",
                "payload": b"\x89PNG-fake-bytes-1",
                "mime": "image/png",
                "width": 640,
                "height": 480,
            },
            {
                "media_id": "img2",
                "kind": "image",
                "payload": b"\x89PNG-fake-bytes-2",
                "mime": "image/png",
                "width": 1024,
                "height": 768,
            },
            {
                "media_id": "vid1",
                "kind": "video",
                "payload": b"\x00\x01" * 500,
                "mime": "video/mp4",
                "duration_ms": 3500,
            },
            {
                "media_id": "aud1",
                "kind": "audio",
                "payload": b"RIFF-fake",
                "mime": "audio/wav",
                "duration_ms": 1200,
            },
        ]
    )
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_multimodal_features(spark):
    media = _media_df(spark)
    feats = M.extract_features(media)
    assert feats.schema == M.FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 4
    f1 = rows["img1"]
    assert f1["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert len(f1["sha256"]) == 64
    assert len(f1["feature"]) == M.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in f1["feature"])
    # deterministic fake: same payload+kind -> same feature
    feats2 = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert feats2["img1"]["feature"] == f1["feature"]
    # different payloads -> different features
    assert rows["img1"]["feature"] != rows["img2"]["feature"]


def test_multimodal_frame_sampling(spark):
    media = _media_df(spark)
    frames = M.sample_frames(media, every_ms=1000)
    assert frames.schema == M.FRAME_SCHEMA
    rows = frames.collect()
    # only the video row fans out; 3500ms at 1000ms -> 3 frames
    assert {r["media_id"] for r in rows} == {"vid1"}
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2]
    assert all(len(r["frame_payload"]) > 0 for r in rows)


def test_multimodal_resize(spark):
    media = _media_df(spark)
    out = M.resize_images(media, 256, 256)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {"img1", "img2"}  # non-images dropped
    assert all(r["width"] == 256 and r["height"] == 256 for r in rows.values())


# -- dedup primitives --------------------------------------------------------


def test_exact_dedup_survivors(spark):
    df = _docs_df(spark)
    kept = D.exact_dedup(df, "doc_id", "text")
    ids = {r["doc_id"] for r in kept.collect()}
    # doc 2 is a case-duplicate of doc 1 -> min-id survivor is 1
    assert 1 in ids and 2 not in ids
    assert ids == {1, 3, 4, 5}


def test_prune_frequent(spark):
    df = _docs_df(spark)
    post = D.shingle_postings(df, "doc_id", "text", n=1)
    pruned = D.prune_frequent(post, max_df=3)
    toks = {r["shingle"] for r in pruned.collect()}
    # "the" appears in docs 1,2 (deduped per doc) ... use a strict cutoff
    all_toks = {r["shingle"] for r in post.collect()}
    assert toks <= all_toks
    hot = (
        post.groupBy("shingle").count().filter(F.col("count") > 3).collect()
    )
    assert all(r["shingle"] not in toks for r in hot)


def test_deterministic_sampling(spark):
    from hangarbay_spark.operators.sampling import (
        deterministic_sample,
        split_expr,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    s1 = {r["k"] for r in deterministic_sample(df, "k", 0.25).collect()}
    # stable across re-runs and repartitions
    s2 = {
        r["k"]
        for r in deterministic_sample(df.repartition(7), "k", 0.25).collect()
    }
    assert s1 == s2
    assert 0.18 < len(s1) / 2000 < 0.32  # ~25% within hash noise
    # splits partition the data
    splits = df.select("k", split_expr("k").alias("s")).collect()
    by = {}
    for r in splits:
        by.setdefault(r["s"], set()).add(r["k"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 2000
    assert 0.7 < len(by["train"]) / 2000 < 0.9
    # salt changes membership
    s3 = {r["k"] for r in deterministic_sample(df, "k", 0.25, salt="x").collect()}
    assert s3 != s1


def test_approx_sketches_error_bounds(spark):
    """The sketch query has no oracle (algorithm-specific outputs);
    assert its estimates against exact values instead."""
    from hangarbay_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_approx_sketches"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("d"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
        )
        .collect()
    }
    for flag, row in got.items():
        assert abs(row["approx_parts"] - exact[flag]["d"]) / exact[flag]["d"] < 0.05
        assert abs(row["approx_median_price"] - exact[flag]["m"]) / exact[flag]["m"] < 0.05


def test_minhash_lsh_finds_near_dups(spark):
    df = _docs_df(spark)
    pairs = D.minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # docs 1 and 2 are identical post-normalization -> jaccard 1.0
    assert (1, 2) in got


def test_as_of_join_semantics(spark):
    from hangarbay_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 200), (3, "u", 50), (4, "v", 100)],
        "eid int, k string, ts long",
    )
    right = spark.createDataFrame(
        [(10, "u", 100), (11, "u", 150), (12, "w", 10)],
        "rid int, k string, ts long",
    )
    out = {
        r["eid"]: r["asof_rid"]
        for r in as_of_join(left, right, on="k", right_cols=["rid"]).collect()
    }
    assert out[1] == 10  # simultaneous right row visible (inclusive <=)
    assert out[2] == 11  # latest at-or-before 200
    assert out[3] is None  # nothing precedes ts=50
    assert out[4] is None  # no right rows for key v
    # tie-break: two right rows at the same (key, ts) -> max wins
    right2 = spark.createDataFrame(
        [(20, "u", 100), (21, "u", 100)], "rid int, k string, ts long"
    )
    out2 = {
        r["eid"]: r["asof_rid"]
        for r in as_of_join(
            left, right2, on="k", right_cols=["rid"], tie_break="rid"
        ).collect()
    }
    assert out2[2] == 21


def test_duplicated_span_counts(spark):
    passage = " ".join(f"p{i}" for i in range(12))  # 12 shared tokens
    df = spark.createDataFrame(
        [
            (1, f"intro one two {passage} outro alpha"),
            (2, f"other start {passage} different end"),
            (3, "completely unrelated text with many words here ok"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["n_dup_spans"]
        for r in D.duplicated_span_counts(df, "doc_id", "text", n=10).collect()
    }
    # the shared 12-token passage yields 3 common 10-gram spans —
    # surrounding context differs so boundary grams are unique
    assert got == {1: 3, 2: 3}


def test_duplicated_span_removal_hand_example(spark):
    """The rewrite twin of span detection: the three overlapping
    10-gram hits over a shared 12-token passage must merge into ONE
    excised interval covering exactly the 12 passage tokens; untouched
    docs come back as their whitespace-normalized text."""
    passage = " ".join(f"p{i}" for i in range(12))  # 12 shared tokens
    df = spark.createDataFrame(
        [
            (1, f"intro one two {passage} outro alpha"),
            (2, f"other start {passage} different end"),
            (3, "completely unrelated text with many words here ok"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in D.duplicated_span_removal(
            df, "doc_id", "text", n=10
        ).collect()
    }
    assert got[1]["n_spans"] == 1 and got[1]["tokens_removed"] == 12
    assert got[2]["n_spans"] == 1 and got[2]["tokens_removed"] == 12
    assert got[1]["cleaned_text"] == "intro one two outro alpha"
    assert got[2]["cleaned_text"] == "other start different end"
    # untouched doc: zero spans, cleaned == normalized original
    assert got[3]["n_spans"] == 0 and got[3]["tokens_removed"] == 0
    assert (
        got[3]["cleaned_text"]
        == "completely unrelated text with many words here ok"
    )


def test_duplicated_span_removal_min_df_edge_cases(spark):
    """ADVICE r6: min_df=1 must mean 'every gram occurrence is a
    duplicated span' (docs with >= n tokens are fully excised; shorter
    docs untouched), NOT silently fall into the min!=max cross-doc
    fast path; min_df < 1 raises."""
    import pytest

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(15))),  # 15 tokens
            (2, "short doc only"),  # 3 tokens < n: no grams
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in D.duplicated_span_removal(
            df, "doc_id", "text", n=10, min_df=1
        ).collect()
    }
    assert got[1]["tokens_removed"] == 15 and got[1]["cleaned_text"] == ""
    assert got[2]["tokens_removed"] == 0
    assert got[2]["cleaned_text"] == "short doc only"
    with pytest.raises(ValueError):
        D.duplicated_span_removal(df, "doc_id", "text", n=10, min_df=0)


def test_duplicated_span_removal_conservation(spark):
    """removed + kept = original token count for EVERY document of the
    real corpus, and kept equals the cleaned text's own token count
    (two independent derivations of 'kept')."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.text import token_count_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = D.duplicated_span_removal(docs, "doc_id", "text", n=10)
    orig = docs.select("doc_id", token_count_expr("text").alias("n_orig"))
    bad = (
        out.join(orig, "doc_id")
        .filter(
            (F.col("tokens_removed") + F.col("tokens_kept") != F.col("n_orig"))
            | (
                F.size(F.split(F.col("cleaned_text"), r"\s+"))
                != F.col("tokens_kept")
            )
            & (F.col("tokens_kept") > 0)
        )
        .count()
    )
    assert bad == 0
    assert out.count() == docs.count()  # one row per doc, none dropped
    # the corpus genuinely exercises the operator
    assert out.filter(F.col("tokens_removed") > 0).count() > 0


def test_hll_estimate_accuracy(spark):
    """The deterministic HLL estimate lands within the theoretical
    error envelope (1.04/sqrt(64) ~ 13%; pinned at 25% for slack) on
    the raw-harmonic arm, and the linear-counting arm recovers the
    3-value returnflag domain to within 1."""
    from hangarbay_spark.queries import REGISTRY

    for sf in ("0.001", "0.01"):
        rows = {
            r["domain"]: r
            for r in REGISTRY["agg_hll_distinct_estimate"]
            .fn(spark, f"/root/testdata/sf{sf}")
            .collect()
        }
        pk = rows["partkey"]
        assert (
            abs(pk["est_distinct"] / pk["exact_distinct"] - 1.0) < 0.25
        ), (sf, pk)
        rf = rows["returnflag"]
        assert abs(rf["est_distinct"] - rf["exact_distinct"]) < 1.0


def test_hll_merge_equals_direct(spark):
    """Register merge (elementwise max over per-part registers) must
    reproduce the direct global build EXACTLY — max is associative, so
    est_merged == est_direct bit for bit, not approximately."""
    from hangarbay_spark.queries import REGISTRY

    for sf in ("0.001", "0.01"):
        r = (
            REGISTRY["agg_hll_merge_rollup"]
            .fn(spark, f"/root/testdata/sf{sf}")
            .collect()[0]
        )
        assert r["est_merged"] == r["est_direct"], (sf, r)
        assert r["n_parts"] >= 2


def test_cms_one_sided_and_tight_for_heavy_tokens(spark):
    """Count-min guarantees: est >= exact for EVERY probe (one-sided),
    and the overestimate stays within the d-row Markov envelope
    (excess <= N/64 at w=4096 with huge slack) for tokens that exist;
    the never-seen probe shows a pure collision floor."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.text import tokens_expr
    from hangarbay_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    rows = {
        r["token"]: r
        for r in REGISTRY["text_cms_token_counts"].fn(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_total = docs.select(
        F.explode(tokens_expr("text")).alias("t")
    ).count()
    for tok, r in rows.items():
        assert r["cms_est"] >= r["exact_cnt"], (tok, r)
        assert r["cms_est"] - r["exact_cnt"] <= n_total // 64, (tok, r)
    assert rows["zzz_never_seen"]["exact_cnt"] == 0


def test_image_dimension_parse_against_struct_pack(spark):
    """The header parse recovers width/height from REAL PNG/GIF/BMP
    headers built independently with Python struct.pack — not from the
    query's own synthesis — so the byte-offset arithmetic is pinned
    against the actual file-format layouts."""
    import struct

    from pyspark.sql import functions as F

    cases = []
    for i, (w, h) in enumerate([(640, 480), (1, 65535), (1920, 1080)]):
        png = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", w, h)
            + b"\x08\x06\x00\x00\x00"
            + b"body"
        )
        gif = b"GIF87a" + struct.pack("<HH", w, h) + b"body"
        bmp = (
            b"BM"
            + struct.pack("<IHHI", 0, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24)
            + b"body"
        )
        cases += [
            (i * 3 + 0, png, "png", w, h),
            (i * 3 + 1, gif, "gif", w, h),
            (i * 3 + 2, bmp, "bmp", w, h),
        ]
    df = spark.createDataFrame(
        [(d, p) for d, p, *_ in cases], "doc_id long, payload binary"
    )
    # reuse the registered query's parse expressions by round-tripping
    # through the same hex-substring arithmetic
    hx = df.select("doc_id", F.upper(F.hex("payload")).alias("h"))
    is_png = F.substring("h", 1, 8) == "89504E47"
    is_gif = F.substring("h", 1, 6) == "474946"

    def hex2int(c):
        return F.conv(c, 16, 10).cast("bigint")

    width = (
        F.when(is_png, hex2int(F.substring("h", 33, 8)))
        .when(is_gif, hex2int(F.concat(F.substring("h", 15, 2), F.substring("h", 13, 2))))
        .otherwise(hex2int(F.concat(F.substring("h", 39, 2), F.substring("h", 37, 2))))
    )
    height = (
        F.when(is_png, hex2int(F.substring("h", 41, 8)))
        .when(is_gif, hex2int(F.concat(F.substring("h", 19, 2), F.substring("h", 17, 2))))
        .otherwise(hex2int(F.concat(F.substring("h", 47, 2), F.substring("h", 45, 2))))
    )
    got = {
        r["doc_id"]: (r["w"], r["h2"])
        for r in hx.select(
            "doc_id", width.alias("w"), height.alias("h2")
        ).collect()
    }
    for d, _, fmt, w, h in cases:
        if fmt == "bmp" and (w > 65535 or h > 65535):
            continue  # parse reads the low 2 bytes by construction
        assert got[d] == (w, h), (d, fmt, got[d], (w, h))


def test_jpeg_sof_walk_against_struct_pack(spark):
    """The JPEG marker walk recovers dimensions from headers built
    independently with struct.pack in realistic ISO 10918-1 layouts —
    variable APP0/COM/DQT/DHT segment chains, baseline SOF0 and
    progressive SOF2, 3-component frames — and returns None for
    non-JPEG, truncated, and SOF-less (straight-to-SOS) payloads; the
    Arrow kernel matches the pure function on every row."""
    import struct

    from hangarbay_spark.operators.multimodal import (
        jpeg_dims_kernel,
        jpeg_sof_dims,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    def sof_body(w, h, ncomp=3):
        return (
            b"\x08"
            + struct.pack(">HH", h, w)
            + bytes([ncomp])
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"[: 3 * ncomp]
        )

    app0 = seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    )
    dqt = seg(0xDB, b"\x00" + bytes(64))
    dht = seg(0xC4, b"\x00" + bytes(16) + bytes(12))
    cases = [
        # (payload, expected)
        (b"\xff\xd8" + app0 + dqt + seg(0xC0, sof_body(640, 480)),
         ("sof0", 640, 480)),
        (b"\xff\xd8" + app0 + seg(0xFE, b"x" * 211) + dqt + dht
         + seg(0xC2, sof_body(1920, 1080, 1)), ("sof2", 1920, 1080)),
        (b"\xff\xd8" + dqt + seg(0xC0, sof_body(1, 65535)),
         ("sof0", 1, 65535)),
        (b"\x89PNG....", None),              # not a JPEG
        (b"\xff\xd8" + app0[:6], None),      # truncated mid-segment
        (b"\xff\xd8" + app0 + seg(0xDA, b"\x01\x01\x00"), None),  # SOS first
        (b"\xff\xd8\xff\xd9", None),         # SOI then EOI
        (None, None),
    ]
    for payload, want in cases:
        assert jpeg_sof_dims(payload) == want, payload

    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["sof"], r["width"], r["height"])
        for r in df.mapInPandas(
            jpeg_dims_kernel,
            "doc_id long, sof string, width long, height long",
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == (want if want else (None, None, None))


def test_mp4_box_walk_against_struct_pack(spark):
    """The ISO-BMFF box walk recovers brand/timescale/duration from
    headers built independently with struct.pack in realistic ISO/IEC
    14496-12 layouts — ftyp with compatible-brand lists, variable
    free/skip/uuid padding chains, full 108-byte mvhd v0 — and returns
    None for non-MP4, truncated, mvhd-v1, to-EOF-before-moov, and
    malformed (size<8) payloads; the Arrow kernel matches the pure
    function on every row."""
    import struct

    from hangarbay_spark.operators.multimodal import (
        mp4_kernel,
        mp4_moov_info,
    )

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    def mvhd(ts, dur, version=0):
        body = (
            bytes([version]) + b"\x00\x00\x00"
            + struct.pack(">II", 0, 0)          # ctime mtime
            + struct.pack(">II", ts, dur)
            + struct.pack(">I", 0x00010000)     # rate
            + struct.pack(">H", 0x0100)         # volume
            + b"\x00" * 10                      # reserved
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)           # unity matrix
            + b"\x00" * 24 + struct.pack(">I", 2)
        )
        return box(b"mvhd", body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2mp41")
    cases = [
        (ftyp + box(b"moov", mvhd(600, 3000)), ("isom", 600, 3000)),
        (box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(b"free", b"\x00" * 17)
         + box(b"skip", b"") + box(b"uuid", b"x" * 16)
         + box(b"moov", mvhd(90000, 123456789)),
         ("mp42", 90000, 123456789)),
        (ftyp + box(b"moov", mvhd(1000, 0)), ("isom", 1000, 0)),
        (b"RIFF....WAVE", None),                       # not ISO-BMFF
        (ftyp[:10], None),                             # truncated
        (ftyp + box(b"moov", mvhd(600, 1, version=1)), None),  # v1 times
        (ftyp + struct.pack(">I", 0) + b"mdat" + b"x" * 32, None),
        (ftyp + struct.pack(">I", 4) + b"junk", None),  # size < 8
        (None, None),
    ]
    for payload, want in cases:
        assert mp4_moov_info(payload) == want, payload

    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["brand"], r["timescale"], r["duration"])
        for r in df.mapInPandas(
            mp4_kernel,
            "doc_id long, brand string, timescale long, duration long",
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == (want if want else (None, None, None))


def test_wav_metadata_parse_against_stdlib_wave(spark):
    """The WAV header parse recovers channels/rate/bits/duration from a
    REAL file written by Python's stdlib `wave` module — the strongest
    codec-free pin available in this container (an actual encoder, not
    our own synthesis)."""
    import io
    import wave

    from pyspark.sql import functions as F

    rows = []
    for i, (ch, rate, nframes) in enumerate(
        [(1, 8000, 8000), (2, 44100, 22050), (1, 16000, 1)]
    ):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(b"\x00\x00" * ch * nframes)
        rows.append((i, buf.getvalue(), ch, rate, nframes))
    df = spark.createDataFrame(
        [(d, p) for d, p, *_ in rows], "doc_id long, payload binary"
    )
    hx = df.select("doc_id", F.upper(F.hex("payload")).alias("h"))

    def rd(pos, nbytes):
        pairs = [
            F.substring("h", 2 * (pos + i) - 1, 2)
            for i in reversed(range(nbytes))
        ]
        return F.conv(F.concat(*pairs), 16, 10).cast("bigint")

    got = {
        r["doc_id"]: r
        for r in hx.select(
            "doc_id",
            rd(23, 2).alias("ch"),
            rd(25, 4).alias("rate"),
            rd(35, 2).alias("bits"),
            rd(41, 4).alias("ds"),
            rd(29, 4).alias("br"),
        ).collect()
    }
    for d, _, ch, rate, nframes in rows:
        r = got[d]
        assert (r["ch"], r["rate"], r["bits"]) == (ch, rate, 16)
        assert r["ds"] == ch * 2 * nframes
        assert r["br"] == rate * ch * 2
        assert r["ds"] * 1000 // r["br"] == nframes * 1000 // rate


def test_winnow_fingerprint_guarantee_and_density(spark):
    """The Schleimer guarantee: docs sharing a token run of >= k+w-1
    tokens share at least one fingerprint; a doc with >= k tokens but
    fewer than w grams still gets one (single-window fallback); and
    winnowing selects a strict subsample of the full gram set."""
    shared = " ".join(f"s{i}" for i in range(8))  # k+w-1 = 8 at (5,4)
    df = spark.createDataFrame(
        [
            (1, f"aa bb cc {shared} dd ee"),
            (2, f"xx yy {shared} zz ww qq"),
            (3, "one two three four five"),  # exactly k tokens, 1 gram
            (4, "totally different words with no overlap at all here"),
        ],
        "doc_id int, text string",
    )
    fps = {
        d: {r["fp"] for r in rows}
        for d, rows in __import__("itertools").groupby(
            sorted(
                D.winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
                .collect(),
                key=lambda r: r["doc_id"],
            ),
            key=lambda r: r["doc_id"],
        )
    }
    assert fps[1] & fps[2], "shared 8-token run must share a fingerprint"
    assert len(fps[3]) == 1  # single-window fallback
    # subsample: fewer fingerprints than grams (doc 1 has 10 grams)
    assert 1 <= len(fps[1]) < 10
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.winnow_pairs(
            df, "doc_id", "text", k=5, w=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def test_winnow_hot_fingerprint_guard(spark):
    """VERDICT r6 watch item: a boilerplate fingerprint shared by many
    docs must be excludable from the self-join (the MOSS over-common
    drop / skew guard). Six docs share a hot passage; only docs 1-2
    additionally share a rare one. With the cap binding on the hot
    fingerprints, only (1, 2) survives; the corpus-derived default cap
    (>= 1000) never binds at test scale so results are unchanged; and
    the cap rides in the artifact's geometry side file."""
    hot = " ".join(f"h{i}" for i in range(10))
    rare = " ".join(f"r{i}" for i in range(10))
    rows = [(1, f"{hot} one {rare}"), (2, f"{hot} two {rare}")]
    rows += [(d, f"{hot} unique{d} filler{d}") for d in range(3, 7)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def pairs(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in D.winnow_pairs(
                df, "doc_id", "text", k=5, w=4, min_shared=1, **kw
            ).collect()
        }

    unpruned = pairs()
    assert len(unpruned) == 15  # all C(6,2) pairs share the hot passage
    assert pairs(max_df=10**9) == unpruned  # explicit non-binding cap
    capped = pairs(max_df=3)  # hot fps have df=6 > 3; rare df=2 kept
    assert capped == {(1, 2)}

    # the cap rides with the persisted artifact and the incremental
    # reader derives it from there
    import tempfile

    p = tempfile.mkdtemp(prefix="hb_winnow_") + "/fps.parquet"
    D.write_winnow_fingerprint_table(
        df.filter("doc_id <= 4"), "doc_id", "text", p, k=5, w=4, max_df=3
    )
    assert D._winnow_geometry(p) == (5, 4, 3)
    inc = {
        (r["id_a"], r["id_b"])
        for r in D.winnow_pairs_incremental(
            spark, df.filter("doc_id > 4"), "doc_id", "text", p,
            min_shared=1,
        ).collect()
    }
    assert inc == set()  # new docs share only the (pruned) hot passage


def test_source_jsd_bounds(spark):
    """JSD properties on hand corpora: identical distributions -> 0;
    disjoint vocabularies -> ln 2 (6 dp); everything in [0, ln 2]."""
    import math

    from hangarbay_spark.queries import REGISTRY
    from hangarbay_spark.queries.llmops import text_source_jsd

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "A", 1),
            (2, "alpha beta gamma", "en", "B", 1),  # B identical to A
            (3, "delta epsilon zeta", "en", "C", 1),  # C disjoint
        ],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="hb_jsd_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        (r["source_a"], r["source_b"]): r["jsd"]
        for r in text_source_jsd(spark, d).collect()
    }
    ln2 = round(math.log(2.0), 6)
    assert got[("A", "B")] == 0.0
    # A vs C / B vs C share no tokens -> no inner-join rows -> pair
    # absent (documented); real corpora always share tokens
    assert all(0.0 <= v <= ln2 + 1e-9 for v in got.values())
    # and on the real corpus: full pair matrix, all inside bounds
    real = REGISTRY["text_source_jsd"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(real) == 20 * 19 // 2
    assert all(0.0 <= r["jsd"] <= ln2 + 1e-9 for r in real)


def test_minhash_lsh_recall_vs_exact(spark):
    """Empirical recall of MinHash-LSH (K=8, 4 bands) against the exact
    n-gram Jaccard pairs at threshold 0.8 — theoretical candidate
    probability at j=0.8 is 1-(1-0.8^2)^4 ≈ 0.983; on the test corpora
    recall is 100% (candidates are verified with exact Jaccard, so
    precision is always 1.0 and found ⊆ exact)."""
    for sf in ("0.001", "0.01"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        exact = {
            (r["id_a"], r["id_b"])
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.8
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_dedup_pairs(
                docs, "doc_id", "text", threshold=0.8
            ).collect()
        }
        assert lsh <= exact  # verification guarantees precision 1.0
        assert len(lsh) >= 0.95 * len(exact) and exact


def test_operators_on_empty_input(spark):
    """Every pair/fingerprint operator degrades to empty output (not an
    error) on an empty corpus."""
    from hangarbay_spark.operators import similarity as S

    docs = spark.createDataFrame([], "doc_id int, text string")
    assert D.exact_dedup_groups(docs, "doc_id", "text").count() == 0
    assert D.ngram_jaccard_pairs(docs, "doc_id", "text").count() == 0
    assert D.minhash_lsh_dedup_pairs(docs, "doc_id", "text").count() == 0
    assert D.simhash_hamming_pairs(docs, "doc_id", "text").count() == 0
    emb = spark.createDataFrame([], "vec_id int, embedding array<float>")
    assert (
        S.embedding_near_dup_pairs(emb, dim=8, nbits=16, bands=4).count()
        == 0
    )
    pairs = spark.createDataFrame([], "id_a int, id_b int")
    assert D.connected_components(pairs).count() == 0


def test_minhash_signature_table_roundtrip(spark, tmp_path):
    """pairs-from-persisted-signatures == pairs-from-inline at sf0.01,
    and the persisted candidate stage reads fixed-width signature rows
    (no text, no shingle recompute)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    inline = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    path = str(tmp_path / "sigs")
    D.write_minhash_signature_table(docs, "doc_id", "text", path)
    persisted_df = D.minhash_pairs_from_signature_table(
        spark, path, "doc_id", threshold=0.8
    )
    persisted = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in persisted_df.collect()
    }
    assert persisted == inline and len(inline) > 0
    plan = persisted_df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan  # text is never re-read


def test_minhash_incremental_vs_full(spark, tmp_path):
    """Incremental pairs (new batch vs persisted corpus signatures)
    == the full-run pairs restricted to pairs involving a new doc."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    old = docs.filter(F.col("doc_id") % 10 != 0)
    path = str(tmp_path / "corpus_sigs")
    D.write_minhash_signature_table(old, "doc_id", "text", path)
    inc = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]),
         round(r["jaccard"], 9))
        for r in D.minhash_pairs_incremental(
            spark, new, "doc_id", "text", path, threshold=0.8
        ).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert inc == full and len(full) > 0


def test_fts_persisted_index_no_corpus_scan(spark):
    """The declared FTS queries must run against the persisted index:
    no scan of the documents table anywhere in the query plan."""
    from hangarbay_spark.operators.fts import build_inverted_index, match_all
    from hangarbay_spark.queries.search import fts_match_all

    sf_dir = "/root/testdata/sf0.001"
    df = fts_match_all(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan  # only the index parquet is scanned
    assert "fts.parquet" in plan  # the durable index artifact
    # the term filter reaches the index scan (partition-local lookup)
    assert "PushedFilters: [In(token" in plan
    # and the persisted-index result equals the inline-index result
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inline = match_all(
        build_inverted_index(docs, "doc_id", "text"), "spark data", "doc_id"
    )
    assert {r["doc_id"] for r in df.collect()} == {
        r["doc_id"] for r in inline.collect()
    }


def test_hyperplane_lsh_near_dup(spark):
    """Banded hyperplane LSH: near-dup recall preserved while per-band
    buckets stay small, and the hot-bucket guard drops a degenerate
    pile-up instead of going quadratic."""
    import itertools

    import numpy as np

    from hangarbay_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    dim, vecs = 8, []
    for c in range(6):  # 6 clusters x 4 near-identical members
        base = rng.normal(size=dim)
        for _ in range(4):
            vecs.append(base + rng.normal(scale=0.01, size=dim))
    for _ in range(40):  # background noise vectors
        vecs.append(rng.normal(size=dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    got = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.95, dim=dim, nbits=16, bands=4
        ).collect()
    }
    # ground truth from exact cosine over all pairs
    V = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    truth = {
        (a, b)
        for a, b in itertools.combinations(range(len(rows)), 2)
        if round(float(Vn[a] @ Vn[b]), 9) >= 0.95
    }
    assert truth, "fixture must contain near-dup pairs"
    assert got == truth  # 100% recall on clustered dups (pinned, seeded)

    # per-band bucket population stays far below n (old scheme: 2^4
    # global buckets over all rows; banded domain is 2^(nbits/bands))
    band_cols = S.hyperplane_band_cols("embedding", dim, nbits=16, bands=4)
    buckets = df.select(
        *[bc.alias(f"b{i}") for i, bc in enumerate(band_cols)]
    ).toPandas()
    max_pop = max(buckets[f"b{i}"].value_counts().max() for i in range(4))
    assert max_pop <= len(rows) // 3

    # hot-bucket guard: 20 identical vectors pile into one bucket per
    # band; with the guard they are dropped, without it they pair up
    pile = [(100 + i, [1.0] * dim) for i in range(20)]
    df2 = spark.createDataFrame(pile, "vec_id int, embedding array<float>")
    no_guard = S.embedding_near_dup_pairs(
        df2, threshold=0.95, dim=dim, nbits=16, bands=4
    ).count()
    guarded = S.embedding_near_dup_pairs(
        df2, threshold=0.95, dim=dim, nbits=16, bands=4, max_bucket=5
    ).count()
    assert no_guard == 190 and guarded == 0


def test_kmeans_recovers_clusters(spark):
    """Lloyd k-means (DataFrame-native) recovers a planted 3-cluster
    structure; iterations strictly improve (or keep) mean cosine."""
    import numpy as np

    from hangarbay_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    dim, rows = 8, []
    bases = [rng.normal(size=dim) for _ in range(3)]
    # first 3 ids land in distinct clusters (deterministic init picks
    # them as seeds); 20 members per cluster
    for m in range(20):
        for c, base in enumerate(bases):
            vid = m * 3 + c
            v = base + rng.normal(scale=0.05, size=dim)
            rows.append((vid, [float(x) for x in v], c))
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id int, embedding array<float>"
    )
    truth = {i: c for i, _, c in rows}
    out = S.kmeans(df, k=3, iters=4).collect()
    got = {r["vec_id"]: r["centroid_id"] for r in out}
    # cluster labels are arbitrary — check partition equality
    by_label: dict[int, set] = {}
    for vid, lab in got.items():
        by_label.setdefault(lab, set()).add(vid)
    truth_parts = {
        frozenset(i for i in truth if truth[i] == c) for c in range(3)
    }
    assert {frozenset(v) for v in by_label.values()} == truth_parts
    # assignments are tight: every vector close to its centroid
    assert all(r["cosine"] > 0.9 for r in out)


def test_grouped_agg_centroid_matches_native(spark):
    """The GROUPED_AGG pandas_udf centroid path agrees elementwise with
    the decimal-exact native path (1e-6: numpy pairwise summation vs
    exact decimal differ only in the last float ulp)."""
    import numpy as np

    from hangarbay_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(90)],
        "vec_id int, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [(i, i % 3) for i in range(90)], "vec_id int, centroid_id int"
    )
    native = {
        r["centroid_id"]: r["embedding"]
        for r in S.centroid_update(assigned, corpus).collect()
    }
    gagg = {
        r["centroid_id"]: r["embedding"]
        for r in S.centroid_update_pandas(assigned, corpus).collect()
    }
    assert native.keys() == gagg.keys() == {0, 1, 2}
    for c in native:
        assert np.allclose(native[c], gagg[c], atol=1e-6)


def test_hyperplane_signature_table_roundtrip(spark, tmp_path):
    """pairs-from-persisted-hyperplane-signatures == inline pairs."""
    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    inline = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.embedding_near_dup_pairs(
            emb, threshold=0.4, dim=64, max_bucket=100
        ).collect()
    }
    path = str(tmp_path / "hp_sigs")
    S.write_hyperplane_signature_table(emb, path, dim=64)
    persisted_df = S.hyperplane_pairs_from_signature_table(
        spark, path, emb, threshold=0.4, max_bucket=100
    )
    persisted = {
        (r["id_a"], r["id_b"], r["cosine"]) for r in persisted_df.collect()
    }
    assert persisted == inline and len(inline) > 0
    # candidate generation reads the signature parquet, not a projection
    assert any("hp_sigs" in f for f in persisted_df.inputFiles())


def test_hyperplane_fast_kernel_matches_expr(spark, tmp_path):
    """The Arrow/numpy signature kernel produces the same band values
    as the oracle-exact expression path on the test corpus (and is the
    production path for large builds)."""
    import time

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    p_expr = str(tmp_path / "sig_expr")
    p_fast = str(tmp_path / "sig_fast")
    t0 = time.perf_counter()
    S.write_hyperplane_signature_table(emb, p_expr, dim=64)
    t_expr = time.perf_counter() - t0
    t0 = time.perf_counter()
    S.write_hyperplane_signature_table(emb, p_fast, dim=64, fast=True)
    t_fast = time.perf_counter() - t0
    a = {tuple(r) for r in spark.read.parquet(p_expr).collect()}
    b = {tuple(r) for r in spark.read.parquet(p_fast).collect()}
    assert a == b and len(a) == emb.count()
    # not asserted (timing flake), but observable in -s runs
    print(f"expr={t_expr:.2f}s fast={t_fast:.2f}s")


def test_publish_corpus_indexes_durable(spark, tmp_path, monkeypatch):
    """publish_corpus_indexes builds all five artifacts durably; with
    HANGARBAY_INDEX_DIR set, the persisted-index queries resolve to the
    published parquet (no rebuild, no corpus scan for candidates)."""
    import json
    from pathlib import Path

    from hangarbay_spark.pipelines import indexes
    from hangarbay_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    out = tmp_path / "warehouse_idx"
    monkeypatch.setenv("HANGARBAY_INDEX_DIR", str(out))
    meta = indexes.publish_corpus_indexes(spark, sf_dir, out)
    root = Path(indexes.index_root(sf_dir))
    # root is basename + abs-path digest (collision-proof, ADVICE r3)
    assert root.parent == out and root.name.startswith("sf0.001-")
    for sub in indexes.ARTIFACTS.values():
        assert (root / sub / "_SUCCESS").exists(), sub
    on_disk = json.loads((root / "_meta" / "indexes.json").read_text())
    assert on_disk["artifacts"].keys() == indexes.ARTIFACTS.keys()
    assert all(a["rows"] > 0 for a in on_disk["artifacts"].values())
    assert meta["source"] == sf_dir

    for qname, artifact in [
        ("fts_match_all", "fts.parquet"),
        ("fts_match_phrase", "fts_pos.parquet"),
        ("dedup_minhash_lsh_persisted", "minhash_sigs.parquet"),
        ("sim_near_dup_persisted", "hyperplane_sigs.parquet"),
        ("dedup_simhash_persisted", "simhash_sigs.parquet"),
        ("fts_bm25_topk", "fts_tf.parquet"),
    ]:
        df = REGISTRY[qname].fn(spark, sf_dir)
        assert any(artifact in f for f in df.inputFiles()), qname
        df.collect()


def test_bm25_persisted_index_no_corpus_scan(spark):
    """fts_bm25_topk's plan touches only index artifacts (tf postings +
    doclen), never the documents table, and the term filter is pushed
    to the bucketed postings scan."""
    from hangarbay_spark.queries.search import fts_bm25_topk

    df = fts_bm25_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan
    assert "fts_tf.parquet" in plan and "fts_doclen.parquet" in plan
    assert "PushedFilters: [In(token" in plan


def test_simhash_persisted_no_vote_recompute(spark, tmp_path, monkeypatch):
    """dedup_simhash_persisted's timed plan reads ONLY the fingerprint
    parquet — no documents scan, no 64-vote-sum recompute — and its
    pairs equal the inline dedup_simhash_hamming's (same oracle)."""
    from hangarbay_spark.pipelines import indexes
    from hangarbay_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    monkeypatch.setenv("HANGARBAY_INDEX_DIR", str(tmp_path / "idx"))
    df = REGISTRY["dedup_simhash_persisted"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan  # text never rescanned
    assert "md5" not in plan  # vote-sum stage absent from the search
    # every scanned file is the durable artifact
    assert df.inputFiles() and all(
        "simhash_sigs.parquet" in f for f in df.inputFiles()
    )
    inline = REGISTRY["dedup_simhash_hamming"].fn(spark, sf_dir)
    assert {tuple(r) for r in df.collect()} == {
        tuple(r) for r in inline.collect()
    } != set()


def test_hyperplane_kernel_certifies_zero_vector(spark):
    """The certified signature kernel must agree with the expression
    path even on exact-zero projections (a zero vector makes every
    projection exactly 0 -> all sign bits true): the forward-error
    bound flags those entries and the sequential recompute path runs."""
    import numpy as np

    from hangarbay_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    rows = [(0, [0.0] * 64)] + [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(1, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    expr = {
        tuple(r)
        for r in S.hyperplane_signatures(emb, "vec_id", "embedding").collect()
    }
    fast = {
        tuple(r)
        for r in S.hyperplane_signatures(
            emb, "vec_id", "embedding", fast=True
        ).collect()
    }
    assert fast == expr and len(expr) == 40


def test_ann_recall_report_shape(spark):
    """The oracle-checked recall report yields one row per method with
    recall in [0,1] and the full exact count. (The absolute recall on
    the driver corpus is LOW by design: its embeddings are near-random,
    so exact top-5 neighbors sit at cosine ~0.4, where hyperplane-LSH
    collision probability is ~0.18 — the >=0.9 regime is near-dup
    cosine >=0.95, asserted on a planted fixture below.)"""
    from hangarbay_spark.queries import REGISTRY

    rows = {
        r["method"]: r
        for r in REGISTRY["sim_ann_recall_report"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    }
    assert set(rows) == {"hplsh", "ivf"}
    for r in rows.values():
        assert r["n_exact"] == 15  # 3 probes x k=5
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] == round(r["recall"] * 15)


def test_ann_recall_floor_near_dup_regime(spark):
    """Regression guard on ANN quality where the LSH is designed to
    operate: planted near-dup clusters (cosine >=0.97). Multi-probe
    hyperplane recall@k must stay >=0.9 — a miss requires the probe and
    a true neighbor to disagree on ALL 8 bands, probability ~(1-p^8)^8
    with p ~ 1 - arccos(0.97)/pi ~ 0.92."""
    import numpy as np

    from hangarbay_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(40):  # 40 clusters x (1 base + 4 near-copies)
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        rows.append((vid, [float(x) for x in base]))
        vid += 1
        for _ in range(4):
            # noise norm ~0.03*sqrt(64)=0.24 -> cosine ~1/sqrt(1+0.24^2)~0.97
            pert = base + 0.03 * rng.standard_normal(64)
            pert /= np.linalg.norm(pert)
            rows.append((vid, [float(x) for x in pert]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    probes = emb.filter(F.col("vec_id").isin(0, 5, 10))  # 3 cluster bases
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, probes, k=4).collect()
    }
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.hyperplane_topk(
            emb, probes, k=4, dim=64, fast=True
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert len(exact) == 12  # 3 probes x k=4
    assert recall >= 0.9


def test_cosine_seq_udf_matches_expr(spark):
    """The sequential-accumulation Arrow kernel must be bit-identical
    to cosine_expr (same IEEE-754 op order), so the oracle-compared
    cosine can use the kernel without parity risk (ADVICE r3)."""
    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = emb.filter(F.col("vec_id") < 150).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") < 150).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    diff = pairs.select(
        S.cosine_expr(F.col("va"), F.col("vb")).alias("expr"),
        F.round(
            S.cosine_pair_seq_udf()(F.col("va"), F.col("vb")),
            S.COSINE_SCALE,
        ).alias("seq"),
    ).filter(F.col("expr") != F.col("seq"))
    assert diff.count() == 0
    assert pairs.count() > 10_000  # the comparison actually covered pairs


def test_banded_pairs_big_bucket_fallback(spark, monkeypatch):
    """Buckets above _COLLECT_BUCKET_CAP expand via the equi-self-join
    (shuffle/spill-bound) instead of a single-task O(n^2) collect_list
    array, with an identical pair set (ADVICE r3)."""
    from hangarbay_spark.operators import similarity as S

    n = 30
    sigs = spark.createDataFrame(
        [(i, 7, i % 3) for i in range(n)], "vec_id int, b0 int, b1 int"
    )
    want = {
        tuple(r)
        for r in S._banded_candidate_pairs(sigs, "vec_id", 2, None).collect()
    }
    assert len(want) > n  # bucket b0=7 alone contributes n*(n-1)/2 pairs
    monkeypatch.setattr(S, "_COLLECT_BUCKET_CAP", 5)
    got = {
        tuple(r)
        for r in S._banded_candidate_pairs(sigs, "vec_id", 2, None).collect()
    }
    assert got == want


def test_index_root_provenance(spark, tmp_path, monkeypatch):
    """Same-basename corpus dirs get distinct roots, and a corpus
    regenerated in place invalidates its artifacts (ADVICE r3: stale
    signatures must rebuild, not silently serve)."""
    import os
    import shutil
    from pathlib import Path

    from hangarbay_spark.pipelines import indexes

    src = "/root/testdata/sf0.001"
    corpus_a = tmp_path / "a" / "sfx"
    corpus_b = tmp_path / "b" / "sfx"
    for c in (corpus_a, corpus_b):
        c.mkdir(parents=True)
        for t in ("documents", "embeddings"):
            shutil.copy(f"{src}/{t}.parquet", c / f"{t}.parquet")
    monkeypatch.setenv("HANGARBAY_INDEX_DIR", str(tmp_path / "idx"))
    ra = indexes.index_root(str(corpus_a))
    rb = indexes.index_root(str(corpus_b))
    assert ra != rb  # equal basenames cannot collide

    path = indexes.ensure_simhash_sigs(spark, str(corpus_a))
    assert (Path(path) / "_SUCCESS").exists()
    # "regenerate" corpus_a (mtime bump) -> next resolution wipes stale
    os.utime(corpus_a / "documents.parquet")
    indexes.index_root(str(corpus_a))
    assert not (Path(path) / "_SUCCESS").exists()
    # and ensure_* rebuilds from the new corpus
    rebuilt = indexes.ensure_simhash_sigs(spark, str(corpus_a))
    assert (Path(rebuilt) / "_SUCCESS").exists()


def test_cosine_pair_udf_matches_expr(spark):
    """The einsum pair-cosine kernel and the sequential-accumulation
    expression path produce identical 9-dp cosines (and hence identical
    near-dup pair sets) on the sf0.01 corpus."""
    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    expr = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.embedding_near_dup_pairs(
            emb, threshold=0.4, dim=64, max_bucket=100
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.embedding_near_dup_pairs(
            emb, threshold=0.4, dim=64, max_bucket=100, fast=True,
            fast_cosine=True
        ).collect()
    }
    assert fast == expr and len(expr) > 0


def test_simhash_hamming_pigeonhole(spark):
    """Pin the block-pigeonhole machinery on hand-built fingerprints:
    a 1-bit-different pair is caught, a far pair is not, and the
    reported Hamming distance is exact."""
    rows = [
        (1, 0x1234, 0x5678, 0x9ABC, 0x0DEF),
        (2, 0x1235, 0x5678, 0x9ABC, 0x0DEF),  # 1 bit from doc 1
        (3, 0x1234 ^ 0x7, 0x5678, 0x9ABC, 0x0DEF),  # 3 bits from doc 1
        (4, 0xFFFF, 0x0000, 0xFFFF, 0x0000),  # far from everything
    ]
    fp = spark.createDataFrame(
        rows, "doc_id int, w0 int, w1 int, w2 int, w3 int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs_from_fingerprints(fp, "doc_id", 3).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 3
    assert got[(2, 3)] == 2  # 0x1235 vs 0x1233: bits 1,2 differ
    assert not any(4 in pair for pair in got)
    # d >= number of blocks would break pigeonhole completeness
    import pytest

    with pytest.raises(ValueError):
        D.simhash_pairs_from_fingerprints(fp, "doc_id", 4)


def test_simhash_perturbed_doc_caught(spark):
    """A doc with one token changed out of many stays within Hamming<=3
    of the original (deterministic fixture, pinned empirically)."""
    base = " ".join(f"tok{i}" for i in range(60))
    perturbed = base.replace("tok30", "tok999")
    reordered = " ".join(reversed(base.split()))  # same token SET
    df = spark.createDataFrame(
        [(1, base), (2, perturbed), (3, reordered)], "doc_id int, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(df, "doc_id", "text", 3).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 0  # token-set-identical
    assert (1, 2) in pairs  # 1-token perturbation caught
    groups = D.simhash_dup_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2


def test_fts_phrase_search(spark):
    df = _docs_df(spark)
    idx = fts.build_positional_index(df, "doc_id", "text")
    ids = lambda ph: {  # noqa: E731
        r["doc_id"] for r in fts.match_phrase(idx, ph, "doc_id").collect()
    }
    assert ids("quick brown") == {1, 2, 4}
    assert ids("brown quick") == set()  # order matters
    assert ids("the quick brown fox") == {1, 2}  # 4-token phrase
    assert ids("lazy dogs") == {4}
    assert ids("") == set()


def test_fts_repeated_query_token(spark):
    # a repeated word must not make the AND count-equality unsatisfiable
    df = _docs_df(spark)
    idx = fts.build_inverted_index(df, "doc_id", "text")
    ids = {
        r["doc_id"]
        for r in fts.match_all(idx, "quick brown quick", "doc_id").collect()
    }
    assert ids == {1, 2, 4}


def test_multimodal_null_payload(spark):
    rows = M.make_media_rows(
        [
            {"media_id": "ok", "kind": "image", "payload": b"bytes"},
            {"media_id": "nul", "kind": "image", "payload": None},
        ]
    )
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in M.extract_features(media).collect()}
    # a null payload yields null feature columns, not a failed batch
    assert got["nul"]["n_bytes"] == 0
    assert got["nul"]["sha256"] is None
    assert got["nul"]["feature"] is None
    assert got["ok"]["feature"] is not None


def test_as_of_join_ties(spark):
    """Pin the operator's tie semantics AND whole-row carry: with
    duplicate (key, ts) right rows, all asof_ columns must come from the
    single tie-break winner — and with genuinely-null right columns, from
    the one matched row (struct carry), never stitched across rows."""
    from hangarbay_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "u", 200)], "eid int, k string, ts long"
    )
    # two right rows at the same (key, ts): winner is rid=21 wholesale
    right = spark.createDataFrame(
        [(20, "u", 100, "a"), (21, "u", 100, None)],
        "rid int, k string, ts long, tag string",
    )
    row = as_of_join(
        left, right, on="k", right_cols=["rid", "tag"], tie_break="rid"
    ).collect()[0]
    assert row["asof_rid"] == 21
    assert row["asof_tag"] is None  # winner's null tag, NOT loser's "a"

    # distinct-ts right rows with complementary nulls: the matched row
    # is carried as a unit (no mixing of ts=1's a with ts=2's b)
    right2 = spark.createDataFrame(
        [(1, "u", 1, None), (None, "u", 2, "b")],
        "a int, k string, ts long, b string",
    )
    row2 = as_of_join(
        left, right2, on="k", right_cols=["a", "b"]
    ).collect()[0]
    assert row2["asof_a"] is None and row2["asof_b"] == "b"


def test_range_join_binned(spark):
    """Binned range join: inclusive boundaries, intervals spanning many
    bins, key isolation, and points matching multiple intervals."""
    from hangarbay_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 999), (4, "v", 100)],
        "pid int, k string, ts long",
    )
    intervals = spark.createDataFrame(
        [
            (10, "u", 100, 250),  # both boundaries inclusive
            (11, "u", 0, 990),  # spans 100 bins at bin_width=10
            (12, "w", 0, 1000),  # other key — never matches
        ],
        "iid int, k string, st long, en long",
    )
    out = range_join(
        points, intervals, on="k", point_ts="ts", start="st", end="en",
        bin_width=10,
    )
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11)}
    # pid 3 (ts=999 > 990) and pid 4 (key v) match nothing


def test_connected_components_and_survivors(spark):
    # chain 1-2, 2-3 plus isolated pair 7-8: two clusters
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 8)], "id_a int, id_b int"
    )
    comp = {r["id"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    df = spark.createDataFrame([(i, f"t{i}") for i in (1, 2, 3, 5, 7, 8)], "doc_id int, text string")
    kept = {r["doc_id"] for r in D.near_dedup_survivors(df, pairs.selectExpr("id_a", "id_b"), "doc_id").collect()}
    # one survivor per cluster (min id) + untouched doc 5
    assert kept == {1, 5, 7}


def test_connected_components_kernel_matches_loop(spark, monkeypatch):
    """The small-graph union-find kernel (CC_KERNEL_MAX_EDGES fast
    path, r10) must produce labels identical to the distributed
    min-label loop — both compute cluster = min reachable id."""
    import random

    rng = random.Random(7)
    # chains, stars, a cycle, isolated pairs — varied diameters
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (7, 8)]
    edges += [(100, 100 + i) for i in range(1, 6)]  # star
    edges += [(200, 201), (201, 202), (202, 200)]  # cycle
    edges += [(rng.randint(300, 340), rng.randint(300, 340)) for _ in range(30)]
    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    new = sorted(
        (r["id"], r["cluster"])
        for r in D.connected_components(pairs).collect()
    )
    monkeypatch.setattr(D, "CC_KERNEL_MAX_EDGES", -1)  # force the loop
    old = sorted(
        (r["id"], r["cluster"])
        for r in D.connected_components(pairs).collect()
    )
    assert new == old and len(new) > 0


# ---------------------------------------------------------------------------
# Corpus filters (operators/filters.py)
# ---------------------------------------------------------------------------

from hangarbay_spark.operators import filters as FL  # noqa: E402


def test_line_dedup_and_fraction(spark):
    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),  # 2 of 5 lines are repeats
            (2, "only one line"),
            (3, "x\nx\nx\nx"),  # 3 of 4 are repeats
        ],
        "doc_id int, text string",
    )
    lined = df.select(
        "doc_id",
        FL.lines_expr("text").alias("lines"),
    ).select(
        "doc_id",
        FL.duplicate_line_fraction_expr(F.col("lines")).alias("frac"),
        F.array_join(FL.dedup_lines_expr(F.col("lines")), "|").alias("clean"),
    )
    got = {r["doc_id"]: (r["frac"], r["clean"]) for r in lined.collect()}
    assert got[1] == (0.4, "a|b|c")  # first occurrences, order kept
    assert got[2] == (0.0, "only one line")
    assert got[3] == (0.75, "x")


def test_word_level_filter_features(spark):
    df = spark.createDataFrame(
        [(1, "the cat ... sat # on 123 999 mat…")], "doc_id int, text string"
    )
    toks = df.select(
        "doc_id", X.tokens_expr("text").alias("toks"), F.col("text")
    )
    row = toks.select(
        FL.alpha_word_fraction_expr(F.col("toks")).alias("alpha"),
        FL.mean_word_length_expr(F.col("toks")).alias("mwl"),
        FL.symbol_word_ratio_expr(F.col("text"), F.col("toks")).alias("sym"),
    ).collect()[0]
    # 8 tokens: the cat ... sat # on 123 999 mat… -> 9 tokens actually:
    # ['the','cat','...','sat','#','on','123','999','mat…']
    assert row["alpha"] == 5 / 9  # the, cat, sat, on, mat…
    assert abs(row["mwl"] - (3 + 3 + 3 + 3 + 1 + 2 + 3 + 3 + 4) / 9) < 1e-12
    assert row["sym"] == 3 / 9  # '...', '#', '…'


def test_ngrams_keep_duplicates(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id int, text string")
    grams = df.select(
        FL.ngrams_expr(X.tokens_expr("text"), 2).alias("g")
    ).collect()[0]["g"]
    assert grams == ["a b", "b a", "a b", "b a"]  # multiset, not distinct
    short = df.select(
        FL.ngrams_expr(F.array(F.lit("solo")), 2).alias("g")
    ).collect()[0]["g"]
    assert short == ["solo"]


def test_pii_redaction_order_and_counts(spark):
    s = (
        "write alice.smith+tag@mail-host.org or 10.20.30.40 "
        "call 555-123-4567 x 999.888.7777"
    )
    df = spark.createDataFrame([(1, s)], "doc_id int, text string")
    row = df.select(
        FL.redact_pii_expr("text").alias("red"),
        FL.pii_count_expr("text", FL.PII_EMAIL).alias("ne"),
        FL.pii_count_expr("text", FL.PII_IP).alias("ni"),
        FL.pii_count_expr("text", FL.PII_PHONE).alias("np"),
    ).collect()[0]
    assert row["ne"] == 1 and row["ni"] == 1 and row["np"] == 2
    assert row["red"] == "write <EMAIL> or <IP> call <PHONE> x <PHONE>"
    # email local-part digits and IP dotted digits never half-match the
    # phone pattern because of redaction order
    assert "@" not in row["red"] and "555" not in row["red"]


# ---------------------------------------------------------------------------
# FFD sequence packing (operators/packing.py)
# ---------------------------------------------------------------------------

import hashlib
import math

from hangarbay_spark.operators import packing as PK


def _py_shard(doc_id: int, n_shards: int) -> int:
    # twin of sampling.hash_bucket_expr % n_shards
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % n_shards


def test_ffd_matches_python_reference(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["id"]: (r["shard"], r["pack_id"])
        for r in PK.pack_sequences_ffd(
            df, "doc_id", "n_tokens", budget=100, n_shards=4
        ).collect()
    }
    # recompute: shard assignment, then per-shard FFD
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, n in rows:
        by_shard.setdefault(_py_shard(i, 4), []).append((i, n))
    expect = {}
    for shard, counts in by_shard.items():
        assign = PK.ffd_pack(counts, 100)
        for (i, _), a in zip(counts, assign):
            expect[i] = (shard, shard * PK._SHARD_STRIDE + a)
    assert got == expect


def test_ffd_invariants_and_determinism(spark):
    rows = [(i, 5 + (i * 13) % 200) for i in range(200)]
    rows.append((999, 5000))  # oversized item -> its own pack
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    budget = 150
    packed = PK.pack_sequences_ffd(df, "doc_id", "n_tokens", budget, n_shards=8)
    out = packed.collect()
    # every doc assigned exactly once
    assert sorted(r["id"] for r in out) == sorted(i for i, _ in rows)
    # no pack over budget except singleton oversized items
    loads: dict[int, list[int]] = {}
    for r in out:
        loads.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for vals in loads.values():
        assert sum(vals) <= budget or len(vals) == 1
    # FFD quality: within 11/9*OPT + 1 per shard (8 shards)
    total = sum(n for _, n in rows if n <= budget)
    lower_bound = math.ceil(total / budget)
    n_packs = len([v for v in loads.values() if sum(v) <= budget])
    assert n_packs <= math.ceil(lower_bound * 11 / 9) + 8
    # determinism under different input partitioning
    again = {
        r["id"]: r["pack_id"]
        for r in PK.pack_sequences_ffd(
            df.repartition(7), "doc_id", "n_tokens", budget, n_shards=8
        ).collect()
    }
    assert again == {r["id"]: r["pack_id"] for r in out}


def test_pandas_udf_topk_matches_expr(spark):
    """The vectorized pandas_udf cosine path returns exactly the
    expression path's rows on the driver corpus."""
    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    a = {
        (r["probe_id"], r["rk"]): (r["neighbor_id"], r["cosine"])
        for r in S.brute_force_topk(emb, probes, k=5).collect()
    }
    b = {
        (r["probe_id"], r["rk"]): (r["neighbor_id"], r["cosine"])
        for r in S.brute_force_topk_pandas(emb, probes, k=5).collect()
    }
    assert a == b


def test_pii_spans_match_redaction_counts(spark):
    """The UDTF's span counts per kind equal the column-expression
    redaction counts, and excerpts sit exactly at their spans."""
    from hangarbay_spark.operators import filters as _FL
    from hangarbay_spark.operators.udtfs import register_udtfs

    s = (
        "mail a.b@c-d.org then 10.0.0.1 call 555-123-4567 "
        "and 999.888.7777 again a.b@c-d.org"
    )
    df = spark.createDataFrame([(1, s)], "doc_id int, text string")
    register_udtfs(spark)
    df.createOrReplaceTempView("_udtf_docs")
    spans = spark.sql(
        "SELECT doc_id, s.* FROM _udtf_docs, LATERAL pii_spans(text) s"
    ).collect()
    by_kind = {}
    for r in spans:
        by_kind.setdefault(r["kind"], []).append(r)
        assert s[r["start"] : r["end"]] == r["excerpt"]
    counts = df.select(
        _FL.pii_count_expr("text", _FL.PII_EMAIL).alias("e"),
        _FL.pii_count_expr("text", _FL.PII_IP).alias("i"),
        _FL.pii_count_expr("text", _FL.PII_PHONE).alias("p"),
    ).collect()[0]
    assert len(by_kind["email"]) == counts["e"] == 2
    assert len(by_kind["ip"]) == counts["i"] == 1
    assert len(by_kind["phone"]) == counts["p"] == 2


def test_lang_id_cjk_script_detection(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is the best"),  # en stopwords
            (2, "这是一个中文文档"),  # pure CJK
            (3, "mixed the and 中文 content"),  # CJK wins over stopwords
            (4, "zzz qqq xxx"),  # nothing -> und
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", X.lang_id_expr("text").alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "zh", 3: "zh", 4: "und"}


def test_as_of_join_cogrouped_matches_window_path(spark):
    """The cogrouped-applyInPandas as-of twin returns exactly the
    window formulation's rows on real events data, and pins the same
    tie/whole-row-carry semantics on the hand-built fixtures."""
    from hangarbay_spark.operators.temporal import (
        as_of_join,
        as_of_join_cogrouped,
    )
    from hangarbay_spark.queries.base import load_events
    from pyspark.sql import functions as F

    ev = load_events(spark, "/root/testdata/sf0.001")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("sid"))
    )
    a = {
        tuple(r)
        for r in as_of_join(
            purchases, signups, on="user_id", right_cols=["sid"]
        ).collect()
    }
    bg = as_of_join_cogrouped(
        purchases, signups, on="user_id", right_cols=["sid"]
    )
    # the cogroup path additionally exports asof_ts; compare on the
    # window path's columns and separately pin asof_ts == matched ts
    b = {
        tuple(r)
        for r in bg.select("event_id", "user_id", "ts", "asof_sid").collect()
    }
    assert a == b and len(a) > 0
    # the partition-batched Arrow path returns the same rows too
    from hangarbay_spark.operators.temporal import as_of_join_arrow

    c = {
        tuple(r)
        for r in as_of_join_arrow(
            purchases, signups, on="user_id", right_cols=["sid"]
        )
        .select("event_id", "user_id", "ts", "asof_sid")
        .collect()
    }
    assert a == c
    assert (
        bg.filter(
            F.col("asof_sid").isNotNull() & (F.col("asof_ts") > F.col("ts"))
        ).count()
        == 0
    )

    # tie + whole-row-carry fixtures (mirror of test_as_of_join_ties)
    left = spark.createDataFrame(
        [(1, "u", 200)], "eid int, k string, ts long"
    )
    right = spark.createDataFrame(
        [(20, "u", 100, "a"), (21, "u", 100, None)],
        "rid int, k string, ts long, tag string",
    )
    row = as_of_join_cogrouped(
        left, right, on="k", right_cols=["rid", "tag"], tie_break="rid"
    ).collect()[0]
    assert row["asof_rid"] == 21
    assert row["asof_tag"] is None
    # left key with no right rows at all -> null asof columns
    left2 = spark.createDataFrame(
        [(9, "nobody", 5)], "eid int, k string, ts long"
    )
    row2 = as_of_join_cogrouped(
        left2, right, on="k", right_cols=["rid", "tag"]
    ).collect()[0]
    assert row2["asof_rid"] is None and row2["asof_tag"] is None


def test_epoch_mixture_deterministic_and_weighted(spark):
    """Epoch mixing: integer epochs emit exactly floor(w) copies per
    row, fractional epochs keep a stable ~frac subset (same rows under
    any repartitioning), and weight<1 drops the complement."""
    from hangarbay_spark.operators.sampling import epoch_mixture

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
    )
    weights = {"src0": 0.25, "src2": 2.0, "src3": 3.5}
    out = epoch_mixture(df, "k", "source", weights)
    per = {
        r["source"]: (r["n_rows"], r["n_docs"])
        for r in out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_docs"),
        )
        .collect()
    }
    # src1 (default 1.0): every row exactly once
    assert per["src1"] == (500, 500)
    # src2 (2.0): every row exactly twice
    assert per["src2"] == (1000, 500)
    # src0 (0.25): ~125 of 500 rows, once each
    assert per["src0"][0] == per["src0"][1]
    assert 80 < per["src0"][0] < 170
    # src3 (3.5): every row 3 times + ~half a 4th time
    assert per["src3"][1] == 500
    assert 1600 < per["src3"][0] < 1900
    # repeat_idx is a dense 0..n-1 per row
    mx = out.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.max("repeat_idx").alias("m")
    )
    assert mx.filter(F.col("m") != F.col("n") - 1).count() == 0
    # deterministic under repartition
    out2 = epoch_mixture(df.repartition(13), "k", "source", weights)
    a = {(r["k"], r["repeat_idx"]) for r in out.collect()}
    b = {(r["k"], r["repeat_idx"]) for r in out2.collect()}
    assert a == b


def test_lsh_recall_floor(spark):
    """MinHash banding must keep recall >= 0.9 against the exact
    Jaccard pairs at the 0.8 threshold on the planted-duplicate corpus
    (currently 1.0: every exact pair shares at least one band). A
    parameter change (fewer bands, shorter signatures) that breaks
    recall fails here before the registry ships it."""
    from hangarbay_spark.queries import REGISTRY

    row = REGISTRY["dedup_lsh_recall_report"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_exact > 0
    assert row.recall >= 0.9


def test_bm25_ranking_behavior(spark):
    """BM25 semantics on a tiny controlled corpus: a doc matching both
    query terms outranks single-term docs; among equal-length docs
    matching the same term set, higher tf ranks higher; non-matching
    docs never appear."""
    rows = [
        (1, "spark engine spark engine spark engine"),  # tf(spark)=3
        (2, "spark engine motor diesel rotor blade"),   # tf(spark)=1
        (3, "spark window motor diesel rotor blade"),   # both terms
        (4, "motor diesel rotor blade crank shaft"),    # no terms
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    tfi = fts.build_tf_index(df, "doc_id", "text")
    dls = fts.build_doclen(df, "doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in fts.bm25_topk(tfi, dls, "spark window", "doc_id", k=10).collect()
    }
    assert 4 not in out
    assert set(out) == {1, 2, 3}
    # both-term doc beats every single-term doc
    assert out[3]["bm25"] > out[1]["bm25"] > out[2]["bm25"]
    # ranks are dense and consistent with scores
    assert [out[i]["rk"] for i in (3, 1, 2)] == [1, 2, 3]


def test_simhash_matches_python_reference(spark):
    """The packed-counter fingerprint equals a direct Python SimHash
    over the same md5 bit votes — exercised on edge shapes (single
    token, repeated token, unicode, long doc) that corpus parity may
    not isolate. Guards the 16-bit field packing/unpacking."""
    import hashlib
    import re

    docs = [
        (1, "solo"),
        (2, "dup dup dup dup"),          # one distinct token
        (3, "naïve café über tokens"),   # unicode
        (4, " ".join(f"t{i}" for i in range(300))),  # wide vote counts
        (5, "Mixed CASE Tokens mixed case tokens"),
    ]

    def py_simhash(text):
        toks = {t for t in re.split(r"\s+", text.lower().strip()) if t}
        words = []
        for j in range(4):
            w = 0
            for i in range(16):
                g = j * 16 + i
                ones = 0
                for t in toks:
                    d = int(hashlib.md5(t.encode()).hexdigest()[g // 4], 16)
                    ones += (d >> (g % 4)) & 1
                if 2 * ones > len(toks):
                    w |= 1 << i
            words.append(w)
        return words

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: [r["w0"], r["w1"], r["w2"], r["w3"]]
        for r in D.simhash_fingerprints(df, "doc_id", "text").collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == py_simhash(text), doc_id


def test_char_entropy_matches_python_reference(spark):
    """char_entropy_expr pinned to a pure-Python twin of the
    micros-pinned formula (H = ln n - (1/n) sum k ln k)."""
    import collections
    import math

    from hangarbay_spark.operators.text import (
        char_entropy_from_starts,
        char_run_starts_expr,
        chars_expr,
    )

    texts = ["aab", "", "hello world", "aaaaaaa", "abcdefg", "ab ab ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "s"]
    )
    runs = (
        df.select("id", chars_expr("s").alias("chars"))
        .select(
            "id",
            F.size("chars").alias("n"),
            F.array_sort("chars").alias("sc"),
        )
        .select(
            "id", "n", char_run_starts_expr(F.col("sc")).alias("starts")
        )
    )
    got = {
        r["id"]: r["h"]
        for r in runs.select(
            "id",
            char_entropy_from_starts(F.col("starts"), F.col("n")).alias("h"),
        ).collect()
    }

    def pyent(s):
        if not s:
            return None
        n = len(s)
        c = collections.Counter(s)
        smic = sum(k * round(math.log(k) * 1e6) for k in c.values())
        return round((round(math.log(n) * 1e6) - smic / n) / 1e6, 6)

    for i, t in enumerate(texts):
        assert got[i] == pyent(t), (t, got[i], pyent(t))


def test_compression_ratio_orders_redundancy(spark):
    """zlib ratio: repetitive text compresses far below prose; NULL for
    empty/NULL; deterministic across invocations."""
    from hangarbay_spark.operators.text import compression_ratio_udf

    rows = [
        (1, "spam " * 200),
        (2, "The quick brown fox jumps over the lazy dog. " * 5),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    ratio = compression_ratio_udf()(df["text"])
    got = {r["id"]: r["r"] for r in df.select("id", ratio.alias("r")).collect()}
    assert got[3] is None and got[4] is None
    assert got[1] < 0.1 < got[2] < 1.0
    again = {
        r["id"]: r["r"] for r in df.select("id", ratio.alias("r")).collect()
    }
    assert got == again


def test_deletion_join_complete_vs_brute_force(spark):
    """FastSS deletion-neighborhood join returns EXACTLY the lev<=1
    pairs a brute-force O(n^2) scan finds (completeness + no false
    positives after verification)."""
    import itertools
    import random

    from hangarbay_spark.operators.fuzzy import deletion_join

    rng = random.Random(42)
    alphabet = "abc"
    words = list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
            for _ in range(60)
        }
    )
    # Duplicates (dist-0 pairs) and the empty string are the edge
    # cases of the positioned candidate generator.
    words += [words[0], words[1], ""]
    rows = [(i, w) for i, w in enumerate(sorted(words))]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = sorted(
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    )
    df = spark.createDataFrame(rows, ["k", "s"])
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in deletion_join(df, "k", "s").collect()
    )
    assert got == want
    assert len(want) > 0  # the fixture actually exercises pairs


def test_hll_rollup_error_bound(spark):
    """Union-of-daily-sketches estimate stays within 5% of the exact
    distinct count, and merges without rescanning events."""
    import os

    from hangarbay_spark.queries.base import REGISTRY

    SF_DIR = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )

    df = REGISTRY["agg_hll_mergeable_rollup"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.05, (r["event_type"], r["rel_err"])
        assert r["n_days"] >= 1


def test_weighted_sample_bias_and_determinism(spark):
    """A-ES weighted sampling: heavier rows dominate the sample in
    proportion to weight; same seed -> identical sample; different
    seed -> different order."""
    from hangarbay_spark.operators.sampling import weighted_sample

    rows = [(i, 9 if i < 100 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    picks = {}
    for seed in ("s0", "s1", "s2"):
        got = [r["id"] for r in weighted_sample(df, "id", "w", 50, seed).collect()]
        assert len(got) == 50 and len(set(got)) == 50
        heavy = sum(1 for i in got if i < 100)
        # E[heavy] ~ 45 of 50 (9:1 weights, 100 of each): far above the
        # unweighted 25; 35 is > 6 sigma below the weighted mean.
        assert heavy > 35, (seed, heavy)
        picks[seed] = got
    again = [r["id"] for r in weighted_sample(df, "id", "w", 50, "s0").collect()]
    assert again == picks["s0"]
    assert picks["s0"] != picks["s1"]


def test_weighted_sample_excludes_nonpositive(spark):
    from hangarbay_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, 1)], ["id", "w"]
    )
    got = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {1, 4}


def test_pagerank_cycle_and_star(spark):
    """Exact small-graph pins: a directed cycle stays uniform; a
    symmetrized star concentrates rank on the hub; ranks sum to ~1."""
    from hangarbay_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    r = {x["node"]: x["rank"] for x in pagerank(cycle, iters=5).collect()}
    third = round(1.0 / 3.0, 12)
    assert r == {1: third, 2: third, 3: third}

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)]
        + [(i, 0) for i in range(1, 6)],
        ["src", "dst"],
    )
    rs = {x["node"]: x["rank"] for x in pagerank(star, iters=20).collect()}
    assert abs(sum(rs.values()) - 1.0) < 1e-6
    assert rs[0] > 0.4 and all(rs[0] > rs[i] for i in range(1, 6))
    leaf = {rs[i] for i in range(1, 6)}
    assert len(leaf) == 1  # symmetric leaves tie exactly


def test_pq_recall_floor(spark):
    """PQ/ADC with exact re-rank recovers >=0.8 of the exact top-5 on
    the sf0.001 embeddings (m=4 one-byte codes + norm per vector)."""
    import os

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.operators.similarity import brute_force_topk

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    bf = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    pq = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.pq_topk(emb, probes, k=5).collect()
    }
    assert len(bf & pq) / len(bf) >= 0.8


def test_ivfpq_recall_floor(spark):
    """Composed IVF x PQ (cell routing + ADC + exact re-rank) recovers
    >=0.8 of the exact top-5 on the sf0.001 embeddings — routing
    misses (true neighbor in an unprobed cell) stay bounded at
    nprobe=4 of nlist=16. Measured 0.867 at sf0.001 and sf0.01."""
    import os

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.operators.similarity import brute_force_topk

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    bf = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.ivfpq_topk(emb, probes, k=5).collect()
    }
    assert len(bf & got) / len(bf) >= 0.8


def test_prefix_filter_jaccard_equals_full_join(spark):
    """Prefix filtering is LOSSLESS at the threshold: the pruned-
    candidate pair set equals the full inverted-index self-join's
    pair set at the same integer threshold (the oracle re-proves this
    at sf0.01; this pins it at sf0.001 against the in-repo full-join
    operator, including the 6-dp jaccard values)."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["id_a"], r["id_b"], r["inter_sz"], r["union_sz"])
        for r in D.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold_pct=70
        ).collect()
    }
    post = D.shingle_postings(docs, "doc_id", "text", 3).localCheckpoint()
    a = post.select(F.col("doc_id").alias("id_a"), "shingle")
    b = post.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sz = post.groupBy("doc_id").count()
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("count").alias("ma"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("count").alias("mb"))
    want = {
        (r["id_a"], r["id_b"], r["i"], r["ma"] + r["mb"] - r["i"])
        for r in inter.join(sa, "id_a").join(sb, "id_b").collect()
        if 100 * r["i"] >= 70 * (r["ma"] + r["mb"] - r["i"])
    }
    assert got == want and len(got) > 0


def test_nsw_recall_floor(spark):
    """NSW graph ANN (build from banded-LSH candidates + ring
    backbone, auto-scaled beam search) recovers >=0.8 of the exact
    top-5 on the synthetic embeddings — the worst case for graph
    routing (near-random space, no cluster gradient). Measured 1.0 at
    sf0.001/sf0.01 and 0.8 at sf0.1."""
    import os

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.operators.similarity import brute_force_topk

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    bf = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    adj = S.nsw_build_adjacency(emb)
    beam = S.auto_nsw_beam(emb.count())
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.nsw_topk(emb, probes, adj, k=5, beam=beam).collect()
    }
    assert len(bf & got) / len(bf) >= 0.8


def test_nsw_graph_invariants(spark):
    """Every corpus id has out-edges (ring backbone covers bucket-miss
    nodes), the reader view bounds knn out-degree at NSW_DEGREE, and
    ring edges survive the trim."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    adj = S.nsw_build_adjacency(emb).localCheckpoint()
    view = S.nsw_edges_view(adj)
    n = emb.count()
    assert view.select("src").distinct().count() == n
    maxdeg = (
        view.filter(F.col("kind") == "knn")
        .groupBy("src")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert maxdeg <= S.NSW_DEGREE
    assert view.filter(F.col("kind") == "ring").count() > 0


def test_nsw_persisted_matches_inline(spark, tmp_path):
    """Persisted-index search == inline search (same deterministic
    build; graph parameters come from the side file), and the side
    files exist next to the artifacts."""
    import os

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    adj_path = str(tmp_path / "nsw_adj")
    sigs_path = str(tmp_path / "nsw_sigs")
    S.write_nsw_index(emb, adj_path, sigs_path, dim=64)
    assert os.path.exists(adj_path + "_nsw.json")
    assert os.path.exists(sigs_path + "_geometry.json")
    inline = S.nsw_topk(
        emb,
        probes,
        S.nsw_build_adjacency(emb),
        k=5,
        beam=S.auto_nsw_beam(emb.count()),
    )
    persisted = S.nsw_topk_from_index(spark, adj_path, emb, probes, k=5)
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b and len(a) == 15


def test_nsw_append_recall_and_idempotence(spark, tmp_path):
    """Incremental NSW insert: the appended index still clears the
    0.8 recall floor on the FULL corpus (new nodes reachable via
    back-links/anchors), re-appending the same batch is a no-op, and
    appended new nodes carry knn edges in the reader view."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    adj_path = str(tmp_path / "adj")
    sigs_path = str(tmp_path / "sigs")
    S.write_nsw_index(old, adj_path, sigs_path, dim=64)
    n = S.nsw_append_to_index(spark, new, adj_path, sigs_path, emb, dim=64)
    assert n == new.count()
    assert (
        S.nsw_append_to_index(spark, new, adj_path, sigs_path, emb, dim=64)
        == 0
    )
    view = S.nsw_edges_view(spark.read.parquet(adj_path))
    new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
    srcs = {r["src"] for r in view.select("src").distinct().collect()}
    assert new_ids <= srcs
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    bf = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.nsw_topk_from_index(
            spark, adj_path, emb, probes, k=5
        ).collect()
    }
    assert len(bf & got) / len(bf) >= 0.8


def test_hyperplane_topk_kernel_matches_distributed(spark):
    """The single-task hplsh replay kernel (the path below
    NSW_KERNEL_MAX_NODES) equals the distributed bucket-join pipeline
    exactly — candidate sets, 9-dp cosines, ranks."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    kern = S.hyperplane_topk(emb, probes, k=5, dim=64)  # gate fires
    dist = S.hyperplane_topk(
        emb, probes, k=5, dim=64,
        n_nodes=S.NSW_KERNEL_MAX_NODES + 1,  # force distributed
    )
    a = sorted(map(tuple, kern.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b and len(a) == 15


def test_near_dup_kernel_matches_distributed(spark):
    """The single-task near-dup replay kernel (gated inside
    embedding_near_dup_pairs for auto-nbits + guarded callers) equals
    the distributed bucket pipeline exactly, including the hot-bucket
    guard."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    nbits = S.auto_hyperplane_nbits(n)
    kern = S.embedding_near_dup_pairs(
        emb, threshold=0.4, dim=64, max_bucket=100
    )  # auto nbits + guard -> kernel
    dist = S.embedding_near_dup_pairs(
        emb, threshold=0.4, dim=64, max_bucket=100, nbits=nbits
    )  # explicit nbits -> distributed path
    a = sorted(map(tuple, kern.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b and len(a) > 0


def test_nsw_walk_kernel_matches_loop(spark):
    """The single-task view+walk replay kernel (the path below
    NSW_KERNEL_MAX_NODES) returns EXACTLY the distributed beam loop's
    rows — ids, 9-dp cosines, ranks — on the test corpus (bit-identical
    sequential cosine + Decimal(repr) HALF_UP round replay)."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    adj = S.nsw_build_adjacency(emb).localCheckpoint()
    beam = S.auto_nsw_beam(emb.count())
    kern = S.nsw_topk(emb, probes, adj, k=5, beam=beam)  # gate fires
    loop = S.nsw_topk(
        emb, probes, adj, k=5, beam=beam,
        n_nodes=S.NSW_KERNEL_MAX_NODES + 1,  # force the distributed loop
    )
    a = sorted(map(tuple, kern.collect()))
    b = sorted(map(tuple, loop.collect()))
    assert a == b and len(a) == 15


def test_nsw_build_walk_kernel_matches_distributed(spark):
    """The whole-query replay kernel (signatures + banded candidates +
    knn/ring build + view + walk in one Arrow task) equals the
    distributed build + distributed walk exactly."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    n = emb.count()
    beam = S.auto_nsw_beam(n)
    kern = S.nsw_build_walk_kernel(emb, probes, k=5, beam=beam, n_nodes=n)
    loop = S.nsw_topk(
        emb, probes, S.nsw_build_adjacency(emb), k=5, beam=beam,
        n_nodes=S.NSW_KERNEL_MAX_NODES + 1,
    )
    a = sorted(map(tuple, kern.collect()))
    b = sorted(map(tuple, loop.collect()))
    assert a == b and len(a) == 15


def test_auto_hyperplane_geometry(spark, tmp_path):
    """Band width floors at the fixed 8-bit default for every
    oracle-compared corpus size (n <= 2048), grows ~log2(n) beyond, and
    persisted tables round-trip their geometry so probe-side signatures
    always match the build."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    assert S.auto_hyperplane_nbits(200) == 64
    assert S.auto_hyperplane_nbits(2048) == 64
    assert S.auto_hyperplane_nbits(20000) == 96   # 12-bit bands
    assert S.auto_hyperplane_nbits(2_000_000) == 8 * 18

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "hp_sigs")
    S.write_hyperplane_signature_table(emb, path, dim=64, nbits=96)
    assert S._read_geometry(path) == (96, 8, "hplsh")
    # probe path derives the table's geometry -> bands still bucket-join
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = S.hyperplane_topk_from_signature_table(
        spark, path, emb, probes, k=5, dim=64
    )
    assert got.count() > 0


def test_ivfpq_persisted_matches_inline_and_prunes_partitions(spark):
    """The persisted cell-partitioned IVFADC index reproduces the
    inline trainer's results row-for-row, and its code scan carries the
    probed-cell partition filter — the parquet listing reads only
    nprobe cells' files."""
    from hangarbay_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    inline = {
        (r["probe_id"], r["neighbor_id"], r["rk"])
        for r in REGISTRY["sim_ivfpq_topk"].fn(spark, sf).collect()
    }
    pers_df = REGISTRY["sim_ivfpq_persisted_topk"].fn(spark, sf)
    pers = {
        (r["probe_id"], r["neighbor_id"], r["rk"])
        for r in pers_df.collect()
    }
    assert inline == pers and len(pers) == 15
    plan = pers_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell#" in plan, plan


def test_ivfpq_residual_mse_and_recall(spark):
    """Residual encoding (IVFADC proper) at IDENTICAL m/ksub/nlist
    geometry: reconstruction MSE — in the int8-quantized domain the
    quantized trainer operates on, with micro-unit codebooks mapped
    back via /PQ_SCALE — is strictly lower than plain encoding (the
    Jegou et al. §V-A property: the code domain concentrates around
    the cell centroid), and recall@5 on the standard probes is never
    worse."""
    import numpy as np
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    train = emb.orderBy("vec_id").limit(2048).localCheckpoint()
    X = {
        r["vec_id"]: np.array(
            S._quantize_py([float(x) for x in r["embedding"]]),
            dtype=np.float64,
        )
        for r in emb.collect()
    }
    mse = {}
    for res in (False, True):
        coarse, books = S.ivfpq_train(train, residual=res)
        codes = S.ivfpq_encode(emb, coarse, books, residual=res).collect()
        cmap = {
            c: np.array(v, dtype=np.float64) / S.PQ_SCALE
            for c, v in zip(*S._collect_codebook(coarse))
        }
        bmaps = [
            {
                c: np.array(v, dtype=np.float64) / S.PQ_SCALE
                for c, v in zip(*S._collect_codebook(b))
            }
            for b in books
        ]
        errs = []
        for r in codes:
            xhat = np.concatenate(
                [bmaps[j][r[f"code_{j}"]] for j in range(4)]
            )
            if res:
                xhat = xhat + cmap[r["cell"]]
            errs.append(float(np.sum((X[r["vec_id"]] - xhat) ** 2)))
        mse[res] = float(np.mean(errs))
    assert mse[True] < mse[False], mse

    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, probes, k=5).collect()
    }
    rec = {}
    for res in (False, True):
        got = {
            (r["probe_id"], r["neighbor_id"])
            for r in S.ivfpq_topk(emb, probes, k=5, residual=res).collect()
        }
        rec[res] = len(exact & got) / len(exact)
    assert rec[True] >= rec[False], rec


def test_ivfpq_auto_geometry_rides_with_artifact(spark, tmp_path):
    """nlist ~ sqrt(n) floored at the fixed default; the build records
    nlist/nprobe/residual in the books meta side file and the reader
    derives ALL of them from there (nprobe left None)."""
    from hangarbay_spark.operators import similarity as S

    assert S.auto_ivfpq_geometry(500) == (16, 4, 2048)
    assert S.auto_ivfpq_geometry(5000) == (64, 16, 2048)
    assert S.auto_ivfpq_geometry(50000) == (256, 64, 8192)
    assert S.auto_ivfpq_geometry(100_000_000) == (4096, 1024, 131072)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes_p, coarse_p, books_p = (
        str(tmp_path / "c"), str(tmp_path / "q"), str(tmp_path / "b")
    )
    S.write_ivfpq_index(emb, codes_p, coarse_p, books_p, dim=64)
    meta = S._ivfpq_index_meta(books_p)
    assert meta["nlist"] == 16 and meta["nprobe"] == 4  # n=500 -> floor
    assert meta["residual"] is False


def test_ivfpq_residual_persisted_matches_inline_via_meta(spark, tmp_path):
    """The persisted residual index reproduces the inline residual
    search row-for-row, with residual-ness derived ONLY from the
    artifact's meta side file (the reader is never told); appends
    encode against the same domain."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    codes_p = str(tmp_path / "codes")
    coarse_p = str(tmp_path / "coarse")
    books_p = str(tmp_path / "books")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    S.write_ivfpq_index(old, codes_p, coarse_p, books_p, dim=64,
                        residual=True)
    assert S._ivfpq_index_residual(books_p) is True
    # append derives residual from the meta — full corpus served after
    n = S.ivfpq_append_to_index(
        spark, new, codes_p, coarse_p, books_p, dim=64
    )
    assert n == new.count()
    assert spark.read.parquet(codes_p).count() == emb.count()
    pers = {
        (r["probe_id"], r["neighbor_id"], r["rk"])
        for r in S.ivfpq_topk_from_index(
            spark, codes_p, coarse_p, books_p, emb, probes, k=5
        ).collect()
    }
    # inline residual twin trained on the same bounded sample: the
    # persisted trainer sampled only `old`, so retrain identically
    train = old.orderBy("vec_id").limit(2048).localCheckpoint()
    coarse, books = S.ivfpq_train(train, dim=64, residual=True)
    codes = S.ivfpq_encode(emb, coarse, books, dim=64, residual=True)
    inline = {
        (r["probe_id"], r["neighbor_id"], r["rk"])
        for r in S.ivfpq_topk_from_codes(
            codes, coarse, books, emb, probes, k=5, dim=64, residual=True
        ).collect()
    }
    assert pers == inline and len(pers) == 15


def test_pq_append_idempotent_and_search(spark, tmp_path):
    """Incremental PQ ingest: appending a new batch against frozen
    codebooks codes exactly the missing vectors, re-ingest is a no-op,
    and the appended index serves searches over the full corpus."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    codes_path = str(tmp_path / "codes")
    books_path = str(tmp_path / "books")
    S.write_pq_index(old, codes_path, books_path, dim=64)
    n = S.pq_append_to_index(spark, new, codes_path, books_path, dim=64)
    assert n == new.count()
    assert (
        S.pq_append_to_index(spark, new, codes_path, books_path, dim=64) == 0
    )
    assert spark.read.parquet(codes_path).count() == emb.count()
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = S.pq_topk_from_index(
        spark, codes_path, books_path, emb, probes, k=5
    )
    assert got.count() == 15


def test_pq_incremental_encode_zero_exchange_no_corpus_scan(spark):
    """The timed incremental-encode plan reads the batch (pushed-down
    vec_id filter) + tiny books only: ZERO exchanges, no codes-parquet
    scan — ingest cost provably scales with the batch alone."""
    from hangarbay_spark.queries import REGISTRY

    df = REGISTRY["sim_pq_incremental"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
    assert "codes" not in plan
    assert plan.count("Scan parquet") <= 1  # the batch scan only


def test_pagerank_symmetric_path_matches_general(spark):
    """symmetric=True must be a pure plan optimization: on a
    symmetrized graph the skipped re-attach join is a no-op, so ranks
    are row-identical to the general path."""
    from hangarbay_spark.operators.graph import pagerank

    edges = [(a, b) for a in range(1, 7) for b in range(1, 7)
             if a != b and (a + b) % 3 != 0]
    sym = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    df = spark.createDataFrame(sym, ["src", "dst"])
    general = {
        (r["node"]): r["rank"] for r in pagerank(df, iters=6).collect()
    }
    fast = {
        (r["node"]): r["rank"]
        for r in pagerank(df, iters=6, symmetric=True).collect()
    }
    assert general == fast


def test_small_graph_loop_kernels_match_loops(spark, monkeypatch):
    """The single-task small-graph replays (graph.LOOP_KERNEL_MAX_EDGES
    fast paths: PPR teleport iterations, synchronous LPA rounds, the
    path-load BFS sweeps — r10) must produce query results identical
    to the distributed loops."""
    from hangarbay_spark.operators import graph as G
    from hangarbay_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    for qname in (
        "graph_personalized_pagerank",
        "graph_label_propagation",
        "graph_path_load_centrality",
        "graph_bfs_hops",
        "graph_weighted_sssp",
        "graph_kcore_membership",
        "graph_ktruss_edges",
        "graph_hits_authorities",
    ):
        fast = [tuple(r) for r in REGISTRY[qname].fn(spark, sf).collect()]
        monkeypatch.setattr(G, "LOOP_KERNEL_MAX_EDGES", -1)
        monkeypatch.setattr(G, "HITS_KERNEL_MAX_EDGES", -1)
        loop = [tuple(r) for r in REGISTRY[qname].fn(spark, sf).collect()]
        monkeypatch.undo()
        assert fast == loop and len(fast) > 0, qname


def test_hits_kernel_object_fallback_exact(spark):
    """The HITS replay kernel's int64 overflow guard must hand off to
    exact Python-int accumulation mid-replay: on K_{16,16} the scores
    are a_k = 16^(2k-1), which crosses 2^63 at k=9 while staying far
    inside decimal(38,0) — iters=12 therefore exercises both the fast
    path and the object fallback, and every authority must equal the
    closed form exactly."""
    from hangarbay_spark.operators.graph import hits_authority_kernel

    rows = [(c, p) for c in range(16) for p in range(16)]
    e = spark.createDataFrame(
        rows, "c bigint, p bigint"
    ).localCheckpoint()
    out = {
        int(r["p"]): int(r["a"])
        for r in hits_authority_kernel(e, 12).collect()
    }
    assert out == {p: 16**23 for p in range(16)}


def test_pq_train_kernel_matches_loop(spark, monkeypatch):
    """The single-task Lloyd-training fast path
    (PQ_TRAIN_KERNEL_MAX_ROWS, r10) must produce codebooks
    bit-identical to the distributed per-iteration loops for all
    three trainers (pq / joint ivfpq / residual ivfpq) — it reuses
    _pq_codes_kernel and _lits_from_sums, so assignment and update
    math are shared by construction; this pins the init and sum
    plumbing around them."""
    import random

    from hangarbay_spark.operators import similarity as S

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(150)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).localCheckpoint()

    def sig(books):
        return [
            sorted(
                (r["cid"], tuple(r["cvec"])) for r in b.collect()
            )
            for b in books
        ]

    def run_all():
        out = {"pq": sig(S.pq_train(emb, dim=16, m=4, ksub=8, iters=2))}
        c, b = S.ivfpq_train(emb, dim=16, m=4, ksub=8, nlist=6, iters=2)
        out["joint"] = sig([c] + b)
        c, b = S.ivfpq_train(
            emb, dim=16, m=4, ksub=8, nlist=6, iters=2, residual=True
        )
        out["residual"] = sig([c] + b)
        return out

    fast = run_all()
    monkeypatch.setattr(S, "PQ_TRAIN_KERNEL_MAX_ROWS", -1)
    loop = run_all()
    monkeypatch.undo()
    assert fast == loop
    assert all(len(v) > 0 for v in fast.values())


def test_pagerank_kernel_matches_loop(spark, monkeypatch):
    """The small-graph single-task kernel (PAGERANK_KERNEL_MAX_EDGES
    fast path, r10) must reproduce the distributed loop's rank vector
    BIT-IDENTICALLY — same IEEE divide, same shortest-repr HALF_UP
    decimal(30,15) accumulation, same 12 dp iteration round — on both
    the symmetric and the general (re-attach) paths."""
    import random

    from hangarbay_spark.operators import graph as G

    rng = random.Random(11)
    raw = {
        (rng.randint(0, 120), rng.randint(0, 120)) for _ in range(1500)
    }
    edges = [(a, b) for a, b in raw if a != b]
    sym = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    df = spark.createDataFrame(sym, ["src", "dst"]).localCheckpoint()
    for symm in (True, False):
        new = sorted(
            (r["node"], r["rank"])
            for r in G.pagerank(df, iters=7, symmetric=symm).collect()
        )
        monkeypatch.setattr(G, "PAGERANK_KERNEL_MAX_EDGES", -1)
        old = sorted(
            (r["node"], r["rank"])
            for r in G.pagerank(df, iters=7, symmetric=symm).collect()
        )
        monkeypatch.undo()
        assert new == old and len(new) > 100


def test_triangle_query_matches_bruteforce_on_clique_plus_path(spark):
    """K4 + pendant path: per-node triangle counts are known exactly —
    every K4 node sits on C(3,2)=3 triangles, path nodes on none."""
    import itertools

    from pyspark.sql import functions as F

    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    path = [(4, 5), (5, 6)]
    e = spark.createDataFrame(k4 + path, ["src", "dst"])
    two_hop = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("x"),
            F.col("a.dst").alias("y"),
            F.col("b.dst").alias("z"),
        )
    )
    tri = two_hop.join(
        e.alias("c"),
        (F.col("c.src") == F.col("x")) & (F.col("c.dst") == F.col("z")),
        "left_semi",
    )
    pernode = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    counts = {
        r["node"]: r["n"]
        for r in pernode.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {1: 3, 2: 3, 3: 3, 4: 3}


def test_bloom_words_have_no_false_negatives(spark):
    """Every inserted key must pass the bitwise membership check —
    Bloom filters may false-positive, never false-negative."""
    from pyspark.sql import functions as F

    m, k, nwords = 65536, 3, 1024
    keys = spark.range(1, 501).select(F.col("id").alias("c_custkey"))
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("c_custkey", F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("bits")
    )
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(
                F.element_at("wm", i), F.lit(0).cast("bigint")
            ),
        ).alias("words")
    )
    checks = " AND ".join(
        f"(element_at(words, cast(pmod(xxhash64(c_custkey, {i}), {m}) "
        f"div 64 as int) + 1) & shiftleft(1L, cast(pmod(xxhash64("
        f"c_custkey, {i}), {m}) % 64 as int))) != 0"
        for i in range(k)
    )
    survivors = (
        keys.crossJoin(F.broadcast(dense)).filter(F.expr(checks)).count()
    )
    assert survivors == 500


def test_temperature_mixture_upweights_small_sources(spark):
    """T=2 mixing must give smaller sources a strictly higher keep
    rate, every rate in (0, 1], and kept counts <= totals."""
    from tests.conftest import SF_DIR_ORACLE

    from hangarbay_spark.queries import REGISTRY

    rows = REGISTRY["sample_temperature_mixture"].fn(
        spark, SF_DIR_ORACLE
    ).collect()
    assert rows
    by_size = sorted(rows, key=lambda r: r["n_docs"])
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        assert 0 <= r["n_kept"] <= r["n_docs"]
    rates = [r["keep_rate"] for r in by_size]
    # monotone non-increasing in source size (sqrt-share weighting)
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))


def test_as_of_join_forward_direction(spark):
    """Forward as-of picks the EARLIEST right row at-or-after each
    left ts; equal timestamps match (inclusive), later lefts with no
    following right get null."""
    from hangarbay_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 25, "b"), (1, 30, "c")], ["k", "ts", "v"]
    )
    out = {
        r["ts"]: r["asof_v"]
        for r in as_of_join(
            left, right, on="k", right_cols=["v"], direction="forward"
        ).collect()
    }
    assert out == {10: "b", 25: "b", 40: None}


def test_pq_persisted_matches_inline(spark):
    """The persisted PQ index must reproduce the inline trainer's
    results row-for-row (same bounded deterministic training sample,
    same encode, same ADC + re-rank)."""
    from hangarbay_spark.queries import REGISTRY
    from tests.conftest import SF_DIR_ORACLE

    inline = sorted(
        tuple(r)
        for r in REGISTRY["sim_pq_topk"].fn(spark, SF_DIR_ORACLE).collect()
    )
    persisted = sorted(
        tuple(r)
        for r in REGISTRY["sim_pq_persisted_topk"]
        .fn(spark, SF_DIR_ORACLE)
        .collect()
    )
    assert inline and inline == persisted


def test_wordpiece_kernel_matches_reference(spark):
    """Distributed wordpiece counts == the pure-Python reference on
    every doc, and greedy segmentation is verified on hand cases."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.text import (
        wordpiece_encode_kernel,
        wordpiece_pieces,
    )

    vocab = frozenset(["the", "cat", "ca", "t", "s", "a"])
    # greedy: "cats" -> "cat" + "s" (longest-first), "tact" -> t,a,ca?
    # tact: i=0 longest match "t"; then "a"; then "ct" -> "ca"? no:
    # remaining "ct": longest prefix in vocab is none for "ct", so
    # j shrinks to "c" -> not in vocab -> UNK, advance; then "t".
    assert wordpiece_pieces("cats", vocab) == (2, 0)
    assert wordpiece_pieces("the cats", vocab) == (3, 0)
    assert wordpiece_pieces("tact", vocab) == (4, 1)
    assert wordpiece_pieces(None, vocab) == (None, None)

    rows = [(i, txt) for i, txt in enumerate(
        ["the cat", "cats cats", "tact", "", "zzz the"]
    )]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pieces", T.LongType()),
        T.StructField("n_unk", T.LongType()),
    ])
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_unk"])
        for r in df.mapInPandas(wordpiece_encode_kernel(list(vocab)), schema).collect()
    }
    for i, txt in rows:
        assert got[i] == wordpiece_pieces(txt, vocab)


def test_bpe_encode_kernel_matches_reference(spark):
    """BPE APPLY (VERDICT r6 task #4): hand-derived greedy merge-rank
    segmentation, an INDEPENDENT naive reference apply, conservation
    (pieces + applied == word chars), the zero-merge identity, and
    kernel == shared pure function on real corpus docs."""
    from pyspark.sql import types as T

    from hangarbay_spark.operators.text import (
        bpe_encode_kernel,
        bpe_pieces,
        bpe_ranks,
        bpe_train_merges,
    )

    # merges in rank order: (l,o)->lo, (lo,w)->low, (e,r)->er
    merges = [("l", "o", "lo", 9), ("lo", "w", "low", 7), ("e", "r", "er", 5)]
    ranks = bpe_ranks(merges)
    # "lower": l,o,w,e,r -> lo,w,e,r (rank0) -> low,e,r (rank1)
    #          -> low,er (rank2): 2 pieces, 3 merges fired
    assert bpe_pieces("lower", ranks) == (2, 3)
    # "lol": l,o,l -> lo,l (one rank-0 fire), no other pair learned
    assert bpe_pieces("lol", ranks) == (2, 1)
    # "wool": no (w,o)/(o,o) learned; (o,l)? not learned -> 4 chars
    assert bpe_pieces("wool", ranks) == (4, 0)
    assert bpe_pieces("lower low", ranks) == (2 + 1, 3 + 2)
    assert bpe_pieces(None, ranks) == (None, None)
    # zero merges -> pure character segmentation
    assert bpe_pieces("lower", bpe_ranks([])) == (5, 0)

    def naive_apply(text, ms):
        """Independent reference: repeatedly scan the merge table in
        rank order and rewrite the first applicable pair only."""
        pieces = applied = 0
        for w in text.lower().split():
            s = list(w)
            while True:
                hit = None
                for rk, (a, b, m, _n) in enumerate(ms):
                    for i in range(len(s) - 1):
                        if s[i] == a and s[i + 1] == b:
                            if hit is None or rk < hit[0]:
                                hit = (rk, i, m)
                            break
                    if hit is not None and hit[0] == rk:
                        break
                if hit is None:
                    break
                _, i, m = hit
                s[i:i + 2] = [m]
                applied += 1
            pieces += len(s)
        return pieces, applied

    # one-pair-at-a-time naive apply and the all-occurrences fold give
    # the same final segmentation for these merge tables (the fold is
    # just batched application of the same lowest-rank rule)
    for txt in ["lower lowest owl", "lol lolol wool", "er lo low lower"]:
        assert bpe_pieces(txt, ranks) == naive_apply(txt, merges)

    # conservation: pieces + applied == total chars over words
    for txt in ["lower lowest owl", "lol wool", "a", ""]:
        p, a = bpe_pieces(txt, ranks)
        assert p + a == sum(len(w) for w in txt.split())

    # kernel == shared pure function on real corpus merges + docs
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    real = bpe_train_merges(docs, "text", n_merges=4)
    assert len(real) == 4
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pieces", T.LongType()),
        T.StructField("n_applied", T.LongType()),
    ])
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_applied"])
        for r in docs.select("doc_id", "text")
        .mapInPandas(bpe_encode_kernel(real), schema)
        .collect()
    }
    rranks = bpe_ranks(real)
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == bpe_pieces(row["text"], rranks)


def test_bpe_train_matches_reference(spark):
    """The distributed BPE training loop must learn the identical
    merge table (same pairs, same order, same weighted counts) as the
    pure-Python reference on the same word counts."""
    from hangarbay_spark.operators.text import (
        bpe_train_merges,
        bpe_train_reference,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low newer",
        "low low lower new new newest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    got = bpe_train_merges(docs, "text", n_merges=6)
    want = bpe_train_reference(words, n_merges=6)
    assert got == want and len(got) == 6


def test_unigram_viterbi_hand_cases():
    """Min-composite Viterbi on hand-computable cost tables: the DP
    picks the cheapest segmentation, composite encodes (cost, pieces,
    unk) lexicographically, UNK fallback covers any char, conservation
    (piece chars reconstruct the truncated word)."""
    from hangarbay_spark.operators.text import (
        _UG_SCALE,
        UNIGRAM_MAXW,
        unigram_viterbi,
    )

    costs = {"ab": 1000, "a": 2000, "b": 2000, "abc": 4000, "c": 1500}
    # "abc": [ab, c] = 2500 beats [abc] = 4000 and [a, b, c] = 5500
    pieces, comp = unigram_viterbi("abc", costs)
    assert pieces == ["ab", "c"]
    assert comp == 2500 * _UG_SCALE + 200
    # UNK fallback: x uncovered -> one UNK char at the penalty cost
    pieces, comp = unigram_viterbi("abx", costs)
    assert pieces == ["ab", "x"]
    assert comp == (1000 + 20000) * _UG_SCALE + 201
    # equal cost, fewer pieces wins: [aa] over [a, a]
    pieces, comp = unigram_viterbi("aa", {"aa": 2000, "a": 1000})
    assert pieces == ["aa"] and comp == 2000 * _UG_SCALE + 100
    # truncation at MAXW chars, conservation of the truncated word
    w = "abcabcabcabcabcabcabc"  # 21 chars
    pieces, comp = unigram_viterbi(w, costs)
    assert "".join(pieces) == w[:UNIGRAM_MAXW]
    # empty word: zero pieces, zero composite
    assert unigram_viterbi("", costs) == ([], 0)


def test_unigram_encode_kernel_matches_reference(spark):
    """Kernel doc totals == per-word Viterbi composites re-summed in
    pure Python (ASCII \\s+ tokenization both sides); null text ->
    null counts; composite decomposition cross-checked."""
    import re

    from hangarbay_spark.operators.text import (
        _UG_SCALE,
        unigram_encode_kernel,
        unigram_viterbi,
    )

    costs = {"lo": 900, "low": 700, "er": 800, "e": 1500, "r": 1500,
             "l": 1600, "o": 1600, "w": 1600}
    rows = [(0, "lower low"), (1, "  "), (2, None), (3, "zzz lower")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_unk"], r["cost_milli"])
        for r in df.mapInPandas(
            unigram_encode_kernel(costs),
            "doc_id long, n_pieces long, n_unk long, cost_milli long",
        ).collect()
    }
    for i, t in rows:
        if t is None:
            assert got[i] == (None, None, None)
            continue
        p = u = c = 0
        for wd in (x for x in re.split(r"\s+", t.lower(), flags=re.ASCII) if x):
            comp = unigram_viterbi(wd, costs)[1]
            c += comp // _UG_SCALE
            p += (comp % _UG_SCALE) // 100
            u += comp % 100
        assert got[i] == (p, u, c)


def test_unigram_train_matches_reference(spark):
    """The distributed hard-EM training loop must learn the identical
    vocabulary (same pieces, same integer costs, same won weights) as
    the sequential pure-Python reference on the same word counts —
    pins the seed explode, the E-step kernel batching, and the prune
    schedule."""
    from hangarbay_spark.operators.text import (
        UNIGRAM_MAXW,
        unigram_train,
        unigram_train_reference,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low newer",
        "low low lower new new newest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            w = w[:UNIGRAM_MAXW]
            words[w] = words.get(w, 0) + 1
    got = unigram_train(docs, "text", seed_n=40, rounds=2, final_n=10)
    want = unigram_train_reference(words, seed_n=40, rounds=2, final_n=10)
    assert got == want and len(got) > 0


def test_unigram_trained_encode_improves_on_seed(spark):
    """On the real corpus: the EM-trained vocabulary's total Viterbi
    cost (the objective hard-EM descends) must be <= the seed
    vocabulary's, with no UNKs (training keeps full coverage here
    because the corpus words all fit in MAXP after EM collapses to
    whole words) — the usefulness pin for the train->apply loop."""
    from pyspark.sql import functions as F

    from hangarbay_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    seed = (
        REGISTRY["text_unigram_seed_encode"].fn(spark, sf)
        .agg(
            F.sum("cost_milli").alias("c"), F.sum("n_pieces").alias("p")
        )
        .first()
    )
    trained = (
        REGISTRY["text_unigram_encode"].fn(spark, sf)
        .agg(
            F.sum("cost_milli").alias("c"),
            F.sum("n_pieces").alias("p"),
            F.sum("n_unk").alias("u"),
        )
        .first()
    )
    assert trained["c"] <= seed["c"]
    assert trained["p"] <= seed["p"]
    assert trained["u"] == 0


def test_fts_incremental_append_equals_rebuild(spark, tmp_path):
    """Appending a new batch's postings to a persisted index must give
    the same query results as a full rebuild, and re-ingesting the
    same batch must be a no-op (idempotent at-least-once)."""
    from hangarbay_spark.operators import fts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "fts_inc")
    fts.save_index(
        fts.build_inverted_index(old, "doc_id", "text"), path, buckets=4
    )
    n = fts.append_to_index(new, path, "doc_id", "text", buckets=4)
    assert n == new.count()
    # idempotent re-ingest
    assert fts.append_to_index(new, path, "doc_id", "text", buckets=4) == 0

    full = fts.build_inverted_index(docs, "doc_id", "text")
    inc = fts.load_index(spark, path)
    for q in ("the data", "model training"):
        want = sorted(
            r["doc_id"] for r in fts.match_all(full, q, "doc_id").collect()
        )
        got = sorted(
            r["doc_id"] for r in fts.match_all(inc, q, "doc_id").collect()
        )
        assert got == want
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_as_of_join_nearest_direction(spark):
    """Nearest as-of picks the closer match in either direction, ties
    resolve backward, and one-sided cases fall back to the only
    match."""
    from hangarbay_spark.operators.temporal import as_of_join_nearest

    left = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 21), (1, 3, 28), (1, 4, 100)],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 20, "a"), (1, 30, "b")], ["k", "ts", "v"]
    )
    out = {
        r["lid"]: r["asof_v"]
        for r in as_of_join_nearest(
            left, right, on="k", right_cols=["v"]
        ).collect()
    }
    # lid 1: only forward (a). lid 2: back a (d=1) vs fwd b (d=9) -> a.
    # lid 3: back a (d=8) vs fwd b (d=2) -> b. lid 4: only backward b.
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}

    tie = spark.createDataFrame([(1, 9, 25)], ["k", "lid", "ts"])
    got = as_of_join_nearest(tie, right, on="k", right_cols=["v"]).collect()
    assert got[0]["asof_v"] == "a"  # equidistant -> backward


def test_as_of_join_nearest_keeps_null_left_rows(spark):
    """A left row with NULL in a payload column must survive the
    direction-combining join (null-safe keys) — the left-join contract
    the directional variants honor."""
    from hangarbay_spark.operators.temporal import as_of_join_nearest

    left = spark.createDataFrame(
        [(1, None, 21), (1, 7, 28)],
        "k int, payload int, ts int",
    )
    right = spark.createDataFrame(
        [(1, 20, "a"), (1, 30, "b")], ["k", "ts", "v"]
    )
    out = {
        r["payload"]: r["asof_v"]
        for r in as_of_join_nearest(
            left, right, on="k", right_cols=["v"]
        ).collect()
    }
    assert out == {None: "a", 7: "b"}


def test_fts_append_tokenless_docs_and_missing_path(spark, tmp_path):
    """A document that tokenizes to zero tokens is still recorded as
    ingested (id manifest) so re-ingest is a no-op; guard_existing
    against a not-yet-created index treats it as empty instead of
    throwing."""
    from hangarbay_spark.operators import fts

    path = str(tmp_path / "fts_fresh")
    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "...")], ["doc_id", "text"]
    )
    # missing path + guard_existing=True: no throw, everything is new
    assert fts.append_to_index(batch, path, "doc_id", "text", buckets=2) == 2
    # the tokenless doc (id 2) must not be re-counted as new
    assert fts.append_to_index(batch, path, "doc_id", "text", buckets=2) == 0
    got = sorted(
        r["doc_id"]
        for r in fts.match_all(
            fts.load_index(spark, path), "alpha", "doc_id"
        ).collect()
    )
    assert got == [1]


def test_bloom_false_positive_rate_bounded(spark):
    """Non-member keys pass the 65536-bit/k=3 filter at well under the
    designed ~0.8% rate (500 inserted keys here, far below the 3k
    design load, so observed fpp should be tiny)."""
    from pyspark.sql import functions as F

    m, k, nwords = 65536, 3, 1024
    keys = spark.range(1, 501).select(F.col("id").alias("c_custkey"))
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("c_custkey", F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("bits")
    )
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(
                F.element_at("wm", i), F.lit(0).cast("bigint")
            ),
        ).alias("words")
    )
    checks = " AND ".join(
        f"(element_at(words, cast(pmod(xxhash64(c_custkey, {i}), {m}) "
        f"div 64 as int) + 1) & shiftleft(1L, cast(pmod(xxhash64("
        f"c_custkey, {i}), {m}) % 64 as int))) != 0"
        for i in range(k)
    )
    non_members = spark.range(100_000, 110_000).select(
        F.col("id").alias("c_custkey")
    )
    fp = (
        non_members.crossJoin(F.broadcast(dense))
        .filter(F.expr(checks))
        .count()
    )
    assert fp / 10_000 < 0.01


def test_pq_kernel_assignment_matches_numpy_bruteforce(spark):
    """First-principles guard on the Arrow assignment kernel: every
    emitted code (and IVF cell) is the true L2-argmin centroid for its
    int8-quantized subvector against the micro-unit codebooks (ties ->
    smallest cid), checked against a plain exact-fraction distance
    computation over the sf0.001 embeddings; ``norm`` is sqrt of the
    exact integer |qv|^2."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    train = emb.orderBy("vec_id").limit(256).localCheckpoint()
    coarse, books = S.ivfpq_train(train, dim=64, m=4, ksub=16, nlist=16)
    codes = {
        r["vec_id"]: r
        for r in S.ivfpq_encode(emb.limit(200), coarse, books, dim=64)
        .collect()
    }
    vecs = {
        r["vec_id"]: S._quantize_py([float(x) for x in r["embedding"]])
        for r in emb.limit(200).collect()
    }
    book_lits = [S._collect_codebook(b) for b in books]
    cell_lits = S._collect_codebook(coarse)

    def argmin_cid(qv, cids, cvecs, scale):
        # exact integer min-L2: argmax 2*scale*dot - |C|^2, first max
        # -> smallest cid (cids ascend)
        best = None
        for cid, cv in zip(cids, cvecs):
            d = sum(int(a) * int(b) for a, b in zip(qv, cv))
            nn = sum(int(c) * int(c) for c in cv)
            sc = 2 * scale * d - nn
            if best is None or sc > best[0]:
                best = (sc, cid)
        return best[1]

    for vid, qv in vecs.items():
        r = codes[vid]
        assert r["cell"] == argmin_cid(qv, *cell_lits, S.PQ_SCALE)
        for j, (cids, cvecs) in enumerate(book_lits):
            want = argmin_cid(
                qv[j * 16 : (j + 1) * 16], cids, cvecs, S.PQ_SCALE
            )
            assert r[f"code_{j}"] == want, (vid, j)
        qq = sum(c * c for c in qv)
        assert r["norm"] == math.sqrt(qq), vid


def test_ivfpq_append_idempotent_and_pruned_search(spark, tmp_path):
    """IVFADC incremental ingest: appended rows land inside their
    cells' partition dirs (pruning keeps working), re-ingest is a
    no-op, and the served search covers the full corpus."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    codes_p = str(tmp_path / "codes")
    coarse_p = str(tmp_path / "coarse")
    books_p = str(tmp_path / "books")
    S.write_ivfpq_index(old, codes_p, coarse_p, books_p, dim=64)
    n = S.ivfpq_append_to_index(
        spark, new, codes_p, coarse_p, books_p, dim=64
    )
    assert n == new.count()
    assert (
        S.ivfpq_append_to_index(spark, new, codes_p, coarse_p, books_p, dim=64)
        == 0
    )
    assert spark.read.parquet(codes_p).count() == emb.count()
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = S.ivfpq_topk_from_index(
        spark, codes_p, coarse_p, books_p, emb, probes, k=5
    )
    df = got
    assert df.count() == 15
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell#" in plan


class TestHeavyHitters:
    """operators/sketches.py — bounded-state frequent items."""

    def test_exact_vs_plain_groupby(self, spark):
        """The MG-candidates + verify composition equals the full
        GROUP BY on a skewed stream, across a partitioning where no
        single partition sees the whole distribution."""
        from pyspark.sql import functions as F

        from hangarbay_spark.operators.sketches import heavy_hitters_exact

        # Zipf-ish: item i appears ~1000/i times, plus uniform noise
        rows = [(f"w{i}",) for i in range(1, 40) for _ in range(1000 // i)]
        rows += [(f"noise{j}",) for j in range(2000)]
        df = spark.createDataFrame(rows, "tok string").repartition(16)
        got = heavy_hitters_exact(df, "tok", inv_phi=50, alias="tok")
        n = df.count()
        want = (
            df.groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .filter(F.col("cnt") * 50 > n)
        )
        got_rows = {(r.tok, r.cnt) for r in got.collect()}
        want_rows = {(r.tok, r.cnt) for r in want.collect()}
        assert got_rows == want_rows and len(got_rows) > 0
        assert all(r.n == n for r in got.collect())

    def test_candidates_bounded_and_superset(self, spark):
        from pyspark.sql import functions as F

        from hangarbay_spark.operators.sketches import (
            misra_gries_candidates,
        )

        rows = [("hot",)] * 5000 + [(f"u{j}",) for j in range(5000)]
        df = spark.createDataFrame(rows, "tok string").repartition(8)
        k = 20
        cand = misra_gries_candidates(df, "tok", k=k)
        items = [r.tok for r in cand.collect()]
        # bounded output: <= k rows per partition
        assert len(items) <= k * 8
        # the 50%-frequency item can never be evicted everywhere
        assert "hot" in set(items)

    def test_mg_merge_capacity_and_bound(self):
        """mg_merge restores capacity k; each surviving counter drops
        by exactly the (k+1)-th largest; <=k inputs pass through."""
        from hangarbay_spark.operators.sketches import mg_merge

        counts = {"a": 100, "b": 60, "c": 50, "d": 40, "e": 10}
        merged, d = mg_merge(counts, k=2)
        assert d == 50  # 3rd largest
        assert merged == {"a": 50, "b": 10}
        small = {"x": 5, "y": 3}
        merged2, d2 = mg_merge(small, k=2)
        assert merged2 == small and d2 == 0


class TestComponentsIncremental:
    def test_components_incremental_equals_full_rebuild(self, spark):
        """Contracted incremental maintenance == full re-cluster,
        including a new doc BRIDGING two old clusters and a pair
        touching a previously unclustered old id."""
        from pyspark.sql import functions as F

        from hangarbay_spark.operators.dedup import (
            components_incremental,
            connected_components,
        )

        old_pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21)],
            "id_a long, id_b long",
        )
        old_assign = connected_components(old_pairs)
        # new id 100 bridges clusters {1,2,3} and {10,11};
        # new id 200 pairs with unclustered old id 50;
        # new-new pair 300-301
        new_pairs = spark.createDataFrame(
            [(100, 3), (100, 11), (200, 50), (300, 301)],
            "id_a long, id_b long",
        )
        got = {
            (r.id, r.cluster)
            for r in components_incremental(old_assign, new_pairs).collect()
        }
        full = {
            (r.id, r.cluster)
            for r in connected_components(
                old_pairs.unionByName(new_pairs)
            ).collect()
        }
        assert got == full
        # the bridge merged both old clusters under the global min
        assert (11, 1) in got and (100, 1) in got and (21, 20) in got

    def test_components_incremental_corpus_equivalence(self, spark):
        """On the real documents table: cluster the 90% 'corpus', feed
        the 10% batch's incremental pairs, compare against clustering
        the full pair set."""
        from pyspark.sql import functions as F

        from hangarbay_spark.operators import dedup as D

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        old = docs.filter(F.col("doc_id") % 10 != 0)
        all_pairs = D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).select("id_a", "id_b")
        old_pairs = D.minhash_lsh_dedup_pairs(
            old, "doc_id", "text", threshold=0.8
        ).select("id_a", "id_b")
        new_pairs = (
            all_pairs.withColumn(
                "k",
                F.least("id_a", "id_b") * 1000000 + F.greatest("id_a", "id_b"),
            )
            .join(
                old_pairs.withColumn(
                    "k",
                    F.least("id_a", "id_b") * 1000000
                    + F.greatest("id_a", "id_b"),
                ).select("k"),
                "k",
                "anti",
            )
            .select("id_a", "id_b")
        )
        got = {
            (r.id, r.cluster)
            for r in D.components_incremental(
                D.connected_components(old_pairs), new_pairs
            ).collect()
        }
        want = {
            (r.id, r.cluster)
            for r in D.connected_components(all_pairs).collect()
        }
        assert got == want and len(want) > 0


def test_kcore_toy_graph(spark):
    """3-core of the hand-built graph: K4 {1,2,3,4} plus a pendant
    path 4-5-6. Peeling removes 6 (deg 1), then 5 — the 3-core is
    exactly the K4 with every within-core degree 3. Also pins the
    empty-core case (k above the max degree)."""
    from hangarbay_spark.operators.graph import kcore

    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    und = spark.createDataFrame(
        e + [(b, a) for a, b in e], ["src", "dst"]
    )
    got = {
        r["node"]: r["core_deg"] for r in kcore(und, k=3).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert kcore(und, k=5).count() == 0


def test_kcore_invariants_random(spark):
    """Seeded random graph: the 3-core output (a) is internally
    consistent — every node's reported core_deg >= 3 and equals its
    degree within the surviving node set; (b) is a fixed point —
    peeling the induced subgraph again changes nothing."""
    import random

    from hangarbay_spark.operators.graph import kcore

    rnd = random.Random(7)
    nodes = list(range(24))
    edges = set()
    while len(edges) < 70:
        a, b = rnd.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    und = spark.createDataFrame(sym, ["src", "dst"])
    res = {r["node"]: r["core_deg"] for r in kcore(und, k=3).collect()}
    core = set(res)
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    for n, d in res.items():
        within = len(adj[n] & core)
        assert within == d and d >= 3, (n, d, within)
    # fixpoint: the induced subgraph IS its own 3-core
    induced = [(a, b) for a, b in sym if a in core and b in core]
    if induced:
        again = {
            r["node"]: r["core_deg"]
            for r in kcore(
                spark.createDataFrame(induced, ["src", "dst"]), k=3
            ).collect()
        }
        assert again == res


def test_fts_proximity_no_corpus_scan_and_pushdown(spark):
    """Proximity ranking resolves from the positional index only: no
    documents scan, both term filters pushed to the postings scan, and
    the top-k is a TakeOrderedAndProject (no global sort)."""
    from hangarbay_spark.queries.search import fts_proximity_topk

    df = fts_proximity_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan
    assert "fts_pos.parquet" in plan
    assert "EqualTo(token," in plan
    assert "TakeOrderedAndProject" in plan


def test_ams_f2_accuracy_envelope(spark):
    """Mean-of-9 tug-of-war estimates stay within a generous d=9
    envelope of the exact self-join size across corpus sizes
    (measured ratios 0.76-1.44; rel. std sqrt(2/9) ~ 0.47)."""
    from hangarbay_spark.queries import REGISTRY

    for sf in ("0.001", "0.01", "0.1"):
        r = (
            REGISTRY["agg_ams_selfjoin_size"]
            .fn(spark, f"/root/testdata/sf{sf}")
            .collect()[0]
        )
        ratio = r["est_f2"] / r["exact_f2"]
        assert 0.2 < ratio < 3.0, (sf, ratio)


def test_embedding_drift_monitor_behaves(spark):
    """Same-distribution arms (parity split of one corpus) read near
    zero; a genuinely shifted candidate (every vector's first
    dimension negated, flipping sign-bucket bit 0) reads strictly
    higher — the monitor orders distributions correctly."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.queries import REGISTRY

    base = (
        REGISTRY["sim_embedding_drift"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    assert base["n_shared"] > 0
    assert 0.0 <= base["jsd"] < 0.2

    # drifted candidate: abs() of the odd arm's first 6 dims collapses
    # it onto the all-ones bucket — point mass vs near-uniform, a gross
    # shift far above the parity split's sampling noise (a mere sign
    # flip of one dim only MIRRORS a near-uniform histogram, which
    # barely moves JSD — that is the correct behavior, not a bug)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    shifted = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 2 == 1,
            F.concat(
                F.transform(
                    F.slice("embedding", 1, 6), lambda x: F.abs(x)
                ),
                F.slice("embedding", 7, 58),
            ),
        ).otherwise(F.col("embedding")),
    )
    h = shifted.select(
        (F.col("vec_id") % 2).alias("arm"),
        S.sign_bucket_expr("embedding", 6).alias("b"),
    )
    counts = {
        (r["arm"], r["b"]): r["n"]
        for r in h.groupBy("arm", "b").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    import math

    tot = {a: sum(v for (aa, _), v in counts.items() if aa == a) for a in (0, 1)}
    buckets = {b for (_, b) in counts}
    jsd = 0.0
    for b in buckets:
        p = counts.get((0, b), 0) / tot[0]
        q = counts.get((1, b), 0) / tot[1]
        m = (p + q) / 2
        if p:
            jsd += 0.5 * p * math.log(p / m)
        if q:
            jsd += 0.5 * q * math.log(q / m)
    assert jsd > base["jsd"]


def test_multimodal_near_dup_planted_recall(spark):
    """The perceptual-hash search must recover EVERY planted family
    pair: members of a doc_id-DIV-4 family share a base image and
    differ by at most one perturbed pixel each, so all within-family
    pairs sit at Hamming <= 2 — inside the d<=3 pigeonhole guarantee.
    Also pins the kernel against a pure-Python struct-level dHash
    (the JPEG struct.pack discipline)."""
    import hashlib as _h

    import numpy as _np

    from hangarbay_spark.queries.base import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["multimodal_near_dup"].fn(spark, sf).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in rows}
    n = spark.read.parquet(f"{sf}/documents.parquet").count()

    def fp(doc_id: int) -> list[int]:
        fam, m = doc_id // 4, doc_id % 4
        gray = _np.zeros((8, 9), dtype=_np.int64)
        for r in range(8):
            hx = _h.md5(f"{fam}-{r}".encode()).hexdigest()
            gray[r] = [int(hx[2 * c : 2 * c + 2], 16) for c in range(9)]
        if m > 0:
            gray[m, 0] = 0xFF
        bits = (gray[:, :-1] < gray[:, 1:]).astype(int).flatten()
        return [
            int(sum(b << i for i, b in enumerate(bits[j * 16 : j * 16 + 16])))
            for j in range(4)
        ]

    for fam_start in range(0, n, 4):
        members = list(range(fam_start, min(fam_start + 4, n)))
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                ham = sum(
                    bin(x ^ y).count("1") for x, y in zip(fp(a), fp(b))
                )
                assert ham <= 2
                assert got.get((a, b)) == ham, (a, b, ham, got.get((a, b)))
