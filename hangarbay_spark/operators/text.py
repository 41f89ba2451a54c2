"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language-ID heuristic, quality scoring, fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs —
so they stream through a 100 TB `documents` scan with zero shuffle.
Formulas use only functions with identical semantics in DuckDB so each
operator is oracle-checkable (see queries/llmops.py).
"""

from __future__ import annotations

import pandas  # module-level: pandas_udf type hints resolve in globals

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seeds for the n-gram/stopword language-ID
# heuristic. Deliberately small: the point is the distributed plumbing
# and deterministic scoring, not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des", "est"],
}
# Fixed evaluation order for deterministic argmax tie-breaking.
LANG_ORDER = ("en", "es", "de", "fr")

# CJK Unified Ideographs — script detection precedes the stopword vote
# (stopword lists are useless for unsegmented scripts). Literal char
# range, identical bytes in the Java-regex and RE2 twins.
CJK_PATTERN = "[一-鿿]"

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (no empties)."""
    t = F.lower(F.trim(_col(text)))
    return F.split(t, r"\s+")


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens_expr(text)).cast("bigint")


def bpe_token_count_expr(text: Column | str) -> Column:
    """BPE-ish subword-pretokenizer count: runs of letters, runs of
    digits, and single punctuation marks (BIGINT). Group index 0 — the
    pattern has no capture group (default idx=1 would error)."""
    return F.size(
        F.regexp_extract_all(F.lower(_col(text)), F.lit(BPE_ISH_PATTERN), 0)
    ).cast("bigint")


def stopword_hits_expr(text: Column | str, words: list[str]) -> Column:
    """Number of stopword occurrences (word-boundary regex count)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(_col(text)), F.lit(pat))).cast(
        "bigint"
    )


def lang_id_expr(text: Column | str) -> Column:
    """Heuristic language ID: CJK script detection first (any CJK
    ideograph -> 'zh'), then argmax of per-language stopword hits with
    deterministic tie-break in LANG_ORDER, 'und' when all scores are 0."""
    scores = {
        lang: stopword_hits_expr(text, LANG_STOPWORDS[lang]) for lang in LANG_ORDER
    }
    # Fold from the last language backwards so the first language in
    # LANG_ORDER wins ties (its WHEN is evaluated first).
    folded = F.lit("und")
    for lang in reversed(LANG_ORDER):
        others = [scores[o] for o in LANG_ORDER if o != lang]
        is_max = scores[lang] == F.greatest(scores[lang], *others)
        folded = F.when((scores[lang] > 0) & is_max, F.lit(lang)).otherwise(folded)
    has_cjk = (
        F.size(F.regexp_extract_all(_col(text), F.lit(CJK_PATTERN), 0)) > 0
    )
    return F.when(has_cjk, F.lit("zh")).otherwise(folded)


def punct_count_expr(text: Column | str) -> Column:
    t = _col(text)
    return (F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))).cast(
        "bigint"
    )


def quality_score_expr(text: Column | str) -> Column:
    """Deterministic quality score in [0, 1]: mixes token count, mean
    token length, stopword ratio, and punctuation density — the standard
    cheap pre-filter features of an LLM data pipeline."""
    t = _col(text)
    n_chars = F.length(t).cast("double")
    n_tokens = token_count_expr(t).cast("double")
    stop_ratio = (
        stopword_hits_expr(t, LANG_STOPWORDS["en"]).cast("double") / n_tokens
    )
    punct_ratio = punct_count_expr(t).cast("double") / n_chars
    mean_tok_len = (n_chars - (n_tokens - F.lit(1.0))) / n_tokens
    length_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    toklen_term = F.least(mean_tok_len / F.lit(8.0), F.lit(1.0))
    stop_term = F.least(stop_ratio * F.lit(3.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.2) * toklen_term
        + F.lit(0.2) * stop_term
        + F.lit(0.2) * punct_term
    )


def fingerprint_expr(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.md5(norm)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    array column (1-indexed element_at keeps the construction identical
    to the DuckDB oracle's list_transform).

    Callers must project the token array into a column first
    (``df.select(tokens_expr(text).alias("toks"))``): expressions inside
    higher-order-function lambdas are not subexpression-eliminated, so
    inlining ``split()`` here would re-run the regex split for every
    element_at — measured ~10x slower on real documents.
    """
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    # Guard: sequence(1, k) with k < 1 would count *down*; short docs
    # fall back to the whole text as a single shingle.
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Shingles straight from a text column. Prefer the two-step
    projection via :func:`shingles_from_tokens` in hot paths (see its
    docstring for why)."""
    return shingles_from_tokens(tokens_expr(text), n)


def char_run_starts_expr(sorted_chars: Column) -> Column:
    """1-based positions where an ALREADY-MATERIALIZED **sorted**
    char-array column changes value (run starts) — counts in O(n)
    lambda evaluations instead of the O(distinct * n) nested
    filter-per-distinct-char. ``sorted_chars`` MUST be a plain column
    reference (project ``array_sort`` first): complex expressions
    inside higher-order lambdas are re-evaluated per element (see
    shingles_from_tokens). CASE WHEN for the first-position test so
    ``element_at(.., 0)`` is never evaluated (ANSI raises on index 0;
    OR does not short-circuit). sequence(1, 0) counts DOWN — guard the
    empty array."""
    positions = F.when(
        F.size(sorted_chars) > 0,
        F.sequence(F.lit(1), F.size(sorted_chars)),
    ).otherwise(F.array().cast("array<int>"))
    return F.filter(
        positions,
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(sorted_chars, i)
            != F.element_at(sorted_chars, i - 1)
        ),
    )


def char_entropy_from_starts(starts: Column, n: Column) -> Column:
    """Shannon entropy (nats) of a character distribution given the
    run-start positions of the sorted char array (``starts``, a
    MATERIALIZED column — see :func:`char_run_starts_expr`) and the
    total char count ``n``. Zero shuffle — streams through a 100 TB
    scan (the explode + groupBy(doc, char) alternative would shuffle
    |text| rows per doc).

    Cross-engine parity: H = ln(n) - (1/n) * sum_c k_c * ln(k_c) with
    every transcendental pinned to integer MICROS (round(ln(k)*1e6) is
    an exact bigint both engines agree on unless ln lands within an ulp
    of a .5 micro boundary), summed exactly as bigints, and the final
    float division/round compiled from the same formula text as the
    DuckDB oracle. NULL for empty texts.
    """
    ends = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(n + 1),
    )
    counts = F.zip_with(starts, ends, lambda s, e: e - s)
    s_micros = F.aggregate(
        counts,
        F.lit(0).cast("bigint"),
        lambda acc, k: acc
        + k.cast("bigint")
        * F.round(F.log(k.cast("double")) * F.lit(1e6)).cast("bigint"),
    )
    h = F.round(
        (
            F.round(F.log(n.cast("double")) * F.lit(1e6)).cast("bigint")
            - s_micros / n.cast("double")
        )
        / F.lit(1e6),
        6,
    )
    return F.when(n > 0, h)


def chars_expr(s: Column | str) -> Column:
    """Character array of a string column — same value as the DuckDB
    oracle's ``list_transform(generate_series(1, length(s)), i ->
    s[i])``. Uses ``split(s, '')`` (JVM regex split, ~4x faster than a
    per-char substring transform: higher-order lambdas are
    interpreted); the guard maps the empty string to [] where split
    yields ['']."""
    c = F.col(s) if isinstance(s, str) else s
    return F.when(F.length(c) > 0, F.split(c, "")).otherwise(
        F.array().cast("array<string>")
    )


def compression_ratio_udf():
    """Arrow-batched zlib compression-ratio kernel: compressed bytes /
    raw UTF-8 bytes of the text (level 6, the zlib default). The
    classic cheap redundancy signal of web-scale cleaning pipelines
    (highly repetitive boilerplate compresses far below prose).
    Deterministic for a fixed zlib — but not SQL-expressible, so its
    query is declared rows-only. NULL for empty/NULL texts."""
    import zlib

    def one(t):
        if t is None or len(t) == 0:
            return None
        raw = t.encode("utf-8")
        return len(zlib.compress(raw, 6)) / len(raw)

    @F.pandas_udf("double")
    def _ratio(s: pandas.Series) -> pandas.Series:
        return s.map(one)

    return _ratio


def wordpiece_pieces(text: str | None, vocab: frozenset, max_len: int = 12):
    """Pure-Python greedy longest-match-first wordpiece segmentation of
    one text: per whitespace word, repeatedly take the longest vocab
    entry (<= max_len chars) matching the remaining prefix; a position
    with no match emits one [UNK] and advances a character. Returns
    (n_pieces, n_unk). Shared by the Arrow kernel and its reference
    test so the distributed path is pinned to this exact definition."""
    if text is None:
        return None, None
    import re

    pieces = 0
    unk = 0
    # ASCII \s+ split (not str.split): the DuckDB oracle tokenizes with
    # RE2 str_split_regex('\s+'), which does NOT treat U+00A0/U+0085 as
    # whitespace the way Python's str.split does — the kernel must
    # segment the same words the oracle walks
    for w in (
        t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t
    ):
        i, n = 0, len(w)
        while i < n:
            j = min(n, i + max_len)
            while j > i and w[i:j] not in vocab:
                j -= 1
            if j == i:  # no match, not even 1 char
                unk += 1
                pieces += 1
                i += 1
            else:
                pieces += 1
                i = j
    return pieces, unk


def wordpiece_encode_kernel(vocab: list[str], max_len: int = 12):
    """mapInPandas kernel factory: (doc_id, text) batches ->
    (doc_id, n_pieces, n_unk). The vocabulary travels once per task in
    the closure (broadcast-sized: top tokens + alphabet); the greedy
    matcher is pure Python per doc but Arrow-batched per partition —
    the tokenizer-application slot of a training-data pipeline (the
    counting twin is bpe_token_count_expr; this one applies a REAL
    subword vocabulary)."""
    vs = frozenset(vocab)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            res = pdf["text"].map(lambda t: wordpiece_pieces(t, vs, max_len))
            # nullable Int64 (the jpeg_dims_kernel pattern): a null text
            # row returns (None, None) and a non-nullable astype would
            # crash the whole task
            out["n_pieces"] = pd.array(
                [r[0] for r in res], dtype="Int64"
            )
            out["n_unk"] = pd.array([r[1] for r in res], dtype="Int64")
            yield out

    return run


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> list[tuple[str, str, str, int]]:
    """Byte-pair-encoding merge TRAINING (Sennrich et al. 2016) as a
    distributed loop: the corpus collapses once into a (word, count)
    vocabulary table — every later pass is vocabulary-sized, the
    classic BPE optimization — then each round counts adjacent symbol
    pairs weighted by word count (one map-side-combined shuffle),
    picks the max pair (count desc, pair asc tie-break:
    deterministic), and applies it with a left-to-right greedy fold
    inside the row (higher-order aggregate over the STAGED symbol
    array — no Python in the loop). Only the 1-row winning pair is
    collected per round (by-contract-small, probe-set precedent).

    Returns [(a, b, merged, weighted_count), ...] in merge order —
    the learned merge table a tokenizer would ship.
    """
    wc = (
        docs.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    syms = wc.select("c", F.split("w", "").alias("s"))
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        pairs = syms.select(
            "c",
            F.explode(
                F.when(
                    F.size("s") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at("s", i).alias("a"),
                            F.element_at("s", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("c").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] <= 0:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merged = a + b
        merges.append((a, b, merged, n))
        fold = F.aggregate(
            F.col("s"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        syms = syms.select("c", fold.alias("s")).localCheckpoint(eager=True)
    return merges


def bpe_pieces(text: str | None, ranks: dict):
    """Pure-Python BPE ENCODE of one text with a trained merge table —
    the canonical greedy merge-RANK application (Sennrich et al. 2016,
    the apply loop of every shipped BPE tokenizer): per whitespace
    word, start from characters and repeatedly apply the PRESENT pair
    with the lowest merge rank (all its occurrences, left-to-right
    non-overlapping — the same fold rule the trainer used), until no
    learned pair remains. ``ranks`` maps (a, b) -> (rank, merged).
    Returns (n_pieces, n_applied). Shared by the Arrow kernel and its
    reference test so the distributed path is pinned to this exact
    definition (the wordpiece_pieces precedent). Tokenization is the
    ASCII ``\\s+`` regex split with empties dropped — the repo-wide
    rule for oracle-pinned kernels (Python ``str.split`` treats
    U+00A0/U+0085 as whitespace; RE2/Java regex do not)."""
    import re

    if text is None:
        return None, None
    pieces = 0
    applied = 0
    for w in (
        t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t
    ):
        s = list(w)
        while len(s) >= 2:
            best = None
            for i in range(len(s) - 1):
                rk = ranks.get((s[i], s[i + 1]))
                if rk is not None and (best is None or rk[0] < best[0]):
                    best = rk
            if best is None:
                break
            _, a_b_merged = best
            a, b, merged = a_b_merged
            ns: list = []
            for x in s:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = merged
                    applied += 1
                else:
                    ns.append(x)
            s = ns
        pieces += len(s)
    return pieces, applied


def bpe_ranks(merges: list[tuple[str, str, str, int]]) -> dict:
    """(a, b) -> (rank, (a, b, merged)) lookup from a
    :func:`bpe_train_merges` table (rank = list position)."""
    return {
        (a, b): (i, (a, b, merged))
        for i, (a, b, merged, _n) in enumerate(merges)
    }


def bpe_encode_kernel(merges: list[tuple[str, str, str, int]]):
    """mapInPandas kernel factory: (doc_id, text) batches ->
    (doc_id, n_pieces, n_applied). The merge table travels once per
    task in the closure (by-contract small: n_merges rows); the greedy
    rank-application is pure Python per doc but Arrow-batched per
    partition — closes the BPE train (bpe_train_merges) -> APPLY loop
    the same way wordpiece_encode_kernel applies a trained vocab."""
    ranks = bpe_ranks(merges)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            res = pdf["text"].map(lambda t: bpe_pieces(t, ranks))
            # nullable Int64: null text rows return (None, None)
            out["n_pieces"] = pd.array(
                [r[0] for r in res], dtype="Int64"
            )
            out["n_applied"] = pd.array(
                [r[1] for r in res], dtype="Int64"
            )
            yield out

    return run


def bpe_train_reference(
    words: dict[str, int], n_merges: int = 6
) -> list[tuple[str, str, str, int]]:
    """Pure-Python reference of :func:`bpe_train_merges` (same greedy
    left-to-right apply, same count-desc/pair-asc selection) for
    pinning the distributed loop in tests."""
    sym = {w: list(w) for w in words}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in sym.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + words[w]
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        out.append((a, b, merged, n))
        for w, s in sym.items():
            ns = []
            for x in s:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = merged
                else:
                    ns.append(x)
            sym[w] = ns
    return out


# --- unigram-LM (SentencePiece-style) tokenizer ----------------------------
#
# Kudo 2018 ("Subword Regularization"), hard-EM / Viterbi variant, made
# deterministic and cross-engine-replayable: piece probabilities live as
# INTEGER milli-nat costs (round(-1000*ln(p)), the shortest-repr HALF_UP
# bridge both engines agree on), so the Viterbi DP is pure integer
# min-sum — no float comparison can flip a segmentation between engines
# or rounds.  The reference (hangarbay, /root/reference) ships no
# tokenizer at all; this extends the BPE/wordpiece family (north-star
# training-data work, VERDICT r7 task #2).

UNIGRAM_MAXP = 6  # max piece length (seed substrings cap)
UNIGRAM_MAXW = 16  # words truncate here before the DP (spec'd, mirrored)
UNIGRAM_UNK_COST = 20000  # milli-nat penalty for an uncovered char
_UG_SCALE = 100000  # composite = cost*SCALE + 100*n_pieces + n_unk
# composite is a valid additive DP objective: per-step composite =
# cost*SCALE + 100 + unk_flag, and 100*n_pieces + n_unk < SCALE always
# (n_pieces <= MAXW = 16), so min(sum) == lexicographic
# (total_cost, n_pieces, n_unk) with no field carry.


def unigram_cost(wt: int, total: int) -> int:
    """Integer milli-nat cost of a piece with weight ``wt`` out of
    ``total``: round(-1000 * ln(wt/total)) with the shortest-repr
    Decimal HALF_UP bridge (tests/test_estimators._r6 discipline) —
    bit-reproducible against DuckDB's
    CAST(round(-1000 * ln(CAST(wt AS DOUBLE) / CAST(t AS DOUBLE)), 0)
    AS BIGINT) (both sides call the same libm log)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    x = -1000.0 * math.log(float(wt) / float(total))
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def unigram_costs(vocab: list[tuple[str, int]]) -> dict[str, int]:
    """(piece, weight) list -> integer cost map (total = sum of the
    KEPT pieces' weights — the oracle's tot CTE sums vtop the same
    way)."""
    total = sum(wt for _, wt in vocab)
    return {p: unigram_cost(wt, total) for p, wt in vocab}


def unigram_viterbi(
    word: str,
    costs: dict,
    maxw: int = UNIGRAM_MAXW,
    maxp: int = UNIGRAM_MAXP,
    unk_cost: int = UNIGRAM_UNK_COST,
):
    """Min-composite Viterbi segmentation of one word (truncated to
    ``maxw`` chars).  Returns (pieces, comp) with comp = total_cost *
    100000 + 100 * n_pieces + n_unk.  An uncovered position always has
    the length-1 UNK fallback (cost ``unk_cost``, unk flag set), so
    every word segments.  Tie rule (equal composite): the SHORTEST
    candidate piece wins (ascending-L scan, strict < replaces) — ties
    cannot change comp, only the piece identities the E-step counts."""
    w = word[:maxw]
    n = len(w)
    dp = [0] + [0] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None
        bl = 1
        for ln in range(1, min(maxp, i) + 1):
            c = costs.get(w[i - ln : i])
            if c is None:
                if ln != 1:
                    continue
                step = unk_cost * _UG_SCALE + 101
            else:
                step = c * _UG_SCALE + 100
            cand = dp[i - ln] + step
            if best is None or cand < best:
                best, bl = cand, ln
        dp[i] = best
        back[i] = bl
    pieces = []
    i = n
    while i > 0:
        pieces.append(w[i - back[i] : i])
        i -= back[i]
    pieces.reverse()
    return pieces, dp[n]


def unigram_word_counts(docs, text_col: str = "text"):
    """Corpus -> (w, c) distinct truncated-word counts, checkpointed —
    the BPE collapse: every later pass is vocabulary-scale."""
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("w0"))
        .filter(F.col("w0") != "")
        .select(F.substring("w0", 1, UNIGRAM_MAXW).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )


def unigram_seed_vocab(wc, top_n: int = 200) -> list[tuple[str, int]]:
    """Seed vocabulary: top-N substring pieces (length 1..MAXP, every
    start position) of the truncated corpus words, weighted by word
    occurrence count; (weight desc, piece asc) tie-break.  Candidate
    generation is two explodes of plain int arrays (start positions x
    lengths — the struct-literal-alias trap precedent); the collect is
    bounded by contract at ``top_n`` rows."""
    starts = wc.select(
        "c", "w", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("s")
    )
    pieces = starts.select(
        "c",
        F.explode(
            F.expr(
                f"transform(sequence(1, least({UNIGRAM_MAXP}, "
                "length(w) - s + 1)), l -> substr(w, s, l))"
            )
        ).alias("piece"),
    )
    top = (
        pieces.groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("wt"))
        .orderBy(F.col("wt").desc(), "piece")
        .limit(top_n)
        .collect()
    )
    return [(r["piece"], int(r["wt"])) for r in top]


def unigram_estep_kernel(costs: dict):
    """mapInPandas kernel factory over the (w, c) word table: Viterbi-
    segment each distinct word under the current costs, count piece
    usage weighted by word count (UNK fallback chars are NOT vocab
    pieces and are excluded), pre-aggregate per batch.  The cost map
    travels in the closure (bounded by contract: <= seed_n entries)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            agg: dict = {}
            for w, c in zip(pdf["w"], pdf["c"]):
                for p in unigram_viterbi(w, costs)[0]:
                    if p in costs:
                        agg[p] = agg.get(p, 0) + int(c)
            yield pd.DataFrame(
                {"piece": list(agg), "n": list(agg.values())}
            )

    return run


def unigram_train(
    docs,
    text_col: str = "text",
    seed_n: int = 300,
    rounds: int = 2,
    final_n: int = 150,
) -> list[tuple[str, int, int]]:
    """Unigram-LM tokenizer TRAINING (hard-EM with pruning): seed from
    top-``seed_n`` substrings, then each round (a) Viterbi-segments
    every distinct word under the current integer costs (Arrow kernel
    over the vocabulary-scale word table — the corpus is touched once,
    by the word-count collapse), (b) recounts piece usage weighted by
    word count (one map-side-combined groupBy; bounded collect), and
    (c) prunes to a 3/4-shrinking vocabulary (never below ``final_n``;
    zero-usage pieces drop first) with costs recomputed from the
    surviving counts — the SentencePiece prune-by-loss loop with
    Viterbi (hard) expectations instead of forward-backward, which
    keeps every quantity an exact integer.  Returns
    [(piece, cost_milli, won_weight)] ordered (won desc, piece asc)."""
    wc = unigram_word_counts(docs, text_col)
    vocab = unigram_seed_vocab(wc, seed_n)
    costs = unigram_costs(vocab)
    keep = seed_n
    won: dict[str, int] = {p: wt for p, wt in vocab}
    for _ in range(rounds):
        keep = max(final_n, (keep * 3) // 4)
        counts = (
            wc.mapInPandas(
                unigram_estep_kernel(costs), "piece string, n bigint"
            )
            .groupBy("piece")
            .agg(F.sum("n").cast("bigint").alias("n"))
            .collect()
        )
        won = {r["piece"]: int(r["n"]) for r in counts}
        kept = sorted(won.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
        vocab = [(p, n) for p, n in kept if n > 0]
        costs = unigram_costs(vocab)
    return sorted(
        ((p, costs[p], n) for p, n in vocab),
        key=lambda t: (-t[2], t[0]),
    )


def unigram_train_reference(
    words: dict[str, int],
    seed_n: int = 300,
    rounds: int = 2,
    final_n: int = 150,
) -> list[tuple[str, int, int]]:
    """Sequential pure-Python twin of :func:`unigram_train` (same seed
    enumeration, same EM/prune schedule; shares only the per-word
    Viterbi, the wordpiece_pieces sharing precedent) for pinning the
    distributed loop in tests.  ``words`` maps TRUNCATED words to
    counts."""
    sub: dict[str, int] = {}
    for w, c in words.items():
        for s in range(len(w)):
            for ln in range(1, min(UNIGRAM_MAXP, len(w) - s) + 1):
                p = w[s : s + ln]
                sub[p] = sub.get(p, 0) + c
    vocab = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_n]
    costs = unigram_costs(vocab)
    keep = seed_n
    for _ in range(rounds):
        keep = max(final_n, (keep * 3) // 4)
        won: dict[str, int] = {}
        for w, c in words.items():
            for p in unigram_viterbi(w, costs)[0]:
                if p in costs:
                    won[p] = won.get(p, 0) + c
        kept = sorted(won.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
        vocab = [(p, n) for p, n in kept if n > 0]
        costs = unigram_costs(vocab)
    return sorted(
        ((p, costs[p], n) for p, n in vocab),
        key=lambda t: (-t[2], t[0]),
    )


def unigram_encode_kernel(costs: dict):
    """mapInPandas kernel factory: (doc_id, text) batches ->
    (doc_id, n_pieces, n_unk, cost_milli) — per-doc sums of the
    per-word Viterbi composites.  ASCII \\s+ tokenization (the RE2
    parity pin), nullable Int64 outputs (null text -> null counts)."""

    def run(batches):
        import re

        import pandas as pd

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            np_, nu_, cm_ = [], [], []
            for t in pdf["text"]:
                if t is None:
                    np_.append(None)
                    nu_.append(None)
                    cm_.append(None)
                    continue
                pieces = unk = cost = 0
                for wd in (
                    x
                    for x in re.split(r"\s+", t.lower(), flags=re.ASCII)
                    if x
                ):
                    comp = unigram_viterbi(wd, costs)[1]
                    cost += comp // _UG_SCALE
                    rem = comp % _UG_SCALE
                    pieces += rem // 100
                    unk += rem % 100
                np_.append(pieces)
                nu_.append(unk)
                cm_.append(cost)
            out["n_pieces"] = pd.array(np_, dtype="Int64")
            out["n_unk"] = pd.array(nu_, dtype="Int64")
            out["cost_milli"] = pd.array(cm_, dtype="Int64")
            yield out

    return run
