"""Near-duplicate detection over document corpora: word-shingle
Jaccard, MinHash+LSH, and SimHash (BASELINE.json north-star tier).

Scale design:

* **Shingle Jaccard** prunes candidates with token-count banding (an
  equi-join on exploded size buckets — no O(n²) cross join reaches
  the cluster); exact Jaccard runs only on survivors. Size banding is
  sound for high thresholds: J(A,B) ≥ t ⇒ ||A|−|B|| ≤ (1−t)/t·min.
* **MinHash+LSH** is the unblocked path: 16 min-hashes → 4 bands of
  4 → candidates are pairs sharing a band key (equi-join on the band
  bucket), then exact-Jaccard verification. Shuffle volume is
  O(docs·bands), never O(docs²).
* **SimHash** produces a 32-bit locality-sensitive signature per doc
  from md5-derived bit contributions; Hamming-ball mining can then
  block on signature bytes.

Min-hash values are lexicographic minima of md5 hex strings — a total
order both Spark and DuckDB implement identically, so the oracle can
replay the exact construction (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..memo import PersistSlot
from ..functions.text import TOKEN_RE

NGRAM_N = 3
MINHASH_SEEDS = 16
LSH_BANDS = 4  # 4 bands × 4 rows

#: Universal-hash family for the 16 minhash permutations:
#: sig_s(doc) = min over shingles of (A[s]·h + B[s]) mod P, where
#: h = first 60 bits of md5(shingle) mod P. ONE md5 per shingle
#: instance instead of one per (seed, shingle) — 16× fewer digest
#: computations than hashing the seed into the md5 input, and the
#: per-seed work is integer multiply-add, not string hashing. P is the
#: Mersenne prime 2³¹−1, so A·h+B < 2⁶² never overflows a signed
#: 64-bit long; all three constants are plain literals DuckDB evaluates
#: identically (oracle parity).
MINHASH_P = 2_147_483_647
MINHASH_A = [(1103515245 * (s + 1) + 12345) % MINHASH_P for s in range(MINHASH_SEEDS)]
MINHASH_B = [(214013 * (s + 1) + 2531011) % MINHASH_P for s in range(MINHASH_SEEDS)]
assert all(a != 0 for a in MINHASH_A)


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct word n-gram (n=3) shingle set per document; documents
    with fewer than n tokens are excluded (no shingles exist).
    ``keep_cols`` are carried through unchanged (so callers splitting
    the output don't need a second tokenize pass over the corpus)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    base = docs.select(
        F.col(id_col).alias("doc_id"), *keep_cols, toks.alias("toks")
    ).filter(F.size("toks") >= NGRAM_N)
    t = F.col("toks")
    # 1-based element_at over a 1-based index sequence
    sh = F.transform(
        F.sequence(F.lit(1), F.size(t) - (NGRAM_N - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i),
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
        ),
    )
    return base.select("doc_id", *keep_cols, F.array_distinct(sh).alias("sh"))


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    return inter * 1.0 / (F.size(a) + F.size(b) - inter)


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact 3-gram-Jaccard near-dup pairs (doc_a < doc_b) with
    PREFIX-FILTER candidate pruning (Chaudhuri et al.): order each
    document's shingle digests by a GLOBAL total order and keep the
    first ``|X| − ⌈t·|X|⌉ + 1``; any pair with J ≥ t must share a
    digest inside both prefixes, so the equi-join on prefix digests is
    EXACT (no missed pairs) for ANY global order — and ordering
    rarest-first (global document frequency ascending, digest as
    tiebreak) puts low-collision digests in the prefixes, which is
    what makes candidate volume small (the md5-ascending order is
    correct too, but its prefixes contain common shingles whose df²
    candidate blowup dominated runtime: 7.9 s → 2.4 s steady @ sf0.1).
    The df join carries NO broadcast hint (round 4): distinct shingle
    digests grow with corpus token count, so a forced broadcast would
    ship a corpus-proportional table to every executor at 100 TB —
    AQE broadcasts it at small SF from runtime size stats (measured:
    steady time unchanged) and shuffles it at scale, which a hint
    would forbid. Candidates carry ONLY (digest, doc_id) —
    the 32-char digest is the join key and the dedup shuffles bare id
    pairs, never shingle sets.
    """
    sh = shingles(docs).persist()  # reused: prefix gen + 2 verify joins
    ex = sh.select("doc_id", F.explode(F.transform(F.col("sh"), F.md5)).alias("digest"))
    df_tbl = ex.groupBy("digest").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = (
        F.size("ds") - F.ceil(F.size("ds") * F.lit(threshold)) + 1
    ).cast("int")
    pref = (
        ex.join(df_tbl, "digest")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("digest")))
            ).alias("ds")
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(F.col("ds"), F.lit(1), prefix_len),
                    lambda s: s.getField("digest"),
                )
            ).alias("digest"),
        )
    )
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "digest")
        .join(pref.select(F.col("doc_id").alias("doc_b"), "digest"), on="digest")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def minhash_signatures(docs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, g0..g15) — the 16 minhash signatures, computed as 16
    streamed ``min`` partial aggregates over ONE shingle explosion
    (see minhash_band_keys for why this beats the alternatives)."""
    sh = shingles(docs) if sh is None else sh
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long") % MINHASH_P
    exploded = sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", h.alias("h")
    )
    return exploded.groupBy("doc_id").agg(
        *[
            F.min((F.lit(MINHASH_A[s]) * F.col("h") + F.lit(MINHASH_B[s])) % MINHASH_P)
            .alias(f"g{s}")
            for s in range(MINHASH_SEEDS)
        ]
    )


def minhash_band_keys(docs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket assignment.

    sig(doc, s) = min over shingles of (A[s]·h + B[s]) mod P with
    h = md5-derived 60-bit int mod P (see MINHASH_A/B/P above); band
    key = the band's 4 signatures joined in seed order.

    All 16 signatures are computed as 16 streamed ``min`` partial
    aggregates over ONE shingle explosion — no seed cross-join, so the
    shuffle carries one row of 16 longs per (doc, map-task) partial
    instead of 16× exploded rows. (An array_min(transform(...)) per-row
    formulation avoids the explosion entirely but measured ~1.7×
    slower: higher-order lambdas don't codegen as tightly as the
    streamed hash-agg. A previous md5-per-(seed,shingle) formulation
    measured ~2.3× slower than this integer family.)
    """
    sigs = minhash_signatures(docs, sh=sh)
    rows_per_band = MINHASH_SEEDS // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"g{b * rows_per_band + i}")
                    for i in range(rows_per_band)
                ],
            ).alias("band_key"),
        )
        for b in range(LSH_BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """MinHash-LSH near-dup pairs: candidates share ≥1 of 4 band keys,
    then exact-Jaccard verified at ``threshold``. No size blocking —
    catches cross-block pairs the banded join can't see."""
    # Persisted because band-gen and both verify joins reuse it. The
    # cache entry is LRU-evictable (MEMORY_AND_DISK), so repeated calls
    # degrade to recomputation rather than OOM; long-lived sessions
    # invoking this in a loop should clear via spark.catalog.clearCache().
    sh = shingles(docs).persist()
    bands = minhash_band_keys(docs, sh=sh)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash_near_dup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash pair mining: documents whose 60-bit signatures differ in
    at most ``max_hamming`` bits.

    Candidate generation blocks on the 4 15-bit signature chunks — by
    pigeonhole, any pair within Hamming distance 3 shares at least one
    untouched chunk, so the block equi-join is EXACT for the default
    threshold (and loses nothing until distance ≥ 4). Shuffle is
    O(docs · 4), verification is a bit_count on candidates only, and
    the 15-bit block domain (32768 values) keeps the random collision
    floor at ~n²/16384 bucket pairs — measured linear candidate growth
    at 10× corpus (see SIMHASH_BITS note above).
    """
    sig = simhash(docs)
    return simhash_block_pairs(sig, max_hamming=max_hamming)


#: persisted signature frames from the PREVIOUS simhash_block_pairs
#: call, released at the next call's entry (the queries_stats
#: memo.PersistSlot discipline: the returned pair frame is lazy, so the
#: persist must outlive this call).
_BLOCK_PAIRS_SLOT = PersistSlot()


def simhash_block_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """The pigeonhole block join + Hamming verify over an existing
    (doc_id, simhash) frame — shared by the plain and IDF-weighted
    signature schemes.

    ``max_hamming`` is hard-bounded at ``SIMHASH_BLOCKS - 1``: the
    pigeonhole argument (any pair within distance d shares an
    untouched block when d < #blocks) is what makes the block join
    EXACT; past it, pairs whose differing bits span every block are
    silently missing from the candidates — an under-complete result
    with no error (code-review r05). Callers needing a wider radius
    must widen the block count, not the threshold."""
    if max_hamming > SIMHASH_BLOCKS - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole-exact "
            f"bound of {SIMHASH_BLOCKS - 1} for {SIMHASH_BLOCKS} "
            "blocks; results would be silently under-complete"
        )
    _BLOCK_PAIRS_SLOT.release()
    # persisted (r10): both self-join sides re-ran the signature
    # lineage — the tokenize→md5→60-bit-vote aggregate, the expensive
    # half of the miner — because the differing projections defeat
    # ReuseExchange. The cached frame is one (id, long) row per doc,
    # tiny next to recomputing the token pass at any scale.
    sig = sig.persist()
    _BLOCK_PAIRS_SLOT.hold(sig)
    block_domain = 1 << SIMHASH_BLOCK_BITS
    probe = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        # integer shift, never float division: 60-bit
                        # signatures exceed double precision (2^53)
                        (
                            F.shiftright(
                                F.col("simhash"), SIMHASH_BLOCK_BITS * k
                            )
                            % block_domain
                        ).alias("byte"),
                    )
                    for k in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", F.col("blk.k").alias("k"), F.col("blk.byte").alias("byte"))
    a = probe.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "k", "byte"
    )
    b = probe.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "k", "byte"
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    # Verify BEFORE dedup: bit_count is one instruction, so the Hamming
    # filter runs on the raw candidate stream and the distinct only
    # dedups true pairs (a close pair shares several untouched bytes →
    # generated up to 4×). On a correlated-signature corpus the raw
    # candidate volume is ~50× the true-pair volume; deduping first
    # shuffles all of it, filtering first shuffles only matches.
    return (
        a.join(b, on=["k", "byte"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


#: winnowing parameters (MOSS-style): k-char rolling hashes, minimum
#: kept per w-hash window. Each polynomial term is reduced mod
#: WINNOW_MOD before summing, so intermediate values stay ≤ 8·MOD²
#: (< 2^63) for ANY codepoint — ascii() returns full codepoints in
#: both engines, and unreduced codepoint·131^7 would overflow BIGINT
#: for CJK/emoji text.
WINNOW_K = 8
WINNOW_W = 16
WINNOW_BASE = 131
WINNOW_MOD = 1_000_003


def winnowing_fp_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, fps: array<long>) — each document's distinct winnowing
    fingerprint set (min rolling hash per w-window).

    Computed entirely with array higher-order functions — the rolling
    hash never explodes to one row per character position, so there is
    no O(len) row duplication and ZERO shuffle (per-row computation).

    The character codes are materialized once via ``split(text, '')``
    (one O(len) pass) and the polynomial reads them with O(1)
    ``element_at``. The naive ``substr(text, p+j, 1)`` formulation is
    O(len) per access (UTF-8 offset scan), i.e. O(len²) per document —
    measured 4-8× slower at sf0.1 than this array form.
    """
    chars = F.expr(
        f"transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT) % {WINNOW_MOD})"
    )
    poly = " + ".join(
        f"element_at(__ch, p + {j}) * {WINNOW_BASE ** j % WINNOW_MOD}"
        for j in range(WINNOW_K)
    )
    rhs = F.expr(
        f"transform(sequence(1, size(__ch) - {WINNOW_K - 1}), p -> ({poly}) % {WINNOW_MOD})"
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(1, size(__rhs) - {WINNOW_W - 1}), "
        f"p -> array_min(slice(__rhs, p, {WINNOW_W}))))"
    )
    return (
        docs.filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
        .select("doc_id", chars.alias("__ch"))
        .select("doc_id", rhs.alias("__rhs"))
        .select("doc_id", fps.alias("__fps"))
    )


def winnowing_fp_sets_arrow(docs: DataFrame) -> DataFrame:
    """Arrow-batched numpy formulation of ``winnowing_fp_sets`` — the
    same integers (pure int64 modular arithmetic, order-free set
    output), ~an order of magnitude faster per document than the
    interpreted higher-order-function expression tree. The rolling
    polynomial is one (n−k+1, k) @ (k,) matmul per document; window
    minima via a stride-tricks view (zero copies); products stay
    < 8·10¹² so int64 never overflows.
    """
    import numpy as np
    import pandas as pd

    k, w, mod = WINNOW_K, WINNOW_W, WINNOW_MOD
    coef = np.array([WINNOW_BASE**j % mod for j in range(k)], dtype=np.int64)
    min_len = k + w - 1

    def compute(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_ids, out_fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(text) < min_len:
                    continue
                codes = np.fromiter(
                    (ord(c) for c in text), dtype=np.int64, count=len(text)
                ) % mod
                rhs = (sliding_window_view(codes, k) @ coef) % mod
                mins = sliding_window_view(rhs, w).min(axis=1)
                out_ids.append(doc_id)
                out_fps.append(np.unique(mins))
            # explicit object dtype: a batch where EVERY doc is below
            # min_len yields empty lists, and pandas' default float64
            # empty columns crash Arrow's list<long> conversion — a
            # partition of only-short docs killed the whole job
            # (latent bug surfaced by the r05 HOF/arrow parity test)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype=object),
                    "__fps": pd.Series(out_fps, dtype=object),
                }
            )

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    # derive the id type from the input instead of hardcoding bigint —
    # every sibling operator here is id-type agnostic (code-review r05)
    id_type = docs.schema["doc_id"].dataType
    out_schema = StructType(
        [
            StructField("doc_id", id_type),
            StructField("__fps", ArrayType(LongType())),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(compute, out_schema)


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-document winnowing fingerprint summary:
    (doc_id, n_fps, min_fp, max_fp). See ``winnowing_fp_sets``."""
    return winnowing_fp_sets_arrow(docs).select(
        "doc_id",
        F.size("__fps").cast("long").alias("n_fps"),
        F.array_min("__fps").cast("long").alias("min_fp"),
        F.array_max("__fps").cast("long").alias("max_fp"),
    )


def winnowing_collision_pairs(
    docs: DataFrame, min_shared: int = 3, max_df: int = 20
) -> DataFrame:
    """Cross-document plagiarism/near-dup candidates: pairs sharing at
    least ``min_shared`` *rare* winnowing fingerprints (MOSS-style).

    ``max_df`` is the document-frequency cap: fingerprints appearing in
    more than ``max_df`` documents are boilerplate (shared substrings of
    the domain, not copying signal) and are dropped before pairing —
    the same move as stop-word removal. This is also THE scale guard:
    a fingerprint shared by N docs emits O(N²) pair rows, so without
    the cap one ubiquitous substring turns the self-join quadratic.
    With it, the join output is bounded by max_df·|fingerprints|.

    Join keys are 8-byte hashes — document text never shuffles.
    """
    # localCheckpoint: materialize the fingerprint sets once — they are
    # read by three branches (df-count, semi filter, self-join) and
    # re-running the hash UDF per branch would triple the work.
    sets = winnowing_fp_sets_arrow(docs).localCheckpoint()
    e = sets.select("doc_id", F.explode("__fps").alias("fp"))
    # Fingerprint sets are distinct per doc, so count == doc frequency.
    rare = (
        e.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    e = e.join(rare, on="fp", how="left_semi")
    return (
        e.alias("a")
        .join(e.alias("b"), on="fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


#: SimHash width/blocking. 60 bits = 15 md5 nibbles (the top bit of a
#: signed 64-bit long stays clear, so xor/bit_count behave identically
#: in Spark and DuckDB), blocked as 4 × 15-bit chunks for the
#: pigeonhole candidate join. Round 4 widening (VERDICT r03 item 5's
#: stress run): 32-bit signatures in 8-bit blocks have a random
#: collision floor of ~n²/128 bucket pairs — measured 3.98M block
#: pairs over 5k docs / 55.6M over 50k at sf0.1, quadratic at scale.
#: 15-bit blocks cut the floor 128× (~n²/16384) and 60-bit hamming≤3
#: is ~10⁹× more selective than 32-bit: re-measured 448k → 6.66M
#: block pairs (8.3-8.9× lower absolute volume), against TRUE-pair
#: counts of 3018 → 53453 on the same corpus — candidates now grow
#: slower than the true near-dup output itself (148× → 125×
#: candidates per true pair), i.e. candidate generation is
#: output-bound, which is as sub-quadratic as an exact miner can be
#: on a single-topic corpus whose genuine pair structure is dense.
SIMHASH_BITS = 60
SIMHASH_BLOCKS = 4
SIMHASH_BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS


def _simhash_bit_sql(j: int, engine: str) -> str:
    """Bit j of the 60-bit hash of one token, from its md5 hex string
    column ``h``: nibble j//4, bit (3 − j%4). Engine-portable integer
    div: Spark ``div`` / DuckDB ``//``."""
    nib = f"substr(h, {1 + j // 4}, 1)"
    val = f"(instr('0123456789abcdef', {nib}) - 1)"
    div = "div" if engine == "spark" else "//"
    return f"(({val} {div} {1 << (3 - j % 4)}) % 2)"


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document: each token's md5 contributes ±1 to
    60 bit positions; the sign of each accumulated position becomes
    one output bit. One explode + one hash-aggregate — fully
    distributed, no pairwise work."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).select("doc_id", F.md5("tok").alias("h"))
    # Project the 15 nibble VALUES once, then each of the 60 bit
    # aggregates is a shift-and-mask on its nibble column. Same bit
    # definition as _simhash_bit_sql (the oracle keeps that form), but
    # the per-bit codegen tree shrinks from md5+substr+instr to two
    # integer ops — deep duplicated subtrees were pure compile and
    # eval overhead (9.4 s cold / 2.9 s steady → 2.7 s / 2.3 s for the
    # pair miner at sf0.1, measured at the original 32-bit width).
    nibs = hashed.select(
        "doc_id",
        *[
            F.expr(
                f"instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1"
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS // 4)
        ],
    )
    aggs = [
        F.sum(
            (
                F.shiftright(F.col(f"v{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1))
            )
            * 2
            - 1
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = nibs.groupBy("doc_id").agg(*aggs)
    bits = sum(
        (
            F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(SIMHASH_BITS)
        ),
        F.lit(0),
    )
    return per_doc.select("doc_id", bits.cast("long").alias("simhash"))


#: IDF weight cap for the weighted signature scheme. The weight is the
#: ENGINE-STABLE integer ``least(CAP, n_docs div df + 1)`` — integer
#: division only, no libm log whose last-bit rounding could diverge
#: between Spark and DuckDB (the Benford-literals precedent): common
#: tokens (df ≈ n) vote with weight 2, tokens in ≤1/15th of the corpus
#: with the full cap. Curve calibrated on the sf0.1 bias audit: this
#: 8:1 spread measures a 4-5% bucket-pair reduction on the synthetic
#: single-topic corpus (whose ~uniform small vocabulary gives IDF
#: little to exploit — every token sits in ≥5% of documents), while a
#: steeper 64:1 spread measured WORSE than plain (concentrating the
#: vote in a handful of rare tokens loses signature entropy). On a
#: natural Zipfian corpus the gap is what `simhash_block_bias_audit`
#: exists to measure before choosing a scheme.
SIMHASH_IDF_CAP = 16


def simhash_both(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Both signature schemes from ONE corpus pass: (doc_id,
    simhash_plain, simhash_weighted). The plain and weighted schemes
    share the tokenize→md5→nibble pipeline and the per-doc exchange —
    the bit votes just aggregate twice (weight 1 and the IDF weight)
    inside the same groupBy — so a scheme-comparison audit costs one
    signature pass plus the df join, not two full passes (r7: the
    bias audit was paying 2× scan/explode/hash over identical input;
    at 100 TB that is a second pass over the whole token stream).
    Bit-for-bit equal to `simhash` / `simhash_weighted` (pinned by
    tests)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    pairs = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    )
    dfreq = pairs.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    hashed = (
        pairs.join(dfreq, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.md5("tok").alias("h"),
            F.least(
                F.lit(SIMHASH_IDF_CAP), F.expr("n div df") + F.lit(1)
            ).alias("w"),
        )
    )
    nibs = hashed.select(
        "doc_id",
        "w",
        *[
            F.expr(
                f"instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1"
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS // 4)
        ],
    )

    def _vote(j):
        return (
            F.shiftright(F.col(f"v{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1))
        ) * 2 - 1

    aggs = [F.sum(_vote(j)).alias(f"p{j}") for j in range(SIMHASH_BITS)] + [
        F.sum(F.col("w") * _vote(j)).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = nibs.groupBy("doc_id").agg(*aggs)

    def _bits(prefix):
        return sum(
            (
                F.when(F.col(f"{prefix}{j}") > 0, F.lit(1 << j)).otherwise(
                    F.lit(0)
                )
                for j in range(SIMHASH_BITS)
            ),
            F.lit(0),
        )

    return per_doc.select(
        "doc_id",
        _bits("p").cast("long").alias("simhash_plain"),
        _bits("s").cast("long").alias("simhash_weighted"),
    )


def simhash_weighted(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """IDF-weighted 60-bit SimHash: every token OCCURRENCE votes ±1 on
    each bit position scaled by the token's integer IDF weight, so
    corpus-common tokens — which every document shares and which drag
    all plain signatures toward one corpus-majority point (the bit
    bias behind the measured ~24×-above-uniform block-collision floor,
    PERF.md r04 stress) — stop dominating the majority vote, while
    rare discriminative tokens drive it. The df join carries NO
    broadcast hint (ngram_jaccard_pairs rationale): token vocabulary
    grows with the corpus (Heaps' law — ~1e8-1e9 types at 100 TB), so
    a forced broadcast would eventually OOM executors; AQE broadcasts
    the vocabulary table at small SF from runtime size stats and
    shuffles it at scale."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    pairs = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    )
    dfreq = (
        pairs.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    hashed = (
        pairs.join(dfreq, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.md5("tok").alias("h"),
            F.least(
                F.lit(SIMHASH_IDF_CAP),
                F.expr("n div df") + F.lit(1),
            ).alias("w"),
        )
    )
    nibs = hashed.select(
        "doc_id",
        "w",
        *[
            F.expr(
                f"instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1"
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS // 4)
        ],
    )
    aggs = [
        F.sum(
            F.col("w")
            * (
                (
                    F.shiftright(F.col(f"v{j // 4}"), 3 - j % 4).bitwiseAND(
                        F.lit(1)
                    )
                )
                * 2
                - 1
            )
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = nibs.groupBy("doc_id").agg(*aggs)
    bits = sum(
        (
            F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(SIMHASH_BITS)
        ),
        F.lit(0),
    )
    return per_doc.select("doc_id", bits.cast("long").alias("simhash"))
