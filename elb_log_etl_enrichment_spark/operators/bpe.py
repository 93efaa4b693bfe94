"""Byte-pair-encoding tokenizer induction over a distributed corpus.

The one tokenizer-side operator a training-data pipeline actually
runs at corpus scale: learn the merge table. Everything downstream
(encoding text with a FIXED merge table) is a narrow map; the
training loop is the part that needs the cluster, and its shape is
deliberately vocabulary-bounded:

* The corpus collapses to DISTINCT words with counts first (one
  shuffle, carrying the vocabulary — never corpus-sized rows again).
  This is the classic word-level BPE formulation (Sennrich et al.
  2016, "Neural Machine Translation of Rare Words with Subword
  Units" — public algorithm).
* Each merge round is: adjacent-pair explode over the symbol arrays
  (weighted by word count) → one vocabulary-sized aggregate → a
  1-row argmax collected to the driver (the merge decision is
  genuinely global, so one tiny driver round-trip per merge is the
  honest minimum) → a broadcast-literal fold that rewrites every
  word's symbol array in place.
* Symbol arrays are rewritten by a single left-to-right HOF fold —
  non-overlapping greedy replacement, same semantics as the
  reference implementations; a just-merged token never re-merges in
  the same round.
* Rounds localCheckpoint the vocabulary frame: the loop is
  iterative, so lineage would otherwise stack one fold layer per
  merge and re-execute from scratch at every argmax action.

Ties break deterministically by (pair count DESC, left ASC, right
ASC), so the merge table is exactly reproducible — pinned in tests
against an independent pure-Python reference.

Iterative training is not SQL-expressible → the registry query is
rows-only (same classification as IVF/PQ training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel for "no pending symbol" in the merge fold; words never
#: contain the empty string as a symbol (split("") yields chars).
_EMPTY = ""


def _merge_fold(sym_col, left: str, right: str, merged: str):
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with ``merged`` inside a symbol array, as one HOF
    fold. Accumulator: (out, cur, jm) — committed prefix, pending
    symbol, and a just-merged flag that stops the fresh token from
    chain-merging within the same round ("aaa" + (a,a) → [aa, a])."""

    def step(acc, x):
        can_merge = (
            ~acc["jm"] & (acc["cur"] == F.lit(left)) & (x == F.lit(right))
        )
        return F.struct(
            F.when(
                can_merge | (acc["cur"] == _EMPTY), acc["out"]
            )
            .otherwise(F.concat(acc["out"], F.array(acc["cur"])))
            .alias("out"),
            F.when(can_merge, F.lit(merged)).otherwise(x).alias("cur"),
            can_merge.alias("jm"),
        )

    return F.aggregate(
        sym_col,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(_EMPTY).alias("cur"),
            F.lit(False).alias("jm"),
        ),
        step,
        lambda acc: F.when(
            acc["cur"] == _EMPTY, acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["cur"]))),
    )


def _bpe_train_driver(rows: list, n_merges: int) -> list[dict]:
    """Exact driver-side BPE over a collected (word, cnt) vocabulary —
    same greedy non-overlapping replacement and the same
    (count DESC, left ASC, right ASC) tie-break as the distributed
    loop (pinned equal in tests)."""
    vocab = [(list(w), int(c)) for w, c in rows]
    merges: list[dict] = []
    for rank in range(n_merges):
        counts: dict = {}
        for sym, cnt in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), w = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": merged,
             "pair_count": w}
        )
        for sym, _ in vocab:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [merged]
                i += 1  # merged token never re-merges this round
    return merges


def bpe_train(
    words: DataFrame, n_merges: int = 12, driver_vocab_limit: int = 65536
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) vocabulary
    frame. Returns the ordered merge table as dicts with keys
    rank/left/right/merged/pair_count. Stops early if no adjacent
    pair remains.

    Two-path (same discipline as operators/graph.pagerank): the merge
    loop costs 2 sequential Spark jobs per round, so for a vocabulary
    within ``driver_vocab_limit`` the exact loop runs driver-side on
    the collected counts (measured 17.5 s → <1 s at sf0.01, where 24
    tiny jobs were pure scheduler overhead). Beyond the limit — real
    corpora: BPE vocabularies cap out far below corpus size, but web
    text can exceed the limit before token normalization — the
    distributed loop runs with per-round localCheckpoint. Both paths
    share tie-breaks and are pinned identical in tests."""
    if driver_vocab_limit > 0:
        head = words.select("word", "cnt").limit(driver_vocab_limit + 1).collect()
        if len(head) <= driver_vocab_limit:
            return _bpe_train_driver(
                [(r["word"], r["cnt"]) for r in head], n_merges
            )
    vocab = words.select(
        F.split(F.col("word"), "").alias("sym"), F.col("cnt")
    ).localCheckpoint(eager=True)

    merges: list[dict] = []
    for rank in range(n_merges):
        lefts = F.slice("sym", 1, F.size("sym") - 1)
        rights = F.slice("sym", 2, F.size("sym") - 1)
        pair = F.explode(
            F.zip_with(
                lefts, rights, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
            )
        )
        top = (
            vocab.filter(F.size("sym") >= 2)
            .select(pair.alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("w"))
            .orderBy(F.col("w").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, w = top[0]["a"], top[0]["b"], int(top[0]["w"])
        merged = a + b
        merges.append(
            {
                "rank": rank,
                "left": a,
                "right": b,
                "merged": merged,
                "pair_count": w,
            }
        )
        vocab = vocab.select(
            _merge_fold(F.col("sym"), a, b, merged).alias("sym"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode_tokens(
    words: DataFrame, merges: list[dict], checkpoint_every: int = 32
) -> DataFrame:
    """Encode a (word, …) vocabulary frame with a FIXED merge table:
    chars → subwords by applying every merge in rank order as one
    ``_merge_fold`` HOF — the exact rewriting rule training used, so
    train-then-encode round-trips bit-identically. Single-pass-per-
    merge in ascending rank is exactly Sennrich's iterative
    min-rank-first encoder for tables learned by this trainer: a pair
    involving a merged token can only have been learned AFTER that
    token existed, so applicable pairs always appear in rank order and
    no earlier-rank pair can re-appear once passed (pinned against an
    independent pure-Python encoder in tests).

    Scale shape: encoding runs over the DISTINCT-word vocabulary —
    never the corpus token stream; callers join ``n_bpe_tokens`` back
    to their corpus by word (vocabulary-sized build side, broadcast
    when it fits). The merge chain is pure JVM expression work (no
    Python, no shuffle); every ``checkpoint_every`` merges the frame
    localCheckpoints so very long tables neither stack a
    lineage/codegen tower nor re-fold from scratch downstream.

    Adds columns ``bpe_sym`` (array<string>) and ``n_bpe_tokens``.
    """
    sym = F.split(F.col("word"), "")
    out = words
    ordered = sorted(merges, key=lambda m: m["rank"])
    for i, m in enumerate(ordered):
        sym = _merge_fold(sym, m["left"], m["right"], m["merged"])
        if (i + 1) % checkpoint_every == 0 and (i + 1) < len(ordered):
            out = out.withColumn("bpe_sym", sym).localCheckpoint(eager=False)
            sym = F.col("bpe_sym")
    return out.withColumn("bpe_sym", sym).withColumn(
        "n_bpe_tokens", F.size(F.col("bpe_sym"))
    )
