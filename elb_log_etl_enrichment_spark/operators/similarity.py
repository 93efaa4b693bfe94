"""Embedding similarity search (BASELINE.json north-star tier).

Two tiers, same output contract (query_id, rank, neighbor, cosine):

* **Brute force** — broadcast the (small) query set against every
  candidate; exact top-k. O(|Q|·N) dot products, the correctness
  baseline.
* **Sign-LSH bucketed** — assign every vector to a random-hyperplane
  bucket; candidates are same-bucket vectors only, so the join is a
  shuffled equi-join on the bucket id and per-query work drops to the
  bucket population (~N/2^planes). This is the 100 TB path: buckets
  partition the corpus, no broadcast of the corpus side, approximate
  recall traded for a 2^planes fan-in reduction. (An IVF variant
  would learn centroids instead of random planes; same join shape.)

Ranking is over the ROUNDED cosine with vec_id tiebreak so Spark and
the DuckDB oracle order identically.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, dot, lsh_bucket, norm
from ..memo import memo_put


def _prepared(emb: DataFrame) -> DataFrame:
    v = as_double_array(F.col("embedding"))
    return emb.select(
        F.col("vec_id"), v.alias("v")
    ).withColumn("nrm", norm(F.col("v")))


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    cos = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
    ).alias("cosine")
    scored = pairs.select("query_id", "neighbor", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("rnk").cast("long").alias("rnk"), "neighbor", "cosine")
    )


def cosine_topk_bruteforce(
    emb: DataFrame, query_pred, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: queries = rows matching ``query_pred``
    (a Column predicate over vec_id), candidates = all other vectors."""
    p = _prepared(emb)
    q = p.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = p.select(
        F.col("vec_id").alias("neighbor"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor"))
    return _ranked_topk(pairs, k)


def _empty_topk(frame, id_col: str = "vec_id"):
    """Typed empty (query_id, rnk, neighbor, cosine) frame — the
    totality return for trained-index paths when the corpus (and so
    the training sample) is empty: an index over nothing serves
    nothing, it must not crash the job."""
    return frame.limit(0).select(
        F.col(id_col).alias("query_id"),
        F.lit(1).cast("long").alias("rnk"),
        F.col(id_col).alias("neighbor"),
        F.lit(0.0).alias("cosine"),
    )


#: Hard ceiling on the driver-collected query vector set for the
#: dense-matrix paths (arrow/bruteforce shapes). 65,536 queries
#: × 128-dim float64 ≈ 64 MiB of vectors: comfortably broadcastable,
#: far past any sane per-job query batch. Larger query sets should be
#: chunked by the caller, not silently collected. The ADC paths
#: (PQ/IVFPQ) bound a BIGGER quantity — their per-query lookup tables,
#: O(|Q|·m·n_centroids) — via :func:`_adc_query_cap` below.
MAX_QUERY_ROWS = 65_536

#: Driver/broadcast budget for the PQ/IVFPQ ADC tables. 256 MiB of
#: float64 tables (plus the same again inside the broadcast pickle)
#: stays comfortable on a multi-GB driver; the vector matrix itself is
#: far smaller at any cap this yields.
_ADC_TABLE_BUDGET_BYTES = 256 << 20


def _adc_query_cap(m: int, n_centroids: int) -> int:
    """Query cap sized by the quantity the guard exists to bound: the
    ADC tables are |Q|·m·n_centroids float64s, so the cap is the
    budget divided by the per-query table row — NOT the vector width
    (code-review r05: a 65,536-query set passed the old vector-sized
    cap and then allocated ~1 GiB of tables anyway, OOMing after the
    fail-fast check instead of before it)."""
    return max(1, min(MAX_QUERY_ROWS, _ADC_TABLE_BUDGET_BYTES // (m * n_centroids * 8)))


def _bounded_query_rows(unit: DataFrame, query_pred, cap: int = MAX_QUERY_ROWS):
    """Collect the query rows with a HARD fail-fast bound (VERDICT
    r04): `limit(cap+1)` stops executors early and ships at most
    cap+1 rows, so an oversized `query_pred` (e.g. an always-true
    predicate over a 100 TB corpus) raises immediately instead of
    OOMing the driver mid-collect."""
    rows = unit.filter(query_pred).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query_pred selects more than {cap} rows; the ANN query "
            "set is driver-collected and broadcast — chunk the query "
            "batch or tighten the predicate"
        )
    return rows


def _lloyd(X, n_centroids: int, iters: int, rng, pp_init: bool = False):
    """Vectorized Lloyd k-means over a driver-side sample: one
    argmin-assignment + np.add.at centroid update per iteration, empty
    cells keep their previous centroid. Shared by the IVF coarse
    quantizer (``pp_init=True`` — k-means++ D² seeding; with few
    centroids over near-uniform vectors a plain random init leaves
    them clumped and 1-probe recall collapses, 0.53 → 0.07 measured)
    and the PQ subspace codebooks (random init — 256 centroids per
    subspace self-spread, and keeping the original init preserves the
    pinned recall). Both train on a bounded seeded sample (never the
    corpus) and embed the resulting centroids in the plan as
    literals/broadcasts."""
    import numpy as np

    n = len(X)
    if pp_init and n > n_centroids:
        idx = [int(rng.randint(n))]
        d2 = ((X - X[idx[0]]) ** 2).sum(1)
        for _ in range(1, n_centroids):
            tot = d2.sum()
            i = (
                int(rng.choice(n, p=d2 / tot))
                if tot > 0
                else int(rng.randint(n))
            )
            idx.append(i)
            d2 = np.minimum(d2, ((X - X[i]) ** 2).sum(1))
        cent = X[np.array(idx)]
    else:
        cent = X[rng.choice(n, size=n_centroids, replace=n < n_centroids)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=n_centroids)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def _train_pq(sample, m: int, n_centroids: int, iters: int, rng):
    """Batched-subspace PQ codebook training over a driver-side sample
    (``(n, d)`` float array, d divisible by m): init draws stay
    per-subspace in j order (same rng sequence as the historical
    per-subspace loop); the Lloyd iterations batch ALL subspaces per
    step via one einsum — the per-j Python loop was the driver-side
    cold-start cost (~10 s → ~1 s measured). Returns ``(m, n_centroids,
    d//m)`` codebooks. Shared by ``cosine_topk_pq`` (trains on unit
    vectors) and ``cosine_topk_ivfpq`` (trains on cell residuals)."""
    import numpy as np

    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    X3 = sample.reshape(n, m, sub_d)
    cent = np.stack(
        [
            X3[rng.choice(n, size=n_centroids, replace=n < n_centroids), j]
            for j in range(m)
        ]
    )  # (m, k, sub_d)
    x_sq = (X3**2).sum(-1)  # (n, m)
    for _ in range(iters):
        # ||x - c||² = ||x||² - 2·x·c + ||c||², argmin over k
        cross = np.einsum("nms,mks->nmk", X3, cent)
        d2 = x_sq[:, :, None] - 2.0 * cross + (cent**2).sum(-1)[None, :, :]
        assign = d2.argmin(2)  # (n, m)
        for j in range(m):
            sums = np.zeros((n_centroids, sub_d))
            np.add.at(sums, assign[:, j], X3[:, j])
            counts = np.bincount(assign[:, j], minlength=n_centroids)
            nz = counts > 0
            cent[j, nz] = sums[nz] / counts[nz, None]
    return cent


#: session-scoped IVF centroid memo — same key discipline as
#: _PQ_CODEBOOK_MEMO (file-backed corpora only; see cosine_topk_pq).
_IVF_CENTROID_MEMO: dict = {}


def _plan_hash(emb: DataFrame) -> str | None:
    """Semantic-plan identity for the artifact/memo keys (code-review
    r7: files+params alone collide for a filtered/transformed frame
    over the same files — a mistrained index would be served silently,
    with recall quietly degraded). None → no safe identity."""
    from ..artifacts import plan_identity

    try:
        return plan_identity(emb)
    except Exception:
        return None


def _index_artifact_path(input_files, params, spark=None) -> str | None:
    """Disk location for a trained index artifact (centroids / PQ
    codebooks), keyed by the SOURCE fingerprint — local path + size +
    mtime of every input file — plus the training params and the
    frame's semantic plan hash (r7, the bucketed-layout discipline
    applied to ANN training): a production index trains once and
    serves many sessions, and any corpus regeneration changes the
    fingerprint so a stale model can never be served. Returns None
    (train fresh, no persistence) when any input is non-local or
    unstattable — no safe cross-session identity."""
    import os
    import tempfile

    from ..artifacts import stat_fingerprint

    if not input_files:
        return None
    fp = stat_fingerprint(input_files, extra=params, spark=spark)
    if fp is None:
        return None
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_index_artifacts",
        fp + ".npz",
    )


def _index_artifact_load(path, names):
    from ..artifacts import load_npz

    return load_npz(path, names)


def _index_artifact_save(path, **arrays) -> None:
    from ..artifacts import atomic_save_npz

    atomic_save_npz(path, **arrays)


#: corpus row counts memoized per (app, files, plan) — index sizing
#: needs |corpus| once per corpus, not one count job per search.
_CORPUS_COUNT_MEMO: dict = {}

#: fallback count cache for frames with NO file/plan identity
#: (in-memory frames, truncated plans): keyed on the caller's
#: DataFrame wrapper object itself via weak reference, so the entry
#: dies with the wrapper — no id()-reuse hazard, naturally
#: app-scoped, and (ADVICE r9) no monkey-attached attribute on the
#: DataFrame, which a future PySpark adding __slots__ or a
#: connect-mode proxy dropping attrs would silently break. Each value
#: is a {variant: n} dict (see _corpus_count's variant rationale).
_FRAME_COUNT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _corpus_count(
    p: DataFrame, emb: DataFrame, input_files, ph, variant: str
) -> int:
    """|corpus| for adaptive index sizing, memoized alongside the
    trained models (same identity: files + canonicalized plan, PLUS
    the counted-frame ``variant`` — r8 code-review: IVF counts the
    full prepared frame while IVFPQ counts the nrm>0-filtered one,
    and a shared key would let whichever ran first poison the
    other's geometry on a corpus with zero-norm vectors)."""
    key = (
        (
            emb.sparkSession.sparkContext.applicationId,
            tuple(sorted(input_files)),
            ph,
            variant,
        )
        if input_files and ph is not None
        else None
    )
    n = _CORPUS_COUNT_MEMO.get(key) if key else None
    if n is None and key is None:
        # no file/plan identity (in-memory frame, truncated plan):
        # fall back to the weak-keyed per-wrapper cache (ADVICE r8:
        # the unmemoized path re-ran a full corpus scan on EVERY
        # invocation — a regression vs the old fixed-geometry
        # defaults which ran zero extra jobs). Weakly keyed on the
        # caller's DataFrame wrapper, so the entry dies with the
        # wrapper — no id()-reuse hazard, naturally app-scoped.
        try:
            n = _FRAME_COUNT_CACHE.get(emb, {}).get(variant)
        except TypeError:
            n = None  # wrapper not weakref-able: degrade to no memo
    if n is None:
        n = p.count()
        if key:
            memo_put(_CORPUS_COUNT_MEMO, key, n, cap=64)
        else:
            try:
                cache = _FRAME_COUNT_CACHE.get(emb)
                if cache is None:
                    cache = {}
                    _FRAME_COUNT_CACHE[emb] = cache
                cache[variant] = n
            except Exception:
                pass
    return n


def ivf_sizing(n_rows: int) -> tuple[int, int]:
    """Scale-adaptive IVF geometry (VERDICT r07 item 4): ``n_cells ≈
    √N`` (the classic IVF rule — cell population ≈ √N keeps both the
    assignment cost per row and the per-probe candidate list at
    O(√N)) clamped to [8, 256] (the upper clamp bounds the JVM
    assignment expression — one distance term per centroid — and 256
    cells × 64 samples/cell stays inside the 16384-row training
    sample), and ``n_probe = ⌈3·n_cells/8⌉`` (fixed ~37.5 %
    cell-fraction probe). Fixed (16, 4) measured recall@3 0.93 → 0.62
    from sf0.01 → sf0.1 — at 100× the geometry, not a bug, breaches
    any floor; the r8 √N rule with a 25 % probe fixed the cells but
    left the PROBE ceiling binding before the rerank budget (VERDICT
    r08 item 4: IVFADC+R recall@5 dipped 0.76/0.72/0.68/0.74 across
    sf0.001/0.01/0.1/sf1 — the exact re-rank can only reorder
    candidates the probed cells surfaced). At 3/8 the measured rerank
    curve is monotone-or-flat in N: 0.80/0.80/0.80/0.838 (same
    4-point sweep; 1/2 buys 0.90+ but non-monotonically and at ~33 %
    more candidate volume — 3/8 is the knee). Pinned in
    tests/test_r8_fixes.py and tests/test_r9_fixes.py."""
    n_cells = max(8, min(256, int(round(n_rows**0.5))))
    n_probe = max(1, -(-3 * n_cells // 8))
    return n_cells, n_probe


def _ivf_centroids(
    emb: DataFrame,
    p: DataFrame,
    input_files,
    ph,
    n_cells: int,
    sample_limit: int,
    kmeans_iters: int,
) -> list[list[float]] | None:
    """Train-or-load the IVF centroids — session memo → persisted
    artifact → seeded-sample KMeans fit — shared by the query-time
    operator (:func:`cosine_topk_ivf`) and the index BUILD
    (:func:`build_ivf_index`) so both serve bit-identical geometry
    for the same (corpus fingerprint, params). Returns None for an
    empty corpus."""
    import numpy as np

    memo_key = (
        (
            emb.sparkSession.sparkContext.applicationId,
            tuple(sorted(input_files)),
            ph,
            n_cells,
            sample_limit,
            kmeans_iters,
        )
        if input_files and ph is not None
        else None
    )
    centers = _IVF_CENTROID_MEMO.get(memo_key) if memo_key else None
    artifact = (
        _index_artifact_path(
            input_files,
            ("ivf", ph, n_cells, sample_limit, kmeans_iters),
            spark=emb.sparkSession,
        )
        if ph is not None
        else None
    )
    if centers is None:
        disk = _index_artifact_load(artifact, ["centers"])
        if disk is not None:
            centers = [list(map(float, c)) for c in disk[0]]
    if centers is None:
        sample = np.array(
            p.select("v").limit(sample_limit).toArrow().column("v").to_pylist(),
            dtype=np.float64,
        )
        if len(sample) == 0:
            return None
        cent = _lloyd(
            sample, n_cells, kmeans_iters, np.random.RandomState(42), pp_init=True
        )
        centers = [list(map(float, c)) for c in cent]
        _index_artifact_save(artifact, centers=cent)
    if memo_key is not None:
        memo_put(_IVF_CENTROID_MEMO, memo_key, centers, cap=16)
    return centers


def cosine_topk_ivf(
    emb: DataFrame,
    query_pred,
    k: int = 3,
    n_cells: int | None = None,
    n_probe: int | None = None,
    sample_limit: int = 16384,
    kmeans_iters: int = 10,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans-learned centroids partition
    the corpus into cells; each query searches its ``n_probe`` nearest
    cells (n_probe=1 is the fastest/lowest-recall point; more probes
    trade candidate volume for recall).

    vs sign-LSH: centroids adapt to the data distribution, so cell
    populations are balanced even when vectors cluster — at 100 TB the
    cell id becomes the partition key of a bucketed table and each
    query touches ``n_probe`` buckets. Training fits on a seeded
    ``sample_limit``-row sample (same bound as the PQ path): the index
    BUILD must never iterate over the full corpus — a full-corpus fit
    is the bottleneck the index exists to avoid. The fit itself is the
    shared driver-side vectorized ``_lloyd`` over the collected sample
    (a distributed KMeans on a ≤16k-row sample costs dozens of
    scheduler round-trips for no benefit — measured 3.4 s → <1 s), and
    centroids are memoized per corpus exactly like the PQ codebooks.
    Assignment + scoring are one Arrow-batched vectorized pass over
    the corpus (r9 — see the in-body comment: the prior JVM
    higher-order-function formulation made the approximate index 5×
    slower than the exact BLAS scan at sf1); the broadcast carries
    the query matrix, the centroids, and the per-query probed-cell
    mask, and the shuffle stays O(|Q|·k) rows per batch. Zero-norm
    vectors are excluded from both sides (their cosine is undefined —
    the same contract as the arrow/PQ paths). Not oracle-replayable
    (iterative training) → registered via its recall-floor audit; the
    test contract is recall@k vs ``cosine_topk_bruteforce``.
    """
    import numpy as np

    p = _prepared(emb)
    try:
        input_files = emb.inputFiles()
    except Exception:
        input_files = []
    ph = _plan_hash(emb)
    if n_cells is None or n_probe is None:
        auto_cells, auto_probe = ivf_sizing(
            _corpus_count(p, emb, input_files, ph, "all")
        )
        n_cells = auto_cells if n_cells is None else n_cells
        n_probe = auto_probe if n_probe is None else n_probe
    centers = _ivf_centroids(
        emb, p, input_files, ph, n_cells, sample_limit, kmeans_iters
    )
    if centers is None:
        return _empty_topk(p)

    # Scoring (r9): Arrow-batched masked matmul — the cosine_topk_arrow
    # kernel with a probed-cell mask. The previous JVM formulation
    # computed the full centroid ranking per CORPUS row as a
    # higher-order-function expression (141 HOF distances + array_sort
    # per row at sf1) and then HOF dot products over every
    # (query, same-cell candidate) join pair; measured at sf1 that
    # made the APPROXIMATE index 5× slower than the exact BLAS scan
    # (17.4 s vs 3.3 s) — an index that loses to brute force is not an
    # index. Here cell assignment and candidate scoring are one
    # vectorized pass per Arrow batch (assignment via the expanded
    # ‖c−cent‖² argmin, constant ‖c‖² dropped; scoring one |Q|×B
    # matmul), and each batch emits only rows that could still make
    # the global top-k — O(|Q|·k) shuffle rows per batch, same as the
    # exact kernel. At 100 TB the assignment half is write-once: the
    # cell id is computed at index-BUILD time into a cell-bucketed
    # layout and query-time scans prune to probed buckets; this
    # operator's query-time assignment exists because the local
    # corpus is not pre-bucketed (the old plan recomputed it per call
    # too, just 100× slower). Per-query probes use the same driver-
    # side stable-argsort rule as the IVFPQ path (ties → lowest cell,
    # matching the old (dist, cell) struct-sort tie-break).
    cent = np.array(centers, dtype=np.float64)
    q_rows = _bounded_query_rows(
        p.filter(F.col("nrm") > 0).select("vec_id", "v", "nrm"), query_pred
    )
    if not q_rows:
        return _empty_topk(p)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_raw = np.array([r["v"] for r in q_rows], dtype=np.float64)
    q_mat = q_raw / np.array(
        [r["nrm"] for r in q_rows], dtype=np.float64
    )[:, None]
    qd2 = ((q_raw[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, kind="stable", axis=1)[:, :n_probe]
    allowed = np.zeros((len(q_ids), len(cent)), dtype=bool)
    np.put_along_axis(allowed, probes, True, axis=1)
    bq = emb.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, cent, allowed)
    )

    def score(batches):
        import pandas as pd

        ids, qn, cc, allow = bq.value
        cnorm2 = (cc**2).sum(1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(pdf["v"].to_numpy())
            cn = pdf["nrm"].to_numpy(dtype=np.float64)
            cell = (cnorm2[None, :] - 2.0 * (c @ cc.T)).argmin(1)
            s = qn @ (c / cn[:, None]).T  # |Q| × B
            s[~allow[:, cell]] = -np.inf  # outside probed cells
            s[ids[:, None] == cand_ids[None, :]] = -np.inf  # self-match
            r = np.round(s, 6)
            finite = np.isfinite(r)
            kk = min(k, r.shape[1])
            kth = -np.partition(-r, kk - 1, axis=1)[:, kk - 1]
            qi, ci = np.nonzero(finite & (r >= kth[:, None]))
            yield pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "neighbor": cand_ids[ci],
                    "cosine": r[qi, ci],
                }
            )

    part = p.filter(F.col("nrm") > 0).mapInPandas(
        score, "query_id long, neighbor long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "neighbor",
            "cosine",
        )
    )


def _ivf_layout_dir(input_files, params, spark) -> str | None:
    """Disk location for the cell-bucketed IVF SERVING layout, keyed
    by the same corpus fingerprint discipline as the .npz model
    artifacts (:func:`_index_artifact_path`): corpus regeneration
    changes the fingerprint, so a stale layout can never be served.
    None when the corpus has no safe cross-session identity — the
    caller must then pass an explicit ``index_dir``."""
    import tempfile

    from ..artifacts import stat_fingerprint

    if not input_files:
        return None
    fp = stat_fingerprint(input_files, extra=params, spark=spark)
    if fp is None:
        return None
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_layout", fp
    )


def build_ivf_index(
    emb: DataFrame,
    index_dir: str | None = None,
    n_cells: int | None = None,
    sample_limit: int = 16384,
    kmeans_iters: int = 10,
) -> str | None:
    """IVF index BUILD (VERDICT r9 item 3): materialize the corpus
    into a cell-partitioned parquet layout so query-time scans prune
    to the probed cells instead of re-assigning every row per call.

    This is the write-once half of the 100 TB IVF story the query-time
    operator's docstring promises: at scale the corpus is assigned to
    its KMeans cell ONCE at ingest and written
    ``partitionBy("cell")`` — a directory per cell (≤256 cells by the
    ``ivf_sizing`` clamp, each holding arbitrarily many part files),
    which is exactly the layout Hive-style partition pruning
    understands. A query probing ``n_probe`` cells reads n_probe
    directories and Spark's scan shows the pruning in the plan
    (PartitionFilters on ``cell``) — the other cells are never
    listed, opened, or decoded.

    Centroids come from :func:`_ivf_centroids` — the identical
    memo → artifact → seeded-sample-fit chain the query-time operator
    uses — so a layout built here and a :func:`cosine_topk_ivf` call
    on the same corpus share bit-identical geometry (pair-set parity
    is pinned in tests/test_r10_fixes.py). Cell assignment is the same
    expanded ``‖c−cent‖²`` argmin the Arrow kernel computes, run once
    per row as a vectorized Arrow pass. Zero-norm vectors are
    excluded at build (undefined cosine — they can never be
    neighbors; same contract as every ANN path here).

    Returns the layout directory (fingerprint-derived under the
    system temp dir when ``index_dir`` is None), or None for an empty
    corpus. Idempotent: an existing fingerprint-fresh layout is
    reused without a write."""
    import numpy as np

    p = _prepared(emb)
    try:
        input_files = emb.inputFiles()
    except Exception:
        input_files = []
    ph = _plan_hash(emb)
    if n_cells is None:
        n_cells, _ = ivf_sizing(
            _corpus_count(p, emb, input_files, ph, "all")
        )
    if index_dir is None:
        index_dir = _ivf_layout_dir(
            input_files,
            ("ivf-layout", ph, n_cells, sample_limit, kmeans_iters),
            spark=emb.sparkSession,
        )
    if index_dir is None:
        raise ValueError(
            "corpus has no stable fingerprint (non-file source or "
            "truncated plan); pass index_dir explicitly"
        )
    corpus_dir = os.path.join(index_dir, "corpus")
    cent_path = os.path.join(index_dir, "centroids.npz")
    if os.path.exists(os.path.join(corpus_dir, "_SUCCESS")) and os.path.exists(
        cent_path
    ):
        return index_dir

    centers = _ivf_centroids(
        emb, p, input_files, ph, n_cells, sample_limit, kmeans_iters
    )
    if centers is None:
        return None
    cent = np.array(centers, dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast(cent)

    def assign(batches):
        import pandas as pd

        cc = bc.value
        cnorm2 = (cc**2).sum(1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.stack(pdf["v"].to_numpy())
            cell = (cnorm2[None, :] - 2.0 * (c @ cc.T)).argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "nrm": pdf["nrm"],
                    "cell": cell.astype("int32"),
                }
            )

    assigned = p.filter(F.col("nrm") > 0).mapInPandas(
        assign, "vec_id long, v array<double>, nrm double, cell int"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(corpus_dir)
    _index_artifact_save(cent_path, centers=cent)
    return index_dir


def cosine_topk_ivf_bucketed(
    emb: DataFrame,
    query_pred,
    k: int = 3,
    n_cells: int | None = None,
    n_probe: int | None = None,
    sample_limit: int = 16384,
    kmeans_iters: int = 10,
    index_dir: str | None = None,
) -> DataFrame:
    """IVF served FROM the cell-bucketed layout (build-once,
    serve-many): ensure the :func:`build_ivf_index` layout exists for
    this corpus, then answer queries by scanning ONLY the probed
    cells' partitions.

    vs :func:`cosine_topk_ivf` (same centroids, same probe rule, same
    Arrow scoring — pair-for-pair identical results, pinned in
    tests/test_r10_fixes.py): the query-time operator re-assigns
    every corpus row to its cell on every call because the local
    corpus is not pre-bucketed; here assignment happened once at
    BUILD, so the serve scan (a) reads only
    ``|union of per-query probes|`` of the ``n_cells`` partition
    directories — Hive partition pruning, visible as
    PartitionFilters in the plan — and (b) skips the per-row argmin
    entirely (the ``cell`` column is storage). At 100 TB with
    cell ≈ corpus/√N this is the difference between scanning 100 TB
    and scanning ``n_probe/√N`` of it (~37.5 % at the r9 probe rule —
    and for a SINGLE query exactly n_probe directories).

    The probed-cell mask stays per-query: a candidate living in a
    cell only counts for the queries that probed that cell, exactly
    as in the query-time kernel, so batching many queries into one
    pruned scan changes the I/O, never the result."""
    import numpy as np

    spark = emb.sparkSession
    p = _prepared(emb)
    try:
        input_files = emb.inputFiles()
    except Exception:
        input_files = []
    ph = _plan_hash(emb)
    if n_cells is None or n_probe is None:
        auto_cells, auto_probe = ivf_sizing(
            _corpus_count(p, emb, input_files, ph, "all")
        )
        n_cells = auto_cells if n_cells is None else n_cells
        n_probe = auto_probe if n_probe is None else n_probe
    index_dir = build_ivf_index(
        emb,
        index_dir=index_dir,
        n_cells=n_cells,
        sample_limit=sample_limit,
        kmeans_iters=kmeans_iters,
    )
    if index_dir is None:
        return _empty_topk(p)
    loaded = _index_artifact_load(
        os.path.join(index_dir, "centroids.npz"), ["centers"]
    )
    if loaded is None:
        raise ValueError(f"IVF layout at {index_dir} has no centroids.npz")
    cent = np.asarray(loaded[0], dtype=np.float64)

    q_rows = _bounded_query_rows(
        p.filter(F.col("nrm") > 0).select("vec_id", "v", "nrm"), query_pred
    )
    if not q_rows:
        return _empty_topk(p)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_raw = np.array([r["v"] for r in q_rows], dtype=np.float64)
    q_mat = q_raw / np.array(
        [r["nrm"] for r in q_rows], dtype=np.float64
    )[:, None]
    # identical probe rule to cosine_topk_ivf: full squared distance,
    # stable argsort (ties → lowest cell id)
    qd2 = ((q_raw[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, kind="stable", axis=1)[:, :n_probe]
    allowed = np.zeros((len(q_ids), len(cent)), dtype=bool)
    np.put_along_axis(allowed, probes, True, axis=1)

    # THE point of the layout: the scan lists/opens only the probed
    # cells' directories (union across the query batch)
    probed_cells = sorted({int(c) for c in probes.ravel()})
    corpus = spark.read.parquet(
        os.path.join(index_dir, "corpus")
    ).filter(F.col("cell").isin(probed_cells))

    bq = spark.sparkContext.broadcast((q_ids, q_mat, allowed))

    def score(batches):
        import pandas as pd

        ids, qn, allow = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(pdf["v"].to_numpy())
            cn = pdf["nrm"].to_numpy(dtype=np.float64)
            cell = pdf["cell"].to_numpy(dtype=np.int64)  # storage, no argmin
            s = qn @ (c / cn[:, None]).T  # |Q| × B
            s[~allow[:, cell]] = -np.inf  # outside probed cells
            s[ids[:, None] == cand_ids[None, :]] = -np.inf  # self-match
            r = np.round(s, 6)
            finite = np.isfinite(r)
            kk = min(k, r.shape[1])
            kth = -np.partition(-r, kk - 1, axis=1)[:, kk - 1]
            qi, ci = np.nonzero(finite & (r >= kth[:, None]))
            yield pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "neighbor": cand_ids[ci],
                    "cosine": r[qi, ci],
                }
            )

    part = corpus.mapInPandas(
        score, "query_id long, neighbor long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "neighbor",
            "cosine",
        )
    )


def cosine_topk_ivfpq_rerank(
    emb: DataFrame,
    query_pred,
    k: int = 3,
    rerank_factor: int = 4,
    **ivfpq_kwargs,
) -> DataFrame:
    """IVF-PQ with exact re-ranking (IVFADC+R, Jégou et al. 2011):
    the ADC pass returns a ``rerank_factor·k`` shortlist per query,
    then the TRUE vectors of just those candidates are rescored
    exactly and the top-k re-ranked on the exact rounded cosine.

    This is the standard fix for PQ quantization-resolution recall
    decay: the codes only need to land the true neighbors anywhere in
    the shortlist, and the exact pass orders them. Measured recall@5
    at defaults: 0.760/0.720/0.680/0.742 (sf0.001/0.01/0.1/sf1) vs
    plain ADC's 0.720/0.720/0.610/0.592 — the re-rank recovers the
    quantization loss up to the cell-probe ceiling (IVF exact recall
    with the same √N geometry measures ~0.70 at sf0.1, so the
    residual gap is which cells were probed, not code resolution;
    raise n_probe, not rerank_factor, to push past it).

    Scale shape: one extra column-pruned corpus scan — the shortlist
    (O(|Q|·rerank_factor·k) rows) broadcasts into an equi-join that
    fetches candidate vectors, the query matrix is already broadcast,
    and the exact rescoring touches only shortlist pairs. Output
    contract is identical to every other top-k operator (query_id,
    rnk, neighbor, cosine — exact rounded cosine, oracle-comparable
    per pair)."""
    short = cosine_topk_ivfpq(
        emb, query_pred, k=k * rerank_factor, **ivfpq_kwargs
    )
    p = _prepared(emb).filter(F.col("nrm") > 0)
    cand = short.select("query_id", "neighbor")
    c = p.select(
        F.col("vec_id").alias("neighbor"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    q = p.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        F.broadcast(cand)
        .join(c, "neighbor")
        .join(F.broadcast(q), "query_id")
    )
    return _ranked_topk(pairs, k)


def cosine_topk_arrow(
    emb: DataFrame, query_pred, k: int = 5, query_cap: int = MAX_QUERY_ROWS
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy scoring — the
    high-throughput formulation of ``cosine_topk_bruteforce`` (same
    results, same oracle).

    Shape: the (small, by contract) query set is collected and
    broadcast as a dense normalized matrix; candidates stream through
    ``mapInPandas``, each Arrow batch scored with ONE BLAS matmul
    (|Q|×d @ d×B) instead of |Q|·B interpreted higher-order-function
    dot products. Each batch emits only the rows that could still make
    the global top-k — every candidate whose ROUNDED cosine ties or
    beats the batch's k-th best per query — so the shuffle carries
    O(|Q|·k) rows per batch, never O(|Q|·B). A final window ranks the
    per-batch survivors exactly like the oracle (rounded cosine desc,
    neighbor asc).

    At 100 TB: candidates never leave their partitions, the broadcast
    is |Q|·d·8 bytes, and per-executor work is pure vectorized BLAS —
    this is the pattern to beat before reaching for IVF/LSH recall
    trade-offs.
    """
    import numpy as np
    import pandas as pd

    p = _prepared(emb)
    q_rows = _bounded_query_rows(
        p.filter(F.col("nrm") > 0).select("vec_id", "v", "nrm"),
        query_pred,
        query_cap,
    )
    if not q_rows:
        return _ranked_topk(p.limit(0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), F.col("vec_id").alias("neighbor"),
            F.col("v").alias("cv"), F.col("nrm").alias("cn"),
        ), k)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in q_rows], dtype=np.float64)
    q_mat /= np.array([r["nrm"] for r in q_rows], dtype=np.float64)[:, None]
    bq = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    def score(batches):
        ids, qn = bq.value
        nq = len(ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(pdf["v"].to_numpy())
            cn = pdf["nrm"].to_numpy(dtype=np.float64)
            s = qn @ (c / cn[:, None]).T  # nq × B
            s[ids[:, None] == cand_ids[None, :]] = -np.inf  # self-match
            r = np.round(s, 6)
            kk = min(k, r.shape[1])
            # k-th best rounded score per query; keep ties so the
            # global neighbor-id tiebreak stays exact vs the oracle.
            kth = -np.partition(-r, kk - 1, axis=1)[:, kk - 1]
            qi, ci = np.nonzero(r >= kth[:, None])
            yield pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "neighbor": cand_ids[ci],
                    "cosine": r[qi, ci],
                }
            )

    part = p.filter(F.col("nrm") > 0).mapInPandas(
        score, "query_id long, neighbor long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"), "neighbor", "cosine"
        )
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b) within
    sign-LSH buckets — the vector analog of MinHash-LSH text dedup:
    candidate generation is the same-bucket equi-join, verification is
    the exact (rounded) cosine against ``threshold``."""
    p = _prepared(emb).withColumn("bkt", lsh_bucket(F.col("v")))
    a = p.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bkt",
    )
    b = p.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "bkt",
    )
    pairs = a.join(b, on="bkt").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk_lsh(emb: DataFrame, query_pred, k: int = 3) -> DataFrame:
    """Approximate cosine top-k within the query's sign-LSH bucket.
    A same-bucket equi-join replaces the full-corpus scan; queries
    whose bucket holds no other vector produce no rows (identical
    semantics in the oracle)."""
    p = _prepared(emb).withColumn("bkt", lsh_bucket(F.col("v")))
    q = p.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bkt",
    )
    c = p.select(
        F.col("vec_id").alias("neighbor"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "bkt",
    )
    pairs = q.join(c, on="bkt").filter(F.col("query_id") != F.col("neighbor"))
    return _ranked_topk(pairs, k)


#: session-scoped PQ codebook memo keyed by (appId, corpus files,
#: params) — see cosine_topk_pq docstring.
_PQ_CODEBOOK_MEMO: dict = {}


def cosine_topk_pq(
    emb: DataFrame,
    query_pred,
    k: int = 3,
    m: int = 32,
    n_centroids: int = 64,
    sample_limit: int = 16384,
    kmeans_iters: int = 10,
    query_cap: int | None = None,
) -> DataFrame:
    """Product-quantization ADC top-k — the memory-bounded ANN tier.

    Index build: vectors are unit-normalized (cosine ≡ dot), split
    into ``m`` subvectors; each subspace gets ``n_centroids`` Lloyd-
    iterated centroids trained driver-side on a bounded sample (seed
    42, fixed iteration count). Every corpus vector is then encoded as
    ``m`` one-byte codes via one broadcast of the codebooks — at the
    defaults a 64-dim float32 vector (256 B) becomes 32 B of codes, an
    8× compression, and recall@5 ≈ 0.78 even on near-orthogonal random
    vectors (real embedding corpora cluster, which quantizes better).
    The compression is the difference between "embeddings fit in
    executor memory" and "they do not" at 100 TB.

    Search: asymmetric distance computation — each query builds an
    ``m × n_centroids`` table of subspace dot products against the
    codebooks; a candidate's approximate cosine is ``m`` table lookups
    summed, no float-vector access at all. Per Arrow batch the scoring
    is one numpy gather+sum; only each batch's per-query top-k
    survivors shuffle to the final exact window rank.

    Iterative training + quantization error make this rows-only (no
    SQL oracle); the test contract is recall@k against the exact
    brute-force result.
    """
    import numpy as np
    import pandas as pd

    p = _prepared(emb).filter(F.col("nrm") > 0)
    unit = p.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("u"),
    )

    # Codebooks are a pure function of (corpus sample, params); train
    # once per session per corpus — a production PQ index trains once
    # and serves many searches, and the memo reproduces that shape.
    try:
        input_files = emb.inputFiles()
    except Exception:
        input_files = []
    ph = _plan_hash(emb)
    if input_files and ph is not None:
        memo_key = (
            emb.sparkSession.sparkContext.applicationId,
            tuple(sorted(input_files)),
            ph,
            m,
            n_centroids,
            sample_limit,
            kmeans_iters,
        )
        codebooks = _PQ_CODEBOOK_MEMO.get(memo_key)
    else:
        # Non-file-backed frame: no stable cross-call identity, so train
        # fresh and do NOT insert into the memo — an unmatchable sentinel
        # key would grow the module-level dict without bound. (File-backed
        # keys can still serve stale codebooks if files are rewritten in
        # place under the same names; acceptable for a session-scoped memo.)
        memo_key = None
        codebooks = None
    artifact = (
        _index_artifact_path(
            input_files,
            ("pq", ph, m, n_centroids, sample_limit, kmeans_iters),
            spark=emb.sparkSession,
        )
        if ph is not None
        else None
    )
    if codebooks is None:
        disk = _index_artifact_load(artifact, ["codebooks"])
        if disk is not None:
            codebooks = disk[0]
    if codebooks is None:
        # Arrow transfer: a Py4J collect of array<double> rows costs
        # ~2× the Arrow path even at 16k rows (row-at-a-time boxing)
        sample = np.array(
            unit.select("u").limit(sample_limit).toArrow().column("u").to_pylist(),
            dtype=np.float64,
        )
        if len(sample) == 0:
            return _empty_topk(unit)
        codebooks = _train_pq(
            sample, m, n_centroids, kmeans_iters, np.random.RandomState(42)
        )
        _index_artifact_save(artifact, codebooks=codebooks)
    if memo_key is not None:
        memo_put(_PQ_CODEBOOK_MEMO, memo_key, codebooks, cap=16)
    sub_d = codebooks.shape[2]

    spark = emb.sparkSession
    bc_books = spark.sparkContext.broadcast(codebooks)

    q_rows = _bounded_query_rows(
        unit, query_pred, query_cap if query_cap is not None else _adc_query_cap(m, n_centroids)
    )
    if not q_rows:
        return _empty_topk(unit)
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.array([r["u"] for r in q_rows], dtype=np.float64)
    # ADC tables: for each query, dot of each subvector with each centroid
    tables = np.einsum(
        "qjs,jcs->qjc",
        q_mat.reshape(len(q_ids), m, sub_d),
        codebooks,
    )  # (|Q|, m, n_centroids)
    bc_q = spark.sparkContext.broadcast((q_ids, tables))

    def score_batches(batches):
        books = bc_books.value
        ids, tabs = bc_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["u"].tolist(), dtype=np.float64)
            cand_ids = pdf["vec_id"].to_numpy()
            # encode candidates: argmin L2 per subspace
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                Xj = X[:, j * sub_d : (j + 1) * sub_d]
                d2 = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            # ADC scores: (|Q|, B) via table gathers
            scores = np.zeros((len(ids), len(X)))
            for j in range(m):
                scores += tabs[:, j, :][:, codes[:, j]]
            out = []
            kk = min(k + 1, len(X))
            for qi, qid in enumerate(ids):
                row = scores[qi]
                top = np.argpartition(-row, kk - 1)[:kk]
                for ci in top:
                    if cand_ids[ci] != qid:
                        out.append((int(qid), int(cand_ids[ci]), float(row[ci])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor", "approx"])

    survivors = unit.mapInPandas(
        score_batches, schema="query_id long, neighbor long, approx double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor").asc()
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "neighbor",
            F.round("approx", 6).alias("cosine"),
        )
    )


#: session-scoped IVF-PQ index memo — same key discipline as the
#: IVF/PQ memos (file-backed corpora only).
_IVFPQ_MEMO: dict = {}


def cosine_topk_ivfpq(
    emb: DataFrame,
    query_pred,
    k: int = 3,
    n_cells: int | None = None,
    n_probe: int | None = None,
    m: int = 32,
    n_centroids: int = 64,
    sample_limit: int = 16384,
    kmeans_iters: int = 10,
    query_cap: int | None = None,
) -> DataFrame:
    """IVF-PQ composed index (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search" — the IVFADC layout): a KMeans coarse
    quantizer partitions unit vectors into ``n_cells`` cells, and PQ
    codebooks trained on the cell RESIDUALS (x − centroid) encode each
    vector as ``m`` one-byte codes. Residual encoding is the point of
    the composition: residual magnitudes are a fraction of vector
    magnitudes, so the same code budget quantizes with less error than
    whole-vector PQ, while the coarse cells cut the search space the
    way plain PQ cannot.

    Search (asymmetric, inner product over unit vectors): for each
    query, probe the ``n_probe`` nearest cells; a candidate's score is
    ``q·centroid[cell] + Σⱼ table[j, codeⱼ]`` where the ADC table is
    the query's subspace dots against the shared residual codebooks —
    m gathers per candidate, no float-vector access.

    Scale shape: training fits on a seeded ≤``sample_limit`` sample
    (never the corpus — the same bound as the sibling paths); search is
    ONE ``mapInPandas`` pass over the corpus with every model piece
    riding a broadcast — no join shuffle at all; only each batch's
    per-query top-k survivors (O(|Q|·k) rows per batch) shuffle to the
    final exact rank. At 100 TB the cell id becomes the partition key
    of a bucketed table and the pass prunes to ``n_probe`` buckets per
    query. Iterative training ⇒ rows-only registry entry; the test
    contract is recall@k vs ``cosine_topk_bruteforce``: probing ALL
    cells matches the plain PQ path (0.88 = 0.88 measured @ sf0.01
    defaults — residual encoding loses nothing), and fewer probes trade
    recall (0.52 @ 2/16, 0.64 @ 4/16 measured) for an
    ~n_cells/n_probe candidate-volume reduction — the knob plain PQ
    does not have.
    """
    import numpy as np
    import pandas as pd

    p = _prepared(emb).filter(F.col("nrm") > 0)
    unit = p.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("u"),
    )

    try:
        input_files = emb.inputFiles()
    except Exception:
        input_files = []
    ph = _plan_hash(emb)
    if n_cells is None or n_probe is None:
        auto_cells, auto_probe = ivf_sizing(
            _corpus_count(p, emb, input_files, ph, "nonzero")
        )
        n_cells = auto_cells if n_cells is None else n_cells
        n_probe = auto_probe if n_probe is None else n_probe
    memo_key = (
        (
            emb.sparkSession.sparkContext.applicationId,
            tuple(sorted(input_files)),
            ph,
            n_cells,
            m,
            n_centroids,
            sample_limit,
            kmeans_iters,
        )
        if input_files and ph is not None
        else None
    )
    model = _IVFPQ_MEMO.get(memo_key) if memo_key else None
    artifact = (
        _index_artifact_path(
            input_files,
            ("ivfpq", ph, n_cells, m, n_centroids, sample_limit, kmeans_iters),
            spark=emb.sparkSession,
        )
        if ph is not None
        else None
    )
    if model is None:
        disk = _index_artifact_load(artifact, ["centers", "codebooks"])
        if disk is not None:
            model = (disk[0], disk[1])
    if model is None:
        sample = np.array(
            unit.select("u").limit(sample_limit).toArrow().column("u").to_pylist(),
            dtype=np.float64,
        )
        if len(sample) == 0:
            return _empty_topk(unit)
        centers = _lloyd(
            sample, n_cells, kmeans_iters, np.random.RandomState(42), pp_init=True
        )
        # residuals w.r.t. the FITTED coarse quantizer, then PQ on them
        d2 = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        resid = sample - centers[d2.argmin(1)]
        codebooks = _train_pq(
            resid, m, n_centroids, kmeans_iters, np.random.RandomState(43)
        )
        model = (centers, codebooks)
        _index_artifact_save(artifact, centers=centers, codebooks=codebooks)
    if memo_key is not None:
        memo_put(_IVFPQ_MEMO, memo_key, model, cap=16)
    centers, codebooks = model
    sub_d = codebooks.shape[2]

    spark = emb.sparkSession
    bc_model = spark.sparkContext.broadcast((centers, codebooks))

    q_rows = _bounded_query_rows(
        unit, query_pred, query_cap if query_cap is not None else _adc_query_cap(m, n_centroids)
    )
    if not q_rows:
        return _empty_topk(unit)
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.array([r["u"] for r in q_rows], dtype=np.float64)
    qd2 = ((q_mat[:, None, :] - centers[None, :, :]) ** 2).sum(-1)  # (Q, cells)
    probed = np.argsort(qd2, axis=1)[:, :n_probe]  # (Q, n_probe)
    q_dot_c = q_mat @ centers.T  # (Q, cells)
    tables = np.einsum(
        "qjs,jcs->qjc", q_mat.reshape(len(q_ids), m, sub_d), codebooks
    )  # (Q, m, n_centroids)
    bc_q = spark.sparkContext.broadcast((q_ids, probed, q_dot_c, tables))

    def score_batches(batches):
        cents, books = bc_model.value
        ids, prb, qdc, tabs = bc_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["u"].tolist(), dtype=np.float64)
            cand_ids = pdf["vec_id"].to_numpy()
            cd2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            cell = cd2.argmin(1)  # (B,)
            R = X - cents[cell]
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                Rj = R[:, j * sub_d : (j + 1) * sub_d]
                dj = ((Rj[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = dj.argmin(1)
            scores = qdc[:, cell]  # (Q, B): q·centroid term
            for j in range(m):
                scores = scores + tabs[:, j, :][:, codes[:, j]]
            # candidates outside a query's probed cells are invisible
            mask = (prb[:, :, None] == cell[None, None, :]).any(1)  # (Q, B)
            mask &= ids[:, None] != cand_ids[None, :]  # no self-match
            scores = np.where(mask, scores, -np.inf)
            out = []
            kk = min(k, scores.shape[1])
            for qi, qid in enumerate(ids):
                row = scores[qi]
                top = np.argpartition(-row, kk - 1)[:kk]
                for ci in top:
                    if np.isfinite(row[ci]):
                        out.append((int(qid), int(cand_ids[ci]), float(row[ci])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor", "approx"])

    survivors = unit.mapInPandas(
        score_batches, schema="query_id long, neighbor long, approx double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor").asc()
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "neighbor",
            F.round("approx", 6).alias("cosine"),
        )
    )
