"""Deduplication operators: exact, MinHash+LSH, simhash, n-gram Jaccard.

Designed for the 100 TB shape:
- exact dedup is a hash-groupBy (one shuffle on the fingerprint, min-id
  winner — no sort, no window over the full table);
- MinHash LSH generates (band, bucket) keys and self-joins only within
  buckets, never the full cross product;
- candidate verification (exact Jaccard) runs only on LSH candidates.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from gr_tdigest_spark.operators.text import with_fingerprint

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_dup_pairs_minhash",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "near_dup_clusters",
    "winnow_overlap_pairs",
    "cluster_representatives",
    "dedup_keep_best",
    "near_dedup",
    "dedup_lines",
]


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Keep the smallest id per exact (normalized) text fingerprint.

    One shuffle on the fingerprint; survivors join back to rows. At
    scale this beats a window-over-everything: the aggregate combines
    map-side.

    NULL-text rows have no content identity, so they are neither
    duplicates of anything nor of each other — ALL pass through
    (previously the NULL fingerprint silently failed the survivor
    join and such rows vanished)."""
    fp = with_fingerprint(df, text_col, "__fp")
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    winners = fp.join(keep, [id_col, "__fp"], "leftsemi")
    nulls = fp.where(F.col("__fp").isNull())
    return winners.unionByName(nulls).drop("__fp")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    from gr_tdigest_spark.sketches.hashing import hash64

    s = " ".join(text.lower().split())
    if len(s) < k:
        return hash64(np.asarray([s], dtype=object)) if s else np.empty(0, np.uint64)
    sh = [s[i:i + k] for i in range(len(s) - k + 1)]
    return np.unique(hash64(np.asarray(sh, dtype=object)))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    out_col: str = "minhash",
) -> DataFrame:
    """Character-shingle MinHash signatures (array<long>, n_hashes slots).

    signature[i] = min over shingles of splitmix64(shingle_hash, seed=i) —
    one vectorized (shingles × hashes) min per doc."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        from gr_tdigest_spark.sketches.hashing import splitmix64

        seeds = np.arange(1, n_hashes + 1, dtype=np.uint64)
        out = []
        for txt in texts:
            if txt is None:
                out.append(None)
                continue
            h = _shingle_hashes(txt, shingle_k)
            if h.size == 0:
                out.append(None)
                continue
            # (n_shingles, n_hashes) permutation hashes → column minima
            with np.errstate(over="ignore"):
                perm = splitmix64(
                    h[:, None] ^ (seeds[None, :] * np.uint64(0x9E3779B97F4A7C15))
                )
            out.append(perm.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(id_col, text_col).withColumn(
        out_col, _sig(F.col(text_col))
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
    max_bucket_size: Optional[int] = 10_000,
    persist_signatures: bool = True,
) -> DataFrame:
    """Band the signatures and self-join within (band, bucket) — the
    standard LSH candidate generation. Output: (a, b) id pairs, a < b,
    deduplicated.

    ``max_bucket_size`` bounds the self-join fan-out: buckets above the
    cap are sub-split by a secondary id hash (see operators.skew), so a
    degenerate boilerplate bucket of size B costs
    O(B · max_bucket_size) pairs instead of O(B²). Pass ``None`` to
    disable (exact LSH semantics).

    ``persist_signatures`` (default True) caches the banded table in
    the skew guard's one-slot cache so the signature plan evaluates
    once (size aggregate + both self-join sides would otherwise run
    the signature UDF three times); False trades recompute for zero
    cache footprint."""
    n_hashes_col = F.size(F.col(sig_col))
    rows_per_band = F.floor(n_hashes_col / bands)
    banded = sigs.where(F.col(sig_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(
                    F.slice(
                        F.col(sig_col),
                        (b * rows_per_band + 1).cast("int"),
                        rows_per_band.cast("int"),
                    )
                ),
            )
        ).alias("__band", "__bucket"),
    )
    from gr_tdigest_spark.operators.skew import subsplit_oversized_buckets

    banded = subsplit_oversized_buckets(
        banded, ["__band", "__bucket"], "__id", max_bucket_size,
        persist_slot="minhash" if persist_signatures else None,
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__sub") == F.col("r.__sub"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact character-shingle Jaccard.
    Joins each side's text in (broadcast when small), computes the exact
    similarity in a vectorized UDF, filters by threshold."""
    d = docs.select(
        F.col(id_col).alias("__jid"), F.col(text_col).alias("__jtxt")
    )
    joined = (
        pairs.join(d.withColumnRenamed("__jid", "a").withColumnRenamed("__jtxt", "ta"), "a")
        .join(d.withColumnRenamed("__jid", "b").withColumnRenamed("__jtxt", "tb"), "b")
    )

    @F.pandas_udf(DoubleType())
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            if x is None or y is None:
                out[i] = 0.0
                continue
            ha = _shingle_hashes(x, shingle_k)
            hb = _shingle_hashes(y, shingle_k)
            if ha.size == 0 and hb.size == 0:
                out[i] = 1.0
                continue
            inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = ha.size + hb.size - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", _jac("ta", "tb"))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket_size: Optional[int] = 10_000,
    persist_signatures: bool = True,
) -> DataFrame:
    """Full MinHash→LSH→verify near-duplicate pipeline."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    cands = lsh_candidate_pairs(
        sigs, id_col, bands=bands, max_bucket_size=max_bucket_size,
        persist_signatures=persist_signatures,
    )
    return ngram_jaccard_pairs(
        cands, df, id_col, text_col, shingle_k, threshold
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: Optional[int] = 10_000,
    persist_signatures: bool = True,
) -> DataFrame:
    """Simhash near-dup candidates: split the 64-bit simhash into
    (max_hamming+1) blocks — any pair within the distance budget shares
    at least one exact block (pigeonhole), so the join is block-bucketed,
    never all-pairs. Verified with exact hamming distance (JVM-side
    bit_count).

    ``max_bucket_size`` sub-splits degenerate blocks (boilerplate text
    sharing a block value) to bound join fan-out; ``None`` disables.
    ``persist_signatures`` as in :func:`lsh_candidate_pairs` (the
    simhash UDF otherwise runs for the size aggregate and both join
    sides)."""
    from gr_tdigest_spark.operators.skew import subsplit_oversized_buckets
    from gr_tdigest_spark.operators.text import with_simhash

    blocks = max_hamming + 1
    sh = with_simhash(df.select(id_col, text_col), text_col, "__sh")
    width = 64 // blocks
    banded = sh.select(
        F.col(id_col).alias("__id"),
        F.col("__sh"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("__sh"), i * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                )
                for i in range(blocks)
            ])
        ).alias("__blk", "__val"),
    )
    banded = subsplit_oversized_buckets(
        banded, ["__blk", "__val"], "__id", max_bucket_size,
        persist_slot="simhash" if persist_signatures else None,
    )
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col("l.__val") == F.col("r.__val"))
            & (F.col("l.__sub") == F.col("r.__sub"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("a"),
            F.col("r.__id").alias("b"),
            F.bit_count(
                F.col("l.__sh").bitwiseXOR(F.col("r.__sh"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cands.where(F.col("hamming") <= max_hamming)


def near_dup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (id, cluster),
    ``cluster`` = the minimum id in the component (the canonical keeper
    a dedup pipeline retains).

    Min-label propagation: every node repeatedly adopts the minimum
    label in its neighborhood; converges in O(component diameter)
    rounds (near-dup components are shallow — pairs come from a
    similarity threshold, so diameters are small). Each round is one
    shuffle-join + aggregate on the EDGE table, never the corpus;
    lineage is truncated per round (localCheckpoint) so plans stay
    flat. The driver-side loop reads only a 1-row convergence count per
    round — the standard Spark iterative-algorithm shape (GraphX
    connected components does the same under the hood).
    """
    jsc = pairs.sparkSession.sparkContext._jsc

    def _cp(df):
        """localCheckpoint (eager) + the id of the EXACT cached RDD
        backing it (the LogicalRDD the checkpointed Dataset wraps), so
        each round can RELEASE the previous round's blocks — without
        this a long-lived driver making many clustering calls accretes
        one cached label table per round until GC. Reading the id off
        the returned plan (not a before/after diff of the session's
        persistent-RDD map) keeps concurrent checkpoints by other
        threads untouched."""
        out = df.localCheckpoint()
        try:
            rid = out._jdf.queryExecution().analyzed().rdd().id()
            ids = {int(rid)}
        except Exception:
            ids = set()  # unknown plan shape: safer to leak than to
            #              unpersist someone else's blocks
        return out, ids

    def _release(rdd_ids):
        sc = jsc.sc()
        for rid in rdd_ids:
            try:
                sc.unpersistRDD(rid, False)
            except Exception:
                pass  # already evicted / cleaned

    e = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("t"))
    edges, edge_ids = _cp(e.union(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct())

    labels, prev_ids = _cp(
        edges.select(F.col("s").alias("id")).distinct()
        .withColumn("label", F.col("id"))
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("t"), F.col("label").alias("nl")
                ),
                "t",
            )
            .groupBy("s")
            .agg(F.min("nl").alias("min_nbr"))
        )
        new_labels, new_ids = _cp(
            labels.join(nbr_min, labels["id"] == nbr_min["s"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("min_nbr", "label")
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the convergence count was the old table's last consumer;
        # new_labels is materialized (eager checkpoint), so the old
        # round's blocks can go now
        _release(prev_ids)
        labels, prev_ids = new_labels, new_ids
        if changed == 0:
            break
    if changed != 0:
        # silently returning would split one connected component into
        # several clusters (r2 advice) — surface it instead
        import warnings

        warnings.warn(
            f"near_dup_clusters did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); a component "
            "with diameter > max_iter is split across clusters. "
            "Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    # the returned table is its own (checkpointed) data — the edge
    # blocks are not referenced by it and can be released; the FINAL
    # label checkpoint must stay pinned (its lineage is truncated, so
    # unpersisting it would lose the result)
    _release(edge_ids)
    return labels.select(F.col("id"), F.col("label").alias("cluster"))


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_bucket_size: Optional[int] = 10_000,
    persist_fingerprints: bool = True,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints
    (text.with_winnow_fingerprints) — the substring-overlap /
    plagiarism detector: any shared run of ≥ w + k − 1 characters
    GUARANTEES a shared fingerprint, so contiguous copying cannot hide
    (unlike MinHash, which measures bag-of-shingles similarity).

    Same self-join discipline as the LSH family: explode fingerprints,
    join within the fingerprint bucket only (never all-pairs), with the
    secondary-hash sub-split guard on degenerate buckets (boilerplate
    shared by thousands of docs). Output: (a, b, shared_fps), a < b.

    ``persist_fingerprints`` (default True) caches the exploded
    (id, fingerprint) table — two int64s per fingerprint, ~2/(w+1) of
    the text's bytes — because the skew-guard size aggregate and both
    self-join sides would otherwise re-run the winnowing UDF (the
    expensive part) three times.  One-slot cache per operator family
    (operators.skew); pass False to trade recompute for zero cache
    footprint.
    """
    from gr_tdigest_spark.operators.skew import subsplit_oversized_buckets
    from gr_tdigest_spark.operators.text import with_winnow_fingerprints

    fps = with_winnow_fingerprints(
        df.select(id_col, text_col), text_col, "__wfp", k=k, w=w
    )
    ex = fps.select(
        F.col(id_col).alias("__id"), F.explode("__wfp").alias("__fp")
    )
    ex = subsplit_oversized_buckets(
        ex, ["__fp"], "__id", max_bucket_size,
        persist_slot="winnow" if persist_fingerprints else None,
    )
    a = ex.select(
        F.col("__id").alias("a"), "__fp", F.col("__sub").alias("__sub_a")
    )
    b = ex.select(
        F.col("__id").alias("b"), "__fp", F.col("__sub").alias("__sub_b")
    )
    pairs = (
        a.join(b, ["__fp"])
        .where((F.col("a") < F.col("b"))
               & (F.col("__sub_a") == F.col("__sub_b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
    return pairs


def cluster_representatives(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    order_col: Optional[str] = None,
    cluster_id_col: str = "id",
    cluster_col: str = "cluster",
    out_col: str = "rep_id",
) -> DataFrame:
    """Pick one representative document per near-dup cluster →
    ``(cluster, rep_id)``.

    ``clusters`` is :func:`near_dup_clusters` output (or any
    ``(id, cluster)`` labeling). The winner maximizes ``order_col``
    (e.g. a quality score or text length — the usual "keep the best /
    longest copy" dedup policy); ties break to the minimum id, so the
    choice is deterministic. ``order_col=None`` degenerates to the
    minimum id per cluster (the canonical-keeper convention the rest of
    the module uses, e.g. dedup_exact's min-id winner).

    Scale shape: both steps are map-side-combinable aggregates over a
    SKINNY ``(cluster, order_val, id)`` projection — never a window
    over the corpus, and the corpus' payload columns never shuffle.
    Rows whose ``order_col`` is NULL or float-NaN lose to any other row
    (Spark's max would otherwise crown NaN — the worst row must not win
    a keep-BEST election); a cluster where every row is NULL/NaN falls
    back to min-id among them (null-safe best match). On every path the
    winner is elected among ids PRESENT in ``df`` — stale cluster
    labels for since-removed rows can shift which member wins but can
    never elect a ghost.
    """
    from pyspark.sql.types import DoubleType, FloatType

    lab = clusters.select(
        F.col(cluster_id_col).alias("__kid"),
        F.col(cluster_col).alias("__kcl"),
    )
    if order_col is None:
        present = lab.join(
            df.select(F.col(id_col).alias("__kid")), "__kid", "leftsemi"
        )
        return present.groupBy(F.col("__kcl").alias(cluster_col)).agg(
            F.min("__kid").alias(out_col)
        )
    ord_c = F.col(order_col)
    if isinstance(df.schema[order_col].dataType, (DoubleType, FloatType)):
        ord_c = F.when(F.isnan(ord_c), F.lit(None)).otherwise(ord_c)
    skinny = df.select(
        F.col(id_col).alias("__kid"), ord_c.alias("__kord")
    ).join(lab, "__kid")
    best = skinny.groupBy("__kcl").agg(F.max("__kord").alias("__kbest"))
    return (
        skinny.join(best, "__kcl")
        # null-safe: a cluster whose every order value is NULL keeps
        # its min-id row rather than vanishing
        .where(F.col("__kord").eqNullSafe(F.col("__kbest")))
        .groupBy(F.col("__kcl").alias(cluster_col))
        .agg(F.min("__kid").alias(out_col))
    )


def dedup_keep_best(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    order_col: Optional[str] = None,
    cluster_id_col: str = "id",
    cluster_col: str = "cluster",
    reps: Optional[DataFrame] = None,
) -> DataFrame:
    """Materialize the deduplicated corpus: every row whose id is in no
    near-dup cluster, plus exactly one representative per cluster
    (:func:`cluster_representatives` — best ``order_col``, ties to min
    id; pass a precomputed ``reps`` (cluster, rep_id) table to skip
    re-electing). This is the step that turns pair/cluster DISCOVERY
    into the deduplicated dataset a pipeline actually trains on.

    Scale shape: representative election runs on a skinny projection;
    the corpus itself is then touched by ONE id-equi left-anti join
    against the edge-sized drop set (clustered ids minus winners) —
    broadcastable when the duplicate set is small, AQE-planned
    otherwise. One corpus scan, no union, no window.

    Contracts: rows with NULL id never match a cluster label and are
    always kept. Duplicate-id rows travel together (all kept or all
    dropped — anti joins never fan out).
    """
    if reps is None:
        reps = cluster_representatives(
            df, clusters, id_col, order_col, cluster_id_col, cluster_col
        )
    drop_ids = (
        clusters.select(F.col(cluster_id_col).alias(id_col))
        .distinct()
        .join(
            reps.select(F.col("rep_id").alias(id_col)), id_col,
            "left_anti",
        )
    )
    return df.join(drop_ids, id_col, "left_anti")


def near_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    order_col: Optional[str] = None,
    method: str = "minhash",
    **kwargs,
) -> DataFrame:
    """One-call near-duplicate dedup: candidate pairs (``method`` in
    {'minhash', 'simhash'}) → connected components → keep-best
    materialization. ``kwargs`` pass through to the pair generator
    (n_hashes/bands/threshold for minhash, max_hamming for simhash).

    Returns the deduplicated corpus with ``df``'s schema. The pair
    table is the only intermediate and is edge-sized (duplicates only);
    the corpus streams through once for signatures, once (skinny id +
    order projection) for the election when ``order_col`` is set, and
    once for the final keep anti-join — the 100 TB shape.
    """
    if method == "minhash":
        pairs = near_dup_pairs_minhash(df, id_col, text_col, **kwargs)
    elif method == "simhash":
        pairs = simhash_near_dups(df, id_col, text_col, **kwargs)
    else:
        raise ValueError(
            f"method must be 'minhash' or 'simhash', got {method!r}"
        )
    clusters = near_dup_clusters(pairs.select("a", "b"))
    return dedup_keep_best(df, clusters, id_col, order_col)


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    mode: str = "keep_first",
    max_count: Optional[int] = None,
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Corpus-level LINE deduplication — the C4/RefinedWeb boilerplate
    step that no per-document operator can express: a line's fate
    depends on every OTHER document containing it.

    Two rules:

    - ``mode='keep_first'`` (C4's rule): across the whole corpus, the
      first occurrence of each distinct line survives; every later
      occurrence is removed from its document.  "First" is the
      occurrence with the smallest ``(id, line_index)`` — a global,
      deterministic, partition-independent order (``id_col`` must be
      orderable, unique, and non-NULL for analyzed rows).
    - ``mode='drop_frequent'``: every occurrence of a line whose
      corpus frequency exceeds ``max_count`` is removed (navigation
      chrome, cookie banners, boilerplate headers) — including the
      first one.

    Line identity is the EXACT line string (documents split on
    ``\\n``); blank lines (empty after SQL ``trim`` — i.e. spaces
    only; a tab-only line counts as content) carry no content and are
    dropped from every rebuilt document.  Rebuilt text preserves original line
    text and order; a document left with no content lines gets NULL
    text.  Appends ``n_lines_kept`` / ``n_lines_removed``.

    Scale shape (what each mode shuffles at 100 TB):

    - Both modes explode to (id, idx, line) once and aggregate line
      frequencies/winners with map-side combine on the line's md5 —
      ≤ one skinny row per distinct line, immune to a boilerplate
      line occurring 10^9 times.
    - ``keep_first`` rejoins winners on the composite
      (line-hash, id, idx) — UNIQUE on both sides, so the join has no
      skew by construction (a window over the line hash would funnel
      every copy of a hot line through one task).  The exploded
      content shuffles ONCE by that composite and the one exchange
      feeds both the winner election and the rejoin (ReuseExchange),
      so the corpus is scanned/exploded/hashed a single time.
    - ``drop_frequent``'s frequent-line set is boilerplate-sized and
      broadcasts into an anti join (``broadcast_frequent=False`` for a
      pathologically low ``max_count``).
    - Document text moves through at most two content shuffles (the
      winner rejoin and the per-document rebuild) — the irreducible
      cost of an operator that rewrites documents from global line
      state.  The rebuild collects one (idx, line) array per document
      in an aggregation buffer, so per-DOCUMENT size must fit in task
      memory (documents are bounded in practice; a pathological
      multi-GB "document" should be split upstream) — per-CORPUS and
      per-LINE-frequency state stay bounded regardless.

    Rows with a NULL id cannot take part in a deterministic global
    order, so they PASS THROUGH unchanged (text untouched, NULL
    stats) and their lines neither claim first-occurrence slots nor
    count toward frequencies — mirroring the samplers' unjoinable-id
    contract.
    """
    if mode not in ("keep_first", "drop_frequent"):
        raise ValueError(
            f"dedup_lines mode must be keep_first/drop_frequent, "
            f"got {mode!r}"
        )
    if mode == "drop_frequent":
        if max_count is None or max_count < 1:
            raise ValueError(
                "dedup_lines mode='drop_frequent' needs max_count >= 1"
            )
    elif max_count is not None:
        raise ValueError("dedup_lines max_count only applies to "
                         "mode='drop_frequent'")

    analyzed = df.where(F.col(id_col).isNotNull())
    passthru = df.where(F.col(id_col).isNull()).select(
        "*",
        F.lit(None).cast("long").alias("n_lines_kept"),
        F.lit(None).cast("long").alias("n_lines_removed"),
    )

    lines = analyzed.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__idx", "__ln"
        ),
    )
    content = lines.where(F.trim("__ln") != "").withColumn(
        "__lh", F.md5(F.col("__ln").cast("binary"))
    )

    # mark every content row kept/removed with ONE join, then fold
    # kept count, removed count, AND the rebuilt text in ONE per-doc
    # aggregate — a separate totals pass + second join would shuffle
    # the corpus text an extra time for numbers this agg already sees
    if mode == "keep_first":
        # shuffle content ONCE by the unique composite and let BOTH
        # consumers (the winner election and the rejoin) read that one
        # exchange (Spark's ReuseExchange dedupes the identical
        # subtree): the corpus is scanned/exploded/hashed once instead
        # of twice.  Regime tradeoff: when the winners table is too
        # big to broadcast (corpus-scale distinct lines) the
        # sort-merge rejoin required this exchange anyway, so a full
        # corpus scan+explode+md5 pass is deleted outright; when
        # winners IS broadcastable the exchange replaces the second
        # scan — one content shuffle traded for re-scanning,
        # re-exploding and re-md5-ing every line (measured level at
        # sf0.1 and at a 10× holdout, and the exchange additionally
        # lets AQE size the rejoin partitions).  The winner election
        # aggregates PARTIALLY on the composite partitions (skinny
        # per-partition line winners) and only those cross the second,
        # line-keyed exchange — the skew-free properties are unchanged
        # (the composite is unique; per-line state is ≤ one row per
        # partition).
        content = content.repartition("__lh", id_col, "__idx")
        winners = content.groupBy("__lh").agg(
            F.min(F.struct(
                F.col(id_col).alias("i"), F.col("__idx").alias("x")
            )).alias("__w")
        ).select(
            "__lh",
            F.col("__w.i").alias(id_col), F.col("__w.x").alias("__idx"),
            F.lit(True).alias("__keep"),
        )
        marked = content.join(
            winners, on=["__lh", id_col, "__idx"], how="left"
        ).withColumn("__keep", F.col("__keep").isNotNull())
    else:
        frequent = (
            content.groupBy("__lh")
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > int(max_count))
            .select("__lh", F.lit(True).alias("__drop"))
        )
        if broadcast_frequent:
            frequent = F.broadcast(frequent)
        marked = content.join(
            frequent, on="__lh", how="left"
        ).withColumn("__keep", F.col("__drop").isNull()).drop("__drop")

    kept = F.col("__keep")
    stats = marked.groupBy(id_col).agg(
        F.sum(kept.cast("long")).alias("n_lines_kept"),
        F.sum((~kept).cast("long")).alias("n_lines_removed"),
        # collect_list skips NULL entries, so only kept rows land in
        # the rebuild array
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    kept,
                    F.struct(F.col("__idx").alias("x"),
                             F.col("__ln").alias("ln")),
                ))),
                lambda s: s["ln"],
            ),
        ).alias("__new_text"),
    )
    out = (
        analyzed.join(stats, on=id_col, how="left")
        .withColumn(
            "n_lines_kept",
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "n_lines_removed",
            F.coalesce(F.col("n_lines_removed"), F.lit(0)).cast("long"),
        )
        .withColumn(
            text_col,
            F.when(F.col("n_lines_kept") > 0, F.col("__new_text")),
        )
        .drop("__new_text")
    )
    return out.unionByName(passthru)
