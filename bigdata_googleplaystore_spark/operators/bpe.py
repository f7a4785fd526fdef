"""Distributed BPE (byte-pair-encoding) merge learning.

The tokenizer-training step of an LLM data pipeline: learn the top-N BPE
merges from a corpus. Follows the classic word-frequency formulation
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"): training operates on the WORD-FREQUENCY table, not the
raw corpus — the corpus collapses to |vocab| rows in one aggregation, and
every merge iteration then works on that (comparatively tiny) frame.

Scale shape at 100 TB:
- the corpus is touched exactly once (tokenize -> groupBy word), the one
  unavoidable shuffle, with map-side partial aggregation;
- each merge iteration is a groupBy over the vocab frame (millions of
  rows, not billions) plus a LIMIT 1 collect of a single row — the only
  thing the driver ever sees is one (pair, freq) row per iteration;
- the symbol re-segmentation after each merge is a pure map-side
  higher-order-function fold (aggregate()) inside whole-stage codegen —
  no Python, no shuffle;
- lineage is cut with localCheckpoint each iteration so 2N-deep plans
  don't accumulate (same policy as the dedup clustering loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): lowercase [a-z]+ tokens, one shuffle."""
    toks = F.expr(f"filter(split(lower({text_col}), '[^a-z]+'), t -> t <> '')")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Split a word into characters plus the end-of-word marker symbol."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(symbols_col: str = "symbols"):
    """array<string> -> array<struct<l,r>> of adjacent symbol pairs."""
    return F.expr(
        f"transform(slice({symbols_col}, 1, size({symbols_col}) - 1),"
        f" (s, i) -> struct(s AS l, element_at({symbols_col}, i + 2) AS r))"
    )


def _apply_merge(symbols_col: str, left, right) -> F.Column:
    """Replace every adjacent (left, right) with left||right, scanning
    left-to-right greedily (a fold: merged symbols never re-merge within
    the same pass, matching the reference BPE's non-overlapping leftmost
    replace). Pure JVM higher-order function — no UDF.

    `left`/`right` may be strings or Columns. The training loop passes
    COLUMNS (from a 1-row broadcast frame), deliberately: with literals,
    every iteration's plan embeds a different constant and whole-stage
    codegen compiles a fresh class per merge — 16 merges evicted ~16
    entries of the JVM's bounded codegen cache per run and poisoned
    every other query's compiled plans (measured: the playstore
    pipeline went 2.4 s -> 16 s at the tail of a bench session).
    Column-parametrized, the plan is structurally identical across
    iterations, so codegen compiles ONCE and each merge reuses it."""
    l = F.lit(left) if isinstance(left, str) else left
    r = F.lit(right) if isinstance(right, str) else right
    m = F.concat(l, r)
    return F.aggregate(
        F.col(symbols_col),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (x == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


# A pair that can never occur: initial symbols are [a-z]+ characters or
# "</w>", and merged spellings are concatenations of those — "\x00" is
# outside the alphabet. Used to pad single-merge passes so the two-merge
# plan shape is constant (codegen compiles once, see _apply_merge).
_INERT = "\x00"


def _second_merge_safe(
    cand: list, k_limit: int, prior_spellings: set[str]
) -> bool:
    """Decide whether cand[1] may be applied in the SAME pass as cand[0]
    without recounting — i.e. whether it provably equals the argmax the
    sequential trainer would pick after applying cand[0].

    Applying merge1 = (l1, r1) changes pair counts three ways: pairs
    overlapping a merged site lose occurrences (can only fall), the pair
    (l2, r2) itself is untouched when {l2,r2} ∩ {l1,r1} = ∅, and NEW
    counts appear only on pairs involving the merged spelling l1||r1 —
    (x, l1r1) bounded by the old count of (x, l1), (l1r1, y) by (r1, y),
    and (l1r1, l1r1) by (r1, l1). So cand[1] stays the argmax iff every
    possible gainer is strictly below c2 = cand[1].pair_freq:

    1. {l2, r2} ∩ {l1, r1} = ∅ — c2 itself is preserved, and neither
       merge's replacement sites interact (folds commute);
    2. c2 > cK (the K-th collected count) — any pair NOT in the
       collected top-K has count <= cK < c2, so unseen sources can't
       feed a gainer up to c2 (auto-true when fewer than K pairs exist:
       the list is then exhaustive);
    3. every collected pair of the source forms (x, l1) / (r1, y),
       other than merge1 itself, has count < c2 strictly;
    4. l1 != r1 — else (l1r1, l1r1) is bounded only by c1 >= c2 (run
       chains like 'a a a a' can out-count c2), so no batch that pass;
    5. the spelling l1||r1 was never created by an earlier merge — a
       pre-existing equal-spelled symbol would let OLD pairs (with
       unknown counts) gain occurrences through merge1.

    Unchanged pairs tied at c2 lose to cand[1] by construction: the
    collect's (freq desc, l, r) order is exactly the trainer's tiebreak,
    so cand[1] is the best of all untouched pairs. Everything else is
    strictly below c2. Hence applying cand[1] second is bit-identical to
    the sequential recount — asserted end-to-end by the merge-for-merge
    reference test (tests/test_llm_batch2.py)."""
    if len(cand) < 2:
        return False
    l1, r1, c1 = cand[0]["l"], cand[0]["r"], int(cand[0]["pair_freq"])
    l2, r2, c2 = cand[1]["l"], cand[1]["r"], int(cand[1]["pair_freq"])
    if l1 == r1:  # (4)
        return False
    if {l2, r2} & {l1, r1}:  # (1)
        return False
    if len(cand) == k_limit and c2 <= int(cand[-1]["pair_freq"]):  # (2)
        return False
    if l1 + r1 in prior_spellings:  # (5)
        return False
    # (3): cand[0] can't source when l1 != r1, and cand[1] can't source
    # under (1), so scanning cand[1:] is exhaustive for collected pairs.
    for p in cand[1:]:
        if (p["r"] == l1 or p["l"] == r1) and int(p["pair_freq"]) >= c2:
            return False
    return True


def learn_bpe_merges(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 16,
    min_freq: int = 2,
    rows_per_partition: int = 200_000,
) -> DataFrame:
    """Learn up to `n_merges` BPE merges from a (word, freq) table.

    Each pass: count adjacent symbol pairs weighted by word freq, take
    the most frequent (ties broken lexicographically — a total order, so
    the learned tokenizer is deterministic and partition-invariant),
    merge it everywhere, repeat. Stops early when no pair reaches
    `min_freq`. Identical merge-for-merge to the sequential definition
    (asserted against a pure-Python reference in tests).

    Round-4 latency work — the iteration floor is JOB latency, not data
    (the 4x scale probe is flat), so the loop cuts jobs three ways:

    - BATCHED MERGES: each pass collects the top-8 pairs and applies a
      second merge in the same pass when _second_merge_safe PROVES it
      equals the sequential recount's argmax (see its docstring for the
      count-change argument). Typical corpora batch most passes — ~half
      the jobs. The second slot is padded with an impossible pair
      (_INERT) when unsafe, so the two-fold plan is structurally
      constant and whole-stage codegen compiles once.
    - RIGHT-SIZED PARTITIONS: the vocab frame has |vocab| rows, not
      corpus rows; one count (whose shuffle the later jobs reuse) sizes
      it at rows_per_partition per task instead of inheriting the
      corpus's parallelism (31 rows over 32 tasks at sf0.1 was pure
      scheduling overhead).
    - SCOPED CONF: AQE re-planning and 32-way tiny shuffles add fixed
      latency per job with zero benefit at model-vocabulary size; both
      are disabled around the loop and restored after. At real scale
      (1e8-row vocab) rows_per_partition yields hundreds of tasks and
      map-side partial aggregation still does the heavy lifting.

    localCheckpoint (NOT persist) per pass truncates the logical plan to
    a LogicalRDD so driver-side analysis stays O(1) per pass — a
    persist() chain keeps the full nested lineage and iteration 16's
    planning cost explodes (measured: ~20 s -> 450+ s at sf0.001).

    Returns a DataFrame (merge_rank, left, right, pair_freq) built from
    the driver-side merge table — model-sized output (like k-means
    centroids), never data-sized.
    """
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    n_rows = words.count()
    npart = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_rows // rows_per_partition),
        ),
    )
    top_k = 8
    merges: list[tuple[int, str, str, int]] = []
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(npart))
        vocab = (
            words.repartition(npart)
            .select("freq", _initial_symbols(F.col("word")).alias("symbols"))
            .localCheckpoint(eager=False)
        )
        # Both per-pass expressions are built ONCE: they are unresolved
        # (plan-independent), and constructing the deep fold tree over
        # py4j costs real driver time per call.
        pairs_col = F.explode(_adjacent_pairs()).alias("p")
        merged_col = _apply_merge(
            "symbols", F.col("_m2l"), F.col("_m2r")
        ).alias("symbols")
        first_col = _apply_merge("symbols", F.col("_m1l"), F.col("_m1r")).alias(
            "symbols"
        )
        spellings: set[str] = set()
        while len(merges) < n_merges:
            cand = (
                vocab.select(pairs_col, "freq")
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("pair_freq"))
                .orderBy(F.desc("pair_freq"), F.asc("l"), F.asc("r"))
                .limit(top_k)
                .collect()
            )
            if not cand or cand[0]["pair_freq"] < min_freq:
                break
            l1, r1 = cand[0]["l"], cand[0]["r"]
            merges.append((len(merges) + 1, l1, r1, int(cand[0]["pair_freq"])))
            l2 = r2 = _INERT
            if (
                len(merges) < n_merges
                and _second_merge_safe(cand, top_k, spellings)
                and cand[1]["pair_freq"] >= min_freq
            ):
                l2, r2 = cand[1]["l"], cand[1]["r"]
                merges.append(
                    (len(merges) + 1, l2, r2, int(cand[1]["pair_freq"]))
                )
                spellings.add(l2 + r2)
            spellings.add(l1 + r1)
            # Merge pairs ride in as DATA (1-row broadcast), not plan
            # literals — keeps the pass plan codegen-cacheable (see
            # _apply_merge). Vocab frames are model-vocabulary-sized, so
            # per-pass checkpoint blocks are noise in the block manager.
            pair = F.broadcast(
                spark.createDataFrame(
                    [(l1, r1, l2, r2)],
                    "_m1l string, _m1r string, _m2l string, _m2r string",
                )
            )
            vocab = (
                vocab.crossJoin(pair)
                .select("freq", "_m2l", "_m2r", first_col)
                .select("freq", merged_col)
                .localCheckpoint(eager=False)
            )
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_freq bigint"
    )
