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

# Hybrid cutover (round 4b): a (word, freq) vocab of at most this many
# rows (~a few MB) is collected once and the merge loop runs driver-side,
# bit-identically to the distributed path; larger vocabs iterate
# distributed. Named here (round-5 advice) so the scale probe and the
# sf0.1 sweep test stay pinned ABOVE the real cutover if it ever moves —
# import this, don't re-hardcode 65_536.
DRIVER_VOCAB_CUTOVER = 65_536


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

    `left`/`right` may be strings or Columns. This fold is the SEMANTIC
    PIN for merge application (the property tests exercise it directly);
    since round 4b the trainer itself applies merges in the wrapped
    STRING form via regexp_replace (see _wrap_symbols) because analyzing
    this ~60-node tree cost ~0.4 s of driver time per pass. The two are
    asserted equivalent case-by-case (test_bpe_string_apply_matches_fold)
    and end-to-end (the merge-for-merge reference tests). The
    codegen-cache lesson stands for any iterative operator: pass
    per-iteration constants as COLUMNS from a 1-row broadcast frame, not
    plan literals — literal-embedding compiled a fresh codegen class per
    merge and poisoned other queries' compiled plans (measured: the
    playstore pipeline went 2.4 s -> 16 s at the tail of a bench
    session)."""
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


def _wrap_symbols(word: F.Column) -> F.Column:
    """word -> the wrapper-separator string form "_c__c__..__</w>_": every
    symbol wrapped by '_' on both sides, adjacent symbols sharing a '__'
    separator. '_' is outside the [a-z</w>] symbol alphabet, so the
    encoding is unambiguous, and a regex replace of '_l__r_' -> '_lr_'
    is EXACTLY the greedy leftmost non-overlapping merge fold
    (_apply_merge): the regex engine resumes scanning after each match,
    so a just-merged symbol can't re-merge within the pass, and a match
    consumes only one of the two separator underscores on each side, so
    neighbours keep their wrapping. Pinned against the fold by
    test_bpe_string_apply_matches_fold and, end-to-end, by the
    merge-for-merge reference tests."""
    return F.concat(
        F.lit("_"), F.array_join(_initial_symbols(word), "__"), F.lit("_")
    )


def _merge_pattern(l: F.Column, r: F.Column) -> tuple[F.Column, F.Column]:
    """(pattern, replacement) regex columns for one merge in the wrapped
    string form. Symbols are [a-z</w>]+ — no regex metacharacters and no
    '$'/'\\' replacement escapes, so plain concatenation is safe."""
    pat = F.concat(F.lit("_"), l, F.lit("__"), r, F.lit("_"))
    rep = F.concat(F.lit("_"), l, r, F.lit("_"))
    return pat, rep


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


def _learn_merges_local(
    word_freqs: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge loop over a collected word-frequency dict —
    bit-identical to the distributed loop (same (freq desc, l, r) argmax
    tiebreak, same greedy leftmost non-overlapping fold; asserted
    merge-for-merge against it in tests/test_llm_batch2.py)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(list(w) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), pf = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < min_freq:
            break
        merges.append((rank, l, r, pf))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + f
        vocab = nxt
    return merges


def learn_bpe_merges(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 16,
    min_freq: int = 2,
    rows_per_partition: int = 200_000,
    driver_vocab_limit: int = DRIVER_VOCAB_CUTOVER,
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

    Round-4b latency work, part 1 — HYBRID CUTOVER: after the corpus
    collapses to (word, freq), a vocab of at most `driver_vocab_limit`
    rows (default 65,536 — a few MB) is collected once and the merge
    loop runs driver-side (_learn_merges_local), bit-identically; the
    distributed loop below exists for the web-scale vocab case and is
    test-pinned via driver_vocab_limit=0. Rationale in the cutover
    comment in the body.

    Round-4b latency work, part 2 — STRING-FORM VOCAB: profiling the steady
    state showed each pass spending ~0.42 s in DRIVER-SIDE ANALYSIS of
    the two ~60-node aggregate() fold expressions (vs 0.13 s for the
    whole count+collect job on a 31-row vocab). The vocab therefore now
    lives as the wrapper-separator STRING (_wrap_symbols), the same
    representation the frozen-vocab encoder uses: applying a merge is a
    single regexp_replace('_l__r_' -> '_lr_') with COLUMN-typed
    pattern/replacement (proven fold-equivalent, see _wrap_symbols), a
    ~5-node expression the analyzer disposes of in microseconds. Pair
    counting splits the string back to the symbol array only inside the
    count job. Measured: 5.9 s -> ~2.5 s for 16 merges at sf0.1; the
    merge-for-merge reference tests and the adversarial batching suite
    pin bit-identical output.

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
    if n_rows <= driver_vocab_limit:
        # HYBRID CUTOVER (round 4b): everything data-sized — the corpus
        # scan and the collapse to (word, freq) — already happened in
        # Spark upstream; what remains is MODEL-SIZED iteration, and the
        # distributed loop's cost at that size is pure per-pass job
        # floor: profiling at sf0.1 (31-row vocab) showed ~0.5 s/pass of
        # which ~0.35 s is localCheckpoint's physical planning (toRdd)
        # and ~0.15 s the collect job itself — data time is microseconds.
        # So, exactly like k-means collecting k centroids or this loop
        # already collecting its top-8 pairs, a vocab under the limit
        # (65,536 rows ~ a few MB) collects once and iterates driver-
        # side, bit-identically (asserted merge-for-merge in tests).
        # Real web-scale vocabs (1e7-1e9 rows after a 100 TB corpus)
        # exceed the limit and take the distributed path below; tests
        # pin that path with driver_vocab_limit=0.
        wf: dict[str, int] = {}
        for r in words.select("word", "freq").collect():
            wf[r["word"]] = wf.get(r["word"], 0) + int(r["freq"])
        return spark.createDataFrame(
            _learn_merges_local(wf, n_merges, min_freq),
            "merge_rank int, left string, right string, pair_freq bigint",
        )
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
            .select("freq", _wrap_symbols(F.col("word")).alias("s"))
            .localCheckpoint(eager=False)
        )
        # Per-pass expressions are built ONCE: they are unresolved
        # (plan-independent), and constructing them over py4j costs
        # driver time per call.
        symbols_col = F.split(F.expr("btrim(s, '_')"), "__").alias("symbols")
        pairs_col = F.explode(_adjacent_pairs()).alias("p")
        p1, r1c = _merge_pattern(F.col("_m1l"), F.col("_m1r"))
        p2, r2c = _merge_pattern(F.col("_m2l"), F.col("_m2r"))
        merged_col = F.regexp_replace(
            F.regexp_replace(F.col("s"), p1, r1c), p2, r2c
        ).alias("s")
        spellings: set[str] = set()
        while len(merges) < n_merges:
            cand = (
                vocab.select(symbols_col, "freq")
                .select(pairs_col, "freq")
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
                .select("freq", merged_col)
                .localCheckpoint(eager=False)
            )
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_freq bigint"
    )
