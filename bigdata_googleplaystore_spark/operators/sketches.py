"""Mergeable cardinality & frequency sketches: KMV/theta and count-min.

The missing tier between the exact heavy-hitter / COUNT(DISTINCT) paths
(operators/frequency.py, the HLL gate) and the 100 TB reality that exact
answers over high-cardinality columns shuffle the whole key space: a
SKETCH is a small, MERGEABLE summary you can build map-side, land in a
per-batch state partition, union across days, and query in O(sketch)
— the shape every petabyte metrics/observability stack uses.

Two public families, both DataFrame-native and both deterministic:

- **KMV / theta** (Bar-Yossef et al. 2002 "Counting distinct elements in
  a data stream"; Dasgupta et al. 2016 theta-sketch framework): keep the
  k MINIMUM hash values of the distinct set; the k-th smallest hash u_k
  estimates the cardinality as (k-1)/u_k, and because "k smallest of a
  union" = "k smallest of (k smallest of each part)" the sketch merges
  losslessly. The theta extension estimates arbitrary SET ALGEBRA
  (union / intersection) from per-set sketches: clip both to the finer
  threshold theta = min(theta_a, theta_b) and count surviving hashes.

- **Count-min** (Cormode & Muthukrishnan 2005): a depth x width counter
  matrix; each item adds its count at one bucket per row (independent
  hash per row); a point query reads back the MINIMUM over rows — an
  overestimate, never an underestimate, with error <= 2N/width at 63%
  per row (amplified by depth). The matrix is LINEAR in the input, so
  partial matrices from any partitioning of the data sum cell-wise into
  exactly the matrix of the whole — the mergeability property the
  sketch_cms_merge_partials gate pins through the streaming state-table
  protocol.

Hashing is md5-derived (not xxhash64) for the same reason as
operators/sampling.py: DuckDB computes the identical md5, so every
estimate here is REPLAYABLE in the oracle SQL bit-for-bit. The uniform
u in [0,1) takes the first 13 hex chars (52 bits) so the integer is
EXACTLY representable in a double in both engines — no cross-engine
rounding seam. At 100 TB you'd swap in xxhash64 for speed; the
estimator algebra is hash-agnostic.

Scale posture:
- kmv_sketch never holds a group's full distinct set in one task: a
  hash-derived shard splits each group ~`shards` ways, stage 1 keeps k
  minima per (group, shard) with map-side partial aggregation, stage 2
  takes the k minima of the <= shards*k survivors. Both shuffles carry
  O(groups * shards * k) rows, independent of the data's cardinality.
- cms_build fans the ALREADY-AGGREGATED (item, count) frame out depth
  ways and reduces to depth*width cells — the matrix is broadcast-sized
  by construction (default 4 x 512 = 2 KiB of longs) and point lookups
  are a broadcast join against it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^52: the largest power of two whose integers are all exactly
# representable in a float64 AFTER division (u = n / 2^52 is exact).
_U52_SPACE = float(1 << 52)

# DuckDB fragment computing the identical u for oracle SQL (mirror of
# kmv_u below; {x} is the value expression).
U52_SQL = (
    "(('0x' || substr(md5({x}), 1, 13))::UBIGINT::DOUBLE / 4503599627370496.0)"
)


def kmv_u(value: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a value: first 52 bits of
    md5(salt || value), scaled. Exact in float64; DuckDB replays it
    via U52_SQL."""
    h = F.md5(F.concat(F.lit(salt), value.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_U52_SPACE)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Per-group KMV sketch: the k minimum-hash (u, h) pairs over the
    group's DISTINCT non-null values. Returns (*group_cols, u, h) with
    <= k rows per group; h is the full md5 hex (the value's 128-bit
    identity, used by the theta set ops to match elements across
    sketches without comparing raw values).

    Because "k smallest" is a semilattice, the exact partitioning of the
    two-stage top-k is invisible in the result: any shard count, any
    task layout, same k rows. That is also why the sketch MERGES: the k
    smallest of a union of sketches is the sketch of the union.
    """
    vals = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
    )
    hashed = vals.select(
        *group_cols,
        F.md5(F.concat(F.lit(salt), F.col("_v").cast("string"))).alias("h"),
    ).withColumn(
        "u", F.conv(F.substring("h", 1, 13), 16, 10).cast("double") / _U52_SPACE
    )
    # stage 1: shard each group by independent md5 bits (chars 14-17) so
    # no task ever aggregates a whole group's distinct set; collect_list
    # per (group, shard) is bounded by the shard slice and partially
    # aggregated map-side.
    shard = F.pmod(F.conv(F.substring("h", 14, 4), 16, 10).cast("long"), shards)
    part = hashed.groupBy(*group_cols, shard.alias("_shard")).agg(
        F.slice(F.array_sort(F.collect_list(F.struct("u", "h"))), 1, k).alias("_top")
    )
    cand = part.select(
        *group_cols, F.explode("_top").alias("_s")
    ).select(*group_cols, F.col("_s.u").alias("u"), F.col("_s.h").alias("h"))
    # stage 2: k minima of the <= shards*k survivors per group
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("u", "h")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(sk: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Fold a kmv_sketch into per-group estimates: (*group_cols, n_seen,
    theta, kmv_est). A non-full sketch (n_seen < k) saw every distinct
    value, so the estimate is exact; a full one estimates (k-1)/u_k.
    (n_seen == k is indistinguishable from n > k at the sketch, so the
    estimator path applies — oracles must branch on n < k, not <= k.)"""
    agg = sk.groupBy(*group_cols).agg(
        F.count("*").alias("n_seen"), F.max("u").alias("_u_max")
    )
    full = F.col("n_seen") >= k
    return agg.select(
        *group_cols,
        "n_seen",
        F.when(full, F.col("_u_max")).otherwise(F.lit(1.0)).alias("theta"),
        F.when(full, F.lit(float(k - 1)) / F.col("_u_max"))
        .otherwise(F.col("n_seen").cast("double"))
        .alias("kmv_est"),
    )


def kmv_merge(sketches: list[DataFrame], group_cols: list[str], k: int) -> DataFrame:
    """Union-merge KMV sketches over the SAME value domain: per group,
    the k smallest of the combined (deduplicated) hash sets — exactly
    the sketch that would have been built from the unioned inputs.
    Sketch-sized shuffle only."""
    allrows = sketches[0]
    for s in sketches[1:]:
        allrows = allrows.unionByName(s)
    dedup = allrows.dropDuplicates([*group_cols, "h"])
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("u", "h")
    return (
        dedup.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def theta_set_ops(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Theta-sketch set algebra over two UNGROUPED sketches (single-set
    frames with columns (u, h)): one row
    (theta, union_est, inter_est, diff_ab_est). Clip both sketches to
    theta = min(theta_a, theta_b) — below theta each sketch is a FULL
    record of its set's hashes — then union/intersection/difference
    estimates are (surviving hash count) / theta (A\\B = A's surviving
    hashes NOT in B's clip, an anti-join; A∖B + A∩B = A below theta by
    construction). All frames involved are <= k rows, so every join
    here is broadcast-trivial; the expensive part of the pipeline is
    building the sketches, which is the point."""

    def theta_of(sk: DataFrame) -> DataFrame:
        return sk.agg(
            F.when(F.count("*") >= k, F.max("u")).otherwise(F.lit(1.0)).alias("th")
        )

    theta = (
        theta_of(sk_a)
        .crossJoin(theta_of(sk_b).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("theta"))
    )
    a = sk_a.select("u", "h").crossJoin(theta)
    b = sk_b.select("u", F.col("h").alias("h_b")).crossJoin(
        theta.select(F.col("theta").alias("_tb"))
    )
    union_cnt = (
        a.where(F.col("u") < F.col("theta"))
        .select("h")
        .union(b.where(F.col("u") < F.col("_tb")).select(F.col("h_b").alias("h")))
        .distinct()
        .agg(F.count("*").alias("n_union"))
    )
    inter_cnt = (
        a.where(F.col("u") < F.col("theta"))
        .join(b.where(F.col("u") < F.col("_tb")), F.col("h") == F.col("h_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    diff_cnt = (
        a.where(F.col("u") < F.col("theta"))
        .join(
            b.where(F.col("u") < F.col("_tb")),
            F.col("h") == F.col("h_b"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_diff"))
    )
    return (
        theta.crossJoin(union_cnt)
        .crossJoin(inter_cnt)
        .crossJoin(diff_cnt)
        .select(
            "theta",
            (F.col("n_union") / F.col("theta")).alias("union_est"),
            (F.col("n_inter") / F.col("theta")).alias("inter_est"),
            (F.col("n_diff") / F.col("theta")).alias("diff_ab_est"),
        )
    )


def _cms_bucket(item: Column, row_idx: int, width: int, salt: str) -> Column:
    """Row `row_idx`'s bucket for an item: 52 md5 bits of
    '<salt><row_idx>:<item>' mod width. DuckDB replays it as
    ('0x' || substr(md5('<salt><i>:' || item), 1, 13))::UBIGINT % width."""
    h = F.md5(F.concat(F.lit(f"{salt}{row_idx}:"), item.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 13), 16, 10).cast("long"), width)


def _cms_probe_array(item_col: str, depth: int, width: int, salt: str) -> Column:
    """The depth-way (row_idx, bucket) probe generator as ONE parsed SQL
    expression. Row-for-row identical to
    explode(array(struct(lit(i), _cms_bucket(col, i, ...)) for i)) plus
    a struct-field extraction — each literal keeps the type pyspark's
    Column form produced (row ids and width INT, conv bases INT, bucket
    CAST ... AS BIGINT), so every md5 input string and therefore every
    bucket VALUE is unchanged. Built as a string because the Column
    composition cost ~6 py4j round-trips per (row, call site) — ~50
    driver round-trips per sketch query where one parse suffices
    (guide §7.3)."""
    q = salt.replace("'", "''")
    col = f"`{item_col.replace('`', '``')}`"
    entries = ", ".join(
        f"named_struct('row_idx', {i}, 'bucket', "
        f"pmod(CAST(conv(substring(md5(concat('{q}{i}:', "
        f"CAST({col} AS STRING))), 1, 13), 16, 10) AS BIGINT), {width}))"
        for i in range(depth)
    )
    # inline() (the struct-flattening generator) instead of
    # explode().alias + a second select extracting the struct fields + a
    # drop: one Dataset op instead of three, and every Dataset op is an
    # eager JVM re-analysis of the whole subtree.
    return F.expr(f"inline(array({entries}))")


def cms_build(
    counts: DataFrame,
    item_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min matrix from an ALREADY-AGGREGATED (item, count)
    frame: (row_idx, bucket, cell) with depth*width rows max. The input
    is the per-item count frame (one groupBy upstream), so the depth-way
    fan-out multiplies |vocabulary| rows, not raw tokens; the reduce to
    depth*width cells is a map-side-combinable sum. The matrix is linear
    in the input: matrices built from any disjoint split of the data
    sum cell-wise to the matrix of the whole (see cms_merge)."""
    rows = counts.select(
        _cms_probe_array(item_col, depth, width, salt),
        F.col(count_col).alias("_n"),
    )
    return rows.groupBy("row_idx", "bucket").agg(
        F.sum("_n").cast("long").alias("cell")
    )


def cms_merge(matrices: DataFrame) -> DataFrame:
    """Fold a union of partial count-min matrices (same depth/width/salt)
    into one: cell-wise sum. Exact, not approximate — linearity means
    merge-then-query equals build-on-everything-then-query."""
    return matrices.groupBy("row_idx", "bucket").agg(
        F.sum("cell").cast("long").alias("cell")
    )


def cms_lookup(
    matrix: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch: for each row of `queries`, the estimate is
    min over matrix rows of the item's cell — an overestimate of the true
    count, never an under. Adds `cms_est`; the depth-way expansion joins
    against the broadcast-sized matrix, so lookups cost O(|queries|)."""
    probes = queries.select(
        "*", _cms_probe_array(item_col, depth, width, salt)
    )
    # LEFT join + coalesce-to-0: a queried item whose (row, bucket) cell
    # was never populated must read as 0 (the true CMS cell value for an
    # absent item), not drop out of the probe set — an inner join here
    # would silently vanish fully-absent items and inflate the min for
    # partially-absent ones by skipping their empty (= smallest) cells.
    joined = probes.join(F.broadcast(matrix), ["row_idx", "bucket"], "left")
    others = [c for c in queries.columns]
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("long").alias("cms_est")
    )


def cms_inner_product(matrix_a: DataFrame, matrix_b: DataFrame) -> DataFrame:
    """JOIN-SIZE ESTIMATION from two count-min matrices (Cormode &
    Muthukrishnan 2005 §4.2): the equi-join size |A ⋈ B| on the sketched
    key is Σ_k a_k·b_k, and each matrix row's bucket-wise inner product
    Σ_b A_i[b]·B_i[b] overestimates it by only the collision cross-terms
    — take the MIN over rows. Always >= the true size, expected slack
    ||a||₁·||b||₁/width per row. One-row result (`join_size_est`).

    This is the CBO primitive at 100 TB: join-size estimates from two
    2 KiB summaries that merge across ingest batches (cms_merge), with
    no sampling pass and no key-space shuffle — the sketches were
    already maintained by the state-table protocol."""
    a = matrix_a.select("row_idx", "bucket", F.col("cell").alias("_ca"))
    b = matrix_b.select("row_idx", "bucket", F.col("cell").alias("_cb"))
    per_row = (
        a.join(b, ["row_idx", "bucket"])
        .groupBy("row_idx")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    return per_row.agg(F.min("_ip").cast("long").alias("join_size_est"))


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = "smp"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5-derived
    uniform (over the concatenated key columns) falls below `rate`.
    Unlike df.sample(), the kept set is a PURE FUNCTION of the rows —
    stable across retries, partitionings, and engines (oracles replay
    the predicate), and MERGEABLE: the union of per-batch samples IS
    the sample of the union, so a quantile/statistics sample can be
    maintained incrementally next to the state table and re-read
    without touching history. The sketch tier for order statistics,
    which have no small mergeable exact summary.

    Key columns are joined with ':' before hashing; with free-form
    string keys, distinct rows whose joined forms collide (("a:b","c")
    vs ("a","b:c")) would share a hash and sample together — use
    separator-free or fixed-width key domains (ids, codes), as every
    caller here does."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    return df.where(kmv_u(key, salt) < rate)
