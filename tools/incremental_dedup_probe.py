"""Incremental-vs-full dedup cost probe: the wall-clock case for the
round-9 incremental tiers, measured at sf0.1 (60k docs).

Scenario: a 5% delta batch (every 20th doc re-ingested under a fresh
id) arrives against an already-indexed corpus. Compare:

- FULL RECOMPUTE: one-shot pairs over base ∪ delta (what a pipeline
  without an index must do every increment);
- INCREMENTAL: delta-only work against the persisted index
  (write_*_index paid once, amortized across every future increment),
  for both the exact tier (jaccard_pairs_incremental) and the LSH tier
  (minhash_lsh_pairs_incremental), plus the label fold
  (connected_components_incremental) vs full CC.

Each measurement min-of-3 with a count() action (pair frames are the
product here; no column pruning hazard — the count forces the joins).

Usage: python tools/incremental_dedup_probe.py  (local[32], ~3 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_googleplaystore_spark.operators import dedup  # noqa: E402
from bigdata_googleplaystore_spark.session import get_spark  # noqa: E402
from bigdata_googleplaystore_spark.sources import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), out


def octave_base(spark, k: int):
    """A k-x affine-cipher-grown base corpus (dedup_octave_probe's
    growth model: each copy reproduces the 1x corpus's internal
    structure under its own alphabet, cross-copy collisions
    negligible) — the regime where the incremental claim bites: full
    recompute scales with the BASE, the delta batch does not."""
    import shutil

    from tools.dedup_octave_probe import build_kx_distinct

    out_dir = f"/tmp/incr_probe_base_{k}x"
    shutil.rmtree(out_dir, ignore_errors=True)
    build_kx_distinct(spark, out_dir, k)
    return spark.read.parquet(f"{out_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def octave(spark, k: int) -> dict:
    """Full-vs-incremental at a k-x base with a FIXED-SIZE delta."""
    d = octave_base(spark, k) if k > 1 else load_table(
        spark, SF, "documents"
    ).select("doc_id", "text")
    delta = (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 20 == 0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    out = {"base_x": k, "n_base": d.count(), "n_delta": delta.count()}
    t0 = time.time()
    idx = f"/tmp/incr_probe_oct_{k}x"
    # auto-sized buckets with a SMALL per-bucket target so bucket count
    # grows with the base (B ~ postings/target) — the regime where the
    # pruned path's base-side rows stay O(|delta|) as the base grows
    out["buckets"] = dedup.write_jaccard_index(
        d, idx, "doc_id", "text", n=3, target_rows_per_bucket=1 << 19
    )
    out["index_build_s"] = round(time.time() - t0, 3)
    postings = dedup.read_jaccard_index(spark, idx)
    out["full_s"], _ = timed(
        lambda: dedup.jaccard_pairs(
            d.unionByName(delta), "doc_id", "text", 3, 0.5
        ).count()
    )
    # unbucketed incremental: the r9 baseline whose base-side full scan
    # grew with the base (the residual this round removes)
    out["incremental_flat_s"], _ = timed(
        lambda: dedup.jaccard_pairs_incremental(
            postings, delta, "doc_id", "text", 3, 0.5
        ).count()
    )
    out["incremental_pruned_s"], _ = timed(
        lambda: dedup.jaccard_pairs_incremental_indexed(
            spark, idx, delta, "doc_id", "text", 0.5
        ).count()
    )
    # PRUNING-REGIME measurement: a 1-doc "is this a near-dup of
    # anything?" lookup against a fine-bucketed index (the S << B
    # regime where directory pruning bites — dedup-check-on-write).
    # Rows READ is the structural number: it must stay ~constant as
    # the base grows 64x, while the flat path's scan grows linearly.
    idx_fine = f"/tmp/incr_probe_oct_fine_{k}x"
    out["fine_buckets"] = dedup.write_jaccard_index(
        d, idx_fine, "doc_id", "text", n=3, target_rows_per_bucket=1 << 11
    )
    one_doc = delta.limit(1).localCheckpoint()
    meta = dedup.read_jaccard_index_meta(spark, idx_fine)
    d1_post = dedup.build_jaccard_index(one_doc, "doc_id", "text", 3)
    touched = (
        d1_post.select(
            F.pmod(F.col("shingle"), F.lit(meta["buckets"])).cast("int").alias("b")
        )
        .distinct()
        .count()
    )
    out["lookup_touched_buckets"] = touched
    out["base_postings_total"] = dedup.read_jaccard_index(spark, idx_fine).count()
    pruned_rows = (
        spark.read.parquet(idx_fine + "/postings")
        .where(
            F.col("_bucket").isin(
                [
                    r["b"]
                    for r in d1_post.select(
                        F.pmod(F.col("shingle"), F.lit(meta["buckets"]))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                ]
            )
        )
        .count()
    )
    out["base_postings_read_pruned"] = pruned_rows
    out["lookup_pruned_s"], _ = timed(
        lambda: dedup.jaccard_pairs_incremental_indexed(
            spark, idx_fine, one_doc, "doc_id", "text", 0.5
        ).count()
    )
    out["lookup_flat_s"], _ = timed(
        lambda: dedup.jaccard_pairs_incremental(
            dedup.read_jaccard_index(spark, idx_fine),
            one_doc, "doc_id", "text", 3, 0.5,
        ).count()
    )
    # LSH tier at the same octave (VERDICT r09 item 6: both incremental
    # tiers measured across the decades, not just the exact tier)
    t0 = time.time()
    idx_m = f"/tmp/incr_probe_oct_lsh_{k}x"
    dedup.write_lsh_index(d, idx_m, "doc_id", "text", n=3)
    out["lsh_index_build_s"] = round(time.time() - t0, 3)
    buckets, hashed = dedup.read_lsh_index(spark, idx_m)
    out["lsh_full_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs(
            d.unionByName(delta), "doc_id", "text"
        ).count()
    )
    out["lsh_incremental_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs_incremental(
            buckets, hashed, delta, "doc_id", "text"
        ).count()
    )
    # LSH lookup regime: single-doc dedup-check against a PARTITIONED
    # store — touched bucket partitions bounded by `bands` (16),
    # hashed partitions by the candidate count, both constant in the
    # corpus; the flat path re-scans both whole tables
    p_fine = max(32, (out["n_base"] * 16) // (1 << 13))
    idx_mf = f"/tmp/incr_probe_oct_lshfine_{k}x"
    dedup.write_lsh_index(
        d, idx_mf, "doc_id", "text", n=3, partitions=p_fine
    )
    out["lsh_fine_partitions"] = p_fine
    out["lsh_lookup_pruned_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs_incremental_indexed(
            spark, idx_mf, one_doc, "doc_id", "text", 0.5
        ).count()
    )
    b_f, h_f = dedup.read_lsh_index(spark, idx_mf)
    out["lsh_lookup_flat_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs_incremental(
            b_f, h_f, one_doc, "doc_id", "text", threshold=0.5
        ).count()
    )
    return out


def main() -> None:
    spark = get_spark(app_name="incremental-dedup-probe", shuffle_partitions=32)
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    union = d.unionByName(delta)
    out = {"sf_dir": SF, "n_base": d.count(), "n_delta": delta.count()}

    # ---- exact (jaccard) tier --------------------------------------
    t0 = time.time()
    idx_j = "/tmp/incr_probe_jac"
    dedup.write_jaccard_index(d, idx_j, "doc_id", "text", n=3)
    out["jaccard_index_build_s"] = round(time.time() - t0, 3)
    postings = dedup.read_jaccard_index(spark, idx_j)
    out["jaccard_full_s"], n_full = timed(
        lambda: dedup.jaccard_pairs(union, "doc_id", "text", 3, 0.5).count()
    )
    out["jaccard_incremental_s"], n_inc = timed(
        lambda: dedup.jaccard_pairs_incremental(
            postings, delta, "doc_id", "text", 3, 0.5
        ).count()
    )
    out["jaccard_full_pairs"] = n_full
    out["jaccard_delta_pairs"] = n_inc

    # ---- LSH (minhash) tier ----------------------------------------
    t0 = time.time()
    idx_m = "/tmp/incr_probe_lsh"
    dedup.write_lsh_index(d, idx_m, "doc_id", "text", n=3)
    out["minhash_index_build_s"] = round(time.time() - t0, 3)
    buckets, hashed = dedup.read_lsh_index(spark, idx_m)
    out["minhash_full_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs(union, "doc_id", "text").count()
    )
    out["minhash_incremental_s"], _ = timed(
        lambda: dedup.minhash_lsh_pairs_incremental(
            buckets, hashed, delta, "doc_id", "text"
        ).count()
    )

    # ---- cluster fold ----------------------------------------------
    base_pairs = dedup.jaccard_pairs(d, "doc_id", "text", 3, 0.5).localCheckpoint()
    base_labels = dedup.connected_components(base_pairs).localCheckpoint()
    delta_pairs = dedup.jaccard_pairs_incremental(
        postings, delta, "doc_id", "text", 3, 0.5
    ).localCheckpoint()
    out["cc_full_s"], _ = timed(
        lambda: dedup.connected_components(
            base_pairs.unionByName(delta_pairs)
        ).count()
    )
    out["cc_fold_s"], _ = timed(
        lambda: dedup.connected_components_incremental(
            base_labels, delta_pairs
        ).count()
    )
    # the regime argument: fixed delta against a GROWING base — three
    # decades (1x/4x/16x/64x), matching the batch tier's octave probe
    out["octaves"] = [octave(spark, k) for k in (1, 4, 16, 64)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
