"""Randomized MODEL TEST for the manifest layer's full operation
algebra: arbitrary interleavings of insert / plain-delete / upsert /
copy-on-write compaction, checked after EVERY step against a pure-
Python reference model of the visibility rules:

- a plain DELETE (cutoff None) masks every row with the key, past and
  future;
- an UPSERT's delete masks only rows with sequence <= its cutoff (the
  batch ingestion order), so the upsert's own rows and later inserts
  survive;
- compaction rewrites the folded rows at the horizon sequence and
  physically drops masked ones — visibility must be UNCHANGED.

The model tracks each logical row as (key, value, seq) plus the list
of (delete-keys, cutoff) files; visibility is re-derived from scratch
each step, so any drift between the Spark implementation and the
declared semantics shows up as a multiset mismatch at the first step
that diverges."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark import streaming
from bigdata_googleplaystore_spark.streaming import manifest

from _markers import HEAVY


class _Model:
    def __init__(self) -> None:
        self.rows: list[dict] = []  # {k, v, seq}
        self.deletes: list[tuple[set[int], int | None]] = []  # (keys, cutoff)

    def visible(self) -> list[tuple[int, float]]:
        out = []
        for r in self.rows:
            masked = any(
                r["k"] in keys and (cut is None or r["seq"] <= cut)
                for keys, cut in self.deletes
            )
            if not masked:
                out.append((r["k"], r["v"]))
        return sorted(out)

    def compact(self, upto: int) -> None:
        survivors = []
        for r in self.rows:
            if r["seq"] > upto:
                survivors.append(r)
                continue
            masked = any(
                r["k"] in keys and (cut is None or r["seq"] <= cut)
                for keys, cut in self.deletes
            )
            if not masked:
                survivors.append({**r, "seq": upto})
        self.rows = survivors


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in pairs], "k long, v double"
    )


@HEAVY
def test_manifest_random_op_sequences_match_model(spark, tmp_path):
    rnd = random.Random(1729)
    for scenario in range(3):
        table = str(tmp_path / f"t{scenario}")
        model = _Model()
        next_batch = 0
        next_del = 0
        committed_any = False
        horizon = -1
        for step in range(9):
            ops = ["insert", "upsert"]
            if committed_any:
                ops += ["delete", "compact"]
            op = rnd.choice(ops)
            if op == "insert":
                pairs = [
                    (rnd.randrange(30), rnd.randrange(1000)) for _ in range(6)
                ]
                streaming.write_batch_partition(
                    _df(spark, pairs), table, next_batch
                )
                manifest.commit_batch(spark, table, next_batch)
                model.rows += [
                    {"k": k, "v": float(v), "seq": next_batch} for k, v in pairs
                ]
                next_batch += 1
                committed_any = True
            elif op == "delete":
                keys = {rnd.randrange(30) for _ in range(4)}
                manifest.commit_deletes(
                    spark,
                    table,
                    spark.createDataFrame([(k,) for k in keys], "k long"),
                    next_del,
                )
                model.deletes.append((keys, None))
                next_del += 1
            elif op == "upsert":
                keyset = sorted({rnd.randrange(30) for _ in range(4)})
                pairs = [(k, rnd.randrange(1000) + 5000) for k in keyset]
                cutoff = next_batch - 1
                manifest.commit_upsert(
                    spark, table, _df(spark, pairs), ["k"], next_batch, next_del
                )
                model.deletes.append((set(keyset), cutoff))
                model.rows += [
                    {"k": k, "v": float(v), "seq": next_batch} for k, v in pairs
                ]
                next_batch += 1
                next_del += 1
                committed_any = True
            else:  # compact
                upto = next_batch - 1
                if upto <= horizon:
                    continue
                manifest.compact_rows_apply_deletes(spark, table, upto)
                model.compact(upto)
                horizon = upto
            got = sorted(
                (r["k"], r["v"])
                for r in manifest.read_snapshot_rows(spark, table).collect()
            )
            assert got == model.visible(), (
                f"scenario {scenario} step {step} op {op}: "
                f"spark={got} model={model.visible()}"
            )
