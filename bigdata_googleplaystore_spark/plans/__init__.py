"""Physical-plan introspection: machine-checkable scale posture.

The reference gets its optimizations (pushdown, pruning, broadcast,
whole-stage codegen) from Catalyst implicitly and never verifies them
(SURVEY.md §4). This engine makes the plan a *testable artifact*: these
helpers parse `explain("formatted")` output so tests and audits can assert
"the filter reached the scan", "this join broadcasts", "the hot path is
codegen'd" — the properties that decide whether a query survives a 100×
scale-up — instead of eyeballing plans.

Parsing the explain text (rather than walking the JVM plan tree over py4j)
keeps this dependency-free and version-tolerant; the strings matched
(`PushedFilters`, `ReadSchema`, `BroadcastHashJoin`, ...) are stable
public plan vocabulary.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan as text (AQE initial plan; final plans appear
    only after execution)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class ScanInfo:
    """One source scan in the plan."""

    format: str
    location: str
    pushed_filters: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)

    def reads_only(self, *cols: str) -> bool:
        return set(self.read_columns) <= set(cols)


@dataclass
class PlanReport:
    text: str
    scans: list[ScanInfo]

    # --- join / exchange / codegen posture --------------------------------
    @property
    def broadcast_joins(self) -> int:
        return self.text.count("BroadcastHashJoin")

    @property
    def sort_merge_joins(self) -> int:
        return self.text.count("SortMergeJoin")

    @property
    def nested_loop_joins(self) -> int:
        return self.text.count("BroadcastNestedLoopJoin")

    @property
    def exchanges(self) -> int:
        """Shuffle exchanges (excludes broadcast exchanges and reuses):
        the number that matters for 100 TB wall-clock.

        Formatted explain puts the node header `(n) Exchange` and its
        partitioning arguments on separate lines, so count headers first
        (`BroadcastExchange` / `ReusedExchange` are distinct node names
        and don't match); fall back to the simple-mode single-line form."""
        n = len(re.findall(r"\(\d+\) Exchange\b", self.text))
        if n:
            return n
        return len(
            re.findall(
                r"Exchange (?:hash|range|SinglePartition|RoundRobin|rebalance)",
                self.text,
            )
        )

    @property
    def reused_exchanges(self) -> int:
        return self.text.count("ReusedExchange")

    @property
    def codegen_stages(self) -> int:
        """Distinct whole-stage-codegen spans. Formatted explain annotates
        operators with `[codegen id : N]`; simple mode prints
        `WholeStageCodegen (N)` — count whichever form is present."""
        ids = set(re.findall(r"\[codegen id : (\d+)\]", self.text))
        ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", self.text))
        # executedPlan().toString() marks codegen'd operators as `*(n) Op`
        ids |= set(re.findall(r"\*\((\d+)\) ", self.text))
        return len(ids)

    def scan_for(self, table_substr: str) -> ScanInfo | None:
        for s in self.scans:
            if table_substr in s.location:
                return s
        return None


def executed_plan(df: DataFrame) -> str:
    """Materialize the query (count) and return the final executed plan —
    under AQE this is where WholeStageCodegen wrapping and ReusedExchange
    dedup become visible; the static plan never shows them. Must collect
    THIS dataframe (count() would execute a derived plan and leave this
    one isFinalPlan=false)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def analyze(df: DataFrame, execute: bool = False) -> PlanReport:
    """Parse the formatted physical plan into a PlanReport. With
    execute=True the query is run and the AQE-final executed plan is
    appended to the report text (codegen spans, exchange reuse)."""
    text = formatted_plan(df)
    if execute:
        text = text + "\n" + executed_plan(df)
    scans: list[ScanInfo] = []
    # formatted explain lists operators with detail blocks; scan blocks
    # carry Location / PushedFilters / ReadSchema lines.
    blocks = re.split(r"\n\n|\n(?=\(\d+\) )", text)
    for b in blocks:
        m = re.search(r"\(\d+\) Scan (\w+)", b)
        if not m:
            continue
        fmt = m.group(1)
        loc = ""
        mloc = re.search(r"Location: \S+ \[([^\]]*)\]", b)
        if mloc:
            loc = mloc.group(1)
        pushed: list[str] = []
        mp = re.search(r"PushedFilters: \[([^\]]*)\]", b)
        if mp and mp.group(1).strip():
            pushed = [p.strip() for p in mp.group(1).split(",")]
        cols: list[str] = []
        mr = re.search(r"ReadSchema: struct<([^>]*)>", b)
        if mr and mr.group(1).strip():
            cols = [c.split(":")[0].strip() for c in mr.group(1).split(",") if ":" in c]
        scans.append(ScanInfo(fmt, loc, pushed, cols))
    return PlanReport(text, scans)


def scan_report(df: DataFrame) -> dict:
    """Compact dict summary (used by audits/debugging): per-scan pushdown
    and projection, join/exchange/codegen counts."""
    r = analyze(df)
    return {
        "scans": [
            {
                "format": s.format,
                "location": s.location,
                "pushed_filters": s.pushed_filters,
                "read_columns": s.read_columns,
            }
            for s in r.scans
        ],
        "broadcast_joins": r.broadcast_joins,
        "sort_merge_joins": r.sort_merge_joins,
        "exchanges": r.exchanges,
        "reused_exchanges": r.reused_exchanges,
        "codegen_stages": r.codegen_stages,
    }
