"""Measured plan metrics: turn "this operator doesn't shuffle" from a
plan-shape claim into a runtime BYTE count.

Plan-string pins (no Exchange / no SortMergeJoin) prove shape; these
helpers execute a DataFrame and read the SQL metrics off the executed
plan — actual shuffle bytes/records written, broadcast sizes, spills —
so scale-critical invariants are asserted against what the engine DID,
not what the optimizer printed. At 100 TB the difference matters: an
"extra" exchange of 40 KB (a bloom filter's packed words) is free; the
same node shuffling the fact table is the bottleneck. Byte-level
assertions distinguish the two where node-counting can't.

Execution happens JVM-side (``executedPlan().execute().count()`` — an
RDD action), so no rows cross into Python; safe on relations far too
large to collect. AQE is handled by recursing through
AdaptiveSparkPlan/QueryStage wrappers into the final physical plan.

Caveats: metrics accumulate per QueryExecution — pass a FRESHLY built
DataFrame (re-running the same object double-counts); streaming
queries have per-batch executions and are not covered here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["NodeMetrics", "ShuffleSummary", "executed_metrics", "shuffle_summary"]


@dataclass(frozen=True)
class NodeMetrics:
    name: str  #: nodeName(), e.g. "Exchange"
    cls: str  #: JVM class, e.g. "ShuffleExchangeExec"
    metrics: dict[str, int]


@dataclass(frozen=True)
class ShuffleSummary:
    n_shuffles: int = 0
    shuffle_bytes: int = 0
    shuffle_records: int = 0
    n_broadcasts: int = 0
    broadcast_bytes: int = 0
    spill_bytes: int = 0
    nodes: tuple[NodeMetrics, ...] = field(default=())


def _node_metrics(node) -> dict[str, int]:
    vals: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _walk(node, out: list[NodeMetrics]) -> None:
    name = node.nodeName()
    cls = node.getClass().getSimpleName()
    if cls == "ReusedExchangeExec":
        # points at an exchange counted where it was built — skip to
        # avoid double-charging its bytes
        return
    out.append(NodeMetrics(name, cls, _node_metrics(node)))
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
        return
    if "QueryStageExec" in cls:
        _walk(node.plan(), out)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)


def executed_metrics(df: DataFrame, run: bool = True) -> list[NodeMetrics]:
    """Execute ``df`` (JVM-side, nothing collected) and return each
    physical node's SQL metrics, pre-order."""
    plan = df._jdf.queryExecution().executedPlan()
    if run:
        plan.execute().count()  # RDD action: full execution, zero transfer
        plan = df._jdf.queryExecution().executedPlan()
    out: list[NodeMetrics] = []
    _walk(plan, out)
    return out


def shuffle_summary(df: DataFrame, run: bool = True) -> ShuffleSummary:
    """Aggregate shuffle/broadcast/spill metrics for one execution of
    ``df``. ``shuffle_bytes`` is the on-the-wire shuffle write volume —
    the number that must stay o(|input|) for a scan-dominated operator
    to survive a 100 TB input."""
    nodes = executed_metrics(df, run=run)
    n_sh = sh_b = sh_r = n_bc = bc_b = sp_b = 0
    for n in nodes:
        sp_b += n.metrics.get("spillSize", 0)
        if n.cls == "ShuffleExchangeExec":
            n_sh += 1
            sh_b += n.metrics.get("shuffleBytesWritten", 0)
            sh_r += n.metrics.get("shuffleRecordsWritten", 0)
        elif n.cls == "BroadcastExchangeExec":
            n_bc += 1
            bc_b += n.metrics.get("dataSize", 0)
    return ShuffleSummary(n_sh, sh_b, sh_r, n_bc, bc_b, sp_b, tuple(nodes))
