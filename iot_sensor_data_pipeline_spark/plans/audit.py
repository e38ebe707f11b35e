"""Physical-plan auditing: flag the scale-killers in a DataFrame's
executed plan before it runs on the big cluster.

The repo's own test suite pins plan shapes per operator
(tests/test_plans.py); this module exposes the same checks as a library
call so USERS can gate their ad-hoc queries the way the engine gates
its built-ins — e.g. in a CI hook or a notebook pre-flight:

    findings = audit_plan(df)
    assert not blocking(findings), findings

Heuristics are conservative and explain themselves; each finding
carries a severity ('block' = will not survive a 100x scale-up,
'warn' = needs a look) and the plan fragment that triggered it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    severity: str  #: 'block' | 'warn'
    rule: str
    detail: str


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _node_depth(line: str) -> int:
    """Character position of a plan line's tree connector ('+-'/':-'),
    -3 for the root line (no connector) so root children sit at 0."""
    for idx in range(len(line) - 1):
        if line[idx] in "+:" and line[idx + 1] == "-":
            return idx
        if line[idx] not in " :":
            break
    return -3


def _build_child(lines: list[str], join_idx: int) -> int | None:
    """Line index of the BUILD child subtree root of the join printed
    at ``join_idx`` (children print at depth+3; BuildRight = second
    child, BuildLeft = first)."""
    want = _node_depth(lines[join_idx]) + 3
    children = []
    for j in range(join_idx + 1, len(lines)):
        d = _node_depth(lines[j])
        if d < want:
            break  # left the join's subtree
        if d == want:
            children.append(j)
            if len(children) == 2:
                break
    if not children:
        return None
    build_right = "BuildLeft" not in lines[join_idx]
    if build_right:
        return children[1] if len(children) == 2 else None
    return children[0]


def audit_plan(df: DataFrame, *, allow_bnlj_scalar: bool = True) -> list[Finding]:
    """Inspect ``df``'s executed physical plan and return findings.

    Rules:
      - CartesianProduct                      -> block (O(|L|x|R|))
      - BroadcastNestedLoopJoin               -> block, unless
        ``allow_bnlj_scalar`` and the build side is a 1-row aggregate
        (scalar-subquery threshold pattern), then warn
      - Exchange SinglePartition feeding a Sort/Window/agg
        (global single-task funnel)           -> block
      - row-at-a-time Python eval (BatchEvalPython) -> block
        (Arrow paths — ArrowEvalPython / FlatMapGroupsInPandas /
        MapInPandas — are fine and not flagged)
      - > 8 shuffle exchanges                 -> warn (re-derive or
        checkpoint a midpoint)
      - parquet scan with no ReadSchema pruning visible -> not checked
        here (needs the analyzed schema); use .explain('formatted')
    """
    plan = _executed_plan(df)
    lines = plan.splitlines()
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding("block", "cartesian-product",
                    "CartesianProduct in plan: O(|L| x |R|) rows; add an "
                    "equi-condition or bucketize a range key")
        )
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        # the sanctioned pattern: THIS join's broadcast build side is a
        # global (no-grouping-key) aggregate — a 1-row scalar
        # threshold. The build side must be located by TREE STRUCTURE
        # (the build child of this join node), not by scanning forward
        # for the first IdentityBroadcastMode — the probe subtree
        # prints first and may itself contain a nested sanctioned BNLJ
        # whose marker would otherwise be misattributed to this join.
        build = _build_child(lines, i)
        scalar_build = False
        if build is not None and "BroadcastExchange IdentityBroadcastMode" in lines[build]:
            below = "\n".join(lines[build + 1: build + 4])
            scalar_build = (
                "HashAggregate(keys=[]" in below
                or "SortAggregate(key=[]" in below
            )
        sev = "warn" if (allow_bnlj_scalar and scalar_build) else "block"
        findings.append(
            Finding(sev, "broadcast-nested-loop",
                    "BroadcastNestedLoopJoin: every probe row scans the whole "
                    "build side; acceptable only when the build side is a "
                    "1-row scalar (threshold) relation"
                    + ("" if scalar_build else " — and this build side is not one"))
        )
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            # the printed tree reads top-down: consumers are ABOVE the
            # exchange, its input is BELOW. A SinglePartition exchange
            # whose input is a partial HashAggregate is the normal
            # two-phase global aggregate (carries #partitions rows) —
            # fine. The killer is a Sort or Window consuming one.
            consumers = "\n".join(lines[max(0, i - 6): i])
            below = "\n".join(lines[i + 1: i + 3])
            if "HashAggregate" in below or "SortAggregate" in below:
                continue
            if "Sort" in consumers or "Window" in consumers:
                ctx = "\n".join(lines[max(0, i - 3): i + 1])
                findings.append(
                    Finding("block", "single-partition-funnel",
                            "Exchange SinglePartition feeds a Sort/Window: "
                            "the whole relation lands on one task. Use "
                            "TakeOrderedAndProject (orderBy+limit), a keyed "
                            "window, or two-phase aggregation.\n" + ctx)
                )
                break
    if "BatchEvalPython" in plan:
        findings.append(
            Finding("block", "row-at-a-time-python",
                    "BatchEvalPython: row-at-a-time Python UDF in the plan; "
                    "use built-in functions or a pandas_udf (ArrowEvalPython)")
        )
    n_exchange = plan.count("Exchange hashpartitioning")
    if n_exchange > 8:
        findings.append(
            Finding("warn", "many-shuffles",
                    f"{n_exchange} hash exchanges in one plan; consider "
                    "checkpointing a midpoint or reusing a partitioning")
        )
    return findings


def blocking(findings: list[Finding]) -> list[Finding]:
    return [f for f in findings if f.severity == "block"]


class StreamAuditor:
    """The same scale-killer gate for STREAMING pipelines:
    ``audit_plan`` reads a batch DataFrame's executed plan, so it can't
    see inside a running stream — but every foreachBatch callback
    receives a plain batch DataFrame. Pass an instance to the job
    builders in ``streaming.jobs`` (``auditor=StreamAuditor()``) and
    each micro-batch's inner plan (including any per-batch
    ``transform``) is audited as it runs.

    Warn-once channel: a long-running stream re-executes the same plan
    shape every trigger, so each distinct (severity, rule) logs ONE
    warning (``logging`` logger of this module) and is recorded in
    ``findings`` — poll that list from tests/monitoring, or gate hard
    by checking ``blocking(auditor.findings)`` after a smoke run.
    Auditing never fails the stream: a finding is a report, and plan
    introspection errors are swallowed (the data path wins).
    """

    def __init__(self, name: str = "stream", allow_bnlj_scalar: bool = True):
        self.name = name
        self.allow_bnlj_scalar = allow_bnlj_scalar
        self.findings: list[Finding] = []
        self._seen: set[tuple[str, str]] = set()

    def check(self, batch_df: DataFrame) -> None:
        import logging

        try:
            found = audit_plan(
                batch_df, allow_bnlj_scalar=self.allow_bnlj_scalar
            )
        except Exception:  # pragma: no cover - defensive: never kill the stream
            return
        for f in found:
            key = (f.severity, f.rule)
            if key in self._seen:
                continue
            self._seen.add(key)
            self.findings.append(f)
            logging.getLogger(__name__).warning(
                "[%s] micro-batch plan finding (%s) %s: %s",
                self.name, f.severity, f.rule, f.detail,
            )
