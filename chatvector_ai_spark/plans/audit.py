"""Physical-plan audits: assert the plan you designed is the plan you got.

``.explain("formatted")`` as a testable API — extract the facts that matter
at 100 TB (did the filter reach the scan? is the dimension broadcast? did a
Python stage sneak into a JVM-only path?) so regressions in plan shape fail
CI instead of shipping a 10× slowdown. (SURVEY.md §4: Catalyst provides the
rewrites; these audits pin that our query shapes actually trigger them.)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffle_hash_joins: int = 0
    exchanges: int = 0
    wholestage_codegen_spans: int = 0
    python_evals: int = 0
    window_ops: int = 0
    unpartitioned_windows: int = 0
    aggregates: int = 0

    def has_pushed_filter(self, fragment: str) -> bool:
        return any(fragment in p for p in self.pushed_filters)

    def reads_only_columns(self, *cols: str) -> bool:
        """True if every scan's ReadSchema mentions no column outside *cols*."""
        for rs in self.read_schemas:
            for name in re.findall(r"(\w+):", rs):
                if name not in cols:
                    return False
        return True


def plan_facts(df: DataFrame) -> PlanFacts:
    text = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # noqa: SLF001
    facts = PlanFacts(text=text)
    facts.pushed_filters = re.findall(r"PushedFilters: \[(.*?)\]", text)
    facts.read_schemas = re.findall(r"ReadSchema: struct<(.*?)>", text)
    # count operators from the numbered node listing — each physical node
    # appears once as "(<id>) <OpName>" in the formatted details
    ops = [m.group(2) for m in re.finditer(r"^\((\d+)\) (\w+)", text, re.M)]
    facts.broadcast_joins = sum(o == "BroadcastHashJoin" for o in ops)
    facts.sortmerge_joins = sum(o == "SortMergeJoin" for o in ops)
    facts.shuffle_hash_joins = sum(o == "ShuffledHashJoin" for o in ops)
    facts.exchanges = sum(o in ("Exchange", "AQEShuffleRead") for o in ops)
    facts.wholestage_codegen_spans = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
    facts.python_evals = sum(
        o in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        for o in ops
    )
    facts.window_ops = sum(o in ("Window", "WindowGroupLimit") for o in ops)
    # a Window node's Arguments line holds [exprs], [partition spec],
    # [order spec], with EMPTY specs omitted — so two lists is ambiguous
    # (partition-only vs order-only). Order-spec items always carry an
    # ASC/DESC NULLS marker and partition items never do, so a 2-list
    # window whose second list is an order spec has NO partition: the
    # move-the-world-to-one-partition shape these audits exist to ban.
    for m in re.finditer(r"^\(\d+\) Window(?:\n(?!\().*)*", text, re.M):
        args = re.search(r"Arguments: (.*)", m.group(0))
        if not args:
            continue
        lists = args.group(1).split("], [")
        if len(lists) < 3 and (
            len(lists) < 2 or re.search(r"(ASC|DESC) NULLS", lists[1])
        ):
            facts.unpartitioned_windows += 1
    facts.aggregates = sum(o in ("HashAggregate", "ObjectHashAggregate", "SortAggregate") for o in ops)
    return facts
