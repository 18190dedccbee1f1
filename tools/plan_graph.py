"""Parse Spark's ``formatted`` explain output into a node graph.

Used by the repo-wide plan lints (tests/test_plan_lint.py) to ask structural
questions plain substring checks can't answer — e.g. "is this Exchange
SinglePartition feeding a Sort/Window (a single-task global sort, a scale
hazard) or a scalar HashAggregate (a 1-row reduction, benign)?".

The formatted explain has two sections: an indented tree where every node
line ends with ``(<id>)``, and per-node detail blocks starting
``(<id>) NodeName`` followed by ``Key: value`` lines. We take parent/child
structure from the tree and operator arguments from the details.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class PlanNode:
    node_id: int
    name: str
    details: str = ""
    children: list["PlanNode"] = field(default_factory=list)
    parent: "PlanNode | None" = None


_TREE_RE = re.compile(r"^(\s*)(?:[*+:\\-]+\s*)*([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$")
_DETAIL_RE = re.compile(r"^\((\d+)\)\s+(\S+)")


def parse_formatted_plan(plan: str) -> dict[int, PlanNode]:
    """Return {node_id: PlanNode} with parent/child links and detail text."""
    nodes: dict[int, PlanNode] = {}
    stack: list[tuple[int, PlanNode]] = []  # (indent depth, node)
    in_tree = True
    detail_id: int | None = None
    for line in plan.splitlines():
        if in_tree:
            m = _TREE_RE.match(line)
            if m:
                # depth = count of structural prefix chars before the name
                depth = len(line) - len(line.lstrip(" *+:-\\"))
                node = nodes.setdefault(
                    int(m.group(3)), PlanNode(int(m.group(3)), m.group(2).strip())
                )
                node.name = m.group(2).strip()
                while stack and stack[-1][0] >= depth:
                    stack.pop()
                if stack:
                    node.parent = stack[-1][1]
                    stack[-1][1].children.append(node)
                stack.append((depth, node))
                continue
            if line.strip() == "" and nodes:
                in_tree = False
            continue
        m = _DETAIL_RE.match(line)
        if m:
            detail_id = int(m.group(1))
            nodes.setdefault(detail_id, PlanNode(detail_id, m.group(2)))
            continue
        if detail_id is not None and line.strip():
            nodes[detail_id].details += line + "\n"
    return nodes


_SORTY = ("Sort", "Window", "WindowGroupLimit")


def single_partition_sorts(plan: str) -> list[str]:
    """Names of Sort/Window nodes fed by an Exchange SinglePartition.

    These run the whole input through ONE task — the pattern that turns a
    data-cardinality ranking into a single-executor bottleneck at 100 TB.
    Scalar aggregates (HashAggregate over SinglePartition, a 1-row
    reduction after map-side partials) and rangepartitioning output sorts
    are deliberately NOT flagged.
    """
    nodes = parse_formatted_plan(plan)
    hits: list[str] = []
    for n in nodes.values():
        base = n.name.split()[0]
        if base not in _SORTY:
            continue
        # walk through wholestagecodegen wrappers / InputAdapters
        frontier = list(n.children)
        while frontier:
            c = frontier.pop()
            cbase = c.name.split()[0]
            if cbase in ("InputAdapter", "WholeStageCodegen"):
                frontier.extend(c.children)
            elif cbase == "Exchange" and "SinglePartition" in c.details:
                hits.append(f"{n.name}({n.node_id})")
                break
    return hits
