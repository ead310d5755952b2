"""Op-graph inspection: tree rendering and statistics.

The reference's "yay dependent types" ergonomics (``README.md:140-142``)
come from GHC printing the op's type; the staged-IR analog is printing
the graph itself — every node with its stack signature, indented by
structure — plus quick size/depth statistics.  Debugging aid only; no
evaluation happens here.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .ir import TOp
from .shapes import fmt_stack

#: attribute names under which IR nodes keep child ops
_CHILD_ATTRS = ("f", "g", "op", "step")


def children(op: TOp) -> List[Tuple[str, TOp]]:
    """The node's child ops as ``(attr_name, child)`` pairs (Compose's
    f/g, First/Second/Mapped/Remat's op, ScanOp's step, ...)."""
    out = []
    for name in _CHILD_ATTRS:
        c = getattr(op, name, None)
        if isinstance(c, TOp):
            out.append((name, c))
    return out


def describe(op: TOp, max_depth: int = 0) -> str:
    """Multi-line tree rendering of an op graph::

        Compose([(2,), (3, 2), (3,)] -> [(3,)])
        ├─f: First([(2,), (3, 2)] -> [(3,)])
        │  └─op: Compose([(2,), (3, 2)] -> [(3,)])
        ...

    ``max_depth > 0`` truncates deeper structure with an ellipsis node
    (useful for unrolled/then-chained networks)."""
    lines: List[str] = []

    def rec(o: TOp, prefix: str, child_prefix: str, name: str, depth: int):
        label = f"{name}: " if name else ""
        lines.append(f"{prefix}{label}{o!r}")
        kids = children(o)
        if kids and max_depth and depth >= max_depth:
            lines.append(f"{child_prefix}└─... ({count_nodes(o) - 1} more "
                         f"nodes)")
            return
        for i, (attr, c) in enumerate(kids):
            last = i == len(kids) - 1
            rec(c,
                child_prefix + ("└─" if last else "├─"),
                child_prefix + ("   " if last else "│  "),
                attr, depth + 1)

    rec(op, "", "", "", 0)
    return "\n".join(lines)


def count_nodes(op: TOp) -> int:
    return 1 + sum(count_nodes(c) for _, c in children(op))


def graph_stats(op: TOp) -> Dict[str, object]:
    """Size/shape summary of an op graph: total node count, structural
    depth, leaf-node histogram, and the stack signature."""
    by_type: Dict[str, int] = {}

    def rec(o: TOp, depth: int) -> int:
        kids = children(o)
        if not kids:
            by_type[type(o).__name__] = by_type.get(type(o).__name__, 0) + 1
            return depth
        return max(rec(c, depth + 1) for _, c in kids)

    depth = rec(op, 0)
    return {
        "nodes": count_nodes(op),
        "depth": depth,
        "leaves": dict(sorted(by_type.items())),
        "signature": f"{fmt_stack(op.in_stack)} -> {fmt_stack(op.out_stack)}",
    }
