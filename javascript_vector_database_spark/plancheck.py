"""Physical-plan text introspection for the scale guards.

Spark prints every window operator's spec as
``windowspecdefinition(part..., order ASC/DESC NULLS ..., frame)`` —
partition columns are bare expressions, order columns carry a direction
suffix, the frame is a ``specifiedwindowframe(...)`` tail.  Parsing that
(balance-aware, the expressions nest parens) lets the test suite assert
the repo-wide scale invariant: NO query may run an unpartitioned window
over an unbounded input.  The rank/skyline helpers' bounded P-row offset
windows order by ``__pid`` and are recognized structurally; everything
else unpartitioned must be whitelisted with a bounded-input
justification (tests/test_registry_sweep.py).
"""

from __future__ import annotations

import re

_ORDER_RE = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (paren-balance aware)."""
    out: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def windowspecs(plan: str):
    """Yield (partition_args, order_args) for every windowspecdefinition
    in a physical-plan string."""
    i = 0
    while True:
        j = plan.find("windowspecdefinition(", i)
        if j < 0:
            return
        k = j + len("windowspecdefinition(")
        depth, end = 1, k
        while depth and end < len(plan):
            if plan[end] == "(":
                depth += 1
            elif plan[end] == ")":
                depth -= 1
            end += 1
        parts: list[str] = []
        orders: list[str] = []
        for a in _split_top(plan[k : end - 1]):
            if a.startswith("specifiedwindowframe"):
                continue
            (orders if _ORDER_RE.search(a) else parts).append(a)
        yield parts, orders
        i = end


def unpartitioned_window_keys(plan: str) -> list[str]:
    """Order-key signatures of every windowspecdefinition that has no
    partition columns AND is not a rank/skyline-discipline offset window
    (all order keys on the synthetic ``__pid`` partition-count grain,
    which is bounded at <= P rows by construction).

    An empty signature (``""``) is an ``OVER ()`` global window — also
    unpartitioned, reported so callers must justify its input bound."""
    out: list[str] = []
    for parts, orders in windowspecs(plan):
        if parts:
            continue
        keys = [o.split("#")[0].lstrip("(") for o in orders]
        if keys and all(k.startswith("__pid") for k in keys):
            continue
        out.append(", ".join(keys))
    return out
