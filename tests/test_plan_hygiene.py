"""Structural plan hygiene over the whole query surface.

Pins the round-4 property that made the rank_select rewrite worth
doing: NO query's optimized plan may contain an unpartitioned window
(``windowspecdefinition`` with an empty partition spec). An
unpartitioned window funnels the whole input through one reducer —
the literal "WindowExec: No Partition Defined" warning — and is the
single easiest way to ship a plan that works on fixtures and dies at
cluster scale. Catalyst also constant-folds foldable partition keys
(``partitionBy(F.lit(0))``) into exactly this shape, so the check
must read the OPTIMIZED plan, not the code.

Spec grammar: ``windowspecdefinition(partCols..., orderCols...,
frame)`` — partition attributes print bare, order columns carry
ASC/DESC, the frame is last; an empty partition spec therefore
starts with an ordered column or the frame itself.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def _unpartitioned_specs(plan: str) -> list[str]:
    hits = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first = m.group(1).split(",")[0].strip()
        if first.startswith("specifiedwindowframe") or (
            " ASC" in first or " DESC" in first
        ):
            hits.append(first[:60])
    return hits


def test_no_query_plans_an_unpartitioned_window(spark, sf_small):
    offenders = {}
    for name, fn in entrymod.queries().items():
        plan = (
            fn(spark, sf_small)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        hits = _unpartitioned_specs(plan)
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "queries planning single-reducer windows (whole input through "
        f"one task at scale): {offenders}"
    )
