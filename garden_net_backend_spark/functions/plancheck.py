"""Physical-plan guardrails: assert a DataFrame's plan is free of
scale-killers BEFORE running it on 100 TB.

PLANS.md documents the plans we ship; this module makes the same
checks availble programmatically — CI asserts them per operator, and a
pipeline driver can refuse to launch a job whose plan regressed into a
cartesian product after an innocent-looking change.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Operators that mean "this will not survive a scale-up" in almost any
# engine plan. BroadcastNestedLoopJoin is allowed only when a caller
# explicitly opts in (some one-row-scalar compositions legitimately
# plan as BNLJ over a single broadcast row).
DEFAULT_FORBIDDEN = ("CartesianProduct",)


class ScaleHazard(AssertionError):
    """A forbidden operator or budget violation in the physical plan."""


def plan_string(df: DataFrame) -> str:
    """The pre-execution physical plan (initial adaptive plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(plan: str) -> int:
    return len(re.findall(r"\bExchange\b", plan))


def assert_scalable_plan(
    df: DataFrame,
    forbid: tuple[str, ...] = DEFAULT_FORBIDDEN,
    forbid_bnlj: bool = True,
    max_exchanges: int | None = None,
) -> str:
    """Raise :class:`ScaleHazard` if the plan contains a forbidden
    operator (default: ``CartesianProduct``; ``forbid_bnlj=True`` adds
    ``BroadcastNestedLoopJoin``), or shuffles more than
    ``max_exchanges`` times. Returns the plan string on success so
    callers can log it.
    """
    plan = plan_string(df)
    hazards = list(forbid) + (
        ["BroadcastNestedLoopJoin"] if forbid_bnlj else []
    )
    for op in hazards:
        if op in plan:
            line = next(
                (ln.strip()[:160] for ln in plan.splitlines() if op in ln), op
            )
            raise ScaleHazard(f"forbidden operator {op} in plan: {line}")
    if max_exchanges is not None:
        n = count_exchanges(plan)
        if n > max_exchanges:
            raise ScaleHazard(
                f"plan shuffles {n} times (budget {max_exchanges})"
            )
    return plan
