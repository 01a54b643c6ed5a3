"""Plan introspection utilities.

The reference materializes its plans as inspectable IR
(``LogicalPlan`` Debug strings drive its planner tests,
``src/sqlplanner.rs:751-759``). We never reimplement plans — Catalyst
owns them — but we DO assert on their physical properties:
:mod:`inspect` extracts pushed filters, join strategies, exchange
counts, and codegen coverage from ``explain`` output so tests and the
PERF audit can pin "the plan we'd want" (pushdown happened, the join
broadcast, no extra shuffle) instead of eyeballing.
"""

from datafusion_archive_spark.plans.inspect import PlanSummary, summarize

__all__ = ["PlanSummary", "summarize"]
