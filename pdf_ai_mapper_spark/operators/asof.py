"""As-of (point-in-time) join — the time-series alignment operator a
training-data pipeline needs for joining events to the most recent
snapshot/checkpoint/feature row at or before each event's timestamp.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas ``merge_asof`` do),
and the naive formulation — range join + per-row max — explodes into
an O(|L|·|R|) BroadcastNestedLoopJoin per key. The scalable
re-expression used here is the UNION + windowed ``last(ignorenulls)``
trick (the standard distributed as-of):

1. stack both tables with a source marker; the right side's payload
   columns ride in a single non-null STRUCT, which is NULL on left
   rows;
2. ONE hash shuffle on the join key, sort by (ts, marker) inside each
   partition group;
3. ``last(payload_struct, ignorenulls=True)`` over the running window
   carries the latest right row's full payload forward onto every left
   row — one struct means all payload columns come from the SAME right
   row, and a right row whose individual payload value is NULL still
   supersedes older rows (matching DuckDB ASOF);
4. filter back to left rows and unpack the struct.

Cost: one shuffle of |L|+|R| narrow rows — no join blowup, no skewed
range intervals; backward-inclusive semantics (a right row with
ts_r == ts matches) identical to DuckDB's
``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``, which is the
oracle for q_asof_join.

Determinism contract: callers must ensure the right side has at most
one row per (key, ts) — with duplicates, "the" latest right row is
not well-defined (DuckDB's ASOF has the same ambiguity). The helper
raises nothing at scale (no validation scan); dedupe upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: str, left_ts: str, right_ts: str,
              payload_cols: list[str] | None = None) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains the
    payload columns of the latest ``right`` row with the same ``on``
    key and ``right_ts`` <= ``left_ts`` (NULLs where no such row).

    Returns all ``left`` columns plus ``payload_cols`` (default: every
    right column except the key and timestamp).
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f'payload columns collide with left: {sorted(overlap)}')

    # All payload columns ride in ONE struct so that (a) they are
    # guaranteed to come from the same right row, and (b) a right row
    # whose payload value is legitimately NULL still "wins" — the
    # struct itself is non-null on every right row, so
    # last(ignorenulls) never skips past it to an older row's value.
    r = (right
         .withColumn('__ts', F.col(right_ts))
         .withColumn('__src', F.lit(0))
         .withColumn('__payload',
                     F.struct(*[F.col(c) for c in payload_cols]))
         .select(F.col(on), '__ts', '__src', '__payload'))
    payload_type = r.schema['__payload'].dataType

    # marker 0 sorts BEFORE marker 1 at equal ts → right rows at
    # ts_r == ts are visible to the left row (inclusive semantics)
    l = (left
         .withColumn('__ts', F.col(left_ts))
         .withColumn('__src', F.lit(1))
         .withColumn('__payload', F.lit(None).cast(payload_type)))
    left_cols = [c for c in left.columns]
    stacked = l.select(F.col(on), '__ts', '__src', '__payload',
                       *[c for c in left_cols if c not in (on,)]
                       ).unionByName(r, allowMissingColumns=True)

    w = (Window.partitionBy(on)
         .orderBy('__ts', '__src')
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    stacked = stacked.withColumn(
        '__payload', F.last('__payload', ignorenulls=True).over(w))
    return (stacked.filter(F.col('__src') == 1)
            .select(*left_cols,
                    *[F.col('__payload').getField(c).alias(c)
                      for c in payload_cols]))
