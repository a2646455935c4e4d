"""As-of (point-in-time) join — the time-series alignment operator a
training-data pipeline needs for joining events to the most recent
snapshot/checkpoint/feature row at or before each event's timestamp.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas ``merge_asof`` do),
and the naive formulation — range join + per-row max — explodes into
an O(|L|·|R|) BroadcastNestedLoopJoin per key. The scalable
re-expression is the UNION + windowed ``last(ignorenulls)`` trick
(the standard distributed as-of):

1. stack left (key, ts) rows and right (key, ts, payload-struct) rows
   with a source marker; the right payload rides in ONE non-null
   STRUCT so all payload columns are guaranteed to come from the SAME
   right row and a right row whose individual payload value is NULL
   still supersedes older rows (matching DuckDB ASOF);
2. ONE hash shuffle on the join key, sort by (ts, marker) inside each
   partition group — marker 0 before 1 at equal ts gives
   backward-INCLUSIVE semantics (ts_r == ts matches), identical to
   DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``;
3. ``last(payload_struct, ignorenulls=True)`` over the running window
   carries the latest right payload forward onto every left row.

**Two strategies for where the left's OTHER columns go** (round 5 —
this is a genuine cost-based choice, both paths measured at sf0.1 /
local[32] in the same quiet interleaved A/B):

- ``inline``: the full left rows ride through the window shuffle.
  Best when the left payload is SKINNY (fixed-width columns): the
  exchange carries barely more bytes than the keys and there is no
  second join. Measured 0.57-0.61 s on the 100k-event benchmark
  query.
- ``narrow``: only (key, ts, marker, payload) enters the window; the
  resolved (key, ts) → payload table equi-joins back to the full left
  (AQE broadcasts it when small). Mandatory when left rows are WIDE
  (document text, embeddings): at 100 TB the inline form would sort
  and shuffle the whole corpus, while narrow shuffles only key-width
  rows — payloads move through one hash join with no sort. Costs one
  extra scan of the left's key columns plus the join-back build
  (measured +0.25 s on the same skinny benchmark — the overhead is a
  constant, not a scale term). Dedup of duplicate left (key, ts)
  pairs happens AFTER the window via row_number over the SAME
  partitioning, so Catalyst runs both windows with one exchange and
  one sort (a pre-``distinct`` cost a whole extra shuffle, measured).
- ``auto`` (default): ``inline`` iff every left payload column is a
  fixed-width atomic type (numeric/bool/date/timestamp) — a schema
  can't reveal string width, so ANY string/binary/complex column
  routes to ``narrow``, the never-catastrophic choice. Callers with
  known-short string columns (categorical codes) can force
  ``inline``.

NULL semantics, narrow path: the join-back uses plain SQL equality,
so left rows with a NULL key or NULL timestamp get NULL payloads —
exactly DuckDB's ASOF behavior. The inline path groups NULL keys
together via partitionBy (NULL-keyed right rows can match NULL-keyed
left rows); with non-null keys the two paths are byte-identical
(tested).

Determinism contract: callers must ensure the right side has at most
one row per (key, ts) — with duplicates, "the" latest right row is
not well-defined (DuckDB's ASOF has the same ambiguity). The helper
raises nothing at scale (no validation scan); dedupe upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RESERVED = ('__on', '__ts', '__src', '__payload', '__rn')

_FIXED_WIDTH = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.FloatType, T.DoubleType, T.BooleanType, T.DateType,
                T.TimestampType, T.TimestampNTZType, T.DecimalType)


def _window_spec():
    return (Window.partitionBy('__on')
            .orderBy('__ts', '__src')
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))


def asof_join(left: DataFrame, right: DataFrame,
              on: str, left_ts: str, right_ts: str,
              payload_cols: list[str] | None = None,
              strategy: str = 'auto') -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains the
    payload columns of the latest ``right`` row with the same ``on``
    key and ``right_ts`` <= ``left_ts`` (NULLs where no such row).

    Returns all ``left`` columns plus ``payload_cols`` (default: every
    right column except the key and timestamp). ``strategy`` is
    ``'inline'`` / ``'narrow'`` / ``'auto'`` — see the module
    docstring for the cost model.
    """
    if strategy not in ('auto', 'inline', 'narrow'):
        raise ValueError(f'unknown strategy {strategy!r}')
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f'payload columns collide with left: {sorted(overlap)}')
    reserved = set(_RESERVED) & set(left.columns)
    if reserved:
        raise ValueError(f'left columns collide with internals: {sorted(reserved)}')

    if strategy == 'auto':
        extra = [f for f in left.schema.fields
                 if f.name not in (on, left_ts)]
        skinny = all(isinstance(f.dataType, _FIXED_WIDTH) for f in extra)
        strategy = 'inline' if skinny else 'narrow'

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
         .select(F.col(on).alias('__on'), '__ts', '__src', '__payload'))
    payload_type = r.schema['__payload'].dataType

    if strategy == 'inline':
        return _asof_inline(left, r, on, left_ts, payload_cols, payload_type)
    return _asof_narrow(left, r, on, left_ts, payload_cols, payload_type)


def _asof_inline(left, r, on, left_ts, payload_cols, payload_type):
    """Full left rows through the window — skinny-payload fast path."""
    l = (left
         .withColumn('__ts', F.col(left_ts))
         .withColumn('__src', F.lit(1))
         .withColumn('__payload', F.lit(None).cast(payload_type)))
    left_cols = list(left.columns)
    stacked = (l.select(F.col(on).alias('__on'), '__ts', '__src',
                        '__payload', *left_cols)
               .unionByName(r, allowMissingColumns=True))
    stacked = stacked.withColumn(
        '__payload', F.last('__payload', ignorenulls=True).over(_window_spec()))
    return (stacked.filter(F.col('__src') == 1)
            .select(*left_cols,
                    *[F.col('__payload').getField(c).alias(c)
                      for c in payload_cols]))


def _asof_narrow(left, r, on, left_ts, payload_cols, payload_type):
    """Key-width rows through the window; payloads join back — the
    wide-left scale path (left payload never enters the window
    exchange or its sort; plan-pinned in tests/test_plan_audit.py)."""
    lk = (left
          .select(F.col(on).alias('__on'), F.col(left_ts).alias('__ts'))
          .withColumn('__src', F.lit(1))
          .withColumn('__payload', F.lit(None).cast(payload_type)))

    # duplicate left (key, ts) pairs all see the same running payload
    # (only null-payload left rows can sit between them), so keeping
    # rn == 1 loses nothing; the rn window reuses the main window's
    # partitioning AND sort (one exchange, one sort — Catalyst also
    # pushes a WindowGroupLimit)
    w_dedup = Window.partitionBy('__on', '__ts').orderBy('__src')
    resolved = (lk.unionByName(r)
                .withColumn('__payload',
                            F.last('__payload',
                                   ignorenulls=True).over(_window_spec()))
                .filter(F.col('__src') == 1)
                .withColumn('__rn', F.row_number().over(w_dedup))
                .filter(F.col('__rn') == 1)
                .select('__on', '__ts', '__payload'))

    # ONE equi-join carries the wide left rows; AQE broadcasts the
    # resolved table when it is small, so the left payloads never
    # shuffle at all.
    joined = left.join(
        resolved,
        (F.col(on) == F.col('__on')) & (F.col(left_ts) == F.col('__ts')),
        'left')
    return joined.select(
        *left.columns,
        *[F.col('__payload').getField(c).alias(c) for c in payload_cols])
