"""Link-graph centrality for corpus quality scoring.

Web-scale training pipelines weight documents by the link graph
(host/page centrality is a standard quality prior alongside the text
signals in textstats.py). This module implements power-iteration
PageRank in EXACT INTEGER FIXED-POINT arithmetic: ranks are integers
scaled by 10^12 and every step uses integer division, so the result is
bit-identical on any engine, any partitioning, any summation order —
which makes an iterative graph algorithm value-checkable against a SQL
oracle (floating-point power iteration diverges across engines in the
last ulps and compounds over iterations; exact reproducibility is also
what makes ranking regressions testable in production).

Update rule per iteration (damping d = num/den, default 85/100):

    contrib(v) = Σ_{u→v} R(u) // outdeg(u)
    R'(v)      = (den−num)·SCALE // den  +  num·contrib(v) // den

Truncation loses a bounded sliver of probability mass per step (< 1
unit per edge + node); ranks remain a faithful centrality ORDER, which
is all the quality prior consumes.

Spark shape per iteration: one join of the persisted (src, dst,
outdeg) edge table against the previous ranks — referenced exactly
ONCE, so the logical plan grows linearly (see
dedup.connected_components for the plan-doubling trap) — one narrow
(dst, contrib) aggregate, one left join back to the persisted node
table. Fixed iteration count: no convergence action, no driver sync
beyond the loop itself; periodic localCheckpoint truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10 ** 12


def pagerank(edges: DataFrame, src: str = 'src', dst: str = 'dst',
             iterations: int = 10, damp_num: int = 85,
             damp_den: int = 100) -> DataFrame:
    """(node, rank) after ``iterations`` exact fixed-point power steps.

    Nodes = src ∪ dst of ``edges``; duplicate edges are kept (parallel
    edges weight the link, as in the classic formulation over raw link
    tables). Dangling nodes (no out-edges) contribute nothing — at
    corpus scale, drop or self-loop them upstream if their mass
    matters."""
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst'))
    nodes = (e.select(F.col('src').alias('node'))
             .unionByName(e.select(F.col('dst').alias('node')))
             .distinct()
             .persist())
    outdeg = e.groupBy('src').agg(F.count('*').alias('outdeg'))
    ed = e.join(outdeg, on='src').persist()
    ed.count()  # materialize both caches; edges evaluates once

    base = F.lit(((damp_den - damp_num) * SCALE) // damp_den).cast('long')
    ranks = nodes.withColumn('rank', F.lit(SCALE).cast('long')).persist()
    ranks.count()

    for it in range(iterations):
        contribs = (ed.join(ranks, ed.src == ranks.node)
                    .select(F.col('dst').alias('node'),
                            F.expr('rank div outdeg').alias('c'))
                    .groupBy('node')
                    .agg(F.sum('c').alias('contrib')))
        # the num·contrib product is widened to DECIMAL(38,0): a hub
        # absorbing most of the corpus mass drives contrib toward
        # n·SCALE, and 85·(n·10^12) overflows BIGINT at n ≳ 10^5 with
        # ANSI mode on (fail-loud mid-iteration).  Decimal keeps the
        # arithmetic EXACT — same truncation, same bits — so the SQL
        # oracle is unchanged; `div` on decimals returns BIGINT.
        new_ranks = (nodes.join(contribs, on='node', how='left')
                     .select('node',
                             (base + F.expr(
                                 f'(CAST({damp_num} AS DECIMAL(38,0)) '
                                 f'* coalesce(contrib, 0L)) '
                                 f'div {damp_den}')).alias('rank')))
        if (it + 1) % 5 == 0:
            new_ranks = new_ranks.localCheckpoint(eager=False)
        new_ranks = new_ranks.persist()
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks

    nodes.unpersist()
    ed.unpersist()
    ranks._persisted_deps = [ranks]  # dedup.release() compatible
    return ranks
