"""Exact fixed-point PageRank (operators/graph.py)."""

from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.dedup import release
from pdf_ai_mapper_spark.operators.graph import SCALE, pagerank


def _py_pagerank(edges, iterations=10, num=85, den=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {n: SCALE for n in nodes}
    base = ((den - num) * SCALE) // den
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for u, v in edges:
            contrib[v] += r[u] // out[u]
        r = {n: base + (num * contrib[n]) // den for n in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, 'src long, dst long')
    out = pagerank(df, **kw)
    got = {r['node']: r['rank'] for r in out.collect()}
    release(out)
    return got


def test_matches_python_reference(spark):
    # ring + a hub everyone links to + a dangling-ish leaf target
    edges = ([(i, (i + 1) % 8) for i in range(8)]
             + [(i, 99) for i in range(8)] + [(99, 0)])
    assert _run(spark, edges) == _py_pagerank(edges)


def test_hub_outranks_ring(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(i, 99) for i in range(8)] + [(99, 0)]
    got = _run(spark, edges)
    assert got[99] > max(got[i] for i in range(1, 8))


def test_partitioning_invariant(spark):
    edges = [(i, (i * 13 + 7) % 40) for i in range(40)] + \
            [(i, (i * 7 + 3) % 40) for i in range(40)]
    df = spark.createDataFrame(edges, 'src long, dst long')
    a = {r['node']: r['rank'] for r in pagerank(df).collect()}
    b = {r['node']: r['rank'] for r in pagerank(df.repartition(13)).collect()}
    assert a == b == _py_pagerank(edges)


def test_hub_in_mass_does_not_overflow_bigint(spark):
    """110k spokes → one hub concentrates ~1.1e17 of scaled mass;
    85 * contrib would overflow BIGINT under ANSI mode if the product
    were computed in long (ADVICE r3).  The decimal-widened product
    must neither throw nor change the exact integer result."""
    n = 110_000
    df = (spark.range(1, n + 1)
          .select(F.col('id').alias('src'), F.lit(0).alias('dst')))
    out = pagerank(df, iterations=2)
    got = {r['node']: r['rank'] for r in out.collect()}
    release(out)
    base = (15 * SCALE) // 100
    # iteration 1: contrib(hub) = n * SCALE (each spoke outdeg 1)
    hub_it1 = base + (85 * n * SCALE) // 100
    # iteration 2: hub is dangling (no out-edges) -> spokes get base
    # only, hub gets base again (its inbound mass now base // 1 each)
    hub_it2 = base + (85 * n * base) // 100
    assert got[0] == hub_it2
    assert got[1] == base
