"""End-to-end corpus curation: the composition a training-data
engineer actually runs over the extracted table (round 4).

Every stage is an already-oracled operator; this module is the glue
that orders them the way the published pipelines do (C4 → CCNet →
Gopher → RefinedWeb lineage):

    1. quality gate         (textstats.with_quality → quality_ok)
    2. exact dedup on RAW text (byte-identical re-crawls out FIRST)
    3. cross-doc line dedup (dedup.line_dedup — boilerplate chrome out)
    4. exact dedup on CLEANED text (docs that differed only in chrome
       become byte-equal once it's stripped)
    5. substring-duplication down-weight signal
       (dedup.substring_duplication_stats — kept as a COLUMN, not a
       filter: mixes re-weight, they rarely hard-drop)
    6. per-source quota     (dedup.group_quota — composition control)
    7. train/val/test split (textstats.hash_split — keyed on the doc
       id so near-identical re-crawls of one doc stay in one split)

Stage order is LOAD-BEARING, and the footgun it avoids is real:
line_dedup drops every line occurring in >= min_df documents — so a
page crawled twice (byte-identical) pushes ALL its lines to df=2, and
line dedup at min_df=2 would erase the whole document from BOTH
copies. Exact dedup must therefore run BEFORE line dedup, and the
boilerplate threshold must sit above legitimate content multiplicity:
``line_min_df=None`` (default) resolves to ``max(3, 0.2% of the
gated doc count)`` — chrome appears on most pages of a template, not
on two. The quota runs after dedup so surviving slots aren't wasted
on duplicates; the split comes last so ratios hold on the final mix.

Scale shape: each stage's shuffle story is documented in its own
module; the composition adds ONE extra driver action (the doc count
for the threshold) and no new shuffles — it is plan composition, and
Catalyst pipelines adjacent narrow stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import group_quota, line_dedup, substring_duplication_stats
from .quality_model import model_quality_units
from .textstats import hash_split, with_quality


def _dedup_exact_on(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """First-seen-wins (min id) exact dedup on md5 of ``col`` — narrow
    (hash, id) aggregate + semi-join back; text never shuffles."""
    firsts = (df.groupBy(F.md5(col).alias('__h'))
              .agg(F.min(id_col).alias('__keep')))
    return df.join(firsts.select(F.col('__keep').alias(id_col)),
                   on=id_col, how='left_semi')


def curate_corpus(df: DataFrame,
                  id_col: str = 'doc_id',
                  text_col: str = 'text',
                  source_col: str = 'source',
                  line_min_df: int | None = None,
                  dup_window: int = 8,
                  source_cap: int | None = None,
                  split_weights: 'dict[str, float] | None' = None,
                  model_gate_units: int | None = None
                  ) -> DataFrame:
    """Quality-gate → [model-quality gate] → exact-dedup → line-dedup
    → exact-dedup(cleaned) → dup-score → quota → split. Returns the
    curated table: the input columns plus cleaned_text,
    n_kept/n_removed (line dedup), dup_frac (substring duplication),
    and split — one row per surviving document. See the module
    docstring for why the order matters.

    ``model_gate_units`` (round 5, optional): also require the frozen
    linear quality model's margin (quality_model.model_quality_units)
    above the given units threshold — the FineWeb-Edu/DCLM-style
    model stage, placed WITH the heuristic gate (both are pure
    row-local filters on raw text; running them before any dedup
    means the expensive stages never see rejected rows)."""
    gated = (with_quality(df, text_col)
             .filter(F.col('quality_ok'))
             .select(*df.columns))
    if model_gate_units is not None:
        gated = (model_quality_units(gated, text_col)
                 .filter(F.col('mq_units') > model_gate_units)
                 .select(*df.columns))
    gated = _dedup_exact_on(gated, id_col, text_col)

    if line_min_df is None:
        # boilerplate = "appears across the template", not "appears
        # twice": scale the threshold with the corpus (driver action,
        # one count of the gated narrow side)
        line_min_df = max(3, int(0.002 * gated.count()))

    cleaned = line_dedup(gated, id_col, text_col, min_df=line_min_df)
    out = (gated.join(cleaned, on=id_col)
           .filter(F.length('cleaned_text') > 0))
    out = _dedup_exact_on(out, id_col, 'cleaned_text')

    dup = substring_duplication_stats(
        out.select(id_col, F.col('cleaned_text').alias(text_col)),
        id_col, text_col, k=dup_window).select(id_col, 'dup_frac')
    out = out.join(dup, on=id_col)

    if source_cap is not None:
        out = group_quota(out, source_col,
                          [('dup_frac', 'asc'), (id_col, 'asc')],
                          cap=source_cap, id_col=id_col)

    return hash_split(out, id_col, weights=split_weights)


def cascade_report(df: DataFrame,
                   stages: 'list[tuple[str, F.Column]]') -> DataFrame:
    """Quality-cascade attrition funnel (round 6) — the report every
    staged filter pipeline ships: documents flow through ``stages`` in
    order and exit at the FIRST predicate they fail; per stage, how
    many entered, failed, survived, and the pass rate. NULL predicates
    FAIL their stage (crawl-safe: malformed rows must not slip through
    on a NULL comparison).

    Scale shape: the first-failing stage is ONE codegen CASE chain
    (evaluated per row, no data movement), the counts are ONE narrow
    groupBy over the stage tag, and the funnel arithmetic runs on the
    driver over len(stages)+1 numbers. The corpus is scanned exactly
    once however many stages there are.

    Returns (stage_idx, stage, n_in, n_fail, n_pass, pass_rate) in
    stage order; pass_rate = n_pass/n_in rounded 6, NULL when n_in=0.
    """
    if not stages:
        raise ValueError('stages must be non-empty')
    first_fail = F.lit('__pass__')
    for name, pred in reversed(stages):
        first_fail = F.when(~F.coalesce(pred, F.lit(False)),
                            F.lit(name)).otherwise(first_fail)
    counts = {r['__stage']: int(r['n'])
              for r in df.select(first_fail.alias('__stage'))
              .groupBy('__stage').agg(F.count('*').alias('n'))
              .collect()}
    n_in = sum(counts.values())
    rows = []
    for i, (name, _) in enumerate(stages):
        n_fail = counts.get(name, 0)
        n_pass = n_in - n_fail
        rate = round(n_pass / n_in, 6) if n_in > 0 else None
        rows.append((i, name, n_in, n_fail, n_pass, rate))
        n_in = n_pass
    return df.sparkSession.createDataFrame(
        rows, 'stage_idx int, stage string, n_in long, n_fail long, '
              'n_pass long, pass_rate double')


def budgets_from_mixture(df: DataFrame, group_col: str, token_col: str,
                         target_weights: 'dict[str, float]',
                         total_tokens: int) -> 'dict[str, int]':
    """Turn target mixture PROPORTIONS into the per-group token
    BUDGETS ``token_budget_fill`` consumes (late round 5) — the
    missing driver step between "train on 70% en / 20% de / 10% fr"
    and an actual selection: proportional waterfilling against what
    the corpus actually has.

    Each round allocates ``remaining`` proportionally to the still-
    uncapped groups' weights; any group whose share exceeds its
    available tokens is clamped to availability and its shortfall
    re-flows to the others next round (the standard mixture-repair
    loop — at most one round per group, so it terminates).  All
    arithmetic is Fraction/int (exact, platform-independent); up to
    len(groups)-1 floor-remainder tokens may go unallocated, which is
    noise at any real budget.  Groups outside ``target_weights`` get
    no budget — same explicit-mixture contract as the fill.

    Cost: ONE narrow (group, sum(tokens)) aggregate and a collect of
    a few dozen rows; the returned dict folds into the fill's codegen
    CASE.  At 100 TB this is the cheapest step in the pipeline."""
    from fractions import Fraction
    rows = (df.groupBy(group_col)
            .agg(F.sum(token_col).alias('__tok')).collect())
    avail = {r[0]: int(r[1]) for r in rows
             if r[0] in target_weights and r[1] is not None}
    frac = {g: Fraction(w).limit_denominator(10 ** 9)
            for g, w in target_weights.items()}
    budgets = {g: 0 for g in target_weights}
    remaining = int(total_tokens)
    active = [g for g in target_weights if avail.get(g, 0) > 0]
    while remaining > 0 and active:
        wsum = sum(frac[g] for g in active)
        shares = {g: int(Fraction(remaining) * frac[g] / wsum)
                  for g in active}
        clamped = False
        for g in list(active):
            cap = avail[g] - budgets[g]
            if shares[g] >= cap:
                budgets[g] += cap
                remaining -= cap
                active.remove(g)
                clamped = True
        if not clamped:
            for g in active:
                budgets[g] += shares[g]
                remaining -= shares[g]
            break
    return {g: b for g, b in budgets.items() if b > 0}


def temperature_weights(df: DataFrame, group_col: str, token_col: str,
                        alpha: float = 0.5) -> 'dict[str, int]':
    """Derive mixture weights from the corpus itself: w_g ∝ n_g^alpha —
    temperature-scaled sampling (the multilingual-corpus standard;
    alpha < 1 upweights low-resource groups relative to proportional
    sampling, alpha=0 is uniform, alpha=1 proportional). Feed the
    result straight into ``budgets_from_mixture`` (integer weights are
    exact Fractions there).

    Returns INTEGER weights so every downstream step stays exact:
    - alpha == 0.5 (the default and the usual published choice) uses
      ``math.isqrt`` — exactly floor(sqrt(n)). A SQL oracle replicates
      it as floor(sqrt(n::DOUBLE)): IEEE-754 sqrt is CORRECTLY rounded
      (unlike pow), and for n < 2^52 the rounded double can never
      cross an integer boundary (gap to the next square ≈ 1/(2·√n) ≫
      ulp), so floor agrees with isqrt bit-for-bit in that range —
      token sums at any per-group scale this applies to.
    - other alphas use round(n**alpha) — fine driver-side (one float
      per GROUP, not per row), but pow is not correctly rounded, so
      cross-engine oracles should pin alpha=0.5.

    Cost: ONE narrow (group, sum) aggregate + a driver dict of a few
    dozen groups — same class as budgets_from_mixture."""
    import math
    rows = (df.groupBy(group_col)
            .agg(F.sum(token_col).alias('__t')).collect())
    out: dict[str, int] = {}
    for r in rows:
        n = int(r[1]) if r[1] is not None else 0
        if n <= 0:
            continue
        w = math.isqrt(n) if alpha == 0.5 else int(round(n ** alpha))
        if w > 0:
            out[r[0]] = w
    return out


def token_budget_fill(df: DataFrame, group_col: str,
                      budgets: 'dict[str, int]',
                      token_col: str,
                      order_cols: 'list[tuple[str, str]]',
                      id_col: str = 'doc_id') -> DataFrame:
    """Token-budget mixture allocation (round 5) — the step that turns
    trained-mixture WEIGHTS into an actual training set: given a
    per-group token budget (e.g. {'en': 10^12, 'de': 10^11, ...} from
    Pile-style mixture proportions or DoReMi-learned weights), fill
    each group's budget greedily in ``order_cols`` priority order
    (best quality first; callers must end with an id tiebreaker).

    A doc is kept iff the cumulative token count of the docs BEFORE it
    in its group's priority order is still under the group's budget —
    so each group overshoots by at most its one straddling document
    (the standard greedy fill; an exact subset-sum cut would be
    order-unstable and no pipeline does it).  Groups absent from
    ``budgets`` are dropped: the mixture is an explicit contract, and
    silently passing an unlisted language through is how one stray
    crawl bucket poisons a mix.

    Scale shape: mirrors ``group_quota`` — the running sum is a window
    over a NARROW (group, order keys, token, id) projection (one hash
    shuffle of skinny rows + per-group sort), survivors semi-join back
    on the id, and the budget table is a driver literal folded into
    the plan as a CASE chain (groups are languages/sources — dozens,
    not millions), so the whole predicate is codegen.  The exclusive
    running sum is integer arithmetic — exact in any engine, which is
    what makes the DuckDB oracle bit-stable."""
    from pyspark.sql import Window
    names = [c for c, _ in order_cols]
    narrow = df.select(*dict.fromkeys(
        [group_col, id_col, token_col, *names]))
    exprs = [F.col(c).desc() if d == 'desc' else F.col(c).asc()
             for c, d in order_cols]
    w = (Window.partitionBy(group_col).orderBy(*exprs)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    budget = None
    for g, b in budgets.items():
        branch = F.col(group_col) == g
        budget = (F.when(branch, F.lit(int(b))) if budget is None
                  else budget.when(branch, F.lit(int(b))))
    if budget is None:
        raise ValueError('token_budget_fill: budgets must be non-empty')
    cum_before = (F.sum(token_col).over(w) - F.col(token_col))
    keep = (narrow
            .withColumn('__cum_before', cum_before)
            .filter(F.col('__cum_before') < budget)
            .select(id_col))
    return df.join(keep, on=id_col, how='left_semi')


def epoch_upsample(df: DataFrame, group_col: str,
                   factors: 'dict[str, float]',
                   id_col: str = 'doc_id',
                   seed: str = '',
                   epoch_col: str = 'epoch') -> DataFrame:
    """Fractional per-group repetition (late round 5) — the complement
    of ``budgets_from_mixture``, which CLAMPS a group's budget to what
    the corpus has: when the mixture demands MORE than one pass over a
    group (the published recipes up-weight books/wiki to 1.5-3
    "epochs" while crawl text runs sub-1), each document is emitted
    ``floor(f)`` times plus one more iff a keyed coin with success
    probability ``frac(f)`` lands heads.  In expectation every group
    is scaled by exactly its factor, and the realized count is exact
    per document — no sampling of WHICH copy, only whether the one
    fractional copy exists.

    Determinism/portability contract (same construction as
    ``hash_split``): the coin is md5(id·'|'·seed) read as a base-16
    fraction of [0,1), the per-group threshold is an exact 32-hex-digit
    integer from Fraction arithmetic, so assignment is one codegen
    string comparison any engine with md5 reproduces bit-for-bit —
    stable under repartition, re-runs, and appends.  Groups absent
    from ``factors`` are dropped (the explicit-mixture contract shared
    by the budget fill); a factor of 0 drops the group, 1.0 passes it
    through unchanged.

    The output repeats rows with ``epoch_col`` = 0..n-1 so downstream
    stages can tell copies apart — the seeded shard shuffle
    (packing.shuffle_shards) keys on (id, epoch) and interleaves
    copies across the stream instead of emitting them back-to-back.

    Scale shape: ZERO shuffles — a CASE chain over driver literals
    (groups are languages/sources, dozens not millions), one string
    hash, and a ``sequence``+``explode`` that at most doubles row
    count per whole epoch.  Output size is the point: the operator
    multiplies the corpus by design; run it AFTER dedup and the
    quality gates, never before."""
    from fractions import Fraction
    n_full = None
    thr = None
    for g, f in factors.items():
        if f < 0:
            raise ValueError(f'epoch_upsample: negative factor for {g!r}')
        fr = Fraction(f).limit_denominator(10 ** 9)
        whole = int(fr)
        frac = fr - whole
        branch = F.col(group_col) == g
        nf = F.lit(whole)
        th = F.lit(format(int(frac * 16 ** 32), '032x'))
        n_full = (F.when(branch, nf) if n_full is None
                  else n_full.when(branch, nf))
        thr = (F.when(branch, th) if thr is None
               else thr.when(branch, th))
    if n_full is None:
        raise ValueError('epoch_upsample: factors must be non-empty')
    h = F.md5(F.concat_ws('|', F.col(id_col).cast('string'), F.lit(seed)))
    n_copies = (n_full + F.when(h < thr, F.lit(1)).otherwise(F.lit(0)))
    return (df.withColumn('__n_copies', n_copies)
            .filter(F.col('__n_copies') > 0)
            .withColumn(epoch_col,
                        F.explode(F.sequence(
                            F.lit(0), F.col('__n_copies') - 1)))
            .drop('__n_copies'))


def corpus_datasheet(df: DataFrame, id_col: str = 'doc_id',
                     text_col: str = 'text', lang_col: str = 'lang',
                     source_col: str = 'source') -> DataFrame:
    """The corpus datasheet (late round 5) — the one-row report a
    dataset release ships (Gebru et al.'s "Datasheets for Datasets"
    applied to a pretraining corpus): volume, diversity, duplication,
    and quality-gate pass rates, all in ONE aggregate job over the
    table. Every number is an exact count or one IEEE division of
    exact counts — no avg-of-doubles anywhere, so the row is
    hash-stable under any partitioning.

    Plan shape: per-doc columns are narrow map-side expressions
    (ratios, token counts, md5, the frozen-model fold); the three
    count-distincts expand into one multi-phase aggregate Catalyst
    plans natively. Nothing wide ever shuffles — the md5 stands in
    for the text in the distinct."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, '[^A-Za-z]', ''))
    digit = F.length(F.regexp_replace(t, '[^0-9]', ''))
    n_tok = F.size(F.split(F.trim(t), r'\s+'))
    alpha_ratio = F.round(alpha / F.greatest(n, F.lit(1)), 6)
    digit_ratio = F.round(digit / F.greatest(n, F.lit(1)), 6)
    quality_ok = ((alpha_ratio > 0.6) & (digit_ratio < 0.2)
                  & (n_tok >= 5))
    per = (model_quality_units(df, text_col=text_col)
           .select(F.col(id_col), F.col(lang_col).alias('__lang'),
                   F.col(source_col).alias('__src'),
                   n_tok.cast('long').alias('__tok'),
                   n.cast('long').alias('__chars'),
                   F.md5(t).alias('__h'),
                   quality_ok.cast('long').alias('__qok'),
                   (F.col('mq_units') > 0).cast('long').alias('__mok'),
                   (F.col(lang_col) == 'en').cast('long').alias('__en')))
    row = per.agg(
        F.count('*').cast('long').alias('n_docs'),
        F.countDistinct('__src').cast('long').alias('n_sources'),
        F.countDistinct('__lang').cast('long').alias('n_langs'),
        F.sum('__tok').cast('long').alias('n_tokens'),
        F.sum('__chars').cast('long').alias('n_chars'),
        F.countDistinct('__h').cast('long').alias('n_unique_texts'),
        F.sum('__qok').cast('long').alias('n_quality_ok'),
        F.sum('__mok').cast('long').alias('n_model_pass'),
        F.sum('__en').cast('long').alias('n_en'))
    nd = F.col('n_docs').cast('double')
    return (row
            .withColumn('dup_frac',
                        F.round((F.col('n_docs') - F.col('n_unique_texts'))
                                / nd, 6))
            .withColumn('tokens_per_doc',
                        F.round(F.col('n_tokens') / nd, 6)))
