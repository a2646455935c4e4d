"""Topic categorization (A3-A6): CountVectorizer / HashingTF+IDF
features, LDA topic model, KMeans variant, topic naming.

Re-expresses the reference's sklearn pipeline
(``category_manager.py:36-41,138-139``: CountVectorizer(max_features=
1000, ngram_range=(1,3)) + LDA(n_components=8, random_state=42,
max_iter=100)) with ``pyspark.ml``:

- features: tokens are the space-split ``preprocessed_text`` (which
  already contains the reference's 1-3-gram phrases as tokens joined
  by spaces — T9/T10 — so vocabSize=1000 over those tokens covers the
  same n-gram range when phrases are added as single features).
- ``pyspark.ml.clustering.LDA(k=8, seed=42)`` — distributed EM/online;
  topic *labels* are not byte-stable across cluster sizes (SURVEY.md
  §7.4), which is why categories are excluded from the byte-identity
  invariant. Everything is seeded for run-to-run stability at fixed
  parallelism.
- per-doc categories: topics with P > 0.1, sorted desc, top 3,
  named via the topic-type keyword table
  (reference ``_categorize_with_lda`` :153-185, ``_get_lda_topic_name``
  :222-260, ``_determine_topic_type`` :266-296).
- north_star mode: HashingTF + IDF features (no vocabulary fit — one
  pass less at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.ml.clustering import LDA, KMeans
from pyspark.ml.feature import (IDF, CountVectorizer, CountVectorizerModel,
                                HashingTF)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..kernels.stopwords import MEANINGLESS_WORDS, STOP_WORDS, TOPIC_KEYWORDS


def with_tokens(df: DataFrame, text_col: str = 'preprocessed_text',
                out_col: str = 'tokens') -> DataFrame:
    return df.withColumn(
        out_col,
        F.filter(F.split(F.col(text_col), ' '), lambda t: F.length(t) > 0))


def tfidf_features(df: DataFrame, tokens_col: str = 'tokens',
                   out_col: str = 'features',
                   num_features: int = 1 << 18) -> DataFrame:
    """North-star featurization: HashingTF + IDF. No vocab fit —
    scales to any corpus without a driver-side dictionary."""
    tf = HashingTF(inputCol=tokens_col, outputCol='__tf',
                   numFeatures=num_features)
    tfd = tf.transform(df)
    idf = IDF(inputCol='__tf', outputCol=out_col).fit(tfd)
    return idf.transform(tfd).drop('__tf')


def count_vector_features(df: DataFrame, tokens_col: str = 'tokens',
                          out_col: str = 'features',
                          cfg: EngineConfig = DEFAULT_CONFIG):
    """Reference-semantics featurization: CountVectorizer(vocabSize=
    1000) (category_manager.py:36-40). Returns (df, model) — the model
    carries the vocabulary for topic naming.

    The vocabulary is built explicitly with a pinned total order
    (document frequency desc, term asc) instead of ``CountVectorizer
    .fit``, whose frequency ties break nondeterministically across
    refits — that tie-break leaks into topic assignments and violates
    the determinism contract (SURVEY.md §7.4). The top-k job plans as
    TakeOrdered (no full sort) and scales like any word-count."""
    # explode_outer + isNotNull: keeps the inferred non-empty filter
    # from re-running array_distinct per row at the scan (round 8)
    vocab_rows = (df.select(F.explode_outer(
                      F.array_distinct(F.col(tokens_col))).alias('t'))
                  .filter(F.col('t').isNotNull())
                  .groupBy('t').agg(F.count('*').alias('df_'))
                  .orderBy(F.desc('df_'), F.asc('t'))
                  .limit(cfg.vocab_size)
                  .collect())
    vocab = [r['t'] for r in vocab_rows]
    model = CountVectorizerModel.from_vocabulary(
        vocab, inputCol=tokens_col, outputCol=out_col)
    return model.transform(df), model


def topic_name(top_terms: list[str], topic_id: int) -> str:
    """reference _get_lda_topic_name (category_manager.py:222-260):
    filter top-10 terms by len>=3 / not stopword / not meaningless /
    not digit; take 8; name '<Type>: t1, …, t5'."""
    meaningful = [t for t in top_terms
                  if len(t) >= 3 and t.lower() not in STOP_WORDS
                  and t.lower() not in MEANINGLESS_WORDS and not t.isdigit()]
    selected = meaningful[:8]
    if not selected:
        return f"Topic {topic_id + 1}"
    ttype = determine_topic_type(selected)
    head = selected[:5] if len(selected) >= 3 else selected
    return f"{ttype}: {', '.join(head)}"


def determine_topic_type(terms: list[str]) -> str:
    """reference _determine_topic_type (category_manager.py:266-296):
    count terms containing any domain keyword; argmax (dict order —
    first-inserted wins ties via max()), else 'Document'."""
    terms_lower = [t.lower() for t in terms]
    scores = {
        ttype: sum(1 for term in terms_lower
                   if any(kw in term for kw in kws))
        for ttype, kws in TOPIC_KEYWORDS.items()
    }
    best = max(scores, key=scores.get)
    return best if scores[best] > 0 else "Document"


def _rx_filter(pattern: str):
    # closure factory — a default-arg lambda would be bound as a 2-arg
    # HOF lambda (PLANS.md hazard list)
    return lambda t: t.rlike(pattern)


def with_topic_type(df: DataFrame, text_col: str = 'text',
                    out_col: str = 'topic_type') -> DataFrame:
    """A6 topic-type scoring as a NATIVE Spark expression (reference
    ``_determine_topic_type``, category_manager.py:266-296): per row,
    score each type = number of whitespace tokens containing any of the
    type's keywords (one alternation regex per type — a single
    codegen'd pass over the token array, not one filter per keyword);
    argmax with first-in-dict-order tie-break via array_max over
    (score, -index) structs; 'Document' when every score is 0.

    The driver-side Python twin (``determine_topic_type``) keeps the
    reference's exact list-of-terms semantics for topic naming; this
    column form is what a 100 TB corpus-labeling pass would run."""
    toks = F.split(F.lower(F.col(text_col)), ' ')
    entries = []
    for i, (ttype, kws) in enumerate(TOPIC_KEYWORDS.items()):
        score = F.size(F.filter(toks, _rx_filter('|'.join(kws))))
        entries.append(F.struct(score.alias('s'), F.lit(-i).alias('ni'),
                                F.lit(ttype).alias('n')))
    best = F.array_max(F.array(*entries))
    return df.withColumn(
        out_col,
        F.when(best['s'] > 0, best['n']).otherwise(F.lit('Document')))


def fit_lda_categories(df: DataFrame,
                       text_col: str = 'preprocessed_text',
                       cfg: EngineConfig = DEFAULT_CONFIG,
                       max_iter: int | None = None,
                       doc_count: int | None = None,
                       models_out: dict | None = None) -> DataFrame:
    """Full categorization stage. Cold start (<5 docs,
    category_manager.py:64-75): per-doc simple 'Topic: w1, w2, w3'
    categories (A1). Otherwise CountVectorizer + LDA(k=8, seed=42) →
    per-doc top-3 topics over the 0.1 threshold."""
    doc_count = doc_count if doc_count is not None else df.count()
    if doc_count < cfg.min_docs_for_model:
        return with_simple_categories(df, text_col)

    toks = with_tokens(df, text_col)
    feats, cv_model = count_vector_features(toks)
    lda = LDA(k=cfg.lda_topics, seed=cfg.lda_seed,
              maxIter=max_iter if max_iter is not None else cfg.lda_max_iter,
              featuresCol='features')
    model = lda.fit(feats)
    if models_out is not None:  # S9: hand models to the caller for save_models
        models_out['vectorizer'] = cv_model
        models_out['lda'] = model

    # topic names from describeTopics (driver-side — k×10 terms, tiny)
    vocab = cv_model.vocabulary
    topics = model.describeTopics(10).collect()  # argsort top-10, :231
    names = {int(r['topic']): topic_name([vocab[i] for i in r['termIndices']],
                                         int(r['topic']))
             for r in topics}
    names_arr = F.array(*[F.lit(names[i]) for i in range(cfg.lda_topics)])

    scored = model.transform(feats)
    # vector → array for native top-3-over-threshold selection
    from pyspark.ml.functions import vector_to_array
    dist = vector_to_array(F.col('topicDistribution'))
    pairs = F.filter(
        F.zip_with(dist, F.sequence(F.lit(0), F.lit(cfg.lda_topics - 1)),
                   lambda p, i: F.struct(p.alias('p'), i.alias('i'))),
        lambda s: s['p'] > cfg.topic_prob_threshold)
    # sort (prob desc, topic-id asc) — matches the reference's stable
    # descending sort (:168, Python sort stability)
    sorted_pairs = F.array_sort(
        pairs,
        lambda a, b: F.when(a['p'] > b['p'], F.lit(-1))
                      .when(a['p'] < b['p'], F.lit(1))
                      .when(a['i'] < b['i'], F.lit(-1))
                      .when(a['i'] > b['i'], F.lit(1))
                      .otherwise(F.lit(0)))
    top3 = F.slice(sorted_pairs, 1, cfg.max_categories_per_doc)
    cats = F.transform(top3, lambda s: F.element_at(names_arr, s['i'].cast('int') + 1))
    out = scored.withColumn(
        'categories',
        F.when(F.size(cats) > 0, cats).otherwise(F.array(F.lit('Uncategorized'))))
    return out.drop('features', 'topicDistribution', 'tokens', '__tf')


def with_simple_categories(df: DataFrame,
                           text_col: str = 'preprocessed_text') -> DataFrame:
    """A1 cold-start path (reference category_manager.py:64-75,90-103):
    top-3 words of len>=4 by count, ties by first occurrence (Counter
    semantics), via the per-row Python kernel in an Arrow-batched
    pandas UDF. This path only runs when the corpus has fewer than
    min_docs_for_model (5) documents, so row-wise Python is the right
    tool — the earlier native formulation referenced the token-split
    expression inside HOF lambdas, which re-evaluates it per distinct
    word on the interpreted path (the no-CSE-in-HOF-lambdas hazard in
    PLANS.md — O(n²)-ish on long docs)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    from ..kernels.preprocess import simple_categories

    @pandas_udf(ArrayType(StringType()))
    def cats_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series([simple_categories(t) if t is not None
                             else ['Uncategorized'] for t in texts])

    return df.withColumn('categories', cats_udf(F.col(text_col)))


def save_models(path: str, cv_model=None, lda_model=None,
                kmeans_model=None) -> None:
    """S9 model persistence: pyspark.ml writers replace the reference's
    pickle files (category_manager.py:141-145, document_service.py:
    132-138). NB the reference's pickle LOAD path is dead code — a
    NameError at category_manager.py:28 means it always refits
    (SURVEY.md §2.1 S9); we implement the documented intent."""
    import os
    if cv_model is not None:
        cv_model.write().overwrite().save(os.path.join(path, 'vectorizer'))
    if lda_model is not None:
        lda_model.write().overwrite().save(os.path.join(path, 'lda'))
    if kmeans_model is not None:
        kmeans_model.write().overwrite().save(os.path.join(path, 'kmeans'))


def load_models(path: str) -> dict:
    """Load whichever persisted models exist under ``path``."""
    import os

    from pyspark.ml.clustering import KMeansModel, LocalLDAModel
    out: dict = {}
    if os.path.exists(os.path.join(path, 'vectorizer')):
        out['vectorizer'] = CountVectorizerModel.load(
            os.path.join(path, 'vectorizer'))
    if os.path.exists(os.path.join(path, 'lda')):
        out['lda'] = LocalLDAModel.load(os.path.join(path, 'lda'))
    if os.path.exists(os.path.join(path, 'kmeans')):
        out['kmeans'] = KMeansModel.load(os.path.join(path, 'kmeans'))
    return out


def category_dimension(spark, category_names: list[str]) -> DataFrame:
    """Structured-category dimension table (reference
    document_storage.py:174-180): id 'cat-%03d' (:175), type = word
    before ':', keywords = comma-split tail, display_name = full name.
    A tiny driver-built DataFrame — always the broadcast side of
    category joins (J2/J3)."""
    rows = []
    for idx, name in enumerate(category_names):
        if ':' in name:
            ctype, _, tail = name.partition(':')
            keywords = [w.strip() for w in tail.split(',') if w.strip()]
        else:
            ctype, keywords = name, []
        rows.append((f'cat-{idx:03d}', ctype.strip(), keywords, name))
    df = spark.createDataFrame(
        rows, 'id string, type string, keywords array<string>, display_name string')
    return df.withColumn('created_at', F.current_timestamp())


def fit_kmeans_categories(df: DataFrame, k: int,
                          text_col: str = 'preprocessed_text',
                          cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """The *intended* semantics of POST /recategorize-with-clusters
    (the reference endpoint is dead code — AttributeErrors,
    categories.py:129-145; SURVEY.md §3.3): KMeans(k, seed=42) over the
    same term matrix, one cluster per doc."""
    k = max(2, min(20, k))
    toks = with_tokens(df, text_col)
    feats, cv_model = count_vector_features(toks)
    km = KMeans(k=k, seed=cfg.lda_seed, featuresCol='features')
    model = km.fit(feats)
    pred = model.transform(feats)
    # name clusters from their center's top terms
    vocab = cv_model.vocabulary
    names = {}
    for cid, center in enumerate(model.clusterCenters()):
        top_idx = center.argsort()[-10:][::-1]
        names[cid] = topic_name([vocab[i] for i in top_idx if i < len(vocab)], cid)
    names_arr = F.array(*[F.lit(names[i]) for i in range(k)])
    return (pred.withColumn(
        'categories',
        F.array(F.element_at(names_arr, F.col('prediction') + 1)))
        .drop('features', 'tokens', 'prediction'))
