"""MLlib text-feature pipeline (SURVEY.md §2B text-analysis row:
Tokenizer / StopWordsRemover / CountVectorizer / IDF): the pipeline
must fit and transform distributed, and its IDF ordering must agree
with the SQL TF-IDF implementation (text_tfidf_top_terms)."""

from __future__ import annotations

import pyspark.sql.functions as F

from free_etl_spark.tables import load_table
from tests.conftest import SF_DIR


def test_mllib_tfidf_pipeline(spark):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import CountVectorizer, IDF, StopWordsRemover, Tokenizer

    docs = load_table(spark, SF_DIR, "documents")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="raw_tokens"),
            StopWordsRemover(inputCol="raw_tokens", outputCol="tokens"),
            CountVectorizer(inputCol="tokens", outputCol="tf", minDF=2.0),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    model = pipe.fit(docs)
    out = model.transform(docs)

    # pipeline runs distributed and emits one sparse vector per doc
    assert out.count() == docs.count()
    row = out.select("tokens", "tfidf").first()
    assert row["tfidf"].size >= 10  # vocab survived minDF pruning

    cv = model.stages[2]
    idf_model = model.stages[3]
    vocab = cv.vocabulary
    idf_vals = idf_model.idf.toArray()

    # IDF must order rare-above-common exactly like the SQL corpus DF:
    # compare against document frequencies computed relationally
    df_sql = dict(
        docs.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
        )
        .groupBy("t")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    )
    stop = set(StopWordsRemover.loadDefaultStopWords("english"))
    pairs = [
        (term, idf_vals[i], df_sql[term])
        for i, term in enumerate(vocab)
        if term in df_sql and term not in stop
    ]
    assert len(pairs) >= 10
    # higher document frequency ⇒ lower (or equal) IDF, on every pair
    pairs.sort(key=lambda p: p[2])
    for (t1, idf1, df1), (t2, idf2, df2) in zip(pairs, pairs[1:]):
        if df1 < df2:
            assert idf1 >= idf2, (t1, t2)
