"""Product-quantization operators (operators/similarity.py): codebook
training determinism, Lloyd error monotonicity, encode/assign
consistency, and ADC-vs-exact score agreement on reconstructions."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.similarity import (
    pq_adc_topk,
    pq_assign,
    pq_encode_with_error,
    pq_train,
)
from self_healing_data_pipeline_spark.sources.readers import read_table


def test_pq_train_is_deterministic(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    b1 = pq_train(emb, m=4, k=8, iters=2)
    b2 = pq_train(emb, m=4, k=8, iters=2)
    assert b1.shape == (4, 8, 16)
    assert np.array_equal(b1, b2)


def test_pq_lloyd_reduces_reconstruction_error(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    b0 = pq_train(emb, m=4, k=8, iters=0)
    b2 = pq_train(emb, m=4, k=8, iters=2)

    def total_err(books):
        return (
            pq_encode_with_error(emb, books)
            .agg(F.sum("__recon_mse"))
            .collect()[0][0]
        )

    assert total_err(b2) <= total_err(b0)


def test_pq_encode_matches_assign_and_codes_in_range(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16, iters=1)
    enc = pq_encode_with_error(emb, books).orderBy("vec_id").collect()
    asg = {r["vec_id"]: r["__codes"] for r in pq_assign(emb, books).collect()}
    for r in enc:
        codes = r["__codes"]
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)
        assert list(codes) == list(asg[r["vec_id"]])
        assert r["__recon_mse"] >= 0.0


def test_pq_adc_equals_exact_ip_of_reconstruction(spark, sf_dir):
    """ADC's LUT-fold score is BY DEFINITION the inner product of the
    query with the RECONSTRUCTED vector — check the JVM fold against a
    numpy reconstruction to float tolerance."""
    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16, iters=1)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    enc = pq_encode_with_error(emb, books)
    top = pq_adc_topk(enc, books, list(q), k_top=5).collect()
    codes = {r["vec_id"]: r["__codes"] for r in enc.collect()}
    qv = np.asarray(q, dtype="float64")
    for r in top:
        recon = np.concatenate(
            [books[mm, c] for mm, c in enumerate(codes[r["vec_id"]])]
        )
        assert abs(float(qv @ recon) - r["adc_score"]) < 1e-9
