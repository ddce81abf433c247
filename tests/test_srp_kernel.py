"""SRP sketch kernel: the Arrow-vectorized int64-matmul pandas UDF in
``srp_words`` must be BIT-IDENTICAL to the reference expression form
(`_srp_word_expr`, SRP_BITS aggregate-over-zip_with dots) — the expression
form is the semantic spec the DuckDB oracle replicates, the UDF is only a
faster evaluation of the same exact integer arithmetic."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.dedup import _srp_word_expr, srp_words
from pdf_extraction_and_query_spark.operators.search import fixed_point_vec

SF = "/root/testdata/sf0.001"


def test_vectorized_srp_matches_expression_form(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    got = {r["vec_id"]: r["srp"] for r in srp_words(emb).select("vec_id", "srp").collect()}
    want = {
        r["vec_id"]: r["srp"]
        for r in emb.select(
            "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
        )
        .select("vec_id", _srp_word_expr().alias("srp"))
        .collect()
    }

    assert len(got) == emb.count()
    assert got == want


def test_vectorized_pair_cosine_matches_expression_form(spark):
    """All brute pairs at sf0.001: the einsum+IEEE pandas kernel must equal
    the aggregate-over-zip_with expression bit-for-bit (same doubles, same
    round-6 values)."""
    from pdf_extraction_and_query_spark.operators.dedup import (
        _pair_cos_r6,
        _pair_cos_r6_vec,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c = emb.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev"))
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _pair_cos_r6(F.col("a.ev"), F.col("b.ev")).alias("cos_expr"),
        _pair_cos_r6_vec(F.col("a.ev"), F.col("b.ev")).alias("cos_vec"),
    )
    n_pairs = pairs.count()
    assert n_pairs > 1000
    assert pairs.where(F.col("cos_expr") != F.col("cos_vec")).count() == 0


def test_vectorized_dot_and_score_match_expression_forms(spark):
    """All (candidate, query) pairs at sf0.001: `_dot_vec` and both fields
    of `_score_vec` must be bit-identical to the `_dot`/`_sq_norm`
    expression composition."""
    from pdf_extraction_and_query_spark.operators.search import (
        _dot,
        _dot_vec,
        _score_vec,
        _sq_norm,
        with_query,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    scored = with_query(emb).select(
        "vec_id",
        _dot(F.col("ev"), F.col("qv")).alias("dot_expr"),
        _dot_vec(F.col("ev"), F.col("qv")).alias("dot_vec"),
        (
            _dot(F.col("ev"), F.col("qv"))
            / (F.sqrt(_sq_norm(F.col("ev"))) * F.sqrt(_sq_norm(F.col("qv"))))
        ).alias("cos_expr"),
        _score_vec(F.col("ev"), F.col("qv")).alias("s"),
    )
    assert scored.count() == emb.count()
    bad = scored.where(
        (F.col("dot_expr") != F.col("dot_vec"))
        | (F.col("dot_expr") != F.col("s.dot_e12"))
        | (F.col("cos_expr") != F.col("s.cos"))
    ).count()
    assert bad == 0
