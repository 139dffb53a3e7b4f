package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: every custom expression/aggregate is a registered
  * function, so plain `spark.sql` (and thus JDBC/thrift clients) can use
  * the engine without touching the Scala API.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestSession {

  test("custom kernels and sketches are callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE)),
        |            array(CAST(3 AS DOUBLE), CAST(4 AS DOUBLE))) AS dot,
        |  graft_shingle_hash(array('a', 'b', 'c'), 2, 0) AS sh,
        |  graft_simhash(array(CAST(5 AS BIGINT), CAST(7 AS BIGINT)), 8) AS sim,
        |  graft_minhash(array(CAST(11 AS BIGINT), CAST(3 AS BIGINT)), 4) AS sig,
        |  graft_char_ngrams('abcd', 2) AS ng,
        |  graft_nfc('cafe' || decode(unhex('CC81'), 'UTF-8')) AS nfc,
        |  graft_barrier(1 < 2) AS barrier
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getSeq[Long](1).length == 2) // shingles "a b", "b c"
    assert(row.getSeq[Long](3).length == 4)
    assert(row.getSeq[String](4) == Seq("ab", "bc", "cd"))
    assert(row.getString(5) == "caf\u00e9") // composed single code point
    assert(row.getBoolean(6))
  }

  test("HyperplaneBucket codegen path equals the composed-Column formula") {
    // DataFrame-level A/B over a whole-stage codegen'd projection: the
    // kernel (doGenCode) vs the 4x aggregate(sequence(...)) composition
    // it replaced (interpreted HOFs), on deterministic pseudo-random
    // vectors including the fixture's 161-dim shape and degenerate dims
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 500)
      .select(col("id"), transform(
        sequence(lit(0), (col("id") % 163).cast("int")),
        i => sin(i * 0.7 + col("id") * 0.13)).as("vd"))
    val both = df.select(
      graft.functions.GraftFunctions.hyperplaneBucket(col("vd")).as("k"),
      graft.queries.SimilarityQueries.bucketExprComposed(col("vd")).as("c"))
    assert(both.filter(col("k") =!= col("c")).count() == 0)
    assert(both.select(countDistinct(col("k"))).head().getLong(0) > 4)
  }

  test("SquaredL2 codegen path equals the composed-Column formula") {
    // same A/B discipline as HyperplaneBucket: the kernel (doGenCode,
    // inside a whole-stage projection) vs the aggregate(zip_with(...))
    // interpreted composition it replaced in kmeansAssign, plus SQL
    // registration and the mismatched-length null contract
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 500)
      .select(col("id"),
        transform(sequence(lit(0), lit(63)),
          i => sin(i * 0.7 + col("id") * 0.13)).as("a"),
        transform(sequence(lit(0), lit(63)),
          i => cos(i * 0.3 + col("id") * 0.29)).as("b"))
    val both = df.select(
      graft.functions.GraftFunctions.sqDist(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (p, q) => p + q).as("c"))
    assert(both.filter(col("k") =!= col("c")).count() == 0)
    assert(spark.sql(
      """SELECT graft_sqdist(array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE)),
        |                    array(CAST(4 AS DOUBLE), CAST(6 AS DOUBLE)))
        |""".stripMargin).head().getDouble(0) == 25.0)
    assert(spark.sql(
      """SELECT graft_sqdist(array(CAST(1 AS DOUBLE)),
        |                    array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE)))
        |""".stripMargin).head().isNullAt(0))
  }

  test("custom aggregates work in SQL GROUP BY with partial aggregation") {
    spark.range(0, 1000)
      .selectExpr("id % 3 AS g", "id % 17 AS v")
      .createOrReplaceTempView("t")
    val rows = spark.sql(
      """SELECT g, graft_bitmap_distinct(v, 64) AS buckets
        |FROM t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length == 3)
    // ids 0..999 mod 17 hit all 17 buckets in every group of ~333 ids
    assert(rows.forall(_.getInt(1) == 17))
  }

  test("SpaceSaving top-k is callable from SQL and partial-aggregates") {
    spark.range(0, 900)
      .selectExpr("id % 3 AS g", "concat('w', CAST(id % (g + 2) AS STRING)) AS w")
      .createOrReplaceTempView("ss_t")
    val rows = spark.sql(
      """SELECT g, graft_spacesaving_topk(w, 16, 2) AS top
        |FROM ss_t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length == 3)
    // capacity 16 > distinct words per group (g+2 <= 4) -> exact counts:
    // group g has 300 rows over (g+2) distinct words
    val g0 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g0.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("w0", 150L), ("w1", 150L)))
    assert(g0.forall(_.getLong(2) == 0L)) // no evictions -> zero error
  }

  test("wrong-typed sketch-aggregate inputs fail at analysis, not runtime") {
    spark.range(0, 10).selectExpr("CAST(id AS INT) AS iv",
      "array(CAST(id AS INT)) AS av").createOrReplaceTempView("typed_t")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bitmap_distinct(iv, 64) FROM typed_t")
    }
    assert(e1.getMessage.contains("bigint"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_union(av, 4) FROM typed_t")
    }
    assert(e2.getMessage.contains("array<bigint>"), e2.getMessage)
  }

  test("fused ShingleHash60 kernel == composable Column formulation on real data") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
    val both = docs.select(
      col("doc_id"),
      array_distinct(shingleHash60(col("ws"), 3, modP = true)).as("fused"),
      array_distinct(transform(shingles(col("ws"), 3),
        x => hash60modP(x))).as("composed"))
    val mismatches = both
      .filter(not(col("fused") === col("composed"))).count()
    assert(mismatches == 0)
    assert(both.count() > 0)
  }

  test("bloom and threshold-lev functions work from SQL, fail typed") {
    spark.range(0, 100).selectExpr("id AS k").createOrReplaceTempView("bl_t")
    val hit = spark.sql(
      """SELECT graft_bloom_contains(
        |  (SELECT graft_bloom_agg(k, 4096, 7) FROM bl_t), CAST(42 AS BIGINT))
        |  AS hit""".stripMargin).collect().head.getBoolean(0)
    assert(hit)
    val d = spark.sql(
      "SELECT graft_lev_le('kitten', 'sitten', 2) AS d").collect().head.getInt(0)
    assert(d == 1)
    val far = spark.sql(
      "SELECT graft_lev_le('kitten', 'abcdef', 2) AS d").collect().head.getInt(0)
    assert(far == -1)
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg(CAST(k AS INT), 4096, 7) FROM bl_t")
        .collect()
    }
    assert(e1.getMessage.contains("bigint"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_lev_le(1, 2, 2)").collect()
    }
    assert(e2.getMessage.contains("string"), e2.getMessage)
  }
}
