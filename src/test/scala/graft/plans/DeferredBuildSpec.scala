package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanShim
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for the deferral vehicle itself (Butterfly's lifecycle
  * pins in ButterflySpec cover the operator; this covers the plans
  * layer): the build closure never runs at composition, runs at most
  * once across repeated and derived actions when memoized as the
  * contract requires, splices under the declared exprIds so downstream
  * references stay bound, composes with the columnar cache, and
  * rejects a built plan that does not match the declared output. */
class DeferredBuildSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  /** A deferred frame over a builder that counts invocations. The
    * memo lives in the closure (lazy val), exactly as the node doc
    * prescribes for real operators. */
  private def deferredCounted() = {
    val calls = new java.util.concurrent.atomic.AtomicInteger()
    import spark.implicits._
    lazy val inner = {
      calls.incrementAndGet()
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "n")
        .queryExecution.optimizedPlan
    }
    val df = PlanShim.ofRows(spark, DeferredBuild(
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      "spec", () => inner))
    (df, calls)
  }

  test("composition and schema inspection never run the builder") {
    val (df, calls) = deferredCounted()
    assert(df.schema == schema)
    val derived = df.filter(col("n") > 1L).select(col("k"))
    assert(derived.columns.toSeq == Seq("k"))
    assert(calls.get() == 0,
      "plan composition must not force the deferred build")
  }

  test("the builder runs once across repeated and derived actions") {
    val (df, calls) = deferredCounted()
    assert(df.count() == 3)
    assert(df.agg(sum(col("n"))).head().getLong(0) == 6L)
    val derived = df.filter(col("n") > 1L).orderBy(col("k"))
    assert(derived.collect().map(_.getString(0)).toSeq == Seq("b", "c"))
    assert(calls.get() == 1,
      "each action re-optimizes a CLONE of the plan; the closure memo " +
        "must make every re-visit free")
  }

  test("downstream joins resolve against the declared attributes") {
    import spark.implicits._
    val (df, _) = deferredCounted()
    val dim = Seq(("a", "alpha"), ("c", "gamma")).toDF("k", "name")
    val out = df.join(dim, "k").orderBy(col("k"))
      .select(col("name"), col("n")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("alpha", 1L), ("gamma", 3L)))
  }

  test("a cached deferred frame builds once and serves from the cache") {
    val (df, calls) = deferredCounted()
    df.cache()
    try {
      assert(df.count() == 3)
      assert(df.count() == 3)
      assert(calls.get() == 1,
        "the cache manager keys on the analyzed plan (the leaf); both " +
          "actions share one materialization and one build")
    } finally df.unpersist()
  }

  test("a built plan that contradicts the declared output is rejected") {
    import spark.implicits._
    lazy val wrong = Seq(1L -> 2L).toDF("x", "y")
      .queryExecution.optimizedPlan // (bigint, bigint) vs (string, bigint)
    val df = PlanShim.ofRows(spark, DeferredBuild(
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      "spec-wrong", () => wrong))
    val e = intercept[Exception] { df.count() }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("DeferredBuild(spec-wrong)"))),
      s"expected the declared-output mismatch error, got: $e")
  }
}
