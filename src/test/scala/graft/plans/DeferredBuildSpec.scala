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

  test("self-join of one deferred frame resolves (MultiInstanceRelation, ADVICE r12)") {
    // pre-fix, DeduplicateRelations could not regenerate the leaf's
    // exprIds, so joining a returned frame against a derivation of
    // ITSELF failed analysis with conflicting attributes — a
    // composability regression vs ordinary operator trees. The build
    // closure is shared across the new-instanced leaves, so the
    // deferred work still runs once.
    val (df, calls) = deferredCounted()
    val renamed = df.withColumnRenamed("n", "n2")
    val out = df.join(renamed, "k").orderBy(col("k"))
      .select(col("k"), col("n"), col("n2")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 1L, 1L), ("b", 2L, 2L), ("c", 3L, 3L)))
    assert(calls.get() == 1,
      "newInstance shares the build closure; the memo must fire once")
  }

  test("a same-typed but name-transposed built plan is rejected (ADVICE r12)") {
    import spark.implicits._
    val two = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    // (n, id) vs declared (id, n): positional dataTypes agree, so a
    // type-only guard would silently swap the column VALUES under the
    // declared names
    lazy val transposed = Seq((1L, 10L)).toDF("n", "id")
      .queryExecution.optimizedPlan
    val df = PlanShim.ofRows(spark, DeferredBuild(
      two.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      "spec-transposed", () => transposed))
    val e = intercept[Exception] { df.count() }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("DeferredBuild(spec-transposed)"))),
      s"expected the transposition to be rejected, got: $e")
  }

  test("post-build stats flow through the leaf (VERDICT r12 #6)") {
    import spark.implicits._
    val built = new java.util.concurrent.atomic.AtomicReference[
      Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]](None)
    lazy val inner = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
      .queryExecution.optimizedPlan
    val leaf = DeferredBuild(
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      "spec-stats",
      () => { built.set(Some(inner)); inner },
      () => built.get())
    val df = PlanShim.ofRows(spark, leaf)
    assert(leaf.computeStats().sizeInBytes == BigInt(Long.MaxValue),
      "before any build, size is unknown and must not invite a " +
        "stats-driven broadcast")
    assert(df.count() == 2)
    val post = leaf.computeStats().sizeInBytes
    assert(post < BigInt(1000000),
      s"after the first build, the child's stats must flow through " +
        s"(got $post)")
    // and a composer joining the small deferred result gets a
    // broadcast with NO hint anywhere in the plan
    val big = spark.range(50000)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS k",
        "id AS v")
    val joined = big.join(df, "k")
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") ||
        phys.contains("BroadcastNestedLoopJoin"),
      s"expected a stats-driven broadcast of the built side, got:\n$phys")
  }

  test("memoizedOptimize reuses per cache-state epoch, re-optimizes across epochs") {
    import spark.implicits._
    val src = Seq(1L, 2L, 3L, 4L).toDF("v")
    val logical = src.filter(col("v") > 1L).queryExecution.logical
    val p1 = DeferredBuild.memoizedOptimize(spark, logical)
    val p2 = DeferredBuild.memoizedOptimize(spark, logical)
    assert(p1 eq p2,
      "same plan, same cache state: the optimizer run must be skipped")
    src.persist()
    try {
      src.count()
      val p3 = DeferredBuild.memoizedOptimize(spark, logical)
      assert(!(p3 eq p1),
        "a persisted source changes the cache epoch: the memo must " +
          "re-optimize against the substituted InMemoryRelation")
      assert(p3.toString.contains("InMemoryRelation"),
        "the fresh epoch's plan must read through the live cache")
      assert(DeferredBuild.memoizedOptimize(spark, logical) eq p3)
    } finally src.unpersist(blocking = true)
    val p5 = DeferredBuild.memoizedOptimize(spark, logical)
    assert(p5 eq p1,
      "after unpersist the uncached epoch's entry keys again — and a " +
        "post-release action can never be served the cached-epoch plan")
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
