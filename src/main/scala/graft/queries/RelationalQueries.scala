package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator layer: every petl/SQL operator class the
  * reference uses (SURVEY.md §2.1–§2.5), each re-expressed as an
  * idiomatic Catalyst-optimizable DataFrame query over the driver
  * testdata, with a DuckDB oracle.
  *
  * Determinism notes (these queries are hash-compared cross-engine):
  *  - money sums go through `cents` (round(x*100)::long) so aggregation
  *    is exact integer arithmetic, immune to float summation order;
  *  - per-row double arithmetic (no agg) is IEEE-deterministic and safe;
  *  - every query ends in a total ORDER BY on a unique key set, mirrored
  *    in the oracle SQL (NULLS FIRST to match Spark's asc default).
  */
object RelationalQueries {

  /** Exact money arithmetic: 2-decimal double → integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Signature set for the frequency-ordered q-gram prefix filter
    * (ED-Join, Xiao et al., VLDB 2008): one row per (name, signature
    * gram). Stop grams — trigrams carried by more than 1/20th of the
    * names — are removed first (standard practice in prefix-filter
    * implementations; on low-entropy fixtures like "Customer#0000…"
    * they are exactly the shared-prefix/padding grams whose blocks
    * would otherwise hold every row). Each name's remaining distinct
    * trigrams are ranked by global frequency ascending (ties by gram
    * text — a total order both engines replay) and the q·k+1 = 7
    * rarest kept: edit distance k=2 destroys at most q·k = 6 trigrams,
    * so names within the threshold share a signature gram whenever
    * their shared grams are not all stop grams (the documented recall
    * bound of stop-gram removal — the price of bounded block sizes).
    * Blocks therefore stay small and candidate volume near-linear
    * (graft.tools.FuzzyStress measures the growth at 10x/50x). */
  def fuzzySignatures(customers: DataFrame): DataFrame = {
    val base = customers
      .select(col("c_custkey").as("k"), col("c_name").as("n"))
      .filter(length(col("n")) >= 3)
    // scalar total for the integer stop-gram test tf*20 <= n_names
    // (integer both sides: no float-threshold parity risk)
    val nNames = base.count()
    val grams = base
      .select(col("k"), col("n"),
        explode(expr("sequence(1, length(n) - 2)")).as("p"))
      .select(col("k"), col("n"),
        expr("substring(n, p, 3)").as("gram"))
      .distinct()
    // gram frequency table: ~|distinct trigrams| rows, broadcastable
    // far beyond this scale (hash-join fallback is still one shuffle)
    val tf = grams.groupBy("gram").agg(count(lit(1)).as("tf"))
    grams.join(broadcast(tf), "gram")
      .filter(col("tf") * 20 <= lit(nNames))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("tf"), col("gram"))))
      .filter(col("rk") <= 7)
      .select(col("k"), col("n"), col("gram"))
  }

  /** Deletion-neighborhood signatures (FastSS / SymSpell's SymDelete):
    * every variant of `n` obtainable by deleting at most 2 characters
    * (1 + L + L·(L−1)/2 strings — O(L²) per row, LINEAR in rows). Two
    * strings within Levenshtein distance 2 ALWAYS share a variant
    * (delete the edited positions from each side), so blocking on the
    * variant is EXACT — recall 1.0, no tuning — while each variant
    * block stays O(1) on data whose strings don't pack the edit space.
    * This is the scale path where exactness matters more than the
    * cheaper rare-gram prefix filter above; candidate volume tracks
    * the true-pair volume, not n²/|gram space| (FuzzyStress contrasts
    * all three blockings at 1x/10x/50x). */
  def symDelSignatures(customers: DataFrame): DataFrame =
    customers.select(col("c_custkey").as("k"), col("c_name").as("n"))
      .select(col("k"), col("n"), explode(expr(
        """array_distinct(concat(
          |  array(n),
          |  transform(sequence(1, length(n)), i ->
          |    concat(substring(n, 1, i-1), substring(n, i+1, 10000))),
          |  flatten(transform(sequence(1, length(n) - 1), i ->
          |    transform(sequence(i + 1, length(n)), j ->
          |      concat(substring(n, 1, i-1), substring(n, i+1, j-i-1),
          |             substring(n, j+1, 10000)))))))""".stripMargin))
        .as("variant"))

  /** Exact fuzzy self-join via SymDelete blocking: equi-join on the
    * deletion variant, dedupe, refine with banded levenshtein<=2. The
    * result is IDENTICAL to the unblocked quadratic definition (the
    * oracle runs exactly that), verified by the driver hash. */
  def fuzzyJoinSymDel(customers: DataFrame): DataFrame = {
    val base = customers.select(col("c_custkey").as("k"), col("c_name").as("n"))
    // NARROW candidate generation: the deletion-neighborhood explode
    // multiplies rows ~L²/2 per name, so every byte carried through it
    // is shuffled ~150×. Join on the 8-byte xxhash64 of the variant
    // (equal variants ⇒ equal hashes, so recall is untouched; a hash
    // collision only adds a candidate the exact refine kills) and keep
    // only the two int keys until after dedup — names re-attach to the
    // ~|result|-sized candidate set afterwards. The re-attach join is
    // broadcast here and a narrow int-key shuffle join at scales past
    // the broadcast threshold; either way it is ~150× less data motion
    // than shuffling names through the variant join.
    val sig = symDelSignatures(customers)
      .select(col("k"), xxhash64(col("variant")).as("vh"))
    val a = sig.select(col("k").as("a_key"), col("vh"))
    val b = sig.select(col("k").as("b_key"), col("vh").as("vh_b"))
    a.join(b, col("vh") === col("vh_b") && col("a_key") < col("b_key"))
      // close pairs share MANY deletion variants: dedupe before refine
      .select(col("a_key"), col("b_key"))
      .distinct()
      // Same verify-parallelism pin as fuzzyJoinSig (StagePeek, round
      // 18): the candidate frame is tiny in bytes, AQE coalesces its
      // exchange to one partition, and the name joins + banded
      // levenshtein run single-task TWICE (the final orderBy's range
      // sampling recomputes its child). The explicit count is exempt
      // from coalescing and derives from the session, not a constant;
      // the exchange itself carries only the two int keys. Keyed on a
      // DERIVED expression (ADVICE r19): keyed-by-own-keys is
      // optimizer-collapsed when the upstream distinct already
      // hash-partitions on them (see VerifyWidth's scaladoc), and the
      // keyless round-robin form pays sortBeforeRepartition on every
      // input partition (measured +1.5 s warm on the sig sibling); the
      // hash expression differs from any child partitioning, so the
      // exchange is neither collapsible nor coalescible, at plain
      // hash-exchange cost.
      .repartition(verifyWidth(customers),
        xxhash64(col("a_key"), col("b_key")))
      .join(broadcast(base.select(col("k").as("a_key"), col("n").as("a_name"))),
        "a_key")
      .join(broadcast(base.select(col("k").as("b_key"), col("n").as("b_name"))),
        "b_key")
      // fused threshold-lev kernel: prefix/suffix trim + banded DP in
      // one codegen'd call (see LevenshteinLe)
      .withColumn("dist",
        GraftFunctions.levLe(col("a_name"), col("b_name"), 2))
      .filter(graft.functions.GraftFunctions.noPushdown(col("dist") >= 0))
      .select(col("a_name"), col("b_name"), col("dist"))
      .orderBy("a_name", "b_name")
  }

  /** Signature-blocked fuzzy self-join core (rel_fuzzy_join_sig; reused
    * by graft.tools.FuzzyStress on scaled inputs). Candidate generation
    * is an equi-join on the signature gram — block count grows with
    * distinct name material, so pair volume stays near-linear in data
    * size; refinement is the banded levenshtein<=2 with the common-
    * prefix fast path (see rel_fuzzy_join's notes). */
  def fuzzyJoinSig(customers: DataFrame): DataFrame = {
    val base = customers.select(col("c_custkey").as("k"), col("c_name").as("n"))
    // same narrow-candidate discipline as fuzzyJoinSymDel: carry int
    // keys + the 3-char gram only through the join + dedup, re-attach
    // names after. The join key is the LITERAL gram, not a hash of it:
    // signature blocking is not recall-1.0, so a hash collision could
    // admit a genuine lev<=2 pair the oracle's gram-blocked candidate
    // set lacks — a cross-engine divergence, not merely extra work for
    // the refine. (SymDelete CAN hash its variants: its blocking is
    // exact, so collisions there only add candidates the refine kills.)
    // A trigram is also narrower than an 8-byte hash would be.
    val sig = fuzzySignatures(customers).select(col("k"), col("gram"))
    val a = sig.select(col("k").as("a_key"), col("gram"))
    val b = sig.select(col("k").as("b_key"), col("gram").as("gram_b"))
    a.join(b, col("gram") === col("gram_b") && col("a_key") < col("b_key"))
      // a pair sharing several signature grams appears once per gram
      .select(col("a_key"), col("b_key"))
      .distinct()
      // Pin the verify-stage parallelism (StagePeek, round 18): the
      // distinct pair frame is tiny in BYTES (~0.5 MB at sf0.1), so
      // AQE coalesces its exchange to ONE partition — and everything
      // downstream (both broadcast joins + the banded levenshtein +
      // the ~23x row fan-out) runs single-task, TWICE, because the
      // final orderBy's RangePartitioning samples its child by
      // computing it before the real shuffle. Measured 3.6 + 3.0
      // CPU-s serialized on one core while 31 idled (~7 of 15.5 s
      // wall). An EXPLICIT partition count is exempt from AQE
      // coalescing; defaultParallelism derives from the session (the
      // bench's core-count contract), not a constant — and at scale a
      // candidate frame is coalesce-proof by byte size anyway, so the
      // floor only bites in exactly this cheap-bytes/expensive-rows
      // regime. Keyed on a DERIVED expression (ADVICE r19): see the
      // symDel sibling above — non-collapsible against the distinct's
      // own hash partitioning, coalesce-exempt, and cheaper than the
      // keyless round-robin form (no sortBeforeRepartition).
      .repartition(verifyWidth(customers),
        xxhash64(col("a_key"), col("b_key")))
      .join(broadcast(base.select(col("k").as("a_key"), col("n").as("a_name"))),
        "a_key")
      .join(broadcast(base.select(col("k").as("b_key"), col("n").as("b_name"))),
        "b_key")
      .filter(abs(length(col("a_name")) - length(col("b_name"))) <= 2)
      .withColumn("dist",
        GraftFunctions.levLe(col("a_name"), col("b_name"), 2))
      .filter(graft.functions.GraftFunctions.noPushdown(col("dist") >= 0))
      .select(col("a_name"), col("b_name"), col("dist"))
      .orderBy("a_name", "b_name")
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** See [[VerifyWidth]] — the shared helper (ADVICE r18: the inline
    * copies here and in DedupQueries had diverged). */
  private def verifyWidth(df: DataFrame): Int = VerifyWidth(df)

  val defs: Map[String, QueryDef] = Map(

    // ---- S1-S4 made driver-checkable: the CSV sink + scan round trip.
    // The driver tables are parquet, so the CSV layer was previously
    // test-only; this pushes `customer` through the engine's CSV sink
    // (header, windows-1252, whitespace preserved, partitioned — no
    // coalesce(1): that is a CLI-parity concession, not the engine path)
    // and scans it back through the legacy-charset multiLine reader
    // (PrepareCalls.scala:62-69 options), proving value fidelity against
    // the parquet oracle. Doubles survive exactly: Java emits the
    // shortest digit string that round-trips (Double.toString contract).
    "rel_csv_roundtrip" -> QueryDef.sql(
      "CSV sink + windows-1252 multiLine scan round trip vs parquet")(
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "customer")
      // per-process path (applicationId): concurrent graft processes on
      // one host must not overwrite each other's files mid-scan; within
      // a process the cold+warm bench runs safely reuse it sequentially
      val tmp = System.getProperty("java.io.tmpdir") +
        s"/graft_csv_roundtrip_${s.sparkContext.applicationId}"
      src.write.mode("overwrite")
        .option("header", true)
        .option("encoding", "windows-1252")
        .option("ignoreLeadingWhiteSpace", false)
        .option("ignoreTrailingWhiteSpace", false)
        .csv(tmp)
      s.read.schema(src.schema)
        .option("header", true)
        .option("encoding", "windows-1252")
        .option("multiLine", true)
        .csv(tmp)
        .orderBy("c_custkey")
    },

    // ---- JSONL source + sink: the interchange format training-data
    // pipelines actually exchange (one JSON object per line, splittable,
    // schema-on-read). Round-trips the documents table through Spark's
    // json sink/source with an explicit schema — string escaping is
    // lossless, so the hash must equal the parquet original. Scale: JSONL
    // parse is a narrow per-line map; part files split by line.
    "rel_jsonl_roundtrip" -> QueryDef.sql(
      "JSONL sink + schema'd JSONL scan round trip vs parquet")(
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        s"/graft_jsonl_roundtrip_${s.sparkContext.applicationId}"
      src.write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .orderBy("doc_id")
    },

    // ---- ORC source + sink (the second columnar format Spark ships
    // built-in): round-trips the embeddings table — including the
    // array<float> vector column, which must survive bit-exactly in a
    // binary columnar format — against the parquet original. The final
    // projection posexplodes the vector to (pos, val) rows: the driver's
    // hash gate sorts on raw column values and cannot order a raw
    // array<float>, so the bit-exactness claim is carried by the per-
    // element float32 values instead (same information, driver-sortable).
    "rel_orc_roundtrip" -> QueryDef.sql(
      "ORC sink + ORC scan round trip of array<float> vectors vs parquet")(
      """SELECT vec_id, t.k AS pos, embedding[t.k+1] AS val, label
        |FROM embeddings, unnest(range(len(embedding))) AS t(k)
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "embeddings")
      val tmp = System.getProperty("java.io.tmpdir") +
        s"/graft_orc_roundtrip_${s.sparkContext.applicationId}"
      src.write.mode("overwrite").orc(tmp)
      s.read.schema(src.schema).orc(tmp)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos"), col("val"), col("label"))
        .orderBy("vec_id", "pos")
    },

    // ---- XML source + sink (built into Spark 4): round-trips customer
    // rows through the text-based format against the parquet original.
    // The interesting claim is the DOUBLE column: Java's double→string→
    // double is round-trip-exact, so c_acctbal must come back bit-
    // identical through the textual representation — the oracle reads
    // the parquet original, so any precision loss in the XML leg is a
    // hash mismatch. Schema is pinned on read (no inference pass).
    "rel_xml_roundtrip" -> QueryDef.sql(
      "XML sink + XML scan round trip of customer rows vs parquet")(
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "customer")
      val tmp = System.getProperty("java.io.tmpdir") +
        s"/graft_xml_roundtrip_${s.sparkContext.applicationId}"
      src.write.mode("overwrite").option("rowTag", "row")
        .format("xml").save(tmp)
      s.read.schema(src.schema).option("rowTag", "row")
        .format("xml").load(tmp)
        .orderBy("c_custkey")
    },

    // ---- P1/P2/P3/P4: rename, project-with-reorder, constant + computed
    // columns (ref: petl rename/cut/addfield, prepare_calls.py:35,51;
    // SURVEY §2.2). Narrow ops only: no shuffle, whole-stage codegen,
    // column pruning reaches the parquet scan.
    "rel_project_derive" -> QueryDef.sql(
      "projection + rename + constant & computed derived columns")(
      """SELECT l_orderkey AS orderkey, l_linenumber AS line_no,
        |       l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS net_price,
        |       'lineitem' AS src
        |FROM lineitem ORDER BY orderkey, line_no""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("line_no"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        lit("lineitem").as("src"))
        .orderBy("orderkey", "line_no")
    },

    // ---- F1: filter (petl select truthy-predicate, prepare_calls.py:36).
    // Predicate is pushed to the parquet scan by Catalyst.
    "rel_filter_project" -> QueryDef.sql(
      "filter + projection, predicate pushdown to scan")(
      """SELECT l_orderkey AS orderkey, l_linenumber AS line_no,
        |       l_quantity, l_shipdate
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
        |ORDER BY orderkey, line_no""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey").as("orderkey"),
          col("l_linenumber").as("line_no"),
          col("l_quantity"), col("l_shipdate"))
        .orderBy("orderkey", "line_no")
    },

    // ---- A: hash aggregate with partial (map-side) combine — TPC-H Q1
    // shape. sum_qty is exact (quantities are small integers in double).
    "rel_agg_group" -> QueryDef.sql(
      "groupBy aggregate: sum/count with map-side partial aggregation")(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_cents,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- J3: multi-way equi-join. Dims are broadcast (no shuffle of the
    // fact side for the join; only the final group shuffle remains).
    "rel_join_broadcast_agg" -> QueryDef.sql(
      "orders⋈customer⋈nation⋈region with broadcast dims, then aggregate")(
      """SELECT r_name AS region, n_name AS nation,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY region, nation""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy("region", "nation")
    },

    // ---- Large ⋈ large equi-join: both sides shuffle on the join key
    // (at bench SF Catalyst broadcasts the smaller side, which is the
    // right call there; at 100 TB AQE picks SMJ/shuffled-hash on the
    // same declarative plan — nothing here pins a strategy).
    "rel_join_big" -> QueryDef.sql(
      "lineitem ⋈ orders fact-fact equi-join + aggregate")(
      """SELECT o_orderpriority, count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1995-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("o_orderpriority")
    },

    // ---- Skew-safe aggregation: two-phase salted groupBy for a
    // low-cardinality hot key (event_type). Phase 1 fans the hot key
    // across 8 salt buckets (map-side + 8-way reduce), phase 2 re-merges
    // exactly — integer sums, so the oracle is the plain GROUP BY.
    "rel_skew_salted_agg" -> QueryDef.sql(
      "two-phase salted aggregation over a skewed key")(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .withColumn("_salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("pn"), sum(cents(col("value"))).as("pc"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"), sum(col("pc")).as("value_cents"))
        .orderBy("event_type")
    },

    // ---- Bloom-filter semi-join pruning (runtime-filter pattern):
    // aggregate the filtered dim's keys into a mergeable 64 Kbit Bloom
    // sketch (one 8 KB row), broadcast it, and drop non-matching fact
    // rows BEFORE the join — at 100 TB the sketch probe runs inside the
    // fact scan's codegen stage and the exact join only sees the
    // ~matching fraction (+ a bounded false-positive trickle). No false
    // negatives ⇒ result is exactly the plain semi join, which is the
    // oracle. Spark's own runtime bloom injection
    // (spark.sql.optimizer.runtime.bloomFilter) does this implicitly
    // for shuffle joins; the explicit aggregate also serves incremental
    // pipelines that persist the sketch between runs.
    "rel_bloom_join" -> QueryDef.sql(
      "Bloom-pruned fact⋈dim semi join + aggregate")(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      // The sketch rides a SCALAR SUBQUERY — the same shape Spark's own
      // InjectRuntimeFilter emits — so the probe stays a Filter directly
      // on the fact scan's codegen stage. (A crossJoin(broadcast(sketch))
      // formulation gets re-ordered by PushDownLeftSemiAntiJoin: the
      // exact semi join slides below the probe and the pruning runs
      // last, backwards at scale.)
      t(s, dir, "customer").createOrReplaceTempView("bloom_customer")
      t(s, dir, "orders").createOrReplaceTempView("bloom_orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders,
          |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents
          |FROM bloom_orders
          |WHERE graft_bloom_contains(
          |        (SELECT graft_bloom_agg(c_custkey, 65536, 7)
          |         FROM bloom_customer WHERE c_mktsegment = 'BUILDING'),
          |        o_custkey)
          |  AND o_custkey IN (SELECT c_custkey FROM bloom_customer
          |                    WHERE c_mktsegment = 'BUILDING')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // ---- Skew-safe JOIN: replicate-small/salt-big. The big side salts
    // each row deterministically (pmod(event_id, 8)); the small side is
    // exploded ×8 so every (key, salt) bucket finds its dim row. The
    // hot key's rows now land on 8 reducers instead of one — the
    // replicate-fragment-join from Xu et al. ("Handling data skew in
    // parallel joins", SIGMOD'08) that AQE's skew-join split applies
    // adaptively. Inner-join semantics are unchanged ⇒ plain-join
    // oracle. (With a broadcastable dim Spark would broadcast and skew
    // would be moot — the pattern matters when BOTH sides exceed the
    // broadcast threshold, so the broadcast hint is deliberately
    // absent here.)
    "rel_skew_salted_join" -> QueryDef.sql(
      "salted shuffle join over a skewed key")(
      """SELECT c_mktsegment, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val salts = 8
      val big = t(s, dir, "events")
        .withColumn("_salt", pmod(col("event_id"), lit(salts)))
      val small = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      big.hint("shuffle_hash")
        .join(small, big("user_id") === small("c_custkey") &&
          big("_salt") === small("_salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .orderBy("c_mktsegment")
    },

    // ---- MERGE INTO semantics (upsert): target = current snapshot,
    // source = change batch; matched rows take the source's values,
    // unmatched target rows persist, unmatched source rows insert —
    // the Delta/Iceberg MERGE shape as a single full-outer join +
    // COALESCE, which shuffles each side once on the merge key and
    // scales like any equi-join (no row-at-a-time driver loop). The
    // incremental-corpus-update primitive: yesterday's corpus ⊕
    // today's crawl.
    "rel_upsert_merge" -> QueryDef.sql(
      "MERGE INTO upsert via full-outer join + COALESCE")(
      """WITH target AS (SELECT o_orderkey,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |                FROM orders WHERE o_orderkey % 3 <> 0),
        |src AS (SELECT o_orderkey,
        |          CAST(round(o_totalprice * 100) AS BIGINT) + 500 AS cents
        |        FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(target.o_orderkey, src.o_orderkey) AS o_orderkey,
        |       COALESCE(src.cents, target.cents) AS cents,
        |       CASE WHEN target.o_orderkey IS NULL THEN 'insert'
        |            WHEN src.o_orderkey IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM target FULL JOIN src ON target.o_orderkey = src.o_orderkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey").as("t_key"),
          cents(col("o_totalprice")).as("t_cents"))
      val src = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("s_key"),
          (cents(col("o_totalprice")) + 500).as("s_cents"))
      target.join(src, col("t_key") === col("s_key"), "full_outer")
        .select(
          coalesce(col("t_key"), col("s_key")).as("o_orderkey"),
          coalesce(col("s_cents"), col("t_cents")).as("cents"),
          when(col("t_key").isNull, "insert")
            .when(col("s_key").isNull, "keep")
            .otherwise("update").as("action"))
        .orderBy("o_orderkey")
    },

    // ---- SCD type-2 interval versioning: collapse each user's event
    // stream into effective-dated versions of a tracked attribute
    // (event_type), keeping only change points and deriving
    // [valid_from, valid_to) from the NEXT change via lead() — the
    // dimension-history primitive (Kimball SCD2) built from two window
    // functions over one shuffle on the version key.
    "rel_scd2_intervals" -> QueryDef.sql(
      "SCD2 change-point intervals via lag/lead windows")(
      """WITH o AS (SELECT user_id, event_id, event_type,
        |             CAST(ts AS TIMESTAMP) AS ts,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |chg AS (SELECT * FROM o
        |        WHERE prev IS NULL OR event_type <> prev)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS valid_to,
        |       CAST(row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |         AS version
        |FROM chg ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("event_type") =!= col("prev"))
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).as("valid_to"),
          row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).cast("long").as("version"))
        .orderBy("user_id", "version")
    },

    // ---- J1/A1: first-row-per-key, the deterministic form of petl
    // dictlookupone's first-match semantics (prepare_calls.py:148;
    // SURVEY §2.4 J1): row_number over an explicit order, not first().
    "rel_first_per_key" -> QueryDef.sql(
      "first row per key via row_number window (dictlookupone semantics)")(
      """SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
        |       o_orderdate AS first_orderdate
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1 ORDER BY custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey").as("custkey"),
          col("o_orderkey").as("first_orderkey"),
          col("o_orderdate").as("first_orderdate"))
        .orderBy("custkey")
    },

    // ---- J2/A2/C22: list-per-key (petl dictlookup → collect_list),
    // rendered order-stable by sorting the collected array.
    "rel_collect_list" -> QueryDef.sql(
      "ordered list per key: collect_list + array_sort + array_join")(
      """SELECT l_orderkey AS orderkey,
        |       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_nos,
        |       count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("orderkey"))
        .agg(
          array_join(
            transform(array_sort(collect_list(col("l_linenumber"))),
              _.cast("string")), ",").as("line_nos"),
          count(lit(1)).as("n_lines"))
        .orderBy("orderkey")
    },

    // ---- U2: union by column name with null-padding for missing columns
    // (petl cat, prepare_calls.py:152-155,180-181).
    "rel_union_by_name" -> QueryDef.sql(
      "unionByName with allowMissingColumns (petl cat null-padding)")(
      """SELECT * FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal,
        |         'customer' AS kind, c_mktsegment AS segment FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind
        |  FROM supplier
        |) ORDER BY kind, name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(
        col("c_name").as("name"), col("c_acctbal").as("acctbal"),
        lit("customer").as("kind"), col("c_mktsegment").as("segment"))
      val sup = t(s, dir, "supplier").select(
        col("s_name").as("name"), col("s_acctbal").as("acctbal"),
        lit("supplier").as("kind"))
      c.unionByName(sup, allowMissingColumns = true).orderBy("kind", "name")
    },

    // ---- U1/C14: flat-map / UDTF (petl rowmapmany, generate_call_notes
    // prepare_calls.py:248-274): one row → 0..3 rows. Expressed as
    // explode(array_repeat(...)) so unmatched rows yield count=0 and
    // vanish — exactly petl's silent row-skip-on-error semantics, but
    // declarative and codegen-friendly.
    "rel_explode_udtf" -> QueryDef.sql(
      "row → 0..3 rows via explode(array_repeat) (rowmapmany/UDTF)")(
      """SELECT event_id, unnest(list_transform(
        |  range(CASE lower(event_type) WHEN 'signup' THEN 1
        |        WHEN 'purchase' THEN 2 WHEN 'error' THEN 3 ELSE 0 END),
        |  x -> CASE lower(event_type) WHEN 'signup' THEN 'note_signup'
        |       WHEN 'purchase' THEN 'note_purchase'
        |       WHEN 'error' THEN 'note_error' END)) AS category
        |FROM events ORDER BY event_id, category""".stripMargin) { (s, dir) =>
      val et = lower(col("event_type"))
      val n = when(et === "signup", 1).when(et === "purchase", 2)
        .when(et === "error", 3).otherwise(0)
      val cat = when(et === "signup", "note_signup")
        .when(et === "purchase", "note_purchase")
        .when(et === "error", "note_error")
      t(s, dir, "events")
        .withColumn("category", explode(array_repeat(cat, n)))
        .select(col("event_id"), col("category"))
        .orderBy("event_id", "category")
    },

    // ---- Window: running aggregates (needed for J4 surrogate ids and
    // A1 determinism; SURVEY §2.5).
    "rel_window_running" -> QueryDef.sql(
      "row_number + running sum over a partitioned ordered window")(
      """SELECT event_id, user_id,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS run_cents
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        sum(cents(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("run_cents"))
        .orderBy("event_id")
    },

    // ---- Per-key top-k via the custom whole-operator extension
    // (graft.plans.TopKPerKey: LogicalPlan + SparkStrategy + exec with
    // bounded per-key heaps — O(n log k) and O(keys·k) state instead of
    // the window form's full partition sort). Total order via the
    // (orderkey, linenumber) tie-break ⇒ exact row-set parity with the
    // declarative oracle.
    "rel_topk_per_key" -> QueryDef.sql(
      "top-3 highest-price lineitems per (returnflag, linestatus)")(
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY l_returnflag, l_linestatus
        |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) WHERE rn <= 3
        |ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      graft.plans.TopK.topKPerKey(
          t(s, dir, "lineitem"),
          keys = Seq(col("l_returnflag"), col("l_linestatus")),
          order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc),
          k = 3)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
          col("l_linenumber"), cents(col("l_extendedprice")).as("price_cents"))
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
    },

    // ---- Batch tumbling-window aggregation (same logical shape the
    // streaming layer runs with a watermark; window('1 day') start ≡
    // UTC date_trunc).
    "rel_time_window_agg" -> QueryDef.sql(
      "tumbling 1-day event-time window aggregate")(
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |         AS day, event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
        .select(col("window.start").as("day"), col("event_type"), col("n"),
          col("value_cents"))
        .orderBy("day", "event_type")
    },

    // ---- Window-function family: lag/lead/rank/dense_rank/ntile over
    // one partitioned total order.
    "rel_window_funcs" -> QueryDef.sql(
      "lag/lead/rank/dense_rank/ntile over a total per-user order")(
      """SELECT event_id, user_id,
        |  lag(event_id) OVER w AS prev_event,
        |  lead(event_id) OVER w AS next_event,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        lag(col("event_id"), 1).over(w).as("prev_event"),
        lead(col("event_id"), 1).over(w).as("next_event"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
        .orderBy("event_id")
    },

    // ---- Sort / limit: global top-k. Spark plans TakeOrderedAndProject
    // (per-partition top-k + merge) — no full sort at scale.
    "rel_sort_limit" -> QueryDef.sql(
      "global top-k (TakeOrderedAndProject, not a full sort)")(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- As-of (point-in-time) join: latest order at-or-before each
    // event, per key — graft.operators.AsOfJoin (union + window
    // carry-forward, one shuffle, no range explosion). Oracle: DuckDB's
    // native ASOF JOIN.
    "rel_asof_join" -> QueryDef.sql(
      "as-of join: latest order at-or-before each event per key")(
      """WITH od AS (
        |  SELECT o_custkey AS key, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS t,
        |         max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events)
        |SELECT e.event_id, e.user_id, o.asof_orderkey
        |FROM e ASOF LEFT JOIN od o ON e.user_id = o.key AND e.t >= o.t
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val od = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("key"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
        .agg(max(col("o_orderkey")).as("asof_orderkey"))
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asofJoin(
        e, col("user_id"), unix_micros(col("ts")),
        od, col("key"), col("t"), Seq("asof_orderkey"))
        .select(col("event_id"), col("user_id"), col("asof_orderkey"))
        .orderBy("event_id")
    },

    // ---- Time-series resample + forward fill (gap filling): per user,
    // an hourly grid spanning [trunc(min ts), trunc(max ts)], each grid
    // point carrying the LAST event at-or-before it (LOCF). Composed
    // from sequence()+explode for the grid (rows ∝ users × hours, a
    // narrow generator) and the AsOfJoin operator for the carry (one
    // shuffle, no range explosion) — resampling IS an as-of join
    // against a generated grid. Events are first made unique per
    // (user, ts) with max_by on event_id (both engines), since as-of
    // carry needs a unique build row per instant. Grid points before a
    // user's first event stay null-payloaded.
    "rel_resample_ffill" -> QueryDef.sql(
      "hourly resample with last-observation-carried-forward per user")(
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, ts, max(event_id) AS event_id,
        |        max_by(cents, event_id) AS cents FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0,
        |           date_trunc('hour', max(ts)) AS t1 FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(t0, t1,
        |           INTERVAL 1 HOUR)) AS grid_ts FROM span)
        |SELECT g.user_id AS user_id, g.grid_ts, d.event_id AS last_event_id,
        |       d.cents AS last_cents
        |FROM grid g ASOF LEFT JOIN d
        |  ON g.user_id = d.user_id AND g.grid_ts >= d.ts
        |ORDER BY g.user_id, g.grid_ts""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("cents"))
      val d = e.groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("event_id"),
          max_by(col("cents"), col("event_id")).as("cents"))
        .select(col("user_id").as("d_user"), col("ts"),
          col("event_id").as("last_event_id"), col("cents").as("last_cents"))
      val grid = e.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"),
          date_trunc("hour", max(col("ts"))).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"),
            expr("INTERVAL 1 HOUR"))).as("grid_ts"))
      graft.operators.AsOfJoin.asofJoin(
        grid, col("user_id"), unix_micros(col("grid_ts")),
        d, col("d_user"), unix_micros(col("ts")),
        Seq("last_event_id", "last_cents"))
        .select(col("user_id"), col("grid_ts"),
          col("last_event_id"), col("last_cents"))
        .orderBy("user_id", "grid_ts")
    },

    // ---- Range (interval) join: purchases within 24h after each signup,
    // per user — graft.operators.RangeJoin (bucket-blocked equi-join +
    // exact refine; never a per-key cross join). Oracle: plain range
    // predicate join.
    "rel_range_join" -> QueryDef.sql(
      "interval join: purchases within 24h after each signup per user")(
      """WITH s AS (SELECT event_id, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |           FROM events WHERE event_type = 'signup'),
        |p AS (SELECT event_id, user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |      FROM events WHERE event_type = 'purchase')
        |SELECT s.event_id AS signup_id, count(*) AS n_purchases
        |FROM s JOIN p ON p.user_id = s.user_id
        |  AND p.t >= s.t AND p.t < s.t + 86400000000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          unix_micros(col("ts")).as("t0"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), unix_micros(col("ts")).as("pt"))
      graft.operators.RangeJoin.intervalJoin(
          signups, col("user_id"), col("t0"), col("t0") + 86400000000L,
          purchases, col("p_user"), col("pt"), bucketWidth = 86400000000L)
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy("signup_id")
    },

    // ---- Exact percentiles (sort-based with linear interpolation —
    // same definition as DuckDB quantile_cont).
    "rel_percentile" -> QueryDef.sql(
      "exact grouped percentiles (median + p90)")(
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price,
        |       quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // One Percentile buffer for both quantiles: the two-call form built
      // the SAME value-count map twice (l_extendedprice is near-unique at
      // sf0.1, so each buffer is ~the raw column), doubling the partial
      // maps crossing the exchange and the eval-time sort. The array form
      // evaluates both percentages on one sorted buffer — same
      // interpolation, bit-identical doubles out.
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
            array(lit(0.5), lit(0.9))).as("pcts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("pcts").getItem(0).as("med_price"),
          col("pcts").getItem(1).as("p90_price"), col("n"))
        .orderBy("l_returnflag")
    },

    // ---- Pivot (wide aggregation with explicit value list; the oracle
    // is the equivalent sum(CASE ...) form).
    "rel_pivot" -> QueryDef.sql(
      "pivot on l_linestatus with explicit values")(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("long")))
        .select(col("l_returnflag"), col("F").as("qty_f"),
          col("O").as("qty_o"))
        .orderBy("l_returnflag")
    },

    // ---- Distinct (dedup of a projection).
    "rel_distinct" -> QueryDef.sql(
      "distinct over a joined projection")(
      """SELECT DISTINCT c_mktsegment AS segment, n_name AS nation
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY segment, nation""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_mktsegment").as("segment"), col("n_name").as("nation"))
        .distinct()
        .orderBy("segment", "nation")
    },

    // ---- J5: left join + COALESCE merge (the UPDATE..FROM pattern of
    // sql/import_contact_profile_updates.sql, SURVEY §2.4 J5).
    "rel_left_join_coalesce" -> QueryDef.sql(
      "left join + coalesce merge (UPDATE..FROM COALESCE upsert shape)")(
      """SELECT n_nationkey AS nationkey, n_name AS nation,
        |       coalesce(cnt, 0) AS n_customers,
        |       coalesce(bal_cents, 0) AS bal_cents
        |FROM nation LEFT JOIN (
        |  SELECT c_nationkey, count(*) AS cnt,
        |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |           AS bal_cents
        |  FROM customer GROUP BY c_nationkey
        |) ON n_nationkey = c_nationkey ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val cnts = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("c_acctbal"))).as("bal_cents"))
      t(s, dir, "nation")
        .join(cnts, col("n_nationkey") === col("c_nationkey"), "left")
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
          coalesce(col("cnt"), lit(0L)).as("n_customers"),
          coalesce(col("bal_cents"), lit(0L)).as("bal_cents"))
        .orderBy("nationkey")
    },

    // ---- Semi/anti joins (EXISTS / NOT EXISTS): no payload columns from
    // the right side ever get shuffled.
    "rel_semi_anti" -> QueryDef.sql(
      "left_semi + left_anti joins (EXISTS / NOT EXISTS)")(
      """SELECT * FROM (
        |  SELECT c_custkey AS custkey, 'has_orders' AS status FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey AS custkey, 'no_orders' AS status FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) ORDER BY custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey").as("custkey"), lit("has_orders").as("status"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey").as("custkey"), lit("no_orders").as("status"))
      semi.unionByName(anti).orderBy("custkey")
    },

    // ---- Set operators: INTERSECT / EXCEPT (distinct semantics).
    "rel_set_ops" -> QueryDef.sql(
      "INTERSECT and EXCEPT over key projections")(
      """SELECT custkey, 'both' AS src FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey, 'customer_only' AS src FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY custkey, src""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val o = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      c.intersect(o).withColumn("src", lit("both"))
        .unionByName(c.except(o).withColumn("src", lit("customer_only")))
        .orderBy("custkey", "src")
    },

    // ---- Schema-on-read JSON: from_json with an explicit schema, then
    // typed field access (the structured counterpart of the
    // get_json_object path in rel_json_extract).
    "rel_from_json" -> QueryDef.sql(
      "from_json schema-on-read + typed field aggregation")(
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS sum_k,
        |       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val parsed = t(s, dir, "events")
        .withColumn("p",
          from_json(col("props"), "k BIGINT", Map.empty[String, String]))
      parsed.groupBy(col("event_type"))
        .agg(sum(col("p.k")).as("sum_k"), count(col("p.k")).as("n_k"))
        .orderBy("event_type")
    },

    // ---- Scalar subquery (uncorrelated) through the SQL front door:
    // the registry query itself runs as spark.sql over temp views,
    // deviation-from-global-mean in exact integer cents.
    "rel_scalar_subquery" -> QueryDef.sql(
      "deviation from global mean via scalar subquery (SQL front door)")(
      // Oracle `//` is DuckDB's integer division; Spark spells the same
      // operator `div` (below). The two texts differ ONLY in that token —
      // both are exact BIGINT floor division on non-negative operands.
      """SELECT o_orderkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) -
        |         (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                   AS BIGINT)
        |            // count(*) FROM orders) AS diff_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey,
          |       CAST(round(o_totalprice * 100) AS BIGINT) -
          |         (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |                   AS BIGINT)
          |            div count(*) FROM orders_v) AS diff_cents
          |FROM orders_v ORDER BY o_orderkey""".stripMargin)
    },

    // ---- Rollup (grouping sets family).
    "rel_rollup" -> QueryDef.sql(
      "rollup aggregation with subtotal rows")(
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation, count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"), col("n"))
        .orderBy("region", "nation")
    },

    // ---- Explicit GROUPING SETS (the general form rollup/cube lower
    // to): a hand-picked subset of the lattice — per (flag, status),
    // per flag, per status, but NO grand total. One shuffle: Spark
    // plans an Expand over the sets feeding a single hash aggregate,
    // so cost scales with |sets| × input, not with extra passes.
    "rel_grouping_sets" -> QueryDef.sql(
      "explicit grouping-sets subset (no grand total) in one aggregate")(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // ---- Cube (full grouping-sets lattice over two dims).
    "rel_cube" -> QueryDef.sql(
      "cube aggregation over (returnflag, linestatus)")(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // ---- Range-frame window (value-based frame, not row-based): per
    // user, events in the trailing 24h window by event time.
    "rel_window_range_frame" -> QueryDef.sql(
      "RANGE BETWEEN trailing-24h window aggregate per user")(
      """SELECT event_id, user_id,
        |       count(*) OVER (PARTITION BY user_id
        |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |         AS n_24h,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cents_24h
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, Window.currentRow)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(cents(col("value"))).over(w).as("cents_24h"))
        .orderBy("event_id")
    },

    // ---- Rolling z-score outlier detection per user stream — the
    // time-series anomaly flag, in EXACT integer arithmetic: a float
    // z-score needs sqrt and a division, both order/libm-hazards, so
    // the test |x-μ| > 2σ is algebraically cleared of denominators:
    // (n·x − S)² > 4·(n·Q − S²) with S=Σv, Q=Σv² over the trailing
    // 10-row window, all BIGINT cents (≤1e16 « 2^63 at these value
    // ranges). One window exchange partitioned by user; every derived
    // column is per-row integer math on the window sums.
    "rel_rolling_outlier" -> QueryDef.sql(
      "trailing-10-row integer z-score outlier flag per user stream")(
      """WITH b AS (SELECT event_id, user_id,
        |             CAST(round(value*100) AS BIGINT) AS v,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
        |w AS (SELECT event_id, user_id, v,
        |        count(*) OVER win AS n_win,
        |        CAST(sum(v) OVER win AS BIGINT) AS s_cents,
        |        CAST(sum(v*v) OVER win AS BIGINT) AS q
        |      FROM b WINDOW win AS (PARTITION BY user_id
        |        ORDER BY tu, event_id
        |        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, v AS v_cents, n_win, s_cents,
        |  (n_win*v - s_cents)*(n_win*v - s_cents) AS dev2,
        |  4*(n_win*q - s_cents*s_cents) AS var4,
        |  (n_win >= 5 AND (n_win*v - s_cents)*(n_win*v - s_cents)
        |     > 4*(n_win*q - s_cents*s_cents)) AS is_outlier
        |FROM w ORDER BY event_id""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
        .rowsBetween(-9, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("v"))
        .select(col("event_id"), col("user_id"), col("v"),
          count(lit(1)).over(win).as("n_win"),
          sum(col("v")).over(win).as("s_cents"),
          sum(col("v") * col("v")).over(win).as("q"))
        .withColumn("dev2",
          (col("n_win") * col("v") - col("s_cents")) *
            (col("n_win") * col("v") - col("s_cents")))
        .withColumn("var4",
          lit(4L) * (col("n_win") * col("q") -
            col("s_cents") * col("s_cents")))
        .select(col("event_id"), col("user_id"), col("v").as("v_cents"),
          col("n_win"), col("s_cents"), col("dev2"), col("var4"),
          (col("n_win") >= 5 && col("dev2") > col("var4"))
            .as("is_outlier"))
        .orderBy("event_id")
    },

    // ---- C23-shape: JSON field extraction then aggregate (the QA
    // queries re-parse serialized JSON, prepare_calls.py:360-374).
    "rel_json_extract" -> QueryDef.sql(
      "get_json_object extraction + aggregate")(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS sum_k,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(k).as("sum_k"),
          min(k).as("min_k"), max(k).as("max_k"))
        .orderBy("event_type")
    },

    // ---- C1/C17-shape: JSON serialization of a row (serialize_row /
    // construct_supplemental_data → to_json(struct(...))).
    "rel_json_serialize" -> QueryDef.sql(
      "to_json(struct(...)) row serialization")(
      """SELECT n_nationkey AS nationkey,
        |       CAST(to_json(struct_pack(n_nationkey := n_nationkey,
        |                                n_name := n_name)) AS VARCHAR) AS payload
        |FROM nation ORDER BY nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").select(
        col("n_nationkey").as("nationkey"),
        to_json(struct(col("n_nationkey"), col("n_name"))).as("payload"))
        .orderBy("nationkey")
    },

    // ---- C2/C18/C19: date parse (dd/MM/yyyy, null on mismatch), date
    // arithmetic (+6 days callback start, prepare_calls.py:338-340).
    "rel_date_ops" -> QueryDef.sql(
      "to_date parse/format roundtrip + date_add")(
      """SELECT o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(o_orderdate AS DATE) + 6 AS callback_date,
        |       CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE)
        |         AS roundtrip_date
        |FROM orders ORDER BY orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        date_add(to_date(col("o_orderdate")), 6).as("callback_date"),
        to_date(date_format(col("o_orderdate"), "dd/MM/yyyy"), "dd/MM/yyyy")
          .as("roundtrip_date"))
        .orderBy("orderkey")
    },

    // ---- C15-shape: regexp_extract with null-on-miss (petl convert
    // error-swallow, SURVEY §2.2 P5).
    "rel_regexp_extract" -> QueryDef.sql(
      "regexp_extract + try-cast, null on miss")(
      """SELECT c_custkey AS custkey,
        |       TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
        |         AS name_num,
        |       TRY_CAST(regexp_extract(c_mktsegment, '(\d+)', 1) AS BIGINT)
        |         AS seg_num
        |FROM customer ORDER BY custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long")
          .as("name_num"),
        // no digits in segments → "" → null: petl convert error semantics
        regexp_extract(col("c_mktsegment"), "(\\d+)", 1).cast("long")
          .as("seg_num"))
        .orderBy("custkey")
    },

    // ---- Scalar-function parity sweep: string + math built-ins whose
    // cross-engine behavior the beacon layer leans on.
    "rel_scalar_funcs" -> QueryDef.sql(
      "string/math scalar built-in parity sweep")(
      """SELECT c_custkey AS custkey,
        |  upper(c_name) AS u, lower(c_mktsegment) AS l,
        |  trim(c_name) AS t, substr(c_name, 1, 8) AS sub,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  replace(c_name, '#', '-') AS repl,
        |  length(c_name) AS len,
        |  abs(c_acctbal) AS ab, CAST(floor(c_acctbal) AS BIGINT) AS fl,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        |  CAST(sign(c_acctbal) AS DOUBLE) AS sg,
        |  CAST(c_custkey % 7 AS BIGINT) AS md,
        |  greatest(c_acctbal, CAST(0 AS DOUBLE)) AS gr,
        |  concat(c_mktsegment, '|', c_name) AS cc
        |FROM customer ORDER BY custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("custkey"),
        upper(col("c_name")).as("u"), lower(col("c_mktsegment")).as("l"),
        trim(col("c_name")).as("t"), substring(col("c_name"), 1, 8).as("sub"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        regexp_replace(col("c_name"), "#", "-").as("repl"),
        length(col("c_name")).as("len"),
        abs(col("c_acctbal")).as("ab"), floor(col("c_acctbal")).as("fl"),
        ceil(col("c_acctbal")).as("ce"), signum(col("c_acctbal")).as("sg"),
        (col("c_custkey") % 7).cast("long").as("md"),
        greatest(col("c_acctbal"), lit(0.0)).as("gr"),
        concat(col("c_mktsegment"), lit("|"), col("c_name")).as("cc"))
        .orderBy("custkey")
    },

    // ---- C3-shape: concat_ws over non-empty parts only (concat_address,
    // prepare_contacts.py:47-52 — empty strings must be skipped, which
    // plain concat_ws does not do; hence the higher-order filter).
    "rel_concat_ws_filter" -> QueryDef.sql(
      "concat_ws skipping empty segments (higher-order filter)")(
      """SELECT c_custkey AS custkey,
        |       array_to_string(list_filter(
        |         [c_name, CASE WHEN c_acctbal > 0 THEN c_mktsegment ELSE '' END,
        |          n_name], x -> x <> ''), ', ') AS address_line
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("custkey"),
          concat_ws(", ", filter(
            array(col("c_name"),
              when(col("c_acctbal") > 0, col("c_mktsegment")).otherwise(lit("")),
              col("n_name")),
            x => x =!= "")).as("address_line"))
        .orderBy("custkey")
    },

    // ---- Sessionization (batch form of the streaming
    // EventStreams.sessionize): gap > 6h starts a new session. lag +
    // running-sum windows, then one aggregate — all on the user_id
    // partitioning, so a single shuffle serves every step.
    "rel_sessionize" -> QueryDef.sql(
      "gap-based sessionization via lag + running-sum session ids")(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT *, lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL
        |                       OR epoch_us(ts) - prev_us > 21600000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM g),
        |sid AS (SELECT *, sum(new_sess) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       count(*) AS n_events, min(ts) AS session_start,
        |       max(ts) AS session_end, CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          cents(col("value")).as("cents"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 21600000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("cents")).as("value_cents"))
        .orderBy("user_id", "session_id")
    },

    // ---- MARKOV TRANSITION MATRIX: next-event transition counts per
    // ordered user stream — the sequence-analytics primitive behind
    // next-action datasets and funnel diagnostics. One lag window per
    // user (shuffle by user_id; (user_id, ts) is unique in the fixture
    // and event_id breaks any tie deterministically), then a K²-row
    // aggregate (K = |event_type|) that map-side partial aggregation
    // collapses before the shuffle — output size is independent of
    // corpus size, so the plan holds at any scale.
    "rel_event_transitions" -> QueryDef.sql(
      "event-type transition counts + distinct users per ordered user stream")(
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type AS src_type, event_type AS dst_type,
        |  count(*) AS transitions, count(DISTINCT user_id) AS n_users
        |FROM s WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type").as("src_type"),
          col("event_type").as("dst_type"), col("user_id"))
        .groupBy("src_type", "dst_type")
        .agg(count(lit(1)).as("transitions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("src_type", "dst_type")
    },

    // ---- C12/C13-shape: ternary classification with a genuine null
    // branch (parse_covid_symptoms yes/no/None, prepare_calls.py:239-246).
    // ---- LATERAL correlated join (the per-row-subquery operator
    // class): for each region, its top-2 customers by balance computed
    // by a correlated ORDER BY+LIMIT subquery. Spark decorrelates this
    // into a join + per-key ranking rather than executing the inner
    // query once per outer row, so the declarative form survives scale;
    // both engines run the identical SQL.
    "rel_lateral_topk" -> QueryDef.sql(
      "LATERAL correlated top-2 customers per region")(
      """SELECT r.r_name, l.c_name, l.bal_cents
        |FROM region r, LATERAL (
        |  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r.r_regionkey
        |  ORDER BY bal_cents DESC, c_name LIMIT 2) l
        |ORDER BY r_name, bal_cents DESC, c_name""".stripMargin) { (s, dir) =>
      t(s, dir, "region").createOrReplaceTempView("region_v")
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT r.r_name, l.c_name, l.bal_cents
          |FROM region_v r, LATERAL (
          |  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          |  FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
          |  WHERE n_regionkey = r.r_regionkey
          |  ORDER BY bal_cents DESC, c_name LIMIT 2) l
          |ORDER BY r_name, bal_cents DESC, c_name""".stripMargin)
    },

    // ---- Custom DataSource V2 connector (graft.sources.GraftGen): a
    // deterministic generated table read through the full connector
    // contract — partition planning over id slices, EXACT id-range
    // filter pushdown (out-of-range slices never planned, no residual
    // re-filter), and column pruning. The oracle replays the generator
    // formula over DuckDB's range(). GraftGenSpec asserts the physical
    // pruning; here the driver hashes the values end-to-end.
    "rel_custom_source" -> QueryDef.sql(
      "custom DSv2 source: pushed id range + pruned columns vs range()")(
      """SELECT CAST(t.id AS BIGINT) AS id,
        |       'w' || (t.id % 97) AS text,
        |       CAST((t.id * 7) % 100 AS DOUBLE) / 10 AS val
        |FROM range(1000, 5000) t(id) ORDER BY id""".stripMargin) { (s, dir) =>
      s.read.format("graftgen")
        .option("rows", "100000").option("slices", "16").load()
        .filter(col("id") >= 1000 && col("id") < 5000)
        .orderBy("id")
    },

    // ---- DSv2 COMPLETE aggregate pushdown: count/min/max over the
    // connector answer from the scan itself (one metadata row, zero
    // generated rows — GraftGenSpec pins the physical count), composed
    // with the exact id-range filter pushdown. The 100 TB story:
    // catalog/footer-stats aggregates shouldn't touch data.
    "rel_source_agg_pushdown" -> QueryDef.sql(
      "custom DSv2 source: complete count/min/max pushdown to the scan")(
      """SELECT count(*) AS n, min(t.id) AS min_id, max(t.id) AS max_id
        |FROM range(1000, 60000) t(id)""".stripMargin) { (s, dir) =>
      s.read.format("graftgen")
        .option("rows", "100000").option("slices", "16").load()
        .filter(col("id") >= 1000 && col("id") < 60000)
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
    },

    // ---- Fuzzy join (approximate string match): levenshtein <= 2
    // pairs, blocked on the nation key so candidate generation is an
    // equi-join — the edit distance only runs inside blocks, never on
    // the n² cross product. At production scale the blocking key is a
    // cheap q-gram / length / prefix signature with the same plan
    // shape. Both engines implement classic Levenshtein, so distances
    // and the survivor set agree exactly.
    "rel_fuzzy_join" -> QueryDef.sql(
      "levenshtein<=2 fuzzy self-join, nation-blocked candidates")(
      """SELECT x.c_name AS a_name, y.c_name AS b_name,
        |       CAST(levenshtein(x.c_name, y.c_name) AS INTEGER) AS dist
        |FROM customer x JOIN customer y
        |  ON x.c_nationkey = y.c_nationkey AND x.c_custkey < y.c_custkey
        |WHERE levenshtein(x.c_name, y.c_name) <= 2
        |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      // the probe side of the nation-blocked broadcast self-join reads
      // ONE parquet split at fixture scale, so blocking + the banded
      // levenshtein ran single-task (twice — the orderBy's range
      // sampling); see verifyWidth. The exchange carries 15K narrow rows.
      val x = c.select(col("c_custkey").as("a_key"),
        col("c_name").as("a_name"), col("c_nationkey").as("nk"))
        .repartition(verifyWidth(c), col("a_key"))
      val y = c.select(col("c_custkey").as("b_key"),
        col("c_name").as("b_name"), col("c_nationkey").as("nk_y"))
      x.join(y, col("nk") === col("nk_y") && col("a_key") < col("b_key"))
        // fused threshold-lev kernel (LevenshteinLe): common prefix AND
        // suffix trimmed by invariance (any optimal alignment matches
        // equal affixes), then Ukkonen's banded O(len·k) DP with
        // row-min early abandon, -1 past the threshold — one codegen'd
        // call and zero string copies per pair, vs the previous
        // when(substring…)/levenshtein chain's four copies + two
        // expression trees.
        // noPushdown keeps the filter ABOVE this projection: pushed, it
        // lands in the join condition and the projection re-computes the
        // distance for every surviving row — two evals per pair
        .withColumn("dist",
          GraftFunctions.levLe(col("a_name"), col("b_name"), 2))
        .filter(graft.functions.GraftFunctions.noPushdown(col("dist") >= 0))
        .select(col("a_name"), col("b_name"), col("dist"))
        .orderBy("a_name", "b_name")
    },

    // ---- Fuzzy join, SIGNATURE-blocked (the 100 TB path; the nation-
    // blocked variant above reuses a domain attribute, so its block
    // COUNT is constant and per-block cost grows quadratically with
    // data). Here the blocking key derives from the join attribute
    // itself: ED-Join frequency-ordered q-gram prefix signatures with
    // stop-gram removal — each name's 7 globally-rarest non-stop
    // trigrams (q·k+1 with q=3, k=2). Candidates = pairs sharing a
    // signature gram, deduped, then refined with the same banded
    // levenshtein<=2 + prefix fast path as rel_fuzzy_join. The oracle
    // replays the identical ranking and blocking (ties broken by gram
    // text — a total order), so both engines see the same candidate
    // set by construction. See fuzzySignatures/fuzzyJoinSig for the
    // recall bound and the scale argument.
    "rel_fuzzy_join_sig" -> QueryDef.sql(
      "levenshtein<=2 fuzzy self-join, rare-qgram-signature-blocked")(
      """WITH c AS (SELECT c_custkey AS k, c_name AS n FROM customer
        |           WHERE length(c_name) >= 3),
        |tot AS (SELECT count(*) AS ntot FROM c),
        |g AS (SELECT DISTINCT k, n, substr(n, CAST(p AS INTEGER), 3) AS gram
        |      FROM c, unnest(range(1, length(n) - 1)) AS t(p)),
        |f AS (SELECT gram, count(*) AS tf FROM g GROUP BY 1),
        |sig AS (SELECT k, n, gram FROM (
        |          SELECT g.k, g.n, g.gram,
        |                 row_number() OVER (PARTITION BY g.k
        |                   ORDER BY f.tf, g.gram) AS rk
        |          FROM g JOIN f USING (gram), tot
        |          WHERE f.tf * 20 <= tot.ntot)
        |        WHERE rk <= 7),
        |cand AS (SELECT DISTINCT a.k AS ak, a.n AS an,
        |                         b.k AS bk, b.n AS bn
        |         FROM sig a JOIN sig b
        |           ON a.gram = b.gram AND a.k < b.k)
        |SELECT an AS a_name, bn AS b_name,
        |       CAST(levenshtein(an, bn) AS INTEGER) AS dist
        |FROM cand
        |WHERE abs(length(an) - length(bn)) <= 2
        |  AND levenshtein(an, bn) <= 2
        |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      fuzzyJoinSig(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name")))
    },

    // ---- Fuzzy join, EXACT via deletion-neighborhood (SymDelete)
    // blocking: the oracle is the NAIVE QUADRATIC definition (cross
    // product + levenshtein<=2) with no blocking at all, so the green
    // hash certifies recall 1.0 — the blocking provably lost nothing.
    // Runs on a 10% key sample: the fixture's sequential padded ids
    // pack the edit space so densely that the full table's TRUE pair
    // set itself grows quadratically (no blocking can beat the
    // output's own growth); the sample keeps the oracle's cross
    // product and the bench cost bounded while exercising the
    // identical plan. See symDelSignatures for the exactness argument.
    "rel_fuzzy_join_exact" -> QueryDef.sql(
      "exact levenshtein<=2 self-join via deletion-neighborhood blocking")(
      """WITH c AS (SELECT c_custkey AS k, c_name AS n FROM customer
        |           WHERE c_custkey % 10 = 0)
        |SELECT a.n AS a_name, b.n AS b_name,
        |       CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
        |FROM c a JOIN c b ON a.k < b.k
        |WHERE levenshtein(a.n, b.n) <= 2
        |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      fuzzyJoinSymDel(t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name")))
    },

    // ---- Recursive CTE (Spark 4's WITH RECURSIVE front door, new in
    // 4.x): the hierarchy-walk pattern (org charts, category trees,
    // BOM explosions) as an iterative fixpoint over a derived parent
    // edge parent(n) = n div 2 — each nation key walks to the root
    // with its depth. Both engines run their native recursive-CTE
    // executors (Spark: UnionLoop; DuckDB: recursive pipeline); the
    // registry build goes through spark.sql TEXT, exercising the
    // parser path. Scale: each iteration is a distributed self-step on
    // the frontier; depth is log2(maxKey), so the loop count is
    // bounded and tiny regardless of row count.
    "rel_recursive_cte" -> QueryDef.sql(
      "WITH RECURSIVE hierarchy walk: depth of each nation key to root")(
      """WITH RECURSIVE walk(start_key, cur, depth) AS (
        |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
        |         CAST(0 AS BIGINT)
        |  FROM nation
        |  UNION ALL
        |  SELECT start_key, cur // 2, depth + 1 FROM walk WHERE cur > 0
        |)
        |SELECT start_key, CAST(max(depth) AS BIGINT) AS depth_to_root
        |FROM walk GROUP BY start_key ORDER BY start_key""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql(
        """WITH RECURSIVE walk(start_key, cur, depth) AS (
          |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
          |         CAST(0 AS BIGINT)
          |  FROM nation
          |  UNION ALL
          |  SELECT start_key, cur DIV 2, depth + 1 FROM walk WHERE cur > 0
          |)
          |SELECT start_key, CAST(max(depth) AS BIGINT) AS depth_to_root
          |FROM walk GROUP BY start_key ORDER BY start_key""".stripMargin)
    },

    // ---- Z-order (Morton) clustering value — the multi-column data-
    // layout primitive (Delta/Iceberg OPTIMIZE ZORDER BY), built from
    // stock bit arithmetic (operators/ZOrder.scala: 4 shift/mask
    // rounds per dimension, whole-stage-codegen'd; the layout side —
    // repartitionByRange(zval) + sortWithinPartitions — is proven to
    // prune parquet files on the SECOND dimension in ZOrderSpec). The
    // oracle replays the identical spread rounds with DuckDB's integer
    // bit ops, pinning the z-value math bit-for-bit.
    "rel_zorder_cluster" -> QueryDef.sql(
      "16-bit Morton z-value of (event_id, user_id) dims, exact bit math")(
      """WITH e AS (SELECT event_id, event_id % 65536 AS a,
        |                  user_id % 65536 AS b FROM events),
        |t1 AS (SELECT event_id, a, b,
        |        (a | (a << 8)) & 16711935 AS xa,
        |        (b | (b << 8)) & 16711935 AS xb FROM e),
        |t2 AS (SELECT event_id, a, b,
        |        (xa | (xa << 4)) & 252645135 AS xa,
        |        (xb | (xb << 4)) & 252645135 AS xb FROM t1),
        |t3 AS (SELECT event_id, a, b,
        |        (xa | (xa << 2)) & 858993459 AS xa,
        |        (xb | (xb << 2)) & 858993459 AS xb FROM t2),
        |t4 AS (SELECT event_id, a, b,
        |        (xa | (xa << 1)) & 1431655765 AS xa,
        |        (xb | (xb << 1)) & 1431655765 AS xb FROM t3)
        |SELECT event_id, a, b, CAST(xa | (xb << 1) AS BIGINT) AS zval
        |FROM t4 ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          (col("event_id") % 65536).as("a"),
          (col("user_id") % 65536).as("b"))
        .withColumn("zval",
          graft.operators.ZOrder.zValue(col("a"), col("b")))
        .select(col("event_id"), col("a"), col("b"), col("zval"))
        .orderBy("event_id")
    },

    // ---- Unpivot/melt (the inverse of rel_pivot): wide per-flag
    // aggregate columns to long (flag, metric, value) rows. A narrow
    // Expand over the aggregate output — no extra shuffle.
    "rel_unpivot" -> QueryDef.sql(
      "unpivot wide per-flag aggregates to long (metric, value) rows")(
      """WITH a AS (SELECT l_returnflag,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |               AS BIGINT) AS price_cents
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM a
        |UNPIVOT (value FOR metric IN (qty, price_cents))
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("price_cents"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price_cents")), "metric", "value")
        .orderBy("l_returnflag", "metric")
    },

    // ---- Native session_window (the built-in gap-session OPERATOR, vs
    // rel_sessionize's lag+running-sum formulation): one hash aggregate
    // whose grouping key is the merged session window — no window
    // functions, so no per-user sort barrier beyond the aggregate's own
    // shuffle. Boundary semantics differ from the lag form: Spark's
    // session window is half-open [first, last+gap), so an event at
    // exactly prev+gap starts a NEW session — the oracle uses >= where
    // rel_sessionize's uses >. session_end = last event + gap by
    // definition (not max(ts)).
    "rel_session_window" -> QueryDef.sql(
      "native session_window 6h gap sessions (batch operator form)")(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT *, lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL
        |                       OR epoch_us(ts) - prev_us >= 21600000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM g),
        |sid AS (SELECT *, sum(new_sess) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 6 HOUR AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"),
          session_window(col("ts"), "6 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("value_cents"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"),
          col("value_cents"))
        .orderBy("user_id", "session_start")
    },

    "rel_case_ternary" -> QueryDef.sql(
      "when/when/otherwise(null) ternary + null-group aggregate")(
      """SELECT CASE WHEN lower(event_type) IN ('click','view') THEN 'passive'
        |            WHEN lower(event_type) IN ('purchase','signup') THEN 'active'
        |       END AS activity, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY activity NULLS FIRST""".stripMargin) { (s, dir) =>
      val et = lower(col("event_type"))
      t(s, dir, "events")
        .select(when(et.isin("click", "view"), "passive")
          .when(et.isin("purchase", "signup"), "active")
          .as("activity"))
        .groupBy(col("activity"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("activity").asc_nulls_first)
    }
  )
}
