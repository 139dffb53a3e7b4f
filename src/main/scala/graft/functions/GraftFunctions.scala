package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The engine's scalar-function surface beyond Spark built-ins, plus the
  * cross-engine deterministic hashing combinators shared by the dedup /
  * similarity / text-analysis queries.
  *
  * Custom Catalyst expressions are registered into the session's function
  * registry under `graft_*` names and used through
  * `functions.call_function`, so query code stays on the public Column API
  * and any session (including the driver's own Verify/Bench sessions) can
  * run them after [[register]] — no spark-submit extension wiring needed.
  * [[graft.GraftExtensions]] injects the same functions via
  * SparkSessionExtensions for cluster deployments.
  */
object GraftFunctions {

  /** Large prime modulus shared with the DuckDB oracles. */
  val P: Long = Sketches.P

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** All (name, builder) pairs — one place so both runtime registration and
    * the SparkSessionExtensions path stay in sync. */
  val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"), info("graft_dot", classOf[DotProduct]),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist", classOf[SquaredL2]),
      (es: Seq[Expression]) => SquaredL2(es(0), es(1))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[MinHashSignature]),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "k"))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[SimHash]),
      (es: Seq[Expression]) => SimHash(es(0), intArg(es(1), "bits"))),
    (FunctionIdentifier("graft_shingle_hash"),
      info("graft_shingle_hash", classOf[ShingleHash60]),
      (es: Seq[Expression]) => ShingleHash60(es(0), intArg(es(1), "k"),
        intArg(es(2), "modP") != 0)),
    (FunctionIdentifier("graft_minhash_union"),
      info("graft_minhash_union", classOf[MinHashUnionAgg]),
      (es: Seq[Expression]) => MinHashUnionAgg(es(0), intArg(es(1), "k"))),
    (FunctionIdentifier("graft_bitmap_distinct"),
      info("graft_bitmap_distinct", classOf[BitmapDistinctAgg]),
      (es: Seq[Expression]) => BitmapDistinctAgg(es(0), intArg(es(1), "m"))),
    (FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams", classOf[CharNGrams]),
      (es: Seq[Expression]) => CharNGrams(es(0), intArg(es(1), "n"))),
    (FunctionIdentifier("graft_spacesaving_topk"),
      info("graft_spacesaving_topk", classOf[SpaceSavingTopKAgg]),
      (es: Seq[Expression]) => SpaceSavingTopKAgg(es(0),
        intArg(es(1), "capacity"), intArg(es(2), "n"))),
    (FunctionIdentifier("graft_barrier"),
      info("graft_barrier", classOf[PushdownBarrier]),
      (es: Seq[Expression]) => PushdownBarrier(es(0))),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", classOf[NfcNormalize]),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    (FunctionIdentifier("graft_bottomk_sample"),
      info("graft_bottomk_sample", classOf[BottomKByKeyAgg]),
      (es: Seq[Expression]) => BottomKByKeyAgg(es(0), es(1),
        intArg(es(2), "k"))),
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", classOf[BloomFilterAgg]),
      (es: Seq[Expression]) => BloomFilterAgg(es(0),
        intArg(es(1), "numBits"), intArg(es(2), "numHashes"))),
    (FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", classOf[BloomMightContain]),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1))),
    (FunctionIdentifier("graft_lev_le"),
      info("graft_lev_le", classOf[LevenshteinLe]),
      (es: Seq[Expression]) => LevenshteinLe(es(0), es(1), intArg(es(2), "k"))),
    (FunctionIdentifier("graft_subspace_l2"),
      info("graft_subspace_l2", classOf[SubspaceL2]),
      (es: Seq[Expression]) => SubspaceL2(es(0), es(1), es(2),
        intArg(es(3), "subDim"))),
    (FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket", classOf[HyperplaneBucket]),
      (es: Seq[Expression]) => HyperplaneBucket(es(0))),
    (FunctionIdentifier("graft_map_ratio_fold"),
      info("graft_map_ratio_fold", classOf[MapRatioFold]),
      (es: Seq[Expression]) => MapRatioFold(es(0), es(1))),
    (FunctionIdentifier("graft_sort_bits"),
      info("graft_sort_bits", classOf[DoubleSortBits]),
      (es: Seq[Expression]) => DoubleSortBits(es(0))),
    (FunctionIdentifier("graft_jaccard_ge_half_sorted"),
      info("graft_jaccard_ge_half_sorted", classOf[SortedJaccardGeHalf]),
      (es: Seq[Expression]) => SortedJaccardGeHalf(es(0), es(1))),
    (FunctionIdentifier("graft_delta_varint"),
      info("graft_delta_varint", classOf[DeltaVarintEncode]),
      (es: Seq[Expression]) => DeltaVarintEncode(es(0))),
    (FunctionIdentifier("graft_delta_varint_decode"),
      info("graft_delta_varint_decode", classOf[DeltaVarintDecode]),
      (es: Seq[Expression]) => DeltaVarintDecode(es(0))),
    (FunctionIdentifier("graft_jaccard_ge_half_delta"),
      info("graft_jaccard_ge_half_delta", classOf[DeltaJaccardGeHalf]),
      (es: Seq[Expression]) => DeltaJaccardGeHalf(es(0), es(1)))
  )

  /** Idempotently register the graft functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (id, inf, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, b)
    }

  // ---- Column-API wrappers ------------------------------------------------

  /** Ascending-index IEEE left-fold dot product (see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Ascending-index IEEE left-fold squared L2 (see [[SquaredL2]]). */
  def sqDist(a: Column, b: Column): Column =
    call_function("graft_sqdist", a, b)

  /** Squared L2 on subspace `s` of width `subDim` (see [[SubspaceL2]]). */
  def subspaceL2(a: Column, b: Column, s: Column, subDim: Int): Column =
    call_function("graft_subspace_l2", a, b, s, lit(subDim))

  /** Fused 4-hyperplane LSH bucket (see [[HyperplaneBucket]]). */
  def hyperplaneBucket(vd: Column): Column =
    call_function("graft_hyperplane_bucket", vd)

  /** Hash-indexed ordered fold Σᵢ m[bgs(i)] (see [[MapRatioFold]]) —
    * bit-identical to aggregate+element_at, minus the linear map scan
    * per element. */
  def mapRatioFold(bgs: Column, m: Column): Column =
    call_function("graft_map_ratio_fold", bgs, m)

  /** Order-preserving double -> long encoding (see [[DoubleSortBits]]):
    * the bridge between double-valued scores and the long-keyed
    * bounded-state top-k aggregate. */
  def sortBits(x: Column): Column = call_function("graft_sort_bits", x)

  /** MinHash signature of an array<long> of hashes in [0, P). */
  def minhashSig(hashes: Column, k: Int): Column =
    call_function("graft_minhash", hashes, lit(k))

  /** SimHash of an array<long> of token hashes over the low `bits` bits. */
  def simhash(hashes: Column, bits: Int): Column =
    call_function("graft_simhash", hashes, lit(bits))

  /** Fused k-shingle + hash60 kernel (see
    * [[graft.functions.ShingleHash60]]); k=1 → per-word hashes. */
  def shingleHash60(ws: Column, k: Int, modP: Boolean): Column =
    call_function("graft_shingle_hash", ws, lit(k), lit(if (modP) 1 else 0))

  /** Mergeable group MinHash: element-wise min of per-row signatures
    * (= the signature of the group's set union). */
  def minhashUnion(sig: Column, k: Int): Column =
    call_function("graft_minhash_union", sig, lit(k))

  /** Bitmap distinct-bucket sketch count over a long hash column. */
  def bitmapDistinct(hash: Column, m: Int): Column =
    call_function("graft_bitmap_distinct", hash, lit(m))

  /** One-pass overlapping char n-grams (see
    * [[graft.functions.CharNGrams]]); callers filter strings shorter
    * than n characters first. */
  def charNGrams(text: Column, n: Int): Column =
    call_function("graft_char_ngrams", text, lit(n))

  /** SpaceSaving heavy-hitters: top `n` of ≤`capacity` tracked counters
    * as `array<struct<term,cnt,err>>` (see
    * [[graft.functions.SpaceSavingTopKAgg]]). */
  def spaceSavingTopK(term: Column, capacity: Int, n: Int): Column =
    call_function("graft_spacesaving_topk", term, lit(capacity), lit(n))

  /** Pushdown barrier for a filter predicate: returns a semantically
    * identical predicate Catalyst will NOT push below an aggregate.
    *
    * Why it exists: the optimizer pushes deterministic predicates on
    * grouping expressions below aggregates. For `session_window`
    * grouping that rewrite is UNSOUND — the post-merge predicate lands
    * on each row's pre-merge window `[ts, ts+gap)`, so filtering merged
    * sessions on `session_end <= W` silently drops the rows whose
    * initial window end exceeds W and fabricates shorter sessions that
    * the unfiltered aggregation never produces (observed on Spark
    * 4.1.2: the pushed `ts + gap <= W` reaches the parquet scan below
    * MergingSessions; SessionWindowPushdownSpec pins the hazard and
    * this mitigation). The wrapper is the opaque non-deterministic
    * identity [[PushdownBarrier]] — a `rand()`-based guard is not
    * enough, because the optimizer constant-folds provably-constant
    * rand comparisons and then moves the remaining predicate.
    */
  def noPushdown(pred: Column): Column = call_function("graft_barrier", pred)

  /** Unicode NFC canonical composition (see
    * [[graft.functions.NfcNormalize]]); DuckDB parity via
    * `nfc_normalize`. */
  def nfc(c: Column): Column = call_function("graft_nfc", c)

  /** Deterministic bottom-k-by-hash sample per group (see
    * [[graft.functions.BottomKByKeyAgg]]). */
  def bottomKSample(key: Column, payload: Column, k: Int): Column =
    call_function("graft_bottomk_sample", key, payload, lit(k))

  /** Mergeable Bloom-filter sketch of a bigint key column (see
    * [[graft.functions.BloomFilterAgg]]). */
  def bloomAgg(key: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_agg", key, lit(numBits), lit(numHashes))

  /** Codegen'd Bloom probe: false ⇒ key definitely not in the sketch's
    * build set (see [[graft.functions.BloomMightContain]]). */
  def bloomContains(sketch: Column, key: Column): Column =
    call_function("graft_bloom_contains", sketch, key)

  /** Threshold Levenshtein: exact distance when <= k, -1 otherwise —
    * one fused codegen'd call with prefix/suffix trimming + banded DP
    * (see [[graft.functions.LevenshteinLe]]). */
  def levLe(a: Column, b: Column, k: Int): Column =
    call_function("graft_lev_le", a, b, lit(k))

  // ---- Cross-engine deterministic hashing (Spark built-ins only) ----------

  /** 60-bit deterministic string hash: first 15 hex chars of md5, as a long.
    * DuckDB replays it as `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
    * Built from codegen'd built-ins (md5/substring/conv) — stays inside
    * whole-stage codegen, unlike a Scala UDF.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** hash60 reduced into the minhash field [0, P). */
  def hash60modP(c: Column): Column = hash60(c) % P

  /** Word tokens (single-space tokenizer, mirrors DuckDB string_split). */
  def words(text: Column): Column = split(text, " ")

  /** Word k-shingles joined with single spaces; empty array when there
    * are fewer than k words (DuckDB `range(n-k+1)` yields [] the same
    * way), null for null input — matching the fused
    * [[graft.functions.ShingleHash60]] kernel's null-intolerance.
    */
  def shingles(ws: Column, k: Int): Column =
    when(ws.isNull, lit(null).cast("array<string>"))
      .when(size(ws) >= k,
        transform(sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", (0 until k).map(o => element_at(ws, i + o + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Jaccard similarity of two pre-distinct string arrays, as the single
    * double division |A∩B| / |A∪B| (bit-identical cross-engine). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** `jaccard(a, b) >= 1/2` as one fused merge walk over SORTED
    * distinct non-empty long arrays, with impossibility/sufficiency
    * early exits (see [[SortedJaccardGeHalf]] for the exactness
    * argument and the sortedness contract). */
  def jaccardGeHalfSorted(a: Column, b: Column): Column =
    call_function("graft_jaccard_ge_half_sorted", a, b)

  /** Sorted distinct `array<long>` → delta-varint `binary` — the
    * compact exchange form of a shingle set (see [[DeltaVarint]]). */
  def deltaVarint(a: Column): Column =
    call_function("graft_delta_varint", a)

  /** delta-varint `binary` → `array<long>` (see [[DeltaVarintDecode]]
    * for where the decode belongs relative to the exchange). */
  def deltaVarintDecode(a: Column): Column =
    call_function("graft_delta_varint_decode", a)

  /** [[jaccardGeHalfSorted]] over two [[deltaVarint]]-encoded sets —
    * same verdict and early exits, walked directly on the encoded
    * bytes (see [[DeltaVarint.geHalf]]). */
  def jaccardGeHalfDelta(a: Column, b: Column): Column =
    call_function("graft_jaccard_ge_half_delta", a, b)
}
