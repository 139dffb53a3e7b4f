package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the custom expression kernels against naive
  * reference implementations (SURVEY.md §5: property layer). These run
  * the expressions' eval paths directly — no SparkSession — so hundreds
  * of cases are cheap.
  */
object KernelProps extends Properties("graft.kernels") {

  private[functions] def strArr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private[functions] val dummy = Literal.create(null, StringType)

  /** Reference 60-bit md5-prefix hash (the first 15 hex digits). */
  private def hash60Ref(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val word: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(1, Gen.alphaLowerChar),
    Gen.const(""), Gen.const("café"),
    Gen.stringOfN(8, Gen.alphaNumChar))
  private val wordList: Gen[List[String]] = Gen.listOfN(12, word)

  property("ShingleHash60 matches shingle-join + md5-prefix reference") =
    forAll(wordList, Gen.choose(1, 4)) { (ws, k) =>
      val got = ShingleHash60(dummy, k, modP = false)
        .nullSafeEval(strArr(ws)).asInstanceOf[ArrayData].toLongArray().toSeq
      val want =
        if (ws.length < k) Seq.empty
        else ws.sliding(k).map(sh => hash60Ref(sh.mkString(" "))).toSeq
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("ShingleHash60 modP reduces every hash into [0, P)") =
    forAll(wordList) { ws =>
      val got = ShingleHash60(dummy, 2, modP = true)
        .nullSafeEval(strArr(ws)).asInstanceOf[ArrayData].toLongArray()
      Prop(got.forall(h => h >= 0 && h < Sketches.P))
    }

  property("MinHashSignature = per-permutation min over hashes") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, Sketches.P - 1))) { hs =>
      val sig = MinHashSignature(dummy, 8)
        .nullSafeEval(new GenericArrayData(hs.toArray))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      val want = (0 until 8).map { j =>
        hs.map(h => ((2L * j + 3) * h + (5L * j + 7)) % Sketches.P).min
      }
      Prop(sig == want)
    }

  property("SimHash bit j is sign of the ±1 vote sum") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))) { hs =>
      val sim = SimHash(dummy, 16)
        .nullSafeEval(new GenericArrayData(hs.toArray)).asInstanceOf[Long]
      val want = (0 until 16).map { j =>
        val votes = hs.map(h => ((h >> j) & 1L) * 2 - 1).sum
        if (votes > 0) 1L << j else 0L
      }.sum
      Prop(sim == want)
    }

  property("DotProduct equals the ascending left fold") =
    forAll(Gen.listOfN(16, Gen.choose(-10.0, 10.0)),
      Gen.listOfN(16, Gen.choose(-10.0, 10.0))) { (a, b) =>
      val got = DotProduct(dummy, dummy)
        .nullSafeEval(new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray)).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      Prop(got == want) // bit-exact, same operation order
    }

  property("MinHashUnionAgg merge = element-wise min (mergeable sketch)") =
    forAll(Gen.listOfN(8, Gen.choose(0L, Long.MaxValue - 1)),
      Gen.listOfN(8, Gen.choose(0L, Long.MaxValue - 1))) { (a, b) =>
      val agg = MinHashUnionAgg(dummy, 8)
      val merged = agg.merge(a.toArray, b.toArray).toSeq
      Prop(merged == a.zip(b).map { case (x, y) => math.min(x, y) })
    }

  property("BitmapDistinctAgg eval counts distinct buckets exactly") =
    forAll(Gen.listOf(Gen.choose(Long.MinValue + 1, Long.MaxValue))) { hs =>
      val m = 1024
      val agg = BitmapDistinctAgg(dummy, m)
      val buf = hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        val bucket = ((h % m + m) % m).toInt
        b(bucket >> 6) |= 1L << (bucket & 63)
        b
      }
      Prop(agg.eval(buf) == hs.map(h => ((h % m + m) % m)).distinct.size)
    }

  property("BottomKByKeyAgg merge = bottom-k of the union (mergeable sample)") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 1000L))),
      Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 1000L))),
      Gen.choose(1, 6)) { (xs, ys, k) =>
      val agg = BottomKByKeyAgg(dummy, dummy, k)
      def feed(items: Seq[(Long, Long)]) =
        items.foldLeft(agg.createAggregationBuffer()) { (b, e) =>
          if (b.size < k) b.enqueue(e)
          else if (Ordering.Tuple2(Ordering.Long, Ordering.Long).lt(e, b.head)) {
            b.dequeue(); b.enqueue(e)
          }
          b
        }
      val merged = agg.merge(feed(xs), feed(ys))
      val got = agg.eval(merged).asInstanceOf[ArrayData]
      val gotSeq = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      Prop(gotSeq == (xs ++ ys).sorted.take(k))
    }

  property("DotProduct yields null on mismatched array lengths") =
    forAll(Gen.choose(1, 10), Gen.choose(11, 20)) { (n, m) =>
      val a = new GenericArrayData(Array.fill(n)(1.0))
      val b = new GenericArrayData(Array.fill(m)(1.0))
      Prop(DotProduct(dummy, dummy).nullSafeEval(a, b) == null)
    }

  property("SquaredL2 equals the ascending fold of squared differences") =
    forAll(Gen.listOfN(16, Gen.choose(-10.0, 10.0)),
      Gen.listOfN(16, Gen.choose(-10.0, 10.0))) { (a, b) =>
      val got = SquaredL2(dummy, dummy)
        .nullSafeEval(new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray)).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) {
        case (acc, (x, y)) => acc + (x - y) * (x - y) }
      Prop(got == want) // bit-exact, same operation order
    }

  property("SquaredL2 yields null on mismatched array lengths") =
    forAll(Gen.choose(1, 10), Gen.choose(11, 20)) { (n, m) =>
      val a = new GenericArrayData(Array.fill(n)(1.0))
      val b = new GenericArrayData(Array.fill(m)(1.0))
      Prop(SquaredL2(dummy, dummy).nullSafeEval(a, b) == null)
    }

  property("SubspaceL2 equals the ascending fold of squared diffs on the window") =
    forAll(Gen.listOfN(64, Gen.choose(-10.0, 10.0)),
      Gen.listOfN(64, Gen.choose(-10.0, 10.0)), Gen.choose(0, 3)) { (a, b, s) =>
      val got = SubspaceL2(dummy, dummy, dummy, 16)
        .nullSafeEval(new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray), s).asInstanceOf[Double]
      val want = (0 until 16).foldLeft(0.0) { (acc, i) =>
        val d = a(s * 16 + i) - b(s * 16 + i)
        acc + d * d
      }
      Prop(got == want) // bit-exact, same operation order
    }

  property("SubspaceL2 yields null when the subspace overruns either array") =
    forAll(Gen.choose(1, 15), Gen.choose(0, 3)) { (short, s) =>
      val full = new GenericArrayData(Array.fill(64)(1.0))
      val trunc = new GenericArrayData(Array.fill(s * 16 + short)(1.0))
      val k = SubspaceL2(dummy, dummy, dummy, 16)
      Prop(k.nullSafeEval(trunc, full, s) == null &&
        k.nullSafeEval(full, trunc, s) == null &&
        k.nullSafeEval(full, full, 4) == null)
    }

  property("SubspaceL2 bounds guard survives int overflow in s * subDim") =
    forAll(Gen.oneOf(1 << 28, Int.MaxValue, Int.MaxValue / 16 + 1)) { s =>
      // s = 2^28 with subDim 16 wraps the INT product to exactly 0: an
      // int-math guard passes and reads subspace 0 as a plausible value.
      // The long-math guard (ADVICE r9) must yield null for every huge s.
      val full = new GenericArrayData(Array.fill(64)(1.0))
      Prop(SubspaceL2(dummy, dummy, dummy, 16)
        .nullSafeEval(full, full, s) == null)
    }

  property("HyperplaneBucket equals the 4x ascending-fold composition") =
    forAll(Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)))) { a =>
      val got = HyperplaneBucket(dummy)
        .nullSafeEval(new GenericArrayData(a.toArray))
      // reference: the composed-Column formula's per-j ascending IEEE
      // left fold from 0.0, summed when positive (bit-exact order)
      val want = (0 until 4).map { j =>
        val dotj = a.zipWithIndex.foldLeft(0.0) { case (acc, (v, i)) =>
          acc + v * ((i * 37 + j * 101) % 19 - 9)
        }
        if (dotj > 0) 1 << j else 0
      }.sum
      Prop(got == want)
    }

  property("HyperplaneBucket: a null element buckets to 0 (composition parity)") =
    forAll(Gen.listOfN(8, Gen.choose(-10.0, 10.0)), Gen.choose(0, 8)) {
      (a, at) =>
      // acc + null nulls every fold from that element on, so all four
      // when(dot_j > 0) legs fall to otherwise(0) in the composition
      val boxed = a.map(Double.box).toArray[Any]
      val withNull = (boxed.take(at) :+ null) ++ boxed.drop(at)
      Prop(HyperplaneBucket(dummy)
        .nullSafeEval(new GenericArrayData(withNull)) == 0)
    }

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.const("a"), Gen.const("café au lait"),
    Gen.const("日本語テキスト"), Gen.const("mixed café 日本 𝔘nicode"),
    Gen.alphaNumStr, Gen.stringOfN(40, Gen.alphaLowerChar))

  private val decomposable: Gen[String] = Gen.oneOf(
    Gen.const("cafe\u0301"),            // e + combining acute
    Gen.const("A\u030angstro\u0308m"),  // ring / diaeresis compose
    Gen.const("d\u0307\u0323"),         // marks reorder under NFC
    textGen)

  property("NfcNormalize equals java.text.Normalizer NFC and is idempotent") =
    forAll(decomposable) { s =>
      def run(x: String): String = NfcNormalize(dummy)
        .nullSafeEval(UTF8String.fromString(x))
        .asInstanceOf[UTF8String].toString
      val got = run(s)
      val want = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC)
      Prop(got == want && run(got) == got)
    }

  property("CharNGrams matches the code-point sliding-window reference") =
    forAll(textGen, Gen.choose(1, 3)) { (s, n) =>
      val got = CharNGrams(dummy, n)
        .nullSafeEval(UTF8String.fromString(s)).asInstanceOf[ArrayData]
        .toObjectArray(StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
      // reference slides over CODE POINTS (a UTF-16 char slide would
      // split surrogate pairs like 𝔘 — exactly the bug class this pins)
      val cps = s.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toSeq
      val want = if (cps.length < n) Seq.empty
        else cps.sliding(n).map(_.mkString).toSeq
      Prop(got == want) :| s"got=$got want=$want"
    }

  // ---- LevenshteinLe vs the textbook full-matrix DP ----------------------

  /** Reference: full O(n·m) Wagner–Fischer over code points. */
  private def levRef(a: String, b: String): Int = {
    val ca = a.codePoints.toArray
    val cb = b.codePoints.toArray
    val dp = Array.tabulate(ca.length + 1)(i => Array.tabulate(cb.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to ca.length; j <- 1 to cb.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (ca(i - 1) == cb(j - 1)) 0 else 1))
    dp(ca.length)(cb.length)
  }

  // low-entropy alphabet + shared affixes force trimming/band edge cases;
  // the unicode entries cover multi-byte and supplementary code points
  private val levStr: Gen[String] = for {
    core <- Gen.listOfN(6, Gen.oneOf(Gen.oneOf('a', 'b'), Gen.const('\u00e9'),
      Gen.const('\uD83D'))).map(_.mkString.replace("\uD83D", "\uD83D\uDE00"))
    pre <- Gen.oneOf("", "Customer#0000")
    suf <- Gen.oneOf("", "000x")
  } yield pre + core + suf

  property("LevenshteinLe(k) = full-DP distance when <=k, else -1") =
    forAll(levStr, levStr, Gen.choose(0, 4)) { (a, b, k) =>
      val got = LevRuntime.levLe(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      val full = levRef(a, b)
      val want = if (full <= k) full else -1
      Prop(got == want) :| s"a=$a b=$b k=$k got=$got full=$full"
    }
  property("DoubleSortBits preserves SQL double ordering (and -0.0 == 0.0)") =
    forAll(
      Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1.0, -1.0,
        Double.MinPositiveValue, -Double.MinPositiveValue,
        Double.MaxValue, -Double.MaxValue)),
      Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 2.5e-300)))
    { (x: Double, y: Double) =>
      def enc(d: Double): Long =
        DoubleSortBits(dummy).nullSafeEval(d).asInstanceOf[Long]
      val cmpD = java.lang.Double.compare(x + 0.0, y + 0.0) // SQL order, zeros merged
      val cmpL = java.lang.Long.compare(enc(x), enc(y))
      Integer.signum(cmpD) == Integer.signum(cmpL)
    }

}

object MapRatioFoldProps extends Properties("graft.mapRatioFold") {

  import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import KernelProps.{dummy, strArr}

  private def mkMap(entries: Seq[(String, Double)]) =
    new ArrayBasedMapData(
      new GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(
        entries.map(e => java.lang.Double.valueOf(e._2)).toArray[Any]))

  private val key: Gen[String] = Gen.stringOfN(2, Gen.alphaLowerChar)

  property("matches the left-to-right element_at fold bit-for-bit") =
    forAll(Gen.listOfN(30, key), Gen.mapOf(Gen.zip(key,
      Gen.choose(0.1, 1000.0)))) { (bgs0, model0) =>
      // fold only over keys the model covers (missing-key case below)
      val model = model0 + ("aa" -> 3.5)
      val bgs = bgs0.map(k => if (model.contains(k)) k else "aa")
      val expr = MapRatioFold(dummy, dummy)
      val got = expr.nullSafeEval(strArr(bgs), mkMap(model.toSeq))
      var ref = 0.0
      bgs.foreach(k => ref += model(k)) // same IEEE order
      got == ref
    }

  property("a key absent from the model yields null, like element_at") =
    forAll(Gen.listOfN(5, key)) { bgs =>
      val expr = MapRatioFold(dummy, dummy)
      val model = mkMap(Seq("zz" -> 1.0))
      val mixed = strArr(bgs :+ "missing!")
      expr.nullSafeEval(mixed, model) == null
    }

  property("duplicate map keys resolve FIRST-wins, like GetMapValue") =
    forAll(Gen.choose(1.0, 9.0), Gen.choose(10.0, 19.0)) { (a, b) =>
      val expr = MapRatioFold(dummy, dummy)
      val dup = mkMap(Seq("aa" -> a, "aa" -> b))
      expr.nullSafeEval(strArr(Seq("aa")), dup) == a
    }

  property("nullable regardless of children (missing keys yield null)") =
    Prop {
      val nonNull = org.apache.spark.sql.catalyst.expressions.Literal
        .create("x", org.apache.spark.sql.types.StringType)
      MapRatioFold(nonNull, nonNull).nullable
    }

  property("reference-memoized index survives a different map instance") =
    forAll(Gen.choose(1.0, 9.0)) { v =>
      val expr = MapRatioFold(dummy, dummy)
      val m1 = mkMap(Seq("aa" -> v))
      val m2 = mkMap(Seq("aa" -> (v + 1)))
      // same expression instance, two distinct maps: no stale index
      expr.nullSafeEval(strArr(Seq("aa")), m1) == v &&
        expr.nullSafeEval(strArr(Seq("aa")), m2) == v + 1 &&
        expr.nullSafeEval(strArr(Seq("aa")), m1) == v
    }

}
