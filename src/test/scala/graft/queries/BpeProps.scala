package graft.queries

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property sweep for the driver-side BPE trainer's parity-critical
  * pieces (no SparkSession — hundreds of cases are cheap):
  *
  *   1. the argmax tie-break comparator [[TextQueries.utf8Less]] must
  *      equal Spark's own string order (`UTF8String.compareTo`, the
  *      order the distributed `orderBy(pair)` and DuckDB's binary
  *      collation share) on ARBITRARY strings — supplementary-plane
  *      characters are where a UTF-16 comparison silently diverges;
  *   2. the whole local merge loop must equal an independent reference
  *      whose ordering is delegated to `UTF8String.compareTo` — so a
  *      tie broken differently anywhere in the loop fails the sweep.
  *
  * The generator leans on exactly the hazardous alphabet: BMP letters,
  * a char above the surrogate range (U+FFFD), and supplementary-plane
  * symbols (U+10400, U+1D51E) whose surrogate pairs invert the order
  * under UTF-16 comparison.
  */
object BpeProps extends Properties("graft.bpe") {

  private val hazardousChars: Gen[String] = Gen.oneOf(
    "a", "b", "z", "é", "�", "",
    new String(Character.toChars(0x10400)),
    new String(Character.toChars(0x1D51E)))

  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, hazardousChars).map(_.mkString))

  private val vocab: Gen[List[(String, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      for { w <- word; f <- Gen.choose(1L, 9L) } yield (w, f)))

  private def sparkLess(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  property("utf8Less equals Spark's UTF8String order") =
    forAll(word, word) { (a, b) =>
      TextQueries.utf8Less(a, b) == sparkLess(a, b) &&
        TextQueries.utf8Less(a, b) != TextQueries.utf8Less(b, a) ||
        (a == b && !TextQueries.utf8Less(a, b) && !sparkLess(a, b))
    }

  /** Reference loop: same spec as the engine's, with every ordering
    * decision delegated to Spark's comparator and bigrams walked over
    * code points independently (codePoints() stream, not the engine's
    * manual offset walk). */
  private def referenceBpe(rows: Seq[(String, Long)], numMerges: Int)
      : Seq[(Int, String, Long)] = {
    var repr = rows
    val expand = scala.collection.mutable.LinkedHashMap[String, String]()
    val out = Seq.newBuilder[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- repr) {
        val cps = w.codePoints().toArray
        for (i <- 0 until cps.length - 1) {
          val p = new String(cps, i, 2)
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, total) = counts.toSeq.reduceLeft { (x, y) =>
          if (y._2 > x._2 || (y._2 == x._2 && sparkLess(y._1, x._1))) y else x
        }
        val expanded = expand.toSeq.reverse.foldLeft(pair) {
          case (p, (ph, ex)) => p.replace(ph, ex)
        }
        out += ((step, expanded, total))
        val ph = (0xE000 + step).toChar.toString
        expand(ph) = expanded
        repr = repr.map { case (w, f) => (w.replace(pair, ph), f) }
        step += 1
      }
    }
    out.result()
  }

  property("local merge loop equals the UTF8String-ordered reference") =
    forAll(vocab, Gen.choose(1, 8)) { (rows, merges) =>
      val got = TextQueries.bpeTrainLocal(rows.toArray, merges)._1
      got == referenceBpe(rows, merges)
    }
}
