package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check of the deletion-neighborhood (SymDelete) blocking
  * invariant behind `RelationalQueries.symDelSignatures` /
  * `rel_fuzzy_join_exact`: for ANY two strings within Levenshtein
  * distance 2, their ≤2-deletion variant sets intersect — so an
  * equi-join on the variant never loses a qualifying pair (recall
  * 1.0). Pure JVM (no SparkSession): the variant enumeration here
  * mirrors the SQL expression (all deletions of 0, 1, or 2 character
  * positions) and the distance is the textbook DP, so hundreds of
  * randomized cases are cheap. The registry query re-proves the same
  * claim end-to-end against the naive quadratic DuckDB oracle.
  */
object SymDelProps extends Properties("graft.symdel") {

  private def variants(s: String): Set[String] = {
    val del1 = (0 until s.length).map(i =>
      s.substring(0, i) + s.substring(i + 1))
    val del2 = for {
      i <- 0 until s.length
      j <- i + 1 until s.length
      // delete j first so i's index stays valid
      t = s.substring(0, j) + s.substring(j + 1)
    } yield t.substring(0, i) + t.substring(i + 1)
    (Seq(s) ++ del1 ++ del2).toSet
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val base: Gen[String] = for {
    n <- Gen.choose(3, 18)
    cs <- Gen.listOfN(n, Gen.oneOf(Gen.numChar, Gen.alphaLowerChar))
  } yield cs.mkString

  /** Apply up to 2 random edits (substitute / insert / delete). */
  private val editedPair: Gen[(String, String)] = for {
    s <- base
    nEdits <- Gen.choose(0, 2)
    edited <- (0 until nEdits).foldLeft(Gen.const(s)) { (g, _) =>
      g.flatMap { cur =>
        for {
          kind <- Gen.choose(0, 2)
          pos <- Gen.choose(0, math.max(0, cur.length - 1))
          c <- Gen.numChar
        } yield kind match {
          case 0 if cur.nonEmpty => // substitute
            cur.updated(pos, c)
          case 1 => // insert
            cur.substring(0, pos) + c + cur.substring(pos)
          case _ if cur.nonEmpty => // delete
            cur.substring(0, pos) + cur.substring(pos + 1)
          case _ => cur
        }
      }
    }
  } yield (s, edited)

  property("pairs within lev<=2 always share a deletion variant") =
    forAll(editedPair) { case (a, b) =>
      lev(a, b) > 2 || (variants(a) & variants(b)).nonEmpty
    }

  property("variant count is 1 + L + L(L-1)/2 for distinct-char strings") =
    forAll(Gen.choose(3, 12)) { n =>
      // distinct characters -> no two deletions collide
      val s = ('a' to 'z').take(n).mkString
      variants(s).size == 1 + n + n * (n - 1) / 2
    }

  property("sharing a variant bounds distance: lev <= 4 (2 dels each side)") =
    forAll(editedPair) { case (a, b) =>
      (variants(a) & variants(b)).isEmpty || lev(a, b) <= 4
    }
}
