package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property sweep for the delta-varint codec behind the incremental-
  * dedup band frames (no SparkSession — hundreds of cases are cheap;
  * the SQL-layer/codegen path and the production grid are pinned in
  * IncrementalDedupSpec):
  *
  *   1. decode ∘ encode is the identity on ARBITRARY sorted distinct
  *      sets over the full production domain [0, P) — including
  *      adjacent values (gap 1), value 0, and P−1;
  *   2. [[DeltaVarint.geHalf]] over encoded pairs equals the integer
  *      oracle 3·|A∩B| ≥ |A|+|B| computed set-theoretically — so the
  *      merge walk's early exits can never change a verdict, whatever
  *      the size ratio or overlap layout drawn.
  *
  * The generator biases toward SMALL value ranges so intersections
  * and tight gaps actually occur (uniform 30-bit draws would almost
  * never collide), and draws pair halves from one shared pool so
  * overlaps span 0..100%.
  */
object DeltaVarintProps extends Properties("graft.deltavarint") {

  private val P = Sketches.P

  /** Sorted distinct draws from a deliberately mixed domain: a dense
    * band (collisions/gap-1 likely), a wide band, and the boundary
    * values. */
  private val value: Gen[Long] = Gen.frequency(
    4 -> Gen.choose(0L, 50L),             // dense: gap-1 adjacency
    4 -> Gen.choose(0L, P - 1),           // full production domain
    1 -> Gen.oneOf(0L, 1L, P - 2, P - 1)) // boundaries

  private val sortedSet: Gen[Array[Long]] = for {
    n <- Gen.choose(0, 40)
    vs <- Gen.listOfN(n, value)
  } yield vs.distinct.sorted.toArray

  property("decode . encode == identity") = forAll(sortedSet) { a =>
    DeltaVarint.decode(
      DeltaVarint.encode(new GenericArrayData(a))).sameElements(a)
  }

  property("encoded geHalf == set-theoretic 3|A.B| >= |A|+|B|") =
    forAll(sortedSet, sortedSet) { (a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val oracle = 3 * inter >= a.length + b.length
      val got = DeltaVarint.geHalf(
        DeltaVarint.encode(new GenericArrayData(a)),
        DeltaVarint.encode(new GenericArrayData(b)))
      got == oracle
    }
}
