package graft.tools

import graft.functions.{DeltaVarint, Sketches}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The work probe counts steps with a TWIN of the production kernel
  * ([[VerifyWorkProbe.geHalfSteps]] vs [[DeltaVarint.geHalf]]) — a
  * twin that drifts would count work for a predicate the join no
  * longer runs. Same generator bias as DeltaVarintProps (dense band
  * for real intersections, full production domain, boundaries):
  *
  *   1. the twin's verdict bit equals the production kernel's on
  *      arbitrary encoded pairs — same early exits, same integer test;
  *   2. the step count is positive (even the immediate length-ratio
  *      reject costs its bound check) and never exceeds the merge
  *      walk's |A|+|B|+1 ceiling, so summed steps stay a meaningful
  *      CPU-proportional unit.
  */
object VerifyWorkProbeProps extends Properties("graft.verifywork") {

  private val P = Sketches.P

  private val value: Gen[Long] = Gen.frequency(
    4 -> Gen.choose(0L, 50L),
    4 -> Gen.choose(0L, P - 1),
    1 -> Gen.oneOf(0L, 1L, P - 2, P - 1))

  private val sortedSet: Gen[Array[Long]] = for {
    n <- Gen.choose(0, 40)
    vs <- Gen.listOfN(n, value)
  } yield vs.distinct.sorted.toArray

  private def enc(a: Array[Long]): Array[Byte] =
    DeltaVarint.encode(new GenericArrayData(a))

  property("probe verdict bit == production geHalf") =
    forAll(sortedSet, sortedSet) { (a, b) =>
      val r = VerifyWorkProbe.geHalfSteps(enc(a), enc(b))
      ((r & 1L) == 1L) == DeltaVarint.geHalf(enc(a), enc(b))
    }

  property("step count in [1, |A|+|B|+1]") =
    forAll(sortedSet, sortedSet) { (a, b) =>
      val steps = VerifyWorkProbe.geHalfSteps(enc(a), enc(b)) >>> 1
      steps >= 1 && steps <= a.length + b.length + 1
    }
}
