package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow

/** Per-band-bucket EXISTS(near-dup) with PREFIX FILTERING — the
  * round-18 kernel behind [[graft.plans.BucketAdmitJoin]], replacing
  * td_incremental_dedup's pairwise LEFT SEMI scan whose in-bucket
  * verify work was measured GENUINELY QUADRATIC by the deterministic
  * work probe ([[graft.tools.VerifyWorkProbe]]): pair evaluations
  * ×3.99 per corpus octave at 800×/1600×/3200× (149.6M → 596.6M →
  * 2382.6M, with accepts only 0.03% of them — the early exit cannot
  * save probes that match NOTHING in a wide bucket, and LSH buckets
  * keyed by common shingles grow linearly with the corpus, so reject
  * scans grow as rows × width = n²).
  *
  * The fix is the AllPairs/PPJoin prefix-filter principle (Bayardo
  * WWW'07; Xiao VLDB'08 — the same machinery td_dedup_lsh_recall's
  * lossless ground truth uses corpus-wide), applied INSIDE each
  * bucket: under any total order on tokens, two sets with
  * J(A,B) ≥ 1/2 must share a token within the first floor(|X|/2)+1
  * tokens of EACH (J ≥ 1/2 forces |A∩B| ≥ max(|A|,|B|)/2 via the size
  * filter, and the smallest common token then cannot rank below
  * either prefix boundary). Ordering tokens by ascending LOCAL
  * document frequency puts the rarest tokens in the prefixes, so
  * bucket-mates that collide only through the common
  * (minhash-minimizing) shingles share NO prefix token and are never
  * evaluated. Probing an inverted index of existing-set prefixes with
  * each new set's prefix tokens yields candidates ⊇ all true matches;
  * candidates are verified with the exact [[DeltaVarint.geHalf]]
  * kernel, stopping at the first accept — identical survivor
  * semantics, work linear in bucket volume plus true matches
  * (measured on the stress fixtures: evaluated pairs == accepted
  * pairs exactly, ×1691 fewer evaluations at 800×).
  *
  * Tiny buckets (new×existing ≤ [[BucketAdmit.DirectPairCap]] pairs —
  * the p50 bucket width is 1) skip the decode+index machinery and
  * scan directly; both strategies return the same set, pinned by
  * BucketAdmitProps against the set-theoretic oracle and by
  * IncrementalDedupSpec's survivor-identity corpora end to end.
  */
object BucketAdmit {

  /** Below this pair count the direct scan beats building the index
    * (decode + df + per-set sort + inverted lists ≈ tens of ops per
    * token vs ~20 kernel steps per evaluated pair). */
  val DirectPairCap = 32L

  /** The bucket's two sides: `digs(i)`/`nHsb(i)` = the new classes'
    * digest rows and delta-varint shingle sets, `eHsb` = the existing
    * classes' sets. Returns the digs with at least one J ≥ 1/2
    * partner in `eHsb` (each at most once, input order). */
  def admitCore(digs: Array[InternalRow], nHsb: Array[Array[Byte]],
      eHsb: Array[Array[Byte]]): ArrayBuffer[InternalRow] =
    admitIndices(nHsb, eHsb).map(digs(_))

  /** Index-returning core of [[admitCore]] (round 19): the chunked
    * merge walk in BucketAdmitJoinExec needs the admitted NEW-side
    * positions, not the projected rows, so it can mask classes already
    * admitted by an earlier existing-side chunk. Semantics otherwise
    * identical. */
  def admitIndices(nHsb: Array[Array[Byte]],
      eHsb: Array[Array[Byte]]): ArrayBuffer[Int] = {
    val nN = nHsb.length
    val nE = eHsb.length
    val out = new ArrayBuffer[Int](2)
    if (nN == 0 || nE == 0) return out

    if (nN.toLong * nE <= DirectPairCap) {
      var j = 0
      while (j < nN) {
        var k = 0; var hit = false
        while (k < nE && !hit) {
          hit = DeltaVarint.geHalf(nHsb(j), eHsb(k))
          k += 1
        }
        if (hit) out += j
        j += 1
      }
      return out
    }

    val eDec = eHsb.map(DeltaVarint.decode)
    val nDec = nHsb.map(DeltaVarint.decode)

    // local df over BOTH sides — any shared total order is exact; this
    // one puts the bucket's common (minhash-minimizing) tokens last
    val df = new java.util.HashMap[Long, Int]((nN + nE) * 2)
    var s = 0
    while (s < nE) {
      val a = eDec(s); var t = 0
      while (t < a.length) { df.merge(a(t), 1, Integer.sum _); t += 1 }
      s += 1
    }
    s = 0
    while (s < nN) {
      val a = nDec(s); var t = 0
      while (t < a.length) { df.merge(a(t), 1, Integer.sum _); t += 1 }
      s += 1
    }
    val ord = new Ordering[Long] {
      def compare(x: Long, y: Long): Int = {
        val c = Integer.compare(df.get(x), df.get(y))
        if (c != 0) c else java.lang.Long.compare(x, y)
      }
    }
    // prefix = the floor(n/2)+1 rarest tokens of the set
    def prefix(a: Array[Long]): Array[Long] = {
      if (a.isEmpty) a
      else {
        val p = a.length / 2 + 1
        val srt = a.sorted(ord)
        if (p >= srt.length) srt else java.util.Arrays.copyOf(srt, p)
      }
    }

    val index = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
    // empty existing sets carry no tokens to index; they can only
    // match EMPTY probes, which take the direct-scan fallback below
    var i = 0
    while (i < nE) {
      val pf = prefix(eDec(i))
      var t = 0
      while (t < pf.length) {
        index.computeIfAbsent(pf(t),
          _ => new java.util.ArrayList[Integer](2)).add(i)
        t += 1
      }
      i += 1
    }

    var j = 0
    while (j < nN) {
      var hit = false
      val pf = prefix(nDec(j))
      if (pf.isEmpty) {
        var k = 0
        while (k < nE && !hit) {
          hit = DeltaVarint.geHalf(nHsb(j), eHsb(k)); k += 1
        }
      } else {
        val seen = new java.util.BitSet(nE)
        var pi = 0
        while (pi < pf.length && !hit) {
          val lst = index.get(pf(pi))
          if (lst != null) {
            var li = 0
            while (li < lst.size() && !hit) {
              val ei = lst.get(li).intValue()
              if (!seen.get(ei)) {
                seen.set(ei)
                hit = DeltaVarint.geHalf(nHsb(j), eHsb(ei))
              }
              li += 1
            }
          }
          pi += 1
        }
      }
      if (hit) out += j
      j += 1
    }
    out
  }

  /** Reverse-probing bucket state for the BROADCAST variant
    * ([[graft.plans.BucketAdmitBroadcastExec]]): the bucket's NEW side
    * is resident (broadcast), EXISTING rows stream in unsorted, and
    * each streamed row asks "which still-unaccepted new classes do I
    * admit?". Small buckets scan directly; past [[DirectSideCap]] new
    * sets, a prefix-filter index over the new sets is built on first
    * touch — the total order is (df over the bucket's new sets, token),
    * computable for a streamed existing row too (absent tokens rank
    * df 0, i.e. first, and simply miss the index). Same theorem, roles
    * swapped; each new class is emitted at most once per instance, and
    * once all are accepted further probes are O(1). */
  final class ProbeBucket {
    import scala.collection.mutable.ArrayBuffer

    private val digs = new ArrayBuffer[InternalRow](2)
    private val hsbs = new ArrayBuffer[Array[Byte]](2)
    private var accepted: java.util.BitSet = null
    private var remaining = -1
    private var built = false
    private var df: java.util.HashMap[Long, Int] = null
    private var index: java.util.HashMap[Long, java.util.ArrayList[Integer]] =
      null

    def add(dig: InternalRow, hsb: Array[Byte]): Unit = {
      digs += dig
      hsbs += hsb
      ()
    }

    private def build(): Unit = {
      df = new java.util.HashMap[Long, Int](digs.length * 2)
      val dec = new Array[Array[Long]](digs.length)
      var i = 0
      while (i < digs.length) {
        dec(i) = DeltaVarint.decode(hsbs(i))
        var t = 0
        while (t < dec(i).length) {
          df.merge(dec(i)(t), 1, Integer.sum _); t += 1
        }
        i += 1
      }
      index = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
      i = 0
      while (i < digs.length) {
        val pf = prefixOf(dec(i))
        var t = 0
        while (t < pf.length) {
          index.computeIfAbsent(pf(t),
            _ => new java.util.ArrayList[Integer](2)).add(i)
          t += 1
        }
        i += 1
      }
      built = true
    }

    private def prefixOf(a: Array[Long]): Array[Long] = {
      if (a.isEmpty) return a
      val p = a.length / 2 + 1
      val srt = a.sorted(new Ordering[Long] {
        def compare(x: Long, y: Long): Int = {
          val c = Integer.compare(df.getOrDefault(x, 0),
            df.getOrDefault(y, 0))
          if (c != 0) c else java.lang.Long.compare(x, y)
        }
      })
      if (p >= srt.length) srt else java.util.Arrays.copyOf(srt, p)
    }

    /** The dig rows newly admitted by this existing set (empty once
      * every new class in the bucket has been accepted). */
    def probeExisting(ehsb: Array[Byte]): ArrayBuffer[InternalRow] = {
      if (accepted == null) {
        accepted = new java.util.BitSet(digs.length)
        remaining = digs.length
      }
      val out = new ArrayBuffer[InternalRow](1)
      if (remaining == 0) return out
      if (digs.length <= DirectSideCap) {
        var i = 0
        while (i < digs.length) {
          if (!accepted.get(i) && DeltaVarint.geHalf(hsbs(i), ehsb)) {
            accepted.set(i); remaining -= 1; out += digs(i)
          }
          i += 1
        }
        return out
      }
      if (!built) build()
      val e = DeltaVarint.decode(ehsb)
      if (e.isEmpty) {
        // empty existing matches only empty new sets — which carry no
        // index tokens; scan them directly (rare by construction)
        var i = 0
        while (i < digs.length) {
          if (!accepted.get(i) && DeltaVarint.geHalf(hsbs(i), ehsb)) {
            accepted.set(i); remaining -= 1; out += digs(i)
          }
          i += 1
        }
        return out
      }
      val pf = prefixOf(e)
      var pi = 0
      while (pi < pf.length && remaining > 0) {
        val lst = index.get(pf(pi))
        if (lst != null) {
          var li = 0
          while (li < lst.size() && remaining > 0) {
            val i = lst.get(li).intValue()
            if (!accepted.get(i) && DeltaVarint.geHalf(hsbs(i), ehsb)) {
              accepted.set(i); remaining -= 1; out += digs(i)
            }
            li += 1
          }
        }
        pi += 1
      }
      out
    }
  }

  /** Broadcast-variant analogue of [[DirectPairCap]]: buckets with at
    * most this many resident new sets scan directly per streamed
    * existing row instead of building the index. */
  val DirectSideCap = 4
}
