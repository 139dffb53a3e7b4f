package graft

/** THE shared memoization utility (VERDICT r13 #5): every built-frame /
  * derived-artifact memo in the engine routes through here, so the CAS
  * discipline those memos need — single-flight compute, evict-before-
  * replace, putIfAbsent race resolution — is derived once and
  * spec-pinned once (TablesSpec's memo suite + MemoPrincipleSpec's
  * structural gate), instead of re-grown per operator (the Butterfly
  * and Tables memos had accumulated three generations of independent
  * race fixes before the extraction).
  *
  * Two tiers, matching the two memo classes the engine actually has:
  *
  *  - [[memoized]] — fingerprint-validated, single-flight, with evict
  *    hooks: for derived ARTIFACTS holding external state (persisted
  *    label tables, trained models, path-keyed schema/stats caches)
  *    where a stale serve is a correctness bug and a superseded value
  *    must be released exactly once.
  *  - [[getOrBuild]] — bounded, race-benign get-or-build: for BUILT
  *    FRAMES (expensive plan constructions whose value is a pure
  *    function of the key) where a racing duplicate build is harmless
  *    — last put wins, both values are correct — and no external state
  *    rides on eviction.
  *
  * Memo POLICY (what may be memoized at all) is the artifact layer's
  * concern, gated by MemoPrincipleSpec: operators memoize built plans
  * at most, never corpus-fingerprint-keyed execution results.
  */
object Memo {

  /** Monitor map for [[memoized]]'s single-flight discipline. Grows one
    * Object per distinct live (cache, key); [[releaseMemo]] drops the
    * monitor with its entry. */
  private val memoLocks =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, Object]()

  /** Monitor-map key with IDENTITY semantics for the cache reference:
    * a plain `(cache, key)` tuple would delegate to the
    * ConcurrentHashMap's own content-based hashCode, which CHANGES as
    * entries come and go — a later lookup of the same (cache, key)
    * could then miss the existing monitor (breaking single-flight) and
    * leak a fresh Object per content state. `identityHashCode` is
    * stable for an object's lifetime; equality is reference equality
    * on the cache plus string equality on the key. */
  private final class MemoLockKey(val cache: AnyRef, val key: String) {
    override def hashCode: Int =
      System.identityHashCode(cache) * 31 + key.hashCode
    override def equals(o: Any): Boolean = o match {
      case m: MemoLockKey => (m.cache eq cache) && m.key == key
      case _ => false
    }
  }

  /** True for the never-matching error stamps [[Tables.pathFingerprint]]
    * emits when a listing fails — callers must compute WITHOUT caching
    * (a transient error must not mint a STABLE key two broken vintages
    * could share — VERDICT r10 #2). */
  private[graft] def isErrorFingerprint(fp: String): Boolean =
    fp.startsWith("!")

  /** Fingerprint-validated memo lookup shared by the artifact caches:
    * compute-and-replace when the stored fingerprint differs (evicting
    * the superseded vintage), straight computation with NO cache
    * insert when the fingerprint is an error stamp. `onEvict` sees the
    * superseded value (release persisted state) and `onMiss` runs
    * before compute (invalidate deeper cache layers).
    *
    * Concurrency: single-flight PER KEY via a per-key monitor, never
    * under the ConcurrentHashMap's bin lock — `compute` here can be a
    * multi-minute Spark job (the dedup label build), and running it
    * inside `CHM.compute` would block every unrelated key hashing to
    * the same bin (and violate that method's short-and-simple
    * contract). Two threads asking for the same key serialize (the
    * second reuses the first's result); different keys never contend.
    * The fast path is a lock-free read of a current entry. The monitor
    * map grows one Object per distinct key — the same bounded key set
    * as the cache itself. */
  private[graft] def memoized[V](cache: java.util.concurrent.ConcurrentHashMap[
        String, (String, V)], key: String, fp: String)(compute: => V)(
      onEvict: V => Unit = (_: V) => (), onMiss: () => Unit = () => ()): V = {
    if (isErrorFingerprint(fp)) { onMiss(); return compute }
    val fresh = cache.get(key)
    if (fresh != null && fresh._1 == fp) return fresh._2
    // monitors are scoped per (cache, key): the same path key in two
    // DIFFERENT memo maps (ts-stats vs schema) must not serialize
    memoLocks.computeIfAbsent(new MemoLockKey(cache, key),
        _ => new Object).synchronized {
      val prev = cache.get(key)
      if (prev != null && prev._1 == fp) prev._2
      else {
        // REMOVE before evicting (ADVICE r11): onEvict releases the
        // superseded value's persisted state, so if `compute` then
        // throws, an entry left in place would be evicted-but-present —
        // its old fingerprint still valid-looking while its storage is
        // gone, and a retry would run onEvict on the same value twice
        // (double unpersist). With the entry removed first, a failed
        // recompute leaves a clean miss and the retry sees prev == null.
        if (prev != null) { cache.remove(key); onEvict(prev._2) }
        onMiss()
        val v = compute
        // putIfAbsent, not put (ADVICE r12): a caller that fetched the
        // OLD monitor just before a releaseMemo can compute here
        // concurrently with a post-release caller holding the FRESH
        // monitor — the two computes are serialized by DIFFERENT
        // monitors, so a blind put would overwrite the other thread's
        // value without onEvict and leak its persisted state until JVM
        // exit. If a same-vintage value raced in first, keep IT and
        // release OURS; a different-vintage racer is superseded the
        // normal way (remove + evict + insert ours).
        // The different-vintage supersede must be a CAS remove of the
        // exact value observed, not a blind remove + put: between our
        // putIfAbsent and the remove, a THIRD caller (fresh monitor
        // after another releaseMemo) can itself supersede the racer —
        // a blind remove would then delete the third value without
        // onEvict (leaking its persisted state) and our onEvict(raced)
        // would double-release a value the third caller already
        // evicted. remove(key, raced) evicts only what we saw; on a
        // lost CAS we loop and re-attempt against the current entry.
        // (Same-window racers carry no freshness ordering — both
        // fingerprints were current moments ago; last-insert-wins
        // matches the non-raced supersede semantics, and the next
        // caller with a current fingerprint re-converges.)
        val mine = (fp, v)
        var out = v
        var settled = false
        while (!settled) {
          val raced = cache.putIfAbsent(key, mine)
          if (raced == null) settled = true
          else if (raced._1 == fp) { onEvict(v); out = raced._2; settled = true }
          else if (cache.remove(key, raced)) onEvict(raced._2)
        }
        out
      }
    }
  }

  /** Release a memo entry AND its monitor (VERDICT r11 #6): the cache
    * entry is removed and returned (caller unpersists any held state),
    * and the matching [[memoLocks]] monitor is dropped with it — taken
    * first, so an in-flight compute for the same key finishes before
    * the release, and removed while held (safe: computeIfAbsent hands
    * later callers a FRESH monitor). The monitor map thereafter holds
    * nothing for a released (cache, key), restoring O(live entries)
    * instead of O(all keys ever seen). Benign race: a caller that
    * fetched the old monitor just before this release re-creates one
    * and may recompute alongside a post-release caller — duplicate
    * work once, never a stale or double-released value. */
  private[graft] def releaseMemo[V](cache: java.util.concurrent.ConcurrentHashMap[
      String, (String, V)], key: String): Option[V] = {
    val lk = new MemoLockKey(cache, key)
    val monitor = memoLocks.get(lk)
    if (monitor == null) Option(cache.remove(key)).map(_._2)
    else monitor.synchronized {
      memoLocks.remove(lk)
      Option(cache.remove(key)).map(_._2)
    }
  }

  /** Test-only visibility: whether a monitor is currently held in the
    * lock map for (cache, key) — TablesSpec pins that [[releaseMemo]]
    * drops it. */
  private[graft] def memoLockExists(cache: AnyRef, key: String): Boolean =
    memoLocks.containsKey(new MemoLockKey(cache, key))

  /** Bounded race-benign get-or-build for BUILT FRAMES: values must be
    * pure functions of the key with no external state to release, so a
    * racing duplicate build is harmless (last put wins, both values
    * correct) and eviction is a wholesale clear past `bound` — the
    * Butterfly built-frame discipline, shared so the next operator's
    * plan memo doesn't re-derive it. The caller owns the map (its
    * lifecycle hooks may drop entries selectively, e.g. releaseCaches'
    * per-graph removeIf).
    *
    * Bound semantics are RACY-CLEAR by design (ADVICE r14): the
    * size-check + clear + put sequence is not atomic, so concurrent
    * builders may clear each other's just-inserted entries (spurious
    * eviction → a redundant rebuild on the next call) and the map can
    * transiently exceed `bound` by the number of racing builders.
    * Both are benign for the documented pure-value tier — every
    * served value is correct, the bound is a memory backstop, not an
    * invariant. A future caller that needs a FIRM bound or eviction
    * hooks must not use this tier: use [[memoized]] (per-key
    * monitors, onEvict) instead. */
  private[graft] def getOrBuild[K, V](
      cache: java.util.concurrent.ConcurrentHashMap[K, V], key: K,
      bound: Int = 128)(mk: => V): V = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val v = mk
      if (cache.size >= bound) cache.clear()
      cache.put(key, v)
      v
    }
  }
}
