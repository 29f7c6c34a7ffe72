package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations behind the native sketch expressions
  * ([[MinHashSig]], [[SimHash64]]). Each function is bit-identical to the
  * relational formulation it replaces in graft.ops.Dedup (same
  * normalization, same xxhash64 seed 42, same Carter-Wegman family seeded
  * with 0x5eed) — OpsSpec cross-checks the equivalence.
  */
object TextSketches {

  val MersennePrime: Long = 2147483647L // 2^31 - 1

  /** Hash-family seeds; MUST stay in sync with Dedup.minhashSignatures. */
  def minhashSeeds(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5eed)
    val a = Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1))
    val b = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private[functions] def seeds(numHashes: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(numHashes, minhashSeeds(_))

  /** regexp_replace(lower(s), "\s+", " ") — identical to the Spark exprs
    * (UTF8String lowercase, java-regex whitespace collapse), as UTF-8
    * bytes. */
  private def cleanBytes(s: UTF8String): Array[Byte] =
    UTF8String.fromString(
      s.toLowerCase.toString.replaceAll("\\s+", " ")).getBytes

  /** Byte offset of each code-point start, plus the terminal length — lets
    * char-indexed shingles hash byte slices directly (substr() in the
    * relational form is code-point indexed). */
  private def charOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(n) = i; n += 1 }
      i += 1
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  /** MinHash signature of one document: shingle → xxhash64 & 0x7FFFFFFF →
    * min over each (a·h + b) mod p. One pass, no intermediate rows. */
  def minhash(s: UTF8String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val (a, b) = seeds(numHashes)
    val bytes = cleanBytes(s)
    val offs = charOffsets(bytes)
    val numChars = offs.length - 1
    val count = math.max(numChars - shingleSize + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + shingleSize, numChars))
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L) & 0x7FFFFFFFL
      var j = 0
      while (j < numHashes) {
        val v = (a(j) * h + b(j)) % MersennePrime // operands ≤ 2^31 → no overflow
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /** All character-n-gram xxhash64 values of one document, position order,
    * duplicates kept — the raw (id, shingle-hash) stream behind
    * `Dedup.shinglePairs` (x25/x67) as ONE pass. Bit-identical to
    * `xxhash64(substr(clean, i, n))` over
    * `i ∈ 1..greatest(len-n+1, 1)` (OpsSpec-pinned): same normalization,
    * same seed-42 hash of the same code-point slice, same short-text
    * clamp (one whole-string shingle). The relational form exploded a
    * position sequence FIRST, so every shingle row carried the full
    * cleaned document through the Generate before hashing — ~doc-length×
    * row-width amplification that this array expression never
    * materializes (the explode downstream carries bare longs). */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = cleanBytes(s)
    val offs = charOffsets(bytes)
    val numChars = offs.length - 1
    val count = math.max(numChars - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + n, numChars))
      out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L)
      i += 1
    }
    out
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash all
    * k-gram shingles (same normalization + xxhash64 as [[minhash]]), then
    * keep the minimum hash of every sliding window of `w` consecutive
    * k-grams (rightmost min on ties), deduplicated and sorted. Guarantees
    * any shared run of ≥ w+k-1 chars between two documents shares a
    * fingerprint hash — the standard rolling-hash document fingerprint for
    * near-dup and plagiarism detection at corpus scale. */
  def winnow(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = cleanBytes(s)
    val offs = charOffsets(bytes)
    val numChars = offs.length - 1
    val count = math.max(numChars - k + 1, 1)
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + k, numChars))
      hashes(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L)
      i += 1
    }
    val picked = new java.util.TreeSet[java.lang.Long]()
    val windows = math.max(count - w + 1, 1)
    var wi = 0
    while (wi < windows) {
      var best = Long.MaxValue
      var j = wi
      val lim = math.min(wi + w, count)
      while (j < lim) { // rightmost minimum: strict > keeps later index on tie
        if (hashes(j) <= best) best = hashes(j)
        j += 1
      }
      picked.add(best)
      wi += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** 64-bit SimHash of one document: whitespace tokens of lower(trim(s)),
    * per-bit ±1 votes of each token's xxhash64. Matches
    * split(lower(trim(s)), "\s+") semantics (limit -1 keeps empties). */
  def simhash(s: UTF8String): Long = {
    val toks = ws.split(s.trim().toLowerCase.toString, -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tb = UTF8String.fromString(toks(t)).getBytes
      val h = XXH64.hashUnsafeBytes(tb, Platform.BYTE_ARRAY_OFFSET, tb.length, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** xxhash64 of every n-token sliding window ("tok1 tok2 … tokn"
    * space-joined), position order, duplicates kept — the gram fingerprint
    * stream behind `Dedup.dupSpans` (x59) as one pass. Tokenization is the
    * [[wordGramBuckets]] law (whitespace tokens of lower(trim(s)), empties
    * dropped); docs with fewer than n tokens yield an empty array.
    * Replaces a per-gram md5(concat_ws(slice(toks, i, n))) HOF chain —
    * the hash only keys within-engine group-bys (the oracle recomputes
    * its own md5 stream in SQL and compares final COUNTS, which any
    * injective per-gram hash reproduces), so the 4×-narrower, codegen'd
    * xxhash64 long is strictly better at every scale. */
  def wordNGramHashes(s: UTF8String, n: Int): Array[Long] = {
    val toks0 = ws.split(s.trim().toLowerCase.toString, -1)
    var cnt = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) cnt += 1; i += 1 }
    val toks = if (cnt == toks0.length) toks0 else {
      val t = new Array[String](cnt); var o = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { t(o) = toks0(i); o += 1 }; i += 1 }
      t
    }
    if (cnt < n) return Array.emptyLongArray
    val out = new Array[Long](cnt - n + 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= cnt - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val gb = UTF8String.fromString(sb.toString).getBytes
      out(i) = XXH64.hashUnsafeBytes(gb, Platform.BYTE_ARRAY_OFFSET, gb.length, 42L)
      i += 1
    }
    out
  }

  /** Jaro-Winkler similarity of two strings — the record-linkage /
    * typo-detection string metric (Winkler 1990). Conventions pinned
    * empirically against DuckDB's `jaro_winkler_similarity` so the
    * relational oracle replays this expression exactly:
    * either side empty → 0.0 (INCLUDING both-empty); match window
    * `max(|a|,|b|)/2 - 1` (floor, min 0); transpositions = half the
    * out-of-order matched pairs (floor); Winkler prefix boost
    * `jw = j + l·0.1·(1−j)` with `l` = common prefix capped at 4, applied
    * only when `jaro > 0.7`. Code-point (not byte) indexed, so multibyte
    * text compares correctly. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val n1 = s1.codePointCount(0, s1.length)
    val n2 = s2.codePointCount(0, s2.length)
    if (n1 == 0 || n2 == 0) return 0.0
    // code-point arrays: positional window logic is code-point indexed
    val c1 = s1.codePoints.toArray
    val c2 = s2.codePoints.toArray
    val md = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - md)
      val hi = math.min(n2, i + md + 1)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!m2(j) && c2(j) == c1(i)) { m1(i) = true; m2(j) = true; m += 1; hit = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (c1(i) != c2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val j = (m.toDouble / n1 + m.toDouble / n2 + (m - half).toDouble / m) / 3.0
    if (j <= 0.7) return j
    var l = 0
    while (l < 4 && l < n1 && l < n2 && c1(l) == c2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Hashed uni+bigram bucket ids of one document — the DSIR feature law
    * (`TextOps.dsirWeights` hash="xxhash64") as ONE pass: whitespace
    * tokens of lower(trim(s)), then `pmod(xxhash64(gram), nBuckets)` for
    * every token and every adjacent "tok1 tok2" pair, unigrams first (the
    * relational `concat(toks, bigrams)` order, so explode row counts
    * match). Bucket math is bit-identical to
    * `pmod(F.xxhash64(gram), nBuckets)` — seed 42 over the gram's UTF-8
    * bytes — pinned in OpsSpec against the HOF formulation. Replaces a
    * split + 2×transform + slice + element_at + concat HOF chain whose
    * interpreted per-element lambdas measured ~30 µs/gram; this loop is
    * the map-side cost that dominates DSIR at 100 TB. */
  def wordGramBuckets(s: UTF8String, nBuckets: Int): Array[Int] = {
    val toks0 = ws.split(s.trim().toLowerCase.toString, -1)
    // drop empties (split keeps a leading "" when text starts with space)
    var n = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) n += 1; i += 1 }
    val toks = if (n == toks0.length) toks0 else {
      val t = new Array[String](n); var o = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { t(o) = toks0(i); o += 1 }; i += 1 }
      t
    }
    val out = new Array[Int](if (n > 0) n + n - 1 else 0)
    def bucket(g: String): Int = {
      val gb = UTF8String.fromString(g).getBytes
      val h = XXH64.hashUnsafeBytes(gb, Platform.BYTE_ARRAY_OFFSET, gb.length, 42L)
      val m = (h % nBuckets).toInt
      if (m < 0) m + nBuckets else m
    }
    i = 0
    while (i < n) { out(i) = bucket(toks(i)); i += 1 }
    i = 0
    while (i < n - 1) { out(n + i) = bucket(toks(i) + " " + toks(i + 1)); i += 1 }
    out
  }

  /** One raw-DEFLATE compressor per executor thread: Deflater is
    * stateful native code (not thread-safe, ~µs to construct), so a
    * ThreadLocal + reset() amortizes it across the scan task's rows.
    * Level 6 (zlib default) pinned explicitly; nowrap=true drops the
    * 2-byte zlib header + 4-byte checksum so tiny inputs aren't
    * dominated by framing. Executor threads are a bounded pool, so the
    * unreleased native handles are bounded too. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** Raw-DEFLATE output length of the string's UTF-8 bytes — the
    * model-free LONG-RANGE repetition signal (LZ77's 32 KB window sees
    * repeated paragraphs and boilerplate blocks that per-char entropy
    * (charEntropy) and n-gram ratios are blind to; conversely
    * near-random text deflates to ≥ its raw size plus stored-block
    * framing). Deterministic for a given JDK build (Deflater is the
    * JDK's bundled zlib with a pinned level/strategy); output LENGTH is
    * stable in practice but not contractually bit-stable across zlib
    * versions, so entries built on it gate rows-only with the census
    * plumbing pinned by a replayable-surrogate twin (the x430/x431
    * convention) and the codec itself pinned by OpsSpec replay. */
  def deflateLen(s: UTF8String): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
