package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Tight-loop kernels for BINARY-payload sketches — the media siblings of
  * [[TextSketches]]. Same tier-(b) rationale: a per-row one-pass loop
  * replaces any relational formulation, which for multi-megabyte media
  * payloads is not merely slower but structurally wrong — exploding chunk
  * positions would copy the payload into every generated row
  * (Tungsten rows store binary inline), turning a 10 MB video into
  * gigabytes of Generate output before the first hash.
  *
  * Chunking is CONTENT-DEFINED (gear rolling hash, the FastCDC/LBFS
  * family: Xia et al., USENIX ATC'16; Muthitacharoen et al., SOSP'01):
  * a chunk boundary falls where the rolling hash of the byte stream hits
  * a mask, so boundaries are determined by local CONTENT, not position.
  * An insertion/deletion re-chunks only the neighborhood it touches and
  * every downstream chunk re-aligns — the property fixed-width chunking
  * lacks (one shifted byte re-windows the whole tail, and a prepended
  * header would zero the chunk overlap of two otherwise-identical
  * payloads). Re-hosted media with prepended/appended metadata, truncated
  * downloads, and small binary patches all keep most chunk hashes.
  *
  * Determinism: the gear table is a fixed seeded PRNG expansion, chunk
  * hashes are xxhash64 seed 42 over exact byte ranges, and the MinHash
  * family is [[TextSketches.minhashSeeds]] — bit-stable across JVMs,
  * sessions, and partitionings.
  */
object ByteSketches {

  /** Gear table: 256 pseudo-random longs, fixed seed — one per byte
    * value; the rolling state is `h = (h << 1) + gear(b)`, so each byte
    * influences the boundary decision for the next ~64 positions. */
  private val gear: Array[Long] = {
    val rnd = new scala.util.Random(0xb17e5)
    Array.fill(256)(rnd.nextLong())
  }

  /** xxhash64 (seed 42) of each content-defined chunk, position order,
    * duplicates kept. Boundary rule: after at least `minLen` bytes, a
    * position where `(h & mask) == 0` (mask = 2^avgBits − 1 ⇒ expected
    * chunk ≈ 2^avgBits bytes) ends the chunk; `maxLen` force-splits
    * pathological streams (e.g. constant bytes, whose rolling hash can
    * stay off-mask forever); the final partial chunk always emits.
    * Empty payloads emit one hash of the empty range, so every item has
    * a non-empty sketch (mirrors the one-shingle clamp of
    * [[TextSketches.minhash]]).
    */
  def chunkHashes(bytes: Array[Byte], avgBits: Int, minLen: Int,
                  maxLen: Int): Array[Long] = {
    val n = bytes.length
    if (n == 0)
      return Array(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, 0, 42L))
    val mask = (1L << avgBits) - 1L
    val out = new java.util.ArrayList[Long](n / (1 << avgBits) + 2)
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1) {
        out.add(XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + start, len, 42L))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  /** MinHash signature over the content-defined chunk set: chunk hash →
    * low 31 bits → min over each Carter-Wegman (a·h + b) mod p — the
    * exact signature math of [[TextSketches.minhash]] with byte chunks
    * in place of character shingles, so banding thresholds and
    * est-Jaccard semantics carry over unchanged. One pass, no
    * intermediate rows. */
  def chunkMinhash(bytes: Array[Byte], avgBits: Int, minLen: Int,
                   maxLen: Int, numHashes: Int): Array[Long] = {
    val (a, b) = TextSketches.seeds(numHashes)
    val hs = chunkHashes(bytes, avgBits, minLen, maxLen)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i) & 0x7FFFFFFFL
      var j = 0
      while (j < numHashes) {
        val v = (a(j) * h + b(j)) % TextSketches.MersennePrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }
}
