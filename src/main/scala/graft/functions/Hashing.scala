package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing shared by the engine and the DuckDB
  * oracle.
  *
  * The correctness gate re-executes every hash-based operator (dedup
  * fingerprints, MinHash, SimHash) in DuckDB, so hashes must be
  * reproducible from ANSI-ish SQL in both engines. Engine-native hashes
  * (Spark xxhash64 / murmur3 vs DuckDB `hash()`) differ, so we derive
  * integer hashes from SHA-256 hex prefixes — identical everywhere, and
  * still cheap (one sha2 per value, whole-stage codegen'd).
  *
  * Spark:  conv(substr(sha2(s,256), 1, n), 16, 10)::bigint
  * DuckDB: ('0x' || substr(sha256(s), 1, n))::bigint
  */
object Hashing {

  /** 28-bit hash (7 hex chars): small enough that (a*h+b) stays inside
    * int64 for multipliers a < 2^31. Native [[ShaPrefixLong]] — value-
    * identical to `conv(substr(sha2(s,256),1,7),16,10)` (spec-pinned)
    * without the per-call digest allocation + hex round-trip. */
  def sha28(c: Column): Column = ShaPrefixLong(c.cast("string"), 7)

  /** 60-bit hash (15 hex chars) for low-collision fingerprints. */
  def sha60(c: Column): Column = ShaPrefixLong(c.cast("string"), 15)

  /** Fused `transform(Dedup.shingles(text, k), s => sha28(s))` — the
    * dedup family's hot kernel as ONE native pass ([[HashedShingles]]),
    * value-identical and spec-pinned against the composable form. */
  def hashedShingles(text: Column, k: Int): Column = HashedShingles(text, k)

  /** 60-bit variant of [[hashedShingles]] — the fused kernel at
    * `hexChars = 15`. Dedup keys that CUT or WEIGHT text (the
    * ExactSubstr family) must use this one: window count equals corpus
    * token count, so the 28-bit space saturates around 10^7–10^8
    * windows and colliding non-duplicate windows would be cut as
    * duplicates, with no downstream exact-verify stage to drop them
    * (the chunk-dedup convention — `chunk_sha` there is the full
    * SHA-256 for the same reason). */
  def hashedShingles60(text: Column, k: Int): Column =
    HashedShingles(text, k, 15)

  /** DuckDB SQL fragments computing the same hashes. */
  def sha28Sql(expr: String): String =
    s"CAST(('0x' || substr(sha256($expr), 1, 7)) AS BIGINT)"
  def sha60Sql(expr: String): String =
    s"CAST(('0x' || substr(sha256($expr), 1, 15)) AS BIGINT)"

  /** Mersenne prime 2^31-1; universal-hash modulus for MinHash. */
  val P: Long = 2147483647L

  /** `x % P` for `0 <= x < 2^62` without the 64-bit hardware division —
    * P is Mersenne (2^31 ≡ 1 mod P), so folding the high bits onto the
    * low bits preserves the residue: after `y = (x & P) + (x >>> 31)`,
    * `y < 2^32`; one more fold gives `y < 2^31 + 1 < 2P`, and a single
    * conditional subtraction lands in `[0, P)`. Exact over the whole
    * domain (spec-pinned against `%`). The minhash/rolling-hash inner
    * loops run this once per (element x seed): a dependent 64-bit `%`
    * costs ~20-40 cycles of divider latency per term, the fold ~5 simple
    * ALU ops — measured 2.0-2.7x on the 128-seed minhash fold even with
    * a JIT-constant divisor (the best case for `%`). */
  @inline def modP(x: Long): Long = {
    var y = (x & P) + (x >>> 31)
    y = (y & P) + (y >>> 31)
    if (y >= P) y - P else y
  }

  /** Deterministic MinHash seed pairs (a, b), a odd, derived from small
    * fixed constants so both engines can embed them as literals. */
  def minhashSeeds(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 1001L, 7919L * i + 17L))
}
