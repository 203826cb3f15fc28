package graft.functions

/**
 * XXH64 from the public specification (xxhash.com, Yann Collet), plus the
 * type-widening rules Spark's `xxhash64` applies (strings hash their UTF-8
 * bytes; ints hash as a 4-byte block; longs as an 8-byte block; multi-arg
 * calls chain: the previous hash becomes the next argument's seed; default
 * seed 42). Written for the sequential oracle twins and property-tested
 * against Spark's own `xxhash64` column in GoldenTwinSpec — so the twins'
 * hashing is independent code verified equivalent, not shared code.
 */
object Xxh64 {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  val SparkSeed = 42L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)
  @inline private def round(acc: Long, input: Long): Long = rotl(acc + input * P2, 31) * P1
  @inline private def mergeRound(h: Long, v: Long): Long = (h ^ round(0L, v)) * P1 + P4

  @inline private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def hashBytes(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var i = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2); h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else h = seed + P5
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLong(data, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(data, i) & 0xffffffffL) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xffL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    fmix(h)
  }

  /** 4-byte block (Spark hashes IntegerType like this). */
  def hashInt(input: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (input & 0xffffffffL) * P1
    h = rotl(h, 23) * P2 + P3
    fmix(h)
  }

  /** 8-byte block (Spark hashes LongType like this). */
  def hashLong(input: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= round(0L, input)
    h = rotl(h, 27) * P1 + P4
    fmix(h)
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Spark's `xxhash64(a, b, ...)`: left-to-right chaining from seed 42. */
  def sparkChain(args: Seq[Any]): Long =
    args.foldLeft(SparkSeed) {
      case (seed, i: Int)    => hashInt(i, seed)
      case (seed, l: Long)   => hashLong(l, seed)
      case (seed, s: String) => hashString(s, seed)
      case (_, other) => throw new IllegalArgumentException(s"unsupported: ${other.getClass}")
    }
}
