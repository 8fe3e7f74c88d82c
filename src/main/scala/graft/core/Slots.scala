package graft.core

/**
 * Redis-cluster-compatible slot hashing.
 *
 * The reference engine places every record by
 * `CRC16(hashtag(key)) mod 16384` (reference: src/cluster.c:1820-1843,
 * table src/crc16.c, NUMBER_OF_SLOTS=16384 at src/cluster.c:34). A
 * curly-brace hash-tag `{tag}` hashes only the tagged substring
 * (src/cluster.c:1829-1838) so callers can force co-location.
 *
 * This is the CCITT CRC16 polynomial (0x1021), a published algorithm
 * (Redis cluster spec, appendix A). We reimplement it from the public
 * spec; the table below is generated at class-init from the polynomial
 * rather than pasted.
 *
 * In the Spark engine this function is the partitioning key for
 * `reshuffle` (see [[graft.pipeline.ExecutionBuilder]]): records with
 * the same slot land in the same Spark partition, which reproduces the
 * reference's co-location semantics while letting Spark's shuffle do
 * the data motion.
 */
object Slots {
  final val NumSlots = 16384

  private val table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var crc = i << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xffff else (crc << 1) & 0xffff
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  /** The 256-entry CRC16 table (for oracle-SQL generation / inspection). */
  def crcTable: Array[Int] = table.clone()

  /** CRC16-CCITT over raw bytes (Redis `crc16`). */
  def crc16(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc = ((crc << 8) & 0xffff) ^ table(((crc >> 8) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  def crc16(s: String): Int = crc16(s.getBytes("UTF-8"))

  /**
   * Extract the effective hash key: the substring inside the first
   * non-empty `{...}` pair, else the whole key
   * (reference: src/cluster.c:1820-1843).
   */
  def hashTag(key: String): String = {
    val open = key.indexOf('{')
    if (open < 0) return key
    val close = key.indexOf('}', open + 1)
    if (close < 0 || close == open + 1) key
    else key.substring(open + 1, close)
  }

  /** Redis slot of a key: CRC16 of its hash-tag, mod 16384. */
  def slot(key: String): Int = crc16(hashTag(key)) & (NumSlots - 1)
}
