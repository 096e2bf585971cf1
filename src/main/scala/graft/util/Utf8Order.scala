package graft.util

/** String ordering by UTF-8 byte sequence (unsigned) — Spark's binary
  * string collation. A driver-side local route that must tie-break
  * identically to a distributed `orderBy(asc(stringCol))` compares with
  * THIS, not the JVM's default UTF-16 code-unit ordering: the two orders
  * differ whenever characters at/above U+E000 (UTF-8 lead byte 0xEE+,
  * code units >= 0xE000) mix with supplementary-plane characters (UTF-8
  * lead byte 0xF0, lead surrogate code units ~0xD800-0xDBFF).
  */
object Utf8Order extends Ordering[String] {
  override def compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}
