package graft.functions

/** Shared byte-level primitives of the engine-portable sketch family
  * ([[WordShingles]], [[Md5SimHash60]], [[Md5Winnow]], [[Md5MinHash]]).
  * Two contracts live here so they exist in exactly ONE place:
  *
  *  - the ASCII-whitespace set — the load-bearing parity twin of the
  *    DuckDB oracles' `\s` regex class (space, \t, \n, \x0B, \f, \r);
  *    a divergence between two hand-maintained copies would silently
  *    break cross-sketch tokenization consistency;
  *  - the md5 first-8-hex-chars (32-bit) prefix — the repo's
  *    engine-portable hash primitive
  *    (`('0x' || substr(md5(x), 1, 8))::BIGINT` in DuckDB).
  */
private[functions] object PortableBytes {

  /** Java-regex `\s` membership for ASCII bytes. Multi-byte UTF-8
    * sequences always have the high bit set, so scanning raw bytes
    * with this predicate never splits inside a code point.
    */
  def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Visit every whitespace-separated token as a byte range
    * `[start, end)`. One pass, no allocation.
    */
  def foreachToken(bytes: Array[Byte])(f: (Int, Int) => Unit): Unit = {
    val len = bytes.length
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        f(start, i)
      }
    }
  }

  /** First 32 bits of md5 over a byte slice, as a non-negative long —
    * the value of the digest's first 8 lowercase-hex characters.
    */
  def md5Prefix32(md: java.security.MessageDigest, bytes: Array[Byte],
      off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }
}
