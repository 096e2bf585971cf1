package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

import java.io.{EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, InflaterInputStream}

/** Ranged-read zip planning over any Hadoop filesystem — the engine-native
  * twin of the reference's EOCD-over-ranged-GET listing (`raw_sync/app.py:
  * 237-306` parses the end-of-central-directory tail; `:308-436` lists
  * members from it without downloading archives).
  *
  * Planning cost per archive is 2-3 positioned reads regardless of archive
  * size: one tail read (EOCD + max comment), one optional zip64-EOCD read,
  * one central-directory read. Member bytes are then streamed with a seek to
  * the member's local header — so a 100 GB archive on s3a is planned from
  * ~65 KB of tail bytes and read member-by-member with bounded task memory,
  * the exact property `java.util.zip.ZipFile` (local-path mmap) cannot give.
  *
  * Format per the public PKWARE APPNOTE: little-endian records
  * `PK\x05\x06` EOCD, `PK\x06\x07` zip64 locator, `PK\x06\x06` zip64 EOCD,
  * `PK\x01\x02` central entry, `PK\x03\x04` local header; 0xFFFF/0xFFFFFFFF
  * field sentinels defer to the zip64 extra field (id 0x0001).
  */
object ZipCentralDirectory {

  /** One member as planned from the central directory. `method` is the zip
    * compression method (0 = stored, 8 = deflate).
    */
  final case class Entry(name: String, method: Int, compressedSize: Long,
                         uncompressedSize: Long, localHeaderOffset: Long,
                         flags: Int = 0)

  private val EocdSig = 0x06054b50
  private val Zip64LocatorSig = 0x07064b50
  private val Zip64EocdSig = 0x06064b50
  private val CenSig = 0x02014b50
  private val LocSig = 0x04034b50

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def s32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def u32(b: Array[Byte], i: Int): Long = s32(b, i) & 0xffffffffL
  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

  /** List an archive's members from its central directory only. */
  def list(fs: FileSystem, path: Path): Seq[Entry] = {
    val len = fs.getFileStatus(path).getLen
    require(len >= 22, s"$path is too small to be a zip ($len bytes)")
    val in = fs.open(path)
    try listFrom(in, len, path.toString) finally in.close()
  }

  private def listFrom(in: FSDataInputStream, len: Long, where: String): Seq[Entry] = {
    // 1. tail read: EOCD (22 B) + max comment (65535 B) + zip64 locator (20 B)
    val tailLen = math.min(len, 22L + 65535L + 20L).toInt
    val tail = new Array[Byte](tailLen)
    in.readFully(len - tailLen, tail)

    // a candidate EOCD must also have a comment length that reaches exactly
    // to end-of-file — otherwise PK\x05\x06 bytes INSIDE an archive comment
    // would be misparsed (java.util.zip.ZipFile applies the same check)
    var i = tailLen - 22
    while (i >= 0 && !(s32(tail, i) == EocdSig && u16(tail, i + 20) == tailLen - i - 22))
      i -= 1
    if (i < 0) throw new java.util.zip.ZipException(s"no EOCD record in $where — not a zip archive?")

    // spanned/multi-disk archives (PKZIP floppy spanning) would make every
    // member offset below relative to a volume we can't see — reject loudly
    // instead of failing later with a confusing 'bad local header'
    if (u16(tail, i + 4) != 0 || u16(tail, i + 6) != 0)
      throw new java.util.zip.ZipException(
        s"$where is a spanned (multi-disk) archive — unsupported")

    var cdCount: Long = u16(tail, i + 10).toLong
    var cdSize: Long = u32(tail, i + 12)
    var cdOffset: Long = u32(tail, i + 16)

    // 2. zip64: locator sits exactly 20 bytes before the EOCD when present
    if (i >= 20 && s32(tail, i - 20) == Zip64LocatorSig) {
      val z64Off = u64(tail, i - 20 + 8)
      val buf = new Array[Byte](56)
      in.readFully(z64Off, buf)
      if (s32(buf, 0) != Zip64EocdSig)
        throw new java.util.zip.ZipException(s"bad zip64 EOCD signature in $where")
      if (u32(buf, 16) != 0L || u32(buf, 20) != 0L)
        throw new java.util.zip.ZipException(
          s"$where is a spanned (multi-disk) zip64 archive — unsupported")
      cdCount = u64(buf, 32)
      cdSize = u64(buf, 40)
      cdOffset = u64(buf, 48)
    } else if (cdCount == 0xffffL || cdSize == 0xffffffffL || cdOffset == 0xffffffffL) {
      throw new java.util.zip.ZipException(
        s"zip64 field sentinels without a zip64 locator in $where")
    }
    require(cdSize <= Int.MaxValue.toLong,
      s"central directory of $where is ${cdSize} bytes; >2GB directories unsupported")

    // 3. one ranged read of the whole central directory, then in-memory parse
    val cd = new Array[Byte](cdSize.toInt)
    in.readFully(cdOffset, cd)

    val out = Vector.newBuilder[Entry]
    var p = 0
    var n = 0L
    while (n < cdCount) {
      if (p + 46 > cd.length || s32(cd, p) != CenSig)
        throw new java.util.zip.ZipException(
          s"bad central-directory entry at +$p in $where")
      val flags = u16(cd, p + 8)
      val method = u16(cd, p + 10)
      var csize = u32(cd, p + 20)
      var usize = u32(cd, p + 24)
      val nameLen = u16(cd, p + 28)
      val extraLen = u16(cd, p + 30)
      val commentLen = u16(cd, p + 32)
      var lho = u32(cd, p + 42)
      val name = new String(cd, p + 46, nameLen, StandardCharsets.UTF_8)

      // zip64 extra field overrides, in spec order: usize, csize, lho —
      // reads bounded by the FIELD's own end, not the whole extra block:
      // a short zip64 field followed by another extra field would
      // otherwise fill csize/lho from the neighbor's header bytes
      var q = p + 46 + nameLen
      val extraEnd = q + extraLen
      while (q + 4 <= extraEnd) {
        val id = u16(cd, q); val sz = u16(cd, q + 2)
        val fieldEnd = math.min(extraEnd, q + 4 + sz)
        if (id == 0x0001) {
          var r = q + 4
          if (usize == 0xffffffffL && r + 8 <= fieldEnd) { usize = u64(cd, r); r += 8 }
          if (csize == 0xffffffffL && r + 8 <= fieldEnd) { csize = u64(cd, r); r += 8 }
          if (lho == 0xffffffffL && r + 8 <= fieldEnd) { lho = u64(cd, r) }
        }
        q += 4 + sz
      }
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL)
        throw new java.util.zip.ZipException(
          s"member $name in $where carries zip64 sentinels its zip64 extra " +
            "field does not resolve")
      out += Entry(name, method, csize, usize, lho, flags)
      p += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    out.result()
  }

  /** Open one member for streaming: seek past its local header, bound the
    * read at the compressed size, inflate if deflated. The returned stream's
    * `close()` does NOT close `in` — the caller owns the archive handle and
    * reuses it across members.
    */
  def openMember(in: FSDataInputStream, e: Entry): InputStream = {
    // fail LOUDLY on encryption (general-purpose flag bit 0): the bounded
    // raw stream would otherwise emit the 12-byte crypt header plus
    // ciphertext as data rows — java.util.zip.ZipFile errors on these, and
    // the two ingest paths must agree
    if ((e.flags & 1) != 0)
      throw new java.util.zip.ZipException(
        s"member ${e.name} is encrypted (GP flag bit 0) — unsupported")
    val hdr = new Array[Byte](30)
    in.readFully(e.localHeaderOffset, hdr)
    if (s32(hdr, 0) != LocSig)
      throw new java.util.zip.ZipException(
        s"bad local header for ${e.name} at ${e.localHeaderOffset}")
    val dataStart = e.localHeaderOffset + 30 + u16(hdr, 26) + u16(hdr, 28)
    in.seek(dataStart)
    val bounded = new BoundedInputStream(in, e.compressedSize)
    e.method match {
      case 0 => bounded
      case 8 =>
        // InflaterInputStream only ends a DEFAULT-constructed inflater on
        // close; an explicitly-passed one must be ended by us, or every
        // member leaks ~32-64 KB of native zlib memory until finalization —
        // fatal over thousands of members on a rarely-GCing executor
        val inf = new Inflater(true)
        new InflaterInputStream(bounded, inf, 64 * 1024) {
          private var ended = false
          override def close(): Unit = {
            if (!ended) { ended = true; inf.end() }
            super.close()
          }
        }
      case m => throw new UnsupportedOperationException(
        s"zip compression method $m for ${e.name} (only stored/deflate)")
    }
  }

  /** Reads at most `limit` bytes from `in`; `close()` is a no-op so the
    * shared archive stream survives member handoff.
    */
  private final class BoundedInputStream(in: InputStream, limit: Long)
    extends InputStream {
    private var remaining = limit

    override def read(): Int =
      if (remaining <= 0) -1
      else {
        val b = in.read()
        if (b >= 0) remaining -= 1
        else throw new EOFException("archive truncated mid-member")
        b
      }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (remaining <= 0) -1
      else {
        val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
        if (n < 0) throw new EOFException("archive truncated mid-member")
        remaining -= n
        n
      }

    override def available(): Int = math.min(remaining, Int.MaxValue.toLong).toInt
    override def close(): Unit = () // caller owns the archive handle
  }
}
