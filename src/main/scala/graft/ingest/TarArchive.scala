package graft.ingest

import java.io.{DataInputStream, InputStream}

/** Minimal POSIX-ustar reader for archive ingest (SURVEY §2a S3: the
  * reference gunzips `.op.gz` members out of yearly `.tar` files,
  * untitled.py:65-76).
  *
  * Tar is NOT splittable, so the unit of parallelism is the ARCHIVE: one
  * Spark task consumes one tar stream end-to-end (binaryFiles), which is
  * the right grain for GSOD's year-sized archives — thousands of archives
  * fan out across executors even though each is sequential inside. Only
  * regular-file members are returned; payloads materialize one member at
  * a time (≈25 KB for GSOD), never the whole archive.
  */
object TarArchive {

  private final val BlockSize = 512

  /** (memberName, payload) for each regular-file member, in stream order.
    * The caller owns closing `in` after exhausting the iterator. */
  def members(in: InputStream): Iterator[(String, Array[Byte])] = {
    val din = new DataInputStream(in)
    new Iterator[(String, Array[Byte])] {
      private var nextMember: (String, Array[Byte]) = null
      private var finished = false

      /** Octal numeric field. Refuses what it cannot represent rather than
        * guessing: GNU base-256 encoding (first byte 0x80, used for
        * members ≥ 8 GiB) and fields with no octal digits at all (a
        * corrupt size would otherwise parse small and silently desync
        * every subsequent header). */
      private def parseOctal(bytes: Array[Byte], off: Int, len: Int): Long = {
        if ((bytes(off) & 0x80) != 0)
          throw new java.io.IOException(
            "tar header uses GNU base-256 numeric encoding (member >= 8 GiB) — unsupported")
        var v = 0L
        var seen = false
        var i = off
        val end = off + len
        while (i < end) {
          val c = bytes(i)
          if (c >= '0' && c <= '7') { v = (v << 3) + (c - '0'); seen = true }
          else if (c != ' ' && c != 0)
            throw new java.io.IOException(
              s"corrupt tar numeric field (byte 0x${(c & 0xFF).toHexString} at offset ${i - off})")
          i += 1
        }
        // a fully blank field (spaces/NULs only) conventionally means 0
        // in old writers; only digit-free fields WITH other bytes are
        // rejected above
        if (!seen) 0L else v
      }

      // GNU 'L' extension: a pseudo-member whose payload is the FULL name
      // of the member that follows (names > 100 chars). Silently using
      // the truncated header name instead would break suffix filters
      // (".op.gz" cut off) — honor it.
      private var pendingLongName: String = null

      /** Member name from the header: NUL-terminated name field, plus the
        * POSIX-ustar prefix field (names > 100 chars split path across
        * prefix/name). The prefix region (offset 345) is ONLY meaningful
        * for true POSIX ustar — magic "ustar\0" + version "00"; old-GNU
        * format (magic "ustar  ") reuses those bytes for atime/ctime, so
        * a 5-byte magic compare would parse an mtime as a path prefix. */
      private def headerName(header: Array[Byte]): String = {
        def field(off: Int, max: Int): String = {
          var end = off
          while (end < off + max && header(end) != 0) end += 1
          new String(header, off, end - off, "US-ASCII")
        }
        val name = field(0, 100)
        val posixUstar =
          header(257) == 'u' && header(258) == 's' && header(259) == 't' &&
            header(260) == 'a' && header(261) == 'r' && header(262) == 0 &&
            header(263) == '0' && header(264) == '0'
        val prefix = if (posixUstar) field(345, 155) else ""
        if (prefix.isEmpty) name else prefix + "/" + name
      }

      private def advance(): Unit = {
        nextMember = null
        val header = new Array[Byte](BlockSize)
        while (nextMember == null && !finished) {
          try din.readFully(header)
          catch { case _: java.io.EOFException => finished = true; return }
          if (header.forall(_ == 0)) { finished = true; return } // end marker
          val name = headerName(header)
          val size = parseOctal(header, 124, 12)
          val typeflag = header(156)
          val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
          if (typeflag == '0' || typeflag == 0) {
            // The per-member byte[] is the documented memory bound; a
            // size field that can't fit one JVM array is either a
            // corrupt header or an archive this reader must refuse
            // loudly — size.toInt would silently wrap negative.
            if (size < 0 || size > Int.MaxValue - 8)
              throw new java.io.IOException(
                s"tar member '$name' declares size $size bytes — " +
                  "corrupt header or unsupported >2GiB member")
            val payload = new Array[Byte](size.toInt)
            din.readFully(payload)
            skipFully(din, padded - size, name)
            val effName =
              if (pendingLongName != null) { val n = pendingLongName; pendingLongName = null; n }
              else name
            nextMember = (effName, payload)
          } else if (typeflag == 'L') {
            // GNU longname record: NUL-terminated next-member name. Bound
            // the allocation — a sane path never approaches a block run.
            if (size < 0 || size > 64 * 1024)
              throw new java.io.IOException(
                s"tar GNU longname record declares $size bytes — corrupt header")
            val payload = new Array[Byte](size.toInt)
            din.readFully(payload)
            skipFully(din, padded - size, name)
            val end = { val i = payload.indexOf(0.toByte); if (i < 0) payload.length else i }
            pendingLongName = new String(payload, 0, end, "UTF-8")
          } else {
            // directory / link / pax global+extended headers — skip
            // payload blocks (pax path overrides are not interpreted;
            // GNU 'L' above covers the long-name case we produce/see).
            // An 'L' record names the IMMEDIATELY following member of
            // whatever type — if that member is skipped here, its long
            // name must be consumed with it, or the next regular file
            // would silently inherit a stale name.
            pendingLongName = null
            skipFully(din, padded, name)
          }
        }
      }

      /** skip() may legally return 0 (and does at EOF) — looping on it
        * alone spins forever on a truncated archive. Fall back to a
        * single-byte read to distinguish "slow skip" from EOF, and fail
        * loudly on truncation: an under-skip would silently desync every
        * subsequent header parse. */
      private def skipFully(s: DataInputStream, n: Long, name: String): Unit = {
        var toSkip = n
        while (toSkip > 0) {
          val skipped = s.skip(toSkip)
          if (skipped > 0) toSkip -= skipped
          else if (s.read() >= 0) toSkip -= 1
          else throw new java.io.IOException(
            s"truncated tar archive: EOF inside member '$name' " +
              s"($toSkip of $n padding bytes unread)")
        }
      }

      advance()
      override def hasNext: Boolean = nextMember != null
      override def next(): (String, Array[Byte]) = {
        val m = nextMember
        advance()
        m
      }
    }
  }

  /** Gunzip a byte payload (tar members arrive as `.op.gz`). */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Gzip a byte payload — the write-side twin of [[gunzip]].
    * Deterministic: java's GZIPOutputStream pins MTIME=0 and default
    * deflate settings, so identical input bytes always produce identical
    * archive bytes (fixture replay depends on the PARSED content anyway,
    * never the compressed image). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    try g.write(bytes) finally g.close()
    bos.toByteArray
  }

  /** Minimal POSIX-ustar writer — the sink-side twin of [[members]]
    * (regular files only, names ≤ 100 bytes, deterministic headers:
    * mode 0644, uid/gid/mtime 0). Used to build archive fixtures that
    * the gate replays through the full read path, and as the archive
    * sink an export pipeline needs. */
  def write(out: java.io.OutputStream,
      members: Seq[(String, Array[Byte])]): Unit = {
    def writeOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
      val s = s"%0${len - 1}o".format(v).getBytes("US-ASCII")
      require(s.length < len, s"octal field overflow: $v in $len bytes")
      System.arraycopy(s, 0, h, off, s.length) // trailing NUL already 0
    }
    for ((name, payload) <- members) {
      val nb = name.getBytes("US-ASCII")
      require(nb.length <= 100, s"member name '$name' exceeds 100 bytes")
      val h = new Array[Byte](BlockSize)
      System.arraycopy(nb, 0, h, 0, nb.length)
      writeOctal(h, 100, 8, 0x1a4) // mode 0644
      writeOctal(h, 108, 8, 0) // uid
      writeOctal(h, 116, 8, 0) // gid
      writeOctal(h, 124, 12, payload.length.toLong)
      writeOctal(h, 136, 12, 0) // mtime
      h(156) = '0'
      // POSIX magic "ustar\0" + version "00" (enables the prefix field
      // convention [[members]] honors)
      val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')
      System.arraycopy(magic, 0, h, 257, magic.length)
      // checksum: computed with the checksum field itself as spaces,
      // stored as 6 octal digits + NUL + space (the historical format)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.foldLeft(0L)((a, b) => a + (b & 0xFF))
      val oct = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(oct, 0, h, 148, 6)
      h(154) = 0
      h(155) = ' '
      out.write(h)
      out.write(payload)
      val pad = (BlockSize - payload.length % BlockSize) % BlockSize
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize)) // end-of-archive marker
  }
}
