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

      private def parseOctal(bytes: Array[Byte], off: Int, len: Int): Long = {
        var v = 0L
        var i = off
        val end = off + len
        while (i < end) {
          val c = bytes(i)
          if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
          i += 1
        }
        v
      }

      private def advance(): Unit = {
        nextMember = null
        val header = new Array[Byte](BlockSize)
        while (nextMember == null && !finished) {
          try din.readFully(header)
          catch { case _: java.io.EOFException => finished = true; return }
          if (header.forall(_ == 0)) { finished = true; return } // end marker
          val nameLen = {
            val i = header.indexOf(0.toByte)
            if (i < 0 || i > 100) 100 else i
          }
          val name = new String(header, 0, math.min(nameLen, 100), "US-ASCII")
          val size = parseOctal(header, 124, 12)
          val typeflag = header(156)
          val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
          if (typeflag == '0' || typeflag == 0) {
            val payload = new Array[Byte](size.toInt)
            din.readFully(payload)
            din.skipBytes((padded - size).toInt)
            nextMember = (name, payload)
          } else {
            // directory / link / GNU extension — skip its payload blocks
            var toSkip = padded
            while (toSkip > 0) toSkip -= din.skip(toSkip)
          }
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
}
