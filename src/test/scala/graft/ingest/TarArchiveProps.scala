package graft.ingest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the hand-written ustar reader: any archive of
  * random members (including 0-byte and exact-block-multiple payloads,
  * the two padding edge cases) must round-trip name-and-byte exact. */
object TarArchiveProps extends Properties("graft.ingest.TarArchive") {

  private def tarEntry(name: String, payload: Array[Byte]): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
    val size = ("%011o".format(payload.length) + " ").getBytes("US-ASCII")
    System.arraycopy(size, 0, h, 124, size.length)
    h(156) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xFF).sum
    val cks = ("%06o".format(sum) + "  ").getBytes("US-ASCII")
    System.arraycopy(cks, 0, h, 148, cks.length)
    val padded = ((payload.length + 511) / 512) * 512
    h ++ payload ++ new Array[Byte](padded - payload.length)
  }

  private val member: Gen[(String, Array[Byte])] = for {
    name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(20).mkString)
    // bias toward the padding edge cases: empty, exactly 512, 512-multiples
    size <- Gen.frequency(
      (1, Gen.const(0)), (1, Gen.const(512)), (1, Gen.const(1024)),
      (5, Gen.choose(1, 1500)))
    bytes <- Gen.containerOfN[Array, Byte](size, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (name + ".op", bytes)

  property("write → members round-trips name- and byte-exact (incl. gzip twin)") =
    forAll(Gen.listOfN(4, member)) { ms =>
      val bos = new java.io.ByteArrayOutputStream()
      TarArchive.write(bos, ms)
      val got = TarArchive.members(
        new java.io.ByteArrayInputStream(bos.toByteArray)).toList
      got.map(_._1) == ms.map(_._1) &&
        got.zip(ms).forall { case ((_, g), (_, w)) =>
          java.util.Arrays.equals(g, w) } &&
        ms.forall { case (_, b) =>
          java.util.Arrays.equals(TarArchive.gunzip(TarArchive.gzip(b)), b) }
    }

  property("members round-trip name- and byte-exact through a built archive") =
    forAll(Gen.listOfN(4, member)) { ms =>
      val archive = ms.flatMap { case (n, b) => tarEntry(n, b) }.toArray ++
        new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == ms.map(_._1) &&
        got.zip(ms).forall { case ((_, g), (_, w)) => java.util.Arrays.equals(g, w) }
    }

  property("directory members are skipped, files around them still parse") =
    forAll(member, member) { (m1, m2) =>
      val dir = {
        val h = new Array[Byte](512)
        val nb = "somedir/".getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
        val size = "00000000000 ".getBytes("US-ASCII")
        System.arraycopy(size, 0, h, 124, size.length)
        h(156) = '5' // directory typeflag
        h
      }
      val archive = tarEntry(m1._1, m1._2) ++ dir ++ tarEntry(m2._1, m2._2) ++
        new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == List(m1._1, m2._1)
    }

  property("reading is lazy: one member pulls O(member) bytes, not the archive") = {
    // 50 × 1000-byte members ≈ 76 KB archive. The iterator prefetches one
    // member ahead, so after consuming the FIRST member at most two
    // entries (2 × (512 + 1024) bytes) may have been read — consuming the
    // whole archive up front (the old parseTar behavior) would read ~76 KB.
    val ms = (1 to 50).map(i => (s"m$i.op", Array.fill[Byte](1000)(7)))
    val archive = ms.flatMap { case (n, b) => tarEntry(n, b) }.toArray ++
      new Array[Byte](1024)
    var bytesRead = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(archive)
      override def read(): Int = { val r = in.read(); if (r >= 0) bytesRead += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = in.read(b, off, len); if (r > 0) bytesRead += r; r
      }
    }
    val it = TarArchive.members(counting)
    it.next()
    bytesRead <= 2L * (512 + 1024) && bytesRead < archive.length / 10
  }

  property("truncated archive fails with IOException instead of spinning") = {
    // A directory header declaring 1024 payload bytes with nothing behind
    // it: the old skip loop spun forever on skip()==0 at EOF.
    val h = new Array[Byte](512)
    val nb = "somedir/".getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
    val size = "00000002000 ".getBytes("US-ASCII") // 1024 octal
    System.arraycopy(size, 0, h, 124, size.length)
    h(156) = '5'
    org.scalacheck.Prop.throws(classOf[java.io.IOException]) {
      TarArchive.members(new java.io.ByteArrayInputStream(h)).toList
    }
  }

  property("member size beyond one JVM array is refused, not wrapped negative") = {
    // 0o77777777777 = 8 GiB − 1: size.toInt used to wrap negative and die
    // in NegativeArraySizeException; now a clear IOException.
    val h = new Array[Byte](512)
    val nb = "huge.op".getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
    val size = "77777777777 ".getBytes("US-ASCII")
    System.arraycopy(size, 0, h, 124, size.length)
    h(156) = '0'
    org.scalacheck.Prop.throws(classOf[java.io.IOException]) {
      TarArchive.members(new java.io.ByteArrayInputStream(h)).toList
    }
  }

  property("GNU 'L' longname record names the following member in full") =
    forAll(member, Gen.choose(101, 220)) { (m, nameLen) =>
      // a name longer than the 100-byte header field, carried by an 'L'
      // pseudo-member; header field holds the truncated prefix
      val longName = ("d/" * 40 + "x").take(nameLen - 6) + ".op.gz"
      val nameBytes = longName.getBytes("UTF-8") :+ 0.toByte
      val lHeader = {
        val h = new Array[Byte](512)
        val nb = "././@LongLink".getBytes("US-ASCII")
        System.arraycopy(nb, 0, h, 0, nb.length)
        val size = ("%011o".format(nameBytes.length) + " ").getBytes("US-ASCII")
        System.arraycopy(size, 0, h, 124, size.length)
        h(156) = 'L'
        h
      }
      val padded = ((nameBytes.length + 511) / 512) * 512
      val lRecord = lHeader ++ nameBytes ++ new Array[Byte](padded - nameBytes.length)
      val archive = lRecord ++ tarEntry(longName.take(100), m._2) ++
        tarEntry(m._1, m._2) ++ new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == List(longName, m._1) // full name, then unaffected member
    }

  property("POSIX ustar prefix field joins onto the name field") =
    forAll(member) { m =>
      val h = new Array[Byte](512)
      val nb = "file.op".getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
      val size = ("%011o".format(m._2.length) + " ").getBytes("US-ASCII")
      System.arraycopy(size, 0, h, 124, size.length)
      h(156) = '0'
      // true POSIX ustar: magic "ustar\u0000" + version "00"
      val magic = "ustar\u000000".getBytes("US-ASCII")
      System.arraycopy(magic, 0, h, 257, magic.length)
      val prefix = "some/deep/dir".getBytes("US-ASCII")
      System.arraycopy(prefix, 0, h, 345, prefix.length)
      val padded = ((m._2.length + 511) / 512) * 512
      val archive = h ++ m._2 ++ new Array[Byte](padded - m._2.length) ++
        new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == List("some/deep/dir/file.op")
    }

  property("old-GNU magic does not misread atime bytes as a path prefix") =
    forAll(member) { m =>
      // GNU format (magic "ustar  ") reuses offset 345 for atime — a
      // naive 5-byte magic compare would yield "13713461166 /file.op"
      val h = new Array[Byte](512)
      val nb = "file.op".getBytes("US-ASCII"); System.arraycopy(nb, 0, h, 0, nb.length)
      val size = ("%011o".format(m._2.length) + " ").getBytes("US-ASCII")
      System.arraycopy(size, 0, h, 124, size.length)
      h(156) = '0'
      val magic = "ustar  ".getBytes("US-ASCII") // old-GNU magic+version
      System.arraycopy(magic, 0, h, 257, magic.length)
      val atime = "13713461166 ".getBytes("US-ASCII")
      System.arraycopy(atime, 0, h, 345, atime.length)
      val padded = ((m._2.length + 511) / 512) * 512
      val archive = h ++ m._2 ++ new Array[Byte](padded - m._2.length) ++
        new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == List("file.op")
    }

  property("longname for a SKIPPED member does not leak onto the next file") =
    forAll(member) { m =>
      // 'L' record naming a long-named DIRECTORY: the dir is skipped and
      // must consume its long name; the regular file after it keeps its
      // own header name
      val dirLongName = "d/" * 60 + "subdir/"
      val nameBytes = dirLongName.getBytes("UTF-8") :+ 0.toByte
      val lHeader = {
        val h = new Array[Byte](512)
        val nb = "././@LongLink".getBytes("US-ASCII")
        System.arraycopy(nb, 0, h, 0, nb.length)
        val size = ("%011o".format(nameBytes.length) + " ").getBytes("US-ASCII")
        System.arraycopy(size, 0, h, 124, size.length)
        h(156) = 'L'
        h
      }
      val lPadded = ((nameBytes.length + 511) / 512) * 512
      val dir = {
        val h = new Array[Byte](512)
        val nb = dirLongName.take(100).getBytes("US-ASCII")
        System.arraycopy(nb, 0, h, 0, nb.length)
        val size = "00000000000 ".getBytes("US-ASCII")
        System.arraycopy(size, 0, h, 124, size.length)
        h(156) = '5'
        h
      }
      val archive = lHeader ++ nameBytes ++
        new Array[Byte](lPadded - nameBytes.length) ++
        dir ++ tarEntry(m._1, m._2) ++ new Array[Byte](1024)
      val got = TarArchive.members(new java.io.ByteArrayInputStream(archive)).toList
      got.map(_._1) == List(m._1)
    }

  property("gunzip inverts gzip for arbitrary payloads") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { b =>
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      java.util.Arrays.equals(TarArchive.gunzip(bo.toByteArray), b)
    }
}
