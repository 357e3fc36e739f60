package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the custom expressions' compute kernels (Spark-free —
  * they exercise the same static methods codegen calls). */
object ExpressionProps extends Properties("graft.functions") {

  private val asciiString = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
  private val tokenList = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
  private val vec = Gen.nonEmptyListOf(Gen.choose(-10.0, 10.0))

  property("rollingHash matches the byte-fold reference") =
    forAll(asciiString) { s =>
      val expected = s.getBytes("UTF-8")
        .foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % 1000000007L)
      RollingHash.compute(UTF8String.fromString(s), 31L, 1000000007L) == expected
    }

  property("rollingHash stays within [0, mod)") =
    forAll(asciiString) { s =>
      val h = RollingHash.compute(UTF8String.fromString(s), 31L, 1000000007L)
      h >= 0L && h < 1000000007L
    }

  property("simhash64 is order-invariant (vote tally commutes)") =
    forAll(tokenList) { toks =>
      def arr(ts: List[String]) =
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
      SimHash64.compute(arr(toks)) == SimHash64.compute(arr(toks.reverse))
    }

  property("cosine is symmetric and within [-1, 1]") =
    forAll(vec) { xs =>
      val ys = xs.map(x => -x * 0.5 + 1.0)
      val a = new GenericArrayData(xs.toArray[Any])
      val b = new GenericArrayData(ys.toArray[Any])
      val ab = CosineSim.compute(a, b)
      val ba = CosineSim.compute(b, a)
      (ab == null && ba == null) ||
        (ab == ba && ab.doubleValue >= -1.0000000001 && ab.doubleValue <= 1.0000000001)
    }

  property("tokenize kernel == the composed split/lower/filter reference") =
    forAll(asciiString) { s =>
      val expected = s.toLowerCase.split("\\W+", -1).filter(_.nonEmpty).toSeq
      val got = Tokenize.compute(UTF8String.fromString(s))
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
    }

  property("word_shingles kernel == the composed slice/array_join reference") =
    forAll(tokenList, Gen.choose(1, 4)) { (toks, n) =>
      val expected =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val in = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = WordShingles.compute(in, n)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
    }

  property("word_shingles skips null tokens like array_join (null + separator dropped)") =
    forAll(Gen.listOf(Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty))),
        Gen.choose(1, 4)) { (toks, n) =>
      val expected =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.flatten.mkString(" ")).toSeq
      val in = new GenericArrayData(
        toks.map(_.map(UTF8String.fromString).orNull).toArray[Any])
      val got = WordShingles.compute(in, n)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
    }

  property("minhash kernel == the per-seed array_min(XXH64) reference") =
    forAll(tokenList, Gen.choose(1, 24)) { (toks, k) =>
      val in = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = MinHashSig.compute(in, k)
      val expected = (0 until k).map { seed =>
        if (toks.isEmpty) Long.MaxValue
        else toks.map { t =>
          val s = UTF8String.fromString(t)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
        }.min
      }
      (0 until got.numElements()).map(got.getLong) == expected
    }

  property("minhash is order-invariant and monotone under set union") =
    forAll(tokenList, tokenList) { (a, b) =>
      def sig(ts: List[String]) = {
        val arr = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
        val s = MinHashSig.compute(arr, 8)
        (0 until 8).map(s.getLong)
      }
      // permutation-invariant, and the union's min can only be <= each side's
      sig(a.reverse) == sig(a) &&
        sig(a ++ b).zip(sig(a)).forall { case (u, x) => u <= x }
    }

  property("cosine of a vector with itself is 1 (or null for zero vectors)") =
    forAll(vec) { xs =>
      val a = new GenericArrayData(xs.toArray[Any])
      val c = CosineSim.compute(a, new GenericArrayData(xs.toArray[Any]))
      if (xs.forall(_ == 0.0)) c == null
      else math.abs(c.doubleValue - 1.0) < 1e-9
    }

  private val key16 = Gen.choose(0L, 0xFFFFL)

  property("zvalue matches the per-bit interleave definition") =
    forAll(key16, key16) { (a, b) =>
      val expected = (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
      ZValue.compute(a, b) == expected
    }

  property("zvalue is monotone in each dimension holding the other at 0") =
    forAll(key16) { a =>
      // spreading bits preserves order along an axis — the property that
      // makes z-ranges usable for per-dimension min/max pruning
      ZValue.compute(a, 0L) <= ZValue.compute(0xFFFFL, 0L) &&
        ZValue.compute(0L, a) <= ZValue.compute(0L, 0xFFFFL) &&
        (a == 0L || ZValue.compute(a, 0L) > ZValue.compute(a - 1, 0L))
    }

  property("hilbert inverse walk round-trips the index") =
    forAll(key16, key16) { (a, b) =>
      HilbertIndex.inverse(HilbertIndex.compute(a, b)) == ((a, b))
    }

  property("hilbert consecutive indices are Manhattan-1 grid neighbors") =
    forAll(Gen.choose(0L, (1L << 32) - 2L)) { d =>
      // THE Hilbert invariant, and exactly what Z-order lacks: step d→d+1
      // never jumps — worst-case Morton steps span half the grid at
      // power-of-two seams
      val (x1, y1) = HilbertIndex.inverse(d)
      val (x2, y2) = HilbertIndex.inverse(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1L
    }

  property("hilbert index is within [0, 2^32) and masks high bits") =
    forAll(key16, key16) { (a, b) =>
      val h = HilbertIndex.compute(a, b)
      h >= 0L && h < (1L << 32) &&
        HilbertIndex.compute(a | 0x7FFF0000L, b) == h
    }

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  property("jaro_winkler is symmetric and within [0, 1]") =
    forAll(asciiString, asciiString) { (a, b) =>
      val ab = jw(a, b)
      ab == jw(b, a) && ab >= 0.0 && ab <= 1.0
    }

  property("jaro_winkler: identity scores 1, empty scores 0") =
    forAll(asciiString) { s =>
      (s.isEmpty || jw(s, s) == 1.0) && jw(s, "") == 0.0 && jw("", s) == 0.0
    }

  property("jaro_winkler textbook cases (the DuckDB-calibrated values)") = {
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-12
    close(jw("MARTHA", "MARHTA"), 0.9611111111111111) &&
      close(jw("DWAYNE", "DUANE"), 0.8400000000000001) &&
      close(jw("DIXON", "DICKSONX"), 0.8133333333333332) &&
      close(jw("ABC", "CBA"), 0.5555555555555555) && // below boost threshold
      jw("AB", "BA") == 0.0 // window 0 → no matches
  }

  private def nfc(s: String): String =
    NfcNormalize.compute(UTF8String.fromString(s)).toString

  property("nfc_normalize is idempotent") =
    forAll(asciiString) { s =>
      val mixed = s + "e\u0301u\u0308" // force the slow path too
      nfc(nfc(mixed)) == nfc(mixed) && nfc(nfc(s)) == nfc(s)
    }

  property("nfc_normalize: ASCII returns the input object (no allocation)") =
    forAll(asciiString) { s =>
      val u = UTF8String.fromString(s)
      NfcNormalize.compute(u) eq u
    }

  property("nfc_normalize composes the canonical pairs") = {
    nfc("cafe\u0301") == "caf\u00e9" &&
      nfc("u\u0308ber") == "\u00fcber" &&
      nfc("caf\u00e9") == "caf\u00e9" && // precomposed passes through
      // only the first combining acute composes; the second stays
      nfc("e\u0301\u0301") == "\u00e9\u0301" &&
      // NFC != NFD: it must not decompose precomposed input
      nfc("A\u030a") == "\u00c5" && nfc("\u00c5") == "\u00c5"
  }
}
