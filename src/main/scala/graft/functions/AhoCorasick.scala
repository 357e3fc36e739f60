package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search"): ONE left-to-right
  * scan of the text counts every occurrence of every dictionary pattern —
  * including overlapping matches and patterns nested inside longer ones —
  * in O(|text| + matches), where a per-pattern scan would pay
  * O(|dict| · |text|). The blocklist / PII-term / contamination-marker
  * scan of a curation pipeline is exactly this shape: a small fixed
  * dictionary against a 100 TB corpus, so the automaton (a few KB) rides
  * into codegen as a reference object — the broadcast-small side — and
  * the corpus never shuffles at all.
  *
  * The automaton is the textbook goto/fail/output construction: a trie
  * over the patterns, BFS failure links (longest proper suffix that is
  * also a trie prefix), and per-node emit lists PRE-FLATTENED through the
  * failure chain so the scan never walks fail links to report matches —
  * each step is one transition plus a bounded emit loop.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie build — children as per-node sorted parallel arrays (cache-friendly
  // binary search beats a per-node HashMap at these dictionary sizes)
  private val (childChar, childNode, failLink, emitsFlat) = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var n = 0
      p.foreach { c =>
        n = kids(n).getOrElse(c, {
          kids += mutable.TreeMap.empty[Char, Int]
          own += mutable.ArrayBuffer.empty[Int]
          kids(n)(c) = kids.size - 1
          kids.size - 1
        })
      }
      own(n) += pi
    }
    val size = kids.size
    val fail = new Array[Int](size)
    val emits = new Array[Array[Int]](size)
    emits(0) = own(0).toArray
    val queue = mutable.Queue.empty[Int]
    kids(0).foreach { case (_, c) => fail(c) = 0; emits(c) = own(c).toArray; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      kids(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !kids(f).contains(ch)) f = fail(f)
        fail(v) = if (f != u && kids(f).contains(ch)) kids(f)(ch) else 0
        // flatten: matches ending here = own + everything the fail state emits
        emits(v) = (own(v) ++ emits(fail(v))).toArray
        queue += v
      }
    }
    val cc = new Array[Array[Char]](size)
    val cn = new Array[Array[Int]](size)
    var i = 0
    while (i < size) {
      cc(i) = kids(i).keysIterator.toArray
      cn(i) = kids(i).valuesIterator.toArray
      i += 1
    }
    (cc, cn, fail, emits)
  }

  private def goTo(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val chars = childChar(s)
      var lo = 0; var hi = chars.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = chars(mid)
        if (mc == c) return childNode(s)(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = failLink(s)
    }
    0 // unreachable
  }

  /** Occurrence count per pattern (overlaps and nested matches counted). */
  def countAll(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = goTo(state, s.charAt(i))
      val em = emitsFlat(state)
      var j = 0
      while (j < em.length) { counts(em(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** `multi_pattern_count(text)` → array<bigint>: occurrence count of each
  * dictionary pattern in `text`, one automaton pass per row, inside
  * whole-stage codegen (the automaton is a codegen reference object, built
  * once per executor). Dictionary order defines the output positions. */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_count needs string, got $t")
  }

  @transient private lazy val auto = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    auto.countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aho", auto, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
