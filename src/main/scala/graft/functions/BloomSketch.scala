package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Column builders for Spark's native Bloom-filter sketch expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the engine's own
  * runtime-filter machinery (injected by InjectRuntimeFilter for shuffle
  * pruning) but are NOT registered in the SQL FunctionRegistry, so
  * `expr("bloom_filter_agg(...)")` fails to resolve — the catalyst
  * expressions cross into Columns through the same Bridge shim the other
  * custom expressions use. Build distributed (mergeable sketch aggregate),
  * probe in a codegen'd scan pass; the filter itself travels as one binary
  * scalar. Keys must be 64-bit hashes (wrap with xxhash64), matching how
  * the engine's runtime filters feed it.
  */
object BloomSketch {

  /** Distributed Bloom-filter build over a long-hash column. */
  def bloom_filter_agg(hashedKey: Column, estItems: Long, numBits: Long): Column =
    Bridge.toCol(new BloomFilterAggregate(Bridge.toExpr(hashedKey),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a built filter (no false negatives). */
  def bloom_might_contain(bloom: Column, hashedKey: Column): Column =
    Bridge.toCol(BloomFilterMightContain(Bridge.toExpr(bloom), Bridge.toExpr(hashedKey)))
}
