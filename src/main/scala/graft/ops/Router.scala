package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash routing: assign every record a split/shard purely
  * from its key — md5 bucket compared lexicographically over the first
  * two hex chars (256 buckets; 'cc' = 204 ⇒ 79.7% train, 'e6' = 230 ⇒
  * 10.2% valid, rest test).
  *
  * One expression, shared by the batch query (q_hash_split) and the
  * streaming router (Streams.routeBySplit) so the two can never drift:
  * assignment is a pure function of the key, which is exactly what makes
  * it safe on a stream — no RNG state, no reprocessing hazard (a replayed
  * record lands in the same split), and an engine-portable definition
  * (md5 hex is identical everywhere).
  */
object Router {

  /** Split label for a key: train/valid/test ≈ 80/10/10. */
  def hashSplit(key: Column, salt: String = "split42:"): Column = {
    val bucket = substring(md5(concat(lit(salt), key.cast("string"))), 1, 2)
    when(bucket < "cc", "train")
      .when(bucket < "e6", "valid")
      .otherwise("test")
  }
}
