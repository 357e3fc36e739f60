package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert + delete): apply a changeset to a snapshot — the
  * primitive behind incremental lakehouse pipelines (Delta/Iceberg MERGE
  * INTO), expressed as one full-outer join on the key:
  *
  *  - key only in snapshot  → row kept as-is
  *  - key in both           → changeset values win (update)
  *  - key only in changeset → new row (insert)
  *  - changeset row flagged `deleteFlag` → row dropped
  *
  * Scale: a single shuffle join on the key — at 100 TB both sides hash-
  * partition and the merge streams; with a bucketed snapshot (see
  * BucketingSpec) the snapshot side doesn't even re-shuffle.
  *
  * Limitation (documented, inherent to coalesce-merging): a changeset
  * cannot set a column to NULL — that needs per-column presence flags or
  * a real table format's MERGE.
  */
object Upsert {

  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
      deleteFlag: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == key)
    snapshot.as("s")
      .join(changes.as("c"), Seq(key), "full_outer")
      .filter(coalesce(col(s"c.$deleteFlag"), lit(false)) === false)
      .select(
        (col(key) +: dataCols.map(c =>
          coalesce(col(s"c.$c"), col(s"s.$c")).as(c))): _*)
  }
}
