package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** PRECONDITION: `changes` must be key-unique — two change rows for one
    * key would fan the full-outer join out into duplicate snapshot rows
    * (the corruption every MERGE implementation guards; Delta raises
    * "multiple source rows matched"). Enforced lazily with raise_error on
    * the first duplicate, the same runtime-failure contract, costing one
    * window over the (small) changeset. */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
      deleteFlag: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == key)
    val keyCount = Window.partitionBy(col(key))
    val uniqueChanges = changes
      .withColumn("__kc", count(lit(1)).over(keyCount))
      .withColumn(key,
        when(col("__kc") > 1, raise_error(concat(
          lit(s"Upsert.merge: multiple change rows for key $key="),
          col(key).cast("string")))).otherwise(col(key)))
      .drop("__kc")
    snapshot.as("s")
      .join(uniqueChanges.as("c"), Seq(key), "full_outer")
      .filter(coalesce(col(s"c.$deleteFlag"), lit(false)) === false)
      .select(
        (col(key) +: dataCols.map(c =>
          coalesce(col(s"c.$c"), col(s"s.$c")).as(c))): _*)
  }
}
