package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-class categorical Naive Bayes as PURE AGGREGATION — the
  * classifier whose "training" is one pass of map-side-combinable
  * contingency counts, which makes it the cheapest useful baseline a
  * data pipeline can fit at 100 TB (quality gates, source triage,
  * weak-label generation) and the one model whose scores an external
  * SQL oracle can replay exactly.
  *
  * Smoothing is add-one (Laplace): P(x_f = v | c) = (n_{c,f,v} + 1) /
  * (n_c + V_f), V_f the feature's observed-distinct count. Scores stay
  * in PROBABILITY space as a fixed left-associated chain of IEEE
  * divisions and multiplications over exact integer counts — no
  * log-likelihoods, whose libm `ln` is not bit-portable across engines.
  * With ≤ ~15 features the product stays far from double underflow;
  * past that, callers should bucket or hash features first (the same
  * place log-space would start to be needed anyway).
  *
  * Scale shape: one count aggregate per feature plus one for the class
  * prior, each dim-sized and broadcast back onto the distinct
  * feature-combination frame — the corpus is scanned once for the
  * combos and once per feature (a single multi-aggregate pass is an
  * easy fusion if feature count warrants it); no shuffle ever carries
  * more than the contingency tables.
  */
object NaiveBayes {

  /** Scored contingency table: one row per OBSERVED feature-value
    * combination, with its row count, the two smoothed class scores
    * (joint-probability estimates), and pred = [p_pos > p_neg].
    * `labelCol` must be 0/1. */
  def scoreTable(df: DataFrame, features: Seq[String],
      labelCol: String): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val base = df.select(
      features.map(col) :+ col(labelCol).cast("long").as("__y"): _*)
    val cls = base.agg(sum(col("__y")).as("__npos"),
      count(lit(1)).as("__n"))
    var out = base.groupBy(features.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(cls))
    var pPos = col("__npos").cast("double") / col("__n").cast("double")
    var pNeg = (col("__n") - col("__npos")).cast("double") /
      col("__n").cast("double")
    for (f <- features) {
      val t = base.groupBy(col(f)).agg(
        sum(col("__y")).as(s"__p_$f"), count(lit(1)).as(s"__c_$f"))
      val v = t.agg(count(lit(1)).as(s"__v_$f"))
      out = out.join(t, Seq(f)).crossJoin(broadcast(v))
      pPos = pPos * ((col(s"__p_$f") + 1L).cast("double") /
        (col("__npos") + col(s"__v_$f")).cast("double"))
      pNeg = pNeg * ((col(s"__c_$f") - col(s"__p_$f") + 1L).cast("double") /
        (col("__n") - col("__npos") + col(s"__v_$f")).cast("double"))
    }
    out.select(features.map(col) :+ col("n_rows") :+
      pPos.as("p_pos") :+ pNeg.as("p_neg") :+
      (pPos > pNeg).cast("int").as("pred"): _*)
  }
}
