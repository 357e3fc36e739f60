package graft.queries

import graft.{SparkSpec, Tables}

/** Behavioral invariants for the storage-layout queries beyond the DuckDB
  * value gate. */
class StorageSpec extends SparkSpec {

  test("compaction plan equals an independent greedy next-fit fold") {
    val got = StorageQueries.compaction.run(spark, Sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val files = Tables.documents(spark, Sf001)
      .select("source", "doc_id", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the reference fold: walk each partition's files in id order, assign
    // each to floor(bytes-so-far / target) — the exclusive prefix sum
    val expected = files.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, _, sz) =>
        val bin = cum / 2000L
        cum += sz
        (src, bin) -> sz
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }
    assert(got === expected)
  }

  test("compaction bins are dense from 0 within every source") {
    val bins = StorageQueries.compaction.run(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    bins.foreach { case (src, bs) =>
      assert(bs === (0L until bs.size).toSeq, s"source $src bins $bs")
    }
  }
}
