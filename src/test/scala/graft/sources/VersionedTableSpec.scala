package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The versioned-table protocol end to end: append/overwrite versioning,
  * time travel, snapshot isolation (a resolved reader never sees a later
  * commit), optimistic-concurrency conflict, vacuum semantics, and the
  * loud failure when time travel crosses the vacuum horizon. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (VersionedTable, String) = {
    val dir = Files.createTempDirectory("vtab").toString
    (new VersionedTable(spark, dir), dir)
  }

  test("append creates versions; time travel reads each snapshot") {
    val (t, _) = fresh()
    assert(t.currentVersion() === -1)
    assert(t.append(Seq(1, 2).toDF("x")) === 0)
    assert(t.append(Seq(3).toDF("x")) === 1)
    assert(t.read().orderBy("x").as[Int].collect().toSeq === Seq(1, 2, 3))
    assert(t.read(Some(0)).orderBy("x").as[Int].collect().toSeq === Seq(1, 2))
    intercept[IllegalArgumentException](t.read(Some(5)))
  }

  test("overwrite replaces content but old versions stay readable") {
    val (t, _) = fresh()
    t.append(Seq(1, 2).toDF("x"))
    t.overwrite(Seq(9).toDF("x"))
    assert(t.read().as[Int].collect().toSeq === Seq(9))
    assert(t.read(Some(0)).orderBy("x").as[Int].collect().toSeq === Seq(1, 2))
  }

  test("snapshot isolation: a resolved read ignores later commits") {
    val (t, _) = fresh()
    t.append(Seq(1).toDF("x"))
    val snapshot = t.read() // head resolved here (v0)
    t.append(Seq(2).toDF("x"))
    assert(snapshot.as[Int].collect().toSeq === Seq(1))
    assert(t.read().orderBy("x").as[Int].collect().toSeq === Seq(1, 2))
  }

  test("two writers race one version: exactly one wins, appends retry") {
    val (t, dir) = fresh()
    t.append(Seq(1).toDF("x"))
    // simulate the race: another table handle commits version 1 between
    // this handle's head resolution and its CREATE_NEW
    val other = new VersionedTable(spark, dir)
    other.append(Seq(2).toDF("x"))
    // append from the stale handle retries onto version 2 and succeeds
    assert(t.append(Seq(3).toDF("x")) === 2)
    assert(t.read().orderBy("x").as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("CAS overwrite surfaces a conflict instead of dropping the racer's commit") {
    val (t, dir) = fresh()
    t.append(Seq(1).toDF("x"))
    val head = t.currentVersion() // read-modify-write starts here (v0)
    val racer = new VersionedTable(spark, dir)
    racer.append(Seq(2).toDF("x")) // v1 lands under us
    intercept[VersionConflictException](
      t.overwrite(Seq(9).toDF("x"), expectedHead = Some(head)))
    // the racer's commit survived; an unconditional overwrite then wins
    assert(t.read().orderBy("x").as[Int].collect().toSeq === Seq(1, 2))
    assert(t.overwrite(Seq(9).toDF("x")) === 2)
    assert(t.read().as[Int].collect().toSeq === Seq(9))
  }

  test("vacuum removes overwritten files; old time travel then fails loudly") {
    val (t, dir) = fresh()
    t.append(Seq(1).toDF("x"))
    t.overwrite(Seq(2).toDF("x"))
    // an orphan from a failed commit: on disk, never logged
    Files.write(Paths.get(dir, "part-orphan.parquet"), Array[Byte](1))
    val deleted = t.vacuum(beforeVersion = 0)
    assert(deleted.contains("part-orphan.parquet"))
    assert(deleted.size >= 2) // orphan + v0's replaced file(s)
    assert(t.read().as[Int].collect().toSeq === Seq(2)) // head unharmed
    intercept[IllegalStateException](t.read(Some(0)).collect())
  }

  test("changesSince returns exactly the appended delta, never a rescan") {
    val (t, _) = fresh()
    t.append(Seq(1, 2).toDF("x"))
    t.append(Seq(3).toDF("x"))
    t.append(Seq(4, 5).toDF("x"))
    assert(t.changesSince(0).orderBy("x").as[Int].collect().toSeq ===
      Seq(3, 4, 5))
    assert(t.changesSince(1).orderBy("x").as[Int].collect().toSeq ===
      Seq(4, 5))
    assert(t.changesSince(2).collect().isEmpty) // caught up
    assert(t.changesSince(-1).orderBy("x").as[Int].collect().toSeq ===
      Seq(1, 2, 3, 4, 5)) // bootstrap = full table
    intercept[IllegalArgumentException](t.changesSince(7))
  }

  test("changesSince across an overwrite fails loudly, not double-counting") {
    val (t, _) = fresh()
    t.append(Seq(1).toDF("x"))
    t.overwrite(Seq(2).toDF("x"))
    val ex = intercept[IllegalArgumentException](t.changesSince(0))
    assert(ex.getMessage.contains("append-only"))
    // a consumer that checkpoints AFTER the overwrite works again
    t.append(Seq(3).toDF("x"))
    assert(t.changesSince(1).as[Int].collect().toSeq === Seq(3))
  }

  test("filters and pruning reach the snapshot's parquet scan") {
    val (t, _) = fresh()
    t.append((1 to 100).map(i => (i.toLong, s"n$i")).toDF("id", "name"))
    val df = t.read().where(col("id") > 90).select("id")
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.metadata.getOrElse("PushedFilters", ""),
         s.metadata.getOrElse("ReadSchema", ""))
    }
    assert(scans.exists { case (f, r) =>
      f.contains("GreaterThan(id,90)") && !r.contains("name") },
      scans.mkString(" | "))
  }
}
