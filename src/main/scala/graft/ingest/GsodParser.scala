package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Cleaning

/** NOAA-GSOD fixed-layout text ingest — the reference's ETL core
  * (/root/reference/untitled.py:42-83), as ONE lazy pipeline.
  *
  * The reference gunzips tar members serially in Python and appends pandas
  * frames (O(n²) copies, 1 thread). Here: `spark.read.text` over `*.op[.gz]`
  * reads every file in parallel (gzip files are file-granular splits —
  * fine: one GSOD file is one station-year, ~25 KB), tokenization and
  * cleaning are codegen'd column expressions, and the downstream median/
  * latest/join run as ordinary shuffles. `.tar` archives ingest in-engine
  * too ([[parseTar]] via [[TarArchive]]): tar isn't splittable, so the
  * archive is the parallelism grain — one task per year archive.
  *
  * Positional layout (FIXTURES.md A1): data rows interleave observation-
  * count columns the header collapses, so columns are selected by DATA
  * token index: 0=STN, 1=WBAN, 2=YEARMODA, 3=TEMP, 5=DEWP, 13=WDSP,
  * 17=MAX, 18=MIN, 19=PRCP.
  *
  * Cleaning (implementing the reference's INTENT where its code is buggy —
  * SURVEY §2a F4): MAX/MIN may carry a trailing '*' quality flag; PRCP a
  * trailing A–I report flag (the reference truncates the last char
  * unconditionally, corrupting flagless values — untitled.py:54); sentinels
  * 9999.9 (temp/dewp/max/min), 999.9 (wdsp), 99.99 (prcp) → NULL; a
  * malformed YEARMODA parses to NULL per-row (the reference's
  * errors='ignore' leaves the whole column unparsed — untitled.py:56).
  */
object GsodParser {

  private def numClean(tok: Column, sentinel: Double): Column =
    Cleaning.sentinelToNull(tok.cast("double"), Seq(sentinel))

  /** Raw GSOD text (already-unpacked `.op` / `.op.gz` files) → typed,
    * cleaned daily observations matching Schemas.gsodObservation. */
  def parse(spark: SparkSession, path: String): DataFrame =
    parseLines(spark, spark.read.text(path))

  /** S3 in-engine: `.tar` archives of `.op` / `.op.gz` members → the same
    * typed observations. Parallelism is per-ARCHIVE (tar isn't
    * splittable — binaryFiles hands each archive to one task; GSOD ships
    * thousands of year archives, so the fleet stays busy). Members
    * gunzip executor-side; no driver round-trip, no temp files. */
  def parseTar(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        // Lazily consumed: memory is bounded by ONE decoded member
        // (~25 KB for GSOD), never the whole archive — a year archive is
        // GBs uncompressed, and materializing it per task is an executor
        // OOM at scale. The stream closes on exhaustion; the task-
        // completion listener covers early termination (limit, failure).
        val in = pds.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        val memberLines = TarArchive.members(in).flatMap { case (name, payload) =>
          if (!(name.endsWith(".op") || name.endsWith(".op.gz"))) Iterator.empty
          else {
            val bytes =
              if (name.endsWith(".gz")) TarArchive.gunzip(payload) else payload
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              .linesIterator
          }
        }
        new Iterator[String] { // close at exhaustion (also outside tasks)
          private var closed = false
          override def hasNext: Boolean = {
            val h = memberLines.hasNext
            if (!h && !closed) { closed = true; in.close() }
            h
          }
          override def next(): String = memberLines.next()
        }
      }
    parseLines(spark, lines.toDF("value"))
  }

  /** Tokenization/cleaning body over a `value`-lines DataFrame — public
    * so callers that already hold raw GSOD lines (an in-plan fixture, a
    * streaming source, a foreign extractor) run the exact parse the
    * file-path entry points use. */
  def parseLines(spark: SparkSession, linesDf: DataFrame): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    linesDf
      // drop header rows by their marker (not "keep digit-initial" — NOAA
      // USAF ids can be alphanumeric, e.g. A07026) and blank lines
      .filter(!col("value").rlike("^\\s*STN--") && col("value").rlike("\\S"))
      .select(
        toks.getItem(0).as("usaf"),
        toks.getItem(1).cast("int").as("wban"),
        toks.getItem(2).as("yearmoda"),
        numClean(toks.getItem(3), 9999.9).as("temp"),
        numClean(toks.getItem(5), 9999.9).as("dewp"),
        numClean(toks.getItem(13), 999.9).as("wdsp"),
        numClean(regexp_replace(toks.getItem(17), "\\*$", ""), 9999.9).as("max"),
        numClean(regexp_replace(toks.getItem(18), "\\*$", ""), 9999.9).as("min"),
        numClean(regexp_replace(toks.getItem(19), "[A-I]$", ""), 99.99).as("prcp"))
      .withColumn("date", try_to_date(col("yearmoda"), "yyyyMMdd"))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("day", dayofmonth(col("date")))
      .drop("yearmoda")
      .select("usaf", "wban", "date", "temp", "dewp", "wdsp", "max", "min",
        "prcp", "year", "month", "day")
  }

  /** Station metadata CSV (isd-history shape, FIXTURES.md A2) → cleaned
    * dimension: sentinel-null LAT/LON, not-null filter, coverage-window
    * predicate, null-skipping label (untitled.py:25-36). */
  def stations(spark: SparkSession, path: String, minYear: Int, maxYear: Int): DataFrame =
    cleanStations(
      spark.read
        .option("header", true)
        .schema(graft.schema.Schemas.stationHistory)
        .csv(path),
      minYear, maxYear)

  /** The station-dimension cleaning stage alone, over an already-loaded
    * raw frame in Schemas.stationHistory shape — shared by the CSV entry
    * point above and callers holding the raw rows in-plan. */
  def cleanStations(raw: DataFrame, minYear: Int, maxYear: Int): DataFrame = {
    val cleaned = Cleaning.requireNotNull(
      Cleaning.sentinelToNull(raw, Seq("lat", "lon", "elev_m")),
      Seq("lat", "lon"))
    cleaned
      .filter(
        Cleaning.yearPrefix(col("end")) === maxYear &&
          Cleaning.yearPrefix(col("begin")) <= minYear)
      .withColumn("elev_lbl",
        when(col("elev_m").isNotNull,
          concat(lit("Elevation: "), col("elev_m").cast("string"), lit(" m"))))
      .withColumn("lbl",
        concat_ws("<br>",
          concat_ws(", ", col("station_name"), col("state"), col("ctry")),
          col("elev_lbl")))
      .drop("station_name", "state", "icao", "begin", "end", "elev_lbl")
  }

  /** The reference's monthly rollup (untitled.py:81): per-station-month
    * median of every measure. */
  def monthlyMedians(obs: DataFrame): DataFrame =
    obs.groupBy("usaf", "wban", "year", "month")
      .agg(
        median(col("temp")).as("temp"),
        median(col("dewp")).as("dewp"),
        median(col("wdsp")).as("wdsp"),
        median(col("max")).as("max"),
        median(col("min")).as("min"),
        median(col("prcp")).as("prcp"))

  /** The reference's full ETL (untitled.py:62-86): observations semi-joined
    * to active stations, monthly medians, metadata joined back. */
  def etl(obs: DataFrame, stations: DataFrame): DataFrame = {
    val keys = Seq("usaf", "wban")
    val active = obs.join(broadcast(stations.select(keys.map(col): _*)), keys, "left_semi")
    monthlyMedians(active).join(broadcast(stations), keys, "inner")
  }

  /** Map-client export — the exact payload shape the reference's web map
    * consumes (/root/reference/map_tutorial.html:48-71: a lat/lon point
    * layer with an HTML label and a month time-slider). The viewer itself
    * (rendering, legend, time filtering) is presentation scope, not
    * engine scope (SURVEY §2); this projection closes the parity gap for
    * a user who wants to feed such a client: one measure column plus a
    * real DATE for the slider, written per-month partition-friendly. */
  def mapExport(etlOut: DataFrame, measure: String): DataFrame =
    etlOut.select(
      col("usaf"), col("wban"), col("lat"), col("lon"), col("lbl"),
      col("year"), col("month"),
      col(measure).as("value"),
      make_date(col("year"), col("month"), lit(1)).as("month_start"))
}
