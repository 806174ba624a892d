package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize EVERY column through the noop sink: a bare count()
    // lets Catalyst prune top-level projections, which under-reports
    // projection-heavy queries (langid, scrub, fingerprint) — noop
    // runs the full plan with zero write cost.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // Warm-up at the smallest SF: JVM/codegen/parquet-footer costs land
    // here, so the timed pass measures the plans, not session startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => () }
    }
    // Two timed passes, keep the min, GC between queries: one JVM
    // runs all 45 queries back-to-back, so a neighbor's garbage
    // otherwise leaks into the next timing (observed 5x swings on
    // the same plan).
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      System.gc()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir)) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout (forwarded verbatim via run/outputStrategy := StdoutOutput)
    // plus stderr as a belt-and-braces copy for the driver's parser.
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
