package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints how many times expensive expressions appear in the executed
  * plan of selected queries — the guard for "parse once" claims.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("cdc_typed_projection", "cdc_typed_projection_v2", "cdc_rowkey", "cdc_parse")) {
      val plan = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      val nFromJson = "from_json".r.findAllIn(plan).length
      val nGetJson = "get_json_object".r.findAllIn(plan).length
      println(s"$name: from_json x$nFromJson, get_json_object x$nGetJson")
    }
    spark.stop()
  }
}
