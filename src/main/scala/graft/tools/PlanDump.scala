package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan (and optionally the
  * AQE final plan after execution) of a declared query —
  * `sbt "runMain graft.tools.PlanDump <query> [sfDir]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.setupSession(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("=== before execution ===")
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"=== executed in ${(System.nanoTime() - t0) / 1e9}%.2f s; final (AQE) plan ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
