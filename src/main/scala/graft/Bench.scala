package graft
import org.apache.spark.sql.SparkSession

/** Bench harness: per-query timings at the target SF.
  *
  * Each query runs `SPARK_GRAFT_BENCH_COLD_RUNS` (default 2) times COLD
  * — every run builds a FRESH plan (compilation, codegen, any
  * build-once fixture like the IVF layout); the first is additionally
  * process-cold (JIT, buffer pools) — and the reported cold number is
  * the MIN across those runs. Single-shot cold produced phantom 3–5×
  * swings round over round (GC pauses, JIT recompilation landing inside
  * one measurement) that burned a verdict cycle each on noise; min-of-N
  * keeps a real planning-cost regression visible while suppressing
  * one-off stalls. Then `SPARK_GRAFT_BENCH_RUNS` (default 3) WARM runs;
  * the headline per-query number is the best warm run. Both run counts
  * ride in the output (`cold_runs` / `warm_runs`) so the consumer knows
  * the protocol.
  *
  * OUTPUT CONTRACT: the harness that consumes this only sees the last
  * ~2000 characters of stdout and parses the LAST line as JSON. The full
  * per-query detail (~4 KB with 70 queries) therefore goes out as the
  * FIRST line and to BENCH_DETAIL.json; the final stdout line is a
  * compact summary hard-capped at [[Bench.MaxSummaryBytes]] bytes
  * (per-query dict included only when it fits the cap).
  */
object Bench {
  /** Byte budget for the final stdout line; comfortably under the
    * consumer's 2000-char tail even with a trailing newline and any
    * stray epilogue characters. */
  val MaxSummaryBytes = 1400

  private def r3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def dictOf(entries: Seq[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")

  /** The compact final-stdout line. Per-query warm timings ride along only
    * if the full line stays under `maxBytes`; otherwise they are dropped
    * (they are still available in the detail line / BENCH_DETAIL.json). */
  def summaryLine(totalWarm: Double, totalCold: Double,
                  queriesWarm: Seq[(String, Double)],
                  sf: String, warmRuns: Int, coldRuns: Int = 2,
                  maxBytes: Int = MaxSummaryBytes): String = {
    val base = s"""{"metric":"total","value":${r3(totalWarm)},"unit":"sec",""" +
      s""""total_cold":${r3(totalCold)},"warm_runs":$warmRuns,"cold_runs":$coldRuns,""" +
      s""""n_queries":${queriesWarm.size},"sf":"$sf""""
    val withDict = base + s""","queries":${dictOf(queriesWarm)}}"""
    if (withDict.getBytes("UTF-8").length <= maxBytes) withDict else base + "}"
  }

  /** Full detail record: warm and cold per-query dicts, unrounded totals. */
  def detailLine(totalWarm: Double, totalCold: Double,
                 results: Seq[(String, (Double, Double))],
                 sf: String, warmRuns: Int, coldRuns: Int = 2,
                 extra: String = ""): String = {
    def dict(f: ((Double, Double)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + r3(f(v)) }.mkString("{", ",", "}")
    s"""{"metric":"total","value":$totalWarm,"unit":"sec","queries":${dict(_._2)},""" +
      s""""queries_cold":${dict(_._1)},"total_cold":$totalCold,""" +
      s""""warm_runs":$warmRuns,"cold_runs":$coldRuns$extra,"sf":"$sf"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val coldRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_COLD_RUNS", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.setupSession(spark)
    // absorb session/executor startup so the first query's time is real
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.format("noop").mode("overwrite").save()

    // noop sink materializes every row/column — count() alone would let
    // Catalyst prune the distance compute out of the measurement
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
      }
    }

    // optional comma-separated subset for local iteration; the driver
    // leaves it unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(q => s(q._1)))
    val results: Seq[(String, (Double, Double))] = selected.toSeq.flatMap { case (name, fn) =>
      runOnce(name, fn).map { first =>
        // each extra cold run rebuilds the plan from scratch (fresh
        // DataFrame); only JIT/page-cache state carries over — min-of-N
        // suppresses one-off GC/JIT stalls without hiding planning cost
        val cold = (first +: (2 to coldRuns).flatMap(_ => runOnce(name, fn))).min
        val warm = (1 to warmRuns).flatMap(_ => runOnce(name, fn))
        name -> (cold, if (warm.nonEmpty) warm.min else cold)
      }
    }
    val totalWarm = results.map(_._2._2).sum
    val totalCold = results.map(_._2._1).sum
    // measured recall@10 of the approximate family (LSH, pruned IVF) vs
    // the exact scan — the accuracy/cost trade-off quantified per round
    val recall = try {
      val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      Some(graft.index.Recall.measure(corpus))
    } catch {
      case e: Throwable => System.err.println(s"[bench] recall: ${e.getMessage}"); None
    }
    val detail = detailLine(totalWarm, totalCold, results, sfDir, warmRuns, coldRuns,
      extra = recall.fold("")("," + _.json))
    println(detail) // first line: full per-query detail for humans/logs
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail file: ${e.getMessage}") }
    // LAST stdout line — must survive the consumer's 2000-char tail
    println(summaryLine(totalWarm, totalCold, results.map { case (k, v) => (k, v._2) }, sfDir, warmRuns, coldRuns))
    spark.stop()
  }
}
