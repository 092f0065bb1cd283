package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    // ensure() wants to own the dir contents; hand it a fresh path inside
    s"$d/layout"
  }

  private def lineitemFixture() = Seq(
    // (l_orderkey, l_extendedprice, l_discount)
    (1L, 100.00, 0.00), (1L, 250.00, 0.10),
    (2L, 40.00, 0.00),
    (3L, 999.99, 0.05), (3L, 0.01, 0.00),
    (4L, 10.00, 0.50)
  ).toDF("l_orderkey", "l_extendedprice", "l_discount")

  private def ordersFixture() = Seq(
    (1L, 7L, "O"), (2L, 8L, "F"), (3L, 7L, "O"), (4L, 9L, "P")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus")

  test("ensure writes once, then re-registers metadata-only") {
    val dir = tmpDir()
    val df = lineitemFixture()
    val t = "graft_bspec_li1"
    try {
      assert(Bucketed.ensure(spark, df, t, dir, 4, "l_orderkey"),
        "first ensure must write")
      // same session: catalog hit, no write
      assert(!Bucketed.ensure(spark, df, t, dir, 4, "l_orderkey"))
      // simulate a fresh process: drop the catalog entry, keep the files
      val before = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString).sorted.toSeq
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(!Bucketed.ensure(spark, df, t, dir, 4, "l_orderkey"),
        "matching sidecar must re-register without rewriting")
      val after = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString).sorted.toSeq
      assert(before == after, "metadata-only path must not touch files")
      assert(spark.table(t).count() == df.count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a changed input fingerprint forces a rewrite") {
    val dir = tmpDir()
    val t = "graft_bspec_li2"
    try {
      assert(Bucketed.ensure(spark, lineitemFixture(), t, dir, 4, "l_orderkey"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val changed = lineitemFixture().withColumn("l_discount", lit(0.25))
      assert(Bucketed.ensure(spark, changed, t, dir, 4, "l_orderkey"),
        "fingerprint mismatch must rewrite, not serve stale buckets")
      val got = spark.table(t).select(sum(col("l_discount"))).head().getDouble(0)
      assert(math.abs(got - 0.25 * 6) < 1e-9)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("colocatedOrderRevenue matches the naive computation and keeps no hash exchange") {
    val liDir = tmpDir(); val oDir = tmpDir()
    val li = "graft_bspec_li3"; val ot = "graft_bspec_o3"
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.ensure(spark, lineitemFixture(), li, liDir, 4, "l_orderkey")
      Bucketed.ensure(spark, ordersFixture(), ot, oDir, 4, "o_orderkey")
      // forbid broadcast so the co-located merge join is what's proven
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = Bucketed.colocatedOrderRevenue(spark, li, ot, minRevCents = 5000L)
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg+join must not hash-shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"buckets unused:\n$plan")

      val naive = lineitemFixture()
        .groupBy(col("l_orderkey"))
        .agg(
          sum(Relational.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("long").as("rev_cents"),
          count(lit(1)).cast("long").as("n_items"))
        .filter(col("rev_cents") >= 5000L)
        .join(ordersFixture(), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
          col("o_orderstatus").as("orderstatus"), col("rev_cents"), col("n_items"))
        .orderBy(col("orderkey"))
      assert(got.collect().toSeq == naive.collect().toSeq)
      // spot-check the arithmetic: order 1 = 10000 + 22500 cents
      val o1 = got.filter(col("orderkey") === 1L).head()
      assert(o1.getAs[Long]("rev_cents") == 32500L && o1.getAs[Long]("n_items") == 2L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $li")
      spark.sql(s"DROP TABLE IF EXISTS $ot")
    }
  }
}
