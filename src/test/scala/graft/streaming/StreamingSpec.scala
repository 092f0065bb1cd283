package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates tumbling windows under a watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingIngest.windowedCounts(
      input.toDF().toDF("ts", "event_type"),
      windowLen = "10 minutes", delay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(date_format($"window_start", "HH:mm").as("w"), $"event_type", $"n_events")
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(("10:00", "click", 2L), ("10:10", "view", 1L)))
    } finally q.stop()
  }

  test("streamingTokenizeIds: multi-batch stream equals the batch run; redelivery idempotent") {
    implicit val sc = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("stream_tok").toString
    val train = Seq((1L, "Scan merge scan"), (2L, "merge join scan")).toDF("doc_id", "text")
    val vocab = graft.text.Unigram.trainVocab(train,
        rounds = 2, maxPieceLen = 4, topMulti = 20, marker = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // two micro-batches (one per addData group under AvailableNow with
    // maxFilesPerTrigger-free MemoryStream: all pre-start data is one
    // batch, so split across two pipeline runs sharing the sink root)
    val apply = Seq(
      (10L, "scan merge"), (11L, "join qé 你"), (12L, "merge merge scan"))
    val input = MemoryStream[(Long, String)]
    input.addData(apply.take(2))
    val q = StreamingIngest.streamingTokenizeIds(
      input.toDF().toDF("doc_id", "text"), vocab,
      s"$scratch/sink", s"$scratch/chk")
    q.awaitTermination()
    val input2 = MemoryStream[(Long, String)]
    input2.addData(apply.drop(2))
    val q2 = StreamingIngest.streamingTokenizeIds(
      input2.toDF().toDF("doc_id", "text"), vocab,
      s"$scratch/sink2", s"$scratch/chk2")
    q2.awaitTermination()
    // zero executor state in both runs — stateless by construction
    Seq(q, q2).foreach { qq =>
      val st = qq.recentProgress.iterator
        .map(p => p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
      assert(st == 0L, s"tokenize must keep zero executor state, got $st")
    }
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink", s"$scratch/sink2")
      .select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    // == the batch run over the union (statelessness)
    val batch = graft.text.Unigram.tokenIdsByteFallback(
        apply.toDF("doc_id", "text"), vocab, marker = true)
      .select($"doc_id", $"token_ids").as[(Long, Seq[Int])].collect().toMap
    assert(streamed == batch,
      s"streamed partition must equal the batch run: $streamed vs $batch")
    // redelivery: the same pipeline TAG (tag = md5 of the checkpoint
    // path) re-processing batch 0 — emulated by clearing the
    // checkpoint so offsets restart while the tag and sink stay —
    // rewrites its batch-keyed dir, never duplicates
    val before = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink").count()
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator.asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(s"$scratch/chk"))
    val input3 = MemoryStream[(Long, String)]
    input3.addData(apply.take(2))
    val q3 = StreamingIngest.streamingTokenizeIds(
      input3.toDF().toDF("doc_id", "text"), vocab,
      s"$scratch/sink", s"$scratch/chk")
    q3.awaitTermination()
    val after = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink").count()
    assert(after == before,
      s"batch-keyed overwrite must make redelivery idempotent: $before -> $after")
  }

  test("streamingClassifierScores: stream equals batch, zero state, redelivery idempotent") {
    implicit val sc = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("stream_lr").toString
    val corpus = Seq(
      (1L, "alpha filler common", "en"), (2L, "omega filler common", "xx"),
      (3L, "alpha common tail", "en"), (4L, "omega common tail", "xx"))
      .toDF("doc_id", "text", "lang")
    val vocab = graft.text.LogReg.topVocab(corpus, 4)
    val w = graft.text.LogReg.trainLogistic(
      graft.text.LogReg.features(corpus, vocab, $"lang" === "en"),
      vocab.length + 1, iters = 8)
    val apply = Seq(
      (10L, "alpha common", "en"), (11L, "omega common", "xx"),
      (12L, "alpha omega filler", "en"))
    val input = MemoryStream[(Long, String, String)]
    input.addData(apply.take(2))
    val q = StreamingIngest.streamingClassifierScores(
      input.toDF().toDF("doc_id", "text", "lang"), vocab, w,
      s"$scratch/sink", s"$scratch/chk")
    q.awaitTermination()
    val input2 = MemoryStream[(Long, String, String)]
    input2.addData(apply.drop(2))
    val q2 = StreamingIngest.streamingClassifierScores(
      input2.toDF().toDF("doc_id", "text", "lang"), vocab, w,
      s"$scratch/sink2", s"$scratch/chk2")
    q2.awaitTermination()
    Seq(q, q2).foreach { qq =>
      val st = qq.recentProgress.iterator
        .map(p => p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
      assert(st == 0L, s"scoring must keep zero executor state, got $st")
    }
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink", s"$scratch/sink2")
      .select($"doc_id", $"score_micro", $"pred")
      .as[(Long, Long, Boolean)].collect().toSet
    val batch = graft.text.LogReg.scores(
        graft.text.LogReg.features(apply.toDF("doc_id", "text", "lang"),
          vocab, $"lang" === "en"), w)
      .select($"doc_id", $"score_micro", $"pred")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed == batch, s"streamed scores must equal the batch run")
    val before = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink").count()
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator.asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(s"$scratch/chk"))
    val input3 = MemoryStream[(Long, String, String)]
    input3.addData(apply.take(2))
    val q3 = StreamingIngest.streamingClassifierScores(
      input3.toDF().toDF("doc_id", "text", "lang"), vocab, w,
      s"$scratch/sink", s"$scratch/chk")
    q3.awaitTermination()
    val after = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$scratch/sink").count()
    assert(after == before,
      s"batch-keyed overwrite must make redelivery idempotent: $before -> $after")
  }

  test("streamingIncrementalDedup: durable store memory across micro-batches, zero executor state") {
    implicit val sc = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("sid").toString
    val storeDir = s"$scratch/store"
    // seed: one known doc
    Seq(("seed content already crawled", 100L)).toDF("text", "doc_id")
      .select(graft.text.TextAnalysis.fingerprintMd5($"text").as("h"),
        $"doc_id".as("first_id"))
      .write.parquet(storeDir)
    // batch 1: a store dup, a novel doc, a within-batch dup pair —
    // data added BEFORE start (AvailableNow snapshots offsets at start)
    val input = MemoryStream[(Long, String)]
    input.addData(
      (201L, "seed content already crawled"),
      (202L, "fresh batch one content"),
      (203L, "twin content"), (204L, "twin content"))
    val q = StreamingIngest.streamingIncrementalDedup(
      input.toDF().toDF("doc_id", "text"),
      storeDir, s"$scratch/sink", s"$scratch/chk")
    try {
      q.awaitTermination()
      // AvailableNow terminated; a second run over new input —
      // REDELIVERY of batch-1 novel content under new ids
      val input2 = MemoryStream[(Long, String)]
      input2.addData(
        (301L, "fresh batch one content"), // novel in b1 → must be dup now
        (302L, "twin content"),            // b1's winner owns it
        (303L, "genuinely new in batch two"))
      // a separate pipeline (fresh checkpoint) restarts batch ids at 0,
      // so it gets its OWN sink — batch-id keying is per checkpoint
      // lineage; only a resumed/retried query may share one
      val q2 = StreamingIngest.streamingIncrementalDedup(
        input2.toDF().toDF("doc_id", "text"),
        storeDir, s"$scratch/sink2", s"$scratch/chk2")
      q2.awaitTermination()
      // batch-id-keyed sink subdirs (idempotent redelivery layout)
      val out = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$scratch/sink", s"$scratch/sink2")
        .select($"doc_id", $"is_new",
          coalesce($"dup_of", lit(-1L)).as("dup_of"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out(201L) == ((0L, 100L)), "store dup must point at the seed owner")
      assert(out(202L) == ((1L, -1L)))
      assert(out(203L) == ((1L, -1L)), "within-batch first occurrence is the winner")
      assert(out(204L) == ((0L, 203L)), "within-batch duplicate points at the batch winner")
      assert(out(301L) == ((0L, 202L)),
        "batch-2 redelivery must hit the hash appended by batch 1 — durable memory")
      assert(out(302L) == ((0L, 203L)))
      assert(out(303L) == ((1L, -1L)))
      // zero executor state: no stateful operators in the plan
      assert(q2.recentProgress.forall(_.stateOperators.isEmpty),
        "foreachBatch incremental dedup must carry no state-store state")
    } finally { if (q.isActive) q.stop() }
  }

  test("streamingIncrementalNearDedup: durable posting memory across runs, zero executor state") {
    implicit val sc = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("sind").toString
    val storeDir = s"$scratch/store"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    graft.dedup.Dedup.ensureShingleStore(spark,
      Seq((1L, base)).toDF("doc_id", "text"), storeDir)
    // run 1: a near-dup of the seed and a wholly novel doc
    val novel = "wholly new q1 w2 e3 r4 t5 y6 u7 i8 o9 p0 filler tokens"
    val input = MemoryStream[(Long, String)]
    input.addData((100L, base + " appended tail tokens"), (101L, novel))
    val q = StreamingIngest.streamingIncrementalNearDedup(
      input.toDF().toDF("doc_id", "text"),
      storeDir, s"$scratch/sink", s"$scratch/chk")
    try {
      q.awaitTermination()
      // run 2: a near-dup of run 1's NOVEL doc — only durable posting
      // memory (the delta appended by run 1) can catch it
      val input2 = MemoryStream[(Long, String)]
      input2.addData((200L, novel + " tail"))
      val q2 = StreamingIngest.streamingIncrementalNearDedup(
        input2.toDF().toDF("doc_id", "text"),
        storeDir, s"$scratch/sink2", s"$scratch/chk2")
      q2.awaitTermination()
      val out = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$scratch/sink", s"$scratch/sink2")
        .select($"doc_id", $"is_novel",
          coalesce($"near_dup_of", lit(-1L)).as("near_dup_of"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out(100L) == ((0L, 1L)), "near-dup of the seeded corpus doc")
      assert(out(101L) == ((1L, -1L)), "novel doc reported novel")
      assert(out(200L) == ((0L, 101L)),
        "run 2 must match run 1's appended postings — durable near-dup memory")
      assert(q2.recentProgress.forall(_.stateOperators.isEmpty),
        "foreachBatch incremental near-dedup must carry no state-store state")
    } finally { if (q.isActive) q.stop() }
  }

  test("streamingDedup drops same-content rows within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingIngest.streamingDedup(
      input.toDF().toDF("ts", "doc_id", "text"), delay = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts(1), 1L, "spark streams data"),
        (ts(2), 2L, "Spark  streams DATA"), // same after normalization
        (ts(3), 3L, "different content entirely"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(kept.size == 2 && kept.contains(3L))
      assert(kept.contains(1L) ^ kept.contains(2L))
    } finally q.stop()
  }

  test("streamingDedup evicts state past the watermark (bounded, re-emits beyond horizon)") {
    // the property that separates dropDuplicatesWithinWatermark from
    // plain dropDuplicates: after the watermark passes a key's event
    // time its state is GONE — a later duplicate re-emits. Plain
    // dropDuplicates keyed on the hash would hold the key forever
    // (silently unbounded state) and this test would fail.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingIngest.streamingDedup(
      input.toDF().toDF("ts", "doc_id", "text"), delay = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      def hr(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      input.addData((hr(10), 1L, "repeated content"), (hr(10), 2L, "repeated content"))
      q.processAllAvailable()
      // 2 is a within-horizon duplicate of 1 → dropped
      assert(spark.table("dedup_evict").select("doc_id").as[Long].collect().toSet == Set(1L))
      // advance the watermark far past hour 10 (hour 15 − 1h delay = 14)
      input.addData((hr(15), 3L, "advancing the clock"))
      q.processAllAvailable()
      // key 1's state was evicted → the same content re-emits
      input.addData((hr(15), 4L, "repeated content"))
      q.processAllAvailable()
      val kept = spark.table("dedup_evict").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 4L), s"expected eviction re-emit, got $kept")
    } finally q.stop()
  }

  test("streamingDedup state rows stay flat across a 2x replay of the same content") {
    // the measured form of the watermark-bounds-state claim: replaying
    // the identical corpus twice must NOT grow the dedup state — state
    // is keyed by content hash within the horizon, and duplicates add
    // no keys. An unbounded-state regression (e.g. reverting to plain
    // dropDuplicates with extra key columns) would double it.
    implicit val sc = spark.sqlContext
    def peakState(replays: Int): Long = {
      val input = MemoryStream[(Timestamp, Long, String)]
      val out = StreamingIngest.streamingDedup(
        input.toDF().toDF("ts", "doc_id", "text"), delay = "1 hour")
      val q = out.writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      try {
        val docs = (1 to 50).map(i => (ts(i % 60), i.toLong, s"document body number $i"))
        (1 to replays).foreach { r =>
          input.addData(docs.map { case (t, id, txt) => (t, id + r * 1000L, txt) }: _*)
          q.processAllAvailable()
        }
        q.recentProgress.iterator
          .map(p => p.stateOperators.map(_.numRowsTotal).sum)
          .foldLeft(0L)(math.max)
      } finally q.stop()
    }
    val once = peakState(1)
    val twice = peakState(2)
    assert(once == 50L, s"expected 50 distinct hashes in state, got $once")
    assert(twice == once, s"2x replay grew dedup state: $once -> $twice")
  }

  test("streamingCurate gates language and quality before the dedup state") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingIngest.streamingCurate(
      input.toDF().toDF("ts", "doc_id", "text"),
      lang = "en", minQuality = 0.3, delay = "1 hour")
    val q = out.writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts(1), 1L, "the quick brown fox jumps over the lazy dog and runs off with it"),
        (ts(2), 2L, "THE quick  brown fox jumps over the lazy dog and runs off with it"), // dup of 1
        (ts(3), 3L, "el perro que la casa con el gato que ladra"), // wrong language
        (ts(4), 4L, "is is is is is is is is is is is is")) // en but low quality
      q.processAllAvailable()
      val kept = spark.table("curate_out").select("doc_id").as[Long].collect().toSet
      assert(kept.size == 1 && (kept.contains(1L) ^ kept.contains(2L)),
        s"expected exactly one of the duplicate pair, got $kept")
    } finally q.stop()
  }

  test("stream-stream join matches within the time bound, drops beyond it") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val out = StreamingIngest.streamJoinWithin(
      clicks.toDF().toDF("user", "lts"),
      views.toDF().toDF("user", "rts"),
      key = "user", joinWindow = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, ts(20)), (2L, ts(20)))
      views.addData((1L, ts(15)), (2L, ts(45)), (3L, ts(20)))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select($"user", $"lts", $"rts").as[(Long, Timestamp, Timestamp)].collect()
      // user 1: 5 min apart → joins; user 2: 25 min apart → dropped;
      // user 3: no left side → dropped
      assert(rows.toSeq == Seq((1L, ts(20), ts(15))))
    } finally q.stop()
  }

  test("ingest appends a stream into the parquet store") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIngest.ingest(
      input.toDF().toDF("vec_id", "embedding"),
      s"$dir/data", s"$dir/ckpt").start()
    try {
      input.addData((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/data").count() == 2)
    } finally q.stop()
  }

  test("periodicIndexRefit persists a loadable ANN model per batch") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_refit").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIngest.periodicIndexRefit(
      input.toDF().toDF("vec_id", "embedding"),
      s"$dir/corpus", s"$dir/model", s"$dir/ckpt",
      interval = "0 seconds")
    try {
      val rng = new scala.util.Random(3)
      input.addData((1L to 20L).map(i => (i, Seq.fill(8)(rng.nextFloat()))): _*)
      q.processAllAvailable()
      val model = graft.index.Ann.load(s"$dir/model")
      assert(model.getNumHashTables > 0)
      assert(spark.read.parquet(s"$dir/corpus").count() == 20)
    } finally q.stop()
  }
}
