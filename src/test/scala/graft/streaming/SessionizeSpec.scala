package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("sessions close on the inactivity gap and count their events") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30 * 60 * 1000L,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two bursts separated by > 30 min (the second closes the
      // first inside one batch); user 2: a single event
      input.addData(
        Event(1L, ts(10, 0), "view"), Event(1L, ts(10, 5), "click"), Event(1L, ts(10, 20), "click"),
        Event(1L, ts(12, 0), "view"),
        Event(2L, ts(10, 0), "view"))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").as[Session].collect()
      // user 1's first burst closes on the in-batch gap; user 2's lone
      // session closes via EventTimeTimeout (watermark reached 12:00)
      assert(sessions.length == 2)
      val s1 = sessions.find(_.user_id == 1L).get
      assert(s1.n_events == 3 && s1.duration_sec == 1200.0)
      assert(s1.start == ts(10, 0) && s1.end == ts(10, 20))
      val s2 = sessions.find(_.user_id == 2L).get
      assert(s2.n_events == 1 && s2.duration_sec == 0.0)

      // advance the watermark past user-1's open-session timeout
      input.addData(Event(3L, ts(23, 0), "view"))
      q.processAllAvailable()
      input.addData(Event(3L, ts(23, 1), "view"))
      q.processAllAvailable()
      val after = spark.table("sessions_out").as[Session].collect()
      assert(after.exists(s => s.user_id == 1L && s.start == ts(12, 0) && s.n_events == 1))
    } finally q.stop()
  }
}
