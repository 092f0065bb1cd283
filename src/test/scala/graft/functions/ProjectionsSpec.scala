package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ProjectionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sign table is deterministic ±1 and roughly balanced") {
    val table = for (i <- 0 until 16; j <- 0 until 64) yield Projections.sign(i, j, 64)
    assert(table.forall(s => s == 1 || s == -1))
    val pos = table.count(_ == 1)
    assert(pos > 400 && pos < 624, s"sign table badly skewed: $pos of 1024 positive")
    assert(table == (for (i <- 0 until 16; j <- 0 until 64) yield Projections.sign(i, j, 64)))
  }

  test("signProjectMicro equals a manual left-associative fold") {
    val v = Array.tabulate(8)(j => (j + 1) * 0.25f)
    val df = Seq(Tuple1(v)).toDF("embedding")
    val got = (0 until 4).map { i =>
      df.select(Projections.signProjectMicro(col("embedding"), i, 8)).as[Long].head()
    }
    val want = (0 until 4).map { i =>
      var s = 0.0
      for (j <- 0 until 8) {
        val e = v(j).toDouble
        s += (if (Projections.sign(i, j, 8) > 0) e else -e)
      }
      math.floor(s * 1e6).toLong
    }
    assert(got == want)
  }

  test("projection roughly preserves relative distances (JL sanity)") {
    val rng = new scala.util.Random(11)
    val vecs = Seq.fill(6)(Array.fill(64)(rng.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val projCols = (0 until 16).map(i =>
      Projections.signProjectMicro(col("embedding"), i, 64).as(s"p$i"))
    val proj = df.select((col("vec_id") +: projCols): _*).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => val d = (x - y) / 1e6; d * d }.sum
    def o2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    // sign projections scale squared distances by ~16 in expectation
    // (sum over 16 ±1 rows); check every pair lands within a loose band
    for (i <- 0 until 6; j <- (i + 1) until 6) {
      val ratio = d2(proj(i.toLong), proj(j.toLong)) / (16.0 * o2(vecs(i), vecs(j)))
      assert(ratio > 0.2 && ratio < 5.0, s"pair ($i,$j) distorted by $ratio")
    }
  }
}
