package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestSession

/** Property-based invariants of exact k-NN (SURVEY §5): results sorted
  * ascending by distance; result ids ⊆ corpus ids; |results| = min(k, n);
  * equality with a driver-side brute-force oracle for random corpora,
  * dims, and queries. (Raw ScalaCheck generators driven with fixed seeds
  * — the scalatestplus bridge isn't on the classpath.)
  */
class SearchPropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1000L + i)))

  private case class Corpus(dim: Int, rows: List[(Long, List[Float])], query: List[Float], k: Int)

  private val corpusGen: Gen[Corpus] = for {
    dim <- Gen.choose(1, 8)
    n <- Gen.choose(0, 30)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-8f, 8f)))
    query <- Gen.listOfN(dim, Gen.choose(-8f, 8f))
    k <- Gen.choose(1, 40)
  } yield Corpus(dim, vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, query, k)

  private def bruteForce(c: Corpus): Seq[(Long, Double)] =
    c.rows.map { case (id, v) =>
      val d = v.zip(c.query).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      }
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(c.k)

  test("exact kNN ≡ brute force; sorted; ids ⊆ corpus; |results| = min(k,n)") {
    samples(corpusGen, 30).foreach { c =>
      val df = c.rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
      val got = VectorSearch.knnExact(df, c.query, c.k)
        .as[(Long, Double)].collect().toSeq

      assert(got.size == math.min(c.k, c.rows.size))
      assert(got.map(_._2) == got.map(_._2).sorted)
      assert(got.map(_._1).toSet.subsetOf(c.rows.map(_._1).toSet))
      assert(got == bruteForce(c))
    }
  }

  test("k-NN join per-query results equal per-query exact search") {
    samples(corpusGen, 20).filter(_.rows.size >= 2).take(10).foreach { c =>
      val df = c.rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
      val queries = c.rows.take(2)
        .map { case (id, v) => (id, v.toArray) }.toDF("query_id", "q_embedding")
      val joined = VectorSearch.knnJoin(queries, df, k = c.k)
        .select("query_id", "vec_id", "dist")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      c.rows.take(2).foreach { case (qid, qv) =>
        val single = VectorSearch.knnExact(df, qv, c.k).as[(Long, Double)].collect().toSeq
        assert(joined(qid) == single)
      }
    }
  }
}
