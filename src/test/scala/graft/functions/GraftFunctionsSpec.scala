package graft.functions

import org.apache.spark.sql.graft.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("registered SQL functions evaluate the codegen kernels") {
    GraftFunctions.register(spark)
    Seq((Array(1f, 2f), Array(2f, 4f))).toDF("a", "b").createOrReplaceTempView("vecs")

    val dist = spark.sql("SELECT l2sq(a, b) FROM vecs").as[Double].head()
    assert(dist == 5.0)
    val dot = spark.sql("SELECT vec_dot(a, b) FROM vecs").as[Double].head()
    assert(dot == 10.0)

    val sh = spark.sql("SELECT word_shingles(array('x','y','z','w'), 3)")
      .as[Seq[String]].head()
    assert(sh == Seq("x y z", "y z w"))

    val sig1 = spark.sql("SELECT simhash64(array('a','b','c'))").as[Long].head()
    val sig2 = spark.sql("SELECT simhash64(array('a','b','c'))").as[Long].head()
    assert(sig1 == sig2)

    val mh = spark.sql("SELECT minhash(array('s1','s2'), 4)").as[Seq[Long]].head()
    assert(mh.length == 4)

    val srp = spark.sql("SELECT srp_sign(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 128)")
      .as[Seq[Long]].head()
    assert(srp.length == 2)

    // winnowing guarantee: identical text → identical fingerprint set
    val fp = spark.sql("SELECT winnow_fingerprints('the quick brown fox jumps', 8, 4)")
      .as[Seq[Long]].head()
    val fp2 = spark.sql("SELECT winnow_fingerprints('the quick brown fox jumps', 8, 4)")
      .as[Seq[Long]].head()
    assert(fp.nonEmpty && fp == fp2)

    val langs = spark.sql(
      "SELECT lang_id('the cat and the dog'), lang_id('el que la con'), lang_id('xyz')")
      .as[(String, String, String)].head()
    assert(langs == (("en", "es", "und")))

    val q = spark.sql("SELECT quality_score('the quick brown fox and the lazy dog')")
      .as[Double].head()
    assert(q > 0.0 && q <= 1.0)

    // "a b a b a": 2-grams [ab, ba, ab, ba] → dup 1/2, top 1/2;
    // 3-grams [aba, bab, aba] → dup 1/3
    val rep = spark.sql(
      "SELECT r.dup_2gram_frac, r.top_2gram_frac, r.dup_3gram_frac " +
        "FROM (SELECT repetition_stats(array('a','b','a','b','a')) AS r)")
      .as[(Double, Double, Double)].head()
    assert(rep == ((0.5, 0.5, 1.0 - 2.0 / 3.0)))
  }

  test("non-literal k in minhash raises a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(array('s'), CAST(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
