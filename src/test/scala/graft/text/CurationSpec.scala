package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The end-to-end curation chain on a corpus with one planted rejection
  * per stage: wrong language, low quality, exact duplicate, and a
  * transitive near-duplicate chain that only the component closure
  * collapses to one survivor. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keepA =
    "the quick brown fox jumps over the lazy dog and runs far into the quiet forest"
  private val keepB =
    "a completely different story is told here with ships and harbors and the open sea wind"

  private lazy val docs = Seq(
    (1L, keepA),                                  // survives everything
    (2L, "  " + keepA.replace(" ", "  ") + " "),  // exact dup of 1 after normalization
    (3L, "el la de que con el la de que con el perro grande corre"), // wrong language
    (4L, Seq.fill(10)("the buffalo").mkString(" ")), // English but low quality (diversity 0.1)
    (5L, keepB),                                  // near-dup cluster, min id — kept
    (6L, keepB.replace("ships", "boats")),        // ~5
    (7L, keepB.replace("ships", "boats").replace("wind", "storm")) // ~6, transitively ~5
  ).toDF("doc_id", "text")

  test("curate keeps one representative per stage-violating group") {
    val kept = Curation.curate(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("curate at a permissive quality threshold still drops dups and language") {
    val kept = Curation.curate(docs, minQuality = 0.0)
      .select("doc_id").as[Long].collect().toSet
    // 4 survives the quality gate now; the dup groups still collapse
    assert(kept == Set(1L, 4L, 5L))
  }
}
