package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench-output contract: the consumer of Bench's stdout sees only
  * the last ~2000 characters and parses the LAST line as JSON. Rounds
  * 1–5 all failed this silently — the single ~4 KB detail line
  * truncated mid-dict and never parsed — so the contract is pinned here
  * by simulating the consumer exactly: full stdout, take the last 2000
  * chars, take the last line, json-parse it.
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Every declared query at a worst-case (6-digit-seconds) timing —
    * the real name set, so the test tracks query-surface growth. */
  private def worstCase: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(k => k -> 99999.999)

  test("final stdout line survives tail -c 2000 + JSON parse with every declared query") {
    val summary = Bench.summaryLine(99999.999, 99999.999, worstCase, "/root/testdata/sf0.1", 3)
    assert(summary.getBytes("UTF-8").length <= Bench.MaxSummaryBytes,
      s"summary line over budget: ${summary.length} bytes")
    val detail = Bench.detailLine(99999.999, 99999.999,
      worstCase.map { case (k, v) => k -> (v, v) }, "/root/testdata/sf0.1", 3)
    val stdout = detail + "\n" + summary + "\n"
    val tail = stdout.substring(math.max(0, stdout.length - 2000))
    val lastLine = tail.linesIterator.toSeq.last
    val node = mapper.readTree(lastLine) // throws on truncated JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").asDouble() > 0.0)
    assert(node.get("n_queries").asInt() == SparkEntry.queries.size)
  }

  test("per-query warm dict rides along whenever it fits the byte cap") {
    val few = Seq("q1_agg" -> 0.512, "q2_join" -> 1.25)
    val line = Bench.summaryLine(1.762, 3.5, few, "sf0.1", 3)
    val node = mapper.readTree(line)
    assert(node.get("queries") != null, s"dict dropped though it fits: $line")
    assert(node.get("queries").get("q1_agg").asDouble() == 0.512)
  }

  test("dict is dropped, not truncated, when it would blow the cap") {
    val many = (1 to 500).map(i => s"query_with_a_quite_long_name_$i" -> 1.234)
    val line = Bench.summaryLine(617.0, 1234.0, many, "sf0.1", 3)
    assert(line.getBytes("UTF-8").length <= Bench.MaxSummaryBytes)
    val node = mapper.readTree(line) // still valid JSON
    assert(node.get("queries") == null)
    assert(node.get("n_queries").asInt() == 500)
  }
}
