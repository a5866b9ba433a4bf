package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler
import graft.operators.DedupOps

/** The Jaro–Winkler expression (x95) against the published worked examples
  * and the DuckDB-probed edge semantics, plus the census operator fixture. */
class JaroWinklerSpec extends SparkSpec {

  test("compute: textbook pairs match DuckDB jaro_winkler_similarity bit-for-bit") {
    // Values probed against DuckDB 1.x this round (docs/BENCH_notes_r7.md):
    assert(JaroWinkler.compute("martha", "marhta") == 0.9611111111111111)
    assert(JaroWinkler.compute("dixon", "dicksonx") == 0.8133333333333332)
    assert(JaroWinkler.compute("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(JaroWinkler.compute("dwayne", "duane") == 0.8400000000000001)
    assert(JaroWinkler.compute("x", "xyz") == 0.7999999999999999)
    assert(JaroWinkler.compute("abc", "abc") == 1.0)
  }

  test("compute: edge semantics — empties, boost threshold, window floor") {
    // DuckDB returns 0 for ANY empty side, two empties included.
    assert(JaroWinkler.compute("", "") == 0.0)
    assert(JaroWinkler.compute("", "abc") == 0.0)
    // The Winkler boost applies only when jaro EXCEEDS 0.7: these share a
    // prefix but sit at/below the threshold, so the raw jaro survives.
    assert(JaroWinkler.compute("aq", "az") == 0.6666666666666666)
    assert(JaroWinkler.compute("abcdqqqqqq", "abcdzzzzzz") == 0.6)
    // window = max(l,l)/2 - 1 floored at 0: adjacent swaps at length 2
    // cannot match at all (DuckDB agrees: 0, not a transposition).
    assert(JaroWinkler.compute("ab", "ba") == 0.0)
    // no-boost case above the threshold (prefix 0): raw jaro unchanged
    assert(JaroWinkler.compute("crate", "trace") == 0.7333333333333334)
  }

  test("jaro_winkler: registered SQL form runs codegen'd and null-safe") {
    val df = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS a, " +
        "jaro_winkler('ab', CAST(NULL AS STRING)) AS b")
    val r = df.collect().head
    assert(r.getDouble(0) == 0.9611111111111111 && r.isNullAt(1), r.toString)
  }

  test("jaroPairsCensus: blocked histogram, equal-head fast path lands on 1e6 micro") {
    val docs = docsOf(
      (1L, "alpha bravo candy delta", "en", "s"),
      (2L, "alpha bravo candy delat", "en", "s"), // transposed tail: JW-near
      (3L, "alpha bravo candy delta", "en", "s"),
      (4L, "zetas bravo candy delta", "en", "s"), // different block: excluded
      (5L, "single", "en", "s")) // <2 tokens: excluded
    val jw12 = JaroWinkler.compute("alpha bravo candy delta", "alpha bravo candy delat")
    val m12 = math.floor(jw12 * 1e6 + 0.5).toLong
    val rows = DedupOps.jaroPairsCensus(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((m12, 2L, 2L, 2L), (1000000L, 1L, 1L, 1L)),
      s"m12=$m12: ${rows.mkString(",")}")
  }
}
