package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomContainsLong, GraftFunctions}
import graft.operators.{CurationOps, PrepOps, SnapshotOps}

/**
 * The round-6 additions: the Bloom-prefiltered decontamination path (must
 * be output-identical to the exact broadcast path at ANY false-positive
 * rate), the PIVOT census, and the order-invariant corpus checksum.
 */
class BloomPrefilterSpec extends SparkSpec {

  // ------------------------------------------------ expression semantics

  test("bloom_contains_long: no false negatives, codegen and interpreted agree") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    val inserted = (0L until 500L).map(i => i * 2654435761L)
    inserted.foreach(bf.putLong)
    val bytes = BloomContainsLong.serialize(bf)

    // round-trip: the deserialized sketch answers identically
    val back = BloomContainsLong.deserialize(bytes)
    inserted.foreach(v => assert(back.mightContainLong(v), s"lost $v"))

    // through the engine (codegen path): every inserted hash passes
    import spark.implicits._
    val df = inserted.toDF("h")
    val kept = df.filter(GraftFunctions.bloomContainsLong(col("h"), bytes)).count()
    assert(kept == inserted.size, s"false negative: kept $kept of ${inserted.size}")

    // non-inserted values are MOSTLY rejected (fpp 0.01 on 500 probes —
    // allow a generous margin, the point is the filter actually filters)
    val absent = (1L to 500L).map(i => i * 40503L + 7L).toDF("h")
    val passed = absent.filter(GraftFunctions.bloomContainsLong(col("h"), bytes)).count()
    assert(passed < 50, s"filter not filtering: $passed of 500 absent values passed")

    // interpreted path (no codegen): same answers as codegen
    val e = BloomContainsLong(
      org.apache.spark.sql.catalyst.expressions.Literal(inserted.head), bytes)
    assert(e.eval(null) == true)
  }

  // ------------------------------- bloom path == exact path, any fpp

  /** Docs drawn from a small word pool so shingles genuinely collide
    * across documents (real overlap, not just hash noise). */
  private def randomCorpus(seed: Long, n: Int) = {
    val rng = new scala.util.Random(seed)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    docsOf((0 until n).map { i =>
      val len = 3 + rng.nextInt(10)
      val text = Seq.fill(len)(pool(rng.nextInt(pool.size))).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "de", s"src${i % 3}")
    }: _*)
  }

  test("bloom decontamination census == exact census across seeds and fpp") {
    for (seed <- Seq(1L, 2L, 3L); fpp <- Seq(0.03, 0.5)) {
      val corpus = randomCorpus(seed, 60)
      val exact = CurationOps.decontaminate(corpus, 7, 2)
        .collect().map(_.toString).toSeq
      val bloom = CurationOps.decontaminateBloom(corpus, 7, 2, fpp)
        .collect().map(_.toString).toSeq
      assert(bloom == exact, s"seed=$seed fpp=$fpp: bloom census diverges")
    }
  }

  test("bloom apply == exact apply: identical survivor sets, all columns kept") {
    val corpus = randomCorpus(11L, 50)
    val bench = corpus.filter(col("doc_id") % 5 === 0)
    val rest = corpus.filter(col("doc_id") % 5 =!= 0)
    val exactIds = CurationOps.decontaminateApply(rest, bench, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = CurationOps.decontaminateBloomApply(rest, bench, 2, 0.5)
    assert(bloomed.columns.toSeq == rest.columns.toSeq)
    val bloomIds = bloomed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomIds == exactIds,
      s"missing=${exactIds -- bloomIds} extra=${bloomIds -- exactIds}")
  }

  test("bloom prefilter sits in the plan as a row-local Filter") {
    val corpus = randomCorpus(21L, 40)
    val plan = CurationOps.decontaminateBloom(corpus, 7, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains_long"),
      s"prefilter missing from plan:\n$plan")
  }

  // ------------------------------------------------------------- pivot

  test("langPivotCensus: cells match manual counts, absent cells are 0") {
    val corpus = docsOf(
      (1L, "a b c", "en", "s1"), (2L, "d e f", "en", "s1"),
      (3L, "g h i", "de", "s1"), (4L, "j k l", "zh", "s2"))
    val rows = PrepOps.langPivotCensus(corpus).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val s1 = rows(0)
    // columns: source, de, en, es, fr, zh
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(4), s1.getLong(5))
      == ((1L, 2L, 0L, 0L, 0L)))
    val s2 = rows(1)
    assert((s2.getLong(1), s2.getLong(2), s2.getLong(5)) == ((0L, 0L, 1L)))
  }

  // ---------------------------------------------------------- checksum

  test("corpusChecksum is invariant under partitioning and row order") {
    val corpus = randomCorpus(31L, 40)
    val base = SnapshotOps.corpusChecksum(corpus).collect().map(_.toString).toSeq
    val shuffled = SnapshotOps.corpusChecksum(
      corpus.orderBy(rand(42)).repartition(7)).collect().map(_.toString).toSeq
    assert(shuffled == base, "checksum depends on layout")
  }

  test("corpusChecksum catches content edits and id remaps") {
    val corpus = randomCorpus(41L, 20)
    val base = SnapshotOps.corpusChecksum(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // flip one character in one doc: that lang's xor must change
    val edited = corpus.withColumn("text",
      when(col("doc_id") === 4L, concat(col("text"), lit("x"))).otherwise(col("text")))
    val ed = SnapshotOps.corpusChecksum(edited).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ed("en") != base("en") && ed("de") == base("de"))
    // remap one id keeping content: xor must change (id is bound into hash)
    val remapped = corpus.withColumn("doc_id",
      when(col("doc_id") === 4L, 999L).otherwise(col("doc_id")))
    val rm = SnapshotOps.corpusChecksum(remapped).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rm("en") != base("en"))
  }
}
