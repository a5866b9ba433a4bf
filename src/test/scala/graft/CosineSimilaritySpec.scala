package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityF32

class CosineSimilaritySpec extends SparkSpec {

  test("compute matches a straightforward double-precision reference within 1e-6") {
    val rnd = new scala.util.Random(42)
    (0 until 100).foreach { _ =>
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val got = CosineSimilarityF32.compute(a, b)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val ref = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
      assert(math.abs(got - ref) < 1e-5, s"got $got expected ~$ref")
    }
  }

  test("expression evaluates via SQL registration and survives codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (3L, Array(1f, 1f, 0f), Array(1f, 0f, 0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("cosine_f32(a, b)").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(out(1L) == 1f)
    assert(out(2L) == 0f)
    assert(math.abs(out(3L) - math.sqrt(0.5)) < 1e-6)
    // hot path must stay inside whole-stage codegen (no UDF fallback) —
    // check on a distributed plan (local relations bypass codegen entirely)
    def arr(mult: Int, mod: Int) = array((0 until 16).map(j =>
      (pmod(col("id") * mult + j, lit(mod)) / lit(mod.toDouble)).cast("float")): _*)
    val dist = spark.range(1000).select(arr(31, 97).as("a"), arr(17, 89).as("b"))
    val plan = dist.select(expr("cosine_f32(a, b)")).queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("md5_prefix_long equals the conv(substring(md5)) built-in chain and stays codegen'd") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val strs = (0 until 500).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString) :+
      "" :+ "a" :+ ("x" * 1000)
    val df = strs.toDF("s")
    Seq(1, 8, 15).foreach { k =>
      val rows = df.select(
          call_function("md5_prefix_long", col("s").cast("binary"), lit(k)).as("fast"),
          conv(substring(md5(col("s").cast("binary")), 1, k), 16, 10).cast("long").as("ref"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"k=$k mismatch: $r"))
    }
    // null propagates; the hot path stays inside whole-stage codegen
    assert(Seq(Option.empty[String]).toDF("s")
      .select(call_function("md5_prefix_long", col("s").cast("binary"), lit(8)))
      .collect().head.isNullAt(0))
    val dist = spark.range(1000).select(col("id").cast("string").cast("binary").as("b"))
    val plan = dist.select(call_function("md5_prefix_long", col("b"), lit(15)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
  }

  test("nulls propagate, mismatched types rejected") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 0f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(expr("cosine_f32(a, b)")).collect()
    assert(r.head.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_f32(array(1, 2), array('x'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_f32"))
  }

  test("dot_f32: f32-sequential accumulation, self-dot is the squared norm") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      var acc = 0f
      a.foreach(x => acc += x * x)
      assert(graft.functions.DotProductF32.compute(a, a) == acc)
    }
  }

  test("embeddingSanityCensus: dirty vectors counted, excluded from the envelope") {
    import spark.implicits._
    // unit vector / sub-unit / super-unit / zero / NaN / Inf — the NaN and
    // Inf rows must be counted but NOT poison the norm min/max
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.5f, 0.5f, 0f)),
      (3L, Array(1f, 1f, 1f)),
      (4L, Array(0f, 0f, 0f)),
      (5L, Array(Float.NaN, 1f, 0f)),
      (6L, Array(Float.PositiveInfinity, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val r = graft.operators.SimilarityOps.embeddingSanityCensus(df).collect().head
    assert(r.getLong(0) == 6L)                       // n_vecs
    assert((r.getLong(1), r.getLong(2)) == ((3L, 3L))) // dims
    assert(r.getLong(3) == 1L, "zero_vecs")
    assert(r.getLong(4) == 2L, "nonfinite_vecs")
    assert(r.getLong(5) == 0L, "min norm2 = the zero vector")
    assert(r.getLong(6) == 3000000000L, "max norm2 = 3.0")
    assert(r.getLong(7) == 2L, "sub-unit: 0.5 and the zero vector")
    assert(r.getLong(8) == 1L, "super-unit: 3.0")
  }
}
