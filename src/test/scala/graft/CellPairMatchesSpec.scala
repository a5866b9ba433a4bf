package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarityF32
import graft.operators.SimilarityOps

/**
 * The blocked candidate kernel (`cell_pair_matches`,
 * [[graft.functions.CellPairMatchesF32]]): bit-parity with the scalar
 * cosine expression, and the prefilter-margin contract that lets the exact
 * round6f threshold filter stay in Column space.
 */
class CellPairMatchesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def vecs(seed: Int, n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("kernel sims are bit-identical to CosineSimilarityF32 on random cells") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val data = vecs(42, 60, 64)
    val df = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // same-cell: pack everything into one cell, ask for EVERY pair (minSim
    // -2 disables the prefilter), compare against the scalar expression
    val packed = df.agg(
      collect_list(struct(col("vec_id"), col("embedding"))).as("cell"))
    val got = packed
      .select(explode(call_function("cell_pair_matches",
        col("cell"), col("cell"), lit(-2.0), lit(true))).as("m"))
      .select(col("m.vec_a"), col("m.vec_b"), col("m.sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getFloat(2)).toMap
    val byId = data.toMap
    assert(got.size == 60 * 59 / 2, s"expected all pairs, got ${got.size}")
    got.foreach { case ((a, b), s) =>
      val want = CosineSimilarityF32.compute(byId(a), byId(b))
      assert(java.lang.Float.floatToRawIntBits(s) ==
        java.lang.Float.floatToRawIntBits(want),
        s"pair ($a,$b): kernel $s != scalar $want")
    }
  }

  test("cross-cell kernel orients every pair (min id, max id) and covers the cross product") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val left = vecs(1, 7, 16)
    val right = vecs(2, 5, 16).map { case (i, v) => (i + 100L, v) }
    val l = left.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ca"))
    val r = right.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("cb"))
    val got = l.crossJoin(r)
      .select(explode(call_function("cell_pair_matches",
        col("ca"), col("cb"), lit(-2.0), lit(false))).as("m"))
      .select(col("m.vec_a"), col("m.vec_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.size == 7 * 5)
    assert(got.forall { case (a, b) => a < b && a < 100L && b >= 100L })
  }

  test("cross-cell kernel at SAXPY width is bit-identical to the scalar expression") {
    // Both cells wide enough (≥ 16) that the cross path takes the
    // transposed outer-product form — the round-13 SIMD kernel — whose
    // per-pair op order must reproduce the scalar chain exactly.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val left = vecs(21, 48, 64)
    val right = vecs(22, 40, 64).map { case (i, v) => (i + 1000L, v) }
    val l = left.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ca"))
    val r = right.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("cb"))
    val got = l.crossJoin(r)
      .select(explode(call_function("cell_pair_matches",
        col("ca"), col("cb"), lit(-2.0), lit(false))).as("m"))
      .select(col("m.vec_a"), col("m.vec_b"), col("m.sim")).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getFloat(2)).toMap
    assert(got.size == 48 * 40)
    val byId = (left ++ right).toMap
    got.foreach { case ((a, b), s) =>
      val want = CosineSimilarityF32.compute(byId(a), byId(b))
      assert(java.lang.Float.floatToRawIntBits(s) ==
        java.lang.Float.floatToRawIntBits(want),
        s"pair ($a,$b): kernel $s != scalar $want")
    }
  }

  test("a raw sim just BELOW threshold that round6f lifts to threshold still surfaces") {
    // The exactness contract: kernel prefilters at threshold - 1e-6 and the
    // Column-space round6f filter decides. Search float space for a genuine
    // boundary witness — a pair whose raw f32 cosine is < t while
    // round-to-6-places reaches t — then assert the bucketed path (which
    // routes through the kernel) and the brute path agree on it.
    val t = 0.4
    // candidate x values just under 0.4; with a = (1,0) and b = (x, y),
    // y = sqrt(1-x²), the f32 cosine is x / sqrt(x²+y²)f ≈ x — walk float
    // space downward until the COMPUTED sim sits in the half-up band
    // [t − 5e-7, t): raw below threshold, rounded at it.
    val witness = Iterator.iterate(0.4f)(java.lang.Math.nextDown)
      .take(3000)
      .map { x =>
        val y = math.sqrt(1.0 - x.toDouble * x.toDouble).toFloat
        (Array(x, y), CosineSimilarityF32.compute(Array(1f, 0f), Array(x, y)))
      }
      .find { case (_, s) =>
        s < t && (math.round(s.toDouble * 1e6) / 1e6).toFloat.toDouble >= t }
    assert(witness.isDefined, "no boundary float found near 0.4")
    val (bvec, rawSim) = witness.get
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, bvec), (2L, Array(-1f, 0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val brute = SimilarityOps.embeddingNearDupBrute(df, t)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // centroid = vec 0 (mod 3 picks id 0): one cell, same-cell kernel path
    val bucketed = SimilarityOps.embeddingNearDup(df, t, centroidMod = 3)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((0L, 1L)),
      s"witness pair raw=$rawSim must pass the rounded threshold")
    assert(bucketed == brute, s"bucketed $bucketed != brute $brute")
  }

  test("a degenerate one-cell corpus larger than the 4096 block bound still matches brute force") {
    // The audit path's packed-row width bound (round 12): a corpus whose
    // vectors all land in ONE cell must pack per (cid, block), never one
    // O(n·dim) row — and the block-pair enumeration (same arm within a
    // block, cross arm across canonical block pairs) must reproduce the
    // brute-force pair set exactly.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val n = 4500 // > 4096 → two id-mod blocks
    val data = vecs(7, n, 4)
    val df = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val t = 0.95
    // single centroid → every vector assigns to one cell
    val oneCent = df.filter(col("vec_id") === 0)
      .select(lit(0L).as("cid"), col("embedding").as("cvec"))
    val bucketed = SimilarityOps.embeddingNearDupWith(df, t, oneCent)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityOps.embeddingNearDupBrute(df, t)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must produce qualifying pairs")
    assert(bucketed == brute,
      s"blocked mega-cell diverged: ${bucketed.size} vs ${brute.size} pairs")
  }

  test("a zero vector's NaN sim never clears the prefilter, in blocked body and scalar tail alike") {
    // cos(zero, x) = 0/0 = NaN; the Column path's round6f(NaN) fails any
    // threshold, so the kernel must drop such pairs even at minSim = -2.
    // Nine vectors with the zero at index 4 puts NaN pairs in both the
    // 4-blocked body and the <4 scalar tail of the j sweep.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val data = vecs(11, 9, 8).map { case (i, v) =>
      if (i == 4L) (i, Array.fill(8)(0f)) else (i, v) }
    val df = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val packed = df.agg(
      collect_list(struct(col("vec_id"), col("embedding"))).as("cell"))
    val got = packed
      .select(explode(call_function("cell_pair_matches",
        col("cell"), col("cell"), lit(-2.0), lit(true))).as("m"))
      .select(col("m.vec_a"), col("m.vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == 8 * 7 / 2, s"expected C(8,2) non-NaN pairs, got ${got.size}")
    assert(got.forall { case (a, b) => a != 4L && b != 4L },
      s"a NaN pair surfaced: $got")
  }

  test("null embeddings are SKIPPED (drop-the-pair), not an NPE — the cos null-propagation contract") {
    // The Column path the kernel replaced computed cos(emb_a, emb_b) per
    // candidate; cos is null-intolerant, so a null embedding silently
    // excluded every pair touching it. The kernel must preserve that.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      Row(0L, Seq(1f, 0f)), Row(1L, null), Row(2L, Seq(1f, 0f)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val packed = df.agg(
      collect_list(struct(col("vec_id"), col("embedding"))).as("cell"))
    val got = packed
      .select(explode(call_function("cell_pair_matches",
        col("cell"), col("cell"), lit(-2.0), lit(true))).as("m"))
      .select(col("m.vec_a"), col("m.vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the (0, 2) pair survives; every pair touching vec 1 is dropped
    assert(got == Set((0L, 2L)), s"expected {(0,2)}, got $got")
  }
}
