package graft

import org.apache.spark.sql.functions._

/** Parity gate for the shuffle-free assignment kernel: `nearest_in_dir`
  * must reproduce the crossJoin + max_by(struct(csim, -cid)) argmax
  * bit-for-bit — including the float-total-order corners (NaN-sim zero
  * vectors, duplicate centroid vectors forcing the id tie-break) — because
  * the r13 assignment it replaced is what every gated similarity path's
  * oracle hashes were proven against. */
class NearestInDirSpec extends SparkSpec {

  private def maxByReference(
      vecs: Seq[(Long, Array[Float])],
      cents: Seq[(Long, Array[Float])]): Map[Long, (Long, Float)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cs = cents.toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    emb.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("cid"),
        call_function("cosine_f32", col("embedding"), col("cvec")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("csim")),
        struct(col("csim"), (-col("cid")).as("nc"))).as("w"))
      .select(col("vec_id"), col("w.cid"), col("w.csim"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2)))).toMap
  }

  private def kernel(
      vecs: Seq[(Long, Array[Float])],
      cents: Seq[(Long, Array[Float])]): Map[Long, (Long, Float)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val dir = cents.toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
      .agg(collect_list(struct(col("cid").as("id"), col("cvec").as("vec"))).as("dir"))
    emb.crossJoin(broadcast(dir))
      .select(col("vec_id"),
        call_function("nearest_in_dir", col("embedding"), col("dir")).as("w"))
      .select(col("vec_id"), col("w.id"), col("w.sim"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2)))).toMap
  }

  private def eq(a: Float, b: Float): Boolean =
    java.lang.Float.floatToIntBits(a) == java.lang.Float.floatToIntBits(b) ||
      (a.isNaN && b.isNaN)

  test("argmax parity with max_by on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val cents = (0L until 23L).map(i => (i * 3 + 1, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val ref = maxByReference(vecs, cents)
    val got = kernel(vecs, cents)
    assert(got.keySet == ref.keySet)
    ref.foreach { case (v, (cid, sim)) =>
      assert(got(v)._1 == cid, s"vec $v: cid ${got(v)._1} != $cid")
      assert(eq(got(v)._2, sim), s"vec $v: sim ${got(v)._2} != $sim")
    }
  }

  test("corners: zero vector (all-NaN sims) and duplicate centroids tie-break to min id") {
    val rnd = new scala.util.Random(11)
    val shared = Array.fill(8)(rnd.nextFloat())
    val vecs = Seq(
      (1L, Array.fill(8)(0f)),          // cosine NaN against everything
      (2L, shared.clone),               // exact tie between duplicate centroids
      (3L, Array.fill(8)(rnd.nextFloat())))
    val cents = Seq(
      (10L, shared.clone), (4L, shared.clone), // duplicates, min id 4 must win
      (7L, Array.fill(8)(rnd.nextFloat())))
    val ref = maxByReference(vecs, cents)
    val got = kernel(vecs, cents)
    assert(got(2L)._1 == 4L, s"duplicate-centroid tie must keep min cid: ${got(2L)}")
    vecs.map(_._1).foreach { v =>
      assert(got(v)._1 == ref(v)._1, s"vec $v: ${got(v)} vs ${ref(v)}")
      assert(eq(got(v)._2, ref(v)._2), s"vec $v: ${got(v)} vs ${ref(v)}")
    }
  }

  test("null and empty directories yield null; null entries are skipped") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val empty = emb.select(call_function("nearest_in_dir", col("embedding"),
      expr("CAST(array() AS array<struct<id: bigint, vec: array<float>>>)")).as("w"))
      .collect()
    assert(empty.head.isNullAt(0), "empty directory must yield null")
    val skipNull = emb.select(call_function("nearest_in_dir", col("embedding"),
      expr("array(named_struct('id', CAST(NULL AS bigint), 'vec', array(1.0f, 0.0f)), " +
        "named_struct('id', 5L, 'vec', array(1.0f, 0.0f)))")).as("w"))
      .select(col("w.id")).collect()
    assert(skipNull.head.getLong(0) == 5L, "null-id entries must be skipped")
  }

  test("directory memo survives per-row UnsafeArrayData wrappers (O(1) unpacks per partition)") {
    // Production shape: the directory sits in ONE broadcast UnsafeRow and
    // every streamed row reads it through a JoinedRow — each getArray call
    // allocates a FRESH UnsafeArrayData wrapper over the SAME bytes. An
    // eq-keyed memo misses on every row (round-15 ADVICE: whole-directory
    // re-unpack per row, ~2× kernel work at large k); the memo must key on
    // the wrapper's underlying (baseObject, baseOffset, sizeInBytes).
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val embType = ArrayType(FloatType, containsNull = false)
    val dirType = ArrayType(StructType(Array(
      StructField("id", LongType), StructField("vec", embType))))
    val rnd = new scala.util.Random(3)
    def vec(d: Int) = new GenericArrayData(Array.fill(d)(rnd.nextFloat()))
    val dirValue = new GenericArrayData((0 until 7).map(i =>
      new GenericInternalRow(Array[Any](i.toLong * 2 + 1, vec(8)))).toArray[Any])
    val dirProj = UnsafeProjection.create(Array[DataType](dirType))
    // one broadcast-side row, reused across every streamed row — as the
    // BroadcastHashJoin build side does
    val dirRow = dirProj(new GenericInternalRow(Array[Any](dirValue))).copy()
    val embProj = UnsafeProjection.create(Array[DataType](embType))
    val expr = graft.functions.NearestInDir(Seq(
      BoundReference(0, embType, nullable = true),
      BoundReference(1, dirType, nullable = true)))
    val results = (0 until 200).map { _ =>
      val left = embProj(new GenericInternalRow(Array[Any](vec(8)))).copy()
      expr.eval(new JoinedRow(left, dirRow))
    }
    assert(results.forall(_ != null))
    assert(expr.unpackCount == 1L,
      s"directory must unpack once per partition, not per row: ${expr.unpackCount}")
    // a genuinely DIFFERENT directory (fresh buffer) must re-unpack
    val dirRow2 = dirProj(new GenericInternalRow(Array[Any](dirValue))).copy()
    val left = embProj(new GenericInternalRow(Array[Any](vec(8)))).copy()
    expr.eval(new JoinedRow(left, dirRow2))
    assert(expr.unpackCount == 2L, "a new directory buffer must re-unpack")
  }

  test("reused row buffer with a rewritten directory must not serve a stale argmax") {
    // The NON-broadcast hazard (round-16 ADVICE): nearest_in_dir is a
    // public SQL function, so the directory column can arrive through a
    // reused UnsafeProjection/shuffle-deserialization buffer — consecutive
    // rows share (baseObject, baseOffset), and two different directories
    // of equal size would falsely hit a bare underlying-identity memo and
    // return the PREVIOUS directory's argmax silently. The memo's content
    // sample must catch the rewrite, and the detected reuse must
    // permanently downgrade the instance to the fail-safe re-unpack path.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val embType = ArrayType(FloatType, containsNull = false)
    val dirType = ArrayType(StructType(Array(
      StructField("id", LongType), StructField("vec", embType))))
    def dirOf(entries: (Long, Array[Float])*) = new GenericArrayData(entries.map {
      case (id, v) => new GenericInternalRow(Array[Any](id, new GenericArrayData(v)))
    }.toArray[Any])
    // same cardinality + dims => identical serialized size => buffer reuse
    // reproduces the same (base, offset, size) triple
    val dirA = dirOf((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
    val dirB = dirOf((1L, Array(0f, 1f)), (2L, Array(1f, 0f))) // swapped winners
    val dirProj = UnsafeProjection.create(Array[DataType](dirType))
    val embProj = UnsafeProjection.create(Array[DataType](embType))
    val expr = graft.functions.NearestInDir(Seq(
      BoundReference(0, embType, nullable = true),
      BoundReference(1, dirType, nullable = true)))
    val left = embProj(new GenericInternalRow(
      Array[Any](new GenericArrayData(Array(1f, 0f))))).copy()
    // NO .copy(): the projection's buffer is reused across apply() calls,
    // exactly like a streaming deserializer
    val rowA = dirProj(new GenericInternalRow(Array[Any](dirA)))
    val winA = expr.eval(new JoinedRow(left, rowA))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(1)
    assert(winA == 1L, s"dirA argmax for (1,0) must be id 1: $winA")
    val rowB = dirProj(new GenericInternalRow(Array[Any](dirB))) // rewrites the SAME buffer
    assert(rowB.getBaseObject eq rowA.getBaseObject, "test premise: buffer is reused")
    val winB = expr.eval(new JoinedRow(left, rowB))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(1)
    assert(winB == 2L, s"rewritten directory must win with id 2, not the stale memo: $winB")
    assert(expr.unpackCount == 2L, s"the rewrite must re-unpack: ${expr.unpackCount}")
    // downgraded instance keeps answering correctly (fail-safe re-unpacks)
    val rowA2 = dirProj(new GenericInternalRow(Array[Any](dirA)))
    val winA2 = expr.eval(new JoinedRow(left, rowA2))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(1)
    assert(winA2 == 1L, s"post-downgrade eval must stay exact: $winA2")
  }

  test("rotating window detects a rewrite that agrees on every FIXED sample position") {
    // The round-16 ADVICE scenario: two correlated directories sharing a
    // long common prefix/suffix, differing only in a small interior region
    // that 16 FIXED evenly-spaced sample words never landed on — the r16
    // guard would have served the stale argmax for the rest of the
    // partition. The round-17 rotating window sweeps the whole region
    // against the unpack-time snapshot, so ANY persistent difference is
    // detected within ⌈words/16⌉ consecutive rows, deterministically,
    // regardless of where it hides.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val embType = ArrayType(FloatType, containsNull = false)
    val dirType = ArrayType(StructType(Array(
      StructField("id", LongType), StructField("vec", embType))))
    def dirOf(entries: Seq[(Long, Array[Float])]) = new GenericArrayData(entries.map {
      case (id, v) => new GenericInternalRow(Array[Any](id, new GenericArrayData(v)))
    }.toArray[Any])
    // a large directory (region ≫ 16 words) where A and B differ in ONE
    // interior entry's vector only — same ids, same sizes, long shared
    // prefix AND suffix
    val rnd = new scala.util.Random(23)
    val base = (0 until 64).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val probe = Array.fill(8)(rnd.nextFloat() - 0.5f)
    // entry 40 of B is the probe direction itself (cosine 1.0 — a winner A
    // does not have), so a stale memo is observable the moment it persists
    val dirA = dirOf(base)
    val dirB = dirOf(base.updated(40, (40L, probe.clone)))
    val dirProj = UnsafeProjection.create(Array[DataType](dirType))
    val embProj = UnsafeProjection.create(Array[DataType](embType))
    val expr = graft.functions.NearestInDir(Seq(
      BoundReference(0, embType, nullable = true),
      BoundReference(1, dirType, nullable = true)))
    val left = embProj(new GenericInternalRow(
      Array[Any](new GenericArrayData(probe)))).copy()
    val rowA = dirProj(new GenericInternalRow(Array[Any](dirA)))
    val winA = expr.eval(new JoinedRow(left, rowA))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(1)
    val rowB = dirProj(new GenericInternalRow(Array[Any](dirB))) // same reused buffer
    assert(rowB.getBaseObject eq rowA.getBaseObject, "test premise: buffer is reused")
    val words = rowB.getArray(0).asInstanceOf[
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData].getSizeInBytes / 8
    val bound = (words + 15) / 16 + 1
    // within the deterministic sweep bound, the rewrite must be detected
    // (unpackCount bumps; the downgraded instance then re-unpacks per eval)
    var evals = 0
    while (expr.unpackCount < 2L && evals < bound) {
      expr.eval(new JoinedRow(left, rowB))
      evals += 1
    }
    assert(expr.unpackCount >= 2L,
      s"rotating window must detect the interior rewrite within $bound rows " +
        s"(evals $evals, unpacks ${expr.unpackCount})")
    val winB = expr.eval(new JoinedRow(left, rowB))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(1)
    assert(winB == 40L,
      s"post-detection argmax must be the rewritten directory's winner: $winB")
    assert(winA != 40L, "test premise: A's winner differs from B's")
  }
}
