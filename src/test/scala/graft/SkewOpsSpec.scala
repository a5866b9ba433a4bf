package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong))
      .toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("name")).collect().map(_.toString).sorted
    val salted = SkewOps.saltedJoin(fact, dim, "k", "dk", saltBuckets = 8)
      .select(col("k"), col("v"), col("name")).collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("skew profile surfaces the hot key first") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (if (i % 5 == 0) i.toLong % 3 else 42L, i))
      .toDF("k", "v")
    val top = SkewOps.keySkewProfile(fact, col("k")).collect()
    assert(top.head.get(0) == 42L)
    assert(top.head.getLong(1) == 800L)
  }
}
