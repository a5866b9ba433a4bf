package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/**
 * Measurement main (test scope — run with `sbt "Test/runMain
 * graft.functions.KernelMicro [cellSize] [nCalls]"`): times the
 * cell_pair_matches kernel's object-level entry points on packed cells
 * shaped like the 60×-distinct probe (√n ≈ 350-member cells, 64 dims),
 * bypassing Spark so the number is the kernel alone (unpack + dots +
 * emission). Source of the GFLOP/s table in BENCH_notes_r13 §1b.
 */
object KernelMicro {
  def main(args: Array[String]): Unit = {
    val dim = 64
    val cellSize = args.headOption.map(_.toInt).getOrElse(350)
    val nCalls = if (args.length > 1) args(1).toInt else 200
    val rnd = new scala.util.Random(42)
    def mkCell(n: Int, base: Long): GenericArrayData =
      new GenericArrayData((0 until n).map { i =>
        val v: Array[Any] =
          Array.fill(dim)(Float.box(rnd.nextFloat() * 2f - 1f))
        new GenericInternalRow(Array[Any](base + i,
          new GenericArrayData(v))): Any
      }.toArray)
    val cellsA = Array.tabulate(8)(i => mkCell(cellSize, i * 1000L))
    val cellsB = Array.tabulate(8)(i => mkCell(cellSize, 100000L + i * 1000L))
    def run(minSim: Double): (Double, Long) = {
      var matches = 0L
      val t0 = System.nanoTime()
      var c = 0
      while (c < nCalls) {
        val a = CellPairMatchesF32.unpack(cellsA(c % 8))
        val b = CellPairMatchesF32.unpack(cellsB(c % 8))
        matches += CellPairMatchesF32.matchesCross(a, b, minSim).numElements()
        c += 1
      }
      ((System.nanoTime() - t0) / 1e9, matches)
    }
    run(0.4); run(0.4) // JIT warmup
    val (sec, matches) = run(0.4)
    val flops = 2.0 * dim * cellSize.toLong * cellSize * nCalls
    println(f"cells=$cellSize%d calls=$nCalls%d time=$sec%.3fs " +
      f"matches=$matches%d gflops=${flops / sec / 1e9}%.2f")
  }
}
