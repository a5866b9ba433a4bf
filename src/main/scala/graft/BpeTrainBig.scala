package graft

/**
 * Train the TRAINER-SCALE merge table: `runMain graft.BpeTrainBig <outFile>
 * [nMerges]` (default 8192) — the artifact behind
 * [[graft.operators.BpeOps.bigMerges]].
 *
 * The gate corpus is a ~31-word synthetic vocabulary, so real training on
 * it exhausts after a few dozen merges (the checked-in 40-merge table IS
 * its fixpoint); a trainer-real vocabulary needs a trainer-real corpus.
 * This main generates one deterministically: a seeded syllable grammar
 * (onset·nucleus·coda, the structure that gives BPE genuine merge signal)
 * emits 50k distinct words on a Zipf count curve, and
 * [[graft.operators.BpeOps.trainMergesFromHistogram]] trains on that
 * histogram with the same determinism rules as the small table (weight
 * desc, pair asc ties). Re-running reproduces the resource byte-for-byte —
 * the tokenizer stays a versioned artifact, like the 40-merge one.
 *
 * Training is driver-side over the bounded histogram by design (the
 * standard practice at any corpus scale — the distributed work is only the
 * word histogram, see [[graft.operators.BpeOps.trainMerges]]); with the
 * incremental trainer, 8k merges over 50k words complete in seconds.
 */
object BpeTrainBig {

  /** Deterministic synthetic word histogram: `nWords` distinct
    * syllable-grammar words, Zipf-weighted. */
  def syntheticHistogram(nWords: Int = 50000, seed: Long = 42L): Seq[(String, Long)] = {
    val rnd = new java.util.Random(seed)
    val onsets = Vector("b", "c", "d", "f", "g", "h", "j", "k", "l", "m",
      "n", "p", "qu", "r", "s", "t", "v", "w", "z", "br", "ch", "cl", "cr",
      "dr", "fl", "fr", "gl", "gr", "pl", "pr", "sc", "sh", "sk", "sl",
      "sm", "sn", "sp", "st", "str", "sw", "th", "tr", "tw", "wh")
    val nuclei = Vector("a", "e", "i", "o", "u", "ai", "au", "ea", "ee",
      "ei", "ie", "io", "oa", "oo", "ou", "ue", "y")
    val codas = Vector("", "b", "ck", "d", "f", "g", "k", "l", "ll", "m",
      "n", "nd", "ng", "nk", "nt", "p", "r", "rd", "rn", "rt", "s", "sh",
      "ss", "st", "t", "th", "x", "z")
    def syllable(): String =
      onsets(rnd.nextInt(onsets.size)) + nuclei(rnd.nextInt(nuclei.size)) +
        codas(rnd.nextInt(codas.size))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < nWords) {
      val n = 1 + rnd.nextInt(4)
      seen += (1 to n).map(_ => syllable()).mkString
    }
    seen.toSeq.zipWithIndex.map { case (w, rank) =>
      (w, math.max(2L, (nWords.toLong * 4) / (rank + 1)))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeTrainBig <outFile> [nMerges]")
    val nMerges = if (args.length > 1) args(1).toInt else 8192
    val t0 = System.nanoTime()
    val merges = graft.operators.BpeOps.trainMergesFromHistogram(
      syntheticHistogram(), nMerges)
    val secs = (System.nanoTime() - t0) / 1e9
    graft.functions.BpeSegment.writeArtifact(merges, args(0))
    println(f"wrote ${merges.length} merges to ${args(0)} (trained in $secs%.1f s)")
  }
}
