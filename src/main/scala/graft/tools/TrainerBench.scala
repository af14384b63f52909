package graft.tools

import graft.ops.BpeOps

/** One-shot timing of the BPE trainer implementations at vocab-scale
  * merge counts — the number that justifies the incremental trainer
  * (the corpus pass is identical; only the driver merge loop
  * differs, so this is a pure driver benchmark).
  *
  * Usage: `sbt "runMain graft.tools.TrainerBench [nMerges]"`.
  */
object TrainerBench {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.nonEmpty) args(0).toInt else 2000
    // the fixture corpus holds only ~31 word types, far below a real
    // trainer dictionary — synthesize a deterministic Zipfian 50k-type
    // dictionary (lengths 3-12, 26-letter alphabet) instead, the scale
    // the 64Ki-truncated fitDictionary would actually deliver
    val rnd = new scala.util.Random(7)
    // dedupe by WORD (summing counts) — short words collide across
    // draws, and a plain .distinct on (word, count) pairs would keep
    // both copies, so the "N word types" line would overcount and one
    // surface word would feed the trainers as two dictionary entries
    val dict = (0 until 50000).map { i =>
      val w = Array.fill(3 + rnd.nextInt(10))(
        ('a' + rnd.nextInt(26)).toChar).mkString
      w -> math.max(1L, (1e7 / (i + 10)).toLong)
    }.groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }
      .toSeq.sortBy(_._1)
    println(s"[trainer-bench] dictionary: ${dict.size} word types, " +
      s"${dict.map(_._1.length).sum} symbols")
    def time(tag: String)(body: => Seq[_]): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[trainer-bench] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (${out.size} merges)")
    }
    // warm both paths once at a small merge count
    BpeOps.fitFromCounts(dict, 50)
    BpeOps.fitFromCountsReference(dict, 50)
    time(s"incremental nMerges=$nMerges")(
      BpeOps.fitFromCounts(dict, nMerges))
    time(s"reference   nMerges=$nMerges")(
      BpeOps.fitFromCountsReference(dict, nMerges))
  }
}
