package graft

import graft.ops.PipeOps

/** Pipe operator semantics (reference: runStreamingMapReduce,
  * MapReduceWSIImpl.java:132-211): external scripts over line records
  * with a key-grouped, sorted reduce stage.
  */
class PipeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pipeMap runs an external script over each partition's lines") {
    val lines = spark.sparkContext.parallelize(Seq("a", "b", "c"), 2)
    val out = PipeOps.pipeMap(spark, lines,
      "#!/bin/sh\nexec tr 'a-z' 'A-Z'\n", "upper_mapper").collect().sorted
    assert(out === Array("A", "B", "C"))
  }

  test("pipeMapReduce: word count via awk mapper+reducer") {
    val lines = spark.sparkContext.parallelize(
      Seq("dog cat", "cat dog dog", "bird"), 3)
    val mapper = "#!/bin/sh\nexec awk '{ for (i = 1; i <= NF; i++) printf \"%s\\t1\\n\", $i }'\n"
    val reducer = "#!/bin/sh\nexec awk -F'\\t' '\n" +
      "  NR == 1 { k = $1 }\n" +
      "  $1 != k { printf \"%s\\t%d\\n\", k, s; k = $1; s = 0 }\n" +
      "  { s += $2; n++ }\n" +
      "  END { if (n > 0) printf \"%s\\t%d\\n\", k, s }'\n"
    val out = PipeOps.pipeMapReduce(spark, lines, mapper, reducer)
      .collect().map { l => val p = l.split("\t"); p(0) -> p(1).toInt }.toMap
    assert(out === Map("dog" -> 3, "cat" -> 2, "bird" -> 1))
  }

  test("scripts without a shebang are rejected (reference contract)") {
    val lines = spark.sparkContext.parallelize(Seq("x"))
    intercept[IllegalArgumentException] {
      PipeOps.pipeMap(spark, lines, "awk '{print}'", "bad_script")
    }
  }
}
