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

  test("reference-parity: inline Python mapper/reducer over the golden fixture") {
    // The reference ships Python source strings for Hadoop Streaming
    // (reference: EndToEndTest.java:84-98: mapper splits CSV and emits
    // (idx, val); reducer uses itertools.groupby over the sorted
    // stream and applies the exact-mean tripwire). Same scripts, our
    // pipe operator, golden expectation: every mean exactly 3.
    val mapper =
      """#!/usr/bin/env python3
        |import sys
        |for line in sys.stdin:
        |    parts = line.strip().split(',')
        |    for i, p in enumerate(parts):
        |        print(f"{i}\t{int(p)}")
        |""".stripMargin
    val reducer =
      """#!/usr/bin/env python3
        |import sys, itertools
        |pairs = (l.rstrip('\n').split('\t') for l in sys.stdin)
        |for key, grp in itertools.groupby(pairs, key=lambda kv: kv[0]):
        |    vals = [int(v) for _, v in grp]
        |    s, c = sum(vals), len(vals)
        |    print(f"{key}\t{s // c - (s % c) * 100}")
        |""".stripMargin
    val n = 7 * 40
    val lines = spark.sparkContext.parallelize(
      (0 until n).map(b => (0 to 6).map(i => (b + i) % 7).mkString(",")), 4)
    val out = PipeOps.pipeMapReduce(spark, lines, mapper, reducer)
      .collect().map { l => val p = l.split("\t"); p(0).toInt -> p(1).toLong }
      .toMap
    assert(out === (0 to 6).map(_ -> 3L).toMap)
  }

  test("shell metacharacters in data are inert (R12 is structurally closed)") {
    // the reference escapes shell arguments by hand and acknowledges it
    // as possibly insufficient (MapReduceWSIImpl.java:307-310); here no
    // shell ever parses data — records flow through stdin to a process
    // spawned argv-style (ProcessBuilder(path), PipeOps.pipePartitions)
    // — so injection-shaped records are just bytes
    val canary = new java.io.File("/tmp/graft-pipe-injection-canary")
    canary.delete()
    val hostile = Seq(
      "$(touch /tmp/graft-pipe-injection-canary)",
      "`touch /tmp/graft-pipe-injection-canary`",
      "; touch /tmp/graft-pipe-injection-canary; ",
      "\" ' \\ | & > < $PATH ${PATH} *")
    val lines = spark.sparkContext.parallelize(hostile, 2)
    val out = PipeOps.pipeMap(spark, lines,
      "#!/bin/sh\nexec cat\n", "identity_mapper").collect().sorted
    assert(out === hostile.sorted.toArray) // byte-identical round trip
    assert(!canary.exists(), "a metacharacter record was shell-evaluated")
  }

  test("scripts without a shebang are rejected (reference contract)") {
    val lines = spark.sparkContext.parallelize(Seq("x"))
    intercept[IllegalArgumentException] {
      PipeOps.pipeMap(spark, lines, "awk '{print}'", "bad_script")
    }
  }

  test("a script flooding stderr (>1 MB) completes instead of deadlocking") {
    // would hang forever if child stderr were an undrained pipe: the
    // child blocks on a full stderr buffer, the feeder blocks on stdin,
    // the task blocks on stdout
    val lines = spark.sparkContext.parallelize(Seq("a", "b", "c"), 1)
    val script =
      """#!/bin/sh
        |awk 'BEGIN { for (i = 0; i < 40000; i++) print "stderr noise line with some padding to cross a megabyte" > "/dev/stderr" }'
        |exec cat
        |""".stripMargin
    val out = PipeOps.pipeMap(spark, lines, script, "stderr_flood").collect()
    assert(out.sorted === Array("a", "b", "c"))
  }

  test("a mapper that exits 0 without consuming its input is an error") {
    // silently truncated output must not look like success
    val lines = spark.sparkContext.parallelize((1 to 200000).map(_.toString), 1)
    val script = "#!/bin/sh\nhead -n 1\n"
    val e = intercept[org.apache.spark.SparkException] {
      PipeOps.pipeMap(spark, lines, script, "early_exit").collect()
    }
    assert(e.getMessage.contains("did not consume all input"))
  }

  test("aux files ship alongside scripts and are read by relative name") {
    // the reference's -file mechanism (MapReduceWSIImpl.java:194-201):
    // a dictionary shipped next to the mapper, opened by plain basename
    val lines = spark.sparkContext.parallelize(Seq("dog", "cat", "fox"), 2)
    val mapper =
      """#!/bin/sh
        |exec awk 'NR == FNR { d[$1] = $2; next } { print $1 "\t" d[$1] }' graft_dict.tsv -
        |""".stripMargin
    val out = PipeOps.pipeMap(spark, lines, mapper, "dict_mapper",
        auxFiles = Map("graft_dict.tsv" -> "dog\tHUND\ncat\tKATZE\nfox\tFUCHS\n"))
      .collect().sorted
    assert(out === Array("cat\tKATZE", "dog\tHUND", "fox\tFUCHS"))
  }
}
