package graft

import java.nio.file.Files

import graft.core.Scopes
import graft.ops.Jobs

/** R10 batch-job surface (reference: runMapReduce,
  * MapReduceWSI.java:62-79 — scope prefix as argv[0]).
  */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("closure job runs under the scope and can read/write scoped data") {
    val base = Files.createTempDirectory("graft-jobs").toString
    val scope = Scopes.create(spark, base)
    Scopes.save(Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v"), scope, "in")

    val out = Jobs.run(spark, scope, (s, prefix, args) => {
      assert(args === Seq("x"))
      s.read.parquet(s"$prefix/in").groupBy("k").sum("v")
    }, Seq("x"))
    assert(out.count() === 2)
    Scopes.delete(spark, scope)
  }

  test("jar-main runner invokes main with scope prefix as argv[0]") {
    val base = Files.createTempDirectory("graft-jobs2").toString
    val scope = Scopes.create(spark, base)
    JobsSpec.seen = null
    // main class resolved from the current classpath (empty jar path):
    // the calling convention, not jar distribution, is under test
    Jobs.runJarMain(spark, scope, "", classOf[JobsSpec].getName.stripSuffix("$"), Seq("a", "b"))
    assert(JobsSpec.seen != null)
    assert(JobsSpec.seen.toSeq === Seq(scope.dir, "a", "b"))
    Scopes.delete(spark, scope)
  }

  test("missing main class surfaces as a GraftException") {
    val base = Files.createTempDirectory("graft-jobs3").toString
    val scope = Scopes.create(spark, base)
    intercept[graft.core.GraftException] {
      Jobs.runJarMain(spark, scope, "", "does.not.Exist")
    }
    Scopes.delete(spark, scope)
  }
}

object JobsSpec {
  @volatile var seen: Array[String] = _
  def main(args: Array[String]): Unit = { seen = args }
}
