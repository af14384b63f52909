package graft

import java.nio.file.Files

import graft.core.{Scope, Scopes}

class ScopesSpec extends SparkSpec {
  import spark.implicits._

  test("scope lifecycle: create, save/load dataset, delete") {
    val base = Files.createTempDirectory("graft-scopes").toString
    val scope = Scopes.create(spark, base)
    assert(scope.id >= 0)
    assert(Scopes.exists(spark, scope))

    val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
    Scopes.save(df, scope, "data1")
    val back = Scopes.load(spark, scope, "data1")
    assert(back.count() === 2)

    Scopes.delete(spark, scope)
    assert(!Scopes.exists(spark, scope))
  }

  test("two scopes are isolated") {
    val base = Files.createTempDirectory("graft-scopes2").toString
    val s1 = Scopes.create(spark, base)
    val s2 = Scopes.create(spark, base)
    assert(s1.id !== s2.id)
    Scopes.save(Seq(1).toDF("a"), s1, "d")
    assert(!new java.io.File(s2.path("d")).exists())
    Scopes.delete(spark, s1); Scopes.delete(spark, s2)
  }

  test("scope-relative names cannot escape the scope") {
    val scope = Scope(1L, "/tmp/base")
    intercept[IllegalArgumentException](scope.path("../escape"))
    intercept[IllegalArgumentException](scope.path("/abs"))
  }

  test("inventory lists artifacts; sweep ages out only dead ones") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-gc").toString
    val scope = Scopes.create(spark, base)
    try {
      Scopes.save(Seq(1L, 2L).toDF("v"), scope, "old_bands")
      Scopes.save(Seq(3L).toDF("v"), scope, "live_index")
      Scopes.save(Seq(4L).toDF("v"), scope, "kept_labels")
      // a mixed-age artifact: old files plus one fresh append — ANY
      // newer file must keep the whole artifact alive
      Scopes.save(Seq(5L).toDF("v"), scope, "appended")
      def ageAll(name: String, t: Long): Unit = {
        def rec(f: java.io.File): Unit = {
          f.setLastModified(t)
          Option(f.listFiles()).foreach(_.foreach(rec))
        }
        rec(new java.io.File(scope.path(name)))
      }
      val cutoff = System.currentTimeMillis() - 60000
      ageAll("old_bands", cutoff - 10000)
      ageAll("kept_labels", cutoff - 10000)
      ageAll("appended", cutoff - 10000)
      // the fresh append: one file inside 'appended' is NEW again
      new java.io.File(scope.path("appended")).listFiles()
        .filter(_.getName.endsWith(".parquet")).take(1)
        .foreach(_.setLastModified(System.currentTimeMillis()))
      val inv = Scopes.inventory(spark, scope)
      assert(inv.map(_.name) === Seq("appended", "kept_labels", "live_index", "old_bands"))
      assert(inv.forall(a => a.n_files > 0 && a.total_bytes > 0))
      val swept = Scopes.sweep(spark, scope, cutoff, keep = Set("kept_labels"))
      assert(swept === Seq("old_bands"))
      // live (newer), kept (protected), and appended (one fresh file)
      // artifacts are untouched and still readable
      assert(Scopes.load(spark, scope, "live_index").count() === 1)
      assert(Scopes.load(spark, scope, "kept_labels").count() === 1)
      assert(Scopes.load(spark, scope, "appended").count() === 1)
      assert(!new java.io.File(scope.path("old_bands")).exists())
      // idempotent: nothing left to sweep
      assert(Scopes.sweep(spark, scope, cutoff, Set("kept_labels")) === Seq.empty)

      // a just-created EMPTY artifact dir (a writer that hasn't
      // committed its first file yet) reports the dir's own mtime,
      // not 0 — sweep must leave it alone
      val inflight = new java.io.File(scope.path("inflight"))
      assert(inflight.mkdirs())
      val invEmpty = Scopes.inventory(spark, scope)
        .find(_.name == "inflight").get
      assert(invEmpty.n_files === 0L)
      assert(invEmpty.last_modified_ms > cutoff)
      assert(!Scopes.sweep(spark, scope, cutoff, Set("kept_labels"))
        .contains("inflight"))
      assert(inflight.exists())
      // ...but an ABANDONED empty dir ages out like any artifact
      inflight.setLastModified(cutoff - 10000)
      assert(Scopes.sweep(spark, scope, cutoff, Set("kept_labels"))
        === Seq("inflight"))
      assert(!inflight.exists())
    } finally Scopes.delete(spark, scope)
  }
}
