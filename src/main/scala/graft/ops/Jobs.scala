package graft.ops

import java.lang.reflect.Modifier

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{GraftException, Scope}

/** R10 — arbitrary-code batch jobs: the reference uploads a client JAR
  * and runs `yarn jar <jar> <hdfsScopePrefix> <args...>` with the
  * scope's storage prefix always passed as argv[0]
  * (reference: src/de/uni_stuttgart/ipvs_as/MapReduceWSI.java:62-79,
  * impl MapReduceWSIImpl.java:89-115, client driver example
  * test/src/.../mapreduce/Runner.java:17-56).
  *
  * Spark-native re-expression, two tiers:
  *  1. [[run]] — the typed contract: a client closure
  *     `(SparkSession, scopePrefix, args) => DataFrame` replaces the
  *     JAR's `main`; the driver DAG scheduler replaces YARN job
  *     orchestration.
  *  2. [[runJarMain]] — binary compatibility: ship a client jar to the
  *     executors (`addJar`) and reflectively invoke its main class on
  *     the driver with the scope prefix as argv[0], mirroring the
  *     reference's argument contract exactly.
  */
object Jobs {

  type BatchJob = (SparkSession, String, Seq[String]) => DataFrame

  /** Run a client job under a scope; the job sees the scope's storage
    * prefix as its working namespace (argv[0] convention of the
    * reference) and returns its result dataset.
    */
  def run(spark: SparkSession, scope: Scope, job: BatchJob,
          args: Seq[String] = Nil): DataFrame =
    try job(spark, scope.dir, args)
    catch {
      case e: GraftException => throw e
      case e: Exception => throw new GraftException(s"batch job failed: ${e.getMessage}", e)
    }

  /** Ship a jar to all executors and invoke `mainClass.main` with the
    * scope prefix prepended to `args` — the reference's exact calling
    * convention (`MapReduceWSI.java:68-70`).
    */
  def runJarMain(spark: SparkSession, scope: Scope, jarPath: String,
                 mainClass: String, args: Seq[String] = Nil): Unit = {
    if (jarPath.nonEmpty) spark.sparkContext.addJar(jarPath)
    val argv = (scope.dir +: args).toArray
    var loader: java.net.URLClassLoader = null
    try {
      val cls =
        if (jarPath.isEmpty) Class.forName(mainClass)
        else {
          loader = new java.net.URLClassLoader(
            Array(new java.io.File(jarPath).toURI.toURL),
            getClass.getClassLoader)
          Class.forName(mainClass, true, loader)
        }
      val main = cls.getMethod("main", classOf[Array[String]])
      require(Modifier.isStatic(main.getModifiers), s"$mainClass.main is not static")
      main.invoke(null, argv)
    } catch {
      case e: java.lang.reflect.InvocationTargetException =>
        // surface the client job's own exception, not the reflection wrapper
        val cause = Option(e.getCause).getOrElse(e)
        throw new GraftException(
          s"batch job $mainClass failed: ${cause.getMessage}", cause)
      case e: ReflectiveOperationException =>
        throw new GraftException(s"failed to run $mainClass from $jarPath: ${e.getMessage}", e)
    } finally if (loader != null) loader.close()
  }
}
