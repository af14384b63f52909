package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Public constructor for the native [[AsOfJoin]] operator. */
object AsOf {

  private def attr(plan: LogicalPlan, name: String, side: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"as-of $side side has no column '$name' " +
          s"(available: ${plan.output.map(_.name).mkString(", ")})"))

  /** For each left row: the payload columns of the as-of matched right
    * row with `left.key == right.key` — by default the LATEST right
    * row with `right.time <= left.time` (null payload when no right
    * row precedes). Key and time column names are looked up on both
    * sides; `payload` maps right-side column → output name. Time
    * columns must be timestamps or long microseconds on both sides.
    * Null keys and null times never match.
    *
    * `direction` is `"backward"` (default), `"forward"` (earliest
    * right at-or-after), or `"nearest"` (smaller absolute distance,
    * ties to the earlier row); `toleranceUs` nulls out any match
    * farther than the bound in absolute time distance.
    *
    * Like Dataset self-joins, both inputs must have independent
    * lineage (a frame as-of-joined with a projection of itself would
    * carry ambiguous attribute ids).
    */
  def join(left: DataFrame, right: DataFrame, key: String, time: String,
           payload: Seq[(String, String)],
           direction: String = "backward",
           toleranceUs: Option[Long] = None): DataFrame = {
    val dir = direction.toLowerCase match {
      case "backward" => AsOfJoin.Backward
      case "forward" => AsOfJoin.Forward
      case "nearest" => AsOfJoin.Nearest
      case other => throw new IllegalArgumentException(
        s"as-of direction must be backward/forward/nearest, got '$other'")
    }
    val spark = left.sparkSession
    GraftPlanBridge.installPlanning(spark)
    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan = GraftPlanBridge.analyzed(right)
    // output = left columns ++ payload columns: a payload name that
    // collides (with a left column or another payload) would yield a
    // frame whose columns resolve only with AMBIGUOUS_REFERENCE errors
    // far from the cause — reject it here with the cause named
    val leftNames = lPlan.output.map(_.name).toSet
    val outNames = payload.map(_._2)
    val clash = outNames.filter(leftNames.contains) ++
      outNames.diff(outNames.distinct)
    require(clash.isEmpty,
      s"as-of payload output name(s) ${clash.distinct.mkString(", ")} " +
        "collide with a left-side column or another payload; rename via " +
        "the payload mapping's second element")
    val src = payload.map { case (c, _) => attr(rPlan, c, "right") }
    // fresh output attributes (NOT Aliases — CleanupAliases would
    // strip those inside a non-Project node), nullable: no-match rows
    // emit null payload
    val out = payload.zip(src).map { case ((_, name), s) =>
      AttributeReference(name, s.dataType, nullable = true)()
    }
    GraftPlanBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, key, "left"), attr(rPlan, key, "right"),
      attr(lPlan, time, "left"), attr(rPlan, time, "right"),
      src, out, dir, toleranceUs))
  }
}
