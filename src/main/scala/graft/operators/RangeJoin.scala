package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via binning — the scale pattern for joins with NO
  * equi-key, only a temporal/numeric containment predicate
  * (`point BETWEEN start AND end`).
  *
  * Spark plans a bare containment predicate as BroadcastNestedLoopJoin (or
  * a cartesian product when neither side broadcasts): every point compared
  * to every interval, O(n·m). Binning both sides by a fixed width turns it
  * into a plain hash equi-join:
  *
  *  - each point lands in exactly ONE bin (`t div width`);
  *  - each interval is exploded to every bin it overlaps
  *    (`start div width .. end div width`);
  *  - join on the bin id, then re-check exact containment.
  *
  * Each overlapping (point, interval) pair meets on exactly one bin — the
  * point's — so the output needs no dedup and equals the naive theta join
  * row for row (RangeJoinSpec asserts this). Cost: the equi-join's
  * candidate volume is points × intervals-per-bin; replication of the
  * interval side is `len/width + 1` rows per interval. Pick `width` on the
  * order of the typical interval length: shorter widths replicate
  * intervals more, longer widths admit more false candidates per bin —
  * both ends degrade gracefully, neither is O(n·m).
  *
  * This is the same trick production engines apply for range joins (e.g.
  * binned range-join optimizations in Spark-based platforms); here it is a
  * library composition — preference ladder rung (a) — because built-in
  * operators express it exactly.
  *
  * Domain: bin ids come from integer division, so point/start/end must be
  * non-negative (epoch timestamps are). Intervals are inclusive on both
  * ends.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose `[startCol, endCol]`
    * contains `tsCol`. Output = point columns ++ interval columns, one row
    * per overlapping pair. */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "bin width must be positive")
    // the output contract is point columns ++ interval columns — a name
    // shared across the two sides would survive the join twice (ambiguous
    // downstream, and an AnalysisException in the containment filter if
    // the shared name is ts/start/end); fail with the actual problem
    val shared = points.columns.toSet intersect intervals.columns.toSet
    require(shared.isEmpty,
      s"pointInInterval: column name(s) ${shared.mkString(", ")} exist on " +
        "both sides — rename one side before joining")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "pointInInterval: __bin is reserved for the binning key")
    val p = points.withColumn("__bin", expr(s"`$tsCol` DIV $binWidth"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$startCol` DIV $binWidth"),
        expr(s"`$endCol` DIV $binWidth"))))
    p.join(i, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
