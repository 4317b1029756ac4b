package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact `percentile()` computed as a codegen sort-window + index
  * arithmetic — a drop-in for `groupBy(g).agg(percentile(v, p))` that
  * produces BIT-IDENTICAL doubles while avoiding the built-in
  * aggregate's execution shape, which is the single slowest operator
  * pattern the round-12 profiling found (optimization guide §1/§4):
  * `Percentile` is a non-codegen ObjectHashAggregate whose update path
  * boxes every value into a per-partition `OpenHashMap[AnyRef, Long]`,
  * merges those maps across partitions, then sorts the merged map in
  * the single final-agg task — ~2 s for one 600 k-row group at sf0.1
  * where the equivalent UnsafeSort takes a small fraction of that, and
  * the sort parallelizes per group while the map merge cannot.
  *
  * Semantics replicated from Spark's `Percentile.getPercentile` (the
  * oracle-pinned behavior every caller was hashed against):
  *   position = p · (n − 1) over the group's non-null values;
  *   lo = ⌊position⌋, hi = ⌈position⌉ (0-based indexes into the
  *   group's values sorted ascending);
  *   result = v[lo]                       when hi == lo or v[hi] == v[lo]
  *            (hi − position) · v[lo] + (position − lo) · v[hi]  otherwise.
  * Both short-circuits matter for float-exactness: the interpolation
  * expression algebraically equals v[lo] in those cases but can differ
  * in the last ulp. Values are read back as doubles exactly like
  * `toDoubleValue` (numeric → double cast, identity for doubles).
  */
object ExactPercentiles {

  /** Per-group exact percentiles: returns one row per group with
    * `groups ++ ps.map(_._1)` double columns — the same frame
    * `df.groupBy(groups).agg(percentile(value, p).as(name)…)` yields.
    * Nulls in `value` are dropped first (Percentile skips them, and
    * its `n` counts non-null rows only). One exchange (hash by group),
    * one per-group sort, one hash agg — all whole-stage-codegen. */
  def groupPercentiles(df: DataFrame, groups: Seq[String], value: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val g = groups.map(col)
    // order by the double image: monotone for the numeric inputs this
    // engine feeds it (doubles verbatim; integers far below 2^53)
    val sortW = Window.partitionBy(g: _*).orderBy(col("_v"))
    val cntW = Window.partitionBy(g: _*)
    var ranked = df
      .filter(value.isNotNull)
      .select(g :+ value.cast("double").as("_v"): _*)
      .withColumn("_i", row_number().over(sortW).cast("long") - 1L)
      .withColumn("_n", count(lit(1)).over(cntW))
    // per-row index targets (group-constant — _n is): computed pre-agg
    // so the aggregate only ever reduces them with max()
    ps.foreach { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1L).cast("double")
      ranked = ranked
        .withColumn(s"_pos_$name", pos)
        .withColumn(s"_lo_$name", floor(pos).cast("long"))
        .withColumn(s"_hi_$name", ceil(pos).cast("long"))
    }
    val aggs = ps.flatMap { case (name, _) =>
      Seq(
        // v[lo] / v[hi] via the row index: when() matches exactly one
        // row per group (ties in _v make any matching row equivalent)
        max(when(col("_i") === col(s"_lo_$name"), col("_v")))
          .as(s"_vlo_$name"),
        max(when(col("_i") === col(s"_hi_$name"), col("_v")))
          .as(s"_vhi_$name"),
        max(col(s"_pos_$name")).as(s"_p_$name"),
        max(col(s"_lo_$name")).as(s"_l_$name"),
        max(col(s"_hi_$name")).as(s"_h_$name"))
    }
    val agged =
      if (groups.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
      else ranked.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, _) =>
      val (vlo, vhi) = (col(s"_vlo_$name"), col(s"_vhi_$name"))
      val (pos, lo, hi) =
        (col(s"_p_$name"), col(s"_l_$name"), col(s"_h_$name"))
      when(lo === hi || vlo === vhi, vlo)
        .otherwise((hi.cast("double") - pos) * vlo
          + (pos - lo.cast("double")) * vhi)
        .as(name)
    }
    agged.select(g ++ outs: _*)
  }
}
