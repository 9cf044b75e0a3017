package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry: query key → implementation (SURVEY §2 contract). */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map[String, Q](
    "scan_filter_project"   -> (Relational.scanFilterProject _),
    "source_events_ns"      -> (Relational.sourceEventsNs _),
    "source_json_props"     -> (Relational.sourceJsonProps _),
    "filter_complex_pred"   -> (Relational.filterComplexPred _),
    "filter_null_semantics" -> (Relational.filterNullSemantics _),
    // joins
    "join_inner_equi"       -> (Relational.joinInnerEqui _),
    "join_broadcast_dim"    -> (Relational.joinBroadcastDim _),
    "join_multiway_star"    -> (Relational.joinMultiwayStar _),
    "join_left_outer"       -> (Relational.joinLeftOuter _),
    "join_full_outer"       -> (Relational.joinFullOuter _),
    "join_semi"             -> (Relational.joinSemi _),
    "join_anti"             -> (Relational.joinAnti _),
    "join_cross"            -> (Relational.joinCross _),
    // sort / limit / top-k
    "sort_multi_nulls"      -> (Relational.sortMultiNulls _),
    "limit_topk"            -> (Relational.limitTopk _),
    "topk_per_group"        -> (Relational.topkPerGroup _),
    // aggregations
    "agg_pricing_summary"   -> (Aggregates.aggPricingSummary _),
    "agg_count_distinct"    -> (Aggregates.aggCountDistinct _),
    "agg_multi_distinct"    -> (Aggregates.aggMultiDistinct _),
  )
}
