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
  )
}
