package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.docs.DocQueries
import graft.ext.{DedupQueries, Multimodal, Similarity, TextQueries}
import graft.relational.{RelationalQueries, RelationalQueries2}
import graft.stream.IndexPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's registry; each entry has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q3_join_topk")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2 (+ north-star
    * extensions: text analysis, dedup, similarity, multimodal, streaming). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RelationalQueries2.queries ++
      DocQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      Similarity.queries ++ Multimodal.queries ++ IndexPipeline.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ RelationalQueries2.oracle ++
      DocQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ IndexPipeline.oracle
}
