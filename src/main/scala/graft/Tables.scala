package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the harness queries (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
