package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared shorthand for query definitions. */
object Q {
  /** A named query: (session, sf-dir) => result. The driver contract shape. */
  type Q = (SparkSession, String) => DataFrame

  def lineitem(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "customer")
  def events(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")
}
