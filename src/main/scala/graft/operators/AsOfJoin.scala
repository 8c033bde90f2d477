package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — declared extension of SURVEY §2.3 (the reference has no
  * as-of operator; it's the natural temporal-lookup companion to J2).
  *
  * Spark-first composition (preference order (a) of the build brief): tag
  * both sides, union on (key, ts), and carry the most recent right payload
  * forward with `last(_, ignoreNulls).over(key ordered by ts)` — a single
  * shuffle on the key, no range-join blowup, identical semantics to
  * DuckDB's ASOF LEFT JOIN (right.ts <= left.ts, latest wins, ties on equal
  * timestamps match because right rows sort before left rows).
  *
  * At 100 TB this is the canonical distributed as-of: one hash shuffle of
  * both inputs on the key, linear merge within partitions — no per-row
  * range probe.
  */
object AsOfJoin {
  import graft.Q.{Q, events}

  /** For each left row: latest `right` row with rts <= lts, per key.
    * Output = left columns + `payload` (nullable) from the right side. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, payload: String): DataFrame = {
    val l = left.withColumn("__t", col(lts)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(col(key), col(rts).as("__t"), lit(0).as("__side"),
      col(payload).as("__p"))
    val lCols = left.columns
    val unioned = l.select((lCols.map(col) ++ Seq(col("__t"), col("__side"),
      col("__p"))): _*)
      .unionByName(r.select((lCols.map(c =>
        if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("__t"), col("__side"), col("__p"))): _*))
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payload, last("__p", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }

  /** Oracle-gated query: for each error event, the most recent prior signup
    * of the same user (events fixture self-as-of). */
  def errorsAfterSignup: Q = (s, d) => {
    val e = events(s, d)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"))
    asOf(errors, signups, "user_id", "ts", "sts", "sts")
      .select(col("event_id"), col("user_id"), col("sts").as("signup_ts"),
        (unix_timestamp(col("ts").cast("timestamp")) -
          unix_timestamp(col("sts").cast("timestamp"))).as("gap_s"))
  }

  val oracle: String =
    """WITH errors AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'error'),
      | signups AS (SELECT user_id, ts AS sts FROM events
      |  WHERE event_type = 'signup')
      |SELECT e.event_id, e.user_id, s.sts AS signup_ts,
      | (epoch_us(e.ts) // 1000000) - (epoch_us(s.sts) // 1000000) AS gap_s
      |FROM errors e ASOF LEFT JOIN signups s
      | ON e.user_id = s.user_id AND s.sts <= e.ts""".stripMargin
}
