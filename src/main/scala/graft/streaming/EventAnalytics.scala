package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over a stream — the streaming twin
  * of the batch q11/q12 queries (SURVEY §2.7: windows are absent in
  * the reference; exposed via built-in `window()` for the events
  * table per the north-star extension).
  */
object EventAnalytics {

  /** Tumbling-window counts+sums per event type with a watermark:
    * late rows beyond `lateness` are dropped, state is bounded, and
    * the aggregation distributes by (window, event_type).
    */
  def windowedStats(stream: DataFrame,
                    windowLength: String = "1 hour",
                    lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Batch twin over the same input — used by the spec to prove the
    * streaming result equals the batch result on identical data.
    */
  def windowedStatsBatch(df: DataFrame,
                         windowLength: String = "1 hour"): DataFrame =
    df.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Native session windows: per-user sessions close after `gap` of
    * inactivity — the streaming form of the batch q12 sessionization
    * (gaps-and-islands), using Spark's session_window so the engine
    * merges/extends window state instead of a hand-rolled lag. State
    * is per (user, open session) and expires via the watermark.
    */
  def sessionStats(stream: DataFrame,
                   gap: String = "30 minutes",
                   lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Batch twin of [[sessionStats]] for the equivalence spec. */
  def sessionStatsBatch(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  private def pairSides(views: DataFrame, clicks: DataFrame,
                        lateness: Option[String]) = {
    val v0 = views.select(col("user_id"), col("ts").as("view_ts"))
    val c0 = clicks.select(col("user_id").as("click_user"), col("ts").as("click_ts"))
    lateness match {
      case Some(l) => (v0.withWatermark("view_ts", l),
                       c0.withWatermark("click_ts", l))
      case None    => (v0, c0)
    }
  }

  private def joinPairs(v: DataFrame, c: DataFrame,
                        horizonMinutes: Int,
                        joinType: String = "inner"): DataFrame =
    v.join(c, col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        joinType)
      .select(col("user_id"), col("view_ts"), col("click_ts"),
        ((unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts"))))
          .as("delay_sec"))

  /** Stream-stream interval join — the attribution correlation of a
    * live event pipeline (the streaming twin of the batch
    * q27_range_join): every click joins same-user views from the
    * preceding `horizonMinutes`. BOTH sides carry watermarks and the
    * join condition bounds both event times, so the engine can size
    * and evict join state on each side (state ≈ lateness + horizon of
    * input per side — bounded at any stream length, the only shape a
    * stream-stream join survives at scale). Inner join ⇒ append mode.
    */
  def attributedPairs(views: DataFrame, clicks: DataFrame,
                      horizonMinutes: Int = 30,
                      lateness: String = "10 minutes"): DataFrame = {
    val (v, c) = pairSides(views, clicks, Some(lateness))
    joinPairs(v, c, horizonMinutes)
  }

  /** Batch twin of [[attributedPairs]] for the equivalence spec. */
  def attributedPairsBatch(views: DataFrame, clicks: DataFrame,
                           horizonMinutes: Int = 30): DataFrame = {
    val (v, c) = pairSides(views, clicks, None)
    joinPairs(v, c, horizonMinutes)
  }

  /** [[attributedPairs]] as a LEFT OUTER stream-stream join: views
    * that attract no click inside the horizon are emitted too, with
    * null click columns — the conversion-funnel form (every
    * impression gets an outcome row). The engine can only emit an
    * unmatched view once the watermark proves no matching click can
    * still arrive (view_ts + horizon + lateness), so null rows trail
    * the watermark — exactly the cost a funnel report pays for
    * exactness. Same bounded per-side state as the inner form.
    */
  def attributionOutcomes(views: DataFrame, clicks: DataFrame,
                          horizonMinutes: Int = 30,
                          lateness: String = "10 minutes"): DataFrame = {
    val (v, c) = pairSides(views, clicks, Some(lateness))
    joinPairs(v, c, horizonMinutes, "left_outer")
  }

  /** Batch twin of [[attributionOutcomes]]. */
  def attributionOutcomesBatch(views: DataFrame, clicks: DataFrame,
                               horizonMinutes: Int = 30): DataFrame = {
    val (v, c) = pairSides(views, clicks, None)
    joinPairs(v, c, horizonMinutes, "left_outer")
  }
}
