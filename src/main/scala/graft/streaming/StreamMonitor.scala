package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming threshold monitor — the continuous face of the batch
  * q14 monetization monitor (the reference's scheduled
  * threshold-check + notification task, tasks.py MonetizationMonitor
  * shape): instead of a cron job re-scanning a window, per-user
  * tumbling windows aggregate as events ARRIVE and an alert row emits
  * when a window closes having crossed the value threshold with zero
  * purchases. Downstream, the alert stream is the notification bus
  * (the reference posts to Slack; here it's just a sink).
  *
  * Scale/state: one aggregate row per (user, open window) — watermark
  * closes windows and reclaims state, so memory is bounded by the
  * active-user count per window, not history. Emission is append-at-
  * watermark: alerts fire once, exactly when the window is final. */
object StreamMonitor {

  /** Events (user_id, event_type, value, ts) → closed-window alert
    * rows (user_id, win, value_sum, events) where value_sum >=
    * `threshold` and no purchase occurred. */
  def thresholdAlerts(events: DataFrame, threshold: Double,
      windowLen: String = "1 day", horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), windowLen).as("win"), col("user_id"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        count(lit(1)).as("events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"))
      .filter(col("purchases") === 0 && col("value_sum") >= threshold)
      .select(col("user_id"), col("win"), col("value_sum"), col("events"))
}
