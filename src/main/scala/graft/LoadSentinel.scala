package graft

/** The load-contamination sentinel shared by the benchmark mains
  * (Bench, StreamBench): committed throughput records must be able to
  * prove they were taken on a quiet machine. Round 9 shipped a ~2.6x
  * phantom regression from a stalling VM with nothing machine-readable
  * flagging it; these probes make a contaminated record name itself,
  * and tools/check_records.py fails any committed record whose
  * calibration deviates from tools/calibration_ref.json.
  *
  *  - [[loadAvg]]: /proc/loadavg 1/5/15-min readings.
  *  - [[calibrationMs]]: ms to fold 10^8 longs through a multiply-add
  *    — single-thread pure CPU, no IO, no allocation, so on a quiet
  *    machine it is a machine constant (~134 ms on the reference).
  *  - [[calib3]]: median of three samples, so one scheduler preemption
  *    can't skew a bracket reading.
  */
object LoadSentinel {

  def loadAvg: Seq[Double] =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  def calibrationMs: Double = {
    var h = 0L; var i = 0L
    val t0 = System.nanoTime()
    while (i < 100000000L) { h = h * 0x9E3779B97F4A7C15L + i; i += 1 }
    // fold h into a visible sink so the loop can't be elided
    if (h == 42L) System.err.println("calibration sentinel")
    (System.nanoTime() - t0) / 1e6
  }

  def calib3: Double =
    Seq(calibrationMs, calibrationMs, calibrationMs).sorted.apply(1)

  /** Quiet-machine reference (tools/calibration_ref.json) — the same
    * number check_records.py holds committed records to. Parsed with a
    * narrow regex so the sentinel has no JSON dependency; None when
    * the file is absent (e.g. running outside the repo root). */
  lazy val refCalibMs: Option[Double] =
    try {
      val txt = scala.io.Source.fromFile("tools/calibration_ref.json").mkString
      """"calib_ms"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble)
    } catch { case _: Throwable => None }

  /** Escalation threshold for the per-query probe's settle loop:
    * machine-relative (2.25x the committed reference — between the
    * brackets' 1.5x and the per-query worst's 2.5x record thresholds)
    * instead of an absolute 300 ms, which on a machine whose quiet
    * baseline exceeds 300 ms would make EVERY query pay the full
    * escalation wall (ADVICE r11). 300 ms retained only as the
    * no-reference fallback (2.25 x the original 133.5 ms reference). */
  def escalationThresholdMs: Double = refCalibMs.map(_ * 2.25).getOrElse(300.0)

  /** Escalate-on-elevation: keep sampling (up to maxExtra, spaced
    * sleepMs) until the reading drops under thresholdMs, returning
    * (best reading, extra samples taken). A sub-threshold initial
    * takes zero extras; a real machine stall spans minutes and stays
    * elevated through every sample, so detection is intact — and the
    * extra count is RETURNED so an escalated (tail-masked) entry is
    * identifiable in the committed record instead of indistinguishable
    * from a first-sample-quiet one (ADVICE r11). */
  def settle(initial: Double, thresholdMs: Double, maxExtra: Int,
      sample: () => Double, sleepMs: Long = 1000): (Double, Int) = {
    var best = initial
    var extra = 0
    while (best > thresholdMs && extra < maxExtra) {
      if (sleepMs > 0) Thread.sleep(sleepMs)
      extra += 1
      best = math.min(best, sample())
    }
    (best, extra)
  }
}
