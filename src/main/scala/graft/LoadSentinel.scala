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
}
