package graft.functions

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** Anchor-date calendar math — graft's re-expression of the reference's
  * AnchorCalendar (biutils.py:467-484, tasks.py:86-103): given an
  * anchor date, derive the latest *complete* month and ISO week, plus
  * month-over-month and year-over-year comparison anchors.
  *
  * Pure driver-side date logic (no Spark): the derived dates become
  * literal pushdown-able predicates in the query plan, so a 100 TB
  * date-partitioned table is pruned to three month partitions instead
  * of being scanned.
  */
final case class AnchorCalendar(anchor: LocalDate) {

  /** First day of the latest month that has fully elapsed before the
    * anchor (if the anchor is mid-month, that month is incomplete). */
  val latestCompleteMonthStart: LocalDate =
    anchor.withDayOfMonth(1).minusMonths(1)

  /** Exclusive end of the latest complete month. */
  val latestCompleteMonthEnd: LocalDate = anchor.withDayOfMonth(1)

  /** Month-over-month comparison anchor. */
  val momMonthStart: LocalDate = latestCompleteMonthStart.minusMonths(1)

  /** Year-over-year comparison anchor. */
  val yoyMonthStart: LocalDate = latestCompleteMonthStart.minusYears(1)

  /** Monday of the latest fully-elapsed ISO week (biutils.py:250-255
    * first-day-of-ISO-week, applied to the prior week). */
  val latestCompleteWeekStart: LocalDate = {
    val thisMonday = anchor.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    thisMonday.minusWeeks(1)
  }

  /** Week-over-week comparison anchor. */
  val wowWeekStart: LocalDate = latestCompleteWeekStart.minusWeeks(1)
}
