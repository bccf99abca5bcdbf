package graft.domain

import java.time.{Duration, LocalDateTime}
import java.time.temporal.ChronoUnit

/** Cron orchestration around the pipeline flows — the prefect.yaml seam
  * (reference: prefect.yaml:7-8,22-23 — price flow daily at 15:00, review
  * flow daily at 16:00, each a cron-scheduled deployment run by an agent
  * loop). Pure JVM: a 5-field cron parser (minute hour day-of-month month
  * day-of-week with `*`, lists, ranges, steps, and the vixie dom/dow OR
  * rule), a deterministic next-fire computation, and a drive loop over an
  * INJECTED clock + sleeper — schedules unit-test in microseconds of wall
  * time, and production passes `LocalDateTime.now _` and `Thread.sleep`.
  *
  * Flows are opaque thunks: wire ModelRunner.run, PricePipeline stages, or
  * any composition. One slot fires at most once; when the loop is running
  * late, missed slots replay in order (prefect schedules a run per slot),
  * and a failing flow is recorded and the loop continues — an agent never
  * dies with its flow.
  */
object Scheduler {

  final case class CronSpec(minutes: Set[Int], hours: Set[Int],
                            doms: Set[Int], months: Set[Int], dows: Set[Int],
                            domRestricted: Boolean, dowRestricted: Boolean,
                            raw: String)

  // One field: comma list of `*` | `n` | `a-b`, each optionally `/step`.
  // Returns the admitted values and whether the field restricts at all
  // (vixie: exactly `*` is unrestricted; a starred step counts as restricted).
  private def parseField(f: String, lo: Int, hi: Int): (Set[Int], Boolean) = {
    def one(token: String): Seq[Int] = {
      val (body, step) = token.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron token '$token'")
      }
      require(step >= 1, s"cron step must be >= 1 in '$token'")
      val (a, b) = body match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-", 2); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, v)
      }
      require(a >= lo && b <= hi && a <= b,
        s"cron value out of range in '$token' (allowed $lo-$hi)")
      a to b by step
    }
    require(f.nonEmpty, "empty cron field")
    (f.split(",").toSeq.flatMap(one).toSet, f != "*")
  }

  def parse(expr: String): CronSpec = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5,
      s"cron needs 5 fields (m h dom mon dow), got ${fields.length} in '$expr'")
    val (mins, _)      = parseField(fields(0), 0, 59)
    val (hrs, _)       = parseField(fields(1), 0, 23)
    val (doms, domR)   = parseField(fields(2), 1, 31)
    val (months, _)    = parseField(fields(3), 1, 12)
    val (dows0, dowR)  = parseField(fields(4), 0, 7)
    val dows = dows0.map(d => if (d == 7) 0 else d) // both 0 and 7 mean Sunday
    CronSpec(mins, hrs, doms, months, dows, domR, dowR, expr.trim)
  }

  /** vixie-cron day rule: if BOTH dom and dow are restricted, a day matches
    * when EITHER does; otherwise both must match (an unrestricted field
    * matches every day). */
  private def dayMatches(s: CronSpec, d: LocalDateTime): Boolean = {
    val dom = s.doms.contains(d.getDayOfMonth)
    val dow = s.dows.contains(d.getDayOfWeek.getValue % 7) // MON=1..SUN=7 -> SUN=0
    if (s.domRestricted && s.dowRestricted) dom || dow else dom && dow
  }

  /** Earliest fire time STRICTLY AFTER `from`, minute granularity. Field-at-
    * a-time advance (reset lower fields on each carry), so the search is
    * O(candidate boundaries), not O(minutes scanned). */
  def nextFire(s: CronSpec, from: LocalDateTime): LocalDateTime = {
    var t = from.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = from.plusYears(5) // "0 0 30 2 *" must fail, not spin
    while (t.isBefore(limit)) {
      if (!s.months.contains(t.getMonthValue))
        t = t.plusMonths(1).withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      else if (!dayMatches(s, t))
        t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS)
      else if (!s.hours.contains(t.getHour))
        t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
      else if (!s.minutes.contains(t.getMinute))
        t = t.plusMinutes(1)
      else return t
    }
    throw new IllegalStateException(s"no fire time within 5 years for '${s.raw}'")
  }

  /** Earliest fire STRICTLY AFTER `from` in `from`'s zone, DST-safe — cron
    * fields always describe WALL-CLOCK time, so a zone with transitions needs
    * explicit gap/overlap policy (the zone-naive [[nextFire]] is only safe in
    * fixed-offset zones like the reference's Asia/Ho_Chi_Minh):
    *
    *  - spring-forward GAP (the wall time never occurs): fire at the
    *    transition instant itself — vixie's behavior for jobs scheduled in
    *    the skipped interval (run immediately after the clock jumps).
    *  - fall-back OVERLAP (the wall time occurs twice): fire at the FIRST
    *    occurrence (earlier offset) only; the repeated hour does not re-fire
    *    a slot that already ran. Sub-hourly wildcard schedules consequently
    *    see one silent repeat-hour (they fired through the first pass) —
    *    the standard non-double-running tradeoff, fine for the daily
    *    deployment cadence this seam drives.
    *
    * Monotonicity is enforced on INSTANTS: a candidate whose first
    * occurrence already passed (we are inside the repeated hour) is skipped
    * forward, so the returned instant is always strictly after `from`.
    *
    * `onFallbackSkip` fires — once per transition crossed — when a
    * SUB-HOURLY schedule (minutes field admits more than one value) steps
    * over a fall-back overlap, i.e. exactly when its second-pass fires in
    * the repeated hour are being silently dropped. Registrants of
    * minute-cadence jobs get a loud flag instead of a doc footnote (r6
    * advice, carried): the callback is where a deployment loop logs or
    * rejects the configuration. */
  def nextFireZoned(s: CronSpec, from: java.time.ZonedDateTime,
                    onFallbackSkip: (CronSpec, java.time.ZonedDateTime) => Unit
                      = (_, _) => ())
      : java.time.ZonedDateTime = {
    val zone = from.getZone
    val rules = zone.getRules
    var local = from.toLocalDateTime
    // bounded like nextFire's 5-year scan: each iteration advances `local`
    // strictly, and only candidates inside one overlap window re-loop
    var i = 0
    while (i < 200) {
      local = nextFire(s, local)
      val offsets = rules.getValidOffsets(local)
      val z =
        if (offsets.isEmpty) // gap: the transition instant, in-zone
          java.time.ZonedDateTime.ofInstant(rules.getTransition(local).getInstant, zone)
        else // unique or overlap: the earlier offset = first wall occurrence
          java.time.ZonedDateTime.ofLocal(local, zone, offsets.get(0))
      if (z.toInstant.isAfter(from.toInstant)) {
        // the fire that STEPS OVER a fall-back overlap is the one whose
        // second-pass slots were dropped: flag it for sub-hourly schedules
        if (s.minutes.size > 1) {
          val trans = rules.nextTransition(from.toInstant)
          if (trans != null && trans.isOverlap &&
              trans.getInstant.isAfter(from.toInstant) &&
              !trans.getInstant.isAfter(z.toInstant))
            onFallbackSkip(s, z)
        }
        return z
      }
      i += 1
    }
    throw new IllegalStateException(
      s"no zoned fire time after $from for '${s.raw}'")
  }

  final case class Deployment(name: String, cron: CronSpec, flow: () => Unit)
  final case class RunRecord(name: String, at: LocalDateTime, error: Option[String])
  final case class ZonedRunRecord(name: String, at: java.time.ZonedDateTime,
                                  error: Option[String])

  /** The reference's two deployments, verbatim cadence
    * (prefect.yaml:7-8,22-23). */
  def steamDeployments(price: () => Unit, review: () => Unit): Seq[Deployment] = Seq(
    Deployment("steam_price_pipeline",  parse("0 15 * * *"), price),
    Deployment("steam_review_pipeline", parse("0 16 * * *"), review))

  /** Agent loop: repeatedly take the earliest next slot across deployments
    * (computed from the schedule timeline, not the wall clock, so overruns
    * replay missed slots in order), sleep the remaining wall time if any,
    * run every deployment due at that slot in name order, and record the
    * outcome. Stops once the next slot would pass `until`. */
  def drive(deployments: Seq[Deployment], start: LocalDateTime,
            until: LocalDateTime, now: () => LocalDateTime,
            sleep: Duration => Unit,
            onError: (String, Throwable) => Unit = (_, _) => ()): Seq[RunRecord] = {
    require(deployments.nonEmpty, "no deployments to drive")
    require(deployments.map(_.name).distinct.size == deployments.size,
      "deployment names must be unique")
    val log = Seq.newBuilder[RunRecord]
    var t = start
    var going = true
    while (going) {
      val nexts = deployments.map(d => d -> nextFire(d.cron, t))
      val fireAt = nexts.map(_._2).reduce((a, b) => if (a.isBefore(b)) a else b)
      if (fireAt.isAfter(until)) going = false
      else {
        val wait = Duration.between(now(), fireAt)
        if (!wait.isNegative && !wait.isZero) sleep(wait)
        nexts.filter(_._2 == fireAt).sortBy(_._1.name).foreach { case (d, _) =>
          try { d.flow(); log += RunRecord(d.name, fireAt, None) }
          catch { case e: Throwable =>
            onError(d.name, e)
            log += RunRecord(d.name, fireAt, Some(e.toString))
          }
        }
        t = fireAt
      }
    }
    log.result()
  }

  /** [[drive]] in zoned time: identical slot semantics (earliest-next-slot,
    * missed-slot replay, per-slot name order, failure isolation) but every
    * next-fire goes through [[nextFireZoned]], so the loop is safe in any
    * deployment zone, DST transitions included. The zone-naive [[drive]]
    * stays for fixed-offset zones (the reference's Asia/Ho_Chi_Minh cadence
    * is one — no DST since 1975).
    *
    * Fall-back caveat (inherited from [[nextFireZoned]] and surfaced here
    * because this is the production entry point): in the repeated hour a
    * SUB-HOURLY schedule ("*&#47;5 * * * *" and friends) silently loses its
    * second-pass fires — up to an hour of slots once per fall-back day.
    * Daily/hourly deployments (the reference's cadence) are unaffected; a
    * minute-cadence job that must not skip should run in a fixed-offset
    * zone (e.g. UTC) instead. When a sub-hourly deployment's schedule
    * steps over a fall-back, `onFallbackSkip` fires (default: a stderr
    * WARN naming the deployment) — the loud flag, not just this footnote. */
  def driveZoned(deployments: Seq[Deployment], start: java.time.ZonedDateTime,
                 until: java.time.ZonedDateTime,
                 now: () => java.time.ZonedDateTime,
                 sleep: Duration => Unit,
                 onError: (String, Throwable) => Unit = (_, _) => (),
                 onFallbackSkip: (String, java.time.ZonedDateTime) => Unit =
                   (name, at) => System.err.println(
                     s"WARN scheduler: sub-hourly deployment '$name' crossed " +
                       s"a DST fall-back before $at — its second-pass fires " +
                       "in the repeated hour were skipped (run minute-cadence " +
                       "jobs in a fixed-offset zone to avoid this)"))
      : Seq[ZonedRunRecord] = {
    require(deployments.nonEmpty, "no deployments to drive")
    require(deployments.map(_.name).distinct.size == deployments.size,
      "deployment names must be unique")
    val log = Seq.newBuilder[ZonedRunRecord]
    var t = start
    var going = true
    while (going) {
      val nexts = deployments.map(d =>
        d -> nextFireZoned(d.cron, t, (_, z) => onFallbackSkip(d.name, z)))
      val fireAt = nexts.map(_._2)
        .reduce((a, b) => if (a.toInstant.isBefore(b.toInstant)) a else b)
      if (fireAt.toInstant.isAfter(until.toInstant)) going = false
      else {
        val wait = Duration.between(now().toInstant, fireAt.toInstant)
        if (!wait.isNegative && !wait.isZero) sleep(wait)
        // slot identity by INSTANT: on a gap day two crons (e.g. "30 2" and
        // "0 3") can both resolve to the transition instant — one slot
        nexts.filter(_._2.toInstant == fireAt.toInstant).sortBy(_._1.name)
          .foreach { case (d, _) =>
            try { d.flow(); log += ZonedRunRecord(d.name, fireAt, None) }
            catch { case e: Throwable =>
              onError(d.name, e)
              log += ZonedRunRecord(d.name, fireAt, Some(e.toString))
            }
          }
        t = fireAt
      }
    }
    log.result()
  }
}
