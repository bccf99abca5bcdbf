package graft.domain

import java.time.{Duration, LocalDateTime}
import org.scalatest.funsuite.AnyFunSuite

/** Cron orchestration seam (prefect.yaml mirror): parser, next-fire math,
  * and the injected-clock agent loop — all without wall time. */
class SchedulerSpec extends AnyFunSuite {
  import Scheduler._

  private val aug14 = LocalDateTime.of(2026, 8, 14, 14, 30) // a Friday

  test("daily 15:00 (the price deployment cadence)") {
    val s = parse("0 15 * * *")
    assert(nextFire(s, aug14) === LocalDateTime.of(2026, 8, 14, 15, 0))
    // strictly after: a fire AT the slot schedules the next day's slot
    assert(nextFire(s, LocalDateTime.of(2026, 8, 14, 15, 0)) ===
      LocalDateTime.of(2026, 8, 15, 15, 0))
  }

  test("steps, ranges, weekday restriction") {
    val s = parse("*/15 9-17 * * 1-5")
    // Saturday night -> Monday 09:00
    assert(nextFire(s, LocalDateTime.of(2026, 8, 15, 20, 0)) ===
      LocalDateTime.of(2026, 8, 17, 9, 0))
    // mid-window: next quarter hour
    assert(nextFire(s, LocalDateTime.of(2026, 8, 14, 9, 16)) ===
      LocalDateTime.of(2026, 8, 14, 9, 30))
    // after the window closes (17:45 is the last slot) -> next day 09:00
    assert(nextFire(s, LocalDateTime.of(2026, 8, 14, 17, 45)) ===
      LocalDateTime.of(2026, 8, 17, 9, 0))
  }

  test("vixie dom/dow OR rule: 13th OR Friday when both restricted") {
    val s = parse("0 0 13 * 5")
    // from Aug 12: Aug 13 is a Thursday -> dom matches first
    assert(nextFire(s, LocalDateTime.of(2026, 8, 12, 0, 0)) ===
      LocalDateTime.of(2026, 8, 13, 0, 0))
    // from Aug 13 00:00: Friday Aug 14 matches via dow before Sep 13
    assert(nextFire(s, LocalDateTime.of(2026, 8, 13, 0, 0)) ===
      LocalDateTime.of(2026, 8, 14, 0, 0))
    // dom unrestricted: dow alone decides
    val friYes = parse("0 0 * * 5")
    assert(nextFire(friYes, LocalDateTime.of(2026, 8, 12, 0, 0)) ===
      LocalDateTime.of(2026, 8, 14, 0, 0))
    // sunday as 7 === sunday as 0
    assert(parse("0 0 * * 7").dows === parse("0 0 * * 0").dows)
  }

  test("list fields and stepped ranges") {
    val s = parse("5,35 1-10/3 * * *")
    assert(s.minutes === Set(5, 35) && s.hours === Set(1, 4, 7, 10))
  }

  test("invalid specs fail loudly") {
    intercept[IllegalArgumentException](parse("0 15 * *"))        // 4 fields
    intercept[IllegalArgumentException](parse("60 * * * *"))      // out of range
    intercept[IllegalArgumentException](parse("* * 0 * *"))       // dom floor is 1
    intercept[IllegalArgumentException](parse("*/0 * * * *"))     // zero step
    intercept[IllegalStateException](
      nextFire(parse("0 0 30 2 *"), aug14))                       // Feb 30 never
  }

  test("drive: two simulated days of the steam deployments, in slot order") {
    var clock = LocalDateTime.of(2026, 8, 14, 12, 0)
    val ran = Seq.newBuilder[String]
    val log = drive(
      steamDeployments(() => ran += "price", () => ran += "review"),
      start = clock, until = LocalDateTime.of(2026, 8, 16, 0, 0),
      now = () => clock, sleep = d => clock = clock.plus(d))
    assert(ran.result() === Seq("price", "review", "price", "review"))
    assert(log.map(r => (r.name, r.at.toString, r.error)) === Seq(
      ("steam_price_pipeline",  "2026-08-14T15:00", None),
      ("steam_review_pipeline", "2026-08-14T16:00", None),
      ("steam_price_pipeline",  "2026-08-15T15:00", None),
      ("steam_review_pipeline", "2026-08-15T16:00", None)))
    assert(clock === LocalDateTime.of(2026, 8, 15, 16, 0)) // slept to the last slot
  }

  test("nextFire agrees with a brute-force minute scan on randomized specs") {
    // the field-at-a-time advance (reset lower fields on carry) is the classic
    // place cron implementations go wrong; cross-check it against the dumbest
    // possible oracle over a bounded horizon
    val rnd = new scala.util.Random(42)
    def randField(lo: Int, hi: Int): String = rnd.nextInt(4) match {
      case 0 => "*"
      case 1 => (lo + rnd.nextInt(hi - lo + 1)).toString
      case 2 =>
        val a = lo + rnd.nextInt(hi - lo); val b = a + 1 + rnd.nextInt(hi - a)
        s"$a-$b${if (rnd.nextBoolean()) s"/${1 + rnd.nextInt(5)}" else ""}"
      case _ => s"*/${1 + rnd.nextInt(9)}"
    }
    def matches(s: CronSpec, t: LocalDateTime): Boolean = {
      val dom = s.doms.contains(t.getDayOfMonth)
      val dow = s.dows.contains(t.getDayOfWeek.getValue % 7)
      s.minutes.contains(t.getMinute) && s.hours.contains(t.getHour) &&
        s.months.contains(t.getMonthValue) &&
        (if (s.domRestricted && s.dowRestricted) dom || dow else dom && dow)
    }
    (1 to 200).foreach { _ =>
      val expr = Seq(randField(0, 59), randField(0, 23), randField(1, 31),
        randField(1, 12), randField(0, 6)).mkString(" ")
      val s = parse(expr)
      val from = LocalDateTime.of(2026, 1 + rnd.nextInt(12), 1 + rnd.nextInt(28),
        rnd.nextInt(24), rnd.nextInt(60))
      // brute-force: first matching minute strictly after `from`, 120-day cap
      val brute = Iterator.iterate(from.plusMinutes(1))(_.plusMinutes(1))
        .take(120 * 24 * 60).find(matches(s, _))
      brute match {
        case Some(expect) => assert(nextFire(s, from) === expect, s"spec '$expr' from $from")
        case None => () // fires beyond the horizon (rare month+dom combo) — skip
      }
    }
  }

  test("nextFireZoned: spring-forward gap fires at the transition instant (vixie)") {
    import java.time.{Instant, ZoneId, ZonedDateTime}
    val ny = ZoneId.of("America/New_York") // 2026-03-08: 02:00 EST -> 03:00 EDT
    val s = parse("30 2 * * *")
    val from = ZonedDateTime.of(2026, 3, 7, 12, 0, 0, 0, ny)
    val fire = nextFireZoned(s, from)
    // 02:30 on Mar 8 never exists; the job runs right at the jump (03:00 EDT)
    assert(fire.toInstant === Instant.parse("2026-03-08T07:00:00Z"))
    assert(fire.getHour === 3 && fire.getOffset.toString === "-04:00")
    // the day after, back to plain 02:30 EDT
    assert(nextFireZoned(s, fire).toInstant === Instant.parse("2026-03-09T06:30:00Z"))
  }

  test("nextFireZoned: fall-back overlap fires the FIRST occurrence only") {
    import java.time.{Instant, ZoneId, ZonedDateTime}
    val ny = ZoneId.of("America/New_York") // 2026-11-01: 02:00 EDT -> 01:00 EST
    val s = parse("30 1 * * *")
    val from = ZonedDateTime.of(2026, 10, 31, 12, 0, 0, 0, ny)
    val first = nextFireZoned(s, from)
    // 01:30 happens twice on Nov 1; fire at the earlier offset (EDT)
    assert(first.toInstant === Instant.parse("2026-11-01T05:30:00Z"))
    assert(first.getOffset.toString === "-04:00")
    // from inside the repeated hour (even at the later offset past the wall
    // slot) the SECOND 01:30 must NOT re-fire: next is Nov 2, 01:30 EST
    val second = nextFireZoned(s, first)
    assert(second.toInstant === Instant.parse("2026-11-02T06:30:00Z"))
    assert(second.getOffset.toString === "-05:00")
  }

  test("nextFireZoned: a sub-hourly cron crossing a fall-back flags the skip loudly") {
    import java.time.{Instant, ZoneId, ZonedDateTime}
    val ny = ZoneId.of("America/New_York") // 2026-11-01: 02:00 EDT -> 01:00 EST
    val s = parse("*/15 * * * *")
    var flagged = List.empty[ZonedDateTime]
    val cb = (_: CronSpec, z: ZonedDateTime) => { flagged ::= z; () }
    // first pass of the repeated hour: normal fires, NO flag yet
    var t = ZonedDateTime.of(2026, 11, 1, 0, 50, 0, 0, ny)
    t = nextFireZoned(s, t, cb) // 01:00 EDT
    assert(t.toInstant === Instant.parse("2026-11-01T05:00:00Z") && flagged.isEmpty)
    t = nextFireZoned(s, t, cb) // 01:15 EDT
    t = nextFireZoned(s, t, cb); t = nextFireZoned(s, t, cb) // 01:30, 01:45 EDT
    assert(flagged.isEmpty)
    // the fire that STEPS OVER the transition skips the whole EST second
    // pass (01:00-01:45 EST) — exactly one flag, at the stepping fire
    t = nextFireZoned(s, t, cb)
    assert(t.toInstant === Instant.parse("2026-11-01T07:00:00Z")) // 02:00 EST
    assert(flagged == List(t), flagged.toString)
    // past the transition: quiet again
    t = nextFireZoned(s, t, cb)
    assert(flagged.size == 1)
  }

  test("nextFireZoned: daily cadence crossing the same fall-back stays quiet") {
    import java.time.{ZoneId, ZonedDateTime}
    val ny = ZoneId.of("America/New_York")
    var flagged = 0
    val cb = (_: CronSpec, _: ZonedDateTime) => { flagged += 1; () }
    // the reference's daily cadence loses nothing on a fall-back day —
    // the flag is for sub-hourly registrants only
    val s = parse("0 15 * * *")
    val from = ZonedDateTime.of(2026, 10, 31, 16, 0, 0, 0, ny)
    val z = nextFireZoned(s, from, cb)
    assert(z.getDayOfMonth == 1 && flagged == 0)
  }

  test("nextFireZoned: fixed-offset zone (the reference's) matches the naive math") {
    import java.time.{ZoneId, ZonedDateTime}
    val vn = ZoneId.of("Asia/Ho_Chi_Minh") // no DST — prefect.yaml's zone
    val s = parse("0 15 * * *")
    val from = ZonedDateTime.of(aug14, vn)
    val z = nextFireZoned(s, from)
    assert(z.toLocalDateTime === nextFire(s, aug14))
    // consecutive fires exactly 24h of instant time apart, year-round
    assert(Duration.between(z.toInstant, nextFireZoned(s, z).toInstant)
      === Duration.ofHours(24))
  }

  test("driveZoned: deployments across a gap day coalesce on the transition instant") {
    import java.time.{ZoneId, ZonedDateTime}
    val ny = ZoneId.of("America/New_York")
    var clock = ZonedDateTime.of(2026, 3, 7, 12, 0, 0, 0, ny)
    val ran = Seq.newBuilder[String]
    val log = driveZoned(
      Seq(Deployment("a_gap", parse("30 2 * * *"), () => ran += "a"),
        Deployment("b_after", parse("0 3 * * *"), () => ran += "b")),
      start = clock, until = ZonedDateTime.of(2026, 3, 9, 12, 0, 0, 0, ny),
      now = () => clock, sleep = d => clock = clock.plus(d))
    // Mar 8 (gap day): both crons resolve to the 03:00 EDT transition instant
    // and run in name order at ONE slot; Mar 9: separate slots again
    assert(ran.result() === Seq("a", "b", "a", "b"))
    assert(log.map(r => (r.name, r.at.toInstant.toString)) === Seq(
      ("a_gap",   "2026-03-08T07:00:00Z"),
      ("b_after", "2026-03-08T07:00:00Z"),
      ("a_gap",   "2026-03-09T06:30:00Z"),
      ("b_after", "2026-03-09T07:00:00Z")))
  }

  test("drive: a failing flow is recorded and the loop continues; overrun replays slots") {
    var clock = LocalDateTime.of(2026, 8, 14, 14, 59)
    var n = 0
    val errs = Seq.newBuilder[String]
    val log = drive(
      Seq(Deployment("hourly", parse("0 * * * *"), () => {
        n += 1
        if (n == 1) { clock = clock.plusHours(3); sys.error("boom") } // overruns 2 slots
      })),
      start = clock, until = LocalDateTime.of(2026, 8, 14, 19, 0),
      now = () => clock, sleep = d => clock = clock.plus(d),
      onError = (name, e) => errs += s"$name:${e.getMessage}")
    // slots 15:00 (failed, overran to ~18:00), then 16/17/18 replay without
    // sleeping backwards, then 19:00 after a real wait
    assert(log.map(_.at.getHour) === Seq(15, 16, 17, 18, 19))
    assert(log.head.error.exists(_.contains("boom")) && log.tail.forall(_.error.isEmpty))
    assert(errs.result() === Seq("hourly:boom"))
  }
}
