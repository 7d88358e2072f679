package graft.docs

import graft.SparkSpec

/** Property-style equivalence for the EQL sequence engine: a seeded
  * generator produces random event streams (timestamp ties included) and
  * random sequence queries (2-4 steps, optional runs, optional until,
  * optional missing-event gap), and each is checked against an
  * INDEPENDENT sequential reference that simulates the documented
  * last-prefix window-carry contract row by row. Seeded → deterministic,
  * no extra test deps (the EsqlPropertySpec pattern). */
class EqlPropertySpec extends SparkSpec {

  private val Types = Vector("a", "b", "c", "e", "m")

  /** Sequential reference: the documented contract, simulated per key in
    * (ts, id) order with "last value strictly before this row" carries. */
  private def reference(events: Seq[(Long, Long, String, Long)], // id, user, type, ts
                        steps: Seq[String], maxspanUs: Long,
                        until: Option[String],
                        missing: Map[Int, String]): Seq[Seq[Long]] = {
    val n = steps.size
    val out = scala.collection.mutable.ListBuffer[Seq[Long]]()
    events.groupBy(_._2).foreach { case (user, evs) =>
      val lastA = Array.fill[Option[Vector[Long]]](n)(None)
      var lastU: Option[Long] = None
      val lastM = scala.collection.mutable.Map[Int, Long]()
      evs.sortBy(e => (e._4, e._1)).foreach { case (_, _, tpe, ts) =>
        // compute this row's prefixes from the PRE-row carries
        val a = Array.fill[Option[Vector[Long]]](n)(None)
        if (tpe == steps.head) a(0) = Some(Vector(ts))
        for (i <- 1 until n) {
          val prefix = lastA(i - 1)
          val untilOk = prefix.forall(p => lastU.forall(_ < p.last))
          val gapOk = prefix.forall(p =>
            missing.get(i).forall(_ => lastM.get(i).forall(_ <= p.last)))
          if (tpe == steps(i) && prefix.isDefined && untilOk && gapOk)
            a(i) = Some(prefix.get :+ ts)
        }
        a(n - 1).filter(p => p.last - p.head <= maxspanUs)
          .foreach(p => out += (user +: p) :+ (p.last - p.head))
        // post-row carry updates
        for (i <- 0 until n) if (a(i).isDefined) lastA(i) = a(i)
        if (until.contains(tpe)) lastU = Some(ts)
        missing.foreach { case (g, m) => if (m == tpe) lastM(g) = ts }
      }
    }
    out.toSeq.sortBy(r => (r.head, r(1), r(2)))
  }

  /** Brute-force all-chains reference: enumerate EVERY (ts, id)-monotone
    * chain through the step predicates within maxspan. O(n^k) — fine at
    * test scale, and definitionally the all-matches contract. */
  private def allChainsRef(events: Seq[(Long, Long, String, Long)],
                           steps: Seq[String], maxspanUs: Long): Seq[Seq[Long]] = {
    val out = scala.collection.mutable.ListBuffer[Seq[Long]]()
    events.groupBy(_._2).foreach { case (user, evs) =>
      def extend(chain: Vector[(Long, Long)], depth: Int): Unit = // (ts, id)
        if (depth == steps.size) {
          val ts = chain.map(_._1)
          if (ts.last - ts.head <= maxspanUs)
            out += (user +: ts) :+ (ts.last - ts.head)
        } else evs.foreach { case (id, _, tpe, ts) =>
          val succ = chain.isEmpty || ts > chain.last._1 ||
            (ts == chain.last._1 && id > chain.last._2)
          if (tpe == steps(depth) && succ &&
            (chain.isEmpty || ts - chain.head._1 <= maxspanUs))
            extend(chain :+ ((ts, id)), depth + 1)
        }
      extend(Vector.empty, 0)
    }
    import scala.math.Ordering.Implicits._
    out.toSeq.sorted
  }

  test("20 random sequences: all-matches equals the brute-force chain enumeration") {
    import spark.implicits._
    val rnd = new scala.util.Random(777L)
    (1 to 20).foreach { caseNo =>
      val nEvents = 40 + rnd.nextInt(40)
      val events = (1 to nEvents).map { i =>
        (i.toLong, (rnd.nextInt(4) + 1).toLong,
          Types(rnd.nextInt(3)), // a,b,c only — denser chains
          rnd.nextInt(25).toLong * 100000L) // coarse ts → frequent ties
      }
      val nSteps = 2 + rnd.nextInt(2)
      val steps = Seq.fill(nSteps)(Types(rnd.nextInt(3)))
      val q = "sequence by user_id with maxspan=1s " + steps.map(s =>
        s"""[ event where event_type == "$s" ]""").mkString(" ")
      val df = events.toDF("event_id", "user_id", "event_type", "ts_us")
      import scala.math.Ordering.Implicits._
      val got = Eql.runAllMatches(df, q).collect()
        .map(r => (0 until r.length).map(r.getLong).toSeq).toSeq.sorted
      val want = allChainsRef(events, steps, 1000000L)
      assert(got === want, s"case $caseNo query: $q")
      // and the default last-prefix output is always a subset
      val lastPrefix = Eql.run(df, q).collect()
        .map(r => (0 until r.length).map(r.getLong).toSeq).toSet
      assert(lastPrefix.subsetOf(got.toSet), s"case $caseNo subset: $q")
    }
  }

  /** Guarded all-chains reference: the brute-force enumeration with the
    * engine-pinned until/missing validity contract applied per extension
    * (expiry at-or-after the prefix's last step and row-strictly before
    * the completing row kills; a gap event strictly after the prefix's
    * last step and row-strictly before the completing row violates). */
  private def allChainsGuardedRef(events: Seq[(Long, Long, String, Long)],
                                  steps: Seq[String], maxspanUs: Long,
                                  until: Option[String],
                                  missing: Map[Int, String]): Seq[Seq[Long]] = {
    def rowLt(a: (Long, Long), b: (Long, Long)): Boolean = // (ts, id)
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    val out = scala.collection.mutable.ListBuffer[Seq[Long]]()
    events.groupBy(_._2).foreach { case (user, evs) =>
      def extend(chain: Vector[(Long, Long)], depth: Int): Unit =
        if (depth == steps.size) {
          val ts = chain.map(_._1)
          if (ts.last - ts.head <= maxspanUs)
            out += (user +: ts) :+ (ts.last - ts.head)
        } else evs.foreach { case (id, _, tpe, ts) =>
          val succ = chain.isEmpty || rowLt((chain.last._1, chain.last._2), (ts, id))
          val span = chain.isEmpty || ts - chain.head._1 <= maxspanUs
          val guards = chain.isEmpty || {
            val pts = chain.last._1
            val uOk = until.forall(u => !evs.exists { case (uid, _, ut, uts) =>
              ut == u && rowLt((uts, uid), (ts, id)) && uts >= pts })
            val mOk = missing.get(depth).forall(m => !evs.exists { case (mid, _, mt, mts) =>
              mt == m && rowLt((mts, mid), (ts, id)) && mts > pts })
            uOk && mOk
          }
          if (tpe == steps(depth) && succ && span && guards)
            extend(chain :+ ((ts, id)), depth + 1)
        }
      extend(Vector.empty, 0)
    }
    import scala.math.Ordering.Implicits._
    out.toSeq.sorted
  }

  test("20 random until/missing sequences: all-matches equals the guarded enumeration") {
    import spark.implicits._
    val rnd = new scala.util.Random(13131L)
    (1 to 20).foreach { caseNo =>
      val nEvents = 50 + rnd.nextInt(50)
      val events = (1 to nEvents).map { i =>
        (i.toLong, (rnd.nextInt(4) + 1).toLong,
          Types(rnd.nextInt(Types.size)), // a,b,c + e (until) + m (gap)
          rnd.nextInt(25).toLong * 100000L) // coarse ts → frequent ties
      }
      val nSteps = 2 + rnd.nextInt(2)
      val steps = Seq.fill(nSteps)(Types(rnd.nextInt(3)))
      val until = if (rnd.nextBoolean()) Some("e") else None
      val missing: Map[Int, String] =
        if (rnd.nextBoolean()) Map((1 + rnd.nextInt(nSteps - 1)) -> "m")
        else Map.empty
      val stepTxt = steps.zipWithIndex.map { case (s, i) =>
        val neg = missing.get(i + 1).map(m =>
          s""" ![ event where event_type == "$m" ]""").getOrElse("")
        s"""[ event where event_type == "$s" ]$neg"""
      }.mkString(" ")
      val untilTxt = until.map(u =>
        s""" until [ event where event_type == "$u" ]""").getOrElse("")
      val q = s"sequence by user_id with maxspan=1s $stepTxt$untilTxt"
      val df = events.toDF("event_id", "user_id", "event_type", "ts_us")
      import scala.math.Ordering.Implicits._
      val got = Eql.runAllMatches(df, q).collect()
        .map(r => (0 until r.length).map(r.getLong).toSeq).toSeq.sorted
      val want = allChainsGuardedRef(events, steps, 1000000L, until, missing)
      assert(got === want, s"case $caseNo query: $q")
      // the default last-prefix output obeys the same validity contract,
      // so it stays a subset of the guarded all-chains set
      val lastPrefix = Eql.run(df, q).collect()
        .map(r => (0 until r.length).map(r.getLong).toSeq).toSet
      assert(lastPrefix.subsetOf(got.toSet), s"case $caseNo subset: $q")
    }
  }

  test("48 random sequences equal the sequential last-prefix reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 48).foreach { caseNo =>
      val nEvents = 60 + rnd.nextInt(60)
      val events = (1 to nEvents).map { i =>
        (i.toLong, (rnd.nextInt(4) + 1).toLong,
          Types(rnd.nextInt(Types.size)),
          rnd.nextInt(30).toLong * 100000L) // coarse ts → frequent ties
      }
      val nSteps = 2 + rnd.nextInt(3)
      val steps = Seq.fill(nSteps)(Types(rnd.nextInt(3))) // from a,b,c
      val until = if (rnd.nextBoolean()) Some("e") else None
      // one missing gap half the time (gap index 1..nSteps-1, event "m")
      val missing: Map[Int, String] =
        if (rnd.nextBoolean()) Map((1 + rnd.nextInt(nSteps - 1)) -> "m")
        else Map.empty
      val stepTxt = steps.zipWithIndex.map { case (s, i) =>
        val neg = missing.get(i + 1).map(m =>
          s""" ![ event where event_type == "$m" ]""").getOrElse("")
        s"""[ event where event_type == "$s" ]$neg"""
      }.mkString(" ")
      val untilTxt = until.map(u =>
        s""" until [ event where event_type == "$u" ]""").getOrElse("")
      val q = s"sequence by user_id with maxspan=1s $stepTxt$untilTxt"
      val df = events.toDF("event_id", "user_id", "event_type", "ts_us")
      val got = Eql.run(df, q).collect()
        .map(r => (0 until r.length).map(r.getLong).toSeq).toSeq
        .sortBy(r => (r.head, r(1), r(2)))
      val want = reference(events, steps, 1000000L, until, missing)
      assert(got === want, s"case $caseNo query: $q")
    }
  }
}
