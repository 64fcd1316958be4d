package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.{Events, Retrieval, Scd2, Sketches}

/** Property tests for the round-8 analytics operators: randomized inputs
  * checked against straight-line in-memory reference implementations —
  * the laws the hand fixtures can't sweep (tie storms, empty stages,
  * dense duplicate timestamps).
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  // small domains force collisions: few users, coarse timestamps
  val changeGen: Gen[(Long, Long, String)] = for {
    u <- Gen.chooseNum(1L, 4L)
    t <- Gen.chooseNum(0L, 20L)
    a <- Gen.oneOf("A", "B", "C")
  } yield (u, t, a)

  test("scd2: probe ≡ brute-force interval containment on random feeds") {
    val gen = for {
      cs <- Gen.listOfN(15, changeGen)
      ps <- Gen.listOfN(12, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(-2L, 25L)))
    } yield (cs, ps)
    forAllSeeded(gen) { case (cs, ps) =>
      val changes = cs.zipWithIndex
        .map { case ((u, t, a), i) => (u, t, i.toLong, a) }
        .toDF("k", "t", "seq", "attr")
      val hist = Scd2.build(changes, "k", "t", "seq", Seq("attr"))
      val probes = ps.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("pid", "k", "t")
      val got = Scd2.probe(hist, probes, "k", "t", Seq("attr")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      // reference: per (user, ts) the LAST change (max seq) wins; probe
      // takes the latest change at-or-before its time
      val byUser = cs.zipWithIndex.map { case ((u, t, a), i) => (u, t, i, a) }
        .groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.maxBy(_._3)._4).toMap).toMap
      ps.zipWithIndex.foreach { case ((u, t), i) =>
        val expected = byUser.get(u)
          .flatMap { m =>
            val at = m.keys.filter(_ <= t)
            if (at.isEmpty) None else Some(m(at.max))
          }
        assert(got(i.toLong) == expected,
          s"probe(u=$u, t=$t): got ${got(i.toLong)}, expected $expected\nchanges=$cs")
      }
    }
  }

  test("funnel: matches an in-memory per-user simulation on random streams") {
    val evGen = for {
      u <- Gen.chooseNum(1L, 5L)
      et <- Gen.oneOf("a", "b", "c")
      t <- Gen.chooseNum(0L, 30L)
    } yield (u, et, t)
    forAllSeeded(Gen.listOfN(40, evGen)) { evs =>
      val df = evs.toDF("u", "et", "t")
      val got = Events.funnel(df, "u", "et", "t", Seq("a", "b", "c"))
        .orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
      // reference: sequential strict-after mins per user
      val byU = evs.groupBy(_._1)
      val s1 = byU.flatMap { case (u, es) =>
        val c = es.filter(_._2 == "a"); if (c.isEmpty) None else Some(u -> c.map(_._3).min)
      }
      val s2 = byU.flatMap { case (u, es) =>
        s1.get(u).flatMap { t1 =>
          val c = es.filter(e => e._2 == "b" && e._3 > t1)
          if (c.isEmpty) None else Some(u -> c.map(_._3).min)
        }
      }
      val s3 = byU.flatMap { case (u, es) =>
        s2.get(u).flatMap { t2 =>
          val c = es.filter(e => e._2 == "c" && e._3 > t2)
          if (c.isEmpty) None else Some(u -> c.map(_._3).min)
        }
      }
      assert(got == Seq(s1.size.toLong, s2.size.toLong, s3.size.toLong),
        s"funnel mismatch on $evs: got $got expected ${Seq(s1.size, s2.size, s3.size)}")
    }
  }

  test("countMin: est >= exact for EVERY value under random streams and widths") {
    val gen = for {
      vals <- Gen.listOfN(60, Gen.chooseNum(0, 15).map(i => s"v$i"))
      w <- Gen.oneOf(2, 8, 32)
    } yield (vals, w)
    forAllSeeded(gen) { case (vals, w) =>
      val df = vals.toDF("v")
      val cells = Sketches.countMinCells(df, "v", depth = 4, width = w)
      val exact = df.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val bad = Sketches.countMinEstimate(cells, exact, "v", depth = 4, width = w)
        .filter(col("est") < col("cnt")).count()
      assert(bad == 0L, s"one-sided bound violated at width=$w on $vals")
    }
  }

  test("triangleStats: census matches brute force on random graphs") {
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 7L), Gen.chooseNum(1L, 7L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
    forAllSeeded(edgeGen) { edges =>
      if (edges.nonEmpty) {
        val out = graft.ext.Graph.triangleStats(edges.toDF("a", "b"), "a", "b").head()
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val tri = (for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield 1).size.toLong
        val deg = nodes.map(n => edges.count(e => e._1 == n || e._2 == n).toLong)
        val wedges = deg.map(d => d * (d - 1) / 2).sum
        assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
          ((nodes.size.toLong, edges.size.toLong, wedges, tri)),
          s"census mismatch on $edges")
      }
    }
  }

  test("bpe: merge sequence matches an in-memory simulation") {
    val wordGen = Gen.listOfN(8,
      Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    forAllSeeded(wordGen, n = 6) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ext.Bpe.learnMerges(docs, "doc_id", "text", rounds = 3)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      // in-memory: same vocab-weighted pair counting and same
      // String.replace application (identical JVM semantics)
      var vocab = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .map { case (w, c) => (w.toCharArray.mkString(" "), c) }
        .groupBy(_._1).map { case (s, m) => (s, m.values.sum) }
      val sim = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var continue = true
      (1 to 3).foreach { _ =>
        if (continue) {
          val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          vocab.foreach { case (seq, cnt) =>
            val syms = seq.split(" ")
            syms.sliding(2).foreach {
              case Array(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + cnt
              case _ =>
            }
          }
          if (counts.isEmpty) continue = false
          else {
            val (pair, pc) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
            sim += ((pair._1, pair._2, pc))
            vocab = vocab.map { case (seq, cnt) =>
              (s" $seq ".replace(s" ${pair._1} ${pair._2} ", s" ${pair._1}${pair._2} ").trim, cnt)
            }.groupBy(_._1).map { case (s, m) => (s, m.values.sum) }
          }
        }
      }
      assert(got == sim.toSeq, s"bpe mismatch on $words: got $got expected $sim")
    }
  }

  test("curriculumPhases: matches the strictly-better ranking law") {
    val gen = Gen.listOfN(30, Gen.chooseNum(0L, 6L))
    forAllSeeded(gen) { scores =>
      val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val got = graft.ext.Sampling.curriculumPhases(df, "s", phases = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      scores.zipWithIndex.foreach { case (s, i) =>
        val better = scores.count(_ > s).toLong
        assert(got(i.toLong) == 4L * better / scores.size,
          s"phase mismatch for score $s in $scores")
      }
    }
  }

  test("lastTouchAttribution: matches a brute-force argmax on random streams") {
    val evGen = for {
      u <- Gen.chooseNum(1L, 4L)
      et <- Gen.oneOf("t1", "t2", "buy")
      t <- Gen.chooseNum(0L, 15L)
    } yield (u, et, t)
    forAllSeeded(Gen.listOfN(25, evGen)) { evs0 =>
      val evs = evs0.zipWithIndex.map { case ((u, et, t), i) =>
        (i.toLong, u, et, t, 0.0)
      }
      val df = evs.toDF("event_id", "user_id", "event_type", "ts_us", "value")
      val got = Events.lastTouchAttribution(df, "user_id", "event_type",
          "ts_us", "event_id", "buy", Seq("value"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
      evs.filter(_._3 == "buy").foreach { case (id, u, _, t, _) =>
        // latest touch at-or-before t; per-instant ties by max event_id
        val touches = evs.filter(e => e._2 == u && e._3 != "buy" && e._4 <= t)
        val expected =
          if (touches.isEmpty) None
          else Some(touches.maxBy(e => (e._4, e._1))._3)
        assert(got(id) == expected,
          s"attribution mismatch for conv $id in $evs: got ${got(id)}, expected $expected")
      }
    }
  }

  test("retentionCohorts: matches a per-user in-memory computation") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 4L)))
    val week = 7L * 24 * 3600 * 1000000L
    forAllSeeded(gen) { uw0 =>
      val evs = uw0.map { case (u, wk) => (u, wk * week + u) } // offset inside week
      val got = Events.retentionCohorts(evs.toDF("u", "t"), "u", "t")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val ref = uw0.distinct.groupBy(_._1).toSeq.flatMap { case (_, ws) =>
        val c = ws.map(_._2).min
        ws.map(_._2).distinct.map(w => (c, w - c))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == ref, s"cohort mismatch on $uw0")
    }
  }

  test("rrfFuse: fused ranking matches an in-memory reference") {
    val listGen = Gen.listOfN(6, Gen.chooseNum(1L, 9L)).map(_.distinct)
    forAllSeeded(Gen.zip(listGen, listGen)) { case (l1, l2) =>
      if (l1.nonEmpty && l2.nonEmpty) {
        def df(ids: Seq[Long]) = ids.zipWithIndex
          .map { case (id, i) => ("q", i + 1, id) }.toDF("query_id", "rank", "id")
        val got = Retrieval.rrfFuse(Seq(df(l1), df(l2)), "id", k = 20)
          .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
        def contrib(ids: Seq[Long]) = ids.zipWithIndex
          .map { case (id, i) => id -> 1000000000000L / (60L + i + 1) }.toMap
        val c1 = contrib(l1); val c2 = contrib(l2)
        val expected = (c1.keySet ++ c2.keySet).toSeq
          .map(id => (id, c1.getOrElse(id, 0L) + c2.getOrElse(id, 0L)))
          .sortBy { case (id, s) => (-s, id) }
        assert(got == expected, s"rrf mismatch: l1=$l1 l2=$l2")
      }
    }
  }
}
