package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (fixed-seed, deterministic) properties for the distributed
  * rewrites: each must agree with its naive / single-partition formulation
  * on arbitrary data — sparse keys, duplicate-free random series, random
  * block counts.
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("stitched trailing window ≡ single-partition window on random sparse series") {
    for (trial <- 0 until 8) {
      val rnd = new Random(11 + trial)
      val n = rnd.between(1, 80)
      // Distinct keys with irregular gaps INSIDE the documented exactness
      // domain (every consecutive gap < bucketSpan, up to span−1 so bucket
      // boundaries and multi-hop carries genuinely engage). Out-of-domain
      // series (gap ≥ span) are excluded by contract, not by seed luck.
      val span = rnd.between(3, 20).toLong
      val keys = Iterator.iterate(rnd.between(0L, 5L))(k => k + rnd.between(1L, span))
        .take(n).toSeq
      val frame = rnd.between(1, 8)
      val df = keys.map(k => (k, rnd.between(-50, 50).toDouble))
        .toDF("day", "n").repartition(4)
      val stitched = Windowed.trailingStitched(df, "day", "n", frame, c => avg(c), "ma", span)
        .select($"day", $"ma").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"day").rowsBetween(-frame, 0)
      val global = df.select($"day", avg($"n").over(w).as("ma"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(stitched.toSeq == global.toSeq, s"trial $trial frame=$frame span=$span keys=$keys")
    }
  }

  test("stitched lag ≡ single-partition lag window on random series") {
    for (trial <- 0 until 6) {
      val rnd = new Random(91 + trial)
      val n = rnd.between(0, 120)
      // Distinct keys (duplicate keys make any lag's order unspecified),
      // arbitrary gaps — lagStitched has no cadence precondition.
      val keys = rnd.shuffle((0L until 1000L).toList).take(n)
      val rows = keys.map(k => (k, rnd.between(-100, 100).toDouble))
      val df = rows.toDF("t", "v").repartition(5)
      val got = Windowed.lagStitched(df, Seq("t"), "v", "lv")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
        .sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      val naive = sorted.zipWithIndex.map { case ((k, _), i) =>
        (k, if (i == 0) Double.NaN else sorted(i - 1)._2)
      }
      assert(got.toSeq.map(_.toString) == naive.map(_.toString), s"trial $trial n=$n")
    }
  }

  test("stitched running sum ≡ single-partition cumulative window on random series") {
    for (trial <- 0 until 6) {
      val rnd = new Random(53 + trial)
      val n = rnd.between(0, 150)
      // Integral values: the distributed prefix sum is then bit-exact
      // regardless of addition order (documented domain).
      val keys = rnd.shuffle((0L until 2000L).toList).take(n)
      val rows = keys.map(k => (k, rnd.between(0, 500).toLong))
      val df = rows.toDF("k", "v").repartition(5)
      val got = Windowed.runningSumStitched(df, Seq("k"), "v", "cum")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      val naive = sorted.zipWithIndex.map { case ((k, _), i) =>
        (k, sorted.take(i + 1).map(_._2).sum.toDouble)
      }
      assert(got.toSeq == naive, s"trial $trial n=$n")
    }
  }

  test("pack by budget ≡ sequential concat-then-chunk walk on random corpora") {
    for (trial <- 0 until 5) {
      val rnd = new Random(71 + trial)
      val n = rnd.between(0, 60)
      val docs = (0 until n).map { i =>
        (i.toLong * rnd.between(1, 4), // sparse, non-contiguous ids
          Seq.fill(rnd.between(0, 12))("w").mkString(" "))
      }.distinctBy(_._1)
      val budget = rnd.between(1, 20).toLong
      val got = Text.packByBudget(docs.toDF("doc_id", "text"), budget)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
      var cum = 0L
      val naive = docs.sortBy(_._1).map { case (id, text) =>
        val t = text.split(" ").count(_.nonEmpty).toLong
        val row = (id, cum / budget, cum % budget)
        cum += t
        row
      }
      assert(got.toSeq == naive, s"trial $trial budget=$budget")
    }
  }

  test("asof join ≡ naive latest-at-or-before scan on random data") {
    for (trial <- 0 until 6) {
      val rnd = new Random(37 + trial)
      val leftRows = (0 until rnd.between(1, 60)).map(i =>
        (i.toLong, rnd.between(0L, 6L), rnd.between(0L, 100L)))
      val rightRows = (0 until rnd.between(0, 80)).map(i =>
        (rnd.between(0L, 6L), rnd.between(0L, 100L), i.toLong))
      val left = leftRows.toDF("eid", "k", "t").repartition(3)
      val right = rightRows.toDF("k", "rt", "ok").repartition(3)
      val got = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("ok"), "ok")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .sortBy(_._1)
      val naive = leftRows.map { case (eid, k, t) =>
        val cand = rightRows.filter(r => r._1 == k && r._2 <= t)
        (eid, if (cand.isEmpty) -1L else cand.maxBy(r => (r._2, r._3))._3)
      }.sortBy(_._1)
      assert(got.toSeq == naive, s"trial $trial")
    }
  }

  test("asof join directions/tolerance ≡ naive nearest-bounded scan on random data") {
    for (trial <- 0 until 8) {
      val rnd = new Random(43 + trial)
      val leftRows = (0 until rnd.between(1, 50)).map(i =>
        (i.toLong, rnd.between(0L, 6L), rnd.between(0L, 100L)))
      val rightRows = (0 until rnd.between(0, 70)).map(i =>
        (rnd.between(0L, 6L), rnd.between(0L, 100L), i.toLong))
      val direction = if (rnd.nextBoolean()) "backward" else "forward"
      val tol = if (rnd.nextBoolean()) None else Some(rnd.between(0L, 30L))
      val left = leftRows.toDF("eid", "k", "t").repartition(3)
      val right = rightRows.toDF("k", "rt", "ok").repartition(3)
      val got = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("ok"), "ok", direction, tol)
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .sortBy(_._1)
      val naive = leftRows.map { case (eid, k, t) =>
        val cand =
          if (direction == "backward")
            rightRows.filter(r => r._1 == k && r._2 <= t && tol.forall(t - r._2 <= _))
          else
            rightRows.filter(r => r._1 == k && r._2 >= t && tol.forall(r._2 - t <= _))
        val best =
          if (cand.isEmpty) -1L
          else if (direction == "backward") cand.maxBy(r => (r._2, r._3))._3
          else cand.minBy(r => (r._2, -r._3))._3
        (eid, best)
      }.sortBy(_._1)
      assert(got.toSeq == naive, s"trial $trial direction=$direction tol=$tol")
    }
  }

  test("block-grid pair kernel ≡ declarative nested-loop join on random vectors") {
    for (trial <- 0 until 4) {
      val rnd = new Random(23 + trial)
      val n = rnd.between(2, 40)
      val dim = rnd.between(2, 8)
      // Sparse, non-contiguous ids: block assignment must not assume density.
      val vecs = (0 until n).map { i =>
        (i.toLong * rnd.between(1, 5) + rnd.between(0, 3),
          Array.fill(dim)(rnd.between(-10, 10).toFloat))
      }.distinctBy(_._1).toDF("vec_id", "embedding")
      val threshold = rnd.between(-5, 8) / 10.0
      val blocks = rnd.between(1, 9)
      val kern = Similarity.pairsAbove(vecs, threshold, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val expr = Similarity.pairsAboveExpr(vecs, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(kern == expr, s"trial $trial blocks=$blocks threshold=$threshold")
    }
  }

  test("bloom semi-join ≡ plain left-semi join on random key sets") {
    for (trial <- 0 until 5) {
      val rnd = new Random(47 + trial)
      // Overlapping and disjoint key ranges, duplicate probe rows, random
      // bitmap sizes down to saturation (64 bits) — exactness must hold
      // through any false-positive rate.
      val probe = Seq.fill(rnd.between(1, 120))(
        (rnd.between(0L, 60L), rnd.between(0, 5))).toDF("k", "v")
      val builds = Seq.fill(rnd.between(1, 25))(Tuple1(rnd.between(0L, 90L)))
        .toDF("bk")
      val bits = 1 << rnd.between(6, 14)
      val hashes = rnd.between(1, 5)
      val expected = probe.join(builds, probe("k") === builds("bk"), "left_semi")
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val got = Joins.bloomSemiJoin(probe, builds, "k", "bk", bits, hashes)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(got == expected, s"trial $trial bits=$bits hashes=$hashes")
    }
  }

  test("salted replicated join ≡ plain inner join on random skewed data") {
    for (trial <- 0 until 4) {
      val rnd = new Random(31 + trial)
      // Hot key 0 takes ~half the probe rows; exact duplicate rows included.
      val probe = Seq.fill(rnd.between(1, 150))(
        (if (rnd.nextBoolean()) 0L else rnd.between(0L, 8L), rnd.between(0, 3)))
        .toDF("k", "v")
      // Small side with duplicate join keys (multi-match fan-out must survive).
      val dim = Seq.fill(rnd.between(1, 12))(
        (rnd.between(0L, 8L), rnd.between(0, 100))).toDF("dk", "d")
      val replicate = rnd.between(1, 7)
      val expected = probe.join(dim, probe("k") === dim("dk"))
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val got = Joins.saltedRepJoin(probe, dim, "k", "dk", replicate)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(got == expected, s"trial $trial replicate=$replicate")
    }
  }

  test("funnel steps ≡ naive per-user first-touch simulation on random logs") {
    val types = Seq("a", "b", "c")
    for (trial <- 0 until 5) {
      val rnd = new Random(77 + trial)
      val events = Seq.fill(rnd.between(5, 200))(
        (rnd.between(0L, 12L), types(rnd.between(0, 3)), rnd.between(0L, 50L)))
      val within = rnd.between(3L, 15L)
      // Duplicate (user, type, time) rows are fine: min() dedups arrivals.
      val df = events.toDF("user_id", "event_type", "time").repartition(3)
      def naive(): Seq[Long] = {
        val byUser = events.groupBy(_._1)
        val reach = Array.fill(3)(0L)
        for ((_, evs) <- byUser) {
          var t = evs.filter(_._2 == "a").map(_._3).minOption
          var step = 0
          while (t.isDefined && step < 3) {
            reach(step) += 1
            step += 1
            if (step < 3) {
              val t0 = t.get
              t = evs.filter(e => e._2 == types(step) && e._3 > t0 && e._3 <= t0 + within)
                .map(_._3).minOption
            }
          }
        }
        reach.toSeq
      }
      val got = Funnel.steps(df, types, within)
        .collect().map(r => r.getLong(2)).toSeq
      assert(got == naive(), s"trial $trial within=$within")
    }
  }

  test("repeated n-gram spans ≡ naive positional recount on random corpora") {
    val vocab = Array("a", "b", "c", "d")
    for (trial <- 0 until 5) {
      val rnd = new Random(19 + trial)
      val docs = (0 until rnd.between(1, 25)).map(i =>
        (i.toLong * rnd.between(1, 3),
          Seq.fill(rnd.between(0, 10))(vocab(rnd.between(0, 4))).mkString(" ")))
        .distinctBy(_._1)
      val n = rnd.between(1, 4)
      val minDf = rnd.between(2, 5).toLong
      val got = Text.repeatedNgramSpans(docs.toDF("doc_id", "text"), n, minDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      val grams = docs.flatMap { case (id, text) =>
        val ts = text.split(" ").filter(_.nonEmpty)
        (0 to ts.length - n).map(p => (id, p.toLong, ts.slice(p, p + n).mkString(" ")))
      }
      val dfOf = grams.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      val naive = grams.filter(g => dfOf(g._3) >= minDf)
        .map(g => (g._1, g._2, g._3, dfOf(g._3))).sortBy(t => (t._1, t._2))
      assert(got.toSeq == naive, s"trial $trial n=$n minDf=$minDf")
    }
  }

  test("ngram contamination ≡ naive overlap recount on random corpora") {
    val vocab = Array("a", "b", "c", "d", "e")
    def text(rnd: Random): String =
      Seq.fill(rnd.between(0, 12))(vocab(rnd.between(0, 5))).mkString(" ")
    for (trial <- 0 until 5) {
      val rnd = new Random(83 + trial)
      val train = (0 until rnd.between(1, 20)).map(i => (i.toLong, text(rnd)))
      val evalD = (0 until rnd.between(1, 8)).map(i => (100L + i, text(rnd)))
      val n = rnd.between(1, 4)
      val got = Text.ngramContamination(
        train.toDF("doc_id", "text"), evalD.toDF("doc_id", "text"), n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      def gramsOf(t: String): Seq[String] = {
        val ts = t.split(" ").filter(_.nonEmpty)
        (0 to ts.length - n).map(p => ts.slice(p, p + n).mkString(" "))
      }
      val evalSet = evalD.flatMap(d => gramsOf(d._2)).toSet
      val naive = train.map { case (id, t) =>
        val gs = gramsOf(t)
        val hits = gs.count(evalSet.contains).toLong
        val ratio = BigDecimal(hits.toDouble / math.max(gs.length, 1).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, gs.length.toLong, hits, ratio)
      }.sortBy(_._1)
      assert(got.toSeq == naive, s"trial $trial n=$n")
    }
  }

  test("semantic dedup at one cluster ≡ global embedding near-dups on random vectors") {
    for (trial <- 0 until 4) {
      val rnd = new Random(59 + trial)
      val dim = rnd.between(2, 6)
      val vecs = (0 until rnd.between(2, 30)).map { i =>
        (i.toLong * rnd.between(1, 4), Array.fill(dim)(rnd.between(-10, 10).toFloat))
      }.distinctBy(_._1).toDF("vec_id", "embedding")
      val threshold = rnd.between(2, 10) / 10.0
      val semantic = Dedup.semanticDedup(vecs, nClusters = Some(1), rounds = 1, threshold)
        .select($"vec_id", $"rep_id", $"is_dup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      val global = Dedup.embeddingNearDups(vecs, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(semantic.toSeq == global.toSeq, s"trial $trial threshold=$threshold")
    }
  }

  test("mixture apply ≡ naive per-row hash threshold on random plans") {
    def knuth(id: Long): Long =
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
    for (trial <- 0 until 5) {
      val rnd = new Random(29 + trial)
      val srcs = Seq("s0", "s1", "s2", "s3").take(rnd.between(1, 5))
      val rows = (0 until rnd.between(1, 80)).map(i =>
        (i.toLong * rnd.between(1, 3), srcs(rnd.between(0, srcs.length)),
          rnd.between(1L, 50L))).distinctBy(_._1)
      val weights = srcs.take(rnd.between(0, srcs.length + 1))
        .map(s => s -> rnd.between(0, 11) / 10.0).toMap
      val defaultW = rnd.between(0, 11) / 10.0
      val budget = rnd.between(1L, 2000L)
      val df = rows.toDF("id", "src", "n").repartition(3)
      val plan = Sampling.mixturePlan(df, "src", "n", weights, defaultW, budget)
      val got = Sampling.applyMixturePlan(df, plan, "src", "id")
        .collect().map(r => (r.getLong(0))).sorted.toSeq
      val avail = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val naive = rows.filter { case (id, s, _) =>
        val w = weights.getOrElse(s, defaultW)
        val desired = math.floor(w * budget.toDouble)
        val frac = math.min(1.0, desired / math.max(avail(s), 1L).toDouble)
        knuth(id) < math.floor(frac * 4294967296.0).toLong
      }.map(_._1).sorted
      assert(got == naive, s"trial $trial budget=$budget weights=$weights default=$defaultW")
    }
  }

  test("sessionIds ≡ naive per-key gap walk on random event logs") {
    for (trial <- 0 until 6) {
      val rnd = new Random(67 + trial)
      val events = (0 until rnd.between(1, 120)).map(i =>
        (i.toLong, rnd.between(0L, 5L), rnd.between(0L, 200L)))
      val gap = rnd.between(1L, 40L)
      val got = Windowed.sessionIds(
        events.toDF("id", "k", "ts").repartition(3), "k", "ts", gap)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
      val naive = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
        // Sort by (ts, id) — any tie order yields the same seq values.
        val sorted = evs.sortBy(e => (e._3, e._1))
        var seq = 0L
        var prev = Long.MinValue
        sorted.map { case (id, _, ts) =>
          if (prev == Long.MinValue || ts - prev >= gap) seq += 1
          prev = ts
          (id, seq)
        }
      }.sortBy(_._1)
      assert(got.toSeq == naive, s"trial $trial gap=$gap")
    }
  }

  test("zvalue ≡ bit-interleave reference on random coordinates") {
    def zRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    for (trial <- 0 until 3) {
      val rnd = new Random(13 + trial)
      val bits = rnd.between(1, 20)
      val max = 1L << math.min(bits + 3, 30) // also exercise wrap-around (mod 2^bits)
      val pts = Seq.fill(300)((rnd.between(0L, max), rnd.between(0L, max)))
      val got = pts.toDF("x", "y")
        .select($"x", $"y", Layout.zvalue($"x", $"y", bits).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (x, y, z) =>
        assert(z == zRef(x, y, bits), s"trial $trial bits=$bits ($x, $y)")
      }
    }
  }

  test("containment pairs ≡ naive shingle-set containment on random corpora") {
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 0 until 4) {
      val rnd = new Random(37 + trial)
      val docs = (0 until 30).map { i =>
        val n = rnd.between(3, 25)
        (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val t = 0.3 + rnd.nextInt(5) / 10.0
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"), n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
        .sortBy(p => (p._1, p._2))
      def sh(s: String): Set[Seq[String]] =
        s.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3).map(_.toSeq).toSet
      val naive = for {
        (i, ti) <- docs; (j, tj) <- docs if i < j
        si = sh(ti); sj = sh(tj) if si.nonEmpty && sj.nonEmpty
        ov = (si & sj).size
        c1 = BigDecimal(ov.toDouble / si.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        c2 = BigDecimal(ov.toDouble / sj.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if math.max(c1, c2) >= t
      } yield (i, j, c1, c2)
      assert(got.toSeq == naive.sortBy(p => (p._1, p._2)), s"trial $trial t=$t")
    }
  }

  test("sharedSpanPairs ≡ naive distinct-L-gram intersection counts on random corpora") {
    for (trial <- 0 until 6) {
      val rnd = new Random(313 + trial)
      val vocab = Vector("data", "spark", "fast", "slow", "table", "row", "agg", "key")
      val nDocs = rnd.between(3, 12)
      val L = rnd.between(2, 4)
      val docs = (0L until nDocs.toLong).map { id =>
        val n = rnd.between(0, 14)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val minShared = rnd.between(1, 3)
      val got = Dedup.sharedSpanPairs(docs.toDF("doc_id", "text"),
          spanTokens = L, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      def grams(t: String): Set[String] = {
        val ts = t.split(" ").filter(_.nonEmpty)
        if (ts.length < L) Set.empty
        else ts.sliding(L).map(_.mkString(" ")).toSet
      }
      val naive = for {
        (i, ti) <- docs; (j, tj) <- docs if i < j
        ov = (grams(ti) intersect grams(tj)).size.toLong
        if ov >= minShared
      } yield (i, j, ov)
      assert(got == naive.sortBy(p => (p._1, p._2)), s"trial $trial L=$L m=$minShared")
    }
  }

  test("shardManifest ≡ naive hash-mod grouping with (hash, id) endpoints on random ids") {
    for (trial <- 0 until 6) {
      val rnd = new Random(717 + trial)
      val ids = rnd.shuffle((0L until 4000L).toList).take(rnd.between(1, 120))
      val nShards = rnd.between(1, 9)
      val rows = ids.map(id => (id, rnd.between(0L, 500L)))
      val got = Sampling.shardManifest(rows.toDF("doc_id", "n_chars"),
          nShards, "doc_id", "n_chars")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val naive = rows.groupBy { case (id, _) => Sampling.idHashLong(id) % nShards }
        .map { case (shard, members) =>
          val ordered = members.map(_._1).sortBy(id => (Sampling.idHashLong(id), id))
          (shard, members.size.toLong, members.map(_._2).sum,
            ordered.head, ordered.last)
        }.toSeq.sortBy(_._1)
      assert(got == naive, s"trial $trial nShards=$nShards")
    }
  }

  test("pageRankInt mass accounting: totals bounded, floors lose at most edges+nodes units per step") {
    for (trial <- 0 until 4) {
      val rnd = new Random(929 + trial)
      val n = rnd.between(2, 12)
      val nodes = (0L until n.toLong).toList
      val edges = (for {
        a <- nodes; b <- nodes if a != b && rnd.nextInt(4) == 0
      } yield (a, b))
      if (edges.nonEmpty) {
        val iters = rnd.between(1, 4)
        val pr = Graph.pageRankInt(nodes.toDF("id"), edges.toDF("src", "dst"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val S = 1000000000000L
        // Every node holds at least the teleport floor; nothing exceeds S.
        val tele = (3L * S) / (20L * n)
        assert(pr.values.forall(v => v >= tele && v <= S), pr.toString)
        // Dangling evaporation + floors only LOSE mass: total ≤ S.
        assert(pr.values.sum <= S, s"total ${pr.values.sum}")
      }
    }
  }
}
