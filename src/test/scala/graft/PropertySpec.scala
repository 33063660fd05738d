package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cols
import graft.operators.{AsOfJoin, Dedup, Sessionize}

/** Property-based invariants (SURVEY.md §5 strategy #3) over generated
  * inputs — the invariants hold by construction of the operators, so the
  * properties are deterministic, not statistical. Generators are driven
  * with fixed seeds (no scalatest-scalacheck bridge in the offline deps,
  * and fixed seeds keep CI deterministic anyway). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sample `n` deterministic cases from a generator. */
  private def cases[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    cases(gen).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val eventTypes = Seq("view", "click", "purchase", "signup", "error")

  private val eventsGen: Gen[List[(Long, Long, Long, String, Double)]] =
    Gen.listOfN(120, for {
      user <- Gen.choose(0L, 5L)
      ts   <- Gen.choose(1700000000L, 1700000000L + 7 * 86400L)
      tpe  <- Gen.oneOf(eventTypes)
      v    <- Gen.choose(1, 50000).map(_ / 100.0)
    } yield (user, ts, tpe, v)).map(_.zipWithIndex.map {
      case ((u, ts, t, v), i) => (i.toLong, ts, u, t, v)
    })

  private def toDf(rows: List[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "ts_sec", "user_id", "event_type", "value")
      // event_id must be monotone in event time per the sessionizer contract
      .withColumn("event_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts_sec"), col("event_id"))).cast("long"))

  test("sessionization invariants hold for arbitrary event sets") {
    forAll(eventsGen) { rows =>
      whenever(rows.nonEmpty) {
        val sm = Sessionize.sessionMetrics(toDf(rows))
        val bad = sm.where(
          col("page_views") + col("clicks") + col("signups") + col("errors") + col("purchases") =!= col("total_events")
            || (col("converted") =!= (col("purchases") > 0))
            || col("end_sec") < col("start_sec"))
        assert(bad.count() == 0)
        // every event lands in exactly one session
        assert(sm.agg(sum(col("total_events"))).head().getLong(0) == rows.size)
      }
    }
  }

  test("exact dedup always removes an injected duplicate and nothing else") {
    val textGen = Gen.listOfN(10,
      Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" ")))
    forAll(textGen) { texts =>
      whenever(texts.nonEmpty) {
        val docs = (texts :+ texts.head).zipWithIndex // inject dup of first text
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val deduped = Dedup.exactDeduped(docs)
        assert(deduped.count() == texts.distinct.size)
        // canonical row (lowest doc_id) always survives
        assert(deduped.where(col("doc_id") === 0).count() == 1)
      }
    }
  }

  test("floor quantization: q4(x) is within (x-1e-4, x] for arbitrary ratios") {
    val ratioGen = Gen.listOfN(50, for {
      num <- Gen.choose(0L, 1000000L)
      den <- Gen.choose(1L, 1000000L)
    } yield (num, den))
    forAll(ratioGen) { pairs =>
      val df = pairs.toDF("num", "den")
        .select((col("num").cast("double") / col("den").cast("double")).as("x"))
        .select(col("x"), Cols.q4(col("x")).cast("double").as("q"))
      val bad = df.where(col("q") > col("x") || col("x") - col("q") >= 1e-4 + 1e-12)
      assert(bad.count() == 0)
    }
  }

  test("minhash signature is permutation-stable: identical docs share signatures") {
    val textGen = Gen.listOfN(6,
      Gen.listOfN(20, Gen.oneOf((1 to 30).map(i => s"tok$i"))).map(_.mkString(" ")))
    forAll(textGen) { texts =>
      whenever(texts.nonEmpty) {
        val docs = (texts ++ texts).zipWithIndex // every doc duplicated
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val sigs = Dedup.signatures(docs)
          .select(col("doc_id"), col("sig")).as[(Long, Seq[Long])].collect().toMap
        texts.indices.foreach { i =>
          assert(sigs(i.toLong) == sigs((i + texts.size).toLong))
        }
      }
    }
  }

  test("as-of join: native operator == composition == in-memory model on random events") {
    forAll(eventsGen) { rows =>
      val events = toDf(rows)
      val composed = AsOfJoin.purchaseAttribution(events)
        .collect().map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).toSeq
      val native = AsOfJoin.purchaseAttributionNative(events)
        .collect().map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).toSeq
      assert(native == composed)
      // in-memory reference model over the same rows toDf produces (toDf
      // re-ranks event_id monotone in (ts, original id)):
      val ranked = rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((_, ts, u, t, v), i) => (i.toLong + 1, ts, u, t, v) }
      val views = ranked.filter(_._4 == "view")
      val expected = ranked.filter(_._4 == "purchase").sortBy(_._1).map { p =>
        val cand = views.filter(v => v._3 == p._3 && v._2 <= p._2)
        val best = if (cand.isEmpty) None else Some(cand.maxBy(v => (v._2, v._1)))
        (p._1, best.map(_._1), best.map(v => p._2 - v._2))
      }
      assert(composed == expected.map { case (id, v, l) =>
        (id, v.map(x => x: Any), l.map(x => x: Any)) })
    }
  }

  test("distributed decile rank mapping == Spark's own ntile on arbitrary order sets") {
    // the bucket-offset + integer tile rule in Relational.decilesByValue is
    // hand-derived; pin it against the engine-native ntile over random
    // sizes (including n < 10, n % 10 != 0) and clustered values (many
    // rows landing in one histogram bucket)
    val ordersGen: Gen[List[(Long, Double)]] = for {
      n    <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, Gen.choose(1, 400000).map(_ / 100.0))
    } yield rows.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    forAll(ordersGen) { rows =>
      val df = rows.toDF("o_orderkey", "o_totalprice")
      df.createOrReplaceTempView("prop_orders")
      val expected = spark.sql(
        """SELECT decile, count(*) AS orders FROM (
          |  SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
          |  FROM prop_orders)
          |GROUP BY decile ORDER BY decile""".stripMargin)
        .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).toSeq
      val got = graft.operators.Relational.decilesByValue(df)
        .select("decile", "orders")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, s"n=${rows.size}: $got != $expected")
    }
  }

  test("triangle-blocked all-pairs == crossJoin reference on random embedding sets") {
    // exactPairsBlocked's block-pair coverage argument (each unordered pair
    // under exactly one key; diagonal deduped by id order) is hand-derived
    // — pin it against the crossJoin form over random sizes, block counts,
    // duplicate vectors, and ids that collide into few blocks
    val embGen: Gen[(Int, List[(Long, List[Float])])] = for {
      b    <- Gen.oneOf(1, 2, 5, 9)
      n    <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 25.0f)))
    } yield (b, rows.zipWithIndex.map { case (v, i) => (i * 7L, v) })
    forAll(embGen) { case (b, rows) =>
      val nonZero = rows.filter(_._2.exists(_ != 0.0f)) // zero vecs: norm 0
      whenever(nonZero.nonEmpty) {
        val df = nonZero.toDF("vec_id", "embedding")
        val ref = graft.operators.Similarity.nearDupCosineExact(df, -2.0)
          .collect().map(_.toString).toSet
        val blocked = graft.operators.Similarity.exactPairsBlocked(df, -2.0, b)
          .collect().map(_.toString)
        assert(blocked.length == blocked.toSet.size, s"B=$b: duplicate pairs")
        assert(blocked.toSet == ref, s"B=$b n=${nonZero.size}")
      }
    }
  }

  test("weighted quantiles == in-memory cumulative-weight model on random line sets") {
    // lower weighted quantile: first row in (cents, okey, lineno) order
    // whose cumulative weight reaches ceil(q*W) — the engine reaches the
    // same cumulative weights via bucket-histogram offsets, never a sort
    val gen: Gen[List[(Long, Long, Double, Long)]] = for {
      n    <- Gen.choose(1, 100)
      rows <- Gen.listOfN(n, for {
        p <- Gen.choose(1, 400000).map(_ / 100.0)
        w <- Gen.choose(1L, 50L)
      } yield (p, w))
    } yield rows.zipWithIndex.map { case ((p, w), i) =>
      (i.toLong, (i % 7).toLong, p, w)
    }
    forAll(gen) { rows =>
      val df = rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      val got = graft.operators.Relational.weightedQuantiles(df).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sorted = rows.map { case (ok, ln, p, w) => (math.round(p * 100), ok, ln, w) }
        .sortBy(t => (t._1, t._2, t._3))
      val totalW = sorted.map(_._4).sum
      for ((label, nu, de) <- Seq(("p25", 1L, 4L), ("p50", 2L, 4L), ("p75", 3L, 4L))) {
        val threshold = (totalW * nu + de - 1) / de
        var cw = 0L
        val crossing = sorted.find { t => cw += t._4; cw >= threshold }.get
        assert(got(label) == crossing._1.toDouble / 100.0,
          s"$label: ${got(label)} != ${crossing._1 / 100.0} (W=$totalW T=$threshold)")
      }
    }
  }

  test("Theil-Sen slope is invariant in numBlocks on random daily series") {
    // the B-sizing scaladoc rule promises B changes only task granularity,
    // never the answer: same pair set (block-pair coverage), same exact
    // median selection — pin B ∈ {1, 8, 16} identical on random frames,
    // including B=16 > days (some block-pair keys then carry zero pairs)
    val dailyGen: Gen[List[(java.sql.Date, BigDecimal)]] = for {
      n    <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n, Gen.choose(1, 400000).map(c => BigDecimal(c) / 100))
    } yield rows.zipWithIndex.map { case (p, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i * 3)), p)
    }
    cases(dailyGen, 3).foreach { rows =>
      val df = rows.toDF("o_orderdate", "o_totalprice")
      val got = Seq(1, 8, 16).map { b =>
        val r = graft.operators.Stats.theilSenDailyRevenue(df, numBlocks = b).head()
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_cents_per_day"))
      }
      assert(got.distinct.size == 1, s"block-count variance: $got")
      val days = rows.size.toLong
      assert(got.head._1 == days * (days - 1) / 2, s"pair count: $got")
    }
  }

  test("interpolated quantiles == one-window percentile_cont rule on random order sets") {
    val ordersGen: Gen[List[(Long, Double)]] = for {
      n    <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, Gen.choose(1, 400000).map(_ / 100.0))
    } yield rows.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    forAll(ordersGen) { rows =>
      val df = rows.toDF("o_orderkey", "o_totalprice")
      val got = graft.operators.Relational.quantilesCont(df).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // in-memory model of the exact engine rule (cents, (n-1)*q selection)
      val cents = rows.map(r => math.round(r._2 * 100)).sorted
      val n = cents.length
      for ((label, nu, de) <- Seq(("p25", 1L, 4L), ("p50", 2L, 4L), ("p75", 3L, 4L))) {
        val pos = (n - 1) * nu
        val lo = (pos / de).toInt
        val rem = pos % de
        val hiV = if (lo + 1 < n) cents(lo + 1) else cents(lo)
        val exp = (cents(lo).toDouble
          + (rem.toDouble / de.toDouble) * (hiV.toDouble - cents(lo).toDouble)) / 100.0
        assert(got(label) == exp, s"$label n=$n: ${got(label)} != $exp")
      }
    }
  }

  test("prefix-filter jaccard join == brute force at several thresholds on random corpora") {
    // guards the whole filter stack (hash join keys, probe prefix,
    // aggregated positional filter, two-tier verification): every filter
    // must be lossless at any rational threshold. Docs draw from a small
    // shared vocabulary so near-dup pairs actually occur.
    val corpusGen: Gen[List[(Long, String)]] = for {
      n    <- Gen.choose(8, 40)
      docs <- Gen.listOfN(n, for {
        len  <- Gen.choose(3, 24)
        toks <- Gen.listOfN(len, Gen.choose(0, 30).map(i => s"w$i"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val ids  = docs.select(col("doc_id"))
      val allPairs = ids.select(col("doc_id").as("doc_a"))
        .crossJoin(ids.select(col("doc_id").as("doc_b")))
        .where(col("doc_a") < col("doc_b"))
      val exactJ = Dedup.verifyJaccard(docs, allPairs)
      for ((num, den) <- Seq((1, 3), (1, 2), (2, 3), (3, 4))) {
        val brute = exactJ.where(col("jaccard") >= lit(num).cast("double") / lit(den).cast("double"))
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        val pj = Dedup.jaccardJoinPrefix(docs, num, den)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        assert(pj == brute,
          s"t=$num/$den on ${rows.size} docs: missing=${brute -- pj} extra=${pj -- brute}")
      }
    }
  }

  test("prefix containment join == brute force at several thresholds on random corpora") {
    // the containment prefix bound must hold for ANY per-doc order, so the
    // probe-prefix-vs-posting-list candidates plus the exact integer test
    // must reproduce the O(n²) definition at any rational threshold
    val corpusGen: Gen[List[(Long, String)]] = for {
      n    <- Gen.choose(8, 40)
      docs <- Gen.listOfN(n, for {
        len  <- Gen.choose(3, 24)
        toks <- Gen.listOfN(len, Gen.choose(0, 30).map(i => s"w$i"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val sets = Dedup.shingleRows(docs).distinct()
        .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("st"))
      val pairs = sets.select(col("doc_id").as("doc_a"), col("st").as("st_a"))
        .crossJoin(sets.select(col("doc_id").as("doc_b"), col("st").as("st_b")))
        .where(size(col("st_a")) < size(col("st_b"))
          || (size(col("st_a")) === size(col("st_b")) && col("doc_a") < col("doc_b")))
      for ((num, den) <- Seq((1, 2), (2, 3), (4, 5))) {
        val brute = pairs
          .where(lit(den) * size(array_intersect(col("st_a"), col("st_b")))
            >= lit(num) * size(col("st_a")))
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        val cj = Dedup.containmentJoinPrefix(docs, num, den)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        assert(cj == brute,
          s"t=$num/$den on ${rows.size} docs: missing=${brute -- cj} extra=${cj -- brute}")
      }
    }
  }

  test("dedup clusters == union-find on random pair graphs") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      nVerts <- Gen.choose(2, 60)
      nEdges <- Gen.choose(1, 80)
      edges  <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nVerts.toLong - 1)
        b <- Gen.choose(0L, nVerts.toLong - 1)
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.filter(e => e._1 != e._2).distinct
    // no nonEmpty guard: a corpus with zero near-dup pairs is a legitimate
    // input (q_dedup_clusters feeds whatever the verify stage emits), and
    // dedupClusters must return the empty frame for it, not throw
    forAll(graphGen) { edges =>
      val got = Dedup.dedupClusters(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      // reference model: path-compressing union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      assert(got == expected, s"edges=$edges")
    }
  }

  test("pareto front == quadratic dominance model at several bucket widths") {
    // tight domains force coordinate ties, the skyline's tricky edge:
    // equal (x, y) rows must ALL survive, same-x lower-y must all die
    val ptsGen: Gen[List[(Long, Long, Long)]] = for {
      n    <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 24L); y <- Gen.choose(0L, 12L)
      } yield (x, y))
    } yield rows.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    forAll(ptsGen) { rows =>
      val df = rows.toDF("id", "x", "y")
      val naive = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, qx, qy) =>
          qx <= x && qy >= y && (qx < x || qy > y) }
      }.map(_._1).toSet
      for (bits <- Seq(1, 3, 8)) {
        val got = graft.operators.Skyline.paretoFront(df, "x", "y", bits)
          .select("id").as[Long].collect().toSet
        assert(got == naive, s"bits=$bits rows=$rows")
      }
    }
  }

  test("revenue concentration == in-memory Gini/top-share model at two bucket widths") {
    val ordersGen: Gen[List[(Long, Long, Double)]] = for {
      n    <- Gen.choose(1, 150)
      rows <- Gen.listOfN(n, for {
        ck <- Gen.choose(0L, 40L); p <- Gen.choose(1, 5000000).map(_ / 100.0)
      } yield (ck, p))
    } yield rows.zipWithIndex.map { case ((ck, p), i) => (i.toLong, ck, p) }
    forAll(ordersGen) { rows =>
      val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      val byCust = rows.groupBy(_._2).view
        .mapValues(_.map(r => math.round(r._3 * 100)).sum).toSeq
      val ranked = byCust.sortBy { case (ck, c) => (c, ck) }.zipWithIndex
      val n = ranked.length.toLong
      val tot = ranked.map(_._1._2).sum
      val gini = math.floor(
        ranked.map { case ((_, c), i) => (2L * (i + 1) - n - 1) * c }.sum.toDouble
          / (n.toDouble * tot.toDouble) * 10000.0) / 10000.0
      def share(den: Long): Double = {
        val cut = n - n / den
        math.floor(ranked.collect { case ((_, c), i) if (i + 1) > cut => c }.sum.toDouble
          * 100.0 / tot.toDouble * 10000.0) / 10000.0
      }
      for (bits <- Seq(4, 12)) {
        val got = graft.operators.Stats.revenueConcentration(df, bits)
          .as[(Long, Double, Double, Double, Double)].collect().head
        assert(got == ((n, tot.toDouble / 100.0, gini, share(10), share(100))),
          s"bits=$bits got=$got")
      }
    }
  }

  test("ABC classes == in-memory Pareto model at two bucket widths; classes partition the parts") {
    val liGen: Gen[List[(Long, Double)]] = for {
      n    <- Gen.choose(1, 150)
      rows <- Gen.listOfN(n, for {
        pk <- Gen.choose(0L, 40L); p <- Gen.choose(1, 5000000).map(_ / 100.0)
      } yield (pk, p))
    } yield rows
    forAll(liGen) { rows =>
      val df = rows.toDF("l_partkey", "l_extendedprice")
      val byPart = rows.groupBy(_._1).view
        .mapValues(_.map(r => math.round(r._2 * 100)).sum).toSeq
      val np = byPart.length.toLong
      val tot = byPart.map(_._2).sum
      val ranked = byPart.sortBy { case (pk, c) => (-c, pk) }
        .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (pk, c)) => (pk, c, cum + c) }.drop(1)
      val model = ranked.groupBy { case (_, _, cum) =>
        if (cum * 100 <= tot * 80) "A" else if (cum * 100 <= tot * 95) "B" else "C"
      }.view.mapValues { g =>
        val parts = g.length.toLong; val cents = g.map(_._2).sum
        (parts,
          math.floor(parts.toDouble * 100.0 / np.toDouble * 10000.0) / 10000.0,
          cents.toDouble / 100.0,
          math.floor(cents.toDouble * 100.0 / tot.toDouble * 10000.0) / 10000.0)
      }.toMap
      for (bits <- Seq(4, 12)) {
        val got = graft.operators.Stats.abcClasses(df, bits)
          .as[(String, Long, Double, Double, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
        assert(got == model, s"bits=$bits got=$got model=$model")
        assert(got.values.map(_._1).sum == np)
      }
    }
  }

  // heavy-tie price generator: few distinct price points, both arms present
  private val twoSampleGen: Gen[List[(Long, Double, String)]] =
    Gen.listOfN(80, for {
      cents <- Gen.oneOf(Seq(9999L, 10000L, 25000L, 25001L, 90000L))
      prio  <- Gen.oneOf(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"))
    } yield (cents / 100.0, prio)).map(_.zipWithIndex.map {
      case ((p, pr), i) => (i.toLong, p, pr)
    })

  test("ks and rank-sum match the naive scan on generated heavy-tie samples") {
    forAll(twoSampleGen) { rows =>
      val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority")
      val arm1 = Set("1-URGENT", "2-HIGH")
      val s1 = rows.filter(r => arm1(r._3)).map(r => math.round(r._2 * 100)).sorted
      val s2 = rows.filterNot(r => arm1(r._3)).map(r => math.round(r._2 * 100)).sorted
      whenever(s1.nonEmpty && s2.nonEmpty) {
        val ks = graft.operators.Hypothesis.ksTest(df).collect()(0)
        val dNaive = (s1 ++ s2).distinct.sorted.map { v =>
          math.abs(s1.count(_ <= v).toDouble / s1.length
            - s2.count(_ <= v).toDouble / s2.length)
        }.max
        assert(math.abs(ks.getAs[Double]("ks_stat") - dNaive) < 2e-6)
        val rs = graft.operators.Hypothesis.rankSumTest(df).collect()(0)
        val byV = (s1.map((_, true)) ++ s2.map((_, false))).groupBy(_._1).toSeq.sortBy(_._1)
        var cb = 0L; var w2 = 0L
        byV.foreach { case (_, g) =>
          val c1 = g.count(_._2).toLong; val t = g.length.toLong
          w2 += c1 * (2 * cb + t + 1); cb += t
        }
        val n1 = s1.length.toLong
        assert(rs.getAs[Long]("u2") == w2 - n1 * (n1 + 1),
          s"u2 mismatch on ties: ${rs.getAs[Long]("u2")} vs ${w2 - n1 * (n1 + 1)}")
      }
    }
  }

  test("kaplan-meier equals the naive fold on generated censored cohorts") {
    val gen: Gen[List[(Long, Long, Boolean)]] = Gen.listOfN(40, for {
      user <- Gen.choose(0L, 30L) // collisions create multi-event users
      dur  <- Gen.oneOf(Seq(30L, 60L, 300L, 301L, 3600L, 4000L))
      conv <- Gen.oneOf(true, false)
    } yield (user, dur, conv))
    forAll(gen) { rows =>
      // one synthetic user per row: t0 = 0, purchase at dur (if converting)
      // or a censoring view at dur
      val ev = rows.zipWithIndex.flatMap { case ((_, dur, conv), i) =>
        val uid = 1000L + i
        Seq((uid * 10, uid, 0L, "view", 1.0),
          (uid * 10 + 1, uid, dur, if (conv) "purchase" else "view", 1.0))
      }.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
      val got = graft.operators.Hypothesis.survivalKm(ev)
        .collect().map(r => r.getAs[Long]("h") -> r.getAs[Double]("survival")).toMap
      val obs = rows.zipWithIndex.map { case ((_, dur, conv), _) => (dur, conv) }
      val n = obs.length.toLong
      got.foreach { case (h, s) =>
        var sv = 1.0
        obs.filter(_._2).groupBy(_._1).toSeq.sortBy(_._1).filter(_._1 <= h)
          .foreach { case (t, g) =>
            val atRisk = n - obs.count(_._1 < t)
            sv = sv * (1.0 - g.length.toDouble / atRisk.toDouble)
          }
        assert(math.abs(s - math.floor(sv * 1e6) / 1e6) < 1e-12,
          s"h=$h engine=$s naive=${math.floor(sv * 1e6) / 1e6}")
      }
    }
  }

  test("type-mix drift == naive TV on random event sets; bounded [0,1]; partitioning-invariant") {
    forAll(eventsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = toDf(rows)
        val got = graft.operators.EventAnalytics.typeMixDrift(df).collect()
          .map(r => (r.getAs[Long]("day_sec") / 86400L, r.getAs[Double]("tv_drift")))
        got.foreach { case (_, tv) => assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv") }
        // naive: per-day type histograms on the driver, TV between consecutive days
        val byDay = rows.groupBy(_._2 / 86400L).map { case (d, rs) =>
          d -> rs.groupBy(_._4).map { case (t, g) => t -> g.size.toLong }
        }
        val expect = byDay.keys.toSeq.sorted.sliding(2).collect {
          case Seq(a, b) if b == a + 1 =>
            val (pa, pb) = (byDay(a), byDay(b))
            val (na, nb) = (pa.values.sum, pb.values.sum)
            val num = (pa.keySet ++ pb.keySet).toSeq.map(t =>
              math.abs(pb.getOrElse(t, 0L) * na - pa.getOrElse(t, 0L) * nb)).sum
            b -> math.floor(num.toDouble / (2.0 * nb * na) * 1e4) / 1e4
        }.toSeq.sortBy(_._1)
        assert(got.toSeq.sortBy(_._1) == expect, s"engine=${got.toSeq} naive=$expect")
        // pure function of the multiset → partitioning-invariant
        val re = graft.operators.EventAnalytics.typeMixDrift(df.repartition(7)).collect()
          .map(r => (r.getAs[Long]("day_sec") / 86400L, r.getAs[Double]("tv_drift")))
        assert(re.toSeq.sortBy(_._1) == got.toSeq.sortBy(_._1))
      }
    }
  }

  test("CUSUM reflection form == the raw max(0,·) recurrence on random series") {
    // the r15 rewrite computes cp/cn via prefix-sum − running-min (the
    // Lindley reflection identity); this pins it to the direct recurrence
    // the oracle's recursive CTE runs, fold by fold on the driver
    forAll(eventsGen) { rows =>
      whenever(rows.nonEmpty) {
        val got = graft.operators.Stats.cusumDailyVolume(toDf(rows))
          .as[(Long, Long, Long, Long, Boolean)].collect().toList
        val byDay = rows.groupBy(_._2 / 86400L).map { case (d, rs) => d -> rs.size.toLong }
        val days = byDay.keys.toSeq.sorted
        val nb = math.min(days.size, 7).toLong
        val sumb = days.take(7).map(byDay).sum
        var (cp, cn) = (0L, 0L)
        val expect = days.map { d =>
          val dev = byDay(d) * nb - sumb
          cp = math.max(0L, cp + dev - sumb / 2)
          cn = math.max(0L, cn - dev - sumb / 2)
          (d * 86400L, byDay(d), cp, cn, cp > 5 * sumb || cn > 5 * sumb)
        }.toList
        assert(got == expect, s"engine=$got naive=$expect")
      }
    }
  }
}
