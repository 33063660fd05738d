package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity, TextAnalysis}
import graft.sources.{EventGenerator, Tables}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("token stats: counts and ratios consistent") {
    val docs = Seq((1L, "a b b c")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(docs).head()
    assert(r.getAs[Long]("n_tokens") == 4 && r.getAs[Long]("n_distinct_tokens") == 3)
    assert(r.getAs[Double]("type_token_ratio") == 0.75)
    assert(r.getAs[Double]("mean_token_len") == 1.0)
  }

  test("language id is deterministic and scores bounded") {
    val out = TextAnalysis.languageId(Tables.documents(spark, sf))
    assert(out.where(col("score_en") < 0 || col("score_en") > 1).count() == 0)
    assert(out.where(col("predicted_lang").isNull).count() == 0)
  }

  test("quality score stays in [0,1]") {
    val q = TextAnalysis.qualityScored(Tables.documents(spark, sf))
    assert(q.where(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("chunk spans: count rule, sizes, and token conservation") {
    // w=4, s=3: n≤4 → one chunk of n; n=5 → [4, 2]; n=10 → [4, 4, 4]
    val docs = Seq(
      (1L, "s", (1 to 3).map(i => s"t$i").mkString(" ")),
      (2L, "s", (1 to 4).map(i => s"t$i").mkString(" ")),
      (3L, "s", (1 to 5).map(i => s"t$i").mkString(" ")),
      (4L, "s", (1 to 10).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val spans = TextAnalysis.chunkSpans(docs, w = 4, s = 3)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(spans(1L) == Seq(3) && spans(2L) == Seq(4))
    assert(spans(3L) == Seq(4, 2), s"n=5 got ${spans(3L)}")
    assert(spans(4L) == Seq(4, 4, 4), s"n=10 got ${spans(4L)}")
    // non-overlapped contributions reconstruct the corpus token count
    val prof = TextAnalysis.chunkProfile(docs, w = 4, s = 3).head()
    assert(prof.getAs[Long]("corpus_tokens") == 3 + 4 + 5 + 10)
    assert(prof.getAs[Long]("chunks") == 1 + 1 + 2 + 3)
  }

  test("weighted sample: zero weight drops all, full weight keeps all, monotone in weight") {
    val df = (1L to 400L).toDF("doc_id").withColumn("w", lit(0L))
    import graft.operators.Sampling
    assert(Sampling.weightedSample(df, col("doc_id"), col("w"), 1, 1).count() == 0)
    val full = df.withColumn("w", lit(10000L))
    assert(Sampling.weightedSample(full, col("doc_id"), col("w"), 1, 1).count() == 400)
    // halving the weight can only shrink the sample, never swap members
    val hi = Sampling.weightedSample(full, col("doc_id"), col("w"), 1, 2)
      .select("doc_id").as[Long].collect().toSet
    val lo = Sampling.weightedSample(full.withColumn("w", lit(5000L)),
      col("doc_id"), col("w"), 1, 2).select("doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size && hi.size < 400)
  }

  test("split balance: partitions the corpus, covers labels, shares sum to ~100 per split") {
    import graft.operators.Sampling
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = Sampling.splitBalance(emb, 8, 1, 10)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // every vector lands in exactly one split
    assert(rows.map(_._3).sum == emb.count())
    // within each split the pct4-floored shares sum to 100 within floor loss
    rows.groupBy(_._1).foreach { case (split, rs) =>
      val total = rs.map(_._4).sum
      assert(total <= 100.0 + 1e-9 && total > 100.0 - 0.01 * rs.length,
        s"$split shares sum to $total")
    }
    // train must dominate val and test at an 8/1/1 rule
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("vocab coverage: top-k membership exact on a crafted corpus") {
    // top-2 vocab by tf = {aa (4), bb (3)}; cc/dd are OOV
    val docs = Seq(
      (1L, "s1", "aa aa bb cc"),
      (2L, "s1", "aa bb"),
      (3L, "s2", "aa bb cc dd")
    ).toDF("doc_id", "source", "text")
    val m = TextAnalysis.vocabCoverage(docs, 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("s1") == ((6L, 5L, 3L)), s"got ${m("s1")}") // 6 tokens, 5 in {aa,bb}
    assert(m("s2") == ((4L, 2L, 4L)), s"got ${m("s2")}")
  }

  test("length histogram: digit buckets partition docs, min/max honest") {
    val docs = Seq(
      (1L, "en", "s", (1 to 5).map(_ => "t").mkString(" ")),    // 5 tokens  -> 1 digit
      (2L, "en", "s", (1 to 42).map(_ => "t").mkString(" ")),   // 42 tokens -> 2 digits
      (3L, "en", "s", (1 to 120).map(_ => "t").mkString(" "))   // 120       -> 3 digits
    ).toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")))
    val rows = TextAnalysis.lengthHistogram(docs).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows(1L) == ((1L, 5L, 5L, 5L)))
    assert(rows(2L) == ((1L, 42L, 42L, 42L)))
    assert(rows(3L) == ((1L, 120L, 120L, 120L)))
  }

  test("quality percentiles: bucket decomposition equals the naive percent_rank window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.qualityPercentiles(docs)
      .select(col("doc_id"), col("quality_pct_rank")).as[(Long, Double)].collect().toMap
    val naive = TextAnalysis.budgetUnits(docs)
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col("source")).orderBy(col("qual_u"))))
      .select(col("doc_id"), graft.functions.Cols.q4(col("pr")).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (id, v) =>
      assert(v == naive(id), s"doc $id: bucket $v vs naive ${naive(id)}")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("bigram LM: crafted-corpus probabilities exact; bigram mass conserved") {
    // corpus: "a b" ×2 and "a c" ×1 ⇒ p(b|a)=2/3, p(c|a)=1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // floor(1e4·2/3)=6666, floor(1e4·1/3)=3333; doc 4 has no bigram
    assert(got == Map(1L -> ((1L, 6666L)), 2L -> ((1L, 6666L)), 3L -> ((1L, 3333L))))

    // real corpus: per-doc bigram counts conserve the corpus bigram mass,
    // and every doc with ≥2 tokens appears exactly once
    val corpus = Tables.documents(spark, sf)
    val scores = TextAnalysis.bigramLmScores(corpus)
    val nDocs = corpus.where(size(split(col("text"), " ")) >= 2).count()
    val mass = corpus.select((size(split(col("text"), " ")) - 1).cast("long").as("m"))
      .where(col("m") > 0).agg(sum(col("m"))).head().getLong(0)
    assert(scores.count() == nDocs)
    assert(scores.agg(sum(col("n_bigrams"))).head().getLong(0) == mass)
  }

  test("BPE pairs: crafted-corpus counts exact, frequency-weighted") {
    // "abab" ×2 and "ab cd" ×1 ⇒ word freqs: abab→2, ab→1, cd→1
    // pairs: ab: 2·2 + 1 = 5, ba: 2·1 = 2, cd: 1
    val docs = Seq((1L, "abab ab cd"), (2L, "abab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairs(docs, 10)
      .as[(String, Long)].collect().toList
    assert(got == List(("ab", 5L), ("ba", 2L), ("cd", 1L)))
  }

  test("BPE merge application: crafted cascade, greedy non-overlap, dry round") {
    // word freqs: aaab→3, ab→1
    // r1 pairs: (a,a)=6 (two per aaab — greedy LTR merges only the FIRST),
    //           (a,b)=4 → merge (a,a): aaab→[aa,a,b]
    // r2 pairs: (aa,a)=3, (a,b)=4 → merge (a,b): [aa,ab] / [ab]
    // r3 pairs: (aa,ab)=3 → merge → [aaab] / [ab]
    // r4: no pairs left → NO row (the empty-argmax guard), reps unchanged
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMergeTable(docs, 4)
      .as[(Long, String, String, String, Long)].collect().toList
    assert(merges == List(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 4L),
      (3L, "aa", "ab", "aaab", 3L)))
    val census = TextAnalysis.bpeTokenCensus(docs, 4, 10)
      .as[(String, Long)].collect().toList
    assert(census == List(("aaab", 3L), ("ab", 1L)))
  }

  test("BPE deep train: dry rounds past vocabulary collapse stay inert") {
    // same cascade corpus, rounds=12 (3 stride-4 checkpoint windows, r15):
    // all merge mass is exhausted after round 3 — rounds 4..12 must emit
    // NO rows and leave the final representation identical to rounds=4
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val deep = TextAnalysis.bpeMergeTable(docs, 12)
      .as[(Long, String, String, String, Long)].collect().toList
    assert(deep == List(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 4L),
      (3L, "aa", "ab", "aaab", 3L)))
    val census = TextAnalysis.bpeTokenCensus(docs, 12, 10)
      .as[(String, Long)].collect().toList
    assert(census == List(("aaab", 3L), ("ab", 1L)))
  }

  test("BPE fertility: pieces-per-word joined back by source") {
    // rounds=2 on the cascade corpus: merges (a,a)->aa then (a,b)->ab, so
    // aaab -> [aa, ab] (2 pieces), ab -> [ab] (1 piece)
    val docs = Seq(
      (1L, "s1", "aaab aaab ab"), (2L, "s2", "aaab")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.bpeFertility(docs, 2)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(got == List(("s1", 3L, 5L, 2L, 1.6666), ("s2", 1L, 2L, 1L, 2.0)))
  }

  test("pinned case fold: idempotent, and char mass grows only via ß/ẞ") {
    import graft.functions.Cols
    val corpus = Tables.documents(spark, sf)
      .select(col("text"), Cols.foldCase(col("text")).as("f1"))
      .select(col("text"), col("f1"), Cols.foldCase(col("f1")).as("f2"),
        (length(col("f1")) - length(col("text"))).as("delta"),
        (length(col("text"))
          - length(translate(col("text"), "ßẞ", ""))).as("eszetts"))
    // fold(fold(x)) == fold(x): the fold is a projection, safe to re-apply
    assert(corpus.where(col("f1") =!= col("f2")).count() == 0)
    // every char of growth is one ß/ẞ -> ss expansion; nothing shrinks
    assert(corpus.where(col("delta") =!= col("eszetts")).count() == 0)
  }

  test("BPE census conserves character mass: merging never loses a char") {
    // sum(len(token) * n_tokens) over the FULL census == total word-char
    // mass: every merge concatenates, never drops
    val docs = Tables.documents(spark, sf)
    val census = TextAnalysis.bpeTokenCensus(docs, 4, Int.MaxValue)
      .agg(sum(length(col("token")).cast("long") * col("n_tokens"))).head().getLong(0)
    val mass = docs.select(explode(
        filter(split(col("text"), " "), t => length(t) > 0)).as("w"))
      .agg(sum(length(col("w")).cast("long"))).head().getLong(0)
    assert(census == mass, s"census char mass $census != corpus word mass $mass")
  }

  test("length curriculum: histogram-rank boundaries, equal-mass stages") {
    // n_tok 1..8, stages 4 -> boundaries b_k = min{t : 4*cum >= k*8} = 2,4,6
    val docs = (1 to 8).map { k =>
      val tx = Seq.fill(k)("t").mkString(" ")
      (k.toLong, "s", tx, "en", tx.length.toLong)
    }.toDF("doc_id", "source", "text", "lang", "n_chars")
    val got = TextAnalysis.lengthCurriculum(docs, 4)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 2L, 3L, 1L, 2L, 1L, 25.0), (2L, 2L, 7L, 3L, 4L, 1L, 25.0),
      (3L, 2L, 11L, 5L, 6L, 1L, 25.0), (4L, 2L, 15L, 7L, 8L, 1L, 25.0)))
  }

  test("dedup bias audit: cross-source survivor, kept vs dropped means") {
    val docs = Seq(
      (1L, "s1", "dup text one"), (2L, "s1", "dup text one"),
      (3L, "s2", "dup text one"), (4L, "s2", "unique two")
    ).map { case (id, src, tx) => (id, src, tx, "en", tx.length.toLong) }
      .toDF("doc_id", "source", "text", "lang", "n_chars")
    val got = graft.operators.Dedup.dedupBiasAudit(docs)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toList
    // fp("dup text one") keeps doc 1 (s1); docs 2 and 3 drop — s2 loses a
    // doc to a survivor held by s1. qual_u = 3333 for every doc here
    // (ttr-only signal), so both means read 0.3333.
    assert(got == List(
      ("s1", 2L, 1L, 6L, 3L, 50.0, 0.3333, 0.3333),
      ("s2", 2L, 1L, 5L, 3L, 60.0, 0.3333, 0.3333)))
  }

  test("pinned case fold: probe classes and ASCII no-op") {
    import graft.functions.Cols
    val out = Seq("Straße", "ẞ", "ΣΟΦΙΑΣ", "τέλος", "İzmir", "ı", "Hello")
      .toDF("s").select(Cols.foldCase(col("s"))).as[String].collect().toList
    assert(out == List("strasse", "ss", "σοφιασ", "τέλοσ", "izmir", "i", "hello"))
  }

  test("fold audit: identity merges, char growth, per-source census") {
    val docs = Seq(
      (1L, "s1", "Straße"), (2L, "s1", "strasse"), (3L, "s2", "abc")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.foldAudit(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    // s1: "Straße" folds to "strasse" (changed, +1 char), identities merge 2→1
    assert(got == List(("s1", 2L, 1L, 2L, 1L, 1L), ("s2", 1L, 0L, 1L, 1L, 0L)))
  }

  test("hybrid search: rrf arithmetic, monotone order, rank bounds") {
    val out = graft.operators.Retrieval.hybridTopDocs(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      Seq("join", "filter", "stream"), queryVecId = 0L, listK = 50, k = 10)
      .select(col("doc_id"), col("bm25_rank"), col("cosine_rank"), col("rrf_x100"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 10)
    assert(out.forall { case (_, b, c, _) => b >= 0 && b <= 50 && c >= 0 && c <= 50 })
    // recompute the fused score from the ranks (0 = absent from that list)
    def rrf(r: Long) = if (r == 0) 0.0 else 1.0 / (60.0 + r)
    out.foreach { case (id, b, c, x) =>
      val expect = math.floor((rrf(b) + rrf(c)) * 100.0 * 10000.0) / 10000.0
      assert(x == expect, s"doc $id: rrf_x100 $x != recomputed $expect")
    }
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "fused scores must be non-increasing")
  }

  test("multimodal decode is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val a = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.byte_len > 0 && m.width >= 64 && m.channels >= 2))
    val kinds = Multimodal.mediaProfile(media).select("kind").as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("label centroids have one vector of the embedding dimension per label") {
    val c = Similarity.labelCentroids(Tables.embeddings(spark, sf)).collect()
    assert(c.length == 10)
    assert(c.forall(_.getSeq[Double](1).length == 64))
  }

  test("page-type classification covers every generated URL") {
    val dist = operators.Clickstream.pageTypeDistribution(
      operators.Clickstream.generated(spark, 1000))
    val types = dist.select("page_type").as[String].collect().toSet
    assert(!types.contains("other"), s"unclassified URLs: $types")
    assert(types.contains("product") && types.contains("checkout"))
  }

  test("product metrics enrichment: every product joined, conversion bounded") {
    val pm = operators.Clickstream.productMetrics(operators.Clickstream.generated(spark, 1000))
    assert(pm.where(col("product_name").isNull || col("category").isNull).count() == 0)
    assert(pm.where(col("conversion_rate") < 0).count() == 0)
    val plan = pm.queryExecution.executedPlan.toString
    // fact side must not shuffle for the enrichment join
    assert(pm.count() > 0 && plan.contains("BroadcastHashJoin"))
  }

  test("first/last per user agrees with direct lookup") {
    val fl = operators.EventAnalytics.firstLastPerUser(Tables.events(spark, sf))
    assert(fl.where(col("first_event_id") > col("last_event_id")).count() == 0)
    val ev = Tables.events(spark, sf)
    val joined = fl.join(ev, fl("first_event_id") === ev("event_id"))
    assert(joined.where(col("first_event_type") =!= col("event_type")).count() == 0)
  }

  test("imageio decode census: hand-computed fixture + closed-form agreement") {
    import spark.implicits._
    // hand-computed anchor: doc_id = 9 -> w = 4 + 9%13 = 13, h = 4 + (9/7)%13
    // = 5, seed = 9. sum_r = sum over x<13,y<5 of (3x+5y+9) % 256; all
    // terms < 256 here so the mod never bites:
    //   sum_r = 5*3*(0+..+12) + 13*5*(0+..+4)/... compute directly:
    //   Σ3x over x<13 = 3*78 = 234 per row, ×5 rows = 1170
    //   Σ5y over y<5 = 5*10 = 50 per column, ×13 cols = 650
    //   seed 9 × 65 px = 585  -> sum_r = 2405
    //   sum_g: Σ7x = 7*78*5 = 2730; Σ11y = 11*10*13 = 1430; 585 -> 4745
    //   sum_b: Σ13x = 13*78*5 = 5070; Σ17y = 17*10*13 = 2210; 585 -> 7865
    val docs = Seq((9L, "x"), (0L, "y")).toDF("doc_id", "text")
    val got = Multimodal.decodeImageCensus(Multimodal.pngMedia(docs)).collect()
    val r9 = got.find(_.getLong(0) == 9L).get
    assert(r9.getLong(1) == 13L && r9.getLong(2) == 5L && r9.getLong(3) == 3L)
    assert(r9.getLong(4) == 2405L && r9.getLong(5) == 4745L && r9.getLong(6) == 7865L)
    // doc_id = 0: w=4, h=4, seed=0 — sum_r = Σ(3x+5y) over 4×4
    //   = 4·(3·(0+1+2+3)) + 4·(5·(0+1+2+3)) = 72 + 120 = 192
    val r0 = got.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == 4L && r0.getLong(2) == 4L)
    assert(r0.getLong(4) == 192L)
    // closed-form agreement over the real corpus: decode census == formula
    // census for EVERY document (the spark-side mirror of the DuckDB oracle,
    // including ids whose pixel terms exceed 255 so the mod path is hit)
    val decoded = Multimodal.decodeImageCensus(
      Multimodal.pngMedia(Tables.documents(spark, sf)))
    val formula = Tables.documents(spark, sf).where(col("doc_id").isNotNull)
      .select(col("doc_id").as("media_id"),
        (lit(4) + col("doc_id") % 13).as("w"),
        (lit(4) + (col("doc_id").cast("long") / 7).cast("long") % 13).as("h"),
        (col("doc_id") % 251).as("seed"))
      .select(col("media_id"), col("w"), col("h"),
        explode(sequence(lit(0), col("w") * col("h") - 1)).as("i"), col("seed"))
      .groupBy(col("media_id"), col("w"), col("h"))
      .agg(
        sum((lit(3) * (col("i") % col("w")) + lit(5) * (col("i") / col("w")).cast("long") + col("seed")) % 256).as("sum_r"),
        sum((lit(7) * (col("i") % col("w")) + lit(11) * (col("i") / col("w")).cast("long") + col("seed")) % 256).as("sum_g"),
        sum((lit(13) * (col("i") % col("w")) + lit(17) * (col("i") / col("w")).cast("long") + col("seed")) % 256).as("sum_b"))
    val mismatches = decoded.as("d").join(formula.as("f"), Seq("media_id"))
      .where(col("d.width") =!= col("f.w") || col("d.height") =!= col("f.h")
        || col("d.sum_r") =!= col("f.sum_r") || col("d.sum_g") =!= col("f.sum_g")
        || col("d.sum_b") =!= col("f.sum_b"))
      .count()
    assert(mismatches == 0)
    assert(decoded.count() == Tables.documents(spark, sf)
      .where(col("doc_id").isNotNull).count())
    // the MediaDecoder-trait path: ImageIoDecoder fills MediaMeta from the
    // DECODED raster (width = 4 + id % 13 etc.), and feature_norm is the
    // quantized mean intensity in [0, 1)
    val media = Multimodal.pngMedia(docs)
      .select(col("media_id"), lit("image").as("kind"), col("payload"))
    val metas = Multimodal.decodeAll(media, Multimodal.ImageIoDecoder).collect()
    assert(metas.length == 2)
    val m9 = metas.find(_.media_id == 9L).get
    assert(m9.width == 13 && m9.height == 5 && m9.channels == 3 && m9.frames == 1)
    // mean = (2405 + 4745 + 7865) / (3 * 65 * 255) = 15015 / 49725
    val want = math.floor(15015.0 / 49725.0 * 10000.0) / 10000.0
    assert(m9.feature_norm == want)
    // non-image kinds refuse with a named reason instead of faking a decode
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAll(media.withColumn("kind", lit("video")),
        Multimodal.ImageIoDecoder).collect()
    }
    assert(ex.getMessage.contains("codec") || String.valueOf(ex.getCause).contains("codec"))
  }

  test("resize exec: hand-computed fixture (odd dims, ceil division)") {
    import spark.implicits._
    // doc_id = 9 -> in 13×5 seed 9; stride 2 keeps x ∈ {0,2,…,12} (7 cols),
    // y ∈ {0,2,4} (3 rows) -> out 7×3. All pixel terms < 256 here:
    //   sum_r = 3·(0+2+…+12)·3 + 5·(0+2+4)·7 + 9·21 = 378+210+189 = 777
    //   sum_g = 7·42·3 + 11·6·7 + 189 = 882+462+189 = 1533
    //   sum_b = 13·42·3 + 17·6·7 + 189 = 1638+714+189 = 2541
    val docs = Seq((9L, "x")).toDF("doc_id", "text")
    val r = Multimodal.resizeExec(Multimodal.pngMedia(docs), 2).head()
    assert(r.getLong(1) == 7L && r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 777L && r.getLong(5) == 1533L && r.getLong(6) == 2541L)
  }

  test("gif frame-sample exec: hand-computed fixture incl. the h=4 interlace case") {
    import spark.implicits._
    // doc_id = 4 -> frames 6, 8×4, seed 4; stride 2 samples f ∈ {0,2,4}.
    //   per-frame sum = 3·28·4 + 5·6·8 + (11f+4)·32 = 704 + 352f
    //   total = 3·704 + 352·(0+2+4) = 4224
    // h = 4 is exactly the height the JDK gif writer's INTERLACED default
    // mis-wrote (row y = 2 vanished) — this fixture is the regression
    // guard for the explicit interlaceFlag=FALSE metadata.
    val docs = Seq((4L, "x"), (0L, "y")).toDF("doc_id", "text")
    val got = Multimodal.frameSampleExec(Multimodal.gifMedia(docs), 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r4 = got(4L)
    assert(r4.getLong(1) == 6L && r4.getLong(2) == 3L
      && r4.getLong(3) == 8L && r4.getLong(4) == 4L)
    assert(r4.getLong(5) == 4224L)
    // doc_id = 0 -> frames 2, 4×4, seed 0; only f = 0 sampled; sum = 192
    val r0 = got(0L)
    assert(r0.getLong(1) == 2L && r0.getLong(2) == 1L && r0.getLong(5) == 192L)
  }

  test("wav decode census: hand-computed fixture") {
    import spark.implicits._
    // doc_id = 5: n = 16 + 5 = 21 frames, seed = 5.
    //   1103·i + 5 stays < 65536 for i < 22, so the mod never bites:
    //   sum = Σ_{i<21}(1103·i + 5 − 32768) = 1103·210 + 21·(5 − 32768)
    //       = 231630 − 688023 = −456393
    val docs = Seq((5L, "x")).toDF("doc_id", "text")
    val got = Multimodal.decodeAudioCensus(Multimodal.wavMedia(docs)).head()
    assert(got.getLong(1) == 21L && got.getLong(2) == 1L
      && got.getLong(3) == 8000L && got.getLong(4) == 16L)
    assert(got.getLong(5) == -456393L)
  }

  test("audio features: engine census over decoded PCM equals the closed-form recompute") {
    import spark.implicits._
    val docs = Seq((5L, "x"), (100L, "y"), (240L, "z"), (9973L, "w"))
      .toDF("doc_id", "text")
    val got = Multimodal.audioFeatureCensus(Multimodal.wavMedia(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4)
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val n = (16L + id % 241L).toInt
      val seed = (id % 9973L).toInt
      val s = Array.tabulate(n)(i => ((1103 * i + seed) % 65536 - 32768).toLong)
      val zc = (1 until n).count(i => (s(i) < 0) != (s(i - 1) < 0)).toLong
      val energy = s.map(v => v * v).sum
      val windows = s.grouped(64).map(_.map(v => v * v).sum).toSeq
      val r = got(id)
      assert(r.getLong(1) == n.toLong, s"doc $id frames")
      assert(r.getLong(2) == windows.length.toLong, s"doc $id windows")
      assert(r.getLong(3) == zc, s"doc $id zero crossings")
      assert(r.getLong(4) == energy, s"doc $id energy")
      assert(r.getLong(5) == windows.max, s"doc $id max window energy")
    }
  }

  test("image features: engine census over decoded pixels equals the closed-form recompute") {
    import spark.implicits._
    val ids = Seq(3L, 5L, 77L, 250L)
    val docs = ids.map(i => (i, "t")).toDF("doc_id", "text")
    val got = Multimodal.imageFeatureCensus(Multimodal.pngMedia(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val w = (4L + id % 13L).toInt
      val h = (4L + (id / 7L) % 13L).toInt
      val seed = (id % 251L).toInt
      val lums = for (y <- 0 until h; x <- 0 until w) yield {
        val r = (3 * x + 5 * y + seed) % 256
        val g = (7 * x + 11 * y + seed) % 256
        val b = (13 * x + 17 * y + seed) % 256
        (r + g + b) / 3
      }
      val r = got(id)
      assert(r.getLong(1) == w.toLong && r.getLong(2) == h.toLong, s"doc $id dims")
      assert(r.getLong(3) == lums.map(_.toLong).sum, s"doc $id lum_sum")
      (0 to 3).foreach { bin =>
        assert(r.getLong(4 + bin) == lums.count(_ / 64 == bin).toLong,
          s"doc $id bin $bin")
      }
    }
  }

  test("event generator: reference wire contract round-trips through from_json") {
    val gen  = new EventGenerator(seed = 1)
    val evs  = gen.events(300)
    assert(evs.map(_.event_id).distinct.size == evs.size) // ids unique
    assert(evs.forall(e => Set("page_view", "add_to_cart", "purchase")(e.event_type)))
    assert(evs.filter(_.event_type == "purchase").forall(_.purchase_amount.isDefined))
    // deterministic with same seed
    assert(new EventGenerator(seed = 1).events(300) == evs)
    val parsed = graft.streaming.Parse.parse(
      gen.asWire(spark, 300).withColumn("timestamp", current_timestamp()),
      fixedClock = Some(java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
    assert(parsed.where(col("event_id").isNull).count() == 0)
    assert(parsed.columns.contains("event_time") && parsed.columns.contains("processing_time"))
  }
}
