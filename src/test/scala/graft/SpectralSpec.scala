package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spectral

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("gram matrix equals the naive all-pairs computation on crafted vectors") {
    val vecs = Seq(
      1L -> Array(0.5f, -0.25f, 1.0f, 0.0f),
      2L -> Array(-1.0f, 0.75f, 0.25f, 2.0f),
      3L -> Array(0.0f, 0.0f, -0.5f, 0.125f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Spectral.gramMatrix(df, 4)
      .select(col("i"), col("j"), col("q_sum"), col("n_vecs"))
      .as[(Long, Long, Long, Long)].collect().toSeq

    val q = vecs.map { case (_, v) =>
      v.map(x => math.floor(x.toDouble * Spectral.FixedPointScale).toLong)
    }
    val expect = for { i <- 0 until 4; j <- i until 4 } yield
      (i.toLong, j.toLong, q.map(a => a(i) * a(j)).sum, vecs.size.toLong)
    assert(got == expect)
  }

  test("gram matrix on the corpus: diagonal positive, n_vecs constant, triangle complete") {
    val rows = Spectral.gramMatrix(graft.sources.Tables.embeddings(spark, sf), 64)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 64 * 65 / 2)
    assert(rows.map(_._4).distinct.length == 1 && rows.head._4 > 0)
    rows.filter(r => r._1 == r._2).foreach { case (i, _, s, _) =>
      assert(s >= 0, s"diagonal q_sum must be a sum of squares (dim $i)")
    }
    assert(rows.count(r => r._1 == r._2 && r._3 > 0) > 0)
  }

  test("gram aggregate fails fast on a dim mismatch instead of silently truncating") {
    val df = Seq(1L -> Array(1.0f, 2.0f)).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Spectral.gramMatrix(df, 4).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(e => Option(e.getMessage).exists(_.contains("2-element"))))
  }

  test("power iteration recovers a planted dominant direction") {
    val dim = 4
    // 40 vectors along +/-e2 with tiny noise on other axes: dominant
    // eigenvector of the scatter matrix must be ~e2 (sign-normalized)
    val vecs = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1.0f else -1.0f
      k.toLong -> Array(0.01f * (k % 3), sign * 1.0f, 0.01f * (k % 2), 0.0f)
    }
    val gram = Spectral.gramMatrix(vecs.toDF("vec_id", "embedding"), dim)
      .select(col("i").cast("int"), col("j").cast("int"), col("q_sum"))
      .as[(Int, Int, Long)].collect()
    val v = Spectral.topEigenvector(gram, dim)
    assert(math.abs(v(1)) > 0.99, s"expected e2-dominant eigenvector, got ${v.toSeq}")
    assert(v(1) > 0, "sign normalization: first nonzero component positive")
  }

  test("distributed power iteration matches the planted direction and the driver anchor") {
    val dim = 4
    val vecs = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1.0f else -1.0f
      k.toLong -> Array(0.01f * (k % 3), sign * 1.0f, 0.01f * (k % 2), 0.0f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Spectral.powerIteration(df, dim, rounds = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (0L until dim).toSeq)
    assert(got.map(_._3).distinct.length == 1 && got.head._3 > 0,
      "lambda_u constant across rows and positive on a nonzero corpus")
    // compare direction against the driver-side anchor: cosine ≈ 1
    val gram = Spectral.gramMatrix(df, dim)
      .select(col("i").cast("int"), col("j").cast("int"), col("q_sum"))
      .as[(Int, Int, Long)].collect()
    val anchor = Spectral.topEigenvector(gram, dim)
    val vd = got.map(_._2.toDouble)
    val n = math.sqrt(vd.map(x => x * x).sum)
    val cos = vd.zip(anchor).map { case (a, b) => a / n * b }.sum
    assert(math.abs(cos) > 0.999, s"distributed vs driver eigenvector cosine $cos")
    val firstNonzero = vd.find(_ != 0.0)
    assert(firstNonzero.forall(_ > 0), "sign convention: lowest-indexed nonzero " +
      s"component positive, got ${vd.toSeq}")
  }

  test("dim correlations: perfect/anti/zero-variance dimensions pin the quantized corr") {
    // dim1 = dim0 (corr exactly 1), dim2 = -dim0 (corr ≈ -1 up to the
    // floor-code asymmetry ⌊-x⌋ = -⌈x⌉), dim3 constant (variance 0 → 0)
    val vecs = Seq(0.1f, 0.4f, -0.3f, 0.2f, -0.5f).zipWithIndex.map { case (x, k) =>
      k.toLong -> Array(x, x, -x, 0.25f)
    }
    val m = Spectral.dimCorrelations(vecs.toDF("vec_id", "embedding"), 4)
      .as[(Long, Long, Long)].collect().map { case (i, j, c) => (i, j) -> c }.toMap
    assert(m.size == 6, s"expected all 6 pairs, got $m")
    assert(m((0L, 1L)) == 10000L, s"identical dims must quantize to 10000: $m")
    assert(m((0L, 2L)) <= -9999L, s"negated dims must be ≈ -1: $m")
    assert(m((0L, 3L)) == 0L && m((1L, 3L)) == 0L && m((2L, 3L)) == 0L,
      s"zero-variance dim must report 0: $m")
  }

  test("pca score histogram: census conserves the corpus and matches naive bucketing") {
    val vecs = (0 until 30).map { k =>
      val sign = if (k % 2 == 0) 1.0f else -1.0f
      k.toLong -> Array(0.02f * (k % 5), sign * (0.5f + 0.01f * (k % 3)), 0.0f, 0.01f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val hist = Spectral.pcaScoreHistogram(df, 4, rounds = 8)
      .as[(Long, Long, Long)].collect()
    assert(hist.map(_._2).sum == vecs.size, "every vector lands in exactly one bucket")
    // recompute scores from the engine's own eigenvector, bucket naively
    val v = Spectral.powerIteration(df, 4, rounds = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1.toInt -> r._2).toMap
    val naive = vecs.map { case (_, emb) =>
      val q = emb.map(x => math.floor(x.toDouble * Spectral.FixedPointScale).toLong)
      q.indices.map(i => q(i) * v(i)).sum
    }.groupBy { s =>
      if (s == 0L) 0L
      else (if (s < 0) -1L else 1L) * (63 - java.lang.Long.numberOfLeadingZeros(math.abs(s)))
    }.view.mapValues(ss => (ss.size.toLong, ss.sum)).toMap
    val got = hist.map { case (b, n, sum) => b -> ((n, sum)) }.toMap
    assert(got == naive, s"histogram $got != naive $naive")
  }

  test("dim stats equal the naive per-coordinate reduction") {
    val vecs = Seq(
      1L -> Array(0.5f, -0.25f, 0.0f),
      2L -> Array(-1.0f, 0.75f, 0.5f))
    val got = Spectral.dimStats(vecs.toDF("vec_id", "embedding"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val q = vecs.map { case (_, v) =>
      v.map(x => math.floor(x.toDouble * Spectral.FixedPointScale).toLong) }
    val expect = (0 until 3).map { i =>
      val col = q.map(_(i))
      (i.toLong, col.length.toLong, col.sum, col.min, col.max)
    }
    assert(got == expect)
  }
}
