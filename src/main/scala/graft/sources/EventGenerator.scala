package graft.sources

import java.time.Instant
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ClickstreamEvent

/** Seeded load generator reproducing the reference producer's data contract
  * (/root/reference/producer/producer.py + producer/data_generator.py):
  * stateful sessions that emit page_view / add_to_cart / purchase with
  * history-dependent probabilities, cart-derived purchase amounts, URL
  * patterns per page type, a fixed user-agent pool, and ISO-8601 timestamps.
  *
  * Differences by design: fully deterministic (single seed), generated on
  * the driver as a plain Seq (the generator exists for parity tests and
  * streaming demos, not for scale — at scale the engine *consumes* streams,
  * it does not synthesize them).
  *
  * Distribution parity notes (producer/data_generator.py:125-155): base
  * event-type probabilities 0.70/0.20/0.10; cart items raise purchase
  * probability (≤0.30); >5 page views raise add_to_cart (≤0.35). Sessions
  * end with escalating probability after 5 minutes, capped at 0.3 per check
  * (producer/producer.py:66-78).
  */
class EventGenerator(seed: Long = 42L, numUsers: Int = 100, numProducts: Int = 50) {
  private val rnd = new scala.util.Random(seed)
  private val iso = DateTimeFormatter.ISO_INSTANT

  private val userAgents = Seq( // fixed pool, data_generator.py:45-51
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)",
    "Mozilla/5.0 (X11; Linux x86_64)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_0 like Mac OS X)",
    "Mozilla/5.0 (Android 13; Mobile)")

  private val categories = Seq("electronics", "clothing", "home", "sports",
    "books", "beauty", "toys", "automotive")

  private case class SessionState(
      userId: String, sessionId: String, startMs: Long,
      var lastMs: Long, var pageViews: Int, var cartItems: List[String],
      var purchases: Int)

  private def uuid(): String = // deterministic uuid4-shaped id
    f"${rnd.nextInt(0xffff)}%04x${rnd.nextInt(0xffff)}%04x-${rnd.nextInt(0xffff)}%04x-4${rnd.nextInt(0xfff)}%03x-${rnd.nextInt(0xffff)}%04x-${rnd.nextInt(0xffff)}%04x${rnd.nextInt(0xffff)}%04x${rnd.nextInt(0xffff)}%04x"

  private def price(): Double = 5.99 + rnd.nextDouble() * (999.99 - 5.99)

  private def pageUrl(eventType: String, productId: Option[String]): String =
    eventType match {
      case "add_to_cart" | "purchase" => if (eventType == "purchase") "/checkout" else "/cart"
      case _ =>
        val r = rnd.nextDouble() // page mix .15/.25/.50/.10, data_generator.py:92-93
        if (r < 0.15) "/"
        else if (r < 0.40) s"/category/${categories(rnd.nextInt(categories.size))}"
        else if (r < 0.90) s"/product/${productId.getOrElse("prod_" + rnd.nextInt(numProducts))}"
        else s"/search?q=${categories(rnd.nextInt(categories.size))}"
    }

  /** Generate n events starting at startMs, advancing a small simulated
    * clock; returns the reference wire-contract rows. */
  def events(n: Int, startMs: Long = 1704067200000L): Seq[ClickstreamEvent] = {
    var clock = startMs
    var sessions = Vector.empty[SessionState]
    val out = Vector.newBuilder[ClickstreamEvent]
    (0 until n).foreach { _ =>
      clock += 200 + rnd.nextInt(2000)
      // maintain ≥10 live sessions (producer.py:200-202)
      if (sessions.size < 10) {
        val uid = f"user_${rnd.nextInt(numUsers)}%04d"
        sessions = sessions :+ SessionState(uid, uuid(), clock, clock, 0, Nil, 0)
      }
      val si = rnd.nextInt(sessions.size)
      val s  = sessions(si)
      // session-end probability ramps after 5 min, cap 0.3 (producer.py:71-76)
      val ageMin = (clock - s.startMs) / 60000.0
      if (ageMin > 5 && rnd.nextDouble() < math.min(0.3, (ageMin - 5) * 0.05)) {
        sessions = sessions.patch(si, Nil, 1)
      } else {
        val cartBoost = math.min(0.30, 0.10 + 0.05 * s.cartItems.size)
        val viewBoost = math.min(0.35, if (s.pageViews > 5) 0.25 else 0.20)
        val r = rnd.nextDouble()
        val eventType =
          if (r < cartBoost && s.cartItems.nonEmpty) "purchase"
          else if (r < cartBoost + viewBoost) "add_to_cart"
          else "page_view"
        val productId =
          if (eventType == "page_view" && rnd.nextDouble() < 0.5) None
          else Some(f"prod_${rnd.nextInt(numProducts)}%04d")
        // cart-sum × U(0.95,1.05) or U(20,500) (producer.py:119-136)
        val amount = if (eventType == "purchase") {
          val base = if (s.cartItems.nonEmpty) s.cartItems.size * price() else 20 + rnd.nextDouble() * 480
          Some(new java.math.BigDecimal(base * (0.95 + rnd.nextDouble() * 0.10))
            .setScale(2, java.math.RoundingMode.HALF_UP))
        } else None
        if (eventType == "add_to_cart") s.cartItems = productId.get :: s.cartItems
        if (eventType == "purchase") { s.purchases += 1; s.cartItems = Nil }
        if (eventType == "page_view") s.pageViews += 1
        s.lastMs = clock
        out += ClickstreamEvent(
          event_id = uuid(), user_id = s.userId, event_type = eventType,
          product_id = productId, purchase_amount = amount,
          timestamp = Some(iso.format(Instant.ofEpochMilli(clock))),
          session_id = Some(s.sessionId),
          page_url = Some(pageUrl(eventType, productId)),
          user_agent = Some(userAgents(rnd.nextInt(userAgents.size))),
          ip_address = Some(s"${1 + rnd.nextInt(254)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"))
      }
    }
    out.result()
  }

  /** Same events as the Kafka wire format: (key, value) with JSON value —
    * what `df.write.format("kafka")` would send (producer.py:168-182). */
  def asWire(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val ds: Dataset[ClickstreamEvent] = spark.createDataset(events(n))
    ds.select(col("user_id").as("key"), to_json(struct(ds.columns.map(col): _*)).as("value"))
  }
}
