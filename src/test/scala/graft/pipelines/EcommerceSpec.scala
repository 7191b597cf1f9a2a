package graft.pipelines

import graft.SparkSpec
import graft.sources.Fixtures
import org.apache.spark.sql.functions._

/** End-to-end final-module pipeline over the deterministic fixtures:
  * raw → clean (dedup + anomaly filters) → marts, with the reference's
  * golden counts as oracles (SURVEY.md §5).
  */
class EcommerceSpec extends SparkSpec {

  private lazy val sessions = Ecommerce.cleanSessions(Fixtures.userSessions(spark))
  private lazy val eventsC = Ecommerce.cleanEventLogs(Fixtures.eventLogs(spark))
  private lazy val tickets = Ecommerce.cleanTickets(Fixtures.supportTickets(spark))

  test("clean sessions: dupes removed, anomalies filtered, derived cols typed") {
    val n = sessions.count()
    assert(n < 2000 && n > 1900) // 2050 raw − 50 dupes − ~2% anomalies
    assert(sessions.filter(col("duration_min") <= 0).count() == 0)
    assert(sessions.filter(col("num_pages") < 1).count() == 0)
    assert(sessions.schema("session_date").dataType.typeName == "date")
  }

  test("clean event logs: 5000 after dedup, nested fields unwrapped null-safely") {
    assert(eventsC.count() == 5000)
    // ~30% carry an error_code, the rest null via null-safe traversal
    val withCode = eventsC.filter(col("error_code").isNotNull).count()
    assert(withCode > 1000 && withCode < 2000)
  }

  test("clean tickets: ordering anomalies dropped, resolution non-negative") {
    val n = tickets.count()
    assert(n < 600 && n > 550)
    assert(tickets.filter(col("resolution_hours") < 0).count() == 0)
  }

  test("mart_user_activity: stats joined with top-1 dims for every group") {
    val mart = Ecommerce.martUserActivity(sessions)
    assert(mart.count() > 0)
    assert(mart.filter(col("top_device").isNull).count() == 0)
    assert(mart.filter(col("top_page").isNull).count() == 0)
    assert(mart.filter(col("sessions_count") < 1).count() == 0)
  }

  test("mart_support_efficiency: status counts partition the total") {
    val mart = Ecommerce.martSupportEfficiency(tickets)
    val bad = mart.filter(
      col("open_count") + col("closed_count") + col("pending_count") +
        col("resolved_count") =!= col("tickets_count"))
    assert(mart.count() > 0 && bad.count() == 0)
  }

  test("validation stage raises on empty layer") {
    Ecommerce.validate(Map("sessions" -> sessions))
    intercept[IllegalArgumentException] {
      Ecommerce.validate(Map("empty" -> sessions.filter(lit(false))))
    }
  }
}
