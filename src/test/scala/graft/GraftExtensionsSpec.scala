package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.kg.TestSpark

/**
 * The spark.sql.extensions entry point must make every native function
 * available to a pure-SQL session with no programmatic registration.
 */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers all native functions cluster-wide") {
    val shared = TestSpark.spark // boot the shared context first
    // getOrCreate returns any ACTIVE session and would skip extensions:
    // clear, build a fresh session on the same context, restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        "SELECT vec_cosine(array(1.0, 0.0), array(1.0, 0.0)) c, " +
          "vec_dot(array(1.0, 2.0), array(3.0, 4.0)) d").collect().head
      assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 11.0)
      // float arrays promote through the injected Cast
      assert(s.sql(
        "SELECT vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), array(1.0, 0.0)) c")
        .collect().head.getDouble(0) == 1.0)
      // canon_iri / parse_nt behave exactly as the session-scoped
      // GraftFunctions.register path does
      graft.kg.GraftFunctions.register(shared)
      val iri = "HTTP://EX.org:80/A%2f"
      assert(s.sql(s"SELECT canon_iri('$iri') c").collect().head.getString(0) ==
        shared.sql(s"SELECT canon_iri('$iri') c").collect().head.getString(0))
      val nt = "SELECT p.subj, p.pred, p.obj FROM (SELECT '<urn:a> <urn:b> \"x\" .' AS l) " +
        "LATERAL VIEW parse_nt(l, 'strict') p"
      assert(s.sql(nt).collect().toSeq == shared.sql(nt).collect().toSeq)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
