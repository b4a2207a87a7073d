package graft

/** The extension-registered SQL surface must work for a session built
  * with spark.sql.extensions (SparkSpec's shared session sets it — the
  * same wiring Verify/Bench use). */
class GraftExtensionsSpec extends SparkSpec {

  test("long_dot is callable from plain SQL") {
    val out = spark.sql(
      "SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(out == 32L)
  }

  test("long_dot arity is enforced") {
    intercept[Exception] {
      spark.sql("SELECT long_dot(array(1L))").collect()
    }
  }
}
