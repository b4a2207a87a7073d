package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spark-only checks for the no-oracle keys, mirroring the reference's
  * fixture style (tests/test-features.sh). */
class OperatorSpec extends SparkSpec {

  test("SQL-first usage: temp views + spark.sql match the DataFrame path") {
    // A reference user working in SQL registers the tables as views and
    // writes plain SQL — same session, same results as the typed path.
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    val viaSql = spark.sql(
      """SELECT o_orderstatus, count(*) AS n FROM orders_v
         GROUP BY o_orderstatus ORDER BY o_orderstatus""").collect().map(_.toSeq)
    val viaDf = graft.SparkEntry.queries("q_agg_count_by_status")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("q_agg_approx_distinct is within 5% of the exact count") {
    val exact = graft.SparkEntry.queries("q_agg_distinct")(spark, sfDir)
      .collect()(0).getLong(0)
    val approx = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL error-bound property: estimate within 4·rsd of exact across generated cardinalities") {
    // The quantitative contract behind the one no-oracle key:
    // approx_count_distinct(col, rsd) is HLL++ with relative standard
    // deviation rsd, deterministic for a given dataset. spark.range(n)
    // has exactly n distinct values, so the exact side costs nothing.
    // Cardinalities are ScalaCheck-generated over a fixed seed walk
    // (scalatestplus forAll isn't in the offline cache — same idiom as
    // ChunkerSpec), spanning the sparse→dense sketch regimes plus fixed
    // boundary cases. Bound: |est − n| ≤ 4·rsd·n — HLL error is ≈
    // Gaussian with σ = rsd·n, so 4σ is run-stable for a deterministic
    // sketch while still catching a mis-sized or mis-merged sketch
    // (which shows as tens of σ). Small-n guard: below ~1/rsd² the
    // sketch counts near-exactly; the +1 absolute slack keeps the bound
    // meaningful at n<100 without special-casing.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rsd = 0.05
    val gen = Gen.chooseNum(50L, 200000L)
    var seed = Seed(20260812L)
    val generated = (1 to 8).map { _ =>
      val v = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
    for (n <- generated ++ Seq(1L, 10L, 1000L)) {
      val est = spark.range(n)
        .agg(expr(s"approx_count_distinct(id, $rsd)")).collect()(0).getLong(0)
      assert(math.abs(est - n) <= 4 * rsd * n + 1,
        s"cardinality $n: estimate $est outside 4·rsd bound (${4 * rsd * n})")
    }
  }

  test("q_agg_percentile_approx: rank-bounded against the exact interpolated percentiles") {
    // The sketch contract: accuracy=10000 ⟹ relative rank error ≤
    // 1/10000 of the group, so the approx median must land between the
    // exact 45th and 55th percentile VALUES of its group (a vastly
    // looser rank window than the guarantee — the assertion survives
    // any data while still catching a broken sketch, which lands whole
    // quantiles away). Same check at p90 against the exact p85–p95.
    val exact = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.45)").as("lo50"),
        expr("percentile(o_totalprice, 0.55)").as("hi50"),
        expr("percentile(o_totalprice, 0.85)").as("lo90"),
        expr("percentile(o_totalprice, 0.95)").as("hi90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = graft.SparkEntry.queries("q_agg_percentile_approx")(spark, sfDir)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (lo50, hi50, lo90, hi90) = exact(r.getString(0))
      val (m, p90) = (r.getDouble(1), r.getDouble(2))
      assert(m >= lo50 && m <= hi50,
        s"${r.getString(0)}: approx median $m outside exact p45..p55 [$lo50, $hi50]")
      assert(p90 >= lo90 && p90 <= hi90,
        s"${r.getString(0)}: approx p90 $p90 outside exact p85..p95 [$lo90, $hi90]")
    }
  }

  test("q_map_ops builds maps with both keys and reads them back") {
    val rows = graft.SparkEntry.queries("q_map_ops")(spark, sfDir)
      .limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).split(",").toSet == Set("type", "k"))
      assert(Set("signup", "click", "error", "view", "purchase")(r.getString(2)))
    }
  }

  test("flagship entry returns the status rollup with pending derived") {
    val row = graft.SparkEntry.entry(spark).collect()(0)
    val total = row.getLong(0)
    assert(total > 0)
    assert(row.getLong(4) == total - row.getLong(1) - row.getLong(2) - row.getLong(3))
  }

  test("status fixture: grouped counts match the 4-row reference fixture") {
    // tests/test-features.sh:377-427 — one task per status.
    import spark.implicits._
    val fixture = Seq(
      (0, "g", "completed"), (1, "g", "failed"),
      (2, "g", "interrupted"), (3, "g", "pending"))
      .toDF("index", "grp", "status")
    val counts = fixture.groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("completed" -> 1L, "failed" -> 1L,
                         "interrupted" -> 1L, "pending" -> 1L))
  }

  test("token extraction golden doc totals 3800 (tests/test-features.sh:261-275)") {
    // usage: input 1000 + cache_create 500 + cache_read 2000 + output 300.
    import spark.implicits._
    val doc = Seq(
      """{"type":"result","usage":{"input_tokens":1000,"cache_creation_input_tokens":500,"cache_read_input_tokens":2000,"output_tokens":300}}""")
      .toDF("js")
    val out = doc.select(
      (coalesce(get_json_object($"js", "$.usage.input_tokens").cast("long"), lit(0L)) +
       coalesce(get_json_object($"js", "$.usage.cache_creation_input_tokens").cast("long"), lit(0L)) +
       coalesce(get_json_object($"js", "$.usage.cache_read_input_tokens").cast("long"), lit(0L)) +
       coalesce(get_json_object($"js", "$.usage.output_tokens").cast("long"), lit(0L))).as("total"))
      .collect()(0).getLong(0)
    assert(out == 3800L)
  }

  test("token usage extraction: jq-style defaults on edge documents") {
    import spark.implicits._
    val cases = Seq(
      ("""{"usage":{"input_tokens":1000,"cache_creation_input_tokens":500,"cache_read_input_tokens":2000,"output_tokens":300},"modelUsage":{"m":{"contextWindow":100000}}}""",
        "3800:100000"),
      ("""{}""", "0:200000"),
      ("""{"usage":{}}""", "0:200000"),
      ("""{"modelUsage":{}}""", "0:200000"),
      ("""{"modelUsage":{"a":{},"b":{"contextWindow":77}}}""", "0:200000"),
      ("""{"usage":{"input_tokens":5},"modelUsage":{"x":{"contextWindow":1000},"y":{"contextWindow":2000}}}""",
        "5:1000")) // FIRST model's window wins (document order)
    val got = cases.map(_._1).toDF("js")
      .select(graft.functions.TokenUsage.usageLine($"js"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("error classification precedence: rate_limit wins over timeout") {
    // agent-loop.sh:399-411 — '429 ... timed out' must classify rate_limit.
    import spark.implicits._
    val classify = Scalars.classify($"s")
    val cases = Seq(
      "Error 429 rate limit exceeded and timed out" -> "rate_limit",
      "context_length exceeded"                     -> "context_overflow",
      "401 unauthorized"                            -> "auth",
      "request timed out"                           -> "timeout",
      "ECONNREFUSED from host"                      -> "network",
      "something else entirely"                     -> "unknown")
    val got = cases.map(_._1).toDF("s").select(classify.as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
