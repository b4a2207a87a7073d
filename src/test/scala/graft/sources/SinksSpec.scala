package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("daily append sink: partition dirs per day, appends accumulate, reads back") {
    val dir = Files.createTempDirectory("graft-daily").toString
    val events = graft.Tables.events(spark, sfDir).limit(200)
      .select(col("event_id"), col("ts"), col("event_type"))
    Sinks.appendDaily(events, "ts", dir)
    Sinks.appendDaily(events, "ts", dir) // append, not overwrite
    val days = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day="))
    assert(days.nonEmpty && days.forall(_.matches("day=\\d{4}-\\d{2}-\\d{2}")))
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    // Partition pruning: reading one day touches one directory.
    val oneDay = days.head.stripPrefix("day=")
    val pruned = back.filter(col("day") === oneDay)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scanned.contains("PartitionFilters"))
  }

  test("z-order write: each file covers a small rectangle of BOTH key columns") {
    import spark.implicits._
    // Two independent uniform keys (the low and high digit pairs of
    // id) — the case where clustering by one column leaves the other's
    // per-file range at ~full span.
    val df = (0L until 10000L)
      .map(id => (id, id % 100, id / 100))
      .toDF("id", "a", "b")
    def perFileAvgRange(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val ranges = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).collect()(0)
        r.getDouble(1) - r.getDouble(0)
      }
      ranges.sum / ranges.length
    }
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val rDir = Files.createTempDirectory("graft-range").toString
    Sinks.writeZOrdered(df, "a", "b", 16, zDir)
    Sinks.writeRangeClustered(df, "a", 16, rDir)
    // Single-column layout: tight on a, but every file spans ~all of b.
    assert(perFileAvgRange(rDir, "a") < 20,
      s"range-clustered a range ${perFileAvgRange(rDir, "a")}")
    assert(perFileAvgRange(rDir, "b") > 90,
      s"range-clustered b range ${perFileAvgRange(rDir, "b")}")
    // Z-order: BOTH columns' per-file ranges shrink well below full
    // span (16 files = 4 z-bits = a 4×4 grid ⟹ ~25 expected), which is
    // exactly what lets footer stats prune files on either predicate.
    val (za, zb) = (perFileAvgRange(zDir, "a"), perFileAvgRange(zDir, "b"))
    assert(za < 60 && zb < 60, s"z-order per-file ranges a=$za b=$zb")
    // And the data survives the round trip.
    assert(spark.read.parquet(zDir).count() == 10000)
    // Empty input writes an empty dataset instead of NPE-ing on the
    // all-null min/max row.
    val eDir = Files.createTempDirectory("graft-zempty").toString
    Sinks.writeZOrdered(df.filter(col("id") < 0), "a", "b", 4, eDir)
    assert(spark.read.parquet(eDir).count() == 0)
  }

  test("idempotent batch sink: replaying a batch does not duplicate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-idem").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.idempotentAppend(batch, 7L, dir)
    Sinks.idempotentAppend(batch, 7L, dir) // replay of the same batch
    Sinks.idempotentAppend(batch, 8L, dir) // a genuinely new batch
    assert(spark.read.parquet(s"$dir/batch_id=*").count() == 4)
  }

  test("compaction: many small files rewritten to the target count, data intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 100).toDF("n").repartition(50).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts >= 40)
    Sinks.compact(spark, dir, 2)
    assert(parts <= 2, s"still $parts files")
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0) == 5050)
  }

  test("compaction swap: no tmp/old leftovers, survives a stale .compact-old") {
    import spark.implicits._
    val parent = Files.createTempDirectory("graft-compact2")
    val dir = parent.toString + "/t"
    (1 to 60).toDF("n").repartition(10).write.parquet(dir)
    // Simulate a previous compact that crashed after moving the table
    // aside: a stale .compact-old must not block the next run.
    Files.createDirectory(java.nio.file.Paths.get(dir + ".compact-old"))
    Sinks.compact(spark, dir, 1)
    val siblings = parent.toFile.listFiles().map(_.getName).toSet
    assert(siblings == Set("t"), s"leftover dirs: $siblings")
    assert(spark.read.parquet(dir)
      .agg(sum("n")).collect()(0).getLong(0) == 30 * 61)
  }

  test("compaction recovers a table stranded at .compact-old by a mid-swap crash") {
    import spark.implicits._
    val parent = Files.createTempDirectory("graft-compact3")
    val dir = parent.toString + "/t"
    (1 to 40).toDF("n").repartition(8).write.parquet(dir)
    // Simulate a crash BETWEEN the two renames: table moved aside,
    // nothing at the real path. The next compact must restore and
    // proceed, not die on an unrelated path-not-found read.
    Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".compact-old"))
    Sinks.compact(spark, dir, 1)
    val siblings = parent.toFile.listFiles().map(_.getName).toSet
    assert(siblings == Set("t"), s"leftover dirs: $siblings")
    assert(spark.read.parquet(dir)
      .agg(sum("n")).collect()(0).getLong(0) == 20 * 41)
  }

  test("range-clustered write: per-file key ranges are disjoint (skippable layout)") {
    val dir = Files.createTempDirectory("graft-range").toString + "/t"
    Sinks.writeRangeClustered(
      graft.Tables.orders(spark, sfDir).select(col("o_orderkey")),
      "o_orderkey", 4, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath).sorted
    assert(files.length >= 3)
    // Each file holds a contiguous, non-overlapping key range.
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey"), max("o_orderkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("per-key sink: one directory per key, overwrite replaces") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-perkey").toString
    val logs = Seq(
      ("001-setup--install.log", "line a"),
      ("001-setup--install.log", "line b"),
      ("002-build--compile.log", "line c"))
      .toDF("log_name", "line")
    Sinks.writePerKey(logs, "log_name", dir)
    val keys = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(keys.toSeq == Seq(
      "log_name=001-setup--install.log", "log_name=002-build--compile.log"))
    assert(spark.read.parquet(dir).count() == 3)
  }
}
