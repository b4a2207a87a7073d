package graft.tools

import org.apache.spark.sql.SparkSession

/** Warehouse store AUDIT + retention sweep (round-18): with 15+
  * artifact families × fingerprints accumulating across rounds, this
  * lists every `graft_*` table in the warehouse — family, corpus
  * digest (resolved to its path via the `_graft_dirs` registry),
  * fingerprint token, on-disk size, completeness, catalog state — and
  * flags the orphan classes the resolution-time GC cannot reach:
  *
  *   - DEAD-CORPUS families: the registry maps the digest to a path
  *     that no longer exists, so no future resolution of that corpus
  *     will ever run the per-family GC over its variants.
  *   - UNKNOWN digests: tables whose digest the registry has never
  *     seen (pre-registry rounds, or a foreign writer). Flag-only.
  *   - abandoned `_tmp_` staging older than Warehouse.TmpOrphanAgeMs.
  *
  * `--sweep` deletes dead-corpus and aged-tmp entries (never unknowns
  * — a human decides those; never catalog-registered tables — the
  * deferred-GC discipline). Default is list-only.
  *
  * Usage: WarehouseLs [--sweep]
  */
object WarehouseLs {

  /** graft_<family>_<12hex digest>_<12hex fp>[_tmp_<token>] — parsed
    * from the RIGHT because family may itself contain underscores. */
  private[graft] def parseName(n: String)
      : Option[(String, String, String, Boolean)] = {
    if (!n.startsWith("graft_")) return None
    val (core, isTmp) = n.indexOf("_tmp_") match {
      case -1 => (n, false)
      case i  => (n.substring(0, i), true)
    }
    val parts = core.stripPrefix("graft_").split("_")
    if (parts.length < 3) return None
    val fp = parts.last
    val dig = parts(parts.length - 2)
    val hex = "[0-9a-f]{12}".r
    if (!hex.matches(fp) || !hex.matches(dig)) return None
    Some((parts.dropRight(2).mkString("_"), dig, fp, isTmp))
  }

  /** One audited warehouse entry. `corpus` is the registry-resolved
    * path (None = unknown digest); `sweepable` marks the retention
    * candidates `--sweep` deletes. */
  case class Entry(name: String, family: String, digest: String,
                   fp: String, bytes: Long, complete: Boolean,
                   registered: Boolean, isTmp: Boolean,
                   corpus: Option[String], corpusDead: Boolean,
                   sweepable: Boolean)

  /** The audit pass — separated from [[main]] so the retention rules
    * are spec-pinned (WarehouseSpec) rather than print-only. */
  def audit(spark: SparkSession): Seq[Entry] = {
    val whRoot = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(whRoot)) return Seq.empty
    val registry = graft.sources.Warehouse.readDirRegistry(fs, whRoot)
    val now = System.currentTimeMillis()
    fs.listStatus(whRoot).toSeq
      .flatMap(st => parseName(st.getPath.getName).map(p => (st, p)))
      .sortBy { case (_, (fam, dig, fp, _)) => (fam, dig, fp) }
      .map { case (st, (fam, dig, fp, isTmp)) =>
        val loc = st.getPath
        val complete =
          fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))
        val registered = spark.catalog.tableExists(loc.getName)
        val corpus = registry.get(dig)
        // Existence through the path's OWN Hadoop FileSystem (round-19
        // review): java.io.File.exists reads every non-local corpus URI
        // (hdfs://, s3a://) as dead, so --sweep would delete live
        // stores. An unreachable filesystem reads as ALIVE — never
        // sweep on a connectivity error.
        val corpusDead = corpus.exists { p =>
          try {
            val cp = new org.apache.hadoop.fs.Path(p)
            !cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .exists(cp)
          } catch { case _: Exception => false }
        }
        val tmpAged = isTmp && now - st.getModificationTime >
          graft.sources.Warehouse.TmpOrphanAgeMs
        Entry(loc.getName, fam, dig, fp,
          fs.getContentSummary(loc).getLength, complete, registered, isTmp,
          corpus, corpusDead,
          sweepable = (corpusDead || tmpAged) && !registered)
      }
  }

  /** Delete the audit's sweepable entries; returns the swept names. */
  def sweep(spark: SparkSession, entries: Seq[Entry]): Seq[String] = {
    val whRoot = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    entries.filter(_.sweepable).map { e =>
      fs.delete(new org.apache.hadoop.fs.Path(whRoot, e.name), true)
      e.name
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val entries = audit(spark)
    if (entries.isEmpty) { println("[whls] empty warehouse"); spark.stop(); return }
    println(f"[whls] ${"family"}%-22s ${"digest"}%-13s ${"fp"}%-13s ${"MB"}%8s  flags")
    entries.foreach { e =>
      val flags = Seq(
        if (e.complete) None else Some("INCOMPLETE"),
        if (e.registered) Some("registered") else None,
        if (e.isTmp) Some("tmp") else None,
        if (e.sweepable) Some("SWEEPABLE") else None,
        e.corpus match {
          case None => Some("UNKNOWN-DIGEST")
          case Some(p) if e.corpusDead => Some(s"DEAD-CORPUS($p)")
          case Some(p) => Some(p)
        }).flatten.mkString(" ")
      println(f"[whls] ${e.family}%-22s ${e.digest}%-13s ${e.fp}%-13s ${e.bytes / 1048576.0}%8.2f  $flags")
    }
    println(f"[whls] total ${entries.map(_.bytes).sum / 1048576.0}%.2f MB across " +
      s"${entries.size} entries; sweepable ${entries.count(_.sweepable)}")
    if (args.contains("--sweep"))
      sweep(spark, entries).foreach(n => println(s"[whls] swept $n"))
    else if (entries.exists(_.sweepable))
      println("[whls] run with --sweep to delete the flagged entries")
    spark.stop()
  }
}
