package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-native MVCC table — the Delta/Iceberg core idea, self-built
  * on [[TableLog]]'s lock + log primitives (no Delta in the jar set):
  * writers APPEND uniquely-named parquet files and atomically flip a
  * FULL-live-set manifest; readers plan from the manifest, never from a
  * directory listing. That one inversion buys three properties a
  * rename-swapped layout ([[MergeOps]] + [[TableLog.withExclusive]])
  * cannot offer:
  *
  *  1. **Structural reader isolation** — the files a manifest names are
  *     immutable and retained until [[vacuum]], so a reader can never
  *     race a writer; [[TableLog.readValidated]]'s re-plan-on-drift
  *     loop (optimistic validation, the best a listing-planned layout
  *     can do) becomes unnecessary here by construction. The contract
  *     is Delta's: retention must exceed the longest reader
  *     (vacuum(keepLast) documents it).
  *  2. **Time travel** — [[read]] with `asOf` plans any retained
  *     version; a vacuumed version fails loudly, never silently reads
  *     a torn mix.
  *  3. **Metadata-only deletes** — [[removePartitions]] drops a
  *     partition from the table by flipping the manifest: ZERO data
  *     I/O, instantly undoable by reading the previous version.
  *
  * Layout: `root/<dateCol>=D/part-*.parquet` (append-only data files),
  * `root/_graft_log/_v%08d.json` manifests in [[TableLog]]'s exact
  * format — [[TableLog.snapshot]] and [[TableLog.currentVersion]] work
  * on a LogTable root unchanged — except each manifest records the
  * ENTIRE live set (every partition), not just the commit's touch set,
  * so any version reconstructs from ONE manifest (the Delta-checkpoint
  * shape; O(partitions) rows of metadata per commit).
  *
  * Scale shape: commits move only the new files' rows plus one
  * metadata JSON; replacePartitions appends the replacement rows and
  * flips — old files are never rewritten, [[vacuum]] reclaims them
  * after retention. Reads are explicit-file-list parquet scans with
  * `basePath` partition inference, so partition pruning and column
  * pruning behave exactly as on a directory-planned table.
  */
object LogTable {

  /** One live data file: name, size, and (when the commit declared
    * stats columns) its zone maps — row count and per-column min/max,
    * the Delta/Iceberg data-skipping statistics. `rows` = -1 and empty
    * zones mean "no stats recorded" (pre-stats commit, or an all-null
    * file) — such a file is always planned, never skipped. A column
    * absent from `zones` (all-null in this file, or added to statsCols
    * after the file was committed) likewise never skips this file. */
  final case class FileStat(file: String, bytes: Long, rows: Long = -1L,
                            zones: Map[String, (Double, Double)] =
                              Map.empty)

  /** One version's full live set: partition dir name → live files, plus
    * the stats columns the zone maps describe (if any commit declared
    * them) and the table schema AT THIS VERSION (Spark DDL — the Delta
    * move that makes add-column evolution and schema time travel work:
    * readers plan with the version's schema, files written before a
    * column existed null-fill it). */
  final case class Manifest(version: Long, action: String,
                            statsCols: Seq[String],
                            schemaDdl: Option[String],
                            parts: Map[String, Seq[FileStat]])

  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  private def jstr(s: String) = graft.JsonUtil.jstr(s)

  private def jdouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Write manifest version current+1 with the given FULL live set.
    * MUST be called under [[TableLog.withLock]]. Zone maps serialize as
    * FLAT per-file keys (`"min:<col>"`/`"max:<col>"`, sorted by column)
    * so the file objects stay bracket-free and the parser stays a
    * regex walk. The schema serializes as Spark DDL (backtick-quoted
    * identifiers — never a double quote, so the parser's [^"]* capture
    * is safe). */
  private def writeManifest(spark: SparkSession, tableRoot: String,
                            action: String, statsCols: Seq[String],
                            schemaDdl: Option[String],
                            parts: Map[String, Seq[FileStat]]): Long = {
    val (fs, root) = TableLog.fsFor(spark, tableRoot)
    val v = TableLog.currentVersion(spark, tableRoot) + 1
    val body = {
      val ps = parts.toSeq.sortBy(_._1).map { case (part, files) =>
        val fl = files.sortBy(_.file).map { fsStat =>
          val stats =
            (if (fsStat.rows >= 0L) s""","rows":${fsStat.rows}""" else "") +
            fsStat.zones.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
              s""","min:${c}":${jdouble(lo)},"max:${c}":${jdouble(hi)}"""
            }.mkString
          s"""{"file":${jstr(fsStat.file)},"bytes":${fsStat.bytes}$stats}"""
        }.mkString("[", ",", "]")
        s"""{"part":${jstr(part)},"files":$fl}"""
      }.mkString("[", ",", "]")
      val sc =
        if (statsCols.isEmpty) ""
        else statsCols.map(jstr).mkString(""""statsCols":[""", ",", "],")
      val sd = schemaDdl
        .map(ddl => s""""schemaDdl":${jstr(ddl)},""").getOrElse("")
      s"""{"version":$v,"action":${jstr(action)},$sd$sc""" +
        s""""ts":${System.currentTimeMillis()},"parts":$ps}"""
    }
    val ld = TableLog.logDir(root)
    val finalP = new org.apache.hadoop.fs.Path(ld, f"_v$v%08d.json")
    val tmpP = new org.apache.hadoop.fs.Path(ld, f"._v$v%08d.json.tmp")
    fs.mkdirs(ld)
    val out = fs.create(tmpP, true)
    out.write(body.getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmpP, finalP))
      sys.error(s"LogTable: commit $finalP already exists — concurrent " +
        "unserialized writer detected")
    v
  }

  /** Parse one retained manifest; loud error when the version was never
    * committed or has been vacuumed away. */
  def manifest(spark: SparkSession, tableRoot: String,
               version: Long): Manifest = {
    val (fs, root) = TableLog.fsFor(spark, tableRoot)
    val p = new org.apache.hadoop.fs.Path(TableLog.logDir(root),
      f"_v$version%08d.json")
    if (!fs.exists(p))
      sys.error(s"LogTable: version $version of $tableRoot is not " +
        "retained (never committed, or reclaimed by vacuum) — time " +
        "travel reaches only versions inside the vacuum retention window")
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val action = "\"action\":\"([^\"]*)\"".r.findFirstMatchIn(body)
      .map(_.group(1)).getOrElse("")
    val statsCols = "\"statsCols\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(body).map(_.group(1)) match {
      case Some(inner) if inner.nonEmpty =>
        "\"([^\"]*)\"".r.findAllMatchIn(inner).map(_.group(1)).toSeq
      case _ => Seq.empty[String]
    }
    val schemaDdl = "\"schemaDdl\":\"([^\"]*)\"".r
      .findFirstMatchIn(body).map(_.group(1))
    // the parts array starts after the statsCols array (if any), so the
    // per-part files regex never sees a foreign ']'
    val partsBody = body.substring(body.indexOf("\"parts\":"))
    val partRe = "\\{\"part\":\"([^\"]*)\",\"files\":\\[([^\\]]*)\\]\\}".r
    val fileObjRe = "\\{[^{}]*\\}".r
    val fieldRe = "\"([^\"]+)\":(\"[^\"]*\"|[^,}]+)".r
    val parts = partRe.findAllMatchIn(partsBody).map { m =>
      m.group(1) -> fileObjRe.findAllMatchIn(m.group(2)).map { fo =>
        val fields = fieldRe.findAllMatchIn(fo.matched)
          .map(fm => fm.group(1) -> fm.group(2)).toMap
        val zones = fields.keys
          .filter(_.startsWith("min:")).map(_.stripPrefix("min:"))
          .filter(c => fields.contains(s"max:$c"))
          .map(c => c -> (fields(s"min:$c").toDouble,
            fields(s"max:$c").toDouble)).toMap
        FileStat(fields("file").stripPrefix("\"").stripSuffix("\""),
          fields("bytes").toLong,
          fields.get("rows").map(_.toLong).getOrElse(-1L),
          zones)
      }.toSeq
    }.toMap
    Manifest(version, action, statsCols, schemaDdl, parts)
  }

  /** Plan an explicit file list with the manifest's schema (when
    * recorded): files written before a column was added null-fill it,
    * and EVERY internal scan goes through here so a mixed-schema live
    * set can never silently resolve to one file's schema (parquet's
    * default no-merge behavior — the footgun schema evolution exists
    * to remove). */
  private def scanFiles(spark: SparkSession, tableRoot: String,
                        m: Manifest, files: Seq[String]): DataFrame = {
    val r = spark.read.option("basePath", tableRoot)
    m.schemaDdl match {
      case Some(ddl) =>
        r.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
          .parquet(files: _*)
      case None => r.parquet(files: _*)
    }
  }

  /** The schema a commit of `df` over `prev` yields: every existing
    * column must survive with its type (add-only evolution — drops and
    * retypes fail loudly); genuinely NEW columns append in `df` order
    * and must be nullable (files predating them null-fill). */
  private def evolvedDdl(prev: Option[Manifest], df: DataFrame,
                         action: String): String = {
    import org.apache.spark.sql.types.StructType
    val incoming = df.schema
    prev.flatMap(_.schemaDdl) match {
      case None => incoming.toDDL
      case Some(ddl) =>
        val old = StructType.fromDDL(ddl)
        val byName = incoming.fields.map(f => f.name -> f).toMap
        old.fields.foreach { f =>
          val n = byName.get(f.name)
          require(n.isDefined,
            s"LogTable.$action: column ${f.name} missing from the " +
              "incoming frame — evolution is add-only, columns cannot " +
              "be dropped")
          require(n.get.dataType == f.dataType,
            s"LogTable.$action: column ${f.name} changes type " +
              s"${f.dataType.simpleString} -> " +
              s"${n.get.dataType.simpleString} — retypes are not " +
              "supported")
        }
        val oldNames = old.fields.map(_.name).toSet
        val added = incoming.fields.filterNot(f => oldNames(f.name))
        added.foreach(f => require(f.nullable,
          s"LogTable.$action: new column ${f.name} must be nullable — " +
            "files written before it exist null-fill it"))
        StructType(old.fields ++ added).toDDL
    }
  }

  private def partDirName(dateCol: String, d: Option[java.sql.Date]) =
    d.map(dd => s"$dateCol=$dd").getOrElse(s"$dateCol=$NullPart")

  /** The distinct partition dirs `df` would write (metadata collect). */
  private def touchedParts(df: DataFrame, dateCol: String): Seq[String] =
    df.select(col(dateCol)).distinct().collect()
      .map(r => partDirName(dateCol, Option(r.getDate(0)))).toSeq

  /** List the CURRENT physical files of the given partition dirs. */
  private def listParts(spark: SparkSession, tableRoot: String,
                        parts: Seq[String])
      : Map[String, Seq[FileStat]] = {
    val (fs, root) = TableLog.fsFor(spark, tableRoot)
    parts.map(p => p -> TableLog.liveFiles(fs,
      new org.apache.hadoop.fs.Path(root, p))
      .map { case (f, len) => FileStat(f, len) }).toMap
  }

  /** Zone-map the given files: ONE metadata-scale job computing per-file
    * (rows, min/max of EVERY stats column). Keyed by "part/file" suffix.
    * Stats columns are cast to double for the manifest — exact for
    * |v| < 2⁵³ (every long the engine's fixtures emit); beyond that the
    * zone is the rounded double, so skipping stays a SUPERSET as long as
    * callers probe with the same double cast (readSkipping does). */
  private def fileStats(spark: SparkSession, tableRoot: String,
                        statsCols: Seq[String],
                        parts: Map[String, Seq[FileStat]])
      : Map[String, (Long, Map[String, (Double, Double)])] = {
    val paths = parts.toSeq.flatMap { case (p, fl) =>
      fl.map(f => s"$tableRoot/$p/${f.file}") }
    if (paths.isEmpty) Map.empty
    else {
      spark.read.option("basePath", tableRoot).parquet(paths: _*)
        .groupBy(input_file_name().as("__f"))
        .agg(count(lit(1)).as("__n"),
          statsCols.flatMap(c => Seq(
            min(col(c).cast("double")).as(s"__lo:$c"),
            max(col(c).cast("double")).as(s"__hi:$c"))): _*)
        .collect()
        .map { r =>
          val uri = r.getString(0)
          val tail = uri.split('/').takeRight(2).mkString("/")
          val zones = statsCols.flatMap { c =>
            val (li, hi) =
              (r.fieldIndex(s"__lo:$c"), r.fieldIndex(s"__hi:$c"))
            if (r.isNullAt(li) || r.isNullAt(hi)) None
            else Some(c -> (r.getDouble(li), r.getDouble(hi)))
          }.toMap
          tail -> (r.getLong(1), zones)
        }.toMap
    }
  }

  /** Attach zone maps to the new files of a commit (no-op without
    * stats columns). */
  private def withStats(spark: SparkSession, tableRoot: String,
                        statsCols: Seq[String],
                        parts: Map[String, Seq[FileStat]])
      : Map[String, Seq[FileStat]] =
    if (statsCols.isEmpty) parts
    else {
      require(statsCols.forall(_.matches("[A-Za-z0-9_]+")),
        s"LogTable stats columns must be plain identifiers, got " +
          statsCols.mkString(","))
      val stats = fileStats(spark, tableRoot, statsCols, parts)
      parts.map { case (p, fl) =>
        p -> fl.map { f =>
          stats.get(s"$p/${f.file}") match {
            case Some((n, zones)) => f.copy(rows = n, zones = zones)
            case None => f
          }
        }
      }
    }

  /** Create the table: write `df` date-partitioned and commit manifest
    * v1 holding the full live set. `statsCols` (optional, numeric)
    * records per-file zone maps of each named column for
    * [[readSkipping]]. Returns the committed version (1). */
  def init(df: DataFrame, tableRoot: String,
           dateCol: String = "start_date_oslo",
           statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    TableLog.withLock(spark, tableRoot, "init") {
      require(TableLog.currentVersion(spark, tableRoot) == 0L,
        s"LogTable.init: $tableRoot already has commits")
      df.write.mode(SaveMode.Append).partitionBy(dateCol).parquet(tableRoot)
      val parts = touchedParts(df, dateCol)
      writeManifest(spark, tableRoot, "init", statsCols,
        Some(df.schema.toDDL),
        withStats(spark, tableRoot, statsCols,
          listParts(spark, tableRoot, parts)))
    }
  }

  /** Replace the partitions `updated` covers: APPEND the replacement
    * rows as new files (old files untouched — they stay readable at
    * previous versions), then flip the manifest so the touched
    * partitions' live sets are exactly the new files. Returns the
    * committed version. */
  def replacePartitions(spark: SparkSession, tableRoot: String,
                        updated: DataFrame,
                        dateCol: String = "start_date_oslo"): Long =
    TableLog.withLock(spark, tableRoot, "replace") {
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.replacePartitions: $tableRoot has no " +
        "manifest — init first")
      val prev = manifest(spark, tableRoot, v)
      val ddl = evolvedDdl(Some(prev), updated, "replacePartitions")
      val touched = touchedParts(updated, dateCol)
      val pre = listParts(spark, tableRoot, touched)
      updated.write.mode(SaveMode.Append).partitionBy(dateCol)
        .parquet(tableRoot)
      val post = listParts(spark, tableRoot, touched)
      val newFiles = touched.map { p =>
        val before = pre(p).map(_.file).toSet
        p -> post(p).filterNot(f => before(f.file))
      }.toMap
      writeManifest(spark, tableRoot, "replace", prev.statsCols,
        Some(ddl), prev.parts -- touched ++
          withStats(spark, tableRoot, prev.statsCols, newFiles))
    }

  /** Metadata-only partition delete: the named partition dirs leave the
    * live set by a manifest flip — zero data I/O, undone by reading the
    * previous version. Unknown partitions are ignored. */
  def removePartitions(spark: SparkSession, tableRoot: String,
                       parts: Seq[String]): Long =
    TableLog.withLock(spark, tableRoot, "remove") {
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.removePartitions: $tableRoot has no " +
        "manifest — init first")
      val prev = manifest(spark, tableRoot, v)
      writeManifest(spark, tableRoot, "remove", prev.statsCols,
        prev.schemaDdl, prev.parts -- parts)
    }

  /** Append rows as new files + a manifest flip (existing partitions
    * keep their files, new partitions join the live set). `txnId`, when
    * given, makes the commit IDEMPOTENT — the Delta streaming-sink
    * trick: the txn id is recorded in the manifest action
    * (`append:txn=<id>`), and a later call with an id some retained
    * manifest already carries is a NO-OP returning the current version.
    * A foreachBatch sink passing its (queryId, batchId) therefore gets
    * exactly-once table contents under micro-batch replay — the
    * at-least-once delivery every checkpoint recovery implies collapses
    * at the commit, not in the data. (Retention caveat: vacuum must
    * keep at least the replay horizon's manifests for the dedup to see
    * them — the same contract as Delta's txn retention.)
    */
  def append(spark: SparkSession, tableRoot: String, rows: DataFrame,
             dateCol: String = "start_date_oslo",
             txnId: Option[String] = None): Long =
    TableLog.withLock(spark, tableRoot, "append") {
      val v = TableLog.currentVersion(spark, tableRoot)
      val action = txnId.map(t => s"append:txn=$t").getOrElse("append")
      if (txnId.isDefined && v > 0L &&
          (1L to v).exists(i =>
            try manifest(spark, tableRoot, i).action == action
            catch { case _: RuntimeException => false })) {
        v // this txn already committed — replay collapses here
      } else {
        val prevM = if (v > 0L) Some(manifest(spark, tableRoot, v)) else None
        val prev = prevM.map(_.parts)
          .getOrElse(Map.empty[String, Seq[FileStat]])
        val sc = prevM.map(_.statsCols).getOrElse(Seq.empty)
        val ddl = evolvedDdl(prevM, rows, "append")
        val touched = touchedParts(rows, dateCol)
        val pre = listParts(spark, tableRoot, touched)
        rows.write.mode(SaveMode.Append).partitionBy(dateCol)
          .parquet(tableRoot)
        val post = listParts(spark, tableRoot, touched)
        val newFiles = touched.map { p =>
          val before = pre(p).map(_.file).toSet
          p -> post(p).filterNot(f => before(f.file))
        }.toMap
        val statted = withStats(spark, tableRoot, sc, newFiles)
        val merged = touched.map { p =>
          p -> (prev.getOrElse(p, Seq.empty) ++ statted(p))
        }.toMap
        writeManifest(spark, tableRoot, action, sc, Some(ddl),
          prev ++ merged)
      }
    }

  /** Plan the table at `asOf` (default: latest) from its manifest — an
    * explicit-file-list scan with `basePath` partition inference, so
    * the partition column survives and prunes normally. */
  def read(spark: SparkSession, tableRoot: String,
           asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(TableLog.currentVersion(spark, tableRoot))
    require(v > 0L, s"LogTable.read: $tableRoot has no committed version")
    val m = manifest(spark, tableRoot, v)
    val files = m.parts.toSeq.sortBy(_._1).flatMap { case (p, fl) =>
      fl.map(f => s"$tableRoot/$p/${f.file}") }
    require(files.nonEmpty,
      s"LogTable.read: version $v of $tableRoot is empty")
    scanFiles(spark, tableRoot, m, files)
  }

  /** Plan only the files whose zone map CAN contain a `col` value
    * in [lo, hi] — manifest-level data skipping, the Delta/Iceberg
    * file-pruning move. The scan is a SUPERSET of the matching rows
    * (zone maps are necessary, not sufficient): callers apply the exact
    * row filter on the returned frame; what skipping buys is that at
    * 100 TB the files whose zones miss the range are never listed,
    * opened, or footer-read at all — driver-side planning over
    * O(manifest) metadata, zero data I/O. Files without stats (committed
    * before a stats column was declared, or all-null) are always
    * planned. `lo`/`hi` are inclusive; the probe value is compared
    * against the manifest's double-cast zone, matching how the zones
    * were written. Fails loudly when `col` is not one of the manifest's
    * declared stats columns — a zone map for one column says nothing
    * about another. Probes on DIFFERENT stats columns compose by
    * intersecting the planned file lists caller-side (each call prunes
    * independently).
    */
  def readSkipping(spark: SparkSession, tableRoot: String, col: String,
                   lo: Double, hi: Double,
                   asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(TableLog.currentVersion(spark, tableRoot))
    require(v > 0L,
      s"LogTable.readSkipping: $tableRoot has no committed version")
    val m = manifest(spark, tableRoot, v)
    require(m.statsCols.contains(col),
      s"LogTable.readSkipping: version $v records zone maps for " +
        s"[${m.statsCols.mkString(",")}], not $col")
    val files = m.parts.toSeq.sortBy(_._1).flatMap { case (p, fl) =>
      fl.filter(f => f.zones.get(col) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // no stats -> cannot skip safely
      }).map(f => s"$tableRoot/$p/${f.file}")
    }
    if (files.isEmpty)
      // every zone missed: an empty frame with the table's schema
      read(spark, tableRoot, Some(v)).limit(0)
    else spark.read.option("basePath", tableRoot).parquet(files: _*)
  }

  /** Multi-column data skipping: plan only files whose zone maps can
    * contain a row satisfying EVERY [lo, hi] predicate at once — the
    * conjunction prunes the INTERSECTION of the per-column survivor
    * sets in one manifest walk, which is exactly what
    * [[optimizeZorder]]'s hyper-rectangle files exist for (a 2-D probe
    * on a 4-cell tiling plans ONE file where either single-column probe
    * plans two). Same superset and stat-less-file semantics as
    * [[readSkipping]];
    * every probed column must be a declared stats column. */
  def readSkippingAll(spark: SparkSession, tableRoot: String,
                      preds: Seq[(String, Double, Double)],
                      asOf: Option[Long] = None): DataFrame = {
    require(preds.nonEmpty, "readSkippingAll needs at least one predicate")
    val v = asOf.getOrElse(TableLog.currentVersion(spark, tableRoot))
    require(v > 0L,
      s"LogTable.readSkippingAll: $tableRoot has no committed version")
    val m = manifest(spark, tableRoot, v)
    preds.foreach { case (c, _, _) =>
      require(m.statsCols.contains(c),
        s"LogTable.readSkippingAll: version $v records zone maps for " +
          s"[${m.statsCols.mkString(",")}], not $c")
    }
    val files = m.parts.toSeq.sortBy(_._1).flatMap { case (p, fl) =>
      fl.filter(f => preds.forall { case (c, lo, hi) =>
        f.zones.get(c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true // no stats -> cannot skip safely
        }
      }).map(f => s"$tableRoot/$p/${f.file}")
    }
    if (files.isEmpty) read(spark, tableRoot, Some(v)).limit(0)
    else scanFiles(spark, tableRoot, m, files)
  }

  /** OPTIMIZE: bin-pack each partition whose live set holds more than
    * one file under `targetBytes` into ~targetBytes files — the
    * time-travel-safe compaction (vs [[MergeOps]]' rename-based
    * compactor for listing-planned layouts): compacted rows are written
    * as NEW files and the manifest flips, so every prior version still
    * reads bit-identically until [[vacuum]] reclaims it, and a reader
    * planned from the old manifest never sees a file disappear. Only
    * partitions with ≥ 2 sub-target files are rewritten (an already
    * -compact partition costs zero I/O). Returns the committed version,
    * or the current one when nothing qualified. */
  def compact(spark: SparkSession, tableRoot: String,
              targetBytes: Long,
              dateCol: String = "start_date_oslo"): Long =
    TableLog.withLock(spark, tableRoot, "compact") {
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.compact: $tableRoot has no manifest")
      val prev = manifest(spark, tableRoot, v)
      val todo = prev.parts.filter { case (_, fl) =>
        fl.count(_.bytes < targetBytes) >= 2 }
      if (todo.isEmpty) v
      else {
        val pre = listParts(spark, tableRoot, todo.keys.toSeq)
        todo.toSeq.sortBy(_._1).foreach { case (p, fl) =>
          val small = fl.filter(_.bytes < targetBytes)
          val paths = small.map(f => s"$tableRoot/$p/${f.file}")
          val totalBytes = small.map(_.bytes).sum
          val nOut = math.max(1, (totalBytes / targetBytes).toInt +
            (if (totalBytes % targetBytes > 0) 1 else 0))
          // pack into the SAME partition dir as new files; at-target
          // files stay live untouched
          scanFiles(spark, tableRoot, prev, paths)
            .drop(dateCol) // partition col is in the dir name
            .coalesce(nOut)
            .write.mode(SaveMode.Append).parquet(s"$tableRoot/$p")
        }
        val post = listParts(spark, tableRoot, todo.keys.toSeq)
        val flipped = todo.map { case (p, fl) =>
          val before = pre(p).map(_.file).toSet
          val big = fl.filterNot(_.bytes < targetBytes)
          p -> (big ++ post(p).filterNot(f => before(f.file)))
        }
        val statted = withStats(spark, tableRoot, prev.statsCols,
          flipped.map { case (p, fl) =>
            // re-stat only the NEW files; survivors keep their zones
            p -> fl.filter(f => f.rows < 0L && f.zones.isEmpty)
          })
        val mergedNew = flipped.map { case (p, fl) =>
          val restat = statted.getOrElse(p, Seq.empty)
            .map(f => f.file -> f).toMap
          p -> fl.map(f => restat.getOrElse(f.file, f))
        }
        writeManifest(spark, tableRoot, "compact", prev.statsCols,
          prev.schemaDdl, prev.parts ++ mergedNew)
      }
    }

  /** OPTIMIZE ZORDER: rewrite each partition's live set clustered along
    * the Morton curve of `zCols` ([[ScaleOps.zorderValue]] — the public
    * bit-interleave behind Delta/Iceberg `ZORDER BY`), so each new file
    * owns a contiguous curve segment = a small hyper-rectangle in ALL
    * clustered dimensions at once. Zone maps ([[readSkipping]]) then
    * prune on ANY clustered column — a table appended in arrival order
    * has every file's zone spanning the whole value range, and zone
    * skipping prunes nothing until this rewrite tightens the zones.
    * Time-travel-safe like [[compact]]: clustered rows land as NEW
    * files, the manifest flips, every prior version reads bit-identically
    * until [[vacuum]].
    *
    * Each column is scaled onto the curve grid by its GLOBAL min/max
    * (one metadata-scale agg over the snapshot — per-partition grids
    * would make zones incomparable across partitions); a null in any
    * clustered column clusters at the curve origin (cell 0 — zone maps
    * ignore nulls, so this costs nothing). The rewrite is O(live rows
    * of rewritten partitions) — Z-order's inherent contract (Delta's
    * OPTIMIZE ZORDER rewrites every selected file too); `parts` limits
    * the rewrite to named partitions for incremental runs at 100 TB.
    *
    * Files are split at CURVE-CELL boundaries (the top
    * ⌈log₂ filesPerPartition⌉ interleaved bits — rounded up to a power
    * of two), NOT at row-count quantiles: a quantile boundary straddles
    * a cell edge and the first rows past it sit at the LOW end of the
    * next cell's minor dimensions, blowing that file's zone open to the
    * full range (measured: a quantile-split file went uid [0, 149] on
    * uniform data). Cell-aligned files are exact hyper-rectangles —
    * deterministic zones at the cost of balance under skew (uniform
    * dims split evenly; rank-bin a heavy-tailed column upstream if
    * balance matters). Returns the committed version, or the current
    * one when the live set is empty. */
  def optimizeZorder(spark: SparkSession, tableRoot: String,
                     zCols: Seq[String], bits: Int,
                     filesPerPartition: Int,
                     dateCol: String = "start_date_oslo",
                     parts: Option[Seq[String]] = None): Long =
    TableLog.withLock(spark, tableRoot, "zorder") {
      require(zCols.size >= 2, "optimizeZorder needs >= 2 cluster columns")
      require(!zCols.contains(dateCol),
        "the partition column is clustered by the directory layout " +
          "already — z-cluster the in-file columns")
      require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.optimizeZorder: $tableRoot has no manifest")
      val prev = manifest(spark, tableRoot, v)
      val todo = prev.parts
        .filter { case (p, fl) => fl.nonEmpty && parts.forall(_.contains(p)) }
      if (todo.isEmpty) v
      else {
        val statsRow = read(spark, tableRoot, Some(v)).agg(
          min(col(zCols.head).cast("double")).as("__m0"),
          zCols.zipWithIndex.flatMap { case (c, i) =>
            (if (i == 0) Seq.empty
             else Seq(min(col(c).cast("double")).as(s"__m$i"))) :+
              max(col(c).cast("double")).as(s"__x$i")
          }: _*).collect().head
        val grid = (1L << bits).toDouble
        val scaled: Seq[org.apache.spark.sql.Column] =
          zCols.zipWithIndex.map { case (c, i) =>
            val loIdx = statsRow.fieldIndex(s"__m$i")
            val hiIdx = statsRow.fieldIndex(s"__x$i")
            val lo = if (statsRow.isNullAt(loIdx)) 0.0
                     else statsRow.getDouble(loIdx)
            val hi = if (statsRow.isNullAt(hiIdx)) 0.0
                     else statsRow.getDouble(hiIdx)
            val span = if (hi > lo) hi - lo else 1.0
            coalesce(
              least(lit((1L << bits) - 1L),
                floor((col(c).cast("double") - lit(lo)) * lit(grid) /
                  lit(span)).cast("long")),
              lit(0L))
          }
        val zc = ScaleOps.zorderValue(scaled, bits)
        // cell-aligned split: bucket = the curve value's top bits, one
        // bucket per output file (power-of-two tiling — see Scaladoc)
        val cellBits = {
          var b = 0
          while ((1 << b) < filesPerPartition) b += 1
          b
        }
        val nCells = 1 << cellBits
        require(cellBits <= zCols.size * bits,
          s"filesPerPartition=$filesPerPartition exceeds the curve's " +
            s"${zCols.size * bits}-bit cell resolution — raise bits")
        val shift = zCols.size * bits - cellBits
        val pre = listParts(spark, tableRoot, todo.keys.toSeq)
        todo.toSeq.sortBy(_._1).foreach { case (p, fl) =>
          val paths = fl.map(f => s"$tableRoot/$p/${f.file}")
          val withCell = scanFiles(spark, tableRoot, prev, paths)
            .drop(dateCol)
            .withColumn("__z", zc)
            .withColumn("__cell", shiftright(col("__z"), shift))
          // EXACT cell → partition mapping: a range/quantile split can
          // merge cells under sampling noise (observed), and hash
          // partitioning happens to be the identity for Long keys in
          // [0, nCells) — Long.hashCode is the value itself there, so
          // each curve cell lands in its own output file, guaranteed.
          val schema = withCell.schema
          val cellIdx = schema.fieldIndex("__cell")
          val tiled = withCell.rdd
            .map(r => (r.getLong(cellIdx), r))
            .partitionBy(new org.apache.spark.HashPartitioner(nCells))
            .values
          spark.createDataFrame(tiled, schema)
            .sortWithinPartitions("__z")
            .drop("__z", "__cell")
            .write.mode(SaveMode.Append).parquet(s"$tableRoot/$p")
        }
        val post = listParts(spark, tableRoot, todo.keys.toSeq)
        val newFiles = todo.keys.toSeq.map { p =>
          val before = pre(p).map(_.file).toSet
          p -> post(p).filterNot(f => before(f.file))
        }.toMap
        val statted = withStats(spark, tableRoot, prev.statsCols, newFiles)
        writeManifest(spark, tableRoot, "zorder", prev.statsCols,
          prev.schemaDdl, prev.parts ++ statted)
      }
    }

  /** Keyed MERGE (upsert) with file-granular copy-on-write — the Delta
    * MERGE core, on the manifest: rows of `updates` whose key matches an
    * existing row REPLACE every matched row; unmatched update rows are
    * INSERTED. Only files that actually CONTAIN a matched key are
    * rewritten — their surviving (unmatched) rows are re-appended
    * together with the update rows as NEW files and the manifest flips;
    * every untouched file stays live byte-identical and every prior
    * version still time-travels. At 100 TB the cost is
    * O(files-hit + updates), never O(table): the match probe is one key
    * semi-join against the snapshot tagged with `input_file_name()`,
    * collecting only FILE NAMES (metadata-scale — bounded by the live
    * file count, not rows).
    *
    * Duplicate keys in `updates` fail loudly (Delta's "multiple source
    * rows matched" contract). Duplicate keys in the TABLE are all
    * replaced by the single update row (keyed-upsert semantics,
    * matching [[MergeOps]]). `updates` must be deterministic — it is
    * re-evaluated for planning and the write (the repo-wide contract).
    * Survivor rows keep their partition (`dateCol` is part of the row),
    * so a hit partition either receives replacement files or
    * legitimately empties. Returns the committed version. */
  def merge(spark: SparkSession, tableRoot: String, updates: DataFrame,
            keyCols: Seq[String],
            dateCol: String = "start_date_oslo"): Long =
    TableLog.withLock(spark, tableRoot, "merge") {
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.merge: $tableRoot has no manifest — " +
        "init first")
      val prev = manifest(spark, tableRoot, v)
      val cur = read(spark, tableRoot, Some(v))
      require(updates.columns.toSet == cur.columns.toSet,
        s"LogTable.merge: updates columns ${updates.columns.sorted.mkString(",")} " +
          s"!= table columns ${cur.columns.sorted.mkString(",")}")
      val dup = updates.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1L)
        .limit(1).collect()
      require(dup.isEmpty, "LogTable.merge: updates contain duplicate " +
        s"keys (e.g. ${dup.headOption.mkString}) — multiple source rows " +
        "would match the same target row")
      val keyFrame = updates.select(keyCols.map(col): _*)
      // which live files hold a matched key? names only — metadata-scale
      val hitTails = cur.withColumn("__file", input_file_name())
        .join(keyFrame, keyCols, "left_semi")
        .select("__file").distinct().collect()
        .map(_.getString(0).split('/').takeRight(2).mkString("/")).toSet
      val matchedByPart: Map[String, Set[String]] =
        hitTails.groupBy(_.split('/')(0))
          .map { case (p, ts) => p -> ts.map(_.split('/')(1)) }
      val survivors =
        if (hitTails.isEmpty) None
        else Some(scanFiles(spark, tableRoot, prev,
          hitTails.toSeq.sorted.map(t => s"$tableRoot/$t"))
          .join(keyFrame, keyCols, "left_anti"))
      val newData = survivors match {
        case Some(sv) => sv.unionByName(updates)
        case None => updates
      }
      val touched = touchedParts(newData, dateCol)
      val pre = listParts(spark, tableRoot, touched)
      newData.write.mode(SaveMode.Append).partitionBy(dateCol)
        .parquet(tableRoot)
      val post = listParts(spark, tableRoot, touched)
      val newFiles = touched.map { p =>
        val before = pre(p).map(_.file).toSet
        p -> post(p).filterNot(f => before(f.file))
      }.toMap
      val statted = withStats(spark, tableRoot, prev.statsCols, newFiles)
      val pruned = prev.parts.map { case (p, fl) =>
        p -> fl.filterNot(f => matchedByPart.getOrElse(p, Set.empty)(f.file))
      }
      val merged = statted.foldLeft(pruned) { case (acc, (p, fl)) =>
        acc + (p -> (acc.getOrElse(p, Seq.empty) ++ fl))
      }
      writeManifest(spark, tableRoot, "merge", prev.statsCols,
        prev.schemaDdl, merged.filter(_._2.nonEmpty))
    }

  /** Change-data-feed between two retained versions, computed from the
    * manifests' FILE DIFF: only files added or removed between `fromV`
    * and `toV` are ever scanned — O(delta), never O(table), and at
    * 100 TB the files both versions share are not even listed. The feed
    * is the exact net MULTISET difference of full row content: a row
    * occurring n times in added files and m times in removed files
    * yields `insert` (n−m > 0) or `delete` (m−n > 0) with multiplicity
    * `n_rows`; rows merely REWRITTEN in place (compaction, a survivor
    * re-appended by [[merge]]) cancel to nothing — OPTIMIZE produces an
    * EMPTY feed, as a change feed must. Output: the table's columns +
    * `_change_type` ('insert' | 'delete') + `n_rows`. */
  def changes(spark: SparkSession, tableRoot: String,
              fromV: Long, toV: Long): DataFrame = {
    require(fromV >= 1L && toV >= fromV,
      s"LogTable.changes: need 1 <= fromV <= toV (got $fromV, $toV)")
    val a = manifest(spark, tableRoot, fromV)
    val b = manifest(spark, tableRoot, toV)
    def fileSet(m: Manifest): Set[String] = m.parts.toSeq.flatMap {
      case (p, fl) => fl.map(f => s"$p/${f.file}") }.toSet
    val fa = fileSet(a)
    val fb = fileSet(b)
    def scan(tails: Set[String]): Option[DataFrame] =
      if (tails.isEmpty) None
      else Some(scanFiles(spark, tableRoot, b,
        tails.toSeq.sorted.map(t => s"$tableRoot/$t")))
    val addedOpt = scan(fb -- fa)
    val removedOpt = scan(fa -- fb)
    val schemaSrc = addedOpt.orElse(removedOpt)
      .getOrElse(read(spark, tableRoot, Some(toV)).limit(0))
    val cols = schemaSrc.columns.toSeq
    def signed(dfOpt: Option[DataFrame], s: Long) =
      dfOpt.getOrElse(schemaSrc.limit(0)).withColumn("__s", lit(s))
    signed(addedOpt, 1L).unionByName(signed(removedOpt, -1L))
      .groupBy(cols.map(col): _*).agg(sum(col("__s")).as("__net"))
      .filter(col("__net") =!= 0L)
      .select(cols.map(col) ++ Seq(
        when(col("__net") > 0L, lit("insert")).otherwise(lit("delete"))
          .as("_change_type"),
        abs(col("__net")).as("n_rows")): _*)
  }

  /** RESTORE the table to retained version `toVersion` — as a NEW
    * commit whose live set, stats columns, and schema are the target
    * version's, byte-for-byte (Delta's RESTORE semantics): pure
    * metadata, ZERO data I/O, itself undoable by restoring forward
    * again, and the history between stays time-travelable until
    * [[vacuum]]. The restored head re-references the old files, so a
    * later vacuum retains them. Fails loudly when the target was
    * vacuumed away — a restore must never silently produce a torn mix.
    * Returns the committed version. */
  def restore(spark: SparkSession, tableRoot: String,
              toVersion: Long): Long =
    TableLog.withLock(spark, tableRoot, "restore") {
      val v = TableLog.currentVersion(spark, tableRoot)
      require(v > 0L, s"LogTable.restore: $tableRoot has no manifest")
      require(toVersion >= 1L && toVersion <= v,
        s"LogTable.restore: version $toVersion outside [1, $v]")
      val target = manifest(spark, tableRoot, toVersion)
      writeManifest(spark, tableRoot, s"restore:v$toVersion",
        target.statsCols, target.schemaDdl, target.parts)
    }

  /** Reclaim files no retained manifest references, keeping the newest
    * `keepLast` versions (and their time-travel reads) intact. The
    * retention contract is Delta's: `keepLast` must cover the longest
    * concurrently running reader. Returns (versions dropped, data files
    * deleted). */
  def vacuum(spark: SparkSession, tableRoot: String,
             keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    TableLog.withLock(spark, tableRoot, "vacuum") {
      val (fs, root) = TableLog.fsFor(spark, tableRoot)
      val ld = TableLog.logDir(root)
      val versions = fs.listStatus(ld).map(_.getPath.getName)
        .filter(n => n.startsWith("_v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("_v").stripSuffix(".json").toLong)
        .sorted.toSeq
      val kept = versions.takeRight(keepLast)
      val dropped = versions.dropRight(keepLast)
      val keptManifests = kept.map(manifest(spark, tableRoot, _))
      val referenced: Map[String, Set[String]] = keptManifests
        .flatMap(_.parts.toSeq)
        .groupBy(_._1)
        .map { case (p, fl) => p -> fl.flatMap(_._2.map(_.file)).toSet }
      // every partition dir any manifest (kept or dropped) ever named
      val allParts = (keptManifests.flatMap(_.parts.keys) ++
        dropped.map(manifest(spark, tableRoot, _))
          .flatMap(_.parts.keys)).distinct
      var deleted = 0
      allParts.foreach { p =>
        val dir = new org.apache.hadoop.fs.Path(root, p)
        val keep = referenced.getOrElse(p, Set.empty)
        TableLog.liveFiles(fs, dir).foreach { case (f, _) =>
          if (!keep(f)) {
            fs.delete(new org.apache.hadoop.fs.Path(dir, f), false)
            deleted += 1
          }
        }
        if (keep.isEmpty) fs.delete(dir, true) // partition fully retired
      }
      dropped.foreach(v => fs.delete(
        new org.apache.hadoop.fs.Path(ld, f"_v$v%08d.json"), false))
      (dropped.size, deleted)
    }
  }
}
