package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Layered lake storage for the vault: `{root}/{layer}/{table}` parquet
  * directories, layers mirroring the reference's schemas
  * (mallarddv/db/schema_manager.py:21 — stg, dv, bv, dm, metadata).
  *
  * The reference uses a single-file DuckDB database; the Spark re-expression
  * is a lake layout where every table is an append/overwrite parquet
  * directory usable from any number of executors. Vault tables are written
  * bucketed by a hash-key prefix column (`hk_bucket`) so that at 100 TB a
  * vault table's scan, as well as hub/link anti-joins repartitioned on the
  * same derivation, can prune and co-locate by bucket; bucket count is
  * configurable per lake — an explicit constructor arg wins, else the
  * `spark.graft.buckets` session conf, else 16 (production would size to
  * cluster).
  */
final class Lake(val spark: SparkSession, val root: String, buckets: Int = Lake.FromConf) {

  /** Bucket count in force for this lake (see class doc for resolution).
    * Validated here so a malformed conf or a 0/negative count fails at
    * lake construction with the offending key named, not later inside
    * pmod/repartition with an opaque arithmetic error. */
  val bucketCount: Int = {
    val resolved =
      if (buckets != Lake.FromConf) buckets
      else spark.conf.getOption(Lake.BucketsKey).map { v =>
        try v.trim.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"${Lake.BucketsKey} must be a positive integer, got '$v'")
        }
      }.getOrElse(Lake.DefaultBuckets)
    require(resolved > 0,
      s"Lake bucket count must be > 0, got $resolved " +
        s"(constructor arg or ${Lake.BucketsKey})")
    resolved
  }

  def tablePath(layer: String, name: String): String = s"$root/$layer/$name"

  def exists(layer: String, name: String): Boolean = {
    val p = new Path(tablePath(layer, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  private def fsOf(p: Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Generation number of a `_gen-N` directory name, None for anything else
    * (flat data files, `hk_bucket=` partition dirs, markers). */
  private def genNumber(p: Path): Option[Long] =
    if (p.getName.startsWith(Lake.GenPrefix))
      p.getName.stripPrefix(Lake.GenPrefix).toLongOption.filter(_ > 0)
    else None

  /** (generation number, directory) of the highest COMMITTED generation
    * under the table root, None when the table is flat (or absent).
    * Commit = the `_graft_committed` marker file exists inside the
    * generation dir — its CREATE is the compaction's atomic commit point
    * on every store (HDFS create, S3 PUT, local FS: the object either
    * exists or it doesn't; no rename involved). Cost: one listStatus of
    * the table ROOT (entries = bucket dirs + generation dirs, both
    * configuration-scale) plus one exists per generation dir present
    * (≤ 2 in steady state: current + the retained previous). */
  private def currentGen(fs: org.apache.hadoop.fs.FileSystem, root: Path): Option[(Long, Path)] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).iterator
      .filter(_.isDirectory)
      .flatMap(s => genNumber(s.getPath).map(_ -> s.getPath))
      .filter { case (_, p) => fs.exists(new Path(p, Lake.CommitMarker)) }
      .reduceOption((a, b) => if (a._1 >= b._1) a else b)

  /** The directory holding the table's CURRENT data: the highest committed
    * generation (`{table}/_gen-N/`) once the table has been compacted, else
    * the table directory itself — the flat layout every table is born with
    * and keeps until its first compaction. All lake reads and appends
    * resolve through this, so a compaction's generation swap is invisible
    * to callers. Generation dirs start with `_`, which Spark's file index
    * treats as hidden — a reader of the FLAT layout never sees a staged
    * generation being written next to its data. External engines reading a
    * lake table directly should read this resolved directory, not glob the
    * table root. */
  def dataPath(layer: String, name: String): String = {
    val root = new Path(tablePath(layer, name))
    currentGen(fsOf(root), root).map(_._2.toString).getOrElse(root.toString)
  }

  def read(layer: String, name: String): DataFrame =
    spark.read.parquet(dataPath(layer, name))

  /** Read, or an empty frame of `schema` when the table doesn't exist yet.
    *
    * The EXPECTED schema is imposed on the scan — the schema-evolution
    * contract: a column added to satellite metadata after earlier appends
    * is absent from the old part files, and the parquet reader
    * null-backfills it per file, so an evolved satellite reads with the
    * new column as NULL history instead of silently dropping it (the
    * pre-r12 column-intersection behavior). This is also cheaper than
    * `mergeSchema` (no footer-merge job over every part file — at 100 TB
    * that job is a full listing + footer read), and it keeps the column
    * set stable: on-disk extras like the `hk_bucket` partition column are
    * simply not part of the imposed schema. Columns REMOVED from metadata
    * while still on disk are likewise dropped here; history stays in the
    * files. */
  def readOr(layer: String, name: String, schema: StructType): DataFrame =
    if (exists(layer, name))
      // The select drops DISCOVERED partition columns (hk_bucket): a
      // user-specified schema governs data columns, but partition
      // discovery still appends directory-derived ones.
      spark.read.schema(schema).parquet(dataPath(layer, name))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** [[readOr]] for INCREMENTAL-LOAD probes: the existing-table side of a
    * hub/link anti-join or a satellite DELTA probe only matters where its
    * key also appears in the staged batch, and a key's bucket is a pure
    * function of the key — so the probe scan can be pruned to the staged
    * batch's `hk_bucket` partitions with identical load results. That is
    * the payoff the bucketed layout exists for: per-micro-batch probe cost
    * follows the BATCH's bucket span, not the vault's size — at 100 TB the
    * difference between an incremental load and a full-vault scan per
    * batch.
    *
    * Size-gated like the skew guard (`spark.graft.probePrune.minBytes` on
    * real leaf bytes): under the gate the full scan is cheaper than the
    * extra driver action that computes the staged bucket set, so
    * bench/test-scale plans are bit-identical to [[readOr]]; above it the
    * bucket set is one tiny distinct-collect over the staged keys
    * (bounded by bucketCount values). A batch spanning every bucket falls
    * back to the unpruned scan. NOT for delete detection
    * (DvOps.satDeleteRows): there the ABSENT keys are the signal, and
    * pruning would mass-delete the unscanned buckets. */
  def readOrProbe(
      layer: String, name: String, schema: StructType,
      staged: DataFrame, stagedKey: org.apache.spark.sql.Column): DataFrame =
    readOrProbeWithSpan(layer, name, schema, staged, stagedKey)._1

  /** True when [[readOrProbeWithSpan]] would engage the bucket-pruned probe
    * for this table (exists + above the size gate). Callers use it to
    * decide whether materializing a shared input pays: above the gate the
    * span distinct-collect is a SECOND action over the staged batch (the
    * streaming sinks cache their per-batch hash view for it); below it the
    * append is the only action and a cache is pure overhead (measured
    * +0.2–0.4 s per micro-batch on the KB-scale driver bench rows). */
  def probeWouldEngage(layer: String, name: String, schema: StructType): Boolean =
    exists(layer, name) &&
      Tables.estBytesKnown(readOr(layer, name, schema))
        .exists(_ >= Confs.probePruneMinBytes(spark.conf))

  /** [[readOrProbe]] also returning the staged batch's bucket span when the
    * prune engaged (None otherwise: table absent, under the size gate, or a
    * batch spanning every bucket). The span is ONE tiny distinct-collect
    * over the staged keys (≤ bucketCount values), and returning it lets the
    * flow executor pay that job once per load and reuse it for the counted
    * append's listing diff ([[appendIncrementBucketed]]) — the probe scan
    * and the listing are bounded by the SAME set by construction. */
  def readOrProbeWithSpan(
      layer: String, name: String, schema: StructType,
      staged: DataFrame, stagedKey: org.apache.spark.sql.Column): (DataFrame, Option[Array[Long]]) = {
    val full = readOr(layer, name, schema)
    if (!exists(layer, name)) return (full, None)
    val known = Tables.estBytesKnown(full)
    val engaged = known.exists(_ >= Confs.probePruneMinBytes(spark.conf))
    Tables.gateTrace(spark.conf, s"readOrProbe($layer.$name)", engaged, known)
    if (!engaged) (full, None)
    else {
      val buckets = staged.select(bucketOf(stagedKey).as("__b")).distinct()
        .collect().map(_.getLong(0))
      if (buckets.length >= bucketCount) (full, None)
      else {
        val pruned = spark.read.schema(schema).parquet(dataPath(layer, name))
          // predicate on the DISCOVERED partition column, applied before
          // the imposed-schema select drops it — evaluated driver-side by
          // the file index, so only the staged buckets' files are read
          // (ProbePruneSpec pins inputFiles shrink + result equality)
          .filter(col("hk_bucket").cast("long").isin(buckets.map(java.lang.Long.valueOf): _*))
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        (pruned, Some(buckets))
      }
    }
  }

  /** Lazy recursive iterator of the parquet leaf FileStatuses under `p` —
    * THE tree walk every lake metadata operation shares (counted-append
    * diff, empty-first-append probe, compact's count + per-bucket bytes).
    * ONE listStatus per directory, reusing its FileStatus entries for the
    * isDirectory/size checks: a per-entry getFileStatus re-fetch is one
    * extra filesystem RPC per file, a real metadata cost on remote stores.
    * Callers guard `p`'s existence — inner directories came from a parent
    * listStatus, so re-checking them would pay one extra RPC per
    * directory. Laziness lets any-parquet probes short-circuit at the
    * first leaf. */
  private def parquetLeaves(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Iterator[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(p).iterator.flatMap { s =>
      if (s.isDirectory) parquetLeaves(fs, s.getPath)
      else if (s.getPath.getName.endsWith(".parquet")) Iterator.single(s)
      else Iterator.empty
    }

  /** Spark shares a JVM-wide file-listing cache across path reads and
    * catalog tables; any write must invalidate it or later readers can chase
    * deleted part files (FAILED_READ_FILE.FILE_NOT_EXIST). */
  private def refresh(layer: String, name: String): Unit = {
    spark.catalog.refreshByPath(tablePath(layer, name))
    // A catalog table registered over this path (Graft.initVault) caches its
    // own relation keyed by name; refreshByPath alone can miss it.
    scala.util.Try {
      if (spark.catalog.tableExists(s"$layer.$name"))
        spark.catalog.refreshTable(s"$layer.$name")
    }
    ()
  }

  def overwrite(df: DataFrame, layer: String, name: String): Unit = {
    df.write.mode("overwrite").parquet(tablePath(layer, name))
    refresh(layer, name)
  }

  def append(df: DataFrame, layer: String, name: String): Unit = {
    df.write.mode("append").parquet(tablePath(layer, name))
    refresh(layer, name)
  }

  /** Deterministic bucket of a key value — the same derivation
    * [[appendBucketed]] writes with, usable for read-side pruning. */
  def bucketOf(keyCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(keyCol), lit(bucketCount))

  /** Driver-side bucket of a literal key — same XxHash64 codepath Spark
    * executes, evaluated without launching a job. */
  def bucketOfValue(value: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(value))),
      42L // the xxhash64() SQL function's fixed seed — must match bucketOf
    ).eval(null).asInstanceOf[Long]
    Math.floorMod(h, bucketCount.toLong)
  }

  /** Append an increment computed AGAINST a table to that same table and
    * return rows appended. ONE execution of the increment plan (the same
    * single-pass write as [[appendIncrementBucketedUncounted]]); the count
    * comes from the parquet FOOTERS of the files the write produced
    * (listing diff around the write — part file names are unique, and the
    * lake's single-writer-per-table contract means nothing else appends
    * concurrently). Footer reads are driver-side metadata (no job, no
    * scan): this replaced a cache()+count()+write shape whose cache
    * materialized the ENTIRE increment in executor storage just to count
    * it — a bench-visible extra action per flow load and, at production
    * batch sizes, a memory/disk copy of the whole batch. The footer count
    * is also strictly more truthful: it counts what was WRITTEN.
    *
    * `listingSpan` bounds the listing diff to those `hk_bucket=` subtrees
    * (the [[readOrProbeWithSpan]] value the flow executor already computed for the
    * probe scan): without it each counted append walks EVERY file in the
    * table twice — O(vault-files) driver metadata per batch, the same cost
    * class the bucket-pruned probe eliminated for scans. With it the walk
    * is bounded by the BATCH's bucket span. CONTRACT: the span must cover
    * every bucket of `rows`' `keyCol` values — true for hub/link/sat-delta
    * increments (their keys ⊆ the staged batch's keys the span came from);
    * NOT for delete detection, whose tombstone keys come from the vault
    * side — pass None there (FlowExecutor.appendCounted). A file written
    * outside the span would be missed by the diff and silently undercounted,
    * so the span is the caller's proof obligation, pinned by ScratchSpec. */
  def appendIncrementBucketed(
      rows: DataFrame, layer: String, name: String, keyCol: String,
      listingSpan: Option[Array[Long]] = None): Long = {
    // the CURRENT data dir: post-compaction appends land (and are counted)
    // inside the committed generation, not the table root
    val path = new Path(dataPath(layer, name))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The exists() guard runs ONLY at each root (a span bucket dir may not
    // exist yet); see parquetLeaves for the inner-directory RPC economics.
    def files(root: Path): Iterator[Path] =
      if (fs.exists(root)) parquetLeaves(fs, root).map(_.getPath) else Iterator.empty
    val roots: Seq[Path] = listingSpan match {
      case Some(buckets) => buckets.toIndexedSeq.map(b => new Path(path, s"hk_bucket=$b"))
      case None          => Seq(path)
    }
    val before = roots.iterator.flatMap(files).toSet
    appendIncrementBucketedUncounted(rows, layer, name, keyCol)
    (roots.iterator.flatMap(files).toSet -- before).iterator.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(f, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** [[appendIncrementBucketed]] for callers that don't need the row count
    * (the streaming DV sinks): ONE pass — the increment plan feeds the
    * bucketed write directly, no cache+count+recompute. The extra action
    * was a measurable slice of each micro-batch's addBatch at replay scale
    * (r15 profile; BASELINE.md multi-batch floor paragraph).
    *
    * Read-own-target safety (the increment plan typically SCANS this same
    * table — the satellite delta probes existing history) rests on the
    * LISTING-SNAPSHOT invariant, pinned by ScratchSpec "self-reading
    * uncounted append": the scan's file set is frozen in the
    * InMemoryFileIndex built when [[readOr]] resolved the relation —
    * driver-side, strictly BEFORE this write job starts — and the write
    * publishes new part files only at job commit (tasks write under
    * `_temporary`, never visible to a listing snapshot taken earlier). So
    * the scan reads exactly the pre-append files: no new-file double-read,
    * no deleted-file FILE_NOT_EXIST. The one hazard is an increment built
    * from a STALE DataFrame (resolved before an intervening append by a
    * concurrent writer) — out of scope: the lake's single-writer-per-table
    * contract (flow executor / one streaming query per sink table).
    *
    * An empty increment appended to an EXISTING table writes no part files
    * (per-partition writers skip empty tasks) and is harmless; on the
    * FIRST append an empty write leaves a part-file-less parquet dir that
    * breaks later reads — detected by a post-write listing and deleted, so
    * readOr keeps seeing "table absent". (A write-action `observe()` was
    * tried first: V1 write commands don't surface CollectMetrics,
    * `Observation.get` returns an empty map.) */
  def appendIncrementBucketedUncounted(rows: DataFrame, layer: String, name: String, keyCol: String): Unit = {
    val existed = exists(layer, name)
    appendBucketed(rows, layer, name, keyCol)
    if (!existed) {
      val path = new Path(tablePath(layer, name))
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // laziness: hasNext stops at the first parquet leaf
      if (fs.exists(path) && !parquetLeaves(fs, path).hasNext) {
        fs.delete(path, true)
        refresh(layer, name)
      }
    }
  }

  /** Append a vault increment partitioned by hash-key-prefix bucket. The
    * bucket is a deterministic function of the key, so co-located reads and
    * bucket pruning survive any number of appends.
    *
    * The write is repartitioned BY BUCKET first: `partitionBy` alone makes
    * every upstream task open a file per bucket it happens to hold, so the
    * file count scales with exchange width × buckets (measured 4×: AQE-wide
    * upstream plans turned each micro-batch append into thousands of
    * KB-sized files). One exchange keyed on the bucket column writes
    * exactly one file per non-empty bucket per append — the bucketed-table
    * invariant compaction relies on; at production scale the bucket count,
    * not the cluster width, is the correct append parallelism. */
  def appendBucketed(df: DataFrame, layer: String, name: String, keyCol: String): Unit = {
    val bucketed = df.withColumn("hk_bucket", bucketOf(col(keyCol)))
    bucketed
      .repartition(bucketCount, col("hk_bucket"))
      // resolved dir, not the table root: post-compaction appends belong to
      // the committed generation (the root's flat files are superseded data
      // retained only for in-flight readers)
      .write.mode("append").partitionBy("hk_bucket").parquet(dataPath(layer, name))
    refresh(layer, name)
  }

  /** Compact a bucketed table: every append adds a part file per bucket per
    * task, and a long-lived vault accumulates small files (the classic
    * 100 TB lake operations problem). Rewrites each bucket into
    * ~`spark.graft.compact.targetBytes`-sized files (one file while the
    * bucket fits under the target) as a NEW GENERATION directory
    * (`{table}/_gen-N/`), committed by creating one small marker file —
    * readers never observe a half-compacted (mixed old/new) table, and
    * never a missing one. Returns (files before, files after).
    *
    * COMMIT POSTURE (generation layout, r18 — replaced the two-rename
    * swap): the staged generation is written next to the live data
    * (underscore-prefixed, so Spark's file index hides it from flat-layout
    * readers), and the commit is the CREATE of `_gen-N/_graft_committed` —
    * a single small-object write, atomically visible on every store: HDFS
    * create, S3-class PUT (no rename anywhere — S3 rename is copy+delete
    * and was the old swap's silent failure mode), local FS. Readers
    * resolve [[dataPath]] = highest committed generation; a reader
    * resolving at any moment during compaction sees the OLD generation
    * (before the marker lands) or the NEW one (after), never an absent or
    * mixed table. A crashed compaction leaves an uncommitted `_gen-N`
    * that resolution ignores and the next compact deletes.
    *
    * RETENTION: the superseded data (previous generation, or the root's
    * flat files on first compaction) is kept until the NEXT compaction
    * ([[expireSuperseded]] runs at compact start) — so a reader that
    * resolved its file listing just before the commit can finish its scan;
    * the no-concurrent-reader window of the old swap is gone on every
    * store. Steady-state cost: ≤ 2× table storage between compactions;
    * call [[expireSuperseded]] explicitly once in-flight readers are
    * known drained to reclaim earlier. Catalog tables registered over the
    * FLAT path (Graft registers staging tables this way) must be
    * re-registered after a first compaction — engine paths never compact
    * staging tables.
    *
    * `sortBy`: optional within-chunk sort columns for the rewrite. Vault
    * satellites pass (hk, load_dts): as-of queries filter `load_dts` over
    * the full history, and parquet row-group stats only prune when rows
    * are clustered on the filtered column within each file — unsorted
    * compaction output interleaves load_dts ranges across row groups and
    * defeats min/max pruning. Sorting inside each (bucket, chunk) write
    * task costs one spillable sort per task and changes no result.
    *
    * The size cap matters at production bucket sizes: one-file-per-bucket
    * makes compaction a single-task multi-GB write per bucket (wall time =
    * largest bucket, straggler re-run = re-writing it whole). Oversized
    * buckets split on a deterministic row-hash chunk column —
    * `ceil(bucketBytes / target)` chunks per bucket, sized driver-side
    * from the SAME listing the file count walks — and the staged write
    * exchanges once on (bucket, chunk), so write parallelism follows data
    * volume, not bucket count. Hash placement can co-locate two chunk
    * cells in one task (the cells-per-partition birthday term; the write
    * then emits one ~2×-target file) — the cap is a parallelism/restart
    * bound, not an exact packing, and the one-exchange append invariant
    * ([[appendBucketed]]) is untouched. */
  def compact(layer: String, name: String, sortBy: Seq[String] = Nil): (Long, Long) = {
    val root = new Path(tablePath(layer, name))
    val fs = fsOf(root)
    // Reclaim data superseded by the CURRENT generation (kept one cycle for
    // in-flight readers) and any uncommitted staged generation a crashed
    // compaction left — also what keeps the flat-layout walk below from
    // counting a leftover `_gen` dir's leaves.
    expireSuperseded(layer, name)
    val cur = currentGen(fs, root)
    val curDir = cur.map(_._2).getOrElse(root)
    val nextN = cur.map(_._1 + 1L).getOrElse(1L)
    // ONE pre-rewrite walk serves both the before-count and the per-bucket
    // byte sizing below (a leaf's bucket is its parent dir's partition
    // value) — a second full walk doubled the driver metadata RPCs per
    // compaction on remote stores.
    val leaves = parquetLeaves(fs, curDir).toArray
    val before = leaves.length.toLong
    // mergeSchema: compaction REWRITES the table, so it must read the UNION
    // of every file's schema. Plain inference picks one footer; on a
    // schema-evolved satellite (older appends missing a newer column) an
    // old-footer pick would silently DROP the evolved column from the
    // rewrite — on-disk data loss, not just a narrowed read. The
    // footer-merge job is proportional to file count, which a compaction
    // pays anyway; readOr's imposed-metadata-schema contract covers normal
    // reads, but compact cannot assume a caller-supplied schema.
    val df = spark.read.option("mergeSchema", "true").parquet(curDir.toString)
    // Applied AFTER the (bucket, chunk) exchange, inside each write task.
    // The sort MUST lead with the partition column: the V1 partitionBy
    // write requires its output ordered by partition columns and inserts
    // its OWN (non-stable) sort when the child's ordering doesn't already
    // satisfy that — which would silently scramble the sortBy order the
    // caller asked for (measured: identical decoded-rows before/after on
    // the first cut of the r18 as-of bench). Leading with hk_bucket makes
    // the child ordering a superset of the writer's requirement, so no
    // extra sort is inserted and the within-file order survives.
    def sorted(d: DataFrame): DataFrame =
      if (sortBy.isEmpty) d
      else {
        val keys = if (d.columns.contains("hk_bucket")) "hk_bucket" +: sortBy else sortBy
        d.sortWithinPartitions(keys.map(col): _*)
      }
    val staged = new Path(root, s"${Lake.GenPrefix}$nextN")
    fs.delete(staged, true)
    if (df.columns.contains("hk_bucket")) {
      val target = Confs.compactTargetBytes(spark.conf)
      // per-bucket compressed bytes from the SAME leaves the file count
      // walked (a leaf's bucket = its parent dir's hk_bucket= value); an
      // empty bucket dir is simply absent and falls to the coalesce(…, 1)
      // default below.
      val chunksOf: Map[Long, Int] = leaves.iterator
        .flatMap { s =>
          val dir = s.getPath.getParent.getName
          if (dir.startsWith("hk_bucket="))
            dir.stripPrefix("hk_bucket=").toLongOption.map(_ -> s.getLen)
          else None
        }
        .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
        .map { case (b, bytes) =>
          b -> math.max(1L, (bytes + target - 1) / target).min(1L << 16).toInt
        }
      val totalChunks = chunksOf.values.map(_.toLong).sum
        .max(1L).min(1L << 20).toInt
      val dataCols = df.columns.filterNot(_ == "hk_bucket").toIndexedSeq
      // chunk = row-hash mod the bucket's OWN chunk count (a tiny literal
      // map — bucket counts are configuration-scale, not data-scale), so
      // single-chunk buckets keep one file and only oversized ones split.
      // coalesce: a bucket value absent from the driver listing (directory
      // race, unexpected partition value) would make element_at NULL and
      // silently collapse that bucket to a single repartition cell —
      // deterministically give an unmapped bucket one chunk instead.
      val chunk = pmod(
        xxhash64(dataCols.map(col): _*),
        coalesce(
          element_at(typedLit(chunksOf), col("hk_bucket").cast("long")),
          lit(1)))
      sorted(
        df.withColumn("__chunk", chunk)
          .repartition(totalChunks, col("hk_bucket"), col("__chunk")))
        .drop("__chunk")
        .write.partitionBy("hk_bucket").parquet(staged.toString)
    }
    // inputFiles length instead of df.rdd.getNumPartitions (the latter
    // materializes the physical RDD driver-side); compaction targets ~8
    // input files per output file.
    else sorted(df.coalesce(math.max(1, df.inputFiles.length / 8)))
      .write.parquet(staged.toString)
    // THE COMMIT: one small-file create (atomic visibility on every store —
    // no renames). Before it, readers resolve the old generation; after it,
    // the new one. A crash before this line leaves an uncommitted staged
    // dir that resolution ignores.
    fs.create(new Path(staged, Lake.CommitMarker), /* overwrite = */ false).close()
    refresh(layer, name)
    (before, parquetLeaves(fs, staged).size.toLong)
  }

  /** Delete data superseded by the table's current committed generation:
    * committed generations BELOW the current one, uncommitted staged
    * generations (crashed compactions), and — once any generation is
    * committed — the legacy flat data files in the table root. Runs
    * automatically at the start of every [[compact]] (so superseded data
    * survives exactly one compaction cycle for in-flight readers — see the
    * retention note there); call directly to reclaim the ≤ 2× storage
    * earlier once concurrent readers are known drained. Returns the number
    * of root entries deleted. No-op on a flat table with no generation
    * leftovers. */
  def expireSuperseded(layer: String, name: String): Long = {
    val root = new Path(tablePath(layer, name))
    val fs = fsOf(root)
    if (!fs.exists(root)) return 0L
    val cur = currentGen(fs, root)
    val doomed = fs.listStatus(root).iterator.filter { s =>
      genNumber(s.getPath) match {
        // a generation dir: superseded or uncommitted unless it IS current
        case Some(n) => !cur.exists(_._1 == n)
        // non-generation root entry (flat part files, hk_bucket= dirs,
        // _SUCCESS): legacy data once any generation is committed
        case None => cur.isDefined
      }
    }.map(_.getPath).toArray
    doomed.foreach(fs.delete(_, true))
    if (doomed.nonEmpty) refresh(layer, name)
    doomed.length.toLong
  }

  /** Point lookup on a bucketed vault table: recomputes the key's bucket and
    * filters on the partition column FIRST, so the scan touches 1/buckets of
    * the table's files (PartitionFilters in the plan) — the read-side payoff
    * of bucketed appends at 100 TB.
    *
    * Schema-evolution caveat: like any plain parquet read, the schema is
    * INFERRED from one footer, so a column added after earlier appends may
    * be absent from the result depending on which file wins inference. For
    * evolved satellites use [[readOr]] with the metadata schema (its
    * imposed-schema contract null-backfills old files) and filter on
    * [[bucketOf]] — this helper stays inference-based because a per-lookup
    * footer-merge would cost a full listing per point read. */
  def lookupBucketed(layer: String, name: String, keyCol: String, value: String): DataFrame = {
    val df = read(layer, name)
    // bucketOfValue hashes a STRING; a table bucketed on a non-string key
    // column (xxhash64 of the native type) would prune to the WRONG bucket
    // and silently return nothing — fail loudly instead. The vault's hk
    // columns are always hex strings, so engine paths never hit this.
    // Resolve the column through the DataFrame (not StructType.apply) so
    // the session's case-sensitivity rules apply, same as the filter below.
    val kt = df.select(df(keyCol)).schema.head.dataType
    require(kt == org.apache.spark.sql.types.StringType,
      s"lookupBucketed: $keyCol is $kt, but the bucket is recomputed from a STRING value — " +
        "a non-string bucket derivation would prune to the wrong bucket and return an " +
        "empty result; read with readOr + filter instead")
    df.filter(col("hk_bucket") === bucketOfValue(value) && col(keyCol) === value)
      .drop("hk_bucket")
  }
}

object Lake {
  /** Session-conf key for the default bucket count of lakes constructed
    * without an explicit `buckets` arg (SURVEY §4). */
  val BucketsKey = "spark.graft.buckets"
  val DefaultBuckets = 16
  /** Sentinel default for the constructor arg: "resolve from conf". */
  val FromConf: Int = -1
  /** Generation-directory name prefix (`{table}/_gen-N/`). Underscore:
    * Spark's file index treats `_`/`.`-prefixed paths as hidden, so a
    * staged generation is invisible to readers of the flat layout. */
  val GenPrefix = "_gen-"
  /** Marker file whose CREATE inside a generation dir is compaction's
    * atomic commit point ([[Lake.compact]] commit posture). */
  val CommitMarker = "_graft_committed"
}
