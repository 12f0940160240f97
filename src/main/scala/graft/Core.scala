package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the query catalog.
  *
  * Numeric discipline (SURVEY.md §7.4): every float aggregation that is
  * hash-compared against the DuckDB oracle is summed as `decimal(18,4)`
  * (exact, order-independent) and only then cast back to double and
  * rounded — summation order across Spark partitions is nondeterministic,
  * so summing raw doubles would not be reproducible, let alone match
  * another engine.
  */
object Core {
  /** A catalog entry: the Spark implementation plus (optionally) the
    * equivalent ANSI SQL for the DuckDB oracle. Column names and row
    * order MUST match between the two (driver hash-compares). */
  final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  val Money: DecimalType = DecimalType(18, 4)

  /** Loads a driver table, normalizing EVERY temporal column to a
    * session-TZ TIMESTAMP regardless of the file's physical encoding —
    * the driver's testdata regenerations have already flipped encodings
    * twice (events.ts: INT64 TIMESTAMP(NANOS) → timestamp[us] NTZ,
    * silently breaking three queries in round 5; orders.o_orderdate
    * ships NTZ today). The invariant downstream code relies on:
    * whatever the file says, `unix_micros`, watermarks, `window()` and
    * interval frames always see LTZ.
    *   - INT64 TIMESTAMP(NANOS) (`events.ts` historically): Spark's
    *     vectorized reader rejects it; read as raw nanos and truncate
    *     to micros (identical to DuckDB's own ns→us handling, so
    *     oracle parity holds);
    *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ in
    *     Spark 4: cast to TimestampType. Session TZ is pinned UTC in
    *     every harness and DuckDB's TIMESTAMP is naive, so the cast is
    *     a relabel, not a wall-clock shift — oracle parity holds;
    *   - timestamp[us] UTC-adjusted → already TimestampType, untouched.
    * SchemaDriftSpec pins all encodings per consuming query family. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(raw)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** Exact order-independent sum of a money-like double column. */
  def moneySum(c: Column): Column = round(sum(c.cast(Money)).cast("double"), 2)
  def moneyAvg(c: Column, n: Column): Column =
    round(sum(c.cast(Money)).cast("double") / n, 4)

  /** DuckDB-side fragments mirroring moneySum/moneyAvg. */
  def oSum(e: String): String =
    s"round(cast(sum(cast(($e) as decimal(18,4))) as double),2)"
  def oAvg(e: String, n: String): String =
    s"round(cast(sum(cast(($e) as decimal(18,4))) as double)/($n),4)"

  /** Spread a small-file scan across the session's parallelism before a
    * compute-heavy projection. At real scale a table is many splits and
    * this is a no-op decision; at test scale a single parquet file is
    * ONE partition, which would serialize an expensive stage onto one
    * core. */
  def fanOut(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Engine-exact 4-dp rounding for ratios of integers: `round()` differs
    * between engines exactly when the double sits on a representable
    * .xxxx5 tie (common for small-integer ratios like 3/32). floor of
    * x*1e4+0.5 is the same IEEE op sequence in both engines. */
  def rnd4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0
  def oRnd4(e: String): String = s"(floor(($e) * 10000 + 0.5) / 10000.0)"

  /** Collision-free per-JVM path for a derived store, WITH stale
    * reclaim: the SOURCE path sanitized in full (a 32-bit hashCode
    * could alias two distinct dirs) plus the PID, so two harness JVMs
    * running against the same sfDir (bench + probe) never write/read
    * the same store directory concurrently. The PID suffix's side
    * effect — every new JVM builds a fresh corpus-sized store — would
    * leak tmpdir space run after run, so before returning the path
    * this deletes same-(prefix, corpus) stores left by pids that are
    * no longer alive: each corpus keeps at most one store per LIVE
    * JVM. A live pid's store is never touched (the pid is parsed from
    * the name and checked against the process table; unparseable
    * names are skipped, never deleted). */
  private lazy val pidMax: Long =
    scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/sys/kernel/pid_max")).trim.toLong)
      .getOrElse(4194304L)

  def jvmStorePath(prefix: String, dir: String, suffix: String = ""): String = {
    val tmp = sys.props("java.io.tmpdir")
    val base = dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val stem = s"${prefix}_${base}_p"
    val myPid = ProcessHandle.current().pid()
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(stem))
      .filter { f =>
        "_p(\\d+)".r.findAllMatchIn(f.getName).toSeq.lastOption
          .flatMap(m => scala.util.Try {
            val pid = m.group(1).toLong
            // out-of-range pids are SKIPPED, not deleted: on Linux
            // ProcessHandle.of(hugePid) returns empty (not-alive) even
            // though no such process can exist — a foreign tmpdir
            // entry must never be reclaimed on that basis
            if (pid >= pidMax) false // pid_max is EXCLUSIVE (proc(5))
            else {
              val oh = ProcessHandle.of(pid)
              pid != myPid && !(oh.isPresent && oh.get().isAlive)
            }
          }.toOption)
          .contains(true)
      }
      .foreach(graft.ops.IndexStore.deleteRec)
    s"$tmp/$stem$myPid$suffix"
  }

  private val rowCounts =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Once-per-JVM row count of a driver table — the 1-row metadata job
    * the SIZE GATES key on (sorted-neighborhood channel, q100 rank
    * fractions, q105 MAD): below the bound the window spelling is
    * strictly cheaper, above it the range-partitioned machinery takes
    * over. A parquet count is footer metadata (no row scan), and the
    * testdata is immutable within a JVM's lifetime, so (dir, name)
    * keying without a session is safe. */
  def tableRows(s: SparkSession, dir: String, name: String): Long =
    rowCounts.synchronized {
      rowCounts.getOrElseUpdate((dir, name), table(s, dir, name).count())
    }

  private val memos =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Build-once cached DataFrame shared across catalog queries within a
    * session (e.g. the LSH band keys five dedup queries reuse, or the
    * normalized embeddings three ANN queries reuse). One `.cache()` per
    * key per session — no "already cached" re-cache churn — and every
    * registration is released together via [[clearCaches]]. */
  def memo(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    // drop entries of stopped sessions so a long-lived JVM (sbt test,
    // repeated runMains) doesn't pin dead sessions and their plans
    memos.keys.filter(_._1.sparkContext.isStopped).foreach(memos.remove)
    // fast path lock-free; the build itself runs under a lock because
    // TrieMap.getOrElseUpdate is atomic only for insertion, not for
    // evaluating the by-name argument — two threads could otherwise
    // both run build.cache(). The lock is cheap: `build` constructs a
    // plan and marks it cacheable, it does not materialize anything.
    memos.get((s, key)).getOrElse(memos.synchronized {
      memos.getOrElseUpdate((s, key), build.cache())
    })
  }

  /** Time one warm-phase memo build — Bench folds these into its
    * emitted total and per-frame `warm_breakdown`. */
  def timedBuild(name: String)(body: => Unit): (String, Double) = {
    val t0 = System.nanoTime()
    body
    name -> (System.nanoTime() - t0) / 1e9
  }

  /** Unpersist and forget every memoized DataFrame of this session —
    * called by the Verify/Bench harnesses when the catalog run ends so a
    * long session doesn't accumulate executor storage. */
  def clearCaches(s: SparkSession): Unit =
    memos.keys.filter(_._1 eq s).foreach { k =>
      memos.remove(k).foreach(_.unpersist(blocking = false))
    }
}
