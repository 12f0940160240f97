package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Core._

/** Scalar-function catalog (SURVEY.md §2B "scalar fns"): string,
  * date/time, math, array higher-order, JSON extraction, plus batch
  * event-time bucketing and sessionization over the `events` table.
  *
  * All of these stay inside whole-stage codegen (built-in expressions
  * only — no UDFs on the hot path), so at 100 TB they cost exactly one
  * columnar scan plus fused projection; the only shuffles are the
  * explicit groupBy in the bucketing/sessionization queries.
  */
object Functions {

  /** Exact per-group medians by distributed selection — the 100 TB
    * path q105's window formulation can't take (a per-group sort
    * window's parallelism is bounded by the GROUP count; 5 priority
    * groups = 5 cores no matter the cluster size).
    *
    * One `repartitionByRange(group, value)` spreads each group's sorted
    * order across MANY partitions; pass 1 counts rows per (partition,
    * group) — driver state is P×groups longs, bounded at any data
    * size; the driver turns counts into the two global target ranks
    * per group plus per-partition prefix offsets; pass 2 walks each
    * partition's sorted run and emits only the ≤2 target rows per
    * group. Two narrow passes over one range shuffle, full-cluster
    * parallel. mapPartitions (not a window) is the point: this is
    * genuine per-partition imperative logic, the documented rare case
    * for dropping below the DataFrame API. Returns the same values as
    * the rank-window formulation (same sorted-multiset positions, same
    * mean-of-two-middles arithmetic). */
  private[ops] def groupMedians(s: SparkSession, df: DataFrame,
      grp: String, v: String): Map[String, Double] = {
    import s.implicits._
    val p = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.select(col(grp).cast("string"), col(v).cast("double"))
      .as[(String, Double)]
      .repartitionByRange(p, col(grp), col(v))
      .sortWithinPartitions(col(grp), col(v))
      .cache()
    try {
      val counts: Array[(Int, Map[String, Long])] =
        sorted.rdd.mapPartitionsWithIndex { (i, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
          Iterator((i, m.toMap))
        }.collect()
      val totals = counts.flatMap(_._2).groupBy(_._1).map { case (g, kv) =>
        g -> kv.map(_._2).sum
      }
      // ranks of the two middle rows ((n+1)/2 and (n+2)/2 — equal when
      // n is odd), and, per partition, how many of each group precede it
      val targets: Map[String, Set[Long]] = totals.map { case (g, n) =>
        g -> Set((n + 1) / 2, (n + 2) / 2)
      }
      val byPart = counts.sortBy(_._1)
      val prefix: Map[Int, Map[String, Long]] = {
        val acc = scala.collection.mutable.Map.empty[String, Long]
        byPart.map { case (i, m) =>
          val snap = acc.toMap
          m.foreach { case (g, n) => acc.update(g, acc.getOrElse(g, 0L) + n) }
          i -> snap
        }.toMap
      }
      val picked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        val seen = scala.collection.mutable.Map.empty[String, Long] ++
          prefix.getOrElse(i, Map.empty)
        it.flatMap { case (g, x) =>
          val r = seen.getOrElse(g, 0L) + 1L
          seen.update(g, r)
          if (targets.getOrElse(g, Set.empty).contains(r)) Some((g, x)) else None
        }
      }.collect()
      picked.groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(_._2).sum / rows.length
      }
    } finally { sorted.unpersist(blocking = false); () }
  }

  /** Orders-rows bound for q105's window spelling — same per-task
    * sort budget as q100's RankWindowMaxRows (5 priority groups ×
    * ≤1M rows); above it the catalog flips to [[madOutliersScalable]]. */
  private[graft] val MadWindowMaxRows = 5000000L

  /** Window/anchor spelling of q105 (the DuckDB oracle's shape): two
    * 5-way median windows + the fence aggregation. The catalog runs
    * it below [[MadWindowMaxRows]]; OpsSpec pins it equal to the
    * scalable spelling. */
  private[graft] def q105WindowRef(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def medianOf(df: DataFrame, valueCol: String, grp: String): DataFrame = {
      val w = Window.partitionBy(col(grp)).orderBy(col(valueCol))
      df.select(col(grp), col(valueCol),
          row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy(col(grp))).as("cnt"))
        // `div`, not `/`: Spark's / on longs is double division
        .filter($"rn" === expr("(cnt + 1) div 2") || $"rn" === expr("(cnt + 2) div 2"))
        .groupBy(col(grp))
        .agg((sum(col(valueCol)) / count(lit(1))).as(s"med_$valueCol"))
    }
    val orders = table(s, dir, "orders")
      .select($"o_orderpriority".as("prio"), $"o_totalprice".as("price"))
    val med = medianOf(orders, "price", "prio")
    val dev = orders.join(med, Seq("prio"))
      .withColumn("adev", abs($"price" - $"med_price"))
    val mad = medianOf(dev.select($"prio", $"adev"), "adev", "prio")
    orders.join(med, Seq("prio")).join(mad, Seq("prio"))
      .groupBy($"prio")
      .agg(count(lit(1)).as("n"),
        round(min($"med_price"), 2).as("median_price"),
        round(min($"med_adev"), 2).as("mad"),
        sum(when(abs($"price" - $"med_price") > lit(3.0) * $"med_adev", 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"prio")
  }

  /** q105's report computed through [[groupMedians]] — identical
    * output (OpsSpec pins equality), scalable physical plan: the two
    * medians cost two range shuffles at full parallelism instead of
    * two 5-way sort windows, and the fence pass is one broadcast join
    * + partial agg. The probe A/Bs this against the window plan. */
  def madOutliersScalable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = table(s, dir, "orders")
      .select($"o_orderpriority".as("prio"), $"o_totalprice".as("price"))
    val med = groupMedians(s, orders, "prio", "price")
    val medDf = med.toSeq.toDF("prio", "med_price")
    val withMed = orders.join(broadcast(medDf), Seq("prio"))
    val mad = groupMedians(s,
      withMed.select($"prio", abs($"price" - $"med_price").as("adev")),
      "prio", "adev")
    val madDf = mad.toSeq.toDF("prio", "med_adev")
    withMed.join(broadcast(madDf), Seq("prio"))
      .groupBy($"prio")
      .agg(count(lit(1)).as("n"),
        round(min($"med_price"), 2).as("median_price"),
        round(min($"med_adev"), 2).as("mad"),
        sum(when(abs($"price" - $"med_price") > lit(3.0) * $"med_adev", 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"prio")
  }

  val catalog: Map[String, Q] = Map(

    // ---- string functions ----
    "q18_string_fns" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part").select(
            $"p_partkey",
            upper($"p_name").as("name_upper"),
            lower($"p_brand").as("brand_lower"),
            substring($"p_name", 1, 5).as("name_pfx"),
            lpad($"p_brand", 12, "*").as("brand_pad"),
            concat_ws("|", $"p_brand", $"p_type", trim($"p_name")).as("joined"),
            regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
            regexp_replace($"p_type", "E", "X").as("type_x"),
            element_at(split($"p_name", " "), 1).as("first_word"),
            length($"p_name").as("name_len"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
        substr(p_name,1,5) AS name_pfx, lpad(p_brand,12,'*') AS brand_pad,
        concat_ws('|', p_brand, p_type, trim(p_name)) AS joined,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        regexp_replace(p_type, 'E', 'X', 'g') AS type_x,
        split_part(p_name, ' ', 1) AS first_word,
        length(p_name) AS name_len
        FROM part ORDER BY p_partkey""")),

    // ---- date/time functions ----
    "q19_date_fns" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders").select(
            $"o_orderkey",
            year($"o_orderdate").as("yr"),
            month($"o_orderdate").as("mo"),
            dayofmonth($"o_orderdate").as("dom"),
            quarter($"o_orderdate").as("qtr"),
            (weekday($"o_orderdate") + 1).as("iso_dow"),
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
            datediff($"o_orderdate", lit("1995-01-01")).as("days_since"),
            date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus3m"),
            unix_timestamp($"o_orderdate").as("epoch_s"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        cast(extract(year from o_orderdate) as int) AS yr,
        cast(extract(month from o_orderdate) as int) AS mo,
        cast(extract(day from o_orderdate) as int) AS dom,
        cast(extract(quarter from o_orderdate) as int) AS qtr,
        cast(isodow(o_orderdate) as int) AS iso_dow,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        cast(date_diff('day', DATE '1995-01-01', o_orderdate) as int) AS days_since,
        strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        cast(epoch(o_orderdate) as bigint) AS epoch_s
        FROM orders ORDER BY o_orderkey""")),

    // ---- math functions (IEEE-deterministic per row; ln/log10 rounded
    // to absorb potential last-ulp libm differences) ----
    "q20_math_fns" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem").select(
            $"l_orderkey", $"l_linenumber",
            round($"l_extendedprice", 1).as("price_r1"),
            floor($"l_extendedprice").as("price_floor"),
            ceil($"l_extendedprice").as("price_ceil"),
            round(abs($"l_discount" - 0.05), 4).as("disc_dev"),
            round(sqrt($"l_extendedprice"), 4).as("price_sqrt"),
            round(log($"l_extendedprice"), 4).as("price_ln"),
            round(log10($"l_extendedprice"), 4).as("price_log10"),
            ($"l_orderkey" % 7).as("key_mod7"),
            ($"l_extendedprice".cast(Money) * ($"l_tax" + 1).cast("decimal(8,4)"))
              .cast("double").as("gross"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        round(l_extendedprice, 1) AS price_r1,
        cast(floor(l_extendedprice) as bigint) AS price_floor,
        cast(ceil(l_extendedprice) as bigint) AS price_ceil,
        round(abs(l_discount - 0.05), 4) AS disc_dev,
        round(sqrt(l_extendedprice), 4) AS price_sqrt,
        round(ln(l_extendedprice), 4) AS price_ln,
        round(log10(l_extendedprice), 4) AS price_log10,
        l_orderkey % 7 AS key_mod7,
        cast(cast(l_extendedprice as decimal(18,4)) * cast(l_tax + 1 as decimal(8,4)) as double) AS gross
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- array higher-order functions over embeddings (exact ops only:
    // size / index / compare-based filter / min / max — no float sums) ----
    "q21_array_fns" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "embeddings").select(
            $"vec_id",
            size($"embedding").as("dim"),
            element_at($"embedding", 1).cast("double").as("v_first"),
            element_at($"embedding", -1).cast("double").as("v_last"),
            size(filter($"embedding", x => x > 0)).as("n_pos"),
            array_max($"embedding").cast("double").as("v_max"),
            array_min($"embedding").cast("double").as("v_min"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id, cast(len(embedding) as int) AS dim,
        cast(embedding[1] as double) AS v_first,
        cast(embedding[-1] as double) AS v_last,
        cast(len(list_filter(embedding, x -> x > 0)) as int) AS n_pos,
        cast(list_max(embedding) as double) AS v_max,
        cast(list_min(embedding) as double) AS v_min
        FROM embeddings ORDER BY vec_id""")),

    // ---- JSON + map functions over events.props ----
    "q22_json_fns" -> Q(
      (s, dir) => {
        import s.implicits._
        val asMap = from_json($"props", lit("map<string,bigint>"))
        table(s, dir, "events").select(
            $"event_id",
            get_json_object($"props", "$.k").cast("bigint").as("k"),
            (get_json_object($"props", "$.k").cast("bigint") % 10).as("k_bucket"),
            from_json($"props", lit("k INT")).getField("k").cast("bigint").as("k_typed"),
            array_join(map_keys(asMap), ",").as("keys_csv"),
            element_at(map_values(asMap), 1).as("first_val"),
            to_json(struct($"event_type".as("t"))).as("tagged"),
            $"event_type")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
        cast(props->>'$.k' as bigint) AS k,
        cast(props->>'$.k' as bigint) % 10 AS k_bucket,
        cast(props->>'$.k' as bigint) AS k_typed,
        array_to_string(json_keys(props), ',') AS keys_csv,
        cast(props->>'$.k' as bigint) AS first_val,
        '{"t":"' || event_type || '"}' AS tagged,
        event_type
        FROM events ORDER BY event_id""")),

    // ---- tumbling event-time window (batch analog of the streaming
    // aggregation; same window() construct Structured Streaming uses) ----
    "q23_time_bucket_agg" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            round(sum($"value".cast("decimal(18,6)")).cast("double"), 3).as("sum_v"),
            countDistinct($"user_id").as("n_users"))
          .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"),
            $"event_type", $"n", $"sum_v", $"n_users")
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        event_type, count(*) AS n,
        round(cast(sum(cast(value as decimal(18,6))) as double), 3) AS sum_v,
        count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- time-series resample with gap fill + forward fill: project
    // hourly per-type aggregates onto a dense hour grid, zero-fill the
    // counts, carry the last observed sum forward across gaps (the
    // standard shape for feeding regular-interval models from
    // irregular event data). The grid is generated, not stored:
    // types × hours is domain-bounded, so the cross join is a
    // broadcast of a 1-row bounds agg and the ffill window sorts
    // O(hours) rows per type — all independent of event volume; the
    // only event-sized work is the partial-agged hourly rollup. ----
    "q101_resample_ffill" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = table(s, dir, "events")
        val hourly = ev
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("n"), moneySum($"value").as("sum_v"))
        val bounds = ev.agg(
          date_trunc("hour", min($"ts")).as("t0"),
          date_trunc("hour", max($"ts")).as("t1"))
        val grid = ev.select($"event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select($"event_type",
            explode(sequence($"t0", $"t1", expr("INTERVAL 1 HOUR"))).as("hour"))
        val w = Window.partitionBy($"event_type").orderBy($"hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "hour"), "left")
          .withColumn("n", coalesce($"n", lit(0L)))
          .withColumn("ffill_v", last($"sum_v", ignoreNulls = true).over(w))
          .select($"event_type", date_format($"hour", "yyyy-MM-dd HH:mm").as("hour"),
            $"n", $"ffill_v")
          .orderBy($"event_type", $"hour")
      },
      Some(s"""WITH b AS (SELECT date_trunc('hour', min(ts)) AS t0,
            date_trunc('hour', max(ts)) AS t1 FROM events),
        grid AS (SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
          FROM (SELECT DISTINCT event_type FROM events), b),
        hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
            ${oSum("value")} AS sum_v
          FROM events GROUP BY 1, 2)
        SELECT g.event_type, strftime(g.hour, '%Y-%m-%d %H:%M') AS hour,
          coalesce(h.n, 0) AS n,
          last_value(h.sum_v IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_v
        FROM grid g LEFT JOIN hourly h USING (event_type, hour)
        ORDER BY event_type, hour""")),

    // ---- statistical aggregates: exact percentiles (sort-based, so
    // cross-engine identical before rounding), variance/stddev and
    // correlation (rounded to absorb update-formula float noise) ----
    "q52_stats_agg" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            round(median($"o_totalprice"), 4).as("median_price"),
            round(percentile($"o_totalprice", lit(0.9)), 4).as("p90_price"),
            round(stddev_samp($"o_totalprice"), 4).as("stddev_price"),
            round(var_samp($"o_totalprice"), 2).as("var_price"),
            round(corr($"o_totalprice", $"o_custkey"), 6).as("corr_price_cust"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        round(median(o_totalprice), 4) AS median_price,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        round(stddev_samp(o_totalprice), 4) AS stddev_price,
        round(var_samp(o_totalprice), 2) AS var_price,
        round(corr(o_totalprice, o_custkey), 6) AS corr_price_cust
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- higher-moment statistics: skewness / excess kurtosis /
    // covariance per group. Spark's skewness and kurtosis are the
    // population moments g1 = m3/m2^1.5 and g2 = m4/m2^2 - 3 computed
    // by a single-pass mergeable update (partial + final aggregate, the
    // 100 TB shape); DuckDB's built-ins are the bias-CORRECTED sample
    // versions, so the oracle states the population formulas explicitly
    // (two-pass over the group mean) instead — same real number, and
    // the 4-dp rounding absorbs the update-formula float noise. ----
    "q95_moments" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            round(skewness($"o_totalprice"), 4).as("skew_price"),
            round(kurtosis($"o_totalprice"), 4).as("kurt_price"),
            round(covar_samp($"o_totalprice", $"o_custkey".cast("double")), 0).as("covar_sd"),
            round(covar_pop($"o_totalprice", $"o_custkey".cast("double")), 0).as("covar_pd"))
          .orderBy($"o_orderstatus")
      },
      Some("""WITH mu AS (SELECT o_orderstatus AS st, avg(o_totalprice) AS m
          FROM orders GROUP BY 1)
        SELECT o_orderstatus,
          round(avg(pow(o_totalprice - m, 3)) / pow(avg(pow(o_totalprice - m, 2)), 1.5), 4) AS skew_price,
          round(avg(pow(o_totalprice - m, 4)) / pow(avg(pow(o_totalprice - m, 2)), 2) - 3, 4) AS kurt_price,
          round(covar_samp(o_totalprice, o_custkey), 0) AS covar_sd,
          round(covar_pop(o_totalprice, o_custkey), 0) AS covar_pd
        FROM orders JOIN mu ON mu.st = orders.o_orderstatus
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- data profiling: per-column null/distinct/min/max in one pass
    // (the dbt/deequ-style quality report an ETL pipeline runs on every
    // ingest; one aggregate job regardless of column count) ----
    "q49_data_profile" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders").agg(
            count(lit(1)).as("n_rows"),
            sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("null_custkey"),
            countDistinct($"o_orderstatus").as("distinct_status"),
            countDistinct($"o_orderpriority").as("distinct_priority"),
            min($"o_orderkey").as("min_key"),
            max($"o_orderkey").as("max_key"),
            round(min($"o_totalprice"), 2).as("min_price"),
            round(max($"o_totalprice"), 2).as("max_price"),
            date_format(min($"o_orderdate"), "yyyy-MM-dd").as("min_date"),
            date_format(max($"o_orderdate"), "yyyy-MM-dd").as("max_date"))
      },
      Some("""SELECT count(*) AS n_rows,
        cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS null_custkey,
        count(DISTINCT o_orderstatus) AS distinct_status,
        count(DISTINCT o_orderpriority) AS distinct_priority,
        min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        round(min(o_totalprice), 2) AS min_price,
        round(max(o_totalprice), 2) AS max_price,
        strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
        strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
        FROM orders""")),

    // ---- sessionization: 30-minute inactivity gap, lag + running sum ----
    "q24_sessionize" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("new_session",
            when($"prev_us".isNull ||
              (unix_micros($"ts") - $"prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum($"new_session").over(run))
          .groupBy($"user_id", $"session_id")
          .agg(
            count(lit(1)).as("n_events"),
            date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("t0"),
            (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("dur_us"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id FROM x)
        SELECT user_id, session_id, count(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t0,
          max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
        FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // ---- behavioral sequence extraction: each ≥3-event session as an
    // ordered event-type string — the "user history → training
    // sequence" step of a behavioral/recommendation model pipeline,
    // bridging the events surface to the training surface. Ordering
    // inside the aggregate is pinned by sorting (ts_us, event_id,
    // type) structs, so the emitted sequence is engine-exact. Scale:
    // q24's per-user session windows + ONE groupBy(user, session)
    // whose state is the session's own events (gap-bounded); text
    // never enters — event types are enum-sized strings. ----
    "q125_session_sequences" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("new_session",
            when($"prev_us".isNull ||
              (unix_micros($"ts") - $"prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum($"new_session").over(run))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            concat_ws(" ", transform(
              array_sort(collect_list(struct(
                unix_micros($"ts").as("us"), $"event_id", $"event_type"))),
              x => x.getField("event_type"))).as("seq"))
          .filter($"n_events" >= 3)
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id FROM x)
        SELECT user_id, session_id, count(*) AS n_events,
          string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
        FROM y GROUP BY user_id, session_id HAVING count(*) >= 3
        ORDER BY user_id, session_id""")),

    // ---- retention cohorts: users bucketed by first-activity week,
    // activity counted per (cohort, week offset) — the standard
    // product-analytics triangle. Two aggregations, both partial-agg
    // friendly: per-user first timestamp (O(users) shuffle), then a
    // distinct-user count per (cohort_week, offset) over the events
    // joined back to their cohort via a broadcast-able user frame.
    // Week truncation is Monday-start in both engines. ----
    "q126_retention_cohorts" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = table(s, dir, "events")
        val cohort = ev.groupBy($"user_id")
          .agg(date_trunc("week", min($"ts")).as("cw"))
        ev.select($"user_id", date_trunc("week", $"ts").as("ew"))
          .join(cohort, Seq("user_id"))
          .select($"user_id", $"cw", (datediff($"ew", $"cw") / 7).cast("long").as("week_offset"))
          .groupBy(date_format($"cw", "yyyy-MM-dd").as("cohort_week"), $"week_offset")
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
          FROM events GROUP BY 1),
        a AS (SELECT e.user_id, c.cw,
            cast(date_diff('day', c.cw, date_trunc('week', e.ts)) // 7 as bigint) AS week_offset
          FROM events e JOIN c USING (user_id))
        SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
          count(DISTINCT user_id) AS n_users
        FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset""")),

    // ---- daily reach: new users per day + the cumulative distinct-
    // user count — the growth report every event pipeline ships.
    // count(DISTINCT) over a running window is unsupported AND
    // quadratic everywhere; the standard spelling reduces it to each
    // user's FIRST-SEEN day (one partial-agged groupBy, shuffle
    // O(users)) and a running sum over the per-day counts. The
    // cumulative window is unpartitioned but its frame is the
    // calendar-DAY domain (one row per day with activity), bounded
    // and independent of event volume — PlanSpec allowlists it with
    // that reason. ----
    "q136_daily_reach" -> Q(
      (s, dir) => {
        import s.implicits._
        val firstSeen = table(s, dir, "events")
          .groupBy($"user_id").agg(min(to_date($"ts")).as("d"))
        firstSeen.groupBy($"d").agg(count(lit(1)).as("new_users"))
          .withColumn("cumulative_reach",
            sum($"new_users").over(Window.orderBy($"d")))
          .orderBy($"d")
      },
      Some("""WITH fs AS (SELECT user_id, min(cast(ts as date)) AS d
          FROM events GROUP BY 1),
        daily AS (SELECT d, count(*) AS new_users FROM fs GROUP BY 1)
        SELECT d, new_users,
          cast(sum(new_users) OVER (ORDER BY d) as bigint) AS cumulative_reach
        FROM daily ORDER BY d""")),

    // ---- conversion funnel: first 'view' per user → earliest
    // 'purchase' within the following hour, reported per first-view
    // day. Two bounded aggregations (per-user min over each type
    // slice) + one equi-join on user_id with the time window as a
    // residual predicate — never an events×events theta join, so the
    // shuffle is O(users), not O(events²). Delay sums in exact integer
    // micros (decimal) before the one shared division, so the average
    // is order-independent and engine-exact. ----
    "q103_event_funnel" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = table(s, dir, "events")
        val firstView = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min(unix_micros($"ts")).as("v_us"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", unix_micros($"ts").as("p_us"))
        // the time window lives in the JOIN condition (not a post-join
        // filter): a user whose purchases all fall outside the hour
        // must still count as an unconverted first-viewer
        val conv = firstView.as("v").join(purchases.as("p"),
            $"p.user_id" === $"v.user_id" &&
              $"p.p_us" > $"v.v_us" && $"p.p_us" <= $"v.v_us" + 3600L * 1000000L,
            "left")
          .groupBy($"v.user_id", $"v.v_us").agg(min($"p.p_us").as("conv_us"))
        conv
          .select(date_format(timestamp_micros($"v_us"), "yyyy-MM-dd").as("day"),
            $"v_us", $"conv_us")
          .groupBy($"day")
          .agg(count(lit(1)).as("n_first_views"),
            count($"conv_us").as("n_converted"),
            rnd4(count($"conv_us").cast("double") / count(lit(1))).as("conv_rate"),
            rnd4(sum(($"conv_us" - $"v_us").cast("decimal(18,0)")).cast("double") /
              greatest(count($"conv_us"), lit(1L)) / 1000000.0).as("avg_delay_sec"))
          .orderBy($"day")
      },
      Some(s"""WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS v_us
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        pur AS (SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        conv AS (SELECT fv.user_id, fv.v_us, min(p.p_us) AS conv_us
          FROM fv LEFT JOIN pur p ON p.user_id = fv.user_id
            AND p.p_us > fv.v_us AND p.p_us <= fv.v_us + 3600000000
          GROUP BY fv.user_id, fv.v_us)
        SELECT strftime(make_timestamp(v_us), '%Y-%m-%d') AS day,
          count(*) AS n_first_views,
          count(conv_us) AS n_converted,
          ${oRnd4("cast(count(conv_us) as double) / count(*)")} AS conv_rate,
          ${oRnd4("cast(sum(cast(conv_us - v_us as decimal(18,0))) as double) / greatest(count(conv_us), 1) / 1000000.0")} AS avg_delay_sec
        FROM conv GROUP BY 1 ORDER BY day""")),

    // ---- robust outlier detection (median/MAD): exact rank-based
    // medians instead of approx_percentile so the answer is
    // engine-independent — the median is the mean of the two middle
    // ROWS of the sorted group (picking specific rows is deterministic
    // over the value multiset even with ties; no float aggregation is
    // involved until the final per-group arithmetic). MAD-based fences
    // beat ±3σ on heavy-tailed money columns because the fence itself
    // is immune to the outliers it hunts. Scale note: each median pass
    // is a per-group sort window, and parallelism is bounded by the
    // GROUP count (5 priorities here) — exact medians over few huge
    // groups don't scale out (41 s at the 100× probe). This window
    // formulation is the oracle anchor; [[madOutliersScalable]] is the
    // 100 TB path — the same exact medians by range-partitioned
    // distributed selection (OpsSpec pins output equality, the probe
    // A/Bs the two), and `approx_percentile(0.5)` (q66's mergeable
    // sketch) is the cheaper answer when rank error is tolerable. ----
    // SIZE-GATED like q100/the sn channel: below MadWindowMaxRows the
    // two 5-way median windows are trivial; above it each task
    // external-sorts n/5 rows twice and the catalog flips to
    // madOutliersScalable (two full-parallelism range shuffles +
    // prefix-count median picks), output-identical (OpsSpec pin;
    // round-6 100× sweep: 43.3 s window vs 11.9 s scalable at 15M
    // rows).
    "q105_mad_outliers" -> Q(
      (s, dir) => {
        import s.implicits._
        if (graft.Core.tableRows(s, dir, "orders") > MadWindowMaxRows)
          madOutliersScalable(s, dir)
        else q105WindowRef(s, dir)
      },
      Some("""WITH o AS (SELECT o_orderpriority AS prio, o_totalprice AS price FROM orders),
        r1 AS (SELECT prio, price,
            row_number() OVER (PARTITION BY prio ORDER BY price) AS rn,
            count(*) OVER (PARTITION BY prio) AS cnt FROM o),
        med AS (SELECT prio, sum(price) / count(*) AS med_price FROM r1
          WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 GROUP BY prio),
        d AS (SELECT o.prio, abs(o.price - med.med_price) AS adev
          FROM o JOIN med USING (prio)),
        r2 AS (SELECT prio, adev,
            row_number() OVER (PARTITION BY prio ORDER BY adev) AS rn,
            count(*) OVER (PARTITION BY prio) AS cnt FROM d),
        mad AS (SELECT prio, sum(adev) / count(*) AS med_adev FROM r2
          WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 GROUP BY prio)
        SELECT o.prio, count(*) AS n,
          round(min(med.med_price), 2) AS median_price,
          round(min(mad.med_adev), 2) AS mad,
          cast(sum(CASE WHEN abs(o.price - med.med_price) > 3.0 * mad.med_adev
            THEN 1 ELSE 0 END) as bigint) AS n_outliers
        FROM o JOIN med USING (prio) JOIN mad USING (prio)
        GROUP BY o.prio ORDER BY prio""")),

    // ---- event-sequence transition matrix (Markov chain stats): lag
    // over each user's time-ordered stream → global (prev → next)
    // counts and row-normalized probabilities. One hash shuffle (the
    // per-user window) feeds a type²-bounded aggregate; ties in ts are
    // broken by event_id so every transition — and therefore every
    // count — is engine-independent. The same shape powers next-event
    // prediction features and bot detection at 100 TB: the window
    // partitions by user, so state never concentrates. ----
    "q106_markov_transitions" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val trans = table(s, dir, "events")
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
        trans.groupBy($"prev_type", $"event_type".as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            rnd4($"n".cast("double") /
              sum($"n").over(Window.partitionBy($"prev_type"))))
          .orderBy($"prev_type", $"next_type")
      },
      Some(s"""WITH t AS (SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events),
        c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
          FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
          ${oRnd4("cast(n as double) / sum(n) OVER (PARTITION BY prev_type)")} AS p
        FROM c ORDER BY prev_type, next_type"""))
  )
}
