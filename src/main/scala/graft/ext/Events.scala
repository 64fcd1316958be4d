package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Event-time operators over the `events` feed (extension surface,
  * SURVEY.md §2.10/§2.12). The reference's only "streaming" is inline
  * base64 payloads on `online` jobs (cubicerpetl/cubicerpetl.py:204-214);
  * here the same pipeline shapes run as batch windows AND as Structured
  * Streaming (same column expressions both ways).
  */
object Events {

  /** Schema-aware epoch-microseconds accessor for an event-time column.
    * Event-time math in this engine runs on exact integer µs; the column
    * itself may arrive in either of two parquet encodings:
    *  - LONG — raw epoch nanoseconds (a `nanosAsLong=true` read of parquet
    *    TIMESTAMP(NANOS)): exact integer FLOOR division by 1000 (a pmod
    *    adjustment — `div` alone truncates toward zero, which would
    *    disagree with DuckDB's flooring `epoch_us` on pre-1970 negative
    *    event times; positive epochs are unaffected);
    *  - TIMESTAMP / TIMESTAMP_NTZ (parquet's default MICROS encoding):
    *    `unix_micros` after a cast to TIMESTAMP. The session timezone is
    *    pinned UTC throughout (Verify/Bench/specs), so the NTZ cast is an
    *    identity reinterpretation and the result is the same exact µs.
    * Every event-time operator resolves `ts` through this helper, so the
    * engine is indifferent to which encoding a fixture carries.
    */
  def epochMicros(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"(`$tsCol` - pmod(`$tsCol`, 1000)) div 1000")
      case _        => unix_micros(col(tsCol).cast(TimestampType))
    }

  /** Tumbling event-time aggregation. Batch form; streaming is identical
    * with `readStream` + `withWatermark` upstream.
    */
  def tumbling(df: DataFrame, ts: Column, every: String, aggs: Seq[Column], keys: Seq[Column] = Nil): DataFrame =
    df.groupBy((window(ts, every) +: keys): _*).agg(aggs.head, aggs.tail: _*)

  /** Hopping (sliding) event-time windows in exact integer µs: windows
    * of length `spanUs` starting at every multiple of `slideUs` (spanUs
    * must be a multiple of slideUs). Each event belongs to exactly
    * spanUs/slideUs windows, expanded relationally (a bounded explode —
    * the same expansion Spark's own `window(ts, span, slide)` performs)
    * and aggregated with ONE map-side-combined shuffle on (window_start,
    * keys). Window starts are floor-aligned (pmod adjustment, exact on
    * negative epochs like [[epochMicros]]); output carries window_start
    * and window_end µs.
    */
  def hopping(
      df: DataFrame,
      tsUsCol: String,
      slideUs: Long,
      spanUs: Long,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    require(slideUs >= 1 && spanUs >= slideUs && spanUs % slideUs == 0,
      s"hopping: spanUs=$spanUs must be a positive multiple of slideUs=$slideUs")
    val m = spanUs / slideUs
    // exact integer floor-alignment (div truncates; the pmod pre-subtract
    // makes it floor on negative epochs too — the epochMicros convention)
    val bucket =
      expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, ${slideUs}L)) div ${slideUs}L")
    val expanded = df
      .withColumn("__i", explode(sequence(lit(0L), lit(m - 1))))
      .withColumn("window_start", (bucket - col("__i")) * lit(slideUs))
    expanded
      .groupBy((col("window_start") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_end", col("window_start") + lit(spanUs))
  }

  /** Time-series resample + forward fill: the gap-filling every
    * metric/monitoring consumer wants — a dense per-key time grid where
    * silent buckets report `n_events = 0` and carry the last observed
    * aggregate forward. One data-sized pass (the per-(key, bucket)
    * rollup, map-side combined); everything after lives on the
    * O(keys × buckets) grid — the spine explode (`sequence` over each
    * key's min..max bucket), the left join, and the one per-key ordered
    * window for the fill — all row-count-independent. Caller picks
    * `stepUs` so range/step stays grid-sized; a key spanning years at
    * 1 ms steps is a caller bug, not an operator path.
    *
    * Bucket alignment is exact floor division on integer µs (the
    * [[hopping]] convention, negative-epoch safe). `total_value` is the
    * observed per-bucket sum (DECIMAL(18,2)-exact, null on silent
    * buckets); `filled_value` is its forward fill — never null once the
    * key has observed a non-null value (each key's spine starts at its
    * own first observed bucket, but a key whose leading events all carry
    * a null `valueCol` sums to a null `total_value` there, and the fill
    * propagates that null until the first non-null bucket — SQL sum
    * semantics, matched by the oracle).
    */
  def resampleFill(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      valueCol: String,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, s"resampleFill: stepUs=$stepUs")
    val bucket =
      expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, ${stepUs}L)) div ${stepUs}L")
    val obs = df.withColumn("__b", bucket)
      .groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))
    val spine = obs.groupBy(col(keyCol))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .withColumn("__b", explode(sequence(col("__lo"), col("__hi"))))
      .select(col(keyCol), col("__b"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(obs, Seq(keyCol, "__b"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value", last(col("total_value"), ignoreNulls = true).over(byKey))
      .select(col(keyCol), (col("__b") * lit(stepUs)).as("bucket_start"),
        col("n_events"), col("total_value"), col("filled_value"))
  }

  /** Gap-based sessionization, batch form (gaps-and-islands): a new session
    * starts when the gap from the previous event of the same user exceeds
    * `gap` (measured on `orderCol`, a NUMERIC epoch column — nanos, micros,
    * seconds — so gap math is exact integer arithmetic, immune to timestamp
    * truncation differences). Shuffles once on user, then two in-partition
    * window passes — the classic scalable form (each user's history must be
    * co-partitioned; skewed users are the caveat, salting applies).
    */
  def sessionizeBatch(df: DataFrame, userCol: String, orderCol: String, gap: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(orderCol))
    df.withColumn("__prev", lag(col(orderCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || col(orderCol) - col("__prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new_session")
  }

  /** Per-session rollup on top of [[sessionizeBatch]]; `tsCol` is the
    * display timestamp (min/max per session), `orderCol`/`gap` drive the
    * gap logic.
    */
  def sessionStats(df: DataFrame, userCol: String, orderCol: String, gap: Long, tsCol: String): DataFrame =
    sessionizeBatch(df, userCol, orderCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Sessionization via Spark's NATIVE `session_window` — the built-in
    * the custom gaps-and-islands pass ([[sessionStats]]) and the
    * stateful streaming form both re-derive. Declared this way the
    * session merge runs inside Catalyst's dedicated
    * MergingSessions/UpdatingSessions operators (sort-based in-partition
    * merge after one key shuffle, no window-function pass), and the SAME
    * expression works unchanged under `readStream` + watermark — the one
    * spelling that covers batch and streaming.
    *
    * Boundary semantics match [[sessionizeBatch]] exactly, including at
    * the boundary (spec-pinned, empirically): Spark merges ABUTTING
    * per-event windows, so an exactly-gap-apart pair shares a session —
    * the same inclusive `diff > gap`-starts-a-session rule as the
    * gaps-and-islands pass, and the two forms produce identical session
    * compositions on any input. `window_end` is last event + gap (the
    * window bound), alongside the exact `session_end` last-event stamp.
    *
    * Input `microsCol` is exact integer epoch-µs (the [[epochMicros]]
    * convention); the timestamp conversion is `timestamp_micros` under
    * the UTC-pinned session, round-tripped back via `unix_micros`.
    */
  def sessionWindowStats(
      df: DataFrame,
      userCol: String,
      microsCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"sessionWindowStats: gapMicros=$gapMicros")
    df.withColumn("__t", timestamp_micros(col(microsCol)))
      .groupBy(col(userCol),
        session_window(col("__t"), s"$gapMicros microseconds").as("__sw"))
      .agg(
        min(col(microsCol)).as("session_start"),
        max(col(microsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(userCol),
        unix_micros(col("__sw.start")).as("window_start"),
        unix_micros(col("__sw.end")).as("window_end"),
        col("session_start"), col("session_end"), col("n_events"))
  }

  /** Hot-user-safe two-phase sessionization rollup — the salted fallback
    * the [[sessionizeBatch]] scaladoc's caveat points at. Phase 1 salts
    * the per-user window with a CONTIGUOUS time bucket (`floor(orderCol /
    * bucketWidth)`, floor-division so negative epochs bucket correctly):
    * the gaps-and-islands pass runs per (user, bucket), so a user owning
    * half the corpus shards across `timeRange / bucketWidth` reducers
    * instead of serializing one. The per-(user, bucket) rollup reuses the
    * window's hash partitioning (grouping keys ⊇ partitioning keys — no
    * second shuffle). Phase 2 merges at SESSION granularity: per user,
    * ordered by session start, chains of rollups whose boundary gap is ≤
    * `gap` collapse into one session — exactly the sessions bucketing
    * cut, because interior rollups are already gap-separated from their
    * in-bucket neighbors by construction. Phase-2 volume is O(sessions),
    * not O(events) — for a dense hot user, ~1 rollup per bucket.
    *
    * Equivalent to [[sessionStats]]' rollups for EVERY bucketWidth ≥ 1
    * (pinned by spec); pick bucketWidth ≫ gap so phase 2 stays small.
    * Output: (userCol, session_start, session_end, n_events).
    */
  def sessionStatsSalted(
      df: DataFrame,
      userCol: String,
      orderCol: String,
      gap: Long,
      tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val o = col(orderCol)
    val byUB = Window.partitionBy(col(userCol), col("__bkt")).orderBy(o)
    val local = df
      // `div`, not `/`: double division misassigns buckets past 2^53
      .withColumn("__bkt", expr(s"(`$orderCol` - pmod(`$orderCol`, ${bucketWidth}L)) div ${bucketWidth}L"))
      .withColumn("__prev", lag(o, 1).over(byUB))
      .withColumn("__ns",
        when(col("__prev").isNull || o - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("__seq",
        sum(col("__ns")).over(byUB.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("__bkt"), col("__seq"))
      .agg(
        min(o).as("__o_start"), max(o).as("__o_end"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
    val byU = Window.partitionBy(col(userCol)).orderBy(col("__o_start"))
    local
      .withColumn("__pe", lag(col("__o_end"), 1).over(byU))
      .withColumn("__nc",
        when(col("__pe").isNull || col("__o_start") - col("__pe") > gap, 1L)
          .otherwise(0L))
      .withColumn("__chain",
        sum(col("__nc")).over(byU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("__chain"))
      .agg(
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"))
      .select(col(userCol), col("session_start"), col("session_end"), col("n_events"))
  }

  /** Structured Streaming sessionization with the native `session_window`
    * operator + watermark — the streaming twin of [[sessionStats]]. Used by
    * the streaming spec; takes any (streaming or batch) DataFrame.
    */
  def sessionWindowed(df: DataFrame, userCol: String, tsCol: String, gap: String): DataFrame =
    df.withWatermark(tsCol, "10 minutes")
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))

  /** JSON props extraction (`from_json`-style typed access; the fixture's
    * `props` carries {"k": int}).
    */
  def propsField(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field")

  /** Per-type OLS volume trend over hourly counts — the drift companion
    * to [[hourlyAnomalies]] ("is this feed growing/shrinking, and how
    * fast"). The slope over (hour index, count) uses the closed form
    *
    *   β = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * with x RE-BASED to (bucket − the type's min bucket): the sums stay
    * small exact LONGs on both engines (un-rebased epoch-hour indexes
    * push (Σx)² toward 2⁶³ and DuckDB into HUGEINT), and a shift in x
    * changes no slope. All sums are exact integers; the slope is ONE
    * double division, rounded 6 dp — engine-portable. Types with a
    * single bucket (den = 0) report slope 0. Output: (typeCol,
    * n_buckets, slope events/hour).
    */
  def volumeTrend(df: DataFrame, typeCol: String, tsUsCol: String): DataFrame = {
    val hour = 3600L * 1000000L
    val bkt = expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, $hour)) div $hour")
    val hourly = df.groupBy(col(typeCol), bkt.as("__bkt"))
      .agg(count(lit(1)).as("c"))
    val based = hourly
      .join(hourly.groupBy(col(typeCol)).agg(min(col("__bkt")).as("__b0")), Seq(typeCol))
      .withColumn("x", col("__bkt") - col("__b0"))
    based.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("c")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("c")).as("sxy"))
      .select(col(typeCol), col("n").as("n_buckets"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0L, lit(0.0d))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
          .as("slope"))
  }

  /** Volume-anomaly detection over hourly event counts, ENTIRELY in
    * integer arithmetic — no floating-point knife edges anywhere, so the
    * anomaly set is bit-identical on any engine. A bucket is anomalous
    * for its type when its count deviates from the type's mean by more
    * than `k` standard deviations; with n buckets, sum S and sum of
    * squares Q (all exact LONGs):
    *
    *   |c − S/n| > k·σ  ⟺  (c·n − S)² > k²·(n·Q − S²)
    *
    * (σ² = (nQ − S²)/n²; both sides multiplied by n².) Two aggregations:
    * hourly counts (one shuffle on (type, bucket), map-side combined),
    * then per-type moments (O(types × buckets) rows), broadcast back.
    * Output: (typeCol, n_buckets, n_events, n_anomalies). LONG range
    * bounds the counts: |c·n − S| and n·Q must stay < 2⁶³ — holds to
    * ~10⁹ events per bucket at ~10⁵ buckets; past that, widen to
    * DECIMAL(38,0) the way q35's moments do.
    */
  def hourlyAnomalies(
      df: DataFrame,
      typeCol: String,
      tsUsCol: String,
      k: Int = 3): DataFrame = {
    val hour = 3600L * 1000000L
    val bkt = expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, $hour)) div $hour")
    val hourly = df.groupBy(col(typeCol), bkt.as("__bkt"))
      .agg(count(lit(1)).as("c"))
    val st = hourly.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    hourly.join(broadcast(st), Seq(typeCol))
      .withColumn("__dev", col("c") * col("n") - col("s"))
      .withColumn("__an",
        when(col("__dev") * col("__dev") >
          lit(k.toLong * k) * (col("n") * col("q") - col("s") * col("s")), 1L)
          .otherwise(0L))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("n_events"),
        sum(col("__an")).as("n_anomalies"))
  }

  /** Ordered conversion funnel: per user, stage i counts only if it
    * happens STRICTLY AFTER the user's (earliest valid) stage i−1 — the
    * product-analytics "did view → click → purchase, in that order"
    * query. Output: (stage_idx, stage, users) with `users` = users whose
    * ordered chain reaches the stage.
    *
    * 100 TB design: one aggregation per stage, every one keyed by the
    * user column. Stage i shuffles only the stage-i EVENT SLICE (the
    * type filter is pushed to the scan) joined against the previous
    * stage's reached-user set — which shrinks monotonically down the
    * funnel, so each join's small side broadcasts or co-partitions.
    * Stage counts are a final O(stages)-row aggregate. Exact integers
    * throughout.
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsUsCol: String,
      stages: Seq[String]): DataFrame =
    funnelByKeys(df, Seq(userCol), typeCol, tsUsCol, stages)
      .withColumnRenamed("units", "users")

  /** [[funnel]] generalized to a composite progression key — e.g.
    * (user, session) to require the ordered chain INSIDE one session
    * rather than across a user's whole history. `units` counts distinct
    * key tuples reaching each stage.
    */
  def funnelByKeys(
      df: DataFrame,
      keyCols: Seq[String],
      typeCol: String,
      tsUsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && keyCols.nonEmpty,
      "funnel: stages and keyCols must be non-empty")
    val ks = keyCols.map(col)
    val ev = df.select((ks :+ col(typeCol).as("et") :+ col(tsUsCol).as("t")): _*)
    // reached(i): (keys, t_i) — earliest stage-i event after t_{i-1}.
    // Each reached set feeds TWO consumers (the next stage's join and
    // its own count) and chains into every later stage's lineage —
    // materialized per stage (x05 multi-consumer rule), or the event
    // scan re-runs O(stages²) times
    var reached = Dedup.materialize(ev.filter(col("et") === stages.head)
      .groupBy(ks: _*).agg(min(col("t")).as("t")))
    var out = Seq((1L, stages.head, reached))
    stages.toList.drop(1).foreach { s =>
      val prev = reached.withColumnRenamed("t", "tp")
      reached = Dedup.materialize(ev.filter(col("et") === s)
        .join(prev, keyCols)
        .filter(col("t") > col("tp"))
        .groupBy(ks: _*).agg(min(col("t")).as("t")))
      out = out :+ ((out.size + 1L, s, reached))
    }
    out.map { case (i, s, r) =>
      r.agg(count(lit(1)).as("units"))
        .select(lit(i).as("stage_idx"), lit(s).as("stage"), col("units"))
    }.reduce(_.unionByName(_))
  }

  /** Last-touch attribution: each conversion event resolves the user's
    * most recent non-conversion touch at-or-before the conversion instant
    * (the marketing-analytics shape of the point-in-time lookup; a touch
    * in the same microsecond attributes). Rides [[AsofJoin]]'s
    * union+window — one shuffle on the user key, linear scan, no range
    * join. Touches are first deduplicated to one per (user, instant) —
    * the latest `seqCol` wins — so the asof pick is deterministic.
    *
    * Output: the conversion rows with a `channel` column (null when the
    * user has no prior touch — organic conversions).
    */
  def lastTouchAttribution(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsUsCol: String,
      seqCol: String,
      convType: String,
      payloadCols: Seq[String] = Nil): DataFrame = {
    val touches = df.filter(col(typeCol) =!= convType)
      .groupBy(col(userCol), col(tsUsCol).as("__tt"))
      .agg(max_by(col(typeCol), col(seqCol)).as("channel"))
    val convs = df.filter(col(typeCol) === convType)
      .select((Seq(col(seqCol), col(userCol), col(tsUsCol)) ++
        payloadCols.map(col)): _*)
    AsofJoin(convs, touches, userCol, tsUsCol, "__tt",
      Map("channel" -> "channel"))
  }

  /** Weekly retention cohorts: users are cohorted by the epoch-week of
    * their FIRST event; each later active week counts them at that week
    * offset. Output: (cohort_week, week_offset, users) — offset 0 is the
    * cohort's own size.
    *
    * 100 TB design: distinct (user, week) first (one map-side-combined
    * shuffle on the pair, collapsing the event stream to user-weeks —
    * the only row-sized shuffle), then the per-user min week is a
    * second, already-collapsed shuffle on the user key, and the cohort
    * matrix is an O(users × active-weeks) → O(weeks²) aggregate. Week
    * index is exact integer floor-division of the event-time micros.
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsUsCol: String): DataFrame = {
    val week = 7L * 24 * 3600 * 1000000L
    val uw = df.select(col(userCol).as("u"),
        expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, $week)) div $week").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("u"))
    uw.withColumn("cohort_week", min(col("wk")).over(w))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
