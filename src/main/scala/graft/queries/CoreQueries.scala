package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dsl.{JoinHint, PigFunctions => PF, Rel}
import graft.ops.Rank

/** Relational-operator t2 queries (SURVEY.md §2.1/§2.3/§2.4 coverage)
  * with DuckDB oracle SQL.
  *
  * Determinism rules for differential testing (see SURVEY.md §7.5):
  *  - money/double aggregations go through exact decimal(18,2) arithmetic
  *    and cast the final aggregate back to double — order-independent and
  *    bit-identical in any engine;
  *  - per-row double arithmetic is left raw (IEEE ops are bit-exact);
  *  - every query ends in a total ORDER BY.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  import QCommon.{t, dec2}
  // q105's relative standard deviation — ONE constant feeding both the
  // profileApprox call and the within-3-rsd acceptance band (a bare
  // 0.06 literal silently encoded 3×rsd; r17 review)
  private val Rsd105 = 0.02

  val queries: Map[String, Q] = Map(

    // FILTER + FOREACH projection [POFilter, POForEach]
    "q01_filter_project" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li).filterBy(col("l_quantity") < 10 && col("l_shipdate") < lit("1995-06-01"))
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).df
    }),

    // GROUP + fused aggregation (combiner path) — PigMix L6 analog
    "q02_group_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li).group(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")).df
    }),

    // JOIN + GROUP + agg: the spork core loop (PigMix L3) — flagship
    "q03_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      Rel(li).join(Rel(o), Seq("l_orderkey"), Seq("o_orderkey"))
        .join(Rel(c), Seq("o_custkey"), Seq("c_custkey"))
        .group(col("c_mktsegment"))
        .agg(
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment")).df
    }),

    // GROUP producing the raw (group, bag) — Pig's native GROUP result
    "q04_group_bag" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Rel(o).group(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))).cast("array<string>"), ",")
            .as("orders_bag"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey")).df
    }),

    // COGROUP two inputs, full-outer, empty bags for missing sides
    "q05_cogroup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      Rel(c).cogroup(Rel(o), "c_custkey", "o_custkey")
        .foreach(col("group").as("grp"),
          size(col("bag1")).cast("long").as("n_cust"),
          size(col("bag2")).cast("long").as("n_orders"))
        .orderBy(col("grp")).df
    }),

    // OUTER JOIN + null-respecting aggregation (PigMix L13 analog)
    "q06_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      Rel(c).join(Rel(o), Seq("c_custkey"), Seq("o_custkey"), "left_outer")
        .group(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec2(col("o_totalprice"))).cast("double"), lit(0.0)).as("sum_price"))
        .orderBy(col("c_custkey")).df
    }),

    // Replicated (broadcast) join through two dims — PigMix L2 analog
    "q07_join_broadcast" -> ((s, dir) => {
      val su = t(s, dir, "supplier"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      Rel(su).join(Rel(n), Seq("s_nationkey"), Seq("n_nationkey"), hint = JoinHint.Replicated)
        .join(Rel(r), Seq("n_regionkey"), Seq("r_regionkey"), hint = JoinHint.Replicated)
        .group(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(dec2(col("s_acctbal"))).cast("double").as("sum_acctbal"))
        .orderBy(col("r_name")).df
    }),

    // CROSS [POCross]
    "q08_cross" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      Rel(r).cross(Rel(n))
        .foreach(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")).df
    }),

    // DISTINCT [PODistinct]
    "q09_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li).foreach(col("l_returnflag"), col("l_linestatus"))
        .distinctRel.orderBy(col("l_returnflag"), col("l_linestatus")).df
    }),

    // UNION (no dedup) + downstream aggregation [POUnion]
    "q10_union" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      Rel(c.select(col("c_nationkey").as("nationkey")))
        .union(Rel(su.select(col("s_nationkey").as("nationkey"))))
        .group(col("nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey")).df
    }),

    // SPLIT + multi-branch fan-out, one shared scan [POSplit]
    "q11_split" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val branches = Rel(o).split(Seq(
        col("o_totalprice") >= 200000,
        col("o_totalprice") >= 100000 && col("o_totalprice") < 200000),
        otherwise = true)
      val tagged = branches.zip(Seq("high", "mid", "low")).map { case (r, tag) =>
        r.df.agg(count(lit(1)).as("n"),
            coalesce(sum(dec2(col("o_totalprice"))).cast("double"), lit(0.0)).as("sum_price"))
          .withColumn("bucket", lit(tag))
          .select("bucket", "n", "sum_price")
      }
      tagged.reduce(_ union _).orderBy("bucket")
    }),

    // ORDER BY + LIMIT → TakeOrderedAndProject top-k [POSort+POLimit]
    "q12_order_limit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li).orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limitRel(10)
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")).df
    }),

    // RANK BY within partitions (window form; scalable: partitioned)
    "q13_rank_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = t(s, dir, "customer")
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // Global RANK — 2-pass zipWithIndex pipeline, no single-task sort
    "q14_rank_global" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Rank.rowNumber(o.select(col("o_orderkey"), col("o_totalprice")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), "rn")
        .orderBy(col("rn"))
    }),

    // CUBE [LOCube → native Expand]
    "q15_cube" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li).cube(
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n")))
        .foreach(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls")).df
    }),

    // ROLLUP over a dim hierarchy
    "q16_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      Rel(c).join(Rel(n), Seq("c_nationkey"), Seq("n_nationkey"), hint = JoinHint.Replicated)
        .join(Rel(r), Seq("n_regionkey"), Seq("r_regionkey"), hint = JoinHint.Replicated)
        .rollup(
          Seq(col("r_name"), col("n_name")),
          Seq(count(lit(1)).as("n_cust"),
            sum(dec2(col("c_acctbal"))).cast("double").as("sum_bal")))
        .foreach(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("region"), col("nation")).df
    }),

    // TOKENIZE + FLATTEN + word count (PigMix L1 / classic Pig demo)
    "q17_wordcount" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Rel(d).foreach(explode(split(col("text"), " ")).as("word"))
        .group(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limitRel(20).df
    }),

    // nested FOREACH { ORDER; LIMIT } → per-group top-n via window
    "q18_nested_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = t(s, dir, "customer")
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // anti-join + semi-join (COGROUP + IsEmpty idiom, PigMix L5)
    "q19_anti_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val anti = Rel(c).antiJoin(Rel(o), Seq("c_custkey"), Seq("o_custkey"))
        .group(col("c_nationkey")).agg(count(lit(1)).as("n_no_orders")).df
      val semi = Rel(c).semiJoin(Rel(o), Seq("c_custkey"), Seq("o_custkey"))
        .group(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders")).df
      anti.join(semi, Seq("c_nationkey"), "full_outer")
        .select(col("c_nationkey"),
          coalesce(col("n_no_orders"), lit(0L)).as("n_no_orders"),
          coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"))
        .orderBy(col("c_nationkey"))
    }),

    // scalar from a 1-row relation (ScalarExpression) via broadcast
    "q20_scalar" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val mx = o.agg(max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(mx))
        .filter(col("o_totalprice") >= col("mx") * 0.95)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // string function surface with Pig offset semantics (§2.4)
    "q21_strings" -> ((s, dir) => {
      val p = t(s, dir, "part")
      p.select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          PF.indexOf(col("p_name"), "a").as("idx_a"),
          PF.lastIndexOf(col("p_name"), "a").as("lidx_a"),
          PF.substringPig(col("p_name"), 0, 8).as("sub8"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          PF.matches(col("p_name"), ".*o.*").as("has_o"),
          PF.sizeOfString(col("p_name")).as("len"))
        .orderBy(col("p_partkey"))
    }),

    // math function surface (§2.4); transcendentals kept out of t2
    "q22_math" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          floor(col("l_extendedprice")).as("floor_p"),
          PF.roundPig(col("l_extendedprice")).as("round_p"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          PF.divide(col("l_extendedprice"), col("l_quantity")).as("unit_price"),
          PF.mod(col("l_orderkey"), lit(7)).as("mod7"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // datetime function surface (§2.4)
    "q23_datetime" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
          col("o_orderkey"),
          PF.getYear(col("o_orderdate")).as("y"),
          PF.getMonth(col("o_orderdate")).as("m"),
          PF.getDay(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          datediff(col("o_orderdate").cast("date"), lit("1994-01-01").cast("date")).as("days_since"),
          PF.addDuration(col("o_orderdate"), "P1DT2H").as("plus_1d2h"))
        .orderBy(col("o_orderkey"))
    }),

    // CASE WHEN / bincond [POBinCond]
    "q24_case" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // map lookup on JSON props [POMapLookup → from_json + element_at]
    "q25_map_json" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, MapType, StringType}
      val e = t(s, dir, "events")
      e.select(col("event_type"),
          element_at(from_json(col("props"), MapType(StringType, LongType)), "k").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ASSERT rel BY cond, end-to-end on its passing side [Assert.java]
    // (VERDICT r10 item 7 — last spec-only relational op): the
    // pre-filter guarantees the invariant, assertBy re-validates it
    // DISTRIBUTED (isEmpty over the violating subset — no driver
    // collect), and the pipeline continues into the aggregation the
    // oracle re-derives. A broken ASSERT either throws (entry errors)
    // or stops filtering nothing — both caught, since the predicate is
    // also the oracle's WHERE clause.
    "q82_assert" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Rel(li)
        .filterBy(col("l_quantity") > 0 &&
          col("l_discount") >= 0 && col("l_discount") <= 0.1)
        .assertBy(col("l_quantity") > 0, "quantity must be positive")
        .assertBy(col("l_discount") >= 0 && col("l_discount") <= 0.1,
          "discount within [0, 0.1]")
        .group(col("l_returnflag"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")).df
    }),

    // SAMPLE — seeded Bernoulli. The RNG can't match any oracle
    // row-for-row, so the emitted shape is the sample's deterministic
    // properties instead (VERDICT r6 item 8): source count, sample size
    // within 6σ binomial bounds, and sample ⊆ source — all
    // oracle-checkable as constants plus COUNT(*).
    "q26_sample" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val p = 0.5
      val n = d.count()
      val samp = Rel(d).sample(p, 42L).foreach(col("doc_id")).df
      val c = samp.count()
      val sd = math.sqrt(n * p * (1 - p))
      val inBounds = math.abs(c - n * p) <= 6 * sd
      // subset proof via anti-join (broadcast-able; except() would add a
      // distinct shuffle). Baseline note: q26 now runs three small
      // actions instead of a bare sample scan — the price of giving
      // SAMPLE a hash-checked oracle (BENCH_NOTES.md).
      val strays = samp.join(d.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
      Seq((n, inBounds, strays == 0L))
        .toDF("n_src", "sample_in_bounds", "all_from_source")
    }),

    // skewed join: lineitem keys concentrate on few suppliers — AQE
    // skew-split handles it (hint disables broadcast so the skew path
    // is the one exercised) [POSkewedJoin analog]
    "q44_join_skew" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      Rel(li).join(Rel(su), Seq("l_suppkey"), Seq("s_suppkey"), hint = JoinHint.Skewed)
        .group(col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("s_name")).df
    }),

    // merge join: pre-sorted-input sort-merge [POMergeJoin analog]
    "q45_join_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      Rel(li).join(Rel(o), Seq("l_orderkey"), Seq("o_orderkey"), hint = JoinHint.Merge)
        .group(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")).df
    }),

    // per-column table profiling: one-scan stats (non-null/null/exact
    // distinct/min/max) unpivoted to one row per column — the
    // pre-training data-quality pass; approx twin is q91's sketches
    "q104_profile" -> ((s, dir) => {
      graft.ops.Profile.profile(t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_returnflag"))
        .orderBy(col("col_name"))
    }),

    // the 100 TB profiling form (profileApprox — HLL++ sketches, ONE
    // combinable pass, no multi-distinct Expand): exact counts/min/max
    // are SQL-derivable; the sketch estimate is emitted as its
    // 3·rsd-band membership against the exact distinct computed
    // alongside (q91's pattern — VERDICT r13 task 8)
    "q105_profile_approx" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
      val li = t(s, dir, "lineitem")
      val approx = graft.ops.Profile.profileApprox(li, cols, rsd = Rsd105)
      val exact = graft.ops.Profile.profile(li, cols)
        .select(col("col_name"), col("n_distinct"))
      approx.join(exact, "col_name")
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("min_str"), col("max_str"),
          (abs(col("approx_distinct") - col("n_distinct")).cast("double")
            <= col("n_distinct").cast("double") * (3 * Rsd105)).as("within_3rsd"))
        .orderBy(col("col_name"))
    }),

    // COLLECTED group [POCollectedGroup analog, GROUP … USING
    // 'collected']: aggregation on the bucket key of a bucketed copy —
    // map-side-complete HashAggregate, ZERO Exchange (plan-asserted in
    // BucketedSpec). Results are identical to a plain GROUP BY (the
    // hint is purely physical), which is what the oracle re-derives.
    "q96_collected_group" -> ((s, dir) => {
      // per-sfDir table name (the q83/q85 convention): a fixed global
      // name let two concurrent runs on different sf dirs clobber each
      // other's bucketed files mid-read. Stale-location recovery lives
      // inside writeBucketed now (r17 review).
      val tbl = s"graft_q96_li_b_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      // pre-partition by the bucket key (the r21 appendBucketed shape):
      // an unpartitioned bucketed write makes every scan task write its
      // own file per bucket — tasks × 8 small files; hash-partitioned,
      // each task holds exactly one bucket and writes exactly one file
      graft.ops.Bucketed.writeBucketed(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
          .repartition(8, col("l_orderkey")),
        tbl, "l_orderkey", buckets = 8)
      graft.ops.Bucketed.collectedGroup(s, tbl, "l_orderkey", Seq(
          count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty")))
        .orderBy(col("l_orderkey"))
    }),

    // STREAM rel THROUGH external command [POStream / rdd.pipe analog]:
    // rows piped tab-delimited through `cat`, parsed back, re-aggregated
    "q48_stream_through" -> ((s, dir) => {
      val r = t(s, dir, "region")
      Rel(r.select(col("r_regionkey"), col("r_name")))
        .streamThrough("cat").df
        .select(split(col("line"), "\t").getItem(1).as("r_name"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

    // Accumulator-style holistic aggregate: exact per-group median via
    // the MedianAgg Aggregator (second §2.5 UDF-surface proof)
    "q57_median_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.ops.MedianAgg.median(col("l_quantity").cast("double")).as("med_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // bloom-filter semi-join [BuildBloom/Bloom analog]
    "q46_bloom_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      graft.ops.BloomJoin.semiJoin(o, "o_custkey",
          c.filter(col("c_acctbal") > 9000), "c_custkey", 100000L, 0.03)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // AvroStorage round-trip [AvroStorage.java analog, SURVEY §2.4]:
    // documents enriched with an array and a nested record, STOREd as
    // Avro container files (splittable, AvroKeyOutputFormat), LOADed
    // back through AvroKeyInputFormat, then aggregated. The oracle
    // re-derives the same aggregates from the parquet source directly —
    // any type corruption in the string/long/array/record round-trip
    // breaks the hash (array/struct CONTENT rides min/max, not just
    // sizes).
    "q83_avro_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val enriched = d.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"),
        array(col("lang"), col("source")).as("tags"),
        struct(col("lang").as("l"), col("n_chars").as("nc")).as("meta"))
      val tmp = s"/tmp/graft_q83_avro_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Loaders.storeAvro(enriched, tmp)
      graft.sources.Loaders.avroLoader(s, tmp)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_len"),
          min(concat_ws("|", col("tags"))).as("min_tags"),
          max(col("meta.nc")).as("max_meta_nc"))
        .orderBy(col("source"))
    }),

    // OrcStorage round-trip [OrcStorage.java analog, SURVEY §2.4]:
    // documents enriched with an array, a nested record and a map,
    // STOREd as ORC, LOADed back through the builtin ORC reader with a
    // filter (predicate pushdown reaches the ORC scan, like parquet),
    // then aggregated. The oracle re-derives the aggregates from the
    // parquet source — corruption anywhere in the
    // string/long/array/struct/map round-trip breaks the hash.
    "q85_orc_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val enriched = d.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"),
        array(col("lang"), col("source")).as("tags"),
        struct(col("lang").as("l"), col("n_chars").as("nc")).as("meta"),
        map(lit("lang"), col("lang")).as("props"))
      val tmp = s"/tmp/graft_q85_orc_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Loaders.storeOrc(enriched, tmp)
      graft.sources.Loaders.orcLoader(s, tmp)
        .filter(pmod(col("n_chars"), lit(2)) === 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_len"),
          min(concat_ws("|", col("tags"))).as("min_tags"),
          max(col("meta.nc")).as("max_meta_nc"),
          min(element_at(col("props"), "lang")).as("min_prop_lang"))
        .orderBy(col("source"))
    }),

    // Fixed-point integer PageRank over the bidirectional customer–part
    // purchase graph (node ids: custkey·2 / partkey·2+1): 5 damped
    // rounds of exact integer math (`div` truncation both engines), so
    // the DuckDB unrolled-recurrence oracle hash-matches bit-exactly
    "q122_pagerank" -> ((s, dir) => {
      // persisted: ranks() materializes nodes and edges+degree in
      // separate jobs, each of which would otherwise re-run this
      // orders⋈lineitem join + distinct from scratch (r17 review)
      val pairs = graft.dsl.Rel.track(t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.PageRank.ranks(edges, iterations = 5)
        .orderBy(col("r").desc, col("node"))
        .limit(30)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q83_avro_roundtrip" ->
      """SELECT source, COUNT(*) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
         MIN(lang || '|' || source) AS min_tags,
         MAX(n_chars) AS max_meta_nc
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q85_orc_roundtrip" ->
      """SELECT source, COUNT(*) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
         MIN(lang || '|' || source) AS min_tags,
         MAX(n_chars) AS max_meta_nc,
         MIN(lang) AS min_prop_lang
         FROM documents WHERE n_chars % 2 = 0
         GROUP BY 1 ORDER BY 1""",
    "q26_sample" ->
      """SELECT COUNT(*) AS n_src, TRUE AS sample_in_bounds,
         TRUE AS all_from_source FROM documents""",
    "q82_assert" ->
      """SELECT l_returnflag,
         (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
         COUNT(*) AS n
         FROM lineitem
         WHERE l_quantity > 0 AND l_discount >= 0 AND l_discount <= 0.1
         GROUP BY 1 ORDER BY 1""",
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         l_extendedprice * (1 - l_discount) AS revenue
         FROM lineitem
         WHERE l_quantity < 10 AND l_shipdate < TIMESTAMP '1995-06-01'
         ORDER BY l_orderkey, l_linenumber""",
    "q02_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
         (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
         (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_base,
         MIN(l_quantity) AS min_qty,
         MAX(l_extendedprice) AS max_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q03_join_agg" ->
      """SELECT c_mktsegment,
         (SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q04_group_bag" ->
      """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS orders_bag,
         COUNT(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q05_cogroup" ->
      """SELECT COALESCE(a.k, b.k) AS grp, COALESCE(a.nc, 0) AS n_cust,
         COALESCE(b.no_, 0) AS n_orders
         FROM (SELECT c_custkey AS k, COUNT(*) AS nc FROM customer GROUP BY 1) a
         FULL OUTER JOIN (SELECT o_custkey AS k, COUNT(*) AS no_ FROM orders GROUP BY 1) b
         ON a.k = b.k
         ORDER BY grp""",
    "q06_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         COALESCE((SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE, 0.0) AS sum_price
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q07_join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_suppliers,
         (SUM(CAST(s_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q08_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY 1, 2""",
    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""",
    "q10_union" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)
         GROUP BY 1 ORDER BY 1""",
    "q11_split" ->
      """SELECT * FROM (
           SELECT 'high' AS bucket, COUNT(*) AS n,
             COALESCE((SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE, 0.0) AS sum_price
           FROM orders WHERE o_totalprice >= 200000
           UNION ALL
           SELECT 'mid', COUNT(*),
             COALESCE((SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE, 0.0)
           FROM orders WHERE o_totalprice >= 100000 AND o_totalprice < 200000
           UNION ALL
           SELECT 'low', COUNT(*),
             COALESCE((SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE, 0.0)
           FROM orders WHERE o_totalprice < 100000)
         ORDER BY bucket""",
    "q12_order_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q13_rank_window" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
         RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
         FROM customer ORDER BY c_nationkey, c_custkey""",
    "q14_rank_global" ->
      """SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders ORDER BY rn""",
    "q15_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
         (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q16_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
         COUNT(*) AS n_cust, (SUM(CAST(c_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region, nation""",
    "q17_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
         GROUP BY 1 ORDER BY n DESC, word LIMIT 20""",
    "q18_nested_topn" ->
      """SELECT * FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer)
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "q19_anti_semi" ->
      """SELECT COALESCE(a.c_nationkey, b.c_nationkey) AS c_nationkey,
         COALESCE(a.n_no_orders, 0) AS n_no_orders,
         COALESCE(b.n_with_orders, 0) AS n_with_orders
         FROM (SELECT c_nationkey, COUNT(*) AS n_no_orders FROM customer
               WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
               GROUP BY 1) a
         FULL OUTER JOIN
              (SELECT c_nationkey, COUNT(*) AS n_with_orders FROM customer
               WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
               GROUP BY 1) b
         ON a.c_nationkey = b.c_nationkey
         ORDER BY c_nationkey""",
    "q20_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >= (SELECT MAX(o_totalprice) FROM orders) * 0.95
         ORDER BY o_orderkey""",
    "q21_strings" ->
      """SELECT p_partkey, UPPER(p_name) AS uname,
         CAST(strpos(p_name, 'a') - 1 AS INTEGER) AS idx_a,
         CAST(CASE WHEN strpos(REVERSE(p_name), 'a') = 0 THEN -1
              ELSE LENGTH(p_name) - strpos(REVERSE(p_name), 'a') - 1 + 1 END AS INTEGER) AS lidx_a,
         SUBSTRING(p_name, 1, 8) AS sub8,
         REPLACE(p_name, ' ', '_') AS snake,
         regexp_full_match(p_name, '.*o.*') AS has_o,
         LENGTH(p_name)::BIGINT AS len
         FROM part ORDER BY p_partkey""",
    "q22_math" ->
      """SELECT l_orderkey, l_linenumber,
         ABS(l_discount - 0.05) AS abs_d,
         CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS round_p,
         SQRT(l_quantity) AS sqrt_q,
         CASE WHEN l_quantity = 0 THEN NULL ELSE l_extendedprice / l_quantity END AS unit_price,
         l_orderkey % 7 AS mod7
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q23_datetime" ->
      """SELECT o_orderkey,
         CAST(YEAR(o_orderdate) AS INTEGER) AS y,
         CAST(MONTH(o_orderdate) AS INTEGER) AS m,
         CAST(DAY(o_orderdate) AS INTEGER) AS d,
         CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
         CAST(date_diff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
         o_orderdate + INTERVAL 1 DAY + INTERVAL 2 HOUR AS plus_1d2h
         FROM orders ORDER BY o_orderkey""",
    "q24_case" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     ELSE 'high' END AS bucket, COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q44_join_skew" ->
      """SELECT s_name, COUNT(*) AS n,
         (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1 ORDER BY 1""",
    "q45_join_merge" ->
      """SELECT o_orderstatus, COUNT(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q96_collected_group" ->
      """SELECT l_orderkey, COUNT(*) AS n,
         (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q104_profile" ->
      """SELECT * FROM (
           SELECT 'l_orderkey' AS col_name, COUNT(l_orderkey) AS n_nonnull,
             SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
             COUNT(DISTINCT l_orderkey) AS n_distinct,
             MIN(l_orderkey)::VARCHAR AS min_str,
             MAX(l_orderkey)::VARCHAR AS max_str
           FROM lineitem
           UNION ALL
           SELECT 'l_quantity', COUNT(l_quantity),
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
             COUNT(DISTINCT l_quantity),
             MIN(l_quantity)::VARCHAR, MAX(l_quantity)::VARCHAR
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', COUNT(l_returnflag),
             SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
             COUNT(DISTINCT l_returnflag),
             MIN(l_returnflag)::VARCHAR, MAX(l_returnflag)::VARCHAR
           FROM lineitem)
         ORDER BY col_name""",
    "q105_profile_approx" ->
      """SELECT * FROM (
           SELECT 'l_orderkey' AS col_name, COUNT(l_orderkey) AS n_nonnull,
             SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
             MIN(l_orderkey)::VARCHAR AS min_str,
             MAX(l_orderkey)::VARCHAR AS max_str, TRUE AS within_3rsd
           FROM lineitem
           UNION ALL
           SELECT 'l_quantity', COUNT(l_quantity),
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
             MIN(l_quantity)::VARCHAR, MAX(l_quantity)::VARCHAR, TRUE
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', COUNT(l_returnflag),
             SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
             MIN(l_returnflag)::VARCHAR, MAX(l_returnflag)::VARCHAR, TRUE
           FROM lineitem)
         ORDER BY col_name""",
    "q48_stream_through" ->
      """SELECT r_name, COUNT(*) AS n FROM region GROUP BY 1 ORDER BY 1""",
    "q57_median_agg" ->
      """SELECT l_returnflag, l_linestatus,
         median(CAST(l_quantity AS DOUBLE)) AS med_qty, COUNT(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q46_bloom_semi" ->
      """SELECT o_orderstatus, COUNT(*) AS n
         FROM orders WHERE EXISTS (
           SELECT 1 FROM customer
           WHERE c_custkey = o_custkey AND c_acctbal > 9000)
         GROUP BY 1 ORDER BY 1""",
    "q25_map_json" ->
      """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
         MIN(k) AS min_k, MAX(k) AS max_k
         FROM (SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
         GROUP BY 1 ORDER BY 1""",
    "q122_pagerank" ->
      """WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS src,
                          l_partkey * 2 + 1 AS dst
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         edges AS (SELECT src, dst FROM pairs
                   UNION ALL SELECT dst, src FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY 1),
         p AS (SELECT COUNT(*) AS n FROM nodes),
         r0 AS (SELECT node, (1000000000000 // n) AS r
                FROM nodes CROSS JOIN p),
         i1 AS (SELECT nodes.node,
                  (((1000000000000 // n) * 15) // 100)
                    + ((COALESCE(s.insum, 0) * 85) // 100) AS r
                FROM nodes CROSS JOIN p
                LEFT JOIN (SELECT e.dst, SUM(r.r // od.od) AS insum
                           FROM edges e JOIN r0 r ON e.src = r.node
                           JOIN od ON od.src = e.src GROUP BY 1) s
                  ON s.dst = nodes.node),
         i2 AS (SELECT nodes.node,
                  (((1000000000000 // n) * 15) // 100)
                    + ((COALESCE(s.insum, 0) * 85) // 100) AS r
                FROM nodes CROSS JOIN p
                LEFT JOIN (SELECT e.dst, SUM(r.r // od.od) AS insum
                           FROM edges e JOIN i1 r ON e.src = r.node
                           JOIN od ON od.src = e.src GROUP BY 1) s
                  ON s.dst = nodes.node),
         i3 AS (SELECT nodes.node,
                  (((1000000000000 // n) * 15) // 100)
                    + ((COALESCE(s.insum, 0) * 85) // 100) AS r
                FROM nodes CROSS JOIN p
                LEFT JOIN (SELECT e.dst, SUM(r.r // od.od) AS insum
                           FROM edges e JOIN i2 r ON e.src = r.node
                           JOIN od ON od.src = e.src GROUP BY 1) s
                  ON s.dst = nodes.node),
         i4 AS (SELECT nodes.node,
                  (((1000000000000 // n) * 15) // 100)
                    + ((COALESCE(s.insum, 0) * 85) // 100) AS r
                FROM nodes CROSS JOIN p
                LEFT JOIN (SELECT e.dst, SUM(r.r // od.od) AS insum
                           FROM edges e JOIN i3 r ON e.src = r.node
                           JOIN od ON od.src = e.src GROUP BY 1) s
                  ON s.dst = nodes.node),
         i5 AS (SELECT nodes.node,
                  (((1000000000000 // n) * 15) // 100)
                    + ((COALESCE(s.insum, 0) * 85) // 100) AS r
                FROM nodes CROSS JOIN p
                LEFT JOIN (SELECT e.dst, SUM(r.r // od.od) AS insum
                           FROM edges e JOIN i4 r ON e.src = r.node
                           JOIN od ON od.src = e.src GROUP BY 1) s
                  ON s.dst = nodes.node)
         SELECT node, CAST(r AS BIGINT) AS r FROM i5
         ORDER BY r DESC, node LIMIT 30"""
  )
}
