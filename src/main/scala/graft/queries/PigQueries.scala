package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{reverse, sum, trim, upper}
import graft.piglatin.PigEngine

/** t2 queries executed THROUGH the Pig Latin front-end (parse → compile
  * → DataFrame), oracle-checked like every other query — differential
  * proof that the front-end preserves semantics end-to-end.
  */
object PigQueries {
  type Q = (SparkSession, String) => DataFrame

  private def pig(s: SparkSession, dir: String, script: String,
                  setup: PigEngine => PigEngine = identity): DataFrame =
    setup(new PigEngine(s, Some(dir))).run(script).relation("out")

  val queries: Map[String, Q] = Map(

    // join + group + fused aggregation, all via Pig Latin
    "q50_pig_join_agg" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      o  = LOAD 'orders.parquet';
      j  = JOIN li BY l_orderkey, o BY o_orderkey;
      g  = GROUP j BY o_orderpriority;
      a  = FOREACH g GENERATE group AS priority, COUNT(j) AS n,
                              (double) SUM((bigdecimal) j.l_quantity) AS sum_qty;
      out = ORDER a BY priority;
      """)),

    // tokenize + flatten + wordcount + top-k via Pig Latin
    "q51_pig_wordcount" -> ((s, dir) => pig(s, dir, """
      d = LOAD 'documents.parquet';
      w = FOREACH d GENERATE FLATTEN(TOKENIZE(text)) AS word;
      g = GROUP w BY word;
      c = FOREACH g GENERATE group AS word, COUNT(w) AS n;
      ord = ORDER c BY n DESC, word;
      out = LIMIT ord 20;
      """)),

    // scalar function surface + filter + bincond via Pig Latin
    "q52_pig_strings" -> ((s, dir) => pig(s, dir, """
      p = LOAD 'part.parquet';
      f = FILTER p BY p_size >= 25 AND p_name MATCHES '.*a.*';
      out0 = FOREACH f GENERATE p_partkey, UPPER(p_name) AS uname,
               INDEXOF(p_name, 'a') AS idx_a,
               SUBSTRING(p_name, 0, 6) AS sub6,
               (p_retailprice > 1500.0 ? 'premium' : 'standard') AS tier;
      out = ORDER out0 BY p_partkey;
      """)),

    // CUBE statement through the front-end: grouping-set aggregation
    // with FLATTEN-free group derefs, null dims patched via bincond
    "q54_pig_cube" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      c  = CUBE li BY CUBE(l_returnflag, l_linestatus);
      a  = FOREACH c GENERATE group.l_returnflag AS rf0, group.l_linestatus AS ls0,
             SUM((double) cube.l_quantity) AS sum_qty, COUNT(cube) AS n;
      b  = FOREACH a GENERATE (rf0 IS NULL ? 'ALL' : rf0) AS rf,
             (ls0 IS NULL ? 'ALL' : ls0) AS ls, sum_qty, n;
      out = ORDER b BY rf, ls;
      """)),

    // nested FOREACH block (per-group FILTER/ORDER/LIMIT) via Pig Latin
    "q53_pig_nested" -> ((s, dir) => pig(s, dir, """
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      x = FOREACH g {
        big = FILTER o BY o_totalprice >= 100000.0;
        srt = ORDER big BY o_totalprice DESC;
        top2 = LIMIT srt 2;
        GENERATE group AS cust, COUNT(big) AS n_big, FLATTEN(top2.o_orderkey) AS okey;
      };
      out = ORDER x BY cust, okey;
      """)),

    // mixed CUBE/ROLLUP grouping sets through the front-end — the
    // regression guard for the r6 grouping-sets fix (cross product of
    // the clauses' set families via Dataset.groupingSets)
    "q59_pig_mixed_sets" -> ((s, dir) => pig(s, dir, """
      li0 = LOAD 'lineitem.parquet';
      li  = FOREACH li0 GENERATE l_returnflag, l_linestatus,
              (chararray) l_linenumber AS ln, l_quantity;
      c  = CUBE li BY CUBE(l_returnflag), ROLLUP(l_linestatus, ln);
      a  = FOREACH c GENERATE group.l_returnflag AS rf0, group.l_linestatus AS ls0,
             group.ln AS ln0,
             SUM((double) cube.l_quantity) AS sum_qty, COUNT(cube) AS n;
      b  = FOREACH a GENERATE (rf0 IS NULL ? 'ALL' : rf0) AS rf,
             (ls0 IS NULL ? 'ALL' : ls0) AS ls,
             (ln0 IS NULL ? 'ALL' : ln0) AS ln, sum_qty, n;
      out = ORDER b BY rf, ls, ln;
      """)),

    // user-function registration (EvalFunc + DEFINE analog): two
    // registered Column-transform functions, one called through a
    // DEFINE alias — the front-end's extensibility surface
    "q60_pig_udf" -> ((s, dir) => pig(s, dir, """
      DEFINE margin PRICE_MARGIN;
      p = LOAD 'part.parquet';
      f = FOREACH p GENERATE p_partkey, NORM_NAME(p_name) AS nname,
            margin(p_retailprice, p_size) AS margin;
      out = ORDER f BY p_partkey;
      """,
      _.registerFunction("NORM_NAME", cs => upper(trim(cs.head)))
       .registerFunction("PRICE_MARGIN", cs =>
         cs.head.cast("double") * 2.0 + cs(1).cast("double")))),

    // ORDER … USING custom comparator: sort-by-computed-key (reversed
    // string); supplier names are unique so the order is total
    "q61_pig_order_using" -> ((s, dir) => pig(s, dir, """
      s = LOAD 'supplier.parquet';
      f = FOREACH s GENERATE s_suppkey, s_name;
      out = ORDER f BY s_name USING revkey;
      """,
      _.registerComparator("REVKEY", reverse))),

    // aggregate user functions (Algebraic UDF analog): registered
    // Column aggregates fuse into groupBy().agg() — SUMSQ is a plain
    // expression aggregate, MEDIANQ drives the MedianAgg Aggregator
    "q63_pig_agg_udf" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      g  = GROUP li BY l_returnflag;
      a  = FOREACH g GENERATE group AS rf, SUMSQ(li.l_quantity) AS sumsq,
             MEDIANQ(li.l_quantity) AS med, COUNT(li) AS n;
      out = ORDER a BY rf;
      """,
      _.registerAggregate("SUMSQ", cs =>
         sum((cs.head * cs.head).cast("decimal(28,4)")).cast("double"))
       .registerAggregate("MEDIANQ", cs =>
         graft.ops.MedianAgg.median(cs.head.cast("double"))))),

    // PigMix L4/L15 shape: DISTINCT inside a nested FOREACH + multiple
    // distinct aggregates per group
    "q62_pig_distinct_agg" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      g  = GROUP li BY l_returnflag;
      x  = FOREACH g {
        ln  = li.l_linenumber;
        dln = DISTINCT ln;
        ok  = li.l_orderkey;
        dok = DISTINCT ok;
        GENERATE group AS rf, COUNT(dln) AS n_lines, COUNT(dok) AS n_orders,
                 COUNT(li) AS n_rows;
      };
      out = ORDER x BY rf;
      """)),

    // PigMix L1 shape [R: test/perf/pigmix/src/pig/L1.pig]: explode a
    // bag of maps (page_links analog) and dereference a map field from
    // the flattened column — the bag-of-maps pipeline L1 benchmarks
    "q70_pigmix_l1" -> ((s, dir) => pig(s, dir, """
      o = LOAD 'orders.parquet';
      b = FOREACH o GENERATE o_orderkey,
            FLATTEN(TOBAG(TOMAP('f', o_orderpriority), TOMAP('f', o_orderstatus))) AS m;
      x = FOREACH b GENERATE m#'f' AS v;
      g = GROUP x BY v;
      a = FOREACH g GENERATE group AS v, COUNT(x) AS n;
      out = ORDER a BY v;
      """)),

    // PigMix L6 shape [R: test/perf/pigmix/src/pig/L6.pig]: NARROW
    // group-by (few groups) with fused aggregation — the combiner's
    // best case (map-side partials collapse to |groups| rows)
    "q71_pigmix_l6" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      g  = GROUP li BY l_linenumber;
      a  = FOREACH g GENERATE group AS ln, COUNT(li) AS n,
             (double) SUM((bigdecimal) li.l_quantity) AS sum_qty;
      out = ORDER a BY ln;
      """)),

    // PigMix L7 shape [R: test/perf/pigmix/src/pig/L7.pig]: WIDE
    // group-by (~|customers| groups) — partial aggregation still bounds
    // the shuffle to one row per (mapper, key)
    "q72_pigmix_l7" -> ((s, dir) => pig(s, dir, """
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      a = FOREACH g GENERATE group AS cust, COUNT(o) AS n,
            (double) SUM((bigdecimal) o.o_totalprice) AS sum_price;
      out = ORDER a BY cust;
      """)),

    // PigMix L8 shape [R: test/perf/pigmix/src/pig/L8.pig]: GROUP ALL —
    // global aggregate, one partial per partition then a single merge
    "q73_pigmix_l8" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      g  = GROUP li ALL;
      a  = FOREACH g GENERATE COUNT(li) AS n,
             (double) SUM((bigdecimal) li.l_quantity) AS sum_qty,
             (double) SUM((bigdecimal) li.l_extendedprice) AS sum_price;
      out = FOREACH a GENERATE n, sum_qty, sum_price / n AS avg_price;
      """)),

    // PigMix L13 shape [R: test/perf/pigmix/src/pig/L13.pig]: LEFT
    // OUTER join through the front-end; unmatched rows surface as the
    // bincond's null branch (okey1 = 0)
    "q74_pigmix_l13" -> ((s, dir) => pig(s, dir, """
      c = LOAD 'customer.parquet';
      o = LOAD 'orders.parquet';
      j = JOIN c BY c_custkey LEFT OUTER, o BY o_custkey;
      f = FOREACH j GENERATE c_custkey, c_mktsegment,
            (o_orderkey IS NULL ? 0 : o_orderkey + 1) AS okey1;
      out = ORDER f BY c_custkey, okey1;
      """)),

    // PigMix L14 shape [R: test/perf/pigmix/src/pig/L14.pig]: JOIN
    // USING 'merge' through the front-end (compiled to sort-merge with
    // both sides' sort orders reusable — see ops/Bucketed)
    "q75_pigmix_l14" -> ((s, dir) => pig(s, dir, """
      li = LOAD 'lineitem.parquet';
      o  = LOAD 'orders.parquet';
      j  = JOIN li BY l_orderkey, o BY o_orderkey USING 'merge';
      g  = GROUP j BY o_orderstatus;
      a  = FOREACH g GENERATE group AS status, COUNT(j) AS n,
             (double) SUM((bigdecimal) j.l_extendedprice) AS sum_price;
      out = ORDER a BY status;
      """)),

    // PigMix L16 shape [R: test/perf/pigmix/src/pig/L16.pig]:
    // accumulator-style nested aggregation — per-group ORDER inside the
    // FOREACH block feeding a HOLISTIC median over the ordered bag (the
    // reference streams the sorted bag tuple-by-tuple into an
    // Accumulator UDF; here the ordered bag evaluates the holistic
    // function in-row — the Accumulator→Aggregator analog over grouped
    // rows is q57/q63)
    "q76_pigmix_l16" -> ((s, dir) => pig(s, dir, """
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      x = FOREACH g {
        srt = ORDER o BY o_totalprice;
        GENERATE group AS cust, COUNT(srt) AS n, MEDB(srt.o_totalprice) AS med,
                 MAX(srt.o_totalprice) AS max_price;
      };
      out = ORDER x BY cust;
      """,
      _.registerFunction("MEDB", cs => {
        import org.apache.spark.sql.functions.{array_sort, element_at, size => asize}
        val arr = array_sort(cs.head)
        val n = asize(arr)
        // odd n: both sides hit the same middle element; even: mean of
        // the two middles — DuckDB MEDIAN's convention
        (element_at(arr, ((n + 1) / 2).cast("int")) +
          element_at(arr, (n / 2).cast("int") + 1)) / 2.0
      })))
  )

  val oracleSql: Map[String, String] = Map(
    "q59_pig_mixed_sets" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
                    CAST(l_linenumber AS VARCHAR) AS lnum, l_quantity
                    FROM lineitem)
         SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         COALESCE(l_linestatus, 'ALL') AS ls,
         COALESCE(lnum, 'ALL') AS ln,
         SUM(CAST(l_quantity AS DOUBLE)) AS sum_qty, COUNT(*) AS n
         FROM li
         GROUP BY GROUPING SETS (
           (l_returnflag, l_linestatus, lnum),
           (l_returnflag, l_linestatus),
           (l_returnflag),
           (l_linestatus, lnum),
           (l_linestatus),
           ())
         ORDER BY rf, ls, ln""",
    "q60_pig_udf" ->
      """SELECT p_partkey, UPPER(TRIM(p_name)) AS nname,
         CAST(p_retailprice AS DOUBLE) * 2 + p_size AS margin
         FROM part ORDER BY p_partkey""",
    "q61_pig_order_using" ->
      """SELECT s_suppkey, s_name FROM supplier ORDER BY REVERSE(s_name)""",
    "q62_pig_distinct_agg" ->
      """SELECT l_returnflag AS rf, COUNT(DISTINCT l_linenumber) AS n_lines,
         COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY rf""",
    "q63_pig_agg_udf" ->
      """SELECT l_returnflag AS rf,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sumsq,
         MEDIAN(l_quantity) AS med, COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY rf""",
    "q54_pig_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
         SUM(CAST(l_quantity AS DOUBLE)) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q53_pig_nested" ->
      """WITH big AS (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_big
           FROM orders WHERE o_totalprice >= 100000.0)
         SELECT o_custkey AS cust, n_big, o_orderkey AS okey
         FROM big WHERE rn <= 2 ORDER BY cust, okey""",
    "q50_pig_join_agg" ->
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q51_pig_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
         GROUP BY 1 ORDER BY n DESC, word LIMIT 20""",
    "q52_pig_strings" ->
      """SELECT p_partkey, UPPER(p_name) AS uname,
         CAST(strpos(p_name, 'a') - 1 AS INTEGER) AS idx_a,
         SUBSTRING(p_name, 1, 6) AS sub6,
         CASE WHEN p_retailprice > 1500.0 THEN 'premium' ELSE 'standard' END AS tier
         FROM part
         WHERE p_size >= 25 AND regexp_full_match(p_name, '.*a.*')
         ORDER BY p_partkey""",
    "q70_pigmix_l1" ->
      """SELECT v, COUNT(*) AS n FROM (
           SELECT o_orderpriority AS v FROM orders
           UNION ALL SELECT o_orderstatus FROM orders) t
         GROUP BY 1 ORDER BY v""",
    "q71_pigmix_l6" ->
      """SELECT l_linenumber AS ln, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY ln""",
    "q72_pigmix_l7" ->
      """SELECT o_custkey AS cust, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY cust""",
    "q73_pigmix_l8" ->
      """SELECT COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
         FROM lineitem""",
    "q74_pigmix_l13" ->
      """SELECT c_custkey, c_mktsegment, COALESCE(o_orderkey + 1, 0) AS okey1
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey, okey1""",
    "q75_pigmix_l14" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY status""",
    "q76_pigmix_l16" ->
      """SELECT o_custkey AS cust, COUNT(*) AS n, MEDIAN(o_totalprice) AS med,
         MAX(o_totalprice) AS max_price
         FROM orders GROUP BY 1 ORDER BY cust"""
  )
}
