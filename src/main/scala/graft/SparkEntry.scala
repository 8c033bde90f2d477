package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, size}
import graft.operators.{DedupOps, RankDedup, Relational, TextOps, VectorOps}
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is an operator from SURVEY.md §2 expressed as an
  * idiomatic Spark pipeline; `oracleSql` carries the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables (sf0.01). Column names
  * and types are aligned on both sides; float outputs follow the rounding
  * policy documented in [[graft.operators.Relational]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY §7.3: orders-per-month-of-1995 (scan→filter→time-bucket→count). */
  def entry(spark: SparkSession): DataFrame =
    Relational.ordersPerMonth(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/2.2 scans, projections, filters
    "p1_scan_projection" -> Relational.scanProjection,
    "p2_derived_column" -> Relational.derivedColumn,
    "p3_conj_filter" -> Relational.conjFilter,
    "p5_in_list" -> Relational.inListFilter,
    "p6_ci_string" -> Relational.ciStringFilter,
    "p7_year_filter" -> Relational.yearFilter,
    "p9_row_slice" -> Relational.rowSlice,
    // §2.3 joins
    "j1_dim_join" -> Relational.dimJoin,
    "j2_temporal_join" -> Relational.temporalJoin,
    "j3_brand_revenue" -> Relational.brandRevenue,
    "j5_semi_join" -> Relational.semiJoin,
    "j6_anti_join" -> Relational.antiJoin,
    "j7_full_outer" -> Relational.fullOuterJoin,
    "w11_rank_family" -> Relational.rankFamily,
    // §2.4 aggregations
    "a1_group_multi_agg" -> Relational.groupMultiAgg,
    "a2_group_duration" -> Relational.groupDuration,
    "a3_orders_per_month" -> Relational.ordersPerMonth,
    "a4_group_mean" -> Relational.groupMean,
    "a5_global_stats" -> Relational.globalStats,
    "a6_percentiles" -> Relational.percentiles,
    "a7_column_profile" -> Relational.columnProfile,
    "a8_distinct_topk" -> Relational.distinctTopK,
    "a8_distinct_count" -> Relational.distinctCount,
    "a9_correlation" -> Relational.correlation,
    "a10_sum_over_groups" -> Relational.sumOverGroups,
    "a11_rollup" -> Relational.rollupAgg,
    "a12_pricing_summary" -> Relational.pricingSummary,
    "a13_cube" -> Relational.cubeAgg,
    "a14_grouping_sets" -> Relational.groupingSets,
    "a15_pivot" -> Relational.pivotTable,
    "f19_unpivot" -> Relational.unpivotMeasures,
    "w10_range_window" -> Relational.rangeWindow,
    // §2.5 windows
    "w1_moving_avg" -> Relational.movingAvg,
    "w2_pct_change" -> Relational.pctChange,
    "w3_cumsum" -> Relational.cumSum,
    "w4_dense_rerank" -> Relational.denseRerank,
    "w5_argmax_row" -> Relational.argmaxRow,
    "w5_top_month" -> Relational.topMonth,
    "w6_segmentation" -> Relational.segmentation,
    "w7_time_bucket" -> Relational.timeBucket,
    "w8_sessionize" -> Relational.sessionize,
    // §2.6 sorts / top-k
    "o1_multikey_sort" -> Relational.multiKeySort,
    "o2_latest_order" -> Relational.latestOrder,
    "o5_topk_orders" -> Relational.topKOrders,
    "o6_topk_per_group" -> Relational.topKPerGroup,
    // §2.7 set / dedup
    "d1_distinct_values" -> Relational.distinctValues,
    "d5_set_ops" -> Relational.setOps,
    // §2.8 scalar functions
    "f4_scalar_math" -> Relational.scalarMath,
    "f5_casts_nulls" -> Relational.castsAndNulls,
    "f6_string_ops" -> Relational.stringOps,
    "f12_json_extract" -> Relational.jsonExtract,
    "f15_base64" -> Relational.base64Roundtrip,
    "f16_array_agg" -> Relational.arrayAgg,
    "f17_null_ops" -> Relational.nullOps,
    // as-of join (temporal lookup extension of §2.3)
    "w9_asof_join" -> graft.operators.AsOfJoin.errorsAfterSignup,
    // §2.10 streaming batch-equivalent
    "s1_hourly_events" -> Relational.hourlyEvents,
    "s2_sliding_events" -> Relational.slidingEvents,
    "s3_session_window" -> Relational.sessionWindowAgg,
    // vector similarity (O3/O4/F10 + ANN scale path)
    "v1_cosine_topk" -> VectorOps.cosineTopK,
    "v2_ivf_topk" -> VectorOps.ivfTopK,
    "v3_neardup_embeddings" -> VectorOps.nearDupPairs,
    "v4_knn_join" -> VectorOps.knnJoin,
    "v5_kmeans_ivf" -> VectorOps.kmeansIvf,
    "v10_mmr_rerank" -> VectorOps.mmrRerank,
    "v5_ivf_assign" -> VectorOps.kmeansIvfAssign,
    "v6_rp_lsh_neardup" -> VectorOps.rpLshNearDup,
    "v7_ivf_at_rest" -> VectorOps.ivfAtRest,
    "v8_embed_clusters" -> VectorOps.embedClusters,
    "v9_sq8_topk" -> VectorOps.sq8TopK,
    "v12_sketch_neardup" -> VectorOps.sketchNearDup,
    "v13_semdedup_pairs" -> VectorOps.semDedupPairs,
    "v14_embed_retention" -> VectorOps.embedRetention,
    // text analysis (F6/F9 + pipeline ops)
    "h1_html_extract" -> TextOps.htmlExtract,
    "h2_web_curation" -> TextOps.webCuration,
    "t1_word_chunks" -> TextOps.wordChunks,
    "t2_lang_id" -> TextOps.langId,
    "t2_lang_id_scripts" -> TextOps.langIdScripts,
    "t3_quality_score" -> TextOps.qualityScore,
    "t4_fingerprint" -> TextOps.fingerprint,
    "t5_token_count" -> TextOps.tokenCount,
    "t5_bpe_token_count" -> TextOps.tokenCountBpe,
    "t6_stratified_sample" -> TextOps.stratifiedSample,
    "t7_decontamination" -> TextOps.decontamination,
    "t8_repetition" -> TextOps.repetition,
    "t9_pii_redaction" -> TextOps.piiRedaction,
    "t10_domain_caps" -> TextOps.domainCaps,
    "t11_sequence_pack" -> TextOps.sequencePack,
    "t12_split_assign" -> TextOps.splitAssign,
    "t13_perplexity" -> TextOps.perplexityFilter,
    "t14_cdc_chunks" -> TextOps.cdcChunks,
    "t15_shuffle_shard" -> TextOps.shuffleShard,
    "t16_bpe_train" -> TextOps.bpeTrain,
    "c2_mixture_weights" -> TextOps.mixtureWeights,
    "c3_quality_lr" -> TextOps.qualityLr,
    "c4_mixture_apply" -> TextOps.mixtureApply,
    "c5_curation_pipeline" -> TextOps.curationPipeline,
    "c9_quality_lr_train" -> TextOps.lrTrain,
    "c7_data_card" -> TextOps.dataCard,
    "c8_domain_card" -> TextOps.dataCardByDomain,
    // dedup pipeline (D-ops + MinHash/LSH/SimHash)
    "dd1_exact_dedup" -> DedupOps.exactDedup,
    "dd2_minhash_bands" -> DedupOps.minhashBands,
    "dd3_lsh_jaccard_pairs" -> DedupOps.lshJaccardPairs,
    "dd4_simhash" -> DedupOps.simhash,
    "dd5_rank_upsert" -> RankDedup.rankUpsertQuery,
    "dd6_simhash_pairs" -> DedupOps.simhashPairs,
    "dd7_dup_clusters" -> DedupOps.dupClusters,
    "dd8_cluster_retention" -> DedupOps.clusterRetention,
    "dd9_span_grams" -> DedupOps.spanGrams,
    "dd10_span_scrub" -> DedupOps.spanScrub,
    "c1_curation_funnel" -> DedupOps.curationFunnel,
    // multimodal plumbing (binary payload + typed metadata + stub decode)
    "mm1_media_features" -> ((s, d) => Multimodal.featureFrame(s, d)
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        size(col("embedding")).as("feature_dim"))),
    "mm2_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.mediaTable(s, d)).toDF()
        .select(col("media_id"), col("frame_idx"),
          org.apache.spark.sql.functions.md5(col("frame")).as("frame_md5"))),
  )

  /** Queries with no SQL-expressible oracle: the driver contract records a
    * weaker rows-only check for these; everything else MUST have an
    * oracleSql entry. EMPTY since round 10: the last member
    * (`v5_kmeans_ivf`) gained a real hash oracle once the Lloyd loop was
    * made bit-reproducible (integer-scaled component means +
    * round-before-argmax, VectorOps.kmeansCentroids) and the 3 fixed
    * iterations unrolled as chained CTEs (VectorOps.kmeansIvfOracle). */
  val rowsOnlyQueries: Set[String] = Set.empty

  def oracleSql: Map[String, String] = Map(
    "p1_scan_projection" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | l_extendedprice AS price FROM lineitem""".stripMargin,
    "p2_derived_column" ->
      """SELECT o_orderkey AS order_key,
        | round(o_totalprice * 0.92, 6) AS net_price,
        | round(o_totalprice / 1000.0, 6) AS price_k FROM orders""".stripMargin,
    "p3_conj_filter" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | l_quantity AS qty, l_extendedprice AS price FROM lineitem
        | WHERE l_quantity > 25 AND l_returnflag = 'R'
        | AND l_extendedprice IS NOT NULL""".stripMargin,
    "p5_in_list" ->
      """SELECT o_orderkey AS order_key, o_orderpriority AS priority
        | FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')""".stripMargin,
    "p6_ci_string" ->
      """SELECT c_custkey AS cust_key, c_name AS name FROM customer
        | WHERE lower(c_mktsegment) = 'building'""".stripMargin,
    "p7_year_filter" ->
      """SELECT o_orderstatus AS status, count(*) AS n FROM orders
        | WHERE year(o_orderdate) = 1995 GROUP BY o_orderstatus""".stripMargin,
    "p9_row_slice" ->
      """SELECT o_orderkey AS order_key, o_totalprice AS price FROM orders
        | ORDER BY o_orderkey LIMIT 5 OFFSET 25""".stripMargin,
    "j1_dim_join" ->
      """SELECT r_name AS region, count(*) AS n_cust,
        | round(sum(c_acctbal), 2) AS total_bal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""".stripMargin,
    "j2_temporal_join" ->
      """SELECT o.day, o.n_orders, l.n_ship, l.qty_ship FROM
        | (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |   FROM orders GROUP BY 1) o
        | JOIN
        | (SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_ship,
        |   sum(l_quantity) AS qty_ship FROM lineitem GROUP BY 1) l
        | ON o.day = l.day""".stripMargin,
    "j3_brand_revenue" ->
      """SELECT p_brand AS brand,
        | round(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
        |   * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000, 4) AS revenue,
        | count(*) AS n_items
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY p_brand""".stripMargin,
    "j5_semi_join" ->
      """SELECT c_custkey AS cust_key, c_mktsegment AS segment FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "j6_anti_join" ->
      """SELECT c_custkey AS cust_key, c_acctbal AS acctbal FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "j7_full_outer" ->
      """SELECT coalesce(o.day, l.day) AS day, o.n_orders, l.n_ship,
        | coalesce(o.n_orders, 0) + coalesce(l.n_ship, 0) AS activity FROM
        | (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |   FROM orders GROUP BY 1) o
        | FULL OUTER JOIN
        | (SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_ship
        |   FROM lineitem GROUP BY 1) l
        | ON o.day = l.day""".stripMargin,
    "w11_rank_family" ->
      """SELECT o_orderkey AS order_key, o_orderstatus AS status,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | round(percent_rank() OVER w, 6) AS prnk,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        | ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "a1_group_multi_agg" ->
      """SELECT l_orderkey AS order_key, min(l_shipdate) AS first_ship,
        | abs(max(l_extendedprice) - min(l_extendedprice)) AS price_spread,
        | avg(l_quantity) AS avg_qty,
        | round(sum(l_extendedprice), 2) AS total_price,
        | max(l_linenumber) AS max_line, count(*) AS n_lines
        | FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "a2_group_duration" ->
      """SELECT user_id,
        | (epoch_us(max(ts)) // 1000000) - (epoch_us(min(ts)) // 1000000) AS duration_s,
        | count(*) AS n_events FROM events GROUP BY user_id""".stripMargin,
    "a3_orders_per_month" ->
      """SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        | count(*) AS n FROM orders WHERE year(o_orderdate) = 1995
        | GROUP BY 1 ORDER BY month""".stripMargin,
    "a4_group_mean" ->
      """SELECT event_type, round(avg(value), 6) AS avg_value, count(*) AS n
        | FROM events GROUP BY event_type""".stripMargin,
    "a5_global_stats" ->
      """SELECT count(*) AS n, round(avg(o_totalprice), 6) AS mean_price,
        | round(stddev(o_totalprice), 4) AS sd_price,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        | round(quantile_cont(o_totalprice, 0.5), 6) AS median_price
        | FROM orders""".stripMargin,
    "a6_percentiles" ->
      """SELECT round(quantile_cont(l_quantity, 0.30), 6) AS p30,
        | round(quantile_cont(l_quantity, 0.50), 6) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        | round(quantile_cont(l_quantity, 0.90), 6) AS p90 FROM lineitem""".stripMargin,
    "a7_column_profile" ->
      """SELECT count(*) AS n_rows,
        | min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
        | avg(l_quantity) AS qty_mean,
        | CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_missing,
        | min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max,
        | round(avg(l_extendedprice), 6) AS price_mean,
        | CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_missing,
        | min(l_discount) AS disc_min, max(l_discount) AS disc_max,
        | round(avg(l_discount), 6) AS disc_mean
        | FROM lineitem""".stripMargin,
    "a8_distinct_topk" ->
      """SELECT c_mktsegment AS segment, count(*) AS cnt FROM customer
        | GROUP BY c_mktsegment ORDER BY cnt DESC, segment LIMIT 3""".stripMargin,
    "a8_distinct_count" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin,
    "a9_correlation" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(corr(l_discount, l_tax), 6) AS corr_disc_tax FROM lineitem""".stripMargin,
    "a10_sum_over_groups" ->
      """SELECT CAST(sum(n) AS BIGINT) AS total_1995 FROM (
        | SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        |  count(*) AS n FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1)""".stripMargin,
    "a11_rollup" ->
      """SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
        | sum(l_quantity) AS sum_qty, count(*) AS n FROM lineitem
        | GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "a12_pricing_summary" ->
      """SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
        | sum(l_quantity) AS sum_qty,
        | round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |   AS DOUBLE) / 100, 2) AS sum_base_price,
        | round(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
        |   * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000, 4) AS sum_disc_price,
        | avg(l_quantity) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a13_cube" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        | count(*) AS n,
        | round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS DOUBLE) / 100, 2) AS total FROM orders
        | GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "f15_base64" ->
      """SELECT doc_id, to_base64(CAST(text AS BLOB)) AS b64,
        | text AS roundtrip FROM documents""".stripMargin,
    "f16_array_agg" ->
      """SELECT l_orderkey AS order_key,
        | array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS line_nos,
        | CAST(count(*) AS INTEGER) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "f17_null_ops" ->
      """SELECT c_custkey AS cust_key,
        | nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_filled,
        | greatest(c_acctbal, 0.0) AS bal_floor0,
        | least(c_acctbal, 1000.0) AS bal_cap1k
        |FROM customer""".stripMargin,
    "a14_grouping_sets" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        | count(*) AS n,
        | round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS DOUBLE) / 100, 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "a15_pivot" ->
      """SELECT o_orderstatus AS status,
        | count(*) FILTER (o_orderpriority = '1-URGENT') AS p_urgent,
        | count(*) FILTER (o_orderpriority = '2-HIGH') AS p_high,
        | count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p_medium,
        | count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p_not_spec,
        | count(*) FILTER (o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "f19_unpivot" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        | FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        | FROM lineitem""".stripMargin,
    "w10_range_window" ->
      """WITH daily0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS total_c,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS day_n
        | FROM orders GROUP BY 1, 3),
        | daily AS (SELECT day, total_c, day_n,
        |  round(CAST(total_c AS DOUBLE) / 100.0, 2) AS total FROM daily0)
        |SELECT day, total, round(CAST(sum(total_c) OVER (ORDER BY day_n
        | RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0, 2)
        | AS total_7d
        |FROM daily""".stripMargin,
    "w9_asof_join" -> graft.operators.AsOfJoin.oracle,
    "w1_moving_avg" ->
      """WITH daily0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS total_c FROM orders GROUP BY 1),
        | daily AS (SELECT day, total_c,
        |  round(CAST(total_c AS DOUBLE) / 100.0, 2) AS total FROM daily0),
        | win AS (SELECT day, total,
        |  sum(total_c) OVER (ORDER BY day
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sc,
        |  count(total_c) OVER (ORDER BY day
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS cnt FROM daily)
        |SELECT day, total,
        | CAST((CAST(sc AS HUGEINT) * 10000) // cnt AS DOUBLE) / 1e6 AS ma7
        |FROM win""".stripMargin,
    "w2_pct_change" ->
      """WITH daily0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS total_c FROM orders GROUP BY 1),
        | lagd AS (SELECT day,
        |  round(CAST(total_c AS DOUBLE) / 100.0, 2) AS total,
        |  total_c, lag(total_c) OVER (ORDER BY day) AS prev_c FROM daily0)
        |SELECT day, total,
        | CASE WHEN prev_c IS NULL THEN NULL ELSE
        |  CAST((CASE WHEN total_c < prev_c THEN -1 ELSE 1 END) *
        |   ((abs(CAST(total_c AS HUGEINT) - prev_c) * 2000000 + prev_c)
        |    // (CAST(prev_c AS HUGEINT) * 2)) AS DOUBLE) / 1e6
        | END AS ret FROM lagd""".stripMargin,
    "w3_cumsum" ->
      """SELECT user_id, event_id, value,
        | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / 100.0 AS cum_value
        | FROM events""".stripMargin,
    "w4_dense_rerank" ->
      """WITH firsts AS (SELECT user_id, min(ts) AS first_ts FROM events
        | GROUP BY user_id)
        |SELECT user_id, first_ts,
        | CAST(dense_rank() OVER (ORDER BY first_ts, user_id) AS INTEGER) AS new_id
        | FROM firsts""".stripMargin,
    "w5_argmax_row" ->
      """SELECT o_orderkey AS order_key, o_totalprice AS price,
        | o_orderdate AS odate FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""".stripMargin,
    "w5_top_month" ->
      """SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        | count(*) AS n FROM orders WHERE year(o_orderdate) = 1995
        | GROUP BY 1 ORDER BY n DESC, month LIMIT 1""".stripMargin,
    "w6_segmentation" ->
      """WITH segs AS (SELECT user_id, event_id,
        |  floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / 50000.0) AS seg_raw
        |  FROM events)
        |SELECT user_id, event_id,
        | CAST(CASE WHEN seg_raw = max(seg_raw) OVER (PARTITION BY user_id)
        |  THEN NULL ELSE seg_raw END AS BIGINT) AS segment_id FROM segs""".stripMargin,
    "w7_time_bucket" ->
      """SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        | strftime(o_orderdate, '%B') AS month_name, count(*) AS n,
        | round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |  AS DOUBLE) / 100, 2) AS total FROM orders GROUP BY 1, 2""".stripMargin,
    "w8_sessionize" ->
      """WITH marked AS (SELECT user_id, ts, event_id,
        |  CASE WHEN (epoch_us(ts) // 1000000) -
        |   (epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |    // 1000000) > 1800 THEN 1 ELSE 0 END AS new_sess FROM events),
        | sess AS (SELECT user_id, ts,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        | (epoch_us(max(ts)) // 1000000) - (epoch_us(min(ts)) // 1000000) AS duration_s
        | FROM sess GROUP BY user_id, session_id""".stripMargin,
    "o1_multikey_sort" ->
      """SELECT l_returnflag AS rflag, l_quantity AS qty,
        | l_orderkey AS order_key, l_linenumber AS line_no FROM lineitem
        | ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber
        | LIMIT 50""".stripMargin,
    "o2_latest_order" ->
      """SELECT o_orderkey AS order_key, o_orderdate AS odate FROM orders
        | ORDER BY o_orderdate DESC, o_orderkey LIMIT 1""".stripMargin,
    "o5_topk_orders" ->
      """SELECT o_orderkey AS order_key, o_totalprice AS price FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "o6_topk_per_group" ->
      """SELECT * FROM (SELECT o_orderstatus AS status, o_orderkey AS order_key,
        |  o_totalprice AS price,
        |  CAST(row_number() OVER (PARTITION BY o_orderstatus
        |   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk FROM orders)
        | WHERE rk <= 3""".stripMargin,
    "d1_distinct_values" ->
      "SELECT DISTINCT o_orderpriority AS priority FROM orders",
    "d5_set_ops" ->
      """SELECT k, 'active' AS cls FROM
        | (SELECT c_custkey AS k FROM customer
        |  INTERSECT SELECT o_custkey AS k FROM orders)
        |UNION ALL
        |SELECT k, 'inactive' AS cls FROM
        | (SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey AS k FROM orders)""".stripMargin,
    "f4_scalar_math" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        | CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        | round(l_quantity / 7, 3) AS qty_sevenths,
        | round(l_extendedprice * l_discount, 6) AS disc_amt,
        | abs(l_quantity - 25) AS qty_dev,
        | CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
        | round(pow(l_discount, 2), 6) AS disc_sq FROM lineitem""".stripMargin,
    "f5_casts_nulls" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | CAST(l_quantity AS BIGINT) AS qty_int,
        | coalesce(l_returnflag, '?') AS rflag,
        | l_returnflag || '/' || l_linestatus AS flag_status FROM lineitem""".stripMargin,
    "f6_string_ops" ->
      """SELECT p_partkey AS part_key, lower(p_name) AS name_lc,
        | trim(p_name) AS name_trim, substr(p_type, 1, 6) AS type_prefix,
        | regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
        | regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num FROM part""".stripMargin,
    "f12_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events""".stripMargin,
    "s1_hourly_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        | FROM events GROUP BY 1, 2""".stripMargin,
    "s2_sliding_events" ->
      """SELECT w_start, w_start + INTERVAL '1 hour' AS w_end,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM (SELECT value,
        |  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
        |   AS w_start
        | FROM events CROSS JOIN UNNEST(range(0, 4)) AS t(k))
        |GROUP BY w_start""".stripMargin,
    // session_window semantics: an event with gap >= 30 min from its
    // predecessor starts a new session; window end = last event + 30 min.
    // Gap arithmetic in microseconds (event timestamps carry us precision).
    "s3_session_window" ->
      """WITH marked AS (SELECT user_id, ts, value,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |   THEN 1 ELSE 0 END AS new_sess FROM events),
        | sess AS (SELECT user_id, ts, value,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        | CAST(max(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    "v1_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | p AS (SELECT v AS p FROM e WHERE vec_id = 0)
        |SELECT vec_id, round(list_dot_product(v, p) /
        | (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))), 6) AS sim
        |FROM e, p WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "v2_ivf_topk" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        | p AS (SELECT v AS p FROM e WHERE vec_id = 1),
        | cent AS (SELECT label, list(cx ORDER BY i) AS c FROM (
        |   SELECT label, i, avg(v[i]) AS cx FROM e,
        |    LATERAL generate_series(1, 64) g(i) GROUP BY label, i)
        |  GROUP BY label),
        | top2 AS (SELECT cent.label FROM cent, p
        |  ORDER BY list_dot_product(c, p) /
        |   (sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(p, p))) DESC,
        |   label LIMIT 2)
        |SELECT e.vec_id, e.label, round(list_dot_product(e.v, p.p) /
        | (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.p, p.p))), 6) AS sim
        |FROM e JOIN top2 ON e.label = top2.label, p WHERE e.vec_id <> 1
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "v3_neardup_embeddings" -> VectorOps.nearDupPairsOracle,
    "v4_knn_join" -> VectorOps.knnJoinOracle,
    "v12_sketch_neardup" -> VectorOps.sketchNearDupOracle,
    "v13_semdedup_pairs" -> VectorOps.semDedupPairsOracle,
    "v14_embed_retention" -> VectorOps.embedRetentionOracle,
    "h1_html_extract" -> TextOps.oracle("h1_html_extract"),
    "h2_web_curation" -> TextOps.oracle("h2_web_curation"),
    "t1_word_chunks" -> TextOps.oracle("t1_word_chunks"),
    "t2_lang_id" -> TextOps.oracle("t2_lang_id"),
    "t2_lang_id_scripts" -> TextOps.oracle("t2_lang_id_scripts"),
    "t3_quality_score" -> TextOps.oracle("t3_quality_score"),
    "t4_fingerprint" -> TextOps.oracle("t4_fingerprint"),
    "t5_token_count" -> TextOps.oracle("t5_token_count"),
    "t5_bpe_token_count" -> TextOps.oracle("t5_bpe_token_count"),
    "t6_stratified_sample" -> TextOps.oracle("t6_stratified_sample"),
    "t7_decontamination" -> TextOps.oracle("t7_decontamination"),
    "t8_repetition" -> TextOps.oracle("t8_repetition"),
    "t9_pii_redaction" -> TextOps.oracle("t9_pii_redaction"),
    "t10_domain_caps" -> TextOps.oracle("t10_domain_caps"),
    "t11_sequence_pack" -> TextOps.oracle("t11_sequence_pack"),
    "t12_split_assign" -> TextOps.oracle("t12_split_assign"),
    "t13_perplexity" -> TextOps.oracle("t13_perplexity"),
    "t14_cdc_chunks" -> TextOps.oracle("t14_cdc_chunks"),
    "t15_shuffle_shard" -> TextOps.oracle("t15_shuffle_shard"),
    "t16_bpe_train" -> TextOps.oracle("t16_bpe_train"),
    "c7_data_card" -> TextOps.oracle("c7_data_card"),
    "c8_domain_card" -> TextOps.oracle("c8_domain_card"),
    "c2_mixture_weights" -> TextOps.oracle("c2_mixture_weights"),
    "c3_quality_lr" -> TextOps.oracle("c3_quality_lr"),
    "c4_mixture_apply" -> TextOps.oracle("c4_mixture_apply"),
    "c5_curation_pipeline" -> TextOps.oracle("c5_curation_pipeline"),
    "c9_quality_lr_train" -> TextOps.oracle("c9_quality_lr_train"),
    "dd1_exact_dedup" -> DedupOps.exactDedupOracle,
    "dd2_minhash_bands" -> DedupOps.minhashBandsOracle,
    "dd3_lsh_jaccard_pairs" -> DedupOps.lshJaccardPairsOracle,
    "dd4_simhash" -> DedupOps.simhashOracle,
    "dd5_rank_upsert" -> RankDedup.oracle,
    "dd6_simhash_pairs" -> DedupOps.simhashPairsOracle,
    "dd7_dup_clusters" -> DedupOps.dupClustersOracle,
    "dd8_cluster_retention" -> DedupOps.clusterRetentionOracle,
    "dd9_span_grams" -> DedupOps.spanGramsOracle,
    "dd10_span_scrub" -> DedupOps.spanScrubOracle,
    "c1_curation_funnel" -> DedupOps.curationFunnelOracle,
    "v5_ivf_assign" -> VectorOps.kmeansIvfAssignOracle,
    "v5_kmeans_ivf" -> VectorOps.kmeansIvfOracle,
    "v6_rp_lsh_neardup" -> VectorOps.rpLshNearDupOracle,
    "v7_ivf_at_rest" -> VectorOps.ivfAtRestOracle,
    "v8_embed_clusters" -> VectorOps.embedClustersOracle,
    "v9_sq8_topk" -> VectorOps.sq8TopKOracle,
    "v10_mmr_rerank" -> VectorOps.mmrRerankOracle,
    "mm1_media_features" ->
      """SELECT doc_id AS media_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |  ELSE 'video' END AS kind,
        | CAST(length(text) AS INTEGER) AS n_bytes,
        | sha256(text) AS checksum,
        | CAST(16 AS INTEGER) AS feature_dim
        |FROM documents""".stripMargin,
    // frames = 64-byte stride windows over the payload, kept if >= 32 bytes,
    // truncated to 32 (Multimodal.sampleFrames defaults); payload is the
    // ASCII text, so byte windows == substr windows.
    "mm2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
        | md5(substr(text, CAST(i*64+1 AS INTEGER), 32)) AS frame_md5
        |FROM documents
        | CROSS JOIN UNNEST(range(0, CAST(ceil(length(text)/64.0) AS BIGINT)))
        |  AS t(i)
        |WHERE length(text) - i*64 >= 32""".stripMargin,
  )
}
