package graft

import graft.queries._
import graft.spark.{EncodePipeline, TokenTableGen}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY.md §2's operator inventory: the encoding layer
  * (E1-E9 as Spark-driven round-trips with identity oracles), dictionary
  * machinery (D1-D3 inside the dict round-trips + codec stats), the row
  * dataflow operators (R1-R17 as declarative Spark plans), and the
  * training-data pipeline ops (dedup, minhash/simhash, similarity search,
  * text analysis, multimodal plumbing).
  */
object SparkEntry {

  /** Flagship: the full encode→decode pipeline on a deterministic synth
    * token table, returning per-chunk metrics (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 2000, 4)
    val chunks = EncodePipeline.encode(src, numParts = 4, tokensPerChunk = 128 * 1024)
    chunks.map(c => (c.part_id, c.num_rows, c.num_tokens, c.tokens_codec,
        c.raw_bytes, c.enc_bytes))
      .toDF("part_id", "num_rows", "num_tokens", "tokens_codec", "raw_bytes", "enc_bytes")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- encoding layer round-trips (identity oracles) ---
    "q_rt_delta_long" -> ((s, d) => RoundTrips.deltaLong(s, d)),
    "q_rt_dict_string" -> ((s, d) => RoundTrips.dictString(s, d)),
    "q_rt_rle_int" -> ((s, d) => RoundTrips.rleInt(s, d)),
    "q_rt_pfor_int" -> ((s, d) => RoundTrips.pforInt(s, d)),
    "q_rt_fsst_text" -> ((s, d) => RoundTrips.fsstText(s, d)),
    "q_rt_dba_string" -> ((s, d) => RoundTrips.deltaByteArray(s, d)),
    "q_rt_bss_double" -> ((s, d) => RoundTrips.byteStreamSplit(s, d)),
    "q_rt_alp_double" -> ((s, d) => RoundTrips.alpDouble(s, d)),
    "q_rt_xor_double" -> ((s, d) => RoundTrips.xorDouble(s, d)),
    "q_rt_plain_long" -> ((s, d) => RoundTrips.plainInt(s, d)),
    "q_rt_tokens_pipeline" -> ((s, d) => RoundTrips.tokensPipeline(s, d)),
    "q_rt_tokens_zstd" -> ((s, d) => RoundTrips.tokensPipelineZstd(s, d)),
    "q_rt_tokens_snappy" -> ((s, d) => RoundTrips.tokensPipelineSnappy(s, d)),
    "q_rt_tokens_gzip" -> ((s, d) => RoundTrips.tokensPipelineGzip(s, d)),
    "q_rt_expr_sql" -> ((s, d) => RoundTrips.exprSqlRoundTrip(s, d)),
    "q_rt_nullable" -> ((s, d) => RoundTrips.nullableRoundTrip(s, d)),
    "q_rt_generic" -> ((s, d) => RoundTrips.genericRoundTrip(s, d)),
    "q_rt_generic_temporal" -> ((s, d) => RoundTrips.genericTemporalRoundTrip(s, d)),
    "q_rt_generic_arrays" -> ((s, d) => RoundTrips.genericArrays(s, d)),
    "q_generic_evolve" -> ((s, d) => RoundTrips.genericEvolve(s, d)),
    "q_rt_generic_struct" -> ((s, d) => RoundTrips.genericStruct(s, d)),
    "q_decode_project" -> ((s, d) => RoundTrips.decodeProject(s, d)),
    "q_generic_prune" -> ((s, d) => RoundTrips.genericPrune(s, d)),
    "q_zorder_prune" -> ((s, d) => RoundTrips.zorderPrune(s, d)),
    "q_auto_prune" -> ((s, d) => RoundTrips.autoPrune(s, d)),
    "q_generic_seek" -> ((s, d) => RoundTrips.genericSeek(s, d)),
    "q_generic_columnar" -> ((s, d) => RoundTrips.genericColumnar(s, d)),
    "q_search_token" -> ((s, d) => RoundTrips.searchToken(s, d)),
    "q_auto_search" -> ((s, d) => RoundTrips.autoSearch(s, d)),
    "q_rt_aligned" -> ((s, d) => RoundTrips.alignedRoundTrip(s, d)),
    "q_sql_table" -> ((s, d) => RoundTrips.sqlTable(s, d)),
    "q_streaming_ingest" -> ((s, d) => RoundTrips.streamingIngest(s, d)),
    "q_streaming_dedup" -> ((s, d) => RoundTrips.streamingDedup(s, d)),
    "q_streaming_window" -> ((s, d) => RoundTrips.streamingWindow(s, d)),
    "q_streaming_sliding" -> ((s, d) => RoundTrips.streamingSliding(s, d)),
    "q_streaming_join" -> ((s, d) => RoundTrips.streamingJoin(s, d)),
    "q_streaming_enrich" -> ((s, d) => RoundTrips.streamingEnrich(s, d)),
    "q_seek_rows" -> ((s, d) => RoundTrips.seekRows(s, d)),
    "q_compact_merge" -> ((s, d) => RoundTrips.compactMerge(s, d)),
    "q_compact_dedup" -> ((s, d) => RoundTrips.compactDedup(s, d)),
    "q_compact_binpack" -> ((s, d) => RoundTrips.compactBinPack(s, d)),
    "q_chunk_join" -> ((s, d) => RoundTrips.chunkJoin(s, d)),
    "q_token_index" -> ((s, d) => RoundTrips.tokenIndex(s, d)),
    "q_phrase_search" -> ((s, d) => RoundTrips.phraseSearch(s, d)),
    "q_token_index_incr" -> ((s, d) => RoundTrips.tokenIndexIncremental(s, d)),
    "q_snapshot_travel" -> ((s, d) => RoundTrips.snapshotTravel(s, d)),
    "q_snapshot_delete" -> ((s, d) => RoundTrips.snapshotDelete(s, d)),
    "q_snapshot_upsert" -> ((s, d) => RoundTrips.snapshotUpsert(s, d)),
    "q_snapshot_incr" -> ((s, d) => RoundTrips.snapshotIncremental(s, d)),
    "q_incr_mv" -> ((s, d) => RoundTrips.incrementalMv(s, d)),
    "q_bucketed_join" -> ((s, d) => RoundTrips.bucketedJoin(s, d)),
    "q_rt_generic_nested" -> ((s, d) => RoundTrips.genericNested(s, d)),
    "q_codec_stats" -> ((s, d) => RoundTrips.codecStats(s, d)),
    // --- relational / dataflow operators ---
    "q_filter" -> ((s, d) => Relational.filter(s, d)),
    "q_transform" -> ((s, d) => Relational.transform(s, d)),
    "q_dedupe" -> ((s, d) => Relational.dedupe(s, d)),
    "q_sort_limit" -> ((s, d) => Relational.sortLimit(s, d)),
    "q_union_merge" -> ((s, d) => Relational.unionMerge(s, d)),
    "q_convert" -> ((s, d) => Relational.convert(s, d)),
    "q_stats_minmax" -> ((s, d) => Relational.statsMinMax(s, d)),
    "q_rollup_stats" -> ((s, d) => Relational.rollupStats(s, d)),
    "q_heavy_hitters" -> ((s, d) => Relational.heavyHitters(s, d)),
    "q_hll_ndv" -> ((s, d) => Relational.hllNdv(s, d)),
    "q_cms_freq" -> ((s, d) => Relational.cmsFreq(s, d)),
    "q_bitmap_ndv" -> ((s, d) => Relational.bitmapNdv(s, d)),
    "q_quantiles" -> ((s, d) => Relational.quantileStats(s, d)),
    "q_json_extract" -> ((s, d) => Relational.jsonExtract(s, d)),
    "q_normalize_text" -> ((s, d) => TextOps.normalizeText(s, d)),
    "q_join_broadcast" -> ((s, d) => Relational.joinBroadcast(s, d)),
    "q_semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q_range_prune" -> ((s, d) => Relational.rangePrune(s, d)),
    "q_window" -> ((s, d) => Relational.window(s, d)),
    "q_event_window" -> ((s, d) => Relational.eventWindow(s, d)),
    "q_session_window" -> ((s, d) => Relational.sessionWindow(s, d)),
    "q_streaming_session" -> ((s, d) => RoundTrips.streamingSession(s, d)),
    "q_asof_join" -> ((s, d) => Relational.asofJoin(s, d)),
    "q_cube" -> ((s, d) => Relational.cubeStats(s, d)),
    "q_set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "q_pivot" -> ((s, d) => Relational.pivotLang(s, d)),
    "q_skew_join" -> ((s, d) => Relational.skewJoin(s, d)),
    "q_range_join" -> ((s, d) => Relational.rangeJoin(s, d)),
    // --- training-data pipeline ops ---
    "q_exact_dedup" -> ((s, d) => TextOps.exactDedup(s, d)),
    "q_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "q_token_count_bpe" -> ((s, d) => TextOps.tokenCountBpe(s, d)),
    "q_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    "q_langid" -> ((s, d) => TextOps.langId(s, d)),
    "q_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "q_multimodal_meta" -> ((s, d) => TextOps.multimodalMeta(s, d)),
    "q_multimodal_frames" -> ((s, d) => TextOps.multimodalFrames(s, d)),
    "q_simhash" -> ((s, d) => TextOps.simHash(s, d)),
    "q_simhash_neardup" -> ((s, d) => TextOps.simHashNearDup(s, d)),
    "q_minhash_lsh" -> ((s, d) => TextOps.minHashLsh(s, d)),
    "q_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccard(s, d)),
    "q_decontaminate" -> ((s, d) => TextOps.decontaminate(s, d)),
    "q_sample_stratified" -> ((s, d) => TextOps.sampleStratified(s, d)),
    "q_sample_reservoir" -> ((s, d) => TextOps.sampleReservoir(s, d)),
    "q_sample_weighted" -> ((s, d) => TextOps.sampleWeighted(s, d)),
    "q_pmi_bigrams" -> ((s, d) => TextOps.pmiBigrams(s, d)),
    "q_perplexity" -> ((s, d) => TextOps.perplexityLm(s, d)),
    "q_repetition" -> ((s, d) => TextOps.repetitionScore(s, d)),
    "q_train_shuffle" -> ((s, d) => TextOps.trainShuffle(s, d)),
    "q_top_tokens" -> ((s, d) => TextOps.topTokens(s, d)),
    "q_vocab_remap" -> ((s, d) => TextOps.vocabRemap(s, d)),
    "q_pack_sequences" -> ((s, d) => TextOps.packSequences(s, d)),
    "q_doc_chunks" -> ((s, d) => TextOps.docChunks(s, d)),
    "q_mix_sources" -> ((s, d) => TextOps.mixSources(s, d)),
    "q_dup_ngrams" -> ((s, d) => TextOps.dupNgrams(s, d)),
    "q_pii_redact" -> ((s, d) => TextOps.piiRedact(s, d)),
    "q_blocklist" -> ((s, d) => TextOps.blocklistFilter(s, d)),
    "q_doc_stats" -> ((s, d) => TextOps.docStats(s, d)),
    "q_dedup_cluster" -> ((s, d) => GraphOps.dedupCluster(s, d)),
    "q_bm25" -> ((s, d) => GraphOps.bm25(s, d)),
    "q_cosine_topk" -> ((s, d) => SimilarityOps.cosineTopK(s, d)),
    "q_lsh_ann" -> ((s, d) => SimilarityOps.lshAnn(s, d)),
    "q_ivf_ann" -> ((s, d) => SimilarityOps.ivfAnn(s, d)),
    "q_ivf_ann_q8" -> ((s, d) => SimilarityOps.ivfAnnQuantized(s, d)),
    "q_ivf_pq_ann" -> ((s, d) => SimilarityOps.ivfPqAnn(s, d)),
    "q_embedding_neardup" -> ((s, d) => SimilarityOps.embeddingNearDup(s, d))
  )

  /** DuckDB-runnable oracles. Round-trip queries get identity SELECTs —
    * the strongest possible check (per-value equality via the driver's
    * hash compare). Engine-internal ops (hash seeds, sketches, LSH) are
    * omitted → rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_rt_delta_long" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey",
    "q_rt_dict_string" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_rt_rle_int" ->
      "SELECT CAST(l_linenumber AS BIGINT) AS ln, count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_rt_pfor_int" ->
      "SELECT CAST(CASE WHEN l_orderkey % 97 = 0 THEN l_partkey + 1000000000 ELSE l_linenumber END AS BIGINT) AS v FROM lineitem ORDER BY v",
    "q_rt_fsst_text" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "q_rt_dba_string" ->
      "SELECT p_name FROM part ORDER BY p_name",
    "q_rt_bss_double" ->
      "SELECT l_extendedprice FROM lineitem ORDER BY l_extendedprice",
    "q_rt_alp_double" ->
      "SELECT l_extendedprice FROM lineitem ORDER BY l_extendedprice",
    // 1 + q/2^20 is exact IEEE arithmetic in both engines (q integral
    // <= 2^6, divisor a power of two), so the restatement is bit-exact
    "q_rt_xor_double" ->
      "SELECT 1.0 + l_quantity / 1048576.0 AS v FROM lineitem ORDER BY v",
    "q_rt_plain_long" ->
      "SELECT l_orderkey * 2654435761 + l_linenumber AS v FROM lineitem ORDER BY v",
    "q_rt_tokens_pipeline" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_rt_tokens_zstd" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_rt_tokens_snappy" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_rt_tokens_gzip" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_rt_expr_sql" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    // Nullable round-trip: NULLs must survive the chunk bitmaps exactly;
    // Spark sorts NULLS FIRST on ascending keys, restated explicitly for
    // DuckDB (whose default is NULLS LAST).
    "q_rt_nullable" ->
      """SELECT lpad(CAST(l_orderkey AS VARCHAR), 10, '0') || '-' || lpad(CAST(l_linenumber AS VARCHAR), 4, '0') AS doc_id,
        |       CASE WHEN l_discount > 0.08 THEN -1 ELSE 2 END AS n_tok,
        |       CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS source,
        |       CASE WHEN l_discount > 0.08 THEN NULL ELSE CAST(l_linenumber + floor(l_quantity) AS BIGINT) END AS tok_sum
        |FROM lineitem
        |ORDER BY doc_id, n_tok, source NULLS FIRST, tok_sum NULLS FIRST""".stripMargin,
    "q_rt_generic" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS flag,
        |       l_discount > 0.05 AS discounted,
        |       CAST(l_linenumber + floor(l_quantity) AS BIGINT) AS pair_sum
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, pair_sum, discounted, flag NULLS FIRST""".stripMargin,
    // Array element values AND null slots restated positionally: l2 is
    // null every 3rd key, d2 every 5th — a dropped or shifted element
    // null in the rep/def bitmaps is a hash mismatch.
    "q_rt_generic_arrays" ->
      """SELECT o_orderkey,
        |       CAST(o_orderkey * 1000000007 AS BIGINT) AS l1,
        |       CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |            ELSE CAST(o_orderkey * 2 AS BIGINT) END AS l2,
        |       CAST(o_custkey AS BIGINT) AS l3,
        |       CAST(o_totalprice AS DOUBLE) AS d1,
        |       CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |            ELSE CAST(o_totalprice AS DOUBLE) / 2 END AS d2
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // Schema-evolving merge: v1 rows (c_custkey % 3 != 0) carry
    // float-rounded acctbal and a null c_name; v2 rows the reverse.
    "q_generic_evolve" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
        |       CASE WHEN c_custkey % 3 <> 0 THEN CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE)
        |            ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
        |       CASE WHEN c_custkey % 3 <> 0 THEN c_mktsegment END AS c_mktsegment,
        |       CASE WHEN c_custkey % 3 = 0 THEN c_name END AS c_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // Nested struct + map: every field restated flat, incl. null-struct
    // propagation ('de' docs) and null-map lookups (3-source subset).
    "q_rt_generic_struct" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CASE WHEN lang = 'de' THEN NULL ELSE lang END AS lang,
        |       CASE WHEN lang = 'de' THEN NULL ELSE n_chars END AS n_chars,
        |       CASE WHEN lang = 'de' THEN NULL ELSE CAST(n_chars > 200 AS BIGINT) END AS long_doc,
        |       CASE WHEN source IN ('src3','src7','src11') THEN NULL ELSE n_chars END AS p_chars,
        |       CASE WHEN source IN ('src3','src7','src11') THEN NULL ELSE length(lang) END AS p_langlen
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Sliding windows: each event belongs to exactly the 4 epoch-aligned
    // 15-minute slots covering it (k=0..3 back from its 15-min floor);
    // the streamed result must equal this batch restatement — the late
    // poisoned replay and the sentinel are absent from `events`, so any
    // leakage of either is a hash mismatch.
    "q_streaming_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |       count(*) AS cnt, min(value) AS min_v, max(value) AS max_v
        |FROM (
        |  SELECT make_timestamp(((CAST(floor(epoch(e.ts)/900) AS BIGINT) - k.k) * 900) * 1000000) AS ws,
        |         e.event_type, e.value
        |  FROM events e CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) k
        |) GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // Stream-stream interval join: every (click, purchase) pair by the
    // same user with the purchase 0-30 minutes after the click. The
    // batch self-join IS the semantics; the streamed run must equal it.
    "q_streaming_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "q_rt_generic_temporal" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_str,
        |       CAST(value AS FLOAT) AS fval,
        |       CAST(value * 2 AS FLOAT) AS f2
        |FROM events ORDER BY event_id, ts_str""".stripMargin,
    // Projected decode: only (doc_id, n_tok, source) are decoded — the
    // values must still match the full-fidelity restatement (doc_id is
    // unique, so the single ORDER BY key is total).
    "q_decode_project" ->
      """SELECT lpad(CAST(l_orderkey AS VARCHAR), 10, '0') || '-' || lpad(CAST(l_linenumber AS VARCHAR), 4, '0') AS doc_id,
        |       CASE WHEN l_discount > 0.08 THEN -1 ELSE 2 END AS n_tok,
        |       CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS source
        |FROM lineitem
        |ORDER BY doc_id, n_tok, source NULLS FIRST""".stripMargin,
    // Generic-chunk stats pruning: pruned+projected decode must equal the
    // plain range select (o_orderkey is unique).
    "q_generic_prune" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey BETWEEN 5000 AND 7000 ORDER BY o_orderkey",
    // Z-ordered layout: the two-sided box select is the oracle; the
    // Morton clustering only changes which chunks the scan touches.
    "q_zorder_prune" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_custkey BETWEEN 100 AND 300 AND o_orderkey BETWEEN 2000 AND 20000 " +
        "ORDER BY o_orderkey"),
    // Automatic filter→chunk-stats pushdown (no manual pruneRange): same
    // shape, the pruning comes from the optimizer rule.
    "q_auto_prune" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey BETWEEN 500 AND 900 ORDER BY o_orderkey",
    // Pruned token search: doc_ids (orders) whose token set (sorted
    // linenumbers) contains token 7.
    "q_search_token" ->
      "SELECT DISTINCT lpad(CAST(l_orderkey AS VARCHAR), 15, '0') AS doc_id FROM lineitem WHERE l_linenumber = 7 ORDER BY doc_id",
    // Same membership search, but via a plain .filter over the persisted
    // chunk table — pruning grown by the automatic pushdown rule.
    "q_auto_search" ->
      "SELECT DISTINCT lpad(CAST(l_orderkey AS VARCHAR), 15, '0') AS doc_id FROM lineitem WHERE l_linenumber = 7 ORDER BY doc_id",
    // Zero-shuffle aligned encode: identity restatement over documents.
    "q_rt_aligned" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |       CAST(n_chars + length(lang) AS BIGINT) AS tok_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Pure-SQL read over the registered chunk-table view: decode +
    // pushdown behind plain spark.sql; oracle restates the range select.
    "q_sql_table" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |       CAST(n_chars + length(lang) AS BIGINT) AS tok_sum
        |FROM documents
        |WHERE lpad(CAST(doc_id AS VARCHAR), 8, '0') >= '00000100'
        |  AND lpad(CAST(doc_id AS VARCHAR), 8, '0') < '00000300'
        |ORDER BY doc_id""".stripMargin,
    // Streaming ingest in 3 micro-batches must decode to the same identity.
    "q_streaming_ingest" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |       CAST(n_chars + length(lang) AS BIGINT) AS tok_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Streaming stateful dedup: re-ingested batches are dropped by the
    // fingerprint-keyed state, leaving exactly the base corpus.
    "q_streaming_dedup" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    // Watermarked streaming tumbling windows must equal the batch
    // restatement once every window is closed (UTC hour alignment).
    "q_streaming_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS cnt, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // Columnar-layout generic table: projected 2-of-4-column read + filter.
    "q_generic_columnar" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |       CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents WHERE n_chars >= 200 ORDER BY doc_id""".stripMargin,
    // Schema-generic SeekToRow: range-sorted generic chunk table, so the
    // row-offset read equals LIMIT/OFFSET over the doc_id order.
    "q_generic_seek" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang,
        |         CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents ORDER BY doc_id LIMIT 50 OFFSET 100)
        |ORDER BY doc_id""".stripMargin,
    // SeekToRow: the chunk table's canonical order is global doc_id order
    // (range partitions, within-chunk sort), so a row-offset read equals
    // LIMIT/OFFSET over the same ordering.
    "q_seek_rows" ->
      """SELECT doc_id, source, tok_sum FROM (
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, source,
        |         CAST(n_chars + length(lang) AS BIGINT) AS tok_sum
        |  FROM documents ORDER BY doc_id LIMIT 50 OFFSET 100)
        |ORDER BY doc_id""".stripMargin,
    // Sorted-run compaction: the merged table must decode to exactly the
    // union of the three runs (two disjoint + one overlapping).
    "q_compact_merge" ->
      """WITH rows AS (
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |         CAST(n_chars AS BIGINT) AS tok_sum
        |  FROM documents
        |  UNION ALL
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') || '-x', lang,
        |         CAST(n_chars AS BIGINT)
        |  FROM documents
        |  WHERE lpad(CAST(doc_id AS VARCHAR), 8, '0') >= '00000240'
        |    AND lpad(CAST(doc_id AS VARCHAR), 8, '0') < '00000260')
        |SELECT doc_id, source, tok_sum FROM rows ORDER BY doc_id""".stripMargin,
    // Dedupe-during-merge: run C re-ingests identical rows, so the
    // deduped compaction decodes to exactly the base corpus.
    "q_compact_dedup" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |       CAST(n_chars AS BIGINT) AS tok_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Bin packing rewrites bytes but never rows: the packed table must
    // decode to the same restatement (chunk-count collapse and bin
    // disjointness are asserted in-kernel).
    "q_compact_binpack" ->
      """SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang AS source,
        |       CAST(n_chars AS BIGINT) AS tok_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Repeated-group round-trip, restated relationally: one output row per
    // (doc, span position); null/empty arrays yield a single all-null span
    // row (posexplode_outer semantics). NULLS FIRST matches Spark's
    // ascending-sort default.
    "q_rt_generic_nested" ->
      """WITH k AS (SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS n FROM documents)
        |SELECT doc_id, CAST(NULL AS BIGINT) AS pos, CAST(NULL AS BIGINT) AS off,
        |       CAST(NULL AS VARCHAR) AS tag
        |FROM k WHERE doc_id % 11 = 0 OR n = 0
        |UNION ALL
        |SELECT k.doc_id, CAST(i.i - 1 AS BIGINT) AS pos,
        |       CASE WHEN i.i = 3 THEN NULL ELSE k.doc_id * 10 + i.i END AS off,
        |       CASE WHEN i.i IN (2, 3) THEN NULL
        |            ELSE k.lang || '-' || CAST(i.i AS VARCHAR) END AS tag
        |FROM k JOIN (SELECT unnest([1,2,3]) AS i) i ON i.i <= k.n
        |WHERE k.doc_id % 11 <> 0
        |ORDER BY doc_id, pos NULLS FIRST""".stripMargin,
    // Inverted-index token search: answer must equal the stats/bloom-pruned
    // searches (q_search_token / q_auto_search) — same oracle.
    "q_token_index" ->
      "SELECT DISTINCT lpad(CAST(l_orderkey AS VARCHAR), 15, '0') AS doc_id FROM lineitem WHERE l_linenumber = 7 ORDER BY doc_id",
    // Incrementally-maintained index must answer like a fresh one.
    "q_token_index_incr" ->
      "SELECT DISTINCT lpad(CAST(l_orderkey AS VARCHAR), 15, '0') AS doc_id FROM lineitem WHERE l_linenumber = 3 ORDER BY doc_id",
    // Phrase search: the oracle checks the WORDS (no token-id hash in
    // sight), so a pass proves the engine's hashed-id index + positional
    // predicate answer the word-level question exactly.
    "q_phrase_search" ->
      """WITH w AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |                  list_filter(string_split(text, ' '), x -> x != '') AS ws
        |           FROM documents)
        |SELECT doc_id FROM w
        |WHERE len(ws) >= 2
        |  AND len(list_filter(range(1, len(ws)), i -> ws[i] = 'table' AND ws[i+1] = 'scan')) > 0
        |ORDER BY doc_id""".stripMargin,
    // Snapshot time travel: v1 committed before slice B was appended, so
    // the v1 read is slice A only; latest (v2) is both. The oracle
    // restates the two manifests relationally.
    "q_snapshot_travel" ->
      """WITH d AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |                  lang AS source, CAST(1 AS BIGINT) AS n_tok,
        |                  doc_id AS raw_id
        |           FROM documents)
        |SELECT 1 AS snap, doc_id, source, n_tok FROM d WHERE raw_id % 2 = 0
        |UNION ALL
        |SELECT 2 AS snap, doc_id, source, n_tok FROM d
        |ORDER BY snap, doc_id""".stripMargin,
    // Row-level delete + compaction: snap 1 = pre-delete (full table),
    // snap 2 = equality delete in effect (merge-on-read), snap 3 = the
    // compacted rewrite (same rows, new files). Relational restatement.
    "q_snapshot_delete" ->
      """WITH d AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |                  lang AS source, CAST(1 AS BIGINT) AS n_tok
        |           FROM documents)
        |SELECT 1 AS snap, doc_id, source, n_tok FROM d
        |UNION ALL
        |SELECT 2 AS snap, doc_id, source, n_tok FROM d WHERE source <> 'de'
        |UNION ALL
        |SELECT 3 AS snap, doc_id, source, n_tok FROM d WHERE source <> 'de'
        |ORDER BY snap, doc_id""".stripMargin,
    // Bucketed co-located join: the join itself is exchange-free (both
    // sides bucket-laid-out on the key); the oracle is the plain
    // relational restatement.
    "q_bucketed_join" ->
      """SELECT o.o_custkey, count(*) AS n_items,
        |       sum(l.l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_custkey
        |ORDER BY o.o_custkey""".stripMargin,
    // Incremental change feed: tag 2 = rows appended v1->v2 (doc_id%3=1
    // slice), tag 3 = v2->v3 (%3=2), tag 4 = v1->v4 which spans the
    // lang='de' delete, so 'de' rows drop out of the wider feed.
    "q_snapshot_incr" ->
      """WITH d AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |                  lang AS source, CAST(1 AS BIGINT) AS n_tok,
        |                  doc_id AS raw_id
        |           FROM documents)
        |SELECT 2 AS snap, doc_id, source, n_tok FROM d WHERE raw_id % 3 = 1
        |UNION ALL
        |SELECT 3 AS snap, doc_id, source, n_tok FROM d WHERE raw_id % 3 = 2
        |UNION ALL
        |SELECT 4 AS snap, doc_id, source, n_tok FROM d
        |WHERE raw_id % 3 IN (1, 2) AND source <> 'de'
        |ORDER BY snap, doc_id""".stripMargin,
    // MERGE-style upsert: snap 1 = base table; snaps 2 and 3 = after the
    // atomic upsert ('fr' docs rewritten to source 'fr2', 40 new docs at
    // doc_id+50000000), merge-on-read and post-compaction respectively.
    "q_snapshot_upsert" ->
      """WITH d AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |                  lang AS source, CAST(1 AS BIGINT) AS n_tok
        |           FROM documents),
        |after AS (
        |  SELECT doc_id, CASE WHEN source = 'fr' THEN 'fr2' ELSE source END AS source, n_tok FROM d
        |  UNION ALL
        |  (SELECT lpad(CAST(doc_id + 50000000 AS VARCHAR), 8, '0'), 'new', CAST(1 AS BIGINT)
        |   FROM documents ORDER BY doc_id LIMIT 40))
        |SELECT 1 AS snap, doc_id, source, n_tok FROM d
        |UNION ALL SELECT 2 AS snap, doc_id, source, n_tok FROM after
        |UNION ALL SELECT 3 AS snap, doc_id, source, n_tok FROM after
        |ORDER BY snap, doc_id""".stripMargin,
    // Chunk-aligned merge join: the engine joins the encoded table against
    // the probe set riding the layout; the oracle restates it as a plain
    // relational join (duplicate probe keys fan out — inner semantics).
    "q_chunk_join" ->
      """WITH probe AS (
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
        |         CAST(n_chars AS BIGINT) AS weight
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0'),
        |         CAST(n_chars + 1000000 AS BIGINT)
        |  FROM documents WHERE doc_id % 91 = 0)
        |SELECT r.doc_id, r.lang AS source, CAST(1 AS BIGINT) AS n_tok, p.weight
        |FROM (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id, lang
        |      FROM documents) r
        |JOIN probe p ON r.doc_id = p.doc_id
        |ORDER BY r.doc_id, weight""".stripMargin,
    "q_filter" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 49.0 AND l_discount > 0.05 ORDER BY l_orderkey, l_linenumber",
    "q_transform" ->
      "SELECT o_orderkey, upper(o_orderpriority) AS pri, CAST(length(o_orderpriority) AS BIGINT) AS pri_len, CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders ORDER BY o_orderkey",
    "q_dedupe" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
    "q_union_merge" ->
      "SELECT key, side FROM (SELECT c_custkey AS key, 'customer' AS side FROM customer UNION ALL SELECT s_suppkey AS key, 'supplier' AS side FROM supplier) ORDER BY key, side",
    "q_convert" ->
      "SELECT CAST(l_orderkey AS VARCHAR) AS okey_str, CAST(l_linenumber AS BIGINT) AS ln, CAST(floor(l_quantity) AS BIGINT) AS qty_int FROM lineitem ORDER BY okey_str, ln, qty_int",
    "q_stats_minmax" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, CAST(sum(l_linenumber) AS BIGINT) AS sum_ln, min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    // The MG sketch with k > |domain| degrades to exact counting, so the
    // plain GROUP BY restates it bit-for-bit.
    "q_heavy_hitters" ->
      "SELECT event_type AS item, count(*) AS cnt FROM events GROUP BY event_type ORDER BY cnt DESC, item",
    // HLL++ in its exact (sparse) regime: domain bounded at 1000 by the
    // modulo, below the 2^14/4 switch point, so count(DISTINCT) restates
    // it bit-for-bit.
    "q_hll_ndv" ->
      "SELECT event_type, count(DISTINCT user_id % 1000) AS ndv_users FROM events GROUP BY event_type ORDER BY event_type",
    // Exact GROUP BY restatement: the 5-string domain vs width 256 is
    // collision-free (data-volume independent), so the sketch is exact.
    "q_cms_freq" ->
      "SELECT event_type AS item, count(*) AS est FROM events GROUP BY event_type ORDER BY item",
    // Roaring bitmap segments are a lossless set, so the two-level
    // (event_type, day) -> event_type rollup is exactly
    // count(DISTINCT); n_segments = the per-day segment count.
    "q_bitmap_ndv" ->
      """SELECT event_type, count(DISTINCT user_id) AS ndv_users,
        |       count(DISTINCT CAST(ts AS DATE)) AS n_segments
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // NFC: JDK Normalizer and DuckDB's utf8proc implement the same
    // Unicode canonical composition, so the planted decomposed
    // sequences compose identically (n_norm = n_raw - 2 per doc).
    "q_normalize_text" ->
      """WITH r AS (SELECT doc_id,
        |                  text || ' cafe' || chr(769) || ' pin' || chr(771) || 'ata' AS raw
        |           FROM documents),
        |n AS (SELECT doc_id, nfc_normalize(lower(raw)) AS norm, length(raw) AS n_raw FROM r)
        |SELECT doc_id, norm, md5(norm) AS fp, length(norm) AS n_norm, n_raw
        |FROM n ORDER BY doc_id""".stripMargin,
    // Exact-regime quantile summary == the ceil(q*n) window rank
    // (CAST AS DOUBLE so both engines take the identical IEEE product).
    "q_quantiles" ->
      """WITH r AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v,
        |                  row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |                  count(*) OVER (PARTITION BY lang) AS cnt
        |           FROM documents)
        |SELECT lang,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)) THEN v END) AS p50,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.9 AS DOUBLE) * cnt) AS BIGINT)) THEN v END) AS p90,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.99 AS DOUBLE) * cnt) AS BIGINT)) THEN v END) AS p99
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q_rollup_stats" ->
      """SELECT COALESCE(source, '<all>') AS source, COALESCE(lang, '<all>') AS lang,
        |       count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY source, lang""".stripMargin,
    "q_join_broadcast" ->
      "SELECT n_name, count(*) AS cnt, min(c_acctbal) AS min_bal FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q_semi_join" ->
      "SELECT o_orderstatus, count(*) AS cnt FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q_range_prune" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000 ORDER BY o_orderkey",
    "q_window" ->
      "SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn",
    "q_event_window" ->
      "SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS cnt, min(value) AS min_v, max(value) AS max_v FROM events GROUP BY event_type, hr ORDER BY event_type, hr",
    // Gaps-and-islands restatement of session_window: a new session
    // starts when the gap from the previous event is STRICTLY more than
    // 4h (Spark merges windows when next start <= current end, so an
    // exact-4h gap extends the session); end = last event + gap.
    "q_session_window" ->
      """WITH d AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d
        |)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |       strftime(max(ts) + INTERVAL 4 HOUR, '%Y-%m-%d %H:%M:%S') AS sess_end,
        |       count(*) AS n_events, min(value) AS min_v, max(value) AS max_v
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    // Streaming session windows must equal the batch gaps-and-islands
    // restatement exactly (same merge-at-boundary semantics; the late
    // poisoned replay and the unfinalized sentinel are both absent).
    "q_streaming_session" ->
      """WITH d AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d
        |)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |       strftime(max(ts) + INTERVAL 4 HOUR, '%Y-%m-%d %H:%M:%S') AS sess_end,
        |       count(*) AS n_events, min(value) AS min_v, max(value) AS max_v
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    // Native ASOF restatement of the union+carry-forward plan.
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       c.value AS last_click_v
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_cube" ->
      """SELECT lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,
    "q_set_ops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-08'),
        |     p AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08')
        |SELECT 'both' AS tag, user_id FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'click_only' AS tag, user_id FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
        |ORDER BY tag, user_id""".stripMargin,
    "q_pivot" ->
      """SELECT source,
        |  CAST(coalesce(sum(CASE WHEN lang = 'de' THEN 1 END), 0) AS BIGINT) AS de,
        |  CAST(coalesce(sum(CASE WHEN lang = 'en' THEN 1 END), 0) AS BIGINT) AS en,
        |  CAST(coalesce(sum(CASE WHEN lang = 'es' THEN 1 END), 0) AS BIGINT) AS es,
        |  CAST(coalesce(sum(CASE WHEN lang = 'fr' THEN 1 END), 0) AS BIGINT) AS fr,
        |  CAST(coalesce(sum(CASE WHEN lang = 'zh' THEN 1 END), 0) AS BIGINT) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Full recompute over the final state — the incremental folds (and
    // the delete's retraction) must be indistinguishable from it.
    "q_incr_mv" ->
      """SELECT lang AS source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang <> 'de'
        |GROUP BY lang ORDER BY source""".stripMargin,
    // The unsalted restatement: salting is provably result-invariant
    // (each fact row meets exactly one dim replica).
    "q_skew_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS u_events FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, d.u_events
        |FROM events e JOIN dim d USING (user_id)
        |WHERE e.event_id % 5 = 0 ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """WITH r AS (SELECT event_type AS range_type, min(ts) AS lo,
        |                  min(ts) + INTERVAL 6 HOUR AS hi
        |           FROM events GROUP BY event_type)
        |SELECT r.range_type, count(*) AS hits,
        |       count(DISTINCT e.event_type) AS n_types
        |FROM events e JOIN r
        |  ON e.ts >= r.lo AND e.ts <= r.hi AND e.event_type <> r.range_type
        |GROUP BY r.range_type ORDER BY r.range_type""".stripMargin,
    "q_streaming_enrich" ->
      """WITH dim AS (SELECT event_type, count(*) AS type_count
        |             FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, d.type_count
        |FROM events e JOIN dim d USING (event_type)
        |WHERE e.event_id % 11 = 0 ORDER BY e.event_id""".stripMargin,
    // Recursive-CTE label propagation over the SAME deterministic edge
    // set: every node collects every reachable label (UNION dedups, so
    // the recursion is finite) and keeps the minimum — the component id
    // the distributed star-contraction must agree with.
    "q_dedup_cluster" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT a.doc_id AS s, b.doc_id AS t
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
        |  UNION ALL
        |  SELECT a.doc_id, b.doc_id
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id * 2 AND b.doc_id > a.doc_id
        |), e AS (SELECT s, t FROM e0 UNION SELECT t, s FROM e0),
        |lab(n, l) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.t, lab.l FROM lab JOIN e ON e.s = lab.n
        |)
        |SELECT n AS doc_id, min(l) AS component FROM lab
        |GROUP BY n ORDER BY doc_id""".stripMargin,
    // Same constants, same parse-level literals (2.2, 1.2, 0.25, 0.75),
    // ln == Spark's natural log; round(6) absorbs summation-order ulps.
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, text, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
        |words AS (SELECT doc_id, dl, unnest(string_split(text, ' ')) AS term FROM d),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM words
        |       WHERE term IN ('hash', 'merge', 'spark') GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT tf.doc_id,
        |       round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
        |             * (tf.tf * 2.2)
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 6) AS bm25,
        |       count(*) AS n_terms
        |FROM tf JOIN df USING (term) CROSS JOIN stats
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q_exact_dedup" ->
      "SELECT min(doc_id) AS keep_id, count(*) AS copies FROM documents GROUP BY text ORDER BY keep_id",
    "q_token_count" ->
      "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id",
    // BPE-style pre-tokenizer class counts; the regex is plain character
    // classes, identical under Java regex (Spark) and RE2 (DuckDB).
    "q_token_count_bpe" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_word,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_mark,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST((length(text) - length(replace(text, '.', ''))) AS BIGINT) AS n_dots, CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS n_the, CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE) / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS avg_word_len FROM documents ORDER BY doc_id",
    "q_langid" ->
      "SELECT doc_id, CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS en_hits, CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS de_hits, CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS BIGINT) AS es_hits, CAST((length(text) - length(replace(text, ' le ', ''))) / 4 AS BIGINT) AS fr_hits, CASE WHEN (length(text) - length(replace(text, ' the ', ''))) / 5 >= (length(text) - length(replace(text, ' der ', ''))) / 5 AND (length(text) - length(replace(text, ' the ', ''))) / 5 >= (length(text) - length(replace(text, ' el ', ''))) / 4 AND (length(text) - length(replace(text, ' the ', ''))) / 5 >= (length(text) - length(replace(text, ' le ', ''))) / 4 AND (length(text) - length(replace(text, ' the ', ''))) / 5 > 0 THEN 'en' WHEN (length(text) - length(replace(text, ' der ', ''))) / 5 >= (length(text) - length(replace(text, ' el ', ''))) / 4 AND (length(text) - length(replace(text, ' der ', ''))) / 5 >= (length(text) - length(replace(text, ' le ', ''))) / 4 AND (length(text) - length(replace(text, ' der ', ''))) / 5 > 0 THEN 'de' WHEN (length(text) - length(replace(text, ' el ', ''))) / 4 >= (length(text) - length(replace(text, ' le ', ''))) / 4 AND (length(text) - length(replace(text, ' el ', ''))) / 4 > 0 THEN 'es' WHEN (length(text) - length(replace(text, ' le ', ''))) / 4 > 0 THEN 'fr' ELSE 'other' END AS guess FROM documents ORDER BY doc_id",
    "q_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    // 64-bit SimHash recomputed from scratch: per-token hash is DuckDB's
    // md5_number_lower (LE low 8 MD5 digest bytes — the Spark side reads
    // the same bytes), bit votes summed per (doc, bit), signature bit set
    // iff vote > 0. Bit 63 is the sign bit of the signed BIGINT output.
    "q_simhash" ->
      """WITH tok AS (
        |  SELECT d.doc_id, t.tok
        |  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)
        |  WHERE t.tok <> ''),
        |votes AS (
        |  SELECT doc_id, bb.b AS b,
        |         SUM(CASE WHEN (md5_number_lower(tok) >> CAST(bb.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM tok, (SELECT UNNEST(range(64)) AS b) bb
        |  GROUP BY doc_id, bb.b),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN vote > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INT)) END
        |           ELSE 0 END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
        |FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // All-pairs hamming <= 3 over the planted corpus (identical copy at
    // +10^6, one-token edit at +2*10^6): the banded LSH + exact-hamming
    // rerank must equal this set (pigeonhole over 4x16-bit bands makes
    // recall at hamming<=3 deterministic).
    "q_simhash_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' x' AS text FROM documents WHERE doc_id % 10 = 0),
        |tok AS (
        |  SELECT c.doc_id, t.tok
        |  FROM corpus c, UNNEST(string_split(c.text, ' ')) AS t(tok)
        |  WHERE t.tok <> ''),
        |votes AS (
        |  SELECT doc_id, bb.b AS b,
        |         SUM(CASE WHEN (md5_number_lower(tok) >> CAST(bb.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM tok, (SELECT UNNEST(range(64)) AS b) bb
        |  GROUP BY doc_id, bb.b),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN vote > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INT)) END
        |           ELSE 0 END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id),
        |full_sig AS (
        |  SELECT c.doc_id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
        |  FROM corpus c LEFT JOIN sig s ON s.doc_id = c.doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM full_sig a JOIN full_sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_multimodal_meta" ->
      "SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes FROM documents ORDER BY doc_id",
    // Frame sampling over the payload bytes; the corpus is ASCII so
    // VARCHAR slicing hashes the same bytes the Spark side slices as
    // binary. Sampled frames sit at original index 4k (byte offset 64k),
    // complete iff 64k+16 <= len.
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         md5(string_agg(substring(text, CAST(64 * k + 1 AS INT), 16), '' ORDER BY k)) AS fp,
        |         count(*) AS n_sampled
        |  FROM (SELECT doc_id, text,
        |          unnest(range(0, CASE WHEN length(text) >= 16 THEN (length(text) - 16) // 64 + 1 ELSE 0 END)) AS k
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(length(d.text) // 16 AS INT) AS n_frames,
        |       CAST(COALESCE(f.n_sampled, 0) AS INT) AS n_sampled,
        |       COALESCE(f.fp, md5('')) AS fp
        |FROM documents d LEFT JOIN f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Exact cosine top-20 vs the min-vec_id query vector; double-precision
    // accumulation in index order matches the Spark kernel bit-for-bit at
    // 6dp rounding.
    "q_cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings ORDER BY vec_id LIMIT 1)
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos
        |FROM embeddings ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    // ANN oracles: the ANN queries assert recall@20 == 1.0 internally and
    // return the top-20 over the needle-planted corpus, so the oracle is
    // the exact top-20 over the same corpus (scaled copies of the query
    // vector => cosine rounds to 1.0 in both engines).
    "q_lsh_ann" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 1000000 + t.j AS vec_id,
        |         list_transform((SELECT qe FROM q), x -> x * CAST(1.0 + 0.01 * (t.j + 1) AS FLOAT)) AS embedding
        |  FROM range(30) t(j))
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qe FROM q) AS DOUBLE[])), 6) AS cos
        |FROM corpus ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    "q_ivf_ann" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 1000000 + t.j AS vec_id,
        |         list_transform((SELECT qe FROM q), x -> x * CAST(1.0 + 0.01 * (t.j + 1) AS FLOAT)) AS embedding
        |  FROM range(30) t(j))
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qe FROM q) AS DOUBLE[])), 6) AS cos
        |FROM corpus ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    // Int8-quantized IVF: coarse integer scoring over the 4x-smaller
    // index + exact rerank of the candidates — same exact top-20.
    "q_ivf_ann_q8" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 1000000 + t.j AS vec_id,
        |         list_transform((SELECT qe FROM q), x -> x * CAST(1.0 + 0.01 * (t.j + 1) AS FLOAT)) AS embedding
        |  FROM range(30) t(j))
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qe FROM q) AS DOUBLE[])), 6) AS cos
        |FROM corpus ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    // IVF-PQ: 8-byte/vector codes index, asymmetric-distance coarse pass
    // (broadcast LUT, no float vector math), exact rerank of the coarse
    // top-100 — same exact top-20 as the full-precision IVF probe.
    "q_ivf_pq_ann" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 1000000 + t.j AS vec_id,
        |         list_transform((SELECT qe FROM q), x -> x * CAST(1.0 + 0.01 * (t.j + 1) AS FLOAT)) AS embedding
        |  FROM range(30) t(j))
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qe FROM q) AS DOUBLE[])), 6) AS cos
        |FROM corpus ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    // Near-dup pairs are exactly the planted scaled copies: natural
    // pairwise cosine tops out at ~0.51 on this corpus, far below the 0.9
    // threshold, and a scaled copy rounds to cosine 1.0 in both engines.
    "q_embedding_neardup" ->
      """SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b, CAST(1.0 AS DOUBLE) AS cos
        |FROM embeddings WHERE vec_id % 10 = 0 ORDER BY vec_a, vec_b""".stripMargin,
    // All-pairs exact 5-gram Jaccard >= 0.8 over the planted corpus: the
    // LSH + exact-rerank result must equal this set (collision prob for a
    // qualifying pair is 1-(1-s^4)^32 > 0.9999999 at s=0.8).
    "q_minhash_lsh" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text || ' mutated tail marker' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |g AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, substring(text, CAST(unnest(range(1, length(text) - 3)) AS INT), 5) AS sh
        |    FROM corpus)),
        |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |i AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
        |  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b,
        |       round(CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni), 6) AS jaccard
        |FROM i JOIN s sa ON sa.doc_id = i.doc_a JOIN s sb ON sb.doc_id = i.doc_b
        |WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Exact 5-gram Jaccard for adjacent doc pairs (2k, 2k+1) — the FNV
    // shingle hashes on the Spark side are collision-free at this scale,
    // so hash-set Jaccard equals substring-set Jaccard.
    "q_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, substring(text, CAST(unnest(range(1, length(text) - 3)) AS INT), 5) AS sh
        |    FROM documents)),
        |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |i AS (
        |  SELECT a.doc_id AS doc_a, count(*) AS ni
        |  FROM g a JOIN g b ON a.sh = b.sh AND b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0
        |  GROUP BY 1)
        |SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
        |       round(CAST(COALESCE(i.ni, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(i.ni, 0)), 6) AS jaccard
        |FROM s sa JOIN s sb ON sb.doc_id = sa.doc_id + 1 AND sa.doc_id % 2 = 0
        |LEFT JOIN i ON i.doc_a = sa.doc_id
        |ORDER BY doc_a""".stripMargin,
    // Decontamination: word 3-grams (ws[i:i+2] is the 1-based inclusive
    // 3-element slice) of the eval slice doc_id % 97 == 0 vs the rest.
    "q_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
        |      FROM w, UNNEST(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i)),
        |e AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(DISTINCT g) AS n_hit_grams
        |FROM g WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM e)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Seeded-hash stratified sample: lowercase-hex md5 prefixes compare
    // lexicographically identically in both engines.
    "q_sample_stratified" ->
      """SELECT doc_id, lang, substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |FROM documents
        |WHERE substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |      CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN '80' WHEN 'es' THEN 'c0'
        |                WHEN 'fr' THEN '20' WHEN 'zh' THEN '60' ELSE 'zz' END
        |ORDER BY doc_id""".stripMargin,
    // Fixed-size per-stratum sample: the engine's bounded GroupTopK
    // aggregate must equal the full window-rank restatement exactly
    // (top-k is a mergeable summary — exact, not a sketch).
    "q_sample_reservoir" ->
      """SELECT lang, skey, doc_id FROM (
        |  SELECT lang, doc_id, md5('rsv7:' || CAST(doc_id AS VARCHAR)) AS skey,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5('rsv7:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 5 ORDER BY lang, skey""".stripMargin,
    // Sequential Poisson weighted sample: rank key = integer u*(8/w)
    // (u = md5_number_lower, w a power-of-two tier weight), exact on
    // both engines via HUGEINT/decimal arithmetic — no float ordering.
    "q_sample_weighted" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |         lpad(CAST(CAST(md5_number_lower('esw11:' || CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |              * CASE WHEN n_chars >= 800 THEN 1 WHEN n_chars >= 400 THEN 2
        |                     WHEN n_chars >= 200 THEN 4 ELSE 8 END AS VARCHAR), 22, '0') AS skey
        |  FROM documents)
        |SELECT lang, skey, doc_id FROM (
        |  SELECT lang, skey, doc_id,
        |         row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rn
        |  FROM t) s
        |WHERE rn <= 4 ORDER BY lang, skey""".stripMargin,
    // PMI collocations: identical multiply/divide shape both sides,
    // round(6) absorbs ln() last-ulp differences (BM25 precedent).
    "q_pmi_bigrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS w FROM w),
        |uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
        |b AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |      FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        |bc AS (SELECT w1, w2, count(*) AS cnt FROM b GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bc.w1, bc.w2, bc.cnt,
        |       round(ln(CAST(bc.cnt AS DOUBLE) * nu.n * nu.n
        |             / (CAST(nb.n AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
        |FROM bc
        |JOIN uc u1 ON bc.w1 = u1.w
        |JOIN uc u2 ON bc.w2 = u2.w
        |CROSS JOIN (SELECT count(*) AS n FROM u) nu
        |CROSS JOIN (SELECT count(*) AS n FROM b) nb
        |ORDER BY w1, w2""".stripMargin,
    // Bigram-LM cross-entropy (CCNet-style perplexity filter): the ln()
    // argument is one division of exact integer sums on both sides so the
    // doubles agree bit-for-bit; round(6) absorbs avg() summation order.
    "q_perplexity" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |      FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
        |cc AS (SELECT w1, count(*) AS cw FROM b GROUP BY 1),
        |v AS (SELECT count(DISTINCT u.w) AS v
        |      FROM (SELECT unnest(ws) AS w FROM w) u)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |       round(avg(ln(CAST(cc.cw + v.v AS DOUBLE) / (bc.cb + 1))), 6)
        |         AS cross_entropy
        |FROM b
        |JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        |JOIN cc ON b.w1 = cc.w1
        |CROSS JOIN v
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "q_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bg
        |      FROM w, UNNEST(range(1, greatest(len(ws) - 1, 0) + 1)) AS t(i)),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bigram,
        |       round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS rep_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_train_shuffle" ->
      """SELECT doc_id, md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key""".stripMargin,
    "q_top_tokens" ->
      """SELECT t.tok AS tok, count(*) AS cnt
        |FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)
        |WHERE t.tok <> ''
        |GROUP BY t.tok ORDER BY cnt DESC, tok LIMIT 50""".stripMargin,
    // Vocabulary remap: top-256 words by (count desc, token asc) get ids
    // 0..255, everything else -1. The rank cut is a total order, so the
    // vocab — and therefore every remapped id — is deterministic.
    "q_vocab_remap" ->
      """WITH toks AS (
        |  SELECT d.doc_id, t.tok
        |  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)
        |  WHERE t.tok <> ''),
        |vocab AS (
        |  SELECT tok, rn - 1 AS tok_id FROM (
        |    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
        |    FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok))
        |  WHERE rn <= 256)
        |SELECT t.doc_id, t.tok, COALESCE(v.tok_id, -1) AS tok_id
        |FROM toks t LEFT JOIN vocab v USING (tok)
        |ORDER BY doc_id, tok_id, tok""".stripMargin,
    // Sequence packing: global token offsets in the seeded training
    // order, sequences cut every 256 tokens. The oracle restates the
    // bucketed two-phase prefix sum as one flat ordered cumsum.
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT AS n_tokens,
        |    md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
        |o AS (SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS token_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(token_offset AS BIGINT) AS token_offset,
        |  CAST(token_offset // 256 AS BIGINT) AS first_seq,
        |  CAST((token_offset + n_tokens - 1) // 256 AS BIGINT) AS last_seq
        |FROM o ORDER BY doc_id""".stripMargin,
    // Context-window chunking: 16-token windows every 8 tokens; DuckDB
    // list slices are 1-based inclusive so [s+1 : s+16] == Spark
    // slice(toks, s+1, 16).
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, 8)) AS st FROM t)
        |SELECT doc_id, (st // 8)::BIGINT AS chunk_idx,
        |  len(toks[st + 1 : st + 16])::BIGINT AS n_chunk_tokens,
        |  array_to_string(toks[st + 1 : st + 16], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    // Weighted corpus mixing: epochs-per-source replication, integer
    // part guaranteed, fractional half-epoch via the seeded md5 bucket
    // (lowercase-hex compare is byte-identical in both engines).
    "q_mix_sources" ->
      """WITH t AS (SELECT doc_id, source, CAST(source[4:] AS INT) AS n,
        |    substring(md5('mix13:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |    (CASE WHEN n % 4 >= 2 THEN 2 ELSE 1 END
        |     + CASE WHEN n % 2 = 1 AND bucket < '80' THEN 1 ELSE 0 END) AS n_copies
        |  FROM t)
        |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
        |  CAST(ci AS BIGINT) AS copy_idx
        |FROM c, UNNEST(generate_series(0, n_copies - 1)) AS u(ci)
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // Duplicate 8-token windows across distinct docs; DuckDB list slices
    // are 1-based inclusive so toks[s+1 : s+8] == Spark slice(toks,s+1,8).
    "q_dup_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT DISTINCT doc_id, md5(array_to_string(toks[s + 1 : s + 8], ' ')) AS h
        |  FROM t, UNNEST(generate_series(0, len(toks) - 8)) AS g(s)
        |  WHERE len(toks) >= 8),
        |d AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2)
        |SELECT doc_id, count(*)::BIGINT AS n_dup_windows
        |FROM w JOIN d USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // PII redaction: both engines plant the identical synthetic email +
    // phone, then count/redact with the same character-class regexes
    // (Java regex on the Spark side, RE2 here; 'g' = global replace).
    "q_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_blocklist" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE source NOT IN ('src4', 'src7', 'src13')
        |ORDER BY doc_id""".stripMargin,
    "q_doc_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(avg(n_chars), 6) AS avg_chars,
        |       round(quantile_cont(n_chars, 0.5), 6) AS med_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin
  )
}
