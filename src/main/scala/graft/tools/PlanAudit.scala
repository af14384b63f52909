package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Regenerates PLANS.md: the formatted physical plans of the headline
  * queries, post-AQE where a collect finalizes adaptive planning. Run
  * after operator changes so the committed plan audit never drifts:
  * `sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.001 PLANS.md"`.
  */
object PlanAudit {
  private val headline = Seq(
    "q02_filter_project", // pushdown + pruning
    "q05_star_join",      // broadcast dims
    "q07_topk",           // TakeOrderedAndProject
    "q13_minhash_lsh",    // band equi-join
    "q15_jaccard",        // capped inverted index, windows, no broadcast hint
    "q16_knn",            // vec_dot codegen + WindowGroupLimit
    "q17_embed_pairs",    // block equi-join, no BNLJ
    "q28_knn_lsh",        // multi-table probes, broadcast query side only
    "q45_asof_join",      // single-shuffle union+window
    "q46_range_join",     // binned equi-join
    "q50_image_knn",      // decoded-raster features through exact kNN
    "q52_sample",         // pure per-row hash filter, no shuffle
    "q53_tfidf",          // two partial aggs + broadcast corpus count
    "q57_training_corpus", // flagship: dedup ∘ quality ∘ decontam ∘ sample
    "q59_incr_dedup",     // anti-join against history's fingerprint set
    "q64_asof_native",    // custom exec: pruned scans, one exchange/side
    "q68_contamination",  // distinct-gram semi-join, benchmark broadcast
    "q70_pack_sequences", // single (lang, shard) window shuffle
    "q72_salted_sum",     // two-phase salted aggregation
    "q73_salted_join",    // replicated-small-side salted join
    "q84_bucketed_join",  // pre-shuffled bucketed inputs, agg-only exchange
    "q85_winnow_pairs",   // per-row winnowed fingerprints, capped equi-join
    "q92_funnel",         // chained min-ts joins, shrinking per-stage state
    "q95_event_paths",    // per-user collect+sort, sliding array expansion
    "q97_collocations",   // two token aggs + broadcast total
    "q98_containment",    // q15 machinery with the min() denominator
    "q100_training_corpus_v2", // flagship v2: + winnow edges, priority tail
    "q101_domain_cap",    // one stratum shuffle + running rank, no sort
    "q102_vocab",         // corpus-sized partial agg, vocab-sized window
    "q104_dedup_best",    // struct-max argmax, single aggregation
    "q105_incremental_ingest", // O(batch) ingest: anti-join + band join + cap
    "q106_keyword_search", // broadcast query terms, partial agg, top-k
    "q107_ngram_novelty", // gram-keyed left join + one aggregation
    "q108_source_overlap", // cluster-keyed self-join over (cluster, source)
    "q110_split_leakfree", // labels + per-row hash CASE, no extra shuffle
    "q111_sketch_artifact", // sketch-merge agg over artifact + batch rows
    "q112_zorder",        // broadcast bounds + codegen'd bit interleave
    "q113_label_centroids", // explode + one (label, dim) partial agg
    "q114_kmeans_step",   // broadcast seeds, per-row argmin, bounded agg
    "q116_hybrid_search", // broadcast query tokens, bounded rank lists
    "q117_kmeans",        // three rounds, each broadcast + map + agg
    "q118_pagerank",      // fact joins → bounded edges; tiny rank joins
    "q119_centroid_outliers", // map-literal centroids, per-row distance
    "q120_postings_artifact", // bucket-pruned artifact probe
    "q122_bloom_join",    // sketch-filtered fact side before the exchange
    "q123_winsorize",     // value-histogram percentiles, broadcast clamp
    "q124_vocab_encode",  // trimmed vocab broadcast onto the token stream
    "q126_constraints",   // all row checks in one scan + bounded audits
    "q130_gapfill",       // per-key calendar explode, one window shuffle
    "q131_scd2",          // two windows sharing one sort+shuffle
    "q132_profile",       // k-column profile as one Expand scan
    "q133_delta_join",    // delta terms only — no old⋈old recompute
    "q134_digest",        // shuffle-free partial-agg xor+sum digest
    "q135_incr_clusters", // probe of the incrementally-merged labels
    "q136_ivfpq_artifact", // reloaded compound index, cell-pruned probe
    "q137_band_artifact", // stored+appended bands, self-join candidates
    "q138_stream_clusters", // streamed merges' fixed point, probed
    "q139_compact_artifact", // compacted layout, identical probe plan
    "q140_shuffle_shards", // one hash exchange, no range partitioning
    "q142_artifact_dedup_apply", // stored labels joined, no CC recompute
    "q143_corpus_shards", // flagship tail: split projection + shard window
    "q144_mixture_sample", // budget-bounded map-side WindowGroupLimit
    "q145_char_budget_mix", // per-domain prefix window (documented exception)
    "q146_shard_artifact", // persisted exceptAll legs over the shard table
    "q147_shard_digest_audit", // per-(split,shard) digest, narrow output
    "q148_bpe_fit",       // one word-type partial agg + driver merge loop
    "q149_bpe_encode",    // broadcast-model mapPartitions, no shuffle
    "q150_bpe_pack",      // encode + single (lang, shard) window shuffle
    "q152_cost_budget_thinned", // hash pre-thin ahead of the prefix window
    "q155_span_dedup",    // fingerprint-only exchanges, no text shuffled
    "q156_bigram_lm",     // broadcast pruned LM, map-side scoring
    "q157_bpe_fertility", // encode pass + domain-key partial agg
    "q160_bpe_pretok_encode", // stored-artifact mapPartitions, no shuffle
    "q161_corpus_manifest", // q143's plan + one roll-up aggregation
    "q162_dsir_weights",  // four broadcast model joins, one roll-up
    "q163_training_corpus_v3", // v2's plan + broadcast LM gate join
    "q164_stupid_backoff", // five broadcast count joins, one roll-up
    "q165_dsir_select",   // q162 weights + bounded-k TakeOrdered tail
    "q166_pii_detect",    // pure regexp projection, zero exchanges
    "q167_pii_redact",    // ordered regexp_replace chain, zero exchanges
    "q168_url_blocklist", // domain extract + broadcast blocklist join
    "q169_redacted_corpus", // v3 selection once, scrub on topK join rows
    "q170_lm_floor",      // q156 pass + histogram-sized percentile window
    "q172_html_extract",  // regex extraction chain, zero exchanges
    "q173_html_outlinks", // posexplode + broadcast blocklist join
    "q174_url_canonical_dedup", // one shuffle, on the canonical key
    "q175_crawl_ingest",  // extraction + inlined-blocklist verdict, no join
    "q177_crawl_corpus",  // crawl stages + v3 gates on checkpointed extract
    "q178_url_key_artifact", // key-set probe: one join on canon
    "q180_host_rank",     // bounded edge set, vocabulary-sized rounds
    "q182_trained_gate",  // broadcast-literal model, per-row dot product
    "q184_warc_ingest",   // split/frame/verify + extraction, zero exchanges
    "q185_trained_flagship", // q177's plan, gate literals from the fit
    "q186_warc_corpus",   // framing projection ahead of q177's plan
    "q187_crawl_frontier", // canon shuffle + broadcast rank + group limit
    "q188_rank_artifact",  // gated artifact reload, vocabulary-sized scan
    "q189_param_canonical", // two window passes; conservative pair shares one sort
    "q190_robots_gate",    // broadcast rule sets, per-row verdict, no exchange
    "q191_polite_frontier", // q187's plan, candidates thinned by the gate
    "q192_stream_crawl_loop", // per-batch q191 + O(batch) key append
    "q193_fit_eval",       // one scan, all rounds' cells as bounded aggs
    "q194_anchor_terms",   // projection + explodes, one partial-agg exchange
    "q195_crawl_funnel",   // one link agg + key stages + tiny assembly joins
    "q196_refetch_wave",   // canon struct-max + broadcast rank + capped window
    "q197_sitemap_seeds",  // vocabulary-sized seeds through the frontier tail
    "q198_wave_schedule",  // q191's plan + one broadcast delay join (parsed delays)
    "q199_robots_parse",   // vocab-sized parse: split/filter/extract projection
    "q200_fetchlog_artifact", // artifact-read due set: reduced scan + rank + cap
    "q201_anchor_frontier", // polite wave + anchor score join, re-ranked cap
    "q202_steady_refetch", // per-wave artifact-read due set + schedule
    "q203_stream_warc_loop", // per-batch frame+gate projections, then q192's wave
    "q204_fetch_funnel",   // one frame+gate scan into one bounded aggregation
    "q205_redirect_frontier", // both discovery channels under one candidate exchange
    "q206_gzip_warc",      // mapPartitions inflate + the q184 projection chain
    "q207_carried_schedule", // two waves + broadcast state joins, no new exchange class
    "q208_stream_robots_loop", // q203 + vocabulary-sized per-wave robots parse
    "q209_compacted_fetchlog", // q200 read side over the compacted layout
    "q210_stream_gzip_loop", // binary wire format inflated in-stream
    "q211_retry_frontier", // second bucketed anti-join, TTL-pruned attempt scan
    "q212_content_encoding", // one fused http_frame projection, zero exchanges
    "q213_conditional_refetch", // pinned seed wave + bucketed log upsert + argmax read
    "q214_stream_retry_loop", // per-wave framed persist + attempt-stamped frontier
    "q215_sitemap_tree",   // vocabulary-sized walk + inflate into the frontier tail
    "q216_trap_guard",     // frontier plan with the per-row trap predicate inline
    "q217_body_length_check", // one fused http_frame projection, zero exchanges
    "q218_warc_revisit",  // artifact-read state + broadcast verdict join
    "q219_heuristic_refetch", // per-row date arithmetic + capped window
    "q220_sitemap_discovery", // decl-selected roots through the q215 walk
    "q221_redirect_chains", // bounded waves over the pinned 3xx edge table
    "q222_robots_availability", // vocab-sized mode algebra + broadcast gate
    "q223_sitemap_refetch", // bucket-pruned log scan + broadcast sitemap side
    "q224_unified_refetch", // three-signal CASE + one broadcast declared join
    "q225_feed_seeds",    // vocab-sized feed parse through the frontier tail
    "q226_warc_export",   // export projection + both re-ingest arms, no joins
    "q227_adaptive_refetch", // pruned version-store agg + capped window
    "q228_budgeted_frontier", // q191's plan + one broadcast budget join
    "q10_event_window")   // normalized-ts scan straight into windowed agg

  /** The round-14 regression's machine-checkable SIGNATURE (round-16
    * directive #6): the same expensive wire-decode subtree — a plan
    * node whose expressions contain `warc_records` or `http_frame` —
    * appearing MORE THAN ONCE in a single physical plan means some
    * consumer chain re-evaluates the framing instead of reading the
    * pinned batch (the localCheckpoint discipline). Returns the
    * duplicated canonical subtrees with their counts; empty = clean.
    *
    * Reuse nodes are NOT descended: a `ReusedExchange` (and a scan of
    * a checkpointed RDD, which canonicalizes to its own distinct leaf
    * per slice) is exactly the fix, not the disease. Duplicates over
    * DIFFERENT children canonicalize differently and never collide —
    * a union framing two distinct fixture slices is legitimate.
    */
  def duplicateFrameSubtrees(
      plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[(String, Int)] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case _ => p +: p.children.flatMap(flatten)
    }
    def hasFrame(p: SparkPlan): Boolean =
      p.expressions.exists(_.find {
        case _: graft.functions.HttpFrame => true
        case _: graft.functions.WarcRecords => true
        case _ => false
      }.isDefined)
    flatten(plan).filter(hasFrame)
      .groupBy(_.canonicalized)
      .collect { case (k, vs) if vs.size > 1 =>
        (vs.head.nodeName + ": " + k.simpleString(120), vs.size)
      }
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.tools.PlanAudit` over `$sfDir` ")
    sb.append("(plans are finalized post-AQE by executing each query once).\n\n")
    sb.append("Reading notes: BroadcastNestedLoopJoin appears ONLY where the\n")
    sb.append("broadcast side is bounded (the nQueries=5 query vectors in the\n")
    sb.append("exact kNN scorer) — the corpus streams once past it; no plan\n")
    sb.append("nest-loops or broadcasts an unbounded relation BY HINT. Other\n")
    sb.append("BroadcastExchanges at this tiny scale factor are AQE's runtime\n")
    sb.append("choice from measured sizes — at production scale AQE picks the\n")
    sb.append("shuffled join instead; PlanSpec asserts the plans stay hint-free\n")
    sb.append("so that freedom is real.\n\n")
    sb.append("Duplicate-subtree audit: EVERY registry query's executed plan\n")
    sb.append("is checked for the round-14 regression signature (the same\n")
    sb.append("warc_records/http_frame subtree evaluated more than once in\n")
    sb.append("one plan — see PlanAudit.duplicateFrameSubtrees); the run\n")
    sb.append("FAILS, and this file is not written, if any query trips it.\n")
    // the AUDIT runs over the FULL registry (the PLANS dump stays the
    // headline set); failures collect so one run reports them all
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val headlineSet = headline.toSet
    val dumped = scala.collection.mutable.Map[String, String]()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize adaptive plan
      duplicateFrameSubtrees(df.queryExecution.executedPlan).foreach {
        case (node, n) => failures += s"$name: $n× $node"
      }
      if (headlineSet.contains(name)) {
        dumped(name) = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
      }
    }
    headline.foreach { name =>
      dumped.get(name).foreach(plan =>
        sb.append(s"\n## $name\n\n```\n$plan```\n"))
    }
    if (failures.nonEmpty) {
      System.err.println("PLAN AUDIT FAILED — duplicated frame subtrees:")
      failures.foreach(f => System.err.println("  " + f))
      spark.stop()
      sys.exit(1)
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
