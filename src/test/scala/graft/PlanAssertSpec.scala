package graft

import org.apache.spark.sql.DataFrame

/** Automated plan asserts for SCALING.md's headline claims — the ones
  * previously verified "by eye via graft.Explain". Each test fails if
  * a future change silently degrades the physical plan: top-k per
  * group losing the Spark 4 partial-top-k, global top-n regressing to
  * a global sort, scans losing pushdown/pruning, a dim join falling
  * off broadcast, or the single-shuffle partial-agg shape growing a
  * second exchange.
  */
class PlanAssertSpec extends SparkSpecBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("a5_topk_per_group plans as WindowGroupLimit (map-side partial top-k)") {
    val plan = planOf(q("a5_topk_per_group"))
    assert(plan.contains("WindowGroupLimit"), s"partial top-k lost:\n$plan")
  }

  test("p8/w3 global top-n plan as TakeOrderedAndProject, never a global sort") {
    for (name <- Seq("p8_limit_topn", "w3_global_topn_rank")) {
      val plan = planOf(q(name))
      assert(plan.contains("TakeOrderedAndProject"), s"$name lost partial top-n:\n$plan")
    }
  }

  test("p2 filter+projection reach the parquet scan (pushdown + pruning)") {
    val plan = planOf(q("p2_filter_project"))
    // predicate pushed to the scan...
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)"), s"filter not pushed:\n$plan")
    // ...and the scan reads only the referenced columns, not the table
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"column pruning lost: $readSchema")
  }

  test("j2 dim join stays broadcast (no shuffle join against a dim)") {
    val plan = planOf(q("j2_broadcast_dim_join"))
    assert(plan.contains("BroadcastHashJoin"), s"dim join fell off broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join shuffled:\n$plan")
  }

  test("q1 aggregation is partial (map-side combine, exactly one exchange)") {
    val plan = planOf(q("q1_agg"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"partial aggregation lost:\n$plan")
  }

  test("m1 relevance pair build broadcasts the question side (no cartesian)") {
    val plan = planOf(q("m1_relevance"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in pair build:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"question side not broadcast:\n$plan")
  }

  test("chunking and PII redaction are shuffle-free; packing uses exactly one exchange") {
    for (name <- Seq("x_chunk_docs", "x_pii_redact")) {
      // sort for output determinism is allowed; no hash exchange may appear
      val plan = planOf(q(name))
      assert(!plan.contains("Exchange hashpartitioning"), s"$name gained a shuffle:\n$plan")
    }
    val plan = planOf(q("x_pack_sequences"))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"packing needs exactly the per-shard window exchange:\n$plan")
  }

  test("tfidf top-k per doc plans as WindowGroupLimit") {
    val plan = planOf(q("x_tfidf_topterms"))
    assert(plan.contains("WindowGroupLimit"), s"tfidf lost partial top-k:\n$plan")
  }

  test("contamination and temperature-resample keep their dims broadcast") {
    for (name <- Seq("x_contamination", "x_resample_temperature")) {
      val plan = planOf(q(name))
      assert(plan.contains("BroadcastHashJoin"), s"$name dim join fell off broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$name shuffled a dim join:\n$plan")
    }
  }

  test("ANN kernels stay inside whole-stage codegen (dot_f32/quantize_i8 never fall back)") {
    // the round-3 lesson: kernel regressions must be visible in the
    // PLAN, not discovered in the bench. The native expressions
    // implement doGenCode, so the scoring stage must sit inside a
    // WholeStageCodegen span and the plan must reference the kernels.
    for (name <- Seq("x_ann_cosine_topk", "x_ann_int8_topk")) {
      val df = q(name)
      // AQE: codegen stage markers only appear in the FINAL executed
      // plan, and only collect() executes THIS QueryExecution
      // (count() builds a different one)
      df.collect()
      val plan = planOf(df)
      // in simple-string form a WholeStageCodegen stage prints as a
      // "*(n) " operator prefix
      assert(plan.contains("*("), s"$name lost codegen entirely:\n$plan")
      assert(plan.contains("dot_f32"), s"$name no longer uses the native dot kernel:\n$plan")
      // codegen fallback would surface as the expression evaluated
      // under an interpreted Project outside any codegen stage; the
      // cheap proxy is: every Project mentioning dot_f32 appears
      // under a WholeStageCodegen subtree marker (*(n) prefix)
      val badLines = plan.linesIterator.filter(l =>
        l.contains("dot_f32") && l.trim.startsWith("Project") && !l.contains("*(")).toSeq
      assert(badLines.isEmpty, s"$name dot_f32 outside codegen:\n${badLines.mkString("\n")}")
    }
    val dfQ = q("x_ann_int8_topk")
    dfQ.collect()
    val planQ = planOf(dfQ)
    assert(planQ.contains("quantize_i8"), s"int8 flavor lost the fused quantize kernel:\n$planQ")
  }

  test("x_dedup_exact groups through one exchange with map-side partials") {
    val plan = planOf(q("x_dedup_exact"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"exact dedup grew extra shuffles ($exchanges):\n$plan")
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"map-side combine lost:\n$plan")
  }

  test("kmv_distinct aggregates with map-side partial sketches") {
    // the sketch's whole point: partial_kmv_distinct below the
    // exchange, the k-hash synopsis on the wire — not the raw values
    val plan = planOf(q("x_sketch_distinct"))
    assert(plan.contains("partial_kmv_distinct"), s"partial sketch lost:\n$plan")
    val aggs = plan.linesIterator.count(l =>
      l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
    assert(aggs >= 2, s"two-phase sketch aggregation lost:\n$plan")
  }

  test("freq_topk aggregates with map-side partial summaries") {
    // ≤ k (item, count) pairs per group on the wire, not the domain
    val plan = planOf(q("x_freq_topk"))
    assert(plan.contains("partial_freq_topk"), s"partial MG summary lost:\n$plan")
  }

  test("j10 partitioned fact scan is dynamically pruned (DPP live, partitions-read metric)") {
    val df = q("j10_dpp_join")
    // DPP injected: the partitioned scan carries a runtime pruning
    // predicate fed by the filtered dim's broadcast
    val plan = planOf(df)
    assert(plan.contains("dynamicpruningexpression"),
      s"dynamic partition pruning not injected:\n$plan")
    df.collect()
    // and it actually pruned: the fact scan read only the dow==2 day
    // directories, not all of them
    val partitioned = fileScans(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty)
    assert(partitioned.nonEmpty, "no partitioned scan found in the executed plan")
    val scan = partitioned.head
    val read  = scan.metrics("numPartitions").value
    val total = scan.relation.location.listFiles(Nil, Nil).size
    assert(read > 0 && read < total,
      s"scan read $read of $total partitions — pruning did not bite")
  }

  test("x_editdist_join candidates come from an equi-join, never a nested loop") {
    val plan = planOf(q("x_editdist_join"))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"PassJoin blocking degraded to all-pairs:\n$plan")
  }

  test("x_dsir_select: dim-sized weight table joins broadcast, selection is TakeOrdered") {
    val plan = planOf(q("x_dsir_select"))
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-weight dim fell off broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 selection regressed to a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"totals cross-join must stay broadcast-nested-loop over one row:\n$plan")
  }

  test("x_mix_domains: the budget dim joins broadcast; one window per domain") {
    val plan = planOf(q("x_mix_domains"))
    assert(plan.contains("BroadcastHashJoin"),
      s"budget dim fell off broadcast:\n$plan")
    assert(plan.linesIterator.count(_.contains("- Window [")) === 1,
      s"mixture cut should be exactly one window pass:\n$plan")
  }

  test("x_ann_pq_topk: corpus never shuffles — only the skinny top-k window exchanges") {
    val df = q("x_ann_pq_topk")
    df.collect()
    val plan = planOf(df)
    // the codebook and query set ride broadcast nested-loop joins
    // (one-row / 5-row frames); the encode+ADC stage must not
    // repartition the corpus
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"PQ corpus side shuffled or went cartesian:\n$plan")
    // exactly one hash exchange: the (query_id, score) pairs feeding
    // the rank window (count the FINAL plan only — the AQE string
    // repeats the tree under "== Initial Plan ==")
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly one shuffle, got $exchanges:\n$finalPlan")
    assert(plan.contains("dot_f32"), s"PQ lost the native dot kernel:\n$plan")
  }

  test("x_shard_shuffle: exactly one shard Exchange, no global sort before the windows") {
    val plan = planOf(q("x_shard_shuffle"))
    // the only shuffle the layout pays is the write shuffle any
    // sharded output needs — hash on shard; position/offset ride the
    // per-shard windows behind it
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.count(_.contains("hashpartitioning(shard")) === 1,
      s"expected the single shard write shuffle:\n$finalPlan")
    // the trailing orderBy is the GATE's canonical presentation, not
    // the operator: the operator itself must not range-exchange
    assert(exchanges.count(_.contains("hashpartitioning")) === 1,
      s"layout grew an extra hash shuffle:\n$finalPlan")
  }

  test("x_shard_append: committed tail joins broadcast — the base corpus is never read") {
    // the gate query checkpoints its result (the one-materialization
    // contract), which truncates ITS visible plan to a Scan
    // ExistingRDD — so assert on the lazy assignment plan directly,
    // against a manifest built the same way the gate builds one
    import graft.ops.CorpusOps
    import org.apache.spark.sql.functions.col
    val d = GraftSession.table(spark, sf, "documents")
    val path = java.nio.file.Files.createTempDirectory("shard-plan").toString
    CorpusOps.writeShardManifest(d.filter(col("doc_id") % 9 =!= 4), "doc_id", "text", 8, path)
    val assignment = CorpusOps.shardAppendAssignment(spark, path,
      d.filter(col("doc_id") % 9 === 4), "doc_id", "text", "gate", 8)
    val plan = planOf(assignment)
    assert(plan.contains("BroadcastHashJoin"),
      s"shard-count manifest fell off broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"tail join shuffled — increment cost is no longer O(increment):\n$plan")
    // the base corpus is only ever read through the tiny manifest
    // counts: EXACTLY ONE scan of the documents table may appear (the
    // increment slice) — a second one means the fold re-read the base
    val docScans = fileScans(assignment.queryExecution.executedPlan)
      .count(_.relation.location.rootPaths.exists(_.toString.contains("documents")))
    assert(docScans === 1,
      s"expected exactly one documents scan (the increment), got $docScans:\n$plan")
  }

  test("x_sketch_bloom: probe side carries a broadcast map, never an explode-regroup") {
    val plan = planOf(q("x_sketch_bloom"))
    // probe = crossJoin against the one-row word map → BNLJ; the only
    // explode (positions) is on the BUILD side before its bit_or agg
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bloom word map fell off broadcast:\n$plan")
    // customer never partitions by a generated column: every exchange
    // is either the build-side word groupBy or the final segment agg
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(pos"))
    assert(!badExchange, s"probe side exploded positions into a shuffle:\n$plan")
  }

  test("x_retrieval_metrics: label join broadcasts query terms, no cartesian") {
    val plan = planOf(q("x_retrieval_metrics"))
    // the only corpus-scale pass is the tokenize feeding the retriever
    // and the label build; the query-term side must ride a broadcast —
    // a shuffled label join would re-partition the whole exploded
    // corpus on `term` just to meet 5 queries' vocabulary
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term label join fell off broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in the judge:\n$plan")
  }

  test("x_ann_recall_curve: one corpus scan feeds every probe cutoff") {
    val curve = q("x_ann_recall_curve")
    val plan  = planOf(curve)
    assert(!plan.contains("CartesianProduct"), s"cartesian in the curve:\n$plan")
    // the exact leg and the IVF leg each scan the embeddings corpus
    // once, plus the centroid/query dims (limit-16 / filter-5 slices).
    // The cutoff sweep must NOT multiply corpus scans — 5 cutoffs
    // ride one scored set. Allow the envelope: corpus-scale scans are
    // bounded by the number of LEGS (2) + dim slices, never by the
    // number of cutoffs (5).
    val embScans = fileScans(curve.queryExecution.executedPlan)
      .count(_.relation.location.rootPaths.exists(_.toString.contains("embeddings")))
    assert(embScans <= 6,
      s"curve multiplies corpus scans with cutoffs ($embScans embeddings scans):\n$plan")
  }

  test("x_fingerprint_winnow: selection folds in-array — zero window operators") {
    // the scaladoc claim made falsifiable: gram hashing and window
    // minima are per-row array folds; a Window operator here means
    // the selection regressed to a corpus-wide sort
    val plan = planOf(q("x_fingerprint_winnow"))
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows === 0, s"winnow selection regressed to a window:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), "winnow went cartesian")
  }

  test("x_dedup_span: winner selection and reassembly never go cartesian or window") {
    val plan = planOf(q("x_dedup_span"))
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows === 0, s"span winner/reassembly regressed to a window:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), "span dedup went cartesian")
  }

  test("x_quality_pipeline: the composed chain never goes cartesian") {
    // three chained stages (span dedup -> NB gate -> KN annotate)
    // compose joins from all three families; whatever join strategy
    // the sizes pick, a CartesianProduct anywhere means a stage lost
    // its equi-join key through the composition
    val plan = planOf(q("x_quality_pipeline"))
    assert(!plan.contains("CartesianProduct"),
      s"composed pipeline went cartesian:\n${plan.take(4000)}")
  }

  test("x_quality_curve: the threshold sweep adds no corpus scans") {
    val curve = q("x_quality_curve")
    val plan  = planOf(curve)
    // the NB scorer reads documents twice by construction (labeled
    // reference slice + scored corpus); the 11-point threshold grid
    // must ride the per-doc score table as a broadcast nested-loop,
    // never re-scan the corpus per cutoff
    val docScans = fileScans(curve.queryExecution.executedPlan)
      .count(_.relation.location.rootPaths.exists(_.toString.contains("documents")))
    assert(docScans <= 3,
      s"curve multiplies corpus scans with cutoffs ($docScans documents scans):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"curve went cartesian:\n$plan")
  }

  test("x_ann_join: candidates from an equi-join on cell_id — no cartesian between the corpora") {
    val plan = planOf(q("x_ann_join"))
    // the ONLY nested-loop joins allowed are the one-row broadcast
    // centroid-array attaches; a CartesianProduct between the two
    // vector sides would be the |L|×|R| explosion the cell cut exists
    // to prevent
    assert(!plan.contains("CartesianProduct"),
      s"annJoin went cartesian between the corpora:\n$plan")
    assert(plan.contains("cell_id"), s"cell equi-join key missing:\n$plan")
    // the probe-side cell selection is the per-row fold, not a
    // cells×rows explode + window: exactly one window remains (the
    // final top-k per left row)
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 1, s"probe-cell selection regressed to a window ($windows windows):\n$plan")
  }

  test("x_ann_join_curve: one corpus-side scan per role feeds every probe cutoff") {
    val curve = q("x_ann_join_curve")
    val plan = planOf(curve)
    assert(!plan.contains("CartesianProduct"), s"curve went cartesian:\n$plan")
    // three embeddings scans by construction (centroid sample, right
    // assignment, left probe selection) — the cutoff sweep must NOT
    // multiply them: 3 cutoffs ride one scored candidate set
    val embScans = fileScans(curve.queryExecution.executedPlan)
      .count(_.relation.location.rootPaths.exists(_.toString.contains("embeddings")))
    assert(embScans <= 4,
      s"curve multiplies corpus scans with cutoffs ($embScans embeddings scans):\n$plan")
  }

  test("x_retrieval_prf: every corpus aggregation is vocabulary-pruned; dims join broadcast") {
    val plan = planOf(q("x_retrieval_prf"))
    assert(!plan.contains("CartesianProduct"), s"PRF went cartesian:\n$plan")
    // the feedback set, df dims, and query-term dims all ride
    // broadcast joins; the only sort-merge-sized data would be an
    // unpruned corpus self-join, which the chain never forms
    assert(plan.contains("BroadcastHashJoin"), s"PRF dims fell off broadcast:\n$plan")
  }

  test("x_quality_zipf: the rank table joins broadcast and the reference cut is TakeOrdered") {
    val plan = planOf(q("x_quality_zipf"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-V vocabulary cut regressed to a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"rank dim fell off broadcast:\n$plan")
  }

  test("x_quality_bigram/backoff: count tables join broadcast — the corpus never shuffles on n-gram keys") {
    for (name <- Seq("x_quality_bigram", "x_quality_backoff", "x_quality_nb", "x_quality_kn")) {
      val plan = planOf(q(name))
      // the scoring side must be broadcast left joins against the
      // minCount-bounded count tables; a SortMergeJoin here means the
      // whole corpus explode shuffled on bigram/term keys — the exact
      // shape that cannot ship at 100 TB
      assert(plan.contains("BroadcastHashJoin"),
        s"$name count table fell off broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name shuffles the corpus on n-gram keys:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian:\n$plan")
    }
  }

  test("x_dedup_canon_inc: index prune and lookup are all broadcast — the index never shuffles") {
    val plan = planOf(q("x_dedup_canon_inc"))
    // the persisted canon index is corpus-vocabulary sized: the only
    // permissible touch is ONE scan, semi-pruned by the broadcast
    // increment hash set, with the pruned (increment-sized) slice
    // broadcast back into the lookup. A SortMergeJoin here means the
    // whole index exchanged per increment — the shape that cannot
    // ship at 100 TB
    assert(plan.contains("BroadcastHashJoin"),
      s"canon index lookup fell off broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"canon index shuffles per increment:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"canon gate went cartesian:\n$plan")
  }

  test("x_curriculum_shards: cutpoints ride a broadcast 1-row dim — no global sort, no extra exchange") {
    val plan = planOf(q("x_curriculum_shards"))
    // the naive curriculum export is ORDER BY length over the corpus;
    // this one must show the KMV cutpoints broadcast back (nested
    // loop against a 1-row dim is fine) and NO corpus-wide Sort
    // outside the per-(bucket, shard) window sort
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"cutpoint dim fell off broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cutpoint join went cartesian:\n$plan")
  }
}
