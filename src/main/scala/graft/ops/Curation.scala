package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** End-to-end corpus curation: the composed pipeline a training-data job
  * actually runs — quality gate → deterministic sampling → exact dedup →
  * per-source cap — built entirely from the individually-oracled operators
  * (TextOps / Sampling / Dedup), so the composite is deterministic and
  * SQL-replayable end-to-end.
  *
  * Stage order is chosen for scale, not narration:
  *  1. quality gate + hash sample FIRST — both are pure codegen'd filters
  *     (zero shuffle), so every row they kill never reaches a shuffle.
  *     Sampling commutes with exact dedup for BYTE-IDENTICAL duplicates
  *     (same bytes → same hash draw, so "sample then dedup" keeps the same
  *     survivors as "dedup then sample"); duplicates that are equal only
  *     after fingerprint normalization (case/whitespace) draw independently
  *     per variant, so for those this order samples the cluster slightly
  *     more leniently than dedup-first would — an accepted bias, not a bug;
  *  2. exact dedup — one fingerprint-key shuffle, WindowGroupLimit top-1;
  *  3. per-source cap LAST — caps apply to the cleaned, deduped corpus
  *     (capping raw rows would let duplicates consume a domain's budget).
  */
object Curation {

  /** Concat-and-chunk sequence packing: assign each document a (pack group,
    * bin) so that consecutive documents concatenate into ~`maxTokens`-token
    * training sequences — the standard pretraining packing shape. Documents
    * are taken in `orderCol` order WITHIN each `groupCol` shard; a
    * document's bin is its PRE-document running total divided by
    * `maxTokens`, so every bin starts below the target and only its last
    * document can overrun it (an oversize document overruns whatever bin
    * its position opened — it shares that bin with any shorter documents
    * that preceded it in the window; nothing is split — splitting is the
    * tokenizer's job downstream).
    *
    * Scale: one window shuffle on `groupCol`. Packing is deliberately
    * per-shard, NOT global: a total-order cumulative sum would serialize
    * 100 TB through one partition, while per-shard packing is embarrassingly
    * parallel and changes nothing material (bins are an arbitrary grouping;
    * only their fill level matters). Output adds `bin` = floor(tokens-
    * before-this-doc / maxTokens). */
  def packSequences(docs: DataFrame, groupCol: String, orderCol: String,
                    tokenCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.withColumn("bin",
      F.floor(F.coalesce(F.sum(F.col(tokenCol)).over(w), F.lit(0L)) / maxTokens))
  }

  /** Packing-efficiency census over [[packSequences]]' assignment — per
    * shard, what the chosen `maxTokens` actually buys:
    * {{{
    *   fill_rate   = total_tokens / (n_bins · maxTokens)
    *   waste_share = waste_tokens / (n_bins · maxTokens)   (underfill only)
    * }}}
    * plus `overrun_bins` (bins whose last document pushed them past
    * `maxTokens` — each one truncates or spills downstream) and
    * `max_bin_tokens` (the worst overrun, the number the tokenizer's
    * buffer must survive). The readout that turns "pack at 2048" from a
    * guess into a measurement: raising `maxTokens` trades waste for
    * overruns, and this census prices both sides per shard before a
    * 100-TB tokenization run commits.
    *
    * Determinism: the bin assignment is [[packSequences]]' exact integer
    * prefix sum (cross-engine-safe — integer cumsums are order-exact);
    * every count an exact long; the two shares one 6-dp IEEE division
    * each.
    *
    * Scale shape: one window shuffle on the shard key (packSequences'
    * own), one (shard, bin) collapse, one shard-keyed rollup — all
    * map-side combined.
    *
    * @return per shard (groupCol, n_docs, n_bins, total_tokens,
    *         overrun_bins, waste_tokens, max_bin_tokens, fill_rate,
    *         waste_share) ordered by shard
    */
  def packingEfficiency(docs: DataFrame, groupCol: String, orderCol: String,
                        tokenCol: String, maxTokens: Int): DataFrame = {
    val packed = packSequences(docs, groupCol, orderCol, tokenCol, maxTokens)
    val bins = packed.groupBy(F.col(groupCol), F.col("bin"))
      .agg(F.count(F.lit(1)).as("__nd"),
        F.sum(F.col(tokenCol).cast("long")).as("__bt"))
    val cap = F.lit(maxTokens.toLong)
    bins.groupBy(groupCol)
      .agg(F.sum("__nd").as("n_docs"), F.count(F.lit(1)).as("n_bins"),
        F.sum("__bt").as("total_tokens"),
        F.coalesce(F.sum(F.when(F.col("__bt") > cap, 1L)), F.lit(0L))
          .as("overrun_bins"),
        F.coalesce(F.sum(F.when(F.col("__bt") < cap, cap - F.col("__bt"))),
          F.lit(0L)).as("waste_tokens"),
        F.max("__bt").as("max_bin_tokens"))
      .select(F.col(groupCol), F.col("n_docs"), F.col("n_bins"),
        F.col("total_tokens"), F.col("overrun_bins"), F.col("waste_tokens"),
        F.col("max_bin_tokens"),
        F.round(F.col("total_tokens").cast("double") /
          (F.col("n_bins") * cap).cast("double"), 6).as("fill_rate"),
        F.round(F.col("waste_tokens").cast("double") /
          (F.col("n_bins") * cap).cast("double"), 6).as("waste_share"))
      .orderBy(groupCol)
  }

  /** Keep rows at or above their group's `q`-quantile of `valueCol` — the
    * per-source quality gate ("drop the worst half of every domain"): an
    * absolute threshold would gut clean domains and keep everything from
    * dirty ones. Exact percentile (matches SQL quantile_cont), computed per
    * group in one partially-aggregated pass; the |groups|-row threshold
    * table broadcasts back, so the corpus is scanned once and never
    * shuffled. */
  def filterByGroupQuantile(docs: DataFrame, groupCol: String, valueCol: String,
                            q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val thr = docs.groupBy(groupCol)
      .agg(F.percentile(F.col(valueCol), F.lit(q)).as("__thr"))
    docs.join(F.broadcast(thr), Seq(groupCol))
      .filter(F.col(valueCol) >= F.col("__thr"))
      .drop("__thr")
  }

  /** Cluster-atomic train/val/test assignment — the FIX for what
    * [[splitLeakage]] measures: documents are split by the hash of their
    * near-duplicate CLUSTER representative (connected component over
    * `pairs`), not their own id, so an entire near-dup cluster lands in
    * one split and eval contamination by near-copies is structurally
    * impossible for any pair the generator caught. Unpaired documents
    * hash on their own id — bit-identical to [[graft.ops.Sampling
    * .splitAssign]] for them, so adopting this op re-shuffles ONLY
    * clustered documents relative to a plain id split.
    *
    * Determinism: the component representative is the cluster's minimum
    * id (exact), the split decision [[graft.ops.Sampling.splitAssign]]'s
    * md5-prefix scheme — both engine-replayable, stable under
    * re-partitioning and re-runs.
    *
    * Scale shape: [[graft.ops.Components.connectedComponents]]' hash-min
    * propagation over the PAIR graph only (corpus-size-independent),
    * one left join of docs against the (duplicate-count-sized) component
    * map, then a pure codegen'd hash projection — no corpus shuffle
    * beyond the one join.
    *
    * @param pairs  (aCol, bCol) near-dup pairs from any generator
    *               honoring the a<b contract
    * @return docs plus (rep, split) columns
    */
  def splitByCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
                     weights: Seq[(String, Double)], salt: String = "",
                     aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comp = graft.ops.Components.connectedComponents(pairs, aCol, bCol)
    val withRep = docs
      .join(comp.select(F.col("v").as(idCol), F.col("component")),
        Seq(idCol), "left_outer")
      .withColumn("rep", F.coalesce(F.col("component"), F.col(idCol)))
      .drop("component")
    graft.ops.Sampling.splitAssign(withRep, F.col("rep"), weights, salt)
  }

  /** Per-column profile of a table — (col_name, n_rows, n_nulls,
    * n_distinct) — the schema-health report a pipeline emits before
    * training (null explosions and cardinality collapses are the two
    * classic upstream-breakage signals). ONE job over the data: every
    * column's counts live in a single aggregate row, unpivoted driver-side
    * from the 1-row result (the collect is a scalar summary, not a data
    * loop). Exact multi-column count_distinct costs an Expand of
    * rows × (columns+1) before the partial agg — at true 100 TB scale swap
    * `count_distinct` for `approx_count_distinct` (HLL): same single-pass
    * plan, no Expand, mergeable sketch state. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = F.count(F.lit(1)).as("__rows") +:
      cols.flatMap(c => Seq(
        F.count(F.when(F.col(c).isNull, 1)).as(s"__nulls_$c"),
        F.count_distinct(F.col(c)).as(s"__dist_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__rows")
    cols.map(c => (c, n, row.getAs[Long](s"__nulls_$c"), row.getAs[Long](s"__dist_$c")))
      .toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }

  /** Encoding-defect census — per corpus slice, how many documents carry
    * the classic UTF-8 pipeline wounds a crawled corpus accumulates:
    * {{{
    *   n_repl       U+FFFD replacement chars — a lossy transcode already
    *                happened upstream (bytes are gone, not recoverable)
    *   n_double_enc "Ã/Â + continuation-range" digrams or "â€" — UTF-8
    *                bytes read as Latin-1/cp1252 and re-encoded (mojibake;
    *                recoverable by one reverse transcode)
    *   n_c1         C1 control block U+0080–U+009F — cp1252 punctuation
    *                mis-mapped through Latin-1
    *   n_ctl        non-whitespace C0 controls — binary bleed into text
    *   n_defect     documents tripping ANY of the above
    * }}}
    * The "is this source's extraction pipeline broken, and in which of
    * the four repairable-vs-lost ways" gate that runs before any quality
    * scoring — a rising repl share means data is being DESTROYED
    * upstream, a rising double-enc share means it is recoverable and the
    * fix is one transcode flag.
    *
    * Determinism: per-document boolean regex hits (same RE2/Java
    * semantics on literal chars and codepoint classes), exact longs, one
    * 6-dp IEEE share.
    *
    * Scale shape: one scan, four codegen'd rlike flags per document,
    * slice-keyed collapse (map-side combined) — nothing wider than the
    * group key + five longs shuffles.
    *
    * @return per slice (groupCols…, n_docs, n_repl, n_double_enc, n_c1,
    *         n_ctl, n_defect, defect_share) ordered by the group columns
    */
  def encodingDefectCensus(df: DataFrame, groupCols: Seq[String],
                           textCol: String): DataFrame = {
    val t = F.coalesce(F.col(textCol), F.lit(""))
    def flag(re: String): Column = F.when(t.rlike(re), 1L).otherwise(0L)
    val repl = flag("\uFFFD")
    val dbl = flag("[\u00C3\u00C2][\u0080-\u00BF]|\u00E2\u20AC")
    val c1 = flag("[\u0080-\u009F]")
    val ctl = flag("[\u0000-\u0008\u000B\u000C\u000E-\u001F]")
    val gs = groupCols.map(F.col)
    val flagged = df.select(gs ++ Seq(repl.as("__r"), dbl.as("__d"),
      c1.as("__c"), ctl.as("__t")): _*)
      .withColumn("__any", F.greatest(F.col("__r"), F.col("__d"),
        F.col("__c"), F.col("__t")))
    flagged.groupBy(gs: _*)
      .agg(F.count(F.lit(1)).as("n_docs"), F.sum("__r").as("n_repl"),
        F.sum("__d").as("n_double_enc"), F.sum("__c").as("n_c1"),
        F.sum("__t").as("n_ctl"), F.sum("__any").as("n_defect"))
      .select(gs ++ Seq(F.col("n_docs"), F.col("n_repl"),
        F.col("n_double_enc"), F.col("n_c1"), F.col("n_ctl"),
        F.col("n_defect"),
        F.round(F.col("n_defect").cast("double") /
          F.nullif(F.col("n_docs").cast("double"), F.lit(0.0)), 6)
          .as("defect_share")): _*)
      .orderBy(gs: _*)
  }

  /** Strip corpus-boilerplate lines (CCNet/RefinedWeb-style): a line whose
    * normalized form (lowercase, trimmed) appears in MORE than `maxDocFreq`
    * distinct documents is navigation/footer chrome, not content — remove
    * every occurrence and rejoin the survivors in original order. Blank
    * lines never count as boilerplate (their frequency is structural).
    *
    * Scale shape: pass 1 aggregates doc-frequency over per-document
    * DISTINCT normalized lines (`array_distinct` keeps the map side at one
    * row per unique line per doc), keeping only the > `maxDocFreq` tail —
    * by construction a tiny relation (a line must recur across that many
    * documents to qualify). Pass 2 broadcasts that set as ONE array row and
    * rewrites each document map-side with the `filter` higher-order
    * function: no explode/reassemble shuffle, no per-line join — the corpus
    * is never shuffled at all. Per-line membership is an O(|hot|) scan,
    * fine while the boilerplate set is small; if a corpus yields a huge hot
    * set, lower the threshold pressure by raising `maxDocFreq` or switch to
    * an explode + broadcast-anti-join variant. */
  def stripBoilerplateLines(docs: DataFrame, textCol: String,
                            maxDocFreq: Int): DataFrame = {
    // doc-frequency = ROW frequency (one vote per input row, not per id):
    // exact-dedup first if the input may carry duplicate rows per document
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val lines = F.split(F.col(textCol), "\n", -1) // -1: keep trailing empties
    val norm = (l: Column) => F.lower(F.trim(l))
    val hot = docs
      .select(F.explode(F.array_distinct(F.transform(lines, norm))).as("__line"))
      .filter(F.length(F.col("__line")) > 0)
      .groupBy("__line").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") > maxDocFreq)
      // empty input → one row with an empty array (agg over zero rows)
      .agg(F.sort_array(F.collect_list("__line")).as("__hot"))
    docs.join(F.broadcast(hot)) // 1-row broadcast nested-loop: a free cross
      .withColumn(textCol, F.array_join(
        F.filter(lines, l => !F.array_contains(F.col("__hot"), norm(l))), "\n"))
      .drop("__hot")
  }

  /** Corpus-wide exact line dedup, keep-first (the line-granularity form of
    * Lee et al. 2022's exact-substring dedup; C4 does the same at
    * three-sentence spans): every LATER occurrence of a normalized
    * (lowercase, trimmed) line is removed; the first occurrence — lowest
    * (id, position) — survives. Complements [[stripBoilerplateLines]]:
    * that drops ALL occurrences of corpus-hot chrome, this keeps exactly
    * one copy of every line, so legitimately repeated content survives
    * once. Blank lines are document structure, never deduped. Documents
    * whose every non-blank line was seen earlier collapse to their blank
    * skeleton ("" for single-line docs) rather than disappearing.
    *
    * Scale shape: explode to (id, idx, line) — line cardinality is the
    * floor for ANY corpus-wide line dedup — then ONE window shuffle on the
    * line fingerprint and one groupBy(id) reassembly shuffle. Blank lines
    * ROUTE AROUND the window entirely (filter → union back), which matters
    * twice at 100 TB: (1) every blank in the corpus hashes to the single
    * norm="" window partition, so one task would sort them all — the
    * canonical hot key; (2) keeping them in-window forced a disjunctive
    * keep-filter (`blank || rk===1`) that InferWindowGroupLimit cannot
    * fire on — with blanks routed, the pure `rk === 1` filter compiles to
    * WindowGroupLimit and later occurrences die map-side per partition
    * BEFORE the shuffle (plan-asserted in PlanQualitySpec). NULL-text
    * documents pass through unchanged (structural, like blanks). */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val others = docs.columns.filter(c => c != idCol && c != textCol)
    val exploded = docs
      .select(F.col(idCol), F.posexplode_outer(F.split(F.col(textCol), "\n", -1))
        .as(Seq("__idx", "__line")))
    val norm = F.lower(F.trim(F.col("__line")))
    // null __line rows (only from null text) fall out of BOTH branches —
    // their documents are rebuilt as null by the final projection anyway
    val blanks = exploded.filter(F.length(norm) === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(norm).orderBy(F.col(idCol).asc, F.col("__idx").asc)
    val kept = exploded.filter(F.length(norm) > 0)
      .withColumn("__rk", F.row_number().over(w))
      .filter(F.col("__rk") === 1)
      .drop("__rk")
      .unionByName(blanks)
      .groupBy(idCol)
      .agg(F.array_join(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("__idx"), F.col("__line")))),
        s => s.getField("__line")), "\n").as("__t"))
    // a document whose every non-blank line was seen earlier has NO kept
    // rows — it becomes the empty string (document emptied), not a dropped
    // or null row; only genuinely-null input text stays null
    docs.join(kept, Seq(idCol), "left")
      .select((F.col(idCol) +:
        F.when(F.col(textCol).isNull, F.lit(null).cast("string"))
          .otherwise(F.coalesce(F.col("__t"), F.lit(""))).as(textCol) +:
        others.map(F.col)): _*)
  }

  /** Cross-document duplicate-sentence census — the reporting half of
    * sentence-level dedup (what [[dedupLines]] is to lines, at sentence
    * granularity): segment on terminal punctuation (`[.!?]` + whitespace —
    * the same regex class in Spark's Java regex and an oracle's RE2),
    * normalize (lower + trim), and count, per surviving sentence, the
    * distinct documents containing it and its total occurrences. The
    * output IS the boilerplate report a curation pass reviews before
    * choosing removal thresholds (the Lee et al. 2022 workflow step).
    *
    * Scale: sentences collapse to (sentence, doc) counts map-side FIRST
    * (partial agg), then to per-sentence totals — the distinct-doc count
    * is the second level of a two-level aggregation, NOT a countDistinct
    * (whose Expand doubles the exploded row volume before any collapse;
    * the x25 lesson). Short fragments (< `minChars` after normalization)
    * are dropped before the first shuffle. */
  def duplicateSentences(docs: DataFrame, idCol: String, textCol: String,
                         minChars: Int = 20, minDocs: Int = 2): DataFrame = {
    val norm = F.lower(F.trim(F.col("__s")))
    val perDoc = docs
      .select(F.col(idCol), F.explode(F.split(F.col(textCol), "[.!?]\\s+", -1)).as("__s"))
      .select(F.col(idCol), norm.as("sentence"))
      .filter(F.length(F.col("sentence")) >= minChars)
      .groupBy("sentence", idCol).agg(F.count(F.lit(1)).as("__c"))
    perDoc.groupBy("sentence")
      .agg(F.count(F.lit(1)).as("n_docs"), F.sum("__c").as("n_total"))
      .filter(F.col("n_docs") >= minDocs)
  }

  /** Cross-split duplicate-LEAKAGE audit: after an id-keyed train/val/test
    * assignment, how many duplicate text fingerprints span split
    * boundaries — i.e. how many test documents the model will have
    * "seen" in training? (Content-keyed splits — [[Sampling.splitAssign]]
    * on the TEXT — avoid this by construction; id- or URL-keyed splits,
    * which are common because they keep provenance together, do not. This
    * is the check that tells you which situation you are in.)
    *
    * One fingerprint census with per-split conditional counts (map-side
    * collapsed), then the per-pair totals unfold from a single global
    * aggregate row ([[graft.ops.Stats.corrPairs]]' explode trick). For
    * each unordered split pair: the number of shared fingerprints and the
    * total leaked doc pairs Σ cntA·cntB.
    *
    * @return (split_a, split_b, n_shared_fps, n_leak_pairs)
    */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   weights: Seq[(String, Double)],
                   salt: String = ""): DataFrame = {
    require(weights.size >= 2, "splitLeakage needs at least two splits")
    val assigned = Sampling.splitAssign(docs, F.col(idCol), weights, salt)
    val fp = assigned.select(F.col("split"),
      F.md5(F.coalesce(F.col(textCol), F.lit(""))).as("__fp"))
    val names = weights.map(_._1)
    val cntCols = names.map(n =>
      F.sum(F.when(F.col("split") === n, 1L).otherwise(0L)).as(s"__c_$n"))
    val counts = fp.groupBy("__fp").agg(cntCols.head, cntCols.tail: _*)
    val pairs = for { i <- names.indices; j <- names.indices if i < j }
      yield (names(i), names(j))
    val aggCols: Seq[Column] =
      pairs.map { case (a, b) =>
        F.sum(F.when(F.col(s"__c_$a") > 0L && F.col(s"__c_$b") > 0L, 1L)
          .otherwise(0L)).as(s"__f_${a}__$b") } ++
      pairs.map { case (a, b) =>
        F.sum(F.col(s"__c_$a") * F.col(s"__c_$b")).as(s"__p_${a}__$b") }
    val agg = counts.groupBy().agg(aggCols.head, aggCols.tail: _*)
    agg
      .select(F.explode(F.array(pairs.map { case (a, b) =>
        F.struct(F.lit(a).as("split_a"), F.lit(b).as("split_b"),
          F.col(s"__f_${a}__$b").as("n_shared_fps"),
          F.col(s"__p_${a}__$b").as("n_leak_pairs"))
      }: _*)).as("__r"))
      .select("__r.split_a", "__r.split_b", "__r.n_shared_fps",
        "__r.n_leak_pairs")
  }

  /** Quantile-normalized score BLENDING — the DataComp/model-ensemble
    * filtering move: heterogeneous quality signals (length, perplexity,
    * classifier logits…) are not comparable on their raw scales, so each
    * is mapped to its own corpus percentile and the percentiles average.
    *
    * The exact form (a rank window per metric) is a GLOBAL SORT per
    * metric — the non-distributable shape — so this uses the
    * [[Scale.rangeShardAssign]] machinery instead: per metric, an
    * md5(id)-sampled value set (bounded by `maxSample`, the only data
    * that reaches the driver) yields `nBins−1` INTEGER-RANK boundary
    * literals, and a row's percentile is the codegen'd comparison-chain
    * count `|{b : v > b}| / |bounds|` — shuffle-free scoring, no joins,
    * deterministic and engine-replayable (duplicate boundary VALUES from
    * distinct ranks are kept and counted — the oracle replays the same
    * multiset). ONE sampled scan serves every metric.
    *
    * @return df + per-metric `pct_<name>` columns + `blend` (the 6-dp
    *         mean percentile)
    */
  def rankBlend(df: DataFrame, idCol: String, metrics: Seq[(String, Column)],
                nBins: Int = 100, samplePrefix: String = "199a",
                maxSample: Int = 1 << 20): DataFrame = {
    require(metrics.nonEmpty, "rankBlend needs at least one metric")
    require(nBins >= 2 && nBins <= 10000, s"nBins must be in [2,10000], got $nBins")
    val sampled = df
      .filter(F.substring(F.md5(F.col(idCol).cast("string")), 1, 4) < samplePrefix)
      .select(metrics.map { case (n, c) => c.cast("double").as(n) }: _*)
      .limit(maxSample + 1)
      .collect()
    require(sampled.nonEmpty, "rankBlend: empty sample — widen samplePrefix")
    require(sampled.length <= maxSample,
      s"rankBlend: sample exceeds maxSample=$maxSample — tighten samplePrefix")
    val n = sampled.length.toLong
    val withPcts = metrics.zipWithIndex.foldLeft(df) {
      case (acc, ((name, col), mi)) =>
        val keys = sampled.map(_.getDouble(mi)).sorted
        val ranks = (1 until nBins).map(i => i.toLong * n / nBins)
          .filter(_ >= 1L).distinct
        val bounds = ranks.map(r => keys((r - 1L).toInt))
        val cnt = bounds.foldLeft(F.lit(0)) { (a, b) =>
          a + F.when(col.cast("double") > b, 1).otherwise(0) }
        acc.withColumn(s"pct_$name",
          F.round(cnt.cast("double") / bounds.length, 6))
    }
    withPcts.withColumn("blend", F.round(
      metrics.map(m => F.col(s"pct_${m._1}")).reduce(_ + _) /
        metrics.length.toDouble, 6))
  }

  /** @param minTokens      inclusive whitespace-token floor (quality gate)
    * @param maxDupLineFrac inclusive ceiling on duplicate-line fraction
    * @param sampleRate     content-hash keep rate (1.0 = keep all)
    * @param capPerSource   max surviving rows per `sourceCol` value
    */
  def curate(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
             minTokens: Int, maxDupLineFrac: Double, sampleRate: Double,
             capPerSource: Int, salt: String = ""): DataFrame = {
    val text: Column = F.col(textCol)
    val gated = TextOps.withRepetition(docs, textCol)
      .filter(TextOps.tokenCount(text) >= minTokens &&
        F.col("dup_line_fraction") <= maxDupLineFrac)
      .drop("dup_line_fraction", "dup_bigram_fraction")
    val sampled = Sampling.hashSample(gated, text, sampleRate, salt)
    val deduped = Dedup.exact(sampled, idCol, textCol).drop("fp")
    Sampling.capPerGroup(deduped, F.col(sourceCol), text, capPerSource, salt)
  }

  /** The C4 cleaning pass (Raffel et al. 2020 §2.2, applied line-by-line
    * then page-level), reproduced rule-for-rule:
    *
    * line KEPT iff (on the whitespace-trimmed line):
    *  - it ends in a terminal punctuation mark (`.` `!` `?` `"`), AND
    *  - it has ≥ `minWords` words (the paper's "only retained lines that
    *    contained at least 5 words"), AND
    *  - it does not contain the word "javascript" (case-insensitive);
    *
    * page DROPPED iff:
    *  - fewer than `minLines` kept lines (C4: 3 sentences), OR
    *  - the page contains "lorem ipsum" (case-insensitive), OR
    *  - the page contains a curly brace `{`, OR
    *  - any lowercase token is in `badWords` (the paper uses the
    *    "List of Dirty, Naughty …" list; callers supply theirs).
    *
    * Output: every input row with `n_kept`, `c4_keep`, and `kept_text`
    * (the kept lines re-joined — what survives INTO the training set when
    * `c4_keep`). One pure projection — split/filter/join array HOFs, all
    * codegen'd, zero shuffles, embarrassingly parallel at any scale. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               badWords: Seq[String] = Seq("damn", "sucks"),
               minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val t = F.col(textCol)
    val lines = F.split(t, "\n", -1)
    def trimmed(l: Column): Column = F.trim(l)
    def words(l: Column): Column =
      F.size(F.filter(F.split(trimmed(l), "\\s+"), w => F.length(w) > 0))
    def keepLine(l: Column): Column = {
      val s = trimmed(l)
      (s.endsWith(".") || s.endsWith("!") || s.endsWith("?") || s.endsWith("\"")) &&
        words(l) >= minWords && !F.lower(s).contains("javascript")
    }
    val kept = F.filter(lines, l => keepLine(l))
    val lowToks = F.filter(F.split(F.lower(F.trim(t)), "\\s+"),
      w => F.length(w) > 0)
    val hasBad =
      if (badWords.isEmpty) F.lit(false)
      else F.exists(lowToks, w => w.isin(badWords.map(x => x: Any): _*))
    docs.withColumn("n_kept", F.size(kept))
      .withColumn("c4_keep",
        F.size(kept) >= minLines &&
          !F.lower(t).contains("lorem ipsum") &&
          !t.contains("{") && !hasBad)
      .withColumn("kept_text", F.array_join(kept, "\n"))
  }

  /** Snapshot diff between two corpus versions — the audit step of an
    * incremental pipeline ("what changed between crawl N and N+1"). One
    * row per id present in EITHER snapshot, with `status`:
    * `added` (new only), `removed` (old only), `changed` (both, different
    * normalized-content fingerprint), `unchanged`. Content equality is
    * [[TextOps.fingerprint]] (whitespace/case-normalized md5 — the
    * [[Dedup.exact]] convention), so formatting-only edits read unchanged.
    *
    * Scale shape: each side collapses to (id, 16-byte fp) in its scan
    * projection — documents never cross the wire — then ONE full-outer
    * shuffle join on id. Snapshots written `bucketBy(id)` (see
    * [[graft.ops.Scale]]) diff with zero exchanges.
    *
    * Presence is an EXPLICIT per-side marker, not fingerprint nullness: a
    * row whose text is NULL has a NULL fingerprint but still EXISTS in its
    * snapshot, so it must not read as added/removed. Two null-text rows
    * compare unchanged (null-safe fp equality); null-text vs real text is
    * changed. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(F.col(idCol),
      TextOps.fingerprint(F.col(textCol)).as("__ofp"),
      F.lit(true).as("__old"))
    val n = newDf.select(F.col(idCol),
      TextOps.fingerprint(F.col(textCol)).as("__nfp"),
      F.lit(true).as("__new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(F.col(idCol),
        F.when(F.col("__old").isNull, "added")
          .when(F.col("__new").isNull, "removed")
          .when(F.col("__ofp") <=> F.col("__nfp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Cross-source quantile normalization: replace each row's score with
    * the equivalently-ranked score from a GLOBAL reference distribution,
    * so sources with incompatible score scales (one crawl's quality model
    * runs hot, another's cold) become comparable before any threshold or
    * mixture decision — the score-calibration step a multi-source
    * curation pipeline needs ahead of [[filterByGroupQuantile]] or
    * [[graft.ops.Sampling.mixturePlan]].
    *
    * Mechanics, all integer/exactly-replayable: within-source rank
    * `rk ∈ [1, cnt]` (row_number, id tiebreak — a per-source distributed
    * window), reference index `idx = 1 + (rk−1)(m−1) div (cnt−1)`
    * (integer div — endpoints map to endpoints), calibrated value = the
    * idx-th smallest reference score. The reference is a deterministic
    * md5 [[graft.ops.Sampling.hashSample]] of the corpus: BOUNDED by
    * `refRate`, so its one global sort-window runs over a capped relation
    * (the q09 post-aggregate rule) and broadcasts to the join — at 100 TB
    * the reference is thousands of rows, never the corpus. Zero corpus
    * shuffles beyond the per-source window.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
                        idCol: String, refRate: Double = 1.0,
                        refSalt: String = ""): DataFrame = {
    require(refRate > 0.0 && refRate <= 1.0,
      s"refRate must be in (0,1], got $refRate")
    val wSrc = Window.partitionBy(groupCol)
      .orderBy(F.col(scoreCol), F.col(idCol))
    val ranked = df
      .withColumn("__rk", F.row_number().over(wSrc))
      .withColumn("__cnt",
        F.count(F.lit(1)).over(Window.partitionBy(groupCol)))
    val ref = graft.ops.Sampling.hashSample(
        df.select(F.col(scoreCol), F.col(idCol)), F.col(idCol), refRate, refSalt)
    val refRanked = ref
      .withColumn("__rn", F.row_number().over(
        Window.orderBy(F.col(scoreCol), F.col(idCol))))
      .select(F.col("__rn"), F.col(scoreCol).as("calibrated"))
    // m over the un-windowed sample — counting refRanked would replay the
    // reference sort a second time for a number that needs no order
    val m = ref.agg(F.count(F.lit(1)).as("__m"))
    ranked.crossJoin(F.broadcast(m))
      .withColumn("__idx", F.lit(1L) + F.call_function("div",
        (F.col("__rk") - 1L).cast("long") * (F.col("__m") - 1L),
        F.greatest(F.col("__cnt") - 1L, F.lit(1L))))
      .join(F.broadcast(refRanked), F.col("__idx") === F.col("__rn"), "left")
      .drop("__rk", "__cnt", "__m", "__idx", "__rn")
  }

  /** Difficulty-binned curriculum plan: score every document's difficulty
    * as the NEGATED corpus-unigram log-likelihood per token
    * ([[TextOps.unigramLogProb]] — rare-token soup scores hard, stopword
    * prose scores easy), then deal each source's documents into `nBins`
    * difficulty bins (ntile over the per-source ordering). Training
    * easy→hard by bin is the classic curriculum schedule; binning WITHIN
    * source keeps one verbose source from monopolizing the early bins.
    *
    * Scale shape: the unigram score is the x47 machinery (vocab-bounded
    * join, 1-row broadcast total); the only window partitions by SOURCE —
    * a keyed shuffle, no global sort anywhere. Gramless docs coalesce to
    * difficulty 0 rather than riding on engine-specific NULL ordering.
    *
    * @return (idCol, srcCol, difficulty, bin, bin_rank)
    */
  def curriculumPlan(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    val scored = TextOps.unigramLogProb(docs, idCol, textCol)
      .select(F.col(idCol), F.round(-F.col("avg_logp"), 6).as("difficulty"))
    val w = Window.partitionBy(srcCol)
      .orderBy(F.col("difficulty"), F.col(idCol))
    docs.select(F.col(idCol), F.col(srcCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0.0, Seq("difficulty"))
      .withColumn("bin", F.ntile(nBins).over(w))
      .withColumn("bin_rank", F.row_number().over(
        Window.partitionBy(F.col(srcCol), F.col("bin"))
          .orderBy(F.col("difficulty"), F.col(idCol))))
      .orderBy(srcCol, "bin", "bin_rank")
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et al.
    * 2007) over a set of quasi-identifier columns: every QI equivalence
    * class reports its size `k` (rows indistinguishable on the QIs — a
    * class of 1 is a re-identifiable individual) and its `l` (distinct
    * sensitive values — a class where everyone shares one sensitive value
    * leaks it even at large k). `at_risk` flags classes below `kMin`.
    * The release-gate audit a training corpus with user-derived rows
    * needs before any redistribution.
    *
    * Scale shape: ONE groupBy on the QI key with map-side partial counts
    * plus a distinct-count — a single keyed shuffle, no windows, no
    * driver actions; class-count output is bounded by the QI domain.
    *
    * @return (qiCols…, k, l, at_risk) ordered by QI
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitive: Column, kMin: Int = 5): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(kMin >= 2, s"kMin below 2 flags nothing, got $kMin")
    df.groupBy(qiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("k"),
        F.count_distinct(sensitive).as("l"))
      .withColumn("at_risk", F.col("k") < kMin)
      .orderBy(qiCols.map(F.col): _*)
  }

  /** t-closeness audit (Li et al. 2007) — the attribute-DISCLOSURE
    * complement of [[kAnonymityAudit]]'s identity metrics: a QI class can
    * be large (k fine) and diverse (l fine) yet still leak, if its
    * sensitive-value DISTRIBUTION differs sharply from the corpus's.
    * Per QI class, the total-variation distance to the global sensitive
    * distribution (the categorical EMD):
    * {{{
    *   TVD_g = ½ · Σ_v | n_{g,v}/n_g − n_v/N |
    * }}}
    * classes with TVD > `tMax` breach.
    *
    * Scale shape: one (QI, value) cell collapse (domain-bounded), the
    * dense class×value grid from that table's margins, 9-dp cell terms —
    * the corpus is scanned once.
    *
    * @return (qiCols…, n, tvd, breach) with the corpus-level max TVD
    *         replicated (1-row broadcast), ordered by QI
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitive: Column, tMax: Double = 0.3): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tMax > 0.0 && tMax < 1.0, s"tMax must be in (0,1), got $tMax")
    val qi = qiCols.map(F.col)
    val cells = df
      .select(qi :+ sensitive.cast("string").as("__v"): _*)
      .groupBy(qi :+ F.col("__v"): _*)
      .agg(F.count(F.lit(1)).as("__c"))
    val groups = cells.groupBy(qi: _*).agg(F.sum("__c").as("__ng"))
    val vals = cells.groupBy("__v").agg(F.sum("__c").as("__nv"))
    val tot = cells.agg(F.sum("__c").as("__N"))
    val dense = groups.crossJoin(F.broadcast(vals))
      .join(cells, qiCols :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(F.broadcast(tot))
      .withColumn("__term", F.round(F.abs(
        F.col("__c").cast("double") / F.col("__ng") -
          F.col("__nv").cast("double") / F.col("__N")), 9))
    val perG = dense.groupBy(qi: _*)
      .agg(F.max("__ng").as("n"),
        F.round(F.lit(0.5) * F.sum("__term"), 6).as("tvd"))
      .withColumn("breach", F.col("tvd") > tMax)
    perG.crossJoin(F.broadcast(
        perG.agg(F.max("tvd").as("max_tvd"))))
      .select(qi ++ Seq(F.col("n"), F.col("tvd"), F.col("breach"),
        F.col("max_tvd")): _*)
      .orderBy(qi: _*)
  }

  /** Entropy and recursive l-diversity audit (Machanavajjhala et al. 2007
    * §3-4) — the criteria DISTINCT-l ([[kAnonymityAudit]]'s `l` column)
    * is too weak for: a class can hold l distinct sensitive values while
    * one value covers 99% of it. Per QI class with value counts c_v,
    * n = Σc_v:
    * {{{
    *   entropy-l = exp(−Σ p_v ln p_v) = exp(ln n − Σ c_v ln c_v / n)
    *   c_min     = r₁ / (n − r₁)        (r₁ = max c_v)
    * }}}
    * — entropy-l is the "effective number of sensitive values" (the
    * class passes entropy l-diversity iff entropy-l ≥ l); c_min is the
    * smallest c for which the class passes recursive (c,2)-diversity
    * (r₁ < c·(n−r₁)), so a release requiring (c,2) passes iff
    * c_min < c. `at_risk` flags classes failing EITHER distinct-l or
    * entropy-l at `lMin`.
    *
    * Scale shape: one (QI, value) cell collapse (domain-bounded), one QI
    * rollup with a 9-dp c·ln c ladder — the corpus is scanned once, no
    * windows, no dense grid.
    *
    * @return (qiCols…, n, l_distinct, entropy_l, c_min, at_risk) ordered
    *         by QI; c_min NULL when one value covers the whole class
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitive: Column, lMin: Int = 2): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(lMin >= 2, s"lMin below 2 flags nothing, got $lMin")
    val qi = qiCols.map(F.col)
    val cells = df
      .select(qi :+ sensitive.cast("string").as("__v"): _*)
      .groupBy(qi :+ F.col("__v"): _*)
      .agg(F.count(F.lit(1)).as("__c"))
    val per = cells.groupBy(qi: _*).agg(
      F.sum("__c").as("n"),
      F.count(F.lit(1)).as("l_distinct"),
      F.max("__c").as("__r1"),
      F.sum(F.round(F.col("__c").cast("double") *
        F.log(F.col("__c").cast("double")), 9)).as("__slc"))
    val ent = F.exp(F.log(F.col("n").cast("double")) -
      F.col("__slc") / F.col("n").cast("double"))
    per.select(qi ++ Seq(F.col("n"), F.col("l_distinct"),
      F.round(ent, 6).as("entropy_l"),
      F.round(F.col("__r1").cast("double") /
        F.nullif((F.col("n") - F.col("__r1")).cast("double"),
          F.lit(0.0)), 6).as("c_min"),
      (F.col("l_distinct") < lMin.toLong || ent < lMin.toDouble)
        .as("at_risk")): _*)
      .orderBy(qi: _*)
  }

  /** ε-differentially-private noisy counts (Dwork et al. 2006, the
    * Laplace mechanism) — the RELEASE half next to the audit half
    * ([[kAnonymityAudit]]/[[lDiversityAudit]]/[[tClosenessAudit]] say
    * whether raw counts leak; this publishes counts that provably
    * don't): per group,
    * {{{
    *   noisy = count + Lap(1/ε)        (count query sensitivity = 1)
    *   Lap via inverse CDF:  −(1/ε) · sign(u−½) · ln(1 − 2·|u−½|)
    * }}}
    * The noise draw is DETERMINISTIC — u comes from the md5 of
    * (seed, group key), mapped to (0,1) via the repo's 24-bit hex
    * bucket convention (u = (h24 + 0.5) / 2²⁴, strictly inside (0,1)
    * so the ln argument never hits 0). Determinism is what makes the
    * release auditable and engine-replayable; a REAL deployment must
    * treat the seed as secret and never re-release under a new seed
    * (each release spends ε — the privacy accounting is the caller's
    * budget ledger, composition is additive).
    *
    * Determinism: exact count longs; one md5 + one ln + two IEEE
    * multiplies per group, 6-dp. Negative noisy counts are NOT clamped
    * (clamping biases sums — consumers needing nonnegativity clamp
    * post-hoc, documented standard practice).
    *
    * Scale shape: ONE map-side-combined groupBy on the key; noise is a
    * per-group scalar expression (codegen'd md5/ln) — no second pass,
    * no driver state, no shuffle beyond the count collapse.
    *
    * @param epsilon privacy parameter (smaller = noisier = more
    *                private); scale b = 1/ε
    * @param seed    release identifier mixed into the noise hash —
    *                SECRET in a real deployment
    * @return per group (keyCols…, n_true, noisy_n) ordered by key;
    *         callers releasing externally drop n_true — it rides along
    *         here because the census doubles as the utility-loss audit
    *         (|noisy−true| distribution) before the release ships
    */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], epsilon: Double,
                    seed: String = "dp"): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisyCounts needs at least one key column")
    require(epsilon > 0.0 && epsilon <= 100.0,
      s"epsilon must be in (0,100], got $epsilon")
    val counts = df.groupBy(keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_true"))
    val keyStr = noiseKeyStr(seed, keyCols, None)
    counts.select(keyCols.map(F.col) ++ Seq(F.col("n_true"),
      F.round(F.col("n_true").cast("double") + lapNoise(keyStr, epsilon), 6)
        .as("noisy_n")): _*)
      .orderBy(keyCols.map(F.col): _*)
  }

  /** Collision-proof noise-bucket key (r15 advice): each key component
    * is md5'd INDIVIDUALLY before joining with '|' — a raw component
    * containing the separator, or a NULL (which concat_ws silently
    * skips), would otherwise collide two groups onto one deterministic
    * draw, and correlated noise weakens the per-group DP release. NULL
    * components map to the ␀ SYMBOL-FOR-NULL sentinel before
    * hashing so null and the string "null" stay distinct buckets. */
  private def noiseKeyStr(seed: String, keyCols: Seq[String],
                          tag: Option[String]): Column =
    F.concat_ws("|", (F.lit(seed) +:
      keyCols.map(c =>
        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("␀"))))) ++
      tag.map(F.lit(_)): _*)

  /** Deterministic Lap(1/ε)·(sensitivity=1 form) draw from an md5'd key
    * string — the shared noise tree of [[dpNoisyCounts]] and
    * [[dpNoisyMean]] (u from the 24-bit hex bucket, strictly inside
    * (0,1); inverse CDF −(1/ε)·sign(u−½)·ln(1−2|u−½|)). Callers scale
    * sensitivity by dividing ε. The expression shape (association
    * order, single IEEE ops) is the oracle-replay contract — change it
    * nowhere without re-deriving every dp oracle. */
  private def lapNoise(keyStr: Column, epsilon: Double): Column = {
    val h24 = F.conv(F.substring(F.md5(keyStr), 1, 6), 16, 10)
      .cast("long")
    val u = (h24.cast("double") + F.lit(0.5)) / F.lit(16777216.0)
    val cdf = u - F.lit(0.5)
    F.lit(-1.0 / epsilon) *
      F.signum(cdf) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(cdf))
  }

  /** ε-differentially-private noisy mean of a bounded integer column —
    * the second release in the [[dpNoisyCounts]] family, via the
    * standard sum/count decomposition (Dwork & Roth 2014 §3.4): clamp
    * each value to [lo, hi] (clamping is what BOUNDS the sensitivity —
    * without it one outlier row moves the sum arbitrarily and no finite
    * noise protects it), then
    * {{{
    *   noisy_sum = Σ clamp(v)  + Lap((hi−lo) / (ε/2))
    *   noisy_n   = n           + Lap(1       / (ε/2))
    *   dp_mean   = noisy_sum / noisy_n
    * }}}
    * The ε budget splits evenly between the two queries (sequential
    * composition is additive, so the release as a whole spends ε).
    *
    * NEIGHBORING MODEL (r15 advice — the guarantee is model-specific):
    * the sum sensitivity `hi − lo` is calibrated for REPLACE-ONE
    * (bounded-DP) neighboring, where datasets differ by swapping one
    * row's value. Under ADD/REMOVE neighboring the sum sensitivity is
    * `max(|lo|, |hi|)`, which EXCEEDS `hi − lo` whenever 0 < lo or
    * hi < 0 (e.g. bounds [1000, 2000] would be under-noised 2×) — do
    * not read add/remove guarantees off this release. The count query
    * has sensitivity 0 under replace-one (n is fixed); its Lap(2/ε)
    * noise is kept anyway so the released n is never exact.
    * Values are LONGS by contract: the clamped sum is an exact
    * commutative long — no order-dependent double accumulation — and
    * continuous metrics should be pre-quantized before release
    * (standard DP practice bounds AND discretizes). Noise draws are
    * md5(seed|key|"sum") and md5(seed|key|"cnt") — independent buckets
    * per query, deterministic per release (see [[dpNoisyCounts]] for
    * the secret-seed / budget-ledger caveats).
    *
    * Scale shape: one map-side-combined groupBy carrying (key, long
    * sum, long count); noise and the final division are per-group
    * scalar expressions. True sum/count/mean ride along for the
    * pre-release utility audit; external releases drop them.
    *
    * @param lo,hi   clamp bounds (sensitivity of the sum = hi − lo)
    * @param epsilon TOTAL privacy budget of the release (split ε/2+ε/2)
    * @return per group (keyCols…, n_true, sum_true, mean_true,
    *         noisy_sum, noisy_n, dp_mean) ordered by key
    */
  def dpNoisyMean(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  lo: Long, hi: Long, epsilon: Double,
                  seed: String = "dp"): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisyMean needs at least one key column")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    require(epsilon > 0.0 && epsilon <= 100.0,
      s"epsilon must be in (0,100], got $epsilon")
    val clamped = F.greatest(F.lit(lo),
      F.least(F.lit(hi), F.col(valueCol).cast("long")))
    val agg = df.filter(F.col(valueCol).isNotNull)
      .groupBy(keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_true"), F.sum(clamped).as("sum_true"))
    def keyStr(tag: String) = noiseKeyStr(seed, keyCols, Some(tag))
    val halfEps = epsilon / 2.0
    val sumNoise = F.lit((hi - lo).toDouble) * lapNoise(keyStr("sum"), halfEps)
    val noisySum = F.col("sum_true").cast("double") + sumNoise
    val noisyN = F.col("n_true").cast("double") + lapNoise(keyStr("cnt"), halfEps)
    agg.select(keyCols.map(F.col) ++ Seq(F.col("n_true"),
      F.col("sum_true"),
      F.round(F.col("sum_true").cast("double") /
        F.nullif(F.col("n_true").cast("double"), F.lit(0.0)), 6)
        .as("mean_true"),
      F.round(noisySum, 6).as("noisy_sum"),
      F.round(noisyN, 6).as("noisy_n"),
      F.round(noisySum / noisyN, 6).as("dp_mean")): _*)
      .orderBy(keyCols.map(F.col): _*)
  }

  /** ε-DP quantiles via the EXPONENTIAL MECHANISM (McSherry & Talwar
    * 2007) — the third release in the [[dpNoisyCounts]] family, and
    * the one Laplace noise can't deliver: a quantile's sensitivity to
    * one row is unbounded in VALUE space but exactly 1 in RANK space,
    * so the mechanism scores each candidate cut v by
    * {{{
    *   u(v) = −| #{x ≤ v} − ⌈q·n⌉ |        (rank-space utility, Δu = 1)
    *   P(v) ∝ exp(ε·u(v) / 2)
    * }}}
    * and samples via the GUMBEL-MAX trick: argmax over candidates of
    * ε·u/2 − ln(−ln(unif_v)), with unif_v from the repo's deterministic
    * 24-bit md5 bucket (seed|q-index|cell — auditable, engine-
    * replayable; the [[dpNoisyCounts]] secret-seed caveats apply).
    *
    * '''THE DEFAULT SEED PROVIDES NO PRIVACY.''' With the public default
    * (`"dpq"`) the "noise" is a pure function of the data and anyone can
    * replay it to recover the exact true quantile — the default exists
    * ONLY so tests and oracles can replay the release. A real ε-DP
    * release MUST (a) pass a caller-supplied SECRET, high-entropy `seed`
    * kept out of the release, and (b) pass `auditColumns = false`: the
    * `true_value`/`abs_err_cells` columns are a pre-release utility
    * audit and publishing them voids the privacy guarantee outright.
    *
    * Candidates are the PINNED grid boundaries lo+g, …, hi — a fixed
    * public set, NOT data-derived values (data-derived candidates leak;
    * the grid is the discretization a real release would publish).
    * Values clamp to [lo, hi] first (the [[dpNoisyMean]] bounding
    * contract). Each quantile spends ε independently — releasing all
    * of `qs` costs |qs|·ε by sequential composition.
    *
    * Determinism: integer ranks and targets; one md5 + two ln per
    * (q, candidate); scores 9-dp rounded before the argmax with a
    * candidate-asc tiebreak, so the winner replays bit-identically.
    *
    * Scale shape: one map-side-combined cell collapse (≤ nCells keys),
    * then every table is (nCells × |qs|)-bounded — window cumsum and
    * argmax on broadcast-sized data; no driver state, no second scan.
    * True grid quantiles ride along for the pre-release utility audit
    * (the x440/x443 convention); external releases drop them.
    *
    * @param auditColumns true (default, NON-PRIVATE) keeps the
    *        true_value/abs_err_cells utility-audit columns; a real
    *        release passes false to drop them
    * @return one row per quantile: (q, n, target_rank, true_value,
    *         dp_value, abs_err_cells, epsilon_each) ordered by q —
    *         without true_value/abs_err_cells when
    *         `auditColumns = false`
    */
  def dpQuantileExp(df: DataFrame, valueCol: String, qs: Seq[Double],
                    lo: Long, hi: Long, grid: Long, epsilon: Double,
                    seed: String = "dpq",
                    auditColumns: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"quantiles must be in (0,1), got $qs")
    require(qs.distinct.size == qs.size, s"duplicate quantiles in $qs")
    require(lo < hi && grid > 0 && (hi - lo) % grid == 0,
      s"need lo < hi and grid dividing hi-lo, got [$lo,$hi] step $grid")
    require(epsilon > 0.0 && epsilon <= 100.0,
      s"epsilon must be in (0,100], got $epsilon")
    val nCells = ((hi - lo) / grid).toInt
    require(nCells <= 4096,
      s"candidate grid has $nCells cells (> 4096) — it is broadcast; " +
        "coarsen the grid")
    val spark = df.sparkSession
    import spark.implicits._
    val clamped = F.greatest(F.lit(lo),
      F.least(F.lit(hi), F.col(valueCol).cast("long")))
    val counts = df.filter(F.col(valueCol).isNotNull)
      .select(F.least(F.floor((clamped - F.lit(lo)) / F.lit(grid)),
        F.lit(nCells - 1L)).as("__cell"))
      .groupBy("__cell").agg(F.count(F.lit(1)).as("__c"))
    val cells = spark.range(0, nCells.toLong).select(F.col("id").as("__cell"))
      .join(counts, Seq("__cell"), "left")
      .select(F.col("__cell"),
        F.coalesce(F.col("__c"), F.lit(0L)).as("__c"))
    val cumW = Window.orderBy(F.col("__cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("__cum", F.sum("__c").over(cumW))
    val nTab = counts.agg(F.sum("__c").as("__n"))
    val qTab = qs.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }
      .toDF("__qi", "q")
    val scored = cum.crossJoin(F.broadcast(qTab))
      .crossJoin(F.broadcast(nTab))
      .withColumn("__target",
        F.ceil(F.col("q") * F.col("__n").cast("double")))
      .withColumn("__u",
        -F.abs(F.col("__cum") - F.col("__target")).cast("double"))
      .withColumn("__unif",
        (F.conv(F.substring(F.md5(F.concat(F.lit(s"$seed|"),
          F.col("__qi").cast("string"), F.lit("|"),
          F.col("__cell").cast("string"))), 1, 6), 16, 10)
          .cast("long").cast("double") + F.lit(0.5)) / F.lit(16777216.0))
      .withColumn("__score", F.round(
        F.lit(epsilon / 2.0) * F.col("__u") -
          F.log(-F.log(F.col("__unif"))), 9))
    val byScore = Window.partitionBy("__qi")
      .orderBy(F.col("__score").desc, F.col("__cell").asc)
    val winner = scored.withColumn("__rk", F.row_number().over(byScore))
      .filter(F.col("__rk") === 1)
      .select(F.col("__qi"), F.col("q"), F.col("__n"), F.col("__target"),
        (F.lit(lo) + (F.col("__cell") + 1L) * F.lit(grid)).as("dp_value"),
        F.col("__cell").as("__wcell"))
    if (!auditColumns)
      winner.select(F.col("q"), F.col("__n").as("n"),
        F.col("__target").as("target_rank"), F.col("dp_value"),
        F.lit(epsilon).as("epsilon_each"))
        .orderBy("q")
    else {
      val truth = scored.filter(F.col("__cum") >= F.col("__target"))
        .groupBy("__qi").agg(F.min("__cell").as("__tcell"))
      winner.join(F.broadcast(truth), Seq("__qi"))
        .select(F.col("q"), F.col("__n").as("n"),
          F.col("__target").as("target_rank"),
          (F.lit(lo) + (F.col("__tcell") + 1L) * F.lit(grid))
            .as("true_value"),
          F.col("dp_value"),
          F.abs(F.col("__wcell") - F.col("__tcell")).as("abs_err_cells"),
          F.lit(epsilon).as("epsilon_each"))
        .orderBy("q")
    }
  }

  /** Canonical form of a URL column — the crawl-dedup normalizer: two
    * raw URLs that differ only in scheme/host case, a `www.` prefix, a
    * default port, tracking query parameters (`utm_*`, `gclid`,
    * `fbclid`), a fragment, or trailing slashes are the SAME resource,
    * and exact-hash dedup on the raw string misses all of them.
    * Rules, applied in order:
    *  1. scheme and host lowercase (path/query case is significant)
    *  2. `www.` prefix and `:80`/`:443` default ports dropped
    *  3. fragment (`#…`) dropped
    *  4. tracking parameters dropped, other parameters kept in order;
    *     a query left empty disappears entirely
    *  5. trailing `/`s on the final path dropped
    *
    * Pure regexp_extract/replace chain (RE2-compatible — no
    * lookaround, no backrefs), so it is a codegen'd projection here
    * and replays verbatim in the oracle (DuckDB regexp_replace needs
    * the explicit 'g' flag to match Spark's replace-all default).
    * Non-URL strings (no `scheme://`) pass through unchanged. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = F.lower(F.regexp_extract(url,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = F.lower(F.regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // default-port strip is scheme-aware: ':80' is only redundant under
    // http and ':443' under https — 'http://host:443/x' is a DIFFERENT
    // resource than 'http://host/x' and must not collapse with it
    val wwwless = F.regexp_replace(hostport, "^www\\.", "")
    val host = F.when(scheme === "http",
        F.regexp_replace(wwwless, ":80$", ""))
      .when(scheme === "https", F.regexp_replace(wwwless, ":443$", ""))
      .otherwise(wwwless)
    val rest = F.regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = F.regexp_replace(rest, "#.*$", "")
    // mid-query tracking params: anchored to a [?&] delimiter (kept via
    // $1) so a param whose NAME merely ends in a tracking name
    // ('?xgclid=5&id=2') is never corrupted; the ()+ run consumes
    // consecutive tracking params in one match
    val noTrackMid = F.regexp_replace(noFrag,
      "([?&])((utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*&)+", "$1")
    val noTrack = F.regexp_replace(noTrackMid,
      "[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*$", "")
    val noSlash = F.regexp_replace(noTrack, "/+$", "")
    F.when(scheme === "", url)
      .otherwise(F.concat(scheme, F.lit("://"), host, noSlash))
  }

  /** Leave-one-group-out ablation census — the cheapest honest answer
    * to "which source is dragging the corpus": for every group g and
    * every metric m, the corpus mean of m WITHOUT g's rows, from ONE
    * pass (total sums minus per-group sums — no per-group rescan, no
    * k jobs):
    * {{{
    *   mean_without(g, m) = (Σm − Σ_g m) / (N − n_g)
    *   delta(g, m)        = mean_without − mean_full
    * }}}
    * delta > 0 means removing g RAISES the corpus mean — g sits below
    * average on that metric (the "cut this source first" ranking when
    * the metric is a quality proxy). The exact-long sums make both
    * divisions engine-identical; deltas are near-zero differences, so
    * they carry the sign-of-zero canon (SURVEY §8, the x222 contract)
    * on both sides.
    *
    * Scale shape: one map-side-combined groupBy over (group) carrying
    * one long sum per metric + a 1-row grand total broadcast back —
    * corpus-linear, bounded output (k groups × m metrics).
    *
    * @param metrics (name, long-valued expression) pairs — values are
    *                cast to long (exact sums; pre-quantize continuous
    *                metrics upstream)
    * @return one row per (group, metric): (group, n_docs, share,
    *         metric, mean_full, mean_without, delta) ordered
    */
  def leaveOneOutMeans(df: DataFrame, groupCol: String,
                       metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "need at least one metric")
    require(metrics.map(_._1).distinct.size == metrics.size,
      s"duplicate metric names in ${metrics.map(_._1)}")
    val base = df.filter(F.col(groupCol).isNotNull)
      .select(F.col(groupCol).as("__g") +:
        metrics.map { case (n, c) => c.cast("long").as(s"__m_$n") }: _*)
    val perG = base.groupBy("__g")
      .agg(F.count(F.lit(1)).as("__n"),
        metrics.map { case (n, _) =>
          F.sum(s"__m_$n").as(s"__s_$n") }: _*)
    val tot = base.agg(F.count(F.lit(1)).as("__tn"),
      metrics.map { case (n, _) =>
        F.sum(s"__m_$n").as(s"__ts_$n") }: _*)
    val wide = perG.crossJoin(F.broadcast(tot))
    val longRows = metrics.map { case (n, _) =>
      val meanFull = F.col(s"__ts_$n").cast("double") /
        F.col("__tn").cast("double")
      val meanWo = (F.col(s"__ts_$n") - F.col(s"__s_$n")).cast("double") /
        F.nullif((F.col("__tn") - F.col("__n")).cast("double"),
          F.lit(0.0))
      wide.select(F.col("__g").as(groupCol),
        F.col("__n").as("n_docs"),
        F.round(F.col("__n").cast("double") /
          F.col("__tn").cast("double"), 6).as("share"),
        F.lit(n).as("metric"),
        F.round(meanFull, 6).as("mean_full"),
        F.round(meanWo, 6).as("mean_without"),
        Quant.noNegZero(F.round(meanWo - meanFull, 6)).as("delta"))
    }
    longRows.reduce(_.unionByName(_))
      .orderBy(F.col(groupCol), F.col("metric"))
  }

  /** Dedup census over [[canonicalizeUrl]] — what a crawl frontier
    * gains from canonicalization, in one row: raw-distinct vs
    * canonical-distinct URL counts, how many raw URLs carried each
    * normalizable artifact, and how many canonical groups collapse >1
    * raw variant (the rows exact-hash dedup would have missed).
    *
    * Scale shape: one codegen'd projection + two distinct collapses
    * and a group census — all key-partitioned, nothing driver-side.
    *
    * @return one row (n_urls, n_raw_distinct, n_canon_distinct,
    *         n_tracking, n_www, n_upper_host, n_fragment,
    *         multi_variant_groups, dup_urls)
    */
  def urlDedupCensus(df: DataFrame, urlCol: String): DataFrame = {
    val u = F.col(urlCol)
    val base = df.filter(u.isNotNull)
      .select(u.as("__raw"), canonicalizeUrl(u).as("__canon"),
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
          .as("__hostport"))
      .withColumn("__tracking",
        F.when(
          F.col("__raw").rlike("[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)="),
          1L).otherwise(0L))
      .withColumn("__www",
        F.when(F.lower(F.col("__hostport")).startsWith("www."), 1L)
          .otherwise(0L))
      .withColumn("__upper",
        F.when(F.col("__hostport") =!= F.lower(F.col("__hostport")), 1L)
          .otherwise(0L))
      .withColumn("__frag",
        F.when(F.col("__raw").contains("#"), 1L).otherwise(0L))
    val flat = base.agg(
      F.count(F.lit(1)).as("n_urls"),
      F.countDistinct("__raw").as("n_raw_distinct"),
      F.countDistinct("__canon").as("n_canon_distinct"),
      F.sum("__tracking").as("n_tracking"),
      F.sum("__www").as("n_www"),
      F.sum("__upper").as("n_upper_host"),
      F.sum("__frag").as("n_fragment"))
    val groups = base.select("__raw", "__canon").distinct()
      .groupBy("__canon").agg(F.count(F.lit(1)).as("__variants"))
      .filter(F.col("__variants") > 1L)
      .agg(F.count(F.lit(1)).as("multi_variant_groups"),
        F.coalesce(F.sum(F.col("__variants") - 1L), F.lit(0L))
          .as("dup_urls"))
    flat.crossJoin(F.broadcast(groups))
  }

  /** k-ary randomized response (Warner 1965; generalized RR) — the
    * LOCAL-DP sibling of [[dpNoisyCounts]]: instead of noising the
    * aggregate, each ROW's category is perturbed before collection
    * (report the truth with probability `p`, else one of the k−1 other
    * categories uniformly), and the collector de-biases the observed
    * histogram:
    * {{{
    *   q   = (1 − p) / (k − 1)
    *   n̂_v = (c_v − n·q) / (p − q)
    * }}}
    * The privacy level follows from p and k: ε = ln(p(k−1)/(1−p)) —
    * `p` is the pinned literal (not ε) so the keep/flip comparison is
    * EXACT on both engines: the 24-bit md5 uniform u is compared to a
    * plain double literal, never to an exp() whose last ulp could
    * differ across libms. The flip target is a second independent md5
    * draw mod (k−1), skipping the true category — deterministic per
    * (seed, id), the [[dpNoisyCounts]] replay convention.
    *
    * True counts ride along for the pre-release utility audit (the
    * x440/x443 convention); a REAL release drops n_true and anything
    * derived from raw rows. The category domain must be bounded (it is
    * broadcast); rows are perturbed independently, so the op is one
    * map-side projection + one count rollup at any corpus size.
    *
    * @param p probability of reporting the true category, in (1/k, 1)
    * @return per category (category, n_true, n_obs, n_est, epsilon)
    *         ordered by category; n_est de-biased, 6-dp
    */
  def randomizedResponse(df: DataFrame, catCol: String, idCol: String,
                         p: Double = 0.75,
                         seed: String = "rr"): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val rows = df.select(F.col(idCol).cast("string").as("__id"),
        F.col(catCol).cast("string").as("__cat"))
      .filter(F.col("__cat").isNotNull)
    val cats = rows.select("__cat").distinct()
      .withColumn("__rn", F.row_number().over(
        Window.orderBy(F.col("__cat"))))
    // the domain is bounded by contract (it is broadcast), so an eager
    // driver-side count is in-budget — and it lets us fail FAST on the
    // two degenerate regimes instead of at runtime: k = 1 makes the
    // flip draw `% (k-1)` a division by zero (ANSI throws mid-job),
    // and p <= 1/k makes the de-bias denominator p - q non-positive
    // (q = (1-p)/(k-1) >= p), so n_est would be garbage or undefined
    val k = cats.count()
    require(k >= 2, s"randomizedResponse needs >= 2 categories, got $k")
    require(p > 1.0 / k,
      s"p must exceed 1/k = ${1.0 / k} (k = $k) or the de-bias " +
        s"denominator p - (1-p)/(k-1) is non-positive; got p = $p")
    val kTab = cats.agg(F.count(F.lit(1)).as("__k"))
    val nTab = rows.agg(F.count(F.lit(1)).as("__n"))
    def h24(tag: String) = F.conv(F.substring(
      F.md5(F.concat(F.lit(s"$seed|$tag|"), F.col("__id"))), 1, 6), 16, 10)
      .cast("long")
    val u = (h24("keep").cast("double") + F.lit(0.5)) / F.lit(16777216.0)
    val alt = h24("alt") % (F.col("__k") - 1L)
    val altRn = F.when(alt + 1L < F.col("__rn"), alt + 1L)
      .otherwise(alt + 2L)
    val reported = rows.join(F.broadcast(cats), Seq("__cat"))
      .crossJoin(F.broadcast(kTab))
      .select(F.when(u < F.lit(p), F.col("__rn").cast("long"))
        .otherwise(altRn).as("__rrn"))
    val obs = reported.groupBy("__rrn").agg(F.count(F.lit(1)).as("__c"))
    val tru = rows.groupBy("__cat").agg(F.count(F.lit(1)).as("__ct"))
    val kD = F.col("__k").cast("double")
    val qProb = (F.lit(1.0) - F.lit(p)) / (kD - 1.0)
    val cD = F.coalesce(F.col("__c"), F.lit(0L)).cast("double")
    cats.join(F.broadcast(tru), Seq("__cat"), "left")
      .join(F.broadcast(obs),
        F.col("__rn").cast("long") === F.col("__rrn"), "left")
      .crossJoin(F.broadcast(kTab)).crossJoin(F.broadcast(nTab))
      .select(F.col("__cat").as("category"),
        F.coalesce(F.col("__ct"), F.lit(0L)).as("n_true"),
        F.coalesce(F.col("__c"), F.lit(0L)).as("n_obs"),
        F.round((cD - F.col("__n").cast("double") * qProb) /
          (F.lit(p) - qProb), 6).as("n_est"),
        F.round(F.log(F.lit(p) * (kD - 1.0) / (F.lit(1.0) - F.lit(p))), 6)
          .as("epsilon"))
      .orderBy("category")
  }

  /** FILTER-BIAS audit — does a candidate keep/drop rule fall
    * disproportionately on some sources/languages/groups? Per group:
    * the keep rate, its ratio to the corpus-wide rate, and its ratio to
    * the BEST-kept group — the EEOC four-fifths form: a group whose
    * `impact_ratio < floor` (default 0.8) is flagged as disparately
    * filtered. The pre-flight a curation gate runs before it silently
    * erases a language or a source family from the training mix.
    *
    * Determinism: per-group keep rates 9-dp BEFORE the ratios (both
    * engines divide the same rounded operands), ratios 6-dp; an
    * all-dropped corpus (max rate 0 / corpus rate 0) yields NULL
    * ratios and NULL flags — visible, not fake zeros.
    *
    * Scale shape: one map-side-combined group collapse + a 1-row
    * (total, max-rate) broadcast back. Nothing scales with rows but
    * the first collapse.
    *
    * @param keep the decision under audit, as a boolean Column over
    *             the row (a length gate, a classifier threshold, a
    *             composed C4 rule)
    * @return per group: (group, n, n_kept, keep_rate, rate_vs_corpus,
    *         impact_ratio, flagged) ordered by group
    */
  def filterBiasAudit(df: DataFrame, groupCol: String, keep: Column,
                      floor: Double = 0.8): DataFrame = {
    require(floor > 0.0 && floor <= 1.0, s"floor out of range: $floor")
    val per = df
      .select(F.col(groupCol).cast("string").as("group"),
        F.when(keep, 1L).otherwise(0L).as("__k"))
      .groupBy("group")
      .agg(F.count(F.lit(1)).as("n"), F.sum("__k").as("n_kept"))
      .withColumn("__rate", F.round(F.col("n_kept").cast("double") /
        F.col("n").cast("double"), 9))
    val tot = per.agg(F.sum("n").as("__tn"), F.sum("n_kept").as("__tk"),
      F.max("__rate").as("__mx"))
    per.crossJoin(F.broadcast(tot))
      .select(F.col("group"), F.col("n"), F.col("n_kept"),
        F.round(F.col("__rate"), 6).as("keep_rate"),
        F.round(F.col("__rate") / F.nullif(
          F.round(F.col("__tk").cast("double") /
            F.col("__tn").cast("double"), 9), F.lit(0.0)), 6)
          .as("rate_vs_corpus"),
        F.round(F.col("__rate") / F.nullif(F.col("__mx"), F.lit(0.0)), 6)
          .as("impact_ratio"),
        (F.col("__rate") / F.nullif(F.col("__mx"), F.lit(0.0)) <
          F.lit(floor)).as("flagged"))
      .orderBy("group")
  }
}
