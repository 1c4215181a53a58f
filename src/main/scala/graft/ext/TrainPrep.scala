package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators: deterministic corpus splitting,
  * fixed-token-budget sequence packing, and benchmark decontamination.
  * The three set-level jobs an LLM pretraining pipeline runs AFTER
  * dedup/quality filtering (`ext/Dedup`, `ext/Text`) and before
  * tokenized shards ship.
  *
  * All three are pure DataFrame compositions — map passes, one keyed
  * shuffle, or a broadcast semi-join — and all use the portable
  * md5-hash convention where hashing is involved, so every operator is
  * exactly reproducible in an oracle engine.
  */
object TrainPrep {

  /** Number of md5-prefix buckets used by [[hashSplit]]: 16³ (three
    * hex chars), the same bucket arithmetic as the CMS aggregate.
    */
  val SplitBuckets: Int = 4096

  /** Deterministic id-hash bucket in [0, 4096): the first three hex
    * chars of md5(id) — portable (an oracle decodes the same three
    * chars positionally), uniform, and STABLE: a document's split
    * never changes when the corpus grows, which is the property that
    * keeps yesterday's eval set out of tomorrow's train set.
    */
  def splitBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 3), 16, 10).cast("int")

  /** Deterministic train/val/test (or any) split. `cuts` are
    * (label, upperBucketExclusive) pairs, ascending, last one at
    * [[SplitBuckets]] — e.g. 80/10/10 ≈
    * `Seq("train" -> 3277, "val" -> 3687, "test" -> 4096)`.
    * Pure map pass (no shuffle, no RNG): membership is a function of
    * the id alone, so the split is reproducible across runs, engines,
    * and corpus versions.
    */
  def hashSplit(df: DataFrame, idCol: String, cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == SplitBuckets,
      s"last cut must close the range at $SplitBuckets")
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be ascending")
    val b = splitBucket(col(idCol))
    val label = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), rest) => when(b < upper, lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Contiguous sequence packing: within each `groupCol` shard, order
    * documents by `orderCol`, lay their tokens end-to-end, and cut a
    * bin every `budget` tokens — a document lands in the bin where its
    * FIRST token falls (boundaries may straddle bins, exactly like
    * fixed-length pretraining sequence assembly over a concatenated
    * shard). One window (one shuffle on the shard key); at 100 TB the
    * shard key IS the storage shard, so packing never needs a global
    * sort — the real pipelines pack per shard for the same reason.
    * Emits `bin` plus the document's start offset within its shard.
    */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tokenCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("start_offset", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("bin", floor(col("start_offset") / budget).cast("long"))
  }

  /** Overlapping fixed-size token chunking: each document's token
    * sequence is cut into windows of `chunkSize` tokens whose starts
    * step by `stride` (stride < chunkSize ⇒ consecutive chunks share
    * `chunkSize − stride` tokens of context — the standard sliding
    * context-window prep for long documents). Chunk starts are
    * 0, stride, 2·stride, …; the chunk count is
    * ⌈(n − chunkSize)/stride⌉ + 1 (one chunk when n ≤ chunkSize), so
    * the final chunk may run short rather than re-reading earlier
    * tokens. Pure map pass + explode — no shuffle, no state; chunk
    * identity is (doc, chunk_id), deterministic across engines.
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkSize, lit(1L))
          .otherwise(expr(s"(n_tokens - $chunkSize + ${stride - 1}) div $stride") + 1L))
      .select(col(idCol), col("toks"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        col("chunk_toks"), size(col("chunk_toks")).as("n_chunk_tokens"))
  }

  /** Deterministic quota sampling: keep (up to) `quota` documents per
    * `groupCol` — the corpus-mixing knob ("N docs per language/source")
    * — selected by portable md5-hash rank instead of RNG, so the
    * sample is uniform-random-like yet exactly reproducible across
    * runs and engines. One window per group key (one keyed shuffle);
    * at scale prefilter obvious non-members cheaply if quotas are
    * tiny relative to group sizes. Unlike [[hashSplit]], membership is
    * NOT stable under corpus growth (new docs can displace old ones
    * inside the quota) — that is inherent to fixed-size sampling.
    */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val h = substring(md5(col(idCol).cast("string")), 1, 15)
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }

  /** Deterministic weighted sampling WITHOUT replacement per group
    * (Efraimidis–Spirakis A-ES, public algorithm): keep the `k` items
    * with the largest `u^(1/w)` — equivalently the largest
    * `ln(u) / w` — where `u ∈ (0, 1]` derives from md5(id) instead of
    * an RNG. Inclusion probability scales with weight, and the sample
    * is exactly reproducible across runs, shards, and engines — the
    * corpus-mixing knob (domain up/down-sampling by quality or source
    * weight) in a replayable pipeline.
    *
    * The uniform uses the first THIRTEEN md5 hex digits (52 bits):
    * every intermediate value stays below 2^53, so the int→double
    * conversion and the oracle's positional digit reconstruction are
    * both EXACT — no float divergence in the ranking key. One window
    * pass per group; a top-k heap aggregate replaces the full sort at
    * extreme group sizes.
    */
  def weightedSample(
      df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double")
    val u = (h + lit(1.0)) / lit(math.pow(16.0, 13))
    val esKey = log(u) / col(weightCol)
    val w = Window.partitionBy(col(groupCol)).orderBy(esKey.desc, col(idCol).asc)
    df.withColumn("__es_rank", row_number().over(w))
      .filter(col("__es_rank") <= k)
      .drop("__es_rank")
  }

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one word `n`-gram with any OTHER document of the benchmark
    * set — the standard eval-leakage check (n-gram collision against
    * held-out benchmarks) run as a shingle semi-join.
    *
    * The benchmark side is exploded to DISTINCT shingles and
    * broadcast (benchmarks are small by construction); the corpus
    * side streams through one map pass + the broadcast join, so the
    * cost is O(corpus shingles) with no shuffle of corpus text. At
    * 100 TB swap the shingle STRINGS for the codegen'd 64-bit shingle
    * hashes ([[VectorKernels.shingleHashes]]) — same plan shape,
    * narrower rows; the string form is kept here for exact
    * cross-engine oracles.
    */
  def contaminatedDocs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    contaminatedBy(corpus, benchmark, idCol,
      explode(Dedup.wordShingles(col(textCol), n)))

  /** The 100 TB form of [[contaminatedDocs]]: shingles ride the
    * broadcast join as 64-bit hashes from the codegen'd
    * [[VectorKernels.shingleHashes]] kernel instead of strings — one
    * char-walk per shingle, ~8-byte join keys, identical answers up
    * to hash collisions (P ≈ shingles²/2⁶⁴ per doc, negligible;
    * parity-tested). Use the string form when an exact cross-engine
    * oracle is needed, this one when the corpus is large.
    */
  def contaminatedDocsHashed(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    contaminatedBy(corpus, benchmark, idCol,
      explode(VectorKernels.shingleHashes(Text.tokens(col(textCol)), n)))

  private def contaminatedBy(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      shingleExpr: Column): DataFrame = {
    def shingled(df: DataFrame, idAs: String): DataFrame =
      df.select(col(idCol).as(idAs), shingleExpr.as("sh"))
    val bench = broadcast(shingled(benchmark, "bench_id").distinct())
    val hits = shingled(corpus, "doc_id")
      .join(bench, Seq("sh"))
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id"))
      .distinct()
      .withColumn("contaminated", lit(true))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }
}
