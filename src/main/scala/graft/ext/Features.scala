package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-scaling operators over embedding columns (`array<float>`):
  * per-dimension corpus statistics and min-max normalization — the
  * standard preprocessing before distance-based similarity or model
  * input. Min/max are EXACT aggregates (no floating accumulation
  * order), so unlike mean/stddev the statistics — and the scaled
  * values, one IEEE subtract + divide each — are bit-identical across
  * engines and across any partitioning: the rare fully
  * hash-checkable float pipeline.
  */
object Features {

  /** Per-dimension (dim, vmin, vmax) over the vector column, dim
    * 0-based. One posexplode map pass + one aggregation keyed on the
    * dimension index — output is O(dim) rows regardless of corpus
    * size.
    */
  def dimMinMax(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))

  /** Min-max scale in exploded row form: (id, dim, v, vmin, vmax,
    * scaled) with scaled = (v − vmin)/(vmax − vmin), all in double.
    * The O(dim)-row stats frame rides a broadcast join, so the vector
    * side never shuffles. Constant dimensions (vmax = vmin) scale to
    * NULL (`try_divide` — ANSI mode would otherwise raise on the zero
    * range) rather than an arbitrary constant — callers decide.
    */
  def minMaxScaleRows(
      df: DataFrame, idCol: String, vecCol: String, stats: DataFrame): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .join(broadcast(stats), Seq("dim"))
      .select(col(idCol), col("dim"),
        col("v").cast("double").as("v"),
        col("vmin").cast("double").as("vmin"),
        col("vmax").cast("double").as("vmax"))
      .withColumn("scaled",
        try_divide(col("v") - col("vmin"), col("vmax") - col("vmin")))

  /** Min-max scale keeping the vector SHAPE: the stats (O(dim)
    * doubles, collected driver-side — the one permissible collect,
    * like the k-means centroids) become literal arrays and the scan
    * is a pure map pass with zero shuffle and zero join — the 100 TB
    * form. Parity with [[minMaxScaleRows]] is pinned by FeaturesSpec.
    */
  /** Collected literal (mins, maxs) arrays from a stats frame — the
    * shared driver hop of the map-only vector forms. The literal
    * arrays are indexed positionally by dim, so a stats frame with
    * gaps or a non-0-based dim set (which would silently misalign
    * every dimension after the gap) is refused loudly.
    */
  private def statsLiterals(stats: DataFrame): (Column, Column) = {
    val collected = stats.select(col("dim"), col("vmin").cast("double"),
        col("vmax").cast("double"))
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2))))
      .sortBy(_._1)
    require(collected.map(_._1).sameElements(collected.indices),
      "stats must cover a contiguous 0-based dim range; found: " +
        collected.map(_._1).mkString("[", ",", "]"))
    (typedlit(collected.map(_._2._1)), typedlit(collected.map(_._2._2)))
  }

  /** Per-element map over `vec` zipped with its 0-based index, guarded
    * for empty arrays: `sequence(0, size - 1)` DESCENDS to [0, -1]
    * when size = 0 and the i = −1 element crashes `element_at` — an
    * empty vector must yield an empty result (of `resultType`, which
    * both branches of the guard must share) instead.
    */
  private def zipWithDim(vec: Column, resultType: String)(
      f: (Column, Column) => Column): Column =
    when(size(vec) === 0, vec.cast(resultType))
      .otherwise(zip_with(vec.cast("array<double>"),
        sequence(lit(0), size(vec) - 1), f))

  def scaleVectors(
      df: DataFrame, idCol: String, vecCol: String, stats: DataFrame): DataFrame = {
    val (mins, maxs) = statsLiterals(stats)
    df.select(col(idCol),
      zipWithDim(col(vecCol), "array<double>")(
        (x, i) => try_divide(x - element_at(mins, i + 1),
          element_at(maxs, i + 1) - element_at(mins, i + 1))).as("scaled_vec"))
  }

  /** Scalar uint8 quantization of the vector column against
    * per-dimension [vmin, vmax] stats: code = round(255·(v−vmin)/
    * (vmax−vmin)), clamped to [0, 255]; constant dimensions code to 0.
    * The 4× (vs float32) storage cut that makes billion-vector ANN
    * indexes fit in memory — reconstruction error is bounded by half a
    * step, (vmax−vmin)/510 per dimension. Same literal-stats map-only
    * plan as [[scaleVectors]] (zero shuffle, zero join), and every
    * arithmetic step is order-free IEEE, so the codes — not just their
    * statistics — are reproducible bit-for-bit in an oracle engine.
    */
  def quantizeVectors(
      df: DataFrame, idCol: String, vecCol: String, stats: DataFrame): DataFrame = {
    val (mins, maxs) = statsLiterals(stats)
    df.select(col(idCol),
      zipWithDim(col(vecCol), "array<int>")(
        (x, i) => {
          val lo = element_at(mins, i + 1)
          val hi = element_at(maxs, i + 1)
          // explicit constant-dim branch: NULL-through-greatest varies
          // by engine, a CASE does not
          when(hi === lo, lit(0)).otherwise(
            least(lit(255L), greatest(lit(0L),
              round(try_divide(x - lo, hi - lo) * 255.0, 0).cast("long")))
              .cast("int"))
        }).as("codes"))
  }

  /** Inverse of [[quantizeVectors]]: v̂ = vmin + code/255·(vmax−vmin)
    * (constant dimensions reconstruct to vmin exactly). Map-only, same
    * literal-stats plan.
    */
  def dequantizeVectors(
      df: DataFrame, idCol: String, codesCol: String, stats: DataFrame): DataFrame = {
    val (mins, maxs) = statsLiterals(stats)
    df.select(col(idCol),
      zipWithDim(col(codesCol), "array<double>")(
        (c, i) => {
          val lo = element_at(mins, i + 1)
          val hi = element_at(maxs, i + 1)
          lo + (c / lit(255.0)) * (hi - lo)
        }).as("recon_vec"))
  }
}
