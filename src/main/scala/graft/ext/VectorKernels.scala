package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity over two `array<float>` columns in ONE
  * pass (dot + both norms in the same loop), with `doGenCode` so it
  * stays inside whole-stage codegen — no per-element boxing, unlike the
  * higher-order-function formulation (SURVEY.md §7.3: custom Expression
  * is the upgrade path when HOF throughput disappoints; it did — 25 s →
  * ~2 s on the sf0.1 pairwise query).
  */
case class FloatCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine_f expects (array<float>, array<float>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i);
          double $yv = (double) $b.getFloat($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Signed-random-projection (SRP) signature of a float vector: bit p of
  * the result is the sign of the dot product with pseudo-random
  * hyperplane p, whose ±1 components derive from splitmix64 of
  * (seed, p, i) — deterministic, no stored plane matrix, O(planes×dim)
  * per row, map-side only. Vectors with high cosine similarity agree on
  * most bits, so exact-signature (or banded) self-joins generate
  * near-dup candidates without any quadratic pass — the LSH-for-cosine
  * scale path (Charikar SRP-LSH, public literature).
  */
case class FloatSrpSignature(child: Expression, numPlanes: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 64, "numPlanes must be in 1..64")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sig expects array<float>, got $t")
  }

  /** Shared by interpreted eval and codegen (one virtual call per row —
    * the per-element loop stays primitive either way).
    */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        var z = seed + p.toLong * 1000003L + i.toLong + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        val v = a.getFloat(i).toDouble
        dot += (if ((z & 1L) == 1L) v else -v)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srp", this, classOf[FloatSrpSignature].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): FloatSrpSignature =
    copy(child = newChild)
}

/** SimHash over a pre-hashed token array (`array<long>`): one pass
  * accumulates all `bits` sign-sums in a local counter array — the
  * higher-order-function formulation needs `bits` interpreted passes
  * over the same array. Bit b of the result is set iff more token
  * hashes have bit b set than clear (Charikar's simhash).
  */
case class LongArraySimhash(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits > 0 && bits <= 64, "bits must be in 1..64")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<long>, got $t")
  }

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[LongArraySimhash].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): LongArraySimhash =
    copy(child = newChild)
}

/** MinHash signature of an `array<string>` shingle set in ONE pass:
  * for each element, all `numHashes` splitmix64-seeded hashes update
  * their running minima — the `transform`+`array_min` formulation walks
  * the array once per hash family through interpreted lambdas.
  */
case class StringArrayMinhash(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, "numHashes must be in 1..512")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<string>, got $t")
  }

  // hash family k = splitmix64 mix of one base string hash — one pass
  // over the characters total, instead of one pass per family (16×
  // fewer string walks for the default signature)
  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val base = Kernels.hashChars(a.getUTF8String(i).toString, 0L)
        var k = 0
        while (k < numHashes) {
          val h = Kernels.mix(base, k + 1L)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[StringArrayMinhash].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): StringArrayMinhash =
    copy(child = newChild)
}

/** Distinct word n-gram shingle HASHES of a token array in ONE pass:
  * each shingle (n consecutive tokens joined by a space) is hashed
  * directly — the shingle string never materializes in the plan, and
  * dedup happens in a local hash set. Replaces the interpreted
  * `transform(sequence)+slice+concat_ws+array_distinct` chain, which
  * dominated MinHash runtime (HOFs are not codegen'd). Hash values
  * equal `hash64(shingleString, 0)`, so [[LongArrayMinhash]] over the
  * output is bit-identical to [[StringArrayMinhash]] over the string
  * shingles. Texts shorter than n tokens yield one full-text shingle
  * (same contract as `Dedup.wordShingles`).
  */
case class StringArrayShingleHashes(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects array<string>, got $t")
  }

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ntok = a.numElements()
    val count = if (ntok == 0) 0 else math.max(ntok - n + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var len = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val m = math.min(n, ntok - i)
      var j = 0
      while (j < m) {
        if (j > 0) sb.append(' ')
        if (!a.isNullAt(i + j)) sb.append(a.getUTF8String(i + j).toString)
        j += 1
      }
      val h = Kernels.hashChars(sb, 0L)
      if (seen.add(h)) { out(len) = h; len += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, len))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[StringArrayShingleHashes].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StringArrayShingleHashes = copy(child = newChild)
}

/** Distinct word n-gram shingle STRINGS of a token array in ONE
  * pass — the exact-string sibling of [[StringArrayShingleHashes]]
  * for consumers whose downstream needs the gram itself (novelty
  * joins against a reference gram set, gram frequency reports).
  * First-occurrence order matches `array_distinct(transform(...))`;
  * texts shorter than n tokens yield an EMPTY array (the strict
  * n-gram contract — no full-text fallback). Replaces the
  * interpreted `transform(sequence)+element_at+concat_ws+
  * array_distinct` chain, which is not codegen'd (HOFs) and
  * dominated the exact-novelty runtime 16× over its hashed twin.
  */
case class StringArrayShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_strings expects array<string>, got $t")
  }

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ntok = a.numElements()
    val count = if (ntok < n) 0 else ntok - n + 1
    val seen = new java.util.HashSet[String](count * 2)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var len = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      var emitted = false // concat_ws skips nulls WITHOUT a separator: (a,null,c) -> "a c"
      while (j < n) {
        if (!a.isNullAt(i + j)) {
          if (emitted) sb.append(' ')
          sb.append(a.getUTF8String(i + j).toString)
          emitted = true
        }
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        out(len) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        len += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, len))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleStrings", this,
      classOf[StringArrayShingles].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StringArrayShingles = copy(child = newChild)
}

/** md5-prefix BUCKETS of every word n-gram occurrence of a token
  * array, in ONE pass — the DSIR feature-hash kernel: for each of the
  * `size - n + 1` n-grams (multiplicity KEPT — this is a bag-of-buckets
  * language-model feature vector, not a dedup shingle set) emit
  * `substring(md5(concat_ws(' ', gram)), 1, prefixLen)`. Replaces the
  * interpreted `transform(sequence)+slice+concat_ws` HOF chain (HOFs
  * are CodegenFallback) followed by Spark's `md5` (full 32-char hex
  * materialization per occurrence, then substring): here the gram
  * bytes go straight into a per-row MessageDigest and only the prefix
  * chars materialize. Value-identical to the chain it replaces —
  * md5 of the UTF-8 gram bytes, lowercase hex — so the md5-prefix
  * oracle convention is untouched; pinned ≡ in PropertySpec.
  * Fewer than n tokens yields an EMPTY array (the `when(size < n)`
  * guard it replaces); null element semantics match concat_ws (skip,
  * no separator).
  */
case class StringArrayGramBuckets(child: Expression, n: Int, prefixLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  require(prefixLen >= 1 && prefixLen <= 32, "prefixLen must be in 1..32")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets expects array<string>, got $t")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ntok = a.numElements()
    val count = if (ntok < n) 0 else ntok - n + 1
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    // one digest per ROW (compute runs concurrently across tasks —
    // MessageDigest is not thread-safe, and getInstance is cheap
    // relative to the per-gram digest work it amortizes)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val nHex = prefixLen
    val nBytes = (nHex + 1) / 2
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      var emitted = false // concat_ws skips nulls WITHOUT a separator
      while (j < n) {
        if (!a.isNullAt(i + j)) {
          if (emitted) sb.append(' ')
          sb.append(a.getUTF8String(i + j).toString)
          emitted = true
        }
        j += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](nHex)
      var b = 0
      while (b < nBytes) {
        val v = digest(b) & 0xff
        hex(2 * b) = hexDigits(v >>> 4)
        if (2 * b + 1 < nHex) hex(2 * b + 1) = hexDigits(v & 0xf)
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(hex))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBuckets", this,
      classOf[StringArrayGramBuckets].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StringArrayGramBuckets = copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles (`array<long>`): hash
  * family k is a splitmix64 mix of the base hash — one array walk
  * total. Produces the same signature as [[StringArrayMinhash]] when
  * the input hashes are `hash64(shingle, 0)`.
  */
case class LongArrayMinhash(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, "numHashes must be in 1..512")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig_l expects array<long>, got $t")
  }

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = a.getLong(i)
      var k = 0
      while (k < numHashes) {
        val h = Kernels.mix(base, k + 1L)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashL", this, classOf[LongArrayMinhash].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): LongArrayMinhash =
    copy(child = newChild)
}

/** Shared splitmix64-based hashing used by the string/long kernels. */
private[ext] object Kernels {
  def mix(base: Long, k: Long): Long = {
    var z = base + k * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashChars(s: CharSequence, seed: Long): Long = {
    var h = seed ^ 0x9E3779B97F4A7C15L
    var i = 0
    while (i < s.length) {
      var z = h ^ s.charAt(i).toLong
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      h = z ^ (z >>> 31)
      i += 1
    }
    h
  }
}

/** Extension point for `--conf spark.sql.extensions=graft.ext.GraftExtensions`:
  * injects the vector kernels at session build time so pure-SQL users
  * (`spark.sql("SELECT graft_cosine_f(a, b) ...")`) get them without any
  * API call. Runtime registration via [[VectorKernels.register]] covers
  * sessions built without the conf.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine_f"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatCosineSimilarity].getName, "graft_cosine_f"),
      (exprs: Seq[Expression]) => FloatCosineSimilarity(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => graft.plans.RewriteNotIn)
    // srp/simhash/minhash kernels + the minhash aggregate register at
    // first library use (VectorKernels.register / MinHashAgg.register)
  }
}

/** Session registration + Column surface for the vector kernels. */
object VectorKernels {
  private val cosineName = "graft_cosine_f"
  private val srpName = "graft_srp_sig"
  private val simhashName = "graft_simhash"
  private val minhashSigName = "graft_minhash_sig"
  private val shingleHashesName = "graft_shingle_hashes"
  private val shingleStringsName = "graft_shingle_strings"
  private val minhashSigLName = "graft_minhash_sig_l"
  private val gramBucketsName = "graft_gram_buckets"

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineName, exprs => FloatCosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      srpName, exprs => FloatSrpSignature(
        exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int].toLong), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      simhashName, exprs => LongArraySimhash(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      minhashSigName, exprs => StringArrayMinhash(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      shingleHashesName, exprs => StringArrayShingleHashes(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      shingleStringsName, exprs => StringArrayShingles(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      minhashSigLName, exprs => LongArrayMinhash(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      gramBucketsName, exprs => StringArrayGramBuckets(
        exprs(0), exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
  }

  /** Cosine similarity of two float-vector columns (requires
    * [[register]] on the session first).
    */
  def cosineF(a: Column, b: Column): Column = call_function(cosineName, a, b)

  /** SRP signature of a float-vector column (literal planes/seed). */
  def srpSig(v: Column, numPlanes: Int, seed: Int): Column =
    call_function(srpName, v, org.apache.spark.sql.functions.lit(numPlanes),
      org.apache.spark.sql.functions.lit(seed))

  /** One-pass simhash over an `array<long>` of token hashes.
    * Self-registers on the active session so pure-column library code
    * (graft.ext.Dedup) can use it without threading a session through.
    */
  def simhashL(hashes: Column, bits: Int): Column = {
    register(SparkSession.active)
    call_function(simhashName, hashes, org.apache.spark.sql.functions.lit(bits))
  }

  /** One-pass MinHash signature over an `array<string>` shingle set. */
  def minhashSig(shingles: Column, numHashes: Int): Column = {
    register(SparkSession.active)
    call_function(minhashSigName, shingles, org.apache.spark.sql.functions.lit(numHashes))
  }

  /** Distinct n-gram shingle hashes of a token array (one pass, no
    * shingle-string materialization).
    */
  def shingleHashes(tokens: Column, n: Int): Column = {
    register(SparkSession.active)
    call_function(shingleHashesName, tokens, org.apache.spark.sql.functions.lit(n))
  }

  /** Distinct n-gram shingle STRINGS of a token array (one pass;
    * strict contract — fewer than n tokens yields an empty array).
    */
  def shingleStrings(tokens: Column, n: Int): Column = {
    register(SparkSession.active)
    call_function(shingleStringsName, tokens, org.apache.spark.sql.functions.lit(n))
  }

  /** One-pass MinHash signature over pre-hashed shingles (`array<long>`). */
  def minhashSigL(hashes: Column, numHashes: Int): Column = {
    register(SparkSession.active)
    call_function(minhashSigLName, hashes, org.apache.spark.sql.functions.lit(numHashes))
  }

  /** md5-prefix bucket of every word n-gram OCCURRENCE of a token
    * array (multiplicity kept) — the DSIR feature-hash kernel.
    */
  def gramBuckets(tokens: Column, n: Int, prefixLen: Int): Column = {
    register(SparkSession.active)
    call_function(gramBucketsName, tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(prefixLen))
  }
}
