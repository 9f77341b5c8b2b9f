package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §7.3's
  * optional perf tier): whole-stage-codegen'd float-array dot product and
  * squared L2 distance. ~100× faster than the interpreted higher-order-
  * function fold at large pair counts, while producing **bit-identical**
  * results to [[VectorFunctions.dot]]: float multiply → widen to double →
  * double accumulation in index order — the same IEEE op sequence the DuckDB
  * oracle replicates.
  *
  * Null contract: null array input → null result; elements are assumed
  * non-null (embedding fixtures and any sane vector column satisfy this).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += (x.getFloat(i) * y.getFloat(i)).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) ($a.getFloat($i) * $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance with the same determinism contract. */
case class FloatVecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (x.getFloat(i) - y.getFloat(i)).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) ($a.getFloat($i) - $b.getFloat($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 between two double- OR float-arrays — the native kernel
  * behind `Ann.l2sq` / `Pq.l2sqLit`'s centroid-assignment argmins (r21: the
  * interpreted `aggregate(zip_with)` fold evaluates one Catalyst lambda PER
  * ELEMENT, and assignment evaluates k folds per row — the same 30×-class
  * penalty the CharEntropySum scaladoc records). Determinism contract,
  * bit-identical to the fold it replaces: i-ascending, a float element is
  * widened BEFORE the double subtract (exactly `x.cast("double") - c`),
  * acc += d·d. Note d² = (−d)², so left/right orientation cannot change a
  * bit. Length mismatch truncates to min(len) like [[DoubleVecDot]] (the
  * HOF fold would yield NULL there — contracts deliberately diverge, and
  * every call site feeds fixed-width vectors).
  *
  * Registered session-wide as SQL `vec_l2sq`, so the input contract is
  * enforced (r21 ADVICE #1): both sides must be array<double|float> —
  * before this check an array<float> LEFT operand silently read 8-byte
  * slots over 4-byte data (garbage distances, no error). Float is now
  * handled symmetrically on either side.
  */
case class DoubleVecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val leftIsFloat: Boolean = isFloat(left)
  private lazy val rightIsFloat: Boolean = isFloat(right)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double|float> operands, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)) -
        (if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i))
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getR = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val getL = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $getR - $getL;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of index-positions where two long-arrays agree — the MinHash
  * signature-agreement kernel behind `MinHashDedup.estimateJaccard` (r21
  * VERDICT #3: the estimate ran an interpreted 64-element
  * `aggregate(zip_with(sa, sb, when(x===y,1).otherwise(0)))` fold — one
  * Catalyst lambda per element — on EVERY candidate pair of the whole
  * minhash family: d2_minhash_md5/lsh, d3/d10 LSH groups, i3/d13
  * incremental). Bit-identical to the fold: the fold counts matches over
  * the zip_with-padded max-length (pad → null → 0), which equals the count
  * of equal positions below min(len) — exactly this loop. Integer count;
  * the caller's `/ numHashes` division is unchanged. Null array → null,
  * like the fold (zip_with(null,·) → null → aggregate → null).
  */
case class LongVecAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "vec_agree"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> operands, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Double-array dot product — the projected-space kernel of
  * `v20_random_projection` stage 1 (FloatVecDot's domain is array<float>;
  * the JL projection emits array<double>). Determinism contract:
  * index-ascending multiply-accumulate, bit-identical to the interpreted
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold it replaces — for
  * EQUAL-LENGTH inputs only. On length mismatch the kernel truncates to
  * min(len(a), len(b)) and returns a number (the same n = min(...) rule as
  * [[FloatVecProject]]), while `zip_with` null-pads the shorter side and
  * the fold yields NULL — the contracts deliberately diverge there.
  */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Literal-matrix × float-vector projection — the stage-1 kernel of
  * `v20_random_projection` (JL / Achlioptas). out[j] = Σ_i (double)x[i] ·
  * m[j][i], i ascending — the exact IEEE sequence of the interpreted
  * higher-order `transform`/`aggregate` fold it replaces (bit-equality
  * pinned in EngineSpec), but inside whole-stage codegen: HOF expressions
  * have no doGenCode, so the fold otherwise drops the entire projection
  * out of the generated stage and pays a lambda invocation per
  * multiply-add (d_in × d_out per ROW). The matrix is a plan-time literal
  * (JL matrices are tiny by construction); it rides into the generated
  * class as one flat double[] reference.
  *
  * The matrix field is `Seq[Seq[Double]]`, NOT `Array[Array[Double]]`, on
  * purpose (ADVICE r17): arrays compare by reference, so an array-typed
  * case-class field would break equals/hashCode/semanticEquals across
  * instances and with them expression canonicalization, common-subexpression
  * elimination, and plan/exchange reuse for identical projections.
  */
case class FloatVecProject(child: Expression, matrix: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dOut = matrix.length
  private val dIn = if (dOut == 0) 0 else matrix.head.length
  require(matrix.forall(_.length == dIn), "ragged projection matrix")
  @transient private lazy val flat: Array[Double] = matrix.flatten.toArray

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "float_vec_project"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dIn)
    val out = new Array[Double](dOut)
    var j = 0
    while (j < dOut) {
      val off = j * dIn
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * flat(off + i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("projMatrix", flat, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dIn);
         |double[] $out = new double[$dOut];
         |for (int $j = 0; $j < $dOut; $j++) {
         |  int $off = $j * $dIn;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $m[$off + $i];
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of common elements between two SORTED, DUPLICATE-FREE string
  * arrays — the exact-verify kernel of the prefix-filter dedup family
  * (r22). The declarative `size(array_intersect(ta, tb))` builds a hash
  * set of one side and probes the other PER CANDIDATE PAIR (hashing ~|ta|
  * UTF8Strings and allocating the set each evaluation); on the d12 fixture
  * that is 7.5M candidate pairs × ~80 string hashes. Sorting each doc's
  * array ONCE (corpus-side, inside the broadcast projection:
  * `sort_array(array_distinct(...))`) lets every pair evaluation be a
  * single allocation-free merge over binary-ordered UTF8Strings.
  *
  * EXACTNESS: for sorted duplicate-free inputs the merge count equals
  * |A∩B| = `size(array_intersect(A, B))` — the oracle-pinned value.
  * `sort_array` orders strings by UTF8String binary comparison, the same
  * comparator this merge uses. Null contract: null array → null; elements
  * are assumed non-null (token arrays). Inputs that are NOT sorted or NOT
  * duplicate-free are out of contract (callers own the sort_array +
  * array_distinct composition).
  */
case class SortedStringIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_isect_count"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> operands, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { acc += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $acc = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $acc++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the native expressions (Spark 4's public Column
  * API has no Expression constructor, so they are exposed through the
  * function registry and invoked with `call_function`).
  */
object NativeFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "float_vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "float_vec_l2sq", exprs => FloatVecL2Sq(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNGrams(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig_h", exprs => MinHashFromHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_h", exprs => SimHashFromHashes(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "char_entropy_sum", exprs => CharEntropySum(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "double_vec_dot", exprs => DoubleVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_l2sq", exprs => DoubleVecL2Sq(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_agree", exprs => LongVecAgree(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_isect_count",
      exprs => SortedStringIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "regexp_groups", exprs => RegexpGroups(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "float_vec_project", exprs => FloatVecProject(exprs(0), {
        // the matrix argument must be a literal (it becomes part of the
        // generated class); evaluated once at resolution
        val rows = exprs(1).eval().asInstanceOf[ArrayData]
        (0 until rows.numElements()).map(r =>
          rows.getArray(r).toDoubleArray().toSeq): Seq[Seq[Double]]
      }), "built-in")
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime row-level filtering but does NOT expose them in the public
    // registry — surface them for the BloomPrune operator.
    reg.createOrReplaceTempFunction(
      "bloom_filter_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1)), "built-in")
  }
}
