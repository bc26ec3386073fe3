package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression producing a document's DISTINCT word
  * n-gram shingle set in one compiled pass.
  *
  * The relational formulation (posexplode → window(lead×(n-1)) →
  * distinct, DedupQueries.shingleStream) costs a full (doc_id)-sorted
  * window shuffle of the token stream PLUS a distinct shuffle before
  * any dedup work starts; the HOF zip_with chain avoids the shuffle but
  * is CodegenFallback-interpreted. This expression removes both: the
  * per-document set is built in a tight loop (documents are KB-scale;
  * the set fits trivially), so `explode(word_shingle_set(text, n))`
  * yields the (doc_id, shingle) inverted-index pairs with ZERO shuffles
  * before the shingle self-join — the join itself becomes the first
  * exchange, which is the shape that scales.
  *
  * Tokenization is exactly `filter(split(trim(text), ' +'), _ != "")`
  * (TextFunctions.tokens) and the DuckDB oracle's
  * `list_filter(string_split_regex(trim(text), ' +'), ...)`: trim strips
  * ' ' only (Spark's trim semantics, NOT Java's control-char trim), runs
  * of spaces delimit, empty tokens drop. Set order is first-occurrence,
  * which is irrelevant post-explode. */
object ShingleExpressions {

  /** Distinct n-gram shingles of `text`, first-occurrence order. */
  def shingleSet(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // trim ' ' only (Spark trim parity)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = lo
    var start = lo
    while (i <= hi) {
      if (i == hi || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val m = toks.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var j = 0
      while (j < m) {
        val sb = new java.lang.StringBuilder(toks(j))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(j + k)); k += 1 }
        seen.add(sb.toString)
        j += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var x = 0
      while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
      new GenericArrayData(out)
    }
  }

  /** Register `word_shingle_set` (idempotent), usable from expr()/SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingle_set", exprs => WordShingleSet(exprs.head, exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, IntegerType) => n
        case other => throw new IllegalArgumentException(
          s"word_shingle_set(text, n) needs a literal n, got $other")
      }), "built-in")
}

case class WordShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_set needs a string document, got ${child.dataType}")
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleExpressions.shingleSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleExpressions.shingleSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleSet =
    copy(child = newChild)
}
