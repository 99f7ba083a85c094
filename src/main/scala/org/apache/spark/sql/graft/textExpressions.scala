package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from codegen (must be stable public methods). */
object TextKernels {
  def stemTokens(s: UTF8String): ArrayData = {
    val toks = graft.text.Stemmer.stemTokens(s.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  def stemTokensWith(s: UTF8String,
      stops: scala.collection.immutable.Set[String]): ArrayData = {
    val toks = graft.text.Stemmer.stemTokens(s.toString, stops)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  def tokenize(s: UTF8String): ArrayData = {
    val toks = graft.text.Stemmer.tokens(s.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  def bpeCount(s: UTF8String, t: graft.text.BpeTokenizer): Long =
    t.countBytes(s.getBytes).toLong

  def unicodeNormalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // Already-normalized text (the overwhelming majority of a crawled
    // corpus) takes the allocation-free quick-check path.
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def bpeTokens(s: UTF8String, t: graft.text.BpeTokenizer): ArrayData =
    new GenericArrayData(
      t.encodeIds(s.getBytes).map(id => UTF8String.fromString(t.vocabHex(id)): Any))
}

/** `text_to_stem_array(text)`: lowercase, strip non-alphanumerics, split,
  * Snowball-English stem, drop the 33 stopwords.
  * Reference: lantern_extras/src/stemmers.rs:95-116,119-146. */
case class TextToStemArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_to_stem_array"

  override def nullSafeEval(v: Any): Any =
    TextKernels.stemTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.stemTokens($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `text_to_stem_array` with a user stopword set replacing the built-in
  * list (reference `set_user_stopwords`, stemmers.rs:24-63). */
case class TextToStemArrayWith(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_to_stem_array"

  @transient private lazy val stopSet: Set[String] = stopwords.toSet

  override def nullSafeEval(v: Any): Any =
    TextKernels.stemTokensWith(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stops = ctx.addReferenceObj("stopwords", stopSet,
      "scala.collection.immutable.Set")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.stemTokensWith($c, $stops)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `tokenize(text)`: the same normalization without stemming/stopwords
  * (oracle-friendly building block for text stats / dedup). */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.tokenize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `unicode_normalize(text, form)`: Unicode normalization (NFC/NFD/
  * NFKC/NFKD) — the canonicalization step a crawl pipeline runs before
  * hashing, deduplication, or tokenization (the same logical text can
  * arrive composed or decomposed depending on the source encoder, and
  * every downstream hash key disagrees until the forms are unified).
  * Narrow, codegen'd, shuffle-free; the kernel short-circuits
  * already-normalized input (the common case) without allocating. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form '$form' (want NFC/NFD/NFKC/NFKD)")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any =
    TextKernels.unicodeNormalize(v.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.unicodeNormalize($c, $fRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bpe_count(text)`: byte-level BPE token count under a fixed merge
  * table (graft.text.Bpe — the real-tokenizer basis for token stats
  * and sequence packing; the reference has no tokenizer, this is the
  * training-pipeline gap operator). Narrow, codegen'd, shuffle-free. */
case class BpeCount(child: Expression, tokenizer: graft.text.BpeTokenizer)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(v: Any): Any =
    TextKernels.bpeCount(v.asInstanceOf[UTF8String], tokenizer)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("tokenizer", tokenizer,
      "graft.text.BpeTokenizer")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.bpeCount($c, $tok)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bpe_tokens(text)`: the BPE token sequence itself, each token
  * rendered as the lowercase hex of its byte string — the exact
  * representation the DuckDB oracle's merge replay produces, so token
  * IDENTITY (not just counts) is oracle-checkable. */
case class BpeTokens(child: Expression, tokenizer: graft.text.BpeTokenizer)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(v: Any): Any =
    TextKernels.bpeTokens(v.asInstanceOf[UTF8String], tokenizer)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("tokenizer", tokenizer,
      "graft.text.BpeTokenizer")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.bpeTokens($c, $tok)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
