package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.functions.Impls

/** Expression <-> Column bridge. Lives under org.apache.spark.sql because
  * the APIs it touches are private[sql]; this is the conventional extension
  * point for third-party Catalyst expression libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def parseExpression(spark: org.apache.spark.sql.SparkSession, sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)
  def substitute(template: Expression, byName: Map[String, Expression]): Expression =
    template.transformUp {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if byName.contains(a.name) => byName(a.name)
    }
}

/** Native Catalyst expressions for the reference's domain functions
  * (SURVEY.md §2.5, §4 custom-Catalyst inventory). All of them stay inside
  * whole-stage codegen: the generated code calls the static methods on
  * [[Impls]] directly — no UDF boxing, no codegen fallback.
  */
case class NmeaChecksum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nmea_checksum"
  override protected def nullSafeEval(v: Any): Any =
    Impls.nmeaChecksum(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.nmeaChecksum($c)")
  override protected def withNewChildInternal(c: Expression): NmeaChecksum = copy(c)
}

case class NmeaValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "nmea_valid"
  override protected def nullSafeEval(v: Any): Any =
    Impls.nmeaValid(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.nmeaValid($c)")
  override protected def withNewChildInternal(c: Expression): NmeaValid = copy(c)
}

case class Crc16Modbus(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "crc16_modbus"
  override protected def nullSafeEval(v: Any): Any =
    Impls.crc16Modbus(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.crc16Modbus($c)")
  override protected def withNewChildInternal(c: Expression): Crc16Modbus = copy(c)
}

/** Jaro-Winkler similarity as a codegen'd binary expression — the
  * record-linkage scorer behind fuzzy blocking joins. Semantics pinned to
  * the classic Winkler 1990 definition (boost threshold 0.7, prefix
  * weight 0.1, prefix cap 4), which DuckDB's jaro_winkler_similarity
  * shares — the oracle replays it exactly.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impls.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impls.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(l, r)
}

case class Lrc8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lrc8"
  override protected def nullSafeEval(v: Any): Any =
    Impls.lrc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.lrc($c)")
  override protected def withNewChildInternal(c: Expression): Lrc8 = copy(c)
}

/** signed_nbit(value, bits): two's-complement reinterpret of the low
  * `bits` bits (8/10/12/16/20/24 in the reference).
  */
case class SignedNBit(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "signed_nbit"
  override protected def nullSafeEval(v: Any, b: Any): Any =
    Impls.signedNBit(v.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) => s"graft.functions.Impls.signedNBit($v, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SignedNBit =
    copy(l, r)
}

case class BcdDecode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bcd_decode"
  override protected def nullSafeEval(v: Any): Any =
    Impls.bcdDecode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.bcdDecode($c)")
  override protected def withNewChildInternal(c: Expression): BcdDecode = copy(c)
}

case class BcdEncode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bcd_encode"
  override protected def nullSafeEval(v: Any): Any =
    Impls.bcdEncode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.bcdEncode($c)")
  override protected def withNewChildInternal(c: Expression): BcdEncode = copy(c)
}

/** simhash64(tokens): 64-bit Charikar fingerprint of a string array. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    Impls.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** rolling_hash(s): 31-poly rolling hash mod 1e9+7 (doc fingerprint). */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(v: Any): Any =
    Impls.rollingHash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

/** modbus_decode(frame): decode a Modbus RTU frame (BinaryType) into
  * struct(slave INT, func INT, registers ARRAY<INT>, crc_ok BOOLEAN).
  * Registers are extracted for read responses (func 3/4: byte-count +
  * 16-bit big-endian words) and single-write echoes (func 5/6: addr +
  * value); the trailing CRC16 is little-endian (public Modbus spec;
  * reference frame handling `/root/reference/src/io/stream/serialport/
  * ModbusStream.java`).
  */
case class ModbusDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("slave", IntegerType),
    StructField("func", IntegerType),
    StructField("registers", ArrayType(IntegerType)),
    StructField("crc_ok", BooleanType)))
  override def prettyName: String = "modbus_decode"
  override protected def nullSafeEval(v: Any): Any =
    Impls.modbusDecode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.modbusDecode($c)")
  override protected def withNewChildInternal(c: Expression): ModbusDecode = copy(c)
}

/** shingles(tokens, n): distinct word n-grams joined by single spaces, in
  * first-occurrence order — the native twin of the transform/slice/
  * concat_ws lambda rendering (array HOFs are CodegenFallback and
  * dominate shingle-heavy dedup pipelines; this stays in generated code).
  * Returns an empty array when fewer than n tokens.
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(toks: Any, n: Any): Any =
    Impls.shingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.Impls.shingles($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Shingles =
    copy(l, r)
}

/** vec_dot(a, b): double-precision dot product in ascending index order —
  * identical accumulation to the aggregate(zip_with(..)) lambda rendering
  * (array HOFs are CodegenFallback; this stays in generated code).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impls.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impls.vecDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}

/** vec_sqdist(a, b): squared L2 distance in ascending index order —
  * identical accumulation to the aggregate(zip_with((x,y) => (x-y)*(x-y)))
  * lambda rendering (array HOFs are CodegenFallback and dominated the
  * literal-centroid ANN scoring passes; this stays in generated code).
  */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impls.vecSqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impls.vecSqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(l, r)
}

/** dtw_dist(a, b): integer dynamic-time-warping distance between two
  * long-array series in one codegen'd call — tier (b) of the custom-op
  * ladder for a whole DP kernel (a lambda rendering would need a
  * sequential inner fold that array HOFs cannot express without
  * quadratic nesting, all interpreted).
  */
case class DtwDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impls.dtwDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impls.dtwDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DtwDist =
    copy(l, r)
}

/** znorm_dist(win, pattern): Euclidean distance between the z-normalized
  * window (population std) and a query pattern, NaN when the window is
  * constant (std = 0). Accumulation order matches the aggregate/transform
  * lambda rendering exactly (ascending index, mean then variance then
  * distance), so results are bit-identical — but the JVM loop stays in
  * whole-stage codegen instead of three CodegenFallback lambda trees per
  * window.
  */
case class ZNormDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "znorm_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impls.znormDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impls.znormDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZNormDist =
    copy(l, r)
}

/** minhash_sig(shingles, k): k-row MinHash signature (per-seed min of
  * md5("seed:shingle"), lowercase hex) in one codegen'd pass — replaces
  * an explode + (doc, seed) hash-aggregate whose shuffle carried
  * k × |shingles| rows in the one stage that touches every document.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(sh: Any, k: Any): Any =
    Impls.minhashSig(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.functions.Impls.minhashSig($s, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(l, r)
}

/** count_in_set(tokens, set): number of tokens contained in the (small,
  * literal) string set — the native twin of
  * size(filter(toks, t -> t.isin(...))), whose lambda rendering is
  * CodegenFallback and evicts per-document scoring projections (language
  * ID, stopword ratios) from whole-stage codegen.
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"
  override protected def nullSafeEval(toks: Any, set: Any): Any =
    Impls.countIn(toks.asInstanceOf[ArrayData], set.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.functions.Impls.countIn($t, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountInSet =
    copy(l, r)
}

/** tokens_ws(text): whitespace tokens with empties dropped — the native
  * twin of filter(split(text, ' '), t -> t <> ''). The filter HOF is
  * CodegenFallback and evicts every projection that uses it from
  * whole-stage codegen; this byte-level split stays inlined (0x20 never
  * occurs inside a UTF-8 multibyte sequence, so byte splitting is exact).
  */
case class TokensWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "tokens_ws"
  override protected def nullSafeEval(v: Any): Any =
    Impls.tokensWs(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.tokensWs($c)")
  override protected def withNewChildInternal(c: Expression): TokensWs = copy(c)
}

/** nfc_normalize(text): Unicode canonical composition (NFC), the first step
  * of text canonicalization for dedup keys (mojibake-adjacent decomposed
  * sequences hash differently until composed). Spark has no normalization
  * built-in; a native expression keeps the per-document projection inside
  * whole-stage codegen, and the impl short-circuits on already-NFC input
  * (one cheap scan, no re-encode) — the common case on clean corpora.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(v: Any): Any =
    Impls.nfcNormalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impls.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}
