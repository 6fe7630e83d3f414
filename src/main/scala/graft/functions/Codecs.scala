package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{DataFormatException, Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ADX compression codecs (`gzip_compress_to_base64_string` /
  * `gzip_decompress_from_base64_string` /
  * `zlib_compress_to_base64_string` /
  * `zlib_decompress_from_base64_string`) over `java.util.zip` with
  * the default deflate level — RFC 1952 (gzip) / RFC 1950 (zlib)
  * framing, UTF-8 text in/out, standard (non-URL) base64.
  *
  * Determinism: decompress(compress(x)) == x is the contract the
  * oracle checks (compressed BYTES are a zlib-implementation detail —
  * ADX's own output differs from the JDK's — so no cross-engine
  * compare of the encoded form; the header magic/method bytes are
  * spec-pinned instead). `java.util.zip.GZIPOutputStream` writes a
  * fixed header (MTIME 0, no OS/name fields), so output is stable
  * within a JDK. Malformed/corrupt input on decompress → null (the
  * engine convention; DEVIATION from ADX's empty string, like
  * punycode_to_string). */
object Codecs {
  private def utf8(s: UTF8String): Array[Byte] = s.getBytes

  def gzipCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(utf8(s)); gz.close()
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(bos.toByteArray))
  }

  def gzipDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val raw = java.util.Base64.getDecoder.decode(s.toString)
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      in.close()
      UTF8String.fromBytes(bos.toByteArray)
    } catch {
      case _: IllegalArgumentException | _: java.io.IOException => null
    }
  }

  def zlibCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val d = new Deflater() // default level, zlib (RFC 1950) wrapper
    val data = utf8(s)
    d.setInput(data); d.finish()
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(bos.toByteArray))
  }

  def zlibDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val raw = java.util.Base64.getDecoder.decode(s.toString)
      val inf = new Inflater()
      inf.setInput(raw)
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end(); return null // truncated / preset-dictionary stream
        }
        bos.write(buf, 0, n)
      }
      inf.end()
      UTF8String.fromBytes(bos.toByteArray)
    } catch {
      case _: IllegalArgumentException | _: DataFormatException => null
    }
  }
}

private[functions] abstract class CodecExpression extends UnaryExpression {
  def fn: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_$fn"
  override def nullSafeEval(s: Any): Any = run(s.asInstanceOf[UTF8String])
  def run(s: UTF8String): UTF8String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.Codecs.$fn($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
}

case class GzipCompress(child: Expression) extends CodecExpression {
  override def fn: String = "gzipCompress"
  override def run(s: UTF8String): UTF8String = Codecs.gzipCompress(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GzipDecompress(child: Expression) extends CodecExpression {
  override def fn: String = "gzipDecompress"
  override def run(s: UTF8String): UTF8String = Codecs.gzipDecompress(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZlibCompress(child: Expression) extends CodecExpression {
  override def fn: String = "zlibCompress"
  override def run(s: UTF8String): UTF8String = Codecs.zlibCompress(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZlibDecompress(child: Expression) extends CodecExpression {
  override def fn: String = "zlibDecompress"
  override def run(s: UTF8String): UTF8String = Codecs.zlibDecompress(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
