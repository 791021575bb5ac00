package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-sniffing gzip decode (S4): the reference detects gzip by the
 * `1f 8b` magic bytes of the downloaded object, not the key's extension
 * (cvp_bucket_event_lambda_handler.py:28-30) — S3 keys are frequently
 * extension-less. Spark's file sources decompress only by extension, so
 * the sniffing path reads `binaryFile` rows and decodes through this
 * expression.
 *
 * A corrupt gzip stream yields null (one bad OBJECT must not kill a
 * 100 TB job — consistent with the engine's malformed-row-as-data
 * model); the reference raises and drops the whole invocation instead.
 */
object CodecOps {
  def gunzipText(bytes: Array[Byte]): UTF8String = {
    if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) {
      try {
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        val out = new ByteArrayOutputStream(math.max(bytes.length * 4, 256))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        UTF8String.fromBytes(out.toByteArray)
      } catch { case _: java.io.IOException => null }
    } else UTF8String.fromBytes(bytes)
  }
}

/** binary → string: gunzip when the content is gzip, pass through
 *  otherwise; null for a corrupt gzip stream. */
case class GunzipText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_gunzip_text"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CodecOps.gunzipText(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
       |${ev.value} = graft.functions.CodecOps.gunzipText($v);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
