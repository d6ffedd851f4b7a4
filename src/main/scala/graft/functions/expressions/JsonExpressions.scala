package graft.functions.expressions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object JsonImpl {
  private val mapper = new ObjectMapper()

  /** Merge `key` into a JSON object without disturbing sibling keys.
    * Null/invalid/non-object input starts a fresh object (the
    * reference treats NULL ExtendedInfo as `{}` before writing,
    * eodatadownlandsatgoogsensor.py:1398-1408). `value` is parsed as a
    * JSON fragment when valid, else stored as a string; null value ⇒
    * JSON null.
    */
  def setKey(json: UTF8String, key: UTF8String, value: UTF8String): UTF8String = {
    val root: ObjectNode =
      if (json == null) mapper.createObjectNode()
      else try {
        mapper.readTree(json.toString) match {
          case o: ObjectNode => o
          case _ => mapper.createObjectNode()
        }
      } catch { case _: Exception => mapper.createObjectNode() }
    val v =
      if (value == null) mapper.nullNode()
      else try mapper.readTree(value.toString)
      catch { case _: Exception => mapper.getNodeFactory.textNode(value.toString) }
    root.set[ObjectNode](key.toString, v)
    UTF8String.fromString(mapper.writeValueAsString(root))
  }
}

/** `json_set_key(json, key, value)` → json with `key` set/replaced and
  * every other key preserved — the ExtendedInfo read-modify-write
  * (SURVEY §7.5: quicklook and tilecache both write the same JSONB
  * column and must not clobber each other). Cold metadata path:
  * interpreted eval is fine here, unlike the per-token hot hashes.
  */
case class JsonSetKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = second.nullable

  // null json ⇒ fresh object and null value ⇒ JSON null, so only a
  // null key nulls the result — hand-rolled eval instead of the
  // null-propagating nullSafeEval.
  override def eval(input: InternalRow): Any = {
    val key = second.eval(input)
    if (key == null) null
    else JsonImpl.setKey(
      first.eval(input).asInstanceOf[UTF8String],
      key.asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): JsonSetKey =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "json_set_key"
}
