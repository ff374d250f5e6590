package graft.sql

import graft.doc.{HtmlNode, JsonNode, Node}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the scalar doc-extraction functions
  * (SURVEY §2.11 / §7.2 "custom Expression"): unlike the Scala-UDF wrappers
  * in [[graft.functions]], these participate in whole-stage codegen (the
  * generated code calls the static evaluators below directly — no
  * encoder/boxing round-trip per row) and keep Catalyst's null semantics.
  *
  * A per-thread single-entry parse cache makes multi-extraction projections
  * (`css_text(html, 't'), css_attr(html, 'a', 'href'), ...` over the same
  * row) parse the document ONCE instead of once per function call — the
  * parse is the dominant cost of extraction at scale.
  */
object NodeFunctions {

  private val lastHtml = new ThreadLocal[(UTF8String, Node)]
  private val lastJson = new ThreadLocal[(UTF8String, Node)]

  private def cached(tl: ThreadLocal[(UTF8String, Node)], s: UTF8String)(
      parse: String => Node): Node = {
    val c = tl.get()
    if (c != null && c._1.equals(s)) c._2
    else {
      val n = try parse(s.toString)
      catch { case scala.util.control.NonFatal(_) => Node.Unrecognisable }
      tl.set((s.clone(), n)) // clone: the incoming buffer may be reused
      n
    }
  }

  def cssText(html: UTF8String, css: UTF8String): UTF8String = {
    val r = cached(lastHtml, html)(HtmlNode.parse(_)).findFirst(css.toString)
    if (r.isEmpty) null else UTF8String.fromString(r.get.text)
  }

  def cssAttr(html: UTF8String, css: UTF8String, attr: UTF8String): UTF8String = {
    val r = cached(lastHtml, html)(HtmlNode.parse(_))
      .findFirst(css.toString).flatMap(_.attr(attr.toString))
    if (r.isEmpty) null else UTF8String.fromString(r.get)
  }

  def jsonText(json: UTF8String, path: UTF8String): UTF8String = {
    val r = cached(lastJson, json)(JsonNode.parse).findAll(path.toString).headOption
    if (r.isEmpty) null else UTF8String.fromString(r.get.text)
  }
}

/** First matching node's text for a CSS selector, null when absent. */
final case class CssText(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "css_text"

  protected override def nullSafeEval(html: Any, css: Any): Any =
    NodeFunctions.cssText(html.asInstanceOf[UTF8String], css.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, c) =>
      s"""${ev.value} = graft.sql.NodeFunctions.cssText($h, $c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CssText =
    copy(left = newLeft, right = newRight)
}

/** First matching node's attribute value, null when absent/empty. */
final case class CssAttr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "css_attr"

  protected override def nullSafeEval(html: Any, css: Any, attr: Any): Any =
    NodeFunctions.cssAttr(html.asInstanceOf[UTF8String], css.asInstanceOf[UTF8String],
      attr.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, c, a) =>
      s"""${ev.value} = graft.sql.NodeFunctions.cssAttr($h, $c, $a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CssAttr = copy(f, s, t)
}

/** First JSON node text on a recursive-descent path, null when absent. */
final case class JsonText(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_text"

  protected override def nullSafeEval(json: Any, path: Any): Any =
    NodeFunctions.jsonText(json.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) =>
      s"""${ev.value} = graft.sql.NodeFunctions.jsonText($j, $p);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonText =
    copy(left = newLeft, right = newRight)
}

/** SQL registration seam: `spark.sql.extensions=graft.sql.GraftExtensions`
  * exposes the extraction expressions to pure-SQL users
  * (`SELECT css_text(html, 'title') ...`). Runtime registration on a live
  * session goes through `org.apache.spark.sql.graft.GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  // SQL-path builders coerce inputs to string (the expressions themselves
  // assume string children; the typed wrappers in graft.functions guarantee
  // it, SQL callers get an implicit cast)
  private def s(e: Expression): Expression = Cast(e, StringType)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("css_text", new ExpressionInfo(classOf[CssText].getName, "css_text"),
      (c: Seq[Expression]) => CssText(s(c(0)), s(c(1)))),
    ("css_attr", new ExpressionInfo(classOf[CssAttr].getName, "css_attr"),
      (c: Seq[Expression]) => CssAttr(s(c(0)), s(c(1)), s(c(2)))),
    ("json_text", new ExpressionInfo(classOf[JsonText].getName, "json_text"),
      (c: Seq[Expression]) => JsonText(s(c(0)), s(c(1))))
  )
}
