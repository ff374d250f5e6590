package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data pipelines (the standard
  * pre-training scrub pass — cf. the PII filtering stages described for
  * public corpora like C4/The Pile): per-doc match counts and a redacted
  * text column, as pure codegen'd column expressions (`regexp_extract_all`
  * / `regexp_replace`) — no UDFs, no shuffle; the scrub rides the ingest
  * scan at 100 TB.
  *
  * The patterns deliberately stay inside the regex subset whose semantics
  * are identical between java.util.regex (Spark executors) and RE2 (the
  * DuckDB oracle): character classes, bounded repetition, ASCII `\b` — no
  * lookaround, no backrefs. q54 pins engine parity of BOTH detection
  * counts and redacted output on a deterministically planted corpus (the
  * synthetic corpus itself carries no PII — verified — so the gate plants
  * its own, identically on both engines).
  *
  * Redaction order is part of the contract (email → ssn → phone → ip):
  * each class is counted on the ORIGINAL text, then replaced with its
  * placeholder token. The 3-2-4 ssn pattern is redacted before the 3-3-4
  * phone pattern so neither can consume the other's digits (they are
  * mutually exclusive on any fixed span, but order still pins the output
  * when future patterns overlap).
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re  = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** (pattern, count column, placeholder) in redaction order. */
  val Classes: Seq[(String, String, String)] = Seq(
    (EmailRe, "n_email", "<EMAIL>"),
    (SsnRe,   "n_ssn",   "<ID>"),
    (PhoneRe, "n_phone", "<PHONE>"),
    (Ipv4Re,  "n_ip",    "<IP>"))

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Adds `n_email`, `n_ssn`, `n_phone`, `n_ip` (match counts on the
    * original text) and `clean_text` (all four classes redacted, in
    * [[Classes]] order) next to `textCol`.
    */
  def withPiiColumns(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = Classes.foldLeft(df) { case (d, (re, n, _)) =>
      d.withColumn(n, countOf(col(textCol), re))
    }
    val redacted = Classes.foldLeft(col(textCol)) { case (c, (re, _, tok)) =>
      regexp_replace(c, re, tok)
    }
    counted.withColumn("clean_text", redacted)
  }

  /** Redact in place: `textCol` is replaced by its scrubbed form and a
    * single `n_pii` total is kept — the ingest-pipeline shape
    * ([[graft.streaming.EventStreams.cleanIngest]] composes this when
    * `scrubPii` is on).
    */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame =
    withPiiColumns(df, textCol)
      .withColumn("n_pii",
        (col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip")).cast("long"))
      .drop("n_email", "n_ssn", "n_phone", "n_ip", textCol)
      .withColumnRenamed("clean_text", textCol)
}
