package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** The linq record calculus (reference linq/Foundation.scala:54-156 — merge
  * ops `++`/`+<+`/`+>+`/`+!+`, cartesian `><` family, and the
  * conflict-checked `withColumns` of DataViewRecInterface.scala:17-77)
  * re-expressed on DataFrames: records are rows, fields are columns, and the
  * merge policies act on COLUMN SETS. The reference enforces conflicts at
  * compile time via named tuples; here they're analysis-time errors — same
  * contract, Catalyst-native representation (SURVEY §7.5: no bespoke record
  * calculus).
  */
object Records {

  /** Field-conflict policy (reference ElementWisePoly `ifNoConflict` + the
    * left/right-bias variants).
    */
  sealed trait MergePolicy
  object MergePolicy {
    /** Conflicting field => error (reference `+!+` / `>!<`). */
    case object ErrorOnConflict extends MergePolicy
    /** Left side wins conflicts (reference `+<+` / `><<`). */
    case object LeftWins extends MergePolicy
    /** Right side wins conflicts (reference `+>+` / `>><` and the default
      * `++`/`><` right-bias).
      */
    case object RightWins extends MergePolicy
  }
  import MergePolicy._

  /** `withColumns` with the reference's conflict check: adding a field that
    * already exists is an error instead of a silent replace
    * (reference DataViewRecInterface.scala:17-77).
    */
  def withColumnsChecked(df: DataFrame, cols: (String, Column)*): DataFrame = {
    val dup = cols.map(_._1).filter(n => df.columns.exists(_.equalsIgnoreCase(n)))
    require(dup.isEmpty,
      s"withColumns conflict on field(s) ${dup.mkString(", ")}; " +
        "use merge(..., LeftWins/RightWins) for biased overwrite")
    val dupNew = cols.groupBy(_._1.toLowerCase).filter(_._2.size > 1).keys
    require(dupNew.isEmpty, s"duplicate new field(s): ${dupNew.mkString(", ")}")
    df.withColumns(cols.toMap)
  }

  /** Resolve two column sets under a policy: returns (leftKeep, rightKeep). */
  private def resolve(left: Seq[String], right: Seq[String],
                      policy: MergePolicy): (Seq[String], Seq[String]) = {
    val conflicts = left.map(_.toLowerCase).toSet
      .intersect(right.map(_.toLowerCase).toSet)
    policy match {
      case ErrorOnConflict =>
        require(conflicts.isEmpty, s"field conflict(s): ${conflicts.mkString(", ")}")
        (left, right)
      case LeftWins  => (left, right.filterNot(c => conflicts.contains(c.toLowerCase)))
      case RightWins => (left.filterNot(c => conflicts.contains(c.toLowerCase)), right)
    }
  }

  /** Row-wise record merge of two SAME-LENGTH keyed frames — the `++` family
    * applied through a join: fields of `right` merged into `left` per the
    * policy, rows matched on `key`.
    */
  def mergeOn(left: DataFrame, right: DataFrame, key: String,
              policy: MergePolicy = RightWins): DataFrame = {
    val (lk, rk) = resolve(left.columns.toSeq.filter(_ != key),
      right.columns.toSeq.filter(_ != key), policy)
    left.select(key, lk: _*).join(right.select(key, rk: _*), key)
  }

  /** Typed cartesian with field merge — the `><` family (reference
    * Foundation.scala:139-156): cross product of the two row sets, conflicts
    * resolved per policy. Spark mapping: `crossJoin` + column pruning, so
    * the dropped side's columns never materialize.
    */
  def cartesian(left: DataFrame, right: DataFrame,
                policy: MergePolicy = ErrorOnConflict): DataFrame = {
    val (lk, rk) = resolve(left.columns.toSeq, right.columns.toSeq, policy)
    left.select(lk.map(col): _*).crossJoin(right.select(rk.map(col): _*))
  }
}
