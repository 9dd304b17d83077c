package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (r12) — the
  * validation gate a 100 TB training pipeline runs BEFORE spending a
  * cluster-day on a corrupt extract: uniqueness, referential
  * integrity, null discipline and value ranges, evaluated as exact
  * counts so the report replays bit-for-bit in any engine.
  *
  * Scale shape: every scalar constraint (NotNull / InRange) and every
  * Unique constraint folds into ONE aggregate pass over the table
  * (conditional counts + exact distinct counts — map-combinable;
  * multiple distinct aggregates expand the scan by the number of
  * Unique checks, the standard Spark trade and still one scan of the
  * data). Each ForeignKey adds one left-anti join against the
  * parent's DISTINCT key frame (dimension-sized build side — AQE
  * broadcasts it when small). No collects; the report is a DataFrame.
  *
  * Violation semantics (each row reports `n_rows` checked,
  * `n_violations`, `pass`):
  *  - NotNull: checked = all rows; violations = nulls.
  *  - InRange: checked = non-null values (null discipline is
  *    NotNull's job); violations = values outside [lo, hi].
  *  - Unique: checked = rows whose key parts are all non-null;
  *    violations = checked − distinct keys (the surplus copies).
  *  - ForeignKey: checked = child rows with fully non-null keys;
  *    violations = those with no matching parent row.
  */
object Quality {

  sealed trait Constraint { def name: String }
  final case class NotNull(col: String, name: String) extends Constraint
  final case class InRange(col: String, lo: Double, hi: Double, name: String) extends Constraint
  final case class Unique(cols: Seq[String], name: String) extends Constraint
  final case class ForeignKey(childCols: Seq[String], parent: DataFrame,
                              parentCols: Seq[String], name: String) extends Constraint

  /** Evaluate `constraints` against `df`; returns one row per
    * constraint: (check_name, n_rows, n_violations, pass), ordered by
    * check name (a total order — names must be distinct).
    */
  def checkConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "checkConstraints: no constraints given")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "checkConstraints: constraint names must be distinct (they key the report)")

    val scalar = constraints.collect {
      case c: NotNull => c: Constraint
      case c: InRange => c: Constraint
      case c: Unique  => c: Constraint
    }
    val fks = constraints.collect { case c: ForeignKey => c }

    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        // one aggregate pass: every check contributes a rows/viol pair
        val aggs: Seq[Column] = scalar.zipWithIndex.flatMap {
          case (NotNull(c, _), i) => Seq(
            count(lit(1)).as(s"__r$i"),
            coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__v$i"))
          case (InRange(c, lo, hi, _), i) => Seq(
            count(col(c)).as(s"__r$i"),
            coalesce(sum(when(col(c).isNotNull &&
              (col(c) < lit(lo) || col(c) > lit(hi)), 1L)), lit(0L)).as(s"__v$i"))
          case (Unique(cols, _), i) =>
            val allNN = cols.map(col(_).isNotNull).reduce(_ && _)
            Seq(
              count(when(allNN, 1L)).as(s"__r$i"),
              (count(when(allNN, 1L)) -
                countDistinct(cols.head, cols.tail: _*)).as(s"__v$i"))
          case (_: ForeignKey, _) => Seq.empty
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the single row into (check_name, n_rows, n_violations)
        val stacked = scalar.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"),
            col(s"__r$i").as("n_rows"), col(s"__v$i").as("n_violations"))
        }
        Some(one.select(explode(array(stacked: _*)).as("s"))
          .select(col("s.check_name"), col("s.n_rows"), col("s.n_violations")))
      }

    val fkReports: Seq[DataFrame] = fks.map {
      case ForeignKey(childCols, parent, parentCols, name) =>
        require(childCols.size == parentCols.size && childCols.nonEmpty,
          s"checkConstraints($name): child/parent key arity must match")
        val childNN = df.filter(childCols.map(col(_).isNotNull).reduce(_ && _))
        val parentKeys = parent.select(parentCols.map(col): _*).distinct()
        val cond = childCols.zip(parentCols)
          .map { case (c, p) => childNN(c) === parentKeys(p) }.reduce(_ && _)
        val viol = childNN.join(parentKeys, cond, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        val rows = childNN.agg(count(lit(1)).as("n_rows"))
        rows.crossJoin(viol).select(lit(name).as("check_name"),
          col("n_rows"), col("n_violations"))
    }

    (scalarReport.toSeq ++ fkReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }
}
