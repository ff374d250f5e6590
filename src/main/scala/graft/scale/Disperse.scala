package graft.scale

import scala.reflect.ClassTag

import org.apache.spark.{Dependency, NarrowDependency, Partition, TaskContext}
import org.apache.spark.rdd.RDD

/** Child partition `index` = slice `slice` of parent partition `parent`.
  * Carries the parent Partition OBJECT (not just its index): on executors
  * `RDD.partitions` is driver-only, so compute must receive the parent
  * split ready-made — the CoalescedRDD/PartitionPruningRDD pattern.
  */
private final case class DispersedPartition(index: Int, parent: Partition, slice: Int)
    extends Partition

/** Widen an RDD's partition count by `factor` WITHOUT a shuffle (reference
  * NarrowDispersedRDD, rdd/spookystuff/NarrowDispersedRDD.scala:1-60 —
  * SURVEY §4 #11): child partition (p, s) re-reads parent partition p and
  * keeps every `factor`-th element starting at offset s (round-robin
  * stride), so the child RDD has `parent.partitions × factor` partitions,
  * each a balanced 1/factor slice, and the dependency is NARROW — no
  * serialization, no exchange, no driver barrier.
  *
  * The trade: each parent partition is iterated `factor` times (once per
  * slice). That is the right trade exactly when the parent is cached or
  * cheap to produce and the DOWNSTREAM per-row work dominates — the fetch
  * fan-out of a narrow frontier (a seed list read as 1-2 partitions caps
  * fetch concurrency at 1-2 tasks; dispersing to `factor` partitions buys
  * `factor`-way agent parallelism for the price of re-reading a tiny seed
  * iterator). For wide/expensive parents prefer `repartition` — the shuffle
  * costs less than `factor` recomputes.
  */
final class NarrowDisperseRDD[T: ClassTag](@transient private val parent: RDD[T], factor: Int)
    extends RDD[T](parent.sparkContext, Nil) {

  require(factor >= 1, s"disperse factor must be >= 1, got $factor")

  override def getDependencies: Seq[Dependency[_]] = Seq(
    new NarrowDependency[T](parent) {
      override def getParents(partitionId: Int): Seq[Int] =
        Seq(partitionId / factor)
    })

  override protected def getPartitions: Array[Partition] =
    Array.tabulate(parent.partitions.length * factor) { i =>
      DispersedPartition(i, parent.partitions(i / factor), i % factor)
    }

  override protected def getPreferredLocations(split: Partition): Seq[String] =
    parent.preferredLocations(split.asInstanceOf[DispersedPartition].parent)

  override def compute(split: Partition, context: TaskContext): Iterator[T] = {
    val p = split.asInstanceOf[DispersedPartition]
    firstParent[T].iterator(p.parent, context).zipWithIndex.collect {
      case (t, i) if i % factor == p.slice => t
    }
  }
}

object NarrowDisperseRDD {
  def apply[T: ClassTag](parent: RDD[T], factor: Int): RDD[T] =
    if (factor == 1) parent else new NarrowDisperseRDD(parent, factor)
}
