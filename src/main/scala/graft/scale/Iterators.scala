package graft.scale

import scala.util.control.NonFatal

/** Partition-level fallback between a primary and a backup data iterator
  * (reference partition/FallbackIterator.scala:1-144): emit from `primary`
  * until it is drained or breaks, then continue from `backup`
  * FAST-FORWARDED past the elements already emitted; if the primary cannot
  * even be constructed, the backup serves from the start. The canonical use
  * is inside `mapPartitions`: primary = a partial/cached source, backup =
  * the recompute-from-origin path — consumers see one uninterrupted stream.
  */
final class FallbackIterator[T](primaryFn: () => Iterator[T], backupFn: () => Iterator[T])
    extends Iterator[T] {

  private var emitted = 0
  private var onBackup = false
  private var cur: Iterator[T] =
    try primaryFn()
    catch { case NonFatal(_) => onBackup = true; backupFn() }

  private def switchToBackup(): Unit = {
    onBackup = true
    cur = backupFn().drop(emitted)
  }

  override def hasNext: Boolean =
    if (onBackup) cur.hasNext
    else {
      val primaryHas =
        try cur.hasNext
        catch { case NonFatal(_) => switchToBackup(); return cur.hasNext }
      if (primaryHas) true
      else { switchToBackup(); cur.hasNext } // drained primary: backup continues
    }

  override def next(): T = {
    if (!hasNext) throw new NoSuchElementException("FallbackIterator exhausted")
    val v =
      if (onBackup) cur.next()
      else
        try cur.next()
        catch { case NonFatal(_) => switchToBackup(); cur.next() }
    emitted += 1
    v
  }
}

object FallbackIterator {
  def apply[T](primary: () => Iterator[T], backup: () => Iterator[T]): FallbackIterator[T] =
    new FallbackIterator(primary, backup)
}
