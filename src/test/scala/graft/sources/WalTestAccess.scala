package graft.sources

/** Test forwarder for the package-private [[LineBufferWal]]. */
object WalTestAccess {
  def create(dir: String): LineBufferWal = new LineBufferWal(dir)
  def persist(w: LineBufferWal, s: Long, e: Long,
      rows: Array[(String, Long)]): Unit = w.persistBatch(s, e, rows)
  def read(w: LineBufferWal, s: Long, e: Long): Array[(String, Long)] =
    w.readRange(s, e)
  def commit(w: LineBufferWal, o: Long): Unit = w.commit(o)
  def committed(w: LineBufferWal): Long = w.committedOffset
  def maxPlanned(w: LineBufferWal): Long = w.maxPlannedOffset
}
