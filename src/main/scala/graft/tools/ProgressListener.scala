package graft.tools

import java.io.PrintStream
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** tqdm-style progress for the distributed analyzer — the reference's
  * headline UX on big inputs (structa analyzer.py:209-236 wires
  * `progress` callbacks into a bar totalled by measure();
  * ui/cli.py:237-266 shows it only on a TTY).
  *
  * The Spark path maps naturally onto a SparkListener: jobs are the
  * analyzer's passes (witness / counter batch / summary, labelled via
  * `setJobDescription` in [[graft.analyzer.SparkAnalyzer]]), task
  * completions give the fine-grained movement a row-count bar gives
  * the reference. Totals per pass are not knowable up front (nested
  * levels are discovered as the walk descends), so the line shows
  * jobs-done/jobs-seen plus the running pass label rather than a
  * percentage — the honest distributed equivalent.
  */
final class ProgressListener(out: PrintStream) extends SparkListener {

  def this() = this(System.err)

  private val jobsStarted = new AtomicInteger
  private val jobsDone = new AtomicInteger
  private val tasksDone = new AtomicLong
  private val t0 = System.nanoTime()
  @volatile private var current: String = ""
  private val lastRenderNanos = new AtomicLong(Long.MinValue)

  /** Minimum nanos between repaints: a real cluster delivers 10^5+
    * task-end events through the single-threaded listener bus, and an
    * unthrottled \r repaint per event both floods stderr and backs
    * the bus up until Spark drops events. 10 Hz is indistinguishable
    * to a human and ~free to the bus.
    */
  private val minRepaintNanos = 100L * 1000 * 1000

  override def onJobStart(j: SparkListenerJobStart): Unit = {
    jobsStarted.incrementAndGet()
    current = Option(j.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse("")
    render(force = true)
  }

  override def onJobEnd(j: SparkListenerJobEnd): Unit = {
    jobsDone.incrementAndGet()
    render(force = true)
  }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    tasksDone.incrementAndGet()
    render(force = false)
  }

  private def render(force: Boolean): Unit = {
    val now = System.nanoTime()
    val last = lastRenderNanos.get
    if (!force && now - last < minRepaintNanos) return
    // one racer wins the repaint; losers skip instead of queueing
    if (!lastRenderNanos.compareAndSet(last, now)) return
    val secs = (now - t0) / 1e9
    val label = if (current.isEmpty) "" else s" | $current"
    out.print(f"\ranalyzing: ${jobsDone.get}/${jobsStarted.get} " +
      f"jobs | ${tasksDone.get} tasks | $secs%.1fs$label    ")
    out.flush()
  }

  /** Terminate the \r line (call after removing the listener). */
  def finish(): Unit = {
    out.println()
    out.flush()
  }
}
