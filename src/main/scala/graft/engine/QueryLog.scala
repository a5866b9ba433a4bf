package graft.engine

import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter

import org.slf4j.LoggerFactory

/**
 * Structured operation logging (SURVEY.md §2.2 O22; reference
 * `utils/log_utils.py:6-52`): start / complete / failure blocks carrying a
 * stable key, the caller chain, dual-timezone timestamps, and free-form
 * key/value context (SQL text, params, row counts, query id).
 *
 * The reference's `LogBlock` also *called* `log_start`/`log_complete`/
 * `log_failure` methods it never defined (reference defect #3) — we define all
 * three explicitly.
 */
object QueryLog {
  private val log = LoggerFactory.getLogger("graft.engine")
  private val iso = DateTimeFormatter.ISO_OFFSET_DATE_TIME
  // Default secondary zone mirrors the reference (`log_utils.py:26`).
  private val localZone: ZoneId = ZoneId.of(
    sys.env.getOrElse("GRAFT_LOG_TZ", "America/Los_Angeles"))

  private def callerChain(depth: Int = 4): String =
    Thread.currentThread().getStackTrace.iterator
      .drop(3) // getStackTrace, callerChain, block method
      .filter(f => f.getClassName.startsWith("graft.") &&
        !f.getClassName.startsWith("graft.engine.QueryLog"))
      .take(depth)
      .map(f => s"${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}")
      .mkString(" <- ")

  private def stamp(): String = {
    val now = Instant.now()
    s"utc=${iso.format(now.atZone(ZoneId.of("UTC")))} local=${iso.format(now.atZone(localZone))}"
  }

  private def fmt(key: String, phase: String, ctx: Seq[(String, Any)]): String = {
    val kv = ctx.map { case (k, v) => s"$k=$v" }.mkString(" ")
    s"[$key] $phase ${stamp()} caller=[${callerChain()}] $kv"
  }

  def start(key: String, ctx: (String, Any)*): Unit = log.info(fmt(key, "START", ctx))
  def complete(key: String, ctx: (String, Any)*): Unit = log.info(fmt(key, "COMPLETE", ctx))
  def failure(key: String, e: Throwable, ctx: (String, Any)*): Unit =
    log.error(fmt(key, "FAILURE", ctx :+ ("error" -> e.toString)))
}
