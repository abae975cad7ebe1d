package graft.ebw

import java.io.PrintWriter
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.slf4j.LoggerFactory

/**
 * File logging of solver iterations, mirroring setup_logging
 * (/root/reference/entropy_balance_weighting/__init__.py:17-29): after
 * `EbwLog.setupLogging(path)` every solver status line is appended to the
 * file with an "MM/dd HH:mm:ss:" prefix, in addition to slf4j.
 */
object EbwLog {

  private val log = LoggerFactory.getLogger("graft.ebw")
  private val fmt = DateTimeFormatter.ofPattern("MM/dd HH:mm:ss")
  @volatile private var writer: Option[PrintWriter] = None

  def setupLogging(filepath: String, append: Boolean = false): Unit = synchronized {
    writer.foreach(_.close())
    writer = Some(new PrintWriter(new java.io.FileWriter(filepath, append)))
  }

  def stopLogging(): Unit = synchronized {
    writer.foreach(_.close())
    writer = None
  }

  private[ebw] def info(msg: String): Unit = {
    log.info(msg)
    writer.foreach { w =>
      w.println(s"${LocalDateTime.now().format(fmt)}: $msg")
      w.flush()
    }
  }

  private[ebw] def warn(msg: String): Unit = {
    log.warn(msg)
    writer.foreach { w =>
      w.println(s"${LocalDateTime.now().format(fmt)}: WARN $msg")
      w.flush()
    }
  }
}
