package graft.lifecycle

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Durable conversation state: threads → chains, JSON-on-disk, mirroring
  * the reference's storage/message managers
  * (bambooai/storage_manager.py:137-243 store/restore chain JSON;
  * messages/message_manager.py:41-154 QA pairs + windowed eviction).
  */
final class SessionStore(root: Path) {

  final case class Message(role: String, content: String)

  /** Context window: 4 conversation pairs → at most 2*4-1 retained beyond
    * the system message (bambooai.py:18, message_manager.py:8,128-138). */
  val MaxConversations = 4

  private val threads =
    mutable.Map.empty[String, mutable.ArrayBuffer[Message]]

  def append(threadId: String, role: String, content: String): Unit = {
    val buf = threads.getOrElseUpdate(threadId, mutable.ArrayBuffer.empty)
    buf += Message(role, content)
    // evict oldest pair beyond the window (keep an optional leading system)
    val keep = 2 * MaxConversations - 1
    val (sys, rest) = buf.toSeq.partition(_.role == "system")
    if (rest.length > keep) {
      val trimmed = sys ++ rest.takeRight(keep)
      buf.clear(); buf ++= trimmed
    }
  }

  def messages(threadId: String): Seq[Message] =
    threads.get(threadId).map(_.toSeq).getOrElse(Seq.empty)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Persist one thread as JSON (storage_manager.py:137-192). */
  def save(threadId: String): Path = {
    Files.createDirectories(root)
    val body = messages(threadId).map(m =>
      s"""{"role": "${esc(m.role)}", "content": "${esc(m.content)}"}""")
      .mkString("[", ",\n ", "]")
    val p = root.resolve(s"$threadId.json")
    Files.writeString(p, body)
    p
  }

  /** Restore a thread (storage_manager.py:194-243). Minimal JSON reader for
    * the exact shape [[save]] writes. */
  def restore(threadId: String): Int = {
    val p = root.resolve(s"$threadId.json")
    if (!Files.exists(p)) return 0
    val text = Files.readString(p)
    val msg = """\{"role": "((?:[^"\\]|\\.)*)", "content": "((?:[^"\\]|\\.)*)"\}""".r
    // Single left-to-right pass mirroring how esc() produced the text:
    // sequential String.replace corrupts content like backslash+'n' (saved
    // as \\n — the first replace would eat the escaped backslash's second
    // char and emit backslash+newline). A tokenizer can't mis-pair.
    def unesc(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' if i + 5 < s.length =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => sb += other; i += 2 // covers \" and \\
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }
    val buf = mutable.ArrayBuffer.empty[Message]
    msg.findAllMatchIn(text).foreach(m =>
      buf += Message(unesc(m.group(1)), unesc(m.group(2))))
    threads(threadId) = buf
    buf.length
  }

  def threadIds: Seq[String] =
    if (!Files.exists(root)) Seq.empty
    else Files.list(root).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).toSeq.sorted

  /** Threads alive in memory (appended this process), persisted or not —
    * the union with [[threadIds]] is the full thread listing the web
    * surface serves (app.py:1062-1150 lists stored chains). */
  def liveThreadIds: Seq[String] = threads.keys.toSeq.sorted

  /** Remove a thread from memory AND disk (app.py:1271-1311 delete_chain).
    * Returns false when the thread existed in neither. */
  def delete(threadId: String): Boolean = {
    val hadLive = threads.remove(threadId).nonEmpty
    val p = root.resolve(s"$threadId.json")
    val hadFile = Files.deleteIfExists(p)
    hadLive || hadFile
  }
}
