package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

/** Socket streaming source (reference `sql/core/.../execution/streaming/
  * socket.scala`, `TextSocketSource`): a loopback server feeds lines to
  * `readStream.format("socket")`, which lands them in a memory sink.
  * Covers the source previously marked environment-absent — only a
  * network *peer* was missing, and loopback provides one. */
class SocketSourceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("socket source streams lines from a loopback server") {
    val server = new ServerSocket(0) // ephemeral port on loopback
    val lines = Seq("alpha", "beta", "gamma", "delta")
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // Keep the connection open until the query stops reading; closing
      // immediately can race the source's first poll.
      Thread.sleep(10000)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val name = "graft_socket_smoke"
    val q = spark.readStream.format("socket")
      .option("host", "localhost")
      .option("port", server.getLocalPort)
      .load()
      .writeStream.format("memory").queryName(name).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var got = Set.empty[String]
      while (got.size < lines.size && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.table(name).collect().map(_.getString(0)).toSet
        if (got.size < lines.size) Thread.sleep(200)
      }
      assert(got == lines.toSet, s"received $got")
    } finally {
      q.stop()
      server.close()
    }
  }
}
