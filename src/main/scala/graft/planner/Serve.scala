package graft.planner

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources.PlanCache

/** The reference's Flask browser as a dependency-free HTTP layer
  * (JDK `com.sun.net.httpserver`; the engine itself gains no web
  * framework). Routes mirror /root/reference/frame_tasks/serve.py and
  * serve_view_df.py:
  *
  *   - `GET /explore/{q}` — the action page (serve.py:110-147):
  *     frame pool with view links, numbered further actions each
  *     linking to the state-with-that-action, and a back link.
  *   - `GET /view/{page}/{index}/{q}` — a stably-ordered page of
  *     frame `index` (serve_view_df.py:75-157): first hit submits an
  *     async materialization and answers a refresh-me wait page (the
  *     reference's data_wait.html + Celery delay, serve.py:57-77);
  *     once cached, pages are served from the parquet cache with
  *     first/last/negative page arithmetic and prev/next nav.
  *   - `GET /download/csv/{index}/{q}` — the frame as CSV
  *     (serve_view_df.py:160-176).
  *
  * State lives in the URL exactly as in the reference: `q` is the
  * base64url of the [[PlanJson]] action path (the reference
  * URL-encodes its pickled action list, browse.py `from_url_q`), so
  * the server holds no per-user state and any view is bookmarkable.
  * Results are computed once per logical plan via [[PlanCache]]'s
  * plan-hash key — the reference's mmh3-keyed pickle cache
  * (serve.py:38-44) — and every subsequent page read is a parquet
  * scan with column pruning, not a recomputation.
  */
final class Serve(
    registry: TaskRegistry,
    sources: Seq[DataFrame],
    cacheDir: String,
    port: Int = 0) {

  private val ViewMaxColWidth = 30 // serve_view_df.py:27

  private[planner] def encode(path: Seq[Planner.Action]): String =
    Base64.getUrlEncoder.withoutPadding
      .encodeToString(PlanJson.toJson(path).getBytes(UTF_8))

  private[planner] def decode(q: String): Vector[Planner.Action] =
    if (q.isEmpty) Vector.empty
    else PlanJson.fromJson(registry,
      new String(Base64.getUrlDecoder.decode(q), UTF_8))

  /** Rebuild the session by replaying the URL's action path — the
    * frames stay LAZY plans; nothing executes until a view asks.
    */
  private def session(path: Vector[Planner.Action]): Browse.Session =
    path.foldLeft(Browse.open(registry, sources)) { (s, a) =>
      Browse.Session(s.registry, s.pool ++ Executor.callTask(s.pool, a),
        Planner.apply(s.state, a), s.path :+ a)
    }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "text/html; charset=utf-8"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** [[Browse.describe]] as HTML with every bound column in a color
    * unique to that column across all listed actions — the
    * reference's matched-column color coding (serve.py:125-129,
    * extras_ui.get_unique_colors), with evenly spaced hues replacing
    * its random palette so colors are stable across renders.
    */
  private def describeHtml(a: Planner.Action,
      hue: Map[String, Int]): String = {
    val binds = a.bindings.toSeq.sortBy(_._1).map { case (arg, b) =>
      val cols = b.cols.map { c =>
        s"""<span style="color:hsl(${hue(c.column)},70%,40%)">""" +
          esc(c.column) + "</span>"
      }.mkString(",")
      s"${esc(arg)}=#${b.frameIdx}($cols)"
    }.mkString(" ")
    s"${esc(a.task.name)} $binds -&gt; " +
      esc(a.outputs.map(_.mkString("[", ",", "]")).mkString(" "))
  }

  private def explorePage(q: String): String = {
    val s = session(decode(q))
    val frames = s.pool.zipWithIndex.map { case (df, i) =>
      s"""<li>frame #$i: (${esc(df.columns.mkString(", "))})""" +
        s""" <a href="/view/0/$i/$q">view</a>""" +
        s""" <a href="/download/csv/$i/$q">csv</a></li>"""
    }.mkString("\n")
    val actsList = Browse.actions(s)
    val colsUse = actsList
      .flatMap(_.bindings.valuesIterator.flatMap(_.cols.map(_.column)))
      .distinct.sorted
    val hue = colsUse.zipWithIndex.map { case (c, i) =>
      c -> i * 360 / math.max(1, colsUse.size)
    }.toMap
    val acts = actsList.zipWithIndex.map { case (a, i) =>
      val nq = encode(s.path :+ a)
      s"""<li>[$i] <a href="/explore/$nq">${describeHtml(a, hue)}</a></li>"""
    }.mkString("\n")
    val back =
      if (s.path.isEmpty) ""
      else s"""<p><a href="/explore/${encode(s.path.dropRight(1))}">back</a></p>"""
    s"""<html><body><h1>explore</h1>
       |<ul>$frames</ul>
       |<h2>next steps</h2><ul>$acts</ul>
       |$back</body></html>""".stripMargin
  }

  /** The cached materialization of frame `index`, or None while the
    * async job is still running (submitting it if nobody has).
    */
  private def cachedFrame(s: Browse.Session, index: Int): Option[DataFrame] = {
    val df = s.pool(index)
    val spark = df.sparkSession
    val key = PlanCache.planKey(df)
    PlanCache.poll(key) match {
      case Some(PlanCache.Done(_)) =>
        Some(spark.read.parquet(s"$cacheDir/$key"))
      case Some(PlanCache.Failed(e)) =>
        throw new RuntimeException(s"materialization failed: $e")
      case Some(PlanCache.Running) => None
      case None =>
        // cold cache from an earlier server run counts as done
        if (new java.io.File(s"$cacheDir/$key", "_SUCCESS").exists())
          Some(spark.read.parquet(s"$cacheDir/$key"))
        else { PlanCache.submit(spark, df, cacheDir); None }
    }
  }

  private def waitPage: String =
    """<html><head><meta http-equiv="refresh" content="1"></head>
      |<body><p>computing… (auto-refreshes)</p></body></html>""".stripMargin

  private def renderCell(v: Any, colw: Int): String = {
    val s = String.valueOf(v)
    esc(if (s.length > colw) s.take(colw) + "..." else s)
  }

  /** The `colw` cookie (serve_view_df.py:55-72): current display
    * column width, adjusted ±10 by the col-width endpoints.
    */
  private def cookieColw(ex: HttpExchange): Int =
    Option(ex.getRequestHeaders.getFirst("Cookie")).toSeq
      .flatMap(_.split(";")).map(_.trim)
      .collectFirst { case c if c.startsWith("colw=") =>
        c.stripPrefix("colw=").toIntOption }
      .flatten.getOrElse(ViewMaxColWidth)

  private def viewPage(pageRaw: String, index: Int, q: String,
      colw: Int): (Int, String) = {
    val s = session(decode(q))
    cachedFrame(s, index) match {
      case None => (202, waitPage)
      case Some(cached) =>
        val n = cached.count()
        val npages = math.max(1, math.ceil(n.toDouble / Browse.PageSize).toInt)
        val page0 = pageRaw.toLowerCase match {
          case "first" => 0
          case "last" => -1
          case p => p.toInt
        }
        val page = if (page0 < 0) npages + page0 else math.min(page0, npages - 1)
        val rows = Browse.previewTop(cached, page, Browse.PageSize)
          .collect().drop((Browse.PageSize * page).max(0))
        val head = cached.columns
          .map(c => s"<th>${esc(c)}</th>").mkString("<tr>", "", "</tr>")
        val body = rows.map(r =>
          r.toSeq.map(v => s"<td>${renderCell(v, colw)}</td>")
            .mkString("<tr>", "", "</tr>")).mkString("\n")
        // bounded nav window (serve_view_df.py:44-52, NAV_PAGE_COUNT):
        // current +/- 2 plus first/last — constant-size HTML however
        // many pages the frame has
        val navPages = ((0 +: (page - 2 to page + 2) :+ (npages - 1))
          .filter(p => p >= 0 && p < npages)).distinct.sorted
        val nav = navPages.map { p =>
          val label =
            if (p == 0) "First" else if (p == npages - 1) "Last" else s"$p"
          if (p == page) s"<b>$label</b>"
          else s"""<a href="/view/$p/$index/$q">$label</a>"""
        }.mkString(" ")
        (200,
          s"""<html><body><h1>frame #$index page $page/${npages - 1}</h1>
             |<table>$head
             |$body</table>
             |<p>pages: $nav</p>
             |<p><a href="/explore/$q">back</a>
             | <a href="/download/csv/$index/$q">download csv</a></p>
             |</body></html>""".stripMargin)
    }
  }

  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def csv(index: Int, q: String): Option[String] = {
    val s = session(decode(q))
    cachedFrame(s, index).map { cached =>
      val order = cached.columns.toSeq.map(c => col(s"`$c`").asc)
      val lines = cached.orderBy(order: _*).collect()
        .map(_.toSeq.map(v => csvCell(String.valueOf(v))).mkString(","))
      (cached.columns.map(csvCell).mkString(",") +: lines).mkString("\n")
    }
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      segs match {
        case Nil | List("explore") =>
          respond(ex, 200, explorePage(""))
        case List("explore", q) =>
          respond(ex, 200, explorePage(q))
        case "goal" :: cols :: rest if rest.length <= 1 =>
          // plan a full path to the comma-separated goal columns from
          // the current state and redirect to the resulting explore
          // URL — the CLI's `goal` command (Browse.scala) over HTTP
          val q = rest.headOption.getOrElse("")
          val s = session(decode(q))
          Planner.findPath(s.registry, s.pool.map(_.columns.toVector),
            Vector(cols.split(",").toVector)) match {
            case None =>
              respond(ex, 404,
                s"<html><body>goal ${esc(cols)} unreachable</body></html>")
            case Some(path) =>
              ex.getResponseHeaders.set("Location",
                s"/explore/${encode(s.path ++ path)}")
              ex.sendResponseHeaders(302, -1)
              ex.close()
          }
        case List("view", "increase_col_width", x) =>
          val next = (cookieColw(ex) + x.toInt).max(1)
          ex.getResponseHeaders.set("Set-Cookie", s"colw=$next")
          respond(ex, 200, next.toString, "text/plain; charset=utf-8")
        case List("view", "decrease_col_width", x) =>
          val next = (cookieColw(ex) - x.toInt).max(1)
          ex.getResponseHeaders.set("Set-Cookie", s"colw=$next")
          respond(ex, 200, next.toString, "text/plain; charset=utf-8")
        case List("view", page, index, q) =>
          val (code, body) = viewPage(page, index.toInt, q, cookieColw(ex))
          respond(ex, code, body)
        case List("view", page, index) =>
          val (code, body) = viewPage(page, index.toInt, "", cookieColw(ex))
          respond(ex, code, body)
        case List("download", "csv", index, q) =>
          csv(index.toInt, q) match {
            case Some(body) =>
              // filename = longest column name (serve_view_df.py:171)
              val s = session(decode(q))
              val fname = s.pool(index.toInt).columns.maxBy(_.length)
                .replaceAll("[^A-Za-z0-9._-]", "_")
              ex.getResponseHeaders.set("Content-Disposition",
                s"""attachment; filename="$fname.csv"""")
              respond(ex, 200, body, "text/csv; charset=utf-8")
            case None => respond(ex, 202, waitPage)
          }
        case _ => respond(ex, 404, "<html><body>not found</body></html>")
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, s"<html><body>${esc(String.valueOf(e.getMessage))}</body></html>")
    }
  })
  server.start()

  /** The bound port (ephemeral when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object Serve {
  /** `runMain graft.planner.Serve [sfDir] [port]` — serves the
    * documents exploration the same way `graft.Browse` drives stdin.
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val source = args.headOption match {
      case Some(dir) => graft.ops.T(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      case None => Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    }
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-serve-cache").toString
    val srv = new Serve(Library.registry, Seq(source), cacheDir, port)
    println(s"serving on http://localhost:${srv.boundPort}/explore/ (ctrl-c to stop)")
    Thread.currentThread.join()
  }
}
