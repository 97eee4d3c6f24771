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

  /** The reference's stylesheet, inlined (static/styles/mainpage.css
    * plus the bits planner.html pulls from Bootstrap that the page
    * actually uses) — no CDN fetch, no framework: the engine's UI is
    * one self-contained HTML response.
    */
  private val Style =
    """<style>
      |body { font-family: sans-serif; margin: 1rem 2rem; }
      |h1 { font-size: 1.5rem; } h2 { font-size: 1.2rem; }
      |ul, ol { line-height: 1.6; }
      |.frame-pool a.frame { display: inline-block; margin: 0.2rem;
      |  padding: 0.3rem 0.6rem; border: 1px solid #4a7; border-radius: 4px;
      |  text-decoration: none; }
      |.cancel { display: inline-block; padding: 0.3rem 0.6rem;
      |  background: #e9b949; border-radius: 4px; color: black;
      |  text-decoration: none; }
      |.task-name { font-weight: bold; }
      |</style>""".stripMargin

  /** [[Browse.describe]] as HTML with every bound column marked by a
    * colored double overline unique to that column across all listed
    * actions — the reference's matched-column coding mechanism
    * (state.tpl's `text-decoration: <color> double overline`,
    * serve.py:125-129 extras_ui.get_unique_colors), with evenly
    * spaced hues replacing its random palette so colors are stable
    * across renders.
    */
  private def describeHtml(a: Planner.Action,
      hue: Map[String, Int]): String = {
    val binds = a.bindings.toSeq.sortBy(_._1).map { case (arg, b) =>
      val cols = b.cols.map { c =>
        s"""<span class="source-column" style="text-decoration: """ +
          s"""hsl(${hue(c.column)},70%,40%) double overline; """ +
          s"""text-decoration-thickness: 2px">${esc(c.column)}</span>"""
      }.mkString(",")
      s"${esc(arg)}=#${b.frameIdx}($cols)"
    }.mkString(" ")
    s"""<span class="task-name">${esc(a.task.name)}</span> $binds -&gt; """ +
      esc(a.outputs.map(_.mkString("[", ",", "]")).mkString(" "))
  }

  /** The explore page, structured as the reference's planner.html:
    * a "Current" section (the frame pool as outlined buttons, the
    * applied-action history, and the Cancel-last-task button — its
    * `back` link) and a "Next" section of plannable actions.
    */
  private def explorePage(q: String): String = {
    val s = session(decode(q))
    val actsList = Browse.actions(s)
    val colsUse = (actsList ++ s.path)
      .flatMap(_.bindings.valuesIterator.flatMap(_.cols.map(_.column)))
      .distinct.sorted
    val hue = colsUse.zipWithIndex.map { case (c, i) =>
      c -> i * 360 / math.max(1, colsUse.size)
    }.toMap
    val frames = s.pool.zipWithIndex.map { case (df, i) =>
      s"""<span><a class="frame" href="/view/0/$i/$q">frame #$i: """ +
        s"""(${esc(df.columns.mkString(", "))})</a>""" +
        s""" <a href="/download/csv/$i/$q">csv</a></span>"""
    }.mkString("\n")
    val applied = s.path.reverse.map { a =>
      s"<li>${describeHtml(a, hue)}</li>"
    }.mkString("\n")
    val acts = actsList.zipWithIndex.map { case (a, i) =>
      val nq = encode(s.path :+ a)
      s"""<li>[$i] <a href="/explore/$nq">${describeHtml(a, hue)}</a></li>"""
    }.mkString("\n")
    val cancel =
      if (s.path.isEmpty) ""
      else s"""<p><a class="cancel" """ +
        s"""href="/explore/${encode(s.path.dropRight(1))}">""" +
        "Cancel last task</a></p>"
    s"""<html><head><title>Explore Frame-Tasks</title>$Style</head>
       |<body><h1>Current</h1>
       |<div class="frame-pool">$frames</div>
       |<h2>Tasks</h2><ol class="actions">$applied</ol>
       |$cancel
       |<h1>Next</h1><ul>$acts</ul>
       |</body></html>""".stripMargin
  }

  /** Rows per sorted page-cache file: bounds what any single page
    * render ever reads or collects (<= 2 files span a page), however
    * many rows the frame has. 4096 = 136 UI pages per file.
    */
  private val PageFileRows = 4096

  private def stableOrder(df: DataFrame) =
    df.columns.toSeq.map(c => col(s"`$c`").asc)

  /** Serving caches built beside the raw parquet, inside the same
    * async job (the [[PlanCache.submit]] `andThen` hook):
    *
    *   - `<key>.pages` — the frame under the stable total order (all
    *     columns asc), range-partitioned by the sort and split into
    *     files of <= [[PageFileRows]] rows. Lexicographic file order
    *     IS the global row order, so page p lives in the one (or two,
    *     at a boundary) files its row span overlaps — a deep page
    *     costs one bounded file read, not a `limit(n)` collect
    *     (the round-4 audit's last scale-killer, Browse.scala's
    *     previewTop applied to page "last").
    *   - `<key>.csv` — the same ordering as distributed headerless
    *     CSV part files; a download streams them in name order
    *     straight from disk (RFC-style quote doubling, nulls as
    *     "null" like the old in-memory renderer), never collecting
    *     the frame to the driver (serve_view_df.py:167 does — that is
    *     the one reference behavior deliberately not reproduced).
    */
  private def buildPageCache(cached: DataFrame, key: String): Unit = {
    // the .pages directory is about to be overwritten with new part
    // files — a manifest computed over the old listing must not
    // survive the rebuild (stale file names 500 until restart)
    manifests.remove(key)
    val sorted = cached.orderBy(stableOrder(cached): _*)
    sorted.write.mode("overwrite")
      .option("maxRecordsPerFile", PageFileRows.toLong)
      .parquet(s"$cacheDir/$key.pages")
    // CSV rejects nested types the parquet pages keep; stringify every
    // column for the download (sort order is the typed one above)
    sorted.select(sorted.columns.toSeq
        .map(c => col(s"`$c`").cast("string").as(c)): _*)
      .write.mode("overwrite")
      .option("header", "false").option("nullValue", "null")
      .option("escape", "\"")
      .csv(s"$cacheDir/$key.csv")
  }

  /** This instance's serving caches for `key` exist on disk. The
    * PlanCache status map is JVM-GLOBAL while cacheDir is
    * per-instance, so a Done recorded by another Serve over the same
    * plan does NOT mean our pages/CSV exist — trusting it blindly
    * would serve empty 200s. Done only counts together with this
    * check; when it fails, [[rebuildLocal]] fills this cacheDir.
    */
  private def cachesReady(key: String): Boolean =
    new java.io.File(s"$cacheDir/$key.pages", "_SUCCESS").exists() &&
      new java.io.File(s"$cacheDir/$key.csv", "_SUCCESS").exists()

  /** key -> "failed: …" for local page-cache rebuilds; a key is
    * in-flight while mapped to "running".
    */
  private val localBuilds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build this instance's raw + page/CSV caches for a plan another
    * instance already materialized (global status Done, local files
    * absent): same async posture as a fresh submit — the request gets
    * the wait page while a daemon thread fills the local cacheDir.
    */
  private def rebuildLocal(spark: SparkSession,
      df: DataFrame, key: String): Unit = {
    val st = localBuilds.get(key)
    if (st != null && st.startsWith("failed")) {
      // report the failure once, then clear the entry so the NEXT
      // request re-triggers the build — a transient failure (disk
      // blip, executor loss) must not brick the frame for the
      // server's lifetime
      localBuilds.remove(key, st)
      throw new RuntimeException(st)
    }
    if (localBuilds.putIfAbsent(key, "running") == null) {
      val t = new Thread(() => {
        try {
          val cached = PlanCache.materialize(spark, df, cacheDir)
          buildPageCache(cached, key)
          localBuilds.remove(key)
        } catch {
          case e: Throwable =>
            localBuilds.put(key, s"failed: ${String.valueOf(e.getMessage)}")
        }
      }, s"graft-pagecache-$key")
      t.setDaemon(true)
      t.start()
    }
  }

  /** The served frame's plan key and row count, or None while the
    * async materialization (raw parquet + page/CSV caches + count)
    * is still running — submitting it if nobody has. The count comes
    * from the Done status recorded at materialization time, so a page
    * render runs no per-request counting job (round-4 audit item (b)).
    */
  private def servedFrame(s: Browse.Session, index: Int): Option[(String, Long)] = {
    val df = s.pool(index)
    val spark = df.sparkSession
    val key = PlanCache.planKey(df)
    PlanCache.poll(key) match {
      case Some(PlanCache.Done(n)) if cachesReady(key) => Some((key, n))
      case Some(PlanCache.Done(_)) =>
        rebuildLocal(spark, df, key)
        None
      case Some(PlanCache.Failed(e)) =>
        throw new RuntimeException(s"materialization failed: $e")
      case Some(PlanCache.Running) => None
      case None =>
        // cold raw cache from an earlier run still re-submits (the
        // materialize inside is a no-op) so the page/CSV caches and
        // the remembered count get rebuilt exactly once
        PlanCache.submit(spark, df, cacheDir,
          cached => buildPageCache(cached, key))
        None
    }
  }

  private case class PageFile(path: String, rows: Long, start: Long)

  private val manifests =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[PageFile]]()

  /** Sorted page files with their row counts (parquet footer metadata,
    * read driver-side once per key — no Spark job) and cumulative
    * start offsets.
    */
  private def manifest(spark: SparkSession, key: String): Vector[PageFile] =
    manifests.computeIfAbsent(key, _ => {
      val conf = spark.sparkContext.hadoopConfiguration
      val parts = Option(new java.io.File(s"$cacheDir/$key.pages").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getPath).sorted
      var cum = 0L
      parts.toVector.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n = try reader.getRecordCount finally reader.close()
        val pf = PageFile(p, n, cum)
        cum += n
        pf
      }
    })

  /** Rows [page*PageSize, +PageSize) of the sorted cache: only the
    * 1-2 files overlapping that span are read, each re-sorted (they
    * are single bounded files) with offset + limit so the driver
    * collects EXACTLY the page's rows — executors scan at most
    * [[PageFileRows]] rows per file, the driver never holds more
    * than a page.
    */
  private def pageRows(spark: SparkSession, key: String, page: Int): Seq[Row] = {
    val start = page.toLong * Browse.PageSize
    val end = start + Browse.PageSize
    manifest(spark, key)
      .filter(f => f.start < end && f.start + f.rows > start)
      .flatMap { f =>
        val lo = (start - f.start).max(0)
        val hi = (end - f.start).min(f.rows)
        val df = spark.read.parquet(f.path)
        df.orderBy(stableOrder(df): _*)
          .offset(lo.toInt).limit((hi - lo).toInt)
          .collect()
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
    servedFrame(s, index) match {
      case None => (202, waitPage)
      case Some((key, n)) =>
        val npages = math.max(1, math.ceil(n.toDouble / Browse.PageSize).toInt)
        val page0 = pageRaw.toLowerCase match {
          case "first" => 0
          case "last" => -1
          case p => p.toInt
        }
        val page = if (page0 < 0) npages + page0 else math.min(page0, npages - 1)
        val rows = pageRows(s.pool(index).sparkSession, key, page)
        val head = s.pool(index).columns
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

  /** Stream the CSV cache to the response: a header line, then the
    * sorted part files copied byte-for-byte in name order, O(buffer)
    * memory, ZERO Spark jobs on a warm cache — the
    * distributed-write-then-stream replacement for the old
    * `collect().mkString` (which was reference-faithful,
    * serve_view_df.py:167, and a driver OOM at corpus scale). The
    * response carries an explicit Content-Length (header bytes + the
    * part sizes snapshotted BEFORE streaming) so an IO error mid-copy
    * surfaces to the client as a truncated body, not a silently
    * short 200. Returns false while the materialization is still
    * running.
    */
  private def streamCsv(ex: HttpExchange, s: Browse.Session,
      index: Int): Boolean =
    servedFrame(s, index) match {
      case None => false
      case Some((key, _)) =>
        val cols = s.pool(index).columns
        // filename = longest column name (serve_view_df.py:171)
        val fname = cols.maxBy(_.length).replaceAll("[^A-Za-z0-9._-]", "_")
        val parts = Option(new java.io.File(s"$cacheDir/$key.csv").listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".csv"))
          .sortBy(_.getName)
        val header = (cols.map(csvCell).mkString(",") + "\n").getBytes(UTF_8)
        val total = header.length.toLong + parts.map(_.length()).sum
        ex.getResponseHeaders.set("Content-Type", "text/csv; charset=utf-8")
        ex.getResponseHeaders.set("Content-Disposition",
          s"""attachment; filename="$fname.csv"""")
        ex.sendResponseHeaders(200, total)
        val out = ex.getResponseBody
        try {
          out.write(header)
          parts.foreach(p => java.nio.file.Files.copy(p.toPath, out))
        } finally {
          out.close()
          ex.close()
        }
        true
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
          if (!streamCsv(ex, session(decode(q)), index.toInt))
            respond(ex, 202, waitPage)
        case List("download", "csv", index) =>
          if (!streamCsv(ex, session(Vector.empty), index.toInt))
            respond(ex, 202, waitPage)
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
