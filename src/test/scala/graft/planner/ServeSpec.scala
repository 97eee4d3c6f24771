package graft.planner

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

/** Drives [[Serve]] over real HTTP the way a browser drives the
  * reference's Flask app (serve.py): explore → follow an action link
  * → view the produced frame (first hit gets the async wait page,
  * then the rendered table) → download the CSV.
  */
class ServeSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  /** Poll `url` until the async materialization finishes (202 → 200),
    * like the reference's data_wait.html auto-refresh loop.
    */
  private def getDone(url: String, attempts: Int = 100): HttpResponse[String] = {
    var r = get(url)
    var left = attempts
    while (r.statusCode() == 202 && left > 0) {
      Thread.sleep(200); r = get(url); left -= 1
    }
    r
  }

  test("explore -> act -> view -> csv round-trips over HTTP") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-serve-spec").toString
    val srv = new Serve(
      TaskRegistry.of(Library.splitter, Library.removeNum),
      Seq(source), cacheDir)
    try {
      val base = s"http://localhost:${srv.boundPort}"

      // the root explore page lists the source frame and the splitter
      val home = get(s"$base/explore/")
      assert(home.statusCode() == 200, home.body())
      assert(home.body().contains("frame #0: (index, name)"), home.body())
      assert(home.body().contains("splitter"), home.body())

      // bound columns carry the reference's colored-double-overline
      // coding (state.tpl) and the page is planner.html's Current/Next
      assert(home.body().contains("double overline"), home.body())
      assert(home.body().contains("<h1>Current</h1>") &&
        home.body().contains("<h1>Next</h1>"), home.body())

      // follow the action whose output is name.split (state moves
      // entirely via the URL, like the reference's ?q=)
      val link = """href="(/explore/[^"]+)">(.*?)</a>""".r
        .findAllMatchIn(home.body())
        .collectFirst { case m if m.group(2).contains("name.split") =>
          m.group(1) }
      assert(link.isDefined, home.body())
      val after = get(base + link.get)
      assert(after.statusCode() == 200, after.body())
      assert(after.body().contains("name.split"), after.body())
      assert(after.body().contains("remove_num"), after.body())
      // the applied step lists under Tasks and can be cancelled
      assert(after.body().contains("Cancel last task"), after.body())

      // view the new frame: async compute, then a rendered page
      val q = link.get.stripPrefix("/explore/")
      val view = getDone(s"$base/view/0/1/$q")
      assert(view.statusCode() == 200, view.body())
      assert(view.body().contains("sankho123"), view.body())
      assert(view.body().contains("<table>"), view.body())
      // "last" page arithmetic resolves like serve_view_df.py:83-85
      assert(getDone(s"$base/view/last/1/$q").statusCode() == 200)

      // CSV download carries all rows
      val csv = getDone(s"$base/download/csv/1/$q")
      assert(csv.statusCode() == 200)
      assert(csv.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/csv"))
      assert(csv.body().linesIterator.size == 4, csv.body()) // header + 3 rows
      assert(csv.body().contains("turjo"), csv.body())

      // col-width cookie endpoints adjust the display width
      val wider = get(s"$base/view/increase_col_width/10")
      assert(wider.body() == "40", wider.body())
      assert(wider.headers().firstValue("Set-Cookie").orElse("") == "colw=40")
      val narrower = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/view/decrease_col_width/10"))
          .header("Cookie", "colw=40").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(narrower.body() == "30", narrower.body())

      // a narrow colw cookie truncates table cells like the reference
      val narrowView = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/view/0/1/$q"))
          .header("Cookie", "colw=4").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(narrowView.body().contains("sank..."), narrowView.body())

      // the goal route plans a whole path and redirects to it
      val goal = get(s"$base/goal/name.split.alpha")
      assert(goal.statusCode() == 302, goal.body())
      val planned = get(base +
        goal.headers().firstValue("Location").orElseThrow())
      assert(planned.body().contains("name.split.alpha"), planned.body())
      assert(get(s"$base/goal/no.such.column").statusCode() == 404)

      // bad routes 404 rather than crash the server
      assert(get(s"$base/nope").statusCode() == 404)
    } finally srv.stop()
  }

  test("warm CSV download streams from disk: zero Spark jobs, no collect") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-serve-csv").toString
    val srv = new Serve(TaskRegistry.of(Library.splitter), Seq(source), cacheDir)
    try {
      val base = s"http://localhost:${srv.boundPort}"
      val cold = getDone(s"$base/download/csv/0/")
      assert(cold.statusCode() == 200, cold.body())
      assert(cold.body().contains("sankho123"), cold.body())

      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(counter)
      val warm =
        try {
          val r = get(s"$base/download/csv/0/")
          org.apache.spark.GraftListenerDrain.drain(spark.sparkContext, 30000)
          r
        } finally spark.sparkContext.removeSparkListener(counter)
      assert(warm.statusCode() == 200)
      assert(warm.body() == cold.body())
      assert(jobs.get() == 0,
        s"warm CSV download ran ${jobs.get()} Spark jobs; must stream from disk")
    } finally srv.stop()
  }

  test("a deep last page reads one bounded cache file, not the frame") {
    val n = 50000L // 1,667 pages — the old limit(n) path would collect all n
    val source = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", n.toString).option("partitions", "8")
      .option("tokens", "5").load()
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-serve-deep").toString
    val srv = new Serve(TaskRegistry.of(Library.splitter), Seq(source), cacheDir)
    try {
      val base = s"http://localhost:${srv.boundPort}"
      assert(getDone(s"$base/view/0/0/").statusCode() == 200)

      val read = new java.util.concurrent.atomic.LongAdder
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) read.add(m.inputMetrics.recordsRead)
        }
      }
      spark.sparkContext.addSparkListener(counter)
      val last =
        try {
          val r = get(s"$base/view/last/0/")
          org.apache.spark.GraftListenerDrain.drain(spark.sparkContext, 30000)
          r
        } finally spark.sparkContext.removeSparkListener(counter)
      assert(last.statusCode() == 200, last.body())
      assert(last.body().contains(s"page 1666/1666"), last.body())
      // a page spans at most two 4096-row cache files; reading rows
      // anywhere near the 50k frame means the bounded paging regressed
      assert(read.sum < 10000,
        s"last-page render read ${read.sum} records; paging must stay bounded")

      // page 136 covers rows 4080-4110: it STRADDLES the 4096-row
      // file boundary, so both overlapping files must contribute and
      // the stitched page must still hold exactly PageSize rows
      val straddle = get(s"$base/view/136/0/")
      assert(straddle.statusCode() == 200, straddle.body())
      val dataRows = "<tr><td>".r.findAllIn(straddle.body()).size
      assert(dataRows == Browse.PageSize,
        s"boundary-straddling page rendered $dataRows rows, " +
          s"expected ${Browse.PageSize}")
    } finally srv.stop()
  }

  test("a second instance over the same plan rebuilds ITS caches, not empty 200s") {
    // PlanCache status is JVM-global; cacheDir is per-instance. A
    // Done recorded by instance A must not trick instance B into
    // serving pages/CSV from files it never built.
    import spark.implicits._
    val source = Seq((7L, "alpha beta gamma")).toDF("index", "name")
    def newServe() = new Serve(TaskRegistry.of(Library.splitter), Seq(source),
      java.nio.file.Files.createTempDirectory("graft-serve-2nd").toString)
    val a = newServe()
    try {
      val viewA = getDone(s"http://localhost:${a.boundPort}/view/0/0/")
      assert(viewA.statusCode() == 200 && viewA.body().contains("alpha"))
    } finally a.stop()
    val b = newServe()
    try {
      // first hit may answer 202 while B fills its own cacheDir; it
      // must NEVER answer 200 without the data
      val viewB = getDone(s"http://localhost:${b.boundPort}/view/0/0/")
      assert(viewB.statusCode() == 200, viewB.body())
      assert(viewB.body().contains("alpha"), viewB.body())
      val csvB = getDone(s"http://localhost:${b.boundPort}/download/csv/0/")
      assert(csvB.statusCode() == 200)
      assert(csvB.body().linesIterator.size == 2, csvB.body()) // header + 1 row
      assert(csvB.body().contains("beta"), csvB.body())
    } finally b.stop()
  }
}
