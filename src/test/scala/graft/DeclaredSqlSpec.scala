package graft

import graft.pipelines.Pipelines
import graft.schemas.ClickUpSchemas

/** The reference's own declared SQL (docs/TASKS_SYNC_FEATURE.md:129-181,
  * 230-246; docs/LISTS_SYNC_FEATURE.md:147-166;
  * docs/DEPLOYMENT_SUCCESS.md:121-128) run verbatim via `spark.sql` over
  * warehouse tables built by the pipelines — only the BigQuery
  * `project.dataset.` table prefix is rewritten to temp views. A user's
  * dashboards would port by search-and-replace of the table prefix.
  */
class DeclaredSqlSpec extends SparkSpec {
  import spark.implicits._

  private def ds(lines: String*) = {
    import spark.implicits._
    lines.toDS
  }

  private lazy val ready: Unit = {
    val entries = Seq(
      """{"id":"e1","start":"1717426800000","end":"1717434000000","duration":"7200000","at":"1717434100000","billable":true,"task":{"id":"t1","name":"Build","status":{"status":"open","type":"open","orderindex":"0"}},"user":{"id":"u1","username":"jane","email":"j@x.no"},"task_location":{"list_id":"l1","folder_id":"f1","space_id":"s1"}}""",
      """{"id":"e2","start":"1717513200000","end":"1717516800000","duration":"3600000","at":"1717513300000","billable":false,"task":{"id":"t2","name":"Review","status":{"status":"done","type":"closed","orderindex":"1"}},"user":{"id":"u2","username":"ola","email":"o@x.no"},"task_location":{"list_id":"l2","folder_id":"","space_id":"s1"}}""")
    Pipelines.timeEntryPipeline(
      spark.read.schema(ClickUpSchemas.rawTimeEntry).json(ds(entries: _*)))
      .createOrReplaceTempView("fact_time_entries")

    val tasks = Seq(
      """{"id":"t1","name":"Build","url":"u1","archived":false,"time_estimate":"14400000","status":{"status":"open","type":"open"},"space_id":"s1","space_name":"Space","folder_id":"f1","folder_name":"Folder","list_id":"l1","list_name":"ListA"}""",
      """{"id":"t2","name":"Review","url":"u2","archived":false,"time_estimate":"0","status":{"status":"done","type":"closed"},"space_id":"s1","space_name":"Space","folder_id":"","folder_name":"","list_id":"l2","list_name":"ListB"}""")
    Pipelines.transformTasks(
      spark.read.schema(ClickUpSchemas.rawTask).json(ds(tasks: _*)))
      .createOrReplaceTempView("dim_tasks")

    Pipelines.denormalizeLists(
      spark.read.schema(ClickUpSchemas.rawSpace).json(ds(
        """{"id":"s1","name":"Space","archived":false}""")),
      spark.read.schema(ClickUpSchemas.rawFolder).json(ds(
        """{"id":"f1","name":"Folder","space_id":"s1","archived":false}""")),
      spark.read.schema(ClickUpSchemas.rawList).json(ds(
        """{"id":"l1","name":"ListA","space_id":"s1","folder_id":"f1","archived":false}""",
        """{"id":"l2","name":"ListB","space_id":"s1","folder_id":"","archived":false}""")))
      .createOrReplaceTempView("dim_lists")
  }

  test("open-task listing (TASKS_SYNC_FEATURE.md:136-149)") {
    ready
    val rows = spark.sql(
      """SELECT space_name, folder_name, list_name, task_name, status,
        |  time_estimate_hrs, url
        |FROM dim_tasks
        |WHERE closed = FALSE AND archived = FALSE
        |ORDER BY space_name, list_name, task_name""".stripMargin).collect()
    assert(rows.map(_.getString(3)).toSeq == Seq("Build"))
    assert(rows(0).getDouble(5) == 4.0)
  }

  test("task summary by status with conditional counts (TASKS_SYNC_FEATURE.md:169-181)") {
    ready
    val rows = spark.sql(
      """SELECT space_name, status, COUNT(*) as task_count,
        |  SUM(time_estimate_hrs) as total_estimated_hours,
        |  SUM(CASE WHEN closed = TRUE THEN 1 ELSE 0 END) as closed_count,
        |  SUM(CASE WHEN archived = TRUE THEN 1 ELSE 0 END) as archived_count
        |FROM dim_tasks GROUP BY space_name, status
        |ORDER BY space_name, status""".stripMargin)
      .as[(String, String, Long, Option[Double], Long, Long)].collect().toSeq
    assert(rows == Seq(
      ("Space", "done", 1L, None, 1L, 0L),
      ("Space", "open", 1L, Some(4.0), 0L, 0L)))
  }

  test("fact ⟕ dim_tasks with date filter (TASKS_SYNC_FEATURE.md:151-167)") {
    ready
    val rows = spark.sql(
      """SELECT t.start_date_oslo, t.duration_hours,
        |  t.task_name as time_entry_task, tasks.task_name as task_details,
        |  tasks.status, tasks.time_estimate_hrs, tasks.closed, tasks.archived
        |FROM fact_time_entries t
        |LEFT JOIN dim_tasks tasks ON t.task_id = tasks.task_id
        |WHERE t.start_date_oslo >= '2024-01-01'
        |ORDER BY t.start_date_oslo DESC""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("task_details") == "Review")
  }

  test("estimate-vs-actual variance with HAVING (TASKS_SYNC_FEATURE.md:230-246)") {
    ready
    val rows = spark.sql(
      """SELECT t.task_id, t.task_name, t.time_estimate_hrs as estimated_hrs,
        |  SUM(te.duration_hours) as actual_hrs,
        |  (SUM(te.duration_hours) - t.time_estimate_hrs) as variance_hrs
        |FROM dim_tasks t
        |LEFT JOIN fact_time_entries te ON t.task_id = te.task_id
        |WHERE t.closed = FALSE
        |GROUP BY t.task_id, t.task_name, t.time_estimate_hrs
        |HAVING t.time_estimate_hrs IS NOT NULL
        |ORDER BY variance_hrs DESC""".stripMargin)
      .as[(String, String, Double, Double, Double)].collect().toSeq
    assert(rows == Seq(("t1", "Build", 4.0, 2.0, -2.0)))
  }

  test("fact ⟕ dim_lists on task_location_list_id (LISTS_SYNC_FEATURE.md:153-166)") {
    ready
    val rows = spark.sql(
      """SELECT t.id, t.start_date_oslo, t.duration_hours,
        |  l.space_name, l.folder_name, l.list_name
        |FROM fact_time_entries t
        |LEFT JOIN dim_lists l ON t.task_location_list_id = l.list_id
        |WHERE t.start_date_oslo >= '2024-01-01'
        |ORDER BY t.start_date_oslo DESC""".stripMargin).collect()
    assert(rows.map(_.getAs[String]("list_name")).toSeq == Seq("ListB", "ListA"))
  }

  test("health scan (DEPLOYMENT_SUCCESS.md:121-128)") {
    ready
    val r = spark.sql(
      """SELECT COUNT(*) as total_entries,
        |  MIN(start_date_oslo) as earliest_date,
        |  MAX(start_date_oslo) as latest_date,
        |  COUNT(DISTINCT user_id) as unique_users
        |FROM fact_time_entries""".stripMargin).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(3) == 2L)
    assert(r.getAs[java.sql.Date]("earliest_date").toString == "2024-06-03")
  }
}
