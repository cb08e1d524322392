package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Coercers._
import graft.operators.Dedup

/** The five ClickUp pipelines re-expressed as pure `DataFrame => DataFrame`
  * transforms (SURVEY.md §3). Sources are raw-JSON DataFrames read with the
  * explicit schemas of [[graft.schemas.ClickUpSchemas]]; REST pagination /
  * retry is an ingestion concern outside the engine (SURVEY.md §2.1 S6).
  * Every transform is a single `select` of codegen'd column expressions —
  * no UDFs, no per-row logic — so the same plan scales from the fixture
  * tests to a 100 TB fact.
  */
object Pipelines {

  /** T1+T2+C1–C5 — flatten a raw time entry into the 31-column fact row
    * (fetch_clickup_data.py:803-926). Per-column null-safety replaces the
    * reference's per-record try/except fallback row (:891-926): a malformed
    * field nulls/defaults that column instead of nulling the whole row.
    */
  def flattenTimeEntries(raw: DataFrame): DataFrame = {
    def s(c: Column): Column = coalesce(c.cast("string"), lit(""))
    val startTs = epochMsToTs(nullIfZero(col("start")))
    raw.select(
      s(col("id")).as("id"),
      startTs.as("start_utc"),
      epochMsToTs(nullIfZero(col("end"))).as("end_utc"),
      safeInt(col("duration")).as("duration_ms"),
      // duration_hours: 0.0 when duration is 0/missing/unparseable (:820)
      msToHours(col("duration")).as("duration_hours"),
      coalesce(col("billable"), lit(false)).as("billable"),
      s(col("description")).as("description"),
      s(col("source")).as("source"),
      epochMsToTs(nullIfZero(col("at"))).as("at"),
      coalesce(col("is_locked"), lit(false)).as("is_locked"),
      strOrNull(col("approval_id")).as("approval_id"),
      s(col("task_url")).as("task_url"),
      strOrNull(col("task.id")).as("task_id"),
      s(col("task.name")).as("task_name"),
      col("task.custom_type").cast("string").as("task_custom_type"),
      col("task.custom_id").cast("string").as("task_custom_id"),
      s(col("task.status.status")).as("task_status_status"),
      s(col("task.status.color")).as("task_status_color"),
      s(col("task.status.type")).as("task_status_type"),
      safeInt(col("task.status.orderindex")).as("task_status_orderindex"),
      strOrNull(col("user.id")).as("user_id"),
      s(col("user.username")).as("user_username"),
      s(col("user.email")).as("user_email"),
      sha256OrNull(col("user.email")).as("user_email_sha256"),
      s(col("user.color")).as("user_color"),
      s(col("user.initials")).as("user_initials"),
      s(col("user.profilePicture")).as("user_profilePicture"),
      strOrNull(col("task_location.list_id")).as("task_location_list_id"),
      strOrNull(col("task_location.folder_id")).as("task_location_folder_id"),
      strOrNull(col("task_location.space_id")).as("task_location_space_id"),
      osloDate(startTs).as("start_date_oslo")
    )
  }

  /** Reference treats epoch 0 / missing as "no timestamp"
    * (`if start_ms:` at fetch_clickup_data.py:815-817).
    */
  private def nullIfZero(c: Column): Column = {
    val i = safeInt(c)
    when(i =!= 0, c)
  }

  /** Fact pipeline tail: flatten → dedup keep-latest (D1). The reference
    * only dedups when at least one `at` is non-null
    * (fetch_clickup_data.py:1775 `if ... not df['at'].isna().all()`); the
    * guard is one cheap existence probe.
    */
  def timeEntryPipeline(raw: DataFrame): DataFrame = {
    val flat = flattenTimeEntries(raw)
    if (flat.filter(col("at").isNotNull).isEmpty) flat
    else Dedup.dedupTimeEntries(flat)
  }

  /** S2 — hierarchy walk for dim_lists (fetch_clickup_data.py:196-279):
    * spaces × folders × lists, plus folder-less lists with the `''` sentinel
    * (:264-272). Expressed as two joined branches + unionByName, mirroring
    * the walk's 2a/2b structure. Spaces/folders are KB-scale → broadcast.
    */
  def denormalizeLists(spaces: DataFrame, folders: DataFrame,
                       lists: DataFrame): DataFrame = {
    def str0(c: Column): Column = coalesce(c.cast("string"), lit(""))
    val sp = spaces.select(str0(col("id")).as("space_id"),
      str0(col("name")).as("space_name"))
    val fo = folders.select(str0(col("id")).as("folder_id"),
      str0(col("name")).as("folder_name"), str0(col("space_id")).as("fsid"))
    val hasFolder = col("folder_id").isNotNull && length(col("folder_id")) > 0

    val inFolder = lists.filter(hasFolder)
      .select(str0(col("id")).as("list_id"), str0(col("name")).as("list_name"),
        str0(col("folder_id")).as("folder_id"))
      .join(broadcast(fo), Seq("folder_id"))
      .join(broadcast(sp), col("fsid") === col("space_id")).drop("fsid")
    val folderLess = lists.filter(!hasFolder)
      .select(str0(col("id")).as("list_id"), str0(col("name")).as("list_name"),
        str0(col("space_id")).as("space_id"),
        lit("").as("folder_id"), lit("").as("folder_name"))
      .join(broadcast(sp), Seq("space_id"))

    inFolder.unionByName(folderLess)
      .select("space_id", "space_name", "folder_id", "folder_name",
        "list_id", "list_name")
  }

  /** S3+C4+F2 — dim_tasks transform (fetch_clickup_data.py:403-465).
    * Input rows already carry the hierarchy context columns attached by the
    * walk (space/folder/list ids+names); the archived axis (:344) is a
    * column, not a second scan.
    */
  def transformTasks(rawTasks: DataFrame): DataFrame = {
    def s(c: Column): Column = coalesce(c.cast("string"), lit(""))
    val est = safeFloat(col("time_estimate"))
    rawTasks.select(
      s(col("space_id")).as("space_id"),
      s(col("space_name")).as("space_name"),
      s(col("folder_id")).as("folder_id"),
      s(col("folder_name")).as("folder_name"),
      s(col("list_id")).as("list_id"),
      s(col("list_name")).as("list_name"),
      s(col("id")).as("task_id"),
      s(col("name")).as("task_name"),
      s(col("status.status")).as("status"),
      // `if time_estimate_ms:` → 0/None stays null (:433-436)
      when(est =!= 0.0, round(est / lit(3600000.0), 2)).as("time_estimate_hrs"),
      s(col("url")).as("url"),
      coalesce(col("status.type") === "closed", lit(false)).as("closed"),
      coalesce(col("archived"), lit(false)).as("archived")
    )
  }

  /** Custom-field ids (reference env defaults,
    * fetch_clickup_data.py:1559-1562, 1618-1621).
    */
  object Cf {
    val connected = "00aeeab8-926e-4c46-8299-99f973287b6e"
    val hoursDiscount = "2617cb32-785f-48ba-974a-1468c66e9166"
    val arr = "93ed8859-06ad-4909-938c-70b6f4c8352a"
    val lastUpdated = "203398a3-0a22-47b2-9ab9-8b838032f58e"
    val maintenance = "1a9472e3-46e0-4cd3-88c5-587efaab0320"
    val accountsRel = "9ac424ac-f78f-47ab-89c0-9b5540fee5c5"
  }

  /** T3 — custom-field lookup by id (fetch_clickup_data.py:547-549):
    * `filter(custom_fields, f -> f.id == cfId)[0]`.
    */
  def cfField(cfId: String): Column =
    element_at(filter(col("custom_fields"), f => f.getField("id") === cfId), 1)
  def cfValue(cfId: String): Column = cfField(cfId).getField("value")

  /** S4+T3+C8+C10+C12+E1 — dim_accounts transform with one row per
    * connected list id (fetch_clickup_data.py:528-617). The `['']` sentinel
    * (:552-558) guarantees at least one row per account task even when the
    * connected-lists field is empty.
    */
  def transformAccounts(rawAccounts: DataFrame): DataFrame = {
    def s(c: Column): Column = coalesce(c.cast("string"), lit(""))
    rawAccounts.select(
      s(col("id")).as("account_task_id"),
      s(col("name")).as("account_name"),
      explode(splitTrimDropEmpty(cfValue(Cf.connected))).as("connected_list_id"),
      safeFloatDefault(cfValue(Cf.hoursDiscount), 0.0).as("hours_discount"),
      s(col("status.status")).as("status"),
      // NOTE: unlike the time-entry fields (safe_int first, so 0 AND "0"
      // are falsy → null), the reference tests the RAW value here
      // (:589-596 `if date_created:`): string "0" is truthy → epoch 0 →
      // 1970-01-01. Under this schema date_created is always a string, so
      // plain epochMsToTs reproduces that exactly; Python's int-0 case is
      // unrepresentable here.
      epochMsToTs(col("date_created")).as("date_created"),
      joinNames(coalesce(col("assignees"), array())).as("assignees"),
      safeFloat(cfValue(Cf.arr)).as("arr")
    )
  }

  /** S5+F1+T3+C8+C9+C11 — dim_apps transform
    * (fetch_clickup_data.py:689-769): team scan filtered to
    * `custom_item_id == 1005`, custom-field extraction, relationship ids
    * joined to a string.
    */
  def transformApps(rawTasks: DataFrame): DataFrame = {
    def s(c: Column): Column = coalesce(c.cast("string"), lit(""))
    rawTasks.filter(col("custom_item_id") === 1005).select(
      s(col("id")).as("task_id"),
      s(col("name")).as("application_name"),
      joinIds(coalesce(cfField(Cf.accountsRel).getField("value_rel"), array()))
        .as("account_task_ids"),
      safeFloat(cfValue(Cf.arr)).as("arr"),
      epochMsToTs(when(length(cfValue(Cf.lastUpdated)) > 0,
        cfValue(Cf.lastUpdated))).as("last_updated"),
      s(col("status.status")).as("status"),
      checkboxBool(cfValue(Cf.maintenance)).as("maintenance")
    )
  }
}
