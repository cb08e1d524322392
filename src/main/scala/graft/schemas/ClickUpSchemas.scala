package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schemas for the warehouse tables and raw JSON inputs
  * (SURVEY.md §1.2–1.3; fetch_clickup_data.py:1215-1247, 958-965, 1014-1028,
  * 1077-1086, 1148-1156). Schema-on-write: the engine never relies on
  * inference (reference forces explicit schemas at
  * fetch_clickup_data.py:1096-1111, 1166-1180).
  */
object ClickUpSchemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  /** staging_time_entries / fact_time_entries — 31 columns
    * (fetch_clickup_data.py:1215-1247, identically 1410-1442).
    */
  val factTimeEntries: StructType = StructType(Seq(
    f("id", StringType, nullable = false),
    f("start_utc", TimestampType),
    f("end_utc", TimestampType),
    f("duration_ms", LongType),
    f("duration_hours", DoubleType),
    f("billable", BooleanType),
    f("description", StringType),
    f("source", StringType),
    f("at", TimestampType),
    f("is_locked", BooleanType),
    f("approval_id", StringType),
    f("task_url", StringType),
    f("task_id", StringType),
    f("task_name", StringType),
    f("task_custom_type", StringType),
    f("task_custom_id", StringType),
    f("task_status_status", StringType),
    f("task_status_color", StringType),
    f("task_status_type", StringType),
    f("task_status_orderindex", LongType),
    f("user_id", StringType),
    f("user_username", StringType),
    f("user_email", StringType),
    f("user_email_sha256", StringType),
    f("user_color", StringType),
    f("user_initials", StringType),
    f("user_profilePicture", StringType),
    f("task_location_list_id", StringType),
    f("task_location_folder_id", StringType),
    f("task_location_space_id", StringType),
    f("start_date_oslo", DateType)
  ))

  /** dim_lists (fetch_clickup_data.py:958-965). */
  val dimLists: StructType = StructType(Seq(
    f("space_id", StringType, nullable = false),
    f("space_name", StringType, nullable = false),
    f("folder_id", StringType),
    f("folder_name", StringType),
    f("list_id", StringType, nullable = false),
    f("list_name", StringType, nullable = false)
  ))

  /** dim_tasks (fetch_clickup_data.py:1014-1028). */
  val dimTasks: StructType = StructType(dimLists.fields.toSeq ++ Seq(
    f("task_id", StringType, nullable = false),
    f("task_name", StringType),
    f("status", StringType),
    f("time_estimate_hrs", DoubleType),
    f("url", StringType),
    f("closed", BooleanType),
    f("archived", BooleanType)
  ))

  /** dim_accounts (fetch_clickup_data.py:1077-1086). */
  val dimAccounts: StructType = StructType(Seq(
    f("account_task_id", StringType, nullable = false),
    f("account_name", StringType),
    f("connected_list_id", StringType),
    f("hours_discount", DoubleType),
    f("status", StringType),
    f("date_created", TimestampType),
    f("assignees", StringType),
    f("arr", DoubleType)
  ))

  /** dim_apps (fetch_clickup_data.py:1148-1156). */
  val dimApps: StructType = StructType(Seq(
    f("task_id", StringType, nullable = false),
    f("application_name", StringType),
    f("account_task_ids", StringType),
    f("arr", DoubleType),
    f("last_updated", TimestampType),
    f("status", StringType),
    f("maintenance", BooleanType)
  ))

  /** Raw time-entry JSON input (FIXTURES.md §A.1; consumed by
    * transform_time_entry at fetch_clickup_data.py:803-926). Epoch-ms fields
    * arrive as strings or numbers — declared StringType here and coerced
    * through [[graft.functions.Coercers.safeInt]].
    */
  val rawTimeEntry: StructType = StructType(Seq(
    f("id", StringType),
    f("start", StringType),
    f("end", StringType),
    f("duration", StringType),
    f("at", StringType),
    f("billable", BooleanType),
    f("description", StringType),
    f("source", StringType),
    f("is_locked", BooleanType),
    f("approval_id", StringType),
    f("task_url", StringType),
    f("task", StructType(Seq(
      f("id", StringType),
      f("name", StringType),
      f("custom_type", StringType),
      f("custom_id", StringType),
      f("status", StructType(Seq(
        f("status", StringType),
        f("color", StringType),
        f("type", StringType),
        f("orderindex", StringType)
      )))
    ))),
    f("user", StructType(Seq(
      f("id", StringType),
      f("username", StringType),
      f("email", StringType),
      f("color", StringType),
      f("initials", StringType),
      f("profilePicture", StringType)
    ))),
    f("task_location", StructType(Seq(
      f("list_id", StringType),
      f("folder_id", StringType),
      f("space_id", StringType)
    )))
  ))

  /** Raw task JSON input (FIXTURES.md §A.2; fetch_clickup_data.py:431-456,
    * 545-611, 709-763). `custom_fields[].value` is polymorphic in the source
    * (string, number, or array of {id}); declared as string + struct-array
    * variants and selected per custom-field id.
    */
  val rawTask: StructType = StructType(Seq(
    f("id", StringType),
    f("name", StringType),
    f("url", StringType),
    f("archived", BooleanType),
    f("custom_item_id", LongType),
    f("time_estimate", StringType),
    f("date_created", StringType),
    f("date_updated", StringType),
    f("status", StructType(Seq(
      f("status", StringType),
      f("type", StringType)
    ))),
    f("assignees", ArrayType(StructType(Seq(
      f("username", StringType)
    )))),
    f("custom_fields", ArrayType(StructType(Seq(
      f("id", StringType),
      f("value", StringType),
      f("value_rel", ArrayType(StructType(Seq(f("id", StringType)))))
    )))),
    // hierarchy context attached by the walk (S2/S3)
    f("space_id", StringType),
    f("space_name", StringType),
    f("folder_id", StringType),
    f("folder_name", StringType),
    f("list_id", StringType),
    f("list_name", StringType)
  ))

  /** Raw hierarchy rows for the S2 walk: spaces, folders, lists. */
  val rawSpace: StructType = StructType(Seq(
    f("id", StringType), f("name", StringType), f("archived", BooleanType)))
  val rawFolder: StructType = StructType(Seq(
    f("id", StringType), f("name", StringType), f("space_id", StringType),
    f("archived", BooleanType)))
  val rawList: StructType = StructType(Seq(
    f("id", StringType), f("name", StringType), f("space_id", StringType),
    f("folder_id", StringType), f("archived", BooleanType)))
}
