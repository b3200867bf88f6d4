package graft.model

/** Consumer progress on one partition timeline.
  *
  * Field names intentionally mirror the reference's JSON serialization of
  * `Checkpoint` (databus-core/.../core/Checkpoint.java:39-140):
  * windowScn/windowOffset/prevScn/tsNsecs plus the bootstrap-phase fields
  * (Checkpoint.java:82-213). `windowOffset` = how many events of the
  * current (partially-consumed) window have already been delivered, so a
  * resume can skip them (partial-window replay, Checkpoint.java:66-68);
  * negative = the window is fully consumed (the reference's -1 marker),
  * 0 = none delivered yet (the whole window replays on resume).
  *
  * `consumption_mode`: ONLINE_CONSUMPTION | BOOTSTRAP_SNAPSHOT |
  * BOOTSTRAP_CATCHUP (Checkpoint.java ConsumptionMode).
  */
case class Checkpoint(
    consumption_mode: String = Checkpoint.Online,
    windowScn: Long = -1L,
    windowOffset: Long = -1L,
    prevScn: Long = -1L,
    tsNsecs: Long = -1L,
    // bootstrap-phase fields (B6; Checkpoint.java:82-213)
    bootstrap_since_scn: Long = -1L,
    bootstrap_start_scn: Long = -1L,
    bootstrap_target_scn: Long = -1L,
    bootstrap_snapshot_source_index: Int = -1,
    bootstrap_catchup_source_index: Int = -1,
    snapshot_offset: Long = -1L) {

  def isBootstrap: Boolean = consumption_mode != Checkpoint.Online

  /** Flexible checkpoint = "start wherever you have data"
    * (Checkpoint.java:75-80). */
  def isFlexible: Boolean = windowScn < 0 && consumption_mode == Checkpoint.Online

  def toJson: String = {
    def f(k: String, v: Any): String = s""""$k":$v"""
    "{" + Seq(
      s""""consumption_mode":"$consumption_mode"""",
      f("windowScn", windowScn), f("windowOffset", windowOffset),
      f("prevScn", prevScn), f("tsNsecs", tsNsecs),
      f("bootstrap_since_scn", bootstrap_since_scn),
      f("bootstrap_start_scn", bootstrap_start_scn),
      f("bootstrap_target_scn", bootstrap_target_scn),
      f("bootstrap_snapshot_source_index", bootstrap_snapshot_source_index),
      f("bootstrap_catchup_source_index", bootstrap_catchup_source_index),
      f("snapshot_offset", snapshot_offset)).mkString(",") + "}"
  }
}

object Checkpoint {
  val Online = "ONLINE_CONSUMPTION"
  val BootstrapSnapshot = "BOOTSTRAP_SNAPSHOT"
  val BootstrapCatchup = "BOOTSTRAP_CATCHUP"

  /** Flexible = serve from wherever the buffer starts
    * (Checkpoint.java:75-80; ReadEventsRequestProcessor STREAM_FROM_LATEST). */
  val flexible: Checkpoint = Checkpoint()

  def online(windowScn: Long, windowOffset: Long = -1L, prevScn: Long = -1L): Checkpoint =
    Checkpoint(Online, windowScn, windowOffset, prevScn)

  private val Num = """"([a-z_A-Z]+)":(-?\d+)""".r
  private val Str = """"([a-z_A-Z]+)":"([^"]*)"""".r

  /** Minimal JSON parse matching [[Checkpoint.toJson]] (and tolerant of the
    * reference's field ordering). */
  def fromJson(json: String): Checkpoint = {
    val nums = Num.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toLong).toMap
    val strs = Str.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
    def n(k: String, d: Long = -1L): Long = nums.getOrElse(k, d)
    Checkpoint(
      consumption_mode = strs.getOrElse("consumption_mode", Online),
      windowScn = n("windowScn"),
      windowOffset = n("windowOffset"),
      prevScn = n("prevScn"),
      tsNsecs = n("tsNsecs"),
      bootstrap_since_scn = n("bootstrap_since_scn"),
      bootstrap_start_scn = n("bootstrap_start_scn"),
      bootstrap_target_scn = n("bootstrap_target_scn"),
      bootstrap_snapshot_source_index = n("bootstrap_snapshot_source_index").toInt,
      bootstrap_catchup_source_index = n("bootstrap_catchup_source_index").toInt,
      snapshot_offset = n("snapshot_offset"))
  }
}

/** Map physicalPartition → Checkpoint plus the round-robin cursor partition
  * (multi-timeline fairness). Reference: CheckpointMult.java:47,57-67. */
case class CheckpointMult(
    checkpoints: Map[Short, Checkpoint],
    cursorPartition: Option[Short] = None) {

  def apply(partition: Short): Checkpoint =
    checkpoints.getOrElse(partition, Checkpoint.flexible)

  def updated(partition: Short, cp: Checkpoint): CheckpointMult =
    copy(checkpoints = checkpoints + (partition -> cp))

  /** Next partition after the cursor, wrapping — the round-robin emission
    * order across physical partitions (CheckpointMult.java:57-67). */
  def nextCursor: Option[Short] = {
    val parts = checkpoints.keys.toSeq.sorted
    if (parts.isEmpty) None
    else cursorPartition match {
      case None => Some(parts.head)
      case Some(c) => Some(parts.find(_ > c).getOrElse(parts.head))
    }
  }

  def toJson: String = {
    // one field list, one mkString — an empty checkpoint map with a set
    // cursor must not produce a leading comma (invalid JSON)
    val fields = checkpoints.toSeq.sortBy(_._1).map { case (p, cp) =>
      s""""$p":${cp.toJson}"""
    } ++ cursorPartition.map(c => s""""cursorPartition":$c""")
    fields.mkString("{", ",", "}")
  }
}
