package graft.model

/** A subscription = (physical partition, logical source, logical partition)
  * triple with wildcards.
  *
  * Reference: databus-core/.../data_model/DatabusSubscription.java:45,68 and
  * the URI codec at :231-237 — e.g. `cdc://MASTER/db/1/table` or the legacy
  * form `com.example.Person:3`. We reproduce both grammars with neutral
  * scheme names; wildcard = `*` (ANY).
  */
case class Subscription(
    physicalPartition: Option[Short], // None = ANY
    logicalSource: Option[String],    // None = ANY (source *name*)
    logicalPartition: Option[Short]) {

  def matchesSource(name: String): Boolean =
    logicalSource.forall(_ == name)

  def uri: String = {
    val pp = physicalPartition.map(_.toString).getOrElse("*")
    val ls = logicalSource.getOrElse("*")
    val lp = logicalPartition.map(_.toString).getOrElse("*")
    s"cdc://$pp/$ls/$lp"
  }
}

object Subscription {
  val any: Subscription = Subscription(None, None, None)

  /** Parse either `cdc://<phys>/<source>/<logical>` (modern,
    * DatabusSubscription.java:231-237) or `<source>[:<logicalPartition>]`
    * (legacy, LegacySubscriptionUriCodec.java:1). */
  def parse(s: String): Subscription = {
    def part(tok: String): Option[Short] =
      if (tok == "*" || tok.isEmpty) None else Some(tok.toShort)
    if (s.contains("://")) {
      val rest = s.substring(s.indexOf("://") + 3)
      val toks = rest.split("/", -1)
      require(toks.length >= 2, s"bad subscription uri: $s")
      val src = if (toks(1) == "*" || toks(1).isEmpty) None else Some(toks(1))
      Subscription(part(toks(0)), src, if (toks.length > 2) part(toks(2)) else None)
    } else if (s.contains(":")) {
      val Array(src, lp) = s.split(":", 2)
      Subscription(None, Some(src), part(lp))
    } else Subscription(None, Some(s), None)
  }

  def parseList(csv: String): Seq[Subscription] =
    csv.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(parse).toSeq
}
