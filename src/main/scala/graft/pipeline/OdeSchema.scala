package graft.pipeline

import org.apache.spark.sql.types._

/**
 * Authored schema for ODE BSM/TIM records (FIXTURES.md §1) — exactly the
 * fields addressed by rules in the reference's config_2.ini and
 * sequential.py. Everything nullable: absence is a validation verdict,
 * never a parse error (validator.py:196-198). Extra fields in the data are
 * legal and ignored — from_json drops them.
 */
object OdeSchema {

  val serialId: StructType = StructType(Seq(
    StructField("streamId", StringType),
    StructField("bundleSize", LongType),
    StructField("bundleId", LongType),
    StructField("recordId", LongType),
    StructField("serialNumber", LongType)))

  val locationData: StructType = StructType(Seq(
    StructField("latitude", StringType),   // kept raw: rules cast to decimal
    StructField("longitude", StringType),
    StructField("elevation", StringType),  // AllowEmpty (config_2.ini:118)
    StructField("speed", StringType),
    StructField("heading", StringType)))

  val serviceRegionCorner: StructType = StructType(Seq(
    StructField("latitude", StringType),
    StructField("longitude", StringType)))

  val request: StructType = StructType(Seq(
    StructField("ode", StructType(Seq(
      StructField("verb", StringType),
      StructField("version", StringType)))),
    StructField("sdw", StructType(Seq(
      StructField("recordId", StringType),
      StructField("ttl", StringType),
      StructField("serviceRegion", StructType(Seq(
        StructField("nwCorner", serviceRegionCorner),
        StructField("seCorner", serviceRegionCorner))))))),
    StructField("rsus", StructType(Seq(
      StructField("rsus", ArrayType(StructType(Seq(
        StructField("rsuTarget", StringType),
        StructField("rsuRetries", LongType),
        StructField("rsuTimeout", LongType),
        StructField("rsuIndex", LongType)))))))),
    StructField("snmp", StructType(Seq(
      StructField("mode", StringType),
      StructField("deliverystart", StringType),
      StructField("deliverystop", StringType),
      StructField("rsuid", StringType),
      StructField("enable", StringType),
      StructField("channel", StringType),
      StructField("msgid", StringType),
      StructField("interval", StringType),
      StructField("status", StringType))))))

  val metadata: StructType = StructType(Seq(
    StructField("recordGeneratedAt", StringType),
    StructField("recordGeneratedBy", StringType),
    StructField("recordType", StringType),
    StructField("sanitized", StringType),
    StructField("schemaVersion", StringType),
    StructField("securityResultCode", StringType),
    StructField("bsmSource", StringType),
    StructField("payloadType", StringType),
    StructField("logFileName", StringType),
    StructField("odeReceivedAt", StringType),
    StructField("serialId", serialId),
    StructField("receivedMessageDetails", StructType(Seq(
      StructField("locationData", locationData),
      StructField("rxSource", StringType)))),
    StructField("request", request)))

  val record: StructType = StructType(Seq(
    StructField("metadata", metadata),
    // payload is opaque to rules; retained raw for the report sink
    // (result.py:20-23 keeps the whole record)
    StructField("payload", StringType)))

  /**
   * [[record]] with `request.ode.version` typed LongType, for the
   * reference's SHIPPED rule corpus (config_2.ini:150): its TMC condition
   * is `matchAgainst: [3]` — Python INT equality (validator.py:166) — so
   * the column must compare numerically; a string-typed version would
   * never equal the JSON number 3. Fixture E writes `version` as a JSON
   * int accordingly.
   */
  val config2Record: StructType = {
    def patch(st: StructType, path: List[String], dt: DataType): StructType =
      path match {
        case leaf :: Nil =>
          StructType(st.fields.map(f =>
            if (f.name == leaf) f.copy(dataType = dt) else f))
        case head :: rest =>
          StructType(st.fields.map(f =>
            if (f.name == head) f.copy(dataType =
              patch(f.dataType.asInstanceOf[StructType], rest, dt))
            else f))
        case Nil => st
      }
    patch(record, List("metadata", "request", "ode", "version"), LongType)
  }

  /**
   * Extend a base schema with every (static) dotted rule path a suite
   * addresses, as nullable StringType leaves. The reference parses the
   * whole JSON dynamically, so its effective schema IS the rule config —
   * a fixed authored schema would silently null out any field a custom
   * suite validates (surfacing as a spurious 'Field missing'). Dynamic
   * `{i}` list paths are skipped: their base arrays must be authored.
   */
  def withRulePaths(base: StructType, paths: Seq[String]): StructType =
    paths.filterNot(_.contains("{")).foldLeft(base) { (st, p) =>
      insert(st, p.split('.').toList)
    }

  private def insert(st: StructType, ps: List[String]): StructType = ps match {
    case Nil => st
    case leaf :: Nil =>
      if (st.fieldNames.contains(leaf)) st
      else StructType(st.fields :+ StructField(leaf, StringType))
    case head :: rest =>
      val idx = st.fields.indexWhere(_.name == head)
      if (idx == -1) {
        val nested = rest.init.foldRight(
          StructType(Seq(StructField(rest.last, StringType))))(
          (n, acc) => StructType(Seq(StructField(n, acc))))
        StructType(st.fields :+ StructField(head, nested))
      } else st.fields(idx).dataType match {
        case inner: StructType =>
          StructType(st.fields.updated(idx,
            st.fields(idx).copy(dataType = insert(inner, rest))))
        case _ => st // collides with a non-struct field: leave authored type
      }
  }
}
