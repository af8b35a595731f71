package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.Derivations

/** End-to-end check of the derivation when-chains (§2.8): synthesizes
  * reference-shaped inputs (machine names, protocol descriptions,
  * sequence names) deterministically from the events table, applies
  * [[Derivations]], and aggregates. The oracle replays the same CASE
  * chains in SQL — so the chain ORDER (first-match-wins) is verified,
  * not just individual branches (those are golden-tested in
  * DerivationsSpec).
  */
object DeriveOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f2_derivations" -> ((s, dir) => {
      val synth = load(s, dir, "events")
        .withColumn("machine",
          when(col("event_type") === "click", "Verio")
            .when(col("event_type") === "view", "TrioTim")
            .when(col("event_type") === "purchase", "SIGNA PET/MR")
            .when(col("event_type") === "signup", "Prisma_fit")
            .otherwise("Bruker Biospec"))
        .withColumn("proto",
          when(col("user_id") % 3 === 0, concat(lit("PROTO_"), col("event_type")))
            .when(col("user_id") % 3 === 1, concat(lit("PRISMA_"), col("event_type")))
            .otherwise(concat(lit("free_"), col("event_type"))))
        .withColumn("seqname",
          when(col("event_id") % 4 === 0, "ep_b1000")
            .when(col("event_id") % 4 === 1, "tfl3d1")
            .when(col("event_id") % 4 === 2, "fm2d2r")
            .otherwise("mystery"))
        // seqname2 drives mp2rage detection and the GRE branches — the
        // %3 split vs seqname's %4 split exercises MPRAGE (tfl3d
        // without mp2rage), every MP2RAGE_* sub-class, and GRE_2D
        .withColumn("seqname2",
          when(col("event_id") % 3 === 0, "t1_mp2rage_seq")
            .when(col("event_id") % 3 === 1, "GR%SiemensSeq%gre_2D")
            .otherwise(col("seqname")))
        .withColumn("sname",
          when(col("event_id") % 10 === 1, "s_INV1")
            .when(col("event_id") % 10 === 3, "s_INV2")
            .when(col("event_id") % 10 === 5, "s_T1_Images")
            .when(col("event_id") % 10 === 7, "s_UNI_Images")
            .otherwise("plain"))
      synth
        .select(
          Derivations.rid(col("machine")).as("rid"),
          Derivations.eid(col("proto")).as("eid"),
          Derivations.facturable(col("proto")).as("facturable"),
          Derivations.seqType(col("seqname"), col("seqname2"),
            col("sname")).as("seq_type"))
        .groupBy(col("rid"), col("facturable"), col("seq_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("eid")).as("n_eid"))
        .orderBy(col("rid"), col("facturable"), col("seq_type"))
    }),

    // Semi-structured JSON shredding — the dynamic-schema surface the
    // reference probes with has_key/fallbacks over its metadata dict
    // (Exam_info.py:531-590), generalized to the JSON column a modern
    // event pipeline carries: each props document is wrapped into a
    // nested record (object + array + scalar) and shredded with
    // JSONPath ($.base.k, $.tags[0], $.n), then aggregated. Integer
    // and string payloads only — JSON number formatting of doubles
    // differs across engines, extracted ints are exact. Scale shape:
    // extraction is a pure projection inside codegen (no UDFs), and
    // the document parses ONCE per row — from_json with an explicit
    // schema yields all three fields from a single parse, where one
    // get_json_object per path would re-parse the document per path;
    // the aggregate shuffles 5 type-cardinality groups.
    "f3_json_shred" -> ((s, dir) => {
      val doc = concat(lit("""{"base":"""), col("props"),
        lit(""","tags":[""""), col("event_type"), lit("""","t"],"n":"""),
        (col("user_id") % 50).cast("string"), lit("}"))
      load(s, dir, "events")
        .select(col("event_id"), doc.as("doc"))
        .select(expr(
          "from_json(doc, 'base struct<k:int>, tags array<string>, n int')")
          .as("j"))
        .select(
          element_at(col("j.tags"), 1).as("tag"),
          col("j.base.k").as("k"),
          col("j.n").as("n"))
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).cast("long").as("sum_k"),
          sum(col("n")).cast("long").as("sum_n"),
          countDistinct(col("n")).as("n_distinct"))
        .orderBy(col("tag"))
    })
  )

  val oracle: Map[String, String] = Map(
    "f2_derivations" ->
      """WITH synth AS (
        |  SELECT
        |    CASE WHEN event_type = 'click' THEN 'Verio'
        |         WHEN event_type = 'view' THEN 'TrioTim'
        |         WHEN event_type = 'purchase' THEN 'SIGNA PET/MR'
        |         WHEN event_type = 'signup' THEN 'Prisma_fit'
        |         ELSE 'Bruker Biospec' END AS machine,
        |    CASE WHEN user_id % 3 = 0 THEN 'PROTO_' || event_type
        |         WHEN user_id % 3 = 1 THEN 'PRISMA_' || event_type
        |         ELSE 'free_' || event_type END AS proto,
        |    CASE WHEN event_id % 4 = 0 THEN 'ep_b1000'
        |         WHEN event_id % 4 = 1 THEN 'tfl3d1'
        |         WHEN event_id % 4 = 2 THEN 'fm2d2r'
        |         ELSE 'mystery' END AS seqname,
        |    CASE WHEN event_id % 3 = 0 THEN 't1_mp2rage_seq'
        |         WHEN event_id % 3 = 1 THEN 'GR%SiemensSeq%gre_2D'
        |         ELSE (CASE WHEN event_id % 4 = 0 THEN 'ep_b1000'
        |                    WHEN event_id % 4 = 1 THEN 'tfl3d1'
        |                    WHEN event_id % 4 = 2 THEN 'fm2d2r'
        |                    ELSE 'mystery' END) END AS seqname2,
        |    CASE WHEN event_id % 10 = 1 THEN 's_INV1'
        |         WHEN event_id % 10 = 3 THEN 's_INV2'
        |         WHEN event_id % 10 = 5 THEN 's_T1_Images'
        |         WHEN event_id % 10 = 7 THEN 's_UNI_Images'
        |         ELSE 'plain' END AS sname
        |  FROM events),
        |derived AS (
        |  SELECT
        |    CASE WHEN starts_with(machine, 'Verio') THEN 19
        |         WHEN starts_with(machine, 'TrioTim') THEN 1
        |         WHEN starts_with(machine, 'Prisma_fit') THEN 1
        |         WHEN starts_with(machine, 'SIGNA') THEN 29
        |         WHEN starts_with(machine, 'Bruker') THEN 39
        |         WHEN starts_with(machine, 'MAGNETOM Cima') THEN 80
        |         WHEN starts_with(machine, 'MAGNETOM Terra.X') THEN 82
        |         ELSE 0 END AS rid,
        |    CASE WHEN starts_with(proto, 'PROTO_') OR starts_with(proto, 'VERIO_')
        |         THEN substr(proto, 7)
        |         WHEN starts_with(proto, 'PRISMA_') OR starts_with(proto, 'CIMAX1_')
        |           OR starts_with(proto, 'TERRAX_')
        |         THEN substr(proto, 8)
        |         ELSE proto END AS eid,
        |    CASE WHEN starts_with(proto, 'PROTO_') OR starts_with(proto, 'VERIO_')
        |           OR starts_with(proto, 'PRISMA_') OR starts_with(proto, 'CIMAX1_')
        |           OR starts_with(proto, 'TERRAX_')
        |         THEN 1 ELSE 0 END AS facturable,
        |    CASE WHEN contains(seqname, 'ep_b') THEN 'DWI'
        |         WHEN contains(seqname, 'epfid') THEN 'EPI'
        |         WHEN contains(seqname, 'spc3d') THEN 'SPACE3D'
        |         WHEN contains(seqname, 'tfl3d') THEN
        |           CASE WHEN contains(seqname2, 'mp2rage')
        |           THEN 'MP2RAGE_' ||
        |             CASE WHEN contains(sname, 'INV1') THEN 'INV1'
        |                  WHEN contains(sname, 'INV2') THEN 'INV2'
        |                  WHEN contains(sname, 'T1_Images') THEN 'T1MAP'
        |                  WHEN contains(sname, 'UNI_Images') THEN 'UNI'
        |                  ELSE 'SHOULD_NOT_HAPPEN' END
        |           ELSE 'MPRAGE' END
        |         WHEN contains(seqname, 'fm2d2r') THEN 'GreFieldMap'
        |         WHEN contains(seqname2, 'GR%SiemensSeq%gre_2D') THEN 'GRE_2D'
        |         WHEN contains(seqname2, 'GR%SiemensSeq%gre_3D') THEN 'GRE_3D'
        |         WHEN contains(seqname, 'eja_svs') THEN 'spectroSVS'
        |         ELSE 'to_be_defined' END AS seq_type
        |  FROM synth)
        |SELECT rid, facturable, seq_type, COUNT(*) AS n,
        |       COUNT(DISTINCT eid) AS n_eid
        |FROM derived GROUP BY 1,2,3
        |ORDER BY rid, facturable, seq_type""".stripMargin,

    "f3_json_shred" ->
      """WITH docs AS (
        |  SELECT event_id,
        |    '{"base":' || props || ',"tags":["' || event_type ||
        |    '","t"],"n":' || CAST(user_id % 50 AS VARCHAR) || '}' AS doc
        |  FROM events),
        |shred AS (
        |  SELECT json_extract_string(doc, '$.tags[0]') AS tag,
        |         CAST(json_extract(doc, '$.base.k') AS INT) AS k,
        |         CAST(json_extract(doc, '$.n') AS INT) AS n
        |  FROM docs)
        |SELECT tag, COUNT(*) AS n_events,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(SUM(n) AS BIGINT) AS sum_n,
        |       COUNT(DISTINCT n) AS n_distinct
        |FROM shred GROUP BY 1 ORDER BY tag""".stripMargin
  )
}
