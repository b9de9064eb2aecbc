package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Sessionize

/** Round-7 part ten: top session paths — the product-analytics
  * journey census (the Sankey diagram's data).
  */
object Round7oQueries {

  val PathLen = 3
  val PathTopN = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q213_session_paths" -> ((s, dir) =>
      Sessionize.topPaths(Tables.load(s, dir, "events"),
        ExtQueries.SessionGapSeconds, PathLen, PathTopN)))

  val oracleSql: Map[String, String] = Map(
    "q213_session_paths" ->
      s"""WITH g AS (SELECT user_id, event_id, ts, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, event_id, ts, event_type,
         |    CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts,
         |      ts) > ${ExtQueries.SessionGapSeconds} THEN 1 ELSE 0 END
         |      AS new_s
         |  FROM g),
         |c AS (SELECT user_id, event_id, ts, event_type,
         |    CAST(sum(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS session_idx
         |  FROM s),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id,
         |    session_idx ORDER BY ts, event_id) AS rn FROM c),
         |p AS (SELECT user_id, session_idx,
         |    string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM r WHERE rn <= $PathLen GROUP BY 1, 2),
         |cen AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |  FROM p GROUP BY 1),
         |sh AS (SELECT path, n_sessions,
         |    CAST((n_sessions * 1000000) // (sum(n_sessions) OVER ())
         |      AS BIGINT) AS share_ppm
         |  FROM cen)
         |SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
         |    AS INTEGER) AS rank, path, n_sessions, share_ppm
         |FROM sh ORDER BY n_sessions DESC, path LIMIT $PathTopN""".stripMargin)
}
