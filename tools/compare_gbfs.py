#!/usr/bin/env python3
"""Independent oracle for the GBFS model DAG: recompute mart_trip_metrics
in DuckDB straight from the reference's raw trip CSVs and compare against
the engine's warehouse parquet (written by `runMain graft.RunGbfs`).

Usage: python3 tools/compare_gbfs.py <warehouseDir> [csvGlob]
"""
import math
import sys

import duckdb


def main(wh, csv_glob="/root/reference/data/*.csv"):
    con = duckdb.connect()
    oracle = con.sql(f"""
        WITH stg AS (
          SELECT started_at, ended_at, duration AS duration_s,
            start_station_id::VARCHAR AS start_station_id,
            date_trunc('day', started_at)::DATE AS trip_date,
            trunc(epoch(ended_at - started_at))::BIGINT AS computed_duration_s
          FROM read_csv('{csv_glob}', header=true)
          WHERE started_at IS NOT NULL AND ended_at IS NOT NULL)
        SELECT trip_date AS date_key, start_station_id AS station_id,
          count(*)::BIGINT AS total_trips_started,
          avg(duration_s) AS avg_reported_duration_s,
          avg(computed_duration_s) AS avg_computed_duration_s,
          sum(CASE WHEN duration_s <> computed_duration_s THEN 1 ELSE 0 END)::BIGINT
            AS count_mismatched_durations
        FROM stg GROUP BY 1, 2
    """).fetchall()
    engine = con.sql(f"""
        SELECT date_key, station_id, total_trips_started,
               avg_reported_duration_s, avg_computed_duration_s,
               count_mismatched_durations
        FROM '{wh}/mart_trip_metrics/*.parquet'
    """).fetchall()

    def keyed(rows):
        return {(r[0], r[1]): r[2:] for r in rows}

    o, e = keyed(oracle), keyed(engine)
    if set(o) != set(e):
        print(f"KEY MISMATCH: oracle-only={len(set(o)-set(e))} "
              f"engine-only={len(set(e)-set(o))}")
        return 1
    bad = 0
    for k in o:
        ov, ev = o[k], e[k]
        ok = (ov[0] == ev[0] and ov[3] == ev[3] and
              math.isclose(ov[1], ev[1], rel_tol=1e-9) and
              math.isclose(ov[2], ev[2], rel_tol=1e-9))
        if not ok:
            bad += 1
            if bad <= 3:
                print(f"DIFF at {k}: oracle={ov} engine={ev}")
    print(f"{len(o)} station-days compared, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
