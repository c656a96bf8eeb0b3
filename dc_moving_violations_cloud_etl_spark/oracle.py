"""DuckDB oracle twins of the fixture→reference-schema mapping.

The driver registers only the base parquet tables as DuckDB views; every
oracle SQL string therefore carries this WITH-prefix defining the same
``violations`` / ``weather_daily`` views that ``catalog.py`` builds with
the DataFrame API. The two definitions are held in exact agreement by
``tests/test_oracle_parity.py`` (row-count + schema + value equality).

Determinism contract shared with the Spark side:
- integer arithmetic and string ops: exact in both engines;
- double ops limited to one or two flops on identical operands (IEEE-754
  deterministic);
- aggregation of monetary/metric doubles goes through DECIMAL(18,2)
  (exact, order-independent) and back to DOUBLE;
- no ``round()`` on doubles anywhere (engine-dependent at midpoints).
"""

from __future__ import annotations

# NOTE: DuckDB `day(ts)`/`hour(ts)` return BIGINT; Spark sides cast to long
# where such columns are exposed. `0.0` literals promote to DOUBLE when
# mixed with double columns in both engines.
REF_VIEWS_CTE = """
WITH _v_src AS (
  SELECT l.*, o.o_orderpriority,
         l.l_shipdate
           + (l.l_orderkey % 24) * INTERVAL 1 HOUR
           + (l.l_partkey % 60) * INTERVAL 1 MINUTE AS issue_ts
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
_v_proj AS (
  SELECT
    strftime(issue_ts, '%Y-%m') || '_'
      || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) || '_'
      || CAST(l_partkey AS VARCHAR) || '_'
      || strftime(issue_ts, '%Y%m%d') AS violation_id,
    issue_ts AS issue_date,
    CAST(issue_ts AS DATE) AS violation_date,
    o_orderpriority AS issuing_agency_name,
    CASE WHEN l_returnflag = 'R' THEN 'Y'
         WHEN l_returnflag = 'A' THEN 'N' END AS accident_indicator,
    'BLK ' || CAST(l_suppkey * 100 AS VARCHAR) || ' MAIN ST NW' AS location,
    'T' || CAST(100 + l_partkey % 900 AS VARCHAR) AS violation_code,
    CASE WHEN l_quantity <= 10 THEN 'SPEED UP TO TEN MPH OVER THE LIMIT'
         WHEN l_quantity <= 20 THEN 'SPEED 1-10 MPH OVER THE LIMIT'
         WHEN l_quantity <= 30 THEN 'SPEED 11-15 MPH OVER THE LIMIT'
         WHEN l_quantity <= 40 THEN 'SPEED 16-20 MPH OVER THE LIMIT'
         WHEN l_quantity <= 45 THEN 'FAIL TO STOP PER REGULATIONS FACING RED SIGNAL'
         ELSE 'PASSING STOP SIGN WITHOUT COMING TO A COMPLETE STOP'
    END AS violation_desc,
    CASE WHEN l_discount < 0.1 THEN l_extendedprice END AS fine_amount,
    CASE WHEN l_tax < 0.08 THEN CAST(
      CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
    END AS total_paid,
    38.9 + l_discount AS latitude,
    -77.0 - l_tax AS longitude,
    strftime(issue_ts, '%Y-%m') AS month
  FROM _v_src
),
violations AS (
  SELECT * FROM _v_proj WHERE length(violation_id) > 0
),
_w_profile AS (
  SELECT day(ts) AS dom,
         max(value) AS tempmax,
         min(value) AS tempmin,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS temp,
         CAST(sum(CASE WHEN event_type = 'click'
                       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS rain_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err_cnt,
         max(CASE WHEN event_type = 'view' THEN value END) AS windspeed
  FROM events
  GROUP BY 1
),
_w_spine AS (
  SELECT DISTINCT CAST(l_shipdate AS DATE) AS weather_date FROM lineitem
),
_w_proj AS (
  SELECT s.weather_date,
         p.tempmax, p.tempmin, p.temp,
         CASE WHEN p.dom % 3 = 0 THEN 0.0
              ELSE coalesce(p.rain_total, 0.0) END AS precip,
         least(100.0, CAST(p.err_cnt AS DOUBLE)) AS humidity,
         p.windspeed,
         CASE WHEN p.dom % 15 = 0 THEN 'Light rain, overcast'
              WHEN p.dom % 3 = 0 THEN 'Clear'
              ELSE 'Rain, Partially cloudy' END AS conditions
  FROM _w_spine s
  JOIN _w_profile p ON day(s.weather_date) = p.dom
),
weather_daily AS (
  SELECT *, CASE WHEN precip > 0 OR contains(lower(conditions), 'rain')
                 THEN 1 ELSE 0 END AS is_rain
  FROM _w_proj
)
"""


def with_ref_views(body: str) -> str:
    """Prefix a SELECT body with the reference-view CTEs."""
    return f"{REF_VIEWS_CTE}\n{body}"
