"""Shared oracle-SQL generators: unrolled-CTE replays of the
engine's exact-integer iterative kernels, importable by any plans
module without import cycles (this module depends on nothing).
"""

from __future__ import annotations


def mmr_unrolled_steps_sql(k: int, lam_num: int = 7, lam_den: int = 10) -> str:
    """The integer-MMR greedy UNROLLED as k chained CTEs
    (sel1..selk / acc1..acck), each step ranking the remaining
    candidates by lam_num*qs - (lam_den-lam_num)*max(ps over the
    selected prefix) with lowest-id tie-break — generated
    programmatically so the SQL provably mirrors the mmr_select_exact
    recursion step for step. Assumes CTEs ``cands(vec_id, qs)`` and
    ``pairs(a_id, b_id, ps)`` are already in scope (the caller supplies
    them — s14 derives both from raw embeddings, p09b from the chunked
    md5-BoW index). Returns the comma-prefixed CTE chain; acc{k} holds
    (rank, vec_id, qs, mmr10) with mmr10 = lam_den * the scaled score."""
    mu = lam_den - lam_num
    parts = [
        f""",
sel1 AS (
  SELECT 1 AS rank, vec_id, qs, {lam_num} * qs AS mmr10 FROM (
    SELECT vec_id, qs,
      ROW_NUMBER() OVER (ORDER BY {lam_num} * qs DESC, vec_id) AS rn
    FROM cands
  ) WHERE rn = 1
),
acc1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
sel{i} AS (
  SELECT {i} AS rank, vec_id, qs, mmr10 FROM (
    SELECT vec_id, qs, mmr10,
      ROW_NUMBER() OVER (ORDER BY mmr10 DESC, vec_id) AS rn
    FROM (
      SELECT c.vec_id, c.qs, {lam_num} * c.qs - {mu} * MAX(p.ps) AS mmr10
      FROM cands c
      JOIN pairs p ON p.a_id = c.vec_id
        AND p.b_id IN (SELECT vec_id FROM acc{i - 1})
      WHERE c.vec_id NOT IN (SELECT vec_id FROM acc{i - 1})
      GROUP BY c.vec_id, c.qs
    )
  ) WHERE rn = 1
),
acc{i} AS MATERIALIZED (SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM sel{i})"""
        )
    return "".join(parts)
