"""Operator-level DataFrame builders mirroring the reference's physical
operator tree (`ql/src/java/org/apache/hadoop/hive/ql/exec/` — SURVEY.md §2.1).

Each builder takes the loaded table DataFrames and returns a DataFrame whose
logical plan expresses the operator; Catalyst + Tungsten pick the physical
strategy (hash vs sort aggregate, broadcast vs sort-merge join, AQE skew
handling) that the reference implemented by hand in its MR planner.
"""
