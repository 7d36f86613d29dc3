"""Large-scale training-data pipeline operators (north-star extensions).

Not in the reference (a batch SQL engine); designed Spark-first for 100 TB:
every operator is a shuffle-parallel DataFrame composition — no driver-side
loops, no cross joins except over explicitly bounded candidate sets.
"""
