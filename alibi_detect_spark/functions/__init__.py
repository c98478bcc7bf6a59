"""Pure-NumPy kernel layer.

Every module here is importable without Spark. The same functions run (a) under
pytest as the single-node reference ("oracle") and (b) inside grouped
pandas/Arrow UDFs on executors — which is what makes distributed results
bit-identical to the oracle: equality is structural, not approximate.
"""
