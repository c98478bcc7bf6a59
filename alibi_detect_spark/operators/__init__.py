"""Spark operator layer: declarative DataFrame plans + grouped Arrow UDFs.

Rule of thumb enforced throughout: anything expressible with built-in
``pyspark.sql.functions`` stays JVM-side (whole-stage codegen, partial aggs,
pushdown); only the genuinely non-relational kernels (codec bit-packing, FFT
saliency, online kernel windows, EWMA recursions) drop into ``applyInPandas``
— and those call the exact same NumPy functions as the single-node oracle.
"""
