"""Large-scale training-data pipeline operators.

Everything here is Spark-first: built-in column expressions wherever the
semantics allow (JVM-side, codegen, shuffle-aware), pandas UDFs only where a
kernel is genuinely non-relational (SimHash bit packing, hyperplane LSH,
multimodal decode).
"""
