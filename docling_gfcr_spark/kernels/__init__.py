"""Pure-Python extraction kernels.

Every function here operates on plain ``str`` / ``pd.Series`` and is free of
any Spark import, so it is (a) unit-testable without a JVM and (b) directly
usable inside Arrow-vectorized pandas UDFs (one JVM<->Python boundary total
when fused, see ``docling_gfcr_spark.pipeline``).
"""

from docling_gfcr_spark.kernels import encodings, html_extract, markdown_ops, pdf_layout

__all__ = ["encodings", "html_extract", "markdown_ops", "pdf_layout"]
