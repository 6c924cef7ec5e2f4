"""docling_gfcr_spark — a PySpark-native distributed main-content extraction engine.

Brand-new rebuild (NOT a port) of the query/data-processing capabilities of the
reference ``prof-ramos/docling-gfcr`` (a single-machine document->Markdown
conversion tool), re-expressed as an idiomatic Spark DataFrame pipeline over a
table of multi-turn conversation/agent transcripts
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``.

Layout
------
- ``kernels/``   pure-Python extraction kernels (pandas-vectorizable, Spark-free,
                 unit-testable) that preserve the reference's text semantics
                 byte-for-byte (see each module's file:line citations).
- ``pipeline.py``  the columnar extraction pipeline: route -> fused Arrow pandas
                 UDF -> optimize -> validate -> metrics, with explicit
                 partitioning / skew salting and stable turn ordering.
- ``transcripts.py``  deterministic distributed synthetic transcripts generator.
- ``lineage.py``  per-partition lineage checkpointing + resume (anti-join).
- ``operators/``  large-scale training-data ops: dedup (exact / MinHash-LSH /
                 SimHash / n-gram Jaccard / embedding-cosine), similarity
                 search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"
