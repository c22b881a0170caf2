"""Large-scale training-data pipeline operators (SURVEY §7.2 M10).

Beyond the reference's own surface: deduplication, similarity search,
text analysis, and multimodal-column plumbing — all expressed as
DataFrame transformations (JVM-side built-ins first, Arrow-batched
pandas UDFs only where unavoidable) so they scale to 100 TB inputs.
"""
