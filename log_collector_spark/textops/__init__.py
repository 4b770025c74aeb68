"""Training-data operators over the documents/embeddings tables.

These extend the reference's parse/enrich/route surface with the operations a
large-scale training-data pipeline needs: text analysis (tokens, quality,
language-ID, fingerprinting), deduplication (exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding near-dup), and similarity search.

Design rule: every operator is expressed with native Catalyst expressions
(JVM-side, whole-stage codegen) over deterministic integer/hash arithmetic, so
a byte-identical DuckDB oracle exists for the driver's correctness gate. The
shared cross-engine primitives live in :mod:`.common`.
"""
