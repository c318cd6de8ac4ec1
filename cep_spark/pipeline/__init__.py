"""Training-data pipeline operators over the documents/embeddings tables.

Dedup (exact / fingerprint / n-gram Jaccard / MinHash-LSH / SimHash),
similarity search (brute-force kNN / hyperplane-LSH), and text analysis
(language-ID / quality / token counting), each as a `queries()` entry
with a DuckDB oracle generated from the SAME literal constants as the
Spark plan — so even the approximate (LSH) operators are exactly
checkable: both sides compute the identical deterministic
hashes/planes, hence the identical candidate sets.

Everything is built-in `pyspark.sql.functions` (JVM-side, codegen) —
no Python UDFs anywhere in these operators.  Multimodal (binary
columns) plumbing lives in `multimodal.py` (Pandas-UDF path, stubbed
decode — no binary test table exists).
"""

from . import registry
from ._mat import release as release_caches

__all__ = ["registry", "release_caches"]
