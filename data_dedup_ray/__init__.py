"""data_dedup_ray — a Ray-Data-native near-duplicate detection + clustering engine.

Re-expresses the semantics of the reference engine (JTimothyKing/Data-Dedup:
a lazy digest-cascade deduplicator, /root/reference/lib/Data/Dedup/Engine.pm)
as idiomatic Ray Data pipelines over Arrow batches, and extends it with the
near-duplicate operators a web-scale training-data pipeline needs:
MinHash+LSH, SimHash, n-gram Jaccard verification, suffix-array / winnowing
substring dedup, connected-components clustering, embedding similarity
search, and text-analysis stages (language id, quality scores, token counts,
fingerprints).

Design rules (applied throughout):
- every transform is ``Dataset.map_batches`` over zero-copy Arrow or
  vectorized pandas/numpy batches — no per-row Python in hot paths;
- stateful stages (MinHash permutations, tokenizers, suffix-array buffers)
  are callable classes run as actor pools;
- wide operations are explicit: shuffle keys are documented per pipeline,
  small sides are broadcast with ``ray.put``, hot keys are salted;
- nothing here calls ``ray.init`` / ``ray.shutdown`` — sessions are owned
  by bench.py / the CLI / the test fixture.
"""

__version__ = "0.1.0"
