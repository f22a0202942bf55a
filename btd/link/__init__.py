"""Entity linking: MinHash-LSH blocking → batched candidate scoring →
connected-components canonicalization (north-rule stages)."""
