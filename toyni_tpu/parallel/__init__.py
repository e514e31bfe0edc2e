"""Multi-chip parallelism: device mesh helpers, distributed four-step NTT
(all-to-all over ICI), shard-local FRI folding on cyclic layouts, and
collective Merkle root reduction."""
