"""Column-level functions: vector math, embeddings, tokenization."""
