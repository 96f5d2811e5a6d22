"""High-level operators: the SparkSom estimator/model and the
large-scale pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing)."""
