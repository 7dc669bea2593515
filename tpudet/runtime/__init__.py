"""Runtime: device mesh / data parallelism, train-step machinery, checkpointing,
pretrained-weight ingestion, metrics — the subsystems the reference inlined into each
model class via tf.Session / tf.train.Saver (SURVEY.md §5)."""
